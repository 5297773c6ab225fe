"""Scale-oriented composite operators.

Each module implements an operator the reference (or the driver north-star)
needs that Spark lacks as a single built-in, expressed as a composition of
DataFrame ops chosen for 100 TB behavior:

  range_join.py   interval/time-proximity joins via bucketed equi-join
                  (never an O(n^2) theta join)
  dedup.py        exact + MinHash/LSH + SimHash + n-gram Jaccard near-dup
  similarity.py   cosine/dot-product, brute-force and LSH-bucketed top-k
  text.py         tokenization, language-ID, quality scoring, fingerprints
  multimodal.py   binary-column plumbing (decode stubs, typed metadata)
"""
