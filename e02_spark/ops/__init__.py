"""Scale-oriented composite operators.

Each module implements an operator the reference (or the driver north-star)
needs that Spark lacks as a single built-in, expressed as a composition of
DataFrame ops chosen for 100 TB behavior:

  range_join.py   interval/time-proximity joins via bucketed equi-join
                  (never an O(n^2) theta join)
  dedup.py        exact + MinHash/LSH + SimHash + n-gram Jaccard near-dup
                  (band_keys shared with the incremental streaming sink)
  graph.py        connected components (min-label propagation AND
                  alternating large-star/small-star) for dedup clustering
  similarity.py   cosine/dot-product, brute-force/IVF/sign-LSH top-k,
                  SemDeDup semantic dedup
  text.py         tokenization, shingles, MinHash/SimHash signatures,
                  language-ID, quality scoring, fingerprints
  quality.py      one-pass data-quality expectations + PII scrubbing
  sampling.py     deterministic hash splits and stratified sampling
  multimodal.py   binary-column plumbing (Pillow-gated decode, typed
                  metadata, Arrow mapInPandas)
  skew.py         salted aggregation/join patterns for hot keys
  bucketing.py    bucketed tables for exchange-free fact-to-fact joins
  layout.py       hive-partitioned writes, dynamic partition overwrite,
                  clustering (sortWithinPartitions) and compaction
  snapshot.py     manifest-committed lakehouse table (commits, merges,
                  CDF, time travel, refs/branches, maintenance)
  store.py        pluggable commit-plane backend (conditional PUT,
                  S3-mappable object semantics)
  catalog.py      multi-table atomic commits (one conditional-PUT
                  manifest pins versions that belong together)
  bloom.py        per-file manifest bloom filters (point-lookup and
                  small-key-merge file skipping; "no" is definitive)
  meta.py         queryable metadata tables (files/deletes/history/
                  refs/partitions as DataFrames + SQL views)
  mv.py, ivm.py   materialized views (batch/continuous) and CDF-driven
                  incremental view maintenance
"""
