"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Everything is hash-deterministic (md5) and built from JVM-side primitives,
so each variant has a DuckDB oracle twin. Scale design per operator is
noted inline — the common theme: never materialize O(n^2) pairs; generate
bounded candidate sets (LSH bands, sign buckets, df-capped inverted index)
and verify exactly only within candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import sign_lsh_bucket_offset
from .text import minhash_signature, shingles


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per key (lowest order_col) — deterministic
    keep-first via window (B11 pattern). One shuffle on the key."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def band_keys(sig: DataFrame, k: int, bands: int) -> DataFrame:
    """(doc_id, band_idx, band_key) — LSH band keys from a MinHash
    signature (h1..hk): k/bands consecutive hashes concatenated per band.
    Shared by the batch pair detectors below and the incremental corpus
    dedup sink (streaming/jobs.py), so batch and streaming band identically
    by construction."""
    rows_per_band = k // bands
    band_cols = []
    for b in range(bands):
        hs = [f"h{b * rows_per_band + j + 1}" for j in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_idx"), F.concat_ws("|", *hs).alias("band_key")
            )
        )
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_key")


def _candidate_intersections(
    documents: DataFrame,
    k: int,
    bands: int,
    sh: DataFrame | None = None,
    salt_bands: int = 0,
) -> DataFrame:
    """Shared LSH front half of minhash_lsh_pairs / containment_pairs:
    shingle → k md5-minhashes → banded bucket join → candidate pairs →
    exact shingle-set intersections. Returns (da, db, inter, na, nb).

    salt_bands > 0 enables the no-AQE skew fallback: side a of the bucket
    join is salted by a deterministic hash of its columns mod S
    (skew.salted_join) and side b exploded across all S salts,
    so a hot band bucket splits across S reducers even when AQE's runtime
    skew-split is unavailable. Every pair still meets exactly once (a
    carries one salt, b all of them); results are IDENTICAL to the
    unsalted join — pinned by tests — at the cost of S× side-b shuffle
    volume, which is why it is off by default.

    Scale: the band bucket join shuffles on band_key (high cardinality);
    candidate verification joins shingle sets only for candidate pairs —
    work is O(candidates * shingles/doc), never O(n^2).
    """
    if bands < 1 or k % bands != 0:
        raise ValueError(
            f"bands ({bands}) must be a positive divisor of k ({k}): "
            "otherwise band keys silently drop hashes (or, with empty "
            "bands, every document collides with every other)"
        )
    if sh is None:
        # MEMORY_AND_DISK: the shingle set is corpus-sized; spill, don't OOM
        from pyspark import StorageLevel

        sh = shingles(documents).persist(StorageLevel.MEMORY_AND_DISK)
    sig = minhash_signature(sh, k=k)
    banded = band_keys(sig, k, bands)

    a = banded.select(
        F.col("doc_id").alias("da"), "band_idx", "band_key"
    )
    b = banded.select(
        F.col("doc_id").alias("db"), "band_idx", "band_key"
    )
    # SKEW: band_key distribution is adversary-controlled at 100 TB (a
    # template-heavy crawl can put half the corpus in one bucket). First
    # line of defense is AQE skew-join — it splits the hot shuffle
    # partition at runtime, pinned by tests/test_skew_and_properties.py::
    # test_lsh_hot_band_join_is_skew_split on this exact join shape. For
    # deployments without AQE, salt_bands enables the explicit salting
    # fallback below (result-identical, pinned by
    # test_salted_band_join_matches_unsalted).
    if salt_bands > 0:
        from .skew import salted_join

        joined = salted_join(a, b, ["band_idx", "band_key"], n_salts=salt_bands)
    else:
        joined = a.join(b, ["band_idx", "band_key"])
    candidates = (
        joined
        .where(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )

    # candidate pairs are corpus-dependent and unbounded (they grow with the
    # duplication rate), so no broadcast hint here: on a high-dup crawl a
    # forced broadcast OOMs the driver. AQE broadcasts the candidate side at
    # runtime when it is actually small; otherwise this is a plain shuffled
    # hash join keyed on doc id — always safe.
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("da"), "shingle")
    shb = sh.select(F.col("doc_id").alias("db"), "shingle")
    inter = (
        sha.join(candidates, "da").join(shb, ["db", "shingle"])
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sza = sizes.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("na"))
    szb = sizes.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("nb"))
    # NOTE: sizes is one row per document (huge at scale) — never broadcast
    # it; `inter` is candidate-sized, so AQE broadcasts THAT side instead
    return inter.join(sza, "da").join(szb, "db")


def minhash_lsh_pairs(
    documents: DataFrame,
    k: int = 4,
    bands: int = 2,
    threshold: float = 0.8,
    ci: DataFrame | None = None,
    salt_bands: int = 0,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification
    over the LSH candidates only (see _candidate_intersections).

    Pass `ci` to reuse a shared/cached candidate-intersection table —
    the whole LSH front half is identical across the Jaccard and
    containment variants, so callers computing both should build it once.
    salt_bands > 0 enables the no-AQE hot-bucket salting fallback.
    """
    if ci is None:
        ci = _candidate_intersections(documents, k, bands, salt_bands=salt_bands)
    jac = ci.select(
        "da",
        "db",
        (
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter"))
        ).alias("jaccard"),
    )
    return jac.where(F.col("jaccard") >= threshold).select("da", "db", "jaccard")


def containment_pairs(
    documents: DataFrame,
    k: int = 4,
    bands: int = 2,
    threshold: float = 0.9,
    ci: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric near-dup detection: shingle-set CONTAINMENT
    max(|A∩B|/|A|, |A∩B|/|B|) over the LSH candidates. Catches
    subset-duplication (a document wrapped in boilerplate, a page
    embedded in a larger crawl) that symmetric Jaccard under-scores:
    a 100-shingle doc fully contained in a 1000-shingle doc has
    Jaccard 0.1 but containment 1.0.
    """
    if ci is None:
        ci = _candidate_intersections(documents, k, bands)
    cont = ci.select(
        "da",
        "db",
        (F.col("inter").cast("double") / F.least("na", "nb")).alias("containment"),
    )
    return cont.where(F.col("containment") >= threshold).select(
        "da", "db", "containment"
    )


def ngram_jaccard_topk(
    documents: DataFrame,
    n: int = 3,
    topk: int = 20,
    max_df: int = 100,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Top-k most-similar document pairs by n-gram Jaccard over the
    df-capped shingle space: shingles occurring in more than max_df docs
    (stop-shingles) are excluded from BOTH the pair generation and the
    set sizes — one inverted-index self-join + one groupBy, no separate
    candidate materialization. At scale the cap bounds the per-shingle
    pair blow-up to max_df^2."""
    if sh is None:
        sh = shingles(documents, n=n)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rare = sh.join(
        F.broadcast(df_counts.where(F.col("df") <= max_df).select("shingle")),
        "shingle",
    ).cache()
    a = rare.select(F.col("doc_id").alias("da"), "shingle")
    b = rare.select(F.col("doc_id").alias("db"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sza = sizes.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("na"))
    szb = sizes.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("nb"))
    scored = (
        inter.join(sza, "da")
        .join(szb, "db")
        .select(
            "da",
            "db",
            F.col("inter").cast("bigint").alias("inter"),
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), F.col("da").asc(), F.col("db").asc()
    ).limit(topk)


def simhash_hamming_pairs(
    documents: DataFrame, max_hamming: int = 3, sh: DataFrame | None = None
) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance <= max_hamming, via
    banded candidate generation + exact popcount verification.

    The 32-bit simhash is split into 4 disjoint 8-bit bands; a pair is a
    candidate iff it collides in at least one band. By pigeonhole, any
    pair with <= 3 differing bits leaves at least one of the 4 bands
    untouched — so for max_hamming <= 3 the banding has EXACT recall while
    generating only per-band-bucket joins (256 buckets per band; at scale
    the simhash distribution over real corpora spreads these well).
    Verification is one xor + bit_count per candidate — identical
    semantics in DuckDB (xor() + bit_count()), so oracle-checkable."""
    from .text import shingles, simhash32

    # `shingles` output is already a distinct set — skip simhash32's dedup
    sh = simhash32(
        sh if sh is not None else shingles(documents), assume_distinct=True
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.expr(f"(simhash div {1 << (8 * b)}) % 256").alias("band_val"),
            )
            for b in range(4)
        ]
    )
    banded = sh.select("doc_id", "simhash", F.explode(bands).alias("bd")).select(
        "doc_id", "simhash", "bd.band_idx", "bd.band_val"
    )
    a = banded.select(
        F.col("doc_id").alias("da"), F.col("simhash").alias("ha"), "band_idx", "band_val"
    )
    b = banded.select(
        F.col("doc_id").alias("db"), F.col("simhash").alias("hb"), "band_idx", "band_val"
    )
    ham = F.expr("bit_count(ha ^ hb)").cast("bigint")
    # Verify BEFORE the dedup exchange: hamming is one xor+popcount over
    # columns the collision row already carries, so filtering first costs
    # nothing extra per collision while the distinct's shuffle then moves
    # only SURVIVING pairs (near-dups) instead of every multi-band
    # collision. distinct on (da, db, hamming) == distinct on (da, db) —
    # hamming is a function of the pair — so results are identical.
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("da") < F.col("db"))
        .select("da", "db", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    bits_per_band: int = 8,
    n_bands: int = 4,
    seeded: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs via MULTI-BAND sign-LSH blocking +
    exact cosine verification over the candidate union.

    Each band b hashes components [b*bits, (b+1)*bits) into a 2^bits sign
    bucket; a pair is a candidate if it collides in ANY band. Multi-band
    fixes both failure modes of single-bucket sign-LSH: recall (a pair
    straddling one hyperplane still collides in the other bands) and scale
    (2^bits buckets per band — with bits ~ log2(n) the per-bucket pair
    count stays near-constant, never O(n^2/const)). Size `bits_per_band`
    with the corpus: 8 bits = 256 buckets/band is right for ~1e5-1e6 rows;
    at 100 TB raise it toward log2(n_vectors) - 8.

    The oracle replicates the exact same banding, so results compare
    bit-for-bit (see duck twins in the query module).

    seeded=True switches each band's buckets from axis-aligned sign
    patterns to seeded Rademacher random hyperplanes (band index = seed —
    see similarity.sign_lsh_bucket_seeded): robust to adversarially
    correlated embeddings, still bit-deterministic cross-engine."""
    from .similarity import (
        _dot_q,
        cosine_q,
        seeded_sign_bands_arrow,
        with_quantized,
    )

    qd = with_quantized(embeddings)

    if seeded:
        # The seeded buckets are bits*n_bands interpreted HOF lambdas per
        # row with dim-element literal plane arrays — seconds per pass at
        # sf0.1. The Arrow twin is the same float64 math vectorized,
        # bit-identical (tests/test_similarity_arrow.py), and already
        # exploded. Expression path: sign_lsh_bucket_seeded.
        banded = seeded_sign_bands_arrow(
            embeddings, bits=bits_per_band, n_bands=n_bands
        )
    else:
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    sign_lsh_bucket_offset(
                        "embedding", b * bits_per_band, bits_per_band
                    ).alias("bucket"),
                )
                for b in range(n_bands)
            ]
        )
        banded = qd.select(
            "vec_id", F.explode(bands).alias("bd")
        ).select("vec_id", "bd.band_idx", "bd.bucket")
    a = banded.select(F.col("vec_id").alias("va"), "band_idx", "bucket")
    b = banded.select(F.col("vec_id").alias("vb"), "band_idx", "bucket")
    candidates = (
        a.join(b, ["band_idx", "bucket"])
        .where(F.col("va") < F.col("vb"))
        .select("va", "vb")
        .distinct()
    )
    qa = qd.select(
        F.col("vec_id").alias("va"), F.col("q").alias("qa"), F.col("n2").alias("na2")
    )
    qb = qd.select(
        F.col("vec_id").alias("vb"), F.col("q").alias("qb"), F.col("n2").alias("nb2")
    )
    # Candidate verification is one dot product PER PAIR; the interpreted
    # _dot_q lambda dominated the query at sf0.1 (~250k candidate pairs
    # under the 4-bit seeded blocking). cosine_pairs_arrow is the same
    # exact int64/IEEE math vectorized — bit-identical, pinned by
    # tests/test_similarity_arrow.py. Expression twin kept below for
    # reference: cosine_q(_dot_q("qa", "qb"), "na2", "nb2").
    from .similarity import cosine_pairs_arrow

    scored = cosine_pairs_arrow(candidates.join(qa, "va").join(qb, "vb"))
    return scored.where(F.col("cosine") >= threshold)
