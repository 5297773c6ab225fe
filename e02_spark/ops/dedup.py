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

from .similarity import sign_lsh_bucket
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


def _candidate_intersections(
    documents: DataFrame, k: int, bands: int
) -> DataFrame:
    """Shared LSH front half of minhash_lsh_pairs / containment_pairs:
    shingle → k md5-minhashes → banded bucket join → candidate pairs →
    exact shingle-set intersections. Returns (da, db, inter, na, nb).

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
    sh = shingles(documents).cache()
    sig = minhash_signature(sh, k=k)
    rows_per_band = k // bands
    band_cols = []
    for b in range(bands):
        hs = [f"h{b * rows_per_band + j + 1}" for j in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_idx"), F.concat_ws("|", *hs).alias("band_key"))
        )
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_key")

    a = banded.select(
        F.col("doc_id").alias("da"), "band_idx", "band_key"
    )
    b = banded.select(
        F.col("doc_id").alias("db"), "band_idx", "band_key"
    )
    candidates = (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )

    # candidate pairs are few (LSH banding is selective) — broadcast them
    # so the exact-Jaccard verification joins stay map-side over sh
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("da"), "shingle")
    shb = sh.select(F.col("doc_id").alias("db"), "shingle")
    inter = (
        sha.join(F.broadcast(candidates), "da").join(shb, ["db", "shingle"])
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sza = sizes.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("na"))
    szb = sizes.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("nb"))
    # NOTE: sizes is one row per document (huge at scale) — never broadcast
    # it; `inter` is candidate-sized, so AQE broadcasts THAT side instead
    return inter.join(sza, "da").join(szb, "db")


def minhash_lsh_pairs(
    documents: DataFrame, k: int = 4, bands: int = 2, threshold: float = 0.8
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification
    over the LSH candidates only (see _candidate_intersections)."""
    ci = _candidate_intersections(documents, k, bands)
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
    documents: DataFrame, k: int = 4, bands: int = 2, threshold: float = 0.9
) -> DataFrame:
    """Asymmetric near-dup detection: shingle-set CONTAINMENT
    max(|A∩B|/|A|, |A∩B|/|B|) over the LSH candidates. Catches
    subset-duplication (a document wrapped in boilerplate, a page
    embedded in a larger crawl) that symmetric Jaccard under-scores:
    a 100-shingle doc fully contained in a 1000-shingle doc has
    Jaccard 0.1 but containment 1.0.
    """
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
    documents: DataFrame, n: int = 3, topk: int = 20, max_df: int = 100
) -> DataFrame:
    """Top-k most-similar document pairs by n-gram Jaccard over the
    df-capped shingle space: shingles occurring in more than max_df docs
    (stop-shingles) are excluded from BOTH the pair generation and the
    set sizes — one inverted-index self-join + one groupBy, no separate
    candidate materialization. At scale the cap bounds the per-shingle
    pair blow-up to max_df^2."""
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


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.35, bucket_bits: int = 4
) -> DataFrame:
    """Embedding near-duplicate pairs via sign-LSH blocking + exact cosine
    verification within buckets. Recall < 1 by design (pairs straddling a
    sign hyperplane are missed) — the oracle replicates the same blocking,
    so results are exactly comparable."""
    from .similarity import _dot_q, cosine_q, with_quantized

    bucketed = with_quantized(embeddings).select(
        "vec_id", "q", "n2", sign_lsh_bucket("embedding", bucket_bits).alias("bucket")
    )
    a = bucketed.select(
        F.col("vec_id").alias("va"),
        F.col("q").alias("qa"),
        F.col("n2").alias("na2"),
        "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("vb"),
        F.col("q").alias("qb"),
        F.col("n2").alias("nb2"),
        "bucket",
    )
    pairs = a.join(b, "bucket").where(F.col("va") < F.col("vb"))
    scored = pairs.select(
        "va", "vb", cosine_q(_dot_q("qa", "qb"), "na2", "nb2").alias("cosine")
    )
    return scored.where(F.col("cosine") >= threshold)
