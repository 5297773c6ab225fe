"""Text-analysis operators over the documents table.

All built from JVM-side primitives (split/explode/md5/groupBy) — no Python
UDFs in any hot path. Hash functions are md5-hex (identical output in Spark
and DuckDB), so every fingerprint/minhash/simhash is oracle-checkable.

Scale notes: token/shingle explosion is linear in corpus size and shuffles
on high-cardinality keys (token, shingle) — the standard inverted-index
build. Stopword/lexicon tables are broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["a", "the"]


def tokens(documents: DataFrame) -> DataFrame:
    """(doc_id, token) — one row per token occurrence (order-preserving)."""
    return documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )


def shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — DISTINCT word n-grams per document.

    The token array is materialized once per row before the n-gram
    transform (referencing split(text) inside the lambda would re-split
    the text for every gram — ~3x the work, no CSE inside higher-order
    function lambdas)."""
    toks = documents.select("doc_id", F.split("text", " ").alias("t"))
    gram = F.expr(
        f"transform(sequence(1, greatest(size(t) - {n - 1}, 0)),"
        f" i -> concat_ws(' ', slice(t, i, {n})))"
    )
    return toks.select("doc_id", F.explode(gram).alias("shingle")).distinct()


def minhash_signature(doc_shingles: DataFrame, k: int = 4) -> DataFrame:
    """(doc_id, h1..hk) — md5-seeded MinHash signature over the shingle set.

    h_s = min(md5('<s>:' || shingle)): md5 with a seed prefix approximates
    an independent random permutation per seed; identical in both engines.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"h{s}")
        for s in range(1, k + 1)
    ]
    return doc_shingles.groupBy("doc_id").agg(*aggs)


def duck_minhash_sql(k: int = 4) -> str:
    """DuckDB twin of minhash_signature: SELECT-list aggregate fragments
    (use over a (doc_id, shingle) relation, GROUP BY doc_id)."""
    return ", ".join(
        f"min(md5('{s}:' || shingle)) AS h{s}" for s in range(1, k + 1)
    )


def simhash32(doc_features: DataFrame, feature_col: str = "shingle") -> DataFrame:
    """(doc_id, simhash BIGINT) — 32-bit SimHash over a DISTINCT feature
    set (shingles by default — the token vocabulary of the driver corpus is
    tiny, so token-set SimHash would collide almost everywhere): bit b of
    md5(feature)'s first 8 hex nibbles votes +1/-1; the sign of each
    bit-position sum forms the fingerprint."""
    feats = doc_features.select("doc_id", F.col(feature_col).alias("f")).distinct()
    per_bit = (
        feats.select(
            "doc_id", "f", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit")
        )
        # 1-based hex char of md5 holding this bit, its nibble value, the bit
        .withColumn("_nc", F.expr("substring(md5(f), CAST(bit div 4 AS INT) + 1, 1)"))
        .withColumn("_nv", F.expr("locate(_nc, '0123456789abcdef') - 1"))
        .withColumn(
            "vote",
            F.expr("((_nv div CAST(pow(2, 3 - (bit % 4)) AS INT)) % 2) * 2 - 1"),
        )
    )
    bit_sums = per_bit.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.expr("CASE WHEN v > 0 THEN CAST(pow(2, 31 - bit) AS BIGINT) ELSE 0 END")
        )
        .cast("bigint")
        .alias("simhash")
    )


# DuckDB twin of simhash32 — expects a doc_shingles(doc_id, shingle) CTE.
DUCK_SIMHASH_SQL = """
per_bit AS (
  SELECT doc_id, bit,
    SUM(CASE WHEN (
      (strpos('0123456789abcdef',
              substring(md5(shingle), CAST(bit // 4 AS INT) + 1, 1)) - 1)
      // CAST(pow(2, 3 - (bit % 4)) AS INT)) % 2 = 1
      THEN 1 ELSE -1 END) AS v
  FROM (SELECT DISTINCT doc_id, shingle FROM doc_shingles)
  CROSS JOIN generate_series(0, 31) AS bt(bit)
  GROUP BY doc_id, bit
),
simhashes AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN v > 0 THEN CAST(pow(2, 31 - bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
  FROM per_bit GROUP BY doc_id
)"""


def quality_metrics(documents: DataFrame) -> DataFrame:
    """Per-doc quality signals: token counts, distinct ratio, stopword
    ratio, average token length — all exact-integer-derived doubles."""
    t = tokens(documents)
    stop = F.col("token").isin(STOPWORDS)
    agg = t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct"),
        F.sum(F.when(stop, 1).otherwise(0)).cast("bigint").alias("n_stop"),
        F.sum(F.length("token")).cast("bigint").alias("sum_len"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias("distinct_ratio"),
        (F.col("n_stop").cast("double") / F.col("n_tokens")).alias("stop_ratio"),
        (F.col("sum_len").cast("double") / F.col("n_tokens")).alias("avg_token_len"),
    )
