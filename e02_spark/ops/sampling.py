"""Deterministic hash-based splitting and sampling.

Training-data pipelines need train/valid/test assignment and per-source
downsampling that are (a) stable across runs and cluster layouts, (b)
joinable later (the same doc always lands in the same split), and (c)
executable as a pure filter — no RNG state, no shuffle, no driver
coordination. Keying on md5(doc_id) gives all three: the split is a
projection, Catalyst pushes the derived filter to the scan, and at 100 TB
the operator adds zero exchanges. The md5-hex prefix is identical in Spark
and DuckDB, so every split/sample is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, buckets: int) -> Column:
    """Deterministic bucket in [0, buckets): first 8 hex chars of
    md5(key as string), as an integer, mod buckets. 32 hash bits is enough
    spread for any practical bucket count while staying exactly
    representable as BIGINT in both engines."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
    return (h % buckets).cast("bigint")


def duck_hash_bucket_sql(key_sql: str, buckets: int) -> str:
    """DuckDB twin of hash_bucket ('0x' || hex-prefix cast)."""
    return (
        f"CAST(CAST('0x' || substring(md5(CAST({key_sql} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) % {buckets} AS BIGINT)"
    )


def split_column(key: Column | str, test_pct: int = 10, valid_pct: int = 10) -> Column:
    """'test' / 'valid' / 'train' from a 100-way hash bucket; boundaries
    are integer percent so the SQL twin is exact."""
    b = hash_bucket(key, 100)
    return (
        F.when(b < test_pct, F.lit("test"))
        .when(b < test_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("train"))
    )


def duck_split_sql(key_sql: str, test_pct: int = 10, valid_pct: int = 10) -> str:
    b = duck_hash_bucket_sql(key_sql, 100)
    return (
        f"CASE WHEN {b} < {test_pct} THEN 'test' "
        f"WHEN {b} < {test_pct + valid_pct} THEN 'valid' ELSE 'train' END"
    )
