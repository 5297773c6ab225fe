"""Cross-engine numeric determinism helpers.

The driver's t2 gate hashes query output values after running the same query
on Spark and on DuckDB. Floating-point SUM is order-dependent, and Spark's
partial/final aggregation order differs run-to-run — so any metric that
aggregates DOUBLE columns must go through exact decimal arithmetic and only
convert to DOUBLE at the very end (a single deterministic cast).

Conventions used by every declared query and its oracle twin:
  - measures are cast to DECIMAL(18,4) before SUM  (`dec` / SQL_DEC)
  - multi-factor terms keep total precision <= 38 so neither engine rounds:
    (18,4) x (18,8) -> (37,12) exact in both Spark and DuckDB
  - averages = CAST(exact_sum AS DOUBLE) / count  (single IEEE division)
  - output columns are DOUBLE (identical bits on both engines) or
    integer/string types
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"
DEC8 = "decimal(18,8)"

SQL_DEC = "DECIMAL(18,4)"
SQL_DEC8 = "DECIMAL(18,8)"


def dec(c: Column | str) -> Column:
    """Exact fixed-point view of a measure column (pre-aggregation)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def dsum_expr(expr: Column, alias: str) -> Column:
    """Order-independent sum of an exact decimal expression, emitted as
    DOUBLE. Rounds to scale 4 first: a scale-4 decimal < ~9e11 has an
    exactly-representable integer mantissa, so decimal->double is a single
    correctly-rounded IEEE division on both Spark and DuckDB. (Casting a
    scale-12 sum directly can differ by 1 ulp between engines.)

    Oracle twin: CAST(ROUND(SUM(<expr>), 4) AS DOUBLE).
    """
    return F.round(F.sum(expr), 4).cast("double").alias(alias)


def dsum(c: Column | str, alias: str) -> Column:
    """Order-independent sum of a double measure, emitted as DOUBLE."""
    return F.sum(dec(c)).cast("double").alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Deterministic average: exact decimal sum, one double division."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)
