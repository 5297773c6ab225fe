"""Interval / time-proximity joins without O(n^2) theta joins.

A naive `a JOIN b ON b.ts BETWEEN a.ts - tol AND a.ts + tol` plans as a
BroadcastNestedLoopJoin in Spark — quadratic work that dies far below 100 TB.
The scalable formulation buckets time into `tol`-wide cells and equi-joins on
the cell id: a pair within `tol` must land in the same or an adjacent cell,
so one side additionally explodes to its 3 neighboring cells. The equi-join
shuffles on the bucket key (hash-partitioned, AQE-coalesced) and the exact
predicate is applied post-join. Work is O(n * density) instead of O(n^2).

Timestamp comparisons are done in integer microseconds (`unix_micros`) so
the boundary semantics are bit-exact against engines that compare native
timestamp types (the DuckDB oracle's BETWEEN ... INTERVAL).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_proximity_pairs(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    tolerance_sec: int = 1,
    payload_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """All unordered row pairs (a, b) with |a.ts - b.ts| <= tolerance and
    a.id < b.id. Output: a_<id>, b_<id>, a_<payload>..., b_<payload>...
    """
    tol_us = int(tolerance_sec) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    cell = F.floor(us / F.lit(tol_us))

    keep = [id_col, ts_col, *payload_cols]
    a = df.select(
        cell.alias("_cell"), *[F.col(c).alias(f"a_{c}") for c in keep]
    )
    b = df.select(
        F.explode(F.array(cell - 1, cell, cell + 1)).alias("_cell"),
        *[F.col(c).alias(f"b_{c}") for c in keep],
    )
    a_us = F.unix_micros(F.col(f"a_{ts_col}"))
    b_us = F.unix_micros(F.col(f"b_{ts_col}"))
    return (
        a.join(b, "_cell")
        .where(
            (F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
            & (F.abs(a_us - b_us) <= F.lit(tol_us))
        )
        .drop("_cell")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_ts: str,
    bucket_width_sec: int = 3600,
) -> DataFrame:
    """Join right-side point events into left-side [start, end] intervals
    (inclusive) via bucketing: each interval explodes to the cells it spans,
    each point maps to one cell, equi-join on cell, exact filter after.

    Requires intervals no longer than ~a few thousand cells (explode factor);
    choose bucket_width_sec accordingly — for bounded-length intervals this
    is linear in |left| + |right| at any scale.
    """
    w_us = int(bucket_width_sec) * 1_000_000
    ls = F.unix_micros(F.col(left_start))
    le = F.unix_micros(F.col(left_end))
    rt = F.unix_micros(F.col(right_ts))

    lcell = F.explode(F.sequence(F.floor(ls / w_us), F.floor(le / w_us))).alias("_cell")
    l = left.select("*", lcell)
    r = right.select("*", F.floor(rt / w_us).alias("_cell"))
    return (
        l.join(r, "_cell")
        .where((rt >= ls) & (rt <= le))
        .drop("_cell")
    )
