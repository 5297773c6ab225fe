"""Incremental view maintenance for materialized aggregates, driven by a
change-data-feed.

`materialize_agg` builds a groupBy aggregate whose state is
SELF-MAINTAINABLE (the classic IVM property: the new state is a function
of the old state and the delta alone, never of the base table): per
group it keeps a row count, and per declared measure an exact-decimal
sum plus a non-null count. `apply_agg_delta` then folds a CDF frame
(rows tagged `_change_type` = 'insert' | 'delete', the contract of
ops/snapshot.snapshot_changes) into that state:

    count'   = count   + (#inserts - #deletes)          per group
    sum_x'   = sum_x   + (sum of inserted x - deleted x)
    nn_x'    = nn_x    + (#non-null inserted x - deleted x)

groups whose count reaches zero vanish; a sum whose non-null count
reaches zero reverts to NULL (the SQL SUM-of-nothing answer — the
auxiliary count is exactly what makes SUM maintainable under deletes
without re-scanning the base). An update in the feed is its
delete+insert pair, so no special casing.

Why this matters at 100 TB: recomputing a reporting aggregate over a
mutating lakehouse table costs O(table) per refresh; this costs
O(|delta|) — one shuffle of the change rows by the group keys plus a
join against the (small, one-row-per-group) aggregate state. Paired
with snapshot_changes, whose cost is O(changed files), a refresh never
touches unchanged data. MIN/MAX are deliberately absent: they are not
self-maintainable under deletes (a retracted max needs the base table
to find the runner-up) — callers needing them refresh those columns
separately or keep per-group heaps.

Sums are carried as DECIMAL (exact, order-independent — see num.py);
measures are cast through DECIMAL(18,4), so the maintained state is
bit-deterministic and hash-comparable across engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..num import DEC

_COUNT = "_ivm_count"
# Sums are stored at a FIXED decimal type: Spark widens sum(decimal)
# results per aggregation (28,4) and again per addition, so without the
# normalizing cast the state schema would drift one digit of precision
# per delta application until the 38 cap — breaking schema-stable
# persistence of the state and exact frame comparison. (38,4) holds any
# realistic accumulated sum and is closed under the + in apply.
_SUM_T = "decimal(38,4)"


def _nn(dst: str) -> str:
    return f"_ivm_nn_{dst}"


def materialize_agg(
    df: DataFrame, keys: list[str], sums: dict[str, str | Column]
) -> DataFrame:
    """Materialize the self-maintainable aggregate state of `df` grouped
    by `keys`: `_ivm_count` (BIGINT rows per group), and per entry
    dst -> measure in `sums` a DECIMAL sum `dst` plus its non-null count
    `_ivm_nn_<dst>`. The state IS the view — project `finish_agg` over it
    for presentation."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias(_COUNT)]
    for dst, src in sums.items():
        c = F.col(src) if isinstance(src, str) else src
        aggs.append(F.sum(c.cast(DEC)).cast(_SUM_T).alias(dst))
        aggs.append(F.count(c).cast("bigint").alias(_nn(dst)))
    return df.groupBy(*keys).agg(*aggs)


def apply_agg_delta(
    agg: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sums: dict[str, str | Column],
) -> DataFrame:
    """Fold a CDF frame into a `materialize_agg` state (same keys/sums).
    One aggregation over the delta + one full-outer join against the
    state, with NULL-SAFE key equality so NULL-keyed groups (which
    groupBy folds into one group) line up instead of cross-multiplying.
    Returns the updated state; groups with zero remaining rows drop."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    aggs = [F.sum(sign).cast("bigint").alias(_COUNT)]
    for dst, src in sums.items():
        c = F.col(src) if isinstance(src, str) else src
        aggs.append(F.sum(c.cast(DEC) * sign).cast(_SUM_T).alias(dst))
        aggs.append(
            F.sum(F.when(c.isNotNull(), sign).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(_nn(dst))
        )
    delta = changes.groupBy(*keys).agg(*aggs)

    a, d = agg.alias("_ivma"), delta.alias("_ivmd")
    cond = reduce(
        Column.__and__,
        [F.col(f"_ivma.{k}").eqNullSafe(F.col(f"_ivmd.{k}")) for k in keys],
    )
    joined = a.join(d, cond, "full_outer")

    def _add(col: str) -> Column:
        return F.coalesce(F.col(f"_ivma.{col}"), F.lit(0)) + F.coalesce(
            F.col(f"_ivmd.{col}"), F.lit(0)
        )

    out_cols = [
        F.coalesce(F.col(f"_ivma.{k}"), F.col(f"_ivmd.{k}")).alias(k)
        for k in keys
    ]
    out_cols.append(_add(_COUNT).cast("bigint").alias(_COUNT))
    for dst in sums:
        nn = _add(_nn(dst)).cast("bigint")
        # NULL-out an extinct sum BEFORE storing: 0-from-cancellation and
        # 0-from-no-values must stay distinguishable across further deltas
        out_cols.append(F.when(nn > 0, _add(dst)).cast(_SUM_T).alias(dst))
        out_cols.append(nn.alias(_nn(dst)))
    return joined.select(*out_cols).where(F.col(_COUNT) > 0)


def finish_agg(
    state: DataFrame, keys: list[str], sums: dict[str, str | Column],
    count_alias: str = "n_rows",
) -> DataFrame:
    """Presentation projection of a maintained state: BIGINT count plus
    each sum rounded to scale 4 and emitted as DOUBLE (the cross-engine
    determinism convention of num.dsum_expr)."""
    cols = [F.col(k) for k in keys]
    cols.append(F.col(_COUNT).alias(count_alias))
    cols.extend(
        F.round(F.col(dst), 4).cast("double").alias(dst) for dst in sums
    )
    return state.select(*cols)
