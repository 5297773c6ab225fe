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

MIN/MAX (the `minmax` measures) are NOT self-maintainable under
deletes — a retracted extreme needs the base to find the runner-up —
so they use the standard recompute-on-retract answer: inserts fold
monotonically (least/greatest against the stored extreme), and a
delete marks its group DIRTY only when it could have removed the
extreme (deleted min <= stored min, or deleted max >= stored max —
multiplicity is unknowable from the state, so equality retracts
conservatively). Dirty groups — and only they — are re-aggregated from
`base` via one semi-join, keeping refresh O(|delta| +
affected-group data) instead of O(table). The CDF names the affected
groups for free.

Why this matters at 100 TB: recomputing a reporting aggregate over a
mutating lakehouse table costs O(table) per refresh; this costs
O(|delta|) — one shuffle of the change rows by the group keys plus a
join against the (small, one-row-per-group) aggregate state. Paired
with snapshot_changes, whose cost is O(changed files), a refresh never
touches unchanged data.

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


def _mn(dst: str) -> str:
    return f"_ivm_mn_{dst}"


def _mx(dst: str) -> str:
    return f"_ivm_mx_{dst}"


def materialize_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str | Column],
    minmax: dict[str, str | Column] | None = None,
) -> DataFrame:
    """Materialize the self-maintainable aggregate state of `df` grouped
    by `keys`: `_ivm_count` (BIGINT rows per group), and per entry
    dst -> measure in `sums` a DECIMAL sum `dst` plus its non-null count
    `_ivm_nn_<dst>`. Each entry dst -> measure in `minmax` adds a
    DECIMAL `_ivm_mn_<dst>` / `_ivm_mx_<dst>` pair (maintained by
    apply_agg_delta's recompute-on-retract). The state IS the view —
    project `finish_agg` over it for presentation."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias(_COUNT)]
    for dst, src in sums.items():
        c = F.col(src) if isinstance(src, str) else src
        aggs.append(F.sum(c.cast(DEC)).cast(_SUM_T).alias(dst))
        aggs.append(F.count(c).cast("bigint").alias(_nn(dst)))
    for dst, src in (minmax or {}).items():
        c = F.col(src) if isinstance(src, str) else src
        aggs.append(F.min(c.cast(DEC)).cast(_SUM_T).alias(_mn(dst)))
        aggs.append(F.max(c.cast(DEC)).cast(_SUM_T).alias(_mx(dst)))
    return df.groupBy(*keys).agg(*aggs)


def apply_agg_delta(
    agg: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sums: dict[str, str | Column],
    minmax: dict[str, str | Column] | None = None,
    base: DataFrame | None = None,
) -> DataFrame:
    """Fold a CDF frame into a `materialize_agg` state (same keys/sums/
    minmax). One aggregation over the delta + one full-outer join against
    the state, with NULL-SAFE key equality so NULL-keyed groups (which
    groupBy folds into one group) line up instead of cross-multiplying.
    Returns the updated state; groups with zero remaining rows drop.

    With `minmax`, `base` (the POST-delta table) is required: inserts
    fold monotonically, and groups whose deletes could have retracted a
    stored extreme (deleted min <= stored min / deleted max >= stored
    max) are re-aggregated from `base` through one semi-join — only the
    dirty groups are scanned, never the whole table."""
    minmax = minmax or {}
    if minmax and base is None:
        raise ValueError(
            "apply_agg_delta: minmax maintenance needs `base` (the "
            "post-delta table) to recompute retracted extremes"
        )
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    is_ins = F.col("_change_type") == "insert"
    aggs = [F.sum(sign).cast("bigint").alias(_COUNT)]
    for dst, src in sums.items():
        c = F.col(src) if isinstance(src, str) else src
        aggs.append(F.sum(c.cast(DEC) * sign).cast(_SUM_T).alias(dst))
        aggs.append(
            F.sum(F.when(c.isNotNull(), sign).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(_nn(dst))
        )
    for dst, src in minmax.items():
        c = F.col(src) if isinstance(src, str) else src
        d = c.cast(DEC)
        aggs.append(
            F.min(F.when(is_ins, d)).cast(_SUM_T).alias(f"_ins{_mn(dst)}")
        )
        aggs.append(
            F.max(F.when(is_ins, d)).cast(_SUM_T).alias(f"_ins{_mx(dst)}")
        )
        aggs.append(
            F.min(F.when(~is_ins, d)).cast(_SUM_T).alias(f"_del{_mn(dst)}")
        )
        aggs.append(
            F.max(F.when(~is_ins, d)).cast(_SUM_T).alias(f"_del{_mx(dst)}")
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
    dirty_parts = []
    for dst in minmax:
        smn, smx = F.col(f"_ivma.{_mn(dst)}"), F.col(f"_ivma.{_mx(dst)}")
        dmn, dmx = (
            F.col(f"_ivmd._del{_mn(dst)}"),
            F.col(f"_ivmd._del{_mx(dst)}"),
        )
        # a delete can only retract an extreme it reaches; equality is
        # conservative (multiplicity unknowable from the state). A stored
        # NULL extreme with a non-null delete is an inconsistent feed —
        # recompute rather than trust it.
        dirty_parts.append(
            dmn.isNotNull()
            & (smn.isNull() | (dmn <= smn) | (dmx >= smx))
        )
        out_cols.append(
            F.least(smn, F.col(f"_ivmd._ins{_mn(dst)}"))
            .cast(_SUM_T)
            .alias(_mn(dst))
        )
        out_cols.append(
            F.greatest(smx, F.col(f"_ivmd._ins{_mx(dst)}"))
            .cast(_SUM_T)
            .alias(_mx(dst))
        )
    if minmax:
        out_cols.append(
            reduce(Column.__or__, dirty_parts).alias("_ivm_dirty")
        )
    out = joined.select(*out_cols).where(F.col(_COUNT) > 0)
    if not minmax:
        return out
    # recompute-on-retract: ONLY the dirty groups re-aggregate, from the
    # post-delta base, through one semi-join (the build side is the dirty
    # key set — delta-bounded, so AQE broadcasts it). Lazy localCheckpoint
    # (not persist) so the shared scan is computed once and the blocks are
    # reclaimed when the state frame is dereferenced.
    out = out.localCheckpoint(eager=False)
    dirty_keys = out.where(F.col("_ivm_dirty")).select(*keys)
    fr_aggs = []
    for dst, src in minmax.items():
        c = F.col(src) if isinstance(src, str) else src
        fr_aggs.append(F.min(c.cast(DEC)).cast(_SUM_T).alias(_mn(dst)))
        fr_aggs.append(F.max(c.cast(DEC)).cast(_SUM_T).alias(_mx(dst)))
    dk = dirty_keys.alias("_ivmk")
    bcond = reduce(
        Column.__and__,
        [F.col(f"_ivmb.{k}").eqNullSafe(F.col(f"_ivmk.{k}")) for k in keys],
    )
    fresh = (
        base.alias("_ivmb")
        .join(dk, bcond, "left_semi")
        .groupBy(*keys)
        .agg(*fr_aggs)
        .alias("_ivmf")
    )
    o = out.alias("_ivmo")
    fcond = reduce(
        Column.__and__,
        [F.col(f"_ivmo.{k}").eqNullSafe(F.col(f"_ivmf.{k}")) for k in keys],
    )
    final_cols = [F.col(f"_ivmo.{k}").alias(k) for k in keys]
    final_cols.append(F.col(f"_ivmo.{_COUNT}").alias(_COUNT))
    for dst in sums:
        final_cols.append(F.col(f"_ivmo.{dst}").alias(dst))
        final_cols.append(F.col(f"_ivmo.{_nn(dst)}").alias(_nn(dst)))
    for dst in minmax:
        pick = F.col("_ivmo._ivm_dirty")
        final_cols.append(
            F.when(pick, F.col(f"_ivmf.{_mn(dst)}"))
            .otherwise(F.col(f"_ivmo.{_mn(dst)}"))
            .cast(_SUM_T)
            .alias(_mn(dst))
        )
        final_cols.append(
            F.when(pick, F.col(f"_ivmf.{_mx(dst)}"))
            .otherwise(F.col(f"_ivmo.{_mx(dst)}"))
            .cast(_SUM_T)
            .alias(_mx(dst))
        )
    return o.join(fresh, fcond, "left").select(*final_cols)


def finish_agg(
    state: DataFrame, keys: list[str], sums: dict[str, str | Column],
    count_alias: str = "n_rows",
    minmax: dict[str, str | Column] | None = None,
) -> DataFrame:
    """Presentation projection of a maintained state: BIGINT count plus
    each sum rounded to scale 4 and emitted as DOUBLE (the cross-engine
    determinism convention of num.dsum_expr); each minmax entry emits
    `min_<dst>` / `max_<dst>` the same way."""
    cols = [F.col(k) for k in keys]
    cols.append(F.col(_COUNT).alias(count_alias))
    cols.extend(
        F.round(F.col(dst), 4).cast("double").alias(dst) for dst in sums
    )
    for dst in minmax or {}:
        cols.append(
            F.round(F.col(_mn(dst)), 4).cast("double").alias(f"min_{dst}")
        )
        cols.append(
            F.round(F.col(_mx(dst)), 4).cast("double").alias(f"max_{dst}")
        )
    return state.select(*cols)
