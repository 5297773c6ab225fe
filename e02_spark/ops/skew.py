"""Skew-aware aggregation: two-phase (salted) aggregation for hot keys.

At 100 TB, a groupBy on a key with a few very hot values (the reference's
analog: utm_campaign_to_product is called from almost every mart file, so
callee-keyed aggregation of call sites is skewed) puts one reducer on the
hot key. The standard fix is salting: phase 1 aggregates on (key, salt)
spreading the hot key over N partitions with map-side partial aggregation;
phase 2 re-aggregates the N partials per key. For algebraic aggregates
(sum/count/min/max) the result is identical to the direct groupBy.

AQE's skew-join handling covers JOIN skew automatically; aggregation skew
with `collect_set`-style holistic aggregates (ObjectHashAggregate) is where
manual salting still earns its keep — the per-key set union in phase 2
operates on N pre-deduped partial sets instead of the raw row stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: aggs is [(fn, col, alias)] with fn in
    {sum, count, min, max}. Deterministic salt (hash of all columns mod
    n_salts) so results are reproducible run-to-run."""
    salt = (F.abs(F.hash(*[F.col(c) for c in df.columns])) % n_salts).alias("_salt")
    phase1_aggs: list[Column] = []
    phase2_aggs: list[Column] = []
    for fn, col, alias in aggs:
        if fn == "count":
            phase1_aggs.append(F.count(col).alias(f"_p_{alias}"))
            phase2_aggs.append(F.sum(f"_p_{alias}").cast("bigint").alias(alias))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_p_{alias}"))
            phase2_aggs.append(F.sum(f"_p_{alias}").alias(alias))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(f"_p_{alias}"))
            phase2_aggs.append(F.min(f"_p_{alias}").alias(alias))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(f"_p_{alias}"))
            phase2_aggs.append(F.max(f"_p_{alias}").alias(alias))
        else:
            raise ValueError(f"unsupported aggregate for salting: {fn}")
    phase1 = df.select("*", salt).groupBy(*key_cols, "_salt").agg(*phase1_aggs)
    return phase1.groupBy(*key_cols).agg(*phase2_aggs)


def salted_collect_set(
    df: DataFrame, key_cols: list[str], value_col: str, alias: str, n_salts: int = 16
) -> DataFrame:
    """Skew-safe collect_set: per-(key, salt) partial sets, then a flatten +
    array_distinct + sort merge per key. Identical result to a direct
    sort_array(collect_set(...)), but the hot key's set union happens over
    n_salts pre-deduped partials."""
    salt = (F.abs(F.hash(F.col(value_col))) % n_salts).alias("_salt")
    phase1 = (
        df.select(*key_cols, value_col, salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.collect_set(value_col).alias("_part"))
    )
    return phase1.groupBy(*key_cols).agg(
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("_part")))).alias(alias)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's rows uniformly, replicate
    the small side once per salt value, join on (key…, salt). The hot key's
    rows spread over n_salts reducers instead of one. Result is row-for-row
    identical to big.join(small, on, how).

    Use when AQE's skew-join split can't kick in (e.g. the skewed side is
    already partitioned by the join key from a prior stage, or the join is
    sort-merge over a pre-shuffled cache). Cost: small side is materialized
    n_salts times — keep n_salts * |small| well under shuffle partition
    size. `how` may be "inner" or "left" (left = big side preserved).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_vals = F.array(*[F.lit(i) for i in range(n_salts)])
    # salt by hash of ALL big-side columns (NOT the join keys — a key-only
    # hash would put every hot-key row in the same bucket, defeating the
    # point) so results stay deterministic run-to-run. pmod, not abs(..)%:
    # abs(Integer.MIN_VALUE) overflows negative and a negative salt would
    # silently drop that row from the inner join.
    big_s = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn("_salt", F.explode(salt_vals))
    joined = big_s.join(small_s, [*on, "_salt"], how)
    return joined.drop("_salt")
