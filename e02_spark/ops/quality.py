"""Data-quality expectations — declarative constraint checking in one pass.

A 100 TB training-data pipeline gates every ingest batch on expectations
(null/range/set-membership/uniqueness) before it reaches the corpus. The
cost discipline: all row-level expectations are counted in a SINGLE
aggregation pass (one scan, map-side partials), and only key-uniqueness
needs its own shuffle (a groupBy on the key).

The reference's analog is the review gate's boolean predicates
(`pr-review-flow.yml:223-227`) — per-entity boolean checks aggregated to
a verdict; here generalized to dataset-level quality verdicts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Count violations of each boolean expectation in ONE scan.

    rules: [(rule_name, boolean_condition)] — a row VIOLATES a rule when
    the condition is not true (false OR null, so `col > 0` also flags
    nulls unless the rule says otherwise). Returns (rule, violations)
    with one row per rule, in one aggregation pass.
    """
    aggs = [
        F.sum(
            F.when(cond, F.lit(0)).otherwise(F.lit(1))
        ).cast("bigint").alias(name)
        for name, cond in rules
    ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{name}', `{name}`" for name, _ in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {stack_expr}) as (rule, violations)"
    )


def expect_unique(df: DataFrame, key_cols: list[str], rule_name: str) -> DataFrame:
    """Count rows participating in a duplicated key (0 when the key is
    unique). Same (rule, violations) shape as expect(); one shuffle on
    the key columns."""
    dups = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("violations"))
    )
    return dups.select(F.lit(rule_name).alias("rule"), "violations")
