"""Plan-quality regression tests: assert the physical plans stay the
plans we want — pushdown reaching the scan, dims broadcast, no nested-loop
interval joins, bucketed joins shuffle-free. A correct result with a bad
plan is a scale bug; these pin the good plans.
"""

from __future__ import annotations

from e02_spark.ops.bucketing import (
    colocated_join_revenue,
    join_has_no_shuffle,
    write_bucketed,
)
from e02_spark.io import load_table
from e02_spark.queries.relational import (
    q01_pricing_summary,
    q06_broadcast_dims,
    q09_interval_join_pairs,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushed_to_scan(spark):
    plan = _plan(q01_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read l_orderkey/l_partkey/l_suppkey
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q06_dims_are_broadcast(spark):
    plan = _plan(q06_broadcast_dims(spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_q09_interval_join_is_not_nested_loop(spark):
    plan = _plan(q09_interval_join_pairs(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_is_shuffle_free(spark):
    # writes into the default spark-warehouse dir (gitignored)
    write_bucketed(load_table(spark, SF, "orders"), "b_orders", "o_orderkey")
    write_bucketed(load_table(spark, SF, "lineitem"), "b_lineitem", "l_orderkey")
    df = colocated_join_revenue(spark)
    assert join_has_no_shuffle(df), _plan(df)
    rows = {r["o_orderpriority"]: r["n_items"] for r in df.collect()}
    assert sum(rows.values()) == 6000  # every lineitem joined exactly once
