"""Bucketed (co-located) joins: pre-shuffle once at write time, join
shuffle-free forever after.

At 100 TB the orders⋈lineitem join shuffles both tables on every run. If
both are written bucketed by the join key into the warehouse, Spark reads
matching buckets pairwise and plans a SortMergeJoin with NO Exchange on
either side — the single biggest recurring-cost lever for a fact-to-fact
join pipeline. This module writes bucketed copies and exposes the
co-located join; tests assert the Exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist df as a bucketed+sorted warehouse table (overwrite)."""
    import shutil
    from pathlib import Path

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed prior run can leave an orphan managed-table location that
    # DROP TABLE (table absent from catalog) does not clear
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
        "file:"
    )
    orphan = Path(wh) / table.split(".")[-1]
    if orphan.exists():
        shutil.rmtree(orphan)
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .saveAsTable(table)
    )


def colocated_join_revenue(spark: SparkSession) -> DataFrame:
    """orders ⋈ lineitem on the bucketed key — revenue per order priority.
    Requires bucketed tables `b_orders` / `b_lineitem` (write_bucketed).
    The join itself introduces no shuffle; only the final small groupBy
    exchanges data."""
    o = spark.table("b_orders")
    l = spark.table("b_lineitem")
    # MERGE hint: at fact-to-fact scale this is a sort-merge join; without
    # the hint the tiny test tables would go broadcast and hide the
    # bucketing behavior we're demonstrating
    j = o.hint("merge").join(l, o.o_orderkey == l.l_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
    )


def join_has_no_shuffle(df: DataFrame) -> bool:
    """True iff the physical plan contains no Exchange BEFORE the join
    (bucketed scan feeding the join directly). The post-join aggregation
    exchange is allowed."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_pos = plan.find("SortMergeJoin")
    if join_pos < 0:
        return False
    below_join = plan[join_pos:]
    return "Exchange" not in below_join
