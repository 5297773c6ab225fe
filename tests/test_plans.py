"""Plan-quality regression tests: assert the physical plans stay the
plans we want — pushdown reaching the scan, dims broadcast, no nested-loop
interval joins, bucketed joins shuffle-free. A correct result with a bad
plan is a scale bug; these pin the good plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_q61_aggregates_before_window(spark):
    """q61 must range-window over per-qty partials, not raw lineitem rows:
    the plan has a HashAggregate BELOW the Window operator."""
    from e02_spark.queries.relational3 import q61_range_frame

    plan = _plan(q61_range_frame(spark, SF))
    assert "Window" in plan
    win_pos = plan.index("Window")
    assert "HashAggregate" in plan[win_pos:], plan  # agg feeds the window
    # and no row-level DISTINCT on top (the pre-agg replaced it)
    assert plan.count("Window") == 1


def test_q65_salted_join_is_hash_join(spark):
    """The salted join must stay an equi hash join on (key, salt) — never
    a nested-loop/cartesian fallback."""
    from e02_spark.queries.relational3 import q65_salted_join_revenue

    plan = _plan(q65_salted_join_revenue(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q69_partial_aggregation_before_shuffle(spark):
    """Centroid sums must combine map-side: partial_sum/partial_count in
    the plan below the exchange (Spark's two-phase hash aggregation)."""
    from e02_spark.queries.relational3 import q69_embedding_centroids

    plan = _plan(q69_embedding_centroids(spark, SF))
    assert "partial_sum" in plan or "partial_count" in plan, plan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned parquet sink + partition-pruned scan: a
    filter on the partition column must reach the scan as a
    PartitionFilter and read only the matching directory."""
    orders = load_table(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("o_year").parquet(out)

    back = spark.read.parquet(out).where(F.col("o_year") == 1995)
    plan = _plan(back)
    assert "PartitionFilters" in plan
    assert "o_year" in plan.split("PartitionFilters")[1][:200], plan
    got_years = {r.o_year for r in back.select("o_year").distinct().collect()}
    assert got_years == {1995}
    # the pruned read returns exactly the 1995 directory's rows (and the
    # dataset really is multi-partition, so pruning is doing work)
    import glob

    assert len(glob.glob(out + "/o_year=*")) > 1
    only_1995 = spark.read.parquet(out + "/o_year=1995")
    assert back.count() == only_1995.count() > 0


def test_q73_blocked_fuzzy_join_is_hash_join(spark):
    """The levenshtein pair search must join on the (brand, size) block
    key — an equi hash/merge join — with the distance predicate applied
    post-join, never a nested-loop over all part pairs."""
    from e02_spark.queries.relational3 import q73_fuzzy_name_pairs

    plan = _plan(q73_fuzzy_name_pairs(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dynamic_partition_pruning_on_fact_join(spark, tmp_path):
    """DPP: joining a partitioned fact to a filtered dim must inject a
    dynamicpruning subquery on the fact's partition column — at 100 TB
    this is what keeps a dim-filtered fact join from scanning every
    partition."""
    orders = load_table(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    orders.write.mode("overwrite").partitionBy("o_year").parquet(out)
    fact = spark.read.parquet(out)
    # DPP fires only when the dim side carries a real (non-join-column)
    # filter to derive the pruning subquery from
    years = spark.createDataFrame(
        [(y, "keep" if y <= 1996 else "drop") for y in range(1992, 2002)],
        "o_year INT, tag STRING",
    ).where(F.col("tag") == "keep")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    joined = fact.join(years, "o_year").groupBy("tag").count()
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.collect()[0]["count"] > 0


def test_observe_metrics_instrumentation(spark):
    """df.observe(): per-action pipeline metrics without a second scan —
    the operational hook for row-count/quality monitoring in production
    jobs."""
    from pyspark.sql import Observation

    obs = Observation("lineitem_metrics")
    li = load_table(spark, SF, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty_sum"),
    )
    n = li.where(F.col("l_quantity") > 25).count()
    m = obs.get
    assert m["rows_seen"] == 6000  # observed BEFORE the filter
    assert n < 6000
    assert m["qty_sum"] is not None


def test_q77_capstone_has_no_cartesian(spark):
    """The corpus-curation composition (LSH pairs → CC → anti-join →
    aggregate) must stay equi-join-only end to end."""
    from e02_spark.queries.llm_q import q77_corpus_curation

    plan = _plan(q77_corpus_curation(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q42_ivf_assignment_has_no_window(spark):
    """The nearest-centroid argmax must be a max_by hash aggregation
    (map-side combinable), not a Window row_number — a Window here is a
    full sort-shuffle of the n_vectors x n_centroids product."""
    from e02_spark.queries.llm_q import q42_ann_ivf

    plan = _plan(q42_ann_ivf(spark, SF))
    assert "Window" not in plan, plan
    assert "max_by" in plan, plan


def test_q52_ml_verification_has_no_cartesian(spark):
    """The ML-LSH exact-verification joins must all be equi-joins —
    candidate generation and shingle verification stay bounded."""
    from e02_spark.queries.llm_q import q52_ml_minhash_lsh

    plan = _plan(q52_ml_minhash_lsh(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q99_semantic_dedup_plan(spark):
    """semantic_dedup's only non-equi join must be the deliberate
    broadcast-centroid cross (8 rows broadcast, the IVF assignment
    pattern); the within-cluster pair join must be a hash equi-join on
    cluster id — never a cartesian over the vector corpus."""
    from e02_spark.io import load_table
    from e02_spark.ops.similarity import semantic_dedup

    df = semantic_dedup(load_table(spark, SF, "embeddings"))
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the assignment subtree appears once per consumer, so BNLJ lines can
    # repeat — but every one must be the bounded broadcast-centroid cross
    # (BuildRight over the 8-row centroid table), never a corpus x corpus
    # nested loop
    bnlj_lines = [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert bnlj_lines, plan
    assert all("BuildRight" in l and "Cross" in l for l in bnlj_lines), plan
    # the within-cluster pair pass must be an equi-join keyed on cid
    assert any(
        "Join" in l and "cid" in l and "NestedLoop" not in l
        for l in plan.splitlines()
    ), plan


def test_q100_q101_stay_jvm_side(spark):
    """The round-5 curation stages (PII scrub, sequence packing) must run
    entirely in codegen — no Python UDF evaluation anywhere in the plan —
    and packing must cost exactly its one per-lang window exchange."""
    from e02_spark.queries.curation_q import (
        q100_pii_redaction,
        q101_sequence_packing,
    )

    for df in (q100_pii_redaction(spark, SF), q101_sequence_packing(spark, SF)):
        plan = _plan(df)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    pack_plan = _plan(q101_sequence_packing(spark, SF))
    # one exchange: the hashpartitioning(lang) feeding the window cumsum
    assert pack_plan.count("Exchange hashpartitioning") == 1, pack_plan


def test_q101_packing_invariants(spark):
    """Concat-and-chunk invariants: per-lang streams are contiguous (each
    doc starts where the previous ended), every doc spans >= 1 block, and
    block indexes are nondecreasing in stream order."""
    from collections import defaultdict

    from e02_spark.queries.curation_q import q101_sequence_packing

    rows = q101_sequence_packing(spark, SF).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    assert by_lang
    B = 512
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["doc_id"])
        start = 0
        prev_block = 0
        for r in rs:
            assert r["n_blocks"] >= 1
            assert r["first_block"] == start // B, (lang, r)
            expected_span = (start + r["n_tokens"] - 1) // B - start // B + 1
            assert r["n_blocks"] == expected_span, (lang, r)
            assert r["first_block"] >= prev_block
            prev_block = r["first_block"]
            start += r["n_tokens"]


def test_q105_mixture_broadcast_and_jvm_side(spark):
    """Temperature mixture sampling (round 6): the per-source rate table
    must reach the documents scan as a BROADCAST join (no shuffle of the
    corpus for a handful of rate rows) and the whole query stays in
    codegen — no Python UDF evaluation."""
    from e02_spark.queries.curation_q import q105_temperature_mixture

    plan = _plan(q105_temperature_mixture(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_zorder_key_stays_codegen(spark):
    """The Morton key is getbit/shiftleft arithmetic — it must plan as a
    plain projection (no UDF), so the z-order write costs exactly its
    one range exchange."""
    from e02_spark.ops.layout import bucketize, zorder_key

    e = load_table(spark, SF, "events").select(
        F.unix_seconds("ts").alias("t"), F.col("value").cast("double").alias("v")
    )
    df = e.select(
        zorder_key([bucketize("t", 0, 1, 8), bucketize("v", 0, 1, 8)], 8).alias("zk")
    )
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_join_strategy_hints_honored(spark):
    """The hint surface a tuning pass relies on: SHUFFLE_HASH forces a
    ShuffledHashJoin and MERGE forces a SortMergeJoin on the same join,
    overriding the size-based default — the explicit levers when AQE's
    estimates are wrong at 100 TB."""
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    base = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    plan_sh = _plan(base)
    assert "ShuffledHashJoin" in plan_sh, plan_sh

    merged = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    plan_m = _plan(merged)
    assert "SortMergeJoin" in plan_m, plan_m


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime bloom-filter join pruning — the lever that shrinks a
    shuffle join's fact-side exchange when the dim carries a selective
    non-partition filter: Spark builds a bloom filter from the filtered
    dim's join keys and injects `might_contain` into the fact scan's
    Filter, so non-matching fact rows die BEFORE the shuffle instead of
    after the join. At 100 TB this is often the difference between
    shuffling 100 TB and shuffling the ~1% that survives; DPP covers the
    partition-column case, this covers every other selective dim filter.
    Thresholds are scoped down because the default application-side
    trigger is 10 GB — far above any test fixture."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(j)
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        n_filtered = j.collect()[0]["n"]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    # result identity: the injected filter must not change the answer
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "might_contain" not in _plan(plain)
    assert plain.collect()[0]["n"] == n_filtered


def test_q111_two_level_build_single_shuffle(spark):
    """q111's bounded-state sequence build costs ONE data shuffle: the
    user_id repartition satisfies the clustering requirement of both the
    (user_id, seg) and the (user_id) aggregations, so neither groupBy
    plans its own Exchange (the only other exchange is the final
    SinglePartition scalar agg over ~1 row per user-pattern)."""
    from e02_spark.queries.relational3 import q111_sequence_match

    plan = _plan(q111_sequence_match(spark, SF))
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    data_ex = [ln for ln in ex if "SinglePartition" not in ln]
    assert len(data_ex) == 1, plan
    assert "REPARTITION_BY_COL" in data_ex[0], plan


def test_snapshot_dv_antijoin_broadcasts(spark, tmp_path):
    """The merge-on-read read path: subtracting positional delete vectors
    plans as a BROADCAST anti-join (the tombstone set is the build side),
    never a sort-merge shuffle of the table — the property that keeps
    MoR reads ~free between maintenance passes at 100 TB."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(5000).selectExpr("id", "id * 2 AS v"), table,
        mode="overwrite", n_files=4, cluster_by=["id"], stats_cols=["id"],
    )
    S.snapshot_merge(
        spark, table, spark.range(0, 5000, 100).selectExpr("id"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    df = S.snapshot_read(spark, table)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert df.count() == 4950


def test_snapshot_eq_delete_read_path_broadcasts(spark, tmp_path):
    """The equality-delete read path: the file->seq map attaches via a
    broadcast join and the key tombstones subtract via a broadcast
    anti-join — the probe (table) side never shuffles, so eq reads stay
    ~free between maintenance passes at 100 TB exactly like MoR DVs."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(5000).selectExpr("id", "id * 2 AS v"), table,
        mode="overwrite", n_files=4, cluster_by=["id"], stats_cols=["id"],
    )
    S.snapshot_merge(
        spark, table, spark.range(0, 5000, 100).selectExpr("id"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="eq",
    )
    df = S.snapshot_read(spark, table)
    plan = _plan(df)
    assert "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # no data-distributing exchange: broadcasts only (the scan side keeps
    # its partitioning through both metadata-sized joins)
    assert not [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln
    ], plan
    assert df.count() == 4950


def test_snapshot_colocated_join_has_no_shuffle(spark, tmp_path):
    """Storage-partitioned join over snapshot tables: both sides bucket-
    partitioned by the same hidden transform join with ZERO shuffle
    exchange in the join subtree — per-bucket co-located scans, unioned.
    Result equals the naive join exactly."""
    from e02_spark.ops import snapshot as S
    from e02_spark.ops.bucketing import snapshot_colocated_join

    ta, tb = str(tmp_path / "orders"), str(tmp_path / "cust")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, SF, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    S.snapshot_write(
        orders, ta, mode="overwrite", n_files=8,
        partition_spec=[("bucket", "o_custkey", 8)],
    )
    S.snapshot_write(
        cust, tb, mode="overwrite", n_files=8,
        partition_spec=[("bucket", "c_custkey", 8)],
    )
    df = snapshot_colocated_join(spark, ta, tb, "o_custkey", "c_custkey")
    plan = _plan(df)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastHashJoin" in plan
    got = df.count()
    want = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "inner"
    ).count()
    assert got == want > 0
    # mismatched bucket counts are rejected by name
    tc = str(tmp_path / "cust16")
    S.snapshot_write(
        cust, tc, mode="overwrite", n_files=16,
        partition_spec=[("bucket", "c_custkey", 16)],
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket counts differ"):
        snapshot_colocated_join(spark, ta, tc, "o_custkey", "c_custkey")
    # MoR deletes compose: tombstoned orders drop from the joined result
    S.snapshot_merge(
        spark, ta,
        orders.where("o_orderkey % 2 = 0").select("o_orderkey", "o_custkey",
                                                  "o_totalprice"),
        on=["o_orderkey"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    got2 = snapshot_colocated_join(
        spark, ta, tb, "o_custkey", "c_custkey"
    ).count()
    want2 = orders.where("o_orderkey % 2 = 1").join(
        cust, orders.o_custkey == cust.c_custkey, "inner"
    ).count()
    assert got2 == want2


def test_snapshot_colocated_join_edge_cases(spark, tmp_path):
    """Disjoint bucket sets are a legitimately EMPTY inner join (never a
    raise); boundless files (all-NULL keys record no parquet min/max)
    plan into every bucket and their NULL keys drop via the re-derived
    row filter; the store registry leaves URI prefixes unmangled."""
    from e02_spark.ops import snapshot as S
    from e02_spark.ops.bucketing import snapshot_colocated_join

    ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
    # keys chosen so A's and B's buckets are disjoint under crc32 % 8
    import zlib

    ka = next(k for k in range(100) if zlib.crc32(str(k).encode()) % 8 == 0)
    kb = next(k for k in range(100) if zlib.crc32(str(k).encode()) % 8 == 3)
    S.snapshot_write(
        spark.createDataFrame([(ka, 1)], "k bigint, va bigint"),
        ta, mode="overwrite", n_files=1,
        partition_spec=[("bucket", "k", 8)],
    )
    S.snapshot_write(
        spark.createDataFrame([(kb, 2)], "k bigint, vb bigint"),
        tb, mode="overwrite", n_files=1,
        partition_spec=[("bucket", "k", 8)],
    )
    empty = snapshot_colocated_join(spark, ta, tb, "k")
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "va", "vb"}
    # all-NULL-key file on one side: planned everywhere, joins nothing
    S.snapshot_write(
        spark.createDataFrame([(None, 9), (kb, 7)], "k bigint, va bigint"),
        ta, mode="append", n_files=1,
    )
    got = snapshot_colocated_join(spark, ta, tb, "k").collect()
    assert [(r["k"], r["va"], r["vb"]) for r in got] == [(kb, 7, 2)]
    # rows_by_bucket spreads a boundless file's count across ALL buckets
    # instead of dumping it into bucket 0 (broadcast-side estimate skew):
    # an 8-row all-NULL-key file (no parquet min/max → no hidden bounds)
    # must contribute 1 row-equivalent to EVERY bucket, and the total
    # row-count estimate must be preserved
    from e02_spark.ops.bucketing import snapshot_bucket_layout

    _, _, rows_before = snapshot_bucket_layout(ta, "k")
    total_before = sum(rows_before.values())
    S.snapshot_write(
        spark.createDataFrame([(None, i) for i in range(8)],
                              "k bigint, va bigint"),
        ta, mode="append", n_files=1,
    )
    _, by_bucket, rows = snapshot_bucket_layout(ta, "k")
    assert abs(sum(rows.values()) - (total_before + 8)) < 1e-9
    for b in range(8):
        assert rows.get(b, 0) >= rows_before.get(b, 0) + 1 - 1e-9, (b, rows)
