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


# --------------------------------------------------------------------------
# Storage-partitioned join over SNAPSHOT tables (the Iceberg SPJ shape):
# two snapshot tables bucket-partitioned by the same hidden transform on
# their join keys join WITHOUT the all-to-all shuffle a naive join pays
# on both sides — the co-location was paid once at write time and is
# recorded in each file's hidden-column stats.
# --------------------------------------------------------------------------


def snapshot_bucket_layout(table: str, key: str, manifest: dict | None = None):
    """The table's bucket layout on `key`: (transform, {bucket_id:
    [file paths]}, {bucket_id: manifest rows}). A file is assigned to
    EVERY bucket its hidden-column [min,max] covers: snapshot_write's
    hidden-first range clustering makes almost every file single-bucket
    (the steady state), and a boundary file spanning two buckets is
    simply planned into both — the join then re-derives the bucket
    expression as a row filter, so coverage stays exact without a
    purity requirement. A file with NO hidden-column bounds (written
    before the spec and not yet migrated, or an all-NULL-key file —
    parquet records no min/max for an all-NULL column, and compaction
    re-derives all-NULL again) degrades the same way: planned into
    every bucket, rows routed by the re-derived filter (NULL keys match
    no bucket and drop, the inner-join semantics) — correct, just n
    scans of that one file until maintenance splits it. rows are
    manifest counts spread evenly across the buckets the file spans
    (metadata heuristic for broadcast-side choice, never correctness) —
    attributing a spanning/boundless file's whole count to one bucket
    would skew the per-bucket broadcast-side decision.
    `manifest`, if given, pins the version (snapshot isolation —
    callers joining two reads must not let a racing commit tear the
    file list from the delete state)."""
    import os

    from .snapshot import _all_entries, _pt_name, _read_manifest, snapshot_versions

    m = (
        _read_manifest(table, snapshot_versions(table)[-1])
        if manifest is None
        else manifest
    )
    t = next(
        (t for t in (m.get("partition_spec") or [])
         if t[0] == "bucket" and t[1] == key),
        None,
    )
    if t is None:
        raise ValueError(
            f"{table} has no bucket transform on {key!r} in its current "
            f"partition spec {m.get('partition_spec')}"
        )
    hidden = _pt_name(t)
    by_bucket: dict[int, list[str]] = {}
    rows_by_bucket: dict[int, int] = {}
    for e in _all_entries(table, m):
        if e["rows"] == 0:
            continue
        b = (e.get("stats") or {}).get(hidden)
        # boundless file: could hold any bucket (or only NULL keys) —
        # plan it everywhere; the per-bucket row filter keeps it exact
        span = (0, int(t[2]) - 1) if b is None else (int(b[0]), int(b[1]))
        width = span[1] - span[0] + 1
        for bucket in range(span[0], span[1] + 1):
            by_bucket.setdefault(bucket, []).append(
                os.path.join(table, e["path"])
            )
            rows_by_bucket[bucket] = (
                rows_by_bucket.get(bucket, 0) + e["rows"] / width
            )
    return t, by_bucket, rows_by_bucket


def snapshot_colocated_join(
    spark: SparkSession,
    table_a: str,
    table_b: str,
    key_a: str,
    key_b: str | None = None,
) -> DataFrame:
    """INNER-join two snapshot tables on bucket-co-located keys with
    ZERO shuffle exchange in the join subtree (plan-pinned by
    tests/test_plans.py): both tables must carry a ('bucket', key, n)
    transform with the SAME n (bucket purity NOT required — see
    snapshot_bucket_layout's boundary/boundless handling). The join
    is planned per bucket — scan A's bucket-b files ⋈ scan B's bucket-b
    files, unioned across buckets — so co-location replaces the
    all-to-all Exchange a naive join pays on BOTH tables; rows of
    different buckets provably cannot match (same crc32 bucket
    function, same n). Each bucket-local join broadcasts the smaller
    side (decided from manifest row counts — zero jobs).

    100 TB posture, stated honestly: the bucket-local broadcast is the
    right plan when ONE side's per-bucket slice fits in memory (the
    dim-partitioned / CDC-lookup case, buckets sized by choosing n at
    write time). A fact-to-fact SPJ at sizes where neither side's
    bucket broadcasts needs the scan to REPORT KeyGroupedPartitioning
    to Catalyst (Spark's DSv2 SPJ), which a Python-planned file list
    cannot declare yet — for that standing workload, mirror both sides
    once through write_bucketed (native bucketBy tables) and take the
    Exchange-free SortMergeJoin forever after; this function covers the
    snapshot-native path without any data rewrite. NULL keys never join
    (SQL inner-join semantics; NULLs bucket like their cast string but
    drop in the join itself)."""
    from functools import reduce

    from .snapshot import (
        _dv_frame,
        _live_rows,
        _pt_expr,
        _read_manifest,
        snapshot_versions,
    )

    from .snapshot import snapshot_read

    key_b = key_a if key_b is None else key_b
    # resolve each table's manifest exactly ONCE and derive the file
    # plan AND the delete state from it (snapshot isolation — a racing
    # MoR commit between two latest-resolves could otherwise pair an
    # old file list with new tombstones, a result matching no snapshot)
    ma = _read_manifest(table_a, snapshot_versions(table_a)[-1])
    mb = _read_manifest(table_b, snapshot_versions(table_b)[-1])
    ta_t, buckets_a, rows_a = snapshot_bucket_layout(table_a, key_a, ma)
    tb_t, buckets_b, rows_b = snapshot_bucket_layout(table_b, key_b, mb)
    if int(ta_t[2]) != int(tb_t[2]):
        raise ValueError(
            f"bucket counts differ ({table_a}: {ta_t[2]}, {table_b}: "
            f"{tb_t[2]}) — co-location requires the same modulus"
        )
    dva, dvb = _dv_frame(spark, table_a, ma), _dv_frame(spark, table_b, mb)
    parts: list[DataFrame] = []
    for b in sorted(set(buckets_a) & set(buckets_b)):
        # the bucket expression re-derived as a row filter keeps
        # boundary-spanning files exact (each row joins in exactly one
        # bucket); on single-bucket files it is a no-op predicate
        fa = _live_rows(
            spark, table_a, ma, sorted(set(buckets_a[b])), dva
        ).where(_pt_expr(ta_t) == b)
        fb = _live_rows(
            spark, table_b, mb, sorted(set(buckets_b[b])), dvb
        ).where(_pt_expr(tb_t) == b)
        # broadcast the side with fewer manifest rows in this bucket —
        # decided from metadata, zero jobs
        if rows_b.get(b, 0) <= rows_a.get(b, 0):
            fb = F.broadcast(fb)
        else:
            fa = F.broadcast(fa)
        if key_a == key_b:
            parts.append(fa.join(fb, key_a, "inner"))
        else:
            parts.append(fa.join(fb, fa[key_a] == fb[key_b], "inner"))
    if not parts:
        # disjoint bucket sets: a legitimately EMPTY inner join (the
        # keys simply never co-hash), not a layout error
        ea = snapshot_read(spark, table_a).limit(0)
        eb = snapshot_read(spark, table_b).limit(0)
        if key_a == key_b:
            return ea.join(eb, key_a, "inner")
        return ea.join(eb, ea[key_a] == eb[key_b], "inner")
    return reduce(DataFrame.unionByName, parts)
