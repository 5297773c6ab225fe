"""Partitioned-layout contract (ops/layout.py): hive directory structure,
partition pruning at the scan, dynamic-partition overwrite isolation, and
exact-content small-file compaction."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from e02_spark.io import load_table
from e02_spark.ops.layout import compact_partitions, write_partitioned

SF = "/root/testdata/sf0.001"


def _files(path: str, part: str) -> list[str]:
    return glob.glob(os.path.join(path, part, "*.parquet"))


def test_partitioned_write_layout_and_pruning(spark, tmp_path):
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "events_parted")
    write_partitioned(events, path, ["event_type"])

    types = [r["event_type"] for r in events.select("event_type").distinct().collect()]
    for t in types:
        files = _files(path, f"event_type={t}")
        assert len(files) == 1, files  # one file per partition directory

    back = spark.read.parquet(path)
    assert back.count() == events.count()

    # pruning: the filtered scan's plan carries a PartitionFilters entry
    pruned = back.where(F.col("event_type") == types[0])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200], plan
    assert pruned.count() == events.where(F.col("event_type") == types[0]).count()


def test_dynamic_overwrite_touches_only_incoming_partitions(spark, tmp_path):
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "events_dyn")
    write_partitioned(events, path, ["event_type"])
    before = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    types = sorted(before)
    target, untouched = types[0], types[1:]

    # overwrite ONE partition with a 3-row replacement
    replacement = events.where(F.col("event_type") == target).limit(3)
    write_partitioned(replacement, path, ["event_type"], mode="overwrite")

    after = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert after[target] == 3
    for t in untouched:
        assert after[t] == before[t], t  # dynamic mode left them alone


def test_compaction_preserves_contents_exactly(spark, tmp_path):
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "events_small")
    # plant the small-file problem: 8 files per partition
    write_partitioned(events, path, ["event_type"], files_per_partition=8)
    types = [r["event_type"] for r in events.select("event_type").distinct().collect()]
    assert any(len(_files(path, f"event_type={t}")) > 1 for t in types)

    want = sorted(
        (r["event_id"], r["event_type"])
        for r in spark.read.parquet(path).select("event_id", "event_type").collect()
    )
    compact_partitions(spark, path, ["event_type"], files_per_partition=1)
    for t in types:
        assert len(_files(path, f"event_type={t}")) == 1, t
    got = sorted(
        (r["event_id"], r["event_type"])
        for r in spark.read.parquet(path).select("event_id", "event_type").collect()
    )
    assert got == want


def test_clustered_write_sorts_within_files(spark, tmp_path):
    """cluster_by contract: every written file holds its rows sorted by
    the clustering column — at production file sizes that is exactly what
    makes parquet row-group min/max stats non-overlapping, so range
    predicates skip whole row groups."""
    import pyarrow.parquet as pq

    events = load_table(spark, SF, "events")
    path = str(tmp_path / "events_clustered")
    write_partitioned(events, path, ["event_type"], cluster_by=["ts"])

    files = glob.glob(os.path.join(path, "event_type=*", "*.parquet"))
    assert files
    for f in files:
        ts = pq.read_table(f, columns=["ts"]).column("ts").to_pylist()
        assert ts == sorted(ts), f
        # row-group stats exist and are tight (min/max recorded per group)
        md = pq.ParquetFile(f).metadata
        ts_idx = [md.schema.column(i).name for i in range(md.num_columns)].index("ts")
        prev_max = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ts_idx).statistics
            assert st is not None and st.has_min_max
            if prev_max is not None:
                assert st.min >= prev_max  # groups carve disjoint ranges
            prev_max = st.max


def test_partition_values_roundtrip_special_chars(spark, tmp_path):
    """Hive partition directories URL-encode special characters; the
    write→read round-trip must return the original values exactly —
    spaces, '=', '/', ':', unicode, and empty-string (Hive's
    __HIVE_DEFAULT_PARTITION__ edge is avoided: empty string is a value,
    NULL is the default-partition case pinned separately)."""
    rows = [
        (1, "plain"),
        (2, "has space"),
        (3, "k=v"),
        (4, "a/b"),
        (5, "c:d"),
        (6, "café"),
        (7, None),  # NULL partition value -> __HIVE_DEFAULT_PARTITION__
    ]
    df = spark.createDataFrame(rows, schema="id BIGINT, part STRING")
    path = str(tmp_path / "special_parts")
    write_partitioned(df, path, ["part"])
    back = sorted(
        (r["id"], r["part"]) for r in spark.read.parquet(path).collect()
    )
    assert back == sorted(rows)


def test_compaction_multilevel_stage_and_swap(spark, tmp_path):
    """Round-6 durability rework: compaction writes to a sibling temp dir
    and swaps per partition directory (never read-and-overwrite in
    place). With TWO partition levels the swap happens at the leaf
    (day=) level; contents are preserved exactly, no staging residue
    (_compact_new_/_compact_old_/.compact_tmp) survives, and file counts
    collapse to 1 per leaf."""
    events = load_table(spark, SF, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_2level")
    write_partitioned(events, path, ["event_type", "day"], files_per_partition=4)
    leaves = glob.glob(os.path.join(path, "event_type=*", "day=*"))
    assert leaves and any(
        len(glob.glob(os.path.join(d, "*.parquet"))) > 1 for d in leaves
    )
    want = sorted(
        (r["event_id"], str(r["day"]))
        for r in spark.read.parquet(path).select("event_id", "day").collect()
    )
    compact_partitions(spark, path, ["event_type", "day"], files_per_partition=1)
    for d in glob.glob(os.path.join(path, "event_type=*", "day=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d
    got = sorted(
        (r["event_id"], str(r["day"]))
        for r in spark.read.parquet(path).select("event_id", "day").collect()
    )
    assert got == want
    assert not glob.glob(os.path.join(path, "**", "_compact_*"), recursive=True)
    assert not os.path.exists(path.rstrip("/") + ".compact_tmp")


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Round-6 Z-order clustering: bit-interleaved (ts, value) sort key +
    range-partitioned write. Contract: file-level min/max stats prune a
    point probe on the SECOND dimension strictly better than a ts-only
    range layout does, while first-dimension pruning stays strong (the
    Z-curve trades a little per-dimension locality for locality in all
    dimensions — exactly the multi-dim skipping a 100 TB scan needs)."""
    import pyarrow.parquet as pq

    from e02_spark.ops.layout import bucketize, zorder_key, zorder_write

    e = load_table(spark, SF, "events").select(
        "event_id",
        F.unix_seconds("ts").alias("tsec"),
        F.col("value").cast("double").alias("value"),
    )
    tlo, thi, vlo, vhi = e.agg(
        F.min("tsec"), F.max("tsec"), F.min("value"), F.max("value")
    ).first()
    zp, tp = str(tmp_path / "zorder"), str(tmp_path / "ts_only")
    zk = zorder_key(
        [bucketize("tsec", tlo, thi, 8), bucketize("value", vlo, vhi, 8)], 8
    )
    zorder_write(e, zp, zk, 16)
    e.repartitionByRange(16, F.col("tsec")).sortWithinPartitions(
        "tsec"
    ).write.parquet(tp)

    def n_skipped(path, col, probe):
        skipped, total = 0, 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = [
                md.schema.column(i).name for i in range(md.num_columns)
            ].index(col)
            stats = [
                md.row_group(g).column(idx).statistics
                for g in range(md.num_row_groups)
            ]
            total += 1
            if probe < min(s.min for s in stats) or probe > max(
                s.max for s in stats
            ):
                skipped += 1
        assert total >= 8  # enough files for the comparison to mean anything
        return skipped

    vprobe = (vlo + vhi) / 2
    tprobe = (tlo + thi) // 2
    z_v, t_v = n_skipped(zp, "value", vprobe), n_skipped(tp, "value", vprobe)
    z_t, t_t = n_skipped(zp, "tsec", tprobe), n_skipped(tp, "tsec", tprobe)
    assert z_v > t_v, (z_v, t_v)        # second dim: z-order strictly better
    assert z_v >= 8, z_v                # and absolutely strong (>= half)
    assert z_t >= 8, (z_t, t_t)         # first dim locality retained

    # contents round-trip exactly
    got = sorted(r["event_id"] for r in spark.read.parquet(zp).collect())
    want = sorted(r["event_id"] for r in e.collect())
    assert got == want


def test_compaction_self_heals_crashed_swap(spark, tmp_path):
    """Crash-recovery branch of the stage-and-swap: if a previous
    compaction died between parking the old partition in the sibling
    backup and revealing the new one (dest missing, backup present), the
    next compaction restores the partition first and completes normally —
    no rows lost, no staging/backup residue, and the table stays
    READABLE throughout (transient dirs never live inside it — an
    in-table `_old_` dir would fail every read with
    CONFLICTING_PARTITION_COLUMN_NAMES, which is how the earlier design
    was caught)."""
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "events_heal")
    write_partitioned(events, path, ["event_type"], files_per_partition=4)
    want = sorted(
        (r["event_id"], r["event_type"])
        for r in spark.read.parquet(path).select("event_id", "event_type").collect()
    )
    # simulate the crash window on one partition: dest moved to backup
    victim = glob.glob(os.path.join(path, "event_type=*"))[0]
    backup_root = path + ".compact_backup"
    os.makedirs(backup_root)
    os.replace(victim, os.path.join(backup_root, os.path.basename(victim)))
    # the table is still READABLE, just missing the parked partition
    assert len(
        spark.read.parquet(path).select("event_type").distinct().collect()
    ) < len({w[1] for w in want})

    compact_partitions(spark, path, ["event_type"], files_per_partition=1)
    got = sorted(
        (r["event_id"], r["event_type"])
        for r in spark.read.parquet(path).select("event_id", "event_type").collect()
    )
    assert got == want
    assert not glob.glob(os.path.join(path, "**", "_compact_*"), recursive=True)
    assert not os.path.exists(backup_root)
    # healing happens BEFORE the read, so the restored partition took
    # part in THIS compaction pass (1 file like everyone else)
    for d in glob.glob(os.path.join(path, "event_type=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d


def test_schema_evolution_mergeschema_read(spark, tmp_path):
    """Lakehouse schema evolution: a table whose later partitions carry
    an added column reads as the UNION schema under mergeSchema, with
    NULLs for the column in pre-evolution partitions — and a plain read
    anchored on the newest footer still works for append-only column
    adds. Pins the exact semantics compaction/backfill jobs rely on."""
    old = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id BIGINT, name STRING"
    )
    new = spark.createDataFrame(
        [(3, "c", 30.0), (4, "d", 40.0)], "id BIGINT, name STRING, score DOUBLE"
    )
    path = str(tmp_path / "evolving")
    old.write.parquet(path + "/day=1")
    new.write.parquet(path + "/day=2")

    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"id", "name", "score", "day"}
    rows = {r["id"]: (r["score"], r["day"]) for r in merged.collect()}
    assert rows[1] == (None, 1) and rows[3] == (30.0, 2)
    # evolution-aware aggregation treats missing as NULL (skipped by SUM)
    (tot,) = merged.agg(F.sum("score")).first()
    assert tot == 70.0


# --------------------------------------------------------------------------
# snapshot table (ops/snapshot.py): manifest commits, isolation, pruning
# --------------------------------------------------------------------------


def test_snapshot_commit_append_time_travel(spark, tmp_path):
    """v1 overwrite + v2 append: latest reads the union, version=1 reads
    exactly the original, and snapshot_rows answers COUNT(*) from
    manifest metadata alone."""
    from e02_spark.ops.snapshot import (
        snapshot_read,
        snapshot_rows,
        snapshot_versions,
        snapshot_write,
    )

    table = str(tmp_path / "tbl")
    nation = load_table(spark, SF, "nation")
    v1 = snapshot_write(nation.where(F.col("n_nationkey") < 10), table,
                        mode="overwrite")
    v2 = snapshot_write(nation.where(F.col("n_nationkey") >= 10), table,
                        mode="append")
    assert (v1, v2) == (1, 2)
    assert snapshot_versions(table) == [1, 2]
    assert snapshot_read(spark, table).count() == nation.count()
    assert snapshot_read(spark, table, version=1).count() == 10
    assert snapshot_rows(table) == nation.count()
    assert snapshot_rows(table, version=1) == 10


def test_snapshot_uncommitted_files_invisible_and_gc(spark, tmp_path):
    """Atomicity: data files without a committed manifest (a crashed
    write) are invisible to readers; expire(clean_orphans=True) removes
    them. Expire also drops dead versions' manifests + files while the
    kept snapshot stays readable."""
    import glob as g
    import os

    from e02_spark.ops.snapshot import (
        snapshot_expire,
        snapshot_read,
        snapshot_write,
    )

    table = str(tmp_path / "tbl")
    nation = load_table(spark, SF, "nation")
    snapshot_write(nation, table, mode="overwrite")
    n = nation.count()

    # simulate a crashed writer: data lands, manifest never commits
    orphan_dir = os.path.join(table, "data", "deadbeefcafe")
    nation.limit(3).write.parquet(orphan_dir)
    assert snapshot_read(spark, table).count() == n  # invisible

    snapshot_write(nation.limit(5), table, mode="overwrite")  # v2
    res = snapshot_expire(table, keep_last=1, clean_orphans=True)
    assert res["manifests_dropped"] == 1
    assert res["files_deleted"] >= 2  # v1's file(s) + the orphan(s)
    assert not os.path.exists(orphan_dir) or not os.listdir(orphan_dir)
    assert snapshot_read(spark, table).count() == 5
    # every remaining data file is referenced by the one kept manifest
    assert len(g.glob(os.path.join(table, "data", "*", "*.parquet"))) == 1


def test_snapshot_commit_race_rebase(spark, tmp_path):
    """Optimistic concurrency: a manifest version taken by another writer
    makes _try_commit refuse (create-if-absent), and snapshot_write's
    retry loop rebases an append onto the NEW latest so both writers'
    rows survive."""
    import json
    import os

    from e02_spark.ops.snapshot import (
        _read_manifest,
        _try_commit,
        snapshot_read,
        snapshot_write,
    )

    table = str(tmp_path / "tbl")
    nation = load_table(spark, SF, "nation")
    snapshot_write(nation.where(F.col("n_nationkey") < 10), table,
                   mode="overwrite")
    # a rival writer takes v2 first, appending nothing new (its manifest
    # list carries v1's shard refs) — the direct collision must be refused
    rival = {"version": 2, "mode": "append", "stats_cols": [],
             "manifests": _read_manifest(table, 1)["manifests"]}
    assert _try_commit(table, 2, rival)
    assert not _try_commit(table, 2, rival)  # create-if-absent holds
    # our append must land at v3 and still see v2 as its base
    v = snapshot_write(nation.where(F.col("n_nationkey") >= 10), table,
                       mode="append")
    assert v == 3
    assert snapshot_read(spark, table).count() == nation.count()


def test_snapshot_manifest_prunes_files_by_stats(spark, tmp_path):
    """Manifest-level scan planning: with cluster_by making per-file
    min/max tight, a prune range must cut the planned file list below
    the total while returning exactly the rows a full-scan filter
    returns."""
    from e02_spark.ops.snapshot import snapshot_read, snapshot_write

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # four appends of disjoint o_orderkey slices -> four files with
    # non-overlapping manifest bounds (the ingest pattern — daily loads of
    # a monotone key — that makes manifest stats prune hardest)
    table2 = str(tmp_path / "tbl2")
    lo, hi = 0, orders.agg(F.max("o_orderkey")).first()[0]
    step = (hi + 4) // 4
    for i in range(4):
        snapshot_write(
            orders.where(
                (F.col("o_orderkey") >= i * step)
                & (F.col("o_orderkey") < (i + 1) * step)
            ),
            table2,
            mode="append" if i else "overwrite",
            cluster_by=["o_orderkey"],
            stats_cols=["o_orderkey"],
        )
    probe_lo, probe_hi = step // 2, step // 2 + step // 4
    pruned = snapshot_read(
        spark, table2, prune=("o_orderkey", probe_lo, probe_hi)
    )
    assert len(pruned.inputFiles()) < len(
        snapshot_read(spark, table2).inputFiles()
    )
    want = orders.where(F.col("o_orderkey").between(probe_lo, probe_hi)).count()
    got = pruned.where(F.col("o_orderkey").between(probe_lo, probe_hi)).count()
    assert got == want > 0


def test_snapshot_sharded_manifest_two_level_prune(spark, tmp_path):
    """Manifest-list sharding: each append commit writes one immutable
    shard with ONLY its own entries (flat O(batch + #shards) commit
    metadata, never an O(#live-files) rewrite), a point probe skips
    non-intersecting shards WITHOUT opening them, and expire GCs the
    shards of dropped versions."""
    import glob as g
    import json
    import os

    from e02_spark.ops.snapshot import (
        _manifest_path,
        _plan_files,
        snapshot_expire,
        snapshot_rows,
        snapshot_write,
    )

    nation = load_table(spark, SF, "nation").select("n_nationkey", "n_name")
    table = str(tmp_path / "tbl")
    for i in range(4):  # 4 disjoint key slices -> 4 shards, tight bounds
        snapshot_write(
            nation.where(
                (F.col("n_nationkey") >= i * 7)
                & (F.col("n_nationkey") < (i + 1) * 7)
            ),
            table,
            mode="append" if i else "overwrite",
            cluster_by=["n_nationkey"],
            stats_cols=["n_nationkey"],
        )
    # flat commit metadata: 4 shards on disk, the latest list refs all 4,
    # and every shard holds only its own commit's files (1 each here)
    shards = g.glob(os.path.join(table, "_manifests", "m-*.json"))
    assert len(shards) == 4
    with open(_manifest_path(table, 4)) as f:
        refs = json.load(f)["manifests"]
    assert len(refs) == 4 and all(r["n_files"] == 1 for r in refs)
    assert snapshot_rows(table) == nation.where(F.col("n_nationkey") < 28).count()
    # two-level prune: a probe inside slice 2's bounds opens ONE shard
    opened: list = []
    kept, _ = _plan_files(table, None, ("n_nationkey", 15, 16), opened)
    assert len(opened) == 1 and len(kept) == 1
    # expire to the latest version: dead versions' shards stay only if
    # the kept list still references them (append chains do) — here all
    # 4 shards are live in v4, so nothing is lost; after an overwrite,
    # expire drops the now-unreferenced shards
    snapshot_write(nation.limit(3), table, mode="overwrite",
                   stats_cols=["n_nationkey"])
    snapshot_expire(table, keep_last=1, clean_orphans=True)
    left = g.glob(os.path.join(table, "_manifests", "m-*.json"))
    assert len(left) == 1
    assert snapshot_rows(table) == 3


def test_snapshot_single_commit_shard_fanout(spark, tmp_path):
    """One giant commit fans out across manifest shards
    (max_files_per_shard): cluster_by range-partitions the files so both
    file- and shard-level bounds are disjoint, and a point probe opens
    one shard and plans one file — intra-commit two-level pruning."""
    from e02_spark.ops.snapshot import (
        _manifest_path,
        _plan_files,
        snapshot_read,
        snapshot_write,
    )
    import json

    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    table = str(tmp_path / "tbl")
    snapshot_write(orders, table, mode="overwrite", n_files=8,
                   cluster_by=["o_orderkey"], stats_cols=["o_orderkey"],
                   max_files_per_shard=2)
    with open(_manifest_path(table, 1)) as f:
        refs = json.load(f)["manifests"]
    assert len(refs) == 4 and all(r["n_files"] == 2 for r in refs)
    # shard bounds disjoint -> a point probe opens exactly one shard
    key = orders.agg(F.min("o_orderkey")).first()[0]
    opened: list = []
    kept, _ = _plan_files(table, None, ("o_orderkey", key, key), opened)
    assert len(opened) == 1 and len(kept) == 1
    got = (
        snapshot_read(spark, table, prune=("o_orderkey", key, key))
        .where(F.col("o_orderkey") == key)
        .count()
    )
    assert got == orders.where(F.col("o_orderkey") == key).count() > 0


def test_snapshot_compact_under_isolation(spark, tmp_path):
    """Compaction commits a new version; the pre-compaction version stays
    byte-for-byte readable until expired — no reader disruption, no
    stage-and-swap window."""
    import glob as g
    import os

    from e02_spark.ops.snapshot import (
        snapshot_compact,
        snapshot_read,
        snapshot_write,
    )

    table = str(tmp_path / "tbl")
    supplier = load_table(spark, SF, "supplier")
    for i in range(3):  # 3 commits -> 3 small files
        snapshot_write(
            supplier.where(F.col("s_suppkey") % 3 == i),
            table,
            mode="append" if i else "overwrite",
        )
    n = supplier.count()
    before = snapshot_read(spark, table)
    assert len(before.inputFiles()) == 3
    v = snapshot_compact(spark, table, n_files=1)
    after = snapshot_read(spark, table)
    assert len(after.inputFiles()) == 1
    assert after.count() == n
    # exact content preservation
    a = {tuple(r) for r in after.collect()}
    b = {tuple(r) for r in before.collect()}
    assert a == b
    # time travel to the pre-compaction version still works
    assert snapshot_read(spark, table, version=v - 1).count() == n


def test_snapshot_binary_stats_no_crash_and_no_bounds(spark, tmp_path):
    """ADVICE r7 fix: a BINARY stats column must not TypeError inside
    json.dump AFTER the data files were written (orphaning them).
    Footer min/max for bytes has no JSON-safe ordered encoding, so the
    column simply carries no bounds; other declared columns still do."""
    import json

    from e02_spark.ops.snapshot import (
        _manifest_path,
        _read_shard,
        snapshot_read,
        snapshot_write,
    )

    df = (
        load_table(spark, SF, "nation")
        .select(
            "n_nationkey",
            F.sha2(F.col("n_name"), 256).cast("binary").alias("blob"),
        )
    )
    table = str(tmp_path / "tbl")
    v = snapshot_write(
        df, table, mode="overwrite", stats_cols=["n_nationkey", "blob"]
    )
    assert v == 1
    with open(_manifest_path(table, 1)) as f:
        refs = json.load(f)["manifests"]
    entries = _read_shard(table, refs[0])
    for e in entries:
        assert "blob" not in e["stats"]  # bytes: no bounds, no crash
        assert "n_nationkey" in e["stats"]  # int bounds still harvested
    assert snapshot_read(spark, table).count() == df.count()


def test_snapshot_temporal_bounds_prune_with_datetime_probe(spark, tmp_path):
    """Temporal footer stats are stored as isoformat strings; a prune
    probe passed as datetime objects must coerce to the same encoding
    (lexicographic == chronological) instead of raising TypeError."""
    import datetime as dt

    from e02_spark.ops.snapshot import _plan_files, snapshot_write

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("timestamp").alias("ts")
    )
    lo, hi = orders.agg(F.min("ts"), F.max("ts")).first()
    table = str(tmp_path / "tbl")
    snapshot_write(orders, table, mode="overwrite", n_files=4,
                   cluster_by=["ts"], stats_cols=["ts"])
    # probe below the data's range with datetime objects: everything pruned
    kept, fb = _plan_files(
        table, None,
        ("ts", lo - dt.timedelta(days=900), lo - dt.timedelta(days=800)),
    )
    assert kept == [] and fb is not None
    # probe covering only the earliest day: strictly fewer than all files
    kept2, _ = _plan_files(table, None, ("ts", lo, lo))
    assert 1 <= len(kept2) < 4
    # full-range probe keeps all
    kept3, _ = _plan_files(table, None, ("ts", lo, hi))
    assert len(kept3) == 4


def test_snapshot_committed_keys_is_one_manifest_read(spark, tmp_path, monkeypatch):
    """ADVICE r7 fix: the idempotency check is O(1) — keys are carried
    forward in each manifest list, so committed_keys reads ONE manifest
    regardless of version count, and keys survive expire of the old
    versions that originally carried them."""
    from e02_spark.ops import snapshot as S

    nation = load_table(spark, SF, "nation")
    table = str(tmp_path / "tbl")
    for i in range(5):
        S.snapshot_write(
            nation.limit(i + 1), table,
            mode="append" if i else "overwrite",
            idempotency_key=f"batch-{i}",
        )
    calls = []
    real = S._read_manifest
    monkeypatch.setattr(
        S, "_read_manifest", lambda t, v: (calls.append(v), real(t, v))[1]
    )
    keys = S.committed_keys(table)
    assert keys == {f"batch-{i}" for i in range(5)}
    assert len(calls) == 1  # one manifest read, not O(#versions)
    monkeypatch.undo()
    # replay of an old batch is still a no-op
    v = S.snapshot_write(nation.limit(1), table, mode="append",
                         idempotency_key="batch-2")
    assert v == 5 and S.snapshot_versions(table)[-1] == 5
    # keys survive expiring the manifests that introduced them
    S.snapshot_expire(table, keep_last=1, clean_orphans=True)
    assert S.committed_keys(table) == keys
    v2 = S.snapshot_write(nation.limit(1), table, mode="append",
                          idempotency_key="batch-0")
    assert v2 == 5  # still deduplicated post-expire


def test_snapshot_shard_cache_bounded_and_evicted_on_expire(spark, tmp_path, monkeypatch):
    """ADVICE r7 fix: the shard memo is a bounded LRU and expire evicts
    deleted shards eagerly (no ghost entries for removed files)."""
    import os

    from e02_spark.ops import snapshot as S

    nation = load_table(spark, SF, "nation")
    table = str(tmp_path / "tbl")
    for i in range(4):
        S.snapshot_write(nation.limit(i + 1), table,
                         mode="append" if i else "overwrite")
    monkeypatch.setattr(S, "_SHARD_CACHE_MAX", 2)
    S._SHARD_CACHE.clear()
    S.snapshot_read(spark, table)  # walks all 4 shards
    assert len(S._SHARD_CACHE) == 2  # LRU bound enforced
    S.snapshot_write(nation.limit(9), table, mode="overwrite")
    S.snapshot_expire(table, keep_last=1, clean_orphans=True)
    live = {
        os.path.abspath(p)
        for p in glob.glob(os.path.join(table, "_manifests", "m-*.json"))
    }
    assert all(p in live for p in S._SHARD_CACHE)  # no ghosts


# ---------------------------------------------------------------------------
# snapshot_merge / snapshot_changes (round 8): copy-on-write MERGE + CDF
# ---------------------------------------------------------------------------
def _kv(spark, keys, tag="a"):
    return spark.createDataFrame(
        [(int(k), f"{tag}{k}", int(k) * 10) for k in keys],
        "id BIGINT, tag STRING, amt BIGINT",
    )


def test_merge_upsert_delete_insert_semantics(spark, tmp_path):
    """Full-row upsert: matched target rows are replaced by the source
    row, unmatched source rows insert, everything else survives byte-
    identically; delete-mode removes matched keys (key-only source) and
    duplicate delete keys are harmless."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(10)), table, mode="overwrite",
                     n_files=2, cluster_by=["id"], stats_cols=["id"])
    src = _kv(spark, [3, 7, 20, 21], tag="NEW")
    info = S.snapshot_merge(spark, table, src, on=["id"])
    got = {(r["id"], r["tag"], r["amt"])
           for r in S.snapshot_read(spark, table).collect()}
    want = {(k, f"a{k}", k * 10) for k in range(10) if k not in (3, 7)}
    want |= {(k, f"NEW{k}", k * 10) for k in (3, 7, 20, 21)}
    assert got == want
    assert info["rows_after"] == 12
    assert S.snapshot_rows(table) == 12  # metadata accounting tracks

    # delete with key-only source; key 999 matches nothing, dup 4 is fine
    dels = spark.createDataFrame([(4,), (4,), (8,), (999,)], "id BIGINT")
    S.snapshot_merge(spark, table, dels, on=["id"],
                     when_matched="delete", insert_not_matched=False)
    left = {r["id"] for r in S.snapshot_read(spark, table).collect()}
    assert left == {0, 1, 2, 3, 5, 6, 7, 9, 20, 21}


def test_merge_rewrites_only_touched_files_and_reuses_shards(spark, tmp_path):
    """The scale contract: manifest-stats prune + semi-join discovery
    rewrite ONLY files that contain a matched key, and a shard none of
    whose files were touched keeps its existing shard file (zero metadata
    IO for untouched commits)."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(100)), table, mode="overwrite",
                     n_files=4, cluster_by=["id"], stats_cols=["id"])
    S.snapshot_write(_kv(spark, range(100, 200)), table, mode="append",
                     n_files=4, cluster_by=["id"], stats_cols=["id"])
    before = S._read_manifest(table, 2)["manifests"]
    assert len(before) == 2
    info = S.snapshot_merge(
        spark, table, _kv(spark, [5], tag="NEW"), on=["id"],
        cluster_by=["id"],
    )
    assert info["files_rewritten"] == 1  # only the file holding key 5
    assert info["files_kept"] == 7
    assert info["files_added"] == 1
    after = S._read_manifest(table, info["version"])["manifests"]
    # commit 2's shard (keys 100-199, untouched) is the SAME file
    assert before[1]["path"] in {r["path"] for r in after}
    # commit 1's shard was partially touched -> replaced, 3 survivors
    repl = [r for r in after if r["path"] != before[1]["path"]
            and r["n_files"] == 3]
    assert len(repl) == 1 and repl[0]["path"] != before[0]["path"]
    assert S.snapshot_read(spark, table).count() == 200
    assert {r["tag"] for r in S.snapshot_read(spark, table)
            .where(F.col("id") == 5).collect()} == {"NEW5"}


def test_merge_duplicate_update_keys_raise(spark, tmp_path):
    import pytest

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(5)), table, mode="overwrite")
    with pytest.raises(ValueError, match="duplicate key"):
        S.snapshot_merge(spark, table, _kv(spark, [1, 1]), on=["id"])


def test_merge_null_source_keys_never_match(spark, tmp_path):
    """SQL join semantics: a NULL source key matches nothing — it deletes
    nothing and, under insert_not_matched, lands as an insert row."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(3)), table, mode="overwrite")
    src = spark.createDataFrame(
        [(None, "nullkey", 0), (1, "NEW1", 10)],
        "id BIGINT, tag STRING, amt BIGINT",
    )
    S.snapshot_merge(spark, table, src, on=["id"])
    got = {(r["id"], r["tag"]) for r in S.snapshot_read(spark, table).collect()}
    assert got == {(0, "a0"), (1, "NEW1"), (2, "a2"), (None, "nullkey")}


def test_merge_commit_race_replans_against_new_latest(spark, tmp_path):
    """A writer landing a version between merge planning and commit makes
    the merge LOSE the race, replan against the new latest, and commit a
    result that preserves the concurrent append's rows — never clobbers
    them. The loser attempt's data files become expire-collectable."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(10)), table, mode="overwrite",
                     n_files=1, cluster_by=["id"], stats_cols=["id"])
    orig = S._try_commit
    state = {"fired": False}

    def hijack(t, version, manifest):
        if not state["fired"] and manifest.get("mode") == "merge":
            state["fired"] = True
            S._try_commit = orig
            try:  # concurrent append wins the version
                S.snapshot_write(_kv(spark, range(50, 53)), t, mode="append")
            finally:
                S._try_commit = hijack
        return orig(t, version, manifest)

    S._try_commit = hijack
    try:
        info = S.snapshot_merge(
            spark, table, _kv(spark, [2, 52], tag="NEW"), on=["id"]
        )
    finally:
        S._try_commit = orig
    assert state["fired"]
    got = {(r["id"], r["tag"]) for r in S.snapshot_read(spark, table).collect()}
    # the replanned merge saw the appended 50..52 AND updated 52 in place
    want = {(k, f"a{k}") for k in range(10) if k != 2}
    want |= {(50, "a50"), (51, "a51"), (2, "NEW2"), (52, "NEW52")}
    assert got == want
    assert info["rows_after"] == 13
    # loser attempt's files are orphans: expire collects, content intact
    S.snapshot_expire(table, keep_last=1, clean_orphans=True)
    assert S.snapshot_read(spark, table).count() == 13


def test_snapshot_changes_row_accurate_and_reads_only_changed_files(
    spark, tmp_path
):
    """CDF: append shows pure inserts; an update shows as its delete+
    insert pair; and ONLY files added/removed between the versions are
    read (the files_read observability hook) — O(changed files), never
    O(table)."""
    import os

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(100)), table, mode="overwrite",
                     n_files=4, cluster_by=["id"], stats_cols=["id"])
    S.snapshot_write(_kv(spark, range(100, 150)), table, mode="append",
                     n_files=1, cluster_by=["id"], stats_cols=["id"])
    read1: list = []
    ch = S.snapshot_changes(spark, table, 1, 2, files_read=read1)
    rows = ch.collect()
    assert all(r["_change_type"] == "insert" for r in rows)
    assert {r["id"] for r in rows} == set(range(100, 150))
    v1_files = {
        os.path.abspath(os.path.join(table, e["path"]))
        for e in S._all_entries(table, S._read_manifest(table, 1))
    }
    assert not (set(read1) & v1_files)  # none of v1's files were read
    assert len(read1) == 1

    info = S.snapshot_merge(
        spark, table, _kv(spark, [7], tag="NEW"), on=["id"],
        cluster_by=["id"],
    )
    read2: list = []
    ch2 = S.snapshot_changes(spark, table, 2, info["version"],
                             files_read=read2).collect()
    assert {(r["_change_type"], r["id"], r["tag"]) for r in ch2} == {
        ("delete", 7, "a7"), ("insert", 7, "NEW7")
    }
    # only the rewritten file + its replacement were read: 1 out + 1 in
    assert len(read2) == 2


def test_merge_into_empty_table_is_insert_only(spark, tmp_path):
    import pytest

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        S.snapshot_merge(spark, table, _kv(spark, [1]), on=["id"],
                         when_matched="delete", insert_not_matched=False)
    info = S.snapshot_merge(spark, table, _kv(spark, range(4)), on=["id"])
    assert info["version"] == 1 and info["rows_after"] == 4
    assert S.snapshot_read(spark, table).count() == 4


# --------------------------------------------------------------------------
# merge-on-read positional delete vectors (strategy='mor') + maintenance
# --------------------------------------------------------------------------


def _dv_files(table):
    import glob as g

    return g.glob(os.path.join(table, "deletes", "*", "*.parquet"))


def test_mor_delete_writes_tombstones_not_files(spark, tmp_path):
    """A MoR delete rewrites ZERO data files — it commits one positional
    delete file; reads subtract it, snapshot_rows answers from metadata,
    time travel to the pre-delete version still sees every row, and
    re-deleting the same keys is a no-op (tombstone uniqueness)."""
    import glob as g

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    v1 = S.snapshot_write(_kv(spark, range(40)), table, mode="overwrite",
                          n_files=4, cluster_by=["id"], stats_cols=["id"])
    data_before = set(g.glob(os.path.join(table, "data", "*", "*.parquet")))
    info = S.snapshot_merge(
        spark, table, _kv(spark, range(0, 40, 4)).select("id"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )
    assert info["files_rewritten"] == 0 and info["files_added"] == 0
    assert info["tombstones_added"] == 10
    assert set(g.glob(os.path.join(table, "data", "*", "*.parquet"))) == data_before
    assert len(_dv_files(table)) == 1
    assert S.snapshot_rows(table) == 30 == info["rows_after"]
    got = S.snapshot_read(spark, table)
    assert got.count() == 30 and got.where("id % 4 = 0").count() == 0
    assert set(got.columns) == {"id", "tag", "amt"}  # helper cols dropped
    # time travel: the pre-delete version is untouched
    assert S.snapshot_read(spark, table, version=v1).count() == 40
    assert S.snapshot_rows(table, version=v1) == 40
    # idempotent re-delete: nothing live matches -> same version, no DV
    again = S.snapshot_merge(
        spark, table, _kv(spark, range(0, 40, 4)).select("id"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )
    assert again["version"] == info["version"]
    assert again["tombstones_added"] == 0


def test_mor_upsert_tombstones_and_appends(spark, tmp_path):
    """MoR update: matched live rows are tombstoned and the replacement
    rows append as new files; a key whose only physical row is already
    tombstoned counts as NOT matched (it inserts, never double-deletes);
    pruned reads compose with DV application."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(20)), table, mode="overwrite",
                     n_files=2, cluster_by=["id"], stats_cols=["id"])
    S.snapshot_merge(spark, table, _kv(spark, [5]).select("id"), on=["id"],
                     when_matched="delete", insert_not_matched=False,
                     strategy="mor")
    info = S.snapshot_merge(
        spark, table, _kv(spark, [4, 5, 6, 30], tag="U"), on=["id"],
        when_matched="update", insert_not_matched=True, strategy="mor",
    )
    # 4 and 6 matched live rows (tombstoned); 5 was dead, 30 never existed
    assert info["files_rewritten"] == 0
    assert info["tombstones_added"] == 2
    assert info["files_added"] >= 1
    got = {(r["id"], r["tag"]) for r in S.snapshot_read(spark, table).collect()}
    assert ("U4" == dict(got)[4]) and dict(got)[5] == "U5" and dict(got)[30] == "U30"
    assert len(got) == 21 == S.snapshot_rows(table)
    # prune to the low half: DV anti-join still applies within kept files
    low = S.snapshot_read(spark, table, prune=("id", 0, 9))
    assert low.where("id <= 9 AND tag LIKE 'a%'").count() == 7  # 0..9 minus 4,5,6
    # update-mode duplicate source keys still raise under mor
    import pytest

    with pytest.raises(ValueError, match="duplicate"):
        S.snapshot_merge(spark, table,
                         _kv(spark, [1]).unionAll(_kv(spark, [1])),
                         on=["id"], strategy="mor")


def test_rewrite_deletes_folds_tombstones_targeted(spark, tmp_path):
    """snapshot_rewrite_deletes rewrites ONLY tombstoned files: untouched
    files keep their exact paths, the new version carries no delete
    files, contents are preserved exactly, and a second call is a no-op."""
    import glob as g

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(40)), table, mode="overwrite",
                     n_files=4, cluster_by=["id"], stats_cols=["id"])
    # tombstone two rows that land in the FIRST file (ids 0..9)
    S.snapshot_merge(spark, table, _kv(spark, [1, 2]).select("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="mor")
    before = S.snapshot_read(spark, table).collect()
    files_before = set(g.glob(os.path.join(table, "data", "*", "*.parquet")))
    info = S.snapshot_rewrite_deletes(spark, table, n_files_new=1,
                                      cluster_by=["id"])
    assert info["files_rewritten"] == 1 and info["tombstones_removed"] == 2
    files_after = set(g.glob(os.path.join(table, "data", "*", "*.parquet")))
    # 3 of the 4 original files survive in place (plus 1 new, plus the
    # old rewritten file still on disk for time travel until expire)
    assert len(files_before & files_after) >= 3
    m = S._read_manifest(table, info["version"])
    assert m["deletes"] == []
    after = S.snapshot_read(spark, table).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    assert S.snapshot_rows(table) == 38
    noop = S.snapshot_rewrite_deletes(spark, table)
    assert noop["version"] == info["version"]
    assert noop["files_rewritten"] == 0


def test_append_carries_tombstones_forward(spark, tmp_path):
    """mode='append' on a DV-carrying table must NOT resurrect tombstoned
    rows: the new manifest keeps the delete refs."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(10)), table, mode="overwrite")
    S.snapshot_merge(spark, table, _kv(spark, [3, 7]).select("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="mor")
    S.snapshot_write(_kv(spark, range(100, 105)), table, mode="append")
    assert S.snapshot_rows(table) == 13
    got = S.snapshot_read(spark, table)
    assert got.count() == 13 and got.where("id IN (3, 7)").count() == 0
    # overwrite drops content AND tombstones
    S.snapshot_write(_kv(spark, range(5)), table, mode="overwrite")
    assert S.snapshot_rows(table) == 5
    assert S.snapshot_read(spark, table).count() == 5


def test_cow_merge_purges_tombstones_on_touched_files(spark, tmp_path):
    """A CoW merge over a table carrying tombstones subtracts them in the
    rewrite (physically purging them) and drops DV entries aimed at the
    rewritten files; tombstones on untouched files survive. Tombstoned
    rows never match: a CoW update of a dead key inserts instead."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(40)), table, mode="overwrite",
                     n_files=4, cluster_by=["id"], stats_cols=["id"])
    # tombstones in two different files: id=2 (file 1), id=35 (file 4)
    S.snapshot_merge(spark, table, _kv(spark, [2, 35]).select("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="mor")
    # CoW update touching id=3 (same file as the id=2 tombstone) AND the
    # dead id=2 itself -> 2 must insert, 3 must update, file rewritten
    info = S.snapshot_merge(
        spark, table, _kv(spark, [2, 3], tag="U"), on=["id"],
        when_matched="update", insert_not_matched=True, strategy="cow",
    )
    assert info["files_rewritten"] == 1
    got = {r["id"]: r["tag"] for r in S.snapshot_read(spark, table).collect()}
    assert got[2] == "U2" and got[3] == "U3" and 35 not in got
    assert len(got) == 39 == S.snapshot_rows(table)
    # the id=35 tombstone survived the rebuild; 2's died with its file
    m = S._read_manifest(table, info["version"])
    assert sum(r["rows"] for r in m["deletes"]) == 1


def test_snapshot_changes_across_mor_versions(spark, tmp_path):
    """CDF over MoR commits: a tombstoned row surfaces as a 'delete'
    change read from ONLY the data files the tombstone delta names, and
    an appended file as 'insert' rows — no full-table scan."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(30)), table, mode="overwrite",
                     n_files=3, cluster_by=["id"], stats_cols=["id"])
    v2 = S.snapshot_merge(
        spark, table, _kv(spark, [11, 12]).select("id"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )["version"]
    v3 = S.snapshot_merge(
        spark, table, _kv(spark, [13, 50], tag="U"), on=["id"],
        when_matched="update", insert_not_matched=True, strategy="mor",
    )["version"]
    read: list = []
    ch = S.snapshot_changes(spark, table, v2, v3, files_read=read).collect()
    got = {(r["_change_type"], r["id"], r["tag"]) for r in ch}
    assert got == {
        ("delete", 13, "a13"), ("insert", 13, "U13"), ("insert", 50, "U50"),
    }
    # reads: the appended data file + the ONE data file the new tombstone
    # targets — never the other two base files
    assert len(read) <= 2
    # full span: base -> v3 nets deletes of 11,12 and the 13-update pair
    ch_full = S.snapshot_changes(spark, table, 1, v3).collect()
    full = {(r["_change_type"], r["id"]) for r in ch_full}
    assert full == {("delete", 11), ("delete", 12), ("delete", 13),
                    ("insert", 13), ("insert", 50)}


def test_expire_collects_dead_delete_files(spark, tmp_path):
    """snapshot_expire treats DV files/shards like data: dead versions'
    delete files are collected, the kept snapshot's survive, and
    clean_orphans sweeps never-committed DV dirs."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(20)), table, mode="overwrite")
    S.snapshot_merge(spark, table, _kv(spark, [1]).select("id"), on=["id"],
                     when_matched="delete", insert_not_matched=False,
                     strategy="mor")
    S.snapshot_merge(spark, table, _kv(spark, [2]).select("id"), on=["id"],
                     when_matched="delete", insert_not_matched=False,
                     strategy="mor")
    assert len(_dv_files(table)) == 2
    S.snapshot_rewrite_deletes(spark, table)  # v4: no tombstones
    S.snapshot_expire(table, keep_last=1, clean_orphans=True)
    assert _dv_files(table) == []
    got = S.snapshot_read(spark, table)
    assert got.count() == 18 and got.where("id IN (1,2)").count() == 0


# --------------------------------------------------------------------------
# add-only schema evolution (manifest-recorded schema)
# --------------------------------------------------------------------------


def test_schema_evolution_add_column_null_backfill(spark, tmp_path):
    """An append carrying a NEW column evolves the table schema; files
    that predate the column serve NULL for it — no rewrite, no
    mergeSchema sweep. An append OMITTING an existing column backfills
    NULL for its own rows. Type conflicts raise."""
    import pytest

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(6)), table, mode="overwrite",
                     stats_cols=["id"])
    evolved = _kv(spark, range(100, 103)).withColumn("score", F.lit(1.5))
    S.snapshot_write(evolved, table, mode="append", stats_cols=["id"])
    got = S.snapshot_read(spark, table)
    assert got.columns == ["id", "tag", "amt", "score"]
    assert got.where("score IS NULL").count() == 6
    assert got.where("score = 1.5").count() == 3
    # third append omits 'amt' AND 'score': both NULL-backfill
    skinny = spark.createDataFrame([(500, "x")], "id BIGINT, tag STRING")
    S.snapshot_write(skinny, table, mode="append")
    got = S.snapshot_read(spark, table)
    assert got.columns == ["id", "tag", "amt", "score"]
    assert got.where("id = 500 AND amt IS NULL AND score IS NULL").count() == 1
    assert S.snapshot_rows(table) == 10
    # time travel reads v1 with v1's three-column schema
    assert S.snapshot_read(spark, table, version=1).columns == ["id", "tag", "amt"]
    # type conflict: amt as STRING must raise, not corrupt
    bad = spark.createDataFrame([(9, "t", "oops")],
                                "id BIGINT, tag STRING, amt STRING")
    with pytest.raises(ValueError, match="ADDING columns only"):
        S.snapshot_write(bad, table, mode="append")


def test_schema_evolution_merge_and_rewrite_preserve_schema(spark, tmp_path):
    """MERGE (both strategies) and rewrite_deletes on an evolved table:
    touched files predating the added column rewrite cleanly (NULL
    backfill inside the rewrite scan) and the manifest keeps the evolved
    schema."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(8)), table, mode="overwrite",
                     stats_cols=["id"])
    S.snapshot_write(
        _kv(spark, [100]).withColumn("score", F.lit(2.0)), table,
        mode="append",
    )
    # CoW upsert touching an OLD file: source carries the evolved schema
    src = _kv(spark, [3], tag="U").withColumn("score", F.lit(9.0))
    S.snapshot_merge(spark, table, src, on=["id"])
    got = {r["id"]: (r["tag"], r["score"])
           for r in S.snapshot_read(spark, table).collect()}
    assert got[3] == ("U3", 9.0) and got[2] == ("a2", None)
    # MoR delete + rewrite on the evolved table
    S.snapshot_merge(spark, table, _kv(spark, [5]).select("id"), on=["id"],
                     when_matched="delete", insert_not_matched=False,
                     strategy="mor")
    info = S.snapshot_rewrite_deletes(spark, table)
    assert info["tombstones_removed"] == 1
    got = S.snapshot_read(spark, table)
    assert got.columns == ["id", "tag", "amt", "score"]
    assert got.count() == 8 == S.snapshot_rows(table)
    # CDF across the evolution boundary carries the `to` schema
    ch = S.snapshot_changes(spark, table, 1, 2)
    assert set(ch.columns) == {"id", "tag", "amt", "score", "_change_type"}
    assert ch.count() == 1  # the appended row, NULL-free score


def test_snapshot_agg_metadata_only(spark, tmp_path):
    """COUNT(*) always; MIN/MAX from file stats only when every file has
    bounds and no tombstones exist."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(10, 50)), table, mode="overwrite",
                     n_files=4, cluster_by=["id"], stats_cols=["id"])
    a = S.snapshot_agg(table, "id")
    assert a == {"rows": 40, "min": 10, "max": 49, "exact_bounds": True}
    # a column never declared in stats_cols: bounds not derivable
    assert S.snapshot_agg(table, "amt")["exact_bounds"] is False
    # tombstones forbid metadata min/max (the extreme row might be dead)
    S.snapshot_merge(spark, table, _kv(spark, [49]).select("id"), on=["id"],
                     when_matched="delete", insert_not_matched=False,
                     strategy="mor")
    a2 = S.snapshot_agg(table, "id")
    assert a2["rows"] == 39 and a2["exact_bounds"] is False
    # folding the DV restores metadata-answerable bounds
    S.snapshot_rewrite_deletes(spark, table)
    a3 = S.snapshot_agg(table, "id")
    assert a3 == {"rows": 39, "min": 10, "max": 48, "exact_bounds": True}


def test_snapshot_binpack_rewrites_only_small_files(spark, tmp_path):
    """Bin-pack: small appended files coalesce to ~target_rows files, the
    healthy bulk file keeps its manifest entry untouched, contents are
    exact, and a second pass is a no-op."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(1000)), table, mode="overwrite",
                     n_files=1, stats_cols=["id"])
    for i in range(4):  # streaming-ingest sprawl: four 5-row files
        S.snapshot_write(_kv(spark, range(2000 + 5 * i, 2005 + 5 * i)),
                         table, mode="append", n_files=1)
    before = sorted(map(tuple, S.snapshot_read(spark, table).collect()))
    bulk = {e["path"] for e in S._all_entries(
        table, S._read_manifest(table, 1))}
    info = S.snapshot_binpack(spark, table, target_rows=500)
    assert info["files_rewritten"] == 4 and info["rows_rewritten"] == 20
    assert info["files_added"] == 1
    m = S._read_manifest(table, info["version"])
    paths = {e["path"] for e in S._all_entries(table, m)}
    assert bulk <= paths  # the 1000-row file was never touched
    assert sorted(map(tuple, S.snapshot_read(spark, table).collect())) == before
    noop = S.snapshot_binpack(spark, table, target_rows=500)
    assert noop["version"] == info["version"]
    assert noop["files_rewritten"] == 0
    assert S.snapshot_rows(table) == 1020


def test_snapshot_binpack_folds_tombstones(spark, tmp_path):
    """A tombstoned file qualifies for rewrite regardless of size, so a
    binpack pass leaves the table DV-free; tombstoned rows drop and row
    accounting holds."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(800)), table, mode="overwrite",
                     n_files=1, stats_cols=["id"])
    S.snapshot_write(_kv(spark, range(900, 910)), table, mode="append")
    S.snapshot_merge(spark, table, _kv(spark, [3, 905]).select("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="mor")
    info = S.snapshot_binpack(spark, table, target_rows=600)
    # both files rewritten: the small one by size, the big one by DV
    assert info["files_rewritten"] == 2
    m = S._read_manifest(table, info["version"])
    assert m["deletes"] == []
    got = S.snapshot_read(spark, table)
    assert got.count() == 808 == S.snapshot_rows(table)
    assert got.where("id IN (3, 905)").count() == 0


def test_mor_merge_commit_race_replans(spark, tmp_path):
    """The MoR strategy loses a commit race the same way CoW does: the
    replanned attempt tombstones against the NEW latest (seeing the
    concurrent append's rows as live match candidates) and its loser
    DV file becomes an expire-collectable orphan."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(10)), table, mode="overwrite",
                     n_files=1, cluster_by=["id"], stats_cols=["id"])
    orig = S._try_commit
    state = {"fired": False}

    def hijack(t, version, manifest):
        if not state["fired"] and manifest.get("mode") == "merge":
            state["fired"] = True
            S._try_commit = orig
            try:  # a concurrent append takes the version AND adds id=60
                S.snapshot_write(_kv(spark, [60, 61]), t, mode="append")
            finally:
                S._try_commit = hijack
        return orig(t, version, manifest)

    S._try_commit = hijack
    try:
        info = S.snapshot_merge(
            spark, table, _kv(spark, [3, 60]).select("id"), on=["id"],
            when_matched="delete", insert_not_matched=False, strategy="mor",
        )
    finally:
        S._try_commit = orig
    assert state["fired"]
    # the replanned delete matched BOTH 3 (original) and 60 (the racer's
    # append) — a stale plan would have missed 60 entirely
    assert info["tombstones_added"] == 2
    got = {r["id"] for r in S.snapshot_read(spark, table).collect()}
    assert got == set(range(10)) - {3} | {61}
    assert S.snapshot_rows(table) == 10
    S.snapshot_expire(table, keep_last=1, clean_orphans=True)
    assert S.snapshot_rows(table) == 10 == S.snapshot_read(spark, table).count()


def test_snapshot_rollback_is_metadata_only(spark, tmp_path):
    """Rollback commits a NEW version referencing the old version's
    shards/DVs/schema — zero data IO, history moves forward, content
    moves back; idempotency keys stay monotone so a replayed batch is
    still deduplicated after the rollback."""
    import glob as g

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(10)), table, mode="overwrite")
    S.snapshot_write(_kv(spark, range(100, 105)), table, mode="append",
                     idempotency_key="batch-7")
    S.snapshot_merge(spark, table, _kv(spark, [3]).select("id"), on=["id"],
                     when_matched="delete", insert_not_matched=False,
                     strategy="mor")
    files_before = set(g.glob(os.path.join(table, "data", "*", "*.parquet")))
    v = S.snapshot_rollback(table, 2)
    assert v == 4
    assert set(g.glob(os.path.join(table, "data", "*", "*.parquet"))) \
        == files_before  # no data IO
    got = S.snapshot_read(spark, table)
    assert got.count() == 15 and got.where("id = 3").count() == 1
    assert S.snapshot_rows(table) == 15
    # the replayed batch is STILL a no-op after rolling past it
    v2 = S.snapshot_write(_kv(spark, range(100, 105)), table, mode="append",
                          idempotency_key="batch-7")
    assert v2 == v and S.snapshot_rows(table) == 15
    # rollback to the rolled-back-from state also works (it's a version)
    v3 = S.snapshot_rollback(table, 3)
    assert S.snapshot_read(spark, table).where("id = 3").count() == 0
    assert S.snapshot_rows(table, v3) == 14


def test_snapshot_expire_orphan_grace_spares_young_files(spark, tmp_path):
    """clean_orphans with a grace window keeps unreferenced files younger
    than the window (presumed in-flight) and sweeps them once aged."""
    import glob as g
    import os as o

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(5)), table, mode="overwrite")
    # a crashed write: data landed, manifest never committed
    orphan_dir = o.path.join(table, "data", "deadbeef")
    _kv(spark, [99]).coalesce(1).write.parquet(orphan_dir)
    orphan = g.glob(o.path.join(orphan_dir, "*.parquet"))
    assert orphan
    S.snapshot_expire(table, keep_last=1, clean_orphans=True,
                      orphan_grace_s=3600)
    assert g.glob(o.path.join(orphan_dir, "*.parquet")) == orphan  # spared
    # age the file past the window -> swept
    old = __import__("time").time() - 7200
    for p in orphan:
        o.utime(p, (old, old))
    o.utime(orphan_dir, (old, old))
    S.snapshot_expire(table, keep_last=1, clean_orphans=True,
                      orphan_grace_s=3600)
    assert not g.glob(o.path.join(orphan_dir, "*.parquet"))
    assert S.snapshot_read(spark, table).count() == 5


def test_snapshot_history_describes_every_version(spark, tmp_path):
    """DESCRIBE HISTORY from manifest metadata alone: modes, live rows,
    tombstone counts, schema width, and rollback provenance per version."""
    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(8)), table, mode="overwrite")
    S.snapshot_write(
        _kv(spark, [50]).withColumn("score", F.lit(1.0)), table,
        mode="append", idempotency_key="batch-0",
    )
    S.snapshot_merge(spark, table, _kv(spark, [1]).select("id"), on=["id"],
                     when_matched="delete", insert_not_matched=False,
                     strategy="mor")
    S.snapshot_rollback(table, 2)
    h = S.snapshot_history(table)
    assert [e["version"] for e in h] == [1, 2, 3, 4]
    assert [e["mode"] for e in h] == ["overwrite", "append", "merge",
                                      "rollback"]
    assert [e["rows"] for e in h] == [8, 9, 8, 9]
    assert [e["tombstones"] for e in h] == [0, 0, 1, 0]
    assert [e["n_columns"] for e in h] == [3, 4, 4, 4]
    assert h[1]["idempotency_key"] == "batch-0"
    assert h[3]["rolled_back_to"] == 2


def test_concurrent_merge_writers_both_land(spark, tmp_path, table_store):
    """Two writers issuing merges on DISJOINT key ranges race commits for
    real (threads, no mocks): losers replan and retry, both sequences
    land, and the final content is exactly the serial result. Pins
    liveness (max_retries survives genuine contention) on top of the
    single-race correctness test above."""
    import threading

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(60)), table, mode="overwrite",
                     n_files=2, cluster_by=["id"], stats_cols=["id"])
    errs = []

    def writer(lo, strategy, tag):
        try:
            for i in range(3):
                src = _kv(spark, [lo + i, lo + 10 + i], tag=tag)
                S.snapshot_merge(spark, table, src, on=["id"],
                                 strategy=strategy, max_retries=10)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(0, "cow", "A"))
    t2 = threading.Thread(target=writer, args=(30, "mor", "B"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    got = {r["id"]: r["tag"] for r in S.snapshot_read(spark, table).collect()}
    assert len(got) == 60 == S.snapshot_rows(table)
    for i in range(3):
        assert got[i] == f"A{i}" and got[10 + i] == f"A{10 + i}"
        assert got[30 + i] == f"B{30 + i}" and got[40 + i] == f"B{40 + i}"
    # untouched keys kept their original rows
    assert got[5] == "a5" and got[55] == "a55"
    # every commit is a distinct version: 1 load + 6 merges (some may
    # have needed replans, which never publish partial versions)
    assert len(S.snapshot_versions(table)) == 7


def test_merge_schema_adds_new_source_column(spark, tmp_path,
                                             table_store):
    """merge_schema=True: a MERGE whose source carries a NOVEL column
    lands it as add-only schema evolution in the same commit — new and
    rewritten rows carry values, untouched pre-merge files NULL-backfill
    at read with zero rewrite, a CDF stream pinned BEFORE the merge
    keeps flowing (add-only never fences), and without the flag the
    novel column stays a hard error naming the fix — on both stores."""
    from e02_spark.ops import snapshot as S
    from e02_spark.sources.snapshot_cdf_stream import (
        SnapshotCDFStreamReader,
    )

    table = str(tmp_path / "tbl")
    base = spark.range(100).selectExpr("id", "id % 7 AS v")
    S.snapshot_write(base, table, mode="overwrite", n_files=2,
                     cluster_by=["id"], stats_cols=["id"])
    rdr = SnapshotCDFStreamReader({"table": table})  # pins v1's schema
    src = spark.createDataFrame(
        [(5, 99, 0.5), (200, 1, 2.5)], "id long, v long, score double"
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        S.snapshot_merge(spark, table, src, on=["id"])
    r = S.snapshot_merge(spark, table, src, on=["id"], merge_schema=True)
    assert r["files_rewritten"] == 1  # only the file holding id=5
    got = {
        row["id"]: (row["v"], row["score"])
        for row in S.snapshot_read(spark, table).collect()
    }
    assert len(got) == 101
    assert got[5] == (99, 0.5) and got[200] == (1, 2.5)
    assert got[6] == (6, None)   # rewritten survivor: NULL-filled
    assert got[60] == (4, None)  # untouched file: NULL-backfilled read
    # the recorded schema evolved add-only (new field appended last)
    m = S._read_manifest(table, S.snapshot_versions(table)[-1])
    assert [f["name"] for f in m["schema"]["fields"]] == [
        "id", "v", "score"
    ]
    # the pre-merge CDF pin still flows: add-only is not a fence
    parts = rdr.partitions(
        {"version": 1}, {"version": S.snapshot_versions(table)[-1]}
    )
    assert parts  # planned, no fence error raised
    # batch CDF across the evolution carries the new column
    ch = S.snapshot_changes(spark, table, 1, r["version"])
    ins = {
        row["id"]: row["score"]
        for row in ch.where("_change_type = 'insert'").collect()
    }
    assert ins[5] == 0.5 and ins[200] == 2.5
    # eq strategy evolves too (the CDC hot path)
    src2 = spark.createDataFrame(
        [(7, 1, 1.0, "x")],
        "id long, v long, score double, note string",
    )
    r2 = S.snapshot_merge(spark, table, src2, on=["id"], strategy="eq",
                          merge_schema=True)
    m2 = S._read_manifest(table, r2["version"])
    assert [f["name"] for f in m2["schema"]["fields"]][-1] == "note"
    got2 = {
        row["id"]: row["note"]
        for row in S.snapshot_read(spark, table).collect()
    }
    assert got2[7] == "x" and got2[5] is None
    # dropped/renamed-away names refuse resurrection through the merge
    S.snapshot_rewrite_deletes(spark, table)
    S.snapshot_drop_column(table, "note")
    src3 = spark.createDataFrame(
        [(8, 1, 1.0, "ghost")],
        "id long, v long, score double, note string",
    )
    with pytest.raises(ValueError, match="renamed-away|dropped"):
        S.snapshot_merge(spark, table, src3, on=["id"],
                         merge_schema=True)


def test_concurrent_merge_same_key_serializable(spark, tmp_path,
                                                table_store):
    """Two writers merging the SAME key set race for real: the loser's
    replan applies on top of the winner, so the final state carries ONE
    writer's values for the whole key set (mixed per-key values would be
    a torn, non-serializable state), both commits appear in history, and
    the CDF shows neither update was lost — on both stores."""
    import threading

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(40)), table, mode="overwrite",
                     n_files=2, cluster_by=["id"], stats_cols=["id"])
    keys = list(range(5, 15))
    errs: list = []
    versions: dict[str, int] = {}
    gate = threading.Barrier(2)

    def writer(tag, strategy):
        try:
            src = _kv(spark, keys, tag=tag)
            gate.wait()
            r = S.snapshot_merge(spark, table, src, on=["id"],
                                 strategy=strategy, max_retries=12)
            versions[tag] = r["version"]
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    t1 = threading.Thread(target=writer, args=("X", "cow"))
    t2 = threading.Thread(target=writer, args=("Y", "mor"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    assert len(versions) == 2 and versions["X"] != versions["Y"]
    winner = max(versions, key=versions.get)
    got = {r["id"]: r["tag"] for r in S.snapshot_read(spark, table).collect()}
    assert len(got) == 40 == S.snapshot_rows(table)
    # serializable: EVERY raced key carries the later commit's value
    assert all(got[k] == f"{winner}{k}" for k in keys), {
        k: got[k] for k in keys
    }
    # no lost update: EACH writer's commit landed as its own version
    # whose CDF step inserts exactly that writer's full row set (the
    # endpoint-to-endpoint CDF is a net diff, so the intermediate state
    # is only visible per step)
    for tag, v in versions.items():
        step_ins = {
            r["tag"]
            for r in S.snapshot_changes(spark, table, v - 1, v)
            .where("_change_type = 'insert'")
            .select("tag")
            .collect()
        }
        assert step_ins == {f"{tag}{k}" for k in keys}, (tag, step_ins)
    # untouched keys never raced
    assert got[0] == "a0" and got[30] == "a30"


def test_exhausted_retries_raise_named_error(spark, tmp_path, monkeypatch):
    """A merge that loses every retry raises the NAMED
    ConcurrentModificationError (an ops-visible contention signal with
    retry guidance), never a bare RuntimeError — and publishes nothing."""
    import pytest as _pytest

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(10)), table, mode="overwrite",
                     n_files=1, stats_cols=["id"])
    monkeypatch.setattr(S, "_try_commit", lambda *a, **kw: False)
    with _pytest.raises(S.ConcurrentModificationError,
                        match="lost 2 consecutive commit races"):
        S.snapshot_merge(spark, table, _kv(spark, [3], tag="Z"),
                         on=["id"], max_retries=2)
    monkeypatch.undo()
    assert S.snapshot_versions(table) == [1]
    got = {r["id"]: r["tag"] for r in S.snapshot_read(spark, table).collect()}
    assert got[3] == "a3"


def test_snapshot_compact_zorder_two_dimension_pruning(spark, tmp_path):
    """snapshot_compact(zorder_by=[x, y]) — the Iceberg z-order rewrite
    at the MANIFEST level: after the rewrite, file [min,max] stats prune
    point probes on BOTH interleaved dimensions, where the original
    linear x-clustered layout prunes only x (every file spans full y).
    Content is preserved exactly and the commit is data_change=false
    (CDF consumers skip it)."""
    from e02_spark.ops import snapshot as S

    tbl = str(tmp_path / "tbl")
    n = 4096
    df = spark.range(n).selectExpr(
        "id", "id % 64 AS x", "CAST(id / 64 AS BIGINT) AS y"
    )
    S.snapshot_write(df, tbl, mode="overwrite", n_files=16,
                     cluster_by=["x"], stats_cols=["x", "y"])
    all_before, _ = S._plan_files(tbl, None, None)
    kept_y_linear, _ = S._plan_files(tbl, None, ("y", 3, 4))
    assert len(kept_y_linear) == len(all_before)  # linear can't prune y
    before = {r["id"] for r in S.snapshot_read(spark, tbl).collect()}

    v = S.snapshot_compact(spark, tbl, n_files=16, zorder_by=["x", "y"])
    all_after, _ = S._plan_files(tbl, None, None)
    kept_x, _ = S._plan_files(tbl, None, ("x", 3, 4))
    kept_y, _ = S._plan_files(tbl, None, ("y", 3, 4))
    assert 0 < len(kept_x) < len(all_after), (len(kept_x), len(all_after))
    assert 0 < len(kept_y) < len(all_after), (len(kept_y), len(all_after))
    # content preserved; maintenance is CDF-silent
    assert {r["id"] for r in S.snapshot_read(spark, tbl).collect()} == before
    assert S._read_manifest(tbl, v).get("data_change") is False
    assert S.snapshot_changes(spark, tbl, v - 1, v).count() == 0
    # pruned reads stay row-complete
    got = (
        S.snapshot_read(spark, tbl, prune=("y", 3, 4))
        .where(F.col("y").between(3, 4))
        .count()
    )
    assert got == 128


def test_snapshot_optimize_one_call_maintenance(spark, tmp_path):
    """snapshot_optimize composes fold -> binpack -> expire: one
    scheduled call restores anti-join-free reads and metadata counts,
    repacks sprawl, and GCs history — content exact, tagged versions
    pinned."""
    from e02_spark.ops import snapshot as S

    tbl = str(tmp_path / "tbl")
    S.snapshot_write(_kv(spark, range(300)), tbl, mode="overwrite",
                     n_files=2, cluster_by=["id"], stats_cols=["id"])
    S.snapshot_tag(tbl, "keep-me")  # pins v1 through the expire leg
    # streaming-style sprawl + both delete flavors outstanding
    for lo in (300, 320, 340):
        S.snapshot_write(_kv(spark, range(lo, lo + 20)), tbl,
                         mode="append", n_files=1)
    S.snapshot_merge(spark, tbl, _kv(spark, range(0, 30), tag="up"),
                     on=["id"], strategy="mor")
    S.snapshot_merge(
        spark, tbl,
        spark.createDataFrame([(i,) for i in range(330, 335)], "id BIGINT"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="eq",
    )
    # eq deletes outstanding: metadata count honestly refuses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="EQUALITY"):
        S.snapshot_rows(tbl)
    want = {r["id"]: r["tag"]
            for r in S.snapshot_read(spark, tbl).collect()}
    res = S.snapshot_optimize(
        spark, tbl, target_rows=400, keep_last=1, orphan_grace_s=0.0,
    )
    assert res["rewrite_deletes"]["eq_files_removed"] == 1
    assert res["binpack"]["files_rewritten"] > 0
    assert res["expire"]["manifests_dropped"] > 0
    # counts restored, content exact, tag still resolvable
    assert S.snapshot_rows(tbl) == len(want) == 355
    got = {r["id"]: r["tag"] for r in S.snapshot_read(spark, tbl).collect()}
    assert got == want
    assert 1 in S.snapshot_versions(tbl)  # the tagged version survived
    assert S.snapshot_read(spark, tbl, tag="keep-me").count() == 300


def test_harvest_stats_distributed_matches_sequential(spark, tmp_path,
                                                      monkeypatch):
    """The executor-side footer harvest must produce BYTE-IDENTICAL
    manifest entries to the driver loop (same per-file parser, same path
    order), including temporal isoformat bounds and missing-stats
    columns; and a commit above the distribution threshold still yields
    a table whose pruning/reads behave exactly as before."""
    import json

    from e02_spark.ops import snapshot as S

    tbl = str(tmp_path / "tbl")
    df = (
        load_table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
                "o_orderstatus")
    )
    S.snapshot_write(df, tbl, mode="overwrite", n_files=12,
                     cluster_by=["o_orderkey"],
                     stats_cols=["o_orderkey", "o_orderdate", "nosuchcol"])
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    files = [os.path.join(tbl, e["path"]) for e in S._all_entries(tbl, m)]
    assert len(files) == 12
    cols = ["o_orderkey", "o_orderdate", "nosuchcol"]
    seq = [S._harvest_one(p, cols, tbl) for p in sorted(files)]
    dist = S._harvest_stats_distributed(spark, sorted(files), cols, tbl)
    assert json.dumps(seq, sort_keys=True) == json.dumps(dist, sort_keys=True)
    # end-to-end with the threshold forced low: the auto-distributed
    # commit path records the same manifest a sequential commit does
    tbl2, tbl3 = str(tmp_path / "t2"), str(tmp_path / "t3")
    monkeypatch.setattr(S, "_HARVEST_DISTRIBUTE_MIN", 2)
    S.snapshot_write(df, tbl2, mode="overwrite", n_files=8,
                     cluster_by=["o_orderkey"], stats_cols=["o_orderkey"])
    monkeypatch.setattr(S, "_HARVEST_DISTRIBUTE_MIN", 10**9)
    S.snapshot_write(df, tbl3, mode="overwrite", n_files=8,
                     cluster_by=["o_orderkey"], stats_cols=["o_orderkey"])
    e2 = S._all_entries(tbl2, S._read_manifest(tbl2, 1))
    e3 = S._all_entries(tbl3, S._read_manifest(tbl3, 1))
    strip = lambda es: [
        {k: v for k, v in e.items() if k != "path"} for e in es
    ]
    assert strip(e2) == strip(e3)  # same rows + bounds per file position
    kept, _ = S._plan_files(tbl2, None, ("o_orderkey", 1, 50))
    assert 0 < len(kept) < len(e2)  # distributed stats still prune


def test_harvest_bulk_without_session_warns(spark, tmp_path, monkeypatch):
    """A bulk harvest (>= distribute threshold) issued with no session —
    neither passed explicitly nor active on the thread — must WARN BY
    NAME before serializing footer reads on the driver, never fall back
    silently. With the commit site's own session passed, it distributes
    without consulting thread-local state."""
    import json
    import warnings

    from pyspark.sql import SparkSession

    from e02_spark.ops import snapshot as S

    tbl = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr("id", "id * 2 as v")
    S.snapshot_write(df, tbl, mode="overwrite", n_files=4,
                     stats_cols=["id"])
    m = S._read_manifest(tbl, 1)
    files = [os.path.join(tbl, e["path"]) for e in S._all_entries(tbl, m)]
    monkeypatch.setattr(S, "_HARVEST_DISTRIBUTE_MIN", 2)
    monkeypatch.setattr(
        SparkSession, "getActiveSession", classmethod(lambda cls: None)
    )
    with pytest.warns(RuntimeWarning, match="snapshot harvest"):
        seq = S._harvest_stats(files, ["id"], tbl)
    # explicit session: distributes, no warning, identical entries
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dist = S._harvest_stats(files, ["id"], tbl, spark=spark)
    assert json.dumps(seq, sort_keys=True) == json.dumps(
        dist, sort_keys=True
    )
