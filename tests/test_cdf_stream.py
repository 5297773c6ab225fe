"""Streaming change-data-feed source (sources/snapshot_cdf_stream.py):
replay-as-inserts, per-step commit provenance, MoR-merge tombstone
deltas landing mid-stream, maintenance silence (data_change=false
steps), net-effect correctness vs the committed snapshots, interop with
the append-only source's fence, and IVM state maintained purely from
the stream matching a full recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e02_spark.ops import snapshot as S
from e02_spark.sources.snapshot_cdf_stream import (
    SnapshotCDFStreamReader,
    read_snapshot_changes_stream,
)
from e02_spark.sources.snapshot_stream import SnapshotStreamReader


def _drain(spark, df, ck):
    out = []
    q = (
        df.writeStream.foreachBatch(lambda b, i: out.append((i, b.collect())))
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q.awaitTermination(120)
    return [r for _, b in out for r in b]


def test_cdf_stream_replay_and_commit_versions(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    S.snapshot_write(spark.range(0, 10).selectExpr("id", "id*2 AS v"),
                     tbl, mode="overwrite", n_files=2)
    S.snapshot_write(spark.range(10, 25).selectExpr("id", "id*2 AS v"),
                     tbl, mode="append", n_files=3)
    df = read_snapshot_changes_stream(spark, tbl)
    assert df.schema.simpleString() == (
        "struct<id:bigint,v:bigint,_change_type:string,_commit_version:bigint>"
    )
    rows = _drain(spark, df, ck)
    assert len(rows) == 25
    assert all(r["_change_type"] == "insert" for r in rows)
    by_ver = {r["id"]: r["_commit_version"] for r in rows}
    assert by_ver[5] == 1 and by_ver[20] == 2
    # restart from the checkpoint: only the new commit's changes arrive
    S.snapshot_write(spark.range(100, 103).selectExpr("id", "id*2 AS v"),
                     tbl, mode="append")
    rows2 = _drain(spark, read_snapshot_changes_stream(spark, tbl), ck)
    assert sorted(r["id"] for r in rows2) == [100, 101, 102]
    assert {r["_commit_version"] for r in rows2} == {3}


def test_cdf_stream_rate_limited_backlog_catchup(spark, tmp_path):
    """Admission control (maxFilesPerTrigger / maxRowsPerTrigger): a
    deep version backlog is planned as MANY BOUNDED micro-batches, each
    admitting at most the cap's worth of changed files (beyond the
    one-version progress floor), with final state identical to the
    uncapped one-shot run — at the planner level (deterministic engine
    loop) and through a real availableNow stream."""
    tbl = str(tmp_path / "tbl")
    n_versions = 12
    for i in range(n_versions):
        S.snapshot_write(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id", "id*2 AS v"),
            tbl, mode="overwrite" if i == 0 else "append", n_files=2,
        )
    # --- planner level: simulate the engine's offset loop
    rdr = SnapshotCDFStreamReader(
        {"table": tbl, "maxfilespertrigger": "4"}
    )
    cur = rdr.initialOffset()
    batches = []
    for _ in range(100):
        end = rdr.latestOffset()
        if end["version"] == cur["version"]:
            break
        parts = rdr.partitions(cur, end)
        batches.append((cur["version"], end["version"], len(parts)))
        cur = end
    assert cur["version"] == n_versions  # fully caught up
    assert len(batches) == n_versions // 2  # 2 files/version, cap 4
    assert all(hi - lo == 2 for lo, hi, _ in batches)
    assert all(n <= 4 for _, _, n in batches)
    # a single over-cap version still flows (progress floor)
    rdr2 = SnapshotCDFStreamReader(
        {"table": tbl, "maxfilespertrigger": "1"}
    )
    cur2 = rdr2.initialOffset()
    end2 = rdr2.latestOffset()
    assert end2["version"] == 1  # one 2-file version admitted alone
    # --- row-cap flavor
    rdr3 = SnapshotCDFStreamReader(
        {"table": tbl, "maxrowspertrigger": "25"}
    )
    rdr3.initialOffset()
    e3 = rdr3.latestOffset()
    assert e3["version"] == 2  # 10 rows/version: 2 fit under 25
    # --- byte-cap flavor (weights from harvested shard-ref bytes)
    m1 = S._read_manifest(tbl, 1)
    v1_bytes = sum(int(r.get("bytes") or 0) for r in m1["manifests"])
    assert v1_bytes > 0  # harvest records on-disk size
    rdr4 = SnapshotCDFStreamReader(
        {"table": tbl, "maxbytespertrigger": str(v1_bytes + 1)}
    )
    rdr4.initialOffset()
    e4 = rdr4.latestOffset()
    assert e4["version"] == 1  # one version's bytes fill the cap
    # --- end to end: capped stream == uncapped stream, more batches.
    # availableNow captures its end offset once up front (one batch by
    # design), so the incremental path is exercised with a continuous
    # micro-batch trigger stopped once caught up — the deployment shape
    # a backlog catch-up actually runs under.
    import time as _time

    seen: list = []
    q = (
        read_snapshot_changes_stream(spark, tbl, max_files_per_trigger=4)
        .writeStream.foreachBatch(
            lambda b, i: seen.append((i, b.collect()))
        )
        .trigger(processingTime="0 seconds")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    deadline = _time.time() + 240
    while _time.time() < deadline:
        if sum(len(b) for _, b in seen) >= n_versions * 10:
            break
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    capped = sorted(
        (r["id"], r["_change_type"], r["_commit_version"])
        for _, b in seen for r in b
    )
    one_shot = sorted(
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in _drain(
            spark, read_snapshot_changes_stream(spark, tbl),
            str(tmp_path / "ck2"),
        )
    )
    assert capped == one_shot and len(capped) == n_versions * 10
    n_nonempty = sum(1 for _, b in seen if b)
    assert n_nonempty >= n_versions // 2, (
        f"expected bounded catch-up batches, got {n_nonempty}"
    )
    # q121/q122-style uncapped behavior unchanged: one batch drains all
    assert len(one_shot) == 120
    # --- RESTART with a backlog accrued while the stream was down:
    # the engine re-plans the checkpointed batch first (anchoring the
    # admission cursor), then the backlog flows as bounded batches —
    # no offset rewind, no replays, no giant first batch
    for i in range(n_versions, n_versions + 6):
        S.snapshot_write(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id", "id*2 AS v"),
            tbl, mode="append", n_files=2,
        )
    seen2: list = []
    q2 = (
        read_snapshot_changes_stream(spark, tbl, max_files_per_trigger=4)
        .writeStream.foreachBatch(
            lambda b, i: seen2.append((i, b.collect()))
        )
        .trigger(processingTime="0 seconds")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    deadline = _time.time() + 240
    while _time.time() < deadline:
        if sum(len(b) for _, b in seen2) >= 60:
            break
        _time.sleep(0.5)
    q2.stop()
    q2.awaitTermination(60)
    got2 = sorted(r["id"] for _, b in seen2 for r in b)
    assert got2 == list(range(120, 180)), "restart replayed or lost rows"
    assert sum(1 for _, b in seen2 if b) >= 3  # 6 versions / 2 per batch


def test_cdf_stream_survives_mor_merge_and_maintenance(spark, tmp_path):
    """The headline scenario: a MoR merge (delete + upsert) lands
    MID-STREAM; the change stream emits exactly the tombstone-delta
    deletes plus the appended inserts, then binpack/rewrite/compact
    maintenance emits NOTHING."""
    tbl = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    S.snapshot_write(
        spark.range(0, 40).selectExpr("id", "CAST(id % 4 AS STRING) AS g",
                                      "id * 10 AS x"),
        tbl, mode="overwrite", n_files=4, cluster_by=["id"],
        stats_cols=["id"],
    )
    rows1 = _drain(spark, read_snapshot_changes_stream(spark, tbl), ck)
    assert len(rows1) == 40 and all(
        r["_change_type"] == "insert" for r in rows1
    )
    # -- merge lands between drains (same checkpoint = same stream) --
    S.snapshot_merge(
        spark, tbl, spark.range(0, 40, 5).selectExpr("id"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )
    upd = spark.range(1, 40, 10).selectExpr(
        "id", "'U' AS g", "id * 100 AS x"
    )
    S.snapshot_merge(spark, tbl, upd, on=["id"], when_matched="update",
                     insert_not_matched=True, strategy="mor")
    rows2 = _drain(spark, read_snapshot_changes_stream(spark, tbl), ck)
    dels = [r for r in rows2 if r["_change_type"] == "delete"]
    ins = [r for r in rows2 if r["_change_type"] == "insert"]
    assert sorted(r["id"] for r in dels) == sorted(
        list(range(0, 40, 5)) + list(range(1, 40, 10))
    )
    assert sorted(r["id"] for r in ins) == [1, 11, 21, 31]
    assert all(r["g"] == "U" and r["x"] == r["id"] * 100 for r in ins)
    assert {r["_commit_version"] for r in dels} == {2, 3}
    # -- content-preserving maintenance: the feed stays silent --
    S.snapshot_rewrite_deletes(spark, tbl, n_files_new=2)
    S.snapshot_binpack(spark, tbl, target_rows=100)
    S.snapshot_compact(spark, tbl, n_files=1)
    rows3 = _drain(spark, read_snapshot_changes_stream(spark, tbl), ck)
    assert rows3 == []
    # batch CDF short-circuit agrees: all-maintenance range is empty
    assert (
        S.snapshot_changes(spark, tbl, 3, S.snapshot_versions(tbl)[-1])
        .count()
        == 0
    )


def test_cdf_stream_net_effect_matches_snapshots(spark, tmp_path):
    """from-state + inserts - deletes == to-state as MULTISETS, across a
    CoW merge step (file removals + additions, including rewritten-but-
    unchanged rows that the stream emits as self-cancelling pairs)."""
    tbl = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    S.snapshot_write(
        spark.range(0, 30).selectExpr("id", "id % 3 AS m"), tbl,
        mode="overwrite", n_files=3, cluster_by=["id"], stats_cols=["id"],
    )
    _drain(spark, read_snapshot_changes_stream(spark, tbl), ck)
    S.snapshot_merge(
        spark, tbl,
        spark.range(0, 30, 7).selectExpr("id", "99 AS m"),
        on=["id"], when_matched="update", insert_not_matched=True,
    )  # CoW: rewrites the touched files
    rows = _drain(spark, read_snapshot_changes_stream(spark, tbl), ck)
    ins = spark.createDataFrame(
        [(r["id"], r["m"]) for r in rows if r["_change_type"] == "insert"]
        or [(None, None)], "id bigint, m bigint",
    ).where("id IS NOT NULL")
    dels = spark.createDataFrame(
        [(r["id"], r["m"]) for r in rows if r["_change_type"] == "delete"]
        or [(None, None)], "id bigint, m bigint",
    ).where("id IS NOT NULL")
    v_from = S.snapshot_read(spark, tbl, version=1).select("id", "m")
    v_to = S.snapshot_read(spark, tbl).select("id", "m")
    applied = v_from.unionByName(ins).exceptAll(dels)
    assert applied.exceptAll(v_to).count() == 0
    assert v_to.exceptAll(applied).count() == 0


def test_cdf_stream_fence_interop_with_append_only_source(spark, tmp_path):
    """The exact range that fences the append-only snapshot_stream source
    is consumable through the change stream."""
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(spark.range(10).selectExpr("id", "id AS v"), tbl,
                     mode="overwrite", n_files=2)
    S.snapshot_merge(spark, tbl, spark.range(1, 3).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="mor")
    r_app = SnapshotStreamReader({"table": tbl})
    with pytest.raises(ValueError, match="append-only contract"):
        r_app.partitions({"version": 1}, {"version": 2})
    r_cdf = SnapshotCDFStreamReader({"table": tbl})
    parts = r_cdf.partitions({"version": 1}, {"version": 2})
    # tombstone-delta slices only (no file added/removed), one per
    # touched data file, covering both deleted positions
    assert parts and all(p.change_type == "delete" for p in parts)
    assert sum(len(p.include) for p in parts) == 2
    # replay stability: same range, same plan
    parts2 = r_cdf.partitions({"version": 1}, {"version": 2})
    assert [(p.path, p.include) for p in parts] == [
        (p.path, p.include) for p in parts2
    ]


def test_cdf_stream_drives_ivm_to_recompute_parity(spark, tmp_path):
    """Maintain a materialized aggregate PURELY from the change stream —
    across appends, a MoR merge, and silent maintenance — and land
    bit-exact on the full recompute."""
    from e02_spark.ops.ivm import apply_agg_delta, materialize_agg

    tbl = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    keys, sums = ["g"], {"sx": "x"}
    S.snapshot_write(
        spark.range(0, 60).selectExpr("id", "CAST(id % 5 AS STRING) AS g",
                                      "id * 1.5 AS x"),
        tbl, mode="overwrite", n_files=3, cluster_by=["id"],
        stats_cols=["id"],
    )
    state = materialize_agg(
        S.snapshot_read(spark, tbl).limit(0), keys, sums
    ).localCheckpoint()

    def fold():
        nonlocal state
        rows = read_snapshot_changes_stream(spark, tbl).drop(
            "_commit_version"
        )
        out = []
        q = (
            rows.writeStream.foreachBatch(
                lambda b, i: out.append(b.localCheckpoint())
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination(120)
        for b in out:
            state = apply_agg_delta(state, b, keys, sums).localCheckpoint()

    fold()
    S.snapshot_write(
        spark.range(60, 90).selectExpr("id", "CAST(id % 5 AS STRING) AS g",
                                       "id * 1.5 AS x"),
        tbl, mode="append", n_files=2,
    )
    fold()
    S.snapshot_merge(
        spark, tbl, spark.range(0, 90, 4).selectExpr("id"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )
    S.snapshot_binpack(spark, tbl, target_rows=200)
    fold()
    recompute = materialize_agg(S.snapshot_read(spark, tbl), keys, sums)
    diff = state.exceptAll(recompute).unionByName(
        recompute.exceptAll(state)
    )
    assert diff.count() == 0


def test_cdf_stream_expired_offset_raises_named_error(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(spark.range(5).selectExpr("id"), tbl, mode="overwrite")
    S.snapshot_write(spark.range(5, 9).selectExpr("id"), tbl, mode="append")
    S.snapshot_expire(tbl, keep_last=1)
    r = SnapshotCDFStreamReader({"table": tbl})
    with pytest.raises(ValueError, match="snapshot_expire collected"):
        r.partitions({"version": 1}, {"version": 2})


def _multiset(rows, cols=("_change_type", "id", "v")):
    from collections import Counter

    return Counter(tuple(r[c] for c in cols) for r in rows)


def test_cdf_stream_eq_steps_match_batch_changes(spark, tmp_path):
    """Round 9 — the eq fence is lifted: the STREAM's output over a
    history full of equality-delete interactions must equal the batch
    snapshot_changes (the oracle-verified reference) step by step and
    over the whole range. Covers: eq delete, eq upsert (self-exempt new
    files), CoW rewrite of a file with outstanding eq shadows (the
    removed-file slice must NOT resurrect shadowed rows as deletes),
    rollback past the eq merges (gone-eq un-shadowing => inserts), and
    rewrite_deletes folding (data_change=false => silent)."""
    tbl = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    S.snapshot_write(
        spark.range(0, 40).selectExpr("id", "id AS v"), tbl,
        mode="overwrite", n_files=4, cluster_by=["id"], stats_cols=["id"],
    )
    # v2: eq delete of 4..8
    S.snapshot_merge(spark, tbl, spark.range(4, 9).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="eq")
    # v3: eq upsert — updates 10..14 (shadow + self-exempt re-insert),
    # inserts 50..52
    ups = spark.range(10, 15).selectExpr("id", "id * 100 AS v").unionAll(
        spark.range(50, 53).selectExpr("id", "id AS v")
    )
    S.snapshot_merge(spark, tbl, ups, on=["id"], when_matched="update",
                     insert_not_matched=True, strategy="eq")
    # v4: CoW merge touching a file that still carries eq shadows — its
    # removed-file slice must emit only LIVE rows as deletes
    S.snapshot_merge(
        spark, tbl, spark.createDataFrame([(2, 222)], "id BIGINT, v BIGINT"),
        on=["id"], when_matched="update", insert_not_matched=True,
        strategy="cow",
    )
    # v5: maintenance folds both flavors — stream must stay silent
    S.snapshot_rewrite_deletes(spark, tbl, n_files_new=2)
    # v6: MoR delete, then v7: rollback to v3 (re-shadows via the eq
    # files of v3, un-does the CoW and the fold)
    S.snapshot_merge(spark, tbl, spark.range(0, 2).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="mor")
    S.snapshot_rollback(tbl, 3)
    last = S.snapshot_versions(tbl)[-1]

    def _net(rows):
        from collections import Counter

        net = Counter()
        for r in rows:
            net[(r["id"], r["v"])] += (
                1 if r["_change_type"] == "insert" else -1
            )
        return {k: c for k, c in net.items() if c}

    # pure eq steps: the stream's multiset equals the batch CDF exactly
    # (no rewrite churn to cancel)
    for v0, v1 in ((1, 2), (2, 3)):
        got = _drain(
            spark,
            read_snapshot_changes_stream(spark, tbl, starting_version=v0),
            str(tmp_path / f"ckx{v0}"),
        )
        got = [r for r in got if r["_commit_version"] <= v1]
        want = S.snapshot_changes(spark, tbl, v0, v1).collect()
        assert _multiset(got) == _multiset(want), f"step ({v0}, {v1}]"
    # every range: the stream's NET effect equals the batch CDF's net —
    # the per-step feed additionally carries rewrite churn (CoW emits a
    # touched file's unchanged rows as self-canceling delete+insert
    # pairs) that the endpoint-diff batch cancels by construction
    for v0 in range(1, last):
        got = _drain(
            spark,
            read_snapshot_changes_stream(spark, tbl, starting_version=v0),
            str(tmp_path / f"ck{v0}"),
        )
        want = S.snapshot_changes(spark, tbl, v0, last).collect()
        assert _net(got) == _net(want), f"range ({v0}, {last}]"
    # provenance sanity on the full drain: the rollback step emits its
    # own version number
    full = _drain(spark, read_snapshot_changes_stream(spark, tbl), ck)
    assert {r["_commit_version"] for r in full} <= set(range(1, last + 1))
    # net effect equals the final table content
    from collections import Counter

    net = Counter()
    for r in full:
        key = (r["id"], r["v"])
        net[key] += 1 if r["_change_type"] == "insert" else -1
    live = Counter(
        (r["id"], r["v"])
        for r in S.snapshot_read(spark, tbl).select("id", "v").collect()
    )
    assert {k: c for k, c in net.items() if c} == dict(live)


def test_cdf_stream_eq_delete_on_evolved_key_column(spark, tmp_path):
    """An eq delete keyed on a column added AFTER some data files were
    written: pre-evolution files stay applicable (no stats for the key)
    but physically lack the column — the stream must treat the absent
    column as all-NULL (no key matches, the batch semantics), not crash
    with a KeyError."""
    tbl = str(tmp_path / "evolved")
    S.snapshot_write(
        spark.range(0, 10).selectExpr("id", "id * 2 AS v"),
        tbl, mode="overwrite", n_files=1,
    )  # v1: pre-evolution files, no k2
    S.snapshot_write(
        spark.range(10, 20).selectExpr("id", "id * 2 AS v", "id + 500 AS k2"),
        tbl, mode="append", n_files=1,
    )  # v2: evolved
    S.snapshot_merge(
        spark, tbl,
        spark.createDataFrame([(512,), (599,)], "k2 bigint"),
        on=["k2"], when_matched="delete", insert_not_matched=False,
        strategy="eq",
    )  # v3: k2=512 shadows id=12 only
    rows = _drain(
        spark,
        read_snapshot_changes_stream(spark, tbl),
        str(tmp_path / "ck"),
    )
    dels = [r for r in rows if r["_change_type"] == "delete"]
    assert [r["id"] for r in dels] == [12]
    ins = sorted(
        r["id"] for r in rows if r["_change_type"] == "insert"
    )
    assert ins == list(range(20))
    # pre-evolution rows stream with NULL-backfilled k2
    assert all(
        r["k2"] is None for r in rows if r["id"] < 10
    )


def _run_capped(spark, tmp_path, tbl, ck, **opts):
    reader = (
        spark.readStream.format("snapshot_changes_stream")
        .option("table", tbl)
    )
    for k, val in opts.items():
        reader = reader.option(k, val)
    out = []
    q = (
        reader.load()
        .writeStream.foreachBatch(lambda b, i: out.append(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / ck))
        .start()
    )
    q.awaitTermination(120)
    return [r for b in out for r in b]


def test_cdf_stream_over_cap_falls_back_to_executor_side(spark, tmp_path):
    """A delete file above the driver-shipping row cap no longer bricks
    the stream: its positions/keys are applied EXECUTOR-side (the slice
    ships the delete-file path, not its contents) and the feed matches
    the uncapped run exactly; folding with snapshot_rewrite_deletes
    stays a CDF-silent maintenance step."""
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(0, 30).selectExpr("id", "id * 2 AS v"),
        tbl, mode="overwrite", n_files=1,
    )
    S.snapshot_merge(
        spark, tbl, spark.range(0, 10).selectExpr("id"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )  # one DV file with 10 positions

    from e02_spark.sources.snapshot_cdf_stream import (
        SnapshotCDFStreamDataSource,
    )

    spark.dataSource.register(SnapshotCDFStreamDataSource)
    # cap 2 < 10 positions: DV state goes executor-side, result identical
    capped = _run_capped(spark, tmp_path, tbl, "ck1", maxDeleteRows=2)
    uncapped = _run_capped(spark, tmp_path, tbl, "ck2")
    key = lambda r: (r["_commit_version"], r["_change_type"], r["id"])
    assert sorted(capped, key=key) == sorted(uncapped, key=key)
    assert sum(1 for r in capped if r["_change_type"] == "delete") == 10
    # fold the deletes: still a data_change=false (CDF-silent) step
    S.snapshot_rewrite_deletes(spark, tbl)
    rows = _run_capped(spark, tmp_path, tbl, "ck3", maxDeleteRows=2,
                       startingVersion=3)
    assert rows == []


def test_cdf_stream_10x_cap_matches_batch_changes(spark, tmp_path):
    """Delete state at 10× the configured cap (both flavors: DV from a
    MoR delete, eq keys from an eq merge) streams executor-side and
    matches batch snapshot_changes version-for-version — including the
    eq-delta 'delete' emissions and a CoW-style rewrite slice carrying
    over-cap shadows."""
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(0, 400).selectExpr("id", "id * 2 AS v"),
        tbl, mode="overwrite", n_files=2, stats_cols=["id"],
    )
    # v2: MoR delete of 200 rows -> one DV file with 200 positions
    S.snapshot_merge(
        spark, tbl, spark.range(0, 200).selectExpr("id"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )
    # v3: eq upsert touching 150 keys -> one over-cap eq-delete file
    S.snapshot_merge(
        spark, tbl,
        spark.range(150, 300).selectExpr("id", "id * 7 AS v"),
        on=["id"], when_matched="update", insert_not_matched=True,
        strategy="eq",
    )
    from e02_spark.sources.snapshot_cdf_stream import (
        SnapshotCDFStreamDataSource,
    )

    spark.dataSource.register(SnapshotCDFStreamDataSource)
    # cap=15: DV 200 rows and eq 150 keys are both >10x over it
    streamed = _run_capped(spark, tmp_path, tbl, "ck", maxDeleteRows=15)
    batch = []
    for v in S.snapshot_versions(tbl)[0:]:
        if v == 1:
            df = S.snapshot_read(spark, tbl, version=1).withColumn(
                "_change_type", F.lit("insert")
            )
        else:
            df = S.snapshot_changes(spark, tbl, v - 1, v)
        batch.extend(
            (v, r["_change_type"], r["id"], r["v"])
            for r in df.select("_change_type", "id", "v").collect()
        )
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in streamed
    )
    assert got == sorted(batch)
    # and the capped feed equals the uncapped feed byte-for-byte
    uncapped = _run_capped(spark, tmp_path, tbl, "ck_u")
    key = lambda r: (r["_commit_version"], r["_change_type"], r["id"])
    assert sorted(streamed, key=key) == sorted(uncapped, key=key)
