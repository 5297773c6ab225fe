"""Idempotent merge commits (commit_key) + the streaming CDC-apply sink.

The contract under test (ops/snapshot.py snapshot_merge commit_key /
snapshot_cdc_sink): a change stream maintains a snapshot table with
exactly-once application under at-least-once execution — replayed
batches no-op per merge leg via manifest-recorded commit keys, mixed
insert/update/delete feeds net to their final per-key state, and the
whole path stays O(batch) with strategy='eq' (zero target reads).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from e02_spark.ops.snapshot import (
    snapshot_cdc_sink,
    snapshot_merge,
    snapshot_read,
    snapshot_versions,
    snapshot_write,
)


def _rows(spark, table):
    return {
        (r["id"], r["v"]) for r in snapshot_read(spark, table).collect()
    }


# ---------------------------------------------------------------- commit_key


@pytest.mark.parametrize("strategy", ["cow", "mor", "eq"])
def test_merge_commit_key_replay_noop(spark, tmp_path, strategy):
    table = str(tmp_path / "t")
    snapshot_write(
        spark.range(100).selectExpr("id", "id * 2 AS v"), table,
        mode="overwrite", n_files=2,
    )
    src = spark.range(0, 100, 10).selectExpr("id", "id * 7 AS v")
    kw = dict(
        on=["id"], when_matched="update", insert_not_matched=True,
        strategy=strategy, commit_key="k1",
    )
    first = snapshot_merge(spark, table, src, **kw)
    assert first["replayed"] is False
    v_after = snapshot_versions(table)[-1]
    expected = _rows(spark, table)
    # replay: same key -> no new version, no content change, zero writes
    second = snapshot_merge(spark, table, src, **kw)
    assert second["replayed"] is True
    assert second["version"] == first["version"]
    assert second["files_added"] == 0 and second["files_rewritten"] == 0
    assert snapshot_versions(table)[-1] == v_after
    assert _rows(spark, table) == expected
    # a DIFFERENT key applies normally
    third = snapshot_merge(
        spark, table, src, on=["id"], when_matched="update",
        insert_not_matched=True, strategy=strategy, commit_key="k2",
    )
    assert third["replayed"] is False
    assert third["version"] == v_after + 1


def test_merge_commit_key_race_loser_backs_off(spark, tmp_path, monkeypatch):
    """Two merges with the SAME key racing: the loser's replan must see
    the winner's key in the fresh manifest and return a replay no-op
    instead of committing a duplicate version."""
    import e02_spark.ops.snapshot as S

    table = str(tmp_path / "t")
    snapshot_write(
        spark.range(50).selectExpr("id", "id * 2 AS v"), table,
        mode="overwrite", n_files=1,
    )
    src = spark.range(0, 50, 5).selectExpr("id", "id * 7 AS v")

    real_commit = S._try_commit
    fired = {"done": False}

    def racing_commit(tbl, version, manifest):
        # first commit attempt of OUR merge loses: a rival merge with the
        # same commit_key lands that version first
        if not fired["done"]:
            fired["done"] = True
            snapshot_merge(
                spark, tbl, src, on=["id"], when_matched="update",
                insert_not_matched=True, commit_key="shared",
            )
            return real_commit(tbl, version, manifest) and False
        return real_commit(tbl, version, manifest)

    monkeypatch.setattr(S, "_try_commit", racing_commit)
    # racing_commit returns False on the first attempt regardless, since
    # the rival really committed `version` already (hard-link create fails)
    res = snapshot_merge(
        spark, table, src, on=["id"], when_matched="update",
        insert_not_matched=True, commit_key="shared",
    )
    assert res["replayed"] is True
    # exactly ONE merge version landed
    assert snapshot_versions(table)[-1] == 2
    assert {r["v"] for r in snapshot_read(spark, table).where(
        F.col("id") % 5 == 0).collect()} == {i * 7 for i in range(0, 50, 5)}


def test_merge_noop_does_not_record_key(spark, tmp_path):
    """A provably-nothing-to-do merge commits no version and records no
    key — replaying it is idempotent by re-planning, and a LATER real
    merge with the same key must still apply."""
    table = str(tmp_path / "t")
    snapshot_write(
        spark.range(10).selectExpr("id", "id * 2 AS v"), table,
        mode="overwrite", n_files=1,
    )
    empty = spark.range(0).selectExpr("id")
    res = snapshot_merge(
        spark, table, empty, on=["id"], when_matched="delete",
        insert_not_matched=False, commit_key="k-noop",
    )
    assert res["version"] == 1 and res["replayed"] is False
    assert snapshot_versions(table)[-1] == 1
    real = snapshot_merge(
        spark, table, spark.range(3).selectExpr("id"), on=["id"],
        when_matched="delete", insert_not_matched=False,
        commit_key="k-noop",
    )
    assert real["replayed"] is False and real["version"] == 2


# ------------------------------------------------------------------ CDC sink


def _feed(spark, tmp_path, batches):
    """Stage CDC batches as single-file parquet with ascending mtimes so
    maxFilesPerTrigger=1 yields file i = micro-batch i."""
    import glob
    import shutil

    base = str(tmp_path / "feed")
    os.makedirs(base, exist_ok=True)
    for i, df in enumerate(batches):
        stage = os.path.join(base, f"_w{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        (src,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(base, f"b{i}.parquet")
        shutil.copyfile(src, dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
        shutil.rmtree(stage)
    return base


CDC_SCHEMA = "id BIGINT, v BIGINT, op STRING, lsn BIGINT"


def test_cdc_sink_end_to_end_mixed_ops(spark, tmp_path):
    b0 = spark.createDataFrame(
        [(i, i * 2, "insert", i) for i in range(20)], CDC_SCHEMA
    )
    b1 = spark.createDataFrame(
        # update 0..4, delete 5..9, insert 20..24; key 3 is updated then
        # deleted within the batch (dedup_by must net it to the delete)
        [(i, i * 100, "update", 100 + i) for i in range(5)]
        + [(i, 0, "delete", 120 + i) for i in range(5, 10)]
        + [(3, 0, "delete", 199)]
        + [(i, i * 2, "insert", 130 + i) for i in range(20, 25)],
        CDC_SCHEMA,
    )
    feed = _feed(spark, tmp_path, [b0, b1])
    table = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = snapshot_cdc_sink(
        stream, table, on=["id"], op_col="op", dedup_by="lsn",
        checkpoint_dir=ck,
    )
    assert q.awaitTermination(300)
    got = _rows(spark, table)
    want = (
        {(i, i * 100) for i in range(5) if i != 3}
        | {(i, i * 2) for i in range(10, 20)}
        | {(i, i * 2) for i in range(20, 25)}
    )
    assert got == want


def test_cdc_sink_merge_schema_new_feed_column(spark, tmp_path):
    """A CDC feed that carries a column the target table predates:
    merge_schema=True auto-adds it through the upsert leg (add-only,
    one commit with the batch), pre-feed rows NULL-backfill, and the
    delete leg — key-columns-only — is unaffected."""
    table = str(tmp_path / "tbl")
    snapshot_write(
        spark.range(10).selectExpr("id", "id * 2 AS v"), table,
        mode="overwrite", n_files=1,
    )
    schema = "id BIGINT, v BIGINT, w STRING, op STRING, lsn BIGINT"
    b0 = spark.createDataFrame(
        [(3, 300, "w3", "update", 1), (5, 0, None, "delete", 2),
         (20, 40, "w20", "insert", 3)],
        schema,
    )
    feed = _feed(spark, tmp_path, [b0])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = snapshot_cdc_sink(
        stream, table, on=["id"], op_col="op", dedup_by="lsn",
        checkpoint_dir=str(tmp_path / "ck"), merge_schema=True,
    )
    assert q.awaitTermination(300)
    got = {
        r["id"]: (r["v"], r["w"])
        for r in snapshot_read(spark, table).collect()
    }
    assert got[3] == (300, "w3") and got[20] == (40, "w20")
    assert 5 not in got and len(got) == 10
    assert got[1] == (2, None)  # pre-feed row: NULL-backfilled


def test_cdc_sink_replay_fresh_checkpoint_noop(spark, tmp_path):
    """The q114-style replay pin for MERGES: rerunning the whole feed
    from a FRESH checkpoint re-executes every batch, and every leg must
    no-op on its commit key — same final version, same content."""
    b0 = spark.createDataFrame(
        [(i, i * 2, "insert", i) for i in range(10)], CDC_SCHEMA
    )
    b1 = spark.createDataFrame(
        [(5, 555, "update", 100), (6, 0, "delete", 101)], CDC_SCHEMA
    )
    feed = _feed(spark, tmp_path, [b0, b1])
    table = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = snapshot_cdc_sink(
        stream, table, on=["id"], op_col="op", dedup_by="lsn",
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    assert q.awaitTermination(300)
    v1 = snapshot_versions(table)[-1]
    content = _rows(spark, table)
    stream2 = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q2 = snapshot_cdc_sink(
        stream2, table, on=["id"], op_col="op", dedup_by="lsn",
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    assert q2.awaitTermination(300)
    assert snapshot_versions(table)[-1] == v1
    assert _rows(spark, table) == content


def test_cdc_sink_crash_between_legs_converges(spark, tmp_path):
    """Crash AFTER the delete leg committed but BEFORE the upsert leg:
    the batch replays, the delete leg no-ops, the upsert leg applies —
    exactly-once either way. Simulated by applying the legs manually in
    the same order/keys the sink uses."""
    table = str(tmp_path / "tbl")
    snapshot_write(
        spark.createDataFrame(
            [(i, i * 2) for i in range(10)], "id BIGINT, v BIGINT"
        ),
        table, mode="overwrite", n_files=1,
    )
    dels = spark.createDataFrame([(7,)], "id BIGINT")
    ups = spark.createDataFrame([(1, 111), (20, 40)], "id BIGINT, v BIGINT")
    # first execution: delete leg lands, then "crash"
    snapshot_merge(
        spark, table, dels, on=["id"], when_matched="delete",
        insert_not_matched=False, strategy="eq", commit_key="cdc-9-d",
    )
    v_mid = snapshot_versions(table)[-1]
    # replay of the whole batch (what foreachBatch does on restart)
    r1 = snapshot_merge(
        spark, table, dels, on=["id"], when_matched="delete",
        insert_not_matched=False, strategy="eq", commit_key="cdc-9-d",
    )
    r2 = snapshot_merge(
        spark, table, ups, on=["id"], when_matched="update",
        insert_not_matched=True, strategy="eq", commit_key="cdc-9-u",
    )
    assert r1["replayed"] is True and r1["version"] == v_mid
    assert r2["replayed"] is False
    assert _rows(spark, table) == (
        {(i, i * 2) for i in range(10) if i not in (1, 7)}
        | {(1, 111), (20, 40)}
    )


def test_cdc_sink_pure_upsert_feed_no_opcol(spark, tmp_path):
    b0 = spark.createDataFrame(
        [(i, i * 2) for i in range(8)], "id BIGINT, v BIGINT"
    )
    b1 = spark.createDataFrame(
        [(3, 333), (8, 16)], "id BIGINT, v BIGINT"
    )
    feed = _feed(spark, tmp_path, [b0, b1])
    table = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema("id BIGINT, v BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = snapshot_cdc_sink(
        stream, table, on=["id"], checkpoint_dir=str(tmp_path / "ck")
    )
    assert q.awaitTermination(300)
    assert _rows(spark, table) == (
        {(i, i * 2) for i in range(8) if i != 3} | {(3, 333), (8, 16)}
    )


def test_cdc_sink_delete_only_batch_and_first_batch_deletes(spark, tmp_path):
    """Deletes in the FIRST batch (no table yet) are skipped — nothing
    to delete from; a later delete-only batch commits exactly one
    delete-leg version."""
    b0 = spark.createDataFrame(
        [(7, 0, "delete", 1), (1, 2, "insert", 2), (2, 4, "insert", 3)],
        CDC_SCHEMA,
    )
    b1 = spark.createDataFrame([(1, 0, "delete", 10)], CDC_SCHEMA)
    feed = _feed(spark, tmp_path, [b0, b1])
    table = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = snapshot_cdc_sink(
        stream, table, on=["id"], op_col="op", dedup_by="lsn",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert q.awaitTermination(300)
    assert _rows(spark, table) == {(2, 4)}


def test_cdc_sink_null_op_rows_net_to_upserts(spark, tmp_path):
    """Rows whose op column is NULL classify as upserts (coalesce
    semantics), including through the single-aggregate leg decision
    that replaced the per-leg isEmpty() jobs: a batch mixing NULL-op
    rows with deletes must run BOTH legs, and a batch of only NULL-op
    rows must skip the delete leg entirely (no empty delete-leg
    commit)."""
    b0 = spark.createDataFrame(
        [(1, 2, None, 1), (2, 4, None, 2), (3, 6, "insert", 3)],
        CDC_SCHEMA,
    )
    b1 = spark.createDataFrame(
        [(2, 0, "delete", 10), (4, 8, None, 11)], CDC_SCHEMA
    )
    feed = _feed(spark, tmp_path, [b0, b1])
    table = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = snapshot_cdc_sink(
        stream, table, on=["id"], op_col="op", dedup_by="lsn",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert q.awaitTermination(300)
    assert _rows(spark, table) == {(1, 2), (3, 6), (4, 8)}
    # batch 0 (NULL-op + insert rows, no deletes): bootstrap overwrite +
    # ONE upsert commit; batch 1: delete leg + upsert leg — 4 versions
    # total, i.e. the all-null batch committed no empty delete leg
    assert len(snapshot_versions(table)) == 4


# -------------------------------------------------------------- replication


def _content(spark, table, cols=("id", "v")):
    from e02_spark.ops.snapshot import snapshot_read

    return {
        tuple(r[c] for c in cols)
        for r in snapshot_read(spark, table).select(*cols).collect()
    }


def test_snapshot_replicate_mirror_converges_and_is_incremental(
    spark, tmp_path
):
    from e02_spark.ops.snapshot import snapshot_replicate

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    snapshot_write(
        spark.range(30).selectExpr("id", "id * 2 AS v"), src,
        mode="overwrite", n_files=2,
    )
    # a key's FULL history lands in the first drained batch: inserted
    # (v1), updated (v2), deleted (v3) — the mirror must land on the
    # final state, exercising the (_commit_version, insert-over-delete)
    # compaction
    snapshot_merge(
        spark, src, spark.createDataFrame([(5, 555), (40, 80)],
                                          "id BIGINT, v BIGINT"),
        on=["id"], when_matched="update", insert_not_matched=True,
        strategy="mor",
    )
    snapshot_merge(
        spark, src, spark.createDataFrame([(5,), (7,)], "id BIGINT"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    q = snapshot_replicate(spark, src, dst, on=["id"], checkpoint_dir=ck)
    assert q.awaitTermination(300)
    assert _content(spark, dst) == _content(spark, src)
    assert (5, 555) not in _content(spark, dst)  # deleted after update
    v_dst = snapshot_versions(dst)[-1]
    # no new source commits -> a re-run drains nothing and commits nothing
    q2 = snapshot_replicate(spark, src, dst, on=["id"], checkpoint_dir=ck)
    assert q2.awaitTermination(300)
    assert snapshot_versions(dst)[-1] == v_dst
    # incremental catch-up: mutate the source, re-run from the SAME
    # checkpoint — only the delta applies and the mirror converges again
    snapshot_merge(
        spark, src,
        spark.createDataFrame([(0, 999), (100, 1)], "id BIGINT, v BIGINT"),
        on=["id"], when_matched="update", insert_not_matched=True,
        strategy="eq",
    )
    snapshot_merge(
        spark, src, spark.createDataFrame([(1,)], "id BIGINT"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="eq",
    )
    q3 = snapshot_replicate(spark, src, dst, on=["id"], checkpoint_dir=ck)
    assert q3.awaitTermination(300)
    assert _content(spark, dst) == _content(spark, src)
    assert (0, 999) in _content(spark, dst)


def test_snapshot_replicate_survives_source_maintenance(spark, tmp_path):
    """rewrite_deletes/binpack on the source are data_change=false in
    the CDF stream: a replication run across them applies zero changes."""
    from e02_spark.ops.snapshot import (
        snapshot_binpack,
        snapshot_replicate,
        snapshot_rewrite_deletes,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    snapshot_write(
        spark.range(20).selectExpr("id", "id * 2 AS v"), src,
        mode="overwrite", n_files=4,
    )
    snapshot_merge(
        spark, src, spark.createDataFrame([(3,)], "id BIGINT"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    q = snapshot_replicate(spark, src, dst, on=["id"], checkpoint_dir=ck)
    assert q.awaitTermination(300)
    v_dst = snapshot_versions(dst)[-1]
    snapshot_rewrite_deletes(spark, src, n_files_new=2)
    snapshot_binpack(spark, src, target_rows=1000)
    q2 = snapshot_replicate(spark, src, dst, on=["id"], checkpoint_dir=ck)
    assert q2.awaitTermination(300)
    assert snapshot_versions(dst)[-1] == v_dst  # maintenance is silent
    assert _content(spark, dst) == _content(spark, src)


def test_cdc_sink_first_batch_dual_op_key_replay_stable(spark, tmp_path):
    """A key carried by BOTH legs of the FIRST batch (no dedup_by) must
    net to the upsert on every execution path: the empty-table bootstrap
    makes the delete leg run (and key itself) instead of being skipped,
    so a crash between the legs replays to the same final state as the
    crash-free run."""
    b0 = spark.createDataFrame(
        [(1, 0, "delete", 0), (1, 111, "insert", 0), (2, 4, "insert", 0)],
        CDC_SCHEMA,
    )
    feed = _feed(spark, tmp_path, [b0])
    # crash-free run
    t1 = str(tmp_path / "t1")
    q = snapshot_cdc_sink(
        spark.readStream.schema(CDC_SCHEMA).parquet(feed), t1,
        on=["id"], op_col="op", drop_cols=["lsn"],
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    assert q.awaitTermination(300)
    assert _rows(spark, t1) == {(1, 111), (2, 4)}
    # crash-between-legs run, replayed: bootstrap + delete leg land,
    # then the whole batch re-executes
    t2 = str(tmp_path / "t2")
    snapshot_write(
        spark.createDataFrame([], "id BIGINT, v BIGINT"), t2,
        mode="overwrite", n_files=1,
    )
    snapshot_merge(
        spark, t2, spark.createDataFrame([(1,)], "id BIGINT"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="eq", commit_key="cdc-0-d",
    )
    q2 = snapshot_cdc_sink(
        spark.readStream.schema(CDC_SCHEMA).parquet(feed), t2,
        on=["id"], op_col="op", drop_cols=["lsn"],
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    assert q2.awaitTermination(300)
    assert _rows(spark, t2) == _rows(spark, t1)


def test_cdc_sink_app_id_scopes_commit_keys(spark, tmp_path):
    """Two feeds whose batch ids both start at 0 land in the same table
    without colliding when each sink is given its own app_id — without
    scoping, the second feed's batch 0 would no-op on the first feed's
    cdc-0-u key and silently drop its rows."""
    table = str(tmp_path / "tbl")
    f1 = _feed(
        spark, tmp_path / "a",
        [spark.createDataFrame([(1, 10)], "id BIGINT, v BIGINT")],
    )
    f2 = _feed(
        spark, tmp_path / "b",
        [spark.createDataFrame([(2, 20)], "id BIGINT, v BIGINT")],
    )
    q1 = snapshot_cdc_sink(
        spark.readStream.schema("id BIGINT, v BIGINT").parquet(f1),
        table, on=["id"], checkpoint_dir=str(tmp_path / "ck1"),
        app_id="feed-a",
    )
    assert q1.awaitTermination(300)
    q2 = snapshot_cdc_sink(
        spark.readStream.schema("id BIGINT, v BIGINT").parquet(f2),
        table, on=["id"], checkpoint_dir=str(tmp_path / "ck2"),
        app_id="feed-b",
    )
    assert q2.awaitTermination(300)
    assert _rows(spark, table) == {(1, 10), (2, 20)}


def test_snapshot_replicate_clone_bootstrap(spark, tmp_path):
    """bootstrap='clone': the new mirror adopts the source's current
    snapshot zero-copy (O(metadata), no CDC rows for the base) and the
    stream applies only SUBSEQUENT changes; a rerun with the same
    checkpoint applies nothing; a crash between adopt and first drain
    restarts safely via the recorded base version."""
    from e02_spark.ops import snapshot as S
    from e02_spark.ops.snapshot import snapshot_replicate

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(
        [(k, k * 2) for k in range(400)], "id bigint, v bigint"
    ).createOrReplaceTempView("_clone_src")
    S.snapshot_write(
        spark.table("_clone_src"), src, mode="overwrite", n_files=2,
        cluster_by=["id"], stats_cols=["id"],
    )
    q = snapshot_replicate(
        spark, src, dst, on=["id"], checkpoint_dir=ck, bootstrap="clone",
    )
    assert q.awaitTermination(180)
    # base adopted zero-copy: same inodes, no CDC versions beyond the
    # bootstrap pair (empty overwrite + publish)
    assert S.snapshot_versions(dst) == [1, 2]
    assert S.snapshot_rows(dst) == 400
    import os

    src_m = S._read_manifest(src, 1)
    dst_m = S._read_manifest(dst, 2)
    src_inodes = {
        os.stat(os.path.join(src, e["path"])).st_ino
        for e in S._all_entries(src, src_m)
    }
    dst_inodes = {
        os.stat(os.path.join(dst, e["path"])).st_ino
        for e in S._all_entries(dst, dst_m)
    }
    # every source file adopted by link (zero bytes moved); the one
    # extra dst file is the bootstrap's empty overwrite carrier
    assert src_inodes <= dst_inodes
    assert sum(
        e["rows"] == 0 for e in S._all_entries(dst, dst_m)
    ) == len(dst_inodes - src_inodes) == 1
    # subsequent changes flow as CDC only
    S.snapshot_merge(
        spark, src,
        spark.createDataFrame([(3, 999), (500, 500)], "id bigint, v bigint"),
        on=["id"], when_matched="update", insert_not_matched=True,
    )
    S.snapshot_merge(
        spark, src, spark.createDataFrame([(7,)], "id bigint"),
        on=["id"], when_matched="delete", insert_not_matched=False,
    )
    q = snapshot_replicate(
        spark, src, dst, on=["id"], checkpoint_dir=ck, bootstrap="clone",
    )
    assert q.awaitTermination(180)
    got = {r["id"]: r["v"] for r in S.snapshot_read(spark, dst).collect()}
    assert got[3] == 999 and got[500] == 500 and 7 not in got
    assert len(got) == 400  # 400 - 1 delete + 1 insert
    # quiescent rerun: nothing drains, nothing commits
    v = S.snapshot_versions(dst)[-1]
    q = snapshot_replicate(
        spark, src, dst, on=["id"], checkpoint_dir=ck, bootstrap="clone",
    )
    assert q.awaitTermination(180)
    assert S.snapshot_versions(dst)[-1] == v
    # a source with outstanding deletes refuses clone by name
    src2, dst2 = str(tmp_path / "src2"), str(tmp_path / "dst2")
    S.snapshot_write(
        spark.range(20).selectExpr("id", "id AS v"), src2,
        mode="overwrite", n_files=1,
    )
    S.snapshot_merge(
        spark, src2, spark.createDataFrame([(1,)], "id bigint"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    with pytest.raises(ValueError, match="rewrite_deletes"):
        snapshot_replicate(
            spark, src2, dst2, on=["id"],
            checkpoint_dir=str(tmp_path / "ck2"), bootstrap="clone",
        )


def test_cdc_sink_auto_folds_delete_state_mid_stream(spark, tmp_path):
    """The fold-deletes maintenance invariant is SELF-ENFORCED: an eq
    CDC feed whose outstanding delete state crosses auto_fold_rows
    triggers snapshot_rewrite_deletes mid-stream (between batches, not
    by a human), the folds are data_change=false (CDF-silent — the
    q122 invariant), and the feed's net content is unchanged."""
    from e02_spark.ops.snapshot import _read_manifest
    from e02_spark.sources.snapshot_cdf_stream import (
        read_snapshot_changes_stream,
    )

    b0 = spark.createDataFrame(
        [(i, i * 2, "insert", i) for i in range(30)], CDC_SCHEMA
    )
    b1 = spark.createDataFrame(
        [(i, i * 100, "update", 100 + i) for i in range(10)]
        + [(i, 0, "delete", 120 + i) for i in range(10, 15)],
        CDC_SCHEMA,
    )
    b2 = spark.createDataFrame(
        [(i, i * 7, "update", 200 + i) for i in range(5, 8)], CDC_SCHEMA
    )
    feed = _feed(spark, tmp_path, [b0, b1, b2])
    table = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = snapshot_cdc_sink(
        stream, table, on=["id"], op_col="op", dedup_by="lsn",
        strategy="eq", checkpoint_dir=str(tmp_path / "ck"),
        auto_fold_rows=8,
    )
    assert q.awaitTermination(300)
    # content is the same as an unfolded run would produce
    want = (
        {(i, i * 100) for i in range(5)}
        | {(i, i * 7) for i in range(5, 8)}
        | {(i, i * 100) for i in range(8, 10)}
        | {(i, i * 2) for i in range(15, 30)}
    )
    assert _rows(spark, table) == want
    # folds happened MID-stream: at least two rewrite_deletes commits,
    # and at least one of them is not the final version
    versions = snapshot_versions(table)
    modes = {v: _read_manifest(table, v).get("mode") for v in versions}
    folds = [v for v, mo in modes.items() if mo == "rewrite_deletes"]
    assert len(folds) >= 2, modes
    assert any(v < versions[-1] for v in folds)
    for v in folds:  # CDF-silent maintenance steps
        assert _read_manifest(table, v).get("data_change") is False
    # outstanding delete state ended below the threshold
    m = _read_manifest(table, versions[-1])
    pending = sum(
        r["rows"] for r in m.get("deletes", []) + m.get("eq_deletes", [])
    )
    assert pending < 8
    # a CDF consumer over the whole history nets to the same content and
    # never attributes a row to a fold version
    out = []
    cq = (
        read_snapshot_changes_stream(spark, table)
        .writeStream.foreachBatch(lambda b, i: out.append(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_cdf"))
        .start()
    )
    cq.awaitTermination(120)
    rows = [r for b in out for r in b]
    assert not any(r["_commit_version"] in folds for r in rows)
    state: dict[int, int] = {}
    for r in sorted(rows, key=lambda r: (r["_commit_version"],
                                         r["_change_type"] != "delete")):
        if r["_change_type"] == "delete":
            state.pop(r["id"], None)
        else:
            state[r["id"]] = r["v"]
    assert set(state.items()) == want
