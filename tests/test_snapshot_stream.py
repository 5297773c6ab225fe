"""Streaming source over the snapshot table (sources/snapshot_stream.py):
version offsets, per-file partitions, schema-evolution backfill, restart
incrementality, the append-only fence, and end-to-end exactly-once into
the snapshot stream sink."""

from __future__ import annotations

import os

import pytest

from e02_spark.ops import snapshot as S
from e02_spark.sources.snapshot_stream import (
    SnapshotStreamReader,
    read_snapshot_stream,
)


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


def test_snapshot_stream_replay_evolution_and_restart(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    S.snapshot_write(spark.range(0, 10).selectExpr("id", "id*2 AS v"),
                     tbl, mode="overwrite", n_files=2)
    S.snapshot_write(spark.range(10, 25).selectExpr("id", "id*2 AS v"),
                     tbl, mode="append", n_files=3)
    S.snapshot_write(
        spark.range(25, 30).selectExpr("id", "id*2 AS v", "'x' AS tag"),
        tbl, mode="append",
    )
    df = read_snapshot_stream(spark, tbl)
    assert df.schema.simpleString() == "struct<id:bigint,v:bigint,tag:string>"
    rows = _drain(spark, df, ck)
    assert len(rows) == 30
    got = {r["id"]: (r["v"], r["tag"]) for r in rows}
    assert got[5] == (10, None)  # pre-evolution file NULL-backfills
    assert got[27] == (54, "x")
    # restart from the same checkpoint: only the new commit is emitted
    S.snapshot_write(
        spark.range(100, 103).selectExpr("id", "id*2 AS v", "'y' AS tag"),
        tbl, mode="append",
    )
    rows2 = _drain(spark, read_snapshot_stream(spark, tbl), ck)
    assert sorted(r["id"] for r in rows2) == [100, 101, 102]


def test_snapshot_stream_partitions_are_per_added_file(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(spark.range(6).selectExpr("id"), tbl,
                     mode="overwrite", n_files=2)
    S.snapshot_write(spark.range(6, 12).selectExpr("id"), tbl,
                     mode="append", n_files=3)
    r = SnapshotStreamReader({"table": tbl})
    assert r.initialOffset() == {"version": 0}
    assert r.latestOffset() == {"version": 2}
    assert len(r.partitions({"version": 0}, {"version": 1})) == 2
    assert len(r.partitions({"version": 1}, {"version": 2})) == 3
    # replay stability: same range -> same file list
    p1 = [p.path for p in r.partitions({"version": 0}, {"version": 2})]
    p2 = [p.path for p in r.partitions({"version": 0}, {"version": 2})]
    assert p1 == p2 and len(p1) == 5


def test_snapshot_stream_rate_limited_catchup(spark, tmp_path):
    """The append-only source shares the CDF source's admission
    contract: a deep append backlog is admitted as bounded micro-batches
    (files/rows/bytes caps, one-version progress floor) that drain to
    the same final content as an uncapped run."""
    tbl = str(tmp_path / "tbl")
    for i in range(8):
        S.snapshot_write(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id"), tbl,
            mode="overwrite" if i == 0 else "append", n_files=2,
        )
    r = SnapshotStreamReader({"table": tbl, "maxfilespertrigger": "4"})
    cur = r.initialOffset()
    batches = []
    for _ in range(50):
        end = r.latestOffset()
        if end["version"] == cur["version"]:
            break
        batches.append(len(r.partitions(cur, end)))
        cur = end
    assert cur["version"] == 8
    assert batches == [4, 4, 4, 4]  # 2 files/version, cap 4
    # rows cap
    r2 = SnapshotStreamReader({"table": tbl, "maxrowspertrigger": "15"})
    r2.initialOffset()
    assert r2.latestOffset()["version"] == 1  # 10 rows over a 15 cap
    # uncapped drains in one step, same coverage
    r3 = SnapshotStreamReader({"table": tbl})
    r3.initialOffset()
    assert r3.latestOffset() == {"version": 8}
    assert len(r3.partitions({"version": 0}, {"version": 8})) == 16


def test_snapshot_stream_append_only_fence(spark, tmp_path):
    """A version range that removes files (CoW merge / compaction) or
    adds tombstones (MoR merge) raises the named contract error."""
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(spark.range(10).selectExpr("id", "id AS v"), tbl,
                     mode="overwrite", n_files=2)
    r = SnapshotStreamReader({"table": tbl})
    S.snapshot_merge(spark, tbl, spark.range(1, 3).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="mor")
    with pytest.raises(ValueError, match="append-only contract"):
        r.partitions({"version": 1}, {"version": 2})
    S.snapshot_compact(spark, tbl, n_files=1)
    with pytest.raises(ValueError, match="append-only contract"):
        r.partitions({"version": 1}, {"version": 3})
    # but a fresh stream STARTING at the post-maintenance version is fine
    assert len(r.partitions({"version": 3}, {"version": 3})) == 0


def test_snapshot_stream_to_snapshot_sink_exactly_once(spark, tmp_path):
    """The full lakehouse loop: table A streamed through a transform into
    table B via the exactly-once snapshot sink; a replayed drain appends
    nothing twice."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ck = str(tmp_path / "ck")
    S.snapshot_write(spark.range(0, 50).selectExpr("id", "id % 5 AS g"),
                     a, mode="overwrite", n_files=4)
    S.snapshot_write(spark.range(50, 80).selectExpr("id", "id % 5 AS g"),
                     a, mode="append", n_files=2)

    def run():
        df = read_snapshot_stream(spark, a).where("id % 2 = 0")
        q = S.snapshot_stream_sink(df, b, checkpoint_dir=ck)
        q.awaitTermination(120)

    run()
    n1 = S.snapshot_rows(b)
    assert n1 == 40
    run()  # no new upstream commits: replay must be a structural no-op
    assert S.snapshot_rows(b) == 40
    assert S.snapshot_read(spark, b).where("id % 2 = 1").count() == 0


def test_append_stream_expired_cursor_raises_named_error(spark, tmp_path):
    """Round-13 ADVICE fix: a capped append-only stream whose cursor
    version was expired raises the SAME named lag/expire contract error
    as the CDF source (shared manifest_or_lag_error), never a raw
    FileNotFoundError."""
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(spark.range(5).selectExpr("id"), tbl, mode="overwrite")
    S.snapshot_write(spark.range(5, 9).selectExpr("id"), tbl, mode="append")
    S.snapshot_write(spark.range(9, 12).selectExpr("id"), tbl, mode="append")
    S.snapshot_expire(tbl, keep_last=1)
    r = SnapshotStreamReader({"table": tbl, "maxfilespertrigger": "1"})
    r._cursor = 1  # a lagging checkpointed cursor at the expired version
    with pytest.raises(ValueError, match="snapshot_expire collected"):
        r.latestOffset()
