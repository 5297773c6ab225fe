"""Commit timestamps: AS OF <timestamp> time travel, history times,
retention-by-age expiry, and the monotone clamp that keeps wall-clock
skew between writers from ever resolving a LATER version for an
EARLIER probe (the Delta/Iceberg dual version/timestamp contract)."""

from __future__ import annotations

import datetime as dt

import pytest

from e02_spark.ops import snapshot as S


def _write_at(spark, tbl, rows, t, monkeypatch, mode="append"):
    """Commit with the clock seam pinned to epoch `t`."""
    monkeypatch.setattr(S, "_now", lambda: float(t))
    S.snapshot_write(
        spark.createDataFrame([(k, v) for k, v in rows], "id bigint, v bigint"),
        tbl, mode=mode, n_files=1, stats_cols=["id"],
    )


def test_as_of_timestamp_resolution(spark, tmp_path, monkeypatch):
    tbl = str(tmp_path / "t")
    _write_at(spark, tbl, [(1, 10)], 1000.0, monkeypatch, mode="overwrite")
    _write_at(spark, tbl, [(2, 20)], 2000.0, monkeypatch)
    _write_at(spark, tbl, [(3, 30)], 3000.0, monkeypatch)

    def ids(**kw):
        return sorted(
            r["id"] for r in S.snapshot_read(spark, tbl, **kw).collect()
        )

    assert ids(as_of=1500.0) == [1]
    assert ids(as_of=2000.0) == [1, 2]  # inclusive: committed AT the probe
    assert ids(as_of=99999.0) == [1, 2, 3]
    # datetime and ISO-string probes resolve identically
    probe = dt.datetime.fromtimestamp(2500.0)
    assert ids(as_of=probe) == [1, 2]
    assert ids(as_of=probe.isoformat()) == [1, 2]
    with pytest.raises(ValueError, match="predates the first commit"):
        S.snapshot_read(spark, tbl, as_of=10.0)
    with pytest.raises(ValueError, match="not both"):
        S.snapshot_read(spark, tbl, version=1, as_of=1500.0)
    # history carries the clamped times
    h = S.snapshot_history(tbl)
    assert [x["timestamp"] for x in h] == [1000.0, 2000.0, 3000.0]


def test_clock_skew_clamps_monotone(spark, tmp_path, monkeypatch):
    """A skewed writer stamping v2 BEFORE v1's time must not make
    as_of resolve v2 for a probe between the raw stamps: reads clamp
    times non-decreasing, so version order always wins."""
    tbl = str(tmp_path / "t")
    _write_at(spark, tbl, [(1, 10)], 5000.0, monkeypatch, mode="overwrite")
    _write_at(spark, tbl, [(2, 20)], 4000.0, monkeypatch)  # skewed back
    _write_at(spark, tbl, [(3, 30)], 6000.0, monkeypatch)
    assert [t for _, t in S._version_times(tbl)] == [5000.0, 5000.0, 6000.0]
    with pytest.raises(ValueError, match="predates"):
        # 4500 < every clamped time: before the table existed, NOT v2
        S.snapshot_read(spark, tbl, as_of=4500.0)
    assert sorted(
        r["id"] for r in S.snapshot_read(spark, tbl, as_of=5000.0).collect()
    ) == [1, 2]  # v2's clamped time equals v1's; the LATEST such wins


def test_expire_by_age_keeps_window_and_latest(spark, tmp_path, monkeypatch):
    tbl = str(tmp_path / "t")
    now = 100_000.0
    _write_at(spark, tbl, [(1, 10)], now - 5000, monkeypatch, mode="overwrite")
    _write_at(spark, tbl, [(2, 20)], now - 3000, monkeypatch)
    _write_at(spark, tbl, [(3, 30)], now - 100, monkeypatch)
    _write_at(spark, tbl, [(4, 40)], now - 50, monkeypatch)
    monkeypatch.setattr(S, "_now", lambda: now)
    res = S.snapshot_expire(tbl, keep_last=1, max_age_s=1000.0)
    # v1 aged out; v3/v4 are in the window, and v2 survives as the
    # BOUNDARY version (current at the window's start, so as_of probes
    # anywhere inside the window keep resolving)
    assert res["manifests_dropped"] == 1
    assert S.snapshot_versions(tbl) == [2, 3, 4]
    assert S.snapshot_read(spark, tbl, version=3).count() == 3
    # keep_last floor holds even when EVERYTHING aged out
    res = S.snapshot_expire(tbl, keep_last=1, max_age_s=1.0)
    assert S.snapshot_versions(tbl) == [4]
    assert sorted(
        r["id"] for r in S.snapshot_read(spark, tbl).collect()
    ) == [1, 2, 3, 4]


def test_expire_by_age_keeps_boundary_version(spark, tmp_path, monkeypatch):
    """Retention-by-age must also keep the version that was CURRENT at
    the window's start: an as_of probe anywhere inside the advertised
    window keeps resolving."""
    tbl = str(tmp_path / "t")
    now = 200_000.0
    _write_at(spark, tbl, [(1, 10)], now - 5000, monkeypatch, mode="overwrite")
    _write_at(spark, tbl, [(2, 20)], now - 4000, monkeypatch)
    _write_at(spark, tbl, [(3, 30)], now - 100, monkeypatch)
    monkeypatch.setattr(S, "_now", lambda: now)
    S.snapshot_expire(tbl, keep_last=1, max_age_s=1000.0)
    # v2 was current at now-1000 -> kept; v1 truly aged out
    assert S.snapshot_versions(tbl) == [2, 3]
    assert sorted(
        r["id"]
        for r in S.snapshot_read(spark, tbl, as_of=now - 500).collect()
    ) == [1, 2]


def test_cdf_by_timestamp_batch_and_stream(spark, tmp_path, monkeypatch):
    """snapshot_changes and the CDF stream accept TIMESTAMP endpoints
    (the Delta startingTimestamp contract): the start is INCLUSIVE of
    commits at the probe instant (copying a commit's own time from
    history resumes FROM it); the end means 'up to and including the
    snapshot current at that instant'."""
    tbl = str(tmp_path / "t")
    _write_at(spark, tbl, [(1, 10)], 1000.0, monkeypatch, mode="overwrite")
    _write_at(spark, tbl, [(2, 20)], 2000.0, monkeypatch)
    _write_at(spark, tbl, [(3, 30)], 3000.0, monkeypatch)
    ch = S.snapshot_changes(spark, tbl, from_ts=1500.0, to_ts=99999.0)
    assert sorted(r["id"] for r in ch.collect()) == [2, 3]
    # INCLUSIVE start boundary (the Delta startingTimestamp contract):
    # copying v2's own commit time from history resumes FROM v2
    ch = S.snapshot_changes(spark, tbl, from_ts=2000.0, to_ts=99999.0)
    assert sorted(r["id"] for r in ch.collect()) == [2, 3]
    # inclusive upper boundary: to_ts at v2's instant includes v2
    ch = S.snapshot_changes(spark, tbl, from_ts=1500.0, to_ts=2000.0)
    assert sorted(r["id"] for r in ch.collect()) == [2]
    # a from_ts at/before the first commit has no base snapshot to diff
    with pytest.raises(ValueError, match="first commit"):
        S.snapshot_changes(spark, tbl, from_ts=500.0, to_ts=99999.0)
    # exactly one endpoint form per side
    with pytest.raises(ValueError, match="exactly one of"):
        S.snapshot_changes(spark, tbl, 1, 3, from_ts=1500.0)
    with pytest.raises(ValueError, match="exactly one of"):
        S.snapshot_changes(spark, tbl, from_ts=1500.0)
    # the stream twin
    from e02_spark.sources.snapshot_cdf_stream import (
        read_snapshot_changes_stream,
    )

    out = []
    q = (
        read_snapshot_changes_stream(spark, tbl, starting_timestamp=2000.0)
        .writeStream.foreachBatch(lambda b, i: out.append(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    rows = [r for b in out for r in b]
    assert sorted(r["id"] for r in rows) == [2, 3]
    assert sorted(r["_commit_version"] for r in rows) == [2, 3]


def test_named_tags_read_protect_and_drop(spark, tmp_path, monkeypatch):
    """Iceberg-style tags: a named ref resolves reads, PINS its version
    against both keep_last and max_age_s expiry, survives rollback and
    other commits, and dropping it makes the version expirable again."""
    tbl = str(tmp_path / "t")
    now = 500_000.0
    _write_at(spark, tbl, [(1, 10)], now - 900, monkeypatch, mode="overwrite")
    _write_at(spark, tbl, [(2, 20)], now - 800, monkeypatch)
    monkeypatch.setattr(S, "_now", lambda: now - 700)
    S.snapshot_tag(tbl, "training-cut", 2)
    _write_at(spark, tbl, [(3, 30)], now - 600, monkeypatch)
    _write_at(spark, tbl, [(4, 40)], now - 10, monkeypatch)

    def ids(**kw):
        return sorted(
            r["id"] for r in S.snapshot_read(spark, tbl, **kw).collect()
        )

    assert ids(tag="training-cut") == [1, 2]
    with pytest.raises(KeyError, match="no tag"):
        S.snapshot_read(spark, tbl, tag="nope")
    with pytest.raises(ValueError, match="at most one"):
        S.snapshot_read(spark, tbl, version=2, tag="training-cut")
    # the tag commit is metadata-only and CDF-silent
    m = S._read_manifest(tbl, 3)
    assert m["mode"] == "tag" and m["data_change"] is False
    # tags survive rollback (pointers, not content): roll content back
    # to v4 = [1,2,3]; the tag still resolves v2
    S.snapshot_rollback(tbl, 4)
    assert ids() == [1, 2, 3]
    assert ids(tag="training-cut") == [1, 2]
    # expire: keep_last=1 + tight age window, yet v2 survives via the tag
    monkeypatch.setattr(S, "_now", lambda: now)
    S.snapshot_expire(tbl, keep_last=1, max_age_s=100.0)
    assert 2 in S.snapshot_versions(tbl)
    assert ids(tag="training-cut") == [1, 2]
    # idempotent re-tag no-ops; moving the tag commits
    v = S.snapshot_versions(tbl)[-1]
    assert S.snapshot_tag(tbl, "training-cut", 2) == v
    S.snapshot_tag(tbl, "training-cut")  # move to current
    assert ids(tag="training-cut") == ids()
    # drop: the old version expires on the next pass
    S.snapshot_drop_tag(tbl, "training-cut")
    with pytest.raises(KeyError):
        S.snapshot_drop_tag(tbl, "training-cut")
    S.snapshot_expire(tbl, keep_last=1)
    assert 2 not in S.snapshot_versions(tbl)
    assert ids() == [1, 2, 3]
