"""Persisted incremental materialized views (ops/mv.py): state lives in
a snapshot table, refreshes fold the source CDF into it exactly-once,
and the source-version cursor rides the same atomic commit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e02_spark.ops import snapshot as S
from e02_spark.ops.mv import mv_create, mv_read, mv_refresh


def _src(spark, tmp_path):
    tbl = str(tmp_path / "src")
    S.snapshot_write(
        spark.range(200).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS g", "id * 10 AS v"
        ),
        tbl, mode="overwrite", n_files=4, cluster_by=["id"],
        stats_cols=["id"],
    )
    return tbl


def _recompute(spark, tbl):
    return {
        (r["g"], r["n_rows"], r["v_sum"])
        for r in S.snapshot_read(spark, tbl)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.sum(F.col("v").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("v_sum"),
        )
        .collect()
    }


def _view(spark, mv, version=None):
    return {
        (r["g"], r["n_rows"], r["v_sum"])
        for r in mv_read(spark, mv, version=version).collect()
    }


def test_mv_create_refresh_matches_recompute(spark, tmp_path):
    src = _src(spark, tmp_path)
    mv = str(tmp_path / "mv")
    assert mv_create(spark, src, mv, ["g"], {"v_sum": "v"}) == 1
    assert _view(spark, mv) == _recompute(spark, src)
    # mixed mutations: append + CoW update + MoR delete + eq upsert
    S.snapshot_write(
        spark.range(200, 230).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS g", "id * 10 AS v"
        ),
        src, mode="append", n_files=1,
    )
    S.snapshot_merge(
        spark, src,
        spark.range(0, 20).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS g", "id * 100 AS v"
        ),
        on=["id"], when_matched="update", insert_not_matched=True,
        strategy="cow",
    )
    S.snapshot_merge(
        spark, src, spark.range(50, 60).selectExpr("id"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    S.snapshot_merge(
        spark, src,
        spark.range(100, 120).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS g", "id * 7 AS v"
        ),
        on=["id"], when_matched="update", insert_not_matched=True,
        strategy="eq",
    )
    res = mv_refresh(spark, src, mv)
    assert res["noop"] is False
    assert res["refreshed_to"] == S.snapshot_versions(src)[-1]
    assert _view(spark, mv) == _recompute(spark, src)
    # quiescent source: refresh is a no-op, no new MV version
    v_mv = S.snapshot_versions(mv)[-1]
    res2 = mv_refresh(spark, src, mv)
    assert res2["noop"] is True and S.snapshot_versions(mv)[-1] == v_mv
    # time travel: version 1 is the view as of the original create
    S.snapshot_write(
        spark.range(500, 505).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS g", "id * 10 AS v"
        ),
        src, mode="append", n_files=1,
    )
    mv_refresh(spark, src, mv)
    assert _view(spark, mv) == _recompute(spark, src)
    assert len(S.snapshot_versions(mv)) == 3


def test_mv_minmax_recompute_on_retract(spark, tmp_path):
    src = _src(spark, tmp_path)
    mv = str(tmp_path / "mv")
    mv_create(spark, src, mv, ["g"], {"v_sum": "v"}, minmax={"v": "v"})
    # delete the global max of group '4' (id 199, v 1990): the stored
    # extreme retracts, only the dirty group re-aggregates
    S.snapshot_merge(
        spark, src, spark.createDataFrame([(199,)], "id BIGINT"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    mv_refresh(spark, src, mv)
    want = {
        (r["g"], r["mx"])
        for r in S.snapshot_read(spark, src)
        .groupBy("g")
        .agg(F.round(F.max(F.col("v").cast("decimal(18,4)")), 4)
             .cast("double").alias("mx"))
        .collect()
    }
    got = {
        (r["g"], r["max_v"]) for r in mv_read(spark, mv).collect()
    }
    assert got == want
    assert ("4", 1990.0) not in got


def test_mv_extinct_group_drops(spark, tmp_path):
    src = _src(spark, tmp_path)
    mv = str(tmp_path / "mv")
    mv_create(spark, src, mv, ["g"], {"v_sum": "v"})
    # group '3' = ids 3, 8, 13, ... — delete all of them
    S.snapshot_merge(
        spark, src, spark.range(3, 200, 5).selectExpr("id"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="cow",
    )
    mv_refresh(spark, src, mv)
    assert {r["g"] for r in mv_read(spark, mv).collect()} == {
        "0", "1", "2", "4"
    }


def test_mv_survives_its_own_maintenance(spark, tmp_path):
    """The MV table is an ordinary snapshot table: binpack/compact on it
    carry the definition + cursor properties forward, and refresh keeps
    working afterwards."""
    src = _src(spark, tmp_path)
    mv = str(tmp_path / "mv")
    mv_create(spark, src, mv, ["g"], {"v_sum": "v"})
    S.snapshot_compact(spark, mv, n_files=1)
    S.snapshot_write(
        spark.range(300, 320).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS g", "id * 10 AS v"
        ),
        src, mode="append", n_files=1,
    )
    res = mv_refresh(spark, src, mv)
    assert res["noop"] is False
    assert _view(spark, mv) == _recompute(spark, src)


def test_mv_replayed_refresh_is_exactly_once(spark, tmp_path):
    """A duplicate refresher racing to the same source version commits
    exactly one MV version: the second write no-ops on the
    mv-refresh-<v> idempotency key (here simulated by re-running the
    whole refresh body against a stale cursor read)."""
    src = _src(spark, tmp_path)
    mv = str(tmp_path / "mv")
    mv_create(spark, src, mv, ["g"], {"v_sum": "v"})
    S.snapshot_write(
        spark.range(400, 410).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS g", "id * 10 AS v"
        ),
        src, mode="append", n_files=1,
    )
    cur = S.snapshot_versions(src)[-1]
    mv_refresh(spark, src, mv)
    v_after = S.snapshot_versions(mv)[-1]
    # the raced duplicate: same state fold, same key -> no new version
    from e02_spark.ops.ivm import apply_agg_delta

    delta = S.snapshot_changes(spark, src, 1, cur)
    stale_state = S.snapshot_read(spark, mv, version=1)
    dup = apply_agg_delta(stale_state, delta, ["g"], {"v_sum": "v"})
    v_dup = S.snapshot_write(
        dup, mv, mode="overwrite", n_files=1,
        idempotency_key=f"mv-refresh-{cur}",
    )
    assert v_dup == v_after
    assert S.snapshot_versions(mv)[-1] == v_after
    assert _view(spark, mv) == _recompute(spark, src)


def test_mv_rejects_rolled_back_source_and_non_mv(spark, tmp_path):
    src = _src(spark, tmp_path)
    mv = str(tmp_path / "mv")
    with pytest.raises(ValueError, match="not a materialized view"):
        mv_read(spark, src)
    mv_create(spark, src, mv, ["g"], {"v_sum": "v"})
    with pytest.raises(ValueError, match="measure COLUMNS"):
        mv_create(
            spark, src, str(tmp_path / "mv2"), ["g"],
            {"v_sum": F.col("v")},
        )


def test_mv_recreate_with_new_definition_rebuilds(spark, tmp_path):
    """Re-creating the view with a DIFFERENT definition at the same
    source version must rebuild (the create key fingerprints the
    definition), not no-op against the old definition."""
    src = _src(spark, tmp_path)
    mv = str(tmp_path / "mv")
    mv_create(spark, src, mv, ["g"], {"v_sum": "v"})
    mv_create(spark, src, mv, ["g"], {"v_sum": "id"})  # redefinition
    props = S._read_manifest(mv, S.snapshot_versions(mv)[-1])["properties"]
    assert props["mv_sums"] == {"v_sum": "id"}
    want = {
        (r["g"], r["s"])
        for r in S.snapshot_read(spark, src)
        .groupBy("g")
        .agg(F.round(F.sum(F.col("id").cast("decimal(18,4)")), 4)
             .cast("double").alias("s"))
        .collect()
    }
    got = {(r["g"], r["v_sum"]) for r in mv_read(spark, mv).collect()}
    assert got == want
    # identical re-create stays an idempotent no-op
    v = S.snapshot_versions(mv)[-1]
    mv_create(spark, src, mv, ["g"], {"v_sum": "id"})
    assert S.snapshot_versions(mv)[-1] == v


def test_mv_concurrent_refresher_pins_one_version_and_cas_guards(
    spark, tmp_path, monkeypatch
):
    """The torn-read race: refresher A plans against cursor C but a
    concurrent refresher B advances the MV (state + cursor) before A
    commits. A's commit must CAS-fail on the pinned MV version and
    re-plan — never overwrite B's state with a fold that double-counts
    part of B's delta."""
    import e02_spark.ops.mv as mvmod

    src = _src(spark, tmp_path)
    mv = str(tmp_path / "mv")
    mv_create(spark, src, mv, ["g"], {"v_sum": "v"})  # cursor = src v1

    def _append(lo, hi):
        S.snapshot_write(
            spark.range(lo, hi).selectExpr(
                "id", "CAST(id % 5 AS STRING) AS g", "id * 10 AS v"
            ),
            src, mode="append", n_files=1,
        )

    _append(200, 230)  # src v2
    real_changes = mvmod.snapshot_changes
    state = {"raced": False}

    def racing_changes(sp, table, lo, hi, **kw):
        delta = real_changes(sp, table, lo, hi, **kw)
        if not state["raced"]:
            state["raced"] = True
            # competing refresher B lands AFTER A planned its fold:
            # the source advances again and B folds everything
            _append(230, 245)  # src v3
            mv_refresh(spark, src, mv)  # B: cursor 1 -> 3, MV v2
        return delta

    monkeypatch.setattr(mvmod, "snapshot_changes", racing_changes)
    res = mv_refresh(spark, src, mv)  # A: planned (1, 2], loses the CAS
    assert state["raced"]
    # A re-pinned after the CAS failure and found B's cursor current
    assert res["noop"] and res["refreshed_to"] == 3
    # exactly one fold happened: B's commit is the only new MV version,
    # and the view equals the recompute (no double-counted delta)
    assert S.snapshot_versions(mv)[-1] == 2
    assert _view(spark, mv) == _recompute(spark, src)


def test_snapshot_write_expected_version_cas(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = spark.range(5).selectExpr("id", "id AS v")
    S.snapshot_write(df, tbl, mode="overwrite")
    with pytest.raises(S.ConcurrentWriteError, match="v7.*v1"):
        S.snapshot_write(df, tbl, mode="overwrite", expected_version=7)
    # matching expectation commits normally
    assert S.snapshot_write(df, tbl, mode="overwrite", expected_version=1) == 2


def test_mv_stream_maintains_live_across_mutations(spark, tmp_path):
    """Continuous MV: the CDF STREAM drives the refresh — one live query
    folds each micro-batch into the stored state; maintenance commits
    flow through as zero rows; replay of an already-folded range is a
    no-op; an overlapping out-of-band refresh raises by name."""
    from e02_spark.ops.mv import mv_stream

    src = _src(spark, tmp_path)
    mv = str(tmp_path / "mv")
    ck = str(tmp_path / "ck")
    mv_create(spark, src, mv, ["g"], {"v_sum": "v"})

    def drain(q):
        q.awaitTermination(180)

    # mixed mutations: append + CoW update + MoR delete + compaction
    S.snapshot_write(
        spark.range(200, 240).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS g", "id * 10 AS v"
        ),
        src, mode="append", n_files=1,
    )
    S.snapshot_merge(
        spark, src,
        spark.range(0, 30).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS g", "id * 100 AS v"
        ),
        on=["id"], when_matched="update", insert_not_matched=True,
    )
    S.snapshot_compact(spark, src, n_files=2)  # CDF-silent step
    drain(mv_stream(spark, src, mv, ck))
    assert _view(spark, mv) == _recompute(spark, src)
    cursor = S._read_manifest(mv, S.snapshot_versions(mv)[-1])[
        "properties"
    ]["mv_src_version"]
    # the cursor tracks the last DATA-CHANGING version folded; the
    # trailing compact (data_change=false) contributes zero rows and
    # legitimately leaves the cursor one behind — safe, later windows
    # skip it as an empty step
    last_dc = max(
        v
        for v in S.snapshot_versions(src)
        if S._read_manifest(src, v).get("data_change") is not False
    )
    assert cursor == last_dc == S.snapshot_versions(src)[-1] - 1
    # second window, SAME checkpoint: only the new delta folds
    S.snapshot_merge(
        spark, src, spark.range(10, 20).selectExpr("id"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    drain(mv_stream(spark, src, mv, ck))
    assert _view(spark, mv) == _recompute(spark, src)
    # replay of an ALREADY-FOLDED range (fresh checkpoint, old start):
    # batches whose hi <= cursor skip — no double fold
    v_mv = S.snapshot_versions(mv)[-1]
    drain(mv_stream(spark, src, mv, str(tmp_path / "ck2"),
                    starting_version=1))
    assert S.snapshot_versions(mv)[-1] == v_mv
    assert _view(spark, mv) == _recompute(spark, src)
    # a PARTIALLY-overlapping batch raises by name: advance the source,
    # then start a stream whose range straddles the cursor
    from pyspark.errors.exceptions.captured import StreamingQueryException

    S.snapshot_write(
        spark.range(300, 320).selectExpr(
            "id", "CAST(id % 5 AS STRING) AS g", "id * 10 AS v"
        ),
        src, mode="append", n_files=1,
    )
    with pytest.raises(StreamingQueryException, match="overlaps"):
        drain(mv_stream(spark, src, mv, str(tmp_path / "ck3"),
                        starting_version=1))
    # the failed stream committed nothing; the normal path recovers
    drain(mv_stream(spark, src, mv, str(tmp_path / "ck4")))
    assert _view(spark, mv) == _recompute(spark, src)
