"""Column RENAME / DROP (metadata-only schema evolution beyond
add-only): snapshot_rename_column / snapshot_drop_column.

Contract under test: zero data rewritten; reads resolve renamed columns
across their physical name history (sound because every file carries
exactly one of the names); stats/bloom pruning probes the history;
every path that cannot keep those guarantees REFUSES by name (spec /
check / eq-delete references, name reuse, pinned-schema CDF streams)
rather than silently degrading."""

from __future__ import annotations

import pytest

from e02_spark.ops import snapshot as S


def _base(spark, tbl, bloom=False):
    evens = spark.range(0, 2000, 2).selectExpr("id", "id * 10 as v")
    odds = spark.range(1, 2000, 2).selectExpr("id", "id * 10 as v")
    S.snapshot_write(evens, tbl, mode="overwrite", n_files=1,
                     stats_cols=["v"],
                     bloom_cols=["v"] if bloom else None)
    S.snapshot_write(odds, tbl, mode="append", n_files=1, stats_cols=["v"])
    return evens, odds


def test_rename_roundtrip_zero_rewrite(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _base(spark, tbl)
    files_before = {
        e["path"] for e in S._all_entries(tbl, S._read_manifest(tbl, 2))
    }
    v = S.snapshot_rename_column(tbl, "v", "amount")
    m = S._read_manifest(tbl, v)
    assert {
        e["path"] for e in S._all_entries(tbl, m)
    } == files_before, "rename must rewrite zero data files"
    df = S.snapshot_read(spark, tbl)
    assert df.columns == ["id", "amount"]
    got = {r["id"]: r["amount"] for r in df.collect()}
    assert len(got) == 2000 and got[7] == 70 and got[8] == 80
    # time travel: the pre-rename version still reads under its own name
    assert S.snapshot_read(spark, tbl, version=2).columns == ["id", "v"]
    # appends land under the NEW name and mix correctly with old files
    S.snapshot_write(
        spark.range(2000, 2100).selectExpr("id", "id * 10 as amount"),
        tbl, mode="append", n_files=1,
    )
    assert S.snapshot_read(spark, tbl).where("amount = 20500").count() == 1
    assert S.snapshot_read(spark, tbl).count() == 2100
    # maintenance mixes old- and new-named files into one output — the
    # coalesce stays row-correct through the union
    S.snapshot_binpack(spark, tbl, target_rows=5000)
    got2 = {r["id"]: r["amount"] for r in S.snapshot_read(spark, tbl).collect()}
    assert got2[7] == 70 and got2[2050] == 20500 and len(got2) == 2100


def test_rename_keeps_stats_and_bloom_pruning(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _base(spark, tbl, bloom=True)
    S.snapshot_rename_column(tbl, "v", "w")
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert S._bloom_cols(m) == ["w"]
    assert m["stats_cols"] == ["w"]
    # range prune on the NEW name reaches the OLD files' old-name stats
    kept, _ = S._plan_files(tbl, None, ("w", 5_000, 6_000), manifest=m)
    assert len(kept) == 2  # both files span the range (interleaved)
    kept, _ = S._plan_files(tbl, None, ("w", 50_000, 60_000), manifest=m)
    assert kept == []  # ...and a disjoint range still prunes BOTH
    # point probe: bloom under the old physical name still prunes; 420
    # lives only in the evens file
    dropped: list = []
    kept, _ = S._plan_files(
        tbl, None, ("w", 420, 420), manifest=m, bloom_dropped=dropped
    )
    assert len(kept) == 1 and len(dropped) == 1
    assert S.snapshot_read(spark, tbl, prune=("w", 420, 420)).where(
        "w = 420"
    ).count() == 1


def test_merge_on_renamed_key_converges(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(100).selectExpr("id", "id * 2 as v"), tbl,
        mode="overwrite", n_files=2, cluster_by=["id"], stats_cols=["id"],
    )
    S.snapshot_rename_column(tbl, "id", "key")
    keys = spark.createDataFrame([(3,), (50,)], "key long")
    r = S.snapshot_merge(spark, tbl, keys, on=["key"],
                         when_matched="delete", insert_not_matched=False)
    assert S.snapshot_rows(tbl) == 98
    assert S.snapshot_read(spark, tbl).where("key in (3, 50)").count() == 0
    # eq flavor records the NEW name
    S.snapshot_merge(
        spark, tbl, spark.createDataFrame([(7,)], "key long"), on=["key"],
        when_matched="delete", insert_not_matched=False, strategy="eq",
    )
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert [e["on"] for e in S._eq_entries(tbl, m)] == [["key"]]
    assert S.snapshot_read(spark, tbl).where("key = 7").count() == 0


def test_cdf_batch_across_rename_uses_new_names(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(10).selectExpr("id", "id as v"), tbl,
        mode="overwrite", n_files=1,
    )
    S.snapshot_rename_column(tbl, "v", "w")
    S.snapshot_write(
        spark.range(10, 14).selectExpr("id", "id as w"), tbl,
        mode="append", n_files=1,
    )
    ch = S.snapshot_changes(spark, tbl, 1, 3)
    assert "w" in ch.columns and "v" not in ch.columns
    rows = ch.collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert {r["w"] for r in rows} == {10, 11, 12, 13}


def test_drop_column_and_name_retirement(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(50).selectExpr("id", "id as v", "id * 3 as x"), tbl,
        mode="overwrite", n_files=1,
    )
    S.snapshot_drop_column(tbl, "x")
    df = S.snapshot_read(spark, tbl)
    assert df.columns == ["id", "v"]
    # the dropped name is RETIRED: re-adding it would resurrect the old
    # files' physical values
    with pytest.raises(ValueError, match="dropped or renamed-away"):
        S.snapshot_write(
            spark.range(5).selectExpr("id", "id as v", "id as x"), tbl,
            mode="append", n_files=1,
        )
    # ...and so is the whole name history of a renamed-then-dropped col
    S.snapshot_rename_column(tbl, "v", "u")
    S.snapshot_drop_column(tbl, "u")
    for name in ("u", "v"):
        with pytest.raises(ValueError, match="dropped or renamed-away"):
            S.snapshot_write(
                spark.range(5).selectExpr("id", f"id as {name}"), tbl,
                mode="append", n_files=1,
            )
    # truncate-and-load replaces content: the name world resets
    S.snapshot_write(
        spark.range(5).selectExpr("id", "id as v", "id as x"), tbl,
        mode="overwrite", n_files=1,
    )
    assert S.snapshot_read(spark, tbl).columns == ["id", "v", "x"]
    assert S._col_mapping(
        S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    ) == {}


def test_rename_drop_guards(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(100).selectExpr(
            "id", "id as v", "cast(id as string) as s"
        ),
        tbl, mode="overwrite", n_files=1,
        partition_spec=[("bucket", "s", 4)],
    )
    with pytest.raises(ValueError, match="partition transform"):
        S.snapshot_rename_column(tbl, "s", "s2")
    S.snapshot_set_check(spark, tbl, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="CHECK"):
        S.snapshot_rename_column(tbl, "v", "v2")
    with pytest.raises(ValueError, match="CHECK"):
        S.snapshot_drop_column(tbl, "v")
    S.snapshot_drop_check(tbl, "v_pos")
    S.snapshot_merge(
        spark, tbl, spark.createDataFrame([(1,)], "id long"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="eq",
    )
    with pytest.raises(ValueError, match="equality-delete"):
        S.snapshot_rename_column(tbl, "id", "pk")
    S.snapshot_rewrite_deletes(spark, tbl)
    S.snapshot_rename_column(tbl, "id", "pk")  # now allowed
    with pytest.raises(ValueError, match="in use"):
        S.snapshot_rename_column(tbl, "v", "pk")  # live name
    with pytest.raises(ValueError, match="in use"):
        S.snapshot_rename_column(tbl, "v", "id")  # former physical name
    with pytest.raises(ValueError, match="no column"):
        S.snapshot_rename_column(tbl, "ghost", "g2")


def test_cdf_stream_replays_history_across_pre_pin_rename(spark, tmp_path):
    """A stream STARTED AFTER a rename replays the whole history under
    the pinned (new) schema with correct VALUES — the pinned column
    mapping resolves pre-rename files' old physical names executor-side
    (the silent-NULL hole this pin closes)."""
    from e02_spark.sources.snapshot_cdf_stream import (
        read_snapshot_changes_stream,
    )

    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(10).selectExpr("id", "id * 10 as v"), tbl,
        mode="overwrite", n_files=1,
    )
    S.snapshot_rename_column(tbl, "v", "w")
    S.snapshot_write(
        spark.range(10, 12).selectExpr("id", "id * 10 as w"), tbl,
        mode="append", n_files=1,
    )
    q = (
        read_snapshot_changes_stream(spark, tbl, starting_version=0)
        .writeStream.format("memory").queryName("replay_ren")
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    got = {
        (r["id"], r["w"], r["_change_type"])
        for r in spark.sql("SELECT * FROM replay_ren").collect()
    }
    assert got == {(i, i * 10, "insert") for i in range(12)}, got


def test_cdf_stream_fences_on_post_pin_rename_and_widen(spark, tmp_path):
    """A rename/drop/widen landing AFTER the stream pinned its schema
    is NOT representable and fences by name (driver-side planning unit:
    the reader object pins at construction)."""
    from e02_spark.sources.snapshot_cdf_stream import (
        SnapshotCDFStreamReader,
    )

    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(10).selectExpr(
            "id", "id as v", "cast(id as int) as n"
        ),
        tbl, mode="overwrite", n_files=1,
    )
    rdr = SnapshotCDFStreamReader({"table": tbl})  # pins v1's schema
    S.snapshot_rename_column(tbl, "v", "w")
    S.snapshot_write(
        spark.range(10, 12).selectExpr(
            "id", "id as w", "cast(id as int) as n"
        ),
        tbl, mode="append", n_files=1,
    )
    with pytest.raises(ValueError, match="renamed or dropped"):
        rdr.partitions({"version": 0}, {"version": 3})
    # widen after the pin: the pinned narrow type cannot hold it
    tbl2 = str(tmp_path / "t2")
    S.snapshot_write(
        spark.range(5).selectExpr("id", "cast(id as int) as n"), tbl2,
        mode="overwrite", n_files=1,
    )
    rdr2 = SnapshotCDFStreamReader({"table": tbl2})
    S.snapshot_widen_column(tbl2, "n", "long")
    S.snapshot_write(
        spark.range(5, 7).selectExpr("id", "id as n"), tbl2,
        mode="append", n_files=1,
    )
    with pytest.raises(ValueError, match="losslessly"):
        rdr2.partitions({"version": 0}, {"version": 3})


def test_cdf_stream_fences_on_non_string_step_type(spark, tmp_path):
    """A step manifest recording a NON-STRING type (a struct/map dict —
    nothing today's widen API writes, but a future schema shape) for a
    pinned column must raise the documented fence ValueError, not a bare
    TypeError from hashing the dict against _WIDEN_OK."""
    import json

    from e02_spark.sources.snapshot_cdf_stream import (
        SnapshotCDFStreamReader,
    )

    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(5).selectExpr("id", "cast(id as int) as n"), tbl,
        mode="overwrite", n_files=1,
    )
    rdr = SnapshotCDFStreamReader({"table": tbl})  # pins v1's schema
    S.snapshot_write(
        spark.range(5, 7).selectExpr("id", "cast(id as int) as n"), tbl,
        mode="append", n_files=1,
    )
    # forge v2's `n` into a struct type, bypassing the widen API
    mp = S._manifest_path(tbl, 2)
    with open(mp) as fh:
        m = json.load(fh)
    for f in m["schema"]["fields"]:
        if f["name"] == "n":
            f["type"] = {"type": "struct", "fields": []}
    with open(mp, "w") as fh:
        json.dump(m, fh)
    with pytest.raises(ValueError, match="losslessly"):
        rdr.partitions({"version": 0}, {"version": 2})


def test_publish_guards_on_name_history(spark, tmp_path):
    """snapshot_publish refuses (a) a staging table that itself carries
    a rename history (adopted physical names would be unreadable under
    main's mapping) and (b) staging columns that reuse MAIN's retired
    names (the add-only union would resurrect old values)."""
    main = str(tmp_path / "main")
    S.snapshot_write(
        spark.range(20).selectExpr("id", "id as v"), main,
        mode="overwrite", n_files=1,
    )
    S.snapshot_rename_column(main, "v", "w")
    # (a) staging with its own history
    stg1 = str(tmp_path / "stg1")
    S.snapshot_write(
        spark.range(5).selectExpr("id", "id as a"), stg1,
        mode="overwrite", n_files=1,
    )
    S.snapshot_rename_column(stg1, "a", "w")
    with pytest.raises(ValueError, match="rename/drop history"):
        S.snapshot_publish(spark, stg1, main)
    # (b) staging reusing main's retired physical name
    stg2 = str(tmp_path / "stg2")
    S.snapshot_write(
        spark.range(5).selectExpr("id", "id as w", "id as v"), stg2,
        mode="overwrite", n_files=1,
    )
    with pytest.raises(ValueError, match="renamed-away"):
        S.snapshot_publish(spark, stg2, main)
    # clean staging under the CURRENT names publishes fine
    stg3 = str(tmp_path / "stg3")
    S.snapshot_write(
        spark.range(20, 30).selectExpr("id", "id as w"), stg3,
        mode="overwrite", n_files=1,
    )
    r = S.snapshot_publish(spark, stg3, main)
    assert r["rows_adopted"] == 10
    assert S.snapshot_read(spark, main).count() == 30
    got = {r2["id"]: r2["w"] for r2 in S.snapshot_read(spark, main).collect()}
    assert got[3] == 3 and got[25] == 25


def test_widen_column_int_to_long(spark, tmp_path):
    """Type widening: metadata-only, old int32 files upcast at read,
    post-widen appends carry values past 2^31, merges span both file
    generations, narrowing/lossy changes and reference'd columns refuse
    by name."""
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(100).selectExpr(
            "cast(id as int) as n", "id as v"
        ),
        tbl, mode="overwrite", n_files=2, cluster_by=["n"],
        stats_cols=["n"],
    )
    files_before = {
        e["path"] for e in S._all_entries(tbl, S._read_manifest(tbl, 1))
    }
    v = S.snapshot_widen_column(tbl, "n", "long")
    m = S._read_manifest(tbl, v)
    assert {e["path"] for e in S._all_entries(tbl, m)} == files_before
    df = S.snapshot_read(spark, tbl)
    assert dict(df.dtypes)["n"] == "bigint"
    assert df.count() == 100
    # values past int32 now append cleanly and mix with old files
    big = 3_000_000_000
    S.snapshot_write(
        spark.createDataFrame([(big, 1)], "n long, v long"), tbl,
        mode="append", n_files=1,
    )
    assert S.snapshot_read(spark, tbl).where(f"n = {big}").count() == 1
    # stats pruning still works across generations
    kept, _ = S._plan_files(tbl, None, ("n", 0, 10))
    assert 0 < len(kept) < 3
    # merge spans both generations
    S.snapshot_merge(
        spark, tbl, spark.createDataFrame([(7,), (big,)], "n long"),
        on=["n"], when_matched="delete", insert_not_matched=False,
    )
    assert S.snapshot_rows(tbl) == 99
    # refusals: narrowing, lossy, unknown, referenced
    with pytest.raises(ValueError, match="lossless"):
        S.snapshot_widen_column(tbl, "v", "integer")  # narrowing
    with pytest.raises(ValueError, match="lossless"):
        S.snapshot_widen_column(tbl, "v", "double")  # long->double lossy
    with pytest.raises(ValueError, match="already"):
        S.snapshot_widen_column(tbl, "n", "long")
    tbl2 = str(tmp_path / "t2")
    S.snapshot_write(
        spark.range(10).selectExpr("cast(id as int) as k", "id as v"),
        tbl2, mode="overwrite", n_files=1,
        partition_spec=[("bucket", "k", 4)],
    )
    with pytest.raises(ValueError, match="partition transform"):
        S.snapshot_widen_column(tbl2, "k", "long")


def test_widen_float_to_double_and_cdf(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(10).selectExpr("id", "cast(id as float) as x"), tbl,
        mode="overwrite", n_files=1,
    )
    S.snapshot_widen_column(tbl, "x", "double")
    assert dict(S.snapshot_read(spark, tbl).dtypes)["x"] == "double"
    S.snapshot_write(
        spark.range(10, 12).selectExpr("id", "cast(id as double) as x"),
        tbl, mode="append", n_files=1,
    )
    # batch CDF across the widen emits the wide type from both sides
    ch = S.snapshot_changes(spark, tbl, 1, 3)
    assert dict(ch.dtypes)["x"] == "double"
    assert ch.count() == 2  # the appended rows; the widen step is silent


def test_narrow_writer_appends_into_widened_column(spark, tmp_path):
    """A writer still producing the NARROW type appends cleanly after a
    widen — its files carry the narrow physical type and readers upcast
    like any pre-widen file; a genuinely incompatible type still
    raises."""
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(5).selectExpr("id", "cast(id as int) as n"), tbl,
        mode="overwrite", n_files=1,
    )
    S.snapshot_widen_column(tbl, "n", "long")
    S.snapshot_write(
        spark.range(5, 8).selectExpr("id", "cast(id as int) as n"), tbl,
        mode="append", n_files=1,
    )
    df = S.snapshot_read(spark, tbl)
    assert dict(df.dtypes)["n"] == "bigint" and df.count() == 8
    with pytest.raises(ValueError, match="ADDING columns only"):
        S.snapshot_write(
            spark.range(2).selectExpr("id", "cast(id as string) as n"),
            tbl, mode="append", n_files=1,
        )
