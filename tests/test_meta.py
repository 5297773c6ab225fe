"""Metadata tables (ops/meta.py): files / deletes / history / refs /
partitions as DataFrames, answered from ONE committed manifest read —
the Iceberg table$files / table$history / table$refs surface."""

from __future__ import annotations

import json

import pytest

from e02_spark.ops import snapshot as S
from e02_spark.ops.meta import snapshot_meta, snapshot_register_meta


@pytest.fixture()
def lake(spark, tmp_path):
    """A table with history: clustered base, append, MoR delete, a tag
    and a live branch — every metadata kind has something to show."""
    tbl = str(tmp_path / "tbl")
    base = spark.range(0, 1000).selectExpr("id", "id % 7 as grp")
    S.snapshot_write(base, tbl, mode="overwrite", n_files=4,
                     cluster_by=["id"], stats_cols=["id"],
                     bloom_cols=["id"])
    more = spark.range(1000, 1200).selectExpr("id", "id % 7 as grp")
    S.snapshot_write(more, tbl, mode="append", n_files=1)
    keys = spark.createDataFrame([(3,), (500,)], "id long")
    S.snapshot_merge(spark, tbl, keys, on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="mor")
    S.snapshot_tag(tbl, "cut-1", version=1)
    S.snapshot_branch_create(tbl, "wip")
    return tbl


def test_files_matches_manifest(spark, lake):
    m = S._read_manifest(lake, S.snapshot_versions(lake)[-1])
    entries = S._all_entries(lake, m)
    df = snapshot_meta(spark, lake, "files")
    rows = df.collect()
    assert len(rows) == len(entries) == 5
    assert df.groupBy().sum("rows").first()[0] == sum(
        e["rows"] for e in entries
    )
    by_path = {r["path"]: r for r in rows}
    for e in entries:
        r = by_path[e["path"]]
        assert r["seq"] == e["seq"]
        if "id" in e["stats"]:
            assert r["lower_bounds"]["id"] == str(e["stats"]["id"][0])
        else:  # the append passed no stats_cols — bounds honestly empty
            assert r["lower_bounds"] == {}
        assert r["bloom_cols"] == sorted(e.get("bloom") or {})


def test_deletes_shows_both_flavors(spark, lake, tmp_path):
    df = snapshot_meta(spark, lake, "deletes")
    got = {(r["flavor"], r["rows"]) for r in df.collect()}
    assert got == {("dv", 2)}  # the MoR merge's two tombstones
    # add an eq flavor on a fresh table
    tbl2 = str(tmp_path / "t2")
    S.snapshot_write(
        spark.range(10).selectExpr("id", "id as v"), tbl2,
        mode="overwrite", n_files=1,
    )
    S.snapshot_merge(
        spark, tbl2, spark.createDataFrame([(3,)], "id long"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="eq",
    )
    d2 = snapshot_meta(spark, tbl2, "deletes").collect()
    assert [(r["flavor"], r["eq_on"]) for r in d2] == [("eq", ["id"])]


def test_history_refs_and_version_pin(spark, lake):
    hist = snapshot_meta(spark, lake, "history").collect()
    assert [r["version"] for r in hist] == S.snapshot_versions(lake)
    assert hist[0]["mode"] == "overwrite"
    assert hist[-1]["tombstones"] == 2
    assert all(
        r["committed_at"] is not None for r in hist
    )
    refs = {
        (r["name"], r["type"], r["version"])
        for r in snapshot_meta(spark, lake, "refs").collect()
    }
    assert ("cut-1", "tag", 1) in refs
    assert any(n == "wip" and t == "branch" for n, t, _ in refs)
    # version pin: v1's files view has only the 4 clustered base files
    f1 = snapshot_meta(spark, lake, "files", version=1)
    assert f1.count() == 4
    # history pins too: post-pin commits must not leak into the frozen
    # view (the ADVICE-flagged inconsistency with files/deletes)
    h1 = snapshot_meta(spark, lake, "history", version=1).collect()
    assert [r["version"] for r in h1] == [1]
    h2 = snapshot_meta(spark, lake, "history", version=2).collect()
    assert [r["version"] for r in h2] == [1, 2]
    with pytest.raises(ValueError, match="version 99"):
        snapshot_meta(spark, lake, "history", version=99)
    S.snapshot_branch_drop(lake, "wip")


def test_partitions_rollup(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 4000).selectExpr("id", "id % 4 as b")
    S.snapshot_write(df, tbl, mode="overwrite", n_files=8,
                     partition_spec=[("bucket", "b", 4)])
    parts = snapshot_meta(spark, tbl, "partitions").collect()
    assert sum(r["rows"] for r in parts) == 4000
    vals = {json.loads(r["partition"])["_pt_bucket4_b"] for r in parts}
    # clustered hidden-first layout: every file single-valued, no guess;
    # the value set is exactly the buckets crc32 actually lands b in
    import zlib

    expect = {str(zlib.crc32(str(v).encode()) % 4) for v in range(4)}
    assert "*mixed*" not in vals and vals == expect


def test_register_meta_sql(spark, lake):
    names = snapshot_register_meta(spark, lake, "lk")
    assert "lk_files" in names
    small = spark.sql(
        "SELECT count(*) AS n FROM lk_files WHERE rows <= 200"
    ).first()["n"]
    assert small == 1  # the 200-row append file; base files carry 250
    # maintenance planning in plain SQL: files per shard
    per_shard = spark.sql(
        "SELECT shard, count(*) AS files FROM lk_files GROUP BY shard"
    ).collect()
    assert sum(r["files"] for r in per_shard) == 5
    S.snapshot_branch_drop(lake, "wip")
