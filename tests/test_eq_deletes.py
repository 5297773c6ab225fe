"""Equality deletes (ops/snapshot.py strategy='eq' — the Iceberg-v2
second delete flavor): zero-target-read write path, sequence-number
scoping, read/CDF/maintenance composition with positional DVs, and the
metadata-honesty rules (COUNT(*) underivable until a rewrite folds the
eq files back in)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from e02_spark.ops import snapshot as S


def _ids(spark, tbl):
    return sorted(
        r["id"] for r in S.snapshot_read(spark, tbl).select("id").collect()
    )


def test_eq_delete_and_seq_scoped_reinsert(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(0, 20).selectExpr("id", "id * 2 AS v"), tbl,
        mode="overwrite", n_files=2, cluster_by=["id"], stats_cols=["id"],
    )
    res = S.snapshot_merge(
        spark, tbl, spark.range(0, 20, 4).selectExpr("id"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="eq",
    )
    # the whole point: the write path touched no data file
    assert res["files_rewritten"] == 0 and res["files_added"] == 0
    assert res["eq_keys"] == 5 and res["rows_after"] is None
    assert _ids(spark, tbl) == [i for i in range(20) if i % 4]
    # re-inserting a deleted key AFTER the eq delete: the new file's
    # higher sequence number exempts it from the older delete
    S.snapshot_write(
        spark.createDataFrame([(4, 999)], "id bigint, v bigint"), tbl,
        mode="append",
    )
    assert 4 in _ids(spark, tbl)
    assert (
        S.snapshot_read(spark, tbl).where("id = 4").first()["v"] == 999
    )
    # time travel: the pre-delete version still reads everything
    assert len(
        S.snapshot_read(spark, tbl, version=1).collect()
    ) == 20


def test_eq_upsert_converges_with_cow(spark, tmp_path):
    cow = str(tmp_path / "cow")
    eq = str(tmp_path / "eq")
    base = spark.range(0, 30).selectExpr("id", "CAST(id % 3 AS STRING) AS g")
    upd = spark.range(0, 40, 5).selectExpr("id", "'U' AS g")
    for t in (cow, eq):
        S.snapshot_write(base, t, mode="overwrite", n_files=3,
                         cluster_by=["id"], stats_cols=["id"])
    rc = S.snapshot_merge(spark, cow, upd, on=["id"], when_matched="update",
                          insert_not_matched=True)
    re = S.snapshot_merge(spark, eq, upd, on=["id"], when_matched="update",
                          insert_not_matched=True, strategy="eq")
    assert re["files_rewritten"] == 0 and rc["files_rewritten"] > 0
    a = S.snapshot_read(spark, cow).select("id", "g")
    b = S.snapshot_read(spark, eq).select("id", "g")
    assert a.exceptAll(b).unionByName(b.exceptAll(a)).count() == 0


def test_eq_metadata_honesty_and_history(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(spark.range(10).selectExpr("id"), tbl, mode="overwrite",
                     stats_cols=["id"])
    S.snapshot_merge(spark, tbl, spark.range(2, 4).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="eq")
    with pytest.raises(ValueError, match="EQUALITY deletes"):
        S.snapshot_rows(tbl)
    ag = S.snapshot_agg(tbl, "id")
    assert ag["rows"] is None and not ag["exact_bounds"]
    h = S.snapshot_history(tbl)
    assert h[-1]["rows"] is None and h[-1]["eq_delete_keys"] == 2
    assert h[0]["rows"] == 10 and h[0]["eq_delete_keys"] == 0
    # prior versions still metadata-answerable
    assert S.snapshot_rows(tbl, version=1) == 10


def test_rewrite_deletes_folds_both_flavors(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(0, 100).selectExpr("id", "id AS v"), tbl,
        mode="overwrite", n_files=4, cluster_by=["id"], stats_cols=["id"],
    )
    # positional tombstones (MoR) in the low range
    S.snapshot_merge(spark, tbl, spark.range(0, 10).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="mor")
    # equality delete confined to the low half by key bounds
    S.snapshot_merge(spark, tbl, spark.range(30, 40).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="eq")
    want = [i for i in range(100) if not (i < 10 or 30 <= i < 40)]
    assert _ids(spark, tbl) == want
    res = S.snapshot_rewrite_deletes(spark, tbl, n_files_new=2)
    assert res["tombstones_removed"] == 10 and res["eq_files_removed"] == 1
    # stats-disjoint upper files were NOT rewritten (4 files over 0..99
    # clustered by id: the eq delete [30,40) + tombstones [0,10) touch
    # at most 3 of them)
    assert res["files_rewritten"] < 4
    assert _ids(spark, tbl) == want
    assert S.snapshot_rows(tbl) == len(want)  # metadata count restored
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert m["deletes"] == [] and m["eq_deletes"] == []


def test_eq_then_mor_merge_sees_shadowed_rows_as_absent(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(spark.range(0, 12).selectExpr("id", "id AS v"), tbl,
                     mode="overwrite", n_files=2, stats_cols=["id"])
    S.snapshot_merge(spark, tbl, spark.range(0, 6).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="eq")
    # an upsert of keys 0..5 must treat them as UNMATCHED (inserts), and
    # a MoR pass must not tombstone already-eq-deleted rows
    res = S.snapshot_merge(
        spark, tbl,
        spark.range(0, 6).selectExpr("id", "id + 100 AS v"),
        on=["id"], when_matched="update", insert_not_matched=True,
        strategy="mor",
    )
    assert res["tombstones_added"] == 0  # nothing live matched
    got = {r["id"]: r["v"] for r in S.snapshot_read(spark, tbl).collect()}
    assert got == {**{i: i + 100 for i in range(6)},
                   **{i: i for i in range(6, 12)}}


def test_eq_cdf_batch_and_append_only_fence(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(spark.range(0, 16).selectExpr("id", "id AS v"), tbl,
                     mode="overwrite", n_files=2, cluster_by=["id"],
                     stats_cols=["id"])
    S.snapshot_merge(spark, tbl, spark.range(3, 6).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="eq")
    ch = S.snapshot_changes(spark, tbl, 1, 2)
    got = sorted(
        (r["_change_type"], r["id"]) for r in ch.collect()
    )
    assert got == [("delete", 3), ("delete", 4), ("delete", 5)]
    # an append AFTER the eq delete: its CDF step is inserts only, and
    # re-inserted key 3 is NOT re-deleted by the older eq file
    S.snapshot_write(spark.createDataFrame([(3, 33)], "id bigint, v bigint"),
                     tbl, mode="append")
    ch2 = S.snapshot_changes(spark, tbl, 2, 3)
    assert [(r["_change_type"], r["id"], r["v"]) for r in ch2.collect()] == [
        ("insert", 3, 33)
    ]
    # full-range CDF composes: v1 -> v3 nets to (delete 3,4,5 + insert 3')
    ch3 = S.snapshot_changes(spark, tbl, 1, 3)
    assert sorted((r["_change_type"], r["id"]) for r in ch3.collect()) == [
        ("delete", 3), ("delete", 4), ("delete", 5), ("insert", 3),
    ]
    # the append-only stream source fences on the eq step
    from e02_spark.sources.snapshot_stream import SnapshotStreamReader

    r = SnapshotStreamReader({"table": tbl})
    with pytest.raises(ValueError, match="append-only contract"):
        r.partitions({"version": 1}, {"version": 2})
    # ... while the CDF STREAM plans it (round 9 — fence lifted): one
    # eq-delta partition per stats-applicable file, carrying the key set
    from e02_spark.sources.snapshot_cdf_stream import SnapshotCDFStreamReader

    rc = SnapshotCDFStreamReader({"table": tbl})
    parts = rc.partitions({"version": 1}, {"version": 2})
    eq_parts = [p for p in parts if p.match is not None]
    assert eq_parts and all(p.change_type == "delete" for p in eq_parts)
    # stats-pruned: keys 3..5 live in the low clustered file only
    assert len(eq_parts) == 1
    assert eq_parts[0].match[0][1] == ((3,), (4,), (5,))


def test_eq_mode_constraint_errors(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(spark.range(5).selectExpr("id", "id AS v"), tbl,
                     mode="overwrite")
    with pytest.raises(ValueError, match="insert_not_matched=True"):
        S.snapshot_merge(spark, tbl,
                         spark.range(2).selectExpr("id", "id AS v"),
                         on=["id"], when_matched="update",
                         insert_not_matched=False, strategy="eq")
    with pytest.raises(ValueError, match="insert_not_matched=False"):
        S.snapshot_merge(spark, tbl, spark.range(2).selectExpr("id"),
                         on=["id"], when_matched="delete",
                         insert_not_matched=True, strategy="eq")


def test_eq_binpack_and_compact_compose(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(spark.range(0, 50).selectExpr("id", "id AS v"), tbl,
                     mode="overwrite", n_files=1, stats_cols=["id"])
    for lo in (50, 60):  # two small appends -> binpack fodder
        S.snapshot_write(
            spark.range(lo, lo + 10).selectExpr("id", "id AS v"), tbl,
            mode="append",
        )
    S.snapshot_merge(spark, tbl, spark.range(55, 65).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="eq")
    want = [i for i in range(70) if not (55 <= i < 65)]
    assert _ids(spark, tbl) == want
    S.snapshot_binpack(spark, tbl, target_rows=40)
    assert _ids(spark, tbl) == want  # repacked small files folded eq in
    S.snapshot_compact(spark, tbl, n_files=1)
    assert _ids(spark, tbl) == want
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert m["eq_deletes"] == [] and m["deletes"] == []
    assert S.snapshot_rows(tbl) == len(want)


def test_eq_expire_keeps_live_eq_files(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(spark.range(10).selectExpr("id"), tbl, mode="overwrite")
    S.snapshot_merge(spark, tbl, spark.range(2, 5).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="eq")
    S.snapshot_expire(tbl, keep_last=1, clean_orphans=True)
    assert _ids(spark, tbl) == [0, 1, 5, 6, 7, 8, 9]
    # the eq file itself survived expire (still referenced)
    assert glob.glob(os.path.join(tbl, "deletes", "*", "*.parquet"))


def test_merge_with_outstanding_eq_deletes_on_other_key_columns(
    spark, tmp_path
):
    """A table carrying eq-delete files keyed on columns OUTSIDE the
    current merge's `on` must still merge: the candidate scan selects
    the union of the merge keys and every outstanding eq key column, so
    _apply_eq_deletes resolves (previously an AnalysisException until a
    rewrite folded the eq files)."""
    tbl = str(tmp_path / "mixed")
    S.snapshot_write(
        spark.range(0, 20).selectExpr("id", "id + 100 AS u", "id * 2 AS v"),
        tbl, mode="overwrite", n_files=2, cluster_by=["id"],
        stats_cols=["id"],
    )
    # GDPR-style purge keyed on u — a DIFFERENT key set than the CDC key
    S.snapshot_merge(
        spark, tbl,
        spark.createDataFrame([(104,), (110,)], "u bigint"),
        on=["u"], when_matched="delete", insert_not_matched=False,
        strategy="eq",
    )
    assert sorted(
        r["id"] for r in S.snapshot_read(spark, tbl).select("id").collect()
    ) == [i for i in range(20) if i not in (4, 10)]
    # CoW upsert keyed on id while the u-keyed eq files are outstanding:
    # id=3 is live (updated in place); id=4 is eq-shadowed (logically
    # absent -> insert; its NEW file's higher seq exempts it from the
    # old u-delete even though u=104)
    res = S.snapshot_merge(
        spark, tbl,
        spark.createDataFrame(
            [(3, 103, 999), (4, 104, 888)], "id bigint, u bigint, v bigint"
        ),
        on=["id"], when_matched="update", insert_not_matched=True,
        strategy="cow",
    )
    assert not res["replayed"]
    rows = {
        r["id"]: r["v"] for r in S.snapshot_read(spark, tbl).collect()
    }
    assert rows[3] == 999 and rows[4] == 888
    assert 10 not in rows and len(rows) == 19
    # MoR flavor exercises the same scan path
    S.snapshot_merge(
        spark, tbl,
        spark.createDataFrame([(5, 105, 777)], "id bigint, u bigint, v bigint"),
        on=["id"], when_matched="update", insert_not_matched=True,
        strategy="mor",
    )
    rows = {r["id"]: r["v"] for r in S.snapshot_read(spark, tbl).collect()}
    assert rows[5] == 777 and len(rows) == 19
