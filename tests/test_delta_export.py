"""Delta Lake export (ops/export.py), pinned by an INDEPENDENT reader.

The point of the exporter is third-party readability, so the verifier
here shares zero code with it: `_read_delta_independently` is a
spec-following Delta log reader written from the public protocol doc
(github.com/delta-io/delta PROTOCOL.md — replay add/remove actions in
log order, project the metaData schemaString), and DuckDB — not Spark,
not the snapshot reader — reads the data files it selects. If the
exported bytes weren't genuine Delta, this reader wouldn't reconstruct
`snapshot_read`'s content.
"""

from __future__ import annotations

import glob
import json
import os

import duckdb
import pytest

from e02_spark.ops import snapshot as S
from e02_spark.ops.export import snapshot_export_delta


def _read_delta_independently(dest: str):
    """(column names, sorted row tuples) for the Delta table at `dest`,
    via plain json + DuckDB only."""
    logs = sorted(glob.glob(os.path.join(dest, "_delta_log", "*.json")))
    assert logs, f"no _delta_log under {dest}"
    live: dict[str, dict] = {}
    schema = None
    protocol = None
    for p in logs:
        with open(p) as fh:
            for line in fh:
                if not line.strip():
                    continue
                act = json.loads(line)
                if "metaData" in act:
                    schema = json.loads(act["metaData"]["schemaString"])
                elif "protocol" in act:
                    protocol = act["protocol"]
                elif "add" in act:
                    live[act["add"]["path"]] = act["add"]
                elif "remove" in act:
                    live.pop(act["remove"]["path"], None)
    assert protocol == {"minReaderVersion": 1, "minWriterVersion": 2}
    assert schema is not None and schema["type"] == "struct"
    # spec shape: every field carries name/type/nullable/metadata
    for f in schema["fields"]:
        assert set(f) >= {"name", "type", "nullable", "metadata"}, f
    cols = [f["name"] for f in schema["fields"]]
    if not live:
        return cols, []
    paths = [os.path.join(dest, p) for p in sorted(live)]
    for p in paths:
        assert os.path.exists(p), f"log references missing file {p}"
    sel = ", ".join(f'"{c}"' for c in cols)
    rows = duckdb.connect().execute(
        f"SELECT {sel} FROM read_parquet(?, union_by_name=true) "
        f"ORDER BY ALL",
        [paths],
    ).fetchall()
    return cols, rows


def _snapshot_rows_sorted(spark, table, cols, version=None):
    got = (
        S.snapshot_read(spark, table, version=version)
        .select(*cols)
        .collect()
    )
    return sorted(tuple(r[c] for c in cols) for r in got)


def test_zero_copy_export_roundtrip(spark, tmp_path):
    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    df = spark.range(1000).selectExpr(
        "id", "concat('n-', id % 37) AS tag", "cast(id * 1.5 AS double) AS x"
    )
    S.snapshot_write(df, tbl, mode="overwrite", n_files=4,
                     cluster_by=["id"], stats_cols=["id"],
                     bloom_cols=["id"])
    r = snapshot_export_delta(spark, tbl, dest)
    assert r["mode"] == "zero-copy"
    assert r["log_version"] == 0 and r["files_added"] == 4
    cols, rows = _read_delta_independently(dest)
    assert cols == ["id", "tag", "x"]
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    # zero-copy means shared bytes: exported files hard-link the
    # snapshot's data files (same inode), no data was rewritten
    m = S._read_manifest(tbl, 1)
    for e in S._all_entries(tbl, m):
        src = os.path.join(tbl, e["path"])
        dst = os.path.join(dest, e["path"])
        assert os.path.samefile(src, dst)
    # per-file stats in the log agree with the manifest's bounds
    logs = sorted(glob.glob(os.path.join(dest, "_delta_log", "*.json")))
    adds = [
        json.loads(line)["add"]
        for line in open(logs[0])
        if line.strip() and "\"add\"" in line
    ]
    by_path = {e["path"]: e for e in S._all_entries(tbl, m)}
    for a in adds:
        st = json.loads(a["stats"])
        e = by_path[a["path"]]
        assert st["numRecords"] == e["rows"]
        assert st["minValues"]["id"] == e["stats"]["id"][0]
        assert st["maxValues"]["id"] == e["stats"]["id"][1]
    # re-export of the same source version is a no-op
    r2 = snapshot_export_delta(spark, tbl, dest)
    assert r2["mode"] == "noop" and r2["files_added"] == 0


def test_export_materializes_on_deletes_and_renames(spark, tmp_path):
    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    df = spark.range(500).selectExpr("id", "id % 9 AS v")
    S.snapshot_write(df, tbl, mode="overwrite", n_files=2,
                     stats_cols=["id"])
    S.snapshot_merge(
        spark, tbl,
        spark.createDataFrame([(7,), (13,)], "id long"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )
    S.snapshot_rename_column(tbl, "v", "w")
    # forced zero-copy names both blockers
    with pytest.raises(ValueError, match="delete"):
        snapshot_export_delta(spark, tbl, dest, materialize=False)
    r = snapshot_export_delta(spark, tbl, dest)
    assert r["mode"] == "materialized"
    cols, rows = _read_delta_independently(dest)
    assert cols == ["id", "w"]  # the RENAMED logical name, resolved
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    assert len(rows) == 498  # deletes applied in the exported bytes


def test_export_materializes_post_widen_files(spark, tmp_path):
    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    df = spark.range(100).selectExpr("id", "cast(id AS int) AS n")
    S.snapshot_write(df, tbl, mode="overwrite", n_files=1,
                     stats_cols=["id"])
    S.snapshot_widen_column(tbl, "n", "long")
    # old int32 file under a declared long column: zero-copy would hand
    # a plain reader a type it never promised to upcast
    with pytest.raises(ValueError, match="widen"):
        snapshot_export_delta(spark, tbl, dest, materialize=False)
    r = snapshot_export_delta(spark, tbl, dest)
    assert r["mode"] == "materialized"
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    # the materialized file physically carries the widened type
    import pyarrow.parquet as pq

    (live,) = [
        os.path.join(dest, p)
        for p in sorted(
            json.loads(line)["add"]["path"]
            for lg in sorted(
                glob.glob(os.path.join(dest, "_delta_log", "*.json"))
            )
            for line in open(lg)
            if line.strip() and "\"add\"" in line
        )
    ]
    assert str(pq.ParquetFile(live).schema_arrow.field("n").type) == "int64"


def test_export_incremental_append_and_compact(spark, tmp_path):
    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(
        spark.range(300).selectExpr("id", "id % 5 AS v"), tbl,
        mode="overwrite", n_files=2, stats_cols=["id"],
    )
    snapshot_export_delta(spark, tbl, dest)
    S.snapshot_write(
        spark.range(300, 400).selectExpr("id", "id % 5 AS v"), tbl,
        mode="append", n_files=1, stats_cols=["id"],
    )
    r2 = snapshot_export_delta(spark, tbl, dest)
    # append mirrors incrementally: one new file, nothing removed,
    # unchanged files not re-linked or re-logged
    assert (r2["log_version"], r2["files_added"], r2["files_removed"]) == (
        1, 1, 0,
    )
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    S.snapshot_compact(spark, tbl, n_files=1)
    r3 = snapshot_export_delta(spark, tbl, dest)
    assert r3["files_removed"] == 3 and r3["files_added"] == 1
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    assert len(rows) == 400


def test_export_materializes_hidden_partitioned_tables(spark, tmp_path):
    """Hidden-partitioned files physically carry derived _pt_* columns
    the schemaString never declares — the export materializes instead
    of handing a spec-pedantic reader undeclared columns, and the
    materialized files carry EXACTLY the schema."""
    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    df = spark.range(400).selectExpr("id", "id % 4 AS b")
    S.snapshot_write(df, tbl, mode="overwrite", n_files=4,
                     partition_spec=[("bucket", "b", 4)])
    with pytest.raises(ValueError, match="hidden partition"):
        snapshot_export_delta(spark, tbl, dest, materialize=False)
    r = snapshot_export_delta(spark, tbl, dest)
    assert r["mode"] == "materialized"
    cols, rows = _read_delta_independently(dest)
    assert cols == ["id", "b"]
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    import pyarrow.parquet as pq

    for lg in sorted(glob.glob(os.path.join(dest, "_delta_log", "*.json"))):
        for line in open(lg):
            if line.strip() and "\"add\"" in line:
                p = os.path.join(dest, json.loads(line)["add"]["path"])
                assert pq.ParquetFile(p).schema_arrow.names == ["id", "b"]


def test_export_pinned_old_version(spark, tmp_path):
    """Exporting a PINNED historical version serves that version's
    content, not latest — Delta bytes as a time-travel artifact."""
    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(
        spark.range(50).selectExpr("id", "id AS v"), tbl,
        mode="overwrite", n_files=1, stats_cols=["id"],
    )
    S.snapshot_write(
        spark.range(50, 90).selectExpr("id", "id AS v"), tbl,
        mode="append", n_files=1,
    )
    r = snapshot_export_delta(spark, tbl, dest, version=1)
    assert r["source_version"] == 1
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols, version=1)
    assert len(rows) == 50
    with pytest.raises(ValueError, match="version 99"):
        snapshot_export_delta(spark, tbl, dest, version=99)


# ------------------------------------------------------------------ import

from e02_spark.ops.export import snapshot_import_delta  # noqa: E402


def _write_foreign_delta(spark, root, rows, version=0, removes=(),
                         schema_fields=None, extra_meta=None,
                         protocol=None):
    """Act as a FOREIGN Delta writer: plain parquet files + a hand-written
    spec log. Shares zero code with the exporter or importer."""
    os.makedirs(os.path.join(root, "_delta_log"), exist_ok=True)
    adds = []
    if rows is not None:
        part = f"part-{version:05d}-foreign.snappy.parquet"
        stage = os.path.join(root, f"_stage{version}")
        spark.createDataFrame(rows, "id long, name string").coalesce(
            1
        ).write.mode("overwrite").parquet(stage)
        (src,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        os.rename(src, os.path.join(root, part))
        import shutil

        shutil.rmtree(stage)
        adds.append(part)
    actions = []
    if version == 0:
        actions.append({"protocol": protocol or {
            "minReaderVersion": 1, "minWriterVersion": 2}})
        meta = {
            "id": "foreign-test-table",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema_fields or {
                "type": "struct",
                "fields": [
                    {"name": "id", "type": "long", "nullable": True,
                     "metadata": {}},
                    {"name": "name", "type": "string", "nullable": True,
                     "metadata": {}},
                ],
            }),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 0,
        }
        if extra_meta:
            meta.update(extra_meta)
        actions.append({"metaData": meta})
    for r in removes:
        actions.append({"remove": {
            "path": r, "deletionTimestamp": 0, "dataChange": True}})
    for a in adds:
        actions.append({"add": {
            "path": a, "partitionValues": {},
            "size": os.path.getsize(os.path.join(root, a)),
            "modificationTime": 0, "dataChange": True}})
    with open(os.path.join(
        root, "_delta_log", f"{version:020d}.json"
    ), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return adds


def test_import_foreign_delta_and_incremental_sync(spark, tmp_path):
    """A Delta table written BY THE TEST from the public spec imports
    zero-copy as a live snapshot table; a later foreign commit
    (add + remove) syncs incrementally; an unchanged log no-ops."""
    root = str(tmp_path / "foreign")
    (a0,) = _write_foreign_delta(
        spark, root, [(i, f"n{i}") for i in range(50)], version=0
    )
    tbl = str(tmp_path / "mirror")
    r = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert (r["mode"], r["files_adopted"], r["delta_version"]) == (
        "import", 1, 0,
    )
    got = {
        row["id"]: row["name"]
        for row in S.snapshot_read(spark, tbl).collect()
    }
    assert got == {i: f"n{i}" for i in range(50)}
    assert S.snapshot_rows(tbl) == 50
    # zero-copy: the mirror's file IS the foreign file
    m = S._read_manifest(tbl, 1)
    (e,) = S._all_entries(tbl, m)
    assert os.path.samefile(os.path.join(tbl, e["path"]),
                            os.path.join(root, a0))
    # stats harvested -> pruning works on the mirror
    kept, _ = S._plan_files(tbl, None, ("id", 1000, 2000))
    assert kept == []
    # foreign commit 1: replace the file with a 60-row version
    _write_foreign_delta(
        spark, root, [(i, f"m{i}") for i in range(60)], version=1,
        removes=[a0],
    )
    r2 = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert (r2["mode"], r2["files_adopted"], r2["files_removed"]) == (
        "import_sync", 1, 1,
    )
    got2 = {
        row["id"]: row["name"]
        for row in S.snapshot_read(spark, tbl).collect()
    }
    assert got2 == {i: f"m{i}" for i in range(60)}
    # the mirror is a REAL snapshot table: CDF between sync versions
    ch = S.snapshot_changes(spark, tbl, 1, 2)
    ins = sum(1 for c in ch.collect() if c["_change_type"] == "insert")
    assert ins == 60
    # unchanged log: no-op
    r3 = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert r3["mode"] == "noop" and S.snapshot_versions(tbl) == [1, 2]


def test_import_roundtrips_our_own_export(spark, tmp_path):
    """export -> import -> content identical to the source snapshot
    (the two directions are inverses on clean tables)."""
    src = str(tmp_path / "src")
    dest = str(tmp_path / "delta")
    back = str(tmp_path / "back")
    df = spark.range(400).selectExpr(
        "id", "concat('t', id % 11) AS tag", "cast(id AS double) / 3 AS x"
    )
    S.snapshot_write(df, src, mode="overwrite", n_files=3,
                     cluster_by=["id"], stats_cols=["id"])
    snapshot_export_delta(spark, src, dest)
    r = snapshot_import_delta(spark, dest, back, stats_cols=["id"])
    assert r["files_adopted"] == 3
    cols = ["id", "tag", "x"]
    assert _snapshot_rows_sorted(spark, back, cols) == \
        _snapshot_rows_sorted(spark, src, cols)
    # schema survived both directions verbatim
    assert S._read_manifest(back, 1)["schema"] == \
        S._read_manifest(src, 1)["schema"]


def test_import_refusals_are_named(spark, tmp_path):
    rows = [(1, "a")]
    # reader features beyond protocol 1
    r1 = str(tmp_path / "r1")
    _write_foreign_delta(spark, r1, rows, protocol={
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"]})
    with pytest.raises(ValueError, match="minReaderVersion"):
        snapshot_import_delta(spark, r1, str(tmp_path / "t1"))
    # hive partition columns
    r2 = str(tmp_path / "r2")
    _write_foreign_delta(spark, r2, rows,
                         extra_meta={"partitionColumns": ["name"]})
    with pytest.raises(ValueError, match="partition"):
        snapshot_import_delta(spark, r2, str(tmp_path / "t2"))
    # column mapping
    r3 = str(tmp_path / "r3")
    _write_foreign_delta(spark, r3, rows, extra_meta={
        "configuration": {"delta.columnMapping.mode": "name"}})
    with pytest.raises(ValueError, match="columnMapping"):
        snapshot_import_delta(spark, r3, str(tmp_path / "t3"))
    # a dest that is not an import mirror
    r4 = str(tmp_path / "r4")
    _write_foreign_delta(spark, r4, rows)
    native = str(tmp_path / "native")
    S.snapshot_write(
        spark.range(3).selectExpr("id", "'x' AS name"), native,
        mode="overwrite", n_files=1,
    )
    with pytest.raises(ValueError, match="mirror"):
        snapshot_import_delta(spark, r4, native)
    # live add carrying a deletion vector
    r5 = str(tmp_path / "r5")
    (a5,) = _write_foreign_delta(spark, r5, rows)
    lg = os.path.join(r5, "_delta_log", f"{0:020d}.json")
    lines = open(lg).read().strip().splitlines()
    patched = []
    for ln in lines:
        act = json.loads(ln)
        if "add" in act:
            act["add"]["deletionVector"] = {"storageType": "u"}
        patched.append(json.dumps(act))
    open(lg, "w").write("\n".join(patched) + "\n")
    with pytest.raises(ValueError, match="deletion"):
        snapshot_import_delta(spark, r5, str(tmp_path / "t5"))


def test_import_sync_preserves_local_mirror_mutations(spark, tmp_path):
    """The sync owns only the files it adopted: rows appended LOCALLY to
    the mirror survive a later incremental import (reconciliation never
    drops non-import files)."""
    root = str(tmp_path / "foreign")
    (a0,) = _write_foreign_delta(
        spark, root, [(i, f"n{i}") for i in range(20)], version=0
    )
    tbl = str(tmp_path / "mirror")
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    # local append on the mirror, outside the import namespace
    S.snapshot_write(
        spark.createDataFrame([(1000, "local")], "id long, name string"),
        tbl, mode="append", n_files=1,
    )
    # foreign replaces its file; the sync must keep the local row
    _write_foreign_delta(
        spark, root, [(i, f"m{i}") for i in range(20)], version=1,
        removes=[a0],
    )
    r = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert (r["files_adopted"], r["files_removed"]) == (1, 1)
    got = {
        row["id"]: row["name"]
        for row in S.snapshot_read(spark, tbl).collect()
    }
    assert got[1000] == "local" and got[5] == "m5" and len(got) == 21


def test_import_rejects_escaping_add_paths(spark, tmp_path):
    root = str(tmp_path / "foreign")
    _write_foreign_delta(spark, root, [(1, "a")])
    lg = os.path.join(root, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(lg).read().strip().splitlines()]
    for act in lines:
        if "add" in act:
            act["add"]["path"] = "../../etc/evil.parquet"
    open(lg, "w").write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(ValueError, match="escapes"):
        snapshot_import_delta(spark, root, str(tmp_path / "t"))


def test_export_refuses_foreign_destination(spark, tmp_path):
    """Exporting onto a directory holding a Delta log WE did not write
    (no sourceVersion marker) refuses instead of mixing two tables."""
    dest = str(tmp_path / "foreign")
    _write_foreign_delta(spark, dest, [(1, "a")])
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        spark.range(5).selectExpr("id", "'x' AS name"), tbl,
        mode="overwrite", n_files=1,
    )
    with pytest.raises(ValueError, match="did not\n?\\s*write"):
        snapshot_export_delta(spark, tbl, dest)
