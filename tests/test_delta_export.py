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
    via plain json + DuckDB only — including the spec's checkpoint
    bootstrap: when `_last_checkpoint` points at a classic checkpoint
    parquet, state starts from its rows (read with DuckDB struct
    projections, zero exporter code) and only NEWER json commits
    replay, exactly as PROTOCOL.md §Checkpoints describes."""
    log_dir = os.path.join(dest, "_delta_log")
    live: dict[str, dict] = {}
    schema = None
    protocol = None
    partition_cols: list[str] = []
    cp_v = None
    lc = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(lc):
        cp_v = json.loads(open(lc).read())["version"]
        cp = os.path.join(log_dir, f"{cp_v:020d}.checkpoint.parquet")
        con = duckdb.connect()
        (mrv, mwv) = con.execute(
            "SELECT protocol.minReaderVersion, protocol.minWriterVersion "
            "FROM read_parquet(?) WHERE protocol.minReaderVersion IS NOT "
            "NULL", [cp],
        ).fetchone()
        protocol = {"minReaderVersion": mrv, "minWriterVersion": mwv}
        try:
            (rf,) = con.execute(
                "SELECT protocol.readerFeatures FROM read_parquet(?) "
                "WHERE protocol.minReaderVersion IS NOT NULL", [cp],
            ).fetchone()
            if rf is not None:
                protocol["readerFeatures"] = list(rf)
        except duckdb.Error:
            pass  # pre-table-features checkpoint: no feature columns
        (ss, pcols) = con.execute(
            "SELECT metaData.schemaString, metaData.partitionColumns "
            "FROM read_parquet(?) "
            "WHERE metaData.id IS NOT NULL", [cp],
        ).fetchone()
        schema = json.loads(ss)
        partition_cols = list(pcols or [])
        try:
            cp_adds = con.execute(
                "SELECT add.path, add.stats, add.partitionValues, "
                "add.deletionVector FROM read_parquet(?) "
                "WHERE add.path IS NOT NULL", [cp],
            ).fetchall()
        except duckdb.Error:
            cp_adds = [
                (p, s, pv, None)
                for p, s, pv in con.execute(
                    "SELECT add.path, add.stats, add.partitionValues "
                    "FROM read_parquet(?) "
                    "WHERE add.path IS NOT NULL", [cp],
                ).fetchall()
            ]
        for path, stats, pv, dvd in cp_adds:
            if dvd is not None and all(
                v is None for v in dict(dvd).values()
            ):
                dvd = None
            live[path] = {"path": path, "stats": stats,
                          "partitionValues": dict(pv or {}),
                          "deletionVector": dict(dvd) if dvd else None}
    logs = sorted(glob.glob(os.path.join(log_dir, "*.json")))
    logs = [
        p for p in logs
        if cp_v is None or int(os.path.basename(p)[:-5]) > cp_v
    ]
    assert logs or live, f"no _delta_log under {dest}"
    for p in logs:
        with open(p) as fh:
            for line in fh:
                if not line.strip():
                    continue
                act = json.loads(line)
                if "metaData" in act:
                    schema = json.loads(act["metaData"]["schemaString"])
                    partition_cols = list(
                        act["metaData"].get("partitionColumns") or []
                    )
                elif "protocol" in act:
                    protocol = act["protocol"]
                elif "add" in act:
                    live[act["add"]["path"]] = act["add"]
                elif "remove" in act:
                    live.pop(act["remove"]["path"], None)
    if protocol.get("minReaderVersion") == 3:
        # feature-carrying exports: table-features protocol with only
        # the features this exporter writes (PROTOCOL.md §Table
        # Features) — DVs and/or wall-clock timestamps
        feats = set(protocol.get("readerFeatures") or [])
        assert feats and feats <= {
            "deletionVectors", "timestampNtz"}, protocol
    else:
        proto_min = {k: protocol.get(k) for k in (
            "minReaderVersion", "minWriterVersion")}
        assert proto_min == {"minReaderVersion": 1, "minWriterVersion": 2}
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
    con = duckdb.connect()
    has_dv = any(a.get("deletionVector") for a in live.values())
    if partition_cols or has_dv:
        # per-file legs: partition column values come from each add's
        # partitionValues (string-serialized, cast per the declared
        # type — data files do not carry the columns), and DV'd files
        # drop their tombstoned row positions (file_row_number is
        # DuckDB's row index within the file — the spec's DV index
        # space). DV decode via ops/delta_dv, which is pinned against
        # this test file's INDEPENDENT reference serializer.
        from e02_spark.ops.delta_dv import dv_positions

        duck_t = {"long": "BIGINT", "integer": "INTEGER",
                  "short": "SMALLINT", "byte": "TINYINT",
                  "double": "DOUBLE", "float": "FLOAT",
                  "string": "VARCHAR", "date": "DATE",
                  "boolean": "BOOLEAN"}
        types = {f["name"]: f["type"] for f in schema["fields"]}
        legs = []
        for rel in sorted(live):
            pv = live[rel].get("partitionValues") or {}
            sel_parts = []
            for c in cols:
                if c in partition_cols:
                    v = pv.get(c)
                    lit = "NULL" if v is None else (
                        "'" + str(v).replace("'", "''") + "'"
                    )
                    sel_parts.append(
                        f'CAST({lit} AS {duck_t[types[c]]}) AS "{c}"'
                    )
                else:
                    sel_parts.append(f'"{c}"')
            fpath = os.path.join(dest, rel).replace("'", "''")
            dvd = live[rel].get("deletionVector")
            if dvd:
                gone = dv_positions(dest, dict(dvd))
                in_list = ", ".join(map(str, gone)) or "-1"
                legs.append(
                    f"SELECT {', '.join(sel_parts)} FROM read_parquet("
                    f"'{fpath}', file_row_number=true) "
                    f"WHERE file_row_number NOT IN ({in_list})"
                )
            else:
                legs.append(
                    f"SELECT {', '.join(sel_parts)} "
                    f"FROM read_parquet('{fpath}')"
                )
        rows = con.execute(
            "SELECT * FROM (" + " UNION ALL ".join(legs)
            + ") ORDER BY ALL"
        ).fetchall()
        return cols, rows
    sel = ", ".join(f'"{c}"' for c in cols)
    rows = con.execute(
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
    # forced zero-copy names the rename blocker (positional deletes
    # export as Delta DVs since round 14 — disable them to see the
    # deletes blocker named too)
    with pytest.raises(ValueError, match="rename"):
        snapshot_export_delta(spark, tbl, dest, materialize=False)
    with pytest.raises(ValueError, match="delete"):
        snapshot_export_delta(spark, tbl, dest, materialize=False,
                              deletion_vectors=False)
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
    # reader features beyond the claimed subset (round 14 claims
    # deletionVectors + columnMapping; anything else still refuses)
    r1 = str(tmp_path / "r1")
    _write_foreign_delta(spark, r1, rows, protocol={
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors", "variantType"]})
    with pytest.raises(ValueError, match="variantType"):
        snapshot_import_delta(spark, r1, str(tmp_path / "t1"))
    # a reader protocol newer than any published one
    r1b = str(tmp_path / "r1b")
    _write_foreign_delta(spark, r1b, rows, protocol={
        "minReaderVersion": 4, "minWriterVersion": 9})
    with pytest.raises(ValueError, match="minReaderVersion"):
        snapshot_import_delta(spark, r1b, str(tmp_path / "t1b"))
    # hive partition column NOT declared in the schema (round 13 made
    # declared-primitive hive partitions importable; an undeclared one
    # still refuses by name)
    r2 = str(tmp_path / "r2")
    _write_foreign_delta(spark, r2, rows,
                         extra_meta={"partitionColumns": ["ghost"]})
    with pytest.raises(ValueError, match="partition column 'ghost'"):
        snapshot_import_delta(spark, r2, str(tmp_path / "t2"))
    # column mapping declared but the schema lacks physical names —
    # a malformed mapped table refuses rather than reading nulls
    r3 = str(tmp_path / "r3")
    _write_foreign_delta(spark, r3, rows, extra_meta={
        "configuration": {"delta.columnMapping.mode": "name"}})
    with pytest.raises(ValueError, match="physicalName"):
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
    # live add carrying a deletion vector with an UNKNOWN storage type
    # (the claimed subset is 'u'/'i'/'p')
    r5 = str(tmp_path / "r5")
    (a5,) = _write_foreign_delta(spark, r5, rows)
    lg = os.path.join(r5, "_delta_log", f"{0:020d}.json")
    lines = open(lg).read().strip().splitlines()
    patched = []
    for ln in lines:
        act = json.loads(ln)
        if "add" in act:
            act["add"]["deletionVector"] = {"storageType": "z"}
        patched.append(json.dumps(act))
    open(lg, "w").write("\n".join(patched) + "\n")
    with pytest.raises(ValueError, match="storageType"):
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


# --------------------------------------------------- round-13 surface


def test_incremental_export_reemits_metadata_on_schema_change(
    spark, tmp_path
):
    """ADVICE(high) r12: add-only evolution between exports must re-emit
    metaData (same table id) so spec readers see the new column instead
    of silently dropping it; a rename forces materialize AND refreshes
    the schemaString."""
    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(
        spark.range(40).selectExpr("id", "id % 3 AS v"), tbl,
        mode="overwrite", n_files=2, stats_cols=["id"],
    )
    snapshot_export_delta(spark, tbl, dest)
    # add-only evolution: new column arrives on an append
    S.snapshot_write(
        spark.range(40, 60).selectExpr(
            "id", "id % 3 AS v", "concat('w', id) AS w"
        ),
        tbl, mode="append", n_files=1,
    )
    r2 = snapshot_export_delta(spark, tbl, dest)
    assert r2["mode"] == "zero-copy"  # add-only stays zero-copy-legal
    cols, rows = _read_delta_independently(dest)
    assert cols == ["id", "v", "w"]  # the reader SEES the new column
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    assert sum(1 for r in rows if r[2] is not None) == 20
    # metaData was re-emitted with the ORIGINAL table id
    ids = []
    for lg in sorted(glob.glob(os.path.join(dest, "_delta_log", "*.json"))):
        for line in open(lg):
            if line.strip() and '"metaData"' in line:
                ids.append(json.loads(line)["metaData"]["id"])
    assert len(ids) == 2 and ids[0] == ids[1]
    # rename: forces materialize, schemaString refreshes again
    S.snapshot_rename_column(tbl, "v", "v2")
    r3 = snapshot_export_delta(spark, tbl, dest)
    assert r3["mode"] == "materialized"
    cols3, rows3 = _read_delta_independently(dest)
    assert cols3 == ["id", "v2", "w"]
    assert rows3 == _snapshot_rows_sorted(spark, tbl, cols3)


def test_export_refuses_rewind_by_name(spark, tmp_path):
    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(spark.range(10).selectExpr("id"), tbl,
                     mode="overwrite", n_files=1)
    S.snapshot_write(spark.range(10, 20).selectExpr("id"), tbl,
                     mode="append", n_files=1)
    snapshot_export_delta(spark, tbl, dest)  # exports v2
    with pytest.raises(ValueError, match="OLDER.*allow_rewind"):
        snapshot_export_delta(spark, tbl, dest, version=1)
    r = snapshot_export_delta(spark, tbl, dest, version=1,
                              allow_rewind=True)
    assert r["source_version"] == 1
    _, rows = _read_delta_independently(dest)
    assert len(rows) == 10  # deliberately rewound


def test_export_checkpoint_bootstrap_after_log_clean(spark, tmp_path):
    """Slate 2: a 30-export incremental mirror writes classic
    checkpoints every 10 commits; after export_clean_logs drops the
    json commits older than the newest checkpoint, the INDEPENDENT
    spec reader, _replay_log, a further incremental export, AND a
    fresh import all still reconstruct the table."""
    from e02_spark.ops.export import (
        _replay_log,
        export_clean_logs,
    )

    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(
        spark.createDataFrame([(0, "r0")], "id long, name string"), tbl,
        mode="overwrite", n_files=1, stats_cols=["id"],
    )
    r = snapshot_export_delta(spark, tbl, dest)
    cp_flags = [r["checkpointed"]]
    for i in range(1, 30):
        S.snapshot_write(
            spark.createDataFrame([(i, f"r{i}")], "id long, name string"),
            tbl, mode="append", n_files=1,
        )
        cp_flags.append(
            snapshot_export_delta(spark, tbl, dest)["checkpointed"]
        )
    assert [i for i, f in enumerate(cp_flags) if f] == [10, 20]
    assert os.path.exists(os.path.join(
        dest, "_delta_log", f"{20:020d}.checkpoint.parquet"))
    cleaned = export_clean_logs(dest)
    assert cleaned == {"removed": 20, "checkpoint_v": 20}
    remaining = sorted(glob.glob(os.path.join(dest, "_delta_log", "*.json")))
    assert int(os.path.basename(remaining[0])[:-5]) == 20
    # the independent reader bootstraps from the checkpoint alone
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    assert len(rows) == 30
    # our own replay agrees and knows the source marker
    s = _replay_log(dest)
    assert s["checkpoint_v"] == 20 and s["last_v"] == 29
    assert s["src_version"] == 30
    # further incremental export over the cleaned log still works
    S.snapshot_write(
        spark.createDataFrame([(99, "r99")], "id long, name string"),
        tbl, mode="append", n_files=1,
    )
    r31 = snapshot_export_delta(spark, tbl, dest)
    assert r31["log_version"] == 30 and r31["files_added"] == 1
    cols, rows = _read_delta_independently(dest)
    assert len(rows) == 31
    # import bootstraps from the checkpoint too
    back = str(tmp_path / "back")
    ri = snapshot_import_delta(spark, dest, back, stats_cols=["id"])
    assert ri["files_adopted"] == 31
    assert _snapshot_rows_sorted(spark, back, cols) == rows


def test_replay_refuses_log_gap_by_name(spark, tmp_path):
    from e02_spark.ops.export import _replay_log

    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(spark.range(5).selectExpr("id"), tbl,
                     mode="overwrite", n_files=1)
    snapshot_export_delta(spark, tbl, dest)
    for i in range(2):
        S.snapshot_write(spark.range(5).selectExpr("id + 10 AS id"), tbl,
                         mode="append", n_files=1)
        snapshot_export_delta(spark, tbl, dest)
    # middle commit vanishes (a cleaner ran without a checkpoint)
    os.remove(os.path.join(dest, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(ValueError, match="GAP"):
        _replay_log(dest)
    with pytest.raises(ValueError, match="GAP"):
        snapshot_import_delta(spark, dest, str(tmp_path / "t"))
    # a log that does not start at 0 refuses too
    os.remove(os.path.join(dest, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(ValueError, match="GAP"):
        _replay_log(dest)


def test_materialized_export_carries_minmax_stats(spark, tmp_path):
    """Slate 6: the materialize path harvests footer min/max into the
    per-file `stats` JSON so Delta readers data-skip on it."""
    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(
        spark.range(500).selectExpr("id", "concat('n', id % 7) AS tag"),
        tbl, mode="overwrite", n_files=2, stats_cols=["id"],
    )
    r = snapshot_export_delta(spark, tbl, dest, materialize=True,
                              n_files=3)
    assert r["mode"] == "materialized"
    adds = []
    for lg in sorted(glob.glob(os.path.join(dest, "_delta_log", "*.json"))):
        for line in open(lg):
            if line.strip() and '"add"' in line:
                adds.append(json.loads(line)["add"])
    assert len(adds) == 3
    lo, hi, total = 10**9, -1, 0
    for a in adds:
        st = json.loads(a["stats"])
        total += st["numRecords"]
        assert st["minValues"]["id"] <= st["maxValues"]["id"]
        assert st["minValues"]["tag"] <= st["maxValues"]["tag"]
        # per-file bounds agree with the file's actual content
        got = duckdb.connect().execute(
            "SELECT min(id), max(id) FROM read_parquet(?)",
            [os.path.join(dest, a["path"])],
        ).fetchone()
        assert (st["minValues"]["id"], st["maxValues"]["id"]) == got
        lo, hi = min(lo, st["minValues"]["id"]), max(hi, st["maxValues"]["id"])
    assert (lo, hi, total) == (0, 499, 500)


def test_export_vacuum_collects_superseded_bytes(spark, tmp_path):
    """Slate 7: tombstoned data files absent from the retained log
    versions are physically deleted; live reads unchanged."""
    from e02_spark.ops.export import export_vacuum

    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(
        spark.range(200).selectExpr("id", "id % 5 AS v"), tbl,
        mode="overwrite", n_files=2, stats_cols=["id"],
    )
    snapshot_export_delta(spark, tbl, dest)
    first_files = {
        json.loads(line)["add"]["path"]
        for line in open(os.path.join(dest, "_delta_log", f"{0:020d}.json"))
        if line.strip() and '"add"' in line
    }
    S.snapshot_compact(spark, tbl, n_files=1)
    snapshot_export_delta(spark, tbl, dest)  # removes 2, adds 1
    # retain both versions: nothing collectable
    r_keep = export_vacuum(dest, retain_versions=2)
    assert r_keep["files_deleted"] == 0
    assert all(os.path.exists(os.path.join(dest, p)) for p in first_files)
    # retain only the tip: the superseded files' bytes are collected
    r = export_vacuum(dest, retain_versions=1)
    assert r["files_deleted"] == 2
    assert not any(os.path.exists(os.path.join(dest, p)) for p in first_files)
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    assert len(rows) == 200
    # idempotent
    assert export_vacuum(dest, retain_versions=1)["files_deleted"] == 0


def _write_foreign_hive_delta(spark, root, version, parts, removes=()):
    """Foreign HIVE-partitioned Delta writer: files carry (id, name)
    ONLY; the `region` partition column exists solely in the declared
    schema + each add's partitionValues (the standard hive layout)."""
    os.makedirs(os.path.join(root, "_delta_log"), exist_ok=True)
    actions = []
    if version == 0:
        actions.append({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append({"metaData": {
            "id": "foreign-hive-table",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({
                "type": "struct",
                "fields": [
                    {"name": "id", "type": "long", "nullable": True,
                     "metadata": {}},
                    {"name": "name", "type": "string", "nullable": True,
                     "metadata": {}},
                    {"name": "region", "type": "string", "nullable": True,
                     "metadata": {}},
                ],
            }),
            "partitionColumns": ["region"],
            "configuration": {},
            "createdTime": 0,
        }})
    for r in removes:
        actions.append({"remove": {
            "path": r, "deletionTimestamp": 0, "dataChange": True}})
    added = []
    for i, (rows, region) in enumerate(parts):
        rel = f"region={region}/part-{version:03d}-{i}.parquet"
        stage = os.path.join(root, f"_stage{version}_{i}")
        spark.createDataFrame(rows, "id long, name string").coalesce(
            1
        ).write.mode("overwrite").parquet(stage)
        (src,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        os.makedirs(os.path.dirname(os.path.join(root, rel)), exist_ok=True)
        os.rename(src, os.path.join(root, rel))
        import shutil

        shutil.rmtree(stage)
        actions.append({"add": {
            "path": rel, "partitionValues": {"region": region},
            "size": os.path.getsize(os.path.join(root, rel)),
            "modificationTime": 0, "dataChange": True}})
        added.append(rel)
    with open(os.path.join(
        root, "_delta_log", f"{version:020d}.json"
    ), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return added


def test_import_hive_partitioned_foreign_delta(spark, tmp_path):
    """Slate 3: hive-partitioned foreign Delta imports zero-copy; reads
    reconstruct the partition column the files don't carry; partition
    probes prune through the ordinary stats machinery; incremental sync
    works; local mirror appends keep their own physical values."""
    root = str(tmp_path / "foreign")
    _write_foreign_hive_delta(spark, root, 0, [
        ([(i, f"e{i}") for i in range(10)], "east"),
        ([(i, f"w{i}") for i in range(10, 20)], "west"),
    ])
    tbl = str(tmp_path / "mirror")
    r = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert (r["mode"], r["files_adopted"]) == ("import", 2)
    # injected partition values
    got = {
        (row["id"], row["region"])
        for row in S.snapshot_read(spark, tbl).collect()
    }
    assert got == {(i, "east") for i in range(10)} | {
        (i, "west") for i in range(10, 20)
    }
    # partition probe PRUNES to a strict file subset...
    kept, _ = S._plan_files(tbl, None, ("region", "east", "east"))
    assert len(kept) == 1
    # ...and the pruned read still reconstructs every matching row
    pruned = S.snapshot_read(
        spark, tbl, prune=("region", "east", "east")
    ).where("region = 'east'")
    assert pruned.count() == 10
    assert len(pruned.inputFiles()) == 1
    # a LOCAL append carrying the column physically keeps its own value
    S.snapshot_write(
        spark.createDataFrame(
            [(100, "local", "north")], "id long, name string, region string"
        ),
        tbl, mode="append", n_files=1,
    )
    got2 = {
        row["id"]: row["region"]
        for row in S.snapshot_read(spark, tbl).collect()
    }
    assert got2[100] == "north" and got2[5] == "east" and len(got2) == 21
    # incremental sync: foreign v1 adds an east file
    _write_foreign_hive_delta(spark, root, 1, [
        ([(i, f"e{i}") for i in range(20, 25)], "east"),
    ])
    r2 = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert (r2["mode"], r2["files_adopted"], r2["files_removed"]) == (
        "import_sync", 1, 0,
    )
    got3 = {
        row["id"]: row["region"]
        for row in S.snapshot_read(spark, tbl).collect()
    }
    assert got3[22] == "east" and got3[100] == "north" and len(got3) == 26
    # the CDF path injects too: the sync's insert rows carry the
    # partition values the files don't physically hold
    ch = S.snapshot_changes(spark, tbl, 2, 3).collect()
    assert {(r_["_change_type"], r_["id"], r_["region"]) for r_ in ch} == {
        ("insert", i, "east") for i in range(20, 25)
    }
    # re-exporting a hive mirror materializes (values injected at read)
    dest2 = str(tmp_path / "reexport")
    with pytest.raises(ValueError, match="hive partition"):
        snapshot_export_delta(spark, tbl, dest2, materialize=False)
    rr = snapshot_export_delta(spark, tbl, dest2)
    assert rr["mode"] == "materialized"
    cols, rows = _read_delta_independently(dest2)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)


def test_export_import_on_object_store(spark, tmp_path):
    """Slate 4: the whole interop loop — export, incremental export,
    checkpointing, import — runs against the object-store-expressible
    primitive set (FakeObjectStore), with the log commit going through
    the conditional PUT."""
    from e02_spark.ops.store import (
        FakeObjectStore,
        register_store,
        unregister_store,
    )

    prefix = str(tmp_path)
    fake = FakeObjectStore()
    register_store(prefix, fake)
    try:
        tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
        S.snapshot_write(
            spark.range(100).selectExpr("id", "id % 4 AS v"), tbl,
            mode="overwrite", n_files=2, stats_cols=["id"],
        )
        r = snapshot_export_delta(spark, tbl, dest,
                                  checkpoint_interval=1)
        assert r["mode"] == "zero-copy"
        S.snapshot_write(
            spark.range(100, 130).selectExpr("id", "id % 4 AS v"), tbl,
            mode="append", n_files=1,
        )
        r2 = snapshot_export_delta(spark, tbl, dest,
                                   checkpoint_interval=1)
        assert r2["checkpointed"] is True
        cols, rows = _read_delta_independently(dest)
        assert rows == _snapshot_rows_sorted(spark, tbl, cols)
        back = str(tmp_path / "back")
        ri = snapshot_import_delta(spark, dest, back, stats_cols=["id"])
        assert ri["files_adopted"] == 3
        assert _snapshot_rows_sorted(spark, back, cols) == rows
        # the log commit went through the conditional PUT, adoption
        # through server-side COPY — never a POSIX-only primitive
        assert fake.counts["conditional_put"] > 0
        assert fake.counts["copy"] > 0
    finally:
        unregister_store(prefix)


def test_bulk_import_fans_out_across_shards(spark, tmp_path, monkeypatch):
    """Slate 5: a giant single-commit adoption (the snapshot_import_delta
    of a big foreign table) fans its entries across bounded manifest
    shards (_SHARD_MAX_ENTRIES via _write_shards) instead of one
    mega-shard — with per-shard aggregate bounds so shard-level pruning
    still skips whole shards."""
    monkeypatch.setattr(S, "_SHARD_MAX_ENTRIES", 2)
    root = str(tmp_path / "foreign")
    # 6 foreign files with disjoint id ranges (one per version batch,
    # all landing in ONE import commit)
    for v in range(6):
        _write_foreign_delta(
            spark, root,
            [(v * 100 + i, f"n{v}-{i}") for i in range(10)], version=v,
        )
    tbl = str(tmp_path / "mirror")
    r = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert r["files_adopted"] == 6
    m = S._read_manifest(tbl, 1)
    refs = m["manifests"]
    assert len(refs) == 3 and all(ref["n_files"] == 2 for ref in refs)
    assert all(ref["stats"].get("id") for ref in refs)
    # shard-level pruning: a point probe opens exactly one shard
    opened: list = []
    kept, _ = S._plan_files(tbl, None, ("id", 505, 505), opened)
    assert len(opened) == 1 and len(kept) == 1
    assert (
        S.snapshot_read(spark, tbl, prune=("id", 505, 505))
        .where("id = 505").count() == 1
    )


def test_incremental_export_mirror_tracks_mutating_table(spark, tmp_path):
    """Lifecycle pin for the round-13 surface in ONE flow: a mutating
    snapshot table (appends, CoW+MoR merges, add-column evolution,
    rename, compaction) is mirrored by incremental exports with
    checkpoint_interval=2; after EVERY export the independent spec
    reader must reconstruct the table exactly — across the zero-copy ->
    materialized flips the mutations force and the metaData re-emissions
    the schema changes force — and log cleaning + vacuum at the end
    change nothing the reader sees."""
    from e02_spark.ops.export import export_clean_logs, export_vacuum

    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    model = {k: k % 7 for k in range(0, 60, 2)}
    mk = lambda rows, cols="id long, amt long": spark.createDataFrame(  # noqa: E731
        rows, cols
    )
    S.snapshot_write(
        mk(sorted(model.items())), tbl, mode="overwrite", n_files=2,
        cluster_by=["id"], stats_cols=["id"],
    )

    def sync_and_verify():
        snapshot_export_delta(spark, tbl, dest, checkpoint_interval=2)
        cols, rows = _read_delta_independently(dest)
        assert rows == _snapshot_rows_sorted(spark, tbl, cols)
        idx = {c: i for i, c in enumerate(cols)}
        got = {r[idx["id"]]: r[idx["amt"]] for r in rows}
        assert got == model, f"mirror drift: {got} != {model}"

    sync_and_verify()
    # append fresh keys
    fresh = {k: k % 5 for k in range(100, 120, 2)}
    S.snapshot_write(mk(sorted(fresh.items())), tbl, mode="append",
                     n_files=1)
    model.update(fresh)
    sync_and_verify()
    # CoW upsert + MoR delete (outstanding DVs force materialize)
    upd = {2: 99, 100: 42, 777: 1}
    S.snapshot_merge(spark, tbl, mk(sorted(upd.items())), on=["id"],
                     when_matched="update", insert_not_matched=True)
    model.update(upd)
    S.snapshot_merge(spark, tbl, mk([(4,), (102,)], "id long"), on=["id"],
                     when_matched="delete", insert_not_matched=False,
                     strategy="mor")
    model.pop(4), model.pop(102)
    sync_and_verify()
    # fold the DVs, evolve the schema add-only, rename a column — the
    # export must re-emit metaData (same table id) each time it changes
    S.snapshot_rewrite_deletes(spark, tbl)
    S.snapshot_write(
        mk([(200, 3, "x")], "id long, amt long, note string"), tbl,
        mode="append", n_files=1,
    )
    model[200] = 3
    sync_and_verify()
    S.snapshot_rename_column(tbl, "note", "remark")
    S.snapshot_compact(spark, tbl, n_files=2)
    sync_and_verify()
    ids = set()
    for lg in sorted(glob.glob(os.path.join(dest, "_delta_log", "*.json"))):
        for line in open(lg):
            if line.strip() and '"metaData"' in line:
                ids.add(json.loads(line)["metaData"]["id"])
    # metaData re-emitted at least twice (evolve + rename), ONE table id
    assert len(ids) == 1
    # clean + vacuum: the reader's view is unchanged
    export_clean_logs(dest)
    export_vacuum(dest, retain_versions=1)
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    idx = {c: i for i, c in enumerate(cols)}
    assert {r[idx["id"]]: r[idx["amt"]] for r in rows} == model


def test_hive_injection_group_union_past_literal_cap(
    spark, tmp_path, monkeypatch
):
    """Past _HIVE_INJECT_MAX, a plain read of a hive mirror switches to
    the GROUP-UNION scan (one leg per partition tuple, plan size
    O(#partitions)) with identical content — and (round-14, lifting the
    round-13 cap) scans that need per-file metadata (MoR deletes,
    merge planning, CDF) take the same shape with (_file, _pos)
    attached per leg. Only the column-mapping composition still
    refuses by name."""
    monkeypatch.setattr(S, "_HIVE_INJECT_MAX", 1)
    root = str(tmp_path / "foreign")
    _write_foreign_hive_delta(spark, root, 0, [
        ([(i, f"e{i}") for i in range(8)], "east"),
        ([(i, f"w{i}") for i in range(8, 16)], "west"),
        ([(i, f"e{i}") for i in range(16, 20)], "east"),
    ])
    tbl = str(tmp_path / "mirror")
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    # local append carries the column physically -> its own plain leg
    S.snapshot_write(
        spark.createDataFrame(
            [(100, "local", "north")], "id long, name string, region string"
        ),
        tbl, mode="append", n_files=1,
    )
    got = {
        row["id"]: row["region"]
        for row in S.snapshot_read(spark, tbl).collect()
    }
    expect = {i: "east" for i in range(8)}
    expect |= {i: "west" for i in range(8, 16)}
    expect |= {i: "east" for i in range(16, 20)}
    expect[100] = "north"
    assert got == expect
    # a MoR delete makes the read need per-file metadata: past the cap
    # the scan now runs as the lineage'd group-union (round-13 item 3)
    v_before = S.snapshot_versions(tbl)[-1]
    S.snapshot_merge(
        spark, tbl, spark.createDataFrame([(3,)], "id long"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )
    expect.pop(3)
    got2 = {
        row["id"]: row["region"]
        for row in S.snapshot_read(spark, tbl).collect()
    }
    assert got2 == expect
    # CDF past the cap: the tombstone delta materializes as a delete
    ch = S.snapshot_changes(
        spark, tbl, from_version=v_before,
        to_version=S.snapshot_versions(tbl)[-1],
    )
    assert [(r["id"], r["_change_type"]) for r in ch.collect()] == [
        (3, "delete")]
    # an UPSERT merge past the cap (semi-join touched-file discovery
    # needs _metadata too)
    S.snapshot_merge(
        spark, tbl,
        spark.createDataFrame([(5, "upd", "east")],
                              "id long, name string, region string"),
        on=["id"],
    )
    got3 = {
        row["id"]: row["name"]
        for row in S.snapshot_read(spark, tbl).collect()
    }
    assert got3[5] == "upd" and 3 not in got3
    # the one remaining composition boundary: column mapping + over-cap
    # hive injection still refuses BY NAME
    S.snapshot_rewrite_deletes(spark, tbl)
    S.snapshot_rename_column(tbl, "name", "label")
    with pytest.raises(ValueError, match="column mapping"):
        S.snapshot_read(spark, tbl).collect()


def test_import_bootstraps_from_foreign_checkpoint(spark, tmp_path):
    """A FOREIGN-written classic checkpoint (extra columns like
    commitInfo/tags/stats_parsed that delta-spark adds, different field
    order) bootstraps the import after its pre-checkpoint JSON was
    cleaned — the reader keys on field NAMES, tolerates extras, and
    refuses nothing it can soundly read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "foreign")
    # versions 0 and 1 exist as data; the foreign writer checkpoints at
    # v1 and cleans v0's JSON (standard delta log retention)
    (a0,) = _write_foreign_delta(
        spark, root, [(i, f"n{i}") for i in range(10)], version=0
    )
    (a1,) = _write_foreign_delta(
        spark, root, [(i, f"n{i}") for i in range(10, 25)], version=1
    )
    schema_str = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "name", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    map_t = pa.map_(pa.string(), pa.string())
    # field order deliberately different from our writer's; extra
    # `tags` field on add, extra commitInfo column on the row
    add_t = pa.struct([
        ("size", pa.int64()), ("path", pa.string()),
        ("modificationTime", pa.int64()), ("dataChange", pa.bool_()),
        ("partitionValues", map_t), ("stats", pa.string()),
        ("tags", map_t),
    ])
    meta_t = pa.struct([
        ("schemaString", pa.string()), ("id", pa.string()),
        ("format", pa.struct([("provider", pa.string()),
                              ("options", map_t)])),
        ("partitionColumns", pa.list_(pa.string())),
        ("configuration", map_t), ("createdTime", pa.int64()),
    ])
    proto_t = pa.struct([
        ("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32()),
    ])
    ci_t = pa.struct([("operation", pa.string())])
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "schemaString": schema_str, "id": "foreign-test-table",
            "format": {"provider": "parquet", "options": []},
            "partitionColumns": [], "configuration": [],
            "createdTime": 0,
        }},
        {"add": {
            "size": os.path.getsize(os.path.join(root, a0)), "path": a0,
            "modificationTime": 0, "dataChange": True,
            "partitionValues": [], "stats": None, "tags": [],
        }},
        {"add": {
            "size": os.path.getsize(os.path.join(root, a1)), "path": a1,
            "modificationTime": 0, "dataChange": True,
            "partitionValues": [], "stats": None, "tags": [],
        }},
        {"commitInfo": {"operation": "CHECKPOINT"}},
    ]
    cols = {"add": add_t, "metaData": meta_t, "protocol": proto_t,
            "commitInfo": ci_t}
    table = pa.table({
        c: pa.array([r.get(c) for r in rows], type=t)
        for c, t in cols.items()
    })
    pq.write_table(
        table, os.path.join(root, "_delta_log",
                            f"{1:020d}.checkpoint.parquet")
    )
    with open(os.path.join(root, "_delta_log", "_last_checkpoint"),
              "w") as fh:
        fh.write(json.dumps({"version": 1, "size": len(rows)}))
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    tbl = str(tmp_path / "mirror")
    r = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert r["files_adopted"] == 2 and r["delta_version"] == 1
    got = {
        row["id"]: row["name"]
        for row in S.snapshot_read(spark, tbl).collect()
    }
    assert got == {i: f"n{i}" for i in range(25)}


def test_concurrent_exporters_race_on_log_version(spark, tmp_path):
    """Two exporters racing one incremental export: exactly one commits
    log version 1; the loser either planned the same version and gets
    the named conditional-PUT race error, or replayed after the winner
    landed and returns the no-op (both legitimate interleavings — the
    log must never tear either way). This test also pinned a real bug:
    concurrent adopt_file of the same immutable file used to crash the
    loser with shutil's SameFileError via the EXDEV fallback."""
    import threading

    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(spark.range(50).selectExpr("id"), tbl,
                     mode="overwrite", n_files=1, stats_cols=["id"])
    snapshot_export_delta(spark, tbl, dest)
    S.snapshot_write(spark.range(50, 80).selectExpr("id"), tbl,
                     mode="append", n_files=1)
    barrier = threading.Barrier(2)
    results: list = [None, None]

    def go(i):
        barrier.wait()
        try:
            results[i] = snapshot_export_delta(spark, tbl, dest)
        except Exception as e:  # noqa: BLE001 — assert the TYPE below
            results[i] = e

    ts = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    committed = [
        r for r in results
        if isinstance(r, dict) and r["mode"] != "noop"
    ]
    noops = [
        r for r in results if isinstance(r, dict) and r["mode"] == "noop"
    ]
    errs = [r for r in results if isinstance(r, Exception)]
    assert len(committed) == 1, results
    assert committed[0]["log_version"] == 1
    for e in errs:  # only the NAMED race error is an acceptable loss
        assert isinstance(e, RuntimeError) and "race" in str(e), results
    assert len(noops) + len(errs) == 1, results
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    assert len(rows) == 80


def test_vacuum_and_clean_refuse_foreign_logs(spark, tmp_path):
    """round-13 ADVICE medium: export_vacuum / export_clean_logs are
    MIRROR-ONLY — a Delta log without this exporter's sourceVersion
    marker (e.g. a real foreign table, or a shallow-clone source whose
    adds the clone still shares) must refuse BY NAME, never delete."""
    from e02_spark.ops.export import export_clean_logs, export_vacuum

    root = str(tmp_path / "foreign")
    adds = _write_foreign_delta(spark, root, [(1, "a"), (2, "b")])
    with pytest.raises(ValueError, match="foreign"):
        export_vacuum(root, retain_versions=1)
    with pytest.raises(ValueError, match="foreign"):
        export_clean_logs(root)
    # nothing was touched
    assert all(os.path.exists(os.path.join(root, a)) for a in adds)
    assert os.path.exists(
        os.path.join(root, "_delta_log", f"{0:020d}.json")
    )


def test_vacuum_refuses_escaping_candidate_paths(spark, tmp_path):
    """round-13 ADVICE medium: the Delta spec allows absolute add.path
    URIs; a tombstoned absolute (or ..-escaping) path must never be
    deleted — os.path.join(dest, '/abs') would reach OUTSIDE the
    mirror. Even on a log carrying OUR marker, vacuum validates every
    candidate before deleting."""
    from e02_spark.ops.export import export_vacuum

    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    victim = tmp_path / "victim.parquet"
    victim.write_bytes(b"precious bytes outside the mirror")
    S.snapshot_write(spark.range(10).selectExpr("id"), tbl,
                     mode="overwrite", n_files=1)
    snapshot_export_delta(spark, tbl, dest)
    # hand-append two commits: one ADDing an absolute path (spec-legal
    # for a writer we are not), the next REMOVEing it -> it becomes a
    # vacuum candidate outside the retained window
    log = os.path.join(dest, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operationParameters": {
            "sourceVersion": 2}}}) + "\n")
        fh.write(json.dumps({"add": {
            "path": str(victim), "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True}}) + "\n")
    with open(os.path.join(log, f"{2:020d}.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operationParameters": {
            "sourceVersion": 3}}}) + "\n")
        fh.write(json.dumps({"remove": {
            "path": str(victim), "deletionTimestamp": 0,
            "dataChange": True}}) + "\n")
    with pytest.raises(ValueError, match="OUTSIDE the"):
        export_vacuum(dest, retain_versions=1)
    assert victim.exists()


def test_checkpoint_tombstones_make_clean_then_vacuum_safe(
    spark, tmp_path
):
    """round-13 ADVICE low: checkpoints carry NOT-YET-VACUUMED remove
    tombstones (spec-conformant), so export_clean_logs no longer
    destroys vacuum's record — clean FIRST, vacuum SECOND still
    collects every superseded byte."""
    from e02_spark.ops.export import export_clean_logs, export_vacuum

    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(spark.range(50).selectExpr("id", "id % 3 AS v"),
                     tbl, mode="overwrite", n_files=2, stats_cols=["id"])
    snapshot_export_delta(spark, tbl, dest, checkpoint_interval=2)
    superseded = set()
    for i in range(4):
        m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
        superseded.update(e["path"] for e in S._all_entries(tbl, m))
        S.snapshot_write(
            spark.range(50 * (i + 2), 50 * (i + 3)).selectExpr(
                "id", "id % 3 AS v"),
            tbl, mode="append", n_files=1, stats_cols=["id"],
        )
        S.snapshot_compact(spark, tbl, n_files=2)
        snapshot_export_delta(spark, tbl, dest, checkpoint_interval=2)
    live_now = set(_replay_tip_live(dest))
    superseded -= live_now
    assert superseded, "test needs some tombstoned files"
    assert all(os.path.exists(os.path.join(dest, p)) for p in superseded)
    # clean FIRST (the previously-leaky order)
    cleaned = export_clean_logs(dest)
    assert cleaned["removed"] > 0
    # vacuum still finds the tombstoned bytes via the checkpoint rows
    r = export_vacuum(dest, retain_versions=1)
    assert not any(
        os.path.exists(os.path.join(dest, p)) for p in superseded
    ), "clean-before-vacuum leaked tombstoned bytes"
    assert r["files_deleted"] >= len(superseded)
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)


def _replay_tip_live(dest):
    from e02_spark.ops.export import _replay_log

    return sorted(_replay_log(dest)["live"])


def test_clean_refuses_when_checkpoint_lacks_tombstones(
    spark, tmp_path, monkeypatch
):
    """A checkpoint WITHOUT tombstone rows (the pre-round-14 format) +
    unvacuumed on-disk files referenced only by pre-checkpoint commits:
    export_clean_logs must REFUSE (naming export_vacuum) instead of
    silently leaking those bytes forever."""
    from e02_spark.ops import export as E

    orig = E._write_checkpoint

    def no_tomb(dest, log_v, protocol, metadata, live, src_version, st,
                tombstones=None):
        return orig(dest, log_v, protocol, metadata, live, src_version,
                    st, tombstones=None)

    monkeypatch.setattr(E, "_write_checkpoint", no_tomb)
    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(spark.range(40).selectExpr("id"), tbl,
                     mode="overwrite", n_files=2, stats_cols=["id"])
    E.snapshot_export_delta(spark, tbl, dest, checkpoint_interval=2)
    for i in range(2):
        S.snapshot_compact(spark, tbl, n_files=2 + i)
        E.snapshot_export_delta(spark, tbl, dest, checkpoint_interval=2)
    with pytest.raises(ValueError, match="export_vacuum"):
        E.export_clean_logs(dest)
    # vacuum-then-clean (the documented order) proceeds
    E.export_vacuum(dest, retain_versions=1)
    assert E.export_clean_logs(dest)["removed"] > 0
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)


def test_import_sync_recognizes_legacy_adoption_names(spark, tmp_path):
    """round-13 ADVICE low: a mirror created under the pre-flattening
    adoption scheme (nested data/delta-import/<foreign rel> paths) must
    NOT re-copy its entire live set on the next sync — existing
    nested-name entries are recognized as already adopted; only
    genuinely new foreign files adopt (under the flat scheme)."""
    from e02_spark.ops.export import snapshot_import_delta

    root = str(tmp_path / "foreign")
    tbl = str(tmp_path / "mirror")
    _write_foreign_delta(spark, root, [(1, "a"), (2, "b")])
    r0 = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert r0["files_adopted"] == 1

    # rewrite the mirror's import entries to the LEGACY nested scheme
    sub = os.path.join("data", "delta-import")
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    entries = S._all_entries(tbl, m)
    from e02_spark.ops.export import _replay_log

    foreign_rel = sorted(_replay_log(root)["live"])
    assert len(foreign_rel) == 1 and len(entries) == 1
    legacy_rel = os.path.join(sub, foreign_rel[0])
    old_abs = os.path.join(tbl, entries[0]["path"])
    new_abs = os.path.join(tbl, legacy_rel)
    os.makedirs(os.path.dirname(new_abs), exist_ok=True)
    os.rename(old_abs, new_abs)
    entries[0]["path"] = legacy_rel
    refs = S._write_shards(tbl, entries)
    m2 = dict(m)
    m2["version"] = S.snapshot_versions(tbl)[-1] + 1
    m2["manifests"] = refs
    assert S._try_commit(tbl, m2["version"], m2)

    # a new foreign commit arrives; the sync must adopt ONLY that file
    _write_foreign_delta(spark, root, [(3, "c")], version=1)
    ino_before = os.stat(new_abs).st_ino
    r1 = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert r1["mode"] == "import_sync"
    assert r1["files_adopted"] == 1, (
        "legacy-named entry was re-adopted (full re-copy regression)"
    )
    assert r1["files_removed"] == 0
    assert os.stat(new_abs).st_ino == ino_before  # untouched
    got = sorted(
        (r["id"], r["name"])
        for r in S.snapshot_read(spark, tbl).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def _foreign_checkpoint_rows(root, adds, schema_str):
    """Spec-shaped checkpoint action rows for `adds`, as plain dicts."""
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "schemaString": schema_str, "id": "foreign-test-table",
            "format": {"provider": "parquet", "options": []},
            "partitionColumns": [], "configuration": [],
            "createdTime": 0,
        }},
    ]
    for a in adds:
        rows.append({"add": {
            "path": a, "partitionValues": [],
            "size": os.path.getsize(os.path.join(root, a)),
            "modificationTime": 0, "dataChange": True, "stats": None,
        }})
    return rows


def _write_checkpoint_rows(root, path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    map_t = pa.map_(pa.string(), pa.string())
    types = {
        "add": pa.struct([
            ("path", pa.string()), ("partitionValues", map_t),
            ("size", pa.int64()), ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()), ("stats", pa.string()),
        ]),
        "metaData": pa.struct([
            ("schemaString", pa.string()), ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string()),
                                  ("options", map_t)])),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", map_t), ("createdTime", pa.int64()),
        ]),
        "protocol": pa.struct([
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
        ]),
    }
    table = pa.table({
        c: pa.array([r.get(c) for r in rows], type=t)
        for c, t in types.items()
    })
    pq.write_table(table, os.path.join(root, "_delta_log", path))


def test_import_reads_multipart_classic_checkpoint(spark, tmp_path):
    """round-13 verdict item 4: a foreign MULTI-PART classic checkpoint
    (`_last_checkpoint.parts=N`, actions sharded across
    <v>.checkpoint.<i>.<N>.parquet) bootstraps imports exactly like the
    single-file form; an incomplete part set refuses by name."""
    import pyarrow.parquet as pq  # noqa: F401 (helper dependency)

    root = str(tmp_path / "foreign")
    (a0,) = _write_foreign_delta(
        spark, root, [(i, f"n{i}") for i in range(10)], version=0
    )
    (a1,) = _write_foreign_delta(
        spark, root, [(i, f"n{i}") for i in range(10, 25)], version=1
    )
    schema_str = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "name", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    rows = _foreign_checkpoint_rows(root, [a0, a1], schema_str)
    # shard the actions across 2 parts: protocol+metaData+first add in
    # part 1, the second add alone in part 2 (order is not promised)
    p1 = f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
    p2 = f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"
    _write_checkpoint_rows(root, p1, rows[:3])
    _write_checkpoint_rows(root, p2, rows[3:])
    with open(os.path.join(root, "_delta_log", "_last_checkpoint"),
              "w") as fh:
        fh.write(json.dumps({"version": 1, "size": len(rows), "parts": 2}))
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))

    tbl = str(tmp_path / "mirror")
    r = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert r["files_adopted"] == 2 and r["delta_version"] == 1
    got = {
        row["id"]: row["name"]
        for row in S.snapshot_read(spark, tbl).collect()
    }
    assert got == {i: f"n{i}" for i in range(25)}

    # a part goes missing -> refuse BY NAME, never a partial replay
    os.remove(os.path.join(root, "_delta_log", p2))
    with pytest.raises(ValueError, match="part"):
        snapshot_import_delta(spark, root, str(tmp_path / "m2"))


# ---------------------------------------------------------------------------
# Deletion-vector import (round-14): foreign DV-carrying tables map onto
# the engine's native positional-tombstone machinery.
# ---------------------------------------------------------------------------


def _write_foreign_dv_delta(spark, root, version, file_rows, dvs,
                            removes=(), mrv=3):
    """Foreign Delta writer with DELETION VECTORS, from the public spec
    only: pyarrow data files (row order = id order, so position k holds
    id file_rows[path][k]), DV files in the spec's on-disk layout, adds
    carrying deletionVector descriptors. `dvs` maps data path ->
    (storageType, positions)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from test_delta_dv import serialize_dv, write_dv_file
    from e02_spark.ops.delta_dv import z85_encode

    os.makedirs(os.path.join(root, "_delta_log"), exist_ok=True)
    actions = []
    if version == 0:
        proto = {"minReaderVersion": mrv, "minWriterVersion": 2}
        if mrv == 3:
            proto["readerFeatures"] = ["deletionVectors"]
            proto["minWriterVersion"] = 7
            proto["writerFeatures"] = ["deletionVectors"]
        actions.append({"protocol": proto})
        actions.append({"metaData": {
            "id": "foreign-dv-table",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({
                "type": "struct",
                "fields": [
                    {"name": "id", "type": "long", "nullable": True,
                     "metadata": {}},
                    {"name": "name", "type": "string", "nullable": True,
                     "metadata": {}},
                ],
            }),
            "partitionColumns": [], "configuration": {},
            "createdTime": 0,
        }})
    for r in removes:
        actions.append({"remove": {
            "path": r, "deletionTimestamp": 0, "dataChange": True}})
    for path, ids in file_rows.items():
        full = os.path.join(root, path)
        if not os.path.exists(full):
            pq.write_table(pa.table({
                "id": pa.array(ids, pa.int64()),
                "name": pa.array([f"n{i}" for i in ids], pa.string()),
            }), full)
        add = {"path": path, "partitionValues": {},
               "size": os.path.getsize(full), "modificationTime": 0,
               "dataChange": True}
        spec = dvs.get(path)
        if spec is not None:
            storage, positions = spec
            data = serialize_dv(positions)
            if storage == "i":
                padded = data + b"\x00" * (-len(data) % 4)
                add["deletionVector"] = {
                    "storageType": "i",
                    "pathOrInlineDv": z85_encode(padded),
                    "sizeInBytes": len(data),
                    "cardinality": len(positions),
                }
            else:
                import uuid as _uuid

                u = _uuid.uuid4()
                (off,) = write_dv_file(
                    os.path.join(root, f"deletion_vector_{u}.bin"),
                    [data],
                )
                add["deletionVector"] = {
                    "storageType": "u",
                    "pathOrInlineDv": z85_encode(u.bytes),
                    "offset": off, "sizeInBytes": len(data),
                    "cardinality": len(positions),
                }
        actions.append({"add": add})
    with open(os.path.join(
        root, "_delta_log", f"{version:020d}.json"
    ), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def test_import_deletion_vectors(spark, tmp_path):
    """round-13 verdict item 1 (the top next): a foreign table whose
    adds carry deletion vectors (delta-spark >= 3.x default after any
    MERGE/DELETE) imports — the DV positions become native positional
    tombstones; row content equals DuckDB over the parquet minus the
    DV'd positions."""
    root = str(tmp_path / "foreign")
    f0, f1 = "part-00000-dv.parquet", "part-00001-dv.parquet"
    ids0, ids1 = list(range(0, 50)), list(range(50, 100))
    _write_foreign_dv_delta(
        spark, root, 0,
        {f0: ids0, f1: ids1},
        # file DV on f0 (positions 3,4,5 -> ids 3,4,5), inline on f1
        {f0: ("u", [3, 4, 5]), f1: ("i", [0, 49])},
    )
    tbl = str(tmp_path / "mirror")
    r = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert r["files_adopted"] == 2
    deleted = {3, 4, 5, 50, 99}
    expect = sorted(
        (i, f"n{i}") for i in range(100) if i not in deleted
    )
    got = _snapshot_rows_sorted(spark, tbl, ["id", "name"])
    assert got == expect
    # cross-engine: DuckDB over the raw parquet minus DV positions
    con = duckdb.connect()
    raw = con.execute(
        "SELECT id, name FROM read_parquet(?) ORDER BY id",
        [[os.path.join(root, f0), os.path.join(root, f1)]],
    ).fetchall()
    assert sorted(t for t in raw if t[0] not in deleted) == expect
    # row-count accounting composes with the tombstones
    assert S.snapshot_rows(tbl) == 95


def test_import_dv_sync_updates_tombstones_and_cdf(spark, tmp_path):
    """An incremental sync picks up a GROWN deletion vector on an
    unchanged data file (remove+re-add with a wider DV — the delta-spark
    DELETE shape); CDF between the two mirror versions shows exactly
    the newly tombstoned rows as deletes."""
    from e02_spark.ops.snapshot import snapshot_changes

    root = str(tmp_path / "foreign")
    f0 = "part-00000-dv.parquet"
    ids = list(range(0, 40))
    _write_foreign_dv_delta(spark, root, 0, {f0: ids}, {f0: ("u", [1])})
    tbl = str(tmp_path / "mirror")
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert S.snapshot_rows(tbl) == 39
    # foreign DELETE widens the DV: remove + re-add same file
    _write_foreign_dv_delta(
        spark, root, 1, {f0: ids}, {f0: ("u", [1, 7, 8])},
        removes=(f0,),
    )
    r = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert r["mode"] == "import_sync"
    assert r["files_adopted"] == 0  # same bytes, only tombstones moved
    got = {row[0] for row in _snapshot_rows_sorted(spark, tbl, ["id"])}
    assert got == set(ids) - {1, 7, 8}
    ch = snapshot_changes(spark, tbl, from_version=1, to_version=2)
    rows = [(r["id"], r["_change_type"]) for r in ch.collect()]
    assert sorted(rows) == [(7, "delete"), (8, "delete")]


def test_import_dv_local_merge_tombstones_survive_sync(spark, tmp_path):
    """Local MoR deletes on the mirror are NOT resurrected by the next
    sync (the sync replaces only its own origin='delta-import'
    tombstone shard; local delete refs carry forward)."""
    root = str(tmp_path / "foreign")
    f0 = "part-00000-dv.parquet"
    _write_foreign_dv_delta(
        spark, root, 0, {f0: list(range(30))}, {f0: ("u", [0])}
    )
    tbl = str(tmp_path / "mirror")
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    # local MoR delete of id=5 on the mirror
    S.snapshot_merge(
        spark, tbl, spark.createDataFrame([(5,)], "id long"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )
    assert S.snapshot_rows(tbl) == 28
    # foreign table appends a new file; sync must keep id=5 deleted
    f1 = "part-00001-dv.parquet"
    _write_foreign_dv_delta(spark, root, 1, {f1: [100, 101]}, {})
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    got = {row[0] for row in _snapshot_rows_sorted(spark, tbl, ["id"])}
    assert got == (set(range(30)) - {0, 5}) | {100, 101}


def test_import_dv_refusals_by_name(spark, tmp_path):
    """Outside-the-subset DV storage types and unknown readerFeatures
    still refuse BY NAME."""
    root = str(tmp_path / "f1")
    f0 = "part-00000-dv.parquet"
    _write_foreign_dv_delta(spark, root, 0, {f0: [1, 2, 3]}, {})
    # splice an unsupported storageType onto the add
    log = os.path.join(root, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(x) for x in open(log) if x.strip()]
    for a in acts:
        if "add" in a:
            a["add"]["deletionVector"] = {
                "storageType": "X", "pathOrInlineDv": "?",
                "sizeInBytes": 1, "cardinality": 1}
    with open(log, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in acts) + "\n")
    with pytest.raises(ValueError, match="storageType"):
        snapshot_import_delta(spark, root, str(tmp_path / "m1"))

    root2 = str(tmp_path / "f2")
    _write_foreign_dv_delta(spark, root2, 0, {f0: [1]}, {})
    log2 = os.path.join(root2, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(x) for x in open(log2) if x.strip()]
    for a in acts:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors", "variantType"],
            }
    with open(log2, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in acts) + "\n")
    with pytest.raises(ValueError, match="variantType"):
        snapshot_import_delta(spark, root2, str(tmp_path / "m2"))


# ---------------------------------------------------------------------------
# Column-mapping import (round-14): physical names -> native name-history.
# ---------------------------------------------------------------------------


def _write_foreign_cm_delta(root, version, files, fields, cmode="name",
                            removes=(), extra_protocol=None):
    """Foreign Delta writer with COLUMN MAPPING: pyarrow files store
    columns under each field's physicalName; the schema carries the
    delta.columnMapping metadata keys per PROTOCOL.md. `files` maps
    path -> {physical name: values}; `fields` is a list of
    (logical, physical, type, id)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(root, "_delta_log"), exist_ok=True)
    actions = []
    if version == 0:
        proto = extra_protocol or {
            "minReaderVersion": 2, "minWriterVersion": 5}
        actions.append({"protocol": proto})
        actions.append({"metaData": {
            "id": "foreign-cm-table",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({
                "type": "struct",
                "fields": [
                    {"name": lg, "type": ty, "nullable": True,
                     "metadata": {
                         "delta.columnMapping.id": fid,
                         "delta.columnMapping.physicalName": ph,
                     }}
                    for (lg, ph, ty, fid) in fields
                ],
            }),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": cmode,
                              "delta.columnMapping.maxColumnId": "10"},
            "createdTime": 0,
        }})
    for r in removes:
        actions.append({"remove": {
            "path": r, "deletionTimestamp": 0, "dataChange": True}})
    pa_t = {"long": pa.int64(), "string": pa.string()}
    for path, cols in files.items():
        full = os.path.join(root, path)
        if not os.path.exists(full):
            typed = {}
            for (lg, ph, ty, fid) in fields:
                typed[ph] = pa.array(cols[ph], pa_t[ty])
            pq.write_table(pa.table(typed), full)
        actions.append({"add": {
            "path": path, "partitionValues": {},
            "size": os.path.getsize(full), "modificationTime": 0,
            "dataChange": True}})
    with open(os.path.join(
        root, "_delta_log", f"{version:020d}.json"
    ), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


def test_import_column_mapping_name_mode(spark, tmp_path):
    """round-13 verdict item 2: a foreign table with
    delta.columnMapping.mode=name (physical col-<uuid> parquet names)
    imports — physical names translate into the engine's rename
    name-history, reads come back under LOGICAL names, and stats
    pruning probes the physical alias."""
    root = str(tmp_path / "foreign")
    fields = [("id", "col-aaaa1111", "long", 1),
              ("name", "col-bbbb2222", "string", 2)]
    _write_foreign_cm_delta(
        root, 0,
        {"part-0.parquet": {
            "col-aaaa1111": [1, 2, 3],
            "col-bbbb2222": ["a", "b", "c"]}},
        fields,
    )
    tbl = str(tmp_path / "mirror")
    r = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert r["files_adopted"] == 1
    got = _snapshot_rows_sorted(spark, tbl, ["id", "name"])
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # DuckDB agreement straight off the physical parquet
    raw = duckdb.connect().execute(
        'SELECT "col-aaaa1111", "col-bbbb2222" FROM read_parquet(?) '
        "ORDER BY 1", [os.path.join(root, "part-0.parquet")],
    ).fetchall()
    assert raw == got
    # the mapping rode in as native name-history
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert S._col_mapping(m) == {
        "id": ["col-aaaa1111"], "name": ["col-bbbb2222"]}
    # stats pruning works through the physical alias: a prune on the
    # logical name must not error and must return the right rows
    pruned = S.snapshot_read(spark, tbl, prune=("id", 2, 2)).collect()
    assert {row["id"] for row in pruned} >= {2}
    # incremental sync with a second file keeps resolving
    _write_foreign_cm_delta(
        root, 1,
        {"part-1.parquet": {
            "col-aaaa1111": [4], "col-bbbb2222": ["d"]}},
        fields,
    )
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    got = _snapshot_rows_sorted(spark, tbl, ["id", "name"])
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_import_column_mapping_with_deletion_vectors(spark, tmp_path):
    """Column mapping AND deletion vectors together (minReaderVersion 3
    with both readerFeatures) — the delta-spark default for a mapped
    table that ever ran DELETE."""
    from test_delta_dv import serialize_dv, write_dv_file
    from e02_spark.ops.delta_dv import z85_encode
    import uuid as _uuid

    root = str(tmp_path / "foreign")
    fields = [("id", "col-xyz", "long", 1)]
    _write_foreign_cm_delta(
        root, 0,
        {"part-0.parquet": {"col-xyz": [10, 11, 12, 13]}},
        fields,
        extra_protocol={
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "columnMapping"],
            "writerFeatures": ["deletionVectors", "columnMapping"],
        },
    )
    # splice a DV deleting position 1 (id=11) onto the add
    u = _uuid.uuid4()
    data = serialize_dv([1])
    (off,) = write_dv_file(
        os.path.join(root, f"deletion_vector_{u}.bin"), [data])
    log = os.path.join(root, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(x) for x in open(log) if x.strip()]
    for a in acts:
        if "add" in a:
            a["add"]["deletionVector"] = {
                "storageType": "u", "pathOrInlineDv": z85_encode(u.bytes),
                "offset": off, "sizeInBytes": len(data),
                "cardinality": 1}
    with open(log, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in acts) + "\n")
    tbl = str(tmp_path / "mirror")
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    got = [row[0] for row in _snapshot_rows_sorted(spark, tbl, ["id"])]
    assert got == [10, 12, 13]


def test_import_column_mapping_refusals(spark, tmp_path):
    """Missing physicalName, unknown mode, and mapping+partitioning all
    refuse BY NAME."""
    root = str(tmp_path / "f1")
    _write_foreign_cm_delta(
        root, 0, {"part-0.parquet": {"col-a": [1]}},
        [("id", "col-a", "long", 1)],
    )
    log = os.path.join(root, "_delta_log", f"{0:020d}.json")

    def _mutate(fn):
        acts = [json.loads(x) for x in open(log) if x.strip()]
        for a in acts:
            if "metaData" in a:
                fn(a["metaData"])
        with open(log, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in acts) + "\n")

    # strip physicalName
    def no_phys(md):
        sch = json.loads(md["schemaString"])
        for f in sch["fields"]:
            f["metadata"].pop("delta.columnMapping.physicalName", None)
        md["schemaString"] = json.dumps(sch)

    _mutate(no_phys)
    with pytest.raises(ValueError, match="physicalName"):
        snapshot_import_delta(spark, root, str(tmp_path / "m1"))

    root2 = str(tmp_path / "f2")
    _write_foreign_cm_delta(
        root2, 0, {"part-0.parquet": {"col-a": [1]}},
        [("id", "col-a", "long", 1)], cmode="weird",
    )
    with pytest.raises(ValueError, match="weird"):
        snapshot_import_delta(spark, root2, str(tmp_path / "m2"))

    root3 = str(tmp_path / "f3")
    _write_foreign_cm_delta(
        root3, 0, {"part-0.parquet": {"col-a": [1]}},
        [("id", "col-a", "long", 1)],
    )
    log3 = os.path.join(root3, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(x) for x in open(log3) if x.strip()]
    for a in acts:
        if "metaData" in a:
            a["metaData"]["partitionColumns"] = ["id"]
    with open(log3, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in acts) + "\n")
    with pytest.raises(ValueError, match="partition"):
        snapshot_import_delta(spark, root3, str(tmp_path / "m3"))


def test_hive_mirror_exports_zero_copy_partitioned(spark, tmp_path):
    """round-13 verdict item 5: a hive-import mirror exports ZERO-COPY
    as a genuinely PARTITIONED Delta table — each add carries its
    partitionValues, metaData declares partitionColumns, bytes are
    shared (same inode), and the independent spec reader (which casts
    partition values from the log, like any Delta reader) reconstructs
    snapshot_read exactly. The export then re-imports, closing the
    circle."""
    root = str(tmp_path / "foreign")
    _write_foreign_hive_delta(spark, root, 0, [
        ([(i, f"e{i}") for i in range(10)], "east"),
        ([(i, f"w{i}") for i in range(10, 20)], "west"),
    ])
    tbl = str(tmp_path / "mirror")
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    dest = str(tmp_path / "delta_out")
    r = snapshot_export_delta(spark, tbl, dest)
    assert r["mode"] == "zero-copy", r
    # spec surface: partitionColumns in metaData, partitionValues on adds
    log = os.path.join(dest, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(x) for x in open(log) if x.strip()]
    md = next(a["metaData"] for a in acts if "metaData" in a)
    assert md["partitionColumns"] == ["region"]
    adds = [a["add"] for a in acts if "add" in a]
    assert sorted(a["partitionValues"]["region"] for a in adds) == [
        "east", "west"]
    # shared bytes: no data pass happened
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    for e in S._all_entries(tbl, m):
        assert os.path.samefile(
            os.path.join(tbl, e["path"]), os.path.join(dest, e["path"]))
    # independent reader equality (partition col reconstructed from log)
    cols, rows = _read_delta_independently(dest)
    assert cols == ["id", "name", "region"]
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    # full circle: the export imports again as a hive mirror
    tbl2 = str(tmp_path / "mirror2")
    r2 = snapshot_import_delta(spark, dest, tbl2, stats_cols=["id"])
    assert r2["files_adopted"] == 2
    assert _snapshot_rows_sorted(spark, tbl2, cols) == rows


def test_hive_mirror_export_after_local_append(spark, tmp_path):
    """A locally-appended hive mirror loses zero-copy eligibility (the
    new file physically carries the partition column, with no hive
    values to emit): a FRESH dest materializes; the EXISTING partitioned
    dest refuses by name instead of silently flipping partitionColumns."""
    root = str(tmp_path / "foreign")
    _write_foreign_hive_delta(spark, root, 0, [
        ([(i, f"e{i}") for i in range(5)], "east"),
    ])
    tbl = str(tmp_path / "mirror")
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    dest = str(tmp_path / "out1")
    assert snapshot_export_delta(spark, tbl, dest)["mode"] == "zero-copy"
    # local append: file carries (id, name, region) physically
    S.snapshot_write(
        spark.createDataFrame([(100, "x", "north")],
                              "id long, name string, region string"),
        tbl, mode="append", n_files=1, stats_cols=["id"],
    )
    with pytest.raises(ValueError, match="partitionColumns"):
        snapshot_export_delta(spark, tbl, dest)
    dest2 = str(tmp_path / "out2")
    r = snapshot_export_delta(spark, tbl, dest2)
    assert r["mode"] == "materialized"
    cols, rows = _read_delta_independently(dest2)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    assert (100, "x", "north") in rows


# ---------------------------------------------------------------------------
# Deletion-vector EXPORT (round-14): outstanding positional tombstones
# export zero-copy as genuine Delta DVs instead of forcing a rewrite.
# ---------------------------------------------------------------------------


def test_export_mor_deletes_as_deletion_vectors(spark, tmp_path):
    """A MoR snapshot exports ZERO-COPY: shadowed adds carry
    deletionVector descriptors (storageType 'u'), the protocol is
    minReaderVersion 3 + readerFeatures=[deletionVectors], the
    independent reader (DuckDB file_row_number minus the decoded
    positions) reconstructs snapshot_read, the product serializer is
    byte-identical to this file's independent reference serializer,
    and the export round-trips through snapshot_import_delta."""
    from test_delta_dv import serialize_dv
    from e02_spark.ops.delta_dv import serialize_roaring_array

    # cross-pin the two independently-written serializers byte-for-byte
    for ps in ([1, 5, 9], list(range(0, 9000, 2)), [0, (1 << 32) + 3]):
        assert serialize_roaring_array(ps) == serialize_dv(ps)

    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(spark.range(400).selectExpr("id", "id % 9 AS v"),
                     tbl, mode="overwrite", n_files=2, stats_cols=["id"])
    S.snapshot_merge(
        spark, tbl,
        spark.createDataFrame([(7,), (13,), (250,)], "id long"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    r = snapshot_export_delta(spark, tbl, dest)
    assert r["mode"] == "zero-copy", r
    # shared bytes — no data rewrite happened
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    for e in S._all_entries(tbl, m):
        assert os.path.samefile(
            os.path.join(tbl, e["path"]), os.path.join(dest, e["path"]))
    # spec surface: DV descriptors on the shadowed adds
    log = os.path.join(dest, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(x) for x in open(log) if x.strip()]
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert proto["readerFeatures"] == ["deletionVectors"]
    dv_adds = [a["add"] for a in acts
               if "add" in a and a["add"].get("deletionVector")]
    assert dv_adds and all(
        a["deletionVector"]["storageType"] == "u" for a in dv_adds)
    assert sum(a["deletionVector"]["cardinality"] for a in dv_adds) == 3
    # independent reader equality
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    assert len(rows) == 397
    # full circle: the DV export imports back as a mirror
    tbl2 = str(tmp_path / "mirror")
    snapshot_import_delta(spark, dest, tbl2, stats_cols=["id"])
    assert _snapshot_rows_sorted(spark, tbl2, cols) == rows


def test_export_dv_incremental_reuse_and_update(spark, tmp_path):
    """Incremental exports: an UNCHANGED tombstone set re-uses the
    previous DV descriptor verbatim (no re-add, no new DV file); a
    GROWN set re-logs the file with a fresh descriptor; folding the
    deletes drops the DV (protocol stays upgraded); vacuum collects
    the superseded DV file but keeps the live one."""
    from e02_spark.ops.export import export_vacuum

    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(spark.range(300).selectExpr("id", "id % 5 AS v"),
                     tbl, mode="overwrite", n_files=1, stats_cols=["id"])
    S.snapshot_merge(
        spark, tbl, spark.createDataFrame([(3,)], "id long"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )
    r1 = snapshot_export_delta(spark, tbl, dest)
    assert r1["mode"] == "zero-copy"

    def _live_dv_descs():
        from e02_spark.ops.export import _replay_log

        s = _replay_log(dest)
        return {
            p: a.get("deletionVector")
            for p, a in s["live"].items() if a.get("deletionVector")
        }

    d1 = _live_dv_descs()
    assert len(d1) == 1
    # append-only commit: tombstones unchanged -> descriptor reused
    S.snapshot_write(
        spark.range(300, 320).selectExpr("id", "id % 5 AS v"), tbl,
        mode="append", n_files=1, stats_cols=["id"],
    )
    r2 = snapshot_export_delta(spark, tbl, dest)
    assert r2["files_added"] == 1  # ONLY the appended file
    d2 = _live_dv_descs()
    assert d2 == d1, "stable tombstones must not rewrite the DV"
    # grown tombstones -> same path re-logged with a new descriptor
    S.snapshot_merge(
        spark, tbl, spark.createDataFrame([(5,), (9,)], "id long"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    r3 = snapshot_export_delta(spark, tbl, dest)
    assert r3["files_added"] >= 1 and r3["files_removed"] >= 1
    d3 = _live_dv_descs()
    (old_desc,) = d1.values()
    (new_desc,) = [v for v in d3.values() if v != old_desc] or [None]
    assert new_desc is not None and new_desc["cardinality"] == 3
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    assert len(rows) == 317
    # vacuum: the superseded DV file goes, the live one stays
    dv_files = sorted(glob.glob(os.path.join(dest, "deletion_vector_*")))
    assert len(dv_files) == 2
    export_vacuum(dest, retain_versions=1)
    left = sorted(glob.glob(os.path.join(dest, "deletion_vector_*")))
    assert len(left) == 1
    cols, rows2 = _read_delta_independently(dest)
    assert rows2 == rows
    # fold the deletes -> next export drops the DV; protocol stays 3
    S.snapshot_rewrite_deletes(spark, tbl)
    snapshot_export_delta(spark, tbl, dest)
    assert _live_dv_descs() == {}
    cols, rows3 = _read_delta_independently(dest)
    assert rows3 == _snapshot_rows_sorted(spark, tbl, cols)


def test_export_dv_checkpoint_carries_descriptors(spark, tmp_path):
    """A checkpointed DV mirror bootstraps from the checkpoint alone:
    add rows carry their deletionVector structs and the protocol row
    its feature lists, so a log-cleaned mirror still reads exactly."""
    from e02_spark.ops.export import export_clean_logs

    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    S.snapshot_write(spark.range(100).selectExpr("id"), tbl,
                     mode="overwrite", n_files=1, stats_cols=["id"])
    S.snapshot_merge(
        spark, tbl, spark.createDataFrame([(42,)], "id long"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )
    snapshot_export_delta(spark, tbl, dest, checkpoint_interval=1)
    for i in range(2):
        S.snapshot_write(
            spark.range(100 + 10 * i, 110 + 10 * i).selectExpr("id"),
            tbl, mode="append", n_files=1, stats_cols=["id"],
        )
        r = snapshot_export_delta(spark, tbl, dest,
                                  checkpoint_interval=1)
        assert r["checkpointed"] is True
    assert export_clean_logs(dest)["removed"] == 2
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    assert len(rows) == 119


def test_hive_mirror_with_local_mor_deletes_exports_partitioned_dv(
    spark, tmp_path
):
    """The two round-14 zero-copy extensions COMPOSE: a hive-import
    mirror with local MoR deletes exports as a PARTITIONED Delta table
    whose shadowed adds carry deletion vectors (partitionValues + DV on
    the same add); the independent reader reconstructs both, and the
    export re-imports."""
    root = str(tmp_path / "foreign")
    _write_foreign_hive_delta(spark, root, 0, [
        ([(i, f"e{i}") for i in range(10)], "east"),
        ([(i, f"w{i}") for i in range(10, 20)], "west"),
    ])
    tbl = str(tmp_path / "mirror")
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    # local MoR delete: tombstones only, files (and their hive values)
    # untouched -> still hive-zero-copy eligible, now with DVs
    S.snapshot_merge(
        spark, tbl, spark.createDataFrame([(3,), (15,)], "id long"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    dest = str(tmp_path / "out")
    r = snapshot_export_delta(spark, tbl, dest)
    assert r["mode"] == "zero-copy", r
    log = os.path.join(dest, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(x) for x in open(log) if x.strip()]
    md = next(a["metaData"] for a in acts if "metaData" in a)
    assert md["partitionColumns"] == ["region"]
    dv_adds = [a["add"] for a in acts
               if "add" in a and a["add"].get("deletionVector")]
    assert len(dv_adds) == 2  # one deleted row in each region's file
    assert all(a["partitionValues"]["region"] in ("east", "west")
               for a in dv_adds)
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    assert len(rows) == 18
    tbl2 = str(tmp_path / "mirror2")
    snapshot_import_delta(spark, dest, tbl2, stats_cols=["id"])
    assert _snapshot_rows_sorted(spark, tbl2, cols) == rows


def test_import_dv_positions_span_rowgroups(spark, tmp_path):
    """DV row indexes are FILE-GLOBAL ordinals (Delta spec); the
    engine's `_metadata.row_index` must agree across parquet ROW-GROUP
    boundaries — a per-rowgroup-relative misread would silently delete
    the wrong rows in every rowgroup after the first."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from test_delta_dv import serialize_dv, write_dv_file
    from e02_spark.ops.delta_dv import z85_encode
    import uuid as _uuid

    root = str(tmp_path / "foreign")
    os.makedirs(os.path.join(root, "_delta_log"))
    ids = list(range(1000))
    part = "part-00000-mrg.parquet"
    pq.write_table(
        pa.table({
            "id": pa.array(ids, pa.int64()),
            "name": pa.array([f"n{i}" for i in ids], pa.string()),
        }),
        os.path.join(root, part),
        row_group_size=100,  # 10 rowgroups
    )
    assert pq.ParquetFile(os.path.join(root, part)).num_row_groups == 10
    # delete one position in the 1st, 4th and 10th rowgroups
    positions = [5, 350, 999]
    u = _uuid.uuid4()
    data = serialize_dv(positions)
    (off,) = write_dv_file(
        os.path.join(root, f"deletion_vector_{u}.bin"), [data])
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {
            "id": "mrg", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({
                "type": "struct",
                "fields": [
                    {"name": "id", "type": "long", "nullable": True,
                     "metadata": {}},
                    {"name": "name", "type": "string", "nullable": True,
                     "metadata": {}},
                ]}),
            "partitionColumns": [], "configuration": {},
            "createdTime": 0}},
        {"add": {
            "path": part, "partitionValues": {},
            "size": os.path.getsize(os.path.join(root, part)),
            "modificationTime": 0, "dataChange": True,
            "deletionVector": {
                "storageType": "u", "pathOrInlineDv": z85_encode(u.bytes),
                "offset": off, "sizeInBytes": len(data),
                "cardinality": len(positions)}}},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"),
              "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    tbl = str(tmp_path / "mirror")
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    got = {row[0] for row in _snapshot_rows_sorted(spark, tbl, ["id"])}
    assert got == set(ids) - {5, 350, 999}


def test_export_import_timestamp_ntz(spark, tmp_path):
    """A snapshot with a TIMESTAMP_NTZ column exports zero-copy under
    the timestampNtz table feature (schemaString carries timestamp_ntz,
    protocol upgrades); the independent reader and a re-import agree on
    the wall-clock values."""
    tbl, dest = str(tmp_path / "tbl"), str(tmp_path / "delta")
    df = spark.range(50).selectExpr(
        "id",
        "timestamp_ntz'2024-03-01 12:00:00' + make_interval(0,0,0,0,0,0,"
        "id*60) AS ts",
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    S.snapshot_write(df, tbl, mode="overwrite", n_files=1,
                     stats_cols=["id"])
    r = snapshot_export_delta(spark, tbl, dest)
    assert r["mode"] == "zero-copy"
    log = os.path.join(dest, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(x) for x in open(log) if x.strip()]
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert "timestampNtz" in proto["readerFeatures"]
    md = next(a["metaData"] for a in acts if "metaData" in a)
    assert '"timestamp_ntz"' in md["schemaString"]
    cols, rows = _read_delta_independently(dest)
    assert rows == _snapshot_rows_sorted(spark, tbl, cols)
    # re-import: the feature is in the claimed subset
    tbl2 = str(tmp_path / "mirror")
    snapshot_import_delta(spark, dest, tbl2, stats_cols=["id"])
    assert _snapshot_rows_sorted(spark, tbl2, cols) == rows
    assert dict(
        S.snapshot_read(spark, tbl2).dtypes
    )["ts"] == "timestamp_ntz"


def test_import_type_widening_narrow_files(spark, tmp_path):
    """typeWidening (round-14 claim): a foreign table whose FILES carry
    physically narrower types than the declared schema (int32 under
    `long` — the Delta widening matrix) imports; explicit-schema reads
    upcast, exactly like the engine's own snapshot_widen_column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "foreign")
    os.makedirs(os.path.join(root, "_delta_log"))
    part = "part-00000-narrow.parquet"
    pq.write_table(pa.table({
        "id": pa.array(range(20), pa.int32()),   # physically NARROW
        "x": pa.array([float(i) for i in range(20)], pa.float32()),
    }), os.path.join(root, part))
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["typeWidening"],
                      "writerFeatures": ["typeWidening"]}},
        {"metaData": {
            "id": "widened",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({
                "type": "struct",
                "fields": [
                    {"name": "id", "type": "long", "nullable": True,
                     "metadata": {}},
                    {"name": "x", "type": "double", "nullable": True,
                     "metadata": {}},
                ]}),
            "partitionColumns": [], "configuration": {},
            "createdTime": 0}},
        {"add": {"path": part, "partitionValues": {},
                 "size": os.path.getsize(os.path.join(root, part)),
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"),
              "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    tbl = str(tmp_path / "mirror")
    snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    df = S.snapshot_read(spark, tbl)
    assert dict(df.dtypes) == {"id": "bigint", "x": "double"}
    got = sorted((r["id"], round(r["x"], 2)) for r in df.collect())
    assert got == [(i, float(i)) for i in range(20)]


def _write_v2_checkpoint(root, version, adds_by_sidecar, schema_str,
                         top_json=False, inline_adds=None):
    """Foreign V2 checkpoint writer from PROTOCOL.md §V2 Checkpoint
    Spec: a top file `<v>.checkpoint.<unique>.{json,parquet}` holding
    checkpointMetadata + protocol + metaData + sidecarFile refs (and
    optionally inline adds); sidecar parquet files with the add rows
    under `_delta_log/_sidecars/`."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    log_dir = os.path.join(root, "_delta_log")
    sc_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)
    map_t = pa.map_(pa.string(), pa.string())
    add_t = pa.struct([
        ("path", pa.string()), ("partitionValues", map_t),
        ("size", pa.int64()), ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()), ("stats", pa.string()),
    ])
    sidecar_names = []
    for i, adds in enumerate(adds_by_sidecar):
        name = f"sc-{version}-{i}.parquet"
        rows = [{"add": {
            "path": a, "partitionValues": [],
            "size": os.path.getsize(os.path.join(root, a)),
            "modificationTime": 0, "dataChange": True, "stats": None,
        }} for a in adds]
        pq.write_table(pa.table({
            "add": pa.array([r["add"] for r in rows], add_t),
        }), os.path.join(sc_dir, name))
        sidecar_names.append(name)
    proto = {"minReaderVersion": 3, "minWriterVersion": 7,
             "readerFeatures": ["v2Checkpoint"],
             "writerFeatures": ["v2Checkpoint"]}
    meta = {"id": "v2-table",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_str, "partitionColumns": [],
            "configuration": {}, "createdTime": 0}
    top_name = f"{version:020d}.checkpoint.80a083e8-7026.{'json' if top_json else 'parquet'}"
    if top_json:
        actions = (
            [{"checkpointMetadata": {"version": version}},
             {"protocol": proto}, {"metaData": meta}]
            + [{"sidecarFile": {"path": n}} for n in sidecar_names]
            + [{"add": a} for a in (inline_adds or [])]
        )
        with open(os.path.join(log_dir, top_name), "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    else:
        cm_t = pa.struct([("version", pa.int64())])
        sf_t = pa.struct([("path", pa.string()),
                          ("sizeInBytes", pa.int64())])
        proto_t = pa.struct([
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string()))])
        meta_t = pa.struct([
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string()),
                                  ("options", map_t)])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", map_t), ("createdTime", pa.int64())])
        rows = (
            [{"checkpointMetadata": {"version": version}},
             {"protocol": {**proto}},
             {"metaData": {
                 **meta,
                 "format": {"provider": "parquet", "options": []},
                 "configuration": [],
             }}]
            + [{"sidecarFile": {"path": n, "sizeInBytes": 1}}
               for n in sidecar_names]
        )
        cols = {"checkpointMetadata": cm_t, "protocol": proto_t,
                "metaData": meta_t, "sidecarFile": sf_t, "add": add_t}
        pq.write_table(pa.table({
            c: pa.array([r.get(c) for r in rows], t)
            for c, t in cols.items()
        }), os.path.join(log_dir, top_name))
    # _last_checkpoint points at the version; the v2 file resolves by
    # listing (its unique suffix is not derivable from the pointer)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": version}))
    return top_name


@pytest.mark.parametrize("top_json", [False, True])
def test_import_v2_checkpoint(spark, tmp_path, top_json):
    """round-14: a foreign table checkpointed under
    delta.checkpointPolicy=v2 (top file + sidecars, parquet AND json
    top encodings) imports after its pre-checkpoint JSON log was
    cleaned; a missing sidecar refuses by name."""
    root = str(tmp_path / "foreign")
    (a0,) = _write_foreign_delta(
        spark, root, [(i, f"n{i}") for i in range(10)], version=0,
        protocol={"minReaderVersion": 3, "minWriterVersion": 7,
                  "readerFeatures": ["v2Checkpoint"],
                  "writerFeatures": ["v2Checkpoint"]},
    )
    (a1,) = _write_foreign_delta(
        spark, root, [(i, f"n{i}") for i in range(10, 25)], version=1
    )
    schema_str = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "name", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    _write_v2_checkpoint(root, 1, [[a0], [a1]], schema_str,
                         top_json=top_json)
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    tbl = str(tmp_path / "mirror")
    r = snapshot_import_delta(spark, root, tbl, stats_cols=["id"])
    assert r["files_adopted"] == 2 and r["delta_version"] == 1
    got = {row["id"]: row["name"]
           for row in S.snapshot_read(spark, tbl).collect()}
    assert got == {i: f"n{i}" for i in range(25)}
    # a sidecar goes missing -> refuse BY NAME
    (sc,) = glob.glob(os.path.join(root, "_delta_log", "_sidecars",
                                   "sc-1-0.parquet"))
    os.remove(sc)
    with pytest.raises(ValueError, match="sidecar"):
        snapshot_import_delta(spark, root, str(tmp_path / "m2"))
