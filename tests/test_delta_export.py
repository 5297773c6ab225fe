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
