"""End-to-end pipeline test: materialize the fixture corpus as REAL files,
ingest through the binaryFile source, run both entry points, and check the
artifacts byte-level against the reference's output shapes."""

from __future__ import annotations

import json
from pathlib import Path

from e02_spark import fixtures
from e02_spark.depgraph.pipeline import (
    read_sql_tree,
    run_codefacilitators,
    run_scan,
)


def _materialize_tree(root: Path) -> None:
    for path, content in fixtures.SQL_FILES:
        p = root / path
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content, encoding="utf-8")


def test_end_to_end_scan_pipeline(spark, tmp_path):
    tree = tmp_path / "repo"
    tree.mkdir()
    _materialize_tree(tree)

    corpus = read_sql_tree(spark, str(tree))
    # ingestion parity: same (path, content) rows as the fixture DataFrame
    got = {r["path"]: r["content"] for r in corpus.collect()}
    assert got == dict(fixtures.SQL_FILES)

    out = tmp_path / "out"
    run_scan(spark, corpus, str(out), checkpoint_dir=str(tmp_path / "ckpt"))

    raw = json.loads((out / "raw_dependencies.json").read_text())
    flat = json.loads((out / "flattened_dependencies.json").read_text())

    # reference output shape: {func: {type, path, used_in: {...}}}
    assert raw["base_func"]["type"] == "function"
    assert raw["base_func"]["used_in"]["functions"] == ["middle_func"]
    assert raw["base_func"]["used_in"]["files"] == [
        "superset/datasets/kimball/double_call.sql"
    ]
    # one-hop flattening: base gains middle's file, not top's
    assert flat["base_func"]["used_in"]["files"] == [
        "replicator/source/end_view.sql",
        "superset/datasets/kimball/double_call.sql",
    ]
    assert "used_in" in flat["weird"] and flat["weird"]["used_in"]["files"] == []
    # keys sorted (deterministic artifact)
    assert list(raw) == sorted(raw)


def test_codefacilitators_artifact(spark, tmp_path):
    tree = tmp_path / "repo"
    tree.mkdir()
    _materialize_tree(tree)
    corpus = read_sql_tree(spark, str(tree))
    out = tmp_path / "CODEFACILITATORS"
    run_codefacilitators(
        spark, corpus, fixtures.spark_df(spark, "owner_lines"), str(out)
    )
    text = out.read_text()
    lines = [l for l in text.splitlines() if l and not l.startswith("#")]
    # reference format: "<def_path> <team> [<team>...]", teams sorted
    assert lines[0].startswith("deployer/patch/DWH/kimball/")
    by_path = {l.split()[0]: l.split()[1:] for l in lines}
    utm = by_path["deployer/patch/DWH/kimball/r_3.000140_f_utm_campaign_to_product.sql"]
    assert utm == ["org/bi-team", "org/market-facilitators"]
    for teams in by_path.values():
        assert teams == sorted(teams)


def test_json_artifact_readable_by_spark_json_source(spark, tmp_path):
    """A5 closed end-to-end: the pipeline's JSON artifact must be
    re-ingestable through the actual `spark.read.json` source (multiLine —
    the artifact is one pretty-printed object), not just via from_json on
    string columns. The reference's artifact is a func->record MAP, so the
    re-read explodes the object's fields back into rows and must round-trip
    every (func_name, def_path)."""
    from e02_spark import fixtures
    from e02_spark.depgraph.pipeline import run_scan

    out = tmp_path / "artifacts"
    run_scan(spark, fixtures.spark_df(spark, "sql_files"), str(out))

    df = spark.read.option("multiLine", "true").json(
        str(out / "flattened_dependencies.json")
    )
    # one column per function (map-shaped doc); stack back to rows
    funcs = sorted(df.columns)
    rows = {
        f: df.select(f"`{f}`.path", f"`{f}`.type").collect()[0]
        for f in funcs
    }
    import json as _json

    doc = _json.loads((out / "flattened_dependencies.json").read_text())
    assert set(rows) == set(doc)
    for f, r in rows.items():
        assert r["path"] == doc[f]["path"]
        assert r["type"] == "function"
