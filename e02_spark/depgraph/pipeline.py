"""End-to-end dependency-scan pipeline with real sources and sinks —
the full run the reference performs as `scan_dependencies.py` +
`generate_codefacilitators.py` (entry points 1-2, SURVEY.md §3.1-3.2).

Sources (A1-A3): a real directory tree is ingested as a (path, content)
DataFrame via the binaryFile source (whole-file reads, UTF-8 decode,
per-file error tolerance through PERMISSIVE-style null handling).

Sinks (A6/A7): the exact artifacts the reference writes —
  raw_dependencies.json        {func: {type, path, used_in: {files, functions}}}
  flattened_dependencies.json  {func: {type, path, used_in: {files}}}
  CODEFACILITATORS             "<def_path> <team> <team>\\n" sorted
with deterministic ordering (sorted lists / sorted lines, mirroring
scan_dependencies.py:23-24,204-208 and generate_codefacilitators.py:44-49).

The JSON artifacts are assembled driver-side from the (small) aggregated
function dimension — at 100 TB the heavy lifting (scan, extraction,
joins, aggregation) is distributed and only the KB-scale function summary
is collected, exactly like the reference's design where functions are few
while the corpus is large. Intermediate results can be checkpointed as
parquet between stages (A9) via `checkpoint_dir`.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .owners import codefacilitators
from .scanner import dependency_graph, flatten_one_hop


def read_sql_tree(spark: SparkSession, root_dir: str) -> DataFrame:
    """(path, content) corpus from a real directory tree: recursive *.sql
    whole-file reads, paths relativized to root_dir (A1-A3)."""
    root = str(Path(root_dir).resolve())
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.sql")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    rel = F.regexp_replace(
        F.regexp_replace(F.col("path"), "^file:", ""), F.lit(root + "/"), F.lit("")
    )
    return raw.select(
        rel.alias("path"),
        F.decode(F.col("content"), "UTF-8").alias("content"),
    )


def run_scan(
    spark: SparkSession,
    sql_files: DataFrame,
    output_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Entry point 1: corpus → raw_dependencies.json + flattened_dependencies.json.

    SIZE BOUND: the two writers collect() to the driver to produce the
    reference's byte-deterministic single-file artifacts — correct for
    this pipeline's domain (one repo's SQL function graph, KB-scale by
    construction: the reference materializes the same dicts in plain
    Python, scan_dependencies.py:194-208). Do not point it at a
    corpus-sized graph; for that, write the `raw`/`flat` DataFrames to
    parquet (the checkpoint_dir path) and skip the JSON artifacts."""
    raw = dependency_graph(sql_files)
    flat = flatten_one_hop(sql_files)
    if checkpoint_dir:  # A9: parquet checkpoint between pipeline stages
        raw.write.mode("overwrite").parquet(f"{checkpoint_dir}/raw_deps.parquet")
        flat.write.mode("overwrite").parquet(f"{checkpoint_dir}/flat_deps.parquet")
        raw = spark.read.parquet(f"{checkpoint_dir}/raw_deps.parquet")
        flat = spark.read.parquet(f"{checkpoint_dir}/flat_deps.parquet")

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    raw_doc = {
        r["func_name"]: {
            "type": "function",
            "path": r["def_path"],
            "used_in": {
                "files": list(r["used_in_files"]),
                "functions": list(r["used_in_functions"]),
            },
        }
        for r in sorted(raw.collect(), key=lambda r: r["func_name"])
    }
    (out / "raw_dependencies.json").write_text(json.dumps(raw_doc, indent=2))

    flat_doc = {
        r["func_name"]: {
            "type": "function",
            "path": r["def_path"],
            "used_in": {"files": list(r["files"])},
        }
        for r in sorted(flat.collect(), key=lambda r: r["func_name"])
    }
    (out / "flattened_dependencies.json").write_text(json.dumps(flat_doc, indent=2))


def run_codefacilitators(
    spark: SparkSession,
    sql_files: DataFrame,
    owner_lines: DataFrame,
    output_path: str,
) -> None:
    """Entry point 2: flattened deps ∘ MARTOWNERS → CODEFACILITATORS text
    sink, sorted by function name, teams sorted within each line
    (generate_codefacilitators.py:44-49). Same KB-scale driver-side
    collect bound as run_scan (see its docstring) — the artifact is a
    single deterministic text file by contract."""
    result = codefacilitators(flatten_one_hop(sql_files), owner_lines)
    lines = [
        f"{r['def_path']} {' '.join(r['teams'])}"
        for r in sorted(result.collect(), key=lambda r: r["func_name"])
    ]
    Path(output_path).write_text(
        "# Auto-generated from dependencies\n\n" + "\n".join(lines) + "\n"
    )
