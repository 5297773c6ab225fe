"""Randomized export-mirror fuzz: the REAL mutation-fuzz op generator
(tests/test_snapshot_fuzz._apply_random_op — appends, CoW/MoR/EQ
merges, rewrites, binpack, compaction, schema evolution, renames,
widens, rollbacks, checks, publishes, racing upserts, catalog ops)
drives a snapshot table, and after every few ops the table is exported
INCREMENTALLY into one long-lived Delta mirror (checkpoint_interval=2,
so classic checkpoints and metaData re-emissions exercise constantly).
After each export an independent spec replay (plain json + checkpoint
parquet via pyarrow, DuckDB on the data files — no exporter code)
must reconstruct snapshot_read's content exactly; at the end the
mirror is vacuumed to the tip, the log cleaned past its newest
checkpoint, and re-verified. (Since round 14 checkpoints carry remove
tombstones — and DV references on both row kinds — so either order is
leak-free; the vacuum-first order here simply keeps the clean's
leak-refusal path quiet.)

This is the adversarial twin of tests/test_delta_export.py's designed
lifecycle test: seeded random op interleavings hunt export/evolution
interactions nobody designed (e.g. rollback past a rename between two
exports, an eq merge leaving outstanding deletes at export time —
which must force materialize — then a rewrite flipping the next export
back to zero-copy).

Usage: python scripts/stress_export_fuzz.py [n_seeds] [ops_per_seed]
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)
sys.path.insert(0, os.path.join(here, "tests"))

import duckdb  # noqa: E402

from e02_spark.ops import snapshot as S  # noqa: E402
from e02_spark.ops.export import (  # noqa: E402
    _replay_log,
    export_clean_logs,
    export_vacuum,
    snapshot_export_delta,
)
from e02_spark.session import get_spark  # noqa: E402


def _spec_read(dest: str):
    """(cols, sorted rows) via checkpoint bootstrap + json replay +
    DuckDB — mirrors the test suite's independent reader, shared spec
    knowledge only. DV-carrying adds subtract their decoded positions
    (round 14: outstanding MoR deletes export as deletion vectors)."""
    from e02_spark.ops.delta_dv import dv_positions

    s = _replay_log(dest)  # gap-refusal + checkpoint bootstrap included
    schema = json.loads(s["metadata"]["schemaString"])
    cols = [f["name"] for f in schema["fields"]]
    if not s["live"]:
        return cols, []
    sel = ", ".join(f'"{c}"' for c in cols)
    con = duckdb.connect()
    if any(a.get("deletionVector") for a in s["live"].values()):
        legs = []
        for rel in sorted(s["live"]):
            fpath = os.path.join(dest, rel).replace("'", "''")
            dvd = s["live"][rel].get("deletionVector")
            if dvd:
                gone = dv_positions(dest, dict(dvd))
                in_list = ", ".join(map(str, gone)) or "-1"
                legs.append(
                    f"SELECT {sel} FROM read_parquet('{fpath}', "
                    f"file_row_number=true, union_by_name=true) "
                    f"WHERE file_row_number NOT IN ({in_list})"
                )
            else:
                legs.append(
                    f"SELECT {sel} FROM read_parquet('{fpath}', "
                    "union_by_name=true)"
                )
        rows = con.execute(
            "SELECT * FROM (" + " UNION ALL ".join(legs)
            + ") ORDER BY ALL"
        ).fetchall()
        return cols, rows
    paths = [os.path.join(dest, p) for p in sorted(s["live"])]
    rows = con.execute(
        f"SELECT {sel} FROM read_parquet(?, union_by_name=true) "
        "ORDER BY ALL", [paths],
    ).fetchall()
    return cols, rows


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n_ops = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("export-fuzz")
    spark.sparkContext.setLogLevel("ERROR")

    from test_snapshot_fuzz import _apply_random_op, _df

    t_start = time.perf_counter()
    total_exports = 0
    for seed in range(1, n_seeds + 1):
        rng = random.Random(seed * 1009)
        base = tempfile.mkdtemp(prefix="export_fuzz_")
        table = os.path.join(base, "tbl")
        dest = os.path.join(base, "delta")
        init = [(k, rng.randrange(1000)) for k in range(0, 120, 2)]
        S.snapshot_write(_df(spark, init), table, mode="overwrite",
                         n_files=3, cluster_by=["id"], stats_cols=["id"],
                         partition_spec=[("bucket", "id", 4)],
                         bloom_cols=["id"])
        model = dict(init)
        ctx = {"versions": [1],
               "history": {1: (dict(init), False, False, "tag", "integer")},
               "check": False, "tmp": base,
               "evolved": False, "tag_name": "tag", "tag_gen": 0,
               "amt_type": "integer"}
        trace: list[str] = []

        def sync_and_verify() -> None:
            nonlocal total_exports
            r = snapshot_export_delta(spark, table, dest,
                                      checkpoint_interval=2)
            total_exports += 1
            cols, rows = _spec_read(dest)
            got = sorted(
                tuple(row[c] for c in cols)
                for row in S.snapshot_read(spark, table)
                .select(*cols).collect()
            )
            assert rows == got, (
                f"seed={seed} trace={trace} mode={r['mode']}: spec "
                f"reader disagrees with snapshot_read"
            )
            idx = {c: i for i, c in enumerate(cols)}
            mirror = {row[idx["id"]]: row[idx["amt"]] for row in rows}
            assert mirror == model, (
                f"seed={seed} trace={trace}: mirror != model"
            )

        sync_and_verify()
        for step in range(n_ops):
            trace.append(_apply_random_op(spark, rng, table, model, ctx))
            if step % 2 == 1:
                sync_and_verify()
        sync_and_verify()
        # vacuum BEFORE cleaning: the cleaned commits' add actions are
        # vacuum's only record of historical files (see both docstrings)
        vac = export_vacuum(dest, retain_versions=1)
        cleaned = export_clean_logs(dest)
        cols, rows = _spec_read(dest)
        idx = {c: i for i, c in enumerate(cols)}
        assert {r[idx["id"]]: r[idx["amt"]] for r in rows} == model
        print(f"# seed {seed}: ops={trace} cleaned={cleaned['removed']} "
              f"vacuumed={vac['files_deleted']}", file=sys.stderr)
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({
        "seeds": n_seeds, "ops_per_seed": n_ops,
        "exports_verified": total_exports,
        "wall_s": round(time.perf_counter() - t_start, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
