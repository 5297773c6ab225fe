"""Bounded-seed export-mirror fuzz (round-13 verdict item 8): the same
randomized snapshot-op generator that drives tests/test_snapshot_fuzz
(_apply_random_op — appends, CoW/MoR/EQ merges, rewrites, compaction,
schema evolution, renames, rollbacks...) mutates a table while it is
exported INCREMENTALLY into one long-lived Delta mirror
(checkpoint_interval=2, so checkpoints + metaData re-emissions exercise
constantly). After every export an independent spec replay (checkpoint
bootstrap + JSON tail via ops/export._replay_log, DuckDB on the data
files) must equal snapshot_read; the run ends with the documented
vacuum -> clean lifecycle re-verified.

The unbounded version lives in scripts/stress_export_fuzz.py (6 seeds x
10 ops); this in-suite twin keeps 2 seeds x 8 ops so CI catches the
next adoption/publish race (the ad-hoc fuzz found a real one, commit
2e14e2e) without dominating suite wall-clock.
"""

from __future__ import annotations

import json
import os
import random

import duckdb
import pytest

from e02_spark.ops import snapshot as S
from e02_spark.ops.export import (
    _replay_log,
    export_clean_logs,
    export_vacuum,
    snapshot_export_delta,
)

from test_snapshot_fuzz import _apply_random_op, _df


def _spec_read(dest: str):
    """(cols, sorted rows) via checkpoint bootstrap + json replay +
    DuckDB — shared spec knowledge only, no exporter write-path code.
    DV-carrying adds (a fuzz seed whose MoR deletes were outstanding at
    export time now exports them as deletion vectors) subtract their
    decoded positions per file."""
    from e02_spark.ops.delta_dv import dv_positions

    s = _replay_log(dest)
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


@pytest.mark.parametrize("seed", [11, 23])
def test_export_mirror_fuzz(spark, tmp_path, seed):
    rng = random.Random(seed * 1009)
    base = str(tmp_path)
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
        r = snapshot_export_delta(spark, table, dest,
                                  checkpoint_interval=2)
        cols, rows = _spec_read(dest)
        got = sorted(
            tuple(row[c] for c in cols)
            for row in S.snapshot_read(spark, table)
            .select(*cols).collect()
        )
        assert rows == got, (
            f"seed={seed} trace={trace} mode={r['mode']}: spec reader "
            "disagrees with snapshot_read"
        )
        idx = {c: i for i, c in enumerate(cols)}
        mirror = {row[idx["id"]]: row[idx["amt"]] for row in rows}
        assert mirror == model, f"seed={seed} trace={trace}"

    sync_and_verify()
    for step in range(8):
        trace.append(_apply_random_op(spark, rng, table, model, ctx))
        if step % 2 == 1:
            sync_and_verify()
    sync_and_verify()
    # full mirror lifecycle: vacuum then clean (either order is safe
    # now that checkpoints carry tombstones; keep the documented one)
    export_vacuum(dest, retain_versions=1)
    export_clean_logs(dest)
    cols, rows = _spec_read(dest)
    idx = {c: i for i, c in enumerate(cols)}
    assert {r[idx["id"]]: r[idx["amt"]] for r in rows} == model, (
        f"seed={seed} trace={trace}: post-vacuum/clean mirror != model"
    )
