"""Delta interop stress: export/import cost vs file count.

The claim under measurement (ops/export.py): zero-copy export and
import are O(metadata) in wall time — hard links + one log/manifest
write, NO data pass — so doubling the file count roughly doubles their
cost while staying orders of magnitude under the materialized path,
and the incremental re-export of one appended file is O(1), not
O(table). At 100 TB this is the difference between "publish a Delta
mirror in seconds" and "rewrite the lake".

Protocol: a clustered table of N files x R rows; measure
(a) zero-copy export wall + per-file cost,
(b) incremental re-export after ONE appended file,
(c) zero-copy import of the exported log into a mirror,
(d) the materialized export of the same table (the data-pass
    comparison point),
(e) round 13 — checkpoint economics on a LONG-LIVED mirror: after K
    incremental exports, log-open (_replay_log) cost WITH the classic
    checkpoint + cleaned JSON vs the same history replayed from pure
    JSON, plus export_vacuum wall on the accumulated tombstones,
then verify mirror row counts and one pruned point read.

Usage: python scripts/stress_delta.py [n_files] [rows_per_file] [k_exports]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from e02_spark.ops.export import (  # noqa: E402
    snapshot_export_delta,
    snapshot_import_delta,
)
from e02_spark.ops.snapshot import (  # noqa: E402
    snapshot_rows,
    snapshot_write,
)
from e02_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark("delta-stress")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="delta_stress_")
    tbl = os.path.join(base, "tbl")
    n_rows = n_files * rows_per
    df = spark.range(n_rows).selectExpr("id", "id % 97 AS v")
    snapshot_write(df, tbl, mode="overwrite", n_files=n_files,
                   cluster_by=["id"], stats_cols=["id"])

    dest = os.path.join(base, "delta")
    t0 = time.perf_counter()
    r = snapshot_export_delta(spark, tbl, dest)
    t_export = time.perf_counter() - t0
    assert r["mode"] == "zero-copy" and r["files_added"] == n_files, r

    snapshot_write(
        spark.range(n_rows, n_rows + rows_per).selectExpr(
            "id", "id % 97 AS v"
        ),
        tbl, mode="append", n_files=1, stats_cols=["id"],
    )
    t0 = time.perf_counter()
    r2 = snapshot_export_delta(spark, tbl, dest)
    t_incr = time.perf_counter() - t0
    assert r2["files_added"] == 1 and r2["files_removed"] == 0, r2

    mirror = os.path.join(base, "mirror")
    t0 = time.perf_counter()
    r3 = snapshot_import_delta(spark, dest, mirror, stats_cols=["id"])
    t_import = time.perf_counter() - t0
    assert r3["files_adopted"] == n_files + 1, r3
    assert snapshot_rows(mirror) == n_rows + rows_per

    dest_m = os.path.join(base, "delta_mat")
    t0 = time.perf_counter()
    snapshot_export_delta(spark, tbl, dest_m, materialize=True,
                          n_files=n_files)
    t_mat = time.perf_counter() - t0

    from e02_spark.ops.snapshot import _plan_files

    kept, _ = _plan_files(mirror, None, ("id", 5, 5))
    assert len(kept) <= 2, kept  # harvested stats prune the mirror

    # (e) long-lived mirror: K more single-file exports, then compare
    # log-open cost pure-JSON vs checkpoint-bootstrapped (+ vacuum)
    from e02_spark.ops.export import (
        _replay_log,
        export_clean_logs,
        export_vacuum,
    )

    k_exports = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    lo = n_rows + rows_per
    for i in range(k_exports):
        snapshot_write(
            spark.range(lo + i * 10, lo + i * 10 + 10).selectExpr(
                "id", "id % 97 AS v"
            ),
            tbl, mode="append", n_files=1, stats_cols=["id"],
        )
        snapshot_export_delta(spark, tbl, dest)
    t0 = time.perf_counter()
    s_json = _replay_log(dest)  # checkpoint exists but JSON also full
    t_open_cp_fulljson = time.perf_counter() - t0
    # pure-JSON replay cost: hide the checkpoint pointer temporarily
    lc = os.path.join(dest, "_delta_log", "_last_checkpoint")
    cps = [p for p in os.listdir(os.path.join(dest, "_delta_log"))
           if p.endswith(".checkpoint.parquet")]
    os.rename(lc, lc + ".bak")
    for p in cps:
        os.rename(os.path.join(dest, "_delta_log", p),
                  os.path.join(dest, "_delta_log", p + ".bak"))
    t0 = time.perf_counter()
    s_pure = _replay_log(dest)
    t_open_pure_json = time.perf_counter() - t0
    assert s_pure["live"].keys() == s_json["live"].keys()
    os.rename(lc + ".bak", lc)
    for p in cps:
        os.rename(os.path.join(dest, "_delta_log", p + ".bak"),
                  os.path.join(dest, "_delta_log", p))
    cleaned = export_clean_logs(dest)
    t0 = time.perf_counter()
    s_cp = _replay_log(dest)
    t_open_checkpoint = time.perf_counter() - t0
    assert s_cp["live"].keys() == s_json["live"].keys()
    # a compacting export supersedes every live file; vacuum at
    # retain_versions=1 then collects the whole pre-compact generation
    from e02_spark.ops.snapshot import snapshot_compact

    snapshot_compact(spark, tbl, n_files=8)
    snapshot_export_delta(spark, tbl, dest)
    t0 = time.perf_counter()
    vac = export_vacuum(dest, retain_versions=1)
    t_vacuum = time.perf_counter() - t0
    assert vac["files_deleted"] >= n_files, vac
    cols_live = _replay_log(dest)["live"]
    assert all(
        os.path.exists(os.path.join(dest, p)) for p in cols_live
    )

    # (f) round 14 — DELETION VECTORS at scale: a MoR delete touching
    # every live file exports zero-copy (one DV file, descriptors on
    # every add; no data pass), and the DV'd export imports into a
    # fresh mirror with executor-side bitmap decode. Costs must stay
    # O(tombstones) + O(files) metadata, nowhere near the data pass.
    from e02_spark.ops.snapshot import snapshot_merge

    n_live = snapshot_rows(tbl)
    keys = spark.range(0, n_rows, 37).selectExpr("id")  # ~n/37 rows
    snapshot_merge(spark, tbl, keys, on=["id"], when_matched="delete",
                   insert_not_matched=False, strategy="mor")
    n_tomb = n_live - snapshot_rows(tbl)
    t0 = time.perf_counter()
    r_dv = snapshot_export_delta(spark, tbl, dest)
    t_dv_export = time.perf_counter() - t0
    assert r_dv["mode"] == "zero-copy", r_dv
    s_dv = _replay_log(dest)
    n_dv_adds = sum(
        1 for a in s_dv["live"].values() if a.get("deletionVector")
    )
    assert n_dv_adds > 0
    mirror2 = os.path.join(base, "mirror_dv")
    t0 = time.perf_counter()
    snapshot_import_delta(spark, dest, mirror2, stats_cols=["id"])
    t_dv_import = time.perf_counter() - t0
    assert snapshot_rows(mirror2) == snapshot_rows(tbl)

    print(json.dumps({
        "n_files": n_files,
        "rows": n_rows,
        "export_zero_copy_s": round(t_export, 3),
        "export_us_per_file": round(1e6 * t_export / n_files, 1),
        "export_incremental_s": round(t_incr, 3),
        "import_s": round(t_import, 3),
        "export_materialized_s": round(t_mat, 3),
        "zero_copy_speedup_vs_materialize":
            round(t_mat / max(t_export, 1e-9), 1),
        "k_exports": k_exports,
        "log_open_pure_json_s": round(t_open_pure_json, 3),
        "log_open_checkpoint_fulljson_s": round(t_open_cp_fulljson, 3),
        "log_open_checkpoint_cleaned_s": round(t_open_checkpoint, 3),
        "json_commits_cleaned": cleaned["removed"],
        "vacuum_s": round(t_vacuum, 3),
        "vacuum_files_deleted": vac["files_deleted"],
        "dv_tombstones": n_tomb,
        "dv_shadowed_adds": n_dv_adds,
        "dv_export_s": round(t_dv_export, 3),
        "dv_import_s": round(t_dv_import, 3),
    }))
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
