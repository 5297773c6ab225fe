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
then verify mirror row counts and one pruned point read.

Usage: python scripts/stress_delta.py [n_files] [rows_per_file]
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
    }))
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
