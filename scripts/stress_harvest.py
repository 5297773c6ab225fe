"""Commit-plane stats-harvest stress: the footer harvest must not
serialize on the driver for bulk commits.

Protocol: materialize N small parquet files (one bulk-backfill commit's
worth), then time (a) the sequential driver-loop harvest and (b) the
distributed mapInPandas harvest over the same file list, at increasing
N. The distributed wall should grow ~flat-per-file (executor fan-out +
fixed job overhead) while the sequential wall grows linearly at ~ms per
footer; both must return byte-identical entries (the correctness pin
lives in tests/test_layout.py — this script re-checks it anyway).

Usage: python scripts/stress_harvest.py [n_files ...]   (default 256 1024 4096)
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

from e02_spark.ops import snapshot as S  # noqa: E402
from e02_spark.session import get_spark  # noqa: E402


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [256, 1024, 4096]
    spark = get_spark("stress_harvest")
    root = tempfile.mkdtemp(prefix="stress_harvest_")
    results = []
    try:
        for n in sizes:
            tbl = os.path.join(root, f"t{n}")
            # n single-row-group files, one footer each
            (
                spark.range(n * 10)
                .selectExpr("id", "id * 2 AS v", "CAST(id AS STRING) AS s")
                .repartition(n)
                .write.mode("error")
                .parquet(os.path.join(tbl, "data", "bulk"))
            )
            files = sorted(
                os.path.join(tbl, "data", "bulk", f)
                for f in os.listdir(os.path.join(tbl, "data", "bulk"))
                if f.endswith(".parquet")
            )
            cols = ["id", "v", "s"]
            t0 = time.time()
            seq = [S._harvest_one(p, cols, tbl) for p in files]
            t_seq = time.time() - t0
            t0 = time.time()
            dist = S._harvest_stats_distributed(spark, files, cols, tbl)
            t_dist = time.time() - t0
            assert json.dumps(seq, sort_keys=True) == json.dumps(
                dist, sort_keys=True
            ), f"entry mismatch at n={n}"
            results.append(
                {
                    "n_files": len(files),
                    "sequential_s": round(t_seq, 3),
                    "distributed_s": round(t_dist, 3),
                    "seq_ms_per_file": round(1000 * t_seq / len(files), 3),
                    "dist_ms_per_file": round(1000 * t_dist / len(files), 3),
                }
            )
            print(json.dumps(results[-1]))
            shutil.rmtree(tbl)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"harvest_stress": results}))


if __name__ == "__main__":
    main()
