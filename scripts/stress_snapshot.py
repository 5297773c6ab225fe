"""Snapshot-table stress: many-commit manifest growth, read planning
cost, pruning effectiveness, and GC at depth.

Protocol: N append commits of one file each (the worst-case manifest
shape — every commit rewrites the full file list), then measure
(a) commit latency vs version number (the O(#files) manifest rewrite),
(b) snapshot_read planning time at depth N, (c) manifest-stats pruning
fan-in on a point range, (d) snapshot_expire reclaiming all but the
last version, (e) full-history time travel still correct mid-stress.

Usage: python scripts/stress_snapshot.py [n_commits] [rows_per_commit]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from e02_spark.ops.snapshot import (  # noqa: E402
    snapshot_expire,
    snapshot_read,
    snapshot_rows,
    snapshot_write,
)
from e02_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark("snapshot-stress")
    spark.sparkContext.setLogLevel("ERROR")
    table = tempfile.mkdtemp(prefix="snap_stress_")
    shutil.rmtree(table)
    try:
        commit_ts = []
        for i in range(n_commits):
            df = spark.range(i * rows_per, (i + 1) * rows_per).selectExpr(
                "id AS k", "id * 2 AS v"
            )
            t0 = time.perf_counter()
            snapshot_write(
                df,
                table,
                mode="append" if i else "overwrite",
                cluster_by=["k"],
                stats_cols=["k"],
            )
            commit_ts.append(time.perf_counter() - t0)
        third = n_commits // 3
        print(
            f"commits={n_commits} rows/commit={rows_per} "
            f"early-third mean={sum(commit_ts[:third]) / third:.3f}s "
            f"late-third mean={sum(commit_ts[-third:]) / third:.3f}s"
        )

        t0 = time.perf_counter()
        full = snapshot_read(spark, table)
        n_full_files = len(full.inputFiles())
        plan_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = full.count()
        print(
            f"read@depth{n_commits}: plan {plan_s:.3f}s, count({n}) "
            f"{time.perf_counter() - t0:.3f}s, files={n_full_files}"
        )
        assert n == n_commits * rows_per

        # metadata-only COUNT(*)
        t0 = time.perf_counter()
        assert snapshot_rows(table) == n
        print(f"manifest count(*): {time.perf_counter() - t0:.4f}s")

        # pruning: one commit's key range -> ~1 file planned
        lo = (n_commits // 2) * rows_per + 5
        hi = lo + rows_per // 100
        t0 = time.perf_counter()
        pruned = snapshot_read(spark, table, prune=("k", lo, hi))
        n_files = len(pruned.inputFiles())
        got = pruned.where(f"k BETWEEN {lo} AND {hi}").count()
        print(
            f"pruned probe: {n_files}/{n_full_files} files planned, "
            f"{got} rows, {time.perf_counter() - t0:.3f}s"
        )
        assert got == hi - lo + 1
        assert n_files <= 2

        # time travel to the first commit, at full depth
        assert snapshot_read(spark, table, version=1).count() == rows_per

        # GC: keep last only
        t0 = time.perf_counter()
        res = snapshot_expire(table, keep_last=1, clean_orphans=True)
        print(
            f"expire: dropped {res['manifests_dropped']} manifests, "
            f"deleted {res['files_deleted']} files, "
            f"{time.perf_counter() - t0:.3f}s"
        )
        assert res["manifests_dropped"] == n_commits - 1
        assert res["files_deleted"] == 0  # appends: every file still live
        assert snapshot_read(spark, table).count() == n
        return 0
    finally:
        shutil.rmtree(table, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
