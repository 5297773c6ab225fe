"""Stress: equality-delete merge write cost vs table size (the CDC
upsert-ingest claim of ops/snapshot.py strategy='eq').

Claims under test (the 100 TB posture):
  1. An eq upsert's WALL is O(source), flat as the target grows — the
     write path reads zero target data (contrast MoR, whose matched-row
     discovery scans stats-pruned candidate files, and CoW, which also
     rewrites them).
  2. The eq read tax is one broadcast anti-join: reading the table with
     outstanding eq deletes costs ~the clean-read wall, not a shuffle.
  3. snapshot_rewrite_deletes touches ONLY seq/stats-affected files:
     with the delete keys confined to a narrow key band, rewrite wall
     tracks the band, not the table.

Run: python scripts/stress_eq_deletes.py [doublings]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from e02_spark.ops.snapshot import (  # noqa: E402
    snapshot_merge,
    snapshot_read,
    snapshot_rewrite_deletes,
    snapshot_write,
)
from e02_spark.session import get_spark  # noqa: E402


def main() -> int:
    doublings = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("stress-eq")
    spark.sparkContext.setLogLevel("ERROR")
    rows = 1_000_000
    src_rows = 10_000
    for step in range(doublings):
        n = rows * (2**step)
        base = tempfile.mkdtemp(prefix="stress_eq_")
        tbl = os.path.join(base, "tbl")
        n_files = max(8, n // 500_000)  # constant ~500k-row files
        snapshot_write(
            spark.range(n).selectExpr("id", "id * 2 AS v"),
            tbl, mode="overwrite", n_files=n_files,
            cluster_by=["id"], stats_cols=["id"],
        )
        # CDC upsert source: a fixed-size batch confined to a narrow
        # key band at the low end (the realistic hot-partition shape)
        src = spark.range(0, src_rows).selectExpr("id", "id * 7 AS v")

        t0 = time.time()
        m = snapshot_merge(
            spark, tbl, src, on=["id"], when_matched="update",
            insert_not_matched=True, strategy="eq", n_files_new=1,
        )
        eq_wall = time.time() - t0
        t0 = time.time()
        mor_tbl = os.path.join(base, "mor")
        snapshot_write(
            spark.range(n).selectExpr("id", "id * 2 AS v"),
            mor_tbl, mode="overwrite", n_files=n_files,
            cluster_by=["id"], stats_cols=["id"],
        )
        setup_wall = time.time() - t0
        t0 = time.time()
        snapshot_merge(
            spark, mor_tbl, src, on=["id"], when_matched="update",
            insert_not_matched=True, strategy="mor", n_files_new=1,
        )
        mor_wall = time.time() - t0
        t0 = time.time()
        n_live = snapshot_read(spark, tbl).count()  # eq anti-join read
        read_wall = time.time() - t0
        t0 = time.time()
        rw = snapshot_rewrite_deletes(spark, tbl, n_files_new=2)
        rw_wall = time.time() - t0
        print(
            f"rows={n:>9,} files={n_files:>3} | eq merge {eq_wall:5.2f}s "
            f"(files_rewritten={m['files_rewritten']}) | mor merge "
            f"{mor_wall:5.2f}s | eq-read {read_wall:5.2f}s "
            f"(live={n_live:,}) | rewrite {rw_wall:5.2f}s "
            f"(rewrote {rw['files_rewritten']}/{n_files}) | "
            f"[table build {setup_wall:.1f}s]",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
