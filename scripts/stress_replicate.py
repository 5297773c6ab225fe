"""Stress: snapshot_replicate incremental catch-up vs source table size
(the O(delta) claim of the CDF-stream -> CDC-apply composition).

Claims under test (the 100 TB posture):
  1. After the initial sync, a replication run that catches up a
     FIXED-SIZE source delta (one eq upsert + one eq delete) has a wall
     that stays flat as the source table doubles — the CDF stream plans
     O(changed files) partitions and the CDC sink's eq merges read zero
     target data.
  2. A no-change catch-up run (source quiescent) is pure stream
     machinery: flat and small, independent of table size.
  3. The mirror's content converges exactly after every run (spot
     count + anti-join emptiness, not trusted from the machinery).

Run: python scripts/stress_replicate.py [doublings]
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
    snapshot_replicate,
    snapshot_write,
)
from e02_spark.session import get_spark  # noqa: E402


def main() -> int:
    doublings = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("stress-replicate")
    spark.sparkContext.setLogLevel("ERROR")
    rows = 1_000_000
    delta_rows = 5_000
    for step in range(doublings):
        n = rows * (2**step)
        base = tempfile.mkdtemp(prefix="stress_repl_")
        src = os.path.join(base, "src")
        dst = os.path.join(base, "dst")
        ck = os.path.join(base, "ck")
        n_files = max(8, n // 500_000)  # constant ~500k-row files
        snapshot_write(
            spark.range(n).selectExpr("id", "id * 2 AS v"), src,
            mode="overwrite", n_files=n_files,
            cluster_by=["id"], stats_cols=["id"],
        )
        t0 = time.time()
        q = snapshot_replicate(spark, src, dst, on=["id"],
                               checkpoint_dir=ck)
        q.awaitTermination(600)
        sync_wall = time.time() - t0
        # fixed-size delta: one eq upsert + one eq delete on the source
        snapshot_merge(
            spark, src,
            spark.range(0, delta_rows).selectExpr("id", "id * 7 AS v"),
            on=["id"], when_matched="update", insert_not_matched=True,
            strategy="eq", n_files_new=1,
        )
        snapshot_merge(
            spark, src,
            spark.range(n - delta_rows, n).selectExpr("id"),
            on=["id"], when_matched="delete", insert_not_matched=False,
            strategy="eq",
        )
        t0 = time.time()
        q = snapshot_replicate(spark, src, dst, on=["id"],
                               checkpoint_dir=ck)
        q.awaitTermination(600)
        delta_wall = time.time() - t0
        t0 = time.time()
        q = snapshot_replicate(spark, src, dst, on=["id"],
                               checkpoint_dir=ck)
        q.awaitTermination(600)
        idle_wall = time.time() - t0
        # convergence: equal counts and an empty two-sided anti-join
        s = snapshot_read(spark, src)
        d = snapshot_read(spark, dst)
        n_src, n_dst = s.count(), d.count()
        drift = (
            s.join(d, ["id", "v"], "left_anti").limit(1).count()
            + d.join(s, ["id", "v"], "left_anti").limit(1).count()
        )
        print(
            f"rows={n:>9,} files={n_files:>3} | initial sync "
            f"{sync_wall:6.2f}s | delta catch-up {delta_wall:5.2f}s "
            f"({2 * delta_rows:,} change rows) | idle run {idle_wall:5.2f}s"
            f" | converged={n_src == n_dst and drift == 0} "
            f"(src={n_src:,})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
