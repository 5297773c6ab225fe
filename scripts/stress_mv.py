"""Stress: persisted-MV refresh wall vs base table size (the O(delta)
claim of ops/mv.py on top of the in-memory ivm stress).

Claims under test (the 100 TB posture):
  1. After mv_create, a refresh that folds a FIXED-SIZE source delta
     stays flat as the base doubles: CDF is O(changed files), the fold
     is O(delta), and the MV rewrite is O(#groups) — none of them
     O(base).
  2. A quiescent refresh (cursor already at latest) is one manifest
     read: ~0 s, flat.
  3. The refreshed view matches the full recompute after every step
     (asserted, not trusted).

Run: python scripts/stress_mv.py [doublings]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import functions as F  # noqa: E402

from e02_spark.ops.mv import mv_create, mv_read, mv_refresh  # noqa: E402
from e02_spark.ops.snapshot import (  # noqa: E402
    snapshot_merge,
    snapshot_read,
    snapshot_write,
)
from e02_spark.session import get_spark  # noqa: E402


def main() -> int:
    doublings = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("stress-mv")
    spark.sparkContext.setLogLevel("ERROR")
    rows = 1_000_000
    delta_rows = 10_000
    for step in range(doublings):
        n = rows * (2**step)
        base = tempfile.mkdtemp(prefix="stress_mv_")
        src = os.path.join(base, "src")
        mv = os.path.join(base, "mv")
        n_files = max(8, n // 500_000)
        snapshot_write(
            spark.range(n).selectExpr(
                "id", "CAST(id % 32 AS STRING) AS g", "id * 3 AS v"
            ),
            src, mode="overwrite", n_files=n_files,
            cluster_by=["id"], stats_cols=["id"],
        )
        t0 = time.time()
        mv_create(spark, src, mv, ["g"], {"v_sum": "v"})
        create_wall = time.time() - t0
        # fixed-size delta confined to a key band: eq upsert (zero
        # target reads at write; CDF reads only the new/changed files)
        snapshot_merge(
            spark, src,
            spark.range(0, delta_rows).selectExpr(
                "id", "CAST(id % 32 AS STRING) AS g", "id * 9 AS v"
            ),
            on=["id"], when_matched="update", insert_not_matched=True,
            strategy="eq", n_files_new=1,
        )
        t0 = time.time()
        r = mv_refresh(spark, src, mv)
        refresh_wall = time.time() - t0
        t0 = time.time()
        r2 = mv_refresh(spark, src, mv)
        idle_wall = time.time() - t0
        want = {
            (x["g"], x["n"], x["s"])
            for x in snapshot_read(spark, src)
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.round(F.sum(F.col("v").cast("decimal(18,4)")), 4)
                .cast("double")
                .alias("s"),
            )
            .collect()
        }
        got = {
            (x["g"], x["n_rows"], x["v_sum"])
            for x in mv_read(spark, mv).collect()
        }
        print(
            f"rows={n:>9,} files={n_files:>3} | create {create_wall:6.2f}s"
            f" | delta refresh {refresh_wall:5.2f}s ({delta_rows:,} rows"
            f" -> v{r['refreshed_to']}) | idle refresh {idle_wall:5.2f}s"
            f" (noop={r2['noop']}) | matches_recompute={got == want}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
