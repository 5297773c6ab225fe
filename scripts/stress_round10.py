"""Stress: the round-10 lakehouse additions at growing scale.

Claims under test (the 100 TB posture):
  1. snapshot_set_partition_spec is O(metadata): its wall stays flat as
     the table doubles (no data IO — one manifest commit).
  2. After a bucket(16) -> bucket(32) evolution, a point probe through
     the spec HISTORY keeps pruning both layouts to a strict file
     subset, and the pruned read stays row-complete — at every size.
  3. snapshot_colocated_join (storage-partitioned join) carries zero
     shuffle exchange in its plan at every size, its result matches the
     naive join, and its wall scales with the DATA, not with an
     all-to-all shuffle (compare the naive join's wall for reference).
  4. snapshot_read(as_of=...) and mv_stream's per-window fold stay
     O(metadata)/O(delta) as history grows: a 40-version history
     resolves an as_of probe in milliseconds.

Run: python scripts/stress_round10.py [doublings]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import functions as F  # noqa: E402

from e02_spark.ops.bucketing import snapshot_colocated_join  # noqa: E402
from e02_spark.ops.snapshot import (  # noqa: E402
    _plan_files,
    _version_times,
    snapshot_read,
    snapshot_set_partition_spec,
    snapshot_write,
    snapshot_versions,
)
from e02_spark.session import get_spark  # noqa: E402


def main(doublings: int = 3) -> None:
    spark = get_spark("stress-round10")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="e02_stress_r10_")
    n0 = 250_000

    for step in range(doublings):
        n = n0 * (2**step)
        ta = os.path.join(root, f"a{step}")
        tb = os.path.join(root, f"b{step}")
        rows = spark.range(n).selectExpr(
            "id", "CAST(id % 100000 AS BIGINT) AS k", "id * 2 AS v"
        )
        dims = spark.range(100_000).selectExpr(
            "id AS k", "CAST(id % 7 AS STRING) AS tag"
        )
        snapshot_write(rows, ta, mode="overwrite", n_files=32,
                       partition_spec=[("bucket", "k", 16)])
        snapshot_write(dims, tb, mode="overwrite", n_files=16,
                       partition_spec=[("bucket", "k", 16)])

        # 1. spec evolution is O(metadata)
        t0 = time.time()
        snapshot_set_partition_spec(ta, [("bucket", "k", 32)])
        t_evolve = time.time() - t0
        snapshot_write(
            spark.range(n, n + n // 4).selectExpr(
                "id", "CAST(id % 100000 AS BIGINT) AS k", "id * 2 AS v"
            ),
            ta, mode="append", n_files=16,
        )

        # 2. mixed-layout probe: prunes, row-complete
        probe = 4217
        t0 = time.time()
        pruned = snapshot_read(
            spark, ta, partition_prune={"k": probe}
        ).where(F.col("k") == probe)
        got = pruned.count()
        t_probe = time.time() - t0
        n_kept = len(pruned.inputFiles())
        n_all = len(_plan_files(ta, None, None)[0])
        want = snapshot_read(spark, ta).where(F.col("k") == probe).count()
        assert got == want > 0, (got, want)
        assert 0 < n_kept < n_all, (n_kept, n_all)

        # 3. SPJ vs naive (bucket(16) table b vs evolved a: rebuild a
        #    16-bucket copy for the join — the join needs equal moduli)
        tc = os.path.join(root, f"c{step}")
        snapshot_write(rows, tc, mode="overwrite", n_files=32,
                       partition_spec=[("bucket", "k", 16)])
        t0 = time.time()
        spj = snapshot_colocated_join(spark, tc, tb, "k")
        plan = spj._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        n_spj = spj.count()
        t_spj = time.time() - t0
        t0 = time.time()
        n_naive = (
            snapshot_read(spark, tc)
            .join(snapshot_read(spark, tb), "k")
            .count()
        )
        t_naive = time.time() - t0
        assert n_spj == n_naive, (n_spj, n_naive)
        # the regime SPJ exists for: the dim side TOO BIG to broadcast
        # whole (at 100 TB it is) — the naive plan then shuffles BOTH
        # sides; measure that as the honest baseline
        thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            t0 = time.time()
            n_shuf = (
                snapshot_read(spark, tc)
                .join(snapshot_read(spark, tb), "k")
                .count()
            )
            t_shuffle = time.time() - t0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        assert n_shuf == n_spj

        # 4. as_of resolution over a deep history
        hist_tbl = os.path.join(root, f"h{step}")
        for i in range(40):
            snapshot_write(
                spark.range(i, i + 1).selectExpr("id", "id AS v"),
                hist_tbl, mode="append" if i else "overwrite", n_files=1,
            )
        mid_ts = _version_times(hist_tbl)[20][1]
        t0 = time.time()
        n_asof = snapshot_read(spark, hist_tbl, as_of=mid_ts).count()
        t_asof = time.time() - t0
        assert n_asof == 21, n_asof
        assert len(snapshot_versions(hist_tbl)) == 40

        print(
            f"n={n:>9,}  evolve={t_evolve:6.3f}s  "
            f"probe={t_probe:5.2f}s kept={n_kept}/{n_all}  "
            f"spj={t_spj:5.2f}s naive-bcast={t_naive:5.2f}s "
            f"naive-shuffle={t_shuffle:5.2f}s rows={n_spj:,}  "
            f"asof40v={t_asof:5.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
