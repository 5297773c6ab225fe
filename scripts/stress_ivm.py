"""Stress: incremental view maintenance refresh cost vs base-table size.

Claim under test (ops/ivm.py's 100 TB posture): refreshing a maintained
aggregate from a CDF delta costs O(|delta| + files the delta touches +
|aggregate state|) — flat as the BASE table grows AT CONSTANT FILE SIZE
(the production invariant: tables grow in file COUNT, not file size) —
while the naive full recompute grows linearly with the base.

Run: python scripts/stress_ivm.py [max_millions]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import functions as F

from e02_spark.ops.ivm import apply_agg_delta, materialize_agg
from e02_spark.ops.snapshot import snapshot_changes, snapshot_merge, snapshot_read, snapshot_write
from e02_spark.session import get_spark

SUMS = {"v_sum": "v"}
KEYS = ["g"]


def main() -> int:
    max_m = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("stress-ivm")
    spark.sparkContext.setLogLevel("ERROR")
    for n in [m * 1_000_000 for m in (1, max_m // 2, max_m) if m >= 1]:
        table = os.path.join(tempfile.mkdtemp(prefix="stress_ivm_"), "t")
        base = spark.range(n).selectExpr(
            "id", "CAST(id % 1000 AS STRING) AS g", "CAST(id % 97 AS DOUBLE) AS v"
        )
        # constant ~500k-row files: the table grows in file count
        v1 = snapshot_write(base, table, mode="overwrite",
                            n_files=max(2, n // 500_000),
                            cluster_by=["id"], stats_cols=["id"])
        state = materialize_agg(
            snapshot_read(spark, table, version=v1), KEYS, SUMS
        ).persist()
        state.count()
        # a fixed-size delta: 1000 upserts regardless of n
        src = spark.range(0, 100_000, 100).selectExpr(
            "id", "'UPD' AS g", "CAST(-1.0 AS DOUBLE) AS v"
        )
        v2 = snapshot_merge(spark, table, src, on=["id"], strategy="mor")["version"]
        t0 = time.time()
        delta = snapshot_changes(spark, table, v1, v2).drop("id")
        maintained = apply_agg_delta(state, delta, KEYS, SUMS)
        n_groups = maintained.count()
        t_inc = time.time() - t0
        t0 = time.time()
        recompute = materialize_agg(snapshot_read(spark, table), KEYS, SUMS)
        n_re = recompute.count()
        t_full = time.time() - t0
        assert n_groups == n_re
        print(
            f"base={n:>9,d} rows: incremental refresh={t_inc:5.2f}s "
            f"full recompute={t_full:5.2f}s speedup={t_full / t_inc:4.1f}x "
            f"groups={n_groups}"
        )
        state.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
