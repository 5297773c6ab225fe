"""Ad-hoc: time selected declared entries cold (bench methodology).

Usage: python scripts/time_entries.py q17_depgraph_core q19_ownership_gate [runs]
"""

from __future__ import annotations

import gc
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from e02_spark.queries import all_queries, reset_shared_state
from e02_spark.session import get_spark


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.isdigit()]
    runs = int(next((a for a in sys.argv[1:] if a.isdigit()), "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("e02-time-entries")
    spark.sparkContext.setLogLevel("WARN")
    qs = all_queries()
    # same warmup as bench.py
    qs["q01_pricing_summary"](spark, sf_dir).count()
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, schema="id long").count()
    for name in names:
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = df.count()
            ts.append(round(time.perf_counter() - t0, 3))
            reset_shared_state(spark)
            gc.collect()
        print(f"{name}: min={min(ts):.3f}s runs={ts} rows={n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
