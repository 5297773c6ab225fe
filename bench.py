"""Benchmark harness: times every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_declared_queries_sec", "value": N, "unit": "sec",
   "queries": {"q01...": sec, ...}, "sf": 0.1}

Each query is executed to completion via a count-collect (forces the full
plan without driver-side materialization of result rows).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from e02_spark.queries import all_queries
    from e02_spark.session import get_spark

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    spark = get_spark("e02-bench")
    spark.sparkContext.setLogLevel("WARN")

    qs = all_queries()
    timings: dict[str, float] = {}
    # Warm the JVM + parquet footers once so per-query numbers reflect the
    # query plan, not first-touch session costs.
    qs["q01_pricing_summary"](spark, sf_dir).count()

    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_declared_queries_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    main()
