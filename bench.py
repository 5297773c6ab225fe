"""Benchmark harness: times every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (<1 KB) with `value` first:
  {"metric": "total_declared_queries_sec", "value": N, "unit": "sec",
   "sf": 0.1, "n_queries": K, "queries": {"q01": s, ...}}

`queries` uses the short qNN prefix and 2-decimal rounding to keep the
line small enough for the driver's tail capture (BENCH_r01 was truncated
mid-JSON at ~2.2 KB). Full query names + 3-decimal timings go to
BENCH_DETAIL.json next to this file.

Each query is executed to completion via a count (forces the full plan
without driver-side materialization of result rows).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)

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

    import gc

    # Best-of-N per query (default 2): this box shows transient
    # disk/scheduler noise spikes of 2-5x on individual queries; the min
    # is the standard noise-robust estimator and each run still executes
    # the complete plan cold (caches cleared between runs).
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

    for name, fn in sorted(qs.items()):
        best = float("inf")
        n = 0
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
            # Release state the query pinned (LSH shingle caches, CC
            # localCheckpoint blocks): without this, block-manager memory
            # accumulates across 45 entries and later queries pay the GC
            # bill — and run 2 must re-execute the full plan, not a cache.
            spark.catalog.clearCache()
            gc.collect()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 2)
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(
            {"metric": "total_declared_queries_sec", "value": total, "unit": "sec",
             "sf": sf, "queries": timings},
            f, indent=2,
        )
    short = {name.split("_", 1)[0]: round(t, 2) for name, t in sorted(timings.items())}
    line = json.dumps(
        {"metric": "total_declared_queries_sec", "value": total, "unit": "sec",
         "sf": sf, "n_queries": len(timings), "queries": short},
        separators=(",", ":"),
    )
    if len(line) > 1000:  # belt-and-braces: never exceed the tail capture again
        line = json.dumps(
            {"metric": "total_declared_queries_sec", "value": total, "unit": "sec",
             "sf": sf, "n_queries": len(timings)},
            separators=(",", ":"),
        )
    print(line)
    return 0


if __name__ == "__main__":
    main()
