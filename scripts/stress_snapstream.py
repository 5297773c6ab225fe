"""Stress: snapshot_stream source planning/read cost as the table grows.

Claims under test (the 100 TB posture of sources/snapshot_stream.py):
  1. A drain's cost is O(new data since the last checkpoint), not
     O(table): after N commits are consumed, draining 1 fresh commit
     costs the same whether N was 5 or 80.
  2. Offset planning reads manifests, never data: partitions() wall for
     a 1-commit range stays flat as the version log grows.

Run: python scripts/stress_snapstream.py [n_commits]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from e02_spark.ops.snapshot import snapshot_rows, snapshot_write
from e02_spark.session import get_spark
from e02_spark.sources.snapshot_stream import (
    SnapshotStreamReader,
    read_snapshot_stream,
)


def main() -> int:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    spark = get_spark("stress-snapstream")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="stress_snapstream_")
    a, ck = os.path.join(base, "a"), os.path.join(base, "ck")

    def commit(i: int) -> None:
        snapshot_write(
            spark.range(i * 1000, (i + 1) * 1000).selectExpr(
                "id", "id * 3 AS v"
            ),
            a,
            mode="overwrite" if i == 0 else "append",
        )

    def drain() -> float:
        t0 = time.time()
        q = (
            read_snapshot_stream(spark, a)
            .writeStream.foreachBatch(lambda b, i: b.count())
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination(600)
        return time.time() - t0

    commit(0)
    print(f"warmup drain (1 commit): {drain():.2f}s")
    probe_at = sorted({5, n_commits // 4, n_commits // 2, n_commits})
    done = 1
    for mark in probe_at:
        while done < mark:
            commit(done)
            done += 1
        catch_up = drain()  # consume the backlog
        commit(done)
        done += 1
        incr = drain()  # ONE fresh commit on a log of `mark` versions
        r = SnapshotStreamReader({"table": a})
        t0 = time.time()
        parts = r.partitions({"version": mark - 1}, {"version": mark})
        plan_ms = (time.time() - t0) * 1000
        print(
            f"log={mark:3d} versions: catch-up={catch_up:5.2f}s "
            f"1-commit drain={incr:5.2f}s plan({len(parts)} files)"
            f"={plan_ms:6.1f}ms rows={snapshot_rows(a)}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
