"""Stress: incremental_corpus_dedup per-batch cost vs corpus growth.

Round-5 verdict finding: the sink recomputed per-doc shingle sizes with a
groupBy over the ENTIRE accumulated shingle corpus every micro-batch, so
per-batch wall grew with corpus size even at fixed per-batch work. The
round-6 design persists (doc_id, n_sh) incrementally and semi-joins the
shingle corpus to colliding doc_ids, so per-batch cost should track
O(batch + collisions), flat as the corpus grows.

This script feeds N equal batches where near-dups occur ONLY within a
batch (a fixed number per batch), so per-batch collision work is constant
while the accumulated corpus grows linearly. It then reports per-batch
durations from the streaming progress log; the verdict's done-condition
is that late batches are not systematically slower than early ones.

Run: python scripts/stress_incdedup_flat.py [n_batches] [docs_per_batch]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from e02_spark.session import get_spark
from e02_spark.streaming.jobs import incremental_corpus_dedup


def main(n_batches: int = 12, docs_per_batch: int = 2000) -> None:
    spark = get_spark("stress_incdedup_flat")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="incdedup_flat_")
    feed = os.path.join(base, "feed")
    state = os.path.join(base, "state")
    os.makedirs(feed)

    # Deterministic text: ~40 distinct words per doc; every 100th doc
    # shares its text with its +1 neighbour (same batch), so each batch
    # carries docs_per_batch/100 planted near-dup pairs and NO cross-batch
    # pairs — collision work per batch is constant by construction.
    for b in range(n_batches):
        lo = b * docs_per_batch
        docs = (
            spark.range(lo, lo + docs_per_batch)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.lit(f"w{j}_"),
                            ((F.col("id") - (F.col("id") % 100 == 1).cast("long"))
                             * 37 + j).cast("string"),
                        )
                        for j in range(40)
                    ],
                ).alias("text"),
            )
        )
        stage = os.path.join(base, f"_w{b}")
        docs.coalesce(1).write.mode("overwrite").parquet(stage)
        (src,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(feed, f"d{b:03d}.parquet")
        os.rename(src, dst)
        shutil.rmtree(stage)
        os.utime(dst, (1_700_000_000 + b * 60,) * 2)

    spark.conf.set("spark.sql.shuffle.partitions", "8")
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = incremental_corpus_dedup(stream, state)
    assert q.awaitTermination(1800), "stream did not finish"

    import json as _json

    progs = [
        p if isinstance(p, dict) else _json.loads(p.json)
        for p in (q.recentProgress or [])
    ]
    durs = [
        (p["batchId"], p["batchDuration"] / 1000.0)
        for p in progs
        if p.get("numInputRows", 0) > 0
    ]
    verdicts = spark.read.parquet(os.path.join(state, "verdicts"))
    n_verdicts = verdicts.count()
    print(f"batches={n_batches} docs/batch={docs_per_batch} "
          f"verdicts={n_verdicts}")
    for bid, sec in durs:
        print(f"  batch {bid:3d}: {sec:6.2f}s")
    if len(durs) >= 6:
        third = len(durs) // 3
        early = sum(s for _, s in durs[:third]) / third
        late = sum(s for _, s in durs[-third:]) / third
        print(f"early-third avg {early:.2f}s  late-third avg {late:.2f}s  "
              f"ratio {late / early:.2f}x")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:3]]
    main(*a)
