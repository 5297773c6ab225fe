"""Bloom-filter scale numbers: harvest overhead, point-probe pruning on
an interleaved layout, and merge-candidate narrowing for a CDC trickle.

Layout under test is the ADVERSE one for min/max stats: rows clustered
by a non-key column, so every file's key range spans the whole domain
and range pruning keeps all of them — the case blooms exist for.

Usage: python scripts/stress_bloom.py [rows] [files]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from e02_spark.ops import snapshot as S  # noqa: E402
from e02_spark.session import get_spark  # noqa: E402


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("stress-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="e02_stress_bloom_")

    # interleaved-by-construction: cluster on `other`, key scatters
    df = spark.range(rows).selectExpr(
        "id", "id % 1000 as other", "id * 3 as payload"
    )

    # session warmup so the plain-vs-bloomed commit walls compare code,
    # not first-write JIT/classloading
    S.snapshot_write(df.limit(10_000), os.path.join(root, "warm"),
                     mode="overwrite", n_files=2)

    t0 = time.perf_counter()
    plain = os.path.join(root, "plain")
    S.snapshot_write(df, plain, mode="overwrite", n_files=n_files,
                     cluster_by=["other"], stats_cols=["id"])
    t_plain = time.perf_counter() - t0

    t0 = time.perf_counter()
    tbl = os.path.join(root, "bloomed")
    S.snapshot_write(df, tbl, mode="overwrite", n_files=n_files,
                     cluster_by=["other"], stats_cols=["id"],
                     bloom_cols=["id"])
    t_bloom = time.perf_counter() - t0
    print(
        f"commit {rows} rows / {n_files} files: "
        f"plain {t_plain:.2f}s, bloomed {t_bloom:.2f}s "
        f"(harvest overhead {t_bloom - t_plain:+.2f}s)"
    )

    m = S._read_manifest(tbl, 1)
    entries = S._all_entries(tbl, m)
    bl = [e["bloom"]["id"] for e in entries]
    avg_b64 = sum(len(b[2]) for b in bl) / len(bl)
    print(
        f"filters: m={bl[0][0]} bits k={bl[0][1]}, "
        f"avg {avg_b64 / 1024:.1f} KB b64/file, "
        f"shard overhead {avg_b64 * len(bl) / 1024:.0f} KB total"
    )

    # point probes: 200 present + 200 absent keys
    t0 = time.perf_counter()
    kept_present = [
        len(S._plan_files(tbl, None, ("id", k, k), manifest=m)[0])
        for k in range(0, rows, rows // 200)
    ]
    kept_absent = [
        len(S._plan_files(tbl, None, ("id", rows + k, rows + k),
                          manifest=m)[0])
        for k in range(1, 201)
    ]
    # absent keys INSIDE the domain (ids are dense here, so probe just
    # past the max of each file's range via fractional offsets is moot;
    # use negative keys scaled into range gaps — dense ids have none, so
    # instead measure FPP with keys from a disjoint band written nowhere)
    t_plan = time.perf_counter() - t0
    kp = sum(kept_present) / len(kept_present)
    print(
        f"point probes: present keys keep avg {kp:.1f} files "
        f"(min/max alone would keep ~{len(entries)}); "
        f"400 plans in {t_plan:.2f}s"
    )
    # in-domain absent: delete a key band, keys stay in every file's
    # [min,max] but in no file's content after rewrite
    probe_plain = [
        len(S._plan_files(plain, None, ("id", k, k))[0])
        for k in range(0, rows, rows // 50)
    ]
    print(
        f"no-bloom baseline: same probes keep avg "
        f"{sum(probe_plain) / len(probe_plain):.1f} files"
    )

    # CDC trickle merge: a handful of scattered keys (each key lives in
    # exactly one file; with k keys << files the narrowed candidate set
    # is ~k files instead of all of them)
    n_keys = max(8, n_files // 4)
    keys = spark.range(n_keys).selectExpr(f"id * {rows // n_keys} as id")
    t0 = time.perf_counter()
    S.snapshot_merge(spark, tbl, keys, on=["id"], when_matched="delete",
                     insert_not_matched=False)
    t_mb = time.perf_counter() - t0
    t0 = time.perf_counter()
    S.snapshot_merge(spark, plain, keys, on=["id"], when_matched="delete",
                     insert_not_matched=False)
    t_mp = time.perf_counter() - t0
    src_k0 = [r[0] for r in keys.collect()]
    cands, _ = S._plan_files(tbl, None, ("id", min(src_k0), max(src_k0)),
                             manifest=m)
    narrowed = S._bloom_filter_candidates(
        tbl, m, cands, "id", src_k0, bounds=(min(src_k0), max(src_k0))
    )
    print(
        f"trickle merge ({n_keys} keys): bloomed {t_mb:.2f}s vs plain "
        f"{t_mp:.2f}s; candidates {len(cands)} -> {len(narrowed)} "
        f"after narrowing (v1 manifest). The bloomed-side delta is the "
        f"rewrite re-harvest (executor-distributed above "
        f"{S._HARVEST_DISTRIBUTE_MIN} files); the candidate cut is what "
        f"scales — scan {len(narrowed)} files instead of {len(cands)} "
        f"per trickle batch on remote storage"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
