"""Data layout for a partitioned lakehouse table: hive-partitioned
writes, dynamic partition overwrite, and small-file compaction.

At 100 TB the table layout IS the query plan's first operator: a scan
that cannot prune partitions reads everything, and a partition made of
10k tiny files pays 10k task/IO setups. Reference analog: the engine's
artifact checkpoints (SURVEY.md A9) generalized to the
partition-directory layout every warehouse sink uses.

Design rules encoded here:
- Writes repartition by the partition columns first, so each output
  partition directory is produced by as few tasks as possible (no
  N-tasks × M-partitions small-file explosion) — `files_per_partition`
  splits a hot partition's write across that many tasks when one task's
  output would be too large.
- Overwrites use DYNAMIC partition overwrite: only partitions present in
  the incoming data are replaced; the rest of the table is untouched —
  the idempotent daily-backfill contract.
- Compaction is a read → repartition-by-partition-cols → dynamic
  overwrite of the touched partitions; contents are preserved exactly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_OVERWRITE_MODE = "spark.sql.sources.partitionOverwriteMode"


def bucketize(col: Column | str, lo: float, hi: float, bits: int = 8) -> Column:
    """Map a numeric column onto the integer grid [0, 2^bits) for Z-order
    interleaving: linear scaling over the caller-supplied [lo, hi] domain
    (domain knowledge or a cheap stats pass), clamped at both ends, NULLs
    to bucket 0. Pure codegen arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    n = 1 << bits
    scaled = F.floor(
        (c.cast("double") - F.lit(float(lo)))
        / F.lit((float(hi) - float(lo)) or 1.0)
        * F.lit(n)
    ).cast("bigint")
    return F.coalesce(
        F.least(F.lit(n - 1), F.greatest(F.lit(0), scaled)), F.lit(0)
    )


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton/Z-order key: bit-interleave `bits`-wide non-negative
    integer bucket columns (see bucketize) into one BIGINT sort key.
    Sorting by it gives every interleaved dimension locality — the
    multi-dimension generalization of the single-column cluster_by:
    a file/row-group covering a contiguous Z range covers a small
    aligned hyper-rectangle of the bucket grid, so min/max stats prune
    scans on ANY clustered dimension, not just the first sort column.

    getbit + shiftleft terms (bits × ncols of them) stay inside
    whole-stage codegen — no UDF. len(cols) * bits must fit a BIGINT
    (<= 62)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if len(cs) * bits > 62:
        raise ValueError(f"{len(cs)} cols x {bits} bits overflows BIGINT")
    terms = [
        F.shiftleft(F.getbit(c, F.lit(i)), i * len(cs) + j)
        for i in range(bits)
        for j, c in enumerate(cs)
    ]
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def zorder_write(
    df: DataFrame,
    path: str,
    zkey: Column,
    n_files: int,
    sort_extra: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as `n_files` parquet files each covering a contiguous
    Z-order range: repartitionByRange on the key assigns each writer
    task one range (ONE range shuffle — same cost class as any global
    sort layout), sortWithinPartitions orders rows inside the file so
    row-group stats carve the range further. At 100 TB this is the
    OPTIMIZE ZORDER BY job table formats run after ingest; n_files sizes
    output to ~128 MB-1 GB each."""
    out = df.repartitionByRange(n_files, zkey).sortWithinPartitions(
        zkey, *(sort_extra or [])
    )
    out.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
    cluster_by: list[str] | None = None,
) -> None:
    """Hive-partitioned parquet write with dynamic partition overwrite.

    Repartitions on the partition columns (optionally salted into
    files_per_partition output tasks per directory) so file count per
    partition directory is controlled, then writes with
    partitionOverwriteMode=dynamic so `mode='overwrite'` replaces ONLY
    the partitions present in `df`.

    cluster_by sorts rows WITHIN each writer task before encoding
    (sortWithinPartitions — no extra shuffle): parquet row-group min/max
    statistics on the clustered columns then carve the file into
    non-overlapping ranges, so a point/range predicate on them skips
    whole row groups at scan time — the poor-man's Z-order that covers
    the single-dimension case exactly.
    """
    spark = df.sparkSession
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    # Spark's default parquet timestamp encoding is the deprecated INT96,
    # which carries NO min/max statistics — clustering by a timestamp
    # would then skip nothing. The layout writer always emits
    # TIMESTAMP_MICROS so every column's row-group stats exist.
    ts_key = "spark.sql.parquet.outputTimestampType"
    old_confs = {
        _OVERWRITE_MODE: spark.conf.get(_OVERWRITE_MODE, "static"),
        coalesce_key: spark.conf.get(coalesce_key, "true"),
        ts_key: spark.conf.get(ts_key, "INT96"),
    }
    keys = [F.col(c) for c in partition_cols]
    # Every conf set and every (eagerly-analyzed) plan construction happens
    # INSIDE the try: an analysis error (e.g. a misspelled cluster column)
    # must not leak a session-wide conf change.
    try:
        if files_per_partition > 1:
            # salt splits a hot partition's rows across N writer tasks.
            # DETERMINISTIC per row (hash of the row's columns), never
            # monotonically_increasing_id: a nondeterministic salt changes
            # on task re-execution after a fetch failure, and rows then
            # land in different shuffle partitions than the partially
            # committed first attempt (duplicate/lost-row corruption).
            # Each (salt, keys) combination hashes to one shuffle
            # partition, so a directory receives at most
            # files_per_partition files — but only if AQE doesn't
            # coalesce the small shuffle back into one task, hence the
            # scoped disable.
            salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                          F.lit(files_per_partition))
            parted = df.repartition(salt, *keys)
            spark.conf.set(coalesce_key, "false")
        else:
            parted = df.repartition(*keys)
        if cluster_by:
            parted = parted.sortWithinPartitions(*cluster_by)
        spark.conf.set(ts_key, "TIMESTAMP_MICROS")
        spark.conf.set(_OVERWRITE_MODE, "dynamic")
        parted.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    finally:
        for key, val in old_confs.items():
            spark.conf.set(key, val)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    where=None,
    cluster_by: list[str] | None = None,
) -> None:
    """Rewrite (a subset of) a partitioned table's directories into
    files_per_partition files each, preserving contents exactly.

    `where` (a Column) SELECTS partitions to compact; it can reference any
    column, but compaction always rewrites WHOLE partitions: the predicate
    picks the distinct partition tuples containing at least one matching
    row, then every row of those partitions is kept via a semi-join — a
    row-level filter fed straight into the dynamic overwrite would
    silently delete every non-matching row in the touched directories.
    Pass cluster_by for tables written with clustering, or the compaction
    shuffle would scramble row order and destroy the row-group min/max
    skipping the clustered write established.

    Durability: the compacted output is STAGED to a sibling temp
    directory first, then swapped into place one partition directory at
    a time, with the old partition parked in a sibling `.compact_backup`
    directory until its swap completes — the source files are never read
    and overwritten in the same job, and nothing transient ever lives
    INSIDE the table (Spark's partition discovery does not skip
    `_`-prefixed directories; a leftover would break every read). A
    failure before the swap leaves the table untouched; a failure
    mid-swap is healed by the next compaction run (missing partitions
    restored from the backup). The earlier design (localCheckpoint
    snapshot + in-place dynamic overwrite) could lose the snapshot with
    a dead executor while the source files were already being replaced —
    unrecoverable. On a real cluster the swap is a cheap filesystem
    rename (or a transactional table format's commit); here it's
    driver-side os.replace over partition directories.
    """
    import glob as _glob
    import os
    import shutil

    # Heal BEFORE reading: a partition parked in the backup by a crashed
    # previous run must be restored first, or this run would read (and
    # compact) the table without it — still no data loss, but the
    # restored partition would silently skip this compaction pass.
    backup_root = path.rstrip("/") + ".compact_backup"
    _heal_from_backup(path, backup_root, len(partition_cols))
    df = spark.read.parquet(path)
    if where is not None:
        touched = df.where(where).select(*partition_cols).distinct()
        df = df.join(touched, partition_cols, "left_semi")
    tmp = path.rstrip("/") + ".compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        write_partitioned(
            df,
            tmp,
            partition_cols,
            files_per_partition=files_per_partition,
            cluster_by=cluster_by,
        )
        # Old partitions are parked in a SIBLING backup directory during
        # their swap — never inside the table: Spark's partition
        # discovery does NOT skip `_`-prefixed directories (a leftover
        # `_old_<col>=v` dir makes every read fail with
        # CONFLICTING_PARTITION_COLUMN_NAMES, found by test), and the
        # backup must also survive the finally-cleanup of `tmp` so a
        # crash mid-swap stays recoverable. Crash windows per partition:
        # before the first replace → table untouched; between the two →
        # dest briefly missing, old data safe in backup (next run
        # restores it); after → both copies exist with identical
        # contents until the backup delete.
        pattern = os.path.join(tmp, *[f"{c}=*" for c in partition_cols])
        for pdir in _glob.glob(pattern):
            rel = os.path.relpath(pdir, tmp)
            dest = os.path.join(path, rel)
            backup = os.path.join(backup_root, rel)
            os.makedirs(os.path.dirname(backup), exist_ok=True)
            shutil.rmtree(backup, ignore_errors=True)
            os.replace(dest, backup)
            os.replace(pdir, dest)
            shutil.rmtree(backup)
        shutil.rmtree(backup_root, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _heal_from_backup(path: str, backup_root: str, depth: int) -> None:
    """Recover from a compaction that crashed mid-swap: any partition
    parked in the backup whose table directory is missing is restored;
    backups whose destination exists are stale duplicates (contents
    identical — compaction preserves rows) and are dropped."""
    import glob as _glob
    import os
    import shutil

    if not os.path.isdir(backup_root):
        return
    pattern = os.path.join(backup_root, *["*=*"] * depth)
    for parked in _glob.glob(pattern):
        rel = os.path.relpath(parked, backup_root)
        dest = os.path.join(path, rel)
        if os.path.exists(dest):
            shutil.rmtree(parked)
        else:
            os.replace(parked, dest)
    shutil.rmtree(backup_root, ignore_errors=True)
