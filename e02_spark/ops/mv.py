"""Persisted incremental MATERIALIZED VIEWS over snapshot tables.

`ops/ivm.py` maintains an aggregate state frame from a change feed but
leaves persistence to the caller; this module closes the loop the way
Databricks DLT / Snowflake MVs do: the maintained state LIVES IN a
snapshot table of its own, and each refresh is one atomic, exactly-once
commit.

    mv_create(spark, src, mv, keys, sums)   full compute at the source's
                                            current version; state +
                                            definition + source-version
                                            CURSOR committed together
    mv_refresh(spark, src, mv)              read the cursor, pull the
                                            source CDF (cursor, latest],
                                            fold it into the stored
                                            state (ops/ivm), overwrite
                                            the MV table with the new
                                            state AND the advanced
                                            cursor in ONE commit
    mv_read(spark, mv)                      presentation projection
                                            (finish_agg) of the stored
                                            state

Why this is crash-safe without a transaction log of its own: the cursor
(`mv_src_version`) rides the SAME manifest commit as the state files
(snapshot_write `properties`), so a crash between "state written" and
"cursor advanced" cannot exist; and the commit is keyed
`mv-refresh-<src_version>`, so an at-least-once re-execution (or a
concurrent duplicate refresher) no-ops against the manifest key set —
the standard exactly-once contract of the snapshot layer. A refresh
that finds the cursor already at the source's latest version returns
without planning anything.

Cost model (the 100 TB posture): refresh = snapshot_changes on the
source (O(changed files)) + one grouped fold of the delta against the
group-sized state (O(delta) shuffle) + an O(state) rewrite of the MV
table — the MV is one row per group, so the rewrite is the small side
by construction. The source is never re-scanned, except that MIN/MAX
measures re-aggregate only the CDF-named dirty groups
(recompute-on-retract, see ops/ivm.py).

Time travel falls out for free: the MV table is an ordinary snapshot
table, so `snapshot_read(spark, mv, version=k)` is the view as of its
k-th refresh, and `snapshot_history` shows the refresh cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .ivm import apply_agg_delta, finish_agg, materialize_agg
from .snapshot import (
    ConcurrentWriteError,
    _read_manifest,
    snapshot_changes,
    snapshot_read,
    snapshot_versions,
    snapshot_write,
)


def _props(mv_table: str, version: int | None = None) -> dict:
    """The MV's definition/cursor properties — from `version`'s manifest
    when pinned (the snapshot-isolated read-modify-write path), else the
    latest. Raises the named not-a-materialized-view error either way."""
    v = snapshot_versions(mv_table)[-1] if version is None else version
    props = _read_manifest(mv_table, v).get("properties") or {}
    if "mv_src_version" not in props:
        raise ValueError(
            f"{mv_table} is not a materialized view (no mv_src_version "
            "property) — create it with mv_create"
        )
    return props


def mv_create(
    spark: SparkSession,
    src_table: str,
    mv_table: str,
    keys: list[str],
    sums: dict[str, str],
    minmax: dict[str, str] | None = None,
    n_files: int = 1,
    version: int | None = None,
) -> int:
    """Materialize the grouped aggregate of `src_table` (one full
    compute at its current version — or at `version`, the historical-
    backfill path: create as-of an old snapshot, then mv_refresh rolls
    the view forward through the CDF) into snapshot table `mv_table`,
    recording the view DEFINITION (keys/sums/minmax — column names, so
    the definition is manifest-JSON round-trippable) and the source
    version cursor in the same commit. Returns the MV's version (1)."""
    for m in (sums, minmax or {}):
        bad = [v for v in m.values() if not isinstance(v, str)]
        if bad:
            raise ValueError(
                f"mv definitions must name measure COLUMNS (got {bad}) — "
                "the definition is persisted in the manifest"
            )
    v = snapshot_versions(src_table)[-1] if version is None else version
    state = materialize_agg(
        snapshot_read(spark, src_table, version=v), keys, sums,
        minmax=minmax,
    )
    # the create key fingerprints the DEFINITION too: re-creating the
    # view with different keys/sums at the same source version must
    # rebuild, not no-op against the old definition's key
    import hashlib
    import json

    fp = hashlib.sha256(
        json.dumps(
            [list(keys), dict(sums), dict(minmax or {})], sort_keys=True
        ).encode()
    ).hexdigest()[:12]
    return snapshot_write(
        state, mv_table, mode="overwrite", n_files=n_files,
        idempotency_key=f"mv-create-{v}-{fp}",
        properties={
            "mv_src_version": v,
            "mv_keys": list(keys),
            "mv_sums": dict(sums),
            "mv_minmax": dict(minmax) if minmax else None,
        },
    )


def mv_refresh(
    spark: SparkSession, src_table: str, mv_table: str, n_files: int = 1,
    max_retries: int = 3,
) -> dict:
    """Advance the MV to the source's latest version by folding the
    source CDF since the stored cursor into the stored state — O(delta),
    never a source re-scan (MIN/MAX dirty groups excepted) — committed
    atomically with the advanced cursor, exactly-once under replay.

    Concurrency: one MV version is pinned up front and the cursor, the
    definition, AND the state frame all read from exactly that version's
    manifest (the snapshot-isolation pattern snapshot_read uses) — two
    separate latest-reads could tear under a concurrent refresher (old
    cursor + new state = the delta double-counted into the fold). The
    commit itself is CAS-guarded on the pinned version
    (snapshot_write expected_version): a refresher that loses the race
    re-pins and re-folds against the winner's state instead of
    overwriting it. Same-target-version duplicates additionally no-op on
    the mv-refresh-<cur> idempotency key (replay fast path).

    Returns {'version', 'refreshed_from', 'refreshed_to', 'noop'}."""
    for _ in range(max_retries):
        mv_v = snapshot_versions(mv_table)[-1]
        props = _props(mv_table, version=mv_v)
        last = props["mv_src_version"]
        keys, sums = props["mv_keys"], props["mv_sums"]
        minmax = props.get("mv_minmax") or None
        cur = snapshot_versions(src_table)[-1]
        if cur == last:
            return {
                "version": mv_v, "refreshed_from": last,
                "refreshed_to": last, "noop": True,
            }
        if cur < last:
            raise ValueError(
                f"source {src_table} is at v{cur}, BEHIND the MV cursor "
                f"v{last} — the source was rolled back or expired past the "
                "cursor; rebuild the view with mv_create"
            )
        delta = snapshot_changes(spark, src_table, last, cur)
        state = snapshot_read(spark, mv_table, version=mv_v)
        new_state = apply_agg_delta(
            state, delta, keys, sums, minmax=minmax,
            base=snapshot_read(spark, src_table, version=cur)
            if minmax
            else None,
        )
        try:
            v = snapshot_write(
                new_state, mv_table, mode="overwrite", n_files=n_files,
                idempotency_key=f"mv-refresh-{cur}",
                properties={**props, "mv_src_version": cur},
                expected_version=mv_v,
            )
        except ConcurrentWriteError:
            continue  # a concurrent refresher advanced the MV: re-pin
        return {
            "version": v, "refreshed_from": last,
            "refreshed_to": cur, "noop": False,
        }
    raise RuntimeError(
        f"mv_refresh lost {max_retries} consecutive refresh races on "
        f"{mv_table}"
    )


def mv_stream(
    spark: SparkSession,
    src_table: str,
    mv_table: str,
    checkpoint_dir: str,
    n_files: int = 1,
    starting_version: int | None = None,
):
    """CONTINUOUS materialized view (the DLT / Snowflake dynamic-table
    shape): ONE live streaming query maintains the MV — the source's
    change-data-feed STREAM (sources/snapshot_cdf_stream) feeds a
    foreachBatch that folds each micro-batch's delta into the stored
    state and commits state + advanced cursor atomically, exactly-once.

    vs mv_refresh (batch cursor polling): the stream's offsets do the
    version bookkeeping, maintenance commits (data_change=false) flow
    through as zero rows, and the delta rows are read ONCE — the batch
    content IS the fold input (micro-batch boundaries align with
    version steps, so a batch is exactly snapshot_changes(cursor, hi]
    plus the _commit_version column).

    Crash/replay convergence, by construction: offsets commit AFTER the
    fold, so an at-least-once re-execution re-presents a batch whose
    `hi` is already at-or-behind the stored cursor — skipped (the
    mv-refresh-<hi> key would no-op the write anyway); a batch
    OVERLAPPING the cursor (the MV advanced out-of-band, e.g. a manual
    mv_refresh raced the stream) raises a named error instead of
    double-folding — restart from a fresh checkpoint, which re-reads
    the cursor. The commit is CAS-guarded on the pinned MV version like
    mv_refresh. The cursor advances to the last DATA-CHANGING version
    folded — a maintenance-only tail (compact/binpack, data_change=
    false) leaves it behind, which is safe: the next window streams
    those steps as zero rows. `starting_version` overrides the stream's
    start (for replay tests); default = the MV's stored cursor. Returns the
    started StreamingQuery (availableNow trigger — invoke per
    maintenance window, or strip the trigger for a long-lived query)."""
    from pyspark.sql import functions as F

    from ..sources.snapshot_cdf_stream import read_snapshot_changes_stream

    start = (
        _props(mv_table)["mv_src_version"]
        if starting_version is None
        else starting_version
    )
    feed = read_snapshot_changes_stream(
        spark, src_table, starting_version=start
    )

    def _fold(batch, batch_id: int) -> None:
        b = batch.persist()
        try:
            # one job answers emptiness AND the version range (and its
            # scan materializes the persist the fold reuses) — the
            # former isEmpty()-then-agg pair scheduled two jobs per
            # micro-batch; MIN/MAX are NULL on an empty frame
            rng = b.agg(
                F.min("_commit_version").alias("lo"),
                F.max("_commit_version").alias("hi"),
            ).first()
            if rng["lo"] is None:
                return
            lo, hi = int(rng["lo"]), int(rng["hi"])
            for _ in range(3):
                mv_v = snapshot_versions(mv_table)[-1]
                p = _props(mv_table, version=mv_v)
                cur = p["mv_src_version"]
                if hi <= cur:
                    return  # replayed batch: already folded
                if lo <= cur:
                    raise ValueError(
                        f"mv_stream: batch range ({lo}, {hi}] overlaps "
                        f"the stored cursor v{cur} — the MV advanced "
                        "out-of-band (manual mv_refresh racing the "
                        "stream?); restart from a fresh checkpoint"
                    )
                state = snapshot_read(spark, mv_table, version=mv_v)
                new_state = apply_agg_delta(
                    state, b.drop("_commit_version"),
                    p["mv_keys"], p["mv_sums"],
                    minmax=p.get("mv_minmax") or None,
                    base=snapshot_read(spark, src_table, version=hi)
                    if p.get("mv_minmax")
                    else None,
                )
                try:
                    snapshot_write(
                        new_state, mv_table, mode="overwrite",
                        n_files=n_files,
                        idempotency_key=f"mv-refresh-{hi}",
                        properties={**p, "mv_src_version": hi},
                        expected_version=mv_v,
                    )
                    return
                except ConcurrentWriteError:
                    continue  # concurrent refresher: re-pin and re-fold
            raise RuntimeError(
                f"mv_stream lost 3 consecutive refresh races on {mv_table}"
            )
        finally:
            b.unpersist()

    return (
        feed.writeStream.foreachBatch(_fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def mv_read(
    spark: SparkSession,
    mv_table: str,
    version: int | None = None,
    count_alias: str = "n_rows",
) -> DataFrame:
    """The view's presentation projection (finish_agg) of the stored
    state — pass `version` to time-travel to an earlier refresh."""
    props = _props(mv_table)
    return finish_agg(
        snapshot_read(spark, mv_table, version=version),
        props["mv_keys"], props["mv_sums"], count_alias=count_alias,
        minmax=props.get("mv_minmax") or None,
    )
