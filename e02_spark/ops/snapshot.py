"""Manifest-based snapshot table: atomic versioned commits over plain
parquet — the minimal transactional-table-format core (Iceberg/Delta
shape) the layout sinks in this repo otherwise approximate with rename
dances.

Why this exists at 100 TB: directory-listing tables (ops/layout.py) have
three structural gaps a manifest log closes —
  * ATOMICITY: a multi-file write is visible file-by-file as it lands;
    a manifest commit flips the whole snapshot in one atomic
    create-if-absent of `v{N}.json`. Data files without a committed
    manifest are invisible garbage, never half-read tables.
  * SNAPSHOT ISOLATION / TIME TRAVEL: readers resolve a manifest once
    and read exactly its file list; a concurrent compaction or append
    commits a NEW version and disturbs nobody. Old versions stay
    readable until expired.
  * SCAN PLANNING: the manifest records per-file row counts and
    min/max stats for declared columns (harvested from the parquet
    footers at commit time), so a reader prunes files DRIVER-SIDE
    before Spark ever lists or opens them — the manifest is the file
    index, the analog of Iceberg manifest-entry stats.

Storage layout (all under the table root):
    data/<commit-uuid>/part-*.parquet   -- immutable once written
    _manifests/m-<uuid>.json            -- manifest SHARD: one commit's
                                           file entries (path/rows/stats),
                                           immutable once referenced
    _manifests/v{N:012d}.json           -- snapshot N's manifest LIST:
                                           shard refs + per-shard
                                           aggregate stats

Commit protocol: write data files to a fresh `data/<uuid>/` directory,
write ONE new manifest shard holding only this commit's entries, then
publish `_manifests/v{N}.json` with O_EXCL create. Version collisions
(two writers racing to N) make the loser's create fail loudly; an
APPEND loser re-reads the new latest (picking up the winner's shard
refs) and retries at N+1 — optimistic concurrency with rebase, exactly
the Iceberg commit loop. A crash before the list create leaves orphan
data files and an orphan shard that no reader ever sees;
`snapshot_expire(clean_orphans=True)` removes both.

Two-level metadata (the Iceberg manifest-list shape): an append commit
writes O(batch) shard entries plus an O(#shards) list — never the
O(#live-files) full-listing rewrite a single-manifest design pays, so
steady appends stay flat as the table grows. Readers prune at BOTH
levels: a shard whose aggregate [min,max] cannot intersect the probe is
skipped without even opening it, then surviving shards' entries prune
per-file. #shards is #commits since the last overwrite/compaction —
compaction collapses the tree back to one shard. Remaining honesty gap
vs production: Iceberg additionally splits one commit's entries across
partition-aligned shards so a single giant commit also fans out; here a
commit is one shard, fine to ~10^5 files per COMMIT rather than per
table.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import uuid
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

_MANIFESTS = "_manifests"
_DATA = "data"


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, _MANIFESTS, f"v{version:012d}.json")


def snapshot_versions(table: str) -> list[int]:
    """Committed versions, ascending. Ignores anything not matching the
    v{N}.json commit name — tmp files never look like commits."""
    out = []
    for p in _glob.glob(os.path.join(table, _MANIFESTS, "v*.json")):
        stem = os.path.basename(p)[1:-5]
        if stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _read_manifest(table: str, version: int) -> dict:
    with open(_manifest_path(table, version)) as f:
        return json.load(f)


def _write_shard(table: str, entries: list[dict]) -> dict:
    """Write one immutable manifest shard (tmp + rename so a crash never
    leaves a half-written file under a referenced name) and return its
    list-level ref: table-relative path, file/row totals, and per-column
    aggregate bounds. A column gets shard-level bounds only if EVERY
    entry bounds it — otherwise a matching file could hide in the shard
    and shard-skipping would be unsound (per-file pruning still applies
    to the entries that do carry bounds)."""
    mdir = os.path.join(table, _MANIFESTS)
    os.makedirs(mdir, exist_ok=True)
    name = f"m-{uuid.uuid4().hex}.json"
    tmp = os.path.join(mdir, f"tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump({"files": entries}, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(mdir, name))
    stats: dict[str, list] = {}
    if entries:
        cols = set.intersection(*(set(e["stats"]) for e in entries))
        for col in sorted(cols):
            stats[col] = [
                min(e["stats"][col][0] for e in entries),
                max(e["stats"][col][1] for e in entries),
            ]
    return {
        "path": os.path.join(_MANIFESTS, name),
        "n_files": len(entries),
        "rows": sum(e["rows"] for e in entries),
        "stats": stats,
    }


_SHARD_CACHE: OrderedDict[str, list[dict]] = OrderedDict()
# Bounded LRU: a long-lived driver touching many tables/commits must not
# accumulate every shard it ever read.  4096 shards x ~100k entries is far
# beyond any single driver's working set; eviction only costs a re-read.
_SHARD_CACHE_MAX = 4096


def _read_shard(table: str, ref: dict) -> list[dict]:
    """Shards are immutable once referenced, so reads memoize by path —
    expire walks every version's full ref chain (append chains make that
    O(versions x shards) refs but only O(unique shards) actual reads).
    The memo is a bounded LRU (oldest-touched evicted past
    _SHARD_CACHE_MAX) and snapshot_expire evicts deleted shards eagerly.
    Entries are returned by reference: callers must not mutate."""
    path = os.path.abspath(os.path.join(table, ref["path"]))
    hit = _SHARD_CACHE.get(path)
    if hit is None:
        with open(path) as f:
            hit = _SHARD_CACHE[path] = json.load(f)["files"]
        while len(_SHARD_CACHE) > _SHARD_CACHE_MAX:
            _SHARD_CACHE.popitem(last=False)
    else:
        _SHARD_CACHE.move_to_end(path)
    return hit


def _all_entries(table: str, manifest: dict) -> list[dict]:
    out: list[dict] = []
    for ref in manifest["manifests"]:
        out.extend(_read_shard(table, ref))
    return out


def _stat_value(v):
    """Coerce one footer min/max value to a JSON-storable, order-preserving
    form, or None if the type has no such form (the column then simply
    carries no bounds — pruning stays sound, just less effective).

    Whitelist, not best-effort: bool/int/float/str store as-is;
    datetime/date/time store as isoformat STRINGS — ISO-8601 compares
    lexicographically in chronological order (zero-padded fields; a
    seconds-precision value is a prefix of its subsecond refinement, and
    prefix < extension matches chronological <=), so string comparison
    against an equally-coerced probe is correct. Everything else — bytes
    (binary columns), Decimal, nested — returns None; previously bytes
    reached json.dump and raised TypeError AFTER the data files were
    written, orphaning them until expire."""
    if isinstance(v, (bool, int, float, str)):
        return v
    if hasattr(v, "isoformat"):  # datetime.datetime / date / time
        # normalize aware datetimes to naive-UTC first: a '+00:00' suffix
        # would break lexicographic comparison against a naive (session-UTC)
        # probe at exact-boundary instants
        import datetime as _dt

        if isinstance(v, _dt.datetime) and v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    return None


def _probe_value(v):
    """Coerce a prune-probe bound with the same rules as _stat_value so
    temporal probes (datetime/date objects) compare against the stored
    isoformat strings instead of raising TypeError. A probe type we can't
    coerce disables pruning for that call (None bound = keep everything
    on that side), never a crash."""
    return _stat_value(v)


def _harvest_stats(
    files: list[str], stats_cols: list[str], table: str
) -> list[dict]:
    """Per-file entries from the parquet FOOTERS (row count + min/max per
    stats column) — driver-side metadata reads, no Spark job. Column
    chunk stats are aggregated across row groups; a column missing stats
    in any row group — or whose stat type has no JSON-safe ordered
    encoding (see _stat_value) — gets null bounds (reader then cannot
    prune on it, which is the safe direction)."""
    import pyarrow.parquet as pq

    entries = []
    for path in sorted(files):
        meta = pq.ParquetFile(path).metadata
        schema_names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        bounds: dict[str, list] = {}
        for col in stats_cols:
            if col not in schema_names:
                continue
            ci = schema_names.index(col)
            lo = hi = None
            ok = True
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            jlo, jhi = _stat_value(lo), _stat_value(hi)
            if ok and jlo is not None and jhi is not None:
                bounds[col] = [jlo, jhi]
        entries.append(
            {
                # TABLE-relative: the manifest stays valid if the table
                # root moves or the reader's CWD differs from the writer's
                "path": os.path.relpath(path, table),
                "rows": meta.num_rows,
                "stats": bounds,
            }
        )
    return entries


def _try_commit(table: str, version: int, manifest: dict) -> bool:
    """Atomic publish of v{version}: write a tmp file, then hard-link it
    to the final name — link(2) fails with EEXIST if the version is
    already taken (create-if-absent), and the manifest content appears
    fully written or not at all. Returns False on version collision."""
    mdir = os.path.join(table, _MANIFESTS)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f"tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _manifest_path(table, version))
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


def committed_keys(table: str) -> set[str]:
    """Idempotency keys visible at the CURRENT version (see
    snapshot_write's idempotency_key). Each manifest list carries the
    accumulated key set forward (`keys`), so this is ONE manifest read —
    O(1) per micro-batch commit instead of the O(#versions) full-history
    walk that grew linearly over a stream's lifetime. Manifests written
    before the `keys` field existed fall back to that legacy walk."""
    versions = snapshot_versions(table)
    if not versions:
        return set()
    latest = _read_manifest(table, versions[-1])
    if "keys" in latest:
        return set(latest["keys"])
    keys = set()  # legacy manifests: reconstruct from the full history
    for v in versions:
        k = _read_manifest(table, v).get("idempotency_key")
        if k is not None:
            keys.add(k)
    return keys


def snapshot_write(
    df: DataFrame,
    table: str,
    mode: str = "append",
    n_files: int = 1,
    cluster_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    max_retries: int = 10,
    idempotency_key: str | None = None,
    max_files_per_shard: int = 100_000,
) -> int:
    """Write `df` as a new snapshot commit. mode='append' adds the new
    files to the current snapshot's list; mode='overwrite' replaces the
    list (logical truncate-and-load — old files stay on disk for old
    versions until expired).

    The data write happens ONCE into an immutable `data/<uuid>/` dir;
    only the manifest create retries on a version race, and an append
    rebase re-reads the latest manifest so concurrent appends all
    survive (last committer sees every earlier committer's files).
    `n_files` sizes the output; cluster_by range-partitions across files
    and sorts within them so harvested min/max stats are tight AND
    disjoint file-to-file; stats_cols declares which columns get
    manifest-level bounds. max_files_per_shard fans one commit's entries
    across multiple manifest shards (entries are path-ordered = cluster
    order, keeping shard aggregate bounds tight), so even a single giant
    load stays shard-prunable. Returns the committed version number.

    idempotency_key makes the commit EXACTLY-ONCE under at-least-once
    re-execution (the streaming-sink contract): if the accumulated key
    set already carries the key, the write is a no-op returning the
    current version — a replayed micro-batch appends nothing twice.
    The key check re-runs inside the commit retry loop, so a racing
    duplicate that commits first is also caught. Keys are carried
    forward in each manifest list (`keys`), making the check one
    manifest read (O(1) per commit, not O(#versions)) AND surviving
    snapshot_expire of old versions; the set grows one short string per
    keyed commit ever — bytes per commit, and the stream's checkpoint
    offset log fences batches old enough to ever matter truncating."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if idempotency_key is not None and idempotency_key in committed_keys(table):
        return snapshot_versions(table)[-1]
    commit_dir = os.path.join(table, _DATA, uuid.uuid4().hex)
    if cluster_by:
        # range partitioning + in-file sort: per-FILE [min,max] on the
        # cluster key are disjoint (round-robin repartition would smear
        # every file across the full range and defeat stats pruning)
        out = df.repartitionByRange(n_files, *cluster_by)
        out = out.sortWithinPartitions(*cluster_by)
    else:
        out = df.repartition(n_files)
    out.write.mode("error").parquet(commit_dir)
    new_files = _glob.glob(os.path.join(commit_dir, "*.parquet"))
    new_entries = _harvest_stats(new_files, stats_cols or [], table)
    # A giant commit fans out across shards too (the Iceberg behavior):
    # _harvest_stats sorts entries by path = Spark's part-NNNNN order,
    # which under cluster_by's repartitionByRange IS cluster-key order,
    # so per-shard aggregate bounds stay tight and shard-level pruning
    # works WITHIN one commit.
    new_refs = [
        _write_shard(table, new_entries[i : i + max_files_per_shard])
        for i in range(0, max(len(new_entries), 1), max_files_per_shard)
    ]
    for _ in range(max_retries):
        versions = snapshot_versions(table)
        base = versions[-1] if versions else 0
        prev = _read_manifest(table, base) if versions else None
        if prev is not None and "keys" in prev:
            prev_keys = set(prev["keys"])
        else:
            prev_keys = committed_keys(table)  # legacy-manifest fallback
        if idempotency_key is not None and idempotency_key in prev_keys:
            return base  # a racing duplicate committed our key first
        if mode == "append" and prev is not None:
            refs = prev["manifests"] + new_refs
        else:
            refs = new_refs
        if idempotency_key is not None:
            prev_keys.add(idempotency_key)
        manifest = {
            "version": base + 1,
            "mode": mode,
            "stats_cols": sorted(stats_cols or []),
            "idempotency_key": idempotency_key,
            "keys": sorted(prev_keys),
            "manifests": refs,
        }
        if _try_commit(table, base + 1, manifest):
            return base + 1
    raise RuntimeError(
        f"snapshot_write lost {max_retries} consecutive commit races on {table}"
    )


def snapshot_read(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    prune: tuple[str, object, object] | None = None,
) -> DataFrame:
    """Read snapshot `version` (default: latest). The file list comes
    from the manifest — never from directory listing, so uncommitted
    data dirs and files belonging only to other versions are invisible.

    prune=(col, lo, hi) drops files whose manifest [min,max] for `col`
    cannot intersect [lo, hi] BEFORE Spark sees the paths (manifest-level
    scan planning), at both levels: a SHARD whose aggregate bounds miss
    the range is skipped without being opened, then surviving shards'
    entries prune per-file. Files/shards without bounds for the column
    are kept (safe). Pruning is an optimization only — the caller still
    applies its row filter; an empty post-prune list returns an empty
    frame with the table's schema (read from one manifest file path's
    footer)."""
    kept, fallback = _plan_files(table, version, prune)
    if not kept:
        if fallback is None:
            return spark.createDataFrame([], schema="__empty string")
        # preserve schema for an empty (fully pruned) scan
        return spark.read.parquet(fallback).limit(0)
    return spark.read.parquet(*kept)


def _plan_files(
    table: str,
    version: int | None,
    prune: tuple[str, object, object] | None,
    shards_opened: list | None = None,
) -> tuple[list[str], str | None]:
    """Manifest-level scan planning: (pruned file paths, one schema
    fallback path or None if the snapshot is empty). shards_opened, if
    given, collects the shard refs actually loaded — the two-level-prune
    observability hook the tests pin."""
    versions = snapshot_versions(table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    manifest = _read_manifest(table, v)
    if prune is not None:
        # coerce temporal probe bounds to the stored isoformat-string
        # encoding once, up front (see _probe_value); an uncoercible
        # bound becomes None = unbounded on that side
        col, lo, hi = prune[0], _probe_value(prune[1]), _probe_value(prune[2])
    kept: list[str] = []
    for ref in manifest["manifests"]:
        if prune is not None:
            b = ref["stats"].get(col)
            if b is not None and (
                (hi is not None and b[0] > hi) or (lo is not None and b[1] < lo)
            ):
                continue  # whole shard skipped, never opened
        entries = _read_shard(table, ref)
        if shards_opened is not None:
            shards_opened.append(ref["path"])
        for e in entries:
            if prune is not None:
                b = e["stats"].get(col)
                if b is not None and (
                    (hi is not None and b[0] > hi)
                    or (lo is not None and b[1] < lo)
                ):
                    continue
            kept.append(os.path.join(table, e["path"]))
    fallback: str | None = None
    if not kept:
        # schema fallback for a fully-pruned scan: any one entry works —
        # O(1 extra shard read, only on the empty-plan path
        for ref in manifest["manifests"]:
            if ref["n_files"]:
                fallback = os.path.join(
                    table, _read_shard(table, ref)[0]["path"]
                )
                break
    return kept, fallback


def snapshot_rows(table: str, version: int | None = None) -> int:
    """Exact row count from the manifest LIST alone — zero data IO and
    zero shard IO (the COUNT(*) fast path a manifest-backed table
    answers from O(#shards) metadata)."""
    versions = snapshot_versions(table)
    v = (versions[-1] if versions else None) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    return sum(r["rows"] for r in _read_manifest(table, v)["manifests"])


def snapshot_compact(
    spark: SparkSession,
    table: str,
    n_files: int = 1,
    cluster_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Rewrite the CURRENT snapshot into n_files files and commit the
    result as a new overwrite version. Contents are preserved exactly;
    readers of any prior version are untouched (their files are not
    deleted until snapshot_expire) — compaction under snapshot isolation,
    the durable answer to the stage-and-swap dance compact_partitions
    needs on a bare directory table."""
    cur = snapshot_read(spark, table)
    sc = stats_cols
    if sc is None:
        versions = snapshot_versions(table)
        sc = _read_manifest(table, versions[-1]).get("stats_cols", [])
    return snapshot_write(
        cur,
        table,
        mode="overwrite",
        n_files=n_files,
        cluster_by=cluster_by,
        stats_cols=sc,
    )


def snapshot_stream_sink(
    events: DataFrame,
    table: str,
    n_files: int = 1,
    stats_cols: list[str] | None = None,
    checkpoint_dir: str | None = None,
):
    """Structured Streaming sink with EXACTLY-ONCE appends into a
    snapshot table: each micro-batch commits one manifest version keyed
    `batch-<id>`, so an at-least-once re-execution of a batch (crash
    after the data write / manifest commit but before the streaming
    commit) is de-duplicated by the idempotency key instead of by file
    naming conventions. Compare streaming/jobs.partitioned_layout_sink,
    which gets replay safety from per-batch file-name prefixes and
    straddle safety from append-by-move: here BOTH fall out of the
    manifest protocol structurally — a batch is atomically visible, a
    replay is a no-op, concurrent maintenance (compaction) just makes
    its own version. Returns the started StreamingQuery."""

    def _write(batch: DataFrame, batch_id: int) -> None:
        snapshot_write(
            batch,
            table,
            mode="append",
            n_files=n_files,
            stats_cols=stats_cols,
            idempotency_key=f"batch-{batch_id}",
        )

    writer = events.writeStream.foreachBatch(_write).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def _local_path(p: str) -> str:
    """Normalize a Spark file-source `_metadata.file_path` URI (file:///x,
    file:/x) to a plain absolute filesystem path for comparison against
    manifest-derived paths."""
    if p.startswith("file:"):
        p = p[len("file:") :]
    return os.path.abspath(p)


def snapshot_merge(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    on: list[str],
    when_matched: str = "update",
    insert_not_matched: bool = True,
    n_files_new: int = 1,
    cluster_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    max_retries: int = 3,
) -> dict:
    """MERGE `source` into the snapshot table by key columns `on` —
    copy-on-write upsert/delete, the Delta/Iceberg MERGE INTO shape:

      when_matched='update': target rows whose key appears in `source`
        are REPLACED by the source row (full-row upsert);
      when_matched='delete': matched target rows are REMOVED;
      insert_not_matched: source rows matching NO target key are
        INSERTED (the upsert default; delete-mode defaults are set by
        the caller — pass False for a pure delete).

    Why this scales (the whole point at 100 TB — a merge must cost
    O(changed data), never O(table)):
      1. MANIFEST-STATS PRUNE: files whose [min,max] on `on[0]` cannot
         intersect the source's key range are kept WITHOUT being read
         (driver-side, from the manifest alone — no Spark job).
      2. SEMI-JOIN TOUCHED-FILE DISCOVERY: surviving candidate files are
         scanned key-columns-only with `_metadata.file_path`; a join
         against the distinct source keys names exactly the files that
         contain a matched key. Candidates with no hit are kept as-is —
         never rewritten, never even re-read by the rewrite.
      3. SHARD-LEVEL METADATA REUSE: a manifest shard none of whose
         files were touched keeps its EXISTING shard file in the new
         manifest list (zero metadata IO); a partially-touched shard
         gets one replacement shard with its surviving entries. Shard
         aggregate bounds can only tighten by dropping entries, so the
         conservative reuse of the old ref stays prune-sound.
    Only touched files are rewritten: their unmatched rows survive,
    matched rows are replaced/dropped, and inserts append — one write
    into a fresh immutable `data/<uuid>/` dir, committed atomically as a
    new version. A commit race (another writer landed a version first)
    discards the attempt's files (orphans until expire — the Iceberg
    loser's fate) and REPLANS against the new latest snapshot, so a
    merge never clobbers a concurrent append's rows; after `max_retries`
    lost races it raises.

    Semantics notes (both mirrored by the DuckDB twin in queries):
    NULL source keys never match (SQL join semantics) — they delete
    nothing and, when insert_not_matched, land as inserts; duplicate
    source keys under 'update' raise (the MERGE ambiguity error every
    engine throws) — under 'delete' duplicates are harmless and allowed.
    In delete mode `source` may carry the key columns only.

    Returns {'version', 'files_rewritten', 'files_kept', 'files_added',
    'rows_before', 'rows_after'} (row counts from manifest metadata —
    no extra jobs)."""
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    if not on:
        raise ValueError("merge needs at least one key column")
    versions = snapshot_versions(table)
    if not versions:
        if not insert_not_matched:
            raise FileNotFoundError(f"no committed snapshots under {table}")
        v = snapshot_write(
            source, table, mode="overwrite", n_files=n_files_new,
            cluster_by=cluster_by, stats_cols=stats_cols,
        )
        return {
            "version": v, "files_rewritten": 0, "files_kept": 0,
            "files_added": n_files_new, "rows_before": 0,
            "rows_after": snapshot_rows(table, v),
        }

    from pyspark.sql import functions as F

    source = source.persist()
    try:
        target_cols = snapshot_read(spark, table).columns
        if when_matched == "update" or insert_not_matched:
            if set(source.columns) != set(target_cols):
                raise ValueError(
                    f"update/insert merge source columns {sorted(source.columns)} "
                    f"must match target {sorted(target_cols)}"
                )
        elif not set(on) <= set(source.columns):
            raise ValueError(f"delete merge source must carry key columns {on}")
        # One driver agg does double duty: the key-range probe for the
        # manifest-stats prune (None bounds = all-NULL keys = pruning off,
        # still correct) and, in update mode, the MERGE-ambiguity check —
        # count vs count_distinct over the key STRUCT (struct equality
        # groups NULL fields the way groupBy does, so two NULL-key rows
        # still count as duplicates) in the same job instead of a second
        # groupBy pass over the source.
        k0 = on[0]
        aggs = [F.min(k0).alias("lo"), F.max(k0).alias("hi")]
        if when_matched == "update":
            aggs += [
                F.count(F.lit(1)).alias("cnt"),
                F.count_distinct(F.struct(*on)).alias("dcnt"),
            ]
        b = source.agg(*aggs).first()
        if when_matched == "update" and b["cnt"] != b["dcnt"]:
            raise ValueError(
                "merge source has duplicate key rows — 'update' would be "
                "nondeterministic (the standard MERGE ambiguity error)"
            )
        skeys = source.select(*on).distinct()

        for _ in range(max_retries):
            base = snapshot_versions(table)[-1]
            prev = _read_manifest(table, base)
            candidates, _ = _plan_files(table, base, (k0, b["lo"], b["hi"]))
            n_all = sum(r["n_files"] for r in prev["manifests"])
            touched: set[str] = set()
            if candidates:
                cand_keyed = spark.read.parquet(*candidates).select(
                    *on, F.col("_metadata.file_path").alias("_path")
                )
                touched = {
                    _local_path(r["_path"])
                    for r in cand_keyed.join(skeys, on, "left_semi")
                    .select("_path")
                    .distinct()
                    .collect()
                }
            # the rewritten relation: unmatched rows of touched files
            # survive; matched rows are replaced (update: the source row
            # rides in via `adds`) or dropped (delete); inserts are the
            # source rows matching NO candidate key (keys outside the
            # candidate files cannot match — the prune is sound)
            parts = []
            if touched:
                parts.append(
                    spark.read.parquet(*sorted(touched))
                    .join(skeys, on, "left_anti")
                    .select(*target_cols)
                )
            if when_matched == "update":
                adds = source
                if not insert_not_matched:
                    cand_keys = (
                        spark.read.parquet(*candidates).select(*on)
                        if candidates
                        else None
                    )
                    adds = (
                        source.join(cand_keys, on, "left_semi")
                        if cand_keys is not None
                        else source.limit(0)
                    )
                parts.append(adds.select(*target_cols))
            elif insert_not_matched:
                cand_keys = (
                    spark.read.parquet(*candidates).select(*on)
                    if candidates
                    else None
                )
                inserts = (
                    source.join(cand_keys, on, "left_anti")
                    if cand_keys is not None
                    else source
                )
                parts.append(inserts.select(*target_cols))
            if not parts and not touched:
                return {  # provably nothing to do: no matches, no inserts
                    "version": base, "files_rewritten": 0,
                    "files_kept": n_all, "files_added": 0,
                    "rows_before": snapshot_rows(table, base),
                    "rows_after": snapshot_rows(table, base),
                }
            from functools import reduce

            new_rows = reduce(DataFrame.unionByName, parts)
            if cluster_by:
                out = new_rows.repartitionByRange(n_files_new, *cluster_by)
                out = out.sortWithinPartitions(*cluster_by)
            else:
                out = new_rows.repartition(n_files_new)
            commit_dir = os.path.join(table, _DATA, uuid.uuid4().hex)
            out.write.mode("error").parquet(commit_dir)
            sc = prev.get("stats_cols", []) if stats_cols is None else stats_cols
            new_entries = _harvest_stats(
                _glob.glob(os.path.join(commit_dir, "*.parquet")), sc, table
            )
            # metadata rebuild: untouched shards keep their existing file
            touched_rel = {os.path.relpath(p, table) for p in touched}
            refs = []
            for ref in prev["manifests"]:
                entries = _read_shard(table, ref)
                surviving = [e for e in entries if e["path"] not in touched_rel]
                if len(surviving) == len(entries):
                    refs.append(ref)
                elif surviving:
                    refs.append(_write_shard(table, surviving))
            refs.extend(
                _write_shard(table, new_entries[i : i + 100_000])
                for i in range(0, len(new_entries), 100_000)
            )
            manifest = {
                "version": base + 1,
                "mode": "merge",
                "stats_cols": sorted(sc),
                "idempotency_key": None,
                "keys": prev.get("keys", sorted(committed_keys(table))),
                "manifests": refs,
            }
            if _try_commit(table, base + 1, manifest):
                return {
                    "version": base + 1,
                    "files_rewritten": len(touched),
                    "files_kept": n_all - len(touched),
                    "files_added": len(new_entries),
                    "rows_before": snapshot_rows(table, base),
                    "rows_after": snapshot_rows(table, base + 1),
                }
            # lost the race: the snapshot we planned against is stale —
            # this attempt's data files become expire-collectable orphans
            # and the loop replans against the new latest (matched keys /
            # touched files may have changed under us)
        raise RuntimeError(
            f"snapshot_merge lost {max_retries} consecutive commit races on {table}"
        )
    finally:
        source.unpersist()


def snapshot_changes(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int,
    files_read: list | None = None,
) -> DataFrame:
    """Row-accurate change-data-feed between two committed versions:
    returns the table's columns plus `_change_type` ('insert' rows are in
    `to` but not `from`, 'delete' rows the reverse; an update appears as
    its delete+insert pair — the CDF contract of a format without
    row-lineage tracking).

    Scale: data files are immutable, so any file present in BOTH
    versions contributes identical rows to both sides — only files
    ADDED or REMOVED between the versions are read at all, and the
    exceptAll pair cancels rewritten-but-unchanged rows within them.
    Cost is O(changed files), never O(table); `files_read`, if passed,
    collects the file paths actually scanned (the observability hook the
    tests pin that claim on)."""
    from pyspark.sql import functions as F

    versions = snapshot_versions(table)
    for v in (from_version, to_version):
        if v not in versions:
            raise ValueError(f"version {v} not in {versions}")
    a = {
        os.path.abspath(os.path.join(table, e["path"]))
        for e in _all_entries(table, _read_manifest(table, from_version))
    }
    bset = {
        os.path.abspath(os.path.join(table, e["path"]))
        for e in _all_entries(table, _read_manifest(table, to_version))
    }
    added, removed = sorted(bset - a), sorted(a - bset)
    if files_read is not None:
        files_read.extend(added + removed)
    base = snapshot_read(spark, table, version=to_version).limit(0)
    cols = base.columns
    add_df = spark.read.parquet(*added).select(*cols) if added else base
    rem_df = spark.read.parquet(*removed).select(*cols) if removed else base
    ins = add_df.exceptAll(rem_df).withColumn("_change_type", F.lit("insert"))
    dels = rem_df.exceptAll(add_df).withColumn("_change_type", F.lit("delete"))
    return ins.unionByName(dels)


def snapshot_expire(
    table: str, keep_last: int = 1, clean_orphans: bool = False
) -> dict:
    """Garbage collection: drop all but the last `keep_last` manifest
    lists, then delete manifest shards and data files referenced by NO
    surviving list. clean_orphans additionally removes shards/files no
    list EVER referenced (crashed writes). Only run when no in-flight
    writer exists (a real deployment fences by commit-age; orphans
    younger than the oldest in-flight write must be kept — simplified
    here to an explicit flag).
    Returns {'manifests_dropped': n, 'files_deleted': n}."""
    versions = snapshot_versions(table)
    keep = versions[-keep_last:] if keep_last > 0 else []
    dropped = 0
    live: set[str] = set()
    live_shards: set[str] = set()
    for v in keep:
        m = _read_manifest(table, v)
        live_shards.update(
            os.path.abspath(os.path.join(table, r["path"]))
            for r in m["manifests"]
        )
        live.update(
            os.path.abspath(os.path.join(table, e["path"]))
            for e in _all_entries(table, m)
        )
    referenced_dead: set[str] = set()
    dead_shards: set[str] = set()
    for v in versions:
        if v in keep:
            continue
        m = _read_manifest(table, v)
        dead_shards.update(
            os.path.abspath(os.path.join(table, r["path"]))
            for r in m["manifests"]
        )
        referenced_dead.update(
            os.path.abspath(os.path.join(table, e["path"]))
            for e in _all_entries(table, m)
        )
        os.remove(_manifest_path(table, v))
        dropped += 1
    deleted = 0
    victims = referenced_dead - live
    shard_victims = dead_shards - live_shards
    if clean_orphans:
        on_disk = {
            os.path.abspath(p)
            for p in _glob.glob(os.path.join(table, _DATA, "*", "*.parquet"))
        }
        victims |= on_disk - live
        shards_on_disk = {
            os.path.abspath(p)
            for p in _glob.glob(os.path.join(table, _MANIFESTS, "m-*.json"))
        }
        shard_victims |= shards_on_disk - live_shards
    for path in victims:
        if os.path.exists(path):
            os.remove(path)
            deleted += 1
    for path in shard_victims:
        _SHARD_CACHE.pop(path, None)  # deleted shard must not ghost-serve
        if os.path.exists(path):
            os.remove(path)
    # drop commit dirs holding no parquet anymore (only _SUCCESS/.crc
    # write crumbs remain once their data files were collected)
    import shutil

    for d in _glob.glob(os.path.join(table, _DATA, "*")):
        if os.path.isdir(d) and not _glob.glob(os.path.join(d, "*.parquet")):
            shutil.rmtree(d)
    return {"manifests_dropped": dropped, "files_deleted": deleted}
