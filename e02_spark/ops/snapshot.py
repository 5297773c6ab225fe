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
publish `_manifests/v{N}.json` with one atomic create-if-absent through
the table's pluggable store (ops/store.py: link(2) on the local FS,
conditional PUT on an object store — every metadata/commit operation
routes through `store_for(table)`, so the protocol holds on S3
semantics, not just POSIX). Version collisions
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
compaction collapses the tree back to one shard. A single GIANT commit
fans out too (round 13 closed the old one-shard-per-commit honesty
gap): every commit constructor chunks its entries through _write_shards
at _SHARD_MAX_ENTRIES per shard, each shard carrying its own aggregate
bounds — a 10^6-file bulk adoption (snapshot_import_delta of a big
foreign table) writes ~10 bounded shards that shard-level pruning skips
individually, never one mega-shard every read must scan. Remaining
honesty delta vs Iceberg: its shards are partition-ALIGNED; ours are
cluster-order chunks — equally bounded, bounds merely less tight for
unclustered writes.
"""

from __future__ import annotations

import glob as _glob
import os
import threading
import uuid
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

from .store import store_for

_MANIFESTS = "_manifests"
_DATA = "data"
_DELETES = "deletes"


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, _MANIFESTS, f"v{version:012d}.json")


def snapshot_versions(table: str) -> list[int]:
    """Committed versions, ascending. Ignores anything not matching the
    v{N}.json commit name — tmp files never look like commits."""
    out = []
    for p in store_for(table).list_glob(
        os.path.join(table, _MANIFESTS, "v*.json")
    ):
        stem = os.path.basename(p)[1:-5]
        if stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _read_manifest(table: str, version: int) -> dict:
    return store_for(table).get_json(_manifest_path(table, version))


# One commit's entries fan out across manifest shards at this cap (the
# Iceberg behavior): a giant commit (bulk adoption, snapshot_import_delta
# of a big foreign table) writes ceil(n/_SHARD_MAX_ENTRIES) shards, each
# with its own aggregate bounds, so shard-level pruning works WITHIN one
# commit and no reader ever has to open a mega-shard. Every commit
# constructor chunks through _write_shards below.
_SHARD_MAX_ENTRIES = 100_000


def _write_shards(table: str, entries: list[dict]) -> list[dict]:
    """Chunk one commit's entries into bounded shards (>=1 shard even
    when empty: the manifest list's refs anchor schema fallback)."""
    return [
        _write_shard(table, entries[i: i + _SHARD_MAX_ENTRIES])
        for i in range(0, max(len(entries), 1), _SHARD_MAX_ENTRIES)
    ]


def _write_shard(table: str, entries: list[dict]) -> dict:
    """Write one immutable manifest shard (tmp + rename so a crash never
    leaves a half-written file under a referenced name) and return its
    list-level ref: table-relative path, file/row totals, and per-column
    aggregate bounds. A column gets shard-level bounds only if EVERY
    entry bounds it — otherwise a matching file could hide in the shard
    and shard-skipping would be unsound (per-file pruning still applies
    to the entries that do carry bounds)."""
    name = f"m-{uuid.uuid4().hex}.json"
    store_for(table).put_json(
        os.path.join(table, _MANIFESTS, name), {"files": entries}
    )
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
        "bytes": sum(int(e.get("bytes") or 0) for e in entries),
        "stats": stats,
    }


_SHARD_CACHE: OrderedDict[str, list[dict]] = OrderedDict()
# Bounded LRU: a long-lived driver touching many tables/commits must not
# accumulate every shard it ever read.  4096 shards x ~100k entries is far
# beyond any single driver's working set; eviction only costs a re-read.
_SHARD_CACHE_MAX = 4096
# The cache is touched from multiple threads (concurrent merge writers,
# streaming foreachBatch thread + driver maintenance): move_to_end /
# popitem racing an eviction would KeyError without the lock. File reads
# happen OUTSIDE the lock — only the OrderedDict mutation is serialized.
_SHARD_CACHE_LOCK = threading.Lock()


def _read_shard(table: str, ref: dict) -> list[dict]:
    """Shards are immutable once referenced, so reads memoize by path —
    expire walks every version's full ref chain (append chains make that
    O(versions x shards) refs but only O(unique shards) actual reads).
    The memo is a bounded LRU (oldest-touched evicted past
    _SHARD_CACHE_MAX) and snapshot_expire evicts deleted shards eagerly.
    Entries are returned by reference: callers must not mutate."""
    path = os.path.abspath(os.path.join(table, ref["path"]))
    with _SHARD_CACHE_LOCK:
        hit = _SHARD_CACHE.get(path)
        if hit is not None:
            _SHARD_CACHE.move_to_end(path)
            return hit
    hit = store_for(table).get_json(path)["files"]
    with _SHARD_CACHE_LOCK:
        _SHARD_CACHE[path] = hit
        _SHARD_CACHE.move_to_end(path)
        while len(_SHARD_CACHE) > _SHARD_CACHE_MAX:
            _SHARD_CACHE.popitem(last=False)
    return hit


def _all_entries(table: str, manifest: dict, key: str = "manifests") -> list[dict]:
    out: list[dict] = []
    for ref in manifest.get(key, []):
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
    written, orphaning them until expire. A float NaN bound is UNORDERED
    (NaN > x and NaN < x are both false, so _disjoint could never prove
    anything with it — and Python json would emit a non-standard NaN
    literal): the column simply carries no bounds for that file."""
    if isinstance(v, float) and v != v:
        return None  # NaN: unordered, never a usable bound
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


def _bloom_cols(manifest: dict | None) -> list[str]:
    """Bloom-filter columns declared for the table (ops/bloom.py). A
    TABLE PROPERTY — stored in manifest `properties`, so every commit
    constructor, branch adoption, publish, clone, and rollback carries
    it forward without knowing blooms exist."""
    if manifest is None:
        return []
    return list((manifest.get("properties") or {}).get("bloom_cols") or [])


def _col_mapping(manifest: dict | None) -> dict:
    """COLUMN MAPPING for rename support: {logical name: [every former
    physical name still present in live files]}. A table property (see
    _bloom_cols for why properties): every commit constructor, branch,
    publish, clone, and rollback carries it with zero mapping-specific
    code. Empty dict = no renames ever = every read path stays on the
    plain recorded-schema scan."""
    if manifest is None:
        return {}
    return dict(
        (manifest.get("properties") or {}).get("column_mapping") or {}
    )


def _dropped_cols(manifest: dict | None) -> list[str]:
    """Names DROPPED from the recorded schema whose values still exist
    physically in old files — re-adding such a name would silently
    resurrect those values, so snapshot_write refuses it (the field-id
    discipline Iceberg gets from numbering, enforced here by name)."""
    if manifest is None:
        return []
    return list(
        (manifest.get("properties") or {}).get("dropped_cols") or []
    )


def _harvest_one(
    path: str,
    stats_cols: list[str],
    table: str,
    bloom_cols: list[str] | None = None,
) -> dict:
    """Footer → manifest entry for ONE parquet file. Shared verbatim by
    the sequential and the distributed harvest paths so both produce
    byte-identical manifest entries. Column chunk stats are aggregated
    across row groups; a column missing stats in any row group — or
    whose stat type has no JSON-safe ordered encoding (see _stat_value)
    — gets null bounds (reader then cannot prune on it, which is the
    safe direction)."""
    import pyarrow.parquet as pq

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
    entry = {
        # TABLE-relative: the manifest stays valid if the table
        # root moves or the reader's CWD differs from the writer's
        "path": os.path.relpath(path, table),
        "rows": meta.num_rows,
        # on-disk size: feeds byte-based stream admission
        # (maxBytesPerTrigger) and size-aware maintenance planning from
        # the manifest alone; older manifests lack it (readers .get)
        "bytes": os.path.getsize(path),
        "stats": bounds,
    }
    if bloom_cols:
        # per-file point-lookup filters (ops/bloom.py) — unlike the
        # footer-only stats above this reads the declared columns'
        # VALUES, so bloom-bearing tables pay one column read per new
        # file at commit time (where the data was just written; the
        # distributed path keeps it off the driver for bulk commits)
        from .bloom import harvest_blooms

        blooms = harvest_blooms(path, bloom_cols)
        if blooms:
            entry["bloom"] = blooms
    return entry


# Below this file count the commit-plane harvest stays a driver loop; at
# or above it the footer reads fan out to executors so a bulk
# commit/backfill of 10⁵ files doesn't serialize on the driver. The
# threshold is calibrated from scripts/stress_harvest.py: on a local FS
# a footer read is ~0.1 ms and the Spark job costs ~1.5 s fixed, so the
# crossover sits near 10⁴ files; on an object store each footer is a
# ~10-50 ms network round-trip and the crossover drops to ~100 files —
# a remote deployment lowers this constant (module-level, one line)
# when registering its store.
_HARVEST_DISTRIBUTE_MIN = 8192


def _harvest_stats(
    files: list[str],
    stats_cols: list[str],
    table: str,
    bloom_cols: list[str] | None = None,
    spark=None,
) -> list[dict]:
    """Per-file entries from the parquet FOOTERS (row count + min/max
    per stats column). Small commits (the steady state) read footers
    driver-side with no Spark job; a commit at or above
    _HARVEST_DISTRIBUTE_MIN files distributes the footer reads as a
    mapInPandas over the file list — O(files/executors) wall instead of
    O(files) on the driver — and returns IDENTICAL entries (same
    per-file parser, same path sort; pinned by test_layout). The
    collected result is manifest metadata (~100 bytes/file), not data.

    Callers pass the SESSION THEY JUST WROTE WITH (every commit site
    holds one) so distribution never depends on thread-local
    getActiveSession state; a bulk harvest that still ends up without a
    session warns by name instead of silently serializing on the
    driver."""
    files = sorted(files)
    if len(files) >= _HARVEST_DISTRIBUTE_MIN:
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        if spark is not None:
            return _harvest_stats_distributed(
                spark, files, stats_cols, table, bloom_cols
            )
        import warnings

        warnings.warn(
            f"snapshot harvest: {len(files)} files meet the distribute "
            f"threshold ({_HARVEST_DISTRIBUTE_MIN}) but no SparkSession "
            "was passed and none is active on this thread — parquet "
            "footer stats will be read SEQUENTIALLY on the driver. Pass "
            "spark= through the commit call to fan the harvest out.",
            RuntimeWarning,
            stacklevel=2,
        )
    return [_harvest_one(p, stats_cols, table, bloom_cols) for p in files]


def _harvest_stats_distributed(
    spark,
    files: list[str],
    stats_cols: list[str],
    table: str,
    bloom_cols: list[str] | None = None,
) -> list[dict]:
    """Executor-side twin of the sequential harvest: ship the file list,
    parse each footer where the data lives (executors share the table's
    filesystem — the same assumption every scan already makes), return
    JSON-encoded entries, and re-sort by path on the driver so shard
    layout / pruning order is byte-identical to the sequential path."""
    import json as _json

    cols, tbl = list(stats_cols), table
    bcols = list(bloom_cols or [])

    def _part(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "entry": [
                        _json.dumps(
                            _harvest_one(p, cols, tbl, bcols), sort_keys=True
                        )
                        for p in pdf["path"]
                    ]
                }
            )

    n_slices = min(len(files), max(spark.sparkContext.defaultParallelism, 1) * 4)
    rows = (
        spark.createDataFrame([(p,) for p in files], "path string")
        .repartition(n_slices)
        .mapInPandas(_part, "entry string")
        .collect()
    )
    return sorted(
        (_json.loads(r["entry"]) for r in rows), key=lambda e: e["path"]
    )


# --------------------------------------------------------------------------
# Hidden partitioning (Iceberg partition transforms). A PARTITION SPEC is
# a list of transforms — ("bucket", col, n) | ("day", col) |
# ("month", col) | ("truncate", col, w) | ("identity", col) — recorded in
# the manifest. At write time each transform materializes as a HIDDEN
# column (`_pt_*`, derived, excluded from the recorded table schema so
# readers never see it), the write range-clusters on the hidden columns
# first, and footer stats are harvested for them — so the existing
# two-level stats pruning machinery prunes on DERIVED values without the
# query author knowing the layout. The point vs plain min/max stats:
#   * bucket(n, key): point lookups prune to ~1/n of the files even when
#     keys are uniformly scattered (raw key min/max spans everything);
#   * day/month(ts): temporal pruning without per-file timestamp stats,
#     robust to writer-truncated or missing footer stats;
#   * queries filter on the SOURCE column; snapshot_read's
#     partition_prune resolves through the spec (hidden partitioning —
#     the layout can change without rewriting queries).
# Appends inherit the recorded spec automatically (a conflicting spec
# raises), keeping every commit's layout consistent. Maintenance and
# merge rewrites scan with the recorded TABLE schema (hidden columns
# projected away) and RE-DERIVE them via _pt_materialize before
# writing — hidden-first clustering + per-file stats — so the layout
# contract survives compaction, binpack, rewrite-deletes, and merges
# instead of silently degrading to no-bounds files.
# --------------------------------------------------------------------------

_PT_KINDS = ("bucket", "day", "month", "truncate", "identity")


def _pt_name(t) -> str:
    kind, col = t[0], t[1]
    if kind == "bucket":
        return f"_pt_bucket{t[2]}_{col}"
    if kind == "truncate":
        return f"_pt_trunc{t[2]}_{col}"
    return f"_pt_{kind}_{col}"


def _pt_expr(t):
    """Spark expression deriving the hidden partition value. Bucket uses
    crc32 over the UTF-8 of the value's canonical string form — chosen
    because the probe side (driver-side zlib.crc32) produces the
    identical value with no JVM round-trip."""
    from pyspark.sql import functions as F

    kind, col = t[0], t[1]
    if kind == "bucket":
        return F.pmod(
            F.crc32(F.col(col).cast("string").cast("binary")), F.lit(t[2])
        ).cast("int")
    if kind == "day":
        return F.to_date(F.col(col)).cast("string")
    if kind == "month":
        return F.date_format(F.col(col), "yyyy-MM")
    if kind == "truncate":
        return F.substring(F.col(col).cast("string"), 1, t[2])
    if kind == "identity":
        return F.col(col)
    raise ValueError(f"unknown partition transform {kind!r}")


def _pt_str(v) -> str:
    """Driver-side twin of Spark's CAST(col AS STRING) canonical form,
    for the value types bucket/truncate transforms are sensible on:
    int, string, date, bool. Floats and decimals are deliberately NOT
    canonicalized — Java and Python format them differently
    ('1.0E20' vs '1e+20', stored-scale decimals), so bucket/truncate
    probes on such columns would hash a different string than the
    writer did and prune the WRONG files; key those transforms on
    int/string columns."""
    if isinstance(v, bool):
        return "true" if v else "false"  # str(True) would be 'True'
    return str(v)


def _pt_probe(t, v):
    """Driver-side twin of _pt_expr for a prune-probe value. Probe types
    whose driver-side str() form differs from Spark's CAST AS STRING
    (floats, Decimals, fractional-second timestamps — see _pt_str) are
    REJECTED for bucket/truncate: hashing a mismatched string would
    silently prune files that contain matching rows, which is a wrong
    query result, not a degraded one."""
    import datetime as _dt

    if v is None:
        return None
    kind = t[0]
    if kind in ("bucket", "truncate"):
        import decimal

        if isinstance(v, (float, decimal.Decimal)) or (
            isinstance(v, _dt.datetime) and v.microsecond
        ):
            raise TypeError(
                f"partition_prune: {kind} probe on {v!r} "
                f"({type(v).__name__}) is unsupported — driver-side str() "
                "and Spark's CAST AS STRING canonicalize floats/decimals/"
                "fractional-second timestamps differently, so the probe "
                "would prune the WRONG files; key bucket/truncate "
                "transforms on int/string/date/bool columns"
            )
    if kind == "bucket":
        import zlib

        return zlib.crc32(_pt_str(v).encode()) % t[2]
    if kind in ("day", "month"):
        if isinstance(v, _dt.datetime):
            v = v.date()
        s = v.isoformat() if isinstance(v, _dt.date) else str(v)[:10]
        return s[:7] if kind == "month" else s
    if kind == "truncate":
        return _pt_str(v)[: t[2]]
    return v  # identity


def _all_specs(m: dict | None) -> list:
    """Every partition spec the table has ever been written under —
    the accumulated `partition_specs` history plus the current spec.
    Normalized to lists-of-lists (the JSON round-trip form), deduped,
    original order preserved."""
    out = [
        [list(t) for t in s] for s in (m or {}).get("partition_specs") or []
    ]
    cur = (m or {}).get("partition_spec")
    if cur:
        c = [list(t) for t in cur]
        if c not in out:
            out.append(c)
    return out


def _specs_carry(prev: dict | None, new_spec) -> list:
    """The `partition_specs` history a new commit records: the previous
    manifest's history (back-filled from its current spec for legacy
    manifests) plus this commit's spec if novel. Monotone — a spec once
    active is never forgotten, because files written under it may
    survive in the current snapshot and prune only through THEIR hidden
    columns (see snapshot_set_partition_spec)."""
    out = _all_specs(prev)
    if new_spec:
        c = [list(t) for t in new_spec]
        if c not in out:
            out.append(c)
    return out


def _pt_validate(spec) -> list:
    out = []
    for t in spec:
        t = list(t)
        if t[0] not in _PT_KINDS:
            raise ValueError(
                f"unknown partition transform {t[0]!r} (one of {_PT_KINDS})"
            )
        if t[0] in ("bucket", "truncate") and (
            len(t) != 3 or not isinstance(t[2], int) or t[2] <= 0
        ):
            raise ValueError(f"{t[0]} transform needs a positive int arg: {t}")
        out.append(t)
    return out


def _pt_materialize(df: DataFrame, spec):
    """Re-derive the manifest-recorded hidden partition columns on a
    REWRITE of existing rows (compact/binpack/rewrite-deletes/merge):
    rewritten rows come from reads projected to the recorded schema, so
    without this every maintenance pass would drop the hidden values
    from the files it rewrites and silently degrade partition pruning.
    The derived columns are clustered FIRST by every caller (the
    snapshot_write layout contract) and harvested into per-file stats;
    they stay excluded from the recorded schema, so readers never see
    them. Returns (augmented df, hidden column names)."""
    if not spec:
        return df, []
    hidden = []
    for t in _pt_validate(spec):
        name = _pt_name(t)
        hidden.append(name)
        if name not in df.columns:
            df = df.withColumn(name, _pt_expr(t))
    return df, hidden


def _now() -> float:
    """Commit wall-clock source — a seam so tests can simulate clock
    skew / aged commits without patching the global clock."""
    import time as _time

    return _time.time()


def _try_commit(table: str, version: int, manifest: dict) -> bool:
    """Atomic publish of v{version}: one conditional create-if-absent of
    the version object through the table's store (link(2) on the local
    FS, `If-None-Match: *` on an object store — see ops/store.py). The
    manifest appears fully written or not at all; a version collision
    (two writers racing to N) makes the loser's put fail loudly.
    Returns False on collision.

    Every commit is stamped with the committer's wall-clock time (`ts`)
    — the basis for AS OF <timestamp> time travel, history times, and
    retention-by-age expiry. Raw times are stored; READERS clamp them
    monotonically non-decreasing (_version_times), so clock skew
    between writers can never make time travel resolve a LATER version
    for an EARLIER timestamp — the Delta/Iceberg dual
    version/timestamp contract."""
    manifest.setdefault("ts", _now())
    return store_for(table).put_json_if_absent(
        _manifest_path(table, version), manifest
    )


def _version_times(table: str) -> list[tuple[int, float]]:
    """(version, commit time) ascending, with times clamped monotone
    non-decreasing (skew repair at READ time — stored stamps stay raw).
    Manifests predating timestamp stamping inherit the previous
    version's time (0.0 at the head): they sort before every stamped
    commit, which is the conservative direction for AS OF. O(#versions)
    manifest-list reads, zero shard or data IO."""
    out: list[tuple[int, float]] = []
    prev = 0.0
    for v in snapshot_versions(table):
        t = _read_manifest(table, v).get("ts")
        t = prev if t is None else max(prev, float(t))
        out.append((v, t))
        prev = t
    return out


def _resolve_as_of(table: str, as_of) -> int:
    """Resolve an AS OF probe — epoch seconds, datetime, or an ISO-8601
    string — to the LATEST version committed at or before it (clamped
    times). Raises if the probe predates the table's first commit."""
    import datetime as _dt

    if isinstance(as_of, str):
        try:
            as_of = _dt.datetime.fromisoformat(as_of)
        except ValueError:
            # stringified epoch (the option-transport form): "123456.7"
            as_of = float(as_of)
    if isinstance(as_of, _dt.datetime):
        as_of = as_of.timestamp()
    epoch = float(as_of)
    best = None
    for v, t in _version_times(table):
        if t <= epoch:
            best = v
    if best is None:
        raise ValueError(
            f"as_of {as_of!r} predates the first commit of {table}"
        )
    return best


def _resolve_from_ts(table: str, ts) -> int:
    """Resolve an INCLUSIVE change-feed start timestamp: the last
    version whose clamped commit time is strictly BEFORE the probe (0 =
    replay everything), so commits AT or after the timestamp are
    included — the Delta readChangeFeed startingTimestamp contract
    (copying a commit's own time from history resumes FROM that commit,
    not after it). Contrast _resolve_as_of, which answers 'the snapshot
    a reader AT the probe saw' (inclusive of the probe instant)."""
    import datetime as _dt

    if isinstance(ts, str):
        try:
            ts = _dt.datetime.fromisoformat(ts)
        except ValueError:
            ts = float(ts)
    if isinstance(ts, _dt.datetime):
        ts = ts.timestamp()
    epoch = float(ts)
    best = 0
    for v, t in _version_times(table):
        if t < epoch:
            best = v
    return best


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


def _nullable_schema(schema):
    """Top-level-nullable copy of a StructType: the stored table schema
    must admit files that predate a column (explicit-schema reads fill
    the missing column with NULL — a non-nullable field there would lie
    to codegen)."""
    from pyspark.sql.types import StructField, StructType

    return StructType(
        [StructField(f.name, f.dataType, True, f.metadata) for f in schema]
    )


def _evolve_schema(prev_schema: dict | None, df: DataFrame, mode: str):
    """The schema an append/overwrite commits. Overwrite replaces it.
    Append UNION-BY-NAME evolves it: existing columns must keep their
    exact type — OR a type that losslessly widens into the recorded one
    (_WIDEN_OK: a writer still producing int data appends cleanly into
    a long-widened table; the files carry the narrow physical type and
    every reader upcasts at scan, exactly like pre-widening files) —
    genuinely new columns append after the existing ones; columns the
    incoming frame OMITS stay in the schema and read as NULL from the
    new files. Returns a JSON-able dict, or None for appends onto
    legacy manifests that never recorded a schema (their file union
    stays the reader's source of truth)."""
    from pyspark.sql.types import StructType

    if mode != "append":
        return _nullable_schema(df.schema).jsonValue()
    if prev_schema is None:
        return None  # legacy table: the file union stays authoritative
    prev_st = StructType.fromJson(prev_schema)
    by_name = {f.name: f for f in df.schema.fields}
    for f in prev_st.fields:
        nf = by_name.get(f.name)
        if nf is not None and nf.dataType != f.dataType:
            narrow = nf.dataType.typeName()
            if f.dataType.typeName() in _WIDEN_OK.get(narrow, ()):
                continue  # narrower writer into a widened column: fine
            raise ValueError(
                f"schema evolution supports ADDING columns only: column "
                f"{f.name!r} is {f.dataType.simpleString()} in the table "
                f"but {nf.dataType.simpleString()} in the append"
            )
    known = {f.name for f in prev_st.fields}
    out = list(prev_st.fields) + [
        f for f in df.schema.fields if f.name not in known
    ]
    return _nullable_schema(StructType(out)).jsonValue()


class CheckViolation(ValueError):
    """A CHECK constraint rejected rows at commit time (see
    snapshot_set_check)."""


class ConcurrentWriteError(RuntimeError):
    """An expected_version CAS write found the table advanced past the
    version the caller planned against (see snapshot_write). The caller
    re-plans from the new latest version — never retries blindly."""


class ConcurrentModificationError(ConcurrentWriteError):
    """An optimistic commit lost `max_retries` CONSECUTIVE races and gave
    up. Nothing was published: every attempt's data files are orphans the
    next expire collects, and the table sits at whatever the winning
    writers committed.

    ISOLATION CONTRACT (why losing is safe): every mutating op here —
    merge (all three strategies), write, compact, binpack,
    rewrite-deletes, publish — reacts to a lost race by REPLANNING from
    scratch against the new latest snapshot (re-prune, re-scan,
    re-match), never by rebasing its already-planned file set onto the
    winner's manifest. The committed history is therefore SERIALIZABLE:
    equivalent to running the same ops one-at-a-time in commit order.
    Two merges updating the SAME key concurrently have defined winner
    semantics — the later commit's replan reads the earlier commit's row
    and replaces it, so the later writer wins in full and no update is
    lost (strictly stronger than Delta's default WriteSerializable,
    which admits orders no serial execution produces). The one thing NO
    engine's MERGE protects is read-modify-write ABOVE the API: a source
    DataFrame computed from a pre-merge read bakes in the stale read;
    derive merge inputs from the CDF or re-read inside a retry loop.

    Retry guidance: this error means live contention, not corruption —
    back off (jittered sleep), then call the same op again; it replans
    from the current snapshot. Raise max_retries for hot tables, or
    serialize writers through a queue when contention is structural."""


def _validate_checks(
    df: DataFrame, checks: dict | None, schema_json: dict | None, context: str
) -> None:
    """Enforce the manifest's CHECK constraints on rows about to be
    committed: a row violates a check iff the predicate evaluates to
    FALSE (NULL/UNKNOWN passes — SQL CHECK semantics, matching Delta).
    Columns the recorded schema has but `df` omits (add-only evolution's
    NULL backfill) are filled with typed NULLs first, so a check on an
    evolved column passes for pre-evolution writers exactly as it would
    at read time. One column-pruned limit(1) job when checks exist, zero
    jobs when none; raises CheckViolation naming every failed check of
    one violating row."""
    if not checks:
        return
    import operator
    from functools import reduce as _reduce

    from pyspark.sql import functions as F

    if schema_json:
        from pyspark.sql.types import StructType

        have = set(df.columns)
        for f in StructType.fromJson(schema_json).fields:
            if f.name not in have:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    neg = {
        name: ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
        for name, expr in checks.items()
    }
    rows = (
        df.where(_reduce(operator.or_, neg.values()))
        .select([c.alias(name) for name, c in neg.items()])
        .limit(1)
        .collect()
    )
    if rows:
        failed = sorted(name for name in checks if rows[0][name])
        raise CheckViolation(
            f"CHECK constraint violated by {context}: "
            + "; ".join(f"{n!r}: {checks[n]}" for n in failed)
        )


def snapshot_write(
    df: DataFrame,
    table: str,
    mode: str = "append",
    n_files: int = 1,
    cluster_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    max_retries: int = 10,
    idempotency_key: str | None = None,
    max_files_per_shard: int = _SHARD_MAX_ENTRIES,
    partition_spec: list | None = None,
    properties: dict | None = None,
    expected_version: int | None = None,
    bloom_cols: list[str] | None = None,
    target_file_rows: int | None = None,
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
    offset log fences batches old enough to ever matter truncating.

    target_file_rows caps rows per output FILE without a pre-count
    (Spark's maxRecordsPerFile: each of the n_files write partitions
    splits at the cap, keeping cluster order — so a caller who knows
    the right file SIZE but not the incoming VOLUME gets bounded files
    with tight per-file stats instead of guessing n_files; the manifest
    then simply carries more entries).

    bloom_cols declares per-file BLOOM FILTERS (ops/bloom.py) harvested
    into the manifest entries at every file-adding commit — point
    probes and small-key merges then skip files whose filter proves the
    key absent, where raw [min,max] keeps them. A table property: None
    inherits the recorded set, an explicit list re-declares it, []
    clears it.

    expected_version turns the commit into a compare-and-swap: it
    succeeds only if the table is STILL at that version when the commit
    lands, raising ConcurrentWriteError otherwise (after the replay
    fast-path — a replayed keyed commit still no-ops). This is the
    read-modify-write fence derived-state writers (ops/mv.py) need: a
    state computed FROM version N must not overwrite a state someone
    else already advanced past N."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if idempotency_key is not None and idempotency_key in committed_keys(table):
        return snapshot_versions(table)[-1]
    spec = _pt_validate(partition_spec) if partition_spec else None
    versions0 = snapshot_versions(table)
    prev0 = _read_manifest(table, versions0[-1]) if versions0 else None
    prev_spec = prev0.get("partition_spec") if prev0 is not None else None
    # bloom_cols is a table property (see _bloom_cols): None inherits the
    # recorded set — every append and plain overwrite keeps harvesting
    # the filters — and an explicit list (or []) re-declares/clears it,
    # riding this commit's properties merge below.
    eff_bloom = _bloom_cols(prev0) if bloom_cols is None else list(bloom_cols)
    if bloom_cols is not None:
        properties = {**(properties or {}), "bloom_cols": sorted(bloom_cols)}
    # column-mapping discipline (snapshot_rename_column /
    # snapshot_drop_column): an append must not reuse a DROPPED name or
    # a renamed column's former physical name — either would silently
    # resurrect or shadow old files' values on read
    cm0, dc0 = _col_mapping(prev0), _dropped_cols(prev0)
    if mode == "append" and (cm0 or dc0):
        retired = set(dc0) | {o for olds in cm0.values() for o in olds}
        clash = sorted(retired & set(df.columns))
        if clash:
            raise ValueError(
                f"append column(s) {clash} reuse a dropped or renamed-"
                f"away physical name of {table} — old files still carry "
                "values under that name; pick another name, or compact "
                "and truncate-and-load to reset the name history"
            )
    if prev_spec:
        if partition_spec is None:
            # the recorded spec is a TABLE property like checks and
            # properties: both append and truncate-and-load inherit it
            # unless explicitly overridden — an overwrite may CHANGE
            # the spec by passing one, or CLEAR it by passing []
            spec = _pt_validate(prev_spec)
        elif mode == "append" and [list(t) for t in (spec or [])] != [
            list(t) for t in prev_spec
        ]:
            # appends keep every commit's layout consistent; a
            # conflicting (or clearing) explicit spec is an error
            raise ValueError(
                f"append partition_spec {spec} conflicts with the "
                f"table's recorded spec {prev_spec}"
            )
    hidden = [_pt_name(t) for t in spec] if spec else []
    aug = df
    for t in spec or []:
        aug = aug.withColumn(_pt_name(t), _pt_expr(t))
    cluster = (hidden + list(cluster_by or [])) if spec else (cluster_by or [])
    commit_dir = os.path.join(table, _DATA, uuid.uuid4().hex)
    if cluster:
        # range partitioning + in-file sort: per-FILE [min,max] on the
        # cluster key are disjoint (round-robin repartition would smear
        # every file across the full range and defeat stats pruning);
        # hidden partition columns cluster FIRST so derived-value
        # pruning gets tight, near-single-valued per-file bounds
        out = aug.repartitionByRange(n_files, *cluster)
        out = out.sortWithinPartitions(*cluster)
    else:
        out = aug.repartition(n_files)
    writer = out.write.mode("error")
    if target_file_rows is not None:
        if target_file_rows <= 0:
            raise ValueError(
                f"target_file_rows must be positive, got {target_file_rows}"
            )
        writer = writer.option("maxRecordsPerFile", int(target_file_rows))
    writer.parquet(commit_dir)
    new_files = _glob.glob(os.path.join(commit_dir, "*.parquet"))
    new_entries = _harvest_stats(
        new_files, (stats_cols or []) + hidden, table, eff_bloom,
        spark=df.sparkSession,
    )
    # A giant commit fans out across shards too (the Iceberg behavior):
    # _harvest_stats sorts entries by path = Spark's part-NNNNN order,
    # which under cluster_by's repartitionByRange IS cluster-key order,
    # so per-shard aggregate bounds stay tight and shard-level pruning
    # works WITHIN one commit.
    new_refs, stamped_seq = None, None
    vdf, validated_checks = None, None
    for _ in range(max_retries):
        versions = snapshot_versions(table)
        base = versions[-1] if versions else 0
        # entries carry the committing version as their data SEQUENCE
        # number (the Iceberg shape): equality deletes apply only to
        # rows in files with seq < the delete's seq, so shards are
        # (re)written inside the loop — a lost race re-stamps at the
        # new version (the stale attempt's shards become orphans).
        if stamped_seq != base + 1:
            for e in new_entries:
                e["seq"] = base + 1
            new_refs = [
                _write_shard(table, new_entries[i : i + max_files_per_shard])
                for i in range(0, max(len(new_entries), 1), max_files_per_shard)
            ]
            stamped_seq = base + 1
        prev = _read_manifest(table, base) if versions else None
        if prev is not None and "keys" in prev:
            prev_keys = set(prev["keys"])
        else:
            prev_keys = committed_keys(table)  # legacy-manifest fallback
        if idempotency_key is not None and idempotency_key in prev_keys:
            return base  # a racing duplicate committed our key first
        if expected_version is not None and base != expected_version:
            raise ConcurrentWriteError(
                f"snapshot_write expected {table} at v{expected_version} "
                f"but it is at v{base} — a concurrent commit advanced the "
                "table; re-plan against the new latest version"
            )
        # re-validate the partition-spec contract against THIS attempt's
        # manifest: the data files were laid out (hidden columns, cluster
        # order) for the spec resolved BEFORE the loop, so a racing commit
        # that changed or cleared the recorded spec makes this attempt's
        # layout stale — committing it would silently revert the table's
        # layout contract. Only an overwrite carrying an EXPLICIT spec is
        # exempt (it legitimately replaces whatever the spec now is).
        if not (mode == "overwrite" and partition_spec is not None):
            cur_spec = prev.get("partition_spec") if prev is not None else None
            if [list(t) for t in (cur_spec or [])] != [
                list(t) for t in (spec or [])
            ]:
                raise ValueError(
                    f"snapshot_write lost a partition-spec race on {table}: "
                    f"data was laid out for spec {spec} but v{base} now "
                    f"records {cur_spec}; re-run the write"
                )
        checks = prev.get("checks") if prev is not None else None
        if mode == "append" and prev is not None:
            refs = prev["manifests"] + new_refs
            # tombstones ride along: an append must not resurrect rows a
            # prior merge-on-read delete tombstoned; equality deletes
            # likewise (they cannot touch the new files anyway — those
            # carry seq = base+1, above every existing delete's seq)
            del_refs = prev.get("deletes", [])
            eq_refs = prev.get("eq_deletes", [])
            sch = _evolve_schema(prev.get("schema"), df, "append")
        else:
            refs = new_refs
            del_refs = []  # overwrite replaces content, tombstones and all
            eq_refs = []
            sch = _evolve_schema(None, df, "overwrite")
        # CHECK enforcement on the rows being committed: validated over
        # the WRITTEN files (column-pruned scan of the new parquet, one
        # input pass total — never a second pass over df's lineage);
        # re-validated only if a racing set_check changed the check set.
        # A violation raises pre-commit; the written dir is an orphan
        # for snapshot_expire. The backfill schema is the schema this
        # commit RECORDS, so an overwrite that drops a checked column
        # fails HERE (unresolved column — the write that breaks the
        # constraint is the one rejected) instead of poisoning every
        # later append.
        if checks and checks != validated_checks:
            if vdf is None:
                vdf = df.sparkSession.read.parquet(commit_dir)
            _validate_checks(
                vdf, checks, sch,
                f"snapshot_write(mode={mode!r}) into {table}",
            )
            validated_checks = checks
        if idempotency_key is not None:
            prev_keys.add(idempotency_key)
        # a rename/drop racing this write invalidates the names this
        # write's files and stats were produced under — raise (the
        # partition-spec-race posture), never commit stale names
        if mode == "append" and (
            _col_mapping(prev) != cm0 or _dropped_cols(prev) != dc0
        ):
            raise ValueError(
                f"snapshot_write lost a column rename/drop race on "
                f"{table}: the schema's name history moved while this "
                "append was staged; re-run the write"
            )
        base_props = dict((prev or {}).get("properties") or {})
        if mode == "overwrite":
            # truncate-and-load replaces CONTENT: no old files survive,
            # so the name history resets with them (stale mapping
            # entries keyed like new columns would mis-coalesce reads)
            base_props.pop("column_mapping", None)
            base_props.pop("dropped_cols", None)
        manifest = {
            "version": base + 1,
            "mode": mode,
            "stats_cols": sorted(stats_cols or []),
            "idempotency_key": idempotency_key,
            "keys": sorted(prev_keys),
            "manifests": refs,
            "deletes": del_refs,
            "eq_deletes": eq_refs,
            "partition_spec": spec,
            "partition_specs": _specs_carry(prev, spec),
            "refs": (prev or {}).get("refs"),
            "schema": sch,
            # constraints survive overwrite too (table property, not
            # content — the Delta behavior for truncate-and-load)
            "checks": checks,
            # free-form table properties: carried forward like checks,
            # with this write's `properties` dict MERGED on top — the
            # update rides the SAME atomic commit as the data, which is
            # what lets a consumer (e.g. ops/mv.py's refresh cursor)
            # record "state as of source version N" crash-safely
            "properties": {**base_props, **(properties or {})} or None,
        }
        if _try_commit(table, base + 1, manifest):
            return base + 1
    raise ConcurrentModificationError(
        f"snapshot_write lost {max_retries} consecutive commit races on {table}"
    )


def snapshot_read(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    prune: tuple[str, object, object] | list | None = None,
    partition_prune: dict | None = None,
    as_of=None,
    tag: str | None = None,
) -> DataFrame:
    """Read snapshot `version` (default: latest). The file list comes
    from the manifest — never from directory listing, so uncommitted
    data dirs and files belonging only to other versions are invisible.

    as_of — epoch seconds, a datetime, or an ISO-8601 string — reads
    the table AS OF that wall-clock instant: the latest version whose
    (monotone-clamped) commit timestamp is <= the probe. `tag` reads
    the version a named tag points at (snapshot_tag). version / as_of /
    tag are mutually exclusive.

    prune=(col, lo, hi) — or a LIST of such triples, ANDed — drops files
    whose manifest [min,max] for `col` cannot intersect [lo, hi] BEFORE
    Spark sees the paths (manifest-level scan planning), at both levels:
    a SHARD whose aggregate bounds miss the range is skipped without
    being opened, then surviving shards' entries prune per-file.
    Files/shards without bounds for the column are kept (safe). A POINT
    probe (lo == hi) additionally tests per-file bloom filters when the
    table declares bloom_cols (snapshot_write) — files whose filter
    proves the key absent are dropped even when their raw [min,max]
    spans it. Pruning
    is an optimization only — the caller still applies its row filter;
    an empty post-prune list returns an empty frame with the table's
    schema (read from one manifest file path's footer).

    partition_prune={source_col: value | (lo, hi)} prunes on the
    table's HIDDEN partition transforms (see the partition-spec block):
    the probe is resolved through the recorded spec to the derived
    column — e.g. {"k": 42} on a bucket(16, k) table prunes to the
    files containing bucket crc32("42")%16, and {"ts": (a, b)} on a
    day(ts) table prunes by day strings. Bucket transforms accept point
    probes only (a hash range is meaningless). The query author never
    names the hidden column — the layout can change without rewriting
    callers (hidden partitioning).

    Snapshots carrying positional delete files (merge-on-read commits)
    get the tombstones subtracted here via one anti-join — see
    _apply_deletes. Tombstones aimed at files this prune dropped are
    inert in the anti-join (their _file never appears on the probe
    side), so pruning and DV application compose without coordination.

    Snapshot isolation holds under concurrent commits: the version is
    resolved and its manifest read exactly ONCE, and the file plan,
    schema, and delete vectors all derive from that single committed
    manifest object — a commit landing mid-read can never mix its
    tombstones or schema into the older file list (torn snapshot)."""
    versions = snapshot_versions(table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    if sum(x is not None for x in (version, as_of, tag)) > 1:
        raise ValueError("pass at most one of version / as_of / tag, not both")
    if as_of is not None:
        version = _resolve_as_of(table, as_of)
    if tag is not None:
        refs = _read_manifest(table, versions[-1]).get("refs") or {}
        if tag not in refs:
            raise _no_tag_error(tag, refs)
        version = refs[tag]
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    m = _read_manifest(table, v)
    preds = [] if prune is None else (
        [prune] if isinstance(prune, tuple) else list(prune)
    )
    for col, pv in (partition_prune or {}).items():
        # resolve the probe through EVERY spec the table has ever been
        # written under (partition-spec evolution): a file prunes only
        # through the hidden columns IT carries — files laid out under a
        # retired spec respond to that spec's predicate, files under the
        # current one to the current predicate, and a file carrying
        # neither is kept (safe). The predicates are ANDed, which is
        # sound because no file carries stats for two specs' hidden
        # columns derived from different layouts of the same write.
        ts = [
            t
            for s in (_all_specs(m) or [m.get("partition_spec") or []])
            for t in s
            if t[1] == col
        ]
        seen: set[str] = set()
        ts = [t for t in ts if not (
            _pt_name(t) in seen or seen.add(_pt_name(t))
        )]
        if not ts:
            raise ValueError(
                f"partition_prune column {col!r} has no transform in any "
                f"of the table's partition specs {_all_specs(m)}"
            )
        cur_names = {
            _pt_name(t) for t in (m.get("partition_spec") or [])
        }
        for t in ts:
            # a probe a RETIRED transform cannot express (range probe on
            # a bucket, a float on truncate) is SKIPPED — that layout's
            # files simply stay unpruned, which is safe. Only the
            # CURRENT spec's transform rejecting the probe is a caller
            # error worth raising.
            try:
                if isinstance(pv, tuple):
                    if t[0] == "bucket":
                        raise ValueError(
                            "bucket transforms take point probes only — "
                            "a hash range is meaningless"
                        )
                    lo, hi = pv
                else:
                    lo = hi = pv
                preds.append(
                    (_pt_name(t), _pt_probe(t, lo), _pt_probe(t, hi))
                )
            except (TypeError, ValueError):
                if _pt_name(t) in cur_names:
                    raise
                # zero resolved transforms = zero predicates: no-prune
    kept, fallback = _plan_files(table, v, preds or None, manifest=m)
    sch = m.get("schema")
    if sch is not None:
        from pyspark.sql.types import StructType

        sch = StructType.fromJson(sch)
    if not kept:
        if sch is not None:
            return spark.createDataFrame([], schema=sch)
        if fallback is None:
            return spark.createDataFrame([], schema="__empty string")
        # preserve schema for an empty (fully pruned) scan
        return spark.read.parquet(fallback).limit(0)
    # the manifest schema — not the file union — is the read contract:
    # files that predate an added column serve NULL for it (explicit-
    # schema parquet reads fill missing columns), so add-only schema
    # evolution needs no file rewrite and no mergeSchema footer sweep;
    # _live_rows then subtracts both delete flavors (positional DVs,
    # equality deletes) in metadata-sized broadcast anti-joins
    dv = _dv_frame(spark, table, m)
    return _live_rows(spark, table, m, kept, dv)


def _stat_lookup(stats: dict, col: str, aliases: dict):
    """Bounds (or bloom) for `col` under its logical name or — when the
    table carries a column mapping — any former physical name. A file
    records the column under exactly one of the names, so the first hit
    is THE answer."""
    b = stats.get(col)
    if b is not None:
        return b
    for old in aliases.get(col, ()):
        b = stats.get(old)
        if b is not None:
            return b
    return None


def _bloom_keep(entry: dict, eq_probes: list, aliases: dict) -> bool:
    """File-level bloom test for point probes: False only when some
    probed column's filter PROVES the value absent. Entries or columns
    without a filter are kept (safe — same direction as missing
    bounds). Probe values must be the column's own value type, the same
    contract the min/max comparison already imposes."""
    bl = entry.get("bloom")
    if not bl:
        return True
    from .bloom import bloom_maybe_contains

    for col, v in eq_probes:
        b = _stat_lookup(bl, col, aliases)
        if b is not None and not bloom_maybe_contains(b, v):
            return False
    return True


# Merge-candidate bloom narrowing collects the source's distinct leading
# keys driver-side; above this count the collect is refused and planning
# stays on range pruning alone (bulk merges prune fine by range — it is
# the small CDC trickle whose keys scatter across the whole domain that
# needs per-file membership).
_BLOOM_MERGE_KEYS_CAP = 1024


def _bloom_filter_candidates(
    table: str,
    manifest: dict,
    candidates: list[str],
    col: str,
    values: list,
    bounds: tuple | None = None,
) -> list[str]:
    """Drop candidate files whose bloom PROVES none of `values` present.
    Files without a filter survive. `bounds` is the (lo, hi) range the
    candidates were planned under: shards whose aggregate stats are
    disjoint from it hold no candidates and are skipped UNOPENED, so
    this pass opens exactly the shards the range plan already did (and
    hits its LRU cache); each surviving file then costs one bloom
    decompress for the whole value set."""
    from .bloom import bloom_maybe_contains_any

    lo = hi = None
    if bounds is not None:
        lo, hi = _probe_value(bounds[0]), _probe_value(bounds[1])
    aliases = _col_mapping(manifest)
    cand = set(candidates)
    drop: set[str] = set()
    for ref in manifest["manifests"]:
        b = _stat_lookup(ref.get("stats") or {}, col, aliases)
        if b is not None and (
            (hi is not None and b[0] > hi) or (lo is not None and b[1] < lo)
        ):
            continue  # no candidate can live in a range-disjoint shard
        for e in _read_shard(table, ref):
            p = os.path.join(table, e["path"])
            if p not in cand:
                continue
            bf = _stat_lookup(e.get("bloom") or {}, col, aliases)
            if bf is not None and not bloom_maybe_contains_any(bf, values):
                drop.add(p)
    return [p for p in candidates if p not in drop]


def _plan_files(
    table: str,
    version: int | None,
    prune: tuple[str, object, object] | None,
    shards_opened: list | None = None,
    manifest: dict | None = None,
    bloom_dropped: list | None = None,
) -> tuple[list[str], str | None]:
    """Manifest-level scan planning: (pruned file paths, one schema
    fallback path or None if the snapshot is empty). `prune` is one
    (col, lo, hi) triple or a list of them (ANDed — a shard/file is
    dropped when ANY predicate is provably disjoint). shards_opened, if
    given, collects the shard refs actually loaded — the two-level-prune
    observability hook the tests pin. Callers that already hold a pinned
    committed manifest pass it via `manifest` so the plan derives from
    exactly that version (snapshot isolation: no second latest-resolve
    that a racing commit could tear)."""
    if manifest is None:
        versions = snapshot_versions(table)
        if not versions:
            raise FileNotFoundError(f"no committed snapshots under {table}")
        v = versions[-1] if version is None else version
        if v not in versions:
            raise ValueError(f"version {v} not in {versions}")
        manifest = _read_manifest(table, v)
    preds = []
    eq_probes = []  # (col, RAW value): bloom hashing needs the original
    # type (a datetime coerced to its isoformat string would hash under
    # the wrong type tag and "prove" a present key absent)
    if prune is not None:
        # coerce temporal probe bounds to the stored isoformat-string
        # encoding once, up front (see _probe_value); an uncoercible
        # bound becomes None = unbounded on that side
        for p in [prune] if isinstance(prune, tuple) else prune:
            preds.append((p[0], _probe_value(p[1]), _probe_value(p[2])))
            if p[1] is not None and p[1] == p[2]:
                eq_probes.append((p[0], p[1]))

    aliases = _col_mapping(manifest)  # renamed cols: probe old names too

    def _disjoint(stats: dict) -> bool:
        for col, lo, hi in preds:
            b = _stat_lookup(stats, col, aliases)
            if b is not None and (
                (hi is not None and b[0] > hi) or (lo is not None and b[1] < lo)
            ):
                return True
        return False

    kept: list[str] = []
    for ref in manifest["manifests"]:
        if preds and _disjoint(ref["stats"]):
            continue  # whole shard skipped, never opened
        entries = _read_shard(table, ref)
        if shards_opened is not None:
            shards_opened.append(ref["path"])
        for e in entries:
            if preds and _disjoint(e["stats"]):
                continue
            # point probes additionally test the entry's bloom filters
            # (ops/bloom.py): a "no" is definitive — the file cannot
            # contain the key — where its raw [min,max] would keep it
            if eq_probes and not _bloom_keep(e, eq_probes, aliases):
                if bloom_dropped is not None:
                    bloom_dropped.append(e["path"])
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
    answers from O(#shards) metadata). Tombstone rows subtract exactly:
    every DV commit enforces (file, pos) uniqueness against the existing
    tombstone set, and data-file-dropping ops drop the tombstones aimed
    at them, so data-rows minus delete-rows IS the live count."""
    versions = snapshot_versions(table)
    v = (versions[-1] if versions else None) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    m = _read_manifest(table, v)
    if m.get("eq_deletes"):
        raise ValueError(
            f"snapshot_rows: v{v} of {table} carries EQUALITY deletes — "
            f"a key may delete zero or many rows, so the metadata count "
            f"is not derivable; run snapshot_rewrite_deletes to restore "
            f"it, or count via snapshot_read"
        )
    return sum(r["rows"] for r in m["manifests"]) - sum(
        r["rows"] for r in m.get("deletes", [])
    )


def snapshot_agg(
    table: str, col: str | None = None, version: int | None = None
) -> dict:
    """Metadata-only aggregates — zero data IO: exact COUNT(*) from the
    manifest list (see snapshot_rows), and exact MIN/MAX for `col` when
    they are provably derivable from file stats alone: every data file
    must carry bounds for the column AND the snapshot must carry no
    tombstones (a positional delete could hide exactly the extreme row,
    so min/max stop being metadata-answerable until a rewrite folds the
    DVs — the same honesty rule Iceberg's scan-level agg pushdown
    applies). Returns {'rows', 'min', 'max', 'exact_bounds'}: min/max
    are None with exact_bounds=False when not derivable; callers then
    fall back to a scan.

    Caveat carried from parquet itself: footer min/max for LONG string
    values may be writer-truncated (a truncated max is a valid bound but
    not the exact MAX); fixed-width types — ints, floats, dates,
    timestamps — are always exact. Declare stats_cols accordingly."""
    versions = snapshot_versions(table)
    v = (versions[-1] if versions else None) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    m = _read_manifest(table, v)
    if m.get("eq_deletes"):
        # neither the count nor the bounds are metadata-derivable under
        # equality deletes (a key may hide rows anywhere) — the Iceberg
        # agg-pushdown honesty rule, extended to COUNT(*)
        return {"rows": None, "min": None, "max": None,
                "exact_bounds": False}
    out = {
        "rows": snapshot_rows(table, v),
        "min": None,
        "max": None,
        "exact_bounds": False,
    }
    if col is None:
        return out
    if m.get("deletes"):
        return out
    lo = hi = None
    for e in _all_entries(table, m):
        if e["rows"] == 0:
            continue  # an empty file bounds nothing and hides nothing
        b = e["stats"].get(col)
        if b is None:
            return out  # a boundless file could hide either extreme
        lo = b[0] if lo is None else min(lo, b[0])
        hi = b[1] if hi is None else max(hi, b[1])
    if lo is not None:
        out.update({"min": lo, "max": hi, "exact_bounds": True})
    return out


def snapshot_compact(
    spark: SparkSession,
    table: str,
    n_files: int = 1,
    cluster_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    max_retries: int = 3,
    zorder_by: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Rewrite the CURRENT snapshot into n_files files and commit the
    result as a new overwrite version. Contents are preserved exactly;
    readers of any prior version are untouched (their files are not
    deleted until snapshot_expire) — compaction under snapshot isolation,
    the durable answer to the stage-and-swap dance compact_partitions
    needs on a bare directory table.

    zorder_by lays the rewrite out on a Morton key over the named
    numeric columns instead of a linear sort (the Iceberg
    rewrite_data_files strategy='z-order' / Delta OPTIMIZE ZORDER BY):
    each output file covers a contiguous Z range = a small aligned
    hyper-rectangle of the bucket grid, so the harvested manifest
    [min,max] stats prune point/range probes on EVERY interleaved
    dimension — where cluster_by prunes only its leading column. The
    bucket domains come from the manifest's existing per-file bounds
    when every entry carries them (zero extra jobs; deletes only widen
    the domain, which merely coarsens bucketing) and from one agg over
    the live rows otherwise. zorder_by columns are added to the
    harvested stats_cols so the pruning they exist for actually works.
    Mutually exclusive with cluster_by.

    Optimistic like every other maintenance op: base is captured INSIDE
    the retry loop and a lost commit race re-reads and rewrites against
    the new latest version — a concurrent append landing between
    compact's read and its commit is picked up by the replan, never
    silently dropped by a stale overwrite bumping the version number."""
    if zorder_by and cluster_by:
        raise ValueError("zorder_by and cluster_by are mutually exclusive")
    for _ in range(max_retries):
        base = snapshot_versions(table)[-1]
        prev = _read_manifest(table, base)
        sc = stats_cols if stats_cols is not None else prev.get("stats_cols", [])
        if zorder_by:
            sc = sorted(set(sc) | set(zorder_by))
        # bloom_cols here DECLARES (or clears, with []) the table's bloom
        # property in the same pass that harvests the filters — the
        # natural way to retrofit blooms onto an existing table without a
        # content commit; None keeps whatever the table already declares
        bc = _bloom_cols(prev) if bloom_cols is None else list(bloom_cols)
        props = prev.get("properties")
        if bloom_cols is not None:
            props = {**(props or {}), "bloom_cols": sorted(bloom_cols)}
        cur = snapshot_read(spark, table, version=base)
        cur, hidden = _pt_materialize(cur, prev.get("partition_spec"))
        if zorder_by:
            from pyspark.sql import functions as F

            from .layout import bucketize, zorder_key

            bounds: dict[str, tuple[float, float]] = {}
            entries = _all_entries(table, prev)
            for c in zorder_by:
                per_file = [
                    (e.get("stats") or {}).get(c) for e in entries
                ]
                if per_file and all(b is not None for b in per_file):
                    bounds[c] = (
                        float(min(b[0] for b in per_file)),
                        float(max(b[1] for b in per_file)),
                    )
            missing = [c for c in zorder_by if c not in bounds]
            if missing:
                row = cur.agg(
                    *[F.min(c).alias(f"lo_{c}") for c in missing],
                    *[F.max(c).alias(f"hi_{c}") for c in missing],
                ).first()
                for c in missing:
                    lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
                    bounds[c] = (
                        float(lo if lo is not None else 0),
                        float(hi if hi is not None else 0),
                    )
            zk = zorder_key(
                [bucketize(c, *bounds[c]) for c in zorder_by]
            )
            out = cur.repartitionByRange(n_files, *hidden, zk)
            out = out.sortWithinPartitions(*hidden, zk)
        elif cluster_by or hidden:
            keys = hidden + list(cluster_by or [])
            out = cur.repartitionByRange(n_files, *keys)
            out = out.sortWithinPartitions(*keys)
        else:
            out = cur.repartition(n_files)
        commit_dir = os.path.join(table, _DATA, uuid.uuid4().hex)
        out.write.mode("error").parquet(commit_dir)
        new_entries = _harvest_stats(
            _glob.glob(os.path.join(commit_dir, "*.parquet")),
            list(sc) + hidden, table, bc, spark=out.sparkSession,
        )
        for e in new_entries:
            e["seq"] = base + 1
        refs = _write_shards(table, new_entries)
        manifest = {
            "version": base + 1,
            "mode": "overwrite",
            # content-preserving maintenance: CDF consumers skip this
            # version step entirely (the Delta dataChange=false shape)
            "data_change": False,
            "stats_cols": sorted(sc),
            "idempotency_key": None,
            "keys": prev.get("keys", sorted(committed_keys(table))),
            "manifests": refs,
            "deletes": [],  # both delete flavors folded into the rewrite
            "eq_deletes": [],
            "partition_spec": prev.get("partition_spec"),
            "partition_specs": _specs_carry(prev, None),
            "refs": prev.get("refs"),
            "schema": prev.get("schema"),
            "checks": prev.get("checks"),
            "properties": props,
        }
        if _try_commit(table, base + 1, manifest):
            return base + 1
        # lost the race: this attempt's files are expire-collectable
        # orphans; replan against the new latest snapshot
    raise ConcurrentModificationError(
        f"snapshot_compact lost {max_retries} consecutive commit races on {table}"
    )


def snapshot_binpack(
    spark: SparkSession,
    table: str,
    target_rows: int,
    small_fraction: float = 0.75,
    cluster_by: list[str] | None = None,
    max_retries: int = 3,
) -> dict:
    """Targeted small-file compaction (the Iceberg binpack rewrite): data
    files holding fewer than small_fraction * target_rows rows are read,
    any tombstones aimed at them folded in, and their rows rewritten as
    ~target_rows-sized files; every file already at a healthy size keeps
    its manifest entry byte-for-byte. This is the steady-state answer to
    streaming-ingest file sprawl — each micro-batch appends one small
    file, and a periodic binpack touches ONLY the sprawl, never the
    accumulated bulk, so maintenance cost tracks ingest rate instead of
    table size (contrast snapshot_compact's whole-table rewrite).
    Tombstones aimed at untouched files survive untouched. Returns
    {'version', 'files_rewritten', 'files_added', 'rows_rewritten'}
    (version unchanged, zero counts, when nothing qualifies — a single
    small file also doesn't qualify unless tombstones make rewriting it
    productive)."""
    threshold = max(1, int(target_rows * small_fraction))
    for _ in range(max_retries):
        base = snapshot_versions(table)[-1]
        prev = _read_manifest(table, base)
        dv = _dv_frame(spark, table, prev)
        tombed: set[str] = set()
        if dv is not None:
            tombed = {
                r["_file"] for r in dv.select("_file").distinct().collect()
            }
        small = [
            e
            for e in _all_entries(table, prev)
            if e["rows"] < threshold or e["path"] in tombed
        ]
        # one lonely small file with no tombstones: rewriting it buys
        # nothing — the no-op guard that keeps periodic maintenance cheap
        if len(small) <= 1 and not any(e["path"] in tombed for e in small):
            return {
                "version": base, "files_rewritten": 0,
                "files_added": 0, "rows_rewritten": 0,
            }
        touched_rel = {e["path"] for e in small}
        rows_in = sum(e["rows"] for e in small)
        # _live_rows folds positional tombstones AND equality deletes
        # into the rewrite — the repacked files' new seq exempts their
        # surviving rows from the old eq files, so both must apply here
        surv = _live_rows(
            spark, table, prev,
            sorted(os.path.join(table, p) for p in touched_rel), dv,
        )
        n_out = max(1, -(-rows_in // target_rows))  # ceil
        surv, hidden = _pt_materialize(surv, prev.get("partition_spec"))
        if cluster_by or hidden:
            keys = hidden + list(cluster_by or [])
            out = surv.repartitionByRange(n_out, *keys)
            out = out.sortWithinPartitions(*keys)
        else:
            out = surv.repartition(n_out)
        commit_dir = os.path.join(table, _DATA, uuid.uuid4().hex)
        out.write.mode("error").parquet(commit_dir)
        sc = prev.get("stats_cols", [])
        new_entries = _harvest_stats(
            _glob.glob(os.path.join(commit_dir, "*.parquet")),
            list(sc) + hidden, table, _bloom_cols(prev),
            spark=out.sparkSession,
        )
        for e in new_entries:
            e["seq"] = base + 1  # eq deletes were folded into the rewrite
        refs = []
        for ref in prev["manifests"]:
            entries = _read_shard(table, ref)
            surviving = [e for e in entries if e["path"] not in touched_rel]
            if len(surviving) == len(entries):
                refs.append(ref)
            elif surviving:
                refs.append(_write_shard(table, surviving))
        if new_entries:
            refs.extend(_write_shards(table, new_entries))
        # tombstones on rewritten files were folded in; the rest carry.
        # every tombstoned file qualified as `small`, so the survivor set
        # is provably empty — deletes reset without a probe job.
        # Equality deletes carry untouched (they still shadow the
        # not-rewritten files; the repacked files' new seq exempts them).
        manifest = {
            "version": base + 1,
            "mode": "binpack",
            "data_change": False,  # content-preserving: CDF-silent step
            "stats_cols": sorted(sc),
            "idempotency_key": None,
            "keys": prev.get("keys", sorted(committed_keys(table))),
            "manifests": refs,
            "deletes": [],
            "eq_deletes": prev.get("eq_deletes", []),
            "partition_spec": prev.get("partition_spec"),
            "partition_specs": _specs_carry(prev, None),
            "refs": prev.get("refs"),
            "schema": prev.get("schema"),
            "checks": prev.get("checks"),
            "properties": prev.get("properties"),
        }
        if _try_commit(table, base + 1, manifest):
            return {
                "version": base + 1,
                "files_rewritten": len(touched_rel),
                "files_added": len(new_entries),
                "rows_rewritten": rows_in,
            }
    raise ConcurrentModificationError(
        f"snapshot_binpack lost {max_retries} consecutive commit races on {table}"
    )


def snapshot_rewrite_deletes(
    spark: SparkSession,
    table: str,
    n_files_new: int = 1,
    cluster_by: list[str] | None = None,
    max_retries: int = 3,
) -> dict:
    """Minor compaction: fold the current snapshot's delete files — BOTH
    flavors — back into the data by rewriting ONLY the affected data
    files (live rows survive, deleted rows drop) and committing a
    version with no delete files. Affected means: positionally
    tombstoned, or subject to an equality delete (lower sequence number
    AND manifest stats that could intersect the delete's key range —
    provably-disjoint files are skipped). Untouched files — the
    overwhelming majority on a large table — keep their existing
    manifest shards byte-for-byte. This is the maintenance half of the
    merge-on-read bargain: deletes stay O(matched rows) (positional) or
    O(source) (equality) at write time, and ONE targeted pass per
    maintenance window restores anti-join-free reads and metadata row
    counts; contrast snapshot_compact, which rewrites the whole table.
    Returns {'version', 'files_rewritten', 'files_added',
    'tombstones_removed', 'eq_files_removed'} (version unchanged and
    zero counts when the snapshot carries no deletes of either kind)."""
    for _ in range(max_retries):
        base = snapshot_versions(table)[-1]
        prev = _read_manifest(table, base)
        dv = _dv_frame(spark, table, prev)
        eqs = _eq_entries(table, prev)
        if dv is None and not eqs:
            return {
                "version": base, "files_rewritten": 0, "files_added": 0,
                "tombstones_removed": 0, "eq_files_removed": 0,
            }
        n_tombs = sum(r["rows"] for r in prev.get("deletes", []))
        # driver-side list of affected files: positionally-tombstoned
        # ones (bounded by files touched since the last rewrite) plus
        # eq-affected ones (older seq, stats not provably disjoint from
        # the eq key bounds — the eq entry carries [min,max] of its key)
        touched = set()
        if dv is not None:
            touched.update(
                r["_file"] for r in dv.select("_file").distinct().collect()
            )
        for e in _all_entries(table, prev):
            if e["path"] in touched:
                continue
            for q in eqs:
                if int(e.get("seq", 0)) >= int(q["seq"]):
                    continue
                k = q["on"][0]
                qb = q["stats"].get(k)
                eb = e["stats"].get(k)
                if qb is not None and eb is not None and (
                    eb[0] > qb[1] or eb[1] < qb[0]
                ):
                    continue  # provably no key of this delete in the file
                touched.add(e["path"])
                break
        touched_rel = sorted(touched)
        sc = prev.get("stats_cols", [])
        new_entries: list[dict] = []
        if touched_rel:
            surv = _live_rows(
                spark, table, prev,
                [os.path.join(table, p) for p in touched_rel], dv,
            )
            surv, hidden = _pt_materialize(
                surv, prev.get("partition_spec")
            )
            if cluster_by or hidden:
                keys = hidden + list(cluster_by or [])
                out = surv.repartitionByRange(n_files_new, *keys)
                out = out.sortWithinPartitions(*keys)
            else:
                out = surv.repartition(n_files_new)
            commit_dir = os.path.join(table, _DATA, uuid.uuid4().hex)
            out.write.mode("error").parquet(commit_dir)
            new_entries = _harvest_stats(
                _glob.glob(os.path.join(commit_dir, "*.parquet")),
                list(sc) + hidden, table, _bloom_cols(prev),
                spark=out.sparkSession,
            )
            for e in new_entries:
                e["seq"] = base + 1  # both delete flavors folded in
        # touched_rel CAN be empty with eq files present (every data file
        # provably disjoint or newer): the commit below still drops the
        # now-inert eq refs — a metadata-only cleanup
        touched_set = set(touched_rel)
        refs = []
        for ref in prev["manifests"]:
            entries = _read_shard(table, ref)
            surviving = [e for e in entries if e["path"] not in touched_set]
            if len(surviving) == len(entries):
                refs.append(ref)
            elif surviving:
                refs.append(_write_shard(table, surviving))
        if new_entries:
            refs.extend(_write_shards(table, new_entries))
        manifest = {
            "version": base + 1,
            "mode": "rewrite_deletes",
            "data_change": False,  # content-preserving: CDF-silent step
            "stats_cols": sorted(sc),
            "idempotency_key": None,
            "keys": prev.get("keys", sorted(committed_keys(table))),
            "manifests": refs,
            "deletes": [],
            "eq_deletes": [],
            "partition_spec": prev.get("partition_spec"),
            "partition_specs": _specs_carry(prev, None),
            "refs": prev.get("refs"),
            "schema": prev.get("schema"),
            "checks": prev.get("checks"),
            "properties": prev.get("properties"),
        }
        if _try_commit(table, base + 1, manifest):
            return {
                "version": base + 1,
                "files_rewritten": len(touched_rel),
                "files_added": len(new_entries),
                "tombstones_removed": n_tombs,
                "eq_files_removed": sum(1 for _ in eqs),
            }
    raise ConcurrentModificationError(
        f"snapshot_rewrite_deletes lost {max_retries} consecutive commit races on {table}"
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


def snapshot_cdc_sink(
    changes: DataFrame,
    table: str,
    on: list[str],
    op_col: str | None = None,
    dedup_by: str | list[str] | None = None,
    drop_cols: list[str] | None = None,
    strategy: str = "eq",
    n_files_new: int = 1,
    cluster_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    checkpoint_dir: str | None = None,
    app_id: str | None = None,
    auto_fold_rows: int | str | None = "auto",
    merge_schema: bool = False,
):
    """Structured Streaming CDC-APPLY sink: maintain a snapshot table as
    the materialization of a change stream (the Debezium/Delta
    `applyChanges` shape) with EXACTLY-ONCE application end to end.

    Each micro-batch applies as at most two idempotent merges keyed by
    the batch id:
      1. rows whose `op_col` is 'delete' -> snapshot_merge
         when_matched='delete' on the key columns  (commit_key
         cdc-<id>-d),
      2. every other row -> snapshot_merge when_matched='update',
         insert_not_matched=True — the upsert leg  (commit_key
         cdc-<id>-u).
    With strategy='eq' (the default) both legs are O(batch): the delete
    leg writes one key-valued eq-delete file, the upsert leg one
    eq-delete file + the batch's rows as new data files — ZERO target
    reads per batch, CDC ingest at its write floor; readers absorb the
    outstanding deletes via the broadcast anti-join until
    snapshot_rewrite_deletes folds them. An at-least-once re-execution
    (crash after either leg's manifest commit but before the streaming
    commit) is de-duplicated per leg by the commit keys: the replayed
    leg no-ops against the manifest key set, the unapplied leg applies —
    so the table converges to exactly-once regardless of where the
    crash landed.

    `dedup_by` names a monotone ordering column — or a LIST of columns,
    compared lexicographically — (an LSN / source timestamp / a
    (_commit_version, is-insert) pair for CDF feeds): the batch is
    compacted to the LAST event per key before the split, so a key
    upserted then deleted inside one batch nets to its final op (ties
    on (key, dedup_by) are a source-feed defect and nondeterministic
    here, as everywhere). Without it, a key appearing in both legs nets
    to the upsert (deletes apply first); feeds that interleave ops per
    key within a batch should pass dedup_by.
    `op_col`/`dedup_by`/`drop_cols` are CDC transport metadata and are
    dropped before the merge — the remaining columns must match the
    target schema. Empty batches and empty legs commit nothing. A
    mixed-op FIRST batch bootstraps the table with one empty overwrite
    commit so the delete leg runs (and records its key) instead of
    being skipped on "table doesn't exist" — a skip decided by table
    existence would not be replay-stable across a crash between legs.

    Key-scoping contract (the Delta txnAppId analogue): commit keys
    default to `cdc-<batch_id>-*`, which is correct exactly when ONE
    logical feed owns the table — a restart from the SAME checkpoint
    resumes batch numbering, and a rerun of the same feed from a fresh
    checkpoint re-derives the same batches, so the no-op on a seen key
    is the exactly-once dedup working as intended. If the table can see
    a DIFFERENT feed whose batch ids restart from 0 (a second source, a
    fresh checkpoint over genuinely new data), pass `app_id` to scope
    the keys `cdc-<app_id>-<batch_id>-*` per feed — otherwise the new
    feed's early batches would collide with the old keys and be
    silently dropped as replays.

    AUTO-FOLD (the maintenance invariant, self-enforced): after each
    batch the sink checks the table's outstanding delete state (total
    rows across DV + eq-delete files, straight off the manifest — zero
    reads) and runs snapshot_rewrite_deletes when it reaches
    `auto_fold_rows` ('auto' = half the CDF driver-shipping cap). The
    fold is a data_change=false commit, so downstream CDF consumers see
    a silent maintenance step, never churned rows — a long-running eq
    CDC feed keeps its read-side anti-join state bounded without a
    human ever running maintenance. Pass None to disable (a scheduled
    snapshot_optimize then owns folding), or an int threshold. A crash
    between the fold and the streaming commit is safe: the replayed
    batch's legs no-op on their keys and the fold re-evaluates against
    the already-folded (empty) delete state.

    merge_schema=True passes through to the upsert leg: a feed that
    starts carrying a NEW column mid-stream auto-adds it to the table
    (add-only, NULL-backfilled history — see snapshot_merge) instead of
    failing the batch; downstream CDF streams keep flowing (add-only
    evolution never trips their pin-relative fences).

    Returns the started StreamingQuery."""

    kp = f"cdc-{app_id}-" if app_id is not None else "cdc-"
    if auto_fold_rows == "auto":
        from ..sources.snapshot_cdf_stream import _DELETE_ROWS_CAP

        auto_fold_rows = _DELETE_ROWS_CAP // 2

    def _apply(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        spark = batch.sparkSession
        raw = batch.persist()  # keep the handle: unpersist must target
        batch = raw            # the CACHED frame, not a derived plan
        try:
            order_cols = (
                [dedup_by] if isinstance(dedup_by, str) else list(dedup_by or [])
            )
            if order_cols:
                w = Window.partitionBy(*on).orderBy(
                    *[F.col(c).desc() for c in order_cols]
                )
                batch = (
                    batch.withColumn("_cdc_rn", F.row_number().over(w))
                    .where(F.col("_cdc_rn") == 1)
                    .drop("_cdc_rn")
                )
            meta = [
                c
                for c in [op_col, *order_cols, *(drop_cols or [])]
                if c is not None
            ]
            if op_col is not None:
                is_del = F.col(op_col) == F.lit("delete")
                dels = batch.where(is_del).select(*on)
                ups = batch.where(~F.coalesce(is_del, F.lit(False))).drop(
                    *meta
                )
            else:
                is_del = F.lit(False)
                dels, ups = None, batch.drop(*meta)
            # ONE job decides all three emptiness branches (empty batch,
            # empty delete leg, empty upsert leg) — the former
            # isEmpty()/isEmpty()/isEmpty() triple scheduled three jobs
            # per micro-batch for the same information. The agg runs on
            # the compacted frame (n_keys == 0 iff the raw batch was
            # empty: compaction keeps one row per key) and its scan also
            # materializes the persist the merge legs reuse.
            leg_counts = batch.agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(F.when(is_del, 1).otherwise(0)).alias("n_del"),
            ).first()
            n_keys = leg_counts["n_keys"]
            n_del = int(leg_counts["n_del"] or 0)
            if n_keys == 0:
                return
            # first-batch bootstrap: if the table doesn't exist yet,
            # create it EMPTY so the delete leg runs (and records its
            # key) rather than being skipped — a skip decided by
            # "does the table exist" is not replay-stable (a crash
            # between the legs replays with the table present, and a
            # key carried by BOTH legs would then net to the delete
            # instead of the upsert)
            if op_col is not None and not snapshot_versions(table):
                snapshot_write(
                    ups.limit(0), table, mode="overwrite", n_files=1,
                    stats_cols=stats_cols,
                )
            # deletes first: a key in both legs nets to its upsert
            if dels is not None and n_del > 0:
                snapshot_merge(
                    spark, table, dels, on=on, when_matched="delete",
                    insert_not_matched=False, strategy=strategy,
                    commit_key=f"{kp}{batch_id}-d",
                )
            if n_keys - n_del > 0:
                snapshot_merge(
                    spark, table, ups, on=on, when_matched="update",
                    insert_not_matched=True, strategy=strategy,
                    n_files_new=n_files_new, cluster_by=cluster_by,
                    stats_cols=stats_cols,
                    commit_key=f"{kp}{batch_id}-u",
                    merge_schema=merge_schema,
                )
            if auto_fold_rows is not None:
                versions = snapshot_versions(table)
                if versions:
                    m = _read_manifest(table, versions[-1])
                    pending = sum(
                        r["rows"]
                        for r in m.get("deletes", []) + m.get("eq_deletes", [])
                    )
                    if pending >= auto_fold_rows:
                        snapshot_rewrite_deletes(
                            spark, table, n_files_new=n_files_new,
                            cluster_by=cluster_by,
                        )
        finally:
            raw.unpersist()

    writer = changes.writeStream.foreachBatch(_apply).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def snapshot_publish(
    spark: SparkSession,
    staging_table: str,
    main_table: str,
    idempotency_key: str | None = None,
    max_retries: int = 3,
    properties: dict | None = None,
    staging_version: int | None = None,
) -> dict:
    """WRITE-AUDIT-PUBLISH: atomically adopt the staging snapshot
    table's current data files into `main_table` as one append commit —
    ZERO data copy and zero data reads on the happy path (the Iceberg
    add_files / WAP ingestion pattern):

      1. land candidate data in its own staging snapshot table,
      2. audit it there (expectations, row counts, dedup probes — the
         staging table is fully queryable and versioned),
      3. publish: each staged parquet file is HARD-LINKED into the main
         table's data dir (O(#files) metadata syscalls, no bytes move)
         and its manifest entry — rows + harvested stats — is reused
         verbatim, so manifest-level pruning works on the adopted files
         immediately without re-reading a footer.

    Main's CHECK constraints still validate the adopted rows (one
    column-pruned scan — the audit main's manifest insists on even if
    the staging audit lied); main's schema evolves add-only from the
    staging schema (type conflicts raise); a staging table with
    OUTSTANDING deletes of either flavor is rejected by name (adoption
    is file-level — fold first with snapshot_rewrite_deletes). Adopted
    files lack main's hidden partition columns until the next
    compact/binpack re-derives them (pruning keeps them — degraded,
    never wrong). idempotency_key gives the publish the exactly-once
    commit contract; publishing the same staging content twice WITHOUT
    a key appends duplicate rows, exactly like any other append.

    `staging_version` pins WHICH staging snapshot is adopted (default:
    latest at call time). A caller that audited / derived metadata from
    a specific version (e.g. clone bootstrap recording its base) passes
    it through so the delete-free/schema checks, the adopted entries,
    and anything the caller records all derive from ONE snapshot — a
    staging commit racing between the caller's read and this call can
    then never be adopted silently.

    Returns {'version', 'files_adopted', 'rows_adopted'}."""
    versions = snapshot_versions(staging_table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {staging_table}")
    if staging_version is None:
        staging_version = versions[-1]
    elif staging_version not in versions:
        raise ValueError(
            f"snapshot_publish: pinned staging_version {staging_version} "
            f"is not a committed version of {staging_table} "
            f"(have {versions[0]}..{versions[-1]})"
        )
    if idempotency_key is not None and idempotency_key in committed_keys(
        main_table
    ):
        return {
            "version": snapshot_versions(main_table)[-1],
            "files_adopted": 0, "rows_adopted": 0,
        }
    sm = _read_manifest(staging_table, staging_version)
    if sm.get("deletes") or sm.get("eq_deletes"):
        raise ValueError(
            f"snapshot_publish: {staging_table} carries outstanding "
            "delete files (positional or equality) — adoption is "
            "file-level; run snapshot_rewrite_deletes on the staging "
            "table first"
        )
    if _col_mapping(sm) or _dropped_cols(sm):
        raise ValueError(
            f"snapshot_publish: {staging_table} carries a column "
            "rename/drop history — adopted files' physical names would "
            "be unreadable under the main table's mapping; compact the "
            "staging table first to normalize its physical names"
        )
    if sm.get("schema") is None:
        raise ValueError(
            "snapshot_publish needs a manifest-recorded staging schema "
            "(compact the staging table once to record one)"
        )
    main_versions = snapshot_versions(main_table)
    if not main_versions:
        raise FileNotFoundError(
            f"no committed snapshots under {main_table} — create the "
            "main table first (publish is an append)"
        )
    entries = _all_entries(staging_table, sm)
    # adopt the staged files into main's data dir through MAIN's store:
    # a hard link on the local FS (no bytes move, and staging-side
    # expire can't pull the inode out from under main), a server-side
    # COPY on an object store — either way the adopted object is main's
    # own, decoupled from the staging table's lifecycle
    adopt_dir_rel = os.path.join(_DATA, uuid.uuid4().hex)
    adopt_dir = os.path.join(main_table, adopt_dir_rel)
    os.makedirs(adopt_dir, exist_ok=False)
    main_store = store_for(main_table)
    new_entries = []
    for e in entries:
        base_name = os.path.basename(e["path"])
        src_f = os.path.join(staging_table, e["path"])
        dst_f = os.path.join(adopt_dir, base_name)
        main_store.adopt_file(src_f, dst_f)
        ne = dict(e)
        ne["path"] = os.path.join(adopt_dir_rel, base_name)
        new_entries.append(ne)
    rows_adopted = sum(e["rows"] for e in new_entries)
    vdf, validated_checks = None, None
    new_refs, stamped_seq = None, None
    for _ in range(max_retries):
        base = snapshot_versions(main_table)[-1]
        prev = _read_manifest(main_table, base)
        prev_keys = set(prev.get("keys", committed_keys(main_table)))
        if idempotency_key is not None and idempotency_key in prev_keys:
            return {  # a racing duplicate published first
                "version": base, "files_adopted": 0, "rows_adopted": 0,
            }
        # a staging column named like one of MAIN's retired names
        # (dropped, or renamed-away physical) would resurrect/shadow old
        # files' values through the add-only schema union below
        retired = set(_dropped_cols(prev)) | {
            o for olds in _col_mapping(prev).values() for o in olds
        }
        clash = sorted(
            retired & {f["name"] for f in sm["schema"].get("fields", [])}
        )
        if clash:
            raise ValueError(
                f"snapshot_publish: staging column(s) {clash} reuse a "
                f"dropped or renamed-away physical name of {main_table} "
                "— rename them in staging before publishing"
            )
        sch = _evolve_schema_json(prev.get("schema"), sm["schema"])
        checks = prev.get("checks")
        if checks and checks != validated_checks:
            if vdf is None:
                from pyspark.sql.types import StructType

                vdf = spark.read.schema(
                    StructType.fromJson(sm["schema"])
                ).parquet(adopt_dir)
            _validate_checks(
                vdf, checks, sch,
                f"snapshot_publish({staging_table}) into {main_table}",
            )
            validated_checks = checks
        if stamped_seq != base + 1:
            for e in new_entries:
                e["seq"] = base + 1
            new_refs = _write_shards(main_table, new_entries)
            stamped_seq = base + 1
        if idempotency_key is not None:
            prev_keys.add(idempotency_key)
        manifest = {
            "version": base + 1,
            "mode": "publish",
            "stats_cols": prev.get("stats_cols", []),
            "idempotency_key": idempotency_key,
            "keys": sorted(prev_keys),
            "manifests": prev["manifests"] + new_refs,
            "deletes": prev.get("deletes", []),
            "eq_deletes": prev.get("eq_deletes", []),
            "partition_spec": prev.get("partition_spec"),
            "partition_specs": _specs_carry(prev, None),
            "refs": prev.get("refs"),
            "schema": sch,
            "checks": checks,
            # like snapshot_write: this publish's `properties` merge on
            # top of the carried table properties, riding the SAME
            # atomic commit as the adoption (what lets a cloning
            # replicator record its base version crash-safely)
            "properties": {
                **(prev.get("properties") or {}),
                **(properties or {}),
            }
            or None,
        }
        if _try_commit(main_table, base + 1, manifest):
            return {
                "version": base + 1,
                "files_adopted": len(new_entries),
                "rows_adopted": rows_adopted,
            }
    raise ConcurrentModificationError(
        f"snapshot_publish lost {max_retries} consecutive commit races "
        f"on {main_table}"
    )


def _evolve_schema_json(prev_schema: dict | None, new_schema: dict) -> dict:
    """_evolve_schema's add-only union, manifest-JSON to manifest-JSON
    (publish has no DataFrame to hand the original): existing columns
    must keep their exact type — or one that losslessly widens into it
    (_WIDEN_OK, matching the append path: the adopted files carry the
    narrow physical type and readers upcast, like any pre-widening
    file) — new ones append."""
    if prev_schema is None:
        raise ValueError(
            "publish target has no manifest-recorded schema — compact "
            "the main table once to record one"
        )
    prev_by = {f["name"]: f for f in prev_schema["fields"]}
    for f in new_schema["fields"]:
        pf = prev_by.get(f["name"])
        if pf is not None and pf["type"] != f["type"]:
            if (
                isinstance(f["type"], str)
                and pf["type"] in _WIDEN_OK.get(f["type"], ())
            ):
                continue  # narrower staging into a widened column
            raise ValueError(
                "schema evolution supports ADDING columns only: column "
                f"{f['name']!r} is {pf['type']} in the table but "
                f"{f['type']} in the published data"
            )
    known = set(prev_by)
    out = dict(prev_schema)
    out["fields"] = list(prev_schema["fields"]) + [
        f for f in new_schema["fields"] if f["name"] not in known
    ]
    return out


def snapshot_replicate(
    spark: SparkSession,
    src_table: str,
    dst_table: str,
    on: list[str],
    checkpoint_dir: str,
    starting_version: int = 0,
    strategy: str = "eq",
    n_files_new: int = 1,
    app_id: str | None = None,
    bootstrap: str = "cdc",
):
    """Maintain `dst_table` as an exactly-once MIRROR of `src_table` by
    composing the streaming change-data-feed source with the CDC-apply
    sink (the Delta 'incremental clone via CDF' pattern): each run
    drains the source versions the checkpoint hasn't seen and applies
    them as idempotent merges, so repeated invocations advance the
    mirror by O(changed rows since last run) — never O(table) — and a
    crash/replay anywhere converges (offsets replay version-stable,
    merges no-op on their commit keys).

    bootstrap='clone' (the 100 TB posture for a NEW mirror): instead of
    streaming the source's entire history as CDC inserts — O(table)
    rows through the feed and the merge path — the first run adopts the
    source's CURRENT snapshot files zero-copy (snapshot_publish: links
    or server-side copies, staged stats reused, O(metadata)) and the
    stream starts from that version, so only subsequent changes ever
    flow as CDC. The adopted base version rides the publish commit as a
    dst property (`replicate_base_version`), making a crash between
    adopt and first drain restart-safe; the adoption itself is keyed
    `clone-<v>`. Requires the source snapshot delete-free (adoption is
    file-level — run snapshot_rewrite_deletes first) and a recorded
    schema. bootstrap='cdc' (default) keeps the replay-everything
    behavior — right when the mirror must APPLY history (e.g. a
    filtered/transformed consumer downstream of this feed later).

    Within one drained batch a key may carry its full history (inserted
    at v2, updated at v4, deleted at v5); compaction orders by
    (_commit_version, insert-over-delete) — at equal version an
    upsert's insert supersedes its own delete — so the mirror lands
    directly on each key's final state. The mirror is an ordinary
    snapshot table: its own history/time-travel reflects replication
    runs, not source commits. Returns the started StreamingQuery."""
    from ..sources.snapshot_cdf_stream import read_snapshot_changes_stream

    from pyspark.sql import functions as F

    if bootstrap not in ("cdc", "clone"):
        raise ValueError(f"bootstrap must be cdc|clone, got {bootstrap!r}")
    if bootstrap == "clone":
        dversions = snapshot_versions(dst_table)
        need_create = not dversions
        need_adopt = need_create
        if dversions:
            dm = _read_manifest(dst_table, dversions[-1])
            base_prop = (dm.get("properties") or {}).get(
                "replicate_base_version"
            )
            if base_prop is None:
                # dst exists without the base marker: either a crash
                # landed between the empty-create and the publish (dst
                # is one empty version — retry the keyed, idempotent
                # adoption), or the table has real content from another
                # feed (refuse by name)
                if sum(r["rows"] for r in dm["manifests"]) == 0:
                    need_adopt = True
                else:
                    raise ValueError(
                        f"{dst_table} exists with content but records "
                        "no replicate_base_version — it was not "
                        "clone-bootstrapped; resume it with "
                        "bootstrap='cdc' (the checkpoint carries the "
                        "offsets)"
                    )
        if need_adopt:
            v0 = snapshot_versions(src_table)[-1]
            sm = _read_manifest(src_table, v0)
            if sm.get("deletes") or sm.get("eq_deletes"):
                raise ValueError(
                    "snapshot_replicate(bootstrap='clone'): the source "
                    "carries outstanding delete files — adoption is "
                    "file-level; run snapshot_rewrite_deletes on the "
                    "source first, or bootstrap='cdc'"
                )
            if sm.get("schema") is None:
                raise ValueError(
                    "clone bootstrap needs a manifest-recorded source "
                    "schema (compact the source once to record one)"
                )
            if need_create:
                from pyspark.sql.types import StructType

                snapshot_write(
                    spark.createDataFrame(
                        [], StructType.fromJson(sm["schema"])
                    ),
                    dst_table, mode="overwrite", n_files=1,
                    stats_cols=sm.get("stats_cols") or None,
                )
            # pin the publish to v0 — a src commit racing between the
            # v0 read above and the publish must not be adopted under a
            # base marker that says v0 (the stream would re-apply
            # v0→vN changes; keyed merges converge but extra versions
            # churn and the marker lies)
            snapshot_publish(
                spark, src_table, dst_table,
                idempotency_key=f"clone-{v0}",
                properties={"replicate_base_version": v0},
                staging_version=v0,
            )
        base_prop = (
            _read_manifest(dst_table, snapshot_versions(dst_table)[-1])
            .get("properties") or {}
        ).get("replicate_base_version")
        starting_version = int(base_prop)

    feed = read_snapshot_changes_stream(
        spark, src_table, starting_version=starting_version
    ).withColumn(
        "_ins", (F.col("_change_type") != F.lit("delete")).cast("int")
    )
    return snapshot_cdc_sink(
        feed, dst_table, on=on, op_col="_change_type",
        dedup_by=["_commit_version", "_ins"], strategy=strategy,
        n_files_new=n_files_new, checkpoint_dir=checkpoint_dir,
        # version-offset replays are data-identical, so the default
        # unscoped keys are the exactly-once dedup working as intended
        # for a single-source mirror; scope per source when fanning
        # several CDF feeds into one table
        app_id=app_id,
    )


# --------------------------------------------------------------------------
# Positional delete vectors (merge-on-read) — the Iceberg-v2 delete-file
# shape. A DV file is plain parquet with two columns:
#   _file: STRING  -- TABLE-RELATIVE data file path (data/<uuid>/part-*)
#   _pos:  BIGINT  -- parquet row index within that file
# and tombstones one physical row. DV files live under `deletes/<uuid>/`,
# are committed through manifest shard refs in the manifest list's
# `deletes` key (absent = no tombstones — every pre-DV manifest stays
# readable), and obey two invariants every mutation below preserves:
#   * UNIQUE: a (file, pos) pair is tombstoned at most once, so
#     COUNT(*) stays answerable from metadata alone as
#     sum(data rows) - sum(tombstone rows);
#   * LIVE TARGETS ONLY: a tombstone always references a data file of
#     the same snapshot — any op that drops data files (CoW merge,
#     rewrite/compact/overwrite) also drops or rewrites the tombstones
#     aimed at them.
# Why merge-on-read at 100 TB: a CoW delete of k rows rewrites every
# touched FILE (amplification = file size / matched rows); a MoR delete
# writes O(k) tombstone bytes and no data files at all, deferring the
# rewrite to one explicit `snapshot_rewrite_deletes` maintenance pass
# that touches only tombstoned files. Readers pay one anti-join whose
# build side is the (small) tombstone set until then.
# --------------------------------------------------------------------------


def _rel_file_col():
    """Spark column: `_metadata.file_path` (a file: URI) reduced to the
    table-relative `data/<uuid>/<name>` form stored in DV files — anchored
    at the tail so it is invariant to the table root moving and to the
    reader's URI flavor (file:/x vs file:///x)."""
    from pyspark.sql import functions as F

    return F.regexp_extract(
        F.col("_metadata.file_path"), r"(data/[^/]+/[^/]+)$", 1
    )


def _attach_lineage(df: DataFrame) -> DataFrame:
    """(_file, _pos) row lineage for delete application / CDF diffing:
    attached from the hidden `_metadata` column on plain scans. On the
    over-cap hive GROUP-UNION scan the columns arrive PRE-ATTACHED per
    leg (`_metadata` is only resolvable inside each leg's scan
    relation, not on the union) — the no-op branch here is what lets
    every metadata-needing caller run unchanged past the literal-plan
    cap (round-13 verdict item 3)."""
    if "_file" in df.columns:
        return df
    from pyspark.sql import functions as F

    return df.withColumn("_file", _rel_file_col()).withColumn(
        "_pos", F.col("_metadata.row_index")
    )


def _reader(spark: SparkSession, manifest: dict):
    """DataFrameReader honoring the manifest's recorded table schema (see
    _evolve_schema): every direct scan of a snapshot's data files must go
    through this, or a file predating an added column breaks the read."""
    sch = manifest.get("schema")
    if sch is None:
        return spark.read
    from pyspark.sql.types import StructType

    return spark.read.schema(StructType.fromJson(sch))


def _hive_cols(manifest: dict | None) -> list[str]:
    """Hive partition columns of a Delta import mirror (ops/export.py):
    their VALUES live in manifest entries (`hive`), not in the data
    files — reads inject them per file. A table property, so every
    commit constructor / sync carries it like bloom_cols."""
    if manifest is None:
        return []
    return list((manifest.get("properties") or {}).get("hive_cols") or [])


# Hive injection has two plan shapes, chosen by scan size:
#   * literal MAP (the default): one file->value map literal per hive
#     column, withColumn-only — callers can still attach `_metadata`
#     columns afterwards (the DV/merge/CDF paths need that). Plan size
#     O(scanned imported files), fine for the partition-pruned probes
#     hive layouts exist for, capped below.
#   * GROUP-UNION (the scale path, past the cap): one scan LEG per
#     distinct partition-value tuple with plain literals attached —
#     plan size O(#partitions) regardless of file count, the same shape
#     Spark's own hive reader plans. Legs are separate scan relations,
#     so `_metadata` is NOT resolvable on the union — used only when the
#     caller declared it doesn't need it (need_metadata=False: plain
#     reads of delete-free snapshots). A >cap scan that DOES need
#     metadata (merge/CDF on a giant unpruned hive mirror) refuses by
#     name with the prune/materialize escape hatches.
_HIVE_INJECT_MAX = 32_768


def _hive_entries_for(
    table: str, manifest: dict, paths: list[str]
) -> dict[str, dict]:
    """{table-relative path: hive-values dict} for the scanned subset."""
    scanned = {os.path.relpath(p, table) for p in paths}
    return {
        e["path"]: e["hive"]
        for e in _all_entries(table, manifest)
        if e.get("hive") is not None and e["path"] in scanned
    }


def _attach_hive_values(
    spark: SparkSession, table: str, manifest: dict, df: DataFrame,
    hive_by_path: dict[str, dict],
) -> DataFrame:
    """Literal-map injection: per scanned file, look its entry's
    recorded raw value up in a map keyed by the table-relative file
    path (the same `_metadata`-derived expression DV accounting uses)
    and COALESCE it under the physical column — so adopted files (which
    don't carry the column) serve the log's value, while
    locally-appended mirror rows (which do) keep their own.
    withColumn-only on purpose: callers still attach
    `_metadata`-derived columns after this (the column-mapping path's
    same contract)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    hcols = _hive_cols(manifest)
    typ = {
        f.name: f.dataType
        for f in StructType.fromJson(manifest["schema"]).fields
    }
    key = _rel_file_col()
    for c in hcols:
        vals = {
            p: hv[c] for p, hv in hive_by_path.items()
            if hv.get(c) is not None
        }
        if not vals:
            continue  # all-NULL partition values: physical NULL is right
        lits = []
        for p in sorted(vals):
            lits.extend([F.lit(p), F.lit(vals[p])])
        df = df.withColumn(
            c,
            F.coalesce(
                F.col(c), F.element_at(F.create_map(*lits), key).cast(typ[c])
            ),
        )
    return df


def _hive_group_scan(
    spark: SparkSession, table: str, manifest: dict, paths: list[str],
    hive_by_path: dict[str, dict], with_lineage: bool = False,
) -> DataFrame:
    """Group-union injection (the >cap scale path): scanned imported
    files grouped by their full partition-value TUPLE, one recorded-
    schema scan leg per group with the values attached as plain
    literals, plus one leg for non-imported files (local mirror
    appends, which carry the columns physically). Plan size is
    O(#distinct partition tuples), never O(#files) — file lists live in
    each leg's FileIndex, not in expressions.

    `with_lineage=True` additionally selects (_file, _pos) INSIDE each
    leg — the one place `_metadata` is resolvable on this shape — so
    metadata-needing callers (merge planning, CDF, DV application) run
    past the literal cap too; they pick the columns up via
    _attach_lineage's no-op branch."""
    from functools import reduce

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    hcols = _hive_cols(manifest)
    sch = StructType.fromJson(manifest["schema"])
    typ = {f.name: f.dataType for f in sch.fields}
    cols = [f.name for f in sch.fields]
    if with_lineage:
        lineage = [
            _rel_file_col().alias("_file"),
            F.col("_metadata.row_index").alias("_pos"),
        ]
    groups: dict[tuple, list[str]] = {}
    plain: list[str] = []
    for p in paths:
        rel = os.path.relpath(p, table)
        hv = hive_by_path.get(rel)
        if hv is None:
            plain.append(p)
        else:
            groups.setdefault(
                tuple(hv.get(c) for c in hcols), []
            ).append(p)
    legs = []
    for key_vals in sorted(groups, key=lambda t: tuple(map(str, t))):
        leg = _reader(spark, manifest).parquet(*groups[key_vals])
        for c, v in zip(hcols, key_vals):
            if v is not None:
                leg = leg.withColumn(
                    c, F.coalesce(F.col(c), F.lit(v).cast(typ[c]))
                )
        legs.append(
            leg.select(*cols, *lineage) if with_lineage
            else leg.select(*cols)
        )
    if plain:
        leg = _reader(spark, manifest).parquet(*plain)
        legs.append(
            leg.select(*cols, *lineage) if with_lineage
            else leg.select(*cols)
        )
    return reduce(DataFrame.unionByName, legs)


def _scan_data(
    spark: SparkSession, table: str, manifest: dict, paths: list[str],
    need_metadata: bool = True,
) -> DataFrame:
    """Mapping-aware data scan: the recorded-schema read (_reader), plus
    — only when the manifest carries a column mapping — resolution of
    renamed columns, plus — only for Delta import mirrors with hive
    partition columns — per-file partition-value injection (see the
    hive block above: literal map by default, group-union past the cap
    when the caller passed need_metadata=False). The read schema
    includes every former physical name (same type, nullable); each
    logical column then coalesces across its name history. Sound
    because no single source ROW ever carries two of the names
    non-NULL: a data file predates or postdates each rename, and
    partial-rewrite maintenance (binpack mixing old- and new-named
    files) unions rows, never zips them. Uses withColumn+drop, not
    select, so callers can still attach `_metadata`-derived columns
    afterwards (except the group-union hive shape, which only
    need_metadata=False callers ever get). Column order = recorded
    schema order either way."""
    mapping = _col_mapping(manifest)
    hive_by_path: dict[str, dict] = {}
    if _hive_cols(manifest) and manifest.get("schema") is not None:
        hive_by_path = _hive_entries_for(table, manifest, paths)
        if len(hive_by_path) > _HIVE_INJECT_MAX:
            if mapping:
                raise ValueError(
                    f"hive-partition injection over {len(hive_by_path)} "
                    f"imported files exceeds the literal-plan cap "
                    f"({_HIVE_INJECT_MAX}) and the table ALSO carries a "
                    "column mapping (the coalesce-across-names resolve "
                    "is not composed with the group-union shape): prune "
                    "on the partition column first "
                    "(snapshot_read(prune=...)) or import the table "
                    "materialized via snapshot_write"
                )
            # metadata-needing scans (merge/CDF/DV application) get the
            # group-union shape with (_file, _pos) pre-attached per leg
            # — the round-13 cap on those paths is lifted
            return _hive_group_scan(
                spark, table, manifest, paths, hive_by_path,
                with_lineage=need_metadata,
            )
    if not mapping or manifest.get("schema") is None:
        df = _reader(spark, manifest).parquet(*paths)
        if hive_by_path:
            df = _attach_hive_values(
                spark, table, manifest, df, hive_by_path
            )
        return df
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    sch = StructType.fromJson(manifest["schema"])
    fields = list(sch.fields)
    for f in sch.fields:
        for old in mapping.get(f.name, []):
            fields.append(StructField(old, f.dataType, True))
    df = spark.read.schema(StructType(fields)).parquet(*paths)
    olds: list[str] = []
    for f in sch.fields:
        alts = mapping.get(f.name)
        if alts:
            df = df.withColumn(
                f.name,
                F.coalesce(F.col(f.name), *[F.col(a) for a in alts]),
            )
            olds.extend(alts)
    df = df.drop(*olds)
    if hive_by_path:
        df = _attach_hive_values(spark, table, manifest, df, hive_by_path)
    return df


def _dv_frame(spark: SparkSession, table: str, manifest: dict) -> DataFrame | None:
    """All tombstones visible in `manifest` as a DataFrame(_file, _pos),
    or None when the snapshot carries no delete files (the fast path —
    readers then skip the anti-join entirely)."""
    paths = [
        os.path.join(table, e["path"])
        for e in _all_entries(table, manifest, "deletes")
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths).select("_file", "_pos")


def _apply_deletes(df: DataFrame, dv: DataFrame | None) -> DataFrame:
    """Subtract tombstoned positions from a raw file scan. One anti-join
    on (_file, _pos): the probe side keeps its scan partitioning, the
    build side is the tombstone set — tiny relative to the table between
    maintenance passes, so AQE plans it as a broadcast; no row widens
    past the join (helper columns are dropped immediately)."""
    if dv is None:
        return df
    cols = [c for c in df.columns if c not in ("_file", "_pos")]
    return (
        _attach_lineage(df)
        .join(dv, ["_file", "_pos"], "left_anti")
        .select(*cols)
    )


# --------------------------------------------------------------------------
# Equality delete files (the Iceberg-v2 SECOND delete flavor). An eq-delete
# file is plain parquet holding KEY COLUMN VALUES; its manifest entry
# records `on` (the key column list) and `seq` (the committing version).
# A row is eq-deleted iff its key equals a tombstoned key AND its data
# file's sequence number is LOWER than the delete's — so re-inserting a
# key after the delete is never shadowed (new files carry a higher seq).
# Entries live under the manifest list's `eq_deletes` key as shard refs,
# files under the same `deletes/<uuid>/` dirs as positional DVs.
#
# Why this exists at 100 TB: a MoR (positional) merge still has to SCAN
# stats-pruned candidate files at write time to find the positions of
# matched rows; an equality delete writes O(source keys) bytes and reads
# NOTHING — CDC upsert ingest becomes O(source) at write time. The costs
# move to read (one extra anti-join keyed by the delete columns) and to
# maintenance (snapshot_rewrite_deletes folds eq files back in), and
# exact metadata row counts stop being derivable until then (an eq key
# may delete zero or many rows) — the same honesty trade Iceberg makes
# by disabling COUNT(*) pushdown under equality deletes.
# --------------------------------------------------------------------------


def _eq_entries(table: str, manifest: dict) -> list[dict]:
    return _all_entries(table, manifest, "eq_deletes")


def _file_seq_frame(spark: SparkSession, table: str, manifest: dict) -> DataFrame:
    """(_file, _dseq) for every data file of the snapshot — the broadcast
    map eq application joins through. Entries written before sequence
    stamping read as seq 0 (they predate every eq delete, which is the
    conservative-correct direction: old files ARE subject to them)."""
    rows = [
        (e["path"], int(e.get("seq", 0)))
        for e in _all_entries(table, manifest)
    ]
    return spark.createDataFrame(rows, "_file string, _dseq bigint")


def _apply_eq_deletes(
    spark: SparkSession, table: str, manifest: dict, df: DataFrame,
    eq_entries: list[dict] | None = None,
) -> DataFrame:
    """Subtract equality-deleted rows from a raw file scan of `manifest`'s
    data files. One broadcast join attaches each row's file sequence
    number, then one broadcast anti-join per distinct key-column set
    removes rows whose key is tombstoned by a delete with a HIGHER seq.
    Both build sides are metadata-sized (file list, delete keys); the
    probe side keeps its scan partitioning — no shuffle. NULL keys never
    match (plain SQL equality), mirroring merge's NULL-key semantics.
    `eq_entries` overrides the manifest's own list (the CDF delta path
    applies only the NEW deletes of a version step)."""
    from functools import reduce

    from pyspark.sql import Column
    from pyspark.sql import functions as F

    entries = (
        _eq_entries(table, manifest) if eq_entries is None else eq_entries
    )
    if not entries:
        return df
    cols = df.columns
    # reuse a caller-attached `_file` column when present: the hidden
    # `_metadata` source column does not survive joins, so callers that
    # already anti-joined positional DVs attach _file ONCE on the scan
    src = (
        df.withColumn("_eqf", F.col("_file"))
        if "_file" in df.columns
        else df.withColumn("_eqf", _rel_file_col())
    )
    rows = src.join(
        F.broadcast(
            _file_seq_frame(spark, table, manifest).withColumnRenamed(
                "_file", "_eqf"
            )
        ),
        "_eqf",
        "left",
    )
    by_on: dict[tuple, list[dict]] = {}
    for e in entries:
        by_on.setdefault(tuple(e["on"]), []).append(e)
    for on, group in sorted(by_on.items()):
        parts = [
            spark.read.parquet(os.path.join(table, e["path"]))
            .select(*on)
            .withColumn("_eqseq", F.lit(int(e["seq"])).cast("bigint"))
            for e in group
        ]
        eq = reduce(DataFrame.unionByName, parts)
        eq = eq.select(
            *[F.col(k).alias(f"_eqk_{k}") for k in on], "_eqseq"
        )
        cond = reduce(
            Column.__and__,
            [F.col(k) == F.col(f"_eqk_{k}") for k in on],
        ) & (F.coalesce(F.col("_dseq"), F.lit(0)) < F.col("_eqseq"))
        rows = rows.join(F.broadcast(eq), cond, "left_anti")
    return rows.select(*cols)


def _write_eq_delete_commit(
    keys_df: DataFrame, table: str, on: list[str], seq: int
) -> tuple[dict, int]:
    """Materialize distinct delete keys as one immutable eq-delete file +
    manifest shard ref; returns (shard ref, n_keys). Stats are harvested
    on the first key column so maintenance can prune unaffected data
    files; deterministic single-file sorted layout keeps replays stable."""
    eq_dir = os.path.join(table, _DELETES, uuid.uuid4().hex)
    keys_df.select(*on).distinct().coalesce(1).sortWithinPartitions(
        *on
    ).write.mode("error").parquet(eq_dir)
    entries = _harvest_stats(
        _glob.glob(os.path.join(eq_dir, "*.parquet")), [on[0]], table,
        spark=keys_df.sparkSession,
    )
    for e in entries:
        e["on"] = list(on)
        e["seq"] = seq
    ref = _write_shard(table, entries)
    return ref, sum(e["rows"] for e in entries)


def _rows_or_none(table: str, version: int | None = None) -> int | None:
    """snapshot_rows, or None where equality deletes make the metadata
    count underivable (merge result dicts use this)."""
    try:
        return snapshot_rows(table, version)
    except ValueError:
        return None


def _live_rows(
    spark: SparkSession,
    table: str,
    manifest: dict,
    files: list[str],
    dv: DataFrame | None,
) -> DataFrame:
    """Scan `files` under the manifest's recorded schema and subtract
    BOTH delete flavors (positional DVs, then equality deletes). `_file`
    and `_pos` are attached once directly on the scan — the hidden
    `_metadata` column does not survive the anti-joins — and dropped at
    the end."""
    from pyspark.sql import functions as F

    needs_meta = dv is not None or bool(_eq_entries(table, manifest))
    df = _scan_data(
        spark, table, manifest, files, need_metadata=needs_meta
    )
    cols = [c for c in df.columns if c not in ("_file", "_pos")]
    if not needs_meta:
        return df
    df = _attach_lineage(df)
    if dv is not None:
        df = df.join(dv, ["_file", "_pos"], "left_anti")
    df = _apply_eq_deletes(spark, table, manifest, df)
    return df.select(*cols)


def _write_delete_commit(tombs: DataFrame, table: str) -> tuple[dict, int]:
    """Materialize a tombstone DataFrame(_file, _pos) as one immutable DV
    commit dir + manifest shard; returns (shard ref, n_tombstones).
    Written as a single file sorted by (_file, _pos) — tombstone sets are
    small by construction (bounded by matched rows since the last
    rewrite), and a deterministic layout keeps replays byte-stable."""
    dv_dir = os.path.join(table, _DELETES, uuid.uuid4().hex)
    tombs.coalesce(1).sortWithinPartitions("_file", "_pos").write.mode(
        "error"
    ).parquet(dv_dir)
    entries = _harvest_stats(
        _glob.glob(os.path.join(dv_dir, "*.parquet")), ["_file"], table,
        spark=tombs.sparkSession,
    )
    ref = _write_shard(table, entries)
    return ref, sum(e["rows"] for e in entries)


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
    strategy: str = "cow",
    commit_key: str | None = None,
    merge_schema: bool = False,
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
    lost races it raises ConcurrentModificationError.

    ISOLATION: SERIALIZABLE (see ConcurrentModificationError for the
    full contract). Because a loser replans — re-prunes, re-scans,
    re-matches — rather than rebasing its planned file set, two merges
    racing on the SAME key have defined winner semantics: the later
    commit's replan sees the earlier commit's row and replaces it
    wholesale. The final state always equals some serial order of the
    committed merges; a torn state (one racer's value on some keys, the
    other's on the rest of a single merge's key set) is not
    representable. Pinned by test_concurrent_merge_same_key_serializable
    and the race_upsert fuzz op on both metadata stores.

    Semantics notes (both mirrored by the DuckDB twin in queries):
    NULL source keys never match (SQL join semantics) — they delete
    nothing and, when insert_not_matched, land as inserts; duplicate
    source keys under 'update' raise (the MERGE ambiguity error every
    engine throws) — under 'delete' duplicates are harmless and allowed.
    In delete mode `source` may carry the key columns only.
    DUPLICATE-KEY TARGET rows deviate from Delta/Iceberg on purpose:
    'update' drops/tombstones EVERY matched target row but appends the
    source row ONCE, collapsing a duplicated target key to a single row
    (the source is the authority on what the key's state is) — engines
    that model MERGE as a row-level join instead update each matched row
    and preserve target multiplicity. Callers relying on duplicate
    target keys surviving an upsert must dedup-check the target first.

    strategy='mor' (merge-on-read) produces the SAME logical result
    without rewriting any data file: matched live rows are tombstoned by
    a positional delete file (see the DV block above _rel_file_col) and
    replacement/insert rows append as new files — write cost O(matched
    rows + source), zero read-rewrite amplification; readers pay the DV
    anti-join until `snapshot_rewrite_deletes` folds tombstones back in.

    strategy='eq' (equality deletes) goes one step further: the write
    path reads NO target data at all — matched rows are shadowed by a
    key-valued delete file that applies to every data file with a lower
    sequence number, and (in update mode) all source rows append as new
    files whose higher seq exempts them from their own delete. Write
    cost O(source); CDC upsert ingest at its floor. Constraints: update
    mode requires insert_not_matched=True and delete mode
    insert_not_matched=False (telling matched from unmatched WOULD need
    a target read — the thing eq mode exists to avoid; the logical
    result of an eq upsert equals the cow/mor update+insert result);
    metadata row counts are not derivable until snapshot_rewrite_deletes
    folds the eq files back in (rows_after comes back None).
    strategy='cow' rewrites touched files as before, and on a table that
    already carries tombstones it purges them physically: the rewrite
    scan subtracts the DVs, and tombstones aimed at rewritten files are
    dropped from the new manifest (survivors are re-committed as one
    fresh DV file).

    commit_key makes the merge EXACTLY-ONCE under at-least-once
    execution (the snapshot_write idempotency_key contract, extended to
    merges — what a streaming CDC-apply sink needs): a merge whose key
    is already in the table's committed key set returns immediately
    with `replayed=True` and NO new version, at the cost of one
    manifest read and zero Spark jobs. The check re-runs inside the
    optimistic retry loop against the freshest manifest, so two racing
    merges with the same key commit exactly one version: the loser's
    replan sees the winner's key and backs off to a replay no-op.

    merge_schema=True enables ADD-ONLY schema evolution through the
    merge (Delta's mergeSchema): source columns the table lacks are
    appended to the recorded schema in one commit with the merge itself
    — new files carry the column, rewritten survivors NULL-fill it, and
    every untouched pre-merge file NULL-backfills at read with zero
    rewrite (the same contract as an evolve-append). Existing columns
    still must match by name and (widen-compatibly) by type; names that
    were dropped or renamed-away are refused (value resurrection);
    without the flag a novel source column stays a hard error. The
    union is re-derived inside the retry loop, so racing a concurrent
    schema-evolving commit unions with it instead of stomping it.

    Returns {'version', 'files_rewritten', 'files_kept', 'files_added',
    'tombstones_added', 'rows_before', 'rows_after', 'replayed'} (row
    counts from manifest metadata — no extra jobs)."""
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    if strategy not in ("cow", "mor", "eq"):
        raise ValueError(f"strategy must be cow|mor|eq, got {strategy!r}")
    if not on:
        raise ValueError("merge needs at least one key column")
    if strategy == "eq":
        if when_matched == "update" and not insert_not_matched:
            raise ValueError(
                "strategy='eq' update requires insert_not_matched=True: "
                "matched-only updates need a target read, which equality "
                "deletes exist to avoid"
            )
        if when_matched == "delete" and insert_not_matched:
            raise ValueError(
                "strategy='eq' delete requires insert_not_matched=False: "
                "telling unmatched source rows apart needs a target read"
            )
    def _replay_result(base: int, prev: dict) -> dict:
        res = {
            "version": base, "files_rewritten": 0,
            "files_kept": sum(r["n_files"] for r in prev["manifests"]),
            "files_added": 0, "tombstones_added": 0,
            "rows_before": _rows_or_none(table, base),
            "rows_after": _rows_or_none(table, base),
            "replayed": True,
        }
        if strategy == "eq":
            res["eq_keys"] = 0
            res["rows_after"] = None
        return res

    versions = snapshot_versions(table)
    if not versions:
        if not insert_not_matched:
            raise FileNotFoundError(f"no committed snapshots under {table}")
        v = snapshot_write(
            source, table, mode="overwrite", n_files=n_files_new,
            cluster_by=cluster_by, stats_cols=stats_cols,
            idempotency_key=commit_key,
        )
        return {
            "version": v, "files_rewritten": 0, "files_kept": 0,
            "files_added": n_files_new, "tombstones_added": 0,
            "rows_before": 0, "rows_after": snapshot_rows(table, v),
            "replayed": False,
        }
    if commit_key is not None:
        # replay fast path: one manifest read, zero Spark jobs — the
        # race-safe re-check lives inside the retry loop below
        prev0 = _read_manifest(table, versions[-1])
        if commit_key in prev0.get("keys", committed_keys(table)):
            return _replay_result(versions[-1], prev0)

    from pyspark.sql import functions as F

    source = source.persist()
    try:
        target_cols = snapshot_read(spark, table).columns
        new_cols: list[str] = []
        if when_matched == "update" or insert_not_matched:
            extra = [c for c in source.columns if c not in target_cols]
            missing = set(target_cols) - set(source.columns)
            if missing or (extra and not merge_schema):
                hint = (
                    " (pass merge_schema=True to auto-add new source "
                    "columns)" if extra and not missing else ""
                )
                raise ValueError(
                    f"update/insert merge source columns {sorted(source.columns)} "
                    f"must match target {sorted(target_cols)}{hint}"
                )
            new_cols = extra
        elif not set(on) <= set(source.columns):
            raise ValueError(f"delete merge source must carry key columns {on}")
        evolve_fn = None
        if new_cols:
            # add-only evolution through MERGE (Delta's mergeSchema): the
            # committed schema becomes the union (new columns appended
            # after existing, types checked by the same append-evolution
            # rules), the merge's new files carry the columns, and every
            # pre-merge file NULL-backfills at read exactly like an
            # evolve-append — zero rewrite of untouched data. Computed
            # PER ATTEMPT against the attempt's base manifest, so a lost
            # race against another schema-evolving commit unions with
            # the winner's schema instead of stomping it (the same
            # in-loop re-derivation snapshot_write's append path does).
            src_evolved = source.select(*(list(target_cols) + new_cols))

            def evolve_fn(prev_m: dict) -> dict:
                if prev_m.get("schema") is None:
                    raise ValueError(
                        "merge_schema=True needs a recorded table schema "
                        f"(legacy manifest at {table} has none)"
                    )
                clash = set(new_cols) & (
                    set(_dropped_cols(prev_m))
                    | {
                        o
                        for olds in _col_mapping(prev_m).values()
                        for o in olds
                    }
                )
                if clash:
                    raise ValueError(
                        f"merge source column(s) {sorted(clash)} reuse a "
                        f"dropped or renamed-away physical name of "
                        f"{table} — old files still carry values under "
                        "that name"
                    )
                return _evolve_schema(prev_m["schema"], src_evolved, "append")

            target_cols = list(target_cols) + new_cols
        # One driver agg does double duty: the key-range probe for the
        # manifest-stats prune (None bounds = all-NULL keys = pruning off,
        # still correct) and, in update mode, the MERGE-ambiguity check —
        # count vs count_distinct over the key STRUCT (struct equality
        # groups NULL fields the way groupBy does, so two NULL-key rows
        # still count as duplicates) in the same job instead of a second
        # groupBy pass over the source.
        k0 = on[0]
        if strategy == "eq":
            # eq mode reads no target files, so the key-range probe has
            # nothing to prune — only update mode pays a source pass,
            # and only for the MERGE-ambiguity check (a delete leg is
            # dup-tolerant and runs zero source jobs here: the CDC hot
            # path stays at its write floor)
            if when_matched == "update":
                c = source.agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.count_distinct(F.struct(*on)).alias("dcnt"),
                ).first()
                if c["cnt"] != c["dcnt"]:
                    raise ValueError(
                        "merge source has duplicate key rows — 'update' "
                        "would be nondeterministic (the standard MERGE "
                        "ambiguity error)"
                    )
            return _eq_merge_commit(
                spark, table, source, on, when_matched, n_files_new,
                cluster_by, stats_cols, max_retries, target_cols,
                commit_key, _replay_result, evolve_fn,
            )
        aggs = [F.min(k0).alias("lo"), F.max(k0).alias("hi")]
        # distinct leading-key count rides the same single source pass,
        # but ONLY when the table actually declares blooms on the key —
        # the count exists solely to gate the bloom candidate filter, so
        # a bloom-less table (the common case) pays nothing extra
        bloom_k0 = k0 in _bloom_cols(
            _read_manifest(table, snapshot_versions(table)[-1])
        )
        if bloom_k0:
            aggs.append(F.count_distinct(k0).alias("kcnt"))
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
        src_k0: list | None = None  # collected lazily, at most once

        for _ in range(max_retries):
            base = snapshot_versions(table)[-1]
            prev = _read_manifest(table, base)
            if commit_key is not None and commit_key in prev.get(
                "keys", committed_keys(table)
            ):
                return _replay_result(base, prev)  # raced replay: no-op
            dv = _dv_frame(spark, table, prev)
            candidates, _ = _plan_files(
                table, base, (k0, b["lo"], b["hi"]), manifest=prev
            )
            # Small-key-set bloom narrowing (the CDC-trickle case): the
            # range probe above keeps every file whose [min,max] spans
            # the keys, which after compaction interleaves is most of
            # the table; when the table declares blooms on the leading
            # merge key and the source carries few distinct keys, test
            # each candidate's filter against the actual key set and
            # drop files that provably contain none of them. Gated on
            # kcnt from the one agg already paid — the extra distinct
            # collect runs only under the cap, and only once.
            if (
                candidates
                and bloom_k0
                and b["kcnt"] is not None
                and 0 < b["kcnt"] <= _BLOOM_MERGE_KEYS_CAP
                and k0 in _bloom_cols(prev)
            ):
                if src_k0 is None:
                    src_k0 = [
                        r[0]
                        for r in source.select(k0)
                        .where(F.col(k0).isNotNull())
                        .distinct()
                        .collect()
                    ]
                candidates = _bloom_filter_candidates(
                    table, prev, candidates, k0, src_k0,
                    bounds=(b["lo"], b["hi"]),
                )
            n_all = sum(r["n_files"] for r in prev["manifests"])
            # live matched rows, keyed by physical position: candidate
            # files scanned key-columns-only, existing tombstones
            # subtracted (a row deleted by an earlier MoR merge is
            # logically absent — it must neither match again nor suppress
            # an insert), then semi-joined to the source keys. Feeds both
            # strategies: its _file set is CoW's touched list, its
            # (_file,_pos) pairs are MoR's new tombstones, and its key set
            # decides which source rows are matched vs inserts.
            matched = None
            if candidates:
                # the scan feeds _apply_eq_deletes below, which anti-joins
                # on every OUTSTANDING eq-delete file's key columns — a
                # table mixing eq-merge key sets (e.g. CDC by id, a GDPR
                # purge by user_id) must scan the UNION of this merge's
                # keys and all eq keys, or the anti-join hits an
                # unresolved column
                eq_cols = [
                    c
                    for e in _eq_entries(table, prev)
                    for c in e["on"]
                ]
                scan_cols = list(dict.fromkeys([*on, *eq_cols]))
                raw = _attach_lineage(
                    _scan_data(spark, table, prev, candidates)
                ).select(*scan_cols, "_file", "_pos")
                if dv is not None:
                    raw = raw.join(dv, ["_file", "_pos"], "left_anti")
                # rows shadowed by an equality delete are logically
                # absent: they must neither match nor suppress an insert
                raw = _apply_eq_deletes(spark, table, prev, raw)
                matched = raw.join(skeys, on, "left_semi").persist()
            matched_keys = (
                matched.select(*on).distinct()
                if matched is not None
                else source.select(*on).limit(0)
            )
            try:
                res = _merge_attempt(
                    spark, table, base, prev, dv, matched, matched_keys,
                    skeys, source, on, when_matched, insert_not_matched,
                    strategy, n_files_new, cluster_by, stats_cols,
                    target_cols, n_all, commit_key,
                    evolve_fn(prev) if evolve_fn else None, new_cols,
                )
            finally:
                if matched is not None:
                    matched.unpersist()
            if res is not None:
                return res
            # lost the race: the snapshot we planned against is stale —
            # this attempt's data files become expire-collectable orphans
            # and the loop replans against the new latest (matched keys /
            # touched files may have changed under us)
        raise ConcurrentModificationError(
            f"snapshot_merge lost {max_retries} consecutive commit races on {table}"
        )
    finally:
        source.unpersist()


def _merge_attempt(
    spark, table, base, prev, dv, matched, matched_keys, skeys,
    source, on, when_matched, insert_not_matched,
    strategy, n_files_new, cluster_by, stats_cols, target_cols, n_all,
    commit_key=None, evolved_schema=None, new_cols=None,
):
    """One optimistic attempt of snapshot_merge against snapshot `base`:
    returns the result dict on a won commit race, None on a lost one
    (the caller replans). `matched` is the live-matched-row frame
    (on + _file + _pos) or None when no candidate files survived the
    stats prune. `evolved_schema`/`new_cols` carry merge_schema=True
    add-only evolution: the commit records the union schema and
    rewritten survivors NULL-fill the new columns (pre-merge files
    backfill at read like any evolve-append)."""
    from functools import reduce

    from pyspark.sql import functions as F  # noqa: F401  (parity with caller)

    sc = prev.get("stats_cols", []) if stats_cols is None else stats_cols

    def _noop():
        # provably-nothing-to-do merges commit no version, so a
        # commit_key is NOT recorded here — replaying a no-op is
        # idempotent by construction (it re-plans and no-ops again)
        return {
            "version": base, "files_rewritten": 0, "files_kept": n_all,
            "files_added": 0, "tombstones_added": 0,
            "rows_before": _rows_or_none(table, base),
            "rows_after": _rows_or_none(table, base),
            "replayed": False,
        }

    def _result(version, rewritten, added, tombs):
        return {
            "version": version, "files_rewritten": rewritten,
            "files_kept": n_all - rewritten, "files_added": added,
            "tombstones_added": tombs,
            "rows_before": _rows_or_none(table, base),
            "rows_after": _rows_or_none(table, version),
            "replayed": False,
        }

    def _write_data(parts):
        if not parts:
            return []
        new_rows = reduce(DataFrame.unionByName, parts)
        new_rows, hidden = _pt_materialize(
            new_rows, prev.get("partition_spec")
        )
        if cluster_by or hidden:
            keys = hidden + list(cluster_by or [])
            out = new_rows.repartitionByRange(n_files_new, *keys)
            out = out.sortWithinPartitions(*keys)
        else:
            out = new_rows.repartition(n_files_new)
        commit_dir = os.path.join(table, _DATA, uuid.uuid4().hex)
        out.write.mode("error").parquet(commit_dir)
        entries = _harvest_stats(
            _glob.glob(os.path.join(commit_dir, "*.parquet")),
            list(sc) + hidden, table, _bloom_cols(prev),
            spark=out.sparkSession,
        )
        for e in entries:
            e["seq"] = base + 1  # new files are exempt from older eq deletes
        return entries

    def _manifest(refs, del_refs):
        ks = prev.get("keys", sorted(committed_keys(table)))
        if commit_key is not None:
            ks = sorted(set(ks) | {commit_key})
        return {
            "version": base + 1,
            "mode": "merge",
            "stats_cols": sorted(sc),
            "idempotency_key": commit_key,
            "keys": ks,
            "manifests": refs,
            "deletes": del_refs,
            "eq_deletes": prev.get("eq_deletes", []),
            "partition_spec": prev.get("partition_spec"),
            "partition_specs": _specs_carry(prev, None),
            "refs": prev.get("refs"),
            "schema": evolved_schema or prev.get("schema"),
            "checks": prev.get("checks"),
            "properties": prev.get("properties"),
        }

    # the append relation, shared by both strategies: update replaces
    # matched rows with their source row (all of source when inserting,
    # else only the matched subset); delete+insert appends the source
    # rows whose key matched no live target row
    parts = []
    if when_matched == "update":
        adds = (
            source
            if insert_not_matched
            else source.join(matched_keys, on, "left_semi")
        )
        parts.append(adds.select(*target_cols))
    elif insert_not_matched:
        parts.append(
            source.join(matched_keys, on, "left_anti").select(*target_cols)
        )
    # CHECK enforcement on exactly the source-derived rows this merge
    # adds (survivor rewrites re-commit rows that already passed at
    # their own insert time); `source` is persisted by the caller, so
    # this is one cached-scan job, zero when the table has no checks
    if parts and prev.get("checks"):
        _validate_checks(
            reduce(DataFrame.unionByName, parts), prev["checks"],
            prev.get("schema"), f"snapshot_merge into {table}",
        )

    if strategy == "mor":
        tomb_ref, n_tombs = None, 0
        if matched is not None:
            tomb_ref, n_tombs = _write_delete_commit(
                matched.select("_file", "_pos"), table
            )
        if n_tombs == 0 and not parts:
            return _noop()  # provably nothing to do
        new_entries = _write_data(parts)
        refs = prev["manifests"] + _write_shards(table, new_entries)
        del_refs = list(prev.get("deletes", []))
        if n_tombs:
            del_refs.append(tomb_ref)
        if _try_commit(table, base + 1, _manifest(refs, del_refs)):
            return _result(base + 1, 0, len(new_entries), n_tombs)
        return None

    # ---- copy-on-write ----
    touched_rel: set[str] = set()
    if matched is not None:
        touched_rel = {
            r["_file"] for r in matched.select("_file").distinct().collect()
        }
    if touched_rel:
        # the rewritten relation: live unmatched rows of touched files
        # survive — existing tombstones AND equality deletes aimed at
        # them are purged physically here (the rewritten files' new seq
        # exempts the surviving rows from the old eq files), and
        # matched rows are replaced (via `parts`' adds) or dropped
        surv = _live_rows(
            spark, table, prev,
            sorted(os.path.join(table, p) for p in touched_rel), dv,
        )
        keep = surv.join(skeys, on, "left_anti")
        if new_cols:
            # survivors predate the merge's new columns: typed NULLs,
            # exactly what a read of their un-rewritten siblings serves
            src_types = {f.name: f.dataType for f in source.schema.fields}
            for c in new_cols:
                keep = keep.withColumn(c, F.lit(None).cast(src_types[c]))
        parts.insert(0, keep.select(*target_cols))
    if not parts and not touched_rel:
        return _noop()
    new_entries = _write_data(parts)
    # metadata rebuild: untouched shards keep their existing file
    refs = []
    for ref in prev["manifests"]:
        entries = _read_shard(table, ref)
        surviving = [e for e in entries if e["path"] not in touched_rel]
        if len(surviving) == len(entries):
            refs.append(ref)
        elif surviving:
            refs.append(_write_shard(table, surviving))
    if new_entries:
        refs.extend(_write_shards(table, new_entries))
    # tombstones aimed at rewritten files die with them; survivors are
    # re-committed as one fresh DV file (only when the set actually
    # shrank — one small count() over the tombstone set decides)
    del_refs = list(prev.get("deletes", []))
    if dv is not None and touched_rel:
        tdf = spark.createDataFrame(
            [(p,) for p in sorted(touched_rel)], "_file string"
        )
        keep_dv = dv.join(tdf, "_file", "left_anti")
        n_keep = keep_dv.count()
        if n_keep == 0:
            del_refs = []
        elif n_keep < sum(r["rows"] for r in del_refs):
            ref2, _ = _write_delete_commit(keep_dv, table)
            del_refs = [ref2]
    if _try_commit(table, base + 1, _manifest(refs, del_refs)):
        return _result(base + 1, len(touched_rel), len(new_entries), 0)
    return None


def _eq_merge_commit(
    spark, table, source, on, when_matched, n_files_new,
    cluster_by, stats_cols, max_retries, target_cols,
    commit_key=None, _replay_result=None, evolve_fn=None,
):
    """strategy='eq' commit loop: write one key-valued delete file (and,
    in update mode, the source rows as new data files) — ZERO target
    reads, the whole point. A lost commit race re-stamps the sequence
    number at the new version and rewrites both artifacts (orphans until
    expire, the usual loser's fate). Returns the merge result dict with
    `eq_keys` added and rows_after None (not metadata-derivable)."""
    stamped, eq_ref, n_keys, new_entries, commit_dir = None, None, 0, [], None
    validated_checks = None
    for _ in range(max_retries):
        base = snapshot_versions(table)[-1]
        prev = _read_manifest(table, base)
        if commit_key is not None and commit_key in prev.get(
            "keys", committed_keys(table)
        ):
            return _replay_result(base, prev)  # raced replay: no-op
        # CHECK enforcement: an eq upsert appends every source row
        # (source is persisted by the caller — one cached-scan job,
        # re-run on a lost race only if the check set itself changed)
        checks = prev.get("checks")
        if (
            when_matched == "update"
            and checks
            and checks != validated_checks
        ):
            _validate_checks(
                source.select(*target_cols), checks,
                prev.get("schema"), f"snapshot_merge(eq) into {table}",
            )
            validated_checks = checks
        sc = prev.get("stats_cols", []) if stats_cols is None else stats_cols
        n_all = sum(r["n_files"] for r in prev["manifests"])
        if stamped != base + 1:
            eq_ref, n_keys = _write_eq_delete_commit(
                source, table, on, base + 1
            )
            if when_matched == "update":
                new_rows = source.select(*target_cols)
                new_rows, hidden = _pt_materialize(
                    new_rows, prev.get("partition_spec")
                )
                if cluster_by or hidden:
                    keys = hidden + list(cluster_by or [])
                    out = new_rows.repartitionByRange(n_files_new, *keys)
                    out = out.sortWithinPartitions(*keys)
                else:
                    out = new_rows.repartition(n_files_new)
                commit_dir = os.path.join(table, _DATA, uuid.uuid4().hex)
                out.write.mode("error").parquet(commit_dir)
                new_entries = _harvest_stats(
                    _glob.glob(os.path.join(commit_dir, "*.parquet")),
                    list(sc) + hidden, table, _bloom_cols(prev),
                    spark=out.sparkSession,
                )
                for e in new_entries:
                    # the new files' HIGHER seq exempts them from the eq
                    # delete committed alongside them — an upsert's own
                    # rows survive their own shadow
                    e["seq"] = base + 1
            stamped = base + 1
        refs = prev["manifests"] + _write_shards(table, new_entries)
        ks = prev.get("keys", sorted(committed_keys(table)))
        if commit_key is not None:
            ks = sorted(set(ks) | {commit_key})
        manifest = {
            "version": base + 1,
            "mode": "merge",
            "stats_cols": sorted(sc),
            "idempotency_key": commit_key,
            "keys": ks,
            "manifests": refs,
            "deletes": prev.get("deletes", []),
            "eq_deletes": prev.get("eq_deletes", []) + [eq_ref],
            "partition_spec": prev.get("partition_spec"),
            "partition_specs": _specs_carry(prev, None),
            "refs": prev.get("refs"),
            "schema": evolve_fn(prev) if evolve_fn else prev.get("schema"),
            "checks": prev.get("checks"),
            "properties": prev.get("properties"),
        }
        if _try_commit(table, base + 1, manifest):
            return {
                "version": base + 1, "files_rewritten": 0,
                "files_kept": n_all, "files_added": len(new_entries),
                "tombstones_added": 0, "eq_keys": n_keys,
                "rows_before": _rows_or_none(table, base),
                "rows_after": None, "replayed": False,
            }
    raise ConcurrentModificationError(
        f"snapshot_merge(eq) lost {max_retries} consecutive commit races on {table}"
    )


def snapshot_changes(
    spark: SparkSession,
    table: str,
    from_version: int | None = None,
    to_version: int | None = None,
    files_read: list | None = None,
    from_ts=None,
    to_ts=None,
) -> DataFrame:
    """Row-accurate change-data-feed between two committed versions.
    Endpoints may be given as versions OR as timestamps (from_ts/to_ts —
    epoch, datetime, or ISO string; the Delta readChangeFeed
    startingVersion/startingTimestamp contract). from_ts is INCLUSIVE of
    commits at the probe instant — copying a commit's own timestamp from
    snapshot_history resumes FROM that commit, not after it
    (_resolve_from_ts); to_ts means "up to and including the snapshot
    current at that instant" (_resolve_as_of). Both resolve through the
    monotone-clamped commit times. Each endpoint takes exactly one of
    the two forms:
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
    tests pin that claim on).

    Merge-on-read versions compose: a version's live rows are its data
    files minus its tombstones, so added/removed files are scanned with
    the owning version's DVs applied, and tombstone DELTAS on files
    common to both versions materialize as changes too — a position
    tombstoned in `to` but not `from` is a delete, one tombstoned in
    `from` but not `to` (a rewrite resurrected nothing in practice, but
    the algebra allows it) is an insert. Only data files named by the
    tombstone delta are read for that — still O(changed), never
    O(table)."""
    from pyspark.sql import functions as F

    if (from_version is None) == (from_ts is None):
        raise ValueError("pass exactly one of from_version / from_ts")
    if (to_version is None) == (to_ts is None):
        raise ValueError("pass exactly one of to_version / to_ts")
    if from_ts is not None:
        from_version = _resolve_from_ts(table, from_ts)
        if from_version == 0:
            raise ValueError(
                f"from_ts {from_ts!r} is at or before the first commit "
                f"of {table} — the batch diff needs a base snapshot; "
                "replay the whole history through the CDF STREAM "
                "(startingTimestamp) or pass from_version explicitly"
            )
    if to_ts is not None:
        to_version = _resolve_as_of(table, to_ts)
    versions = snapshot_versions(table)
    for v in (from_version, to_version):
        if v not in versions:
            raise ValueError(f"version {v} not in {versions}")
    ma = _read_manifest(table, from_version)
    mb = _read_manifest(table, to_version)
    # fast path: every step in the range is a content-preserving
    # maintenance commit (compact/binpack/rewrite_deletes stamp
    # data_change=False) — the feed is provably empty, skip the scans
    steps = [v for v in versions if from_version < v <= to_version]
    if steps and all(
        _read_manifest(table, v).get("data_change") is False for v in steps
    ):
        base = snapshot_read(spark, table, version=to_version).limit(0)
        return base.withColumn("_change_type", F.lit("insert")).limit(0)
    a = {
        os.path.abspath(os.path.join(table, e["path"]))
        for e in _all_entries(table, ma)
    }
    bset = {
        os.path.abspath(os.path.join(table, e["path"]))
        for e in _all_entries(table, mb)
    }
    added, removed = sorted(bset - a), sorted(a - bset)
    if files_read is not None:
        files_read.extend(added + removed)
    base = snapshot_read(spark, table, version=to_version).limit(0)
    cols = base.columns

    def _side(paths, dv, eq_manifest):
        """Live rows of `paths` under the to-version SCHEMA (a superset
        under add-only evolution) with the OWNING version's deletes of
        both flavors applied — _file/_pos attached once on the scan."""
        df = _attach_lineage(_scan_data(spark, table, mb, paths))
        if dv is not None:
            df = df.join(dv, ["_file", "_pos"], "left_anti")
        return _apply_eq_deletes(spark, table, eq_manifest, df).select(*cols)

    dv_a = _dv_frame(spark, table, ma)
    dv_b = _dv_frame(spark, table, mb)
    add_df = _side(added, dv_b, mb) if added else base
    rem_df = _side(removed, dv_a, ma) if removed else base
    ins_side, del_side = add_df, rem_df
    # EQUALITY-delete deltas on files COMMON to both versions (delta
    # rows on added/removed files are already handled by the sides
    # above). Both directions matter: an eq file present only in `to`
    # shadows rows that were live at `from` (-> deletes); one present
    # only in `from` (a rollback past an eq merge) un-shadows rows that
    # are live at `to` (-> inserts). Candidates are stats/seq-pruned;
    # reads stay O(affected files).
    eq_a = {e["path"]: e for e in _eq_entries(table, ma)}
    eq_b = {e["path"]: e for e in _eq_entries(table, mb)}
    new_eq = [e for p, e in eq_b.items() if p not in eq_a]
    gone_eq = [e for p, e in eq_a.items() if p not in eq_b]

    def _eq_delta_rows(delta_eq, own_manifest, other_dv):
        """Rows of common files live under `own_manifest`'s deletes that
        the `delta_eq` files shadow — computed as live MINUS
        live-after-applying-delta. Rows positionally tombstoned in the
        OTHER version are excluded: the DV-delta block below already
        accounts for them, and emitting both would double-count a row
        hit by both mechanisms inside one range."""
        by_path = {e["path"]: e for e in _all_entries(table, own_manifest)}
        cand = []
        for p in sorted(os.path.relpath(x, table) for x in (a & bset)):
            e = by_path.get(p)
            if e is None:
                continue
            for q in delta_eq:
                if int(e.get("seq", 0)) >= int(q["seq"]):
                    continue
                k = q["on"][0]
                qb = q["stats"].get(k)
                eb = e["stats"].get(k)
                if qb is not None and eb is not None and (
                    eb[0] > qb[1] or eb[1] < qb[0]
                ):
                    continue
                cand.append(p)
                break
        if not cand:
            return None
        if files_read is not None:
            files_read.extend(
                os.path.abspath(os.path.join(table, p)) for p in cand
            )
        dv_own = _dv_frame(spark, table, own_manifest)
        live = _attach_lineage(_scan_data(
            spark, table, mb, [os.path.join(table, p) for p in cand]
        ))
        if dv_own is not None:
            live = live.join(dv_own, ["_file", "_pos"], "left_anti")
        if other_dv is not None:
            live = live.join(other_dv, ["_file", "_pos"], "left_anti")
        live = _apply_eq_deletes(spark, table, own_manifest, live)
        return live.exceptAll(
            _apply_eq_deletes(
                spark, table, own_manifest, live, eq_entries=delta_eq
            )
        ).select(*cols)

    if new_eq:
        eq_dead = _eq_delta_rows(new_eq, ma, dv_b)
        if eq_dead is not None:
            del_side = del_side.unionByName(eq_dead)
    if gone_eq:
        eq_back = _eq_delta_rows(gone_eq, mb, dv_a)
        if eq_back is not None:
            ins_side = ins_side.unionByName(eq_back)
    if dv_a is not None or dv_b is not None:
        empty_dv = spark.createDataFrame([], "_file string, _pos bigint")
        da = dv_a if dv_a is not None else empty_dv
        db = dv_b if dv_b is not None else empty_dv
        # tombstone deltas, restricted to files COMMON to both versions:
        # deltas on added files are already excluded by add_df's DV
        # subtraction, deltas on removed files by rem_df's
        arel = {os.path.relpath(p, table) for p in added}
        rrel = {os.path.relpath(p, table) for p in removed}
        new_t = db.exceptAll(da)
        if arel:
            new_t = new_t.where(~F.col("_file").isin(sorted(arel)))
        gone_t = da.exceptAll(db)
        if rrel:
            gone_t = gone_t.where(~F.col("_file").isin(sorted(rrel)))

        def _rows_at(tombs: DataFrame, eq_manifest=None) -> DataFrame | None:
            tfiles = sorted(
                r["_file"] for r in tombs.select("_file").distinct().collect()
            )
            if not tfiles:
                return None
            if files_read is not None:
                files_read.extend(
                    os.path.abspath(os.path.join(table, p)) for p in tfiles
                )
            rows = _attach_lineage(
                _scan_data(
                    spark, table, mb, [os.path.join(table, p) for p in tfiles]
                )
            ).join(tombs, ["_file", "_pos"], "left_semi")
            if eq_manifest is not None:
                # a DV-resurrected row still shadowed by a persisting eq
                # file is NOT live at `to` — keep it out of the feed
                rows = _apply_eq_deletes(spark, table, eq_manifest, rows)
            return rows.select(*cols)

        newly_tombed = _rows_at(new_t)
        resurrected = _rows_at(gone_t, eq_manifest=mb)
        if newly_tombed is not None:
            del_side = del_side.unionByName(newly_tombed)
        if resurrected is not None:
            ins_side = ins_side.unionByName(resurrected)
    ins = ins_side.exceptAll(del_side).withColumn("_change_type", F.lit("insert"))
    dels = del_side.exceptAll(ins_side).withColumn("_change_type", F.lit("delete"))
    return ins.unionByName(dels)


def snapshot_history(table: str) -> list[dict]:
    """DESCRIBE HISTORY: one dict per committed version, ascending —
    {'version', 'timestamp', 'mode', 'n_files', 'rows', 'tombstones',
    'n_columns', 'idempotency_key', 'rolled_back_to'} — answered from
    manifest lists alone (O(#versions) metadata reads, zero shard or
    data IO). `timestamp` is the commit wall-clock time, monotone-
    clamped across versions (see _version_times); None for manifests
    predating timestamp stamping. `rows` is None for versions carrying
    EQUALITY deletes (a key may shadow zero or many rows, so no honest
    metadata count exists) — history recovers exact counts at the next
    snapshot_rewrite_deletes fold, one more reason to run that
    maintenance pass regularly on CDC-ingesting tables."""
    out = []
    prev_t = 0.0
    for v in snapshot_versions(table):
        m = _read_manifest(table, v)
        sch = m.get("schema")
        eq_keys = sum(r["rows"] for r in m.get("eq_deletes", []))
        raw_t = m.get("ts")
        if raw_t is not None:
            prev_t = max(prev_t, float(raw_t))
        out.append(
            {
                "version": v,
                "timestamp": None if raw_t is None else prev_t,
                "mode": m.get("mode"),
                "n_files": sum(r["n_files"] for r in m["manifests"]),
                # a live-row count is not derivable under equality
                # deletes (a key may shadow zero or many rows): None
                "rows": None
                if eq_keys
                else sum(r["rows"] for r in m["manifests"])
                - sum(r["rows"] for r in m.get("deletes", [])),
                "tombstones": sum(r["rows"] for r in m.get("deletes", [])),
                "eq_delete_keys": eq_keys,
                "n_columns": len(sch["fields"]) if sch else None,
                "idempotency_key": m.get("idempotency_key"),
                "rolled_back_to": m.get("rolled_back_to"),
            }
        )
    return out


def snapshot_rollback(table: str, to_version: int, max_retries: int = 10) -> int:
    """Roll the table back to `to_version`'s state by committing a NEW
    version whose manifest references exactly the old version's shards,
    delete files, schema, and idempotency keys — an O(metadata) flip,
    zero data IO (the Iceberg rollback shape: history moves forward,
    content moves back). The rolled-past versions stay readable until
    expired, and their data files are only collectable once no surviving
    manifest references them — which the shard reuse here guarantees for
    everything `to_version` still needs. Returns the new version."""
    versions = snapshot_versions(table)
    if to_version not in versions:
        raise ValueError(f"version {to_version} not in {versions}")
    src = _read_manifest(table, to_version)
    for _ in range(max_retries):
        base = snapshot_versions(table)[-1]
        if base == to_version:
            return base  # already there: nothing to flip
        cur_keys = committed_keys(table)
        cur_prev = _read_manifest(table, base)
        manifest = {
            "version": base + 1,
            "mode": "rollback",
            "rolled_back_to": to_version,
            "stats_cols": src.get("stats_cols", []),
            "idempotency_key": None,
            # keys accumulate MONOTONICALLY even across a rollback: a
            # replayed micro-batch whose append is being rolled past must
            # still be recognized as already-committed, not re-appended
            "keys": sorted(cur_keys),
            "manifests": src["manifests"],
            "deletes": src.get("deletes", []),
            "eq_deletes": src.get("eq_deletes", []),
            "partition_spec": src.get("partition_spec"),
            # spec history stays MONOTONE across a rollback (like keys):
            # surviving old-spec files must keep pruning correctly
            "partition_specs": _specs_carry(
                cur_prev, src.get("partition_spec")
            ),
            # tags are POINTERS to versions, not content: they survive a
            # rollback unchanged (like keys — the tagged version is
            # still the tagged version)
            "refs": cur_prev.get("refs"),
            "schema": src.get("schema"),
            "checks": src.get("checks"),
            "properties": src.get("properties"),
        }
        if _try_commit(table, base + 1, manifest):
            return base + 1
    raise ConcurrentModificationError(
        f"snapshot_rollback lost {max_retries} consecutive commit races on {table}"
    )


def _meta_commit(
    table: str,
    field: str,
    mutate,
    mode: str,
    max_retries: int,
    data_change: bool | None = None,
) -> int:
    """Commit a metadata-only version whose `field` dict is
    mutate(current value); every other manifest field carries forward
    (the shared machinery under check and tag mutations). Returns the
    new version (or the current one when mutate is a no-op).
    data_change=False marks the commit CDF-silent."""
    versions = snapshot_versions(table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    for _ in range(max_retries):
        base = snapshot_versions(table)[-1]
        prev = _read_manifest(table, base)
        new = mutate(dict(prev.get(field) or {}))
        if new == (prev.get(field) or {}):
            return base  # already in the requested state
        manifest = {
            "version": base + 1,
            "mode": mode,
            "stats_cols": prev.get("stats_cols", []),
            "idempotency_key": None,
            "keys": prev.get("keys", sorted(committed_keys(table))),
            "manifests": prev["manifests"],
            "deletes": prev.get("deletes", []),
            "eq_deletes": prev.get("eq_deletes", []),
            "partition_spec": prev.get("partition_spec"),
            "partition_specs": _specs_carry(prev, None),
            "refs": prev.get("refs"),
            "schema": prev.get("schema"),
            "checks": prev.get("checks"),
            "properties": prev.get("properties"),
        }
        manifest[field] = new or None
        if data_change is not None:
            manifest["data_change"] = data_change
        if _try_commit(table, base + 1, manifest):
            return base + 1
    raise ConcurrentModificationError(
        f"{mode} lost {max_retries} consecutive commit races on {table}"
    )


def _checks_commit(table: str, mutate, mode: str, max_retries: int) -> int:
    return _meta_commit(table, "checks", mutate, mode, max_retries)


def _column_refs_guard(table: str, manifest: dict, col: str, verb: str) -> None:
    """Refuse a rename/drop of a column something else still derives
    meaning from — each refusal names the remedy, never silently
    degrades: partition transforms (hidden columns embed the source
    name), CHECK constraints (expressions reference it by name), and
    OUTSTANDING equality-delete files (their key lists anti-join by
    name against every future read)."""
    import re as _re

    for s in _all_specs(manifest) or []:
        for t in s:
            if t[1] == col:
                raise ValueError(
                    f"cannot {verb} {col!r}: a partition transform "
                    f"{tuple(t)} derives from it — evolve the spec off "
                    "the column first (snapshot_set_partition_spec)"
                )
    for name, expr in (manifest.get("checks") or {}).items():
        if _re.search(rf"\b{_re.escape(col)}\b", expr):
            raise ValueError(
                f"cannot {verb} {col!r}: CHECK {name!r} ({expr}) "
                "references it — drop the constraint first "
                "(snapshot_drop_check)"
            )
    for e in _eq_entries(table, manifest):
        if col in e["on"]:
            raise ValueError(
                f"cannot {verb} {col!r}: outstanding equality-delete "
                "files key on it — fold them first "
                "(snapshot_rewrite_deletes)"
            )


def _schema_commit(table: str, mode: str, mutate, max_retries: int) -> int:
    """Commit loop for schema-shape metadata commits (rename/drop):
    mutate(prev) returns the full replacement manifest dict, or raises.
    CDF-silent (no rows changed); every other field carries forward
    inside mutate itself."""
    versions = snapshot_versions(table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    for _ in range(max_retries):
        base = snapshot_versions(table)[-1]
        prev = _read_manifest(table, base)
        manifest = mutate(prev)
        manifest["version"] = base + 1
        manifest["mode"] = mode
        manifest["data_change"] = False
        if _try_commit(table, base + 1, manifest):
            return base + 1
    raise ConcurrentModificationError(
        f"{mode} lost {max_retries} consecutive commit races on {table}"
    )


def snapshot_rename_column(
    table: str, old: str, new: str, max_retries: int = 10
) -> int:
    """ALTER TABLE ... RENAME COLUMN — one metadata-only, CDF-silent
    commit; ZERO data rewritten (the Delta column-mapping / Iceberg
    field-id rename shape, realized by name history instead of ids).

    The recorded schema renames the field in place; the table's COLUMN
    MAPPING property records {new: [old, ...older names]} so reads
    resolve the value from whichever physical name each file was
    written under (_scan_data coalesces across the history — sound
    because every file carries exactly one of the names), stats/bloom
    pruning probes the history too (_stat_lookup), stats_cols/
    bloom_cols follow the rename, and maintenance rewrites normalize
    files to the new name as they touch them. Time travel is untouched:
    a pre-rename version still reads under its own recorded schema.

    Refused, by name, when something still derives meaning from the old
    name (partition transforms, CHECK constraints, outstanding equality
    deletes) or the new name collides with a live column, a historical
    physical name, or a dropped column."""
    if old == new:
        raise ValueError("rename requires two different names")

    def mutate(prev: dict) -> dict:
        sch = prev.get("schema")
        names = [f["name"] for f in (sch or {}).get("fields", [])]
        if old not in names:
            raise ValueError(f"no column {old!r} in {sorted(names)}")
        mapping = _col_mapping(prev)
        dropped = _dropped_cols(prev)
        taken = set(names) | set(dropped) | {
            o for olds in mapping.values() for o in olds
        }
        if new in taken:
            raise ValueError(
                f"cannot rename to {new!r}: the name is (or was) in use "
                "— a live column, a former physical name, or a dropped "
                "column whose values still exist in old files"
            )
        _column_refs_guard(table, prev, old, "rename")
        fields = [
            {**f, "name": new} if f["name"] == old else f
            for f in sch["fields"]
        ]
        mapping[new] = [old] + mapping.pop(old, [])
        props = dict(prev.get("properties") or {})
        props["column_mapping"] = mapping
        if old in (props.get("bloom_cols") or []):
            props["bloom_cols"] = sorted(
                new if c == old else c for c in props["bloom_cols"]
            )
        return {
            "stats_cols": sorted(
                new if c == old else c
                for c in prev.get("stats_cols", [])
            ),
            "idempotency_key": None,
            "keys": prev.get("keys", sorted(committed_keys(table))),
            "manifests": prev["manifests"],
            "deletes": prev.get("deletes", []),
            "eq_deletes": prev.get("eq_deletes", []),
            "partition_spec": prev.get("partition_spec"),
            "partition_specs": _specs_carry(prev, None),
            "refs": prev.get("refs"),
            "schema": {**sch, "fields": fields},
            "checks": prev.get("checks"),
            "properties": props,
        }

    return _schema_commit(table, "rename_column", mutate, max_retries)


# Safe type promotions (the Delta type-widening matrix, minus anything
# lossy): integer chain upward, float->double, small-int->double.
# long->double is EXCLUDED — doubles lose integer precision past 2^53.
_WIDEN_OK = {
    "byte": {"short", "integer", "long", "double"},
    "short": {"integer", "long", "double"},
    "integer": {"long", "double"},
    "float": {"double"},
}


def snapshot_widen_column(
    table: str, col: str, to_type: str, max_retries: int = 10
) -> int:
    """ALTER TABLE ... TYPE widening — one metadata-only, CDF-silent
    commit, zero data rewritten: the recorded schema's field takes the
    wider type and every reader upcasts old files at scan time (Spark's
    parquet reader and the CDF stream's per-field Arrow cast both
    promote int->long / float->double natively). Only the provably
    lossless matrix is allowed (_WIDEN_OK — notably NOT long->double);
    a column that partition transforms, CHECK constraints, or
    outstanding equality deletes derive from is refused by name (the
    conservative posture: e.g. a bucket transform hashes the value's
    string form, which an int->double widening would change)."""

    def mutate(prev: dict) -> dict:
        sch = prev.get("schema")
        fields = (sch or {}).get("fields", [])
        cur = next((f for f in fields if f["name"] == col), None)
        if cur is None:
            raise ValueError(
                f"no column {col!r} in {sorted(f['name'] for f in fields)}"
            )
        frm = cur["type"] if isinstance(cur["type"], str) else None
        if frm == to_type:
            raise ValueError(f"{col!r} is already {to_type}")
        if frm not in _WIDEN_OK or to_type not in _WIDEN_OK[frm]:
            raise ValueError(
                f"cannot widen {col!r} {frm} -> {to_type}: only the "
                f"lossless promotions {_WIDEN_OK} are supported "
                "(narrowing or precision-losing changes need a rewrite)"
            )
        _column_refs_guard(table, prev, col, "widen")
        return {
            "stats_cols": prev.get("stats_cols", []),
            "idempotency_key": None,
            "keys": prev.get("keys", sorted(committed_keys(table))),
            "manifests": prev["manifests"],
            "deletes": prev.get("deletes", []),
            "eq_deletes": prev.get("eq_deletes", []),
            "partition_spec": prev.get("partition_spec"),
            "partition_specs": _specs_carry(prev, None),
            "refs": prev.get("refs"),
            "schema": {
                **sch,
                "fields": [
                    {**f, "type": to_type} if f["name"] == col else f
                    for f in fields
                ],
            },
            "checks": prev.get("checks"),
            "properties": prev.get("properties"),
        }

    return _schema_commit(table, "widen_column", mutate, max_retries)


def snapshot_drop_column(table: str, col: str, max_retries: int = 10) -> int:
    """ALTER TABLE ... DROP COLUMN — metadata-only, CDF-silent, zero
    data rewritten: the recorded schema loses the field, so every read
    projects it away; the physical values linger in old files until
    maintenance rewrites them. The dropped name (and its whole physical
    name history, if it had been renamed) is RETAINED in the table's
    dropped_cols property, and snapshot_write refuses to re-add any of
    those names — re-using the name would silently resurrect the old
    files' values (the trap Iceberg's field ids exist to prevent). An
    overwrite (truncate-and-load) resets both properties: new content,
    new name world. Same reference guards as rename."""

    def mutate(prev: dict) -> dict:
        sch = prev.get("schema")
        names = [f["name"] for f in (sch or {}).get("fields", [])]
        if col not in names:
            raise ValueError(f"no column {col!r} in {sorted(names)}")
        if len(names) == 1:
            raise ValueError("cannot drop the only column")
        _column_refs_guard(table, prev, col, "drop")
        mapping = _col_mapping(prev)
        dropped = _dropped_cols(prev)
        dropped = sorted(set(dropped) | {col} | set(mapping.pop(col, [])))
        props = dict(prev.get("properties") or {})
        props["column_mapping"] = mapping
        props["dropped_cols"] = dropped
        if col in (props.get("bloom_cols") or []):
            props["bloom_cols"] = sorted(
                c for c in props["bloom_cols"] if c != col
            )
        return {
            "stats_cols": sorted(
                c for c in prev.get("stats_cols", []) if c != col
            ),
            "idempotency_key": None,
            "keys": prev.get("keys", sorted(committed_keys(table))),
            "manifests": prev["manifests"],
            "deletes": prev.get("deletes", []),
            "eq_deletes": prev.get("eq_deletes", []),
            "partition_spec": prev.get("partition_spec"),
            "partition_specs": _specs_carry(prev, None),
            "refs": prev.get("refs"),
            "schema": {
                **sch,
                "fields": [f for f in sch["fields"] if f["name"] != col],
            },
            "checks": prev.get("checks"),
            "properties": props,
        }

    return _schema_commit(table, "drop_column", mutate, max_retries)


def snapshot_set_check(
    spark: SparkSession,
    table: str,
    name: str,
    expr: str,
    validate: bool = True,
    max_retries: int = 10,
) -> int:
    """ALTER TABLE ... ADD CONSTRAINT ... CHECK (the Delta shape):
    record a named SQL predicate in the manifest. Every subsequent
    commit that adds rows — write/append, streamed appends, all three
    merge strategies, the CDC sink — validates exactly its NEW rows
    (one column-pruned job) and raises CheckViolation instead of
    committing when any evaluates to FALSE; NULL/UNKNOWN passes (SQL
    CHECK semantics), so add-only schema evolution's NULL backfill
    never violates a check on an evolved column.

    By default the EXISTING content is validated first (one scan, like
    Delta's ADD CONSTRAINT), making the recorded check a table-wide
    invariant; pass validate=False to adopt it for new rows only. The
    commit itself is metadata-only (O(manifest), the usual optimistic
    retry). Rollback restores the checks recorded AT the target version
    (metadata moves back with content). An overwrite that DROPS a
    checked column is rejected at that overwrite (the check no longer
    resolves against the schema the commit would record) — drop the
    check explicitly with snapshot_drop_check when retiring its column.
    Returns the new version."""
    versions = snapshot_versions(table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    cur = _read_manifest(table, versions[-1]).get("checks") or {}
    if name in cur:
        # resolve redefinitions BEFORE paying the content scan: an
        # identical re-add is an idempotent no-op (already validated at
        # its original add), a conflicting one is a caller error
        if cur[name] == expr:
            return versions[-1]
        raise ValueError(
            f"check {name!r} already exists with a different "
            f"expression {cur[name]!r}; drop it first"
        )
    if validate:
        _validate_checks(
            snapshot_read(spark, table), {name: expr}, None,
            f"the existing content of {table} (ADD CONSTRAINT validation)",
        )

    def mutate(checks: dict) -> dict:
        if name in checks and checks[name] != expr:
            raise ValueError(
                f"check {name!r} already exists with a different "
                f"expression {checks[name]!r}; drop it first"
            )
        checks[name] = expr
        return checks

    return _checks_commit(table, mutate, "set_check", max_retries)


def snapshot_drop_check(
    table: str, name: str, max_retries: int = 10
) -> int:
    """Drop a named CHECK constraint (metadata-only commit). Unknown
    names raise KeyError — dropping a constraint you never had is a
    caller bug, not a no-op."""

    def mutate(checks: dict) -> dict:
        if name not in checks:
            raise KeyError(
                f"no CHECK constraint {name!r} on the table "
                f"(recorded: {sorted(checks) or 'none'})"
            )
        del checks[name]
        return checks

    return _checks_commit(table, mutate, "drop_check", max_retries)


def snapshot_set_partition_spec(
    table: str, spec: list | None, max_retries: int = 10
) -> int:
    """Partition-spec EVOLUTION (the Iceberg spec-evolution shape):
    change the table's CURRENT spec with ONE metadata-only commit — no
    history rewrite, no data rewrite, O(manifest) cost.

    How old files stay correct: a file's layout is recorded by the
    hidden partition columns its manifest stats carry (the per-file
    spec record — name encodes transform kind, arg, and source column),
    and every spec ever active stays in the manifest's
    `partition_specs` history. `partition_prune` probes through ALL of
    them, so files written under a retired spec prune through THEIR
    hidden columns, files written after this commit through the new
    spec's, and a file carrying neither is kept (safe, merely
    unpruned). Writes after this commit lay out under the new spec
    (inheritance unchanged); compaction / binpack / rewrite-deletes /
    merge rewrites MIGRATE the files they touch to the current spec
    (_pt_materialize re-derives on every rewrite path), so maintenance
    gradually retires the old layout without a big-bang rewrite.

    Pass [] or None to CLEAR the spec (new files unpartitioned). The
    commit is data_change=false — CDF consumers skip it. Returns the
    new version (the current one when already equal)."""
    new = _pt_validate(spec) if spec else None
    versions = snapshot_versions(table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    norm = [list(t) for t in (new or [])]
    for _ in range(max_retries):
        base = snapshot_versions(table)[-1]
        prev = _read_manifest(table, base)
        if [list(t) for t in (prev.get("partition_spec") or [])] == norm:
            return base  # already in the requested state
        manifest = {
            "version": base + 1,
            "mode": "set_partition_spec",
            "data_change": False,  # metadata-only: CDF-silent step
            "stats_cols": prev.get("stats_cols", []),
            "idempotency_key": None,
            "keys": prev.get("keys", sorted(committed_keys(table))),
            "manifests": prev["manifests"],
            "deletes": prev.get("deletes", []),
            "eq_deletes": prev.get("eq_deletes", []),
            "partition_spec": new,
            "partition_specs": _specs_carry(prev, new),
            "refs": prev.get("refs"),
            "schema": prev.get("schema"),
            "checks": prev.get("checks"),
            "properties": prev.get("properties"),
        }
        if _try_commit(table, base + 1, manifest):
            return base + 1
    raise RuntimeError(
        f"snapshot_set_partition_spec lost {max_retries} consecutive "
        f"commit races on {table}"
    )


def _no_tag_error(name: str, refs: dict) -> KeyError:
    return KeyError(
        f"no tag {name!r} on the table (recorded: {sorted(refs) or 'none'})"
    )


def snapshot_optimize(
    spark: SparkSession,
    table: str,
    target_rows: int = 500_000,
    cluster_by: list[str] | None = None,
    keep_last: int = 2,
    max_age_s: float | None = None,
    clean_orphans: bool = True,
    orphan_grace_s: float = 3600.0,
) -> dict:
    """ONE scheduled maintenance call per table (the Delta
    OPTIMIZE-then-VACUUM pairing): in order,
      1. snapshot_rewrite_deletes — fold BOTH delete flavors back into
         the data, restoring anti-join-free reads and metadata counts
         (and un-bricking everything the honesty rules disable under
         outstanding eq deletes);
      2. snapshot_binpack — repack streaming-ingest small-file sprawl
         toward target_rows-sized files (touches only the sprawl);
      3. snapshot_expire — drop history past keep_last/max_age_s
         (tagged versions stay pinned) and GC orphans older than
         orphan_grace_s (one hour by default — the live-deployment-safe
         fence for in-flight writers, unlike expire's raw 0).
    Every step is the existing O(affected) operation; a no-op table
    costs three manifest reads. Returns {'rewrite_deletes', 'binpack',
    'expire'} with each step's result dict."""
    return {
        "rewrite_deletes": snapshot_rewrite_deletes(
            spark, table, cluster_by=cluster_by
        ),
        "binpack": snapshot_binpack(
            spark, table, target_rows=target_rows, cluster_by=cluster_by
        ),
        "expire": snapshot_expire(
            table, keep_last=keep_last, max_age_s=max_age_s,
            clean_orphans=clean_orphans, orphan_grace_s=orphan_grace_s,
        ),
    }


def snapshot_tag(table: str, name: str, version: int | None = None,
                 max_retries: int = 10) -> int:
    """Create or move a NAMED TAG pointing at `version` (default:
    current) — the Iceberg tag shape: a stable name for a snapshot
    ('v2026-08-audit', 'training-cut-42') that time travel can resolve
    (snapshot_read(tag=...)) and that snapshot_expire PROTECTS — a
    tagged version survives both keep_last and max_age_s until the tag
    is dropped. One metadata-only CDF-silent commit; tags survive
    rollback (they point at versions, not content). Returns the new
    table version."""
    versions = snapshot_versions(table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    target = versions[-1] if version is None else version
    if target not in versions:
        raise ValueError(f"version {target} not in {versions}")

    def mutate(refs: dict) -> dict:
        refs[name] = target
        return refs

    return _meta_commit(table, "refs", mutate, "tag", max_retries,
                        data_change=False)


def snapshot_drop_tag(table: str, name: str, max_retries: int = 10) -> int:
    """Drop a named tag (metadata-only CDF-silent commit); its version
    becomes expirable again. Unknown names raise KeyError."""

    def mutate(refs: dict) -> dict:
        if name not in refs:
            raise _no_tag_error(name, refs)
        del refs[name]
        return refs

    return _meta_commit(table, "refs", mutate, "drop_tag", max_retries,
                        data_change=False)


# --------------------------------------------------------------------------
# BRANCHES (writable refs) — the natural completion of write-audit-publish:
# tags (above) are read-only pins; a branch is a WRITABLE lineage you
# commit to, audit, and FAST-FORWARD main onto as one atomic commit (the
# Iceberg branch + fast_forward shape).
#
# Implementation: a branch is a full snapshot table rooted at
# <table>/branches/<name>, bootstrapped ZERO-COPY from main's current
# snapshot — live data/delete files and manifest shards are adopted at
# IDENTICAL table-relative paths (hard links on a local FS: no bytes
# move and main expiring its own path can't pull the inode out from
# under the branch; server-side copies on an object store). Because the
# branch is an ordinary table, every operation — write, merge, CDC sink,
# compact, checks, WAP — works on it unchanged, and its history diverges
# independently. Creating a branch commits NOTHING on main (so creating
# branch B never breaks branch A's fast-forward condition); instead
# snapshot_expire scans live branch workspaces and keeps each one's
# branch-point version alive on main (the Iceberg ref-retention rule,
# extended from tags to writable refs).
#
# Fast-forward requires main to still BE at the branch point (the
# fast-forward condition; a moved main raises — re-branch and replay,
# exactly like git). The ff itself adopts every branch object main lacks
# (identical rel paths, so only the branch's NEW commits' files move)
# and commits the branch head's manifest as main's next version in ONE
# conditional put — readers see the whole branch history land atomically
# or not at all. Keyed `ff-<name>-<branch head version>`: a replay
# no-ops. GC safety is structural: main's expire never scans
# branches/ subtrees, a branch's own expire touches only its paths, and
# shared immutable files survive either side's unlink via link counts.
# --------------------------------------------------------------------------

_BRANCHES = "branches"


def snapshot_branch_path(table: str, name: str) -> str:
    return os.path.join(table, _BRANCHES, name)


def _adopt_rel(st, src_root: str, dst_root: str, rel: str) -> int:
    """Adopt one object at its identical table-relative path; 0 if the
    destination already has it (shared base content)."""
    dst = os.path.join(dst_root, rel)
    if os.path.exists(dst):
        return 0
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    st.adopt_file(os.path.join(src_root, rel), dst)
    return 1


def snapshot_branch_create(table: str, name: str) -> str:
    """Create writable branch `name` from the table's current snapshot;
    returns the branch workspace path (a full snapshot table). See the
    section comment for semantics. The workspace build is staged under a
    tmp name and renamed into place, so a crashed create leaves no
    half-branch under the visible name."""
    if "/" in name or name.startswith("."):
        raise ValueError(f"invalid branch name {name!r}")
    versions = snapshot_versions(table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    bp = snapshot_branch_path(table, name)
    if os.path.isdir(bp):
        raise ValueError(f"branch {name!r} already exists on {table}")
    base = versions[-1]
    m = _read_manifest(table, base)
    st = store_for(table)
    tmp = os.path.join(table, _BRANCHES, f".tmp-{uuid.uuid4().hex}")
    try:
        for r in (
            m["manifests"] + m.get("deletes", []) + m.get("eq_deletes", [])
        ):
            _adopt_rel(st, table, tmp, r["path"])
        for e in (
            _all_entries(table, m)
            + _all_entries(table, m, "deletes")
            + _all_entries(table, m, "eq_deletes")
        ):
            _adopt_rel(st, table, tmp, e["path"])
        head = dict(m)
        # tags point at main versions the branch doesn't carry; the
        # branch starts with no refs of its own
        head["refs"] = None
        head["mode"] = "branch"
        head["properties"] = {
            **(m.get("properties") or {}),
            "branch_of": os.path.abspath(table),
            "branch_base": base,
        }
        os.makedirs(os.path.join(tmp, _MANIFESTS), exist_ok=True)
        st.put_json(_manifest_path(tmp, base), head)
        os.rename(tmp, bp)
    except BaseException:
        import shutil as _shutil

        _shutil.rmtree(tmp, ignore_errors=True)
        raise
    return bp


def snapshot_branches(table: str) -> dict[str, int]:
    """Live branches: {name: branch-point version}. Discovered from the
    workspaces (creating/dropping a branch never commits on main)."""
    out: dict[str, int] = {}
    for bdir in store_for(table).list_glob(
        os.path.join(table, _BRANCHES, "*")
    ):
        name = os.path.basename(bdir)
        if name.startswith("."):  # half-built tmp workspace
            continue
        bvs = snapshot_versions(bdir)
        if not bvs:
            continue
        bb = (
            _read_manifest(bdir, bvs[-1]).get("properties") or {}
        ).get("branch_base")
        if bb is not None:
            out[name] = int(bb)
    return out


def snapshot_branch_fastforward(
    spark: SparkSession, table: str, name: str
) -> dict:
    """Fast-forward main onto branch `name`'s head as ONE atomic commit
    (see the section comment). Requires main to still be at the branch
    point; a moved main — including one that moves DURING this call (the
    commit race loser) — raises by name instead of merging divergent
    histories. Keyed `ff-<name>-<head version>`: replays no-op. Returns
    {'version', 'objects_adopted', 'noop'}."""
    bp = snapshot_branch_path(table, name)
    bversions = snapshot_versions(bp)
    if not bversions:
        raise FileNotFoundError(f"no branch {name!r} under {table}")
    bh = bversions[-1]
    bm = _read_manifest(bp, bh)
    props = dict(bm.get("properties") or {})
    base = props.pop("branch_base", None)
    props.pop("branch_of", None)
    if base is None:
        raise ValueError(
            f"{bp} carries no branch_base marker — not a branch workspace"
        )
    ff_key = f"ff-{name}-{bh}"
    main_latest = snapshot_versions(table)[-1]
    prev = _read_manifest(table, main_latest)
    prev_keys = set(prev.get("keys", committed_keys(table)))
    if ff_key in prev_keys:
        return {"version": main_latest, "objects_adopted": 0, "noop": True}
    if main_latest != int(base):
        raise ValueError(
            f"fast-forward refused: {table} advanced to v{main_latest} "
            f"past the branch point v{base} — the branch no longer "
            "fast-forwards; create a fresh branch and replay onto it"
        )
    st = store_for(table)
    adopted = 0
    for r in (
        bm["manifests"] + bm.get("deletes", []) + bm.get("eq_deletes", [])
    ):
        adopted += _adopt_rel(st, bp, table, r["path"])
    for e in (
        _all_entries(bp, bm)
        + _all_entries(bp, bm, "deletes")
        + _all_entries(bp, bm, "eq_deletes")
    ):
        adopted += _adopt_rel(st, bp, table, e["path"])
    new_refs = dict(prev.get("refs") or {})
    manifest = {
        "version": main_latest + 1,
        "mode": "fastforward",
        "stats_cols": bm.get("stats_cols", prev.get("stats_cols", [])),
        "idempotency_key": ff_key,
        # branch commit keys ride along: an exactly-once feed that wrote
        # to the branch and replays against main after the ff no-ops
        "keys": sorted(prev_keys | set(bm.get("keys", [])) | {ff_key}),
        "manifests": bm["manifests"],
        "deletes": bm.get("deletes", []),
        "eq_deletes": bm.get("eq_deletes", []),
        "partition_spec": bm.get("partition_spec"),
        "partition_specs": bm.get("partition_specs") or _specs_carry(bm, None),
        "refs": new_refs or None,
        "schema": bm.get("schema"),
        "checks": bm.get("checks"),
        "properties": {**(prev.get("properties") or {}), **props} or None,
    }
    if not _try_commit(table, main_latest + 1, manifest):
        raise ValueError(
            f"fast-forward refused: a commit raced onto {table} at the "
            "branch point — the fast-forward condition no longer holds"
        )
    return {
        "version": main_latest + 1, "objects_adopted": adopted,
        "noop": False,
    }


def snapshot_branch_drop(table: str, name: str) -> None:
    """Drop branch `name`: remove the workspace (its branch point on
    main becomes expirable again — see snapshot_expire's branch scan).
    Idempotent — a missing branch is not an error (the crash-retry
    direction)."""
    import shutil as _shutil

    _shutil.rmtree(snapshot_branch_path(table, name), ignore_errors=True)


def snapshot_expire(
    table: str,
    keep_last: int = 1,
    clean_orphans: bool = False,
    orphan_grace_s: float = 0.0,
    max_age_s: float | None = None,
    catalogs: list[str] | None = None,
) -> dict:
    """Garbage collection: drop all but the last `keep_last` manifest
    lists, then delete manifest shards and data files referenced by NO
    surviving list. clean_orphans additionally removes shards/files no
    list EVER referenced (crashed writes); orphan_grace_s is the
    commit-age fence a live deployment needs — an unreferenced file
    younger than the grace window is presumed to belong to an IN-FLIGHT
    write (data lands before its manifest commit) and is kept for a
    later pass. The 0 default sweeps everything, correct only when the
    caller knows no writer is active (the tests' posture).

    max_age_s adds RETENTION-BY-AGE (the Delta/Iceberg
    retention-period contract): every version whose monotone-clamped
    commit timestamp is within the window is ALSO kept, on top of the
    keep_last floor, PLUS the newest version at-or-before the window's
    start — that boundary version was the CURRENT snapshot at the
    oldest instant still inside the window, so an `as_of` probe
    anywhere in the advertised retention period keeps resolving. So
    `keep_last=1, max_age_s=7*86400` reads as "time travel works for a
    week, and the latest version always survives".

    `catalogs` closes the CROSS-PLANE retention gap: a version pinned by
    a multi-table catalog (ops/catalog.py) lives in the catalog's
    manifest, which this table's GC otherwise cannot see — an aggressive
    expire would collect a version external readers still resolve
    through the catalog. Passing the catalog dirs retains every version
    their LATEST manifests pin for THIS table, the same ref-retention
    rule tags and branches get. (Older catalog manifests are themselves
    retention-managed by catalog_expire and intentionally don't pin.)
    Returns {'manifests_dropped': n, 'files_deleted': n}."""
    st = store_for(table)
    versions = snapshot_versions(table)
    keep = list(versions[-keep_last:]) if keep_last > 0 else []
    if max_age_s is not None:
        cutoff = _now() - max_age_s
        vt = _version_times(table)
        young = {v for v, t in vt if t >= cutoff}
        boundary = [v for v, t in vt if t < cutoff]
        if boundary:
            # current at the window's start: as_of(cutoff) resolves here
            young.add(boundary[-1])
        keep = sorted(set(keep) | young)
    if versions:
        # TAGGED versions are pinned until their tag is dropped
        # (snapshot_tag — the Iceberg ref-retention rule)
        tagged = set(
            (_read_manifest(table, versions[-1]).get("refs") or {}).values()
        )
        # ...and so are live branches' branch-point versions (writable
        # refs — snapshot_branch_create): dropped with the workspace
        tagged |= set(snapshot_branches(table).values())
        # ...and versions the given catalogs' latest manifests pin for
        # this table (the cross-plane ref-retention rule)
        if catalogs:
            from .catalog import catalog_resolve

            abs_table = os.path.abspath(table)
            for cat in catalogs:
                for tdir, ver in catalog_resolve(cat).values():
                    if os.path.abspath(tdir) == abs_table:
                        tagged.add(int(ver))
        if tagged:
            keep = sorted(set(keep) | (tagged & set(versions)))
    dropped = 0
    live: set[str] = set()
    live_shards: set[str] = set()
    for v in keep:
        m = _read_manifest(table, v)
        live_shards.update(
            os.path.abspath(os.path.join(table, r["path"]))
            for r in m["manifests"]
            + m.get("deletes", [])
            + m.get("eq_deletes", [])
        )
        live.update(
            os.path.abspath(os.path.join(table, e["path"]))
            for e in _all_entries(table, m)
            + _all_entries(table, m, "deletes")
            + _all_entries(table, m, "eq_deletes")
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
            + m.get("deletes", [])
            + m.get("eq_deletes", [])
        )
        referenced_dead.update(
            os.path.abspath(os.path.join(table, e["path"]))
            for e in _all_entries(table, m)
            + _all_entries(table, m, "deletes")
            + _all_entries(table, m, "eq_deletes")
        )
        st.delete(_manifest_path(table, v))
        dropped += 1
    deleted = 0
    victims = referenced_dead - live
    shard_victims = dead_shards - live_shards
    if clean_orphans:
        import time as _time

        cutoff = _time.time() - orphan_grace_s

        def _expired(p: str) -> bool:
            t = st.mtime(p)
            # vanished underneath us -> nothing to delete
            return t is not None and t <= cutoff

        on_disk = {
            os.path.abspath(p)
            for p in st.list_glob(os.path.join(table, _DATA, "*", "*.parquet"))
            if _expired(p)
        } | {
            os.path.abspath(p)
            for p in st.list_glob(
                os.path.join(table, _DELETES, "*", "*.parquet")
            )
            if _expired(p)
        }
        victims |= on_disk - live
        shards_on_disk = {
            os.path.abspath(p)
            for p in st.list_glob(os.path.join(table, _MANIFESTS, "m-*.json"))
            if _expired(p)
        }
        shard_victims |= shards_on_disk - live_shards
    for path in victims:
        if os.path.exists(path):
            st.delete(path)
            deleted += 1
    for path in shard_victims:
        with _SHARD_CACHE_LOCK:
            _SHARD_CACHE.pop(path, None)  # deleted shard must not ghost-serve
        st.delete(path)
    # drop commit dirs holding no parquet anymore (only _SUCCESS/.crc
    # write crumbs remain once their data files were collected). The same
    # age fence applies: an in-flight write's dir looks empty while its
    # files sit under _temporary/. FS hygiene only — object stores have
    # no directories (the store method is a no-op there).
    import time as _time

    dir_cutoff = _time.time() - orphan_grace_s
    st.cleanup_empty_dirs(os.path.join(table, _DATA), dir_cutoff)
    st.cleanup_empty_dirs(os.path.join(table, _DELETES), dir_cutoff)
    return {"manifests_dropped": dropped, "files_deleted": deleted}
