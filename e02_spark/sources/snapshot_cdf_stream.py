"""Streaming CHANGE-DATA-FEED source over the snapshot-manifest table
(ops/snapshot.py) — the Delta `readChangeFeed` shape, and the consumer
that survives the maintenance operations the append-only
`snapshot_stream` source must fence on.

Contract: rows are the table's columns plus
    _change_type    STRING  'insert' | 'delete'
    _commit_version BIGINT  the version whose commit produced the change
i.e. exactly the batch `ops/snapshot.snapshot_changes` shape (which
`ops/ivm.apply_agg_delta` consumes), with commit provenance added — an
update appears as its delete+insert pair.

Planning (all driver-side, all from metadata — no Spark jobs):

- OFFSETS are snapshot VERSION numbers, identical to snapshot_stream:
  `{"version": N}` = "changes of every commit <= vN emitted". Replay of
  any (start, end] range is byte-stable because version content is
  immutable.
- The range is planned PER VERSION STEP (v -> v+1), never as one
  endpoint diff: per-step semantics make maintenance skipping exact and
  stamp each row with its true _commit_version.
- A step whose manifest carries `data_change: false`
  (compact / binpack / rewrite_deletes) provably preserved table
  content: the step contributes NOTHING — this is what lets a streamed
  table undergo compaction without fencing or churning O(table)
  delete+insert pairs through the feed.
- A data-changing step contributes one InputPartition per CHANGED file:
    * file added in the step   -> its rows minus the step's tombstones
                                  on it               => 'insert'
    * file removed in the step -> its rows minus the PRIOR version's
                                  tombstones on it    => 'delete'
    * file common to both sides with a tombstone DELTA (merge-on-read):
      rows AT newly-tombstoned positions => 'delete'; rows at positions
      un-tombstoned (algebraically possible, practically rare)
      => 'insert'.
  Positional-delete files are small by invariant (bounded by rows
  matched since the last rewrite), so their position sets are read
  driver-side with pyarrow and shipped inside the partition — the
  executor read stays a single-file Arrow scan with a row-index filter,
  no joins. A delete file ABOVE the driver-shipping cap
  (maxDeleteRows) never bricks the stream: the slice ships the delete
  FILE PATH instead and the executor reads/applies it during the scan
  (see _DELETE_ROWS_CAP).
- Cost per micro-batch is O(changed files + tombstone bytes), never
  O(table): an append streams only its new files, a MoR merge streams
  only the tombstoned positions and the appended replacements, and
  maintenance streams nothing.

Equality-delete commits (snapshot_merge strategy='eq') stream too —
round 9, lifting the round-8 fence: eq-delete files are O(source keys)
small by the same maintenance invariant as DVs, so their key sets are
read driver-side and shipped inside the partition like DV position
sets. A step that ADDS an eq file plans one partition per seq/stats-
applicable common file emitting live rows whose key the new file
shadows => 'delete'; a step that DROPS one (rollback past an eq merge)
emits the un-shadowed live rows => 'insert'. Added/removed-file slices
additionally carry the OWNING version's applicable eq shadows, so a
CoW rewrite of a file with outstanding eq deletes streams exactly its
LIVE rows (the batch `_side` semantics) — never resurrects shadowed
ones. Rows positionally tombstoned in the other version are excluded
from eq slices (the DV-delta slices own them), mirroring the batch
double-count rule. NULL keys never match (SQL equality).

Usage:
    spark.dataSource.register(SnapshotCDFStreamDataSource)
    df = (spark.readStream.format("snapshot_changes_stream")
          .option("table", "/path/to/tbl").load())
or `read_snapshot_changes_stream(spark, table)`.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


# Driver-shipping cap, in ROWS per delete file (positions for DVs, keys
# for eq files), decided from the MANIFEST row count — zero reads. A
# delete file AT or under the cap is read driver-side and its
# positions/keys ship inside the InputPartition (cheapest for the
# executor: a pre-computed filter, no extra I/O). A file ABOVE the cap
# is never materialized on the driver: the slice carries the delete
# FILE PATH instead and the EXECUTOR reads/applies it during the scan
# (the same side the batch path anti-joins on) — degraded to one extra
# executor-side Arrow read per slice, never a driver OOM, never a
# refused stream. 2M rows ≈ tens of MB pickled is comfortably
# driver-safe and far above any table honoring the fold-deletes
# maintenance invariant (which snapshot_cdc_sink now auto-enforces —
# see ops/snapshot.snapshot_cdc_sink auto_fold_rows).
_DELETE_ROWS_CAP = 2_000_000


_CDF_COLS_JSON = (
    '{"name":"_change_type","type":"string","nullable":false,"metadata":{}},'
    '{"name":"_commit_version","type":"long","nullable":false,"metadata":{}}'
)


def _dv_state(
    table: str, manifest: dict, cap: int = _DELETE_ROWS_CAP
) -> tuple[dict[str, frozenset[int]], list[tuple[str, tuple | None]]]:
    """One committed manifest's positional-delete state, split by the
    driver-shipping cap: (eager, lazy).

    eager: per-data-file tombstoned-position sets from DV files at or
    under the cap, read driver-side with pyarrow (memoized — DV files
    are immutable once referenced).
    lazy: [(abs DV path, (_file min, _file max) bounds or None)] for DV
    files ABOVE the cap (decided from the manifest row count, zero
    reads): these are applied EXECUTOR-side per slice, pruned per data
    file via the DV file's harvested `_file` bounds."""
    from ..ops.snapshot import _all_entries

    out: dict[str, set[int]] = {}
    lazy: list[tuple[str, tuple | None]] = []
    for e in _all_entries(table, manifest, "deletes"):
        path = os.path.abspath(os.path.join(table, e["path"]))
        if int(e.get("rows", 0)) > cap:
            b = (e.get("stats") or {}).get("_file")
            lazy.append((path, (b[0], b[1]) if b is not None else None))
            continue
        for f, p in _read_dv_file(path):
            out.setdefault(f, set()).add(p)
    return {f: frozenset(s) for f, s in out.items()}, lazy


def _dv_lazy_for(
    lazy: list[tuple[str, tuple | None]], rel_path: str
) -> tuple[str, ...]:
    """The over-cap DV paths whose `_file` bounds could reference
    `rel_path` (boundless files are kept — safe direction)."""
    return tuple(
        p for p, b in lazy if b is None or (b[0] <= rel_path <= b[1])
    )


_DV_FILE_MEMO: dict[str, list[tuple[str, int]]] = {}
# The memos are touched from whatever thread runs stream planning; the
# reader is driver-side single-threaded today, but two streams over the
# same table in one process would race the FIFO eviction (same hazard
# _SHARD_CACHE guards against). Reads happen OUTSIDE the lock.
import threading as _threading

_MEMO_LOCK = _threading.Lock()


def _read_dv_file(path: str) -> list[tuple[str, int]]:
    with _MEMO_LOCK:
        hit = _DV_FILE_MEMO.get(path)
    if hit is None:
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["_file", "_pos"])
        hit = list(
            zip(t.column("_file").to_pylist(), t.column("_pos").to_pylist())
        )
        with _MEMO_LOCK:
            _DV_FILE_MEMO[path] = hit
            while len(_DV_FILE_MEMO) > 1024:  # bounded: re-readable
                _DV_FILE_MEMO.pop(next(iter(_DV_FILE_MEMO)))
    return hit


_EQ_FILE_MEMO: dict[str, tuple[tuple, ...]] = {}


def _read_eq_keys(path: str, on: list[str]) -> tuple[tuple, ...]:
    """One eq-delete file's key tuples, read driver-side — callers gate
    on the manifest row count so only at-or-under-cap files reach here.
    Keys with any NULL component never match (SQL equality) and are
    dropped here once instead of re-checked per row. Memoized — eq
    files are immutable once referenced."""
    with _MEMO_LOCK:
        hit = _EQ_FILE_MEMO.get(path)
    if hit is None:
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=list(on))
        cols = [t.column(c).to_pylist() for c in on]
        hit = tuple(k for k in zip(*cols) if None not in k)
        with _MEMO_LOCK:
            _EQ_FILE_MEMO[path] = hit
            while len(_EQ_FILE_MEMO) > 1024:
                _EQ_FILE_MEMO.pop(next(iter(_EQ_FILE_MEMO)))
    return hit


def _eq_applicable(
    table: str, eq_entries: list[dict], e: dict, cap: int = _DELETE_ROWS_CAP
):
    """The eq-delete key specs that can shadow rows of data-file entry
    `e`: seq-scoped (eq applies only below its seq) and stats-pruned on
    the first key column — the same applicability rule as
    ops/snapshot._apply_eq_deletes / snapshot_changes. Each spec is a
    (key_cols, key_tuples, eq_path) triple: at-or-under-cap files ship
    their key tuples (eq_path None); over-cap files ship only the PATH
    (key_tuples None) and the executor reads the keys itself."""
    out = []
    for q in eq_entries:
        if int(e.get("seq", 0)) >= int(q["seq"]):
            continue
        k = q["on"][0]
        qb = (q.get("stats") or {}).get(k)
        eb = (e.get("stats") or {}).get(k)
        if qb is not None and eb is not None and (
            eb[0] > qb[1] or eb[1] < qb[0]
        ):
            continue
        path = os.path.abspath(os.path.join(table, q["path"]))
        if int(q.get("rows", 0)) > cap:
            out.append((tuple(q["on"]), None, path))
            continue
        keys = _read_eq_keys(path, q["on"])
        if keys:
            out.append((tuple(q["on"]), keys, None))
    return tuple(out)


class _ChangeSlice(InputPartition):
    """One changed file's contribution to a micro-batch.

    include: emit ONLY these row indices (tombstone-delta slices);
    exclude: emit all rows EXCEPT these (added/removed-file slices);
    at most one of the two is non-None.

    match:  ((key_cols, key_tuples, eq_path), ...) — emit only rows
            whose key is in SOME spec's set (eq-delta slices; None =
            every row). key_tuples is None for an over-cap eq file: the
            executor reads the keys from eq_path itself.
    shadow: same shape — additionally DROP rows whose key is in some
            spec's set (the owning version's outstanding eq deletes).

    Executor-side (over-cap) positional state — paths, not positions:
    rel_path:      the data file's table-relative path (what DV files'
                   `_file` column stores), needed to filter them.
    lazy_exclude:  DV file paths whose positions for rel_path join the
                   exclude set (added/removed/eq-delta slices).
    lazy_delta:    (eager_a, dv_paths_a, eager_b, dv_paths_b) or None —
                   a tombstone-delta slice where either version's DV
                   state for this file is over-cap: the executor
                   derives include = (b − a) for 'delete' slices and
                   (a − b) for 'insert' slices, where x = eager_x ∪
                   positions(dv_paths_x, rel_path)."""

    def __init__(
        self,
        path: str,
        change_type: str,
        commit_version: int,
        schema_json: str,
        include: tuple[int, ...] | None = None,
        exclude: tuple[int, ...] | None = None,
        match: tuple | None = None,
        shadow: tuple = (),
        rel_path: str | None = None,
        lazy_exclude: tuple[str, ...] = (),
        lazy_delta: tuple | None = None,
        mapping: tuple = (),
    ):
        self.path = path
        self.change_type = change_type
        self.commit_version = commit_version
        self.schema_json = schema_json
        self.include = include
        self.exclude = exclude
        self.match = match
        self.shadow = shadow
        self.rel_path = rel_path
        self.lazy_exclude = lazy_exclude
        self.lazy_delta = lazy_delta
        # ((logical, (former physical names...)), ...) — the PINNED
        # column mapping (snapshot_rename_column history as of stream
        # start): the executor resolves a pinned column absent from an
        # old file through its name history instead of NULL-backfilling
        self.mapping = mapping


def manifest_or_lag_error(table: str, version: int, source: str) -> dict:
    """Manifest read with the streaming-consumer LAG CONTRACT spelled
    out: a cursor version expired out from under a lagging capped stream
    raises this NAMED error (shared by the CDF and the append-only
    sources) instead of a raw FileNotFoundError the operator cannot
    act on."""
    from ..ops.snapshot import _read_manifest

    try:
        return _read_manifest(table, version)
    except FileNotFoundError:
        raise ValueError(
            f"{source} needs v{version} of {table} "
            f"but snapshot_expire collected it — restart from a fresh "
            f"checkpoint (keep expire's keep_last above the slowest "
            f"consumer's lag)"
        ) from None


class SnapshotCDFStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        self.table = options.get("table")
        if not self.table:
            raise ValueError(
                "snapshot_changes_stream requires .option('table', path)"
            )
        self._start_ts = options.get("startingtimestamp")
        if self._start_ts is not None and "startingversion" in options:
            raise ValueError(
                "pass startingVersion OR startingTimestamp, not both"
            )
        self.start_version = int(options.get("startingversion", 0))
        # per-delete-file driver-shipping cap (rows): files above it
        # are applied executor-side instead of shipped in task
        # payloads; see _DELETE_ROWS_CAP
        self.max_delete_rows = int(
            options.get("maxdeleterows", _DELETE_ROWS_CAP)
        )
        # ADMISSION CONTROL (maxFilesPerTrigger / maxRowsPerTrigger /
        # maxBytesPerTrigger — the Delta rate-limit options): a stream
        # catching up on a deep version
        # backlog otherwise plans the whole range as ONE micro-batch.
        # latestOffset advances the offset only as far as the caps
        # allow, so catch-up is incremental and memory-bounded; weights
        # come from SHARD-REF diffs between consecutive manifests (zero
        # shard reads — changed shards are new ref paths by
        # immutability, so the ref-level n_files/rows of added+removed
        # shards upper-bound the step's changed files/rows). At least
        # one version is always admitted per trigger (progress
        # guarantee), so a single over-cap commit still flows.
        self.max_files_per_trigger = (
            int(options.get("maxfilespertrigger", 0)) or None
        )
        self.max_rows_per_trigger = (
            int(options.get("maxrowspertrigger", 0)) or None
        )
        # bytes come from the shard refs' harvested file sizes; shards
        # written before byte harvesting weigh 0 there (admission then
        # degrades toward the progress floor — bounded by the other
        # caps, never wrong)
        self.max_bytes_per_trigger = (
            int(options.get("maxbytespertrigger", 0)) or None
        )
        # last version handed to the engine (initialOffset / planned /
        # committed) — the admission base. None until anchored: a fresh
        # stream anchors at the initial version (see latestOffset), a
        # restart at the checkpointed range the engine re-plans through
        # partitions() before its first latestOffset.
        self._cursor: int | None = None
        import json

        from ..ops.snapshot import _read_manifest, snapshot_versions

        versions = snapshot_versions(self.table)
        if not versions:
            raise FileNotFoundError(
                f"no committed snapshots under {self.table}"
            )
        sch = _read_manifest(self.table, versions[-1]).get("schema")
        if sch is None:
            raise ValueError(
                "snapshot_changes_stream needs a manifest-recorded schema "
                "(tables written before schema tracking must be compacted "
                "once to record one)"
            )
        self._schema_json = json.dumps(sch)
        self._pinned = {
            f["name"]: f.get("type") for f in sch.get("fields", [])
        }
        # the PINNED column mapping, from the same manifest as the
        # pinned schema: it covers every former physical name up to the
        # pin, so pre-rename steps' files resolve correctly; a rename
        # landing after the pin is caught by the step fence below
        from ..ops.snapshot import _col_mapping

        self._mapping_t = tuple(
            (k, tuple(v))
            for k, v in sorted(
                _col_mapping(
                    _read_manifest(self.table, versions[-1])
                ).items()
            )
        )

    # -- driver-side planning ------------------------------------------------
    def initialOffset(self) -> dict:
        # startingTimestamp resolves LAZILY, here: initialOffset is only
        # consulted when no checkpoint exists, so a restart from a
        # checkpoint never re-resolves the timestamp — expiring the
        # pre-T history cannot brick an established stream. INCLUSIVE
        # semantics (the Delta readChangeFeed startingTimestamp
        # contract): changes of every commit whose clamped time is AT or
        # after T are emitted — the offset is the last version strictly
        # BEFORE T.
        v0 = self._initial_version()
        self._cursor = v0
        return {"version": v0}

    def _initial_version(self) -> int:
        if self._start_ts is not None:
            from ..ops.snapshot import _resolve_from_ts

            return _resolve_from_ts(self.table, self._start_ts)
        return self.start_version

    @staticmethod
    def _ref_weights(a: dict | None, b: dict) -> tuple[int, int, int]:
        """(files, rows, bytes) upper bound on the a->b step's changed
        data, from shard-ref paths alone (manifest JSON, zero shard
        reads)."""

        def _refs(m):
            if m is None:
                return {}
            return {
                r["path"]: r
                for k in ("manifests", "deletes", "eq_deletes")
                for r in (m.get(k) or [])
            }

        ra, rb = _refs(a), _refs(b)
        changed = [rb[p] for p in rb.keys() - ra.keys()] + [
            ra[p] for p in ra.keys() - rb.keys()
        ]
        return (
            sum(int(r.get("n_files") or 0) for r in changed),
            sum(int(r.get("rows") or 0) for r in changed),
            sum(int(r.get("bytes") or 0) for r in changed),
        )

    def latestOffset(self) -> dict:
        from ..ops.snapshot import snapshot_versions

        versions = snapshot_versions(self.table)
        latest = versions[-1] if versions else 0
        cap_f, cap_r = self.max_files_per_trigger, self.max_rows_per_trigger
        cap_b = self.max_bytes_per_trigger
        cur = self._cursor
        if cur is None:
            # the engine consults latestOffset BEFORE initialOffset on a
            # fresh stream (observed call order), so an unanchored
            # cursor means either (a) fresh stream — the engine's start
            # WILL be _initial_version(), making it the correct
            # admission base — or (b) a restart, where the engine
            # re-plans the checkpointed last batch through partitions()
            # BEFORE its first latestOffset (also observed), anchoring
            # the cursor there first; this branch then never sees a
            # restart. Anchoring at the initial version is therefore
            # safe: admission never returns an offset behind the
            # engine's start (no offset rewind, no replay).
            cur = self._initial_version()
        if (
            cap_f is None and cap_r is None and cap_b is None
        ) or cur >= latest:
            self._cursor = max(latest, cur)
            return {"version": self._cursor}
        files = rows = nbytes = 0
        admitted = cur
        prev_m = self._manifest_or_lag_error(cur) if cur > 0 else None
        for v in versions:
            if not (cur < v <= latest):
                continue
            m = self._manifest_or_lag_error(v)
            wf, wr, wb = self._ref_weights(prev_m, m)
            over = (
                (cap_f is not None and files + wf > cap_f)
                or (cap_r is not None and rows + wr > cap_r)
                or (cap_b is not None and nbytes + wb > cap_b)
            )
            if over and admitted > cur:
                break  # this version waits for the next trigger
            files += wf
            rows += wr
            nbytes += wb
            admitted = v
            prev_m = m
            if (
                (cap_f is not None and files >= cap_f)
                or (cap_r is not None and rows >= cap_r)
                or (cap_b is not None and nbytes >= cap_b)
            ):
                break
        self._cursor = admitted
        return {"version": admitted}

    def _manifest_or_lag_error(self, version: int) -> dict:
        return manifest_or_lag_error(
            self.table, version, "snapshot_changes_stream"
        )

    def partitions(self, start: dict, end: dict):
        from ..ops.snapshot import _all_entries, _eq_entries, snapshot_versions

        lo, hi = start["version"], end["version"]
        # the engine's planned range is authoritative (a restart replans
        # a checkpointed range this reader object never saw): admission
        # resumes from its end, so rate limiting is restart-stable
        self._cursor = max(self._cursor or 0, hi)
        steps = [v for v in snapshot_versions(self.table) if lo < v <= hi]
        out: list[_ChangeSlice] = []
        prev_m = self._manifest_or_lag_error(lo) if lo > 0 else None
        for v in steps:
            m = self._manifest_or_lag_error(v)
            try:
                # SCHEMA fence, relative to the PINNED schema: the feed
                # can represent everything the pin already accounts for
                # — added columns older steps predate (NULL backfill),
                # renames/drops AT OR BEFORE the pin (former physical
                # names resolve through the pinned mapping; dropped
                # columns are simply projected away, the batch-at-`to`
                # semantics), and widenings at or before the pin (narrow
                # files upcast to the pinned type). What it CANNOT
                # represent is a change landing AFTER the pin: a step
                # whose schema loses a column the pin still carries, or
                # records a type the pinned type cannot losslessly hold.
                # Raise by name; the consumer restarts under the new
                # schema.
                from ..ops.snapshot import _WIDEN_OK

                step_f = {
                    f["name"]: f.get("type")
                    for f in (m.get("schema") or {}).get("fields", [])
                }
                prev_f = {
                    f["name"]: f.get("type")
                    for f in ((prev_m or {}).get("schema") or {}).get(
                        "fields", []
                    )
                }
                gone = (set(prev_f) - set(step_f)) & set(self._pinned)
                if step_f and gone:
                    raise ValueError(
                        f"snapshot CDF stream fence: column(s) "
                        f"{sorted(gone)} were renamed or dropped at "
                        f"{self.table} v{v} after the stream pinned its "
                        "schema — restart the stream to adopt the new "
                        "schema (snapshot_rename_column/"
                        "snapshot_drop_column)"
                    )
                # a non-string step type (struct/map dict — nothing the
                # widen API emits today, but future schema shapes) is
                # never widen-compatible with a pinned primitive: treat
                # the mismatch as hot rather than letting the unhashable
                # dict reach _WIDEN_OK.get and raise a bare TypeError
                hot = sorted(
                    n
                    for n, t in step_f.items()
                    if n in self._pinned
                    and t != self._pinned[n]
                    and (
                        not isinstance(t, str)
                        or self._pinned[n] not in _WIDEN_OK.get(t, ())
                    )
                )
                if hot:
                    raise ValueError(
                        f"snapshot CDF stream fence: column(s) {hot} "
                        f"carry a type at {self.table} v{v} that the "
                        "stream's pinned schema cannot hold losslessly "
                        "(snapshot_widen_column after the pin) — "
                        "restart the stream to adopt the wider type"
                    )
                if m.get("data_change") is False:
                    continue  # maintenance step: provably content-neutral
                ents_a = (
                    {e["path"]: e for e in _all_entries(self.table, prev_m)}
                    if prev_m is not None
                    else {}
                )
                ents_b = {e["path"]: e for e in _all_entries(self.table, m)}
                a, b = set(ents_a), set(ents_b)
                eq_a = _eq_entries(self.table, prev_m) if prev_m else []
                eq_b = _eq_entries(self.table, m)
                cap = self.max_delete_rows
                dv_a, dvlazy_a = (
                    _dv_state(self.table, prev_m, cap)
                    if prev_m is not None and prev_m.get("deletes")
                    else ({}, [])
                )
                dv_b, dvlazy_b = (
                    _dv_state(self.table, m, cap)
                    if m.get("deletes")
                    else ({}, [])
                )
                for p in sorted(b - a):  # added files -> live rows insert
                    out.append(
                        _ChangeSlice(
                            os.path.join(self.table, p), "insert", v,
                            self._schema_json,
                            mapping=self._mapping_t,
                            exclude=tuple(sorted(dv_b.get(p, ()))),
                            shadow=_eq_applicable(self.table, eq_b, ents_b[p], cap),
                            rel_path=p,
                            lazy_exclude=_dv_lazy_for(dvlazy_b, p),
                        )
                    )
                for p in sorted(a - b):  # removed files -> live rows delete
                    out.append(
                        _ChangeSlice(
                            os.path.join(self.table, p), "delete", v,
                            self._schema_json,
                            mapping=self._mapping_t,
                            exclude=tuple(sorted(dv_a.get(p, ()))),
                            shadow=_eq_applicable(self.table, eq_a, ents_a[p], cap),
                            rel_path=p,
                            lazy_exclude=_dv_lazy_for(dvlazy_a, p),
                        )
                    )
                for p in sorted(a & b):  # tombstone deltas on kept files
                    lz_a = _dv_lazy_for(dvlazy_a, p)
                    lz_b = _dv_lazy_for(dvlazy_b, p)
                    d0 = dv_a.get(p, frozenset())
                    d1 = dv_b.get(p, frozenset())
                    if lz_a or lz_b:
                        # over-cap DV state on either side: ship the
                        # spec, the executor derives both direction
                        # deltas (an empty delta yields no rows)
                        spec = (
                            tuple(sorted(d0)), lz_a,
                            tuple(sorted(d1)), lz_b,
                        )
                        for ctype in ("delete", "insert"):
                            out.append(
                                _ChangeSlice(
                                    os.path.join(self.table, p), ctype, v,
                                    self._schema_json,
                                    mapping=self._mapping_t,
                                    rel_path=p,
                                    lazy_delta=spec,
                                )
                            )
                        continue
                    newly = d1 - d0
                    gone = d0 - d1
                    if newly:
                        out.append(
                            _ChangeSlice(
                                os.path.join(self.table, p), "delete", v,
                                self._schema_json,
                                mapping=self._mapping_t,
                                include=tuple(sorted(newly)),
                            )
                        )
                    if gone:
                        out.append(
                            _ChangeSlice(
                                os.path.join(self.table, p), "insert", v,
                                self._schema_json,
                                mapping=self._mapping_t,
                                include=tuple(sorted(gone)),
                            )
                        )
                # equality-delete DELTAS on kept files: an added eq file
                # shadows previously-live rows => deletes; a dropped one
                # (rollback past an eq merge) un-shadows => inserts. One
                # partition per seq/stats-applicable file; rows
                # positionally tombstoned in EITHER version are excluded
                # (the DV-delta slices own those), and rows already
                # shadowed at the owning version don't re-emit.
                eq_a_by = {e["path"]: e for e in eq_a}
                eq_b_by = {e["path"]: e for e in eq_b}
                new_eq = [e for p2, e in eq_b_by.items() if p2 not in eq_a_by]
                gone_eq = [e for p2, e in eq_a_by.items() if p2 not in eq_b_by]
                for delta, ctype, own_eq in (
                    (new_eq, "delete", eq_a),
                    (gone_eq, "insert", eq_b),
                ):
                    if not delta:
                        continue
                    for p in sorted(a & b):
                        ent = ents_b[p]
                        match = _eq_applicable(self.table, delta, ent, cap)
                        if not match:
                            continue
                        pos = dv_a.get(p, frozenset()) | dv_b.get(
                            p, frozenset()
                        )
                        out.append(
                            _ChangeSlice(
                                os.path.join(self.table, p), ctype, v,
                                self._schema_json,
                                mapping=self._mapping_t,
                                exclude=tuple(sorted(pos)),
                                match=match,
                                shadow=_eq_applicable(
                                    self.table, own_eq, ent, cap
                                ),
                                rel_path=p,
                                lazy_exclude=_dv_lazy_for(dvlazy_a, p)
                                + _dv_lazy_for(dvlazy_b, p),
                            )
                        )
            finally:
                prev_m = m
        return out

    def commit(self, end: dict) -> None:
        # offsets live in the stream's checkpoint; nothing to GC — but
        # the committed end anchors admission after a restart whose
        # first engine call is commit-then-latestOffset
        self._cursor = max(self._cursor or 0, end["version"])

    # -- executor-side read --------------------------------------------------
    def read(self, partition: _ChangeSlice):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        tbl_schema = StructType.fromJson(json.loads(partition.schema_json))
        want = to_arrow_schema(tbl_schema)
        pf = pq.ParquetFile(partition.path)
        have = set(pf.schema_arrow.names)
        aliases = {k: list(v) for k, v in partition.mapping}

        def _physical(name: str) -> str | None:
            """The name this FILE carries the logical column under: the
            logical name itself, or the first former physical name
            present (snapshot_rename_column history) — None when the
            file genuinely predates the column."""
            if name in have:
                return name
            for old in aliases.get(name, ()):
                if old in have:
                    return old
            return None
        import numpy as np

        def _lazy_positions(paths: tuple[str, ...]) -> set[int]:
            """Positions for THIS data file from over-cap DV files,
            read executor-side. The predicate pushes to row groups —
            DV files are written sorted by (_file, _pos)."""
            pos: set[int] = set()
            for dvp in paths:
                t = pq.read_table(
                    dvp, columns=["_pos"],
                    filters=[("_file", "==", partition.rel_path)],
                )
                pos.update(t.column("_pos").to_pylist())
            return pos

        include = (
            np.asarray(partition.include, dtype=np.int64)
            if partition.include is not None
            else None
        )
        if partition.lazy_delta is not None:
            # over-cap tombstone delta: derive the include set here
            ea, lza, eb, lzb = partition.lazy_delta
            d0 = set(ea) | _lazy_positions(lza)
            d1 = set(eb) | _lazy_positions(lzb)
            delta = d1 - d0 if partition.change_type == "delete" else d0 - d1
            if not delta:
                return
            include = np.asarray(sorted(delta), dtype=np.int64)
        exc_set = set(partition.exclude or ())
        if partition.lazy_exclude:
            exc_set |= _lazy_positions(partition.lazy_exclude)
        exclude = (
            np.asarray(sorted(exc_set), dtype=np.int64) if exc_set else None
        )
        eq_key_cache: dict[str, tuple[tuple, ...]] = {}

        def _spec_keys(on, keys, eq_path):
            """An eq spec's key tuples: shipped eagerly, or read here
            (over-cap files — executor-side, once per slice read).
            NULL-component keys never match and are dropped."""
            if keys is not None:
                return keys
            hit = eq_key_cache.get(eq_path)
            if hit is None:
                t = pq.read_table(eq_path, columns=list(on))
                cols_ = [t.column(c).to_pylist() for c in on]
                hit = tuple(k for k in zip(*cols_) if None not in k)
                eq_key_cache[eq_path] = hit
            return hit

        def _keys_mask(batch, specs, n):
            """OR over (key_cols, key_tuples, eq_path) specs: True where
            the row's key is in some spec's set. Single-column keys go
            through Arrow is_in (vectorized); composite keys through a
            python set of tuples (eq key sets are merge-source sized)."""
            import pyarrow.compute as pc

            acc = np.zeros(n, dtype=bool)
            names = set(batch.schema.names)
            for on, keys, eq_path in specs:
                # each eq key column resolves through the rename name
                # history for THIS file (a post-rename eq spec must
                # still match rows in files written under the old name)
                phys = [_physical(c) for c in on]
                if any(p is None or p not in names for p in phys):
                    # a pre-evolution data file lacking an evolved eq-key
                    # column: the column reads as all-NULL and NULL keys
                    # never match (SQL equality) — the batch path's
                    # NULL-backfill behavior, not a KeyError
                    continue
                keys = _spec_keys(on, keys, eq_path)
                if not keys:
                    continue
                if len(on) == 1:
                    m = pc.is_in(
                        batch.column(phys[0]),
                        value_set=pa.array([k[0] for k in keys]),
                    )
                    acc |= pc.fill_null(m, False).to_numpy(
                        zero_copy_only=False
                    )
                else:
                    ks = frozenset(keys)
                    cols = [batch.column(c).to_pylist() for c in phys]
                    acc |= np.fromiter(
                        (t in ks for t in zip(*cols)), dtype=bool, count=n
                    )
            return acc

        offset = 0
        read_cols = [
            p
            for p in (_physical(n) for n in want.names)
            if p is not None
        ]
        for batch in pf.iter_batches(columns=read_cols):
            n = batch.num_rows
            mask = None
            idx = None
            if include is not None or exclude is not None:
                idx = np.arange(offset, offset + n, dtype=np.int64)
            if include is not None:
                mask = np.isin(idx, include)
            elif exclude is not None:
                mask = ~np.isin(idx, exclude)
            offset += n
            if partition.match is not None:
                km = _keys_mask(batch, partition.match, n)
                mask = km if mask is None else (mask & km)
            if partition.shadow:
                sm = ~_keys_mask(batch, partition.shadow, n)
                mask = sm if mask is None else (mask & sm)
            if mask is not None:
                batch = batch.filter(pa.array(mask))
                if batch.num_rows == 0:
                    continue
            cols = []
            for field in want:
                p = _physical(field.name)
                if p is not None:
                    cols.append(batch.column(p).cast(field.type))
                else:  # file predates this column: NULL backfill
                    cols.append(pa.nulls(batch.num_rows, type=field.type))
            m = batch.num_rows
            cols.append(pa.array([partition.change_type] * m, type=pa.string()))
            cols.append(
                pa.array([partition.commit_version] * m, type=pa.int64())
            )
            yield pa.RecordBatch.from_arrays(
                cols,
                schema=pa.schema(
                    list(want)
                    + [
                        pa.field("_change_type", pa.string(), False),
                        pa.field("_commit_version", pa.int64(), False),
                    ]
                ),
            )


class SnapshotCDFStreamDataSource(DataSource):
    def __init__(self, options=None):
        super().__init__(options)
        self._reader: SnapshotCDFStreamReader | None = None

    def _get_reader(self) -> SnapshotCDFStreamReader:
        # one reader serves both schema() and streamReader(): schema()
        # then costs one manifest read total, not one per lookup
        if self._reader is None:
            self._reader = SnapshotCDFStreamReader(self.options)
        return self._reader

    @classmethod
    def name(cls) -> str:
        return "snapshot_changes_stream"

    def schema(self):
        import json

        from pyspark.sql.types import StructType

        base = json.loads(self._get_reader()._schema_json)
        base["fields"] += json.loads(f"[{_CDF_COLS_JSON}]")
        return StructType.fromJson(base)

    def streamReader(self, schema):
        return self._get_reader()


def read_snapshot_changes_stream(
    spark, table: str, starting_version: int = 0, starting_timestamp=None,
    max_files_per_trigger: int | None = None,
    max_rows_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
):
    """Convenience: register the source and open a change-feed stream over
    `table` from (exclusive) `starting_version` — 0 replays the whole
    table's history as inserts (plus any later deletes).
    `starting_timestamp` (epoch / datetime / ISO string) instead starts
    AFTER the snapshot current at that instant (the Delta readChangeFeed
    startingTimestamp shape). max_files_per_trigger /
    max_rows_per_trigger bound each micro-batch's admitted backlog (the
    Delta rate-limit options) — a deep catch-up then processes as many
    bounded batches instead of one giant one, with identical final
    state."""
    spark.dataSource.register(SnapshotCDFStreamDataSource)
    reader = (
        spark.readStream.format("snapshot_changes_stream")
        .option("table", table)
    )
    if starting_timestamp is not None:
        reader = reader.option("startingTimestamp", str(starting_timestamp))
    else:
        reader = reader.option("startingVersion", starting_version)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_rows_per_trigger is not None:
        reader = reader.option("maxRowsPerTrigger", max_rows_per_trigger)
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger", max_bytes_per_trigger)
    return reader.load()
