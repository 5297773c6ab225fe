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
  no joins.
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


class DeleteStateOverflowError(RuntimeError):
    """A DV/eq-delete file exceeds the driver-shipping cap (see
    _DELETE_ROWS_CAP): the stream plans delete state driver-side under
    the 'fold deletes regularly' maintenance invariant, and this error
    is that invariant ENFORCED instead of assumed — run
    snapshot_rewrite_deletes on the table (or raise
    .option('maxDeleteRows', N) if the deployment can afford the driver
    memory and task-serialization cost)."""


# Driver-shipping cap, in ROWS per delete file (positions for DVs, keys
# for eq files), checked against the parquet FOOTER before any read —
# overflow costs one metadata read, never an OOM. 2M rows ≈ tens of MB
# pickled: comfortably driver-safe, far above any table honoring the
# maintenance invariant, and small enough that a runaway CDC feed that
# skipped rewrite_deletes fails loudly instead of ballooning every
# micro-batch's task payloads.
_DELETE_ROWS_CAP = 2_000_000


def _check_delete_cap(path: str, cap: int) -> None:
    import pyarrow.parquet as pq

    n = pq.ParquetFile(path).metadata.num_rows
    if n > cap:
        raise DeleteStateOverflowError(
            f"delete file {path} carries {n} rows, above the {cap}-row "
            "driver-shipping cap — the stream plans DV positions and "
            "eq-delete keys driver-side under the 'fold deletes "
            "regularly' maintenance invariant; run "
            "snapshot_rewrite_deletes on the table to fold outstanding "
            "deletes, or raise .option('maxDeleteRows', N)"
        )


_CDF_COLS_JSON = (
    '{"name":"_change_type","type":"string","nullable":false,"metadata":{}},'
    '{"name":"_commit_version","type":"long","nullable":false,"metadata":{}}'
)


def _dv_positions(
    table: str, manifest: dict, cap: int = _DELETE_ROWS_CAP
) -> dict[str, frozenset[int]]:
    """Per-data-file tombstoned-position sets of one committed manifest,
    read driver-side with pyarrow — small by the module's maintenance
    invariant, ENFORCED by the per-file row cap (a file above it raises
    DeleteStateOverflowError from the footer alone, before any read).
    Memoized per DV file path — DV files are immutable once
    referenced."""
    from ..ops.snapshot import _all_entries

    out: dict[str, set[int]] = {}
    for e in _all_entries(table, manifest, "deletes"):
        path = os.path.abspath(os.path.join(table, e["path"]))
        for f, p in _read_dv_file(path, cap):
            out.setdefault(f, set()).add(p)
    return {f: frozenset(s) for f, s in out.items()}


_DV_FILE_MEMO: dict[str, list[tuple[str, int]]] = {}
# The memos are touched from whatever thread runs stream planning; the
# reader is driver-side single-threaded today, but two streams over the
# same table in one process would race the FIFO eviction (same hazard
# _SHARD_CACHE guards against). Reads happen OUTSIDE the lock.
import threading as _threading

_MEMO_LOCK = _threading.Lock()


def _read_dv_file(path: str, cap: int = _DELETE_ROWS_CAP) -> list[tuple[str, int]]:
    with _MEMO_LOCK:
        hit = _DV_FILE_MEMO.get(path)
    if hit is None:
        # cap checked on the cache MISS only: a memoized file already
        # sits in driver memory, so re-checking buys nothing
        _check_delete_cap(path, cap)
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


def _read_eq_keys(
    path: str, on: list[str], cap: int = _DELETE_ROWS_CAP
) -> tuple[tuple, ...]:
    """One eq-delete file's key tuples, read driver-side — O(merge-
    source keys) small by the maintenance invariant, enforced by the
    per-file row cap (DeleteStateOverflowError from the footer alone).
    Keys with any NULL component never match (SQL equality) and are
    dropped here once instead of re-checked per row. Memoized — eq
    files are immutable once referenced."""
    with _MEMO_LOCK:
        hit = _EQ_FILE_MEMO.get(path)
    if hit is None:
        _check_delete_cap(path, cap)
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
    """The eq-delete (key_cols, key_tuples) pairs that can shadow rows
    of data-file entry `e`: seq-scoped (eq applies only below its seq)
    and stats-pruned on the first key column — the same applicability
    rule as ops/snapshot._apply_eq_deletes / snapshot_changes."""
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
        keys = _read_eq_keys(
            os.path.abspath(os.path.join(table, q["path"])), q["on"], cap
        )
        if keys:
            out.append((tuple(q["on"]), keys))
    return tuple(out)


class _ChangeSlice(InputPartition):
    """One changed file's contribution to a micro-batch.

    include: emit ONLY these row indices (tombstone-delta slices);
    exclude: emit all rows EXCEPT these (added/removed-file slices);
    at most one of the two is non-None.

    match:  ((key_cols, key_tuples), ...) — emit only rows whose key is
            in SOME pair's set (eq-delta slices; None = every row).
    shadow: same shape — additionally DROP rows whose key is in some
            pair's set (the owning version's outstanding eq deletes)."""

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
    ):
        self.path = path
        self.change_type = change_type
        self.commit_version = commit_version
        self.schema_json = schema_json
        self.include = include
        self.exclude = exclude
        self.match = match
        self.shadow = shadow


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
        # per-delete-file driver-shipping cap (rows); see
        # DeleteStateOverflowError / _DELETE_ROWS_CAP
        self.max_delete_rows = int(
            options.get("maxdeleterows", _DELETE_ROWS_CAP)
        )
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
        if self._start_ts is not None:
            from ..ops.snapshot import _resolve_from_ts

            return {"version": _resolve_from_ts(self.table, self._start_ts)}
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        from ..ops.snapshot import snapshot_versions

        versions = snapshot_versions(self.table)
        return {"version": versions[-1] if versions else 0}

    def _manifest_or_lag_error(self, version: int) -> dict:
        from ..ops.snapshot import _read_manifest

        try:
            return _read_manifest(self.table, version)
        except FileNotFoundError:
            raise ValueError(
                f"snapshot_changes_stream needs v{version} of {self.table} "
                f"but snapshot_expire collected it — restart from a fresh "
                f"checkpoint (keep expire's keep_last above the slowest "
                f"consumer's lag)"
            ) from None

    def partitions(self, start: dict, end: dict):
        from ..ops.snapshot import _all_entries, _eq_entries, snapshot_versions

        lo, hi = start["version"], end["version"]
        steps = [v for v in snapshot_versions(self.table) if lo < v <= hi]
        out: list[_ChangeSlice] = []
        prev_m = self._manifest_or_lag_error(lo) if lo > 0 else None
        for v in steps:
            m = self._manifest_or_lag_error(v)
            try:
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
                dv_a = (
                    _dv_positions(self.table, prev_m, cap)
                    if prev_m is not None and prev_m.get("deletes")
                    else {}
                )
                dv_b = (
                    _dv_positions(self.table, m, cap)
                    if m.get("deletes")
                    else {}
                )
                for p in sorted(b - a):  # added files -> live rows insert
                    out.append(
                        _ChangeSlice(
                            os.path.join(self.table, p), "insert", v,
                            self._schema_json,
                            exclude=tuple(sorted(dv_b.get(p, ()))),
                            shadow=_eq_applicable(self.table, eq_b, ents_b[p], cap),
                        )
                    )
                for p in sorted(a - b):  # removed files -> live rows delete
                    out.append(
                        _ChangeSlice(
                            os.path.join(self.table, p), "delete", v,
                            self._schema_json,
                            exclude=tuple(sorted(dv_a.get(p, ()))),
                            shadow=_eq_applicable(self.table, eq_a, ents_a[p], cap),
                        )
                    )
                for p in sorted(a & b):  # tombstone deltas on kept files
                    d0 = dv_a.get(p, frozenset())
                    d1 = dv_b.get(p, frozenset())
                    newly = d1 - d0
                    gone = d0 - d1
                    if newly:
                        out.append(
                            _ChangeSlice(
                                os.path.join(self.table, p), "delete", v,
                                self._schema_json,
                                include=tuple(sorted(newly)),
                            )
                        )
                    if gone:
                        out.append(
                            _ChangeSlice(
                                os.path.join(self.table, p), "insert", v,
                                self._schema_json,
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
                                exclude=tuple(sorted(pos)),
                                match=match,
                                shadow=_eq_applicable(
                                    self.table, own_eq, ent, cap
                                ),
                            )
                        )
            finally:
                prev_m = m
        return out

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream's checkpoint; nothing to GC

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
        import numpy as np

        include = (
            np.asarray(partition.include, dtype=np.int64)
            if partition.include is not None
            else None
        )
        exclude = (
            np.asarray(partition.exclude, dtype=np.int64)
            if partition.exclude
            else None
        )
        def _keys_mask(batch, pairs, n):
            """OR over (key_cols, key_tuples) pairs: True where the
            row's key is in some pair's set. Single-column keys go
            through Arrow is_in (vectorized); composite keys through a
            python set of tuples (eq key sets are merge-source sized)."""
            import pyarrow.compute as pc

            acc = np.zeros(n, dtype=bool)
            names = set(batch.schema.names)
            for on, keys in pairs:
                if not all(c in names for c in on):
                    # a pre-evolution data file lacking an evolved eq-key
                    # column: the column reads as all-NULL and NULL keys
                    # never match (SQL equality) — the batch path's
                    # NULL-backfill behavior, not a KeyError
                    continue
                if len(on) == 1:
                    m = pc.is_in(
                        batch.column(on[0]),
                        value_set=pa.array([k[0] for k in keys]),
                    )
                    acc |= pc.fill_null(m, False).to_numpy(
                        zero_copy_only=False
                    )
                else:
                    ks = frozenset(keys)
                    cols = [batch.column(c).to_pylist() for c in on]
                    acc |= np.fromiter(
                        (t in ks for t in zip(*cols)), dtype=bool, count=n
                    )
            return acc

        offset = 0
        for batch in pf.iter_batches(
            columns=[n for n in want.names if n in have]
        ):
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
                if field.name in have:
                    cols.append(batch.column(field.name).cast(field.type))
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
    spark, table: str, starting_version: int = 0, starting_timestamp=None
):
    """Convenience: register the source and open a change-feed stream over
    `table` from (exclusive) `starting_version` — 0 replays the whole
    table's history as inserts (plus any later deletes).
    `starting_timestamp` (epoch / datetime / ISO string) instead starts
    AFTER the snapshot current at that instant (the Delta readChangeFeed
    startingTimestamp shape)."""
    spark.dataSource.register(SnapshotCDFStreamDataSource)
    reader = (
        spark.readStream.format("snapshot_changes_stream")
        .option("table", table)
    )
    if starting_timestamp is not None:
        reader = reader.option("startingTimestamp", str(starting_timestamp))
    else:
        reader = reader.option("startingVersion", starting_version)
    return reader.load()
