"""Streaming SOURCE over the snapshot-manifest table (ops/snapshot.py) —
the read half of the lakehouse streaming story whose write half is
snapshot_stream_sink's exactly-once appends.

Spark 4 Python DataSource stream reader:

- OFFSETS are snapshot VERSION numbers: `{"version": N}` means
  "everything committed up to and including vN has been emitted".
  Offsets are resolved driver-side from the manifest log alone (no data
  IO, no directory listing) and are replay-stable — a version's file
  list is immutable, so re-planning any (start, end] range after a
  crash yields byte-identical batches, which is what makes the
  downstream exactly-once (checkpoint offset log + idempotent sink)
  sound.
- PARTITIONS of a micro-batch are the data files ADDED between the two
  versions — one InputPartition per file, so a 1000-file commit fans
  out across the cluster instead of looping on the driver.
- READ happens executor-side as Arrow RecordBatches straight off the
  parquet (zero row-by-row Python), projected to the table's
  manifest-recorded schema: files that predate an added column serve
  NULL for it, the same add-only evolution contract snapshot_read
  honors.

APPEND-ONLY CONTRACT (the Delta/Iceberg streaming-source default): a
version range that REMOVES a data file or adds delete-vector tombstones
cannot be represented as an insert-only stream — partitions() raises a
named error instead of silently emitting wrong rows. Compactions and
merges on a streamed table therefore fence the stream (a real
deployment pauses the consumer across maintenance, or consumes the
change feed instead).

Usage:
    spark.dataSource.register(SnapshotStreamDataSource)
    df = (spark.readStream.format("snapshot_stream")
          .option("table", "/path/to/tbl").load())
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


def _manifest_state(table: str, version: int) -> tuple[set[str], int]:
    """(data-file rel-path set, tombstone count) at `version`; version 0
    is the empty pre-table state."""
    from ..ops.snapshot import _all_entries, _read_manifest

    if version == 0:
        return set(), 0
    try:
        m = _read_manifest(table, version)
    except FileNotFoundError:
        raise ValueError(
            f"snapshot_stream offset v{version} of {table} no longer "
            f"exists — snapshot_expire collected it while this "
            f"checkpoint was behind; restart from a fresh checkpoint "
            f"(keep expire's keep_last above the slowest consumer's lag)"
        ) from None
    files = {e["path"] for e in _all_entries(table, m)}
    # both delete flavors count: positional tombstones AND equality-
    # delete keys make a version range non-representable as appends
    tombs = sum(r["rows"] for r in m.get("deletes", [])) + sum(
        r["rows"] for r in m.get("eq_deletes", [])
    )
    return files, tombs


class _FileSlice(InputPartition):
    def __init__(self, path: str, schema_json: str):
        self.path = path
        self.schema_json = schema_json


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        self.table = options.get("table")
        if not self.table:
            raise ValueError("snapshot_stream requires .option('table', path)")
        self.start_version = int(options.get("startingversion", 0))
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
                "snapshot_stream needs a manifest-recorded schema "
                "(tables written before schema tracking must be "
                "compacted once to record one)"
            )
        self._schema_json = json.dumps(sch)
        # ADMISSION CONTROL — identical contract to the CDF source
        # (sources/snapshot_cdf_stream.py): a deep append backlog is
        # admitted as bounded micro-batches instead of one giant one.
        # Weights come from shard-ref diffs (manifest JSON only); at
        # least one version always admits (progress floor); the cursor
        # anchors at the initial version on fresh streams and at the
        # engine-replanned checkpoint range on restarts.
        self.max_files_per_trigger = (
            int(options.get("maxfilespertrigger", 0)) or None
        )
        self.max_rows_per_trigger = (
            int(options.get("maxrowspertrigger", 0)) or None
        )
        self.max_bytes_per_trigger = (
            int(options.get("maxbytespertrigger", 0)) or None
        )
        self._cursor: int | None = None

    # -- driver-side planning ------------------------------------------------
    def initialOffset(self) -> dict:
        self._cursor = self.start_version
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        from ..ops.snapshot import snapshot_versions

        from .snapshot_cdf_stream import (
            SnapshotCDFStreamReader,
            manifest_or_lag_error,
        )

        versions = snapshot_versions(self.table)
        latest = versions[-1] if versions else 0
        cap_f, cap_r = self.max_files_per_trigger, self.max_rows_per_trigger
        cap_b = self.max_bytes_per_trigger
        cur = self._cursor
        if cur is None:
            cur = self.start_version
        if (
            cap_f is None and cap_r is None and cap_b is None
        ) or cur >= latest:
            self._cursor = max(latest, cur)
            return {"version": self._cursor}
        files = rows = nbytes = 0
        admitted = cur
        # an expired cursor raises the NAMED lag/expire contract error,
        # matching the CDF source (round-13 ADVICE fix)
        prev_m = (
            manifest_or_lag_error(self.table, cur, "snapshot_stream")
            if cur > 0 else None
        )
        for v in versions:
            if not (cur < v <= latest):
                continue
            m = manifest_or_lag_error(self.table, v, "snapshot_stream")
            wf, wr, wb = SnapshotCDFStreamReader._ref_weights(prev_m, m)
            over = (
                (cap_f is not None and files + wf > cap_f)
                or (cap_r is not None and rows + wr > cap_r)
                or (cap_b is not None and nbytes + wb > cap_b)
            )
            if over and admitted > cur:
                break
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

    def partitions(self, start: dict, end: dict):
        self._cursor = max(self._cursor or 0, end["version"])
        a, tombs_a = _manifest_state(self.table, start["version"])
        b, tombs_b = _manifest_state(self.table, end["version"])
        removed = a - b
        if removed or tombs_b != tombs_a:
            raise ValueError(
                f"snapshot_stream append-only contract violated between "
                f"v{start['version']} and v{end['version']}: "
                f"{len(removed)} file(s) removed, "
                f"{tombs_b - tombs_a:+d} tombstone(s) — pause the stream "
                f"across compaction/merge maintenance or consume the "
                f"change feed instead (snapshot_changes_stream / batch "
                f"snapshot_changes)"
            )
        return [
            _FileSlice(os.path.join(self.table, p), self._schema_json)
            for p in sorted(b - a)
        ]

    def commit(self, end: dict) -> None:
        # offsets live in the stream's checkpoint; the committed end
        # anchors admission after a restart
        self._cursor = max(self._cursor or 0, end["version"])

    # -- executor-side read --------------------------------------------------
    def read(self, partition: _FileSlice):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        want = to_arrow_schema(StructType.fromJson(json.loads(partition.schema_json)))
        pf = pq.ParquetFile(partition.path)
        have = set(pf.schema_arrow.names)
        for batch in pf.iter_batches(
            columns=[n for n in want.names if n in have]
        ):
            cols = []
            for field in want:
                if field.name in have:
                    cols.append(batch.column(field.name).cast(field.type))
                else:  # file predates this column: NULL backfill
                    cols.append(pa.nulls(batch.num_rows, type=field.type))
            yield pa.RecordBatch.from_arrays(cols, schema=want)


class SnapshotStreamDataSource(DataSource):
    def __init__(self, options=None):
        super().__init__(options)
        self._reader: SnapshotStreamReader | None = None

    @classmethod
    def name(cls) -> str:
        return "snapshot_stream"

    def _get_reader(self) -> SnapshotStreamReader:
        # one reader serves both schema() and streamReader(): schema()
        # then costs one manifest read total, not one per lookup
        if self._reader is None:
            self._reader = SnapshotStreamReader(self.options)
        return self._reader

    def schema(self):
        import json

        from pyspark.sql.types import StructType

        return StructType.fromJson(json.loads(self._get_reader()._schema_json))

    def streamReader(self, schema):
        return self._get_reader()


def read_snapshot_stream(spark, table: str, starting_version: int = 0,
                         max_files_per_trigger: int | None = None,
                         max_rows_per_trigger: int | None = None,
                         max_bytes_per_trigger: int | None = None):
    """Convenience: register the source and open a stream over `table`
    from (exclusive) `starting_version` — 0 replays the whole table.
    The max_*_per_trigger caps bound each micro-batch's admitted
    backlog (same contract as the CDF source)."""
    spark.dataSource.register(SnapshotStreamDataSource)
    reader = (
        spark.readStream.format("snapshot_stream")
        .option("table", table)
        .option("startingVersion", starting_version)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_rows_per_trigger is not None:
        reader = reader.option("maxRowsPerTrigger", max_rows_per_trigger)
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger", max_bytes_per_trigger)
    return reader.load()
