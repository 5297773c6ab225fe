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

    # -- driver-side planning ------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        from ..ops.snapshot import snapshot_versions

        versions = snapshot_versions(self.table)
        return {"version": versions[-1] if versions else 0}

    def partitions(self, start: dict, end: dict):
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
        pass  # offsets live in the stream's checkpoint; nothing to GC

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


def read_snapshot_stream(spark, table: str, starting_version: int = 0):
    """Convenience: register the source and open a stream over `table`
    from (exclusive) `starting_version` — 0 replays the whole table."""
    spark.dataSource.register(SnapshotStreamDataSource)
    return (
        spark.readStream.format("snapshot_stream")
        .option("table", table)
        .option("startingVersion", starting_version)
        .load()
    )
