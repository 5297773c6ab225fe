"""Queryable METADATA TABLES over a snapshot table (the Iceberg
`table$files` / `table$history` / `table$refs` / `table$partitions`
surface; Delta's DESCRIBE DETAIL/HISTORY).

Maintenance and debugging at scale are themselves queries — "how many
small files", "which partition is skewed", "what did the last compaction
change", "which refs pin old versions" — so the table's own metadata is
exposed AS DataFrames that compose with the whole engine (filter, join,
aggregate, write). Everything derives from ONE committed manifest read
(snapshot isolation — no torn metadata view), through the same shard LRU
cache the planner uses.

Scale posture: these build on the driver from the manifest plane —
O(#files) metadata rows, the same bound `snapshot_expire` and
`snapshot_history` already accept (entries are ~100 bytes each; 10⁶
files ≈ 100 MB, a driver-sized working set by design). The DATA plane is
never touched: no parquet footer, no row read. Content columns
(min/max/partition values) are stringly-typed on purpose — one schema
serves every table, exactly like Iceberg's readable_metrics JSON.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .snapshot import (
    _all_entries,
    _read_manifest,
    _read_shard,
    snapshot_branches,
    snapshot_history,
    snapshot_versions,
)

_KINDS = ("files", "deletes", "history", "refs", "partitions")


def _resolve(table: str, version: int | None) -> dict:
    versions = snapshot_versions(table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots under {table}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    return _read_manifest(table, v)


def _files_rows(table: str, m: dict, section: str) -> list[dict]:
    out = []
    key = {"data": "manifests", "deletes": "deletes", "eq": "eq_deletes"}[
        section
    ]
    for ref in m.get(key) or []:
        for e in _read_shard(table, ref):
            stats = e.get("stats") or {}
            out.append(
                {
                    "path": e["path"],
                    "shard": ref["path"],
                    "rows": int(e["rows"]),
                    "seq": int(e.get("seq") or 0),
                    "lower_bounds": {
                        c: str(b[0]) for c, b in stats.items()
                    },
                    "upper_bounds": {
                        c: str(b[1]) for c, b in stats.items()
                    },
                    "bloom_cols": sorted(e.get("bloom") or {}),
                    "eq_on": list(e.get("on") or []),
                }
            )
    return out


def snapshot_meta(
    spark: SparkSession,
    table: str,
    kind: str = "files",
    version: int | None = None,
) -> DataFrame:
    """One metadata table of `kind` for snapshot `version` (default
    latest), as a DataFrame:

    - 'files':      one row per LIVE data file — path, shard, rows, data
                    sequence number, per-column lower/upper bounds
                    (strings), bloom-filtered columns.
    - 'deletes':    one row per outstanding delete file, both flavors —
                    flavor 'dv' (positional) or 'eq' (equality, with its
                    key columns in eq_on).
    - 'history':    one row per committed version — version, commit
                    timestamp, mode, data_change, plus the live totals
                    recorded in that version's manifest list. A pinned
                    `version` truncates the rows at it (no post-pin
                    commits leak through the frozen view).
    - 'refs':       one row per named ref — tags (read from the pinned
                    manifest) AND writable branches, with the version
                    each pins. Branch rows reflect CURRENT branch heads:
                    branches live in the ref store outside any manifest,
                    so there is no meaningful "branch state as of
                    version v" to resolve.
    - 'partitions': per hidden-partition-value rollup (files whose
                    bounds collapse to one derived value group by it;
                    files spanning several report value='*mixed*') —
                    file count, row count, min/max seq per value.
    """
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {_KINDS}, got {kind!r}")
    if kind == "history":
        # validate + resolve the pin the same way the file kinds do, then
        # truncate: a version-pinned metadata view must not expose
        # commits that happened after the pin
        v_cap = None
        if version is not None:
            versions = snapshot_versions(table)
            if version not in versions:
                raise ValueError(f"version {version} not in {versions}")
            v_cap = version
        rows = [
            {
                "version": int(h["version"]),
                "committed_at": (
                    None
                    if h.get("timestamp") is None
                    else float(h["timestamp"])
                ),
                "mode": str(h.get("mode") or ""),
                "n_files": int(h.get("n_files") or 0),
                # None under outstanding equality deletes (no honest
                # metadata count) — the history contract, surfaced as-is
                "rows": None if h.get("rows") is None else int(h["rows"]),
                "tombstones": int(h.get("tombstones") or 0),
                "eq_delete_keys": int(h.get("eq_delete_keys") or 0),
                "idempotency_key": h.get("idempotency_key"),
            }
            for h in snapshot_history(table)
            if v_cap is None or int(h["version"]) <= v_cap
        ]
        return spark.createDataFrame(
            rows,
            "version long, committed_at double, mode string, "
            "n_files long, rows long, tombstones long, "
            "eq_delete_keys long, idempotency_key string",
        )
    if kind == "refs":
        m = _resolve(table, version)
        rows = [
            {"name": n, "type": "tag", "version": int(v)}
            for n, v in sorted((m.get("refs") or {}).items())
        ] + [
            {"name": n, "type": "branch", "version": int(v)}
            for n, v in sorted(snapshot_branches(table).items())
        ]
        return spark.createDataFrame(
            rows, "name string, type string, version long"
        )
    m = _resolve(table, version)
    if kind == "files":
        rows = _files_rows(table, m, "data")
        for r in rows:
            r.pop("eq_on")
        return spark.createDataFrame(
            rows,
            "path string, shard string, rows long, seq long, "
            "lower_bounds map<string,string>, "
            "upper_bounds map<string,string>, bloom_cols array<string>",
        )
    if kind == "deletes":
        rows = []
        for section, flavor in (("deletes", "dv"), ("eq", "eq")):
            for r in _files_rows(table, m, section):
                r["flavor"] = flavor
                r.pop("bloom_cols")
                rows.append(r)
        return spark.createDataFrame(
            rows,
            "path string, shard string, rows long, seq long, "
            "lower_bounds map<string,string>, "
            "upper_bounds map<string,string>, eq_on array<string>, "
            "flavor string",
        )
    # partitions: roll live files up by their hidden-transform value.
    # A clustered write gives near-single-valued per-file bounds, so
    # lo == hi identifies the file's partition exactly; a file whose
    # bounds span several derived values (pre-evolution layouts,
    # unclustered writes) reports the honest '*mixed*' bucket instead
    # of a guess.
    from .snapshot import _all_specs, _pt_name  # late: private helpers

    specs = _all_specs(m) or (
        [m["partition_spec"]] if m.get("partition_spec") else []
    )
    hidden = sorted({_pt_name(t) for s in specs for t in s})
    agg: dict[tuple, dict] = {}
    for e in _all_entries(table, m):
        stats = e.get("stats") or {}
        key = []
        for h in hidden:
            b = stats.get(h)
            if b is None:
                key.append(None)
            elif str(b[0]) == str(b[1]):
                key.append(str(b[0]))
            else:
                key.append("*mixed*")
        k = tuple(key)
        a = agg.setdefault(
            k,
            {"files": 0, "rows": 0, "min_seq": None, "max_seq": None},
        )
        a["files"] += 1
        a["rows"] += int(e["rows"])
        seq = int(e.get("seq") or 0)
        a["min_seq"] = seq if a["min_seq"] is None else min(a["min_seq"], seq)
        a["max_seq"] = seq if a["max_seq"] is None else max(a["max_seq"], seq)
    rows = [
        {
            "partition": json.dumps(
                dict(zip(hidden, k)), sort_keys=True
            ),
            "files": a["files"],
            "rows": a["rows"],
            "min_seq": a["min_seq"] or 0,
            "max_seq": a["max_seq"] or 0,
        }
        for k, a in sorted(agg.items(), key=lambda kv: str(kv[0]))
    ]
    return spark.createDataFrame(
        rows,
        "partition string, files long, rows long, min_seq long, "
        "max_seq long",
    )


def snapshot_register_meta(
    spark: SparkSession,
    table: str,
    prefix: str,
    kinds: tuple = _KINDS,
    version: int | None = None,
) -> list[str]:
    """Register the metadata tables as temp views `<prefix>_<kind>` so
    maintenance planning is plain SQL, e.g.:

        snapshot_register_meta(spark, "/tables/t", "t")
        spark.sql("SELECT count(*) FROM t_files WHERE rows < 100000")

    Views are frozen at the resolved version (they wrap the DataFrames
    above) — re-register after new commits to move the pin."""
    names = []
    for kind in kinds:
        name = f"{prefix}_{kind}"
        snapshot_meta(spark, table, kind, version).createOrReplaceTempView(
            name
        )
        names.append(name)
    return names
