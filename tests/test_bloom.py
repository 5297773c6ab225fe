"""Manifest bloom filters (ops/bloom.py + snapshot integration).

The contract under test: a bloom "no" is DEFINITIVE (never a false
negative — dropping the file is safe), a "maybe" merely keeps the file,
and every type/path that cannot guarantee that definitiveness turns
pruning OFF rather than wrong (float/Decimal columns, unencodable probe
values, files without filters)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from e02_spark.ops import snapshot as S
from e02_spark.ops.bloom import (
    bloom_build,
    bloom_key,
    bloom_maybe_contains,
    bloom_maybe_contains_any,
)


# ---------------------------------------------------------------- unit


def test_bloom_no_false_negatives_ints_and_strings():
    vals = list(range(0, 4000, 2)) + [f"doc-{i}" for i in range(500)]
    b = bloom_build(vals)
    assert b is not None
    for v in vals:
        assert bloom_maybe_contains(b, v)  # present => always maybe
    # absent values: overwhelmingly "no" at ~1% FPP
    misses = sum(
        not bloom_maybe_contains(b, v) for v in range(1, 4000, 2)
    )
    assert misses > 1900


def test_bloom_type_tags_do_not_collide():
    b = bloom_build([1, "x"])
    assert bloom_maybe_contains(b, 1) and bloom_maybe_contains(b, "x")
    # "1" (string) and 1 (int) hash under different tags; True is a bool,
    # not the int 1
    assert not bloom_maybe_contains(b, "1")
    assert bloom_key(True) != bloom_key(1)
    assert bloom_key(dt.date(2026, 1, 1)) != bloom_key(
        dt.datetime(2026, 1, 1)
    )


def test_bloom_unencodable_is_safe_not_wrong():
    # a float anywhere in the build refuses the whole filter (a partial
    # bloom would yield false negatives)
    assert bloom_build([1, 2.5, 3]) is None
    # an unencodable PROBE cannot prune
    b = bloom_build([1, 2, 3])
    assert bloom_maybe_contains(b, 2.5)
    assert bloom_maybe_contains_any(b, [2.5])


def test_bloom_nulls_skipped_and_any_semantics():
    b = bloom_build([10, None, 20])
    assert bloom_maybe_contains(b, 10)
    assert bloom_maybe_contains_any(b, [999_991, 20])
    assert not bloom_maybe_contains_any(b, [999_991, 999_993])


def test_bloom_cross_type_probe_forms_no_false_negative():
    """The ADVICE-flagged type-tag gap: a probe whose Python type differs
    from the stored values' type but whose min/max comparison WOULD pass
    must not turn into a bloom false negative. Each ambiguous pair tests
    every plausible encoding."""
    # iso string probing a timestamp column (stored bounds ARE iso
    # strings, so range pruning passed the probe through)
    ts = dt.datetime(2026, 1, 1, 0, 1)
    b = bloom_build([ts])
    assert bloom_maybe_contains(b, ts.isoformat())
    assert bloom_maybe_contains_any(b, [ts.isoformat()])
    # datetime probing a string column that stores iso text
    b2 = bloom_build([ts.isoformat()])
    assert bloom_maybe_contains(b2, ts)
    # date string <-> date object
    d = dt.date(2026, 5, 4)
    assert bloom_maybe_contains(bloom_build([d]), d.isoformat())
    assert bloom_maybe_contains(bloom_build([d.isoformat()]), d)
    # bool probing an int column and int 0/1 probing a bool column
    assert bloom_maybe_contains(bloom_build([0, 1, 7]), True)
    assert bloom_maybe_contains(bloom_build([True, False]), 1)
    assert bloom_maybe_contains(bloom_build([True, False]), 0)
    # definitive "no" still works for genuinely absent cross-type probes
    assert not bloom_maybe_contains(
        bloom_build([ts]), dt.datetime(2030, 7, 7, 7, 7).isoformat()
    )


def test_iso_string_point_probe_on_timestamp_column(spark, tmp_path):
    """End-to-end twin of the unit test above: a bloomed timestamp
    column probed with the ISOFORMAT STRING (the form range pruning
    itself compares) must keep the file holding the instant."""
    tbl = str(tmp_path / "tbl")
    df = spark.sql(
        "SELECT id, timestamp'2026-01-01 00:00:00'"
        " + make_interval(0,0,0,0,0,0,id*60) AS ts FROM range(100)"
    )
    S.snapshot_write(df, tbl, mode="overwrite", n_files=1,
                     stats_cols=["ts"], bloom_cols=["ts"])
    probe = dt.datetime(2026, 1, 1, 0, 1).isoformat()
    kept, _ = S._plan_files(tbl, None, ("ts", probe, probe))
    assert len(kept) == 1, "iso-string probe must not bloom-drop the file"
    got = S.snapshot_read(spark, tbl, prune=("ts", probe, probe))
    assert got.where("id = 1").count() == 1


def test_bloom_tz_aware_probe_matches_naive_utc_build():
    naive = dt.datetime(2026, 3, 1, 12, 30)
    b = bloom_build([naive])
    aware = dt.datetime(
        2026, 3, 1, 14, 30, tzinfo=dt.timezone(dt.timedelta(hours=2))
    )
    assert bloom_maybe_contains(b, aware)  # same instant, same key


# ------------------------------------------------- snapshot integration


def _two_interleaved_files(spark, tbl):
    """Two files whose ID SETS are disjoint (evens vs odds) but whose
    [min,max] both span the whole domain — the exact layout min/max
    pruning cannot help with and blooms exist for."""
    evens = spark.range(0, 2000, 2).selectExpr("id", "id * 10 as v")
    odds = spark.range(1, 2000, 2).selectExpr("id", "id * 10 as v")
    S.snapshot_write(evens, tbl, mode="overwrite", n_files=1,
                     stats_cols=["id"], bloom_cols=["id"])
    S.snapshot_write(odds, tbl, mode="append", n_files=1,
                     stats_cols=["id"])  # bloom_cols INHERITED
    return evens, odds


def test_point_probe_prunes_interleaved_files(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _two_interleaved_files(spark, tbl)
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    entries = S._all_entries(tbl, m)
    assert len(entries) == 2
    assert all("id" in (e.get("bloom") or {}) for e in entries), (
        "append must inherit bloom_cols as a table property"
    )
    # range probes stay on min/max: both files span [?,?] so both kept
    kept, _ = S._plan_files(tbl, None, ("id", 100, 200))
    assert len(kept) == 2
    # a point probe drops the file that provably lacks the key
    dropped: list = []
    kept, _ = S._plan_files(
        tbl, None, ("id", 42, 42), bloom_dropped=dropped
    )
    assert len(kept) == 1 and len(dropped) == 1
    # and the read is still CORRECT for present and absent keys
    assert S.snapshot_read(spark, tbl, prune=("id", 42, 42)).where(
        "id = 42"
    ).count() == 1
    assert S.snapshot_read(spark, tbl, prune=("id", 43, 43)).where(
        "id = 43"
    ).count() == 1
    # no false negatives over EVERY present key: the planned set always
    # includes the file that holds the key
    for probe in (0, 1, 2, 999, 1000, 1997, 1998):
        got = S.snapshot_read(spark, tbl, prune=("id", probe, probe))
        assert got.where(f"id = {probe}").count() == 1, probe


def test_bloom_survives_compact_and_clears_explicitly(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _two_interleaved_files(spark, tbl)
    S.snapshot_compact(spark, tbl, n_files=3)
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert all(
        "id" in (e.get("bloom") or {}) for e in S._all_entries(tbl, m)
    ), "maintenance rewrite must re-harvest the table's declared blooms"
    # explicit [] clears the property; later files carry no filters
    evens = spark.range(0, 10, 2).selectExpr("id", "id * 10 as v")
    S.snapshot_write(evens, tbl, mode="overwrite", n_files=1,
                     stats_cols=["id"], bloom_cols=[])
    m2 = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert S._bloom_cols(m2) == []
    assert all(
        not e.get("bloom") for e in S._all_entries(tbl, m2)
    )


def test_float_column_never_blooms(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr("id", "cast(id as double) as x")
    S.snapshot_write(df, tbl, mode="overwrite", n_files=1,
                     stats_cols=["id"], bloom_cols=["id", "x", "ghost"])
    m = S._read_manifest(tbl, 1)
    (e,) = S._all_entries(tbl, m)
    assert "id" in e["bloom"] and "x" not in e["bloom"]
    assert "ghost" not in e["bloom"]  # absent column skipped, no crash


def test_temporal_point_probe_uses_raw_value(spark, tmp_path):
    """The stats path coerces datetimes to isoformat strings; the bloom
    probe must hash the RAW datetime (type tag 't:') or every temporal
    point probe would be a silent false negative. Present instants stay
    kept; an absent instant inside the range is dropped."""
    tbl = str(tmp_path / "tbl")
    df = spark.sql(
        "SELECT id, timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60) AS ts"
        " FROM range(100)"
    )
    S.snapshot_write(df, tbl, mode="overwrite", n_files=1,
                     stats_cols=["ts"], bloom_cols=["ts"])
    present = dt.datetime(2026, 1, 1, 0, 1)  # id=1 -> +60s
    absent = dt.datetime(2026, 1, 1, 0, 0, 30)  # between rows
    kept, _ = S._plan_files(tbl, None, ("ts", present, present))
    assert len(kept) == 1
    dropped: list = []
    kept, _ = S._plan_files(
        tbl, None, ("ts", absent, absent), bloom_dropped=dropped
    )
    assert kept == [] and len(dropped) == 1


def test_merge_candidate_narrowing_and_convergence(spark, tmp_path):
    """A small-key CoW delete merge on a bloomed table narrows its
    candidate scan to the files that might hold the keys — and the
    merged CONTENT is exactly the no-bloom run's (narrowing is a plan
    optimization, never a semantics change)."""
    import pyspark.sql.functions as F

    tbl_b = str(tmp_path / "bloomed")
    tbl_p = str(tmp_path / "plain")
    for tbl, bc in ((tbl_b, ["id"]), (tbl_p, None)):
        evens = spark.range(0, 2000, 2).selectExpr("id", "id * 10 as v")
        odds = spark.range(1, 2000, 2).selectExpr("id", "id * 10 as v")
        S.snapshot_write(evens, tbl, mode="overwrite", n_files=1,
                         stats_cols=["id"], bloom_cols=bc)
        S.snapshot_write(odds, tbl, mode="append", n_files=1)
    # the candidate narrowing itself, observed at the planner level
    m = S._read_manifest(tbl_b, S.snapshot_versions(tbl_b)[-1])
    cands, _ = S._plan_files(tbl_b, None, ("id", 4, 8), manifest=m)
    assert len(cands) == 2  # range probe keeps both interleaved files
    narrowed = S._bloom_filter_candidates(tbl_b, m, cands, "id", [4, 8])
    assert len(narrowed) == 1
    # end-to-end: delete three even keys; both tables converge equal
    keys = spark.createDataFrame([(4,), (8,), (1200,)], "id long")
    rb = S.snapshot_merge(spark, tbl_b, keys, on=["id"],
                          when_matched="delete", insert_not_matched=False)
    rp = S.snapshot_merge(spark, tbl_p, keys, on=["id"],
                          when_matched="delete", insert_not_matched=False)
    got_b = sorted(
        (r["id"], r["v"]) for r in S.snapshot_read(spark, tbl_b).collect()
    )
    got_p = sorted(
        (r["id"], r["v"]) for r in S.snapshot_read(spark, tbl_p).collect()
    )
    assert got_b == got_p and len(got_b) == 1997
    assert rb["files_rewritten"] == rp["files_rewritten"] == 1
    # keys scattered across BOTH files still converge (no lost matches)
    keys2 = spark.createDataFrame([(7,), (10,)], "id long")
    S.snapshot_merge(spark, tbl_b, keys2, on=["id"],
                     when_matched="delete", insert_not_matched=False)
    assert S.snapshot_rows(tbl_b) == 1995


def test_harvest_distributed_blooms_identical(spark, tmp_path,
                                              monkeypatch):
    """Blooms ride the SAME harvest that footer stats do: the
    distributed path must emit byte-identical filters (deterministic
    hashing + compression, order-independent bit OR)."""
    import json

    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 5000).selectExpr(
        "id", "concat('d-', id % 97) as tag"
    )
    S.snapshot_write(df, tbl, mode="overwrite", n_files=6,
                     cluster_by=["id"], stats_cols=["id"],
                     bloom_cols=["id", "tag"])
    m = S._read_manifest(tbl, 1)
    files = sorted(
        os.path.join(tbl, e["path"]) for e in S._all_entries(tbl, m)
    )
    seq = [S._harvest_one(p, ["id"], tbl, ["id", "tag"]) for p in files]
    dist = S._harvest_stats_distributed(spark, files, ["id"], tbl,
                                        ["id", "tag"])
    assert json.dumps(seq, sort_keys=True) == json.dumps(
        dist, sort_keys=True
    )
    assert all("id" in e["bloom"] and "tag" in e["bloom"] for e in seq)


def test_bloom_table_property_rides_branch_and_publish(spark, tmp_path):
    """bloom_cols lives in manifest properties, so the zero-copy paths
    (branch create/fast-forward) carry it without bloom-specific code:
    a file appended ON THE BRANCH gets filters, and main keeps
    harvesting after the fast-forward."""
    tbl = str(tmp_path / "tbl")
    df = spark.range(50).selectExpr("id", "id * 2 as v")
    S.snapshot_write(df, tbl, mode="overwrite", n_files=1,
                     stats_cols=["id"], bloom_cols=["id"])
    bp = S.snapshot_branch_create(tbl, "wip")
    assert S._bloom_cols(S._read_manifest(bp, 1)) == ["id"]
    more = spark.range(50, 100).selectExpr("id", "id * 2 as v")
    S.snapshot_write(more, bp, mode="append", n_files=1)
    S.snapshot_branch_fastforward(spark, tbl, "wip")
    S.snapshot_branch_drop(tbl, "wip")
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert all("id" in (e.get("bloom") or {}) for e in S._all_entries(tbl, m))
    tail = spark.range(100, 120).selectExpr("id", "id * 2 as v")
    S.snapshot_write(tail, tbl, mode="append", n_files=1)
    m2 = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert all(
        "id" in (e.get("bloom") or {}) for e in S._all_entries(tbl, m2)
    )


def test_target_file_rows_bounds_files_without_precount(spark, tmp_path):
    """snapshot_write(target_file_rows=N) splits each write partition at
    N rows (no count job), keeps cluster order so per-file stats stay
    tight and range pruning still works, and the bounded files carry
    blooms like any others."""
    tbl = str(tmp_path / "tbl")
    df = spark.range(10_000).selectExpr("id", "id * 2 as v")
    S.snapshot_write(df, tbl, mode="overwrite", n_files=2,
                     cluster_by=["id"], stats_cols=["id"],
                     bloom_cols=["id"], target_file_rows=1_000)
    m = S._read_manifest(tbl, 1)
    entries = S._all_entries(tbl, m)
    assert len(entries) >= 10
    assert all(e["rows"] <= 1_000 for e in entries)
    assert all("id" in (e.get("bloom") or {}) for e in entries)
    # cluster order preserved through the split: a narrow range probe
    # keeps a small fraction of the files
    kept, _ = S._plan_files(tbl, None, ("id", 100, 150))
    assert 0 < len(kept) <= 2
    assert S.snapshot_rows(tbl) == 10_000
    with pytest.raises(ValueError, match="target_file_rows"):
        S.snapshot_write(df, tbl, mode="append", target_file_rows=0)
