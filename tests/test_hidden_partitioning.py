"""Hidden partitioning (ops/snapshot.py partition transforms): derived
partition values recorded per file at commit, point/range pruning
through the spec without the query naming the hidden column, spec
inheritance on append, and composition with delete vectors."""

from __future__ import annotations

import datetime as dt
import zlib

import pytest
from pyspark.sql import functions as F

from e02_spark.ops import snapshot as S


def _mk(spark, n=400):
    return spark.range(n).selectExpr(
        "id",
        "CAST(id % 37 AS BIGINT) AS k",
        "DATE_ADD(DATE'2024-01-01', CAST(id % 21 AS INT)) AS d",
        "id * 1.5 AS x",
    )


def test_bucket_point_lookup_prunes_files(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        _mk(spark), tbl, mode="overwrite", n_files=8,
        partition_spec=[("bucket", "k", 8)],
    )
    m = S._read_manifest(tbl, 1)
    assert m["partition_spec"] == [["bucket", "k", 8]]
    # raw k min/max spans every file (k scattered 0..36) — bucket
    # pruning is the only thing that can cut the file list
    key = 17
    kept, _ = S._plan_files(
        tbl, 1,
        ("_pt_bucket8_k", zlib.crc32(b"17") % 8, zlib.crc32(b"17") % 8),
    )
    all_files, _ = S._plan_files(tbl, 1, None)
    assert 0 < len(kept) < len(all_files)
    # the public surface: partition_prune resolves through the spec
    got = sorted(
        r["id"]
        for r in S.snapshot_read(spark, tbl, partition_prune={"k": key})
        .where(F.col("k") == key)
        .collect()
    )
    assert got == [i for i in range(400) if i % 37 == key]


def test_day_transform_two_level_prune_observability(spark, tmp_path):
    """Two commits with disjoint day ranges: a day-range probe must skip
    the other commit's SHARD without opening it (two-level prune), and
    temporal pruning works though the files carry NO raw stats on d."""
    tbl = str(tmp_path / "tbl")
    jan = _mk(spark).withColumn("d", F.expr(
        "DATE_ADD(DATE'2024-01-01', CAST(id % 10 AS INT))"))
    mar = _mk(spark).withColumn("d", F.expr(
        "DATE_ADD(DATE'2024-03-01', CAST(id % 10 AS INT))"))
    S.snapshot_write(jan, tbl, mode="overwrite", n_files=3,
                     partition_spec=[("day", "d")])
    S.snapshot_write(mar, tbl, mode="append", n_files=3)  # spec inherited
    assert S._read_manifest(tbl, 2)["partition_spec"] == [["day", "d"]]
    opened: list = []
    kept, _ = S._plan_files(
        tbl, 2, ("_pt_day_d", "2024-03-01", "2024-03-31"), opened
    )
    assert len(opened) == 1  # january's shard never opened
    assert 0 < len(kept) <= 3
    got = (
        S.snapshot_read(
            spark, tbl,
            partition_prune={"d": (dt.date(2024, 3, 1), dt.date(2024, 3, 31))},
        )
        .where(F.col("d") >= "2024-03-01")
        .count()
    )
    assert got == 400


def test_spec_inheritance_and_conflicts(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(_mk(spark, 50), tbl, mode="overwrite",
                     partition_spec=[("bucket", "k", 4)])
    with pytest.raises(ValueError, match="conflicts with"):
        S.snapshot_write(_mk(spark, 10), tbl, mode="append",
                         partition_spec=[("bucket", "k", 8)])
    with pytest.raises(ValueError, match="point probes only"):
        S.snapshot_read(spark, tbl, partition_prune={"k": (1, 5)})
    with pytest.raises(ValueError, match="no transform"):
        S.snapshot_read(spark, tbl, partition_prune={"x": 1})
    # an overwrite may CHANGE the spec (it replaces the layout)
    S.snapshot_write(_mk(spark, 50), tbl, mode="overwrite",
                     partition_spec=[("day", "d")])
    assert S._read_manifest(
        tbl, S.snapshot_versions(tbl)[-1]
    )["partition_spec"] == [["day", "d"]]


def test_hidden_columns_invisible_and_deletes_compose(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        _mk(spark), tbl, mode="overwrite", n_files=4,
        partition_spec=[("bucket", "k", 8)], stats_cols=["id"],
    )
    df = S.snapshot_read(spark, tbl)
    assert df.columns == ["id", "k", "d", "x"]  # _pt_* never surfaces
    # MoR delete then a bucket-pruned read: tombstones subtract within
    # the pruned file subset
    S.snapshot_merge(
        spark, tbl, spark.range(0, 100).selectExpr("id"), on=["id"],
        when_matched="delete", insert_not_matched=False, strategy="mor",
    )
    key = 0
    got = sorted(
        r["id"]
        for r in S.snapshot_read(spark, tbl, partition_prune={"k": key})
        .where(F.col("k") == key)
        .collect()
    )
    assert got == [i for i in range(100, 400) if i % 37 == key]


def test_identity_and_truncate_transforms(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr(
        "id", "CONCAT('user-', CAST(id % 10 AS STRING), '-x') AS name"
    )
    S.snapshot_write(
        df, tbl, mode="overwrite", n_files=5,
        partition_spec=[("truncate", "name", 6), ("identity", "id")],
    )
    got = (
        S.snapshot_read(spark, tbl, partition_prune={"name": "user-7-x"})
        .where("name = 'user-7-x'")
        .count()
    )
    assert got == 10
    all_files, _ = S._plan_files(tbl, 1, None)
    kept, _ = S._plan_files(tbl, 1, ("_pt_trunc6_name", "user-7", "user-7"))
    assert 0 < len(kept) < len(all_files)


def test_hidden_pruning_survives_maintenance_and_merge(spark, tmp_path):
    """Rewrites RE-DERIVE the hidden columns (_pt_materialize): after a
    CoW merge, binpack, and a full compact, a point probe through the
    spec still prunes to a strict file subset with row-complete results
    — maintenance no longer degrades the layout contract."""
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(
        _mk(spark), tbl, mode="overwrite", n_files=8,
        partition_spec=[("bucket", "k", 8)], stats_cols=["id"],
    )

    def probe_kept(version=None):
        all_files, _ = S._plan_files(tbl, version, None)
        pruned = S.snapshot_read(
            spark, tbl, version=version, partition_prune={"k": 17}
        ).where(F.col("k") == 17)
        full = (
            S.snapshot_read(spark, tbl, version=version)
            .where(F.col("k") == 17)
            .count()
        )
        kept = len(pruned.inputFiles())
        assert pruned.count() == full > 0
        return kept, len(all_files)

    k0, n0 = probe_kept()
    assert 0 < k0 < n0
    # CoW merge rewrites a touched file; the rewrite must re-derive
    S.snapshot_merge(
        spark, tbl, _mk(spark).where("id = 17").withColumn("k", F.lit(17)),
        on=["id"], when_matched="update", insert_not_matched=True,
        strategy="cow", n_files_new=2,
    )
    k1, n1 = probe_kept()
    assert 0 < k1 < n1, (k1, n1)
    # binpack repacks the small merge outputs (target sized so the
    # repack emits a few files — one giant file can't show pruning)
    S.snapshot_binpack(spark, tbl, target_rows=100)
    k2, n2 = probe_kept()
    assert 0 < k2 < n2, (k2, n2)
    # full compact rewrites EVERY file — the strongest case
    S.snapshot_compact(spark, tbl, n_files=8)
    k3, n3 = probe_kept()
    assert 0 < k3 < n3, (k3, n3)
    # per-file bounds on the hidden column are near-single-valued again
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    ents = S._all_entries(tbl, m)
    assert all("_pt_bucket8_k" in (e.get("stats") or {}) for e in ents)


def test_overwrite_inherits_spec_and_empty_clears(spark, tmp_path):
    """The recorded partition spec is a TABLE property: truncate-and-
    load inherits it (like checks/properties) unless explicitly
    overridden; [] clears it on overwrite; appends may not clear."""
    tbl = str(tmp_path / "tbl")
    S.snapshot_write(_mk(spark, 60), tbl, mode="overwrite",
                     partition_spec=[("bucket", "k", 4)])
    # plain truncate-and-load: spec survives and hidden pruning works
    S.snapshot_write(_mk(spark, 80), tbl, mode="overwrite", n_files=4)
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert m["partition_spec"] == [["bucket", "k", 4]]
    pruned = S.snapshot_read(spark, tbl, partition_prune={"k": 7})
    assert pruned.where(F.col("k") == 7).count() == (
        S.snapshot_read(spark, tbl).where(F.col("k") == 7).count()
    )
    # appends cannot clear the spec
    with pytest.raises(ValueError, match="conflicts"):
        S.snapshot_write(_mk(spark, 5), tbl, mode="append",
                         partition_spec=[])
    # an explicit [] on overwrite clears it
    S.snapshot_write(_mk(spark, 20), tbl, mode="overwrite",
                     partition_spec=[])
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert m["partition_spec"] is None
    # spec EVOLUTION semantics: a probe on k still resolves through the
    # spec HISTORY (files written under the old spec would prune; the
    # fresh overwrite's files carry no hidden columns, so the predicate
    # is inert — correct, merely unpruned). A never-specced column
    # still raises.
    assert S.snapshot_read(
        spark, tbl, partition_prune={"k": 1}
    ).where("k = 1").count() == S.snapshot_read(spark, tbl).where(
        "k = 1"
    ).count()
    with pytest.raises(ValueError, match="no transform"):
        S.snapshot_read(spark, tbl, partition_prune={"x": 1})


def test_bucket_probe_matches_spark_for_booleans(spark, tmp_path):
    """_pt_probe canonicalizes booleans the way Spark's CAST AS STRING
    does ('true', not 'True'), so a boolean point probe prunes the
    bucket the writer actually used."""
    tbl = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr("id", "id % 3 = 0 AS flag")
    S.snapshot_write(df, tbl, mode="overwrite", n_files=4,
                     partition_spec=[("bucket", "flag", 2)])
    pruned = S.snapshot_read(spark, tbl, partition_prune={"flag": True})
    got = pruned.where(F.col("flag")).count()
    assert got == 34  # every matching row survives the prune


def test_partition_prune_rejects_uncanonical_probe_types(spark, tmp_path):
    """Bucket/truncate probes on floats, Decimals, or fractional-second
    timestamps must RAISE: driver-side str() and Spark's CAST AS STRING
    canonicalize those differently, so a silent mismatch would prune
    files that contain matching rows (wrong results, not degraded)."""
    import datetime as dt_
    from decimal import Decimal

    tbl = str(tmp_path / "probes")
    S.snapshot_write(
        _mk(spark), tbl, mode="overwrite", n_files=4,
        partition_spec=[("bucket", "k", 8)],
    )
    for bad in (3.0, Decimal("3.0"),
                dt_.datetime(2024, 1, 1, 0, 0, 0, 123000)):
        with pytest.raises(TypeError, match="prune the WRONG files"):
            S.snapshot_read(spark, tbl, partition_prune={"k": bad})
    # int probes stay the supported path
    assert S.snapshot_read(
        spark, tbl, partition_prune={"k": 3}
    ).where("k = 3").count() > 0
    tbl2 = str(tmp_path / "probes2")
    S.snapshot_write(
        _mk(spark).selectExpr("id", "CAST(k AS STRING) AS k", "d"),
        tbl2, mode="overwrite", n_files=2,
        partition_spec=[("truncate", "k", 1)],
    )
    with pytest.raises(TypeError, match="prune the WRONG files"):
        S.snapshot_read(spark, tbl2, partition_prune={"k": 1.5})


def test_append_losing_spec_race_raises_named_error(spark, tmp_path, monkeypatch):
    """An append that resolved (and laid its data out for) the table's
    recorded spec, then loses its commit race to an overwrite that
    CHANGED the spec, must raise — re-committing the stale layout would
    silently revert the table's partition contract."""
    tbl = str(tmp_path / "race")
    S.snapshot_write(
        _mk(spark), tbl, mode="overwrite", n_files=2,
        partition_spec=[("bucket", "k", 4)],
    )
    real_commit = S._try_commit
    state = {"raced": False}

    def racing(table, version, manifest):
        if not state["raced"] and manifest.get("mode") == "append":
            state["raced"] = True
            # concurrent overwrite clears the spec and takes the version
            S.snapshot_write(
                _mk(spark, 50), tbl, mode="overwrite", partition_spec=[]
            )
        return real_commit(table, version, manifest)

    monkeypatch.setattr(S, "_try_commit", racing)
    with pytest.raises(ValueError, match="partition-spec race"):
        S.snapshot_write(_mk(spark, 30), tbl, mode="append")
    assert state["raced"]
    # the table's recorded (cleared) spec survived the lost race intact
    m = S._read_manifest(tbl, S.snapshot_versions(tbl)[-1])
    assert not m.get("partition_spec")


def test_partition_spec_evolution_prunes_per_file(spark, tmp_path):
    """snapshot_set_partition_spec changes the layout with ONE metadata
    commit: old files keep pruning through THEIR hidden columns, new
    files through the new spec's, and compaction migrates everything to
    the current spec — the Iceberg spec-evolution contract without a
    big-bang rewrite."""
    tbl = str(tmp_path / "evo")
    S.snapshot_write(
        _mk(spark), tbl, mode="overwrite", n_files=4,
        partition_spec=[("bucket", "k", 4)], stats_cols=["id"],
    )
    v2 = S.snapshot_set_partition_spec(tbl, [("bucket", "k", 8)])
    assert v2 == 2
    m = S._read_manifest(tbl, v2)
    assert m["partition_spec"] == [["bucket", "k", 8]]
    # the history holds BOTH specs (old files prune through the old one)
    assert S._all_specs(m) == [
        [["bucket", "k", 4]], [["bucket", "k", 8]]
    ]
    # the evolution commit is CDF-silent metadata
    assert m["data_change"] is False
    # appends now inherit the NEW spec; the old explicit spec conflicts
    with pytest.raises(ValueError, match="conflicts with"):
        S.snapshot_write(
            _mk(spark, 50), tbl, mode="append",
            partition_spec=[("bucket", "k", 4)],
        )
    S.snapshot_write(
        _mk(spark, 800).where("id >= 400"), tbl, mode="append", n_files=8,
    )
    # correctness across mixed layouts: the pruned read is row-complete
    # for k=7 across BOTH batches (pruning drops files, never rows)
    want = S.snapshot_read(spark, tbl).where("k = 7").count()
    got = S.snapshot_read(spark, tbl, partition_prune={"k": 7})
    assert got.where("k = 7").count() == want > 0
    # per-file pruning observability: each batch responds to ITS spec's
    # predicate — far fewer files kept than the 12 on disk
    import zlib

    p4 = zlib.crc32(b"7") % 4
    p8 = zlib.crc32(b"7") % 8
    kept, _ = S._plan_files(
        tbl, None,
        [("_pt_bucket4_k", p4, p4), ("_pt_bucket8_k", p8, p8)],
    )
    total, _ = S._plan_files(tbl, None, None)
    # both batches respond to their own spec's predicate: at most ~one
    # bucket's worth of files per batch survives
    assert 0 < len(kept) <= len(total) // 2 < len(total)
    # compaction MIGRATES everything to the current spec
    S.snapshot_compact(spark, tbl, n_files=8)
    kept2, _ = S._plan_files(tbl, None, [("_pt_bucket8_k", p8, p8)])
    total2, _ = S._plan_files(tbl, None, None)
    assert 0 < len(kept2) < len(total2)
    got2 = S.snapshot_read(spark, tbl, partition_prune={"k": 7})
    assert got2.where("k = 7").count() == want
    # clearing the spec: appends land unpartitioned, probes still
    # resolve through the history
    S.snapshot_set_partition_spec(tbl, [])
    S.snapshot_write(_mk(spark, 60), tbl, mode="append", n_files=1)
    assert S.snapshot_read(
        spark, tbl, partition_prune={"k": 7}
    ).where("k = 7").count() == S.snapshot_read(spark, tbl).where(
        "k = 7"
    ).count()
    # idempotent re-set no-ops
    v = S.snapshot_versions(tbl)[-1]
    assert S.snapshot_set_partition_spec(tbl, []) == v


def test_retired_spec_transform_never_vetoes_probe(spark, tmp_path):
    """A probe the CURRENT spec supports must not be vetoed by a retired
    transform that can't express it: the retired layout's files simply
    stay unpruned. The current spec rejecting the probe still raises."""
    tbl = str(tmp_path / "veto")
    S.snapshot_write(
        _mk(spark), tbl, mode="overwrite", n_files=4,
        partition_spec=[("bucket", "k", 8)],
    )
    S.snapshot_set_partition_spec(tbl, [("identity", "k")])
    S.snapshot_write(_mk(spark, 100), tbl, mode="append", n_files=2)
    # a RANGE probe: retired bucket can't express it (skipped), the
    # current identity transform prunes fine
    got = S.snapshot_read(spark, tbl, partition_prune={"k": (5, 10)})
    want = S.snapshot_read(spark, tbl).where("k BETWEEN 5 AND 10").count()
    assert got.where("k BETWEEN 5 AND 10").count() == want > 0
    # current spec back to bucket: the range probe now raises
    S.snapshot_set_partition_spec(tbl, [("bucket", "k", 8)])
    with pytest.raises(ValueError, match="point probes only"):
        S.snapshot_read(spark, tbl, partition_prune={"k": (5, 10)})
