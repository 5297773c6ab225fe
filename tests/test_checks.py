"""CHECK constraints on the snapshot table (snapshot_set_check /
snapshot_drop_check + enforcement in every row-adding commit path).

Contract (Delta ADD CONSTRAINT shape): a named SQL predicate recorded
in the manifest; new rows are validated at commit time (FALSE violates,
NULL/UNKNOWN passes), existing content is validated when the check is
added, the constraint survives overwrite/merge/maintenance and rolls
back with metadata.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e02_spark.ops.snapshot import (
    CheckViolation,
    snapshot_drop_check,
    snapshot_merge,
    snapshot_read,
    snapshot_rollback,
    snapshot_set_check,
    snapshot_versions,
    snapshot_write,
)


def _mk(spark, tmp_path, n=20):
    table = str(tmp_path / "t")
    snapshot_write(
        spark.range(n).selectExpr("id", "id * 2 AS v"), table,
        mode="overwrite", n_files=2,
    )
    return table


def test_set_check_then_violating_append_rejected(spark, tmp_path):
    table = _mk(spark, tmp_path)
    v = snapshot_set_check(spark, table, "v_nonneg", "v >= 0")
    assert v == 2
    good = spark.createDataFrame([(100, 7)], "id BIGINT, v BIGINT")
    bad = spark.createDataFrame([(101, -1)], "id BIGINT, v BIGINT")
    assert snapshot_write(good, table, mode="append", n_files=1) == 3
    with pytest.raises(CheckViolation, match="v_nonneg"):
        snapshot_write(bad, table, mode="append", n_files=1)
    # nothing committed, content unchanged
    assert snapshot_versions(table)[-1] == 3
    assert snapshot_read(spark, table).where("v < 0").count() == 0


def test_set_check_validates_existing_content(spark, tmp_path):
    table = str(tmp_path / "t")
    snapshot_write(
        spark.createDataFrame([(1, 5), (2, -3)], "id BIGINT, v BIGINT"),
        table, mode="overwrite", n_files=1,
    )
    with pytest.raises(CheckViolation, match="existing content"):
        snapshot_set_check(spark, table, "v_nonneg", "v >= 0")
    assert snapshot_versions(table)[-1] == 1  # nothing recorded
    # validate=False adopts the check for NEW rows only
    snapshot_set_check(spark, table, "v_nonneg", "v >= 0", validate=False)
    with pytest.raises(CheckViolation):
        snapshot_write(
            spark.createDataFrame([(3, -1)], "id BIGINT, v BIGINT"),
            table, mode="append", n_files=1,
        )


def test_null_passes_sql_check_semantics(spark, tmp_path):
    table = _mk(spark, tmp_path)
    snapshot_set_check(spark, table, "v_pos", "v >= 0")
    nulls = spark.createDataFrame(
        [(200, None)], "id BIGINT, v BIGINT"
    )
    snapshot_write(nulls, table, mode="append", n_files=1)  # must not raise
    assert (200, None) in {
        (r["id"], r["v"]) for r in snapshot_read(spark, table).collect()
    }


def test_check_on_evolved_column_null_backfill_passes(spark, tmp_path):
    table = _mk(spark, tmp_path)
    # evolve: add column w, then constrain it
    snapshot_write(
        spark.createDataFrame([(50, 100, 1)], "id BIGINT, v BIGINT, w BIGINT"),
        table, mode="append", n_files=1,
    )
    snapshot_set_check(spark, table, "w_small", "w < 1000")
    # a pre-evolution-shaped append omits w: NULL backfill must PASS
    snapshot_write(
        spark.createDataFrame([(60, 120)], "id BIGINT, v BIGINT"),
        table, mode="append", n_files=1,
    )
    with pytest.raises(CheckViolation, match="w_small"):
        snapshot_write(
            spark.createDataFrame(
                [(70, 140, 5000)], "id BIGINT, v BIGINT, w BIGINT"
            ),
            table, mode="append", n_files=1,
        )


@pytest.mark.parametrize("strategy", ["cow", "mor", "eq"])
def test_merge_enforces_checks(spark, tmp_path, strategy):
    table = _mk(spark, tmp_path)
    snapshot_set_check(spark, table, "v_nonneg", "v >= 0")
    v0 = snapshot_versions(table)[-1]
    bad = spark.createDataFrame([(3, -9)], "id BIGINT, v BIGINT")
    with pytest.raises(CheckViolation, match="v_nonneg"):
        snapshot_merge(
            spark, table, bad, on=["id"], when_matched="update",
            insert_not_matched=True, strategy=strategy,
        )
    assert snapshot_versions(table)[-1] == v0
    good = spark.createDataFrame([(3, 99)], "id BIGINT, v BIGINT")
    res = snapshot_merge(
        spark, table, good, on=["id"], when_matched="update",
        insert_not_matched=True, strategy=strategy,
    )
    assert res["version"] == v0 + 1
    # delete merges add nothing and are never constrained
    snapshot_merge(
        spark, table, spark.createDataFrame([(5,)], "id BIGINT"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy=strategy,
    )


def test_checks_survive_overwrite_and_maintenance(spark, tmp_path):
    from e02_spark.ops.snapshot import (
        snapshot_binpack,
        snapshot_rewrite_deletes,
    )

    table = _mk(spark, tmp_path)
    snapshot_set_check(spark, table, "v_nonneg", "v >= 0")
    # overwrite keeps the constraint AND validates the new content
    with pytest.raises(CheckViolation):
        snapshot_write(
            spark.createDataFrame([(1, -5)], "id BIGINT, v BIGINT"),
            table, mode="overwrite", n_files=1,
        )
    snapshot_write(
        spark.range(10).selectExpr("id", "id AS v"), table,
        mode="overwrite", n_files=4,
    )
    snapshot_merge(
        spark, table, spark.createDataFrame([(1,)], "id BIGINT"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    snapshot_rewrite_deletes(spark, table, n_files_new=1)
    snapshot_binpack(spark, table, target_rows=1000)
    # after the whole maintenance chain the check still enforces
    with pytest.raises(CheckViolation):
        snapshot_write(
            spark.createDataFrame([(99, -1)], "id BIGINT, v BIGINT"),
            table, mode="append", n_files=1,
        )


def test_rollback_restores_checks_as_of_version(spark, tmp_path):
    table = _mk(spark, tmp_path)  # v1: no checks
    snapshot_set_check(spark, table, "v_nonneg", "v >= 0")  # v2
    bad = spark.createDataFrame([(300, -1)], "id BIGINT, v BIGINT")
    with pytest.raises(CheckViolation):
        snapshot_write(bad, table, mode="append", n_files=1)
    snapshot_rollback(table, 1)  # metadata moves back: check is gone
    snapshot_write(bad, table, mode="append", n_files=1)  # now allowed
    assert snapshot_read(spark, table).where("v < 0").count() == 1


def test_drop_check_and_unknown_name(spark, tmp_path):
    table = _mk(spark, tmp_path)
    snapshot_set_check(spark, table, "v_nonneg", "v >= 0")
    with pytest.raises(KeyError):
        snapshot_drop_check(table, "nope")
    snapshot_drop_check(table, "v_nonneg")
    snapshot_write(
        spark.createDataFrame([(1, -1)], "id BIGINT, v BIGINT"),
        table, mode="append", n_files=1,
    )  # constraint gone
    # re-adding now fails existing-content validation
    with pytest.raises(CheckViolation):
        snapshot_set_check(spark, table, "v_nonneg", "v >= 0")


def test_set_check_conflicting_redefinition_raises(spark, tmp_path):
    table = _mk(spark, tmp_path)
    snapshot_set_check(spark, table, "c", "v >= 0")
    v = snapshot_versions(table)[-1]
    # identical re-add is an idempotent no-op
    assert snapshot_set_check(spark, table, "c", "v >= 0") == v
    with pytest.raises(ValueError, match="different"):
        snapshot_set_check(spark, table, "c", "v > 10")


def test_cdc_sink_respects_checks(spark, tmp_path):
    """The CDC-apply sink goes through snapshot_merge, so a violating
    batch fails the stream instead of committing."""
    import glob
    import os
    import shutil

    from e02_spark.ops.snapshot import snapshot_cdc_sink

    table = _mk(spark, tmp_path)
    snapshot_set_check(spark, table, "v_nonneg", "v >= 0")
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    df = spark.createDataFrame([(5, -100)], "id BIGINT, v BIGINT")
    stage = os.path.join(feed, "_w")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    (src,) = glob.glob(os.path.join(stage, "part-*.parquet"))
    shutil.copyfile(src, os.path.join(feed, "b0.parquet"))
    shutil.rmtree(stage)
    stream = spark.readStream.schema("id BIGINT, v BIGINT").parquet(feed)
    q = snapshot_cdc_sink(
        stream, table, on=["id"], checkpoint_dir=str(tmp_path / "ck")
    )
    with pytest.raises(Exception, match="v_nonneg"):
        q.awaitTermination(300)
        q.processAllAvailable()
    q.stop()
    assert snapshot_read(spark, table).where("v < 0").count() == 0


def test_overwrite_dropping_checked_column_rejected(spark, tmp_path):
    """An overwrite whose schema no longer carries a checked column is
    rejected AT that overwrite (the check cannot resolve against the
    schema the commit would record) — not silently committed leaving
    later appends to explode."""
    table = _mk(spark, tmp_path)
    snapshot_set_check(spark, table, "v_nonneg", "v >= 0")
    v0 = snapshot_versions(table)[-1]
    with pytest.raises(Exception, match="v|V_NONNEG|resolve|UNRESOLVED"):
        snapshot_write(
            spark.range(5).selectExpr("id"), table,
            mode="overwrite", n_files=1,
        )
    assert snapshot_versions(table)[-1] == v0
    # dropping the check first makes the narrowing overwrite legal
    snapshot_drop_check(table, "v_nonneg")
    snapshot_write(
        spark.range(5).selectExpr("id"), table, mode="overwrite", n_files=1
    )
    assert snapshot_read(spark, table).columns == ["id"]
