"""Write-audit-publish (ops/snapshot.snapshot_publish): zero-copy
adoption of a staging snapshot table's files into the main table as one
atomic append commit — stats reused, hard links instead of byte copies,
CHECK constraints still enforced, schema evolving add-only."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from e02_spark.ops import snapshot as S


def _mk_main(spark, tmp_path):
    main = str(tmp_path / "main")
    S.snapshot_write(
        spark.range(100).selectExpr("id", "id * 2 AS v"), main,
        mode="overwrite", n_files=2, cluster_by=["id"], stats_cols=["id"],
    )
    return main


def test_publish_adopts_without_copying(spark, tmp_path):
    main = _mk_main(spark, tmp_path)
    stg = str(tmp_path / "stg")
    S.snapshot_write(
        spark.range(1000, 1100).selectExpr("id", "id * 2 AS v"), stg,
        mode="overwrite", n_files=2, cluster_by=["id"], stats_cols=["id"],
    )
    res = S.snapshot_publish(spark, stg, main)
    assert res["files_adopted"] == 2 and res["rows_adopted"] == 100
    assert S.snapshot_rows(main) == 200
    got = {r["id"] for r in S.snapshot_read(spark, main).collect()}
    assert got == set(range(100)) | set(range(1000, 1100))
    # zero-copy: every adopted file is a HARD LINK to the staged file
    m = S._read_manifest(main, res["version"])
    adopted = [
        e for e in S._all_entries(main, m) if e.get("seq") == res["version"]
    ]
    assert len(adopted) == 2
    for e in adopted:
        assert os.stat(os.path.join(main, e["path"])).st_nlink >= 2
        # stats rode along: manifest bounds present without any read
        assert "id" in e["stats"]
    # ...and manifest pruning works on them immediately
    kept, _ = S._plan_files(main, None, ("id", 1000, 1010))
    assert 0 < len(kept) < 4
    # staging-side GC cannot pull the data out from under main
    S.snapshot_write(
        spark.range(5).selectExpr("id", "id * 2 AS v"), stg,
        mode="overwrite", n_files=1,
    )
    S.snapshot_expire(stg, keep_last=1, clean_orphans=True)
    assert S.snapshot_read(spark, main).count() == 200


def test_publish_enforces_main_checks(spark, tmp_path):
    main = _mk_main(spark, tmp_path)
    S.snapshot_set_check(spark, main, "v_nonneg", "v >= 0")
    stg = str(tmp_path / "stg")
    S.snapshot_write(
        spark.createDataFrame([(500, -1)], "id BIGINT, v BIGINT"), stg,
        mode="overwrite", n_files=1,
    )
    v0 = S.snapshot_versions(main)[-1]
    with pytest.raises(S.CheckViolation, match="v_nonneg"):
        S.snapshot_publish(spark, stg, main)
    assert S.snapshot_versions(main)[-1] == v0  # nothing committed
    good = str(tmp_path / "good")
    S.snapshot_write(
        spark.createDataFrame([(500, 1)], "id BIGINT, v BIGINT"), good,
        mode="overwrite", n_files=1,
    )
    assert S.snapshot_publish(spark, good, main)["rows_adopted"] == 1


def test_publish_evolves_schema_add_only(spark, tmp_path):
    main = _mk_main(spark, tmp_path)
    stg = str(tmp_path / "stg")
    S.snapshot_write(
        spark.createDataFrame(
            [(900, 1, "x")], "id BIGINT, v BIGINT, tag STRING"
        ),
        stg, mode="overwrite", n_files=1,
    )
    S.snapshot_publish(spark, stg, main)
    cur = S.snapshot_read(spark, main)
    assert cur.columns == ["id", "v", "tag"]
    assert cur.where("tag IS NULL").count() == 100  # old files backfill
    assert cur.where("tag = 'x'").count() == 1
    # conflicting type raises
    bad = str(tmp_path / "bad")
    S.snapshot_write(
        spark.createDataFrame([(901, "no")], "id BIGINT, v STRING"), bad,
        mode="overwrite", n_files=1,
    )
    with pytest.raises(ValueError, match="ADDING columns only"):
        S.snapshot_publish(spark, bad, main)


def test_publish_rejects_staging_deletes_and_is_idempotent(spark, tmp_path):
    main = _mk_main(spark, tmp_path)
    stg = str(tmp_path / "stg")
    S.snapshot_write(
        spark.range(300, 320).selectExpr("id", "id * 2 AS v"), stg,
        mode="overwrite", n_files=1,
    )
    S.snapshot_merge(
        spark, stg, spark.createDataFrame([(305,)], "id BIGINT"),
        on=["id"], when_matched="delete", insert_not_matched=False,
        strategy="mor",
    )
    with pytest.raises(ValueError, match="outstanding"):
        S.snapshot_publish(spark, stg, main)
    S.snapshot_rewrite_deletes(spark, stg, n_files_new=1)
    r1 = S.snapshot_publish(spark, stg, main, idempotency_key="pub-1")
    assert r1["rows_adopted"] == 19
    # replay: same key -> no second adoption
    r2 = S.snapshot_publish(spark, stg, main, idempotency_key="pub-1")
    assert r2["files_adopted"] == 0
    assert S.snapshot_versions(main)[-1] == r1["version"]
    assert S.snapshot_rows(main) == 119


def test_publish_pinned_staging_version(spark, tmp_path):
    """A caller that audited a specific staging version pins it: a
    staging commit racing between the caller's read and the publish is
    NOT silently adopted (the clone-bootstrap base-marker guarantee)."""
    main = _mk_main(spark, tmp_path)
    stg = str(tmp_path / "stg")
    S.snapshot_write(
        spark.range(1000, 1050).selectExpr("id", "id * 2 AS v"), stg,
        mode="overwrite", n_files=1, stats_cols=["id"],
    )
    v1 = S.snapshot_versions(stg)[-1]
    # a racing commit lands AFTER the caller resolved v1
    S.snapshot_write(
        spark.range(2000, 2100).selectExpr("id", "id * 2 AS v"), stg,
        mode="append", n_files=1,
    )
    res = S.snapshot_publish(spark, stg, main, staging_version=v1)
    assert res["rows_adopted"] == 50  # v1's content, not latest's 150
    got = {r["id"] for r in S.snapshot_read(spark, main).collect()}
    assert got == set(range(100)) | set(range(1000, 1050))
    # pinning a version that was never committed raises by name
    with pytest.raises(ValueError, match="not a committed version"):
        S.snapshot_publish(spark, stg, main, staging_version=999)
