"""Pluggable metadata store (ops/store.py): the snapshot commit
protocol must hold on object-store semantics — conditional PUT instead
of O_EXCL link, byte-copy adoption instead of hard links, idempotent
deletes — not just POSIX. The fuzz/concurrency suites additionally run
parametrized over both stores (see conftest.table_store)."""

from __future__ import annotations

import os

import pytest

from e02_spark.ops import snapshot as S
from e02_spark.ops.store import (
    FakeObjectStore,
    LocalFSStore,
    register_store,
    store_for,
    unregister_store,
)


def test_conditional_put_contract(tmp_path):
    for st in (LocalFSStore(), FakeObjectStore()):
        p = str(tmp_path / f"{type(st).__name__}.json")
        assert st.put_json_if_absent(p, {"a": 1}) is True
        assert st.put_json_if_absent(p, {"a": 2}) is False  # loser signal
        assert st.get_json(p) == {"a": 1}  # winner's content intact
        st.delete(p)
        st.delete(p)  # idempotent: missing object is not an error
        assert st.mtime(p) is None


def test_registry_longest_prefix_wins(tmp_path):
    a, b = FakeObjectStore(), FakeObjectStore()
    register_store(str(tmp_path), a)
    register_store(str(tmp_path / "deep"), b)
    try:
        assert store_for(str(tmp_path / "t1")) is a
        assert store_for(str(tmp_path / "deep" / "t2")) is b
        assert store_for(str(tmp_path / "deeper")) is a  # no partial-segment match
        assert isinstance(store_for("/somewhere/else"), LocalFSStore)
        assert not isinstance(store_for("/somewhere/else"), FakeObjectStore)
    finally:
        unregister_store(str(tmp_path))
        unregister_store(str(tmp_path / "deep"))


def test_registry_uri_prefix_needs_segment_boundary():
    """'s3://bucket' must not capture 's3://bucket-other/tbl' — URI
    routing matches on a path-segment boundary, like filesystem
    prefixes do."""
    a = FakeObjectStore()
    register_store("s3://bucket", a)
    try:
        assert store_for("s3://bucket") is a
        assert store_for("s3://bucket/tbl") is a
        assert store_for("s3://bucket/deep/tbl") is a
        other = store_for("s3://bucket-other/tbl")
        assert other is not a  # falls through to the default
        assert not isinstance(other, FakeObjectStore)
    finally:
        unregister_store("s3://bucket")
    # trailing-slash registration behaves identically
    register_store("s3://bucket2/", a)
    try:
        assert store_for("s3://bucket2/tbl") is a
        assert not isinstance(
            store_for("s3://bucket2x/tbl"), FakeObjectStore
        )
    finally:
        unregister_store("s3://bucket2/")


def test_fake_store_counts_are_thread_safe(tmp_path):
    """The primitive tally must not drop increments under the same
    multi-thread contention the concurrency suites apply."""
    import threading

    st = FakeObjectStore()
    n_threads, per_thread = 8, 200

    def hammer(i):
        for k in range(per_thread):
            st.put_json(str(tmp_path / f"obj-{i}-{k}.json"), {"k": k})
            st.delete(str(tmp_path / f"obj-{i}-{k}.json"))

    threads = [threading.Thread(target=hammer, args=(i,))
               for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert st.counts["put"] == n_threads * per_thread
    assert st.counts["delete"] == n_threads * per_thread


def test_object_store_publish_adopts_by_copy(spark, tmp_path):
    """Write-audit-publish under S3 semantics: adoption copies bytes
    (distinct inodes — no link dependency), main survives staging-side
    expire, and the whole cycle uses only object-store primitives."""
    st = FakeObjectStore()
    register_store(str(tmp_path), st)
    try:
        stg, main = str(tmp_path / "stg"), str(tmp_path / "main")
        df = spark.range(40).selectExpr("id", "id * 3 AS v")
        S.snapshot_write(df, main, mode="overwrite", n_files=1,
                         stats_cols=["id"])
        S.snapshot_write(df.where("id >= 40"), stg, mode="overwrite",
                         n_files=1)
        S.snapshot_write(
            spark.range(40, 60).selectExpr("id", "id * 3 AS v"), stg,
            mode="overwrite", n_files=1, stats_cols=["id"],
        )
        res = S.snapshot_publish(spark, stg, main, idempotency_key="pub1")
        assert res["rows_adopted"] == 20 and st.counts["copy"] >= 1
        # distinct inodes: the adopted file is main's own object
        stg_files = [
            os.path.join(stg, e["path"])
            for e in S._all_entries(
                stg, S._read_manifest(stg, S.snapshot_versions(stg)[-1])
            )
        ]
        main_m = S._read_manifest(main, S.snapshot_versions(main)[-1])
        adopted = [
            os.path.join(main, e["path"])
            for e in S._all_entries(main, main_m)
            if "data/" in e["path"]
        ]
        inodes_stg = {os.stat(p).st_ino for p in stg_files}
        inodes_main = {os.stat(p).st_ino for p in adopted}
        assert not (inodes_stg & inodes_main)
        # staging-side expire cannot disturb main (copied bytes)
        S.snapshot_expire(stg, keep_last=0, clean_orphans=True)
        assert S.snapshot_rows(main) == 60
        assert S.snapshot_read(spark, main).count() == 60
    finally:
        unregister_store(str(tmp_path))


def test_object_store_full_lifecycle_counts(spark, tmp_path):
    """A write/merge/compact/expire cycle under the fake store touches
    metadata ONLY through the object-store-expressible primitives, and
    every commit goes through a conditional put."""
    st = FakeObjectStore()
    register_store(str(tmp_path), st)
    try:
        tbl = str(tmp_path / "tbl")
        S.snapshot_write(
            spark.range(50).selectExpr("id", "id * 2 AS v"), tbl,
            mode="overwrite", n_files=2, cluster_by=["id"],
            stats_cols=["id"],
        )
        S.snapshot_merge(
            spark, tbl,
            spark.createDataFrame([(3, 999), (70, 700)],
                                  "id bigint, v bigint"),
            on=["id"], when_matched="update", insert_not_matched=True,
            strategy="mor",
        )
        S.snapshot_rewrite_deletes(spark, tbl)
        S.snapshot_compact(spark, tbl, n_files=1, cluster_by=["id"])
        got = {r["id"]: r["v"] for r in S.snapshot_read(spark, tbl).collect()}
        assert got[3] == 999 and got[70] == 700 and len(got) == 51
        res = S.snapshot_expire(tbl, keep_last=1, clean_orphans=True)
        assert res["manifests_dropped"] == 3
        assert S.snapshot_read(spark, tbl).count() == 51
        # four commits = four conditional puts; shard writes were plain
        # puts; expire deleted through the store
        assert st.counts["conditional_put"] >= 4
        assert st.counts["put"] >= 4
        assert st.counts["delete"] > 0 and st.counts["list"] > 0
    finally:
        unregister_store(str(tmp_path))


def test_object_store_streaming_sink_and_cdf(spark, tmp_path):
    """The exactly-once streaming sink + CDF stream ride the same store
    routing (their offsets/planning are all manifest reads)."""
    from e02_spark.sources.snapshot_cdf_stream import (
        read_snapshot_changes_stream,
    )

    st = FakeObjectStore()
    register_store(str(tmp_path), st)
    try:
        tbl = str(tmp_path / "tbl")
        S.snapshot_write(
            spark.range(10).selectExpr("id", "id AS v"), tbl,
            mode="overwrite", n_files=1,
        )
        S.snapshot_write(
            spark.range(10, 14).selectExpr("id", "id AS v"), tbl,
            mode="append", idempotency_key="batch-7",
        )
        # replay de-dups through committed_keys (a manifest read)
        v = S.snapshot_versions(tbl)[-1]
        S.snapshot_write(
            spark.range(10, 14).selectExpr("id", "id AS v"), tbl,
            mode="append", idempotency_key="batch-7",
        )
        assert S.snapshot_versions(tbl)[-1] == v
        out = []
        q = (
            read_snapshot_changes_stream(spark, tbl)
            .writeStream.foreachBatch(lambda b, i: out.append(b.collect()))
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(120)
        rows = [r for b in out for r in b]
        assert sorted(r["id"] for r in rows) == list(range(14))
        assert all(r["_change_type"] == "insert" for r in rows)
    finally:
        unregister_store(str(tmp_path))


def test_conditional_put_thread_contention(tmp_path):
    """N threads race put_json_if_absent on one path: exactly one wins,
    the winner's content is intact, and every loser sees False — the
    atomicity the whole commit protocol rests on, for both stores."""
    import threading

    for st in (LocalFSStore(), FakeObjectStore()):
        p = str(tmp_path / f"race-{type(st).__name__}.json")
        results: list[tuple[int, bool]] = []
        lock = threading.Lock()
        barrier = threading.Barrier(16)

        def attempt(i, st=st, p=p):
            barrier.wait()
            ok = st.put_json_if_absent(p, {"winner": i})
            with lock:
                results.append((i, ok))

        threads = [
            threading.Thread(target=attempt, args=(i,)) for i in range(16)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        winners = [i for i, ok in results if ok]
        assert len(winners) == 1, results
        assert st.get_json(p) == {"winner": winners[0]}
