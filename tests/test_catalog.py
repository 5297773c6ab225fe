"""Mini-catalog (ops/catalog.py): multi-table ATOMIC commits on one
conditional PUT — the torn-pair closer for external readers of
source+MV (or any table pair). The headline test hammers concurrent
readers across live refreshes and proves no inconsistent
(source version, MV state) pair is ever observable, on BOTH stores."""

from __future__ import annotations

import threading

import pytest

from e02_spark.ops import catalog as C
from e02_spark.ops import snapshot as S


def test_catalog_create_set_resolve_roundtrip(spark, tmp_path, table_store):
    cat = str(tmp_path / "cat")
    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    S.snapshot_write(spark.range(10).selectExpr("id", "id AS v"), t1,
                     mode="overwrite", n_files=1)
    S.snapshot_write(spark.range(5).selectExpr("id", "id AS v"), t2,
                     mode="overwrite", n_files=1)
    C.catalog_create(cat)
    with pytest.raises(FileExistsError):
        C.catalog_create(cat)
    # one atomic two-table swap; None pins current latest
    cv = C.catalog_set(cat, {"a": (t1, None), "b": (t2, 1)})
    got = C.catalog_resolve(cat)
    assert got["a"][1] == 1 and got["b"][1] == 1
    assert C.catalog_read(spark, cat, "a").count() == 10
    # tables advance; the catalog still serves the pinned versions
    S.snapshot_write(spark.range(10, 30).selectExpr("id", "id AS v"), t1,
                     mode="append", n_files=1)
    assert C.catalog_read(spark, cat, "a").count() == 10
    cv2 = C.catalog_set(cat, {"a": (t1, None)}, drops=["b"])
    assert cv2 == cv + 1
    assert C.catalog_read(spark, cat, "a").count() == 30
    with pytest.raises(KeyError, match="no table 'b'"):
        C.catalog_resolve(cat, ["b"])


def test_catalog_concurrent_swappers_all_land(tmp_path, table_store):
    """N threads race catalog_set: every commit lands exactly once
    (CAS retry), no update is lost, and the final manifest reflects all
    of them — on both stores."""
    import os

    cat = str(tmp_path / "cat")
    C.catalog_create(cat)
    os.makedirs(str(tmp_path / "d"), exist_ok=True)
    errs: list[Exception] = []

    def swap(i):
        try:
            C.catalog_set(
                cat, {f"t{i}": (str(tmp_path / "d"), i)}, max_retries=100
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    # bypass the snapshot-version resolve by pinning explicit versions
    threads = [threading.Thread(target=swap, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    got = C.catalog_resolve(cat)
    assert {k: v[1] for k, v in got.items()} == {
        f"t{i}": i for i in range(12)
    }
    assert C.catalog_versions(cat)[-1] == 13  # 1 create + 12 commits


def test_catalog_expire_retention(spark, tmp_path, table_store):
    """catalog_expire keeps the newest keep_last manifests (floor 1 —
    the CAS base every writer needs) and drops the rest; resolve and
    subsequent swaps keep working, and version numbers never rewind —
    on both stores."""
    cat = str(tmp_path / "cat")
    t1 = str(tmp_path / "t1")
    S.snapshot_write(spark.range(10).selectExpr("id", "id AS v"), t1,
                     mode="overwrite", n_files=1)
    C.catalog_create(cat)
    for i in range(8):
        C.catalog_set(cat, {"a": (t1, 1), f"x{i}": (t1, 1)})
    assert len(C.catalog_versions(cat)) == 9
    r = C.catalog_expire(cat, keep_last=3)
    assert r["manifests_dropped"] == 6
    assert C.catalog_versions(cat) == r["kept"] == [7, 8, 9]
    # the surviving latest still resolves the full accumulated state
    got = C.catalog_resolve(cat)
    assert "a" in got and "x7" in got and len(got) == 9
    # swaps continue from latest+1 (no version reuse after expire)
    cv = C.catalog_set(cat, {"b": (t1, 1)})
    assert cv == 10
    with pytest.raises(ValueError, match="keep_last"):
        C.catalog_expire(cat, keep_last=0)
    # floor: keep_last larger than history is a no-op
    r2 = C.catalog_expire(cat, keep_last=50)
    assert r2["manifests_dropped"] == 0


def test_catalog_set_survives_expired_version_recreation(
    tmp_path, table_store, monkeypatch
):
    """The deterministic twin of the concurrent-swapper storm: a writer
    whose listing went stale CAS-puts at a version number a racing
    expire just collected. The put SUCCEEDS (the path is absent again),
    but the manifest is a dead branch no reader consumes — without the
    gc-floor check the swap is silently lost. catalog_set must detect
    the recreation, undo it, and land the swap on the true latest."""
    import os

    cat = str(tmp_path / "cat")
    d = str(tmp_path / "d")
    os.makedirs(d, exist_ok=True)
    C.catalog_create(cat)  # v1
    for i in range(5):  # v2..v6
        C.catalog_set(cat, {f"t{i}": (d, i)})

    real_versions = C.catalog_versions
    real_read = C._read
    state = {"listings": 0, "expired": False}

    def stale_first_listing(catalog):
        state["listings"] += 1
        if state["listings"] == 1:
            return [1, 2]  # the writer saw latest=2 long ago
        return real_versions(catalog)

    def read_then_expire(catalog, version):
        out = real_read(catalog, version)
        if not state["expired"]:
            state["expired"] = True
            # expire fires AFTER the stale writer read its base but
            # BEFORE its CAS: keeps v5/v6, deletes v1-v4 — so the
            # writer's put at v3 lands on a recreated dead version
            C.catalog_expire(cat, keep_last=2)
        return out

    monkeypatch.setattr(C, "catalog_versions", stale_first_listing)
    monkeypatch.setattr(C, "_read", read_then_expire)
    got = C.catalog_set(cat, {"t_lost": (d, 99)})
    assert got == 7  # landed ON TOP of the true latest, not at v3
    st = C.store_for(cat)
    assert not st.exists(C._manifest_path(cat, 3))  # recreation undone
    resolved = C.catalog_resolve(cat)
    assert resolved["t_lost"][1] == 99
    assert {k: v[1] for k, v in resolved.items()} == {
        "t0": 0, "t1": 1, "t2": 2, "t3": 3, "t4": 4, "t_lost": 99,
    }


def test_catalog_expire_races_concurrent_swappers(tmp_path, table_store):
    """Expire running INSIDE a storm of catalog_set swaps: every swap
    still lands exactly once (expire never touches latest or latest+1),
    and the final state reflects all of them."""
    import os

    cat = str(tmp_path / "cat")
    C.catalog_create(cat)
    os.makedirs(str(tmp_path / "d"), exist_ok=True)
    errs: list[Exception] = []
    stop = threading.Event()

    def swap(i):
        try:
            C.catalog_set(
                cat, {f"t{i}": (str(tmp_path / "d"), i)}, max_retries=200
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def gc():
        try:
            while not stop.is_set():
                C.catalog_expire(cat, keep_last=2)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    g = threading.Thread(target=gc)
    g.start()
    threads = [threading.Thread(target=swap, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    g.join()
    assert not errs
    got = C.catalog_resolve(cat)
    assert {k: v[1] for k, v in got.items()} == {
        f"t{i}": i for i in range(10)
    }
    C.catalog_expire(cat, keep_last=2)  # quiesced: retention is exact
    assert len(C.catalog_versions(cat)) == 2


def test_expire_respects_catalog_pins(spark, tmp_path, table_store):
    """The cross-plane retention gap: a version pinned only by a CATALOG
    manifest must survive snapshot_expire when the catalog is named
    (the tag/branch ref-retention rule extended across planes) — and is
    honestly collectable when it is not."""
    cat = str(tmp_path / "cat")
    tbl = str(tmp_path / "t1")
    S.snapshot_write(spark.range(10).selectExpr("id", "id AS v"), tbl,
                     mode="overwrite", n_files=1)
    S.snapshot_write(spark.range(10, 20).selectExpr("id", "id AS v"), tbl,
                     mode="append", n_files=1)
    C.catalog_create(cat)
    C.catalog_set(cat, {"a": (tbl, 2)})
    S.snapshot_write(spark.range(20, 30).selectExpr("id", "id AS v"), tbl,
                     mode="append", n_files=1)
    r = S.snapshot_expire(tbl, keep_last=1, clean_orphans=True,
                          catalogs=[cat])
    assert r["manifests_dropped"] == 1  # v1 went, v2 pinned, v3 kept
    assert S.snapshot_versions(tbl) == [2, 3]
    # the cataloged read still resolves, content exact
    assert C.catalog_read(spark, cat, "a").count() == 20
    # re-pin to latest, then the old pin is collectable again
    C.catalog_set(cat, {"a": (tbl, None)})
    r2 = S.snapshot_expire(tbl, keep_last=1, clean_orphans=True,
                           catalogs=[cat])
    assert S.snapshot_versions(tbl) == [3]
    assert r2["manifests_dropped"] == 1
    assert C.catalog_read(spark, cat, "a").count() == 30
    # a table the catalog does not mention expires exactly as before
    tbl2 = str(tmp_path / "t2")
    S.snapshot_write(spark.range(5).selectExpr("id", "id AS v"), tbl2,
                     mode="overwrite", n_files=1)
    S.snapshot_write(spark.range(5, 9).selectExpr("id", "id AS v"), tbl2,
                     mode="append", n_files=1)
    S.snapshot_expire(tbl2, keep_last=1, catalogs=[cat])
    assert S.snapshot_versions(tbl2) == [2]


def test_catalog_no_torn_pair_under_concurrent_refresh(
    spark, tmp_path, table_store
):
    """THE torn-window closer: a writer loop advances the source and
    publishes (src pin, mv pin) through mv_refresh_cataloged while
    reader threads resolve both pins from the catalog and check
    CONSISTENCY — the MV state at the pinned MV version must equal the
    recompute of the source at the pinned SOURCE version. Any torn
    combination (new source with stale MV or vice versa) fails the sum
    check. Runs against both stores."""
    from e02_spark.ops.mv import mv_create

    cat = str(tmp_path / "cat")
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    S.snapshot_write(
        spark.range(100).selectExpr("id", "id % 5 AS g", "id AS v"),
        src, mode="overwrite", n_files=1,
    )
    mv_create(spark, src, mv, keys=["g"], sums={"sv": "v"})
    C.catalog_create(cat)
    C.catalog_set(cat, {"src": (src, None), "mv": (mv, None)})
    stop = threading.Event()
    failures: list[str] = []

    def reader():
        while not stop.is_set():
            pins = C.catalog_resolve(cat, ["src", "mv"])
            sdir, sv = pins["src"]
            mdir, mvv = pins["mv"]
            # consistency: the MV's stored cursor at the pinned MV
            # version must BE the pinned source version (state content
            # is a deterministic function of the cursor — pinned by the
            # sum check below, done once at the end to keep the loop
            # metadata-only and therefore tight)
            props = (
                S._read_manifest(mdir, mvv).get("properties") or {}
            )
            cur = props.get("mv_src_version")
            if cur != sv:
                failures.append(f"torn pair: src pin v{sv}, mv cursor v{cur}")
                return

    readers = [threading.Thread(target=reader) for _ in range(4)]
    for t in readers:
        t.start()
    try:
        for step in range(5):
            S.snapshot_write(
                spark.range(100 * (step + 1), 100 * (step + 2)).selectExpr(
                    "id", "id % 5 AS g", "id AS v"
                ),
                src, mode="append", n_files=1,
            )
            r = C.mv_refresh_cataloged(spark, src, mv, cat)
            assert r["noop"] is False
    finally:
        stop.set()
        for t in readers:
            t.join()
    assert not failures, failures
    # final content consistency: resolve once, read both at their pins,
    # and the MV state equals the recompute of the pinned source
    pins = C.catalog_resolve(cat, ["src", "mv"])
    src_df = S.snapshot_read(spark, pins["src"][0],
                             version=pins["src"][1])
    mv_df = S.snapshot_read(spark, pins["mv"][0], version=pins["mv"][1])
    want = {
        (r["g"], r["sv"]) for r in src_df.groupBy("g")
        .agg({"v": "sum"}).withColumnRenamed("sum(v)", "sv").collect()
    }
    got = {(r["g"], r["sv"]) for r in mv_df.select("g", "sv").collect()}
    assert got == want


def test_catalog_register_pins_consistent_views(spark, tmp_path):
    """catalog_register exposes the multi-table snapshot as SQL views:
    both views come from ONE catalog resolve, stay frozen at their
    pinned versions while the tables move on, and jump together on
    re-register after a catalog_set."""
    cat = str(tmp_path / "cat")
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    S.snapshot_write(
        spark.range(100).selectExpr("id", "id % 5 as k"), fact,
        mode="overwrite", n_files=1,
    )
    S.snapshot_write(
        spark.range(5).selectExpr("id as k", "concat('g', id) as name"),
        dim, mode="overwrite", n_files=1,
    )
    C.catalog_create(cat)
    C.catalog_set(cat, {"fact": (fact, None), "dim": (dim, None)})
    views = C.catalog_register(spark, cat, "c")
    assert views == ["c_dim", "c_fact"]
    joined = spark.sql(
        "SELECT count(*) AS n FROM c_fact JOIN c_dim USING (k)"
    ).first()["n"]
    assert joined == 100
    # tables advance; the REGISTERED views stay on the pinned pair
    S.snapshot_write(
        spark.range(100, 150).selectExpr("id", "id % 5 as k"), fact,
        mode="append", n_files=1,
    )
    assert spark.sql("SELECT count(*) AS n FROM c_fact").first()["n"] == 100
    # one catalog_set + re-register moves the family forward atomically
    C.catalog_set(cat, {"fact": (fact, None)})
    C.catalog_register(spark, cat, "c")
    assert spark.sql("SELECT count(*) AS n FROM c_fact").first()["n"] == 150
    assert spark.sql("SELECT count(*) AS n FROM c_dim").first()["n"] == 5
