"""Model-based fuzz of the snapshot table's mutation surface.

A reference model (a plain dict key -> row) and the real table receive
the SAME randomized op sequence — appends, CoW/MoR/EQ upserts and
deletes, rewrite-deletes, binpack, compaction, add-column schema
evolution, rollback, expire — and after every op the table's full
content must
equal the model exactly, snapshot_rows must equal len(model), and CDF
between the first and last version must balance with the model diff.
Seeded RNG: failures replay deterministically.

This is the adversarial twin of the scenario tests in test_layout.py:
those pin designed edges; this hunts the interactions nobody designed
(e.g. a MoR delete, then a CoW update touching the same file, then a
rollback past a schema evolution, then a binpack folding the survivor
tombstones).
"""

from __future__ import annotations

import random

import pytest

from e02_spark.ops import snapshot as S

# amt is INT so the widen_amt op has somewhere lossless to go; the
# string column's NAME is fuzz-state (rename_tag renames it to a fresh
# monotone name — never back: a once-used physical name stays retired)
def _df(spark, rows, evolved=False, tag_col="tag"):
    cols = f"id BIGINT, {tag_col} STRING, amt INT"
    if evolved:
        return spark.createDataFrame(
            [(k, f"t{k}-{v}", v, float(v % 7)) for k, v in rows],
            cols + ", score DOUBLE",
        )
    return spark.createDataFrame(
        [(k, f"t{k}-{v}", v) for k, v in rows], cols
    )


def _key_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "id BIGINT")


def _table_content(spark, table):
    return {
        r["id"]: r["amt"]
        for r in S.snapshot_read(spark, table).select("id", "amt").collect()
    }


def _apply_random_op(spark, rng, table, model, ctx):
    op = rng.choice(
        ["append", "upsert_cow", "upsert_mor", "delete_cow", "delete_mor",
         "upsert_eq", "delete_eq",
         "rewrite", "binpack", "compact", "compact_zorder",
         "evolve_append", "rollback",
         "set_check", "drop_check", "violate_check", "publish",
         "evolve_spec", "rename_tag", "widen_amt",
         "catalog_swap", "catalog_expire", "race_upsert",
         "evolve_merge"]
    )
    if op in ("append", "evolve_append"):
        fresh = [
            (k, rng.randrange(1000))
            for k in rng.sample(range(5000, 9000), rng.randrange(1, 12))
            if k not in model
        ]
        if not fresh:
            return op
        evolved = op == "evolve_append" or ctx["evolved"]
        S.snapshot_write(
            _df(spark, fresh, evolved, ctx["tag_name"]), table,
            mode="append", n_files=rng.choice([1, 2]), stats_cols=["id"],
        )
        ctx["evolved"] = evolved
        model.update(fresh)
    elif op in ("upsert_cow", "upsert_mor", "upsert_eq"):
        keys = rng.sample(sorted(set(model) | set(range(0, 400))),
                          rng.randrange(1, 15))
        rows = [(k, rng.randrange(1000)) for k in keys]
        # update-mode sources must match the (possibly evolved) target
        S.snapshot_merge(
            spark, table,
            _df(spark, rows, ctx["evolved"], ctx["tag_name"]), on=["id"],
            strategy=op.rsplit("_", 1)[1],
            n_files_new=rng.choice([1, 2]),
        )
        model.update(rows)
    elif op in ("delete_cow", "delete_mor", "delete_eq"):
        pool = sorted(set(model) | set(range(0, 200)))
        keys = rng.sample(pool, min(len(pool), rng.randrange(1, 10)))
        S.snapshot_merge(
            spark, table, _key_df(spark, keys), on=["id"],
            when_matched="delete", insert_not_matched=False,
            strategy=op.rsplit("_", 1)[1],
        )
        for k in keys:
            model.pop(k, None)
    elif op == "rewrite":
        S.snapshot_rewrite_deletes(spark, table,
                                   n_files_new=rng.choice([1, 2]))
    elif op == "binpack":
        S.snapshot_binpack(spark, table, target_rows=rng.choice([50, 200]))
    elif op == "compact":
        S.snapshot_compact(spark, table, n_files=rng.choice([1, 3]))
    elif op == "compact_zorder":
        # z-order rewrite composing with the hidden bucket spec, folded
        # deletes of both flavors, and (possibly) the evolved column
        S.snapshot_compact(spark, table, n_files=rng.choice([2, 4]),
                           zorder_by=["id", "amt"])
    elif op == "rollback":
        target = rng.choice(sorted(ctx["history"]))
        S.snapshot_rollback(table, target)
        (past_model, past_evolved, past_check,
         past_tag, past_amt) = ctx["history"][target]
        model.clear()
        model.update(past_model)
        ctx["evolved"] = past_evolved
        ctx["check"] = past_check  # checks roll back with metadata
        # the recorded schema AND its name/type history roll back too
        # (rollback re-commits the target's schema + properties)
        ctx["tag_name"] = past_tag
        ctx["amt_type"] = past_amt
    elif op == "set_check":
        # predicate holds for every generated amt (0..999) but NOT for
        # violate_check's 5000 rows — so ADD CONSTRAINT itself must
        # reject when a violating row slipped in check-free earlier
        if any(v >= 1000 for v in model.values()):
            with pytest.raises(S.CheckViolation):
                S.snapshot_set_check(
                    spark, table, "amt_domain", "amt >= 0 AND amt < 1000"
                )
        else:
            S.snapshot_set_check(
                spark, table, "amt_domain", "amt >= 0 AND amt < 1000"
            )
            ctx["check"] = True
    elif op == "drop_check":
        if ctx["check"]:
            S.snapshot_drop_check(table, "amt_domain")
            ctx["check"] = False
        else:
            with pytest.raises(KeyError):
                S.snapshot_drop_check(table, "amt_domain")
    elif op == "publish":
        # WAP adoption mid-fuzz: fresh keys land via a staging table and
        # snapshot_publish (zero-copy, stats reused) — composing with
        # whatever checks / hidden spec / eq deletes the table carries
        fresh = [
            (k, rng.randrange(1000))
            for k in rng.sample(range(10_000, 14_000), rng.randrange(1, 10))
            if k not in model
        ]
        if fresh:
            import os as _os

            stg = _os.path.join(
                ctx["tmp"], f"stg{len(ctx['versions'])}"
            )
            S.snapshot_write(
                _df(spark, fresh, ctx["evolved"], ctx["tag_name"]),
                stg, mode="overwrite",
                n_files=1, stats_cols=["id"],
            )
            S.snapshot_publish(spark, stg, table)
            model.update(fresh)
    elif op == "evolve_spec":
        # partition-spec EVOLUTION mid-fuzz: one metadata-only commit;
        # content is invariant, later writes lay out under the new
        # spec, and probes keep resolving through the spec HISTORY —
        # composing with merges, rollback (spec restores with
        # metadata), z-order rewrites, and publish
        spec = rng.choice(
            [[("bucket", "id", 4)], [("bucket", "id", 8)],
             [("identity", ctx["tag_name"])], []]
        )
        S.snapshot_set_partition_spec(table, spec)
    elif op == "violate_check":
        k = rng.randrange(9000, 9500)
        while k in model:
            k += 1
        bad = [(k, 5000)]
        if ctx["check"]:
            with pytest.raises(S.CheckViolation):
                S.snapshot_write(
                    _df(spark, bad, ctx["evolved"], ctx["tag_name"]),
                    table, mode="append", n_files=1, stats_cols=["id"],
                )
            # rejected pre-commit: model unchanged
        else:
            S.snapshot_write(
                _df(spark, bad, ctx["evolved"], ctx["tag_name"]),
                table, mode="append", n_files=1, stats_cols=["id"],
            )
            model.update(bad)
    elif op == "rename_tag":
        # RENAME mid-fuzz (metadata-only): content is invariant under
        # the model, every later op writes/reads under the new name,
        # and old files keep serving values through the name history.
        # An identity-tag spec anywhere in the spec HISTORY refuses by
        # name (probes resolve transforms by source column).
        new = f"tag_r{ctx['tag_gen'] + 1}"
        try:
            S.snapshot_rename_column(table, ctx["tag_name"], new)
            ctx["tag_name"] = new
            ctx["tag_gen"] += 1
        except ValueError as e:
            assert "partition transform" in str(e), e
    elif op == "evolve_merge":
        # add-only schema evolution THROUGH a merge (merge_schema=True,
        # round 12): the first time, the upsert source carries the
        # evolved score column against a table that lacks it — landing
        # the column and the rows in one commit; thereafter it's a
        # normal evolved upsert exercising the flag's no-op path. Same
        # model/ctx transitions as evolve_append, so rollback/CDF/check
        # invariants compose identically.
        keys = rng.sample(sorted(set(model) | set(range(0, 400))),
                          rng.randrange(1, 10))
        rows = [(k, rng.randrange(1000)) for k in keys]
        S.snapshot_merge(
            spark, table, _df(spark, rows, True, ctx["tag_name"]),
            on=["id"], n_files_new=rng.choice([1, 2]), merge_schema=True,
        )
        ctx["evolved"] = True
        model.update(rows)
    elif op == "race_upsert":
        # two threads MERGE THE SAME KEYS with different values, racing
        # the commit CAS for real. Serializable isolation (the loser
        # replans on the winner's snapshot) means the final state holds
        # exactly ONE writer's values for the whole key set — a mixed
        # per-key outcome is a torn state the content check below would
        # catch. Under fault injection a racer may die on an injected
        # 503 BEFORE committing; the model then follows whoever landed.
        import threading

        keys = rng.sample(sorted(set(model) | set(range(0, 400))),
                          rng.randrange(2, 8))
        vals = {"A": rng.randrange(1000), "B": rng.randrange(1000)}
        landed: dict[str, int] = {}
        fails: list[Exception] = []
        gate = threading.Barrier(2)

        def _race(tag):
            rows = [(k, vals[tag]) for k in keys]
            src = _df(spark, rows, ctx["evolved"], ctx["tag_name"])
            gate.wait()
            try:
                r = S.snapshot_merge(spark, table, src, on=["id"],
                                     max_retries=20)
                landed[tag] = r["version"]
            except Exception as e:
                fails.append(e)

        ts = [threading.Thread(target=_race, args=(t,)) for t in ("A", "B")]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for e in fails:
            if "injected 503" not in str(e):
                raise e
        if landed:
            winner = max(landed, key=landed.get)
            model.update({k: vals[winner] for k in keys})
    elif op == "catalog_swap":
        # catalog plane interleaved with table mutations (round 12):
        # pin the table's CURRENT version in a catalog CAS swap; later
        # steps verify the pinned read still serves exactly the model
        # recorded AT THE SWAP, whatever the table does afterwards
        from e02_spark.ops import catalog as C

        import os as _os

        cat = _os.path.join(ctx["tmp"], "cat")
        if not C.catalog_versions(cat):
            C.catalog_create(cat)  # idempotent under a faulted create:
            # the dir may exist with no v1 — versions() stays empty
        C.catalog_set(cat, {"tbl": (table, None)})
        ctx["cat_pin"] = S.snapshot_versions(table)[-1]
        ctx["cat_pin_model"] = dict(model)
    elif op == "catalog_expire":
        from e02_spark.ops import catalog as C

        import os as _os

        cat = _os.path.join(ctx["tmp"], "cat")
        if ctx.get("cat_pin") is not None:
            r = C.catalog_expire(cat, keep_last=rng.choice([1, 2]))
            assert C.catalog_versions(cat) == r["kept"]
            # retention never moves the resolve: latest pins survive
            assert C.catalog_resolve(cat)["tbl"][1] == ctx["cat_pin"]
    elif op == "widen_amt":
        if ctx["amt_type"] == "long":
            with pytest.raises(ValueError, match="already"):
                S.snapshot_widen_column(table, "amt", "long")
        elif ctx["check"]:
            # the CHECK references amt: conservative refusal by name
            with pytest.raises(ValueError, match="CHECK"):
                S.snapshot_widen_column(table, "amt", "long")
        else:
            S.snapshot_widen_column(table, "amt", "long")
            ctx["amt_type"] = "long"
    v = S.snapshot_versions(table)[-1]
    ctx["versions"].append(v)
    ctx["history"][v] = (
        dict(model), ctx["evolved"], ctx["check"],
        ctx["tag_name"], ctx["amt_type"],
    )
    return op


@pytest.mark.parametrize("seed", [11, 23, 47, 91])
def test_snapshot_mutation_fuzz(spark, tmp_path, seed, table_store):
    # table_store parametrizes the run over BOTH metadata stores (POSIX
    # local + fake object store): the same op sequence must converge to
    # the same model under S3 semantics (no links, conditional puts)
    rng = random.Random(seed)
    table = str(tmp_path / "tbl")
    init = [(k, rng.randrange(1000)) for k in range(0, 120, 2)]
    # a hidden-partition spec rides along: appends inherit it, rewrites
    # (merge/binpack/compact) RE-DERIVE the hidden columns on the files
    # they rewrite (_pt_materialize) — content must stay exact through
    # every composition regardless
    # bloom filters ride the whole fuzz too (round 11): every rewrite
    # path must re-harvest them and no composition may turn a bloom
    # "maybe" into a lost row — the content equality below would catch
    # a false negative introduced by any op interaction
    S.snapshot_write(_df(spark, init), table, mode="overwrite",
                     n_files=3, cluster_by=["id"], stats_cols=["id"],
                     partition_spec=[("bucket", "id", 4)],
                     bloom_cols=["id"])
    model = dict(init)
    ctx = {"versions": [1],
           "history": {1: (dict(init), False, False, "tag", "integer")},
           "check": False, "tmp": str(tmp_path),
           "evolved": False, "tag_name": "tag", "tag_gen": 0,
           "amt_type": "integer"}
    trace = []
    for step in range(11):
        op = _apply_random_op(spark, rng, table, model, ctx)
        trace.append(op)
        got = _table_content(spark, table)
        assert got == model, f"seed={seed} step={step} trace={trace}"
        if ctx.get("cat_pin") is not None:
            # the cataloged pin is a frozen snapshot: whatever the ops
            # since the swap did, reading THROUGH the catalog serves
            # exactly the model recorded at the swap
            from e02_spark.ops import catalog as C

            got_pin = {
                r["id"]: r["amt"]
                for r in C.catalog_read(
                    spark, str(tmp_path / "cat"), "tbl"
                ).select("id", "amt").collect()
            }
            assert got_pin == ctx["cat_pin_model"], (
                f"catalog pin drift seed={seed} step={step} trace={trace}"
            )
        v_now = S.snapshot_versions(table)[-1]
        if S._read_manifest(table, v_now).get("eq_deletes"):
            # equality deletes outstanding: the metadata count MUST
            # refuse (a key may shadow zero or many rows)
            with pytest.raises(ValueError, match="EQUALITY deletes"):
                S.snapshot_rows(table)
        else:
            assert S.snapshot_rows(table) == len(model), (
                f"metadata count drift: seed={seed} step={step} trace={trace}"
            )
        if step % 3 == 0 and model:
            # hidden-partition point probe through whatever spec history
            # the evolutions have accumulated: row-complete at the key
            k = rng.choice(sorted(model))
            pr = S.snapshot_read(spark, table, partition_prune={"id": k})
            assert {
                r["amt"] for r in pr.where(f"id = {k}").select("amt").collect()
            } == {model[k]}, f"prune drift seed={seed} step={step} trace={trace}"
            # bloom point probe on the same live key: a false negative
            # smuggled in by ANY op composition would lose this row
            pb = S.snapshot_read(spark, table, prune=("id", k, k))
            assert {
                r["amt"] for r in pb.where(f"id = {k}").select("amt").collect()
            } == {model[k]}, f"bloom drift seed={seed} step={step} trace={trace}"
            # and a key the model PROVES absent returns nothing (bloom
            # pruning composes with DVs/eq-deletes, never resurrects)
            k_gone = next(
                (x for x in range(k, k + 9) if x not in model), None
            )
            if k_gone is not None:
                assert (
                    S.snapshot_read(spark, table, prune=("id", k_gone, k_gone))
                    .where(f"id = {k_gone}").count() == 0
                ), f"bloom ghost seed={seed} step={step} trace={trace}"
    # AS OF timestamp: two random historical versions re-read through
    # their clamped commit times must equal the recorded model (before
    # expire collects them)
    vt = dict(S._version_times(table))
    for v_h in rng.sample(sorted(ctx["history"]), min(2, len(ctx["history"]))):
        if S._resolve_as_of(table, vt[v_h]) != v_h:
            continue  # clamped-time tie: a later version shares the instant
        past = ctx["history"][v_h][0]
        got_h = {
            r["id"]: r["amt"]
            for r in S.snapshot_read(spark, table, as_of=vt[v_h])
            .select("id", "amt")
            .collect()
        }
        assert got_h == past, f"as_of drift seed={seed} v={v_h} trace={trace}"
    # CDF start->end balances with the model diff vs the initial state
    # (compared on the shared id/amt projection — evolution may have
    # widened the feed's schema along the way)
    last = ctx["versions"][-1]
    ch = (
        S.snapshot_changes(spark, table, 1, last)
        .select("id", "amt", "_change_type")
        .collect()
    )
    ins = {(r["id"], r["amt"]) for r in ch if r["_change_type"] == "insert"}
    dels = {(r["id"], r["amt"]) for r in ch if r["_change_type"] == "delete"}
    start, end = dict(init), model
    expect_ins = {(k, v) for k, v in end.items() if start.get(k) != v}
    expect_del = {(k, v) for k, v in start.items() if end.get(k) != v}
    # Compare NET of cancelled pairs: an upsert that rewrites the same
    # (id, amt) across the evolution boundary legitimately surfaces as a
    # delete+insert differing only in the added column (NULL -> value) —
    # identical on this projection, so the pair cancels out of both
    # sides. expect_ins/expect_del are disjoint by construction, so the
    # net comparison loses nothing there.
    assert ins - dels == expect_ins - expect_del, f"seed={seed} trace={trace}"
    assert dels - ins == expect_del - expect_ins, f"seed={seed} trace={trace}"
    # GC never changes the surviving snapshot
    S.snapshot_expire(table, keep_last=1, clean_orphans=True)
    assert _table_content(spark, table) == model


# --------------------------------------------------------------------------
# Object-store FAILURE INJECTION (round 11): the conditional-PUT commit
# protocol must never publish a manifest referencing unreadable objects,
# and a failed primitive must leave the table exactly where it was.
#
# Fault model (what S3-class stores actually do):
#   * torn multipart PUT / request failure -> the object is ABSENT and
#     the client sees an exception (multipart uploads are invisible
#     until CompleteMultipartUpload; there are no partial objects).
#     Injected as a raise BEFORE the primitive applies.
#   * 503 SlowDown on any call -> same shape: exception, not applied.
#   * delayed LIST visibility -> a reader's list omits the newest
#     commit; it must resolve the PREVIOUS snapshot (normal snapshot
#     isolation), never an error or a torn view. (S3/GCS LIST has been
#     strongly consistent since 2020 — injected anyway to prove readers
#     don't depend on it.)
# NOT modeled: the ambiguous outcome where the service applied the
# conditional put but the RESPONSE was lost — recovering that needs a
# read-back-and-compare the protocol does not implement (a keyed commit
# replay no-ops; an unkeyed one would duplicate, like every system
# without idempotency keys).
# --------------------------------------------------------------------------


class _FaultyObjectStore:
    """FakeObjectStore wrapper injecting seeded pre-application
    failures on the WRITE primitives (put/conditional-put/adopt) —
    the calls the commit protocol's atomicity rests on. Read-path 503s
    are deliberately NOT injected: a real SDK retries them internally,
    and a read faulted AFTER an op's commit landed only recreates the
    ambiguous-response case scoped out above (client doesn't learn the
    outcome; the table is still consistent). `armed` gates injection so
    the fuzz's own verification reads run clean."""

    def __init__(self, rng, p):
        from e02_spark.ops.store import FakeObjectStore

        self._inner = FakeObjectStore()
        self.rng, self.p = rng, p
        self.armed = False
        self.faults = 0

    def _maybe_fail(self, what):
        if self.armed and self.rng.random() < self.p:
            self.faults += 1
            raise OSError(f"injected 503: {what}")

    def __getattr__(self, name):
        target = getattr(self._inner, name)
        if name in ("put_json", "put_json_if_absent", "adopt_file"):
            def wrapped(*a, _t=target, _n=name, **kw):
                self._maybe_fail(_n)
                return _t(*a, **kw)

            return wrapped
        return target


@pytest.mark.parametrize("seed", [7, 19])
def test_snapshot_mutation_fuzz_with_fault_injection(spark, tmp_path, seed):
    """The mutation fuzz under injected object-store failures: every
    faulted op leaves content EXACTLY as it was (atomicity), every
    surviving manifest references only readable shards and files, and
    the run still converges to the model."""
    import os

    from e02_spark.ops.store import register_store, unregister_store

    rng = random.Random(seed)
    st = _FaultyObjectStore(random.Random(seed * 31 + 1), p=0.10)
    register_store(str(tmp_path), st)
    table = str(tmp_path / "tbl")
    try:
        init = [(k, rng.randrange(1000)) for k in range(0, 120, 2)]
        S.snapshot_write(_df(spark, init), table, mode="overwrite",
                         n_files=3, cluster_by=["id"], stats_cols=["id"],
                         partition_spec=[("bucket", "id", 4)])
        model = dict(init)
        ctx = {"versions": [1],
               "history": {1: (dict(init), False, False, "tag", "integer")},
               "tag_name": "tag", "tag_gen": 0, "amt_type": "integer",
               "check": False, "tmp": str(tmp_path), "evolved": False}
        trace = []
        faulted = 0
        for step in range(16):
            st.armed = True
            try:
                op = _apply_random_op(spark, rng, table, model, ctx)
                trace.append(op)
            except OSError as e:
                assert "injected 503" in str(e), e
                faulted += 1
                trace.append("FAULT")
            finally:
                st.armed = False
            got = _table_content(spark, table)
            assert got == model, f"seed={seed} step={step} trace={trace}"
            if ctx.get("cat_pin") is not None:
                from e02_spark.ops import catalog as C

                got_pin = {
                    r["id"]: r["amt"]
                    for r in C.catalog_read(
                        spark, os.path.join(str(tmp_path), "cat"), "tbl"
                    ).select("id", "amt").collect()
                }
                assert got_pin == ctx["cat_pin_model"], (
                    f"catalog pin drift seed={seed} step={step} "
                    f"trace={trace}"
                )
        assert faulted > 0, "injection never fired — raise p or steps"
        # no surviving manifest references an unreadable object
        for v in S.snapshot_versions(table):
            m = S._read_manifest(table, v)
            for r in (m["manifests"] + m.get("deletes", [])
                      + m.get("eq_deletes", [])):
                assert os.path.exists(os.path.join(table, r["path"])), (
                    f"v{v} references missing shard {r['path']}"
                )
            for key in ("manifests", "deletes", "eq_deletes"):
                for e in S._all_entries(table, m, key):
                    assert os.path.exists(
                        os.path.join(table, e["path"])
                    ), f"v{v} references missing file {e['path']}"
        # GC with injection disarmed still lands on the model
        S.snapshot_expire(table, keep_last=1, clean_orphans=True)
        assert _table_content(spark, table) == model
    finally:
        unregister_store(str(tmp_path))


def test_reader_tolerates_delayed_list_visibility(spark, tmp_path):
    """A reader whose LIST lags the newest commit resolves the PREVIOUS
    snapshot — consistent, never an error, never a torn view (the
    protocol never needs list-after-put of its own commit)."""
    from e02_spark.ops.store import (
        FakeObjectStore,
        register_store,
        unregister_store,
    )

    class LaggedListStore(FakeObjectStore):
        def __init__(self):
            super().__init__()
            self.hide: set[str] = set()

        def list_glob(self, pattern):
            return [
                p for p in super().list_glob(pattern)
                if p not in self.hide
            ]

    st = LaggedListStore()
    register_store(str(tmp_path), st)
    table = str(tmp_path / "tbl")
    try:
        S.snapshot_write(
            spark.range(50).selectExpr("id", "'a' AS tag", "id AS amt"),
            table, mode="overwrite", n_files=1,
        )
        S.snapshot_write(
            spark.range(50, 80).selectExpr("id", "'b' AS tag", "id AS amt"),
            table, mode="append", n_files=1,
        )
        # the newest commit hasn't "appeared" in this reader's LIST yet
        st.hide = {S._manifest_path(table, 2)}
        assert S.snapshot_versions(table) == [1]
        got = {r["id"] for r in S.snapshot_read(spark, table).collect()}
        assert got == set(range(50))  # the previous consistent snapshot
        st.hide = set()
        assert S.snapshot_read(spark, table).count() == 80
    finally:
        unregister_store(str(tmp_path))
