"""Incremental view maintenance (ops/ivm.py): maintained aggregate state
== full recompute, under inserts, deletes, NULL keys, NULL measures,
group extinction, and sum extinction."""

from __future__ import annotations

import pyspark.sql.functions as F

from e02_spark.ops.ivm import apply_agg_delta, finish_agg, materialize_agg

SUMS = {"amt_sum": "amt"}


def _rows(spark, data):
    return spark.createDataFrame(data, "k STRING, amt DOUBLE")


def _norm(df):
    return sorted(
        (
            (r["k"], r["n_rows"], r["amt_sum"])
            for r in finish_agg(df, ["k"], SUMS).collect()
        ),
        key=lambda t: (t[0] is None, t[0] or ""),
    )


def test_ivm_matches_recompute_basic(spark):
    base = _rows(spark, [("a", 1.0), ("a", 2.0), ("b", 5.0), ("c", 7.0)])
    state = materialize_agg(base, ["k"], SUMS)
    ch = (
        _rows(spark, [("a", 10.0), ("d", 4.0)])
        .withColumn("_change_type", F.lit("insert"))
        .unionByName(
            _rows(spark, [("b", 5.0), ("c", 7.0)])
            .withColumn("_change_type", F.lit("delete"))
        )
    )
    new_state = apply_agg_delta(state, ch, ["k"], SUMS)
    # recompute: base + inserts - deletes = a:{1,2,10}, d:{4}; b,c extinct
    expect = _rows(spark, [("a", 1.0), ("a", 2.0), ("a", 10.0), ("d", 4.0)])
    assert _norm(new_state) == _norm(materialize_agg(expect, ["k"], SUMS))
    assert _norm(new_state) == [("a", 3, 13.0), ("d", 1, 4.0)]


def test_ivm_null_keys_and_null_measures(spark):
    """NULL keys group together (null-safe join), and a group whose last
    non-null measure is deleted reverts its sum to NULL while the group
    itself survives on remaining all-NULL rows."""
    base = _rows(spark, [(None, 3.0), (None, None), ("x", None), ("x", 1.0)])
    state = materialize_agg(base, ["k"], SUMS)
    ch = (
        _rows(spark, [(None, 3.0), ("x", 1.0)])
        .withColumn("_change_type", F.lit("delete"))
        .unionByName(
            _rows(spark, [(None, None)])
            .withColumn("_change_type", F.lit("insert"))
        )
    )
    new_state = apply_agg_delta(state, ch, ["k"], SUMS)
    expect = _rows(spark, [(None, None), (None, None), ("x", None)])
    assert _norm(new_state) == _norm(materialize_agg(expect, ["k"], SUMS))
    got = {r[0]: (r[1], r[2]) for r in _norm(new_state)}
    assert got[None] == (2, None) and got["x"] == (1, None)


def test_ivm_sum_zero_vs_sum_extinct_stay_distinct(spark):
    """A sum that cancels to exactly 0.0 with live non-null values must
    stay 0.0, not NULL — and further deltas keep the distinction."""
    base = _rows(spark, [("z", 5.0), ("z", -5.0), ("w", 9.0)])
    state = materialize_agg(base, ["k"], SUMS)
    ch1 = _rows(spark, [("w", 9.0)]).withColumn("_change_type", F.lit("delete")) \
        .unionByName(_rows(spark, [("w", None)]).withColumn("_change_type", F.lit("insert")))
    s1 = apply_agg_delta(state, ch1, ["k"], SUMS)
    got = {r[0]: (r[1], r[2]) for r in _norm(s1)}
    assert got["z"] == (2, 0.0)  # cancelled but live -> 0.0
    assert got["w"] == (1, None)  # extinct measure -> NULL
    # second delta on top of the maintained state: resurrection of w's sum
    ch2 = _rows(spark, [("w", 2.5)]).withColumn("_change_type", F.lit("insert"))
    s2 = apply_agg_delta(s1, ch2, ["k"], SUMS)
    got2 = {r[0]: (r[1], r[2]) for r in _norm(s2)}
    assert got2["w"] == (2, 2.5)


def test_ivm_chain_over_snapshot_cdf(spark, tmp_path):
    """End to end over the snapshot table: maintain an aggregate through
    two MERGE commits using only snapshot_changes deltas; equals the
    recompute over the final snapshot."""
    import os

    from e02_spark.ops import snapshot as S

    table = str(tmp_path / "tbl")
    base = spark.range(100).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS k", "CAST(id AS DOUBLE) AS amt"
    )
    v1 = S.snapshot_write(base, table, mode="overwrite", n_files=4,
                          cluster_by=["id"], stats_cols=["id"])
    state = materialize_agg(
        S.snapshot_read(spark, table, version=v1), ["k"], SUMS
    ).persist()
    state.count()
    # merge 1: MoR delete of id % 10 == 0
    S.snapshot_merge(spark, table, spark.range(0, 100, 10).selectExpr("id"),
                     on=["id"], when_matched="delete",
                     insert_not_matched=False, strategy="mor")
    # merge 2: CoW upsert rewriting ids 50..59 and inserting 200..204
    upd = spark.range(50, 60).selectExpr(
        "id", "'U' AS k", "CAST(-1.0 AS DOUBLE) AS amt")
    ins = spark.range(200, 205).selectExpr(
        "id", "'new' AS k", "CAST(id AS DOUBLE) AS amt")
    v3 = S.snapshot_merge(spark, table, upd.unionByName(ins), on=["id"])["version"]
    ch = S.snapshot_changes(spark, table, v1, v3).drop("id")
    new_state = apply_agg_delta(state, ch, ["k"], SUMS)
    recompute = materialize_agg(S.snapshot_read(spark, table), ["k"], SUMS)
    assert _norm(new_state) == _norm(recompute)
    state.unpersist()


def test_ivm_state_schema_stable_across_applications(spark):
    """The state's column types must not drift as deltas fold in — sums
    are normalized to one fixed decimal type, so the state can be
    persisted and re-applied indefinitely with a stable schema."""
    base = _rows(spark, [("a", 1.0)])
    state = materialize_agg(base, ["k"], SUMS)
    schema0 = state.schema
    for i in range(3):
        ch = _rows(spark, [("a", float(i))]).withColumn(
            "_change_type", F.lit("insert")
        )
        state = apply_agg_delta(state, ch, ["k"], SUMS)
        assert state.schema == schema0, (i, state.schema, schema0)
    got = finish_agg(state, ["k"], SUMS).collect()[0]
    assert (got["n_rows"], got["amt_sum"]) == (4, 4.0)


def test_ivm_random_delta_sequences_match_recompute(spark):
    """Property: ANY sequence of model-consistent deltas (inserts of new
    rows, deletes of existing rows — an update is its pair) folded into
    the state equals the recompute over the final multiset."""
    import random

    for seed in (7, 19, 53):
        rng = random.Random(seed)
        keys = ["a", "b", "c", None]
        model = [
            (rng.choice(keys),
             None if rng.random() < 0.2 else float(rng.randrange(-50, 50)))
            for _ in range(rng.randrange(3, 12))
        ]
        state = materialize_agg(_rows(spark, model), ["k"], SUMS)
        for _step in range(3):
            dels = rng.sample(model, rng.randrange(0, len(model) + 1))
            ins = [
                (rng.choice(keys),
                 None if rng.random() < 0.2 else float(rng.randrange(-50, 50)))
                for _ in range(rng.randrange(0, 6))
            ]
            for d in dels:
                model.remove(d)
            model.extend(ins)
            parts = []
            if ins:
                parts.append(_rows(spark, ins).withColumn(
                    "_change_type", F.lit("insert")))
            if dels:
                parts.append(_rows(spark, dels).withColumn(
                    "_change_type", F.lit("delete")))
            if not parts:
                continue
            ch = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
            state = apply_agg_delta(state, ch, ["k"], SUMS)
            if not model:
                assert state.count() == 0, seed
                continue
            assert _norm(state) == _norm(
                materialize_agg(_rows(spark, model), ["k"], SUMS)
            ), (seed, _step, model)


MINMAX = {"amt": "amt"}


def _norm_mm(state, spark=None):
    return sorted(
        (
            (r["k"], r["n_rows"], r["amt_sum"], r["min_amt"], r["max_amt"])
            for r in finish_agg(
                state, ["k"], SUMS, minmax=MINMAX
            ).collect()
        ),
        key=lambda t: (t[0] is None, t[0] or ""),
    )


def test_ivm_minmax_insert_only_folds_monotonically(spark):
    base = _rows(spark, [("a", 5.0), ("a", 9.0), ("b", 1.0)])
    state = materialize_agg(base, ["k"], SUMS, minmax=MINMAX)
    ch = _rows(spark, [("a", 2.0), ("b", 7.0), ("c", 4.0)]).withColumn(
        "_change_type", F.lit("insert")
    )
    new = apply_agg_delta(
        state, ch, ["k"], SUMS, minmax=MINMAX, base=_rows(spark, [])
    )
    # insert-only delta: no group is dirty, the empty base is never needed
    assert _norm_mm(new) == [
        ("a", 3, 16.0, 2.0, 9.0),
        ("b", 2, 8.0, 1.0, 7.0),
        ("c", 1, 4.0, 4.0, 4.0),
    ]


def test_ivm_minmax_recomputes_on_retracted_extreme(spark):
    rows = [("a", 1.0), ("a", 5.0), ("a", 9.0), ("b", 3.0), ("b", 4.0)]
    state = materialize_agg(_rows(spark, rows), ["k"], SUMS, minmax=MINMAX)
    # delete a's max AND b's non-extreme-touching middle... b's 3.0 IS
    # its min, so b is dirty too; the post-delta base answers both
    dels = [("a", 9.0), ("b", 3.0)]
    for d in dels:
        rows.remove(d)
    ch = _rows(spark, dels).withColumn("_change_type", F.lit("delete"))
    new = apply_agg_delta(
        state, ch, ["k"], SUMS, minmax=MINMAX, base=_rows(spark, rows)
    )
    assert _norm_mm(new) == [
        ("a", 2, 6.0, 1.0, 5.0),
        ("b", 1, 4.0, 4.0, 4.0),
    ]


def test_ivm_minmax_nonextreme_delete_skips_recompute(spark):
    """A delete strictly inside the (min, max) interval keeps the stored
    extremes WITHOUT touching the base — pinned by handing apply a base
    that would give wrong answers if consulted."""
    rows = [("a", 1.0), ("a", 5.0), ("a", 9.0)]
    state = materialize_agg(_rows(spark, rows), ["k"], SUMS, minmax=MINMAX)
    ch = _rows(spark, [("a", 5.0)]).withColumn(
        "_change_type", F.lit("delete")
    )
    poison = _rows(spark, [("a", -999.0), ("a", 999.0)])
    new = apply_agg_delta(
        state, ch, ["k"], SUMS, minmax=MINMAX, base=poison
    )
    assert _norm_mm(new) == [("a", 2, 10.0, 1.0, 9.0)]


def test_ivm_minmax_equal_extreme_retracts_conservatively(spark):
    """Deleting ONE of two equal maxima must recompute (multiplicity is
    unknowable from the state) and land on the surviving equal value."""
    rows = [("a", 4.0), ("a", 9.0), ("a", 9.0)]
    state = materialize_agg(_rows(spark, rows), ["k"], SUMS, minmax=MINMAX)
    rows.remove(("a", 9.0))
    ch = _rows(spark, [("a", 9.0)]).withColumn(
        "_change_type", F.lit("delete")
    )
    new = apply_agg_delta(
        state, ch, ["k"], SUMS, minmax=MINMAX, base=_rows(spark, rows)
    )
    assert _norm_mm(new) == [("a", 2, 13.0, 4.0, 9.0)]


def test_ivm_minmax_random_deltas_match_recompute(spark):
    """Property: min/max maintained through random model-consistent delta
    sequences (recompute-on-retract against the post-delta base) equals
    the full recompute, including NULL measures and NULL keys."""
    import random

    for seed in (13, 37):
        rng = random.Random(seed)
        keyspace = ["a", "b", None]
        model = [
            (rng.choice(keyspace),
             None if rng.random() < 0.25 else float(rng.randrange(-30, 30)))
            for _ in range(rng.randrange(4, 10))
        ]
        state = materialize_agg(
            _rows(spark, model), ["k"], SUMS, minmax=MINMAX
        )
        for _step in range(3):
            dels = rng.sample(model, rng.randrange(0, len(model)))
            ins = [
                (rng.choice(keyspace),
                 None if rng.random() < 0.25
                 else float(rng.randrange(-30, 30)))
                for _ in range(rng.randrange(0, 5))
            ]
            for d in dels:
                model.remove(d)
            model.extend(ins)
            parts = []
            if ins:
                parts.append(_rows(spark, ins).withColumn(
                    "_change_type", F.lit("insert")))
            if dels:
                parts.append(_rows(spark, dels).withColumn(
                    "_change_type", F.lit("delete")))
            if not parts:
                continue
            ch = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
            base = _rows(spark, model) if model else _rows(spark, [])
            state = apply_agg_delta(
                state, ch, ["k"], SUMS, minmax=MINMAX, base=base
            )
            if not model:
                assert state.count() == 0, seed
                continue
            want = materialize_agg(
                _rows(spark, model), ["k"], SUMS, minmax=MINMAX
            )
            assert _norm_mm(state) == _norm_mm(want), (seed, _step)
