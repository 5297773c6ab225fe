"""Salted-aggregation equivalence tests + hypothesis property-based tests
for the dependency-graph closure (SURVEY.md §5.2 stretch goals)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from e02_spark.ops.skew import salted_agg, salted_collect_set

KDIR = "deployer/patch/DWH/kimball"


def test_salted_agg_equals_direct(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("k"),  # skewed-ish small key space
        (F.col("id") * 3 % 101).alias("v"),
    )
    direct = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            [("count", "v", "n"), ("sum", "v", "s"), ("min", "v", "mn"), ("max", "v", "mx")],
        ).collect()
    }
    assert salted == direct


def test_salted_collect_set_equals_direct(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 50).alias("v")
    )
    direct = {
        r["k"]: r["vs"]
        for r in df.groupBy("k").agg(F.sort_array(F.collect_set("v")).alias("vs")).collect()
    }
    salted = {
        r["k"]: r["vs"] for r in salted_collect_set(df, ["k"], "v", "vs").collect()
    }
    assert salted == direct


# --- property-based: random call graphs → closure invariants ---------------

_names = st.lists(
    st.sampled_from([f"f{i}" for i in range(6)]), min_size=1, max_size=6, unique=True
)
_edges = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)), min_size=0, max_size=10
)
_file_calls = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5)), min_size=0, max_size=8
)


def _build_corpus(funcs, edges, file_calls):
    """Random graph → fixture corpus rows: function defs that call other
    functions, plus plain files that call functions."""
    rows = []
    for i, name in enumerate(funcs):
        callees = [funcs[b] for a, b in edges if a == i and b < len(funcs) and b != i]
        body = "\n".join(f"RETURN KIMBALL.{c}(1)" for c in callees) or "RETURN 1"
        rows.append((f"{KDIR}/r_1.{i + 1:06d}_f_{name}.sql", body))
    for fi, target in file_calls:
        if target < len(funcs):
            rows.append(
                (f"replicator/source/file{fi}.sql", f"SELECT KIMBALL.{funcs[target]}(1)")
            )
    return rows


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(funcs=_names, edges=_edges, file_calls=_file_calls)
def test_closure_invariants(spark, funcs, edges, file_calls):
    from e02_spark.depgraph.scanner import flatten_fixpoint, flatten_one_hop

    rows = _build_corpus(funcs, edges, file_calls)
    # merge duplicate file paths (dict semantics of a filesystem)
    corpus = {}
    for p, c in rows:
        corpus[p] = corpus.get(p, "") + "\n" + c
    df = spark.createDataFrame(list(corpus.items()), schema="path STRING, content STRING")

    one_hop = {r["func_name"]: set(r["files"]) for r in flatten_one_hop(df).collect()}
    fix = {r["func_name"]: set(r["files"]) for r in flatten_fixpoint(df).collect()}

    assert set(one_hop) == set(fix)  # same function universe
    for fn in one_hop:
        # monotonicity: the fixpoint closure contains the one-hop closure
        assert one_hop[fn] <= fix[fn]
    # idempotence: running the fixpoint again changes nothing
    fix2 = {r["func_name"]: set(r["files"]) for r in flatten_fixpoint(df).collect()}
    assert fix == fix2
