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


def test_lsh_hot_band_join_is_skew_split(spark):
    """The LSH band-bucket self-join (ops/dedup.py::_candidate_intersections,
    the `a.join(b, ["band_idx", "band_key"])` at dedup.py:71-76) is the one
    join in the engine whose key distribution is ADVERSARY-CONTROLLED at
    100 TB: a template-heavy crawl can put half the corpus into one band
    bucket. This pins the mitigation: with AQE skew-join on (session
    default), a hot band key holding ~50% of docs gets its shuffle
    partition SPLIT at runtime (skew=true in the final adaptive plan)
    instead of serializing the whole hot bucket through one task.

    Thresholds are lowered to make the KB-scale synthetic corpus register
    as skewed; production uses the defaults (256 MB / 5x median). If AQE
    ever cannot split (e.g. a future change forces a non-SMJ strategy),
    the fallback is salting the band key (ops/skew.py patterns) — see the
    dedup.py candidate-join comment.
    """
    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.coalescePartitions.enabled",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        # force the shuffled-join path (the at-scale strategy for an
        # unbounded banded table) and make tiny partitions count as skewed
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # shuffle blocks are lz4-compressed and the hot key is a constant
        # string, so the hot partition is only a few KB on disk — thresholds
        # go very low to make it register (production keeps the defaults)
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        from pyspark.sql import functions as F

        n_docs, hot_share = 3000, 0.5
        # same (doc_id, band_idx, band_key) shape `banded` has in
        # _candidate_intersections; band_key padded so hot-partition bytes
        # clear the lowered skew threshold
        banded = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.lit(0).alias("band_idx"),
            F.when(
                F.col("id") < int(n_docs * hot_share), F.lit("HOT" + "x" * 40)
            )
            .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 97).cast("string")))
            .alias("band_key"),
        )
        a = banded.select(F.col("doc_id").alias("da"), "band_idx", "band_key")
        b = banded.select(F.col("doc_id").alias("db"), "band_idx", "band_key")
        candidates = (
            a.join(b, ["band_idx", "band_key"])
            .where(F.col("da") < F.col("db"))
            .select("da", "db")
        )
        n_hot = int(n_docs * hot_share)
        expected = n_hot * (n_hot - 1) // 2
        for k in range(97):
            n_k = len([i for i in range(n_hot, n_docs) if i % 97 == k])
            expected += n_k * (n_k - 1) // 2
        # execute THIS DataFrame's query execution (df.count() would build
        # a separate one and leave candidates' AQE plan unfinalized)
        counted = candidates.groupBy().count()
        assert counted.collect()[0][0] == expected  # join is still exact
        plan = counted._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_semantic_dedup_lsh_chaining_bounds_hot_cluster(spark):
    """SemDeDup's promised scale path: a cluster holding ~50% of the
    corpus must be handled by chained sign-LSH banding, not all-pairs.
    Pins (a) the candidate-pair bound — banded candidates << |c|^2 for
    the hot cluster; (b) exact-copy recall 1.0 (identical vectors share
    every band); (c) banded dups are a subset of the exact result; and
    (d) clusters below the threshold keep byte-identical exact output."""
    import random

    from e02_spark.ops.similarity import (
        _sign_bucket_q,
        semantic_dedup,
        with_quantized,
    )

    rng = random.Random(7)
    dim = 64

    def noisy(base, scale):
        return [b + rng.uniform(-scale, scale) for b in base]

    # centroids 0..7: centroid 0 along +e1, others spread
    base_hot = [1.0] + [0.0] * (dim - 1)
    rows = []
    for cid in range(8):
        v = [0.0] * dim
        if cid == 0:
            v = list(base_hot)
        else:
            v[cid * 7] = 1.0
            v[cid * 7 + 1] = -1.0
        rows.append((cid, [float(x) for x in v]))
    vid = 8
    hot_ids = []
    for _ in range(600):  # hot cluster: near centroid 0, noisy signs
        rows.append((vid, [float(x) for x in noisy(base_hot, 0.4)]))
        hot_ids.append(vid)
        vid += 1
    for _ in range(600):  # spread over the other centroids
        cid = rng.randrange(1, 8)
        v = [0.0] * dim
        v[cid * 7] = 1.0
        v[cid * 7 + 1] = -1.0
        rows.append((vid, [float(x) for x in noisy(v, 0.4)]))
        vid += 1
    # planted exact copies of 40 hot-cluster vectors (higher ids)
    by_id = dict(rows)
    planted = {}
    for src in hot_ids[:40]:
        rows.append((vid, list(by_id[src])))
        planted[vid] = src
        vid += 1

    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")

    banded = semantic_dedup(df, lsh_cluster_threshold=100)
    exact = semantic_dedup(df, lsh_cluster_threshold=10**9)
    b_rows = {r["vec_id"]: r for r in banded.collect()}
    e_rows = {r["vec_id"]: r for r in exact.collect()}

    # (b) exact copies always collapse: identical q -> identical buckets
    for copy, src in planted.items():
        assert b_rows[copy]["dup_of"] is not None, (copy, src)
        assert b_rows[copy]["dup_of"] <= src

    # (c) banding only ever DROPS candidate pairs -> dup set is a subset
    b_dups = {v for v, r in b_rows.items() if not r["kept"]}
    e_dups = {v for v, r in e_rows.items() if not r["kept"]}
    assert b_dups <= e_dups
    # and it still finds the planted mass (recall on this corpus)
    assert len(b_dups) >= len(planted)

    # (d) vectors outside the hot cluster are byte-identical to exact
    hot_cluster = {v for v, r in e_rows.items() if r["cluster_id"] == 0}
    assert len(hot_cluster) >= 600  # the skew really exists
    for v, r in e_rows.items():
        if v not in hot_cluster:
            assert tuple(b_rows[v]) == tuple(r)

    # (a) candidate-pair bound: sum over (band, bucket) of C(m,2) must be
    # far below C(|hot|, 2) — computed with the same banding the operator
    # uses
    qd = with_quantized(df).where(F.col("vec_id").isin([*hot_cluster]))
    total = 0
    for k in range(4):
        hist = (
            qd.select(_sign_bucket_q("q", k * 8, 8).alias("bkt"))
            .groupBy("bkt")
            .count()
            .collect()
        )
        total += sum(r["count"] * (r["count"] - 1) // 2 for r in hist)
    m = len(hot_cluster)
    assert total < 0.2 * m * (m - 1) // 2, (total, m)


def test_salted_band_join_matches_unsalted(spark):
    """The no-AQE skew fallback (salt_bands) must find EXACTLY the pairs
    the plain band join finds — salting changes the shuffle layout, never
    the candidate set. Runs with AQE skew-join disabled so the salting is
    the only skew defense in play."""
    from e02_spark.io import load_table
    from e02_spark.ops.dedup import minhash_lsh_pairs

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    old = spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        plain = {
            (r["da"], r["db"], round(r["jaccard"], 9))
            for r in minhash_lsh_pairs(d, k=4, bands=2, threshold=0.8).collect()
        }
        salted = {
            (r["da"], r["db"], round(r["jaccard"], 9))
            for r in minhash_lsh_pairs(
                d, k=4, bands=2, threshold=0.8, salt_bands=4
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", old)
    assert plain, "corpus has planted near-dups"
    assert salted == plain


_PII_FRAGMENTS = list("abz059 .-+():@_") + [
    "555-0123", "(555) 123-4567", "+1-555-123-4567", "5551234567",
    "a@b.co", "10.0.0.1", "2001:db8:85a3:0:0:8a2e:370:7334",
    "12:30:45", "1.2.3", "123-45-6789", "123-45-678",
]


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(_PII_FRAGMENTS), min_size=0, max_size=12
        ).map("".join),
        min_size=1,
        max_size=8,
    )
)
def test_pii_dialect_parity_fuzz(spark, texts):
    """Property: for ARBITRARY concatenations of PII-ish fragments,
    digits, separators and noise, Spark's Java regex and DuckDB's RE2
    agree match-for-match on every PII pattern — the invariant the q100
    oracle stands on. (Hypothesis assembles strings from fragments that
    deliberately collide with the patterns' edge shapes: partial phones,
    clock times, semver, compressed IPv6.)"""
    import duckdb

    from e02_spark.ops import quality

    con = duckdb.connect()
    df = spark.createDataFrame([(t,) for t in texts], "t STRING")
    for name, (pat, _tok) in quality.PII_PATTERNS.items():
        got_spark = [
            r[0]
            for r in df.select(F.regexp_count("t", F.lit(pat))).collect()
        ]
        got_duck = [
            con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [t, pat]
            ).fetchone()[0]
            for t in texts
        ]
        assert got_spark == got_duck, (name, texts, got_spark, got_duck)


def test_q110_hll_mode_within_10pct_and_no_expand(spark):
    """q110 profiler exact=False (the 100 TB mode): every per-column
    approx_count_distinct lands within 10% of the exact distinct count
    (HLL++ default rsd is 5% — 2x headroom, regeneration-stable), all
    non-distinct cells are IDENTICAL, and the plan property that makes
    it the scale mode holds: the exact multi-DISTINCT plans an Expand
    (row multiplication by #distinct-aggs), the HLL plan does NOT."""
    from tests.conftest import SF_SMALL

    from e02_spark.queries.curation_q import q110_profile_documents

    exact_df = q110_profile_documents(spark, SF_SMALL, exact=True)
    hll_df = q110_profile_documents(spark, SF_SMALL, exact=False)
    exact = {r["col"]: r.asDict() for r in exact_df.collect()}
    hll = {r["col"]: r.asDict() for r in hll_df.collect()}
    assert set(exact) == set(hll)
    for c, e in exact.items():
        h = hll[c]
        nd_e, nd_h = e["n_distinct"], h["n_distinct"]
        assert abs(nd_h - nd_e) <= max(1, 0.10 * nd_e), (c, nd_e, nd_h)
        for k in e:
            if k != "n_distinct":
                assert e[k] == h[k], (c, k)
    plan_exact = exact_df._jdf.queryExecution().executedPlan().toString()
    plan_hll = hll_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan_exact
    assert "Expand" not in plan_hll
