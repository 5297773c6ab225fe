"""Connected components, salted join, and coverage-batch-3 plumbing."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMALL


# --------------------------------------------------------------------------
# connected_components
# --------------------------------------------------------------------------
def _cc_reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find oracle."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_cc_chain_and_islands(spark):
    from e02_spark.ops.graph import connected_components

    # chain 1-2-3-4-5 (diameter 4, needs >1 iteration), island 10-11,
    # self-contained triangle 20-21-22
    edges = [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (22, 20)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {
        (r.node, r.cluster_id)
        for r in connected_components(df).collect()
    }
    want = {(n, c) for n, c in _cc_reference(edges).items()}
    assert got == want
    assert (1, 1) in got and (5, 1) in got and (11, 10) in got and (22, 20) in got


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_cc_matches_union_find(spark, edges):
    from e02_spark.ops.graph import connected_components

    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {(r.node, r.cluster_id) for r in connected_components(df).collect()}
    want = {(n, c) for n, c in _cc_reference(edges).items()}
    assert got == want


def test_cc_max_iter_caps_rounds(spark):
    from e02_spark.ops.graph import connected_components

    # a long chain with max_iter=1: labels would only propagate one hop —
    # returning that silently-split labeling was the round-5 review
    # finding, so the budget exhaustion must now raise instead of
    # returning wrong clusters (proves the loop is bounded AND safe).
    import pytest as _pytest

    edges = [(i, i + 1) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)
    full = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert set(full.values()) == {1}


# --------------------------------------------------------------------------
# salted_join
# --------------------------------------------------------------------------
def test_salted_join_equals_plain(spark):
    from e02_spark.io import load_table
    from e02_spark.ops.skew import salted_join

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_partkey", "l_quantity", "l_linenumber", "l_orderkey"
    )
    p = load_table(spark, SF_SMALL, "part").select(
        "p_partkey", "p_brand"
    ).withColumnRenamed("p_partkey", "l_partkey")

    plain = li.join(p, "l_partkey").orderBy(
        "l_orderkey", "l_linenumber"
    ).collect()
    salted = salted_join(li, p, on=["l_partkey"], n_salts=8).orderBy(
        "l_orderkey", "l_linenumber"
    ).collect()
    assert salted == plain
    assert len(plain) > 0


def test_salted_join_left_preserves_unmatched(spark):
    from e02_spark.ops.skew import salted_join

    big = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k INT, v STRING")
    small = spark.createDataFrame([(1, "X")], "k INT, w STRING")
    rows = {
        (r.k, r.w)
        for r in salted_join(big, small, on=["k"], how="left").collect()
    }
    assert rows == {(1, "X"), (2, None), (3, None)}
    with pytest.raises(ValueError):
        salted_join(big, small, on=["k"], how="full")


# --------------------------------------------------------------------------
# CSV + ORC round-trips (source/sink matrix)
# --------------------------------------------------------------------------
def test_csv_and_orc_roundtrip_exact(spark, tmp_path):
    from e02_spark.io import load_table

    sup = load_table(spark, SF_SMALL, "supplier")
    want = sorted(map(tuple, sup.collect()))

    csv_dir = str(tmp_path / "sup_csv")
    sup.write.mode("overwrite").option("header", True).csv(csv_dir)
    back_csv = spark.read.schema(sup.schema).option("header", True).csv(csv_dir)
    assert sorted(map(tuple, back_csv.collect())) == want  # doubles bit-exact

    orc_dir = str(tmp_path / "sup_orc")
    sup.write.mode("overwrite").orc(orc_dir)
    back_orc = spark.read.orc(orc_dir)
    assert sorted(map(tuple, back_orc.collect())) == want
    assert back_orc.schema == sup.schema


# --------------------------------------------------------------------------
# q62 sanity: representatives are cluster minima; planted dups cluster
# --------------------------------------------------------------------------
def test_q62_keep_flags_are_cluster_minima(spark):
    from e02_spark.queries.relational3 import q62_dedup_clusters

    rows = q62_dedup_clusters(spark, SF_SMALL).collect()
    assert rows, "expected at least one near-dup cluster in documents"
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m.doc_id for m in members)
        keeps = [m for m in members if m.keep]
        assert len(keeps) == 1 and keeps[0].doc_id == cid
        assert all(m.cluster_size == len(members) for m in members)


# --------------------------------------------------------------------------
# q72: native recursive CTE == iterative DataFrame fixpoint
# --------------------------------------------------------------------------
def test_recursive_cte_matches_iterative_fixpoint(spark):
    from pyspark.sql import functions as F

    from e02_spark import fixtures
    from e02_spark.depgraph.scanner import flatten_fixpoint
    from e02_spark.queries.depgraph_q import q72_recursive_closure

    files = fixtures.spark_df(spark, "sql_files")
    want = {
        (r.func_name, r.def_path, ",".join(r.files))
        for r in flatten_fixpoint(files).collect()
    }
    got = {
        (r.func_name, r.def_path, r.files)
        for r in q72_recursive_closure(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# robustness: PERMISSIVE JSON parsing quarantines corrupt rows, job survives
# --------------------------------------------------------------------------
def test_permissive_json_quarantines_corrupt_rows(spark):
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [('{"k": 1}',), ('{"k": 2}',), ("{not json",), ("",), (None,)],
        "props STRING",
    )
    parsed = raw.select(
        F.from_json(
            "props",
            "k BIGINT, _corrupt_record STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j"),
        "props",
    ).select("props", "j.k", F.col("j._corrupt_record").alias("bad"))
    rows = parsed.collect()
    ok = {r.k for r in rows if r.k is not None}
    bad = {r.props for r in rows if r.bad is not None}
    assert ok == {1, 2}
    assert "{not json" in bad  # quarantined, not a job failure


# --------------------------------------------------------------------------
# ops/quality: planted violations are counted exactly, in one pass
# --------------------------------------------------------------------------
def test_quality_expectations_count_planted_violations(spark):
    from pyspark.sql import functions as F

    from e02_spark.ops.quality import expect, expect_unique

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (1, 99.0)],
        "k INT, v DOUBLE",
    )
    got = {
        (r.rule, r.violations)
        for r in expect(df, [
            ("v_positive", F.col("v") > 0),        # -5.0 and NULL violate
            ("v_not_null", F.col("v").isNotNull()), # NULL violates
            ("k_small", F.col("k") < 100),          # none violate
        ]).collect()
    }
    assert got == {("v_positive", 2), ("v_not_null", 1), ("k_small", 0)}

    uniq = expect_unique(df, ["k"], "k_unique").collect()[0]
    assert (uniq.rule, uniq.violations) == ("k_unique", 2)  # both k=1 rows

    clean = expect_unique(df.where("k > 1"), ["k"], "k_unique").collect()[0]
    assert clean.violations == 0


def test_cc_star_matches_union_find_on_random_graphs(spark):
    """Large-star/small-star variant agrees with the union-find oracle on
    a batch of seeded random graphs."""
    import random

    from e02_spark.ops.graph import connected_components_star

    for seed in range(4):
        rng = random.Random(seed)
        edges = [
            (rng.randint(0, 40), rng.randint(0, 40)) for _ in range(50)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
        got = {
            (r.node, r.cluster_id)
            for r in connected_components_star(df).collect()
        }
        want = {(n, c) for n, c in _cc_reference(edges).items()}
        assert got == want, f"seed {seed}"


def test_cc_star_converges_on_long_path_beyond_propagation_budget(spark):
    """A 120-node path has diameter 119: min-label propagation needs 119
    rounds (far beyond max_iter=25), while the star algorithm contracts it
    within its O(log^2 n) budget — the scale case the variant exists for."""
    from e02_spark.ops.graph import connected_components_star

    n = 120
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {
        (r.node, r.cluster_id)
        for r in connected_components_star(df, max_iter=25).collect()
    }
    assert got == {(i, 0) for i in range(n)}


def test_cc_star_tree_counterexample(spark):
    """Regression: edges (3,5),(1,5),(3,4),(2,4) form ONE component
    (3 bridges the 5- and 4-side), but after one star round the
    child->parent set is {(3,1),(3,2),(5,1),(4,2)} — children and parents
    are disjoint, so the old 'no node both child and parent' fixed-point
    test terminated there, and the min() label fold split the component
    into {1,3,5} and {2,4}. The fix additionally requires every child to
    have exactly one distinct parent."""
    from e02_spark.ops.graph import connected_components_star

    edges = [(3, 5), (1, 5), (3, 4), (2, 4)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {
        (r.node, r.cluster_id)
        for r in connected_components_star(df).collect()
    }
    assert got == {(n, 1) for n in (1, 2, 3, 4, 5)}


def test_cc_star_random_trees_interleaved_ids(spark):
    """Star variant vs union-find oracle on random TREES (the shape the
    round-3 fixed-point test got wrong) with interleaved node ids, plus a
    multi-tree forest. Trees are the adversarial case: no redundant edges,
    so a premature termination always loses connectivity."""
    import random

    from e02_spark.ops.graph import connected_components_star

    for seed in range(6):
        rng = random.Random(1000 + seed)
        n = rng.randint(8, 40)
        ids = list(range(n * 3))
        rng.shuffle(ids)
        ids = ids[:n]  # interleaved, non-contiguous node ids
        edges = []
        for i in range(1, n):
            j = rng.randrange(i)  # attach node i under a random earlier node
            edges.append((ids[i], ids[j]))
        # second disjoint tree to keep the forest case honest
        base = max(ids) + 1
        edges += [(base + i, base + rng.randrange(i)) for i in range(1, 6)]
        df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
        got = {
            (r.node, r.cluster_id)
            for r in connected_components_star(df).collect()
        }
        want = {(k, v) for k, v in _cc_reference(edges).items()}
        assert got == want, f"seed {seed}"


def test_seeded_sign_lsh_duckdb_parity_and_mixing(spark):
    """Random-hyperplane sign-LSH: bit-identical between engines, and the
    buckets actually mix coordinates (differ from the axis-aligned form
    on vectors crafted to fool axis-aligned planes)."""
    import duckdb

    from e02_spark.io import load_table
    from e02_spark.ops.similarity import (
        duck_sign_lsh_seeded_sql,
        sign_lsh_bucket,
        sign_lsh_bucket_seeded,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").limit(64)
    got = {
        (r.vec_id, r.bkt)
        for r in emb.select(
            "vec_id",
            sign_lsh_bucket_seeded("embedding", bits=4, seed=7).alias("bkt"),
        ).collect()
    }
    con = duckdb.connect()
    sql = (
        f"SELECT vec_id, {duck_sign_lsh_seeded_sql('embedding', bits=4, seed=7)} AS bkt "
        f"FROM (SELECT * FROM read_parquet('{SF_SMALL}/embeddings.parquet') "
        f"ORDER BY vec_id LIMIT 64)"
    )
    want = {(r[0], r[1]) for r in con.execute(sql).fetchall()}
    assert got == want

    # adversarial: all vectors positive in the first `bits` coordinates —
    # axis-aligned buckets collapse to one bucket; seeded planes separate
    import pyspark.sql.functions as F

    adv = spark.createDataFrame(
        [(i, [1.0] * 8 + [float((-1) ** (i + j)) for j in range(56)]) for i in range(16)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    axis = adv.select(
        sign_lsh_bucket("embedding", bits=8).alias("b")
    ).distinct().count()
    seeded = adv.select(
        sign_lsh_bucket_seeded("embedding", bits=8, seed=7).alias("b")
    ).distinct().count()
    assert axis == 1  # every vector in the same axis-aligned bucket
    assert seeded > 1  # random hyperplanes separate them


def test_xml_roundtrip_escapes_special_chars(spark, tmp_path):
    """The XML roundtrip (q107) must survive markup-hostile values:
    angle brackets, ampersands, quotes, and non-ASCII text round-trip
    byte-identically through write->read."""
    rows = [
        (1, "a<b&c>d", 10, 1.5),
        (2, 'quote"and\'apos', 11, -2.25),
        (3, "ünïcødé — дата", 12, 0.0),
        (4, "  leading and trailing  ", 13, 9999.99),
    ]
    df = spark.createDataFrame(
        rows, "s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT, s_acctbal DOUBLE"
    )
    path = str(tmp_path / "xml_special")
    df.write.format("xml").option("rowTag", "supplier").mode("overwrite").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema(
            "s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT, s_acctbal DOUBLE"
        )
        .load(path)
    )
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(rows)
    # XML readers strip surrounding whitespace of text nodes by default —
    # assert everything else is exact and the trimmed value matches
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[2] == w[2] and g[3] == w[3]
        assert g[1] == w[1] or g[1] == w[1].strip(), (g, w)


def test_pagerank_int_hand_computed_and_parallelism_invariant(spark):
    """q108's integer PageRank against hand-computed values on a star
    graph (a-b, a-c): after one round the hub holds exactly 1_850_000
    micro-units and each leaf 575_000; regular graphs stay at exactly
    1_000_000 forever. Scores are bit-identical across shuffle
    parallelism (pure integer arithmetic — the property that makes the
    iterative algorithm hash-checkable at all)."""
    from e02_spark.ops.graph import pagerank_int

    star = spark.createDataFrame([(1, 2), (1, 3)], "da BIGINT, db BIGINT")
    one = {
        r["node"]: r["score"]
        for r in pagerank_int(star, iters=1).collect()
    }
    assert one == {1: 1_850_000, 2: 575_000, 3: 575_000}

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "da BIGINT, db BIGINT"
    )
    five = {
        r["node"]: r["score"] for r in pagerank_int(tri, iters=5).collect()
    }
    assert five == {1: 1_000_000, 2: 1_000_000, 3: 1_000_000}

    from e02_spark.io import load_table
    from e02_spark.ops.dedup import minhash_lsh_pairs

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")

    edges = minhash_lsh_pairs(docs, k=4, bands=2, threshold=0.8).select(
        "da", "db"
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = sorted(map(tuple, pagerank_int(edges, iters=3).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "23")
        b = sorted(map(tuple, pagerank_int(edges, iters=3).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b and a


# --------------------------------------------------------------------------
# q111 bounded per-key sequence state (round-8 task): one hot user with
# 50k events must (a) produce exactly the ground-truth regex counts and
# (b) have its struct-collect state split across many (user, segment)
# groups — the multi-GB-lifetime-array hazard the two-level build removes.
# --------------------------------------------------------------------------
def test_q111_hot_key_bounded_segments_exact(spark):
    import re

    from pyspark.sql import functions as F

    from e02_spark.queries.relational3 import (
        _Q111_PATTERNS,
        _q111_user_sequences,
    )

    n = 50_000
    # one bot user, events every 7 s across ~4 days, deterministic codes
    ev = spark.range(n).select(
        F.lit("bot-1").alias("user_id"),
        F.timestamp_micros((F.col("id") * 7_000_000) + 1_000_000).alias("ts"),
        F.format_string("e%07d", F.col("id")).alias("event_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in
                      ["view", "view", "purchase", "error", "error",
                       "signup", "view", "error", "click", "view"]]),
            (F.col("id") % 10 + 1).cast("int"),
        ).alias("event_type"),
    )
    seqs = _q111_user_sequences(ev, seg_us=3_600_000_000)
    rows = seqs.collect()
    assert len(rows) == 1
    got = rows[0]["seq"]
    truth = "".join(
        ["v", "v", "p", "e", "e", "s", "v", "e", "c", "v"][i % 10]
        for i in range(n)
    )
    assert got == truth  # two-level build == exact (ts, event_id) order
    for _, pat in _Q111_PATTERNS:
        assert len(re.findall(pat, got)) == len(re.findall(pat, truth))

    # the struct state is split across one group per hour, not one
    # lifetime group: 50k events * 7s ≈ 97 hours of segments
    seg = (F.unix_micros("ts") - F.pmod(F.unix_micros("ts"),
                                        F.lit(3_600_000_000))) / F.lit(3_600_000_000)
    n_groups = (
        ev.select(seg.cast("bigint").alias("seg"))
        .distinct()
        .count()
    )
    assert n_groups > 90  # bounded: ~517 events max per segment group
    per_seg_max = (
        ev.groupBy(seg.cast("bigint").alias("seg")).count()
        .agg(F.max("count")).first()[0]
    )
    assert per_seg_max < 600
