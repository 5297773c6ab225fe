"""Distributed connected components — the clustering step of near-dup
deduplication.

Near-dup pair detection (MinHash/SimHash/embedding LSH, ops/dedup.py) emits
an EDGE LIST of similar pairs; actually deduplicating a corpus requires
grouping those pairs into clusters and keeping one representative per
cluster. At 100 TB the edge list itself is distributed, so the clustering
must be too: this is iterative min-label propagation over DataFrames
(the reference system has no analog — its graphs are driver-side dicts,
`scan_dependencies.py:107-149` — but its one-hop flatten is the same
"propagate along edges" shape, generalized here to a fixpoint).

Algorithm: every node starts labeled with itself; each round every node
takes the min of its own label and its neighbors' labels; converges in
O(graph diameter) rounds. Near-dup clusters are small and dense (diameter
rarely > 3), so this beats the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond") in
practice while staying simple; for adversarial long-chain graphs the
star variant halves the diameter per round and would be the swap-in.

Scale notes:
- each round is one shuffle (join on edge endpoint) + one aggregation;
  edges are cached once and reused every round.
- `localCheckpoint` after each round truncates the lineage chain —
  without it, round N's plan contains all N-1 prior joins and Catalyst
  analysis time grows quadratically.
- convergence check is a count() on the changed-label set, i.e. one
  lightweight action per round, not a collect of labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node of an undirected graph with the smallest node id
    reachable from it (= cluster id). Returns (node, cluster_id).

    `edges` may list each undirected edge once in either direction;
    symmetrization happens here. Isolated nodes (no edges) are the
    caller's concern — they are their own cluster by definition.
    """
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # No distinct here: duplicate (a,b) rows cannot change a min()-fold,
    # and the dedup shuffle costs more than the duplicates do.
    sym = half.union(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # min label among each node's neighbors, merged with its own label
        # in the same job; `chg` rides along so convergence detection is a
        # cheap scan of the just-materialized checkpoint — no separate
        # old-vs-new shuffle join per round.
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # LAZY checkpoint + count: the convergence count's single linear
        # scan materializes (and persists) the checkpoint in the SAME
        # job — one scheduled job per round instead of two (eager
        # checkpoint + count), with identical results. Safe because the
        # count has exactly one leaf scan of `merged`, so no stage can
        # race another into duplicate partition computation.
        merged = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    "label", F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "chg"
                ),
            )
            .localCheckpoint(eager=False)
        )
        changed = merged.where("chg").count()
        labels = merged.select("node", "label")
        if changed == 0:
            break
    else:
        # Exhausting the budget without a fixed point means labels have
        # only propagated max_iter hops — returning them would silently
        # split every wider component into several clusters. Fail loudly;
        # callers with genuinely deep graphs should raise max_iter or use
        # connected_components_star (O(log^2 n) rounds).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "labels would be wrong for components wider than the budget"
        )

    return labels.select("node", F.col("label").alias("cluster_id"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond") — the swap-in for
    ADVERSARIAL graphs: min-label propagation needs O(diameter) rounds, so
    a path graph of length 10^6 needs 10^6 shuffles; the star algorithm
    contracts the graph toward each component's minimum in O(log^2 n)
    rounds regardless of diameter. Near-dup clusters are small and dense,
    so `connected_components` wins there (fewer, cheaper rounds); use this
    variant when cluster diameters are unbounded (web graphs, social
    graphs, long chain-of-revision dup chains).

    Per round (edges held in canonical orientation a > b):
      large-star: group the SYMMETRIC edge list by u; every strictly
        larger neighbor v > u re-attaches to m = min(N(u) ∪ {u}).
      small-star: group the canonical list by its larger endpoint u
        (all grouped neighbors are < u); every grouped neighbor and u
        itself re-attach to the minimum.
    Each step is one groupBy + one re-expand join — the same shuffle
    budget as a propagation round, but rounds are O(log^2 n) in n, not
    O(diameter). Terminates at the star-forest fixed point (no node
    appears as both child and parent), which the paper proves is the
    min-rooted component forest.

    Returns (node, cluster_id) — identical output contract (and, by the
    property test, identical results) to `connected_components`.
    """
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # canonical orientation: (larger, smaller), self-loops dropped
    e = (
        half.where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        half.select(F.col("a").alias("node"))
        .union(half.select(F.col("b").alias("node")))
        .distinct()
        # lazy: consumed exactly once, by the caller's final action (the
        # root fill-in join) — an eager job here bought nothing
        .localCheckpoint(eager=False)
    )

    for _ in range(max_iter):
        # large-star over the symmetric expansion
        sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        large = (
            sym.where(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star over the canonical (larger endpoint = group key) list
        mins_s = large.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        small = (
            large.join(mins_s, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(mins_s.select(F.col("a"), F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # Star-forest fixed point. Two conditions, BOTH required:
        #   (1) no node appears as both child (a) and parent (b), and
        #   (2) every child has exactly ONE distinct parent.
        # (1) alone is NOT sufficient: edges (3,5),(1,5),(3,4),(2,4)
        # reach {(3,1),(3,2),(5,1),(4,2)} after one round — child 3 has
        # two parents, yet children {3,4,5} and parents {1,2} are
        # disjoint. Terminating there and folding labels with min()
        # silently drops the 3-bridges-{1,2} link and splits one
        # component into two. Both operations preserve connectivity
        # (Kiveris et al., lemma 3.1), so a (1)+(2) edge set is a star
        # forest with one star per component — the true fixed point.
        # Both violation kinds are computed from ONE role-tagged explode
        # — a SINGLE leaf scan of `small` — so the convergence count's
        # job materializes the lazy checkpoint above and decides the
        # fixed point together: one scheduled job per round instead of
        # the former three (eager checkpoint + two-scan intersect
        # count), and the single-scan shape means no concurrent stages
        # can duplicate-compute the unpersisted checkpoint partitions.
        # Per node: child rows carry their parent, parent rows a NULL
        # (count_distinct skips NULLs), so `np` counts distinct parents
        # of a as a CHILD and both/multi-parent violations fall out of
        # one groupBy — identical semantics to the intersect form.
        roles = small.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("node"),
                        F.col("b").alias("parent"),
                        F.lit(True).alias("is_child"),
                    ),
                    F.struct(
                        F.col("b").alias("node"),
                        F.lit(None).cast(small.schema["b"].dataType).alias(
                            "parent"
                        ),
                        F.lit(False).alias("is_child"),
                    ),
                )
            ).alias("r")
        ).select("r.node", "r.parent", "r.is_child")
        violations = (
            roles.groupBy("node")
            .agg(
                F.count_distinct("parent").alias("np"),
                F.max("is_child").alias("child"),
                F.min("is_child").alias("not_parent"),
            )
            .where(
                (F.col("np") > 1)
                | (F.col("child") & ~F.col("not_parent"))
            )
        )
        done = violations.limit(1).count() == 0
        e = small
        if done:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds; the non-star-forest edge set would yield split "
            "components — raise max_iter (O(log^2 n) rounds suffice)"
        )

    labels = e.select(F.col("a").alias("node"), F.col("b").alias("label"))
    roots = all_nodes.join(
        labels.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("label"))
    out = labels.groupBy("node").agg(F.min("label").alias("label")).union(roots)
    return out.select("node", F.col("label").alias("cluster_id"))


def pagerank_int(
    edges: DataFrame, src: str = "da", dst: str = "db", iters: int = 5
) -> DataFrame:
    """Integer-exact damped PageRank over an undirected graph — the
    iterative-algorithm shape (fixed rounds, per-round localCheckpoint)
    made fully oracle-checkable: there is not a single floating-point
    operation anywhere.

    score_0(v) = 1_000_000 micro-units;
    score_{i+1}(v) = 150_000 + (85 * Σ_{u~v} (score_i(u) div deg(u))) div 100

    Both divisions are BIGINT integer division, so every engine computes
    bit-identical scores at any parallelism (integer addition is
    order-free; the classic double-precision PageRank diverges across
    summation orders). The truncation error vs the real-valued recursion
    is < deg(v) + 1 micro-units per round — ppm-scale, irrelevant for
    ranking. Symmetrized-distinct edges; every node of the pair graph
    has degree >= 1, so there are no dangling-node corrections.

    Scale: per round, one join edges⋈scores (shuffle on node id) and one
    aggregation — the textbook distributed PageRank cost; iters is fixed
    so lineage stays bounded via per-round localCheckpoint.
    Returns (node, deg, score) after `iters` rounds.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # eager checkpoint, not persist(): deg is scanned once per round plus
    # the final join — all inside the caller's single deferred action now
    # (see the lazy round checkpoints below), so it must be materialized
    # up front to avoid concurrent duplicate computation, and checkpoint
    # blocks are ContextCleaner-reclaimed on GC (a persist would need an
    # unpersist() that the fully-lazy return path can no longer order
    # after the action).
    deg = sym.groupBy("u").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=True)
    scores = deg.select(
        "u", F.lit(1_000_000).cast("bigint").alias("score")
    )
    for _ in range(iters):
        contrib = (
            sym.join(scores, "u")
            .join(deg, "u")
            .select("v", F.expr("score div deg").alias("c"))
        )
        # LAZY per-round checkpoints: each still truncates the Catalyst
        # plan (analysis stays O(1) per round — the reason the
        # checkpoint exists), but the rounds' RDDs now chain into the
        # caller's ONE final action instead of `iters` eagerly scheduled
        # jobs. Each round's RDD is consumed exactly once (the next
        # round's single contrib join), so laziness cannot duplicate
        # partition computation.
        scores = (
            contrib.groupBy("v")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("v").alias("u"),
                (F.lit(150_000) + F.expr("(85 * s) div 100"))
                .cast("bigint")
                .alias("score"),
            )
            .localCheckpoint(eager=False)
        )
    return scores.join(deg, "u").select(
        F.col("u").alias("node"), F.col("deg").cast("bigint").alias("deg"), "score"
    )
