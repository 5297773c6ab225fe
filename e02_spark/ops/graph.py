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
            .localCheckpoint(eager=True)
        )
        changed = merged.where("chg").count()
        labels = merged.select("node", "label")
        if changed == 0:
            break

    return labels.select("node", F.col("label").alias("cluster_id"))
