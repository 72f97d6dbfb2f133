"""Connected components — turning near-duplicate PAIRS into duplicate
CLUSTERS.

Every pair-producing dedup operator in this engine (operators/dedup.py:
MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine) emits edges
(id_a, id_b). Corpus dedup needs the transitive closure: if A~B and B~C,
then {A,B,C} is one cluster and one representative survives. The
reference engine has nothing like this (its surface is per-row SQL); it
is a first-class training-pipeline operator here.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round, every node takes the min label in its
neighborhood (both edge directions); stop when no label changes. Rounds
= graph diameter, and near-dup graphs are unions of small quasi-cliques
(diameter 2-4), so 3-5 rounds cover real corpora. Each round is one
shuffle on the node id — the driver loop only orchestrates; all data
movement is distributed joins, no collect() of nodes or edges. The
convergence check is a count of changed labels (a cheap aggregate per
round). This is the standard Spark formulation (cf. GraphX/GraphFrames'
label-propagation CC); for adversarial long-chain graphs, swap in
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond") — same per-round plan shape, O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node with the minimum node id reachable through
    `edges` (undirected). Nodes absent from `edges` keep their own id —
    singleton clusters. Returns (id, component).

    `nodes` must contain every id referenced by `edges`."""
    # Undirected: propagate along both directions each round.
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionAll(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("u"), F.col(id_col).alias("component"))
    sym = sym.persist()
    try:
        for _ in range(max_iter):
            labels = labels.persist()
            # min label among self + neighbors (neighbor labels arrive by
            # joining each edge's far end to its current label).
            neighbor_min = (
                sym.join(labels.withColumnRenamed("u", "v"), "v")
                .groupBy("u")
                .agg(F.min("component").alias("n_component"))
            )
            new_labels = (
                labels.join(neighbor_min, "u", "left")
                .select(
                    "u",
                    F.least(
                        F.col("component"), F.coalesce("n_component", "component")
                    ).alias("component"),
                )
            )
            new_labels = new_labels.persist()
            changed = (
                new_labels.join(labels.withColumnRenamed("component", "old"), "u")
                .filter(F.col("component") != F.col("old"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select(F.col("u").alias(id_col), "component")
    finally:
        sym.unpersist()


def dedup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Cluster view of a pairwise dedup result: (doc_id, cluster_id,
    cluster_size, is_representative). cluster_id is the min doc id in the
    cluster; the representative is that minimum — the row a
    keep-one-per-cluster pipeline retains."""
    cc = connected_components(nodes, pairs, id_col, src_col, dst_col)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col(id_col),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col(id_col) == F.col("component")).alias("is_representative"),
        )
    )
