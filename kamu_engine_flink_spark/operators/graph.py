"""Connected components — turning near-duplicate PAIRS into duplicate
CLUSTERS.

Every pair-producing dedup operator in this engine (operators/dedup.py:
MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine) emits edges
(id_a, id_b). Corpus dedup needs the transitive closure: if A~B and B~C,
then {A,B,C} is one cluster and one representative survives. The
reference engine has nothing like this (its surface is per-row SQL); it
is a first-class training-pipeline operator here.

Algorithm: iterative min-label propagation with pointer jumping. Every
node starts labeled with itself; each round, every node takes the min
label in its neighborhood (both edge directions), then follows its
label's label (path halving). Neighbor propagation alone needs
diameter rounds; the jump halves label-chain length every round, giving
O(log diameter) rounds overall — the same asymptotics as
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond") with a simpler per-round plan: two keyed joins
and a min-aggregate, all distributed; the driver loop only orchestrates
and reads one scalar (changed-label count) per round for convergence.
Near-dup graphs are unions of small quasi-cliques, so real corpora
converge in 2-4 rounds; the log bound is the safety net for adversarial
chains.

Each round checkpoints the label table to truncate lineage: the pointer
jump references the round's candidate labels twice (a self-join), so
without truncation the logical plan doubles per round and the optimizer
dies on an exponential tree long before the data is big. Reliable
checkpoints are used when the session has a checkpoint dir configured
(cluster mode — survives executor loss); otherwise localCheckpoint
(executor-local, fine for single-node and tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize and cut the logical plan. Iterative self-referencing
    plans grow exponentially otherwise."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint()
    return df.localCheckpoint()


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
    # Materialize the caller's edge subtree ONCE before symmetrizing: the
    # union below references `edges` twice, and upstream pair producers
    # (LSH band self-joins over UDF-computed signatures) are expensive
    # subtrees that Spark does not de-duplicate across union branches —
    # without this, the first loop action runs the corpus pipeline 4x.
    eg = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v")).persist()
    eg.count()
    # Undirected: propagate along both directions each round.
    sym = eg.unionAll(
        eg.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    labels = _truncate_lineage(
        nodes.select(F.col(id_col).alias("u"), F.col(id_col).alias("component"))
    )
    sym = sym.persist()
    try:
        sym.count()  # cache the symmetric edge list before the rounds
        eg.unpersist()
        for _ in range(max_iter):
            # min label among self + neighbors (neighbor labels arrive by
            # joining each edge's far end to its current label).
            neighbor_min = (
                sym.join(labels.withColumnRenamed("u", "v"), "v")
                .groupBy("u")
                .agg(F.min("component").alias("n_component"))
            )
            # Thread the pre-round label through as `old` so convergence is
            # read from the checkpointed frame itself — no extra
            # join-and-count job per round.
            cand = labels.join(neighbor_min, "u", "left").select(
                "u",
                F.col("component").alias("old"),
                F.least(
                    F.col("component"), F.coalesce("n_component", "component")
                ).alias("component"),
            )
            # The self-join below reads cand twice; persist so the
            # join+aggregate above runs once, not twice.
            cand = cand.persist()
            # Pointer jump (path halving): follow the label's own label.
            # Labels are always node ids, so the self-join always hits.
            ptr = cand.select(
                F.col("u").alias("c_u"), F.col("component").alias("c_comp")
            )
            new_full = _truncate_lineage(
                cand.join(ptr, cand["component"] == ptr["c_u"], "left")
                .select(
                    cand["u"],
                    cand["old"],
                    F.least(
                        cand["component"],
                        F.coalesce(ptr["c_comp"], cand["component"]),
                    ).alias("component"),
                )
            )
            changed = new_full.filter(F.col("component") != F.col("old")).count()
            cand.unpersist()
            labels = new_full.select("u", "component")
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
