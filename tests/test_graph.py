"""Connected components (operators/graph.py): the pairs->clusters closure
for corpus dedup. The chain fixture forces multiple propagation rounds
(diameter > 1); the driver-query oracle (dedup_clusters_ngram) checks the
same algorithm against a DuckDB recursive CTE on real data."""

from pyspark.sql import functions as F

from kamu_engine_flink_spark.operators.graph import connected_components, dedup_clusters


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id: long")


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "id_a: long, id_b: long")


def test_chain_converges_to_min_label(spark):
    # 1-2-3-4 chain (diameter 3: needs >1 round), 5 isolated, 6-7 pair.
    nodes = _nodes(spark, [1, 2, 3, 4, 5, 6, 7])
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (6, 7)])
    got = {
        (r.id, r.component)
        for r in connected_components(nodes, edges, "id").collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 6), (7, 6)}


def test_dedup_clusters_sizes_and_representatives(spark):
    nodes = _nodes(spark, [10, 11, 12, 20, 30]).withColumnRenamed("id", "doc_id")
    edges = _edges(spark, [(10, 11), (11, 12)])
    rows = sorted(
        (r.doc_id, r.cluster_id, r.cluster_size, r.is_representative)
        for r in dedup_clusters(nodes, edges, "doc_id").collect()
    )
    assert rows == [
        (10, 10, 3, True),
        (11, 10, 3, False),
        (12, 10, 3, False),
        (20, 20, 1, True),
        (30, 30, 1, True),
    ]
