"""Connected components (operators/graph.py): the pairs->clusters closure
for corpus dedup. The chain fixture forces multiple propagation rounds
(diameter > 1); the driver-query oracle (dedup_clusters_ngram) checks the
same algorithm against a DuckDB recursive CTE on real data."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kamu_engine_flink_spark.operators.graph import connected_components, dedup_clusters


def _union_find(n_nodes, edges):
    """Reference implementation: plain union-find, min id as root label."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes)}


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


def test_long_chain_converges_within_default_rounds(spark):
    """A 60-node path has diameter 59; plain neighbor propagation would
    need ~59 rounds, pointer jumping gets there in O(log) — must finish
    within the default max_iter."""
    n = 60
    nodes = _nodes(spark, range(n))
    edges = _edges(spark, [(i, i + 1) for i in range(n - 1)])
    got = {(r.id, r.component) for r in connected_components(nodes, edges, "id").collect()}
    assert got == {(i, 0) for i in range(n)}


@settings(max_examples=10, deadline=None)
@given(
    st.integers(min_value=1, max_value=24).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=n - 1),
                    st.integers(min_value=0, max_value=n - 1),
                ),
                max_size=30,
            ),
        )
    )
)
def test_matches_union_find_on_random_graphs(spark, case):
    n, raw_edges = case
    edges = [(a, b) for a, b in raw_edges if a != b]
    expected = _union_find(n, edges)
    got = {
        r.id: r.component
        for r in connected_components(
            _nodes(spark, range(n)), _edges(spark, edges or [(0, 0)]), "id"
        ).collect()
    }
    assert got == expected


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
