"""Similarity-search operator tests on the synthetic embeddings table."""

import pytest
from pyspark.sql import functions as F

from kamu_engine_flink_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_cosine_topk_exact(embeddings):
    queries = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    result = similarity.cosine_topk(embeddings, queries, k=5)
    rows = result.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, neighbors in by_q.items():
        neighbors.sort(key=lambda r: r.rank)
        # rank 1 must be the query itself (cosine 1.0)
        assert neighbors[0].vec_id == qid
        assert neighbors[0].cosine == pytest.approx(1.0, abs=1e-4)
        # scores non-increasing
        scores = [r.cosine for r in neighbors]
        assert scores == sorted(scores, reverse=True)


def test_lsh_topk_recall(embeddings):
    """LSH with multiprobe should recover most of the exact top-5."""
    queries = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(embeddings, queries, k=5)
    approx = similarity.hyperplane_lsh_topk(embeddings, queries, k=5, dim=64, bits=8)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # self-match always lands in the same bucket
    assert all((q, q) in approx_set for q in range(10))


def test_ivf_topk_recall(embeddings):
    """IVF with nprobe=3/nlist=8 recovers most of the exact top-5; a
    query's own vector always lands in its probed (nearest) cluster."""
    queries = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(embeddings, queries, k=5)
    approx = similarity.ivf_topk(embeddings, queries, k=5, nlist=8, nprobe=3)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    assert all((q, q) in approx_set for q in range(10))


def test_portable_lsh_self_match_rank1(spark):
    from kamu_engine_flink_spark.operators.similarity import lsh_topk_portable

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    got = lsh_topk_portable(e, q, k=3, bits=12, dim=64).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        best = min(rows, key=lambda r: r["rank"])
        # the query itself is in the corpus and shares its own bucket
        assert best["vec_id"] == qid and abs(best["cosine"] - 1.0) < 1e-6


def test_portable_ivf_matches_exact_on_probed_lists(spark):
    from kamu_engine_flink_spark.operators.similarity import ivf_topk_portable

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    got = ivf_topk_portable(e, q, k=3, nlist=8, nprobe=8).collect()
    # nprobe == nlist probes everything -> results equal exact top-k by
    # quantized cosine; spot-check self-match at rank 1.
    for qid in range(5):
        rows = sorted([r for r in got if r["query_id"] == qid], key=lambda r: r["rank"])
        assert rows and rows[0]["vec_id"] == qid


def test_pq_topk_recall(embeddings):
    """PQ/ADC with 8x16 codebooks recovers most of the exact top-5, and a
    query's own vector (distance-0 codes) ranks in its candidates."""
    queries = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(embeddings, queries, k=5)
    approx = similarity.pq_topk(embeddings, queries, k=5, m=8, ksub=16)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, f"PQ recall too low: {recall}"


def test_pq_portable_self_match_rank1(spark):
    """Portable PQ: a query's own corpus row shares every code, so its
    ADC distance equals the self-table distance — rank 1 with the
    smaller-id tie-break guarantees the self row tops its own list."""
    from kamu_engine_flink_spark.operators.similarity import pq_topk_portable

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_topk_portable(e, q, k=3, m=8, ksub=16, dim=64).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.approx_d2))
    for qid, rows in by_q.items():
        rows.sort()
        # self row carries the minimal possible ADC distance for qid
        self_d2 = [d for _, vid, d in rows if vid == qid]
        assert self_d2, f"query {qid} missing its own row in top-3"
        assert rows[0][2] == min(d for _, _, d in rows)


def test_lsh_incremental_index_equals_one_shot(spark, tmp_path):
    """The incremental LSH index law: batches bucketed separately and
    appended (with a persist/reload between them — the ingest contract)
    answer queries EXACTLY like the one-shot build, because the md5
    hyperplanes are data-independent."""
    from kamu_engine_flink_spark.operators import similarity as S

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cut = e.count() // 2
    idx = S.lsh_index_incremental(e.filter(F.col("vec_id") < cut))
    p1 = str(tmp_path / "idx1")
    idx.write.mode("overwrite").parquet(p1)
    idx = S.lsh_index_incremental(
        e.filter(F.col("vec_id") >= cut), spark.read.parquet(p1)
    )
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    inc = S.lsh_topk_from_index(idx, q, k=5)
    one = S.lsh_topk_portable(e, q, k=5)
    inc_rows = sorted(map(tuple, inc.collect()))
    one_rows = sorted(map(tuple, one.collect()))
    assert inc_rows == one_rows and len(inc_rows) > 0


def test_ivf_incremental_index_equals_one_shot(spark, tmp_path):
    """The frozen-centroid IVF ingest law: with id-ordered batches whose
    first batch holds >= nlist rows, the incremental index answers
    queries exactly like the one-shot build (the global nlist smallest
    ids all arrive in batch 1, so the centroid sets coincide)."""
    from kamu_engine_flink_spark.operators import similarity as S

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cut = e.count() // 2
    idx = S.ivf_index_incremental(e.filter(F.col("vec_id") < cut), nlist=16)
    p1 = str(tmp_path / "idx1")
    idx.write.mode("overwrite").parquet(p1)
    idx = S.ivf_index_incremental(
        e.filter(F.col("vec_id") >= cut), spark.read.parquet(p1), nlist=16
    )
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    inc = S.ivf_topk_from_index(idx, q, k=5, nlist=16, nprobe=4)
    one = S.ivf_topk_portable(e, q, k=5, nlist=16, nprobe=4)
    inc_rows = sorted(map(tuple, inc.collect()))
    one_rows = sorted(map(tuple, one.collect()))
    assert inc_rows == one_rows and len(inc_rows) > 0


def test_pq_incremental_index_equals_one_shot(spark, tmp_path):
    """The frozen-codebook PQ ingest law: with id-ordered batches whose
    first batch holds >= ksub rows, the incremental (codes, codebook)
    index answers ADC queries exactly like the one-shot build."""
    from kamu_engine_flink_spark.operators import similarity as S

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cut = e.count() // 2
    codes, book = S.pq_index_incremental(
        e.filter(F.col("vec_id") < cut), m=8, ksub=16, dim=64
    )
    cp, bp = str(tmp_path / "codes1"), str(tmp_path / "book")
    codes.write.mode("overwrite").parquet(cp)
    book.write.mode("overwrite").parquet(bp)
    codes, book = S.pq_index_incremental(
        e.filter(F.col("vec_id") >= cut),
        (spark.read.parquet(cp), spark.read.parquet(bp)),
        m=8, ksub=16, dim=64,
    )
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    inc = S.pq_topk_from_index((codes, book), q, k=5, m=8, dim=64)
    one = S.pq_topk_portable(e, q, k=5, m=8, ksub=16, dim=64)
    inc_rows = sorted(map(tuple, inc.collect()))
    one_rows = sorted(map(tuple, one.collect()))
    assert inc_rows == one_rows and len(inc_rows) > 0
