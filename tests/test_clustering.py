"""Distributed quantized k-means (operators/clustering.py): blob
recovery, bit-exact integer-arithmetic parity with an independent numpy
replication, deterministic ties, and empty-cluster dropout. The
registry twin (kmeans_clusters_embeddings) is value-checked against a
full two-round DuckDB SQL replay by tools/crosscheck.py."""

import os

import pytest
from pyspark.sql import Row

from kamu_engine_flink_spark.operators.clustering import kmeans_quantized

_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _blobs(spark):
    """Three well-separated 4-d blobs; seeds (ids 0..2) land one per
    blob so Lloyd must recover the generating partition."""
    centers = [(10.0, 0.0, 0.0, 0.0), (0.0, 10.0, 0.0, 0.0), (0.0, 0.0, 10.0, 0.0)]
    rows = []
    i = 0
    for b, c in enumerate(centers):
        for j in range(7):
            jitter = ((j % 3) - 1) * 0.25
            rows.append(
                Row(vec_id=i, embedding=[x + jitter for x in c], blob=b)
            )
            i += 1
    # interleave ids so seed ids 0,1,2 are NOT one per blob -> exercise
    # the update actually moving centroids
    rows.sort(key=lambda r: (r.vec_id % 7, r.vec_id))
    rows = [Row(vec_id=n, embedding=r.embedding, blob=r.blob) for n, r in enumerate(rows)]
    return spark.createDataFrame(rows)


def test_blob_recovery(spark):
    df = _blobs(spark)
    out = kmeans_quantized(df, k=3, iters=4)
    j = {r.vec_id: r.cluster for r in out.collect()}
    blobs = {r.vec_id: r.blob for r in df.collect()}
    # same-blob points share a cluster; different blobs never do
    by_blob = {}
    for vid, cl in j.items():
        by_blob.setdefault(blobs[vid], set()).add(cl)
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3


def test_matches_integer_numpy_replication(spark):
    """Bit-exact agreement with an independent numpy replication of the
    quantize -> assign -> floor-div update -> assign contract."""
    np = pytest.importorskip("numpy")
    path = os.path.join(_SF_DIR, "embeddings.parquet")
    if not os.path.exists(path):
        pytest.skip(f"test data not found at {path}")
    emb = spark.read.parquet(path)
    out = {r.vec_id: r.cluster for r in kmeans_quantized(emb, k=8, iters=2).collect()}

    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    Q = np.array(
        [[int(np.floor(abs(x) * 1000 + 0.5)) * (1 if x >= 0 else -1) for x in r.embedding] for r in rows],
        dtype=np.int64,
    )
    C = Q[:8].copy()
    cids = ids[:8].copy()
    for rnd in range(2):
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)  # ties: argmin picks first = smallest cid (sorted)
        if rnd == 1:
            break
        newC, newcids = [], []
        for j in range(len(cids)):
            members = Q[a == j]
            if len(members) == 0:
                continue
            s = members.sum(0, dtype=np.int64)
            n = len(members)
            newC.append((2 * s + n) // (2 * n))
            newcids.append(cids[j])
        C = np.array(newC)
        cids = np.array(newcids)
    expected = {int(i): int(cids[j]) for i, j in zip(ids, a)}
    assert out == expected


def test_deterministic_and_tie_break(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[1.0, 0.0]),  # duplicate of seed 0
            Row(vec_id=2, embedding=[0.0, 1.0]),
            Row(vec_id=3, embedding=[0.52, 0.52]),  # equidistant-ish probe
        ]
    )
    a = {r.vec_id: r.cluster for r in kmeans_quantized(df, k=3, iters=2).collect()}
    b = {r.vec_id: r.cluster for r in kmeans_quantized(df, k=3, iters=2).collect()}
    assert a == b
    # the duplicate of seed 0 ties between clusters 0 and 1 -> smaller id
    assert a[1] == 0


def test_empty_cluster_drops_out(spark):
    # seed 1 duplicates seed 0, so cluster 1 never gets members (ties go
    # to the smaller cid) and vanishes after the update round
    df = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0]),
            Row(vec_id=3, embedding=[0.0, 0.9]),
        ]
    )
    out = {r.vec_id: r.cluster for r in kmeans_quantized(df, k=3, iters=3).collect()}
    assert set(out.values()) == {0, 2}


def test_invalid_args(spark):
    df = spark.createDataFrame([Row(vec_id=0, embedding=[1.0])])
    with pytest.raises(ValueError):
        kmeans_quantized(df, k=0)
    with pytest.raises(ValueError):
        kmeans_quantized(df, iters=0)
