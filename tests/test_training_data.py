"""Training-data pipeline operators (operators/training_data.py):
semantic dedup, shard shuffle, mixture sampling, curriculum bins, exact
shared-shingle signal. Synthetic cases pin the semantics (dups really
drop, shards really partition, budgets really hold); the documents/
embeddings-table paths are value-checked by the DuckDB oracle twins in
__spark_entry__.oracle_sql (tools/crosscheck.py)."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kamu_engine_flink_spark.operators import training_data as TD

_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _docs(spark):
    path = os.path.join(_SF_DIR, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"test data not found at {path} (set SPARK_GRAFT_SF_DIR)")
    return spark.read.parquet(path)


# --------------------------------------------------------------------------
# semantic_dedup
# --------------------------------------------------------------------------


def test_semantic_dedup_drops_exact_duplicate_embeddings(spark):
    """An identical embedding (cosine exactly 1.0) must always be pruned
    to the smallest id, whatever cluster it lands in."""
    v1 = [0.5] * 8 + [0.0] * 56
    v2 = [-0.3] * 8 + [0.1] * 56
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=v1),
            Row(vec_id=2, embedding=v2),
            Row(vec_id=7, embedding=v1),  # dup of 1
            Row(vec_id=9, embedding=v1),  # dup of 1
        ]
    )
    out = {r.vec_id: r for r in TD.semantic_dedup(df, tau=0.99).collect()}
    assert out[1].is_kept and out[1].dup_of is None
    assert not out[7].is_kept and out[7].dup_of == 1
    assert not out[9].is_kept and out[9].dup_of == 1
    assert out[2].is_kept


def test_semantic_dedup_keeps_all_when_tau_above_max_cosine(spark):
    v = [0.1 * i for i in range(64)]
    w = [0.1 * (63 - i) for i in range(64)]
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=v), Row(vec_id=2, embedding=w)]
    )
    out = TD.semantic_dedup(df, tau=1.1)
    assert out.filter("is_kept").count() == 2


# --------------------------------------------------------------------------
# shard_assign
# --------------------------------------------------------------------------


def test_shard_assign_partitions_and_positions(spark):
    docs = _docs(spark)
    out = TD.shard_assign(docs, num_shards=8)
    assert out.count() == docs.count()
    # every shard in range, positions are exactly 0..n_i-1 per shard
    stats = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("shard_pos").alias("lo"),
            F.max("shard_pos").alias("hi"),
        )
        .collect()
    )
    assert {r.shard for r in stats} <= set(range(8))
    for r in stats:
        assert r.lo == 0 and r.hi == r.n - 1


def test_shard_assign_deterministic_and_salt_sensitive(spark):
    docs = _docs(spark).limit(100)
    a = {(r.doc_id): (r.shard, r.shard_pos) for r in TD.shard_assign(docs).collect()}
    b = {(r.doc_id): (r.shard, r.shard_pos) for r in TD.shard_assign(docs).collect()}
    assert a == b
    c = {
        (r.doc_id): (r.shard, r.shard_pos)
        for r in TD.shard_assign(docs, salt="epoch-2").collect()
    }
    assert a != c  # a new salt is a fresh epoch-level reshuffle


# --------------------------------------------------------------------------
# mixture_sample
# --------------------------------------------------------------------------


def test_mixture_sample_budget_and_targets(spark):
    docs = _docs(spark)
    out = TD.mixture_sample(docs, alpha=0.5, budget=200)
    rows = out.collect()
    # flooring loses at most one doc per domain
    n_domains = docs.select("source").distinct().count()
    assert 200 - n_domains <= len(rows) <= 200
    # per-domain kept count == its target (kept ranks are 1..target)
    per = (
        out.groupBy("source", "domain_target")
        .agg(F.count(F.lit(1)).alias("n"), F.max("picked_rank").alias("mx"))
        .collect()
    )
    for r in per:
        assert r.n == r.domain_target == r.mx


def test_mixture_sample_alpha_zero_is_uniform(spark):
    """alpha=0 gives every domain the same target regardless of size."""
    df = spark.createDataFrame(
        [Row(doc_id=i, source="big" if i < 90 else "small") for i in range(100)]
    )
    out = TD.mixture_sample(df, alpha=0.0, budget=50)
    targets = {r.source: r.domain_target for r in out.select("source", "domain_target").distinct().collect()}
    assert targets["big"] == targets["small"] == 25


# --------------------------------------------------------------------------
# curriculum_bins
# --------------------------------------------------------------------------


def test_curriculum_bins_equal_sizes_and_monotonic(spark):
    docs = _docs(spark)
    rows = sorted(TD.curriculum_bins(docs, n_bins=5).collect(), key=lambda r: r.bin)
    assert [r.bin for r in rows] == [1, 2, 3, 4, 5]
    n = docs.count()
    assert all(abs(r.n_docs - n / 5) <= 1 for r in rows)
    # bins are ascending, non-overlapping score ranges
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_quality <= hi.min_quality
        assert lo.min_quality <= lo.avg_quality <= lo.max_quality


# --------------------------------------------------------------------------
# random_projection
# --------------------------------------------------------------------------


def test_random_projection_matches_hashlib_replication(spark):
    """Bit-exact agreement with an independent hashlib/python replication
    of the quantize + integer-plane-dot contract."""
    import hashlib

    emb_path = os.path.join(_SF_DIR, "embeddings.parquet")
    if not os.path.exists(emb_path):
        pytest.skip(f"test data not found at {emb_path}")
    emb = spark.read.parquet(emb_path).limit(20)
    got = {r.vec_id: list(r.proj) for r in TD.random_projection(emb, out_dim=4).collect()}

    def plane(i, j):
        h = hashlib.md5(f"rp-{i}-{j}".encode()).hexdigest()
        return (int(h[:8], 16) % 2001) - 1000

    import math

    for r in emb.collect():
        q = [
            int(math.floor(abs(float(x)) * 1e6 + 0.5)) * (1 if x >= 0 else -1)
            for x in r.embedding
        ]
        expected = [sum(plane(i, j) * q[j] for j in range(64)) for i in range(4)]
        assert got[r.vec_id] == expected


def test_random_projection_distance_estimator_unbiased(spark):
    """JL sanity: E[||proj(a)-proj(b)||^2] = k * var_plane * ||a-b||^2,
    so the mean normalized ratio over many pairs must sit near 1 (its
    spread is dominated by the shared k=16 planes: std ~ sqrt(2/k) ~
    0.35 — the bound reflects that, not the pair count). Unit-norm
    embeddings concentrate pairwise distances, so rank correlation is
    NOT expected at small k; unbiasedness is the scale-relevant
    property (coarse blocking, not exact ranking)."""
    np = pytest.importorskip("numpy")
    emb_path = os.path.join(_SF_DIR, "embeddings.parquet")
    if not os.path.exists(emb_path):
        pytest.skip(f"test data not found at {emb_path}")
    emb = spark.read.parquet(emb_path).limit(60)
    k = 16
    proj = {r.vec_id: np.array(r.proj, dtype=float) for r in TD.random_projection(emb, out_dim=k).collect()}
    orig = {r.vec_id: np.array(r.embedding, dtype=float) for r in emb.collect()}
    ids = sorted(orig)
    var_plane = (2001.0**2 - 1) / 12.0
    scale = 1e6**2  # quantization factor squared
    ratios = []
    for a in ids[:20]:
        for b in ids[20:40]:
            d2 = ((orig[a] - orig[b]) ** 2).sum()
            p2 = ((proj[a] - proj[b]) ** 2).sum()
            ratios.append(p2 / (k * var_plane * scale * d2))
    mean = float(np.mean(ratios))
    assert 0.5 < mean < 1.7, mean


# --------------------------------------------------------------------------
# duplicate_ngram_docs
# --------------------------------------------------------------------------


def test_duplicate_ngram_docs_flags_shared_phrases(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"intro words here then {shared}"),
            Row(doc_id=2, text=f"{shared} and a different ending clause"),
            Row(doc_id=3, text="completely unrelated text with unique content words only"),
            Row(doc_id=4, text="too short"),  # < 5 tokens: excluded
        ]
    )
    out = {r.doc_id: r for r in TD.duplicate_ngram_docs(df, n=5).collect()}
    assert set(out) == {1, 2, 3}
    # the 9-token shared phrase contributes 5 shared 5-gram shingles
    assert out[1].dup_shingles == 5 and out[2].dup_shingles == 5
    assert out[3].dup_shingles == 0 and out[3].dup_shingle_frac == 0.0
    assert 0 < out[1].dup_shingle_frac < 1


def test_duplicate_ngram_docs_distinct_shingles_within_doc(spark):
    """Repeats of a shingle INSIDE one doc don't make it 'duplicated' —
    document frequency counts distinct docs."""
    phrase = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=f"{phrase} {phrase}"), Row(doc_id=2, text="x y z w v u")]
    )
    out = {r.doc_id: r for r in TD.duplicate_ngram_docs(df, n=5).collect()}
    assert out[1].dup_shingles == 0
