"""Dedup operator tests on the driver's synthetic documents table plus
hand-built near-duplicate fixtures."""

import pytest
from pyspark.sql import functions as F

from kamu_engine_flink_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def near_dups(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the sun shines "
        "bright over the green valley and the river runs fast"
    )
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("fast", "slow")),  # near dup of 1
        (4, "completely different content about machine learning pipelines and spark engines running at scale"),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact(spark, docs):
    n = docs.count()
    result = dedup.dedup_exact(docs)
    uniq = docs.select("text").distinct().count()
    assert result.count() == uniq
    # duplicate counts add back up to the corpus size
    assert result.agg(F.sum("dup_count")).collect()[0][0] == n


def test_minhash_lsh_finds_near_dups(near_dups):
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(near_dups).collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs
    assert all(4 not in p for p in pairs)


def test_dedup_minhash_keeps_smallest_id(near_dups):
    kept = sorted(r.doc_id for r in dedup.dedup_minhash_lsh(near_dups, jaccard_threshold=0.5).collect())
    assert kept == [1, 4, 5]


def test_simhash_pairs(near_dups):
    pairs = {(r.id_a, r.id_b) for r in dedup.simhash_pairs(near_dups, max_hamming=3).collect()}
    assert (1, 2) in pairs  # identical text -> hamming 0
    assert all(4 not in p and 5 not in p for p in pairs)


def test_ngram_jaccard_pairs(near_dups):
    rows = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard_pairs(near_dups, threshold=0.5).collect()}
    assert rows[(1, 2)] == 1.0
    assert 0.5 <= rows[(1, 3)] < 1.0
    assert (1, 4) not in rows


def test_embedding_near_dup_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # near dup of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r.id_a, r.id_b) for r in dedup.embedding_near_dup_pairs(df, threshold=0.95).collect()}
    assert pairs == {(1, 2)}


def test_minhash_approximates_jaccard(near_dups):
    """MinHash band-collision implies high true Jaccard on this fixture:
    every LSH candidate must survive exact verification at 0.5."""
    cand = dedup.minhash_lsh_pairs(near_dups)
    exact = dedup.ngram_jaccard_pairs(near_dups, n=3, threshold=0.0)
    joined = cand.join(exact, ["id_a", "id_b"], "left")
    for r in joined.collect():
        assert r.jaccard is not None and r.jaccard > 0.3


def test_null_and_empty_text_robustness(spark):
    """Real corpora contain null/empty documents; every corpus operator
    must pass them through with defined semantics, never crash: nulls
    dedup with nulls (md5(null) = null groups), empty normalizes to the
    padded shingle (so null/empty are MinHash near-dups of each other),
    metrics go null for null text."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from kamu_engine_flink_spark.operators import dedup as D
    from kamu_engine_flink_spark.operators.text_analysis import (
        analyze_documents,
        repetition_signals,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    df = spark.createDataFrame([(1, None), (2, ""), (3, "hello world"), (4, None)], schema)

    exact = {r.doc_id: r.dup_count for r in D.dedup_exact(df).collect()}
    assert exact == {1: 2, 2: 1, 3: 1}  # nulls group together, empty is its own key

    kept = {r.doc_id for r in D.dedup_minhash_lsh(df).collect()}
    assert kept == {1, 3}  # null normalizes like empty -> near-dups, min id wins

    analyzed = {r.doc_id: r for r in analyze_documents(df).collect()}
    assert analyzed[1].token_count is None and analyzed[1].fingerprint is None
    assert analyzed[2].token_count == 0
    assert analyzed[3].token_count == 2

    rep = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert rep[1].dup_token_ratio is None
    assert rep[2].dup_token_ratio == 0.0


def test_star_linkage_clusters_equal_pairs_linkage(spark, docs):
    """Star linkage (bucket-min hub edges) must produce IDENTICAL connected
    components to all-pairs linkage — it's the linear-edge scale path for
    clustering, so cluster assignments may not drift."""
    from kamu_engine_flink_spark.operators import graph

    d = docs.select("doc_id", "text")
    nodes = d.select("doc_id")
    out = {}
    for linkage in ("pairs", "star"):
        p = dedup.minhash_lsh_pairs(
            d, "text", "doc_id", num_hashes=32, bands=8, linkage=linkage
        )
        cc = graph.connected_components(nodes, p, "doc_id")
        out[linkage] = {
            (r["doc_id"], r["component"]) for r in cc.collect()
        }
    assert out["pairs"] == out["star"]


def test_portable_minhash_removes_exact_dup(spark, near_dups):
    kept = {
        r["doc_id"]
        for r in dedup.dedup_minhash_portable(near_dups, "text", "doc_id").collect()
    }
    assert 1 in kept and 2 not in kept  # exact dup of doc 1 loses
    assert 4 in kept and 5 in kept  # unrelated + too-short docs survive
    assert 3 not in kept or 3 in kept  # near-dup may fall either side of 0.5


def test_portable_simhash_removes_exact_dup(spark, near_dups):
    kept = {
        r["doc_id"]
        for r in dedup.dedup_simhash_portable(near_dups, "text", "doc_id").collect()
    }
    assert 1 in kept and 2 not in kept
    assert 4 in kept


def test_portable_dedup_null_and_blank_kept(spark):
    rows = [(1, None), (2, ""), (3, "   "), (4, "one two"), (5, "real content words here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for fn in (dedup.dedup_minhash_portable, dedup.dedup_simhash_portable):
        kept = {r["doc_id"] for r in fn(df, "text", "doc_id").collect()}
        assert {1, 2, 3} <= kept, fn.__name__  # unshingleable docs always survive


def test_remove_duplicate_segments_keep_first(spark):
    """Corpus-wide keep-first on 3-word segments: doc 2 repeats doc 1's
    first segment (removed), keeps its unique tail; a NULL-text doc
    passes through with NULL clean_text; an all-duplicate doc rebuilds
    to ''."""
    rows = [
        (1, "a b c d e f"),          # segments: "a b c", "d e f"
        (2, "a b c x y z"),          # "a b c" is a dup of doc 1's
        (3, None),                   # NULL text
        (4, "a b c"),                # every segment a dup -> ''
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["clean_text"], r["n_segments"], r["n_removed"])
        for r in dedup.remove_duplicate_segments(df, seg_words=3).collect()
    }
    assert out[1] == ("a b c d e f", 2, 0)
    assert out[2] == ("x y z", 2, 1)
    assert out[3] == (None, 0, 0)
    assert out[4] == ("", 1, 1)


def test_remove_duplicate_segments_identity_without_dups(spark, docs):
    """A corpus with no duplicated segments must reassemble byte-exact.
    Make each doc's segments unique by prefixing every doc's text with
    its id-derived token."""
    tagged = docs.select(
        "doc_id", F.concat(F.lit("uid"), F.col("doc_id"), F.lit(" "), F.col("text")).alias("text")
    )
    out = dedup.remove_duplicate_segments(tagged, seg_words=7)
    joined = tagged.join(out, "doc_id")
    # Any doc whose segments were all unique reassembles to the original.
    mismatch = joined.filter(
        (F.col("n_removed") == 0) & (F.col("clean_text") != F.col("text"))
    ).count()
    assert mismatch == 0
    # and with unique-per-doc leading tokens most docs keep everything
    assert out.filter(F.col("n_removed") == 0).count() > 0


def test_minhash_incremental_matches_batch(spark, docs, tmp_path):
    """The incremental-ingest law: with id-ordered batches, the union of
    kept batches equals the batch portable dedup over the whole corpus —
    with the state round-tripped through parquet between batches, as a
    real ingest would."""
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cuts = [0, len(ids) // 3, 2 * len(ids) // 3, len(ids)]
    state = None
    kept_ids = set()
    for i in range(3):
        lo, hi = ids[cuts[i]], ids[cuts[i + 1] - 1]
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
        kept, state = dedup.dedup_minhash_incremental(batch, state)
        kept_ids |= {r.doc_id for r in kept.select("doc_id").collect()}
        # Round-trip the state through parquet (a real ingest persists it).
        bpath, spath = str(tmp_path / f"b{i}"), str(tmp_path / f"s{i}")
        state[0].write.mode("overwrite").parquet(bpath)
        state[1].write.mode("overwrite").parquet(spath)
        state = (spark.read.parquet(bpath), spark.read.parquet(spath))

    batch_kept = {
        r.doc_id for r in dedup.dedup_minhash_portable(docs).select("doc_id").collect()
    }
    assert kept_ids == batch_kept


def test_minhash_incremental_drops_cross_batch_dup(spark):
    """A batch-2 document near-identical to a batch-1 document must drop
    even though its own batch contains no duplicate."""
    base = (
        "the quick brown fox jumps over the lazy dog while the sun shines "
        "bright over the green valley and the river runs fast"
    )
    b1 = spark.createDataFrame(
        [(1, base), (2, "completely different content about machine learning "
                        "pipelines and spark engines running at scale")],
        ["doc_id", "text"],
    )
    b2 = spark.createDataFrame(
        [(3, base.replace("fast", "slow")),
         (4, "yet another unrelated document describing parquet file layouts "
             "and shuffle partitioning strategies in detail")],
        ["doc_id", "text"],
    )
    kept1, state = dedup.dedup_minhash_incremental(b1)
    assert sorted(r.doc_id for r in kept1.collect()) == [1, 2]
    kept2, _state = dedup.dedup_minhash_incremental(b2, state)
    assert sorted(r.doc_id for r in kept2.collect()) == [4]
