"""Text-analysis operator tests on the synthetic documents table."""

import pytest
from pyspark.sql import functions as F

from kamu_engine_flink_spark.operators.text_analysis import analyze_documents

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def analyzed(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return analyze_documents(docs).cache()


def test_metrics_ranges(analyzed):
    agg = analyzed.agg(
        F.min("token_count"),
        F.min("quality_score"),
        F.max("quality_score"),
        F.max("alpha_ratio"),
        F.max("punct_ratio"),
    ).collect()[0]
    assert agg[0] >= 0
    assert 0.0 <= agg[1] <= agg[2] <= 1.0
    assert agg[3] <= 1.0
    assert agg[4] <= 1.0


def test_char_count_matches_table(analyzed):
    mismatches = analyzed.filter(F.col("char_count") != F.col("n_chars")).count()
    assert mismatches == 0


def test_fingerprint_stable_under_formatting(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different")], ["doc_id", "text"]
    )
    out = analyze_documents(df).select("doc_id", "fingerprint").collect()
    fp = {r.doc_id: r.fingerprint for r in out}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_language_guess_plausible(analyzed):
    langs = {r[0] for r in analyzed.select("lang_guess").distinct().collect()}
    assert langs <= {"en", "de", "fr", "es", "und"}


def test_repetition_signals_hand_computed(spark):
    from kamu_engine_flink_spark.operators.text_analysis import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a a a b"),        # 4 tokens, 2 distinct; bigrams: "a a","a a","a b"
            (2, "x y z"),          # no repeats; bigrams "x y","y z" all unique
            (3, "spam spam spam spam"),  # total repetition
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert rows[1].dup_token_ratio == 0.5
    assert rows[1].top_ngram_count == 2
    assert abs(rows[1].top_ngram_frac - 2 / 3) < 1e-6
    assert rows[2].dup_token_ratio == 0.0
    assert rows[2].top_ngram_count == 1
    assert rows[3].dup_token_ratio == 0.75
    assert rows[3].top_ngram_count == 3  # "spam spam" x3
    assert rows[3].top_ngram_frac == 1.0


def test_repetition_signals_degenerate_docs(spark):
    from kamu_engine_flink_spark.operators.text_analysis import repetition_signals

    df = spark.createDataFrame([(1, ""), (2, "one")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert rows[1].dup_token_ratio == 0.0  # empty -> [''] single token
    assert rows[2].top_ngram_count == 1  # partial gram of a 1-token doc


def test_scrub_text_redacts_pii(spark):
    from kamu_engine_flink_spark.functions import text as T
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "Contact bob.smith+x@corp.io or visit https://a.b/c?d=1 now"),
            (2, "tel 555-0199 ref 12345 ok"),
            (3, "clean text, no pii"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            T.scrub_text(F.col("text")).alias("s"),
            T.pattern_count(F.col("text"), T.EMAIL_RE).alias("e"),
            T.pattern_count(F.col("text"), T.URL_RE).alias("u"),
            T.pattern_count(F.col("text"), T.NUM_RE).alias("n"),
        ).collect()
    }
    assert out[1].s == "Contact <EMAIL> or visit <URL> now"
    assert (out[1].e, out[1].u) == (1, 1)
    assert out[2].s == "tel <NUM> ref <NUM> ok"
    assert out[2].n == 2
    assert out[3].s == "clean text, no pii"


def test_inverted_index_postings(spark):
    from kamu_engine_flink_spark.operators.text_analysis import inverted_index

    rows = [
        (1, "spark spark flink"),
        (2, "spark duck"),
        (3, "duck duck goose"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["term"]: r for r in inverted_index(df, max_postings=2).collect()}
    assert out["spark"]["doc_freq"] == 2
    assert out["spark"]["total_tf"] == 3  # two in doc 1, one in doc 2
    assert out["spark"]["postings"] == [1, 2]
    assert out["duck"]["postings"] == [2, 3]
    assert out["goose"]["doc_freq"] == 1 and out["goose"]["postings"] == [3]
    # cap: a term in 3 docs keeps only the 2 smallest ids
    df2 = spark.createDataFrame(
        [(i, "common") for i in (5, 3, 9)], ["doc_id", "text"]
    )
    (row,) = inverted_index(df2, max_postings=2).collect()
    assert row["doc_freq"] == 3 and row["postings"] == [3, 5]


def test_quality_classifier_trained_weights(spark):
    from kamu_engine_flink_spark.operators.text_analysis import (
        quality_classifier_score,
    )

    rows = [
        (1, "good great excellent"),
        (2, "bad awful good"),
        (3, None),
        (4, "unknown words only"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    w = {"good": 1.0, "great": 2.0, "excellent": 3.0, "bad": -2.0, "awful": -4.0}
    out = {
        r["doc_id"]: (r["n_tokens"], r["logit"], r["keep"])
        for r in quality_classifier_score(df, weights=w).collect()
    }
    import math

    assert out[1][0] == 3 and abs(out[1][1] - 6.0 / math.sqrt(3)) < 1e-12
    assert out[1][2] is True
    assert abs(out[2][1] - (-5.0) / math.sqrt(3)) < 1e-12 and out[2][2] is False
    assert out[3] == (0, None, None)  # NULL text
    assert out[4][0] == 3 and out[4][1] == 0.0 and out[4][2] is False


def test_quality_classifier_hash_path_deterministic(spark):
    from kamu_engine_flink_spark.operators.text_analysis import (
        quality_classifier_score,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in quality_classifier_score(df).collect()}
    # identical text -> identical score; blank text -> NULL score
    assert rows[1]["logit"] == rows[2]["logit"] and rows[1]["logit"] is not None
    assert rows[3]["n_tokens"] == 0 and rows[3]["logit"] is None


def test_bigram_lm_score_trains_on_corpus(spark):
    from kamu_engine_flink_spark.operators.text_analysis import bigram_lm_score

    rows = [
        (1, "a b a b"),      # bigrams: (a,b) x2, (b,a) x1
        (2, "a b"),          # (a,b)
        (3, "x"),            # <2 tokens -> NULL score
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_lm_score(df, with_perplexity=True).collect()}
    # LM: c(a,b)=3, c(b,a)=1; contexts c(a.)=3, c(b.)=1; V=3 (a, b, x).
    p_ab = (3 + 1.0) / (3 + 3)
    p_ba = (1 + 1.0) / (1 + 3)
    import math

    q = lambda p: math.floor(p * 1e6)  # noqa: E731
    assert out[1]["n_bigrams"] == 3
    assert out[1]["sum_prob_q"] == 2 * q(p_ab) + q(p_ba)
    assert abs(out[1]["mean_prob_q"] - out[1]["sum_prob_q"] / 3) < 1e-12
    expected_ppl = math.exp(-(2 * math.log(p_ab) + math.log(p_ba)) / 3)
    assert abs(out[1]["perplexity"] - expected_ppl) < 1e-9
    assert out[2]["n_bigrams"] == 1 and out[2]["sum_prob_q"] == q(p_ab)
    assert out[3]["n_bigrams"] == 0 and out[3]["sum_prob_q"] is None
    assert out[4]["n_bigrams"] == 0 and out[4]["mean_prob_q"] is None
    # frequent-pattern doc scores higher than a one-off sequence
    assert out[1]["mean_prob_q"] > 0
