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
