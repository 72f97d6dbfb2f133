"""HLL sketch operators (Spark-native Apache DataSketches HLL): accuracy
bound and the property that makes sketches worth using at scale —
mergeability (union of partial sketches == sketch of the union)."""

import os

import pytest
from pyspark.sql import functions as F

_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _events(spark):
    path = os.path.join(_SF_DIR, "events.parquet")
    if not os.path.exists(path):
        pytest.skip(f"test data not found at {path} (set SPARK_GRAFT_SF_DIR)")
    return spark.read.parquet(path)


def test_hll_estimate_within_bound(spark):
    e = _events(spark)
    got = (
        e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"), F.lit(14))).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert got
    for r in got:
        # lgConfigK=14 -> relative standard error ~0.81%; 5% is >6 sigma.
        assert abs(r.approx - r.exact) <= max(0.05 * r.exact, 2), r


def test_hll_daily_merge_equals_direct(spark):
    """Union-merging per-day partial sketches must estimate the same as
    sketching the whole column directly (identical sketch state, not just
    close): this is what lets partial aggregates re-merge across
    partitions, files and invocations."""
    e = _events(spark)
    direct = {
        r.event_type: r.approx
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"), F.lit(14))).alias("approx"))
        .collect()
    }
    daily = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("sk")
    )
    merged = {
        r.event_type: r.approx
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias("approx"))
        .collect()
    }
    assert merged == direct


def test_sketch_query_contract(spark):
    """Driver contract: exact count + a TRUE within-bound verdict on the
    merged-sketch estimate (the oracle asserts the verdict literally)."""
    import __spark_entry__ as entry

    df = entry.queries()["sketch_distinct_users"](spark, _SF_DIR)
    rows = df.collect()
    assert [f.name for f in df.schema.fields] == [
        "event_type", "exact_users", "hll_within_bound",
    ]
    assert rows and all(r.exact_users > 0 and r.hll_within_bound for r in rows)


def test_approx_quantiles_contract(spark):
    """Driver contract: exact quantiles + a TRUE GK rank-bound verdict."""
    import __spark_entry__ as entry

    df = entry.queries()["approx_quantiles_events"](spark, _SF_DIR)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.gk_within_bound, r
        assert r.exact_p50 <= r.exact_p90 <= r.exact_p99, r


def test_cms_matches_brute_force_python(spark):
    """The portable count-min sketch (functions/portable_hash.cms_cells)
    is deterministic integer arithmetic over md5 — a brute-force Python
    replay of the same cells must agree exactly, and estimate >= exact
    for every token (the CMS one-sided error guarantee)."""
    import hashlib
    from collections import Counter, defaultdict

    from kamu_engine_flink_spark.functions.portable_hash import (
        A, B, CMS_DEPTH, CMS_WIDTH, P, cms_cells, h48, word_tokens,
    )

    texts = [
        "the cat sat on the mat",
        "the dog ate the cat food",
        "a mat a cat a dog",
        "",
        "THE Cat\tsat",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    h = df.select(F.explode(word_tokens("text")).alias("tok")).withColumn(
        "hv", F.expr(f"{h48('tok')} % {P}L")
    )
    cells = (
        h.select(F.explode(cms_cells("hv")).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    got = {(r.i, r.bucket): r.cnt for r in cells.collect()}

    # Brute force.
    toks = []
    for t in texts:
        toks.extend(w for w in t.lower().split() if w)
    exact = Counter(toks)
    want = defaultdict(int)
    hv_of = {}
    for tok, n in exact.items():
        hv = int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % P
        hv_of[tok] = hv
        for i in range(CMS_DEPTH):
            want[(i, (A[i] * hv + B[i]) % P % CMS_WIDTH)] += n
    assert got == dict(want)

    # One-sided error: estimate >= exact, every token.
    for tok, n in exact.items():
        est = min(
            got[(i, (A[i] * hv_of[tok] + B[i]) % P % CMS_WIDTH)]
            for i in range(CMS_DEPTH)
        )
        assert est >= n


def test_cms_heavy_hitters_query_contract(spark):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["cms_heavy_hitters_tokens"](
        spark, _SF_DIR
    ).collect()
    assert rows
    for r in rows:
        assert r.cms_estimate >= r.exact_cnt > 0


def test_kmv_merge_equals_direct_and_tracks_exact(spark):
    """KMV mergeability: the union of per-day bottom-64 sketches,
    re-bottomed, equals the direct bottom-64 — the property that lets
    partial sketches merge across shards/days. And the estimate tracks
    the exact distinct count within the sketch's standard error."""
    from kamu_engine_flink_spark.functions.portable_hash import h48

    K = 64
    e = _events(spark)
    h = e.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.expr(h48("cast(user_id as string)")).alias("hv"),
    )

    def bottom_k(df, keys):
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy("hv")
        return (
            df.select(*keys, "hv").distinct()
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= K)
            .drop("r")
        )

    direct = bottom_k(h, ["event_type"])
    daily = bottom_k(h, ["event_type", "day"]).drop("day")
    merged = bottom_k(daily, ["event_type"])
    assert (
        direct.exceptAll(merged).count() == 0
        and merged.exceptAll(direct).count() == 0
    )

    # Estimate accuracy: rse ~ 1/sqrt(k-1) ~ 12.6%; assert within 4 sigma.
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["kmv_distinct_users"](spark, _SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r.kmv_estimate - r.exact_users) <= max(
            0.51 * r.exact_users, 3
        )


def test_bloom_no_false_negatives_and_exact_replay(spark):
    """Bloom-filter law on a planted corpus: every shingle genuinely in
    the eval set must be maybe-present (no false negatives — a theorem
    of the construction), and the brute-force bit-set computation agrees
    with the operator's counts."""
    from kamu_engine_flink_spark.functions.portable_hash import (
        BLOOM_K,
        BLOOM_M,
        bloom_positions,
    )

    vals = [(i, i * 7919 % 104729) for i in range(200)]
    df = spark.createDataFrame(vals, "id int, hv long")
    ev = df.filter(F.col("id") < 50).select("hv").distinct()
    bits = {
        r.pos
        for r in ev.select(
            F.explode(bloom_positions("hv")).alias("pos")
        ).collect()
    }
    probe = df.filter(F.col("id") >= 50).withColumn(
        "poss", bloom_positions("hv")
    )
    rows = probe.collect()
    ev_set = {r.hv for r in ev.collect()}
    for r in rows:
        member = r.hv in ev_set
        maybe = all(p in bits for p in r.poss)
        if member:
            assert maybe, f"false negative for hv={r.hv}"
    assert len(bits) <= BLOOM_M


def test_bloom_and_kmv_union_entries_verdicts(spark):
    """The two round-12 sketch entries' verdict columns hold at the test
    scale factor (the oracle asserts them TRUE cell-exactly; this pins
    them in-suite too)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    b = q["bloom_decontamination_documents"](spark, _SF_DIR).collect()
    assert b
    for r in b:
        assert r.no_false_negatives
        assert r.bloom_maybe >= r.exact_hits
        assert r.n_shingles >= r.bloom_maybe
    u = q["kmv_union_event_types"](spark, _SF_DIR).collect()
    assert len(u) == 1
    r = u[0]
    assert r.merge_equals_direct
    assert r.merged_estimate == r.direct_estimate
    assert abs(r.merged_estimate - r.exact_users) <= max(
        0.51 * r.exact_users, 3
    )
