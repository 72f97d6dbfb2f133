"""Cross-engine equivalence of the portable hash family: the Spark
expressions and the DuckDB oracle fragments must produce IDENTICAL
MinHash signatures and SimHash fingerprints on adversarial text —
including the primitives known to diverge between engines (vertical tab
in Java's \\s but not RE2's; locale case mappings like U+0130; DuckDB's
Unicode-aware trim on edge NBSP). The driver's oracle checks stand on
exactly this equivalence."""

import random
import string

import duckdb
import pytest

from kamu_engine_flink_spark.functions import portable_hash as PH


def _adversarial_texts() -> list:
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + " .,;!?-'\"\t\n"
    unicode_extra = "äöüßéñ中文🙂İI \x0b\f\r"
    texts = []
    for i in range(150):
        n = rng.randrange(0, 160)
        pool = alphabet if i % 3 else alphabet + unicode_extra
        texts.append("".join(rng.choice(pool) for _ in range(n)))
    texts += ["", "   ", "\x0b", "\t\t", "İstanbul city data rows",
              "ends with nbsp\xa0", "\xa0leads nbsp", "a b c d e", None]
    return texts


def test_portable_hashes_match_duckdb(spark):
    texts = _adversarial_texts()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = (
        df.withColumn("hs", PH.shingle_hashes_portable("text"))
        .withColumn("sig", PH.minhash_sig_portable("hs"))
        .withColumn("fp", PH.simhash48_portable("text"))
        .select("doc_id", "sig", "fp")
        .collect()
    )
    spark_out = {r["doc_id"]: (tuple(r["sig"] or []), r["fp"]) for r in got}

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)]
    )
    A = "[" + ", ".join(map(str, PH.A)) + "]"
    B = "[" + ", ".join(map(str, PH.B)) + "]"
    toks = PH.duck_toks_sql("text")
    duck = con.execute(
        rf"""
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN []::VARCHAR[] ELSE {toks} END AS toks
            FROM docs
        ), sh AS (
            SELECT doc_id,
                CASE WHEN len(toks) < 3 THEN []::BIGINT[]
                     ELSE list_transform(range(1, len(toks)-1),
                          i -> ('0x'||substr(md5(array_to_string(toks[i:i+2],' ')),1,12))::BIGINT
                               % 2147483647)
                END AS hs FROM base
        ), sig AS (
            SELECT doc_id,
                list_transform(range(32), i ->
                    list_min(list_transform(hs, h -> ({A}[i+1]*h + {B}[i+1]) % 2147483647))) AS sig
            FROM sh
        ), th AS (
            SELECT doc_id,
                   list_transform(list_distinct(toks),
                                  t -> ('0x'||substr(md5(t),1,12))::BIGINT) AS hs
            FROM base
        ), fp AS (
            SELECT doc_id,
                CASE WHEN len(hs)=0 THEN 0
                     ELSE CAST(list_sum(list_transform(range(48), b ->
                          CASE WHEN list_sum(list_transform(hs, h -> ((h>>b)&1)*2-1)) >= 0
                               THEN (1::BIGINT<<b) ELSE 0 END)) AS BIGINT)
                END AS fp FROM th
        )
        SELECT s.doc_id, s.sig, f.fp FROM sig s JOIN fp f USING (doc_id)
        """
    ).fetchall()
    assert len(duck) == len(texts)
    for doc_id, dsig, dfp in duck:
        ssig, sfp = spark_out[doc_id]
        assert tuple(ssig) == tuple(dsig or []), (doc_id, repr(texts[doc_id])[:60])
        assert sfp == dfp, (doc_id, repr(texts[doc_id])[:60])


def test_quantized_cosine_matches_duckdb(spark):
    """Integer quantization + one IEEE sqrt/divide must be bit-identical
    across engines (rank orderings in the ANN oracles depend on it)."""
    rng = random.Random(11)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(40)]
    rows = [(i, [float(f"{x:.7g}") for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    from pyspark.sql import functions as F

    q = df.select(
        "vec_id", PH.quantize_embedding("embedding").alias("qe")
    )
    a = q.alias("a")
    b = q.alias("b")
    got = (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            PH.quantized_cosine("a.qe", "b.qe").alias("c"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO emb VALUES (?, ?)", rows)
    dot = "list_sum(list_transform(range(16), j -> {a}[j+1] * {b}[j+1]))"
    cos = (
        f"round(CAST({dot.format(a='x.qe', b='y.qe')} AS DOUBLE) / "
        f"(sqrt(CAST({dot.format(a='x.qe', b='x.qe')} AS DOUBLE)) * "
        f"sqrt(CAST({dot.format(a='y.qe', b='y.qe')} AS DOUBLE))), 6)"
    )
    duck = {
        (ia, ib): c
        for ia, ib, c in con.execute(
            f"""
            WITH q AS (SELECT vec_id,
                list_transform(embedding, v -> round(v * 1000000)::BIGINT) AS qe FROM emb)
            SELECT x.vec_id, y.vec_id, {cos}
            FROM q x JOIN q y ON x.vec_id < y.vec_id
            """
        ).fetchall()
    }
    assert len(got) == len(duck)
    for r in got:
        assert duck[(r["ia"], r["ib"])] == pytest.approx(r["c"], abs=0), (r["ia"], r["ib"])