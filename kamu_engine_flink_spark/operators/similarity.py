"""Similarity search over embedding columns (array<float>).

Two paths, same results contract (top-k neighbors per query):

- `cosine_topk` — brute force: broadcast the (small) query set, one pass
  over the corpus, per-query top-k via window rank. Exact; scales linearly
  in corpus size and is embarrassingly parallel (no corpus shuffle at all
  when queries are broadcast).
- `hyperplane_lsh_topk` — random-hyperplane LSH: corpus and queries get a
  b-bit signature (sign of dot with b pseudo-random planes); candidates
  share a signature bucket (with multi-probe on 1-bit flips), then exact
  cosine re-ranks. Sub-linear candidate sets at 100 TB; recall tunable via
  bits/probes. Planes are derived deterministically from a seed via
  xxhash64 so results are reproducible with no stored model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query row. Deterministic tie-break on
    corpus id. Self-queries (same id) are not excluded — pass pre-filtered
    queries if needed."""
    q = queries.select(F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(corpus_id).alias("__cid"), F.col(vec_col).alias("__cv"))
    scored = c.join(F.broadcast(q)).withColumn("cosine", V.cosine(F.col("__cv"), F.col("__qv")))
    w = Window.partitionBy("__qid").orderBy(F.desc("cosine"), F.asc("__cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            F.col("rank"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def _plane_component(seed: int, plane: int, dim: int):
    """Deterministic pseudo-gaussian plane component in [-1, 1): derived
    from xxhash64(seed, plane, dim) — uniform is fine for sign-LSH."""
    h = F.xxhash64(F.lit(seed), F.lit(plane), F.lit(dim))
    return (h.cast("double") / F.lit(float(2**63)))


def hyperplane_signature(vec, dim: int, bits: int = 16, seed: int = 42):
    """b-bit sign signature of `vec` (array column, length `dim`)."""
    sig = F.lit(0).cast("bigint")
    for p in range(bits):
        plane = F.array(*[_plane_component(seed, p, d) for d in range(dim)])
        bit = (V.dot(vec, plane) > 0).cast("bigint")
        sig = sig.bitwiseOR(F.shiftleft(bit, p))
    return sig


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    bits: int = 12,
    tables: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: join on LSH bucket — candidates are the union
    over `tables` independent hash tables (plus 1-bit-flip probes of each
    query signature) — then exact cosine re-ranks. Recall scales with
    tables/probes, candidate cost with 2^-bits; tune per corpus density."""
    c_sigs = [
        F.struct(
            F.lit(t).alias("table"),
            hyperplane_signature(F.col(vec_col), dim, bits, seed + 1000 * t).alias("key"),
        )
        for t in range(tables)
    ]
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(vec_col).alias("__cv"),
        F.explode(F.array(*c_sigs)).alias("__sig"),
    )
    q_probes = []
    for t in range(tables):
        qsig = hyperplane_signature(F.col(vec_col), dim, bits, seed + 1000 * t)
        sigs = [qsig] + (
            [qsig.bitwiseXOR(F.lit(1 << b).cast("bigint")) for b in range(bits)]
            if multiprobe
            else []
        )
        q_probes += [F.struct(F.lit(t).alias("table"), s.alias("key")) for s in sigs]
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(vec_col).alias("__qv"),
        F.explode(F.array(*q_probes)).alias("__sig"),
    )
    cand = c.join(F.broadcast(q), "__sig").withColumn(
        "cosine", V.cosine(F.col("__cv"), F.col("__qv"))
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cosine"), F.asc("__cid"))
    return (
        cand.select("__qid", "__cid", "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            F.col("rank"),
            F.round("cosine", 6).alias("cosine"),
        )
    )
