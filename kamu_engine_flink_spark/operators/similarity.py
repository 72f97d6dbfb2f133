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


def _plane_values(seed: int, bits: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1), derived from
    md5(seed, plane, dim) driver-side — uniform is fine for sign-LSH, and
    literal planes keep the Spark expression tree tiny (no per-component
    hash nodes)."""
    import hashlib

    planes = []
    for p in range(bits):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            v = int.from_bytes(h[:8], "little", signed=False)
            row.append(v / float(2**63) - 1.0)
        planes.append(row)
    return planes


def hyperplane_signature(vec, dim: int, bits: int = 16, seed: int = 42):
    """b-bit sign signature of `vec` (array column, length `dim`).

    One fold over bit indices against a literal plane matrix; the vector
    column is referenced (not re-embedded) per bit, so the tree stays
    O(bits*dim) literals + a compact aggregate."""
    planes = F.array(
        *[
            F.array(*[F.lit(v) for v in row])
            for row in _plane_values(seed, bits, dim)
        ]
    )
    vec_d = F.transform(vec, lambda x: x.cast("double"))
    powers = F.array(*[F.lit(1 << p).cast("bigint") for p in range(bits)])
    zero = F.lit(0).cast("bigint")
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        zero,
        lambda acc, p: acc
        + F.when(
            F.aggregate(
                F.zip_with(vec_d, F.element_at(planes, p + 1), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            > 0,
            F.element_at(powers, p + 1),
        ).otherwise(zero),
    )


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
    multiprobe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: join on LSH bucket — candidates are the union
    over `tables` independent hash tables (plus all probes of the query
    signature within `multiprobe` bit flips) — then exact cosine re-ranks.
    Recall scales with tables/probes, candidate cost with 2^-bits; tune per
    corpus density. Probes multiply only the (small) query side — the
    corpus keeps exactly `tables` bucket rows per vector."""
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
    # Bind each per-table query signature to a column first; the 1-bit
    # multiprobe flips are then cheap XORs of a column reference instead of
    # (1 + bits) re-embeddings of the signature fold.
    q_sigged = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(vec_col).alias("__qv"),
        *[
            hyperplane_signature(F.col(vec_col), dim, bits, seed + 1000 * t).alias(f"__s{t}")
            for t in range(tables)
        ],
    )
    flips = [0]
    if int(multiprobe) >= 1:
        flips += [1 << b for b in range(bits)]
    if int(multiprobe) >= 2:
        flips += [(1 << a) | (1 << b) for a in range(bits) for b in range(a + 1, bits)]
    q_probes = []
    for t in range(tables):
        sigs = [
            F.col(f"__s{t}") if m == 0 else F.col(f"__s{t}").bitwiseXOR(F.lit(m).cast("bigint"))
            for m in flips
        ]
        q_probes += [F.struct(F.lit(t).alias("table"), s.alias("key")) for s in sigs]
    q = q_sigged.select(
        "__qid", "__qv", F.explode(F.array(*q_probes)).alias("__sig")
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
