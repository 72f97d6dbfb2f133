"""Training-data pipeline operators: semantic dedup, shard shuffle,
mixture sampling, curriculum binning, exact shared-shingle signals.

Beyond-reference surface (driver north star): the operations a large-scale
LLM training-data pipeline runs AFTER near-dup detection — choosing what
to keep (semantic dedup over embeddings, SemDeDup-style), how much of each
domain to keep (temperature-scaled mixture sampling), in what order to
feed it (quality curriculum bins), and how to lay it out for the trainer
(deterministic shard shuffle). Everything is built from the PORTABLE
md5/integer hash family (functions/portable_hash.py), so each operator has
a DuckDB oracle that replays it hash-exactly — and everything stays inside
Catalyst codegen: no Python in any of these paths.

100 TB shapes:
- semantic_dedup: one shuffle on the LSH cluster key; pair work is
  bounded per cluster (raise `bits` with log2(corpus) to hold cluster
  sizes constant — the same knob real SemDeDup turns via k-means k).
- shard_assign: one hash shuffle on the shard key; the in-shard position
  is a per-shard sort, which is exactly the trainer-facing layout write
  (repartition(shards) + sortWithinPartitions) — no global sort anywhere.
- mixture_sample: per-domain counts are a map-side-combined aggregate;
  the per-doc keep decision joins each row against a broadcast of the
  (tiny) per-domain target table.
- curriculum_bins: one pass to score (pure codegen), one exchange for the
  bin histogram. ntile needs a global order; over *bins* (not rows) the
  output is small, and the rank is computed per-domain-free with a single
  window — at extreme scale swap ntile for approx-quantile cut points.
- duplicate_ngram_docs: the classic exact-substring-dedup preprocessing
  shape (Lee et al., "Deduplicating Training Data Makes Language Models
  Better"): explode to (shingle-hash, doc), one groupBy for document
  frequency, one join back. Linear in total tokens, no pairwise work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable_hash as PH


def _h48(expr: str) -> str:
    """48-bit integer from md5 of a SQL string expression (portable)."""
    return PH.h48(expr)


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 6,
    tau: float = 0.3,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    cluster by integer sign-LSH bucket (the deterministic, oracle-exact
    stand-in for SemDeDup's k-means assignment), then within each cluster
    drop every row that has an earlier-id neighbor with quantized cosine
    >= tau ("smaller-id wins" — associative, deterministic, no iteration).

    Returns (id, cluster_id, is_kept, dup_of) where dup_of is the smallest
    earlier near-duplicate id (NULL for kept rows).

    Scale: one shuffle on cluster_id; within-cluster pair count is
    sum(c_i^2) — bounded by choosing bits ~ log2(n / target_cluster_size).
    The join is JVM-side codegen; for mega-clusters the GEMM path in
    operators/similarity.py is the escape hatch.
    """
    # Persist: the clustered table feeds both sides of the within-cluster
    # self-join AND the final keep-flag join — unpinned, the 64x64
    # integer-plane bucket expression would run three times per row.
    q = (
        df.select(
            F.col(id_col).alias("__id"),
            PH.quantize_embedding(vec_col).alias("__qe"),
        )
        .withColumn("__cluster", PH.lsh_plane_bucket("__qe", bits=bits))
        .persist()
    )

    a = q.alias("a")
    b = q.alias("b")
    losers = (
        a.join(
            b,
            (F.col("a.__cluster") == F.col("b.__cluster"))
            & (F.col("b.__id") < F.col("a.__id")),
        )
        .filter(PH.quantized_cosine("a.__qe", "b.__qe") >= F.lit(tau))
        .groupBy(F.col("a.__id").alias("__id"))
        .agg(F.min("b.__id").alias("dup_of"))
    )
    return (
        q.join(losers, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("__cluster").alias("cluster_id"),
            F.col("dup_of").isNull().alias("is_kept"),
            "dup_of",
        )
    )


def shard_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    num_shards: int = 8,
    salt: str = "shard-v1",
) -> DataFrame:
    """Deterministic global training shuffle: every row gets a shard in
    [0, num_shards) and a position within its shard, both pure functions
    of (salt, id). The hash order IS the shuffle — re-running with the
    same salt reproduces the exact layout; changing the salt is a fresh
    epoch-level reshuffle.

    Scale: shard = hash % n needs only a hash exchange on the shard key;
    the in-shard position is a per-shard sort — the same layout a shard
    writer produces with repartition(n, shard) + sortWithinPartitions,
    never a global sort.
    """
    from pyspark.sql import Window

    h = F.expr(
        _h48(f"concat('{salt}-', cast({id_col} as string))")
    )
    out = df.withColumn("__h", h).withColumn(
        "shard", (F.col("__h") % F.lit(num_shards)).cast("bigint")
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return out.withColumn(
        "shard_pos", (F.row_number().over(w) - 1).cast("bigint")
    ).drop("__h")


def mixture_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    alpha: float = 0.5,
    budget: int = 200,
    salt: str = "mix-v1",
) -> DataFrame:
    """Temperature-scaled mixture sampling across domains: domain weights
    proportional to count^alpha (alpha=1 natural mix, alpha=0 uniform,
    alpha~0.5 the usual multilingual/up-weight-the-tail setting); each
    domain contributes floor(weight * budget) documents, chosen
    deterministically by hash order of (salt, id) so the sample is
    reproducible across runs and engines.

    Returns the kept rows with (id, domain, picked_rank, domain_target).

    Scale: the per-domain count is one map-side-combined aggregate whose
    result (one row per domain) broadcasts back; per-doc ranking is a
    window partitioned by domain — one shuffle on the domain key. Skewed
    domains are exactly the ones alpha down-weights; the rank window only
    needs the top `target` per domain, which AQE + the rank filter prune.
    """
    h = F.expr(_h48(f"concat('{salt}-', cast({id_col} as string))"))
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))

    # Exact cross-engine targets: per-domain weights are count^alpha
    # QUANTIZED to millionths (alpha=0.5 through sqrt — the one power
    # IEEE-754 requires to be correctly rounded), the total is an exact
    # integer sum (a raw float sum is addition-order-dependent, and
    # Spark's partial-aggregation order differs from any oracle's), and
    # the target is one integer floor division — no float whose last ulp
    # could flip a floor boundary between engines.
    def _w(col):
        c = col.cast("double")
        base = F.sqrt(c) if alpha == 0.5 else F.pow(c, F.lit(alpha))
        return F.round(base * F.lit(1_000_000.0), 0).cast("bigint")

    weighted = counts.select(F.col(domain_col), _w(F.col("__n")).alias("__m"))
    tot = weighted.agg(F.sum("__m").alias("__tot"))
    targets = (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            domain_col,
            F.expr(f"CAST({int(budget)}L * __m DIV __tot AS BIGINT)").alias(
                "domain_target"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(h, id_col)
    ranked = df.select(id_col, domain_col).withColumn(
        "picked_rank", F.row_number().over(w).cast("bigint")
    )
    return (
        ranked.join(F.broadcast(targets), domain_col)
        .filter(F.col("picked_rank") <= F.col("domain_target"))
        .select(id_col, domain_col, "picked_rank", "domain_target")
    )


def curriculum_bins(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bins: int = 5,
) -> DataFrame:
    """Quality-curriculum binning: score every document with the fixed
    heuristic quality formula (functions/text.py:90 — the same expression
    the text_analysis operator exposes), split the corpus into n_bins
    equal-size bins by ascending score (ntile over a deterministic
    (score, id) total order), and emit the per-bin curriculum table a
    training scheduler consumes.

    Returns (bin, n_docs, avg_quality, min_quality, max_quality,
    total_tokens) — one row per bin, worst-first (curriculum order).

    Scale: scoring is pure codegen over one scan. ntile needs a total
    order; the aggregate output is n_bins rows, so at extreme scale the
    cut points come from approx_percentile instead of a full sort — this
    operator keeps exact ntile because its oracle is exact.
    """
    from pyspark.sql import Window

    from ..functions import text as T

    scored = df.select(
        F.col(id_col),
        T.quality_score(F.col(text_col)).alias("__q"),
        T.token_count(F.col(text_col)).alias("__toks"),
    )
    w = Window.orderBy("__q", id_col)
    binned = scored.withColumn("bin", F.ntile(n_bins).over(w).cast("bigint"))
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            # Exact-mean pattern: the 4-decimal scores sum exactly in
            # DECIMAL (order-independent), one IEEE divide at the end.
            F.round(
                F.sum(F.col("__q").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_quality"),
            F.min("__q").alias("min_quality"),
            F.max("__q").alias("max_quality"),
            F.sum("__toks").cast("bigint").alias("total_tokens"),
        )
    )


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Johnson-Lindenstrauss-style random projection to `out_dim`
    integer coordinates: each output component is the exact integer dot
    product of the quantized embedding with an md5-derived integer plane
    (functions/portable_hash.plane_component, 'rp' family — independent
    of the LSH bucket planes). Distance-preserving enough for coarse
    ANN prefiltering and dedup blocking at ~dim/out_dim the bytes; being
    all-integer, any engine reproduces it bit-exactly.

    Scale: pure codegen projection, zero shuffle, one corpus pass; the
    out_dim x dim plane matrix is inlined as literals (driver-known
    constants, the broadcast-variable pattern without a join)."""
    from ..functions.portable_hash import plane_component, quantize_embedding

    q = df.select(
        F.col(id_col), quantize_embedding(vec_col).alias("__qe")
    )
    comps = []
    for i in range(out_dim):
        plane = "array(" + ", ".join(
            f"{plane_component(i, j, prefix='rp')}L" for j in range(dim)
        ) + ")"
        comps.append(
            f"aggregate(zip_with(__qe, {plane}, (x, y) -> x * y), 0L, (a, v) -> a + v)"
        )
    return q.select(
        id_col, F.expr(f"array({', '.join(comps)})").alias("proj")
    )


def duplicate_ngram_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Exact shared-shingle signal (the preprocessing shape of
    exact-substring dedup, Lee et al. 2022): for each document, how many
    of its word n-gram shingles also occur in at least one OTHER document,
    and what fraction of the document that is. Downstream filters cut
    documents whose dup_shingle_frac exceeds a threshold, or feed the
    shingle table to a span-remover.

    Uses the portable tokenization + 48-bit shingle hashes
    (functions/portable_hash.py), so the DuckDB oracle replays it exactly.

    Returns (id, n_shingles, dup_shingles, dup_shingle_frac) for documents
    with at least one shingle.

    Scale: explode to (shingle_hash, doc) — linear in total tokens — one
    groupBy for per-shingle distinct-document counts (map-side combined),
    one join back on the shingle hash. No pairwise work anywhere; this is
    the standard distributed substitute for a monolithic suffix array.
    """
    # Persist the shingle table: the exploded frame below feeds BOTH the
    # docfreq aggregate and the join back, and the shingle expression is
    # the dominant cost — same pattern as dedup_minhash_portable's sigd.
    sh = (
        df.select(
            F.col(id_col).alias("__id"),
            F.array_distinct(PH.shingle_hashes_portable(text_col, n=n)).alias("__sh"),
        )
        .filter(F.size("__sh") > 0)
        .persist()
    )
    exploded = sh.select("__id", F.explode("__sh").alias("__h"))
    docfreq = exploded.groupBy("__h").agg(
        F.countDistinct("__id").alias("__df")
    )
    per_doc = (
        exploded.join(docfreq, "__h")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("__df") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("dup_shingles"),
        )
    )
    return per_doc.select(
        F.col("__id").alias(id_col),
        "n_shingles",
        "dup_shingles",
        F.round(F.col("dup_shingles") / F.col("n_shingles"), 6).alias(
            "dup_shingle_frac"
        ),
    )
