"""Deduplication operators over document tables.

Beyond-reference surface (driver north star): exact, MinHash+LSH, SimHash,
n-gram Jaccard, and embedding-cosine near-dup detection, each as a
DataFrame -> DataFrame operator designed for the 100 TB shape:

- exact dedup is one hash-partitioned groupBy (map-side combine, no row
  explosion);
- candidate generation for near-dup methods is banded LSH: explode to
  (band, key) buckets, shuffle once on the bucket key, and pair only
  within buckets — never an O(n^2) cross join;
- survivors are decided by the "smaller-id wins" rule (a doc is dropped
  iff it has a near-dup with a smaller id), a one-pass, deterministic,
  associative criterion that needs no iterative connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import minhash_pandas as MP
from ..functions import text as T
from ..functions import vectors as V
from ..functions.partitioning import spread


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest-id row per exact text content. Single shuffle on
    the (hashed) content; ties impossible (ids unique)."""
    return (
        df.withColumn("__fp", F.md5(F.col(text_col)))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__fp")
    )


def _minhash_sigs(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int, shingle_k: int
) -> DataFrame:
    """(__id, __sig) — signature computation is the vectorized numpy
    Pandas UDF (functions/minhash_pandas.py — the pure-expression form is
    interpreted CodegenFallback and ~100x slower); normalization stays
    JVM-side codegen."""
    sig = MP.minhash_signature_fast(
        T.normalize_text(F.col(text_col)), num_hashes, shingle_k
    )
    return spread(df).select(F.col(id_col).alias("__id"), sig.alias("__sig"))


def _estimated_jaccard(sig_a, sig_b):
    """MinHash estimator: fraction of matching signature components
    (unbiased; stderr ~= sqrt(j(1-j)/k), ~0.05 at k=64, j=0.8)."""
    return F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda m: m)
    ) / F.size(sig_a)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    sigs: DataFrame | None = None,
    dedupe: bool = True,
    linkage: str = "pairs",
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that share at least one
    LSH band. One shuffle on (band, key); skew-safe under AQE.

    `sigs`: optional precomputed (__id, __sig) relation. Pass a persisted
    one when the caller also needs signatures downstream — the self-join
    below evaluates its input subtree twice, so an unpersisted signature
    UDF would run two corpus passes here alone.

    `dedupe=False` skips the distinct (saves a shuffle): use when the
    caller tolerates one pair row per shared band — e.g. a cheap per-pair
    verification followed by its own aggregation (duplicates are bounded
    by `bands`).

    `linkage='star'` links every bucket member to the bucket's minimum id
    instead of emitting all in-bucket pairs: m-1 edges per bucket instead
    of C(m,2). Connectivity-equivalent for clustering (the hub reaches all
    members), so connected-components downstream yields identical
    clusters — and it's the only shape that survives heavily-boilerplated
    corpora at scale, where one hot bucket of 10k near-identical docs
    would otherwise emit 50M pairs. Not for pairwise-verified dedup: the
    hub-member pair may be less similar than member-member pairs, so a
    post-hoc Jaccard filter would break transitivity differently."""
    if linkage not in ("pairs", "star"):
        raise ValueError(f"linkage must be 'pairs' or 'star', got {linkage!r}")
    if sigs is None:
        sigs = _minhash_sigs(df, text_col, id_col, num_hashes, shingle_k)
    buckets = sigs.select(
        "__id", F.explode(H.lsh_bands(F.col("__sig"), bands)).alias("bucket")
    ).select("__id", F.col("bucket.band").alias("band"), F.col("bucket.key").alias("key"))
    if linkage == "star":
        hubs = buckets.groupBy("band", "key").agg(F.min("__id").alias("id_a"))
        pairs = (
            buckets.join(hubs, ["band", "key"])
            .filter(F.col("__id") != F.col("id_a"))
            .select("id_a", F.col("__id").alias("id_b"))
        )
        return pairs.distinct() if dedupe else pairs
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.__id") < F.col("b.__id")),
    ).select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
    return pairs.distinct() if dedupe else pairs


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float | None = 0.8,
    verify: str = "estimate",
) -> DataFrame:
    """Smaller-id-wins MinHash dedup.

    verify='estimate' (default, the 100 TB path): candidates are verified
    with the MinHash-estimated Jaccard — one extra join against the
    (id, signature) relation, no second pass over the corpus text.
    verify='exact': recompute exact Jaccard over hashed shingle sets —
    a second corpus-wide UDF pass plus two array joins; use when the
    threshold must be sharp. verify=None / jaccard_threshold=None: trust
    the banding alone."""
    if verify not in ("estimate", "exact", None):
        raise ValueError(f"verify must be 'estimate', 'exact' or None, got {verify!r}")
    # The signature relation feeds the bucket self-join (twice, branch
    # duplication) and both verification joins. Persist it so the Pandas-UDF
    # corpus pass runs exactly once per action — at 100 TB this is the
    # difference between one and four full scans of the corpus text.
    # Materialize EAGERLY: AQE launches the four consuming shuffle stages
    # concurrently, and if the cache is still cold they all recompute the
    # UDF subtree and serialize on per-partition cache locks (measured 4x
    # CPU + ~3x wall on the bench corpus). One count() up front makes every
    # branch a cache read.
    sigs = _minhash_sigs(df, text_col, id_col, num_hashes, shingle_k).persist()
    sigs.count()
    # Pair-level distinct is redundant for the estimate/None paths: the
    # per-band duplicate pairs (bounded by `bands`) are either filtered by
    # the cheap signature comparison or collapsed by the losers distinct
    # below — skipping it saves a full pairs shuffle. The exact path keeps
    # it so each candidate joins the heavy shingle arrays once.
    pairs = minhash_lsh_pairs(
        df, text_col, id_col, num_hashes, bands, shingle_k,
        sigs=sigs, dedupe=(verify == "exact"),
    )
    if jaccard_threshold is not None and verify == "estimate":
        pairs = (
            pairs.join(
                sigs.select(F.col("__id").alias("id_a"), F.col("__sig").alias("__sig_a")), "id_a"
            )
            .join(
                sigs.select(F.col("__id").alias("id_b"), F.col("__sig").alias("__sig_b")), "id_b"
            )
            .filter(
                _estimated_jaccard(F.col("__sig_a"), F.col("__sig_b")) >= jaccard_threshold
            )
            .select("id_a", "id_b")
        )
    elif jaccard_threshold is not None and verify == "exact":
        # Exact Jaccard on HASHED shingles (numpy UDF; array_intersect and
        # the join shuffle run on bigints — 8 bytes per shingle, collision
        # odds ~2^-64/pair).
        shingled = spread(df).select(
            F.col(id_col).alias("__id"),
            MP.shingle_hashes_fast(T.normalize_text(F.col(text_col)), shingle_k).alias("__sh"),
        )
        pairs = (
            pairs.join(shingled.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "__sh_a"), "id_a")
            .join(shingled.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "__sh_b"), "id_b")
            .withColumn(
                "__jac",
                F.size(F.array_intersect("__sh_a", "__sh_b"))
                / F.greatest(F.size(F.array_union("__sh_a", "__sh_b")), F.lit(1)),
            )
            .filter(F.col("__jac") >= jaccard_threshold)
            .select("id_a", "id_b")
        )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: 4x16-bit bands (pigeonhole: hamming<=3
    guarantees one identical band), verified with exact bit_count."""
    sim = spread(df).select(
        F.col(id_col).alias("__id"), H.simhash64(T.tokens(F.col(text_col))).alias("__sim")
    )
    bands = sim.select(
        "__id",
        "__sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("__sim"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF).cast("bigint"))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bucket"),
    ).select("__id", "__sim", "bucket.band", "bucket.key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            H.hamming64(F.col("a.__sim"), F.col("b.__sim")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    losers = simhash_pairs(df, text_col, id_col, max_hamming).select(
        F.col("id_b").alias(id_col)
    ).distinct()
    return df.join(losers, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs (id_a < id_b,
    jaccard >= threshold). `block_col` restricts comparisons to equal
    blocking keys (e.g. a language column); without one this is the
    O(n^2)-per-partition reference implementation used as the oracle for
    the LSH variants — at scale, feed it LSH candidates instead."""
    grams = df.select(
        F.col(id_col).alias("__id"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
        H.word_ngrams(T.tokens(F.col(text_col)), n).alias("__ng"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    if block_col:
        cond = cond & (F.col("a.__blk") == F.col("b.__blk"))
    return (
        a.join(b, cond)
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("a.__ng", "b.__ng"))
            / F.greatest(F.size(F.array_union("a.__ng", "b.__ng")), F.lit(1)),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b,
    cosine > threshold). Brute-force within blocks; the scale path feeds
    LSH-bucketed candidates (similarity.hyperplane_lsh_buckets)."""
    vecs = df.select(
        F.col(id_col).alias("__id"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
        F.col(vec_col).alias("__v"),
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    if block_col:
        cond = cond & (F.col("a.__blk") == F.col("b.__blk"))
    return (
        a.join(b, cond)
        .withColumn("cosine", V.cosine(F.col("a.__v"), F.col("b.__v")))
        .filter(F.col("cosine") > threshold)
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
    )


# ---------------------------------------------------------------------------
# Portable (cross-engine-reproducible) near-dedup — functions/portable_hash.py
# ---------------------------------------------------------------------------


def dedup_minhash_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_matches: int = 16,
) -> DataFrame:
    """Smaller-id-wins MinHash+LSH dedup over the md5-derived portable hash
    family (functions/portable_hash.py): word-3-gram shingles, 32 mod-P
    affine minima, 8 bands x 4 rows, candidates verified by >= min_matches
    equal signature positions (16/32 ~ estimated Jaccard 0.5). The same
    computation is expressible in ANSI SQL, so the driver's DuckDB oracle
    hash-checks the ENTIRE pipeline — banding, pairing, keep rule.

    Same banded single-shuffle shape as dedup_minhash_lsh; docs with fewer
    than 3 tokens (or blank text) can't shingle and are always kept."""
    from ..functions import portable_hash as PH

    sigd = df.withColumn("__hs", PH.shingle_hashes_portable(text_col)).withColumn(
        "__sig", PH.minhash_sig_portable("__hs")
    )
    sigd = sigd.persist()
    buckets = (
        sigd.filter(F.size("__hs") > 0)
        .select(F.col(id_col).alias("__id"), PH.band_keys_portable("__sig").alias("__keys"))
        .select("__id", F.posexplode("__keys").alias("band", "key"))
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    sa = sigd.select(F.col(id_col).alias("id_a"), F.col("__sig").alias("__sig_a"))
    sb = sigd.select(F.col(id_col).alias("id_b"), F.col("__sig").alias("__sig_b"))
    losers = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            F.expr("size(filter(zip_with(__sig_a, __sig_b, (x, y) -> x = y), v -> v))")
            >= min_matches
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")


def dedup_minhash_incremental(
    df: DataFrame,
    prior_state: tuple[DataFrame, DataFrame] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_matches: int = 16,
) -> tuple[DataFrame, tuple[DataFrame, DataFrame]]:
    """Incremental (cross-batch) smaller-id-wins MinHash dedup — the
    training-data INGEST shape: dedup each arriving batch against the
    accumulated corpus without ever rescanning history text.

    State is a pair of relations over every doc seen so far (kept AND
    dropped — the batch rule lets an already-dropped doc still eliminate
    later arrivals): the (band, key, id) bucket membership and the
    (id, signature) table, both from the portable md5/mod-P hash family
    (functions/portable_hash.py) so a DuckDB oracle can hash-check the
    law below end to end. A new doc drops iff a bucket-mate with
    >= min_matches equal signature positions exists in the prior state
    (every prior id is smaller when batches arrive in id order) or at a
    smaller id within its own batch.

    LAW: with id-ordered batches, the union of kept batches equals
    dedup_minhash_portable over the whole corpus.

    Returns (kept rows of df, new state). Per batch: one signature pass
    over the batch text, one (band, key) join against the state buckets,
    one in-batch bucket self-join, signature-verification joins against
    the batch + the touched prior ids — O(batch + touched buckets), never
    O(corpus). Persist the state relations bucketed by (band, key) / id
    for exchange-free probes at scale (the engine state layer's layout).
    """
    from ..functions import portable_hash as PH

    sigd = (
        spread(df)
        .withColumn("__hs", PH.shingle_hashes_portable(text_col))
        .withColumn("__sig", PH.minhash_sig_portable("__hs"))
        .persist()
    )
    new_buckets = (
        sigd.filter(F.size("__hs") > 0)
        .select(
            F.col(id_col).alias("__id"),
            PH.band_keys_portable("__sig").alias("__keys"),
        )
        .select("__id", F.posexplode("__keys").alias("band", "key"))
    )
    new_sigs = sigd.select(F.col(id_col).alias("__id"), F.col("__sig").alias("__sig_v"))

    def _verify(cand: DataFrame, sigs_a: DataFrame, sigs_b: DataFrame) -> DataFrame:
        return (
            cand.join(
                sigs_a.select(F.col("__id").alias("id_a"), F.col("__sig_v").alias("__sig_a")),
                "id_a",
            )
            .join(
                sigs_b.select(F.col("__id").alias("id_b"), F.col("__sig_v").alias("__sig_b")),
                "id_b",
            )
            .filter(
                F.expr(
                    "size(filter(zip_with(__sig_a, __sig_b, (x, y) -> x = y), v -> v))"
                )
                >= min_matches
            )
            .select("id_b")
        )

    # In-batch: smaller id wins within the arriving batch.
    a, b = new_buckets.alias("a"), new_buckets.alias("b")
    cand_batch = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    losers = _verify(cand_batch, new_sigs, new_sigs)

    if prior_state is not None:
        prior_buckets, prior_sigs = prior_state
        # Cross-batch: any prior bucket-mate eliminates (prior ids are
        # smaller under id-ordered arrival).
        cand_hist = (
            new_buckets.alias("n")
            .join(
                prior_buckets.alias("p"),
                (F.col("n.band") == F.col("p.band"))
                & (F.col("n.key") == F.col("p.key")),
            )
            .select(F.col("p.__id").alias("id_a"), F.col("n.__id").alias("id_b"))
            .distinct()
        )
        losers = losers.unionByName(_verify(cand_hist, prior_sigs, new_sigs))
        state = (
            prior_buckets.unionByName(new_buckets),
            prior_sigs.unionByName(new_sigs),
        )
    else:
        state = (new_buckets, new_sigs)

    kept = df.join(
        losers.distinct().withColumnRenamed("id_b", id_col), id_col, "left_anti"
    )
    return kept, state


def dedup_simhash_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Smaller-id-wins SimHash dedup over the portable 48-bit fingerprint:
    4 bands x 12 bits for candidates (pigeonhole: hamming <= 3 over 4 bands
    guarantees one identical band), verified by bit_count(xor) <=
    max_hamming. DuckDB-reproducible end to end. Blank docs (no tokens)
    are always kept."""
    from ..functions import portable_hash as PH

    fpd = df.withColumn("__fp", PH.simhash48_portable(text_col)).withColumn(
        "__blank", F.size(PH.word_tokens(text_col)) == 0
    )
    fpd = fpd.persist()
    buckets = (
        fpd.filter(~F.col("__blank"))
        .select(
            F.col(id_col).alias("__id"),
            F.col("__fp"),
            F.explode(
                F.expr(
                    "transform(sequence(0, 3), j -> "
                    "named_struct('band', j, 'key', shiftright(__fp, 12 * j) & 4095))"
                )
            ).alias("bk"),
        )
        .select("__id", "__fp", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    losers = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .filter(F.expr("bit_count(a.__fp ^ b.__fp)") <= max_hamming)
        .select(F.col("b.__id").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")


def remove_duplicate_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 10,
) -> DataFrame:
    """Corpus-level duplicate-SEGMENT removal with reassembly (the
    CCNet/RefinedWeb paragraph-dedup shape, on fixed word-count segments
    since the corpus has no newlines): split each document into
    consecutive `seg_words`-word segments, keep only the FIRST occurrence
    of each segment text corpus-wide (earliest (id, position) wins —
    deterministic, order-independent), and rebuild each document from its
    surviving segments.

    100 TB shape: the split/segment expressions are pure JVM codegen (no
    UDF); the keep-first decision is one row_number window keyed on the
    segment text (high-cardinality key, well distributed — at scale swap
    the raw text for xxhash64(seg) to shrink shuffle bytes at a
    negligible collision risk); reassembly is one groupBy(id) with an
    in-group sort. Two shuffles total, no row explosion beyond the
    segment count.

    Output: (id, clean_text, n_segments, n_removed) — clean_text is NULL
    for NULL input text and '' when every segment was a duplicate.
    """
    from pyspark.sql import Window as W

    words = F.split(F.col(text_col), " ")
    n_segs = F.ceil(F.size(words) / F.lit(seg_words)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(F.slice(words, i * seg_words + 1, seg_words), " "),
    )
    seg_rows = df.select(
        F.col(id_col).alias("__id"), F.posexplode(segs).alias("__pos", "__seg")
    )
    w = W.partitionBy("__seg").orderBy("__id", "__pos")
    kept = (
        seg_rows.withColumn("__rk", F.row_number().over(w))
        .withColumn("__keep", F.col("__rk") == 1)
        .groupBy("__id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("__keep"), F.struct("__pos", "__seg"))
                        )
                    ),
                    lambda s: s["__seg"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(F.when(~F.col("__keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
        )
    )
    # NULL-text docs produce no segment rows; restore them with NULL
    # clean_text (null-semantics contract shared by the corpus operators).
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(kept, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "clean_text",
            F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )
