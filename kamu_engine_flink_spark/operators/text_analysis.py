"""Document-table text analysis: one operator that annotates a corpus with
token counts, character-class ratios, language guess, quality score and
fingerprint — all JVM-side expressions (functions/text.py), so the whole
thing is a single narrow projection: full codegen, trivially scalable to
any corpus size. The only shuffle is the `spread` widening round-robin,
and that fires only when the scan arrives narrower than the session's
parallelism (small/single-file corpora — compute-bound projections must
not inherit byte-based split counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.partitioning import spread


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return spread(df).select(
        "*",
        T.token_count(c).alias("token_count"),
        T.bpe_ish_token_count(c).alias("bpe_token_count"),
        T.char_count(c).alias("char_count"),
        F.round(T.alpha_ratio(c), 6).alias("alpha_ratio"),
        F.round(T.digit_ratio(c), 6).alias("digit_ratio"),
        F.round(T.punct_ratio(c), 6).alias("punct_ratio"),
        F.round(T.stopword_ratio(c), 6).alias("stopword_ratio"),
        T.language_guess(c).alias("lang_guess"),
        T.quality_score(c).alias("quality_score"),
        T.fingerprint(c).alias("fingerprint"),
    )


def repetition_signals(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Gopher-style repetition filters: duplicate-token fraction and the
    share of n-gram slots held by the single most frequent n-gram. The
    top-n-gram scan is O(distinct x total) per document — fine at document
    grain (hundreds of tokens); it stays a narrow per-row projection, so
    the operator scales with the corpus exactly like analyze_documents."""
    c = F.col(text_col)
    return spread(df).select(
        "*",
        F.round(T.dup_token_ratio(c), 6).alias("dup_token_ratio"),
        T.top_ngram_count(c, n).alias("top_ngram_count"),
        F.round(T.top_ngram_frac(c, n), 6).alias("top_ngram_frac"),
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 20,
) -> DataFrame:
    """Build a term -> postings inverted index over the corpus: per
    lowercase alpha term, the distinct-document frequency, the total term
    frequency, and a CAPPED postings list (the `max_postings` smallest doc
    ids — deterministic; a real index shards long postings, and an
    uncapped collect_list on a stop word would be a straggler at 100 TB).

    Plan: explode -> per-(term, doc) count (map-side combinable) ->
    per-term rollup. Two shuffles, both on high-cardinality or
    pre-aggregated keys; no UDF.
    """
    tok = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term"),
    ).filter(F.col("term") != "")
    per_doc = tok.groupBy("term", "__id").agg(F.count(F.lit(1)).alias("__tf"))
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.sum("__tf").cast("long").alias("total_tf"),
        F.slice(F.array_sort(F.collect_list("__id")), 1, max_postings).alias(
            "postings"
        ),
    )


def quality_classifier_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """fastText/CCNet-style linear quality scorer via the hashing trick:
    logit = sum of per-token weights / (1000 * sqrt(n_tokens)), keep =
    logit > 0. The document-ranking shape every large-scale corpus
    pipeline runs before sampling.

    With `weights` (a trained vocabulary -> weight map), tokens join a
    broadcast weight table (unknown tokens weigh 0; weights are scaled by
    1000 into the integer sum so both paths share one normalization).
    Without it, each token's weight derives from the portable 48-bit md5
    hash ((h % 2001) - 1000 in [-1000, 1000]) — a deterministic stand-in
    with the exact plan shape of the trained model, reproducible in
    DuckDB SQL so the oracle can hash-check the full pipeline. Swap-in
    point for real model weights, like the multimodal codec plug.

    Zero-shuffle in the hash path (pure per-row codegen expressions);
    one broadcast join + one groupBy in the weights path. NULL/blank
    text scores NULL.
    """
    from ..functions.portable_hash import _toks_sql, h48

    toks = _toks_sql(text_col)
    if weights is None:
        wsum = (
            f"aggregate(t, 0L, (a, x) -> a + {h48('x')} % 2001 - 1000)"
        )
        logit = F.expr(
            f"CASE WHEN {text_col} IS NULL THEN CAST(NULL AS DOUBLE) "
            f"ELSE transform(array({toks}), t -> "
            f"  CASE WHEN size(t) = 0 THEN CAST(NULL AS DOUBLE) "
            f"  ELSE {wsum} / (1000.0D * sqrt(size(t))) END)[0] END"
        )
        scored = spread(df).select(
            F.col(id_col),
            F.expr(f"size({toks})").alias("n_tokens"),
            logit.alias("logit"),
        )
        # Blank text has zero tokens but a non-NULL array — size() above
        # returns 0 there and -1 only for NULL input; normalize to 0.
        scored = scored.withColumn(
            "n_tokens", F.greatest(F.col("n_tokens"), F.lit(0)).cast("long")
        )
    else:
        w_df = df.sparkSession.createDataFrame(
            [(t, float(w)) for t, w in weights.items()], ["__tok", "__w"]
        )
        tok_rows = spread(df).select(
            F.col(id_col), F.explode_outer(F.expr(toks)).alias("__tok")
        )
        scored = (
            tok_rows.join(F.broadcast(w_df), "__tok", "left")
            .groupBy(id_col)
            .agg(
                F.count("__tok").cast("long").alias("n_tokens"),
                F.sum(F.coalesce(F.col("__w"), F.lit(0.0))).alias("__wsum"),
            )
            .withColumn(
                "logit",
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("__wsum") / F.sqrt(F.col("n_tokens")),
                ),
            )
            .drop("__wsum")
        )
        # NULL-text docs explode to a NULL token row: n_tokens counts
        # non-null tokens, so they land at 0 with NULL logit as intended.
    return scored.withColumn("keep", F.col("logit") > F.lit(0.0))


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_perplexity: bool = False,
) -> DataFrame:
    """CCNet-style language-model fluency scoring with a corpus-trained
    bigram LM: P(w2|w1) = (c(w1 w2) + 1) / (c(w1 .) + V), add-one
    smoothed over the corpus vocabulary. Per document, emits the bigram
    count and the mean quantized probability (sum of floor(P * 1e6) over
    occurrences / n) — floor of a deterministic IEEE division is an exact
    integer, so the whole score is order-independent and replayable in
    DuckDB SQL, unlike ln()-based perplexity (JVM and C libm logs differ
    in the last ulp on ~80% of inputs). `with_perplexity=True` adds the
    conventional exp(-mean ln P) column for production ranking.

    Scale shape: two aggregation passes train the LM (bigram counts,
    context counts — both map-side combinable), the corpus joins its own
    bigram table on the (w1, w2) key (co-partitioned shuffle join, never
    broadcast — the bigram table grows with the corpus), and V arrives as
    a broadcast one-row cross join. Docs with <2 tokens score NULL.
    """
    from ..functions.portable_hash import word_tokens

    toks = word_tokens(text_col)
    base = spread(df).select(F.col(id_col).alias("__id"), toks.alias("__toks"))
    bigrams = base.select(
        "__id",
        F.explode(
            F.when(
                F.size("__toks") >= 2,
                F.expr(
                    "transform(sequence(1, size(__toks) - 1), "
                    "i -> struct(__toks[i-1] AS w1, __toks[i] AS w2))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("bg"),
    ).select("__id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    # Counts cascade from the per-doc aggregation so the raw bigram
    # stream is shuffled once, not three times: doc_bg -> corpus bigram
    # counts -> context counts, each pass over already-aggregated rows.
    doc_bg = bigrams.groupBy("__id", "w1", "w2").agg(F.count(F.lit(1)).alias("__m"))
    bigram_counts = doc_bg.groupBy("w1", "w2").agg(F.sum("__m").alias("__c12"))
    context_counts = bigram_counts.groupBy("w1").agg(F.sum("__c12").alias("__c1"))
    vocab = base.select(F.explode("__toks").alias("t")).agg(
        F.countDistinct("t").alias("__v")
    )
    probs = (
        bigram_counts.join(context_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            ((F.col("__c12") + F.lit(1.0)) / (F.col("__c1") + F.col("__v"))).alias(
                "__p"
            ),
        )
    )

    agg_cols = [
        F.sum("__m").cast("long").alias("n_bigrams"),
        F.sum(F.col("__m") * F.floor(F.col("__p") * 1e6))
        .cast("long")
        .alias("sum_prob_q"),
    ]
    if with_perplexity:
        agg_cols.append(
            F.exp(-F.sum(F.col("__m") * F.log("__p")) / F.sum("__m")).alias(
                "perplexity"
            )
        )
    scored = doc_bg.join(probs, ["w1", "w2"]).groupBy("__id").agg(*agg_cols)

    out = (
        df.select(F.col(id_col).alias("__id"))
        .join(scored, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "sum_prob_q",
            (F.col("sum_prob_q") / F.col("n_bigrams")).alias("mean_prob_q"),
            *(["perplexity"] if with_perplexity else []),
        )
    )
    return out
