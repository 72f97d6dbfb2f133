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
