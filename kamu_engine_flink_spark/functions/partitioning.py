"""Partition-width helpers.

At 100 TB a parquet scan arrives in thousands of splits and none of this
fires. The failure mode these guard against is the other end: a small or
single-file input feeding a compute-heavy projection (minhash over every
shingle, simhash over every token) runs on ONE core unless widened first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition UP to the session's default parallelism —
    only when the input is narrower than that. Never shrinks, never
    shuffles an already-wide scan (the common case at scale)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# Aggregates that distribute over a two-phase (salted partial -> final)
# split: final(partial(xs)) == agg(xs).
_ALGEBRAIC = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for SKEWED grouping keys.

    aggs: output column -> (function, input column), function in
    {sum, count, min, max} (the algebraic set that re-combines exactly).

    A hot key that would pin one reducer is split across `salt_buckets`
    partial groups (salt = hash of the full row, cheap and uniform), then
    re-combined in a second, tiny shuffle over (keys) only. AQE's skew
    handling covers sort-merge joins; this covers the groupBy path where
    Spark has no runtime skew splitting. For non-skewed data the extra
    exchange is wasted — use plain groupBy unless a key is known hot."""
    from pyspark.sql import functions as F

    for name, (fn, _col) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{name}: '{fn}' is not algebraic (use sum/count/min/max)")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                getattr(F, fn)(F.col(c)).alias(f"__p_{name}")
                for name, (fn, c) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, _ALGEBRAIC[fn])(F.col(f"__p_{name}")).alias(name)
            for name, (fn, _c) in aggs.items()
        ]
    )
