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
