"""Bucketed (co-located) joins — pre-shuffled storage for repeated big joins.

The reference never faces this problem: at parallelism 1
(TransformApp.scala:39, flink-conf `parallelism.default: 1`) every join is
trivially co-located on the single task. At 100 TB the same join is the
dominant shuffle: every `fact JOIN fact` repartitions both sides on the key
for every query that runs it.

Spark's storage-level answer is bucketing: write each side hash-partitioned
(and optionally sorted) by the join key into N buckets ONCE, and every
subsequent equi-join on that key reads bucket i against bucket i with zero
exchange — the shuffle is amortized into the write. This is the idiomatic
equivalent of co-partitioned state in a streaming engine: pay the
partitioning when data lands, not per query.

Usage shape (scale pattern, exercised in tests/test_colocated.py):

    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 64, path=...)
    write_bucketed(orders,   "orders_b",   ["o_orderkey"], 64, path=...)
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    # executed plan: SortMergeJoin with NO Exchange on either side

Rules Catalyst needs to elide the exchanges: both sides bucketed by exactly
the join keys, bucket counts equal (or one a divisor of the other with
spark.sql.bucketing.coalesceBucketsInJoin.enabled), and the table read via
the catalog (`spark.table`) — a plain `spark.read.parquet` of the same
files loses the bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    num_buckets: int,
    sort_keys: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> str:
    """Materialize `df` as a bucketed parquet table registered in the
    session catalog. `sort_keys` (default: the bucket keys) sorts rows
    within each bucket file so the downstream sort-merge join skips its
    per-partition sort as well."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_keys)
        .sortBy(*(sort_keys or bucket_keys))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    return table_name


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the executed physical plan —
    the thing bucketing exists to drive to zero. (AQE wraps the plan; the
    string form still names every ShuffleExchange.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints "== Final Plan ==" followed by "== Initial Plan =="; only
    # the final section describes what actually ran.
    plan = plan.split("== Initial Plan ==")[0]
    return plan.count("Exchange hashpartitioning") + plan.count("ShuffleExchange")


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two catalog (bucketed) tables. Plain `DataFrame.join` — the
    exchange elision is Catalyst's, given the bucket metadata; this
    helper only makes the catalog-read requirement explicit."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
