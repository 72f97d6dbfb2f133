"""Structured Streaming execution of the engine's windowed-aggregation
surface, for always-on deployments.

The micro-batch engine (engine/transform.py) implements the reference's
process-available-then-suspend contract (TransformEngine.scala:338-380)
with engine-owned state, because ODF injects EXPLICIT watermarks that
Spark's `withWatermark` (data-derived) cannot express. When a deployment
instead wants a continuously running job with DATA-DERIVED watermarks —
the common Spark-native shape — this module provides it directly on
Structured Streaming:

  - `readStream` file source over a slice directory (new parquet files
    are discovered per micro-batch, mirroring the reference's
    slice-vector-append model, ParquetFilesStreamSourceFunction.scala);
  - `withWatermark(event_time, delay)` == the reference's
    MaxOutOfOrderWatermarkGenerator (BoundedOutOfOrderWatermark.scala:16-69)
    derived mode: watermark = max(event_time) - delay, monotonic;
  - tumbling `window()` aggregation in append mode == TUMBLE emit-once-
    when-watermark-passes semantics (README 'Windowed Aggregations');
  - checkpointed `Trigger.AvailableNow` == process what exists, persist
    state, stop — the savepoint-suspend cycle without the savepoint hacks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass
class StreamingWindowAgg:
    """Continuous tumbling-window aggregation over a growing directory of
    parquet slices.

    aggs: mapping of output column -> SQL aggregate expression over the
    input columns (e.g. {"min_price": "min(price)"}).
    """

    input_dir: str
    checkpoint_dir: str
    output_dir: str
    window_duration: str = "1 day"
    watermark_delay: str = "1 day"
    event_time_col: str = "event_time"
    group_keys: list[str] = field(default_factory=list)
    aggs: dict[str, str] = field(default_factory=dict)
    schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        schema = self.schema
        if schema is None:
            schema = spark.read.parquet(self.input_dir).schema
        stream = spark.readStream.schema(schema).parquet(self.input_dir)
        agg_cols = [F.expr(expr).alias(name) for name, expr in self.aggs.items()]
        return (
            stream.withWatermark(self.event_time_col, self.watermark_delay)
            .groupBy(
                F.window(F.col(self.event_time_col), self.window_duration).alias("w"),
                *self.group_keys,
            )
            .agg(*agg_cols)
            .select(
                F.col("w.start").alias(self.event_time_col),
                *self.group_keys,
                *self.aggs.keys(),
            )
        )

    def run_available_now(self, spark: SparkSession) -> None:
        """One incremental pass: process all files not yet seen by the
        checkpoint, emit windows the (derived) watermark has closed since
        the previous pass, persist stream + operator state, stop."""
        _run_available_now(self._plan(spark), self.checkpoint_dir, self.output_dir)


def _run_available_now(plan: DataFrame, checkpoint_dir: str, output_dir: str) -> None:
    query = (
        plan.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def _file_stream(spark: SparkSession, input_dir: str, schema: StructType | None) -> DataFrame:
    if schema is None:
        schema = spark.read.parquet(input_dir).schema
    return spark.readStream.schema(schema).parquet(input_dir)


@dataclass
class StreamingIntervalJoin:
    """Stream-to-stream interval join over two growing slice directories —
    the reference's core streaming join (README 'Stream-To-Stream Joins',
    EngineJoinStreamToStreamTest.scala:106-117) in the always-on,
    derived-watermark mode.

    Semantics carried over 1:1:
      - equi key + time range: right.time in [left.time + lower,
        left.time + upper];
      - join buffers persist across invocations in the checkpoint (an
        order from run 1 matches a shipment arriving in run 2 — the
        scenario at EngineJoinStreamToStreamTest.scala:178-226);
      - how='left_outer': the null-padded left row is emitted only once
        both watermarks prove no match can arrive (the reference's
        subtlest timing, :222-225) — Spark enforces exactly this rule for
        outer stream-stream joins.

    Column names across the two inputs must be disjoint (the reference
    scenario uses distinct order_*/shipment_* names); state size is
    bounded by `upper` + the watermark delays.
    """

    left_dir: str
    right_dir: str
    checkpoint_dir: str
    output_dir: str
    left_time: str
    right_time: str
    equi_keys: list[tuple[str, str]] = field(default_factory=list)
    lower: str = "0 seconds"
    upper: str = "2 days"
    watermark_delay_left: str = "1 hour"
    watermark_delay_right: str = "1 hour"
    how: str = "inner"
    left_schema: StructType | None = None
    right_schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        left = _file_stream(spark, self.left_dir, self.left_schema).withWatermark(
            self.left_time, self.watermark_delay_left
        )
        right = _file_stream(spark, self.right_dir, self.right_schema).withWatermark(
            self.right_time, self.watermark_delay_right
        )
        conds = [F.col(lk) == F.col(rk) for lk, rk in self.equi_keys]
        conds.append(
            F.col(self.right_time)
            >= F.col(self.left_time) + F.expr(f"INTERVAL {self.lower}")
        )
        conds.append(
            F.col(self.right_time)
            <= F.col(self.left_time) + F.expr(f"INTERVAL {self.upper}")
        )
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        return left.join(right, cond, self.how)

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(self._plan(spark), self.checkpoint_dir, self.output_dir)


@dataclass
class StreamingDedup:
    """Streaming exact dedup: first occurrence per key wins, duplicates
    arriving within the watermark horizon are dropped, state is evicted
    once the watermark passes (bounded state — the 100 TB requirement;
    unbounded dropDuplicates state would OOM an always-on job).

    The batch counterpart is operators/dedup.dedup_exact; this is the
    always-on member of the dedup family (driver north star)."""

    input_dir: str
    checkpoint_dir: str
    output_dir: str
    keys: list[str] = field(default_factory=list)
    event_time_col: str = "event_time"
    watermark_delay: str = "1 hour"
    schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        stream = _file_stream(spark, self.input_dir, self.schema).withWatermark(
            self.event_time_col, self.watermark_delay
        )
        return stream.dropDuplicatesWithinWatermark(self.keys)

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(self._plan(spark), self.checkpoint_dir, self.output_dir)
