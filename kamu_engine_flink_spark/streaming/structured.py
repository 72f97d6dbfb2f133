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
        query = (
            self._plan(spark)
            .writeStream.format("parquet")
            .option("path", self.output_dir)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
