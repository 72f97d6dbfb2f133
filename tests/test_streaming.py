"""Structured Streaming surface: incremental windowed aggregation with
data-derived watermarks, availableNow trigger, cross-run checkpoint state.

Mirrors the reference's multi-invocation aggregation scenario
(EngineAggregationTest.scala:54-440) in the continuous/derived-watermark
mode. Trigger.AvailableNow keeps running micro-batches until the stream
settles, including a final flush batch under the advanced watermark — so
windows the new data closes are emitted in the SAME invocation, matching
the reference's process-available-then-suspend behavior
(TransformEngine.scala:338-380), and exactly once across runs via the
checkpoint.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kamu_engine_flink_spark.streaming.structured import StreamingWindowAgg

from .helpers import ts


def _slice(path, rows):
    cols = list(zip(*rows)) if rows else [[], [], []]
    pq.write_table(
        pa.table(
            {
                "event_time": pa.array(list(cols[0]), pa.timestamp("ms", tz="UTC")),
                "symbol": pa.array(list(cols[1]), pa.string()),
                "price": pa.array(list(cols[2]), pa.int32()),
            }
        ),
        path,
        compression="snappy",
    )


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ["in", "chk", "out"]}
    os.makedirs(d["in"])
    return d


def _read_out(spark, path):
    try:
        rows = spark.read.parquet(path).collect()
    except Exception:
        return []
    return sorted((r.event_time, r.symbol, r.min_price, r.max_price) for r in rows)


def test_incremental_window_agg_across_runs(spark, dirs):
    job = StreamingWindowAgg(
        input_dir=dirs["in"],
        checkpoint_dir=dirs["chk"],
        output_dir=dirs["out"],
        window_duration="1 day",
        watermark_delay="1 hour",
        event_time_col="event_time",
        group_keys=["symbol"],
        aggs={"min_price": "min(price)", "max_price": "max(price)"},
    )

    # Run 1: days 1-2. Derived watermark settles at day2 01:00 - 1h =
    # day2 00:00 -> day 1's window closes and emits in this run; day 2
    # stays open in checkpointed state.
    _slice(
        os.path.join(dirs["in"], "slice-1.parquet"),
        [
            (ts(1, 1), "A", 10),
            (ts(1, 2), "A", 12),
            (ts(1, 1), "B", 20),
            (ts(2, 1), "A", 11),
        ],
    )
    job.run_available_now(spark)
    out1 = _read_out(spark, dirs["out"])
    assert [(r[1], r[2], r[3]) for r in out1] == [("A", 10, 12), ("B", 20, 20)]

    # Run 2: a day-3 slice advances the watermark to day3 00:00, closing
    # day 2 (buffered from run 1 in the checkpoint) exactly once.
    _slice(os.path.join(dirs["in"], "slice-2.parquet"), [(ts(3, 1), "A", 99)])
    job.run_available_now(spark)
    out2 = _read_out(spark, dirs["out"])
    new = [r for r in out2 if r not in out1]
    assert [(r[1], r[2], r[3]) for r in new] == [("A", 11, 11)]
    # Day-1 windows did not re-emit (exactly-once append across runs).
    assert len(out2) == len(out1) + 1
