"""Chained multi-step pipeline parity — mirrors
EngineJoinStreamToStreamTest.scala:230-477 ("join result can be used with
other queries", simple + tricky variants).

Three steps: interval LEFT join -> tumbling window agg over the join
output -> filter. Exercises per-step state, watermark propagation through
the chain (join lag included), and NULL-padding feeding an aggregation.
"""

from datetime import timezone

import pyarrow.parquet as pq

from kamu_engine_flink_spark.protocol.model import DatasetVocabulary

from .helpers import TransformRunner, ts
from .test_interval_join import orders_slice, shipments_slice

STEP1 = (
    """SELECT
  o.event_time as order_time,
  o.order_id,
  o.quantity as order_quantity,
  CAST(s.event_time as TIMESTAMP(3)) as shipped_time,
  COALESCE(s.num_shipped, 0) as shipped_quantity
FROM
  orders as o
LEFT JOIN shipments as s
ON
  o.order_id = s.order_id
  AND s.event_time BETWEEN o.event_time AND o.event_time + INTERVAL '2' DAY""",
    "order_shipments",
)
STEP2 = (
    """SELECT
  TUMBLE_START(order_time, INTERVAL '1' DAY) as order_time,
  order_id,
  count(*) as num_shipments,
  min(shipped_time) as first_shipment,
  max(shipped_time) as last_shipment,
  min(order_quantity) as order_quantity,
  sum(shipped_quantity) as shipped_quantity_total
FROM order_shipments
GROUP BY TUMBLE(order_time, INTERVAL '1' DAY), order_id""",
    "shipment_stats",
)
STEP3 = (
    """SELECT *
FROM shipment_stats
WHERE order_quantity <> shipped_quantity_total""",
    None,
)


def _rows(out_path):
    table = pq.read_table(out_path)
    rows = [
        (
            r["system_time"].replace(tzinfo=timezone.utc),
            r["order_time"].replace(tzinfo=timezone.utc),
            r["order_id"],
            r["num_shipments"],
            r["first_shipment"].replace(tzinfo=timezone.utc) if r["first_shipment"] else None,
            r["last_shipment"].replace(tzinfo=timezone.utc) if r["last_shipment"] else None,
            r["order_quantity"],
            r["shipped_quantity_total"],
        )
        for r in table.to_pylist()
    ]
    return sorted(rows, key=lambda r: (r[1], r[2]))


def test_chained_queries_simple(spark, tmp_path):
    runner = TransformRunner(
        spark,
        tmp_path,
        queries=[STEP1, STEP2, STEP3],
        vocab=DatasetVocabulary(event_time_column="order_time"),
    )
    o1 = str(tmp_path / "orders" / "o1.parquet")
    orders_slice(
        o1,
        [
            (0, 0, ts(16), ts(1), 1, 10),
            (1, 0, ts(16), ts(1), 2, 120),
            (2, 0, ts(16), ts(5), 3, 9),
            (3, 0, ts(16), ts(10), 4, 110),
            (4, 0, ts(16), ts(15), 5, 10),
        ],
    )
    s1 = str(tmp_path / "ship" / "s1.parquet")
    shipments_slice(
        s1,
        [
            (0, ts(17), ts(1), 1, 4),
            (1, ts(17), ts(2), 1, 6),
            (2, ts(17), ts(2), 2, 120),
            (3, ts(17), ts(6), 3, 5),
            (4, ts(17), ts(11), 4, 50),
            (5, ts(17), ts(13), 4, 60),
            (6, ts(17), ts(16), 5, 10),
        ],
    )
    resp, out = runner.run(
        [
            {"alias": "orders", "data_paths": [o1], "schema_file": o1, "watermark": ts(15)},
            {"alias": "shipments", "data_paths": [s1], "schema_file": s1, "watermark": ts(16)},
        ],
        system_time=ts(20),
    )
    assert resp.new_watermark == ts(13)
    assert (resp.new_offset_interval.start, resp.new_offset_interval.end) == (0, 1)
    assert _rows(out) == [
        (ts(20), ts(5), 3, 1, ts(6), ts(6), 9, 5),
        (ts(20), ts(10), 4, 1, ts(11), ts(11), 110, 50),
    ]


def test_chained_queries_tricky(spark, tmp_path):
    runner = TransformRunner(
        spark,
        tmp_path,
        queries=[STEP1, STEP2, STEP3],
        vocab=DatasetVocabulary(event_time_column="order_time"),
    )
    o1 = str(tmp_path / "orders" / "o1.parquet")
    orders_slice(
        o1,
        [
            (0, 0, ts(11), ts(1), 1, 10),
            (1, 0, ts(11), ts(1), 2, 120),
            (2, 0, ts(11), ts(5), 3, 9),
            (3, 0, ts(11), ts(10), 4, 110),
        ],
    )
    s1 = str(tmp_path / "ship" / "s1.parquet")
    shipments_slice(
        s1,
        [
            (0, ts(14), ts(1), 1, 4),
            (1, ts(14), ts(2), 1, 6),
            (2, ts(14), ts(2), 2, 120),
            (3, ts(14), ts(8), 3, 9),  # outside order 3's join interval
            (4, ts(14), ts(11), 4, 50),
            (5, ts(14), ts(13), 4, 60),  # outside order 4's join interval
        ],
    )
    resp, out = runner.run(
        [
            {"alias": "orders", "data_paths": [o1], "schema_file": o1, "watermark": ts(13)},
            {"alias": "shipments", "data_paths": [s1], "schema_file": s1, "watermark": ts(13)},
        ],
        system_time=ts(20),
    )
    assert (resp.new_offset_interval.start, resp.new_offset_interval.end) == (0, 1)
    assert resp.new_watermark == ts(11)
    assert _rows(out) == [
        (ts(20), ts(5), 3, 1, None, None, 9, 0),
        (ts(20), ts(10), 4, 1, ts(11), ts(11), 110, 50),
    ]


def test_chained_queries_multi_invocation(spark, tmp_path):
    """The same 3-step join -> TUMBLE agg -> filter pipeline run as THREE
    invocations where step 2 consumes a STATEFUL step-1 alias across runs:
    order #3 arrives in run 1 but its shipment only in run 2 (cross-run
    interval-join buffer), and the combined emissions must equal the
    reference's single-run golden rows (EngineJoinStreamToStreamTest.scala
    :230-353). Run 3 is a watermark-only advance whose flushed window is
    fully shipped and therefore filtered — data file absent."""
    import os

    runner = TransformRunner(
        spark,
        tmp_path,
        queries=[STEP1, STEP2, STEP3],
        vocab=DatasetVocabulary(event_time_column="order_time"),
    )
    o1 = str(tmp_path / "orders" / "o1.parquet")
    orders_slice(
        o1,
        [
            (0, 0, ts(6), ts(1), 1, 10),
            (1, 0, ts(6), ts(1), 2, 120),
            (2, 0, ts(6), ts(5), 3, 9),
        ],
    )
    s1 = str(tmp_path / "ship" / "s1.parquet")
    shipments_slice(
        s1,
        [
            (0, ts(6), ts(1), 1, 4),
            (1, ts(6), ts(2), 1, 6),
            (2, ts(6), ts(2), 2, 120),
        ],
    )
    resp1, out1 = runner.run(
        [
            {"alias": "orders", "data_paths": [o1], "schema_file": o1, "watermark": ts(6)},
            {"alias": "shipments", "data_paths": [s1], "schema_file": s1, "watermark": ts(6)},
        ],
        system_time=ts(20),
    )
    # Orders #1/#2 join+close in run 1 but are fully shipped -> filtered;
    # #3 stays in the join buffer (horizon ts(7) > wm ts(6)).
    assert resp1.new_offset_interval is None
    assert not os.path.exists(out1)
    assert resp1.new_watermark == ts(4)  # min input wm minus 2-day join lag

    o2 = str(tmp_path / "orders" / "o2.parquet")
    orders_slice(
        o2,
        [
            (3, 0, ts(16), ts(10), 4, 110),
            (4, 0, ts(16), ts(15), 5, 10),
        ],
    )
    s2 = str(tmp_path / "ship" / "s2.parquet")
    shipments_slice(
        s2,
        [
            (3, ts(16), ts(6), 3, 5),  # matches run-1's buffered order #3
            (4, ts(16), ts(11), 4, 50),
            (5, ts(16), ts(13), 4, 60),  # outside order #4's interval
            (6, ts(16), ts(16), 5, 10),
        ],
    )
    resp2, out2 = runner.run(
        [
            {"alias": "orders", "data_paths": [o2], "schema_file": o2, "watermark": ts(15)},
            {"alias": "shipments", "data_paths": [s2], "schema_file": s2, "watermark": ts(16)},
        ],
        system_time=ts(21),
    )
    assert (resp2.new_offset_interval.start, resp2.new_offset_interval.end) == (0, 1)
    assert resp2.new_watermark == ts(13)
    # The reference's golden rows, emitted across the run boundary.
    assert _rows(out2) == [
        (ts(21), ts(5), 3, 1, ts(6), ts(6), 9, 5),
        (ts(21), ts(10), 4, 1, ts(11), ts(11), 110, 50),
    ]

    # Run 3: watermark-only advance. Order #5 joins its ts(16) shipment,
    # the day-15 window closes, but 10 == 10 -> filtered; no data file.
    resp3, out3 = runner.run(
        [
            {"alias": "orders", "data_paths": [], "schema_file": o2, "watermark": ts(19)},
            {"alias": "shipments", "data_paths": [], "schema_file": s2, "watermark": ts(19)},
        ],
        system_time=ts(22),
    )
    assert resp3.new_offset_interval is None
    assert not os.path.exists(out3)
    assert resp3.new_watermark == ts(17)


CUM_STEP1 = (
    """SELECT
  o.event_time as event_time,
  o.order_id,
  o.quantity as quantity
FROM
  orders as o
JOIN shipments as s
ON
  o.order_id = s.order_id
  AND s.event_time BETWEEN o.event_time AND o.event_time + INTERVAL '2' HOUR""",
    "shipped_orders",
)
CUM_STEP2 = (
    """SELECT
  CUMULATE_START(event_time, INTERVAL '1' HOUR, INTERVAL '4' HOUR) as span_start,
  CUMULATE_END(event_time, INTERVAL '1' HOUR, INTERVAL '4' HOUR) as event_time,
  count(*) as n_orders,
  sum(quantity) as total_quantity
FROM shipped_orders
GROUP BY CUMULATE(event_time, INTERVAL '1' HOUR, INTERVAL '4' HOUR)""",
    None,
)


def _cum_rows(out_path):
    table = pq.read_table(out_path)
    return sorted(
        (
            r["span_start"].replace(tzinfo=timezone.utc),
            r["event_time"].replace(tzinfo=timezone.utc),
            r["n_orders"],
            r["total_quantity"],
        )
        for r in table.to_pylist()
    )


def test_chained_join_into_cumulate_across_runs(spark, tmp_path):
    """A stateful interval join feeding a stateful CUMULATE aggregation
    across invocations: run 2's matched order merges into the span's
    still-open cumulative windows built from run 1's step partials."""
    runner = TransformRunner(spark, tmp_path, queries=[CUM_STEP1, CUM_STEP2])
    o1 = str(tmp_path / "orders" / "o1.parquet")
    orders_slice(
        o1,
        [
            (0, 0, ts(6), ts(1, 0, 30), 1, 10),
            (1, 0, ts(6), ts(1, 1, 30), 2, 20),
        ],
    )
    s1 = str(tmp_path / "ship" / "s1.parquet")
    shipments_slice(
        s1,
        [
            (0, ts(6), ts(1, 0, 45), 1, 1),
            (1, ts(6), ts(1, 1, 45), 2, 1),
        ],
    )
    resp1, out1 = runner.run(
        [
            {"alias": "orders", "data_paths": [o1], "schema_file": o1, "watermark": ts(1, 4)},
            {"alias": "shipments", "data_paths": [s1], "schema_file": s1, "watermark": ts(1, 4)},
        ],
        system_time=ts(20),
    )
    # Join output wm = 04:00 - 2h = 02:00 -> cumulative ends 01:00, 02:00.
    assert resp1.new_watermark == ts(1, 2)
    assert _cum_rows(out1) == [
        (ts(1), ts(1, 1), 1, 10),
        (ts(1), ts(1, 2), 2, 30),
    ]

    o2 = str(tmp_path / "orders" / "o2.parquet")
    orders_slice(o2, [(2, 0, ts(16), ts(1, 2, 30), 3, 30)])
    s2 = str(tmp_path / "ship" / "s2.parquet")
    shipments_slice(s2, [(2, ts(16), ts(1, 3), 3, 1)])
    resp2, out2 = runner.run(
        [
            {"alias": "orders", "data_paths": [o2], "schema_file": o2, "watermark": ts(1, 6)},
            {"alias": "shipments", "data_paths": [s2], "schema_file": s2, "watermark": ts(1, 6)},
        ],
        system_time=ts(21),
    )
    # Join wm advances to 04:00 -> ends 03:00 and 04:00 flush, merging the
    # run-1 step partials with run-2's order #3.
    assert resp2.new_watermark == ts(1, 4)
    assert _cum_rows(out2) == [
        (ts(1), ts(1, 3), 3, 60),
        (ts(1), ts(1, 4), 3, 60),
    ]


def test_cascaded_window_aggs_via_rowtime(spark, tmp_path):
    """Flink's cascading-windows idiom: an hourly TUMBLE whose
    TUMBLE_ROWTIME (window end - 1ms, a timestamp INSIDE the window)
    feeds a daily TUMBLE in the next step. Cross-invocation: hourly
    windows close under the first watermark, the daily rollup only when
    the day passes."""
    from .helpers import ticker_slice

    HOURLY = (
        """SELECT
  TUMBLE_ROWTIME(event_time, INTERVAL '1' HOUR) as event_time,
  symbol,
  sum(price) as hourly_total
FROM tickers GROUP BY TUMBLE(event_time, INTERVAL '1' HOUR), symbol""",
        "hourly",
    )
    DAILY = (
        """SELECT
  TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
  symbol,
  count(*) as n_hours,
  sum(hourly_total) as daily_total
FROM hourly GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), symbol""",
        None,
    )
    runner = TransformRunner(spark, tmp_path, queries=[HOURLY, DAILY])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(3), ts(1, 1, 10), "A", 10),
            (1, 0, ts(3), ts(1, 1, 40), "A", 20),
            (2, 0, ts(3), ts(1, 5, 15), "A", 5),
        ],
    )
    # Watermark passes mid-day-1: hourly windows 1h and 5h close, but the
    # day-1 window stays open -> no output rows yet.
    resp, out = runner.run(
        [{"alias": "tickers", "data_paths": [s1], "schema_file": s1, "watermark": ts(1, 8)}],
        system_time=ts(3),
    )
    assert resp.new_offset_interval is None

    # Day rolls over: the daily window closes, rolling up BOTH hourly rows.
    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(s2, [(3, 0, ts(4), ts(2, 3, 0), "A", 100)])
    resp, out = runner.run(
        [{"alias": "tickers", "data_paths": [s2], "schema_file": s2, "watermark": ts(2, 6)}],
        system_time=ts(4),
    )
    rows = [
        (r["event_time"].replace(tzinfo=timezone.utc), r["symbol"], r["n_hours"], r["daily_total"])
        for r in pq.read_table(out).to_pylist()
    ]
    assert rows == [(ts(1), "A", 2, 35)]
