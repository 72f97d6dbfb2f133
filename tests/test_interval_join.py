"""Stream-to-stream interval join parity — mirrors
EngineJoinStreamToStreamTest.scala:88-230 (basic LEFT join scenario).

Covers: immediate match emission, cross-invocation matching via persisted
join buffers, NULL-padding on watermark horizon, output watermark lag
(= min(input wms) - upper bound).
"""

from datetime import timezone

import pyarrow as pa
import pyarrow.parquet as pq

from .helpers import TransformRunner, ts, write_input_slice

JOIN_QUERY = """SELECT
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
  AND s.event_time BETWEEN o.event_time AND o.event_time + INTERVAL '2' DAY"""


def orders_slice(path, rows):
    """rows: (offset, op, system_time, event_time, order_id, quantity)"""
    cols = list(zip(*rows))
    write_input_slice(
        path,
        {
            "offset": list(cols[0]),
            "op": list(cols[1]),
            "system_time": list(cols[2]),
            "event_time": list(cols[3]),
            "order_id": list(cols[4]),
            "quantity": list(cols[5]),
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "order_id": pa.int64(),
            "quantity": pa.int64(),
        },
    )


def shipments_slice(path, rows):
    """rows: (offset, system_time, event_time, order_id, num_shipped)"""
    cols = list(zip(*rows))
    write_input_slice(
        path,
        {
            "offset": list(cols[0]),
            "op": [0] * len(rows),
            "system_time": list(cols[1]),
            "event_time": list(cols[2]),
            "order_id": list(cols[3]),
            "num_shipped": list(cols[4]),
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "order_id": pa.int64(),
            "num_shipped": pa.int64(),
        },
    )


def _rows(out_path):
    table = pq.read_table(out_path)
    rows = [
        (
            r["system_time"].replace(tzinfo=timezone.utc),
            r["order_time"].replace(tzinfo=timezone.utc),
            r["order_id"],
            r["order_quantity"],
            r["shipped_time"].replace(tzinfo=timezone.utc) if r["shipped_time"] else None,
            r["shipped_quantity"],
        )
        for r in table.to_pylist()
    ]
    return sorted(rows, key=lambda r: (r[1], r[2], r[4] or ts(1)))


def test_stream_to_stream_join_basic(spark, tmp_path):
    runner = TransformRunner(
        spark,
        tmp_path,
        queries=[(JOIN_QUERY, None)],
        vocab=__import__(
            "kamu_engine_flink_spark.protocol.model", fromlist=["DatasetVocabulary"]
        ).DatasetVocabulary(event_time_column="order_time"),
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
    shipments_slice(s1, [(0, ts(3), ts(1), 1, 4), (1, ts(3), ts(2), 1, 6), (2, ts(3), ts(2), 2, 120)])

    resp, out = runner.run(
        [
            {"alias": "orders", "data_paths": [o1], "schema_file": o1, "watermark": ts(5)},
            {"alias": "shipments", "data_paths": [s1], "schema_file": s1, "watermark": ts(2)},
        ],
        system_time=ts(10),
    )
    assert (resp.new_offset_interval.start, resp.new_offset_interval.end) == (0, 2)
    assert _rows(out) == [
        (ts(10), ts(1), 1, 10, ts(1), 4),
        (ts(10), ts(1), 1, 10, ts(2), 6),
        (ts(10), ts(1), 2, 120, ts(2), 120),
    ]

    # Run 2: order 3's shipment arrives too late (outside the interval) ->
    # NULL-padded once the horizon passes; order 4 matches across slices.
    o2 = str(tmp_path / "orders" / "o2.parquet")
    orders_slice(o2, [(3, 0, ts(11), ts(10), 4, 110)])
    s2 = str(tmp_path / "ship" / "s2.parquet")
    shipments_slice(s2, [(3, ts(12), ts(8), 3, 9), (4, ts(12), ts(11), 4, 110)])

    runner.next_offset = 3
    resp, out = runner.run(
        [
            {"alias": "orders", "data_paths": [o2], "schema_file": o2, "watermark": ts(10)},
            {"alias": "shipments", "data_paths": [s2], "schema_file": s2, "watermark": ts(11)},
        ],
        system_time=ts(20),
    )
    assert (resp.new_offset_interval.start, resp.new_offset_interval.end) == (3, 4)
    assert resp.new_watermark == ts(8)
    assert _rows(out) == [
        (ts(20), ts(5), 3, 9, None, 0),
        (ts(20), ts(10), 4, 110, ts(11), 110),
    ]
