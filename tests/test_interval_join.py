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


MIRRORED_QUERY = """SELECT
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
  AND o.event_time BETWEEN s.event_time AND s.event_time + INTERVAL '2' DAY"""


def test_mirrored_between_keeps_right_rows_for_future_lefts(spark, tmp_path):
    """`l.et BETWEEN r.et AND r.et + I` flips the window to
    right.et in [left.et - I, left.et]: a buffered shipment must survive
    wm_l past ITS event time (until wm_l > et + I), because later orders
    inside the interval still match it."""
    from kamu_engine_flink_spark.protocol.model import DatasetVocabulary

    runner = TransformRunner(
        spark,
        tmp_path,
        queries=[(MIRRORED_QUERY, None)],
        vocab=DatasetVocabulary(event_time_column="order_time"),
    )
    s_o1 = str(tmp_path / "in" / "o1.parquet")
    s_s1 = str(tmp_path / "in" / "s1.parquet")
    # Run 1: one shipment at day 10, no orders yet (the o1 file only
    # donates its schema — data_paths stays empty); orders watermark
    # advances to day 11 — PAST the shipment's event time.
    orders_slice(s_o1, [(0, 0, ts(1), ts(1), 999, 0)])
    shipments_slice(s_s1, [(0, ts(14), ts(10), 7, 70)])
    runner.run(
        [
            {"alias": "orders", "data_paths": [], "schema_file": s_o1, "watermark": ts(11)},
            {"alias": "shipments", "data_paths": [s_s1], "schema_file": s_s1, "watermark": ts(11)},
        ],
        system_time=ts(20),
    )
    # Run 2: an order at day 11.5 — inside [10, 12], must match the
    # buffered shipment (the old purge rule deleted it at wm_l=11 > 10).
    s_o2 = str(tmp_path / "in" / "o2.parquet")
    orders_slice(s_o2, [(0, 0, ts(21), ts(11, 12), 7, 5)])
    resp2, out2 = runner.run(
        [
            {"alias": "orders", "data_paths": [s_o2], "schema_file": s_o2, "watermark": ts(14)},
            {"alias": "shipments", "data_paths": [], "schema_file": s_s1, "watermark": ts(14)},
        ],
        system_time=ts(21),
    )
    got = _rows(out2)
    assert [(r[2], r[3], r[4], r[5]) for r in got] == [(7, 5, ts(10), 70)]


def test_temporal_join_holds_probes_without_build_watermark(spark, tmp_path):
    """A temporal-table input with NO watermark must hold every probe row
    (its version history is not final) — releasing and dropping them
    loses joins forever. The probe matches once the build watermark
    arrives in a later run."""
    from .helpers import write_input_slice

    def tickers_slice(path, rows):
        cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
        write_input_slice(
            path,
            {
                "offset": list(cols[0]), "op": list(cols[1]),
                "system_time": list(cols[2]), "event_time": list(cols[3]),
                "symbol": list(cols[4]), "price": list(cols[5]),
            },
            {
                "offset": pa.int64(), "op": pa.int32(),
                "system_time": pa.timestamp("ms", tz="UTC"),
                "event_time": pa.timestamp("ms", tz="UTC"),
                "symbol": pa.string(), "price": pa.int64(),
            },
        )

    QUERY = """SELECT
      t.event_time as event_time, t.symbol, t.price, o.volume as volume
    FROM tickers as t
    JOIN owned FOR SYSTEM_TIME AS OF t.event_time AS o
    ON t.symbol = o.symbol"""

    def owned_slice(path, rows):
        cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
        write_input_slice(
            path,
            {
                "offset": list(cols[0]), "op": list(cols[1]),
                "system_time": list(cols[2]), "event_time": list(cols[3]),
                "symbol": list(cols[4]), "volume": list(cols[5]),
            },
            {
                "offset": pa.int64(), "op": pa.int32(),
                "system_time": pa.timestamp("ms", tz="UTC"),
                "event_time": pa.timestamp("ms", tz="UTC"),
                "symbol": pa.string(), "volume": pa.int64(),
            },
        )

    runner = TransformRunner(
        spark, tmp_path, queries=[(QUERY, None)], temporal_tables=[("owned", "symbol")]
    )
    t1 = str(tmp_path / "in" / "t1.parquet")
    o1 = str(tmp_path / "in" / "o1.parquet")
    tickers_slice(t1, [(0, 0, ts(5), ts(2), "A", 100)])
    owned_slice(o1, [])
    # Run 1: probe watermark day 3, temporal table has NO watermark —
    # nothing may release.
    resp1, out1 = runner.run(
        [
            {"alias": "tickers", "data_paths": [t1], "schema_file": t1, "watermark": ts(3)},
            {"alias": "owned", "data_paths": [], "schema_file": o1},
        ],
        system_time=ts(10),
    )
    assert out1 is None or not __import__("os").path.exists(out1) or \
        pq.read_table(out1).num_rows == 0
    # Run 2: the version (day 1) plus a build watermark arrive — the
    # buffered probe must now join it.
    o2 = str(tmp_path / "in" / "o2.parquet")
    owned_slice(o2, [(0, 0, ts(11), ts(1), "A", 42)])
    resp2, out2 = runner.run(
        [
            {"alias": "tickers", "data_paths": [], "schema_file": t1, "watermark": ts(3)},
            {"alias": "owned", "data_paths": [o2], "schema_file": o2, "watermark": ts(3)},
        ],
        system_time=ts(11),
    )
    rows = pq.read_table(out2).to_pylist()
    assert [(r["symbol"], r["price"], r["volume"]) for r in rows] == [("A", 100, 42)]


RIGHT_JOIN_QUERY = """SELECT
  s.event_time as event_time,
  s.order_id as order_id,
  s.num_shipped,
  o.quantity as order_quantity
FROM
  orders as o
RIGHT JOIN shipments as s
ON
  o.order_id = s.order_id
  AND s.event_time BETWEEN o.event_time AND o.event_time + INTERVAL '2' DAY"""

FULL_JOIN_QUERY = """SELECT
  COALESCE(o.event_time, s.event_time) as event_time,
  COALESCE(o.order_id, s.order_id) as order_id,
  o.quantity as order_quantity,
  s.num_shipped
FROM
  orders as o
FULL OUTER JOIN shipments as s
ON
  o.order_id = s.order_id
  AND s.event_time BETWEEN o.event_time AND o.event_time + INTERVAL '2' DAY"""


def test_right_outer_interval_join(spark, tmp_path):
    """RIGHT JOIN: every shipment emits — matched immediately, unmatched
    NULL-padded once the ORDERS watermark proves no order can still
    arrive (wm_l > s.event_time - lower); cross-run left buffer still
    matches a later shipment."""
    runner = TransformRunner(spark, tmp_path, queries=[(RIGHT_JOIN_QUERY, None)])
    o1 = str(tmp_path / "o1.parquet")
    s1 = str(tmp_path / "s1.parquet")
    orders_slice(o1, [(0, 0, ts(5), ts(1), 1, 10)])
    shipments_slice(s1, [(0, ts(5), ts(2), 1, 4), (1, ts(5), ts(2), 99, 7)])
    resp, out = runner.run(
        [
            {"alias": "orders", "data_paths": [o1], "schema_file": o1, "watermark": ts(4)},
            {"alias": "shipments", "data_paths": [s1], "schema_file": s1, "watermark": ts(2)},
        ],
        system_time=ts(6),
    )
    rows = [
        (r["offset"], r["event_time"].replace(tzinfo=timezone.utc), r["order_id"],
         r["num_shipped"], r["order_quantity"])
        for r in pq.read_table(out).to_pylist()
    ]
    assert sorted(rows) == [
        (0, ts(2), 1, 4, 10),
        (1, ts(2), 99, 7, None),  # no order 99: padded at horizon
    ]

    # Run 2: a shipment for the STILL-BUFFERED order 1 matches across runs.
    s2 = str(tmp_path / "s2.parquet")
    shipments_slice(s2, [(2, ts(7), ts(2, 12), 1, 6)])
    resp2, out2 = runner.run(
        [
            {"alias": "orders", "data_paths": [], "schema_file": o1, "watermark": ts(8)},
            {"alias": "shipments", "data_paths": [s2], "schema_file": s2, "watermark": ts(8)},
        ],
        system_time=ts(9),
    )
    rows2 = [
        (r["event_time"].replace(tzinfo=timezone.utc), r["order_id"],
         r["num_shipped"], r["order_quantity"])
        for r in pq.read_table(out2).to_pylist()
    ]
    assert rows2 == [(ts(2, 12), 1, 6, 10)]


def test_full_outer_interval_join(spark, tmp_path):
    """FULL OUTER: unmatched rows on BOTH sides pad at their horizons."""
    runner = TransformRunner(spark, tmp_path, queries=[(FULL_JOIN_QUERY, None)])
    o1 = str(tmp_path / "o1.parquet")
    s1 = str(tmp_path / "s1.parquet")
    orders_slice(o1, [(0, 0, ts(5), ts(1), 1, 10), (1, 0, ts(5), ts(1), 2, 20)])
    shipments_slice(s1, [(0, ts(5), ts(2), 1, 4), (1, ts(5), ts(2), 99, 7)])
    resp, out = runner.run(
        [
            {"alias": "orders", "data_paths": [o1], "schema_file": o1, "watermark": ts(6)},
            {"alias": "shipments", "data_paths": [s1], "schema_file": s1, "watermark": ts(6)},
        ],
        system_time=ts(7),
    )
    rows = [
        (r["event_time"].replace(tzinfo=timezone.utc), r["order_id"],
         r["order_quantity"], r["num_shipped"])
        for r in pq.read_table(out).to_pylist()
    ]
    # order 1 matched; order 2 padded (wm_s=6 > et+2d=3); shipment 99
    # padded (wm_o=6 > et=2).
    assert sorted(rows) == [
        (ts(1), 1, 10, 4),
        (ts(1), 2, 20, None),
        (ts(2), 99, None, 7),
    ]


CMP_SPELLED_QUERY = """SELECT
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
  AND s.event_time >= o.event_time
  AND s.event_time <= o.event_time + INTERVAL '2' DAY"""


def test_comparison_spelled_interval_join_matches_between(spark, tmp_path):
    """Flink's comparison spelling (`r.t >= l.t AND r.t <= l.t + I`) must
    run as the SAME stateful interval join as the BETWEEN form — buffers,
    NULL-pad horizon, cross-run matching, output watermark lag — not fall
    through to a stateless per-slice join."""
    from kamu_engine_flink_spark.plans.classify import classify, parse_interval_join

    views = {"orders", "shipments"}
    assert classify(CMP_SPELLED_QUERY, views) == "interval_join"
    spec = parse_interval_join(CMP_SPELLED_QUERY, views)
    assert (spec.lower.total_seconds(), spec.upper.total_seconds()) == (0, 2 * 86400)

    vocab = __import__(
        "kamu_engine_flink_spark.protocol.model", fromlist=["DatasetVocabulary"]
    ).DatasetVocabulary(event_time_column="order_time")
    runner = TransformRunner(spark, tmp_path, queries=[(CMP_SPELLED_QUERY, None)], vocab=vocab)

    o1 = str(tmp_path / "orders" / "o1.parquet")
    orders_slice(o1, [(0, 0, ts(6), ts(1), 1, 10), (1, 0, ts(6), ts(1), 2, 120), (2, 0, ts(6), ts(5), 3, 9)])
    s1 = str(tmp_path / "ship" / "s1.parquet")
    shipments_slice(s1, [(0, ts(3), ts(1), 1, 4), (1, ts(3), ts(2), 1, 6), (2, ts(3), ts(2), 2, 120)])
    resp, out = runner.run(
        [
            {"alias": "orders", "data_paths": [o1], "schema_file": o1, "watermark": ts(5)},
            {"alias": "shipments", "data_paths": [s1], "schema_file": s1, "watermark": ts(2)},
        ],
        system_time=ts(10),
    )
    assert _rows(out) == [
        (ts(10), ts(1), 1, 10, ts(1), 4),
        (ts(10), ts(1), 1, 10, ts(2), 6),
        (ts(10), ts(1), 2, 120, ts(2), 120),
    ]

    # Cross-run: order 3's late shipment misses the window -> NULL-pad;
    # order 4 matches across slices — identical to the BETWEEN scenario.
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
    assert resp.new_watermark == ts(8)
    assert _rows(out) == [
        (ts(20), ts(5), 3, 9, None, 0),
        (ts(20), ts(10), 4, 110, ts(11), 110),
    ]


SIGNED_BETWEEN_QUERY = """SELECT
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
  AND s.event_time BETWEEN o.event_time - INTERVAL '1' DAY AND o.event_time + INTERVAL '1' DAY"""


def test_signed_between_lower_bound_keeps_preceding_rows(spark, tmp_path):
    """`BETWEEN o.et - I1 AND o.et + I2`: a shipment arriving BEFORE its
    order (within I1) must survive in the right buffer past the left
    watermark and match the order when it arrives next run — the
    lower=-I1 eviction rule (purging at r.et < wm_l would drop it)."""
    from kamu_engine_flink_spark.plans.classify import parse_interval_join

    spec = parse_interval_join(SIGNED_BETWEEN_QUERY, {"orders", "shipments"})
    assert (spec.lower.total_seconds(), spec.upper.total_seconds()) == (-86400, 86400)

    vocab = __import__(
        "kamu_engine_flink_spark.protocol.model", fromlist=["DatasetVocabulary"]
    ).DatasetVocabulary(event_time_column="order_time")
    runner = TransformRunner(
        spark, tmp_path, queries=[(SIGNED_BETWEEN_QUERY, None)], vocab=vocab
    )
    # Run 1: the shipment exists, its order does not yet. Watermarks pass
    # the shipment's own event time.
    o1 = str(tmp_path / "orders" / "o1.parquet")
    orders_slice(o1, [(0, 0, ts(3), ts(1), 9, 1)])  # unrelated order
    s1 = str(tmp_path / "ship" / "s1.parquet")
    shipments_slice(s1, [(0, ts(3), ts(2), 7, 5)])
    resp, out = runner.run(
        [
            {"alias": "orders", "data_paths": [o1], "schema_file": o1, "watermark": ts(2, 12)},
            {"alias": "shipments", "data_paths": [s1], "schema_file": s1, "watermark": ts(2, 12)},
        ],
        system_time=ts(10),
    )
    # Run 2: order 7 arrives with event time one day AFTER its shipment —
    # inside the [-1d, +1d] window. The buffered shipment must pair.
    o2 = str(tmp_path / "orders" / "o2.parquet")
    orders_slice(o2, [(1, 0, ts(4), ts(3), 7, 70)])
    runner.next_offset = resp.new_offset_interval.end + 1 if resp.new_offset_interval else 0
    resp2, out2 = runner.run(
        [
            {"alias": "orders", "data_paths": [o2], "schema_file": o2, "watermark": ts(5)},
            {"alias": "shipments", "data_paths": [], "schema_file": s1, "watermark": ts(5)},
        ],
        system_time=ts(11),
    )
    rows = [
        (r["order_id"], r["shipped_time"].replace(tzinfo=timezone.utc), r["shipped_quantity"])
        for r in pq.read_table(out2).to_pylist()
        if r["order_id"] == 7
    ]
    assert rows == [(7, ts(2), 5)]
