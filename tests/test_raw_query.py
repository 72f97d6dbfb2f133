"""Raw-query parity — mirrors EngineRawQueryTest.scala:17-74 and
EngineFormatsTest.scala:38-147 (decimal round-trips via TRY_CAST).
"""

import os
from datetime import timezone
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq

from kamu_engine_flink_spark.engine.raw_query import execute_raw_query
from kamu_engine_flink_spark.protocol.model import (
    RawQueryRequest,
    SqlQueryStep,
    Transform,
)

from .helpers import ticker_slice, ts


def _raw(spark, tmp_path, query, in_path, out_name="out.parquet"):
    out = str(tmp_path / out_name)
    request = RawQueryRequest(
        input_data_paths=[in_path],
        transform=Transform(queries=[SqlQueryStep(query=query)]),
        output_data_path=out,
    )
    return execute_raw_query(spark, request), out


def test_raw_query_simple(spark, tmp_path):
    in_path = str(tmp_path / "input.parquet")
    ticker_slice(
        in_path,
        [
            (0, 0, ts(5), ts(1), "A", 10),
            (1, 0, ts(5), ts(2), "B", 20),
            (2, 0, ts(5), ts(3), "A", 11),
            (3, 0, ts(5), ts(4), "B", 21),
        ],
    )
    query = """SELECT
  `offset`,
  `system_time`,
  `op`,
  `event_time`,
  `symbol`,
  `price` * 10 as `price`
FROM input"""
    resp, out = _raw(spark, tmp_path, query, in_path)
    assert resp.num_records == 4
    rows = [
        (r["offset"], r["symbol"], r["price"], r["event_time"].replace(tzinfo=timezone.utc))
        for r in pq.read_table(out).to_pylist()
    ]
    assert sorted(rows) == [
        (0, "A", 100, ts(1)),
        (1, "B", 200, ts(2)),
        (2, "A", 110, ts(3)),
        (3, "B", 210, ts(4)),
    ]


def test_raw_query_write_decimal(spark, tmp_path):
    """TRY_CAST to DECIMAL: overflow -> NULL; spec-compliant decimal output
    (the reference writes non-standard binary decimals Spark can't read —
    README 'Known Issues'; we write FIXED_LEN_BYTE_ARRAY natively)."""
    in_path = str(tmp_path / "in.parquet")
    values = [
        "123456789.0123",
        "-123456789.0123",
        "12345678901234567890.123456789012345678",
        "-12345678901234567890.123456789012345678",
    ]
    pq.write_table(pa.table({"value": pa.array(values, pa.string())}), in_path)
    query = """SELECT
  TRY_CAST(`value` as DECIMAL(13,4)) as decimal_13_4,
  TRY_CAST(`value` as DECIMAL(38,18)) as decimal_38_18
FROM `input`"""
    resp, out = _raw(spark, tmp_path, query, in_path)
    assert resp.num_records == 4
    table = pq.read_table(out)
    assert str(table.schema.field("decimal_13_4").type) == "decimal128(13, 4)"
    assert str(table.schema.field("decimal_38_18").type) == "decimal128(38, 18)"
    got = [(r["decimal_13_4"], r["decimal_38_18"]) for r in table.to_pylist()]
    assert got == [
        (Decimal("123456789.0123"), Decimal("123456789.012300000000000000")),
        (Decimal("-123456789.0123"), Decimal("-123456789.012300000000000000")),
        (None, Decimal("12345678901234567890.123456789012345678")),
        (None, Decimal("-12345678901234567890.123456789012345678")),
    ]


def test_raw_query_read_decimal(spark, tmp_path):
    in_path = str(tmp_path / "in.parquet")
    pq.write_table(
        pa.table({"decimal": pa.array([Decimal("123456789.0123")], pa.decimal128(20, 4))}),
        in_path,
    )
    resp, out = _raw(
        spark, tmp_path, "SELECT cast(`decimal` as string) as `value` FROM `input`", in_path
    )
    assert resp.num_records == 1
    assert pq.read_table(out).to_pylist() == [{"value": "123456789.0123"}]


def test_raw_query_multi_step(spark, tmp_path):
    """Chained aliased steps in raw-query mode (RawQueryEngine.scala:138-149)."""
    in_path = str(tmp_path / "input.parquet")
    ticker_slice(in_path, [(0, 0, ts(5), ts(1), "A", 10), (1, 0, ts(5), ts(2), "B", 20)])
    out = str(tmp_path / "out.parquet")
    request = RawQueryRequest(
        input_data_paths=[in_path],
        transform=Transform(
            queries=[
                SqlQueryStep(query="SELECT symbol, price * 2 as p2 FROM input", alias="doubled"),
                SqlQueryStep(query="SELECT symbol, p2 + 1 as p FROM doubled"),
            ]
        ),
        output_data_path=out,
    )
    resp = execute_raw_query(spark, request)
    assert resp.num_records == 2
    assert sorted([(r["symbol"], r["p"]) for r in pq.read_table(out).to_pylist()]) == [
        ("A", 21),
        ("B", 41),
    ]


def test_raw_query_hop_window_sql(spark, tmp_path):
    """Flink HOP() spelling (beyond-reference: the reference supports only
    TUMBLE) rewrites to Spark's sliding window(); each event lands in
    size/slide overlapping windows."""
    in_path = str(tmp_path / "hop_in.parquet")
    ticker_slice(
        in_path,
        [
            (0, 0, ts(5), ts(1, 5, 30), "A", 10),
            (1, 0, ts(5), ts(1, 6, 30), "A", 14),
        ],
    )
    resp, out = _raw(
        spark,
        tmp_path,
        "SELECT HOP_START(event_time, INTERVAL '1' HOUR, INTERVAL '2' HOUR) AS ws, "
        "count(*) AS n, max(price) AS max_price FROM input "
        "GROUP BY HOP(event_time, INTERVAL '1' HOUR, INTERVAL '2' HOUR)",
        in_path,
        "hop_out.parquet",
    )
    rows = sorted(
        (r.ws.replace(tzinfo=timezone.utc), r.n, r.max_price)
        for r in spark.read.parquet(out).collect()
    )
    # 05:30 -> [04,06) [05,07); 06:30 -> [05,07) [06,08)
    assert rows == [
        (ts(1, 4), 1, 10),
        (ts(1, 5), 2, 14),
        (ts(1, 6), 1, 14),
    ]
    assert resp.num_records == 3


def test_raw_query_session_window_sql(spark, tmp_path):
    """Flink SESSION() spelling -> Spark session_window(): events within
    the gap merge into one session; a gap splits sessions."""
    in_path = str(tmp_path / "sess_in.parquet")
    ticker_slice(
        in_path,
        [
            (0, 0, ts(5), ts(1, 1, 0), "A", 10),
            (1, 0, ts(5), ts(1, 1, 20), "A", 12),
            (2, 0, ts(5), ts(1, 9, 0), "A", 30),
        ],
    )
    resp, out = _raw(
        spark,
        tmp_path,
        "SELECT SESSION_START(event_time, INTERVAL '30' MINUTE) AS s, "
        "SESSION_END(event_time, INTERVAL '30' MINUTE) AS e, "
        "count(*) AS n FROM input "
        "GROUP BY SESSION(event_time, INTERVAL '30' MINUTE), symbol",
        in_path,
        "sess_out.parquet",
    )
    rows = sorted(
        ((r.e - r.s).total_seconds() / 60, r.n)
        for r in spark.read.parquet(out).collect()
    )
    # burst 01:00-01:20 -> one 50-minute session (end = last + gap);
    # lone 09:00 event -> one 30-minute session.
    assert rows == [(30.0, 1), (50.0, 2)]
    assert resp.num_records == 2
def test_pre_epoch_nanos_floor_to_micros(spark, tmp_path):
    """ns->us conversion must FLOOR (DuckDB parity), not truncate toward
    zero: -500ns is 1969-12-31T23:59:59.999999, not 1970-01-01T00:00:00."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kamu_engine_flink_spark.sources.parquet import read_parquet_slices

    path = str(tmp_path / "ns.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([-500, 500, -1500], type=pa.timestamp("ns")),
                  "i": pa.array([1, 2, 3], type=pa.int64())}),
        path,
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,
    )
    got = {r.i: r.ts for r in read_parquet_slices(spark, [path]).collect()}
    from datetime import datetime

    assert got[2] == datetime(1970, 1, 1, 0, 0, 0)          # +500ns floors to 0us
    assert got[1] == datetime(1969, 12, 31, 23, 59, 59, 999999)  # -500ns floors DOWN
    assert got[3] == datetime(1969, 12, 31, 23, 59, 59, 999998)  # -1500ns -> -2us


def test_raw_query_cumulate(spark, tmp_path):
    """CUMULATE through the raw-query entry point (the batch dialect
    rewrite): hourly cumulative windows within a 2-hour span."""
    in_path = str(tmp_path / "input.parquet")
    ticker_slice(
        in_path,
        [
            (0, 0, ts(5), ts(1, 0, 10), "A", 10),
            (1, 0, ts(5), ts(1, 0, 40), "A", 14),
            (2, 0, ts(5), ts(1, 1, 20), "A", 30),
        ],
    )
    query = """SELECT
  CUMULATE_START(event_time, INTERVAL '1' HOUR, INTERVAL '2' HOUR) as span_start,
  CUMULATE_END(event_time, INTERVAL '1' HOUR, INTERVAL '2' HOUR) as span_end,
  symbol,
  sum(price) as total
FROM input
GROUP BY CUMULATE(event_time, INTERVAL '1' HOUR, INTERVAL '2' HOUR), symbol"""
    resp, out = _raw(spark, tmp_path, query, in_path)
    assert resp.num_records == 2
    rows = sorted(
        (
            r["span_start"].replace(tzinfo=timezone.utc),
            r["span_end"].replace(tzinfo=timezone.utc),
            r["symbol"],
            r["total"],
        )
        for r in pq.read_table(out).to_pylist()
    )
    assert rows == [
        (ts(1), ts(1, 1), "A", 24),  # first hour: 10 + 14
        (ts(1), ts(1, 2), "A", 54),  # full span: + 30
    ]


def test_raw_query_match_recognize(spark, tmp_path):
    """MATCH_RECOGNIZE routes to the bounded matcher (Spark has no native
    row-pattern support); the input's ODF offset is the total order."""
    in_path = str(tmp_path / "input.parquet")
    ticker_slice(
        in_path,
        [
            (0, 0, ts(5), ts(1), "A", 5),
            (1, 0, ts(5), ts(2), "A", 20),
            (2, 0, ts(5), ts(3), "A", 120),
            (3, 0, ts(5), ts(4), "A", 7),
        ],
    )
    query = """select * from input
MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY event_time
  MEASURES A.price AS dip, C.price AS spike, COUNT(B.*) AS n_mid
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B* C)
  DEFINE A AS A.price < 10, B AS B.price >= 10 AND B.price < 100, C AS C.price >= 100
)"""
    resp, out = _raw(spark, tmp_path, query, in_path)
    assert resp.num_records == 1
    rows = pq.read_table(out).to_pylist()
    assert [(r["symbol"], r["dip"], r["spike"], r["n_mid"]) for r in rows] == [
        ("A", 5, 120, 1)
    ]


def test_raw_query_unnest(spark, tmp_path):
    """UNNEST works on the raw-query (batch) path too — the same dialect
    rewrite to LATERAL VIEW explode (plans/dialect._rewrite_unnest)."""
    in_path = str(tmp_path / "input.parquet")
    ticker_slice(
        in_path,
        [(0, 0, ts(5), ts(1), "AB", 10.0), (1, 0, ts(5), ts(2), "C", 20.0)],
    )
    query = (
        "SELECT event_time, symbol, u.ch AS ch FROM input "
        "CROSS JOIN UNNEST(split(symbol, '')) AS u (ch)"
    )
    resp, out = _raw(spark, tmp_path, query, in_path)
    assert resp.num_records == 3
    rows = sorted(
        (r["symbol"], r["ch"]) for r in pq.read_table(out).to_pylist()
    )
    assert rows == [("AB", "A"), ("AB", "B"), ("C", "C")]


def test_raw_query_unnest_map(spark, tmp_path):
    """UNNEST over a MAP column on the raw-query path: the two-column
    alias resolves the input view's schema and emits explode(map) —
    (key, value) rows; empty maps drop under the inner form."""
    import pyarrow as pa

    from .helpers import write_input_slice

    in_path = str(tmp_path / "input.parquet")
    write_input_slice(
        in_path,
        {
            "event_time": [ts(1), ts(2)],
            "symbol": ["A", "B"],
            "attrs": [[("x", 1), ("y", 2)], []],
        },
        {
            "event_time": pa.timestamp("ms", tz="UTC"),
            "symbol": pa.string(),
            "attrs": pa.map_(pa.string(), pa.int64()),
        },
    )
    query = (
        "SELECT event_time, symbol, u.k AS k, u.v AS v FROM input "
        "CROSS JOIN UNNEST(attrs) AS u (k, v)"
    )
    resp, out = _raw(spark, tmp_path, query, in_path)
    assert resp.num_records == 2
    rows = sorted(
        (r["symbol"], r["k"], r["v"]) for r in pq.read_table(out).to_pylist()
    )
    assert rows == [("A", "x", 1), ("A", "y", 2)]


def test_raw_query_mixed_setop_chain(spark, tmp_path):
    """Mixed set-operator chains on the raw-query (batch) path pass
    straight through to Spark SQL with standard precedence — one bounded
    input, no decomposition needed."""
    in_path = str(tmp_path / "input.parquet")
    ticker_slice(
        in_path,
        [
            (0, 0, ts(5), ts(1), "A", 10.0),
            (1, 0, ts(5), ts(2), "B", 30.0),
            (2, 0, ts(5), ts(3), "B", 10.0),
        ],
    )
    # (cheap ∪ mid) \ expensive: A,B union'd from the first two selects,
    # B removed by the third.
    query = (
        "SELECT event_time, symbol FROM ("
        "SELECT event_time, symbol FROM input WHERE price < 20 "
        "UNION SELECT event_time, symbol FROM input WHERE price < 40 "
        "EXCEPT SELECT event_time, symbol FROM input WHERE price > 20"
        ") ORDER BY symbol"
    )
    resp, out = _raw(spark, tmp_path, query, in_path)
    rows = sorted(r["symbol"] for r in pq.read_table(out).to_pylist())
    assert rows == ["A", "B"]


def test_raw_query_setop(spark, tmp_path):
    """Batch INTERSECT/EXCEPT on the raw-query path pass straight through
    to Spark SQL (one bounded input, no cross-invocation state needed)."""
    in_path = str(tmp_path / "input.parquet")
    ticker_slice(
        in_path,
        [
            (0, 0, ts(5), ts(1), "A", 10.0),
            (1, 0, ts(5), ts(2), "B", 20.0),
            (2, 0, ts(5), ts(3), "A", 30.0),
        ],
    )
    query = (
        "SELECT event_time, symbol FROM ("
        "SELECT event_time, symbol FROM input WHERE price < 25 "
        "INTERSECT SELECT event_time, symbol FROM input WHERE price >= 5)"
    )
    resp, out = _raw(spark, tmp_path, query, in_path)
    assert resp.num_records == 2
