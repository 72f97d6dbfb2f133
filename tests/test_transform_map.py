"""Map transform parity — mirrors EngineMapTest.scala:23-233.

Covers: projection + arithmetic, multi-invocation offset continuity,
multi-file slices, op passthrough for corrections/retractions, reported
newOffsetInterval/newWatermark.
"""

from datetime import timezone

import pyarrow.parquet as pq

from .helpers import TransformRunner, ticker_slice, ts

MAP_QUERY = """SELECT
  event_time,
  symbol,
  price * 10 as price
FROM `in`"""


def _rows(out_path):
    table = pq.read_table(out_path)
    return [
        (
            r["offset"],
            r["op"],
            r["system_time"].replace(tzinfo=timezone.utc),
            r["event_time"].replace(tzinfo=timezone.utc),
            r["symbol"],
            r["price"],
        )
        for r in table.to_pylist()
    ]


def test_map_simple(spark, tmp_path):
    runner = TransformRunner(spark, tmp_path, queries=[(MAP_QUERY, None)])
    slice1 = str(tmp_path / "in" / "slice1.parquet")
    ticker_slice(
        slice1,
        [
            (0, 0, ts(5), ts(1), "A", 10),
            (1, 0, ts(5), ts(2), "B", 20),
            (2, 0, ts(5), ts(3), "A", 11),
            (3, 0, ts(5), ts(4), "B", 21),
        ],
    )
    resp, out = runner.run(
        [{"alias": "in", "data_paths": [slice1], "schema_file": slice1, "watermark": ts(4)}],
        system_time=ts(10),
    )
    assert (resp.new_offset_interval.start, resp.new_offset_interval.end) == (0, 3)
    assert resp.new_watermark == ts(4)
    assert _rows(out) == [
        (0, 0, ts(10), ts(1), "A", 100),
        (1, 0, ts(10), ts(2), "B", 200),
        (2, 0, ts(10), ts(3), "A", 110),
        (3, 0, ts(10), ts(4), "B", 210),
    ]

    # Second invocation: input arrives as TWO slice files.
    slice2 = str(tmp_path / "in" / "slice2.parquet")
    slice3 = str(tmp_path / "in" / "slice3.parquet")
    ticker_slice(slice2, [(4, 0, ts(15), ts(5), "A", 12), (5, 0, ts(15), ts(6), "B", 22)])
    ticker_slice(slice3, [(6, 0, ts(15), ts(7), "A", 13), (7, 0, ts(15), ts(8), "B", 23)])
    resp, out = runner.run(
        [
            {
                "alias": "in",
                "data_paths": [slice2, slice3],
                "schema_file": slice2,
                "watermark": ts(8),
            }
        ],
        system_time=ts(20),
    )
    assert (resp.new_offset_interval.start, resp.new_offset_interval.end) == (4, 7)
    assert resp.new_watermark == ts(8)
    assert _rows(out) == [
        (4, 0, ts(20), ts(5), "A", 120),
        (5, 0, ts(20), ts(6), "B", 220),
        (6, 0, ts(20), ts(7), "A", 130),
        (7, 0, ts(20), ts(8), "B", 230),
    ]


def test_map_corrections_retractions_pass_through(spark, tmp_path):
    query = """select
  op,
  event_time,
  symbol,
  price * 10 as price
from input"""
    runner = TransformRunner(spark, tmp_path, queries=[(query, None)])
    slice1 = str(tmp_path / "in" / "slice1.parquet")
    ticker_slice(
        slice1,
        [
            (0, 0, ts(5), ts(1), "A", 10),
            (1, 2, ts(5), ts(1), "A", 10),
            (2, 3, ts(5), ts(1), "A", 11),
            (3, 1, ts(5), ts(1), "A", 11),
        ],
    )
    resp, out = runner.run(
        [{"alias": "input", "data_paths": [slice1], "schema_file": slice1, "watermark": ts(1)}],
        system_time=ts(10),
    )
    assert _rows(out) == [
        (0, 0, ts(10), ts(1), "A", 100),
        (1, 2, ts(10), ts(1), "A", 100),
        (2, 3, ts(10), ts(1), "A", 110),
        (3, 1, ts(10), ts(1), "A", 110),
    ]
    assert (resp.new_offset_interval.start, resp.new_offset_interval.end) == (0, 3)
    assert resp.new_watermark == ts(1)

    # Output parquet column order matches the reference's golden schema:
    # offset, op, system_time, <user columns>.
    schema = pq.read_schema(out)
    assert schema.names == ["offset", "op", "system_time", "event_time", "symbol", "price"]


def test_fully_custom_vocabulary(spark, tmp_path):
    """All four system-column names overridden on both input and output
    (DatasetVocabulary is per-dataset in the reference — SURVEY §1.2):
    the engine must strip/append/stamp the configured names, not the
    defaults."""
    import pyarrow as pa

    from kamu_engine_flink_spark.protocol.model import DatasetVocabulary

    from .helpers import write_input_slice

    vocab = DatasetVocabulary(
        offset_column="seq_no",
        operation_type_column="kind",
        system_time_column="tx_time",
        event_time_column="happened_at",
    )
    slice1 = str(tmp_path / "in" / "slice1.parquet")
    write_input_slice(
        slice1,
        {
            "seq_no": [0, 1],
            "kind": [0, 0],
            "tx_time": [ts(5), ts(5)],
            "happened_at": [ts(1), ts(2)],
            "symbol": ["A", "B"],
            "price": [10, 20],
        },
        {
            "seq_no": pa.int64(),
            "kind": pa.int32(),
            "tx_time": pa.timestamp("ms", tz="UTC"),
            "happened_at": pa.timestamp("ms", tz="UTC"),
            "symbol": pa.string(),
            "price": pa.int32(),
        },
    )
    runner = TransformRunner(
        spark,
        tmp_path,
        queries=[("SELECT happened_at, symbol, price * 2 as price FROM `in`", None)],
        vocab=vocab,
    )
    resp, out = runner.run(
        [
            {
                "alias": "in",
                "data_paths": [slice1],
                "schema_file": slice1,
                "watermark": ts(2),
                "vocab": vocab,
            }
        ],
        system_time=ts(10),
    )
    table = pq.read_table(out)
    assert table.column_names == ["seq_no", "kind", "tx_time", "happened_at", "symbol", "price"]
    rows = table.to_pylist()
    assert [r["seq_no"] for r in rows] == [0, 1]
    assert all(r["kind"] == 0 for r in rows)
    assert [r["price"] for r in rows] == [20, 40]
    assert (resp.new_offset_interval.start, resp.new_offset_interval.end) == (0, 1)


def test_map_qualified_star_projection(spark, tmp_path):
    """`SELECT t.* FROM v t` must not get a second __seq injected (the
    qualified star already expands the view's) — the duplicate made the
    output ordering reference ambiguous and failed the invocation."""
    runner = TransformRunner(spark, tmp_path, queries=[("SELECT t.* FROM ticker t", None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(s1, [(0, 0, ts(5), ts(1), "A", 10.0), (1, 0, ts(5), ts(2), "B", 20.0)])
    resp, out = runner.run(
        [{"alias": "ticker", "data_paths": [s1], "schema_file": s1, "watermark": ts(2)}],
        system_time=ts(5),
    )
    import pyarrow.parquet as pq

    rows = pq.read_table(out).to_pylist()
    assert [(r["symbol"], r["price"]) for r in rows] == [("A", 10.0), ("B", 20.0)]
    assert resp.new_offset_interval.start == 0 and resp.new_offset_interval.end == 1


def test_alias_collision_after_sanitization_rejected(spark, tmp_path):
    """`a.b` and `a__b` sanitize to the same temp-view name — must raise,
    not silently merge the two inputs."""
    import pytest

    from kamu_engine_flink_spark.protocol.model import InvalidQueryError

    runner = TransformRunner(
        spark,
        tmp_path,
        queries=[("SELECT event_time, symbol, price FROM `stocks.owned`", None)],
    )
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(s1, [(0, 0, ts(5), ts(1), "A", 10.0)])
    with pytest.raises(InvalidQueryError, match="collide"):
        runner.run(
            [
                {"alias": "stocks.owned", "data_paths": [s1], "schema_file": s1, "watermark": ts(1)},
                {"alias": "stocks__owned", "data_paths": [s1], "schema_file": s1, "watermark": ts(1)},
            ],
            system_time=ts(5),
        )
