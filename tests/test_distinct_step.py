"""Stateful SELECT DISTINCT across invocations (Flink stream semantics:
a row equal to one emitted in ANY earlier micro-batch is suppressed).
Also the incremental exact-dedup shape for training-data ingest."""

import pyarrow as pa

from kamu_engine_flink_spark.plans.classify import DISTINCT, MAP, classify
from kamu_engine_flink_spark.protocol.model import DatasetVocabulary

from .helpers import TransformRunner, ts, write_input_slice

QUERY = "SELECT DISTINCT event_time, category FROM readings"


def readings_slice(path, rows):
    """rows: (offset, op, system_time, event_time, category)"""
    cols = list(zip(*rows))
    write_input_slice(
        path,
        {
            "offset": list(cols[0]),
            "op": list(cols[1]),
            "system_time": list(cols[2]),
            "event_time": list(cols[3]),
            "category": list(cols[4]),
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "category": pa.string(),
        },
    )


def test_classify_distinct():
    views = {"readings"}
    assert classify(QUERY, views) == DISTINCT
    # DISTINCT over a join: per-slice distinct would be slice-dependent —
    # reject with the per-step decomposition (join, then DISTINCT on the
    # alias, which the stateful DISTINCT executor handles).
    import pytest

    from kamu_engine_flink_spark.protocol.model import InvalidQueryError

    with pytest.raises(InvalidQueryError, match="aliased steps"):
        classify("SELECT DISTINCT a FROM readings JOIN x ON 1=1", views | {"x"})
    assert (
        classify("SELECT a FROM (SELECT DISTINCT a FROM readings)", views) == MAP
    )
    # An identifier CONTAINING 'select' must not defeat the single-block
    # detection (word-boundary keyword counting) — the downgrade to MAP
    # would silently change semantics to per-slice distinct.
    assert (
        classify("SELECT DISTINCT user_id, selected_at FROM readings", views)
        == DISTINCT
    )


def test_fingerprint_injective_across_column_boundaries(spark, tmp_path):
    """Rows ('a\\x1fb', 'c') and ('a', 'b\\x1fc') are distinct and must
    both emit — a delimiter-joined fingerprint would conflate them."""
    runner = TransformRunner(
        spark, tmp_path, queries=[("SELECT DISTINCT event_time, category, extra FROM readings", None)]
    )
    path = str(tmp_path / "in" / "s1.parquet")
    write_input_slice(
        path,
        {
            "offset": [0, 1],
            "op": [0, 0],
            "system_time": [ts(5), ts(5)],
            "event_time": [ts(1), ts(1)],
            "category": ["a\x1fb", "a"],
            "extra": ["c", "b\x1fc"],
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "category": pa.string(),
            "extra": pa.string(),
        },
    )
    resp, out = runner.run(
        [{"alias": "readings", "data_paths": [path], "schema_file": path, "watermark": ts(1)}],
        system_time=ts(10),
    )
    import pyarrow.parquet as pq

    got = {(r["category"], r["extra"]) for r in pq.read_table(out).to_pylist()}
    assert got == {("a\x1fb", "c"), ("a", "b\x1fc")}


def test_distinct_suppresses_rows_seen_in_earlier_invocations(spark, tmp_path):
    runner = TransformRunner(
        spark,
        tmp_path,
        queries=[(QUERY, None)],
        vocab=DatasetVocabulary(),
    )
    s1 = str(tmp_path / "in" / "s1.parquet")
    readings_slice(
        s1,
        [
            (0, 0, ts(5), ts(1), "a"),
            (1, 0, ts(5), ts(1), "a"),  # in-slice duplicate
            (2, 0, ts(5), ts(2), "b"),
        ],
    )
    resp1, out1 = runner.run(
        [{"alias": "readings", "data_paths": [s1], "schema_file": s1, "watermark": ts(2)}],
        system_time=ts(10),
    )
    assert (resp1.new_offset_interval.start, resp1.new_offset_interval.end) == (0, 1)
    rows1 = [(r[3], r[4]) for r in runner.read_output(out1)]
    assert rows1 == [(ts(1).replace(tzinfo=None), "a"), (ts(2).replace(tzinfo=None), "b")] or [
        (r[1],) for r in rows1
    ] == [("a",), ("b",)]

    s2 = str(tmp_path / "in" / "s2.parquet")
    readings_slice(
        s2,
        [
            (3, 0, ts(6), ts(1), "a"),  # seen in invocation 1 -> suppressed
            (4, 0, ts(6), ts(3), "c"),  # new
            (5, 0, ts(6), ts(2), "b"),  # seen -> suppressed
            (6, 0, ts(6), ts(3), "c"),  # in-slice duplicate of the new row
        ],
    )
    resp2, out2 = runner.run(
        [{"alias": "readings", "data_paths": [s2], "schema_file": s2, "watermark": ts(3)}],
        system_time=ts(11),
    )
    assert (resp2.new_offset_interval.start, resp2.new_offset_interval.end) == (2, 2)
    assert resp2.new_watermark == ts(3)
    rows2 = runner.read_output(out2)
    assert len(rows2) == 1
    assert rows2[0][4] == "c"

    # Invocation 3: everything already seen -> empty output, no data file.
    import os

    s3 = str(tmp_path / "in" / "s3.parquet")
    readings_slice(s3, [(7, 0, ts(7), ts(1), "a"), (8, 0, ts(7), ts(3), "c")])
    resp3, out3 = runner.run(
        [{"alias": "readings", "data_paths": [s3], "schema_file": s3, "watermark": ts(4)}],
        system_time=ts(12),
    )
    assert resp3.new_offset_interval is None
    assert not os.path.exists(out3)


def test_group_by_without_aggregates_is_stateful_distinct(spark, tmp_path):
    """`SELECT k FROM v GROUP BY k` is DISTINCT in disguise (Flink's
    planner gives it the same stateful semantics): a group seen in an
    earlier invocation must NOT re-emit — per-slice MAP evaluation would.
    classify() routes it to the DISTINCT executor, which normalizes the
    spelling (plans/classify.group_by_distinct_sql)."""
    from .helpers import TransformRunner, ticker_slice, ts

    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            ("SELECT symbol FROM tickers GROUP BY symbol", "g"),
            (
                "SELECT cast(now() as timestamp(3)) as event_time, symbol FROM g",
                None,
            ),
        ],
    )
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(s1, [
        (0, 0, ts(1), ts(1, 1), "A", 1.0),
        (1, 0, ts(1), ts(1, 2), "A", 2.0),
        (2, 0, ts(1), ts(1, 3), "B", 3.0),
    ])
    _, out1 = runner.run(
        [{"alias": "tickers", "schema_file": s1, "data_paths": [s1],
          "watermark": ts(1, 3)}],
        system_time=ts(2),
    )
    assert sorted(r.symbol for r in spark.read.parquet(out1).collect()) == ["A", "B"]

    # Invocation 2: A re-arrives (suppressed), C is new.
    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(s2, [
        (3, 0, ts(3), ts(3, 1), "A", 4.0),
        (4, 0, ts(3), ts(3, 2), "C", 5.0),
    ])
    _, out2 = runner.run(
        [{"alias": "tickers", "schema_file": s2, "data_paths": [s2],
          "watermark": ts(3, 2)}],
        system_time=ts(4),
    )
    assert sorted(r.symbol for r in spark.read.parquet(out2).collect()) == ["C"]
