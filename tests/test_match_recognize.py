"""MATCH_RECOGNIZE (CEP) subset — pattern matching over the event-time
stream with cross-invocation partial-match state.

Flink exposes row-pattern recognition through the planner the reference
delegates to (TransformEngine.scala:252-262); these scenarios pin the
online-deterministic subset: reluctant quantifiers, current-row DEFINE
predicates, ONE ROW PER MATCH, AFTER MATCH SKIP PAST LAST ROW.
"""

from datetime import timezone

import pyarrow.parquet as pq
import pytest

from kamu_engine_flink_spark.protocol.model import InvalidQueryError
from kamu_engine_flink_spark.operators.match_recognize import parse_match_recognize

from .helpers import TransformRunner, ticker_slice, ts

MR_QUERY = """select * from tickers
MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY event_time
  MEASURES
    FIRST(A.event_time) AS start_time,
    LAST(C.event_time) AS event_time,
    COUNT(B.*) AS n_mid,
    SUM(B.price) AS mid_total,
    A.price AS start_price,
    C.price AS end_price
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B* C)
  DEFINE
    A AS A.price < 10,
    B AS B.price >= 10 AND B.price < 100,
    C AS C.price >= 100
)"""


def _rows(out):
    table = pq.read_table(out)
    return [
        (
            r["offset"],
            r["op"],
            r["symbol"],
            r["start_time"].replace(tzinfo=timezone.utc),
            r["event_time"].replace(tzinfo=timezone.utc),
            r["n_mid"],
            r["mid_total"],
            r["start_price"],
            r["end_price"],
        )
        for r in table.to_pylist()
    ]


def _input(path, watermark):
    return {
        "alias": "tickers",
        "data_paths": [path] if path else [],
        "schema_file": path,
        "watermark": watermark,
    }


def test_match_recognize_cross_run(spark, tmp_path):
    runner = TransformRunner(spark, tmp_path, queries=[(MR_QUERY, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 1), "A", 5),
            (1, 0, ts(2), ts(1, 0, 2), "A", 20),
            (2, 0, ts(2), ts(1, 0, 3), "A", 50),
            (3, 0, ts(2), ts(1, 0, 4), "A", 120),
            (4, 0, ts(2), ts(1, 0, 5), "A", 7),
            (5, 0, ts(2), ts(1, 0, 6), "A", 30),
            (6, 0, ts(2), ts(1, 0, 3), "B", 3),
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 6))], system_time=ts(2))
    # One completed match (dip 5 -> mids 20,50 -> spike 120); the 00:05 dip
    # and symbol B's dip stay suspended awaiting their spike.
    assert _rows(out) == [
        (0, 0, "A", ts(1, 0, 1), ts(1, 0, 4), 2, 70, 5, 120),
    ]

    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(
        s2,
        [
            (7, 0, ts(3), ts(1, 0, 7), "A", 150),
            (8, 0, ts(3), ts(1, 0, 8), "B", 110),
        ],
    )
    resp2, out2 = runner.run([_input(s2, ts(1, 0, 10))], system_time=ts(3))
    # Both suspended attempts complete with state carried across runs;
    # B's match has zero mid rows (COUNT 0, SUM null).
    assert _rows(out2) == [
        (1, 0, "A", ts(1, 0, 5), ts(1, 0, 7), 1, 30, 7, 150),
        (2, 0, "B", ts(1, 0, 3), ts(1, 0, 8), 0, None, 3, 110),
    ]


def test_match_recognize_failed_attempt_advances(spark, tmp_path):
    """A row matching no variable kills the attempt and scanning resumes
    at the next row — matches never straddle a dead row."""
    runner = TransformRunner(spark, tmp_path, queries=[(MR_QUERY, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 1), "A", 5),  # A
            (1, 0, ts(2), ts(1, 0, 2), "A", 20),  # B
            (2, 0, ts(2), ts(1, 0, 3), "A", 8),  # kills: matches A-pred only
            (3, 0, ts(2), ts(1, 0, 4), "A", 130),  # C completes 8 -> 130
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 5))], system_time=ts(2))
    assert _rows(out) == [
        (0, 0, "A", ts(1, 0, 3), ts(1, 0, 4), 0, None, 8, 130),
    ]


def test_match_recognize_rejects_greedy_tail_and_cross_refs():
    with pytest.raises(InvalidQueryError, match="final pattern element"):
        parse_match_recognize(
            "select * from t MATCH_RECOGNIZE (ORDER BY ts MEASURES A.x AS event_time "
            "PATTERN (A B+) DEFINE A AS A.x > 0, B AS B.x > 0)"
        )
    with pytest.raises(InvalidQueryError, match="own variable"):
        parse_match_recognize(
            "select * from t MATCH_RECOGNIZE (ORDER BY ts MEASURES A.x AS event_time "
            "PATTERN (A B) DEFINE A AS A.x > 0, B AS B.x > A.x)"
        )
