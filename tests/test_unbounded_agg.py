"""Continuous (unbounded, windowless) GROUP BY aggregation changelog.

Flink's updating aggregate through the engine's op 0/2/3 changelog
contract (ChangelogOperator.scala:10-24 mapping; emission granularity =
one revision per changed key per invocation, Flink's mini-batch mode).
"""

import random

import pyarrow.parquet as pq

from kamu_engine_flink_spark.plans.classify import (
    MAP,
    UNBOUNDED_AGG,
    classify,
)
from kamu_engine_flink_spark.protocol.model import DatasetVocabulary

from .helpers import TransformRunner, ticker_slice, ts

UA_QUERY = """select
  cast(now() as timestamp(3)) as placed_at,
  symbol,
  count(*) as n,
  sum(price) as total,
  min(price) as lo,
  avg(price) as mean_p
from tickers
group by symbol"""


def test_classification():
    import pytest

    from kamu_engine_flink_spark.protocol.model import InvalidQueryError

    assert classify(UA_QUERY, {"tickers"}) == UNBOUNDED_AGG
    # global (keyless) continuous aggregation
    assert (
        classify("select count(*) as n, sum(price) as total from tickers", {"tickers"})
        == UNBOUNDED_AGG
    )
    # non-mergeable aggregate / expression group key: rejected LOUDLY —
    # a stateless per-slice evaluation would be silently slice-dependent.
    with pytest.raises(InvalidQueryError, match="continuous-aggregation"):
        classify("select symbol, collect_list(price) as ps from tickers group by symbol", {"tickers"})
    with pytest.raises(InvalidQueryError, match="continuous-aggregation"):
        classify("select upper(symbol) as s, count(*) as n from tickers group by upper(symbol)", {"tickers"})
    # window functions (OVER) keep their routes / plain projections stay MAP
    assert classify("select symbol, price from tickers", {"tickers"}) == MAP
    # windowed aggregations keep their window routes
    assert (
        classify(
            "SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as d, count(*) as n "
            "FROM tickers GROUP BY TUMBLE(event_time, INTERVAL '1' DAY)",
            {"tickers"},
        )
        == "window_agg"
    )


def _rows(out):
    return [
        (r["op"], r["symbol"], r["n"], r["total"], r["lo"], r["mean_p"])
        for r in pq.read_table(out).to_pylist()
    ]


def _runner(spark, tmp_path):
    return TransformRunner(
        spark,
        tmp_path,
        queries=[(UA_QUERY, None)],
        vocab=DatasetVocabulary(event_time_column="placed_at"),
    )


def test_continuous_agg_changelog(spark, tmp_path):
    runner = _runner(spark, tmp_path)
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 1), "A", 10),
            (1, 0, ts(2), ts(1, 0, 2), "A", 20),
            (2, 0, ts(2), ts(1, 0, 3), "B", 5),
        ],
    )
    resp, out = runner.run(
        [{"alias": "tickers", "data_paths": [s1], "schema_file": s1, "watermark": ts(1)}],
        system_time=ts(2),
    )
    # First sight of each key: op 0 with the absolute aggregate row.
    assert _rows(out) == [
        (0, "A", 2, 30, 10, 15.0),
        (0, "B", 1, 5, 5, 5.0),
    ]
    assert (resp.new_offset_interval.start, resp.new_offset_interval.end) == (0, 1)

    # Run 2: A revises -> correction pair; B untouched -> silent.
    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(s2, [(3, 0, ts(3), ts(1, 0, 4), "A", 30)])
    resp, out = runner.run(
        [{"alias": "tickers", "data_paths": [s2], "schema_file": s2, "watermark": ts(1)}],
        system_time=ts(3),
    )
    assert _rows(out) == [
        (2, "A", 2, 30, 10, 15.0),
        (3, "A", 3, 60, 10, 20.0),
    ]
    assert (resp.new_offset_interval.start, resp.new_offset_interval.end) == (2, 3)

    # Run 3: new key C appends; B revises (min drops) -> pair.
    s3 = str(tmp_path / "in" / "s3.parquet")
    ticker_slice(s3, [(4, 0, ts(4), ts(1, 0, 5), "C", 7), (5, 0, ts(4), ts(1, 0, 6), "B", 1)])
    resp, out = runner.run(
        [{"alias": "tickers", "data_paths": [s3], "schema_file": s3, "watermark": ts(1)}],
        system_time=ts(4),
    )
    assert _rows(out) == [
        (2, "B", 1, 5, 5, 5.0),
        (3, "B", 2, 6, 1, 3.0),
        (0, "C", 1, 7, 7, 7.0),
    ]


def test_changelog_folds_to_batch_result(spark, tmp_path):
    """Applying the changelog (keep each key's last op0/op3 row) must
    reconstruct the plain batch GROUP BY regardless of how the stream was
    cut into invocations."""
    rng = random.Random(37)
    rows = [
        (i, 0, ts(9), ts(1, 0, i % 60), f"S{rng.randrange(6)}", rng.randrange(1, 100))
        for i in range(120)
    ]

    def run_cuts(tag, cuts):
        runner = _runner(spark, tmp_path / tag)
        state = {}
        bounds = [0, *cuts, len(rows)]
        for si in range(len(bounds) - 1):
            path = str(tmp_path / tag / f"s{si}.parquet")
            ticker_slice(path, rows[bounds[si] : bounds[si + 1]])
            resp, out = runner.run(
                [{"alias": "tickers", "data_paths": [path], "schema_file": path, "watermark": ts(1, 1)}],
                system_time=ts(9 + si),
            )
            if resp.new_offset_interval is None:
                continue
            for op, sym, n, total, lo, mean_p in _rows(out):
                if op in (0, 3):
                    state[sym] = (n, total, lo, mean_p)
        return dict(sorted(state.items()))

    import collections

    expect = {}
    per_key = collections.defaultdict(list)
    for *_rest, sym, price in rows:
        per_key[sym].append(price)
    for sym, ps in per_key.items():
        expect[sym] = (len(ps), sum(ps), min(ps), sum(ps) / len(ps))
    expect = dict(sorted(expect.items()))

    assert run_cuts("one", []) == expect
    assert run_cuts("many", [40, 77, 103]) == expect


def test_global_continuous_agg(spark, tmp_path):
    """Keyless (global) continuous aggregation: one updating row."""
    runner = TransformRunner(
        spark,
        tmp_path,
        queries=[(
            "select cast(now() as timestamp(3)) as placed_at, count(*) as n, sum(price) as total from tickers",
            None,
        )],
        vocab=DatasetVocabulary(event_time_column="placed_at"),
    )
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(s1, [(0, 0, ts(2), ts(1, 0, 1), "A", 10), (1, 0, ts(2), ts(1, 0, 2), "B", 5)])
    resp, out = runner.run(
        [{"alias": "tickers", "data_paths": [s1], "schema_file": s1, "watermark": ts(1)}],
        system_time=ts(2),
    )
    rows = [(r["op"], r["n"], r["total"]) for r in pq.read_table(out).to_pylist()]
    assert rows == [(0, 2, 15)]

    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(s2, [(2, 0, ts(3), ts(1, 0, 3), "A", 100)])
    resp, out = runner.run(
        [{"alias": "tickers", "data_paths": [s2], "schema_file": s2, "watermark": ts(1)}],
        system_time=ts(3),
    )
    rows = [(r["op"], r["n"], r["total"]) for r in pq.read_table(out).to_pylist()]
    assert rows == [(2, 2, 15), (3, 3, 115)]


def test_split_path_untouched_and_null_keys(spark, tmp_path):
    """Forces the touched-keys SPLIT path (state >> slice): thousands of
    keys seeded in invocation 1 (plus a NULL-keyed group), then a tiny
    slice touching two keys and the NULL group. Emissions must come only
    from touched keys; untouched accumulators must survive exactly
    (proven by touching one later)."""
    runner = _runner(spark, tmp_path)
    n = 5000
    s1 = str(tmp_path / "in" / "s1.parquet")
    rows = [(i, 0, ts(2), ts(1, 0, 1), f"S{i:05d}", 10 + (i % 7)) for i in range(n)]
    rows.append((n, 0, ts(2), ts(1, 0, 1), None, 50))
    ticker_slice(s1, rows)
    resp, out = runner.run(
        [{"alias": "tickers", "data_paths": [s1], "schema_file": s1, "watermark": ts(1)}],
        system_time=ts(2),
    )
    import pyarrow.parquet as pq

    assert pq.read_table(out).num_rows == n + 1

    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(
        s2,
        [
            (n + 1, 0, ts(3), ts(1, 0, 4), "S00001", 9),
            (n + 2, 0, ts(3), ts(1, 0, 5), "NEW", 3),
            (n + 3, 0, ts(3), ts(1, 0, 6), None, 10),
        ],
    )
    resp, out = runner.run(
        [{"alias": "tickers", "data_paths": [s2], "schema_file": s2, "watermark": ts(1)}],
        system_time=ts(3),
    )
    # S00001: correction pair (11 -> 11+9); NULL group: pair (50 -> 60);
    # NEW: op-0 append. Nothing else emits.
    assert _rows(out) == [
        (2, None, 1, 50, 50, 50.0),
        (3, None, 2, 60, 10, 30.0),
        (0, "NEW", 1, 3, 3, 3.0),
        (2, "S00001", 1, 11, 11, 11.0),
        (3, "S00001", 2, 20, 9, 10.0),
    ]

    # Untouched key S00002 kept its invocation-1 accumulator.
    s3 = str(tmp_path / "in" / "s3.parquet")
    ticker_slice(s3, [(n + 4, 0, ts(4), ts(1, 0, 7), "S00002", 8)])
    resp, out = runner.run(
        [{"alias": "tickers", "data_paths": [s3], "schema_file": s3, "watermark": ts(1)}],
        system_time=ts(4),
    )
    assert _rows(out) == [
        (2, "S00002", 1, 12, 12, 12.0),
        (3, "S00002", 2, 20, 8, 10.0),
    ]
