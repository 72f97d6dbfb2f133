"""Row-time OVER aggregation parity (Flink streaming SQL "Over
Aggregation", delegated by TransformEngine.scala:252-262).

Semantics pinned: one output row per input row when the watermark passes
its rowtime; backward RANGE/ROWS frames per partition; late rows dropped;
pending rows and frame-context rows carry across invocations in the
checkpoint; emission order (rowtime, ledger offset).
"""

from datetime import timezone

import pyarrow.parquet as pq

from .helpers import TransformRunner, ticker_slice, ts

RANGE_QUERY = """select
  event_time, symbol, price,
  sum(price) over (partition by symbol order by event_time
    range between interval '2' minute preceding and current row) as sum2m,
  count(*) over (partition by symbol order by event_time
    range between interval '2' minute preceding and current row) as cnt2m
from tickers"""

ROWS_QUERY = """select
  event_time, symbol, price,
  sum(price) over (partition by symbol order by event_time
    rows between 1 preceding and current row) as sum2
from tickers"""


def _rows(out, *cols):
    table = pq.read_table(out)
    return [
        tuple(
            r[c].replace(tzinfo=timezone.utc) if c == "event_time" else r[c]
            for c in ("offset", "op", "event_time", *cols)
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


def test_over_agg_range_cross_run(spark, tmp_path):
    runner = TransformRunner(spark, tmp_path, queries=[(RANGE_QUERY, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 0), "A", 10),
            (1, 0, ts(2), ts(1, 0, 1), "A", 20),
            (2, 0, ts(2), ts(1, 0, 3), "A", 30),
            (3, 0, ts(2), ts(1, 0, 5), "A", 40),  # beyond wm: pending
            (4, 0, ts(2), ts(1, 0, 2), "B", 5),
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 4))], system_time=ts(2))
    assert resp.new_watermark == ts(1, 0, 4)
    assert _rows(out, "symbol", "price", "sum2m", "cnt2m") == [
        (0, 0, ts(1, 0, 0), "A", 10, 10, 1),
        (1, 0, ts(1, 0, 1), "A", 20, 30, 2),
        (2, 0, ts(1, 0, 2), "B", 5, 5, 1),
        (3, 0, ts(1, 0, 3), "A", 30, 50, 2),
    ]

    # Run 2: the pending 00:05 row emits with frame context persisted from
    # run 1 (the 00:03 row), a new 00:06 row emits, a late 00:02 row drops.
    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(
        s2,
        [
            (5, 0, ts(3), ts(1, 0, 6), "A", 50),
            (6, 0, ts(3), ts(1, 0, 2), "A", 99),  # late: ts <= prev wm
        ],
    )
    resp2, out2 = runner.run([_input(s2, ts(1, 0, 7))], system_time=ts(3))
    assert (resp2.new_offset_interval.start, resp2.new_offset_interval.end) == (4, 5)
    assert _rows(out2, "symbol", "price", "sum2m", "cnt2m") == [
        (4, 0, ts(1, 0, 5), "A", 40, 70, 2),  # 30 (from run-1 state) + 40
        (5, 0, ts(1, 0, 6), "A", 50, 90, 2),  # 40 + 50
    ]


def test_over_agg_rows_frame_tie_and_resume(spark, tmp_path):
    runner = TransformRunner(spark, tmp_path, queries=[(ROWS_QUERY, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 1), "A", 10),
            (1, 0, ts(2), ts(1, 0, 1), "A", 20),  # equal rowtime: ledger order
            (2, 0, ts(2), ts(1, 0, 2), "A", 30),
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 4))], system_time=ts(2))
    assert _rows(out, "symbol", "price", "sum2") == [
        (0, 0, ts(1, 0, 1), "A", 10, 10),
        (1, 0, ts(1, 0, 1), "A", 20, 30),
        (2, 0, ts(1, 0, 2), "A", 30, 50),
    ]

    # ROWS-frame context (the last 1 row per key) persists; the new row's
    # frame reaches back into run 1.
    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(s2, [(3, 0, ts(3), ts(1, 0, 5), "A", 40)])
    resp2, out2 = runner.run([_input(s2, ts(1, 0, 6))], system_time=ts(3))
    assert _rows(out2, "symbol", "price", "sum2") == [
        (3, 0, ts(1, 0, 5), "A", 40, 70),
    ]


UNBOUNDED_QUERY = """select
  event_time, symbol, price,
  sum(price) over (partition by symbol order by event_time rows unbounded preceding) as rsum,
  avg(price) over (partition by symbol order by event_time rows unbounded preceding) as ravg,
  count(*) over (partition by symbol order by event_time rows unbounded preceding) as rcnt
from tickers"""


def test_over_agg_unbounded_accumulator(spark, tmp_path):
    """UNBOUNDED PRECEDING keeps O(keys) accumulator state, not raw
    history: run 2's values continue run 1's running sum/avg/count."""
    runner = TransformRunner(spark, tmp_path, queries=[(UNBOUNDED_QUERY, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 1), "A", 10),
            (1, 0, ts(2), ts(1, 0, 2), "A", 20),
            (2, 0, ts(2), ts(1, 0, 3), "B", 5),
            (3, 0, ts(2), ts(1, 0, 5), "A", 30),  # pending
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 4))], system_time=ts(2))
    assert _rows(out, "symbol", "price", "rsum", "ravg", "rcnt") == [
        (0, 0, ts(1, 0, 1), "A", 10, 10, 10.0, 1),
        (1, 0, ts(1, 0, 2), "A", 20, 30, 15.0, 2),
        (2, 0, ts(1, 0, 3), "B", 5, 5, 5.0, 1),
    ]

    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(s2, [(4, 0, ts(3), ts(1, 0, 6), "A", 60)])
    resp2, out2 = runner.run([_input(s2, ts(1, 0, 7))], system_time=ts(3))
    assert _rows(out2, "symbol", "price", "rsum", "ravg", "rcnt") == [
        (3, 0, ts(1, 0, 5), "A", 30, 60, 20.0, 3),
        (4, 0, ts(1, 0, 6), "A", 60, 120, 30.0, 4),
    ]


def test_over_agg_watermark_only_flush(spark, tmp_path):
    """Pending rows flush on a data-less watermark advance."""
    runner = TransformRunner(spark, tmp_path, queries=[(RANGE_QUERY, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 1), "A", 10),
            (1, 0, ts(2), ts(1, 0, 5), "A", 20),  # pending under wm 0:03
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 3))], system_time=ts(2))
    assert _rows(out, "symbol", "price", "sum2m", "cnt2m") == [
        (0, 0, ts(1, 0, 1), "A", 10, 10, 1),
    ]
    resp2, out2 = runner.run(
        [{"alias": "tickers", "data_paths": [], "schema_file": s1,
          "watermark": ts(1, 0, 6)}],
        system_time=ts(3),
    )
    # Watermark-only invocation: the pending 00:05 row flushes from state.
    assert _rows(out2, "symbol", "price", "sum2m", "cnt2m") == [
        (1, 0, ts(1, 0, 5), "A", 20, 20, 1),
    ]


def test_over_agg_unbounded_avg_with_from_in_expression(spark, tmp_path):
    """AVG companions must not splice into EXTRACT(x FROM y) expressions
    (regression: companion injection previously targeted the first FROM
    token in the query text)."""
    query = """select
  event_time, symbol, price,
  EXTRACT(MINUTE FROM event_time) as minute_of,
  avg(price) over (partition by symbol order by event_time rows unbounded preceding) as ravg
from tickers"""
    runner = TransformRunner(spark, tmp_path, queries=[(query, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 1), "A", 10),
            (1, 0, ts(2), ts(1, 0, 2), "A", 20),
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 4))], system_time=ts(2))
    rows = pq.read_table(out).to_pylist()
    assert [(r["price"], r["minute_of"], r["ravg"]) for r in rows] == [
        (10, 1, 10.0),
        (20, 2, 15.0),
    ]


# ---------------------------------------------------------------------------
# FORWARD frames (beyond Flink parity — its planner rejects descending /
# FOLLOWING row-time frames). A row emits when the watermark COMPLETES its
# frame; the output watermark lags by the forward horizon.
# ---------------------------------------------------------------------------

FWD_RANGE_QUERY = """select
  event_time, symbol, price,
  sum(price) over (partition by symbol order by event_time
    range between current row and interval '2' minute following) as fsum
from tickers"""


def test_forward_range_cross_run(spark, tmp_path):
    runner = TransformRunner(spark, tmp_path, queries=[(FWD_RANGE_QUERY, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 0), "A", 10),
            (1, 0, ts(2), ts(1, 0, 1), "A", 20),
            (2, 0, ts(2), ts(1, 0, 3), "A", 30),
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 2))], system_time=ts(2))
    # Only 00:00 has a watermark-complete frame ([00:00, 00:02] ⊆ final);
    # the output watermark lags by the 2-minute horizon.
    assert resp.new_watermark == ts(1, 0, 0)
    assert _rows(out, "symbol", "price", "fsum") == [
        (0, 0, ts(1, 0, 0), "A", 10, 30),  # 10 + 20 (00:03 outside frame)
    ]

    # Run 2: the watermark completes 00:01's and 00:03's frames; 00:04 is
    # pending (frame open until 00:06). 00:01 must NOT re-emit later.
    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(s2, [(3, 0, ts(3), ts(1, 0, 4), "A", 40)])
    resp2, out2 = runner.run([_input(s2, ts(1, 0, 5))], system_time=ts(3))
    assert resp2.new_watermark == ts(1, 0, 3)
    assert _rows(out2, "symbol", "price", "fsum") == [
        (1, 0, ts(1, 0, 1), "A", 20, 50),  # 20 + 30
        (2, 0, ts(1, 0, 3), "A", 30, 70),  # 30 + 40
    ]

    # Run 3: watermark-only flush of the pending 00:04 row.
    resp3, out3 = runner.run(
        [{"alias": "tickers", "data_paths": [], "schema_file": s1,
          "watermark": ts(1, 0, 10)}],
        system_time=ts(4),
    )
    assert _rows(out3, "symbol", "price", "fsum") == [
        (3, 0, ts(1, 0, 4), "A", 40, 40),
    ]


DESC_ROWS_QUERY = """select
  event_time, symbol, price,
  sum(price) over (partition by symbol order by event_time desc
    rows between 1 preceding and current row) as fsum
from tickers"""


def test_forward_desc_rows_cross_run(spark, tmp_path):
    """ORDER BY rowtime DESC with a PRECEDING bound is the mirror spelling
    of an ascending FOLLOWING frame: each row aggregates itself plus its
    next (rowtime, offset)-ordered follower, emitting once that follower
    is watermark-final."""
    runner = TransformRunner(spark, tmp_path, queries=[(DESC_ROWS_QUERY, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 0), "A", 10),
            (1, 0, ts(2), ts(1, 0, 1), "A", 20),
            (2, 0, ts(2), ts(1, 0, 2), "A", 30),
            (3, 0, ts(2), ts(1, 0, 1), "B", 5),
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 2))], system_time=ts(2))
    # A@00:02 and B@00:01 lack a final follower -> pending; the output
    # watermark retreats to just before the earliest pending row.
    assert _rows(out, "symbol", "price", "fsum") == [
        (0, 0, ts(1, 0, 0), "A", 10, 30),  # 10 + 20
        (1, 0, ts(1, 0, 1), "A", 20, 50),  # 20 + 30
    ]
    assert resp.new_watermark < ts(1, 0, 1)

    # Run 2: followers arrive at 00:04, but the 00:03 watermark does not
    # make them FINAL — an earlier row could still slot in before them, so
    # neither pending row's frame is complete yet. Nothing emits.
    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(
        s2,
        [
            (4, 0, ts(3), ts(1, 0, 4), "A", 40),
            (5, 0, ts(3), ts(1, 0, 4), "B", 7),
        ],
    )
    resp2, out2 = runner.run([_input(s2, ts(1, 0, 3))], system_time=ts(3))
    assert resp2.new_offset_interval is None

    # Run 3: the watermark passes the followers -> both pending rows emit
    # exactly once; the 00:04 rows themselves stay pending (no follower).
    resp3, out3 = runner.run(
        [{"alias": "tickers", "data_paths": [], "schema_file": s1,
          "watermark": ts(1, 0, 4)}],
        system_time=ts(4),
    )
    assert _rows(out3, "symbol", "price", "fsum") == [
        (2, 0, ts(1, 0, 1), "B", 5, 12),  # 5 + 7
        (3, 0, ts(1, 0, 2), "A", 30, 70),  # 30 + 40
    ]
    assert resp3.new_watermark < ts(1, 0, 4)


TWO_SIDED_QUERY = """select
  event_time, symbol, price,
  sum(price) over (partition by symbol order by event_time
    range between interval '1' minute preceding and interval '2' minute following) as fsum
from tickers"""


def test_forward_two_sided_range_keeps_backward_context(spark, tmp_path):
    """PRECEDING AND FOLLOWING: already-emitted rows must persist as
    backward frame context for still-pending rows."""
    runner = TransformRunner(spark, tmp_path, queries=[(TWO_SIDED_QUERY, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 0), "A", 10),
            (1, 0, ts(2), ts(1, 0, 1), "A", 20),
            (2, 0, ts(2), ts(1, 0, 3), "A", 30),
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 2))], system_time=ts(2))
    assert _rows(out, "symbol", "price", "fsum") == [
        (0, 0, ts(1, 0, 0), "A", 10, 30),  # [−1, +2] -> 10 + 20
    ]

    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(s2, [(3, 0, ts(3), ts(1, 0, 5), "A", 40)])
    resp2, out2 = runner.run([_input(s2, ts(1, 0, 6))], system_time=ts(3))
    assert _rows(out2, "symbol", "price", "fsum") == [
        # 00:01's frame [00:00, 00:03] includes the ALREADY-EMITTED 00:00
        # row — retained as backward context across the checkpoint.
        (1, 0, ts(1, 0, 1), "A", 20, 60),  # 10 + 20 + 30
        (2, 0, ts(1, 0, 3), "A", 30, 70),  # 30 + 40 (frame [00:02, 00:05])
    ]


def test_over_agg_split_path_pending_release_and_untouched(spark, tmp_path):
    """Forces the touched-keys SPLIT path (buffer >> slice). Invocation 1
    buffers thousands of PENDING rows (watermark behind them, nothing
    emits). Invocation 2's one-row slice advances the watermark past most
    of them: keys the slice never touches must still release their pending
    rows (the released-keys probe), keys pending beyond the new watermark
    must stay buffered, and a later invocation must still see invocation-1
    frame context."""
    runner = TransformRunner(spark, tmp_path, queries=[(RANGE_QUERY, None)])
    n = 4000
    s1 = str(tmp_path / "in" / "s1.parquet")
    rows = [(i, 0, ts(5), ts(2, 0, 1), f"K{i:05d}", 10) for i in range(n)]
    # one key pending far in the future: survives invocation 2's watermark
    rows.append((n, 0, ts(5), ts(9), "FUTURE", 7))
    ticker_slice(s1, rows)
    import os

    resp, out = runner.run([_input(s1, ts(1))], system_time=ts(5))
    assert not os.path.exists(out)  # all pending: empty runs write no file

    # Tiny slice touches one key within its 2-minute frame; watermark
    # advances to ts(3): all n pending rows release, FUTURE stays.
    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(s2, [(n + 1, 0, ts(6), ts(2, 0, 2), "K00000", 5)])
    resp, out = runner.run([_input(s2, ts(3))], system_time=ts(6))
    got = _rows(out, "symbol", "price", "sum2m")
    assert len(got) == n + 1
    by_symbol = {}
    for r in got:
        by_symbol.setdefault(r[3], []).append(r)
    # Untouched-by-slice keys released their pending row with frame sum 10.
    assert [r[5] for r in by_symbol["K00001"]] == [10]
    assert [r[5] for r in by_symbol["K39"[:1] + "3999".zfill(5)]] == [10]
    # The touched key's new row sums its invocation-1 context (10 + 5).
    assert [(r[4], r[5]) for r in by_symbol["K00000"]] == [(10, 10), (5, 15)]
    assert "FUTURE" not in by_symbol

    # Invocation 3: the far-pending key releases with its own frame.
    s3 = str(tmp_path / "in" / "s3.parquet")
    ticker_slice(s3, [(n + 2, 0, ts(7), ts(9, 0, 1), "FUTURE", 3)])
    resp, out = runner.run([_input(s3, ts(10))], system_time=ts(7))
    got3 = _rows(out, "symbol", "price", "sum2m")
    assert [(r[3], r[4], r[5]) for r in got3] == [
        ("FUTURE", 7, 7),
        ("FUTURE", 3, 10),
    ]
