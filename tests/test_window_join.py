"""Window join (Flink 1.14+ TVF feature): rows of two streams joined
within the same tumbling window, emitted when the window closes under
the two-input (min) watermark. Cross-invocation: open windows buffer
per side.
"""

from datetime import timezone

import pyarrow.parquet as pq

from .helpers import TransformRunner, ticker_slice, ts

WJOIN = """SELECT L.window_start AS event_time, L.symbol, L.price AS a_price, R.price AS b_price
FROM TABLE(TUMBLE(TABLE a, DESCRIPTOR(event_time), INTERVAL '10' MINUTE)) L
JOIN TABLE(TUMBLE(TABLE b, DESCRIPTOR(event_time), INTERVAL '10' MINUTE)) R
ON L.window_start = R.window_start AND L.symbol = R.symbol"""


def _rows(out):
    table = pq.read_table(out)
    return [
        (
            r["offset"],
            r["op"],
            r["event_time"].replace(tzinfo=timezone.utc),
            r["symbol"],
            r["a_price"],
            r["b_price"],
        )
        for r in table.to_pylist()
    ]


def _inputs(a_path, a_wm, b_path, b_wm):
    return [
        {"alias": "a", "data_paths": [a_path] if a_path else [],
         "schema_file": a_path, "watermark": a_wm},
        {"alias": "b", "data_paths": [b_path] if b_path else [],
         "schema_file": b_path, "watermark": b_wm},
    ]


def test_window_join_cross_run(spark, tmp_path):
    runner = TransformRunner(spark, tmp_path, queries=[(WJOIN, None)])
    a1 = str(tmp_path / "in" / "a1.parquet")
    b1 = str(tmp_path / "in" / "b1.parquet")
    ticker_slice(
        a1,
        [
            (0, 0, ts(2), ts(1, 0, 1), "A", 10),
            (1, 0, ts(2), ts(1, 0, 2), "B", 20),
            (2, 0, ts(2), ts(1, 0, 12), "A", 99),
        ],
    )
    ticker_slice(
        b1,
        [
            (0, 0, ts(2), ts(1, 0, 3), "A", 7),
            (1, 0, ts(2), ts(1, 0, 4), "C", 5),
            (2, 0, ts(2), ts(1, 0, 13), "A", 50),
        ],
    )
    # Effective watermark = min(0:11, 0:15) = 0:11: only window
    # [00:00, 00:10) closes; A joins, B/C have no partner.
    resp, out = runner.run(_inputs(a1, ts(1, 0, 11), b1, ts(1, 0, 15)), system_time=ts(2))
    assert resp.new_watermark == ts(1, 0, 11)
    assert _rows(out) == [
        (0, 0, ts(1, 0, 0), "A", 10, 7),
    ]

    # Run 2: a new a-row lands in the open [00:10, 00:20) window, then it
    # closes — both of a's buffered rows join b's buffered 50.
    a2 = str(tmp_path / "in" / "a2.parquet")
    b2 = str(tmp_path / "in" / "b2.parquet")
    ticker_slice(a2, [(3, 0, ts(3), ts(1, 0, 14), "A", 11)])
    ticker_slice(b2, [])
    resp2, out2 = runner.run(
        _inputs(a2, ts(1, 0, 25), b2, ts(1, 0, 25)), system_time=ts(3)
    )
    assert _rows(out2) == [
        (1, 0, ts(1, 0, 10), "A", 11, 50),
        (2, 0, ts(1, 0, 10), "A", 99, 50),
    ]


def test_window_join_missing_watermark_holds(spark, tmp_path):
    """An input with no watermark holds the two-input clock at MIN_VALUE
    (Flink rule): the window must NOT close on the present side alone."""
    import os

    runner = TransformRunner(spark, tmp_path, queries=[(WJOIN, None)])
    a1 = str(tmp_path / "in" / "a1.parquet")
    b1 = str(tmp_path / "in" / "b1.parquet")
    ticker_slice(a1, [(0, 0, ts(2), ts(1, 0, 1), "A", 10)])
    ticker_slice(b1, [(0, 0, ts(2), ts(1, 0, 2), "A", 7)])
    # b publishes NO watermark: nothing may emit.
    resp, out = runner.run(
        [
            {"alias": "a", "data_paths": [a1], "schema_file": a1, "watermark": ts(1, 0, 30)},
            {"alias": "b", "data_paths": [b1], "schema_file": b1},
        ],
        system_time=ts(2),
    )
    assert resp.new_offset_interval is None and not os.path.exists(out)

    # b's watermark arrives in run 2: the buffered window closes and joins.
    resp2, out2 = runner.run(
        [
            {"alias": "a", "data_paths": [], "schema_file": a1, "watermark": ts(1, 0, 30)},
            {"alias": "b", "data_paths": [], "schema_file": b1, "watermark": ts(1, 0, 30)},
        ],
        system_time=ts(3),
    )
    assert _rows(out2) == [(0, 0, ts(1, 0, 0), "A", 10, 7)]


def test_window_left_join_pads_at_close(spark, tmp_path):
    """LEFT window join: unmatched left rows NULL-pad when their window
    closes (both sides final at close — no per-row pad machinery)."""
    query = WJOIN.replace("\nJOIN TABLE", "\nLEFT JOIN TABLE")
    runner = TransformRunner(spark, tmp_path, queries=[(query, None)])
    a1 = str(tmp_path / "in" / "a1.parquet")
    b1 = str(tmp_path / "in" / "b1.parquet")
    ticker_slice(
        a1,
        [(0, 0, ts(2), ts(1, 0, 1), "A", 10), (1, 0, ts(2), ts(1, 0, 2), "B", 20)],
    )
    ticker_slice(b1, [(0, 0, ts(2), ts(1, 0, 3), "A", 7)])
    resp, out = runner.run(_inputs(a1, ts(1, 0, 15), b1, ts(1, 0, 15)), system_time=ts(2))
    assert sorted(_rows(out)) == [
        (0, 0, ts(1, 0, 0), "A", 10, 7),
        (1, 0, ts(1, 0, 0), "B", 20, None),
    ]


def test_window_full_join_pads_both_sides(spark, tmp_path):
    """FULL window join: both sides are final when the window closes, so
    unmatched rows on EITHER side pad in the same append-only emission —
    no retraction machinery needed (unlike the regular join)."""
    query = """SELECT coalesce(L.window_start, R.window_start) AS event_time,
  coalesce(L.symbol, R.symbol) AS symbol, L.price AS a_price, R.price AS b_price
FROM TABLE(TUMBLE(TABLE a, DESCRIPTOR(event_time), INTERVAL '10' MINUTE)) L
FULL JOIN TABLE(TUMBLE(TABLE b, DESCRIPTOR(event_time), INTERVAL '10' MINUTE)) R
ON L.window_start = R.window_start AND L.symbol = R.symbol"""
    runner = TransformRunner(spark, tmp_path, queries=[(query, None)])
    a1 = str(tmp_path / "in" / "a1.parquet")
    b1 = str(tmp_path / "in" / "b1.parquet")
    ticker_slice(
        a1,
        [(0, 0, ts(2), ts(1, 0, 1), "A", 10), (1, 0, ts(2), ts(1, 0, 2), "B", 20)],
    )
    ticker_slice(
        b1,
        [(0, 0, ts(2), ts(1, 0, 3), "A", 7), (1, 0, ts(2), ts(1, 0, 4), "C", 5)],
    )
    resp, out = runner.run(_inputs(a1, ts(1, 0, 15), b1, ts(1, 0, 15)), system_time=ts(2))
    assert sorted(_rows(out), key=lambda t: t[3]) == [
        (0, 0, ts(1, 0, 0), "A", 10, 7),
        (1, 0, ts(1, 0, 0), "B", 20, None),
        (2, 0, ts(1, 0, 0), "C", None, 5),
    ]


HOP_WJOIN = """SELECT L.window_start AS event_time, L.symbol, L.price AS a_price, R.price AS b_price
FROM TABLE(HOP(TABLE a, DESCRIPTOR(event_time), INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)) L
JOIN TABLE(HOP(TABLE b, DESCRIPTOR(event_time), INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)) R
ON L.window_start = R.window_start AND L.symbol = R.symbol"""


def test_hop_window_join_cross_run_slide_boundary(spark, tmp_path):
    """HOP eviction horizon: a row's LAST hop window ends at
    slide*floor(t/slide) + size, later than its tumble-of-size end. The
    a-row at 00:09 (tumble end 00:10) must stay buffered past wm 00:10
    because hop window [00:05, 00:15) is still open — the b-partner for
    that window only arrives in run 2."""
    runner = TransformRunner(spark, tmp_path, queries=[(HOP_WJOIN, None)])
    a1 = str(tmp_path / "in" / "a1.parquet")
    b1 = str(tmp_path / "in" / "b1.parquet")
    ticker_slice(a1, [(0, 0, ts(2), ts(1, 0, 9), "A", 10)])
    ticker_slice(b1, [])
    # wm 00:10 closes only [00:00, 00:10): a alone, no pair.
    resp, out = runner.run(_inputs(a1, ts(1, 0, 10), b1, ts(1, 0, 10)), system_time=ts(2))
    import os

    assert resp.new_offset_interval is None and not os.path.exists(out)

    # Run 2: b at 00:12 shares hop window [00:05, 00:15) with the buffered
    # a-row; wm 00:20 closes [00:05,00:15) and [00:10,00:20).
    a2 = str(tmp_path / "in" / "a2.parquet")
    b2 = str(tmp_path / "in" / "b2.parquet")
    ticker_slice(a2, [])
    ticker_slice(b2, [(0, 0, ts(3), ts(1, 0, 12), "A", 7)])
    resp2, out2 = runner.run(
        _inputs(a2, ts(1, 0, 20), b2, ts(1, 0, 20)), system_time=ts(3)
    )
    assert _rows(out2) == [(0, 0, ts(1, 0, 5), "A", 10, 7)]

    # Run 3: watermark advances past everything — exactly-once, the
    # [00:05, 00:15) pair must NOT re-emit.
    a3 = str(tmp_path / "in" / "a3.parquet")
    b3 = str(tmp_path / "in" / "b3.parquet")
    ticker_slice(a3, [])
    ticker_slice(b3, [])
    resp3, out3 = runner.run(
        _inputs(a3, ts(1, 0, 40), b3, ts(1, 0, 40)), system_time=ts(4)
    )
    assert resp3.new_offset_interval is None and not os.path.exists(out3)


def test_hop_window_join_slice_invariance(spark, tmp_path):
    """Same data as the cross-run test delivered in ONE slice produces the
    same single pair (slice-invariance)."""
    runner = TransformRunner(spark, tmp_path, queries=[(HOP_WJOIN, None)])
    a1 = str(tmp_path / "in" / "a1.parquet")
    b1 = str(tmp_path / "in" / "b1.parquet")
    ticker_slice(a1, [(0, 0, ts(2), ts(1, 0, 9), "A", 10)])
    ticker_slice(b1, [(0, 0, ts(2), ts(1, 0, 12), "A", 7)])
    resp, out = runner.run(_inputs(a1, ts(1, 0, 20), b1, ts(1, 0, 20)), system_time=ts(2))
    assert _rows(out) == [(0, 0, ts(1, 0, 5), "A", 10, 7)]


def test_cumulate_window_join_cross_run(spark, tmp_path):
    """CUMULATE(step 5m, size 10m) join on (start, end): rows pair once
    per shared cumulative instance; instances close at step boundaries
    across invocations, exactly once."""
    query = """SELECT L.window_end AS event_time, L.symbol, L.price AS a_price, R.price AS b_price
FROM TABLE(CUMULATE(TABLE a, DESCRIPTOR(event_time), INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)) L
JOIN TABLE(CUMULATE(TABLE b, DESCRIPTOR(event_time), INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)) R
ON L.window_start = R.window_start AND L.window_end = R.window_end AND L.symbol = R.symbol"""
    runner = TransformRunner(spark, tmp_path, queries=[(query, None)])
    a1 = str(tmp_path / "in" / "a1.parquet")
    b1 = str(tmp_path / "in" / "b1.parquet")
    # a at 00:02 -> instances [00:00,00:05) and [00:00,00:10);
    # b at 00:03 -> the same two instances.
    ticker_slice(a1, [(0, 0, ts(2), ts(1, 0, 2), "A", 10)])
    ticker_slice(b1, [(0, 0, ts(2), ts(1, 0, 3), "A", 7)])
    # wm 00:05 closes only the [00:00, 00:05] instance.
    resp, out = runner.run(_inputs(a1, ts(1, 0, 5), b1, ts(1, 0, 5)), system_time=ts(2))
    assert _rows(out) == [(0, 0, ts(1, 0, 5), "A", 10, 7)]

    # wm 00:10 closes the [00:00, 00:10] instance — same rows pair again
    # for the LONGER instance, the earlier one does not re-emit.
    a2 = str(tmp_path / "in" / "a2.parquet")
    b2 = str(tmp_path / "in" / "b2.parquet")
    ticker_slice(a2, [])
    ticker_slice(b2, [])
    resp2, out2 = runner.run(
        _inputs(a2, ts(1, 0, 10), b2, ts(1, 0, 10)), system_time=ts(3)
    )
    assert _rows(out2) == [(1, 0, ts(1, 0, 10), "A", 10, 7)]


def test_hop_window_join_partially_late_row(spark, tmp_path):
    """A row arriving after SOME of its hop windows closed contributes
    only to the still-open ones (Flink's per-window late-data rule): the
    late a-row at 00:07 pairs with b in [00:05, 00:15) but must NOT
    back-fill the already-emitted [00:00, 00:10)."""
    runner = TransformRunner(spark, tmp_path, queries=[(HOP_WJOIN, None)])
    a1 = str(tmp_path / "in" / "a1.parquet")
    b1 = str(tmp_path / "in" / "b1.parquet")
    ticker_slice(a1, [])
    ticker_slice(b1, [(0, 0, ts(2), ts(1, 0, 8), "A", 7)])
    # wm 00:10 closes [00:00, 00:10) with only b present — no pair.
    resp, out = runner.run(_inputs(a1, ts(1, 0, 10), b1, ts(1, 0, 10)), system_time=ts(2))
    import os

    assert resp.new_offset_interval is None and not os.path.exists(out)

    # The a-row at 00:07 is LATE for [00:00, 00:10) but alive for
    # [00:05, 00:15): exactly one pair, at window_start 00:05.
    a2 = str(tmp_path / "in" / "a2.parquet")
    b2 = str(tmp_path / "in" / "b2.parquet")
    ticker_slice(a2, [(0, 0, ts(3), ts(1, 0, 7), "A", 10)])
    ticker_slice(b2, [])
    resp2, out2 = runner.run(
        _inputs(a2, ts(1, 0, 20), b2, ts(1, 0, 20)), system_time=ts(3)
    )
    assert _rows(out2) == [(0, 0, ts(1, 0, 5), "A", 10, 7)]


def test_window_self_join_cross_run(spark, tmp_path):
    """Self-join: both TVFs over the same view (Flink permits it — e.g.
    same-window pair enumeration). The side is buffered once and both
    spans bind the same closed-instances view; user aliases disambiguate."""
    q = """SELECT L.window_start AS event_time, L.symbol, L.price AS l_price, R.price AS r_price
FROM TABLE(TUMBLE(TABLE a, DESCRIPTOR(event_time), INTERVAL '10' MINUTE)) L
JOIN TABLE(TUMBLE(TABLE a, DESCRIPTOR(event_time), INTERVAL '10' MINUTE)) R
ON L.window_start = R.window_start AND L.symbol = R.symbol AND L.price < R.price"""
    runner = TransformRunner(spark, tmp_path, queries=[(q, None)])

    def _in(path, wm):
        return [{"alias": "a", "data_paths": [path] if path else [],
                 "schema_file": path, "watermark": wm}]

    def _r(out):
        table = pq.read_table(out)
        return [
            (r["op"], r["event_time"].replace(tzinfo=timezone.utc),
             r["symbol"], r["l_price"], r["r_price"])
            for r in table.to_pylist()
        ]

    a1 = str(tmp_path / "in" / "a1.parquet")
    ticker_slice(
        a1,
        [
            (0, 0, ts(2), ts(1, 0, 1), "A", 10),
            (1, 0, ts(2), ts(1, 0, 2), "A", 20),
            (2, 0, ts(2), ts(1, 0, 3), "B", 5),
            (3, 0, ts(2), ts(1, 0, 12), "A", 99),  # open window
        ],
    )
    # Window [00:00, 00:10) closes: the ordered pair (10, 20); B alone.
    resp, out = runner.run(_in(a1, ts(1, 0, 11)), system_time=ts(2))
    assert _r(out) == [(0, ts(1, 0, 0), "A", 10, 20)]

    # Run 2: a buffered-window partner arrives, then [00:10, 00:20) closes.
    a2 = str(tmp_path / "in" / "a2.parquet")
    ticker_slice(a2, [(4, 0, ts(3), ts(1, 0, 14), "A", 50)])
    resp2, out2 = runner.run(_in(a2, ts(1, 0, 25)), system_time=ts(3))
    assert _r(out2) == [(0, ts(1, 0, 10), "A", 50, 99)]
