"""Window Top-N / window deduplication (Flink 1.13+ TVF features).

`ROW_NUMBER() OVER (PARTITION BY window_start, window_end ORDER BY ...)`
over a window TVF emits each closed window's ranking exactly once
(insert-only — no corrections, unlike running Top-N). These ride the
stateful window-agg raw-row buffer: rows buffer until the watermark
closes their window, the rank runs over closed rows only, open windows
carry across invocations.
"""

from datetime import timezone

import pyarrow.parquet as pq

from .helpers import TransformRunner, ticker_slice, ts

WINDOW_TOPN = """SELECT window_start AS event_time, window_end, symbol, price, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start, window_end ORDER BY price DESC) AS rn
  FROM TABLE(TUMBLE(TABLE tickers, DESCRIPTOR(event_time), INTERVAL '10' MINUTE))
) WHERE rn <= 2"""

WINDOW_DEDUP = """SELECT window_start AS event_time, symbol, price FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start, window_end, symbol ORDER BY price DESC) AS rn
  FROM TABLE(TUMBLE(TABLE tickers, DESCRIPTOR(event_time), INTERVAL '10' MINUTE))
) WHERE rn = 1"""


def _input(path, watermark):
    return {
        "alias": "tickers",
        "data_paths": [path] if path else [],
        "schema_file": path,
        "watermark": watermark,
    }


def _rows(out, *cols):
    table = pq.read_table(out)
    out_rows = []
    for r in table.to_pylist():
        vals = []
        for c in ("offset", "op", *cols):
            v = r[c]
            if hasattr(v, "replace") and hasattr(v, "tzinfo"):
                v = v.replace(tzinfo=timezone.utc)
            vals.append(v)
        out_rows.append(tuple(vals))
    return out_rows


def test_window_topn_cross_run(spark, tmp_path):
    runner = TransformRunner(spark, tmp_path, queries=[(WINDOW_TOPN, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 1), "A", 10),
            (1, 0, ts(2), ts(1, 0, 2), "A", 30),
            (2, 0, ts(2), ts(1, 0, 3), "A", 20),
            (3, 0, ts(2), ts(1, 0, 12), "A", 99),  # next window: stays open
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 11))], system_time=ts(2))
    # Window [00:00, 00:10) closed: its top-2 emits once; 99 buffers.
    assert _rows(out, "event_time", "window_end", "symbol", "price", "rn") == [
        (0, 0, ts(1, 0, 0), ts(1, 0, 10), "A", 20, 2),
        (1, 0, ts(1, 0, 0), ts(1, 0, 10), "A", 30, 1),
    ]

    # Run 2: a second row joins the open window, then it closes — the
    # ranking sees BOTH rows (state carried the 99).
    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(s2, [(4, 0, ts(3), ts(1, 0, 13), "A", 50)])
    resp2, out2 = runner.run([_input(s2, ts(1, 0, 21))], system_time=ts(3))
    assert _rows(out2, "event_time", "window_end", "symbol", "price", "rn") == [
        (2, 0, ts(1, 0, 10), ts(1, 0, 20), "A", 50, 2),
        (3, 0, ts(1, 0, 10), ts(1, 0, 20), "A", 99, 1),
    ]


def test_window_dedup_per_key(spark, tmp_path):
    """rn = 1 per (window, key): one winner per key per closed window."""
    runner = TransformRunner(spark, tmp_path, queries=[(WINDOW_DEDUP, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(2), ts(1, 0, 1), "A", 10),
            (1, 0, ts(2), ts(1, 0, 2), "A", 30),
            (2, 0, ts(2), ts(1, 0, 3), "B", 20),
            (3, 0, ts(2), ts(1, 0, 4), "B", 5),
        ],
    )
    resp, out = runner.run([_input(s1, ts(1, 0, 11))], system_time=ts(2))
    assert _rows(out, "event_time", "symbol", "price") == [
        (0, 0, ts(1, 0, 0), "A", 30),
        (1, 0, ts(1, 0, 0), "B", 20),
    ]
