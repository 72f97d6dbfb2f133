"""Property test for the row-time OVER aggregation's fold-to-batch law
under RANDOM time-banded slicing, against a DuckDB window replay —
extending the random-slicing discipline (tests/test_asof_fuzz.py
pattern) to the OVER family, whose prior slice test used fixed seeds
and cuts (tests/test_slice_invariance.py).

Rows split at a random minute into two chained invocations (contract-
clean band watermark: wm1 = split - 1, since the operator uses row-level
lateness); each released row's backward RANGE frame is fully determined
by earlier rows, so the sliced union must equal DuckDB's batch window
over all rows at or below the final watermark. Reference surface:
row-time OVER aggregation via Flink planner delegation
(TransformEngine.scala:252-262)."""

from __future__ import annotations

import os

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from .helpers import TransformRunner, ts, write_input_slice

OVER_Q = """SELECT
  event_time, symbol, price,
  sum(price) over (partition by symbol order by event_time
    range between interval '10' minute preceding and current row) as roll_sum,
  count(*) over (partition by symbol order by event_time
    range between interval '10' minute preceding and current row) as roll_cnt
FROM `in`"""

_SYM = st.sampled_from(["A", "B"])
_MIN = st.integers(min_value=0, max_value=24)
_VAL = st.integers(min_value=1, max_value=9)
_ROWS = st.lists(
    st.tuples(_SYM, _MIN, _VAL), min_size=1, max_size=12,
    unique_by=lambda t: (t[0], t[1]),
)


def _slice(path, rows):
    cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
    write_input_slice(
        path,
        {
            "offset": list(cols[0]),
            "op": [0] * len(rows),
            "system_time": list(cols[1]),
            "event_time": list(cols[2]),
            "symbol": list(cols[3]),
            "price": list(cols[4]),
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "symbol": pa.string(),
            "price": pa.int32(),
        },
    )


@settings(max_examples=12, deadline=None)
@given(
    rows=_ROWS,
    split=st.integers(min_value=1, max_value=24),
    final_wm=st.integers(min_value=20, max_value=30),
)
def test_over_agg_random_slicing_folds_to_batch(
    spark, tmp_path_factory, rows, split, final_wm
):
    import duckdb

    tmp_path = tmp_path_factory.mktemp("over_fuzz")
    runner = TransformRunner(spark, str(tmp_path), [(OVER_Q, None)])
    st_time = ts(20)
    got = []
    for inv, (lo, hi, wm_min) in enumerate(
        [(0, split, split - 1), (split, 25, final_wm)]
    ):
        part = [
            (i, st_time, ts(1, 0, m), s, p)
            for i, (s, m, p) in enumerate(sorted(rows))
            if lo <= m < hi
        ]
        path = str(tmp_path / f"in{inv}.parquet")
        _slice(path, part)
        _, out = runner.run(
            [{"alias": "in", "schema_file": path,
              "data_paths": [path] if part else [],
              "watermark": ts(1, 0, wm_min)}],
            system_time=st_time,
        )
        if os.path.exists(out):
            got.extend(
                (r.symbol, r.event_time.replace(tzinfo=None), r.price,
                 r.roll_sum, r.roll_cnt)
                for r in spark.read.parquet(out).collect()
            )
    got = sorted(got)

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(s VARCHAR, et TIMESTAMP, p INT)")
        for s, m, p in rows:
            con.execute("INSERT INTO t VALUES (?, ?, ?)",
                        [s, ts(1, 0, m).replace(tzinfo=None), p])
        # Watermarks are monotone: if the generator drew final_wm below
        # the band-1 watermark, the effective release bound stays at
        # split - 1.
        eff = max(split - 1, final_wm)
        want = sorted(
            tuple(r)
            for r in con.execute(
                f"""
                SELECT s, et, p,
                       sum(p) OVER w AS roll_sum,
                       count(*) OVER w AS roll_cnt
                FROM t
                WINDOW w AS (PARTITION BY s ORDER BY et
                    RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                    AND CURRENT ROW)
                QUALIFY et <= TIMESTAMP '2000-01-01 00:{eff:02d}:00'
                """
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want, (
        f"\nsplit={split} wm={final_wm}\nrows={sorted(rows)}"
        f"\ngot={got}\nwant={want}"
    )
