"""Property test for the tumbling window aggregation — the reference's
headline operator (EngineAggregationTest.scala:76-309) — under RANDOM
two-invocation slicing: rows split at a random minute, watermarks at the
boundaries, the union of both invocations' emissions must equal the
DuckDB batch GROUP BY over the windows the final watermark closed
(exactly-once per window, open windows held in checkpoint state)."""

from __future__ import annotations

import os

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from .helpers import TransformRunner, ts, write_input_slice

WINDOW_Q = """SELECT
  TUMBLE_START(event_time, INTERVAL '5' MINUTE) as event_time,
  symbol as symbol,
  count(*) as n,
  sum(price) as total,
  min(price) as min_p,
  max(price) as max_p
FROM `in`
GROUP BY TUMBLE(event_time, INTERVAL '5' MINUTE), symbol"""

_SYM = st.sampled_from(["A", "B"])
_MIN = st.integers(min_value=0, max_value=24)
_VAL = st.integers(min_value=1, max_value=9)

_ROWS = st.lists(
    st.tuples(_SYM, _MIN, _VAL), min_size=1, max_size=10,
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


@settings(max_examples=15, deadline=None)
@given(
    rows=_ROWS,
    split=st.integers(min_value=1, max_value=24),
    final_wm=st.integers(min_value=24, max_value=30),
)
def test_tumbling_window_random_slicing_folds_to_batch(
    spark, tmp_path_factory, rows, split, final_wm
):
    import duckdb

    tmp_path = tmp_path_factory.mktemp("win_fuzz")
    runner = TransformRunner(spark, str(tmp_path), [(WINDOW_Q, None)])
    st_time = ts(20)
    got = []
    for inv, (lo, hi, wm_min) in enumerate(
        [(0, split, split), (split, 25, final_wm)]
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
                (r.symbol, r.event_time.replace(tzinfo=None),
                 r.n, r.total, r.min_p, r.max_p)
                for r in spark.read.parquet(out).collect()
            )
    got = sorted(got)

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(s VARCHAR, et TIMESTAMP, p INT)")
        for s, m, p in rows:
            con.execute("INSERT INTO t VALUES (?, ?, ?)",
                        [s, ts(1, 0, m).replace(tzinfo=None), p])
        # windows closed by the final watermark: start + 5min <= wm
        want = sorted(
            tuple(r)
            for r in con.execute(
                f"""
                SELECT s, time_bucket(INTERVAL 5 MINUTE, et) AS ws,
                       count(*) AS n, sum(p) AS total,
                       min(p) AS min_p, max(p) AS max_p
                FROM t
                GROUP BY s, ws
                HAVING ws + INTERVAL 5 MINUTE
                       <= TIMESTAMP '2000-01-01 00:{final_wm:02d}:00'
                """
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want, (
        f"\nsplit={split} final_wm={final_wm}\nrows={sorted(rows)}"
        f"\ngot={got}\nwant={want}"
    )
