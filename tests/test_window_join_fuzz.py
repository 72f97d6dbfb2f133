"""Property test for the window TVF join's fold-to-batch law under
RANDOM two-invocation slicing — the last core stateful family whose
cross-checkpoint law was example-based after round 12 fuzzed as-of,
interval join, and tumbling agg (round-12 verdict ask #6; template:
tests/test_asof_fuzz.py).

Random per-side (symbol, minute, value) rows split at a random minute
into two chained invocations (state through the checkpoint, effective
watermark = min of both inputs) must union to a DuckDB replay that
expands each row into its containing window instances and joins the
instance sets — TUMBLE and HOP kinds, INNER and FULL (pad) joins.
Reference surface: Flink 1.14+ window TVF joins via planner delegation
(TransformEngine.scala:252-262)."""

from __future__ import annotations

import os

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from .helpers import TransformRunner, ts, write_input_slice

_SYM = st.sampled_from(["A", "B"])
_MIN = st.integers(min_value=0, max_value=12)
_VAL = st.integers(min_value=1, max_value=9)
_ROWS = st.lists(
    st.tuples(_SYM, _MIN, _VAL), min_size=1, max_size=8,
    unique_by=lambda t: (t[0], t[1]),
)
# (kind, size_minutes, slide_minutes): the 2000-01-01 00:00 UTC base is
# epoch-aligned for every divisor of 60 used here, so minute-offset
# window arithmetic matches the engine's absolute epoch alignment.
_WINDOWS = st.sampled_from(
    [("TUMBLE", 3, None), ("TUMBLE", 4, None), ("HOP", 4, 2), ("HOP", 6, 3)]
)


def _tvf(kind, size, slide, view):
    if kind == "TUMBLE":
        return (
            f"TABLE(TUMBLE(TABLE {view}, DESCRIPTOR(event_time), "
            f"INTERVAL '{size}' MINUTE))"
        )
    return (
        f"TABLE(HOP(TABLE {view}, DESCRIPTOR(event_time), "
        f"INTERVAL '{slide}' MINUTE, INTERVAL '{size}' MINUTE))"
    )


def _query(kind, size, slide, how):
    left = _tvf(kind, size, slide, "purchases")
    right = _tvf(kind, size, slide, "clicks")
    if how == "inner":
        return f"""SELECT
  L.window_start as event_time, L.symbol as symbol,
  L.qty as qty, R.clk as clk
FROM {left} L
JOIN {right} R
ON L.window_start = R.window_start AND L.symbol = R.symbol"""
    return f"""SELECT
  COALESCE(L.window_start, R.window_start) as event_time,
  COALESCE(L.symbol, R.symbol) as symbol,
  L.qty as qty, R.clk as clk
FROM {left} L
FULL JOIN {right} R
ON L.window_start = R.window_start AND L.symbol = R.symbol"""


def _slice(path, rows, value_col):
    cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
    write_input_slice(
        path,
        {
            "offset": list(cols[0]),
            "op": [0] * len(rows),
            "system_time": list(cols[1]),
            "event_time": list(cols[2]),
            "symbol": list(cols[3]),
            value_col: list(cols[4]),
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "symbol": pa.string(),
            value_col: pa.int32(),
        },
    )


def _instances(m: int, kind: str, size: int, slide: int | None) -> list[int]:
    """Window starts (minutes) of every window containing minute m."""
    if kind == "TUMBLE":
        return [m // size * size]
    lo = ((m - size) // slide + 1) * slide
    return list(range(lo, m // slide * slide + 1, slide))


def _duck_replay(l_rows, r_rows, kind, size, slide, how):
    """DuckDB window-join replay over expanded instance tables."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE lw(s VARCHAR, ws INT, q INT)")
        con.execute("CREATE TABLE rw(s VARCHAR, ws INT, c INT)")
        for s, m, q in l_rows:
            for ws in _instances(m, kind, size, slide):
                con.execute("INSERT INTO lw VALUES (?, ?, ?)", [s, ws, q])
        for s, m, c in r_rows:
            for ws in _instances(m, kind, size, slide):
                con.execute("INSERT INTO rw VALUES (?, ?, ?)", [s, ws, c])
        if how == "inner":
            rows = con.execute(
                "SELECT l.s, l.ws, l.q, r.c FROM lw l JOIN rw r "
                "ON l.ws = r.ws AND l.s = r.s"
            ).fetchall()
        else:
            rows = con.execute(
                "SELECT COALESCE(l.s, r.s), COALESCE(l.ws, r.ws), l.q, r.c "
                "FROM lw l FULL JOIN rw r ON l.ws = r.ws AND l.s = r.s"
            ).fetchall()
    finally:
        con.close()
    # timedelta, not ts(): a HOP window containing minute 0 can START
    # before the base (negative offset), and the engine emits it.
    from datetime import timedelta

    base = ts(1).replace(tzinfo=None)
    return sorted(
        (s, base + timedelta(minutes=ws), q, c) for s, ws, q, c in rows
    )


@settings(max_examples=12, deadline=None)
@given(
    l_rows=_ROWS,
    r_rows=_ROWS,
    window=_WINDOWS,
    how=st.sampled_from(["inner", "full"]),
    split=st.integers(min_value=1, max_value=12),
)
def test_window_join_random_slicing_folds_to_batch(
    spark, tmp_path_factory, l_rows, r_rows, window, how, split
):
    kind, size, slide = window
    tmp_path = tmp_path_factory.mktemp("wjoin_fuzz")
    runner = TransformRunner(
        spark, str(tmp_path), [(_query(kind, size, slide, how), None)]
    )
    st_time = ts(20)
    got = []
    for inv, (lo, hi, wm_min) in enumerate(
        [(0, split, split - 1), (split, 13, 40)]
    ):
        lr = [
            (i, st_time, ts(1, 0, m), s, q)
            for i, (s, m, q) in enumerate(sorted(l_rows))
            if lo <= m < hi
        ]
        rr = [
            (i + 100, st_time, ts(1, 0, m), s, c)
            for i, (s, m, c) in enumerate(sorted(r_rows))
            if lo <= m < hi
        ]
        lp = str(tmp_path / f"purchases{inv}.parquet")
        rp = str(tmp_path / f"clicks{inv}.parquet")
        _slice(lp, lr, "qty")
        _slice(rp, rr, "clk")
        wm = ts(1, 0, wm_min)
        _, out = runner.run(
            [
                {"alias": "purchases", "schema_file": lp,
                 "data_paths": [lp] if lr else [], "watermark": wm},
                {"alias": "clicks", "schema_file": rp,
                 "data_paths": [rp] if rr else [], "watermark": wm},
            ],
            system_time=st_time,
        )
        if os.path.exists(out):
            got.extend(
                (r.symbol, r.event_time.replace(tzinfo=None), r.qty, r.clk)
                for r in spark.read.parquet(out).collect()
            )
    got = sorted(got)
    want = _duck_replay(l_rows, r_rows, kind, size, slide, how)
    assert got == want, (
        f"\nkind={kind} size={size} slide={slide} how={how} split={split}"
        f"\nl={sorted(l_rows)}\nr={sorted(r_rows)}\ngot={got}\nwant={want}"
    )
