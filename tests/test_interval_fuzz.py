"""Property test for the stream-to-stream interval join: random bounds
(including negative lower offsets), random spelling (BETWEEN vs two
comparisons), INNER and LEFT, through the full classify + executor
stack, checked against DuckDB's plain range join on random data.
Reference semantics: EngineJoinStreamToStreamTest.scala:106-226."""

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
    st.tuples(_SYM, _MIN, _VAL), min_size=1, max_size=7,
    unique_by=lambda t: (t[0], t[1]),
)


def _bound(expr_off: int) -> str:
    if expr_off == 0:
        return "o.event_time"
    op = "+" if expr_off > 0 else "-"
    return f"o.event_time {op} INTERVAL '{abs(expr_off)}' MINUTE"


def _query(lo: int, hi: int, left: bool, between: bool) -> str:
    join = "LEFT JOIN" if left else "JOIN"
    if between:
        cond = f"s.event_time BETWEEN {_bound(lo)} AND {_bound(hi)}"
    else:
        cond = (
            f"s.event_time >= {_bound(lo)} "
            f"AND s.event_time <= {_bound(hi)}"
        )
    return (
        "SELECT o.event_time, o.symbol, o.price as o_price, "
        "s.price as s_price "
        f"FROM orders as o {join} shipments as s "
        f"ON o.symbol = s.symbol AND {cond}"
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


@settings(max_examples=20, deadline=None)
@given(
    orders=_ROWS,
    shipments=_ROWS,
    lo=st.integers(min_value=-3, max_value=2),
    width=st.integers(min_value=0, max_value=4),
    left=st.booleans(),
    between=st.booleans(),
)
def test_interval_join_matches_duckdb(
    spark, tmp_path_factory, orders, shipments, lo, width, left, between
):
    import duckdb

    hi = lo + width
    tmp_path = tmp_path_factory.mktemp("ivj_fuzz")
    runner = TransformRunner(
        spark, str(tmp_path), [(_query(lo, hi, left, between), None)]
    )
    st_time = ts(20)
    o_rows = [
        (i, st_time, ts(1, 0, m), s, p)
        for i, (s, m, p) in enumerate(sorted(orders))
    ]
    s_rows = [
        (i, st_time, ts(1, 0, m), s, p)
        for i, (s, m, p) in enumerate(sorted(shipments))
    ]
    op = str(tmp_path / "orders.parquet")
    sp = str(tmp_path / "shipments.parquet")
    _slice(op, o_rows)
    _slice(sp, s_rows)
    wm = ts(1, 1, 0)  # an hour past every event + bound: all released
    _, out = runner.run(
        [
            {"alias": "orders", "schema_file": op, "data_paths": [op],
             "watermark": wm},
            {"alias": "shipments", "schema_file": sp, "data_paths": [sp],
             "watermark": wm},
        ],
        system_time=st_time,
    )
    got = []
    if os.path.exists(out):
        got = sorted(
            (r.symbol, r.event_time.replace(tzinfo=None), r.o_price, r.s_price)
            for r in spark.read.parquet(out).collect()
        )

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE o(s VARCHAR, t TIMESTAMP, p INT)")
        con.execute("CREATE TABLE sh(s VARCHAR, t TIMESTAMP, p INT)")
        for s, m, p in orders:
            con.execute("INSERT INTO o VALUES (?, ?, ?)",
                        [s, ts(1, 0, m).replace(tzinfo=None), p])
        for s, m, p in shipments:
            con.execute("INSERT INTO sh VALUES (?, ?, ?)",
                        [s, ts(1, 0, m).replace(tzinfo=None), p])
        join = "LEFT JOIN" if left else "JOIN"
        want = sorted(
            tuple(r)
            for r in con.execute(
                f"SELECT o.s, o.t, o.p, sh.p FROM o {join} sh "
                "ON o.s = sh.s "
                f"AND sh.t >= o.t + INTERVAL ({lo}) MINUTE "
                f"AND sh.t <= o.t + INTERVAL ({hi}) MINUTE"
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want, (
        f"\nbounds=[{lo}, {hi}] left={left} between={between}"
        f"\norders={sorted(orders)}\nshipments={sorted(shipments)}"
        f"\ngot={got}\nwant={want}"
    )
