"""Property test for the temporal (as-of) join — BOTH Flink spellings
through the full dialect-rewrite + stateful-executor stack, checked
against DuckDB's native ASOF JOIN on random data (the same pattern as
tests/test_unnest_fuzz.py and the parse_setop fuzz): random version
histories and probe streams per key, random spelling (`FOR SYSTEM_TIME
AS OF` vs `LATERAL TABLE`), everything released by a max-time watermark,
compared row-for-row. Reference semantics:
EngineJoinStreamToTemporalTableTest.scala:71-341."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from .helpers import TransformRunner, ts, write_input_slice

SYSTEM_TIME_Q = """SELECT
  t.event_time, t.symbol, t.qty as qty, r.rate as rate
FROM trades AS t
JOIN rates FOR SYSTEM_TIME AS OF t.event_time AS r
ON t.symbol = r.symbol"""

LATERAL_Q = """SELECT
  t.event_time, t.symbol, t.qty as qty, r.rate as rate
FROM trades AS t, LATERAL TABLE (rates(t.event_time)) AS r
WHERE t.symbol = r.symbol"""

_SYM = st.sampled_from(["A", "B"])
_MIN = st.integers(min_value=0, max_value=12)  # minute offsets
_VAL = st.integers(min_value=1, max_value=9)

_VERSIONS = st.lists(
    st.tuples(_SYM, _MIN, _VAL), min_size=1, max_size=8,
    unique_by=lambda t: (t[0], t[1]),
)
_PROBES = st.lists(
    st.tuples(_SYM, _MIN, _VAL), min_size=1, max_size=8,
    unique_by=lambda t: (t[0], t[1]),
)


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


@settings(max_examples=25, deadline=None)
@given(
    versions=_VERSIONS,
    probes=_PROBES,
    lateral=st.booleans(),
)
def test_asof_join_matches_duckdb_asof(spark, tmp_path_factory, versions, probes, lateral):
    import duckdb

    tmp_path = tmp_path_factory.mktemp("asof_fuzz")
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [(LATERAL_Q if lateral else SYSTEM_TIME_Q, None)],
        temporal_tables=[("rates", "symbol")],
    )
    st_time = ts(20)
    v_rows = [
        (i, st_time, ts(1, 0, m), s, r)
        for i, (s, m, r) in enumerate(sorted(versions))
    ]
    p_rows = [
        (i, st_time, ts(1, 0, m), s, q)
        for i, (s, m, q) in enumerate(sorted(probes))
    ]
    vp = str(tmp_path / "rates.parquet")
    pp = str(tmp_path / "trades.parquet")
    _slice(vp, v_rows, "rate")
    _slice(pp, p_rows, "qty")
    wm = ts(1, 0, 13)  # past every event: everything releases
    _, out = runner.run(
        [
            {"alias": "rates", "schema_file": vp, "data_paths": [vp],
             "watermark": wm},
            {"alias": "trades", "schema_file": pp, "data_paths": [pp],
             "watermark": wm},
        ],
        system_time=st_time,
    )
    import os

    got = []
    if os.path.exists(out):
        got = sorted(
            (r.symbol, r.event_time, r.qty, r.rate)
            for r in spark.read.parquet(out).collect()
        )

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE v(s VARCHAR, t TIMESTAMP, r INT)")
        con.execute("CREATE TABLE p(s VARCHAR, t TIMESTAMP, q INT)")
        for s, m, r in versions:
            con.execute("INSERT INTO v VALUES (?, ?, ?)", [s, ts(1, 0, m).replace(tzinfo=None), r])
        for s, m, q in probes:
            con.execute("INSERT INTO p VALUES (?, ?, ?)", [s, ts(1, 0, m).replace(tzinfo=None), q])
        want = sorted(
            (s, t, q, r)
            for s, t, q, r in con.execute(
                "SELECT p.s, p.t, p.q, v.r FROM p ASOF JOIN v "
                "ON p.s = v.s AND p.t >= v.t"
            ).fetchall()
        )
    finally:
        con.close()
    got_naive = [(s, t.replace(tzinfo=None), q, r) for s, t, q, r in got]
    assert got_naive == want, (
        f"\nspelling={'LATERAL' if lateral else 'SYSTEM_TIME'}"
        f"\nversions={sorted(versions)}\nprobes={sorted(probes)}"
        f"\ngot={got_naive}\nwant={want}"
    )


@settings(max_examples=15, deadline=None)
@given(
    versions=_VERSIONS,
    probes=_PROBES,
    lateral=st.booleans(),
    split=st.integers(min_value=1, max_value=12),
)
def test_asof_join_random_slicing_folds_to_batch(
    spark, tmp_path_factory, versions, probes, lateral, split
):
    """Fold-to-batch law under RANDOM slicing: the same data split at a
    random minute into two chained invocations (state through the
    checkpoint) must union to the single-invocation / DuckDB ASOF
    answer. This fuzzes cross-invocation version state, probe
    buffering, and watermark release at arbitrary boundaries."""
    import os

    import duckdb

    tmp_path = tmp_path_factory.mktemp("asof_slice_fuzz")
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [(LATERAL_Q if lateral else SYSTEM_TIME_Q, None)],
        temporal_tables=[("rates", "symbol")],
    )
    st_time = ts(20)
    got = []
    for inv, (lo, hi, wm_min) in enumerate(
        [(0, split, split - 1), (split, 13, 13)]
    ):
        v_rows = [
            (i, st_time, ts(1, 0, m), s, r)
            for i, (s, m, r) in enumerate(sorted(versions))
            if lo <= m < hi
        ]
        p_rows = [
            (i + 100, st_time, ts(1, 0, m), s, q)
            for i, (s, m, q) in enumerate(sorted(probes))
            if lo <= m < hi
        ]
        vp = str(tmp_path / f"rates{inv}.parquet")
        pp = str(tmp_path / f"trades{inv}.parquet")
        _slice(vp, v_rows, "rate")
        _slice(pp, p_rows, "qty")
        wm = ts(1, 0, wm_min)
        _, out = runner.run(
            [
                {"alias": "rates", "schema_file": vp,
                 "data_paths": [vp] if v_rows else [], "watermark": wm},
                {"alias": "trades", "schema_file": pp,
                 "data_paths": [pp] if p_rows else [], "watermark": wm},
            ],
            system_time=st_time,
        )
        if os.path.exists(out):
            got.extend(
                (r.symbol, r.event_time.replace(tzinfo=None), r.qty, r.rate)
                for r in spark.read.parquet(out).collect()
            )
    got = sorted(got)

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE v(s VARCHAR, t TIMESTAMP, r INT)")
        con.execute("CREATE TABLE p(s VARCHAR, t TIMESTAMP, q INT)")
        for s, m, r in versions:
            con.execute("INSERT INTO v VALUES (?, ?, ?)",
                        [s, ts(1, 0, m).replace(tzinfo=None), r])
        for s, m, q in probes:
            con.execute("INSERT INTO p VALUES (?, ?, ?)",
                        [s, ts(1, 0, m).replace(tzinfo=None), q])
        want = sorted(
            tuple(r)
            for r in con.execute(
                "SELECT p.s, p.t, p.q, v.r FROM p ASOF JOIN v "
                "ON p.s = v.s AND p.t >= v.t"
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want, (
        f"\nsplit={split} spelling={'LATERAL' if lateral else 'SYSTEM_TIME'}"
        f"\nversions={sorted(versions)}\nprobes={sorted(probes)}"
        f"\ngot={got}\nwant={want}"
    )
