"""Changelog-aware regular join: a join step consuming an UPDATING
(changelog-emitting) alias — Flink's retraction propagation into chained
joins (the reference delegates chained SQL to the planner,
TransformEngine.scala:252-262). The signed-ledger executor
(operators/changelog_join.py) must fold pads/retractions/correction pairs
as state deletions with exact pair retractions, so the full emitted
changelog folds to the batch answer under ANY slicing."""

import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from kamu_engine_flink_spark.protocol.model import InvalidQueryError

from .helpers import TransformRunner, ticker_slice, ts

LEFT_JOIN = """SELECT a.event_time as event_time, a.symbol as symbol,
  a.price as a_price, b.price as b_price
FROM a LEFT JOIN b ON a.symbol = b.symbol"""

INNER_OVER_J = """SELECT j.event_time as event_time, j.symbol as symbol,
  j.a_price as a_price, j.b_price as b_price, c.price as c_price
FROM j JOIN c ON j.symbol = c.symbol"""

LEFT_OVER_J = INNER_OVER_J.replace("JOIN c", "LEFT JOIN c")


def _inputs(tmp_path, name, slices: dict, wm):
    out = []
    for alias, rows in slices.items():
        p = str(tmp_path / "in" / f"{alias}_{name}.parquet")
        ticker_slice(p, rows)
        out.append(
            {
                "alias": alias,
                "data_paths": [p] if rows else [],
                "schema_file": p,
                "watermark": wm,
            }
        )
    return out


def _oprows(out, cols):
    table = pq.read_table(out)
    return [tuple(r[c] for c in ("op", *cols)) for r in table.to_pylist()]


def _fold_multiset(changelog):
    """Fold an op 0/1/2/3 row changelog into the surviving row multiset."""
    state = Counter()
    for op, *vals in changelog:
        if op in (0, 3):
            state[tuple(vals)] += 1
        else:
            state[tuple(vals)] -= 1
            assert state[tuple(vals)] >= 0, f"retract of absent {vals}"
    return Counter({k: v for k, v in state.items() if v})


COLS = ("symbol", "a_price", "b_price", "c_price")


def test_inner_join_over_updating_alias_retracts_pairs(spark, tmp_path):
    """(a LEFT b) alias j -> j INNER c: when b's partner arrives, the pad's
    retraction must retract the previously-emitted (pad x c) pair and the
    new (pair x c) row must emit — not two appends."""
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (INNER_OVER_J, None)]
    )
    # Run 1: a=A@10 pads (b empty); c=A@100 -> (A, 10, NULL, 100) emits.
    resp, out = runner.run(
        _inputs(
            tmp_path, "r1",
            {"a": [(0, 0, ts(2), ts(1, 0, 1), "A", 10)],
             "b": [],
             "c": [(0, 0, ts(2), ts(1, 0, 2), "A", 100)]},
            ts(1, 1, 0),
        ),
        system_time=ts(2),
    )
    assert _oprows(out, COLS) == [(0, "A", 10, None, 100)]

    # Run 2: b=A@7 arrives — upstream retracts the pad and emits the pair;
    # downstream must retract (A,10,NULL,100) and emit (A,10,7,100).
    resp2, out2 = runner.run(
        _inputs(tmp_path, "r2",
                {"a": [], "b": [(1, 0, ts(3), ts(1, 0, 3), "A", 7)], "c": []},
                ts(1, 2, 0)),
        system_time=ts(3),
    )
    assert _oprows(out2, COLS) == [
        (1, "A", 10, None, 100),
        (0, "A", 10, 7, 100),
    ]

    # Run 3: a second c partner pairs against the CURRENT j relation (the
    # folded pair, not the retracted pad).
    resp3, out3 = runner.run(
        _inputs(tmp_path, "r3",
                {"a": [], "b": [], "c": [(1, 0, ts(4), ts(1, 0, 4), "A", 200)]},
                ts(1, 3, 0)),
        system_time=ts(4),
    )
    assert _oprows(out3, COLS) == [(0, "A", 10, 7, 200)]


def test_left_join_over_updating_alias_pads_and_retracts(spark, tmp_path):
    """j LEFT c: an unmatched j row pads immediately; a j-row retraction
    (the upstream pad lifecycle) retracts the pad; a j correction moves
    the pad to the new values."""
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (LEFT_OVER_J, None)]
    )
    # Run 1: a=B@20, no b, no c: j = (B,20,NULL) pad; downstream pads again.
    resp, out = runner.run(
        _inputs(tmp_path, "r1",
                {"a": [(0, 0, ts(2), ts(1, 0, 1), "B", 20)], "b": [], "c": []},
                ts(1, 1, 0)),
        system_time=ts(2),
    )
    assert _oprows(out, COLS) == [(0, "B", 20, None, None)]

    # Run 2: b=B@5 — upstream retracts (B,20,NULL) and emits (B,20,5):
    # downstream pad moves to the corrected values.
    resp2, out2 = runner.run(
        _inputs(tmp_path, "r2",
                {"a": [], "b": [(0, 0, ts(3), ts(1, 0, 2), "B", 5)], "c": []},
                ts(1, 2, 0)),
        system_time=ts(3),
    )
    assert sorted(_oprows(out2, COLS)) == [
        (0, "B", 20, 5, None),
        (1, "B", 20, None, None),
    ]

    # Run 3: c=B@300 — the pad retracts, the pair emits.
    resp3, out3 = runner.run(
        _inputs(tmp_path, "r3",
                {"a": [], "b": [], "c": [(0, 0, ts(4), ts(1, 0, 3), "B", 300)]},
                ts(1, 3, 0)),
        system_time=ts(4),
    )
    assert sorted(_oprows(out3, COLS)) == [
        (0, "B", 20, 5, 300),
        (1, "B", 20, 5, None),
    ]


def test_updating_alias_on_right_side(spark, tmp_path):
    """The updating stream as the RIGHT input: c INNER j — retractions on
    the right must retract previously-emitted pairs."""
    inner = """SELECT c.event_time as event_time, c.symbol as symbol,
  c.price as c_price, j.b_price as b_price
FROM c JOIN j ON c.symbol = j.symbol"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (inner, None)]
    )
    resp, out = runner.run(
        _inputs(tmp_path, "r1",
                {"a": [(0, 0, ts(2), ts(1, 0, 1), "A", 10)],
                 "b": [],
                 "c": [(0, 0, ts(2), ts(1, 0, 2), "A", 100)]},
                ts(1, 1, 0)),
        system_time=ts(2),
    )
    assert _oprows(out, ("symbol", "c_price", "b_price")) == [(0, "A", 100, None)]

    resp2, out2 = runner.run(
        _inputs(tmp_path, "r2",
                {"a": [], "b": [(0, 0, ts(3), ts(1, 0, 3), "A", 7)], "c": []},
                ts(1, 2, 0)),
        system_time=ts(3),
    )
    assert _oprows(out2, ("symbol", "c_price", "b_price")) == [
        (1, "A", 100, None),
        (0, "A", 100, 7),
    ]


def test_agg_corrections_into_join(spark, tmp_path):
    """Continuous-agg correction pairs (op 2/3) consumed by a join: each
    correction must retract the old pair and emit the new one. The agg's
    re-stamped now() event time is UNREFERENCED by the join, so the
    pruned ledger cancels exactly."""
    agg = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, count(`op`) as n FROM a GROUP BY symbol"""
    join = """SELECT c.event_time as event_time, c.symbol as symbol,
  g.n as n, c.price as c_price
FROM g JOIN c ON g.symbol = c.symbol"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(agg, "g"), (join, None)]
    )
    resp, out = runner.run(
        _inputs(tmp_path, "r1",
                {"a": [(0, 0, ts(2), ts(1, 0, 1), "A", 10)],
                 "c": [(0, 0, ts(2), ts(1, 0, 2), "A", 100)]},
                ts(1, 1, 0)),
        system_time=ts(2),
    )
    assert _oprows(out, ("symbol", "n", "c_price")) == [(0, "A", 1, 100)]

    # A's second event: g corrects n 1 -> 2; the join must retract
    # (A, 1, 100) and emit (A, 2, 100).
    resp2, out2 = runner.run(
        _inputs(tmp_path, "r2",
                {"a": [(1, 0, ts(3), ts(1, 0, 3), "A", 11)], "c": []},
                ts(1, 2, 0)),
        system_time=ts(3),
    )
    assert _oprows(out2, ("symbol", "n", "c_price")) == [
        (1, "A", 1, 100),
        (0, "A", 2, 100),
    ]

    # A third c partner pairs against the CURRENT g relation only: the
    # correction pair from run 2 must have cancelled in g's ledger (its
    # re-stamped now() event time is unreferenced by the join and must be
    # pruned ALIAS-AWARE — the token `event_time` appears in the SQL, but
    # only as c's column and an output alias). A word-based prune keeps
    # it, the pair never cancels, and abs() on the negative net emits
    # phantom (A, 1, 200) pairs (advisor round-6 high #2).
    resp3, out3 = runner.run(
        _inputs(tmp_path, "r3",
                {"a": [], "c": [(1, 0, ts(4), ts(1, 0, 4), "A", 200)]},
                ts(1, 3, 0)),
        system_time=ts(4),
    )
    assert _oprows(out3, ("symbol", "n", "c_price")) == [(0, "A", 2, 200)]


def test_fold_slice_invariance_three_way(spark, tmp_path):
    """(a LEFT b) LEFT c under different slicings of b and c: the folded
    output multiset must equal the batch three-way left join."""

    a_rows = [(i, 0, ts(9), ts(1), f"S{i % 4}", 10 + i) for i in range(8)]
    b_rows = [(i, 0, ts(9), ts(1), f"S{i % 3}", 100 + i) for i in range(6)]
    c_rows = [(i, 0, ts(9), ts(1), f"S{i % 5}", 1000 + i) for i in range(5)]

    def run_sliced(tag, cuts_b, cuts_c):
        runner = TransformRunner(
            spark, tmp_path / tag,
            queries=[(LEFT_JOIN, "j"), (LEFT_OVER_J, None)],
        )
        os.makedirs(tmp_path / tag / "in", exist_ok=True)
        changelog = []
        bounds_b = [0, *cuts_b, len(b_rows)]
        bounds_c = [0, *cuts_c, len(c_rows)]
        n_rounds = max(len(bounds_b), len(bounds_c)) - 1
        for i in range(n_rounds):
            bs = b_rows[bounds_b[i]: bounds_b[i + 1]] if i + 1 < len(bounds_b) else []
            cs = c_rows[bounds_c[i]: bounds_c[i + 1]] if i + 1 < len(bounds_c) else []
            resp, out = runner.run(
                _inputs(tmp_path / tag, f"r{i}",
                        {"a": a_rows if i == 0 else [], "b": bs, "c": cs},
                        ts(1, i + 1, 0)),
                system_time=ts(2 + i),
            )
            if os.path.exists(out):
                changelog += _oprows(out, COLS)
        return _fold_multiset(changelog)

    one = run_sliced("one", [], [])
    many = run_sliced("many", [2, 4], [1, 3])

    # Batch oracle via Spark itself.
    from .helpers import write_input_slice  # noqa: F401
    import pyarrow as pa

    def tbl(rows):
        return spark.createDataFrame(
            [(r[4], r[5]) for r in rows], "symbol string, price int"
        )

    a, b, c = tbl(a_rows), tbl(b_rows), tbl(c_rows)
    a.createOrReplaceTempView("ba")
    b.createOrReplaceTempView("bb")
    c.createOrReplaceTempView("bc")
    batch = spark.sql(
        """SELECT ba.symbol, ba.price a_price, bb.price b_price, bc.price c_price
           FROM ba LEFT JOIN bb ON ba.symbol = bb.symbol
                   LEFT JOIN bc ON ba.symbol = bc.symbol"""
    ).collect()
    expected = Counter((r.symbol, r.a_price, r.b_price, r.c_price) for r in batch)
    assert one == expected
    assert many == expected


def test_non_equi_join_over_updating_rejected(spark, tmp_path):
    q = """SELECT j.event_time as event_time, j.symbol as symbol, c.price as c_price
FROM j JOIN c ON j.a_price < c.price"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (q, None)]
    )
    with pytest.raises(InvalidQueryError, match="pure equi-join"):
        runner.run(
            _inputs(tmp_path, "r1",
                    {"a": [(0, 0, ts(2), ts(1), "A", 10)], "b": [], "c": []},
                    ts(1, 1, 0)),
            system_time=ts(2),
        )


def test_self_join_over_updating_alias(spark, tmp_path):
    """Self-join of an updating alias (g JOIN g ON equal counts): a
    correction must retract every pair the old row participated in —
    on BOTH sides — and emit the new row's pairs."""
    agg = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, count(`op`) as n FROM a GROUP BY symbol"""
    join = """SELECT cast(now() as timestamp(3)) as event_time,
  x.symbol as xs, y.symbol as ys, x.n as n
FROM g as x JOIN g as y ON x.n = y.n"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(agg, "g"), (join, None)]
    )

    def _r(out):
        table = pq.read_table(out)
        return sorted(
            (r["op"], r["xs"], r["ys"], r["n"]) for r in table.to_pylist()
        )

    # Run 1: A and B both at count 1 — all four (x, y) pairs emit.
    resp, out = runner.run(
        _inputs(tmp_path, "r1",
                {"a": [(0, 0, ts(2), ts(1, 0, 1), "A", 10),
                       (1, 0, ts(2), ts(1, 0, 2), "B", 20)]},
                ts(1, 1, 0)),
        system_time=ts(2),
    )
    assert _r(out) == [
        (0, "A", "A", 1), (0, "A", "B", 1), (0, "B", "A", 1), (0, "B", "B", 1),
    ]

    # Run 2: A's count corrects 1 -> 2: the three pairs touching (A, 1)
    # retract; (A, 2) pairs only with itself.
    resp2, out2 = runner.run(
        _inputs(tmp_path, "r2",
                {"a": [(2, 0, ts(3), ts(1, 0, 3), "A", 11)]},
                ts(1, 2, 0)),
        system_time=ts(3),
    )
    assert _r(out2) == [
        (0, "A", "A", 2),
        (1, "A", "A", 1), (1, "A", "B", 1), (1, "B", "A", 1),
    ]

    # Folded: {(A,A,2), (B,B,1)} — the batch self-join of the final state.
    folded = _fold_multiset(
        [(op, xs, ys, n) for op, xs, ys, n in _r(out) + _r(out2)]
    )
    assert folded == Counter({("A", "A", 2): 1, ("B", "B", 1): 1})
