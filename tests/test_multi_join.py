"""Multi-join single-step expansion (plans/multi_join.py).

Flink chains stateful joins in one SQL step (planner delegation,
TransformEngine.scala:252-262); the engine expands an INNER multi-join
step into the equivalent chain of aliased single-join steps, each with
its own full-history state — so a 3-way join pairs across invocations at
EVERY stage. Any stage may be outer: a mid-chain outer's intermediate
emits a changelog the next stage consumes through the changelog-aware
join executor. Aggregation-over-multi-join keeps its loud rejection.
"""

import pyarrow.parquet as pq
import pytest

from kamu_engine_flink_spark.plans.multi_join import expand_multi_join
from kamu_engine_flink_spark.protocol.model import InvalidQueryError

from .helpers import TransformRunner, ticker_slice, ts

THREE_WAY = """SELECT a.event_time as event_time, a.symbol as symbol,
  a.price as pa, b.price as pb, c.price as pc
FROM a AS a
JOIN b AS b ON a.symbol = b.symbol
JOIN c AS c ON a.symbol = c.symbol"""


def _rows(out):
    return [
        (r["op"], r["symbol"], r["pa"], r["pb"], r["pc"])
        for r in pq.read_table(out).to_pylist()
    ]


def _inputs(tmp_path, name, a_rows, b_rows, c_rows, wm):
    out = []
    for alias, rows in (("a", a_rows), ("b", b_rows), ("c", c_rows)):
        p = str(tmp_path / "in" / f"{alias}_{name}.parquet")
        ticker_slice(p, rows)
        out.append(
            {"alias": alias, "data_paths": [p] if rows else [],
             "schema_file": p, "watermark": wm}
        )
    return out


def test_expand_shapes():
    cols = {"a": ["event_time", "symbol", "price"],
            "b": ["event_time", "symbol", "price"],
            "c": ["event_time", "symbol", "price"]}
    views = set(cols)
    steps = expand_multi_join(THREE_WAY, views, cols, "__mj0")
    assert steps is not None and len(steps) == 2
    (s0, a0), (s1, a1) = steps
    assert a0 == "__mj0_0" and a1 is None
    assert "JOIN b AS b" in s0 and "__mj_a__symbol" in s0
    assert "FROM __mj0_0" in s1 and "JOIN c AS c" in s1
    # a MID-chain outer expands too — the intermediate's changelog feeds
    # the next stage's changelog-aware join; a FINAL outer expands with
    # its pad/retract changelog originating in the last step
    mid_left = expand_multi_join(
        THREE_WAY.replace("JOIN b", "LEFT JOIN b"), views, cols, "t"
    )
    assert mid_left is not None and "LEFT JOIN b" in mid_left[0][0]
    final_left = expand_multi_join(
        THREE_WAY.replace("JOIN c", "LEFT JOIN c"), views, cols, "t"
    )
    assert final_left is not None and "LEFT JOIN c" in final_left[-1][0]
    # single joins decline (the single-join executors own them)
    assert expand_multi_join(
        "SELECT a.symbol FROM a AS a JOIN b AS b ON a.symbol = b.symbol",
        views, cols, "t",
    ) is None
    # bare reference to a non-final view's column declines (can't thread
    # through the intermediate projection)
    assert expand_multi_join(
        THREE_WAY.replace("a.price as pa", "price as pa"), views, cols, "t"
    ) is None


def test_three_way_join_cross_invocation(spark, tmp_path):
    """The third side arriving an invocation later must still pair —
    the intermediate join's history is state for the outer join."""
    runner = TransformRunner(spark, tmp_path, queries=[(THREE_WAY, None)])

    # Run 1: a and b pair on A; c has nothing — no output yet.
    resp, out = runner.run(
        _inputs(
            tmp_path, "r1",
            [(0, 0, ts(2), ts(1, 0, 1), "A", 1)],
            [(0, 0, ts(2), ts(1, 0, 2), "A", 2)],
            [],
            ts(1, 1, 0),
        ),
        system_time=ts(2),
    )
    import os

    assert resp.new_offset_interval is None and not os.path.exists(out)

    # Run 2: c's A row arrives — the buffered (a x b) pair completes.
    resp2, out2 = runner.run(
        _inputs(
            tmp_path, "r2", [], [],
            [(0, 0, ts(3), ts(1, 0, 3), "A", 3)],
            ts(1, 2, 0),
        ),
        system_time=ts(3),
    )
    assert _rows(out2) == [(0, "A", 1, 2, 3)]

    # Run 3: a second b row for A — a NEW (a x b) pair flows through the
    # chain and joins the buffered c row; nothing re-emits.
    resp3, out3 = runner.run(
        _inputs(
            tmp_path, "r3", [],
            [(1, 0, ts(4), ts(1, 0, 4), "A", 20)],
            [],
            ts(1, 3, 0),
        ),
        system_time=ts(4),
    )
    assert _rows(out3) == [(0, "A", 1, 20, 3)]


def test_three_way_join_single_invocation_matches_batch(spark, tmp_path):
    """One invocation with everything present = the plain batch 3-way
    join (and a 4-way chain also expands)."""
    four_way = """SELECT a.event_time as event_time, a.symbol as symbol,
  a.price as pa, b.price as pb, c.price as pc, d.price as pd
FROM a AS a
JOIN b AS b ON a.symbol = b.symbol
JOIN c AS c ON b.symbol = c.symbol
JOIN d AS d ON c.symbol = d.symbol"""
    runner = TransformRunner(spark, tmp_path, queries=[(four_way, None)])
    rows = {
        "a": [(0, 0, ts(2), ts(1, 0, 1), "A", 1), (1, 0, ts(2), ts(1, 0, 1), "B", 5)],
        "b": [(0, 0, ts(2), ts(1, 0, 2), "A", 2)],
        "c": [(0, 0, ts(2), ts(1, 0, 3), "A", 3)],
        "d": [(0, 0, ts(2), ts(1, 0, 4), "A", 4)],
    }
    inputs = []
    for alias in ("a", "b", "c", "d"):
        p = str(tmp_path / "in" / f"{alias}.parquet")
        ticker_slice(p, rows[alias])
        inputs.append(
            {"alias": alias, "data_paths": [p], "schema_file": p,
             "watermark": ts(1, 1, 0)}
        )
    resp, out = runner.run(inputs, system_time=ts(2))
    got = [
        (r["op"], r["symbol"], r["pa"], r["pb"], r["pc"], r["pd"])
        for r in pq.read_table(out).to_pylist()
    ]
    assert got == [(0, "A", 1, 2, 3, 4)]


def test_outer_mid_chain_pad_retract(spark, tmp_path):
    """LEFT join MID-chain: the intermediate (a LEFT b) pads while b has
    no partner; the pad's pair with c must RETRACT when b's row arrives
    and the corrected triple must emit — the next stage consumes the
    intermediate's changelog through the changelog-aware executor."""
    q = THREE_WAY.replace("JOIN b", "LEFT JOIN b")
    runner = TransformRunner(spark, tmp_path, queries=[(q, None)])
    resp, out = runner.run(
        _inputs(
            tmp_path, "r1",
            [(0, 0, ts(2), ts(1, 0, 1), "A", 1)],
            [],
            [(0, 0, ts(2), ts(1, 0, 3), "A", 3)],
            ts(1, 1, 0),
        ),
        system_time=ts(2),
    )
    assert _rows(out) == [(0, "A", 1, None, 3)]

    resp2, out2 = runner.run(
        _inputs(
            tmp_path, "r2", [],
            [(0, 0, ts(3), ts(1, 0, 2), "A", 2)],
            [],
            ts(1, 2, 0),
        ),
        system_time=ts(3),
    )
    assert _rows(out2) == [(1, "A", 1, None, 3), (0, "A", 1, 2, 3)]

    # Run 3: a second c partner pairs against the CURRENT intermediate.
    resp3, out3 = runner.run(
        _inputs(
            tmp_path, "r3", [], [],
            [(1, 0, ts(4), ts(1, 0, 4), "A", 30)],
            ts(1, 3, 0),
        ),
        system_time=ts(4),
    )
    assert _rows(out3) == [(0, "A", 1, 2, 30)]


def test_outer_mid_chain_fold_matches_batch(spark, tmp_path):
    """a LEFT b -> INNER c under slicing folds to the batch answer."""
    from collections import Counter

    a_rows = [(i, 0, ts(9), ts(1), f"S{i % 3}", 10 + i) for i in range(6)]
    b_rows = [(i, 0, ts(9), ts(1), f"S{i % 2}", 100 + i) for i in range(4)]
    c_rows = [(i, 0, ts(9), ts(1), f"S{i % 4}", 1000 + i) for i in range(4)]
    q = THREE_WAY.replace("JOIN b", "LEFT JOIN b")

    def run_sliced(tag, cuts_b, cuts_c):
        runner = TransformRunner(spark, tmp_path / tag, queries=[(q, None)])
        import os

        changelog = []
        bounds_b = [0, *cuts_b, len(b_rows)]
        bounds_c = [0, *cuts_c, len(c_rows)]
        for i in range(max(len(bounds_b), len(bounds_c)) - 1):
            bs = b_rows[bounds_b[i]: bounds_b[i + 1]] if i + 1 < len(bounds_b) else []
            cs = c_rows[bounds_c[i]: bounds_c[i + 1]] if i + 1 < len(bounds_c) else []
            resp, out = runner.run(
                _inputs(tmp_path / tag, f"r{i}",
                        a_rows if i == 0 else [], bs, cs, ts(1, i + 1, 0)),
                system_time=ts(2 + i),
            )
            if os.path.exists(out):
                changelog += _rows(out)
        state = Counter()
        for op, *vals in changelog:
            state[tuple(vals)] += 1 if op in (0, 3) else -1
            assert state[tuple(vals)] >= 0
        return Counter({k: v for k, v in state.items() if v})

    one = run_sliced("one", [], [])
    many = run_sliced("many", [1, 3], [2, 3])
    batch = spark.createDataFrame(
        [(r[4], r[5]) for r in a_rows], "symbol string, price int"
    ).alias("a").join(
        spark.createDataFrame(
            [(r[4], r[5]) for r in b_rows], "symbol string, price int"
        ).alias("b"),
        "symbol", "left",
    ).join(
        spark.createDataFrame(
            [(r[4], r[5]) for r in c_rows], "symbol string, price int"
        ).alias("c"),
        "symbol",
    ).selectExpr("symbol", "a.price pa", "b.price pb", "c.price pc").collect()
    expected = Counter((r.symbol, r.pa, r.pb, r.pc) for r in batch)
    assert one == expected
    assert many == expected


def test_final_left_join_chain_pad_retract(spark, tmp_path):
    """INNER chain ending in a LEFT join: the (a x b) pair pads while c
    has no partner, then the pad retracts when c's row arrives — the
    changelog originates in the final expanded step."""
    q = THREE_WAY.replace("JOIN c", "LEFT JOIN c")
    runner = TransformRunner(spark, tmp_path, queries=[(q, None)])
    resp, out = runner.run(
        _inputs(
            tmp_path, "r1",
            [(0, 0, ts(2), ts(1, 0, 1), "A", 1)],
            [(0, 0, ts(2), ts(1, 0, 2), "A", 2)],
            [],
            ts(1, 1, 0),
        ),
        system_time=ts(2),
    )
    assert _rows(out) == [(0, "A", 1, 2, None)]

    resp2, out2 = runner.run(
        _inputs(
            tmp_path, "r2", [], [],
            [(0, 0, ts(3), ts(1, 0, 3), "A", 3)],
            ts(1, 2, 0),
        ),
        system_time=ts(3),
    )
    assert _rows(out2) == [(1, "A", 1, 2, None), (0, "A", 1, 2, 3)]


def test_agg_over_multi_join_still_rejected(spark, tmp_path):
    q = """SELECT a.symbol as symbol, count(*) as n
FROM a AS a
JOIN b AS b ON a.symbol = b.symbol
JOIN c AS c ON a.symbol = c.symbol
GROUP BY a.symbol"""
    runner = TransformRunner(spark, tmp_path, queries=[(q, None)])
    with pytest.raises(InvalidQueryError):
        runner.run(
            _inputs(
                tmp_path, "r1",
                [(0, 0, ts(2), ts(1, 0, 1), "A", 1)], [], [], ts(1, 1, 0)
            ),
            system_time=ts(2),
        )


def test_multi_temporal_join_two_builds(spark, tmp_path):
    """Two FOR SYSTEM_TIME stages in ONE SQL step (Flink chains temporal
    joins freely): the step expands into probe -> asof(fx) -> asof(fee)
    with the intermediate's mangled time column driving the second
    stage's release gate."""
    query = """SELECT o.event_time as event_time, o.symbol as symbol,
  o.price as qty, f.price as fx_rate, g.price as fee_rate
FROM o
JOIN fx FOR SYSTEM_TIME AS OF o.event_time AS f ON o.symbol = f.symbol
JOIN fee FOR SYSTEM_TIME AS OF o.event_time AS g ON o.symbol = g.symbol"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(query, None)],
        temporal_tables=[("fx", "symbol"), ("fee", "symbol")],
    )

    def _in(name, o_rows, fx_rows, fee_rows, wm):
        out = []
        for alias, rows in (("o", o_rows), ("fx", fx_rows), ("fee", fee_rows)):
            p = str(tmp_path / "in" / f"{alias}_{name}.parquet")
            ticker_slice(p, rows)
            out.append({"alias": alias, "data_paths": [p] if rows else [],
                        "schema_file": p, "watermark": wm})
        return out

    def _r(out):
        return sorted(
            (r["symbol"], r["event_time"].isoformat(), r["qty"],
             r["fx_rate"], r["fee_rate"])
            for r in pq.read_table(out).to_pylist()
        )

    # Invocation 1: fx A=10@d1, A=20@d4; fee A=1@d1. Probes at d2 and d5
    # resolve (10,1) and (20,1) respectively.
    resp, out = runner.run(
        _in("r1",
            [(0, 0, ts(10), ts(2), "A", 100), (1, 0, ts(10), ts(5), "A", 200)],
            [(0, 0, ts(10), ts(1), "A", 10), (1, 0, ts(10), ts(4), "A", 20)],
            [(0, 0, ts(10), ts(1), "A", 1)],
            ts(6)),
        system_time=ts(10),
    )
    assert _r(out) == [
        ("A", ts(2).isoformat(), 100, 10, 1),
        ("A", ts(5).isoformat(), 200, 20, 1),
    ]

    # Invocation 2: a probe BEYOND the watermark buffers in stage 1, then
    # releases next invocation against versions live at its time.
    resp2, out2 = runner.run(
        _in("r2", [(2, 0, ts(12), ts(7), "A", 300)], [], [], ts(6, 12)),
        system_time=ts(12),
    )
    import os

    assert not os.path.exists(out2)
    resp3, out3 = runner.run(
        _in("r3", [], [(2, 0, ts(14), ts(8), "A", 30)],
            [(1, 0, ts(14), ts(8), "A", 2)], ts(9)),
        system_time=ts(14),
    )
    assert _r(out3) == [("A", ts(7).isoformat(), 300, 20, 1)]


def test_multi_join_temporal_over_changelog_build(spark, tmp_path):
    """A regular-join-free mixed chain: stage 1 probes a CHANGELOG build
    (continuous agg), stage 2 an append temporal table — one SQL step."""
    rates = """SELECT max(event_time) as event_time,
  symbol, sum(price) as rate FROM r GROUP BY symbol"""
    query = """SELECT o.event_time as event_time, o.symbol as symbol,
  o.price as qty, rt.rate as rate, g.price as fee_rate
FROM o AS o
JOIN rates FOR SYSTEM_TIME AS OF o.event_time AS rt ON o.symbol = rt.symbol
JOIN fee FOR SYSTEM_TIME AS OF o.event_time AS g ON o.symbol = g.symbol"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(rates, "rates"), (query, None)],
        temporal_tables=[("rates", "symbol"), ("fee", "symbol")],
    )

    def _in(name, r_rows, o_rows, fee_rows, wm):
        out = []
        for alias, rows in (("r", r_rows), ("o", o_rows), ("fee", fee_rows)):
            p = str(tmp_path / "in" / f"{alias}_{name}.parquet")
            ticker_slice(p, rows)
            out.append({"alias": alias, "data_paths": [p] if rows else [],
                        "schema_file": p, "watermark": wm})
        return out

    def _r(out):
        return sorted(
            (r["symbol"], r["event_time"].isoformat(), r["qty"],
             r["rate"], r["fee_rate"])
            for r in pq.read_table(out).to_pylist()
        )

    # Invocation 1: rate version A=10@d1; fee A=1@d1; probe at d2.
    resp, out = runner.run(
        _in("r1",
            [(0, 0, ts(10), ts(1), "A", 10)],
            [(0, 0, ts(10), ts(2), "A", 100)],
            [(0, 0, ts(10), ts(1), "A", 1)],
            ts(3)),
        system_time=ts(10),
    )
    assert _r(out) == [("A", ts(2).isoformat(), 100, 10, 1)]

    # Invocation 2: the rate corrects to 17 at d5; a probe at d4 still
    # sees 10 (old version), a probe at d6 sees 17.
    resp2, out2 = runner.run(
        _in("r2",
            [(1, 0, ts(12), ts(5), "A", 7)],
            [(1, 0, ts(12), ts(4), "A", 200), (2, 0, ts(12), ts(6), "A", 300)],
            [],
            ts(7)),
        system_time=ts(12),
    )
    assert _r(out2) == [
        ("A", ts(4).isoformat(), 200, 10, 1),
        ("A", ts(6).isoformat(), 300, 17, 1),
    ]
