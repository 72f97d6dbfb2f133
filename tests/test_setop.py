"""Stateful cross-invocation set operations (operators/setop_step.py).

Flink SQL supports UNION / INTERSECT [ALL] / EXCEPT [ALL] in streaming
mode (reference surface via planner delegation,
TransformEngine.scala:252-262); per-slice evaluation would pair only
same-invocation rows. These tests pin the cross-invocation semantics:
a value arriving on one side in invocation 1 and the other side in
invocation 2 must pair; EXCEPT must retract when the subtrahend arrives
later."""

from __future__ import annotations

import pytest

from kamu_engine_flink_spark.plans.classify import SETOP, classify, parse_setop
from kamu_engine_flink_spark.protocol.model import InvalidQueryError

from .helpers import TransformRunner, ticker_slice, ts


def _two_input_runner(spark, tmp_path, setop_sql, final_cols="symbol"):
    return TransformRunner(
        spark,
        str(tmp_path),
        [
            (setop_sql, "sv"),
            (
                "SELECT cast(now() as timestamp(3)) as event_time, "
                f"{final_cols} FROM sv",
                None,
            ),
        ],
    )


def _slices(tmp_path, name, rows):
    path = str(tmp_path / "in" / f"{name}.parquet")
    ticker_slice(path, rows)
    return path


def _run(runner, tmp_path, inv, a_rows, b_rows, st):
    a = _slices(tmp_path, f"a{inv}", a_rows)
    b = _slices(tmp_path, f"b{inv}", b_rows)
    wm_a = max(r[3] for r in a_rows) if a_rows else None
    wm_b = max(r[3] for r in b_rows) if b_rows else None
    _, out = runner.run(
        [
            {"alias": "a", "schema_file": a, "data_paths": [a] if a_rows else [],
             "watermark": wm_a},
            {"alias": "b", "schema_file": b, "data_paths": [b] if b_rows else [],
             "watermark": wm_b},
        ],
        system_time=st,
    )
    return out


def _read(spark, out):
    import os

    if not os.path.exists(out):
        return []
    return sorted(
        (r.op, r.symbol) for r in spark.read.parquet(out).collect()
    )


def test_classification():
    views = {"a", "b"}
    assert classify("SELECT x FROM a INTERSECT SELECT x FROM b", views) == SETOP
    assert classify("SELECT x FROM a EXCEPT ALL SELECT x FROM b", views) == SETOP
    assert classify("SELECT x FROM a MINUS SELECT x FROM b", views) == SETOP
    assert classify("SELECT x FROM a UNION SELECT x FROM b", views) == SETOP
    assert classify("SELECT x FROM a UNION ALL SELECT x FROM b", views) == "map"
    op, allf, branches = parse_setop(
        "SELECT x FROM a EXCEPT ALL SELECT x FROM b EXCEPT ALL SELECT x FROM c"
    )
    assert (op, allf, len(branches)) == ("EXCEPT", True, 3)
    with pytest.raises(InvalidQueryError, match="ORDER BY"):
        parse_setop("SELECT x FROM a INTERSECT SELECT x FROM b ORDER BY x")


def test_mixed_chain_parse_tree():
    # Standard SQL precedence: INTERSECT binds tighter; UNION/EXCEPT
    # associate left. Mixed chains decompose into nested nodes instead
    # of rejecting (Flink's planner nests them freely).
    assert parse_setop(
        "SELECT x FROM a UNION SELECT x FROM b INTERSECT SELECT x FROM c"
    ) == (
        "UNION",
        False,
        ["SELECT x FROM a", ("INTERSECT", False, ["SELECT x FROM b", "SELECT x FROM c"])],
    )
    assert parse_setop(
        "SELECT x FROM a UNION SELECT x FROM b EXCEPT SELECT x FROM c"
    ) == (
        "EXCEPT",
        False,
        [("UNION", False, ["SELECT x FROM a", "SELECT x FROM b"]), "SELECT x FROM c"],
    )
    # Parenthesized sub-chains override precedence.
    assert parse_setop(
        "SELECT x FROM a EXCEPT (SELECT x FROM b UNION SELECT x FROM c)"
    ) == (
        "EXCEPT",
        False,
        ["SELECT x FROM a", ("UNION", False, ["SELECT x FROM b", "SELECT x FROM c"])],
    )
    # UNION ALL splices stateless leaves; over a stateful result it
    # becomes a changelog-concatenation node (Flink unions changelogs
    # freely).
    assert parse_setop(
        "SELECT x FROM a UNION ALL SELECT x FROM b EXCEPT SELECT x FROM c"
    ) == (
        "EXCEPT",
        False,
        ["SELECT x FROM a UNION ALL SELECT x FROM b", "SELECT x FROM c"],
    )
    assert parse_setop(
        "SELECT x FROM a EXCEPT SELECT x FROM b UNION ALL SELECT x FROM c"
    ) == (
        "UNIONALL",
        False,
        [("EXCEPT", False, ["SELECT x FROM a", "SELECT x FROM b"]), "SELECT x FROM c"],
    )
    # MINUS normalizes to EXCEPT; same-op runs stay n-ary flat.
    assert parse_setop(
        "SELECT x FROM a MINUS SELECT x FROM b MINUS SELECT x FROM c"
    ) == ("EXCEPT", False, ["SELECT x FROM a", "SELECT x FROM b", "SELECT x FROM c"])


def test_intersect_pairs_across_invocations(spark, tmp_path):
    runner = _two_input_runner(
        spark, tmp_path, "SELECT symbol FROM a INTERSECT SELECT symbol FROM b"
    )
    out1 = _run(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "A", 1.0), (1, 0, ts(1), ts(1, 2), "B", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "B", 1.0)],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "B")]
    # A arrived on `a` in invocation 1 and on `b` in invocation 2: the
    # stateful intersect pairs them; per-slice evaluation would miss it.
    out2 = _run(
        runner, tmp_path, 2,
        [(2, 0, ts(3), ts(3, 1), "C", 1.0)],
        [(1, 0, ts(3), ts(3, 1), "A", 1.0)],
        st=ts(4),
    )
    assert _read(spark, out2) == [(0, "A")]
    # Re-arrivals of already-live values emit nothing (distinct variant).
    out3 = _run(
        runner, tmp_path, 3,
        [(3, 0, ts(5), ts(5, 1), "A", 1.0)],
        [(2, 0, ts(5), ts(5, 1), "B", 1.0)],
        st=ts(6),
    )
    assert _read(spark, out3) == []


def test_except_retracts_on_late_subtrahend(spark, tmp_path):
    runner = _two_input_runner(
        spark, tmp_path, "SELECT symbol FROM a EXCEPT SELECT symbol FROM b"
    )
    out1 = _run(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "A", 1.0), (1, 0, ts(1), ts(1, 2), "B", 1.0)],
        [],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "A"), (0, "B")]
    # B arrives on the subtrahend later: its earlier emission retracts.
    out2 = _run(
        runner, tmp_path, 2,
        [],
        [(0, 0, ts(3), ts(3, 1), "B", 1.0)],
        st=ts(4),
    )
    assert _read(spark, out2) == [(1, "B")]
    # A value already dead on arrival (b first) never emits.
    out3 = _run(
        runner, tmp_path, 3,
        [(2, 0, ts(5), ts(5, 1), "B", 1.0)],
        [],
        st=ts(6),
    )
    assert _read(spark, out3) == []


def test_except_all_multiplicities(spark, tmp_path):
    runner = _two_input_runner(
        spark, tmp_path, "SELECT symbol FROM a EXCEPT ALL SELECT symbol FROM b"
    )
    # a: A x3; b: A x1 -> live multiplicity 2 -> two op-0 copies.
    out1 = _run(
        runner, tmp_path, 1,
        [
            (0, 0, ts(1), ts(1, 1), "A", 1.0),
            (1, 0, ts(1), ts(1, 2), "A", 1.0),
            (2, 0, ts(1), ts(1, 3), "A", 1.0),
        ],
        [(0, 0, ts(1), ts(1, 1), "A", 1.0)],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "A"), (0, "A")]
    # b: A x1 more -> multiplicity 2 -> 1: one retraction.
    out2 = _run(
        runner, tmp_path, 2,
        [],
        [(1, 0, ts(3), ts(3, 1), "A", 1.0)],
        st=ts(4),
    )
    assert _read(spark, out2) == [(1, "A")]


def test_intersect_all_min_counts(spark, tmp_path):
    runner = _two_input_runner(
        spark, tmp_path,
        "SELECT symbol FROM a INTERSECT ALL SELECT symbol FROM b",
    )
    # a: A x2; b: A x1 -> min = 1 copy.
    out1 = _run(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "A", 1.0), (1, 0, ts(1), ts(1, 2), "A", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "A", 1.0)],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "A")]
    # b: A x2 more -> min(2, 3) = 2 -> one more copy.
    out2 = _run(
        runner, tmp_path, 2,
        [],
        [(1, 0, ts(3), ts(3, 1), "A", 1.0), (2, 0, ts(3), ts(3, 2), "A", 1.0)],
        st=ts(4),
    )
    assert _read(spark, out2) == [(0, "A")]


def test_union_distinct_across_branches_and_invocations(spark, tmp_path):
    runner = _two_input_runner(
        spark, tmp_path, "SELECT symbol FROM a UNION SELECT symbol FROM b"
    )
    out1 = _run(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "A", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "A", 1.0), (1, 0, ts(1), ts(1, 2), "B", 1.0)],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "A"), (0, "B")]
    # Values seen in ANY earlier invocation (on either side) suppress.
    out2 = _run(
        runner, tmp_path, 2,
        [(1, 0, ts(3), ts(3, 1), "B", 1.0), (2, 0, ts(3), ts(3, 2), "C", 1.0)],
        [],
        st=ts(4),
    )
    assert _read(spark, out2) == [(0, "C")]


def test_except_fold_to_batch_law(spark, tmp_path):
    """Folding the op-0/op-1 changelog across 2 invocations equals the
    one-shot batch EXCEPT of the full inputs."""
    import random

    rng = random.Random(7)
    a_rows = [(i, 0, ts(1), ts(1, i % 23 + 1 if False else 1, i % 59),
               f"S{rng.randrange(12)}", 1.0) for i in range(40)]
    b_rows = [(i, 0, ts(1), ts(1, 1, i % 59),
               f"S{rng.randrange(12)}", 1.0) for i in range(25)]
    cut_a, cut_b = 24, 11
    runner = _two_input_runner(
        spark, tmp_path, "SELECT symbol FROM a EXCEPT SELECT symbol FROM b"
    )
    folded: dict[str, int] = {}
    for inv, (asl, bsl) in enumerate(
        [(a_rows[:cut_a], b_rows[:cut_b]), (a_rows[cut_a:], b_rows[cut_b:])]
    ):
        asl = [(o,) + r[1:] for o, r in enumerate(asl)] if inv else asl
        out = _run(runner, tmp_path, inv + 1, asl, bsl, st=ts(2 + inv))
        for op, sym in _read(spark, out):
            folded[sym] = folded.get(sym, 0) + (1 if op == 0 else -1)
    live = sorted(s for s, n in folded.items() if n > 0)
    assert all(n in (0, 1) for n in folded.values())
    a_syms = {r[4] for r in a_rows}
    b_syms = {r[4] for r in b_rows}
    assert live == sorted(a_syms - b_syms)


def test_setop_rejects(spark, tmp_path):
    # A stateful branch (aggregation) must not silently run per-slice.
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT symbol FROM a GROUP BY symbol "
                "INTERSECT SELECT symbol FROM b",
                "sv",
            ),
            ("SELECT cast(now() as timestamp(3)) as event_time, symbol FROM sv", None),
        ],
    )
    a = _slices(tmp_path, "ra", [(0, 0, ts(1), ts(1, 1), "A", 1.0)])
    b = _slices(tmp_path, "rb", [(0, 0, ts(1), ts(1, 1), "A", 1.0)])
    with pytest.raises(InvalidQueryError):
        runner.run(
            [
                {"alias": "a", "schema_file": a, "data_paths": [a], "watermark": ts(1, 1)},
                {"alias": "b", "schema_file": b, "data_paths": [b], "watermark": ts(1, 1)},
            ],
            system_time=ts(2),
        )


def test_intersect_over_updating_branch(spark, tmp_path):
    """A set-operation branch over an UPDATING alias contributes SIGNED
    counts (Flink's set operators consume retraction streams): when the
    continuous aggregate corrects (A, 1) -> (A, 2), the intersection
    retracts (A, 1) — op 1 — and admits (A, 2) once the right side
    carries it."""
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT cast(now() as timestamp(3)) as event_time, "
                "symbol, count(*) as n FROM a GROUP BY symbol",
                "ag",
            ),
            (
                "SELECT symbol, n FROM ag "
                "INTERSECT SELECT symbol, cast(price as bigint) AS n FROM b",
                "sv",
            ),
            (
                "SELECT cast(now() as timestamp(3)) as event_time, "
                "symbol, n FROM sv",
                None,
            ),
        ],
    )

    def _run(inv, a_rows, b_rows, st):
        a = _slices(tmp_path, f"ua{inv}", a_rows)
        b = _slices(tmp_path, f"ub{inv}", b_rows)
        _, out = runner.run(
            [
                {"alias": "a", "schema_file": a,
                 "data_paths": [a] if a_rows else [],
                 "watermark": max(r[3] for r in a_rows) if a_rows else None},
                {"alias": "b", "schema_file": b,
                 "data_paths": [b] if b_rows else [],
                 "watermark": max(r[3] for r in b_rows) if b_rows else None},
            ],
            system_time=st,
        )
        return out

    def _read(out):
        import os

        if not os.path.exists(out):
            return []
        return sorted(
            (r.op, r.symbol, r.n)
            for r in spark.read.parquet(out).collect()
        )

    # inv 1: agg emits (A, 1) op 0; b carries (A, 1) -> live.
    out1 = _run(
        1,
        [(0, 0, ts(1), ts(1, 1), "A", 9.0)],
        [(0, 0, ts(1), ts(1, 1), "A", 1.0)],
        st=ts(2),
    )
    assert _read(out1) == [(0, "A", 1)]

    # inv 2: a second A -> agg corrects (A,1)->(A,2): the op-2 retract
    # kills (A, 1) in the intersection (op 1); (A, 2) is not live until
    # the right side carries it — which this invocation also delivers.
    out2 = _run(
        2,
        [(1, 0, ts(3), ts(3, 1), "A", 9.0)],
        [(1, 0, ts(3), ts(3, 1), "A", 2.0)],
        st=ts(4),
    )
    assert _read(out2) == [(0, "A", 2), (1, "A", 1)]


def test_union_over_updating_branch_retracts(spark, tmp_path):
    """UNION over an updating branch: a tuple leaves the union (op 1)
    when its only carrier — the aggregate's old accumulator row — is
    corrected away and no other branch holds it."""
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT cast(now() as timestamp(3)) as event_time, "
                "symbol, count(*) as n FROM a GROUP BY symbol",
                "ag",
            ),
            (
                "SELECT symbol, n FROM ag "
                "UNION SELECT symbol, cast(price as bigint) AS n FROM b",
                "sv",
            ),
            (
                "SELECT cast(now() as timestamp(3)) as event_time, "
                "symbol, n FROM sv",
                None,
            ),
        ],
    )
    a1 = _slices(tmp_path, "wa1", [(0, 0, ts(1), ts(1, 1), "A", 9.0)])
    b1 = _slices(tmp_path, "wb1", [(0, 0, ts(1), ts(1, 1), "B", 7.0)])
    _, out1 = runner.run(
        [
            {"alias": "a", "schema_file": a1, "data_paths": [a1], "watermark": ts(1, 1)},
            {"alias": "b", "schema_file": b1, "data_paths": [b1], "watermark": ts(1, 1)},
        ],
        system_time=ts(2),
    )
    rows1 = sorted((r.op, r.symbol, r.n) for r in spark.read.parquet(out1).collect())
    assert rows1 == [(0, "A", 1), (0, "B", 7)]

    # inv 2: (A,1) corrects to (A,2) -> union retracts (A,1), inserts (A,2).
    a2 = _slices(tmp_path, "wa2", [(1, 0, ts(3), ts(3, 1), "A", 9.0)])
    b2 = _slices(tmp_path, "wb2", [])
    _, out2 = runner.run(
        [
            {"alias": "a", "schema_file": a2, "data_paths": [a2], "watermark": ts(3, 1)},
            {"alias": "b", "schema_file": b2, "data_paths": [], "watermark": None},
        ],
        system_time=ts(4),
    )
    import os

    rows2 = (
        sorted((r.op, r.symbol, r.n) for r in spark.read.parquet(out2).collect())
        if os.path.exists(out2)
        else []
    )
    assert rows2 == [(0, "A", 2), (1, "A", 1)]


@pytest.mark.parametrize(
    "setop,allf",
    [
        ("UNION", False),
        ("INTERSECT", False),
        ("INTERSECT ALL", True),
        ("EXCEPT", False),
        ("EXCEPT ALL", True),
    ],
)
def test_setop_random_brute_force(spark, tmp_path, setop, allf):
    """Randomized brute-force model: 3 invocations of random symbol
    multisets on each branch; after every invocation the executor's
    emission must equal the delta of the live multiset computed from the
    cumulative branch counts by the operator's formula — per invocation,
    not just folded at the end."""
    import random
    from collections import Counter

    rng = random.Random(sum(map(ord, setop)))
    syms = ["S0", "S1", "S2", "S3", "S4", "S5"]

    def live(l: int, r: int) -> int:
        base = setop.split()[0]
        if base == "UNION":
            return 1 if (l + r) > 0 else 0
        if base == "INTERSECT":
            m = min(l, r)
            return m if allf else (1 if m > 0 else 0)
        d = l - r
        return max(0, d) if allf else (1 if (l > 0 and r == 0) else 0)

    runner = _two_input_runner(
        spark, tmp_path,
        f"SELECT symbol FROM a {setop} SELECT symbol FROM b",
    )
    ca: Counter = Counter()
    cb: Counter = Counter()
    offs = {"a": 0, "b": 0}

    def _rows(alias, chosen, inv):
        out = []
        for s in chosen:
            out.append((offs[alias], 0, ts(9), ts(2 * inv + 1, 1), s, 1.0))
            offs[alias] += 1
        return out

    for inv in range(3):
        a_syms = [rng.choice(syms) for _ in range(rng.randrange(0, 7))]
        b_syms = [rng.choice(syms) for _ in range(rng.randrange(0, 7))]
        old_live = {s: live(ca[s], cb[s]) for s in syms}
        ca.update(a_syms)
        cb.update(b_syms)
        new_live = {s: live(ca[s], cb[s]) for s in syms}
        expected: Counter = Counter()
        for s in syms:
            d = new_live[s] - old_live[s]
            if d > 0:
                expected[(0, s)] += d
            elif d < 0:
                expected[(1, s)] += -d
        out = _run(
            runner, tmp_path, f"r{inv}",
            _rows("a", a_syms, inv), _rows("b", b_syms, inv),
            st=ts(2 * inv + 2),
        )
        got = Counter(_read(spark, out))
        assert got == expected, (
            f"{setop} inv {inv}: got {dict(got)} expected {dict(expected)} "
            f"(ca={dict(ca)}, cb={dict(cb)})"
        )


def _three_input_runner(spark, tmp_path, setop_sql):
    return TransformRunner(
        spark,
        str(tmp_path),
        [
            (setop_sql, "sv"),
            (
                "SELECT cast(now() as timestamp(3)) as event_time, "
                "symbol FROM sv",
                None,
            ),
        ],
    )


def _run3(runner, tmp_path, inv, a_rows, b_rows, c_rows, st):
    inputs = []
    for alias, rows in (("a", a_rows), ("b", b_rows), ("c", c_rows)):
        p = _slices(tmp_path, f"m{alias}{inv}", rows)
        inputs.append(
            {"alias": alias, "schema_file": p,
             "data_paths": [p] if rows else [],
             "watermark": max(r[3] for r in rows) if rows else None}
        )
    _, out = runner.run(inputs, system_time=st)
    return out


def test_mixed_chain_union_except_cross_invocation(spark, tmp_path):
    """`A UNION B EXCEPT C` decomposes into a stateful UNION sub-step
    whose changelog feeds the outer EXCEPT: a value that joined the
    union in invocation 1 retracts when the subtrahend carries it in
    invocation 2 — and a subtrahend-first value never emits."""
    runner = _three_input_runner(
        spark, tmp_path,
        "SELECT symbol FROM a UNION SELECT symbol FROM b "
        "EXCEPT SELECT symbol FROM c",
    )
    out1 = _run3(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "A", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "B", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "B", 1.0)],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "A")]
    # C arrives for A -> retraction; B arrives again on `a` -> still
    # suppressed (subtrahend holds it); D enters via `b` -> insert.
    out2 = _run3(
        runner, tmp_path, 2,
        [(1, 0, ts(3), ts(3, 1), "B", 1.0)],
        [(1, 0, ts(3), ts(3, 1), "D", 1.0)],
        [(1, 0, ts(3), ts(3, 1), "A", 1.0)],
        st=ts(4),
    )
    assert _read(spark, out2) == [(0, "D"), (1, "A")]


def test_mixed_chain_parenthesized_intersect(spark, tmp_path):
    """`(A UNION B) INTERSECT C` — the parenthesized union is the
    nested node; intersection requires presence on BOTH the union's
    live set and `c`, across invocations."""
    runner = _three_input_runner(
        spark, tmp_path,
        "(SELECT symbol FROM a UNION SELECT symbol FROM b) "
        "INTERSECT SELECT symbol FROM c",
    )
    out1 = _run3(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "A", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "B", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "B", 1.0)],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "B")]
    # A's counterpart arrives on c one invocation later: stateful pair.
    out2 = _run3(
        runner, tmp_path, 2,
        [], [],
        [(1, 0, ts(3), ts(3, 1), "A", 1.0)],
        st=ts(4),
    )
    assert _read(spark, out2) == [(0, "A")]


def test_mixed_chain_fold_to_batch_law(spark, tmp_path):
    """Slicing law for the mixed chain: folding the op-0/op-1 changelog
    of `A UNION B EXCEPT C` across 3 invocations of random slices
    equals the one-shot batch evaluation over the full inputs."""
    import random

    rng = random.Random(31)
    mk = lambda n, tag: [
        (i, 0, ts(1), ts(1, 1, i % 59), f"S{rng.randrange(14)}", 1.0)
        for i in range(n)
    ]
    a_rows, b_rows, c_rows = mk(30, "a"), mk(24, "b"), mk(18, "c")
    runner = _three_input_runner(
        spark, tmp_path,
        "SELECT symbol FROM a UNION SELECT symbol FROM b "
        "EXCEPT SELECT symbol FROM c",
    )
    folded: dict[str, int] = {}
    cuts = [(0, 10, 8, 5), (10, 20, 16, 12), (20, 30, 24, 18)]
    prev = (0, 0, 0)
    for inv, (_, ca, cb, cc) in enumerate(cuts):
        asl = [(o,) + r[1:] for o, r in enumerate(a_rows[prev[0]:ca])]
        bsl = [(o,) + r[1:] for o, r in enumerate(b_rows[prev[1]:cb])]
        csl = [(o,) + r[1:] for o, r in enumerate(c_rows[prev[2]:cc])]
        prev = (ca, cb, cc)
        out = _run3(runner, tmp_path, inv + 1, asl, bsl, csl, st=ts(2 + inv))
        for op, sym in _read(spark, out):
            folded[sym] = folded.get(sym, 0) + (1 if op == 0 else -1)
    assert all(n in (0, 1) for n in folded.values())
    live = sorted(s for s, n in folded.items() if n > 0)
    ab = {r[4] for r in a_rows} | {r[4] for r in b_rows}
    c_syms = {r[4] for r in c_rows}
    assert live == sorted(ab - c_syms)


def test_nested_retracting_child_feeds_parent(spark, tmp_path):
    """`(A EXCEPT B) INTERSECT C` — the nested EXCEPT RETRACTS across
    invocations and the retraction must flow into the parent INTERSECT's
    signed branch counts (regression: the sub-step registration must
    keep the child's changelog tag)."""
    runner = _three_input_runner(
        spark, tmp_path,
        "(SELECT symbol FROM a EXCEPT SELECT symbol FROM b) "
        "INTERSECT SELECT symbol FROM c",
    )
    out1 = _run3(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "A", 1.0)],
        [],
        [(0, 0, ts(1), ts(1, 1), "A", 1.0)],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "A")]
    # B arrives: the inner EXCEPT retracts A; the intersection must
    # retract it too — op 1 through the parent's signed counts.
    out2 = _run3(
        runner, tmp_path, 2,
        [],
        [(0, 0, ts(3), ts(3, 1), "A", 1.0)],
        [],
        st=ts(4),
    )
    assert _read(spark, out2) == [(1, "A")]


def test_union_all_over_stateful_chain(spark, tmp_path):
    """`A EXCEPT B UNION ALL C` — the stateful EXCEPT's changelog
    concatenates with the plain append branch (Flink unions changelogs
    freely): the EXCEPT's later op-1 retraction flows through the union,
    and the append branch contributes op-0 inserts each invocation."""
    runner = _three_input_runner(
        spark, tmp_path,
        "SELECT symbol FROM a EXCEPT SELECT symbol FROM b "
        "UNION ALL SELECT symbol FROM c",
    )
    out1 = _run3(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "A", 1.0)],
        [],
        [(0, 0, ts(1), ts(1, 1), "X", 1.0)],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "A"), (0, "X")]
    # B arrives for A -> the EXCEPT retracts (op 1) THROUGH the union;
    # the append branch keeps inserting.
    out2 = _run3(
        runner, tmp_path, 2,
        [],
        [(0, 0, ts(3), ts(3, 1), "A", 1.0)],
        [(1, 0, ts(3), ts(3, 1), "Y", 1.0)],
        st=ts(4),
    )
    assert _read(spark, out2) == [(0, "Y"), (1, "A")]


def test_setop_star_over_updating_branch_rejects(spark, tmp_path):
    """SELECT * over an updating alias in a set-op branch is ambiguous
    (the changelog op column would join the value tuple) — loud reject,
    not a raw Spark ambiguity error."""
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT cast(now() as timestamp(3)) as event_time, "
                "symbol, count(*) as n FROM a GROUP BY symbol",
                "ag",
            ),
            (
                "SELECT * FROM ag "
                "EXCEPT SELECT symbol, cast(price as bigint) FROM b",
                "sv",
            ),
            (
                "SELECT cast(now() as timestamp(3)) as event_time, "
                "symbol FROM sv",
                None,
            ),
        ],
    )
    a = _slices(tmp_path, "sa", [(0, 0, ts(1), ts(1, 1), "A", 1.0)])
    b = _slices(tmp_path, "sb", [(0, 0, ts(1), ts(1, 1), "A", 1.0)])
    with pytest.raises(InvalidQueryError, match="list the value columns"):
        runner.run(
            [
                {"alias": "a", "schema_file": a, "data_paths": [a],
                 "watermark": ts(1, 1)},
                {"alias": "b", "schema_file": b, "data_paths": [b],
                 "watermark": ts(1, 1)},
            ],
            system_time=ts(2),
        )


def test_mixed_chain_into_continuous_agg(spark, tmp_path):
    """Consumption-matrix composition: the mixed chain's op-0/op-1
    changelog feeds a downstream CONTINUOUS aggregate — a retraction
    (subtrahend kills a live tuple) must fold as -1 and emit the
    aggregate key's op-1 delete, exactly like any other updating alias."""
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT symbol FROM a UNION SELECT symbol FROM b "
                "EXCEPT SELECT symbol FROM c",
                "sv",
            ),
            (
                "SELECT cast(now() as timestamp(3)) as event_time, "
                "symbol, count(*) as n FROM sv GROUP BY symbol",
                None,
            ),
        ],
    )
    out1 = _run3(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "A", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "B", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "B", 1.0)],
        st=ts(2),
    )
    rows1 = sorted(
        (r.op, r.symbol, r.n) for r in spark.read.parquet(out1).collect()
    )
    assert rows1 == [(0, "A", 1)]
    # c kills A -> the chain emits op-1 A -> the aggregate's A group
    # dies (op-1 delete); D enters via b -> fresh op-0 group.
    out2 = _run3(
        runner, tmp_path, 2,
        [],
        [(1, 0, ts(3), ts(3, 1), "D", 1.0)],
        [(1, 0, ts(3), ts(3, 1), "A", 1.0)],
        st=ts(4),
    )
    rows2 = sorted(
        (r.op, r.symbol, r.n) for r in spark.read.parquet(out2).collect()
    )
    assert rows2 == [(0, "D", 1), (1, "A", 1)]


def test_mixed_chain_random_brute_force(spark, tmp_path):
    """Randomized per-invocation model for `A UNION B EXCEPT C`: after
    every invocation the emission must equal the delta of the live set
    computed from cumulative counts — live = (seen on a OR b) AND never
    on c — not just fold to the right batch answer at the end."""
    import random
    from collections import Counter

    rng = random.Random(97)
    syms = ["S0", "S1", "S2", "S3", "S4", "S5"]
    runner = _three_input_runner(
        spark, tmp_path,
        "SELECT symbol FROM a UNION SELECT symbol FROM b "
        "EXCEPT SELECT symbol FROM c",
    )
    ca: Counter = Counter()
    cb: Counter = Counter()
    cc: Counter = Counter()
    offs = {"a": 0, "b": 0, "c": 0}

    def live(s):
        return 1 if (ca[s] + cb[s]) > 0 and cc[s] == 0 else 0

    def _rows(alias, chosen, inv):
        out = []
        for s in chosen:
            out.append((offs[alias], 0, ts(9), ts(2 * inv + 1, 1), s, 1.0))
            offs[alias] += 1
        return out

    for inv in range(3):
        picks = {
            al: [rng.choice(syms) for _ in range(rng.randrange(0, 5))]
            for al in ("a", "b", "c")
        }
        old = {s: live(s) for s in syms}
        ca.update(picks["a"]); cb.update(picks["b"]); cc.update(picks["c"])
        new = {s: live(s) for s in syms}
        expected: Counter = Counter()
        for s in syms:
            d = new[s] - old[s]
            if d > 0:
                expected[(0, s)] += d
            elif d < 0:
                expected[(1, s)] += -d
        out = _run3(
            runner, tmp_path, f"rb{inv}",
            _rows("a", picks["a"], inv),
            _rows("b", picks["b"], inv),
            _rows("c", picks["c"], inv),
            st=ts(2 * inv + 2),
        )
        got = Counter(_read(spark, out))
        assert got == expected, (
            f"inv {inv}: got {dict(got)} expected {dict(expected)} "
            f"(ca={dict(ca)}, cb={dict(cb)}, cc={dict(cc)})"
        )


def test_union_all_leaf_splice_feeds_except(spark, tmp_path):
    """`A UNION ALL B EXCEPT C` — the left UNION ALL splices into ONE
    stateless leaf (left-assoc: (A ∪all B) \\ C): rows from EITHER a or
    b make a tuple live in the difference, and a later c retracts it."""
    runner = _three_input_runner(
        spark, tmp_path,
        "SELECT symbol FROM a UNION ALL SELECT symbol FROM b "
        "EXCEPT SELECT symbol FROM c",
    )
    out1 = _run3(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "A", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "B", 1.0)],
        [],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "A"), (0, "B")]
    out2 = _run3(
        runner, tmp_path, 2,
        [], [],
        [(0, 0, ts(3), ts(3, 1), "B", 1.0)],
        st=ts(4),
    )
    assert _read(spark, out2) == [(1, "B")]


def test_unnest_inside_setop_branch(spark, tmp_path):
    """An UNNEST row expansion INSIDE a set-op branch: the branch is a
    legitimate stateless projection (classification strips UNNEST's JOIN
    keyword), its expanded rows feed the INTERSECT's counts, and pairing
    still happens across invocations."""
    runner = _two_input_runner(
        spark, tmp_path,
        "SELECT u.part AS symbol FROM a "
        "CROSS JOIN UNNEST(split(symbol, '#')) AS u (part) "
        "INTERSECT SELECT symbol FROM b",
    )
    # a carries 'X#Y' -> expands to X and Y; b carries Y -> intersect Y.
    out1 = _run(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "X#Y", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "Y", 1.0)],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "Y")]
    # X's right twin arrives one invocation later: stateful pairing.
    out2 = _run(
        runner, tmp_path, 2,
        [],
        [(1, 0, ts(3), ts(3, 1), "X", 1.0)],
        st=ts(4),
    )
    assert _read(spark, out2) == [(0, "X")]


def test_setop_null_tuples(spark, tmp_path):
    """NULL-carrying tuples participate in set operations (the row
    fingerprint encodes NULL injectively): a NULL symbol seen on both
    sides intersects; a NULL on the subtrahend kills the minuend's NULL
    under EXCEPT."""
    runner = _two_input_runner(
        spark, tmp_path,
        "SELECT nullif(symbol, 'N') AS symbol FROM a "
        "INTERSECT SELECT nullif(symbol, 'N') AS symbol FROM b",
    )
    out1 = _run(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "N", 1.0), (1, 0, ts(1), ts(1, 2), "A", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "N", 1.0)],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, None)]

    runner2 = TransformRunner(
        spark,
        str(tmp_path / "e"),
        [
            (
                "SELECT nullif(symbol, 'N') AS symbol FROM a "
                "EXCEPT SELECT nullif(symbol, 'N') AS symbol FROM b",
                "sv",
            ),
            ("SELECT cast(now() as timestamp(3)) as event_time, symbol FROM sv", None),
        ],
    )
    a1 = _slices(tmp_path, "na1", [(0, 0, ts(1), ts(1, 1), "N", 1.0)])
    b1 = _slices(tmp_path, "nb1", [])
    _, o1 = runner2.run(
        [
            {"alias": "a", "schema_file": a1, "data_paths": [a1], "watermark": ts(1, 1)},
            {"alias": "b", "schema_file": b1, "data_paths": [], "watermark": None},
        ],
        system_time=ts(2),
    )
    assert _read(spark, o1) == [(0, None)]
    a2 = _slices(tmp_path, "na2", [])
    b2 = _slices(tmp_path, "nb2", [(0, 0, ts(3), ts(3, 1), "N", 1.0)])
    _, o2 = runner2.run(
        [
            {"alias": "a", "schema_file": a2, "data_paths": [], "watermark": None},
            {"alias": "b", "schema_file": b2, "data_paths": [b2], "watermark": ts(3, 1)},
        ],
        system_time=ts(4),
    )
    assert _read(spark, o2) == [(1, None)]


def test_setop_branch_with_unnest(spark, tmp_path):
    """A set-operation branch may expand arrays with UNNEST — its JOIN
    keyword is a stateless row expansion, not a stream join, so the
    branch guard must not reject it."""
    runner = _two_input_runner(
        spark, tmp_path,
        "SELECT u.ch AS symbol FROM a CROSS JOIN UNNEST(split(symbol, '')) AS u (ch) "
        "INTERSECT SELECT symbol FROM b",
    )
    out1 = _run(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "AB", 1.0)],
        [(0, 0, ts(1), ts(1, 1), "B", 1.0)],
        st=ts(2),
    )
    assert _read(spark, out1) == [(0, "B")]
    # A's other character pairs when the right side delivers it later.
    out2 = _run(
        runner, tmp_path, 2,
        [],
        [(1, 0, ts(3), ts(3, 1), "A", 1.0)],
        st=ts(4),
    )
    assert _read(spark, out2) == [(0, "A")]


# ---------------------------------------------------------------------------
# Property: parse_setop's precedence/associativity decomposition agrees with
# direct SQL evaluation (DuckDB) on arbitrary mixed chains with parens.
# The tree is evaluated in pure-Python COUNT ALGEBRA — the same formulas
# _live_expr compiles to Spark columns — so this pins both the parser's tree
# shape and the executor's per-operator count semantics at once
# (VERDICT r10 "Next #7").
# ---------------------------------------------------------------------------

import re as _re
from collections import Counter as _Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_LEAF = st.sampled_from(
    ["SELECT x FROM a", "SELECT x FROM b", "SELECT x FROM c"]
)
_OPS = st.sampled_from(
    ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
     "EXCEPT", "EXCEPT ALL", "MINUS"]
)


@st.composite
def _setop_exprs(draw, depth=3):
    if depth == 0 or draw(st.booleans()):
        return draw(_LEAF)
    left = draw(_setop_exprs(depth=depth - 1))
    right = draw(_setop_exprs(depth=depth - 1))
    op = draw(_OPS)
    ls = f"({left})" if draw(st.booleans()) else left
    rs = f"({right})" if draw(st.booleans()) else right
    return f"{ls} {op} {rs}"


def _eval_tree(node, data):
    """Count-algebra evaluation of a parse_setop tree (or a leaf SQL
    string) -> multiset of values, mirroring _live_expr's formulas."""
    if isinstance(node, str):
        out = []
        for m in _re.finditer(r"FROM\s+(\w+)", node):
            out.extend(data[m.group(1)])
        return out
    op, allf, children = node
    if op == "UNIONALL":
        out = []
        for ch in children:
            out.extend(_eval_tree(ch, data))
        return out
    counts = [_Counter(_eval_tree(ch, data)) for ch in children]
    values = set()
    for c in counts:
        values |= set(c)
    out = []
    for v in sorted(values):
        c0, rest = counts[0][v], sum(c[v] for c in counts[1:])
        if op == "UNION":
            n = (c0 + rest) if allf else (1 if c0 + rest > 0 else 0)
        elif op == "INTERSECT":
            m = min(c[v] for c in counts)
            n = m if allf else (1 if m > 0 else 0)
        else:  # EXCEPT
            n = max(c0 - rest, 0) if allf else (
                1 if c0 > 0 and rest == 0 else 0
            )
        out.extend([v] * n)
    return out


_SMALL_TABLE = st.lists(
    st.integers(min_value=0, max_value=3), min_size=0, max_size=5
)


@settings(max_examples=60, deadline=None)
@given(_setop_exprs(), _SMALL_TABLE, _SMALL_TABLE, _SMALL_TABLE)
def test_parse_setop_tree_matches_duckdb(sql, ta, tb, tc):
    import duckdb

    data = {"a": ta, "b": tb, "c": tc}
    tree = parse_setop(sql)
    got = sorted(_eval_tree(tree if tree is not None else sql, data))

    con = duckdb.connect()
    try:
        for name, rows in data.items():
            con.execute(f"CREATE TABLE {name} (x INTEGER)")
            if rows:
                con.execute(
                    f"INSERT INTO {name} VALUES "
                    + ",".join(f"({v})" for v in rows)
                )
        oracle_sql = _re.sub(r"\bMINUS\b", "EXCEPT", sql)
        want = sorted(r[0] for r in con.execute(oracle_sql).fetchall())
    finally:
        con.close()
    assert got == want, f"{sql!r}: tree={tree!r} got={got} want={want}"
