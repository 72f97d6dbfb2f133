"""Regressions for the round-10 ADVICE findings.

1. classify.parse_setop: a chain whose only DEPTH-0 operator is UNION
   ALL no longer early-returns None when a PARENTHESIZED segment hides a
   stateful sub-chain — `(A EXCEPT B) UNION ALL C` and
   `A UNION ALL (B EXCEPT C)` now decompose into a UNIONALL
   changelog-concatenation node (classifying SETOP) exactly like the
   unparenthesized `A EXCEPT B UNION ALL C`; a genuinely stateless
   parenthesized chain still classifies MAP.
2. dialect._unnest_expr_is_map: an UNQUALIFIED column must resolve
   UNIQUELY across the query's referenced tables before answering MAP;
   when two tables carry the same column name the rewrite falls back to
   inline() instead of guessing from whichever table matches first.
   (+ round-10 "What's missing #2": a COMPUTED map expression —
   map_filter(m, ...) — now resolves via an analysis-only probe
   projection and emits explode(); covered in test_unnest.py.)
3. setop_step._exec_union_all: the stateful sub-chain's __seq derives
   from the child's deterministic order contract (__fp[, op]) via
   row_number, not monotonically_increasing_id — the union's emission
   order survives partitioning changes.
4. bench.py BENCH_DETAIL.json write failure warns on stderr and flags
   detail_write_failed in the compact JSON (script-level; verified by
   reading the code path, no unit test — the artifact flow is exercised
   by every bench run).
"""

from __future__ import annotations

from kamu_engine_flink_spark.plans.classify import (
    SETOP,
    classify,
    parse_setop,
)

from .helpers import TransformRunner, ticker_slice, ts

VIEWS = {"a", "b", "c"}
A, B, C = "SELECT x FROM a", "SELECT x FROM b", "SELECT x FROM c"


def test_parenthesized_stateful_subchain_under_union_all():
    # (A EXCEPT B) UNION ALL C — the only depth-0 operator is UNION ALL,
    # but the parenthesized EXCEPT is stateful: must decompose, not MAP.
    assert parse_setop(f"({A} EXCEPT {B}) UNION ALL {C}") == (
        "UNIONALL",
        False,
        [("EXCEPT", False, [A, B]), C],
    )
    assert parse_setop(f"{A} UNION ALL ({B} EXCEPT {C})") == (
        "UNIONALL",
        False,
        [A, ("EXCEPT", False, [B, C])],
    )
    assert classify(f"({A} EXCEPT {B}) UNION ALL {C}", VIEWS) == SETOP
    assert classify(f"{A} UNION ALL ({B} EXCEPT {C})", VIEWS) == SETOP


def test_pure_stateless_parenthesized_union_all_stays_map():
    # Parens without a stateful operator inside: still a stateless
    # UNION ALL chain on the MAP path.
    assert parse_setop(f"({A} UNION ALL {B}) UNION ALL {C}") is None
    assert classify(f"({A} UNION ALL {B}) UNION ALL {C}", VIEWS) == "map"


def test_nested_unionall_operands_flatten():
    # A parenthesized concatenation operand flattens into one UNIONALL
    # level so the executor never sees nested UNIONALL nodes.
    spec = parse_setop(f"({A} EXCEPT {B} UNION ALL {C}) UNION ALL {A}")
    assert spec == (
        "UNIONALL",
        False,
        [("EXCEPT", False, [A, B]), f"{C} UNION ALL {A}"],
    )
    spec = parse_setop(f"{A} EXCEPT {B} UNION ALL ({C} EXCEPT {A} UNION ALL {B})")
    assert spec == (
        "UNIONALL",
        False,
        [
            ("EXCEPT", False, [A, B]),
            ("EXCEPT", False, [C, A]),
            B,
        ],
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
    for name, rows in (("a", a_rows), ("b", b_rows), ("c", c_rows)):
        path = str(tmp_path / "in" / f"{name}{inv}.parquet")
        ticker_slice(path, rows)
        inputs.append(
            {
                "alias": name,
                "schema_file": path,
                "data_paths": [path] if rows else [],
                "watermark": max(r[3] for r in rows) if rows else None,
            }
        )
    _, out = runner.run(inputs, system_time=st)
    return out


def _read_seq(spark, out):
    """Rows in FILE ORDER (not sorted) — the determinism subject."""
    import os

    if not os.path.exists(out):
        return []
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    return [
        (r["op"], r["symbol"]) for r in t.to_pylist()
    ]


def test_parenthesized_chain_executes_and_order_is_partition_stable(
    spark, tmp_path
):
    """(a EXCEPT b) UNION ALL c executes statefully AND its emission
    order is identical under different shuffle-partition counts — the
    sub-chain __seq is a deterministic function of the rows (ADVICE #3),
    not of the physical partition layout."""
    sql = (
        "(SELECT symbol FROM a EXCEPT SELECT symbol FROM b) "
        "UNION ALL SELECT symbol FROM c"
    )
    a_rows = [
        (i, 0, ts(1), ts(1, i + 1), s, 1.0)
        for i, s in enumerate(["A", "B", "C", "D", "E", "F", "G"])
    ]
    b_rows = [(0, 0, ts(1), ts(1, 1), "C", 1.0)]
    c_rows = [(0, 0, ts(1), ts(1, 1), "Z", 1.0), (1, 0, ts(1), ts(1, 2), "Y", 1.0)]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    seqs = []
    try:
        for i, nparts in enumerate(("3", "7")):
            spark.conf.set("spark.sql.shuffle.partitions", nparts)
            runner = _three_input_runner(spark, tmp_path / f"r{i}", sql)
            out = _run3(
                runner, tmp_path / f"r{i}", 1, a_rows, b_rows, c_rows, ts(2)
            )
            seqs.append(_read_seq(spark, out))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # Same rows, same ORDER, regardless of partitioning.
    assert seqs[0] == seqs[1]
    assert sorted(seqs[0]) == sorted(
        [(0, s) for s in ["A", "B", "D", "E", "F", "G", "Z", "Y"]]
    )
    # Branch-major: the stateful sub-chain's rows precede branch c's.
    assert seqs[0][-2:] == [(0, "Z"), (0, "Y")]


def test_parenthesized_chain_cross_invocation_state(spark, tmp_path):
    """The parenthesized sub-chain keeps cross-invocation count state:
    a late subtrahend arrival retracts the earlier emission."""
    sql = (
        "(SELECT symbol FROM a EXCEPT SELECT symbol FROM b) "
        "UNION ALL SELECT symbol FROM c"
    )
    runner = _three_input_runner(spark, tmp_path, sql)
    out1 = _run3(
        runner, tmp_path, 1,
        [(0, 0, ts(1), ts(1, 1), "A", 1.0), (1, 0, ts(1), ts(1, 2), "B", 1.0)],
        [],
        [(0, 0, ts(1), ts(1, 1), "X", 1.0)],
        st=ts(2),
    )
    assert sorted(_read_seq(spark, out1)) == [(0, "A"), (0, "B"), (0, "X")]
    # B arrives on the subtrahend in invocation 2: retraction (op 1) —
    # per-slice MAP evaluation (the pre-fix behavior) would emit nothing.
    out2 = _run3(
        runner, tmp_path, 2,
        [],
        [(0, 0, ts(3), ts(3, 1), "B", 1.0)],
        [],
        st=ts(4),
    )
    assert _read_seq(spark, out2) == [(1, "B")]
