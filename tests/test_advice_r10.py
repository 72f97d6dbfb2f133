"""Regressions for the round-9 ADVICE findings.

1. setop_step.py: updating-branch __op injection decided from the
   RESOLVED projection's columns, not a substring test on the SQL text —
   a branch merely mentioning the op name (aliasing it away) still gets
   the tag injected; `SELECT *` over an updating alias rejects loudly
   (covered here and in test_setop.test_setop_star_over_updating_branch_rejects).
2. classify.py: a GROUP BY using an aggregate outside the mergeable
   whitelist (median, any_value, percentile_approx, bool_and, ...) is
   diagnosed as an unsupported AGGREGATION, not misdiagnosed as a
   no-aggregate GROUP BY (stateful DISTINCT).
3. dialect.py: _rewrite_unnest locates occurrences on the literal-masked
   text (test_unnest.test_unnest_inside_string_literal_untouched).
4. streaming/structured.py: the stateful set-op kernel validates its
   operator — op='UNION' with all_flag=True (UNION ALL is stateless and
   would silently compute UNION DISTINCT) and unknown op strings raise.
5. classify.parse_setop dropped the never-used known_views parameter
   (compile-time; exercised by every parse_setop call in test_setop).
"""

from __future__ import annotations

import pytest

from kamu_engine_flink_spark.plans.classify import classify
from kamu_engine_flink_spark.protocol.model import InvalidQueryError
from kamu_engine_flink_spark.streaming.structured import _setop_fn

from .helpers import TransformRunner, ticker_slice, ts


def test_unlisted_aggregate_group_by_message():
    views = {"a"}
    for agg in ("median(price)", "any_value(price)",
                "percentile_approx(price, 0.5)", "bool_and(price > 0)"):
        with pytest.raises(
            InvalidQueryError, match="continuous-aggregation"
        ):
            classify(f"SELECT symbol, {agg} AS v FROM a GROUP BY symbol",
                     views)
    # The no-aggregate GROUP BY message no longer asserts the query has
    # no aggregates as fact — it covers the unrecognized-aggregate case.
    with pytest.raises(InvalidQueryError, match="not one the streaming"):
        classify(
            "SELECT symbol, price + 1 AS v FROM a GROUP BY symbol, price",
            views,
        )


def test_setop_fn_validates_operator():
    with pytest.raises(ValueError, match="UNION ALL is stateless"):
        _setop_fn("UNION", True)
    with pytest.raises(ValueError, match="unknown set operator"):
        _setop_fn("CONCAT", False)
    # MINUS normalizes to EXCEPT, the batch parser's convention.
    assert _setop_fn("MINUS", False) is not None


def test_setop_branch_mentioning_op_still_injects(spark, tmp_path):
    """A branch whose text CONTAINS the op column name but whose
    projection does not expose it (aliased away into `op_count`) must
    still get the changelog tag injected — the old substring test
    skipped injection and failed column resolution with a raw Spark
    error instead of consuming signed counts."""
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT cast(now() as timestamp(3)) as event_time, "
                "symbol, count(*) as op_count FROM a GROUP BY symbol",
                "ag",
            ),
            (
                "SELECT symbol, op_count FROM ag "
                "EXCEPT SELECT symbol, cast(price as bigint) FROM b",
                "sv",
            ),
            (
                "SELECT cast(now() as timestamp(3)) as event_time, "
                "symbol, op_count FROM sv",
                None,
            ),
        ],
    )

    def _slice(name, rows):
        p = str(tmp_path / "in" / f"{name}.parquet")
        ticker_slice(p, rows)
        return p

    a1 = _slice("a1", [(0, 0, ts(1), ts(1, 1), "A", 9.0)])
    b1 = _slice("b1", [(0, 0, ts(1), ts(1, 1), "B", 1.0)])
    _, out1 = runner.run(
        [
            {"alias": "a", "schema_file": a1, "data_paths": [a1],
             "watermark": ts(1, 1)},
            {"alias": "b", "schema_file": b1, "data_paths": [b1],
             "watermark": ts(1, 1)},
        ],
        system_time=ts(2),
    )
    rows1 = sorted(
        (r.op, r.symbol, r.op_count)
        for r in spark.read.parquet(out1).collect()
    )
    assert rows1 == [(0, "A", 1)]

    # inv 2: a second A -> the agg CORRECTS (A,1)->(A,2). With the tag
    # injected, the op-2 retraction nets the old tuple out and the new
    # one in; without it the correction pair would double-count.
    a2 = _slice("a2", [(1, 0, ts(3), ts(3, 1), "A", 9.0)])
    b2 = _slice("b2", [])
    _, out2 = runner.run(
        [
            {"alias": "a", "schema_file": a2, "data_paths": [a2],
             "watermark": ts(3, 1)},
            {"alias": "b", "schema_file": b2, "data_paths": [],
             "watermark": None},
        ],
        system_time=ts(4),
    )
    rows2 = sorted(
        (r.op, r.symbol, r.op_count)
        for r in spark.read.parquet(out2).collect()
    )
    assert rows2 == [(0, "A", 2), (1, "A", 1)]
