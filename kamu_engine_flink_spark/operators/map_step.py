"""Stateless map/filter step.

Projection, filtering, scalar expressions and anything else Spark SQL can
evaluate row-wise (EngineMapTest parity). Corrections/retractions flow
through untouched: `op` is an ordinary visible column
(EngineMapTest.scala:149-231, SURVEY.md §1.4).

Emission order must follow the input ledger (offset order) for the output
offset contract. The engine exposes the ledger offset as a `__seq` column
on input views; for simple single-SELECT steps we thread it through the
projection so ordering survives arbitrary Spark physical plans. Complex
shapes (set ops, subqueries) fall back to natural order.
"""

from __future__ import annotations

import re

from ..plans.classify import referenced_views
from ..plans.dialect import rewrite_query
from .base import StepContext, StepResult, min_watermark

SEQ_INPUT = "__seq"

_SIMPLE_SELECT_RE = re.compile(r"^\s*select\s+", re.IGNORECASE)


def _inject_seq(sql: str) -> str | None:
    """Thread __seq through a single-block SELECT; None if unsafe."""
    from ..plans.classify import select_count

    if select_count(sql) != 1:
        return None
    if re.search(r"\b(group\s+by|union|distinct|order\s+by|limit)\b", sql, re.IGNORECASE):
        return None
    if SEQ_INPUT in sql or re.search(
        r"(?:\bselect|,)\s*(?:[`\w]+\s*\.\s*)?\*", sql, re.IGNORECASE
    ):
        # A star projection — bare `*` or qualified `t.*`, leading or
        # mid-list — already expands the view's __seq; injecting another
        # would duplicate the column and make the output-ordering
        # reference ambiguous. (`price * 10` does not match: its `*` is
        # preceded by an operand, not SELECT or a comma.)
        return sql
    return _SIMPLE_SELECT_RE.sub(f"SELECT {SEQ_INPUT}, ", sql, count=1)


def execute_map(ctx: StepContext, sql: str) -> StepResult:
    from ..protocol.model import InvalidQueryError
    from .topn import OP_COL

    refs = referenced_views(sql, set(ctx.views))
    wm = min_watermark(*[ctx.new_wms.get(r) for r in refs]) if refs else None

    # Projection over an updating (changelog-emitting) alias: the op tags
    # thread through like the ledger offset, so pads/retractions/
    # correction pairs forward intact (Flink keeps RowKind through a
    # projection). Only a single plain projection qualifies — a WHERE
    # could drop one half of an op 2/3 pair (Flink turns that into a
    # DELETE, which needs pair-aware rewriting), and joins/set ops would
    # duplicate or strand op rows.
    changelog_refs = [r for r in refs if OP_COL in ctx.views[r].columns]
    run_sql = sql
    if changelog_refs:
        simple = _inject_seq(sql)
        if (
            len(refs) != 1
            or simple is None
            or re.search(r"\b(where|join)\b|\bover\s*\(", sql, re.IGNORECASE)
            or SEQ_INPUT not in ctx.views[refs[0]].columns
        ):
            raise InvalidQueryError(
                "a step reading an updating (changelog-emitting) alias "
                "supports a single plain projection (op tags forward) or "
                "a windowless GROUP BY aggregation (op tags fold); "
                "WHERE/JOIN over an updating stream needs retraction-"
                "aware semantics and is not supported — filter or join "
                "before the changelog-emitting step instead"
            )
        run_sql = simple
        if OP_COL not in run_sql:
            run_sql = _SIMPLE_SELECT_RE.sub(
                f"SELECT {OP_COL}, ", run_sql, count=1
            )
    elif len(refs) == 1 and SEQ_INPUT in ctx.views[refs[0]].columns:
        injected = _inject_seq(sql)
        if injected is not None:
            run_sql = injected

    order_cols: list[str] | None = None
    df = ctx.spark.sql(rewrite_query(run_sql, watermark=wm))
    if SEQ_INPUT in df.columns:
        order_cols = [SEQ_INPUT]
    return StepResult(df=df, watermark=wm, order_cols=order_cols)
