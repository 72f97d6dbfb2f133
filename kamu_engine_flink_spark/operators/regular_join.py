"""Stateful REGULAR (unbounded) stream-to-stream equi join.

Flink's "regular join" pairs every row of either input with the FULL
history of the other side; the reference exposes it by planner delegation
(TransformEngine.scala:252-262 hands arbitrary SQL to Flink, whose
regular-join operator keeps both sides in state forever — the documented
Flink caveat). The previous route for this shape — stateless MAP — paired
only same-invocation rows, i.e. results depended on how the stream was cut
into invocations.

Spark-first derivation: per-side persisted full-history buffers; a pair is
new iff at least one side is new this run, so each invocation emits
new_left x all_right UNION old_left x new_right — the same
dual-branch shuffle shape as the interval join, minus the horizon
eviction (there is none to apply: any future row can match any past row).
State therefore grows with the inputs — exactly Flink's behavior for this
operator; bound-state variants are the interval/window/temporal joins.

INNER and LEFT. Flink's LEFT regular join emits the NULL-padded row
immediately for an unmatched left, then RETRACTS it when the first match
arrives (-D of the pad, +I of the pair); here that is the op changelog —
pad rows carry op 0, the retraction op 1 (DELETE, ChangelogOperator.scala
mapping), ordered before the new pairs within the invocation. The left
state carries a per-row matched flag so a pad is retracted exactly once.
RIGHT/FULL shapes (two-sided retraction bookkeeping) remain rejected
loudly rather than computed with silently-different semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, IntegerType, StructField, StructType

from ..plans.classify import parse_regular_join
from ..plans.dialect import rewrite_query
from ..protocol.model import OP_APPEND, OP_RETRACT, InvalidQueryError
from .base import StepContext, StepResult, min_watermark
from .topn import OP_COL

_MATCHED = "__rj_matched"
_PHASE = "__emit_phase"  # 0 = pad retractions, 1 = pads + pairs


def _run_with_views(
    ctx: StepContext, sql: str, bindings: dict[str, DataFrame], wm
) -> DataFrame:
    for name, df in bindings.items():
        df.createOrReplaceTempView(name)
    try:
        return ctx.spark.sql(rewrite_query(sql, watermark=wm))
    finally:
        for name in bindings:
            ctx.views[name].createOrReplaceTempView(name)


def execute_regular_join(ctx: StepContext, sql: str) -> StepResult:
    spec = parse_regular_join(sql, set(ctx.views))
    if spec is None:
        raise InvalidQueryError("regular join executor could not parse the join shape")
    if spec.join_kind not in ("", "LEFT"):
        raise InvalidQueryError(
            "RIGHT/FULL regular (non-windowed) stream joins require two-sided "
            "retraction bookkeeping and are not supported; bound the join "
            "with a time interval (interval join) or use FOR SYSTEM_TIME AS "
            "OF (temporal join)"
        )
    is_left = spec.join_kind == "LEFT"
    # Pair branches always run the INNER form -- the LEFT sql bound against
    # partial views would re-pad every old unmatched left each invocation.
    inner_sql = (
        re.sub(r"\bLEFT\s+(?:OUTER\s+)?JOIN\b", "JOIN", sql, flags=re.IGNORECASE)
        if is_left
        else sql
    )
    lv, rv = spec.left_view, spec.right_view
    la, ra = spec.left_alias, spec.right_alias
    new_left, new_right = ctx.views[lv], ctx.views[rv]
    left_state = f"{ctx.step_key}-rj-left"
    right_state = f"{ctx.step_key}-rj-right"
    left_state_schema = (
        StructType(list(new_left.schema.fields) + [StructField(_MATCHED, BooleanType())])
        if is_left
        else new_left.schema
    )
    old_left_state = ctx.state.load_df(left_state, schema=left_state_schema)
    old_left = old_left_state.drop(_MATCHED) if is_left else old_left_state
    old_right = ctx.state.load_df(right_state, schema=new_right.schema)
    all_right = ctx.pin(old_right.unionByName(new_right))

    # Pair-uniqueness across invocations without an emitted ledger: a pair
    # is new iff at least one side arrived this run.
    wm = min_watermark(ctx.new_wms.get(lv), ctx.new_wms.get(rv))
    part_a = _run_with_views(ctx, inner_sql, {lv: new_left, rv: all_right}, wm)
    part_b = _run_with_views(ctx, inner_sql, {lv: old_left, rv: new_right}, wm)
    pairs = part_a.unionByName(part_b)

    if is_left:
        cond = F.expr(spec.on_condition)
        empty_right = all_right.limit(0)
        # New lefts without any match so far: NULL-pad immediately (op 0).
        new_l = ctx.pin(new_left)
        new_matched = new_l.alias(la).join(all_right.alias(ra), cond, "left_semi")
        new_unmatched = new_l.alias(la).join(all_right.alias(ra), cond, "left_anti")
        pads = _run_with_views(ctx, sql, {lv: new_unmatched, rv: empty_right}, wm)
        # Old padded lefts whose FIRST match arrived this run: retract the
        # pad (op 1 = DELETE, emitted before this invocation's pairs),
        # exactly once -- the per-row matched flag in the left state.
        old_unmatched = old_left_state.filter(~F.col(_MATCHED)).drop(_MATCHED)
        newly_matched = old_unmatched.alias(la).join(
            new_right.alias(ra), cond, "left_semi"
        )
        still_unmatched = old_unmatched.alias(la).join(
            new_right.alias(ra), cond, "left_anti"
        )
        retracts = _run_with_views(ctx, sql, {lv: newly_matched, rv: empty_right}, wm)

        def _tag(df: DataFrame, op: int, phase: int) -> DataFrame:
            return df.withColumn(OP_COL, F.lit(op).cast(IntegerType())).withColumn(
                _PHASE, F.lit(phase).cast(IntegerType())
            )

        result = (
            _tag(retracts, OP_RETRACT, 0)
            .unionByName(_tag(pads, OP_APPEND, 1))
            .unionByName(_tag(pairs, OP_APPEND, 1))
        )
        # Left state: every row with its updated matched flag.
        old_matched = old_left_state.filter(F.col(_MATCHED)).drop(_MATCHED)
        keep_left = (
            old_matched.withColumn(_MATCHED, F.lit(True))
            .unionByName(newly_matched.withColumn(_MATCHED, F.lit(True)))
            .unionByName(still_unmatched.withColumn(_MATCHED, F.lit(False)))
            .unionByName(new_matched.withColumn(_MATCHED, F.lit(True)))
            .unionByName(new_unmatched.withColumn(_MATCHED, F.lit(False)))
        )
    else:
        result = pairs
        keep_left = old_left.unionByName(new_left)

    # Full-history state (Flink regular-join semantics -- no horizon to
    # evict by; self-join of a view with itself still persists each side
    # under its own key).
    ctx.state.save_df(left_state, keep_left)
    ctx.state.save_df(right_state, all_right)

    order_cols = [c for c in result.columns if c != _PHASE]
    out_et = ctx.request.vocab.event_time_column
    if out_et in order_cols:
        order_cols.remove(out_et)
        order_cols.insert(0, out_et)
    if is_left:
        # Retractions of earlier pads land before this invocation's new
        # pads/pairs in the emitted ledger.
        order_cols = [_PHASE, *order_cols]
    return StepResult(df=result, watermark=wm, order_cols=order_cols)
