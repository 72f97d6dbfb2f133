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

INNER only. Outer regular joins emit retractions in Flink (a NULL-padded
row is retracted when a match later arrives); that changelog contract is
not implemented here, so LEFT/RIGHT/FULL shapes are rejected loudly
rather than computed with silently-different semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.classify import parse_regular_join
from ..plans.dialect import rewrite_query
from ..protocol.model import InvalidQueryError
from .base import StepContext, StepResult, min_watermark


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
    if spec.join_kind:
        raise InvalidQueryError(
            "outer regular (non-windowed) stream joins emit retractions and "
            "are not supported; bound the join with a time interval "
            "(interval join) or use FOR SYSTEM_TIME AS OF (temporal join)"
        )
    lv, rv = spec.left_view, spec.right_view
    new_left, new_right = ctx.views[lv], ctx.views[rv]
    left_state = f"{ctx.step_key}-rj-left"
    right_state = f"{ctx.step_key}-rj-right"
    old_left = ctx.state.load_df(left_state, schema=new_left.schema)
    old_right = ctx.state.load_df(right_state, schema=new_right.schema)
    all_left = ctx.pin(old_left.unionByName(new_left))
    all_right = ctx.pin(old_right.unionByName(new_right))

    # Pair-uniqueness across invocations without an emitted ledger: a pair
    # is new iff at least one side arrived this run.
    wm = min_watermark(ctx.new_wms.get(lv), ctx.new_wms.get(rv))
    part_a = _run_with_views(ctx, sql, {lv: new_left, rv: all_right}, wm)
    part_b = _run_with_views(ctx, sql, {lv: old_left, rv: new_right}, wm)
    result = part_a.unionByName(part_b)

    # Full-history state (Flink regular-join semantics — no horizon to
    # evict by; self-join of a view with itself still persists each side
    # under its own key).
    ctx.state.save_df(left_state, all_left)
    ctx.state.save_df(right_state, all_right)

    order_cols = list(result.columns)
    out_et = ctx.request.vocab.event_time_column
    if out_et in order_cols:
        order_cols.remove(out_et)
        order_cols.insert(0, out_et)
    return StepResult(df=result, watermark=wm, order_cols=order_cols)
