"""Stateful tumbling-window aggregation.

Reference semantics (README.md "Windowed Aggregations",
EngineAggregationTest.scala:54-440): `GROUP BY TUMBLE(event_time, I)` emits
each window exactly once, when the watermark passes the window end; rows
later than their (already closed) window are dropped; open windows carry
across invocations in the savepoint; a watermark-only invocation flushes
pending windows.

Spark-first derivation: instead of persisting aggregate partials we persist
the *open-window input rows* and run the user's (rewritten) SQL over
closed-window rows only. A window's rows all share the window end, so
filtering the buffer splits cleanly into "emit now" and "still open" — the
aggregation itself stays a single Catalyst `groupBy(window(...))` with
map-side partial aggregation, shuffling only the closed slice. State size
is bounded by the watermark lag (open windows), not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.classify import TumbleSpec, parse_tumble, referenced_views
from ..plans.dialect import rewrite_query
from .base import StepContext, StepResult, min_watermark


def _window_end(df: DataFrame, spec: TumbleSpec):
    return F.window(F.col(spec.time_col), spec.duration)["end"]


def execute_window_agg(ctx: StepContext, sql: str) -> StepResult:
    spec = parse_tumble(sql)
    if spec is None:
        raise ValueError("window_agg executor requires a TUMBLE clause")
    refs = referenced_views(sql, set(ctx.views))
    if len(refs) != 1:
        raise ValueError(f"tumbling aggregation must read exactly one view, got {refs}")
    src = refs[0]
    prev_wm = ctx.prev_wms.get(src)
    new_wm = ctx.new_wms.get(src)

    incoming = ctx.views[src]
    buffer_name = f"{ctx.step_key}-window-buffer"
    prev_buf = ctx.state.load_df(buffer_name, schema=incoming.schema)

    # Lateness: a row whose window already closed under the watermark the
    # run STARTED with is dropped (source emits prev watermark before data).
    # Note: Spark's analyzer materializes a `window` projection for the
    # TimeWindow expression, so each filter re-selects the original columns
    # to keep the buffer/view schema clean.
    cols = incoming.columns
    if prev_wm is not None:
        incoming = incoming.filter(_window_end(incoming, spec) > F.lit(prev_wm)).select(*cols)
    buf = prev_buf.unionByName(incoming)

    if new_wm is not None:
        closed = buf.filter(_window_end(buf, spec) <= F.lit(new_wm)).select(*cols)
        still_open = buf.filter(_window_end(buf, spec) > F.lit(new_wm)).select(*cols)
    else:
        closed = buf.limit(0)
        still_open = buf

    ctx.state.save_df(buffer_name, still_open)

    closed.createOrReplaceTempView(src)
    try:
        result = ctx.spark.sql(rewrite_query(sql, watermark=new_wm))
    finally:
        ctx.views[src].createOrReplaceTempView(src)

    # Deterministic emission order: window start first (ascending event
    # time, like the reference's single-threaded stream), then remaining
    # output columns to break ties between groups of the same window.
    order_cols = list(result.columns)
    et = ctx.event_time_cols.get(src)
    if et in order_cols:
        order_cols.remove(et)
        order_cols.insert(0, et)
    return StepResult(df=result, watermark=new_wm, order_cols=order_cols)
