"""Stateful row-time OVER aggregation (Flink "Over Aggregation").

Flink's streaming SQL surface includes per-row backward-frame aggregation
(`SUM(x) OVER (PARTITION BY k ORDER BY rowtime {RANGE|ROWS} BETWEEN ...
PRECEDING AND CURRENT ROW)`), which the reference exposes by delegating
every SQL step to Flink's planner (TransformEngine.scala:252-262). Row-time
semantics: a row's aggregate is computed over watermark-complete history,
so a row EMITS when the watermark passes its timestamp; rows later than
the run-start watermark are dropped; not-yet-emittable rows buffer across
invocations.

Spark-first derivation: persist the raw rows still inside any future row's
frame horizon, run the user's (unmodified — Spark parses Flink's frame
spelling natively) SQL over (buffer ∪ slice) as ONE Catalyst window plan,
and filter the emission to rows in (prev_wm, new_wm]. Frame-horizon
eviction bounds the state: RANGE frames keep rows with ts >= new_wm - h;
ROWS-n frames keep the last n emitted rows per key plus every pending row.
Emission order is (rowtime, ledger offset) — the order Flink's watermark
advance fires timers in, made total by the ledger offset.
"""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.classify import parse_over_agg, referenced_views
from ..plans.dialect import rewrite_query
from ..protocol.model import InvalidQueryError
from .base import StepContext, StepResult

SEQ_INPUT = "__seq"

_ROWS_ORDER_RE = re.compile(
    r"(ORDER\s+BY\s+[`\w.]+)((?:\s+ASC)?\s+ROWS\s+BETWEEN)", re.IGNORECASE
)


def execute_over_agg(ctx: StepContext, sql: str) -> StepResult:
    spec = parse_over_agg(sql)
    if spec is None:
        raise InvalidQueryError("over_agg executor requires a bounded OVER frame")
    refs = referenced_views(sql, set(ctx.views))
    if len(refs) != 1:
        raise InvalidQueryError(f"over aggregation must read exactly one view, got {refs}")
    src = refs[0]
    prev_wm = ctx.prev_wms.get(src)
    new_wm = ctx.new_wms.get(src)

    incoming = ctx.views[src]
    if SEQ_INPUT not in incoming.columns:
        raise InvalidQueryError("over aggregation requires ledger-offset sequencing")
    cols = incoming.columns
    t = F.col(spec.time_col)

    # Lateness: a row at or before the run-start watermark was already
    # emittable (and its frame contribution consumed) — drop it.
    if prev_wm is not None:
        incoming = incoming.filter(t > F.lit(prev_wm))

    buffer_name = f"{ctx.step_key}-over-buffer"
    if ctx.state.has_df(buffer_name):
        prev_buf = ctx.state.load_df(buffer_name, schema=incoming.schema)
        buf = ctx.pin(prev_buf.unionByName(incoming))
    else:
        buf = incoming  # first run: re-scan the source, skip the pin

    # One Catalyst window plan over the buffer; thread the ledger offset
    # through the projection for deterministic emission order, and break
    # equal-rowtime ties in ROWS frames by ledger offset (Flink leaves the
    # peer order of a ROWS frame on equal timestamps undefined; the ledger
    # offset is this engine's total arrival order).
    run_sql = sql
    if spec.kind == "rows":
        run_sql = _ROWS_ORDER_RE.sub(rf"\1, {SEQ_INPUT}\2", run_sql)
    run_sql = re.sub(
        r"^\s*select\s+", f"SELECT {SEQ_INPUT}, ", run_sql, count=1, flags=re.IGNORECASE
    )
    buf.createOrReplaceTempView(src)
    try:
        result = ctx.spark.sql(rewrite_query(run_sql, watermark=new_wm))
    finally:
        ctx.views[src].createOrReplaceTempView(src)
    if spec.time_col not in result.columns:
        raise InvalidQueryError(
            f"over aggregation must project its rowtime attribute {spec.time_col!r} "
            f"(emission is gated on it)"
        )

    # Emit exactly the rows the watermark advance releases: (prev_wm, new_wm].
    # Buffer rows older than prev_wm exist only as frame context (already
    # emitted in a previous invocation).
    rt = F.col(spec.time_col)
    if new_wm is None:
        result = result.limit(0)
    else:
        result = result.filter(rt <= F.lit(new_wm))
        if prev_wm is not None:
            result = result.filter(rt > F.lit(prev_wm))

    # Evict state down to the frame horizon of any future (pending) row.
    if new_wm is None:
        still_open = buf
    elif spec.kind == "range":
        # A future row has ts > new_wm, so its frame reaches no deeper
        # than new_wm - h (inclusive bound kept for the ts == new_wm + ε
        # equality edge).
        still_open = buf.filter(t >= F.lit(new_wm - spec.range_size))
    else:
        pending = buf.filter(t > F.lit(new_wm))
        w = Window.partitionBy(
            *[F.col(k) for k in spec.part_keys] or [F.lit(0)]
        ).orderBy(t.desc(), F.col(SEQ_INPUT).desc())
        context_rows = (
            buf.filter(t <= F.lit(new_wm))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= spec.rows_n)
            .drop("__rn")
        )
        still_open = pending.unionByName(context_rows).select(*cols)
    ctx.state.save_df(buffer_name, still_open)

    return StepResult(df=result, watermark=new_wm, order_cols=[spec.time_col, SEQ_INPUT])
