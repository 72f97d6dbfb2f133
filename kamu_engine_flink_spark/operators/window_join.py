"""Stateful window join (Flink 1.14+ TVF feature).

`TABLE(TUMBLE(TABLE a, ...)) L JOIN TABLE(TUMBLE(TABLE b, ...)) R ON
L.window_start = R.window_start AND ...` joins the rows of two streams
that fall into the same tumbling window, emitting when the window
closes. Part of the Flink SQL surface the reference exposes by planner
delegation (TransformEngine.scala:252-262).

Spark-first derivation: both sides ride the same raw-row buffer the
tumbling aggregation uses (window_agg.py) — rows buffer until the
EFFECTIVE watermark (min of both inputs, the Flink two-input watermark
rule) passes their window end, then the user's (dialect-rewritten) join
SQL runs over the closed rows of both sides as one Catalyst plan: a
plain shuffle-or-broadcast hash join on (window_start, window_end, keys).
A window closes in exactly one invocation, so emission is exactly-once
without any result-level filter.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ..plans.classify import _WINDOW_TVF_RE, interval_to_timedelta
from ..plans.dialect import rewrite_query
from ..protocol.model import InvalidQueryError
from .base import StepContext, StepResult, min_watermark


def execute_window_join(ctx: StepContext, sql: str) -> StepResult:
    tvfs = list(_WINDOW_TVF_RE.finditer(sql))
    if len(tvfs) != 2:
        raise InvalidQueryError("window join requires exactly two window TVFs")
    kinds = {m.group(1).upper() for m in tvfs}
    if len(kinds) != 1:
        raise InvalidQueryError("window join requires the same TVF kind on both sides")
    kind = kinds.pop()
    sides = []
    aliases = []
    for m in tvfs:
        view, tcol = m.group(2).strip("`"), m.group(3)
        if view not in ctx.views:
            raise InvalidQueryError(f"window join reads unknown view {view!r}")
        if kind != "TUMBLE" and m.group(6) is None:
            raise InvalidQueryError(f"{kind} TVF takes two intervals")
        # The horizon a row can still influence: its (largest) window size.
        size_n, size_u = (
            (m.group(4), m.group(5)) if kind == "TUMBLE" else (m.group(6), m.group(7))
        )
        sides.append(
            (
                view,
                tcol.split(".")[-1].strip("`"),
                tuple(
                    interval_to_timedelta(m.group(i), m.group(i + 1))
                    for i in (4, 6)
                    if m.group(i) is not None
                ),
                f"{size_n} {size_u.lower()}",
                interval_to_timedelta(size_n, size_u),
            )
        )
        am = re.match(r"\s*(?:AS\s+)?([`\w]+)", sql[m.end():], re.IGNORECASE)
        aliases.append(am.group(1).strip("`") if am else None)
    if sides[0][2] != sides[1][2]:
        raise InvalidQueryError("window join requires identical window specs")
    if sides[0][0] == sides[1][0]:
        raise InvalidQueryError("window self-join is not supported")

    # Flink's planner only recognizes a window join when the ON clause
    # equates the window bounds of both sides; without that predicate the
    # executor below would join rows from DIFFERENT windows that happen to
    # close in the same invocation — output would depend on how the input
    # is sliced. (Identical window specs make start equality imply end
    # equality, so one bound suffices.)
    on_m = re.search(
        r"\bON\b(?P<on>.*?)(?:\bWHERE\b|\bGROUP\s+BY\b|$)",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    on_text = on_m.group("on") if on_m else ""
    if not re.search(
        r"[`\w.]*\bwindow_(start|end)`?\s*=\s*[`\w.]*\bwindow_(start|end)\b",
        on_text,
        re.IGNORECASE,
    ):
        raise InvalidQueryError(
            "window join requires window-bound equality in the ON clause "
            "(e.g. L.window_start = R.window_start); Flink would otherwise "
            "run this as a regular streaming join over all rows"
        )
    if kind == "CUMULATE" and not re.search(
        r"[`\w.]*\bwindow_end`?\s*=\s*[`\w.]*\bwindow_end\b",
        on_text,
        re.IGNORECASE,
    ):
        # Every cumulative window of one period shares window_start, so
        # start equality alone would join rows across DIFFERENT cumulative
        # instances; ends are period-aligned step multiples and identify
        # the instance uniquely.
        raise InvalidQueryError(
            "CUMULATE window join requires window_end equality in the ON "
            "clause (window_start is shared by every cumulative window of "
            "a period)"
        )

    # Two-input watermark rule: the operator's clock is the slower input —
    # and an input that never published a watermark holds the combined
    # clock at MIN_VALUE (Flink's rule; same guard as interval_join.py).
    # Collapsing to the present side would close windows the absent side
    # can still write into, silently dropping its late-arriving partners.
    prev_sides = [ctx.prev_wms.get(v) for v, *_ in sides]
    new_sides = [ctx.new_wms.get(v) for v, *_ in sides]
    prev_wm = min_watermark(*prev_sides) if all(w is not None for w in prev_sides) else None
    new_wm = min_watermark(*new_sides) if all(w is not None for w in new_sides) else None

    originals = {}
    try:
        for side_idx, (view, tcol, _size, dur) in enumerate(sides):
            incoming = ctx.views[view]
            cols = incoming.columns
            end = F.window(F.col(tcol), dur)["end"]
            if prev_wm is not None:
                incoming = incoming.filter(end > F.lit(prev_wm)).select(*cols)
            buffer_name = f"{ctx.step_key}-wjoin-{side_idx}"
            if ctx.state.has_df(buffer_name):
                prev_buf = ctx.state.load_df(buffer_name, schema=incoming.schema)
                buf = ctx.pin(prev_buf.unionByName(incoming))
            else:
                buf = incoming
            if new_wm is not None:
                closed = buf.filter(end <= F.lit(new_wm)).select(*cols)
                still_open = buf.filter(end > F.lit(new_wm)).select(*cols)
            else:
                closed = buf.limit(0)
                still_open = buf
            ctx.state.save_df(buffer_name, still_open)
            originals[view] = ctx.views[view]
            closed.createOrReplaceTempView(view)
        result = ctx.spark.sql(rewrite_query(sql, watermark=new_wm))
    finally:
        for view, df in originals.items():
            df.createOrReplaceTempView(view)

    # Deterministic emission order: output event-time column (usually the
    # projected window_start) first, remaining columns as tie-breakers.
    order_cols = list(result.columns)
    et = ctx.request.vocab.event_time_column
    if et in order_cols:
        order_cols.remove(et)
        order_cols.insert(0, et)
    return StepResult(df=result, watermark=new_wm, order_cols=order_cols)
