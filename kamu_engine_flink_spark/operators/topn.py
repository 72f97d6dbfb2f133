"""Stateful Top-N with changelog corrections.

Reference semantics (EngineTopNTest.scala:22-155, TopNTest.scala:18-89):
`row_number() OVER (ORDER BY score DESC)` + outer `WHERE place <= N`
maintains a running Top-N; every input record that changes the ranking
emits correction pairs immediately — CorrectFrom(op=2) with the old row,
CorrectTo(op=3) with the new — in ascending place order, per record, in
input (offset) order. A fresh place emits Append(op=0).

Spark-first derivation: the changelog granularity is inherently sequential
(record i's corrections depend on the state after record i-1), but almost
no records can touch a Top-N: a distributed prefilter keeps only rows that
beat the current N-th entry (threshold is monotone within a batch, so
filtering against the previous state is exact). The surviving handful fold
through a driver-side simulation; state is the <=N-row ranking table.

Supported shape (the reference's only tested one): an outer projection over
`(SELECT row_number() OVER (ORDER BY <col> [DESC]) AS <rank>, <cols> FROM
<view>) WHERE <rank> <= N`.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from ..plans.classify import parse_topn
from ..plans.dialect import rewrite_query
from ..protocol.model import OP_APPEND, OP_CORRECT_FROM, OP_CORRECT_TO, InvalidQueryError
from .base import StepContext, StepResult, fast_local_df

OP_COL = "__op"
SEQ_COL = "__emit_seq"
SEQ_INPUT = "__seq"  # engine-provided ledger-offset column on input views

_SHAPE_RE = re.compile(
    r"^(?P<outer>select\s+.*?)\bfrom\s*\(\s*(?P<inner>select\b.*)\)\s*"
    r"(?P<tail>where\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)
_ORDER_RE = re.compile(
    r"row_number\s*\(\s*\)\s+over\s*\(\s*order\s+by\s+([`\w.]+)\s*(desc)?\s*\)",
    re.IGNORECASE,
)
_INNER_FROM_RE = re.compile(r"\bfrom\s+([`\w]+)\s*$", re.IGNORECASE | re.DOTALL)


def _prune_partition_local(df, order_col: str, descending: bool, limit: int,
                           part_keys=()):
    """Keep only rows that enter a PARTITION-LOCAL running top-N processed
    in ledger (__seq) order — per `part_keys` group when given (the keyed
    rank/dedup executor), globally otherwise. Safely conservative: dropped
    rows are beaten or tied by >= limit earlier rows locally, hence
    globally, so they can never enter the visible top-N (ties insert after
    equals, so a tie counts as beaten). Survivors stream on to the exact
    fold.

    Type-generic: the running top-N is a sorted list compared directly
    against its worst element, so any orderable type (strings, timestamps,
    numerics) prunes in either direction — no key negation. Missing scores
    or keys (None and the NaN/NaT that nullable columns become in Arrow
    batches — pd.isna covers both) pass through to the fold untouched and
    are never pushed into a list, where NaN comparisons would corrupt it.
    """
    import bisect

    import pandas as pd

    def batches(it):
        # The running top-N state carries ACROSS Arrow batches within a
        # partition (sound because the partition is seq-sorted below):
        # survivors per key shrink from ~N*ln(rows/key/batch) per batch to
        # ~N*ln(rows/key/partition) total — the difference between pruning
        # 26% and pruning 80% when batches hold few rows per key.
        best: dict = {}
        glob: list = []  # global (no part_keys) fast path
        for pdf in it:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(SEQ_INPUT, kind="mergesort")
            keep = []
            # Vectorized null masks + list materialization: iterating raw
            # pandas Series and calling pd.isna per cell is 3-5x slower
            # than this in the hot loop.
            vals = pdf[order_col].tolist()
            null_mask = pd.isna(pdf[order_col]).to_numpy()
            if part_keys:
                key_lists = [pdf[k].tolist() for k in part_keys]
                for k in part_keys:
                    null_mask = null_mask | pd.isna(pdf[k]).to_numpy()
                kt = (
                    key_lists[0]
                    if len(key_lists) == 1
                    else list(zip(*key_lists))
                )
            else:
                kt = None
            for i, v in enumerate(vals):
                if null_mask[i]:
                    keep.append(True)
                    continue
                lst = best.setdefault(kt[i], []) if part_keys else glob
                if len(lst) < limit:
                    bisect.insort(lst, v)
                    keep.append(True)
                elif descending:
                    if v > lst[0]:  # strictly beats the local N-th (min)
                        del lst[0]
                        bisect.insort(lst, v)
                        keep.append(True)
                    else:
                        keep.append(False)
                else:
                    if v < lst[-1]:  # strictly beats the local N-th (max)
                        del lst[-1]
                        bisect.insort(lst, v)
                        keep.append(True)
                    else:
                        keep.append(False)
            yield pdf[keep]

    # Partition-level seq sort (no shuffle): makes Arrow batches arrive in
    # ledger order, which the cross-batch carry above relies on — dropped
    # rows are then beaten only by genuinely EARLIER rows.
    return df.sortWithinPartitions(SEQ_INPUT).mapInPandas(batches, df.schema)


def _dedupe_columns(df):
    seen: dict[str, int] = {}
    cols = []
    for i, name in enumerate(df.columns):
        if name not in seen:
            seen[name] = i
            cols.append(df[i])
    return df.select(*cols) if len(cols) != len(df.columns) else df


def fold_records(ranking, rows, order_col, descending, limit):
    """Fold slice rows (ledger order) through a running top-N `ranking`
    (mutated in place, sorted best-to-worst), yielding changelog tuples
    (gseq, sub, op, place, row) — gseq is the triggering row's ledger
    offset, sub orders one record's corrections (ascending place, op 2
    before 3). Shared by the global driver fold and the per-key
    distributed fold (keyed_topn.py)."""

    def _beats(v: Any, ev: Any) -> bool:
        # DESC: nulls last — a non-null beats a null, null beats nothing.
        # ASC: nulls first — a null beats any non-null. Null vs null ties.
        if v is None:
            return (not descending) and ev is not None
        if ev is None:
            return descending
        return (v > ev) if descending else (v < ev)

    for row, gseq in rows:
        v = row[order_col]
        # Insertion point: ties go after existing entries (row_number
        # stability — an equal score does not displace an earlier row).
        # `ranking` is sorted best-to-worst, so _beats(v, ranking[i]) is
        # monotone in i and the first-True index binary-searches in
        # O(log N).
        lo, hi = 0, len(ranking)
        while lo < hi:
            mid = (lo + hi) // 2
            if _beats(v, ranking[mid][order_col]):
                hi = mid
            else:
                lo = mid + 1
        pos = lo
        if pos >= limit:
            continue
        old_top = ranking[:limit]
        ranking.insert(pos, row)
        new_top = ranking[:limit]
        sub = 0
        for place in range(pos, limit):
            if place >= len(new_top):
                break
            new_row = new_top[place]
            old_row = old_top[place] if place < len(old_top) else None
            if old_row is None:
                yield (gseq, sub, OP_APPEND, place + 1, new_row)
                sub += 1
            elif old_row != new_row:
                yield (gseq, sub, OP_CORRECT_FROM, place + 1, old_row)
                sub += 1
                yield (gseq, sub, OP_CORRECT_TO, place + 1, new_row)
                sub += 1
        del ranking[limit:]  # beyond-N tail can never resurface


def execute_topn(ctx: StepContext, sql: str) -> StepResult:
    spec = parse_topn(sql)
    if spec is not None:
        from .keyed_topn import execute_keyed_topn, parse_keyed_order

        if parse_keyed_order(sql) is not None:
            return execute_keyed_topn(ctx, sql, spec)
    shape = _SHAPE_RE.search(sql.strip())
    order_m = _ORDER_RE.search(sql)
    if spec is None or shape is None or order_m is None:
        raise InvalidQueryError("unsupported Top-N query shape")
    order_col = order_m.group(1).split(".")[-1].strip("`")
    descending = bool(order_m.group(2))
    inner_sql = shape.group("inner").strip()
    from_m = _INNER_FROM_RE.search(inner_sql)
    if not from_m:
        raise InvalidQueryError("Top-N subquery must read a single view")
    src = from_m.group(1).strip("`")
    if src not in ctx.views:
        raise InvalidQueryError(f"Top-N subquery reads unknown view {src!r}")

    # Ranked-subquery projection applied to this run's input rows. Input
    # order comes from the engine-provided __seq column (ledger offset) on
    # base input views; we thread it through the projection explicitly.
    inner_no_rank = re.sub(
        r"row_number\s*\(\s*\)\s+over\s*\([^)]*\)\s+as\s+[`\w]+\s*,?",
        "",
        inner_sql,
        flags=re.IGNORECASE,
    )
    if SEQ_INPUT in ctx.views[src].columns and SEQ_INPUT not in inner_no_rank:
        inner_no_rank = re.sub(
            r"^\s*select\s+", f"SELECT {SEQ_INPUT}, ", inner_no_rank, count=1, flags=re.IGNORECASE
        )
    incoming = ctx.spark.sql(rewrite_query(inner_no_rank))
    value_cols = [c for c in incoming.columns if c != SEQ_INPUT]

    state_name = f"{ctx.step_key}-topn-state"
    rank_col = spec.rank_alias  # the user's own rank alias (place, rownum, ...)
    state_schema = StructType(
        [StructField(rank_col, LongType())] + [incoming.schema[c] for c in value_cols]
    )
    prev_state = ctx.state.load_df(state_name, schema=state_schema)
    # One-time migration: engine revisions before the user-alias change
    # persisted the rank under a literal 'place' column; rename on load so
    # restored checkpoints keep their ranking state.
    if rank_col not in prev_state.columns and "place" in prev_state.columns:
        prev_state = prev_state.withColumnRenamed("place", rank_col)
    prev_rows = [r.asDict() for r in prev_state.orderBy(rank_col).collect()]
    ranking: list[dict[str, Any]] = [
        {k: v for k, v in r.items() if k != rank_col} for r in prev_rows
    ]

    # Distributed prefilter: only rows beating the current N-th can matter.
    # Null ordering matches the Flink/Spark default for row_number ORDER BY:
    # DESC ranks nulls last (a null never beats a non-null threshold, so the
    # null-dropping SQL comparison is exact); ASC ranks nulls first (a null
    # always beats a non-null threshold, so nulls must be kept). A null
    # threshold disables the prefilter — conservative, the fold is exact.
    if len(ranking) >= spec.limit and ranking[-1][order_col] is not None:
        threshold = ranking[-1][order_col]
        if descending:
            cond = F.col(order_col) > F.lit(threshold)
        else:
            cond = (F.col(order_col) < F.lit(threshold)) | F.col(order_col).isNull()
        candidates = incoming.filter(cond)
    else:
        candidates = incoming
    # Partition-local running-top-N prune before the driver collect: a row
    # beaten (or tied) by >= N earlier rows in its own partition is beaten
    # by >= N earlier rows globally, so it can never enter the visible
    # top-N and never emits changelog. Bounds the first-run collect to
    # ~N*ln(rows/partition) survivors per partition on shuffled data
    # instead of the whole input.
    if SEQ_INPUT in candidates.columns:
        candidates = _prune_partition_local(
            candidates, order_col, descending, spec.limit
        )
    rows = [r.asDict() for r in candidates.collect()]
    # Input order: sort by the ledger-offset sequencing column when present
    # (collect order is otherwise partition-dependent).
    if SEQ_INPUT in candidates.columns:
        rows.sort(key=lambda r: r[SEQ_INPUT])

    fold_rows = [
        ({k: v for k, v in row.items() if k in value_cols}, row.get(SEQ_INPUT))
        for row in rows
    ]
    changelog: list[dict[str, Any]] = []
    seq = 0
    for _gseq, _sub, op, place, row in fold_records(
        ranking, fold_rows, order_col, descending, spec.limit
    ):
        changelog.append({**row, rank_col: place, OP_COL: op, SEQ_COL: seq})
        seq += 1

    out_schema = StructType(
        list(state_schema.fields)
        + [StructField(OP_COL, IntegerType()), StructField(SEQ_COL, LongType())]
    )
    changelog_df = fast_local_df(ctx.spark, changelog, out_schema)

    new_state = fast_local_df(
        ctx.spark,
        [{rank_col: i + 1, **row} for i, row in enumerate(ranking[: spec.limit])],
        state_schema,
    )
    ctx.state.save_df(state_name, new_state)

    # Re-apply the user's outer projection over the changelog, threading the
    # internal op/sequence columns through.
    view_name = f"__topn_changelog_{ctx.step_key.replace('-', '_')}"
    changelog_df.createOrReplaceTempView(view_name)
    outer = shape.group("outer")
    injected = re.sub(
        r"^select\s+", f"SELECT {OP_COL}, {SEQ_COL}, ", outer, count=1, flags=re.IGNORECASE
    )
    final_sql = f"{injected} FROM {view_name} {shape.group('tail')}"
    result = _dedupe_columns(ctx.spark.sql(rewrite_query(final_sql)))

    wm = ctx.new_wms.get(src)
    # __-prefixed columns (the op/sequence plumbing) are dropped by the
    # output assembly's internal-column convention (transform.py).
    return StepResult(df=result, watermark=wm, order_cols=[SEQ_COL])
