"""ExecuteTransform: the resumable streaming-SQL transform runner.

Re-derives the reference's main code path (TransformEngine.scala:64-336)
Spark-first. One invocation = one batch job over (new slices ∪ persisted
operator state); engine-owned state files play the savepoint role. The
awkward run-until-marker-files-then-stop-with-savepoint machinery
(TransformEngine.scala:338-380) disappears by design — Spark's batch
execution IS "process what's here and exit".

Pipeline per invocation:
  1. open inputs: read slices (offset-ordered), apply offsetInterval slice
     filter (TransformEngine.scala:432-449), strip offset/system_time
     before user SQL sees the table (:234-248; `op` stays visible, §1.4),
     expose the ledger offset as internal `__seq` for emission ordering;
  2. resolve watermarks: effective = max(previous, request explicit)
     (ParquetFilesStreamSourceFunction.scala:46-56 — prev watermark first,
     data under it, explicit watermarks last);
  3. run each SQL step through its classified stateful executor
     (plans/classify.py), registering aliased steps as views for later
     steps (TransformEngine.scala:252-262);
  4. validate output (must contain event_time, must not contain
     offset/system_time — TransformEngine.scala:269-289), append system
     columns, stamp offsets (OffsetOperator.scala:11-24) and ops
     (ChangelogOperator.scala:14-23);
  5. write ONE parquet file, persist state, report newOffsetInterval +
     newWatermark (TransformEngine.scala:140-153).
"""

from __future__ import annotations

import os
import re
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import (
    changelog_join,
    distinct_step,
    interval_join,
    map_step,
    match_recognize,
    over_agg,
    regular_join,
    setop_step,
    temporal_join,
    unbounded_agg,
    topn,
    window_agg,
    window_join,
)
from ..operators.base import StepContext, StepResult
from ..session import conf_int
from ..plans import classify as C
from ..plans import multi_join as MJ
from ..protocol.model import (
    OP_APPEND,
    InvalidQueryError,
    OffsetInterval,
    TransformRequest,
    TransformRequestInput,
    TransformResponse,
)
from ..sinks.parquet import write_single_parquet
from ..sources.parquet import read_parquet_slices, table_schema
from .state import StateStore

SEQ = "__seq"

# Below this many input-slice bytes the mid-chain emission-order stamp
# stays a single-partition window (lazy, zero extra jobs — right for the
# small per-invocation emissions of most chains); above it, the stamp
# range-partitions so a multi-million-row correction stream feeding a
# projection never serializes through one task.
# The distributed emission stamp pays a range-partition sampling pass and
# a per-partition-count collect; the single-partition window stamp pays a
# one-partition sort of the whole emission. The gate reads the EMISSION
# frame's own row count (the input slice is no proxy: a join blow-up or a
# wide correction stream can amplify a small slice into a multi-million-row
# emission, which is exactly the case the distributed path exists for).
# Default threshold measured on local[32] at bench scale: the
# single-partition sort still wins at ~200k rows (4.9 s vs 6.6 s,
# bench.py stress_changelog_stamp entry) and loses by ~2x at ~4M rows
# (bench.py stamp_dist_crossover entry); 1M sits at the measured
# crossover.
_STAMP_DIST_CONF = "spark.kamu.stampDistributedMinRows"
_STAMP_DIST_DEFAULT = 1_000_000
# When the chain provably ends in the dense output fast path
# (_dense_chain_to_output), the serial stamp is kept at ANY emission size
# with NO gate materialization while this conf is UNSET (the default; see
# the fast-path branch in execute_transform) — its single serial pass
# replaces BOTH serial passes of the windowed path, and the distributed
# alternatives re-measured SLOWER even at 2M rows (r14 interleaved A/B:
# serial 4.25 s vs range+coalesce 4.91 vs cached JVM-stamp 4.83; the
# one-task encode of the single-file contract dominates and the
# alternatives add a sampling pass / cache cycle on top). SETTING the
# conf restores the counted gate, with this constant as the fallback cap
# only when the set value fails int() parsing — the escape hatch for a
# real cluster where one task's n log n sort eventually loses.
_STAMP_DENSE_SERIAL_CONF = "spark.kamu.stampDenseSerialMaxRows"
_STAMP_DENSE_SERIAL_DEFAULT = 4_000_000


def _stamp_emission_seq(spark, df, order_cols, pinned, persisted=False):
    """Distributed emission-order stamp: range-partition on order_cols
    (partitions come out globally ordered) + in-partition sort, derive
    per-partition base offsets from a prefix sum over the (tiny)
    per-partition counts, and add base + position in one Arrow pass —
    the sink's partitioned-ledger trick (sinks/parquet.py:84-123)
    applied mid-chain. Same order as the single-partition window stamp;
    ties across a range boundary can land on either side, which is the
    existing contract (equal tuples are interchangeable)."""
    from pyspark import StorageLevel
    from pyspark.sql.types import LongType, StructField, StructType

    # Pin the emission BEFORE range partitioning: the range partitioner's
    # sampling pass would otherwise recompute the whole upstream (state
    # union + fold) a second time. (Skipped when the caller's gate
    # already pinned and counted the frame.)
    if not persisted:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        pinned.append(df)
    n = spark.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(
        n, *[F.col(c).asc() for c in order_cols]
    ).sortWithinPartitions(*[F.col(c).asc() for c in order_cols])
    tagged = ordered.withColumn("__pid", F.spark_partition_id()).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pinned.append(tagged)
    counts = {
        r["__pid"]: r["cnt"]
        for r in tagged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    base, acc = {}, 0
    for pid in sorted(counts):
        base[pid] = acc
        acc += counts[pid]
    # Not explicitly destroyed: the stamped frame is consumed lazily by
    # later steps/output, so the broadcast must outlive this function;
    # it is unreferenced after the invocation and GC'd with the plan.
    bbase = spark.sparkContext.broadcast(base)
    has_seq = SEQ in df.columns

    def stamp(it):
        # Per-pid cursors, re-seeded from the broadcast base whenever the
        # pid changes: a downstream coalesce(1) (the dense-seq output fast
        # path) fuses this pass into one task that iterates SEVERAL range
        # partitions, and an Arrow batch can even straddle two of them —
        # so seq values derive from each row's own pid run, never from
        # "the task's partition".
        import numpy as np

        cur_pid, cursor = None, 0
        for pdf in it:
            if not len(pdf):
                continue
            pids = pdf["__pid"].to_numpy()
            seqs = np.empty(len(pdf), dtype="int64")
            bounds = [0, *(np.flatnonzero(np.diff(pids)) + 1), len(pdf)]
            for s, e in zip(bounds, bounds[1:]):
                pid = int(pids[s])
                if pid != cur_pid:
                    cur_pid, cursor = pid, bbase.value[pid]
                seqs[s:e] = np.arange(cursor, cursor + (e - s))
                cursor += e - s
            out = pdf.drop(columns="__pid")
            # Overwrites in place when __seq already exists (re-stamp of a
            # forwarded ledger offset), appends otherwise — either way the
            # column ORDER matches `schema` below, so star expansion over
            # the alias view is unchanged.
            out[SEQ] = seqs
            yield out

    fields = [
        StructField(f.name, LongType(), True) if f.name == SEQ else f
        for f in df.schema.fields
    ]
    if not has_seq:
        fields.append(StructField(SEQ, LongType(), True))
    return tagged.mapInPandas(stamp, StructType(fields))


def _dense_chain_to_output(alias: str, later_steps, all_names: set) -> bool:
    """True when `alias` provably reaches the FINAL step through pure 1:1
    projections only — the shape where the dense output fast path
    (_assemble_output) fires. The stamp gate then keeps the SERIAL stamp
    at ANY emission size: the chain's one unavoidable serial pass (the
    stamp, folded into the write task's lineage) replaces BOTH serial
    passes of the windowed path, and beats the distributed stamp + serial
    windowed assembly (measured on the 2M-row stamp_2m twins: serial+
    dense 7.6 s vs distributed+windowed 9.2 s; the crossover the 1M size
    gate encodes only exists when the output pass cannot be skipped).
    Conservative: a second consumer, a name rebind, or any
    non-pure-projection hop returns False — the size gate then decides
    as before."""
    cur = alias
    for j, s2 in enumerate(later_steps):
        refs2 = C.referenced_views(s2.query, all_names)
        if cur not in refs2:
            if s2.alias == cur:
                return False  # name rebound away from the chain
            continue
        if any(
            cur in C.referenced_views(s3.query, all_names)
            for s3 in later_steps[j + 1 :]
        ):
            return False  # a second consumer reads the alias too
        if C.classify(s2.query, all_names) != C.MAP:
            return False
        if not map_step.dense_shape(s2.query, refs2):
            return False
        if j == len(later_steps) - 1:
            return True  # the final step: output assembly sees dense
        if s2.alias is None:
            return False
        cur = s2.alias
    return False


def _safe_name(alias: str) -> str:
    """Spark temp-view-safe alias. The reference allows dotted dataset
    aliases quoted with backticks in SQL (`stocks.owned`,
    EngineJoinStreamToTemporalTableTest.scala:83); Spark temp views cannot
    contain dots, so dotted aliases map to __-joined names and the SQL text
    is rewritten accordingly."""
    import re as _re

    return _re.sub(r"[^\w]", "__", alias)


def _sanitize_sql(sql: str, aliases: dict[str, str]) -> str:
    for orig, safe in aliases.items():
        if orig != safe:
            sql = sql.replace(f"`{orig}`", safe)
    return sql

_EXECUTORS = {
    C.MAP: map_step.execute_map,
    C.DISTINCT: distinct_step.execute_distinct,
    C.WINDOW_AGG: window_agg.execute_window_agg,
    C.HOP_AGG: window_agg.execute_hop_agg,
    C.SESSION_AGG: window_agg.execute_session_agg,
    C.CUMULATE_AGG: window_agg.execute_cumulate_agg,
    C.INTERVAL_JOIN: interval_join.execute_interval_join,
    C.REGULAR_JOIN: regular_join.execute_regular_join,
    C.UNBOUNDED_AGG: unbounded_agg.execute_unbounded_agg,
    C.TEMPORAL_JOIN: temporal_join.execute_temporal_join,
    C.TOPN: topn.execute_topn,
    C.OVER_AGG: over_agg.execute_over_agg,
    C.MATCH_RECOGNIZE: match_recognize.execute_match_recognize,
    C.WINDOW_JOIN: window_join.execute_window_join,
    C.SETOP: setop_step.execute_setop,
}


def _open_input(spark: SparkSession, input_def: TransformRequestInput) -> DataFrame:
    """Slice read + offset-interval filter + system-column strip."""
    vocab = input_def.vocab
    if input_def.data_paths:
        df = read_parquet_slices(spark, input_def.data_paths)
    else:
        # Watermark-only invocation: no new data, same schema.
        df = spark.createDataFrame([], table_schema(spark, input_def.schema_file))
    if input_def.offset_interval is not None:
        oi = input_def.offset_interval
        df = df.filter(
            (F.col(vocab.offset_column) >= oi.start) & (F.col(vocab.offset_column) <= oi.end)
        )
    # No input-side sort: ledger order is carried relationally by the
    # offset (as `__seq`) and re-imposed only where emission order needs
    # it (output assembly order_cols, Top-N state fold). A global
    # orderBy here would be a full sort+exchange of every input per
    # invocation that no downstream operator could rely on anyway (joins
    # and aggs destroy physical order).
    df = df.withColumn(SEQ, F.col(vocab.offset_column))
    return df.drop(vocab.offset_column, vocab.system_time_column)


def _effective_watermark(
    prev: datetime | None, input_def: TransformRequestInput
) -> datetime | None:
    wms = [w.event_time for w in input_def.explicit_watermarks]
    if prev is not None:
        wms.append(prev)
    return max(wms) if wms else None


def execute_transform(spark: SparkSession, request: TransformRequest) -> TransformResponse:
    state = StateStore(spark, request.prev_checkpoint_path, request.new_checkpoint_path)
    state.begin_deferred()
    saved_wms = state.load_watermarks()

    views: dict[str, DataFrame] = {}
    event_time_cols: dict[str, str] = {}
    prev_wms: dict[str, datetime | None] = {}
    new_wms: dict[str, datetime | None] = {}

    alias_map = {i.query_alias: _safe_name(i.query_alias) for i in request.query_inputs}
    for step in request.transform.queries:
        if step.alias:
            alias_map[step.alias] = _safe_name(step.alias)
    for t in request.transform.temporal_tables:
        alias_map.setdefault(t.name, _safe_name(t.name))
    # Distinct aliases must stay distinct after sanitization — `a.b` and
    # `a__b` both map to a__b, and a silent collision would merge two
    # inputs into one view.
    if len(set(alias_map.values())) != len(alias_map):
        from collections import Counter

        dupes = [s for s, n in Counter(alias_map.values()).items() if n > 1]
        raise InvalidQueryError(
            f"dataset aliases collide after view-name sanitization: {dupes}"
        )
    if any(o != s for o, s in alias_map.items()):
        from dataclasses import replace as _replace

        request = _replace(
            request,
            transform=_replace(
                request.transform,
                queries=[
                    _replace(
                        q,
                        query=_sanitize_sql(q.query, alias_map),
                        alias=alias_map.get(q.alias, q.alias) if q.alias else None,
                    )
                    for q in request.transform.queries
                ],
                temporal_tables=[
                    _replace(t, name=alias_map.get(t.name, t.name))
                    for t in request.transform.temporal_tables
                ],
            ),
        )

    slice_sizes: dict[str, int] = {}
    for input_def in request.query_inputs:
        alias = alias_map[input_def.query_alias]
        views[alias] = _open_input(spark, input_def)
        views[alias].createOrReplaceTempView(alias)
        event_time_cols[alias] = input_def.vocab.event_time_column
        prev_wms[alias] = saved_wms.get(alias)
        new_wms[alias] = _effective_watermark(prev_wms[alias], input_def)
        slice_sizes[alias] = sum(
            os.path.getsize(p) for p in input_def.data_paths if os.path.exists(p)
        )

    steps = list(request.transform.queries)
    result: StepResult | None = None
    pinned: list[DataFrame] = []
    # Aliases whose __seq is dense 0..n-1 in physical order this
    # invocation (stamped below, or a pure projection over one) — lets
    # _assemble_output derive offsets arithmetically with no second
    # serial pass, and lets a chained projection skip an identity
    # re-stamp. Shared across steps like `views`.
    dense_views: set[str] = set()
    # Pinned (MEMORY_AND_DISK) DataFrames must be released even when an
    # executor step, the output write, or the state save raises — a
    # long-lived adapter process runs many invocations on one session and
    # would otherwise leak the cache on every failure.
    mj_count = 0
    try:
        i = -1
        while i + 1 < len(steps):
            i += 1
            step = steps[i]
            # A multi-INNER-join step expands into the chain of aliased
            # single-join steps Flink's planner would build (full-history
            # state at every stage; plans/multi_join.py). Deterministic
            # per request, so step state keys stay stable across
            # invocations.
            expanded = MJ.expand_multi_join(
                step.query,
                set(views),
                {v: df.columns for v, df in views.items()},
                f"__mj{mj_count}",
            )
            if expanded:
                mj_count += 1
                from dataclasses import replace as _sreplace

                steps[i : i + 1] = [
                    _sreplace(step, query=q, alias=a if a is not None else step.alias)
                    for q, a in expanded
                ]
                step = steps[i]
            ctx = StepContext(
                spark=spark,
                state=state,
                step_key=f"step{i}",
                request=request,
                views=views,
                event_time_cols=event_time_cols,
                prev_wms=prev_wms,
                new_wms=new_wms,
                pinned=pinned,
                slice_sizes=slice_sizes,
                dense_seq_views=dense_views,
            )
            kind = C.classify(step.query, set(views))
            # A chained step reading a changelog-EMITTING alias (outer
            # regular-join pads/retractions, continuous-agg correction
            # pairs): Flink propagates the retractions into the consumer.
            # The continuous aggregation folds them (op 1/2 as negative
            # contributions), a plain projection forwards the op tags, and
            # a regular equi-join consumes them through the signed-ledger
            # executor (operators/changelog_join.py); every other step
            # kind would treat a pad AND its later retraction as two plain
            # appends — silently wrong, so reject loudly. (INNER regular
            # joins and windowed steps emit append-only streams and chain
            # freely.)
            changelog_refs = sorted(
                v
                for v in C.referenced_views(step.query, set(views))
                if topn.OP_COL in views[v].columns
            )
            if changelog_refs and kind not in (
                C.UNBOUNDED_AGG,
                C.MAP,
                C.REGULAR_JOIN,
                C.DISTINCT,
                C.TOPN,
                C.TEMPORAL_JOIN,
                C.SETOP,
            ):
                raise InvalidQueryError(
                    f"step reads updating (changelog-emitting) alias(es) "
                    f"{', '.join(changelog_refs)}: only a windowless GROUP "
                    "BY aggregation (which folds op 1/2 rows as "
                    "retractions), a plain projection (which forwards "
                    "the op tags), SELECT DISTINCT (which keeps per-value "
                    "counts), Top-N (which re-ranks from a signed row "
                    "ledger), a regular equi-join (which applies "
                    "them as state deletions), or a temporal (as-of) join "
                    "on either side (an updating build maintains the "
                    "versioned view; an updating probe forwards its op "
                    "tags through the resolution), or a set operation "
                    "(which folds signed branch counts) can consume an "
                    "updating stream; other step kinds would misread "
                    "correction/retraction rows as appends"
                )
            if changelog_refs and kind == C.TEMPORAL_JOIN:
                result = temporal_join.execute_changelog_temporal_join(
                    ctx, step.query
                )
            elif changelog_refs and kind == C.REGULAR_JOIN:
                result = changelog_join.execute_changelog_join(ctx, step.query)
            elif changelog_refs and kind == C.TOPN:
                from ..operators import changelog_topn as CT

                spec_t = C.parse_topn(step.query)
                if spec_t is None:
                    raise InvalidQueryError("unsupported Top-N query shape")
                result = CT.execute_changelog_topn(ctx, step.query, spec_t)
            else:
                result = _EXECUTORS[kind](ctx, step.query)
            if step.alias:
                adf = result.df
                # A changelog-emitting alias consumed by a downstream
                # MAP-kind step (projection, filter, UNION ALL) needs its
                # emission order materialized: the op 2-before-3 pair
                # adjacency lives in order_cols, which reference internal
                # columns a projection won't carry. Every OTHER consumer
                # folds per tuple — continuous agg (signed accumulators),
                # changelog join (signed ledgers), retractable Top-N
                # (re-rank from nets), DISTINCT (per-value counts) — and
                # never reads arrival order, so the stamp (a
                # single-partition sort of the WHOLE per-invocation
                # emission, the one O(emission) serial point in these
                # chains) is skipped for them.
                all_names = set(views) | {s.alias for s in steps if s.alias}
                # TEMPORAL_JOIN consumers also need the stamp: version rows
                # of one key tie on event_time within an invocation, and
                # the emission seq is the deterministic tie-break.
                if result.dense_seq:
                    # A pure projection over a densely stamped alias: its
                    # __seq is already exactly 0..n-1 in physical order,
                    # so the stamp below would be an identity rewrite —
                    # skip it and propagate the density instead.
                    dense_views.add(step.alias)
                elif (
                    topn.OP_COL in adf.columns
                    and result.order_cols
                    and any(
                        step.alias in C.referenced_views(s2.query, {step.alias})
                        and C.classify(s2.query, all_names)
                        in (C.MAP, C.TEMPORAL_JOIN)
                        for s2 in steps[i + 1 :]
                    )
                ):
                    dist_min = conf_int(
                        spark, _STAMP_DIST_CONF, _STAMP_DIST_DEFAULT
                    )
                    dense_cap_raw = spark.conf.get(
                        _STAMP_DENSE_SERIAL_CONF, None
                    )
                    if dist_min <= 0:
                        # Forced distributed (tests / calibration).
                        adf = _stamp_emission_seq(
                            spark, adf, result.order_cols, pinned
                        )
                    elif dense_cap_raw is None and _dense_chain_to_output(
                        step.alias, steps[i + 1 :], all_names
                    ):
                        # Provably dense chain (single consumer, pure 1:1
                        # projections to the FINAL step): serial stamp with
                        # NO gate materialization — skip the persist and
                        # the count entirely. The gate exists to choose
                        # serial vs distributed by size, but for a dense
                        # chain the distributed variant cannot win at ANY
                        # size: its output pass (not dense-marked, see the
                        # serial-branch note below) still ends in the same
                        # one-task sort-by-__seq + encode + single-file
                        # write that the serial stamp's one task performs —
                        # a strict superset of work (range shuffle + Arrow
                        # stamp + persist on top). The old 4M cap was
                        # extrapolated from the PRE-dense r9 calibration,
                        # where the serial path paid the windowed output
                        # pass twice; with the dense output path that
                        # second pass does not exist. Setting
                        # spark.kamu.stampDenseSerialMaxRows restores the
                        # counted gate (tests force tiny caps; a real
                        # cluster can re-enable the escape hatch). Single
                        # consumer means the un-persisted emission is
                        # computed exactly once, inside the one output job
                        # — the persist here was a pure cache-write cost
                        # (~1.5 s of the 2M-row stamp twin's 8.3 s).
                        w = Window.partitionBy(F.lit(0)).orderBy(
                            *[F.col(c).asc() for c in result.order_cols]
                        )
                        adf = adf.repartition(1).withColumn(
                            SEQ, (F.row_number().over(w) - 1).cast("long")
                        )
                        dense_views.add(step.alias)
                    else:
                        # Gate on the emission frame ITSELF: pin it and
                        # count. The pin is not overhead — both stamp
                        # paths re-read the frame (the window stamp's
                        # one-partition sort would otherwise recompute
                        # the whole upstream state union + fold), and
                        # the count is then a cached-partition scan.
                        from pyspark import StorageLevel

                        adf = adf.persist(StorageLevel.MEMORY_AND_DISK)
                        pinned.append(adf)
                        n_rows = adf.count()
                        # A chain that provably ends in the dense output
                        # fast path raises the serial stamp's crossover:
                        # its one serial pass replaces BOTH serial passes
                        # of the windowed path (measured on the 2M-row
                        # stamp_2m twins: serial+dense 7.6 s vs
                        # distributed+windowed-output 9.2 s). This counted
                        # path only runs for dense chains when the cap
                        # conf is explicitly set (see the fast path above);
                        # the cap then returns huge emissions to the
                        # distributed stamp.
                        try:
                            dense_cap = int(dense_cap_raw)
                        except (TypeError, ValueError):
                            dense_cap = _STAMP_DENSE_SERIAL_DEFAULT
                        if n_rows >= dist_min and not (
                            n_rows < dense_cap
                            and _dense_chain_to_output(
                                step.alias, steps[i + 1 :], all_names
                            )
                        ):
                            adf = _stamp_emission_seq(
                                spark, adf, result.order_cols, pinned,
                                persisted=True,
                            )
                        else:
                            w = Window.partitionBy(F.lit(0)).orderBy(
                                *[F.col(c).asc() for c in result.order_cols]
                            )
                            adf = adf.repartition(1).withColumn(
                                SEQ, (F.row_number().over(w) - 1).cast("long")
                            )
                            # Only the SERIAL stamp marks the alias dense.
                            # The distributed stamp's seq is equally dense,
                            # but letting the output fast path skip its
                            # final sort would make the sink's coalesce(1)
                            # fuse the stamp's mapInPandas into the single
                            # write task — a serial Arrow round trip of
                            # the whole emission, measured SLOWER than the
                            # JVM repartition(1)+sort it replaces (13.3 vs
                            # 11.8 s on the 2M-row stamp_2m_gate twin; the
                            # serial case wins 8.9 vs 10.9 s because both
                            # of its passes were already one JVM task).
                            dense_views.add(step.alias)
                views[step.alias] = adf
                adf.createOrReplaceTempView(step.alias)
                event_time_cols[step.alias] = request.vocab.event_time_column
                prev_wms[step.alias] = saved_wms.get(step.alias)
                new_wms[step.alias] = result.watermark
        if result is None:
            raise InvalidQueryError("transform contains no query steps")

        out_df = _assemble_output(spark, request, result)
        # Flush every deferred state write in parallel WITH the output
        # write — all independent outputs (state loads only ever read the
        # previous checkpoint dir), so nothing serializes on anything.
        counts = {}

        def _write_output():
            counts["n"] = write_single_parquet(
                out_df, request.new_data_path, sorted_single=True
            )

        state.flush_deferred(also=_write_output)
        num_records = counts["n"]
        if num_records == 0:
            # The reference writes no data file on an empty result (e.g. a
            # watermark-only run with nothing to flush) — EngineAggregationTest
            # asserts !Files.exists(newDataPath).
            os.remove(request.new_data_path)

        # Persist watermark state for every view (inputs + aliased steps).
        state.save_watermarks({**new_wms, "__output__": result.watermark})
        state.finish()
    finally:
        for df in pinned:
            df.unpersist()

    return TransformResponse(
        new_offset_interval=(
            OffsetInterval(request.next_offset, request.next_offset + num_records - 1)
            if num_records > 0
            else None
        ),
        new_watermark=result.watermark,
    )


def _assemble_output(
    spark: SparkSession, request: TransformRequest, result: StepResult
) -> DataFrame:
    vocab = request.vocab
    df = result.df
    user_cols = [c for c in df.columns if not c.startswith("__")]

    if vocab.event_time_column not in user_cols:
        raise InvalidQueryError(
            f"Event time column {vocab.event_time_column} was not found amongst: "
            + ", ".join(user_cols)
        )
    for forbidden in (vocab.offset_column, vocab.system_time_column):
        if forbidden in user_cols:
            raise InvalidQueryError(
                f"Transformed data contains a column that conflicts with the system "
                f"column name, you should either rename the data column or configure "
                f"the dataset vocabulary to use a different name: {forbidden}"
            )

    # Deterministic emission order -> offset stamping. Sorting happens on
    # the full (possibly internal) column set, then internals are dropped.
    if result.dense_seq and result.order_cols == [SEQ]:
        # Dense fast path: __seq is exactly 0..n-1 and the frame's
        # physical (partition-major) row order IS seq order — the
        # engine's own mid-chain stamp guarantees both, and a pure
        # projection preserves them. The offset is then arithmetic and
        # the sink's coalesce(1) (partitions concatenate in index
        # order) keeps rows in offset order: the serial
        # repartition(1) + whole-emission window sort below is skipped.
        return _finalize_output(
            df.withColumn(
                vocab.offset_column,
                (F.col(SEQ) + F.lit(request.next_offset)).cast("long"),
            ),
            request,
            user_cols,
        )
    if result.order_cols:
        # One round-robin shuffle to a single partition, with the
        # deterministic sort folded into the offset-stamping window (the
        # window operator sorts its partition anyway). A global orderBy
        # here would add a range-partitioner SAMPLING job + an extra sort
        # per invocation for the same single-partition result.
        df = df.repartition(1)
        w = Window.partitionBy(F.lit(0)).orderBy(
            *[F.col(c).asc() for c in result.order_cols]
        )
    else:
        # Natural (narrow-plan) order must be preserved -> coalesce, and
        # number rows by physical position.
        df = df.coalesce(1)
        w = Window.partitionBy(F.lit(0)).orderBy(F.monotonically_increasing_id())
    df = df.withColumn(
        vocab.offset_column,
        (F.row_number().over(w) - 1 + F.lit(request.next_offset)).cast("long"),
    )
    return _finalize_output(df, request, user_cols)


def _finalize_output(
    df: DataFrame, request: TransformRequest, user_cols: list[str]
) -> DataFrame:
    """Shared tail of output assembly once the offset column exists: op
    derivation, system_time stamp, system/internal column ordering."""
    vocab = request.vocab
    # op: propagated if the user query emitted it, else executor-derived
    # (Top-N corrections), else Append (TransformEngine.scala:294-302).
    if vocab.operation_type_column in user_cols:
        df = df.withColumn(
            vocab.operation_type_column, F.col(vocab.operation_type_column).cast("int")
        )
    elif topn.OP_COL in df.columns:
        df = df.withColumn(vocab.operation_type_column, F.col(topn.OP_COL).cast("int"))
    else:
        df = df.withColumn(vocab.operation_type_column, F.lit(OP_APPEND).cast("int"))

    df = df.withColumn(
        vocab.system_time_column, F.lit(request.system_time).cast("timestamp")
    )

    ordered_user_cols = [
        c for c in user_cols if c not in (vocab.operation_type_column,)
    ]
    # Internal (__-prefixed) columns drop out here.
    return df.select(
        vocab.offset_column,
        vocab.operation_type_column,
        vocab.system_time_column,
        *ordered_user_cols,
    )
