"""Structured Streaming execution of the engine's windowed-aggregation
surface, for always-on deployments.

The micro-batch engine (engine/transform.py) implements the reference's
process-available-then-suspend contract (TransformEngine.scala:338-380)
with engine-owned state, because ODF injects EXPLICIT watermarks that
Spark's `withWatermark` (data-derived) cannot express. When a deployment
instead wants a continuously running job with DATA-DERIVED watermarks —
the common Spark-native shape — this module provides it directly on
Structured Streaming:

  - `readStream` file source over a slice directory (new parquet files
    are discovered per micro-batch, mirroring the reference's
    slice-vector-append model, ParquetFilesStreamSourceFunction.scala);
  - `withWatermark(event_time, delay)` == the reference's
    MaxOutOfOrderWatermarkGenerator (BoundedOutOfOrderWatermark.scala:16-69)
    derived mode: watermark = max(event_time) - delay, monotonic;
  - tumbling `window()` aggregation in append mode == TUMBLE emit-once-
    when-watermark-passes semantics (README 'Windowed Aggregations');
  - checkpointed `Trigger.AvailableNow` == process what exists, persist
    state, stop — the savepoint-suspend cycle without the savepoint hacks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@dataclass
class StreamingWindowAgg:
    """Continuous tumbling-window aggregation over a growing directory of
    parquet slices.

    aggs: mapping of output column -> SQL aggregate expression over the
    input columns (e.g. {"min_price": "min(price)"}).
    """

    input_dir: str
    checkpoint_dir: str
    output_dir: str
    window_duration: str = "1 day"
    watermark_delay: str = "1 day"
    event_time_col: str = "event_time"
    group_keys: list[str] = field(default_factory=list)
    aggs: dict[str, str] = field(default_factory=dict)
    schema: StructType | None = None
    slide_duration: str | None = None  # None = tumbling; else sliding/hopping
    # Cumulative windows (Flink CUMULATE): window_duration acts as the
    # span SIZE and cumulate_step as the growing step. Implemented by
    # exploding each row into its cumulative-window ends and watermarking
    # the END column itself — Spark's append-mode aggregation finalizes a
    # (end, keys) group once the derived watermark passes it, which is
    # exactly the cumulate emission rule. The end-column watermark runs
    # ahead of the event-time one by up to `size`, so late tolerance is
    # watermark_delay measured against window ends, not raw events.
    cumulate_step: str | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        schema = self.schema
        if schema is None:
            schema = spark.read.parquet(self.input_dir).schema
        stream = spark.readStream.schema(schema).parquet(self.input_dir)
        agg_cols = [F.expr(expr).alias(name) for name, expr in self.aggs.items()]
        if self.cumulate_step is not None:
            from ..plans.dialect import cumulate_ends_sql

            step_n, step_u = self.cumulate_step.split()
            size_n, size_u = self.window_duration.split()
            ends = cumulate_ends_sql(
                self.event_time_col, step_n, step_u, size_n, size_u
            )
            return (
                stream.withColumn("__cum_end", F.explode(F.expr(ends)))
                .withWatermark("__cum_end", self.watermark_delay)
                .groupBy("__cum_end", *self.group_keys)
                .agg(*agg_cols)
                .select(
                    F.col("__cum_end").alias(self.event_time_col),
                    *self.group_keys,
                    *self.aggs.keys(),
                )
            )
        window = (
            F.window(F.col(self.event_time_col), self.window_duration, self.slide_duration)
            if self.slide_duration
            else F.window(F.col(self.event_time_col), self.window_duration)
        )
        return (
            stream.withWatermark(self.event_time_col, self.watermark_delay)
            .groupBy(window.alias("w"), *self.group_keys)
            .agg(*agg_cols)
            .select(
                F.col("w.start").alias(self.event_time_col),
                *self.group_keys,
                *self.aggs.keys(),
            )
        )

    def run_available_now(self, spark: SparkSession) -> None:
        """One incremental pass: process all files not yet seen by the
        checkpoint, emit windows the (derived) watermark has closed since
        the previous pass, persist stream + operator state, stop."""
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


@dataclass
class StreamingSessionWindow:
    """Continuous session-window aggregation — activity bursts separated
    by >= `gap` of event-time silence become one row per (key, session).

    The reference has NO session windows at all (README 'Does not support
    month/quarter/year tumbling windows'; only TUMBLE appears in the repo)
    — this is beyond-reference surface. Spark Structured Streaming has a
    NATIVE streaming session window (`F.session_window`, merging windows
    in the state store, append-mode emit once the watermark passes
    session_end + 0), so no custom stateful kernel is warranted: the
    built-in shards session state by grouping key across executors and
    merges partial sessions exactly once per micro-batch.

    A session stays open across invocations (checkpointed state) until
    the derived watermark proves no event can extend it — so a run-2
    slice inside the gap EXTENDS a run-1 session rather than opening a
    new one; the batch counterpart is the gaps-and-islands
    `window_session_30m` query in __spark_entry__.py."""

    input_dir: str
    checkpoint_dir: str
    output_dir: str
    gap: str = "30 minutes"
    watermark_delay: str = "1 hour"
    event_time_col: str = "event_time"
    group_keys: list[str] = field(default_factory=list)
    aggs: dict[str, str] = field(default_factory=dict)
    schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        stream = _file_stream(spark, self.input_dir, self.schema)
        agg_cols = [F.expr(expr).alias(name) for name, expr in self.aggs.items()]
        return (
            stream.withWatermark(self.event_time_col, self.watermark_delay)
            .groupBy(
                F.session_window(F.col(self.event_time_col), self.gap).alias("w"),
                *self.group_keys,
            )
            .agg(*agg_cols)
            .select(
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                *self.group_keys,
                *self.aggs.keys(),
            )
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


def _run_available_now(
    plan: DataFrame,
    checkpoint_dir: str,
    output_dir: str,
    input_dirs: "tuple[str, ...] | list[str] | None" = None,
    max_drain_ticks: int = 4,
) -> None:
    """Run the plan to completion under Trigger.AvailableNow — and DRAIN.

    Correct run-attribution in the banded twin harnesses requires that
    by the time this returns, EVERY row releasable at the checkpoint's
    final watermark has been written: the kernels buffer under
    event-time timeouts (`state.setTimeoutTimestamp`), and those fire
    in the trailing no-data micro-batch that runs after the last data
    batch advanced the watermark. Under a loaded driver session that
    trailing batch is timing-sensitive (the round-12 driver observed a
    run-1-eligible probe slipping to run 2: equal row counts, flipped
    `inv`, red hash), so this wrapper makes the drain deterministic:

      - FAST PATH: if the run's last StreamingQueryProgress has
        `numInputRows == 0`, the trailing no-data batch did execute at
        the final watermark — nothing more can release without new
        data, so no drain is needed (zero extra cost, the common case).
      - Otherwise, write a ZERO-ROW "tick" parquet into each input dir
        and restart the query against the same checkpoint, repeating
        until a restart emits zero new rows. A bare restart with no new
        input constructs NO batch at all (verified empirically on this
        Spark: two bare restarts after a suppressed no-data batch
        released nothing), so the tick file is what forces a batch; the
        restored watermark then fires every pending timeout inside that
        batch. Zero-row files leave watermarks and data untouched.

    `input_dirs=None` preserves the old single-run behavior for callers
    that manage their own lifecycle.
    """
    import glob
    import os

    def _one_run():
        query = (
            plan.writeStream.format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        return query.recentProgress

    progress = _one_run()
    if not input_dirs:
        return
    if progress and progress[-1]["numInputRows"] == 0:
        return  # trailing no-data batch ran — already drained
    import pyarrow.parquet as pq

    def _rows(files):
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    for _ in range(max_drain_ticks):
        before = set(glob.glob(os.path.join(output_dir, "*.parquet")))
        for d in input_dirs:
            existing = sorted(glob.glob(os.path.join(d, "*.parquet")))
            if not existing:
                continue  # nothing ever flowed from this side
            # NOT underscore-prefixed: Spark's file listing treats `_`/`.`
            # prefixed files as hidden and the source never offsets them
            # (verified: a `__tick` file forces no releasing batch).
            ticks = [
                f for f in existing if os.path.basename(f).startswith("drain-tick-")
            ]
            non_tick = [f for f in existing if f not in ticks]
            schema = pq.read_schema((non_tick or existing)[0])
            pq.write_table(
                schema.empty_table(),
                os.path.join(d, f"drain-tick-{len(ticks)}.parquet"),
            )
        _one_run()
        new = set(glob.glob(os.path.join(output_dir, "*.parquet"))) - before
        if _rows(new) == 0:
            return


def _job_input_dirs(job) -> tuple[str, ...]:
    """Every `*_dir` dataclass field except checkpoint/output is an input
    slice directory — the set the drain loop must tick (see
    `_run_available_now`). Derived by reflection so a new job class is
    drain-correct by construction."""
    from dataclasses import fields

    return tuple(
        getattr(job, f.name)
        for f in fields(job)
        if f.name.endswith("_dir") and f.name not in ("checkpoint_dir", "output_dir")
    )


def _file_stream(spark: SparkSession, input_dir: str, schema: StructType | None) -> DataFrame:
    if schema is None:
        schema = spark.read.parquet(input_dir).schema
    return spark.readStream.schema(schema).parquet(input_dir)


@dataclass
class StreamingIntervalJoin:
    """Stream-to-stream interval join over two growing slice directories —
    the reference's core streaming join (README 'Stream-To-Stream Joins',
    EngineJoinStreamToStreamTest.scala:106-117) in the always-on,
    derived-watermark mode.

    Semantics carried over 1:1:
      - equi key + time range: right.time in [left.time + lower,
        left.time + upper];
      - join buffers persist across invocations in the checkpoint (an
        order from run 1 matches a shipment arriving in run 2 — the
        scenario at EngineJoinStreamToStreamTest.scala:178-226);
      - how='left_outer': the null-padded left row is emitted only once
        both watermarks prove no match can arrive (the reference's
        subtlest timing, :222-225) — Spark enforces exactly this rule for
        outer stream-stream joins.

    Column names across the two inputs must be disjoint (the reference
    scenario uses distinct order_*/shipment_* names); state size is
    bounded by `upper` + the watermark delays.
    """

    left_dir: str
    right_dir: str
    checkpoint_dir: str
    output_dir: str
    left_time: str
    right_time: str
    equi_keys: list[tuple[str, str]] = field(default_factory=list)
    lower: str = "0 seconds"
    upper: str = "2 days"
    watermark_delay_left: str = "1 hour"
    watermark_delay_right: str = "1 hour"
    how: str = "inner"
    left_schema: StructType | None = None
    right_schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        left = _file_stream(spark, self.left_dir, self.left_schema).withWatermark(
            self.left_time, self.watermark_delay_left
        )
        right = _file_stream(spark, self.right_dir, self.right_schema).withWatermark(
            self.right_time, self.watermark_delay_right
        )
        conds = [F.col(lk) == F.col(rk) for lk, rk in self.equi_keys]
        conds.append(
            F.col(self.right_time)
            >= F.col(self.left_time) + F.expr(f"INTERVAL {self.lower}")
        )
        conds.append(
            F.col(self.right_time)
            <= F.col(self.left_time) + F.expr(f"INTERVAL {self.upper}")
        )
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        return left.join(right, cond, self.how)

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


@dataclass
class StreamingRegularJoin:
    """Flink's REGULAR (unbounded) stream equi-join, always-on twin of
    operators/regular_join.py: INNER stream-stream join with NO time
    constraint — Spark keeps both sides' state forever, exactly Flink's
    documented behavior for this operator (outer shapes need retractions
    and are rejected by the micro-batch executor; Spark likewise requires
    watermark time-bounds before allowing outer stream-stream joins)."""

    left_dir: str
    right_dir: str
    checkpoint_dir: str
    output_dir: str
    equi_keys: list[tuple[str, str]] = field(default_factory=list)
    left_schema: StructType | None = None
    right_schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        left = _file_stream(spark, self.left_dir, self.left_schema)
        right = _file_stream(spark, self.right_dir, self.right_schema)
        cond = None
        for lk, rk in self.equi_keys:
            c = F.col(lk) == F.col(rk)
            cond = c if cond is None else (cond & c)
        return left.join(right, cond, "inner")

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


@dataclass
class StreamingWindowJoin:
    """Window TVF join, always-on twin of operators/window_join.py: both
    sides are bucketed into the same window (Spark's window() on each
    watermarked stream — with a slide_duration it is the HOP TVF: one
    row per CONTAINING window instance, exactly the micro-batch
    executor's instance expansion) and joined on window equality + keys.
    The window-struct equality of two watermarked streams is Spark's
    documented state-cleanup pattern for stream-stream joins — a side's
    buffered rows drop once the watermark passes the window end, and the
    join watermark is the MIN over both inputs (Spark's default
    multipleWatermarkPolicy), the Flink two-input watermark rule the
    micro-batch executor implements explicitly. Per-instance emission
    means a row's EARLIER hop windows can close and pair while its later
    ones are still open across runs. State is bounded by the window size
    + watermark delay (vs the regular join's forever-state)."""

    left_dir: str
    right_dir: str
    checkpoint_dir: str
    output_dir: str
    window_duration: str = "10 minutes"
    slide_duration: str | None = None  # None = TUMBLE; set = HOP
    equi_keys: list[tuple[str, str]] = field(default_factory=list)
    left_time_col: str = "event_time"
    right_time_col: str = "event_time"
    watermark_delay: str = "0 seconds"
    left_schema: StructType | None = None
    right_schema: StructType | None = None

    def _side(self, spark: SparkSession, d, schema, tcol, prefix):
        s = _file_stream(spark, d, schema).withWatermark(tcol, self.watermark_delay)
        win = (
            F.window(F.col(tcol), self.window_duration, self.slide_duration)
            if self.slide_duration
            else F.window(F.col(tcol), self.window_duration)
        )
        # The raw time column must NOT pass through: the window struct
        # carries the side's (single allowed) event-time tag.
        return s.select(
            win.alias(f"{prefix}w"),
            *[F.col(c).alias(f"{prefix}{c}") for c in s.columns if c != tcol],
        )

    def _plan(self, spark: SparkSession) -> DataFrame:
        left = self._side(
            spark, self.left_dir, self.left_schema, self.left_time_col, "l_"
        )
        right = self._side(
            spark, self.right_dir, self.right_schema, self.right_time_col, "r_"
        )
        cond = F.col("l_w") == F.col("r_w")
        for lk, rk in self.equi_keys:
            cond = cond & (F.col(f"l_{lk}") == F.col(f"r_{rk}"))
        joined = left.join(right, cond, "inner")
        return joined.select(
            F.col("l_w.start").alias("window_start"),
            *[c for c in joined.columns if c not in ("l_w", "r_w")],
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


@dataclass
class StreamingDedup:
    """Streaming exact dedup: first occurrence per key wins, duplicates
    arriving within the watermark horizon are dropped, state is evicted
    once the watermark passes (bounded state — the 100 TB requirement;
    unbounded dropDuplicates state would OOM an always-on job).

    The batch counterpart is operators/dedup.dedup_exact; this is the
    always-on member of the dedup family (driver north star)."""

    input_dir: str
    checkpoint_dir: str
    output_dir: str
    keys: list[str] = field(default_factory=list)
    event_time_col: str = "event_time"
    watermark_delay: str = "1 hour"
    schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        stream = _file_stream(spark, self.input_dir, self.schema).withWatermark(
            self.event_time_col, self.watermark_delay
        )
        return stream.dropDuplicatesWithinWatermark(self.keys)

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


_ASOF_OUTPUT = StructType(
    [
        StructField("pk", StringType()),
        StructField("probe_ts_ms", LongType()),
        StructField("probe_val", DoubleType()),
        StructField("version_val", DoubleType()),
    ]
)
_ASOF_STATE = StructType(
    [
        StructField("v_ts", ArrayType(LongType())),
        StructField("v_val", ArrayType(DoubleType())),
        StructField("p_ts", ArrayType(LongType())),
        StructField("p_val", ArrayType(DoubleType())),
    ]
)


def _asof_join_fn(how: str):
    """Per-key stateful as-of kernel. A probe row at time t must join the
    LATEST version with ts <= t — and that answer is only final once the
    watermark passes t (no earlier-timestamped version can still arrive).
    So: buffer probes; on every invocation emit the ones the watermark has
    finalized; schedule an event-time timeout at the earliest pending
    probe so the group is re-invoked when the watermark reaches it (the
    no-data micro-batch after each run fires these).

    State is bounded: versions strictly older than the newest
    version <= watermark are pruned — every surviving future probe has
    ts >= watermark, so that newest version shadows all older ones. This
    is the invariant that keeps per-key state O(active horizon), not
    O(history), at 100 TB."""

    def fn(key, pdfs, state):
        import pandas as pd

        wm = state.getCurrentWatermarkMs()
        if state.exists:
            v_ts, v_val, p_ts, p_val = state.get
            versions = list(zip(v_ts, v_val))
            pending = list(zip(p_ts, p_val))
        else:
            versions, pending = [], []
        for pdf in pdfs:
            ts_ms = (pdf["__ts"].astype("int64") // 1_000_000).tolist()
            for kind, t, val in zip(pdf["__kind"].tolist(), ts_ms, pdf["__val"].tolist()):
                if kind == "v":
                    versions.append((t, val))
                else:
                    pending.append((t, val))
        versions.sort()
        out = []
        still_pending = []
        for t, val in sorted(pending):
            if t <= wm:
                vmatch = None
                for vt, vv in versions:
                    if vt <= t:
                        vmatch = vv
                    else:
                        break
                if vmatch is not None or how == "left":
                    out.append((key[0], t, val, vmatch))
            else:
                still_pending.append((t, val))
        # Prune versions shadowed by the newest one at/below the watermark.
        latest_final = None
        for i, (vt, _) in enumerate(versions):
            if vt <= wm:
                latest_final = i
            else:
                break
        if latest_final is not None and latest_final > 0:
            versions = versions[latest_final:]
        state.update(
            (
                [t for t, _ in versions],
                [v for _, v in versions],
                [t for t, _ in still_pending],
                [v for _, v in still_pending],
            )
        )
        if still_pending:
            # Arm at min-1: Spark fires event-time timeouts only STRICTLY
            # beyond the armed timestamp, but the release predicate (and
            # Flink's timer rule the oracles replay) is non-strict
            # t <= wm — arming at t-1 makes the key re-invoke exactly
            # when wm reaches t, so a probe AT the final watermark
            # releases (tie-bearing corpus regression in
            # tests/test_streaming.py). Spark rejects arming BELOW the
            # current watermark but allows equality — the max() clamp is
            # the legal floor and fires on the next advancement.
            state.setTimeoutTimestamp(max(min(t for t, _ in still_pending) - 1, wm))
        if out:
            yield pd.DataFrame(out, columns=["pk", "probe_ts_ms", "probe_val", "version_val"])

    return fn


@dataclass
class StreamingAsOfJoin:
    """Always-on temporal/as-of join — the reference's temporal table join
    (README 'Temporal Table Joins', TransformEngine.scala:163-200) as a
    CUSTOM STATEFUL OPERATOR on applyInPandasWithState, since Structured
    Streaming has no stream-stream as-of join.

    Both inputs are unioned into one keyed stream (version rows tagged
    'v', probe rows 'p'), each side watermarked on its own event time; the
    global watermark is their min, so "watermark passed the probe's time"
    guarantees the version history at that time is complete on BOTH
    sides — the same finality rule Flink's temporal join applies before
    emitting. A probe emitted in run N may therefore have arrived in run
    N-1 (version/probe buffers ride the checkpoint), mirroring the
    cross-invocation scenario in EngineJoinStreamToTemporalTableTest.

    `how`: 'inner' (probe with no version <= t is dropped — Flink
    `LATERAL TABLE` semantics) or 'left' (emitted with NULL version).
    The batch counterpart is operators/temporal_join.py."""

    version_dir: str
    probe_dir: str
    checkpoint_dir: str
    output_dir: str
    pk_col: str = "pk"
    version_time: str = "event_time"
    version_value: str = "value"
    probe_time: str = "event_time"
    probe_value: str = "value"
    watermark_delay: str = "0 seconds"
    how: str = "inner"
    version_schema: StructType | None = None
    probe_schema: StructType | None = None

    def _tagged(self, spark: SparkSession, d: str, schema, kind: str, pk: str, ts: str, val: str) -> DataFrame:
        return (
            _file_stream(spark, d, schema)
            .withWatermark(ts, self.watermark_delay)
            .select(
                F.col(pk).cast("string").alias("__pk"),
                F.lit(kind).alias("__kind"),
                F.col(ts).alias("__ts"),
                F.col(val).cast("double").alias("__val"),
            )
        )

    def _plan(self, spark: SparkSession) -> DataFrame:
        versions = self._tagged(
            spark, self.version_dir, self.version_schema, "v",
            self.pk_col, self.version_time, self.version_value,
        )
        probes = self._tagged(
            spark, self.probe_dir, self.probe_schema, "p",
            self.pk_col, self.probe_time, self.probe_value,
        )
        return versions.unionByName(probes).groupBy("__pk").applyInPandasWithState(
            _asof_join_fn(self.how),
            outputStructType=_ASOF_OUTPUT,
            stateStructType=_ASOF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


_TOPN_OUTPUT = StructType(
    [
        StructField("scope", StringType()),
        StructField("op", IntegerType()),
        StructField("place", LongType()),
        StructField("id", LongType()),
        StructField("score", DoubleType()),
    ]
)
_TOPN_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("scores", ArrayType(DoubleType())),
    ]
)


def _topn_changelog_fn(n: int):
    """Per-scope stateful ranking kernel. State = the current Top-N as
    parallel (ids, scores) arrays; each micro-batch merges its rows into
    the ranking and emits the changelog delta exactly as the reference's
    Flink Top-N does (TopNTest.scala:51-88 golden sequence):

      - a row entering a previously-unoccupied place -> op=0 (+I append);
      - a place whose occupant changed -> op=2 (CorrectFrom, the old row)
        then op=3 (CorrectTo, the new row), ordered by place.

    Total order is (score DESC, id ASC) — the deterministic tiebreak every
    ranking query in this engine pins (SURVEY §7 'Determinism')."""

    def fn(key, pdfs, state):
        import pandas as pd  # local import: runs inside the Arrow worker

        if state.exists:
            ids, scores = state.get
            prev = list(zip(ids, scores))
        else:
            prev = []
        cur = list(prev)
        for pdf in pdfs:
            cur.extend(zip(pdf["__id"].tolist(), pdf["__score"].tolist()))
        cur.sort(key=lambda t: (-t[1], t[0]))
        cur = cur[:n]
        scope = key[0]
        out = []
        for p, new in enumerate(cur):
            old = prev[p] if p < len(prev) else None
            if old is None:
                out.append((scope, 0, p + 1, new[0], new[1]))
            elif old != new:
                out.append((scope, 2, p + 1, old[0], old[1]))
                out.append((scope, 3, p + 1, new[0], new[1]))
        state.update(([i for i, _ in cur], [s for _, s in cur]))
        if out:
            yield pd.DataFrame(out, columns=["scope", "op", "place", "id", "score"])

    return fn


@dataclass
class StreamingTopN:
    """Always-on Top-N with changelog corrections — the reference's
    ranked-state operator (EngineTopNTest.scala:38-49; README 'Top-N')
    as a CUSTOM STATEFUL OPERATOR on applyInPandasWithState, since Spark
    has no retracting rank in Structured Streaming.

    The ranking state rides the stream checkpoint, so a score arriving in
    run 2 corrects places published in run 1 (the savepoint-resume
    scenario at EngineTopNTest.scala:92-128) with op=2/3 pairs, while the
    batch engine's Top-N (engine/transform.py) covers the
    suspend-per-invocation mode.

    Scale shape: `partition_col` scopes each ranking (leaderboard per
    game, top URLs per domain, ...) and the state shards across executors
    by that key — size per key is O(n). A global ranking (partition_col
    None) is a single key and therefore a single task, exactly like the
    reference's parallelism-1 ranking; prefer scoped rankings at scale."""

    input_dir: str
    checkpoint_dir: str
    output_dir: str
    n: int = 3
    id_col: str = "id"
    score_col: str = "score"
    partition_col: str | None = None
    schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        stream = _file_stream(spark, self.input_dir, self.schema)
        scope = (
            F.col(self.partition_col).cast("string")
            if self.partition_col
            else F.lit("__global__")
        )
        rows = stream.select(
            scope.alias("__scope"),
            F.col(self.id_col).cast("long").alias("__id"),
            F.col(self.score_col).cast("double").alias("__score"),
        )
        return rows.groupBy("__scope").applyInPandasWithState(
            _topn_changelog_fn(self.n),
            outputStructType=_TOPN_OUTPUT,
            stateStructType=_TOPN_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


_UAGG_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("op", IntegerType()),
        StructField("n", LongType()),
        StructField("sum_v", DoubleType()),
    ]
)
_UAGG_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("sum_v", DoubleType()),
    ]
)


def _unbounded_agg_fn():
    """Per-key continuous-aggregation kernel: state = the mergeable
    (count, sum) accumulator; a micro-batch touching the key emits op 0
    on first appearance or one CorrectFrom/CorrectTo (op 2/3) pair —
    the reference's ChangelogOperator RowKind mapping, mini-batch
    granularity (the micro-batch IS the mini-batch)."""

    def fn(key, pdfs, state):
        import pandas as pd

        n0, s0 = state.get if state.exists else (None, None)
        dn, ds = 0, 0.0
        for pdf in pdfs:
            if not len(pdf):
                continue
            dn += len(pdf)
            ds += float(pdf["__val"].sum())
        if dn == 0:
            return
        out = []
        if n0 is None:
            n1, s1 = dn, ds
            out.append((key[0], 0, n1, s1))
        else:
            n1, s1 = n0 + dn, s0 + ds
            out.append((key[0], 2, n0, s0))
            out.append((key[0], 3, n1, s1))
        state.update((n1, s1))
        yield pd.DataFrame(out, columns=["key", "op", "n", "sum_v"])

    return fn


@dataclass
class StreamingUnboundedAgg:
    """Always-on CONTINUOUS (windowless) GROUP BY aggregation with the
    op 0/2/3 correction changelog — the data-derived-watermark twin of
    operators/unbounded_agg.py. Structured Streaming's own update-mode
    aggregation UPSERTS without retractions (no -U rows), so the
    changelog contract needs this custom stateful operator; the
    accumulator state rides the stream checkpoint, so a key first
    published in run 1 corrects in run 2 (savepoint-resume parity).

    Scale shape: state shards by the group key across executors,
    O(distinct keys) rows total, each micro-batch touching only its own
    keys — the same contract as the micro-batch executor's touched-keys
    split."""

    input_dir: str
    checkpoint_dir: str
    output_dir: str
    key_col: str = "key"
    value_col: str = "value"
    schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        stream = _file_stream(spark, self.input_dir, self.schema)
        rows = stream.select(
            F.col(self.key_col).cast("string").alias("__key"),
            F.col(self.value_col).cast("double").alias("__val"),
        )
        return rows.groupBy("__key").applyInPandasWithState(
            _unbounded_agg_fn(),
            outputStructType=_UAGG_OUTPUT,
            stateStructType=_UAGG_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


def _norm_val(val):
    """NULL-safe fold key: pandas hands NULL doubles over as NaN, and a
    NaN-keyed dict never cancels (NaN != NaN) — normalize to None so a
    retraction of a NULL value finds its +1."""
    import pandas as pd

    return None if pd.isna(val) else float(val)


_CLJOIN_OUTPUT = StructType(
    [
        StructField("op", IntegerType()),
        StructField("key", StringType()),
        StructField("l_value", DoubleType()),
        StructField("r_value", DoubleType()),
    ]
)
_CLJOIN_STATE = StructType(
    [
        StructField("l_vals", ArrayType(DoubleType())),
        StructField("l_cnts", ArrayType(LongType())),
        StructField("r_vals", ArrayType(DoubleType())),
        StructField("r_cnts", ArrayType(LongType())),
    ]
)


def _changelog_join_fn():
    """Per-key signed-ledger join kernel: state = both sides' live
    multisets as (value, net count) pairs. A micro-batch folds its op
    tags into signed deltas and emits the incremental join delta
      d(L><R) = dL >< R_old  UNION  L_new >< dR
    as op-0 inserts (positive net) / op-1 deletes (negative net) — a
    retract stream at insert/delete granularity (Flink's regular join on
    updating inputs emits the same +I/-D stream when no upsert key is
    available; an upstream op-2/3 pair folds to delete+insert, a valid
    changelog of identical net effect). A negative live multiplicity
    raises — the micro-batch executor's inconsistent-changelog guard."""

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            lv, lc, rv, rc = state.get
            L = {_norm_val(v): c for v, c in zip(lv or [], lc or [])}
            R = {_norm_val(v): c for v, c in zip(rv or [], rc or [])}
        else:
            L, R = {}, {}
        dL, dR = {}, {}
        for pdf in pdfs:
            for side, val, op in zip(pdf["__side"], pdf["__val"], pdf["__op"]):
                sign = -1 if op in (1, 2) else 1
                d = dL if side == 0 else dR
                val = _norm_val(val)
                d[val] = d.get(val, 0) + sign
        if not dL and not dR:
            return
        out = []
        for lval, dn in dL.items():
            if dn == 0:
                continue
            for rval, cnt in R.items():
                net = dn * cnt
                out.extend([(0 if net > 0 else 1, key[0], lval, rval)] * abs(net))
        for lval, dn in dL.items():
            n = L.get(lval, 0) + dn
            if n < 0:
                raise ValueError(
                    "changelog join: left multiplicity went negative — "
                    "inconsistent changelog"
                )
            if n == 0:
                L.pop(lval, None)
            else:
                L[lval] = n
        for rval, dn in dR.items():
            if dn == 0:
                continue
            for lval, cnt in L.items():
                net = dn * cnt
                out.extend([(0 if net > 0 else 1, key[0], lval, rval)] * abs(net))
        for rval, dn in dR.items():
            n = R.get(rval, 0) + dn
            if n < 0:
                raise ValueError(
                    "changelog join: right multiplicity went negative — "
                    "inconsistent changelog"
                )
            if n == 0:
                R.pop(rval, None)
            else:
                R[rval] = n
        state.update(
            (list(L.keys()), list(L.values()), list(R.keys()), list(R.values()))
        )
        if out:
            yield pd.DataFrame(out, columns=["op", "key", "l_value", "r_value"])

    return fn


@dataclass
class StreamingChangelogJoin:
    """Always-on retraction-aware regular equi-join — the streaming twin
    of operators/changelog_join.py 's signed-ledger executor. Both inputs
    are CHANGELOGS (op-tagged rows: 0 append, 1 retract, 2/3 correction
    pair); the join emits the incremental delta of L >< R as an op-0/op-1
    retract stream, with both sides' live multisets riding the stream
    checkpoint so a run-1 row retracted in run 2 retracts its joined
    pairs (savepoint-resume parity).

    Scale shape: state shards by the join key across executors; a
    micro-batch touches only its own keys' ledgers — the same
    touched-keys contract as the micro-batch executor's bucketed state.
    """

    left_dir: str
    right_dir: str
    checkpoint_dir: str
    output_dir: str
    key_col: str = "key"
    value_col: str = "value"
    op_col: str = "op"
    left_schema: StructType | None = None
    right_schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        def side(input_dir, schema, tag):
            return _file_stream(spark, input_dir, schema).select(
                F.lit(tag).cast("int").alias("__side"),
                F.col(self.key_col).cast("string").alias("__key"),
                F.col(self.value_col).cast("double").alias("__val"),
                F.col(self.op_col).cast("int").alias("__op"),
            )

        rows = side(self.left_dir, self.left_schema, 0).unionByName(
            side(self.right_dir, self.right_schema, 1)
        )
        return rows.groupBy("__key").applyInPandasWithState(
            _changelog_join_fn(),
            outputStructType=_CLJOIN_OUTPUT,
            stateStructType=_CLJOIN_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


_CLDIST_OUTPUT = StructType(
    [
        StructField("op", IntegerType()),
        StructField("key", StringType()),
        StructField("value", DoubleType()),
    ]
)
_CLDIST_STATE = StructType(
    [
        StructField("vals", ArrayType(DoubleType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)


def _changelog_distinct_fn():
    """Per-key DISTINCT kernel over a changelog input: state = the
    per-value net counts (Flink's retraction-aware distinct). A value
    emits op 0 when its count rises from zero, op 1 when it falls back to
    zero, and NOTHING while moving between positive counts; a negative
    count raises (inconsistent changelog)."""

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            vs, cs = state.get
            C = {_norm_val(v): c for v, c in zip(vs or [], cs or [])}
        else:
            C = {}
        delta = {}
        for pdf in pdfs:
            for val, op in zip(pdf["__val"], pdf["__op"]):
                val = _norm_val(val)
                delta[val] = delta.get(val, 0) + (-1 if op in (1, 2) else 1)
        if not delta:
            return
        out = []
        for val, dn in delta.items():
            if dn == 0:
                continue
            old = C.get(val, 0)
            new = old + dn
            if new < 0:
                raise ValueError(
                    "changelog DISTINCT: a value count went negative — "
                    "inconsistent changelog"
                )
            if old == 0 and new > 0:
                out.append((0, key[0], val))
            elif old > 0 and new == 0:
                out.append((1, key[0], val))
            if new == 0:
                C.pop(val, None)
            else:
                C[val] = new
        state.update((list(C.keys()), list(C.values())))
        if out:
            yield pd.DataFrame(out, columns=["op", "key", "value"])

    return fn


@dataclass
class StreamingChangelogDistinct:
    """Always-on retraction-aware SELECT DISTINCT — the streaming twin of
    operators/distinct_step.py 's changelog path: per-value counts ride
    the stream checkpoint, so a value published in run 1 leaves the
    distinct view (op 1) when the last row carrying it retracts in a
    later run. State shards by the key column across executors — the
    same per-fingerprint count contract as the micro-batch executor."""

    input_dir: str
    checkpoint_dir: str
    output_dir: str
    key_col: str = "key"
    value_col: str = "value"
    op_col: str = "op"
    schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        rows = _file_stream(spark, self.input_dir, self.schema).select(
            F.col(self.key_col).cast("string").alias("__key"),
            F.col(self.value_col).cast("double").alias("__val"),
            F.col(self.op_col).cast("int").alias("__op"),
        )
        return rows.groupBy("__key").applyInPandasWithState(
            _changelog_distinct_fn(),
            outputStructType=_CLDIST_OUTPUT,
            stateStructType=_CLDIST_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


_CLTOPN_OUTPUT = StructType(
    [
        StructField("op", IntegerType()),
        StructField("key", StringType()),
        StructField("place", LongType()),
        StructField("value", DoubleType()),
    ]
)
_CLTOPN_STATE = StructType(
    [
        StructField("vals", ArrayType(DoubleType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)


# Sentinel distinguishing "no row at this place" from a NULL-valued row
# occupying a place in the visible top-N (None is a real value there).
_ABSENT = object()


def _changelog_topn_fn(n: int):
    """Per-key retractable-rank kernel (Flink RetractableTopNFunction,
    streaming form): state = the FULL live value multiset as (value, net
    count) pairs — a retraction of the leader must promote from beyond
    the visible top-N, which only full state can answer. Each micro-batch
    folds its op tags, re-ranks, and emits the per-place diff: op 0 where
    a place appears, op 1 where it disappears, an op-2/op-3
    CorrectFrom/CorrectTo pair (adjacent, in order) where its value
    changed. Negative multiplicities raise — the micro-batch executor's
    inconsistent-changelog guard."""

    def top(C):
        out = []
        # NULL sorts last under DESC (Spark's desc_nulls_last default).
        for v in sorted(C, key=lambda v: (v is None, -(v or 0.0))):
            out.extend([v] * C[v])
            if len(out) >= n:
                break
        return out[:n]

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            vs, cs = state.get
            C = {_norm_val(v): c for v, c in zip(vs or [], cs or [])}
        else:
            C = {}
        delta = {}
        for pdf in pdfs:
            for val, op in zip(pdf["__val"], pdf["__op"]):
                val = _norm_val(val)
                delta[val] = delta.get(val, 0) + (-1 if op in (1, 2) else 1)
        if not delta:
            return
        old = top(C)
        for val, dn in delta.items():
            m = C.get(val, 0) + dn
            if m < 0:
                raise ValueError(
                    "changelog Top-N: a value multiplicity went negative — "
                    "inconsistent changelog"
                )
            if m == 0:
                C.pop(val, None)
            else:
                C[val] = m
        new = top(C)
        out = []
        for place in range(max(len(old), len(new))):
            # _ABSENT (not None) marks a place beyond the list: top()
            # deliberately admits NULL values (sorted last), so None is a
            # legitimate occupant of a place and must diff as a value —
            # a retracted NULL-valued place emits op-1 (or an op-2/3 pair
            # when replaced), never a bare op-0 insert.
            o = old[place] if place < len(old) else _ABSENT
            nv = new[place] if place < len(new) else _ABSENT
            if o is _ABSENT:
                out.append((0, key[0], place + 1, nv))
            elif nv is _ABSENT:
                out.append((1, key[0], place + 1, o))
            elif o != nv:
                out.append((2, key[0], place + 1, o))
                out.append((3, key[0], place + 1, nv))
        state.update((list(C.keys()), list(C.values())))
        if out:
            yield pd.DataFrame(out, columns=["op", "key", "place", "value"])

    return fn


@dataclass
class StreamingChangelogTopN:
    """Always-on retractable Top-N over a CHANGELOG input — the streaming
    twin of operators/changelog_topn.py: the rank operator when its input
    is itself updating (the 'top products by live sales count' pattern).
    The live multiset rides the stream checkpoint, so a run-1 leader
    retracted in run 2 promotes the runner-up that was never visible in
    the emitted top-N (per-key state; use a constant key column for the
    global form)."""

    input_dir: str
    checkpoint_dir: str
    output_dir: str
    n: int = 3
    key_col: str = "key"
    value_col: str = "value"
    op_col: str = "op"
    schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        rows = _file_stream(spark, self.input_dir, self.schema).select(
            F.col(self.key_col).cast("string").alias("__key"),
            F.col(self.value_col).cast("double").alias("__val"),
            F.col(self.op_col).cast("int").alias("__op"),
        )
        return rows.groupBy("__key").applyInPandasWithState(
            _changelog_topn_fn(self.n),
            outputStructType=_CLTOPN_OUTPUT,
            stateStructType=_CLTOPN_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


_CLASOF_OUTPUT = StructType(
    [
        StructField("pk", StringType()),
        StructField("probe_ts_ms", LongType()),
        StructField("probe_val", DoubleType()),
        StructField("version_val", DoubleType()),
    ]
)
_CLASOF_STATE = StructType(
    [
        StructField("v_ts", ArrayType(LongType())),
        StructField("v_seq", ArrayType(LongType())),
        StructField("v_tomb", ArrayType(IntegerType())),
        StructField("v_val", ArrayType(DoubleType())),
        StructField("p_ts", ArrayType(LongType())),
        StructField("p_val", ArrayType(DoubleType())),
        StructField("used_wm", LongType()),
        StructField("next_seq", LongType()),
    ]
)


def _changelog_asof_fn(how: str):
    """Per-key as-of kernel over a CHANGELOG-maintained versioned view —
    the streaming twin of operators/temporal_join.
    execute_changelog_temporal_join's build-updating path. Version rows
    arrive as op tags: op-0/op-3 create a version at their event time,
    op-1 a TOMBSTONE (the key is dead from that time on), op-2 is pair
    bookkeeping and skipped. Ties within one event time break by arrival
    order (a per-key monotone seq rides the state). A version arriving at
    or before the watermark already used for emissions is LATE and drops
    (it could contradict emitted probes — Flink's late changelog
    handling); probes buffer until the watermark passes their time, then
    resolve the latest LIVE version, landing in a tombstone interval
    matches nothing (inner drops, left pads NULL).

    State is bounded like the append-only kernel: versions strictly older
    than the newest one at/below the used watermark are pruned — the
    survivor (tombstone included, so a dead key stays dead) shadows all
    older ones for every future probe."""

    def fn(key, pdfs, state):
        import pandas as pd

        wm = state.getCurrentWatermarkMs()
        if state.exists:
            v_ts, v_seq, v_tomb, v_val, p_ts, p_val, used_wm, next_seq = state.get
            versions = list(zip(v_ts, v_seq, v_tomb, v_val))
            pending = list(zip(p_ts, p_val))
            used_wm = used_wm or 0
            next_seq = next_seq or 0
        else:
            versions, pending, used_wm, next_seq = [], [], 0, 0
        for pdf in pdfs:
            ts_ms = (pdf["__ts"].astype("int64") // 1_000_000).tolist()
            ops = pdf["__op"].tolist()
            kinds = pdf["__kind"].tolist()
            vals = pdf["__val"].tolist()
            for kind, op, t, val in zip(kinds, ops, ts_ms, vals):
                if kind == "p":
                    pending.append((t, val))
                    continue
                if op == 2:
                    continue
                if t <= used_wm:
                    # Late version: contradicts already-emitted probes.
                    continue
                versions.append((t, next_seq, 1 if op == 1 else 0, val))
                next_seq += 1
        versions.sort(key=lambda v: (v[0], v[1]))
        out = []
        still_pending = []
        for t, val in sorted(pending):
            if t <= wm:
                vmatch, dead = None, True
                for vt, _, tomb, vv in versions:
                    if vt <= t:
                        vmatch, dead = vv, bool(tomb)
                    else:
                        break
                if dead:
                    vmatch = None
                if vmatch is not None or how == "left":
                    out.append((key[0], t, val, vmatch))
            else:
                still_pending.append((t, val))
        # The watermark was USED: every probe at/below it was decided
        # (emitted or inner-dropped) this invocation — like the batch
        # twin, which persists the joint watermark every invocation, a
        # version at/below it is late from now on even when nothing
        # released.
        used_wm = max(used_wm, wm)
        # Prune versions shadowed by the newest one at/below the used
        # watermark — kept even if a tombstone (dead stays dead).
        latest_final = None
        for i, (vt, _, _, _) in enumerate(versions):
            if vt <= used_wm:
                latest_final = i
            else:
                break
        if latest_final is not None and latest_final > 0:
            versions = versions[latest_final:]
        state.update(
            (
                [v[0] for v in versions],
                [v[1] for v in versions],
                [v[2] for v in versions],
                [v[3] for v in versions],
                [t for t, _ in still_pending],
                [v for _, v in still_pending],
                used_wm,
                next_seq,
            )
        )
        if still_pending:
            # Arm at min-1: Spark fires event-time timeouts only STRICTLY
            # beyond the armed timestamp, but the release predicate (and
            # Flink's timer rule the oracles replay) is non-strict
            # t <= wm — arming at t-1 makes the key re-invoke exactly
            # when wm reaches t, so a probe AT the final watermark
            # releases (tie-bearing corpus regression in
            # tests/test_streaming.py). Spark rejects arming BELOW the
            # current watermark but allows equality — the max() clamp is
            # the legal floor and fires on the next advancement.
            state.setTimeoutTimestamp(max(min(t for t, _ in still_pending) - 1, wm))
        if out:
            yield pd.DataFrame(
                out, columns=["pk", "probe_ts_ms", "probe_val", "version_val"]
            )

    return fn


@dataclass
class StreamingChangelogAsOfJoin:
    """Always-on temporal (as-of) join whose versioned view is maintained
    by a CHANGELOG — the streaming twin of operators/temporal_join.
    execute_changelog_temporal_join (Flink's event-time temporal join
    against an updating build side, reference surface via planner
    delegation, TransformEngine.scala:252-262).

    The version changelog (with an op column) and the append-only probe
    stream union into one keyed stream, each watermarked on its own event
    time; the global watermark is their min, so a released probe's
    version history is final on both sides. Version/probe buffers and the
    used-watermark ride the stream checkpoint, so a run-1 version
    tombstoned in run 2 stops matching run-2 probes while already-emitted
    run-1 rows stand (late versions drop)."""

    version_dir: str
    probe_dir: str
    checkpoint_dir: str
    output_dir: str
    pk_col: str = "pk"
    version_time: str = "event_time"
    version_value: str = "value"
    version_op: str = "op"
    probe_time: str = "event_time"
    probe_value: str = "value"
    watermark_delay: str = "0 seconds"
    how: str = "inner"
    version_schema: StructType | None = None
    probe_schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        versions = (
            _file_stream(spark, self.version_dir, self.version_schema)
            .withWatermark(self.version_time, self.watermark_delay)
            .select(
                F.col(self.pk_col).cast("string").alias("__pk"),
                F.lit("v").alias("__kind"),
                F.col(self.version_op).cast("int").alias("__op"),
                F.col(self.version_time).alias("__ts"),
                F.col(self.version_value).cast("double").alias("__val"),
            )
        )
        probes = (
            _file_stream(spark, self.probe_dir, self.probe_schema)
            .withWatermark(self.probe_time, self.watermark_delay)
            .select(
                F.col(self.pk_col).cast("string").alias("__pk"),
                F.lit("p").alias("__kind"),
                F.lit(0).cast("int").alias("__op"),
                F.col(self.probe_time).alias("__ts"),
                F.col(self.probe_value).cast("double").alias("__val"),
            )
        )
        return versions.unionByName(probes).groupBy("__pk").applyInPandasWithState(
            _changelog_asof_fn(self.how),
            outputStructType=_CLASOF_OUTPUT,
            stateStructType=_CLASOF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


_CLPASOF_OUTPUT = StructType(
    [
        StructField("op", IntegerType()),
        StructField("pk", StringType()),
        StructField("probe_ts_ms", LongType()),
        StructField("probe_val", DoubleType()),
        StructField("version_val", DoubleType()),
    ]
)
_CLPASOF_STATE = StructType(
    [
        StructField("v_ts", ArrayType(LongType())),
        StructField("v_val", ArrayType(DoubleType())),
        StructField("p_seq", ArrayType(LongType())),
        StructField("p_ts", ArrayType(LongType())),
        StructField("p_val", ArrayType(DoubleType())),
        StructField("p_op", ArrayType(IntegerType())),
    ]
)


def _changelog_probe_asof_fn(how: str):
    """Per-key as-of kernel whose PROBE side is a CHANGELOG — the
    streaming twin of operators/temporal_join._execute_updating_probe.
    Probe rows buffer as (seq, ts, val, op) until the watermark passes
    their event time, then resolve the latest version at their OWN time
    and forward their op tag; a dangling correction half (partner seq
    +-1 unreleased, released earlier, or dropped by the inner join)
    repairs to the equivalent single op (op-2 alone -> op-1, op-3 alone
    -> op-0). Resolution is deterministic over frozen history (the
    version side is append-only under the watermark contract), so the
    repair composes across micro-batches. Version pruning keeps the
    newest version at/below the watermark — every surviving probe is
    later, so it shadows all older ones."""

    def fn(key, pdfs, state):
        import pandas as pd

        wm = state.getCurrentWatermarkMs()
        if state.exists:
            v_ts, v_val, p_seq, p_ts, p_val, p_op = state.get
            versions = list(zip(v_ts, v_val))
            pending = list(zip(p_seq, p_ts, p_val, p_op))
        else:
            versions, pending = [], []
        for pdf in pdfs:
            ts_ms = (pdf["__ts"].astype("int64") // 1_000_000).tolist()
            for kind, seq, t, val, op in zip(
                pdf["__kind"].tolist(), pdf["__seq"].tolist(), ts_ms,
                pdf["__val"].tolist(), pdf["__op"].tolist(),
            ):
                if kind == "v":
                    versions.append((t, val))
                else:
                    pending.append((int(seq), t, val, int(op)))
        versions.sort()
        resolved = {}
        still_pending = []
        for seq, t, val, op in sorted(pending):
            if t > wm:
                still_pending.append((seq, t, val, op))
                continue
            vmatch = None
            for vt, vv in versions:
                if vt <= t:
                    vmatch = vv
                else:
                    break
            if vmatch is not None or how == "left":
                resolved[seq] = (op, t, val, vmatch)
        out = []
        for seq in sorted(resolved):
            op, t, val, vm = resolved[seq]
            if op == 2 and (seq + 1) not in resolved:
                op = 1
            elif op == 3 and (seq - 1) not in resolved:
                op = 0
            out.append((op, key[0], t, val, vm))
        latest_final = None
        for i, (vt, _) in enumerate(versions):
            if vt <= wm:
                latest_final = i
            else:
                break
        if latest_final is not None and latest_final > 0:
            versions = versions[latest_final:]
        state.update(
            (
                [t for t, _ in versions],
                [v for _, v in versions],
                [p[0] for p in still_pending],
                [p[1] for p in still_pending],
                [p[2] for p in still_pending],
                [p[3] for p in still_pending],
            )
        )
        if still_pending:
            # min-1: non-strict release at t <= wm (see the as-of kernel).
            state.setTimeoutTimestamp(max(min(p[1] for p in still_pending) - 1, wm))
        if out:
            yield pd.DataFrame(
                out,
                columns=["op", "pk", "probe_ts_ms", "probe_val", "version_val"],
            )

    return fn


@dataclass
class StreamingChangelogProbeAsOfJoin:
    """Always-on temporal (as-of) join over an UPDATING PROBE — the
    streaming twin of the batch executor's probe-changelog path (Flink's
    event-time temporal join accepts an updating left table; reference
    surface via planner delegation, TransformEngine.scala:252-262).

    The probe changelog carries op tags and an explicit ledger seq (the
    changelog offset), which preserves op-2/op-3 pair adjacency through
    the shuffle; the version stream is append-only. Both union into one
    keyed stream watermarked on their own event times, so a released
    probe's history is final; probe buffers ride the stream checkpoint
    across runs."""

    version_dir: str
    probe_dir: str
    checkpoint_dir: str
    output_dir: str
    pk_col: str = "pk"
    version_time: str = "event_time"
    version_value: str = "value"
    probe_time: str = "event_time"
    probe_value: str = "value"
    probe_op: str = "op"
    probe_seq: str = "seq"
    watermark_delay: str = "0 seconds"
    how: str = "inner"
    version_schema: StructType | None = None
    probe_schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        versions = (
            _file_stream(spark, self.version_dir, self.version_schema)
            .withWatermark(self.version_time, self.watermark_delay)
            .select(
                F.col(self.pk_col).cast("string").alias("__pk"),
                F.lit("v").alias("__kind"),
                F.lit(0).cast("long").alias("__seq"),
                F.lit(0).cast("int").alias("__op"),
                F.col(self.version_time).alias("__ts"),
                F.col(self.version_value).cast("double").alias("__val"),
            )
        )
        probes = (
            _file_stream(spark, self.probe_dir, self.probe_schema)
            .withWatermark(self.probe_time, self.watermark_delay)
            .select(
                F.col(self.pk_col).cast("string").alias("__pk"),
                F.lit("p").alias("__kind"),
                F.col(self.probe_seq).cast("long").alias("__seq"),
                F.col(self.probe_op).cast("int").alias("__op"),
                F.col(self.probe_time).alias("__ts"),
                F.col(self.probe_value).cast("double").alias("__val"),
            )
        )
        return versions.unionByName(probes).groupBy("__pk").applyInPandasWithState(
            _changelog_probe_asof_fn(self.how),
            outputStructType=_CLPASOF_OUTPUT,
            stateStructType=_CLPASOF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


_OVER_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", LongType()),  # event time, epoch micros
        StructField("value", DoubleType()),
        StructField("roll_sum", DoubleType()),
        StructField("roll_cnt", LongType()),
    ]
)
_OVER_STATE = StructType(
    [
        StructField("ts_us", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
        StructField("emitted_upto_us", LongType()),
    ]
)


def _over_agg_fn(h_us: int):
    """Per-key rolling-frame kernel (row-time Over Aggregation,
    operators/over_agg.py's always-on twin). State = rows inside the frame
    horizon as parallel (ts, value) arrays plus the emission high-water
    mark; each micro-batch emits rows the stream watermark has finalized,
    aggregating the backward RANGE frame [ts - h, ts], then evicts rows
    no future row's frame can reach (ts < wm - h)."""

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            ts_l, val_l, emitted_upto = state.get
            rows = sorted(zip(ts_l, val_l))
        else:
            rows, emitted_upto = [], None
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_us = (pdf["__ts"].astype("int64") // 1000).tolist()
            for t, v in zip(ts_us, pdf["__val"].tolist()):
                if emitted_upto is None or t > emitted_upto:
                    rows.append((t, float(v)))
        rows.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        out = []
        # Two-pointer sliding frame over the sorted rows: lo trails the
        # frame start, the running sum/count update in O(1) per row.
        lo = 0
        run_sum = 0.0
        run_cnt = 0
        for hi, (t, v) in enumerate(rows):
            run_sum += v
            run_cnt += 1
            while rows[lo][0] < t - h_us:
                run_sum -= rows[lo][1]
                run_cnt -= 1
                lo += 1
            if t > wm_us:
                break
            if emitted_upto is not None and t <= emitted_upto:
                continue
            # RANGE semantics: equal-timestamp PEERS sorted after this row
            # are inside its frame too.
            peer_sum, peer_cnt, hp = run_sum, run_cnt, hi
            while hp + 1 < len(rows) and rows[hp + 1][0] == t:
                hp += 1
                peer_sum += rows[hp][1]
                peer_cnt += 1
            out.append((key[0], t, v, peer_sum, peer_cnt))
        emitted_upto = max(emitted_upto or 0, wm_us) if rows else emitted_upto
        keep = [(t, v) for t, v in rows if t >= wm_us - h_us]
        state.update(
            ([t for t, _ in keep], [v for _, v in keep], emitted_upto)
        )
        pending = [t for t, _ in keep if t > wm_us]
        if pending:
            # Re-invoke this key when the watermark REACHES the earliest
            # pending row (non-strict): Spark timeouts fire strictly
            # beyond the armed ms, so arm at floor(t_us/1000)-1 — fires
            # whenever wm_us >= t_us, incl. a row exactly at the final
            # watermark. Spark rejects arming below the current watermark
            # (equality is legal) — clamp to it.
            state.setTimeoutTimestamp(max(min(pending) // 1000 - 1, wm_us // 1000))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "ts", "value", "roll_sum", "roll_cnt"]
            )

    return fn


@dataclass
class StreamingOverAgg:
    """Always-on row-time OVER aggregation (rolling backward RANGE frame
    per key) as a CUSTOM STATEFUL OPERATOR on applyInPandasWithState —
    Structured Streaming has no per-row streaming window aggregation.
    The micro-batch engine's operators/over_agg.py covers the explicit-
    watermark ODF mode; this is the data-derived-watermark deployment.

    Scale shape: state shards by key and holds only the frame horizon
    (wm - h, ...] per key; emission is monotone in the watermark, so each
    row emits exactly once across restarts via the stream checkpoint."""

    input_dir: str
    checkpoint_dir: str
    output_dir: str
    frame: str = "2 hours"
    event_time_col: str = "event_time"
    value_col: str = "value"
    partition_col: str | None = None
    watermark_delay: str = "1 minute"
    schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        n, unit = self.frame.split()
        secs = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
        h_us = int(n) * secs * 1_000_000
        stream = _file_stream(spark, self.input_dir, self.schema)
        scope = (
            F.col(self.partition_col).cast("string")
            if self.partition_col
            else F.lit("__global__")
        )
        rows = stream.withWatermark(self.event_time_col, self.watermark_delay).select(
            scope.alias("__scope"),
            F.col(self.event_time_col).alias("__ts"),
            F.col(self.value_col).cast("double").alias("__val"),
        )
        out = rows.groupBy("__scope").applyInPandasWithState(
            _over_agg_fn(h_us),
            outputStructType=_OVER_OUTPUT,
            stateStructType=_OVER_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        return out.select(
            "key",
            F.timestamp_micros(F.col("ts")).alias(self.event_time_col),
            "value",
            "roll_sum",
            "roll_cnt",
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


_CEP_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("start_ts", LongType()),  # epoch micros
        StructField("end_ts", LongType()),
        StructField("n_rows", LongType()),
    ]
)
_CEP_STATE = StructType(
    [
        StructField("ts_us", ArrayType(LongType())),
        StructField("seqs", ArrayType(LongType())),
        StructField("masks", ArrayType(LongType())),  # bit i = pred of var i
        StructField("next_seq", LongType()),
        StructField("wm_floor_us", LongType()),  # lateness floor
    ]
)


def _cep_fn(elements, within_us):
    """Per-key online CEP kernel reusing the micro-batch engine's exact
    matcher (operators/match_recognize.try_match): greedy/reluctant
    preference order, boundary suspension, WITHIN-bounded attempts.
    State = the suffix of rows still in play (ts, arrival seq, predicate
    bitmask); AFTER MATCH SKIP PAST LAST ROW."""
    var_order = list(dict.fromkeys(v for vars_, _q, _g in elements for v in vars_))

    def fn(key, pdfs, state):
        import pandas as pd

        from kamu_engine_flink_spark.operators.match_recognize import try_match

        if state.exists:
            ts_l, seq_l, mask_l, next_seq, wm_floor = state.get
            rows = list(zip(ts_l, seq_l, mask_l))
        else:
            rows, next_seq, wm_floor = [], 0, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_us = (pdf["__ts"].astype("int64") // 1000).tolist()
            masks = [0] * len(pdf)
            for bit, var in enumerate(var_order):
                col = pdf[f"__p_{var}"].fillna(False).tolist()
                for i, v in enumerate(col):
                    if v:
                        masks[i] |= 1 << bit
            for t, mk in zip(ts_us, masks):
                if wm_floor is not None and t <= wm_floor:
                    continue  # late: the region below the floor already ran
                rows.append((t, next_seq, mk))
                next_seq += 1
        rows.sort(key=lambda r: (r[0], r[1]))
        wm_us = state.getCurrentWatermarkMs() * 1000
        n = len(rows)
        n_proc = sum(1 for t, _s, _m in rows if t <= wm_us)
        preds = {
            var: [bool(m & (1 << bit)) for _t, _s, m in rows]
            for bit, var in enumerate(var_order)
        }
        att = {"n": n_proc, "final": False}
        out = []
        start = 0
        pending_from = None
        while start < n_proc:
            if within_us is not None:
                wlimit = rows[start][0] + within_us
                k = start
                while k < n_proc and rows[k][0] <= wlimit:
                    k += 1
                att["n"] = k
                att["final"] = wm_us >= wlimit
            r = try_match(preds, elements, att, start, 0, [])
            if r is None:
                start += 1
                continue
            if r[0] == "pending":
                pending_from = start
                break
            _, end_i, _pairs = r
            out.append((key[0], rows[start][0], rows[end_i - 1][0], end_i - start))
            start = end_i
        boundary = pending_from if pending_from is not None else n_proc
        keep = rows[boundary:]
        state.update(
            (
                [t for t, _s, _m in keep],
                [s for _t, s, _m in keep],
                [m for _t, _s, m in keep],
                next_seq,
                max(wm_floor or 0, wm_us),
            )
        )
        if keep:
            # Wake the key when the watermark REACHES the suspended
            # suffix (non-strict; arm ms-1 — see the over-agg kernel).
            min_ms = min(t for t, _s, _m in keep) // 1000
            state.setTimeoutTimestamp(max(min_ms - 1, wm_us // 1000))
        if out:
            yield pd.DataFrame(out, columns=["key", "start_ts", "end_ts", "n_rows"])

    return fn


@dataclass
class StreamingMatchRecognize:
    """Always-on CEP (MATCH_RECOGNIZE core) as a CUSTOM STATEFUL OPERATOR
    on applyInPandasWithState — the data-derived-watermark twin of the
    micro-batch executor (operators/match_recognize.py), sharing its
    matcher. DEFINE predicates are SQL expressions compiled to JVM
    boolean columns before the state fn; pattern quantifiers and WITHIN
    behave identically. Emits one row per match: key, start/end rowtime,
    matched-row count.

    Scale shape: state shards by key and holds only the suffix from the
    earliest suspended attempt (bounded by WITHIN when given)."""

    input_dir: str
    checkpoint_dir: str
    output_dir: str
    pattern: str = "A B* C"
    defines: dict = field(default_factory=dict)  # var -> SQL predicate
    within: str | None = None  # e.g. "2 minutes"
    event_time_col: str = "event_time"
    partition_col: str | None = None
    watermark_delay: str = "1 minute"
    schema: StructType | None = None

    def _elements(self):
        from kamu_engine_flink_spark.operators.match_recognize import (
            _parse_pattern,
        )

        return _parse_pattern(self.pattern)

    def _plan(self, spark: SparkSession) -> DataFrame:
        elements = self._elements()
        within_us = None
        if self.within:
            n, unit = self.within.split()
            secs = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                    "hour": 3600, "hours": 3600}[unit]
            within_us = int(n) * secs * 1_000_000
        stream = _file_stream(spark, self.input_dir, self.schema)
        scope = (
            F.col(self.partition_col).cast("string")
            if self.partition_col
            else F.lit("__global__")
        )
        cols = [
            scope.alias("__scope"),
            F.col(self.event_time_col).alias("__ts"),
        ]
        for var in dict.fromkeys(v for vars_, _q, _g in elements for v in vars_):
            pred = self.defines.get(var)
            cols.append(
                (F.coalesce(F.expr(pred), F.lit(False)) if pred else F.lit(True))
                .alias(f"__p_{var}")
            )
        rows = stream.withWatermark(self.event_time_col, self.watermark_delay).select(
            *cols
        )
        out = rows.groupBy("__scope").applyInPandasWithState(
            _cep_fn(elements, within_us),
            outputStructType=_CEP_OUTPUT,
            stateStructType=_CEP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        return out.select(
            "key",
            F.timestamp_micros(F.col("start_ts")).alias("start_time"),
            F.timestamp_micros(F.col("end_ts")).alias("end_time"),
            "n_rows",
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


_SETOP_OUTPUT = StructType(
    [
        StructField("op", IntegerType()),
        StructField("value", DoubleType()),
    ]
)
_SETOP_STATE = StructType(
    [
        StructField("cnt_l", LongType()),
        StructField("cnt_r", LongType()),
    ]
)


def _setop_fn(op: str, all_flag: bool):
    """Per-value set-operation kernel — the streaming twin of
    operators/setop_step.py: state is the value's per-branch NET arrival
    counts; live multiplicity is the same pure function of the counts
    (UNION: any>0, INTERSECT [ALL]: min, EXCEPT [ALL]: left minus right,
    clamped), and each micro-batch emits the live-multiplicity delta as
    op-0 inserts / op-1 retractions. Append-only inputs contribute +1
    per row; CHANGELOG inputs (rows carrying an op column) contribute
    signed counts (+1 op 0/3, -1 op 1/2 — the batch executor's updating
    branches), with a loud negative-count guard."""
    op = "EXCEPT" if op == "MINUS" else op
    if op not in ("UNION", "INTERSECT", "EXCEPT"):
        raise ValueError(f"unknown set operator {op!r}")
    if op == "UNION" and all_flag:
        # UNION ALL is stateless pass-through — it has no business in
        # this per-value count kernel, and silently computing UNION
        # DISTINCT for it would be a wrong answer.
        raise ValueError(
            "UNION ALL is stateless: union the streams directly instead "
            "of routing through the stateful set-operation kernel"
        )

    def live(l: int, r: int) -> int:
        if op == "UNION":
            return 1 if (l + r) > 0 else 0
        if op == "INTERSECT":
            m = min(l, r)
            return m if all_flag else (1 if m > 0 else 0)
        diff = l - r
        if all_flag:
            return max(0, diff)
        return 1 if (l > 0 and r == 0) else 0

    def fn(key, pdfs, state):
        import pandas as pd

        cl, cr = state.get if state.exists else (0, 0)
        dl = dr = 0
        for pdf in pdfs:
            for side, rop in zip(pdf["__side"], pdf["__op"]):
                sign = -1 if rop in (1, 2) else 1
                if side == 0:
                    dl += sign
                else:
                    dr += sign
        if dl == 0 and dr == 0:
            return
        old = live(cl, cr)
        cl, cr = cl + dl, cr + dr
        if cl < 0 or cr < 0:
            raise ValueError(
                "set operation over changelog: a branch count went "
                "negative (retraction of a row never inserted)"
            )
        new = live(cl, cr)
        state.update((cl, cr))
        if new != old:
            opv, n = (0, new - old) if new > old else (1, old - new)
            yield pd.DataFrame({"op": [opv] * n, "value": [key[0]] * n})

    return fn


@dataclass
class StreamingSetOp:
    """Always-on streaming set operation (UNION / INTERSECT [ALL] /
    EXCEPT [ALL]) over two append-only file streams — the streaming twin
    of operators/setop_step.py. Per-value branch counts ride the stream
    checkpoint, so a left value published in run 1 retracts (op 1) when
    its right twin arrives in a later run under EXCEPT, and pairs under
    INTERSECT. State shards by value across executors; a micro-batch
    touches only its own values' counts — the same touched-keys contract
    as the micro-batch executor's bucketed fingerprint state."""

    left_dir: str
    right_dir: str
    checkpoint_dir: str
    output_dir: str
    op: str = "EXCEPT"
    all_flag: bool = False
    value_col: str = "value"
    op_col: str = "op"
    left_schema: StructType | None = None
    right_schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        def side(input_dir, schema, tag):
            stream = _file_stream(spark, input_dir, schema)
            # A side whose rows carry the op column is a CHANGELOG input
            # and contributes signed counts; append-only sides insert.
            rop = (
                F.col(self.op_col).cast("int")
                if self.op_col in stream.columns
                else F.lit(0).cast("int")
            )
            return stream.select(
                F.lit(tag).cast("int").alias("__side"),
                F.col(self.value_col).cast("double").alias("__val"),
                rop.alias("__op"),
            )

        rows = side(self.left_dir, self.left_schema, 0).unionByName(
            side(self.right_dir, self.right_schema, 1)
        )
        return rows.groupBy("__val").applyInPandasWithState(
            _setop_fn(self.op.upper(), self.all_flag),
            outputStructType=_SETOP_OUTPUT,
            stateStructType=_SETOP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )


@dataclass
class StreamingSetOpUnionAll:
    """UNION ALL changelog concatenation over a stateful set-op sub-chain
    — the streaming twin of operators/setop_step._exec_union_all for
    `(A EXCEPT B) UNION ALL C` (and the unparenthesized spelling; Flink
    unions changelogs freely, reference surface via planner delegation,
    TransformEngine.scala:252-262): the stateful sub-chain kernel's
    op-0/op-1 changelog unions with a third APPEND-ONLY stream's op-0
    inserts inside the SAME streaming query — Spark's union of two
    streaming frames adds no state of its own, so total state stays the
    sub-chain's per-value branch counts, sharded by value across
    executors."""

    left_dir: str
    right_dir: str
    third_dir: str
    checkpoint_dir: str
    output_dir: str
    op: str = "EXCEPT"
    all_flag: bool = False
    value_col: str = "value"
    op_col: str = "op"
    left_schema: StructType | None = None
    right_schema: StructType | None = None
    third_schema: StructType | None = None

    def _plan(self, spark: SparkSession) -> DataFrame:
        sub = StreamingSetOp(
            left_dir=self.left_dir,
            right_dir=self.right_dir,
            checkpoint_dir=self.checkpoint_dir,
            output_dir=self.output_dir,
            op=self.op,
            all_flag=self.all_flag,
            value_col=self.value_col,
            op_col=self.op_col,
            left_schema=self.left_schema,
            right_schema=self.right_schema,
        )._plan(spark)
        third = _file_stream(spark, self.third_dir, self.third_schema).select(
            F.lit(0).cast("int").alias("op"),
            F.col(self.value_col).cast("double").alias("value"),
        )
        return sub.unionByName(third)

    def run_available_now(self, spark: SparkSession) -> None:
        _run_available_now(
            self._plan(spark),
            self.checkpoint_dir,
            self.output_dir,
            input_dirs=_job_input_dirs(self),
        )
