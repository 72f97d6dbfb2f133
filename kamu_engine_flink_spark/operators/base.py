"""Common contract for stateful step executors.

Each transform query step runs through an executor that owns the step's
cross-invocation state (the role Flink savepoints play in the reference —
SURVEY.md §7 "State = versioned Parquet under the checkpoint dir").

Timing model, mirroring ParquetFilesStreamSourceFunction.scala:46-56 and
:115-126: rows of the current invocation are processed under the PREVIOUS
watermark (the source emits the saved watermark first, then data, then the
request's explicit watermarks last). So lateness checks use prev_wm and
emission checks use new_wm.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from ..engine.state import StateStore
from ..protocol.model import TransformRequest
from ..session import conf_int


@dataclass
class StepContext:
    spark: SparkSession
    state: StateStore
    step_key: str  # stable per transform step, e.g. "step0"
    request: TransformRequest
    views: dict[str, DataFrame]  # current-run rows per registered view
    event_time_cols: dict[str, str]  # view -> event-time column name
    prev_wms: dict[str, datetime | None]
    new_wms: dict[str, datetime | None]
    # DataFrames an executor persisted for reuse between its state-save
    # action and the output action; the engine unpersists them after the
    # final write (shared list across all steps of one invocation).
    pinned: list[DataFrame] = field(default_factory=list)
    # On-disk bytes of each RAW input view's slice this invocation (step
    # aliases absent): lets stateful joins decide from REAL sizes whether
    # the new slice is broadcastable against accumulated state, instead
    # of forcing a hint that would OOM when a slice is genuinely large.
    slice_sizes: dict[str, int] = field(default_factory=dict)
    # Aliases whose __seq is DENSE this invocation (exactly 0..n-1, with
    # physical partition-major row order equal to seq order): the engine's
    # mid-chain emission stamp produces this shape, and a pure 1:1
    # projection preserves it. A final step over one of these can derive
    # offsets as __seq + next_offset with no second serial
    # repartition(1) + window pass (engine/transform._assemble_output).
    # Shared (mutated) across the steps of one invocation, like `views`.
    dense_seq_views: set[str] = field(default_factory=set)

    def pin(self, df: DataFrame) -> DataFrame:
        """Cache `df` (memory-and-disk) so the state-save action and the
        result action scan the input union once, not twice — per-slice
        read amplification is 2x otherwise on every stateful step."""
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        self.pinned.append(df)
        return df


@dataclass
class StepResult:
    df: DataFrame
    watermark: datetime | None
    # Deterministic emission order for offset stamping; None = preserve the
    # DataFrame's natural (single-input narrow-plan) order.
    order_cols: list[str] | None = None
    # order_cols == [__seq] AND __seq is dense 0..n-1 with the frame's
    # physical (partition-major) row order equal to seq order — a pure
    # projection over a densely stamped alias. Offsets then become
    # __seq + next_offset and the output assembly skips its serial
    # repartition(1) + window pass; a re-stamp of the alias is skipped
    # too (it would be an identity rewrite).
    dense_seq: bool = False


def min_watermark(*wms: datetime | None) -> datetime | None:
    present = [w for w in wms if w is not None]
    if not present:
        return None
    return min(present)


def fast_local_df(spark: SparkSession, rows: list[dict], schema) -> DataFrame:
    """Driver-local rows -> DataFrame via a pyarrow Table: skips the
    per-row schema verification/conversion of the plain-rows path
    (measured ~4x faster at 72k rows — the Top-N changelog hotspot).
    Falls back to the verified row path on any type the small arrow map
    doesn't cover."""
    try:
        import pyarrow as pa
        from pyspark.sql.types import (
            BooleanType,
            DateType,
            DoubleType,
            FloatType,
            IntegerType,
            LongType,
            StringType,
            TimestampType,
        )

        _PA = {
            LongType(): pa.int64(),
            IntegerType(): pa.int32(),
            DoubleType(): pa.float64(),
            FloatType(): pa.float32(),
            StringType(): pa.string(),
            BooleanType(): pa.bool_(),
            TimestampType(): pa.timestamp("us", tz="UTC"),
            DateType(): pa.date32(),
        }
        cols = {}
        for f in schema.fields:
            pa_t = _PA.get(f.dataType)
            if pa_t is None:
                raise TypeError(f.dataType)
            vals = [r.get(f.name) for r in rows]
            if isinstance(f.dataType, TimestampType):
                # Rows collected via the classic path carry NAIVE
                # driver-LOCAL datetimes (TimestampType.fromInternal);
                # pyarrow would reinterpret those as UTC wall time,
                # shifting every timestamp by the driver's UTC offset.
                # .timestamp() applies the local zone to naive values and
                # respects tzinfo on aware ones — mirror of the verified
                # row path's time.mktime, correct on any driver TZ.
                vals = [
                    None if v is None else int(round(v.timestamp() * 1_000_000))
                    for v in vals
                ]
            cols[f.name] = pa.array(vals, type=pa_t)
        out = spark.createDataFrame(pa.table(cols))
        if out.schema != schema:
            raise TypeError("arrow schema mismatch")
        return out
    except Exception:
        return spark.createDataFrame(rows, schema)


def split_touched_state(
    prev: DataFrame, keys: list[str], probe_keys: DataFrame,
    no_null_keys: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(active, untouched): partition a keyed state relation by whether its
    key appears in `probe_keys` (this slice's key set).

    Probes use plain `=` so a BUCKETED state scan keeps its output
    partitioning and plans no exchange — Spark rewrites null-safe (<=>)
    join keys into coalesce/isnull composites that defeat hash-partition
    pruning, re-shuffling the whole state. NULL group keys (legal groups
    under GROUP BY / PARTITION BY semantics) can never `=`-match, so
    NULL-keyed state rows are unconditionally routed to `active`: folding
    an unchanged group is a no-op emission-wise, and NULL-key groups stay
    exact without a full-state null-safe shuffle.

    `no_null_keys=True` (for callers whose keys provably can't be NULL —
    the md5 row fingerprints of DISTINCT and the set operators) skips
    that NULL branch: the Union it creates reports UnknownPartitioning,
    which makes the downstream keyed join re-shuffle the WHOLE state and
    silently defeats the bucketed scan this function exists to preserve."""
    from pyspark.sql import functions as F

    cond = None
    for k in keys:
        c = F.col(f"s.{k}") == F.col(f"p.{k}")
        cond = c if cond is None else (cond & c)
    if no_null_keys:
        active = prev.alias("s").join(probe_keys.alias("p"), cond, "left_semi")
        untouched = prev.alias("s").join(
            probe_keys.alias("p"), cond, "left_anti"
        )
        return active, untouched
    nn = None
    for k in keys:
        c = F.col(k).isNotNull()
        nn = c if nn is None else (nn & c)
    state_nn = prev.filter(nn)
    state_null = prev.filter(~nn)
    active = state_nn.alias("s").join(
        probe_keys.alias("p"), cond, "left_semi"
    ).unionByName(state_null)
    untouched = state_nn.alias("s").join(probe_keys.alias("p"), cond, "left_anti")
    return active, untouched


def state_split_worthwhile(
    ctx: "StepContext", state_name: str, src: str | None, factor: int = 4
) -> bool:
    """Gate for the touched-keys state split: worth its probe cost only
    when the accumulated state is substantially larger than this slice
    (the steady-state shape of a long-lived stream — a daily slice against
    months of keys). When state ~ slice, the slice plausibly touches most
    keys and the split's semi/anti/distinct passes are pure overhead on
    top of an unavoidable full fold. Decided from free file-size metadata
    — no Spark job."""
    state_bytes = ctx.state.relation_bytes(state_name)
    if not state_bytes:
        return False  # first invocation: nothing to split
    slice_bytes = ctx.slice_sizes.get(src) if src else None
    if slice_bytes is None:
        return True  # chained alias, size unknown: prefer the scale-safe path
    return state_bytes > factor * slice_bytes


def maintain_signed_ledger(
    ctx: "StepContext",
    name: str,
    delta: "DataFrame",
    value_cols: list[str],
    sign_col: str,
    bucket_by: list[str] | None,
    full: "DataFrame | None" = None,
) -> None:
    """Persist a signed-multiset ledger: the common case appends only the
    invocation's signed rows — O(slice). But an upstream changelog emits a
    +1/-1 pair per touched tuple EVERY invocation, so an append-only
    ledger grows with changelog volume, not live rows. Netting the ledger
    (groupBy tuple, sum sign, drop zero nets) is semantics-preserving
    (every consumer folds by summing signs), so once the accumulated
    bytes exceed 4x the size measured after the last compaction — floor
    tracked in a `<name>.compact.json` sidecar, measured lazily on the
    following invocation — the history folds back to one row per live
    tuple: amortized O(slice) appends with periodic O(state) compactions
    (Flink retains only live rows continuously).

    `full` optionally passes the already-loaded prior ledger so the
    compaction rewrite reuses its (bucketed) scan."""
    from pyspark.sql import functions as F

    meta_name = f"{name}.compact.json"
    meta = ctx.state.load_json(meta_name) or {}
    cur_bytes = ctx.state.relation_bytes(name) or 0
    floor = meta.get("floor")
    min_bytes = conf_int(
        ctx.spark, "spark.kamu.state.ledgerCompactMinBytes", 8 << 20
    )
    if floor is not None and cur_bytes > max(4 * floor, min_bytes):
        ledger = (
            full
            if full is not None
            else ctx.state.load_df(name, schema=delta.schema)
        )
        sign_type = delta.schema[sign_col].dataType
        compacted = (
            ledger.unionByName(delta)
            .groupBy(*value_cols)
            .agg(F.sum(sign_col).cast(sign_type).alias(sign_col))
            .filter(F.col(sign_col) != 0)
        )
        ctx.state.save_df(name, compacted, bucket_by=bucket_by)
        # floor=None -> the next invocation records the compacted size.
        ctx.state.save_json(meta_name, {"floor": None})
    else:
        ctx.state.save_df(name, delta, bucket_by=bucket_by, append=True)
        if floor is None:
            ctx.state.save_json(meta_name, {"floor": cur_bytes})
