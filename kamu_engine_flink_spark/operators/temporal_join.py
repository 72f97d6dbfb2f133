"""Stateful temporal (as-of) join.

Reference semantics (README.md "Temporal Table Joins",
TransformEngine.scala:163-200, EngineJoinStreamToTemporalTableTest): one
input is declared a temporal table keyed by a single-column PK and
versioned by event_time; each probe row joins the latest version whose
event_time <= the probe's event_time. Probe rows wait until the watermark
of BOTH inputs passes their event time (so the joined version is final);
buffered probe rows flush on later invocations as watermarks advance.

Spark-first derivation: the version history is a persisted relation; we
derive validity intervals [__valid_from, __valid_to) per key with `lead()`
and let the dialect layer (plans/dialect.py) rewrite both Flink spellings
(`LATERAL TABLE (f(t.ts))` and `FOR SYSTEM_TIME AS OF`) into a plain range
join Catalyst can plan — and broadcast when the versioned side is small,
which is the common dimension-table case at scale. Version history is
pruned to versions still valid at the joint watermark, so state stays
bounded by key cardinality, not history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.classify import referenced_views
from ..plans.dialect import VALID_FROM, VALID_TO, VERSIONS_SUFFIX, rewrite_query
from ..protocol.model import InvalidQueryError, TemporalTable
from .base import StepContext, StepResult, min_watermark


def with_validity(versions: DataFrame, primary_key: list[str], event_time_col: str) -> DataFrame:
    """Attach [__valid_from, __valid_to) to each version row."""
    w = Window.partitionBy(*primary_key).orderBy(F.col(event_time_col).asc())
    return versions.withColumn(VALID_FROM, F.col(event_time_col)).withColumn(
        VALID_TO, F.lead(event_time_col).over(w)
    )


def resolve_temporal_table(ctx: StepContext, name: str) -> TemporalTable:
    for t in ctx.request.transform.temporal_tables:
        if t.name == name:
            if len(t.primary_key) != 1:
                # Composite PK rejected like TransformEngine.scala:194-197.
                raise InvalidQueryError(
                    f"temporal table '{name}' must have exactly one primary key column"
                )
            return t
    raise InvalidQueryError(f"temporal table '{name}' is not declared")


def execute_temporal_join(ctx: StepContext, sql: str) -> StepResult:
    known = set(ctx.views)
    refs = referenced_views(sql, known)
    temporal_names = {t.name for t in ctx.request.transform.temporal_tables}
    build_names = [r for r in refs if r in temporal_names]
    probe_names = [r for r in refs if r not in temporal_names]
    if len(build_names) != 1 or len(probe_names) != 1:
        raise InvalidQueryError(
            f"temporal join must reference one probe and one temporal table, got {refs}"
        )
    build, probe = build_names[0], probe_names[0]
    tt = resolve_temporal_table(ctx, build)
    build_et = ctx.event_time_cols[build]
    probe_et = ctx.event_time_cols[probe]

    # Version history accumulates across invocations.
    # Scoped per STEP: two temporal-join steps on the same build table
    # prune by different joint watermarks — a shared file would let the
    # last writer destroy versions the other step's buffered probes need.
    versions_state = f"{ctx.step_key}-versions-{build}"
    # One-time migration: checkpoints from engine revisions before the
    # per-step scoping used the unscoped key. Loading the legacy file once
    # (it is re-saved under the scoped key below) keeps a restored
    # dataset's entire build-side history instead of silently starting an
    # EMPTY versions frame.
    legacy_versions_state = f"versions-{build}"
    if not ctx.state.has_df(versions_state) and ctx.state.has_df(
        legacy_versions_state
    ):
        prev_versions = ctx.state.load_df(
            legacy_versions_state, schema=ctx.views[build].schema
        )
    else:
        prev_versions = ctx.state.load_df(
            versions_state, schema=ctx.views[build].schema
        )
    versions = ctx.pin(prev_versions.unionByName(ctx.views[build]))

    # Probe rows release when the joint watermark passes their event time.
    probe_state = f"{ctx.step_key}-probe-buffer"
    prev_probe = ctx.state.load_df(probe_state, schema=ctx.views[probe].schema)
    probe_all = ctx.pin(prev_probe.unionByName(ctx.views[probe]))
    # Releasing a probe requires the watermark of BOTH inputs past its
    # event time (the joined version must be final). A side with no
    # watermark yet holds everything — min_watermark's skip-None would
    # otherwise release probes against non-final history and drop them
    # from the buffer forever.
    pw, bw = ctx.new_wms.get(probe), ctx.new_wms.get(build)
    joint_wm = min_watermark(pw, bw) if pw is not None and bw is not None else None
    if joint_wm is not None:
        release = probe_all.filter(F.col(probe_et) <= F.lit(joint_wm))
        keep = probe_all.filter(F.col(probe_et) > F.lit(joint_wm))
    else:
        release = probe_all.limit(0)
        keep = probe_all

    # Prune versions no longer reachable: future probe rows have
    # event_time > joint_wm, so only versions valid at or after it matter.
    versioned = with_validity(versions, tt.primary_key, build_et)
    if joint_wm is not None:
        pruned = versioned.filter(
            F.col(VALID_TO).isNull() | (F.col(VALID_TO) > F.lit(joint_wm))
        ).drop(VALID_FROM, VALID_TO)
    else:
        pruned = versions
    # Independent outputs: overlap the probe-buffer and versions writes.
    ctx.state.save_dfs([(probe_state, keep), (versions_state, pruned)])

    release.createOrReplaceTempView(probe)
    versioned.createOrReplaceTempView(build + VERSIONS_SUFFIX)
    try:
        result = ctx.spark.sql(rewrite_query(sql, watermark=joint_wm))
    finally:
        ctx.views[probe].createOrReplaceTempView(probe)

    order_cols = list(result.columns)
    out_et = ctx.request.vocab.event_time_column
    if out_et in order_cols:
        order_cols.remove(out_et)
        order_cols.insert(0, out_et)
    return StepResult(df=result, watermark=joint_wm, order_cols=order_cols)
