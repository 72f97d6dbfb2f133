"""Headline benchmark: runs representative engine queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized with a noop sink (no driver collect, no
disk write skew) so the number measures the distributed plan, not the
driver. Spark/JVM warmup is paid once by a throwaway scan, like a real
cluster's warm executors.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from kamu_engine_flink_spark.session import engine_session

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_supplier_volume",
    "q6_forecast_revenue",
    "window_tumbling_daily",
    "topn_orders_per_customer",
    "semi_join_returned_orders",
    "cube_orders_status_priority",
    "q7_nation_trade",
    "q9_product_profit",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "asof_join_purchase_value",
    "interval_join_clicks",
    "dedup_exact_documents",
    "dedup_minhash_documents",
    "text_analysis_documents",
    "similarity_cosine_topk",
]


MAP_SQL = "SELECT event_time, user_id, event_type, value * 2 as value2 FROM events"
AGG_SQL = """SELECT
  TUMBLE_START(event_time, INTERVAL '1' DAY) as event_time,
  event_type,
  count(*) as n_events,
  sum(value) as sum_value
FROM events GROUP BY TUMBLE(event_time, INTERVAL '1' DAY), event_type"""


def _odf_ledger(spark, sf_dir: str, workdir: str):
    """events.parquet as an ODF ledger (system columns added) — prep cost
    excluded from timings, like the reference's test fixtures."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kamu_engine_flink_spark.sinks.parquet import write_single_parquet

    path = os.path.join(workdir, "events_ledger.parquet")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = (
        e.select(
            F.col("ts").alias("event_time"), "user_id", "event_type", "value"
        )
        .withColumn("offset", F.row_number().over(Window.orderBy("event_time", "user_id")) - 1)
        .withColumn("op", F.lit(0).cast("int"))
        .withColumn("system_time", F.to_timestamp(F.lit("2020-01-01 00:00:00")))
        .select("offset", "op", "system_time", "event_time", "user_id", "event_type", "value")
    )
    write_single_parquet(df, path, sorted_single=False)
    wm = spark.read.parquet(path).agg({"event_time": "max"}).collect()[0][0]
    return path, wm


def _time_transform(spark, ledger: str, wm, sql: str, workdir: str, tag: str) -> float:
    """One full ODF transform invocation (the reference's primary surface):
    slice read, dialect rewrite, stateful executor, offset stamp,
    single-file write, state persist."""
    from datetime import timezone

    from kamu_engine_flink_spark.engine.transform import execute_transform
    from kamu_engine_flink_spark.protocol.model import (
        DatasetVocabulary,
        SqlQueryStep,
        Transform,
        TransformRequest,
        TransformRequestInput,
        Watermark,
    )

    st = wm.replace(tzinfo=timezone.utc) if wm.tzinfo is None else wm
    req = TransformRequest(
        transform=Transform(queries=[SqlQueryStep(query=sql)]),
        query_inputs=[
            TransformRequestInput(
                query_alias="events",
                data_paths=[ledger],
                schema_file=ledger,
                vocab=DatasetVocabulary(),
                explicit_watermarks=[Watermark(system_time=st, event_time=st)],
            )
        ],
        system_time=st,
        next_offset=0,
        prev_checkpoint_path=None,
        new_checkpoint_path=os.path.join(workdir, f"cp-{tag}"),
        new_data_path=os.path.join(workdir, f"out-{tag}.parquet"),
        vocab=DatasetVocabulary(),
    )
    t0 = time.perf_counter()
    execute_transform(spark, req)
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None

    spark = engine_session(app_name="kamu-engine-spark-bench")
    # Warm the JVM/codegen and the Arrow/Python-UDF worker pool once
    # (a real cluster's executors are warm); excluded from per-query timings.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql.functions import lit

    from kamu_engine_flink_spark.functions.minhash_pandas import (
        minhash_signature_fast,
        shingle_hashes_fast,
    )

    spark.range(0, 1000, 1, 32).select(
        shingle_hashes_fast(lit("warm up text"), 3),
        minhash_signature_fast(lit("warm up text"), 64, 3),
    ).count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)

    # The ODF transform runner — the reference's primary surface
    # (TransformEngine.scala:64-336) — timed as full invocations.
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="bench-odf-")
    try:
        ledger, wm = _odf_ledger(spark, sf_dir, workdir)
        for tag, sql in (("odf_transform_map", MAP_SQL), ("odf_transform_window_agg", AGG_SQL)):
            timings[tag] = _time_transform(spark, ledger, wm, sql, workdir, tag)
            print(f"{tag}: {timings[tag]}s", file=sys.stderr)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
            }
        )
    )


if __name__ == "__main__":
    main()
