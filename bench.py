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
