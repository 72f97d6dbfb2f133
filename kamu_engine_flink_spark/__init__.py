"""kamu_engine_flink_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of kamu-data/kamu-engine-flink.

The reference implements the Open Data Fabric "Engine" contract on Flink:
a resumable, watermark-driven streaming-SQL transform runner over Parquet
slices with changelog semantics (see SURVEY.md). This package re-derives
those capabilities Spark-first:

- batch-per-invocation execution (Spark's batch engine natively has the
  "process available input, persist state, exit" shape the reference
  fights Flink to obtain via stop-with-savepoint);
- engine-owned state files play the savepoint role (watermarks, offset
  counter, window partials, join buffers, Top-N state);
- Catalyst/Tungsten replace the reference's vendored Parquet reader stack
  and all physical planning;
- a small SQL dialect layer accepts the reference's documented query
  shapes (TUMBLE, LATERAL TABLE, FOR SYSTEM_TIME AS OF).

Layout:
    sources/    parquet slice reading (ordered multi-file, ns-safe)
    sinks/      single-file parquet writing (TIMESTAMP_MILLIS, snappy)
    protocol/   ODF request/response dataclasses + YAML IO
    plans/      Flink-SQL -> Spark-SQL dialect rewriting
    engine/     raw-query + transform runners, state store
    operators/  relational & streaming operators (window agg, as-of join,
                interval join, top-n changelog, dedup, similarity, text)
    functions/  column-level building blocks (hashing, vectors, text)
    streaming/  Structured Streaming wrappers
"""

__version__ = "0.1.0"
