"""Single-file parquet sink.

The ODF engine contract requires exactly one parquet data file per
invocation at a caller-chosen path. The reference buffers every result row
on the heap and flushes once via an Avro->Parquet writer on savepoint
(ParuqetSink.scala:29-80) — which caps output size at executor memory.

Spark-first version: write a normal (distributed, spill-safe) parquet
directory next to the target, then move the single part file into place.
We only coalesce(1) when the caller asks for deterministic in-file row
order (the ODF offset contract); otherwise the upstream stays parallel
and we merely rename whatever single part AQE-coalesced output produced.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_single_parquet(df: DataFrame, path: str, *, sorted_single: bool = True) -> int:
    """Write `df` as ONE parquet file at `path`; returns row count.

    sorted_single=True coalesces to one task so the in-file row order is
    the DataFrame order (required where `offset` must equal row position).
    The reference holds the same constraint via global parallelism=1
    (TransformApp.scala:39); we pay it only at the final write.
    """
    tmp_dir = path + ".tmp.spark-write"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    out = df.coalesce(1) if sorted_single else df
    out.write.mode("overwrite").option("compression", "snappy").parquet(tmp_dir)
    parts = sorted(glob.glob(os.path.join(tmp_dir, "part-*.parquet")))
    if len(parts) != 1:
        # Merge would break ordering guarantees; fail loudly instead.
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise RuntimeError(f"expected exactly 1 part file, got {len(parts)}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if os.path.exists(path):
        os.remove(path)
    shutil.move(parts[0], path)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def write_partitioned_ledger(
    df: DataFrame,
    path: str,
    *,
    next_offset: int = 0,
    order_cols: list[str] | None = None,
    offset_col: str = "offset",
    num_partitions: int | None = None,
) -> int:
    """The 100 TB escape hatch for the single-file ODF output contract: a
    PARTITIONED parquet ledger directory with exact, contiguous, globally
    ordered offsets — no coalesce(1) anywhere, so the write scales with
    the cluster instead of serializing through one task.

    Mechanics: range-repartition + in-partition sort on `order_cols`
    (partitions are globally ordered), persist that one shuffle, count
    rows per partition (a driver-side dict of size = #partitions), derive
    each partition's base offset by prefix sum, and stamp
    base + within-partition position in an Arrow mapInPandas pass. Offsets
    are deterministic whenever `order_cols` is a total order (ties may
    land on either side of a range boundary otherwise — same caveat as
    any distributed sort).

    Returns the row count. The single-file `write_single_parquet` remains
    the ODF-contract path; this is the forward path for outputs too large
    for one file (reference comparison: the Flink sink buffers the whole
    result on one heap — ParuqetSink.scala:29-80 — so this shape has no
    reference equivalent at all)."""
    import pandas as pd  # noqa: F401  (mapInPandas batches)
    from pyspark import StorageLevel
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    if order_cols:
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        ordered = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        ordered = ordered.sortWithinPartitions(*order_cols)
    else:
        ordered = df
    tagged = ordered.withColumn("__pid", F.spark_partition_id()).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        counts = {
            r["__pid"]: r["cnt"]
            for r in tagged.groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        base: dict[int, int] = {}
        acc = next_offset
        for pid in sorted(counts):
            base[pid] = acc
            acc += counts[pid]
        bbase = df.sparkSession.sparkContext.broadcast(base)

        def stamp(it):
            cursor = None
            for pdf in it:
                if not len(pdf):
                    continue
                pid = int(pdf["__pid"].iloc[0])
                if cursor is None:
                    cursor = bbase.value[pid]
                out = pdf.drop(columns="__pid").copy()
                out.insert(0, offset_col, range(cursor, cursor + len(pdf)))
                cursor += len(pdf)
                yield out

        out_schema = StructType(
            [StructField(offset_col, LongType(), False)] + list(df.schema.fields)
        )
        stamped = tagged.mapInPandas(stamp, out_schema)
        stamped.write.mode("overwrite").option("compression", "snappy").parquet(path)
        return acc - next_offset
    finally:
        tagged.unpersist()
        try:
            bbase.destroy()
        except NameError:
            pass  # broadcast never created (write failed before it)
