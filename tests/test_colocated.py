"""Bucketed co-located join: the write-once-shuffle-never pattern for
repeated big equi-joins (operators/colocated.py). The assertion that
matters is on the PLAN — zero shuffle exchanges — because that is the
property that survives a 1000-executor scale-up; row equality against the
plain join proves the bucketed path changes nothing semantically."""

import pytest
from pyspark.sql import functions as F

from kamu_engine_flink_spark.operators.colocated import (
    colocated_join,
    exchange_count,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("o_custkey"),
        (F.col("id") * 1.5).alias("o_totalprice"),
    )
    lineitem = spark.range(0, 4000).select(
        (F.col("id") % 1000).alias("l_orderkey"),
        (F.col("id") % 50).alias("l_partkey"),
        (F.col("id") % 10 + 1.0).alias("l_quantity"),
    )
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, path=str(base / "o"))
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8, path=str(base / "l"))
    yield {"orders": orders, "lineitem": lineitem}
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    with _no_broadcast(spark):
        joined = colocated_join(
            spark,
            "lineitem_b",
            "orders_b",
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_custkey").agg(F.sum("l_quantity").alias("q"))
        joined.collect()
        # The join itself is exchange-free; the single exchange allowed
        # here is the final groupBy on a different key.
        assert exchange_count(joined) <= 1

        plain_join = colocated_join(
            spark,
            "lineitem_b",
            "orders_b",
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plain_join.collect()
        assert exchange_count(plain_join) == 0


def test_bucketed_join_matches_plain_join(spark, bucketed):
    with _no_broadcast(spark):
        via_buckets = sorted(
            (r.l_orderkey, r.o_custkey, r.l_quantity)
            for r in colocated_join(
                spark,
                "lineitem_b",
                "orders_b",
                F.col("l_orderkey") == F.col("o_orderkey"),
            ).collect()
        )
    plain = sorted(
        (r.l_orderkey, r.o_custkey, r.l_quantity)
        for r in bucketed["lineitem"]
        .join(bucketed["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .collect()
    )
    assert via_buckets == plain


class _no_broadcast:
    """Force the sort-merge path (broadcast would trivially avoid the
    exchange for these tiny fixtures and hide the property under test)."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)
