"""Changelog <-> snapshot conversion (operators/changelog.py): the ODF
changelog op rules (reference Op.scala:5-18 — 0 append, 1 retract,
2 correct-from, 3 correct-to), the snapshot merge-strategy diff, and the
round-trip law tying them together. Registry twins
(changelog_diff_customers / changelog_snapshot_customers) are
value-checked against DuckDB by tools/crosscheck.py."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kamu_engine_flink_spark.operators import changelog as CL


def _chlog(spark, rows):
    """rows: (offset, op, k, v)"""
    return spark.createDataFrame(
        [Row(offset=o, op=op, k=k, v=v) for (o, op, k, v) in rows]
    )


def test_snapshot_last_offset_wins_and_op_rules(spark):
    df = _chlog(
        spark,
        [
            (0, 0, 1, "a"),  # append, later corrected
            (1, 0, 2, "b"),  # append, later retracted
            (2, 0, 3, "c"),  # plain append, survives
            (3, 2, 1, "a"),  # correct-from
            (4, 3, 1, "A"),  # correct-to -> survives with new value
            (5, 1, 2, "b"),  # retract -> gone
        ],
    )
    got = {(r.k, r.v) for r in CL.snapshot(df, ["k"]).collect()}
    assert got == {(1, "A"), (3, "c")}


def test_snapshot_drops_bookkeeping_columns(spark):
    df = _chlog(spark, [(0, 0, 1, "a")])
    assert CL.snapshot(df, ["k"]).columns == ["k", "v"]


def test_to_changelog_minimal_ops(spark):
    prev = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")])
    cur = spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c"), Row(k=4, v="d")])
    rows = sorted(
        [(r.op, r.pair_ord, r.k, r.v) for r in CL.to_changelog(prev, cur, ["k"]).collect()]
    )
    assert rows == [
        (0, 0, 4, "d"),  # new key appends
        (1, 0, 1, "a"),  # vanished key retracts with last-known values
        (2, 0, 2, "b"),  # changed key: correct-from old value...
        (3, 1, 2, "B"),  # ...then correct-to new value
    ]
    # unchanged key 3 emits nothing (minimality)
    assert all(k != 3 for (_, _, k, _) in rows)


def test_to_changelog_null_safe_value_compare(spark):
    prev = spark.createDataFrame([(1, None), (2, "x")], "k: long, v: string")
    cur = spark.createDataFrame([(1, None), (2, None)], "k: long, v: string")
    rows = sorted(
        [(r.op, r.k, r.v) for r in CL.to_changelog(prev, cur, ["k"]).collect()]
    )
    # null == null for k=1 (no emission); x -> null is a real change
    assert rows == [(2, 2, "x"), (3, 2, None)]


def test_to_changelog_rejects_schema_mismatch(spark):
    prev = spark.createDataFrame([Row(k=1, v="a", extra=1)])
    cur = spark.createDataFrame([Row(k=1, v="a")])
    with pytest.raises(ValueError, match="share one schema"):
        CL.to_changelog(prev, cur, ["k"])


def test_to_changelog_null_pk_rows(spark):
    """A NULL primary key is a legal key value for the null-safe join:
    presence classification must come from literal flags, not pk IS NOT
    NULL — a NULL-pk row only in cur is an op-0 append (not a bogus
    correction pair), one only in prev is an op-1 retract."""
    prev = spark.createDataFrame([(None, "old"), (1, "same")], "k: long, v: string")
    cur = spark.createDataFrame([(2, "new"), (1, "same")], "k: long, v: string")
    rows = sorted(
        [(r.op, r.k, r.v) for r in CL.to_changelog(prev, cur, ["k"]).collect()],
        key=lambda t: (t[0], t[1] if t[1] is not None else -1),
    )
    assert rows == [(0, 2, "new"), (1, None, "old")]
    # NULL pk present on BOTH sides with a changed value -> one 2/3 pair
    prev2 = spark.createDataFrame([(None, "a")], "k: long, v: string")
    cur2 = spark.createDataFrame([(None, "b")], "k: long, v: string")
    pair = sorted([(r.op, r.v) for r in CL.to_changelog(prev2, cur2, ["k"]).collect()])
    assert pair == [(2, "a"), (3, "b")]


def test_round_trip_law(spark):
    """snapshot(base changelog of prev ++ to_changelog(prev, cur)) == cur
    for snapshots with appears/vanishes/changes/unchanged all present."""
    from pyspark.sql import Window

    prev = spark.createDataFrame(
        [Row(k=i, v=f"v{i}") for i in range(20)]
    )
    cur = spark.createDataFrame(
        [Row(k=i, v=(f"V{i}" if i % 3 == 0 else f"v{i}")) for i in range(5, 25)]
    )
    diff = CL.to_changelog(prev, cur, ["k"])
    base = prev.select(
        F.lit(0).alias("op"), F.lit(-1).alias("pair_ord"), "k", "v"
    )
    allc = base.unionByName(diff).withColumn(
        "offset",
        F.row_number().over(Window.orderBy(F.col("pair_ord") >= 0, "k", "pair_ord")) - 1,
    )
    snap = CL.snapshot(allc.drop("pair_ord"), ["k"])
    assert sorted([(r.k, r.v) for r in snap.collect()]) == sorted(
        [(r.k, r.v) for r in cur.collect()]
    )
