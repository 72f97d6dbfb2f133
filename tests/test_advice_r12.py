"""Regressions for the round-11 ADVICE findings.

1. temporal_join: a join condition that equates only a SUBSET of a
   composite primary key no longer silently multiplies output rows —
   _require_full_pk_equality raises InvalidQueryError naming the
   missing key columns before any state is touched.
2. dialect WITH ORDINALITY, len(cols)==2: an array of SINGLE-FIELD rows
   flattens to the field (like the non-ordinality inline() path and
   Flink 1.20), instead of emitting the unflattened struct. The plain
   one-column spelling over the same array also flattens.
3. dialect._unnest_from_tables: comma-separated FROM lists (`FROM a,
   b`) surface EVERY table, so the unqualified-uniqueness gate sees the
   full table set and genuinely ambiguous columns fall back to inline()
   instead of resolving MAP from the first table only.
"""

from __future__ import annotations

import pytest

from kamu_engine_flink_spark.operators.temporal_join import (
    _pk_equated,
    _require_full_pk_equality,
)
from kamu_engine_flink_spark.plans.dialect import (
    _unnest_from_tables,
    rewrite_query,
)
from kamu_engine_flink_spark.protocol.model import InvalidQueryError

from .helpers import TransformRunner, ts, write_input_slice


# --- 1. full-PK-equality guard ------------------------------------------

PARTIAL_PK_QUERY = """SELECT
  t.event_time, t.symbol, t.region, t.qty, r.rate AS rate
FROM trades AS t
JOIN rates FOR SYSTEM_TIME AS OF t.event_time AS r
ON t.symbol = r.symbol"""


def test_pk_equated_spellings():
    assert _pk_equated("ON t.symbol = r.symbol", "symbol")
    assert _pk_equated("WHERE r.`symbol` = t.symbol", "symbol")
    assert _pk_equated("ON r.symbol=t.symbol AND x", "symbol")
    assert _pk_equated("JOIN r USING (region, symbol)", "symbol")
    # non-equality comparisons do not count
    assert not _pk_equated("ON t.symbol <= r.other", "symbol")
    assert not _pk_equated("ON t.other != r.symbol2", "symbol")
    assert not _pk_equated("ON t.a = r.b", "symbol")


def test_require_full_pk_equality_errors_name_missing_columns():
    with pytest.raises(InvalidQueryError) as ei:
        _require_full_pk_equality(PARTIAL_PK_QUERY, "rates", ["symbol", "region"])
    assert "region" in str(ei.value)
    assert "symbol, region" in str(ei.value)
    # full condition passes
    _require_full_pk_equality(
        PARTIAL_PK_QUERY + " AND t.region = r.region",
        "rates",
        ["symbol", "region"],
    )


def _rates2_slice(path: str, rows):
    cols = list(zip(*rows))
    import pyarrow as pa

    write_input_slice(
        path,
        {
            "offset": list(cols[0]),
            "op": [0] * len(rows),
            "system_time": list(cols[1]),
            "event_time": list(cols[2]),
            "symbol": list(cols[3]),
            "region": list(cols[4]),
            "rate": list(cols[5]),
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "symbol": pa.string(),
            "region": pa.string(),
            "rate": pa.int32(),
        },
    )


def _probe2_slice(path: str, rows):
    cols = list(zip(*rows))
    import pyarrow as pa

    write_input_slice(
        path,
        {
            "offset": list(cols[0]),
            "op": [0] * len(rows),
            "system_time": list(cols[1]),
            "event_time": list(cols[2]),
            "symbol": list(cols[3]),
            "region": list(cols[4]),
            "qty": list(cols[5]),
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "symbol": pa.string(),
            "region": pa.string(),
            "qty": pa.int32(),
        },
    )


def test_partial_composite_pk_join_rejected_end_to_end(spark, tmp_path):
    """ON equates only `symbol` while the PK is (symbol, region): the
    engine must reject loudly instead of multiplying rows."""
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [(PARTIAL_PK_QUERY, None)],
        temporal_tables=[("rates", ("symbol", "region"))],
    )
    r1 = str(tmp_path / "r1.parquet")
    _rates2_slice(r1, [
        (0, ts(5), ts(1), "A", "eu", 10),
        (1, ts(5), ts(1), "A", "us", 20),
    ])
    p1 = str(tmp_path / "p1.parquet")
    _probe2_slice(p1, [(0, ts(5), ts(2), "A", "eu", 3)])
    with pytest.raises(InvalidQueryError) as ei:
        runner.run(
            [
                {"alias": "rates", "schema_file": r1, "data_paths": [r1],
                 "watermark": ts(2)},
                {"alias": "trades", "schema_file": p1, "data_paths": [p1],
                 "watermark": ts(2)},
            ],
            system_time=ts(5),
        )
    assert "region" in str(ei.value)


# --- 2. single-field row arrays flatten under WITH ORDINALITY ------------


def test_ordinality_single_field_rows_flatten(spark):
    import pyarrow as pa

    df = spark.createDataFrame(
        [(1, [("a",), ("b",)])],
        "id int, rows array<struct<f1: string>>",
    )
    df.createOrReplaceTempView("e_adv12")
    try:
        out = rewrite_query(
            "SELECT u.x, u.o FROM e_adv12 CROSS JOIN "
            "UNNEST(e_adv12.rows) WITH ORDINALITY AS u (x, o)"
        )
        # field pick, not the whole struct
        assert "r.`f1`" in out
        rows = sorted(
            (r.x, r.o) for r in spark.sql(out).collect()
        )
        assert rows == [("a", 1), ("b", 2)]
        # plain (non-ordinality) one-column spelling flattens identically
        out2 = rewrite_query(
            "SELECT u.x FROM e_adv12 CROSS JOIN "
            "UNNEST(e_adv12.rows) AS u (x)"
        )
        assert "inline" in out2
        assert sorted(r.x for r in spark.sql(out2).collect()) == ["a", "b"]
    finally:
        spark.catalog.dropTempView("e_adv12")


def test_ordinality_plain_array_still_value_ord(spark):
    df = spark.createDataFrame([(1, ["p", "q"])], "id int, arr array<string>")
    df.createOrReplaceTempView("e_adv12b")
    try:
        out = rewrite_query(
            "SELECT u.x, u.o FROM e_adv12b CROSS JOIN "
            "UNNEST(e_adv12b.arr) WITH ORDINALITY AS u (x, o)"
        )
        rows = sorted((r.x, r.o) for r in spark.sql(out).collect())
        assert rows == [("p", 1), ("q", 2)]
    finally:
        spark.catalog.dropTempView("e_adv12b")


# --- 3. comma-separated FROM lists in _unnest_from_tables ----------------


def test_unnest_from_tables_comma_list():
    assert _unnest_from_tables("SELECT * FROM a, b WHERE a.x = b.x") == {
        "a": "a",
        "b": "b",
    }
    assert _unnest_from_tables(
        "SELECT * FROM a AS x, `b` y, c JOIN d ON c.i = d.i"
    ) == {"x": "a", "y": "b", "c": "c", "d": "d"}
    # UNNEST items terminate the comma chain without being tables
    assert _unnest_from_tables(
        "SELECT u.x FROM a, UNNEST(a.arr) AS u (x)"
    ) == {"a": "a"}


def test_comma_list_ambiguous_map_column_falls_to_inline(spark):
    """`m` exists as a MAP in table a but ALSO in table b: with the
    comma-separated FROM both tables are now visible, the unqualified
    binding is ambiguous, and the rewrite must fall back to inline()."""
    spark.createDataFrame(
        [(1, {"k": "v"})], "id int, m map<string,string>"
    ).createOrReplaceTempView("adv12_a")
    spark.createDataFrame(
        [(1, [("k2", "v2")])],
        "id2 int, m array<struct<key: string, value: string>>",
    ).createOrReplaceTempView("adv12_b")
    try:
        out = rewrite_query(
            "SELECT u.k, u.v FROM adv12_a, adv12_b, "
            "UNNEST(m) AS u (k, v) WHERE adv12_a.id = adv12_b.id2"
        )
        assert "inline(m)" in out
    finally:
        spark.catalog.dropTempView("adv12_a")
        spark.catalog.dropTempView("adv12_b")
