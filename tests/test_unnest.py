"""UNNEST — Flink's array-expanding join, reference surface via planner
delegation (TransformEngine.scala:252-262 hands query text to the Flink
parser, which accepts CROSS JOIN UNNEST / LEFT JOIN UNNEST .. ON TRUE).
The dialect maps it onto Spark's LATERAL VIEW explode/inline."""

from __future__ import annotations

import pyarrow as pa
import pytest

from kamu_engine_flink_spark.plans.classify import MAP, classify
from kamu_engine_flink_spark.plans.dialect import rewrite_query
from kamu_engine_flink_spark.protocol.model import InvalidQueryError

from .helpers import TransformRunner, ts, write_input_slice


def test_unnest_rewrites():
    assert rewrite_query(
        "SELECT e.event_time, u.x FROM e CROSS JOIN UNNEST(e.arr) AS u (x)"
    ).strip() == (
        "SELECT e.event_time, u.x FROM e  LATERAL VIEW explode(e.arr) u AS x"
    )
    # comma spelling, nested call inside the array expression
    out = rewrite_query(
        "SELECT u.x FROM e, UNNEST(split(e.tags, ',')) AS u (x) WHERE u.x <> ''"
    )
    assert "LATERAL VIEW explode(split(e.tags, ',')) u AS x" in out
    assert "UNNEST" not in out
    # LEFT JOIN ... ON TRUE keeps empty/NULL arrays -> OUTER
    out = rewrite_query(
        "SELECT u.x FROM e LEFT JOIN UNNEST(e.arr) AS u (x) ON TRUE"
    )
    assert "LATERAL VIEW OUTER explode(e.arr) u AS x" in out
    # multi-column alias list (array of rows) -> inline
    out = rewrite_query(
        "SELECT u.f1, u.f2 FROM e CROSS JOIN UNNEST(e.rows) AS u (f1, f2)"
    )
    assert "LATERAL VIEW inline(e.rows) u AS f1, f2" in out


def test_unnest_inside_string_literal_untouched():
    """Occurrences are located on the literal-masked text: UNNEST text
    inside a string literal must be neither rewritten nor treated as a
    missing-alias error (ADVICE r9: the raw-text scan corrupted it)."""
    sql = (
        "SELECT 'CROSS JOIN UNNEST(x) AS u (x)' AS s, event_time FROM e"
    )
    assert rewrite_query(sql) == sql
    sql2 = "SELECT ', UNNEST(arr)' AS s, event_time FROM e"
    assert rewrite_query(sql2) == sql2


def test_unnest_map_rewrite_resolution(spark):
    """A two-column UNNEST alias over a MAP column resolves against the
    registered view schema and emits explode() (key/value), not
    inline(); an array-of-rows column keeps inline()."""
    spark.sql(
        "SELECT 'A' AS symbol, map('k', 1) AS attrs, "
        "array(named_struct('f1', 1, 'f2', 2)) AS pairs"
    ).createOrReplaceTempView("mapv")
    try:
        out = rewrite_query(
            "SELECT u.k, u.v FROM mapv CROSS JOIN UNNEST(attrs) AS u (k, v)"
        )
        assert "LATERAL VIEW explode(attrs) u AS k, v" in out
        # qualified spelling resolves through the FROM alias
        out = rewrite_query(
            "SELECT u.k, u.v FROM mapv m CROSS JOIN UNNEST(m.attrs) AS u (k, v)"
        )
        assert "LATERAL VIEW explode(m.attrs) u AS k, v" in out
        # array-of-rows stays inline
        out = rewrite_query(
            "SELECT u.f1, u.f2 FROM mapv CROSS JOIN UNNEST(pairs) AS u (f1, f2)"
        )
        assert "LATERAL VIEW inline(pairs) u AS f1, f2" in out
    finally:
        spark.catalog.dropTempView("mapv")


def test_unnest_unqualified_ambiguous_column_falls_to_inline(spark):
    """An UNQUALIFIED UNNEST argument that exists in MORE THAN ONE
    referenced table is ambiguous — the rewrite must NOT answer MAP from
    whichever table matches first; it falls back to inline() (round-10
    ADVICE #2). A UNIQUE binding still resolves."""
    spark.sql(
        "SELECT 'A' AS symbol, map('k', 1) AS attrs"
    ).createOrReplaceTempView("mv1")
    spark.sql(
        "SELECT 'A' AS symbol, array(named_struct('k', 'x', 'v', 1)) AS attrs"
    ).createOrReplaceTempView("mv2")
    spark.sql(
        "SELECT 'A' AS symbol2, 1 AS other"
    ).createOrReplaceTempView("mv3")
    try:
        # attrs exists in BOTH mv1 (map) and mv2 (array-of-rows):
        # ambiguous -> inline().
        out = rewrite_query(
            "SELECT u.k, u.v FROM mv1 JOIN mv2 ON mv1.symbol = mv2.symbol "
            "CROSS JOIN UNNEST(attrs) AS u (k, v)"
        )
        assert "inline(attrs)" in out
        # Qualified spelling disambiguates -> explode().
        out = rewrite_query(
            "SELECT u.k, u.v FROM mv1 JOIN mv2 ON mv1.symbol = mv2.symbol "
            "CROSS JOIN UNNEST(mv1.attrs) AS u (k, v)"
        )
        assert "explode(mv1.attrs)" in out
        # Unqualified but UNIQUE across the referenced tables -> explode().
        out = rewrite_query(
            "SELECT u.k, u.v FROM mv1 JOIN mv3 ON mv1.symbol = mv3.symbol2 "
            "CROSS JOIN UNNEST(attrs) AS u (k, v)"
        )
        assert "explode(attrs)" in out
    finally:
        for v in ("mv1", "mv2", "mv3"):
            spark.catalog.dropTempView(v)


def test_unnest_computed_map_expression_resolves(spark):
    """A COMPUTED map expression (map_filter, map_from_entries, ...)
    resolves via the analysis-only probe projection and emits explode();
    a computed ARRAY-OF-ROWS expression keeps inline() (round-10
    "What's missing #2")."""
    spark.sql(
        "SELECT 'A' AS symbol, map('k', 1, 'j', 0) AS attrs, "
        "array(named_struct('f1', 1, 'f2', 2)) AS pairs"
    ).createOrReplaceTempView("mapv")
    try:
        out = rewrite_query(
            "SELECT u.k, u.v FROM mapv CROSS JOIN "
            "UNNEST(map_filter(attrs, (k, x) -> x > 0)) AS u (k, v)"
        )
        assert "explode(map_filter(attrs, (k, x) -> x > 0))" in out
        # Alias-qualified computed expression, probe keeps the alias.
        out = rewrite_query(
            "SELECT u.k, u.v FROM mapv m CROSS JOIN "
            "UNNEST(map_filter(m.attrs, (k, x) -> x > 0)) AS u (k, v)"
        )
        assert "explode(map_filter(m.attrs, (k, x) -> x > 0))" in out
        # Computed array-of-rows stays inline().
        out = rewrite_query(
            "SELECT u.f1, u.f2 FROM mapv CROSS JOIN "
            "UNNEST(slice(pairs, 1, 1)) AS u (f1, f2)"
        )
        assert "inline(slice(pairs, 1, 1))" in out
        # Unresolvable expression (unknown function) -> inline(), no raise.
        out = rewrite_query(
            "SELECT u.a, u.b FROM mapv CROSS JOIN "
            "UNNEST(no_such_fn(attrs)) AS u (a, b)"
        )
        assert "inline(no_such_fn(attrs))" in out
    finally:
        spark.catalog.dropTempView("mapv")


def test_unnest_computed_map_end_to_end(spark, tmp_path):
    """Transform execution: UNNEST over map_filter(attrs, ...) expands
    only the surviving entries (the computed expression resolves MAP via
    the probe, so the rewrite emits explode(), yielding (k, v) pairs)."""
    path = str(tmp_path / "in" / "m1.parquet")
    _attrs_slice(
        path,
        [
            (0, 0, ts(1), ts(1, 1), "A", [("k1", 1), ("k2", 0), ("k3", 2)]),
        ],
    )
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT event_time, symbol, u.k AS k, u.v AS v FROM tickers "
                "CROSS JOIN UNNEST(map_filter(attrs, (k, x) -> x > 0)) "
                "AS u (k, v)",
                None,
            )
        ],
    )
    _, out = runner.run(
        [{"alias": "tickers", "schema_file": path, "data_paths": [path],
          "watermark": ts(1, 1)}],
        system_time=ts(3),
    )
    got = sorted(
        (r.k, r.v) for r in spark.read.parquet(out).collect()
    )
    assert got == [("k1", 1), ("k3", 2)]


def test_unnest_rejects():
    with pytest.raises(InvalidQueryError, match="alias"):
        rewrite_query("SELECT * FROM e CROSS JOIN UNNEST(a)")
    with pytest.raises(InvalidQueryError, match="ON TRUE"):
        rewrite_query("SELECT * FROM e LEFT JOIN UNNEST(a) AS u (x)")
    # WITH ORDINALITY over an array of rows whose type cannot resolve
    # (table e is unregistered) rejects loudly with the decomposition.
    with pytest.raises(InvalidQueryError, match="ORDINALITY"):
        rewrite_query(
            "SELECT * FROM e CROSS JOIN UNNEST(a) WITH ORDINALITY "
            "AS u (f1, f2, f3, i)"
        )


def test_unnest_with_ordinality_rewrites():
    """WITH ORDINALITY (beyond Flink-1.16 parity): the rewrite
    pre-packages 1-based positions via an index lambda — arrays give
    (value, ord), the OUTER spelling null-pads ordinality too."""
    out = rewrite_query(
        "SELECT u.x, u.i FROM e CROSS JOIN UNNEST(arr) "
        "WITH ORDINALITY AS u (x, i)"
    )
    assert (
        "LATERAL VIEW inline(transform(arr, (v, i) -> "
        "struct(v, cast(i + 1 as bigint)))) u AS x, i" in out
    )
    out = rewrite_query(
        "SELECT u.x, u.i FROM e LEFT JOIN UNNEST(arr) "
        "WITH ORDINALITY AS u (x, i) ON TRUE"
    )
    assert "LATERAL VIEW OUTER inline(" in out


def test_unnest_with_ordinality_map_and_rows(spark):
    """Map argument -> (key, value, ord) in map_entries order; array of
    rows resolves its field names against the registered view schema ->
    fields + ord."""
    spark.sql(
        "SELECT 'A' AS symbol, map('k', 1, 'j', 2) AS attrs, "
        "array(named_struct('f1', 1, 'f2', 'x')) AS pairs"
    ).createOrReplaceTempView("ordv")
    try:
        out = rewrite_query(
            "SELECT u.k, u.v, u.i FROM ordv CROSS JOIN UNNEST(attrs) "
            "WITH ORDINALITY AS u (k, v, i)"
        )
        assert "map_entries(attrs)" in out and "e.key, e.value" in out
        out = rewrite_query(
            "SELECT u.f1, u.f2, u.i FROM ordv CROSS JOIN UNNEST(pairs) "
            "WITH ORDINALITY AS u (f1, f2, i)"
        )
        assert "struct(r.`f1`, r.`f2`, cast(i + 1 as bigint))" in out
        # Alias-count mismatch against the resolved row type: loud.
        with pytest.raises(InvalidQueryError, match="ORDINALITY"):
            rewrite_query(
                "SELECT * FROM ordv CROSS JOIN UNNEST(pairs) "
                "WITH ORDINALITY AS u (f1, f2, f3, i)"
            )
    finally:
        spark.catalog.dropTempView("ordv")


def test_unnest_with_ordinality_end_to_end(spark, tmp_path):
    """Transform execution: ordinality is 1-based array position; an
    empty array survives the LEFT JOIN .. ON TRUE spelling with NULL
    value AND NULL ordinality."""
    slice1 = str(tmp_path / "in" / "ord1.parquet")
    write_input_slice(
        slice1,
        {
            "offset": [0, 1],
            "op": [0, 0],
            "system_time": [ts(1), ts(1)],
            "event_time": [ts(1, 1), ts(1, 2)],
            "symbol": ["A", "B"],
            "tags": [["x", "y", "z"], []],
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "symbol": pa.string(),
            "tags": pa.list_(pa.string()),
        },
    )
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT event_time, symbol, u.tag AS tag, u.pos AS pos "
                "FROM tickers LEFT JOIN UNNEST(tags) WITH ORDINALITY "
                "AS u (tag, pos) ON TRUE",
                None,
            )
        ],
    )
    _, out = runner.run(
        [{"alias": "tickers", "schema_file": slice1, "data_paths": [slice1],
          "watermark": ts(1, 2)}],
        system_time=ts(2),
    )
    rows = sorted(
        (r.symbol, r.tag, r.pos)
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [
        ("A", "x", 1), ("A", "y", 2), ("A", "z", 3), ("B", None, None)
    ]


def test_unnest_classification():
    views = {"events", "purchases"}
    assert (
        classify(
            "SELECT event_time, u.x FROM events "
            "CROSS JOIN UNNEST(ARRAY[value]) AS u (x)",
            views,
        )
        == MAP
    )
    # UNNEST's JOIN keyword must not count as a stream join; but a REAL
    # stream join in the same step would need executor composition the
    # fixed-shape parsers don't do -> loud reject with the decomposition.
    with pytest.raises(InvalidQueryError, match="own step"):
        classify(
            "SELECT p.event_time, u.x FROM purchases p "
            "JOIN events e ON p.user_id = e.user_id "
            "CROSS JOIN UNNEST(ARRAY[p.value]) AS u (x)",
            views,
        )


def _tag_slice(path, rows):
    """rows: (offset, op, system_time, event_time, symbol, tags_csv)"""
    cols = list(zip(*rows)) if rows else [[]] * 6
    write_input_slice(
        path,
        {
            "offset": list(cols[0]),
            "op": list(cols[1]),
            "system_time": list(cols[2]),
            "event_time": list(cols[3]),
            "symbol": list(cols[4]),
            "tags": list(cols[5]),
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "symbol": pa.string(),
            "tags": pa.string(),
        },
    )


def test_unnest_transform_map(spark, tmp_path):
    """CROSS JOIN UNNEST over a split() array inside a transform MAP step:
    one output row per array element, op/system columns stamped."""
    slice1 = str(tmp_path / "in" / "s1.parquet")
    _tag_slice(
        slice1,
        [
            (0, 0, ts(1), ts(1, 1), "A", "red,hot"),
            (1, 0, ts(1), ts(1, 2), "B", "blue"),
        ],
    )
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT event_time, symbol, u.tag AS tag "
                "FROM tickers CROSS JOIN UNNEST(split(tags, ',')) AS u (tag)",
                None,
            )
        ],
    )
    _, out_path = runner.run(
        [{"alias": "tickers", "schema_file": slice1, "data_paths": [slice1],
          "watermark": ts(1, 2)}],
        system_time=ts(2),
    )
    rows = sorted(
        (r.symbol, r.tag) for r in spark.read.parquet(out_path).collect()
    )
    assert rows == [("A", "hot"), ("A", "red"), ("B", "blue")]


def test_unnest_left_join_on_true_keeps_empty(spark, tmp_path):
    """LEFT JOIN UNNEST .. ON TRUE: a row whose array is empty survives
    with a NULL element (Flink semantics; Spark's LATERAL VIEW OUTER)."""
    slice1 = str(tmp_path / "in" / "s1.parquet")
    _tag_slice(
        slice1,
        [
            (0, 0, ts(1), ts(1, 1), "A", "x,y"),
            (1, 0, ts(1), ts(1, 2), "B", ""),
        ],
    )
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT event_time, symbol, u.tag AS tag FROM tickers "
                "LEFT JOIN UNNEST(CASE WHEN tags = '' THEN ARRAY() "
                "ELSE split(tags, ',') END) AS u (tag) ON TRUE",
                None,
            )
        ],
    )
    _, out_path = runner.run(
        [{"alias": "tickers", "schema_file": slice1, "data_paths": [slice1],
          "watermark": ts(1, 2)}],
        system_time=ts(2),
    )
    rows = sorted(
        (r.symbol, r.tag)
        for r in spark.read.parquet(out_path).collect()
    )
    assert rows == [("A", "x"), ("A", "y"), ("B", None)]


def _attrs_slice(path, rows):
    """rows: (offset, op, system_time, event_time, symbol, attrs) where
    attrs is a list of (key, value) pairs, [] for empty, None for NULL."""
    cols = list(zip(*rows)) if rows else [[]] * 6
    write_input_slice(
        path,
        {
            "offset": list(cols[0]),
            "op": list(cols[1]),
            "system_time": list(cols[2]),
            "event_time": list(cols[3]),
            "symbol": list(cols[4]),
            "attrs": list(cols[5]),
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "symbol": pa.string(),
            "attrs": pa.map_(pa.string(), pa.int64()),
        },
    )


def test_unnest_map_transform(spark, tmp_path):
    """CROSS JOIN UNNEST over a MAP column in a transform step: one row
    per entry; empty and NULL maps drop (inner semantics)."""
    slice1 = str(tmp_path / "in" / "s1.parquet")
    _attrs_slice(
        slice1,
        [
            (0, 0, ts(1), ts(1, 1), "A", [("x", 1), ("y", 2)]),
            (1, 0, ts(1), ts(1, 2), "B", []),
            (2, 0, ts(1), ts(1, 3), "C", None),
        ],
    )
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT event_time, symbol, u.k AS k, u.v AS v FROM tickers "
                "CROSS JOIN UNNEST(attrs) AS u (k, v)",
                None,
            )
        ],
    )
    _, out_path = runner.run(
        [{"alias": "tickers", "schema_file": slice1, "data_paths": [slice1],
          "watermark": ts(1, 3)}],
        system_time=ts(2),
    )
    rows = sorted(
        (r.symbol, r.k, r.v) for r in spark.read.parquet(out_path).collect()
    )
    assert rows == [("A", "x", 1), ("A", "y", 2)]


def test_unnest_map_left_join_keeps_empty(spark, tmp_path):
    """LEFT JOIN UNNEST(map) ON TRUE: rows with empty/NULL maps survive
    with NULL key/value (Flink's ON TRUE contract, LATERAL VIEW OUTER)."""
    slice1 = str(tmp_path / "in" / "s1.parquet")
    _attrs_slice(
        slice1,
        [
            (0, 0, ts(1), ts(1, 1), "A", [("x", 1)]),
            (1, 0, ts(1), ts(1, 2), "B", []),
            (2, 0, ts(1), ts(1, 3), "C", None),
        ],
    )
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT event_time, symbol, u.k AS k, u.v AS v FROM tickers "
                "LEFT JOIN UNNEST(attrs) AS u (k, v) ON TRUE",
                None,
            )
        ],
    )
    _, out_path = runner.run(
        [{"alias": "tickers", "schema_file": slice1, "data_paths": [slice1],
          "watermark": ts(1, 3)}],
        system_time=ts(2),
    )
    rows = sorted(
        (r.symbol, r.k, r.v) for r in spark.read.parquet(out_path).collect()
    )
    assert rows == [("A", "x", 1), ("B", None, None), ("C", None, None)]


def test_unnest_map_over_step_alias(spark, tmp_path):
    """UNNEST(map) over a MID-CHAIN step alias: the two-column rewrite
    resolves the DERIVED view's schema (registered by the previous
    step), not just raw inputs."""
    slice1 = str(tmp_path / "in" / "s1.parquet")
    from .helpers import ticker_slice

    ticker_slice(
        slice1,
        [(0, 0, ts(1), ts(1, 1), "A", 2.0), (1, 0, ts(1), ts(1, 2), "B", 3.0)],
    )
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT event_time, symbol, "
                "map('sym', symbol, 'p', cast(cast(price as int) as string)) "
                "AS attrs FROM tickers",
                "mv",
            ),
            (
                "SELECT event_time, symbol, u.k AS k, u.v AS v FROM mv "
                "CROSS JOIN UNNEST(attrs) AS u (k, v)",
                None,
            ),
        ],
    )
    _, out_path = runner.run(
        [{"alias": "tickers", "schema_file": slice1, "data_paths": [slice1],
          "watermark": ts(1, 2)}],
        system_time=ts(2),
    )
    rows = sorted(
        (r.symbol, r.k, r.v) for r in spark.read.parquet(out_path).collect()
    )
    assert rows == [
        ("A", "p", "2"), ("A", "sym", "A"),
        ("B", "p", "3"), ("B", "sym", "B"),
    ]


def test_unnest_array_of_rows_inline(spark, tmp_path):
    """Multi-column UNNEST alias (array of rows) -> inline(): each row
    struct flattens into the aliased columns."""
    path = str(tmp_path / "in" / "s1.parquet")
    struct_t = pa.struct([("k", pa.string()), ("v", pa.int64())])
    write_input_slice(
        path,
        {
            "offset": [0],
            "op": [0],
            "system_time": [ts(1)],
            "event_time": [ts(1, 1)],
            "pairs": [[{"k": "a", "v": 1}, {"k": "b", "v": 2}]],
        },
        {
            "offset": pa.int64(),
            "op": pa.int32(),
            "system_time": pa.timestamp("ms", tz="UTC"),
            "event_time": pa.timestamp("ms", tz="UTC"),
            "pairs": pa.list_(struct_t),
        },
    )
    runner = TransformRunner(
        spark,
        str(tmp_path),
        [
            (
                "SELECT event_time, u.k AS k, u.v AS v FROM src "
                "CROSS JOIN UNNEST(pairs) AS u (k, v)",
                None,
            )
        ],
    )
    _, out_path = runner.run(
        [{"alias": "src", "schema_file": path, "data_paths": [path],
          "watermark": ts(1, 1)}],
        system_time=ts(2),
    )
    rows = sorted(
        (r.k, r.v) for r in spark.read.parquet(out_path).collect()
    )
    assert rows == [("a", 1), ("b", 2)]
