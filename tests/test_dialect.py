"""Dialect-rewrite unit tests (string-level, no SparkSession) plus an
engine-level current_watermark() run.

The reference exposes Flink SQL; our engine accepts the documented Flink
spellings (SURVEY.md §2.B) and rewrites them to Spark SQL
(plans/dialect.py). TUMBLE / LATERAL TABLE / FOR SYSTEM_TIME rewrites are
exercised end-to-end by test_window_agg / test_temporal_join; this file
pins the remaining constructs and the current_watermark() literal
injection (TopNTest.scala:55 uses it in the reference's changelog test).
"""

from datetime import datetime, timezone

from kamu_engine_flink_spark.plans.dialect import rewrite_query

from .helpers import TransformRunner, ticker_slice, ts


def test_tumble_rewrite():
    out = rewrite_query(
        "SELECT TUMBLE_START(event_time, INTERVAL '1' DAY) as t, sum(price) "
        "FROM x GROUP BY TUMBLE(event_time, INTERVAL '1' DAY)"
    )
    assert "SELECT window.start as t" in out
    assert "GROUP BY window(event_time, '1 day')" in out
    assert "TUMBLE" not in out


def test_hop_and_session_rewrite():
    out = rewrite_query(
        "SELECT HOP_START(ts, INTERVAL '1' HOUR, INTERVAL '2' HOUR) FROM x "
        "GROUP BY HOP(ts, INTERVAL '1' HOUR, INTERVAL '2' HOUR)"
    )
    assert "SELECT window.start" in out
    assert "GROUP BY window(ts, '2 hour', '1 hour')" in out
    out = rewrite_query(
        "SELECT SESSION_END(ts, INTERVAL '30' MINUTE) FROM x "
        "GROUP BY SESSION(ts, INTERVAL '30' MINUTE)"
    )
    assert "SELECT session_window.end" in out
    assert "GROUP BY session_window(ts, '30 minute')" in out


def test_timestamp_precision_stripped():
    out = rewrite_query("SELECT CAST(x AS TIMESTAMP(3)) FROM t")
    assert "TIMESTAMP(3)" not in out
    assert "CAST(x AS TIMESTAMP)" in out


def test_current_watermark_literal_injection():
    wm = datetime(2000, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
    out = rewrite_query("SELECT current_watermark(event_time) AS wm FROM t", watermark=wm)
    assert "TIMESTAMP '2000-01-02 03:04:05.000'" in out
    assert "current_watermark" not in out


def test_current_watermark_null_when_unset():
    out = rewrite_query("SELECT current_watermark(event_time) FROM t")
    assert "CAST(NULL AS TIMESTAMP)" in out


def test_passthrough_untouched():
    sql = "SELECT a, b FROM t WHERE a <> b ORDER BY a LIMIT 5"
    assert rewrite_query(sql) == sql


WM_QUERY = """SELECT
  event_time,
  symbol,
  current_watermark(event_time) as wm
FROM `in`"""


def test_current_watermark_through_engine(spark, tmp_path):
    """Engine run whose query projects current_watermark(): every output
    row carries the effective input watermark of the invocation."""
    runner = TransformRunner(spark, tmp_path, queries=[(WM_QUERY, None)])
    slice1 = str(tmp_path / "in" / "slice1.parquet")
    ticker_slice(
        slice1,
        [(0, 0, ts(5), ts(1), "A", 10), (1, 0, ts(5), ts(2), "B", 20)],
    )
    resp, out = runner.run(
        [{"alias": "in", "data_paths": [slice1], "schema_file": slice1, "watermark": ts(2)}],
        system_time=ts(10),
    )
    import pyarrow.parquet as pq

    rows = pq.read_table(out).to_pylist()
    assert len(rows) == 2
    for r in rows:
        assert r["wm"].replace(tzinfo=timezone.utc) == ts(2)
    assert resp.new_watermark == ts(2)


def test_cumulate_rewrite_shape():
    """CUMULATE -> (size-span window, __cum_end) grouping over an
    exploded-ends FROM-subquery; CUMULATE_START/END map to span start and
    the exploded end."""
    from kamu_engine_flink_spark.plans.dialect import rewrite_query as rq

    sql = (
        "SELECT CUMULATE_START(event_time, INTERVAL '1' HOUR, INTERVAL '4' HOUR) as s, "
        "CUMULATE_END(event_time, INTERVAL '1' HOUR, INTERVAL '4' HOUR) as e, "
        "count(*) as n FROM t "
        "GROUP BY CUMULATE(event_time, INTERVAL '1' HOUR, INTERVAL '4' HOUR)"
    )
    out = rq(sql)
    assert "window.start as s" in out
    assert "__cum_end as e" in out
    assert "GROUP BY window(event_time, '4 hour'), __cum_end" in out
    assert "explode(sequence(" in out and "FROM t) t" in out
    # non-CUMULATE queries pass through this rewrite untouched
    plain = "SELECT a FROM t WHERE b > 1"
    assert rq(plain) == plain


def test_window_tvf_matches_legacy_spellings(spark, tmp_path):
    """Flink 1.13+ windowing TVF spellings produce the same windows as
    the legacy group-window spellings for all three kinds."""
    from kamu_engine_flink_spark.plans.dialect import rewrite_query as rq

    rows = [
        (ts(1, 0, 15), 1.0),
        (ts(1, 0, 45), 2.0),
        (ts(1, 1, 30), 4.0),
        (ts(1, 3, 10), 8.0),
    ]
    spark.createDataFrame(rows, ["event_time", "v"]).createOrReplaceTempView("tvf_ev")
    pairs = [
        (
            """SELECT window_start, window_end, sum(v) as s FROM
TABLE(TUMBLE(TABLE tvf_ev, DESCRIPTOR(event_time), INTERVAL '1' HOUR))
GROUP BY window_start, window_end""",
            """SELECT TUMBLE_START(event_time, INTERVAL '1' HOUR) as window_start,
TUMBLE_END(event_time, INTERVAL '1' HOUR) as window_end, sum(v) as s
FROM tvf_ev GROUP BY TUMBLE(event_time, INTERVAL '1' HOUR)""",
        ),
        (
            """SELECT window_start, window_end, sum(v) as s FROM
TABLE(HOP(TABLE tvf_ev, DESCRIPTOR(event_time), INTERVAL '1' HOUR, INTERVAL '2' HOUR))
GROUP BY window_start, window_end""",
            """SELECT HOP_START(event_time, INTERVAL '1' HOUR, INTERVAL '2' HOUR) as window_start,
HOP_END(event_time, INTERVAL '1' HOUR, INTERVAL '2' HOUR) as window_end, sum(v) as s
FROM tvf_ev GROUP BY HOP(event_time, INTERVAL '1' HOUR, INTERVAL '2' HOUR)""",
        ),
        (
            """SELECT window_start, window_end, sum(v) as s FROM
TABLE(CUMULATE(TABLE tvf_ev, DESCRIPTOR(event_time), INTERVAL '1' HOUR, INTERVAL '4' HOUR))
GROUP BY window_start, window_end""",
            """SELECT CUMULATE_START(event_time, INTERVAL '1' HOUR, INTERVAL '4' HOUR) as window_start,
CUMULATE_END(event_time, INTERVAL '1' HOUR, INTERVAL '4' HOUR) as window_end, sum(v) as s
FROM tvf_ev GROUP BY CUMULATE(event_time, INTERVAL '1' HOUR, INTERVAL '4' HOUR)""",
        ),
    ]
    for tvf_sql, legacy_sql in pairs:
        tvf = sorted(map(tuple, spark.sql(rq(tvf_sql)).collect()))
        legacy = sorted(map(tuple, spark.sql(rq(legacy_sql)).collect()))
        assert tvf == legacy and len(tvf) > 0, tvf_sql


TVF_AGG_QUERY = """SELECT
  window_start as event_time,
  symbol as symbol,
  min(price) as `min`,
  max(price) as `max`
FROM TABLE(TUMBLE(TABLE `in`, DESCRIPTOR(event_time), INTERVAL '1' DAY))
GROUP BY window_start, symbol"""


def test_tvf_tumble_stateful_across_runs(spark, tmp_path):
    """The TVF TUMBLE spelling routes to the stateful window executor:
    run 1 emits only the closed day, run 2's late-window row merges into
    the open day before it flushes."""
    import pyarrow.parquet as pq

    runner = TransformRunner(spark, tmp_path, queries=[(TVF_AGG_QUERY, None)])
    s1 = str(tmp_path / "in" / "s1.parquet")
    ticker_slice(
        s1,
        [
            (0, 0, ts(5), ts(1, 1), "A", 10),
            (1, 0, ts(5), ts(2, 1), "A", 12),
        ],
    )
    resp, out = runner.run(
        [{"alias": "in", "data_paths": [s1], "schema_file": s1, "watermark": ts(2)}],
        system_time=ts(10),
    )
    rows = [
        (r["event_time"].replace(tzinfo=timezone.utc), r["symbol"], r["min"], r["max"])
        for r in pq.read_table(out).to_pylist()
    ]
    assert rows == [(ts(1), "A", 10, 10)]

    s2 = str(tmp_path / "in" / "s2.parquet")
    ticker_slice(s2, [(2, 0, ts(15), ts(2, 2), "A", 7)])
    resp, out = runner.run(
        [{"alias": "in", "data_paths": [s2], "schema_file": s2, "watermark": ts(3)}],
        system_time=ts(20),
    )
    rows = [
        (r["event_time"].replace(tzinfo=timezone.utc), r["symbol"], r["min"], r["max"])
        for r in pq.read_table(out).to_pylist()
    ]
    assert rows == [(ts(2), "A", 7, 12)]


def test_flink_scalar_function_rewrites():
    from kamu_engine_flink_spark.plans.dialect import rewrite_query as rq

    assert (
        rq("SELECT JSON_VALUE(props, '$.k') FROM t")
        == "SELECT get_json_object(props, '$.k') FROM t"
    )
    assert rq("SELECT PROCTIME() FROM t") == "SELECT current_timestamp() FROM t"
    assert (
        rq("SELECT TO_TIMESTAMP_LTZ(ms_col, 3) FROM t")
        == "SELECT timestamp_millis(ms_col) FROM t"
    )
    assert (
        rq("SELECT TO_TIMESTAMP_LTZ(s_col, 0) FROM t")
        == "SELECT timestamp_seconds(s_col) FROM t"
    )


def test_flink_scalar_rewrites_round3():
    from kamu_engine_flink_spark.plans.dialect import rewrite_query as rq

    assert (
        rq("SELECT JSON_QUERY(props, '$.tags') FROM t")
        == "SELECT get_json_object(props, '$.tags') FROM t"
    )
    assert (
        rq("SELECT x FROM t WHERE JSON_EXISTS(props, '$.k')")
        == "SELECT x FROM t WHERE (get_json_object(props, '$.k') IS NOT NULL)"
    )
    assert (
        rq("SELECT CURRENT_ROW_TIMESTAMP() FROM t")
        == "SELECT current_timestamp() FROM t"
    )
    # 0-based -> 1-based, literal delimiter regex-escaped through BOTH the
    # SQL-string and regex escaping levels
    assert (
        rq("SELECT SPLIT_INDEX(host, '.', 1) FROM t")
        == "SELECT try_element_at(split(host, '\\\\.'), 2) FROM t"
    )
    assert (
        rq("SELECT SPLIT_INDEX(csv, ',', 0) FROM t")
        == "SELECT try_element_at(split(csv, ','), 1) FROM t"
    )
    # column delimiter passes through un-escaped
    assert (
        rq("SELECT SPLIT_INDEX(s, sep_col, 2) FROM t")
        == "SELECT try_element_at(split(s, sep_col), 3) FROM t"
    )
    assert (
        rq("SELECT RAND_INTEGER(10) FROM t")
        == "SELECT CAST(FLOOR(RAND() * (10)) AS INT) FROM t"
    )


def test_flink_scalar_rewrites_advice_round4():
    """External-review fixes: non-literal SPLIT_INDEX index shifts to
    1-based in SQL; two-arg RAND_INTEGER(seed, bound) uses the BOUND (the
    seed cannot be honored and is dropped); calendar windows with n != 1
    reject via the engine's structured error, not a bare ValueError."""
    import pytest

    from kamu_engine_flink_spark.plans.classify import parse_tumble
    from kamu_engine_flink_spark.plans.dialect import rewrite_query as rq
    from kamu_engine_flink_spark.protocol.model import InvalidQueryError

    assert (
        rq("SELECT SPLIT_INDEX(s, ',', idx_col) FROM t")
        == "SELECT try_element_at(split(s, ','), ((idx_col) + 1)) FROM t"
    )
    assert (
        rq("SELECT SPLIT_INDEX(s, ',', n - 1) FROM t")
        == "SELECT try_element_at(split(s, ','), ((n - 1) + 1)) FROM t"
    )
    assert (
        rq("SELECT RAND_INTEGER(42, 10) FROM t")
        == "SELECT CAST(FLOOR(RAND() * (10)) AS INT) FROM t"
    )
    with pytest.raises(InvalidQueryError, match="INTERVAL '1'"):
        rq("SELECT TUMBLE_START(ts, INTERVAL '2' MONTH) FROM t")
    with pytest.raises(InvalidQueryError, match="INTERVAL '1'"):
        parse_tumble(
            "SELECT count(*) FROM t GROUP BY TUMBLE(ts, INTERVAL '3' QUARTER)"
        )


def test_split_index_executes_flink_semantics(spark):
    """End-to-end: literal-dot delimiter, 0-based index, NULL out-of-range
    (Flink SPLIT_INDEX contract) through a real Spark plan."""
    from kamu_engine_flink_spark.plans.dialect import rewrite_query as rq

    spark.createDataFrame(
        [("a.b.c",), ("nodots",)], "host string"
    ).createOrReplaceTempView("hosts_t")
    rows = spark.sql(
        rq("SELECT SPLIT_INDEX(host, '.', 1) AS second FROM hosts_t ORDER BY host")
    ).collect()
    assert [r.second for r in rows] == ["b", None]


def test_json_exists_executes(spark):
    from kamu_engine_flink_spark.plans.dialect import rewrite_query as rq

    spark.createDataFrame(
        [('{"k": 1}',), ('{"other": 2}',), (None,)], "props string"
    ).createOrReplaceTempView("props_t")
    rows = spark.sql(
        rq("SELECT count(*) AS n FROM props_t WHERE JSON_EXISTS(props, '$.k')")
    ).collect()
    assert rows[0].n == 1


def test_rowtime_rewrites():
    from kamu_engine_flink_spark.plans.dialect import rewrite_query as rq

    assert (
        rq("SELECT TUMBLE_ROWTIME(ts, INTERVAL '1' HOUR) FROM t")
        == "SELECT (window.end - INTERVAL 1 MILLISECOND) FROM t"
    )
    assert (
        rq("SELECT HOP_ROWTIME(ts, INTERVAL '1' HOUR, INTERVAL '2' HOUR) FROM t")
        == "SELECT (window.end - INTERVAL 1 MILLISECOND) FROM t"
    )
    assert (
        rq("SELECT SESSION_ROWTIME(ts, INTERVAL '30' MINUTE) FROM t")
        == "SELECT (session_window.end - INTERVAL 1 MILLISECOND) FROM t"
    )
    # calendar rowtime: month end - 1ms
    assert (
        rq("SELECT TUMBLE_ROWTIME(ts, INTERVAL '1' MONTH) FROM t")
        == "SELECT (date_trunc('MONTH', ts) + INTERVAL 1 MONTH - INTERVAL 1 MILLISECOND) FROM t"
    )


def test_convert_tz_rewrite(spark):
    """Flink CONVERT_TZ(string, tzFrom, tzTo) -> Spark to_utc/from_utc
    pair formatted back to Flink's string shape."""
    from kamu_engine_flink_spark.plans.dialect import rewrite_query

    sql = rewrite_query(
        "SELECT CONVERT_TZ('2000-01-01 00:00:00', 'UTC', 'America/New_York') as t"
    )
    assert "from_utc_timestamp" in sql and "CONVERT_TZ" not in sql
    row = spark.sql(sql).collect()[0]
    assert row["t"] == "1999-12-31 19:00:00"
