"""Round-13 ADVICE fixes, each with the advisor's exact failure scenario:

1. dialect.py comma-chain: `FROM a, UNNEST(...) u, b` must record table
   b — the scan now skips the expansion item instead of breaking, so the
   unqualified-uniqueness gate sees every referenced table.
2. temporal_join._pk_equated: equality to a literal (WHERE r.symbol =
   'AAPL') or between two probe-side tables no longer satisfies the
   partial-PK guard; the equality must plausibly involve the build
   table (its name or an alias, incl. the FOR SYSTEM_TIME / LATERAL
   TABLE alias positions).
3. bench.py: the all-entries tripwire pin is named suite_total — the
   metric now matches what it measures.
"""

from __future__ import annotations

import os

import pytest

from kamu_engine_flink_spark.operators.temporal_join import (
    _pk_equated,
    _require_full_pk_equality,
)
from kamu_engine_flink_spark.plans.dialect import _unnest_from_tables
from kamu_engine_flink_spark.protocol.model import InvalidQueryError


def test_comma_chain_continues_past_unnest():
    t = _unnest_from_tables(
        "SELECT * FROM a, UNNEST(a.tags) AS u(tag), b WHERE a.id = b.id"
    )
    assert t.get("a") == "a"
    assert t.get("b") == "b"


def test_comma_chain_past_unnest_with_ordinality_and_join():
    t = _unnest_from_tables(
        "SELECT * FROM a, UNNEST(a.tags) WITH ORDINALITY AS u(tag, ord), "
        "b JOIN c ON b.id = c.id"
    )
    assert {"a", "b", "c"} <= set(t)


def test_comma_chain_past_lateral_table():
    t = _unnest_from_tables(
        "SELECT * FROM probe, LATERAL TABLE (rates(probe.event_time)) AS "
        "r(symbol, rate), extra"
    )
    assert t.get("probe") == "probe"
    assert t.get("extra") == "extra"


def test_comma_chain_unnest_last_item_still_fine():
    t = _unnest_from_tables("SELECT * FROM a, UNNEST(a.tags) AS u(tag)")
    assert t.get("a") == "a"
    assert "u" not in t.values()


def test_pk_equated_rejects_literal_equality():
    assert not _pk_equated("WHERE r.symbol = 'AAPL'", "symbol")
    assert not _pk_equated("WHERE 'AAPL' = r.symbol", "symbol")
    assert not _pk_equated("WHERE r.symbol = 5", "symbol")
    assert not _pk_equated("WHERE r.symbol = NULL", "symbol")


def test_pk_equated_rejects_probe_probe_equality_when_build_known():
    quals = {"rates", "r"}
    assert not _pk_equated(
        "ON p1.symbol = p2.symbol", "symbol", build_quals=quals
    )
    assert _pk_equated("ON t.symbol = r.symbol", "symbol", build_quals=quals)
    assert _pk_equated("ON r.symbol = t.symbol", "symbol", build_quals=quals)
    # Literal against the build alias still rejected.
    assert not _pk_equated(
        "WHERE r.symbol = 'AAPL'", "symbol", build_quals=quals
    )
    # USING and unqualified-vs-identifier spellings keep working.
    assert _pk_equated("JOIN rates USING (symbol)", "symbol", build_quals=quals)
    assert _pk_equated("ON symbol = t.symbol", "symbol", build_quals=quals)


def test_require_full_pk_accepts_system_time_alias_spelling():
    sql = (
        "SELECT t.event_time, t.symbol, r.rate FROM tickers AS t JOIN "
        "rates FOR SYSTEM_TIME AS OF t.event_time AS r "
        "ON t.symbol = r.symbol"
    )
    _require_full_pk_equality(sql, "rates", ["symbol"])  # must not raise


def test_require_full_pk_rejects_literal_only_mention():
    sql = (
        "SELECT t.event_time, r.rate FROM tickers AS t JOIN "
        "rates FOR SYSTEM_TIME AS OF t.event_time AS r "
        "ON t.region = r.region WHERE r.symbol = 'AAPL'"
    )
    with pytest.raises(InvalidQueryError) as ei:
        _require_full_pk_equality(sql, "rates", ["region", "symbol"])
    assert "symbol" in str(ei.value)


def test_bench_pin_renamed_suite_total():
    src = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    ).read()
    assert '"suite_total"' in src
    # The old name may survive in the rename-documenting comment, but
    # never as a key or metric string.
    assert '"headline_queries_total"' not in src
