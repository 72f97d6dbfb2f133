"""Flink-SQL -> Spark-SQL dialect rewriting.

The reference delegates all SQL to Flink's planner; its *documented and
tested* query surface (SURVEY.md §2.B) uses a handful of Flink-specific
constructs that Spark SQL spells differently. The ODF `queries` list gives
clean interception points, so a syntactic pre-processor suffices — no
Catalyst extension needed. Everything not matched below passes through
untouched to Spark SQL (whose builtin library is the equivalent of the
Flink builtin surface, SURVEY.md §2.B "string/date/math function library").

Rewrites:
  TUMBLE(ts, INTERVAL 'n' UNIT)        -> window(ts, 'n unit')     [GROUP BY]
  TUMBLE_START(ts, ...)/TUMBLE_END(..) -> window.start / window.end
  HOP(ts, INTERVAL slide, INTERVAL size) -> window(ts, size, slide)
  HOP_START/HOP_END                    -> window.start / window.end
  SESSION(ts, INTERVAL gap)            -> session_window(ts, gap)
  SESSION_START/SESSION_END            -> session_window.start / .end
  (HOP/SESSION are BEYOND-reference Flink SQL spellings — the reference
  supports TUMBLE only (README "Does not support month/quarter/year
  tumbling windows"); accepted here on the batch/raw-query path so Flink
  SQL users keep their hopping/session queries. The incremental transform
  runner's cross-run window state covers TUMBLE, reference parity;
  always-on hopping/session state is streaming/structured.py.)
  CAST(x AS TIMESTAMP(p))              -> CAST(x AS TIMESTAMP)
  current_watermark(col)               -> TIMESTAMP 'w' literal (engine state)
  t FOR SYSTEM_TIME AS OF p.ts AS a    -> <t>__versions a + validity preds
  , LATERAL TABLE (t(p.ts)) AS a       -> JOIN <t>__versions a ON validity

Temporal rewrites target the `<name>__versions` views the transform engine
registers for declared temporal tables (operators/asof_join.py): each
version carries [__valid_from, __valid_to) computed from the next version
of the same primary key, which turns Flink's temporal-table-function join
(README.md "Temporal Table Joins") into a plain range join Catalyst can
plan (and broadcast when the versioned side is small).
"""

from __future__ import annotations

import re
from datetime import datetime

_UNIT_MAP = {
    "SECOND": "second",
    "MINUTE": "minute",
    "HOUR": "hour",
    "DAY": "day",
    "WEEK": "week",
}

VALID_FROM = "__valid_from"
VALID_TO = "__valid_to"
VERSIONS_SUFFIX = "__versions"

_TUMBLE_RE = re.compile(
    r"(?<![\w.])TUMBLE(_START|_END)?\s*\(\s*([`\w.]+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)",
    re.IGNORECASE,
)
_HOP_RE = re.compile(
    r"(?<![\w.])HOP(_START|_END)?\s*\(\s*([`\w.]+)\s*,"
    r"\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)",
    re.IGNORECASE,
)
_SESSION_RE = re.compile(
    r"(?<![\w.])SESSION(_START|_END)?\s*\(\s*([`\w.]+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)",
    re.IGNORECASE,
)
_TS_PRECISION_RE = re.compile(r"\bTIMESTAMP\s*\(\s*\d\s*\)", re.IGNORECASE)
_CURRENT_WM_RE = re.compile(r"current_watermark\s*\(\s*[`\w.]*\s*\)", re.IGNORECASE)
_KEYWORD_GUARD = r"(?!(?:ON|WHERE|JOIN|LEFT|RIGHT|FULL|INNER|CROSS|GROUP|ORDER|HAVING|UNION|LIMIT|AS)\b)"
_SYSTEM_TIME_JOIN_RE = re.compile(
    r"([`\w.]+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+([`\w.]+)"
    r"(?:\s+AS\s+([`\w]+)|\s+" + _KEYWORD_GUARD + r"([`\w]+))?",
    re.IGNORECASE,
)
_LATERAL_RE = re.compile(
    r",\s*LATERAL\s+TABLE\s*\(\s*([`\w.]+)\s*\(\s*([`\w.]+)\s*\)\s*\)"
    r"(?:\s+AS\s+([`\w]+)|\s+" + _KEYWORD_GUARD + r"([`\w]+))?",
    re.IGNORECASE,
)


def _interval_to_duration(n: str, unit: str) -> str:
    u = _UNIT_MAP.get(unit.upper())
    if u is None:
        raise ValueError(f"unsupported TUMBLE interval unit: {unit}")
    return f"{n} {u}"


def _rewrite_tumble(sql: str) -> str:
    def repl(m: re.Match) -> str:
        suffix, col, n, unit = m.groups()
        dur = _interval_to_duration(n, unit)
        if suffix is None:
            return f"window({col}, '{dur}')"
        return "window.start" if suffix.upper() == "_START" else "window.end"

    return _TUMBLE_RE.sub(repl, sql)


def _rewrite_hop(sql: str) -> str:
    """Flink argument order is (time, slide, size); Spark window() takes
    (time, size, slide)."""

    def repl(m: re.Match) -> str:
        suffix, col, slide_n, slide_u, size_n, size_u = m.groups()
        if suffix is None:
            size = _interval_to_duration(size_n, size_u)
            slide = _interval_to_duration(slide_n, slide_u)
            return f"window({col}, '{size}', '{slide}')"
        return "window.start" if suffix.upper() == "_START" else "window.end"

    return _HOP_RE.sub(repl, sql)


def _rewrite_session(sql: str) -> str:
    def repl(m: re.Match) -> str:
        suffix, col, n, unit = m.groups()
        if suffix is None:
            return f"session_window({col}, '{_interval_to_duration(n, unit)}')"
        return (
            "session_window.start" if suffix.upper() == "_START" else "session_window.end"
        )

    return _SESSION_RE.sub(repl, sql)


def _validity_pred(alias: str, time_expr: str) -> str:
    return (
        f"{alias}.{VALID_FROM} <= {time_expr}"
        f" AND ({time_expr} < {alias}.{VALID_TO} OR {alias}.{VALID_TO} IS NULL)"
    )


def _rewrite_system_time_join(sql: str) -> str:
    """`JOIN t FOR SYSTEM_TIME AS OF p.ts [AS] a ON <cond>` ->
    `JOIN t__versions a ON <validity> AND <cond>`
    (EngineJoinStreamToTemporalTableTest.scala:301-341)."""
    while True:
        m = _SYSTEM_TIME_JOIN_RE.search(sql)
        if not m:
            return sql
        table, time_expr, a1, a2 = m.groups()
        alias = a1 or a2 or table
        versions = table.strip("`") + VERSIONS_SUFFIX
        replacement = f"{versions} AS {alias}"
        rest = sql[m.end() :]
        on_match = re.match(r"(\s+ON\s+)", rest, re.IGNORECASE)
        pred = _validity_pred(alias, time_expr)
        if on_match:
            rest = rest[: on_match.end()] + f"{pred} AND " + rest[on_match.end() :]
        else:
            rest = f" ON {pred}" + rest
        sql = sql[: m.start()] + replacement + rest


def _rewrite_lateral(sql: str) -> str:
    """`FROM p t, LATERAL TABLE (tt(t.ts)) AS a WHERE ...` ->
    `FROM p t JOIN tt__versions AS a ON <validity> WHERE ...`
    (EngineJoinStreamToTemporalTableTest.scala:71-86). The user's equi
    condition stays in WHERE; Catalyst folds it into the join."""

    def repl(m: re.Match) -> str:
        table, time_expr, a1, a2 = m.groups()
        alias = a1 or a2 or table
        versions = table.strip("`") + VERSIONS_SUFFIX
        return f" JOIN {versions} AS {alias} ON {_validity_pred(alias, time_expr)}"

    return _LATERAL_RE.sub(repl, sql)


def rewrite_query(sql: str, *, watermark: datetime | None = None) -> str:
    """Rewrite one Flink-dialect SQL step into Spark SQL."""
    out = _rewrite_tumble(sql)
    out = _rewrite_hop(out)
    out = _rewrite_session(out)
    out = _TS_PRECISION_RE.sub("TIMESTAMP", out)
    if _CURRENT_WM_RE.search(out):
        if watermark is None:
            lit = "CAST(NULL AS TIMESTAMP)"
        else:
            lit = f"TIMESTAMP '{watermark.strftime('%Y-%m-%d %H:%M:%S.%f')[:-3]}'"
        out = _CURRENT_WM_RE.sub(lit, out)
    out = _rewrite_system_time_join(out)
    out = _rewrite_lateral(out)
    return out
