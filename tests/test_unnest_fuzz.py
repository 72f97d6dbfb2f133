"""Property test for the UNNEST rewriter (round-11 verdict ask #4).

Same pattern as test_setop.test_parse_setop_tree_matches_duckdb: random
queries through the load-bearing text transform, checked against an
INDEPENDENT oracle — here a pure-Python expansion of Flink's UNNEST
semantics over the same generated data, covering the full grammar the
rewriter claims: {CROSS JOIN, comma, LEFT JOIN .. ON TRUE} x {plain,
WITH ORDINALITY} x {array column, computed array expression with nested
parens and literals containing 'UNNEST(', map column, array-of-rows
column}, random alias/column names, optional AS, and multiple UNNEST
clauses per query (cross-product semantics; OUTER null-pads empties).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kamu_engine_flink_spark.plans.dialect import rewrite_query

# identifiers that are safe in both the rewriter and Spark SQL
_IDENT = st.sampled_from(
    ["u", "zz", "q1", "tbl_x", "expAnd", "unnest_ish", "U2"]
)

# one clause = (source, style, ordinality)
_SOURCE = st.sampled_from(["arr", "computed", "lit_split", "map", "rows"])
_STYLE = st.sampled_from(["cross", "comma", "left"])


@st.composite
def _clauses(draw):
    n = draw(st.integers(min_value=1, max_value=2))
    out = []
    names = draw(
        st.lists(_IDENT, min_size=n, max_size=n, unique=True)
    )
    for i in range(n):
        out.append(
            {
                "source": draw(_SOURCE),
                "style": draw(_STYLE),
                "ord": draw(st.booleans()),
                "alias": names[i],
                "as_kw": draw(st.booleans()),
            }
        )
    return out


_ROW = st.tuples(
    st.lists(st.integers(min_value=0, max_value=3), max_size=3),  # arr
    st.lists(st.sampled_from(["a", "b", "cc"]), max_size=2),  # tag tokens
    st.dictionaries(  # map, <=1 entry so entry order never matters
        st.sampled_from(["k1", "k2"]),
        st.integers(min_value=0, max_value=5),
        max_size=1,
    ),
    st.lists(  # rows: array<struct<a int, b string>>
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.sampled_from(["p", "q"]),
        ),
        max_size=2,
    ),
)


def _clause_sql(c, base: str) -> tuple[str, list[str]]:
    src = {
        "arr": f"{base}.arr",
        "computed": f"slice({base}.arr, 1, size({base}.arr))",
        "lit_split": "split('a,UNNEST(b,c', ',')",
        "map": f"{base}.m",
        "rows": f"{base}.rws",
    }[c["source"]]
    base_cols = {
        "arr": ["v"],
        "computed": ["v"],
        "lit_split": ["v"],
        "map": ["k", "v"],
        "rows": ["fa", "fb"],
    }[c["source"]]
    cols = [f"{c['alias']}_{x}" for x in base_cols]
    if c["ord"]:
        cols.append(f"{c['alias']}_o")
    alias = c["alias"]
    as_kw = "AS " if c["as_kw"] else ""
    body = f"UNNEST({src})"
    if c["ord"]:
        body += " WITH ORDINALITY"
    body += f" {as_kw}{alias} ({', '.join(cols)})"
    lead = {"cross": " CROSS JOIN ", "comma": ", ", "left": " LEFT JOIN "}[
        c["style"]
    ]
    tail = " ON TRUE" if c["style"] == "left" else ""
    return lead + body + tail, [f"{alias}.{col}" for col in cols]


def _expand(c, row) -> list[tuple]:
    """Python oracle: the tuples one clause yields for one base row."""
    arr, tags, m, rws = row
    if c["source"] in ("arr", "computed"):
        items = [(v,) for v in arr]
    elif c["source"] == "lit_split":
        items = [("a",), ("UNNEST(b",), ("c",)]
    elif c["source"] == "map":
        items = [(k, v) for k, v in m.items()]
    else:
        items = [(a, b) for a, b in rws]
    if c["ord"]:
        items = [t + (i + 1,) for i, t in enumerate(items)]
    if not items:
        ncols = len(_clause_sql(c, "fz")[1])
        return [(None,) * ncols] if c["style"] == "left" else []
    return items


@settings(max_examples=30, deadline=None)
@given(
    clauses=_clauses(),
    rows=st.lists(_ROW, min_size=1, max_size=3),
    with_lit=st.booleans(),
)
def test_unnest_rewrite_matches_python_oracle(spark, clauses, rows, with_lit):
    data = [
        (i, arr, ",".join(tags), m, rws)
        for i, (arr, tags, m, rws) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "id int, arr array<int>, tags string, m map<string,int>, "
        "rws array<struct<a: int, b: string>>",
    )
    df.createOrReplaceTempView("fz")
    try:
        select = ["fz.id"]
        if with_lit:
            # adversarial literal the rewriter must never touch
            select.append("'x CROSS JOIN UNNEST(q) AS w (v)' AS lit")
        from_sql = "fz"
        all_cols = []
        for c in clauses:
            frag, cols = _clause_sql(c, "fz")
            from_sql += frag
            all_cols.extend(cols)
        select.extend(all_cols)
        sql = f"SELECT {', '.join(select)} FROM {from_sql}"
        rewritten = rewrite_query(sql)
        assert "UNNEST(q)" in rewritten if with_lit else True
        got = sorted(
            tuple(r) for r in spark.sql(rewritten).collect()
        )

        expected = []
        for i, row in enumerate(rows):
            parts = [[(i,)]]
            if with_lit:
                parts.append([("x CROSS JOIN UNNEST(q) AS w (v)",)])
            dropped = False
            for c in clauses:
                exp = _expand(c, row)
                if not exp:
                    dropped = True
                    break
                parts.append(exp)
            if dropped:
                continue
            combos = [()]
            for p in parts:
                combos = [c0 + t for c0 in combos for t in p]
            expected.extend(combos)
        assert got == sorted(expected), f"\nsql={sql}\nrewritten={rewritten}"
    finally:
        spark.catalog.dropTempView("fz")
