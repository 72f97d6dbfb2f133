"""Changelog-aware chained composition: a step consuming a
changelog-EMITTING alias (outer regular-join pads/retractions,
continuous-agg correction pairs).

Flink propagates retractions between chained views; here the continuous
(windowless) GROUP BY aggregation folds op 1/2 input rows as negative
contributions (plans/classify.changelog_fold_slice_sql), emits an op-1
delete when a key's last row retracts, and every OTHER step kind rejects
the updating input loudly (engine/transform.py guard) instead of
misreading correction rows as appends.
"""

import pyarrow.parquet as pq
import pytest

from kamu_engine_flink_spark.protocol.model import InvalidQueryError

from .helpers import TransformRunner, ticker_slice, ts

LEFT_JOIN = """SELECT a.event_time as event_time, a.symbol as symbol,
  a.price as a_price, b.price as b_price
FROM a LEFT JOIN b ON a.symbol = b.symbol"""

AGG_OVER_JOIN = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, count(*) as n_pairs, sum(b_price) as b_sum
FROM j GROUP BY symbol"""


def _rows(out):
    table = pq.read_table(out)
    return [
        (r["op"], r["symbol"], r["n_pairs"], r["b_sum"])
        for r in table.to_pylist()
    ]


def _fold(changelog):
    """Apply an op 0/1/2/3 ledger to a dict keyed by the group column."""
    state = {}
    for op, key, *vals in changelog:
        if op in (0, 3):
            state[key] = tuple(vals)
        elif op == 1:
            assert state.pop(key, None) is not None, f"retract of absent {key}"
        # op 2 (CorrectFrom) carries the old values; the op 3 overwrite
        # suffices for folding, but assert it matches the current state.
        elif op == 2:
            assert state.get(key) == tuple(vals), f"stale CorrectFrom for {key}"
    return state


def _two_stream_inputs(tmp_path, name, a_rows, b_rows, wm):
    a = str(tmp_path / "in" / f"a_{name}.parquet")
    b = str(tmp_path / "in" / f"b_{name}.parquet")
    ticker_slice(a, a_rows)
    ticker_slice(b, b_rows)
    return [
        {"alias": "a", "data_paths": [a] if a_rows else [], "schema_file": a,
         "watermark": wm},
        {"alias": "b", "data_paths": [b] if b_rows else [], "schema_file": b,
         "watermark": wm},
    ]


def test_left_join_into_continuous_agg_folds_pads(spark, tmp_path):
    """LEFT regular-join step -> continuous-agg step: the pad/retract
    lifecycle must fold so the final state equals the batch answer (a
    pad counted +1 retracts -1 when the real pair lands)."""
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (AGG_OVER_JOIN, None)]
    )
    changelog = []

    # Run 1: A pairs immediately; B pads (b_price NULL).
    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1",
            [(0, 0, ts(2), ts(1, 0, 1), "A", 10), (1, 0, ts(2), ts(1, 0, 2), "B", 20)],
            [(0, 0, ts(2), ts(1, 0, 3), "A", 7)],
            ts(1, 1, 0),
        ),
        system_time=ts(2),
    )
    changelog += _rows(out)
    assert sorted(_rows(out)) == [(0, "A", 1, 7), (0, "B", 1, None)]

    # Run 2: B's partner arrives — upstream retracts the pad and emits the
    # pair; downstream n_pairs is unchanged (+1-1) while b_sum corrects
    # NULL -> 5, exactly one op 2/3 pair.
    resp2, out2 = runner.run(
        _two_stream_inputs(
            tmp_path, "r2", [], [(1, 0, ts(3), ts(1, 0, 4), "B", 5)], ts(1, 2, 0)
        ),
        system_time=ts(3),
    )
    changelog += _rows(out2)
    assert _rows(out2) == [(2, "B", 1, None), (3, "B", 1, 5)]

    # Run 3: a second partner for A — two pairs now.
    resp3, out3 = runner.run(
        _two_stream_inputs(
            tmp_path, "r3", [], [(2, 0, ts(4), ts(1, 0, 5), "A", 3)], ts(1, 3, 0)
        ),
        system_time=ts(4),
    )
    changelog += _rows(out3)
    assert _rows(out3) == [(2, "A", 1, 7), (3, "A", 2, 10)]

    # Folded changelog == batch LEFT JOIN + GROUP BY over all the data.
    assert _fold([(op, k, n, s) for op, k, n, s in changelog]) == {
        "A": (2, 10),
        "B": (1, 5),
    }


def test_agg_into_agg_key_death_emits_delete(spark, tmp_path):
    """Continuous agg chained into a continuous agg (histogram of per-key
    counts): when the last key leaves a bucket, the bucket emits an op-1
    delete and its state row dies."""
    count_per_symbol = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, count(*) as n FROM a GROUP BY symbol"""
    histogram = """SELECT cast(now() as timestamp(3)) as event_time,
  n, count(*) as n_symbols FROM per_symbol GROUP BY n"""
    runner = TransformRunner(
        spark, tmp_path,
        queries=[(count_per_symbol, "per_symbol"), (histogram, None)],
    )

    def _hist_rows(out):
        table = pq.read_table(out)
        return [(r["op"], r["n"], r["n_symbols"]) for r in table.to_pylist()]

    a1 = str(tmp_path / "in" / "a1.parquet")
    ticker_slice(a1, [(0, 0, ts(2), ts(1, 0, 1), "A", 10)])
    resp, out = runner.run(
        [{"alias": "a", "data_paths": [a1], "schema_file": a1, "watermark": ts(1, 1, 0)}],
        system_time=ts(2),
    )
    # A has 1 event -> bucket n=1 holds 1 symbol.
    assert _hist_rows(out) == [(0, 1, 1)]

    # A's second event: upstream corrects A from n=1 to n=2; bucket n=1
    # empties (op-1 delete), bucket n=2 appears (op 0).
    a2 = str(tmp_path / "in" / "a2.parquet")
    ticker_slice(a2, [(1, 0, ts(3), ts(1, 0, 2), "A", 11)])
    resp2, out2 = runner.run(
        [{"alias": "a", "data_paths": [a2], "schema_file": a2, "watermark": ts(1, 2, 0)}],
        system_time=ts(3),
    )
    assert sorted(_hist_rows(out2)) == [(0, 2, 1), (1, 1, 1)]

    # B's first event revives bucket n=1 as a fresh op-0 append (its
    # state row died, so this must NOT be a correction).
    a3 = str(tmp_path / "in" / "a3.parquet")
    ticker_slice(a3, [(2, 0, ts(4), ts(1, 0, 3), "B", 12)])
    resp3, out3 = runner.run(
        [{"alias": "a", "data_paths": [a3], "schema_file": a3, "watermark": ts(1, 3, 0)}],
        system_time=ts(4),
    )
    assert _hist_rows(out3) == [(0, 1, 1)]


def test_max_over_changelog_histogram(spark, tmp_path):
    """max over an updating alias: a per-(key, value) count histogram
    state (Flink MaxWithRetractAggFunction map-state) recomputes the
    extremum when values arrive or retract; NULL pads keep the key alive
    with a NULL max."""
    agg = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, max(b_price) as b_max FROM j GROUP BY symbol"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (agg, None)]
    )

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["symbol"], r["b_max"]) for r in table.to_pylist()]

    # Run 1: A pads — key alive, histogram empty, max NULL.
    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10)], [], ts(1, 1, 0)
        ),
        system_time=ts(2),
    )
    assert _r(out) == [(0, "A", None)]

    # Run 2: partner 7 arrives — pad retracts, pair adds: max NULL -> 7.
    resp2, out2 = runner.run(
        _two_stream_inputs(
            tmp_path, "r2", [], [(0, 0, ts(3), ts(1, 0, 2), "A", 7)], ts(1, 2, 0)
        ),
        system_time=ts(3),
    )
    assert _r(out2) == [(2, "A", None), (3, "A", 7)]

    # Run 3: a SMALLER partner (3) — max unchanged, NOTHING emits.
    import os

    resp3, out3 = runner.run(
        _two_stream_inputs(
            tmp_path, "r3", [], [(1, 0, ts(4), ts(1, 0, 3), "A", 3)], ts(1, 3, 0)
        ),
        system_time=ts(4),
    )
    assert not os.path.exists(out3)

    # Run 4: a larger partner (12) — max corrects 7 -> 12.
    resp4, out4 = runner.run(
        _two_stream_inputs(
            tmp_path, "r4", [], [(2, 0, ts(5), ts(1, 0, 4), "A", 12)], ts(1, 4, 0)
        ),
        system_time=ts(5),
    )
    assert _r(out4) == [(2, "A", 7), (3, "A", 12)]


def test_max_survives_null_arg_only_touch(spark, tmp_path):
    """A key touched in a slice ONLY by NULL-arg rows (a NULL-valued join
    partner) must keep its histogram extremum: the histogram slice excludes
    NULL args, so the touched-keys probe must come from the ACCUMULATOR
    slice's key set, not the histogram delta's (advisor round-6 high #1)."""
    agg = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, max(b_price) as b_max FROM j GROUP BY symbol"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (agg, None)]
    )

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["symbol"], r["b_max"]) for r in table.to_pylist()]

    # Run 1: pair (A, 10, 7) — max 7, histogram {A: {7: 1}}.
    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1",
            [(0, 0, ts(2), ts(1, 0, 1), "A", 10)],
            [(0, 0, ts(2), ts(1, 0, 2), "A", 7)],
            ts(1, 1, 0),
        ),
        system_time=ts(2),
    )
    assert _r(out) == [(0, "A", 7)]

    # Run 2: a NULL-priced b row — j emits op-0 (A, 10, NULL). The key's
    # accumulator is touched but its histogram delta is empty (NULL arg):
    # max must STAY 7 and nothing emits.
    import os

    resp2, out2 = runner.run(
        _two_stream_inputs(
            tmp_path, "r2", [], [(1, 0, ts(3), ts(1, 0, 3), "A", None)],
            ts(1, 2, 0),
        ),
        system_time=ts(3),
    )
    assert not os.path.exists(out2), _r(out2)

    # Run 3: a larger partner — the correction's OLD value proves the
    # persisted state still says 7, not NULL.
    resp3, out3 = runner.run(
        _two_stream_inputs(
            tmp_path, "r3", [], [(2, 0, ts(4), ts(1, 0, 4), "A", 12)],
            ts(1, 3, 0),
        ),
        system_time=ts(4),
    )
    assert _r(out3) == [(2, "A", 7), (3, "A", 12)]


def test_min_max_retraction_removes_extremum(spark, tmp_path):
    """The value currently HOLDING the extremum retracts (an upstream
    correction moves a key's count): the histogram must drop it and the
    extremes must fall back to the surviving values."""
    count_per_symbol = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, count(*) as n FROM a GROUP BY symbol"""
    extremes = """SELECT cast(now() as timestamp(3)) as event_time,
  min(n) as min_n, max(n) as max_n FROM per_symbol"""
    runner = TransformRunner(
        spark, tmp_path,
        queries=[(count_per_symbol, "per_symbol"), (extremes, None)],
    )

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["min_n"], r["max_n"]) for r in table.to_pylist()]

    a1 = str(tmp_path / "in" / "a1.parquet")
    ticker_slice(a1, [(0, 0, ts(2), ts(1, 0, 1), "A", 10)])
    resp, out = runner.run(
        [{"alias": "a", "data_paths": [a1], "schema_file": a1, "watermark": ts(1, 1, 0)}],
        system_time=ts(2),
    )
    assert _r(out) == [(0, 1, 1)]

    # A's count corrects 1 -> 2: the histogram's only value (1, both the
    # min AND the max) retracts — extremes recompute to (2, 2).
    a2 = str(tmp_path / "in" / "a2.parquet")
    ticker_slice(a2, [(1, 0, ts(3), ts(1, 0, 2), "A", 11)])
    resp2, out2 = runner.run(
        [{"alias": "a", "data_paths": [a2], "schema_file": a2, "watermark": ts(1, 2, 0)}],
        system_time=ts(3),
    )
    assert _r(out2) == [(2, 1, 1), (3, 2, 2)]

    # B's first event adds value 1 back: min falls to 1, max stays 2.
    a3 = str(tmp_path / "in" / "a3.parquet")
    ticker_slice(a3, [(2, 0, ts(4), ts(1, 0, 3), "B", 12)])
    resp3, out3 = runner.run(
        [{"alias": "a", "data_paths": [a3], "schema_file": a3, "watermark": ts(1, 3, 0)}],
        system_time=ts(4),
    )
    assert _r(out3) == [(2, 2, 2), (3, 1, 2)]


def test_map_over_changelog_forwards_ops(spark, tmp_path):
    """A plain projection over an updating alias forwards the op tags in
    emission order (Flink keeps RowKind through a projection): the pad's
    later retraction arrives as op 1, not a plain append."""
    runner = TransformRunner(
        spark, tmp_path,
        queries=[(LEFT_JOIN, "j"),
                 ("SELECT event_time, symbol, b_price FROM j", None)],
    )

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["symbol"], r["b_price"]) for r in table.to_pylist()]

    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10)], [], ts(1, 1, 0)
        ),
        system_time=ts(2),
    )
    assert _r(out) == [(0, "A", None)]

    # Partner arrives: the projected changelog must retract the pad
    # BEFORE the pair, op tags intact.
    resp2, out2 = runner.run(
        _two_stream_inputs(
            tmp_path, "r2", [], [(0, 0, ts(3), ts(1, 0, 2), "A", 7)], ts(1, 2, 0)
        ),
        system_time=ts(3),
    )
    assert _r(out2) == [(1, "A", None), (0, "A", 7)]


def test_where_over_changelog_filters_retractions(spark, tmp_path):
    """WHERE over an updating alias (op 0/1 path): the predicate applies
    to adds AND retracts alike — a pad that entered the filtered view
    must LEAVE it (op 1 forwards) when the upstream retracts the pad,
    and the replacing pair that fails the predicate must not enter."""
    runner = TransformRunner(
        spark, tmp_path,
        queries=[(LEFT_JOIN, "j"),
                 ("SELECT event_time, symbol, b_price FROM j "
                  "WHERE b_price IS NULL", None)],
    )

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["symbol"], r["b_price"]) for r in table.to_pylist()]

    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10)], [], ts(1, 1, 0)
        ),
        system_time=ts(2),
    )
    assert _r(out) == [(0, "A", None)]

    # Partner arrives: the pad's retraction passes the predicate (op 1
    # forwards — the row leaves the filtered view); the new pair fails
    # it and is dropped. The filtered view folds to empty.
    resp2, out2 = runner.run(
        _two_stream_inputs(
            tmp_path, "r2", [], [(0, 0, ts(3), ts(1, 0, 2), "A", 7)], ts(1, 2, 0)
        ),
        system_time=ts(3),
    )
    assert _r(out2) == [(1, "A", None)]


def test_where_over_changelog_rewrites_correction_pairs(spark, tmp_path):
    """WHERE over correction pairs (op 2/3): only-new-passes becomes an
    op-0 INSERT, both-pass forwards the pair, only-old-passes becomes an
    op-1 DELETE — Flink's filter on a retraction stream."""
    agg = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, avg(b_price) as b_avg FROM j GROUP BY symbol"""
    flt = "SELECT event_time, symbol, b_avg FROM g WHERE b_avg > 8"
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (agg, "g"), (flt, None)]
    )

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["symbol"], r["b_avg"]) for r in table.to_pylist()]

    import os

    # Run 1: avg NULL (pad) — fails the predicate, nothing emits.
    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10)], [], ts(1, 1, 0)
        ),
        system_time=ts(2),
    )
    assert not os.path.exists(out)

    # Run 2: partner 10 -> avg corrects NULL -> 10: old half fails, new
    # passes — the row ENTERS the filtered view as an op-0 insert.
    resp2, out2 = runner.run(
        _two_stream_inputs(
            tmp_path, "r2", [], [(0, 0, ts(3), ts(1, 0, 2), "A", 10)], ts(1, 2, 0)
        ),
        system_time=ts(3),
    )
    assert _r(out2) == [(0, "A", 10.0)]

    # Run 3: partner 8 -> avg 10 -> 9: both halves pass — pair forwards.
    resp3, out3 = runner.run(
        _two_stream_inputs(
            tmp_path, "r3", [], [(1, 0, ts(4), ts(1, 0, 3), "A", 8)], ts(1, 3, 0)
        ),
        system_time=ts(4),
    )
    assert _r(out3) == [(2, "A", 10.0), (3, "A", 9.0)]

    # Run 4: partner 2 -> avg 9 -> 20/3 < 8: old passes, new fails — the
    # row LEAVES the filtered view as an op-1 delete with the old values.
    resp4, out4 = runner.run(
        _two_stream_inputs(
            tmp_path, "r4", [], [(2, 0, ts(5), ts(1, 0, 4), "A", 2)], ts(1, 4, 0)
        ),
        system_time=ts(5),
    )
    assert _r(out4) == [(1, "A", 9.0)]


def test_where_over_changelog_with_extract_and_literals(spark, tmp_path):
    """The changelog-filter rewrite must locate the TOP-LEVEL FROM/WHERE:
    an EXTRACT(... FROM col) in the projection and string literals
    containing 'where'/'from' must not derail the splice (advisor
    round-6 low)."""
    flt = """SELECT event_time, symbol, b_price,
  EXTRACT(YEAR FROM event_time) as yr, 'where it came from' as tag
FROM j WHERE b_price IS NULL"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (flt, None)]
    )

    def _r(out):
        table = pq.read_table(out)
        return [
            (r["op"], r["symbol"], r["b_price"], r["yr"], r["tag"])
            for r in table.to_pylist()
        ]

    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10)], [], ts(1, 1, 0)
        ),
        system_time=ts(2),
    )
    assert _r(out) == [(0, "A", None, 2000, "where it came from")]

    # Partner arrives: the pad leaves the filtered view (op 1), the pair
    # fails the predicate.
    resp2, out2 = runner.run(
        _two_stream_inputs(
            tmp_path, "r2", [], [(0, 0, ts(3), ts(1, 0, 2), "A", 7)], ts(1, 2, 0)
        ),
        system_time=ts(3),
    )
    assert _r(out2) == [(1, "A", None, 2000, "where it came from")]


def test_projection_literal_where_is_not_a_filter(spark, tmp_path):
    """A plain projection whose LITERAL contains 'where' must take the
    op-forwarding projection path, not the filter rewrite."""
    runner = TransformRunner(
        spark, tmp_path,
        queries=[(LEFT_JOIN, "j"),
                 ("SELECT event_time, symbol, b_price, 'nowhere where' as tag "
                  "FROM j", None)],
    )
    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10)], [], ts(1, 1, 0)
        ),
        system_time=ts(2),
    )
    table = pq.read_table(out)
    rows = [(r["op"], r["symbol"], r["b_price"], r["tag"]) for r in table.to_pylist()]
    assert rows == [(0, "A", None, "nowhere where")]


def test_distinct_over_changelog(spark, tmp_path):
    """SELECT DISTINCT over an updating alias (Flink keeps a per-value
    count): a value enters the distinct view (op 0) when its count rises
    from zero, leaves (op 1) when it falls back to zero, and emits
    NOTHING while the count moves between positive values."""
    import os

    runner = TransformRunner(
        spark, tmp_path,
        queries=[(LEFT_JOIN, "j"),
                 ("SELECT DISTINCT event_time, symbol, b_price FROM j", None)],
    )

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["symbol"], r["b_price"]) for r in table.to_pylist()]

    # Run 1: A pads — (A, NULL) enters the distinct view.
    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10)], [], ts(1, 1, 0)
        ),
        system_time=ts(2),
    )
    assert _r(out) == [(0, "A", None)]

    # Run 2: partner 7 — the pad retracts ((A, NULL) leaves, op 1) and
    # the pair value (A, 7) enters.
    resp2, out2 = runner.run(
        _two_stream_inputs(
            tmp_path, "r2", [], [(0, 0, ts(3), ts(1, 0, 2), "A", 7)], ts(1, 2, 0)
        ),
        system_time=ts(3),
    )
    assert sorted(_r(out2)) == [(0, "A", 7), (1, "A", None)]

    # Run 3: a SECOND b row with the same price — (A, 7)'s count rises
    # 1 -> 2: the distinct view is unchanged, nothing emits.
    resp3, out3 = runner.run(
        _two_stream_inputs(
            tmp_path, "r3", [], [(1, 0, ts(4), ts(1, 0, 3), "A", 7)], ts(1, 3, 0)
        ),
        system_time=ts(4),
    )
    assert not os.path.exists(out3), _r(out3)

    # Run 4: a different price enters alongside.
    resp4, out4 = runner.run(
        _two_stream_inputs(
            tmp_path, "r4", [], [(2, 0, ts(5), ts(1, 0, 4), "A", 9)], ts(1, 4, 0)
        ),
        system_time=ts(5),
    )
    assert _r(out4) == [(0, "A", 9)]


def test_topn_over_changelog_agg_promotes_on_retraction(spark, tmp_path):
    """Top-N over an updating aggregate (Flink's RetractableTopNFunction,
    the 'top products by live sales count' pattern): a correction that
    DROPS the leader's value must promote the runner-up from beyond the
    visible horizon — which requires the full live-row ledger, not just
    the top-N."""
    agg = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, avg(price) as a FROM a GROUP BY symbol"""
    topn = """SELECT cast(now() as timestamp(3)) as event_time, symbol, a, rnk FROM (
  SELECT symbol, a, row_number() over (order by a desc) as rnk FROM g
) WHERE rnk <= 1"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(agg, "g"), (topn, None)]
    )

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["symbol"], r["a"], r["rnk"]) for r in table.to_pylist()]

    def _run(name, rows, wm_min):
        p = str(tmp_path / "in" / f"a_{name}.parquet")
        ticker_slice(p, rows)
        return runner.run(
            [{"alias": "a", "data_paths": [p] if rows else [], "schema_file": p,
              "watermark": ts(1, wm_min, 0)}],
            system_time=ts(2 + wm_min),
        )

    # Run 1: A avg 10, B avg 5 -> leader (A, 10).
    resp, out = _run("r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10),
                            (1, 0, ts(2), ts(1, 0, 2), "B", 5)], 1)
    assert _r(out) == [(0, "A", 10.0, 1)]

    # Run 2: A's avg corrects 10 -> 6, still the leader: op 2/3 pair.
    resp2, out2 = _run("r2", [(2, 0, ts(3), ts(1, 0, 3), "A", 2)], 2)
    assert _r(out2) == [(2, "A", 10.0, 1), (3, "A", 6.0, 1)]

    # Run 3: A's avg falls to 4, BELOW B's 5 — the retraction of the
    # leading tuple promotes B, which was never in the visible top-1.
    resp3, out3 = _run("r3", [(3, 0, ts(4), ts(1, 0, 4), "A", 0)], 3)
    assert _r(out3) == [(2, "A", 6.0, 1), (3, "B", 5.0, 1)]


def test_keyed_topn_over_changelog_join(spark, tmp_path):
    """PARTITION BY Top-N over a LEFT-join changelog: the pad's NULL
    value holds rank 1 until a real partner retracts it; a worse partner
    emits nothing; a better one corrects the place."""
    import os

    topn = """SELECT cast(now() as timestamp(3)) as event_time, symbol, b_price, rnk FROM (
  SELECT symbol, b_price, row_number() over (partition by symbol order by b_price desc) as rnk FROM j
) WHERE rnk <= 1"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (topn, None)]
    )

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["symbol"], r["b_price"], r["rnk"]) for r in table.to_pylist()]

    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10)], [], ts(1, 1, 0)
        ),
        system_time=ts(2),
    )
    assert _r(out) == [(0, "A", None, 1)]

    resp2, out2 = runner.run(
        _two_stream_inputs(
            tmp_path, "r2", [], [(0, 0, ts(3), ts(1, 0, 2), "A", 7)], ts(1, 2, 0)
        ),
        system_time=ts(3),
    )
    assert _r(out2) == [(2, "A", None, 1), (3, "A", 7, 1)]

    # A worse partner: rank table unchanged, nothing emits.
    resp3, out3 = runner.run(
        _two_stream_inputs(
            tmp_path, "r3", [], [(1, 0, ts(4), ts(1, 0, 3), "A", 3)], ts(1, 3, 0)
        ),
        system_time=ts(4),
    )
    assert not os.path.exists(out3), _r(out3)

    resp4, out4 = runner.run(
        _two_stream_inputs(
            tmp_path, "r4", [], [(2, 0, ts(5), ts(1, 0, 4), "A", 9)], ts(1, 4, 0)
        ),
        system_time=ts(5),
    )
    assert _r(out4) == [(2, "A", 7, 1), (3, "A", 9, 1)]


def test_changelog_distinct_fold_slice_invariance(spark, tmp_path):
    """The changelog DISTINCT's op 0/1 stream folds to the batch distinct
    set under ANY slicing of the inputs."""
    dist = "SELECT DISTINCT event_time, symbol, b_price FROM j"
    a_rows = [(i, 0, ts(9), ts(1), f"S{i % 4}", 10 + (i % 2)) for i in range(8)]
    b_rows = [(i, 0, ts(9), ts(1), f"S{i % 3}", 100 + (i % 2)) for i in range(6)]

    def run_sliced(tag, cuts_b):
        import os

        runner = TransformRunner(
            spark, tmp_path / tag, queries=[(LEFT_JOIN, "j"), (dist, None)]
        )
        os.makedirs(tmp_path / tag / "in", exist_ok=True)
        state = set()
        bounds = [0, *cuts_b, len(b_rows)]
        for i in range(len(bounds) - 1):
            bs = b_rows[bounds[i]: bounds[i + 1]]
            a = str(tmp_path / tag / "in" / f"a{i}.parquet")
            b = str(tmp_path / tag / "in" / f"b{i}.parquet")
            ticker_slice(a, a_rows if i == 0 else [])
            ticker_slice(b, bs)
            resp, out = runner.run(
                [{"alias": "a", "data_paths": [a] if i == 0 else [],
                  "schema_file": a, "watermark": ts(1, i + 1, 0)},
                 {"alias": "b", "data_paths": [b] if bs else [],
                  "schema_file": b, "watermark": ts(1, i + 1, 0)}],
                system_time=ts(2 + i),
            )
            if not os.path.exists(out):
                continue
            for r in pq.read_table(out).to_pylist():
                key = (r["symbol"], r["b_price"])
                if r["op"] == 0:
                    assert key not in state, f"double insert {key}"
                    state.add(key)
                else:
                    state.discard(key)
        return state

    one = run_sliced("one", [])
    many = run_sliced("many", [1, 3, 5])

    # Batch oracle: distinct (symbol, b_price) of the full LEFT join.
    a = spark.createDataFrame([(r[4], r[5]) for r in a_rows], "symbol string, price int")
    b = spark.createDataFrame([(r[4], r[5]) for r in b_rows], "symbol string, price int")
    batch = (
        a.alias("a")
        .join(b.alias("b"), "symbol", "left")
        .select("symbol", b["price"].alias("b_price"))
        .distinct()
        .collect()
    )
    expected = {(r["symbol"], r["b_price"]) for r in batch}
    assert one == expected
    assert many == expected


def test_changelog_topn_fold_slice_invariance(spark, tmp_path):
    """The changelog Top-N's emitted ledger folds to the batch rank table
    under ANY slicing of the input — the retractable-rank analogue of the
    other fold-to-batch laws."""
    agg = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, avg(price) as a FROM a GROUP BY symbol"""
    topn = """SELECT cast(now() as timestamp(3)) as event_time, symbol, a, rnk FROM (
  SELECT symbol, a, row_number() over (order by a desc) as rnk FROM g
) WHERE rnk <= 3"""
    rows = [(i, 0, ts(9), ts(1), f"S{i % 5}", (i * 7) % 23) for i in range(20)]

    def run_sliced(tag, cuts):
        import os

        runner = TransformRunner(
            spark, tmp_path / tag, queries=[(agg, "g"), (topn, None)]
        )
        os.makedirs(tmp_path / tag / "in", exist_ok=True)
        state = {}
        bounds = [0, *cuts, len(rows)]
        for i in range(len(bounds) - 1):
            sl = rows[bounds[i]: bounds[i + 1]]
            p = str(tmp_path / tag / "in" / f"a{i}.parquet")
            ticker_slice(p, sl)
            resp, out = runner.run(
                [{"alias": "a", "data_paths": [p] if sl else [],
                  "schema_file": p, "watermark": ts(1, i + 1, 0)}],
                system_time=ts(2 + i),
            )
            if not os.path.exists(out):
                continue
            for r in pq.read_table(out).to_pylist():
                op, key = r["op"], r["rnk"]
                val = (r["symbol"], r["a"])
                if op in (0, 3):
                    state[key] = val
                elif op == 1:
                    assert state.pop(key, None) == val, f"bad delete @{key}"
                else:
                    assert state.get(key) == val, f"stale CorrectFrom @{key}"
        return state

    one = run_sliced("one", [])
    many = run_sliced("many", [3, 7, 12, 16])

    import pyspark.sql.functions as SF
    from pyspark.sql import Window as W

    base = spark.createDataFrame(
        [(r[4], r[5]) for r in rows], "symbol string, price int"
    )
    batch = (
        base.groupBy("symbol")
        .agg(SF.avg("price").alias("a"))
        .withColumn(
            "rnk",
            SF.row_number().over(
                W.partitionBy(SF.lit(0)).orderBy(
                    SF.col("a").desc(), SF.col("symbol").asc()
                )
            ),
        )
        .filter(SF.col("rnk") <= 3)
        .collect()
    )
    expected = {r["rnk"]: (r["symbol"], r["a"]) for r in batch}
    assert one == expected
    assert many == expected


def test_union_all_updating_and_append(spark, tmp_path):
    """UNION ALL of an updating alias with an append stream (Flink unions
    changelogs freely): op tags forward per branch, append rows are op-0
    inserts, and a continuous agg CONSUMING the union folds the merged
    changelog to the batch answer."""
    union = ("SELECT event_time, symbol, b_price FROM j "
             "UNION ALL SELECT event_time, symbol, price as b_price FROM c")
    agg = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, count(*) as n, sum(b_price) as s FROM u GROUP BY symbol"""
    runner = TransformRunner(
        spark, tmp_path,
        queries=[(LEFT_JOIN, "j"), (union, "u"), (agg, None)],
    )

    def _in(name, a_rows, b_rows, c_rows, wm):
        out = []
        for alias, rows in (("a", a_rows), ("b", b_rows), ("c", c_rows)):
            p = str(tmp_path / "in" / f"{alias}_{name}.parquet")
            ticker_slice(p, rows)
            out.append({"alias": alias, "data_paths": [p] if rows else [],
                        "schema_file": p, "watermark": wm})
        return out

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["symbol"], r["n"], r["s"]) for r in table.to_pylist()]

    # Run 1: A pads through j (b_price NULL); C arrives on the append
    # branch: two op-0 groups.
    resp, out = runner.run(
        _in("r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10)], [],
            [(0, 0, ts(2), ts(1, 0, 2), "C", 42)], ts(1, 1, 0)),
        system_time=ts(2),
    )
    assert sorted(_r(out)) == [(0, "A", 1, None), (0, "C", 1, 42)]

    # Run 2: A's partner lands — the union forwards j's op-1 pad
    # retraction and op-0 pair; the agg folds them into one correction
    # (count stays 1, sum NULL -> 7).
    resp2, out2 = runner.run(
        _in("r2", [], [(0, 0, ts(3), ts(1, 0, 3), "A", 7)], [], ts(1, 2, 0)),
        system_time=ts(3),
    )
    assert _r(out2) == [(2, "A", 1, None), (3, "A", 1, 7)]

    # Run 3: another append row on C's branch: plain correction.
    resp3, out3 = runner.run(
        _in("r3", [], [], [(1, 0, ts(4), ts(1, 0, 4), "C", 8)], ts(1, 3, 0)),
        system_time=ts(4),
    )
    assert _r(out3) == [(2, "C", 1, 42), (3, "C", 2, 50)]


def test_union_all_updating_as_final_step(spark, tmp_path):
    """The union itself as the FINAL step: branch-major emission, op tags
    on the output."""
    union = ("SELECT event_time, symbol, b_price FROM j "
             "UNION ALL SELECT event_time, symbol, price as b_price FROM c")
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (union, None)]
    )

    def _in(name, a_rows, b_rows, c_rows, wm):
        out = []
        for alias, rows in (("a", a_rows), ("b", b_rows), ("c", c_rows)):
            p = str(tmp_path / "in" / f"{alias}_{name}.parquet")
            ticker_slice(p, rows)
            out.append({"alias": alias, "data_paths": [p] if rows else [],
                        "schema_file": p, "watermark": wm})
        return out

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["symbol"], r["b_price"]) for r in table.to_pylist()]

    resp, out = runner.run(
        _in("r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10)], [],
            [(0, 0, ts(2), ts(1, 0, 2), "C", 42)], ts(1, 1, 0)),
        system_time=ts(2),
    )
    assert _r(out) == [(0, "A", None), (0, "C", 42)]

    resp2, out2 = runner.run(
        _in("r2", [], [(0, 0, ts(3), ts(1, 0, 3), "A", 7)], [], ts(1, 2, 0)),
        system_time=ts(3),
    )
    assert _r(out2) == [(1, "A", None), (0, "A", 7)]


def test_inner_join_chain_still_allowed(spark, tmp_path):
    """INNER regular joins emit append-only streams — chaining into any
    step stays supported (no false positives from the guard)."""
    inner = """SELECT a.event_time as event_time, a.symbol as symbol,
  a.price as a_price, b.price as b_price
FROM a JOIN b ON a.symbol = b.symbol"""
    runner = TransformRunner(
        spark, tmp_path,
        queries=[(inner, "j"), ("SELECT event_time, symbol, a_price FROM j", None)],
    )
    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1",
            [(0, 0, ts(2), ts(1, 0, 1), "A", 10)],
            [(0, 0, ts(2), ts(1, 0, 3), "A", 7)],
            ts(1, 1, 0),
        ),
        system_time=ts(2),
    )
    table = pq.read_table(out)
    assert [(r["op"], r["symbol"], r["a_price"]) for r in table.to_pylist()] == [
        (0, "A", 10)
    ]


def test_left_join_into_avg_folds(spark, tmp_path):
    """avg over a changelog decomposes into signed sum + signed non-null
    count: pads contribute nothing to avg(b_price) (NULL), and the
    correction stream converges to the batch average."""
    agg = """SELECT cast(now() as timestamp(3)) as event_time,
  symbol, avg(b_price) as b_avg FROM j GROUP BY symbol"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(LEFT_JOIN, "j"), (agg, None)]
    )

    def _r(out):
        table = pq.read_table(out)
        return [(r["op"], r["symbol"], r["b_avg"]) for r in table.to_pylist()]

    # Run 1: A pads (avg NULL).
    resp, out = runner.run(
        _two_stream_inputs(
            tmp_path, "r1", [(0, 0, ts(2), ts(1, 0, 1), "A", 10)], [], ts(1, 1, 0)
        ),
        system_time=ts(2),
    )
    assert _r(out) == [(0, "A", None)]

    # Run 2: two partners arrive (5 and 11) — the pad retracts (NULL
    # drops out of the signed count) and avg corrects NULL -> 8.
    resp2, out2 = runner.run(
        _two_stream_inputs(
            tmp_path, "r2", [],
            [(0, 0, ts(3), ts(1, 0, 2), "A", 5), (1, 0, ts(3), ts(1, 0, 3), "A", 11)],
            ts(1, 2, 0),
        ),
        system_time=ts(3),
    )
    assert _r(out2) == [(2, "A", None), (3, "A", 8.0)]


def test_fold_slice_invariance(spark, tmp_path):
    """Different slicings of the same ledger converge to the same folded
    state for the LEFT-join -> agg chain."""

    def run_sliced(tag, b_slices):
        runner = TransformRunner(
            spark, tmp_path / tag, queries=[(LEFT_JOIN, "j"), (AGG_OVER_JOIN, None)]
        )
        import os

        os.makedirs(tmp_path / tag / "in", exist_ok=True)
        a = str(tmp_path / tag / "in" / "a.parquet")
        ticker_slice(a, [(0, 0, ts(2), ts(1, 0, 1), "A", 10),
                         (1, 0, ts(2), ts(1, 0, 2), "B", 20)])
        changelog = []
        first = True
        for i, rows in enumerate(b_slices):
            b = str(tmp_path / tag / "in" / f"b{i}.parquet")
            ticker_slice(b, rows)
            resp, out = runner.run(
                [
                    {"alias": "a", "data_paths": [a] if first else [],
                     "schema_file": a, "watermark": ts(1, i + 1, 0)},
                    {"alias": "b", "data_paths": [b] if rows else [],
                     "schema_file": b, "watermark": ts(1, i + 1, 0)},
                ],
                system_time=ts(2 + i),
            )
            first = False
            if os.path.exists(out):
                changelog += _rows(out)
        return _fold([(op, k, n, s) for op, k, n, s in changelog])

    b_rows = [
        (0, 0, ts(2), ts(1, 0, 3), "A", 7),
        (1, 0, ts(2), ts(1, 0, 4), "B", 5),
        (2, 0, ts(2), ts(1, 0, 5), "A", 3),
    ]
    one = run_sliced("one", [b_rows])
    many = run_sliced("many", [[b_rows[0]], [b_rows[1]], [b_rows[2]]])
    assert one == many == {"A": (2, 10), "B": (1, 5)}


def test_fold_slice_sql_shapes():
    """changelog_fold_slice_sql: signed aggregates, per-sum non-null
    guard (Flink SumWithRetractAggFunction NULL-out), liveness counter;
    min/max items are omitted and reported for histogram state."""
    from kamu_engine_flink_spark.plans.classify import (
        LIVE_COL,
        changelog_fold_slice_sql,
        changelog_hist_slice_sql,
    )

    core = "SELECT symbol, sum(v) AS s, count(*) AS n FROM j GROUP BY symbol"
    out = changelog_fold_slice_sql(core, "__op")
    assert out is not None
    sql, guards, minmax = out
    assert guards == {"s": "__sum_cnt_s"} and minmax == {}
    assert "__sum_cnt_s" in sql and LIVE_COL in sql
    assert "CASE WHEN __op IN (1, 2) THEN -1 ELSE 1 END" in sql
    sql_m, guards_m, minmax_m = changelog_fold_slice_sql(
        "SELECT symbol, max(v) AS m FROM j GROUP BY symbol", "__op"
    )
    assert minmax_m == {"m": ("max", "v")} and "max(" not in sql_m.lower()
    hist = changelog_hist_slice_sql(
        "SELECT symbol, max(v) AS m FROM j WHERE v > 0 GROUP BY symbol",
        "__op", ["symbol"], "v",
    )
    assert "__hist_val" in hist and "__hist_cnt" in hist
    assert "WHERE (v > 0) AND ((v) IS NOT NULL)" in hist
