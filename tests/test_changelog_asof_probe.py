"""Temporal (as-of) join over an UPDATING PROBE side — the inverse of the
changelog-build case: a continuous aggregate's correction stream probes a
rates table. Flink's event-time temporal join accepts an updating left
table via planner delegation (reference surface,
TransformEngine.scala:252-262); retractions flow through to the join
output.

Contract under test (operators/temporal_join._execute_updating_probe):
- every released probe row resolves the version live at ITS event time
  and forwards its op tag, so a retraction retracts exactly the output
  its insert produced (deterministic resolution over frozen history);
- an op-2/op-3 correction pair that releases together and fully resolves
  forwards as a pair, each half against the version at its OWN time;
- a pair that SPLITS (one half buffered past the joint watermark, or one
  half dropped by the inner join) repairs to the changelog-equivalent
  single op: dangling op-2 -> op-1 DELETE, dangling op-3 -> op-0 INSERT;
- the build side works both append-only and updating (changelog-fed
  versions with tombstones);
- fold-to-batch slicing law: over time-banded slices (nothing late), the
  folded emission of N chained invocations equals the folded emission of
  one shot.
"""

import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from .helpers import TransformRunner, ticker_slice, ts

AGG = """SELECT max(event_time) as event_time,
  symbol, sum(price) as total FROM a GROUP BY symbol"""

ASOF = """SELECT g.event_time as event_time, g.symbol as symbol,
  g.total as total, rt.price as rate
FROM g JOIN rates FOR SYSTEM_TIME AS OF g.event_time AS rt
ON g.symbol = rt.symbol"""

ASOF_LEFT = """SELECT g.event_time as event_time, g.symbol as symbol,
  g.total as total, rt.price as rate
FROM g LEFT JOIN rates FOR SYSTEM_TIME AS OF g.event_time AS rt
ON g.symbol = rt.symbol"""


def _inputs(tmp_path, name, a_rows, r_rows, a_wm, r_wm):
    a = str(tmp_path / "in" / f"a_{name}.parquet")
    r = str(tmp_path / "in" / f"r_{name}.parquet")
    ticker_slice(a, a_rows)
    ticker_slice(r, r_rows)
    return [
        {"alias": "a", "data_paths": [a] if a_rows else [], "schema_file": a,
         "watermark": a_wm},
        {"alias": "rates", "data_paths": [r] if r_rows else [],
         "schema_file": r, "watermark": r_wm},
    ]


def _rows(out):
    if not os.path.exists(out):
        return []
    return [
        (r["op"], r["symbol"], r["event_time"].isoformat(), r["total"], r["rate"])
        for r in pq.read_table(out).to_pylist()
    ]


def test_updating_probe_corrections_resolve_per_half(spark, tmp_path):
    """Each half of a correction pair resolves against the version live at
    its OWN event time: the op-2 keeps the OLD rate, the op-3 gets the
    rate current at the corrected time."""
    runner = TransformRunner(
        spark, tmp_path, queries=[(AGG, "g"), (ASOF, None)],
        temporal_tables=[("rates", "symbol")],
    )

    # Invocation 1: rate A=2@d1; agg emits op-0 (d2, A, 10) -> rate 2.
    resp, out = runner.run(
        _inputs(tmp_path, "r1",
                [(0, 0, ts(10), ts(2, 0, 0), "A", 10)],
                [(0, 0, ts(10), ts(1, 0, 0), "A", 2)],
                ts(3), ts(3)),
        system_time=ts(10),
    )
    assert _rows(out) == [(0, "A", ts(2).isoformat(), 10, 2)]

    # Invocation 2: rate A=3@d3h12; agg corrects (d2,A,10) -> (d4,A,15).
    # Both halves release: op-2 resolves at d2 -> OLD rate 2; op-3 at d4
    # -> NEW rate 3. The pair stays adjacent in emission order.
    resp2, out2 = runner.run(
        _inputs(tmp_path, "r2",
                [(1, 0, ts(12), ts(4, 0, 0), "A", 5)],
                [(1, 0, ts(12), ts(3, 12, 0), "A", 3)],
                ts(5), ts(5)),
        system_time=ts(12),
    )
    assert _rows(out2) == [
        (2, "A", ts(2).isoformat(), 10, 2),
        (3, "A", ts(4).isoformat(), 15, 3),
    ]


def test_updating_probe_split_pair_repairs(spark, tmp_path):
    """A correction pair whose op-3 lands beyond the joint watermark
    splits: the released op-2 repairs to op-1 (DELETE), and when the op-3
    releases on a later invocation it repairs to op-0 (INSERT)."""
    runner = TransformRunner(
        spark, tmp_path, queries=[(AGG, "g"), (ASOF, None)],
        temporal_tables=[("rates", "symbol")],
    )
    runner.run(
        _inputs(tmp_path, "r1",
                [(0, 0, ts(10), ts(2, 0, 0), "A", 10)],
                [(0, 0, ts(10), ts(1, 0, 0), "A", 2)],
                ts(3), ts(3)),
        system_time=ts(10),
    )
    # Invocation 2: event at d7 -> pair op-2 (d2, A, 10) / op-3 (d7, A,
    # 15). Watermark d5: op-2 releases, op-3 buffers -> emitted op-1.
    resp2, out2 = runner.run(
        _inputs(tmp_path, "r2",
                [(1, 0, ts(12), ts(7, 0, 0), "A", 5)], [],
                ts(5), ts(5)),
        system_time=ts(12),
    )
    assert _rows(out2) == [(1, "A", ts(2).isoformat(), 10, 2)]

    # Invocation 3: watermark d8 -> the buffered op-3 releases alone and
    # repairs to op-0 at the rate live at d7.
    resp3, out3 = runner.run(
        _inputs(tmp_path, "r3", [], [], ts(8), ts(8)),
        system_time=ts(14),
    )
    assert _rows(out3) == [(0, "A", ts(7).isoformat(), 15, 2)]


def test_updating_probe_inner_join_drops_consistently(spark, tmp_path):
    """INNER resolution: a correction whose old half predates the key's
    first version (insert never emitted) and whose new half resolves must
    emit a lone op-0 — never a dangling op-2."""
    runner = TransformRunner(
        spark, tmp_path, queries=[(AGG, "g"), (ASOF, None)],
        temporal_tables=[("rates", "symbol")],
    )
    # Invocation 1: agg op-0 (d1, A, 10) released BEFORE any rate version
    # -> inner join drops it; nothing emitted.
    resp, out = runner.run(
        _inputs(tmp_path, "r1",
                [(0, 0, ts(10), ts(1, 0, 0), "A", 10)],
                [(0, 0, ts(10), ts(2, 0, 0), "A", 2)],
                ts(3), ts(3)),
        system_time=ts(10),
    )
    assert _rows(out) == []

    # Invocation 2: correction pair op-2 (d1, A, 10) / op-3 (d4, A, 15).
    # The op-2 resolves nothing (same deterministic drop as its insert);
    # the op-3 resolves rate 2 and repairs to a lone op-0.
    resp2, out2 = runner.run(
        _inputs(tmp_path, "r2",
                [(1, 0, ts(12), ts(4, 0, 0), "A", 5)], [],
                ts(5), ts(5)),
        system_time=ts(12),
    )
    assert _rows(out2) == [(0, "A", ts(4).isoformat(), 15, 2)]


def test_updating_probe_left_join_pads(spark, tmp_path):
    """LEFT resolution pads NULL for probes before the first version, on
    inserts and their later corrections alike."""
    runner = TransformRunner(
        spark, tmp_path, queries=[(AGG, "g"), (ASOF_LEFT, None)],
        temporal_tables=[("rates", "symbol")],
    )
    resp, out = runner.run(
        _inputs(tmp_path, "r1",
                [(0, 0, ts(10), ts(1, 0, 0), "A", 10)],
                [(0, 0, ts(10), ts(2, 0, 0), "A", 2)],
                ts(3), ts(3)),
        system_time=ts(10),
    )
    assert _rows(out) == [(0, "A", ts(1).isoformat(), 10, None)]

    resp2, out2 = runner.run(
        _inputs(tmp_path, "r2",
                [(1, 0, ts(12), ts(4, 0, 0), "A", 5)], [],
                ts(5), ts(5)),
        system_time=ts(12),
    )
    assert _rows(out2) == [
        (2, "A", ts(1).isoformat(), 10, None),
        (3, "A", ts(4).isoformat(), 15, 2),
    ]


def test_updating_probe_over_updating_build(spark, tmp_path):
    """BOTH sides updating: a continuous aggregate probes a versioned view
    maintained by another continuous aggregate's changelog."""
    rates_agg = """SELECT max(event_time) as event_time,
  symbol, sum(price) as rate FROM r GROUP BY symbol"""
    asof = """SELECT g.event_time as event_time, g.symbol as symbol,
  g.total as total, rt.rate as rate
FROM g JOIN rates FOR SYSTEM_TIME AS OF g.event_time AS rt
ON g.symbol = rt.symbol"""
    runner = TransformRunner(
        spark, tmp_path,
        queries=[(AGG, "g"), (rates_agg, "rates"), (asof, None)],
        temporal_tables=[("rates", "symbol")],
    )

    def _in(name, a_rows, r_rows, wm):
        a = str(tmp_path / "in" / f"a_{name}.parquet")
        r = str(tmp_path / "in" / f"r_{name}.parquet")
        ticker_slice(a, a_rows)
        ticker_slice(r, r_rows)
        return [
            {"alias": "a", "data_paths": [a] if a_rows else [],
             "schema_file": a, "watermark": wm},
            {"alias": "r", "data_paths": [r] if r_rows else [],
             "schema_file": r, "watermark": wm},
        ]

    # Invocation 1: rate version A=2@d1 (agg insert); probe insert
    # (d2, A, 10) resolves 2.
    resp, out = runner.run(
        _in("r1",
            [(0, 0, ts(10), ts(2, 0, 0), "A", 10)],
            [(0, 0, ts(10), ts(1, 0, 0), "A", 2)],
            ts(3)),
        system_time=ts(10),
    )
    assert _rows(out) == [(0, "A", ts(2).isoformat(), 10, 2)]

    # Invocation 2: the rates agg corrects to 5 with version time d4; the
    # probe agg corrects (d2,A,10) -> (d5,A,15). op-2 at d2 -> old rate
    # 2; op-3 at d5 -> new rate 5.
    resp2, out2 = runner.run(
        _in("r2",
            [(1, 0, ts(12), ts(5, 0, 0), "A", 5)],
            [(1, 0, ts(12), ts(4, 0, 0), "A", 3)],
            ts(6)),
        system_time=ts(12),
    )
    assert _rows(out2) == [
        (2, "A", ts(2).isoformat(), 10, 2),
        (3, "A", ts(5).isoformat(), 15, 5),
    ]


def test_updating_probe_retraction_via_dying_bucket(spark, tmp_path):
    """A probe row whose aggregate state DIES emits op-1 through the join:
    the retraction resolves the same version its insert did."""
    per_symbol = """SELECT max(event_time) as event_time,
  symbol, count(*) as n FROM a GROUP BY symbol"""
    hist = """SELECT max(event_time) as event_time,
  n, count(*) as n_symbols FROM per_symbol GROUP BY n"""
    asof = """SELECT h.event_time as event_time, h.n as n,
  h.n_symbols as n_symbols, rt.price as label
FROM h JOIN rates FOR SYSTEM_TIME AS OF h.event_time AS rt
ON h.n = rt.price"""
    runner = TransformRunner(
        spark, tmp_path,
        queries=[(per_symbol, "per_symbol"), (hist, "h"), (asof, None)],
        temporal_tables=[("rates", "price")],
    )

    def _in(name, a_rows, r_rows, wm):
        a = str(tmp_path / "in" / f"a_{name}.parquet")
        r = str(tmp_path / "in" / f"r_{name}.parquet")
        ticker_slice(a, a_rows)
        ticker_slice(r, r_rows)
        return [
            {"alias": "a", "data_paths": [a] if a_rows else [],
             "schema_file": a, "watermark": wm},
            {"alias": "rates", "data_paths": [r] if r_rows else [],
             "schema_file": r, "watermark": wm},
        ]

    def _r(out):
        if not os.path.exists(out):
            return []
        return [(r["op"], r["n"], r["n_symbols"]) for r in pq.read_table(out).to_pylist()]

    # Rates keyed by integer bucket: versions 1@d1 and 2@d1.
    # Invocation 1: A has 1 event at d2 -> hist op-0 (d2, n=1, 1).
    resp, out = runner.run(
        _in("r1", [(0, 0, ts(10), ts(2, 0, 0), "A", 10)],
            [(0, 0, ts(10), ts(1, 0, 0), "L1", 1),
             (1, 0, ts(10), ts(1, 0, 0), "L2", 2)],
            ts(3)),
        system_time=ts(10),
    )
    assert _r(out) == [(0, 1, 1)]

    # Invocation 2: A's 2nd event at d5 -> bucket n=1 DIES (op-1 at d2
    # rowtime carried by the delete) and bucket n=2 is born at d5. The
    # op-1 retracts the earlier output; the op-0 inserts the new bucket.
    resp2, out2 = runner.run(
        _in("r2", [(1, 0, ts(12), ts(5, 0, 0), "A", 11)], [], ts(6)),
        system_time=ts(12),
    )
    assert sorted(_r(out2)) == [(0, 2, 1), (1, 1, 1)]


@pytest.mark.parametrize("seed,n_inv", [(11, 3), (42, 4)])
def test_updating_probe_slicing_law(spark, tmp_path, seed, n_inv):
    """Fold-to-batch slicing law: with time-banded slices (so nothing is
    late), the FOLDED emission of N chained invocations equals the folded
    emission of one single-shot invocation over the same data."""
    import random

    rng = random.Random(seed)
    syms = [f"S{i}" for i in range(4)]
    events = sorted(
        (
            (ts(rng.randint(1, 20), rng.randint(0, 23)), rng.choice(syms),
             rng.randint(1, 9))
            for _ in range(36)
        ),
    )
    rates = sorted(
        (
            (ts(rng.randint(1, 20), rng.randint(0, 23)), rng.choice(syms),
             rng.randint(1, 5))
            for _ in range(12)
        ),
    )

    def _run(slices, base):
        """slices: list of (a_rows, r_rows, wm); returns folded Counter."""
        runner = TransformRunner(
            spark, base, queries=[(AGG, "g"), (ASOF_LEFT, None)],
            temporal_tables=[("rates", "symbol")],
        )
        fold = Counter()
        for i, (a_rows, r_rows, wm) in enumerate(slices):
            a = str(base / "in" / f"a_{i}.parquet")
            r = str(base / "in" / f"r_{i}.parquet")
            ticker_slice(a, a_rows)
            ticker_slice(r, r_rows)
            resp, out = runner.run(
                [{"alias": "a", "data_paths": [a] if a_rows else [],
                  "schema_file": a, "watermark": wm},
                 {"alias": "rates", "data_paths": [r] if r_rows else [],
                  "schema_file": r, "watermark": wm}],
                system_time=ts(25, i),
            )
            for op, sym, et, total, rate in _rows(out):
                fold[(sym, et, total, rate)] += 1 if op in (0, 3) else -1
        return Counter({k: v for k, v in fold.items() if v != 0})

    # Time-banded slicing: slice k takes events in (band_{k-1}, band_k];
    # watermark_k = band_k, so no version or probe is ever late.
    bands = [ts(5 + i * (16 // n_inv)) for i in range(n_inv - 1)] + [ts(21)]

    def banded(evts):
        out, prev = [], None
        for b in bands:
            out.append([e for e in evts if (prev is None or e[0] > prev) and e[0] <= b])
            prev = b
        return out

    def rowify(evts, st):
        return [(j, 0, ts(25), t, sym, v) for j, (t, sym, v) in enumerate(evts)]

    sliced = [
        (rowify(a_band, i), rowify(r_band, i), bands[i])
        for i, (a_band, r_band) in enumerate(zip(banded(events), banded(rates)))
    ]
    one_shot = [(rowify(events, 0), rowify(rates, 0), bands[-1])]

    f_sliced = _run(sliced, tmp_path / "sliced")
    f_one = _run(one_shot, tmp_path / "oneshot")
    assert f_sliced == f_one
    assert len(f_one) > 0


MULTI_ASOF = """SELECT g.event_time as event_time, g.symbol as symbol,
  g.total as total, r1.price as rate1, r2.price as rate2
FROM g JOIN rates1 FOR SYSTEM_TIME AS OF g.event_time AS r1
  ON g.symbol = r1.symbol
JOIN rates2 FOR SYSTEM_TIME AS OF g.event_time AS r2
  ON g.symbol = r2.symbol"""


def test_updating_probe_through_multi_asof_chain(spark, tmp_path):
    """An updating probe chains through TWO FOR SYSTEM_TIME stages in one
    SQL step (plans/multi_join.py expansion): stage 1's changelog output
    (with mangled pass-through columns) becomes stage 2's updating
    probe; corrections resolve per half at each stage."""
    runner = TransformRunner(
        spark, tmp_path,
        queries=[(AGG, "g"), (MULTI_ASOF, None)],
        temporal_tables=[("rates1", "symbol"), ("rates2", "symbol")],
    )

    def _in(name, a_rows, r1_rows, r2_rows, wm):
        out = []
        for alias, rows in (("a", a_rows), ("rates1", r1_rows), ("rates2", r2_rows)):
            p = str(tmp_path / "in" / f"{alias}_{name}.parquet")
            ticker_slice(p, rows)
            out.append({"alias": alias, "data_paths": [p] if rows else [],
                        "schema_file": p, "watermark": wm})
        return out

    def _r(out):
        if not os.path.exists(out):
            return []
        return [
            (r["op"], r["symbol"], r["total"], r["rate1"], r["rate2"])
            for r in pq.read_table(out).to_pylist()
        ]

    # Invocation 1: rate1 A=2@d1, rate2 A=7@d1; agg op-0 (d2, A, 10)
    # resolves both.
    resp, out = runner.run(
        _in("r1",
            [(0, 0, ts(10), ts(2, 0, 0), "A", 10)],
            [(0, 0, ts(10), ts(1, 0, 0), "A", 2)],
            [(0, 0, ts(10), ts(1, 0, 0), "A", 7)],
            ts(3)),
        system_time=ts(10),
    )
    assert _r(out) == [(0, "A", 10, 2, 7)]

    # Invocation 2: rate1 corrects to 3@d3, rate2 to 8@d3h12; the agg
    # corrects (d2,A,10) -> (d4,A,15). The op-2 half resolves at d2
    # (old rates 2/7), the op-3 half at d4 (new rates 3/8) — through
    # BOTH stages.
    resp2, out2 = runner.run(
        _in("r2",
            [(1, 0, ts(12), ts(4, 0, 0), "A", 5)],
            [(1, 0, ts(12), ts(3, 0, 0), "A", 3)],
            [(1, 0, ts(12), ts(3, 12, 0), "A", 8)],
            ts(5)),
        system_time=ts(12),
    )
    assert _r(out2) == [(2, "A", 10, 2, 7), (3, "A", 15, 3, 8)]


def test_updating_probe_lateral_table_spelling(spark, tmp_path):
    """The LATERAL TABLE (rates(g.event_time)) spelling resolves through
    the same updating-probe executor."""
    lateral = """SELECT g.event_time as event_time, g.symbol as symbol,
  g.total as total, rt.price as rate
FROM g, LATERAL TABLE (rates(g.event_time)) AS rt
WHERE g.symbol = rt.symbol"""
    runner = TransformRunner(
        spark, tmp_path, queries=[(AGG, "g"), (lateral, None)],
        temporal_tables=[("rates", "symbol")],
    )
    resp, out = runner.run(
        _inputs(tmp_path, "r1",
                [(0, 0, ts(10), ts(2, 0, 0), "A", 10)],
                [(0, 0, ts(10), ts(1, 0, 0), "A", 2)],
                ts(3), ts(3)),
        system_time=ts(10),
    )
    assert _rows(out) == [(0, "A", ts(2).isoformat(), 10, 2)]

    resp2, out2 = runner.run(
        _inputs(tmp_path, "r2",
                [(1, 0, ts(12), ts(4, 0, 0), "A", 5)],
                [(1, 0, ts(12), ts(3, 12, 0), "A", 3)],
                ts(5), ts(5)),
        system_time=ts(12),
    )
    assert _rows(out2) == [
        (2, "A", ts(2).isoformat(), 10, 2),
        (3, "A", ts(4).isoformat(), 15, 3),
    ]
