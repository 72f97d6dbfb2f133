"""Vocabulary-rename matrix through the stateful §2.C executor families
(round-11 verdict ask #7): one fully renamed DatasetVocabulary (offset →
idx, op → kind, system_time → tx_at, event_time → happened_at) driven —
on BOTH the inputs and the output — through stateful set operations, the
changelog-aware regular join chain, the temporal (as-of) join, and
MATCH_RECOGNIZE, each across two invocations so the renamed columns
round-trip the checkpoint state too. Scenarios mirror the canonical
default-vocab tests (test_setop / test_changelog_join /
test_temporal_join / test_match_recognize) row for row; only the
vocabulary differs, so any divergence is a rename bug.

Reference: configurable vocabulary per dataset (SURVEY.md §1.2;
TransformEngine.scala:234-321 strips/appends by vocab name).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from kamu_engine_flink_spark.protocol.model import DatasetVocabulary

from .helpers import TransformRunner, ts, write_input_slice

VOCAB = DatasetVocabulary(
    offset_column="idx",
    operation_type_column="kind",
    system_time_column="tx_at",
    event_time_column="happened_at",
)


def _vslice(path: str, rows: list[tuple], value_col: str = "price"):
    """rows: (idx, kind, tx_at, happened_at, symbol, <value_col>)"""
    cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
    write_input_slice(
        path,
        {
            "idx": list(cols[0]),
            "kind": list(cols[1]),
            "tx_at": list(cols[2]),
            "happened_at": list(cols[3]),
            "symbol": list(cols[4]),
            value_col: list(cols[5]),
        },
        {
            "idx": pa.int64(),
            "kind": pa.int32(),
            "tx_at": pa.timestamp("ms", tz="UTC"),
            "happened_at": pa.timestamp("ms", tz="UTC"),
            "symbol": pa.string(),
            value_col: pa.int32(),
        },
    )


def _inputs(tmp_path, name, slices: dict, wm, value_cols=None):
    out = []
    for alias, rows in slices.items():
        p = str(tmp_path / "in" / f"{alias}_{name}.parquet")
        _vslice(p, rows, (value_cols or {}).get(alias, "price"))
        out.append(
            {
                "alias": alias,
                "data_paths": [p] if rows else [],
                "schema_file": p,
                "watermark": wm,
                "vocab": VOCAB,
            }
        )
    return out


def _oprows(out, cols):
    if not os.path.exists(out):
        return []
    table = pq.read_table(out)
    # system columns carry the renamed output vocabulary
    assert {"idx", "kind", "tx_at", "happened_at"} <= set(table.column_names)
    return [tuple(r[c] for c in ("kind", *cols)) for r in table.to_pylist()]


def test_vocab_setop_except(spark, tmp_path):
    runner = TransformRunner(
        spark,
        tmp_path,
        [
            ("SELECT symbol FROM a EXCEPT SELECT symbol FROM b", "sv"),
            (
                "SELECT cast(now() as timestamp(3)) as happened_at, "
                "symbol FROM sv",
                None,
            ),
        ],
        vocab=VOCAB,
    )
    _, out1 = runner.run(
        _inputs(
            tmp_path, "r1",
            {"a": [(0, 0, ts(1), ts(1, 1), "A", 1),
                   (1, 0, ts(1), ts(1, 2), "B", 1)],
             "b": []},
            ts(1, 3),
        ),
        system_time=ts(2),
    )
    assert sorted(_oprows(out1, ("symbol",))) == [(0, "A"), (0, "B")]
    # late subtrahend arrival: the earlier emission retracts
    _, out2 = runner.run(
        _inputs(tmp_path, "r2",
                {"a": [], "b": [(0, 0, ts(3), ts(3, 1), "B", 1)]},
                ts(3, 2)),
        system_time=ts(4),
    )
    assert _oprows(out2, ("symbol",)) == [(1, "B")]


def test_vocab_changelog_join_chain(spark, tmp_path):
    left = (
        "SELECT a.happened_at as happened_at, a.symbol as symbol, "
        "a.price as a_price, b.price as b_price "
        "FROM a LEFT JOIN b ON a.symbol = b.symbol"
    )
    inner = (
        "SELECT j.happened_at as happened_at, j.symbol as symbol, "
        "j.a_price as a_price, j.b_price as b_price, c.price as c_price "
        "FROM j JOIN c ON j.symbol = c.symbol"
    )
    runner = TransformRunner(
        spark, tmp_path, queries=[(left, "j"), (inner, None)], vocab=VOCAB
    )
    cols = ("symbol", "a_price", "b_price", "c_price")
    _, out1 = runner.run(
        _inputs(
            tmp_path, "r1",
            {"a": [(0, 0, ts(2), ts(1, 0, 1), "A", 10)],
             "b": [],
             "c": [(0, 0, ts(2), ts(1, 0, 2), "A", 100)]},
            ts(1, 1, 0),
        ),
        system_time=ts(2),
    )
    assert _oprows(out1, cols) == [(0, "A", 10, None, 100)]
    # b partner arrives: pad retracts downstream, pair emits
    _, out2 = runner.run(
        _inputs(tmp_path, "r2",
                {"a": [], "b": [(1, 0, ts(3), ts(1, 0, 3), "A", 7)], "c": []},
                ts(1, 2, 0)),
        system_time=ts(3),
    )
    assert _oprows(out2, cols) == [
        (1, "A", 10, None, 100),
        (0, "A", 10, 7, 100),
    ]


ASOF_QUERY = """SELECT
  t.happened_at, t.symbol, t.price as qty, r.rate as rate,
  t.price * r.rate as total
FROM trades AS t
JOIN rates FOR SYSTEM_TIME AS OF t.happened_at AS r
ON t.symbol = r.symbol"""


def test_vocab_temporal_join(spark, tmp_path):
    runner = TransformRunner(
        spark,
        tmp_path,
        [(ASOF_QUERY, None)],
        temporal_tables=[("rates", "symbol")],
        vocab=VOCAB,
    )
    _, out1 = runner.run(
        _inputs(
            tmp_path, "r1",
            {"rates": [(0, 0, ts(5), ts(1), "A", 10)],
             "trades": [(0, 0, ts(5), ts(2), "A", 3)]},
            ts(2),
            value_cols={"rates": "rate", "trades": "price"},
        ),
        system_time=ts(5),
    )
    assert _oprows(out1, ("symbol", "qty", "rate", "total")) == [
        (0, "A", 3, 10, 30)
    ]
    # new version + new probe across the checkpoint: as-of resolves the
    # renamed-rowtime validity window restored from state
    _, out2 = runner.run(
        _inputs(
            tmp_path, "r2",
            {"rates": [(1, 0, ts(6), ts(3), "A", 11)],
             "trades": [(1, 0, ts(6), ts(4), "A", 5)]},
            ts(4),
            value_cols={"rates": "rate", "trades": "price"},
        ),
        system_time=ts(6),
    )
    assert _oprows(out2, ("symbol", "qty", "rate", "total")) == [
        (0, "A", 5, 11, 55)
    ]


MR_QUERY = """select * from tickers
MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY happened_at
  MEASURES
    FIRST(A.happened_at) AS start_time,
    LAST(C.happened_at) AS happened_at,
    A.price AS start_price,
    C.price AS end_price
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B* C)
  DEFINE
    A AS A.price < 10,
    B AS B.price >= 10 AND B.price < 100,
    C AS C.price >= 100
)"""


def test_vocab_match_recognize(spark, tmp_path):
    runner = TransformRunner(
        spark, tmp_path, queries=[(MR_QUERY, None)], vocab=VOCAB
    )
    _, out1 = runner.run(
        _inputs(
            tmp_path, "r1",
            {"tickers": [
                (0, 0, ts(2), ts(1, 0, 1), "A", 5),
                (1, 0, ts(2), ts(1, 0, 2), "A", 20),
                (2, 0, ts(2), ts(1, 0, 3), "A", 120),
                (3, 0, ts(2), ts(1, 0, 4), "A", 7),
            ]},
            ts(1, 0, 4),
        ),
        system_time=ts(2),
    )
    assert _oprows(out1, ("symbol", "start_price", "end_price")) == [
        (0, "A", 5, 120)
    ]
    # the suspended attempt (dip 7) completes across the checkpoint
    _, out2 = runner.run(
        _inputs(tmp_path, "r2",
                {"tickers": [(4, 0, ts(3), ts(1, 0, 5), "A", 150)]},
                ts(1, 0, 9)),
        system_time=ts(3),
    )
    assert _oprows(out2, ("symbol", "start_price", "end_price")) == [
        (0, "A", 7, 150)
    ]
