"""Property-based tests (hypothesis) for the driver-side numeric kernels.

These run without a SparkSession: functions/minhash_pandas.py's shingle
hashing and signature math are pure numpy, so statistical properties of
the MinHash estimator can be checked densely and fast.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kamu_engine_flink_spark.functions.minhash_pandas import (
    _families,
    _shingle_hashes,
    minhash_signature_udf,  # noqa: F401 — import proves udf construction works
)

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _signature(shingles: np.ndarray, k: int = 64) -> np.ndarray:
    a, b = _families(k)
    with np.errstate(over="ignore"):
        return ((a[:, None] * shingles[None, :] + b[:, None]) & _MASK).min(axis=1)


def _exact_jaccard(x: np.ndarray, y: np.ndarray) -> float:
    inter = len(np.intersect1d(x, y))
    union = len(np.union1d(x, y))
    return inter / union if union else 1.0


words = st.text(alphabet="abcdefgh ", min_size=0, max_size=200)


@settings(max_examples=50, deadline=None)
@given(words)
def test_shingle_hashes_deterministic_and_distinct(text):
    h1 = _shingle_hashes(text.encode(), 5)
    h2 = _shingle_hashes(text.encode(), 5)
    assert np.array_equal(h1, h2)
    assert len(np.unique(h1)) == len(h1)
    assert len(h1) >= 1  # short text is padded to one shingle


@settings(max_examples=30, deadline=None)
@given(words, words)
def test_minhash_estimator_tracks_exact_jaccard(t1, t2):
    """|estimate - exact| stays within ~5.6 sigma of the k=64 estimator
    (sigma = sqrt(j(1-j)/64) <= 0.0625) — a bound violated with
    probability ~1e-8 per example if the estimator is unbiased."""
    s1 = _shingle_hashes(t1.encode(), 5)
    s2 = _shingle_hashes(t2.encode(), 5)
    exact = _exact_jaccard(s1, s2)
    est = float(np.mean(_signature(s1) == _signature(s2)))
    assert abs(est - exact) <= 0.35


@settings(max_examples=20, deadline=None)
@given(words)
def test_minhash_identity(text):
    s = _shingle_hashes(text.encode(), 5)
    assert np.array_equal(_signature(s), _signature(s.copy()))
    assert _exact_jaccard(s, s) == 1.0


# --- audio window tiling (operators/multimodal._audio_window_grid) -------

durations = st.lists(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=40)
window_sizes = st.integers(min_value=1, max_value=5_000)


@settings(max_examples=60, deadline=None)
@given(durations, window_sizes)
def test_audio_window_grid_tiles_exactly(durs, wms):
    from kamu_engine_flink_spark.operators.multimodal import _audio_window_grid

    nwin, idx, start, end = _audio_window_grid(durs, wms)
    clamped = [max(d, 1) for d in durs]
    # per-row window counts
    assert list(nwin) == [-(-d // wms) for d in clamped]  # ceil division
    pos = 0
    for d, n in zip(clamped, nwin):
        s, e, ix = start[pos : pos + n], end[pos : pos + n], idx[pos : pos + n]
        assert list(ix) == list(range(n))  # indices restart per row
        assert s[0] == 0 and e[-1] == d  # tiles cover [0, d)
        assert all(e[i] == s[i + 1] for i in range(n - 1))  # no gaps/overlap
        assert all(0 < e[i] - s[i] <= wms for i in range(n))  # bounded width
        pos += n
    assert pos == len(start) == len(end) == len(idx)


# ---------------------------------------------------------------------------
# Top-N changelog fold vs a brute-force oracle.
#
# fold_records (operators/topn.py) maintains a running top-N with
# insert-after-ties and emits correction pairs per trigger record. The
# independent oracle: because rows only ever move DOWN after insertion, the
# running top-N after record i equals the stable sort of rows[0..i] (by
# score, arrival-stable, Flink's row_number null ordering) truncated to N;
# emissions are the positional diff between consecutive prefixes. Every
# emission must match op-for-op, place-for-place — including None scores
# and ties.

import functools

scores = st.lists(
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)), min_size=0, max_size=40
)


@settings(max_examples=200, deadline=None)
@given(scores, st.integers(min_value=1, max_value=4), st.booleans())
def test_fold_records_matches_brute_force_oracle(vals, limit, descending):
    from kamu_engine_flink_spark.operators.topn import (
        OP_APPEND,
        OP_CORRECT_FROM,
        OP_CORRECT_TO,
        fold_records,
    )

    rows = [({"v": v, "id": i}, i) for i, v in enumerate(vals)]
    ranking: list = []
    got = list(fold_records(ranking, rows, "v", descending, limit))

    def beats(a, b):
        if a is None:
            return (not descending) and b is not None
        if b is None:
            return descending
        return (a > b) if descending else (a < b)

    def cmp(ra, rb):
        if beats(ra["v"], rb["v"]):
            return -1
        if beats(rb["v"], ra["v"]):
            return 1
        return -1 if ra["id"] < rb["id"] else 1

    expected = []
    prev_top: list = []
    for i in range(len(vals)):
        prefix = sorted((r for r, _ in rows[: i + 1]), key=functools.cmp_to_key(cmp))
        top = prefix[:limit]
        sub = 0
        for place in range(limit):
            new_r = top[place] if place < len(top) else None
            old_r = prev_top[place] if place < len(prev_top) else None
            if new_r is None:
                break
            if old_r is None:
                expected.append((i, sub, OP_APPEND, place + 1, new_r))
                sub += 1
            elif old_r != new_r:
                expected.append((i, sub, OP_CORRECT_FROM, place + 1, old_r))
                sub += 1
                expected.append((i, sub, OP_CORRECT_TO, place + 1, new_r))
                sub += 1
        prev_top = top

    assert got == expected
    # and the final persisted ranking equals the oracle's final top-N
    assert ranking == prev_top
