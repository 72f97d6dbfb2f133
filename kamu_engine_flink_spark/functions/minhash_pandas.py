"""Vectorized MinHash signatures as an Arrow-batched Pandas UDF.

The pure-expression MinHash in hashing.py is correct but its higher-order
functions (aggregate/zip_with/transform) are CodegenFallback in Spark —
interpreted row-at-a-time with per-shingle array allocation, ~200k shingle
-hash evals/sec/core. This numpy path does the same math two-plus orders
of magnitude faster and is the production choice for corpus-scale dedup:

  - char k-gram shingles via a rolling polynomial over the utf-8 bytes
    (vectorized, mod 2^64 wraparound);
  - `num_hashes` independent families via the affine trick
    sig_i = min((a_i * h + b_i) mod 2^64) with odd multipliers derived
    deterministically from splitmix64(i) — no stored model, stable across
    runs/executors (no reliance on Python's seeded hash()).

The hash family differs from hashing.minhash_signature (xxhash64); both
are valid MinHash instantiations — LSH/banding layers above are agnostic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_POLY_B = np.uint64(1099511628211)  # FNV prime — good odd multiplier


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic parameter derivation (public splitmix64 finalizer)."""
    x = (x + np.uint64(0x9E3779B97F4B9115)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


def _families(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    idx = np.arange(num_hashes, dtype=np.uint64)
    a = _splitmix64(idx) | np.uint64(1)  # odd multipliers
    b = _splitmix64(idx + np.uint64(num_hashes))
    return a, b


def _shingle_hashes(data: bytes, k: int) -> np.ndarray:
    """Distinct rolling-polynomial hashes of all char k-grams."""
    if len(data) < k:
        data = data + b"_" * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    m = len(arr) - k + 1
    h = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h * _POLY_B + arr[j : m + j]) & _MASK
    return np.unique(h)


def _batch_shingle_segments(texts, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shingle hashes for a WHOLE Arrow batch in one vectorized pass.

    Concatenates every row's utf-8 bytes (short rows padded to k), runs the
    rolling polynomial once over the concatenation, and extracts only the
    in-row windows (k-grams crossing row boundaries are dropped by index
    arithmetic, not masking). Returns (hashes, segment_starts, seg_lengths)
    where row i's multiset of shingle hashes is
    hashes[segment_starts[i] : segment_starts[i] + seg_lengths[i]].
    Identical hash values to _shingle_hashes modulo distinctness — callers
    that need set semantics dedupe per segment."""
    bs = [(t or "").encode("utf-8") for t in texts]
    bs = [b if len(b) >= k else b + b"_" * (k - len(b)) for b in bs]
    n = len(bs)
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    m = lens - k + 1
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(m[:-1], out=starts[1:])
    total_m = int(m.sum())
    arr = np.frombuffer(b"".join(bs), dtype=np.uint8).astype(np.uint64)
    hm = arr.shape[0] - k + 1
    h = np.zeros(hm, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h * _POLY_B + arr[j : hm + j]) & _MASK
    valid_idx = np.arange(total_m, dtype=np.int64) + np.repeat(offs - starts, m)
    return h[valid_idx], starts, m


def minhash_signature_udf(num_hashes: int = 64, shingle_k: int = 5):
    """Returns a pandas_udf: normalized text -> array<long> signature."""
    a, b = _families(num_hashes)

    @pandas_udf(ArrayType(LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:
            return pd.Series([], dtype=object)
        # Whole-batch vectorization: one rolling-hash pass over the
        # concatenated batch, then a segmented min per hash family
        # (np.minimum.reduceat) — no per-row Python loop, no per-row
        # (num_hashes x m) allocation, and no np.unique sort (the min of
        # a multiset equals the min of its distinct values).
        h, starts, _m = _batch_shingle_segments(texts, shingle_k)
        sigs = np.empty((num_hashes, len(texts)), dtype=np.uint64)
        v = np.empty_like(h)
        with np.errstate(over="ignore"):
            for i in range(num_hashes):
                # uint64 arithmetic wraps mod 2^64 natively — no mask op;
                # out= buffers keep the loop allocation-free.
                np.multiply(h, a[i], out=v)
                np.add(v, b[i], out=v)
                np.minimum.reduceat(v, starts, out=sigs[i])
        rows = np.ascontiguousarray(sigs.T).view(np.int64)
        return pd.Series(list(rows))

    return sig


def minhash_signature_fast(text_norm: Column, num_hashes: int = 64, shingle_k: int = 5) -> Column:
    """Drop-in for hashing.minhash_signature on a pre-normalized text
    column (normalization itself stays JVM-side codegen)."""
    return minhash_signature_udf(num_hashes, shingle_k)(text_norm)


def shingle_hashes_udf(shingle_k: int = 5):
    """pandas_udf: normalized text -> sorted distinct array<long> of
    shingle hashes, for exact-Jaccard verification of LSH candidates
    (array_intersect/union on the results stays JVM-side)."""

    @pandas_udf(ArrayType(LongType()))
    def hashes(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:
            return pd.Series([], dtype=object)
        # Batch-vectorized distinct-per-row: one lexsort of (segment, hash)
        # over the whole batch, adjacent-duplicate mask, then split by the
        # per-segment distinct counts — same sorted-distinct arrays as
        # np.unique per row without the per-row Python loop.
        h, starts, m = _batch_shingle_segments(texts, shingle_k)
        seg = np.repeat(np.arange(len(texts), dtype=np.int64), m)
        order = np.lexsort((h, seg))
        hs = h[order]
        sg = seg[order]
        keep = np.ones(hs.shape[0], dtype=bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (sg[1:] != sg[:-1])
        counts = np.add.reduceat(keep, starts) if hs.shape[0] else np.zeros(0, np.int64)
        distinct = hs[keep].view(np.int64)
        bounds = np.cumsum(counts[:-1])
        return pd.Series(np.split(distinct, bounds))

    return hashes


def shingle_hashes_fast(text_norm: Column, shingle_k: int = 5) -> Column:
    return shingle_hashes_udf(shingle_k)(text_norm)
