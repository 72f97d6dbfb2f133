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


def minhash_signature_udf(num_hashes: int = 64, shingle_k: int = 5):
    """Returns a pandas_udf: normalized text -> array<long> signature."""
    a, b = _families(num_hashes)
    a_col = a[:, None]
    b_col = b[:, None]

    @pandas_udf(ArrayType(LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for t in texts:
                sh = _shingle_hashes((t or "").encode("utf-8"), shingle_k)
                # (num_hashes, m) affine table; row-wise min is the signature.
                mins = ((a_col * sh[None, :] + b_col) & _MASK).min(axis=1)
                out.append(mins.view(np.int64))
        return pd.Series(out)

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
        return pd.Series(
            [
                _shingle_hashes((t or "").encode("utf-8"), shingle_k).view(np.int64)
                for t in texts
            ]
        )

    return hashes


def shingle_hashes_fast(text_norm: Column, shingle_k: int = 5) -> Column:
    return shingle_hashes_udf(shingle_k)(text_norm)
