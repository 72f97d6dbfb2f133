"""Shingling, MinHash, and SimHash building blocks.

JVM-side only: xxhash64 (fast 64-bit hash, seedable) for internal
signatures, md5 where a cross-engine-reproducible hash is needed. MinHash
math: for k independent hash functions we use xxhash64 with seeds 0..k-1
(Spark's xxhash64 takes a seed via the second arg pattern
xxhash64(col, lit(seed)) hashing the pair — equivalent to salting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-grams of the normalized text."""
    padded = F.when(F.length(col) < k, F.rpad(col, k, "_")).otherwise(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(padded) - (k - 1), F.lit(1))),
            lambda i: padded.substr(i, F.lit(k)),
        )
    )


def word_ngrams(tokens_col: Column, n: int = 3) -> Column:
    """Distinct word n-grams (joined with single spaces) of a token array."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(tokens_col) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(tokens_col, i + 1, n)),
        )
    )


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """array<long> MinHash signature: element i = min over shingles of
    xxhash64(i, shingle) — xxhash64 over the (seed, value) pair gives k
    independent hash families from one JVM hash function."""

    def _hash_with_seed(seed: int):
        # Closure factory (pyspark introspects lambda arity — a defaulted
        # second parameter would be bound to the array index).
        return lambda s: F.xxhash64(F.lit(seed), s)

    return F.array(
        *[
            F.array_min(F.transform(shingles, _hash_with_seed(i)))
            for i in range(num_hashes)
        ]
    )


def lsh_bands(signature: Column, bands: int) -> Column:
    """Split a signature into `bands` equal slices and hash each ->
    array<struct<band:int, key:long>> for bucket joins."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(
                            signature,
                            b * (F.size(signature) / bands).cast("int") + 1,
                            (F.size(signature) / bands).cast("int"),
                        ),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("key"),
        ),
    )


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token array, as BIGINT. Bit b of the result is
    set iff the sum over tokens of ±1 (sign of bit b of xxhash64(token))
    is positive. Pure higher-order functions: one xxhash64 per token, then
    64 bit-count folds — all inside codegen."""
    hashes = F.transform(tokens_col, lambda t: F.xxhash64(t))

    def _fold(shift: int):
        # Closure factory: pyspark introspects lambda arity, so the shift
        # amount must not appear as a (defaulted) lambda parameter.
        return lambda acc, h: acc + (
            F.shiftrightunsigned(h, shift).bitwiseAND(F.lit(1).cast("bigint")) * 2 - 1
        )

    packed = F.lit(0).cast("bigint")
    for b in range(64):  # literal shift amounts (shift functions require them)
        bit_sum = F.aggregate(hashes, F.lit(0).cast("bigint"), _fold(b))
        bit = F.when(bit_sum > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        packed = packed.bitwiseOR(F.shiftleft(bit, b))
    return packed


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
