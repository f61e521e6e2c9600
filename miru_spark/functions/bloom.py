"""Real Bloom-filter join pruning (J6/S11): the BloomIndex analog.

miru builds a bloom filter per (field, value-set) and prunes candidate
pairs with ``mightContain`` before touching the primary index
(miru-plugin/.../index/BloomIndex.java:75-131; sizing formulas at :64-73 —
the standard m = -n ln p / ln²2, k = m/n ln 2). The Spark-native analog
prunes the PROBE side of a join map-side, before the shuffle, against a
bloom built over the (filtered) build side's keys:

- **hash**: XXH64 of the int64 key — bit-for-bit Spark's own
  ``F.xxhash64`` (pinned by tests/test_bloom.py against the JVM), so a
  future all-JVM probe path computes identical positions. Double hashing
  h1 + i*h2 like BloomIndex/Guava, h2 seeded by h1.
- **build**: one ``mapInPandas`` pass emits a packed per-partition bitmap
  (numpy, no per-row Python); the driver ORs the ≤num_partitions blobs —
  the treeAggregate shape ``df.stat.bloomFilter`` uses, without relying on
  its (version-dependent) serialization.
- **probe**: an Arrow-batched pandas UDF tests k bits against the
  broadcast bitmap. False positives are removed by the exact join that
  follows — the bloom is correctness-transparent, exactly like the
  runtime bloom join filters Spark itself injects.

At 100 TB: the bitmap is O(build keys) bits (1% fpp ≈ 9.6 bits/key), the
probe filter is map-side (no shuffle), and the pruned probe side is what
enters the join exchange — the same asymmetry miru exploits by checking
blooms before walking posting lists.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxhash64_long(values: np.ndarray, seed) -> np.ndarray:
    """Vectorized XXH64 of int64 values — identical to Spark's
    ``F.xxhash64`` on a long column (seed 42 there). ``seed`` may be a
    scalar or a per-element uint64 array (for double hashing)."""
    old = np.seterr(over="ignore")
    try:
        x = np.asarray(values, dtype=np.int64).view(np.uint64)
        h = np.uint64(seed) + _P5 + np.uint64(8) if np.isscalar(seed) else (
            np.asarray(seed, dtype=np.uint64) + _P5 + np.uint64(8)
        )
        k1 = _rotl(x * _P2, 31) * _P1
        h = h ^ k1
        h = _rotl(h, 27) * _P1 + _P4
        h ^= h >> np.uint64(33)
        h = h * _P2
        h ^= h >> np.uint64(29)
        h = h * _P3
        h ^= h >> np.uint64(32)
        return h
    finally:
        np.seterr(**old)


def optimal_num_bits(n: int, fpp: float) -> int:
    """BloomIndex.optimalNumOfBits (BloomIndex.java:64-69)."""
    return max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))


def optimal_num_hashes(n: int, m: int) -> int:
    """BloomIndex.optimalNumOfHashFunctions (BloomIndex.java:71-73)."""
    return max(1, round(m / max(n, 1) * math.log(2)))


@dataclass(frozen=True)
class BloomBits:
    words: np.ndarray  # uint64 packed bitmap
    m: int  # bit size (multiple of 64)
    k: int  # hash functions

    def might_contain_np(self, values: np.ndarray) -> np.ndarray:
        h1 = xxhash64_long(values, 42)
        h2 = xxhash64_long(values, h1)
        out = np.ones(len(values), dtype=bool)
        m = np.uint64(self.m)
        old = np.seterr(over="ignore")
        try:
            for i in range(1, self.k + 1):
                pos = (h1 + np.uint64(i) * h2) % m
                word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
                out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        finally:
            np.seterr(**old)
        return out


def _positions(values: np.ndarray, m: int, k: int) -> np.ndarray:
    h1 = xxhash64_long(values, 42)
    h2 = xxhash64_long(values, h1)
    old = np.seterr(over="ignore")
    try:
        return np.concatenate(
            [(h1 + np.uint64(i) * h2) % np.uint64(m) for i in range(1, k + 1)]
        )
    finally:
        np.seterr(**old)


def build_bloom(df: DataFrame, col: str, expected_items: int, fpp: float = 0.01) -> BloomBits:
    """Distributed build: per-partition packed bitmaps, OR'd on the driver
    (≤ num_partitions blobs of m/8 bytes — the treeAggregate shape)."""
    m = (optimal_num_bits(expected_items, fpp) + 63) // 64 * 64
    k = optimal_num_hashes(expected_items, m)
    nwords = m // 64

    def part(batches):
        bits = np.zeros(nwords, dtype=np.uint64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            pos = _positions(pdf[col].to_numpy(np.int64), m, k)
            np.bitwise_or.at(bits, (pos >> 6).astype(np.int64), np.uint64(1) << (pos & 63))
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    blobs = df.select(col).mapInPandas(part, schema="bits binary").collect()
    bits = np.zeros(nwords, dtype=np.uint64)
    for r in blobs:
        bits |= np.frombuffer(r["bits"], dtype=np.uint64)
    return BloomBits(bits, m, k)


def might_contain_col(df_col: Column, bloom: BloomBits, spark) -> Column:
    """Arrow-batched membership test against the broadcast bitmap."""
    bc = spark.sparkContext.broadcast((bloom.words.tobytes(), bloom.m, bloom.k))

    @F.pandas_udf("boolean")
    def _mc(s: pd.Series) -> pd.Series:
        words_b, m, k = bc.value
        bb = BloomBits(np.frombuffer(words_b, dtype=np.uint64), m, k)
        return pd.Series(bb.might_contain_np(s.to_numpy(np.int64)))

    return _mc(df_col)
