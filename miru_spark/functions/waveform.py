"""Waveform codec: delta + zigzag + varint + DEFLATE.

miru compresses analytics waveforms (time-bucketed counts) with delta
encoding + Snappy before shipping them between services
(miru-plugin/.../solution/Waveform.java:22-90: `compress` deltas at :36-48,
snappy at :52; `rawSignal` reverses it). Same shape here with stdlib zlib
(snappy isn't in this container): int64 counts → first-order deltas →
zigzag (small negatives stay small) → LEB128 varint (numpy-vectorized,
miru_spark.codec) → DEFLATE. Typical waveforms (flat-ish counts) compress
~10x.
"""

from __future__ import annotations

import zlib

import numpy as np

from miru_spark.codec import decode_varint, encode_varint


def compress_waveform(counts: np.ndarray) -> bytes:
    """int64 bucket counts → compressed bytes."""
    c = np.asarray(counts, dtype=np.int64)
    deltas = np.diff(c, prepend=np.int64(0))
    zig = (deltas.astype(np.uint64) << np.uint64(1)) ^ (deltas >> np.int64(63)).astype(np.uint64)
    return zlib.compress(encode_varint(zig), level=6)


def decompress_waveform(blob: bytes) -> np.ndarray:
    """Inverse of :func:`compress_waveform`."""
    zig = decode_varint(zlib.decompress(blob))
    deltas = (zig >> np.uint64(1)).astype(np.int64) ^ -(zig & np.uint64(1)).astype(np.int64)
    return np.cumsum(deltas)
