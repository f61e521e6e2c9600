"""Posting-list codec: delta-gap + LEB128 varint, fully vectorized in numpy.

The analog of miru's Roaring-bitmap posting storage
(miru-service/.../index/lab/LabInvertedIndex.java:31-73 and the atomized
per-container key scheme at :87-150): docIDs are partition-local dense ints,
stored sorted, so delta gaps are small and varint-compress well; TF payloads
ride alongside (miru keeps TF via the cardinality store,
miru-service/.../index/lab/LabFieldIndex.java:478-542). Block metadata
(last docID + max TF per block) enables block-max skipping at query time —
the generalization of miru's `considerIfLastIdGreaterThanN` pruning
(miru-plugin/.../solution/MiruAggregateUtil.java:1130,1181).

No per-row Python anywhere: encode/decode are O(max_varint_len) numpy passes.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized; <=10 passes)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes per value: ceil(bit_length/7), min 1
    bits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        bits[nz] += 1
        tmp = tmp >> np.uint64(1)
    nbytes = np.maximum((bits + 6) // 7, 1)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    tmp = v.copy()
    max_len = int(nbytes.max())
    for k in range(max_len):
        active = nbytes > k
        byte = (tmp[active] & np.uint64(0x7F)).astype(np.uint8)
        more = nbytes[active] > (k + 1)
        byte[more] |= 0x80
        out[starts[active] + k] = byte
        tmp[active] = tmp[active] >> np.uint64(7)
    return out.tobytes()


def decode_varint(blob: bytes) -> np.ndarray:
    """Decode LEB128 back to uint64 (vectorized)."""
    b = np.frombuffer(blob, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    term_idx = np.nonzero(b < 0x80)[0]  # last byte of each value
    starts = np.empty_like(term_idx)
    starts[0] = 0
    starts[1:] = term_idx[:-1] + 1
    lengths = term_idx - starts + 1
    out = np.zeros(term_idx.size, dtype=np.uint64)
    max_len = int(lengths.max())
    for k in range(max_len):
        active = lengths > k
        out[active] |= (b[starts[active] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return out


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes, bytes, bytes]:
    """Encode one term's posting run (docIDs strictly ascending).

    Returns (docids_blob, tfs_blob, block_last_blob, block_max_tf_blob):
    delta+varint docIDs, varint TFs, and per-BLOCK_SIZE-block skip metadata
    (raw int64 last-docID array, raw int32 max-TF array).
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    t = np.asarray(tfs, dtype=np.int64)
    deltas = np.diff(d, prepend=np.int64(0)).astype(np.uint64)
    n_blocks = (d.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    last_idx = np.minimum(np.arange(1, n_blocks + 1) * BLOCK_SIZE, d.size) - 1
    block_last = d[last_idx].astype(np.int64)
    block_max_tf = np.maximum.reduceat(t, np.arange(0, d.size, BLOCK_SIZE)).astype(np.int32)
    return (
        encode_varint(deltas),
        encode_varint(t.astype(np.uint64)),
        block_last.tobytes(),
        block_max_tf.tobytes(),
    )


def decode_postings(docids_blob: bytes, tfs_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a posting run → (doc_ids int64 ascending, tfs int64)."""
    deltas = decode_varint(docids_blob).astype(np.int64)
    doc_ids = np.cumsum(deltas)
    tfs = decode_varint(tfs_blob).astype(np.int64)
    return doc_ids, tfs


def decode_block_meta(block_last_blob: bytes, block_max_tf_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    return (
        np.frombuffer(block_last_blob, dtype=np.int64),
        np.frombuffer(block_max_tf_blob, dtype=np.int32),
    )


def encode_id_set(doc_ids: np.ndarray) -> bytes:
    """Compress a sorted docID set (the lang/repo filter 'bitmaps' — our
    numpy analog of miru's per-field Roaring filters,
    miru-service/.../index/lab/LabAuthzIndex.java)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    deltas = np.diff(d, prepend=np.int64(0)).astype(np.uint64)
    return encode_varint(deltas)


def decode_id_set(blob: bytes) -> np.ndarray:
    return np.cumsum(decode_varint(blob).astype(np.int64))
