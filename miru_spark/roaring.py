"""Roaring bitmaps in pure numpy — the lang/repo field-filter format.

Miru stores one Roaring bitmap per (field, term) and evaluates queries as
bitmap algebra (miru-service/.../index/lab/LabInvertedIndex.java:31-73;
kernel ops miru-bitmaps-roaring6/.../MiruBitmapsRoaring.java:162-436; the
composite-OR filter pattern miru-plugin/.../index/MiruAuthzIndex.java:13).
pyroaring isn't in this container, so this is a from-scratch implementation
of the same layout (Chambi/Lemire: "Better bitmap performance with Roaring
bitmaps"): docIDs are split per 64Ki chunk (key = id >> 16); each chunk is an
**array container** (sorted uint16 low-bits) below 4096 entries or a
**bitmap container** (8 KiB fixed) at/above — the classic density cutoff
where 16 bits/entry crosses 65536 bits/container.

Serialized layout (little-endian):
  u32 magic | u32 n_containers
  per container: u32 key | u8 type (0=array, 1=bitmap) | u32 cardinality
  payloads concatenated in container order (array: card*u16; bitmap: 8192 B)

Everything is numpy-vectorized inside a container; Python touches containers
(64Ki-doc granularity), never rows. Ops provided are the ones the query path
needs: OR across a filter's value bitmaps (getCompositeAuthz), AND/ANDNOT
against a candidate docID vector, and decode/encode round-trips.
"""

from __future__ import annotations

import numpy as np

MAGIC = 0x524F4152  # "ROAR"
ARRAY, BITMAP = 0, 1
CUTOFF = 4096
BITMAP_BYTES = 8192
_HEADER = np.dtype([("key", "<u4"), ("type", "u1"), ("card", "<u4")])


def from_array(ids: np.ndarray) -> bytes:
    """Encode a sorted, duplicate-free int64 docID array."""
    ids = np.asarray(ids, dtype=np.int64)
    keys = (ids >> 16).astype(np.uint32)
    lows = (ids & 0xFFFF).astype(np.uint16)
    uk, starts = np.unique(keys, return_index=True)
    ends = np.append(starts[1:], ids.size)
    headers = np.zeros(uk.size, dtype=_HEADER)
    payloads: list[bytes] = []
    for i, (k, s, e) in enumerate(zip(uk, starts, ends)):
        card = int(e - s)
        headers[i]["key"] = k
        headers[i]["card"] = card
        if card >= CUTOFF:
            headers[i]["type"] = BITMAP
            bits = np.zeros(65536, dtype=np.uint8)
            bits[lows[s:e]] = 1
            payloads.append(np.packbits(bits, bitorder="little").tobytes())
        else:
            headers[i]["type"] = ARRAY
            payloads.append(lows[s:e].tobytes())
    head = np.array([(MAGIC, uk.size)], dtype="<u4,<u4").tobytes()
    return head + headers.tobytes() + b"".join(payloads)


def _parse(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """→ (header recarray, payload byte offsets [n+1])."""
    magic, n = np.frombuffer(blob[:8], dtype="<u4")
    if magic != MAGIC:
        raise ValueError("not a roaring blob")
    headers = np.frombuffer(blob, dtype=_HEADER, count=int(n), offset=8)
    sizes = np.where(headers["type"] == BITMAP, BITMAP_BYTES, headers["card"] * 2)
    offsets = np.zeros(int(n) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    offsets += 8 + headers.nbytes
    return headers, offsets


def to_array(blob: bytes) -> np.ndarray:
    """Decode back to a sorted int64 docID array."""
    headers, offsets = _parse(blob)
    out = []
    for h, s, e in zip(headers, offsets[:-1], offsets[1:]):
        base = np.int64(h["key"]) << 16
        if h["type"] == BITMAP:
            bits = np.unpackbits(np.frombuffer(blob, np.uint8, BITMAP_BYTES, s), bitorder="little")
            out.append(base + np.nonzero(bits)[0].astype(np.int64))
        else:
            lows = np.frombuffer(blob, np.uint16, int(h["card"]), s)
            out.append(base + lows.astype(np.int64))
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


def cardinality(blob: bytes) -> int:
    headers, _ = _parse(blob)
    return int(headers["card"].sum())


def contains(blob: bytes, ids: np.ndarray) -> np.ndarray:
    """Vectorized membership: bool mask per id (ids sorted ascending).

    The AND-into-candidate-set op: only containers whose key appears in the
    query ids are touched (the skipping miru gets from per-container keys)."""
    ids = np.asarray(ids, dtype=np.int64)
    mask = np.zeros(ids.size, dtype=bool)
    if not ids.size:
        return mask
    headers, offsets = _parse(blob)
    qkeys = (ids >> 16).astype(np.uint32)
    qlows = (ids & 0xFFFF).astype(np.uint16)
    # locate each container key within the query's key runs
    pos = np.searchsorted(qkeys, headers["key"], side="left")
    end = np.searchsorted(qkeys, headers["key"], side="right")
    for h, s, p, q in zip(headers, offsets[:-1], pos, end):
        if p == q:
            continue  # no query ids fall in this 64Ki chunk
        lo = qlows[p:q]
        if h["type"] == BITMAP:
            payload = np.frombuffer(blob, np.uint8, BITMAP_BYTES, s)
            mask[p:q] = (payload[lo >> 3] >> (lo & 7).astype(np.uint8)) & 1 == 1
        else:
            arr = np.frombuffer(blob, np.uint16, int(h["card"]), s)
            idx = np.searchsorted(arr, lo)
            idxc = np.minimum(idx, arr.size - 1)
            mask[p:q] = (idx < arr.size) & (arr[idxc] == lo)
    return mask


def or_many(blobs: list[bytes]) -> bytes:
    """Container-level union (the composite-authz OR,
    MiruAuthzIndex.getCompositeAuthz). Bitmap|bitmap is a byte-OR; mixed and
    array|array unions promote to bitmap when they cross the cutoff."""
    if not blobs:
        return from_array(np.empty(0, dtype=np.int64))
    # gather per-key container pieces from every blob
    per_key: dict[int, list[tuple[int, bytes]]] = {}
    for blob in blobs:
        headers, offsets = _parse(blob)
        for h, s, e in zip(headers, offsets[:-1], offsets[1:]):
            per_key.setdefault(int(h["key"]), []).append((int(h["type"]), blob[s:e]))
    out_parts: list[np.ndarray] = []
    for key in sorted(per_key):
        pieces = per_key[key]
        if len(pieces) == 1 and pieces[0][0] == ARRAY:
            lows = np.frombuffer(pieces[0][1], np.uint16)
        else:
            bits = np.zeros(BITMAP_BYTES, dtype=np.uint8)
            for typ, payload in pieces:
                if typ == BITMAP:
                    np.bitwise_or(bits, np.frombuffer(payload, np.uint8), out=bits)
                else:
                    lo = np.frombuffer(payload, np.uint16)
                    np.bitwise_or.at(bits, lo >> 3, np.uint8(1) << (lo & 7).astype(np.uint8))
            idx = np.nonzero(np.unpackbits(bits, bitorder="little"))[0]
            lows = idx.astype(np.uint16)
        out_parts.append((np.int64(key) << 16) + lows.astype(np.int64))
    return from_array(np.concatenate(out_parts) if out_parts else np.empty(0, dtype=np.int64))


def and_array(blob: bytes, ids: np.ndarray) -> np.ndarray:
    """blob ∧ sorted-id-vector → the surviving ids (candidate filtering)."""
    ids = np.asarray(ids, dtype=np.int64)
    return ids[contains(blob, ids)]


def andnot_array(ids: np.ndarray, blob: bytes) -> np.ndarray:
    """ids ∧ ¬blob — miru's removal-mask ANDNOT
    (MiruBitmapsRoaring.java:457-505)."""
    ids = np.asarray(ids, dtype=np.int64)
    return ids[~contains(blob, ids)]
