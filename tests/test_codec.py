import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from miru_spark.codec import (
    BLOCK_SIZE,
    decode_block_meta,
    decode_id_set,
    decode_postings,
    decode_varint,
    encode_id_set,
    encode_postings,
    encode_varint,
)


def test_varint_roundtrip_small():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1], dtype=np.uint64)
    assert (decode_varint(encode_varint(v)) == v).all()


def test_varint_empty():
    assert encode_varint(np.empty(0, dtype=np.uint64)) == b""
    assert decode_varint(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varint_roundtrip_property(xs):
    v = np.array(xs, dtype=np.uint64)
    assert (decode_varint(encode_varint(v)) == v).all()


def test_postings_roundtrip():
    rng = np.random.default_rng(7)
    docs = np.unique(rng.integers(0, 10**6, size=1000)).astype(np.int64)
    tfs = rng.integers(1, 50, size=docs.size).astype(np.int64)
    db, tb, bl, bmt = encode_postings(docs, tfs)
    d2, t2 = decode_postings(db, tb)
    assert (d2 == docs).all()
    assert (t2 == tfs).all()
    last, maxtf = decode_block_meta(bl, bmt)
    n_blocks = (docs.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert last.size == n_blocks == maxtf.size
    assert last[-1] == docs[-1]
    for i in range(n_blocks):
        blk = tfs[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE]
        assert maxtf[i] == blk.max()
        assert last[i] == docs[min((i + 1) * BLOCK_SIZE, docs.size) - 1]


def test_id_set_roundtrip():
    ids = np.array([0, 5, 6, 1000, 10**9], dtype=np.int64)
    assert (decode_id_set(encode_id_set(ids)) == ids).all()


def test_compression_is_compact():
    docs = np.arange(0, 100_000, dtype=np.int64)  # delta=1 → 1 byte each
    tfs = np.ones(docs.size, dtype=np.int64)
    db, tb, _, _ = encode_postings(docs, tfs)
    assert len(db) < docs.size * 1.1
    assert len(tb) == docs.size


def test_run_concatenation_with_first_varint_rewrite():
    """The merge's zero-decode concatenation: rewriting only the first varint
    of each run (and shifting block_last) must decode identically to a full
    decode → offset → re-encode merge."""
    import numpy as np

    from miru_spark.codec import (
        decode_block_meta,
        decode_postings,
        encode_postings,
        encode_varint,
    )

    rng = np.random.default_rng(3)
    runs = []
    for _ in range(5):
        n = int(rng.integers(1, 400))
        local = np.unique(rng.integers(0, 1000, size=n)).astype(np.int64)
        tfs = rng.integers(1, 9, size=local.size).astype(np.int64)
        runs.append((local, tfs))
    offsets = np.cumsum([0] + [1000] * (len(runs) - 1))

    # oracle: decode-free-merge target
    gdocs = np.concatenate([d + o for (d, _), o in zip(runs, offsets)])
    gtfs = np.concatenate([t for _, t in runs])

    d_parts, t_parts, bl_parts, bm_parts = [], [], [], []
    prev_last = 0
    for (local, tfs), o in zip(runs, offsets):
        db, tb, bl, bm = encode_postings(local, tfs)
        k = 1
        while db[k - 1] & 0x80:
            k += 1
        d_parts.append(encode_varint(np.array([int(local[0]) + o - prev_last], dtype=np.uint64)))
        d_parts.append(db[k:])
        t_parts.append(tb)
        bl_parts.append((np.frombuffer(bl, dtype=np.int64) + o).tobytes())
        bm_parts.append(bm)
        prev_last = int(local[-1]) + o

    got_d, got_t = decode_postings(b"".join(d_parts), b"".join(t_parts))
    assert (got_d == gdocs).all()
    assert (got_t == gtfs).all()
    bl, bm = decode_block_meta(b"".join(bl_parts), b"".join(bm_parts))
    # block_last values must be real docIDs in ascending order ending at max
    assert (np.diff(bl) > 0).all() and bl[-1] == gdocs[-1]
    assert np.isin(bl, gdocs).all()


def test_waveform_codec_roundtrip_and_compression():
    """miru's Waveform delta+compress analog (Waveform.java:22-90):
    round-trip exact, and flat-ish waveforms compress well."""
    import numpy as np

    from miru_spark.functions.waveform import compress_waveform, decompress_waveform

    rng = np.random.default_rng(11)
    flat = 1000 + rng.integers(-3, 4, size=512)
    blob = compress_waveform(flat)
    assert (decompress_waveform(blob) == flat).all()
    assert len(blob) < flat.nbytes / 8  # delta+varint+deflate earns its keep

    for wave in (np.zeros(1, dtype=np.int64), rng.integers(-(10**12), 10**12, size=100),
                 np.array([], dtype=np.int64)):
        assert (decompress_waveform(compress_waveform(wave)) == wave).all()
