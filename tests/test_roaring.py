"""Roaring codec: round-trips, container-type selection at the 4096 cutoff,
membership/AND/ANDNOT/OR vs numpy set oracles (the same hand-checked-algebra
style as the reference's MiruBitmapsAggregationTest)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from miru_spark import roaring


def _ids(xs):
    return np.unique(np.asarray(sorted(xs), dtype=np.int64))


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=1 << 40), max_size=300))
def test_roundtrip_property(xs):
    ids = _ids(xs)
    assert (roaring.to_array(roaring.from_array(ids)) == ids).all()
    assert roaring.cardinality(roaring.from_array(ids)) == ids.size


def test_bitmap_container_kicks_in_above_cutoff():
    # dense chunk 0 (bitmap), sparse chunk 5 (array), id past 2^32
    ids = np.unique(np.concatenate([
        np.arange(0, 10_000, dtype=np.int64),          # card 10000 >= 4096
        np.arange(5 << 16, (5 << 16) + 100, 7),        # card 15 < 4096
        np.array([1 << 40], dtype=np.int64),
    ]))
    blob = roaring.from_array(ids)
    headers, _ = roaring._parse(blob)
    types = {int(h["key"]): int(h["type"]) for h in headers}
    assert types[0] == roaring.BITMAP
    assert types[5] == roaring.ARRAY
    assert (roaring.to_array(blob) == ids).all()


@settings(max_examples=30, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=200_000), max_size=200),
    st.sets(st.integers(min_value=0, max_value=200_000), max_size=200),
)
def test_and_andnot_or_match_numpy(a, b):
    ia, ib = _ids(a), _ids(b)
    blob_b = roaring.from_array(ib)
    assert (roaring.and_array(blob_b, ia) == np.intersect1d(ia, ib)).all()
    assert (roaring.andnot_array(ia, blob_b) == np.setdiff1d(ia, ib)).all()
    union = roaring.to_array(roaring.or_many([roaring.from_array(ia), blob_b]))
    assert (union == np.union1d(ia, ib)).all()


def test_or_promotes_to_bitmap():
    a = np.arange(0, 3000, dtype=np.int64)
    b = np.arange(2000, 6000, dtype=np.int64)  # union card 6000 >= 4096
    blob = roaring.or_many([roaring.from_array(a), roaring.from_array(b)])
    headers, _ = roaring._parse(blob)
    assert int(headers[0]["type"]) == roaring.BITMAP
    assert (roaring.to_array(blob) == np.arange(0, 6000)).all()


def test_dense_bitmap_membership():
    ids = np.arange(0, 65536, 2, dtype=np.int64)  # 32768 entries, bitmap
    blob = roaring.from_array(ids)
    q = np.arange(0, 100, dtype=np.int64)
    assert (roaring.contains(blob, q) == (q % 2 == 0)).all()


def test_empty():
    e = roaring.from_array(np.empty(0, dtype=np.int64))
    assert roaring.to_array(e).size == 0
    assert roaring.cardinality(e) == 0
    assert roaring.and_array(e, np.array([1, 2], dtype=np.int64)).size == 0
    assert roaring.or_many([]) == e
