import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.codec import (
    block_delta_decode,
    block_delta_encode,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varbyte_byte_lengths,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_simple():
    v = np.array([0, 1, 127, 128, 300, 2**21, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_varbyte_byte_lengths_match_encoding():
    v = np.array([0, 127, 128, 16383, 16384, 2**62], dtype=np.uint64)
    nb = varbyte_byte_lengths(v)
    assert nb.sum() == len(varbyte_encode(v))
    assert nb.tolist() == [1, 1, 2, 2, 3, 9]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varbyte_roundtrip_hypothesis(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


def test_delta_roundtrip():
    ids = np.array([3, 7, 8, 100, 10**12], dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_postings_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 2**62, size=1000)).astype(np.int64)
    assert np.array_equal(decode_postings(encode_postings(ids), ids.size), ids)


def test_block_delta_roundtrip():
    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(0, 2**62, size=1000)).astype(np.int64)
    for bs in (1, 7, 128, 1000, 5000):
        starts = np.arange(0, ids.size, bs, dtype=np.int64)
        gaps = block_delta_encode(ids.copy(), starts)
        # every block start stores the absolute id -> independent decode
        assert np.array_equal(gaps[starts], ids[starts])
        assert np.array_equal(block_delta_decode(gaps, starts), ids)


def test_decode_count_mismatch_raises():
    with pytest.raises(ValueError):
        varbyte_decode(varbyte_encode(np.array([1, 2, 3], dtype=np.uint64)), count=2)


# ---- property-based round-trips (hypothesis) ------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), max_size=200))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr), arr.size), arr)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 62)), min_size=1, max_size=300, unique=True),
    st.integers(min_value=1, max_value=64),
)
def test_block_delta_roundtrip_property(ids, bs):
    arr = np.sort(np.array(ids, dtype=np.int64))
    starts = np.arange(0, arr.size, bs, dtype=np.int64)
    gaps = block_delta_encode(arr, starts)
    assert np.array_equal(block_delta_decode(gaps, starts), arr)
    # every block start is an absolute value: each block decodes alone
    for i, s in enumerate(starts):
        e = min(int(s) + bs, arr.size)
        sub = gaps[s:e]
        assert np.array_equal(block_delta_decode(sub, np.array([0])), arr[s:e])
