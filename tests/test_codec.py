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

# ---- FOR codec (bit-packed frame-of-reference, postings format v3) --
from search_engine_ray.codec import (
    bit_widths,
    for_decode_blocks,
    for_decode_term,
    for_encode_partition,
)


def _multi_term_stream(rng, n_terms, max_len, id_space, bs):
    """Build a fake multi-term rank stream with block structure."""
    term_lens = rng.integers(1, max_len, size=n_terms)
    n = int(term_lens.sum())
    term_starts = np.concatenate(([0], np.cumsum(term_lens)[:-1])).astype(np.int64)
    ranks = np.concatenate(
        [np.sort(rng.choice(id_space, size=L, replace=False)) for L in term_lens]
    ).astype(np.int64)
    pos = np.arange(n) - np.repeat(term_starts, term_lens)
    blk_idx = np.nonzero(pos % bs == 0)[0].astype(np.int64)
    gaps = np.empty_like(ranks)
    gaps[0:1] = ranks[0:1]
    np.subtract(ranks[1:], ranks[:-1], out=gaps[1:])
    gaps[blk_idx] = ranks[blk_idx]
    return term_lens, term_starts, ranks, gaps, blk_idx


def test_bit_widths():
    v = np.array([0, 1, 2, 3, 4, 255, 256, 2**31 - 1], dtype=np.uint64)
    assert bit_widths(v).tolist() == [0, 1, 2, 2, 3, 8, 9, 31]


def test_for_doc_stream_roundtrip():
    rng = np.random.default_rng(3)
    for bs in (4, 128):
        term_lens, term_starts, ranks, gaps, blk_idx = _multi_term_stream(
            rng, 40, 300, 2**20, bs
        )
        buf, tb, blk_off = for_encode_partition(
            gaps, term_starts, blk_idx, firsts=ranks[blk_idx]
        )
        assert blk_off.size == blk_idx.size
        for t in range(term_lens.size):
            L = int(term_lens[t])
            g = for_decode_term(buf[tb[t] : tb[t + 1]], L, bs, with_firsts=True)
            got = block_delta_decode(g, np.arange(0, L, bs, dtype=np.int64))
            assert np.array_equal(got, ranks[term_starts[t] : term_starts[t] + L])


def test_for_value_stream_roundtrip():
    rng = np.random.default_rng(5)
    term_lens = rng.integers(1, 200, size=30)
    n = int(term_lens.sum())
    term_starts = np.concatenate(([0], np.cumsum(term_lens)[:-1])).astype(np.int64)
    pos = np.arange(n) - np.repeat(term_starts, term_lens)
    bs = 16
    blk_idx = np.nonzero(pos % bs == 0)[0].astype(np.int64)
    # mixed magnitudes: runs of tiny tf values with the odd outlier
    vals = rng.integers(1, 8, size=n).astype(np.int64)
    vals[rng.random(n) < 0.02] = 2**30
    buf, tb, _ = for_encode_partition(vals, term_starts, blk_idx)
    for t in range(term_lens.size):
        L = int(term_lens[t])
        got = for_decode_term(buf[tb[t] : tb[t + 1]], L, bs, with_firsts=False)
        assert np.array_equal(got, vals[term_starts[t] : term_starts[t] + L])


def test_for_decode_blocks_matches_full_decode():
    rng = np.random.default_rng(9)
    bs = 8
    term_lens, term_starts, ranks, gaps, blk_idx = _multi_term_stream(
        rng, 25, 120, 2**18, bs
    )
    buf, tb, _ = for_encode_partition(gaps, term_starts, blk_idx, firsts=ranks[blk_idx])
    for t in range(term_lens.size):
        L = int(term_lens[t])
        nblk = (L + bs - 1) // bs
        keep = rng.random(nblk) < 0.5
        vals, starts = for_decode_blocks(buf[tb[t] : tb[t + 1]], L, bs, keep, with_firsts=True)
        got = block_delta_decode(vals, starts) if vals.size else vals
        exp_full = ranks[term_starts[t] : term_starts[t] + L]
        exp = (
            np.concatenate([exp_full[i * bs : (i + 1) * bs] for i in range(nblk) if keep[i]])
            if keep.any()
            else np.empty(0, np.int64)
        )
        assert np.array_equal(got, exp)


def test_for_empty_and_single():
    buf, tb, off = for_encode_partition(
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
    )
    assert buf.size == 0 and tb.tolist() == [0] and off.size == 0
    one, tb1, _ = for_encode_partition(
        np.array([42], np.int64), np.array([0]), np.array([0]), firsts=np.array([42])
    )
    g = for_decode_term(one, 1, 128, with_firsts=True)
    assert np.array_equal(block_delta_decode(g, np.array([0])), [42])


def test_for_rejects_wide_values():
    with pytest.raises(ValueError):
        for_encode_partition(np.array([2**33], np.int64), np.array([0]), np.array([0]))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 28)), min_size=1, max_size=260, unique=True),
    st.integers(min_value=1, max_value=64),
)
def test_for_roundtrip_property(ids, bs):
    arr = np.sort(np.array(ids, dtype=np.int64))
    n = arr.size
    term_starts = np.array([0], dtype=np.int64)
    blk_idx = np.arange(0, n, bs, dtype=np.int64)
    gaps = block_delta_encode(arr.copy(), blk_idx)
    buf, tb, _ = for_encode_partition(gaps, term_starts, blk_idx, firsts=arr[blk_idx])
    g = for_decode_term(buf[tb[0] : tb[1]], n, bs, with_firsts=True)
    assert np.array_equal(block_delta_decode(g, blk_idx), arr)
