"""Posting-list compression: delta + variable-byte, vectorized in numpy.

Layout (little-endian base-128 varbyte): each value is 1..10 bytes,
low 7 bits first; the high bit (0x80) is a continuation flag set on
every byte except the last of a value.

Doc IDs are stored as deltas of the sorted list (first value absolute).
IDs are 63-bit hashes (sparse), so deltas are large but uniform; within
a doc-shard bucket of D docs the mean gap is 2^63/D. tf and doc-length
streams are varbyte of the raw small ints.

Everything is numpy-vectorized — encode is O(10) masked passes, decode
is O(max_len) masked gathers; no Python loop over values. This is the
hot path of both the groupby-merge encode stage and the query-side
scorer, so it must not be per-row Python.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def varbyte_encode(values: np.ndarray, nb: np.ndarray | None = None) -> bytes:
    """Encode a uint64/int64 (non-negative) array to varbyte bytes.

    `nb` is the optional precomputed output of varbyte_byte_lengths for
    the same values — callers that already need the lengths (for block
    offset math) pass it back in to skip a second 9-pass scan."""
    v = np.ascontiguousarray(values).astype(np.uint64, copy=False)
    if v.size == 0:
        return b""
    if nb is None:
        nb = varbyte_byte_lengths(v)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    # loop bound = widest value's byte count, not the format maximum:
    # tf/dl streams are 1-2 bytes wide, so this is 1-2 passes, not 10
    for i in range(int(nb.max())):
        mask = nb > i
        byte = ((v[mask] >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] - 1) > i
        byte[cont] |= 0x80
        out[starts[mask] + i] = byte
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero((b & 0x80) == 0)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.shape, dtype=np.uint64)
    for i in range(int(lengths.max())):
        mask = lengths > i
        vals[mask] |= (b[starts[mask] + i] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * i)
    if count is not None and vals.size != count:
        raise ValueError(f"decoded {vals.size} values, expected {count}")
    return vals


def varbyte_byte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (for block offset computation)."""
    v = np.ascontiguousarray(values).astype(np.uint64, copy=False)
    nb = np.ones(v.shape, dtype=np.int64)
    if v.size == 0:
        return nb
    # stop at the widest value actually present: each threshold test is
    # a full-array pass, and small-int streams (tf, dl) need only one
    vmax = v.max()
    for t in _THRESHOLDS:
        if vmax < t:
            break
        nb += (v >= t).astype(np.int64)
    return nb


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids -> gaps (first value absolute)."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    out = np.empty_like(ids)
    out[0:1] = ids[0:1]
    np.subtract(ids[1:], ids[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode."""
    return np.cumsum(gaps.astype(np.int64, copy=False))


def encode_postings(doc_ids: np.ndarray) -> bytes:
    return varbyte_encode(delta_encode(doc_ids).astype(np.uint64))


def decode_postings(buf: bytes, count: int | None = None) -> np.ndarray:
    return delta_decode(varbyte_decode(buf, count).astype(np.int64))


def block_delta_encode(sorted_ids: np.ndarray, block_starts: np.ndarray) -> np.ndarray:
    """Delta-encode with a restart (absolute value) at every block start,
    so each block decodes independently (skip-pointer support)."""
    gaps = delta_encode(sorted_ids)
    gaps[block_starts] = sorted_ids[block_starts]
    return gaps


def block_delta_decode(gaps: np.ndarray, block_starts: np.ndarray) -> np.ndarray:
    """Inverse of block_delta_encode, vectorized: global cumsum, then
    subtract each block's carried-over prefix."""
    g = gaps.astype(np.int64, copy=False)
    c = np.cumsum(g)
    if block_starts.size <= 1:
        return c
    carry = np.zeros(block_starts.size, dtype=np.int64)
    carry[1:] = c[block_starts[1:] - 1]
    lens = np.diff(np.append(block_starts, g.size))
    return c - np.repeat(carry, lens)
