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


# ---------------------------------------------------------------------------
# Bit-packed frame-of-reference codec ("for", postings format v3).
#
# PForDelta-style binary packing without the patching stage (Zukowski et
# al., "Super-Scalar RAM-CPU Cache Compression", ICDE 2006; Lemire &
# Boytsov, "Decoding billions of integers per second through
# vectorization", SPE 2015): each posting block stores a 1-byte bit
# width b = bits(max value in block) and packs every value at b bits,
# little-endian bit order. Outlier values only widen their own block
# (128 values), not the stream, so explicit exception patching is not
# needed at our block size. Rank-gap streams (format v2 made gaps
# dense small ints) pack at 2-6 bits where varbyte pays 8 — roughly
# another 2x on the doc/tf streams.
#
# Per-TERM slice layout (a term's byte slice decodes independently,
# same contract as the varbyte streams):
#
#   [nblk x u8 widths][nblk x u32-LE firsts (doc stream only)][payloads]
#
# The doc stream keeps each block's absolute first rank in the fixed
# 4-byte header (it restarts the delta chain, exactly like
# block_delta_encode) and packs only the L-1 in-block gaps; tf/dl
# streams pack all L values and have no firsts section. payload_i =
# ceil(Lp_i * b_i / 8) bytes. All encode/decode paths are vectorized
# ACROSS blocks (grouped by width, <= 33 groups) — no Python loop over
# blocks or values.
# ---------------------------------------------------------------------------

_FOR_MAX_BITS = 32


def bit_widths(values: np.ndarray) -> np.ndarray:
    """Bits needed to represent each value (0 for value 0)."""
    v = np.ascontiguousarray(values).astype(np.uint64, copy=False)
    b = np.zeros(v.shape, dtype=np.int64)
    if v.size == 0:
        return b
    vmax = int(v.max())
    for i in range(64):
        if vmax < (1 << i):
            break
        b += v >= np.uint64(1 << i)
    return b


def for_encode_partition(
    values: np.ndarray,
    term_starts: np.ndarray,
    blk_idx: np.ndarray,
    firsts: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FOR-encode a whole partition's stream in one vectorized pass.

    values: payload values at ALL n positions; when ``firsts`` is given
    (doc stream) the positions in ``blk_idx`` carry their block's
    absolute first value in the header instead and are excluded from
    the packed payload. Every term starts on a block boundary.

    Returns ``(buf, term_bounds, blk_payload_off)``: the byte buffer,
    each term's [start, end) byte bounds (int64[T+1]), and each
    block's payload byte offset WITHIN its term's slice.
    """
    v = np.ascontiguousarray(values).astype(np.uint64, copy=False)
    n = v.size
    T = int(term_starts.size)
    nblk = int(blk_idx.size)
    if n == 0:
        return (
            np.empty(0, np.uint8),
            np.zeros(T + 1, np.int64),
            np.empty(0, np.int64),
        )
    with_firsts = firsts is not None
    blk_lens = np.diff(np.append(blk_idx, n))
    if with_firsts:
        vp = v.copy()
        vp[blk_idx] = 0  # excluded from payload; max over rest
        Lp = blk_lens - 1
    else:
        vp = v
        Lp = blk_lens
    blk_max = np.maximum.reduceat(vp, blk_idx)
    b = bit_widths(blk_max)
    b[Lp == 0] = 0
    if int(b.max(initial=0)) > _FOR_MAX_BITS:
        raise ValueError("FOR codec packs values < 2^32; got a wider block max")
    pay_bytes = (Lp * b + 7) // 8
    blk_term = np.searchsorted(term_starts, blk_idx, side="right") - 1
    nblk_t = np.bincount(blk_term, minlength=T)
    term_blk_starts = np.concatenate(([0], np.cumsum(nblk_t)[:-1]))
    hdr_t = nblk_t * (5 if with_firsts else 1)
    cpb = np.concatenate(([0], np.cumsum(pay_bytes)))
    term_pay = cpb[term_blk_starts + nblk_t] - cpb[term_blk_starts]
    term_bounds = np.concatenate(([0], np.cumsum(hdr_t + term_pay)))
    buf = np.zeros(int(term_bounds[-1]), dtype=np.uint8)
    blk_pos_in_term = np.arange(nblk) - np.repeat(term_blk_starts, nblk_t)
    tb_of_blk = term_bounds[blk_term]
    buf[tb_of_blk + blk_pos_in_term] = b.astype(np.uint8)
    if with_firsts:
        f = np.ascontiguousarray(firsts).astype(np.uint64, copy=False)
        if f.size and int(f.max()) >= 1 << 32:
            raise ValueError("FOR codec block-first values must fit uint32")
        base = tb_of_blk + nblk_t[blk_term] + 4 * blk_pos_in_term
        for k in range(4):
            buf[base + k] = ((f >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8)
    hdr_end = tb_of_blk + hdr_t[blk_term]
    within = cpb[:-1] - cpb[term_blk_starts][blk_term]
    blk_pay_global = hdr_end + within
    start_p = blk_idx + (1 if with_firsts else 0)
    for bb in np.unique(b):
        bb = int(bb)
        if bb == 0:
            continue
        sel = np.nonzero(b == bb)[0]
        Ls = Lp[sel]
        Lmax = int(Ls.max())
        idx = start_p[sel][:, None] + np.arange(Lmax)[None, :]
        valid = np.arange(Lmax)[None, :] < Ls[:, None]
        m = np.where(valid, vp[np.minimum(idx, n - 1)], np.uint64(0))
        bits = (
            (m[:, :, None] >> np.arange(bb, dtype=np.uint64)[None, None, :]) & np.uint64(1)
        ).astype(np.uint8)
        packed = np.packbits(bits.reshape(sel.size, Lmax * bb), axis=1, bitorder="little")
        kb = (Ls * bb + 7) // 8
        col = np.arange(packed.shape[1])[None, :]
        keepm = col < kb[:, None]
        buf[(blk_pay_global[sel][:, None] + col)[keepm]] = packed[keepm]
    return buf, term_bounds, blk_pay_global - tb_of_blk


def _for_header(b8: np.ndarray, n: int, bs: int, with_firsts: bool):
    """Parse a term slice's header: per-block widths, payload lengths,
    payload byte offsets and (doc stream) absolute first values."""
    nblk = (n + bs - 1) // bs
    widths = b8[:nblk].astype(np.int64)
    blk_lens = np.full(nblk, bs, dtype=np.int64)
    if nblk:
        blk_lens[-1] = n - bs * (nblk - 1)
    if with_firsts:
        raw = b8[nblk : nblk + 4 * nblk].astype(np.uint64)
        firsts = (raw[0::4] | raw[1::4] << np.uint64(8) | raw[2::4] << np.uint64(16) | raw[3::4] << np.uint64(24)).astype(np.int64)
        Lp = blk_lens - 1
        hdr = 5 * nblk
    else:
        firsts = None
        Lp = blk_lens
        hdr = nblk
    pay_bytes = (Lp * widths + 7) // 8
    pay_off = hdr + np.concatenate(([0], np.cumsum(pay_bytes)[:-1]))
    return nblk, widths, blk_lens, Lp, pay_off, firsts


def _for_unpack_into(
    b8: np.ndarray,
    widths: np.ndarray,
    Lp: np.ndarray,
    pay_off: np.ndarray,
    out: np.ndarray,
    start_p: np.ndarray,
) -> None:
    """Unpack per-block payloads into ``out`` at ``start_p`` positions,
    vectorized per width group."""
    for bb in np.unique(widths):
        bb = int(bb)
        if bb == 0:
            continue
        sel = np.nonzero(widths == bb)[0]
        Ls = Lp[sel]
        Lmax = int(Ls.max())
        if Lmax == 0:
            continue
        kb = (Ls * bb + 7) // 8
        col = np.arange(int(kb.max()))[None, :]
        src = pay_off[sel][:, None] + col
        mat = np.where(col < kb[:, None], b8[np.minimum(src, b8.size - 1)], 0).astype(np.uint8)
        bits = np.unpackbits(mat, axis=1, bitorder="little")
        nb_full = bits.shape[1] // bb
        vals = np.zeros((sel.size, nb_full), dtype=np.uint64)
        for j in range(bb):
            vals |= bits[:, j :: bb][:, :nb_full].astype(np.uint64) << np.uint64(j)
        tgt = start_p[sel][:, None] + np.arange(Lmax)[None, :]
        validm = np.arange(Lmax)[None, :] < Ls[:, None]
        out[tgt[validm]] = vals[:, :Lmax][validm].astype(out.dtype)


def for_decode_term(buf, n: int, bs: int, with_firsts: bool) -> np.ndarray:
    """Decode one term's v3 slice. Doc streams (``with_firsts``) return
    the gaps-with-restarts layout of block_delta_encode (feed to
    block_delta_decode); tf/dl streams return the raw values."""
    b8 = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    nblk, widths, blk_lens, Lp, pay_off, firsts = _for_header(b8, n, bs, with_firsts)
    blk_starts = np.arange(0, n, bs, dtype=np.int64)
    start_p = blk_starts + (1 if with_firsts else 0)
    _for_unpack_into(b8, widths, Lp, pay_off, out, start_p)
    if with_firsts:
        out[blk_starts] = firsts
    return out


def for_decode_blocks(
    buf, n: int, bs: int, keep: np.ndarray, with_firsts: bool
) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the kept blocks of a v3 term slice (block-max
    skipping). Returns ``(values, starts)``: the kept blocks' values
    concatenated (doc stream: gaps with each kept block's absolute
    first at its start) and each kept block's start offset within the
    output — the same contract as wand's varbyte _decode_kept."""
    b8 = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    nblk, widths, blk_lens, Lp, pay_off, firsts = _for_header(b8, n, bs, with_firsts)
    kept = np.nonzero(keep)[0]
    kept_lens = blk_lens[kept]
    total = int(kept_lens.sum())
    starts = np.concatenate(([0], np.cumsum(kept_lens)[:-1])) if kept.size else np.empty(0, np.int64)
    out = np.zeros(total, dtype=np.int64)
    if total == 0:
        return out, starts.astype(np.int64)
    start_p = starts + (1 if with_firsts else 0)
    _for_unpack_into(b8, widths[kept], Lp[kept], pay_off[kept], out, start_p)
    if with_firsts:
        out[starts] = firsts[kept]
    return out, starts.astype(np.int64)


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
