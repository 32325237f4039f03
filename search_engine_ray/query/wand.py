"""Block-max dynamic pruning (MaxScore/WAND family) for top-k OR
queries.

The index stores, per (term, bucket) posting list, per-block metadata
(`blk_first` doc id, byte offsets of each block in the doc/tf/dl
streams, `blk_max_tf`, `blk_min_dl`). BM25's tf-part is increasing in
tf and decreasing in dl, so `idf * tf_part(max_tf, min_dl)` is a valid
per-block score upper bound — computable at query time with global
idf/avgdl, no stats baked at build.

Algorithm (vectorized block-max MaxScore, term-at-a-time):

  1. order terms by descending whole-list max upper bound; suffix sums
     S[j] bound the total contribution of terms j..end.
  2. process terms in that order, keeping a candidate set with partial
     scores. θ = k-th best partial score (a valid lower bound of the
     final k-th total, since contributions are non-negative).
  3. for term j, DECODE ONLY blocks where
        ub_block + S[j+1] >= θ      (a new doc there could still reach
                                     the top k; strict-< skip keeps
                                     θ-ties correct for doc_id breaks)
     or the block contains a current candidate (its exact total is
     still being accumulated).
  4. final ranking = (score desc, doc_id asc) over candidates.

Rank/score-identical to the exhaustive scorer for the docs it returns
(every returned doc has its full exact score); `total` becomes a LOWER
BOUND (number of scanned matches) — the same trade Lucene makes with
its total-hit-count threshold, so the engine keeps pruning opt-in and
uses the exhaustive path when the caller needs exact totals/facets
(reference `$facet` R13).

Skipped-block decode is cheap because every block restarts with an
absolute doc id: concatenating the kept blocks' byte slices is still a
valid stream with restarts at known positions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from search_engine_ray.codec import block_delta_decode, for_decode_blocks, varbyte_decode
from search_engine_ray.query import scoring


def _list_views(col):
    """Zero-copy row accessor for a list<int> column: row(i) -> numpy
    view of that row's values (no per-row as_py())."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    vals = arr.values.to_numpy(zero_copy_only=False)

    def view(i: int) -> np.ndarray:
        return vals[offs[i] : offs[i + 1]]

    return view


def _bin_views(col):
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype, count=len(arr) + arr.offset + 1)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
    base = arr.offset

    def view(i: int) -> np.ndarray:
        return data[offs[base + i] : offs[base + i + 1]]

    return view


def _decode_kept(
    buf: np.ndarray, offs: np.ndarray, ends: np.ndarray, keep: np.ndarray, counts: np.ndarray
):
    """Concatenate kept blocks' byte views -> (values, block_starts)."""
    kept = np.nonzero(keep)[0]
    data = np.concatenate([buf[offs[i] : ends[i]] for i in kept]) if kept.size else np.empty(0, np.uint8)
    kept_counts = counts[keep]
    starts = np.concatenate(([0], np.cumsum(kept_counts)[:-1])) if kept_counts.size else np.empty(0, np.int64)
    vals = varbyte_decode(data, int(kept_counts.sum()))
    return vals, starts.astype(np.int64)


def score_or_query_pruned(
    t: pa.Table,
    spec,
    term_to_leaves: dict[str, list[tuple[int, float]]],
    k: int,
    row_univ: list,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Top-k for a pure-OR query over one bucket's posting rows.

    row_univ: per posting row, the owning shard's sorted docmap ids —
    the v2 rank streams decode to ranks which are translated through
    it per kept block; `blk_first` metadata is already in hash space
    so skip decisions never touch the universe.

    Returns (doc_ids, scores, scanned_matches): the top-k candidate
    pool ordered (score desc, id asc), with exact scores; and the
    count of matches actually scored (>= |top-k|, <= true total)."""
    n_rows = t.num_rows
    rows = []
    terms = t["term"].to_pylist()
    dfl = t["df_local"].to_numpy()
    v_max_tf = _list_views(t["blk_max_tf"])
    v_min_dl = _list_views(t["blk_min_dl"])
    v_first = _list_views(t["blk_first"])
    v_doff = _list_views(t["blk_doc_off"])
    v_toff = _list_views(t["blk_tf_off"])
    v_loff = _list_views(t["blk_dl_off"])
    v_doc = _bin_views(t["doc_bytes"])
    v_tf = _bin_views(t["tf_bytes"])
    v_dl = _bin_views(t["dl_bytes"])
    for ri in range(n_rows):
        # one scoring entry per (posting row, owning clause): a term
        # key backing several clauses contributes each clause's part
        for li, tidf in term_to_leaves[terms[ri]]:
            leaf = spec.leaves[li]
            df = int(dfl[ri])
            ub = scoring.block_upper_bound(
                v_max_tf(ri).astype(np.float64), v_min_dl(ri).astype(np.float64),
                tidf, spec.k1, spec.b, leaf.avgdl,
            )
            rows.append((li, ri, tidf, leaf.avgdl, df, ub))
    # process highest-potential terms first
    rows.sort(key=lambda r: -float(r[5].max()) if r[5].size else 0.0)
    maxes = np.array([float(r[5].max()) if r[5].size else 0.0 for r in rows])
    suffix = np.concatenate((np.cumsum(maxes[::-1])[::-1][1:], [0.0]))

    cand_ids = np.empty(0, dtype=np.int64)
    cand_scores = np.empty(0, dtype=np.float64)
    decoded_parts: list[tuple[int, int, np.ndarray, np.ndarray]] = []
    bs = spec.block_size
    theta0 = float(getattr(spec, "initial_theta", -np.inf))
    for j, (li, ri, tidf, avgdl, df, ub) in enumerate(rows):
        if cand_ids.size >= k:
            theta = max(
                theta0,
                float(np.partition(cand_scores, cand_scores.size - k)[cand_scores.size - k]),
            )
        else:
            theta = theta0
        nblk = ub.size
        blk_first = v_first(ri).astype(np.int64, copy=False)
        # block posting counts: full bs except the last
        counts = np.full(nblk, bs, dtype=np.int64)
        if nblk:
            counts[-1] = df - bs * (nblk - 1)
        # keep: could produce a new top-k doc, or contains a candidate
        keep = (ub + suffix[j]) >= theta
        if cand_ids.size and nblk:
            nxt = np.append(blk_first[1:], np.iinfo(np.int64).max)
            lo = np.searchsorted(cand_ids, blk_first)
            hi = np.searchsorted(cand_ids, nxt)
            keep |= hi > lo
        if not keep.any():
            continue
        doc_buf = v_doc(ri)
        tf_buf = v_tf(ri)
        dl_buf = v_dl(ri)
        if spec.postings_format == 3:
            # v3 FOR slices: per-block widths/offsets come from the
            # slice's own header — decode only the kept blocks
            gaps, starts = for_decode_blocks(doc_buf, df, bs, keep, with_firsts=True)
            ids = row_univ[ri][block_delta_decode(gaps, starts)]
            tfs, _ = for_decode_blocks(tf_buf, df, bs, keep, with_firsts=False)
            dls, _ = for_decode_blocks(dl_buf, df, bs, keep, with_firsts=False)
        else:
            d_off = v_doff(ri).astype(np.int64, copy=False)
            t_off = v_toff(ri).astype(np.int64, copy=False)
            l_off = v_loff(ri).astype(np.int64, copy=False)
            d_end = np.append(d_off[1:], len(doc_buf))
            t_end = np.append(t_off[1:], len(tf_buf))
            l_end = np.append(l_off[1:], len(dl_buf))
            gaps, starts = _decode_kept(doc_buf, d_off, d_end, keep, counts)
            ids = row_univ[ri][block_delta_decode(gaps.astype(np.int64), starts)]
            tfs, _ = _decode_kept(tf_buf, t_off, t_end, keep, counts)
            dls, _ = _decode_kept(dl_buf, l_off, l_end, keep, counts)
        sc = scoring.bm25_score(tfs, dls, tidf, spec.k1, spec.b, avgdl)
        decoded_parts.append((li, ri, ids, sc))
        # merge into candidate set (ids sorted within a posting list);
        # copies: cand_scores is accumulated in place and must not
        # alias the pristine per-part arrays kept in decoded_parts
        if cand_ids.size == 0:
            cand_ids, cand_scores = ids.copy(), sc.copy()
        else:
            pos = np.searchsorted(cand_ids, ids)
            pos_c = np.clip(pos, 0, cand_ids.size - 1)
            hit = cand_ids[pos_c] == ids
            cand_scores[pos_c[hit]] += sc[hit]
            new_ids = ids[~hit]
            new_sc = sc[~hit]
            if new_ids.size:
                cand_ids = np.concatenate((cand_ids, new_ids))
                cand_scores = np.concatenate((cand_scores, new_sc))
                order = np.argsort(cand_ids, kind="stable")
                cand_ids, cand_scores = cand_ids[order], cand_scores[order]
    scanned = int(cand_ids.size)  # unique matched docs actually scored
    # Recompute candidate scores in the EXHAUSTIVE scorer's canonical
    # accumulation order (leaf id, then posting-row id) so float64 sums
    # are bit-identical to the unpruned path. Top-k docs provably have
    # every contribution decoded (a block skipped at term j bounds any
    # doc inside below the final θ, so a true top-k doc is never in
    # one); other candidates may be partial, but they rank below θ on
    # both partial and exact sums, so top-k selection is unaffected.
    canonical = np.zeros(cand_ids.size)
    for _, _, ids, sc in sorted(decoded_parts, key=lambda p: (p[0], p[1])):
        pos = np.searchsorted(cand_ids, ids)
        canonical[pos] += sc
    cand_scores = canonical
    if cand_ids.size > k:
        thresh = np.partition(cand_scores, cand_ids.size - k)[cand_ids.size - k]
        sel = np.nonzero(cand_scores >= thresh)[0]
        order = sel[np.lexsort((cand_ids[sel], -cand_scores[sel]))][:k]
    else:
        order = np.lexsort((cand_ids, -cand_scores))
    return cand_ids[order], cand_scores[order], scanned
