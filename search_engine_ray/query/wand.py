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

from search_engine_ray.codec import block_delta_decode, varbyte_decode
from search_engine_ray.query import scoring


def _decode_kept(
    buf: bytes, offs: np.ndarray, ends: np.ndarray, keep: np.ndarray, counts: np.ndarray
):
    """Concatenate kept blocks' byte slices -> (values, block_starts)."""
    mv = memoryview(buf)
    parts = [mv[offs[i] : ends[i]] for i in np.nonzero(keep)[0]]
    data = b"".join(parts)
    kept_counts = counts[keep]
    starts = np.concatenate(([0], np.cumsum(kept_counts)[:-1])) if kept_counts.size else np.empty(0, np.int64)
    vals = varbyte_decode(data, int(kept_counts.sum()))
    return vals, starts.astype(np.int64)


def score_or_query_pruned(
    t: pa.Table, spec, term_to_leaf: dict[str, tuple[int, float]], k: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Top-k for a pure-OR query over one bucket's posting rows.

    Returns (doc_ids, scores, scanned_matches): the top-k candidate
    pool ordered (score desc, id asc), with exact scores; and the
    count of matches actually scored (>= |top-k|, <= true total)."""
    n_rows = t.num_rows
    rows = []
    for ri in range(n_rows):
        term = t["term"][ri].as_py()
        li, tidf = term_to_leaf[term]
        leaf = spec.leaves[li]
        df = int(t["df_local"][ri].as_py())
        max_tf = np.asarray(t["blk_max_tf"][ri].as_py(), dtype=np.float64)
        min_dl = np.asarray(t["blk_min_dl"][ri].as_py(), dtype=np.float64)
        ub = scoring.block_upper_bound(max_tf, min_dl, tidf, spec.k1, spec.b, leaf.avgdl)
        rows.append((ri, tidf, leaf.avgdl, df, ub))
    # process highest-potential terms first
    rows.sort(key=lambda r: -float(r[4].max()) if r[4].size else 0.0)
    maxes = np.array([float(r[4].max()) if r[4].size else 0.0 for r in rows])
    suffix = np.concatenate((np.cumsum(maxes[::-1])[::-1][1:], [0.0]))

    cand_ids = np.empty(0, dtype=np.int64)
    cand_scores = np.empty(0, dtype=np.float64)
    decoded_parts: list[tuple[int, int, np.ndarray, np.ndarray]] = []
    bs = spec.block_size
    for j, (ri, tidf, avgdl, df, ub) in enumerate(rows):
        if cand_ids.size >= k:
            theta = np.partition(cand_scores, cand_scores.size - k)[cand_scores.size - k]
        else:
            theta = -np.inf
        nblk = ub.size
        blk_first = np.asarray(t["blk_first"][ri].as_py(), dtype=np.int64)
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
        d_off = np.asarray(t["blk_doc_off"][ri].as_py(), dtype=np.int64)
        t_off = np.asarray(t["blk_tf_off"][ri].as_py(), dtype=np.int64)
        l_off = np.asarray(t["blk_dl_off"][ri].as_py(), dtype=np.int64)
        doc_buf = t["doc_bytes"][ri].as_py()
        tf_buf = t["tf_bytes"][ri].as_py()
        dl_buf = t["dl_bytes"][ri].as_py()
        d_end = np.append(d_off[1:], len(doc_buf))
        t_end = np.append(t_off[1:], len(tf_buf))
        l_end = np.append(l_off[1:], len(dl_buf))
        gaps, starts = _decode_kept(doc_buf, d_off, d_end, keep, counts)
        ids = block_delta_decode(gaps.astype(np.int64), starts)
        tfs, _ = _decode_kept(tf_buf, t_off, t_end, keep, counts)
        dls, _ = _decode_kept(dl_buf, l_off, l_end, keep, counts)
        sc = scoring.bm25_score(tfs, dls, tidf, spec.k1, spec.b, avgdl)
        li, _ = term_to_leaf[t["term"][ri].as_py()]
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
