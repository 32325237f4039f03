"""Query rescoring (Elasticsearch `rescore` / Lucene RescorerQuery):
run a cheap primary query over the whole index, then re-rank only the
top ``window`` hits with a more expensive secondary query, combining
as ``query_weight * primary + rescore_query_weight * secondary``
(ES ``score_mode: total``). Window docs the secondary doesn't match
keep their primary score (secondary contributes 0) — ES semantics.

Scale shape: the primary top-window is the engine's distributed
scatter-gather top-k; the secondary pass scores ONLY the window's doc
ids (a FilterSpec-restricted search, bounded by ``window``), so the
expensive query never touches the full corpus. The final combine is
over ``window`` rows — driver-side by construction."""

from __future__ import annotations

import numpy as np
import pandas as pd

from search_engine_ray.query import FilterSpec


def rescore_search(
    engine,
    primary,
    secondary,
    window: int = 50,
    k: int = 10,
    query_weight: float = 1.0,
    rescore_weight: float = 2.0,
) -> pd.DataFrame:
    """Top ``k`` of the re-ranked window: columns (doc_id, score) with
    score = query_weight*primary + rescore_weight*secondary, ordered
    by (score desc, doc_id asc). Scores are raw (unrounded)."""
    r1 = engine.search(primary, k=window, with_metadata=False)
    hits = r1.hits
    ids = hits["doc_id"].to_numpy().astype(np.int64)
    sec = {}
    if ids.size:
        r2 = engine.search(
            secondary,
            k=int(ids.size),
            filter_spec=FilterSpec((("doc_id", "in", [int(i) for i in ids]),)),
            with_metadata=False,
        )
        sec = dict(zip(r2.hits["doc_id"].astype(np.int64), r2.hits["score"]))
    prim = hits["score"].to_numpy().astype(np.float64)
    final = query_weight * prim + rescore_weight * np.array(
        [sec.get(int(i), 0.0) for i in ids], dtype=np.float64
    )
    order = np.lexsort((ids, -final))[:k]
    return pd.DataFrame({"doc_id": ids[order], "score": final[order]}).reset_index(
        drop=True
    )
