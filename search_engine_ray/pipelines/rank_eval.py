"""ES `_rank_eval` API: score a set of ranked-retrieval requests
against known relevance judgments and report standard IR metrics.

Reference lineage: Elasticsearch's Ranking Evaluation API takes
`requests: [{id, request, ratings}]` and a metric; here every request
returns ALL of precision@k, recall@k, reciprocal rank, DCG@k and
NDCG@k (binary gains, log2(position+1) discount — the ES/trec_eval
convention), rounded with the repo's DuckDB-tie rounding so the SQL
oracle hash-matches.

The evaluation itself is driver-side arithmetic over each request's
top-k page (k rows per request — never the corpus); the ranked pages
come from the engine's scatter-gather search, so the heavy lifting
stays distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from search_engine_ray.ops.rounding import round_half_up


def rank_eval(engine, requests, k: int = 10) -> pd.DataFrame:
    """requests: iterable of (request_id, query, relevant_doc_ids).
    Returns one row per request:
    (request_id, p_at_k, recall_at_k, reciprocal_rank, dcg_at_k,
    ndcg_at_k), ordered by request_id."""
    rows = []
    for rid, q, rel in requests:
        hits = engine.search(q, k=k, with_metadata=False).hits
        ids = np.asarray(hits["doc_id"].to_numpy(), dtype=np.int64)
        relset = np.unique(np.asarray(list(rel), dtype=np.int64))
        isrel = np.isin(ids, relset)
        pos = np.nonzero(isrel)[0] + 1  # 1-based rank of each hit
        n_hit = int(isrel.sum())
        nr = int(relset.size)
        p_at_k = n_hit / float(k)
        recall = n_hit / float(nr) if nr else 0.0
        rr = 1.0 / float(pos[0]) if pos.size else 0.0
        dcg = float(np.sum(1.0 / np.log2(pos + 1.0))) if pos.size else 0.0
        ideal = np.arange(1, min(k, nr) + 1, dtype=np.float64)
        idcg = float(np.sum(1.0 / np.log2(ideal + 1.0))) if nr else 0.0
        ndcg = dcg / idcg if idcg else 0.0
        rows.append((rid, p_at_k, recall, rr, dcg, ndcg))
    out = pd.DataFrame(
        rows,
        columns=[
            "request_id", "p_at_k", "recall_at_k", "reciprocal_rank",
            "dcg_at_k", "ndcg_at_k",
        ],
    ).sort_values("request_id", kind="mergesort").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = round_half_up(out[c].to_numpy())
    return out
