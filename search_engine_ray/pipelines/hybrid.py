"""Hybrid retrieval: lexical BM25 + embedding similarity fused with
Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009 — the
standard hybrid-search combiner, used as-is by Elasticsearch/OpenSearch
`rrf`). Each retriever contributes 1/(k0 + rank) per doc; ranks come
from each list's own deterministic ordering, so the fusion needs no
score calibration between BM25 and cosine space.

Scale shape: fusion runs on the retrievers' TOP-K lists — bounded by
construction (k docs per retriever, not the corpus) — so a driver-side
merge is the right physics; the expensive parts (BM25 scatter-gather,
ANN cluster-pruned scan) stay distributed inside their engines."""

from __future__ import annotations

import numpy as np
import pandas as pd


def rrf_fuse(
    rankings: list[pd.DataFrame],
    id_col: str = "doc_id",
    k0: int = 60,
    k: int = 10,
) -> pd.DataFrame:
    """Fuse ranked lists: each input DataFrame must already be in rank
    order (position 0 = rank 1). Returns the top ``k`` of
    ``sum over lists of 1/(k0 + rank)`` with (rrf desc, id asc)
    tiebreak, plus each doc's per-list rank (0 = absent).

    1/(k0+rank) values are exact dyadic-free doubles and each doc sums
    at most len(rankings) of them in list order, so the fused score is
    deterministic and SQL-reproducible bit-for-bit."""
    scores: dict[int, float] = {}
    ranks: list[dict[int, int]] = []
    for df in rankings:
        r: dict[int, int] = {}
        for pos, doc in enumerate(df[id_col].tolist(), start=1):
            r[int(doc)] = pos
        ranks.append(r)
    for r in ranks:
        for doc, pos in r.items():
            scores[doc] = scores.get(doc, 0.0) + 1.0 / (k0 + pos)
    rows = sorted(((-s, d) for d, s in scores.items()))
    out_ids = [d for _, d in rows[:k]]
    return pd.DataFrame(
        {
            id_col: np.asarray(out_ids, dtype=np.int64),
            "rrf": [scores[d] for d in out_ids],
            **{
                f"rank_{i}": [ranks[i].get(d, 0) for d in out_ids]
                for i in range(len(ranks))
            },
        }
    )


def hybrid_search(
    engine,
    keyword_query,
    emb_ds,
    query_vec: np.ndarray,
    k: int = 10,
    depth: int = 50,
    k0: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    query_id: int = -1,
) -> pd.DataFrame:
    """BM25 + brute-cosine hybrid: run the keyword query through the
    scatter-gather engine and the query vector through the distributed
    cosine top-k, take each retriever's top ``depth``, RRF-fuse. Doc
    identity is ``id_col`` == ``vec_id_col`` (the corpus and its
    embedding table share ids)."""
    from search_engine_ray.ops.ann import cosine_topk

    lex = engine.search(keyword_query, k=depth, with_metadata=False).hits[[id_col]]
    sem = (
        cosine_topk(
            emb_ds, query_vec[None, :], np.array([query_id], dtype=np.int64), k=depth
        )
        .to_pandas()
        .sort_values(["cos", vec_id_col], ascending=[False, True], kind="mergesort")
    )
    sem = sem.rename(columns={vec_id_col: id_col})[[id_col]]
    return rrf_fuse([lex.reset_index(drop=True), sem.reset_index(drop=True)], id_col, k0, k)
