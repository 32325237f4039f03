"""Okapi BM25 (k1=1.2, b=0.75) — the ONE place the formula lives.

Both the engine's bucket scorer and the brute-force oracle call these
functions, with identical numpy op order, so their float64 results are
bit-identical and rank parity holds exactly (SURVEY.md §7 "rank
parity" risk).

idf is the Lucene/BM25+ variant: ln(1 + (N - df + 0.5)/(df + 0.5)),
always positive.
"""

from __future__ import annotations

import numpy as np


def idf(n_docs: int, df) -> np.ndarray | float:
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_part(tf, dl, k1: float, b: float, avgdl: float) -> np.ndarray:
    """tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) — float64 elementwise."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / avgdl)
    return tf * (k1 + 1.0) / denom


def bm25_score(tf, dl, term_idf: float, k1: float, b: float, avgdl: float) -> np.ndarray:
    return term_idf * bm25_tf_part(tf, dl, k1, b, avgdl)


def block_upper_bound(max_tf, min_dl, term_idf: float, k1: float, b: float, avgdl: float):
    """Valid per-block upper bound for block-max pruning: the tf-part is
    increasing in tf and decreasing in dl."""
    return term_idf * bm25_tf_part(max_tf, min_dl, k1, b, avgdl)
