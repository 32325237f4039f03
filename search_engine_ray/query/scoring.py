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


# ---- pluggable similarity modules (Lucene Similarity parity) --------
#
# Semantics from the reference's Lucene/ES lineage
# (/root/reference/search_utils.py builds Atlas $search queries whose
# scoring is Lucene's): BM25Similarity is the default; the engine also
# offers ClassicSimilarity (TF-IDF VSM), LMDirichletSimilarity and
# BooleanSimilarity, selected per query via search(similarity=...).
# Each formula mirrors its DuckDB oracle's op order exactly so float64
# results are bit-identical (same rank-parity discipline as BM25).

SIMILARITIES = ("bm25", "classic", "lm_dirichlet", "boolean", "dfr")


def classic_idf(n_docs: int, df) -> np.ndarray | float:
    """Lucene ClassicSimilarity idf: 1 + ln(N / (df + 1))."""
    df = np.asarray(df, dtype=np.float64)
    return 1.0 + np.log(n_docs / (df + 1.0))


def classic_score(tf, dl, w) -> np.ndarray:
    """Lucene ClassicSimilarity (practical TF-IDF VSM, queryNorm and
    coord omitted as in Lucene 8+): w * sqrt(tf) / sqrt(dl) where
    ``w = classic_idf**2 * boost`` is the precomputed per-term weight
    (idf appears squared: once as query weight, once as term weight)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return w * np.sqrt(tf) / np.sqrt(dl)


def lm_dirichlet_score(tf, dl, mu_p: float, mu: float, wmult: float = 1.0) -> np.ndarray:
    """Lucene LMDirichletSimilarity: per matched term
    ``max(0, ln(1 + tf/(mu*p)) + ln(mu/(dl + mu)))`` with
    p = cf/total_len the collection language model. ``mu_p`` is the
    precomputed mu*p (the per-term constant); the clip at 0 is
    Lucene's (common terms in long docs would otherwise score
    negative). ``wmult`` is the linear query boost."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    raw = np.log(1.0 + tf / mu_p) + np.log(mu / (dl + mu))
    return wmult * np.maximum(raw, 0.0)


def dfr_basic_in(n_docs: int, df) -> np.ndarray | float:
    """DFR BasicModel I(n): log2((N + 1) / (df + 0.5)) — the per-term
    information content under the inverse-document-frequency model."""
    df = np.asarray(df, dtype=np.float64)
    return np.log2((n_docs + 1.0) / (df + 0.5))


def dfr_score(tf, dl, w, avgdl: float) -> np.ndarray:
    """Lucene DFRSimilarity(BasicModelIn, AfterEffectL,
    NormalizationH2 c=1): tfn = tf * log2(1 + avgdl/dl), score =
    w * tfn / (1 + tfn) with ``w = dfr_basic_in * boost`` the
    precomputed per-term weight (AfterEffect L is the 1/(1+tfn)
    factor; Lucene 8 folds it as I(n)*tfn * 1/(1+tfn))."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    tfn = tf * np.log2(1.0 + avgdl / dl)
    return w * tfn / (1.0 + tfn)


def leaf_score(
    tf, dl, w: float, k1: float, b: float, avgdl: float,
    similarity: str = "bm25", mu: float = 2000.0, wmult: float = 1.0,
) -> np.ndarray:
    """Similarity dispatch for one (term-key, posting-rows) pair.
    ``w`` is the per-key resolved weight whose meaning depends on the
    similarity: bm25 -> idf*boost, classic -> classic_idf**2*boost,
    lm_dirichlet -> mu*p(t|C) (boost rides ``wmult``),
    dfr -> dfr_basic_in*boost,
    boolean -> boost (Lucene BooleanSimilarity: a flat boost per
    matching term)."""
    if similarity == "bm25":
        return bm25_score(tf, dl, w, k1, b, avgdl)
    if similarity == "classic":
        return classic_score(tf, dl, w)
    if similarity == "lm_dirichlet":
        return lm_dirichlet_score(tf, dl, w, mu, wmult)
    if similarity == "dfr":
        return dfr_score(tf, dl, w, avgdl)
    if similarity == "boolean":
        return np.full(np.asarray(tf).shape, float(w), dtype=np.float64)
    raise ValueError(f"unknown similarity {similarity!r}")
