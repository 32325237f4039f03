"""Brute-force BM25 oracle (SURVEY.md §5 item 2).

Transparent reference implementation: tokenize every doc with the same
analyzer, score every doc with the same scoring.py BM25 functions in
the same clause order (so float64 results are bit-identical to the
engine), full stable sort by (score desc, doc_id asc). O(N x Q) —
test-scale only, never a Ray pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np
import pandas as pd
import pyarrow as pa

from search_engine_ray.analysis import get_analyzer
from search_engine_ray.config import IndexConfig
from search_engine_ray.index.build import doc_uid
from search_engine_ray.query import scoring
from search_engine_ray.query.executor import (
    DecayBoost,
    DocAttrBoost,
    FieldValueBoost,
    FilterSpec,
)
from search_engine_ray.query.qast import (
    Compound,
    BestFields,
    CrossFields,
    Fuzzy,
    NumericRange,
    Phonetic,
    Prefix,
    Regexp,
    Synonyms,
    Term,
    Wildcard,
)


@dataclass
class OracleIndex:
    config: IndexConfig
    doc_ids: np.ndarray
    tokens: dict[str, list[list[str]]]  # field -> per-doc token list
    dls: dict[str, np.ndarray]
    avgdl: dict[str, float]
    meta: pd.DataFrame  # doc_id + docmap columns

    @property
    def n_docs(self) -> int:
        return self.doc_ids.size


def build_oracle(table: pa.Table, config: IndexConfig | None = None, sha_col: str | None = None) -> OracleIndex:
    config = config or IndexConfig()
    sha_col = sha_col or config.fields[0].name
    df = table.to_pandas()
    if config.use_native_id:
        ids = df[config.id_cols[0]].to_numpy().astype(np.int64)
    else:
        ids = np.array(
            [doc_uid(str(df.iloc[i][c]) for c in config.id_cols) for i in range(len(df))],
            dtype=np.int64,
        )
    order = np.argsort(ids, kind="stable")
    df = df.iloc[order].reset_index(drop=True)
    ids = ids[order]
    tokens: dict[str, list[list[str]]] = {}
    dls: dict[str, np.ndarray] = {}
    avgdl: dict[str, float] = {}
    an = get_analyzer(config.analyzer)
    for spec in config.fields:
        toks = [an.analyze(t or "") for t in df[spec.name]]
        tokens[spec.name] = toks
        dl = np.array([len(t) for t in toks], dtype=np.int64)
        dls[spec.name] = dl
        # same expression as build_index stats: total_len / n_docs
        avgdl[spec.name] = float(int(dl.sum()) / ids.size) if ids.size else 0.0
    import hashlib

    meta_cols = {"doc_id": ids}
    for c in config.docmap_cols:
        if c == "content_sha256":
            meta_cols[c] = [
                hashlib.sha256((s or "").encode("utf-8")).hexdigest() for s in df[sha_col]
            ]
        else:
            meta_cols[c] = df[c].to_numpy()
    return OracleIndex(config, ids, tokens, dls, avgdl, pd.DataFrame(meta_cols))


def _leaf_tf_df(oix: OracleIndex, leaf) -> tuple[np.ndarray, int]:
    """Per-doc tf and global df for a leaf (prefix tf sums matching
    tokens — identical to the edge-n-gram index-time semantics)."""
    toks = oix.tokens[leaf.field]
    tf = np.zeros(oix.n_docs, dtype=np.int64)
    if isinstance(leaf, Term):
        for i, ts in enumerate(toks):
            tf[i] = sum(1 for t in ts if t == leaf.token)
    elif isinstance(leaf, Prefix):
        p = leaf.prefix
        for i, ts in enumerate(toks):
            tf[i] = sum(1 for t in ts if t.startswith(p))
    elif isinstance(leaf, Phonetic):
        from search_engine_ray.analysis import PHONETIC_ALGOS

        algo = PHONETIC_ALGOS[oix.config.field_by_name(leaf.field).phonetic_algo]
        key = algo(leaf.token)
        for i, ts in enumerate(toks):
            tf[i] = sum(1 for t in ts if algo(t) == key)
    elif isinstance(leaf, Synonyms):
        # SynonymQuery: tf sums over the set; the returned df is the
        # MAX per-token df (what the blended idf is computed from)
        syn = set(leaf.tokens)
        for i, ts in enumerate(toks):
            tf[i] = sum(1 for t in ts if t in syn)
        max_df = max(
            (sum(1 for ts in toks if tok in ts) for tok in leaf.tokens), default=0
        )
        return tf, int(max_df)
    elif isinstance(leaf, Fuzzy):
        # multi-term rewrite: the ORACLE path for Fuzzy is the engine's
        # expansion parity test; here the whole expansion is treated as
        # per-token contributions by the caller, so this branch only
        # serves non-scoring (filter/mustNot) roles where a single
        # combined tf/df suffices
        from search_engine_ray.analysis import levenshtein

        for i, ts in enumerate(toks):
            tf[i] = sum(1 for t in ts if levenshtein(t, leaf.token, leaf.max_edits) <= leaf.max_edits)
    elif isinstance(leaf, (Wildcard, Regexp)):
        import fnmatch
        import re

        if isinstance(leaf, Wildcard):
            rx = re.compile(fnmatch.translate(leaf.pattern))
        else:
            rx = re.compile(f"(?:{leaf.pattern})\\Z")
        for i, ts in enumerate(toks):
            tf[i] = sum(1 for t in ts if rx.match(t))
    else:
        raise TypeError(type(leaf))
    return tf, int((tf > 0).sum())


@dataclass
class OracleResult:
    total: int
    hits: pd.DataFrame
    facets: dict[str, dict] = dc_field(default_factory=dict)


def oracle_search(
    oix: OracleIndex,
    q: Compound,
    k: int = 10,
    skip: int = 0,
    filter_spec: FilterSpec | None = None,
    boosts: tuple = (),
    facet_fields: tuple[str, ...] = (),
    similarity: str = "bm25",
    mu: float = 2000.0,
) -> OracleResult:
    n = oix.n_docs
    score = np.zeros(n)
    must_all = np.ones(n, dtype=bool)
    should_cnt = np.zeros(n, dtype=np.int64)
    excluded = np.zeros(n, dtype=bool)
    clauses = (
        [(l, "must") for l in q.must]
        + [(l, "should") for l in q.should]
        + [(l, "filter") for l in q.filter]
        + [(l, "not") for l in q.must_not]
    )
    # filter counts as required (Lucene FILTER); should clauses are
    # mandatory only when there is no must/filter clause at all
    n_must = len(q.must) + len(q.filter)
    for leaf, role in clauses:
        is_must = role in ("must", "filter")
        scoring_role = role in ("must", "should")
        boost = float(getattr(leaf, "boost", 1.0))
        if isinstance(leaf, NumericRange):
            # Atlas range operator: non-scoring docmap predicate
            vals = oix.meta[leaf.field].to_numpy().astype(np.float64)
            match = np.ones(n, dtype=bool)
            if leaf.lo is not None:
                match &= vals >= leaf.lo
            if leaf.hi is not None:
                match &= vals <= leaf.hi
            if role == "not":
                excluded |= match
            elif is_must:
                must_all &= match
            else:
                raise ValueError("NumericRange is non-scoring: not valid in should")
            continue
        if isinstance(leaf, (CrossFields, BestFields)):
            # DisMax over per-field BM25 parts, each with its own
            # length norm; CrossFields shares a blended idf
            # (df = min(sum dfs, N)), BestFields keeps per-field idfs;
            # combine = best + tie_breaker * (sum of the rest)
            per = []
            for f in leaf.fields:
                tf_f = np.array(
                    [sum(1 for t in ts if t == leaf.token) for ts in oix.tokens[f]],
                    dtype=np.int64,
                )
                per.append((f, tf_f))
            bdf = min(sum(int((tf_f > 0).sum()) for _, tf_f in per), n)
            match = np.zeros(n, dtype=bool)
            for _, tf_f in per:
                match |= tf_f > 0
            if bdf > 0 and scoring_role:
                if leaf.const_score is not None:
                    score = score + np.where(match, float(leaf.const_score) * boost, 0.0)
                else:
                    tidf = float(scoring.idf(n, bdf)) * boost

                    def _fidf(tf_f):
                        if isinstance(leaf, CrossFields):
                            return tidf
                        return float(scoring.idf(n, int((tf_f > 0).sum()))) * boost

                    stack = np.stack(
                        [
                            np.where(
                                tf_f > 0,
                                scoring.bm25_score(
                                    tf_f, oix.dls[f], _fidf(tf_f),
                                    oix.config.k1, oix.config.b, oix.avgdl[f],
                                ),
                                0.0,
                            )
                            for f, tf_f in per
                        ]
                    )
                    best, tot = stack.max(axis=0), stack.sum(axis=0)
                    score = score + np.where(
                        match, best + leaf.tie_breaker * (tot - best), 0.0
                    )
            if role == "not":
                excluded |= match
            elif is_must:
                must_all &= match
            else:
                should_cnt += match.astype(np.int64)
            continue
        tf, df = _leaf_tf_df(oix, leaf)
        match = tf > 0
        if df > 0 and scoring_role:
            if leaf.const_score is not None:
                contrib = np.where(match, float(leaf.const_score) * boost, 0.0)
            elif similarity == "bm25":
                tidf = float(scoring.idf(n, df)) * boost
                dl = oix.dls[leaf.field]
                contrib = np.where(
                    match,
                    scoring.bm25_score(tf, dl, tidf, oix.config.k1, oix.config.b, oix.avgdl[leaf.field]),
                    0.0,
                )
            elif similarity == "classic":
                w = float(scoring.classic_idf(n, df)) ** 2 * boost
                contrib = np.where(
                    match, scoring.classic_score(tf, oix.dls[leaf.field], w), 0.0
                )
            elif similarity == "lm_dirichlet":
                # single-key Term leaves only (cf = corpus tf of the
                # exact token — same number the dictionary stores)
                dls = oix.dls[leaf.field]
                mu_p = mu * (float(tf.sum()) / float(dls.sum()))
                contrib = np.where(
                    match, scoring.lm_dirichlet_score(tf, dls, mu_p, mu, boost), 0.0
                )
            elif similarity == "dfr":
                w = float(scoring.dfr_basic_in(n, df)) * boost
                contrib = np.where(
                    match,
                    scoring.dfr_score(tf, oix.dls[leaf.field], w, oix.avgdl[leaf.field]),
                    0.0,
                )
            elif similarity == "boolean":
                contrib = np.where(match, boost, 0.0)
            else:
                raise ValueError(f"unknown similarity {similarity!r}")
            score = score + contrib
        if role == "not":
            excluded |= match
        elif is_must:
            must_all &= match
        else:
            should_cnt += match.astype(np.int64)
    matched = must_all.copy()
    if q.min_should_match > 0:
        matched &= should_cnt >= q.min_should_match
    elif n_must == 0 and q.should:
        matched &= should_cnt > 0
    if not (q.must or q.should or q.filter):
        # purely negative (or empty) query matches nothing (Lucene)
        matched &= False
    matched &= ~excluded
    if filter_spec is not None:
        cols = {c: oix.meta[c].to_numpy() for c in filter_spec.columns}
        matched &= filter_spec.eval(cols, n)
    sel = np.nonzero(matched)[0]
    sel_scores = score[sel]
    # additive boosts first, multiplicative field_value_factor after
    # (the engine's _finish ordering)
    _mult = (FieldValueBoost, DecayBoost)
    for bst in [b for b in boosts if not isinstance(b, _mult)] + [
        b for b in boosts if isinstance(b, _mult)
    ]:
        if isinstance(bst, _mult):
            vals = oix.meta[bst.col].to_numpy()[sel]
            sel_scores = bst.apply(sel_scores, vals)
        elif isinstance(bst, DocAttrBoost):
            vals = oix.meta[bst.col].to_numpy()[sel]
            sel_scores = sel_scores + np.where(vals == bst.value, bst.add, 0.0)
        else:  # ConditionalAddBoost with a raw ndarray id set
            ids_set = np.asarray(
                bst.doc_ids_ref if isinstance(bst.doc_ids_ref, np.ndarray) else bst.doc_ids_ref,
                dtype=np.int64,
            )
            hit = np.isin(oix.doc_ids[sel], ids_set)
            sel_scores = sel_scores + np.where(hit, bst.add, 0.0)
    total = int(sel.size)
    facets: dict[str, dict] = {}
    for fcol in facet_fields:
        vals = oix.meta[fcol].to_numpy()[sel]
        u, c = np.unique(vals, return_counts=True)
        facets[fcol] = {str(v): int(cc) for v, cc in zip(u, c)}
    order = np.lexsort((oix.doc_ids[sel], -sel_scores))
    page = order[skip : skip + k]
    hits = pd.DataFrame({"doc_id": oix.doc_ids[sel][page], "score": sel_scores[page]})
    return OracleResult(total, hits.reset_index(drop=True), facets)
