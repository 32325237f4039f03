"""ES percolator: reverse search — match a STREAM of documents against
a registry of stored queries and emit (query_id, doc_id) pairs — plus
the `filters` and `adjacency_matrix` aggregations built on the same
match machinery.

The reference's lineage exposes this as the Elasticsearch `percolate`
query (a `percolator`-mapped field stores parsed queries; indexing-time
alerting/classification runs every new document through the registry).
Re-expressed Ray-Data-first: the registry is compiled ONCE driver-side
into flat arrays (a term vocabulary + per-query clause index lists) and
captured by a plain map_batches function — the corpus streams, the
registry broadcasts, nothing shuffles. Per batch the document side is
fully vectorized: one Arrow tokenize, one `index_in` against the query
vocabulary, one boolean presence matrix (docs x vocab), then each
query evaluates as numpy column reductions over that matrix. Cost is
O(batch tokens + n_queries x batch docs); a registry of millions of
queries would shard the query set and union the outputs (documented
assumption: the compiled registry fits in a worker heap — it is a few
ints per clause).

Matching semantics are the engine's Compound rules (Lucene
BooleanQuery): every must/filter clause required, must_not excluding,
at least max(min_should_match, 1 if the query has ONLY should clauses)
of the should clauses. Supported leaves: Term (exact token), Synonyms
(any-of token set) and Prefix (token prefix); percolation is a match
decision, not a ranking, so no scores are emitted (ES scores a
percolator hit by replaying the query on a 1-doc index — out of scope).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

from search_engine_ray.query.qast import Compound, Prefix, Synonyms, Term


def _compile(queries: dict[str, Compound]):
    """Flatten the registry: a sorted exact-term vocabulary, the
    distinct prefix list, and per-query leaf references
    (kind, payload) with payload = vocab index / prefix index /
    vocab-index array (synonyms)."""
    vocab: dict[str, int] = {}
    prefixes: dict[str, int] = {}

    def _tid(tok: str) -> int:
        if tok not in vocab:
            vocab[tok] = len(vocab)
        return vocab[tok]

    def _leaf(leaf):
        if isinstance(leaf, Term):
            return ("t", _tid(leaf.token))
        if isinstance(leaf, Synonyms):
            return ("s", np.array([_tid(tok) for tok in leaf.tokens], dtype=np.int64))
        if isinstance(leaf, Prefix):
            if leaf.prefix not in prefixes:
                prefixes[leaf.prefix] = len(prefixes)
            return ("p", prefixes[leaf.prefix])
        raise TypeError(
            f"percolate supports Term/Synonyms/Prefix leaves, got {type(leaf).__name__}"
        )

    compiled = []
    for qid, q in queries.items():
        musts = [_leaf(lf) for lf in (tuple(q.must) + tuple(q.filter))]
        shoulds = [_leaf(lf) for lf in q.should]
        nots = [_leaf(lf) for lf in q.must_not]
        msm = int(q.min_should_match)
        if not musts and shoulds:
            msm = max(msm, 1)  # Lucene's implicit pure-should rule
        if msm > len(shoulds):
            raise ValueError(f"{qid}: min_should_match {msm} > {len(shoulds)} should clauses")
        if not musts and not shoulds:
            # purely negative / empty queries match nothing (engine rule)
            compiled.append((qid, None, None, None, 0))
            continue
        compiled.append((qid, musts, shoulds, nots, msm))
    terms = [t for t, _ in sorted(vocab.items(), key=lambda kv: kv[1])]
    prefs = [p for p, _ in sorted(prefixes.items(), key=lambda kv: kv[1])]
    return compiled, terms, prefs


def _match_matrix(col, compiled, terms, prefs, vocab_arr) -> np.ndarray:
    """(n_docs x n_queries) boolean match matrix for one batch —
    one Arrow tokenize + presence matrix, then numpy reductions."""
    from search_engine_ray.ops.text import _flat_tokens

    flat, parents, n = _flat_tokens(col)
    P = np.zeros((n, max(len(terms), 1)), dtype=bool)
    if len(terms) and len(flat):
        idx = pc.index_in(flat, value_set=vocab_arr)
        mask = pc.is_valid(idx)
        hit = idx.filter(mask).to_numpy(zero_copy_only=False).astype(np.int64)
        P[parents[mask.to_numpy(zero_copy_only=False)], hit] = True
    PP = np.zeros((n, max(len(prefs), 1)), dtype=bool)
    for j, p in enumerate(prefs):
        m = pc.starts_with(flat, p)
        PP[parents[m.to_numpy(zero_copy_only=False)], j] = True

    def _vec(ref) -> np.ndarray:
        kind, payload = ref
        if kind == "t":
            return P[:, payload]
        if kind == "p":
            return PP[:, payload]
        return P[:, payload].any(axis=1)

    M = np.zeros((n, len(compiled)), dtype=bool)
    for qi, (_qid, musts, shoulds, nots, msm) in enumerate(compiled):
        if musts is None and shoulds is None:
            continue
        ok = np.ones(n, dtype=bool)
        for ref in musts:
            ok &= _vec(ref)
        if shoulds:
            cnt = np.zeros(n, dtype=np.int64)
            for ref in shoulds:
                cnt += _vec(ref)
            if msm > 0:
                ok &= cnt >= msm
        for ref in nots:
            ok &= ~_vec(ref)
        M[:, qi] = ok
    return M


def percolate(
    ds: Dataset,
    queries: dict[str, Compound],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Match every document in ``ds`` against every stored query;
    returns a Dataset of (query_id, ``id_col``) rows, one per match.
    Query tokens are assumed pre-normalized with the same analyzer the
    engine uses (lowercase [a-z0-9_]+), exactly as in `search()`."""
    compiled, terms, prefs = _compile(queries)
    vocab_arr = pa.array(terms, pa.string())
    qid_list = [qid for qid, *_ in compiled]

    def _match(t: pa.Table) -> pa.Table:
        M = _match_matrix(t[text_col], compiled, terms, prefs, vocab_arr)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        qids: list[str] = []
        docs: list[np.ndarray] = []
        for qi, qid in enumerate(qid_list):
            sel = ids[M[:, qi]]
            if sel.size:
                qids.extend([qid] * sel.size)
                docs.append(sel)
        out_ids = np.concatenate(docs) if docs else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.string()),
                id_col: pa.array(out_ids, type=t.schema.field(id_col).type),
            }
        )

    return ds.map_batches(_match, batch_format="pyarrow")


def filters_agg(
    ds: Dataset,
    queries: dict[str, Compound],
    text_col: str = "text",
    other_bucket: bool = False,
) -> Dataset:
    """ES `filters` aggregation: one doc count per NAMED filter (a doc
    can land in several buckets). ``other_bucket=True`` adds an
    ``_other_`` bucket counting docs matching NO filter. Per batch the
    counts collapse to one tiny (filter_id, n) table (a map-side
    combiner); the shuffle moves n_filters rows per block. Zero-match
    filters are emitted with n=0 (ES keeps empty named buckets)."""
    compiled, terms, prefs = _compile(queries)
    vocab_arr = pa.array(terms, pa.string())
    names = [qid for qid, *_ in compiled] + (["_other_"] if other_bucket else [])

    def _count(t: pa.Table) -> pa.Table:
        M = _match_matrix(t[text_col], compiled, terms, prefs, vocab_arr)
        n = M.sum(axis=0).astype(np.int64)
        if other_bucket:
            n = np.concatenate([n, [np.int64((~M.any(axis=1)).sum())]])
        return pa.table({"filter_id": pa.array(names, pa.string()), "n": pa.array(n)})

    return (
        ds.map_batches(_count, batch_format="pyarrow")
        .groupby("filter_id")
        .aggregate(Sum("n", alias_name="n"))
    )


def adjacency_matrix(
    ds: Dataset,
    queries: dict[str, Compound],
    text_col: str = "text",
) -> Dataset:
    """ES `adjacency_matrix` aggregation: doc counts for every filter
    AND every pairwise intersection. Rows (a, b, n) with a <= b in
    registry order; a == b is the plain filter count (ES emits the
    pair key as "a&b"). Per batch the whole matrix is one boolean
    M.T @ M — n_queries^2 ints per block ride the shuffle, never the
    docs. Zero-intersection pairs are dropped (ES omits empty
    buckets here, unlike `filters`)."""
    compiled, terms, prefs = _compile(queries)
    vocab_arr = pa.array(terms, pa.string())
    qid_list = [qid for qid, *_ in compiled]
    iu = np.triu_indices(len(qid_list))
    a_names = pa.array([qid_list[i] for i in iu[0]], pa.string())
    b_names = pa.array([qid_list[j] for j in iu[1]], pa.string())

    def _pairs(t: pa.Table) -> pa.Table:
        M = _match_matrix(t[text_col], compiled, terms, prefs, vocab_arr)
        C = (M.T.astype(np.int64) @ M.astype(np.int64))[iu]
        return pa.table({"a": a_names, "b": b_names, "n": pa.array(C)})

    agg = (
        ds.map_batches(_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 0)), batch_format="pyarrow"
    )
