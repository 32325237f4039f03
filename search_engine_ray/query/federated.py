"""Federated multi-index search with global statistics — ES
cross-index search under `dfs_query_then_fetch` (Lucene's distributed
DFS phase): querying M independently-built indexes returns results
whose BM25 scores are IDENTICAL to a single index built over the
union of their corpora.

Two phases, exactly Lucene's:
1. DFS: gather each member's df for every term key the query touches
   (pattern/fuzzy leaves expand against every member's dictionary and
   the expansions union), plus global doc counts / field lengths.
2. Query: every member scores with the GLOBAL stats (a shallow
   engine view with `df_override` + global `stats` — scoring params
   ride the query spec, so the member's actor pool needs no rebuild),
   returns its top-k, and the driver merges M k-sized lists by
   (score desc, doc_id asc).

Scale shape: phase 1 moves one integer per (term, member); phase 2 is
M independent scatter-gathers; the merge is over M*k rows. Nothing
corpus-sized crosses index boundaries.
"""

from __future__ import annotations

import copy

import numpy as np
import pandas as pd

from search_engine_ray.query.executor import SearchEngine, SearchResult
from search_engine_ray.query.qast import (
    Compound,
    CrossFields,
    Fuzzy,
    Phonetic,
    Prefix,
    Regexp,
    Synonyms,
    Term,
    Wildcard,
)


def _leaf_keys(eng: SearchEngine, leaf) -> list[str]:
    """Every dictionary key this leaf can touch on `eng` — the same
    mapping `_resolve` uses (executor.py), with pattern leaves
    expanded against this member's dictionary."""
    cfg = eng.config
    if isinstance(leaf, Term):
        return [cfg.term_key(leaf.field, leaf.token)]
    if isinstance(leaf, Phonetic):
        return [cfg.phonetic_key(leaf.field, leaf.token)]
    if isinstance(leaf, Synonyms):
        return [cfg.term_key(leaf.field, t) for t in leaf.tokens]
    if isinstance(leaf, CrossFields):
        return [cfg.term_key(f, leaf.token) for f in leaf.fields]
    if isinstance(leaf, Fuzzy):
        return eng._expand_fuzzy(leaf)
    if isinstance(leaf, (Wildcard, Regexp)):
        return eng._expand_pattern(leaf)
    if isinstance(leaf, Prefix):
        spec = cfg.field_by_name(leaf.field)
        if spec.ngram and spec.ngram_min <= len(leaf.prefix) <= spec.ngram_max:
            return [cfg.prefix_key(leaf.field, leaf.prefix)]
        return eng._expand_prefix(leaf)
    raise TypeError(type(leaf))


class FederatedEngine:
    """Search over several SearchEngines as one logical index."""

    def __init__(self, engines: dict[str, SearchEngine]):
        if not engines:
            raise ValueError("need at least one member engine")
        self.engines = dict(engines)
        self.global_stats = self._merge_stats()

    def _merge_stats(self) -> dict:
        members = list(self.engines.values())
        g = dict(members[0].stats)
        g["n_docs"] = sum(e.stats["n_docs"] for e in members)
        fields: dict[str, dict] = {}
        for e in members:
            for f, fs in e.stats["fields"].items():
                cur = fields.setdefault(f, {"total_len": 0})
                cur["total_len"] += fs["total_len"]
        for f, fs in fields.items():
            fs["avgdl"] = fs["total_len"] / g["n_docs"] if g["n_docs"] else 0.0
        g["fields"] = fields
        return g

    def search(self, q: Compound, k: int = 10, **kw) -> pd.DataFrame:
        """Top-k across all members under global stats. Returns a
        DataFrame (index, doc_id, score) ordered by (score desc,
        doc_id asc, index asc) plus a summed exact total in the
        `total` attribute of every row (flat driver-contract shape).
        Extra kwargs pass through to every member's search()."""
        leaves = list(q.must) + list(q.should) + list(q.filter) + list(q.must_not)
        all_keys: set[str] = set()
        for eng in self.engines.values():
            for leaf in leaves:
                all_keys.update(_leaf_keys(eng, leaf))
        keys = sorted(all_keys)
        gdfs: dict[str, int] = {}
        for eng in self.engines.values():
            assert eng.df_override is None, "member already federated"
            for tk, df in eng._df_for_terms(keys).items():
                gdfs[tk] = gdfs.get(tk, 0) + int(df)
        parts = []
        total = 0
        for name, eng in self.engines.items():
            view = copy.copy(eng)  # shares dict caches + scorer pool
            view.df_override = gdfs
            view.stats = self.global_stats
            res: SearchResult = view.search(q, k=k, with_metadata=False, **kw)
            total += res.total
            part = res.hits[["doc_id", "score"]].copy()
            part.insert(0, "index", name)
            parts.append(part)
        out = pd.concat(parts, ignore_index=True)
        order = np.lexsort(
            (out["index"].to_numpy(), out["doc_id"].to_numpy(), -out["score"].to_numpy())
        )[:k]
        out = out.iloc[order].reset_index(drop=True)
        out.insert(0, "total", np.int64(total))
        return out
