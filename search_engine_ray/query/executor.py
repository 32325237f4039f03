"""BM25 query execution.

Two physical paths over the same scoring core (SURVEY.md §3, M2):

1. **Scatter-gather actor pool** (default for `search`): a small pool
   of persistent `BucketScorer` actors, each owning a set of doc-shard
   buckets. A query ships the resolved clause list to every actor; the
   actor reads ONLY its buckets' posting partitions for the query's
   terms (`postings/part=K/bucket=B/` — partition-pruned on both
   keys + parquet row-group stats on `term`), scores them, and
   returns (match_count, local top-k, facet counts). The driver does a
   tiny k-way merge — the same mongos-style scatter-gather the
   reference delegates to Atlas (SURVEY.md §4). Actors cache docmap
   partitions across queries, so warm latency is milliseconds, not a
   Dataset job per query.

2. **Streaming Dataset path** (`search_all`): score EVERY matching doc
   and return a lazy `Dataset` — the input to grouped/dedup/analytic
   pipelines. read_parquet(hive) -> groupby("bucket") ->
   map_groups(ScoreBuckets).

The scorer is vectorized term-at-a-time: postings decode to numpy
(delta+varbyte, block restarts), per-clause BM25 via scoring.py, and
the combine is one np.unique + np.add.at pass. Clause contributions
accumulate in clause order, matching the oracle bit-for-bit.

Filters (R1-at-query, reference `$match` after `$search`) and facet
counts (R16) read the bucket's docmap partition lazily and cache it in
the actor. Conditional boosts (S5) take a broadcast doc-id set
(`ray.put` once, read per actor) — the Ray-native form of the
reference's `$lookup` + `$cond` stock boost (pipelines.py:62-80).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field as dc_field
from typing import Any, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from search_engine_ray.codec import block_delta_decode, for_decode_term, varbyte_decode
from search_engine_ray.config import IndexConfig, term_part
from search_engine_ray.query import scoring
from search_engine_ray.query.qast import (
    Compound,
    BestFields,
    CrossFields,
    Fuzzy,
    Leaf,
    MatchAll,
    NumericRange,
    Phonetic,
    Prefix,
    Regexp,
    Synonyms,
    Term,
    Wildcard,
)

POSTING_COLS = ["term", "df_local", "doc_bytes", "tf_bytes", "dl_bytes"]
BLK_COLS = ["blk_first", "blk_doc_off", "blk_tf_off", "blk_dl_off", "blk_max_tf", "blk_min_dl"]


@dataclass(frozen=True)
class FilterSpec:
    """Post-search metadata predicate (reference `$match` after
    `$search`, pipelines.py:55-61). Conditions AND together.
    ops: == != > >= < <= in not_in between not_between
    (between/not_between take val=(lo, hi), inclusive, None = open —
    the lowering target of qast.NumericRange clauses)"""

    conditions: tuple[tuple[str, str, Any], ...] = ()

    @property
    def columns(self) -> tuple[str, ...]:
        return tuple({c for c, _, _ in self.conditions})

    def eval(self, table_cols: dict[str, np.ndarray], n: int) -> np.ndarray:
        mask = np.ones(n, dtype=bool)
        for col, op, val in self.conditions:
            v = table_cols[col]
            if op == "==":
                mask &= v == val
            elif op == "!=":
                mask &= v != val
            elif op == ">":
                mask &= v > val
            elif op == ">=":
                mask &= v >= val
            elif op == "<":
                mask &= v < val
            elif op == "<=":
                mask &= v <= val
            elif op == "in":
                mask &= np.isin(v, list(val))
            elif op == "not_in":
                mask &= ~np.isin(v, list(val))
            elif op in ("between", "not_between"):
                lo, hi = val
                m = np.ones(n, dtype=bool)
                if lo is not None:
                    m &= v >= lo
                if hi is not None:
                    m &= v <= hi
                mask &= m if op == "between" else ~m
            else:
                raise ValueError(f"unknown op {op!r}")
        return mask


@dataclass(frozen=True)
class ConditionalAddBoost:
    """S5: score += add for docs in a broadcast id set (stock>0)."""

    doc_ids_ref: Any  # ray.ObjectRef or np.ndarray of sorted int64 ids
    add: float


@dataclass(frozen=True)
class DocAttrBoost:
    """S6 (docmap form): score += add where docmap[col] == value."""

    col: str
    value: Any
    add: float


@dataclass(frozen=True)
class NegativeBoost:
    """ES `boosting` query's negative half: docs in the broadcast id
    set (the negative query's match set) keep their match but score
    MULTIPLIED by ``factor`` (ES negative_boost, 0 <= factor < 1) —
    demotion without exclusion (must_not would drop the doc).
    Multiplicative, so it applies after the additive boosts alongside
    field_value_factor; pruning is already disabled whenever boosts
    are present (bounds don't survive score rewrites)."""

    doc_ids_ref: Any  # ray.ObjectRef or np.ndarray of sorted int64 ids
    factor: float


_FV_MODIFIERS = {
    "none": lambda v: v,
    "log1p": np.log1p,
    "sqrt": np.sqrt,
}


@dataclass(frozen=True)
class FieldValueBoost:
    """ES function_score ``field_value_factor``: the relevance score is
    MULTIPLIED by ``modifier(factor * docmap[col])`` (modifier one of
    none | log1p | sqrt). Applied after all additive boosts, in
    declaration order. Null/NaN attribute values use ``missing``."""

    col: str
    factor: float = 1.0
    modifier: str = "log1p"
    missing: float = 1.0

    def apply(self, scores: np.ndarray, vals: np.ndarray) -> np.ndarray:
        v = np.asarray(vals, dtype=np.float64)
        v = np.where(np.isnan(v), float(self.missing), v)
        return scores * _FV_MODIFIERS[self.modifier](self.factor * v)


@dataclass(frozen=True)
class RankFeatureBoost:
    """ES `rank_feature` query with the saturation function:

        score += boost * v / (v + pivot)

    over a non-negative numeric docmap column — the standard way to
    fold a static per-document feature (pagerank, popularity, url
    length) into relevance. Missing/NaN values contribute 0 (in ES a
    missing rank_feature simply doesn't match the clause). Additive:
    applies with the other additive boosts, before the multiplicative
    field_value_factor/decay/negative ones."""

    col: str
    pivot: float
    boost: float = 1.0


@dataclass(frozen=True)
class DistanceFeatureBoost:
    """ES `distance_feature` query (numeric/date form):

        score += boost * pivot / (pivot + |v - origin|)

    over a numeric docmap column — full ``boost`` at the origin,
    half at distance ``pivot``, decaying hyperbolically beyond
    (recency / proximity boosting without a hard range filter).
    Missing/NaN values contribute 0. Additive, like rank_feature."""

    col: str
    origin: float
    pivot: float
    boost: float = 1.0


@dataclass(frozen=True)
class DecayBoost:
    """ES function_score decay (``gauss`` | ``exp`` | ``linear``): the
    relevance score is MULTIPLIED by a function of the distance between
    ``docmap[col]`` and ``origin`` that equals 1 inside ``offset`` and
    ``decay`` at distance ``offset + scale`` — exactly Elasticsearch's
    numeric decay semantics (reference exposes function_score through
    its Atlas $search boost spec). Docs with a null/NaN attribute get
    multiplier 1.0 (ES skips decay for missing values).

    gauss:  exp(-d^2 / (2*sigma^2)),  sigma^2 = -scale^2 / (2*ln(decay))
    exp:    exp(lambda * d),          lambda  = ln(decay) / scale
    linear: max(0, (s - d) / s),      s       = scale / (1 - decay)
    with d = max(0, |v - origin| - offset).
    """

    col: str
    origin: float
    scale: float
    offset: float = 0.0
    decay: float = 0.5
    fn: str = "gauss"

    def apply(self, scores: np.ndarray, vals: np.ndarray) -> np.ndarray:
        v = np.asarray(vals, dtype=np.float64)
        miss = np.isnan(v)
        d = np.maximum(0.0, np.abs(np.where(miss, self.origin, v) - self.origin) - self.offset)
        if self.fn == "gauss":
            sigma2 = -(self.scale**2) / (2.0 * np.log(self.decay))
            mult = np.exp(-(d**2) / (2.0 * sigma2))
        elif self.fn == "exp":
            lam = np.log(self.decay) / self.scale
            mult = np.exp(lam * d)
        elif self.fn == "linear":
            s = self.scale / (1.0 - self.decay)
            mult = np.maximum(0.0, (s - d) / s)
        else:
            raise ValueError(f"unknown decay fn {self.fn!r}")
        return scores * np.where(miss, 1.0, mult)


@dataclass
class SearchResult:
    total: int
    hits: pd.DataFrame  # doc_id, score, + docmap columns; page already applied
    facets: dict[str, dict[Any, int]] = dc_field(default_factory=dict)
    total_exact: bool = True  # False when block-max pruning was used
    # per stat_fields column: {"count", "sum", "min", "max", "avg"}
    # over the FULL matched set (ES stats aggregation)
    stats: dict[str, dict[str, float]] = dc_field(default_factory=dict)
    # per quantile_fields column: {q: value} — EXACT discrete quantiles
    # (quantile_disc rule) over the full matched set
    quantiles: dict[str, dict[float, float]] = dc_field(default_factory=dict)


@dataclass(frozen=True)
class _ResolvedLeaf:
    clause_id: int
    is_must: bool
    term_keys: tuple[str, ...]  # >1 only for dictionary-expanded prefixes
    idfs: tuple[float, ...]
    avgdl: float
    const_score: float | None
    # Lucene SynonymQuery semantics: the leaf's keys score as ONE
    # pseudo-term — tf summed across keys per doc, single idf from the
    # max per-key df (idfs holds that one value repeated). Mutually
    # exclusive with pruning (WAND bounds assume per-key parts).
    blend: bool = False
    # Lucene BlendedTermQuery + DisMax (qast.CrossFields): keys are the
    # same token across FIELDS, idfs hold the shared blended idf
    # (df = min(sum per-field dfs, N)) repeated, avgdls the per-key
    # field avgdl, and per-doc scores combine as
    # max + tie_breaker*(sum - max). Also prune-exclusive.
    dismax: bool = False
    tie_breaker: float = 0.0
    avgdls: tuple[float, ...] | None = None
    # clause role (Lucene BooleanClause.Occur): "must" | "should" |
    # "filter" (required, non-scoring: const_score=0, is_must=True so
    # the required-count bookkeeping is shared) | "not" (excluding,
    # non-scoring: is_must=False, docs it matches are dropped)
    role: str = ""
    # linear score multiplier (query boost) for similarities whose
    # per-key weight slot is NOT linear in the score (lm_dirichlet,
    # where idfs carry mu*p); 1.0 for bm25/classic/boolean which fold
    # the boost into idfs directly
    wmult: float = 1.0

    @property
    def occur(self) -> str:
        return self.role or ("must" if self.is_must else "should")


@dataclass(frozen=True)
class _QuerySpec:
    """Everything a scorer needs for one query (picklable)."""

    leaves: tuple[_ResolvedLeaf, ...]
    k1: float
    b: float
    min_should_match: int
    n_take: int
    filter_spec: FilterSpec | None
    boosts: tuple
    facet_fields: tuple[str, ...]
    block_size: int
    # on-disk stream codec of the index being queried: 2 = varbyte,
    # 3 = bit-packed FOR (build.CODEC_FORMATS) — decoders dispatch
    postings_format: int = 2
    emit_all_cols: tuple[str, ...] | None = None
    # block-max dynamic pruning (query/wand.py): only for pure-OR
    # top-k with no filter/boost/facet needs; `total` becomes a lower
    # bound (Lucene total-hit-threshold trade-off)
    prune: bool = False
    # global pruning threshold established by a cheap phase-1 pass
    # over the highest-impact term (a valid lower bound of the final
    # k-th score: per-doc totals only grow with more clauses). Lets
    # buckets prune even before they hold k local candidates.
    initial_theta: float = float("-inf")
    # sorted int64 array of deleted doc ids (tombstones) — excluded
    # from matches/totals/facets until the owning shard is rebuilt
    tombstones: Any = None
    # ES-style metric aggregations: per-bucket (count, sum, min, max)
    # of these numeric docmap columns over the FULL matched set,
    # merged at the driver (avg = sum/count there). Rides the same
    # single pass as facet counts — matching is never repeated.
    stat_fields: tuple[str, ...] = ()
    # deep-pagination cursor (ES search_after): only docs strictly
    # AFTER (score, doc_id) in (score desc, doc_id asc) order make the
    # page; totals/facets still cover the full matched set. Applied
    # inside every bucket BEFORE its local top-k, so page depth never
    # inflates n_take (skip/limit at offset 10^6 ships 10^6 candidates
    # per bucket; a cursor ships k).
    search_after: tuple | None = None
    # ES range aggregation: numeric banded counts over the FULL
    # matched set — ((col, (e0, e1, ..., en)), ...), bands
    # [e_i, e_{i+1}) labelled "[e_i,e_{i+1})"; values outside every
    # band are uncounted. Rides the facet-row channel.
    range_facets: tuple = ()
    # ES sort-by-stored-field: (col, descending) — page ranked by a
    # NUMERIC docmap attribute (doc_id asc tiebreak) instead of the
    # score; BM25 scores are still computed and reported. The per-hit
    # key travels in the `sort_key` column for the driver merge.
    sort_by: tuple | None = None
    # ES match_all: every live doc in the bucket's docmap matches with
    # score 0 (no postings read); filters/facets/stats/sort still
    # apply — the browse/listing page over the index. Also the
    # execution form of a query whose only clauses were NumericRanges.
    match_all: bool = False
    # ES percentiles aggregation, computed EXACTLY: each bucket ships a
    # (value, count) histogram of these numeric docmap columns over its
    # matched docs (bounded by attribute cardinality); the driver merge
    # applies the quantile_disc rule. Unlike ES's t-digest this is
    # exact — document the cardinality assumption when using it on
    # unbounded floats (pre-round the column).
    quantile_fields: tuple = ()
    # pluggable Lucene similarity (scoring.SIMILARITIES): per-key
    # weights in leaf.idfs are resolved for THIS similarity (idf,
    # classic_idf**2, mu*p, or boost) — see scoring.leaf_score
    similarity: str = "bm25"
    mu: float = 2000.0
    # ES field collapsing: the page holds ONE hit per distinct value of
    # this docmap column — each group's best-scoring doc (doc_id asc on
    # score ties). Each bucket ships one `coll` row per distinct value
    # in its matched set (its local per-group argmax); the driver keeps
    # the global per-group max, so the result is exact over the FULL
    # matched set however the representatives rank. Payload is bounded
    # by collapse-field cardinality per bucket — the field ES collapse
    # is designed for (category/brand/host), never a unique key.
    collapse_field: str | None = None
    # ES terms_set minimum_should_match_field/_script: the required
    # should-clause count comes PER DOC from this docmap column
    # (msm_map, a pure vectorized ndarray -> ndarray callable,
    # optionally transforms the raw values); overrides the fixed
    # min_should_match when set. Evaluated bucket-locally against the
    # partition's own docmap — no extra shuffle at any scale.
    msm_field: str | None = None
    msm_map: Any = None


class _DocmapCache:
    """Per-bucket docmap columns, loaded lazily and kept across
    queries (partition-local read, never a shuffle)."""

    def __init__(self, docmap_dirs: list[str]):
        self.dirs = docmap_dirs
        self._cache: dict[int, dict[str, np.ndarray]] = {}

    def get(self, bucket: int, cols: tuple[str, ...]) -> dict[str, np.ndarray]:
        cached = self._cache.get(bucket)
        need = ("doc_id",) + tuple(c for c in cols if c != "doc_id")
        if cached is not None and all(c in cached for c in need):
            return cached
        tables = []
        for d in self.dirs:
            bdir = os.path.join(d, f"bucket={bucket}")
            if os.path.isdir(bdir):
                tables.append(pq.read_table(bdir, columns=list(need)))
        if tables:
            t = pa.concat_tables(tables)
            order = pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])
            t = t.take(order)
            out = {c: t[c].to_numpy(zero_copy_only=False) for c in need}
        else:
            out = {c: np.empty(0, dtype=object) for c in need}
            out["doc_id"] = np.empty(0, dtype=np.int64)
        self._cache[bucket] = {**(cached or {}), **out}
        return self._cache[bucket]

    def attrs(self, bucket: int, ids: np.ndarray, cols: tuple[str, ...]) -> dict[str, np.ndarray]:
        dm = self.get(bucket, cols)
        if dm["doc_id"].size == 0:
            raise RuntimeError(f"empty docmap for bucket {bucket}")
        pos = np.searchsorted(dm["doc_id"], ids)
        pos = np.clip(pos, 0, dm["doc_id"].size - 1)
        if not np.array_equal(dm["doc_id"][pos], ids):
            raise RuntimeError("doc_id missing from docmap")
        return {c: dm[c][pos] for c in cols}


def _field_namespace_range(spec) -> tuple[str, str]:
    """Dictionary key range holding field ``spec``'s EXACT terms
    (``<code>:token``). The edge-n-gram (``<code>>:``) and phonetic
    (``<code>~:``) namespaces sort OUTSIDE this range because '>' and
    '~' are both greater than ':' — the one place this code-point
    argument lives (used by fuzzy expansion and suggest())."""
    return f"{spec.code}:", f"{spec.code}:\U0010ffff"


def _lower_ranges(q: Compound) -> tuple[Compound, tuple]:
    """Split NumericRange leaves out of a Compound, returning the
    residual query and the equivalent FilterSpec conditions (Atlas
    `range` lowered onto the docmap predicate). must/filter roles
    become `between`, must_not becomes `not_between`; a range in
    should would be an optional non-scoring clause — meaningless, so
    it is rejected."""
    if any(isinstance(l, NumericRange) for l in q.should):
        raise ValueError("NumericRange is non-scoring: use filter/must/must_not, not should")
    conds: list[tuple] = []
    keep: dict[str, tuple] = {}
    for role in ("must", "filter", "must_not"):
        leaves = getattr(q, role)
        kept = []
        for l in leaves:
            if isinstance(l, NumericRange):
                op = "not_between" if role == "must_not" else "between"
                conds.append((l.field, op, (l.lo, l.hi)))
            else:
                kept.append(l)
        keep[role] = tuple(kept)
    if not conds:
        return q, ()
    q2 = Compound(
        must=keep["must"],
        should=q.should,
        min_should_match=q.min_should_match,
        must_not=keep["must_not"],
        filter=keep["filter"],
    )
    return q2, tuple(conds)


def _resolve_boosts(boosts: tuple) -> list[tuple]:
    out = []
    for bst in boosts:
        if isinstance(bst, ConditionalAddBoost):
            ids = bst.doc_ids_ref
            if not isinstance(ids, np.ndarray):
                import ray

                ids = ray.get(ids)  # broadcast: fetched once per actor
            out.append(("ids", np.asarray(ids, dtype=np.int64), bst.add))
        elif isinstance(bst, NegativeBoost):
            ids = bst.doc_ids_ref
            if not isinstance(ids, np.ndarray):
                import ray

                ids = ray.get(ids)
            out.append(("neg", np.asarray(ids, dtype=np.int64), float(bst.factor)))
        elif isinstance(bst, DocAttrBoost):
            out.append(("attr", bst, None))
        elif isinstance(bst, RankFeatureBoost):
            out.append(("rankf", bst, None))
        elif isinstance(bst, DistanceFeatureBoost):
            out.append(("distf", bst, None))
        elif isinstance(bst, FieldValueBoost):
            if bst.modifier not in _FV_MODIFIERS:
                raise ValueError(f"unknown field_value_factor modifier {bst.modifier!r}")
            out.append(("fv", bst, None))
        elif isinstance(bst, DecayBoost):
            # same application contract as FieldValueBoost (.col +
            # .apply(scores, attr)) — rides the "fv" multiplicative slot
            if bst.fn not in ("gauss", "exp", "linear"):
                raise ValueError(f"unknown decay fn {bst.fn!r}")
            out.append(("fv", bst, None))
        else:
            raise TypeError(type(bst))
    return out


def _binary_views(col) -> "callable":
    """Zero-copy row accessor for a (Large)Binary column: returns
    row_bytes(i) -> np.uint8 view into the arrow data buffer (no
    per-row bytes copy — posting buffers can be large)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype, count=len(arr) + arr.offset + 1)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
    base = arr.offset

    def view(i: int) -> np.ndarray:
        return data[offs[base + i] : offs[base + i + 1]]

    return view


def score_postings_table(
    t: pa.Table,
    bucket: int,
    spec: _QuerySpec,
    dmc: _DocmapCache,
    resolved_boosts: list[tuple],
    decode_cache: dict | None = None,
    row_keys: list | None = None,
    row_univ: list | None = None,
) -> pa.Table:
    """Score one bucket's posting rows for a query. The ONE scoring
    core — used by the actor path, the Dataset path and tests.

    decode_cache: optional cache kept by persistent scorer actors —
    repeated query terms skip the varbyte decode (the index is
    immutable for an engine's lifetime; engines are reconstructed
    after tombstone/compaction changes). row_keys MUST uniquely
    identify each posting row (several shards can hold rows for the
    same (bucket, term)); when absent, (bucket, term) is used — only
    valid for single-shard reads.

    row_univ: per-row rank universe (the owning SHARD's sorted docmap
    doc_id array for this bucket) — postings format v2 stores doc
    ranks, translated to hash ids right after decode. When absent the
    bucket's merged docmap is used, which equals the shard universe
    only for single-shard reads (same caveat as row_keys)."""
    # term -> ALL owning (leaf, idf) pairs: the same term key may back
    # several clauses (same token in must AND should, or a
    # dictionary-expanded Prefix overlapping another clause's exact
    # term). Each owning clause gets its own score part + match
    # bookkeeping, mirroring Lucene's per-clause BooleanQuery sum.
    term_to_leaves: dict[str, list[tuple[int, float]]] = {}
    for li, leaf in enumerate(spec.leaves):
        for tk, tidf in zip(leaf.term_keys, leaf.idfs):
            term_to_leaves.setdefault(tk, []).append((li, tidf))

    if spec.prune:
        from search_engine_ray.query.wand import score_or_query_pruned

        if row_univ is None:
            row_univ = [dmc.get(bucket, ())["doc_id"]] * t.num_rows
        ids, scores, scanned = score_or_query_pruned(
            t, spec, term_to_leaves, spec.n_take, row_univ
        )
        return _result_table(ids, scores, scanned, [])

    terms = t["term"].to_pylist()
    dfl = t["df_local"].to_numpy()
    doc_view = _binary_views(t["doc_bytes"])
    tf_view = _binary_views(t["tf_bytes"])
    dl_view = _binary_views(t["dl_bytes"])
    ids_parts: list[np.ndarray] = []
    score_parts: list[np.ndarray] = []
    leaf_of_part: list[int] = []
    rows_by_leaf: dict[int, list[tuple[int, float]]] = {}
    for ri, term in enumerate(terms):
        for li, tidf in term_to_leaves[term]:
            rows_by_leaf.setdefault(li, []).append((ri, tidf))
    def _decode_row(ri: int):
        n = int(dfl[ri])
        key = row_keys[ri] if row_keys is not None else (bucket, terms[ri])
        cached = decode_cache.get(key) if decode_cache is not None else None
        if cached is not None:
            return cached
        if spec.postings_format == 3:
            gaps = for_decode_term(doc_view(ri), n, spec.block_size, with_firsts=True)
            tfs = for_decode_term(tf_view(ri), n, spec.block_size, with_firsts=False)
            dls = for_decode_term(dl_view(ri), n, spec.block_size, with_firsts=False)
        else:
            gaps = varbyte_decode(doc_view(ri), n).astype(np.int64)
            tfs = varbyte_decode(tf_view(ri), n)
            dls = varbyte_decode(dl_view(ri), n)
        block_starts = np.arange(0, n, spec.block_size, dtype=np.int64)
        ranks = block_delta_decode(gaps, block_starts)
        # rank stream -> hash doc ids (still ascending:
        # rank order is hash order within the universe)
        univ = row_univ[ri] if row_univ is not None else dmc.get(bucket, ())["doc_id"]
        ids = univ[ranks]
        if decode_cache is not None:
            if len(decode_cache) >= 4096:  # simple epoch clear
                decode_cache.clear()
            decode_cache[key] = (ids, tfs, dls)
        return ids, tfs, dls

    for li in sorted(rows_by_leaf):
        leaf = spec.leaves[li]
        if leaf.const_score is not None and len(leaf.term_keys) > 1:
            # constant-score clause with several keys (cross-field,
            # synonym set, or a prefix/fuzzy expansion): the constant
            # applies ONCE per doc matching ANY key — not once per
            # matching key — mirroring oracle_search's per-CLAUSE
            # np.where(match, const, 0)
            rows = rows_by_leaf[li]
            uids = np.unique(np.concatenate([_decode_row(ri)[0] for ri, _ in rows]))
            ids_parts.append(uids)
            score_parts.append(np.full(uids.size, float(leaf.const_score)))
            leaf_of_part.append(li)
            continue
        if leaf.dismax and leaf.const_score is None:
            # BlendedTermQuery + DisMax: score each FIELD's postings
            # with its own length norm (shared blended idf baked into
            # leaf.idfs), then per doc: best + tie*(sum of the rest)
            rows = rows_by_leaf[li]
            f_ids, f_sc = [], []
            for ri, tidf in rows:
                ids, tfs, dls = _decode_row(ri)
                kidx = leaf.term_keys.index(terms[ri])
                sc = scoring.bm25_score(
                    tfs, dls, tidf, spec.k1, spec.b, leaf.avgdls[kidx]
                )
                f_ids.append(ids)
                f_sc.append(sc)
            all_f_ids = np.concatenate(f_ids)
            all_f_sc = np.concatenate(f_sc)
            uids, uinv = np.unique(all_f_ids, return_inverse=True)
            best = np.zeros(uids.size)
            tot = np.zeros(uids.size)
            np.maximum.at(best, uinv, all_f_sc)  # BM25 scores are > 0
            np.add.at(tot, uinv, all_f_sc)
            ids_parts.append(uids)
            score_parts.append(best + leaf.tie_breaker * (tot - best))
            leaf_of_part.append(li)
            continue
        if leaf.blend and leaf.const_score is None:
            # SynonymQuery: merge the leaf's keys into ONE pseudo-term
            # (tf summed per doc, shared blended idf) before BM25
            rows = rows_by_leaf[li]
            decoded = [_decode_row(ri) for ri, _ in rows]
            all_ids = np.concatenate([d[0] for d in decoded])
            all_tfs = np.concatenate([np.asarray(d[1], dtype=np.int64) for d in decoded])
            all_dls = np.concatenate([np.asarray(d[2], dtype=np.int64) for d in decoded])
            uids, uinv = np.unique(all_ids, return_inverse=True)
            tfsum = np.zeros(uids.size, dtype=np.int64)
            np.add.at(tfsum, uinv, all_tfs)
            dlu = np.zeros(uids.size, dtype=np.int64)
            dlu[uinv] = all_dls  # same doc, same field dl on every key
            sc = scoring.leaf_score(
                tfsum, dlu, rows[0][1], spec.k1, spec.b, leaf.avgdl,
                spec.similarity, spec.mu, leaf.wmult,
            )
            ids_parts.append(uids)
            score_parts.append(sc)
            leaf_of_part.append(li)
            continue
        for ri, tidf in rows_by_leaf[li]:
            ids, tfs, dls = _decode_row(ri)
            if leaf.const_score is not None:
                sc = np.full(ids.size, float(leaf.const_score))
            else:
                sc = scoring.leaf_score(
                    tfs, dls, tidf, spec.k1, spec.b, leaf.avgdl,
                    spec.similarity, spec.mu, leaf.wmult,
                )
            ids_parts.append(ids)
            score_parts.append(sc)
            leaf_of_part.append(li)
    if not ids_parts:
        return _finish(
            np.empty(0, np.int64), np.empty(0, np.float64), bucket, spec, dmc, resolved_boosts
        )
    all_ids = np.concatenate(ids_parts)
    all_scores = np.concatenate(score_parts)
    uniq, inv = np.unique(all_ids, return_inverse=True)
    score = np.zeros(uniq.size)
    np.add.at(score, inv, all_scores)
    # clause-match bookkeeping (a multi-key leaf counts once per doc)
    n_must = sum(1 for lf in spec.leaves if lf.is_must)
    must_cnt = np.zeros(uniq.size, dtype=np.int32)
    should_cnt = np.zeros(uniq.size, dtype=np.int32)
    off = 0
    seen_by_leaf: dict[int, np.ndarray] = {}
    for pi, ids in enumerate(ids_parts):
        li = leaf_of_part[pi]
        seg = inv[off : off + ids.size]
        prev = seen_by_leaf.get(li)
        seen_by_leaf[li] = seg if prev is None else np.union1d(prev, seg)
        off += ids.size
    excluded = np.zeros(uniq.size, dtype=bool)
    for li, seg in seen_by_leaf.items():
        occ = spec.leaves[li].occur
        if occ == "not":
            excluded[seg] = True  # Lucene MUST_NOT: match => drop
        elif spec.leaves[li].is_must:  # must and filter roles
            must_cnt[seg] += 1
        else:
            should_cnt[seg] += 1
    matched = must_cnt == n_must
    if spec.msm_field is not None and uniq.size:
        # terms_set: required should count read per doc from the docmap
        req = dmc.attrs(bucket, uniq, (spec.msm_field,))[spec.msm_field]
        req = np.asarray(req, dtype=np.int64)
        if spec.msm_map is not None:
            req = np.asarray(spec.msm_map(req), dtype=np.int64)
        matched &= should_cnt >= req
    elif spec.min_should_match > 0:
        matched &= should_cnt >= spec.min_should_match
    elif n_must == 0 and any(lf.occur == "should" for lf in spec.leaves):
        matched &= should_cnt > 0
    matched &= ~excluded
    return _finish(uniq[matched], score[matched], bucket, spec, dmc, resolved_boosts)


def _apply_tombstones(ids: np.ndarray, spec: _QuerySpec) -> np.ndarray:
    """Boolean keep-mask dropping tombstoned doc ids."""
    tomb = spec.tombstones
    if tomb is None or not getattr(tomb, "size", 0) or not ids.size:
        return np.ones(ids.size, dtype=bool)
    pos = np.clip(np.searchsorted(tomb, ids), 0, tomb.size - 1)
    return tomb[pos] != ids


def _finish(
    m_ids: np.ndarray,
    m_scores: np.ndarray,
    bucket: int,
    spec: _QuerySpec,
    dmc: _DocmapCache,
    resolved_boosts: list[tuple],
) -> pa.Table:
    # tombstoned (deleted) docs never count, page, or facet
    if m_ids.size:
        keep = _apply_tombstones(m_ids, spec)
        m_ids, m_scores = m_ids[keep], m_scores[keep]
    # R1 metadata filter against this bucket's docmap partition
    if spec.filter_spec is not None and m_ids.size:
        attrs = dmc.attrs(bucket, m_ids, spec.filter_spec.columns)
        keep = spec.filter_spec.eval(attrs, m_ids.size)
        m_ids, m_scores = m_ids[keep], m_scores[keep]
    # boosts AFTER matching+filtering (reference $project stage order);
    # multiplicative field_value_factor boosts apply after all
    # additive ones (ES function_score combine order)
    ordered = [b for b in resolved_boosts if b[0] not in ("fv", "neg")] + [
        b for b in resolved_boosts if b[0] in ("fv", "neg")
    ]
    for kind, payload, add in ordered:
        if not m_ids.size:
            break
        if kind == "ids":
            pos = np.searchsorted(payload, m_ids)
            pos = np.clip(pos, 0, max(0, payload.size - 1))
            hit = (payload[pos] == m_ids) if payload.size else np.zeros(m_ids.size, bool)
            m_scores = m_scores + np.where(hit, add, 0.0)
        elif kind == "neg":
            pos = np.searchsorted(payload, m_ids)
            pos = np.clip(pos, 0, max(0, payload.size - 1))
            hit = (payload[pos] == m_ids) if payload.size else np.zeros(m_ids.size, bool)
            m_scores = m_scores * np.where(hit, add, 1.0)
        elif kind == "fv":
            attrs = dmc.attrs(bucket, m_ids, (payload.col,))
            m_scores = payload.apply(m_scores, attrs[payload.col])
        elif kind == "rankf":
            attrs = dmc.attrs(bucket, m_ids, (payload.col,))
            v = np.asarray(attrs[payload.col], dtype=np.float64)
            m_scores = m_scores + np.where(
                np.isnan(v), 0.0, payload.boost * (v / (v + payload.pivot))
            )
        elif kind == "distf":
            attrs = dmc.attrs(bucket, m_ids, (payload.col,))
            v = np.asarray(attrs[payload.col], dtype=np.float64)
            m_scores = m_scores + np.where(
                np.isnan(v),
                0.0,
                payload.boost * (payload.pivot / (payload.pivot + np.abs(v - payload.origin))),
            )
        else:
            bst: DocAttrBoost = payload
            attrs = dmc.attrs(bucket, m_ids, (bst.col,))
            m_scores = m_scores + np.where(attrs[bst.col] == bst.value, bst.add, 0.0)
    if spec.emit_all_cols is not None:
        cols = {"doc_id": pa.array(m_ids, pa.int64()), "score": pa.array(m_scores, pa.float64())}
        if spec.emit_all_cols:
            if m_ids.size:
                attrs = dmc.attrs(bucket, m_ids, tuple(spec.emit_all_cols))
                for c in spec.emit_all_cols:
                    cols[c] = pa.array(attrs[c])
            else:
                dm = dmc.get(bucket, tuple(spec.emit_all_cols))
                for c in spec.emit_all_cols:
                    cols[c] = pa.array(dm[c][:0])
        return pa.table(cols)
    total = int(m_ids.size)
    # facet counts over the full matched set (R16)
    facet_rows: list[tuple[str, str, int]] = []
    for fcol in spec.facet_fields:
        if m_ids.size:
            vals = dmc.attrs(bucket, m_ids, (fcol,))[fcol]
            u, c = np.unique(vals, return_counts=True)
            facet_rows += [(fcol, str(v), int(n)) for v, n in zip(u, c)]
    # range-facet aggregation (ES range agg): banded counts over the
    # full matched set; same merge channel as value facets
    for rcol, edges in spec.range_facets:
        if m_ids.size:
            e = np.asarray(edges, np.float64)
            vals = dmc.attrs(bucket, m_ids, (rcol,))[rcol].astype(np.float64)
            idx = np.searchsorted(e, vals, side="right") - 1
            ok = (idx >= 0) & (idx <= e.size - 2) & (vals < e[-1])
            if ok.any():
                cnts = np.bincount(idx[ok], minlength=e.size - 1)
                facet_rows += [
                    (rcol, f"[{e[i]:g},{e[i + 1]:g})", int(c))
                    for i, c in enumerate(cnts)
                    if c
                ]
    # numeric metric aggregations over the full matched set (ES stats
    # aggregation): per-bucket partials, merged at the driver
    stat_rows: list[tuple[str, str, float]] = []
    for scol in spec.stat_fields:
        if m_ids.size:
            vals = dmc.attrs(bucket, m_ids, (scol,))[scol].astype(np.float64)
            stat_rows += [
                (scol, "count", float(vals.size)),
                (scol, "sum", float(vals.sum())),
                (scol, "min", float(vals.min())),
                (scol, "max", float(vals.max())),
            ]
    # per-bucket value histograms for exact percentile aggregation
    # (kind="quant" rows: the value rides the score column, the count
    # the count column; bounded by attribute cardinality per bucket)
    quant_rows: list[tuple[str, float, int]] = []
    for qcol in spec.quantile_fields:
        if m_ids.size:
            vals = dmc.attrs(bucket, m_ids, (qcol,))[qcol].astype(np.float64)
            u, c = np.unique(vals, return_counts=True)
            quant_rows += [(qcol, float(v), int(n)) for v, n in zip(u, c)]
    # search_after cursor: the page starts strictly after (score,
    # doc_id); totals/facets above already cover the full match set.
    # Score equality across buckets is reliable — the float64 op order
    # is fixed, so a doc's score is identical wherever it is computed.
    if spec.search_after is not None and m_ids.size:
        ca, cd = float(spec.search_after[0]), int(spec.search_after[1])
        keep = (m_scores < ca) | ((m_scores == ca) & (m_ids > cd))
        m_ids, m_scores = m_ids[keep], m_scores[keep]
    # ES field collapsing: ship this bucket's per-group argmax rows
    # instead of hit rows — the driver's cross-bucket per-group max is
    # then exact over the full matched set (a group spans buckets; the
    # local best is all a bucket can contribute to it)
    if spec.collapse_field is not None:
        coll_rows: list[tuple[str, int, float]] = []
        if m_ids.size:
            cvals = dmc.attrs(bucket, m_ids, (spec.collapse_field,))[spec.collapse_field]
            cvals = np.asarray([str(v) for v in cvals])
            order = np.lexsort((m_ids, -m_scores, cvals))
            sv = cvals[order]
            first = np.ones(order.size, dtype=bool)
            first[1:] = sv[1:] != sv[:-1]
            sel = order[first]
            coll_rows = [
                (str(cvals[i]), int(m_ids[i]), float(m_scores[i])) for i in sel
            ]
        return _result_table(
            np.empty(0, np.int64), np.empty(0, np.float64), total,
            facet_rows, stat_rows, None, quant_rows, coll_rows,
        )
    # local top-(skip+k), deterministic tie-break (rank asc, doc_id
    # asc) where rank is -score by default or the stored-field sort
    # key (ES sort). Exact under ties: select everything at or above
    # the n_take-th rank, then lexsort that candidate set.
    sort_keys = None
    if spec.sort_by is not None and m_ids.size:
        scol, sdesc = spec.sort_by
        sort_keys = dmc.attrs(bucket, m_ids, (scol,))[scol].astype(np.float64)
        rank = -sort_keys if sdesc else sort_keys
    else:
        rank = -m_scores
    if m_ids.size > spec.n_take:
        thresh = np.partition(rank, spec.n_take - 1)[spec.n_take - 1]
        cand = np.nonzero(rank <= thresh)[0]
        order = cand[np.lexsort((m_ids[cand], rank[cand]))][: spec.n_take]
    else:
        order = np.lexsort((m_ids, rank))
    return _result_table(
        m_ids[order], m_scores[order], total, facet_rows, stat_rows,
        sort_keys[order] if sort_keys is not None else None,
        quant_rows,
    )


def _result_table(
    ids, scores, total: int, facet_rows, stat_rows=(), sort_keys=None, quant_rows=(),
    coll_rows=(),
) -> pa.Table:
    # stat rows carry their float value in the `score` column; quant
    # rows carry (histogram value in `score`, count in `count`); hit
    # rows carry their stored-field sort key in `sort_key` when the
    # query sorts by attribute (0.0 otherwise — schema is fixed across
    # buckets so the scatter-gather concat never unifies); coll rows
    # carry a collapse group's local-best (value, doc_id, score)
    kinds = (
        ["hit"] * len(ids) + ["total"] + ["facet"] * len(facet_rows)
        + ["stat"] * len(stat_rows) + ["quant"] * len(quant_rows)
        + ["coll"] * len(coll_rows)
    )
    pad = len(facet_rows) + len(stat_rows) + len(quant_rows)
    doc_ids = list(map(int, ids)) + [0] + [0] * pad + [d for _, d, _ in coll_rows]
    scs = (
        list(map(float, scores)) + [0.0] + [0.0] * len(facet_rows)
        + [v for _, _, v in stat_rows] + [v for _, v, _ in quant_rows]
        + [s for _, _, s in coll_rows]
    )
    counts = (
        [0] * len(ids) + [total] + [c for _, _, c in facet_rows]
        + [0] * len(stat_rows) + [c for _, _, c in quant_rows]
        + [0] * len(coll_rows)
    )
    ffields = (
        [""] * len(ids) + [""] + [f for f, _, _ in facet_rows]
        + [f for f, _, _ in stat_rows] + [f for f, _, _ in quant_rows]
        + [""] * len(coll_rows)
    )
    fvals = (
        [""] * len(ids) + [""] + [v for _, v, _ in facet_rows]
        + [op for _, op, _ in stat_rows] + [""] * len(quant_rows)
        + [v for v, _, _ in coll_rows]
    )
    sks = (
        list(map(float, sort_keys)) if sort_keys is not None else [0.0] * len(ids)
    ) + [0.0] * (1 + pad + len(coll_rows))
    return pa.table(
        {
            "kind": pa.array(kinds, pa.string()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "score": pa.array(scs, pa.float64()),
            "count": pa.array(counts, pa.int64()),
            "facet_field": pa.array(ffields, pa.string()),
            "facet_value": pa.array(fvals, pa.string()),
            "sort_key": pa.array(sks, pa.float64()),
        }
    )


class ScoreBuckets:
    """map_groups callable for the Dataset path: scores one bucket's
    posting rows (grouped by the hive `bucket` column). Multi-shard
    reads carry a `shard` column (added at read time in search_all) so
    each row's rank stream decodes against its OWN shard's universe;
    single-shard reads use the bucket's merged docmap directly."""

    def __init__(self, spec: _QuerySpec, docmap_dirs: list[str]):
        self.spec = spec
        self.docmap_dirs = docmap_dirs
        self.dmc = _DocmapCache(docmap_dirs)
        self.resolved_boosts = _resolve_boosts(spec.boosts)
        self._univ_cache: dict[tuple[int, int], np.ndarray] = {}

    def _univ(self, di: int, b: int) -> np.ndarray:
        if len(self.docmap_dirs) == 1:
            return self.dmc.get(b, ())["doc_id"]
        u = self._univ_cache.get((di, b))
        if u is None:
            bdir = os.path.join(self.docmap_dirs[di], f"bucket={b}")
            u = np.sort(pads.dataset(bdir).to_table(columns=["doc_id"])["doc_id"].to_numpy())
            self._univ_cache[(di, b)] = u
        return u

    def __call__(self, t: pa.Table) -> pa.Table:
        bucket = int(t["bucket"][0].as_py())
        row_univ = None
        if "shard" in t.column_names:
            row_univ = [self._univ(int(s), bucket) for s in t["shard"].to_numpy()]
        return score_postings_table(
            t, bucket, self.spec, self.dmc, self.resolved_boosts, row_univ=row_univ
        )


class _BucketScorerImpl:
    """Persistent scorer owning a set of buckets: reads its buckets'
    posting partitions for a query's terms, scores, returns the tiny
    per-bucket result tables. Docmap partitions cached across queries."""

    def __init__(self, index_dirs: list[str], buckets: list[int]):
        self.index_dirs = index_dirs
        self.buckets = buckets
        self.dmc = _DocmapCache([os.path.join(d, "docmap") for d in index_dirs])
        self._post_cache: dict = {}  # (bucket, term) -> decoded postings
        self._univ_cache: dict[tuple[int, int], np.ndarray] = {}

    def _univ(self, di: int, b: int) -> np.ndarray:
        """Rank universe of shard di's bucket b (sorted doc ids). With
        one shard the merged docmap IS the universe — reuse the dmc."""
        if len(self.index_dirs) == 1:
            return self.dmc.get(b, ())["doc_id"]
        u = self._univ_cache.get((di, b))
        if u is None:
            bdir = os.path.join(self.index_dirs[di], "docmap", f"bucket={b}")
            u = np.sort(pads.dataset(bdir).to_table(columns=["doc_id"])["doc_id"].to_numpy())
            self._univ_cache[(di, b)] = u
        return u

    def warm(self, cols: tuple[str, ...] = ()) -> int:
        """Pre-load this scorer's docmap partitions (server startup)."""
        n = 0
        for b in self.buckets:
            n += self.dmc.get(b, cols)["doc_id"].size
        return n

    def score_many(
        self, reqs: list[tuple[list[int], list[str], "_QuerySpec"]]
    ) -> list[pa.Table]:
        """ES _msearch's actor half: score a BATCH of queries in ONE
        RPC round-trip — the per-query overhead of the scatter-gather
        path is the RPC itself (serialize + schedule + deserialize),
        so batching Q queries amortizes it Q-fold. Caches (postings
        decode, docmap) are shared across the batch exactly as across
        separate calls."""
        return [self.score(parts, term_keys, spec) for parts, term_keys, spec in reqs]

    def phrase_rows(
        self,
        parts: list[int],
        term_keys: list[str],
        window: int = 1,
        ordered: bool = True,
        first_end: int | None = None,
        exp_keys: tuple[str, ...] = (),
        or_keys: tuple[str, ...] = (),
        exclude_keys: tuple[str, ...] = (),
        exclude_dist: int = 0,
        little_key: str | None = None,
        span_mode: str = "containing",
    ) -> pa.Table:
        """Scatter-gather phrase half (phrase.phrase_topk's actor
        side): per owned bucket, decode this bucket's position streams
        for the phrase terms — cached per (shard, bucket, term) like
        ordinary postings — and run the shared chain kernel
        (phrase.chain_core). Returns (doc_id, ptf, dl) rows across the
        owned buckets: the phrase's match set there, small by
        construction (phrases are selective; stop-phrase-scale match
        sets belong on the Dataset path)."""
        from search_engine_ray.index.positions import decode_positions_term
        from search_engine_ray.query.phrase import chain_core

        lks = (
            set() if little_key is None
            else {little_key} if isinstance(little_key, str) else set(little_key)
        )
        keyset = sorted(
            set(term_keys) | set(exp_keys) | set(or_keys) | set(exclude_keys) | lks
        )
        out_i: list[np.ndarray] = []
        out_p: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for b in self.buckets:
            for di, d in enumerate(self.index_dirs):
                missing = [
                    tk for tk in keyset if (di, b, "pos", tk) not in self._post_cache
                ]
                if missing:
                    files = [
                        f
                        for k in parts
                        for f in glob.glob(
                            os.path.join(d, "positions", f"part={k}", f"bucket={b}", "*.parquet")
                        )
                    ]
                    got = set()
                    if files:
                        td = pads.dataset(files).to_table(
                            columns=["term", "df_local", "doc_bytes", "tf_bytes",
                                     "dl_bytes", "pos_bytes"],
                            filter=pc.field("term").isin(missing),
                        )
                        for row in td.to_pylist():
                            self._post_cache[(di, b, "pos", row["term"])] = (
                                decode_positions_term(
                                    row["doc_bytes"], row["tf_bytes"],
                                    row["dl_bytes"], row["pos_bytes"],
                                    int(row["df_local"]),
                                )
                            )
                            got.add(row["term"])
                    for tk in missing:
                        if tk not in got:
                            self._post_cache[(di, b, "pos", tk)] = None  # absent
                by_term = {
                    tk: s
                    for tk in keyset
                    if (s := self._post_cache.get((di, b, "pos", tk))) is not None
                }
                doc_ranks, ptf, dl = chain_core(
                    by_term, list(term_keys), window, ordered, first_end, list(exp_keys),
                    or_keys=list(or_keys) or None,
                    exclude_keys=list(exclude_keys) or None,
                    exclude_dist=exclude_dist,
                    little_key=little_key, span_mode=span_mode,
                )
                if doc_ranks.size == 0:
                    continue
                out_i.append(self._univ(di, b)[doc_ranks])
                out_p.append(ptf)
                out_d.append(dl)
        if not out_i:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "ptf": pa.array([], pa.int64()),
                 "dl": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_i).astype(np.int64), pa.int64()),
                "ptf": pa.array(np.concatenate(out_p), pa.int64()),
                "dl": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )

    def score(self, parts: list[int], term_keys: list[str], spec: _QuerySpec) -> pa.Table:
        resolved = _resolve_boosts(spec.boosts)
        if spec.match_all:
            # ES match_all: the bucket's docmap IS the match set
            # (score 0); filters/facets/stats/sort run in _finish
            outs = []
            for b in self.buckets:
                ids = self.dmc.get(b, ())["doc_id"]
                outs.append(
                    _finish(ids, np.zeros(ids.size), b, spec, self.dmc, resolved)
                )
            return pa.concat_tables(outs) if outs else _result_table([], [], 0, [])
        flt = pc.field("term").isin(term_keys)
        cols = POSTING_COLS + BLK_COLS if spec.prune else POSTING_COLS
        outs = []
        for b in self.buckets:
            # read per index dir so cache keys can carry the shard id
            # (several shards hold rows for the same (bucket, term))
            tables: list[pa.Table] = []
            row_keys: list = []
            row_univ: list = []
            for di, d in enumerate(self.index_dirs):
                files = [
                    f
                    for k in parts
                    for f in glob.glob(
                        os.path.join(d, "postings", f"part={k}", f"bucket={b}", "*.parquet")
                    )
                ]
                if not files:
                    continue
                td = pads.dataset(files).to_table(columns=cols, filter=flt)
                if td.num_rows:
                    tables.append(td)
                    row_keys += [(di, b, tm) for tm in td["term"].to_pylist()]
                    row_univ += [self._univ(di, b)] * td.num_rows
            if not tables:
                continue
            t = pa.concat_tables(tables)
            cache = None if spec.prune else self._post_cache
            outs.append(
                score_postings_table(t, b, spec, self.dmc, resolved, cache, row_keys, row_univ)
            )
        if not outs:
            return _result_table([], [], 0, [])
        return pa.concat_tables(outs)


class SearchEngine:
    """Query-side entry point over an index directory (single build or
    resumable multi-shard layout)."""

    def __init__(self, index_dir: str, config: IndexConfig | None = None, num_scorers: int = 8):
        self.config = config or IndexConfig()
        shard_glob = os.path.join(index_dir, "shards", "shard_*")
        shards = sorted(d for d in glob.glob(shard_glob) if os.path.isdir(d))
        self.dirs = shards or [index_dir]
        self.stats = self._merge_stats()
        # the build may have RAISED num_parts for its merge memory
        # bound (config.auto_num_parts); the on-disk layout in
        # stats.json is authoritative for partition pruning
        from dataclasses import replace as _dc_replace

        layout = {
            k: int(self.stats[k])
            for k in ("num_parts", "num_buckets")
            if self.stats.get(k) is not None
        }
        if any(getattr(self.config, k) != v for k, v in layout.items()):
            self.config = _dc_replace(self.config, **layout)
        self.index_dir = index_dir
        # federated DFS hook: when set (a {term_key: global_df} dict),
        # _df_for_terms serves these instead of the local dictionaries
        # and `stats` is replaced with the fleet-global stats, so this
        # member scores exactly as one shard of the combined corpus
        self.df_override: dict[str, int] | None = None
        # deleted doc ids (small relative to corpus — compaction removes
        # them physically); refreshed whenever the tombstone dir changes
        # so deletes take effect on the NEXT search without rebuilding
        # the engine or its scorer pool; shipped with each query spec
        self._tomb_key: tuple | None = None
        self.tombstones: np.ndarray | None = None
        self._refresh_tombstones()
        self.num_scorers = min(num_scorers, self.config.num_buckets)
        self._actors: list | None = None
        # (dir, part) -> dictionary table, loaded lazily per touched part
        self._dict_tables: dict[tuple[str, int], pa.Table] = {}

    def _refresh_tombstones(self) -> None:
        tdir = os.path.join(self.index_dir, "tombstones")
        try:
            names = sorted(os.listdir(tdir))
            key = (len(names), tuple(names[:64]), os.stat(tdir).st_mtime_ns)
        except FileNotFoundError:
            key = None
        if key == self._tomb_key:
            return
        self._tomb_key = key
        if key is None:
            self.tombstones = None
            return
        from search_engine_ray.index.build import load_tombstones

        t = load_tombstones(self.index_dir)
        self.tombstones = t if t.size else None

    def _merge_stats(self) -> dict:
        merged: dict | None = None
        for d in self.dirs:
            with open(os.path.join(d, "stats.json")) as f:
                s = json.load(f)
            from search_engine_ray.index.build import READABLE_FORMATS

            if s.get("postings_format") not in READABLE_FORMATS:
                raise ValueError(
                    f"index shard {d} has postings_format={s.get('postings_format')}; "
                    f"this engine reads {sorted(READABLE_FORMATS)} (rank-encoded) "
                    "postings — rebuild the index"
                )
            if merged is None:
                merged = s
            elif s["postings_format"] != merged["postings_format"]:
                raise ValueError(
                    "index shards mix postings formats "
                    f"({merged['postings_format']} vs {s['postings_format']}) — "
                    "rebuild with one codec"
                )
            else:
                merged["n_docs"] += s["n_docs"]
                for fname, fs in s["fields"].items():
                    merged["fields"][fname]["total_len"] += fs["total_len"]
        assert merged is not None
        for fs in merged["fields"].values():
            fs["avgdl"] = fs["total_len"] / merged["n_docs"] if merged["n_docs"] else 0.0
        self.block_size = merged["block_size"]
        self.postings_format = int(merged["postings_format"])
        return merged

    # ---- scorer actor pool (lazy; persists across queries) ----------
    def _scorer_pool(self) -> list:
        if self._actors is None:
            import ray

            # num_cpus=0: the pool is latency-oriented and bursty —
            # reserving whole cores would deadlock small clusters
            # (actors pin CPUs forever); at sustained query load size
            # the pool to cores and reserve instead.
            cls = ray.remote(num_cpus=0)(_BucketScorerImpl)
            assign: list[list[int]] = [[] for _ in range(self.num_scorers)]
            for b in range(self.config.num_buckets):
                assign[b % self.num_scorers].append(b)
            self._actors = [cls.remote(self.dirs, bs) for bs in assign if bs]
        return self._actors

    def prewarm(self) -> int:
        """Spawn the scorer pool and pre-load every docmap partition —
        server-startup warm-up so the first user query pays no actor
        spin-up / docmap IO. Returns total docs cached."""
        import ray

        return sum(ray.get([a.warm.remote() for a in self._scorer_pool()]))

    # ---- dictionary -------------------------------------------------
    def _dict_table(self, d: str, part: int) -> pa.Table:
        """One (shard dir, part)'s dictionary, loaded once and cached
        in-engine. Re-reading the dict parquet from the driver on EVERY
        query was the serial bottleneck capping concurrent QPS (~12
        regardless of cluster size). The cache is bounded by the
        DICTIONARY (vocabulary x 16 bytes), not the corpus, and only
        the parts a query actually touches load; at extreme vocabulary
        sizes move the lookup into the scorer actors instead."""
        key = (d, part)
        t = self._dict_tables.get(key)
        if t is None:
            files = glob.glob(os.path.join(d, "dict", f"part={part}", "*.parquet"))
            if files:
                # cf rides along for lm_dirichlet's collection LM —
                # one extra int64 column on the same bounded cache
                t = (
                    pads.dataset(files)
                    .to_table(columns=["term", "df", "cf"])
                    .combine_chunks()
                )
            else:
                t = pa.table(
                    {
                        "term": pa.array([], pa.string()),
                        "df": pa.array([], pa.int64()),
                        "cf": pa.array([], pa.int64()),
                    }
                )
            self._dict_tables[key] = t
        return t

    def _df_for_terms(self, term_keys: Sequence[str]) -> dict[str, int]:
        if not term_keys:
            return {}
        if self.df_override is not None:
            # federated DFS phase: score with GLOBAL dfs gathered
            # across all member indexes (query/federated.py)
            return {
                tk: self.df_override[tk]
                for tk in term_keys
                if self.df_override.get(tk, 0) > 0
            }
        # explicit partition pruning: a query for Q terms touches <= Q
        # part directories (part = hash(term) % num_parts)
        parts = sorted({term_part(tk, self.config.num_parts) for tk in term_keys})
        keyset = pa.array(sorted(set(term_keys)))
        out: dict[str, int] = {}
        for d in self.dirs:
            for k in parts:
                t = self._dict_table(d, k)
                if not t.num_rows:
                    continue
                sub = t.filter(pc.is_in(t["term"], value_set=keyset))
                for tk, df in zip(sub["term"].to_pylist(), sub["df"].to_pylist()):
                    out[tk] = out.get(tk, 0) + int(df)
        return out

    def _cf_for_terms(self, term_keys: Sequence[str]) -> dict[str, int]:
        """Collection frequency (total tf across the corpus) per term
        key, from the same part-pruned dictionary reads as
        _df_for_terms — the ``cf`` column the build already stores.
        Used by the lm_dirichlet similarity's collection LM."""
        if not term_keys:
            return {}
        if self.df_override is not None:
            raise ValueError(
                "similarity='lm_dirichlet' is not supported under "
                "federated global-DFS scoring (no cf override channel)"
            )
        parts = sorted({term_part(tk, self.config.num_parts) for tk in term_keys})
        keyset = pa.array(sorted(set(term_keys)))
        out: dict[str, int] = {}
        for d in self.dirs:
            for k in parts:
                t = self._dict_table(d, k)
                if not t.num_rows:
                    continue
                sub = t.filter(pc.is_in(t["term"], value_set=keyset))
                for tk, cf in zip(sub["term"].to_pylist(), sub["cf"].to_pylist()):
                    out[tk] = out.get(tk, 0) + int(cf)
        return out

    def _expand_prefix(self, leaf: Prefix) -> list[str]:
        """Dictionary range-scan fallback when the prefix is outside the
        edge-n-gram window (S2 'sorted-term-dictionary range scan') —
        in-memory over the cached dict tables (range scans cannot prune
        by term-hash part, so every part's dictionary is consulted)."""
        spec = self.config.field_by_name(leaf.field)
        lo = f"{spec.code}:{leaf.prefix}"
        hi = f"{spec.code}:{leaf.prefix}\U0010ffff"
        keys: set[str] = set()
        for d in self.dirs:
            for k in range(self.config.num_parts):
                t = self._dict_table(d, k)
                if not t.num_rows:
                    continue
                m = pc.and_(pc.greater_equal(t["term"], lo), pc.less(t["term"], hi))
                keys.update(t.filter(m)["term"].to_pylist())
        out = sorted(keys)
        return out[: self.config.max_prefix_expansions]

    def _expand_fuzzy(self, leaf: Fuzzy) -> list[str]:
        """S10 fuzzy match: expand the token against the sorted term
        dictionary to every term within `max_edits` Levenshtein edits
        (Lucene FuzzyQuery's dictionary expansion). Exact recall: the
        field-code range narrows to the exact-term namespace, a
        vectorized utf8_length band (|len(t) - len(q)| <= max_edits —
        a necessary condition for any edit distance) prunes candidates,
        and every survivor runs the capped DP. Like the prefix range
        scan this consults every part's dictionary (edits cannot prune
        by term-hash part) and caps at max_prefix_expansions."""
        from search_engine_ray.analysis import levenshtein

        spec = self.config.field_by_name(leaf.field)
        q, k = leaf.token, leaf.max_edits
        lo, hi = _field_namespace_range(spec)
        pre = len(lo)
        keys: set[str] = set()
        for d in self.dirs:
            for part in range(self.config.num_parts):
                t = self._dict_table(d, part)
                if not t.num_rows:
                    continue
                m = pc.and_(pc.greater_equal(t["term"], lo), pc.less(t["term"], hi))
                terms = t.filter(m)["term"]
                tl = pc.utf8_length(terms)
                band = pc.and_(
                    pc.greater_equal(tl, pre + len(q) - k),
                    pc.less_equal(tl, pre + len(q) + k),
                )
                for key in terms.filter(band).to_pylist():
                    if key not in keys and levenshtein(key[pre:], q, k) <= k:
                        keys.add(key)
        return sorted(keys)[: self.config.max_prefix_expansions]

    def _expand_pattern(self, leaf) -> list[str]:
        """Wildcard/Regexp dictionary expansion (Lucene
        Wildcard/RegexpQuery): the pattern's literal prefix (characters
        that MUST appear, i.e. not followed by a quantifier) bounds a
        sorted-dictionary range scan; survivors are matched with a
        compiled full-token regex. Caps at max_prefix_expansions like
        the other multi-term rewrites."""
        import fnmatch
        import re

        spec = self.config.field_by_name(leaf.field)
        lo_ns, hi_ns = _field_namespace_range(spec)
        pre = len(lo_ns)
        p = leaf.pattern
        if isinstance(leaf, Wildcard):
            i = 0
            while i < len(p) and p[i] not in "*?":
                i += 1
            lit = p[:i]
            rx = re.compile(fnmatch.translate(p))
        else:
            lit_chars: list[str] = []
            if "|" not in p:  # any alternation can bypass a "prefix"
                i = 0
                while i < len(p) and (p[i].isalnum() or p[i] == "_"):
                    if i + 1 < len(p) and p[i + 1] in "*?+{":
                        break  # next char is quantified: not required
                    lit_chars.append(p[i])
                    i += 1
            lit = "".join(lit_chars)
            rx = re.compile(f"(?:{p})\\Z")
        lo = lo_ns + lit
        hi = lo + "\U0010ffff" if lit else hi_ns
        keys: set[str] = set()
        for d in self.dirs:
            for part in range(self.config.num_parts):
                t = self._dict_table(d, part)
                if not t.num_rows:
                    continue
                m = pc.and_(pc.greater_equal(t["term"], lo), pc.less(t["term"], hi))
                for key in t.filter(m)["term"].to_pylist():
                    if key not in keys and rx.match(key[pre:]):
                        keys.add(key)
        return sorted(keys)[: self.config.max_prefix_expansions]

    def suggest(
        self, field: str, token: str, max_edits: int = 2, k: int = 5
    ) -> list[dict]:
        """'Did you mean' spelling suggestions (Lucene
        DirectSpellChecker analog): dictionary terms of ``field``
        within ``max_edits`` Levenshtein edits of ``token``, ranked by
        (edit distance asc, df desc, term asc) — closer corrections
        first, popularity breaks ties. The exact token is excluded.
        Same field-code range scan + length-banded capped-DP expansion
        as the Fuzzy leaf; dfs summed across shards. Returns
        ``[{"term", "df", "distance"}, ...]`` (top k)."""
        from search_engine_ray.analysis import levenshtein

        spec = self.config.field_by_name(field)
        lo, hi = _field_namespace_range(spec)
        pre = len(lo)
        dfs: dict[str, int] = {}
        for d in self.dirs:
            for part in range(self.config.num_parts):
                t = self._dict_table(d, part)
                if not t.num_rows:
                    continue
                m = pc.and_(pc.greater_equal(t["term"], lo), pc.less(t["term"], hi))
                sub = t.filter(m)
                tl = pc.utf8_length(sub["term"])
                band = pc.and_(
                    pc.greater_equal(tl, pre + len(token) - max_edits),
                    pc.less_equal(tl, pre + len(token) + max_edits),
                )
                sub = sub.filter(band)
                for key, df in zip(sub["term"].to_pylist(), sub["df"].to_pylist()):
                    bare = key[pre:]
                    if bare != token:
                        dfs[bare] = dfs.get(bare, 0) + int(df)
        scored = [
            (dist, -df, term)
            for term, df in dfs.items()
            if (dist := levenshtein(term, token, max_edits)) <= max_edits
        ]
        scored.sort()
        return [
            {"term": term, "df": -negdf, "distance": dist}
            for dist, negdf, term in scored[:k]
        ]

    def dictionary_terms(self, field: str):
        """Lucene Terms API: the field's EXACT-term dictionary as a
        Ray Dataset of (term, df) rows — bare tokens, dfs summed
        across shards. Dataset-native (one read_parquet over every
        shard's dict dirs + a combined groupby), so exporting a
        100 TB corpus's vocabulary streams instead of loading the
        driver-side dict cache."""
        import glob as _glob

        import ray.data as _rd

        from ray.data.aggregate import Sum

        spec = self.config.field_by_name(field)
        lo, hi = _field_namespace_range(spec)
        pre = len(lo)
        files = [
            f
            for d in self.dirs
            for f in _glob.glob(os.path.join(d, "dict", "part=*", "*.parquet"))
        ]
        ds = _rd.read_parquet(files, columns=["term", "df"])

        def _bare(t: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(t["term"], lo), pc.less(t["term"], hi))
            t = t.filter(m)
            return pa.table({
                "term": pc.utf8_slice_codeunits(t["term"], pre),
                "df": t["df"],
            })

        return (
            ds.map_batches(_bare, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("df", alias_name="df"))
        )

    def suggest_phrase(
        self,
        field: str,
        phrase: str,
        max_edits: int = 2,
        per_token_k: int = 3,
        k: int = 3,
    ) -> list[dict]:
        """ES phrase suggester (simplified): correct a multi-token
        query as a whole. Per token, the top ``per_token_k`` term
        suggestions (the `suggest` ranking — distance asc, df desc,
        term asc; a token that IS a dictionary term stands as its own
        distance-0 candidate); candidate phrases are the cross
        product, scored by a unigram LM — sum of ln(df/N) — with
        (fewer total edits, lexicographic phrase) tiebreaks, exactly
        reproducible in SQL. Returns top ``k``:
        ``[{"phrase", "logprob", "edits"}, ...]``.

        Cross-product size is per_token_k^n_tokens — bounded by the
        QUERY length, never the corpus; the per-token dictionary scans
        are the only index work."""
        from itertools import product as _iterprod

        from search_engine_ray.analysis import TOKEN_RE

        tokens = TOKEN_RE.findall(phrase.lower())
        if not tokens:
            return []
        n = float(self.stats["n_docs"])
        cands: list[list[tuple[str, int, int]]] = []
        for tok in tokens:
            rows = self.suggest(field, tok, max_edits=max_edits, k=per_token_k)
            own_df = self._term_df(field, tok)
            opts = [(r["term"], int(r["df"]), int(r["distance"])) for r in rows]
            if own_df > 0:
                opts = [(tok, own_df, 0)] + opts
            opts = opts[:per_token_k] if opts else [(tok, 0, 0)]
            cands.append(opts)
        scored = []
        for combo in _iterprod(*cands):
            lp = sum(np.log(df / n) if df > 0 else -np.inf for _, df, _ in combo)
            edits = sum(d for _, _, d in combo)
            text = " ".join(t for t, _, _ in combo)
            scored.append((-lp, edits, text))
        scored.sort()
        return [
            {"phrase": text, "logprob": -neglp, "edits": edits}
            for neglp, edits, text in scored[:k]
        ]

    def _term_df(self, field: str, token: str) -> int:
        """Dictionary df of an exact token in `field` (0 if absent),
        summed across shards."""
        key = self.config.term_key(field, token)
        total = 0
        for d in self.dirs:
            for part in range(self.config.num_parts):
                t = self._dict_table(d, part)
                if not t.num_rows:
                    continue
                sub = t.filter(pc.equal(t["term"], key))
                total += int(pc.sum(sub["df"]).as_py() or 0)
        return total

    def mlt_query(
        self,
        text: str,
        field: str,
        max_terms: int = 10,
        min_should_match: int = 1,
    ) -> Compound:
        """More-Like-This (Lucene MoreLikeThis): analyze the seed
        ``text`` with the index analyzer, rank its terms by
        tf(in seed) * idf(in corpus) — frequent here, rare everywhere —
        keep the top ``max_terms`` (ties broken by term asc), and
        return the should-OR Compound that finds similar documents.
        Terms absent from the index (df = 0) are dropped, like
        Lucene's. Pure planning: one dictionary df lookup, no
        scoring pass."""
        from search_engine_ray.analysis import get_analyzer

        toks = get_analyzer(self.config.analyzer).analyze(text or "")
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        keys = {t: self.config.term_key(field, t) for t in tf}
        dfs = self._df_for_terms(list(keys.values()))
        n = self.stats["n_docs"]
        ranked = sorted(
            (-tf[t] * float(scoring.idf(n, dfs[keys[t]])), t)
            for t in tf
            if keys[t] in dfs
        )
        chosen = [t for _, t in ranked[:max_terms]]
        return Compound(
            should=tuple(Term(field, t) for t in chosen),
            min_should_match=min_should_match,
        )

    def term_vectors(self, text: str, field: str) -> pd.DataFrame:
        """ES _termvectors API (re-analysis mode): analyze ``text``
        with the index analyzer and return one row per distinct term
        with its tf (term frequency in the text) and df (document
        frequency in the corpus, from the dictionary — terms absent
        from the index report df 0). Pure planning-side: one
        dictionary lookup, no postings scan. Rows sorted term asc."""
        from search_engine_ray.analysis import get_analyzer

        toks = get_analyzer(self.config.analyzer).analyze(text or "")
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        keys = {t: self.config.term_key(field, t) for t in tf}
        dfs = self._df_for_terms(list(keys.values()))
        terms = sorted(tf)
        return pd.DataFrame(
            {
                "term": terms,
                "tf": np.array([tf[t] for t in terms], dtype=np.int64),
                "df": np.array([dfs.get(keys[t], 0) for t in terms], dtype=np.int64),
            }
        )

    def _resolve(
        self, q: Compound, similarity: str = "bm25", mu: float = 2000.0
    ) -> list[_ResolvedLeaf]:
        cfg = self.config
        # raw entry: (clause_id, role, keys, field-per-key, const,
        # blend, dismax, tie_breaker, boost)
        raw: list[tuple] = []
        roled = (
            [(l, "must") for l in q.must]
            + [(l, "should") for l in q.should]
            + [(l, "filter") for l in q.filter]
            + [(l, "not") for l in q.must_not]
        )
        for ci, (leaf, role) in enumerate(roled):
            blend = dismax = False
            blend_df = True  # dismax only: CrossFields blends df, BestFields keeps per-field df
            tie = 0.0
            if isinstance(leaf, Term):
                keys = [cfg.term_key(leaf.field, leaf.token)]
            elif isinstance(leaf, Phonetic):
                keys = [cfg.phonetic_key(leaf.field, leaf.token)]
            elif isinstance(leaf, Fuzzy):
                keys = self._expand_fuzzy(leaf)
            elif isinstance(leaf, (Wildcard, Regexp)):
                keys = self._expand_pattern(leaf)
            elif isinstance(leaf, Synonyms):
                keys = [cfg.term_key(leaf.field, t) for t in leaf.tokens]
                blend = True
            elif isinstance(leaf, CrossFields):
                keys = [cfg.term_key(f, leaf.token) for f in leaf.fields]
                fields = list(leaf.fields)
                dismax = True
                tie = float(leaf.tie_breaker)
            elif isinstance(leaf, BestFields):
                # same DisMax combine as CrossFields, but each field
                # keeps its OWN df/idf (Lucene DisjunctionMaxQuery of
                # per-field TermQuery — ES multi_match best_fields)
                keys = [cfg.term_key(f, leaf.token) for f in leaf.fields]
                fields = list(leaf.fields)
                dismax = True
                blend_df = False
                tie = float(leaf.tie_breaker)
            elif isinstance(leaf, Prefix):
                spec = cfg.field_by_name(leaf.field)
                if spec.ngram and spec.ngram_min <= len(leaf.prefix) <= spec.ngram_max:
                    keys = [cfg.prefix_key(leaf.field, leaf.prefix)]
                else:
                    keys = self._expand_prefix(leaf)
            else:
                raise TypeError(type(leaf))
            if not dismax:
                fields = [leaf.field] * len(keys)
            # filter/mustNot clauses match but never score (Lucene
            # FILTER / MUST_NOT): a 0.0 const reuses every const-score
            # path (including const-once-per-doc for multi-key leaves)
            const = 0.0 if role in ("filter", "not") else leaf.const_score
            raw.append(
                (ci, role, keys, fields, const, blend, dismax, tie, float(leaf.boost), blend_df)
            )
        all_keys = [k for r in raw for k in r[2]]
        dfs = self._df_for_terms(all_keys)
        cfs = (
            self._cf_for_terms(all_keys) if similarity == "lm_dirichlet" else {}
        )
        n = self.stats["n_docs"]
        out: list[_ResolvedLeaf] = []
        for ci, role, keys, fields, const, blend, dismax, tie, boost, blend_df in raw:
            kept = [(k, f) for k, f in zip(keys, fields) if k in dfs]
            keys = [k for k, _ in kept]
            fields = [f for _, f in kept]
            wmult = 1.0
            if similarity != "bm25" and not blend and not dismax:
                # alternate similarities resolve a different per-key
                # weight (see scoring.leaf_score); blend/dismax leaves
                # are rejected in search() for these
                if similarity == "classic":
                    idfs = tuple(
                        float(scoring.classic_idf(n, dfs[k])) ** 2 * boost
                        for k in keys
                    )
                elif similarity == "lm_dirichlet":
                    idfs = tuple(
                        mu
                        * (
                            float(cfs[k])
                            / float(self.stats["fields"][f]["total_len"])
                        )
                        for k, f in zip(keys, fields)
                    )
                    wmult = boost  # mu*p is not linear in the score
                elif similarity == "dfr":
                    idfs = tuple(
                        float(scoring.dfr_basic_in(n, dfs[k])) * boost for k in keys
                    )
                elif similarity == "boolean":
                    idfs = tuple(boost for _ in keys)
                else:
                    raise ValueError(f"unknown similarity {similarity!r}")
                if boost != 1.0 and const is not None:
                    const = const * boost
                out.append(
                    _ResolvedLeaf(
                        clause_id=ci,
                        is_must=role in ("must", "filter"),
                        term_keys=tuple(keys),
                        idfs=idfs,
                        avgdl=self.stats["fields"][fields[0]]["avgdl"]
                        if fields
                        else next(iter(self.stats["fields"].values()))["avgdl"],
                        const_score=const,
                        blend=blend,
                        dismax=dismax,
                        tie_breaker=tie,
                        avgdls=None,
                        role=role,
                        wmult=wmult,
                    )
                )
                continue
            if blend and keys:
                # SynonymQuery: one idf from the max per-key df
                bidf = float(scoring.idf(n, max(dfs[k] for k in keys)))
                idfs = tuple(bidf for _ in keys)
            elif dismax and keys:
                if blend_df:
                    # BlendedTermQuery: df blended across fields —
                    # min(sum per-field dfs, N) (the Elasticsearch
                    # combined/cross-field blend; capped at N since a
                    # doc matching in several fields is still one doc)
                    bdf = min(sum(dfs[k] for k in keys), n)
                    bidf = float(scoring.idf(n, bdf))
                    idfs = tuple(bidf for _ in keys)
                else:
                    # best_fields: every field keeps its own idf
                    idfs = tuple(float(scoring.idf(n, dfs[k])) for k in keys)
            else:
                idfs = tuple(float(scoring.idf(n, dfs[k])) for k in keys)
            if boost != 1.0:
                # Lucene BoostQuery: BM25 is linear in idf, so the
                # boost folds into the resolved idfs exactly (and into
                # the constant for const-score clauses) — transparent
                # to the scoring core and to WAND upper bounds
                idfs = tuple(i * boost for i in idfs)
                if const is not None:
                    const = const * boost
            out.append(
                _ResolvedLeaf(
                    clause_id=ci,
                    is_must=role in ("must", "filter"),
                    term_keys=tuple(keys),
                    idfs=idfs,
                    avgdl=self.stats["fields"][fields[0]]["avgdl"]
                    if fields
                    else next(iter(self.stats["fields"].values()))["avgdl"],
                    const_score=const,
                    blend=blend,
                    dismax=dismax,
                    tie_breaker=tie,
                    avgdls=tuple(self.stats["fields"][f]["avgdl"] for f in fields)
                    if dismax
                    else None,
                    role=role,
                )
            )
        return out

    def _make_spec(
        self, leaves, q, n_take, filter_spec, boosts, facet_fields,
        emit_all=None, search_after=None, stat_fields=(), range_facets=(),
        sort_by=None, match_all=False, quantile_fields=(),
        similarity="bm25", mu=2000.0,
    ):
        return _QuerySpec(
            similarity=similarity,
            mu=mu,
            leaves=tuple(leaves),
            k1=self.stats["k1"],
            b=self.stats["b"],
            min_should_match=q.min_should_match,
            msm_field=getattr(q, "msm_field", None),
            msm_map=getattr(q, "msm_map", None),
            n_take=n_take,
            filter_spec=filter_spec,
            boosts=tuple(boosts),
            facet_fields=tuple(facet_fields),
            block_size=self.block_size,
            postings_format=self.postings_format,
            emit_all_cols=emit_all,
            tombstones=self.tombstones,
            search_after=search_after,
            stat_fields=tuple(stat_fields),
            range_facets=tuple(range_facets),
            sort_by=sort_by,
            match_all=match_all,
            quantile_fields=tuple(quantile_fields),
        )

    # ---- search (scatter-gather over the actor pool) ----------------
    def search(
        self,
        q: Compound,
        k: int = 10,
        skip: int = 0,
        filter_spec: FilterSpec | None = None,
        boosts: tuple = (),
        facet_fields: tuple[str, ...] = (),
        with_metadata: bool = True,
        prune: bool = False,
        search_after: tuple | None = None,
        stat_fields: tuple[str, ...] = (),
        range_facets: dict[str, tuple] | None = None,
        sort_by: tuple[str, bool] | None = None,
        quantile_fields: dict[str, tuple] | None = None,
        similarity: str = "bm25",
        mu: float = 2000.0,
        collapse: str | None = None,
    ) -> SearchResult:
        """collapse: ES field collapsing — the page holds one hit per
        distinct value of this docmap column (each group's best doc,
        doc_id asc on ties), ranked like ordinary hits; `total` still
        counts DOCUMENTS, as in ES. Mutually exclusive with sort_by /
        search_after; disables pruning (a pruned doc could own a
        group).

        search_after: deep-pagination cursor (score, doc_id) of the
        LAST hit of the previous page — the page starts strictly after
        it in (score desc, doc_id asc) order. Unlike skip (which ships
        skip+k candidates per bucket), a cursor ships only k however
        deep the page is. Mutually exclusive with skip; disables
        pruning (the cursor invalidates the WAND theta bound).

        range_facets: {col: (e0, e1, ..., en)} — ES range aggregation:
        per-band counts [e_i, e_{i+1}) over the FULL matched set,
        reported in .facets[col] under "[lo,hi)" labels.

        sort_by: (col, descending) — ES sort by a NUMERIC stored
        field: the page is ordered by the docmap attribute (doc_id asc
        tiebreak) instead of the score; scores are still computed and
        reported. Mutually exclusive with search_after (the cursor is
        a (score, doc_id) position); disables pruning (WAND bounds
        rank by score, not by attribute)."""
        import ray

        if search_after is not None and skip:
            raise ValueError("search_after and skip are mutually exclusive")
        if search_after is not None and sort_by is not None:
            raise ValueError("search_after and sort_by are mutually exclusive")
        if collapse is not None and (sort_by is not None or search_after is not None):
            raise ValueError("collapse is mutually exclusive with sort_by/search_after")
        if similarity not in scoring.SIMILARITIES:
            raise ValueError(f"unknown similarity {similarity!r}")
        rf = tuple((c, tuple(e)) for c, e in (range_facets or {}).items())
        self._refresh_tombstones()
        match_all = isinstance(q, MatchAll)
        if match_all:
            q = Compound()
        else:
            q, range_conds = _lower_ranges(q)
            if range_conds:
                if not (q.must or q.should or q.filter):
                    if q.must_not:
                        # would need a match-all scan WITH postings
                        # exclusion — not a supported execution shape
                        raise ValueError(
                            "NumericRange + mustNot without any positive term "
                            "clause is unsupported; add a term clause"
                        )
                    # range-only query: docmap scan with the lowered
                    # predicate (Atlas standalone range operator)
                    match_all = True
                base = filter_spec.conditions if filter_spec is not None else ()
                filter_spec = FilterSpec(tuple(base) + tuple(range_conds))
        leaves = self._resolve(q, similarity, mu)
        if similarity != "bm25" and any(lf.blend or lf.dismax for lf in leaves):
            raise ValueError(
                "Synonyms/CrossFields clauses blend BM25 statistics; "
                "they require similarity='bm25'"
            )
        if not match_all:
            # a must clause with no indexed term can never match;
            # total=0 is provably exact on these early returns
            # regardless of the prune request (nothing was skipped)
            if any(lf.is_must and not lf.term_keys for lf in leaves):
                return SearchResult(0, _empty_hits(), total_exact=True)
            # a purely negative query (only mustNot clauses carry
            # indexed terms) matches nothing, like Lucene's
            if not any(lf.term_keys for lf in leaves if lf.occur != "not"):
                return SearchResult(0, _empty_hits(), total_exact=True)
        term_keys = [k2 for lf in leaves for k2 in lf.term_keys]
        # pruning is rank-safe only for pure-OR top-k with no filter /
        # boost / facet side-outputs (and makes `total` a lower bound);
        # tombstones disable it (a pruned doc set can't be post-filtered
        # safely without decoding)
        prune = (
            prune
            and similarity == "bm25"  # WAND bounds are BM25-specific
            and self.tombstones is None
            and search_after is None
            and not q.must
            and not q.must_not
            and not q.filter
            and q.min_should_match <= 1
            and getattr(q, "msm_field", None) is None
            and filter_spec is None
            and not boosts
            and not facet_fields
            and not stat_fields
            and not rf
            and sort_by is None
            and collapse is None
            and not match_all
            and not quantile_fields
            and all(
                lf.const_score is None and not lf.blend and not lf.dismax
                for lf in leaves
            )
        )
        parts = sorted({term_part(tk, self.config.num_parts) for tk in term_keys})
        spec = self._make_spec(
            leaves, q, skip + k, filter_spec, boosts, facet_fields,
            search_after=search_after, stat_fields=tuple(stat_fields),
            range_facets=rf, sort_by=sort_by, match_all=match_all,
            quantile_fields=tuple((quantile_fields or {}).keys()),
            similarity=similarity, mu=mu,
        )
        if collapse is not None:
            spec = _QuerySpec(**{**spec.__dict__, "collapse_field": collapse})
        if prune:
            theta0 = float("-inf")
            if len(term_keys) > 1:
                # phase 1: kth best score of the HIGHEST-IDF (rarest,
                # cheapest) term alone — a valid global lower bound of
                # the final kth score, broadcast so every bucket can
                # prune even before it holds k local candidates
                best = max(
                    ((lf, tk, idf) for lf in leaves for tk, idf in zip(lf.term_keys, lf.idfs)),
                    key=lambda x: x[2],
                )
                lf1 = _ResolvedLeaf(0, False, (best[1],), (best[2],), best[0].avgdl, best[0].const_score)
                spec1 = _QuerySpec(
                    leaves=(lf1,), k1=spec.k1, b=spec.b, min_should_match=0,
                    n_take=skip + k, filter_spec=None, boosts=(), facet_fields=(),
                    block_size=spec.block_size, postings_format=spec.postings_format,
                )
                p1 = sorted({term_part(best[1], self.config.num_parts)})
                f1 = [a.score.remote(p1, [best[1]], spec1) for a in self._scorer_pool()]
                h1 = pa.concat_tables(ray.get(f1)).to_pandas()
                h1 = h1[h1["kind"] == "hit"]["score"].nlargest(skip + k)
                if len(h1) >= skip + k:
                    theta0 = float(h1.iloc[-1])
            spec = _QuerySpec(**{**spec.__dict__, "prune": True, "initial_theta": theta0})
        futs = [a.score.remote(parts, term_keys, spec) for a in self._scorer_pool()]
        out = pa.concat_tables(ray.get(futs)).to_pandas()
        if out.empty:
            # pruning scores every doc until the candidate pool can
            # bound the rest; an empty pool means no matches existed,
            # so total=0 is exact even under pruning
            return SearchResult(0, _empty_hits(), total_exact=True)
        total = int(out.loc[out["kind"] == "total", "count"].sum())
        if collapse is not None:
            # global per-group max over the buckets' local bests: one
            # row per group survives, then representatives rank like
            # ordinary hits (score desc, doc_id asc) and page
            cr = out[out["kind"] == "coll"][["facet_value", "doc_id", "score"]]
            if len(cr):
                cr = cr.sort_values(
                    ["score", "doc_id"], ascending=[False, True], kind="mergesort"
                )
                hits = (
                    cr.groupby("facet_value", sort=False)
                    .head(1)[["doc_id", "score"]]
                    .iloc[skip : skip + k]
                    .reset_index(drop=True)
                )
            else:
                hits = _empty_hits()
        elif sort_by is not None:
            hits = out[out["kind"] == "hit"][["doc_id", "score", "sort_key"]]
            hits = hits.sort_values(
                ["sort_key", "doc_id"], ascending=[not sort_by[1], True], kind="mergesort"
            )
            # key stays under the fixed name "sort_key" so a later
            # _attach_metadata merge can never collide with the
            # attribute's own docmap column
            hits = hits.iloc[skip : skip + k].reset_index(drop=True)
        else:
            hits = out[out["kind"] == "hit"][["doc_id", "score"]]
            hits = hits.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
            hits = hits.iloc[skip : skip + k].reset_index(drop=True)
        facets: dict[str, dict[str, int]] = {}
        fr = out[out["kind"] == "facet"]
        if len(fr):
            agg = fr.groupby(["facet_field", "facet_value"])["count"].sum()
            for (ff, fv), c in agg.items():
                facets.setdefault(ff, {})[fv] = int(c)
        stats: dict[str, dict[str, float]] = {}
        sr = out[out["kind"] == "stat"]
        if len(sr):
            for col, g in sr.groupby("facet_field"):
                by_op = {op: gg["score"] for op, gg in g.groupby("facet_value")}
                cnt = float(by_op["count"].sum())
                s = {
                    "count": cnt,
                    "sum": float(by_op["sum"].sum()),
                    "min": float(by_op["min"].min()),
                    "max": float(by_op["max"].max()),
                }
                s["avg"] = s["sum"] / cnt if cnt else 0.0
                stats[str(col)] = s
        quantiles: dict[str, dict[float, float]] = {}
        qt = out[out["kind"] == "quant"]
        if len(qt) and quantile_fields:
            for col, g in qt.groupby("facet_field"):
                hist = g.groupby("score")["count"].sum().sort_index()
                cum = hist.cumsum().to_numpy()
                vals_ = hist.index.to_numpy()
                nq = int(cum[-1])
                quantiles[str(col)] = {
                    float(q): float(
                        vals_[
                            int(
                                np.searchsorted(
                                    cum, max(1, int(np.ceil(q * nq))), side="left"
                                )
                            )
                        ]
                    )
                    for q in quantile_fields.get(str(col), ())
                }
        if with_metadata and len(hits):
            hits = self._attach_metadata(hits)
        return SearchResult(
            total, hits, facets, total_exact=not prune, stats=stats, quantiles=quantiles
        )

    # ---- explain (Lucene Explanation analog) -------------------------
    def cardinality(
        self,
        q: Compound,
        cols: tuple[str, ...],
        filter_spec: FilterSpec | None = None,
    ) -> dict[str, int]:
        """ES `cardinality` aggregation: EXACT distinct count of each
        docmap column over the FULL matched set. Rides the existing
        facet channel (per-bucket unique+count partials merged on the
        gather), so it costs one scoring pass and the merge payload is
        one row per distinct value per bucket — exact, unlike ES's
        HyperLogLog++, which this index has no need to approximate
        until value cardinality rivals corpus size (then swap the
        facet partials for per-bucket KMV sketches, ops/sketch.py)."""
        res = self.search(
            q, k=1, filter_spec=filter_spec, facet_fields=tuple(cols),
            with_metadata=False,
        )
        return {c: len(res.facets.get(c, {})) for c in cols}

    def pinned_search(
        self,
        q: Compound,
        pinned: Sequence[int],
        k: int = 10,
        filter_spec: FilterSpec | None = None,
    ) -> pd.DataFrame:
        """ES `pinned` query: the given ids appear FIRST, in the given
        order — whether or not they match the organic query — provided
        they exist in the index and aren't tombstoned; organic hits
        (score-ranked, pinned ids excluded) fill the remaining slots.
        Returns (rank, doc_id, pinned 0/1). The existence probe is one
        partition-local filtered docmap read (no scan); the organic
        page ships k + len(pinned) candidates so exclusion can never
        underfill the page."""
        self._refresh_tombstones()
        pin = [int(p) for p in pinned]
        probe = self._attach_metadata(
            pd.DataFrame({"doc_id": pd.Series(pin, dtype="int64"),
                          "score": np.zeros(len(pin))})
        )
        meta_cols = [c for c in probe.columns if c not in ("doc_id", "score")]
        exists = (
            set(probe.dropna(subset=meta_cols[:1])["doc_id"].astype(int))
            if meta_cols
            else set()
        )
        if self.tombstones is not None and getattr(self.tombstones, "size", 0):
            exists -= set(int(t) for t in self.tombstones)
        live_pin = [p for p in pin if p in exists]
        r = self.search(
            q, k=k + len(pin), filter_spec=filter_spec, with_metadata=False
        )
        org = r.hits[~r.hits["doc_id"].isin(live_pin)].head(max(0, k - len(live_pin)))
        out_ids = live_pin + list(org["doc_id"].astype(int))
        flags = [1] * len(live_pin) + [0] * len(org)
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(out_ids) + 1, dtype=np.int64),
                "doc_id": pd.Series(out_ids, dtype="int64"),
                "pinned": pd.Series(flags, dtype="int64"),
            }
        )

    def msearch(
        self,
        queries: Sequence[Compound],
        k: int = 10,
        similarity: str = "bm25",
        mu: float = 2000.0,
        with_metadata: bool = False,
    ) -> list[SearchResult]:
        """ES `_msearch`: execute MANY queries in one scatter-gather
        round — each scorer actor receives the whole batch of specs in
        a single `score_many` RPC, so the per-query cost collapses to
        resolve + merge instead of an RPC per query (the measured QPS
        ceiling of the one-at-a-time path is RPC overhead, not
        scoring). Semantics per query are identical to
        ``search(q, k=k, similarity=...)`` for plain Compound queries;
        features that change the execution shape (facets, filters,
        sort_by, search_after, pruning, MatchAll) go through
        ``search()``. Returns one SearchResult per query, in order."""
        import ray

        if similarity not in scoring.SIMILARITIES:
            raise ValueError(f"unknown similarity {similarity!r}")
        self._refresh_tombstones()
        results: list[SearchResult | None] = [None] * len(queries)
        reqs: list[tuple[list[int], list[str], _QuerySpec]] = []
        req_qi: list[int] = []
        for qi, q in enumerate(queries):
            if isinstance(q, MatchAll):
                raise ValueError("msearch supports Compound queries; use search() for MatchAll")
            leaves = self._resolve(q, similarity, mu)
            if similarity != "bm25" and any(lf.blend or lf.dismax for lf in leaves):
                raise ValueError(
                    "Synonyms/CrossFields clauses blend BM25 statistics; "
                    "they require similarity='bm25'"
                )
            if any(lf.is_must and not lf.term_keys for lf in leaves) or not any(
                lf.term_keys for lf in leaves if lf.occur != "not"
            ):
                results[qi] = SearchResult(0, _empty_hits(), total_exact=True)
                continue
            term_keys = [k2 for lf in leaves for k2 in lf.term_keys]
            parts = sorted({term_part(tk, self.config.num_parts) for tk in term_keys})
            spec = self._make_spec(
                leaves, q, k, None, (), (), similarity=similarity, mu=mu
            )
            reqs.append((parts, term_keys, spec))
            req_qi.append(qi)
        if reqs:
            futs = [a.score_many.remote(reqs) for a in self._scorer_pool()]
            per_actor = ray.get(futs)  # [actor][query] -> table
            for ri, qi in enumerate(req_qi):
                out = pa.concat_tables([tables[ri] for tables in per_actor]).to_pandas()
                if out.empty:
                    results[qi] = SearchResult(0, _empty_hits(), total_exact=True)
                    continue
                total = int(out.loc[out["kind"] == "total", "count"].sum())
                hits = out[out["kind"] == "hit"][["doc_id", "score"]]
                hits = hits.sort_values(
                    ["score", "doc_id"], ascending=[False, True], kind="mergesort"
                )
                hits = hits.iloc[:k].reset_index(drop=True)
                if with_metadata and len(hits):
                    hits = self._attach_metadata(hits)
                results[qi] = SearchResult(total, hits, total_exact=True)
        return results  # type: ignore[return-value]

    def explain(self, q: Compound, doc_id: int, boosts: tuple = ()) -> dict:
        """Per-clause score breakdown for one document (Lucene
        ``IndexSearcher.explain``): each clause is re-scored through
        the SAME scoring core (`score_postings_table`) restricted to
        the doc's bucket, so clause contributions sum EXACTLY (same
        float64 op order) to ``search()``'s score for a matching doc.
        A debug/audit surface — one synchronous bucket read per call,
        never part of the hot path."""
        self._refresh_tombstones()
        from dataclasses import replace as _dc_replace

        doc_id = int(doc_id)
        bucket = doc_id % self.config.num_buckets
        q, range_conds = _lower_ranges(q)
        leaves = self._resolve(q)
        impl = _BucketScorerImpl(self.dirs, [bucket])
        n_must = sum(1 for lf in leaves if lf.is_must)
        clauses, total, must_cnt, should_cnt = [], 0.0, 0, 0
        excluded = False
        for lf in leaves:
            contrib, matched = 0.0, False
            if lf.term_keys:
                # role neutralized: the solo pass only asks "does this
                # clause match the doc, and with what contribution" —
                # a not/filter role would self-exclude or change the
                # should bookkeeping
                solo = _dc_replace(lf, clause_id=0, is_must=False, role="should")
                spec = self._make_spec(
                    (solo,),
                    Compound(),
                    1 << 30,  # keep every candidate: the doc must surface
                    None,
                    (),
                    (),
                )
                parts = sorted(
                    {term_part(tk, self.config.num_parts) for tk in lf.term_keys}
                )
                t = impl.score(parts, list(lf.term_keys), spec)
                kinds = t["kind"].to_numpy(zero_copy_only=False)
                ids = t["doc_id"].to_numpy()
                hit = (kinds == "hit") & (ids == doc_id)
                if hit.any():
                    matched = True
                    contrib = float(t["score"].to_numpy()[hit][0])
            total += contrib
            if lf.occur == "not":
                excluded = excluded or matched
            elif lf.is_must:
                must_cnt += matched
            else:
                should_cnt += matched
            kind = (
                "non_scoring" if lf.occur in ("filter", "not")
                else "const" if lf.const_score is not None
                else "synonym_blend" if lf.blend
                else "cross_fields_dismax" if lf.dismax
                else "bm25"
            )
            clauses.append(
                {
                    "clause_id": lf.clause_id,
                    "is_must": lf.is_must,
                    "occur": lf.occur,
                    "kind": kind,
                    "term_keys": list(lf.term_keys),
                    "idfs": list(lf.idfs),
                    "avgdl": lf.avgdl,
                    "matched": matched,
                    "score": contrib,
                }
            )
        matched = must_cnt == n_must
        if getattr(q, "msm_field", None) is not None:
            try:
                raw = impl.dmc.attrs(bucket, np.array([doc_id], np.int64), (q.msm_field,))[
                    q.msm_field
                ]
                req = np.asarray(raw, dtype=np.int64)
                if q.msm_map is not None:
                    req = np.asarray(q.msm_map(req), dtype=np.int64)
                matched &= should_cnt >= int(req[0])
            except RuntimeError:  # unknown doc_id
                matched = False
        elif q.min_should_match > 0:
            matched &= should_cnt >= q.min_should_match
        elif n_must == 0 and any(lf.occur == "should" for lf in leaves):
            matched &= should_cnt > 0
        matched = matched and not excluded
        # lowered NumericRange clauses: evaluated on the doc's docmap
        # attrs (keep-mask semantics, so not_between reads uniformly)
        range_rows = []
        for col, op, val in range_conds:
            try:
                v = impl.dmc.attrs(bucket, np.array([doc_id], np.int64), (col,))[col]
                hit = bool(FilterSpec(((col, op, val),)).eval({col: v}, 1)[0])
            except RuntimeError:  # unknown doc_id
                hit = False
            range_rows.append({"clause": f"{op}:{col}", "bounds": list(val), "matched": hit})
            matched = matched and hit
        if self.tombstones is not None and np.isin(doc_id, self.tombstones):
            matched = False
        boost_rows = []
        _rb = _resolve_boosts(tuple(boosts))
        for kind_, payload, add in [b for b in _rb if b[0] not in ("fv", "neg")] + [
            b for b in _rb if b[0] in ("fv", "neg")
        ]:
            if kind_ == "fv":
                try:
                    val = impl.dmc.attrs(
                        bucket, np.array([doc_id], np.int64), (payload.col,)
                    )[payload.col]
                    new_total = float(payload.apply(np.array([total], np.float64), val)[0])
                    boost_rows.append(
                        {
                            "kind": f"fv:{payload.col}",
                            "add": (new_total - total) if matched else 0.0,
                            "applied": bool(matched),
                        }
                    )
                    if matched:
                        total = new_total
                except RuntimeError:  # unknown doc_id
                    boost_rows.append({"kind": f"fv:{payload.col}", "add": 0.0, "applied": False})
                continue
            if kind_ == "ids":
                hit = bool(payload.size) and bool(
                    payload[np.clip(np.searchsorted(payload, doc_id), 0, payload.size - 1)]
                    == doc_id
                )
                boost_rows.append({"kind": "id_set", "add": add, "applied": matched and hit})
                if matched and hit:
                    total += add
            elif kind_ == "neg":
                hit = bool(payload.size) and bool(
                    payload[np.clip(np.searchsorted(payload, doc_id), 0, payload.size - 1)]
                    == doc_id
                )
                boost_rows.append(
                    {"kind": "negative", "add": (total * (add - 1.0)) if (matched and hit) else 0.0,
                     "applied": bool(matched and hit)}
                )
                if matched and hit:
                    total *= add
            else:
                bst: DocAttrBoost = payload
                try:
                    val = impl.dmc.attrs(
                        bucket, np.array([doc_id], np.int64), (bst.col,)
                    )[bst.col][0]
                    hit = val == bst.value
                except RuntimeError:  # unknown doc_id
                    hit = False
                boost_rows.append(
                    {"kind": f"attr:{bst.col}", "add": bst.add, "applied": bool(matched and hit)}
                )
                if matched and hit:
                    total += bst.add
        return {
            "doc_id": doc_id,
            "matched": bool(matched),
            "score": float(total) if matched else 0.0,
            "clauses": clauses,
            "boosts": boost_rows,
            "ranges": range_rows,
        }

    # ---- search_all (streaming Dataset path) ------------------------
    def search_all(
        self,
        q: Compound,
        filter_spec: FilterSpec | None = None,
        boosts: tuple = (),
        attach_cols: tuple[str, ...] = (),
    ):
        """Score EVERY matching doc and return a lazy Dataset of
        (doc_id, score, *attach_cols) — the input to grouped/dedup
        pipelines (reference v2 grouped search scores the full match
        set before `$group`, pipelines.py:484-563). attach_cols are
        docmap columns looked up partition-locally inside the scorer
        (no shuffle join)."""
        import ray.data as rd

        self._refresh_tombstones()
        if isinstance(q, MatchAll):
            raise ValueError("match_all is a search() surface; scan the source table instead")
        q, range_conds = _lower_ranges(q)
        if range_conds:
            if not (q.must or q.should or q.filter):
                raise ValueError(
                    "standalone-range search_all is unsupported; filter the source table"
                )
            base = filter_spec.conditions if filter_spec is not None else ()
            filter_spec = FilterSpec(tuple(base) + tuple(range_conds))
        leaves = self._resolve(q)
        if any(lf.is_must and not lf.term_keys for lf in leaves):
            return rd.from_arrow(_empty_all_table(attach_cols))
        term_keys = [k2 for lf in leaves for k2 in lf.term_keys]
        if not any(lf.term_keys for lf in leaves if lf.occur != "not"):
            return rd.from_arrow(_empty_all_table(attach_cols))
        parts = sorted({term_part(tk, self.config.num_parts) for tk in term_keys})
        # partition pruning by PATH selection (only the <= Q part dirs
        # that can hold the query terms); `bucket` stays a hive field
        # of the selected roots, `term` prunes row-groups in-file.
        flt = pc.field("term").isin(term_keys)
        roots = [
            (di, p)
            for di, d in enumerate(self.dirs)
            for k in parts
            if os.path.isdir(p := os.path.join(d, "postings", f"part={k}"))
        ]
        if not roots:
            return rd.from_arrow(_empty_all_table(attach_cols))
        # one lazy read per part dir (read_parquet hive-discovers the
        # bucket= subdirs of a single root), unioned into one stream;
        # multi-shard reads are tagged with their shard index so the
        # scorer decodes each row's rank stream with the right universe
        multi = len(self.dirs) > 1
        reads = []
        for di, r in roots:
            dsr = rd.read_parquet(r, columns=POSTING_COLS + ["bucket"], filter=flt)
            if multi:
                dsr = dsr.map_batches(
                    lambda t, _di=di: t.append_column(
                        "shard", pa.array(np.full(t.num_rows, _di, np.int32))
                    ),
                    batch_format="pyarrow",
                )
            reads.append(dsr)
        ds = reads[0] if len(reads) == 1 else reads[0].union(*reads[1:])
        spec = self._make_spec(
            leaves, q, 0, filter_spec, boosts, (), emit_all=tuple(attach_cols)
        )
        return ds.groupby("bucket").map_groups(
            ScoreBuckets,
            fn_constructor_args=(spec, [os.path.join(d, "docmap") for d in self.dirs]),
            concurrency=(1, min(8, self.config.num_buckets)),
            batch_format="pyarrow",
        )

    def composite_agg(
        self,
        q: Compound,
        field: str,
        size: int = 10,
        after=None,
        filter_spec: FilterSpec | None = None,
    ) -> pd.DataFrame:
        """ES composite aggregation: page the DISTINCT values of a
        docmap attribute over the matched set in ascending key order
        with an exclusive ``after``-key cursor. Unlike the facet
        channel (whose driver merge is field-cardinality-bounded),
        this path is fully distributed: per-key counts come from a
        hash groupby whose shuffle moves one row per distinct key per
        block, the cursor filter runs in-stream, and only ``size``
        buckets ever reach the driver — so it pages an
        arbitrarily-high-cardinality field, which is exactly what the
        ES API exists for. Returns (field, doc_count) ascending."""
        from search_engine_ray.ops import relational as rel

        ds = self.search_all(q, filter_spec=filter_spec, attach_cols=(field,))
        counts = rel.value_counts(ds.select_columns([field]), field, alias="doc_count")
        if after is not None:
            counts = counts.map_batches(
                lambda t, _a=after: t.filter(pc.greater(t[field], _a)),
                batch_format="pyarrow",
            )
        page = rel.topk(counts, [field], size, descending=False).to_pandas()
        if field not in page.columns:  # empty match set: schema-less blocks
            return pd.DataFrame(
                {field: pd.Series(dtype=object), "doc_count": pd.Series(dtype="int64")}
            )
        return page.reset_index(drop=True)

    def top_hits(
        self,
        q: Compound,
        field: str,
        n: int = 3,
        filter_spec: FilterSpec | None = None,
        boosts: tuple = (),
    ) -> pd.DataFrame:
        """ES top_hits aggregation: the best ``n`` docs per bucket of
        ``field`` over the FULL matched set, ranked (score desc,
        doc_id asc) at full precision — the grouped-search shape with
        N>1. Fully distributed via group_topn (map-side <=n per key
        per block, so the shuffle moves O(n x distinct keys x blocks),
        never the match set); the result is O(n x distinct keys).
        Returns (field, doc_id, score) with raw float64 scores —
        callers round for display like the search page."""
        from search_engine_ray.ops import relational as rel

        ds = self.search_all(q, filter_spec=filter_spec, boosts=boosts, attach_cols=(field,))
        top = rel.group_topn(ds, field, ["score", "doc_id"], n, descending=[True, False])
        df = top.to_pandas()
        if field not in df.columns:  # empty match set: schema-less blocks
            return pd.DataFrame(
                {
                    field: pd.Series(dtype=object),
                    "doc_id": pd.Series(dtype="int64"),
                    "score": pd.Series(dtype="float64"),
                }
            )
        return df[[field, "doc_id", "score"]].reset_index(drop=True)

    def delete_by_query(
        self, q: Compound, filter_spec: FilterSpec | None = None
    ) -> int:
        """ES delete_by_query: tombstone every doc matching ``q``
        (+ optional metadata filter). Deletions are visible to the
        NEXT search on any engine over this index (tombstones are
        re-read per search); physical removal happens at the next
        compaction (`compact_tombstones` / tiered merge). The match
        set STREAMS off the search_all Dataset in batches — the driver
        never holds more than one batch of ids. Returns the number of
        newly tombstoned docs."""
        from search_engine_ray.index.build import add_tombstones, load_tombstones

        before = int(load_tombstones(self.index_dir).size)
        total = before
        for batch in self.search_all(q, filter_spec=filter_spec).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            if ids.size:
                total = add_tombstones(self.index_dir, ids)
        return int(total - before)

    def _attach_metadata(self, hits: pd.DataFrame) -> pd.DataFrame:
        ids = hits["doc_id"].to_numpy()
        buckets = sorted({int(i) % self.config.num_buckets for i in ids})
        flt = pc.field("doc_id").isin([int(i) for i in ids])
        tables = []
        for d in self.dirs:
            for b in buckets:
                bdir = os.path.join(d, "docmap", f"bucket={b}")
                if os.path.isdir(bdir):
                    tables.append(pads.dataset(bdir).to_table(filter=flt))
        if not tables:
            return hits
        meta = pa.concat_tables(tables).to_pandas()
        drop = [c for c in ("bucket",) if c in meta.columns]
        meta = meta.drop(columns=drop)
        return hits.merge(meta, on="doc_id", how="left")


def _empty_hits() -> pd.DataFrame:
    return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})


def _empty_all_table(attach_cols: tuple[str, ...]) -> pa.Table:
    cols = {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
    for c in attach_cols:
        cols[c] = pa.array([], pa.string())
    return pa.table(cols)
