"""Phrase queries over the positional sidecar index.

Execution (Ray-Data-native, per bucket)::

    read_parquet(positions/part=K/..., filter=term in phrase_terms)
      -> groupby("bucket").map_groups(_chain)   # <= m rows per group
      -> (doc_id, ptf, dl) postings of the PHRASE
    df = count()  ->  BM25(idf(df), tf=ptf, dl) map  ->  top-k

The chain step is one vectorized sorted-set intersection per adjacent
token pair: every (doc, position) occurrence is packed into one int64
``rank << 32 | pos`` key, so "token j+1 follows token j" is
``intersect1d(keys_j + 1, keys_{j+1})`` across ALL candidate docs at
once — no per-doc Python. A phrase of m terms reads at most m part
directories (the same hash-part pruning as term queries) and each
bucket's group holds at most m rows, so the shuffle payload is tiny
and scales with vocabulary, never the corpus.

Scoring semantics (pinned by the s11_phrase SQL oracle): the phrase is
ONE BM25 clause — tf = number of phrase occurrences in the doc,
df = number of docs containing the phrase, dl = the field's analyzed
token count. Same formula, same op order as scoring.py everywhere.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from search_engine_ray.config import term_part
from search_engine_ray.index.positions import decode_positions_term
from search_engine_ray.query import scoring


def _analyzed(engine, phrase) -> list[str]:
    if isinstance(phrase, str):
        from search_engine_ray.analysis import get_analyzer

        return get_analyzer(engine.config.analyzer).analyze(phrase)
    return list(phrase)


def _occurrence_keys(stream) -> np.ndarray:
    ranks, tfs, _dls, pos = stream
    return (np.repeat(ranks.astype(np.int64), tfs) << np.int64(32)) | pos.astype(np.int64)


def _chain_keys(
    streams: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
    extra_last_keys: np.ndarray | None = None,
):
    """Adjacency chain over per-term (ranks, tfs, dls, positions).
    Returns (doc_ranks, ptf) of the phrase occurrences.
    ``extra_last_keys`` appends ONE more multi-term slot (the
    match_phrase_prefix expansion set, merged occurrence keys of all
    expanded terms — disjoint by construction since one token occupies
    one position)."""
    keys = [_occurrence_keys(s) for s in streams]
    cur = keys[0]
    for j in range(1, len(keys)):
        cur = np.intersect1d(cur + 1, keys[j], assume_unique=True)
        if cur.size == 0:
            break
    if cur.size and extra_last_keys is not None:
        cur = np.intersect1d(cur + 1, extra_last_keys, assume_unique=True)
    if cur.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doc_ranks, ptf = np.unique(cur >> np.int64(32), return_counts=True)
    return doc_ranks, ptf


def _pair_window_keys(streams, window: int, ordered: bool = True):
    """Proximity for a PAIR: count (i, j) occurrence pairs with
    ``1 <= pos_j - pos_i <= window`` — one intersect1d per gap value
    (w tiny), all docs at once. A position-pair is unique per (j, gap),
    so summing per-gap intersections counts pairs exactly (the same
    count a SQL positions self-join produces).

    ``ordered=False`` (ES span_near in_order=false) also counts pairs
    where the SECOND token precedes the first (``1 <= pos_i - pos_j <=
    window``) — i.e. |gap| in [1, window]. The two directions' hit
    keys are positions of DIFFERENT tokens, so they never collide for
    distinct tokens; for an identical token pair each unordered pair
    is counted from both sides, matching the SQL abs-gap self-join."""
    k1, k2 = _occurrence_keys(streams[0]), _occurrence_keys(streams[1])
    return _pair_window_raw(k1, k2, window, ordered)


def _pair_window_raw(k1: np.ndarray, k2: np.ndarray, window: int, ordered: bool):
    """The pair-window kernel on raw occurrence-key arrays (lets the
    first slot be a UNION of alternatives — ES span_or inside
    span_near — whose merged keys stay unique because one position
    holds one token)."""
    hits = []
    for delta in range(1, window + 1):
        m = np.intersect1d(k1 + delta, k2, assume_unique=True)
        if m.size:
            hits.append(m >> np.int64(32))
        if not ordered:
            m2 = np.intersect1d(k2 + delta, k1, assume_unique=True)
            if m2.size:
                hits.append(m2 >> np.int64(32))
    if not hits:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doc_ranks, ptf = np.unique(np.concatenate(hits), return_counts=True)
    return doc_ranks, ptf


def chain_core(
    by_term: dict,
    term_keys: list[str],
    window: int,
    ordered: bool,
    first_end: int | None,
    exp_keys: list[str],
    or_keys: list[str] | None = None,
    exclude_keys: list[str] | None = None,
    exclude_dist: int = 0,
    little_key: str | tuple | None = None,
    span_mode: str = "containing",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The pure per-(shard, bucket) phrase kernel shared by the Dataset
    path (phrase_postings) and the scatter-gather actor path
    (phrase_topk): decoded (ranks, tfs, dls, positions) streams per
    term -> (doc_ranks, ptf, dl) of the phrase match set. Returns
    empty arrays when any required term is absent.

    ``or_keys`` (ES span_or inside span_near): the FIRST slot matches
    ANY of these term keys (term_keys holds only the second token);
    merged occurrence keys stay unique because one position holds one
    token, so pair counting is exact.
    ``exclude_keys``/``exclude_dist`` (ES span_not): term_keys holds
    ONE include token; its occurrences survive only when no exclude
    occurrence lies within ±exclude_dist positions in the same doc.
    ptf counts surviving occurrences, df = docs with any.
    ``little_key`` (ES span_containing / span_within): the big span is
    the ordered pair term_keys=[t1, t2] with gap in [1, window];
    span_mode="containing" counts big spans holding a little
    occurrence t1.pos <= p <= t2.pos (ptf per qualifying span);
    span_mode="within" counts little occurrences inside any big span
    (ptf per qualifying occurrence, dl from the little term)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    if any(tk not in by_term for tk in term_keys):
        return empty
    streams = [by_term[tk] for tk in term_keys]
    if little_key is not None:
        # little may be ONE term or a set of alternatives (ES
        # intervals any_of as the middle slot): occurrence keys of the
        # alternatives merge — still unique, one position one token
        lks = [little_key] if isinstance(little_key, str) else list(little_key)
        lks = [k for k in lks if k in by_term]
        if not lks:
            return empty
        k1, k2 = _occurrence_keys(streams[0]), _occurrence_keys(streams[1])
        k3 = np.sort(np.concatenate([_occurrence_keys(by_term[k]) for k in lks]))
        hits: list[np.ndarray] = []
        # "interval" (ES intervals all_of ordered): the middle term
        # must sit STRICTLY between the endpoints, so spans start at
        # delta=2 and the interior offsets are 1..delta-1; ptf counts
        # qualifying (start, end) pairs — total gaps = delta - 2
        strict = span_mode == "interval"
        for delta in range(2 if strict else 1, max(window, 1) + 1):
            ends = np.intersect1d(k1 + np.int64(delta), k2, assume_unique=True)
            if ends.size == 0:
                continue
            starts = ends - np.int64(delta)
            if span_mode in ("containing", "interval"):
                qual = np.zeros(starts.size, bool)
                offsets = range(1, delta) if strict else range(delta + 1)
                for o in offsets:
                    qual |= np.isin(starts + np.int64(o), k3, assume_unique=False)
                if qual.any():
                    hits.append(starts[qual] >> np.int64(32))
            else:  # within: collect the qualifying little OCCURRENCE keys
                for o in range(delta + 1):
                    m = np.intersect1d(starts + np.int64(o), k3, assume_unique=True)
                    if m.size:
                        hits.append(m)
        if not hits:
            return empty
        if span_mode in ("containing", "interval"):
            doc_ranks, ptf = np.unique(np.concatenate(hits), return_counts=True)
            dl_stream = streams[0]
        else:
            if len(lks) != 1:
                raise ValueError("span_within takes exactly one little term")
            u = np.unique(np.concatenate(hits))  # a little occ may sit in many spans
            doc_ranks, ptf = np.unique(u >> np.int64(32), return_counts=True)
            dl_stream = by_term[lks[0]]
        ranks_s, _, dls_s, _ = dl_stream
        dl = dls_s[np.searchsorted(ranks_s, doc_ranks)]
        return doc_ranks.astype(np.int64), ptf.astype(np.int64), dl.astype(np.int64)
    if exclude_keys is not None:
        keys = _occurrence_keys(streams[0])
        bad = [_occurrence_keys(by_term[k]) for k in exclude_keys if k in by_term]
        if bad:
            badk = np.concatenate(bad)
            ban = np.unique(
                np.concatenate(
                    [badk + np.int64(d) for d in range(-exclude_dist, exclude_dist + 1)]
                )
            )
            keys = keys[~np.isin(keys, ban, assume_unique=False)]
        if keys.size == 0:
            return empty
        doc_ranks, ptf = np.unique(keys >> np.int64(32), return_counts=True)
    elif or_keys is not None:
        alt = [_occurrence_keys(by_term[k]) for k in or_keys if k in by_term]
        if not alt:
            return empty
        k_or = np.sort(np.concatenate(alt))
        doc_ranks, ptf = _pair_window_raw(
            k_or, _occurrence_keys(streams[0]), max(window, 1), ordered
        )
        if doc_ranks.size == 0:
            return empty
    elif first_end is not None:
        keys = _occurrence_keys(streams[0])
        keep_k = (keys & np.int64(0xFFFFFFFF)) < np.int64(first_end)
        if not keep_k.any():
            return empty
        doc_ranks, ptf = np.unique(keys[keep_k] >> np.int64(32), return_counts=True)
    elif window > 1:
        doc_ranks, ptf = _pair_window_keys(streams, window, ordered=ordered)
    elif exp_keys:
        exp_streams = [by_term[k] for k in exp_keys if k in by_term]
        if not exp_streams:
            return empty
        merged = np.sort(np.concatenate([_occurrence_keys(s) for s in exp_streams]))
        doc_ranks, ptf = _chain_keys(streams, extra_last_keys=merged)
    else:
        doc_ranks, ptf = _chain_keys(streams)
    if doc_ranks.size == 0:
        return empty
    ranks_last, _, dls_last, _ = streams[-1]
    dl = dls_last[np.searchsorted(ranks_last, doc_ranks)]
    return doc_ranks.astype(np.int64), ptf.astype(np.int64), dl.astype(np.int64)


def phrase_postings(
    engine, field: str, phrase, window: int = 1,
    last_prefix: str | None = None, max_expansions: int = 50,
    ordered: bool = True, first_end: int | None = None,
    or_first: list[str] | None = None,
    exclude: list[str] | None = None, exclude_dist: int = 0,
    little: str | None = None, span_mode: str = "containing",
):
    """Lazy Dataset of (doc_id, ptf, dl) — one row per doc containing
    the phrase. Raises if the positional sidecar is missing.

    ``first_end`` (Lucene/ES span_first, single token only): keep only
    occurrences within the first ``first_end`` analyzed tokens of the
    doc (0-based position < first_end); ptf counts qualifying
    occurrences, df = docs with any.

    window=1 is the exact phrase (each next token immediately follows).
    window>1 is ordered proximity, PAIRS only: ptf counts (i, j)
    position pairs with ``1 <= pos_j - pos_i <= window``.
    ``last_prefix`` appends one final PREFIX slot (ES
    match_phrase_prefix / Lucene MultiPhraseQuery): the prefix expands
    against the term dictionary (lexicographically first
    ``max_expansions``) and any expansion completes the phrase; ptf
    counts completed occurrences."""
    import ray.data as rd

    tokens = _analyzed(engine, phrase)
    cfg = engine.config
    or_keys = [cfg.term_key(field, t) for t in or_first] if or_first else None
    exclude_keys = [cfg.term_key(field, t) for t in exclude] if exclude else None
    little_key = cfg.term_key(field, little) if little is not None else None
    if little_key is not None:
        if len(tokens) != 2 or or_keys or exclude_keys or last_prefix or first_end:
            raise ValueError(
                "little (span_containing/span_within) takes a two-token big span, "
                "no other span mode"
            )
        if span_mode not in ("containing", "within", "interval"):
            raise ValueError(
                f"span_mode must be containing|within|interval, got {span_mode!r}"
            )
    elif or_keys is not None or exclude_keys is not None:
        if len(tokens) != 1 or last_prefix is not None or first_end is not None:
            raise ValueError(
                "or_first (span_or-in-span_near) / exclude (span_not) take exactly "
                "one phrase token, no prefix, no first_end"
            )
    elif window > 1 and len(tokens) != 2:
        raise ValueError("window > 1 supports exactly two tokens (ordered proximity pair)")
    if first_end is not None and (len(tokens) != 1 or window > 1 or last_prefix is not None):
        raise ValueError("first_end (span_first) takes exactly one token, window=1, no prefix")
    exp_keys: list[str] = []
    if last_prefix is not None:
        if window > 1:
            raise ValueError("last_prefix and window > 1 are mutually exclusive")
        if not tokens:
            raise ValueError("match_phrase_prefix needs >= 1 exact leading token "
                             "(a lone prefix is the plain Prefix query)")
        from search_engine_ray.query.qast import Prefix as _Prefix

        exp = sorted(engine._expand_prefix(_Prefix(field, last_prefix)))
        # Assert, don't silently truncate (ADVICE r03 / the s80
        # expansion-cap lesson): the s53 value oracle replays the FULL
        # dictionary expansion in SQL, so a dictionary that outgrows
        # the cap would make this path quietly diverge from it. ES's
        # own max_expansions truncation is reproducible only if both
        # sides apply it — fail loud until the oracle encodes the cap.
        assert len(exp) <= max_expansions, (
            f"prefix {last_prefix!r} expands to {len(exp)} > cap {max_expansions}; "
            "the value oracle replays the UNCAPPED expansion — raise the cap "
            "or encode it in the oracle before relying on this result"
        )
        exp_keys = exp
        if not exp_keys:
            return rd.from_arrow(_EMPTY_POSTINGS)
    if not tokens:
        return rd.from_arrow(_EMPTY_POSTINGS)
    term_keys = [cfg.term_key(field, t) for t in tokens]
    aux_keys = (or_keys or []) + (exclude_keys or [])
    if little_key is not None:
        aux_keys = aux_keys + [little_key]
    parts = sorted({term_part(tk, cfg.num_parts) for tk in term_keys + exp_keys + aux_keys})
    keyset = sorted(set(term_keys + exp_keys + aux_keys))
    tomb = engine.tombstones
    pieces = []
    for d in engine.dirs:
        pos_root = os.path.join(d, "positions")
        if not os.path.isdir(pos_root):
            raise RuntimeError(
                f"positions sidecar missing under {d!r}; run index.build_positions first"
            )
        roots = [
            r for k in parts if os.path.isdir(r := os.path.join(pos_root, f"part={k}"))
        ]
        if not roots:
            continue
        # one lazy read per part dir (read_parquet hive-discovers the
        # bucket= subdirs of a single root only), unioned
        reads = [
            rd.read_parquet(
                r,
                columns=[
                    "term", "bucket", "df_local",
                    "doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes",
                ],
                filter=pc.field("term").isin(keyset),
            )
            for r in roots
        ]
        ds = reads[0] if len(reads) == 1 else reads[0].union(*reads[1:])
        docmap_dir = os.path.join(d, "docmap")

        def _chain(df: pd.DataFrame, _dm=docmap_dir) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "ptf": pd.Series([], dtype="int64"),
                    "dl": pd.Series([], dtype="int64"),
                }
            )
            by_term: dict[str, tuple] = {}
            for row in df.itertuples(index=False):
                by_term[row.term] = decode_positions_term(
                    row.doc_bytes, row.tf_bytes, row.dl_bytes, row.pos_bytes, int(row.df_local)
                )
            doc_ranks, ptf, dl = chain_core(
                by_term, term_keys, window, ordered, first_end, exp_keys,
                or_keys=or_keys, exclude_keys=exclude_keys, exclude_dist=exclude_dist,
                little_key=little_key, span_mode=span_mode,
            )
            if doc_ranks.size == 0:
                return empty
            b = int(df["bucket"].iloc[0])
            universe = np.sort(
                pads.dataset(os.path.join(_dm, f"bucket={b}"))
                .to_table(columns=["doc_id"])["doc_id"]
                .to_numpy()
            )
            ids = universe[doc_ranks]
            if tomb is not None and tomb.size:
                keep = ~np.isin(ids, tomb, assume_unique=False)
                ids, ptf, dl = ids[keep], ptf[keep], dl[keep]
            return pd.DataFrame(
                {
                    "doc_id": ids.astype(np.int64),
                    "ptf": ptf.astype(np.int64),
                    "dl": dl.astype(np.int64),
                }
            )

        pieces.append(ds.groupby("bucket").map_groups(_chain, batch_format="pandas"))
    if not pieces:
        return rd.from_arrow(_EMPTY_POSTINGS)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out


_EMPTY_POSTINGS = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "ptf": pa.array([], pa.int64()),
        "dl": pa.array([], pa.int64()),
    }
)


def phrase_search_all(
    engine, field: str, phrase, window: int = 1,
    last_prefix: str | None = None, max_expansions: int = 50,
    ordered: bool = True, first_end: int | None = None,
    or_first: list[str] | None = None,
    exclude: list[str] | None = None, exclude_dist: int = 0,
    little: str | None = None, span_mode: str = "containing",
):
    """Score EVERY doc containing the phrase; returns a Dataset of
    (doc_id, score) — the phrase analog of SearchEngine.search_all.
    One materialize of the (small) phrase match set feeds both the
    global-df count and the scoring pass."""
    import ray.data as rd

    mat = phrase_postings(
        engine, field, phrase, window=window,
        last_prefix=last_prefix, max_expansions=max_expansions,
        ordered=ordered, first_end=first_end,
        or_first=or_first, exclude=exclude, exclude_dist=exclude_dist,
        little=little, span_mode=span_mode,
    ).materialize()
    df = mat.count()
    if df == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
        )
    stats = engine.stats
    tidf = float(scoring.idf(stats["n_docs"], df))
    k1, b = stats["k1"], stats["b"]
    avgdl = stats["fields"][field]["avgdl"]

    def _score(t: pa.Table) -> pa.Table:
        sc = scoring.bm25_score(t["ptf"].to_numpy(), t["dl"].to_numpy(), tidf, k1, b, avgdl)
        return pa.table({"doc_id": t["doc_id"], "score": pa.array(sc, pa.float64())})

    return mat.map_batches(_score, batch_format="pyarrow")


def phrase_topk(
    engine, field: str, phrase, k: int = 10, window: int = 1,
    last_prefix: str | None = None, max_expansions: int = 50,
    ordered: bool = True, first_end: int | None = None,
    or_first: list[str] | None = None, first_prefix: str | None = None,
    exclude: list[str] | None = None, exclude_dist: int = 0,
    little: str | tuple | None = None, span_mode: str = "containing",
) -> pd.DataFrame:
    """Warm-path phrase top-k: the chain runs INSIDE the persistent
    scorer pool (ONE RPC fan-out; decoded position streams cached per
    actor like ordinary postings) instead of a Ray Dataset job per
    query — milliseconds warm where phrase_search pays seconds of job
    overhead. The pool gathers the phrase's full (doc_id, ptf, dl)
    match set — phrases are selective by construction; route a
    stop-phrase-scale query through phrase_search (the streaming
    Dataset path) instead.

    Output contract: (doc_id, score) with score ROUNDED to 4, page
    ordered by (rounded score desc, doc_id asc) — exactly the driver
    entries' (and their SQL oracles') ranking rule."""
    import ray

    from search_engine_ray.ops.rounding import round_half_up

    for d in engine.dirs:
        if not os.path.isdir(os.path.join(d, "positions")):
            raise RuntimeError(
                f"positions sidecar missing under {d!r}; run index.build_positions first"
            )
    engine._refresh_tombstones()
    tokens = _analyzed(engine, phrase)
    cfg = engine.config
    exp_keys: list[str] = []
    if last_prefix is not None:
        from search_engine_ray.query.qast import Prefix as _Prefix

        exp_keys = sorted(engine._expand_prefix(_Prefix(field, last_prefix)))[:max_expansions]
        if not tokens or not exp_keys:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
    if not tokens:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    term_keys = [cfg.term_key(field, t) for t in tokens]
    or_keys = tuple(cfg.term_key(field, t) for t in or_first) if or_first else ()
    if first_prefix is not None:
        # ES span_multi: the FIRST slot is a prefix multi-term, every
        # dictionary expansion can open the span. Lexicographic cap,
        # asserted un-hit so corpus growth fails loudly (the s53
        # expansion-cap lesson) instead of silently diverging from a
        # LIKE-based oracle
        from search_engine_ray.query.qast import Prefix as _Prefix

        if or_keys:
            raise ValueError("first_prefix and or_first are mutually exclusive")
        exp = sorted(engine._expand_prefix(_Prefix(field, first_prefix)))
        assert len(exp) <= max_expansions, (
            f"prefix {first_prefix!r} expands to {len(exp)} > cap {max_expansions}"
        )
        if not exp:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        or_keys = tuple(exp)
    exclude_keys = tuple(cfg.term_key(field, t) for t in exclude) if exclude else ()
    if little is None:
        little_key = None
    elif isinstance(little, str):
        little_key = cfg.term_key(field, little)
    else:
        little_key = tuple(cfg.term_key(field, t) for t in little)
    _lks = (
        [] if little_key is None
        else [little_key] if isinstance(little_key, str) else list(little_key)
    )
    parts = sorted({
        term_part(tk, cfg.num_parts)
        for tk in term_keys + exp_keys + list(or_keys) + list(exclude_keys) + _lks
    })
    futs = [
        a.phrase_rows.remote(
            parts, term_keys, window, ordered, first_end, tuple(exp_keys),
            or_keys, exclude_keys, exclude_dist, little_key, span_mode,
        )
        for a in engine._scorer_pool()
    ]
    rows = pa.concat_tables(ray.get(futs)).to_pandas()
    tomb = engine.tombstones
    if tomb is not None and getattr(tomb, "size", 0) and len(rows):
        rows = rows[~rows["doc_id"].isin(tomb)]
    df = len(rows)
    if df == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    stats = engine.stats
    tidf = float(scoring.idf(stats["n_docs"], df))
    sc = scoring.bm25_score(
        rows["ptf"].to_numpy(), rows["dl"].to_numpy(), tidf,
        stats["k1"], stats["b"], stats["fields"][field]["avgdl"],
    )
    out = pd.DataFrame(
        {"doc_id": rows["doc_id"].to_numpy(), "score": round_half_up(sc)}
    )
    out = out.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)


def phrase_search(
    engine, field: str, phrase, k: int = 10, window: int = 1,
    last_prefix: str | None = None, max_expansions: int = 50,
    ordered: bool = True,
) -> pd.DataFrame:
    """Top-k phrase search: (doc_id, score) page ordered by
    (score desc, doc_id asc), full precision."""
    from search_engine_ray.ops import relational as rel

    scored = phrase_search_all(
        engine, field, phrase, window=window,
        last_prefix=last_prefix, max_expansions=max_expansions,
        ordered=ordered,
    )
    page = rel.topk(scored, ["score", "doc_id"], k=k, descending=[True, False]).to_pandas()
    return page.reset_index(drop=True)
