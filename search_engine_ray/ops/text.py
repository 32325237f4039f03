"""Text-analysis operators for training-data pipelines (task brief:
language-ID, quality scoring, token counting, fingerprinting) over a
`documents(doc_id, text, ...)`-shaped table.

All are map_batches transforms vectorized with the same Arrow kernel
stack as the index build (index/build.py `_field_tokens`): C++
utf8_lower + split_pattern_regex + list_flatten, then numpy
bincount/factorize for the per-doc reductions — no Python loop over
rows in any hot path (the only per-row work left is hashlib md5 of
already-joined strings, which is C-speed). Where an op is
SQL-expressible its DuckDB oracle lives in __ray_entry__.oracle_sql()
and the formulas here are written to match the SQL exactly (same
tokenizer regex, same rounding).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# split-form complement of analysis.TOKEN_RE (`[a-z0-9_]+` findall ==
# split on `[^a-z0-9_]+` with empties dropped; pinned by the analyzer
# parity tests)
_SPLIT_PATTERN = "[^a-z0-9_]+"

# tiny per-language stopword profiles for the n-gram/stopword heuristic
# language identifier (public-knowledge approach: stopword hit-rates,
# cf. textcat/langid litterature). Deterministic, dependency-free.
_LANG_MARKERS: dict[str, frozenset] = {
    "en": frozenset("the of and to in is that it for on with as at by".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von auf".split()),
    "fr": frozenset("le la les et est pas une des du dans pour sur".split()),
    "es": frozenset("el la los las y es no una del en por para".split()),
    "zh": frozenset(),  # CJK detected by codepoint range, not stopwords
}


def _flat_tokens(col) -> tuple[pa.Array, np.ndarray, int]:
    """(flat tokens, parent doc index per token, n_docs) — vectorized
    equivalent of per-row TOKEN_RE.findall(lower(text))."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    parts = pc.split_pattern_regex(pc.utf8_lower(arr), pattern=_SPLIT_PATTERN)
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parents = parents.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, parents.to_numpy(zero_copy_only=False).astype(np.int64), len(arr)


def _per_doc_counts(flat: pa.Array, parents: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_tokens, n_uniq_tokens) per doc, vectorized via factorize +
    one np.unique over (doc, term-code) keys."""
    n_tok = np.bincount(parents, minlength=n).astype(np.int64)
    if parents.size == 0:
        return n_tok, np.zeros(n, dtype=np.int64)
    codes, uniq = pd.factorize(flat.to_numpy(zero_copy_only=False), sort=False)
    nv = max(len(uniq), 1)
    uk = np.unique(parents * nv + codes)
    n_uniq = np.bincount(uk // nv, minlength=n).astype(np.int64)
    return n_tok, n_uniq


def _joined_tokens(flat: pa.Array, parents: np.ndarray, n: int) -> pa.Array:
    """Per-doc space-joined token string (one binary_join kernel)."""
    counts = np.bincount(parents, minlength=n)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), flat)
    return pc.binary_join(lists, " ")


def add_token_stats(ds: Dataset, text_col: str = "text") -> Dataset:
    """Append n_tokens:int64, n_uniq_tokens:int64, fingerprint:string
    (md5 of the normalized token join — SQL-parity fingerprint;
    reference-analog of content_sha256 row identity)."""

    def _f(t: pa.Table) -> pa.Table:
        flat, parents, n = _flat_tokens(t[text_col])
        n_tok, n_uniq = _per_doc_counts(flat, parents, n)
        joined = _joined_tokens(flat, parents, n)
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in joined.to_pylist()]
        return (
            t.append_column("n_tokens", pa.array(n_tok, pa.int64()))
            .append_column("n_uniq_tokens", pa.array(n_uniq, pa.int64()))
            .append_column("fingerprint", pa.array(fps, pa.string()))
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def add_quality_score(ds: Dataset, text_col: str = "text") -> Dataset:
    """Heuristic quality score in [0,1] (C4/Gopher-style length +
    repetition + alpha-ratio rules, simplified and SQL-matchable):

        uniq_ratio  = n_uniq_tokens / n_tokens
        alpha_ratio = [A-Za-z] chars / chars
        len_score   = least(n_tokens, 200) / 200
        quality     = round(0.4*uniq_ratio + 0.3*alpha_ratio
                            + 0.3*len_score, 4)

    Empty text scores 0."""

    def _f(t: pa.Table) -> pa.Table:
        arr = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        arr = pc.fill_null(arr, "")
        flat, parents, n = _flat_tokens(arr)
        n_tok, n_uniq = _per_doc_counts(flat, parents, n)
        n_chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
        alpha = (
            pc.utf8_length(pc.replace_substring_regex(arr, pattern="[^A-Za-z]", replacement=""))
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            uniq_ratio = n_uniq / n_tok
            alpha_ratio = alpha / n_chars
        len_score = np.minimum(n_tok, 200) / 200.0
        q = np.round(0.4 * uniq_ratio + 0.3 * alpha_ratio + 0.3 * len_score, 4)
        q = np.where((n_tok > 0) & (n_chars > 0), q, 0.0)
        return t.append_column("quality", pa.array(q, pa.float64()))

    return ds.map_batches(_f, batch_format="pyarrow")


def add_lang_id(ds: Dataset, text_col: str = "text") -> Dataset:
    """Stopword-profile language ID (deterministic heuristic): CJK
    codepoints -> zh; otherwise the language whose marker-stopword
    hit-count is highest (ties broken by language code; 'und' when no
    marker hits). Marker hits counted with one is_in + bincount per
    profile. SQL value oracle: list_filter hit counts + a CASE-cascade
    argmax in profile order (``oracle_sql()['t_lang_id']``)."""
    profiles = sorted((k, v) for k, v in _LANG_MARKERS.items() if v)

    def _f(t: pa.Table) -> pa.Table:
        arr = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        arr = pc.fill_null(arr, "")
        flat, parents, n = _flat_tokens(arr)
        hits = np.zeros((n, len(profiles)), dtype=np.int64)
        for j, (_code, markers) in enumerate(profiles):
            m = pc.is_in(flat, value_set=pa.array(sorted(markers)))
            hit_parents = parents[m.to_numpy(zero_copy_only=False)]
            hits[:, j] = np.bincount(hit_parents, minlength=n)
        best_j = np.argmax(hits, axis=1)  # tie -> lowest index = code order
        best_hits = hits[np.arange(n), best_j]
        codes = np.array([c for c, _ in profiles], dtype=object)
        langs = np.where(best_hits > 0, codes[best_j], "und")
        # CJK scan capped at the first 2000 chars (same semantic/cost
        # bound as the original per-row implementation: a long document
        # quoting CJK in its tail is NOT reclassified)
        head = pc.utf8_slice_codeunits(arr, 0, 2000)
        cjk = pc.match_substring_regex(head, "[一-鿿]").to_numpy(zero_copy_only=False)
        langs = np.where(cjk, "zh", langs)
        return t.append_column("lang_id", pa.array(langs.tolist(), pa.string()))

    return ds.map_batches(_f, batch_format="pyarrow")


def add_rolling_fingerprint(ds: Dataset, text_col: str = "text", window: int = 5) -> Dataset:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hash
    over the token stream, keep the minimum hash per window -> a
    64-bit doc fingerprint (min of window minima). Token hashes are
    md5-derived but computed once per DISTINCT token (factorize), and
    the rolling pass runs over the whole batch's flat token stream
    with doc boundaries masked — no per-doc Python loop.

    The token hash is the first 8 md5 digest bytes LITTLE-endian —
    exactly DuckDB's ``md5_number_upper`` — so the whole op (Horner
    rolling hash mod 2^64 included) has an exact SQL value oracle
    (``__ray_entry__.oracle_sql()['t_rolling_fp']``)."""
    B = np.uint64(1_000_003)
    w = int(window)

    def _f(t: pa.Table) -> pa.Table:
        flat, parents, n = _flat_tokens(t[text_col])
        out = np.zeros(n, dtype=np.uint64)
        if parents.size:
            toks = flat.to_numpy(zero_copy_only=False)
            codes, uniq = pd.factorize(toks, sort=False)
            uh = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[:8], "little")
                    for u in uniq
                ),
                dtype=np.uint64,
                count=len(uniq),
            )
            th = uh[codes]
            sizes = np.bincount(parents, minlength=n)
            has = sizes > 0
            maxv = np.iinfo(np.uint64).max
            acc = np.full(n, maxv, dtype=np.uint64)
            if th.size >= w:
                # corpus-wide rolling hash; a window is valid only when
                # it lies entirely inside one doc (same parent at both
                # ends — parents are nondecreasing)
                m = th.size - w + 1
                h = np.zeros(m, dtype=np.uint64)
                for j in range(w):
                    h = h * B + th[j : j + m]
                valid = parents[:m] == parents[w - 1 : w - 1 + m]
                np.minimum.at(acc, parents[:m][valid], h[valid])
            # docs with fewer than `window` tokens: min raw token hash
            short = has & (sizes < w)
            if short.any():
                tok_min = np.full(n, maxv, dtype=np.uint64)
                np.minimum.at(tok_min, parents, th)
                acc = np.where(short, tok_min, acc)
            out = np.where(has, acc, np.uint64(0))
        return t.append_column(
            "rolling_fp", pa.array(out.astype(np.int64), pa.int64())
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def explode_tokens(ds: Dataset, text_col: str, keep: list[str]) -> Dataset:
    """doc -> one row per token (R10 flat-map analog; the build-side
    posting explosion re-used as a user-facing op). Pure Arrow:
    split + flatten + parent-index take."""

    def _f(t: pa.Table) -> pa.Table:
        flat, parents, _n = _flat_tokens(t[text_col])
        out = t.select(keep).take(pa.array(parents, pa.int64()))
        return out.append_column("token", flat)

    return ds.map_batches(_f, batch_format="pyarrow")
