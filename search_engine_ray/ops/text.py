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


# the published Gopher stop-word rule set (Rae et al. 2021 §A1.1)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def add_gopher_rules(
    ds: Dataset,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> Dataset:
    """The published Gopher document-quality rules (Rae et al. 2021
    §A1.1), each exposed as its own metric column plus the combined
    ``gopher_pass`` verdict:

        n_words            whitespace tokens (``\\S+``)
        mean_word_len      sum(len(word)) / n_words       in [3, 10]
        symbol_word_ratio  (#'#' + #'...') / n_words      <= 0.1
        bullet_line_frac   lines starting ``-``/``*``     <= 0.9
        ellipsis_line_frac lines ending ``...``           <= 0.3
        alpha_word_frac    words containing [A-Za-z]      >= 0.8
        n_stop_hits        distinct GOPHER_STOPS present  >= 2
        n_words            in [min_words, max_words]

    All fractions rounded half-away to 4dp (SQL round() parity); the
    pass verdict is evaluated on the UNROUNDED values. One vectorized
    Arrow pass per batch — no per-doc Python; streams at any corpus
    size (pure map, no shuffle)."""

    def _f(t: pa.Table) -> pa.Table:
        from .rounding import round_half_up

        arr = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        arr = pc.fill_null(arr, "")
        n = len(arr)
        # words = regexp_extract_all('\S+'): split on \s+ then drop ""
        wparts = pc.split_pattern_regex(arr, pattern=r"\s+")
        wflat = pc.list_flatten(wparts)
        wpar = pc.list_parent_indices(wparts)
        keep = pc.not_equal(wflat, "")
        wflat, wpar = wflat.filter(keep), wpar.filter(keep)
        wpar = wpar.to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = np.bincount(wpar, minlength=n).astype(np.float64)
        wlen = pc.utf8_length(wflat).to_numpy(zero_copy_only=False).astype(np.float64)
        len_sum = np.bincount(wpar, weights=wlen, minlength=n)
        alpha = pc.match_substring_regex(wflat, "[A-Za-z]").to_numpy(zero_copy_only=False)
        n_alpha = np.bincount(wpar, weights=alpha.astype(np.float64), minlength=n)
        lower = pc.utf8_lower(wflat)
        stop_hits = np.zeros(n, dtype=np.int64)
        for s in GOPHER_STOPS:
            hit = pc.equal(lower, s).to_numpy(zero_copy_only=False)
            if hit.any():
                present = np.bincount(wpar[hit], minlength=n) > 0
                stop_hits += present
        n_sym = (
            pc.count_substring(arr, "#").to_numpy(zero_copy_only=False).astype(np.float64)
            + pc.count_substring(arr, "...").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        lparts = pc.split_pattern(arr, pattern="\n")
        lflat = pc.list_flatten(lparts)
        lpar = pc.list_parent_indices(lparts).to_numpy(zero_copy_only=False).astype(np.int64)
        n_lines = np.bincount(lpar, minlength=n).astype(np.float64)
        bullet = pc.match_substring_regex(lflat, r"^\s*[-*•]").to_numpy(zero_copy_only=False)
        ell = pc.match_substring_regex(lflat, r"\.\.\.\s*$").to_numpy(zero_copy_only=False)
        n_bullet = np.bincount(lpar, weights=bullet.astype(np.float64), minlength=n)
        n_ell = np.bincount(lpar, weights=ell.astype(np.float64), minlength=n)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_wl = np.where(n_words > 0, len_sum / np.maximum(n_words, 1), 0.0)
            sym_ratio = np.where(n_words > 0, n_sym / np.maximum(n_words, 1), 0.0)
            alpha_frac = np.where(n_words > 0, n_alpha / np.maximum(n_words, 1), 0.0)
            bullet_frac = np.where(n_lines > 0, n_bullet / np.maximum(n_lines, 1), 0.0)
            ell_frac = np.where(n_lines > 0, n_ell / np.maximum(n_lines, 1), 0.0)
        ok = (
            (n_words >= min_words)
            & (n_words <= max_words)
            & (mean_wl >= 3.0)
            & (mean_wl <= 10.0)
            & (sym_ratio <= 0.1)
            & (bullet_frac <= 0.9)
            & (ell_frac <= 0.3)
            & (alpha_frac >= 0.8)
            & (stop_hits >= 2)
        )
        return (
            t.append_column("n_words", pa.array(n_words.astype(np.int64), pa.int64()))
            .append_column("mean_word_len", pa.array(round_half_up(mean_wl), pa.float64()))
            .append_column("symbol_word_ratio", pa.array(round_half_up(sym_ratio), pa.float64()))
            .append_column("bullet_line_frac", pa.array(round_half_up(bullet_frac), pa.float64()))
            .append_column("ellipsis_line_frac", pa.array(round_half_up(ell_frac), pa.float64()))
            .append_column("alpha_word_frac", pa.array(round_half_up(alpha_frac), pa.float64()))
            .append_column("n_stop_hits", pa.array(stop_hits, pa.int64()))
            .append_column("gopher_pass", pa.array(ok, pa.bool_()))
        )

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


# GPT-2-style BPE pre-tokenizer, RE2-safe (no lookahead — RE2 has
# none, and both Arrow's count_substring_regex and DuckDB's
# regexp_extract_all run RE2 leftmost-first, so the counts agree
# bit-for-bit; pinned by the t_bpe_tokens oracle): contraction
# suffixes, optionally-space-prefixed letter runs, 1-3 digit groups
# (cl100k-style number splitting), punctuation runs, whitespace runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]{1,3}| ?[^\sA-Za-z0-9]+|\s+"
WS_PATTERN = r"\S+"


def add_bpe_token_stats(ds: Dataset, text_col: str = "text") -> Dataset:
    """Token counting for training-data budgeting (task brief:
    "whitespace + a BPE-ish regex"): append

        n_ws_tokens  — whitespace-separated chunks (``\\S+`` matches)
        n_bpe_tokens — BPE pre-tokenizer segments (``BPE_PATTERN``),
                       the standard proxy for LLM token cost

    Both are single Arrow ``count_substring_regex`` kernels per batch —
    no token materialization at all, so the op streams at column-scan
    speed."""

    def _f(t: pa.Table) -> pa.Table:
        arr = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        arr = pc.fill_null(arr, "")
        ws = pc.count_substring_regex(arr, pattern=WS_PATTERN)
        bpe = pc.count_substring_regex(arr, pattern=BPE_PATTERN)
        return t.append_column("n_ws_tokens", pc.cast(ws, pa.int64())).append_column(
            "n_bpe_tokens", pc.cast(bpe, pa.int64())
        )

    return ds.map_batches(_f, batch_format="pyarrow")


class _UnigramScorer:
    """Actor stage scoring docs against a broadcast unigram LM.
    Model arrays ship once per actor via fn_constructor_args (object
    store), never per batch; per-batch lookup is one hash get_indexer
    over the batch's UNIQUE tokens (dictionary encode)."""

    def __init__(self, terms: np.ndarray, logp: np.ndarray, oov_lp: float, text_col: str):
        self.index = pd.Index(terms)
        self.logp = logp
        self.oov = float(oov_lp)
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, parents, n = _flat_tokens(t[self.text_col])
        sums = np.zeros(n, dtype=np.float64)
        m = np.zeros(n, dtype=np.int64)
        if len(flat):
            denc = flat.dictionary_encode()
            ui = self.index.get_indexer(denc.dictionary.to_numpy(zero_copy_only=False))
            ulp = np.where(ui >= 0, self.logp[np.maximum(ui, 0)], self.oov)
            tok_lp = ulp[denc.indices.to_numpy(zero_copy_only=False)]
            sums = np.bincount(parents, weights=-tok_lp, minlength=n)
            m = np.bincount(parents, minlength=n)
        from .rounding import round_half_up

        score = np.where(m > 0, round_half_up(np.divide(sums, np.maximum(m, 1))), 0.0)
        return t.append_column("neg_logprob", pa.array(score, pa.float64()))


def unigram_logprob(
    ds: Dataset,
    text_col: str = "text",
    model_ds: Dataset | None = None,
    concurrency: tuple[int, int] | int = (1, 8),
) -> Dataset:
    """CCNet-style unigram language-model scoring: per-doc mean
    negative log-probability under corpus unigram frequencies —
    ``neg_logprob = round(avg(-ln(count(tok)/total_tokens)), 4)``
    (low = typical text, high = rare-token noise; the classic
    perplexity-bucket signal for training-data curation).

    Two phases: (1) the model — one explode + value-counts shuffle,
    output bounded by VOCABULARY size, not corpus size; (2) scoring —
    the (term, logp) arrays broadcast once per actor, per-batch
    vectorized lookup. At 100 TB the vocab table is the only
    materialized state and it is millions of rows, not billions.
    Unseen tokens (when scoring a different corpus than the model's,
    ``model_ds``) take logp = ln(1/total)."""
    from .relational import value_counts

    src = model_ds if model_ds is not None else ds
    model = value_counts(
        explode_tokens(src.select_columns([text_col]), text_col, []), "token", alias="cnt"
    ).to_pandas()
    total = float(model["cnt"].sum()) if len(model) else 1.0
    terms = model["token"].to_numpy()
    logp = np.log(model["cnt"].to_numpy().astype(np.float64) / total)
    oov_lp = float(np.log(1.0 / total))
    return ds.map_batches(
        _UnigramScorer,
        fn_constructor_args=(terms, logp, oov_lp, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# PII / boilerplate patterns, RE2 on both sides (Arrow kernels and
# DuckDB regexp_* run the same engine, so counts and replacements
# agree exactly; pinned by the t_pii_clean oracle)
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^\s]+"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def add_pii_clean(ds: Dataset, text_col: str = "text", out_col: str = "clean") -> Dataset:
    """PII / boilerplate curation stage (the RefinedWeb/C4-style
    redaction pass): append per-doc pattern counts

        n_emails, n_urls, n_ips   (int64)

    and ``out_col`` — the text with URLs replaced by ``<URL>``, emails
    by ``<EMAIL>`` (URLs first, so a mailto-ish URL cannot leak an
    address), whitespace runs collapsed to one space, and the result
    trimmed. All seven kernels are single vectorized RE2 passes; no
    token or row materialization."""

    def _f(t: pa.Table) -> pa.Table:
        arr = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        arr = pc.fill_null(arr, "")
        counts = {
            "n_emails": pc.count_substring_regex(arr, pattern=EMAIL_PATTERN),
            "n_urls": pc.count_substring_regex(arr, pattern=URL_PATTERN),
            "n_ips": pc.count_substring_regex(arr, pattern=IPV4_PATTERN),
        }
        clean = pc.replace_substring_regex(arr, pattern=URL_PATTERN, replacement="<URL>")
        clean = pc.replace_substring_regex(clean, pattern=EMAIL_PATTERN, replacement="<EMAIL>")
        clean = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(clean, pattern=r"\s+", replacement=" ")
        )
        for name, c in counts.items():
            t = t.append_column(name, pc.cast(c, pa.int64()))
        return t.append_column(out_col, clean)

    return ds.map_batches(_f, batch_format="pyarrow")


def add_repetition_scores(ds: Dataset, text_col: str = "text") -> Dataset:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    simplified to token counts so each has an exact SQL oracle):

        dup_line_frac   = 1 - distinct_lines / lines
        top_bigram_frac = tokens covered by the most frequent
                          token 2-gram = 2 * max_bigram_count
                          / n_tokens    (0 when n_tokens < 2)

    Both rounded half-away to 4dp. Vectorized batch-wide: lines via
    one plain-split kernel + factorize, bigrams via the 64-bit token
    hash stream with doc boundaries masked, run-length counts from ONE
    lexsort — no per-doc Python."""

    def _f(t: pa.Table) -> pa.Table:
        from .rounding import round_half_up

        arr = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        arr = pc.fill_null(arr, "")
        n = len(arr)
        # --- duplicate-line fraction ---
        parts = pc.split_pattern(arr, pattern="\n")
        lines = pc.list_flatten(parts)
        lparents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        n_lines = np.bincount(lparents, minlength=n).astype(np.float64)
        if len(lines):
            codes, uniq = pd.factorize(lines.to_numpy(zero_copy_only=False), sort=False)
            nv = max(len(uniq), 1)
            uk = np.unique(lparents * nv + codes)
            n_dist = np.bincount(uk // nv, minlength=n).astype(np.float64)
        else:
            n_dist = np.zeros(n)
        with np.errstate(divide="ignore", invalid="ignore"):
            dup_frac = np.where(n_lines > 0, 1.0 - n_dist / np.maximum(n_lines, 1), 0.0)
        # --- top-bigram token fraction ---
        from .dedup import _arrow_token_stream

        th, doc_ix, _ = _arrow_token_stream(arr)
        n_tok = np.bincount(doc_ix, minlength=n).astype(np.int64)
        top = np.zeros(n, dtype=np.int64)
        if th.size >= 2:
            m = th.size - 1
            same = doc_ix[:m] == doc_ix[1:]
            bd, bh = doc_ix[:m][same], (th[:m][same] * np.uint64(1_099_511_628_211) + th[1:][same])
            if bd.size:
                order = np.lexsort((bh, bd))
                bd, bh = bd[order], bh[order]
                new_run = np.ones(bd.size, dtype=bool)
                new_run[1:] = (bd[1:] != bd[:-1]) | (bh[1:] != bh[:-1])
                run_ids = np.cumsum(new_run) - 1
                run_len = np.bincount(run_ids)
                run_doc = bd[new_run]
                np.maximum.at(top, run_doc, run_len)
        with np.errstate(divide="ignore", invalid="ignore"):
            big_frac = np.where(n_tok >= 2, 2.0 * top / np.maximum(n_tok, 1), 0.0)
        return t.append_column(
            "dup_line_frac", pa.array(round_half_up(dup_frac), pa.float64())
        ).append_column("top_bigram_frac", pa.array(round_half_up(big_frac), pa.float64()))

    return ds.map_batches(_f, batch_format="pyarrow")


def extract_snippets(
    ds: Dataset,
    term: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    context: int = 2,
) -> Dataset:
    """Keyword-in-context highlighter (Lucene highlighter analog,
    reference response-shaping ring): for every doc containing
    ``term``, emit its FIRST occurrence position (1-based) and a
    snippet of ``context`` tokens either side. Re-analyzes stored
    text per batch (the unified-highlighter strategy) — one Arrow
    tokenize + vectorized first-hit select + one gather per batch,
    no per-doc Python."""
    c = int(context)

    def _f(t: pa.Table) -> pa.Table:
        flat, parents, n = _flat_tokens(t[text_col])
        counts = np.bincount(parents, minlength=n)
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        hp = np.nonzero(pc.equal(flat, term).to_numpy(zero_copy_only=False))[0]
        ids = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        if hp.size == 0:
            return pa.table(
                {
                    id_col: ids.slice(0, 0),
                    "first_pos": pa.array([], pa.int64()),
                    "snippet": pa.array([], pa.string()),
                }
            )
        hd = parents[hp]
        first = np.ones(hd.size, dtype=bool)
        first[1:] = hd[1:] != hd[:-1]  # parents nondecreasing, hp ascending
        matched, first_global = hd[first], hp[first]
        ix0 = first_global - starts[matched]
        s0 = np.maximum(ix0 - c, 0)
        e0 = np.minimum(ix0 + c + 1, counts[matched])
        w = e0 - s0
        offs = np.concatenate(([0], np.cumsum(w)))
        idx = (
            np.repeat(starts[matched] + s0, w)
            + np.arange(offs[-1])
            - np.repeat(offs[:-1], w)
        )
        vals = flat.take(pa.array(idx, pa.int64()))
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), vals)
        return pa.table(
            {
                id_col: ids.take(pa.array(matched, pa.int64())),
                "first_pos": pa.array(ix0 + 1, pa.int64()),
                "snippet": pc.binary_join(lists, " "),
            }
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def significant_terms(
    ds: Dataset,
    query_term: str,
    text_col: str = "text",
    k: int = 10,
    min_doc_count: int = 2,
    heuristic: str = "jlh",
) -> Dataset:
    """ES significant_terms aggregation: terms over-represented in the
    matched set (docs containing `query_term`, the foreground) versus
    the whole corpus (the background), scored with the JLH heuristic
    ((fg_rate - bg_rate) * fg_rate / bg_rate). The query term itself is
    excluded (fg_rate = 1 by construction — pure noise).

    Shuffle payload is per-batch (term, fg, bg) PARTIAL counts (the
    map-side combiner pattern), so the all-to-all moves a vocabulary
    slice per block, never token occurrences. Foreground/background
    doc totals ride the same shuffle as a sentinel '' row ('' can
    never be a token), so the corpus is scanned exactly once. The
    aggregated vocabulary table stays distributed through scoring and
    the bounded top-k — nothing vocabulary-sized hits the driver."""
    from ray.data.aggregate import Sum

    from search_engine_ray.ops.relational import topk
    from search_engine_ray.ops.rounding import round_half_up

    def _partial(t: pa.Table) -> pa.Table:
        flat, parents, n = _flat_tokens(t[text_col])
        fg_docs = np.unique(parents[pc.equal(flat, query_term).to_numpy(zero_copy_only=False)])
        df = pd.DataFrame(
            {"term": flat.to_pandas(), "p": parents}
        ).drop_duplicates()
        df = df[df["term"] != query_term]
        df["fg"] = np.isin(df["p"].to_numpy(), fg_docs).astype(np.int64)
        g = df.groupby("term", sort=False)["fg"].agg(["sum", "size"]).reset_index()
        terms = list(g["term"]) + [""]
        fg = list(g["sum"].astype(np.int64)) + [np.int64(fg_docs.size)]
        bg = list(g["size"].astype(np.int64)) + [np.int64(n)]
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "fg": pa.array(fg, pa.int64()),
            "bg": pa.array(bg, pa.int64()),
        })

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("fg", alias_name="fg"), Sum("bg", alias_name="bg"))
        .materialize()  # vocabulary-sized aggregate, consumed twice
    )
    tot = agg.map_batches(
        lambda t: t.filter(pc.equal(t["term"], "")), batch_format="pyarrow"
    ).take(1)[0]
    fg_n, bg_n = float(tot["fg"]), float(tot["bg"])
    if fg_n == 0:  # no doc matches the query term: nothing significant
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            "term": pa.array([], pa.string()),
            "fg": pa.array([], pa.int64()),
            "bg": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }))

    if heuristic not in ("jlh", "chi_square"):
        raise ValueError(f"heuristic must be jlh|chi_square, got {heuristic!r}")

    def _score(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(t["term"], ""), pc.greater_equal(t["fg"], min_doc_count))
        t = t.filter(keep)
        fgr = t["fg"].to_numpy().astype(np.float64) / fg_n
        bgr = t["bg"].to_numpy().astype(np.float64) / bg_n
        if heuristic == "chi_square":
            # classic 2x2 contingency chi-square (Manning et al., IR,
            # 13.5.2): rows = term present/absent, cols = fg/bg-rest
            o11 = t["fg"].to_numpy().astype(np.float64)
            o12 = t["bg"].to_numpy().astype(np.float64) - o11  # in rest
            o21 = fg_n - o11
            rest_n = bg_n - fg_n
            o22 = rest_n - o12
            num = bg_n * (o11 * o22 - o12 * o21) ** 2
            den = (o11 + o12) * (o11 + o21) * (o12 + o22) * (o21 + o22)
            with np.errstate(invalid="ignore", divide="ignore"):
                raw = np.where(den > 0, num / den, 0.0)
            # signed: negative association (under-representation) ranks last
            raw = np.where(fgr >= bgr, raw, -raw)
        else:
            raw = (fgr - bgr) * fgr / bgr
        return pa.table({
            "term": t["term"],
            "fg": t["fg"],
            "bg": t["bg"],
            "raw": pa.array(raw, pa.float64()),
        })

    top = topk(agg.map_batches(_score, batch_format="pyarrow"),
               ["raw", "term"], k, descending=[True, False])

    def _finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "term": t["term"],
            "fg": t["fg"],
            "bg": t["bg"],
            "score": pa.array(round_half_up(t["raw"].to_numpy()), pa.float64()),
        })

    return top.map_batches(_finish, batch_format="pyarrow")


def normalize_text(
    ds: Dataset, text_col: str = "text", out_col: str = "norm"
) -> Dataset:
    """Unicode text normalization (crawl-cleaning preprocessor): NFKD
    decomposition, combining-mark strip (\\p{Mn} — removes Latin
    accents, leaves base letters like ß), lowercase, whitespace squash
    to single spaces, trim. All C++ Arrow kernels; equivalent to
    DuckDB ``trim(regexp_replace(lower(strip_accents(nfc_normalize(x))),
    '\\s+', ' ', 'g'))`` for Latin-script inputs (parity pinned by the
    t_normalize oracle)."""

    def _f(t: pa.Table) -> pa.Table:
        a = t[text_col]
        a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        s = pc.utf8_normalize(pc.fill_null(a, ""), form="NFKD")
        s = pc.replace_substring_regex(s, pattern=r"\p{Mn}", replacement="")
        s = pc.utf8_lower(s)
        s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
        s = pc.utf8_trim_whitespace(s)
        return t.append_column(out_col, s)

    return ds.map_batches(_f, batch_format="pyarrow")


def extract_fragments(
    ds: Dataset,
    term: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    context: int = 2,
    max_fragments: int = 3,
) -> Dataset:
    """ES highlight with number_of_fragments > 1: up to
    ``max_fragments`` keyword-in-context windows PER DOC, one row per
    fragment (frag_idx 1-based in position order, pos 1-based token
    position). The multi-occurrence sibling of `extract_snippets`,
    same fully-vectorized shape — hit positions come from one Arrow
    equality scan, the per-doc fragment counter from a cumcount over
    the (sorted) hit parents, windows from one repeat/arange gather +
    binary_join."""
    c, mf = int(context), int(max_fragments)
    if mf <= 0:
        raise ValueError("max_fragments must be positive")

    def _f(t: pa.Table) -> pa.Table:
        flat, parents, n = _flat_tokens(t[text_col])
        counts = np.bincount(parents, minlength=n)
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        hp = np.nonzero(pc.equal(flat, term).to_numpy(zero_copy_only=False))[0]
        ids = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        if hp.size == 0:
            return pa.table({
                id_col: ids.slice(0, 0),
                "frag_idx": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "snippet": pa.array([], pa.string()),
            })
        hd = parents[hp]  # nondecreasing
        new_doc = np.ones(hd.size, dtype=bool)
        new_doc[1:] = hd[1:] != hd[:-1]
        seg_first = np.flatnonzero(new_doc)
        within = np.arange(hd.size) - np.repeat(seg_first, np.diff(np.append(seg_first, hd.size)))
        keep = within < mf
        hd, hp, within = hd[keep], hp[keep], within[keep]
        ix0 = hp - starts[hd]
        s0 = np.maximum(ix0 - c, 0)
        e0 = np.minimum(ix0 + c + 1, counts[hd])
        w = e0 - s0
        offs = np.concatenate(([0], np.cumsum(w)))
        idx = (
            np.repeat(starts[hd] + s0, w) + np.arange(offs[-1]) - np.repeat(offs[:-1], w)
        )
        vals = flat.take(pa.array(idx, pa.int64()))
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), vals)
        return pa.table({
            id_col: ids.take(pa.array(hd, pa.int64())),
            "frag_idx": pa.array(within + 1, pa.int64()),
            "pos": pa.array(ix0 + 1, pa.int64()),
            "snippet": pc.binary_join(lists, " "),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def chunk_documents(
    ds: Dataset,
    text_col: str = "text",
    chunk_tokens: int = 256,
    stride: int = 128,
    keep: list[str] | None = None,
) -> Dataset:
    """Sliding-window chunking (the RAG / context-window prep step):
    each doc becomes ceil-spaced windows of `chunk_tokens` tokens every
    `stride` tokens (the final window may be shorter; docs with zero
    tokens emit no chunks). Output rows: kept id columns + chunk_idx,
    n_tokens, chunk (space-joined tokens).

    Fully vectorized fan-out: token stream + parent indices once per
    batch (the build tokenizer), chunk starts/lengths by numpy repeat
    arithmetic, one flat `take` gather, and ONE Arrow binary_join to
    materialize every chunk string in the batch — no per-doc loop. A
    pure streaming map_batches: the fan-out multiplies rows ~n/stride
    inside the block, so block sizes bound memory at any corpus size."""
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    W, S = int(chunk_tokens), int(stride)
    keep = list(keep) if keep else []

    def _f(t: pa.Table) -> pa.Table:
        flat, parents, n = _flat_tokens(t[text_col])
        counts = np.bincount(parents, minlength=n).astype(np.int64)
        doc_start = np.concatenate([[0], np.cumsum(counts)])
        nc = np.where(counts == 0, 0, np.maximum(0, (counts - W + S - 1) // S) + 1)
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), nc)
        total = int(nc.sum())
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(nc)[:-1]]), nc
        )
        starts = doc_start[doc_rep] + chunk_idx * S
        lens = np.minimum(W, counts[doc_rep] - chunk_idx * S)
        # gather all chunk token indices flat: starts repeated + intra
        intra = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        idx = np.repeat(starts, lens) + intra
        gathered = flat.take(pa.array(idx, pa.int64()))
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        chunks = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs, pa.int32()), gathered), " "
        )
        cols = {c: t[c].take(pa.array(doc_rep, pa.int64())) for c in keep}
        cols["chunk_idx"] = pa.array(chunk_idx, pa.int64())
        cols["n_tokens"] = pa.array(lens, pa.int64())
        cols["chunk"] = chunks
        return pa.table(cols)

    return ds.map_batches(_f, batch_format="pyarrow")


def explode_tokens(ds: Dataset, text_col: str, keep: list[str]) -> Dataset:
    """doc -> one row per token (R10 flat-map analog; the build-side
    posting explosion re-used as a user-facing op). Pure Arrow:
    split + flatten + parent-index take."""

    def _f(t: pa.Table) -> pa.Table:
        flat, parents, _n = _flat_tokens(t[text_col])
        if not keep:  # token stream only (e.g. vocabulary builds)
            return pa.table({"token": flat})
        out = t.select(keep).take(pa.array(parents, pa.int64()))
        return out.append_column("token", flat)

    return ds.map_batches(_f, batch_format="pyarrow")


def tfidf_keywords(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id", top_n: int = 3
) -> Dataset:
    """Per-doc keyword extraction: the top_n tokens by tf·idf
    (idf = ln(N/df), ranking ties broken by token asc). Two passes:

    1. DF pass — per block, the distinct (doc, token) pairs collapse
       to a (token, df_partial) combiner (vocabulary-bounded, never
       the token stream); one groupby-sum gives the global df map,
       broadcast once via ray.put.
    2. Score pass — per batch, factorize tokens, one np.unique over
       packed (doc, code) keys for tf, vectorized score + lexsort
       head-per-doc. No Python loop over rows.

    Output: (id_col, token, rnk, tfidf) with rnk 1..top_n and tfidf
    rounded half-up to 4. Docs with no tokens emit nothing. At
    web-scale vocabulary the broadcast df map is the same bounded
    object as the unigram-LM count map (ops.text.unigram_logprob);
    beyond worker heap, swap the probe for the documented hash_join
    fallback there."""
    import ray

    from .rounding import round_half_up

    def _df_partial(t: pa.Table) -> pa.Table:
        flat, parents, _n = _flat_tokens(t[text_col])
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "dfp": pa.array([], pa.int64())})
        toks = flat.to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(toks, sort=False)
        nv = max(len(uniq), 1)
        uk = np.unique(parents * nv + codes)
        cnt = np.bincount(uk % nv, minlength=nv)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "dfp": pa.array(cnt, pa.int64())})

    from ray.data.aggregate import Sum

    dfmap = (
        ds.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("dfp", alias_name="df"))
        .to_pandas()
    )
    n_docs = float(ds.count())
    df_ref = ray.put(dict(zip(dfmap["token"], dfmap["df"].astype(np.int64))))

    def _score(t: pa.Table) -> pa.Table:
        df_lut = ray.get(df_ref)
        flat, parents, _n = _flat_tokens(t[text_col])
        empty = pa.table({
            id_col: pa.array([], t[id_col].type),
            "token": pa.array([], pa.string()),
            "rnk": pa.array([], pa.int64()),
            "tfidf": pa.array([], pa.float64()),
        })
        if len(flat) == 0:
            return empty
        toks = flat.to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(toks, sort=False)
        nv = max(len(uniq), 1)
        uk, tf = np.unique(parents * nv + codes, return_counts=True)
        doc_idx, code = uk // nv, uk % nv
        idf = np.log(n_docs / np.array([float(df_lut[u]) for u in uniq], np.float64))
        score = tf.astype(np.float64) * idf[code]
        tok_arr = uniq[code]
        # head-per-doc: primary doc asc, then score desc, token asc
        order = np.lexsort((tok_arr, -score, doc_idx))
        d_sorted = doc_idx[order]
        starts = np.flatnonzero(np.r_[True, d_sorted[1:] != d_sorted[:-1]])
        counts = np.diff(np.r_[starts, d_sorted.size])
        rank = np.arange(d_sorted.size) - np.repeat(starts, counts)
        keep = rank < top_n
        sel = order[keep]
        ids = t[id_col].take(pa.array(doc_idx[sel], pa.int64()))
        return pa.table({
            id_col: ids,
            "token": pa.array(tok_arr[sel], pa.string()),
            "rnk": pa.array(rank[keep] + 1, pa.int64()),
            "tfidf": pa.array(round_half_up(score[sel]), pa.float64()),
        })

    return ds.map_batches(_score, batch_format="pyarrow")


def collocations(
    ds: Dataset,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 5,
    top_k: int = 20,
) -> pd.DataFrame:
    """Collocation extraction by pointwise mutual information: count
    ordered token pairs (a, b) with b within `window` positions after
    a (in the same doc), then PMI = ln(c_ab * T / (c_a * c_b)) over
    pairs with c_ab >= min_count; returns the top_k by (PMI desc,
    a, b) with pmi rounded half-up to 4. T = total pair slots
    (sum over gaps of per-doc max(len - gap, 0)), c_a / c_b = the
    token's occurrences as left / right member of any slot.

    Scale shape: pair extraction is vectorized per batch (array
    shifts, no Python over tokens); the exchange carries one
    (pair, count) row per distinct pair per block (combiner), bounded
    by observed-bigram vocabulary, and unigram slot counts ride the
    same shape. PMI math runs on the bounded count tables."""
    from ray.data.aggregate import Sum

    from .rounding import round_half_up

    def _pairs(t: pa.Table) -> pa.Table:
        flat, parents, _n = _flat_tokens(t[text_col])
        toks = flat.to_numpy(zero_copy_only=False)
        lefts, rights = [], []
        for gap in range(1, window + 1):
            if len(toks) <= gap:
                break
            same = parents[:-gap] == parents[gap:]
            lefts.append(toks[:-gap][same])
            rights.append(toks[gap:][same])
        if not lefts:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        a = np.concatenate(lefts)
        b = np.concatenate(rights)
        df = (
            pd.DataFrame({"a": a, "b": b})
            .groupby(["a", "b"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    pair_counts = ds.map_batches(_pairs, batch_format="pyarrow").groupby(
        ["a", "b"]
    ).aggregate(Sum("cnt", alias_name="c_ab")).materialize()
    # marginals + total fold DISTRIBUTED (token-vocab-bounded rows);
    # only the min_count survivors reach the driver — the raw bigram
    # table never does (at web scale it dwarfs the token vocabulary)
    c_a = (
        pair_counts.groupby("a").aggregate(Sum("c_ab", alias_name="c_left"))
        .to_pandas().rename(columns={"a": "t"})
    )
    c_b = (
        pair_counts.groupby("b").aggregate(Sum("c_ab", alias_name="c_right"))
        .to_pandas().rename(columns={"b": "t"})
    )
    if c_a.empty:
        return pd.DataFrame({"a": [], "b": [], "c_ab": [], "pmi": []})
    total = float(c_a["c_left"].sum())
    df = (
        pair_counts.map_batches(
            lambda t: t.filter(pc.greater_equal(t["c_ab"], min_count)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame({"a": [], "b": [], "c_ab": [], "pmi": []})
    df = df.merge(c_a, left_on="a", right_on="t").drop(columns=["t"])
    df = df.merge(c_b, left_on="b", right_on="t").drop(columns=["t"])
    pmi_raw = np.log(
        df["c_ab"].to_numpy(dtype=np.float64) * total
        / (df["c_left"].to_numpy(dtype=np.float64)
           * df["c_right"].to_numpy(dtype=np.float64))
    )
    df["pmi"] = pmi_raw
    df = df.sort_values(["pmi", "a", "b"], ascending=[False, True, True],
                        kind="mergesort").head(top_k)
    out = df.reset_index(drop=True)[["a", "b", "c_ab", "pmi"]]
    out["c_ab"] = out["c_ab"].astype("int64")
    out["pmi"] = round_half_up(out["pmi"].to_numpy())
    return out


# ------------------------------------------------- DSIR data selection


def _md5_bucket_counts(ds: Dataset, text_col: str, n_buckets: int) -> tuple[np.ndarray, float]:
    """Hashed-unigram feature counts: per-batch bincount partials (one
    <=n_buckets-row table per block) -> ONE bounded groupby-sum
    shuffle. The shuffle carries at most n_buckets rows per block, not
    the token stream, so the model build is combiner-shaped like
    unigram_logprob's vocab pass. Token hash = first 8 md5 bytes
    little-endian (DuckDB ``md5_number_upper``), computed once per
    DISTINCT token via factorize."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        flat, _parents, _n = _flat_tokens(t[text_col])
        if len(flat) == 0:
            return pa.table({"bk": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(flat.to_numpy(zero_copy_only=False), sort=False)
        uh = np.fromiter(
            (int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[:8], "little") for u in uniq),
            dtype=np.uint64,
            count=len(uniq),
        )
        bk = (uh % np.uint64(n_buckets)).astype(np.int64)[codes]
        cnt = np.bincount(bk, minlength=n_buckets)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {"bk": pa.array(nz, pa.int64()), "c": pa.array(cnt[nz], pa.int64())}
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("bk")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # <= n_buckets rows by construction
    )
    out = np.zeros(n_buckets, dtype=np.float64)
    if len(agg):
        out[agg["bk"].to_numpy()] = agg["c"].to_numpy().astype(np.float64)
    return out, float(out.sum())


class _DSIRScorer:
    """Prepared-instance UDF: the per-bucket log importance ratio
    (n_buckets floats) ships once with the closure; per batch one
    md5-per-distinct-token hash + a weighted bincount."""

    def __init__(self, logratio: np.ndarray, n_buckets: int, text_col: str):
        self.lr = np.asarray(logratio, dtype=np.float64)
        self.n_buckets = int(n_buckets)
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from .rounding import round_half_up

        flat, parents, n = _flat_tokens(t[self.text_col])
        logw = np.zeros(n, dtype=np.float64)
        if len(flat):
            codes, uniq = pd.factorize(flat.to_numpy(zero_copy_only=False), sort=False)
            uh = np.fromiter(
                (int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[:8], "little") for u in uniq),
                dtype=np.uint64,
                count=len(uniq),
            )
            lr_uniq = self.lr[(uh % np.uint64(self.n_buckets)).astype(np.int64)]
            logw = np.bincount(parents, weights=lr_uniq[codes], minlength=n)
        return t.append_column("dsir_logw", pa.array(round_half_up(logw), pa.float64()))


def dsir_importance(
    ds: Dataset,
    target: Dataset,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> Dataset:
    """DSIR (Xie et al. 2023, arXiv:2302.03169 "Data Selection for
    Language Models via Importance Resampling") importance weights:
    hashed bag-of-unigram features (md5 -> n_buckets), a smoothed
    bucket LM for the TARGET domain and one for the RAW corpus, and a
    per-doc log importance weight

        dsir_logw = round(sum_tokens ln(p_target(bk)/p_raw(bk)), 4)
        p(bk) = (count(bk) + alpha) / (total + alpha * n_buckets)

    Scale shape: each model build is one combiner-shaped shuffle
    bounded by n_buckets rows per block; the scoring state is
    n_buckets floats shipped once with the prepared UDF (plain tasks,
    no actor pool — tiny state); the corpus itself never shuffles.
    The paper resamples with Gumbel noise; the deterministic variant
    here (rank by weight, see dsir_select) keeps the op value-
    checkable — seeded Gumbel keys would compose the same way."""
    tc, tn = _md5_bucket_counts(target, text_col, n_buckets)
    rc, rn = _md5_bucket_counts(ds, text_col, n_buckets)
    b = float(n_buckets)
    lr = np.log((tc + alpha) / (tn + alpha * b)) - np.log((rc + alpha) / (rn + alpha * b))
    return ds.map_batches(
        _DSIRScorer(lr, n_buckets, text_col), batch_format="pyarrow"
    )


def dsir_select(
    ds: Dataset,
    target: Dataset,
    top_n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> Dataset:
    """DSIR selection: score with dsir_importance, keep the top_n docs
    by (dsir_logw desc, id asc) — bounded partial top-k per block, one
    tiny survivor sort — and flag every doc. Returns
    (id_col, dsir_logw, selected 0/1); the selected id set (top_n ids)
    broadcasts for the flag pass, so no full sort of the corpus."""
    import ray

    from .relational import topk

    scored = dsir_importance(ds, target, text_col, n_buckets, alpha).select_columns(
        [id_col, "dsir_logw"]
    )
    # materialize: the winners pass and the flag pass both consume it,
    # and the scored table is 2 columns (id, weight), not the corpus
    scored = scored.materialize()
    winners = (
        topk(scored, ["dsir_logw", id_col], top_n, descending=[True, False])
        .to_pandas()[id_col]
        .to_numpy(dtype=np.int64)
    )
    ref = ray.put(np.sort(winners))

    def _flag(t: pa.Table) -> pa.Table:
        w = ray.get(ref)
        ids = t[id_col].to_numpy()
        pos = np.clip(np.searchsorted(w, ids), 0, max(w.size - 1, 0))
        sel = (w[pos] == ids).astype(np.int64) if w.size else np.zeros(ids.size, np.int64)
        return t.append_column("selected", pa.array(sel, pa.int64()))

    return scored.map_batches(_flag, batch_format="pyarrow")


# ------------------------------------- interpolated bigram LM scoring


class _BigramScorer:
    """Prepared-instance UDF over broadcast unigram + bigram count
    maps. Per batch: one factorize per side, two pd.Index lookups over
    the batch's DISTINCT tokens / token pairs; the interpolation and
    per-doc mean are pure numpy."""

    def __init__(self, uni_idx, uni_cnt, bi_idx, bi_cnt, total, lam, text_col):
        self.uni_idx = pd.Index(uni_idx)
        self.uni_cnt = np.asarray(uni_cnt, dtype=np.float64)
        self.bi_idx = pd.Index(bi_idx)
        self.bi_cnt = np.asarray(bi_cnt, dtype=np.float64)
        self.total = float(total)
        self.lam = float(lam)
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from .rounding import round_half_up

        flat, parents, n = _flat_tokens(t[self.text_col])
        score = np.zeros(n, dtype=np.float64)
        if len(flat):
            toks = flat.to_numpy(zero_copy_only=False)
            codes, uniq = pd.factorize(toks, sort=False)
            ui = self.uni_idx.get_indexer(uniq)
            # unseen tokens (scoring a corpus the model never saw):
            # count 1 — same floor the SQL uses via coalesce
            ucnt = np.where(ui >= 0, self.uni_cnt[np.maximum(ui, 0)], 1.0)[codes]
            p_uni = ucnt / self.total
            # token i is a continuation iff token i-1 is in the same doc
            cont = np.zeros(len(toks), dtype=bool)
            cont[1:] = parents[1:] == parents[:-1]
            lp = -np.log(p_uni)  # first-token (and fallback) term
            if cont.any():
                pairs = np.char.add(
                    np.char.add(toks[:-1].astype("U"), " "), toks[1:].astype("U")
                )
                pcodes, puniq = pd.factorize(pairs, sort=False)
                bi = self.bi_idx.get_indexer(puniq)
                bcnt_prev = np.where(bi >= 0, self.bi_cnt[np.maximum(bi, 0)], 0.0)[pcodes]
                bcnt = np.zeros(len(toks), dtype=np.float64)
                bcnt[1:] = bcnt_prev
                prev_cnt = np.ones(len(toks), dtype=np.float64)
                prev_cnt[1:] = ucnt[:-1]
                p_bi = self.lam * (bcnt / prev_cnt) + (1.0 - self.lam) * p_uni
                lp = np.where(cont, -np.log(p_bi), lp)
            sums = np.bincount(parents, weights=lp, minlength=n)
            m = np.bincount(parents, minlength=n)
            score = np.where(m > 0, np.divide(sums, np.maximum(m, 1)), 0.0)
        return t.append_column(
            "bigram_nlp", pa.array(round_half_up(score), pa.float64())
        )


def bigram_logprob(
    ds: Dataset,
    text_col: str = "text",
    model_ds: Dataset | None = None,
    lam: float = 0.7,
) -> Dataset:
    """CCNet-style perplexity proxy, one order up from
    unigram_logprob: per-doc mean negative log-probability under an
    INTERPOLATED bigram LM built from corpus counts —

        p(w_i | w_{i-1}) = lam * c(w_{i-1} w_i)/c(w_{i-1})
                           + (1-lam) * c(w_i)/N
        first token of a doc scores under the unigram term alone;
        bigram_nlp = round(mean_i -ln p_i, 4), 0 for empty docs.

    Model build = two combiner-shaped count shuffles (vocab- and
    bigram-vocab-bounded, never corpus-bounded); scoring ships the
    count maps once with the prepared UDF and runs factorize +
    get_indexer per batch. The bigram map is the big side — at
    web-scale vocab swap the broadcast for a hash-join of exploded
    (doc, pos, bigram) rows against the count table (the
    dup-ngram-stats fallback pattern); the op's semantics and oracle
    stay identical."""
    from .relational import value_counts

    src = model_ds if model_ds is not None else ds

    uni = value_counts(
        explode_tokens(src.select_columns([text_col]), text_col, []), "token", alias="cnt"
    ).to_pandas()
    total = float(uni["cnt"].sum()) if len(uni) else 1.0

    def _bigrams(t: pa.Table) -> pa.Table:
        flat, parents, _n = _flat_tokens(t[text_col])
        if len(flat) < 2:
            return pa.table({"bigram": pa.array([], pa.string())})
        toks = flat.to_numpy(zero_copy_only=False)
        cont = parents[1:] == parents[:-1]
        pairs = np.char.add(np.char.add(toks[:-1].astype("U"), " "), toks[1:].astype("U"))
        return pa.table({"bigram": pa.array(pairs[cont], pa.string())})

    bi = value_counts(
        src.select_columns([text_col]).map_batches(_bigrams, batch_format="pyarrow"),
        "bigram",
        alias="cnt",
    ).to_pandas()

    return ds.map_batches(
        _BigramScorer(
            uni["token"].to_numpy(),
            uni["cnt"].to_numpy(),
            bi["bigram"].to_numpy() if len(bi) else np.array([], dtype=object),
            bi["cnt"].to_numpy() if len(bi) else np.array([], dtype=np.int64),
            total,
            lam,
            text_col,
        ),
        batch_format="pyarrow",
    )


def string_stats(ds: Dataset, col: str) -> dict:
    """ES string_stats aggregation over a keyword/text field: count,
    min/max/avg length and the Shannon entropy of the field's
    character distribution (show_distribution's base). One streaming
    pass: each batch emits a bounded partial — one row per distinct
    codepoint (histogram via utf-32 reinterpret + bincount, no Python
    loop over chars) plus one length-moments row — so the driver folds
    alphabet-sized partials, never rows. Entropy is computed over
    codepoints in ascending order, matching the SQL oracle's
    group-by-character replay."""

    def _partial(t: pa.Table) -> pa.Table:
        vals = pc.cast(t[col], pa.string())
        lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
        joined = "".join(vals.to_pandas().fillna(""))
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        uniq, cnts = np.unique(codes, return_counts=True)
        return pa.table({
            "key": pa.array(
                np.concatenate([uniq.astype(np.int64), [-1, -2, -3, -4]])
            ),
            "n": pa.array(
                np.concatenate([
                    cnts.astype(np.int64),
                    [
                        int(len(t)),
                        int(lens.sum()),
                        int(lens.min()) if len(t) else 0,
                        int(lens.max()) if len(t) else 0,
                    ],
                ])
            ),
        })

    part = (
        ds.map_batches(lambda t: t.select([col]), batch_format="pyarrow")
        .map_batches(_partial, batch_format="pyarrow")
        .to_pandas()
    )
    chars = part[part["key"] >= 0].groupby("key", sort=True)["n"].sum()
    count = int(part.loc[part["key"] == -1, "n"].sum())
    total_len = int(part.loc[part["key"] == -2, "n"].sum())
    min_len = int(part.loc[part["key"] == -3, "n"].min()) if count else 0
    max_len = int(part.loc[part["key"] == -4, "n"].max()) if count else 0
    p = chars.to_numpy(dtype=np.float64) / float(total_len) if total_len else np.array([])
    entropy = float(-(p * np.log2(p)).sum()) if p.size else 0.0
    return {
        "count": count,
        "min_length": min_len,
        "max_length": max_len,
        "avg_length": total_len / count if count else 0.0,
        "entropy": entropy,
    }


def _levenshtein(a: str, b: str) -> int:
    """Plain Wagner-Fischer edit distance (unit costs) — matches
    DuckDB's levenshtein() exactly. Only ever called on the bounded
    candidate set the symmetric-delete blocking emits, never per
    corpus row."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def spell_pairs(ds: Dataset, text_col: str = "text", max_dist: int = 1) -> Dataset:
    """All vocabulary token pairs at edit distance 1..``max_dist``
    (typo/variant clustering — the spell-join primitive behind
    SymSpell-style cleanup of a training corpus's long-tail vocab).

    Exact-recall blocking via SYMMETRIC DELETES: every token emits
    every variant reachable by up to ``max_dist`` character deletions
    (itself included) as a bucket key; two tokens within edit distance
    d <= max_dist always share >= 1 such variant (Garbe's SymSpell
    invariant), so verifying candidates inside variant buckets loses
    nothing. The exchanges move the (variant, token) vocab table —
    bounded by vocab x C(token_len, max_dist), never by corpus rows
    (per-batch token dedup keeps the map output near-vocab-sized) —
    then one (a, b) dedup exchange collapses pairs found via multiple
    shared variants. Verification is the exact Wagner-Fischer DP on
    the tiny per-bucket candidate sets. Returns (a, b, d) with a < b
    and d the exact edit distance.
    """
    if max_dist not in (1, 2):
        raise ValueError("spell_pairs supports max_dist 1 or 2")

    def _variants(t: pa.Table) -> pa.Table:
        flat, _parents, _n = _flat_tokens(t[text_col])
        toks = np.unique(flat.to_numpy(zero_copy_only=False))
        out_v: list[str] = []
        out_t: list[str] = []
        for tok in toks:
            s = str(tok)
            vs = {s}
            dels1 = {s[:i] + s[i + 1 :] for i in range(len(s))}
            vs |= dels1
            if max_dist == 2:
                for d1 in dels1:
                    vs |= {d1[:i] + d1[i + 1 :] for i in range(len(d1))}
            out_v.extend(vs)
            out_t.extend([s] * len(vs))
        return pa.table(
            {"variant": pa.array(out_v, pa.string()), "t": pa.array(out_t, pa.string())}
        )

    def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = np.unique(df["t"].to_numpy())
        a_out: list[str] = []
        b_out: list[str] = []
        d_out: list[int] = []
        for i in range(len(toks)):
            for j in range(i + 1, len(toks)):
                d = _levenshtein(toks[i], toks[j])
                if 1 <= d <= max_dist:
                    a_out.append(toks[i])
                    b_out.append(toks[j])
                    d_out.append(d)
        return pd.DataFrame({"a": a_out, "b": b_out, "d": np.array(d_out, np.int64)})

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.iloc[:1][["a", "b", "d"]]

    pairs = (
        ds.map_batches(_variants, batch_format="pyarrow")
        .groupby("variant")
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["a", "b"]).map_groups(_dedup, batch_format="pandas")
