"""Text-analysis operators for training-data pipelines (task brief:
language-ID, quality scoring, token counting, fingerprinting) over a
`documents(doc_id, text, ...)`-shaped table.

All are map_batches transforms; per-row work is C-speed (compiled
regex / hashlib / numpy); no state, so plain task pools suffice.
Where an op is SQL-expressible its DuckDB oracle lives in
__ray_entry__.oracle_sql() and the formulas here are written to match
the SQL exactly (same tokenizer regex, same rounding).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from search_engine_ray.analysis import TOKEN_RE

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


def add_token_stats(ds: Dataset, text_col: str = "text") -> Dataset:
    """Append n_tokens:int64, n_uniq_tokens:int64, fingerprint:string
    (md5 of the normalized token join — SQL-parity fingerprint;
    reference-analog of content_sha256 row identity)."""

    def _f(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        n_tok = np.empty(len(texts), dtype=np.int64)
        n_uniq = np.empty(len(texts), dtype=np.int64)
        fps = []
        for i, s in enumerate(texts):
            toks = TOKEN_RE.findall((s or "").lower())
            n_tok[i] = len(toks)
            n_uniq[i] = len(set(toks))
            fps.append(hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest())
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
        alpha_ratio = alpha chars / chars
        len_score   = least(n_tokens, 200) / 200
        quality     = round(0.4*uniq_ratio + 0.3*alpha_ratio
                            + 0.3*len_score, 4)

    Empty text scores 0."""

    def _f(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        out = np.zeros(len(texts), dtype=np.float64)
        for i, s in enumerate(texts):
            s = s or ""
            toks = TOKEN_RE.findall(s.lower())
            if not toks or not s:
                continue
            uniq_ratio = len(set(toks)) / len(toks)
            alpha = sum(1 for ch in s if ch.isalpha())
            alpha_ratio = alpha / len(s)
            len_score = min(len(toks), 200) / 200.0
            out[i] = round(0.4 * uniq_ratio + 0.3 * alpha_ratio + 0.3 * len_score, 4)
        return t.append_column("quality", pa.array(out, pa.float64()))

    return ds.map_batches(_f, batch_format="pyarrow")


def add_lang_id(ds: Dataset, text_col: str = "text") -> Dataset:
    """Stopword-profile language ID (deterministic heuristic): CJK
    codepoints -> zh; otherwise the language whose marker-stopword
    hit-count is highest (ties broken by language code; 'und' when no
    marker hits). Not SQL-expressible -> rows-only driver check."""
    profiles = sorted((k, v) for k, v in _LANG_MARKERS.items() if v)

    def _f(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        langs = []
        for s in texts:
            s = s or ""
            if any("一" <= ch <= "鿿" for ch in s[:2000]):
                langs.append("zh")
                continue
            toks = TOKEN_RE.findall(s.lower())
            best, best_hits = "und", 0
            for code, markers in profiles:
                hits = sum(1 for tk in toks if tk in markers)
                if hits > best_hits:
                    best, best_hits = code, hits
            langs.append(best)
        return t.append_column("lang_id", pa.array(langs, pa.string()))

    return ds.map_batches(_f, batch_format="pyarrow")


def add_rolling_fingerprint(ds: Dataset, text_col: str = "text", window: int = 5) -> Dataset:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hash
    over the token stream, keep the minimum hash per window -> a
    64-bit doc fingerprint (min of window minima). Deterministic;
    rows-only driver check (no SQL analog)."""
    B = np.uint64(1_000_003)

    def _f(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, s in enumerate(texts):
            toks = TOKEN_RE.findall((s or "").lower())
            if not toks:
                continue
            th = np.array(
                [int.from_bytes(hashlib.md5(tk.encode()).digest()[:8], "big") for tk in toks],
                dtype=np.uint64,
            )
            if th.size < window:
                out[i] = th.min()
                continue
            # rolling polynomial hash over each window of `window` tokens
            h = np.zeros(th.size - window + 1, dtype=np.uint64)
            for j in range(window):
                h = h * B + th[j : j + h.size]
            out[i] = h.min()
        return t.append_column("rolling_fp", pa.array(out.astype(np.int64), pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow")


def explode_tokens(ds: Dataset, text_col: str, keep: list[str]) -> Dataset:
    """doc -> one row per token (R10 flat-map analog; the build-side
    posting explosion re-used as a user-facing op)."""

    def _f(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        toks: list[str] = []
        parents: list[int] = []
        for i, s in enumerate(texts):
            ts = TOKEN_RE.findall((s or "").lower())
            toks.extend(ts)
            parents.extend([i] * len(ts))
        out = t.select(keep).take(pa.array(parents, pa.int64()))
        return out.append_column("token", pa.array(toks, pa.string()))

    return ds.map_batches(_f, batch_format="pyarrow")
