"""Analyzers: tokenization, query normalization, edge-n-grams.

The same analyzer runs at index time and query time (parity requirement
— the reference applies its keyword normalizer on the query side only
because Lucene's `standard` analyzer handles the index side;
search_utils.py:62-71 + Atlas index definition, SURVEY.md S7).

Tokenizer: code-aware `[a-z0-9_]+` over lowercased text — splits on
every non-alphanumeric (so `foo.bar(baz)` -> `foo bar baz`), keeps
underscores (identifiers like `build_index` stay whole). Pure function,
no state, so the map_batches build stage can be a plain task pool.

Stop tokens mirror the reference's currency/measure stop list
(constants.py:15: `rs gm ml kg`) — dropped at BOTH index and query
time so scoring parity holds.

Query normalizer mirrors `get_filtered_rs_kg_keyword`
(search_utils.py:62-71): strip a leading bare-number quantity token
("5 kg parser" -> "parser") and the stop tokens anywhere.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"[a-z0-9_]+")
STOP_TOKENS = frozenset({"rs", "gm", "ml", "kg"})
# DuckDB-equivalent tokenizer expression, used by oracle_sql() parity
# queries; MUST stay in lockstep with TOKEN_RE.
DUCKDB_TOKENIZE = "regexp_extract_all(lower({col}), '[a-z0-9_]+')"


from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class Analyzer:
    """A named analyzer (SURVEY §2.5b pluggable-analyzer surface).
    `token_pattern` is the findall form (python side, oracle),
    `split_pattern` its complement (Arrow split_pattern_regex form,
    vectorized index side) — the analyzer-parity tests pin that the
    two forms agree. `stop` is dropped at BOTH index and query time."""

    name: str
    token_pattern: str
    split_pattern: str
    stop: frozenset

    def tokens(self, text: str) -> list[str]:
        return re.findall(self.token_pattern, (text or "").lower())

    def analyze(self, text: str) -> list[str]:
        return [t for t in self.tokens(text) if t not in self.stop]


ANALYZERS: dict[str, Analyzer] = {
    # code-aware: keeps digits and underscores (identifiers whole)
    "code": Analyzer("code", r"[a-z0-9_]+", r"[^a-z0-9_]+", STOP_TOKENS),
    # letters-only (classic "simple" analyzer): digits/underscores split
    "simple": Analyzer("simple", r"[a-z]+", r"[^a-z]+", frozenset()),
}


def get_analyzer(name: str) -> Analyzer:
    return ANALYZERS[name]


def tokenize(text: str) -> list[str]:
    """Lowercase + split on non-[a-z0-9_]; keeps stop tokens (raw)."""
    return TOKEN_RE.findall(text.lower())


def analyze(text: str) -> list[str]:
    """Index/query-side analysis: tokenize then drop stop tokens."""
    return [t for t in tokenize(text) if t not in STOP_TOKENS]


def normalize_query(keyword: str) -> list[str]:
    """Reference keyword normalizer (S7) + analysis.

    - drop pure-digit quantity tokens (the "5" in "5 kg sugar";
      generalizes search_utils.py:64-66 which strips the 2nd char when
      it is a space after a leading digit)
    - drop currency/measure stop tokens (`rs gm ml kg`)
    """
    out = []
    for tok in tokenize(keyword):
        if tok.isdigit():
            continue
        if tok in STOP_TOKENS:
            continue
        out.append(tok)
    return out


_SOUNDEX_CODES = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    "l": "4",
    **dict.fromkeys("mn", "5"),
    "r": "6",
}


def soundex(token: str) -> str:
    """Classic American Soundex (public algorithm) — the S9 phonetic
    sounds-like analyzer (the reference's double-metaphone field is
    fully commented out, metaphone.py:37-47; soundex gives the same
    capability without the unavailable dependency). Non-alpha tokens
    pass through unchanged."""
    t = token.lower()
    if not t or not t[0].isalpha():
        return t
    first = t[0]
    codes = []
    prev = _SOUNDEX_CODES.get(first, "")
    for ch in t[1:]:
        code = _SOUNDEX_CODES.get(ch, "")
        if code and code != prev:
            codes.append(code)
        if ch not in "hw":  # h/w do not reset the run
            prev = code
    return (first.upper() + "".join(codes) + "000")[:4]


def edge_ngrams(token: str, n_min: int, n_max: int) -> list[str]:
    """Edge n-grams for autocomplete (reference `$search.autocomplete`,
    edge-gram analyzer): prefixes of length n_min..min(n_max, len).
    The full token is NOT re-emitted here (it is already indexed in the
    field's exact-term namespace)."""
    hi = min(n_max, len(token))
    return [token[:n] for n in range(n_min, hi + 1)]
