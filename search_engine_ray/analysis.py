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
    two forms agree. `stop` is dropped at BOTH index and query time.
    `stem` names an optional stemming filter applied AFTER the stop
    filter (currently "s", the Harman S-stemmer); the same filter must
    run on query tokens (Analyzer.analyze does) or terms miss."""

    name: str
    token_pattern: str
    split_pattern: str
    stop: frozenset
    stem: str | None = None

    def tokens(self, text: str) -> list[str]:
        return re.findall(self.token_pattern, (text or "").lower())

    def analyze(self, text: str) -> list[str]:
        out = [t for t in self.tokens(text) if t not in self.stop]
        if self.stem == "s":
            out = [s_stem(t) for t in out]
        return out


def s_stem(token: str) -> str:
    """Harman (1991) S-stemmer — the conservative plural folder Lucene
    ships as EnglishMinimalStemFilter's sibling: exactly one of three
    suffix rules applies (first match), tokens shorter than 3 chars
    pass through, and the guards keep 'us'/'ss' words ('corpus',
    'class') and vowel+es forms intact.

    - ...ies -> ...y   (unless ...eies / ...aies)
    - ...es  -> ...e   (unless ...aes / ...ees / ...oes)
    - ...s   -> ...    (unless ...us / ...ss)
    """
    if len(token) < 3:
        return token
    if token.endswith("ies"):
        if not token.endswith(("eies", "aies")):
            return token[:-3] + "y"
        return token
    if token.endswith("es"):
        if not token.endswith(("aes", "ees", "oes")):
            return token[:-1]
        return token
    if token.endswith("s") and not token.endswith(("us", "ss")):
        return token[:-1]
    return token


def s_stem_array(flat):
    """Vectorized s_stem over an Arrow StringArray (the index-build
    hot path) — three ends_with masks + negative-index slices, no
    Python per token. Must stay in lockstep with s_stem (pinned by
    the analyzer-parity tests)."""
    import pyarrow.compute as pc

    ge3 = pc.greater_equal(pc.utf8_length(flat), 3)

    def _ends(*sufs):
        m = pc.ends_with(flat, sufs[0])
        for s in sufs[1:]:
            m = pc.or_(m, pc.ends_with(flat, s))
        return m

    # rule selection is on the RAW suffix (a guarded 'ies'/'es' word
    # returns unchanged, it does NOT fall through to the next rule —
    # same as s_stem's early returns)
    m_ies = pc.and_(ge3, _ends("ies"))
    a_ies = pc.and_(m_ies, pc.invert(_ends("eies", "aies")))
    m_es = pc.and_(ge3, _ends("es"))
    a_es = pc.and_(m_es, pc.invert(_ends("aes", "ees", "oes")))
    a_s = pc.and_(ge3, pc.and_(_ends("s"), pc.invert(_ends("us", "ss"))))
    drop3y = pc.binary_join_element_wise(pc.utf8_slice_codeunits(flat, 0, -3), "y", "")
    drop1 = pc.utf8_slice_codeunits(flat, 0, -1)
    return pc.if_else(
        a_ies,
        drop3y,
        pc.if_else(
            m_ies,
            flat,
            pc.if_else(a_es, drop1, pc.if_else(m_es, flat, pc.if_else(a_s, drop1, flat))),
        ),
    )


# DuckDB expression computing s_stem({t}) — oracle parity; MUST stay
# in lockstep with s_stem (same rule order and guards)
DUCKDB_S_STEM = (
    "(CASE WHEN len({t}) >= 3 AND {t} LIKE '%ies' "
    "AND {t} NOT LIKE '%eies' AND {t} NOT LIKE '%aies' "
    "THEN substr({t}, 1, len({t}) - 3) || 'y' "
    "WHEN len({t}) >= 3 AND {t} LIKE '%ies' THEN {t} "
    "WHEN len({t}) >= 3 AND {t} LIKE '%es' "
    "AND {t} NOT LIKE '%aes' AND {t} NOT LIKE '%ees' AND {t} NOT LIKE '%oes' "
    "THEN substr({t}, 1, len({t}) - 1) "
    "WHEN len({t}) >= 3 AND {t} LIKE '%es' THEN {t} "
    "WHEN len({t}) >= 3 AND {t} LIKE '%s' "
    "AND {t} NOT LIKE '%us' AND {t} NOT LIKE '%ss' "
    "THEN substr({t}, 1, len({t}) - 1) ELSE {t} END)"
)


ANALYZERS: dict[str, Analyzer] = {
    # code-aware: keeps digits and underscores (identifiers whole)
    "code": Analyzer("code", r"[a-z0-9_]+", r"[^a-z0-9_]+", STOP_TOKENS),
    # letters-only (classic "simple" analyzer): digits/underscores split
    "simple": Analyzer("simple", r"[a-z]+", r"[^a-z]+", frozenset()),
    # code + S-stemmer: plural forms fold onto their singular term
    "code_stem": Analyzer("code_stem", r"[a-z0-9_]+", r"[^a-z0-9_]+", STOP_TOKENS, stem="s"),
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


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Unit-cost edit distance (insert / delete / substitute) —
    identical to DuckDB's ``levenshtein``, which the S10 fuzzy-match
    SQL oracles call. Two-row DP with an optional early exit: with a
    ``cap``, once a whole DP row exceeds it the true distance can only
    grow, so ``cap + 1`` is returned immediately (callers test
    ``<= cap``). Dictionary candidates are length-banded before this
    runs, so the DP only sees near-misses."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    if not la or not lb:
        return max(la, lb)
    prev = list(range(lb + 1))
    cur = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur[0] = i
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1]))
        if cap is not None and min(cur) > cap:
            return cap + 1
        prev, cur = cur, prev
    return prev[lb]


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


_VOWELS = frozenset("aeiou")


def metaphone(token: str) -> str:
    """Classic Metaphone (Lawrence Philips, 1990 — public algorithm,
    implemented from the published rule set): the phonetic key family
    the reference's dormant metaphone.py used (double-metaphone's
    predecessor). Index and query share this exact function, so
    self-consistency — not parity with any particular library — is
    what matters. Non-alpha tokens pass through unchanged."""
    t = token.lower()
    if not t or not t[0].isalpha():
        return t
    t = "".join(ch for ch in t if ch.isalpha())
    # initial-cluster transformations
    for pre, rep in (("ae", "e"), ("gn", "n"), ("kn", "n"), ("pn", "n"),
                     ("wr", "r"), ("wh", "w")):
        if t.startswith(pre):
            t = rep + t[len(pre):]
            break
    if t.startswith("x"):
        t = "s" + t[1:]
    out: list[str] = []
    i, n = 0, len(t)
    while i < n:
        c = t[i]
        # drop duplicate adjacent letters except c
        if i > 0 and c == t[i - 1] and c != "c":
            i += 1
            continue
        nxt = t[i + 1] if i + 1 < n else ""
        nxt2 = t[i + 2] if i + 2 < n else ""
        prev = t[i - 1] if i > 0 else ""
        if c in _VOWELS:
            if i == 0:
                out.append(c.upper())
        elif c == "b":
            if not (i == n - 1 and prev == "m"):  # -mb is silent b
                out.append("B")
        elif c == "c":
            if nxt == "i" and nxt2 == "a":  # -cia-
                out.append("X")
            elif nxt == "h":
                out.append("K" if prev == "s" else "X")  # sch -> k
            elif nxt in "iey":
                out.append("S")
            else:
                out.append("K")
        elif c == "d":
            if nxt == "g" and nxt2 in "eiy":
                out.append("J")
                i += 1  # the g is consumed by dge/dgi/dgy
            else:
                out.append("T")
        elif c == "g":
            if nxt == "h" and not (i + 2 < n and t[i + 2] in _VOWELS):
                pass  # -gh- not before vowel: silent
            elif nxt == "n":
                pass  # -gn(ed): silent
            elif nxt in "iey":
                out.append("J")
            else:
                out.append("K")
        elif c == "h":
            if prev in _VOWELS and nxt not in _VOWELS:
                pass  # vowel-h-consonant: silent
            elif prev in "csptg":
                pass  # handled by the preceding consonant's rule
            else:
                out.append("H")
        elif c == "k":
            if prev != "c":
                out.append("K")
        elif c == "p":
            out.append("F" if nxt == "h" else "P")
        elif c == "q":
            out.append("K")
        elif c == "s":
            if nxt == "h":
                out.append("X")
            elif nxt == "i" and nxt2 in "oa":  # -sio-, -sia-
                out.append("X")
            else:
                out.append("S")
        elif c == "t":
            if nxt == "i" and nxt2 in "oa":  # -tio-, -tia-
                out.append("X")
            elif nxt == "h":
                out.append("0")  # theta
            elif nxt == "c" and nxt2 == "h":
                pass  # -tch-: silent t
            else:
                out.append("T")
        elif c == "v":
            out.append("F")
        elif c == "w":
            if nxt in _VOWELS:
                out.append("W")
        elif c == "x":
            out.append("KS")
        elif c == "y":
            if nxt in _VOWELS:
                out.append("Y")
        elif c in "fjlmnr":
            out.append(c.upper())
        elif c == "z":
            out.append("S")
        i += 1
    return "".join(out)


# registry: FieldSpec.phonetic_algo selects the key function; index
# and query resolve through the same entry (SURVEY §2.5b analyzers)
PHONETIC_ALGOS: dict[str, "callable"] = {
    "soundex": soundex,
    "metaphone": metaphone,
}


def edge_ngrams(token: str, n_min: int, n_max: int) -> list[str]:
    """Edge n-grams for autocomplete (reference `$search.autocomplete`,
    edge-gram analyzer): prefixes of length n_min..min(n_max, len).
    The full token is NOT re-emitted here (it is already indexed in the
    field's exact-term namespace)."""
    hi = min(n_max, len(token))
    return [token[:n] for n in range(n_min, hi + 1)]
