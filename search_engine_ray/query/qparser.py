"""Lucene-classic query-string parser (practical subset).

Turns `"text:vector AND join^2 -slow n_chars:[150 TO 300]"` into the
`Compound` AST the engine executes — the surface a Lucene/Elasticsearch
`query_string` user expects. Supported syntax:

- ``term`` / ``field:term`` — bare terms; the field defaults to
  ``default_field``; terms are run through the index analyzer (a unit
  that normalizes to several tokens becomes an AND group, to none is
  dropped)
- ``"a b c"`` / ``field:"a b"`` — quoted group: all tokens required
  together (AND semantics; positional phrase matching lives in
  query/phrase.py, which is not a Compound leaf)
- ``+term`` → must, ``-term`` / ``NOT term`` → must_not
- ``a AND b`` → both must; ``a OR b`` / bare juxtaposition → should
  with ``min_should_match=1`` (Lucene's default-OR behavior)
- ``term~`` / ``term~2`` → fuzzy (Levenshtein ≤ N, default 1)
- ``wild*card`` / ``wi?d`` → wildcard (auto-detected)
- ``/rege.xp/`` → regexp term (Lucene RegexpQuery syntax)
- ``term^2.5`` → per-clause boost (composes with fuzzy/wildcard)
- ``field:[10 TO 200]`` → numeric range on a docmap attribute
  (inclusive; ``*`` leaves a side open) — non-scoring, required (or
  excluding under ``-``/NOT)

Unsupported (raise ValueError): nested parentheses (the engine's
Compound is one boolean level), ``field:(...)`` grouping.
"""

from __future__ import annotations

import re

from search_engine_ray.query.qast import (
    Compound,
    Fuzzy,
    NumericRange,
    Regexp,
    Term,
    Wildcard,
)

# one lexical unit: optional +/-, optional field:, then a quoted
# string, a /regex/, a [range], or a bare token; optional ~N and ^B
_UNIT = re.compile(
    r"""
    (?P<sign>[+-])?
    (?:(?P<field>[A-Za-z_][\w.]*):)?
    (?:
        "(?P<quoted>[^"]*)"
      | /(?P<regex>(?:[^/\\]|\\.)*)/
      | \[(?P<rlo>\*|-?[\d.]+)\s+TO\s+(?P<rhi>\*|-?[\d.]+)\]
      | (?P<bare>[^\s^~]+)
    )
    (?:~(?P<fuzz>\d*))?
    (?:\^(?P<boost>[\d.]+))?
    """,
    re.VERBOSE,
)

_OPS = {"AND", "OR", "NOT", "&&", "||", "!"}


def _tokenize(s: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        ch = s[i]
        if ch.isspace():
            i += 1
            continue
        if ch in "()":
            raise ValueError("parenthesized groups are not supported (Compound is one boolean level)")
        m = _UNIT.match(s, i)
        if not m or m.end() == i:
            raise ValueError(f"cannot parse query string at: {s[i:]!r}")
        out.append(m)
        i = m.end()
    return out


def parse_query_string(
    s: str,
    *,
    default_field: str,
    analyzer: str = "code",
    default_operator: str = "OR",
) -> Compound:
    """Parse a Lucene-style query string into a Compound (see module
    docstring). ``default_operator`` is Lucene's: "OR" (bare terms are
    optional, at least one must match) or "AND" (bare terms required)."""
    from search_engine_ray.analysis import get_analyzer

    an = get_analyzer(analyzer)
    if default_operator not in ("OR", "AND"):
        raise ValueError(f"default_operator must be OR or AND, got {default_operator!r}")

    must: list = []
    should: list = []
    must_not: list = []
    filt: list = []

    pending = None  # role forced by a preceding AND / OR / NOT
    prev_unit_role = None  # where the previous unit landed (for trailing AND)

    def _mk_leaves(m: re.Match) -> tuple[list, bool]:
        """One lexical unit -> (leaves, is_range)."""
        field = m["field"] or default_field
        boost = float(m["boost"]) if m["boost"] else 1.0
        if m["rlo"] is not None:
            lo = None if m["rlo"] == "*" else float(m["rlo"])
            hi = None if m["rhi"] == "*" else float(m["rhi"])
            return [NumericRange(field, lo, hi)], True
        if m["regex"] is not None:
            return [Regexp(field, m["regex"].replace("\\/", "/"), boost=boost)], False
        if m["quoted"] is not None:
            toks = an.analyze(m["quoted"])
            return [Term(field, t, boost=boost) for t in toks], False
        raw = m["bare"]
        if m["fuzz"] is not None:
            toks = an.analyze(raw)
            k = int(m["fuzz"]) if m["fuzz"] else 1
            return [Fuzzy(field, t, max_edits=k, boost=boost) for t in toks], False
        if "*" in raw or "?" in raw:
            # wildcard patterns bypass the analyzer apart from casing
            return [Wildcard(field, raw.lower(), boost=boost)], False
        toks = an.analyze(raw)
        return [Term(field, t, boost=boost) for t in toks], False

    units = _tokenize(s)
    i = 0
    while i < len(units):
        m = units[i]
        word = m.group(0)
        if m["field"] is None and m["bare"] is not None and word in _OPS:
            op = {"&&": "AND", "||": "OR", "!": "NOT"}.get(word, word)
            if op == "NOT":
                pending = "not"
            elif op == "AND":
                # promote the PREVIOUS unit to must (Lucene: a AND b
                # requires both) unless it was negated
                if prev_unit_role == "should" and should:
                    must.append(should.pop())
                elif prev_unit_role == "filter_should" and filt:
                    pass  # ranges are already required
                pending = "must"
            else:  # OR
                pending = "should"
            i += 1
            continue
        sign = m["sign"]
        leaves, is_range = _mk_leaves(m)
        if sign == "-" or pending == "not":
            role = "not"
        elif sign == "+" or pending == "must" or default_operator == "AND":
            role = "must"
        else:
            role = "should"
        for lf in leaves:
            if is_range:
                if role == "not":
                    must_not.append(lf)
                else:
                    filt.append(lf)  # ranges are non-scoring: filter
            elif role == "not":
                must_not.append(lf)
            elif role == "must" or len(leaves) > 1:
                # multi-token units (quoted groups / analyzed splits)
                # require all their tokens together
                must.append(lf)
            else:
                should.append(lf)
        if is_range:
            prev_unit_role = "filter_should" if role != "not" else "not"
        else:
            prev_unit_role = role if role != "should" or len(leaves) > 1 else "should"
        pending = None
        i += 1
    return Compound(
        must=tuple(must),
        should=tuple(should),
        min_should_match=1 if should else 0,
        must_not=tuple(must_not),
        filter=tuple(filt),
    )
