"""Query AST + planner.

Mirrors the reference's query surface (SURVEY.md S1-S3, S7, S8):

- ``Term(field, token)``   — `$search.text` single term
- ``Prefix(field, prefix)``— `$search.autocomplete` (edge-n-gram match)
- ``Compound(must, should, min_should_match)`` — Atlas `compound`
  (search_utils.py:126-152): every must clause is required; at least
  ``min_should_match`` should clauses must match; the score is the sum
  of ALL matching clauses' BM25 scores (Lucene BooleanQuery
  sum-of-matching-clauses).
- ``const_score`` on a clause — constant-score boost clause (S6,
  search_utils.py:168-171): a matching doc adds the constant instead
  of a BM25 score.

``plan_keyword`` is the reference's keyword-length dispatch (S8,
search_utils.py:75-76,123-124): a single-token keyword becomes an
autocomplete OR over the prefix fields with minimumShouldMatch=1; a
multi-token keyword becomes a text-AND over the primary field.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from search_engine_ray.analysis import normalize_query


@dataclass(frozen=True)
class Term:
    field: str
    token: str
    const_score: float | None = None  # S6: fixed score contribution
    # Lucene per-clause boost (BoostQuery): multiplies the clause's
    # score contribution. BM25 is linear in idf, so the engine folds
    # the boost into the resolved idf (and into const_score for
    # constant-score clauses) — zero cost in the scoring core and
    # transparent to WAND bounds.
    boost: float = 1.0


@dataclass(frozen=True)
class Prefix:
    field: str
    prefix: str
    const_score: float | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Phonetic:
    """S9 sounds-like: matches docs whose field contains a token with
    the same soundex key (reference metaphone.py, dormant)."""

    field: str
    token: str
    const_score: float | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Fuzzy:
    """S10 fuzzy term (Lucene FuzzyQuery semantics): matches docs
    containing any indexed token within `max_edits` Levenshtein edits
    of `token` (distance 0, the exact term, included). Resolved by a
    dictionary expansion + multi-term rewrite — each expanded term
    scores with its OWN idf and per-doc contributions sum, exactly
    like the Prefix range-scan path."""

    field: str
    token: str
    max_edits: int = 1
    const_score: float | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Synonyms:
    """S13 synonym set (Lucene SynonymQuery semantics): the tokens
    score as ONE pseudo-term — per-doc tf is the SUM over the set,
    idf comes from the MAX per-token df — so a doc saying "fast" twice
    and "quick" once scores exactly like one saying "fast" three
    times. Distinct from a should-OR rewrite, which would sum k
    separate BM25 clauses and over-weight docs that use several
    synonyms."""

    field: str
    tokens: tuple[str, ...]
    const_score: float | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class CrossFields:
    """S15 cross-field blended term (Lucene BlendedTermQuery combined
    through DisjunctionMaxQuery — the engine behind Elasticsearch
    ``multi_match type=cross_fields``): one term looked up in several
    fields as if they were one logical field. The document frequency
    is BLENDED across the fields — df = min(sum of per-field dfs, N) —
    so a term that is rare in one field but common in another cannot
    masquerade as globally rare; each field still scores BM25 with its
    OWN length normalization (and the shared blended idf); the per-doc
    combine is DisMax: best field + tie_breaker * (sum of the rest).
    tie_breaker=1.0 degrades to a plain sum, 0.0 to a pure max."""

    fields: tuple[str, ...]
    token: str
    tie_breaker: float = 0.0
    const_score: float | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class BestFields:
    """ES ``multi_match type=best_fields`` (Lucene
    DisjunctionMaxQuery over per-field TermQuery): one term looked up
    in several fields, each field scoring BM25 with its OWN df/idf AND
    its own length norm — unlike CrossFields, whose df is blended
    across fields. The per-doc combine is the same DisMax:
    best field + tie_breaker * (sum of the rest). Use when fields are
    independent descriptions of the doc (title vs body) rather than
    parts of one logical field (first vs last name)."""

    fields: tuple[str, ...]
    token: str
    tie_breaker: float = 0.0
    const_score: float | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard:
    """Lucene WildcardQuery: ``*`` matches any run of characters,
    ``?`` exactly one. Resolved by a dictionary expansion (the literal
    prefix before the first wildcard bounds the range scan; survivors
    are regex-filtered) + multi-term rewrite — each expanded term
    scores with its OWN idf and per-doc contributions sum, exactly
    like the Prefix range-scan and Fuzzy paths."""

    field: str
    pattern: str
    const_score: float | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Regexp:
    """Lucene RegexpQuery: ``pattern`` is a full-token-anchored regular
    expression matched against the field's term dictionary; the same
    prefix-bounded range scan + multi-term rewrite as Wildcard (a
    literal prefix in the pattern bounds the scan)."""

    field: str
    pattern: str
    const_score: float | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class NumericRange:
    """Atlas $search `range` operator (Lucene PointRangeQuery): matches
    docs whose NUMERIC stored field lies in [lo, hi] (inclusive; None
    leaves that side open). Non-scoring — allowed in ``filter`` /
    ``must`` (required) and ``must_not`` (excluding) clause sets, and
    lowered at plan time onto the docmap predicate (FilterSpec), so it
    costs one vectorized compare per bucket instead of a postings
    scan. A query whose only clauses are ranges degrades to a
    match-all scan over the docmap with the range as its predicate."""

    field: str
    lo: float | None = None
    hi: float | None = None


@dataclass(frozen=True)
class MatchAll:
    """ES match_all: every live (non-tombstoned) doc matches with
    score 0. Pass in place of a Compound to `search()` — with
    filter_spec / facets / stats / sort_by it is the browse/listing
    page over the index (the reference's no-keyword product listing)."""


Leaf = Term | Prefix | Phonetic | Fuzzy | Synonyms | CrossFields | BestFields | Wildcard | Regexp | NumericRange


@dataclass(frozen=True)
class Compound:
    """Atlas/Lucene BooleanQuery clause sets:

    - ``must``: required, scoring (Lucene MUST)
    - ``should``: optional, scoring; at least ``min_should_match`` must
      match — and if there are no must/filter clauses at all, at least
      one should clause must (Lucene's implicit rule)
    - ``filter``: required, NON-scoring (Lucene FILTER / Atlas
      compound.filter) — a matching doc gains 0 score from it
    - ``must_not``: excluding, non-scoring (Lucene MUST_NOT / Atlas
      compound.mustNot); a purely negative query matches nothing
    """

    must: tuple[Leaf, ...] = ()
    should: tuple[Leaf, ...] = ()
    min_should_match: int = 0
    must_not: tuple[Leaf, ...] = ()
    filter: tuple[Leaf, ...] = ()
    # ES terms_set `minimum_should_match_field`: the required should
    # count comes PER DOC from this docmap column instead of the fixed
    # min_should_match. msm_map (the `minimum_should_match_script`
    # analog) optionally transforms the raw column values into the
    # required count (e.g. lambda v: np.minimum(3, 1 + v // 300));
    # it must be a pure vectorized ndarray -> ndarray function.
    msm_field: str | None = None
    msm_map: object | None = None

    @property
    def leaves(self) -> tuple[Leaf, ...]:
        return self.must + self.should + self.filter + self.must_not


def plan_keyword(
    keyword: str,
    *,
    text_field: str,
    prefix_fields: tuple[str, ...] = (),
    min_should_match: int = 1,
) -> Compound:
    """Reference S8 dispatch: normalize (S7) then branch on term count."""
    tokens = normalize_query(keyword)
    if not tokens:
        return Compound()
    if len(tokens) == 1 and prefix_fields:
        # 1-term -> autocomplete-OR over the prefix fields (mSM=1)
        tok = tokens[0]
        return Compound(
            should=tuple(Prefix(f, tok) for f in prefix_fields),
            min_should_match=min_should_match,
        )
    # multi-term -> text-AND on the primary field
    return Compound(must=tuple(Term(text_field, t) for t in tokens))
