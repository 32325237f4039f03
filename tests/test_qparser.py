"""Query-string parser: string -> Compound AST, and end-to-end
equivalence with the hand-built query through the engine."""

import pytest

from search_engine_ray.query import (
    Compound,
    Fuzzy,
    NumericRange,
    Regexp,
    SearchEngine,
    Term,
    Wildcard,
)
from search_engine_ray.query.qparser import parse_query_string


def P(s, **kw):
    kw.setdefault("default_field", "content")
    return parse_query_string(s, **kw)


def test_bare_terms_default_or():
    q = P("wand bm25")
    assert q == Compound(
        should=(Term("content", "wand"), Term("content", "bm25")), min_should_match=1
    )


def test_default_operator_and():
    q = P("wand bm25", default_operator="AND")
    assert q == Compound(must=(Term("content", "wand"), Term("content", "bm25")))


def test_and_or_not_plus_minus():
    q = P("wand AND bm25 -scorer NOT heap")
    assert q.must == (Term("content", "wand"), Term("content", "bm25"))
    assert q.must_not == (Term("content", "scorer"), Term("content", "heap"))
    q2 = P("+wand bm25")
    assert q2.must == (Term("content", "wand"),)
    assert q2.should == (Term("content", "bm25"),)
    assert q2.min_should_match == 1


def test_field_boost_fuzzy_wildcard_regex():
    q = P("path:tok* content:wand^2.5 merge~2 /b.25/")
    assert q.should == (
        Wildcard("path", "tok*"),
        Term("content", "wand", boost=2.5),
        Fuzzy("content", "merge", max_edits=2),
        Regexp("content", "b.25"),
    )


def test_quoted_group_requires_all_tokens():
    q = P('"inverted index" OR wand')
    assert q.must == (Term("content", "inverted"), Term("content", "index"))
    assert q.should == (Term("content", "wand"),)


def test_numeric_range_and_negated_range():
    q = P("wand n_chars:[100 TO 300] -n_bytes:[* TO 10]")
    assert q.filter == (NumericRange("n_chars", 100.0, 300.0),)
    assert q.must_not == (NumericRange("n_bytes", None, 10.0),)
    assert q.should == (Term("content", "wand"),)


def test_parse_errors():
    with pytest.raises(ValueError):
        P("(a OR b) AND c")
    with pytest.raises(ValueError):
        P("wand", default_operator="XOR")


def test_end_to_end_equivalence(tiny_index):
    """A parsed string scores identically to the hand-built query."""
    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    pairs = [
        (
            "import AND tokenizer -wand",
            Compound(
                must=(Term("content", "import"), Term("content", "tokenizer")),
                must_not=(Term("content", "wand"),),
            ),
        ),
        (
            "wand^3 OR bm25",
            Compound(
                should=(Term("content", "wand", boost=3.0), Term("content", "bm25")),
                min_should_match=1,
            ),
        ),
        (
            "path:tok* import",
            Compound(
                should=(Wildcard("path", "tok*"), Term("content", "import")),
                min_should_match=1,
            ),
        ),
    ]
    for s, expect in pairs:
        q = P(s)
        assert q == expect
        a = eng.search(q, k=10, with_metadata=False)
        b = eng.search(expect, k=10, with_metadata=False)
        assert a.total == b.total > 0
        assert a.hits["doc_id"].tolist() == b.hits["doc_id"].tolist()
        assert a.hits["score"].tolist() == b.hits["score"].tolist()
