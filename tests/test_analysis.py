from search_engine_ray.analysis import (
    analyze,
    edge_ngrams,
    normalize_query,
    tokenize,
)


def test_tokenize_code_aware():
    assert tokenize("def build_index(x): return x.foo-bar") == [
        "def",
        "build_index",
        "x",
        "return",
        "x",
        "foo",
        "bar",
    ]


def test_tokenize_lowercases():
    assert tokenize("DEF Build_Index") == ["def", "build_index"]


def test_analyze_drops_stop_tokens():
    # reference stop list rs/gm/ml/kg (constants.py:15)
    assert analyze("500 gm rice rs 20") == ["500", "rice", "20"]


def test_normalize_query_reference_cases():
    # search_utils.py:62-71 quantity/currency stripping
    assert normalize_query("5 kg parser") == ["parser"]
    assert normalize_query("rs config") == ["config"]
    assert normalize_query("cadbury dairy milk") == ["cadbury", "dairy", "milk"]
    assert normalize_query("") == []
    assert normalize_query("5 KG") == []


def test_edge_ngrams():
    assert edge_ngrams("token", 2, 8) == ["to", "tok", "toke", "token"]
    assert edge_ngrams("a", 2, 8) == []
    assert edge_ngrams("abcdefghij", 2, 4) == ["ab", "abc", "abcd"]


def test_index_and_query_analyzers_agree():
    text = "5 kg of Parser_Config RS 100"
    assert [t for t in analyze(text) if not t.isdigit() and t != "of"] == [
        t for t in normalize_query(text) if t != "of"
    ]


def test_analyzer_registry_pluggable(ray_session, tmp_path):
    """§2.5b: a different named analyzer changes index+query semantics
    in lockstep; engine stays rank-identical to the oracle."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.analysis import get_analyzer
    from search_engine_ray.config import IndexConfig
    from search_engine_ray.index import build_index
    from search_engine_ray.oracle import build_oracle, oracle_search
    from search_engine_ray.query import Compound, SearchEngine, Term

    simple = get_analyzer("simple")
    assert simple.analyze("foo_bar 42 baz") == ["foo", "bar", "baz"]  # splits _ and digits
    assert get_analyzer("code").analyze("foo_bar 42 baz") == ["foo_bar", "42", "baz"]

    t = pa.table(
        {
            "repo": ["o/r"] * 4,
            "path": [f"f{i}.py" for i in range(4)],
            "commit": ["c" * 40] * 4,
            "lang": ["python"] * 4,
            "content": ["foo_bar baz", "foo bar", "baz_foo", "nothing here"],
        }
    )
    cfg = IndexConfig(num_buckets=2, num_parts=2, analyzer="simple")
    out = str(tmp_path / "simple_idx")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    oix = build_oracle(t, cfg)
    # under "simple", foo_bar/baz_foo split: "foo" matches docs 0,1,2
    q = Compound(must=(Term("content", "foo"),))
    res = eng.search(q, k=10, with_metadata=False)
    ora = oracle_search(oix, q, k=10)
    assert res.total == ora.total == 3
    assert res.hits["doc_id"].tolist() == ora.hits["doc_id"].tolist()


# ---- property: vectorized (Arrow) tokenizer == python analyzer ------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=8))
def test_arrow_tokenizer_matches_python(texts):
    import pyarrow as pa

    from search_engine_ray.analysis import get_analyzer
    from search_engine_ray.config import IndexConfig
    from search_engine_ray.index.build import TokenizePartials

    tp = TokenizePartials(IndexConfig())
    an = get_analyzer("code")
    col = pa.array(texts, pa.string())
    toks, doc_ix, dls = tp._field_tokens(col, IndexConfig().fields[0])
    # reconstruct per-doc tokens from the flattened arrays
    got = [[] for _ in texts]
    for t, i in zip(toks.tolist(), doc_ix.tolist()):
        got[i].append(t)
    want = [an.analyze(s) for s in texts]
    assert got == want
    assert dls.tolist() == [len(w) for w in want]
