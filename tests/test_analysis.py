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
