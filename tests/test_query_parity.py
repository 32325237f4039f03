"""Rank-parity: engine top-k ids AND BM25 scores vs the brute-force
oracle (north rule). Engine and oracle share scoring.py and accumulate
clause contributions in the same order, so scores must agree to 1e-9
and ranking must be identical including doc_id tie-breaks."""

import numpy as np
import pytest

from search_engine_ray.config import IndexConfig
from search_engine_ray.oracle import build_oracle, oracle_search
from search_engine_ray.query import (
    Compound,
    ConditionalAddBoost,
    DocAttrBoost,
    FilterSpec,
    Prefix,
    SearchEngine,
    Term,
    plan_keyword,
)

# the reference's query vocabulary mapped to code-corpus analogs
# (FIXTURES.md F2: "oil"/"milk"/"belt"/"rice" -> single terms,
# "cadbury dairy milk" -> multi-term AND, "tok" -> autocomplete)
QUERIES = [
    Compound(must=(Term("content", "import"),)),
    Compound(must=(Term("content", "tokenizer"),)),
    Compound(must=(Term("content", "build_index"), Term("content", "merge_shards"))),
    Compound(must=(Term("content", "inverted"), Term("content", "index"))),
    Compound(should=(Prefix("path", "tok"), Prefix("repo", "org1")), min_should_match=1),
    Compound(should=(Term("content", "wand"), Term("content", "bm25")), min_should_match=1),
    Compound(
        must=(Term("content", "def"),),
        should=(Term("content", "scorer"), Term("content", "heap")),
        min_should_match=0,
    ),
    Compound(must=(Term("content", "zzzzqqq"),)),  # zero-hit
    Compound(),  # empty query
]


@pytest.fixture(scope="module")
def oracle_ix(tiny_corpus):
    return build_oracle(tiny_corpus, IndexConfig(num_buckets=4, num_parts=4))


@pytest.fixture(scope="module")
def engine(tiny_index):
    out, cfg, _ = tiny_index
    return SearchEngine(out, cfg)


def assert_parity(res, ora, score_tol=1e-9):
    assert res.total == ora.total
    assert res.hits["doc_id"].tolist() == ora.hits["doc_id"].tolist()
    np.testing.assert_allclose(
        res.hits["score"].to_numpy(), ora.hits["score"].to_numpy(), rtol=0, atol=score_tol
    )


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_rank_parity(engine, oracle_ix, qi):
    q = QUERIES[qi]
    res = engine.search(q, k=10)
    ora = oracle_search(oracle_ix, q, k=10)
    assert_parity(res, ora)
    assert len(res.hits) <= 10  # reference shape check len(data) <= limit


def test_parity_with_filter(engine, oracle_ix):
    q = Compound(must=(Term("content", "import"),))
    fs = FilterSpec((("lang", "in", ("python", "go")),))
    res = engine.search(q, k=10, filter_spec=fs)
    ora = oracle_search(oracle_ix, q, k=10, filter_spec=fs)
    assert_parity(res, ora)
    assert res.total < engine.search(q, k=1).total


def test_parity_with_attr_boost(engine, oracle_ix):
    # S6 analog: lang == "rust" docs get +5 constant
    q = Compound(must=(Term("content", "def"),))
    boost = DocAttrBoost("lang", "rust", 5.0)
    res = engine.search(q, k=10, boosts=(boost,))
    ora = oracle_search(oracle_ix, q, k=10, boosts=(boost,))
    assert_parity(res, ora)


def test_parity_with_conditional_boost(engine, oracle_ix):
    # S5 analog: +10 for docs in a broadcast "in stock" id set
    rng = np.random.default_rng(3)
    stocked = np.sort(rng.choice(oracle_ix.doc_ids, size=80, replace=False))
    q = Compound(must=(Term("content", "import"),))
    boost = ConditionalAddBoost(stocked, 10.0)
    res = engine.search(q, k=10, boosts=(boost,))
    ora = oracle_search(oracle_ix, q, k=10, boosts=(boost,))
    assert_parity(res, ora)


def test_parity_pagination(engine, oracle_ix):
    # R12 skip/limit: page 2 must match the oracle's slice exactly
    q = Compound(must=(Term("content", "import"),))
    res = engine.search(q, k=5, skip=5)
    ora = oracle_search(oracle_ix, q, k=5, skip=5)
    assert_parity(res, ora)


def test_facet_counts(engine, oracle_ix):
    # R16: per-value counts over the full matched set
    q = Compound(must=(Term("content", "import"),))
    res = engine.search(q, k=3, facet_fields=("lang",))
    ora = oracle_search(oracle_ix, q, k=3, facet_fields=("lang",))
    assert res.facets["lang"] == ora.facets["lang"]
    assert sum(res.facets["lang"].values()) == res.total


def test_planner_dispatch(engine, oracle_ix):
    # S8: single token -> autocomplete OR; multi token -> AND
    q1 = plan_keyword("tok", text_field="content", prefix_fields=("path", "repo"))
    assert q1.should and not q1.must
    q2 = plan_keyword("5 kg build inverted index", text_field="content")
    assert q2.must and not q2.should
    for q in (q1, q2):
        assert_parity(engine.search(q, k=10), oracle_search(oracle_ix, q, k=10))


def test_metadata_attached(engine):
    res = engine.search(Compound(must=(Term("content", "import"),)), k=3)
    for col in ("repo", "path", "commit", "lang", "content_sha256"):
        assert col in res.hits.columns


def test_phonetic_sounds_like(ray_session, tmp_path):
    """S9: 'smith' finds 'smyth' via the soundex term namespace; engine
    matches the brute-force oracle."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.analysis import soundex
    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index
    from search_engine_ray.oracle import build_oracle, oracle_search
    from search_engine_ray.query.qast import Phonetic

    assert soundex("smith") == soundex("smyth") == "S530"
    assert soundex("robert") == soundex("rupert")
    assert soundex("smith") != soundex("lorenzo")

    t = pa.table(
        {
            "repo": ["o/r"] * 4,
            "path": [f"f{i}.py" for i in range(4)],
            "commit": ["c" * 40] * 4,
            "lang": ["python"] * 4,
            "content": ["mr smith here", "ms smyth there", "smithy forge", "lorenzo"],
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("content", "c", phonetic=True),
                FieldSpec("path", "p", ngram=True),
                FieldSpec("repo", "r", ngram=True)),
        num_buckets=2, num_parts=2,
    )
    out = str(tmp_path / "phon")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    q = Compound(must=(Phonetic("content", "smith"),))
    res = eng.search(q, k=10, with_metadata=True)
    ora = oracle_search(build_oracle(t, cfg), q, k=10)
    # smith, smyth AND smithy all map to S530 (trailing y adds no
    # code in classic soundex); lorenzo does not match
    assert res.total == ora.total == 3
    assert res.hits["doc_id"].tolist() == ora.hits["doc_id"].tolist()
    np.testing.assert_allclose(res.hits["score"].to_numpy(), ora.hits["score"].to_numpy(), atol=1e-9)


def test_duplicate_term_across_clauses(engine, oracle_ix):
    """Round-2 regression: the same token in must AND should must score
    BOTH clauses (term->leaf was a dict keyed by term, so the earlier
    clause's score and must-match bookkeeping were silently dropped —
    legitimate matches came back empty)."""
    q = Compound(
        must=(Term("content", "import"),),
        should=(Term("content", "import"),),
        min_should_match=0,
    )
    res = engine.search(q, k=10)
    ora = oracle_search(oracle_ix, q, k=10)
    assert res.total > 0
    assert_parity(res, ora)
    # the duplicated clause doubles every matched doc's score
    single = engine.search(Compound(must=(Term("content", "import"),)), k=10)
    assert res.total == single.total
    np.testing.assert_allclose(
        res.hits["score"].to_numpy(), 2 * single.hits["score"].to_numpy(), atol=1e-9
    )


def test_prefix_expansion_overlapping_term(engine):
    """A dictionary range-scan Prefix whose expansion includes another
    clause's exact term key: the must clause's bookkeeping must survive
    (round-1: must_cnt never reached n_must -> empty result)."""
    base = engine.search(Compound(must=(Term("content", "tokenizer"),)), k=10)
    assert base.total > 0
    q = Compound(
        must=(Term("content", "tokenizer"),),
        should=(Prefix("content", "token"),),  # range scan: content has no ngrams
        min_should_match=0,
    )
    res = engine.search(q, k=10)
    assert res.total == base.total  # same match set (should never restricts)
    # every matched doc gains the overlapping expansion's contribution
    merged = res.hits.merge(base.hits, on="doc_id", suffixes=("_dup", "_single"))
    assert (merged["score_dup"] > merged["score_single"]).all()


def test_phonetic_metaphone_algo(ray_session, tmp_path):
    """S9 with the classic-Metaphone key family (the reference's
    dormant metaphone.py lineage): 'nite' finds 'knight'; engine
    matches the brute-force oracle under the same algorithm."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.analysis import metaphone
    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index
    from search_engine_ray.oracle import build_oracle, oracle_search
    from search_engine_ray.query.qast import Phonetic

    assert metaphone("knight") == metaphone("night") == "NT"
    assert metaphone("phone") == metaphone("fone")
    assert metaphone("smith") != metaphone("lorenzo")

    t = pa.table(
        {
            "repo": ["o/r"] * 4,
            "path": [f"f{i}.py" for i in range(4)],
            "commit": ["c" * 40] * 4,
            "lang": ["python"] * 4,
            "content": ["the knight rides", "at night we code", "fone home", "lorenzo"],
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("content", "c", phonetic=True, phonetic_algo="metaphone"),),
        num_buckets=2,
        num_parts=2,
    )
    out = str(tmp_path / "mp")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    q = Compound(must=(Phonetic("content", "nite"),))
    res = eng.search(q, k=5, with_metadata=False)
    ora = oracle_search(build_oracle(t, cfg), q, k=5)
    assert res.total == 2  # knight + night
    assert_parity(res, ora)


def test_levenshtein_matches_duckdb():
    """The S10 edit distance must agree with DuckDB's `levenshtein`
    (the function the driver's fuzzy SQL oracle calls) on arbitrary
    token pairs, and the capped fast path must stay consistent."""
    import duckdb

    from search_engine_ray.analysis import levenshtein

    rng = np.random.default_rng(7)
    vocab = ["", "a", "vector", "vectr", "victor", "build_index",
             "merge_shards", "tokenizer", "tokeniser", "wand", "wind"]
    rand = [
        "".join(rng.choice(list("abcdez_01"), size=rng.integers(0, 9)))
        for _ in range(40)
    ]
    words = vocab + rand
    con = duckdb.connect()
    for a in words:
        for b in words:
            exp = con.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
            assert levenshtein(a, b) == exp, (a, b)
            for cap in (0, 1, 2):
                got = levenshtein(a, b, cap)
                assert (got <= cap) == (exp <= cap), (a, b, cap)
                if exp <= cap:
                    assert got == exp


def test_fuzzy_multi_term_rewrite(engine, oracle_ix, tiny_corpus):
    """S10: Fuzzy('content', tok, 1) must equal the explicit multi-term
    rewrite — a should-OR of every corpus token within 1 edit, each
    scoring with its own idf (the exact semantics the s10_fuzzy SQL
    oracle encodes)."""
    from search_engine_ray.analysis import analyze, levenshtein
    from search_engine_ray.oracle import oracle_search
    from search_engine_ray.query import Fuzzy

    vocab = set()
    for s in tiny_corpus["content"].to_pylist():
        vocab.update(analyze(s or ""))

    for tok, k in (("tokenzer", 1), ("wnd", 1), ("mergeshards", 2)):
        exp_terms = sorted(t for t in vocab if levenshtein(t, tok, k) <= k)
        assert exp_terms, tok  # the test is vacuous if nothing expands
        got = engine._expand_fuzzy(Fuzzy("content", tok, max_edits=k))
        assert got == [f"c:{t}" for t in exp_terms]
        res = engine.search(Compound(must=(Fuzzy("content", tok, max_edits=k),)), k=10)
        rewrite = Compound(
            should=tuple(Term("content", t) for t in exp_terms), min_should_match=1
        )
        ora = oracle_search(oracle_ix, rewrite, k=10)
        assert_parity(res, ora)


def test_fuzzy_zero_expansion(engine):
    """A fuzzy token nothing comes close to matches no docs."""
    from search_engine_ray.query import Fuzzy

    res = engine.search(Compound(must=(Fuzzy("content", "qqqqzzzz"),)), k=10)
    assert res.total == 0 and len(res.hits) == 0


def test_synonyms_blended_scoring(engine, oracle_ix, tiny_corpus):
    """S13 SynonymQuery: tf sums over the set, idf from the max
    per-token df — engine matches the oracle, and the blend is NOT an
    OR-rewrite (docs holding several synonyms score as one term)."""
    from search_engine_ray.query import Synonyms

    q = Compound(must=(Synonyms("content", ("wand", "bm25")),))
    res = engine.search(q, k=10)
    ora = oracle_search(oracle_ix, q, k=10)
    assert res.total > 0
    assert_parity(res, ora)
    # same match set as the OR rewrite, different scores on docs
    # containing BOTH synonyms
    orq = Compound(
        should=(Term("content", "wand"), Term("content", "bm25")), min_should_match=1
    )
    assert res.total == engine.search(orq, k=1).total
    # a blend inside a compound with another must clause
    q2 = Compound(must=(Synonyms("content", ("wand", "bm25")), Term("content", "def")))
    assert_parity(engine.search(q2, k=10), oracle_search(oracle_ix, q2, k=10))
    # missing synonym tokens are dropped; all-missing must -> no match
    q3 = Compound(must=(Synonyms("content", ("zzzqqq1", "zzzqqq2")),))
    assert engine.search(q3, k=5).total == 0


def test_crossfields_blended_dismax(ray_session, tmp_path):
    """S15 cross-field blended term (Lucene BlendedTermQuery + DisMax,
    ES multi_match cross_fields): blended df = min(sum per-field dfs,
    N), per-field length norms, per-doc combine best + tie*(rest)."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index
    from search_engine_ray.oracle import build_oracle, oracle_search
    from search_engine_ray.query import scoring
    from search_engine_ray.query.qast import CrossFields

    t = pa.table(
        {
            "repo": ["o/r"] * 5,
            "path": [
                "alpha/beta.py",      # alpha in path only
                "gamma/one.py",
                "alpha/two.py",       # alpha in BOTH fields
                "delta/three.py",
                "alpha/alpha.py",     # alpha twice in path
            ],
            "commit": ["c" * 40] * 5,
            "lang": ["python"] * 5,
            "content": [
                "beta code here",
                "alpha appears in the body text",   # alpha in content only
                "alpha alpha repeated in body",     # alpha in BOTH fields
                "nothing relevant",
                "plain text",
            ],
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("content", "c"),
                FieldSpec("path", "p", ngram=True),
                FieldSpec("repo", "r", ngram=True)),
        num_buckets=2, num_parts=2,
    )
    out = str(tmp_path / "xf")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    oix = build_oracle(t, cfg)

    from search_engine_ray.index.build import doc_uid

    uid = {
        i: doc_uid(str(v) for v in (t["repo"][i].as_py(), t["path"][i].as_py()))
        for i in range(5)
    }

    for tie in (0.0, 0.3, 1.0):
        q = Compound(must=(CrossFields(("content", "path"), "alpha", tie_breaker=tie),))
        res = eng.search(q, k=10)
        ora = oracle_search(oix, q, k=10)
        assert res.total == 4  # docs 0, 1, 2, 4
        assert_parity(res, ora)

    # blended idf: df = min(df_content + df_path, N) = min(2+3, 5) = 5
    # (NOT the per-field 2 or 3) — pin by hand for the path-only doc 0:
    # tf=1 in path (dl=3 tokens: alpha, beta, py), content misses
    q = Compound(must=(CrossFields(("content", "path"), "alpha", tie_breaker=0.0),))
    res = eng.search(q, k=10)
    bidf = float(scoring.idf(5, 5))
    dl_path = np.array([3]); tf = np.array([1])
    avgdl_path = oix.avgdl["path"]
    exp0 = scoring.bm25_score(tf, dl_path, bidf, cfg.k1, cfg.b, avgdl_path)[0]
    got = dict(zip(res.hits["doc_id"].tolist(), res.hits["score"].tolist()))
    assert abs(got[uid[0]] - exp0) < 1e-9

    # dismax combine on the both-fields doc 2: tie=0 -> max of the two
    # field scores; tie=1 -> their sum
    r0 = eng.search(q, k=10)
    r1 = eng.search(
        Compound(must=(CrossFields(("content", "path"), "alpha", tie_breaker=1.0),)), k=10
    )
    s0 = dict(zip(r0.hits["doc_id"].tolist(), r0.hits["score"].tolist()))
    s1 = dict(zip(r1.hits["doc_id"].tolist(), r1.hits["score"].tolist()))
    assert s1[uid[2]] > s0[uid[2]]  # second field adds under tie=1
    assert abs(s1[uid[0]] - s0[uid[0]]) < 1e-12  # single-field docs unaffected

    # inside a compound with another clause + missing-token edge
    q2 = Compound(
        must=(CrossFields(("content", "path"), "alpha", 0.5), Term("content", "body")),
    )
    assert_parity(eng.search(q2, k=10), oracle_search(oix, q2, k=10))
    q3 = Compound(must=(CrossFields(("content", "path"), "zzzmissing"),))
    assert eng.search(q3, k=5).total == 0


def test_search_after_cursor(engine):
    """Deep pagination via search_after: walking k-sized pages with the
    (score, doc_id) cursor reproduces the full ranking exactly, totals
    stay full-set, and it agrees with skip/limit pagination."""
    import pandas as pd

    q = Compound(
        should=(Term("content", "import"), Term("content", "def")), min_should_match=1
    )
    probe = engine.search(q, k=1, with_metadata=False)
    assert probe.total > 10
    full = engine.search(q, k=probe.total, with_metadata=False)

    pages, cursor = [], None
    while True:
        r = engine.search(q, k=7, search_after=cursor, with_metadata=False)
        assert r.total == probe.total  # totals unaffected by the cursor
        if not len(r.hits):
            break
        pages.append(r.hits)
        cursor = (float(r.hits["score"].iloc[-1]), int(r.hits["doc_id"].iloc[-1]))
    walked = pd.concat(pages, ignore_index=True)
    assert walked["doc_id"].tolist() == full.hits["doc_id"].tolist()
    np.testing.assert_allclose(
        walked["score"].to_numpy(), full.hits["score"].to_numpy(), rtol=0, atol=0
    )

    # cursor page == the equivalent skip page
    p2_skip = engine.search(q, k=7, skip=7, with_metadata=False)
    c1 = (float(full.hits["score"].iloc[6]), int(full.hits["doc_id"].iloc[6]))
    p2_cur = engine.search(q, k=7, search_after=c1, with_metadata=False)
    assert p2_cur.hits["doc_id"].tolist() == p2_skip.hits["doc_id"].tolist()

    with pytest.raises(ValueError):
        engine.search(q, k=7, skip=7, search_after=c1)


def test_explain_clause_breakdown(engine, oracle_ix):
    """explain(): per-clause contributions sum exactly to search()'s
    score (same scoring core, same float op order); non-matching and
    unknown docs report matched=False."""
    q = Compound(
        must=(Term("content", "import"),),
        should=(Term("content", "def"), Term("content", "zzzzqqq")),
        min_should_match=0,
    )
    res = engine.search(q, k=5, with_metadata=False)
    top = int(res.hits["doc_id"].iloc[0])
    exp = engine.explain(q, top)
    assert exp["matched"] is True
    assert exp["score"] == pytest.approx(float(res.hits["score"].iloc[0]), abs=1e-12)
    assert sum(c["score"] for c in exp["clauses"]) == pytest.approx(exp["score"], abs=1e-12)
    assert [c["is_must"] for c in exp["clauses"]] == [True, False, False]
    assert exp["clauses"][0]["matched"]  # the must clause
    assert not exp["clauses"][2]["matched"]  # zzzzqqq matches nothing

    # boost accounting
    boost = ConditionalAddBoost(np.array([top], dtype=np.int64), 10.0)
    res_b = engine.search(q, k=5, boosts=(boost,), with_metadata=False)
    got_b = dict(zip(res_b.hits["doc_id"].tolist(), res_b.hits["score"].tolist()))
    exp_b = engine.explain(q, top, boosts=(boost,))
    assert exp_b["boosts"][0]["applied"] is True
    assert exp_b["score"] == pytest.approx(got_b[top], abs=1e-12)

    # a doc that fails the must clause
    only_def = engine.search(
        Compound(must=(Term("content", "def"),)), k=50, with_metadata=False
    )
    importers = set(engine.search(q, k=10_000, with_metadata=False).hits["doc_id"])
    non = [d for d in only_def.hits["doc_id"] if d not in importers]
    if non:
        e2 = engine.explain(q, int(non[0]))
        assert e2["matched"] is False and e2["score"] == 0.0
    # unknown doc id
    e3 = engine.explain(q, 1)
    assert e3["matched"] is False


def test_stats_aggregation(ray_session, tmp_path):
    """S16 metric aggregation: per-bucket (count,sum,min,max) partials
    over the FULL matched set merge to exact global stats; facets and
    the page ride the same pass."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index

    n = 40
    t = pa.table(
        {
            "repo": ["o/r"] * n,
            "path": [f"f{i}.py" for i in range(n)],
            "commit": ["c" * 40] * n,
            "lang": ["python" if i % 2 else "go" for i in range(n)],
            "size_kb": pa.array([10 + 3 * i for i in range(n)], pa.int64()),
            "content": [("alpha beta " if i % 4 else "beta only ") + f"doc{i}" for i in range(n)],
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("content", "c"),
                FieldSpec("path", "p", ngram=True),
                FieldSpec("repo", "r", ngram=True)),
        num_buckets=4, num_parts=2,
        docmap_cols=("lang", "size_kb", "content_sha256"),
    )
    out = str(tmp_path / "stats")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    r = eng.search(
        Compound(must=(Term("content", "alpha"),)),
        k=5, with_metadata=False, stat_fields=("size_kb",), facet_fields=("lang",),
    )
    matched = [i for i in range(n) if i % 4]  # docs containing "alpha"
    sizes = np.array([10 + 3 * i for i in matched], dtype=np.float64)
    assert r.total == len(matched)
    s = r.stats["size_kb"]
    assert s["count"] == len(matched)
    assert s["sum"] == sizes.sum()
    assert s["min"] == sizes.min() and s["max"] == sizes.max()
    assert s["avg"] == pytest.approx(sizes.mean())
    assert sum(r.facets["lang"].values()) == r.total
    # zero-match query -> empty stats dict
    r0 = eng.search(
        Compound(must=(Term("content", "zzzq"),)), k=5,
        with_metadata=False, stat_fields=("size_kb",),
    )
    assert r0.total == 0 and r0.stats == {}


def test_suggest_did_you_mean(ray_session, tmp_path):
    """S17 spelling suggestions: ranked by (distance, df desc, term);
    the exact token is excluded; phonetic/ngram namespaces never leak."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index

    t = pa.table(
        {
            "repo": ["o/r"] * 6,
            "path": [f"f{i}.py" for i in range(6)],
            "commit": ["c" * 40] * 6,
            "lang": ["python"] * 6,
            "content": [
                "vector vector vector",   # df(vector)=3 docs below
                "vector base",
                "vector victor",          # victor df=1, distance 2
                "vectors here",           # vectors distance 1
                "unrelated words",
                "vect short",             # vect distance 1 (deletion)
            ],
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("content", "c", phonetic=True),
                FieldSpec("path", "p", ngram=True),
                FieldSpec("repo", "r", ngram=True)),
        num_buckets=2, num_parts=2,
    )
    out = str(tmp_path / "sugg")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    got = eng.suggest("content", "vectr", max_edits=2, k=5)
    terms = [g["term"] for g in got]
    # distance 1: vector (df 3), vect (df 1); distance 2: vectors,
    # victor (df tie -> term asc)
    assert terms[:4] == ["vector", "vect", "vectors", "victor"]
    assert [g["distance"] for g in got[:4]] == [1, 1, 2, 2]
    assert got[0]["df"] == 3
    assert all(g["term"] != "vectr" for g in got)
    # exact token excluded even when indexed
    got2 = eng.suggest("content", "vector", max_edits=1, k=5)
    assert all(g["term"] != "vector" for g in got2)
    assert "vectors" in [g["term"] for g in got2]


def test_more_like_this(engine, oracle_ix, tiny_corpus):
    """S18 MLT: term selection = top tf*idf of the seed's analyzed
    tokens (df=0 terms dropped, ties by term); the returned Compound
    scores rank-identically to the oracle; the seed doc itself ranks
    first when it is in the corpus."""
    seed_text = tiny_corpus["content"][0].as_py()
    q = engine.mlt_query(seed_text, "content", max_terms=5)
    assert len(q.should) == 5 and not q.must and q.min_should_match == 1
    res = engine.search(q, k=10, with_metadata=False)
    ora = oracle_search(oracle_ix, q, k=10)
    assert_parity(res, ora)
    # the seed doc contains every selected term -> it must match
    from search_engine_ray.index.build import doc_uid

    seed_uid = doc_uid(
        str(v) for v in (tiny_corpus["repo"][0].as_py(), tiny_corpus["path"][0].as_py())
    )
    assert seed_uid in set(
        engine.search(q, k=res.total, with_metadata=False).hits["doc_id"]
    )
    # unknown-vocabulary seed -> empty query
    q0 = engine.mlt_query("zzzq qqqz xxxy", "content", max_terms=5)
    assert not q0.should


def test_const_score_multi_key_applies_once(engine, oracle_ix):
    """Review fix: a constant-score clause backed by SEVERAL keys
    (prefix expansion / synonym set / cross-fields) adds the constant
    ONCE per matching doc, not once per matching key — like the oracle
    and Lucene's ConstantScoreQuery."""
    from search_engine_ray.query import Synonyms

    # synonym-set const: docs containing BOTH tokens must still get +5
    q = Compound(
        must=(Term("content", "import"),),
        should=(Synonyms("content", ("wand", "bm25"), const_score=5.0),),
    )
    assert_parity(engine.search(q, k=10), oracle_search(oracle_ix, q, k=10))
    # prefix-expansion const (range-scan path, many expanded keys)
    q2 = Compound(
        must=(Term("content", "import"),),
        should=(Prefix("content", "tok", const_score=3.0),),
    )
    assert_parity(engine.search(q2, k=10), oracle_search(oracle_ix, q2, k=10))


def test_crossfields_const_score_once(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index
    from search_engine_ray.query.qast import CrossFields

    t = pa.table(
        {
            "repo": ["o/r"] * 3,
            "path": ["alpha/x.py", "beta/y.py", "alpha/z.py"],
            "commit": ["c" * 40] * 3,
            "lang": ["python"] * 3,
            "content": ["alpha body", "alpha only in content", "plain"],
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("content", "c"),
                FieldSpec("path", "p", ngram=True),
                FieldSpec("repo", "r", ngram=True)),
        num_buckets=2, num_parts=2,
    )
    out = str(tmp_path / "xfc")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    q = Compound(
        must=(Term("content", "alpha", const_score=1.0),),
        should=(CrossFields(("content", "path"), "alpha", const_score=2.0),),
    )
    res = eng.search(q, k=10, with_metadata=False)
    # doc 0 matches 'alpha' in BOTH fields yet gets the constant once:
    # every matching doc scores exactly 1 (must-const) + 2 (xf-const)
    assert res.total == 2
    assert res.hits["score"].tolist() == [3.0, 3.0]


# ---- round-2 wave 3: clause roles (mustNot/filter), boosts, patterns


def test_must_not_excludes(engine, oracle_ix):
    """Lucene MUST_NOT / Atlas compound.mustNot: docs matching the
    negative clause are excluded; the remaining docs' scores are
    untouched (the clause never contributes score)."""
    from search_engine_ray.query import Wildcard  # noqa: F401 (export check)

    base = engine.search(Compound(must=(Term("content", "import"),)), k=200)
    q = Compound(
        must=(Term("content", "import"),),
        must_not=(Term("content", "tokenizer"),),
    )
    res = engine.search(q, k=200)
    ora = oracle_search(oracle_ix, q, k=200)
    assert 0 < res.total < base.total
    assert_parity(res, ora)
    # surviving docs keep their exact base scores
    merged = res.hits.merge(base.hits, on="doc_id", suffixes=("_ex", "_base"))
    assert len(merged) == len(res.hits)
    np.testing.assert_allclose(
        merged["score_ex"].to_numpy(), merged["score_base"].to_numpy(), atol=0
    )
    # a mustNot token absent from the index is a no-op
    q2 = Compound(must=(Term("content", "import"),), must_not=(Term("content", "zzzqqq"),))
    res2 = engine.search(q2, k=200)
    assert res2.total == base.total
    assert_parity(res2, oracle_search(oracle_ix, q2, k=200))


def test_pure_negative_query_matches_nothing(engine, oracle_ix):
    q = Compound(must_not=(Term("content", "import"),))
    res = engine.search(q, k=10)
    ora = oracle_search(oracle_ix, q, k=10)
    assert res.total == 0 and len(res.hits) == 0
    assert ora.total == 0


def test_filter_clause_non_scoring(engine, oracle_ix):
    """Lucene FILTER / Atlas compound.filter: required match, zero
    score contribution — scores equal the same query WITHOUT the
    filter on the docs that pass it."""
    q = Compound(
        must=(Term("content", "import"),),
        filter=(Term("content", "tokenizer"),),
    )
    res = engine.search(q, k=200)
    ora = oracle_search(oracle_ix, q, k=200)
    assert res.total > 0
    assert_parity(res, ora)
    base = engine.search(Compound(must=(Term("content", "import"),)), k=200)
    merged = res.hits.merge(base.hits, on="doc_id", suffixes=("_f", "_b"))
    assert len(merged) == len(res.hits)
    np.testing.assert_allclose(merged["score_f"].to_numpy(), merged["score_b"].to_numpy(), atol=0)
    # filter-only query: matches the filter set, every score is 0,
    # page ordered by doc_id (Lucene constant-score-of-0 semantics)
    qf = Compound(filter=(Term("content", "tokenizer"),))
    rf = engine.search(qf, k=200)
    of = oracle_search(oracle_ix, qf, k=200)
    assert rf.total == of.total > 0
    assert rf.hits["doc_id"].tolist() == sorted(rf.hits["doc_id"].tolist())
    assert (rf.hits["score"] == 0).all()
    # filter + should with no must: should clauses stay OPTIONAL
    # (Lucene: at least one SHOULD required only when no MUST/FILTER)
    qs = Compound(
        filter=(Term("content", "tokenizer"),),
        should=(Term("content", "wand"),),
    )
    rs = engine.search(qs, k=200)
    os_ = oracle_search(oracle_ix, qs, k=200)
    assert rs.total == rf.total  # same match set as filter-only
    assert_parity(rs, os_)


def test_clause_boost(engine, oracle_ix):
    """Lucene BoostQuery: boost multiplies the clause's contribution;
    folded into the resolved idf so scoring stays one code path."""
    q1 = Compound(must=(Term("content", "import"),))
    q2 = Compound(must=(Term("content", "import", boost=2.5),))
    r1 = engine.search(q1, k=50)
    r2 = engine.search(q2, k=50)
    assert r1.total == r2.total
    assert_parity(r2, oracle_search(oracle_ix, q2, k=50))
    np.testing.assert_allclose(
        r2.hits["score"].to_numpy(), 2.5 * r1.hits["score"].to_numpy(), rtol=1e-12
    )
    # boost composes with const_score (constant itself is boosted)
    q3 = Compound(
        must=(Term("content", "import"),),
        should=(Term("content", "wand", const_score=4.0, boost=0.5),),
    )
    assert_parity(engine.search(q3, k=50), oracle_search(oracle_ix, q3, k=50))
    # boost on a blended synonym leaf
    from search_engine_ray.query import Synonyms

    q4 = Compound(must=(Synonyms("content", ("wand", "bm25"), boost=3.0),))
    assert_parity(engine.search(q4, k=50), oracle_search(oracle_ix, q4, k=50))


def test_wildcard_multi_term_rewrite(engine, oracle_ix, tiny_corpus):
    """Wildcard('content', pat): equals the explicit should-OR of every
    vocab token matching the glob, each with its own idf (Lucene
    WildcardQuery rewrite) — same contract as the Fuzzy test."""
    import fnmatch

    from search_engine_ray.analysis import analyze
    from search_engine_ray.query import Wildcard

    vocab = set()
    for s in tiny_corpus["content"].to_pylist():
        vocab.update(analyze(s or ""))

    for pat in ("tok*", "merge_*", "b?25", "*izer", "imp?rt"):
        exp_terms = sorted(t for t in vocab if fnmatch.fnmatchcase(t, pat))
        assert exp_terms, pat
        got = engine._expand_pattern(Wildcard("content", pat))
        assert got == [f"c:{t}" for t in exp_terms]
        res = engine.search(Compound(must=(Wildcard("content", pat),)), k=10)
        rewrite = Compound(
            should=tuple(Term("content", t) for t in exp_terms), min_should_match=1
        )
        assert_parity(res, oracle_search(oracle_ix, rewrite, k=10))
    # zero-expansion wildcard matches nothing
    r0 = engine.search(Compound(must=(Wildcard("content", "zzz*qqq"),)), k=10)
    assert r0.total == 0


def test_regexp_multi_term_rewrite(engine, oracle_ix, tiny_corpus):
    """Regexp('content', pat): full-token-anchored dictionary regex
    (Lucene RegexpQuery), multi-term rewrite like Wildcard."""
    import re

    from search_engine_ray.analysis import analyze
    from search_engine_ray.query import Regexp

    vocab = set()
    for s in tiny_corpus["content"].to_pylist():
        vocab.update(analyze(s or ""))

    for pat in ("токен|tokenizer", "bm25|wand", "merge_.*", "sc[oa]rer", "imports?"):
        rx = re.compile(f"(?:{pat})\\Z")
        exp_terms = sorted(t for t in vocab if rx.match(t))
        assert exp_terms, pat
        got = engine._expand_pattern(Regexp("content", pat))
        assert got == [f"c:{t}" for t in exp_terms]
        res = engine.search(Compound(must=(Regexp("content", pat),)), k=10)
        rewrite = Compound(
            should=tuple(Term("content", t) for t in exp_terms), min_should_match=1
        )
        assert_parity(res, oracle_search(oracle_ix, rewrite, k=10))


def test_roles_in_search_all_and_explain(engine, oracle_ix):
    """The Dataset path (search_all) and explain() share the role
    semantics: mustNot excludes, filter matches without scoring."""
    q = Compound(
        must=(Term("content", "import"),),
        must_not=(Term("content", "tokenizer"),),
        filter=(Term("content", "def"),),
    )
    res = engine.search(q, k=500)
    allds = engine.search_all(q).to_pandas()
    assert sorted(allds["doc_id"].tolist()) == sorted(res.hits["doc_id"].tolist()[: res.total])
    assert res.total == len(allds)
    ora = oracle_search(oracle_ix, q, k=500)
    assert_parity(res, ora)
    # explain: an excluded doc reports matched=False; a matched doc's
    # clause contributions sum to its search score
    exc = engine.search(
        Compound(must=(Term("content", "import"), Term("content", "tokenizer"), Term("content", "def"))),
        k=1,
    )
    if exc.total:
        ex = engine.explain(q, int(exc.hits["doc_id"].iloc[0]))
        assert ex["matched"] is False
    if res.total:
        did = int(res.hits["doc_id"].iloc[0])
        ex2 = engine.explain(q, did)
        assert ex2["matched"] is True
        s = sum(c["score"] for c in ex2["clauses"])
        assert abs(s - float(res.hits["score"].iloc[0])) < 1e-9
        occurs = [c["occur"] for c in ex2["clauses"]]
        assert occurs == ["must", "filter", "not"]  # _resolve clause order


def test_range_facets_and_sort_by_field(ray_session, tmp_path):
    """S23 range-facet aggregation + S24 sort-by-stored-field: banded
    counts over the full matched set; page ordered by a numeric docmap
    attribute (doc_id asc tiebreak) with BM25 scores still reported."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index

    n = 40
    t = pa.table(
        {
            "doc_id": list(range(n)),
            "text": ["alpha beta" if i % 2 == 0 else "alpha" for i in range(n)],
            # i//2: adjacent doc pairs share an n_chars value, so the
            # attribute sort exercises the doc_id tiebreak
            "n_chars": [50 + 10 * (i // 2) for i in range(n)],
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("text", "c"),),
        num_buckets=4, num_parts=2,
        docmap_cols=("n_chars",),
        id_cols=("doc_id",), use_native_id=True,
    )
    out = str(tmp_path / "rfsort")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    vals = np.array([50 + 10 * (i // 2) for i in range(n)])

    r = eng.search(
        Compound(must=(Term("text", "alpha"),)), k=5,
        range_facets={"n_chars": (0, 100, 200, 10000)}, with_metadata=False,
    )
    assert r.total == n
    exp = {
        "[0,100)": int(((vals >= 0) & (vals < 100)).sum()),
        "[100,200)": int(((vals >= 100) & (vals < 200)).sum()),
        "[200,10000)": int((vals >= 200).sum()),
    }
    assert r.facets["n_chars"] == {k2: v for k2, v in exp.items() if v}
    # values outside every band are uncounted
    r2 = eng.search(
        Compound(must=(Term("text", "alpha"),)), k=1,
        range_facets={"n_chars": (100, 200)}, with_metadata=False,
    )
    assert r2.facets["n_chars"] == {"[100,200)": exp["[100,200)"]}

    # sort by n_chars desc: highest attribute first, doc_id tiebreak
    rs = eng.search(
        Compound(must=(Term("text", "alpha"),)), k=5,
        sort_by=("n_chars", True), with_metadata=False,
    )
    assert rs.hits["doc_id"].tolist() == [38, 39, 36, 37, 34]
    assert rs.hits["sort_key"].tolist() == [240.0, 240.0, 230.0, 230.0, 220.0]
    ra = eng.search(
        Compound(must=(Term("text", "alpha"),)), k=3,
        sort_by=("n_chars", False), with_metadata=False,
    )
    assert ra.hits["doc_id"].tolist() == [0, 1, 2]
    # BM25 scores are still the scoring-pass scores
    base = eng.search(Compound(must=(Term("text", "alpha"),)), k=n, with_metadata=False)
    m = rs.hits.merge(base.hits, on="doc_id", suffixes=("_s", "_b"))
    assert len(m) == 5
    np.testing.assert_allclose(m["score_s"].to_numpy(), m["score_b"].to_numpy(), atol=0)
    # skip-paging under attribute sort
    rp = eng.search(
        Compound(must=(Term("text", "alpha"),)), k=3, skip=2,
        sort_by=("n_chars", True), with_metadata=False,
    )
    assert rp.hits["doc_id"].tolist() == [36, 37, 34]
    # guard: cursor + attribute sort are mutually exclusive
    with pytest.raises(ValueError):
        eng.search(
            Compound(must=(Term("text", "alpha"),)), k=3,
            search_after=(1.0, 5), sort_by=("n_chars", True),
        )


def test_numeric_range_and_match_all(ray_session, tmp_path):
    """S25 NumericRange lowering + S26 MatchAll: range clauses become
    docmap predicates (filter/must: between; mustNot: not_between);
    range-only queries degrade to a match-all docmap scan; MatchAll
    drives the browse/listing page."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index
    from search_engine_ray.oracle import build_oracle, oracle_search
    from search_engine_ray.query import MatchAll, NumericRange

    n = 30
    t = pa.table(
        {
            "doc_id": list(range(n)),
            "text": ["alpha beta" if i % 3 == 0 else "alpha" for i in range(n)],
            "n_chars": [100 + 10 * i for i in range(n)],
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("text", "c"),),
        num_buckets=4, num_parts=2,
        docmap_cols=("n_chars",),
        id_cols=("doc_id",), use_native_id=True,
    )
    out = str(tmp_path / "rng")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    oix = build_oracle(t, cfg, sha_col="text")

    # range in compound.filter: required, non-scoring
    q = Compound(
        must=(Term("text", "alpha"),),
        filter=(NumericRange("n_chars", 150, 250),),
    )
    res = eng.search(q, k=50, with_metadata=False)
    ora = oracle_search(oix, q, k=50)
    assert res.total == ora.total == 11
    assert_parity(res, ora)
    # scores are untouched by the range (same as the bare term query)
    base = eng.search(Compound(must=(Term("text", "alpha"),)), k=50, with_metadata=False)
    m = res.hits.merge(base.hits, on="doc_id", suffixes=("_r", "_b"))
    np.testing.assert_allclose(m["score_r"].to_numpy(), m["score_b"].to_numpy(), atol=0)

    # range in mustNot: exclusion; open bounds
    q2 = Compound(must=(Term("text", "alpha"),), must_not=(NumericRange("n_chars", hi=149),))
    res2 = eng.search(q2, k=50, with_metadata=False)
    ora2 = oracle_search(oix, q2, k=50)
    assert res2.total == ora2.total == n - 5
    assert_parity(res2, ora2)

    # range-only query: match-all docmap scan with the predicate
    q3 = Compound(filter=(NumericRange("n_chars", 150, 250),))
    res3 = eng.search(q3, k=50, with_metadata=False)
    assert res3.total == 11
    assert res3.hits["doc_id"].tolist() == list(range(5, 16))
    assert (res3.hits["score"] == 0).all()

    # MatchAll browse: every doc, filtered + attribute-sorted page
    rb = eng.search(
        MatchAll(), k=5,
        filter_spec=FilterSpec((("n_chars", ">=", 300),)),
        sort_by=("n_chars", True), with_metadata=False,
    )
    assert rb.total == 10
    assert rb.hits["doc_id"].tolist() == [29, 28, 27, 26, 25]
    # range facets + stats ride the match-all pass too
    rf = eng.search(MatchAll(), k=1, range_facets={"n_chars": (100, 200, 400)}, with_metadata=False)
    assert rf.total == n
    assert rf.facets["n_chars"] == {"[100,200)": 10, "[200,400)": 20}
    # range in should is rejected; range+mustNot-only unsupported
    with pytest.raises(ValueError):
        eng.search(Compound(should=(NumericRange("n_chars", 1, 2),)), k=5)
    with pytest.raises(ValueError):
        eng.search(
            Compound(filter=(NumericRange("n_chars", 1, 2),), must_not=(Term("text", "beta"),)),
            k=5,
        )
    # explain reports the lowered range predicate
    ex = eng.explain(q, 7)
    assert ex["matched"] is True and ex["ranges"][0]["matched"] is True
    ex2 = eng.explain(q, 2)  # n_chars=120: outside the range
    assert ex2["matched"] is False and ex2["ranges"][0]["matched"] is False


def test_field_value_boost(ray_session, tmp_path):
    """S28 function_score field_value_factor: relevance multiplied by
    modifier(factor * attr) — engine matches the brute oracle, applies
    AFTER additive boosts, and explain() reflects the combine."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index
    from search_engine_ray.oracle import build_oracle, oracle_search
    from search_engine_ray.query import DocAttrBoost, FieldValueBoost

    n = 24
    t = pa.table(
        {
            "doc_id": list(range(n)),
            "text": ["alpha beta" if i % 2 == 0 else "alpha" for i in range(n)],
            "n_chars": [64 * (i + 1) for i in range(n)],
            "lang": ["en" if i % 3 == 0 else "de" for i in range(n)],
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("text", "c"),),
        num_buckets=4, num_parts=2,
        docmap_cols=("n_chars", "lang"),
        id_cols=("doc_id",), use_native_id=True,
    )
    out = str(tmp_path / "fvb")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    oix = build_oracle(t, cfg, sha_col="text")
    q = Compound(must=(Term("text", "alpha"),))
    fv = FieldValueBoost("n_chars", factor=0.01, modifier="log1p")
    res = eng.search(q, k=n, boosts=(fv,), with_metadata=False)
    ora = oracle_search(oix, q, k=n, boosts=(fv,))
    assert_parity(res, ora)
    # multiplies the base score exactly
    base = eng.search(q, k=n, with_metadata=False)
    m = res.hits.merge(base.hits, on="doc_id", suffixes=("_f", "_b"))
    nc = {int(d): 64 * (int(d) + 1) for d in range(n)}
    exp = m["score_b"].to_numpy() * np.log1p(
        0.01 * np.array([nc[d] for d in m["doc_id"]])
    )
    np.testing.assert_allclose(m["score_f"].to_numpy(), exp, rtol=1e-12)
    # additive boost applies BEFORE the multiplier (both engine+oracle)
    both = (DocAttrBoost("lang", "en", 5.0), fv)
    res2 = eng.search(q, k=n, boosts=both, with_metadata=False)
    ora2 = oracle_search(oix, q, k=n, boosts=both)
    assert_parity(res2, ora2)
    # explain: boosts sum to the final score
    did = int(res2.hits["doc_id"].iloc[0])
    ex = eng.explain(q, did, boosts=both)
    assert abs(ex["score"] - float(res2.hits.set_index("doc_id")["score"][did])) < 1e-9
    kinds = [b["kind"] for b in ex["boosts"]]
    assert kinds == ["attr:lang", "fv:n_chars"]
    # unknown modifier rejected
    with pytest.raises(ValueError):
        eng.search(q, k=3, boosts=(FieldValueBoost("n_chars", modifier="exp"),))


def test_decay_boost(ray_session, tmp_path):
    """S30 function_score decay (gauss/exp/linear): multiplier is 1
    inside the offset, `decay` at offset+scale, and missing values
    are untouched — engine matches the brute oracle for every fn."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index
    from search_engine_ray.oracle import build_oracle, oracle_search
    from search_engine_ray.query import DecayBoost

    n = 24
    t = pa.table(
        {
            "doc_id": list(range(n)),
            "text": ["alpha beta" if i % 2 == 0 else "alpha" for i in range(n)],
            "n_chars": [64 * (i + 1) for i in range(n)],
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("text", "c"),),
        num_buckets=4, num_parts=2,
        docmap_cols=("n_chars",),
        id_cols=("doc_id",), use_native_id=True,
    )
    out = str(tmp_path / "decay")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    oix = build_oracle(t, cfg, sha_col="text")
    q = Compound(must=(Term("text", "alpha"),))
    base = eng.search(q, k=n, with_metadata=False)
    for fn in ("gauss", "exp", "linear"):
        db = DecayBoost("n_chars", origin=512, scale=256, offset=64, decay=0.5, fn=fn)
        res = eng.search(q, k=n, boosts=(db,), with_metadata=False)
        ora = oracle_search(oix, q, k=n, boosts=(db,))
        assert_parity(res, ora)
        # exact multiplier vs the closed form
        m = res.hits.merge(base.hits, on="doc_id", suffixes=("_d", "_b"))
        v = np.array([64 * (int(d) + 1) for d in m["doc_id"]], dtype=np.float64)
        d = np.maximum(0.0, np.abs(v - 512) - 64)
        if fn == "gauss":
            mult = np.exp(-(d**2) / (2 * (-(256.0**2) / (2 * np.log(0.5)))))
        elif fn == "exp":
            mult = np.exp(np.log(0.5) / 256.0 * d)
        else:
            mult = np.maximum(0.0, (256.0 / 0.5 - d) / (256.0 / 0.5))
        np.testing.assert_allclose(
            m["score_d"].to_numpy(), m["score_b"].to_numpy() * mult, rtol=1e-12
        )
    # decay value at exactly offset+scale is `decay`
    db = DecayBoost("n_chars", origin=0, scale=100, offset=0, decay=0.5, fn="gauss")
    s = db.apply(np.ones(1), np.array([100.0]))
    assert abs(s[0] - 0.5) < 1e-12
    # missing attr -> multiplier 1
    s2 = db.apply(np.full(2, 3.0), np.array([np.nan, 0.0]))
    np.testing.assert_allclose(s2, [3.0, 3.0])
    # unknown fn rejected
    with pytest.raises(ValueError):
        eng.search(q, k=3, boosts=(DecayBoost("n_chars", 0, 1, fn="cosine"),))


def test_percentiles_aggregation(engine, oracle_ix, tiny_corpus):
    """S29: exact quantile_disc percentiles of a numeric attr over the
    FULL matched set, riding the scoring pass."""
    q = Compound(must=(Term("content", "import"),))
    # tiny_corpus has no numeric docmap col, so aggregate over doc_id
    # hash-derived... use the content length via the oracle instead:
    # build the expected histogram from the oracle's matched set
    res = engine.search(q, k=1, with_metadata=False, quantile_fields={"doc_id": (0.0, 0.5, 1.0)})
    ora = oracle_search(oracle_ix, q, k=10**6)
    import numpy as np

    matched = np.sort(ora.hits["doc_id"].to_numpy())
    n = matched.size
    exp = {
        qq: float(matched[max(1, int(np.ceil(qq * n))) - 1]) for qq in (0.0, 0.5, 1.0)
    }
    got = res.quantiles["doc_id"]
    assert got == exp


def test_cardinality_aggregation(engine, oracle_ix, tiny_corpus):
    """S33 ES cardinality agg: exact distinct docmap values over the
    full matched set, riding the facet channel."""
    import pandas as pd

    q = Compound(must=(Term("content", "import"),))
    card = engine.cardinality(q, ("repo",))
    # brute expectation from the corpus itself
    df = tiny_corpus.to_pandas()
    toks = df["content"].str.lower().str.findall(r"[a-z0-9_]+")
    matched = df[toks.apply(lambda t: "import" in t)]
    assert card["repo"] == matched["repo"].nunique()
    # zero-hit query -> cardinality 0
    z = engine.cardinality(Compound(must=(Term("content", "zzznope"),)), ("repo",))
    assert z["repo"] == 0


def test_phrase_suggest(engine, tiny_corpus):
    """S34 phrase suggester: per-token corrections compose into the
    LM-ranked phrase; an in-dictionary token stands as its own
    distance-0 candidate."""
    # 'imports' is a real dictionary term near 'import'
    rows = engine.suggest_phrase("content", "improt tokenzer", max_edits=2, k=3)
    assert rows, "expected at least one phrase"
    top = rows[0]
    toks = top["phrase"].split()
    assert len(toks) == 2
    assert top["edits"] >= 1 and np.isfinite(top["logprob"])
    # ordering: logprob desc, then edits, then phrase
    for a, b in zip(rows, rows[1:]):
        assert (a["logprob"], -a["edits"]) >= (b["logprob"], -b["edits"]) or (
            a["logprob"] == b["logprob"] and a["edits"] == b["edits"]
            and a["phrase"] <= b["phrase"])
    # a correctly-spelled phrase keeps itself as the top suggestion
    ok = engine.suggest_phrase("content", "import", max_edits=1, k=1)
    assert ok[0]["phrase"] == "import" and ok[0]["edits"] == 0
    # empty input
    assert engine.suggest_phrase("content", "  ") == []


def test_federated_global_stats_parity(ray_session, tiny_corpus, tiny_index, tmp_path):
    """S36 federated DFS search: querying two half-corpus indexes with
    global stats returns EXACTLY the single-index ranking and scores
    (Lucene dfs_query_then_fetch invariant)."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.index import build_index
    from search_engine_ray.query import FederatedEngine

    out, cfg, _ = tiny_index
    single = SearchEngine(out, cfg)
    t = tiny_corpus
    # split by row parity; both halves share the schema
    idx = np.arange(t.num_rows)
    halves = {}
    for name, sel in (("even", idx[idx % 2 == 0]), ("odd", idx[idx % 2 == 1])):
        sub = t.take(pa.array(sel))
        d = str(tmp_path / f"fed_{name}")
        build_index(rd.from_arrow(sub), d, cfg)
        halves[name] = SearchEngine(d, cfg)
    fed = FederatedEngine(halves)
    for q in (
        Compound(must=(Term("content", "import"),)),
        Compound(should=(Term("content", "wand"), Term("content", "bm25")),
                 min_should_match=1),
        Compound(must=(Term("content", "build_index"), Term("content", "merge_shards"))),
    ):
        got = fed.search(q, k=10)
        ref = single.search(q, k=10, with_metadata=False)
        assert int(got["total"].iloc[0]) == ref.total
        # doc ids here are engine-assigned: compare via content sha
        # instead -> tiny_index uses native ids? tiny corpus has no
        # doc_id col, ids are hashed — identical for identical rows,
        # so direct comparison holds
        assert got["doc_id"].tolist() == ref.hits["doc_id"].tolist()
        np.testing.assert_allclose(
            got["score"].to_numpy(), ref.hits["score"].to_numpy(), atol=1e-9
        )
    # sanity: WITHOUT global stats the halves disagree with the single
    # index on at least the scores (local dfs differ)
    lone = halves["even"].search(Compound(must=(Term("content", "import"),)), k=5,
                                 with_metadata=False)
    refl = single.search(Compound(must=(Term("content", "import"),)), k=5,
                         with_metadata=False)
    common = set(lone.hits["doc_id"]) & set(refl.hits["doc_id"])
    if common:
        d = next(iter(common))
        sl = float(lone.hits.set_index("doc_id")["score"][d])
        sr = float(refl.hits.set_index("doc_id")["score"][d])
        assert abs(sl - sr) > 1e-9


def test_composite_agg_paging(engine):
    """ES composite aggregation: walking after-key pages covers the
    facet map exactly — in key order, no overlap, no gap — and an
    empty match set yields an empty page."""
    q = Compound(must=(Term("content", "import"),))
    full = engine.search(q, k=1, facet_fields=("repo",))
    expect = sorted((str(k), int(v)) for k, v in full.facets["repo"].items())

    walked, after = [], None
    while True:
        page = engine.composite_agg(q, "repo", size=3, after=after)
        if not len(page):
            break
        walked.extend(
            (str(k), int(v))
            for k, v in zip(page["repo"].tolist(), page["doc_count"].tolist())
        )
        after = page["repo"].iloc[-1]
    assert walked == expect

    empty = engine.composite_agg(Compound(must=(Term("content", "zzzzqqq"),)), "repo")
    assert len(empty) == 0


def test_top_hits_matches_search_all(engine):
    """ES top_hits: per-bucket best-n equals a brute groupby-head over
    the full scored match set (score desc, doc_id asc)."""
    import pandas as pd

    q = Compound(
        should=(Term("content", "import"), Term("content", "def")), min_should_match=1
    )
    got = engine.top_hits(q, "lang", n=3)
    allhits = engine.search_all(q, attach_cols=("lang",)).to_pandas()
    exp = (
        allhits.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
        .groupby("lang", sort=False)
        .head(3)[["lang", "doc_id", "score"]]
    )
    key = ["lang", "doc_id"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_collapse_field(engine):
    """ES field collapsing: one hit per repo, each the true per-group
    best over the FULL match set (not just the top page), ranked like
    ordinary hits; total still counts documents."""
    q = Compound(must=(Term("content", "import"),))
    full = engine.search(q, k=100000)
    r = engine.search(q, k=5, collapse="repo")
    f = full.hits.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    exp = f.groupby("repo", sort=False).head(1).head(5)
    assert r.hits["doc_id"].tolist() == exp["doc_id"].tolist()
    np.testing.assert_allclose(
        r.hits["score"].to_numpy(), exp["score"].to_numpy(), rtol=0, atol=1e-9
    )
    assert r.hits["repo"].is_unique
    assert r.total == full.total


def test_pinned_query(engine):
    """ES pinned query: existing pinned ids first in the given order
    (nonexistent ids drop out), organic hits exclude pinned ids."""
    q = Compound(must=(Term("content", "import"),))
    ids = engine.search(q, k=10, with_metadata=False).hits["doc_id"].tolist()
    out = engine.pinned_search(q, pinned=(ids[3], 10**9, ids[0]), k=6)
    assert out["doc_id"].tolist()[:2] == [ids[3], ids[0]]
    assert out["pinned"].tolist() == [1, 1, 0, 0, 0, 0]
    assert out["doc_id"].tolist()[2:] == [i for i in ids if i not in (ids[3], ids[0])][:4]
    assert out["rank"].tolist() == [1, 2, 3, 4, 5, 6]


def test_rank_feature_boost(engine):
    """rank_feature saturation: score' = score + b*v/(v+pivot), ranked
    by the boosted score — verified against a manual recompute over
    the unboosted full hit list (doc_id is the numeric feature, as in
    the synthetic docmap)."""
    from search_engine_ray.query import RankFeatureBoost

    q = Compound(must=(Term("content", "import"),))
    base = engine.search(q, k=100000).hits
    r = engine.search(
        q, k=10, boosts=(RankFeatureBoost("doc_id", pivot=1000.0, boost=2.0),),
        with_metadata=False,
    )
    v = base["doc_id"].to_numpy().astype(float)
    boosted = base.assign(score=base["score"].to_numpy() + 2.0 * (v / (v + 1000.0)))
    exp = boosted.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(10)
    assert r.hits["doc_id"].tolist() == exp["doc_id"].tolist()
    np.testing.assert_allclose(
        r.hits["score"].to_numpy(), exp["score"].to_numpy(), rtol=0, atol=1e-9
    )
