"""Pluggable similarity modules (Lucene Similarity parity): engine
top-k vs the brute-force oracle for classic (TF-IDF VSM),
lm_dirichlet and boolean similarities, plus formula unit checks.
Engine and oracle share scoring.py with identical op order, so scores
must agree to 1e-9 and ranking must be identical."""

import numpy as np
import pytest

from search_engine_ray.config import IndexConfig
from search_engine_ray.oracle import build_oracle, oracle_search
from search_engine_ray.query import Compound, SearchEngine, Synonyms, Term
from search_engine_ray.query import scoring

QUERIES = [
    Compound(must=(Term("content", "import"),)),
    Compound(must=(Term("content", "tokenizer"),)),
    Compound(must=(Term("content", "inverted"), Term("content", "index"))),
    Compound(should=(Term("content", "wand"), Term("content", "bm25")), min_should_match=1),
    Compound(
        must=(Term("content", "def"),),
        should=(Term("content", "scorer"), Term("content", "heap")),
    ),
    Compound(must=(Term("content", "zzzzqqq"),)),  # zero-hit
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


@pytest.mark.parametrize("sim", ["classic", "lm_dirichlet", "boolean", "dfr"])
@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_similarity_parity(engine, oracle_ix, sim, qi):
    q = QUERIES[qi]
    res = engine.search(q, k=10, similarity=sim)
    ora = oracle_search(oracle_ix, q, k=10, similarity=sim)
    assert_parity(res, ora)


@pytest.mark.parametrize("sim", ["classic", "lm_dirichlet", "dfr"])
def test_similarity_boost_parity(engine, oracle_ix, sim):
    # classic folds the boost into the squared idf weight;
    # lm_dirichlet rides it on wmult — both must match the oracle
    q = Compound(
        should=(
            Term("content", "wand", boost=3.0),
            Term("content", "bm25"),
        ),
        min_should_match=1,
    )
    res = engine.search(q, k=10, similarity=sim)
    ora = oracle_search(oracle_ix, q, k=10, similarity=sim)
    assert_parity(res, ora)


def test_similarity_changes_ranking(engine):
    # not vacuous: on a multi-term query the three scoring models
    # produce genuinely different score vectors (and boolean is flat)
    q = Compound(should=(Term("content", "def"), Term("content", "scorer")))
    bm = engine.search(q, k=10)
    cl = engine.search(q, k=10, similarity="classic")
    bo = engine.search(q, k=10, similarity="boolean")
    assert bm.total == cl.total == bo.total
    assert not np.allclose(
        bm.hits["score"].to_numpy()[: len(cl.hits)], cl.hits["score"].to_numpy()
    )
    # boolean: every doc matching the same clause set scores the same
    assert set(np.round(bo.hits["score"].to_numpy(), 12)) <= {1.0, 2.0}


def test_similarity_guards(engine):
    with pytest.raises(ValueError, match="unknown similarity"):
        engine.search(Compound(must=(Term("content", "import"),)), similarity="bm42")
    with pytest.raises(ValueError, match="similarity='bm25'"):
        engine.search(
            Compound(must=(Synonyms("content", ("import", "tokenizer")),)),
            similarity="classic",
        )


def test_similarity_prune_falls_back(engine, oracle_ix):
    # prune is BM25-specific: a prune request under another similarity
    # silently runs unpruned and stays exact
    q = Compound(should=(Term("content", "import"),), min_should_match=1)
    res = engine.search(q, k=10, similarity="classic", prune=True)
    ora = oracle_search(oracle_ix, q, k=10, similarity="classic")
    assert_parity(res, ora)
    assert res.total_exact


def test_formula_units():
    # classic: idf = 1 + ln(N/(df+1)); score = idf^2 * sqrt(tf)/sqrt(dl)
    w = float(scoring.classic_idf(100, 9)) ** 2
    got = scoring.classic_score(np.array([4]), np.array([16]), w)
    assert np.allclose(got, w * 2.0 / 4.0)
    # lm_dirichlet clips at zero for common terms in long docs
    lo = scoring.lm_dirichlet_score(np.array([1]), np.array([100000]), 1000.0, 2000.0)
    assert lo[0] == 0.0
    hi = scoring.lm_dirichlet_score(np.array([5]), np.array([10]), 0.2, 2000.0)
    expect = np.log(1.0 + 5 / 0.2) + np.log(2000.0 / 2010.0)
    assert np.allclose(hi, max(expect, 0.0))
    # leaf_score dispatch: boolean is flat
    flat = scoring.leaf_score(np.array([3, 1]), np.array([5, 9]), 2.5, 1.2, 0.75, 7.0, "boolean")
    assert flat.tolist() == [2.5, 2.5]
