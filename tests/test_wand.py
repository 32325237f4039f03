"""Block-max pruning parity: pruned top-k must be rank- AND
score-identical to the exhaustive scorer; pruned `total` is a lower
bound of the exact total."""

import numpy as np
import pytest

from search_engine_ray.query import Compound, Prefix, SearchEngine, Term


@pytest.fixture(scope="module")
def engine(tiny_index):
    out, cfg, _ = tiny_index
    return SearchEngine(out, cfg)


OR_QUERIES = [
    Compound(should=(Term("content", "import"),)),
    Compound(should=(Term("content", "def"), Term("content", "class"))),
    Compound(should=(Term("content", "tokenizer"), Term("content", "bm25"), Term("content", "wand"))),
    Compound(should=(Term("content", "import"), Term("content", "zzznope")), min_should_match=1),
    Compound(should=(Prefix("path", "tok"), Prefix("repo", "org1")), min_should_match=1),
]


@pytest.mark.parametrize("qi", range(len(OR_QUERIES)))
@pytest.mark.parametrize("k", [3, 10, 50])
def test_pruned_rank_parity(engine, qi, k):
    q = OR_QUERIES[qi]
    exact = engine.search(q, k=k, with_metadata=False)
    pruned = engine.search(q, k=k, with_metadata=False, prune=True)
    assert pruned.hits["doc_id"].tolist() == exact.hits["doc_id"].tolist()
    np.testing.assert_array_equal(
        pruned.hits["score"].to_numpy(), exact.hits["score"].to_numpy()
    )
    assert not pruned.total_exact or pruned.total == exact.total
    assert pruned.total <= exact.total
    assert pruned.total >= len(pruned.hits)


def test_prune_refused_for_must(engine):
    q = Compound(must=(Term("content", "import"),))
    res = engine.search(q, k=5, with_metadata=False, prune=True)
    # must-query falls back to exhaustive: total stays exact
    assert res.total_exact
    exact = engine.search(q, k=5, with_metadata=False)
    assert res.total == exact.total
    assert res.hits["doc_id"].tolist() == exact.hits["doc_id"].tolist()
