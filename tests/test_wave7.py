"""Wave-7 operators: numeric histogram aggregation, the percolator
(reverse search) and per-doc duplicated-n-gram stats — each checked
against a hand-computed expectation on small synthetic inputs."""

import os

import numpy as np
import pandas as pd
import pytest

import search_engine_ray.ops.dedup as dd
import search_engine_ray.ops.relational as rel
from search_engine_ray.query import Compound, Prefix, Synonyms, Term
from search_engine_ray.query.percolate import percolate


def _ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


# ------------------------------------------------------------ histogram


def test_histogram_counts(ray_session):
    ds = _ds({"x": [0.0, 1.5, 9.99, 10.0, 10.5, 25.0, -0.1], "q": [1, 2, 3, 4, 5, 6, 7]})
    out = (
        rel.histogram_aggregate(ds, "x", 10.0)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    # floor semantics: -0.1 lands in bucket -10, 10.0 in bucket 10
    assert out["bucket"].tolist() == [-10.0, 0.0, 10.0, 20.0]
    assert out["n"].tolist() == [1, 3, 2, 1]


def test_histogram_subaggs_and_nulls(ray_session):
    ds = _ds({"x": [1.0, 2.0, None, 11.0], "q": [5.0, 7.0, 9.0, 3.0]})
    out = (
        rel.histogram_aggregate(
            ds, "x", 10.0, aggs={"n": ("count", "x"), "min_q": ("min", "q"), "max_q": ("max", "q")}
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    # the null x row drops entirely (its q=9.0 must not leak into any bucket)
    assert out["bucket"].tolist() == [0.0, 10.0]
    assert out["n"].tolist() == [2, 1]
    assert out["min_q"].tolist() == [5.0, 3.0]
    assert out["max_q"].tolist() == [7.0, 3.0]


def test_histogram_rejects_bad_interval(ray_session):
    with pytest.raises(ValueError):
        rel.histogram_aggregate(_ds({"x": [1.0]}), "x", 0.0)


# ------------------------------------------------------------ percolate

_DOCS = {
    "doc_id": [1, 2, 3, 4, 5],
    "text": [
        "the quick brown fox",  # quick
        "a slow red fox and a dog",  # slow, dog
        "quick quick dog",  # quick + dog
        "customs paperwork",  # cust-prefix
        "",  # empty
    ],
}


def test_percolate_clause_semantics(ray_session):
    qs = {
        "q_quick": Compound(must=(Term("text", "quick"),)),
        "q_quick_and_dog": Compound(must=(Term("text", "quick"), Term("text", "dog"))),
        "q_quick_or_slow": Compound(
            should=(Term("text", "quick"), Term("text", "slow")), min_should_match=1
        ),
        "q_quick_not_fox": Compound(
            must=(Term("text", "quick"),), must_not=(Term("text", "fox"),)
        ),
        "q_cust": Compound(must=(Prefix("text", "cust"),)),
        "q_syn": Compound(should=(Synonyms("text", ("red", "brown")),)),
        "q_msm2": Compound(
            should=(Term("text", "quick"), Term("text", "dog"), Term("text", "slow")),
            min_should_match=2,
        ),
        "q_filter": Compound(filter=(Term("text", "dog"),)),
        "q_empty": Compound(),  # matches nothing
    }
    out = percolate(_ds(_DOCS), qs).to_pandas()
    got = {
        qid: sorted(g["doc_id"].tolist()) for qid, g in out.groupby("query_id")
    }
    assert got == {
        "q_quick": [1, 3],
        "q_quick_and_dog": [3],
        "q_quick_or_slow": [1, 2, 3],
        "q_quick_not_fox": [3],
        "q_cust": [4],
        "q_syn": [1, 2],
        "q_msm2": [2, 3],  # doc2: slow+dog; doc3: quick+dog
        "q_filter": [2, 3],
    }


def test_percolate_rejects_unsupported_leaf(ray_session):
    from search_engine_ray.query import Fuzzy

    with pytest.raises(TypeError):
        percolate(_ds(_DOCS), {"q": Compound(must=(Fuzzy("text", "quick"),))})


def test_percolate_msm_overflow_rejected(ray_session):
    with pytest.raises(ValueError):
        percolate(
            _ds(_DOCS),
            {"q": Compound(should=(Term("text", "quick"),), min_should_match=2)},
        )


def test_filters_agg_counts(ray_session):
    from search_engine_ray.query.percolate import filters_agg

    qs = {
        "f_quick": Compound(must=(Term("text", "quick"),)),
        "f_dog": Compound(must=(Term("text", "dog"),)),
        "f_none": Compound(must=(Term("text", "zzzz"),)),
    }
    out = (
        filters_agg(_ds(_DOCS), qs, other_bucket=True)
        .to_pandas()
        .set_index("filter_id")["n"]
        .to_dict()
    )
    # docs: 1 quick / 2 slow+dog / 3 quick+dog / 4 customs / 5 empty
    assert out == {"f_quick": 2, "f_dog": 2, "f_none": 0, "_other_": 2}


def test_adjacency_matrix_counts(ray_session):
    from search_engine_ray.query.percolate import adjacency_matrix

    qs = {
        "f_quick": Compound(must=(Term("text", "quick"),)),
        "f_dog": Compound(must=(Term("text", "dog"),)),
        "f_fox": Compound(must=(Term("text", "fox"),)),
    }
    out = adjacency_matrix(_ds(_DOCS), qs).to_pandas()
    got = {(r.a, r.b): r.n for r in out.itertuples()}
    assert got == {
        ("f_quick", "f_quick"): 2,
        ("f_dog", "f_dog"): 2,
        ("f_fox", "f_fox"): 2,
        ("f_quick", "f_dog"): 1,  # doc 3
        ("f_dog", "f_fox"): 1,  # doc 2
        ("f_quick", "f_fox"): 1,  # doc 1
    }


# ---------------------------------------------------- ingest pipeline


def test_ingest_pipeline_chain(ray_session):
    from search_engine_ray.ops.ingest import ingest_pipeline

    ds = _ds({"a": ["  Foo Bar ", "x,y,z"], "n": ["1", "2"], "junk": [0, 1]})
    out = ingest_pipeline(
        ds,
        [
            {"copy": {"field": "a", "target_field": "b"}},
            {"trim": {"field": "b"}},
            {"lowercase": {"field": "b"}},
            {"gsub": {"field": "b", "pattern": "[aeiou]", "replacement": "_"}},
            {"split": {"field": "a", "separator": ",", "target_field": "parts"}},
            {"convert": {"field": "n", "type": "integer"}},
            {"remove": {"field": "junk"}},
            {"rename": {"field": "n", "target_field": "num"}},
            {"set": {"field": "src", "value": "ingest"}},
        ],
    ).to_pandas()
    assert out["b"].tolist() == ["f__ b_r", "x,y,z"]
    assert list(out["parts"][1]) == ["x", "y", "z"]
    assert out["num"].tolist() == [1, 2]
    assert "junk" not in out.columns
    assert out["src"].tolist() == ["ingest", "ingest"]


def test_ingest_unknown_processor_fails_fast(ray_session):
    from search_engine_ray.ops.ingest import ingest_pipeline

    with pytest.raises(ValueError):
        ingest_pipeline(_ds({"a": ["x"]}), [{"frobnicate": {"field": "a"}}])


# ------------------------------------------------------ boosting query


def test_negative_boost_demotes_without_excluding(tiny_index):
    from search_engine_ray.query import Compound, NegativeBoost, SearchEngine, Term

    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    q = Compound(must=(Term("content", "tokenizer"),))
    base = eng.search(q, k=1000)
    # demote the top half of the base result set
    neg = np.sort(base.hits["doc_id"].to_numpy()[: base.total // 2].astype(np.int64))
    boosted = eng.search(q, k=1000, boosts=(NegativeBoost(neg, 0.25),))
    assert boosted.total == base.total  # demotion, not exclusion
    b0 = dict(zip(base.hits["doc_id"], base.hits["score"]))
    b1 = dict(zip(boosted.hits["doc_id"], boosted.hits["score"]))
    negset = set(neg.tolist())
    for d, s in b0.items():
        if d in negset:
            assert b1[d] == pytest.approx(s * 0.25, rel=1e-12)
        else:
            assert b1[d] == pytest.approx(s, rel=1e-12)
    # explain reports the multiplicative demotion and sums to the score
    doc = int(neg[0])
    ex = eng.explain(q, doc, boosts=(NegativeBoost(neg, 0.25),))
    rows = [r for r in ex["boosts"] if r["kind"] == "negative"]
    assert len(rows) == 1 and rows[0]["applied"]
    assert ex["score"] == pytest.approx(b1[doc], rel=1e-12)


# ----------------------------------------------------- snapshot/restore


def test_snapshot_restore_roundtrip_and_corruption(tiny_index, tmp_path):
    from search_engine_ray.index.snapshot import (
        create_snapshot,
        restore_snapshot,
        verify_snapshot,
    )
    from search_engine_ray.query import Compound, SearchEngine, Term

    out, cfg, _ = tiny_index
    repo = str(tmp_path / "repo")
    man = create_snapshot(out, repo, "s1")
    assert man["total_bytes"] > 0 and len(man["files"]) > 0
    assert verify_snapshot(repo, "s1")["ok"]
    # immutable: same name refuses
    with pytest.raises(FileExistsError):
        create_snapshot(out, repo, "s1")
    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "s1", dest)
    a = SearchEngine(out, cfg).search(Compound(must=(Term("content", "tokenizer"),)), k=5)
    b = SearchEngine(dest, cfg).search(Compound(must=(Term("content", "tokenizer"),)), k=5)
    assert a.total == b.total
    assert a.hits["doc_id"].tolist() == b.hits["doc_id"].tolist()
    assert a.hits["score"].tolist() == b.hits["score"].tolist()
    # corrupt one parquet byte in the repo: verify flags it, restore fails
    import glob as _glob

    victim = sorted(_glob.glob(os.path.join(repo, "s1", "**", "*.parquet"), recursive=True))[0]
    blob = bytearray(open(victim, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(blob))
    v = verify_snapshot(repo, "s1")
    assert not v["ok"] and len(v["mismatched"]) == 1
    with pytest.raises(Exception):
        restore_snapshot(repo, "s1", str(tmp_path / "restored2"))
    assert not os.path.exists(str(tmp_path / "restored2"))  # no half-restore


# ---------------------------------------------------------- rank_eval


def test_rank_eval_metrics(tiny_index):
    from search_engine_ray.pipelines.rank_eval import rank_eval
    from search_engine_ray.query import Compound, SearchEngine, Term

    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    q = Compound(must=(Term("content", "tokenizer"),))
    top = eng.search(q, k=10, with_metadata=False).hits["doc_id"].to_numpy()
    assert top.size == 10
    # judge ranks 1 and 3 relevant, plus one unreachable doc
    rel = [int(top[0]), int(top[2]), 999_999_999]
    df = rank_eval(eng, [("r1", q, rel)], k=10)
    row = df.iloc[0]
    assert row["p_at_k"] == 0.2
    assert row["recall_at_k"] == 0.6667
    assert row["reciprocal_rank"] == 1.0
    assert row["dcg_at_k"] == 1.5  # 1/log2(2) + 1/log2(4)
    # idcg = 1 + 1/log2(3) + 0.5 = 2.1309297...; ndcg = 1.5/idcg
    assert row["ndcg_at_k"] == pytest.approx(0.7039, abs=1e-4)
    # no relevant docs retrieved
    df0 = rank_eval(eng, [("r0", q, [999_999_999])], k=10)
    assert df0.iloc[0]["reciprocal_rank"] == 0.0
    assert df0.iloc[0]["ndcg_at_k"] == 0.0


# -------------------------------------------------- best_fields DisMax


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_best_fields_engine_oracle_parity(tiny_index, tiny_corpus, tie):
    from search_engine_ray.config import IndexConfig
    from search_engine_ray.oracle import build_oracle, oracle_search
    from search_engine_ray.query import BestFields, Compound, SearchEngine

    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    oix = build_oracle(tiny_corpus, IndexConfig(num_buckets=4, num_parts=4))
    q = Compound(must=(BestFields(("content", "path"), "tokenizer", tie_breaker=tie),))
    res = eng.search(q, k=10)
    ora = oracle_search(oix, q, k=10)
    assert res.total == ora.total
    assert res.hits["doc_id"].tolist() == ora.hits["doc_id"].tolist()
    np.testing.assert_allclose(
        res.hits["score"].to_numpy(), ora.hits["score"].to_numpy(), rtol=0, atol=1e-9
    )


def test_best_fields_differs_from_cross_fields(ray_session, tmp_path):
    # per-field idf (best_fields) must diverge from blended idf
    # (cross_fields) when the term lives in BOTH fields (blended
    # df = min(df_a + df_b, N) != either per-field df)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index
    from search_engine_ray.oracle import build_oracle, oracle_search
    from search_engine_ray.query import BestFields, Compound, CrossFields, SearchEngine

    tbl = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "title": [
                "alpha engine notes",  # 'alpha' common in title
                "alpha design",
                "alpha roadmap",
                "beta design",
                "misc",
            ],
            "body": [
                "details about the engine internals",
                "alpha appears here too in the body text",  # rare in body
                "unrelated body content",
                "more unrelated content",
                "alpha",  # body-only match
            ],
        }
    )
    src = str(tmp_path / "corpus2")
    (tmp_path / "corpus2").mkdir()
    pq.write_table(tbl, src + "/part-0.parquet")
    cfg = IndexConfig(
        fields=(FieldSpec("title", "t"), FieldSpec("body", "b")),
        num_buckets=4,
        num_parts=4,
        docmap_cols=(),
        id_cols=("doc_id",),
        use_native_id=True,
    )
    idx = str(tmp_path / "idx2")
    build_index(src, idx, cfg, sha_col="body")
    eng = SearchEngine(idx, cfg)
    bf_q = Compound(must=(BestFields(("title", "body"), "alpha", tie_breaker=0.3),))
    xf_q = Compound(must=(CrossFields(("title", "body"), "alpha", tie_breaker=0.3),))
    bf, xf = eng.search(bf_q, k=10), eng.search(xf_q, k=10)
    assert bf.total == xf.total == 4  # same match set (docs 0-2, 4... doc3 no)
    assert bf.hits["score"].tolist() != xf.hits["score"].tolist()
    # and best_fields agrees with the brute-force oracle
    oix = build_oracle(tbl, cfg, sha_col="body")
    ora = oracle_search(oix, bf_q, k=10)
    assert bf.hits["doc_id"].tolist() == ora.hits["doc_id"].tolist()
    np.testing.assert_allclose(
        bf.hits["score"].to_numpy(), ora.hits["score"].to_numpy(), rtol=0, atol=1e-9
    )


# ------------------------------------------------------------ stemming


def test_s_stem_three_way_parity():
    import duckdb
    import pyarrow as pa

    from search_engine_ray.analysis import DUCKDB_S_STEM, s_stem, s_stem_array

    toks = [
        "vectors", "queries", "indexes", "corpus", "class", "eies", "aies",
        "goes", "trees", "tables", "as", "is", "s", "ies", "bus", "miss",
        "files", "hash", "caches", "boxes", "aes", "stats", "joins", "res",
        "", "a", "ss", "es", "xs",
    ]
    py = [s_stem(t) for t in toks]
    assert py == s_stem_array(pa.array(toks)).to_pylist()
    con = duckdb.connect()
    sql = [con.sql(f"SELECT {DUCKDB_S_STEM.format(t=repr(t))}").fetchone()[0] for t in toks]
    assert py == sql
    # the folds the analyzer promises
    assert s_stem("vectors") == "vector" and s_stem("queries") == "query"
    assert s_stem("corpus") == "corpus" and s_stem("class") == "class"


def test_stemmed_index_cross_form_retrieval(ray_session, tmp_path):
    import dataclasses

    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.config import IndexConfig, FieldSpec
    from search_engine_ray.index import build_index
    from search_engine_ray.oracle import build_oracle, oracle_search
    from search_engine_ray.query import SearchEngine

    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": [
                "sparse vectors need tables",  # plural forms
                "a vector inside one table",  # singular forms
                "queries against the index",
                "one query per indexes",
                "nothing relevant here",
                "tables tables tables",
            ],
        }
    )
    src = str(tmp_path / "corpus")
    (tmp_path / "corpus").mkdir()
    pq.write_table(tbl, src + "/part-0.parquet")
    cfg = IndexConfig(
        fields=(FieldSpec("text", "c"),),
        num_buckets=4,
        num_parts=4,
        docmap_cols=(),
        id_cols=("doc_id",),
        use_native_id=True,
        analyzer="code_stem",
    )
    idx = str(tmp_path / "idx")
    build_index(src, idx, cfg, sha_col="text")
    eng = SearchEngine(idx, cfg)
    from search_engine_ray.query import Compound, Term
    from search_engine_ray.analysis import get_analyzer

    an = get_analyzer("code_stem")
    # raw keyword "vectors" -> stemmed term "vector": matches BOTH forms
    res = eng.search(Compound(must=(Term("text", an.analyze("vectors")[0]),)), k=10)
    assert sorted(res.hits["doc_id"].tolist()) == [0, 1]
    # "query"/"queries" fold too
    res2 = eng.search(Compound(must=(Term("text", an.analyze("query")[0]),)), k=10)
    assert sorted(res2.hits["doc_id"].tolist()) == [2, 3]
    # engine vs brute-force oracle parity on the stemmed statistics
    oix = build_oracle(tbl, cfg)
    ora = oracle_search(oix, Compound(must=(Term("text", "table"),)), k=10)
    res3 = eng.search(Compound(must=(Term("text", "table"),)), k=10)
    assert res3.hits["doc_id"].tolist() == ora.hits["doc_id"].tolist()
    np.testing.assert_allclose(
        res3.hits["score"].to_numpy(), ora.hits["score"].to_numpy(), rtol=0, atol=1e-9
    )


# -------------------------------------------------------- dup n-grams


def test_dup_ngram_stats(ray_session):
    base = "one two three four five six seven eight"  # exactly 8 tokens
    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            base + " tail_a",  # shares the base 8-gram with doc 2
            base + " tail_b",
            "totally different words here nothing repeats at all",  # 8 uniq-ish tokens
            "short doc",  # < 8 tokens -> 0 n-grams
        ],
    }
    out = (
        dd.dup_ngram_stats(_ds(rows), n=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # docs 1/2: 9 tokens -> 2 positions; position 1 (the base) is shared,
    # position 2 (ends in tail_x) is unique
    assert out.loc[1, "n_ngrams"] == 2 and out.loc[1, "n_dup_ngrams"] == 1
    assert out.loc[2, "n_ngrams"] == 2 and out.loc[2, "n_dup_ngrams"] == 1
    assert out.loc[3, "n_dup_ngrams"] == 0
    assert out.loc[4, "n_ngrams"] == 0 and out.loc[4, "n_dup_ngrams"] == 0


def test_dup_ngram_within_doc_repeat(ray_session):
    # the same 8-gram occurring twice INSIDE one doc counts as duplicated
    base = "a1 a2 a3 a4 a5 a6 a7 a8"
    rows = {"doc_id": [1], "text": [base + " zzz " + base]}
    out = dd.dup_ngram_stats(_ds(rows), n=8).to_pandas()
    # 17 tokens -> 10 positions; positions 1 and 10 are the repeated base
    assert out.loc[0, "n_ngrams"] == 10
    assert int(out.loc[0, "n_dup_ngrams"]) == 2


def test_strip_dup_ngrams_owner_keeps_copy(ray_session):
    base = "one two three four five six seven eight"
    rows = {
        "doc_id": [1, 2, 3],
        "text": [base + " tail_a", base + " tail_b", "short doc"],
    }
    out = (
        dd.strip_dup_ngrams(_ds(rows), n=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1 (lowest id) owns the shared 8-gram and keeps it intact
    assert out.loc[1, "clean_text"] == base + " tail_a"
    assert out.loc[1, "n_removed"] == 0
    # doc 2 loses all 8 covered tokens, keeps only its unique tail
    assert out.loc[2, "clean_text"] == "tail_b"
    assert out.loc[2, "n_removed"] == 8
    # short doc untouched
    assert out.loc[3, "clean_text"] == "short doc" and out.loc[3, "n_removed"] == 0


def test_strip_dup_ngrams_overlapping_spans(ray_session):
    # two overlapping dup 8-grams in the copy: covered union removed
    base = "a1 a2 a3 a4 a5 a6 a7 a8 a9"  # 9 tokens -> 2 dup starts
    rows = {"doc_id": [1, 2], "text": [base, "zz " + base + " yy"]}
    out = (
        dd.strip_dup_ngrams(_ds(rows), n=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_removed"] == 0
    assert out.loc[2, "clean_text"] == "zz yy"
    assert out.loc[2, "n_removed"] == 9


def test_dup_ngram_all_unique_corpus(ray_session):
    rows = {
        "doc_id": [1, 2],
        "text": [
            "w1 w2 w3 w4 w5 w6 w7 w8 w9",
            "v1 v2 v3 v4 v5 v6 v7 v8",
        ],
    }
    out = dd.dup_ngram_stats(_ds(rows), n=8).to_pandas()
    assert (out["n_dup_ngrams"] == 0).all()
    assert sorted(out["n_ngrams"].tolist()) == [1, 2]


# ------------------------------------------------------------- msearch


def test_msearch_matches_search(tiny_index):
    from search_engine_ray.query import Compound, SearchEngine, Term

    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    qs = [
        Compound(must=(Term("content", "tokenizer"),)),
        Compound(must=(Term("content", "import"), Term("content", "yield"))),
        Compound(should=(Term("content", "wand"), Term("content", "bm25")), min_should_match=1),
        Compound(must=(Term("content", "zzzzqqq"),)),  # zero-hit
    ]
    batch = eng.msearch(qs, k=10)
    for q, r in zip(qs, batch):
        single = eng.search(q, k=10, with_metadata=False)
        assert r.total == single.total
        assert r.hits["doc_id"].tolist() == single.hits["doc_id"].to_list()
        assert r.hits["score"].tolist() == single.hits["score"].to_list()


def test_msearch_similarity_and_order(tiny_index):
    from search_engine_ray.query import Compound, SearchEngine, Term

    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    qs = [Compound(must=(Term("content", "tokenizer"),))] * 2
    batch = eng.msearch(qs, k=5, similarity="classic")
    single = eng.search(qs[0], k=5, similarity="classic", with_metadata=False)
    for r in batch:
        assert r.hits["score"].tolist() == single.hits["score"].to_list()


# ------------------------------------------------- quality classifier


def test_logreg_learns_separable(ray_session):
    from search_engine_ray.ops.classify import (
        fit_quality_classifier,
        score_classifier,
    )

    rng = np.random.default_rng(3)
    x1 = np.concatenate([rng.normal(2, 0.3, 200), rng.normal(-2, 0.3, 200)])
    x2 = rng.normal(0, 1, 400)
    y = (np.arange(400) < 200).astype(np.float64)
    ds = _ds({"doc_id": np.arange(400), "f1": x1, "f2": x2, "y": y})
    model = fit_quality_classifier(ds, ["f1", "f2"], "y", sort_col="doc_id")
    out = score_classifier(ds, model).to_pandas().sort_values("doc_id")
    pred = (out["clf_score"].to_numpy() >= 0.5).astype(float)
    acc = (pred == y[out["doc_id"].to_numpy()]).mean()
    assert acc >= 0.98, acc
    # refit is bit-identical (sorted sample -> deterministic float path)
    model2 = fit_quality_classifier(ds, ["f1", "f2"], "y", sort_col="doc_id")
    assert model == model2


def test_score_classifier_matches_manual_sigmoid(ray_session):
    from search_engine_ray.ops.classify import score_classifier
    from search_engine_ray.ops.rounding import round_half_up

    model = {"feature_cols": ["a", "b"], "weights": [0.5, -1.25], "bias": 0.75}
    ds = _ds({"a": [0.0, 2.0, -4.0], "b": [1.0, 0.5, 2.0]})
    out = score_classifier(ds, model).to_pandas()
    z = np.array([0.0 * 0.5 + 1.0 * -1.25 + 0.75,
                  2.0 * 0.5 + 0.5 * -1.25 + 0.75,
                  -4.0 * 0.5 + 2.0 * -1.25 + 0.75])
    exp = round_half_up(1.0 / (1.0 + np.exp(-z)))
    assert out["clf_score"].tolist() == exp.tolist()
