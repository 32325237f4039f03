"""Pipeline response-shape tests (reference shape conformance,
FIXTURES.md §shape / test_cases/test_app.py:8-31 analog)."""

import math

from search_engine_ray.pipelines import grouped_search, keyword_search, listing
from search_engine_ray.query import SearchEngine


def test_keyword_search_shape(tiny_index):
    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    res = keyword_search(
        eng, "import tokenizer", text_field="content",
        prefix_fields=("path", "repo"), k=7, facet_fields=("lang",),
    )
    assert set(res) == {"total", "total_exact", "data", "facets"}
    assert isinstance(res["total"], int) and res["total_exact"] is True
    assert len(res["data"]) <= 7  # reference bound: len(data) <= limit
    assert sum(res["facets"].get("lang", {}).values()) in (0, res["total"])


def test_grouped_search_shape(tiny_index):
    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    res = grouped_search(
        eng, "import", text_field="content", prefix_fields=(),
        group_col="lang", k=3,
    )
    assert set(res) == {"total", "data"}
    assert len(res["data"]) <= 3
    # one row per group, best-scored variant first ordering
    assert res["data"]["lang"].is_unique
    scores = res["data"]["score"].tolist()
    assert scores == sorted(scores, reverse=True)


def test_listing_shape(ray_session):
    import ray.data as rd

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    res = listing(
        docs, conditions=[("lang", "==", "en")], sort_keys=["n_chars", "doc_id"],
        descending=[True, False], page=2, per_page=7, sidebar_cols=("source",),
    )
    assert set(res) == {"count", "rows", "currentPage", "numFound", "lastPage", "filters"}
    assert res["currentPage"] == 2 and res["count"] == len(res["rows"]) <= 7
    assert res["lastPage"] == math.ceil(res["numFound"] / 7)
    assert sum(res["filters"]["source"].values()) == res["numFound"]


def test_grouped_search_zero_hit(ray_session, tiny_index):
    """The distributed grouped tail must survive an empty match set."""
    from search_engine_ray.pipelines import grouped_search
    from search_engine_ray.query import SearchEngine

    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    res = grouped_search(
        eng, "zzzzqqqxx", text_field="content", prefix_fields=(),
        group_col="repo", sum_col=None, k=5,
    )
    assert res["total"] == 0 and len(res["data"]) == 0


def test_rrf_fuse_hand_values(ray_session):
    """RRF: 1/(k0+rank) sums, absent lists contribute 0, ties break by
    id; a doc ranked in both lists beats single-list docs nearby."""
    import pandas as pd

    from search_engine_ray.pipelines import rrf_fuse

    a = pd.DataFrame({"doc_id": [10, 20, 30]})  # ranks 1..3
    b = pd.DataFrame({"doc_id": [20, 40]})      # ranks 1..2
    out = rrf_fuse([a, b], k0=60, k=10)
    # doc 20: a-rank 2, b-rank 1
    assert out.iloc[0]["doc_id"] == 20
    assert out.iloc[0]["rrf"] == 1 / 62 + 1 / 61
    assert out.iloc[0]["rank_0"] == 2 and out.iloc[0]["rank_1"] == 1
    # doc 10: only a, rank 1
    row10 = out[out["doc_id"] == 10].iloc[0]
    assert row10["rrf"] == 1 / 61 and row10["rank_1"] == 0
    # full ordering: 20, 10, 40, 30
    assert out["doc_id"].tolist() == [20, 10, 40, 30]


def test_rescore_window_semantics(tiny_index):
    """S32 ES rescore: (a) combined = qw*primary + rw*secondary for
    window docs matching the secondary, primary-only otherwise;
    (b) docs outside the primary top-`window` NEVER enter the result,
    even if the secondary loves them; (c) window=len(corpus) degrades
    to a plain combined ranking."""
    import numpy as np

    from search_engine_ray.pipelines import rescore_search
    from search_engine_ray.query import Compound, SearchEngine, Term

    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    prim = Compound(must=(Term("content", "import"),))
    sec = Compound(must=(Term("content", "tokenizer"),))
    p = eng.search(prim, k=200, with_metadata=False).hits
    s = eng.search(sec, k=200, with_metadata=False).hits
    smap = dict(zip(s["doc_id"], s["score"]))
    W = 5
    got = rescore_search(eng, prim, sec, window=W, k=5,
                         query_weight=1.0, rescore_weight=2.0)
    win_ids = p["doc_id"].head(W).tolist()
    # (b) only window docs appear
    assert set(got["doc_id"]).issubset(set(win_ids))
    # (a) exact combine for every returned doc
    pmap = dict(zip(p["doc_id"], p["score"]))
    for d, sc_ in zip(got["doc_id"].astype(int), got["score"]):
        exp = 1.0 * pmap[d] + 2.0 * smap.get(d, 0.0)
        assert abs(sc_ - exp) < 1e-12
    # ordering: score desc, doc_id asc
    sc = got["score"].to_numpy()
    assert all(sc[i] > sc[i + 1] or (sc[i] == sc[i + 1] and
               got["doc_id"].iloc[i] < got["doc_id"].iloc[i + 1])
               for i in range(len(got) - 1))
    # (c) big window == combined ranking over all primary matches
    big = rescore_search(eng, prim, sec, window=1000, k=10)
    comb = {d: 1.0 * pc_ + 2.0 * smap.get(d, 0.0) for d, pc_ in pmap.items()}
    exp_ids = [d for d, _ in sorted(comb.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    assert big["doc_id"].tolist() == exp_ids


def test_corpus_report(ray_session):
    """Corpus card vs an independent SQL recompute of every metric."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from search_engine_ray.pipelines.corpus_report import corpus_report

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"])
    out = corpus_report(docs)
    exp = con.sql(
        """
        WITH q AS (SELECT doc_id, round(
          0.4 * (len(list_distinct(regexp_extract_all(lower(text),'[a-z0-9_]+')))::DOUBLE
               / len(regexp_extract_all(lower(text),'[a-z0-9_]+'))) +
          0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text)) +
          0.3 * (least(len(regexp_extract_all(lower(text),'[a-z0-9_]+')), 200)::DOUBLE / 200), 4)
          AS quality FROM documents),
        tok AS (SELECT len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS nt FROM documents),
        base AS (SELECT count(*) AS n FROM documents),
        dig AS (SELECT count(DISTINCT md5(coalesce(text, ''))) AS d FROM documents)
        SELECT 'docs' AS metric, lang AS key, count(*)::DOUBLE AS value
        FROM documents GROUP BY lang
        UNION ALL SELECT 'docs', 'all', n::DOUBLE FROM base
        UNION ALL SELECT 'tokens', 'all', (SELECT sum(nt) FROM tok)::DOUBLE
        UNION ALL SELECT 'avg_tokens', 'all',
                  round((SELECT sum(nt) FROM tok)::DOUBLE / n, 4) FROM base
        UNION ALL SELECT 'mean_quality', 'all',
                  round((SELECT sum(quality) FROM q) / n, 4) FROM base
        UNION ALL SELECT 'distinct_texts', 'all', d::DOUBLE FROM dig
        UNION ALL SELECT 'dup_excess', 'all', (SELECT n FROM base) - d FROM dig
        """
    ).df()
    a = out.sort_values(["metric", "key"]).reset_index(drop=True)
    b = exp.sort_values(["metric", "key"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
