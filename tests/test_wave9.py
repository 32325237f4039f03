"""Round-3 third-wave operators: Gopher quality rules, weighted
reservoir sampling, cosine radius search, terms_set per-doc msm,
distance_feature boosting, match_bool_prefix, parquet compaction —
each checked against a hand-computed / brute-force expectation."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import search_engine_ray.ops.ann as ann
import search_engine_ray.ops.sketch as sk
import search_engine_ray.ops.text as txt
from search_engine_ray.query import Compound, Prefix, Term


def _ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


# ------------------------------------------------------- gopher rules


def test_gopher_rules_metrics(ray_session):
    good = "the quick brown fox " + " ".join(f"andword{i} of that have with be to" for i in range(10))
    bully = "\n".join("- bullet item" for _ in range(10))
    out = (
        txt.add_gopher_rules(_ds({"doc_id": [0, 1, 2], "text": [good, bully, ""]}))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 0: 4 + 10*7 = 74 words, >=2 stop words, no bullets -> passes
    assert out.loc[0, "n_words"] == 74
    assert out.loc[0, "n_stop_hits"] >= 2
    assert bool(out.loc[0, "gopher_pass"])
    # doc 1: every line starts with a bullet -> bullet_line_frac = 1.0
    assert out.loc[1, "bullet_line_frac"] == 1.0
    assert not bool(out.loc[1, "gopher_pass"])
    # empty text: all-zero metrics, fails the word-count floor
    assert out.loc[2, "n_words"] == 0
    assert not bool(out.loc[2, "gopher_pass"])


def test_gopher_symbol_and_ellipsis(ray_session):
    t = "word one two three... four # five #\nends with dots...\nplain line"
    out = txt.add_gopher_rules(_ds({"doc_id": [0], "text": [t]})).to_pandas()
    n_words = out.loc[0, "n_words"]
    # 2 '#' + 2 '...' = 4 symbols
    assert out.loc[0, "symbol_word_ratio"] == round(4.0 / n_words, 4)
    # 2 of 3 lines end with '...'? only line 2 ends with dots (line 1 has
    # text after the dots)
    assert out.loc[0, "ellipsis_line_frac"] == round(1.0 / 3.0, 4)


# ---------------------------------------------- weighted reservoir sample


def test_reservoir_sample_matches_brute(ray_session):
    n = 500
    w = (np.arange(n) % 7 + 1).astype(np.int64)
    ds = _ds({"doc_id": np.arange(n), "n_chars": w})
    out = (
        sk.weighted_reservoir_sample(ds, "doc_id", "n_chars", k=25)
        .to_pandas()
        .reset_index(drop=True)
    )
    # brute replay: same hash-derived uniforms, same key formula
    h = sk._md5_upper64([str(i) for i in range(n)])
    u = h.astype(np.float64) / sk._TWO64
    key = u ** (1.0 / w.astype(np.float64))
    order = np.lexsort((np.arange(n), -key))[:25]
    assert sorted(out["doc_id"].tolist()) == sorted(order.tolist())
    # keys are the rounded A-ES keys
    got = out.set_index("doc_id")["sample_key"]
    for i in order:
        assert abs(got[i] - round(key[i], 6)) < 1e-9


def test_reservoir_zero_weight_never_drawn(ray_session):
    ds = _ds({"doc_id": [0, 1, 2, 3], "n_chars": [0, 5, 0, 9]})
    out = sk.weighted_reservoir_sample(ds, "doc_id", "n_chars", k=2).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 3]


# ------------------------------------------------------- cosine range


def test_cosine_range_brute_parity(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    m = rng.normal(size=(60, 8))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(60), pa.int64()),
                "embedding": pa.array(m.tolist(), pa.list_(pa.float64())),
            }
        )
    )
    q = m[:2]
    out = (
        ann.cosine_range(ds, q, np.array([0, 1]), threshold=0.2)
        .to_pandas()
        .sort_values(["qid", "vec_id"])
        .reset_index(drop=True)
    )
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(mn @ mn[:2].T, 4)
    exp = [
        (j, i, sims[i, j])
        for i in range(60)
        for j in range(2)
        if sims[i, j] >= 0.2 and i != j
    ]
    exp.sort()
    assert out["qid"].tolist() == [e[0] for e in exp]
    assert out["vec_id"].tolist() == [e[1] for e in exp]
    assert np.allclose(out["cos"].to_numpy(), [e[2] for e in exp])


# ----------------------------------------------------- terms_set (msm)


def test_terms_set_per_doc_requirement(ray_session, tmp_path):
    import ray.data as rd

    from search_engine_ray.config import IndexConfig, FieldSpec
    from search_engine_ray.index import build_index
    from search_engine_ray.query import SearchEngine

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [
                "alpha beta gamma",  # matches 3 terms
                "alpha beta",  # matches 2
                "alpha",  # matches 1
                "delta",  # matches 0
            ],
            "req": pa.array([3, 3, 1, 1], pa.int64()),
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("text", "c"),),
        num_buckets=2,
        num_parts=2,
        docmap_cols=("req",),
        id_cols=("doc_id",),
        use_native_id=True,
    )
    out = str(tmp_path / "ts_idx")
    build_index(rd.from_arrow(docs), out, cfg)
    eng = SearchEngine(out, cfg)
    q = Compound(
        should=(Term("text", "alpha"), Term("text", "beta"), Term("text", "gamma")),
        msm_field="req",
    )
    r = eng.search(q, k=10)
    # doc 0 needs 3 and has 3; doc 1 needs 3, has 2 -> out; doc 2 needs
    # 1 and has 1; doc 3 matches nothing
    assert sorted(r.hits["doc_id"].tolist()) == [0, 2]
    # msm_map transform: everyone needs min(req, 2)
    q2 = Compound(
        should=(Term("text", "alpha"), Term("text", "beta"), Term("text", "gamma")),
        msm_field="req",
        msm_map=lambda v: np.minimum(v, 2),
    )
    r2 = eng.search(q2, k=10)
    assert sorted(r2.hits["doc_id"].tolist()) == [0, 1, 2]


# ----------------------------------------------- distance_feature boost


def test_distance_feature_formula(ray_session, tmp_path):
    import ray.data as rd

    from search_engine_ray.config import IndexConfig, FieldSpec
    from search_engine_ray.index import build_index
    from search_engine_ray.query import DistanceFeatureBoost, SearchEngine

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["same words here", "same words here"],
            "dist_val": pa.array([100.0, 200.0], pa.float64()),
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("text", "c"),),
        num_buckets=2,
        num_parts=2,
        docmap_cols=("dist_val",),
        id_cols=("doc_id",),
        use_native_id=True,
    )
    out = str(tmp_path / "df_idx")
    build_index(rd.from_arrow(docs), out, cfg)
    eng = SearchEngine(out, cfg)
    base = eng.search(Compound(must=(Term("text", "same"),)), k=2).hits
    b = DistanceFeatureBoost("dist_val", origin=100.0, pivot=50.0, boost=4.0)
    boosted = eng.search(Compound(must=(Term("text", "same"),)), k=2, boosts=(b,)).hits
    s0 = dict(zip(base["doc_id"], base["score"]))
    s1 = dict(zip(boosted["doc_id"], boosted["score"]))
    # doc 0 at the origin: +boost; doc 1 at distance 100: +4*50/150
    assert s1[0] == pytest.approx(s0[0] + 4.0)
    assert s1[1] == pytest.approx(s0[1] + 4.0 * (50.0 / 150.0))


# --------------------------------------------------- match_bool_prefix


def test_match_bool_prefix_expands_last_term(ray_session, tiny_index):
    from search_engine_ray.config import IndexConfig
    from search_engine_ray.query import SearchEngine

    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    # the prefix clause must match docs containing ANY 'ind'-prefixed
    # token (index, inverted...) even when the full terms miss
    q = Compound(
        should=(Term("content", "zzz_never"), Prefix("content", "ind")),
        min_should_match=1,
    )
    df = eng.search_all(q).to_pandas()
    assert len(df) > 0


# ------------------------------------------------------- compaction


def test_compact_parquet_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from search_engine_ray.ops.sinks import compact_parquet

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    t = pd.DataFrame({"k": np.arange(1000), "v": np.arange(1000) * 2})
    rd.from_pandas(t).repartition(10).write_parquet(src)
    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 10
    n_files = compact_parquet(src, dst, target_rows_per_file=500)
    assert n_files == 2
    back = pq.read_table(dst).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, t)
