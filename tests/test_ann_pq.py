"""Product quantization (PQIndex + ADC + exact re-rank): recall
floors vs exact brute-force cosine, self-match guarantees, and the
64x compression claim — on a deterministic clustered corpus."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pq_setup(ray_session, tmp_path_factory):
    import ray.data as rd

    from search_engine_ray.ops.ann import PQIndex

    rng = np.random.default_rng(11)
    # 40 cluster centers, 10 members each: nearest neighbors are the
    # cluster siblings, so recall is well-defined and non-trivial
    centers = rng.normal(size=(40, 64))
    vecs = np.repeat(centers, 10, axis=0) + 0.05 * rng.normal(size=(400, 64))
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].astype(np.float32).tolist()} for i in range(400)]
    )
    idx_dir = str(tmp_path_factory.mktemp("pq") / "idx")
    idx = PQIndex.build(ds, idx_dir, m=8, sample_size=400)
    return ds, idx, vecs


def _exact_topk(vecs, q, k):
    sims = vecs @ (q / np.linalg.norm(q))
    order = np.lexsort((np.arange(vecs.shape[0]), -np.round(sims, 4)))
    return set(order[:k].tolist())


def test_pq_codes_are_m_bytes(pq_setup):
    import glob
    import os

    import pyarrow.parquet as pq

    _ds, idx, _vecs = pq_setup
    files = glob.glob(os.path.join(idx.dir, "codes", "*.parquet"))
    t = pq.read_table(files)
    assert t.num_rows == 400
    codes = t["codes"].combine_chunks()
    assert len(codes[0]) == 8  # m uint8 codes per vector
    assert idx.codebooks.shape == (8, 256, 8)


def test_pq_adc_recall_and_self_match(pq_setup):
    ds, idx, vecs = pq_setup
    qids = np.arange(0, 100, 10)
    Q = vecs[qids]
    out = idx.search_batch(Q, qids, k=10).to_pandas()
    got = {int(q): set(g["vec_id"].tolist()) for q, g in out.groupby("qid")}
    # the identical vector is always retrieved at rank 1
    for q in qids:
        assert int(q) in got[int(q)]
    rec = np.mean([len(got[int(q)] & _exact_topk(vecs, vecs[q], 10)) / 10 for q in qids])
    assert rec >= 0.6, rec  # ADC-only floor on clustered data


def test_pq_rerank_recall(pq_setup):
    from search_engine_ray.ops.ann import pq_search_rerank

    ds, idx, vecs = pq_setup
    qids = np.arange(0, 100, 10)
    Q = vecs[qids]
    out = pq_search_rerank(idx, ds, Q, qids, k=10, rerank=4).to_pandas()
    assert set(out.groupby("qid").size()) == {10}  # exactly k per query
    got = {int(q): set(g["vec_id"].tolist()) for q, g in out.groupby("qid")}
    rec = np.mean([len(got[int(q)] & _exact_topk(vecs, vecs[q], 10)) / 10 for q in qids])
    assert rec >= 0.9, rec  # shortlist + exact re-rank recovers precision
    # re-ranked scores are exact cosines (self-match == 1.0)
    self_rows = out[out["qid"] == out["vec_id"]]
    assert (self_rows["cos"] == 1.0).all()


def test_pq_dim_not_divisible_rejected(ray_session, tmp_path):
    import ray.data as rd

    from search_engine_ray.ops.ann import PQIndex

    ds = rd.from_items([{"vec_id": 0, "embedding": [0.1] * 10}])
    with pytest.raises(ValueError):
        PQIndex.build(ds, str(tmp_path / "bad"), m=3)


def test_pq_search_rerank_empty_shortlist(ray_session, tmp_path):
    """ADVICE r03 regression: an empty ADC shortlist (query matches
    nothing / empty codes) returns an empty (qid, vec_id, cos) frame
    with pinned columns instead of IndexError."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.ops import ann

    rng = np.random.RandomState(3)
    vecs = rng.randn(40, 8).astype(np.float64)
    t = pa.table({
        "vec_id": pa.array(np.arange(40), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    })
    d = str(tmp_path / "pq")
    ann.PQIndex.build(rd.from_arrow(t), d, m=4)
    idx = ann.PQIndex(d)
    # empty query batch -> empty shortlist -> empty exact pass
    out = ann.pq_search_rerank(
        idx, rd.from_arrow(t), np.empty((0, 8)), np.empty(0, np.int64), k=5
    )
    assert out.count() == 0
    # schema stays pinned on the Dataset (Ray's to_pandas() drops
    # columns for ANY empty dataset — the r72 lesson — so consumers
    # must pin driver-side; the op guarantees the Arrow schema)
    assert {f for f in out.schema().names} >= {"qid", "vec_id", "cos"}
