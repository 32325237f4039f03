"""merge_indexes: sharded sub-indexes fold into ONE index that is
rank-and-score identical to a fresh single build over the same docs —
including tombstone fold-in and mixed input codecs."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import IndexConfig
from search_engine_ray.index import build_index, build_index_resumable, merge_indexes
from search_engine_ray.index.build import add_tombstones, load_tombstones
from search_engine_ray.query import Compound, SearchEngine, Term


def _split(tiny_corpus, tmp_path, n_files=3):
    src = tmp_path / "src"
    src.mkdir()
    n = tiny_corpus.num_rows
    files = []
    step = n // n_files
    for i in range(n_files):
        hi = n if i == n_files - 1 else (i + 1) * step
        p = str(src / f"part-{i}.parquet")
        pq.write_table(tiny_corpus.slice(i * step, hi - i * step), p)
        files.append(p)
    return files


QUERIES = [
    Compound(must=(Term("content", "import"),)),
    Compound(must=(Term("content", "tokenizer"),)),
    Compound(should=(Term("content", "wand"), Term("content", "bm25")), min_should_match=1),
]


def _assert_same_results(eng_a, eng_b, queries=QUERIES, k=10):
    for q in queries:
        ra, rb = eng_a.search(q, k=k), eng_b.search(q, k=k)
        assert ra.total == rb.total
        assert ra.hits["doc_id"].tolist() == rb.hits["doc_id"].tolist()
        np.testing.assert_allclose(
            ra.hits["score"].to_numpy(), rb.hits["score"].to_numpy(), rtol=0, atol=1e-9
        )


def test_merge_matches_single_build(ray_session, tiny_corpus, tmp_path):
    import ray.data as rd

    cfg = IndexConfig(num_buckets=4, num_parts=4)
    files = _split(tiny_corpus, tmp_path)
    out_r = str(tmp_path / "sharded")
    build_index_resumable(files, out_r, cfg, files_per_shard=1)
    shards = sorted(glob.glob(os.path.join(out_r, "shards", "shard_*")))
    assert len(shards) == 3

    out_m = str(tmp_path / "merged")
    stats = merge_indexes(shards, out_m, cfg)
    assert stats["n_docs"] == tiny_corpus.num_rows
    assert stats["tombstones_folded"] == 0

    out_s = str(tmp_path / "single")
    build_index(rd.from_arrow(tiny_corpus), out_s, cfg)
    _assert_same_results(SearchEngine(out_m, cfg), SearchEngine(out_s, cfg))
    # merged index is ONE dir (no shards/) with a fresh manifest
    assert os.path.exists(os.path.join(out_m, "manifest.json"))
    assert not os.path.isdir(os.path.join(out_m, "shards"))


def test_merge_folds_tombstones(ray_session, tiny_corpus, tmp_path):
    import ray.data as rd

    cfg = IndexConfig(num_buckets=4, num_parts=4)
    files = _split(tiny_corpus, tmp_path)
    out_r = str(tmp_path / "sharded")
    build_index_resumable(files, out_r, cfg, files_per_shard=1)
    shards = sorted(glob.glob(os.path.join(out_r, "shards", "shard_*")))

    # delete 20 docs via PARENT-level tombstones (the resumable layout)
    eng = SearchEngine(out_r, cfg)
    victims = eng.search(Compound(must=(Term("content", "import"),)), k=20).hits[
        "doc_id"
    ].to_numpy()
    add_tombstones(out_r, victims)

    out_m = str(tmp_path / "merged")
    stats = merge_indexes(shards, out_m, cfg, extra_tombstones=load_tombstones(out_r))
    assert stats["tombstones_folded"] == victims.size
    assert stats["n_docs"] == tiny_corpus.num_rows - victims.size

    # equals a fresh build over the surviving docs
    from search_engine_ray.index.build import doc_uid

    keep_rows = [
        i
        for i in range(tiny_corpus.num_rows)
        if doc_uid(
            [str(tiny_corpus["repo"][i].as_py()), str(tiny_corpus["path"][i].as_py())]
        )
        not in set(victims.tolist())
    ]
    surv = tiny_corpus.take(keep_rows)
    out_s = str(tmp_path / "single")
    build_index(rd.from_arrow(surv), out_s, cfg)
    _assert_same_results(SearchEngine(out_m, cfg), SearchEngine(out_s, cfg))
    # merged index starts with zero tombstones
    assert load_tombstones(out_m).size == 0


def test_merge_mixed_codecs_and_layouts(ray_session, tiny_corpus, tmp_path):
    """Inputs with different codecs AND different num_parts merge into
    one index identical to a single build."""
    import ray.data as rd

    files = _split(tiny_corpus, tmp_path, n_files=2)
    a_cfg = IndexConfig(num_buckets=4, num_parts=2, codec="varbyte")
    b_cfg = IndexConfig(num_buckets=4, num_parts=4, codec="for")
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(files[0], out_a, a_cfg)
    build_index(files[1], out_b, b_cfg)

    out_m = str(tmp_path / "merged")
    m_cfg = IndexConfig(num_buckets=4, num_parts=4, codec="for")
    stats = merge_indexes([out_a, out_b], out_m, m_cfg)
    assert stats["num_parts"] == 4 and stats["postings_format"] == 3

    out_s = str(tmp_path / "single")
    build_index(rd.from_arrow(tiny_corpus), out_s, m_cfg)
    _assert_same_results(SearchEngine(out_m, m_cfg), SearchEngine(out_s, m_cfg))


def test_merge_rejects_bucket_mismatch(ray_session, tiny_corpus, tmp_path):
    files = _split(tiny_corpus, tmp_path, n_files=2)
    build_index(files[0], str(tmp_path / "a"), IndexConfig(num_buckets=4, num_parts=2))
    build_index(files[1], str(tmp_path / "b"), IndexConfig(num_buckets=8, num_parts=2))
    with pytest.raises(ValueError, match="num_buckets"):
        merge_indexes([str(tmp_path / "a"), str(tmp_path / "b")], str(tmp_path / "m"))


# ------------------------------------------------- tiered merge policy


def test_plan_tiered_merge_policy():
    from search_engine_ray.index.merge import plan_tiered_merge

    # an over-full tier merges its fanout smallest members
    assert plan_tiered_merge({f"s{i}": 100 for i in range(5)}, fanout=4) == [
        ["s0", "s1", "s2", "s3"]
    ]
    # a giant shard is never rewritten to absorb small peers
    plan = plan_tiered_merge(
        {"big": 100_000, "a": 10, "b": 12, "c": 11, "d": 9, "e": 8}, fanout=4
    )
    assert plan == [["e", "d", "a", "c"]] and "big" not in plan[0]
    # nothing over-full -> no work
    assert plan_tiered_merge({"a": 10, "b": 12}, fanout=4) == []
    assert plan_tiered_merge({}, fanout=4) == []
    with pytest.raises(ValueError):
        plan_tiered_merge({"a": 1}, fanout=1)


def test_compact_shards_parity_and_recovery(ray_session, tiny_corpus, tmp_path):
    import json

    from search_engine_ray.index.merge import compact_shards

    cfg = IndexConfig(num_buckets=4, num_parts=4)
    files = _split(tiny_corpus, tmp_path, n_files=6)
    out = str(tmp_path / "tiered")
    build_index_resumable(files, out, cfg, files_per_shard=1)
    shard_root = os.path.join(out, "shards")
    assert len(glob.glob(os.path.join(shard_root, "shard_*"))) == 6

    # capture results BEFORE compaction (compaction deletes source
    # shard dirs, so the pre-compaction engine itself must not be
    # queried afterwards — the documented no-live-readers caveat)
    before = [SearchEngine(out, cfg).search(q, k=10) for q in QUERIES]
    manifest = compact_shards(out, cfg, fanout=4)
    shards_after = sorted(glob.glob(os.path.join(shard_root, "shard_*")))
    # 6 equal shards, fanout 4: one round merges 4 -> [merged, s4, s5]
    assert len(shards_after) == 3
    assert sum(e["n_docs"] for e in manifest["shards"].values()) == tiny_corpus.num_rows
    assert not glob.glob(os.path.join(shard_root, ".shard_*"))  # no hidden leftovers

    after = SearchEngine(out, cfg)

    def _check_vs_before(eng):
        for q, ra in zip(QUERIES, before):
            rb = eng.search(q, k=10)
            assert ra.total == rb.total
            assert ra.hits["doc_id"].tolist() == rb.hits["doc_id"].tolist()
            np.testing.assert_allclose(
                ra.hits["score"].to_numpy(), rb.hits["score"].to_numpy(), rtol=0, atol=1e-9
            )

    _check_vs_before(after)

    # interrupted-swap recovery: simulate a crash after the hidden
    # merge completed but before the rename — a rerun must finish it
    mpath = os.path.join(out, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    victims = sorted(m["shards"])[:2]
    hidden_name = "shard_m99999"
    merge_indexes(
        [os.path.join(shard_root, v) for v in victims],
        os.path.join(shard_root, "." + hidden_name),
        cfg,
    )
    n_docs = sum(m["shards"][v]["n_docs"] for v in victims)
    m["pending"] = {
        "new": hidden_name,
        "sources": victims,
        "entry": {"complete": True, "files": [], "n_docs": n_docs},
    }
    with open(mpath, "w") as f:
        json.dump(m, f)
    m2 = compact_shards(out, cfg, fanout=4)
    assert "pending" not in m2
    assert hidden_name in m2["shards"]
    assert not any(v in m2["shards"] for v in victims)
    _check_vs_before(SearchEngine(out, cfg))


def test_merge_groups_parity(ray_session, tiny_corpus, tmp_path):
    """The bucket-group merge split (merge_groups>1) is a build-time
    scheduling change only: postings layout, per-part dictionaries and
    query results are identical to the single-task-per-part merge."""
    import ray.data as rd

    outs = {}
    for mg in (1, 4):
        cfg = IndexConfig(num_buckets=4, num_parts=2, merge_groups=mg)
        out = str(tmp_path / f"mg{mg}")
        build_index(rd.from_arrow(tiny_corpus), out, cfg)
        outs[mg] = (out, cfg)
    _assert_same_results(
        SearchEngine(*outs[1]), SearchEngine(*outs[4])
    )
    for k in range(2):
        d1 = pq.read_table(os.path.join(outs[1][0], "dict", f"part={k}", "dict.parquet"))
        d4 = pq.read_table(os.path.join(outs[4][0], "dict", f"part={k}", "dict.parquet"))
        assert d1.equals(d4)
    b1 = sorted(
        p.split("postings/")[1]
        for p in glob.glob(os.path.join(outs[1][0], "postings", "**", "*.parquet"), recursive=True)
    )
    b4 = sorted(
        p.split("postings/")[1]
        for p in glob.glob(os.path.join(outs[4][0], "postings", "**", "*.parquet"), recursive=True)
    )
    assert b1 == b4
