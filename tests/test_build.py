"""Index build invariants: sha256 row integrity, determinism across
parallelism levels, checkpoint-resume (SURVEY.md §5 items 3-4)."""

import glob
import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from search_engine_ray.config import IndexConfig
from search_engine_ray.index import build_index, build_index_resumable
from search_engine_ray.query import Compound, SearchEngine, Term


def test_sha256_row_integrity(tiny_index, tiny_corpus):
    """Per-row content sha256 equality source -> docmap (input_hint)."""
    out, cfg, _ = tiny_index
    dm = pads.dataset(os.path.join(out, "docmap"), partitioning="hive").to_table()
    df = dm.to_pandas().set_index(["repo", "path"])
    src = tiny_corpus.to_pandas()
    assert len(df) == len(src)
    for _, row in src.iterrows():
        expect = hashlib.sha256(row["content"].encode()).hexdigest()
        assert df.loc[(row["repo"], row["path"]), "content_sha256"] == expect


def test_stats_consistency(tiny_index, tiny_corpus):
    out, cfg, stats = tiny_index
    assert stats["n_docs"] == tiny_corpus.num_rows
    from search_engine_ray.analysis import analyze

    total = sum(len(analyze(t)) for t in tiny_corpus["content"].to_pylist())
    assert stats["fields"]["content"]["total_len"] == total


def test_build_deterministic_across_parallelism(ray_session, tiny_corpus, tmp_path):
    """Same corpus via different block structure -> identical query
    results (deterministic doc ids + order-independent merge)."""
    import ray.data as rd

    cfg = IndexConfig(num_buckets=4, num_parts=4)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(rd.from_arrow(tiny_corpus).repartition(1), a, cfg)
    build_index(rd.from_arrow(tiny_corpus).repartition(7), b, cfg)
    q = Compound(must=(Term("content", "import"),))
    ra = SearchEngine(a, cfg).search(q, k=20)
    rb = SearchEngine(b, cfg).search(q, k=20)
    assert ra.total == rb.total
    assert ra.hits["doc_id"].tolist() == rb.hits["doc_id"].tolist()
    np.testing.assert_array_equal(ra.hits["score"].to_numpy(), rb.hits["score"].to_numpy())


def test_resumable_build_matches_single_build(ray_session, tiny_corpus, tmp_path):
    import pyarrow.parquet as pq

    cfg = IndexConfig(num_buckets=4, num_parts=4)
    # split the corpus into 4 input files
    src = tmp_path / "src"
    src.mkdir()
    n = tiny_corpus.num_rows
    files = []
    for i in range(4):
        p = str(src / f"part-{i}.parquet")
        pq.write_table(tiny_corpus.slice(i * n // 4, n // 4), p)
        files.append(p)

    out_r = str(tmp_path / "resumable")
    manifest = build_index_resumable(files, out_r, cfg, files_per_shard=1)
    assert len(manifest["shards"]) == 4
    assert all(s["complete"] for s in manifest["shards"].values())

    # rerun: all shards skipped (mtimes unchanged)
    mtimes = {d: os.path.getmtime(d) for d in glob.glob(os.path.join(out_r, "shards", "*"))}
    build_index_resumable(files, out_r, cfg, files_per_shard=1)
    assert mtimes == {d: os.path.getmtime(d) for d in glob.glob(os.path.join(out_r, "shards", "*"))}

    # partial manifest -> only missing shards rebuilt, results identical
    out_p = str(tmp_path / "partial")
    build_index_resumable(files[:2], out_p, cfg, files_per_shard=1)
    build_index_resumable(files, out_p, cfg, files_per_shard=1)

    import ray.data as rd

    out_s = str(tmp_path / "single")
    build_index(rd.from_arrow(tiny_corpus), out_s, cfg)
    q = Compound(must=(Term("content", "tokenizer"),))
    rs = SearchEngine(out_s, cfg).search(q, k=20)
    # Dataset path too: search_all on a multi-shard index decodes each
    # row's rank stream against its OWN shard's universe (shard-tagged
    # reads) — must match the single-build stream exactly
    sa_s = (
        SearchEngine(out_s, cfg)
        .search_all(q)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for out in (out_r, out_p):
        eng = SearchEngine(out, cfg)
        rr = eng.search(q, k=20)
        assert rr.total == rs.total
        assert rr.hits["doc_id"].tolist() == rs.hits["doc_id"].tolist()
        np.testing.assert_array_equal(rr.hits["score"].to_numpy(), rs.hits["score"].to_numpy())
        sa_r = eng.search_all(q).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert sa_r["doc_id"].tolist() == sa_s["doc_id"].tolist()
        np.testing.assert_allclose(sa_r["score"].to_numpy(), sa_s["score"].to_numpy())


def test_postings_are_compressed_and_blocked(tiny_index):
    out, cfg, _ = tiny_index
    t = pads.dataset(
        glob.glob(os.path.join(out, "postings", "part=*", "bucket=*", "*.parquet"))
    ).to_table()
    assert t.num_rows > 0
    dfl = t["df_local"].to_numpy()
    # hot-term salting: no single (term,bucket) group exceeds one bucket's doc count
    assert dfl.max() <= 200
    # block metadata sized ceil(df/block_size)
    one = t.slice(0, 1).to_pylist()[0]
    import math

    assert len(one["blk_first"]) == math.ceil(one["df_local"] / cfg.block_size)


def test_corpus_generator_deterministic(tiny_corpus):
    from search_engine_ray.corpus import corpus_table

    again = corpus_table(200, seed=42)
    assert again.equals(tiny_corpus)


def test_derive_num_parts_bound():
    """Round-2: num_parts derives from input size so one part's decoded
    partials never exceed the merge task's memory target."""
    from search_engine_ray.config import IndexConfig, derive_num_parts

    cfg = IndexConfig(num_parts=8, merge_part_target_bytes=1 << 30)
    assert derive_num_parts(cfg, 0) == 8  # unknown size -> configured
    assert derive_num_parts(cfg, 1 << 20) == 8  # small corpus -> unchanged
    # 100 GiB input * 3x expansion / 1 GiB target = 300 parts
    assert derive_num_parts(cfg, 100 << 30) == 300
    # derived parts x target always covers the estimated decoded bytes
    for gb in (1, 7, 64, 1024):
        n = derive_num_parts(cfg, gb << 30)
        assert n * cfg.merge_part_target_bytes >= (gb << 30) * 3
    frozen = IndexConfig(num_parts=8, auto_num_parts=False)
    assert derive_num_parts(frozen, 100 << 30) == 8


def test_auto_num_parts_build_query_parity(ray_session, tiny_corpus, tmp_path):
    """A build whose num_parts was auto-raised must produce identical
    query results; the engine reconciles its layout from stats.json
    even when constructed with the original (smaller) config."""
    import ray.data as rd

    from search_engine_ray.config import IndexConfig
    from search_engine_ray.index import build_index
    from search_engine_ray.query import Compound, SearchEngine, Term

    src = str(tmp_path / "src")
    rd.from_arrow(tiny_corpus).write_parquet(src)
    base_cfg = IndexConfig(num_buckets=4, num_parts=2)
    out_a = str(tmp_path / "idx_default")
    build_index(src, out_a, base_cfg)
    # absurdly small target -> derivation raises num_parts
    tiny_cfg = IndexConfig(num_buckets=4, num_parts=2, merge_part_target_bytes=1 << 14)
    out_b = str(tmp_path / "idx_many_parts")
    stats_b = build_index(src, out_b, tiny_cfg)
    assert stats_b["num_parts"] > 2
    ea = SearchEngine(out_a, base_cfg)
    # construct with the ORIGINAL config: engine must pick up the
    # on-disk num_parts from stats.json
    eb = SearchEngine(out_b, tiny_cfg)
    assert eb.config.num_parts == stats_b["num_parts"]
    for tok in ("import", "tokenizer", "def"):
        q = Compound(must=(Term("content", tok),))
        ra = ea.search(q, k=10, with_metadata=False)
        rb = eb.search(q, k=10, with_metadata=False)
        assert ra.total == rb.total
        assert ra.hits["doc_id"].tolist() == rb.hits["doc_id"].tolist()
        assert ra.hits["score"].tolist() == rb.hits["score"].tolist()


def test_codec_parity_varbyte_vs_for(ray_session, tiny_corpus, tmp_path):
    """The same corpus built with the varbyte (v2) and FOR (v3) codecs
    returns identical results on both the exhaustive and the
    block-max-pruned query paths, and the FOR postings are smaller."""
    import glob as _glob
    import json as _json

    import ray.data as rd

    a = str(tmp_path / "vb")
    b = str(tmp_path / "for")
    cfg_vb = IndexConfig(num_buckets=4, num_parts=4, codec="varbyte")
    cfg_for = IndexConfig(num_buckets=4, num_parts=4, codec="for")
    build_index(rd.from_arrow(tiny_corpus), a, cfg_vb)
    build_index(rd.from_arrow(tiny_corpus), b, cfg_for)
    with open(f"{a}/stats.json") as f:
        assert _json.load(f)["postings_format"] == 2
    with open(f"{b}/stats.json") as f:
        assert _json.load(f)["postings_format"] == 3
    ea, eb = SearchEngine(a, cfg_vb), SearchEngine(b, cfg_for)
    for q in (
        Compound(must=(Term("content", "import"),)),
        Compound(should=(Term("content", "def"), Term("content", "return"))),
    ):
        ra, rb = ea.search(q, k=25), eb.search(q, k=25)
        assert ra.total == rb.total
        assert ra.hits["doc_id"].tolist() == rb.hits["doc_id"].tolist()
        np.testing.assert_array_equal(
            ra.hits["score"].to_numpy(), rb.hits["score"].to_numpy()
        )
    # pruned top-k (wand) agrees across codecs too
    qp = Compound(should=(Term("content", "import"), Term("content", "self")))
    pa_, pb_ = ea.search(qp, k=10, prune=True), eb.search(qp, k=10, prune=True)
    assert pa_.hits["doc_id"].tolist() == pb_.hits["doc_id"].tolist()

    def _stream_bytes(d):
        # raw (uncompressed) stream bytes — what the codec controls;
        # parquet's own page compression masks the delta on disk
        tot = 0
        for f in _glob.glob(os.path.join(d, "postings", "**", "*.parquet"), recursive=True):
            t = pads.dataset(f).to_table(columns=["doc_bytes", "tf_bytes", "dl_bytes"])
            tot += sum(t[c].combine_chunks().nbytes for c in t.column_names)
        return tot

    # at 200 tiny docs most terms are singletons where the FOR header
    # (5 B) loses to a short varbyte rank; allow a small regression
    # here — at 100k docs the FOR streams measure ~31% smaller
    # (BASELINE.md codec table)
    assert _stream_bytes(b) < 1.25 * _stream_bytes(a)


def test_integrity_check(ray_session, tiny_index, tiny_corpus, tmp_path):
    """fsck: a clean index passes every check (structure, full stream
    decode, per-row sha256 vs the source — the north-rule invariant);
    seeded corruptions are each detected."""
    import glob as _g
    import json
    import os
    import shutil

    import ray.data as rd

    from search_engine_ray.index import integrity_check

    out, cfg, _ = tiny_index
    rep = integrity_check(
        out, cfg, decode=True, source=rd.from_arrow(tiny_corpus), sha_col="content"
    )
    assert rep["ok"], rep["errors"]
    assert rep["checks"]["docs"] == 200
    assert rep["checks"]["decoded_rows"] > 0
    assert rep["checks"]["sha_missing"] == 0
    assert rep["checks"]["sha_extra"] == 0
    assert rep["checks"]["sha_mismatch"] == 0

    # stats n_docs drift
    bad = str(tmp_path / "fsck_bad1")
    shutil.copytree(out, bad)
    st = json.load(open(os.path.join(bad, "stats.json")))
    st["n_docs"] += 1
    json.dump(st, open(os.path.join(bad, "stats.json"), "w"))
    rep2 = integrity_check(bad, cfg)
    assert not rep2["ok"] and any("n_docs" in e for e in rep2["errors"])

    # orphan postings (dictionary part dropped)
    bad2 = str(tmp_path / "fsck_bad2")
    shutil.copytree(out, bad2)
    for f in _g.glob(os.path.join(bad2, "dict", "part=0", "*.parquet")):
        os.remove(f)
    rep3 = integrity_check(bad2, cfg)
    assert not rep3["ok"] and any("missing from dict" in e for e in rep3["errors"])

    # source drift: one doc's content no longer matches its indexed sha
    t = tiny_corpus.to_pandas()
    t.loc[0, "content"] = (t.loc[0, "content"] or "") + " CORRUPTED"
    rep4 = integrity_check(out, cfg, source=rd.from_pandas(t), sha_col="content")
    assert not rep4["ok"]
    assert rep4["checks"]["sha_mismatch"] == 1

    # unknown tombstone id
    bad3 = str(tmp_path / "fsck_bad3")
    shutil.copytree(out, bad3)
    from search_engine_ray.index.build import add_tombstones

    add_tombstones(bad3, [999_999_999_999])
    rep5 = integrity_check(bad3, cfg)
    assert not rep5["ok"] and any("unknown doc ids" in e for e in rep5["errors"])


def test_integrity_check_sparse_buckets(ray_session, tmp_path):
    """fsck deep decode on an index whose doc ids populate only SOME
    buckets (native ids, all multiples of 4 with num_buckets=8 -> only
    even buckets exist). Regression: the bucket->universe map must key
    on the real bucket number, not the positional order of non-empty
    docmap dirs."""
    import pyarrow as pa

    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index, integrity_check

    docs = pa.table(
        {
            "doc_id": pa.array([i * 4 for i in range(60)], pa.int64()),
            "content": pa.array(
                [f"alpha beta {'gamma ' * (i % 3)}delta_{i % 7}" for i in range(60)]
            ),
        }
    )
    cfg = IndexConfig(
        fields=(FieldSpec("content", "c"),),
        num_buckets=8,
        num_parts=2,
        docmap_cols=(),
        id_cols=("doc_id",),
        use_native_id=True,
    )
    out = str(tmp_path / "sparse")
    import ray.data as rd

    build_index(rd.from_arrow(docs), out, cfg)
    rep = integrity_check(out, cfg, decode=True)
    assert rep["ok"], rep["errors"][:5]
    assert rep["checks"]["docs"] == 60 and rep["checks"]["decoded_rows"] > 0


def test_resumable_build_accepts_directory_string(ray_session, tiny_corpus, tmp_path):
    """A bare path string must expand to the dir's parquet files — NOT
    iterate as characters (sorted('<str>') yields chars; a '/' element
    sent _input_bytes recursively globbing the root filesystem, which
    never terminates inside the /proc/self/root symlink loop)."""
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    n = tiny_corpus.num_rows
    for i in range(2):
        pq.write_table(tiny_corpus.slice(i * n // 2, n // 2), str(src / f"part-{i}.parquet"))
    cfg = IndexConfig(num_buckets=4, num_parts=4)
    out = str(tmp_path / "resumable_dir")
    manifest = build_index_resumable(str(src), out, cfg, files_per_shard=1)
    assert len(manifest["shards"]) == 2
    assert all(s["complete"] for s in manifest["shards"].values())
    # rerun with the same directory string: every shard skipped
    mtimes = {d: os.path.getmtime(d) for d in glob.glob(os.path.join(out, "shards", "*"))}
    build_index_resumable(str(src), out, cfg, files_per_shard=1)
    assert mtimes == {d: os.path.getmtime(d) for d in glob.glob(os.path.join(out, "shards", "*"))}
    # and the sharded result answers queries like a single build
    out_s = str(tmp_path / "single_dir")
    build_index(str(src), out_s, cfg)
    q = Compound(must=(Term("content", "tokenizer"),))
    rs = SearchEngine(out_s, cfg).search(q, k=10)
    rr = SearchEngine(out, cfg).search(q, k=10)
    assert rr.total == rs.total
    assert rr.hits["doc_id"].tolist() == rs.hits["doc_id"].tolist()
