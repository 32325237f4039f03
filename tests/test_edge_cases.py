"""Edge-case robustness: empty corpus, single doc, null text, skewed
hot term — build and query must not crash and must stay consistent."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.config import IndexConfig
from search_engine_ray.index import build_index
from search_engine_ray.query import Compound, Prefix, SearchEngine, Term


def test_single_doc_index(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table(
        {
            "repo": ["o/r"],
            "path": ["a.py"],
            "commit": ["c" * 40],
            "lang": ["python"],
            "content": ["import tokenizer import"],
        }
    )
    cfg = IndexConfig(num_buckets=4, num_parts=4)
    out = str(tmp_path / "one")
    stats = build_index(rd.from_arrow(t), out, cfg)
    assert stats["n_docs"] == 1
    assert stats["fields"]["content"]["avgdl"] == 3.0
    eng = SearchEngine(out, cfg)
    r = eng.search(Compound(must=(Term("content", "import"),)), k=5)
    assert r.total == 1 and len(r.hits) == 1
    # tf=2 for "import"
    assert r.hits["score"].iloc[0] > 0


def test_null_and_empty_content(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table(
        {
            "repo": ["o/r", "o/r", "o/r"],
            "path": ["a.py", "b.py", "c.py"],
            "commit": ["c" * 40] * 3,
            "lang": ["python"] * 3,
            "content": pa.array(["import x", "", None], pa.string()),
        }
    )
    cfg = IndexConfig(num_buckets=2, num_parts=2)
    out = str(tmp_path / "nulls")
    stats = build_index(rd.from_arrow(t), out, cfg)
    assert stats["n_docs"] == 3
    eng = SearchEngine(out, cfg)
    r = eng.search(Compound(must=(Term("content", "import"),)), k=5)
    assert r.total == 1


def test_hot_term_bucket_salting(ray_session, tmp_path):
    """A term present in EVERY doc still never forms a merge group
    larger than one bucket's doc count (the built-in salt)."""
    import glob
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    n = 400
    t = pa.table(
        {
            "repo": [f"o/r{i % 5}" for i in range(n)],
            "path": [f"f{i}.py" for i in range(n)],
            "commit": ["c" * 40] * n,
            "lang": ["python"] * n,
            "content": ["hotterm filler%d" % i for i in range(n)],
        }
    )
    cfg = IndexConfig(num_buckets=8, num_parts=4)
    out = str(tmp_path / "hot")
    build_index(rd.from_arrow(t), out, cfg)
    files = glob.glob(os.path.join(out, "postings", "part=*", "bucket=*", "*.parquet"))
    pt = pads.dataset(files).to_table(columns=["term", "df_local"])
    hot = pt.filter(pa.compute.equal(pt["term"], "c:hotterm"))
    assert hot.num_rows == cfg.num_buckets  # split across every bucket
    assert max(hot["df_local"].to_pylist()) < n  # no single giant group
    assert sum(hot["df_local"].to_pylist()) == n
    eng = SearchEngine(out, cfg)
    assert eng.search(Compound(must=(Term("content", "hotterm"),)), k=3).total == n


def test_prefix_longer_than_ngram_window(ray_session, tiny_index):
    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    # prefix longer than ngram_max on an ngram field -> range-scan path
    long_prefix = Prefix("path", "tokenizer_")
    r = eng.search(Compound(should=(long_prefix,), min_should_match=1), k=5)
    assert r.total >= 0  # must not crash; matches if any path token has the prefix


def test_tombstone_deletes(ray_session, tiny_corpus, tmp_path):
    """Incremental DELETE: tombstoned docs vanish from totals, pages,
    facets and search_all; rebuild compacts them away."""
    import ray.data as rd

    from search_engine_ray.index import build_index
    from search_engine_ray.index.build import add_tombstones, load_tombstones

    cfg = IndexConfig(num_buckets=4, num_parts=4)
    out = str(tmp_path / "tomb")
    build_index(rd.from_arrow(tiny_corpus), out, cfg)
    eng = SearchEngine(out, cfg)
    q = Compound(must=(Term("content", "import"),))
    before = eng.search(q, k=5, facet_fields=("lang",))
    victims = before.hits["doc_id"].tolist()[:3]
    n = add_tombstones(out, victims)
    assert n == 3
    assert load_tombstones(out).size == 3
    eng2 = SearchEngine(out, cfg)  # reload picks up tombstones
    after = eng2.search(q, k=5, facet_fields=("lang",))
    assert after.total == before.total - 3
    assert not set(victims) & set(after.hits["doc_id"])
    assert sum(after.facets["lang"].values()) == after.total
    # search_all excludes them too
    sa = eng2.search_all(q).to_pandas()
    assert len(sa) == after.total and not set(victims) & set(sa["doc_id"])
    # idempotent re-delete
    assert add_tombstones(out, victims) == 3
    # prune falls back to exhaustive under tombstones (totals stay exact)
    qo = Compound(should=(Term("content", "import"),))
    rp = eng2.search(qo, k=5, prune=True, with_metadata=False)
    assert rp.total_exact


@pytest.mark.parametrize("codec", ["for", "varbyte"])
def test_tombstone_compaction(ray_session, tiny_corpus, tmp_path, codec):
    """compact_tombstones physically removes deleted docs: results
    equal the tombstone-filtered view, stats shrink, tombstones clear,
    and scoring idf/avgdl reflect the smaller corpus (equal to an
    oracle built on the surviving docs). Runs under BOTH postings
    codecs — compaction decodes and re-encodes with the on-disk one."""
    import numpy as np
    import ray.data as rd

    from search_engine_ray.index import build_index
    from search_engine_ray.index.build import (
        add_tombstones,
        compact_tombstones,
        load_tombstones,
    )
    from search_engine_ray.oracle import build_oracle, oracle_search

    cfg = IndexConfig(num_buckets=4, num_parts=4, codec=codec)
    out = str(tmp_path / "cmp")
    build_index(rd.from_arrow(tiny_corpus), out, cfg)
    eng = SearchEngine(out, cfg)
    q = Compound(must=(Term("content", "import"),))
    victims = eng.search(q, k=4, with_metadata=False).hits["doc_id"].tolist()
    add_tombstones(out, victims)
    removed = compact_tombstones(out, cfg)
    assert removed == 4
    assert load_tombstones(out).size == 0
    eng2 = SearchEngine(out, cfg)
    assert eng2.tombstones is None
    assert eng2.stats["n_docs"] == tiny_corpus.num_rows - 4

    # surviving-corpus oracle must agree EXACTLY (idf/avgdl recomputed)
    import pyarrow.dataset as pads

    dm = pads.dataset(f"{out}/docmap", partitioning="hive").to_table()
    keep_keys = set(zip(dm["repo"].to_pylist(), dm["path"].to_pylist()))
    mask = [
        (r, p) in keep_keys
        for r, p in zip(tiny_corpus["repo"].to_pylist(), tiny_corpus["path"].to_pylist())
    ]
    import pyarrow as pa

    survivors = tiny_corpus.filter(pa.array(mask))
    assert survivors.num_rows == tiny_corpus.num_rows - 4
    res = eng2.search(q, k=10, with_metadata=False)
    ora = oracle_search(build_oracle(survivors, cfg), q, k=10)
    assert res.total == ora.total
    assert res.hits["doc_id"].tolist() == ora.hits["doc_id"].tolist()
    np.testing.assert_allclose(res.hits["score"].to_numpy(), ora.hits["score"].to_numpy(), atol=1e-9)


def test_tombstones_visible_to_live_engine(ray_session, tiny_corpus, tmp_path):
    """Round-2: deletes take effect on the NEXT search of an EXISTING
    engine (tombstones are re-read when the tombstone dir changes) —
    no engine reconstruction needed."""
    import ray.data as rd

    from search_engine_ray.index import build_index
    from search_engine_ray.index.build import add_tombstones

    cfg = IndexConfig(num_buckets=4, num_parts=4)
    out = str(tmp_path / "live")
    build_index(rd.from_arrow(tiny_corpus), out, cfg)
    eng = SearchEngine(out, cfg)
    q = Compound(must=(Term("content", "import"),))
    before = eng.search(q, k=5, with_metadata=False)
    victims = before.hits["doc_id"].tolist()[:2]
    add_tombstones(out, victims)
    after = eng.search(q, k=5, with_metadata=False)  # SAME engine
    assert after.total == before.total - 2
    assert not set(victims) & set(after.hits["doc_id"])


def test_tombstone_compaction_sharded(ray_session, tiny_corpus, tmp_path):
    """Round-2 regression (ADVICE): compact_tombstones on a resumable
    multi-shard index must compact every shard and clear the parent
    tombstones (round-1 read the single-build layout only and crashed
    on stats.json)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from search_engine_ray.index.build import (
        add_tombstones,
        build_index_resumable,
        compact_tombstones,
        load_tombstones,
    )

    src = str(tmp_path / "src")
    rd.from_arrow(tiny_corpus).repartition(4).write_parquet(src)
    import glob as g

    files = sorted(g.glob(f"{src}/*.parquet"))
    cfg = IndexConfig(num_buckets=4, num_parts=4)
    out = str(tmp_path / "sharded")
    manifest = build_index_resumable(files, out, cfg, files_per_shard=2)
    assert len(manifest["shards"]) == 2
    eng = SearchEngine(out, cfg)
    q = Compound(must=(Term("content", "import"),))
    before = eng.search(q, k=6, with_metadata=False)
    victims = before.hits["doc_id"].tolist()[:4]
    add_tombstones(out, victims)
    removed = compact_tombstones(out, cfg)
    assert removed == 4
    assert load_tombstones(out).size == 0
    eng2 = SearchEngine(out, cfg)
    assert eng2.stats["n_docs"] == tiny_corpus.num_rows - 4
    after = eng2.search(q, k=10, with_metadata=False)
    assert after.total == before.total - 4
    assert not set(victims) & set(after.hits["doc_id"])


def test_compaction_respects_derived_num_parts(ray_session, tiny_corpus, tmp_path):
    """Round-2 review fix: compact_tombstones must read the on-disk
    num_parts from stats.json — a build with auto-raised num_parts
    compacted with the caller's smaller config would skip parts,
    resurrect deleted docs and corrupt avgdl."""
    import ray.data as rd

    from search_engine_ray.index import build_index
    from search_engine_ray.index.build import add_tombstones, compact_tombstones

    src = str(tmp_path / "src")
    rd.from_arrow(tiny_corpus).write_parquet(src)
    # absurdly small target -> num_parts raised above the configured 2
    cfg = IndexConfig(num_buckets=4, num_parts=2, merge_part_target_bytes=1 << 14)
    out = str(tmp_path / "auto")
    stats = build_index(src, out, cfg)
    assert stats["num_parts"] > 2
    eng = SearchEngine(out, cfg)
    q = Compound(must=(Term("content", "import"),))
    before = eng.search(q, k=5, with_metadata=False)
    victims = before.hits["doc_id"].tolist()[:3]
    add_tombstones(out, victims)
    removed = compact_tombstones(out, cfg)  # caller passes the SMALL config
    assert removed == 3
    eng2 = SearchEngine(out, cfg)
    after = eng2.search(q, k=10, with_metadata=False)
    assert after.total == before.total - 3
    assert not set(victims) & set(after.hits["doc_id"])
    assert eng2.stats["n_docs"] == tiny_corpus.num_rows - 3


def test_empty_corpus_build_and_search(ray_session, tmp_path):
    """Zero-row input: build succeeds with n_docs=0 and queries return
    empty exact results (no crash anywhere in the pipeline)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.index import build_index

    t = pa.table(
        {c: pa.array([], pa.string()) for c in ("repo", "path", "commit", "lang", "content")}
    )
    src = str(tmp_path / "empty.parquet")
    pq.write_table(t, src)
    cfg = IndexConfig(num_buckets=4, num_parts=4)
    out = str(tmp_path / "empty_idx")
    stats = build_index(src, out, cfg)
    assert stats["n_docs"] == 0
    eng = SearchEngine(out, cfg)
    r = eng.search(Compound(must=(Term("content", "x"),)), k=5)
    assert r.total == 0 and r.total_exact


def test_upsert_documents_delete_add_parity(ray_session, tiny_corpus, tmp_path):
    """Index-level bulk upsert (Lucene updateDocument semantics):
    replacing docs by id + adding new ones yields an index that is
    rank/score-identical to a fresh build over the upserted logical
    corpus; a second upsert of the same ids is last-writer-wins."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from search_engine_ray.index import build_index_resumable, upsert_documents
    from search_engine_ray.oracle import build_oracle, oracle_search

    cfg = IndexConfig(num_buckets=4, num_parts=4)
    src = tmp_path / "src"
    src.mkdir()
    files = []
    for i in range(3):
        p = str(src / f"part-{i}.parquet")
        hi = 200 if i == 2 else (i + 1) * 66
        pq.write_table(tiny_corpus.slice(i * 66, hi - i * 66), p)
        files.append(p)
    out = str(tmp_path / "ups")
    build_index_resumable(files, out, cfg, files_per_shard=1)

    # replace 5 existing docs (same repo/path => same uid, new content)
    # and add 3 brand-new docs
    rep = [0, 1, 50, 120, 199]
    up = pa.table(
        {
            "repo": [tiny_corpus["repo"][i].as_py() for i in rep] + ["new/repo"] * 3,
            "path": [tiny_corpus["path"][i].as_py() for i in rep]
            + [f"brand_new_{j}.py" for j in range(3)],
            "commit": ["d" * 40] * 8,
            "lang": ["python"] * 8,
            "content": [f"replacement zzznewterm text number {i}" for i in rep]
            + [f"added zzznewterm doc {j}" for j in range(3)],
        }
    )
    up = up.select(tiny_corpus.column_names).cast(
        pa.schema([tiny_corpus.schema.field(c) for c in tiny_corpus.column_names])
    )
    res = upsert_documents(out, up, cfg)
    assert res["replaced"] == 5 and res["added"] == 3

    # logical corpus after the upsert
    keep = np.ones(tiny_corpus.num_rows, dtype=bool)
    keep[rep] = False
    logical = pa.concat_tables([tiny_corpus.filter(pa.array(keep)), up])
    oix = build_oracle(logical, cfg)

    eng = SearchEngine(out, cfg)
    assert eng.stats["n_docs"] == logical.num_rows
    for q in (
        Compound(must=(Term("content", "zzznewterm"),)),   # only in upserted docs
        Compound(must=(Term("content", "import"),)),        # broad term
        Compound(must=(Term("content", "replacement"), Term("content", "text"))),
    ):
        r = eng.search(q, k=10)
        o = oracle_search(oix, q, k=10)
        assert r.total == o.total
        assert r.hits["doc_id"].tolist() == o.hits["doc_id"].tolist()
        np.testing.assert_allclose(
            r.hits["score"].to_numpy(), o.hits["score"].to_numpy(), rtol=0, atol=1e-9
        )
    # replaced docs' OLD content must be gone
    assert eng.search(Compound(must=(Term("content", "zzznewterm"),)), k=10).total == 8

    # second upsert of one id: last writer wins
    up2 = up.slice(0, 1).set_column(
        4, "content", pa.array(["rewritten qqqfinal body"], pa.string())
    )
    res2 = upsert_documents(out, up2, cfg)
    assert res2["replaced"] == 1 and res2["added"] == 0
    eng2 = SearchEngine(out, cfg)
    assert eng2.search(Compound(must=(Term("content", "qqqfinal"),)), k=5).total == 1
    assert eng2.search(Compound(must=(Term("content", "zzznewterm"),)), k=10).total == 7
    assert eng2.stats["n_docs"] == logical.num_rows

    # duplicate ids within one batch are ambiguous -> reject
    dup = pa.concat_tables([up.slice(0, 1), up.slice(0, 1)])
    with pytest.raises(ValueError):
        upsert_documents(out, dup, cfg)


def test_upsert_can_empty_a_shard(ray_session, tmp_path):
    """Replacing EVERY doc of one shard leaves an empty shard behind —
    builds, stats and queries must stay consistent."""
    import pyarrow.parquet as pq

    from search_engine_ray.index import build_index_resumable, upsert_documents

    t = pa.table(
        {
            "repo": ["o/r"] * 6,
            "path": [f"f{i}.py" for i in range(6)],
            "commit": ["c" * 40] * 6,
            "lang": ["python"] * 6,
            "content": [f"alpha beta doc{i}" for i in range(6)],
        }
    )
    src = tmp_path / "s"
    src.mkdir()
    files = []
    for i in range(3):
        p = str(src / f"p{i}.parquet")
        pq.write_table(t.slice(i * 2, 2), p)
        files.append(p)
    out = str(tmp_path / "ups2")
    cfg = IndexConfig(num_buckets=2, num_parts=2)
    build_index_resumable(files, out, cfg, files_per_shard=1)

    up = t.slice(0, 2).set_column(
        4, "content", pa.array(["gamma replaced one", "gamma replaced two"], pa.string())
    )
    res = upsert_documents(out, up, cfg)
    assert res["replaced"] == 2 and res["added"] == 0
    eng = SearchEngine(out, cfg)
    assert eng.stats["n_docs"] == 6
    assert eng.search(Compound(must=(Term("content", "gamma"),)), k=5).total == 2
    assert eng.search(Compound(must=(Term("content", "alpha"),)), k=10).total == 4
    assert eng.search(Compound(must=(Term("content", "doc0"),)), k=5).total == 0


def test_upsert_legacy_manifest_pins_sibling_layout(ray_session, tiny_corpus, tmp_path):
    """A manifest predating the num_parts key must not let the delta
    shard derive a different on-disk layout than its siblings (mixed
    num_parts would silently break query-side part pruning)."""
    import json
    import os

    import pyarrow.parquet as pq

    from search_engine_ray.index import build_index_resumable, upsert_documents

    cfg = IndexConfig(num_buckets=4, num_parts=4)
    src = tmp_path / "src"
    src.mkdir()
    p = str(src / "all.parquet")
    pq.write_table(tiny_corpus, p)
    out = str(tmp_path / "legacy")
    build_index_resumable([p], out, cfg, files_per_shard=1)
    mpath = os.path.join(out, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m.pop("num_parts", None)  # simulate the legacy manifest
    with open(mpath, "w") as f:
        json.dump(m, f)

    up = tiny_corpus.slice(0, 2).set_column(
        4, "content",
        pa.array(["legacy upsert qqlegacy one", "legacy upsert qqlegacy two"],
                 tiny_corpus.schema.field("content").type),
    )
    # auto_num_parts would derive a tiny-layout value from 2 docs;
    # the fallback must pin the sibling shard's num_parts=4 instead
    res = upsert_documents(out, up, IndexConfig(num_buckets=4, num_parts=1, auto_num_parts=True))
    assert res["replaced"] == 2
    delta = os.path.join(out, "shards", res["shard"])
    with open(os.path.join(delta, "stats.json")) as f:
        assert json.load(f)["num_parts"] == 4
    eng = SearchEngine(out, cfg)
    assert eng.search(Compound(must=(Term("content", "qqlegacy"),)), k=5).total == 2


def test_upsert_pending_replay(ray_session, tiny_corpus, tmp_path):
    """Crash between the pending journal write and the swap: the next
    upsert replays the interrupted one first (delete+compact+rename+
    register are idempotent), then applies its own batch."""
    import json
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from search_engine_ray.index import build_index, build_index_resumable, upsert_documents

    cfg = IndexConfig(num_buckets=4, num_parts=4)
    src = tmp_path / "src"
    src.mkdir()
    p = str(src / "all.parquet")
    pq.write_table(tiny_corpus, p)
    out = str(tmp_path / "replay")
    build_index_resumable([p], out, cfg, files_per_shard=1)
    shard_root = os.path.join(out, "shards")

    # hand-craft the crash state: hidden delta built, pending journaled,
    # but tombstone/compact/rename never ran
    up1 = tiny_corpus.slice(0, 2).set_column(
        4, "content",
        pa.array(["replay one qqreplay", "replay two qqreplay"],
                 tiny_corpus.schema.field("content").type),
    )
    from search_engine_ray.index.build import doc_uid

    ids1 = [
        doc_uid(str(v) for v in (tiny_corpus["repo"][i].as_py(), tiny_corpus["path"][i].as_py()))
        for i in range(2)
    ]
    build_index(rd.from_arrow(up1), os.path.join(shard_root, ".shard_u00001"), cfg)
    mpath = os.path.join(out, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["upsert_seq"] = 1
    m["pending_upsert"] = {
        "new": "shard_u00001",
        "entry": {"complete": True, "files": [], "n_docs": 2, "upsert": True},
        "tombstone_ids": ids1,
    }
    with open(mpath, "w") as f:
        json.dump(m, f)

    # next upsert replays the pending swap before its own batch
    up2 = tiny_corpus.slice(2, 1).set_column(
        4, "content",
        pa.array(["second batch qqsecond"], tiny_corpus.schema.field("content").type),
    )
    res = upsert_documents(out, up2, cfg)
    assert res["replaced"] == 1 and res["shard"] == "shard_u00002"
    with open(mpath) as f:
        m2 = json.load(f)
    assert "pending_upsert" not in m2
    assert "shard_u00001" in m2["shards"] and "shard_u00002" in m2["shards"]
    assert not os.path.isdir(os.path.join(shard_root, ".shard_u00001"))

    eng = SearchEngine(out, cfg)
    assert eng.stats["n_docs"] == tiny_corpus.num_rows
    assert eng.search(Compound(must=(Term("content", "qqreplay"),)), k=5).total == 2
    assert eng.search(Compound(must=(Term("content", "qqsecond"),)), k=5).total == 1


def test_delete_by_query(ray_session, tiny_index, tmp_path):
    """ES delete_by_query: matching docs tombstoned (visible on the
    next search, engine object unchanged), idempotent re-delete adds
    nothing, remaining scores keep the original corpus stats."""
    import shutil

    import numpy as np

    from search_engine_ray.query import Compound, SearchEngine, Term

    out, cfg, _ = tiny_index
    scratch = str(tmp_path / "delq")
    shutil.copytree(out, scratch)
    eng = SearchEngine(scratch, cfg)
    base = eng.search(Compound(must=(Term("content", "import"),)), k=500, with_metadata=False)
    victims = eng.search(
        Compound(must=(Term("content", "import"), Term("content", "tokenizer"))),
        k=500, with_metadata=False,
    )
    assert 0 < victims.total < base.total
    n = eng.delete_by_query(
        Compound(must=(Term("content", "import"), Term("content", "tokenizer")))
    )
    assert n == victims.total
    # same engine object: deletions visible on the next search
    after = eng.search(Compound(must=(Term("content", "import"),)), k=500, with_metadata=False)
    assert after.total == base.total - victims.total
    assert not set(after.hits["doc_id"]).intersection(victims.hits["doc_id"])
    # surviving docs keep their exact scores (stats unchanged)
    merged = after.hits.merge(base.hits, on="doc_id", suffixes=("_a", "_b"))
    np.testing.assert_allclose(merged["score_a"].to_numpy(), merged["score_b"].to_numpy(), atol=0)
    # idempotent: deleting the same match set again adds 0 tombstones
    assert eng.delete_by_query(
        Compound(must=(Term("content", "import"), Term("content", "tokenizer")))
    ) == 0
