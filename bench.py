#!/usr/bin/env python
"""Benchmark harness (driver contract + north-rule scaling evidence).

Default: one Ray session (`num_cpus` from $RAY_GRAFT_CPUS, default 32),
runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) plus the flagship index-build + BM25-query
workload over the deterministic synthetic corpus, and prints ONE JSON
line:

    {"metric": "index_build_docs_per_sec", "value": N, "unit": "sec",
     "queries": {...per-stage seconds...}, "sf": ..., "num_cpus": N}

--scaling: runs the SAME build workload in two fresh subprocesses at
num_cpus=8 and num_cpus=32 (sandbox proxy for N and 4N nodes, north
rule) and reports both throughputs + efficiency =
thr(32) / (4 * thr(8)).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "40000"))
CORPUS_DIR = f"/tmp/bench_corpus_{BENCH_DOCS}"
QUERY_SET = [
    "import", "tokenizer", "build_index merge_shards", "inverted index",
    "bm25 ranker", "parse_config", "wand", "heap top_k", "stream executor",
    "manifest",
]


def _init_ray(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    return ray


def _ensure_corpus():
    from search_engine_ray.corpus import write_corpus

    if not os.path.exists(os.path.join(CORPUS_DIR, "_DONE")):
        import shutil

        shutil.rmtree(CORPUS_DIR, ignore_errors=True)
        write_corpus(CORPUS_DIR, BENCH_DOCS, seed=42, files=64)
        open(os.path.join(CORPUS_DIR, "_DONE"), "w").write("ok")


def bench_build(num_cpus: int) -> dict:
    """Flagship: SPIMI index build over the synthetic source-code
    corpus; the north-rule throughput metric (docs/sec)."""
    from search_engine_ray.config import IndexConfig
    from search_engine_ray.index import build_index

    _ensure_corpus()
    cfg = IndexConfig(num_buckets=32, num_parts=16)
    out = f"/tmp/bench_index_{num_cpus}"
    t0 = time.perf_counter()
    stats = build_index(CORPUS_DIR, out, cfg)
    dt = time.perf_counter() - t0
    return {"seconds": dt, "docs": stats["n_docs"], "docs_per_sec": stats["n_docs"] / dt,
            "index_dir": out, "config": cfg}


def bench_queries(index_dir: str, cfg) -> dict:
    """BM25 latency over the fixed query set (k=10, skip=0)."""
    import numpy as np

    from search_engine_ray.query import SearchEngine, plan_keyword

    eng = SearchEngine(index_dir, cfg)
    lat = []
    for kw in QUERY_SET:
        q = plan_keyword(kw, text_field="content", prefix_fields=("path", "repo"))
        t0 = time.perf_counter()
        res = eng.search(q, k=10, with_metadata=False)
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat)
    return {
        "bm25_p50_s": float(np.percentile(lat, 50)),
        "bm25_p99_s": float(np.percentile(lat, 99)),
        "bm25_mean_s": float(lat.mean()),
    }


def bench_sf_pipelines(sf_dir: str) -> dict:
    """Per-pipeline wall seconds over the driver testdata tables."""
    import __ray_entry__ as entrymod

    picks = [
        "s1_bm25_term", "r1_filter", "r3_join", "r7_group_first", "r8_group_sum",
        "r10_explode", "r11_topk", "t_token_stats", "t_quality", "dedup_exact",
        "dedup_minhash", "dedup_simhash", "ann_cosine", "pipe_grouped_search",
    ]
    qs = entrymod.queries()
    out = {}
    for name in picks:
        t0 = time.perf_counter()
        res = qs[name](sf_dir)
        # consume lazily-built datasets so we time real execution
        from ray.data import Dataset

        if isinstance(res, Dataset):
            res = res.to_pandas()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_single(num_cpus: int, with_sf: bool) -> dict:
    _init_ray(num_cpus)
    b = bench_build(num_cpus)
    q = bench_queries(b["index_dir"], b["config"])
    queries = {"index_build_s": round(b["seconds"], 3), **{k: round(v, 4) for k, v in q.items()}}
    if with_sf:
        queries.update(bench_sf_pipelines(SF_DIR))
    import ray

    ray.shutdown()
    return {
        "metric": "index_build_docs_per_sec",
        "value": round(b["docs_per_sec"], 1),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": num_cpus,
        "bench_docs": b["docs"],
    }


def run_scaling() -> dict:
    """North-rule scaling evidence: same input, fresh processes at
    num_cpus=8 and num_cpus=32 (N vs 4N)."""
    results = {}
    for n in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", str(n)],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[n] = json.loads(line)
    thr8 = results[8]["value"]
    thr32 = results[32]["value"]
    eff = thr32 / (4.0 * thr8)
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            "docs_per_sec_8cpu": thr8,
            "docs_per_sec_32cpu": thr32,
            "build_s_8cpu": results[8]["queries"]["index_build_s"],
            "build_s_32cpu": results[32]["queries"]["index_build_s"],
        },
        "sf": SF_DIR,
        "num_cpus": 32,
        "bench_docs": results[32]["bench_docs"],
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
    elif len(sys.argv) > 2 and sys.argv[1] == "--single":
        # internal: one fresh-process build+query run (no sf pipelines)
        print(json.dumps(run_single(int(sys.argv[2]), with_sf=False)))
    else:
        print(json.dumps(run_single(NUM_CPUS, with_sf=True)))
