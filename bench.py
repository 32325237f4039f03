#!/usr/bin/env python
"""Benchmark harness (driver contract + north-rule scaling evidence).

Default: one Ray session (`num_cpus` from $RAY_GRAFT_CPUS, default 32),
runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) plus the flagship index-build + BM25-query
workload over the deterministic synthetic corpus, and prints ONE JSON
line:

    {"metric": "index_build_docs_per_sec", "value": N, "unit": "sec",
     "queries": {...per-stage seconds...}, "sf": ..., "num_cpus": N}

--scaling: runs the SAME build workload (SCALE_DOCS, default 1.2M
docs; the r3w9 record window and the round-4 windows B-D used
SCALE_DOCS=600000) in fresh subprocesses at num_cpus=4 and 16 (sandbox
proxy for N and 4N nodes, north rule), best-of-2 per level, and
reports both throughputs, raw efficiency thr(4N)/(4*thr(N)), the
hardware-capacity ratio of this box, and the ceiling-normalized
efficiency. See BASELINE.md for why the raw number is bounded ~0.85
on this single node.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# 200k: at 40k the build is startup-dominated (~5s of ~8s) and the
# docs/s headline mostly measured Ray session warm-up + host noise
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "200000"))
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
    # cold first query = actor spin-up + docmap IO, reported separately;
    # prewarm() is the server-startup path, so the p50/p99 below are
    # true warm latencies instead of cold-start artifacts
    t0 = time.perf_counter()
    eng.search(
        plan_keyword(QUERY_SET[0], text_field="content", prefix_fields=("path", "repo")),
        k=10, with_metadata=False,
    )
    cold_s = time.perf_counter() - t0
    eng.prewarm()
    lat, lat_pruned = [], []
    for kw in QUERY_SET:
        q = plan_keyword(kw, text_field="content", prefix_fields=("path", "repo"))
        t0 = time.perf_counter()
        eng.search(q, k=10, with_metadata=False)
        lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        eng.search(q, k=10, with_metadata=False, prune=True)
        lat_pruned.append(time.perf_counter() - t0)
    lat, lat_pruned = np.array(lat), np.array(lat_pruned)
    # concurrent QPS over the warm actor pool (the reference serves
    # with 2 gunicorn workers; this is our analog measure)
    from concurrent.futures import ThreadPoolExecutor

    plans = [
        plan_keyword(kw, text_field="content", prefix_fields=("path", "repo"))
        for kw in QUERY_SET
    ] * 3
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(lambda q: eng.search(q, k=10, with_metadata=False), plans))
    qps = len(plans) / (time.perf_counter() - t0)
    # ES _msearch analog: the whole plan batch in ONE score_many RPC
    # round per scorer (amortizes the per-query RPC that caps the
    # concurrent path above)
    t0 = time.perf_counter()
    eng.msearch(plans, k=10)
    msearch_qps = len(plans) / (time.perf_counter() - t0)
    return {
        "bm25_cold_first_query_s": round(cold_s, 4),
        "bm25_p50_s": float(np.percentile(lat, 50)),
        "bm25_p99_s": float(np.percentile(lat, 99)),
        "bm25_mean_s": float(lat.mean()),
        "bm25_pruned_p50_s": float(np.percentile(lat_pruned, 50)),
        "bm25_pruned_mean_s": float(lat_pruned.mean()),
        "bm25_concurrent_qps": round(qps, 1),
        "bm25_msearch_qps": round(msearch_qps, 1),
    }


def bench_sf_pipelines(sf_dir: str) -> dict:
    """Per-pipeline wall seconds over the driver testdata tables."""
    import __ray_entry__ as entrymod

    picks = [
        "s1_bm25_term", "s8_dispatch", "s9_phonetic", "r1_filter", "r2_json_extract",
        "r3_join", "r4_two_key_join", "r7_group_first",
        "r8_group_sum", "r10_explode", "r11_topk", "r21_range_join", "r22_hash_join",
        "r23_group_topn", "r24_sessionize", "r25_bloom_join", "sketch_kmv", "sketch_quantiles",
        "t_hash_sample", "t_token_stats", "t_quality",
        # dedup_ngram excluded: the EXACT all-pairs path is O(sum df^2)
        # by design (MinHash is the scale path) and sf0.1's organic
        # shingle sharing makes it minutes-long
        "dedup_exact", "dedup_minhash", "dedup_simhash",
        "ann_cosine", "ann_ivf", "ann_ivf_batch", "ann_pq",
        "e4_upsert_sink", "e7_tags", "mm_features", "pipe_grouped_search", "pipe_listing",
        # round-2 additions: LLM-budget token counts, PII redaction,
        # decontamination, unigram-LM scoring, repetition filters,
        # snippets, hybrid RRF retrieval
        "t_bpe_tokens", "t_pii_clean", "t_decontaminate", "t_unigram_lp",
        "t_repetition", "s14_snippet", "pipe_hybrid",
        # wave-3 engine surface: clause roles, boosts, pattern terms,
        # range facets, attribute sort, range filter, match-all browse
        "s19_must_not", "s21_boost", "s22_pattern", "s23_range_facet",
        "s24_sort_by_field", "s25_range_filter", "s26_match_all_browse",
        # wave-4: decay scoring, rescore window, significant terms,
        # token-budget mixing, rollup/pivot (dedup_components/
        # survivors excluded with dedup_ngram — exact all-pairs edges)
        "s30_decay", "s32_rescore", "s31_significant_terms",
        "t_mix_budget", "r27_rollup", "r28_pivot",
        "s33_cardinality", "s34_phrase_suggest", "s35_fragments",
        "r29_grouped_quantiles", "r30_window_funcs", "r31_matrix_stats",
        "t_chunk", "t_normalize", "ann_cosine_filtered",
        # wave-5: pipeline/calendar aggs, dictionary export,
        # percentile ranks, sampled quantiles, sorted export
        "r32_cumulative", "r33_month_histogram", "s37_dictionary",
        "s38_percentile_ranks", "sketch_quantiles_sampled",
        "e11_sorted_export",
        # wave-6/7: cursor paging, per-bucket top hits, line dedup,
        # pluggable similarities, percolator, numeric histogram,
        # duplicated-n-gram stats
        "s39_composite", "s40_top_hits", "t_line_dedup", "s53_phrase_prefix", "s54_unordered_near",
        "s43_classic", "s44_lm_dirichlet", "s45_boolean", "s50_dfr", "s51_best_fields",
        "s55_boosting",
        "s49_stemmed",
        "s46_percolate", "s47_filters", "s48_adjacency", "s52_rank_eval",
        "e12_ingest", "e13_snapshot",
        "r34_histogram", "t_dup_ngrams", "t_strip_dup_ngrams", "t_quality_clf",
        # round-3: SemDeDup + hard negatives (dedup_best_quality
        # excluded with the other exact all-pairs-edge entries)
        "dedup_semantic", "ann_hard_negatives", "dedup_incremental",
        # round-3 second wave: composed IVF-PQ (first run builds the
        # /tmp-cached index), DSIR selection, bigram LM, field
        # collapse, corpus card, 5-iteration PageRank
        "ann_ivfpq", "t_dsir", "t_bigram_lm", "s56_collapse",
        "pipe_corpus_report", "r35_pagerank",
        # round-3 third wave: Gopher rules, A-ES weighted sample,
        # radius search, terms_set, composite/rare/diversified aggs,
        # bool-prefix, distance_feature, pipeline aggs, compaction
        "t_gopher_rules", "t_reservoir_sample", "ann_range",
        "s60_terms_set", "s61_rare_terms", "s62_multi_terms",
        "s63_diversified_sampler", "s64_match_bool_prefix",
        "s66_distance_feature", "r36_derivative", "e14_compaction",
        "s67_span_or", "s68_span_not",
        "sketch_hll", "r37_moving_avg", "r38_extended_stats",
        "s69_span_containing", "s70_span_within", "t_keywords",
        "r39_geo_radius", "r40_geo_grid", "r41_outer_join",
        "r42_auto_histogram", "pipe_tpch_q1", "pipe_tpch_q3",
        "pipe_tpch_q5", "pipe_tpch_q6", "t_cluster_sample", "r43_funnel", "r44_retention",
        "r45_grouped_hll", "e15_force_merge", "t_collocations",
        "e16_cdc_replay", "e17_index_stats", "r46_weighted_avg",
        # round-3 fourth wave: remaining ES aggs, relational gaps,
        # soft-dedup reweighting, deterministic random_score
        "r47_string_stats", "r48_top_metrics", "r49_boxplot", "r50_mad",
        "r51_t_test", "r52_bucket_selector", "r53_serial_diff",
        "r54_cumulative_cardinality", "r55_cube", "r56_set_ops",
        "r57_anti_join", "r58_window_ranks", "t_soft_dedup",
        "s74_random_score", "pipe_tpch_q4", "pipe_tpch_q10",
        "pipe_tpch_q14", "s75_combined_fields", "t_ccnet_buckets", "r59_geo_bounds",
        "r60_rate", "r61_bucket_script", "r62_stats_bucket",
        "e18_schema_merge", "s76_ids", "s77_most_fields", "s78_intervals",
        "s79_intervals_any", "s80_span_multi", "t_temperature_mix", "r63_unpivot",
        "s81_sig_chi2", "r64_rolling_window", "e19_reindex_alias", "r65_terms_by_subagg",
        "r66_join_auto", "t_embed_outliers", "ann_maxsim",
        # round-3 continuation: full TPC-H, MLT/dis_max/script_score/
        # SAYT, geotile+geohash grids, scripted_metric, DSIR Gumbel
        # resampling, FineWeb-shaped curation capstone
        "pipe_tpch_q2", "pipe_tpch_q7", "pipe_tpch_q8", "pipe_tpch_q9",
        "pipe_tpch_q11", "pipe_tpch_q12", "pipe_tpch_q13", "pipe_tpch_q15",
        "pipe_tpch_q16", "pipe_tpch_q17", "pipe_tpch_q18", "pipe_tpch_q19",
        "pipe_tpch_q20", "pipe_tpch_q21", "pipe_tpch_q22",
        "s82_dis_max", "s83_script_score", "s84_more_like_this",
        "s85_search_as_you_type", "r67_geotile_grid", "r68_geohash_grid",
        "r69_scripted_metric", "t_dsir_sample", "pipe_fineweb", "t_bpe_train",
        "s86_has_child", "s87_has_parent", "s88_msearch", "r70_winsorize",
        "sketch_kmv_intersect", "sketch_kmv_union", "ann_sq8", "t_expectations", "r71_late_events", "t_bootstrap_means", "r72_basket_rules", "r73_benford",
        # round-4 statistics/aggregation wave (all sf0.1-smoked pre-commit)
        "r74_grouped_ols", "r75_matrix_stats", "r76_anova",
        "r77_percentiles_bucket", "r78_entropy", "s89_terms_enum",
        "r79_ks_test", "dedup_containment",
        "r80_change_point", "t_zipf", "r81_two_proportions",
        "t_novelty", "r82_autocorr", "e20_orc_source", "t_fertility",
        "r83_transitions", "r84_conversion_lag", "t_langid_eval", "r85_normalize",
        "r86_gini", "t_char_entropy", "r87_seasonal_anomaly", "s90_explain",
        "r88_degree_dist", "e21_hive_pruning", "r89_mann_kendall", "r90_runs_test", "r91_crosstab_chi2", "t_ngram_coverage", "r92_ewma",
        "r93_date_range", "r94_first_last", "r95_spearman", "r96_kruskal", "t_url_filter", "t_unimax_sample",
        "r97_theil_sen", "r98_mann_whitney", "e22_gzip_csv",
        "r99_holt", "r100_levene", "t_topic_census",
        "r101_seasonal_decompose", "e23_retention_sink",
        "r102_bucket_correlation", "s92_terms_include", "mm_audio_energy",
        "r103_srm_check", "e24_psv_dialect", "r104_cramers_v",
        # round-5 continuation waves 11-24 (all sf0.1-smoked pre-commit)
        "r105_jarque_bera", "r106_cohens_d", "r107_tukey_users", "t_readability",
        "r108_kendall_tau", "r109_cross_corr", "r110_durbin_watson",
        "r111_bfs_levels", "t_spell_pairs", "e25_schema_evolution",
        "r112_pacf", "r113_grubbs", "r114_mad_outliers", "r115_rescaled_range",
        "e26_manifest_snapshot", "r116_rate_ratio", "t_vocab_growth",
        "sketch_heavy_hitters", "e27_delta_rollup", "e28_zorder_layout",
        "r117_selfjoin_size", "ann_label_cohesion", "e29_cdc_merge",
        "e30_compaction", "r118_gap_fill", "e31_footer_stats",
        "r119_std_residuals", "r120_mcnemar", "r121_stickiness",
        "e32_bucketed_join", "r122_psi_drift", "r123_cond_entropy",
        "r124_streaks", "t_split_leakage", "r125_hhi",
        "r126_kaplan_meier", "r127_cuped", "r128_hill_tail",
        "r129_skyline", "r130_embed_cov", "r131_benford2",
        "e33_deletion_vectors", "r132_hist2d", "t_source_divergence",
        "r133_odds_ratio", "e34_scd2", "r134_lorenz",
        "e35_time_travel", "r135_growth_accounting",
        "r136_rfm", "r137_power",
        "e36_wap", "r138_peaks",
        "r139_snaive_mape", "t_temp_curve", "r140_abc",
        # r142_clustering_coef excluded with pipe_triangles (wedge-join cost)
        "r141_assortativity", "r143_fano",
        "r144_ess", "r145_markov_power",
        "e37_profile", "r146_equal_freq_bins",
        "r147_modularity", "r148_laspeyres", "r149_ltv",
        "r150_dup_invoices", "r151_mood", "r152_fisher_index",
        "r153_turning_points", "r154_partial_corr", "r155_robust_shape",
        "r156_xmr_chart", "r157_source_purity",
        # s36_federated excluded: its first run builds two extra
        # half-corpus indexes (cached thereafter) — an index-build
        # benchmark, not a query one; dedup_survivors excluded with
        # the other exact all-pairs entries
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


# 1.2M: fixed session/job costs (~2s) distort the ratio at 600k
SCALE_DOCS = int(os.environ.get("SCALE_DOCS", "1200000"))
SCALE_N = int(os.environ.get("SCALE_N", "4"))  # N vs 4N cpus


def _spin(seconds: float) -> int:
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < seconds:
        x += 1
    return x


def _hw_capacity(procs: int, seconds: float = 2.0) -> float:
    """Aggregate spin-loop throughput of `procs` processes — measures
    the sandbox's REAL parallel CPU capacity (this single node does
    not deliver 4x capacity from 4x processes: SMT / throttling /
    noisy neighbors). Reported so the scaling number can be read
    against the hardware ceiling."""
    import multiprocessing as mp

    with mp.Pool(procs) as p:
        return float(sum(p.map(_spin, [seconds] * procs)))


def _triad(args) -> float:
    """One worker's STREAM-triad MB/s over a cache-busting array:
    a = b + s*c on 64 MiB float64 operands (3x64 MiB traffic per
    sweep, far beyond LLC) — the merge pass's decode/lexsort/encode
    is exactly this kind of streaming traffic."""
    import numpy as np

    seconds = args
    n = (64 << 20) // 8
    b = np.ones(n)
    c = np.ones(n)
    a = np.empty(n)
    t0 = time.perf_counter()
    sweeps = 0
    while time.perf_counter() - t0 < seconds:
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)
        sweeps += 1
    dt = time.perf_counter() - t0
    return sweeps * 3 * (64.0) / dt  # MB/s per worker (MiB operands)


def run_membw(levels=(1, 4, 16), seconds: float = 3.0) -> dict:
    """Memory-bandwidth ceiling probe (the measurement VERDICT r04 #4
    asked for in lieu of perf counters): aggregate STREAM-triad MB/s
    at increasing process counts. If aggregate bandwidth saturates
    well below procs x single-proc bandwidth, the 4->16 cpu build
    scaling ceiling is memory traffic, not CPU — read next to the
    _hw_capacity spin ratio, which measures pure-CPU capacity and is
    immune to bandwidth."""
    import multiprocessing as mp

    out = {}
    for procs in levels:
        with mp.Pool(procs) as p:
            per = p.map(_triad, [seconds] * procs)
        out[f"aggregate_mbs_{procs}"] = round(float(sum(per)), 1)
    base = out[f"aggregate_mbs_{levels[0]}"] / levels[0]
    for procs in levels[1:]:
        out[f"bw_scaling_{levels[0]}_to_{procs}"] = round(
            out[f"aggregate_mbs_{procs}"] / (procs * base), 3
        )
    spin_lo = _hw_capacity(levels[0], 1.5)
    spin_hi = _hw_capacity(levels[-1], 1.5)
    out["spin_capacity_ratio"] = round(spin_hi / spin_lo, 2)
    return {"metric": "membw_triad", "unit": "MB/s", "queries": out}


def scale_build_once(num_cpus: int, n_docs: int) -> dict:
    """Fresh-process single build (pool pre-warmed) + warm concurrent
    query throughput over the built index: {docs_per_sec, qps}."""
    from search_engine_ray.config import IndexConfig
    from search_engine_ray.corpus import write_corpus
    from search_engine_ray.index import build_index

    corpus = f"/tmp/bench_scale_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        import shutil

        shutil.rmtree(corpus, ignore_errors=True)
        _init_ray(NUM_CPUS)
        write_corpus(corpus, n_docs, seed=42, files=64)
        open(os.path.join(corpus, "_DONE"), "w").write("ok")
        import ray

        ray.shutdown()
    _init_ray(num_cpus)
    import ray
    import ray.data as rd

    rd.range(100000).map_batches(lambda b: b).materialize()  # warm pool
    cfg = IndexConfig(num_buckets=32, num_parts=16)
    t0 = time.perf_counter()
    idx_dir = f"/tmp/bench_scale_idx_{num_cpus}"
    stats = build_index(corpus, idx_dir, cfg)
    dt = time.perf_counter() - t0
    # query-side throughput at this cpu level (north rule reports BM25
    # latency/throughput alongside the build): warm scatter-gather
    # pool, 8 concurrent clients over the fixed query set
    from concurrent.futures import ThreadPoolExecutor

    from search_engine_ray.query import SearchEngine, plan_keyword

    eng = SearchEngine(idx_dir, cfg)
    eng.prewarm()
    plans = [
        plan_keyword(kw, text_field="content", prefix_fields=("path", "repo"))
        for kw in QUERY_SET
    ] * 3
    list(map(lambda q: eng.search(q, k=10, with_metadata=False), plans[:4]))  # warm postings
    tq = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(lambda q: eng.search(q, k=10, with_metadata=False), plans))
    qps = len(plans) / (time.perf_counter() - tq)
    ray.shutdown()
    return {"docs_per_sec": stats["n_docs"] / dt, "qps": qps}


def _qps_worker(idx_dir: str, num_cpus: int, n_rounds: int) -> dict:
    """One query-serving replica: own Ray runtime (the sandbox analog
    of one app-server process/node), engine + scorer pool over the
    SHARED on-disk index, 8 concurrent clients over the fixed query
    set. Prints {"qps": ...} — aggregated by run_qps_scaling."""
    from concurrent.futures import ThreadPoolExecutor

    from search_engine_ray.query import SearchEngine, plan_keyword

    _init_ray(num_cpus)
    import ray

    eng = SearchEngine(idx_dir)
    eng.prewarm()
    plans = [
        plan_keyword(kw, text_field="content", prefix_fields=("path", "repo"))
        for kw in QUERY_SET
    ] * n_rounds
    list(map(lambda q: eng.search(q, k=10, with_metadata=False), plans[: len(QUERY_SET)]))
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(lambda q: eng.search(q, k=10, with_metadata=False), plans))
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {"qps": len(plans) / dt, "queries": len(plans), "seconds": round(dt, 2)}


def run_qps_scaling() -> dict:
    """Query-throughput scaling evidence: one engine's scatter-gather
    QPS is RPC-bound and flat in cluster width (every query fans one
    RPC per scorer), so throughput scales by ENGINE REPLICATION — the
    reference's own model (gunicorn -w 2, start.sh:4). Measure R=1 vs
    R=2 independent replica processes (each its own Ray runtime and
    actor pool, both over the same on-disk index, 8 cpus each) and
    report the aggregate-QPS ratio."""
    idx_dir = f"/tmp/bench_scale_idx_16"
    if not os.path.exists(os.path.join(idx_dir, "stats.json")):
        scale_build_once(16, SCALE_DOCS)

    def _spawn(n_replicas: int) -> float:
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--qps-worker", idx_dir, "8"],
                stdout=subprocess.PIPE, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for _ in range(n_replicas)
        ]
        total = 0.0
        for p in procs:
            out, _ = p.communicate(timeout=900)
            line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
            total += float(json.loads(line)["qps"])
        return total

    q1 = _spawn(1)
    q2 = _spawn(2)
    return {
        "metric": "query_qps_replication_1_to_2",
        "value": round(q2 / q1, 3),
        "unit": "ratio",
        "queries": {
            "qps_1_replica": round(q1, 1),
            "qps_2_replicas_aggregate": round(q2, 1),
        },
        "sf": SF_DIR,
        "num_cpus": 16,
        "bench_docs": SCALE_DOCS,
    }


SCALE_REPS = int(os.environ.get("SCALE_REPS", "3"))


def run_scaling() -> dict:
    """North-rule scaling evidence: same input, fresh processes at
    num_cpus=N and 4N (sandbox proxy for N / 4N nodes).

    The sandbox shares a host with noisy neighbors (observed load avg
    7+ while this container idles; identical builds swing 2-4x), so
    single runs are meaningless. Runs are PAIRED and INTERLEAVED —
    (N, 4N) x SCALE_REPS back to back — so a noise burst hits both
    levels of a pair similarly; the reported efficiency is the best
    pair's, with every pair's ratio in `pair_efficiencies` as the
    honesty band. The hardware-capacity spin microbenchmark gives the
    ceiling a perfectly-scaling system could reach on this box."""
    levels = (SCALE_N, 4 * SCALE_N)

    def _one(n: int) -> dict:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scale-build", str(n)],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    pairs = []
    qps = {levels[0]: [], levels[1]: []}
    for _ in range(SCALE_REPS):
        lo_r = _one(levels[0])
        hi_r = _one(levels[1])
        lo, hi = float(lo_r["docs_per_sec"]), float(hi_r["docs_per_sec"])
        qps[levels[0]].append(float(lo_r["qps"]))
        qps[levels[1]].append(float(hi_r["qps"]))
        pairs.append((lo, hi, hi / (4.0 * lo)))
    best_lo = max(p[0] for p in pairs)
    best_hi = max(p[1] for p in pairs)
    hw_lo = _hw_capacity(levels[0])
    hw_hi = _hw_capacity(levels[1])
    hw_ratio = hw_hi / hw_lo  # <= 4.0; the hardware ceiling
    # headline = fastest-observed per level (each level's cleanest
    # window); a single pair can be wildly distorted when noise hits
    # one of its two runs, so every pair's ratio is reported alongside
    eff_raw = best_hi / (4.0 * best_lo)
    eff_vs_hw = best_hi / (hw_ratio * best_lo) if hw_ratio else 0.0
    return {
        "metric": f"scaling_efficiency_{levels[0]}_to_{levels[1]}_cpus",
        "value": round(eff_raw, 3),
        "unit": "ratio",
        "queries": {
            f"docs_per_sec_{levels[0]}cpu": round(best_lo, 1),
            f"docs_per_sec_{levels[1]}cpu": round(best_hi, 1),
            "pair_efficiencies": [round(p[2], 3) for p in pairs],
            "hw_capacity_ratio": round(hw_ratio, 2),
            "efficiency_vs_hw_ceiling": round(eff_vs_hw, 3),
            f"query_qps_{levels[0]}cpu": round(max(qps[levels[0]]), 1),
            f"query_qps_{levels[1]}cpu": round(max(qps[levels[1]]), 1),
            "query_qps_ratio": round(max(qps[levels[1]]) / max(qps[levels[0]]), 2),
        },
        "sf": SF_DIR,
        "num_cpus": levels[1],
        "bench_docs": SCALE_DOCS,
    }


def run_smoke(names: list[str]) -> dict:
    """Pre-commit gate (round-3 postmortem): run the named queries()
    entries ONCE at the bench sf (default sf0.1) in this process and
    report seconds-or-error per entry. Every NEW entry that lands in
    the bench pick list MUST pass `python bench.py --smoke <names>`
    before its commit — sf0.01 pytest green does not cover
    scale-dependent breaks (empty intermediates, absolute thresholds,
    schema-less empty frames). Exits rc=1 if any entry raises."""
    _init_ray(NUM_CPUS)
    import __ray_entry__ as entrymod
    from ray.data import Dataset

    qs = entrymod.queries()
    out, failed = {}, False
    for name in names:
        t0 = time.perf_counter()
        try:
            res = qs[name](SF_DIR)
            if isinstance(res, Dataset):
                res = res.to_pandas()
            nrows = len(res)
            out[name] = {"s": round(time.perf_counter() - t0, 3), "rows": nrows}
        except Exception as e:  # noqa: BLE001 - smoke gate reports, not hides
            failed = True
            out[name] = {"error": f"{type(e).__name__}: {e}"}
    import ray

    ray.shutdown()
    return {"sf": SF_DIR, "num_cpus": NUM_CPUS, "smoke": out, "ok": not failed}


if __name__ == "__main__":
    if sys.argv[1:2] == ["--smoke"]:
        if len(sys.argv) < 3:
            # ADVICE r04: a bare --smoke must NOT fall through to the
            # full default benchmark — that silently defeats the
            # pre-commit gate the mode exists for
            print("usage: bench.py --smoke NAME [NAME...]", file=sys.stderr)
            sys.exit(2)
        r = run_smoke(sys.argv[2:])
        print(json.dumps(r))
        sys.exit(0 if r["ok"] else 1)
    if sys.argv[1:2] == ["--membw"]:
        print(json.dumps(run_membw()))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
    elif len(sys.argv) > 2 and sys.argv[1] == "--scale-build":
        print(json.dumps(scale_build_once(int(sys.argv[2]), SCALE_DOCS)))
    elif sys.argv[1:2] == ["--qps-scaling"]:
        print(json.dumps(run_qps_scaling()))
    elif len(sys.argv) > 3 and sys.argv[1] == "--qps-worker":
        print(json.dumps(_qps_worker(sys.argv[2], int(sys.argv[3]), n_rounds=6)))
    elif len(sys.argv) > 2 and sys.argv[1] == "--single":
        # internal: one fresh-process build+query run (no sf pipelines)
        print(json.dumps(run_single(int(sys.argv[2]), with_sf=False)))
    else:
        print(json.dumps(run_single(NUM_CPUS, with_sf=True)))
