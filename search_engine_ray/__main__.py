"""CLI: build and query indexes from the shell.

    python -m search_engine_ray build   <corpus_parquet> <index_dir> [--resumable] [--buckets N] [--parts N]
    python -m search_engine_ray search  <index_dir> "<keyword>" [--k N] [--skip N] [--prune]
    python -m search_engine_ray gen     <out_dir> <n_docs> [--seed S]
    python -m search_engine_ray upsert  <index_dir> <batch_parquet>
    python -m search_engine_ray compact <index_dir> [--fanout N]
    python -m search_engine_ray merge   <out_dir> <shard_dir> [<shard_dir> ...]
    python -m search_engine_ray suggest <index_dir> <token> [--field F] [--max-edits N]

Owns its Ray session (scripts own sessions; the library never calls
ray.init — driver/pytest contexts initialise Ray themselves).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def _init():
    import os

    import ray

    if not ray.is_initialized():
        # a cluster RAY_ADDRESS (anything but the sandbox's preset
        # "local") connects the CLI to that cluster — the `ray start
        # --head` / `ray job submit` path in CLUSTER.md; an explicit
        # address="local" would silently ignore the env and spin up a
        # private instance instead
        env_addr = os.environ.get("RAY_ADDRESS", "")
        addr = None if env_addr not in ("", "local") else "local"
        ray.init(address=addr, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="search_engine_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index from a parquet corpus")
    b.add_argument("corpus")
    b.add_argument("index_dir")
    b.add_argument("--resumable", action="store_true")
    b.add_argument("--buckets", type=int, default=16)
    b.add_argument("--parts", type=int, default=8)
    b.add_argument("--files-per-shard", type=int, default=8)

    s = sub.add_parser("search", help="BM25 keyword search against an index")
    s.add_argument("index_dir")
    s.add_argument("keyword")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--skip", type=int, default=0)
    s.add_argument("--prune", action="store_true")
    s.add_argument("--buckets", type=int, default=16)
    s.add_argument("--parts", type=int, default=8)

    g = sub.add_parser("gen", help="write the deterministic synthetic corpus")
    g.add_argument("out_dir")
    g.add_argument("n_docs", type=int)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--files", type=int, default=8)

    u = sub.add_parser("upsert", help="bulk upsert a parquet batch into a resumable index")
    u.add_argument("index_dir")
    u.add_argument("batch_parquet")

    c = sub.add_parser("compact", help="tiered-merge over-full shard tiers (LSM compaction)")
    c.add_argument("index_dir")
    c.add_argument("--fanout", type=int, default=8)

    m = sub.add_parser("merge", help="forceMerge shard dirs into ONE fresh index")
    m.add_argument("out_dir")
    m.add_argument("shard_dirs", nargs="+")

    sg = sub.add_parser("suggest", help="'did you mean' spelling suggestions")
    sg.add_argument("index_dir")
    sg.add_argument("token")
    sg.add_argument("--field", default="content")
    sg.add_argument("--max-edits", type=int, default=2)
    sg.add_argument("--k", type=int, default=5)
    sg.add_argument("--buckets", type=int, default=16)
    sg.add_argument("--parts", type=int, default=8)

    fs = sub.add_parser("fsck", help="index integrity check (structure + optional sha256 vs source)")
    fs.add_argument("index_dir")
    fs.add_argument("--decode", action="store_true", help="decode every postings stream")
    fs.add_argument("--source", default=None, help="corpus parquet for the sha256 check")
    fs.add_argument("--sha-col", default="content")
    fs.add_argument("--buckets", type=int, default=16)
    fs.add_argument("--parts", type=int, default=8)

    args = ap.parse_args(argv)
    _init()
    from search_engine_ray.config import IndexConfig

    if args.cmd == "build":
        from search_engine_ray.index import build_index, build_index_resumable

        cfg = IndexConfig(num_buckets=args.buckets, num_parts=args.parts)
        if args.resumable:
            files = sorted(glob.glob(f"{args.corpus}/*.parquet")) or [args.corpus]
            out = build_index_resumable(files, args.index_dir, cfg, args.files_per_shard)
        else:
            out = build_index(args.corpus, args.index_dir, cfg)
        print(json.dumps(out))
    elif args.cmd == "search":
        from search_engine_ray.query import SearchEngine, plan_keyword

        cfg = IndexConfig(num_buckets=args.buckets, num_parts=args.parts)
        eng = SearchEngine(args.index_dir, cfg)
        q = plan_keyword(args.keyword, text_field="content", prefix_fields=("path", "repo"))
        res = eng.search(q, k=args.k, skip=args.skip, prune=args.prune)
        print(
            json.dumps(
                {
                    "total": res.total,
                    "total_exact": res.total_exact,
                    "data": res.hits.to_dict(orient="records"),
                }
            )
        )
    elif args.cmd == "gen":
        from search_engine_ray.corpus import write_corpus

        write_corpus(args.out_dir, args.n_docs, seed=args.seed, files=args.files)
        print(json.dumps({"out_dir": args.out_dir, "n_docs": args.n_docs}))
    elif args.cmd == "upsert":
        import pyarrow.parquet as _pq

        from search_engine_ray.index import upsert_documents

        out = upsert_documents(args.index_dir, _pq.read_table(args.batch_parquet))
        print(json.dumps(out))
    elif args.cmd == "compact":
        from search_engine_ray.index.merge import compact_shards

        man = compact_shards(args.index_dir, fanout=args.fanout)
        print(json.dumps({"shards": sorted(man.get("shards", {}))}))
    elif args.cmd == "merge":
        from search_engine_ray.index import merge_indexes

        stats = merge_indexes(args.shard_dirs, args.out_dir)
        print(json.dumps({"n_docs": stats["n_docs"], "out_dir": args.out_dir}))
    elif args.cmd == "suggest":
        from search_engine_ray.query import SearchEngine

        cfg = IndexConfig(num_buckets=args.buckets, num_parts=args.parts)
        eng = SearchEngine(args.index_dir, cfg)
        print(json.dumps(eng.suggest(args.field, args.token, args.max_edits, args.k)))
    elif args.cmd == "fsck":
        from search_engine_ray.index import integrity_check

        cfg = IndexConfig(num_buckets=args.buckets, num_parts=args.parts)
        rep = integrity_check(
            args.index_dir, cfg, decode=args.decode,
            source=args.source, sha_col=args.sha_col if args.source else None,
        )
        print(json.dumps(rep))
        if not rep["ok"]:
            import ray

            ray.shutdown()
            return 1
    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
