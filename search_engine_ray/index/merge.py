"""Physical index merge — Lucene forceMerge for this engine.

``build_index_resumable`` leaves N independent sub-indexes that the
query engine unions at read time; every query then pays N dictionary
lookups and N posting reads per (term, bucket). ``merge_indexes``
folds them into ONE index: per (part, bucket) it decodes each shard's
rank streams against that shard's OWN docmap universe (ranks are only
meaningful relative to the universe they were encoded with), drops
tombstoned docs, and re-encodes against the UNION universe — so the
merge is also the global compaction (the output starts with zero
tombstones).

Scale shape: one Ray task per output part (the same unit as the build
merge — memory bounded by postings/num_parts), universes computed once
per (shard, bucket) and shared via the object store. Doc spaces must
be disjoint across inputs (resumable shards are by construction —
every doc lives in exactly one shard); validated, not assumed.

Inputs may mix postings formats (v2 varbyte / v3 FOR); the output is
written in ``config.codec``. All inputs must share num_buckets and
block_size (bucket = doc_id % num_buckets must mean the same thing);
num_parts may differ per input — terms are re-hashed into the output
layout.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from search_engine_ray.codec import block_delta_decode, for_decode_term, varbyte_decode
from search_engine_ray.config import IndexConfig, term_part
from search_engine_ray.index.build import (
    CODEC_FORMATS,
    POSTINGS_FORMAT_FOR,
    READABLE_FORMATS,
    _list_from_offsets,
    encode_bucket_terms,
    load_tombstones,
)


def _drop(ids: np.ndarray, tomb: np.ndarray) -> np.ndarray:
    """Boolean keep-mask for ids against a sorted tombstone array."""
    if tomb.size == 0 or ids.size == 0:
        return np.ones(ids.size, dtype=bool)
    pos = np.clip(np.searchsorted(tomb, ids), 0, tomb.size - 1)
    return tomb[pos] != ids


def merge_indexes(
    index_dirs: list[str],
    out_dir: str,
    config: IndexConfig | None = None,
    extra_tombstones=None,
) -> dict:
    """Merge N single-build index dirs (e.g. resumable shards, passed
    as their ``shards/shard_*`` paths) into one fresh index at
    ``out_dir`` (tmp + atomic rename). Tombstones of every input are
    folded in and cleared; a resumable PARENT keeps its tombstones at
    the parent level — pass those via ``extra_tombstones``
    (``load_tombstones(parent_dir)``). Returns the merged stats."""
    import ray as _ray

    config = config or IndexConfig()
    if config.codec not in CODEC_FORMATS:
        raise ValueError(f"unknown postings codec {config.codec!r}")
    layouts = []
    for d in index_dirs:
        with open(os.path.join(d, "stats.json")) as f:
            st = json.load(f)
        if st.get("postings_format") not in READABLE_FORMATS:
            raise ValueError(f"{d}: unreadable postings_format {st.get('postings_format')}")
        layouts.append(st)
    buckets = {st["num_buckets"] for st in layouts}
    blocks = {st["block_size"] for st in layouts}
    if len(buckets) != 1 or len(blocks) != 1:
        raise ValueError(f"inputs disagree on num_buckets/block_size: {buckets}/{blocks}")
    num_buckets = buckets.pop()
    bs = blocks.pop()
    # output layout: at least the widest input (keeps the merge-task
    # memory bound of the biggest shard)
    out_parts = max(max(st["num_parts"] for st in layouts), config.num_parts)
    from dataclasses import replace as _dc_replace

    config = _dc_replace(config, num_buckets=num_buckets, num_parts=out_parts, block_size=bs)
    tomb_parts = [load_tombstones(d) for d in index_dirs]
    if extra_tombstones is not None:
        tomb_parts.append(np.asarray(extra_tombstones, dtype=np.int64))
    tomb = np.unique(np.concatenate(tomb_parts))

    tmp_dir = out_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)

    # ---- docmap: concat per bucket, drop tombstones, and publish the
    # per-(shard, bucket) OLD universes + merged NEW universe refs
    @_ray.remote
    def _merge_docmap(b: int):
        shard_univs = []
        kept_tables = []
        for d in index_dirs:
            files = glob.glob(os.path.join(d, "docmap", f"bucket={b}", "*.parquet"))
            if not files:
                shard_univs.append(np.empty(0, np.int64))
                continue
            t = pads.dataset(files).to_table()
            ids = t["doc_id"].to_numpy()
            shard_univs.append(np.sort(ids))
            keep = _drop(ids, tomb)
            kept_tables.append(t.filter(pa.array(keep)))
        if kept_tables:
            merged = pa.concat_tables(kept_tables)
            ids = merged["doc_id"].to_numpy()
            new_univ = np.sort(ids)
            if np.unique(new_univ).size != new_univ.size:
                raise ValueError(
                    f"bucket {b}: duplicate doc_id across input indexes — "
                    "merge_indexes requires disjoint doc spaces"
                )
            bdir = os.path.join(tmp_dir, "docmap", f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            pq.write_table(merged, os.path.join(bdir, "data.parquet"))
        else:
            new_univ = np.empty(0, np.int64)
        return shard_univs, new_univ

    univ_refs = {b: _merge_docmap.remote(b) for b in range(num_buckets)}

    in_fmts = [st["postings_format"] for st in layouts]
    in_parts = [st["num_parts"] for st in layouts]
    codec = config.codec

    @_ray.remote
    def _merge_part(k: int) -> dict:
        import time as _time

        t0 = _time.perf_counter()
        dict_parts = []
        n_postings = 0
        for b in range(num_buckets):
            shard_univs, new_univ = _ray.get(univ_refs[b])
            terms_out: list = []
            id_parts: list[np.ndarray] = []
            tf_parts: list[np.ndarray] = []
            dl_parts: list[np.ndarray] = []
            lens: list[int] = []
            for si, d in enumerate(index_dirs):
                # a shard with the same layout holds output-part k's
                # terms in its own part=k; otherwise scan all its parts
                # and re-hash terms into the output layout
                cand = [k] if in_parts[si] == out_parts else range(in_parts[si])
                same_layout = in_parts[si] == out_parts
                for ki in cand:
                    files = glob.glob(
                        os.path.join(d, "postings", f"part={ki}", f"bucket={b}", "*.parquet")
                    )
                    if not files:
                        continue
                    t = pads.dataset(files).to_table()
                    from search_engine_ray.query.executor import _binary_views

                    doc_view = _binary_views(t["doc_bytes"])
                    tf_view = _binary_views(t["tf_bytes"])
                    dl_view = _binary_views(t["dl_bytes"])
                    dfl = t["df_local"].to_numpy()
                    terms = t["term"].to_pylist()
                    old_univ = shard_univs[si]
                    for ri, term in enumerate(terms):
                        if not same_layout and term_part(term, out_parts) != k:
                            continue
                        n = int(dfl[ri])
                        if in_fmts[si] == POSTINGS_FORMAT_FOR:
                            gaps = for_decode_term(doc_view(ri), n, bs, with_firsts=True)
                            tfs = for_decode_term(tf_view(ri), n, bs, with_firsts=False)
                            dls = for_decode_term(dl_view(ri), n, bs, with_firsts=False)
                        else:
                            gaps = varbyte_decode(doc_view(ri), n).astype(np.int64)
                            tfs = varbyte_decode(tf_view(ri), n)
                            dls = varbyte_decode(dl_view(ri), n)
                        ranks = block_delta_decode(gaps, np.arange(0, n, bs, dtype=np.int64))
                        ids = old_univ[ranks]
                        keep = _drop(ids, tomb)
                        if not keep.any():
                            continue
                        terms_out.append(term)
                        id_parts.append(ids[keep])
                        tf_parts.append(tfs.astype(np.int32)[keep])
                        dl_parts.append(dls.astype(np.int32)[keep])
                        lens.append(int(keep.sum()))
            if not terms_out:
                continue
            offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
            partial = pa.table(
                {
                    "term": pa.array(terms_out, pa.string()),
                    "bucket": pa.array(np.full(len(terms_out), b, np.int32()), pa.int32()),
                    "doc_ids": _list_from_offsets(offs, pa.array(np.concatenate(id_parts), pa.int64())),
                    "tfs": _list_from_offsets(offs, pa.array(np.concatenate(tf_parts), pa.int32())),
                    "dls": _list_from_offsets(offs, pa.array(np.concatenate(dl_parts), pa.int32())),
                }
            )
            enc = encode_bucket_terms(partial, k, b, bs, new_univ, codec=codec)
            n_postings += int(enc["df_local"].to_numpy().sum())
            bdir = os.path.join(tmp_dir, "postings", f"part={k}", f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            pq.write_table(enc.drop_columns(["part", "bucket"]), os.path.join(bdir, "data.parquet"))
            dict_parts.append(enc.select(["term", "df_local", "cf_local"]))
        cf: dict[str, int] = {}
        n_terms = 0
        if dict_parts:
            agg = (
                pa.concat_tables(dict_parts)
                .group_by("term")
                .aggregate([("df_local", "sum"), ("cf_local", "sum")])
                .rename_columns(["term", "df", "cf"])
                .sort_by("term")
            )
            dict_file = os.path.join(tmp_dir, "dict", f"part={k}", "dict.parquet")
            os.makedirs(os.path.dirname(dict_file), exist_ok=True)
            pq.write_table(agg, dict_file)
            n_terms = agg.num_rows
            ddf = agg.select(["term", "cf"]).to_pandas()
            codes = ddf["term"].str.split(":", n=1).str[0]
            cf = ddf.groupby(codes)["cf"].sum().to_dict()
        return {
            "cf": cf,
            "metrics": {
                "part": k,
                "postings": n_postings,
                "terms": int(n_terms),
                "seconds": round(_time.perf_counter() - t0, 3),
            },
        }

    results = _ray.get([_merge_part.remote(k) for k in range(out_parts)])

    n_docs = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(tmp_dir, "docmap", "bucket=*", "*.parquet"))
    )
    cf_by_code: dict[str, int] = {}
    for r in results:
        for code, c in r["cf"].items():
            cf_by_code[code] = cf_by_code.get(code, 0) + int(c)
    stats = {
        "postings_format": CODEC_FORMATS[codec],
        "n_docs": int(n_docs),
        "fields": {
            f.name: {
                "total_len": int(cf_by_code.get(f.code, 0)),
                "avgdl": (float(cf_by_code.get(f.code, 0)) / n_docs) if n_docs else 0.0,
            }
            for f in config.fields
        },
        "num_buckets": num_buckets,
        "num_parts": out_parts,
        "block_size": bs,
        "k1": config.k1,
        "b": config.b,
        "merged_from": list(index_dirs),
        "tombstones_folded": int(tomb.size),
    }
    with open(os.path.join(tmp_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    with open(os.path.join(tmp_dir, "metrics.jsonl"), "w") as mf:
        for r in results:
            mf.write(json.dumps({"stage": "merge_indexes_part", **r["metrics"]}) + "\n")
    with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
        json.dump({"complete": True, "stats": stats}, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp_dir, out_dir)
    return stats


# ------------------------------------------------- tiered merge policy


def plan_tiered_merge(shard_docs: dict[str, int], fanout: int = 8) -> list[list[str]]:
    """One round of a tiered merge policy (Lucene TieredMergePolicy /
    LSM compaction, simplified): shards are bucketed into geometric
    size tiers — tier = floor(log_fanout(n_docs / base)) with base =
    the smallest non-empty shard — and every tier holding more than
    ``fanout`` members contributes one merge of its ``fanout`` smallest
    shards. Merging only same-tier peers keeps write amplification
    O(log_fanout(N/base)) per doc over the index's lifetime (the LSM
    argument); a giant shard is never rewritten to absorb a tiny one.

    Pure function of {shard_name: n_docs} -> groups of names (each of
    size >= 2), deterministic (ties broken by name). Callers loop:
    plan -> execute -> re-plan until no groups remain."""
    if fanout < 2:
        raise ValueError("fanout must be >= 2")
    sizes = sorted(((max(int(v), 1), k) for k, v in shard_docs.items()))
    if not sizes:
        return []
    base = sizes[0][0]
    tiers: dict[int, list[tuple[int, str]]] = {}
    for sz, name in sizes:
        t = 0
        span = base * fanout
        while sz >= span:  # tier t covers [base*fanout^t, base*fanout^(t+1))
            t += 1
            span *= fanout
        tiers.setdefault(t, []).append((sz, name))
    groups = []
    for t in sorted(tiers):
        members = tiers[t]
        if len(members) > fanout:
            groups.append([name for _sz, name in members[:fanout]])
    return groups


def compact_shards(
    parent_dir: str,
    config: IndexConfig | None = None,
    fanout: int = 8,
    max_rounds: int = 16,
) -> dict:
    """Apply the tiered merge policy to a resumable index
    (``parent_dir/shards/shard_*`` + ``manifest.json``) until no tier
    is over-full: each planned group is merged with ``merge_indexes``
    into a new shard, the manifest is updated, and the source shards
    are removed. Parent-level tombstones are left INTACT (they apply
    globally and are physically folded by ``compact_tombstones`` /
    a full ``merge_indexes``); per-shard tombstones fold into the
    merged shard as usual.

    Crash safety / lineage: the merged shard is first written under a
    dot-prefixed name the engine's ``shards/shard_*`` glob cannot see,
    the manifest then records the swap intent (``pending``), and only
    then is the new shard renamed in and the sources deleted — a rerun
    finishes any interrupted swap before planning more work. Like
    ``compact_tombstones``, run this without live readers (engines
    hold per-shard caches).

    Returns the final manifest."""
    manifest_path = os.path.join(parent_dir, "manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    shards = manifest.get("shards", {})
    if not manifest.get("resumable") or not shards:
        raise ValueError(f"{parent_dir} is not a resumable multi-shard index")
    shard_root = os.path.join(parent_dir, "shards")
    config = config or IndexConfig()
    from dataclasses import replace as _dc_replace

    if "num_parts" in manifest:
        config = _dc_replace(
            config, num_parts=int(manifest["num_parts"]), auto_num_parts=False
        )

    def _save():
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=2)

    def _finish_pending():
        p = manifest.get("pending")
        if not p:
            return
        hidden = os.path.join(shard_root, "." + p["new"])
        final = os.path.join(shard_root, p["new"])
        if os.path.isdir(hidden) and not os.path.isdir(final):
            os.replace(hidden, final)
        for src in p["sources"]:
            shutil.rmtree(os.path.join(shard_root, src), ignore_errors=True)
            shards.pop(src, None)
        if os.path.isdir(final):
            shards[p["new"]] = p["entry"]
        manifest.pop("pending", None)
        _save()

    _finish_pending()
    seq = int(manifest.get("merge_seq", 0))
    for _ in range(max_rounds):
        plan = plan_tiered_merge(
            {k: v.get("n_docs", 0) for k, v in shards.items()}, fanout
        )
        if not plan:
            break
        for group in plan:
            seq += 1
            new_name = f"shard_m{seq:05d}"
            hidden = os.path.join(shard_root, "." + new_name)
            stats = merge_indexes(
                [os.path.join(shard_root, g) for g in group], hidden, config
            )
            entry = {
                "complete": True,
                "files": sorted(
                    fp for g in group for fp in shards[g].get("files", [])
                ),
                "n_docs": int(stats["n_docs"]),
                "merged_from": list(group),
            }
            manifest["merge_seq"] = seq
            manifest["pending"] = {"new": new_name, "sources": list(group), "entry": entry}
            _save()
            _finish_pending()
    return manifest
