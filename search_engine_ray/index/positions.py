"""Positional sidecar index: term positions for phrase queries.

Lucene stores positions inline in its postings; here they live in a
SEPARATE parquet tree (``index_dir/positions/part=K/bucket=B/``) built
by an opt-in second pass, so the heavily-tuned main postings path —
and every index already built — is untouched. The sidecar reuses the
index's layout invariants exactly: the same analyzer, the same
``(term, bucket)`` salting (hot phrases can't form one giant group),
the same ``part = hash(term) % num_parts`` pruning, and the same
rank-vs-universe doc encoding, so a phrase query for k terms reads at
most k part directories.

Position semantics: a token's position is its index in the doc's
ANALYZED token list (stop tokens removed then compacted) — identical
to DuckDB's ``list_filter(regexp_extract_all(...))`` indexing, which
is what the s11_phrase SQL oracle checks adjacency against.

Build pipeline (mirrors build_index pass B)::

    read_parquet(corpus)
      -> map_batches(ingest)            # doc_id
      -> map_batches(PositionPartials)  # one row per (term, bucket)
                                        #   per batch; positions ride
                                        #   as ONE flattened list whose
                                        #   per-doc segment lengths are
                                        #   the tfs
      -> write_parquet(partition_cols=["part"])   # the exchange
    one merge task per part: composite-key postings sort (the same
    (term<<32|rank) trick as encode_bucket_terms), position segments
    permuted by a vectorized gather, delta+varbyte encode (positions
    restart at every doc, doc ranks at every term).

Encoded row (per term, per bucket): ``df_local`` docs; ``doc_bytes``
(varbyte rank-gaps), ``tf_bytes``, ``dl_bytes``, ``pos_bytes``
(varbyte position-gaps, absolute at each doc's first occurrence).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from search_engine_ray.codec import varbyte_byte_lengths, varbyte_decode, varbyte_encode
from search_engine_ray.config import IndexConfig, term_part
from search_engine_ray.index.build import (
    TokenizePartials,
    _large_binary_from_slices,
    _list_from_offsets,
    make_ingest_fn,
)


class PositionPartials(TokenizePartials):
    """SPIMI partials WITH token positions, for the positional fields
    only. Same combiner contract as TokenizePartials (one row per
    (term, bucket) per batch, list-typed payloads) plus a ``pos``
    list column: positions of every occurrence, doc segments delimited
    by the ``tfs`` counts. Fully vectorized — one lexsort per field
    batch, no per-token Python."""

    EMPTY = pa.table(
        {
            "term": pa.array([], pa.string()),
            "part": pa.array([], pa.int32()),
            "bucket": pa.array([], pa.int32()),
            "doc_ids": pa.array([], pa.list_(pa.int64())),
            "tfs": pa.array([], pa.list_(pa.int32())),
            "dls": pa.array([], pa.list_(pa.int32())),
            "pos": pa.array([], pa.list_(pa.int32())),
        }
    )

    def __init__(self, config: IndexConfig, field_names: tuple[str, ...]):
        super().__init__(config)
        self.field_names = field_names

    def __call__(self, batch: pa.Table) -> pa.Table:
        uids = batch["doc_id"].to_numpy()
        out: list[pa.Table] = []
        for fname in self.field_names:
            spec = self.config.field_by_name(fname)
            toks, doc_ix, dls = self._field_tokens(batch[spec.name], spec)
            n_tok = len(toks)
            if n_tok == 0:
                continue
            # position = index within the doc's analyzed token list;
            # doc_ix is non-decreasing (list_flatten order), so run
            # starts give each doc's base offset
            run_start = np.empty(n_tok, dtype=bool)
            run_start[0] = True
            np.not_equal(doc_ix[1:], doc_ix[:-1], out=run_start[1:])
            starts_idx = np.nonzero(run_start)[0]
            run_len = np.diff(np.append(starts_idx, n_tok))
            pos = (np.arange(n_tok, dtype=np.int64) - np.repeat(starts_idx, run_len)).astype(
                np.int32
            )
            denc = toks.dictionary_encode()
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            nv = len(denc.dictionary)
            ids_tok = uids[doc_ix]
            buckets_tok = (ids_tok % self.config.num_buckets).astype(np.int32)
            # stable lexsort keeps positions increasing within each
            # (term, doc) group without sorting on pos itself
            order = np.lexsort((ids_tok, buckets_tok, codes))
            codes_s = codes[order]
            buckets_s = buckets_tok[order]
            ids_s = ids_tok[order]
            pos_s = pos[order]
            dls_s = dls[doc_ix][order]
            # doc boundaries within (term, doc id)
            npost = order.size
            dchange = np.empty(npost, dtype=bool)
            dchange[0] = True
            dchange[1:] = (codes_s[1:] != codes_s[:-1]) | (ids_s[1:] != ids_s[:-1])
            dstarts = np.nonzero(dchange)[0]
            tf = np.diff(np.append(dstarts, npost)).astype(np.int32)
            doc_ids_d = ids_s[dstarts]
            dls_d = dls_s[dstarts].astype(np.int32)
            buckets_d = buckets_s[dstarts]
            codes_d = codes_s[dstarts]
            # row boundaries where (term, bucket) changes
            rchange = np.empty(dstarts.size, dtype=bool)
            rchange[0] = True
            rchange[1:] = (codes_d[1:] != codes_d[:-1]) | (buckets_d[1:] != buckets_d[:-1])
            rstarts = np.nonzero(rchange)[0]
            doc_offs = np.append(rstarts, dstarts.size).astype(np.int32)
            pos_offs = np.append(dstarts[rstarts], npost).astype(np.int32)
            prefixed = pc.binary_join_element_wise(
                pa.array([f"{spec.code}:"] * nv, pa.string()),
                pc.cast(denc.dictionary, pa.string()),
                "",
            )
            term_arr = prefixed.take(pa.array(codes_d[rstarts], pa.int64()))
            parts = [term_part(t, self.config.num_parts) for t in term_arr.to_pylist()]
            out.append(
                pa.table(
                    {
                        "term": term_arr,
                        "part": pa.array(parts, pa.int32()),
                        "bucket": pa.array(buckets_d[rstarts], pa.int32()),
                        "doc_ids": _list_from_offsets(doc_offs, pa.array(doc_ids_d, pa.int64())),
                        "tfs": _list_from_offsets(doc_offs, pa.array(tf, pa.int32())),
                        "dls": _list_from_offsets(doc_offs, pa.array(dls_d, pa.int32())),
                        "pos": _list_from_offsets(pos_offs, pa.array(pos_s, pa.int32())),
                    }
                )
            )
        if not out:
            return self.EMPTY
        return pa.concat_tables(out)


def encode_positions_bucket(t: pa.Table, bucket: int, universe: np.ndarray) -> pa.Table:
    """Encode one (part, bucket)'s positional postings — every term in
    one vectorized pass (same composite-key sort as
    encode_bucket_terms; position segments follow the postings through
    a single vectorized gather)."""
    if not t.num_rows:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "df_local": pa.array([], pa.int64()),
                "doc_bytes": pa.array([], pa.large_binary()),
                "tf_bytes": pa.array([], pa.large_binary()),
                "dl_bytes": pa.array([], pa.large_binary()),
                "pos_bytes": pa.array([], pa.large_binary()),
            }
        )
    term_arr = t["term"].combine_chunks()
    _denc = term_arr.dictionary_encode()
    _sort_ix = pc.array_sort_indices(_denc.dictionary).to_numpy()
    _rank = np.empty(_sort_ix.size, dtype=np.int64)
    _rank[_sort_ix] = np.arange(_sort_ix.size)
    codes = _rank[_denc.indices.to_numpy()]
    uniq_terms = _denc.dictionary.take(pa.array(_sort_ix))
    lists = t["doc_ids"].combine_chunks()
    row_lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    ids = lists.flatten().to_numpy()
    tfs = t["tfs"].combine_chunks().flatten().to_numpy().astype(np.int64)
    dls = t["dls"].combine_chunks().flatten().to_numpy().astype(np.int64)
    pos_flat = t["pos"].combine_chunks().flatten().to_numpy().astype(np.int64)
    if universe.size >= 2**31:
        raise ValueError("bucket universe exceeds int32 rank space; raise num_buckets")
    ranks = np.searchsorted(universe, ids).astype(np.int64)
    if ids.size and not np.array_equal(universe[ranks], ids):
        raise ValueError(f"posting doc_id missing from docmap bucket={bucket}")
    post_code = np.repeat(codes.astype(np.int64), row_lens)
    # (term, rank) composite sort; keys unique ((term, doc) occurs once
    # per partition — each doc is tokenized by exactly one ingest task)
    key = (post_code << np.int64(32)) | ranks
    order = np.argsort(key)
    key = key[order]
    post_code = (key >> np.int64(32)).astype(np.int32)
    ranks = key & np.int64(0xFFFFFFFF)
    new_tfs = tfs[order]
    new_dls = dls[order]
    # permute the variable-length position segments with their postings
    seg_starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
    new_seg_starts = np.concatenate(([0], np.cumsum(new_tfs)))[:-1]
    total_pos = pos_flat.size
    gather = np.repeat(seg_starts[order], new_tfs) + (
        np.arange(total_pos, dtype=np.int64) - np.repeat(new_seg_starts, new_tfs)
    )
    pos_sorted = pos_flat[gather]
    n = ranks.size
    n_terms = len(uniq_terms)
    term_lens = np.bincount(post_code, minlength=n_terms).astype(np.int64)
    term_starts = np.concatenate(([0], np.cumsum(term_lens)[:-1]))
    # doc stream: rank gaps, absolute at each term start (no blocks —
    # phrase verification decodes whole short lists)
    gaps = np.empty_like(ranks)
    gaps[0:1] = ranks[0:1]
    np.subtract(ranks[1:], ranks[:-1], out=gaps[1:])
    gaps[term_starts] = ranks[term_starts]
    # position stream: gaps, absolute at each doc's first occurrence
    pgaps = np.empty_like(pos_sorted)
    pgaps[0:1] = pos_sorted[0:1]
    np.subtract(pos_sorted[1:], pos_sorted[:-1], out=pgaps[1:])
    pgaps[new_seg_starts] = pos_sorted[new_seg_starts]
    # per-term byte slices
    bl_doc = varbyte_byte_lengths(gaps)
    bl_tf = varbyte_byte_lengths(new_tfs)
    bl_dl = varbyte_byte_lengths(new_dls)
    bl_pos = varbyte_byte_lengths(pgaps)
    cum_doc = np.concatenate(([0], np.cumsum(bl_doc)))
    cum_tf = np.concatenate(([0], np.cumsum(bl_tf)))
    cum_dl = np.concatenate(([0], np.cumsum(bl_dl)))
    cum_pos = np.concatenate(([0], np.cumsum(bl_pos)))
    bounds = np.append(term_starts, n)
    # posting-index -> position-stream-index boundaries (per-term byte
    # slices of the position stream go through this indirection)
    pos_stream_starts = np.concatenate(([0], np.cumsum(new_tfs)))
    return pa.table(
        {
            "term": uniq_terms.cast(pa.string()),
            "df_local": pa.array(term_lens, pa.int64()),
            "doc_bytes": _large_binary_from_slices(cum_doc[bounds], varbyte_encode(gaps, bl_doc)),
            "tf_bytes": _large_binary_from_slices(cum_tf[bounds], varbyte_encode(new_tfs, bl_tf)),
            "dl_bytes": _large_binary_from_slices(cum_dl[bounds], varbyte_encode(new_dls, bl_dl)),
            "pos_bytes": _large_binary_from_slices(
                cum_pos[pos_stream_starts[bounds]], varbyte_encode(pgaps, bl_pos)
            ),
        }
    )


def decode_positions_term(
    doc_bytes, tf_bytes, dl_bytes, pos_bytes, df: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One term's (ranks, tfs, dls, positions) — positions flattened,
    doc segments delimited by tfs (vectorized segment-cumsum)."""
    ranks = np.cumsum(varbyte_decode(doc_bytes, df).astype(np.int64))
    tfs = varbyte_decode(tf_bytes, df).astype(np.int64)
    dls = varbyte_decode(dl_bytes, df).astype(np.int64)
    raw = varbyte_decode(pos_bytes, int(tfs.sum())).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
    c = np.cumsum(raw)
    pos = c - np.repeat(c[starts] - raw[starts], tfs)
    return ranks, tfs, dls, pos


def build_positions(
    source,
    index_dir: str,
    config: IndexConfig | None = None,
    field_names: tuple[str, ...] | None = None,
) -> dict:
    """Build the positional sidecar for an EXISTING index (needs its
    docmap for the rank universes and its stats.json for the effective
    num_parts/num_buckets). Written to ``positions.tmp`` then renamed —
    the atomic-subtree upsert pattern, so a live engine never sees a
    half-built sidecar. Returns per-part metrics."""
    import ray as _ray
    import ray.data as rd

    config = config or IndexConfig()
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    if stats["num_parts"] != config.num_parts or stats["num_buckets"] != config.num_buckets:
        from dataclasses import replace as _dc_replace

        config = _dc_replace(
            config, num_parts=stats["num_parts"], num_buckets=stats["num_buckets"]
        )
    field_names = tuple(field_names or (config.fields[0].name,))
    tmp_dir = os.path.join(index_dir, "positions.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)

    text_cols = list(config.id_cols) + list(field_names)
    if isinstance(source, (str, list)):
        ds = rd.read_parquet(source, columns=sorted(set(text_cols)))
    else:
        ds = source.select_columns(sorted(set(text_cols)))
    partials = ds.map_batches(make_ingest_fn(config, None), batch_format="pyarrow").map_batches(
        PositionPartials,
        batch_format="pyarrow",
        fn_constructor_args=(config, field_names),
        concurrency=(1, 16),
    )
    part_dir = os.path.join(tmp_dir, "partials")
    partials.write_parquet(part_dir, partition_cols=["part"])

    docmap_dir = os.path.join(index_dir, "docmap")

    @_ray.remote
    def _load_universe(b: int) -> np.ndarray:
        udir = os.path.join(docmap_dir, f"bucket={b}")
        if not os.path.isdir(udir):
            return np.empty(0, dtype=np.int64)
        return np.sort(pads.dataset(udir).to_table(columns=["doc_id"])["doc_id"].to_numpy())

    univ_refs = {b: _load_universe.remote(b) for b in range(config.num_buckets)}

    @_ray.remote
    def _merge_part(k: int) -> dict:
        files = glob.glob(os.path.join(part_dir, f"part={k}", "*.parquet"))
        if not files:
            return {"part": k, "postings": 0, "terms": 0}
        t = pads.dataset(files).to_table(columns=["term", "bucket", "doc_ids", "tfs", "dls", "pos"])
        t = t.take(pc.sort_indices(t, sort_keys=[("bucket", "ascending")]))
        barr = t["bucket"].to_numpy()
        starts = np.nonzero(np.concatenate(([True], barr[1:] != barr[:-1])))[0]
        ends = np.append(starts[1:], barr.size)
        n_post, n_terms = 0, 0
        for s, e in zip(starts, ends):
            b = int(barr[s])
            universe = _ray.get(univ_refs[b])
            enc = encode_positions_bucket(t.slice(s, e - s), b, universe)
            n_post += int(enc["df_local"].to_numpy().sum())
            n_terms += enc.num_rows
            bdir = os.path.join(tmp_dir, f"part={k}", f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            pq.write_table(enc, os.path.join(bdir, "data.parquet"))
        return {"part": k, "postings": n_post, "terms": n_terms}

    metrics = _ray.get([_merge_part.remote(k) for k in range(config.num_parts)])
    shutil.rmtree(part_dir, ignore_errors=True)
    with open(os.path.join(tmp_dir, "positions.json"), "w") as f:
        json.dump({"fields": list(field_names), "parts": metrics}, f)
    final = os.path.join(index_dir, "positions")
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp_dir, final)
    with open(os.path.join(index_dir, "metrics.jsonl"), "a") as mf:
        for m in metrics:
            mf.write(json.dumps({"stage": "positions_part", **m}) + "\n")
    return {"parts": metrics}
