"""Inverted-index build: SPIMI-style partial postings in map_batches,
merged through one groupby-term shuffle into a compressed global index.

Pipeline (the reference's implied Atlas/Lucene index build,
SURVEY.md §1.1 / §7 M1, re-expressed Ray-Data-first)::

    pass A (docmap):
      read_parquet(corpus)                     # column-pruned at the read
        -> map_batches(ingest)                 # doc_id hash, bucket, content sha256
        -> write_parquet(docmap/, partition_cols=["bucket"])
    pass B (postings):
      read_parquet(corpus)                     # id + indexed text cols only
        -> map_batches(ingest, no sha)
        -> map_batches(TokenizePartials)       # SPIMI: per-batch partial postings,
                                               #   one row per (term, bucket) per batch
                                               #   (pre-aggregated combiner BEFORE shuffle)
        -> groupby(["term", "bucket"])         # THE shuffle (salted by doc-shard bucket)
             .map_groups(encode_group)         # sort docids, delta+varbyte, block-max meta
        -> write_parquet(postings/, partition_cols=["part"])
    dict/: tiny second-stage aggregate over (term, df_local, cf_local)
    stats.json: N from docmap count, per-field total_len from dict cf sums

Two passes over the source are deliberate: Ray Data pipelines have one
sink each, and materializing the ingested corpus to feed two sinks
would pin the whole input in the object store. The docmap pass never
tokenizes; the postings pass never hashes sha256.

Scale notes (100 TB / 10^12 files):
- doc_id is a 63-bit hash of the configured id columns — deterministic
  under ANY parallelism, no global sort / no coordination (vs dense ids
  which need a global order). Posting lists tolerate sparse ids via
  delta+varbyte.
- hot terms ("def", "import" appear in ~every doc) never form one
  giant shuffle group: the group key is (term, bucket) and bucket =
  doc_id % num_buckets, so the hottest group is ~N/num_buckets docs.
  This is the salted repartitioning of hot terms — the salt is the doc
  shard, so no second pass is needed to detect hot keys and the
  query-time merge is trivial (buckets partition the doc space).
- the tokenizer emits ONE row per (term, bucket) per input batch with
  list-typed columns — the shuffle moves packed arrays, not one row
  per posting.
- resumable: build_index_resumable() splits the input files into
  shards, builds each shard as an independent sub-index under
  shards/shard_XXXXX/, and records completion in manifest.json; a
  rerun skips completed shards (idempotent overwrite per shard). The
  query engine reads the union of shards (doc spaces are disjoint
  because every doc lives in exactly one shard).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from search_engine_ray.analysis import STOP_TOKENS
from search_engine_ray.codec import (
    for_encode_partition,
    varbyte_byte_lengths,
    varbyte_encode,
)
from search_engine_ray.config import IndexConfig, derive_num_parts, term_part

# On-disk postings layout versions. v2 = rank-encoded doc streams (each
# posting stores its rank in the bucket's sorted docmap universe, not the
# raw 63-bit hash) with varbyte stream encoding; v3 = the same rank
# streams bit-packed with the FOR codec (codec.for_encode_partition).
# Readers accept both and dispatch on stats.json's postings_format;
# writers pick by IndexConfig.codec. Bump on layout change.
POSTINGS_FORMAT = 2
POSTINGS_FORMAT_FOR = 3
CODEC_FORMATS = {"varbyte": POSTINGS_FORMAT, "for": POSTINGS_FORMAT_FOR}
READABLE_FORMATS = frozenset(CODEC_FORMATS.values())


def _input_bytes(source) -> int:
    """Best-effort input size estimate for the num_parts derivation:
    on-disk bytes for parquet paths, Ray's size estimate for in-memory
    Datasets, 0 (= keep configured num_parts) when unknown."""
    if isinstance(source, (str, list)):
        paths = [source] if isinstance(source, str) else list(source)
        total = 0
        for p in paths:
            if os.path.isdir(p):
                total += sum(
                    os.path.getsize(f)
                    for f in glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
                )
            elif os.path.exists(p):
                total += os.path.getsize(p)
        return total
    try:
        # only consult size_bytes() when the Dataset is already
        # materialized — on a lazy plan it would trigger execution
        if source._plan.has_computed_output():
            return int(source.size_bytes() or 0)
    except Exception:
        pass
    return 0

_MASK63 = (1 << 63) - 1


def _stabilize_fsspec_http() -> None:
    """Ray's parquet write path lazily imports
    fsspec.implementations.http per call; in this env that import
    fails (no aiohttp), and two threads racing the failing first
    import can leave a half-initialized module in sys.modules whose
    `HTTPFileSystem` lookup then raises plain ImportError — which
    Ray's `except ModuleNotFoundError` does NOT catch. Register a
    stable placeholder module once so the threaded passes never race
    the import; the placeholder class never matches isinstance checks,
    preserving Ray's `_is_http_filesystem` == False semantics."""
    import sys as _sys
    import types as _types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        mod = _types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # placeholder; aiohttp absent here
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        _sys.modules["fsspec.implementations.http"] = mod


def doc_uid(parts: Iterable[str]) -> int:
    """Deterministic 63-bit doc id from the configured id columns."""
    h = hashlib.sha256("\x00".join(parts).encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") & _MASK63


def make_ingest_fn(config: IndexConfig, sha_col: str | None):
    """map_batches fn: add doc_id + bucket (and content_sha256 when
    sha_col is given — the per-row integrity invariant, input_hint).

    sha256 is inherently per-row (C-speed hashlib); everything else is
    vectorized.
    """

    id_cols = list(config.id_cols)
    nb = config.num_buckets

    def ingest(batch: pa.Table) -> pa.Table:
        if config.use_native_id:
            # the table's own int64 id column IS the doc_id
            uids = batch[id_cols[0]].to_numpy().astype(np.int64, copy=False)
            if "doc_id" not in batch.column_names:
                batch = batch.append_column("doc_id", pa.array(uids, pa.int64()))
        else:
            idvals = [batch[c].to_pylist() for c in id_cols]
            uids = np.fromiter(
                (doc_uid(str(v) for v in row) for row in zip(*idvals)),
                dtype=np.int64,
                count=batch.num_rows,
            )
            batch = batch.append_column("doc_id", pa.array(uids, pa.int64()))
        batch = batch.append_column("bucket", pa.array(uids % nb, pa.int32()))
        if sha_col is not None:
            shas = [
                hashlib.sha256(s.encode("utf-8") if s is not None else b"").hexdigest()
                for s in batch[sha_col].to_pylist()
            ]
            batch = batch.append_column("content_sha256", pa.array(shas, pa.string()))
        return batch

    return ingest


class TokenizePartials:
    """Stateful SPIMI stage (actor pool): regex compiled once per actor;
    per batch emits pre-aggregated partial postings.

    Output schema: term:string, part:int32, bucket:int32,
    doc_ids:list<int64>, tfs:list<int32>, dls:list<int32> — one row per
    (term, bucket) seen in the batch. This is the combiner that keeps
    the groupby shuffle row count at O(vocab x buckets) per batch
    instead of O(postings); `part = hash(term) % num_parts` is
    precomputed here so the merge can group by the COARSE key
    (part, bucket) — num_parts x num_buckets groups total — and encode
    every term of a partition in one vectorized call.
    """

    EMPTY = pa.table(
        {
            "term": pa.array([], pa.string()),
            "part": pa.array([], pa.int32()),
            "bg": pa.array([], pa.int32()),
            "bucket": pa.array([], pa.int32()),
            "doc_ids": pa.array([], pa.list_(pa.int64())),
            "tfs": pa.array([], pa.list_(pa.int32())),
            "dls": pa.array([], pa.list_(pa.int32())),
        }
    )

    def __init__(self, config: IndexConfig):
        self.config = config
        # merge-task bucket-group key (see IndexConfig.merge_groups)
        self._bg_mod = max(1, min(config.merge_groups, config.num_buckets))
        from search_engine_ray.analysis import get_analyzer

        self.analyzer = get_analyzer(config.analyzer)
        self._stop_arr = pa.array(sorted(self.analyzer.stop) + [""])

    def _field_tokens(self, column, spec) -> tuple[pa.Array, np.ndarray, np.ndarray]:
        """tokens (Arrow StringArray — NEVER materialized as Python
        strings), doc index per token, and per-doc field length —
        fully vectorized: Arrow C++ lower + regex split + flatten,
        empties/stop tokens dropped with one is_in mask. Semantics
        identical to the configured analyzer's findall form
        (asserted by the analyzer-parity unit tests)."""
        n = len(column)
        arr = column.combine_chunks() if isinstance(column, pa.ChunkedArray) else column
        arr = pc.fill_null(arr, "")
        parts = pc.split_pattern_regex(pc.utf8_lower(arr), pattern=self.analyzer.split_pattern)
        flat = pc.list_flatten(parts)
        parents = pc.list_parent_indices(parts)
        keep = pc.invert(pc.is_in(flat, value_set=self._stop_arr))
        flat = flat.filter(keep)
        parents = parents.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if self.analyzer.stem == "s":
            from search_engine_ray.analysis import s_stem_array

            flat = s_stem_array(flat)
        doc_ix = parents.to_numpy(zero_copy_only=False).astype(np.int64)
        dls = np.bincount(doc_ix, minlength=n).astype(np.int32)
        return flat, doc_ix, dls

    def _partials(
        self,
        prefix: str,
        toks: pa.Array,
        doc_ix: np.ndarray,
        dls: np.ndarray,
        uids: np.ndarray,
        out: list[pa.Table],
    ) -> None:
        if len(toks) == 0:
            return
        # Arrow C++ dictionary encode: term codes without ever creating
        # per-token Python strings (pd.factorize on an object array was
        # a top-3 cost of the whole build)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        denc = toks.dictionary_encode() if not pa.types.is_dictionary(toks.type) else toks
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = denc.dictionary
        nv = len(uniq)
        # tf per (doc, term): one sort + run-length boundaries
        # (np.unique flattens/copies first — measurably slower)
        key = doc_ix * nv + codes
        ks = np.sort(key)
        bmask = np.empty(ks.size, dtype=bool)
        bmask[0] = True
        np.not_equal(ks[1:], ks[:-1], out=bmask[1:])
        kstarts = np.nonzero(bmask)[0]
        uk = ks[kstarts]
        counts = np.diff(np.append(kstarts, ks.size))
        d = uk // nv
        c = uk % nv
        ids = uids[d]
        buckets = (ids % self.config.num_buckets).astype(np.int32)
        field_dl = dls[d]
        order = np.lexsort((ids, buckets, c))
        c, buckets, ids = c[order], buckets[order], ids[order]
        tf, field_dl = counts[order].astype(np.int32), field_dl[order]
        # group boundaries where (term, bucket) changes
        change = np.empty(c.size, dtype=bool)
        change[0] = True
        np.not_equal(c[1:], c[:-1], out=change[1:])
        change[1:] |= buckets[1:] != buckets[:-1]
        starts = np.nonzero(change)[0]
        offsets = np.append(starts, c.size).astype(np.int32)
        # prefix every UNIQUE term once in Arrow, then take per group
        prefixed = pc.binary_join_element_wise(
            pa.array([prefix] * nv, pa.string()), pc.cast(uniq, pa.string()), ""
        )
        term_arr = prefixed.take(pa.array(c[starts], pa.int64()))
        term_strs = term_arr.to_pylist()  # needed for the crc32 part keys
        parts = [term_part(t, self.config.num_parts) for t in term_strs]
        out.append(
            pa.table(
                {
                    "term": term_arr,
                    "part": pa.array(parts, pa.int32()),
                    "bg": pa.array(buckets[starts] % self._bg_mod, pa.int32()),
                    "bucket": pa.array(buckets[starts], pa.int32()),
                    "doc_ids": pa.ListArray.from_arrays(offsets, pa.array(ids, pa.int64())),
                    "tfs": pa.ListArray.from_arrays(offsets, pa.array(tf, pa.int32())),
                    "dls": pa.ListArray.from_arrays(offsets, pa.array(field_dl, pa.int32())),
                }
            )
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        uids = batch["doc_id"].to_numpy()
        out: list[pa.Table] = []
        for spec in self.config.fields:
            toks, doc_ix, dls = self._field_tokens(batch[spec.name], spec)
            self._partials(f"{spec.code}:", toks, doc_ix, dls, uids, out)
            if spec.ngram:
                # edge-n-gram namespace for autocomplete (S2): expand
                # each token to prefixes; tf of a gram = sum of tfs of
                # tokens sharing the prefix; dl shared with the field.
                # Vectorized: one utf8_slice per gram length (the
                # _partials aggregation dedups/sum-counts per doc);
                # grams stay Arrow end to end.
                lens = pc.utf8_length(toks).to_numpy(zero_copy_only=False)
                gtok_parts: list[pa.Array] = []
                gdoc_parts: list[np.ndarray] = []
                for g in range(spec.ngram_min, spec.ngram_max + 1):
                    mask = lens >= g
                    if not mask.any():
                        break
                    sel = pa.array(mask)
                    grams = pc.utf8_slice_codeunits(toks.filter(sel), 0, g)
                    if isinstance(grams, pa.ChunkedArray):
                        grams = grams.combine_chunks()
                    gtok_parts.append(grams)
                    gdoc_parts.append(doc_ix[mask])
                if gtok_parts:
                    self._partials(
                        f"{spec.code}>:",
                        pa.concat_arrays(gtok_parts),
                        np.concatenate(gdoc_parts),
                        dls,
                        uids,
                        out,
                    )
            if spec.phonetic and len(toks):
                # S9 sounds-like namespace: phonetic key per token —
                # computed on the batch's UNIQUE tokens only (Arrow
                # dictionary), expanded back per token with one take
                # (so _partials re-merges same-key-different-token tfs)
                from search_engine_ray.analysis import PHONETIC_ALGOS

                algo = PHONETIC_ALGOS[spec.phonetic_algo]
                denc = toks.dictionary_encode()
                keys = pa.array(
                    [algo(u) for u in denc.dictionary.to_pylist()], pa.string()
                )
                phon = keys.take(denc.indices)
                self._partials(f"{spec.code}~:", phon, doc_ix, dls, uids, out)
        if not out:
            return self.EMPTY
        return pa.concat_tables(out)


def _large_binary_from_slices(offs: np.ndarray, data: bytes) -> pa.LargeBinaryArray:
    """Zero-copy LargeBinary column over one contiguous byte buffer:
    value i = data[offs[i]:offs[i+1]]."""
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        offs.size - 1,
        [None, pa.py_buffer(np.ascontiguousarray(offs, dtype=np.int64)), pa.py_buffer(data)],
    )


def _list_from_offsets(offs: np.ndarray, values: pa.Array) -> pa.ListArray:
    return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), values)


def encode_bucket_terms(
    t: pa.Table, part: int, bucket: int, bs: int, universe: np.ndarray,
    codec: str = "for",
) -> pa.Table:
    """Encode one (part, bucket) index partition's postings — EVERY
    term in a single vectorized pass (no per-term Python): with a
    code-corpus vocabulary (one near-unique identifier per file path)
    the number of distinct terms is O(corpus), so per-term Python calls
    are the difference between minutes and hours at scale.

    Postings format v2 — RANK-encoded doc stream: `universe` is the
    bucket's sorted doc_id array (its docmap partition); the stream
    stores each posting's RANK in that universe, delta-encoded with
    block restarts, instead of the raw 63-bit hash. Rank gaps average
    D_bucket/df (1-2 varbyte bytes) where hash gaps average 2^63/df
    (9 bytes) — ~6x smaller doc stream, and the merge lexsort runs on
    int32 keys instead of int64 (half the sort bandwidth, the measured
    scaling bottleneck). Rank order == hash order (monotone), so every
    consumer translates ranks back through the SAME universe
    immediately after decode and all downstream id logic is unchanged.
    `blk_first` metadata stays in HASH space so block skipping
    (query/wand.py) needs no universe until a block is decoded.

    Per term: merge partial lists, sort by rank, block-restart delta
    + varbyte encode the doc/tf/dl streams (one varbyte_encode call for
    the WHOLE partition, per-term values are offset slices of that
    buffer), per-block skip/block-max metadata (first_doc, byte
    offsets, max_tf, min_dl).

    block-max bound: BM25's tf-part is increasing in tf and decreasing
    in dl, so (max_tf, min_dl) per block gives a valid per-block upper
    bound computable at query time once idf/avgdl are known."""
    # sorted factorize of the term strings, Arrow-native: hash-encode on
    # the UTF-8 buffers (no Python string objects), then sort only the
    # dictionary (unique terms) and remap codes through the rank table —
    # ~3x faster than pd.factorize(sort=True) on object arrays
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
    # hash -> dense rank in the bucket universe, validated (a posting
    # doc id absent from the docmap would corrupt the rank stream)
    if universe.size >= 2**31:
        raise ValueError("bucket universe exceeds int32 rank space; raise num_buckets")
    ranks = np.searchsorted(universe, ids).astype(np.int32)
    if ids.size and not np.array_equal(universe[ranks], ids):
        raise ValueError(f"posting doc_id missing from docmap bucket={bucket}")
    post_code = np.repeat(codes.astype(np.int32), row_lens)
    # (term, rank) sort via ONE composite int64 key — measured 4x
    # faster than the 2-key lexsort and half its memory traffic (the
    # merge pass's scaling bottleneck is concurrent sort bandwidth).
    # Keys are unique (a doc is tokenized by exactly one ingest task,
    # so (term, doc) occurs once per partition), so the non-stable
    # introsort is deterministic; term code and rank are recovered
    # from the sorted key instead of two extra gathers.
    key = (post_code.astype(np.int64) << np.int64(32)) | ranks.astype(np.int64)
    order = np.argsort(key)
    key = key[order]
    post_code = (key >> np.int64(32)).astype(np.int32)
    ranks = (key & np.int64(0xFFFFFFFF)).astype(np.int32)
    tfs, dls = tfs[order], dls[order]
    n = ranks.size
    # term boundaries (codes are 0..T-1, every code present)
    term_lens = np.bincount(post_code, minlength=len(uniq_terms)).astype(np.int64)
    term_starts = np.concatenate(([0], np.cumsum(term_lens)[:-1]))
    term_ends = term_starts + term_lens
    # block starts: every bs-th posting WITHIN its term
    pos_in_term = np.arange(n, dtype=np.int64) - np.repeat(term_starts, term_lens)
    blk_idx = np.nonzero(pos_in_term % bs == 0)[0]
    # delta with restarts at block starts (term starts included) —
    # rank gaps, int32 throughout (rank < 2^31 by the universe check)
    gaps = np.empty_like(ranks)
    gaps[0:1] = ranks[0:1]
    np.subtract(ranks[1:], ranks[:-1], out=gaps[1:])
    gaps[blk_idx] = ranks[blk_idx]
    if codec == "for":
        # v3: bit-packed FOR streams (codec.for_encode_partition) —
        # absolute block-first ranks ride the fixed header, in-block
        # gaps/tfs/dls pack at bits-of-block-max. One vectorized call
        # per stream for the whole partition, same as varbyte.
        fr = ranks[blk_idx].astype(np.int64) if blk_idx.size else np.empty(0, np.int64)
        buf_doc, bnd_doc, blk_doc_off = for_encode_partition(gaps, term_starts, blk_idx, firsts=fr)
        buf_tf, bnd_tf, blk_tf_off = for_encode_partition(tfs, term_starts, blk_idx)
        buf_dl, bnd_dl, blk_dl_off = for_encode_partition(dls, term_starts, blk_idx)
        doc_bytes = _large_binary_from_slices(bnd_doc, buf_doc)
        tf_bytes = _large_binary_from_slices(bnd_tf, buf_tf)
        dl_bytes = _large_binary_from_slices(bnd_dl, buf_dl)
    elif codec == "varbyte":
        # v2: one varbyte encode per stream for the whole partition
        bl_doc = varbyte_byte_lengths(gaps)
        bl_tf = varbyte_byte_lengths(tfs)
        bl_dl = varbyte_byte_lengths(dls)
        cum_doc = np.concatenate(([0], np.cumsum(bl_doc)))
        cum_tf = np.concatenate(([0], np.cumsum(bl_tf)))
        cum_dl = np.concatenate(([0], np.cumsum(bl_dl)))
        bounds = np.append(term_starts, n)
        doc_bytes = _large_binary_from_slices(cum_doc[bounds], varbyte_encode(gaps, bl_doc))
        tf_bytes = _large_binary_from_slices(cum_tf[bounds], varbyte_encode(tfs, bl_tf))
        dl_bytes = _large_binary_from_slices(cum_dl[bounds], varbyte_encode(dls, bl_dl))
    else:
        raise ValueError(f"unknown postings codec {codec!r}")
    # per-block metadata, then per-term list boundaries over blocks
    blk_term = post_code[blk_idx]
    blocks_per_term = np.bincount(blk_term, minlength=len(uniq_terms))
    blk_offs = np.concatenate(([0], np.cumsum(blocks_per_term)))
    # block-first stays a HASH doc id: skip logic compares it against
    # query-side candidate ids without needing the universe
    blk_first = universe[ranks[blk_idx]]
    if codec == "varbyte":
        # byte offsets of each block WITHIN its term's byte slices
        t_start_of_blk = term_starts[blk_term]
        blk_doc_off = cum_doc[blk_idx] - cum_doc[t_start_of_blk]
        blk_tf_off = cum_tf[blk_idx] - cum_tf[t_start_of_blk]
        blk_dl_off = cum_dl[blk_idx] - cum_dl[t_start_of_blk]
    blk_max_tf = np.maximum.reduceat(tfs, blk_idx)
    blk_min_dl = np.minimum.reduceat(dls, blk_idx)
    cf_local = np.add.reduceat(tfs, term_starts) if n else np.empty(0, np.int64)
    return pa.table(
        {
            "term": uniq_terms.cast(pa.string()),
            "bucket": pa.array(np.full(len(uniq_terms), bucket, np.int32()), pa.int32()),
            "part": pa.array(np.full(len(uniq_terms), part, np.int32()), pa.int32()),
            "df_local": pa.array(term_lens, pa.int64()),
            "cf_local": pa.array(cf_local, pa.int64()),
            "doc_bytes": doc_bytes,
            "tf_bytes": tf_bytes,
            "dl_bytes": dl_bytes,
            "blk_first": _list_from_offsets(blk_offs, pa.array(blk_first, pa.int64())),
            "blk_doc_off": _list_from_offsets(blk_offs, pa.array(blk_doc_off, pa.int64())),
            "blk_tf_off": _list_from_offsets(blk_offs, pa.array(blk_tf_off, pa.int64())),
            "blk_dl_off": _list_from_offsets(blk_offs, pa.array(blk_dl_off, pa.int64())),
            "blk_max_tf": _list_from_offsets(blk_offs, pa.array(blk_max_tf, pa.int32())),
            "blk_min_dl": _list_from_offsets(blk_offs, pa.array(blk_min_dl, pa.int32())),
        }
    )

def build_index(
    source,
    out_dir: str,
    config: IndexConfig | None = None,
    sha_col: str | None = None,
) -> dict:
    """Build a full index under out_dir from a Dataset or parquet path(s).

    Returns the stats dict. Layout::

        out_dir/postings/part=K/...   out_dir/dict/part=K/...
        out_dir/docmap/bucket=K/...   out_dir/stats.json  manifest.json

    Written to out_dir+".tmp" then atomically renamed (E5 full-refresh
    sink semantics, lamda/group_sellable_inventory.py:46-48).
    """
    import ray.data as rd

    config = config or IndexConfig()
    if config.codec not in CODEC_FORMATS:
        raise ValueError(
            f"unknown postings codec {config.codec!r}; pick one of {sorted(CODEC_FORMATS)}"
        )
    sha_col = sha_col or config.fields[0].name
    # memory bound for the merge pass: raise num_parts so one part's
    # decoded partials fit merge_part_target_bytes (identity for small
    # corpora / auto_num_parts=False). The effective value is recorded
    # in stats.json; SearchEngine reconciles its config from there.
    eff_parts = derive_num_parts(config, _input_bytes(source))
    if eff_parts != config.num_parts:
        from dataclasses import replace as _dc_replace

        config = _dc_replace(config, num_parts=eff_parts)

    def _read(cols: list[str]):
        if isinstance(source, (str, list)):
            return rd.read_parquet(source, columns=sorted(set(cols)))
        # an in-memory Dataset: column-prune with select_columns
        return source.select_columns(sorted(set(cols)))

    tmp_dir = out_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    # cluster-facing knobs (no-ops on a single node; see CLUSTER.md):
    # SPREAD the bandwidth-heavy stages across nodes, and narrow the
    # Dataset block size to what the per-node object store supports
    from search_engine_ray.cluster import apply_cluster_data_context, spread_remote_args as _spread

    apply_cluster_data_context()
    import time as _time

    timings: dict[str, float] = {}
    _t0 = _time.perf_counter()

    # ---- passes A + B run CONCURRENTLY (two independent Ray jobs
    # sharing the streaming executor; overlaps pass A's sha256/write
    # IO with pass B's tokenize CPU). Two passes over the source are
    # deliberate: each is one pipeline with one sink, and neither
    # materializes the corpus.
    def _docmap_pass():
        # pass A: docmap (no tokenize)
        _tp = _time.perf_counter()
        docmap_in_cols = list(config.id_cols) + [
            c for c in config.docmap_cols if c != "content_sha256"
        ] + [sha_col]
        docmap = (
            _read(docmap_in_cols)
            .map_batches(
                make_ingest_fn(config, sha_col),
                batch_format="pyarrow",
                **_spread(),
            )
            .select_columns(["doc_id", "bucket", *config.docmap_cols])
        )
        docmap.write_parquet(os.path.join(tmp_dir, "docmap"), partition_cols=["bucket"])
        timings["docmap_pass_s"] = round(_time.perf_counter() - _tp, 3)

    def _partials_pass():
        _tp = _time.perf_counter()
        # pass B: postings partial runs (no sha256). THE exchange:
        # partial postings land on disk hive-partitioned by `part` —
        # each map task splits its OWN output across the part dirs, so
        # there is no sort and no all-to-all object transfer (Ray's
        # sort-based groupby was the anti-scaling stage: its reduce
        # wall time grew with worker count). Classic SPIMI "write
        # runs, merge runs per partition" with the filesystem (object
        # store / shared FS on a cluster) as the exchange medium.
        text_cols = list(config.id_cols) + [f.name for f in config.fields]
        partials = (
            _read(text_cols)
            .map_batches(
                make_ingest_fn(config, None),
                batch_format="pyarrow",
                **_spread(),
            )
            .map_batches(
                TokenizePartials,
                batch_format="pyarrow",
                fn_constructor_args=(config,),
                concurrency=(1, 16),
                **_spread(),
            )
        )
        partials.write_parquet(
            os.path.join(tmp_dir, "partials"), partition_cols=["part", "bg"]
        )
        timings["partials_pass_s"] = round(_time.perf_counter() - _tp, 3)

    from concurrent.futures import ThreadPoolExecutor

    _stabilize_fsspec_http()

    import ray as _ray

    @_ray.remote
    def _load_universe(docmap_dir: str, b: int) -> np.ndarray:
        """Sorted doc_id universe of one docmap bucket — computed ONCE
        per bucket (not once per (part, bucket): a redundant per-part
        read measurably dominated the merge pass) and shared with every
        merge task through the object store (zero-copy numpy reads;
        per-bucket refs so a task only fetches buckets it touches)."""
        udir = os.path.join(docmap_dir, f"bucket={b}")
        if not os.path.isdir(udir):
            return np.empty(0, dtype=np.int64)
        return np.sort(pads.dataset(udir).to_table(columns=["doc_id"])["doc_id"].to_numpy())

    with ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(_docmap_pass)
        fb = pool.submit(_partials_pass)
        fa.result()
        # universe tasks start as soon as the docmap lands, overlapping
        # the (longer) partials pass
        univ_refs = {
            b: _load_universe.remote(os.path.join(tmp_dir, "docmap"), b)
            for b in range(config.num_buckets)
        }
        fb.result()
    timings["ingest_passes_s"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    # ---- merge: one task per (part, bucket-group) — read that
    # group's partial runs (hive-partitioned by part AND bg at ingest,
    # so a task reads exactly its slice), encode each bucket's terms in
    # one vectorized call, and write postings/part=K/bucket=B/. The
    # bucket-group split (bg = bucket % merge_groups) exists because
    # term-hash parts SKEW — the part that drew the Zipf-head terms
    # held 3x the median part's postings and was the merge straggler;
    # hot terms are bucket-salted, so groups split them evenly
    # (measured: 32% lower merge wall AND ~25% less total task time at
    # 600k docs / 16 cpus — smaller sorts stay cache-resident). The
    # per-part dictionary (all buckets of a term share its hash part)
    # is aggregated by a tiny follow-up task per part over its groups'
    # vocab-sized partial dicts. Task memory is bounded by (postings
    # bytes / num_parts / merge_groups) — size num_parts accordingly.
    bs = config.block_size
    codec = config.codec
    n_groups = max(1, min(config.merge_groups, config.num_buckets))

    @_ray.remote(num_returns=2)
    def _merge_group(
        k: int, g: int, partial_dir: str, postings_dir: str, univ_refs: dict
    ) -> tuple:
        t0 = _time.perf_counter()
        empty_dict = pa.table(
            {
                "term": pa.array([], pa.string()),
                "df_local": pa.array([], pa.int64()),
                "cf_local": pa.array([], pa.int64()),
            }
        )
        files = glob.glob(os.path.join(partial_dir, "*.parquet"))
        if not files:
            return empty_dict, {"part": k, "bg": g, "postings": 0, "seconds": 0.0}
        n_files = len(files)
        t = pads.dataset(files).to_table(
            columns=["term", "bucket", "doc_ids", "tfs", "dls"]
        )
        t = t.take(pc.sort_indices(t, sort_keys=[("bucket", "ascending")]))
        barr = t["bucket"].to_numpy()
        starts = np.nonzero(np.concatenate(([True], barr[1:] != barr[:-1])))[0]
        ends = np.append(starts[1:], barr.size)
        dict_parts = [empty_dict]
        n_postings = 0
        n_buckets_seen = int(starts.size)
        for s, e in zip(starts, ends):
            b = int(barr[s])
            # the bucket's rank universe: fetched from the object store
            # (computed once per bucket by _load_universe; zero-copy
            # read shared by all merge tasks on the node)
            universe = _ray.get(univ_refs[b])
            enc = encode_bucket_terms(t.slice(s, e - s), k, b, bs, universe, codec=codec)
            n_postings += int(enc["df_local"].to_numpy().sum())
            bdir = os.path.join(postings_dir, f"part={k}", f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            pq.write_table(enc.drop_columns(["part", "bucket"]), os.path.join(bdir, "data.parquet"))
            dict_parts.append(enc.select(["term", "df_local", "cf_local"]))
        metrics = {
            "part": k,
            "bg": g,
            "input_run_files": n_files,
            "postings": n_postings,
            "buckets": n_buckets_seen,
            "seconds": round(_time.perf_counter() - t0, 3),
        }
        return pa.concat_tables(dict_parts), metrics

    @_ray.remote
    def _finish_dict(k: int, dict_file: str, *dict_tables) -> dict:
        # per-part dictionary from the part's group partials: vocab-
        # sized inputs, so this is a small task (it exists because all
        # buckets of a term share its hash part — the df/cf aggregate
        # is part-local). Arrow aggregate + term sort as before (terms
        # are ASCII — field code prefix + [a-z0-9_] tokens — so Arrow
        # binary order == the previous pandas sort order); pandas only
        # touches the tiny cf-by-code map.
        cat = pa.concat_tables(list(dict_tables))
        if cat.num_rows == 0:
            return {"cf": {}, "metrics": {"part": k, "terms": 0}}
        dd = (
            cat.group_by("term")
            .aggregate([("df_local", "sum"), ("cf_local", "sum")])
            .rename_columns(["term", "df", "cf"])
            .sort_by("term")
        )
        os.makedirs(os.path.dirname(dict_file), exist_ok=True)
        pq.write_table(dd, dict_file)
        ddf = dd.select(["term", "cf"]).to_pandas()
        codes = ddf["term"].str.split(":", n=1).str[0]
        return {
            "cf": ddf.groupby(codes)["cf"].sum().to_dict(),
            "metrics": {"part": k, "terms": int(len(dd))},
        }

    # merge tasks are memory-bandwidth-heavy (per-group lexsort +
    # stream encode); SER_MERGE_CPUS>1 reserves extra cpu slots per
    # task to cap concurrent merges on bandwidth-starved hosts
    merge_cpus = float(os.environ.get("SER_MERGE_CPUS", "1"))
    dict_refs: dict[int, list] = {}
    metric_refs: list = []
    for k in range(config.num_parts):
        for g in range(n_groups):
            d_ref, m_ref = _merge_group.options(num_cpus=merge_cpus, **_spread()).remote(
                k,
                g,
                os.path.join(tmp_dir, "partials", f"part={k}", f"bg={g}"),
                os.path.join(tmp_dir, "postings"),
                univ_refs,
            )
            dict_refs.setdefault(k, []).append(d_ref)
            metric_refs.append(m_ref)
    dict_futs = [
        _finish_dict.remote(
            k,
            os.path.join(tmp_dir, "dict", f"part={k}", "dict.parquet"),
            *dict_refs[k],
        )
        for k in range(config.num_parts)
    ]
    group_metrics = _ray.get(metric_refs)
    dict_results = _ray.get(dict_futs)
    cf_maps = [r["cf"] for r in dict_results]
    shutil.rmtree(os.path.join(tmp_dir, "partials"), ignore_errors=True)
    timings["merge_pass_s"] = round(_time.perf_counter() - _t0, 3)
    with open(os.path.join(tmp_dir, "metrics.jsonl"), "w") as mf:
        for m in group_metrics:
            mf.write(json.dumps({"stage": "merge_group", **m}) + "\n")
        for r in dict_results:
            mf.write(json.dumps({"stage": "dict_part", **r["metrics"]}) + "\n")
    _t0 = _time.perf_counter()

    # ---- stats: N from docmap parquet METADATA (no Ray job, no data
    # read); per-field total token count from the dict tasks' returns.
    n_docs = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(tmp_dir, "docmap", "bucket=*", "*.parquet"))
    )
    cf_by_code: dict[str, int] = {}
    for m in cf_maps:
        for code, cf in m.items():
            cf_by_code[code] = cf_by_code.get(code, 0) + int(cf)
    timings["stats_pass_s"] = round(_time.perf_counter() - _t0, 3)
    stats = {
        "postings_format": CODEC_FORMATS[config.codec],
        "n_docs": int(n_docs),
        "fields": {
            f.name: {
                "total_len": int(cf_by_code.get(f.code, 0)),
                "avgdl": (float(cf_by_code.get(f.code, 0)) / n_docs) if n_docs else 0.0,
            }
            for f in config.fields
        },
        "num_buckets": config.num_buckets,
        "num_parts": config.num_parts,
        "block_size": config.block_size,
        "k1": config.k1,
        "b": config.b,
        "timings": timings,
    }
    with open(os.path.join(tmp_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    with open(os.path.join(tmp_dir, "metrics.jsonl"), "a") as mf:
        mf.write(json.dumps({"stage": "build", "n_docs": int(n_docs), **timings}) + "\n")
    with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
        json.dump({"complete": True, "stats": stats}, f)

    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp_dir, out_dir)
    return stats


def add_tombstones(index_dir: str, doc_ids) -> int:
    """Incremental DELETE (reference upsert/delete analog): record doc
    ids as tombstones; a later compaction removes them physically.
    Visibility: SearchEngine re-reads the tombstone files whenever the
    tombstone directory changes (they are tiny), so existing engines —
    including their persistent scorer pools — exclude new deletes on
    the next search() without reconstruction. Compaction, by contrast,
    rewrites postings in place: engines must be reconstructed after
    compact_tombstones. Idempotent append (file named by content
    hash). Returns the total tombstone count."""
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    tdir = os.path.join(index_dir, "tombstones")
    os.makedirs(tdir, exist_ok=True)
    digest = hashlib.sha256(ids.tobytes()).hexdigest()[:16]
    path = os.path.join(tdir, f"{digest}.parquet")
    if not os.path.exists(path):
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), path)
    return load_tombstones(index_dir).size


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted unique tombstoned doc ids for an index dir (or its
    shards' parent)."""
    files = glob.glob(os.path.join(index_dir, "tombstones", "*.parquet"))
    if not files:
        return np.empty(0, dtype=np.int64)
    t = pads.dataset(files).to_table(columns=["doc_id"])
    return np.unique(t["doc_id"].to_numpy())


def compact_tombstones(index_dir: str, config: IndexConfig | None = None) -> int:
    """Physically remove tombstoned docs: rewrite ONLY the affected
    (part, bucket) posting partitions + docmap buckets + their dicts
    and stats, then clear the tombstones. One Ray task per affected
    bucket (partition-local, no shuffle). Returns docs removed.

    Handles BOTH layouts: a single build (index_dir holds postings/
    docmap/dict/stats.json directly) and a resumable multi-shard index
    (those live under index_dir/shards/shard_*/ while tombstones stay
    at the parent) — each shard is compacted and its stats refreshed;
    the parent tombstones are cleared only after every shard succeeds.
    Live SearchEngine instances (and their scorer actors' decode
    caches) must be reconstructed after compaction."""
    config = config or IndexConfig()
    tomb = load_tombstones(index_dir)
    if tomb.size == 0:
        return 0
    shard_glob = os.path.join(index_dir, "shards", "shard_*")
    shards = sorted(d for d in glob.glob(shard_glob) if os.path.isdir(d))
    removed = 0
    for d in shards or [index_dir]:
        removed += _compact_one_dir(d, tomb, config)
    shutil.rmtree(os.path.join(index_dir, "tombstones"), ignore_errors=True)
    return removed


def _compact_one_dir(index_dir: str, tomb: np.ndarray, config: IndexConfig) -> int:
    """Compact one single-build index dir against a tombstone set."""
    from search_engine_ray.codec import block_delta_decode, for_decode_term, varbyte_decode

    import ray as _ray

    # the ON-DISK layout is authoritative: the build may have raised
    # num_parts (auto derivation) beyond the caller's config — using
    # config.num_parts here would skip parts >= it, resurrecting
    # deleted docs and corrupting the recomputed avgdl/total_len
    with open(os.path.join(index_dir, "stats.json")) as f:
        _layout = json.load(f)
    fmt = _layout.get("postings_format")
    if fmt not in READABLE_FORMATS:
        raise ValueError(
            f"index at {index_dir} has postings_format={fmt}; this build "
            f"reads {sorted(READABLE_FORMATS)} (rank-encoded) postings — "
            "rebuild the index"
        )
    disk_codec = "for" if fmt == POSTINGS_FORMAT_FOR else "varbyte"
    if _layout.get("num_parts") or _layout.get("num_buckets"):
        from dataclasses import replace as _dc_replace

        config = _dc_replace(
            config,
            num_parts=int(_layout.get("num_parts", config.num_parts)),
            num_buckets=int(_layout.get("num_buckets", config.num_buckets)),
        )
    bs = config.block_size
    affected = sorted({int(t) % config.num_buckets for t in tomb})

    @_ray.remote
    def _compact_bucket(b: int) -> int:
        removed = 0
        # docmap; the PRE-filter doc set is the rank universe the
        # existing postings were encoded against, the POST-filter set
        # is the universe the rewritten postings use
        old_parts: list[np.ndarray] = []
        for f in glob.glob(os.path.join(index_dir, "docmap", f"bucket={b}", "*.parquet")):
            t = pq.read_table(f)
            ids = t["doc_id"].to_numpy()
            old_parts.append(ids)
            pos = np.clip(np.searchsorted(tomb, ids), 0, tomb.size - 1)
            keep = tomb[pos] != ids
            removed += int((~keep).sum())
            pq.write_table(t.filter(pa.array(keep)), f)
        old_univ = np.sort(np.concatenate(old_parts)) if old_parts else np.empty(0, np.int64)
        upos = np.clip(np.searchsorted(tomb, old_univ), 0, tomb.size - 1)
        new_univ = old_univ[tomb[upos] != old_univ]
        # postings: decode -> drop tombstoned -> re-encode per part
        for k in range(config.num_parts):
            files = glob.glob(
                os.path.join(index_dir, "postings", f"part={k}", f"bucket={b}", "*.parquet")
            )
            if not files:
                continue
            t = pads.dataset(files).to_table()
            # zero-copy row views into the posting byte buffers (the
            # round-1 loop copied every row with .as_py()); per-row
            # decode remains, but all array work stays numpy
            from search_engine_ray.query.executor import _binary_views

            doc_view = _binary_views(t["doc_bytes"])
            tf_view = _binary_views(t["tf_bytes"])
            dl_view = _binary_views(t["dl_bytes"])
            dfl = t["df_local"].to_numpy()
            keep_rows: list[int] = []
            id_parts: list[np.ndarray] = []
            tf_parts: list[np.ndarray] = []
            dl_parts: list[np.ndarray] = []
            lens: list[int] = []
            for ri in range(t.num_rows):
                n = int(dfl[ri])
                if fmt == POSTINGS_FORMAT_FOR:
                    gaps = for_decode_term(doc_view(ri), n, bs, with_firsts=True)
                    tfs_ri = for_decode_term(tf_view(ri), n, bs, with_firsts=False)
                    dls_ri = for_decode_term(dl_view(ri), n, bs, with_firsts=False)
                else:
                    gaps = varbyte_decode(doc_view(ri), n).astype(np.int64)
                    tfs_ri = varbyte_decode(tf_view(ri), n)
                    dls_ri = varbyte_decode(dl_view(ri), n)
                ranks = block_delta_decode(gaps, np.arange(0, n, bs, dtype=np.int64))
                ids = old_univ[ranks]  # rank stream -> hash doc ids
                pos = np.clip(np.searchsorted(tomb, ids), 0, tomb.size - 1)
                keep = tomb[pos] != ids
                if keep.any():
                    keep_rows.append(ri)
                    id_parts.append(ids[keep])
                    tf_parts.append(tfs_ri.astype(np.int32)[keep])
                    dl_parts.append(dls_ri.astype(np.int32)[keep])
                    lens.append(int(keep.sum()))
            out_file = os.path.join(index_dir, "postings", f"part={k}", f"bucket={b}", "data.parquet")
            for f in files:
                os.remove(f)
            if keep_rows:
                offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
                partial = pa.table(
                    {
                        "term": t["term"].take(pa.array(keep_rows, pa.int64())),
                        "bucket": pa.array(np.full(len(keep_rows), b, np.int32()), pa.int32()),
                        "doc_ids": _list_from_offsets(
                            offs, pa.array(np.concatenate(id_parts), pa.int64())
                        ),
                        "tfs": _list_from_offsets(
                            offs, pa.array(np.concatenate(tf_parts), pa.int32())
                        ),
                        "dls": _list_from_offsets(
                            offs, pa.array(np.concatenate(dl_parts), pa.int32())
                        ),
                    }
                )
                enc = encode_bucket_terms(partial, k, b, bs, new_univ, codec=disk_codec)
                pq.write_table(enc.drop_columns(["part", "bucket"]), out_file)
        return removed

    removed = sum(_ray.get([_compact_bucket.remote(b) for b in affected]))

    # rebuild dicts for every part (df/cf changed) + refresh stats
    @_ray.remote
    def _redict(k: int) -> dict:
        files = glob.glob(os.path.join(index_dir, "postings", f"part={k}", "bucket=*", "*.parquet"))
        dict_file = os.path.join(index_dir, "dict", f"part={k}", "dict.parquet")
        if not files:
            if os.path.exists(dict_file):
                os.remove(dict_file)
            return {}
        t = pads.dataset(files).to_table(columns=["term", "df_local", "cf_local"])
        dd = t.to_pandas().groupby("term", sort=True).sum().reset_index()
        dd = dd.rename(columns={"df_local": "df", "cf_local": "cf"})
        os.makedirs(os.path.dirname(dict_file), exist_ok=True)
        pq.write_table(pa.Table.from_pandas(dd, preserve_index=False), dict_file)
        codes = dd["term"].str.split(":", n=1).str[0]
        return dd.groupby(codes)["cf"].sum().to_dict()

    cf_maps = _ray.get([_redict.remote(k) for k in range(config.num_parts)])
    n_docs = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(index_dir, "docmap", "bucket=*", "*.parquet"))
    )
    cf_by_code: dict[str, int] = {}
    for m in cf_maps:
        for code, cf in m.items():
            cf_by_code[code] = cf_by_code.get(code, 0) + int(cf)
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    stats["n_docs"] = int(n_docs)
    for fld in config.fields:
        tl = int(cf_by_code.get(fld.code, 0))
        stats["fields"][fld.name] = {
            "total_len": tl,
            "avgdl": (tl / n_docs) if n_docs else 0.0,
        }
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    return removed


def build_index_resumable(
    input_files: list[str],
    out_dir: str,
    config: IndexConfig | None = None,
    files_per_shard: int = 8,
    sha_col: str | None = None,
) -> dict:
    """Checkpoint-resumable build: input files -> shards, each shard an
    independent sub-index; completed shards are skipped on rerun
    (per-partition lineage lives in manifest.json). Mirrors the
    reference's incremental upsert idempotence (E2/E4,
    lamda/store_product_sync.py:16-25) as overwrite-per-shard.

    ``input_files`` may also be a single path string (a parquet file or
    a directory, expanded recursively like ``build_index``). Expanding
    here — not via ``sorted(<str>)`` — matters: iterating a bare string
    yields its CHARACTERS, and a ``'/'`` element would send
    ``_input_bytes`` recursively globbing the root filesystem (an
    infinite walk once it enters the ``/proc/self/root`` symlink
    loop)."""
    config = config or IndexConfig()
    if isinstance(input_files, str):
        if os.path.isdir(input_files):
            input_files = glob.glob(
                os.path.join(input_files, "**", "*.parquet"), recursive=True
            )
        else:
            input_files = [input_files]
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    manifest = {"shards": {}, "resumable": True}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        manifest.setdefault("shards", {})

    files = sorted(input_files)
    shards = [files[i : i + files_per_shard] for i in range(0, len(files), files_per_shard)]
    # one num_parts for EVERY shard (query-side partition pruning
    # computes term_part once and probes each shard with the same part
    # ids): derive from the per-shard input size, record it in the
    # manifest so resumed runs stay consistent even if file sizes
    # changed since the first run
    from dataclasses import replace as _dc_replace

    if "num_parts" not in manifest:
        if manifest["shards"]:
            # legacy manifest (predates the num_parts key): its shards
            # were built with the caller's configured num_parts — pin
            # THAT, never derive, or resumed shards would get a
            # different layout than the completed ones and query-side
            # part pruning would silently miss postings
            manifest["num_parts"] = config.num_parts
        else:
            per_shard = _input_bytes(files) // max(len(shards), 1)
            manifest["num_parts"] = derive_num_parts(config, per_shard)
    config = _dc_replace(config, num_parts=int(manifest["num_parts"]), auto_num_parts=False)
    for i, shard_files in enumerate(shards):
        name = f"shard_{i:05d}"
        entry = manifest["shards"].get(name)
        if entry and entry.get("complete") and entry.get("files") == shard_files:
            continue  # checkpoint hit: skip finished shard
        shard_dir = os.path.join(out_dir, "shards", name)
        stats = build_index(shard_files, shard_dir, config, sha_col)
        manifest["shards"][name] = {
            "complete": True,
            "files": shard_files,
            "n_docs": stats["n_docs"],
        }
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=2)
    return manifest


def upsert_documents(
    parent_dir: str,
    table,
    config: IndexConfig | None = None,
    sha_col: str | None = None,
) -> dict:
    """Index-level bulk upsert — the reference's ``UpdateOne(...,
    upsert=True)`` batches (lamda/store_product_sync.py:50-74) applied
    to the INDEX itself, with Lucene ``updateDocument`` (delete+add)
    semantics: every incoming doc REPLACES the stored doc with the same
    id if one exists, else is added.

    Over a resumable layout (``parent_dir/shards/`` + manifest):

    1. the delta shard is built FIRST, under a dot-prefixed name the
       engine's ``shards/shard_*`` glob cannot see, with the full
       on-disk layout (num_parts, num_buckets, block_size, codec)
       pinned from the sibling shards' stats.json — a mismatched delta
       would silently lose documents to part/bucket pruning;
    2. the manifest records the swap intent (``pending_upsert``:
       shard name, entry, ids to delete) — a rerun replays any
       interrupted upsert to completion before planning new work;
    3. matches are tombstoned at the parent and physically compacted
       (``compact_tombstones`` rewrites only the affected partitions
       and is oracle-exact, so no query-time version masking is ever
       needed; replay is idempotent — already-removed ids compact to
       a no-op), then the hidden delta is renamed in and registered.
       The tiered merge policy (``merge.compact_shards``) later folds
       small delta shards together.

    Incoming ids must be unique within the batch (last-writer-wins
    across CALLS comes from the delete+add order; within one batch it
    would be ambiguous, so it raises). Live engines must be
    reconstructed afterwards, same rule as compaction. Returns
    ``{"replaced", "added", "shard"}``."""
    import ray.data as rd

    config = config or IndexConfig()
    manifest_path = os.path.join(parent_dir, "manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    if not manifest.get("resumable"):
        raise ValueError(f"{parent_dir} is not a resumable multi-shard index")
    from dataclasses import replace as _dc_replace

    shard_root = os.path.join(parent_dir, "shards")

    def _shard_dirs() -> list[str]:
        return sorted(
            d
            for d in glob.glob(os.path.join(shard_root, "shard_*"))
            if os.path.isdir(d)
        )

    # pin the FULL on-disk layout from a sibling shard (merge_indexes
    # validates the same invariant): num_buckets routes docs to bucket
    # dirs, block_size drives stream decode, codec the stream format —
    # any mismatch silently corrupts or hides the delta's docs
    dirs_now = _shard_dirs()
    if dirs_now:
        with open(os.path.join(dirs_now[0], "stats.json")) as f:
            st = json.load(f)
        codec_name = {v: k for k, v in CODEC_FORMATS.items()}.get(
            st.get("postings_format"), config.codec
        )
        config = _dc_replace(
            config,
            num_buckets=int(st["num_buckets"]),
            block_size=int(st["block_size"]),
            codec=codec_name,
            num_parts=int(manifest.get("num_parts", st["num_parts"])),
            auto_num_parts=False,
        )
    elif "num_parts" in manifest:
        config = _dc_replace(
            config, num_parts=int(manifest["num_parts"]), auto_num_parts=False
        )

    def _save():
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=2)

    def _finish_pending():
        """Complete (or replay after a crash) an upsert swap: delete
        old versions, rename the hidden delta in, register it, and
        re-sync sibling n_docs from their compaction-refreshed stats."""
        p = manifest.get("pending_upsert")
        if not p:
            return
        t_ids = np.asarray(p.get("tombstone_ids", []), dtype=np.int64)
        if t_ids.size:
            add_tombstones(parent_dir, t_ids)
            compact_tombstones(parent_dir, config)
        hidden = os.path.join(shard_root, "." + p["new"])
        final = os.path.join(shard_root, p["new"])
        if os.path.isdir(hidden) and not os.path.isdir(final):
            os.replace(hidden, final)
        if os.path.isdir(final):
            manifest.setdefault("shards", {})[p["new"]] = p["entry"]
        for d in _shard_dirs():
            key = os.path.basename(d)
            if key in manifest.get("shards", {}):
                with open(os.path.join(d, "stats.json")) as f:
                    manifest["shards"][key]["n_docs"] = int(json.load(f)["n_docs"])
        manifest.pop("pending_upsert", None)
        _save()

    _finish_pending()  # replay any interrupted upsert first

    if config.use_native_id:
        ids = np.asarray(table[config.id_cols[0]].to_numpy(), dtype=np.int64)
    else:
        cols = [table[c].to_pylist() for c in config.id_cols]
        ids = np.array(
            [doc_uid(str(v) for v in row) for row in zip(*cols)], dtype=np.int64
        )
    if np.unique(ids).size != ids.size:
        raise ValueError("incoming batch holds duplicate doc ids (ambiguous upsert)")

    hit_parts = []
    for d in _shard_dirs():
        dm = pads.dataset(
            os.path.join(d, "docmap"), partitioning="hive"
        ).to_table(columns=["doc_id"])
        existing = dm["doc_id"].to_numpy()
        hit_parts.append(ids[np.isin(ids, existing)])
    hits = np.unique(np.concatenate(hit_parts)) if hit_parts else np.empty(0, np.int64)

    # build the delta BEFORE any destructive step, invisible to the
    # engine glob; only then journal the swap and execute it
    seq = int(manifest.get("upsert_seq", 0)) + 1
    name = f"shard_u{seq:05d}"
    stats = build_index(
        rd.from_arrow(table), os.path.join(shard_root, "." + name), config, sha_col
    )
    manifest["upsert_seq"] = seq
    manifest["pending_upsert"] = {
        "new": name,
        "entry": {
            "complete": True,
            "files": [],
            "n_docs": int(stats["n_docs"]),
            "upsert": True,
        },
        "tombstone_ids": [int(x) for x in hits],
    }
    _save()
    _finish_pending()
    return {"replaced": int(hits.size), "added": int(ids.size - hits.size), "shard": name}
