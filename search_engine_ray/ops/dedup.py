"""Deduplication operators (task brief: exact, MinHash+LSH, SimHash,
n-gram Jaccard) as Ray Data pipelines over a documents-shaped table.

Scale design:
- exact dedup is a hash-partition groupby on the content digest with a
  map-side combiner (the shuffle moves one row per distinct digest per
  block, not the corpus).
- MinHash/SimHash signatures are computed batch-vectorized in numpy
  (one reduceat per permutation across ALL docs in the batch — no
  per-doc inner loop over permutations).
- LSH banding turns near-dup search into a groupby on band buckets:
  candidates only ever meet inside a bucket, so the all-pairs blowup
  is bounded by bucket size (capped; oversized buckets are hot-key
  skew and are dropped with a count — same salting philosophy as the
  index build).
- verification (exact n-gram Jaccard / hamming) runs on the candidate
  pairs only; candidate doc payloads are broadcast once (they are
  orders of magnitude smaller than the corpus — at larger candidate
  cardinality swap the broadcast for a repartition-join on doc_id).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Min, Sum

from search_engine_ray.analysis import TOKEN_RE

_MERSENNE = (1 << 61) - 1


from search_engine_ray.ops.rounding import round_half_up as _round4_half_up


def _digest64(values: list[str]) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[:8], "big") for v in values],
        dtype=np.uint64,
    )


_POLY_B = np.uint64(1_099_511_628_211)  # FNV-prime-style odd multiplier


def _arrow_token_stream(col) -> tuple[np.ndarray, np.ndarray, int]:
    """(per-token 64-bit hash, doc index per token, n_docs) — Arrow
    tokenize (lower + split + flatten) and md5 computed only per
    UNIQUE token (dictionary encode), never per occurrence."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    n = len(arr)
    parts = pc.split_pattern_regex(pc.utf8_lower(arr), pattern="[^a-z0-9_]+")
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parents = parents.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_ix = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return np.empty(0, np.uint64), doc_ix, n
    denc = flat.dictionary_encode()
    uh = _digest64(denc.dictionary.to_pylist())
    th = uh[denc.indices.to_numpy(zero_copy_only=False)]
    return th, doc_ix, n


def _shingle_hashes(col, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct per-doc shingle hashes (sorted within doc) concatenated
    + per-doc offsets (len n+1). Shingle hash = degree-(w-1) polynomial
    over the window's token hashes — computed for the WHOLE batch with
    w shifted adds (doc boundaries masked), no per-doc Python loop
    (docs shorter than w tokens hash their full token run; only those
    few go through a fallback loop)."""
    th, doc_ix, n = _arrow_token_stream(col)
    if th.size == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n + 1, dtype=np.int64)
    sizes = np.bincount(doc_ix, minlength=n)
    ds_list: list[np.ndarray] = []
    hs_list: list[np.ndarray] = []
    m = th.size - w + 1
    if m > 0:
        h = np.zeros(m, dtype=np.uint64)
        for j in range(w):
            h = h * _POLY_B + th[j : j + m]
        valid = doc_ix[:m] == doc_ix[w - 1 : w - 1 + m]
        ds_list.append(doc_ix[:m][valid])
        hs_list.append(h[valid])
    short = np.nonzero((sizes > 0) & (sizes < w))[0]
    if short.size:
        tok_offs = np.concatenate(([0], np.cumsum(sizes)))
        sd, sh = [], []
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash
            for d0 in short:
                hh = np.uint64(0)
                for v in th[tok_offs[d0] : tok_offs[d0 + 1]]:
                    hh = hh * _POLY_B + v
                sd.append(d0)
                sh.append(hh)
        ds_list.append(np.asarray(sd, dtype=np.int64))
        hs_list.append(np.asarray(sh, dtype=np.uint64))
    if not ds_list:
        return np.empty(0, dtype=np.uint64), np.zeros(n + 1, dtype=np.int64)
    d = np.concatenate(ds_list)
    hv = np.concatenate(hs_list)
    order = np.lexsort((hv, d))
    d, hv = d[order], hv[order]
    keep = np.empty(d.size, dtype=bool)
    keep[0] = True
    keep[1:] = (d[1:] != d[:-1]) | (hv[1:] != hv[:-1])
    d, hv = d[keep], hv[keep]
    counts = np.bincount(d, minlength=n)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return hv, offsets


# ---------------------------------------------------------------- exact


def exact_dedup(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Exact dedup: keep min(id) per content digest, annotate with the
    multiplicity (R17, reference search_utils.py:7-23 O(n²) dedup —
    ours is a hash-partition groupby). Output: digest, doc_id, dup_count."""

    def _digest(t: pa.Table) -> pa.Table:
        ds_ = [hashlib.md5((s or "").encode("utf-8")).hexdigest() for s in t[text_col].to_pylist()]
        return pa.table({"digest": pa.array(ds_, pa.string()), id_col: t[id_col]})

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        # map-side combiner: one row per digest per block
        g = df.groupby("digest", sort=False)[id_col].agg(["min", "count"]).reset_index()
        return g.rename(columns={"min": id_col, "count": "dup_count"})

    partial = ds.map_batches(_digest, batch_format="pyarrow").map_batches(
        _partial, batch_format="pandas"
    )
    return partial.groupby("digest").aggregate(
        Min(id_col, alias_name=id_col), Sum("dup_count", alias_name="dup_count")
    )


def soft_dedup_weights(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """SoftDeDup: keep every document but assign sampling weight
    1 / multiplicity of its exact content digest (data reweighting in
    place of hard dedup — duplicated content contributes once in
    expectation). One hash shuffle of (digest, id) pairs; each digest
    group resolves its own weight, so no digest->count map is
    broadcast, driver-held, or joined. Output: id, dup_count, weight."""

    def _digest(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5((s or "").encode("utf-8")).hexdigest()
            for s in t[text_col].to_pylist()
        ]
        return pa.table({"digest": pa.array(hs, pa.string()), id_col: t[id_col]})

    def _weigh(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame({
            id_col: df[id_col],
            "dup_count": np.full(n, n, dtype=np.int64),
            "weight": np.full(n, 1.0 / n, dtype=np.float64),
        })

    return (
        ds.map_batches(_digest, batch_format="pyarrow")
        .groupby("digest")
        .map_groups(_weigh, batch_format="pandas")
    )


# ------------------------------------------------------------- MinHash


@dataclass(frozen=True)
class MinHashParams:
    num_perm: int = 64
    bands: int = 16  # rows per band = num_perm // bands
    shingle_w: int = 3
    seed: int = 7
    max_bucket: int = 64  # hot-bucket cap (skew guard)

    @property
    def rows(self) -> int:
        assert self.num_perm % self.bands == 0
        return self.num_perm // self.bands


def _perm_coeffs(p: MinHashParams) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(p.seed)
    a = rng.integers(1, _MERSENNE, size=p.num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=p.num_perm, dtype=np.uint64)
    return a, b


class MinHashSignatures:
    """map_batches UDF: doc -> (doc_id, sig:list<uint64>[num_perm]).
    Permutation coefficients are built once in __init__; the prepared
    instance ships to plain tasks."""

    def __init__(self, text_col: str, id_col: str, params: MinHashParams):
        self.text_col, self.id_col, self.p = text_col, id_col, params
        self.a, self.b = _perm_coeffs(params)

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, offsets = _shingle_hashes(t[self.text_col], self.p.shingle_w)
        n = t.num_rows
        sigs = np.full((n, self.p.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if flat.size:
            nonempty = np.nonzero(np.diff(offsets) > 0)[0]
            starts = offsets[nonempty]
            for k in range(self.p.num_perm):
                # universal hash of every shingle, then per-doc min
                hv = (self.a[k] * flat + self.b[k]) % np.uint64(_MERSENNE)
                sigs[nonempty, k] = np.minimum.reduceat(hv, starts)
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1).astype(np.int64), pa.int64()), self.p.num_perm
                ),
            }
        )


def minhash_signatures(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id", params: MinHashParams | None = None
) -> Dataset:
    params = params or MinHashParams()
    # plain tasks, not an actor pool: the stage's setup (64 rng
    # coefficients) is trivial, and a fixed pool pays ~1-2s spin-up
    # and can starve upstream reads on small sessions — the prepared
    # instance ships once as the UDF (measured: bands stage 6.8s ->
    # 1.3-2.8s at sf0.1)
    return ds.map_batches(
        MinHashSignatures(text_col, id_col, params), batch_format="pyarrow"
    )


_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _band_buckets(sigs: np.ndarray, p: MinHashParams) -> np.ndarray:
    """(n, num_perm) signatures -> (n, bands) bucket keys, fully
    vectorized (splitmix-style polynomial mix — no per-row hashing)."""
    n = sigs.shape[0]
    buckets = np.empty((n, p.bands), dtype=np.uint64)
    for bidx in range(p.bands):
        band = sigs[:, bidx * p.rows : (bidx + 1) * p.rows]
        acc = np.full(n, np.uint64(bidx + 1) * _MIX2, dtype=np.uint64)
        for r in range(p.rows):
            acc = (acc ^ band[:, r]) * _MIX1
            acc ^= acc >> np.uint64(29)
        buckets[:, bidx] = acc
    return buckets.view(np.int64)


def _band_rows(sig_table: pa.Table, id_col: str, p: MinHashParams) -> pa.Table:
    """sig rows -> one row per (doc, band) with the band bucket key."""
    ids = sig_table[id_col].to_numpy()
    sigs = (
        sig_table["sig"].combine_chunks().flatten().to_numpy().reshape(-1, p.num_perm)
        .astype(np.uint64)
    )
    buckets = _band_buckets(sigs, p)
    return pa.table(
        {
            "bucket": pa.array(buckets.reshape(-1), pa.int64()),
            id_col: pa.array(np.repeat(ids, p.bands), pa.int64()),
        }
    )


class MinHashBands:
    """Fused map stage: text -> shingle minhash signatures -> band
    bucket rows (+ the coarse shuffle key) in ONE map_batches — no
    intermediate signature dataset between two Ray jobs. Used as a
    prepared-instance UDF over plain tasks (setup is trivial)."""

    def __init__(self, text_col: str, id_col: str, params: MinHashParams):
        self.inner = MinHashSignatures(text_col, id_col, params)
        self.p = params
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        sig_t = self.inner(t)
        rows = _band_rows(sig_t, self.id_col, self.p)
        cg = pc.bit_wise_and(rows["bucket"], _N_COARSE - 1)
        return rows.append_column("cg", pc.cast(cg, pa.int64()))


_N_COARSE = 64


def _pairs_within_buckets(df: pd.DataFrame, id_col: str, max_bucket: int) -> pd.DataFrame:
    """All (a<b) pairs of ids sharing a bucket, vectorized end-to-end:
    sort by (bucket, id), find group boundaries, then emit triu pairs
    batched by bucket SIZE (one fancy-index per distinct collision size
    — no Python call per bucket). Buckets larger than max_bucket are
    skew hot-keys and are skipped."""
    df = df.drop_duplicates(["bucket", id_col])
    bkt = df["bucket"].to_numpy()
    ids_all = df[id_col].to_numpy()
    order = np.lexsort((ids_all, bkt))
    bkt, ids_all = bkt[order], ids_all[order]
    starts = np.nonzero(np.concatenate(([True], bkt[1:] != bkt[:-1])))[0]
    lens = np.diff(np.append(starts, bkt.size))
    keep = (lens >= 2) & (lens <= max_bucket)
    starts, lens = starts[keep], lens[keep]
    outs_a: list[np.ndarray] = []
    outs_b: list[np.ndarray] = []
    # batch groups by their size (few distinct collision-bucket sizes)
    # so pair emission is one fancy-index per size class, not a Python
    # call per bucket
    for s in np.unique(lens):
        gs = starts[lens == s]
        idx = gs[:, None] + np.arange(s)
        ai, bi = np.triu_indices(int(s), k=1)
        d = ids_all[idx]  # id asc within bucket => a < b
        outs_a.append(d[:, ai].ravel())
        outs_b.append(d[:, bi].ravel())
    if not outs_a:
        return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
    return pd.DataFrame({"a": np.concatenate(outs_a), "b": np.concatenate(outs_b)})


def _candidate_pairs(ds_bands: Dataset, id_col: str, max_bucket: int) -> Dataset:
    """Candidate pairs from band buckets. The shuffle groups by the
    COARSE key `cg` = low bits of the bucket (not the raw bucket:
    buckets are near-unique so per-bucket map_groups would make one
    Python call per row); the per-group fn handles all of its buckets
    vectorized. Expects a `cg` column (add one if absent)."""

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        return _pairs_within_buckets(df, id_col, max_bucket)

    if "cg" not in ds_bands.schema().names:
        ds_bands = ds_bands.map_batches(
            lambda df: df.assign(cg=df["bucket"] % _N_COARSE), batch_format="pandas"
        )
    pairs = ds_bands.groupby("cg").map_groups(_pairs, batch_format="pandas")
    # a pair can surface from several bands: dedupe via groupby
    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="_n")).drop_columns(["_n"])


class _JaccardVerify:
    """Verify candidate pairs with exact shingle-set Jaccard. The
    candidate docs' shingle sets are << corpus; the PREPARED instance
    is the map UDF, shipped once (at larger scale replace with a
    doc_id join — verify="join").

    Setup (once, driver-side) factorizes every shingle string to an int
    code — EXACT, no hash-collision risk — and stores one sorted code
    array per doc. Per batch, intersections for ALL pairs come out of
    a single lexsort + adjacent-duplicate count (a code appearing
    twice under one pair id must come from both sides, because each
    doc's shingle set is already deduplicated): no per-pair Python
    set algebra."""

    def __init__(self, shingle_table: pa.Table, id_col: str, threshold: float):
        ids = shingle_table[id_col].to_numpy()
        col = shingle_table["shingles"].combine_chunks()
        lens = pc.list_value_length(col).fill_null(0).to_numpy().astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(flat)  # exact string -> int, one vectorized pass
        parents = np.repeat(np.arange(ids.size), lens)
        order = np.lexsort((codes, parents))
        starts = np.searchsorted(parents[order], np.arange(ids.size))
        ends = np.append(starts[1:], codes.size)
        sc = codes[order]
        self.codes = {int(i): sc[s:e] for i, s, e in zip(ids, starts, ends)}
        self.threshold = threshold
        self._empty = np.empty(0, dtype=sc.dtype)

    def __call__(self, t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        n = a.size
        ca = [self.codes.get(int(x), self._empty) for x in a]
        cb = [self.codes.get(int(x), self._empty) for x in b]
        la = np.fromiter((x.size for x in ca), np.int64, n)
        lb = np.fromiter((x.size for x in cb), np.int64, n)
        total = int(la.sum() + lb.sum())
        if total:
            pid = np.concatenate([np.repeat(np.arange(n), la), np.repeat(np.arange(n), lb)])
            allc = np.concatenate(ca + cb)
            o = np.lexsort((allc, pid))
            pid_o, allc_o = pid[o], allc[o]
            dup = (pid_o[1:] == pid_o[:-1]) & (allc_o[1:] == allc_o[:-1])
            inter = np.bincount(pid_o[1:][dup], minlength=n)
        else:
            inter = np.zeros(n, dtype=np.int64)
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        jac = _round4_half_up(jac)
        keep = jac >= self.threshold  # fused threshold filter
        return pa.table(
            {
                "a": t["a"].filter(pa.array(keep)),
                "b": t["b"].filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )


def _verify_pairs_join(
    ds: Dataset, pairs: Dataset, text_col: str, id_col: str,
    p: MinHashParams, threshold: float,
) -> Dataset:
    """Extreme-scale verify path: NO candidate broadcast and NO driver
    hop. `pairs` is the (deduped) candidate-pair Dataset. Shingle sets
    flow to their pairs through a doc-keyed groupby (each doc's
    shingles meet its pair memberships in one group; docs with no
    membership rows emit nothing), then a pair-keyed groupby computes
    exact Jaccard from the two sides. Every doc's shingle set crosses
    the shuffle once — the price of holding neither the pair list nor
    the candidate id set in any single memory."""

    def _memberships(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy().astype(np.int64)
        b = t["b"].to_numpy().astype(np.int64)
        docs = np.concatenate([a, b])
        return pa.table(
            {
                "doc": pa.array(docs, pa.int64()),
                "pair_a": pa.array(np.tile(a, 2), pa.int64()),
                "pair_b": pa.array(np.tile(b, 2), pa.int64()),
                "shingles": pa.array([[]] * docs.size, pa.list_(pa.string())),
            }
        )

    mem_ds = pairs.map_batches(_memberships, batch_format="pyarrow")

    def _doc_shingles(t: pa.Table) -> pa.Table:
        out = []
        for s in t[text_col].to_pylist():
            toks = TOKEN_RE.findall((s or "").lower())
            w = p.shingle_w
            if len(toks) >= w:
                sh = sorted({" ".join(toks[j : j + w]) for j in range(len(toks) - w + 1)})
            else:
                sh = [" ".join(toks)] if toks else []
            out.append(sh)
        return pa.table(
            {
                "doc": pa.array(t[id_col].to_numpy(), pa.int64()),
                "pair_a": pa.array(np.full(t.num_rows, -1), pa.int64()),
                "pair_b": pa.array(np.full(t.num_rows, -1), pa.int64()),
                "shingles": pa.array(out, pa.list_(pa.string())),
            }
        )

    shingle_rows = ds.map_batches(_doc_shingles, batch_format="pyarrow")
    both = mem_ds.union(shingle_rows)

    def _attach(df: pd.DataFrame) -> pd.DataFrame:
        # COARSE group (doc & 63): per-doc map_groups would make one
        # Python call per corpus document (the measured anti-scaling
        # pattern); instead one call handles all of a shard's docs and
        # a vectorized merge joins shingle rows onto membership rows.
        # Docs with no membership rows (non-candidates — the vast
        # majority) drop out in the inner merge.
        mem_rows = df[df["pair_a"] >= 0]
        if not len(mem_rows):
            return pd.DataFrame(
                {"pair_a": [], "pair_b": [], "doc": [], "shingles": []}
            ).astype({"pair_a": "int64", "pair_b": "int64", "doc": "int64", "shingles": object})
        sh_rows = df[df["pair_a"] < 0][["doc", "shingles"]]
        out = mem_rows[["pair_a", "pair_b", "doc"]].merge(sh_rows, on="doc", how="left")
        out["shingles"] = out["shingles"].map(
            lambda s: list(s) if isinstance(s, (list, np.ndarray)) else []
        )
        return out

    coarse_doc = both.map_batches(
        lambda df: df.assign(dg=(df["doc"].to_numpy() & (_N_COARSE - 1))),
        batch_format="pandas",
    )
    attached = coarse_doc.groupby("dg").map_groups(_attach, batch_format="pandas")

    def _jaccard(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized pair Jaccard: explode the (pair, doc, shingles)
        # rows to (pair, shingle), then one groupby counts how many
        # sides each shingle appears under per pair (2 = intersection;
        # each doc's set is pre-deduplicated) and a second groupby
        # sizes the union — no per-pair Python set algebra, no iterrows
        empty = pd.DataFrame({"a": [], "b": [], "jaccard": []}).astype(
            {"a": "int64", "b": "int64", "jaccard": "float64"}
        )
        if not len(df):
            return empty
        ex = df[["pair_a", "pair_b", "shingles"]].explode("shingles")
        ex = ex.dropna(subset=["shingles"])
        pairs_u = df[["pair_a", "pair_b"]].drop_duplicates()
        if len(ex):
            per = (
                ex.groupby(["pair_a", "pair_b", "shingles"], sort=False)
                .size()
                .reset_index(name="cnt")
            )
            per["is2"] = per["cnt"].eq(2)
            agg = (
                per.groupby(["pair_a", "pair_b"], sort=False)
                .agg(union=("cnt", "size"), inter=("is2", "sum"))
                .reset_index()
            )
            agg = pairs_u.merge(agg, on=["pair_a", "pair_b"], how="left").fillna(
                {"union": 0, "inter": 0}
            )
        else:
            agg = pairs_u.assign(union=0, inter=0)
        union = agg["union"].to_numpy(dtype=np.float64)
        inter = agg["inter"].to_numpy(dtype=np.float64)
        jac = _round4_half_up(np.where(union > 0, inter / np.maximum(union, 1.0), 0.0))
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "a": agg["pair_a"].to_numpy(dtype=np.int64)[keep],
                "b": agg["pair_b"].to_numpy(dtype=np.int64)[keep],
                "jaccard": jac[keep],
            }
        )

    coarse = attached.map_batches(
        lambda df: df.assign(pg=(df["pair_a"] * 31 + df["pair_b"]) % _N_COARSE),
        batch_format="pandas",
    )
    return coarse.groupby("pg").map_groups(_jaccard, batch_format="pandas")


def minhash_lsh_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    params: MinHashParams | None = None,
    threshold: float = 0.5,
    verify: str = "broadcast",
) -> Dataset:
    """Near-duplicate pairs via MinHash + LSH banding + exact Jaccard
    verification: (a, b, jaccard) with jaccard >= threshold, a < b.

    shingle -> minhash -> band -> bucket groupby -> candidate pairs ->
    exact verify. LSH threshold ~ (1/bands)^(1/rows).

    verify="broadcast" (default): candidate shingle sets broadcast to
    the verify actors — right while candidates << corpus.
    verify="join": doc-keyed + pair-keyed groupbys move shingles to
    pairs with NO broadcast — the path for candidate sets too large to
    hold in one memory."""
    p = params or MinHashParams()
    # fused: text -> signatures -> band buckets (+ coarse key) in one
    # stage; plain tasks (trivial setup — see minhash_signatures)
    bands = ds.map_batches(
        MinHashBands(text_col, id_col, p), batch_format="pyarrow"
    )

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        return _pairs_within_buckets(df, id_col, p.max_bucket)

    pairs = bands.groupby("cg").map_groups(_pairs, batch_format="pandas")

    if verify == "join":
        # fully distributed path: cross-band dedupe via a (a,b) groupby
        # and verification via doc-keyed joins — the candidate pairs
        # NEVER land on the driver (a dirty web corpus can produce
        # billions of them)
        deduped = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="_n")).drop_columns(["_n"])
        return _verify_pairs_join(ds, deduped, text_col, id_col, p, threshold)

    # broadcast path: collect candidate pairs driver-side (they are
    # tiny relative to the corpus: only docs that LSH-collided); the
    # cross-band pair dedupe happens HERE in pandas — a whole groupby
    # shuffle saved vs deduping distributed-then-collecting anyway
    import ray
    import ray.data as rd

    pair_df = pairs.to_pandas().drop_duplicates(["a", "b"])
    pair_all = pa.table(
        {"a": pa.array(pair_df["a"], pa.int64()), "b": pa.array(pair_df["b"], pa.int64())}
    )
    cand_ids = set(pair_df["a"]) | set(pair_df["b"])
    if not cand_ids:
        return rd.from_arrow(
            pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        )

    def _shingles(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=pa.array(sorted(cand_ids)))
        t = t.filter(mask)
        texts = t[text_col].to_pylist()
        out = []
        for s in texts:
            toks = TOKEN_RE.findall((s or "").lower())
            w = p.shingle_w
            if len(toks) >= w:
                sh = sorted({" ".join(toks[j : j + w]) for j in range(len(toks) - w + 1)})
            else:
                sh = [" ".join(toks)] if toks else []
            out.append(sh)
        return pa.table({id_col: t[id_col], "shingles": pa.array(out, pa.list_(pa.string()))})

    shingle_tbl_parts = [
        ray.get(r) for r in ds.map_batches(_shingles, batch_format="pyarrow").to_arrow_refs()
    ]
    shingle_tbl = pa.concat_tables([s for s in shingle_tbl_parts if s.num_rows] or shingle_tbl_parts)

    # the verifier's setup (factorize every candidate shingle string)
    # runs ONCE driver-side; the prepared instance ships to plain
    # tasks as the UDF — no actor pool paying the setup per actor
    return rd.from_arrow(pair_all).map_batches(
        _JaccardVerify(shingle_tbl, id_col, threshold), batch_format="pyarrow"
    )


# ------------------------------------------------- exact n-gram Jaccard


def ngram_jaccard_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 4096,
    metric: str = "jaccard",
) -> Dataset:
    """EXACT all-pairs n-gram Jaccard near-dup pairs: (a, b, jaccard)
    with round(jaccard,4) >= threshold, a < b.

    ``metric="containment"`` scores |A∩B| / min(|A|, |B|) instead
    (column name "containment") — the asymmetric measure that catches
    SUBSET duplicates (a short doc embedded verbatim in a longer one
    scores ~1.0 here but low Jaccard, the Broder containment / DataComp
    dedup case). Same exact-recall blocking: containment > 0 implies a
    shared shingle.

    Candidate generation is shared-shingle blocking: any pair with
    J > 0 shares >= 1 shingle, so (unlike MinHash-LSH banding) recall
    is exact, not probabilistic — this is the oracle-checkable dedup
    path; MinHash stays the cheap scale path. Fully distributed:

      doc -> distinct shingle-hash rows carrying the doc's shingle-set
      size -> coarse-key groupby (hash & 63; shingles are near-unique
      so per-shingle map_groups would be one call per row) -> co-
      occurrence pair rows -> groupby(a,b) counts = |intersection|
      (sizes ride along, so NO broadcast, no driver hop) ->
      jaccard = i / (sz_a + sz_b - i).

    max_shingle_df skips shingles shared by more docs (hot-key guard;
    on dirty web corpora a boilerplate shingle would otherwise emit
    df^2 pair rows — a documented approximation at scale, a no-op on
    test corpora).

    COST MODEL: pair-row volume is O(sum over shingles of df^2) — this
    is the EXACT path, priced accordingly; prefer minhash_lsh_pairs
    when the corpus shares boilerplate phrasing at scale."""

    def _rows(t: pa.Table) -> pa.Table:
        flat, offsets = _shingle_hashes(t[text_col], w)
        ids = t[id_col].to_numpy().astype(np.int64)
        sizes = np.diff(offsets)
        parents = np.repeat(np.arange(t.num_rows), sizes)
        sh = flat.view(np.int64)
        return pa.table(
            {
                "sh": pa.array(sh, pa.int64()),
                "doc": pa.array(ids[parents], pa.int64()),
                "sz": pa.array(sizes[parents].astype(np.int64), pa.int64()),
                "cg": pa.array(sh & np.int64(_N_COARSE - 1), pa.int64()),
            }
        )

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized co-occurrence: sort by (sh, doc), find group
        # boundaries, then emit each group's triu pairs batched by
        # group SIZE (a handful of distinct df values) — no Python
        # loop over the ~per-row-unique shingle groups
        sh = df["sh"].to_numpy()
        doc = df["doc"].to_numpy()
        sz = df["sz"].to_numpy()
        order = np.lexsort((doc, sh))
        sh, doc, sz = sh[order], doc[order], sz[order]
        starts = np.nonzero(np.concatenate(([True], sh[1:] != sh[:-1])))[0]
        lens = np.diff(np.append(starts, sh.size))
        keep = (lens >= 2) & (lens <= max_shingle_df)
        starts, lens = starts[keep], lens[keep]
        out_a, out_b, out_sa, out_sb = [], [], [], []
        for s in np.unique(lens):
            gs = starts[lens == s]
            idx = gs[:, None] + np.arange(s)  # (n_groups_of_size_s, s)
            ai, bi = np.triu_indices(int(s), k=1)
            d = doc[idx]
            z = sz[idx]
            out_a.append(d[:, ai].ravel())  # doc asc within group => a < b
            out_b.append(d[:, bi].ravel())
            out_sa.append(z[:, ai].ravel())
            out_sb.append(z[:, bi].ravel())
        if not out_a:
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
                 "sz_a": np.empty(0, np.int64), "sz_b": np.empty(0, np.int64)}
            )
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b),
             "sz_a": np.concatenate(out_sa), "sz_b": np.concatenate(out_sb)}
        )

    rows = ds.map_batches(_rows, batch_format="pyarrow")
    co = rows.groupby("cg").map_groups(_pairs, batch_format="pandas")

    # pair-count fold as a coarse-shard map_groups, not the multi-key
    # Dataset aggregate (measured ~12k rows/s on a 280k-row pair
    # stream — the incremental_jaccard_pairs lesson; the sharded
    # pandas groupby folds the same rows in well under a second)
    def _pairs_tag(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "sz_a": pa.array([], pa.int64()), "sz_b": pa.array([], pa.int64()),
                 "pg": pa.array([], pa.int64())}
            )
        return t.append_column("pg", pc.bit_wise_and(t["a"], _N_COARSE - 1))

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
                 "inter": np.empty(0, np.int64), "sz_a": np.empty(0, np.int64),
                 "sz_b": np.empty(0, np.int64)}
            )
        return (
            df.groupby(["a", "b"], sort=False)
            .agg(inter=("sz_a", "size"), sz_a=("sz_a", "min"), sz_b=("sz_b", "min"))
            .reset_index()
        )

    inter = (
        co.map_batches(_pairs_tag, batch_format="pyarrow")
        .groupby("pg")
        .map_groups(_agg, batch_format="pandas")
    )

    def _jaccard(t: pa.Table) -> pa.Table:
        i = t["inter"].to_numpy().astype(np.float64)
        if metric == "containment":
            u = np.minimum(t["sz_a"].to_numpy(), t["sz_b"].to_numpy())
        else:
            u = t["sz_a"].to_numpy() + t["sz_b"].to_numpy() - t["inter"].to_numpy()
        jac = _round4_half_up(i / np.maximum(u, 1))
        keep = pa.array(jac >= threshold)
        return pa.table(
            {
                "a": t["a"].filter(keep),
                "b": t["b"].filter(keep),
                metric: pa.array(jac[jac >= threshold], pa.float64()),
            }
        )

    return inter.map_batches(_jaccard, batch_format="pyarrow")


# ------------------------------------- incremental (cross-corpus) dedup


def _shingle_rows_table(t: pa.Table, text_col: str, id_col: str, w: int) -> pa.Table:
    """doc -> distinct (sh, doc, sz) shingle rows (int64 throughout —
    uint64 columns pickle poorly through shuffles)."""
    flat, offsets = _shingle_hashes(t[text_col], w)
    ids = t[id_col].to_numpy().astype(np.int64)
    sizes = np.diff(offsets)
    parents = np.repeat(np.arange(t.num_rows), sizes)
    return pa.table(
        {
            "sh": pa.array(flat.view(np.int64), pa.int64()),
            "doc": pa.array(ids[parents], pa.int64()),
            "sz": pa.array(sizes[parents].astype(np.int64), pa.int64()),
        }
    )


def write_shingle_index(
    ds: Dataset,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    num_shards: int = 64,
) -> None:
    """Persist a corpus's inverted shingle index as hash-sharded
    parquet: (sh:int64, doc:int64, sz:int64) partitioned by
    shard = sh & (num_shards-1). Built ONCE per corpus; every later
    arriving shard dedups against the files (incremental_jaccard_pairs)
    without re-reading or re-tokenizing a byte of this corpus — the
    continuous-ingest path at 100 TB, where the standing corpus is
    orders of magnitude larger than each new shard.

    One sort("shard") shuffle co-locates each shard before the write so
    the directory holds O(blocks + num_shards) files, not (write tasks
    x num_shards): a 4096-tiny-file layout made every downstream read
    spawn thousands of near-empty blocks whose groupby sort-shuffle
    task count exploded (observed: a 5k-doc corpus hung >10 min;
    co-located files finish in seconds). Build cost is one-time per
    corpus; the layout is what every later ingest batch reads.
    (sort, not repartition(keys=...): key-based repartition requires
    the opt-in HASH_SHUFFLE DataContext strategy.)"""

    def _rows(t: pa.Table) -> pa.Table:
        rows = _shingle_rows_table(t, text_col, id_col, w)
        shard = pc.bit_wise_and(rows["sh"], num_shards - 1)
        return rows.append_column("shard", shard)

    ds.map_batches(_rows, batch_format="pyarrow").sort("shard").write_parquet(
        index_dir, partition_cols=["shard"]
    )


def append_shingle_index(
    ds: Dataset,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    num_shards: int = 64,
) -> None:
    """Fold an accepted ingest batch INTO the stored shingle index —
    the second half of the continuous-ingest loop: dedup the batch
    against the index (incremental_jaccard_pairs), drop the dups, then
    append the survivors' shingle rows so the NEXT batch dedups
    against them too. Parquet hive partitions are append-friendly —
    the new files land beside the old under each shard=K/ dir, and the
    same sort("shard") co-location as the build keeps it to one file
    per touched shard per batch, not (blocks x shards).
    ``w`` / ``num_shards`` must match the build's."""

    def _rows(t: pa.Table) -> pa.Table:
        rows = _shingle_rows_table(t, text_col, id_col, w)
        shard = pc.bit_wise_and(rows["sh"], num_shards - 1)
        return rows.append_column("shard", shard)

    ds.map_batches(_rows, batch_format="pyarrow").sort("shard").write_parquet(
        index_dir, partition_cols=["shard"]
    )


def incremental_jaccard_pairs(
    index_dir: str,
    new_ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 4096,
) -> Dataset:
    """EXACT cross-corpus near-dup pairs between a NEW shard and the
    STANDING corpus behind a stored shingle index (write_shingle_index):
    (new_id, old_id, jaccard) with round(jaccard,4) >= threshold.

    Same exact-recall shared-shingle blocking as ngram_jaccard_pairs —
    any cross pair with J > 0 shares a shingle — but the old side never
    re-tokenizes: its shingle rows stream from the index parquet,
    pre-filtered per batch by an np.isin probe against the NEW shard's
    broadcast distinct-shingle set (the new shard is small by
    construction — it's one ingest batch — so its distinct hashes fit
    one object-store value; at extreme new-shard sizes swap the probe
    for a per-shard Bloom filter and keep the same plan). Only old rows
    whose shingle occurs in the new shard survive the read, so the
    cross-pair shuffle carries candidate rows, not the corpus.

      new shard -> (sh, doc, sz) rows          [tokenize once]
      index     -> rows, np.isin-filtered      [plain tasks, broadcast ref]
      union -> groupby(sh & 63) -> per-shingle old x new merge (pandas
      merge on sh IS the vectorized cross product) -> groupby(new, old)
      count = |intersection| (sizes ride along) -> jaccard filter.

    max_shingle_df drops shingles whose old-side df exceeds the cap
    inside each coarse group (boilerplate guard, same contract as
    ngram_jaccard_pairs)."""
    import ray
    import ray.data as rd

    # materialize ONLY the new shard's shingle rows (the bounded small
    # side — one ingest batch): the probe collection below and the
    # pair plan both consume them, and without pinning, the tokenize
    # stage would run twice
    new_rows = new_ds.map_batches(
        lambda t: _shingle_rows_table(t, text_col, id_col, w), batch_format="pyarrow"
    ).materialize()
    # the new shard's distinct shingle set: small (one ingest batch),
    # collected once, shared via the object store
    parts = [
        np.unique(b["sh"].to_numpy())
        for b in new_rows.iter_batches(batch_format="pyarrow")
    ]
    probe = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    probe_ref = ray.put(probe)

    def _filter_old(t: pa.Table) -> pa.Table:
        pr = ray.get(probe_ref)  # plasma-local after the first batch
        sh = t["sh"].to_numpy()
        keep = np.zeros(sh.size, dtype=bool)
        if pr.size:
            pos = np.searchsorted(pr, sh)
            np.clip(pos, 0, pr.size - 1, out=pos)
            keep = pr[pos] == sh
        mask = pa.array(keep)
        return pa.table(
            {
                "sh": t["sh"].filter(mask),
                "doc": t["doc"].filter(mask),
                "sz": t["sz"].filter(mask),
                "side": pa.array(np.zeros(int(np.count_nonzero(keep)), np.int64)),
            }
        )

    # one read task per index shard file: without the cap the reader
    # fans out per-file tasks and the downstream groupby sort-shuffle
    # scales with block count squared-ish in task overhead
    n_files = sum(
        1 for _, _, fs in os.walk(index_dir) for f in fs if f.endswith(".parquet")
    )
    old_rows = rd.read_parquet(
        index_dir,
        columns=["sh", "doc", "sz"],
        override_num_blocks=max(1, min(n_files, 64)),
    ).map_batches(_filter_old, batch_format="pyarrow")
    tagged_new = new_rows.map_batches(
        lambda t: t.append_column("side", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    both = old_rows.union(tagged_new).map_batches(
        lambda t: t.append_column("cg", pc.bit_wise_and(t["sh"], _N_COARSE - 1)),
        batch_format="pyarrow",
    )

    def _cross(df: pd.DataFrame) -> pd.DataFrame:
        old = df[df["side"] == 0]
        new = df[df["side"] == 1]
        if old.empty or new.empty:
            return pd.DataFrame(
                {"new_id": np.empty(0, np.int64), "old_id": np.empty(0, np.int64),
                 "sz_new": np.empty(0, np.int64), "sz_old": np.empty(0, np.int64)}
            )
        dfc = old.groupby("sh", sort=False)["doc"].size()
        hot = dfc[dfc > max_shingle_df].index
        if len(hot):
            old = old[~old["sh"].isin(hot)]
        m = new.merge(old, on="sh", suffixes=("_n", "_o"))
        return pd.DataFrame(
            {"new_id": m["doc_n"].to_numpy(), "old_id": m["doc_o"].to_numpy(),
             "sz_new": m["sz_n"].to_numpy(), "sz_old": m["sz_o"].to_numpy()}
        )

    co = both.groupby("cg").map_groups(_cross, batch_format="pandas")

    # pair-count fold as ONE coarse-shard map_groups (shard = new_id
    # hash): Ray's multi-key sort aggregate measured ~12k rows/s on
    # this 280k-row tail (59 s — the whole op's wall time); the
    # sharded pandas groupby does the same fold in under a second
    def _pairs_tag(t: pa.Table) -> pa.Table:
        if "new_id" not in t.column_names:
            return pa.table(
                {"new_id": pa.array([], pa.int64()), "old_id": pa.array([], pa.int64()),
                 "sz_new": pa.array([], pa.int64()), "sz_old": pa.array([], pa.int64()),
                 "ng": pa.array([], pa.int64())}
            )
        return t.append_column("ng", pc.bit_wise_and(t["new_id"], _N_COARSE - 1))

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "new_id" not in df.columns:
            return pd.DataFrame(
                {"new_id": np.empty(0, np.int64), "old_id": np.empty(0, np.int64),
                 "inter": np.empty(0, np.int64), "sz_new": np.empty(0, np.int64),
                 "sz_old": np.empty(0, np.int64)}
            )
        g = (
            df.groupby(["new_id", "old_id"], sort=False)
            .agg(inter=("sz_new", "size"), sz_new=("sz_new", "min"), sz_old=("sz_old", "min"))
            .reset_index()
        )
        return g

    inter = (
        co.map_batches(_pairs_tag, batch_format="pyarrow")
        .groupby("ng")
        .map_groups(_agg, batch_format="pandas")
    )

    def _jaccard(t: pa.Table) -> pa.Table:
        i = t["inter"].to_numpy().astype(np.float64)
        u = t["sz_new"].to_numpy() + t["sz_old"].to_numpy() - t["inter"].to_numpy()
        jac = _round4_half_up(i / np.maximum(u, 1))
        keep = pa.array(jac >= threshold)
        return pa.table(
            {
                "new_id": t["new_id"].filter(keep),
                "old_id": t["old_id"].filter(keep),
                "jaccard": pa.array(jac[jac >= threshold], pa.float64()),
            }
        )

    return inter.map_batches(_jaccard, batch_format="pyarrow")


# ------------------------------------------------------------- SimHash


def simhash_signatures(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """64-bit SimHash per doc: sum tf-weighted ±1 per bit of each
    token's md5-64, sign -> bit. Vectorized over the batch via
    unpackbits + reduceat."""

    def _f(t: pa.Table) -> pa.Table:
        # whole-batch vectorized: md5 once per UNIQUE token, tf per
        # (doc, token) via one sort + run-length, sign-sums via one
        # reduceat over doc boundaries (round-1 looped docs in Python
        # and re-hashed every doc's tokens)
        th, doc_ix, n = _arrow_token_stream(t[text_col])
        out = np.zeros(n, dtype=np.uint64)
        if th.size:
            # (doc, token-hash) tf counts; th is md5-derived so the
            # hash IS the token identity
            order = np.lexsort((th, doc_ix))
            d_s, h_s = doc_ix[order], th[order]
            bmask = np.empty(d_s.size, dtype=bool)
            bmask[0] = True
            bmask[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
            starts = np.nonzero(bmask)[0]
            tfs = np.diff(np.append(starts, d_s.size))
            d_u, h_u = d_s[starts], h_s[starts]
            bits = np.unpackbits(h_u.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            contrib = (bits.astype(np.int64) * 2 - 1) * tfs[:, None]
            dmask = np.empty(d_u.size, dtype=bool)
            dmask[0] = True
            dmask[1:] = d_u[1:] != d_u[:-1]
            dstarts = np.nonzero(dmask)[0]
            sums = np.add.reduceat(contrib, dstarts, axis=0)
            fp_bits = (sums > 0).astype(np.uint8)
            packed = np.packbits(fp_bits, axis=1, bitorder="little").copy().view(np.uint64).ravel()
            out[d_u[dstarts]] = packed
        return pa.table({id_col: t[id_col], "simhash": pa.array(out.astype(np.int64), pa.int64())})

    return ds.map_batches(_f, batch_format="pyarrow")


def simhash_pairs(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3,
    max_bucket: int = 256,
) -> Dataset:
    """Near-dup pairs with hamming(simhash) <= max_hamming, found by
    exact-match blocking on each 16-bit quarter of the fingerprint
    (a pair within hamming<=3 collides on >=1 of 4 quarters)."""
    sigs = simhash_signatures(ds, text_col, id_col)

    def _blocks(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        fps = t["simhash"].to_numpy().astype(np.uint64)
        parts = []
        for q in range(4):
            quarter = ((fps >> np.uint64(16 * q)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "bucket": pa.array(quarter + (q << 32), pa.int64()),
                        id_col: pa.array(ids, pa.int64()),
                        "simhash": pa.array(fps.astype(np.int64), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        # coarse group: handle every real collision bucket vectorized
        df = df.drop_duplicates(["bucket", id_col])
        df = df[df.duplicated("bucket", keep=False)]
        out = []
        for _, g in df.groupby("bucket", sort=False):
            g = g.sort_values(id_col)
            ids = g[id_col].to_numpy()
            if ids.size > max_bucket:
                continue
            fps = g["simhash"].to_numpy().astype(np.uint64)
            ai, bi = np.triu_indices(ids.size, k=1)
            x = fps[ai] ^ fps[bi]
            ham = np.zeros(x.size, dtype=np.int64)
            for _ in range(64):
                ham += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            keep = ham <= max_hamming
            out.append(pd.DataFrame({"a": ids[ai][keep], "b": ids[bi][keep], "hamming": ham[keep]}))
        if not out:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
                                 "hamming": np.empty(0, np.int64)})
        return pd.concat(out, ignore_index=True)

    blocks = sigs.map_batches(_blocks, batch_format="pyarrow")
    coarse = blocks.map_batches(
        lambda df: df.assign(cg=df["bucket"] % _N_COARSE), batch_format="pandas"
    )
    pairs = coarse.groupby("cg").map_groups(_pairs, batch_format="pandas")
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


def connected_components(
    pairs: Dataset,
    a_col: str = "a",
    b_col: str = "b",
    id_out: str = "doc_id",
    comp_out: str = "component",
    max_iters: int = 25,
    num_shards: int = 32,
) -> Dataset:
    """Cluster near-dup candidate pairs into connected components:
    one row per doc appearing in any pair, labeled with the MINIMUM
    doc id reachable from it (= a canonical representative per
    duplicate cluster, the step after `minhash_lsh_pairs` /
    `simhash_pairs` that turns pairs into keep/drop decisions).

    Distributed min-label propagation — no driver-side union-find:
    the symmetric edge list (with self-loops) is materialized once (it
    is the candidate-pair graph, orders of magnitude smaller than the
    corpus). Each round co-locates edges and current labels on a
    COARSE hash shard of the node (the asof_join exchange pattern —
    NOT Dataset.join, whose hash aggregator emits schema-less empty
    partitions that break downstream stages), runs ONE vectorized
    pandas merge per shard emitting label(u) candidates for every
    neighbor v with a per-(shard, v) partial min, then a global
    groupby-min folds the partials. Labels are monotone non-increasing
    per node, so for numeric ids a label-sum aggregate is an EXACT
    convergence check (one cheap scan, no compare join); non-numeric
    ids use a per-row 64-bit content checksum sum (change detection
    missed w.p. ~2^-64; max_iters bounds the loop regardless). Rounds
    needed = O(log2 longest path); real near-dup clusters are tiny
    (pairs/triples), so 2-3 rounds.
    """

    def _sym(t: pa.Table) -> pa.Table:
        ca, cb = t[a_col], t[b_col]
        return pa.concat_tables([
            pa.table({"u": ca, "v": cb}),
            pa.table({"u": cb, "v": ca}),
            pa.table({"u": ca, "v": ca}),
            pa.table({"u": cb, "v": cb}),
        ])

    edges = pairs.map_batches(_sym, batch_format="pyarrow").materialize()
    _sch = edges.schema()
    numeric = pa.types.is_integer(_sch.types[_sch.names.index("v")])

    def _norm_labels(df: pd.DataFrame) -> pd.DataFrame:
        # (group key, min) from any upstream naming -> (node, label)
        out = df.iloc[:, :2].copy()
        out.columns = ["node", "label"]
        return out

    def _shard_of(arr: np.ndarray) -> np.ndarray:
        return (pd.util.hash_array(arr) % num_shards).astype(np.int32)

    def _tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_shard": _shard_of(df["u"].to_numpy()),
            "_side": np.zeros(len(df), np.int8),
            "u": df["u"], "v": df["v"], "label": df["u"],  # placeholder col
        })

    def _tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        df = _norm_labels(df)
        return pd.DataFrame({
            "_shard": _shard_of(df["node"].to_numpy()),
            "_side": np.ones(len(df), np.int8),
            "u": df["node"], "v": df["node"],  # placeholder col
            "label": df["label"],
        })

    def _propagate(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["_side"] == 0][["u", "v"]]
        lab = df[df["_side"] == 1][["u", "label"]]
        if e.empty or lab.empty:
            return pd.DataFrame({"node": lab["u"][:0], "label": lab["label"][:0]})
        m = e.merge(lab, on="u", how="inner")
        part = m.groupby("v", sort=False)["label"].min().reset_index()
        part.columns = ["node", "label"]
        return part

    tagged_edges = edges.map_batches(_tag_edges, batch_format="pandas").materialize()

    def _checksum(lab: Dataset) -> int:
        def _h(df: pd.DataFrame) -> pd.DataFrame:
            df = _norm_labels(df)
            h = pd.util.hash_array(df["node"].to_numpy()) ^ pd.util.hash_array(
                df["label"].to_numpy()
            )
            # int64 view: sums wrap, which is fine for change detection
            return pd.DataFrame({"c": h.view(np.int64)})

        return int(lab.map_batches(_h, batch_format="pandas").sum("c") or 0)

    def _label_sum(lab: Dataset) -> int:
        def _s(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"s": _norm_labels(df)["label"].astype("int64")})

        return int(lab.map_batches(_s, batch_format="pandas").sum("s") or 0)

    labels = edges.groupby("u").aggregate(Min("v", alias_name="label")).materialize()
    fingerprint = _label_sum if numeric else _checksum
    prev = fingerprint(labels)
    for _ in range(max_iters):
        both = tagged_edges.union(labels.map_batches(_tag_labels, batch_format="pandas"))
        partials = both.groupby("_shard").map_groups(_propagate, batch_format="pandas")
        new = (
            partials.groupby("node").aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur = fingerprint(new)
        labels = new
        if cur == prev:
            break
        prev = cur

    def _out(df: pd.DataFrame) -> pd.DataFrame:
        df = _norm_labels(df)
        return pd.DataFrame({id_out: df["node"], comp_out: df["label"]})

    return labels.map_batches(_out, batch_format="pandas")


def drop_near_duplicates(
    docs: Dataset,
    components: Dataset,
    id_col: str = "doc_id",
    comp_col: str = "component",
    method: str = "broadcast",
) -> Dataset:
    """Keep-one near-dup removal — the step after
    `connected_components` that turns duplicate clusters into the
    surviving corpus (what RefinedWeb/Dolma-style pipelines write out).
    A doc is dropped iff it appears in `components` with a label other
    than its own id (the label is the min reachable id, so exactly the
    min-id member of every cluster survives; unpaired docs never
    appear in `components` and always survive).

    method="broadcast" (default): the drop-id set is candidate-graph-
    sized, not corpus-sized — `ray.put` once, fetched once per actor in
    `__init__`, each corpus block filtered with one vectorized
    searchsorted. No shuffle of the corpus at all.

    method="shuffle": for a pathologically dirty corpus where even the
    drop set exceeds a worker's heap — hash-partitioned left-outer
    join (`hash_join`) + null-marker filter; the corpus moves once.
    """
    drop_ids = components.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t[id_col], t[comp_col]))).select([id_col]),
        batch_format="pyarrow",
    )
    if method == "broadcast":
        import ray

        pdf = drop_ids.to_pandas()
        # an all-kept components set reaches the driver as schema-less
        # empty blocks — to_pandas() then has no columns at all
        ids = (
            np.sort(pdf[id_col].to_numpy(dtype=np.int64, na_value=-1))
            if len(pdf) and id_col in pdf.columns
            else np.empty(0, np.int64)
        )
        ref = ray.put(ids)

        def _drop(t: pa.Table) -> pa.Table:
            # ray.get of a put object is a node-local plasma lookup —
            # the array ships to each node once, not per batch
            drop = ray.get(ref)
            if not len(t) or not drop.size:
                return t
            v = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(drop, v), 0, drop.size - 1)
            return t.filter(pa.array(drop[pos] != v))

        return docs.map_batches(_drop, batch_format="pyarrow")
    if method != "shuffle":
        raise ValueError(f"unknown method {method!r}")
    from search_engine_ray.ops.relational import hash_join

    marked = drop_ids.map_batches(
        lambda t: t.append_column("_dup", pa.array(np.ones(len(t), np.int8))),
        batch_format="pyarrow",
    )
    j = hash_join(docs, marked, on=[id_col], how="left_outer")
    return j.map_batches(
        lambda t: t.filter(pc.is_null(t["_dup"])).drop_columns(["_dup"]),
        batch_format="pyarrow",
    )


def keep_best_in_component(
    docs: Dataset,
    components: Dataset,
    score_col: str,
    id_col: str = "doc_id",
    comp_col: str = "component",
    num_shards: int = 64,
) -> Dataset:
    """Quality-aware survivor selection: within every near-dup cluster
    keep the member with the HIGHEST `score_col` (tie -> lowest id),
    instead of `drop_near_duplicates`' blind min-id rule — the policy
    production curation pipelines actually use (RefinedWeb/Dolma keep
    the best-scoring copy of boilerplate-near documents).

    Scale shape mirrors drop_near_duplicates: `components` is
    candidate-graph-sized, so membership and the id->component map are
    broadcast (`ray.put` once, plasma-local per task); member scores
    are extracted from the corpus with one vectorized searchsorted
    probe per block (the corpus never shuffles); winners come from a
    COARSE-sharded groupby (component % num_shards — never one group
    per component) with a per-shard vectorized sort + drop_duplicates;
    the final drop set is again broadcast. The only shuffle is the
    winner groupby over the member-sized table."""
    import ray

    comp_pdf = components.to_pandas()
    if not len(comp_pdf) or id_col not in comp_pdf.columns:
        return docs
    order = np.argsort(comp_pdf[id_col].to_numpy(dtype=np.int64))
    member_ids = comp_pdf[id_col].to_numpy(dtype=np.int64)[order]
    member_comp = comp_pdf[comp_col].to_numpy(dtype=np.int64)[order]
    mref = ray.put((member_ids, member_comp))

    def _member_scores(t: pa.Table) -> pa.Table:
        ids_s, comp_s = ray.get(mref)
        if not len(t):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    comp_col: pa.array([], pa.int64()),
                    score_col: pa.array([], pa.float64()),
                }
            )
        v = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(ids_s, v), 0, ids_s.size - 1)
        hit = ids_s[pos] == v
        return pa.table(
            {
                id_col: pa.array(v[hit], pa.int64()),
                comp_col: pa.array(comp_s[pos[hit]], pa.int64()),
                score_col: pa.array(
                    t[score_col].to_numpy(zero_copy_only=False)[hit].astype(np.float64)
                ),
            }
        )

    members = docs.map_batches(_member_scores, batch_format="pyarrow")
    sharded = members.map_batches(
        lambda df: df.assign(_shard=(df[comp_col] % num_shards).astype(np.int32)),
        batch_format="pandas",
    )

    def _winners(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({id_col: np.empty(0, np.int64)})
        w = df.sort_values(
            [comp_col, score_col, id_col], ascending=[True, False, True]
        ).drop_duplicates(comp_col)
        return pd.DataFrame({id_col: w[id_col].to_numpy(dtype=np.int64)})

    winner_pdf = (
        sharded.groupby("_shard").map_groups(_winners, batch_format="pandas").to_pandas()
    )
    winner_ids = (
        winner_pdf[id_col].to_numpy(dtype=np.int64)
        if len(winner_pdf) and id_col in winner_pdf.columns
        else np.empty(0, np.int64)
    )
    drop = np.sort(np.setdiff1d(member_ids, winner_ids))
    dref = ray.put(drop)

    def _drop(t: pa.Table) -> pa.Table:
        d = ray.get(dref)
        if not len(t) or not d.size:
            return t
        v = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(d, v), 0, d.size - 1)
        return t.filter(pa.array(d[pos] != v))

    return docs.map_batches(_drop, batch_format="pyarrow")


# ---------------------------------------------------- decontamination


class _ContaminationCheck:
    """Prepared-instance UDF flagging docs that share any shingle
    with the blocklist. The sorted hash array ships once with the
    UDF (object store); each batch is one vectorized np.isin over
    its distinct per-doc shingle hashes."""

    def __init__(self, block: np.ndarray, text_col: str, id_col: str, w: int):
        self.block = block
        self.text_col = text_col
        self.id_col = id_col
        self.w = w

    def __call__(self, t: pa.Table) -> pa.Table:
        hv, offs = _shingle_hashes(t[self.text_col], self.w)
        n = len(offs) - 1
        doc_ix = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        hit = np.isin(hv, self.block, assume_unique=False)
        flag = np.bincount(doc_ix[hit], minlength=n) > 0
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "contaminated": pa.array(flag.astype(np.int64), pa.int64()),
            }
        )


def novelty_fractions(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    num_partitions: int = 16,
) -> Dataset:
    """Per-doc n-gram novelty (the RefinedWeb/CCNet curation signal
    'how much of this doc is first-seen here'): for each doc with >= 1
    ``w``-shingle, novel_frac = fraction of its DISTINCT shingles
    whose earliest holder (min ``id_col`` across the corpus) is this
    doc. Ingest-ordered ids make this 'unseen in any earlier doc'.

    Scale shape: shingle rows (sh, doc) hash-bucket by shingle (all
    holders of a shingle co-locate), ONE sort-shuffle, and each
    bucket computes min-holder + per-row novelty + per-doc partial
    counts in a single vectorized pass — no join, no separate
    min-aggregate exchange (the original min-agg + co-hash-join plan
    cost ~2 exchanges more at identical output). A final per-doc
    combiner folds the partials. Output: (doc_id, n_shingles,
    novel_frac)."""
    from search_engine_ray.ops import relational as _rel

    def _rows(t: pa.Table) -> pa.Table:
        tab = _shingle_rows_table(t, text_col, id_col, w)
        sh = tab["sh"].to_numpy(zero_copy_only=False)
        b = (sh * np.int64(2654435761)) % np.int64(num_partitions * 4)
        return pa.table({
            "_b": pa.array(b, pa.int64()),
            "sh": tab["sh"], "doc": tab["doc"],
        })

    def _bucket_novel(t: pa.Table) -> pa.Table:
        sh = t["sh"].to_numpy(zero_copy_only=False)
        doc = t["doc"].to_numpy(zero_copy_only=False)
        o = np.lexsort((doc, sh))
        sh, doc = sh[o], doc[o]
        new_run = np.ones(sh.size, dtype=bool)
        new_run[1:] = sh[1:] != sh[:-1]
        # doc sorted within run -> run's first element IS min(doc)
        run_id = np.cumsum(new_run) - 1
        first_doc = doc[np.flatnonzero(new_run)][run_id]
        novel = (doc == first_doc).astype(np.int64)
        df = pd.DataFrame({"doc_id": doc, "n_shingles": 1, "novel": novel})
        g = df.groupby("doc_id", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = _rel.grouped_aggregate(
        ds.map_batches(_rows, batch_format="pyarrow")
        .groupby("_b").map_groups(_bucket_novel, batch_format="pyarrow"),
        ["doc_id"],
        {"n_shingles": ("sum", "n_shingles"), "novel": ("sum", "novel")},
    )

    def _frac(t: pa.Table) -> pa.Table:
        n = t["n_shingles"].to_numpy(zero_copy_only=False).astype(np.float64)
        nov = t["novel"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_shingles": t["n_shingles"],
            "novel_frac": pa.array(_round4_half_up(nov / n), pa.float64()),
        })

    return agg.map_batches(_frac, batch_format="pyarrow")


def contamination_flags(
    ds: Dataset,
    eval_side,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    concurrency: tuple[int, int] | int | None = None,  # unused; kept for API compat
) -> Dataset:
    """Benchmark decontamination (GPT-3-style n-gram overlap filter):
    flag every corpus doc sharing at least one ``w``-token shingle
    with the eval/benchmark corpus ``eval_side`` (a Dataset or a
    pyarrow Table with ``text_col``). GPT-3's published procedure is
    this op with w=13; the default w=3 suits the tiny test corpora.

    Scale shape: the blocklist is the EVAL set's shingles — small by
    construction (benchmarks are thousands of docs, not billions) —
    collected once, deduplicated, and shipped once with the prepared
    probe UDF; the corpus streams through one ``np.isin`` per batch. Shingles compare
    by the same 64-bit polynomial-over-md5 hash as the Jaccard ring
    (collision odds ~2^-64 per pair; docs shorter than ``w`` tokens
    hash their full token run, mirroring `_shingle_hashes`). Output is
    `(id_col, contaminated:int64)` — filter or route on it."""
    if isinstance(eval_side, pa.Table):
        batches = [eval_side]
    else:
        batches = eval_side.select_columns([text_col]).iter_batches(
            batch_format="pyarrow", batch_size=4096
        )
    parts = []
    for bt in batches:
        hv, _offs = _shingle_hashes(bt[text_col], w)
        if hv.size:
            parts.append(np.unique(hv))
    block = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
    # prepared probe ships once as the UDF to plain tasks (the
    # blocklist is eval-set-sized); no fixed pool to spin up or starve
    # upstream reads
    return ds.map_batches(
        _ContaminationCheck(block, text_col, id_col, w), batch_format="pyarrow"
    )


# ------------------------------------------------- line-level dedup


def _line_stream(col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Split a string column on newline: (flat lines, parent doc index
    per line, lines-per-doc). An empty/null doc still yields one empty
    line — the same contract as DuckDB ``string_split``."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    parts = pc.split_pattern(arr, pattern="\n")
    flat = pc.list_flatten(parts)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, parents, counts


def line_dedup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> Dataset:
    """CCNet/C4-style line-level dedup: remove every NON-EMPTY line
    whose exact content occurs >= ``min_count`` times across the whole
    corpus (boilerplate headers/footers/navigation), preserving the
    remaining lines in order. Empty lines are document structure, not
    content — they never count and are never removed.

    Scale shape: pass 1 is a map-side combiner (one (line-hash, count)
    row per distinct line per block) into a hash-partition groupby —
    the shuffle moves distinct lines, not the corpus. The surviving
    duplicate-line set (distinct lines with corpus count >= min_count
    — boilerplate is by construction a tiny fraction of distinct
    lines) is broadcast via ray.put and pass 2 streams the corpus
    through one vectorized hash + searchsorted membership per batch;
    the corpus itself is never shuffled. Lines compare by the same
    64-bit md5 prefix as the Jaccard ring (collision odds ~2^-64 per
    pair). For a corpus whose duplicate-line set exceeds a worker heap,
    swap the broadcast for `relational.hash_join` on the line hash
    (the `drop_near_duplicates(method="shuffle")` pattern).

    Output: (id_col, clean_text, n_lines, n_removed) — n_lines counts
    ALL split lines (empty included), n_removed the dropped ones.
    """
    import ray

    def _hash_lines(flat: pa.Array) -> np.ndarray:
        """64-bit line hash, md5 computed once per DISTINCT line in
        the batch (boilerplate-heavy batches hash far fewer strings
        than they contain)."""
        vals = flat.to_numpy(zero_copy_only=False)
        if vals.size == 0:
            return np.empty(0, np.int64)
        codes, uniq = pd.factorize(vals, sort=False)
        return _digest64(list(uniq)).view(np.int64)[codes]

    def _partial(t: pa.Table) -> pa.Table:
        flat, _parents, _counts = _line_stream(t[text_col])
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        vals = flat.to_numpy(zero_copy_only=False)
        if vals.size == 0:
            return pa.table(
                {"lh": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        codes, uniq = pd.factorize(vals, sort=False)
        cnt = np.bincount(codes).astype(np.int64)
        hashes = _digest64(list(uniq)).view(np.int64)
        return pa.table({"lh": pa.array(hashes), "cnt": pa.array(cnt)})

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("lh")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    dup = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], min_count)).select(["lh"]),
        batch_format="pyarrow",
    )
    pdf = dup.to_pandas()
    # an all-unique corpus reaches the driver as schema-less empty blocks
    dup_arr = (
        np.sort(pdf["lh"].to_numpy(dtype=np.int64))
        if len(pdf) and "lh" in pdf.columns
        else np.empty(0, np.int64)
    )
    ref = ray.put(dup_arr)

    def _clean(t: pa.Table) -> pa.Table:
        dupset = ray.get(ref)  # node-local plasma lookup after first fetch
        flat, parents, n_lines = _line_stream(t[text_col])
        n = len(t)
        if len(flat) == 0 or dupset.size == 0:
            removed = np.zeros(len(flat), dtype=bool)
        else:
            lh = _hash_lines(flat)
            pos = np.clip(np.searchsorted(dupset, lh), 0, dupset.size - 1)
            nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            removed = (dupset[pos] == lh) & nonempty
        kept_flat = flat.filter(pa.array(~removed))
        kept_per_doc = np.bincount(parents[~removed], minlength=n).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(kept_per_doc)))
        lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), kept_flat)
        clean = pc.binary_join(lists, "\n")
        n_removed = np.bincount(parents[removed], minlength=n).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "clean_text": pc.cast(clean, pa.string()),
                "n_lines": pa.array(n_lines),
                "n_removed": pa.array(n_removed),
            }
        )

    return ds.map_batches(_clean, batch_format="pyarrow")


def _pos_shingles(col, w: int) -> tuple[np.ndarray, np.ndarray, int]:
    """EVERY n-gram position's rolling hash (not per-doc distinct like
    _shingle_hashes): (hashes, doc index per position, n_docs). Docs
    shorter than w tokens contribute no positions. Same whole-batch
    shifted-add polynomial, doc boundaries masked."""
    th, doc_ix, n = _arrow_token_stream(col)
    m = th.size - w + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64), n
    h = np.zeros(m, dtype=np.uint64)
    for j in range(w):
        h = h * _POLY_B + th[j : j + m]
    valid = doc_ix[:m] == doc_ix[w - 1 : w - 1 + m]
    return h[valid], doc_ix[:m][valid].astype(np.int64), n


def dup_ngram_stats(
    ds: Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> Dataset:
    """Repeated-substring exposure per document (the training-data
    signal behind suffix-array dedup, Lee et al. 2022, here at n-gram
    granularity): for each doc, how many of its token n-gram positions
    carry an n-gram that occurs >= ``min_count`` times in the WHOLE
    corpus (any doc, own repeats included). Output
    (id_col, n_ngrams, n_dup_ngrams) — docs shorter than n tokens have
    0 n-grams. Downstream: drop/trim docs whose dup fraction is high.

    Scale shape (same two-pass as line_dedup): pass 1 is a map-side
    (hash -> count) combiner into a hash-partition groupby — the
    shuffle moves one row per distinct n-gram per block, not every
    position. The duplicated-hash set (distinct n-grams with corpus
    count >= min_count) is broadcast via ray.put and pass 2 streams
    the corpus through one vectorized rolling-hash + searchsorted per
    batch. N-grams compare by a 64-bit polynomial over md5 token
    hashes — collisions (~2^-64/pair) over-count by one position.
    A corpus whose duplicated-n-gram set exceeds a worker heap swaps
    the broadcast for a hash_join on the n-gram hash."""
    import ray

    def _partial(t: pa.Table) -> pa.Table:
        h, _d, _n = _pos_shingles(t[text_col], n)
        if h.size == 0:
            return pa.table({"gh": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(h.view(np.int64), sort=False)
        cnt = np.bincount(codes).astype(np.int64)
        return pa.table({"gh": pa.array(uniq), "cnt": pa.array(cnt)})

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("gh")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    dup = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], min_count)).select(["gh"]),
        batch_format="pyarrow",
    )
    pdf = dup.to_pandas()
    dup_arr = (
        np.sort(pdf["gh"].to_numpy(dtype=np.int64))
        if len(pdf) and "gh" in pdf.columns
        else np.empty(0, np.int64)
    )
    ref = ray.put(dup_arr)

    def _stats(t: pa.Table) -> pa.Table:
        dupset = ray.get(ref)  # node-local plasma lookup after first fetch
        h, d, nb = _pos_shingles(t[text_col], n)
        n_ng = np.bincount(d, minlength=nb).astype(np.int64)
        if h.size and dupset.size:
            hv = h.view(np.int64)
            pos = np.clip(np.searchsorted(dupset, hv), 0, dupset.size - 1)
            isdup = dupset[pos] == hv
            n_dup = np.bincount(d[isdup], minlength=nb).astype(np.int64)
        else:
            n_dup = np.zeros(nb, dtype=np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_ngrams": pa.array(n_ng),
                "n_dup_ngrams": pa.array(n_dup),
            }
        )

    return ds.map_batches(_stats, batch_format="pyarrow")


def strip_dup_ngrams(
    ds: Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> Dataset:
    """Repeated-substring REMOVAL (the acting half of dup_ngram_stats,
    Lee et al. 2022): every token covered by an n-gram that occurs >=
    ``min_count`` times in the corpus is dropped — EXCEPT in the
    n-gram's owner document (the lowest doc id containing it), which
    keeps its copy, so exactly one canonical occurrence of each
    repeated passage survives corpus-wide. Output
    (id_col, clean_text, n_tokens, n_removed) with clean_text the
    surviving tokens joined by single spaces (token-level rebuild —
    original inter-token whitespace/punctuation is not preserved,
    like C4-style post-tokenization pipelines).

    Scale shape: pass 1 ships one (hash, count, min-doc) row per
    distinct n-gram per block into a hash-partition groupby; the
    duplicated set with its owners broadcasts via ray.put; pass 2
    streams the corpus once, marking covered tokens with a vectorized
    difference-array cumsum (no per-token Python)."""
    import ray

    from search_engine_ray.ops.text import _flat_tokens

    def _partial(t: pa.Table) -> pa.Table:
        h, d, _nb = _pos_shingles(t[text_col], n)
        if h.size == 0:
            return pa.table(
                {
                    "gh": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "owner": pa.array([], pa.int64()),
                }
            )
        docs = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[d]
        codes, uniq = pd.factorize(h.view(np.int64), sort=False)
        cnt = np.bincount(codes).astype(np.int64)
        owner = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(owner, codes, docs)
        return pa.table(
            {"gh": pa.array(uniq), "cnt": pa.array(cnt), "owner": pa.array(owner)}
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("gh")
        .aggregate(Sum("cnt", alias_name="cnt"), Min("owner", alias_name="owner"))
    )
    dup = agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], min_count)).select(["gh", "owner"]),
        batch_format="pyarrow",
    )
    pdf = dup.to_pandas()
    if len(pdf) and "gh" in pdf.columns:
        order = np.argsort(pdf["gh"].to_numpy(dtype=np.int64), kind="mergesort")
        dup_gh = pdf["gh"].to_numpy(dtype=np.int64)[order]
        dup_owner = pdf["owner"].to_numpy(dtype=np.int64)[order]
    else:
        dup_gh = np.empty(0, np.int64)
        dup_owner = np.empty(0, np.int64)
    ref = ray.put((dup_gh, dup_owner))

    def _strip(t: pa.Table) -> pa.Table:
        gh_arr, owner_arr = ray.get(ref)
        flat, parents, nb = _flat_tokens(t[text_col])
        n_tok = np.bincount(parents, minlength=nb).astype(np.int64)
        h, d, _ = _pos_shingles(t[text_col], n)
        removed = np.zeros(len(flat) + 1, dtype=np.int64)
        if h.size and gh_arr.size:
            hv = h.view(np.int64)
            pos = np.clip(np.searchsorted(gh_arr, hv), 0, gh_arr.size - 1)
            docs = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[d]
            isdup = (gh_arr[pos] == hv) & (owner_arr[pos] != docs)
            # _pos_shingles emits hashes for positions where the window
            # stays in one doc, in stream order — recover those indices
            m = len(flat) - n + 1
            valid = np.nonzero(parents[:m] == parents[n - 1 : n - 1 + m])[0] if m > 0 else np.empty(0, np.int64)
            sel = valid[isdup]
            np.add.at(removed, sel, 1)
            np.add.at(removed, sel + n, -1)
        covered = np.cumsum(removed[:-1]) > 0
        keep = ~covered
        kept_flat = flat.filter(pa.array(keep))
        kept_per_doc = np.bincount(parents[keep], minlength=nb).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(kept_per_doc)))
        lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), kept_flat)
        clean = pc.binary_join(lists, " ")
        return pa.table(
            {
                id_col: t[id_col],
                "clean_text": pc.cast(pc.fill_null(clean, ""), pa.string()),
                "n_tokens": pa.array(n_tok),
                "n_removed": pa.array((n_tok - kept_per_doc).astype(np.int64)),
            }
        )

    return ds.map_batches(_strip, batch_format="pyarrow")
