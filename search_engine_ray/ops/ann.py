"""Similarity search over an embedding column (task brief):

- `cosine_topk`: exact brute-force cosine top-k — the baseline. The
  query matrix ships once with the prepared UDF; each batch is one
  numpy matmul; per-batch partial top-k keeps the shuffle tiny
  (num_blocks x Q x k rows), final per-query merge is a groupby.
- `rp_lsh_near_dup`: all-pairs near-duplicate detection via random-
  hyperplane LSH bucketing (signature groupby), pairwise verify only
  inside buckets.
- `IVFIndex`: the scale path — coarse k-means centroids (driver-side
  over a sample, broadcast), assignments written as cluster-partitioned
  Parquet; a query reads only its nprobe closest clusters' partitions.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ray.data import Dataset

from search_engine_ray.ops.rounding import round_half_up


def _to_matrix(chunked, dim: int | None = None) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix, zero-copy flatten."""
    arr = chunked.combine_chunks() if isinstance(chunked, pa.ChunkedArray) else chunked
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    d = dim or (flat.size // n if n else 0)
    return flat.reshape(n, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BruteScore:
    """Prepared-instance UDF: holds the normalized query matrix; per
    batch emits each query's local top-k (qid, vec_id, cos)."""

    def __init__(self, queries: np.ndarray, qids: np.ndarray, k: int, vec_col: str, id_col: str):
        self.qn = _normalize(np.asarray(queries, dtype=np.float64))
        self.qids = np.asarray(qids, dtype=np.int64)
        self.k = k
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy()
        m = _normalize(_to_matrix(t[self.vec_col], self.qn.shape[1]))
        sims = m @ self.qn.T  # (batch, Q)
        n, q = sims.shape
        k = min(self.k, n)
        out_q, out_v, out_s = [], [], []
        for j in range(q):
            # keep everything within ROUNDING distance of the k-th
            # unrounded value: the final ranking orders by round(cos,4)
            # with vec_id tiebreak, and two values rounding equal can
            # differ by < 1e-4 — a fixed-size argpartition could drop
            # the one the tiebreak keeps (exact-parity tie bug)
            kth = np.partition(sims[:, j], n - k)[n - k]
            sel = np.nonzero(sims[:, j] >= kth - 1e-4)[0]
            out_q.append(np.full(sel.size, self.qids[j], dtype=np.int64))
            out_v.append(ids[sel])
            out_s.append(sims[sel, j])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cos": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def cosine_topk(
    ds: Dataset,
    queries: np.ndarray,
    qids: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> Dataset:
    """Exact cosine top-k of each query against the dataset. Returns
    (qid, vec_id, cos) rows, cos rounded to 4 (deterministic ranking:
    cos desc, vec_id asc on the rounded value)."""
    # plain tasks: the scorer's state (normalized query matrix) is
    # tiny and ships once as the prepared UDF; an actor pool here pays
    # spin-up and can starve upstream reads on small sessions
    partial = ds.map_batches(
        _BruteScore(queries, qids, k + (1 if exclude_self else 0), vec_col, id_col),
        batch_format="pyarrow",
    )

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cos"] = round_half_up(df["cos"].to_numpy())
        if exclude_self:
            df = df[df["qid"] != df["vec_id"]]
        df = df.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort")
        return df.head(k)

    return partial.groupby("qid").map_groups(_final, batch_format="pandas")


class _RangeScore:
    """Prepared-instance UDF for radius search: emits every (qid,
    vec_id, cos) with cos >= threshold. Pure map — no top-k state, no
    shuffle; output size is bounded by the radius, not the corpus."""

    def __init__(self, queries, qids, threshold, vec_col, id_col, exclude_self):
        self.qn = _normalize(np.asarray(queries, dtype=np.float64))
        self.qids = np.asarray(qids, dtype=np.int64)
        self.threshold = float(threshold)
        self.vec_col, self.id_col = vec_col, id_col
        self.exclude_self = exclude_self

    def __call__(self, t: pa.Table) -> pa.Table:
        from .rounding import round_half_up

        ids = t[self.id_col].to_numpy()
        m = _normalize(_to_matrix(t[self.vec_col], self.qn.shape[1]))
        sims = m @ self.qn.T  # (batch, Q)
        # filter on the ROUNDED value: the oracle's WHERE clause uses
        # round(cos,4) >= thr, so the boundary must agree bit-for-bit
        r = round_half_up(sims.ravel()).reshape(sims.shape)
        vi, qi = np.nonzero(r >= self.threshold)
        out_q, out_v, out_s = self.qids[qi], ids[vi], r[vi, qi]
        if self.exclude_self:
            keep = out_q != out_v
            out_q, out_v, out_s = out_q[keep], out_v[keep], out_s[keep]
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_s, pa.float64()),
            }
        )


def cosine_range(
    ds: Dataset,
    queries: np.ndarray,
    qids: np.ndarray,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> Dataset:
    """Radius (range) search: ALL corpus vectors with round(cos,4) >=
    threshold of each query — the fixed-radius companion to
    cosine_topk (ES knn `similarity` cutoff / FAISS range_search).
    One streaming pass, embarrassingly parallel; use when the question
    is "everything this close", not "the k closest"."""
    return ds.map_batches(
        _RangeScore(queries, qids, threshold, vec_col, id_col, exclude_self),
        batch_format="pyarrow",
    )


class _HardNegScore(_BruteScore):
    """_BruteScore plus a label mask: corpus rows sharing an anchor's
    label are excluded from that anchor's candidates (the anchor
    itself is excluded for free — it shares its own label)."""

    def __init__(self, queries, qids, qlabels, k, vec_col, id_col, label_col):
        super().__init__(queries, qids, k, vec_col, id_col)
        self.qlabels = np.asarray(qlabels, dtype=np.int64)
        self.label_col = label_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy()
        labels = t[self.label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_to_matrix(t[self.vec_col], self.qn.shape[1]))
        sims = m @ self.qn.T  # (batch, Q)
        sims = np.where(labels[:, None] == self.qlabels[None, :], -np.inf, sims)
        n, q = sims.shape
        k = min(self.k, n)
        out_q, out_v, out_s = [], [], []
        for j in range(q):
            kth = np.partition(sims[:, j], n - k)[n - k]
            # rounding-distance slack as in _BruteScore, but -inf
            # (masked) rows must never ride through a -inf kth
            sel = np.nonzero(np.isfinite(sims[:, j]) & (sims[:, j] >= kth - 1e-4))[0]
            out_q.append(np.full(sel.size, self.qids[j], dtype=np.int64))
            out_v.append(ids[sel])
            out_s.append(sims[sel, j])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cos": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def hard_negatives(
    ds: Dataset,
    anchors: np.ndarray,
    anchor_ids: np.ndarray,
    anchor_labels: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> Dataset:
    """Hard-negative mining for retriever / embedding-model training
    (the DPR/ANCE data-prep step): for every anchor, the k corpus
    vectors MOST cosine-similar to it among those with a DIFFERENT
    label — near the anchor in embedding space but semantically
    negative. Same scale shape as cosine_topk: the anchor matrix
    ships once with the prepared UDF, each corpus block emits a
    bounded per-anchor partial top-k, and only candidate rows reach
    the tiny per-anchor final sort. Returns (qid, vec_id, cos) with
    cos rounded to 4, ranked cos desc / vec_id asc."""
    partial = ds.map_batches(
        _HardNegScore(anchors, anchor_ids, anchor_labels, k, vec_col, id_col, label_col),
        batch_format="pyarrow",
    )

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cos"] = round_half_up(df["cos"].to_numpy())
        df = df.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort")
        return df.head(k)

    return partial.groupby("qid").map_groups(_final, batch_format="pandas")


def rp_lsh_near_dup(
    ds: Dataset,
    threshold: float = 0.9,
    n_planes: int = 12,
    seed: int = 11,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = 512,
) -> Dataset:
    """All-pairs embedding near-dups: random-hyperplane signatures ->
    bucket groupby -> exact pairwise cosine inside buckets only.
    Returns (a, b, cos) with cos >= threshold, a < b."""
    from ray.data.aggregate import Max

    dim_probe = ds.take(1)[0][vec_col]
    dim = len(dim_probe)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    def _sig(t: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(t[vec_col], dim))
        bits = (m @ planes) > 0
        bucket = np.zeros(m.shape[0], dtype=np.int64)
        for j in range(n_planes):
            bucket |= bits[:, j].astype(np.int64) << j
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                id_col: t[id_col],
                vec_col: t[vec_col],
            }
        )

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        # coarse group (bucket % 64): per-bucket singletons dropped
        # vectorized; python loop only over real collision buckets
        df = df.drop_duplicates(["bucket", id_col])
        df = df[df.duplicated("bucket", keep=False)]
        out = []
        for _, g in df.groupby("bucket", sort=False):
            g = g.sort_values(id_col)
            ids = g[id_col].to_numpy()
            if ids.size > max_bucket:
                continue
            m = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
            sims = m @ m.T
            ai, bi = np.triu_indices(ids.size, k=1)
            cos = round_half_up(sims[ai, bi])
            keep = cos >= threshold
            out.append(pd.DataFrame({"a": ids[ai][keep], "b": ids[bi][keep], "cos": cos[keep]}))
        if not out:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
                                 "cos": np.empty(0, np.float64)})
        return pd.concat(out, ignore_index=True)

    sig = ds.map_batches(_sig, batch_format="pyarrow")
    coarse = sig.map_batches(
        lambda df: df.assign(cg=df["bucket"] % 64), batch_format="pandas"
    )
    pairs = coarse.groupby("cg").map_groups(_pairs, batch_format="pandas")
    return pairs.groupby(["a", "b"]).aggregate(Max("cos", alias_name="cos"))


def spherical_kmeans(
    m: np.ndarray, n_clusters: int, iters: int, seed: int
) -> np.ndarray:
    """Seeded spherical k-means over an already-normalized (n, d)
    float64 sample — pure numpy, fully deterministic given
    (m, n_clusters, iters, seed), so value oracles can retrain through
    this same function and embed the centroids as SQL literals (the
    train_pq_codebooks pattern). Shared by IVFIndex.build and
    semantic_dedup."""
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(m.shape[0], size=min(n_clusters, m.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            sel = m[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def semantic_dedup(
    ds: Dataset,
    threshold: float = 0.95,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 5,
) -> Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) embedding-space
    near-dedup: seeded spherical k-means over a bounded driver-side
    sample, one distributed assignment pass (centroids ride the
    closure, broadcast once per task), then WITHIN each cluster mark
    every vector whose rounded cosine to a LOWER-id cluster-mate is
    >= threshold. The keep rule here is deterministic keep-lowest-id
    (SemDeDup's keep-farthest-from-centroid variant differs only in
    which member of a near-dup set survives), which makes the whole
    op SQL-replayable: retrain the same seeded centroids, assign by
    argmax dot (tie-break: lowest cluster id, matching np.argmax),
    self-join within cluster. The sample is sorted by id before
    k-means so the centroids don't depend on Ray block arrival order
    (preserve_order is off; limit() row order is nondeterministic
    across runs when the corpus spans several blocks).

    Scale shape: the pairwise cosine is per CLUSTER — pick n_clusters
    ~ N / target_cluster_size so each map_groups group stays bounded
    (SemDeDup runs 50k clusters at 100M+ docs); the only shuffle is
    the cluster groupby, and the sample/centroid state is
    driver-bounded. Returns (vec_id, cluster, is_dup 0/1) for every
    input row."""
    sample = ds.limit(sample_size).to_pandas().sort_values(id_col)
    m = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    cent = spherical_kmeans(m, n_clusters, iters, seed)
    dim = cent.shape[1]

    def _assign(t: pa.Table) -> pa.Table:
        mm = _normalize(_to_matrix(t[vec_col], dim))
        cl = np.argmax(mm @ cent.T, axis=1).astype(np.int64)
        return pa.table(
            {id_col: t[id_col], vec_col: t[vec_col], "cluster": pa.array(cl, pa.int64())}
        )

    def _mark(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: np.empty(0, np.int64),
                "cluster": np.empty(0, np.int64),
                "is_dup": np.empty(0, np.int64),
            }
        )
        if df.empty:
            return empty
        out = []
        for _, g in df.groupby("cluster", sort=False):
            g = g.sort_values(id_col)
            ids = g[id_col].to_numpy()
            mg = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
            cos = round_half_up(mg @ mg.T)
            # dup(i) = any j < i in the cluster with cos >= threshold
            dup = np.triu(cos >= threshold, k=1).any(axis=0)
            out.append(
                pd.DataFrame(
                    {
                        id_col: ids,
                        "cluster": g["cluster"].to_numpy(),
                        "is_dup": dup.astype(np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True) if out else empty

    assigned = ds.map_batches(_assign, batch_format="pyarrow")
    # coarse shard (cluster % 64) bounds group count like rp_lsh's cg
    coarse = assigned.map_batches(
        lambda df: df.assign(cg=df["cluster"] % 64), batch_format="pandas"
    )
    return coarse.groupby("cg").map_groups(_mark, batch_format="pandas")


def cluster_balanced_sample(
    ds: Dataset,
    quota: int,
    n_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 5,
) -> Dataset:
    """Cluster-balanced data selection (the diversity-sampling stage
    of a DataComp/DCLM-style curation loop): assign every vector to a
    seeded spherical k-means cluster, then keep the `quota`
    lowest-hash members per cluster — a deterministic uniform draw
    WITHIN each cluster, so the kept set covers embedding space
    instead of following corpus density. The draw key is
    md5_upper64(str(id)) (the kmv/hash_sample hash), so selection is
    reproducible across runs/cluster sizes and SQL-replayable
    (md5_number_upper + row_number per cluster).

    Scale shape: centroids train on a bounded driver-side sample and
    ride the task closure; assignment is one streaming pass; the
    per-cluster head uses group_topn's map-side combiner, so the
    shuffle carries at most quota x clusters x blocks rows. Returns
    (id_col, cluster) of the selected rows."""
    from search_engine_ray.ops.relational import group_topn
    from search_engine_ray.ops.sketch import _md5_upper64

    sample = ds.limit(sample_size).to_pandas().sort_values(id_col)
    m = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    cent = spherical_kmeans(m, n_clusters, iters, seed)
    dim = cent.shape[1]
    flip = np.uint64(1 << 63)

    def _assign(t: pa.Table) -> pa.Table:
        mm = _normalize(_to_matrix(t[vec_col], dim))
        cl = np.argmax(mm @ cent.T, axis=1).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        # order-preserving signed remap of the uint64 hash (kmv trick)
        h = (_md5_upper64([str(i) for i in ids]) ^ flip).view(np.int64)
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(cl, pa.int64()),
            "h": pa.array(h, pa.int64()),
        })

    picked = group_topn(
        ds.map_batches(_assign, batch_format="pyarrow"),
        key="cluster", sort_keys=["h", id_col], n=quota,
    )
    return picked.drop_columns(["h"])


def cluster_census(
    ds: Dataset,
    n_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 5,
) -> Dataset:
    """Cluster census — the dataset-map report a curation run ships
    beside its corpus card (DataComp/Nomic-style embedding-space
    profile): every vector assigns to a seeded spherical-k-means
    cluster and the report is per-cluster member count + mean
    cosine-to-centroid (cohesion — low values flag junk clusters worth
    inspecting). ONE streaming assignment pass; per-batch partials are
    (cluster, n, sum_cos) rows bounded by n_clusters, so the exchange
    is tiny at any corpus size. Deterministic given the seed/sample,
    so the census is SQL-replayable (retrain + argmax with the
    lowest-index tie-break)."""
    from search_engine_ray.ops.relational import grouped_aggregate

    sample = ds.limit(sample_size).to_pandas().sort_values(id_col)
    m = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    cent = spherical_kmeans(m, n_clusters, iters, seed)
    dim = cent.shape[1]

    def _partial(t: pa.Table) -> pa.Table:
        mm = _normalize(_to_matrix(t[vec_col], dim))
        sims = mm @ cent.T
        cl = np.argmax(sims, axis=1)
        best = sims[np.arange(len(cl)), cl]
        return pa.table({
            "cluster": pa.array(np.arange(n_clusters, dtype=np.int64)),
            "n_vecs": pa.array(
                np.bincount(cl, minlength=n_clusters).astype(np.int64)
            ),
            "sum_cos": pa.array(
                np.bincount(cl, weights=best, minlength=n_clusters)
            ),
        })

    return grouped_aggregate(
        ds.map_batches(_partial, batch_format="pyarrow"),
        ["cluster"],
        {"n_vecs": ("sum", "n_vecs"), "sum_cos": ("sum", "sum_cos")},
    )


class IVFIndex:
    """IVF coarse quantizer: build = assign every vector to its nearest
    centroid and write cluster-partitioned Parquet; search = score only
    the nprobe closest clusters' partitions (partition-pruned read).

    Centroids come from deterministic k-means over a driver-side sample
    (sample size bounded; the full assignment pass is distributed)."""

    def __init__(self, index_dir: str):
        self.dir = index_dir
        with open(os.path.join(index_dir, "centroids.json")) as f:
            meta = json.load(f)
        self.centroids = np.asarray(meta["centroids"], dtype=np.float64)
        self.vec_col = meta["vec_col"]
        self.id_col = meta["id_col"]

    @staticmethod
    def build(
        ds: Dataset,
        index_dir: str,
        n_clusters: int = 16,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        sample_size: int = 4096,
        iters: int = 10,
        seed: int = 5,
    ) -> "IVFIndex":
        sample = ds.limit(sample_size).to_pandas()
        m = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
        cent = spherical_kmeans(m, n_clusters, iters, seed)
        dim = cent.shape[1]

        def _assign(t: pa.Table) -> pa.Table:
            mm = _normalize(_to_matrix(t[vec_col], dim))
            cl = np.argmax(mm @ cent.T, axis=1).astype(np.int32)
            return pa.table(
                {id_col: t[id_col], vec_col: t[vec_col], "cluster": pa.array(cl, pa.int32())}
            )

        os.makedirs(index_dir, exist_ok=True)
        # repartition before the partitioned write: without it every
        # input block writes one tiny file per cluster it touches
        # (blocks x clusters files), and the query-side read pays per-
        # file metadata costs. n_clusters blocks -> ~one file per
        # cluster; n_clusters grows with corpus size, so blocks stay
        # bounded at scale too.
        ds.map_batches(_assign, batch_format="pyarrow").repartition(
            max(n_clusters, 8)
        ).write_parquet(os.path.join(index_dir, "vectors"), partition_cols=["cluster"])
        with open(os.path.join(index_dir, "centroids.json"), "w") as f:
            json.dump(
                {"centroids": cent.tolist(), "vec_col": vec_col, "id_col": id_col}, f
            )
        return IVFIndex(index_dir)

    def search_batch(
        self, queries: np.ndarray, qids: np.ndarray, k: int = 10, nprobe: int = 4
    ):
        """Dataset-native batched ANN: for a BATCH of queries, read only
        the union of their probe clusters' partitions (one lazy read
        per cluster dir, unioned), score each partition against just
        the queries probing it (broadcast matrix + per-cluster query
        lists), partial top-k per block, final per-query merge.
        Returns a Dataset of (qid, vec_id, cos)."""
        import glob as _glob

        import ray.data as rd

        qn = _normalize(np.asarray(queries, dtype=np.float64))
        qids = np.asarray(qids, dtype=np.int64)
        order = np.argsort(-(qn @ self.centroids.T), axis=1)[:, :nprobe]
        probing: dict[int, list[int]] = {}
        for qi in range(qn.shape[0]):
            for c in order[qi]:
                probing.setdefault(int(c), []).append(qi)

        # ONE packed read over the union of probed clusters' files —
        # Ray bundles small files into few read tasks; per-cluster
        # Datasets + union made one task per tiny file (measured 10x
        # slower). Cluster membership is recomputed per batch from the
        # broadcast centroids (the same argmax the build used), so no
        # per-cluster tagging pass is needed.
        files = [
            f
            for c in sorted(probing)
            for f in _glob.glob(os.path.join(self.dir, "vectors", f"cluster={c}", "*.parquet"))
        ]
        if not files:
            return rd.from_arrow(
                pa.table({"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
            )
        ds = rd.read_parquet(files, columns=[self.id_col, self.vec_col])
        vec_col, id_col = self.vec_col, self.id_col
        centroids = self.centroids

        def _score(t: pa.Table) -> pa.Table:
            out_q, out_v, out_s = [], [], []
            m_all = _normalize(_to_matrix(t[vec_col], qn.shape[1]))
            cl = np.argmax(m_all @ centroids.T, axis=1)
            for c in np.unique(cl):
                sel = cl == c
                qis = probing.get(int(c), [])
                if not qis:
                    continue
                m = m_all[sel]
                sub = t.filter(pa.array(sel))
                sims = m @ qn[qis].T
                kk = min(k, m.shape[0])
                ids = sub[id_col].to_numpy()
                for j, qi in enumerate(qis):
                    # same rounding-distance slack as _BruteScore: the
                    # final order is by round(cos,4) + vec_id tiebreak
                    kth = np.partition(sims[:, j], m.shape[0] - kk)[m.shape[0] - kk]
                    s = np.nonzero(sims[:, j] >= kth - 1e-4)[0]
                    out_q.append(np.full(s.size, qids[qi], np.int64))
                    out_v.append(ids[s])
                    out_s.append(sims[s, j])
            if not out_q:
                return pa.table({"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                                 "cos": pa.array([], pa.float64())})
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                    "cos": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

        partial = ds.map_batches(_score, batch_format="pyarrow")

        def _final(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["cos"] = round_half_up(df["cos"].to_numpy())
            df = df.drop_duplicates(["qid", "vec_id"])
            df = df.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort")
            return df.head(k)

        return partial.groupby("qid").map_groups(_final, batch_format="pandas")

    def search(self, query: np.ndarray, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
        qn = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
        order = np.argsort(-(self.centroids @ qn))[:nprobe]
        import glob as _glob

        frags = [
            f
            for c in order
            for f in _glob.glob(os.path.join(self.dir, "vectors", f"cluster={c}", "*.parquet"))
        ]
        if not frags:
            return pd.DataFrame({self.id_col: [], "cos": []})
        t = pads.dataset(frags).to_table(columns=[self.id_col, self.vec_col])
        m = _normalize(_to_matrix(t[self.vec_col]))
        sims = round_half_up(m @ qn)
        ids = t[self.id_col].to_numpy()
        order2 = np.lexsort((ids, -sims))[:k]
        return pd.DataFrame({self.id_col: ids[order2], "cos": sims[order2]})


def train_pq_codebooks(
    x: np.ndarray, m: int, iters: int = 12, seed: int = 7
) -> np.ndarray:
    """Seeded per-subspace L2 k-means over an already-normalized
    (n, d) float64 sample -> (m, min(256, n), d/m) codebooks. Pure
    numpy and fully deterministic given (x, m, iters, seed) — the
    ann_pq value oracle retrains through this same function and
    embeds the centroids as SQL literals (the t_quality_clf
    pattern)."""
    dim = x.shape[1]
    sub = dim // m
    rng = np.random.default_rng(seed)
    ncent = min(256, x.shape[0])
    books = np.empty((m, ncent, sub), dtype=np.float64)
    for j in range(m):  # plain (L2) k-means per subspace
        xj = x[:, j * sub : (j + 1) * sub]
        cent = xj[rng.choice(xj.shape[0], size=ncent, replace=False)]
        for _ in range(iters):
            d2 = ((xj[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ncent):
                sel = xj[assign == c]
                if len(sel):
                    cent[c] = sel.mean(axis=0)
        books[j] = cent
    return books


class PQIndex:
    """Product quantization (the compression half of IVF-PQ, Jegou,
    Douze & Schmid 2011 "Product Quantization for Nearest Neighbor
    Search"): the L2-normalized d-dim vector splits into ``m``
    subspaces of d/m dims; each subspace gets its own 256-centroid
    k-means codebook, so a vector stores as m uint8 codes (m bytes vs
    d*8 — 64x smaller at d=64, m=8). Search is ADC (asymmetric
    distance computation): per query, ONE m x 256 table of subspace
    dot products against the codebooks; a candidate's approximate
    cosine is the sum of m table lookups — no float vector ever leaves
    the index after encoding.

    Scale shape: codebooks train on a bounded driver-side sample
    (deterministic seeded k-means, like IVFIndex); the encode pass is
    distributed map_batches (vectorized argmin over all subspaces);
    search streams the code table (m bytes/vector, so a billion
    vectors is ~8 GB of scan, not 512 GB) with per-block partial
    top-k and a final per-query merge. ADC is approximate — pair with
    exact re-ranking over the raw vectors when precision matters
    (tested recall floor documented in tests/test_ann_pq.py)."""

    def __init__(self, index_dir: str):
        self.dir = index_dir
        with open(os.path.join(index_dir, "codebooks.json")) as f:
            meta = json.load(f)
        # (m, 256, d/m)
        self.codebooks = np.asarray(meta["codebooks"], dtype=np.float64)
        self.vec_col = meta["vec_col"]
        self.id_col = meta["id_col"]
        self.dim = int(meta["dim"])

    @staticmethod
    def build(
        ds: Dataset,
        index_dir: str,
        m: int = 8,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        sample_size: int = 4096,
        iters: int = 12,
        seed: int = 7,
    ) -> "PQIndex":
        sample = ds.limit(sample_size).to_pandas()
        x = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
        dim = x.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        sub = dim // m
        books = train_pq_codebooks(x, m, iters=iters, seed=seed)

        def _encode(t: pa.Table) -> pa.Table:
            mm = _normalize(_to_matrix(t[vec_col], dim))
            codes = np.empty((mm.shape[0], m), dtype=np.uint8)
            for j in range(m):
                xj = mm[:, j * sub : (j + 1) * sub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
                d2 = -2.0 * (xj @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
            flat = pa.array(codes.reshape(-1), pa.uint8())
            return pa.table(
                {
                    id_col: t[id_col],
                    "codes": pa.FixedSizeListArray.from_arrays(flat, m),
                }
            )

        os.makedirs(index_dir, exist_ok=True)
        ds.map_batches(_encode, batch_format="pyarrow").write_parquet(
            os.path.join(index_dir, "codes")
        )
        with open(os.path.join(index_dir, "codebooks.json"), "w") as f:
            json.dump(
                {
                    "codebooks": books.tolist(),
                    "vec_col": vec_col,
                    "id_col": id_col,
                    "dim": dim,
                },
            f)
        return PQIndex(index_dir)

    def search_batch(self, queries: np.ndarray, qids: np.ndarray, k: int = 10):
        """ADC batched search over the streamed code table; returns a
        Dataset of (qid, vec_id, cos_approx) with exactly k rows per
        query (score desc, vec_id tiebreak)."""
        import ray.data as rd

        qn = _normalize(np.asarray(queries, dtype=np.float64))
        qids_arr = np.asarray(qids, dtype=np.int64)
        mS, ncent, sub = self.codebooks.shape
        # (n_queries, m, 256) lookup tables: dot(q_j, c_{j,i})
        tables = np.einsum("qjs,jcs->qjc", qn.reshape(qn.shape[0], mS, sub), self.codebooks)
        id_col = self.id_col

        def _score(t: pa.Table) -> pa.Table:
            codes = np.asarray(t["codes"].combine_chunks().flatten()).reshape(-1, mS)
            ids = t[id_col].to_numpy()
            if tables.shape[0] == 0 or ids.size == 0:
                # empty query batch / empty code block: pinned-schema
                # empty output (np.concatenate below needs >= 1 array)
                return pa.table({"qid": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "cos": pa.array([], pa.float64())})
            out_q, out_v, out_s = [], [], []
            # approx cos per query: sum_j tables[q, j, codes[:, j]]
            for qi in range(tables.shape[0]):
                sims = tables[qi, np.arange(mS)[None, :], codes].sum(axis=1)
                kk = min(k, sims.size)
                kth = np.partition(sims, sims.size - kk)[sims.size - kk]
                s = np.nonzero(sims >= kth - 1e-4)[0]
                out_q.append(np.full(s.size, qids_arr[qi], np.int64))
                out_v.append(ids[s])
                out_s.append(sims[s])
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                    "cos": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

        ds = rd.read_parquet(os.path.join(self.dir, "codes"))
        partial = ds.map_batches(_score, batch_format="pyarrow")

        def _final(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["cos"] = round_half_up(df["cos"].to_numpy())
            df = df.drop_duplicates(["qid", "vec_id"])
            df = df.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort")
            return df.head(k)

        return partial.groupby("qid").map_groups(_final, batch_format="pandas")


def pq_search_rerank(
    pq_index: "PQIndex",
    source: Dataset,
    queries: np.ndarray,
    qids: np.ndarray,
    k: int = 10,
    rerank: int = 4,
):
    """IVF-PQ's standard two-stage search: ADC shortlists k*rerank
    candidates per query from the compressed codes, then ONE filtered
    pass over the raw vectors re-scores just the shortlist exactly.
    The shortlist (n_queries * k * rerank ids) broadcasts; the source
    scan computes exact cosine only for shortlisted vectors, so the
    full-precision work is O(shortlist), not O(corpus). Returns
    (qid, vec_id, cos) with EXACT cosines, k rows per query — same
    output contract (round 4dp, vec_id tiebreak) as cosine_topk."""
    import ray
    import ray.data as rd

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids_arr = np.asarray(qids, dtype=np.int64)
    short = pq_index.search_batch(qn, qids_arr, k=k * rerank).to_pandas()
    if "qid" not in short.columns or short.empty:
        # empty ADC shortlist (no queries / empty codes): return the
        # pinned-schema empty result directly — no exact-rerank scan
        # of the source at all
        return rd.from_arrow(pa.table({
            "qid": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }))
    cand: dict[int, np.ndarray] = {
        int(q): np.sort(g["vec_id"].to_numpy(dtype=np.int64))
        for q, g in short.groupby("qid")
    }
    all_ids = np.sort(np.unique(short["vec_id"].to_numpy(dtype=np.int64)))
    ref = ray.put((cand, all_ids))
    vec_col, id_col = pq_index.vec_col, pq_index.id_col
    dim = pq_index.dim
    qpos = {int(q): i for i, q in enumerate(qids_arr)}

    def _exact(t: pa.Table) -> pa.Table:
        cands, union_ids = ray.get(ref)
        if union_ids.size == 0:
            # empty ADC shortlist (empty corpus / no codes): nothing to
            # re-rank — np.clip(..., 0, -1) below would index [-1] into
            # an empty array otherwise.
            return pa.table({"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        ids = t[id_col].to_numpy()
        pos = np.clip(np.searchsorted(union_ids, ids), 0, union_ids.size - 1)
        keep = union_ids[pos] == ids
        if not keep.any():
            return pa.table({"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        sub = t.filter(pa.array(keep))
        m = _normalize(_to_matrix(sub[vec_col], dim))
        sids = sub[id_col].to_numpy()
        out_q, out_v, out_s = [], [], []
        for q, cs in cands.items():
            p = np.clip(np.searchsorted(cs, sids), 0, cs.size - 1)
            sel = cs[p] == sids
            if not sel.any():
                continue
            sims = m[sel] @ qn[qpos[q]]
            out_q.append(np.full(int(sel.sum()), q, np.int64))
            out_v.append(sids[sel])
            out_s.append(sims)
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cos": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partial = source.map_batches(_exact, batch_format="pyarrow")

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cos"] = round_half_up(df["cos"].to_numpy())
        df = df.drop_duplicates(["qid", "vec_id"])
        df = df.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort")
        return df.head(k)

    return partial.groupby("qid").map_groups(_final, batch_format="pandas")


class IVFPQIndex:
    """Composed IVF + PQ — IVFADC (Jegou, Douze & Schmid 2011), the
    billion-scale ANN layout: coarse k-means centroids partition the
    corpus, and within each partition vectors store as m uint8 PQ
    codes. A query (1) picks its nprobe closest clusters driver-side,
    (2) ADC-scans ONLY those clusters' code files (nprobe/nlist of an
    already-64x-compressed table leaves storage), (3) exact-cosine
    re-ranks only the shortlist rows read back from the same probed
    partitions. Codes and raw vectors live in ONE cluster-partitioned
    parquet dataset; column pruning keeps the ADC scan from reading
    vectors and the re-rank from reading codes.

    This is the NO-RESIDUAL variant (codes encode the normalized
    vector itself, not x - centroid): residual encoding changes only
    what the codebooks train on, while the direct form keeps every
    stage SQL-replayable — the ann_ivfpq value oracle retrains the
    same seeded centroids + codebooks and replays probe selection,
    cluster assignment, per-subspace encoding, the ADC shortlist and
    the exact re-rank page."""

    def __init__(self, index_dir: str):
        self.dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = json.load(f)
        self.centroids = np.asarray(meta["centroids"], dtype=np.float64)
        self.codebooks = np.asarray(meta["codebooks"], dtype=np.float64)
        self.vec_col = meta["vec_col"]
        self.id_col = meta["id_col"]
        self.dim = int(meta["dim"])

    @staticmethod
    def build(
        ds: Dataset,
        index_dir: str,
        n_clusters: int = 8,
        m: int = 8,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        sample_size: int = 4096,
        iters: int = 10,
        pq_iters: int = 12,
        seed: int = 5,
        pq_seed: int = 7,
    ) -> "IVFPQIndex":
        # sample sorted by id: centroids/codebooks must not depend on
        # Ray block arrival order (the semantic_dedup lesson)
        sample = ds.limit(sample_size).to_pandas().sort_values(id_col)
        x = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
        dim = x.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        sub = dim // m
        cent = spherical_kmeans(x, n_clusters, iters, seed)
        books = train_pq_codebooks(x, m, iters=pq_iters, seed=pq_seed)

        def _assign_encode(t: pa.Table) -> pa.Table:
            mm = _normalize(_to_matrix(t[vec_col], dim))
            cl = np.argmax(mm @ cent.T, axis=1).astype(np.int32)
            codes = np.empty((mm.shape[0], m), dtype=np.uint8)
            for j in range(m):
                xj = mm[:, j * sub : (j + 1) * sub]
                d2 = -2.0 * (xj @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
            flat = pa.array(codes.reshape(-1), pa.uint8())
            return pa.table(
                {
                    id_col: t[id_col],
                    vec_col: t[vec_col],
                    "codes": pa.FixedSizeListArray.from_arrays(flat, m),
                    # `cl` STAYS in the row (the hive `cluster` path
                    # column is dropped from files; packed file-list
                    # reads need the value back)
                    "cl": pa.array(cl, pa.int32()),
                    "cluster": pa.array(cl, pa.int32()),
                }
            )

        os.makedirs(index_dir, exist_ok=True)
        # repartition before the partitioned write (the IVFIndex
        # lesson: blocks x clusters tiny files otherwise)
        ds.map_batches(_assign_encode, batch_format="pyarrow").repartition(
            max(n_clusters, 8)
        ).write_parquet(os.path.join(index_dir, "data"), partition_cols=["cluster"])
        with open(os.path.join(index_dir, "meta.json"), "w") as f:
            json.dump(
                {
                    "centroids": cent.tolist(),
                    "codebooks": books.tolist(),
                    "vec_col": vec_col,
                    "id_col": id_col,
                    "dim": dim,
                },
                f,
            )
        return IVFPQIndex(index_dir)

    def _probed_files(self, clusters) -> list[str]:
        import glob as _glob

        return [
            f
            for c in sorted(clusters)
            for f in _glob.glob(
                os.path.join(self.dir, "data", f"cluster={c}", "*.parquet")
            )
        ]

    def search_batch(
        self,
        queries: np.ndarray,
        qids: np.ndarray,
        k: int = 10,
        nprobe: int = 4,
        rerank: int = 4,
    ):
        """Batched IVFADC search: probe selection driver-side, ONE
        packed column-pruned read of the probed clusters' codes for
        the ADC shortlist (k*rerank per query), then ONE packed
        column-pruned read of the same partitions' raw vectors
        filtered to the shortlist for exact re-ranking. Returns a
        Dataset of (qid, vec_id, cos) — EXACT cosines, k rows per
        query, same contract as cosine_topk."""
        import ray
        import ray.data as rd

        qn = _normalize(np.asarray(queries, dtype=np.float64))
        qids_arr = np.asarray(qids, dtype=np.int64)
        mS, _ncent, sub = self.codebooks.shape
        order = np.argsort(-(qn @ self.centroids.T), axis=1)[:, :nprobe]
        probing: dict[int, list[int]] = {}
        for qi in range(qn.shape[0]):
            for c in order[qi]:
                probing.setdefault(int(c), []).append(qi)
        files = self._probed_files(probing)
        empty = pa.table(
            {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "cos": pa.array([], pa.float64())}
        )
        if not files:
            return rd.from_arrow(empty)

        tables = np.einsum(
            "qjs,jcs->qjc", qn.reshape(qn.shape[0], mS, sub), self.codebooks
        )
        id_col, vec_col, dim = self.id_col, self.vec_col, self.dim
        shortn = k * rerank

        def _adc(t: pa.Table) -> pa.Table:
            codes = np.asarray(t["codes"].combine_chunks().flatten()).reshape(-1, mS)
            ids = t[id_col].to_numpy()
            cl = t["cl"].to_numpy()
            out_q, out_v, out_s = [], [], []
            for c in np.unique(cl):
                qis = probing.get(int(c), [])
                if not qis:
                    continue
                sel = cl == c
                csub, cids = codes[sel], ids[sel]
                for qi in qis:
                    sims = tables[qi, np.arange(mS)[None, :], csub].sum(axis=1)
                    kk = min(shortn, sims.size)
                    kth = np.partition(sims, sims.size - kk)[sims.size - kk]
                    s = np.nonzero(sims >= kth - 1e-4)[0]
                    out_q.append(np.full(s.size, qids_arr[qi], np.int64))
                    out_v.append(cids[s])
                    out_s.append(sims[s])
            if not out_q:
                return empty
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                    "cos": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

        def _merge_short(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["cos"] = round_half_up(df["cos"].to_numpy())
            df = df.drop_duplicates(["qid", "vec_id"])
            df = df.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort")
            return df.head(shortn)

        short = (
            rd.read_parquet(files, columns=[id_col, "codes", "cl"])
            .map_batches(_adc, batch_format="pyarrow")
            .groupby("qid")
            .map_groups(_merge_short, batch_format="pandas")
            .to_pandas()  # bounded: n_queries * k * rerank rows
        )
        if short.empty:
            return rd.from_arrow(empty)
        cand = {
            int(q): np.sort(g["vec_id"].to_numpy(dtype=np.int64))
            for q, g in short.groupby("qid")
        }
        all_ids = np.sort(np.unique(short["vec_id"].to_numpy(dtype=np.int64)))
        ref = ray.put((cand, all_ids))
        qpos = {int(q): i for i, q in enumerate(qids_arr)}

        def _exact(t: pa.Table) -> pa.Table:
            cands, union_ids = ray.get(ref)
            ids = t[id_col].to_numpy()
            pos = np.clip(np.searchsorted(union_ids, ids), 0, union_ids.size - 1)
            keep = union_ids[pos] == ids
            if not keep.any():
                return empty
            sub_t = t.filter(pa.array(keep))
            m = _normalize(_to_matrix(sub_t[vec_col], dim))
            sids = sub_t[id_col].to_numpy()
            out_q, out_v, out_s = [], [], []
            for q, cs in cands.items():
                p = np.clip(np.searchsorted(cs, sids), 0, cs.size - 1)
                sel = cs[p] == sids
                if not sel.any():
                    continue
                sims = m[sel] @ qn[qpos[q]]
                out_q.append(np.full(int(sel.sum()), q, np.int64))
                out_v.append(sids[sel])
                out_s.append(sims)
            if not out_q:
                return empty
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                    "cos": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

        def _final(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["cos"] = round_half_up(df["cos"].to_numpy())
            df = df.drop_duplicates(["qid", "vec_id"])
            df = df.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort")
            return df.head(k)

        return (
            rd.read_parquet(files, columns=[id_col, vec_col])
            .map_batches(_exact, batch_format="pyarrow")
            .groupby("qid")
            .map_groups(_final, batch_format="pandas")
        )
