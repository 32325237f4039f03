"""Iterative graph algorithms over edge-list Datasets.

`pagerank` is the second member of the iterative-distributed family
(the first is dedup.connected_components' min-label propagation): a
power iteration with CO-PARTITIONED state. The edge list is hash-
partitioned by src-shard exactly ONCE (the only time edge rows move);
rank state lives in node-shard tables co-partitioned with the edges
(node-shard == src-shard for a node's out-edges), so each iteration
moves only the per-edge contribution mass (node, w) between shards —
a task-based 64x64 exchange of small Arrow tables, never a sort and
never a re-shuffle of the static edge set. No per-node state ever
lives on the driver; the driver holds only object refs and one int
per shard.

Deliberately raw Ray tasks, not Dataset ops: a Dataset groupby per
iteration re-sorts the (static) edge table every step — the classic
iterative-workload mismatch with streaming-batch engines. At cluster
scale the one-time partition is the single all-to-all; iterations are
bandwidth-proportional to contribution mass only, and every task's
inputs are plasma-local once placed. Raise _N_SHARDS with node count
(it bounds per-task state at nodes/shards + edges/shards rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from search_engine_ray.ops.rounding import round_half_up

_N_SHARDS = 64

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
_NODE_SCHEMA = pa.schema([("node", pa.int64())])
_NW_SCHEMA = pa.schema([("node", pa.int64()), ("w", pa.float64())])
_PR_SCHEMA = pa.schema([("node", pa.int64()), ("pr", pa.float64())])


def _empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def _shard_slices(keys: np.ndarray, arrays: dict[str, np.ndarray], nsh: int):
    """Order rows by shard(key) and return one table per shard."""
    cg = keys & np.int64(nsh - 1)
    order = np.argsort(cg, kind="stable")
    cg_sorted = cg[order]
    bounds = np.searchsorted(cg_sorted, np.arange(nsh + 1))
    out = []
    for s in range(nsh):
        lo, hi = bounds[s], bounds[s + 1]
        out.append(
            pa.table({k: pa.array(v[order[lo:hi]], pa.int64() if v.dtype == np.int64
                                  else pa.float64())
                      for k, v in arrays.items()})
        )
    return out


def pagerank(
    edges: Dataset,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    dedup_edges: bool = False,
) -> Dataset:
    """PageRank by `iters` power iterations over a directed edge list
    (duplicate edges count once per occurrence; ``dedup_edges=True``
    collapses duplicates INSIDE the one-time shard build — every copy
    of an (src, dst) pair lands in the same src-shard, so the
    per-shard lexsort dedup is globally exact and costs no extra
    shuffle, unlike a separate Dataset.distinct pass).
    The node universe is every id appearing as src or
    dst; dangling nodes (no out-edges) contribute nothing — callers
    wanting the classic dangling-mass redistribution should symmetrize
    the graph first (the tested entry does).

        pr_0        = 1/N
        pr_{i+1}(v) = (1-d)/N + d * sum_{(u,v) in E} pr_i(u)/outdeg(u)

    Returns (node, pr) with pr rounded to 4. Per-node contribution
    sums fold in a FIXED order (src-shard 0..N, stable row order), so
    results are bit-deterministic across runs; the SQL oracle's
    unordered SUM may differ in the last ulp, absorbed by the 4dp
    rounding."""
    import ray
    import ray.data as rd

    nsh = _N_SHARDS

    @ray.remote
    def _split(tbl: pa.Table):
        # one input block -> per-src-shard (src, dst) pieces
        if tbl.num_rows == 0 or src_col not in tbl.column_names:
            return [_empty(_EDGE_SCHEMA)] * nsh
        src = tbl[src_col].cast(pa.int64()).combine_chunks().to_numpy()
        dst = tbl[dst_col].cast(pa.int64()).combine_chunks().to_numpy()
        return _shard_slices(src, {"src": src, "dst": dst}, nsh)

    @ray.remote
    def _build_shard(*pieces: pa.Table):
        # assemble src-shard s: edges sorted by src with per-edge
        # outdeg, plus per-NODE-shard distinct node ids seen here
        live = [p for p in pieces if p.num_rows]
        if not live:
            return [_empty(_EDGE_SCHEMA).append_column("od", pa.array([], pa.int64()))] + [
                _empty(_NODE_SCHEMA)
            ] * nsh
        t = pa.concat_tables(live)
        src = t["src"].combine_chunks().to_numpy()
        dst = t["dst"].combine_chunks().to_numpy()
        if dedup_edges:
            order = np.lexsort((dst, src))
            src, dst = src[order], dst[order]
            keep = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
            src, dst = src[keep], dst[keep]
        else:
            order = np.argsort(src, kind="stable")
            src, dst = src[order], dst[order]
        uniq, counts = np.unique(src, return_counts=True)
        od = np.repeat(counts, counts)  # outdeg per edge row
        edge_tbl = pa.table({"src": pa.array(src, pa.int64()),
                             "dst": pa.array(dst, pa.int64()),
                             "od": pa.array(od, pa.int64())})
        # node ids: srcs (all in this shard) + dsts (spread over shards)
        all_nodes = np.unique(np.concatenate([uniq, dst]))
        ncg = all_nodes & np.int64(nsh - 1)
        out = [edge_tbl]
        for d in range(nsh):
            out.append(pa.table({"node": pa.array(all_nodes[ncg == d], pa.int64())}))
        return out

    @ray.remote
    def _union_nodes(*pieces: pa.Table):
        live = [p["node"].combine_chunks().to_numpy() for p in pieces if p.num_rows]
        nodes = np.unique(np.concatenate(live)) if live else np.empty(0, np.int64)
        return pa.table({"node": pa.array(nodes, pa.int64())}), int(nodes.size)

    @ray.remote
    def _init_pr(nodes_tbl: pa.Table, n: int) -> pa.Table:
        nd = nodes_tbl["node"].combine_chunks().to_numpy()
        return pa.table({"node": pa.array(nd, pa.int64()),
                         "pr": pa.array(np.full(nd.size, 1.0 / n), pa.float64())})

    @ray.remote
    def _contrib(edge_tbl: pa.Table, pr_tbl: pa.Table):
        # src-shard task: w = pr(src)/outdeg(src) per edge, routed to
        # the dst's node-shard. pr_tbl is sorted by node (built so).
        if edge_tbl.num_rows == 0:
            return [_empty(_NW_SCHEMA)] * nsh
        src = edge_tbl["src"].combine_chunks().to_numpy()
        dst = edge_tbl["dst"].combine_chunks().to_numpy()
        od = edge_tbl["od"].combine_chunks().to_numpy()
        pn = pr_tbl["node"].combine_chunks().to_numpy()
        pv = pr_tbl["pr"].combine_chunks().to_numpy()
        w = pv[np.searchsorted(pn, src)] / od
        return _shard_slices(dst, {"node": dst, "w": w}, nsh)

    @ray.remote
    def _fold(nodes_tbl: pa.Table, n: int, *pieces: pa.Table) -> pa.Table:
        # node-shard task: sum inbound mass per node in FIXED piece
        # order, then the damping update for EVERY node in the shard
        nd = nodes_tbl["node"].combine_chunks().to_numpy()
        base = (1.0 - damping) / n
        acc = np.zeros(nd.size, np.float64)
        for p in pieces:
            if p.num_rows == 0:
                continue
            node = p["node"].combine_chunks().to_numpy()
            w = p["w"].combine_chunks().to_numpy()
            np.add.at(acc, np.searchsorted(nd, node), w)
        return pa.table({"node": pa.array(nd, pa.int64()),
                         "pr": pa.array(base + damping * acc, pa.float64())})

    # ---- one-time partition (the only time edge rows move) ---------
    blk_refs = edges.to_arrow_refs()
    piece_refs = [
        _split.options(num_returns=nsh).remote(b) for b in blk_refs
    ]
    shard_out = [
        _build_shard.options(num_returns=nsh + 1).remote(
            *[piece_refs[b][s] for b in range(len(piece_refs))]
        )
        for s in range(nsh)
    ]
    edge_shards = [shard_out[s][0] for s in range(nsh)]
    node_out = [
        _union_nodes.options(num_returns=2).remote(
            *[shard_out[s][1 + d] for s in range(nsh)]
        )
        for d in range(nsh)
    ]
    node_shards = [node_out[d][0] for d in range(nsh)]
    n = int(sum(ray.get([node_out[d][1] for d in range(nsh)])))
    if n == 0:
        return rd.from_arrow(_empty(_PR_SCHEMA))

    # ---- co-partitioned power iteration -----------------------------
    pr = [_init_pr.remote(node_shards[d], n) for d in range(nsh)]
    for _ in range(iters):
        contrib = [
            _contrib.options(num_returns=nsh).remote(edge_shards[s], pr[s])
            for s in range(nsh)
        ]
        pr = [
            _fold.remote(node_shards[d], n, *[contrib[s][d] for s in range(nsh)])
            for d in range(nsh)
        ]

    def _round(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names:
            return _empty(_PR_SCHEMA)
        return pa.table(
            {
                "node": t["node"],
                "pr": pa.array(round_half_up(t["pr"].to_numpy()), pa.float64()),
            }
        )

    return rd.from_arrow_refs(pr).map_batches(_round, batch_format="pyarrow")


def bfs_levels(
    edges: Dataset,
    source: int,
    max_depth: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pd.DataFrame:
    """Breadth-first reachability levels from ``source`` over an
    UNDIRECTED edge list (each (src, dst) row is traversed both ways),
    the third member of the iterative-distributed family (after
    connected_components and pagerank). Per level, ONE streaming pass
    over the static edge Dataset marks neighbors of the current
    frontier: the frontier/visited id sets broadcast once per level
    via ray.put (bounded by NODE cardinality — the small dimension of
    a bipartite-derived graph — never by edges), each batch emits only
    its newly-reached ids, and the driver folds the per-batch
    candidate sets with one np.unique. Edge rows never move: no
    shuffle, no join operator — level expansion is a broadcast-filter,
    the same contract as the bloom/broadcast joins in ops.relational.

    Returns one row per level 0..max_depth with its node count, plus a
    level -1 row counting graph nodes NOT reached within max_depth
    (callers chain more levels by raising max_depth; the bounded-depth
    contract keeps the oracle SQL-expressible without recursion).
    """
    import ray

    counts = [1]
    visited = np.array([source], dtype=np.int64)
    frontier = visited
    n_nodes_ref: list[int] = []

    for _ in range(max_depth):
        fr_ref = ray.put(frontier)
        vis_ref = ray.put(visited)

        def _expand(t: pa.Table, _fr=fr_ref, _vis=vis_ref) -> pa.Table:
            fr = ray.get(_fr)
            vis = ray.get(_vis)
            s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
            out = np.concatenate([d[np.isin(s, fr)], s[np.isin(d, fr)]])
            out = out[~np.isin(out, vis)]
            return pa.table({"v": pa.array(np.unique(out), pa.int64())})

        parts = [
            p
            for p in ray.get(
                edges.map_batches(_expand, batch_format="pyarrow").to_arrow_refs()
            )
            if p.num_rows
        ]
        new = (
            np.unique(np.concatenate([p["v"].to_numpy() for p in parts]))
            if parts
            else np.array([], dtype=np.int64)
        )
        counts.append(int(new.size))
        if new.size == 0:
            break
        visited = np.concatenate([visited, new])
        frontier = new

    def _nodes(t: pa.Table) -> pa.Table:
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(np.unique(np.concatenate([s, d])), pa.int64())})

    nparts = [
        p
        for p in ray.get(
            edges.map_batches(_nodes, batch_format="pyarrow").to_arrow_refs()
        )
        if p.num_rows
    ]
    all_nodes = (
        np.unique(np.concatenate([p["v"].to_numpy() for p in nparts]))
        if nparts
        else np.array([], dtype=np.int64)
    )
    n_unreached = int(np.union1d(all_nodes, [source]).size - visited.size)
    while len(counts) < max_depth + 1:
        counts.append(0)
    levels = list(range(len(counts))) + [-1]
    return pd.DataFrame(
        {
            "level": pd.array(levels, "int64"),
            "n_nodes": pd.array(counts + [n_unreached], "int64"),
        }
    )
