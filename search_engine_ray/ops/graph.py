"""Iterative graph algorithms over edge-list Datasets.

`pagerank` is the second member of the iterative-distributed family
(the first is dedup.connected_components' min-label propagation): a
power iteration where every step is TWO bounded groupby shuffles —
rank meets its out-edges in src-sharded groups, contributions fold in
dst-sharded groups — and no per-node state ever lives on the driver.

Deliberately NOT Dataset.join: Ray 2.49's hash-shuffle ops emit
schema-less empty blocks that a later join's Acero kernel rejects
("No match for FieldRef on right side"), so iterative join chains
break. The coarse-shard union + map_groups pandas-merge pattern
(shared with dedup's component propagation) tolerates them; all edges
of a src land in one shard (shard key = the group key), so per-group
merges are exact. The rank table is materialized once per iteration
(O(nodes) rows — the iterative-lineage cut connected_components also
makes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

from search_engine_ray.ops.rounding import round_half_up

_N_SHARDS = 64


def pagerank(
    edges: Dataset,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> Dataset:
    """PageRank by `iters` power iterations over a directed edge list
    (duplicate edges count once per occurrence; pre-distinct if that's
    not wanted). The node universe is every id appearing as src or
    dst; dangling nodes (no out-edges) contribute nothing — callers
    wanting the classic dangling-mass redistribution should symmetrize
    the graph first (the tested entry does).

        pr_0        = 1/N
        pr_{i+1}(v) = (1-d)/N + d * sum_{(u,v) in E} pr_i(u)/outdeg(u)

    Returns (node, pr) with pr rounded to 4 — the float op order
    (per-edge pr/outdeg division, then the sum, then (1-d)/N + d*s)
    matches the SQL oracle's exactly."""
    empty_nw = pd.DataFrame(
        {"node": np.empty(0, np.int64), "w": np.empty(0, np.float64)}
    )

    def _edge_rows(t: pa.Table) -> pa.Table:
        src = t[src_col].cast(pa.int64())
        return pa.table(
            {
                "key": src,
                "dst": t[dst_col].cast(pa.int64()),
                "pr": pa.array(np.zeros(t.num_rows), pa.float64()),
                "side": pa.array(np.zeros(t.num_rows, np.int64)),
                "cg": pc.bit_wise_and(src, _N_SHARDS - 1),
            }
        )

    # few-block layout: every iteration sort-shuffles this table, and
    # Ray's sort groupby pays per-block fixed costs that dominate at
    # small scale (at 100 TB the block count follows data size anyway)
    edge_rows = (
        edges.map_batches(_edge_rows, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )

    # node universe: distinct src ∪ dst (one bounded groupby)
    nodes = (
        edges.map_batches(
            lambda t: pa.table({"node": t[src_col].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        .union(
            edges.map_batches(
                lambda t: pa.table({"node": t[dst_col].cast(pa.int64())}),
                batch_format="pyarrow",
            )
        )
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .repartition(4)
        .materialize()
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    init = 1.0 / n

    def _pr_rows(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names:  # schema-less empty block
            t = pa.table({"node": pa.array([], pa.int64()),
                          "pr": pa.array([], pa.float64())})
        node = t["node"].cast(pa.int64())
        return pa.table(
            {
                "key": node,
                "dst": pa.array(np.zeros(t.num_rows, np.int64)),
                "pr": t["pr"].cast(pa.float64()),
                "side": pa.array(np.ones(t.num_rows, np.int64)),
                "cg": pc.bit_wise_and(node, _N_SHARDS - 1),
            }
        )

    def _contrib(df: pd.DataFrame) -> pd.DataFrame:
        # one src-shard: every out-edge of a src is here, so outdeg is
        # exact; w = pr(src)/outdeg(src) per edge
        if df.empty or "side" not in df.columns:
            return empty_nw
        e = df[df["side"] == 0]
        p = df[df["side"] == 1]
        if e.empty or p.empty:
            return empty_nw
        od = e.groupby("key", sort=False)["dst"].transform("size").to_numpy()
        prv = p.set_index("key")["pr"]
        w = prv.reindex(e["key"]).to_numpy() / od
        return pd.DataFrame({"node": e["dst"].to_numpy(), "w": w})

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        # one dst-shard: sum contributions per node, apply the damping
        # update for EVERY node row (side=1), inbound or not
        out_empty = pd.DataFrame(
            {"node": np.empty(0, np.int64), "pr": np.empty(0, np.float64)}
        )
        if df.empty or "side" not in df.columns:
            return out_empty
        nodes_g = df[df["side"] == 1]
        if nodes_g.empty:
            return out_empty
        c = df[df["side"] == 0]
        s = c.groupby("node", sort=False)["w"].sum() if len(c) else pd.Series(dtype=float)
        sv = s.reindex(nodes_g["node"]).fillna(0.0).to_numpy()
        return pd.DataFrame(
            {
                "node": nodes_g["node"].to_numpy(),
                "pr": base + damping * sv,
            }
        )

    pr = nodes.map_batches(
        lambda t: t.append_column(
            "pr", pa.array(np.full(t.num_rows, init), pa.float64())
        )
        if "node" in t.column_names
        else pa.table({"node": pa.array([], pa.int64()), "pr": pa.array([], pa.float64())}),
        batch_format="pyarrow",
    ).materialize()

    node_rows_static = nodes.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"].cast(pa.int64()),
                "w": pa.array(np.zeros(t.num_rows), pa.float64()),
                "side": pa.array(np.ones(t.num_rows, np.int64)),
                "cg": pc.bit_wise_and(t["node"].cast(pa.int64()), _N_SHARDS - 1),
            }
        )
        if "node" in t.column_names
        else pa.table(
            {"node": pa.array([], pa.int64()), "w": pa.array([], pa.float64()),
             "side": pa.array([], pa.int64()), "cg": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        stream1 = edge_rows.union(pr.map_batches(_pr_rows, batch_format="pyarrow"))
        contrib = stream1.groupby("cg").map_groups(_contrib, batch_format="pandas")
        tagged = contrib.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "w": t["w"],
                    "side": pa.array(np.zeros(t.num_rows, np.int64)),
                    "cg": pc.bit_wise_and(t["node"], _N_SHARDS - 1),
                }
            )
            if "node" in t.column_names
            else pa.table(
                {"node": pa.array([], pa.int64()), "w": pa.array([], pa.float64()),
                 "side": pa.array([], pa.int64()), "cg": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        pr = (
            tagged.union(node_rows_static)
            .groupby("cg")
            .map_groups(_fold, batch_format="pandas")
            .repartition(4)
            .materialize()
        )

    def _round(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names:
            return pa.table(
                {"node": pa.array([], pa.int64()), "pr": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "node": t["node"],
                "pr": pa.array(round_half_up(t["pr"].to_numpy()), pa.float64()),
            }
        )

    return pr.map_batches(_round, batch_format="pyarrow")
