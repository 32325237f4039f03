"""Sequence packing for LLM training batches (sample packing).

Greedy token-budget packing of documents into training sequences —
the T5 / GPT pretraining dataloader move ("packing" in HF
terminology): concatenate documents until the next one would overflow
the sequence budget, then start a new pack. At 100 TB the operator
must be deterministic under any parallelism, so documents are
hash-sharded by id first (md5 upper-64 of the id string — the same
keyed determinism as ops/sketch.hash_sample, bit-reproducible in
DuckDB as `md5_number_upper`), and each shard packs its docs in id
order independently. Shards are embarrassingly parallel; pack ids are
globally unique (`shard << 32 | local_pack`).

Scale shape: ONE coarse shuffle (groupby on the shard key,
`num_shards` groups — pick num_shards >> cluster cores), then a
vectorized per-shard boundary scan that iterates over PACK BOUNDARIES
(one searchsorted on the cumulative-token array per pack), never over
documents or tokens.

Greedy semantics (matches the reference Python packer in the tests):
a pack closes when adding the next doc would exceed `budget`; a
single document larger than the budget gets a pack of its own.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from search_engine_ray.ops.sketch import _md5_upper64


def pack_sequences(
    ds: Dataset,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    num_shards: int = 64,
) -> Dataset:
    """Pack (id, n_tokens) rows into token-budget sequences.

    Returns the input rows plus ``pack_id`` (int64, globally unique)
    and ``pack_seq`` (0-based position of the doc within its pack).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    def _shard(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.string()).to_pylist()
        h = (_md5_upper64(ids) % np.uint64(num_shards)).astype(np.int64)
        return t.append_column("_shard", pa.array(h))

    def _pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        tok = df[tokens_col].to_numpy().astype(np.int64)
        c = np.cumsum(tok)
        # boundary scan: one searchsorted per PACK. j = first doc whose
        # cumulative total exceeds the pack's budget window; an
        # oversize doc (j == start) still advances by one (own pack).
        starts = [0]
        while True:
            i = starts[-1]
            base = int(c[i - 1]) if i else 0
            j = int(np.searchsorted(c, base + budget, side="right"))
            j = max(j, i + 1)
            if j >= tok.size:
                break
            starts.append(j)
        sa = np.asarray(starts, dtype=np.int64)
        lens = np.diff(np.append(sa, tok.size))
        shard = int(df["_shard"].iloc[0])
        out = df.drop(columns=["_shard"]).copy()
        out["pack_id"] = (np.int64(shard) << np.int64(32)) + np.repeat(
            np.arange(sa.size, dtype=np.int64), lens
        )
        out["pack_seq"] = np.arange(tok.size, dtype=np.int64) - np.repeat(sa, lens)
        return out

    return (
        ds.map_batches(_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(_pack, batch_format="pandas")
    )


def deterministic_shuffle(
    ds: Dataset,
    key_col: str = "doc_id",
    num_shards: int = 64,
    salt: str = "",
) -> Dataset:
    """Deterministic global shuffle for training-data export WITHOUT a
    sort shuffle: rows take the fixed pseudorandom order
    ``(md5(key+salt) % num_shards, md5(key+salt), key)`` — reproducible
    at any parallelism, across epochs (vary ``salt`` per epoch for a
    fresh permutation), and bit-identical in SQL (md5_number_upper).

    Two passes: a tiny per-shard row-count aggregate fixes each
    shard's global offset, then ONE shard groupby whose groups sort
    locally by hash and emit ``shuffle_rank`` = offset + local
    position. The only all-to-all is the shard groupby (num_shards
    groups); there is no global sort-exchange — the permutation is
    globally consistent because shard membership and in-shard order
    both depend only on the key.
    """
    from search_engine_ray.ops.sketch import _md5_upper64

    def _tag(t: pa.Table) -> pa.Table:
        keys = pc.cast(t[key_col], pa.string()).to_pylist()
        h = _md5_upper64([k + salt for k in keys])
        # order-preserving uint64 -> int64 (top bit flip): uint64
        # columns are a shuffle-pickling hazard and int64 sorts the same
        h_i64 = (h ^ np.uint64(1 << 63)).view(np.int64)
        t = t.append_column("_h", pa.array(h_i64, pa.int64()))
        return t.append_column(
            "_shard", pa.array((h % np.uint64(num_shards)).astype(np.int64))
        )

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    counts = tagged.groupby("_shard").count().to_pandas()
    counts = counts.sort_values("_shard")
    offsets = dict(
        zip(
            counts["_shard"].astype(int),
            np.concatenate([[0], np.cumsum(counts["count()"].to_numpy())[:-1]]).astype(int),
        )
    )

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h", key_col], kind="mergesort").reset_index(drop=True)
        off = offsets[int(df["_shard"].iloc[0])]
        out = df.drop(columns=["_h", "_shard"]).copy()
        out["shuffle_rank"] = off + np.arange(len(df), dtype=np.int64)
        return out

    return tagged.groupby("_shard").map_groups(_rank, batch_format="pandas")
