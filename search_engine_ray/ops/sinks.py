"""Sinks (SURVEY.md §2.3 E4/E5/E8) — idempotent, resumable Parquet
write patterns mirroring the reference's MongoDB write modes:

- `upsert_partitions` (E4, reference bulk `UpdateOne(upsert=True)`,
  lamda/store_product_sync.py:50-74): write the incoming rows
  partitioned by key columns and atomically swap ONLY the partitions
  present in the batch into the target — re-run-safe (upsert ≅
  overwrite-partition), untouched partitions keep their data.
- `full_refresh` (E5, reference `delete_many({})` + insert,
  lamda/group_sellable_inventory.py:46-48): write to a tmp dir and
  atomically rename over the target.
- `append_log` (E8, reference insert-per-request log collections,
  app.py:62-64): append one uniquely-named parquet file per call —
  an append-only log that is never rewritten.

All writes go through ds.write_parquet (distributed, partitioned);
the driver only does cheap directory renames.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Sequence

import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset


def full_refresh(ds: Dataset, out_dir: str) -> str:
    """E5: overwrite `out_dir` with `ds` (write tmp + atomic rename)."""
    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    ds.write_parquet(tmp)
    old = f"{out_dir}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(out_dir):
        os.rename(out_dir, old)
    os.rename(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    return out_dir


def upsert_partitions(ds: Dataset, out_dir: str, partition_cols: Sequence[str]) -> list[str]:
    """E4: overwrite only the hive partitions present in `ds`; other
    partitions are untouched. Returns the swapped partition paths."""
    partition_cols = list(partition_cols)
    tmp = f"{out_dir}.upsert-{uuid.uuid4().hex[:8]}"
    ds.write_parquet(tmp, partition_cols=partition_cols)
    os.makedirs(out_dir, exist_ok=True)
    swapped: list[str] = []
    # hive layout: tmp/<col>=<val>/.../*.parquet — swap each leaf
    # partition dir (depth == len(partition_cols)) into the target
    def _leaves(root: str, depth: int) -> list[str]:
        if depth == 0:
            return [root]
        out = []
        for name in sorted(os.listdir(root)):
            p = os.path.join(root, name)
            if os.path.isdir(p) and "=" in name:
                out += _leaves(p, depth - 1)
        return out

    for leaf in _leaves(tmp, len(partition_cols)):
        rel = os.path.relpath(leaf, tmp)
        dst = os.path.join(out_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        old = f"{dst}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(dst):
            os.rename(dst, old)
        os.rename(leaf, dst)
        shutil.rmtree(old, ignore_errors=True)
        swapped.append(dst)
    shutil.rmtree(tmp, ignore_errors=True)
    return swapped


def append_log(rows: pa.Table, log_dir: str, name: str | None = None) -> str:
    """E8: append-only log — one new uniquely-named parquet file per
    call; existing files are never touched. Tiny row batches are fine
    (one file per request, like the reference's per-request inserts)."""
    os.makedirs(log_dir, exist_ok=True)
    fname = os.path.join(log_dir, f"{name or uuid.uuid4().hex}.parquet")
    pq.write_table(rows, fname)
    return fname


def read_log(log_dir: str):
    """Read the whole append-only log back as a Dataset."""
    import ray.data as rd

    return rd.read_parquet(log_dir)
