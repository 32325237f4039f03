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


def compact_parquet(src_dir: str, out_dir: str, target_rows_per_file: int) -> int:
    """Small-file compaction (the maintenance op every long-running
    Parquet sink needs: upsert/append sinks accrete files; readers and
    the object store pay per-file overhead). Streams `src_dir` through
    a repartition sized so each output file holds ~target_rows_per_file
    rows, then atomically swaps the compacted copy over `out_dir`
    (tmp + rename — a failed run leaves the target untouched). Row
    content is byte-identical; only the file layout changes. Returns
    the output file count."""
    import math

    import ray.data as rd

    ds = rd.read_parquet(src_dir)
    n = ds.count()
    n_files = max(1, math.ceil(n / max(1, target_rows_per_file)))
    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    ds.repartition(n_files).write_parquet(tmp)
    old = f"{out_dir}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(out_dir):
        os.rename(out_dir, old)
    os.rename(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    return sum(1 for f in os.listdir(out_dir) if f.endswith(".parquet"))


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


def sorted_export(
    ds: Dataset,
    keys: Sequence[str],
    out_dir: str,
    num_ranges: int = 16,
    rank_col: str = "rank",
) -> str:
    """Globally-sorted Parquet export (ORDER BY keys, the TeraSort
    shape) WITHOUT Ray's sort shuffle (which measurably anti-scaled on
    this workload — see BASELINE.md): sample key tuples -> derive
    range boundaries -> hive-partition the rows by range id (the same
    sequential-write exchange the index build uses) -> one task per
    range sorts locally and writes `range=%05d` files carrying a
    GLOBAL 1-based `rank_col` (range offsets from the per-range
    counts). Reading `range=*` dirs in order yields the full ORDER BY;
    the rank column makes the ordering verifiable by a value hash.

    Keys must be totally ordering (pass a unique tiebreak column
    last) for the rank to be deterministic. Sampling is deterministic:
    every block contributes its first rows, and boundaries are exact
    quantiles of the gathered sample."""
    import numpy as np
    import pandas as pd

    keys = list(keys)

    def _sample(t: pa.Table) -> pa.Table:
        return t.select(keys).slice(0, 32)

    samp = pd.concat(
        [b.to_pandas() for b in _ds_batches(ds.map_batches(_sample, batch_format="pyarrow"))],
        ignore_index=True,
    ).sort_values(keys, kind="mergesort")
    if samp.empty:
        raise ValueError("sorted_export over an empty dataset")
    n_r = max(1, min(int(num_ranges), len(samp)))
    # boundary rows at even sample quantiles (first key-tuple of each
    # range except range 0)
    cut_idx = [int(len(samp) * i / n_r) for i in range(1, n_r)]
    cuts = samp.iloc[cut_idx][keys].to_records(index=False).tolist()

    def _obj_arr(rows: list) -> np.ndarray:
        # keep tuples as SCALARS of an object array (np.array() would
        # broadcast uniform tuples into a 2-D array)
        a = np.empty(len(rows), dtype=object)
        a[:] = rows
        return a

    cut_arr = _obj_arr(cuts)

    def _rid(df: pd.DataFrame) -> pd.DataFrame:
        tuples = list(df[keys].itertuples(index=False, name=None))
        rid = (
            np.searchsorted(cut_arr, _obj_arr(tuples), side="right")
            if len(cut_arr)
            else np.zeros(len(df), np.int64)
        )
        out = df.copy()
        out["_range"] = rid.astype(np.int64)
        return out

    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    ds.map_batches(_rid, batch_format="pandas").write_parquet(
        tmp, partition_cols=["_range"]
    )
    # per-range counts -> global offsets (n_ranges integers)
    import glob as _glob

    rdirs = sorted(_glob.glob(os.path.join(tmp, "_range=*")))
    counts = [
        sum(pq.read_metadata(f).num_rows for f in _glob.glob(os.path.join(d, "*.parquet")))
        for d in rdirs
    ]
    offsets = {d: int(o) for d, o in zip(rdirs, np.concatenate([[0], np.cumsum(counts)[:-1]]))}

    import ray

    @ray.remote
    def _finish(rdir: str, offset: int, dst: str) -> int:
        import pyarrow.dataset as pads

        t = pads.dataset(rdir).to_table()
        df = t.to_pandas().sort_values(keys, kind="mergesort").reset_index(drop=True)
        df[rank_col] = np.arange(offset + 1, offset + 1 + len(df), dtype=np.int64)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), dst)
        return len(df)

    os.makedirs(out_dir, exist_ok=True)
    futs = [
        _finish.remote(d, offsets[d], os.path.join(out_dir, f"range={i:05d}", "part.parquet"))
        for i, d in enumerate(rdirs)
    ]
    ray.get(futs)
    shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def _ds_batches(ds: Dataset):
    """iter_batches as pyarrow tables (tiny sample streams only)."""
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        yield b


def write_snapshot(ds: Dataset, table_dir: str) -> str:
    """Iceberg-style SNAPSHOT PUBLISH (the commit protocol behind
    every warehouse table format): the dataset writes its parquet
    parts into a uniquely-named data directory under ``table_dir``,
    and the snapshot becomes visible only when a ``_MANIFEST.json``
    naming exactly those files lands via atomic rename. Readers that
    go through ``read_snapshot`` never observe half-written data —
    files not named by the manifest (in-flight writers, crashed runs,
    orphans) are invisible, which is precisely the resumable-output
    contract at 100 TB: a failed publish leaves the PREVIOUS manifest
    (and therefore the previous table state) intact. Returns the
    manifest path."""
    import json

    data_dir = os.path.join(table_dir, f"data-{uuid.uuid4().hex[:8]}")
    ds.write_parquet(data_dir)
    files = sorted(
        os.path.join(os.path.basename(data_dir), f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    # version history for time travel: each publish also lands a
    # numbered immutable manifest (_MANIFEST-0000N.json); the bare
    # _MANIFEST.json rename stays the atomic "current" pointer.
    existing = [
        f for f in os.listdir(table_dir)
        if f.startswith("_MANIFEST-") and f.endswith(".json")
    ]
    version = len(existing) + 1
    manifest = {"files": files, "version": version}
    tmp = os.path.join(table_dir, f"_MANIFEST.json.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    versioned = os.path.join(table_dir, f"_MANIFEST-{version:05d}.json")
    with open(versioned + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.rename(versioned + ".tmp", versioned)
    final = os.path.join(table_dir, "_MANIFEST.json")
    os.rename(tmp, final)
    return final


def read_snapshot(table_dir: str, version: int | None = None) -> Dataset:
    """Manifest-scoped read: load ONLY the files the current
    ``_MANIFEST.json`` names (see ``write_snapshot``). Unregistered
    parquet files in the table directory — concurrent writers,
    aborted publishes — are excluded by construction. Pass
    ``version=N`` to TIME-TRAVEL to the N-th publish via its
    immutable ``_MANIFEST-0000N.json`` (old data dirs are never
    rewritten, so every historical snapshot stays readable until a
    vacuum collects it)."""
    import json

    import ray.data as rd

    name = "_MANIFEST.json" if version is None else f"_MANIFEST-{version:05d}.json"
    with open(os.path.join(table_dir, name)) as f:
        manifest = json.load(f)
    paths = [os.path.join(table_dir, p) for p in manifest["files"]]
    return rd.read_parquet(paths)


def compact_snapshot(table_dir: str, num_files: int) -> str:
    """Small-file COMPACTION as a snapshot republish (the OPTIMIZE /
    rewrite-data-files maintenance op every long-lived table needs —
    at 100 TB a table accumulates millions of delta-sized files and
    footer/IO overhead dominates scans): read the CURRENT manifest's
    files, repartition to ``num_files`` right-sized blocks, and
    publish the result as a NEW snapshot via ``write_snapshot`` — the
    swap is the same atomic manifest rename, so readers see either
    the fragmented or the compacted state, never a mix, and a crashed
    compaction leaves the old snapshot intact. Old data dirs stay on
    disk for time-travel/GC (a separate vacuum's job). Returns the
    new manifest path."""
    ds = read_snapshot(table_dir)
    return write_snapshot(ds.repartition(num_files), table_dir)
