"""List-column update operators (reference E7: `$push` / `$pull` on
the `tag_ids` array field, lamda/tags.py:41-69) — vectorized
read-modify-write of a `list<string>` column, no per-row Python.

list_push: append a value to each (optionally condition-masked) row's
list — offsets recomputed with cumsum, values spliced with np.insert.
list_pull: remove all occurrences of a value — element-mask + filtered
flatten + per-row length recount.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _as_list_array(chunked) -> pa.ListArray:
    arr = chunked.combine_chunks() if isinstance(chunked, pa.ChunkedArray) else chunked
    return arr


def list_push(
    ds: Dataset, col: str, value: str, where: tuple[str, str] | None = None
) -> Dataset:
    """Append `value` to each row's `col` list; if `where=(column,
    equals_value)` only on matching rows (reference adds a tag id to
    matching products)."""

    def _f(t: pa.Table) -> pa.Table:
        lists = _as_list_array(t[col])
        n = len(lists)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        if where is not None:
            mask = pc.equal(t[where[0]], where[1]).to_numpy(zero_copy_only=False)
            mask = np.asarray(mask, dtype=bool)
        else:
            mask = np.ones(n, dtype=bool)
        ends = np.cumsum(lens)
        ins_pos = ends[mask]  # insert at each masked row's end
        flat_py = flat.to_numpy(zero_copy_only=False).astype(object)
        new_flat = np.insert(flat_py, ins_pos, value)
        new_lens = lens + mask.astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(new_lens))).astype(np.int32)
        new_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(new_flat.tolist(), pa.string())
        )
        return t.set_column(t.column_names.index(col), col, new_col)

    return ds.map_batches(_f, batch_format="pyarrow")


def list_pull(ds: Dataset, col: str, value: str) -> Dataset:
    """Remove every occurrence of `value` from each row's `col` list
    (reference `$pull`)."""

    def _f(t: pa.Table) -> pa.Table:
        lists = _as_list_array(t[col])
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lists.flatten()
        keep = pc.not_equal(flat, value)
        keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
        # removed count per row: reduceat over the element mask
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        removed = np.zeros(len(lists), dtype=np.int64)
        nonempty = lens > 0
        if keep_np.size:
            inv = (~keep_np).astype(np.int64)
            sums = np.add.reduceat(inv, starts[nonempty])
            removed[nonempty] = sums
        new_lens = lens - removed
        offsets = np.concatenate(([0], np.cumsum(new_lens))).astype(np.int32)
        new_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat.filter(keep)
        )
        return t.set_column(t.column_names.index(col), col, new_col)

    return ds.map_batches(_f, batch_format="pyarrow")
