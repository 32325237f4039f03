"""Sources with pushdown (E1/R1-at-the-read).

`read_parquet_filtered` converts the same Condition tuples used by
`relational.filter_conditions` into a pyarrow dataset expression and
hands it to `ray.data.read_parquet(filter=...)` — predicates prune
parquet row groups (and hive partitions) AT THE SOURCE, so filtered
rows never leave storage; `columns` prunes to the projection. Use this
instead of read-then-filter whenever the predicate references only
source columns.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow.compute as pc

from ray.data import Dataset

from search_engine_ray.ops.relational import Condition

_OPS = {
    "==": lambda f, v: f == v,
    "!=": lambda f, v: f != v,
    ">": lambda f, v: f > v,
    ">=": lambda f, v: f >= v,
    "<": lambda f, v: f < v,
    "<=": lambda f, v: f <= v,
    "in": lambda f, v: f.isin(list(v)),
    "not_in": lambda f, v: ~f.isin(list(v)),
}


def conditions_to_expression(conditions: Sequence[Condition]):
    expr = None
    for col, op, val in conditions:
        e = _OPS[op](pc.field(col), val)
        expr = e if expr is None else expr & e
    return expr


def read_parquet_filtered(
    path,
    columns: Sequence[str] | None = None,
    conditions: Sequence[Condition] = (),
    **kwargs,
) -> Dataset:
    import ray.data as rd

    expr = conditions_to_expression(conditions) if conditions else None
    return rd.read_parquet(
        path,
        columns=list(columns) if columns else None,
        filter=expr,
        **kwargs,
    )


def read_parquet_evolved(paths: Sequence[str], **kwargs) -> Dataset:
    """Schema-evolution read (DuckDB's ``union_by_name=true``, Spark's
    ``mergeSchema``): each path may carry a different column set —
    older files written before a column existed, newer ones after.
    Reads every path as its own Dataset, computes the UNION schema by
    column name (first-seen type wins; a same-name type conflict
    raises loudly rather than silently casting), then normalizes each
    source inside ``map_batches`` by appending all-null columns for
    the names it lacks and reordering to the union layout, and unions
    the streams. Schema inspection touches parquet FOOTERS only; data
    scans stay streaming and column-pruned by whatever the caller
    selects downstream."""
    import pyarrow as pa

    import ray.data as rd

    dsets = [rd.read_parquet(p, **kwargs) for p in paths]
    fields: dict[str, pa.DataType] = {}
    for d in dsets:
        sch = d.schema()
        for name, typ in zip(sch.names, sch.types):
            if name in fields:
                if fields[name] != typ:
                    raise ValueError(
                        f"read_parquet_evolved: column {name!r} has "
                        f"conflicting types {fields[name]} vs {typ}"
                    )
            else:
                fields[name] = typ
    names = list(fields)

    def _normalize(t: pa.Table) -> pa.Table:
        cols = {}
        for name in names:
            if name in t.column_names:
                cols[name] = t[name]
            else:
                cols[name] = pa.nulls(t.num_rows, fields[name])
        return pa.table(cols)

    out = dsets[0].map_batches(_normalize, batch_format="pyarrow")
    for d in dsets[1:]:
        out = out.union(d.map_batches(_normalize, batch_format="pyarrow"))
    return out
