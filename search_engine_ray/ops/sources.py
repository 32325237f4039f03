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
