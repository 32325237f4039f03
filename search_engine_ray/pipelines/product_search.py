"""The reference's three entry-point pipelines, Ray-Data-first.

- keyword_search  = POST /v1/search  (app.py:26-68): S8 keyword plan ->
  $search -> $match -> boost -> $sort -> $facet{total, page}.
- grouped_search  = GET /v2/search?should_group=true (app.py:71-111,
  pipelines.py:566-661): score the FULL match set, sort-before-group
  dedup keeping the best-scored variant per group, grouped stock sum,
  re-sort, facet page.
- listing         = POST /v1/product-listing (app.py:154-439,
  pipelines.py:211-296): no search — $match filters + casts + sort +
  $facet page + distinct brand/category sidebar.

Response shapes mirror the reference (FIXTURES.md §shape): search ->
{total, data}; listing -> {count, rows, currentPage, numFound,
lastPage, filters}.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import pandas as pd

from ray.data import Dataset

from search_engine_ray.ops import relational as rel
from search_engine_ray.query.executor import FilterSpec, SearchEngine
from search_engine_ray.query.qast import plan_keyword


def keyword_search(
    engine: SearchEngine,
    keyword: str,
    *,
    text_field: str,
    prefix_fields: tuple[str, ...] = (),
    k: int = 10,
    skip: int = 0,
    filter_spec: FilterSpec | None = None,
    boosts: tuple = (),
    facet_fields: tuple[str, ...] = (),
    prune: bool = False,
) -> dict[str, Any]:
    """v1 search: {total, data} — one scored pass produces BOTH the
    match count and the page (R13 $facet semantics). prune=True opts
    into block-max pruning where eligible (total becomes a bound)."""
    q = plan_keyword(keyword, text_field=text_field, prefix_fields=prefix_fields)
    res = engine.search(
        q, k=k, skip=skip, filter_spec=filter_spec, boosts=boosts,
        facet_fields=facet_fields, prune=prune,
    )
    return {
        "total": res.total,
        "total_exact": res.total_exact,
        "data": res.hits,
        "facets": res.facets,
    }


def grouped_search(
    engine: SearchEngine,
    keyword: str,
    *,
    text_field: str,
    prefix_fields: tuple[str, ...] = (),
    group_col: str,
    sum_col: str | None = None,
    k: int = 10,
    skip: int = 0,
    filter_spec: FilterSpec | None = None,
) -> dict[str, Any]:
    """v2 grouped search (retail variant, pipelines.py:566-661):

        search_all -> group_best_with_aggs(group_col)
          (one fused shuffle: $sort-before-$group best-variant $first
           + $sum stock + variant count — no driver-side merge)
        -> materialize (one row per group, object store)
        -> count (total) + bounded top-k page

    The dedup honors score-desc/doc_id-asc order, reproducing the
    reference's "sort before $group so $first is the best variant".
    Nothing larger than the page ever reaches the driver: the reduced
    per-group set stays distributed for both the count and the top-k."""
    q = plan_keyword(keyword, text_field=text_field, prefix_fields=prefix_fields)
    attach = (group_col,) + ((sum_col,) if sum_col else ())
    scored = engine.search_all(q, filter_spec=filter_spec, attach_cols=attach)
    reduced = rel.group_best_with_aggs(
        scored,
        group_col,
        ["score", "doc_id"],
        descending=[True, False],
        sum_cols={"stock_sum": sum_col} if sum_col else None,
    )
    # one row per distinct group, in the OBJECT STORE (spills under
    # pressure) — two consumers below (count + page) share it
    reduced = reduced.materialize()
    total = int(reduced.count())
    page = (
        rel.paginate(reduced, ["score", "doc_id"], skip=skip, limit=k, descending=[True, False])
        .to_pandas()
        .reset_index(drop=True)
    )
    return {"total": total, "data": page}


def listing(
    ds: Dataset,
    *,
    conditions: Sequence[rel.Condition] = (),
    sort_keys: Sequence[str],
    descending: Sequence[bool] | bool = True,
    page: int = 1,
    per_page: int = 15,
    sidebar_cols: Sequence[str] = (),
) -> dict[str, Any]:
    """Listing endpoint: filter -> sort -> facet page + sidebar
    distinct values with counts (reference runs these as two queries,
    pipelines.py:211-296 + 427-432; we share the filtered stream)."""
    filtered = rel.filter_conditions(ds, conditions)
    skip = (page - 1) * per_page
    res = rel.facet_page(
        filtered, sort_keys, skip=skip, limit=per_page,
        descending=descending, facet_cols=sidebar_cols,
    )
    num_found = res["total"]
    return {
        "count": len(res["data"]),
        "rows": res["data"],
        "currentPage": page,
        "numFound": num_found,
        "lastPage": math.ceil(num_found / per_page) if per_page else 0,
        "filters": res["facets"],
    }
