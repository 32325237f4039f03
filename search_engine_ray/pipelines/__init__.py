"""End-to-end pipelines mirroring the reference's entry points
(SURVEY.md §3): keyword search, grouped search, filtered listing."""

from search_engine_ray.pipelines.curation import curate
from search_engine_ray.pipelines.hybrid import hybrid_search, rrf_fuse  # noqa: F401
from search_engine_ray.pipelines.product_search import (
    grouped_search,
    keyword_search,
    listing,
)
from search_engine_ray.pipelines.rescore import rescore_search  # noqa: F401

__all__ = ["keyword_search", "grouped_search", "listing", "curate"]
