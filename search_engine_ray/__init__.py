"""search_engine_ray — a Ray-Data-native full-text search + data-processing engine.

Brand-new implementation (NOT a port) of the query / data-processing
capabilities of the reference `avadheshy/search-engine` (see SURVEY.md):
an inverted-index build + BM25 query engine over Parquet tables of
source-code repositories, plus the reference's relational operator ring
(filters, projections, joins, group-dedup, facets, sort/paginate) and
the training-data operations a 100 TB pipeline needs (dedup, ANN,
text analysis, multimodal plumbing).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines,
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, explicit partitioning for every shuffle.
"""

__version__ = "0.1.0"
