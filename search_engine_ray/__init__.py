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


def __getattr__(name):
    # lazy top-level API (keeps `import search_engine_ray` free of Ray)
    if name in ("IndexConfig", "FieldSpec", "DOCUMENTS_CONFIG"):
        import search_engine_ray.config as m

        return getattr(m, name)
    if name in ("build_index", "build_index_resumable"):
        import search_engine_ray.index as m

        return getattr(m, name)
    if name in ("SearchEngine", "Compound", "Term", "Prefix", "Phonetic", "plan_keyword",
                "FilterSpec", "ConditionalAddBoost", "DocAttrBoost"):
        import search_engine_ray.query as m

        return getattr(m, name)
    raise AttributeError(name)
