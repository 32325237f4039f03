from search_engine_ray.query.qast import (  # noqa: F401
    Compound,
    Phonetic,
    Prefix,
    Term,
    plan_keyword,
)
from search_engine_ray.query.executor import (  # noqa: F401
    ConditionalAddBoost,
    DocAttrBoost,
    FilterSpec,
    SearchEngine,
    SearchResult,
)
