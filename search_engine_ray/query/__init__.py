from search_engine_ray.query.qast import (  # noqa: F401
    Compound,
    BestFields,
    CrossFields,
    Fuzzy,
    MatchAll,
    NumericRange,
    Phonetic,
    Prefix,
    Regexp,
    Synonyms,
    Term,
    Wildcard,
    plan_keyword,
)
from search_engine_ray.query.executor import (  # noqa: F401
    ConditionalAddBoost,
    NegativeBoost,
    DecayBoost,
    DistanceFeatureBoost,
    DocAttrBoost,
    FieldValueBoost,
    RankFeatureBoost,
    FilterSpec,
    SearchEngine,
    SearchResult,
)
from search_engine_ray.query.federated import FederatedEngine  # noqa: F401
from search_engine_ray.query.phrase import (  # noqa: F401
    phrase_postings,
    phrase_search,
    phrase_search_all,
)
