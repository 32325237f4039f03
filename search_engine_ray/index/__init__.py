from search_engine_ray.index.build import (  # noqa: F401
    build_index,
    build_index_resumable,
    upsert_documents,
)
from search_engine_ray.index.fsck import integrity_check  # noqa: F401
from search_engine_ray.index.merge import merge_indexes  # noqa: F401
from search_engine_ray.index.positions import build_positions  # noqa: F401
