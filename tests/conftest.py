import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    """200-doc deterministic corpus table (FIXTURES.md F1 'tiny')."""
    from search_engine_ray.corpus import corpus_table

    return corpus_table(200, seed=42)


@pytest.fixture(scope="session")
def tiny_index(ray_session, tiny_corpus, tmp_path_factory):
    """Index built once per session over the tiny corpus."""
    import ray.data as rd

    from search_engine_ray.config import IndexConfig
    from search_engine_ray.index import build_index

    out = str(tmp_path_factory.mktemp("idx") / "tiny")
    cfg = IndexConfig(num_buckets=4, num_parts=4)
    stats = build_index(rd.from_arrow(tiny_corpus), out, cfg)
    return out, cfg, stats
