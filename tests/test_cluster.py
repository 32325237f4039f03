"""Tests for the cluster-facing knobs (search_engine_ray/cluster.py)."""

import numpy as np
import pytest

from search_engine_ray import cluster


def test_spread_remote_args_default_and_optout(monkeypatch):
    assert cluster.spread_remote_args() == {"scheduling_strategy": "SPREAD"}
    assert cluster.spread_remote_args(num_cpus=2) == {
        "scheduling_strategy": "SPREAD", "num_cpus": 2,
    }
    monkeypatch.setenv("SER_NO_SPREAD", "1")
    assert cluster.spread_remote_args() == {}
    assert cluster.spread_remote_args(num_cpus=2) == {"num_cpus": 2}


def test_derive_block_size_bounds(ray_session):
    v = cluster.derive_target_max_block_size()
    assert (16 << 20) <= v <= (128 << 20)
    # formula sanity on the live session: never exceeds
    # store * headroom / cpus by more than the floor clamp
    import ray

    nodes = [n for n in ray.nodes() if n.get("Alive")]
    store = min(int(n["Resources"].get("object_store_memory", 0)) for n in nodes)
    cpus = max(1, min(int(n["Resources"].get("CPU", 1)) for n in nodes))
    if store:
        raw = store * 0.25 / cpus
        assert v <= max(16 << 20, min(128 << 20, int(raw)))


def test_derive_block_size_uninitialized(monkeypatch):
    import ray

    monkeypatch.setattr(ray, "is_initialized", lambda: False)
    assert cluster.derive_target_max_block_size() == (128 << 20)


def test_apply_narrows_only(ray_session, monkeypatch):
    from ray.data import DataContext

    ctx = DataContext.get_current()
    orig = ctx.target_max_block_size
    try:
        # operator pinned a SMALLER value: apply must keep it
        ctx.target_max_block_size = 8 << 20
        eff = cluster.apply_cluster_data_context()
        assert ctx.target_max_block_size == 8 << 20
        assert eff == 8 << 20
        # operator pinned a huge value: apply narrows to the derivation
        ctx.target_max_block_size = 4 << 30
        eff = cluster.apply_cluster_data_context()
        assert ctx.target_max_block_size <= (128 << 20)
        assert eff == ctx.target_max_block_size
    finally:
        ctx.target_max_block_size = orig
