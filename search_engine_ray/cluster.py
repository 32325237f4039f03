"""Cluster-facing knobs (VERDICT r04 #7): the pieces that cost nothing
on a single node but matter on a 256-node cluster.

Everything here is advisory plumbing over public Ray APIs:

- ``spread_remote_args()``: ``scheduling_strategy="SPREAD"`` for build
  stages, so ingest/tokenize actors and merge tasks spread across
  nodes instead of packing the head node (Ray's default packing is
  right for locality-sensitive small tasks, wrong for
  bandwidth-saturating build stages — the measured single-host merge
  ceiling in BASELINE.md is exactly the contention SPREAD avoids
  between nodes).
- ``derive_target_max_block_size()``: size Dataset blocks from the
  cluster's object store so (block x concurrent tasks per node) never
  forces plasma spills mid-build.
- ``apply_cluster_data_context()``: installs the derived block size on
  the ambient ``DataContext`` (narrowing only — never widens a value
  the operator pinned).

See CLUSTER.md for the operator -> knob map.
"""

from __future__ import annotations

import os

_DEFAULT_BLOCK = 128 << 20  # Ray Data's default target block size


def spread_remote_args(**extra) -> dict:
    """ray_remote_args for bandwidth-heavy build stages: SPREAD the
    tasks/actors across nodes. On a single node this is a no-op for
    placement (and measured-neutral for wall time); on a cluster it
    stops the ingest actor pool and the merge tasks from packing one
    node while its neighbors idle. ``SER_NO_SPREAD=1`` opts out."""
    if os.environ.get("SER_NO_SPREAD"):
        return dict(extra)
    return {"scheduling_strategy": "SPREAD", **extra}


def derive_target_max_block_size(
    headroom: float = 0.25, floor: int = 16 << 20, ceiling: int = _DEFAULT_BLOCK
) -> int:
    """Object-store-aware Dataset block size.

    A streaming pipeline holds roughly (cpus-per-node x a few) blocks
    of operator output in plasma per node; when (block x concurrent
    tasks) approaches the store, Ray spills to disk and the build
    becomes IO-bound. Derive the largest block size that keeps one
    full wave of per-cpu outputs under ``headroom`` of the per-node
    object store:

        block <= object_store_per_node * headroom / cpus_per_node

    clamped to [floor, ceiling] (the Ray default 128 MiB is already
    right for big stores; tiny stores — or fat multi-GB-per-node
    actor fleets — need smaller blocks, not bigger). Returns the
    ceiling when Ray isn't initialised (nothing to measure)."""
    try:
        import ray

        if not ray.is_initialized():
            return ceiling
        nodes = [n for n in ray.nodes() if n.get("Alive")]
        if not nodes:
            return ceiling
        per_node_store = min(
            int(n["Resources"].get("object_store_memory", 0)) or (1 << 62)
            for n in nodes
        )
        per_node_cpus = max(
            1, min(int(n["Resources"].get("CPU", 1)) or 1 for n in nodes)
        )
    except Exception:
        return ceiling
    if per_node_store >= (1 << 62):  # store size not reported
        return ceiling
    derived = int(per_node_store * headroom / per_node_cpus)
    return max(floor, min(ceiling, derived))


def apply_cluster_data_context() -> int:
    """Install the derived block size on the ambient DataContext —
    NARROWING only: an operator who pinned a smaller
    ``target_max_block_size`` keeps it. Returns the effective value.
    Call at the top of a build; idempotent."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    derived = derive_target_max_block_size()
    current = getattr(ctx, "target_max_block_size", _DEFAULT_BLOCK) or _DEFAULT_BLOCK
    if derived < current:
        ctx.target_max_block_size = derived
    return min(derived, current)
