"""Contract tests for the `_SafeJoinAgg` private-API patch (VERDICT r04 #5).

Ray 2.49's hash-shuffle `Dataset.join` crashes when a hash partition
receives zero rows from one side; `ops/relational.py` patches the
private `JoinOperator` to fix it. That pins the repo to an internal
API that can move in any Ray minor — these tests make an upgrade fail
LOUDLY (test 1) while production stays CORRECT through the broadcast
fallback (test 2), instead of silently shipping broken joins.
"""

import warnings

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import search_engine_ray.ops.relational as rel

ALL_TYPES = [
    "inner", "left_outer", "right_outer", "full_outer",
    "left_semi", "right_semi", "left_anti", "right_anti",
]


def test_safe_join_patch_attached():
    """The import contract: if Ray's private join layout moved, this
    fails loudly — re-pin _SafeJoinAgg against the new layout (or
    verify upstream fixed the empty-partition bug and drop the patch).
    Until then hash_join serves the degraded broadcast fallback."""
    import ray

    assert rel.SAFE_JOIN_PATCHED, (
        f"_SafeJoinAgg could not attach to Ray {ray.__version__}'s "
        "private join internals (ray.data._internal.execution.operators"
        ".join). hash_join is running the degraded broadcast fallback; "
        "re-pin the patch for the shuffle path."
    )


def _pdf(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("how", ALL_TYPES)
def test_fallback_matches_native(ray_session, how):
    """With the patch flag forced off, hash_join must produce the same
    rows AND the same column names/order as the native shuffle path,
    for every join type — the 'degraded but correct' guarantee."""
    import ray.data as rd

    def mk():
        left = rd.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 5, 5], pa.int64()),
            "a": ["x", "y", "z", "p", "q"],
        }))
        right = rd.from_arrow(pa.table({
            "rk": pa.array([2, 3, 4, 5], pa.int64()),
            "b": pa.array([20, 30, 40, 50], pa.int64()),
        }))
        return left, right

    l1, r1 = mk()
    native = _pdf(rel.hash_join(l1, r1, on=["k"], right_on=["rk"], how=how))

    l2, r2 = mk()
    orig = rel.SAFE_JOIN_PATCHED
    rel.SAFE_JOIN_PATCHED = False
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            fb = _pdf(rel.hash_join(l2, r2, on=["k"], right_on=["rk"], how=how))
    finally:
        rel.SAFE_JOIN_PATCHED = orig

    assert list(fb.columns) == list(native.columns), (how, list(fb.columns))
    pd.testing.assert_frame_equal(fb, native, check_dtype=False)


def test_fallback_warns_and_handles_empty_side(ray_session):
    """The fallback warns (loud degradation) and survives the exact
    scenario the patch exists for: one side empty after a filter."""
    import ray.data as rd

    left = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "a": pa.array([], pa.string())
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, 2], pa.int64()), "b": pa.array([10, 20], pa.int64())
    }))
    orig = rel.SAFE_JOIN_PATCHED
    rel.SAFE_JOIN_PATCHED = False
    try:
        with pytest.warns(RuntimeWarning, match="fallback"):
            out = rel.hash_join(
                left, right, on=["k"], right_on=["rk"], how="full_outer"
            ).to_pandas()
    finally:
        rel.SAFE_JOIN_PATCHED = orig
    assert list(out.columns) == ["k", "a", "b"]
    assert sorted(out["b"].tolist()) == [10, 20]
    assert out["a"].isna().all() and sorted(out["k"].tolist()) == [1, 2]
