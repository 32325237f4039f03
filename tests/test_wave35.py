"""Round-5 wave-35: turning points, partial correlation, robust
shape — oracle parity at sf0.001 plus closed-form checks."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
WAVE35 = ["r153_turning_points", "r154_partial_corr", "r155_robust_shape"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE35)
def test_wave35_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def _write_daily(tmp_path, values):
    import pyarrow.parquet as pq

    days = np.arange(len(values), dtype=np.int64)
    ts = pa.array(days * 86400000000, pa.int64()).cast(pa.timestamp("us"))
    pq.write_table(
        pa.table({"ts": ts, "value": pa.array(np.asarray(values, np.float64))}),
        str(tmp_path / "events.parquet"),
    )


def test_turning_points_alternating_max(ray_session, tmp_path):
    # a perfectly alternating series turns at EVERY interior point.
    n = 21
    _write_daily(tmp_path, np.where(np.arange(n) % 2 == 0, 1.0, 2.0))
    out = entrymod.queries()["r153_turning_points"](str(tmp_path))
    assert int(out["turning_points"].iloc[0]) == n - 2
    assert float(out["z"].iloc[0]) > 2.0


def test_turning_points_monotone_zero(ray_session, tmp_path):
    _write_daily(tmp_path, np.arange(25, dtype=float))
    out = entrymod.queries()["r153_turning_points"](str(tmp_path))
    assert int(out["turning_points"].iloc[0]) == 0
    assert float(out["z"].iloc[0]) < -2.0


def test_robust_shape_symmetric_uniformish(ray_session, tmp_path):
    # a symmetric triangular-ish sequence has Bowley skew ~ 0.
    v = np.concatenate([np.arange(1, 16), np.arange(14, 0, -1)]).astype(float) + 100
    _write_daily(tmp_path, v)
    out = entrymod.queries()["r155_robust_shape"](str(tmp_path))
    assert abs(float(out["bowley_skew"].iloc[0])) < 0.2
    assert float(out["qcd"].iloc[0]) > 0


def test_partial_corr_in_range(ray_session):
    out = entrymod.queries()["r154_partial_corr"](SF)
    assert -1.0 - 1e-9 <= float(out["partial_r"].iloc[0]) <= 1.0 + 1e-9
