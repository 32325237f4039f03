"""Round-5 wave-14 entries: PACF lag-2, Grubbs, MAD outliers,
rescaled range — oracle parity at sf0.001 plus closed-form checks."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
WAVE14 = ["r112_pacf", "r113_grubbs", "r114_mad_outliers", "r115_rescaled_range"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE14)
def test_wave14_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def _write_daily(tmp_path, values):
    import pyarrow as pa
    import pyarrow.parquet as pq

    days = np.arange(len(values), dtype=np.int64)
    ts = pa.array(days * 86400000000, pa.int64()).cast(pa.timestamp("us"))
    pq.write_table(
        pa.table({"ts": ts, "value": pa.array(np.asarray(values, np.float64))}),
        str(tmp_path / "events.parquet"),
    )


def test_pacf_ar1_series_has_small_pacf2(ray_session, tmp_path):
    # an AR(1) walk has pacf2 ~ 0 (that is the AR-order cutoff the
    # statistic exists to detect); build one deterministically.
    rng = np.random.default_rng(9)
    x = np.zeros(60)
    e = rng.normal(0, 1, 60)
    for i in range(1, 60):
        x[i] = 0.8 * x[i - 1] + e[i]
    _write_daily(tmp_path, 100 + x)
    out = entrymod.queries()["r112_pacf"](str(tmp_path))
    assert abs(float(out["pacf2"].iloc[0])) < 0.35 < float(out["pacf1"].iloc[0])


def test_grubbs_flags_planted_spike(ray_session, tmp_path):
    v = np.full(30, 50.0)
    v[1::2] = 52.0  # benign alternation so sd > 0
    v[17] = 500.0
    _write_daily(tmp_path, v)
    out = entrymod.queries()["r113_grubbs"](str(tmp_path))
    assert int(out["day_flagged"].iloc[0]) == 17
    assert float(out["g_stat"].iloc[0]) > 5.0


def test_mad_robust_to_planted_spikes(ray_session, tmp_path):
    v = np.concatenate([np.tile([10.0, 11.0, 12.0, 13.0], 10), [1000.0, -900.0]])
    _write_daily(tmp_path, v)
    out = entrymod.queries()["r114_mad_outliers"](str(tmp_path))
    assert int(out["n_outliers"].iloc[0]) == 2
    assert 10.0 <= float(out["med"].iloc[0]) <= 13.0


def test_rescaled_range_trend_vs_noise(ray_session, tmp_path):
    # a strong linear trend accumulates deviation mass: R/S for a
    # trend is far larger than for an alternating (anti-persistent)
    # series of the same length.
    n = 40
    _write_daily(tmp_path, np.arange(n, dtype=float))
    trend = float(entrymod.queries()["r115_rescaled_range"](str(tmp_path))["rescaled_range"].iloc[0])
    import shutil

    shutil.rmtree(tmp_path / "events.parquet", ignore_errors=True)
    os.remove(tmp_path / "events.parquet")
    _write_daily(tmp_path, np.where(np.arange(n) % 2 == 0, 1.0, -1.0))
    alt = float(entrymod.queries()["r115_rescaled_range"](str(tmp_path))["rescaled_range"].iloc[0])
    assert trend > 2 * alt > 0
