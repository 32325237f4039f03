"""Round-5 wave-12 entries: Kendall tau-b, lagged cross-correlation,
Durbin-Watson — oracle parity at sf0.001 plus closed-form sanity
checks on constructed series."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
WAVE12 = ["r108_kendall_tau", "r109_cross_corr", "r110_durbin_watson"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE12)
def test_wave12_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def _write_events(tmp_path, days, values):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pa.array((np.asarray(days, np.int64) * 86400000000), pa.int64()).cast(
        pa.timestamp("us")
    )
    pq.write_table(
        pa.table({"ts": ts, "value": pa.array(np.asarray(values, np.float64))}),
        str(tmp_path / "events.parquet"),
    )


def test_kendall_tau_perfect_monotone(ray_session, tmp_path):
    # one event per day with strictly increasing values: every pair is
    # concordant in (count=1 ties -> x all tied!) — so use 2 events on
    # later days to break count ties and keep monotone agreement.
    days = [0, 1, 1, 2, 2, 2, 3, 3, 3, 3]
    vals = [1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 4.0, 4.0, 4.0, 4.0]
    _write_events(tmp_path, days, vals)
    out = entrymod.queries()["r108_kendall_tau"](str(tmp_path))
    # daily x = [1,2,3,4], y = [1,4,9,16]: perfectly concordant
    assert int(out["concordant"].iloc[0]) == 6
    assert int(out["discordant"].iloc[0]) == 0
    assert float(out["tau_b"].iloc[0]) == 1.0


def test_cross_corr_lag_identity(ray_session, tmp_path):
    # y_t proportional to x_{t-2}: the lag-2 CCF must be exactly 1.
    rng = np.random.default_rng(3)
    base = rng.integers(1, 6, 12)  # events per day, day 0..11
    days, vals = [], []
    for d, k in enumerate(base):
        for _ in range(k):
            days.append(d)
            # per-event value = count of events two days earlier / k
            prev = base[d - 2] if d >= 2 else 1
            vals.append(float(prev) / k)
    _write_events(tmp_path, days, vals)
    out = entrymod.queries()["r109_cross_corr"](str(tmp_path))
    r2 = float(out.loc[out["lag"] == 2, "r"].iloc[0])
    assert r2 == 1.0


def test_durbin_watson_alternating_residuals(ray_session, tmp_path):
    # perfectly alternating values around a flat level over an ODD
    # number of days (odd keeps the alternation orthogonal to the
    # linear trend, so slope = 0 exactly): residuals are
    # e_even = 10/11, e_odd = -12/11, giving DW = 40/(1320/121) = 11/3.
    n = 11
    days = list(range(n))
    vals = [100.0 + (1.0 if i % 2 == 0 else -1.0) for i in range(n)]
    _write_events(tmp_path, days, vals)
    out = entrymod.queries()["r110_durbin_watson"](str(tmp_path))
    assert float(out["slope"].iloc[0]) == pytest.approx(0.0, abs=1e-12)
    assert float(out["dw"].iloc[0]) == pytest.approx(11.0 / 3.0, abs=1e-3)
