"""Round-5 wave-29: seasonal-naive backtest, temperature curve, ABC
analysis — oracle parity at sf0.001 plus closed-form checks."""

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
WAVE29 = ["r139_snaive_mape", "t_temp_curve", "r140_abc"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "documents", "lineitem"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE29)
def test_wave29_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_snaive_perfect_on_weekly_periodic(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # exact 7-day periodic series: the seasonal-naive forecast is
    # perfect, MAPE = SMAPE = 0.
    v = np.tile([10.0, 20, 30, 40, 50, 60, 70], 5)
    ts = pa.array(np.arange(35) * 86400000000, pa.int64()).cast(pa.timestamp("us"))
    pq.write_table(pa.table({"ts": ts, "value": pa.array(v)}),
                   str(tmp_path / "events.parquet"))
    out = entrymod.queries()["r139_snaive_mape"](str(tmp_path))
    assert float(out["mape"].iloc[0]) == 0.0
    assert float(out["smape"].iloc[0]) == 0.0
    assert int(out["n_scored"].iloc[0]) == 14


def test_temp_curve_tau1_identity_and_flattening(ray_session):
    out = entrymod.queries()["t_temp_curve"](SF)
    t1 = out[out["tau"] == 1.0]
    assert np.allclose(t1["p"].to_numpy(), t1["w"].to_numpy(), atol=2e-4)
    # tau < 1 flattens: max weight shrinks, min weight grows
    for tau in (0.3, 0.7):
        tt = out[out["tau"] == tau]
        assert tt["w"].max() <= t1["w"].max() + 1e-9
        assert tt["w"].min() >= t1["w"].min() - 1e-9
    # weights sum to 1 per tau
    for tau, grp in out.groupby("tau"):
        assert float(grp["w"].sum()) == pytest.approx(1.0, abs=2e-3)


def test_abc_shares_and_partition(ray_session, con):
    out = entrymod.queries()["r140_abc"](SF).set_index("cls")
    n_parts = con.sql(
        "SELECT count(DISTINCT l_partkey) FROM lineitem"
    ).fetchone()[0]
    assert int(out["n_parts"].sum()) == n_parts
    assert float(out["rev_share"].sum()) == pytest.approx(1.0, abs=2e-3)
    if "A" in out.index:
        assert float(out.loc["A", "rev_share"]) <= 0.80 + 1e-6
