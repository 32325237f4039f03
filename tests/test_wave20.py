"""Round-5 wave-20: bucketed co-located join, PSI drift, conditional
entropy — oracle parity at sf0.001 plus semantic checks."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
WAVE20 = ["e32_bucketed_join", "r122_psi_drift", "r123_cond_entropy"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "lineitem", "events"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE20)
def test_wave20_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_psi_zero_for_identical_halves(ray_session, tmp_path):
    # identical value distributions in both halves -> PSI ~ 0 (only
    # the smoothing term's count asymmetry could perturb it; counts
    # here are equal so PSI is exactly 0).
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = np.tile(np.arange(10, dtype=np.float64), 10)
    days = np.concatenate([np.zeros(50, np.int64), np.full(50, 9, np.int64)])
    ts = pa.array(days * 86400000000, pa.int64()).cast(pa.timestamp("us"))
    pq.write_table(
        pa.table({"ts": ts, "value": pa.array(vals)}), str(tmp_path / "events.parquet")
    )
    out = entrymod.queries()["r122_psi_drift"](str(tmp_path))
    assert float(out["psi"].iloc[0]) == 0.0


def test_cond_entropy_information_inequalities(ray_session):
    # 0 <= H(next|cur) <= H(next); MI >= 0.
    out = entrymod.queries()["r123_cond_entropy"](SF)
    hc = float(out["h_cond"].iloc[0])
    hn = float(out["h_next"].iloc[0])
    mi = float(out["mutual_info"].iloc[0])
    assert 0.0 <= hc <= hn + 1e-9
    assert mi >= -1e-9


def test_bucketed_join_matches_tpch_style_join(ray_session, con):
    out = entrymod.queries()["e32_bucketed_join"](SF)
    exp = con.sql(
        "SELECT o.o_orderstatus, count(*) AS n FROM lineitem l "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey GROUP BY 1 ORDER BY 1"
    ).df()
    assert list(out["n"]) == list(exp["n"].astype("int64"))
