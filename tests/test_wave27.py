"""Round-5 wave-27: RFM segmentation, A/B power analysis — oracle
parity at sf0.001 plus NTILE-semantics and closed-form checks."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
WAVE27 = ["r136_rfm", "r137_power"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "events"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE27)
def test_wave27_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_rfm_grid_partitions_customers(ray_session, con):
    out = entrymod.queries()["r136_rfm"](SF)
    n_cust = con.sql("SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert int(out["n_customers"].sum()) == n_cust
    assert set(out["r_score"]) <= set(range(1, 6))
    assert set(out["f_score"]) <= set(range(1, 6))
    # each r_score stratum holds an NTILE-sized share of customers
    per_r = out.groupby("r_score")["n_customers"].sum()
    base, extra = divmod(n_cust, 5)
    assert sorted(per_r.tolist(), reverse=True) == sorted(
        [base + (1 if i < extra else 0) for i in range(5)], reverse=True
    )


def test_power_formula_closed_form(ray_session, con):
    out = entrymod.queries()["r137_power"](SF)
    sd = float(out["sd"].iloc[0])
    delta = float(out["delta"].iloc[0])
    approx = 2 * (1.959964 + 0.841621) ** 2 * sd * sd / delta**2
    # rounded inputs reproduce n_per_arm to within rounding slack
    assert abs(int(out["n_per_arm"].iloc[0]) - approx) < max(2.0, 0.01 * approx)
