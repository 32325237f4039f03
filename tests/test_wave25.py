"""Round-5 wave-25: odds ratio / relative risk, SCD2 point-in-time
lookup, Lorenz deciles — oracle parity at sf0.001 plus constructed
checks."""

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
WAVE25 = ["r133_odds_ratio", "e34_scd2", "r134_lorenz"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "orders"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE25)
def test_wave25_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_odds_ratio_cells_partition_users(ray_session, con):
    out = entrymod.queries()["r133_odds_ratio"](SF)
    n_users = con.sql("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    cells = int(out[["a", "b", "c", "d"]].sum(axis=1).iloc[0])
    assert cells == n_users
    assert float(out["or_ci_lo"].iloc[0]) <= float(out["odds_ratio"].iloc[0]) <= float(
        out["or_ci_hi"].iloc[0]
    )


def test_scd2_active_version_per_customer(ray_session, con):
    # exactly one active version per customer whose FIRST order
    # precedes the as-of date.
    out = entrymod.queries()["e34_scd2"](SF)
    exp = con.sql(
        "SELECT count(*) FROM (SELECT o_custkey, min(o_orderdate) AS f "
        "FROM orders GROUP BY 1) WHERE f <= TIMESTAMP '1998-06-01 00:00:00'"
    ).fetchone()[0]
    assert int(out["n_customers"].sum()) == exp


def test_lorenz_monotone_convex_ends_at_one(ray_session):
    out = entrymod.queries()["r134_lorenz"](SF)
    cs = out.sort_values("decile")["cum_share"].to_numpy()
    assert (np.diff(cs) >= 0).all()
    assert cs[-1] == pytest.approx(1.0, abs=1e-9)
    # convexity (increasing increments) holds for sorted-ascending data
    inc = np.diff(np.concatenate([[0.0], cs]))
    assert (np.diff(inc) >= -1e-9).all()
