"""Round-5 wave-32: column profile, equal-frequency bins — oracle
parity at sf0.001 plus semantic checks."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
WAVE32 = ["e37_profile", "r146_equal_freq_bins"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "lineitem"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE32)
def test_wave32_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_profile_known_cardinalities(ray_session, con):
    out = entrymod.queries()["e37_profile"](SF).set_index("col")
    assert (out["n_nulls"] == 0).all()
    n_status = con.sql("SELECT count(DISTINCT o_orderstatus) FROM orders").fetchone()[0]
    assert int(out.loc["o_orderstatus", "n_distinct"]) == n_status


def test_equal_freq_bins_are_balanced_and_monotone(ray_session):
    out = entrymod.queries()["r146_equal_freq_bins"](SF).sort_values("bin")
    n = out["n"].to_numpy()
    assert len(out) == 5
    # equal-frequency: every bin within 25% of the mean bucket size
    assert n.max() <= 1.25 * n.mean() and n.min() >= 0.75 * n.mean()
    # bin means strictly increase (the column is being ranked)
    m = out["mean_price"].to_numpy()
    assert (np.diff(m) > 0).all()
