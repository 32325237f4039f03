"""Round-5 wave-31: effective sample size, Markov power iteration —
oracle parity at sf0.001 plus closed-form checks."""

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
WAVE31 = ["r144_ess", "r145_markov_power"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "events"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE31)
def test_wave31_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_ess_bounds(ray_session):
    # 1 <= ESS <= n, efficiency in (0, 1]; equal weights give ESS = n.
    out = entrymod.queries()["r144_ess"](SF)
    assert (out["ess"].to_numpy() <= out["n_docs"].to_numpy() + 1e-6).all()
    assert (out["ess"].to_numpy() >= 1.0 - 1e-6).all()
    assert ((out["efficiency"] > 0) & (out["efficiency"] <= 1.0 + 1e-9)).all()


def test_markov_power_is_distribution_and_near_stationary(ray_session):
    out = entrymod.queries()["r145_markov_power"](SF)
    v = out["pi16"].to_numpy(np.float64)
    assert float(v.sum()) == pytest.approx(1.0, abs=2e-3)
    assert (v > 0).all()
    # applying many more steps should barely move it (rough check via
    # re-deriving the transition matrix from r83's output)
    tm = entrymod.queries()["r83_transitions"](SF)
    types = sorted(set(tm["from_type"]) | set(tm["to_type"]))
    k = len(types)
    idx = {t: i for i, t in enumerate(types)}
    p = np.zeros((k, k))
    for _, r in tm.iterrows():
        p[idx[r["from_type"]], idx[r["to_type"]]] = r["prob"]
    v256 = np.full(k, 1.0 / k) @ np.linalg.matrix_power(p, 256)
    assert np.abs(v - v256).max() < 0.02
