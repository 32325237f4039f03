"""Round-5 wave-23: skyline operator, embedding covariance matrix,
Benford second digit — oracle parity at sf0.001 plus dominance /
algebra checks."""

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
WAVE23 = ["r129_skyline", "r130_embed_cov", "r131_benford2"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["part", "embeddings", "lineitem"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE23)
def test_wave23_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_skyline_dominance_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(17)
    n = 300
    price = rng.integers(1, 50, n).astype(np.float64)
    size = rng.integers(1, 50, n).astype(np.int64)
    # plant an exact tie pair on the frontier
    price[0] = price[1] = 0.5
    size[0] = size[1] = 60
    pq.write_table(
        pa.table({
            "p_partkey": pa.array(np.arange(n), pa.int64()),
            "p_retailprice": pa.array(price, pa.float64()),
            "p_size": pa.array(size, pa.int64()),
        }),
        str(tmp_path / "part.parquet"),
    )
    out = entrymod.queries()["r129_skyline"](str(tmp_path))
    got = set(out["p_partkey"])
    exp = set()
    for i in range(n):
        dominated = any(
            price[j] <= price[i] and size[j] >= size[i]
            and (price[j] < price[i] or size[j] > size[i])
            for j in range(n)
        )
        if not dominated:
            exp.add(i)
    assert got == exp
    assert {0, 1} <= got  # tie pair co-survives


def test_embed_cov_psd_and_diag(ray_session):
    out = entrymod.queries()["r130_embed_cov"](SF)
    # diagonal entries are variances: non-negative
    diag = out[out["i"] == out["j"]]["cov"].to_numpy()
    assert (diag >= -1e-9).all()
    # reconstruct symmetric matrix, check top eigenvalue positive
    dim = int(out["i"].max()) + 1
    m = np.zeros((dim, dim))
    for _, r in out.iterrows():
        m[int(r["i"]), int(r["j"])] = r["cov"]
        m[int(r["j"]), int(r["i"])] = r["cov"]
    w = np.linalg.eigvalsh(m)
    assert w[-1] > 0 and w[0] > -1e-3


def test_benford2_fracs_sum_to_one(ray_session):
    out = entrymod.queries()["r131_benford2"](SF)
    assert len(out) == 10
    assert float(out["obs_frac"].sum()) == pytest.approx(1.0, abs=2e-3)
    assert float(out["exp_frac"].sum()) == pytest.approx(1.0, abs=2e-3)
    # expected second-digit distribution is mildly decreasing
    e = out.sort_values("digit")["exp_frac"].to_numpy()
    assert (np.diff(e) <= 0).all()
