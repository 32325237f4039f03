"""Round-5 wave-17: F2/self-join-size sketch estimate, embedding
label cohesion, CDC merge — oracle parity at sf0.001 plus semantic
checks."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
WAVE17 = ["r117_selfjoin_size", "ann_label_cohesion", "e29_cdc_merge"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "embeddings", "orders"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE17)
def test_wave17_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_f2_estimate_upper_bounds_exact(ray_session):
    # the CM inner-product estimate is one-sided: est >= exact always.
    out = entrymod.queries()["r117_selfjoin_size"](SF)
    assert int(out["f2_est"].iloc[0]) >= int(out["f2_exact"].iloc[0])


def test_cohesion_bounded_and_sane(ray_session):
    out = entrymod.queries()["ann_label_cohesion"](SF)
    v = out["cohesion"].to_numpy(np.float64)
    assert ((v >= -1.0001) & (v <= 1.0001)).all()
    assert int(out["n"].sum()) > 0


def test_cdc_merge_counts(ray_session, con):
    # the merged state must contain exactly the non-deleted keys.
    out = entrymod.queries()["e29_cdc_merge"](SF)
    exp_n = con.sql(
        "SELECT count(*) FROM orders WHERE o_orderkey % 7 <> 0"
    ).fetchone()[0]
    assert int(out["n"].sum()) == exp_n
