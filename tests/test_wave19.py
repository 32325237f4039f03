"""Round-5 wave-19: chi-square cell residuals, McNemar paired test,
DAU/WAU stickiness — oracle parity at sf0.001 plus closed-form
checks on constructed inputs."""

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
WAVE19 = ["r119_std_residuals", "r120_mcnemar", "r121_stickiness"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE19)
def test_wave19_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_residuals_square_to_chi2(ray_session, con):
    # sum of squared Pearson residuals == the r91/r104 chi-square.
    res = entrymod.queries()["r119_std_residuals"](SF)
    cv = entrymod.queries()["r104_cramers_v"](SF)
    # recompute unrounded residuals can't be recovered from 4dp; use
    # a loose tolerance scaled by cell count
    chi2_from_res = float((res["residual"].to_numpy() ** 2).sum())
    assert abs(chi2_from_res - float(cv["chi2"].iloc[0])) < 0.05 * len(res)


def _write_events(tmp_path, rows):
    ts = pa.array([r[2] * 86400000000 for r in rows], pa.int64()).cast(pa.timestamp("us"))
    pa_tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": ts,
    })
    import pyarrow.parquet as pq

    pq.write_table(pa_tbl, str(tmp_path / "events.parquet"))


def test_mcnemar_counts_discordant_pairs(ray_session, tmp_path):
    # days 0..9 (mid=4): users 1,2 click only early (b), user 3 only
    # late (c), user 4 both, user 5 never clicks.
    rows = [
        (1, "click", 1), (2, "click", 2),
        (3, "click", 8),
        (4, "click", 0), (4, "click", 9),
        (5, "view", 0), (5, "view", 9),
        (1, "view", 9), (2, "view", 8), (3, "view", 1),
    ]
    _write_events(tmp_path, rows)
    out = entrymod.queries()["r120_mcnemar"](str(tmp_path))
    assert int(out["n_users"].iloc[0]) == 5
    assert int(out["b"].iloc[0]) == 2
    assert int(out["c"].iloc[0]) == 1
    assert float(out["chi2"].iloc[0]) == pytest.approx(1.0 / 3.0, abs=1e-4)


def test_stickiness_all_users_every_day_is_one(ray_session, tmp_path):
    rows = [(u, "view", d) for u in range(3) for d in range(5)]
    _write_events(tmp_path, rows)
    out = entrymod.queries()["r121_stickiness"](str(tmp_path))
    assert (out["stickiness"] == 1.0).all()
    assert (out["dau"] == 3).all() and (out["wau"] == 3).all()
