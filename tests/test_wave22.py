"""Round-5 wave-22: Kaplan-Meier survival, CUPED variance reduction,
Hill tail index — oracle parity at sf0.001 plus closed-form checks."""

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
WAVE22 = ["r126_kaplan_meier", "r127_cuped", "r128_hill_tail"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE22)
def test_wave22_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def _write_events(tmp_path, rows):
    # rows: (user, day, value)
    ts = pa.array([r[1] * 86400000000 for r in rows], pa.int64()).cast(pa.timestamp("us"))
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "ts": ts,
            "value": pa.array([float(r[2]) for r in rows], pa.float64()),
        }),
        str(tmp_path / "events.parquet"),
    )


def test_kaplan_meier_hand_computed(ray_session, tmp_path):
    # max day = 20. Users (first, last): A (0,0) churn t=0; B (0,5)
    # churn t=5; C (0,13) churn t=13; D (0,20) censored t=20;
    # E (10,20) censored t=10.
    rows = [(1, 0, 1), (2, 0, 1), (2, 5, 1), (3, 0, 1), (3, 13, 1),
            (4, 0, 1), (4, 20, 1), (5, 10, 1), (5, 20, 1)]
    _write_events(tmp_path, rows)
    out = entrymod.queries()["r126_kaplan_meier"](str(tmp_path)).set_index("t")
    # t=0: n_risk=5 (all t>=0), d=1 -> S=0.8
    assert int(out.loc[0, "n_risk"]) == 5
    assert float(out.loc[0, "surv"]) == pytest.approx(0.8)
    # t=5: n_risk = users with t>=5 -> B(5),C(13),D(20),E(10) = 4 -> S=0.8*0.75=0.6
    assert float(out.loc[5, "surv"]) == pytest.approx(0.6)
    # t=13: n_risk = C(13), D(20) = 2 -> S = 0.6*0.5 = 0.3
    assert float(out.loc[13, "surv"]) == pytest.approx(0.3)


def test_cuped_perfect_covariate_kills_variance(ray_session, tmp_path):
    # y exactly proportional to x across users -> adjusted variance ~0
    # (up to the cohort-mean structure), var_reduction ~ 1.
    rows = []
    rng = np.random.default_rng(5)
    for u in range(20):
        pre = float(rng.integers(5, 50))
        rows.append((u, 0, pre))          # pre-period (day 0)
        rows.append((u, 9, 2.0 * pre))    # post-period (day 9), y = 2x
    _write_events(tmp_path, rows)
    out = entrymod.queries()["r127_cuped"](str(tmp_path))
    assert float(out["theta"].iloc[0]) == pytest.approx(2.0, abs=1e-6)
    assert float(out["var_reduction"].iloc[0]) == pytest.approx(1.0, abs=1e-6)


def test_hill_alpha_on_pareto_counts(ray_session, tmp_path):
    # construct counts ~ i^(-1) ranks: counts n_i = round(C / i) give
    # a tail index near 1; just sanity-check alpha > 0 and threshold
    # equals the (k+1)-th largest count.
    rows = []
    for u in range(30):
        cnt = max(1, int(300 / (u + 1)))
        for j in range(cnt):
            rows.append((u, j % 10, 1.0))
    _write_events(tmp_path, rows)
    out = entrymod.queries()["r128_hill_tail"](str(tmp_path))
    assert float(out["alpha"].iloc[0]) > 0
    assert int(out["k"].iloc[0]) == 20
