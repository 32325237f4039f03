"""Round-5 wave-34: duplicate-invoice screen, Mood's median test,
Fisher index family — oracle parity at sf0.001 plus constructed
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
WAVE34 = ["r150_dup_invoices", "r151_mood", "r152_fisher_index"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "events", "lineitem"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE34)
def test_wave34_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_dup_invoices_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # orders 1/2: same cust, same price, 2 days apart -> 1 pair.
    # order 3: same cust+price but 10 days away -> no pair with 1 or
    # 2. order 4: different cust -> never pairs.
    rows = [
        (1, 7, 100.0, 0), (2, 7, 100.0, 2), (3, 7, 100.0, 12),
        (4, 8, 100.0, 1),
    ]
    ts = pa.array([r[3] * 86400000000 for r in rows], pa.int64()).cast(pa.timestamp("us"))
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
            "o_orderdate": ts,
        }),
        str(tmp_path / "orders.parquet"),
    )
    out = entrymod.queries()["r150_dup_invoices"](str(tmp_path))
    assert int(out["n_pairs"].iloc[0]) == 1
    assert int(out["n_orders"].iloc[0]) == 2


def test_mood_cells_partition_and_chi2_nonneg(ray_session, con):
    out = entrymod.queries()["r151_mood"](SF)
    n_users = con.sql("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert int(out[["a", "b", "c", "d"]].sum(axis=1).iloc[0]) == n_users
    assert float(out["chi2"].iloc[0]) >= 0.0


def test_fisher_between_laspeyres_paasche(ray_session):
    out = entrymod.queries()["r152_fisher_index"](SF)
    lasp = float(out["laspeyres"].iloc[0])
    paas = float(out["paasche"].iloc[0])
    fish = float(out["fisher"].iloc[0])
    lo, hi = min(lasp, paas), max(lasp, paas)
    assert lo - 1e-4 <= fish <= hi + 1e-4
    # consistency with the standalone r148 entry
    l148 = float(entrymod.queries()["r148_laspeyres"](SF)["laspeyres"].iloc[0])
    assert lasp == pytest.approx(l148, abs=1e-9)
