"""Round-5 wave-33: brand modularity, Laspeyres index, cohort LTV —
oracle parity at sf0.001 plus constructed checks."""

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
WAVE33 = ["r147_modularity", "r148_laspeyres", "r149_ltv"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["lineitem", "part", "orders"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE33)
def test_wave33_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_modularity_perfect_communities(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # two disjoint 3-cliques with brand == clique: Q = 2*(1/2 - 1/4)
    # = 0.5 (the maximum for two equal communities).
    ok, pk = [], []
    for i, parts in enumerate([[1, 2, 3], [4, 5, 6]]):
        for p in parts:
            ok.append(i)
            pk.append(p)
    pq.write_table(
        pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                  "l_partkey": pa.array(pk, pa.int64())}),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table({
            "p_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "p_brand": pa.array(["A", "A", "A", "B", "B", "B"], pa.string()),
        }),
        str(tmp_path / "part.parquet"),
    )
    out = entrymod.queries()["r147_modularity"](str(tmp_path))
    assert int(out["n_edges"].iloc[0]) == 6
    assert float(out["modularity"].iloc[0]) == pytest.approx(0.5)


def test_laspeyres_pure_inflation(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # same quantities both halves, all unit prices x1.1 in half 2:
    # Laspeyres must be exactly 1.1.
    rows = []
    for pk in (1, 2, 3):
        rows.append((pk, 0, 10.0, 10.0 * pk))          # period 0
        rows.append((pk, 20, 10.0, 10.0 * pk * 1.1))   # period 1
    ts = pa.array([r[1] * 86400000000 for r in rows], pa.int64()).cast(pa.timestamp("us"))
    pq.write_table(
        pa.table({
            "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_shipdate": ts,
            "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[3] for r in rows], pa.float64()),
        }),
        str(tmp_path / "lineitem.parquet"),
    )
    out = entrymod.queries()["r148_laspeyres"](str(tmp_path))
    assert int(out["n_parts"].iloc[0]) == 3
    assert float(out["laspeyres"].iloc[0]) == pytest.approx(1.1)


def test_ltv_monotone_within_cohort(ray_session):
    out = entrymod.queries()["r149_ltv"](SF)
    for _, grp in out.groupby("cohort"):
        v = grp.sort_values("off")["cum_ltv"].to_numpy()
        assert (np.diff(v) >= -1e-9).all()
    assert (out["n_cust"] > 0).all()
