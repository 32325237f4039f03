"""Round-5 wave-30: assortativity, clustering coefficient, Fano
factor — oracle parity at sf0.001 plus closed-form graph checks."""

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
WAVE30 = ["r141_assortativity", "r142_clustering_coef", "r143_fano"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["lineitem", "events"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE30)
def test_wave30_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def _li_from_orders(tmp_path, orders):
    # orders: list of lists of part ids sharing an orderkey
    import pyarrow.parquet as pq

    ok, pk = [], []
    for i, parts in enumerate(orders):
        for p in parts:
            ok.append(i)
            pk.append(p)
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_partkey": pa.array(pk, pa.int64()),
        }),
        str(tmp_path / "lineitem.parquet"),
    )


def test_clustering_coef_triangle_is_one(ray_session, tmp_path):
    # a single 3-clique: T=1, full wedges = 3 -> C = 3*1/3 = 1.
    _li_from_orders(tmp_path, [[1, 2, 3]])
    out = entrymod.queries()["r142_clustering_coef"](str(tmp_path))
    assert int(out["triangles"].iloc[0]) == 1
    assert int(out["wedges_full"].iloc[0]) == 3
    assert float(out["clustering_coef"].iloc[0]) == 1.0


def test_assortativity_star_is_negative(ray_session, tmp_path):
    # a star (hub 0 with 5 leaves built from 5 two-item orders):
    # degree correlation across edges is -1 (hubs only link leaves).
    _li_from_orders(tmp_path, [[0, i] for i in range(1, 6)])
    out = entrymod.queries()["r141_assortativity"](str(tmp_path))
    assert int(out["n_edges"].iloc[0]) == 5
    assert float(out["assortativity"].iloc[0]) == pytest.approx(-1.0)


def test_fano_poisson_like_near_one(ray_session):
    out = entrymod.queries()["r143_fano"](SF)
    # synthetic events are near-uniform per day -> Fano should be
    # finite and positive for every type
    assert (out["fano"].to_numpy() > 0).all()
    assert len(out) >= 3
