"""Round-5 wave-15: manifest snapshot publish/read, Poisson rate
ratio, Heaps vocabulary growth — oracle parity at sf0.001 plus
library-level snapshot-isolation checks."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod
from search_engine_ray.ops.sinks import read_snapshot, write_snapshot

SF = "/root/testdata/sf0.001"
WAVE15 = ["e26_manifest_snapshot", "r116_rate_ratio", "t_vocab_growth"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["lineitem", "events", "documents"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE15)
def test_wave15_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_snapshot_excludes_orphans_and_republish_swaps(ray_session, tmp_path):
    import ray.data as rd

    table = str(tmp_path / "tbl")
    ds1 = rd.from_arrow(pa.table({"v": pa.array([1, 2, 3], pa.int64())}))
    write_snapshot(ds1, table)

    # orphan part outside the manifest must be invisible
    import pyarrow.parquet as pq

    orphan = os.path.join(table, "data-orphan")
    os.makedirs(orphan)
    pq.write_table(pa.table({"v": pa.array([99], pa.int64())}), os.path.join(orphan, "x.parquet"))
    got = sorted(read_snapshot(table).to_pandas()["v"])
    assert got == [1, 2, 3]

    # a second publish atomically replaces the visible snapshot
    ds2 = rd.from_arrow(pa.table({"v": pa.array([7, 8], pa.int64())}))
    write_snapshot(ds2, table)
    got = sorted(read_snapshot(table).to_pandas()["v"])
    assert got == [7, 8]


def test_vocab_growth_monotone_and_totals(ray_session):
    out = entrymod.queries()["t_vocab_growth"](SF)
    v = out["vocab"].to_numpy()
    nt = out["n_tokens"].to_numpy()
    assert (np.diff(v) >= 0).all() and (np.diff(nt) >= 0).all()
    assert int(out["k"].iloc[-1]) == 5
