"""Round-5 wave-26: snapshot time travel, growth accounting —
oracle parity at sf0.001 plus version-isolation and identity
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
from search_engine_ray.ops.sinks import read_snapshot, write_snapshot

SF = "/root/testdata/sf0.001"
WAVE26 = ["e35_time_travel", "r135_growth_accounting"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "events"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE26)
def test_wave26_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_time_travel_versions_isolated(ray_session, tmp_path):
    import ray.data as rd

    table = str(tmp_path / "tbl")
    write_snapshot(rd.from_arrow(pa.table({"v": pa.array([1, 2], pa.int64())})), table)
    write_snapshot(rd.from_arrow(pa.table({"v": pa.array([7, 8, 9], pa.int64())})), table)
    v1 = sorted(read_snapshot(table, version=1).to_pandas()["v"])
    v2 = sorted(read_snapshot(table, version=2).to_pandas()["v"])
    cur = sorted(read_snapshot(table).to_pandas()["v"])
    assert v1 == [1, 2] and v2 == [7, 8, 9] and cur == v2


def test_growth_accounting_identity(ray_session):
    # actives(d) == new + retained + resurrected, and churned(d)
    # equals actives(d-1) - retained(d).
    out = entrymod.queries()["r135_growth_accounting"](SF).sort_values("day")
    actives = (out["new"] + out["retained"] + out["resurrected"]).to_numpy()
    prev_act = np.concatenate([[0], actives[:-1]])
    assert (out["churned"].to_numpy() == prev_act - out["retained"].to_numpy()).all()
    assert int(out["new"].iloc[0]) == actives[0]  # day 1: everyone is new
