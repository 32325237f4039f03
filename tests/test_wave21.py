"""Round-5 wave-21: activity streaks (gaps-and-islands), split
leakage audit, HHI concentration — oracle parity at sf0.001 plus
constructed-input checks."""

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
WAVE21 = ["r124_streaks", "t_split_leakage", "r125_hhi"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "documents", "orders"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE21)
def test_wave21_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_streaks_islands(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # user 1: days 0,1,2, 5,6 -> longest 3 of 5 active
    # user 2: days 3 -> longest 1
    rows = [(1, 0), (1, 1), (1, 2), (1, 5), (1, 6), (2, 3), (1, 1)]
    ts = pa.array([d * 86400000000 for _, d in rows], pa.int64()).cast(pa.timestamp("us"))
    pq.write_table(
        pa.table({
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": ts,
        }),
        str(tmp_path / "events.parquet"),
    )
    out = entrymod.queries()["r124_streaks"](str(tmp_path)).set_index("user_id")
    assert int(out.loc[1, "n_active_days"]) == 5
    assert int(out.loc[1, "longest_streak"]) == 3
    assert int(out.loc[2, "longest_streak"]) == 1


def test_split_leakage_flags_planted_dup(ray_session, tmp_path):
    import hashlib

    import pyarrow.parquet as pq

    # find two doc ids in different splits, give them identical text
    def split_of(i):
        h = int.from_bytes(hashlib.md5(f"split:{i}".encode()).digest()[:8], "little") % 10
        return 0 if h <= 7 else (1 if h == 8 else 2)

    ids = list(range(200))
    a = next(i for i in ids if split_of(i) == 0)
    b = next(i for i in ids if split_of(i) == 2)
    texts = [f"unique text {i}" for i in ids]
    texts[b] = texts[a]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    out = entrymod.queries()["t_split_leakage"](str(tmp_path))
    assert int(out["n_leaky_texts"].iloc[0]) == 1
    assert int(out[["n_train", "n_val", "n_test"]].sum(axis=1).iloc[0]) == 200


def test_hhi_uniform_vs_monopoly(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # 10 equal customers -> HHI = 1000; then one customer with all
    # revenue -> HHI = 10000.
    pq.write_table(
        pa.table({
            "o_custkey": pa.array(list(range(10)), pa.int64()),
            "o_totalprice": pa.array([100.0] * 10, pa.float64()),
        }),
        str(tmp_path / "orders.parquet"),
    )
    out = entrymod.queries()["r125_hhi"](str(tmp_path))
    assert float(out["hhi"].iloc[0]) == pytest.approx(1000.0)
    assert float(out["top_share"].iloc[0]) == pytest.approx(0.1)
