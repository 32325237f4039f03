"""Rehearsal of the driver's correctness gate: every queries() entry
runs at sf0.01; SQL-expressible ones must match oracle_sql() via
DuckDB (row count + column names + order-insensitive values)."""

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _to_pandas(res):
    import pyarrow as pa

    from ray.data import Dataset

    if isinstance(res, Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ALL_QUERIES = sorted(entrymod.queries().keys())
SQL_QUERIES = sorted(entrymod.oracle_sql().keys())


def test_oracle_keys_subset():
    assert set(SQL_QUERIES) <= set(ALL_QUERIES)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_runs(ray_session, con, name):
    fn = entrymod.queries()[name]
    out = _to_pandas(fn(SF))
    assert out is not None and len(out.columns) > 0
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        return  # rows-only entry
    exp = con.sql(sql).df()
    assert list(sorted(out.columns)) == list(sorted(exp.columns)), name
    assert len(out) == len(exp), f"{name}: rows {len(out)} vs {len(exp)}"
    o, e = _norm(out), _norm(exp)
    pd.testing.assert_frame_equal(o, e, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


def test_entry_smoke(ray_session):
    res = _to_pandas(entrymod.entry())
    assert len(res) >= 0
    assert "doc_id" in res.columns and "score" in res.columns
