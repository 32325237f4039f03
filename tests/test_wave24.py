"""Round-5 wave-24: deletion-vector merge-on-read, 2-D histogram,
source JS divergence — oracle parity at sf0.001 plus semantic
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
WAVE24 = ["e33_deletion_vectors", "r132_hist2d", "t_source_divergence"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "lineitem", "documents"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE24)
def test_wave24_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_deletion_vectors_remove_exact_fraction(ray_session, con):
    out = entrymod.queries()["e33_deletion_vectors"](SF)
    total = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    deleted = con.sql("SELECT count(*) FROM orders WHERE o_orderkey % 9 = 4").fetchone()[0]
    assert int(out["n"].sum()) == total - deleted
    assert deleted > 0


def test_hist2d_covers_grid_and_total(ray_session, con):
    out = entrymod.queries()["r132_hist2d"](SF)
    assert len(out) == 30  # 5 x 6 full grid, zero cells included
    total = con.sql("SELECT count(*) FROM lineitem").fetchone()[0]
    assert int(out["n"].sum()) == total


def test_js_divergence_identical_sources_zero(ray_session, tmp_path):
    import pyarrow.parquet as pq

    texts = ["alpha beta gamma", "beta gamma delta"] * 5
    srcs = ["src0"] * 5 + ["src1"] * 5
    pq.write_table(
        pa.table({
            "source": pa.array(srcs, pa.string()),
            "text": pa.array(texts[:10], pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    # src0 and src1 each hold mixed copies of the same two texts but
    # with different counts — construct EXACTLY identical multisets:
    texts2 = ["alpha beta", "alpha beta"] * 5
    pq.write_table(
        pa.table({
            "source": pa.array(["src0"] * 5 + ["src1"] * 5, pa.string()),
            "text": pa.array(texts2[:10], pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    out = entrymod.queries()["t_source_divergence"](str(tmp_path))
    assert float(out["js"].iloc[0]) == 0.0
    # JS is bounded by ln 2
    out2 = entrymod.queries()["t_source_divergence"](SF)
    assert 0.0 <= float(out2["js"].iloc[0]) <= np.log(2) + 1e-9
