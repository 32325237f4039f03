"""Round-5 wave-36: XmR control chart, source-language purity —
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
WAVE36 = ["r156_xmr_chart", "r157_source_purity"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "documents"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE36)
def test_wave36_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_xmr_flags_planted_shift(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # stable noise around 100 with one 10x day: that day must breach
    # the UCL and be the only violation.
    v = np.array([100.0, 101, 99, 100, 102, 98, 100, 101, 99, 100,
                  1000.0, 100, 101, 99, 100, 102, 98, 100, 101, 99])
    days = np.arange(len(v), dtype=np.int64)
    ts = pa.array(days * 86400000000, pa.int64()).cast(pa.timestamp("us"))
    pq.write_table(pa.table({"ts": ts, "value": pa.array(v)}),
                   str(tmp_path / "events.parquet"))
    out = entrymod.queries()["r156_xmr_chart"](str(tmp_path))
    assert int(out["n_violations"].iloc[0]) == 1
    assert float(out["ucl"].iloc[0]) < 1000.0


def test_source_purity_monolingual_vs_mixed(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rows = [("pure", "en")] * 10 + [("mix", "en")] * 5 + [("mix", "de")] * 5
    pq.write_table(
        pa.table({
            "source": pa.array([r[0] for r in rows], pa.string()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    out = entrymod.queries()["r157_source_purity"](str(tmp_path)).set_index("source")
    assert float(out.loc["pure", "top_share"]) == 1.0
    assert float(out.loc["pure", "entropy"]) == 0.0
    assert float(out.loc["mix", "top_share"]) == 0.5
    assert float(out.loc["mix", "entropy"]) == pytest.approx(np.log(2), abs=1e-4)
