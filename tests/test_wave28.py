"""Round-5 wave-28: write-audit-publish + quarantine, peak
detection — oracle parity at sf0.001 plus constructed checks."""

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
WAVE28 = ["e36_wap", "r138_peaks"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "events"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE28)
def test_wave28_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_wap_sides_partition_staged_batch(ray_session, con):
    out = entrymod.queries()["e36_wap"](SF).set_index("side")
    total = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    quar = con.sql("SELECT count(*) FROM orders WHERE o_orderkey % 11 = 3").fetchone()[0]
    assert int(out.loc["published", "n"]) + int(out.loc["quarantined", "n"]) == total
    assert int(out.loc["quarantined", "n"]) == quar
    assert float(out.loc["quarantined", "sum_price"]) < 0


def test_peaks_on_constructed_series(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # flat baseline 10 with spikes at days 5 (100) and 12 (90); a
    # plateau 50,50 at days 20-21 must NOT count (strict inequality).
    v = np.full(30, 10.0)
    v[5] = 100.0
    v[12] = 90.0
    v[20] = 50.0
    v[21] = 50.0
    ts = pa.array(np.arange(30) * 86400000000, pa.int64()).cast(pa.timestamp("us"))
    pq.write_table(
        pa.table({"ts": ts, "value": pa.array(v)}), str(tmp_path / "events.parquet")
    )
    out = entrymod.queries()["r138_peaks"](str(tmp_path))
    assert set(out["day"]) == {5, 12}
