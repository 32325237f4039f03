"""Round-5 wave-11 entries: Jarque-Bera normality screen, Cohen's d /
Hedges' g effect size, Tukey-fence heavy-user screen, Flesch
readability histogram — each checked value-for-value against its
DuckDB oracle at sf0.001 (the fast rehearsal of the driver gate;
test_entry.py re-runs the same pairs at sf0.01)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["events", "documents"]
WAVE11 = ["r105_jarque_bera", "r106_cohens_d", "r107_tukey_users", "t_readability"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE11)
def test_wave11_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_jarque_bera_zero_for_symmetric_mesokurtic(ray_session, tmp_path):
    # a two-point symmetric distribution has skew 0; JB then reduces
    # to n/24 * kurt^2 with kurt_excess = -2 exactly -> jb = n/6.
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 400
    v = np.tile([1.0, 3.0], n // 2)
    pq.write_table(
        pa.table({
            "event_type": pa.array(["a"] * n),
            "value": pa.array(v),
        }),
        str(tmp_path / "events.parquet"),
    )
    out = entrymod.queries()["r105_jarque_bera"](str(tmp_path))
    assert float(out["skew"].iloc[0]) == 0.0
    assert float(out["kurt_excess"].iloc[0]) == -2.0
    assert float(out["jb"].iloc[0]) == pytest.approx(n / 6.0)


def test_tukey_fences_flag_known_outlier(ray_session, tmp_path):
    # 20 users with 10 events each plus one with 500: the heavy user
    # must land above the upper fence and nobody below the lower.
    import pyarrow as pa
    import pyarrow.parquet as pq

    uid = np.repeat(np.arange(20), 10)
    uid = np.concatenate([uid, np.full(500, 99)])
    pq.write_table(pa.table({"user_id": pa.array(uid, pa.int64())}),
                   str(tmp_path / "events.parquet"))
    out = entrymod.queries()["r107_tukey_users"](str(tmp_path))
    assert int(out["n_users"].iloc[0]) == 21
    assert int(out["n_high"].iloc[0]) == 1
    assert int(out["n_low"].iloc[0]) == 0


def test_readability_formula_on_known_doc(ray_session, tmp_path):
    # "the cat sat" -> 3 words, 3 syllables, 1 sentence:
    # score = 206.835 - 1.015*3 - 84.6*1 = 119.19 -> bucket 11.
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"text": pa.array(["the cat sat", ""])}),
        str(tmp_path / "documents.parquet"),
    )
    out = entrymod.queries()["t_readability"](str(tmp_path))
    assert len(out) == 1  # empty doc excluded
    assert int(out["bucket"].iloc[0]) == 11
    assert float(out["mean_score"].iloc[0]) == pytest.approx(119.19)
