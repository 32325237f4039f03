"""Round-5 wave-13: BFS levels over the co-purchase graph, SymSpell
spell-join pairs, schema-evolution parquet read — oracle parity at
sf0.001 plus library-level checks on constructed inputs."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod
from search_engine_ray.ops.graph import bfs_levels
from search_engine_ray.ops.text import _levenshtein, spell_pairs

SF = "/root/testdata/sf0.001"
WAVE13 = ["r111_bfs_levels", "t_spell_pairs", "e25_schema_evolution"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["lineitem", "documents", "orders"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE13)
def test_wave13_matches_oracle(ray_session, con, name):
    out = entrymod.queries()[name](SF)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    exp = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(out.columns) == sorted(exp.columns), name
    assert len(out) == len(exp), name
    pd.testing.assert_frame_equal(
        _norm(out), _norm(exp), check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def _edges_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({
            "x": pa.array([p[0] for p in pairs], pa.int64()),
            "y": pa.array([p[1] for p in pairs], pa.int64()),
        })
    )


def test_bfs_levels_path_graph(ray_session):
    # path 1-2-3-4-5 plus isolated edge 8-9: from 1, levels are
    # 1/1/1/1 and {5, 8, 9} minus reached -> 5 unreached at depth 3?
    # no: level3 reaches 4, so unreached = {5, 8, 9}.
    ds = _edges_ds([(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)])
    out = bfs_levels(ds, 1, max_depth=3, src_col="x", dst_col="y")
    got = dict(zip(out["level"], out["n_nodes"]))
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, -1: 3}


def test_bfs_levels_early_stop_pads_zero(ray_session):
    # star around 7: everything reached at level 1, deeper levels 0.
    ds = _edges_ds([(7, 1), (7, 2), (3, 7)])
    out = bfs_levels(ds, 7, max_depth=3, src_col="x", dst_col="y")
    got = dict(zip(out["level"], out["n_nodes"]))
    assert got == {0: 1, 1: 3, 2: 0, 3: 0, -1: 0}


def test_levenshtein_matches_duckdb():
    rng = np.random.default_rng(11)
    words = ["spark", "spork", "spak", "park", "batch", "match", "a", "", "abc"]
    c = duckdb.connect()
    for a in words:
        for b in words:
            exp = c.sql(f"SELECT levenshtein('{a}', '{b}')").fetchone()[0]
            assert _levenshtein(a, b) == exp, (a, b)


def test_spell_pairs_exact_recall_distance2(ray_session):
    # brute-force ground truth on a constructed vocab with known
    # distance-1 and distance-2 pairs (substitution, insert, delete,
    # transpose-as-2-subs) — blocking must lose nothing.
    import ray.data as rd

    vocab = ["spark", "spork", "spark_", "park", "pork", "stork",
             "batch", "match", "hatch", "bath", "data", "date", "gate"]
    ds = rd.from_arrow(pa.table({"text": pa.array([" ".join(vocab)])}))
    out = spell_pairs(ds, "text", max_dist=2).to_pandas()
    got = {(r.a, r.b): r.d for r in out.itertuples()}
    exp = {}
    sv = sorted(set(vocab))
    for i in range(len(sv)):
        for j in range(i + 1, len(sv)):
            d = _levenshtein(sv[i], sv[j])
            if 1 <= d <= 2:
                exp[(sv[i], sv[j])] = d
    assert got == exp


def test_read_parquet_evolved_union_and_conflict(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import ray.data as rd

    from search_engine_ray.ops.sources import read_parquet_evolved

    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int64())}), p1)
    pq.write_table(
        pa.table({"k": pa.array([3], pa.int64()), "v": pa.array(["x"], pa.string())}),
        p2,
    )
    out = read_parquet_evolved([p1, p2]).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [1, 2, 3]
    assert out["v"].isna().tolist() == [True, True, False]

    p3 = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"k": pa.array(["s"], pa.string())}), p3)
    with pytest.raises(ValueError, match="conflicting types"):
        read_parquet_evolved([p1, p3])
