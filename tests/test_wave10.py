"""Round-3 fourth wave kernels: rank-family window functions, CUBE,
discrete quantile interpolation, string_stats, soft-dedup weights."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import search_engine_ray.ops.relational as rel
import search_engine_ray.ops.text as txt
from search_engine_ray.ops.dedup import soft_dedup_weights


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_window_rank_family_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.integers(0, 3, 100),
        "o": rng.integers(0, 10, 100),  # tie-prone order key
        "id": np.arange(100),
    })
    out = (
        rel.window_functions(
            _ds(df), "g", ["o", "id"],
            {"rn": ("row_number",), "nt": ("ntile", 4),
             "pr": ("percent_rank",), "cd": ("cume_dist",)},
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT g, o, id, row_number() OVER w AS rn, ntile(4) OVER w AS nt, "
        "percent_rank() OVER w AS pr, cume_dist() OVER w AS cd FROM df "
        "WINDOW w AS (PARTITION BY g ORDER BY o, id) ORDER BY id"
    ).df()
    pd.testing.assert_frame_equal(
        out[["g", "o", "id", "rn", "nt", "pr", "cd"]],
        exp, check_dtype=False, rtol=0, atol=1e-12,
    )


def test_ntile_more_buckets_than_rows(ray_session):
    df = pd.DataFrame({"g": [0, 0], "o": [1, 2], "id": [0, 1]})
    out = (
        rel.window_functions(_ds(df), "g", ["o", "id"], {"nt": ("ntile", 5)})
        .to_pandas()
        .sort_values("id")
    )
    assert list(out["nt"]) == [1, 2]


def test_cube_aggregate_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(6)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 200),
        "b": rng.choice(["p", "q", "r"], 200),
        "v": rng.integers(0, 100, 200).astype(float),
    })
    out = rel.cube_aggregate(_ds(df), ["a", "b"], "v", alias="s").to_pandas()
    for c in ("a", "b"):
        out[c] = out[c].fillna("ALL")
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT COALESCE(a,'ALL') AS a, COALESCE(b,'ALL') AS b, sum(v) AS s "
        "FROM df GROUP BY CUBE(a, b) ORDER BY 1, 2"
    ).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False, rtol=0, atol=1e-9)
    # 2*3 fine + 2 + 3 + 1 grand = 12 grouping rows
    assert len(out) == 12


def test_grouped_discrete_quantiles_interpolates_like_numpy(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.integers(0, 2, 500),
        "v": rng.integers(1, 20, 500).astype(float),
    })
    q = rel.grouped_discrete_quantiles(_ds(df), "g", "v", [0.25, 0.5, 0.75])
    for _, row in q.iterrows():
        vals = df.loc[df["g"] == row["g"], "v"].to_numpy()
        for p in (0.25, 0.5, 0.75):
            assert row[f"q{p}"] == pytest.approx(np.quantile(vals, p), abs=1e-12)
        assert row["min_v"] == vals.min() and row["max_v"] == vals.max()


def test_string_stats_entropy(ray_session):
    df = pd.DataFrame({"s": ["ab", "abab", "b"]})
    st = txt.string_stats(_ds(df), "s")
    assert st["count"] == 3
    assert st["min_length"] == 1 and st["max_length"] == 4
    assert st["avg_length"] == pytest.approx(7 / 3)
    # chars: a=3, b=4 over 7
    p = np.array([3 / 7, 4 / 7])
    assert st["entropy"] == pytest.approx(float(-(p * np.log2(p)).sum()))


def test_soft_dedup_weights_sum_to_distinct_count(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(6),
        "text": ["a", "b", "a", "c", "a", "b"],
    })
    out = soft_dedup_weights(_ds(df), "text", "doc_id").to_pandas()
    assert len(out) == 6
    w = out.set_index("doc_id")
    assert w.loc[0, "dup_count"] == 3 and w.loc[0, "weight"] == pytest.approx(1 / 3)
    assert w.loc[3, "dup_count"] == 1 and w.loc[3, "weight"] == 1.0
    assert out["weight"].sum() == pytest.approx(3.0)  # one unit per distinct text


def test_alias_flip_and_guard(tmp_path):
    import json
    import os

    import pytest as _pytest

    from search_engine_ray.index.alias import resolve_alias, set_alias

    idx1 = tmp_path / "v1"
    idx1.mkdir()
    (idx1 / "manifest.json").write_text("{}")
    alias = str(tmp_path / "alias.json")
    set_alias(alias, str(idx1))
    assert resolve_alias(alias) == str(idx1)
    # refuse to flip to a non-servable target
    with _pytest.raises(ValueError):
        set_alias(alias, str(tmp_path / "nope"))
    assert resolve_alias(alias) == str(idx1)  # pointer untouched
    # flip to a second servable index
    idx2 = tmp_path / "v2"
    idx2.mkdir()
    (idx2 / "manifest.json").write_text("{}")
    set_alias(alias, str(idx2))
    assert resolve_alias(alias) == str(idx2)
    # no torn temp file left behind
    assert not os.path.exists(alias + ".tmp")
    assert json.load(open(alias))["target"] == str(idx2)


def test_join_auto_broadcast_and_shuffle_paths(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500), "x": np.arange(500)})
    right = pd.DataFrame({"k": np.arange(50), "name": [f"n{i}" for i in range(50)]})
    exp = left.merge(right, on="k").sort_values(["x"]).reset_index(drop=True)
    # tiny right side -> broadcast path
    out_b = (
        rel.join_auto(_ds(left), _ds(right), on=["k"])
        .to_pandas().sort_values(["x"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out_b[["k", "x", "name"]], exp[["k", "x", "name"]], check_dtype=False
    )
    # threshold 0 forces the shuffle path; same result
    out_s = (
        rel.join_auto(_ds(left), _ds(right), on=["k"], broadcast_threshold_bytes=0)
        .to_pandas().sort_values(["x"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out_s[["k", "x", "name"]].reset_index(drop=True),
        exp[["k", "x", "name"]], check_dtype=False,
    )
    # semi/anti now degrade to the native shuffle join instead of
    # erroring when the right side can't broadcast (Ray 2.49 supports
    # them); result must equal the broadcast path
    right_half = right[right["k"] < 25]
    semi_b = (
        rel.join_auto(_ds(left), _ds(right_half), on=["k"], how="left semi")
        .to_pandas().sort_values(["x"]).reset_index(drop=True)
    )
    semi_s = (
        rel.join_auto(
            _ds(left), _ds(right_half), on=["k"], how="left semi",
            broadcast_threshold_bytes=0,
        )
        .to_pandas().sort_values(["x"]).reset_index(drop=True)
    )
    assert semi_b["x"].tolist() == semi_s["x"].tolist()
    assert set(semi_s["k"]) <= set(range(25))
    anti_s = (
        rel.join_auto(
            _ds(left), _ds(right_half), on=["k"], how="left anti",
            broadcast_threshold_bytes=0,
        )
        .to_pandas()
    )
    assert len(anti_s) + len(semi_s) == len(left)
    assert set(anti_s["k"]) & set(range(25)) == set()
