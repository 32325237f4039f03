"""Operator-ring tests: relational ops vs DuckDB, dedup, ANN, text,
multimodal plumbing (SURVEY.md §2.2 + task-brief training-data ops)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import search_engine_ray.ops.ann as ann
import search_engine_ray.ops.dedup as dd
import search_engine_ray.ops.relational as rel
import search_engine_ray.ops.text as txt
from search_engine_ray.ops.multimodal import (
    DecodeAndFeaturize,
    FrameSampler,
    featurize_media,
    sample_frames,
    synthetic_media_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "part", "documents", "embeddings", "events"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def lineitem(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/lineitem.parquet")


@pytest.fixture(scope="module")
def documents(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def assert_frames_equal(ray_df: pd.DataFrame, duck_df: pd.DataFrame):
    pd.testing.assert_frame_equal(_sorted(ray_df), _sorted(duck_df), check_dtype=False)


def test_filter_conditions(lineitem, con):
    out = rel.filter_conditions(
        lineitem, [("l_quantity", ">", 45.0), ("l_returnflag", "==", "R")]
    ).to_pandas()
    exp = con.sql(
        "SELECT * FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'"
    ).df()
    assert_frames_equal(out, exp)


def test_filter_in(lineitem, con):
    out = rel.filter_conditions(lineitem, [("l_returnflag", "in", ["A", "N"])]).count()
    exp = con.sql("SELECT count(*) c FROM lineitem WHERE l_returnflag IN ('A','N')").fetchone()[0]
    assert out == exp


def test_project(lineitem, con):
    import pyarrow.compute as pc

    out = rel.project(
        lineitem,
        keep=["l_orderkey", "l_linenumber"],
        exprs={
            "revenue": lambda t: pc.round(
                pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])), 4
            )
        },
    ).to_pandas()
    exp = con.sql(
        "SELECT l_orderkey, l_linenumber, round(l_extendedprice * (1 - l_discount), 4) AS revenue FROM lineitem"
    ).df()
    assert_frames_equal(out, exp)


def test_broadcast_join(ray_session, con):
    import pyarrow.parquet as pq
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"])
    out = rel.broadcast_join(orders, cust, on=["o_custkey"], right_on=["c_custkey"], how="inner").to_pandas()
    exp = con.sql(
        "SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment "
        "FROM orders JOIN customer ON o_custkey = c_custkey"
    ).df()
    assert_frames_equal(out, exp)


def test_semi_and_anti_join(ray_session, con):
    import pyarrow.parquet as pq
    import ray.data as rd

    part = rd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_name"])
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_partkey"])
    semi = rel.broadcast_join(part, li, on=["p_partkey"], right_on=["l_partkey"], how="left semi").to_pandas()
    exp = con.sql(
        "SELECT p_partkey, p_name FROM part WHERE p_partkey IN (SELECT l_partkey FROM lineitem)"
    ).df()
    assert_frames_equal(semi, exp)
    anti = rel.broadcast_join(part, li, on=["p_partkey"], right_on=["l_partkey"], how="left anti").count()
    expa = con.sql(
        "SELECT count(*) c FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)"
    ).fetchone()[0]
    assert anti == expa


def test_group_dedup_first(ray_session, con):
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    out = rel.group_dedup_first(
        orders, "o_custkey", ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).to_pandas()[["o_custkey", "o_orderkey", "o_totalprice"]]
    exp = con.sql(
        "SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
        "QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) = 1"
    ).df()
    assert_frames_equal(out, exp)


def test_grouped_aggregate(lineitem, con):
    out = rel.grouped_aggregate(
        lineitem,
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("sum", "l_quantity"), "cnt": ("count", "l_quantity"), "max_price": ("max", "l_extendedprice")},
    ).to_pandas()
    out["sum_qty"] = out["sum_qty"].round(4)
    exp = con.sql(
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),4) AS sum_qty, "
        "count(*) AS cnt, max(l_extendedprice) AS max_price "
        "FROM lineitem GROUP BY 1, 2"
    ).df()
    assert_frames_equal(out, exp)


def test_distinct_and_value_counts(lineitem, con):
    d = rel.distinct(lineitem, "l_returnflag").to_pandas()
    exp = con.sql("SELECT DISTINCT l_returnflag FROM lineitem").df()
    assert_frames_equal(d, exp)
    vc = rel.value_counts(lineitem, "l_returnflag").to_pandas()
    expc = con.sql("SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1").df()
    assert_frames_equal(vc, expc)


def test_topk_and_paginate(ray_session, con):
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    out = rel.topk(orders, ["o_totalprice", "o_orderkey"], 25, descending=[True, False]).to_pandas()
    exp = con.sql(
        "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"
    ).df()
    pd.testing.assert_frame_equal(
        out[["o_orderkey", "o_totalprice"]].reset_index(drop=True),
        exp[["o_orderkey", "o_totalprice"]],
        check_dtype=False,
    )
    page = rel.paginate(orders, ["o_totalprice", "o_orderkey"], skip=10, limit=5, descending=[True, False]).to_pandas()
    expp = con.sql(
        "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5 OFFSET 10"
    ).df()
    pd.testing.assert_frame_equal(
        page[["o_orderkey", "o_totalprice"]].reset_index(drop=True),
        expp[["o_orderkey", "o_totalprice"]],
        check_dtype=False,
    )


def test_facet_page(ray_session):
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    res = rel.facet_page(
        orders, ["o_totalprice", "o_orderkey"], skip=0, limit=10,
        descending=[True, False], facet_cols=["o_orderstatus"],
    )
    assert res["total"] == 1500
    assert len(res["data"]) == 10
    assert sum(res["facets"]["o_orderstatus"].values()) == 1500


def test_explode_tokens(documents, con):
    out = txt.explode_tokens(documents, "text", ["doc_id"])
    counts = rel.value_counts(out, "token").to_pandas()
    exp = con.sql(
        "SELECT t AS token, count(*) AS cnt FROM "
        "(SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) t FROM documents) GROUP BY 1"
    ).df()
    assert_frames_equal(counts, exp)


def test_token_stats_and_fingerprint(documents, con):
    out = txt.add_token_stats(documents, "text").to_pandas()[
        ["doc_id", "n_tokens", "n_uniq_tokens", "fingerprint"]
    ]
    exp = con.sql(
        "SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tokens, "
        "len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+'))) AS n_uniq_tokens, "
        "md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9_]+'), ' ')) AS fingerprint "
        "FROM documents"
    ).df()
    assert_frames_equal(out, exp)


def test_quality_score(documents, con):
    out = txt.add_quality_score(documents, "text").to_pandas()[["doc_id", "quality"]]
    exp = con.sql(
        """
        SELECT doc_id, round(
          0.4 * (len(list_distinct(regexp_extract_all(lower(text),'[a-z0-9_]+')))::DOUBLE
                 / len(regexp_extract_all(lower(text),'[a-z0-9_]+'))) +
          0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text)) +
          0.3 * (least(len(regexp_extract_all(lower(text),'[a-z0-9_]+')), 200)::DOUBLE / 200)
        , 4) AS quality FROM documents
        """
    ).df()
    assert_frames_equal(out, exp)


def test_lang_id_and_rolling_fp(documents):
    out = txt.add_lang_id(documents, "text").to_pandas()
    assert set(out["lang_id"]) <= {"en", "de", "fr", "es", "zh", "und"}
    fp = txt.add_rolling_fingerprint(documents, "text").to_pandas()
    assert fp["rolling_fp"].nunique() > 1
    # determinism
    fp2 = txt.add_rolling_fingerprint(documents, "text").to_pandas()
    assert fp.sort_values("doc_id")["rolling_fp"].tolist() == fp2.sort_values("doc_id")["rolling_fp"].tolist()


def test_lang_and_rolling_sql_oracles_on_crafted_docs(ray_session):
    """Pin the SQL-oracle semantics of add_lang_id / add_rolling_fingerprint
    on inputs the synthetic corpus never produces: non-English profiles,
    argmax ties (first-max in sorted code order), CJK override, the
    2000-char CJK scan cap, <window-token docs, empty and NULL text."""
    import ray.data as rd

    import __ray_entry__ as E

    docs = pd.DataFrame(
        {
            "doc_id": list(range(10)),
            "text": [
                "der hund und die katze ist nicht ein problem mit von auf",  # de
                "le chat est dans la maison et les chiens pour sur",  # fr
                "the cat der hund",  # tie en/de on 2 hits -> de (sorted first)
                "漢字のテキスト 中文文本",  # CJK -> zh
                ("x " * 1200) + " 漢字",  # CJK past the 2000-char cap -> NOT zh
                "for to of",  # en, 3 tokens (< window) -> min raw hash
                "one two three four five six seven",  # no markers -> und, full window
                "",  # empty -> 0 fingerprint, und
                None,  # NULL text
                "el perro y la casa es una del en por para",  # es
            ],
        }
    )
    ds = rd.from_pandas(docs)
    lang = txt.add_lang_id(ds, "text").to_pandas().sort_values("doc_id").reset_index(drop=True)
    fp = (
        txt.add_rolling_fingerprint(ds, "text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert lang["lang_id"].tolist() == [
        "de", "fr", "de", "zh", "und", "en", "und", "und", "und", "es",
    ]
    assert fp.loc[7, "rolling_fp"] == 0 and fp.loc[8, "rolling_fp"] == 0

    con = duckdb.connect()
    con.register("documents", docs)
    osql = E.oracle_sql()
    lang_sql = con.execute(osql["t_lang_id"]).df().sort_values("doc_id").reset_index(drop=True)
    fp_sql = con.execute(osql["t_rolling_fp"]).df().sort_values("doc_id").reset_index(drop=True)
    assert lang["lang_id"].tolist() == lang_sql["lang_id"].tolist()
    assert fp["rolling_fp"].tolist() == fp_sql["rolling_fp"].astype("int64").tolist()


def test_exact_dedup(ray_session, con):
    import ray.data as rd

    # inject real duplicates: union the table with itself
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    shifted = docs.map_batches(
        lambda t: pa.table({"doc_id": pa.compute.add(t["doc_id"], 100000), "text": t["text"]}),
        batch_format="pyarrow",
    )
    both = docs.union(shifted)
    out = dd.exact_dedup(both, "text", "doc_id").to_pandas()
    assert len(out) == 500
    assert (out["dup_count"] == 2).all()
    assert (out["doc_id"] < 100000).all()  # min id kept


def test_minhash_lsh_near_dup(ray_session):
    import ray.data as rd

    # corpus with planted near-duplicates: doc i and i+1000 share ~all tokens
    base = [
        " ".join(f"tok{j}_{i}" for j in range(30)) for i in range(40)
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    rows += [
        {"doc_id": 1000 + i, "text": t + " extra_tail_token"} for i, t in enumerate(base[:10])
    ]
    ds = rd.from_items(rows)
    pairs = dd.minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    found = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert {(i, 1000 + i) for i in range(10)} <= found
    # distinct docs share no shingles -> no false positives at 0.5
    assert all(b - a == 1000 for a, b in found)
    assert (pairs["jaccard"] >= 0.5).all()


def test_simhash_near_dup(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, 60)) for _ in range(30)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    # planted near-dup: one token changed
    rows.append({"doc_id": 999, "text": texts[0].replace(texts[0].split()[0], "changed", 1)})
    ds = rd.from_items(rows)
    pairs = dd.simhash_pairs(ds, max_hamming=8).to_pandas()
    assert ((pairs["a"] == 0) & (pairs["b"] == 999)).any()


def test_cosine_topk_vs_duckdb(ray_session, con):
    import ray.data as rd

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    qdf = con.sql("SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (0, 1, 2) ORDER BY vec_id").df()
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = ann.cosine_topk(emb, queries, qdf["vec_id"].to_numpy(), k=5).to_pandas()
    exp = con.sql(
        """
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id IN (0,1,2))
        SELECT qid, vec_id, round(
            list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) /
            (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
             sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cos
        FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.qid
        QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, e.vec_id) <= 5
        """
    ).df()
    assert_frames_equal(out[["qid", "vec_id", "cos"]], exp)


def test_rp_lsh_near_dup(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(1)
    base = rng.standard_normal((20, 16))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(20)]
    # planted near-dups: tiny perturbation
    for i in range(5):
        rows.append({"vec_id": 100 + i, "embedding": (base[i] + 0.01 * rng.standard_normal(16)).tolist()})
    ds = rd.from_items(rows)
    pairs = ann.rp_lsh_near_dup(ds, threshold=0.95, n_planes=8).to_pandas()
    found = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert {(i, 100 + i) for i in range(5)} <= found


def test_ivf_index(ray_session, tmp_path):
    import ray.data as rd

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    idx = ann.IVFIndex.build(emb, str(tmp_path / "ivf"), n_clusters=8)
    q = emb.take(1)[0]["embedding"]
    res = idx.search(np.asarray(q), k=5, nprobe=8)  # nprobe=all -> exact
    # with all clusters probed, results == brute force
    brute = ann.cosine_topk(
        emb, np.asarray(q, dtype=np.float64).reshape(1, -1), np.array([0]), k=6, exclude_self=False
    ).to_pandas()
    assert res["vec_id"].tolist() == brute["vec_id"].tolist()[:5]


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    media = rd.from_arrow(synthetic_media_table(50, "video"))
    feats = featurize_media(media, feature_dim=16).to_pandas()
    assert len(feats) == 50
    assert all(len(f) == 16 for f in feats["features"])
    # determinism of the fake decode
    feats2 = featurize_media(media, feature_dim=16).to_pandas()
    a = np.stack(feats.sort_values("media_id")["features"].to_numpy())
    b = np.stack(feats2.sort_values("media_id")["features"].to_numpy())
    np.testing.assert_array_equal(a, b)
    frames = sample_frames(media, max_frames=4).to_pandas()
    assert frames.groupby("media_id").size().max() <= 4
    # fake frame bytes are the SQL-replayable hash of (payload hex, idx)
    import hashlib

    row = frames.sort_values(["media_id", "frame_idx"]).iloc[0]
    pay0 = synthetic_media_table(50, "video")["payload"][0].as_py()
    assert bytes(row["frame_payload"]) == hashlib.sha256(f"{pay0.hex()}/0".encode()).digest()
    # real-decode paths are guarded actor-construction errors without
    # the optional media libs (Pillow / pyav) — this container has none
    with pytest.raises(NotImplementedError):
        DecodeAndFeaturize(decode="real")
    with pytest.raises(NotImplementedError):
        FrameSampler(decode="real")
    assert FrameSampler(decode="auto").decode == "fake"
    from search_engine_ray.ops.multimodal import AudioEnergy

    with pytest.raises(NotImplementedError):
        AudioEnergy(decode="real")
    ae = AudioEnergy(decode="auto")
    assert ae.decode == "fake"
    # fake energy chain is the documented md5 trick, window count
    # clamps to [1, max_windows]
    t = synthetic_media_table(3, "audio")
    out = ae(t)
    assert out.column_names == ["media_id", "n_windows", "mean_energy"]
    n0 = out["n_windows"][0].as_py()
    assert 1 <= n0 <= 16
    hx = t["payload"][0].as_py().hex()
    exp = sum(
        (int.from_bytes(hashlib.md5(f"{hx}/{w}".encode()).digest()[:8], "little") >> 11)
        / 9007199254740992.0
        for w in range(n0)
    ) / n0
    assert abs(out["mean_energy"][0].as_py() - exp) < 1e-12


def test_rename_and_explode_list(ray_session):
    import ray.data as rd

    t = pa.table({"k": [1, 2], "vals": [[1, 2, 3], [4]]})
    ds = rd.from_arrow(t)
    out = rel.explode_list(ds, "vals", "v", keep=["k"]).to_pandas()
    assert out.values.tolist() == [[1, 1], [1, 2], [1, 3], [2, 4]]
    ren = rel.rename(ds, {"k": "key"}).schema().names
    assert "key" in ren


def test_list_push_pull(ray_session):
    import ray.data as rd

    from search_engine_ray.ops.arrays import list_pull, list_push

    t = pa.table(
        {
            "id": [1, 2, 3],
            "lang": ["en", "de", "en"],
            "tags": [["a", "b"], ["b"], []],
        }
    )
    ds = rd.from_arrow(t)
    pushed = list_push(ds, "tags", "xx", where=("lang", "en")).to_pandas().sort_values("id")
    assert [list(x) for x in pushed["tags"]] == [["a", "b", "xx"], ["b"], ["xx"]]
    pulled = list_pull(rd.from_arrow(t), "tags", "b").to_pandas().sort_values("id")
    assert [list(x) for x in pulled["tags"]] == [["a"], [], []]


def test_group_collect(ray_session):
    import ray.data as rd

    t = pa.table({"k": [1, 1, 2], "v": ["x", "y", "z"]})
    out = rel.group_collect(rd.from_arrow(t), "k", ["v"]).to_pandas().sort_values("k")
    got = {int(r["k"]): sorted(d["v"] for d in r["rows"]) for _, r in out.iterrows()}
    assert got == {1: ["x", "y"], 2: ["z"]}


def test_two_key_join(ray_session, con):
    import ray.data as rd

    # R4 compound-key join (reference let+$expr, pipelines.py:94-112)
    li = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_quantity"])
    import pyarrow.parquet as pq

    small = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_linenumber"])
    small = small.slice(0, 100).rename_columns(["r_orderkey", "r_partkey", "r_linenumber"])
    out = rel.broadcast_join(
        li, small, on=["l_orderkey", "l_partkey"], right_on=["r_orderkey", "r_partkey"], how="inner"
    ).to_pandas()
    exp = con.sql(
        "WITH s AS (SELECT l_orderkey r_orderkey, l_partkey r_partkey, l_linenumber r_linenumber "
        "FROM lineitem LIMIT 100) "
        "SELECT l.l_orderkey, l.l_partkey, l.l_quantity, s.r_linenumber "
        "FROM lineitem l JOIN s ON l.l_orderkey = s.r_orderkey AND l.l_partkey = s.r_partkey"
    ).df()
    assert len(out) == len(exp)


def test_ivf_search_batch(ray_session, tmp_path):
    import ray.data as rd

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    idx = ann.IVFIndex.build(emb, str(tmp_path / "ivfb"), n_clusters=8)
    qt = pd.read_parquet(f"{SF}/embeddings.parquet").head(3)
    queries = np.stack(qt["embedding"].to_numpy()).astype(np.float64)
    qids = qt["vec_id"].to_numpy()
    # nprobe = all clusters -> exact: must equal brute force incl. self
    out = idx.search_batch(queries, qids, k=5, nprobe=8).to_pandas()
    brute = ann.cosine_topk(emb, queries, qids, k=5, exclude_self=False).to_pandas()
    got = out.sort_values(["qid", "cos", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)
    exp = brute.sort_values(["qid", "cos", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["qid", "vec_id", "cos"]], exp[["qid", "vec_id", "cos"]], check_dtype=False)


def test_minhash_join_verify_matches_broadcast(ray_session):
    import ray.data as rd

    base = [" ".join(f"tk{j}_{i}" for j in range(25)) for i in range(25)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    rows += [{"doc_id": 1000 + i, "text": t + " tail"} for i, t in enumerate(base[:8])]
    ds = rd.from_items(rows)
    a = dd.minhash_lsh_pairs(ds, threshold=0.5, verify="broadcast").to_pandas()
    b = dd.minhash_lsh_pairs(ds, threshold=0.5, verify="join").to_pandas()
    ka = sorted(zip(a["a"], a["b"], a["jaccard"]))
    kb = sorted(zip(b["a"], b["b"], b["jaccard"]))
    assert ka == kb and len(ka) >= 8


def test_ngram_jaccard_exact_recall(documents, con):
    """ngram_jaccard_pairs vs brute-force all-pairs SQL: shared-shingle
    blocking recall is exact, values match DuckDB half-up rounding."""
    import pyarrow.compute as pc

    def _perturb(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(t["doc_id"], 1_000_000),
                "text": pc.binary_join_element_wise(t["text"], "zz_dup_marker", " "),
            }
        )

    both = documents.select_columns(["doc_id", "text"]).union(
        documents.select_columns(["doc_id", "text"]).map_batches(_perturb, batch_format="pyarrow")
    )
    out = dd.ngram_jaccard_pairs(both, threshold=0.5).to_pandas()
    exp = con.sql(
        """
        WITH both_docs AS (SELECT doc_id, text FROM documents
             UNION ALL SELECT doc_id + 1000000, text || ' zz_dup_marker' FROM documents),
        tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM both_docs),
        sh AS (SELECT doc_id,
               CASE WHEN len(ts) >= 3 THEN
                 list_distinct(list_transform(range(1, len(ts) - 1),
                                              j -> ts[j] || ' ' || ts[j+1] || ' ' || ts[j+2]))
                    WHEN len(ts) > 0 THEN [array_to_string(ts, ' ')] ELSE [] END AS shingles
               FROM tok),
        e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        sizes AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY 1),
        inter AS (SELECT e1.doc_id AS a, e2.doc_id AS b, count(*) AS i
                  FROM e e1 JOIN e e2 ON e1.s = e2.s AND e1.doc_id < e2.doc_id GROUP BY 1, 2)
        SELECT a, b, round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jaccard
        FROM inter JOIN sizes sa ON inter.a = sa.doc_id JOIN sizes sb ON inter.b = sb.doc_id
        WHERE round(i::DOUBLE / (sa.sz + sb.sz - i), 4) >= 0.5
        """
    ).df()
    assert_frames_equal(out, exp)
    assert len(out) >= documents.count()  # every planted pair found


def test_broadcast_map_enrich(lineitem, con):
    mapping = {"R": "returned", "N": "none", "A": "ack"}
    out = rel.broadcast_map_enrich(
        lineitem.select_columns(["l_orderkey", "l_linenumber", "l_returnflag"]),
        mapping, "l_returnflag", "flag_name", default="?",
    ).to_pandas()
    exp = con.sql(
        "SELECT l_orderkey, l_linenumber, l_returnflag, "
        "CASE l_returnflag WHEN 'R' THEN 'returned' WHEN 'N' THEN 'none' "
        "WHEN 'A' THEN 'ack' ELSE '?' END AS flag_name FROM lineitem"
    ).df()
    assert_frames_equal(out, exp)


def test_group_best_with_aggs(lineitem, con):
    out = rel.group_best_with_aggs(
        lineitem.select_columns(["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]),
        "l_orderkey",
        ["l_extendedprice", "l_linenumber"],
        descending=[True, False],
        sum_cols={"qty_sum": "l_quantity"},
        count_alias="n_lines",
    ).to_pandas()
    exp = con.sql(
        """
        WITH best AS (
          SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
          QUALIFY row_number() OVER (PARTITION BY l_orderkey
                  ORDER BY l_extendedprice DESC, l_linenumber) = 1),
        agg AS (SELECT l_orderkey, sum(l_quantity) AS qty_sum, count(*) AS n_lines
                FROM lineitem GROUP BY 1)
        SELECT b.*, a.qty_sum, a.n_lines FROM best b JOIN agg a USING (l_orderkey)
        """
    ).df()
    assert_frames_equal(out, exp)


def test_sinks_upsert_full_refresh_append(ray_session, tmp_path, documents, con):
    import ray.data as rd

    from search_engine_ray.ops import sinks

    base = documents.select_columns(["doc_id", "lang", "n_chars"])
    out_dir = str(tmp_path / "upsert")
    # E4: base write, then an upsert batch overwriting one partition
    sinks.upsert_partitions(base, out_dir, ["lang"])
    upd = rel.project(
        rel.filter_conditions(base, [("lang", "==", "en")]),
        keep=["doc_id", "lang"],
        exprs={"n_chars": lambda t: pa.compute.add(t["n_chars"], 7)},
    )
    sinks.upsert_partitions(upd, out_dir, ["lang"])
    back = rd.read_parquet(out_dir).to_pandas()
    exp = con.sql(
        "SELECT doc_id, n_chars + CASE WHEN lang='en' THEN 7 ELSE 0 END AS n_chars, "
        "lang FROM documents"
    ).df()
    back["lang"] = back["lang"].astype(str)
    assert_frames_equal(back, exp)
    # E5: second refresh replaces the first snapshot entirely
    ref_dir = str(tmp_path / "refresh")
    sinks.full_refresh(base, ref_dir)
    sinks.full_refresh(rel.filter_conditions(base, [("lang", "==", "de")]), ref_dir)
    n_de = int(con.sql("SELECT count(*) FROM documents WHERE lang = 'de'").fetchone()[0])
    assert rd.read_parquet(ref_dir).count() == n_de
    # E8: append-only — each call adds a file, nothing is rewritten
    log_dir = str(tmp_path / "log")
    sinks.append_log(pa.table({"q": ["a"], "total": [1]}), log_dir)
    sinks.append_log(pa.table({"q": ["b"], "total": [2]}), log_dir)
    log = sinks.read_log(log_dir).to_pandas().sort_values("q").reset_index(drop=True)
    assert log["q"].tolist() == ["a", "b"] and log["total"].tolist() == [1, 2]


def test_multimodal_decode_selection(ray_session):
    """decode='auto' selects real iff Pillow imports; decode='real'
    raises cleanly without it; the fake path stays deterministic."""
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    d = DecodeAndFeaturize(feature_dim=8, decode="auto")
    assert d.decode == ("real" if have_pil else "fake")
    if not have_pil:
        with pytest.raises(NotImplementedError):
            DecodeAndFeaturize(feature_dim=8, decode="real")
    else:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("L", (16, 16), color=128).save(buf, format="PNG")
        real = DecodeAndFeaturize(feature_dim=8, decode="real")
        f = real._features(buf.getvalue())
        assert f.shape == (8,) and abs(float(f.mean()) - 128 / 255) < 0.01
        # corrupt payloads degrade to zeros, never raise
        assert (real._features(b"not an image") == 0).all()


def test_window_aggregate(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    got = rel.window_aggregate(
        ev, "ts", 3600, {"n": ("count", "value"), "sum_value": ("sum", "value")},
        keys=["event_type"],
    ).to_pandas()
    exp = con.sql(
        "SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS window_start, "
        "event_type, count(*) AS n, sum(value) AS sum_value FROM events GROUP BY 1, 2"
    ).df()
    got["sum_value"] = got["sum_value"].round(6)
    exp["sum_value"] = exp["sum_value"].round(6)
    assert_frames_equal(got, exp)


def test_asof_join_vs_duckdb(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "event_type", "value"])
    left = rel.filter_conditions(ev, [("event_type", "==", "purchase")]).select_columns(
        ["event_id", "user_id", "ts"]
    )
    right = rel.grouped_aggregate(
        rel.filter_conditions(ev, [("event_type", "==", "click")]).select_columns(
            ["user_id", "ts", "value"]
        ),
        ["user_id", "ts"],
        {"click_value": ("max", "value")},
    )
    got = rel.asof_join(left, right, by="user_id", ts_col="ts").to_pandas()
    got["ts"] = got["ts"].astype("datetime64[us]").astype("int64")
    got["right_ts"] = got["right_ts"].astype("datetime64[us]").astype("int64")
    exp = con.sql(
        "WITH clicks AS (SELECT user_id, ts, max(value) AS click_value "
        "FROM events WHERE event_type='click' GROUP BY 1,2), "
        "purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase') "
        "SELECT p.event_id, p.user_id, CAST(epoch_us(p.ts) AS BIGINT) AS ts, "
        "CAST(epoch_us(c.ts) AS BIGINT) AS right_ts, c.click_value "
        "FROM purchases p ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts"
    ).df()
    assert_frames_equal(got, exp)


def test_asof_join_forward_and_validation(ray_session):
    import ray.data as rd

    l = rd.from_pandas(pd.DataFrame({
        "id": [1, 2, 3], "k": [7, 7, 8],
        "ts": pd.to_datetime([10, 20, 30], unit="s").astype("datetime64[us]"),
    }))
    r = rd.from_pandas(pd.DataFrame({
        "k": [7, 7, 8], "v": [1.0, 2.0, 3.0],
        "ts": pd.to_datetime([15, 25, 5], unit="s").astype("datetime64[us]"),
    }))
    fwd = rel.asof_join(l, r, by="k", ts_col="ts", direction="forward").to_pandas()
    # id=1 (t=10) -> first k=7 right at/after 10 = t=15 (v=1); id=2 (t=20) -> t=25 (v=2);
    # id=3 (k=8, t=30) has no right at/after 30 -> dropped
    assert sorted(zip(fwd["id"], fwd["v"])) == [(1, 1.0), (2, 2.0)]
    with pytest.raises(ValueError):
        rel.asof_join(l, r, by="k", ts_col="ts", direction="sideways")
    with pytest.raises(ValueError):
        # overlapping non-key column name
        rel.asof_join(l, l, by="k", ts_col="ts")


def test_sessionize(ray_session):
    import ray.data as rd

    ev = pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 6],
        "u": [7, 7, 7, 8, 8, 7],
        "ts": pd.to_datetime(
            # u=7: 0s, 10s, 2000s (gap>30min? no, gap_s=60 here) ...
            [0, 10, 100, 5, 6, 15], unit="s"
        ).astype("datetime64[us]"),
    })
    got = rel.sessionize(
        rd.from_pandas(ev), by="u", ts_col="ts", gap_s=60, tiebreak="id"
    ).to_pandas().sort_values("id")
    # u=7 ordered by ts: id1(0s) s1, id2(10s) s1, id6(15s) s1, id3(100s) s2
    # u=8: id4(5s) s1, id5(6s) s1
    assert dict(zip(got["id"], got["session_seq"])) == {
        1: 1, 2: 1, 6: 1, 3: 2, 4: 1, 5: 1,
    }


def test_range_join(ray_session):
    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "id": [1, 2, 3, 4],
        "v": [5.0, 15.0, 25.0, 99.0],
    }))
    # overlapping bands: [0,20) and [10,30) -> v=15 matches BOTH;
    # v=99 matches nothing and is dropped
    iv = pa.table({
        "band": ["a", "b"],
        "lo": [0.0, 10.0],
        "hi": [20.0, 30.0],
    })
    got = rel.range_join(ds, iv, "v").to_pandas()
    pairs = sorted(zip(got["id"], got["band"]))
    assert pairs == [(1, "a"), (2, "a"), (2, "b"), (3, "b")]
    assert set(got.columns) == {"id", "v", "band", "lo", "hi"}
    # boundary semantics: lo inclusive, hi exclusive
    edge = rd.from_pandas(pd.DataFrame({"id": [9], "v": [20.0]}))
    e = rel.range_join(edge, iv, "v").to_pandas()
    assert list(e["band"]) == ["b"]
    # empty result keeps the full output schema (to_pandas on a fully
    # empty Dataset drops columns, so assert on the Dataset schema)
    none = rd.from_pandas(pd.DataFrame({"id": [9], "v": [-1.0]}))
    nds = rel.range_join(none, iv, "v")
    assert nds.count() == 0
    assert set(nds.schema().names) == {"id", "v", "band", "lo", "hi"}
    with pytest.raises(ValueError):
        rel.range_join(ds, pa.table({"v": [1.0], "lo": [0.0], "hi": [1.0]}), "v")


def test_kmv_distinct(ray_session):
    import ray.data as rd

    import search_engine_ray.ops.sketch as sk

    # exact-fallback path: distinct(200) < k=512 -> exact count
    ds = rd.from_pandas(pd.DataFrame({"x": np.arange(1000) % 200}))
    assert sk.kmv_distinct(ds, "x", k=512) == 200.0
    # estimator path: k=64 < 200 distinct -> within 35% of truth
    est = sk.kmv_distinct(ds, "x", k=64)
    assert 130 <= est <= 270, est


def test_hll_distinct(ray_session):
    import ray.data as rd

    import search_engine_ray.ops.sketch as sk

    # brute HLL over the same md5 hashes == the distributed op,
    # regardless of how values land in blocks
    vals = (np.arange(3000) % 700).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"x": vals}), override_num_blocks=7)
    est = sk.hll_distinct(ds, "x", p=6)
    h = sk._md5_upper64([str(v) for v in sorted(set(vals.tolist()))])
    reg = (h >> np.uint64(58)).astype(np.int64)
    low = h & np.uint64((1 << 58) - 1)
    rho = (58 - sk._bit_length_u64(low) + 1).astype(np.int64)
    mx = np.zeros(64, np.int64)
    np.maximum.at(mx, reg, rho)
    zeros = int((mx == 0).sum())
    s_int = int(sum(1 << (59 - int(v)) for v in mx))
    raw = (0.709 * 4096.0) * float(1 << 59) / float(s_int)
    exp = 64.0 * np.log(64.0 / zeros) if (raw <= 160.0 and zeros > 0) else raw
    from search_engine_ray.ops.rounding import round_half_up

    assert est == round_half_up(exp, 4)
    # sane accuracy at m=64 (~13% rel error): 700 true distinct
    assert 450 <= est <= 1000, est
    # small-cardinality input exercises the linear-counting branch
    tiny = rd.from_pandas(pd.DataFrame({"x": np.arange(12)}))
    est2 = sk.hll_distinct(tiny, "x", p=6)
    assert 6 <= est2 <= 25, est2


def test_extended_stats(ray_session):
    import ray.data as rd

    import search_engine_ray.ops.sketch as sk
    from search_engine_ray.ops.rounding import round_half_up

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"g": rng.integers(0, 3, 500).astype(str),
                       "v": rng.integers(1, 51, 500).astype(np.float64)})
    out = sk.extended_stats(rd.from_pandas(df, override_num_blocks=5), "g", "v")
    assert list(out["g"]) == sorted(out["g"])
    for _, row in out.iterrows():
        x = df.loc[df["g"] == row["g"], "v"].to_numpy()
        avg = x.sum() / x.size
        var = (x * x).sum() / x.size - avg * avg
        std = np.sqrt(max(var, 0.0))
        assert row["n"] == x.size
        assert row["sum_v"] == round_half_up(x.sum(), 4)
        assert row["avg_v"] == round_half_up(avg, 4)
        assert row["var_v"] == round_half_up(var, 4)
        assert row["std_v"] == round_half_up(std, 4)
        assert row["upper_sd"] == round_half_up(avg + 2.0 * std, 4)
        assert row["lower_sd"] == round_half_up(avg - 2.0 * std, 4)


def test_hash_sample(ray_session):
    import ray.data as rd

    import search_engine_ray.ops.sketch as sk

    ds = rd.from_pandas(pd.DataFrame({"id": np.arange(2000), "v": np.arange(2000) * 2}))
    out = sk.hash_sample(ds, "id", 0.25).to_pandas()
    # deterministic: the same call yields the same rows
    out2 = sk.hash_sample(ds, "id", 0.25).to_pandas()
    assert sorted(out["id"]) == sorted(out2["id"])
    assert 0.18 < len(out) / 2000 < 0.32
    # a different salt draws an independent sample
    out3 = sk.hash_sample(ds, "id", 0.25, salt="x").to_pandas()
    assert sorted(out3["id"]) != sorted(out["id"])
    # edge rates
    assert sk.hash_sample(ds, "id", 0.0).count() == 0
    assert sk.hash_sample(ds, "id", 1.0).count() == 2000
    with pytest.raises(ValueError):
        sk.hash_sample(ds, "id", 1.5)


def test_stratified_hash_sample(ray_session):
    import ray.data as rd

    import search_engine_ray.ops.sketch as sk

    df = pd.DataFrame({"id": np.arange(3000), "grp": ["a", "b", "c"] * 1000})
    ds = rd.from_pandas(df)
    out = sk.stratified_hash_sample(
        ds, "id", {"a": 1.0, "b": 0.0}, "grp", default_rate=0.5
    ).to_pandas()
    by = out.groupby("grp").size()
    assert by.get("a", 0) == 1000      # rate 1.0 keeps all
    assert by.get("b", 0) == 0         # rate 0.0 drops all
    assert 350 < by.get("c", 0) < 650  # default 0.5
    # consistent with hash_sample: same hash, same salt -> the kept
    # 'c' ids are exactly hash_sample(rate=0.5) of the c stratum
    c_only = rd.from_pandas(df[df["grp"] == "c"])
    plain = sk.hash_sample(c_only, "id", 0.5).to_pandas()
    assert sorted(out[out["grp"] == "c"]["id"]) == sorted(plain["id"])
    with pytest.raises(ValueError):
        sk.stratified_hash_sample(ds, "id", {"a": 2.0}, "grp")


def test_curate_pipeline(ray_session):
    import ray.data as rd

    from search_engine_ray.pipelines import curate

    # high-uniqueness English text: ~160 distinct alphabetic words
    # plus en stopword markers -> quality well above the threshold
    from itertools import product

    words = ["".join(p) for p in product("abcdefghijkl", repeat=2)][:160]
    good = "the and is of to " + " ".join(words)
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [good, good, "der hund und die katze sind schnell und laut", "x"],
    })
    out = curate(rd.from_pandas(docs)).to_pandas()
    # doc 2 is an exact dup of 1 (min id kept); 3 is German; 4 too low quality
    assert list(out["doc_id"]) == [1]
    assert list(out["lang_id"]) == ["en"]
    # all-filtered input degrades to an empty result, not an error
    none = curate(rd.from_pandas(docs.assign(text="x y z")))
    assert none.count() == 0


def test_histogram_quantiles_vs_duckdb(ray_session, con):
    import ray.data as rd

    import search_engine_ray.ops.sketch as sk

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    got = sk.histogram_quantiles(ev, "value", [0.0, 0.25, 0.5, 0.75, 1.0])
    for _, row in got.iterrows():
        exp = con.sql(
            f"SELECT quantile_disc(value, {row['q']}) FROM events"
        ).fetchone()[0]
        assert row["value"] == exp, (row["q"], row["value"], exp)


def test_group_topn_vs_duckdb(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "event_type", "value"])
    got = rel.group_topn(
        ev, "event_type", ["value", "event_id"], n=5, descending=[True, False]
    ).to_pandas()[["event_type", "event_id", "value"]]
    exp = con.sql(
        "SELECT event_type, event_id, value FROM events QUALIFY row_number() OVER ("
        "PARTITION BY event_type ORDER BY value DESC, event_id) <= 5"
    ).df()
    assert_frames_equal(got, exp)


def test_group_topn_small(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "k": ["a", "a", "a", "b"], "id": [1, 2, 3, 4], "v": [9, 9, 1, 5],
    }))
    out = rel.group_topn(ds, "k", ["v", "id"], n=2, descending=[True, False]).to_pandas()
    assert sorted(zip(out["k"], out["id"])) == [("a", 1), ("a", 2), ("b", 4)]


def test_connected_components(ray_session):
    import ray.data as rd

    # chain 1-2-3 (diameter 2 forces >1 propagation round), pair 10-11,
    # and a duplicate edge; singletons (docs in no pair) are excluded
    pairs = rd.from_pandas(pd.DataFrame({
        "a": [2, 1, 10, 1],
        "b": [3, 2, 11, 2],
    }))
    got = dd.connected_components(pairs).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == [1, 2, 3, 10, 11]
    assert list(got["component"]) == [1, 1, 1, 10, 10]
    # string ids exercise the non-numeric convergence path
    spairs = rd.from_pandas(pd.DataFrame({
        "a": ["b", "a"], "b": ["c", "b"],
    }))
    sgot = dd.connected_components(spairs).to_pandas().sort_values("doc_id")
    assert list(sgot["component"]) == ["a", "a", "a"]


def test_drop_near_duplicates(ray_session):
    import ray.data as rd

    # corpus 1..8; clusters {1,2,3} and {10,11} (10/11 not in corpus
    # ids 4..8) — survivors keep the min-id member plus all singletons
    docs = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
                                        "text": list("abcdefgh")}))
    comps = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 7, 8],
        "component": [1, 1, 1, 7, 7],
    }))
    for method in ("broadcast", "shuffle"):
        out = dd.drop_near_duplicates(docs, comps, method=method).to_pandas()
        assert sorted(out["doc_id"]) == [1, 4, 5, 6, 7], method
        assert sorted(out.columns) == ["doc_id", "text"], method
    # empty component set: everything survives
    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                         "component": pd.array([], dtype="int64")}))
    out = dd.drop_near_duplicates(docs, empty).to_pandas()
    assert len(out) == 8
    with pytest.raises(ValueError):
        dd.drop_near_duplicates(docs, comps, method="sort")


def test_hash_join_vs_duckdb(ray_session, con):
    import ray.data as rd

    li = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    got = rel.hash_join(
        li, orders, on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8
    ).to_pandas()[["l_orderkey", "l_quantity", "o_custkey"]]
    exp = con.sql(
        "SELECT l.l_orderkey, l.l_quantity, o.o_custkey "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ).df()
    assert_frames_equal(got, exp)


def test_bloom_semi_filter_and_prefilter_join(ray_session):
    import ray.data as rd

    left = rd.from_pandas(pd.DataFrame({"k": np.arange(10000), "a": np.arange(10000)}))
    right = rd.from_pandas(pd.DataFrame({"k": np.arange(100), "b": np.arange(100) * 3}))
    # conservative: every true match survives; FPs only add a few rows
    kept = rel.bloom_semi_filter(left, "k", right.select_columns(["k"])).to_pandas()
    assert set(range(100)) <= set(kept["k"])
    assert len(kept) < 400  # 10k rows shrunk to ~matches (+ ~2-3% FP)
    # prefiltered join == plain join, exactly
    plain = rel.hash_join(left, right, on=["k"], num_partitions=8).to_pandas()
    pre = rel.hash_join(
        left, right, on=["k"], num_partitions=8, prefilter=True
    ).to_pandas()
    cols = sorted(plain.columns)
    pd.testing.assert_frame_equal(
        plain[cols].sort_values(cols).reset_index(drop=True),
        pre[cols].sort_values(cols).reset_index(drop=True),
    )
    with pytest.raises(ValueError):
        rel.hash_join(left, right, on=["k"], how="left_outer", prefilter=True)
    # string keys hash consistently too
    sl = rd.from_pandas(pd.DataFrame({"s": [f"u{i}" for i in range(1000)]}))
    sr = rd.from_pandas(pd.DataFrame({"s": [f"u{i}" for i in range(0, 1000, 50)]}))
    sk_ = rel.bloom_semi_filter(sl, "s", sr).to_pandas()
    assert set(sr.to_pandas()["s"]) <= set(sk_["s"]) and len(sk_) < 100


def test_hash_join_outer(ray_session):
    import ray.data as rd

    l = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]}))
    r = rd.from_pandas(pd.DataFrame({"j": [2, 3, 4], "b": [200, 300, 400]}))
    out = rel.hash_join(
        l, r, on=["k"], right_on=["j"], how="left_outer", num_partitions=4
    ).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [1, 2, 3]
    assert out.loc[0, "b"] != out.loc[0, "b"]  # NaN for unmatched k=1
    assert list(out["b"].dropna().astype("int64")) == [200, 300]


def test_count_min_sketch(ray_session):
    """CM estimates are always >= the true count, equal for values
    with collision-free cells at this scale, and partials merge by
    addition (linear sketch)."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.ops.sketch import CountMinSketch, cm_sketch

    vals = ["a"] * 50 + ["b"] * 7 + [f"x{i}" for i in range(20)]
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(4)
    sk = cm_sketch(ds, "v", depth=4, width=1024)
    est = sk.estimate(["a", "b", "x0", "zzz_absent"])
    assert est[0] >= 50 and est[1] >= 7 and est[2] >= 1 and est[3] >= 0
    # width 1024 vs 22 distinct values: overestimate prob ~ (22/1024)^4
    assert est[0] == 50 and est[1] == 7 and est[2] == 1 and est[3] == 0
    # linearity: two half-sketches merged == one full sketch
    h1, h2 = CountMinSketch(4, 1024), CountMinSketch(4, 1024)
    h1.add_values(vals[:30])
    h2.add_values(vals[30:])
    import numpy as np

    assert np.array_equal(h1.merge(h2).grid, sk.grid)


def test_hopping_window_aggregate(ray_session):
    """HOP windows (every=60s, slide=20s): each event lands in exactly
    3 windows (minus the epoch-0 edge), counts/sums match a brute
    per-window scan."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.ops import relational as rel

    rng = np.random.default_rng(5)
    ep = np.sort(rng.integers(0, 600, size=200)).astype("int64")
    t = pa.table(
        {
            "ts": pa.array(ep * 1_000_000, pa.timestamp("us")),
            "value": np.ones(200),
        }
    )
    out = (
        rel.window_aggregate(
            rd.from_arrow(t), "ts", 60, {"n": ("count", "value")}, slide_s=20
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # brute-force expectation
    starts = np.arange(0, 600, 20)
    exp = {
        int(w): int(((ep >= w) & (ep < w + 60)).sum())
        for w in starts
        if ((ep >= w) & (ep < w + 60)).any()
    }
    got = dict(zip(out["window_start"].astype(int), out["n"].astype(int)))
    assert got == exp
    # total assignments = sum over windows covering each event
    cover = np.minimum(ep // 20, 2) + 1  # epoch-edge events cover fewer
    assert out["n"].sum() == cover.sum()
    with pytest.raises(ValueError):
        rel.window_aggregate(rd.from_arrow(t), "ts", 60, {"n": ("count", "value")}, slide_s=0)


def test_mix_to_budget(ray_session):
    """Token-budget mixing: an over-budget source samples down toward
    its budget, a source whose budget exceeds its mass keeps every
    doc, and unbudgeted sources are dropped entirely."""
    import pandas as pd
    import ray.data as rd

    import search_engine_ray.ops.sketch as sk

    docs = pd.DataFrame({
        "doc_id": range(300),
        "text": ["tok " * 10] * 300,                    # 10 tokens/doc
        "source": ["big"] * 200 + ["small"] * 50 + ["other"] * 50,
    })
    ds = rd.from_pandas(docs)
    out = sk.mix_to_budget(
        ds, {"big": 500, "small": 10_000}
    ).to_pandas()
    assert set(out["source"]) <= {"big", "small"}
    # small: budget 10k >> 500 tokens -> rate 1.0, all 50 kept
    assert (out["source"] == "small").sum() == 50
    # big: 2000 tokens, budget 500 -> rate .25; hash sampling keeps
    # ~50 of 200 (deterministic; just bound it loosely)
    nb = (out["source"] == "big").sum()
    assert 20 <= nb <= 90
    # deterministic across runs
    out2 = sk.mix_to_budget(ds, {"big": 500, "small": 10_000}).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_rollup_aggregate(lineitem, con):
    out = rel.rollup_aggregate(
        lineitem, ["l_returnflag", "l_linestatus"], "l_quantity", alias="s"
    ).to_pandas()
    exp = con.sql(
        "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS s "
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
    ).df()
    assert_frames_equal(out, exp)
    # level shape: fine + per-flag + grand total
    nflags = con.sql("SELECT count(DISTINCT l_returnflag) FROM lineitem").fetchone()[0]
    assert (out["l_returnflag"].isna() & out["l_linestatus"].isna()).sum() == 1
    assert (out["l_returnflag"].notna() & out["l_linestatus"].isna()).sum() == nflags
    with pytest.raises(ValueError):
        rel.rollup_aggregate(lineitem, ["l_returnflag"], "l_quantity", op="mean")


def test_pivot_aggregate(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type", "value"])
    # count pivot
    out = rel.pivot_aggregate(ev, "user_id", "event_type", ["click", "view"]).to_pandas()
    exp = con.sql(
        "SELECT user_id, count(*) FILTER (WHERE event_type='click') AS click, "
        "count(*) FILTER (WHERE event_type='view') AS view FROM events GROUP BY 1"
    ).df()
    assert_frames_equal(out, exp)
    # sum pivot
    out2 = rel.pivot_aggregate(ev, "user_id", "event_type", ["click"], value_col="value").to_pandas()
    out2["click"] = out2["click"].round(4)
    exp2 = con.sql(
        "SELECT user_id, round(COALESCE(sum(value) FILTER (WHERE event_type='click'), 0), 4) "
        "AS click FROM events GROUP BY 1"
    ).df()
    assert_frames_equal(out2, exp2)


def test_grouped_quantiles(lineitem, con):
    import search_engine_ray.ops.sketch as sk

    out = sk.grouped_quantiles(lineitem, "l_returnflag", "l_quantity",
                               [0.0, 0.5, 1.0]).to_pandas()
    exp = con.sql(
        "SELECT l_returnflag, unnest([CAST(0.0 AS DOUBLE), 0.5, 1.0]) AS q, "
        "unnest([quantile_disc(l_quantity, 0.0), quantile_disc(l_quantity, 0.5), "
        "quantile_disc(l_quantity, 1.0)]) AS value FROM lineitem GROUP BY 1"
    ).df()
    assert_frames_equal(out, exp)
    with pytest.raises(ValueError):
        sk.grouped_quantiles(lineitem, "l_returnflag", "l_quantity", [])


def test_normalize_text(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "id": [1, 2, 3],
        "text": ["Café  NAÏVE\tmix", "Ångström ß", None],
    }))
    out = txt.normalize_text(ds, "text").to_pandas().sort_values("id")
    assert out["norm"].tolist() == ["cafe naive mix", "angstrom ß", ""]


def test_window_functions_ties_and_leads(ray_session, con):
    import ray.data as rd

    df = pd.DataFrame({
        "p": ["a"] * 5 + ["b"] * 2,
        "v": [10, 10, 20, 20, 30, 7, 7],
        "rid": range(7),
    })
    out = rel.window_functions(
        rd.from_pandas(df), "p", ["v", "rid"],
        {
            "rn": ("row_number",),
            "rnk": ("rank",),
            "drnk": ("dense_rank",),
            "nxt": ("lead", "v", 1, -1),
            "prv": ("lag", "v", 2, -1),
        },
    ).to_pandas()
    con.sql("CREATE OR REPLACE VIEW wf AS SELECT * FROM df")
    exp = duckdb.sql(
        "SELECT p, v, rid, row_number() OVER w AS rn, rank() OVER w AS rnk, "
        "dense_rank() OVER w AS drnk, "
        "COALESCE(lead(v, 1) OVER w, -1) AS nxt, "
        "COALESCE(lag(v, 2) OVER w, -1) AS prv "
        "FROM df WINDOW w AS (PARTITION BY p ORDER BY v, rid)"
    ).df()
    assert_frames_equal(out, exp)
    # rank ties when ordering ONLY by v: rank repeats, dense_rank compacts
    out2 = rel.window_functions(
        rd.from_pandas(df[df["p"] == "a"]), "p", ["v"],
        {"rnk": ("rank",), "drnk": ("dense_rank",)},
    ).to_pandas().sort_values(["v"]).reset_index(drop=True)
    assert out2["rnk"].tolist() == [1, 1, 3, 3, 5]
    assert out2["drnk"].tolist() == [1, 1, 2, 2, 3]
    with pytest.raises(ValueError):
        rel.window_functions(rd.from_pandas(df), "p", ["v"], {"x": ("median", "v")})


def test_window_first_last_nth(ray_session, con):
    import ray.data as rd

    df = pd.DataFrame({
        "p": ["a"] * 4 + ["b"] * 2 + ["c"],
        "v": [10, 30, 20, 40, 7, 9, 5],
        "rid": range(7),
    })
    out = (
        rel.window_functions(
            rd.from_pandas(df), "p", ["v", "rid"],
            {
                "fv": ("first_value", "v"),
                "lv": ("last_value", "v"),
                "n2": ("nth_value", "v", 2),
                "n5": ("nth_value", "v", 5),  # > every partition size -> NULL
            },
        )
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    exp = duckdb.sql(
        "SELECT p, v, rid, first_value(v) OVER w AS fv, last_value(v) OVER w AS lv, "
        "nth_value(v, 2) OVER w AS n2, nth_value(v, 5) OVER w AS n5 "
        "FROM df WINDOW w AS (PARTITION BY p ORDER BY v, rid "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) ORDER BY rid"
    ).df()
    assert out["fv"].tolist() == exp["fv"].tolist()
    assert out["lv"].tolist() == exp["lv"].tolist()
    # n2 is NULL for the single-row partition 'c'; n5 NULL everywhere
    assert out["n2"].fillna(-1).tolist() == exp["n2"].fillna(-1).tolist()
    assert out["n5"].isna().all() and exp["n5"].isna().all()


def test_matrix_stats_nulls(ray_session):
    import ray.data as rd

    import search_engine_ray.ops.sketch as sk

    df = pd.DataFrame({
        "x": [1.0, 2.0, 3.0, np.nan, 5.0],
        "y": [2.0, 4.0, 6.0, 1.0, np.nan],
    })
    out = sk.matrix_stats(rd.from_pandas(df), "x", "y").set_index("stat")["value"]
    # only the 3 fully-non-null rows count; y = 2x exactly -> corr 1
    assert out["count"] == 3.0
    assert out["mean_x"] == 2.0 and out["mean_y"] == 4.0
    assert abs(out["corr"] - 1.0) < 1e-9
    # values are 4-dp rounded (0.6667 vs 1.3333), so compare loosely
    assert abs(out["covar"] - 2 * out["var_x"]) < 1e-3


def test_cumsum_window_and_calendar_agg(ray_session, con):
    import ray.data as rd

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    # calendar month buckets == date_trunc
    out = rel.calendar_window_aggregate(
        ev, "ts", "month", {"n": ("count", "value")}, keys=["event_type"]
    ).to_pandas()
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    exp = con.sql(
        "SELECT date_trunc('month', ts) AS window_start, event_type, count(*) AS n "
        "FROM events GROUP BY 1, 2"
    ).df()
    assert_frames_equal(out, exp)
    with pytest.raises(ValueError):
        rel.calendar_window_aggregate(ev, "ts", "fortnight", {"n": ("count", "value")})
    # cumsum window spec
    df = pd.DataFrame({"p": ["a"] * 3 + ["b"] * 2, "o": [1, 2, 3, 1, 2],
                       "v": [5, 1, 2, 10, 10]})
    got = rel.window_functions(rd.from_pandas(df), "p", ["o"],
                               {"cs": ("cumsum", "v")}).to_pandas()
    got = got.sort_values(["p", "o"])
    assert got["cs"].tolist() == [5, 6, 8, 10, 20]


def test_percentile_ranks_exact(lineitem, con):
    import search_engine_ray.ops.sketch as sk

    out = sk.percentile_ranks(lineitem, "l_quantity", [1.0, 50.0])
    exp = con.sql(
        "SELECT round(100.0 * (count(*) FILTER (WHERE l_quantity <= 1.0)) / count(*), 4) a, "
        "round(100.0 * (count(*) FILTER (WHERE l_quantity <= 50.0)) / count(*), 4) b "
        "FROM lineitem"
    ).fetchone()
    assert out["pct"].tolist() == [exp[0], exp[1]]
    assert out["pct"].iloc[1] == 100.0  # max quantity is 50
    with pytest.raises(ValueError):
        sk.percentile_ranks(lineitem, "l_quantity", [])


def test_dictionary_terms_export(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.config import FieldSpec, IndexConfig
    from search_engine_ray.index import build_index
    from search_engine_ray.query import SearchEngine

    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b b", "b c", "a"],
    })
    cfg = IndexConfig(fields=(FieldSpec("text", "c"),), num_buckets=2, num_parts=2,
                      docmap_cols=(), id_cols=("doc_id",), use_native_id=True)
    out = str(tmp_path / "dict")
    build_index(rd.from_arrow(t), out, cfg)
    eng = SearchEngine(out, cfg)
    got = eng.dictionary_terms("text").to_pandas().sort_values("term")
    assert got["term"].tolist() == ["a", "b", "c"]
    assert got["df"].tolist() == [2, 2, 1]  # df = docs, not occurrences


def test_sorted_export_global_order(ray_session, tmp_path, con):
    import glob as g

    import ray.data as rd

    from search_engine_ray.ops import sinks as snk

    # many duplicate keys so range boundaries land INSIDE duplicate
    # runs; unique (k, rid) total order
    df = pd.DataFrame({"k": [i % 7 for i in range(500)], "rid": range(500)})
    out = str(tmp_path / "sorted")
    snk.sorted_export(rd.from_pandas(df), ["k", "rid"], out, num_ranges=4)
    back = rd.read_parquet(out).to_pandas().sort_values("rank")
    exp = df.sort_values(["k", "rid"]).reset_index(drop=True)
    assert back["k"].tolist() == exp["k"].tolist()
    assert back["rid"].tolist() == exp["rid"].tolist()
    assert back["rank"].tolist() == list(range(1, 501))
    # resumable layout: one dir per range
    assert len(g.glob(f"{out}/range=*")) >= 1
    with pytest.raises(ValueError):
        snk.sorted_export(rd.from_pandas(df.head(0)), ["k"], str(tmp_path / "e"))


def test_semantic_dedup_planted(ray_session):
    """SemDeDup marks the HIGHER-id member of every planted same-
    direction pair as the dup; every input row appears exactly once."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16))
    rows = [{"vec_id": i, "embedding": base[i].astype(np.float32).tolist()} for i in range(40)]
    for i in range(8):  # planted: same direction, scaled
        rows.append({"vec_id": 100 + i, "embedding": (base[i] * 1.0001).astype(np.float32).tolist()})
    ds = rd.from_items(rows)
    out = ann.semantic_dedup(ds, threshold=0.99, n_clusters=4, seed=7).to_pandas()
    assert len(out) == 48
    assert out["vec_id"].is_unique
    by_id = out.set_index("vec_id")
    # each planted copy shares its original's cluster and is the dup
    for i in range(8):
        assert by_id.loc[100 + i, "cluster"] == by_id.loc[i, "cluster"]
        assert by_id.loc[100 + i, "is_dup"] == 1
        assert by_id.loc[i, "is_dup"] == 0
    # random 16-dim vectors don't hit cos >= 0.99
    assert int(out["is_dup"].sum()) == 8


def test_spherical_kmeans_deterministic():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((100, 8))
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    c1 = ann.spherical_kmeans(m, 4, 10, 5)
    c2 = ann.spherical_kmeans(m.copy(), 4, 10, 5)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-12)


def test_keep_best_in_component(ray_session):
    """Quality-aware survivor selection keeps the argmax-score member
    per component (tie -> lowest id); singletons always survive."""
    import ray.data as rd

    docs = rd.from_items(
        [
            {"doc_id": 1, "q": 0.5},
            {"doc_id": 2, "q": 0.9},   # comp 1 winner (best score)
            {"doc_id": 3, "q": 0.9},   # comp 1 tie -> loses to id 2
            {"doc_id": 4, "q": 0.1},   # comp 4 winner (only member scored)
            {"doc_id": 5, "q": 0.1},   # comp 4 tie -> loses to id 4
            {"doc_id": 9, "q": 0.0},   # unpaired: survives
        ]
    )
    comps = rd.from_items(
        [
            {"doc_id": 1, "component": 1},
            {"doc_id": 2, "component": 1},
            {"doc_id": 3, "component": 1},
            {"doc_id": 4, "component": 4},
            {"doc_id": 5, "component": 4},
        ]
    )
    out = dd.keep_best_in_component(docs, comps, "q").to_pandas()
    assert sorted(out["doc_id"].tolist()) == [2, 4, 9]
    # empty components -> identity
    empty = comps.filter(lambda r: False)
    out2 = dd.keep_best_in_component(docs, empty, "q").to_pandas()
    assert len(out2) == 6


def test_hard_negatives(ray_session, con):
    """Per anchor: top-k most-similar DIFFERENT-label vectors; no
    same-label (hence no self) row ever appears."""
    import ray.data as rd

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    qdf = con.sql(
        "SELECT vec_id, label, embedding FROM embeddings WHERE vec_id IN (0, 1, 2) ORDER BY vec_id"
    ).df()
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = ann.hard_negatives(
        emb, queries, qdf["vec_id"].to_numpy(), qdf["label"].to_numpy(), k=5
    ).to_pandas()
    exp = con.sql(
        """
        WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qe
                   FROM embeddings WHERE vec_id IN (0,1,2))
        SELECT qid, vec_id, round(
            list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) /
            (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
             sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cos
        FROM embeddings e CROSS JOIN q WHERE e.label <> q.qlabel
        QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, e.vec_id) <= 5
        """
    ).df()
    assert_frames_equal(out[["qid", "vec_id", "cos"]], exp)
    lbl = con.sql("SELECT vec_id, label FROM embeddings").df().set_index("vec_id")["label"]
    qlbl = qdf.set_index("vec_id")["label"]
    for _, r in out.iterrows():
        assert lbl[r["vec_id"]] != qlbl[r["qid"]]


def test_incremental_jaccard_matches_cross_pairs(documents, con, tmp_path):
    """incremental_jaccard_pairs over a STORED shingle index equals the
    brute-force cross-pairs SQL (new shard = perturbed copies vs the
    standing corpus), and the standing corpus is never re-tokenized —
    the second run consumes only the index parquet."""
    import pyarrow.compute as pc

    from search_engine_ray.ops.dedup import incremental_jaccard_pairs, write_shingle_index

    old = documents.select_columns(["doc_id", "text"])
    idx = str(tmp_path / "shingle_idx")
    write_shingle_index(old, idx)

    def _perturb(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(t["doc_id"], 1_000_000),
                "text": pc.binary_join_element_wise(t["text"], "zz_dup_marker", " "),
            }
        )

    new = old.map_batches(_perturb, batch_format="pyarrow")
    out = incremental_jaccard_pairs(idx, new, threshold=0.5).to_pandas()
    exp = con.sql(
        """
        WITH both_docs AS (SELECT doc_id, text FROM documents
             UNION ALL SELECT doc_id + 1000000, text || ' zz_dup_marker' FROM documents),
        tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM both_docs),
        sh AS (SELECT doc_id,
               CASE WHEN len(ts) >= 3 THEN
                 list_distinct(list_transform(range(1, len(ts) - 1),
                                              j -> ts[j] || ' ' || ts[j+1] || ' ' || ts[j+2]))
                    WHEN len(ts) > 0 THEN [array_to_string(ts, ' ')] ELSE [] END AS shingles
               FROM tok),
        e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        sizes AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY 1),
        inter AS (SELECT en.doc_id AS new_id, eo.doc_id AS old_id, count(*) AS i
                  FROM e en JOIN e eo ON en.s = eo.s
                  WHERE en.doc_id >= 1000000 AND eo.doc_id < 1000000 GROUP BY 1, 2)
        SELECT new_id, old_id, round(i::DOUBLE / (sn.sz + so.sz - i), 4) AS jaccard
        FROM inter JOIN sizes sn ON inter.new_id = sn.doc_id
                   JOIN sizes so ON inter.old_id = so.doc_id
        WHERE round(i::DOUBLE / (sn.sz + so.sz - i), 4) >= 0.5
        """
    ).df()
    assert_frames_equal(out, exp)
    # every planted copy pairs with its original
    assert len(out) >= documents.count()
    planted = out[out["new_id"] == out["old_id"] + 1_000_000]
    assert len(planted) == documents.count()


def test_dsir_select_matches_sql(documents, con):
    """dsir_select == the full SQL replay: md5-bucket LMs, smoothed
    log ratios, per-doc sums, deterministic top-N keep."""
    target = documents.map_batches(
        lambda t: t.filter(pa.compute.equal(t["lang"], "en")).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    out = txt.dsir_select(
        documents.select_columns(["doc_id", "text"]), target, top_n=50
    ).to_pandas()
    exp = con.sql(
        """
        WITH tok AS (SELECT doc_id,
                     unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+')) AS tk
                     FROM documents),
        bk AS (SELECT doc_id, CAST(md5_number_upper(tk) % 4096 AS BIGINT) AS b FROM tok),
        tc AS (SELECT b, count(*) AS c FROM bk JOIN documents USING (doc_id)
               WHERE lang = 'en' GROUP BY 1),
        tn AS (SELECT count(*) AS n FROM bk JOIN documents USING (doc_id) WHERE lang = 'en'),
        rc AS (SELECT b, count(*) AS c FROM bk GROUP BY 1),
        rn AS (SELECT count(*) AS n FROM bk),
        lr AS (SELECT r.b, ln((coalesce(t.c, 0) + 1.0) / (tn.n + 4096.0))
                         - ln((r.c + 1.0) / (rn.n + 4096.0)) AS lr
               FROM rc r LEFT JOIN tc t USING (b), tn, rn),
        w AS (SELECT d.doc_id, round(coalesce(sum(lr.lr), 0), 4) AS dsir_logw
              FROM documents d LEFT JOIN bk ON bk.doc_id = d.doc_id
              LEFT JOIN lr ON lr.b = bk.b GROUP BY 1)
        SELECT doc_id, dsir_logw,
               CAST(row_number() OVER (ORDER BY dsir_logw DESC, doc_id) <= 50 AS BIGINT)
               AS selected
        FROM w
        """
    ).df()
    assert_frames_equal(out, exp)
    assert out["selected"].sum() == 50
    # target-language docs should be enriched among the selected
    lang = con.sql("SELECT doc_id, lang FROM documents").df().set_index("doc_id")["lang"]
    sel_en = (lang[out[out["selected"] == 1]["doc_id"]] == "en").mean()
    all_en = (lang == "en").mean()
    assert sel_en > all_en


def test_bigram_logprob_matches_sql(documents, con):
    out = txt.bigram_logprob(
        documents.select_columns(["doc_id", "text"]), "text"
    ).drop_columns(["text"]).to_pandas()
    toks = "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+')"
    exp = con.sql(
        f"""
        WITH tok AS (SELECT doc_id, unnest({toks}) AS tk,
                            unnest(range(1, len({toks}) + 1)) AS pos FROM documents),
        uni AS (SELECT tk, count(*) AS c FROM tok GROUP BY 1),
        tot AS (SELECT count(*) AS n FROM tok),
        big AS (SELECT t1.tk AS w1, t2.tk AS w2, count(*) AS c
                FROM tok t1 JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
                GROUP BY 1, 2),
        lp AS (SELECT t.doc_id,
                CASE WHEN p.tk IS NULL THEN -ln(u.c::DOUBLE / tot.n)
                     ELSE -ln(0.7 * (coalesce(b.c, 0)::DOUBLE / up.c)
                              + {1.0 - 0.7!r} * (u.c::DOUBLE / tot.n))
                END AS lp
               FROM tok t
               JOIN uni u ON u.tk = t.tk
               LEFT JOIN tok p ON p.doc_id = t.doc_id AND p.pos = t.pos - 1
               LEFT JOIN uni up ON up.tk = p.tk
               LEFT JOIN big b ON b.w1 = p.tk AND b.w2 = t.tk, tot)
        SELECT d.doc_id, round(coalesce(sum(lp.lp) / count(lp.lp), 0), 4) AS bigram_nlp
        FROM documents d LEFT JOIN lp USING (doc_id) GROUP BY 1
        """
    ).df()
    assert_frames_equal(out, exp)
    # a corpus-typical doc should be more probable under the bigram LM
    # than a token-shuffled one: scores must discriminate, not constant
    assert out["bigram_nlp"].nunique() > 10


def test_ivfpq_search(ray_session, tmp_path):
    """IVFPQIndex: (1) returned cosines are EXACT (re-rank reads raw
    vectors), (2) every hit lies in a probed cluster (pruning is
    real), (3) recall@10 vs brute force clears a floor at nprobe=4/8
    and a higher one probing all clusters."""
    import ray.data as rd

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    idx = ann.IVFPQIndex.build(emb, str(tmp_path / "ivfpq"), n_clusters=8, m=8)

    df = emb.to_pandas()
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    qsel = np.argsort(ids)[:3]
    qn, qids = xn[qsel], ids[qsel]

    brute = {}
    for i, q in enumerate(qn):
        sims = np.round(xn @ q, 4)
        order = np.lexsort((ids, -sims))[:10]
        brute[qids[i]] = set(ids[order])

    for nprobe, floor in [(4, 0.5), (8, 0.9)]:
        out = idx.search_batch(qn, qids, k=10, nprobe=nprobe, rerank=4).to_pandas()
        assert (out.groupby("qid").size() == 10).all()
        # exactness: the returned cos is the true rounded cosine
        pos = {v: i for i, v in enumerate(ids)}
        for _, r in out.iterrows():
            true = round(float(xn[pos[r["vec_id"]]] @ qn[list(qids).index(r["qid"])]), 4)
            assert abs(r["cos"] - true) <= 1e-9
        rec = np.mean(
            [len(set(g["vec_id"]) & brute[q]) / 10 for q, g in out.groupby("qid")]
        )
        assert rec >= floor, (nprobe, rec)

    # pruning: with nprobe=1 every hit's cluster == the query's top cluster
    cent = idx.centroids
    out1 = idx.search_batch(qn[:1], qids[:1], k=10, nprobe=1, rerank=4).to_pandas()
    top_cl = int(np.argmax(cent @ qn[0]))
    hit_cl = np.argmax(xn[[pos[v] for v in out1["vec_id"]]] @ cent.T, axis=1)
    assert (hit_cl == top_cl).all()


def test_pagerank_matches_numpy(ray_session):
    """5-iteration distributed PageRank == the dense numpy power
    iteration on a small random-ish digraph (exact op-order parity)."""
    import ray.data as rd

    from search_engine_ray.ops.graph import pagerank

    rng = np.random.default_rng(11)
    n, m = 40, 300
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    out = (
        pagerank(edges, damping=0.85, iters=5)
        .to_pandas()
        .set_index("node")["pr"]
        .sort_index()
    )

    nodes = np.unique(np.concatenate([src, dst]))
    pos = {v: i for i, v in enumerate(nodes)}
    N = nodes.size
    od = np.zeros(N)
    for s in src:
        od[pos[s]] += 1
    pr = np.full(N, 1.0 / N)
    base = (1.0 - 0.85) / N
    for _ in range(5):
        s_acc = np.zeros(N)
        w = pr[[pos[x] for x in src]] / od[[pos[x] for x in src]]
        np.add.at(s_acc, [pos[x] for x in dst], w)
        pr = base + 0.85 * s_acc
    exp = pd.Series(np.round(pr + 1e-12 * 0, 10), index=nodes)
    assert list(out.index) == list(nodes)
    np.testing.assert_allclose(out.to_numpy(), np.round(exp.to_numpy(), 4), atol=2e-4)
    # probability mass is conserved up to dangling leakage and the
    # per-node 4dp rounding (at most 5e-5 each)
    assert out.sum() <= 1.0 + 5e-5 * N


def test_append_shingle_index_continuous_ingest(documents, con, tmp_path):
    """The full continuous-ingest loop: batch 2 dedups against BOTH
    the original corpus and batch 1's accepted survivors after
    append_shingle_index folds batch 1 in."""
    import pyarrow.compute as pc

    from search_engine_ray.ops.dedup import (
        append_shingle_index,
        incremental_jaccard_pairs,
        write_shingle_index,
    )

    old = documents.select_columns(["doc_id", "text"])
    idx = str(tmp_path / "inc_idx")
    write_shingle_index(old, idx)

    def _shift(off, suffix):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": pc.add(t["doc_id"], off),
                    "text": pc.binary_join_element_wise(t["text"], suffix, " "),
                }
            )

        return f

    # batch 1: near-copies of the corpus -> all should pair; fold the
    # batch in regardless (survivor policy is the caller's)
    b1 = old.map_batches(_shift(1_000_000, "ingest_one"), batch_format="pyarrow")
    p1 = incremental_jaccard_pairs(idx, b1, threshold=0.5).to_pandas()
    assert (p1["new_id"] == p1["old_id"] + 1_000_000).sum() == documents.count()
    append_shingle_index(b1, idx)

    # batch 2: near-copies of BATCH 1 (two tokens differ from the
    # original) — must now pair against batch 1's ids too
    b2 = b1.map_batches(_shift(1_000_000, "ingest_two"), batch_format="pyarrow")
    p2 = incremental_jaccard_pairs(idx, b2, threshold=0.5).to_pandas()
    hits_b1 = p2[(p2["old_id"] >= 1_000_000) & (p2["new_id"] == p2["old_id"] + 1_000_000)]
    assert len(hits_b1) == documents.count()
    # and the original corpus is still matched as well (J drops with
    # two extra tokens but stays near 1 for long docs; just require
    # some cross-pairs to generation 0)
    assert (p2["old_id"] < 1_000_000).any()


def test_pagerank_dedup_edges(ray_session):
    """dedup_edges=True inside the shard build == pre-distincting the
    edge list (every copy of a pair lands in the same src-shard)."""
    import ray.data as rd

    from search_engine_ray.ops.graph import pagerank

    rng = np.random.default_rng(5)
    src = rng.integers(0, 25, 200).astype(np.int64)
    dst = rng.integers(0, 25, 200).astype(np.int64)
    dup = pa.table({"src": np.concatenate([src, src[:80]]),
                    "dst": np.concatenate([dst, dst[:80]])})
    uniq = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
    a = (
        pagerank(rd.from_arrow(dup), iters=3, dedup_edges=True)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    b = (
        pagerank(rd.from_pandas(uniq), iters=3)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_geo_radius_and_grid(ray_session):
    """Latitude-band prefilter never drops a true hit (parity with the
    unfiltered brute haversine); grid cells decode exactly for
    negative coordinates."""
    import ray.data as rd

    from search_engine_ray.ops import geo
    from search_engine_ray.ops.rounding import round_half_up

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "lat": rng.uniform(-90, 90, n),
        "lon": rng.uniform(-180, 180, n),
    })
    ds = rd.from_pandas(df, override_num_blocks=4)
    out = (
        geo.geo_radius(ds, "lat", "lon", 48.0, 2.0, 2500.0, ["id"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    d = geo.haversine_km(df["lat"].to_numpy(), df["lon"].to_numpy(), 48.0, 2.0)
    hit = d <= 2500.0
    exp = pd.DataFrame({
        "id": df["id"].to_numpy()[hit],
        "distance_km": round_half_up(d[hit]),
    }).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)
    assert len(out) > 0

    grid = (
        geo.geo_grid_counts(ds, "lat", "lon", 30.0)
        .to_pandas().sort_values(["cell_lat", "cell_lon"]).reset_index(drop=True)
    )
    bg = df.assign(cell_lat=np.floor(df["lat"] / 30.0).astype(np.int64),
                   cell_lon=np.floor(df["lon"] / 30.0).astype(np.int64))
    exp_g = (
        bg.groupby(["cell_lat", "cell_lon"]).size().rename("n").reset_index()
    )
    pd.testing.assert_frame_equal(grid, exp_g, check_dtype=False)
    assert grid["cell_lat"].min() < 0 and grid["cell_lon"].min() < 0


def test_funnel_greedy_earliest(ray_session):
    """Greedy-earliest chain semantics vs a brute per-user walk,
    including the trap case: the earliest step-1 event closes the
    window on a step-2 event a LATER step-1 event would have caught
    (greedy is deliberately not optimal-completion)."""
    import ray.data as rd

    rows = []
    # u1 completes: A@0, B@30s, C@50s
    rows += [(1, 0, "A"), (1, 30, "B"), (1, 50, "C")]
    # u2 trap: A@0 (greedy), B@200 (outside 100s window of t=0);
    # A@150 would have caught B@200, but greedy already fixed t1=0
    rows += [(2, 0, "A"), (2, 150, "A"), (2, 200, "B"), (2, 210, "C")]
    # u3 reaches step 2 only: A@0, B@40, no C in window
    rows += [(3, 0, "A"), (3, 40, "B"), (3, 500, "C")]
    # u4 never starts
    rows += [(4, 10, "B"), (4, 20, "C")]
    df = pd.DataFrame(rows, columns=["user_id", "sec", "event_type"])
    df["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(df["sec"], unit="s")
    out = rel.funnel(
        rd.from_pandas(df[["user_id", "ts", "event_type"]], override_num_blocks=3),
        "user_id", "ts", "event_type", steps=("A", "B", "C"), step_window_s=100.0,
    )
    assert out["step"].tolist() == [1, 2, 3]
    assert out["event_type"].tolist() == ["A", "B", "C"]
    assert out["n_users"].tolist() == [3, 2, 1]


def test_retention_cohorts(ray_session):
    """Cohort/offset counts vs a brute pandas walk, month period
    included (calendar-month offsets, not fixed widths)."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 800
    users = rng.integers(0, 60, n).astype(np.int64)
    ts = pd.Timestamp("2024-01-03") + pd.to_timedelta(
        rng.integers(0, 90 * 86400, n), unit="s"
    )
    df = pd.DataFrame({"user_id": users, "ts": ts})
    for period in ("week", "month"):
        out = rel.retention(
            rd.from_pandas(df, override_num_blocks=4), "user_id", "ts", period=period
        )
        if period == "week":  # Monday-start weeks (Arrow/DuckDB rule)
            p = df["ts"].dt.normalize() - pd.to_timedelta(df["ts"].dt.dayofweek, unit="D")
        else:
            p = df["ts"].dt.to_period("M").dt.start_time
        b = pd.DataFrame({"u": df["user_id"], "p": p})
        cohort = b.groupby("u")["p"].min()
        d = b.drop_duplicates()
        d["cohort"] = cohort.reindex(d["u"]).to_numpy()
        if period == "week":
            d["off"] = ((d["p"] - d["cohort"]).dt.days // 7).astype(int)
        else:
            d["off"] = (d["p"].dt.year - d["cohort"].dt.year) * 12 + (
                d["p"].dt.month - d["cohort"].dt.month
            )
        exp = (
            d.groupby([d["cohort"].astype("datetime64[us]").astype("int64"), "off"])
            .size().rename("n_users").reset_index()
            .rename(columns={"cohort": "cohort_start", "off": "period_offset"})
            .sort_values(["cohort_start", "period_offset"]).reset_index(drop=True)
        )
        got = out.astype({"cohort_start": "int64"})
        pd.testing.assert_frame_equal(got, exp.astype({"n_users": "int64"}),
                                      check_dtype=False)


def test_grouped_hll_matches_per_group_single(ray_session):
    """grouped_hll_distinct(key) == hll_distinct run per key slice."""
    import ray.data as rd

    import search_engine_ray.ops.sketch as sk

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 2000),
        "v": rng.integers(0, 400, 2000).astype(np.int64),
    })
    out = sk.grouped_hll_distinct(
        rd.from_pandas(df, override_num_blocks=5), "g", "v", p=6
    ).set_index("g")["distinct_est"]
    for g in ("a", "b", "c"):
        solo = sk.hll_distinct(rd.from_pandas(df[df["g"] == g]), "v", p=6)
        assert out[g] == solo, (g, out[g], solo)


def test_hash_join_empty_partitions(ray_session):
    """Tiny sides shard into empty hash partitions; Ray 2.49's join
    crashes on the zero-column partition blocks without the _SafeJoinAgg
    patch (relational.py). Every join type must survive and match
    pandas semantics."""
    import pyarrow as pa

    import ray.data as rd

    import search_engine_ray.ops.relational as rel

    left = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(12, dtype=np.int64)),
        "a": pa.array(np.arange(12, dtype=np.int64) * 10),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array(np.array([2, 3, 5], dtype=np.int64)),
        "b": pa.array(np.array([20, 30, 50], dtype=np.int64)),
    }))
    inner = rel.hash_join(
        left, right, on=["k"], right_on=["rk"], num_partitions=8
    ).to_pandas()
    assert sorted(inner["k"]) == [2, 3, 5]
    lo = rel.hash_join(
        left, right, on=["k"], right_on=["rk"], how="left_outer", num_partitions=8
    ).to_pandas()
    assert len(lo) == 12
    matched = lo[lo["b"].notna()]
    assert sorted(matched["k"]) == [2, 3, 5]
    # fully-empty right side: left_outer keeps every left row
    empty_right = rd.from_arrow(pa.table({
        "rk": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
    }))
    lo2 = rel.hash_join(
        left, empty_right, on=["k"], right_on=["rk"], how="left_outer",
        num_partitions=8,
    ).to_pandas()
    assert len(lo2) == 12 and sorted(lo2["k"]) == list(range(12))


def test_hash_join_empty_left_outer_variants(ray_session):
    """The right-preserving branches of _SafeJoinAgg: a fully-empty
    LEFT side under right_outer/full_outer keeps every right row."""
    import pyarrow as pa

    import ray.data as rd

    import search_engine_ray.ops.relational as rel

    empty_left = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "a": pa.array([], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array(np.arange(9, dtype=np.int64)),
        "b": pa.array(np.arange(9, dtype=np.int64) * 2),
    }))
    ro = rel.hash_join(
        empty_left, right, on=["k"], right_on=["rk"], how="right_outer",
        num_partitions=8,
    ).to_pandas()
    assert len(ro) == 9 and sorted(ro["rk"]) == list(range(9))
    fo = rel.hash_join(
        empty_left, right, on=["k"], right_on=["rk"], how="full_outer",
        num_partitions=8,
    ).to_pandas()
    assert len(fo) == 9
    inner = rel.hash_join(
        empty_left, right, on=["k"], right_on=["rk"], num_partitions=8
    ).to_pandas()
    assert len(inner) == 0


def test_cooccur_pairs_vs_bruteforce(ray_session):
    """cooccur_pairs == brute-force distinct-pair counting, including
    duplicate (group, item) rows, singleton groups, and x < y order."""
    import itertools

    import ray.data as rd

    import search_engine_ray.ops.relational as rel

    rng = np.random.RandomState(7)
    g = rng.randint(0, 40, size=500).astype(np.int64)
    i = rng.randint(0, 25, size=500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"gid": pa.array(g), "item": pa.array(i)}))
    got = (
        rel.cooccur_pairs(ds, "gid", "item", num_buckets=8)
        .to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    )
    want: dict[tuple, int] = {}
    for gid in np.unique(g):
        items = sorted(set(i[g == gid].tolist()))
        for x, y in itertools.combinations(items, 2):
            want[(x, y)] = want.get((x, y), 0) + 1
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[(r["x"], r["y"])] == r["c_xy"], (r["x"], r["y"])


def test_cooccur_pairs_empty_and_singletons(ray_session):
    import ray.data as rd

    import search_engine_ray.ops.relational as rel

    ds = rd.from_arrow(pa.table({
        "gid": pa.array([1, 2, 3], pa.int64()),
        "item": pa.array([10, 20, 30], pa.int64()),
    }))
    out = rel.cooccur_pairs(ds, "gid", "item", num_buckets=4).to_pandas()
    assert len(out) == 0


def test_cooccur_pairs_item_counts(ray_session):
    """with_item_counts=True rides per-item distinct-group counts as
    y=-1 sentinel rows on the same exchange."""
    import ray.data as rd

    import search_engine_ray.ops.relational as rel

    g = np.array([1, 1, 1, 2, 2, 3], np.int64)
    i = np.array([10, 20, 10, 10, 30, 10], np.int64)  # dup (1,10) row
    ds = rd.from_arrow(pa.table({"gid": pa.array(g), "item": pa.array(i)}))
    out = rel.cooccur_pairs(
        ds, "gid", "item", num_buckets=4, with_item_counts=True
    ).to_pandas()
    items = out[out["y"] == -1].set_index("x")["c_xy"].to_dict()
    pairs = out[out["y"] >= 0].set_index(["x", "y"])["c_xy"].to_dict()
    assert items == {10: 3, 20: 1, 30: 1}
    assert pairs == {(10, 20): 1, (10, 30): 1}


def test_novelty_fractions_vs_bruteforce(ray_session):
    """novelty_fractions == per-doc fraction of distinct 3-shingles
    whose min holder id is the doc itself."""
    import ray.data as rd

    import search_engine_ray.ops.dedup as dd

    texts = [
        "alpha beta gamma delta",        # doc 1: all novel
        "alpha beta gamma epsilon",      # doc 2: shares 'alpha beta gamma'
        "zeta eta theta",                # doc 3: single shingle, novel
        "alpha beta gamma delta",        # doc 4: exact dup of doc 1
    ]
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = (
        dd.novelty_fractions(rd.from_arrow(t), "text", "doc_id", w=3)
        .to_pandas().set_index("doc_id").sort_index()
    )
    # doc1: shingles {abg, bgd} both first here -> 1.0
    # doc2: {abg (first=1), bge} -> 0.5
    # doc3: {zet} -> 1.0 ; doc4: {abg, bgd} both first=1 -> 0.0
    assert out.loc[1, "novel_frac"] == 1.0 and out.loc[1, "n_shingles"] == 2
    assert out.loc[2, "novel_frac"] == 0.5
    assert out.loc[3, "novel_frac"] == 1.0 and out.loc[3, "n_shingles"] == 1
    assert out.loc[4, "novel_frac"] == 0.0


def test_cooccur_pairs_property(ray_session):
    """Property: for random (group, item) tables, cooccur_pairs equals
    brute-force distinct-pair counting (few examples — each runs a
    Ray pipeline)."""
    import itertools

    import ray.data as rd
    from hypothesis import given, settings, strategies as st

    import search_engine_ray.ops.relational as rel

    @settings(max_examples=5, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def _case(seed):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(1, 200))
        g = rng.randint(0, 20, size=n).astype(np.int64)
        i = rng.randint(0, 15, size=n).astype(np.int64)
        ds = rd.from_arrow(pa.table({"g": pa.array(g), "i": pa.array(i)}))
        got = rel.cooccur_pairs(ds, "g", "i", num_buckets=4).to_pandas()
        want: dict[tuple, int] = {}
        for gid in np.unique(g):
            for x, y in itertools.combinations(sorted(set(i[g == gid].tolist())), 2):
                want[(x, y)] = want.get((x, y), 0) + 1
        have = {(int(r["x"]), int(r["y"])): int(r["c_xy"]) for _, r in got.iterrows()}
        assert have == want

    _case()
