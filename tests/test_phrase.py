"""Phrase queries over the positional sidecar: build + decode
round-trip, adjacency-chain parity vs a brute-force Python scan, and
BM25 score parity (same scoring.py formula both sides)."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.analysis import analyze
from search_engine_ray.config import IndexConfig
from search_engine_ray.index import build_index, build_positions
from search_engine_ray.query import SearchEngine, phrase_postings, phrase_search
from search_engine_ray.query import scoring


@pytest.fixture(scope="module")
def pos_index(ray_session, tiny_corpus, tmp_path_factory):
    """Index + positional sidecar over the tiny corpus (content field)."""
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("posidx") / "tiny")
    cfg = IndexConfig(num_buckets=4, num_parts=4)
    build_index(rd.from_arrow(tiny_corpus), out, cfg)
    build_positions(rd.from_arrow(tiny_corpus), out, cfg, field_names=("content",))
    return out, cfg


def _brute_phrase(corpus: pa.Table, tokens: list[str]) -> dict[int, tuple[int, int]]:
    """doc_id -> (phrase tf, dl) by scanning analyzed token lists."""
    from search_engine_ray.index.build import doc_uid

    out = {}
    repo, path, content = (corpus[c].to_pylist() for c in ("repo", "path", "content"))
    m = len(tokens)
    for r, p, text in zip(repo, path, content):
        ts = analyze(text or "")
        ptf = sum(
            1 for i in range(len(ts) - m + 1) if ts[i : i + m] == tokens
        )
        if ptf:
            out[doc_uid([str(r), str(p)])] = (ptf, len(ts))
    return out


@pytest.mark.parametrize(
    "phrase",
    [
        ["import", "yield"],
        ["class", "with"],
        ["lambda", "return", "yield"],
        ["tokenizer"],  # single-token degenerate: ptf == tf
    ],
)
def test_phrase_postings_match_brute_force(pos_index, tiny_corpus, phrase):
    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    exp = _brute_phrase(tiny_corpus, phrase)
    got = phrase_postings(eng, "content", phrase).to_pandas()
    assert len(got) == len(exp), phrase
    for row in got.itertuples(index=False):
        assert exp[row.doc_id] == (row.ptf, row.dl), (phrase, row.doc_id)
    # at least one of the parametrized phrases must actually match
    if phrase == ["import", "yield"]:
        assert len(exp) > 0


def test_phrase_search_scores_and_ranking(pos_index, tiny_corpus):
    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    tokens = ["import", "yield"]
    exp = _brute_phrase(tiny_corpus, tokens)
    assert exp
    n = eng.stats["n_docs"]
    avgdl = eng.stats["fields"]["content"]["avgdl"]
    tidf = float(scoring.idf(n, len(exp)))
    want = {
        d: float(scoring.bm25_score(np.array([tf]), np.array([dl]), tidf, 1.2, 0.75, avgdl)[0])
        for d, (tf, dl) in exp.items()
    }
    page = phrase_search(eng, "content", "import yield", k=10)
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert page["doc_id"].tolist() == [d for d, _ in order]
    np.testing.assert_allclose(
        page["score"].to_numpy(), np.array([s for _, s in order]), rtol=0, atol=1e-9
    )


def test_phrase_no_match_and_missing_term(pos_index):
    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    # term absent from the corpus entirely
    assert phrase_postings(eng, "content", ["zzzqqq", "yield"]).count() == 0
    # both terms exist but never adjacently in this exact order?
    # (query an implausible inversion; if it does occur the check
    # still validates against brute force)
    assert phrase_search(eng, "content", "zzzqqq", k=5).empty


def test_phrase_requires_sidecar(tiny_index):
    out, cfg, _ = tiny_index
    eng = SearchEngine(out, cfg)
    with pytest.raises(RuntimeError, match="positions sidecar"):
        phrase_postings(eng, "content", ["import", "yield"]).count()


def test_positions_encode_decode_roundtrip():
    """encode_positions_bucket <-> decode_positions_term on a
    hand-built partial table (multi-batch merge: segments permuted)."""
    from search_engine_ray.index.positions import (
        decode_positions_term,
        encode_positions_bucket,
    )

    universe = np.array([10, 20, 30, 40], dtype=np.int64)
    # two partial rows for the same term (two batches), one for another
    t = pa.table(
        {
            "term": ["c:a", "c:a", "c:b"],
            "bucket": pa.array([0, 0, 0], pa.int32()),
            "doc_ids": [[30], [10, 20], [20]],
            "tfs": pa.array([[2], [1, 3], [1]], pa.list_(pa.int32())),
            "dls": pa.array([[7], [4, 9], [9]], pa.list_(pa.int32())),
            "pos": pa.array([[1, 5], [0, 2, 4, 8], [3]], pa.list_(pa.int32())),
        }
    )
    enc = encode_positions_bucket(t, 0, universe)
    assert enc["term"].to_pylist() == ["c:a", "c:b"]
    i_a = 0
    ranks, tfs, dls, pos = decode_positions_term(
        enc["doc_bytes"][i_a].as_py(),
        enc["tf_bytes"][i_a].as_py(),
        enc["dl_bytes"][i_a].as_py(),
        enc["pos_bytes"][i_a].as_py(),
        int(enc["df_local"][i_a].as_py()),
    )
    # doc order by rank: 10 (rank 0), 20 (rank 1), 30 (rank 2)
    assert universe[ranks].tolist() == [10, 20, 30]
    assert tfs.tolist() == [1, 3, 2]
    assert dls.tolist() == [4, 9, 7]
    assert pos.tolist() == [0, 2, 4, 8, 1, 5]


def test_proximity_pair_window(pos_index, tiny_corpus):
    """S12 ordered proximity: ptf counts (i, j) position pairs with
    1 <= j - i <= window — parity vs a brute-force pair scan, and
    window=1 must equal the exact-phrase path."""
    from search_engine_ray.index.build import doc_uid

    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    a, b, w = "import", "yield", 3
    exp = {}
    for r, p, text in zip(*(tiny_corpus[c].to_pylist() for c in ("repo", "path", "content"))):
        ts = analyze(text or "")
        pa_pos = [i for i, t in enumerate(ts) if t == a]
        pb_pos = [j for j, t in enumerate(ts) if t == b]
        ptf = sum(1 for i in pa_pos for j in pb_pos if 1 <= j - i <= w)
        if ptf:
            exp[doc_uid([str(r), str(p)])] = (ptf, len(ts))
    got = phrase_postings(eng, "content", [a, b], window=w).to_pandas()
    assert len(got) == len(exp) and len(exp) > 0
    for row in got.itertuples(index=False):
        assert exp[row.doc_id] == (row.ptf, row.dl)
    # window=1 == exact phrase
    g1 = phrase_postings(eng, "content", [a, b], window=1).to_pandas()
    ge = phrase_postings(eng, "content", [a, b]).to_pandas()
    assert g1.sort_values("doc_id").values.tolist() == ge.sort_values("doc_id").values.tolist()
    with pytest.raises(ValueError, match="two tokens"):
        phrase_postings(eng, "content", [a, b, a], window=2)


def _brute_phrase_prefix(corpus: pa.Table, tokens: list[str], prefix: str) -> dict[int, tuple[int, int]]:
    """doc_id -> (tf, dl) for tokens... followed by any prefix-match."""
    from search_engine_ray.index.build import doc_uid

    out = {}
    repo, path, content = (corpus[c].to_pylist() for c in ("repo", "path", "content"))
    m = len(tokens)
    for r, p, text in zip(repo, path, content):
        ts = analyze(text or "")
        ptf = sum(
            1
            for i in range(len(ts) - m)
            if ts[i : i + m] == tokens and ts[i + m].startswith(prefix)
        )
        if ptf:
            out[doc_uid([str(r), str(p)])] = (ptf, len(ts))
    return out


@pytest.mark.parametrize("pair", [(["import"], "y"), (["class"], "wi"), (["lambda"], "re")])
def test_phrase_prefix_matches_brute_force(pos_index, tiny_corpus, pair):
    tokens, prefix = pair
    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    got = {
        int(r["doc_id"]): (int(r["ptf"]), int(r["dl"]))
        for r in phrase_postings(eng, "content", tokens, last_prefix=prefix)
        .to_pandas()
        .to_dict("records")
    }
    assert got == _brute_phrase_prefix(tiny_corpus, tokens, prefix)


def test_phrase_prefix_rejects_lone_prefix(pos_index):
    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    with pytest.raises(ValueError):
        phrase_postings(eng, "content", [], last_prefix="x")


def test_phrase_prefix_no_expansions(pos_index):
    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    res = phrase_postings(eng, "content", ["import"], last_prefix="zzzzqq").to_pandas()
    assert len(res) == 0


def test_unordered_proximity_pair(pos_index, tiny_corpus):
    """ordered=False counts both directions: |gap| in [1, window]."""
    from search_engine_ray.index.build import doc_uid

    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    toks, w = ["import", "yield"], 4
    got = {
        int(r["doc_id"]): int(r["ptf"])
        for r in phrase_postings(eng, "content", toks, window=w, ordered=False)
        .to_pandas()
        .to_dict("records")
    }
    brute = {}
    repo, path, content = (tiny_corpus[c].to_pylist() for c in ("repo", "path", "content"))
    for r, p, text in zip(repo, path, content):
        ts = analyze(text or "")
        pa_ = [i for i, t in enumerate(ts) if t == toks[0]]
        pb_ = [i for i, t in enumerate(ts) if t == toks[1]]
        ptf = sum(1 for i in pa_ for j in pb_ if 1 <= abs(j - i) <= w)
        if ptf:
            brute[doc_uid([str(r), str(p)])] = ptf
    assert got == brute
    # unordered superset of ordered
    o = {
        int(r["doc_id"]): int(r["ptf"])
        for r in phrase_postings(eng, "content", toks, window=w, ordered=True)
        .to_pandas()
        .to_dict("records")
    }
    for d, n in o.items():
        assert got.get(d, 0) >= n


def test_span_first(pos_index, tiny_corpus):
    """span_first: ptf counts only occurrences with 0-based position
    < end — verified against a brute analyzed-token scan; a huge end
    equals the plain single-term match set."""
    from search_engine_ray.index.build import doc_uid
    from search_engine_ray.query.phrase import phrase_postings

    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    end = 5
    got = (
        phrase_postings(eng, "content", ["import"], first_end=end)
        .to_pandas()
        .set_index("doc_id")["ptf"]
        .to_dict()
    )
    exp = {}
    repo, path, content = (tiny_corpus[c].to_pylist() for c in ("repo", "path", "content"))
    for r, p, text in zip(repo, path, content):
        ts = analyze(text or "")
        ptf = sum(1 for i, t in enumerate(ts[:end]) if t == "import")
        if ptf:
            exp[doc_uid([str(r), str(p)])] = ptf
    assert got == exp
    wide = phrase_postings(eng, "content", ["import"], first_end=10**6).to_pandas()
    plain = phrase_postings(eng, "content", ["import"]).to_pandas()
    assert (
        wide.sort_values("doc_id")["ptf"].tolist()
        == plain.sort_values("doc_id")["ptf"].tolist()
    )


def test_span_or_near(pos_index, tiny_corpus):
    """span_near over a span_or first slot: ('import'|'class')
    followed by 'yield' within the window — ptf counts position pairs,
    verified against a brute analyzed-token scan."""
    from search_engine_ray.index.build import doc_uid
    from search_engine_ray.query.phrase import phrase_postings

    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    w = 3
    got = (
        phrase_postings(eng, "content", ["yield"], window=w, or_first=["import", "class"])
        .to_pandas()
        .set_index("doc_id")["ptf"]
        .to_dict()
    )
    exp = {}
    repo, path, content = (tiny_corpus[c].to_pylist() for c in ("repo", "path", "content"))
    for r, p, text in zip(repo, path, content):
        ts = analyze(text or "")
        pa_ = [i for i, t in enumerate(ts) if t in ("import", "class")]
        pb_ = [i for i, t in enumerate(ts) if t == "yield"]
        ptf = sum(1 for i in pa_ for j in pb_ if 1 <= j - i <= w)
        if ptf:
            exp[doc_uid([str(r), str(p)])] = ptf
    assert got == exp


def test_span_not(pos_index, tiny_corpus):
    """span_not: 'import' occurrences survive only with no
    'class'/'with' within +-dist positions; brute-verified. dist=0
    bans only same-position (impossible) -> equals the plain term."""
    from search_engine_ray.index.build import doc_uid
    from search_engine_ray.query.phrase import phrase_postings

    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    dist = 2
    got = (
        phrase_postings(eng, "content", ["import"], exclude=["class", "with"],
                        exclude_dist=dist)
        .to_pandas()
        .set_index("doc_id")["ptf"]
        .to_dict()
    )
    exp = {}
    repo, path, content = (tiny_corpus[c].to_pylist() for c in ("repo", "path", "content"))
    for r, p, text in zip(repo, path, content):
        ts = analyze(text or "")
        bad = {i for i, t in enumerate(ts) if t in ("class", "with")}
        ptf = sum(
            1 for i, t in enumerate(ts)
            if t == "import" and not any(abs(i - j) <= dist for j in bad)
        )
        if ptf:
            exp[doc_uid([str(r), str(p)])] = ptf
    assert got == exp


def test_span_containing_within(pos_index, tiny_corpus):
    """span_containing counts big pair spans holding a little
    occurrence; span_within counts (deduped) little occurrences inside
    any big span — both brute-verified."""
    from search_engine_ray.index.build import doc_uid
    from search_engine_ray.query.phrase import phrase_postings

    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    w = 3
    got_c = (
        phrase_postings(eng, "content", ["import", "yield"], window=w,
                        little="class", span_mode="containing")
        .to_pandas().set_index("doc_id")["ptf"].to_dict()
    )
    got_w = (
        phrase_postings(eng, "content", ["import", "yield"], window=w,
                        little="class", span_mode="within")
        .to_pandas().set_index("doc_id")["ptf"].to_dict()
    )
    exp_c, exp_w = {}, {}
    repo, path, content = (tiny_corpus[c].to_pylist() for c in ("repo", "path", "content"))
    for r, p, text in zip(repo, path, content):
        ts = analyze(text or "")
        p1 = [i for i, t in enumerate(ts) if t == "import"]
        p2 = [i for i, t in enumerate(ts) if t == "yield"]
        p3 = [i for i, t in enumerate(ts) if t == "class"]
        spans = [(i, j) for i in p1 for j in p2 if 1 <= j - i <= w]
        nc = sum(1 for i, j in spans if any(i <= q <= j for q in p3))
        nw = len({q for q in p3 if any(i <= q <= j for i, j in spans)})
        if nc:
            exp_c[doc_uid([str(r), str(p)])] = nc
        if nw:
            exp_w[doc_uid([str(r), str(p)])] = nw
    assert got_c == exp_c
    assert got_w == exp_w


def test_phrase_topk_actor_path_parity(pos_index):
    """phrase_topk (scatter-gather actor path) == the Dataset path,
    for exact phrase / proximity / unordered / span_first / prefix —
    same rows, same rounded scores, same ranking rule."""
    import pandas as pd

    from search_engine_ray.ops.rounding import round_half_up
    from search_engine_ray.query.phrase import phrase_search_all, phrase_topk

    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    cases = [
        dict(phrase=["import", "yield"]),
        dict(phrase=["class", "with"]),
        dict(phrase=["import"], first_end=5),
        dict(phrase=["import", "yield"], window=3),
        dict(phrase=["import", "yield"], window=3, ordered=False),
        dict(phrase=["import"], last_prefix="yi"),
        dict(phrase=["yield"], window=3, or_first=["import", "class"]),
        dict(phrase=["import"], exclude=["class", "with"], exclude_dist=2),
        dict(phrase=["import", "yield"], window=3, little="class",
             span_mode="containing"),
        dict(phrase=["import", "yield"], window=3, little="class",
             span_mode="within"),
        dict(phrase=["zzzqqq"]),  # zero hits
    ]
    for case in cases:
        got = phrase_topk(eng, "content", k=1000, **case)
        ref = phrase_search_all(eng, "content", **case).to_pandas()
        if ref.empty:  # fully-empty Datasets drop their schema
            ref = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                "score": pd.Series(dtype="float64")})
        ref["score"] = round_half_up(ref["score"].to_numpy())
        ref = ref.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(1000).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False), case


# ---------------- pure-kernel property tests (no Ray, no index) ------

from hypothesis import given, settings
from hypothesis import strategies as st


def _stream(rng_ints, n_docs=6, max_pos=30):
    """Build a (ranks, tfs, dls, positions) stream from a set of
    (doc, pos) occurrence pairs."""
    occ = sorted(set(rng_ints))
    if not occ:
        return None
    import numpy as np

    docs = np.array([d for d, _ in occ], np.int64)
    pos = np.array([p for _, p in occ], np.int64)
    ranks, tfs = np.unique(docs, return_counts=True)
    dls = np.full(ranks.size, max_pos + 5, np.int64)
    return ranks, tfs.astype(np.int64), dls, pos


occ_sets = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 29)), min_size=1, max_size=40
)


@settings(max_examples=120, deadline=None)
@given(a=occ_sets, b=occ_sets, w=st.integers(1, 4), ordered=st.booleans())
def test_pair_window_kernel_matches_brute(a, b, w, ordered):
    import numpy as np

    from search_engine_ray.query.phrase import _occurrence_keys, _pair_window_raw

    sa, sb = _stream(a), _stream(b)
    k1, k2 = _occurrence_keys(sa), _occurrence_keys(sb)
    doc_ranks, ptf = _pair_window_raw(np.sort(k1), np.sort(k2), w, ordered)
    got = dict(zip(doc_ranks.tolist(), ptf.tolist()))
    brute = {}
    A, B = sorted(set(a)), sorted(set(b))
    for d in {x for x, _ in A} | {x for x, _ in B}:
        pa_ = [p for dd, p in A if dd == d]
        pb_ = [p for dd, p in B if dd == d]
        n = sum(
            1 for i in pa_ for j in pb_
            if (1 <= j - i <= w) or (not ordered and 1 <= i - j <= w)
        )
        if n:
            brute[d] = n
    assert got == brute


@settings(max_examples=120, deadline=None)
@given(inc=occ_sets, exc=occ_sets, dist=st.integers(0, 5))
def test_span_not_kernel_matches_brute(inc, exc, dist):
    from search_engine_ray.query.phrase import chain_core

    si, se = _stream(inc), _stream(exc)
    by_term = {"t:a": si, "t:x": se}
    doc_ranks, ptf, _dl = chain_core(
        by_term, ["t:a"], 1, True, None, [],
        exclude_keys=["t:x"], exclude_dist=dist,
    )
    got = dict(zip(doc_ranks.tolist(), ptf.tolist()))
    I, X = sorted(set(inc)), sorted(set(exc))
    brute = {}
    for d, p in I:
        if any(dd == d and abs(pp - p) <= dist for dd, pp in X):
            continue
        brute[d] = brute.get(d, 0) + 1
    assert got == brute


@settings(max_examples=60, deadline=None)
@given(big1=occ_sets, big2=occ_sets, little=occ_sets,
       w=st.integers(1, 4), within=st.booleans())
def test_span_containing_kernel_matches_brute(big1, big2, little, w, within):
    from search_engine_ray.query.phrase import chain_core

    by_term = {"t:a": _stream(big1), "t:b": _stream(big2), "t:c": _stream(little)}
    doc_ranks, ptf, _dl = chain_core(
        by_term, ["t:a", "t:b"], w, True, None, [],
        little_key="t:c", span_mode="within" if within else "containing",
    )
    got = dict(zip(doc_ranks.tolist(), ptf.tolist()))
    A, B, C = (sorted(set(x)) for x in (big1, big2, little))
    brute = {}
    docs = {d for d, _ in A} | {d for d, _ in B} | {d for d, _ in C}
    for d in docs:
        pa_ = [p for dd, p in A if dd == d]
        pb_ = [p for dd, p in B if dd == d]
        pc_ = [p for dd, p in C if dd == d]
        spans = [(i, j) for i in pa_ for j in pb_ if 1 <= j - i <= w]
        if within:
            n = len({q for q in pc_ if any(i <= q <= j for i, j in spans)})
        else:
            n = sum(1 for i, j in spans if any(i <= q <= j for q in pc_))
        if n:
            brute[d] = n
    assert got == brute


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=30))
def test_bit_length_u64_matches_python(vals):
    import numpy as np

    from search_engine_ray.ops.sketch import _bit_length_u64

    x = np.array(vals, np.uint64)
    got = _bit_length_u64(x)
    assert got.tolist() == [int(v).bit_length() for v in vals]


@settings(max_examples=60, deadline=None)
@given(big1=occ_sets, big2=occ_sets, little=occ_sets, w=st.integers(2, 6))
def test_interval_kernel_matches_brute(big1, big2, little, w):
    """span_mode='interval' (ES intervals all_of ordered): middle term
    strictly between the endpoints, ptf = qualifying (start, end)
    pairs with end - start in [2, w]."""
    from search_engine_ray.query.phrase import chain_core

    by_term = {"t:a": _stream(big1), "t:b": _stream(big2), "t:c": _stream(little)}
    doc_ranks, ptf, _dl = chain_core(
        by_term, ["t:a", "t:b"], w, True, None, [],
        little_key="t:c", span_mode="interval",
    )
    got = dict(zip(doc_ranks.tolist(), ptf.tolist()))
    A, B, C = (sorted(set(x)) for x in (big1, big2, little))
    brute = {}
    docs = {d for d, _ in A} | {d for d, _ in B} | {d for d, _ in C}
    for d in docs:
        pa_ = [p for dd, p in A if dd == d]
        pb_ = [p for dd, p in B if dd == d]
        pc_ = [p for dd, p in C if dd == d]
        n = sum(
            1
            for i in pa_
            for j in pb_
            if 2 <= j - i <= w and any(i < q < j for q in pc_)
        )
        if n:
            brute[d] = n
    assert got == brute


def test_phrase_prefix_cap_asserts_not_truncates(pos_index, ray_session):
    """ADVICE r03 regression: a dictionary expansion that reaches
    max_expansions must fail loud (the value oracle replays the
    UNCAPPED expansion), never silently truncate."""
    out, cfg = pos_index
    eng = SearchEngine(out, cfg)
    with pytest.raises(AssertionError, match="expands to"):
        # every corpus has >= 1 term under a single-letter prefix, so
        # cap=1 guarantees len(exp) >= cap
        phrase_postings(
            eng, "content", ["import"], last_prefix="t", max_expansions=1
        )
