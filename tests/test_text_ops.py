"""Unit tests for the round-2 text/training-data additions: BPE-ish
token counting, unigram-LM scoring, benchmark decontamination, and
keyword-in-context snippets. Value parity with DuckDB is covered by
test_entry.py's oracle gate; these pin edge-case semantics."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from search_engine_ray.ops import dedup as dd
from search_engine_ray.ops import text as txt

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs 123",
    "the quick brown cat sleeps",
    "",
    "one two",
    "don't stop 12345 now!",
]


def _docs():
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": TEXTS})
    )


def test_bpe_token_stats(ray_session):
    out = (
        txt.add_bpe_token_stats(_docs(), "text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # hand-checked: "don't stop 12345 now!" -> don | 't | _stop |
    # _123 | 45 | _now | !  (digits split into <=3-char groups)
    assert out["n_bpe_tokens"].tolist() == [9, 9, 5, 0, 2, 7]
    assert out["n_ws_tokens"].tolist() == [9, 9, 5, 0, 2, 4]
    # empty text scores 0 tokens under both counters
    assert out.loc[3, "n_bpe_tokens"] == 0 and out.loc[3, "n_ws_tokens"] == 0


def test_unigram_logprob_hand_values(ray_session):
    # corpus of 4 tokens: a a b c -> p(a)=1/2, p(b)=p(c)=1/4
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": ["a a b", "c"]})
    )
    out = txt.unigram_logprob(ds, "text").to_pandas().sort_values("doc_id")
    exp0 = round((2 * -np.log(0.5) + -np.log(0.25)) / 3, 4)
    exp1 = round(-np.log(0.25), 4)
    assert out["neg_logprob"].tolist() == pytest.approx([exp0, exp1])


def test_unigram_logprob_empty_doc_and_oov(ray_session):
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": ["a a", ""]})
    )
    out = txt.unigram_logprob(ds, "text").to_pandas().sort_values("doc_id")
    assert out["neg_logprob"].tolist() == [0.0, 0.0]
    # scoring a foreign corpus: unseen tokens take ln(1/total)
    model = rd.from_arrow(pa.table({"text": ["a a b c"]}))
    ds2 = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["zzz"]}))
    out2 = txt.unigram_logprob(ds2, "text", model_ds=model).to_pandas()
    assert out2["neg_logprob"].tolist() == pytest.approx([round(-np.log(1 / 4), 4)])


def test_extract_snippets_window_edges(ray_session):
    out = (
        txt.extract_snippets(_docs(), "the", context=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # "the" first occurs at position 1 -> window clamps at the start;
    # only the FIRST occurrence is reported (doc 0 has two)
    assert out["doc_id"].tolist() == [0, 2]
    assert out["first_pos"].tolist() == [1, 1]
    assert out["snippet"].tolist() == ["the quick brown", "the quick brown"]
    # term at the tail -> window clamps at the end
    tail = (
        txt.extract_snippets(_docs(), "sleeps", context=2)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert tail["first_pos"].tolist() == [5]
    assert tail["snippet"].tolist() == ["brown cat sleeps"]
    # absent term -> empty result; per-block schema stays stable
    # (Dataset.to_pandas on a fully-empty Dataset drops column names —
    # a Ray 2.49 quirk — so check the block schema directly)
    none = txt.extract_snippets(_docs(), "zzzz")
    assert none.count() == 0
    assert none.schema().names == ["doc_id", "first_pos", "snippet"]


def test_repetition_scores(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": [
                    "x y\nx y\nz",           # 3 lines, 2 distinct; bigram "x y" x2 of 4 bigrams, 5 toks
                    "a b c d",               # no repetition
                    "",                       # degenerate
                    "w w w w",               # bigram "w w" x3, 4 toks
                ],
            }
        )
    )
    out = (
        txt.add_repetition_scores(ds, "text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["dup_line_frac"].tolist() == pytest.approx([round(1 - 2 / 3, 4), 0.0, 0.0, 0.0])
    assert out["top_bigram_frac"].tolist() == pytest.approx(
        [round(2 * 2 / 5, 4), round(2 * 1 / 4, 4), 0.0, round(2 * 3 / 4, 4)]
    )


def test_contamination_flags_planted_overlap(ray_session):
    # eval doc shares the 3-gram "quick brown fox" with corpus doc 0
    # only; doc 2 ("quick brown cat") must NOT be flagged
    ev = pa.table({"doc_id": pa.array([100], pa.int64()), "text": ["quick brown fox trot"]})
    out = (
        dd.contamination_flags(_docs(), ev, w=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [1, 0, 0, 0, 0, 0]


def test_contamination_short_doc_full_run(ray_session):
    # docs shorter than w hash their full token run: "one two" matches
    # an identical short eval doc but nothing longer
    ev = pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["one two"]})
    out = (
        dd.contamination_flags(_docs(), ev, w=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [0, 0, 0, 0, 1, 0]


def test_contamination_empty_blocklist(ray_session):
    ev = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    out = dd.contamination_flags(_docs(), ev, w=3).to_pandas()
    assert out["contaminated"].sum() == 0 and len(out) == len(TEXTS)


def test_pii_clean(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": [
                    "mail bob@example.com  or  a.b+c@x.co.uk\nnow",
                    "see https://ex.com/a?b=1 from 10.0.0.1",
                    "nothing here",
                ],
            }
        )
    )
    out = (
        txt.add_pii_clean(ds, "text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_emails"].tolist() == [2, 0, 0]
    assert out["n_urls"].tolist() == [0, 1, 0]
    assert out["n_ips"].tolist() == [0, 1, 0]
    # redacted + whitespace-collapsed + trimmed
    assert out["clean"].tolist() == [
        "mail <EMAIL> or <EMAIL> now",
        "see <URL> from 10.0.0.1",
        "nothing here",
    ]


def test_pack_sequences_invariants(ray_session):
    """Greedy sample packing: every doc exactly once, pack token sums
    never exceed the budget unless the pack is a single oversize doc,
    packs fill greedily (adding the next doc would overflow), and the
    output is identical at any input partitioning."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.ops.pack import pack_sequences

    rng = np.random.default_rng(11)
    n, budget = 400, 100
    tok = rng.integers(1, 160, size=n)  # some docs exceed the budget
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64), "n_tokens": tok.astype(np.int64)})

    out = pack_sequences(
        rd.from_arrow(t), budget=budget, num_shards=8
    ).to_pandas().sort_values(["pack_id", "pack_seq"]).reset_index(drop=True)

    # exactly-once coverage
    assert sorted(out["doc_id"].tolist()) == list(range(n))
    g = out.groupby("pack_id")
    sums = g["n_tokens"].sum()
    sizes = g.size()
    # budget bound (oversize docs pack alone)
    over = sums > budget
    assert (sizes[over] == 1).all()
    # greedy fullness: within a shard, a non-final pack plus its
    # successor's first doc must overflow the budget
    out["shard"] = out["pack_id"].to_numpy() >> 32
    for _, sh in out.groupby("shard"):
        packs = sh.groupby("pack_id", sort=True)
        pids = sorted(sh["pack_id"].unique())
        for a, b in zip(pids, pids[1:]):
            first_next = sh[sh["pack_id"] == b].iloc[0]["n_tokens"]
            assert sums[a] + first_next > budget
        # docs within a shard are packed in doc_id order
        assert sh.sort_values(["pack_id", "pack_seq"])["doc_id"].is_monotonic_increasing
    # pack_seq is 0..len-1 per pack
    assert (g["pack_seq"].min() == 0).all()
    assert (g["pack_seq"].max() + 1 == sizes).all()

    # partitioning independence: 1 block vs 13 blocks, same output
    out2 = pack_sequences(
        rd.from_arrow(t).repartition(13), budget=budget, num_shards=8
    ).to_pandas().sort_values(["pack_id", "pack_seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[out2.columns.intersection(out.columns)], out2[out2.columns.intersection(out.columns)])

    # reference greedy packer parity on one shard's doc set
    import hashlib

    shard0 = sorted(
        int(d) for d in t["doc_id"].to_pylist()
        if int.from_bytes(hashlib.md5(str(d).encode()).digest()[:8], "little") % 8 == 0
    )
    toks0 = {int(d): int(v) for d, v in zip(t["doc_id"].to_pylist(), t["n_tokens"].to_pylist())}
    packs, cur, cur_sum = [], [], 0
    for d in shard0:
        v = toks0[d]
        if cur and cur_sum + v > budget:
            packs.append(cur)
            cur, cur_sum = [], 0
        cur.append(d)
        cur_sum += v
    if cur:
        packs.append(cur)
    got0 = [
        grp["doc_id"].tolist()
        for _, grp in out[out["shard"] == 0].groupby("pack_id", sort=True)
    ]
    assert got0 == packs


def test_deterministic_shuffle(ray_session):
    """Epoch shuffle: a permutation (every rank exactly once), stable
    across runs and partitioning, different under a different salt."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.ops.pack import deterministic_shuffle

    n = 300
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64), "v": np.arange(n)})
    a = deterministic_shuffle(rd.from_arrow(t), "doc_id", num_shards=16).to_pandas()
    assert sorted(a["shuffle_rank"].tolist()) == list(range(n))
    assert sorted(a["doc_id"].tolist()) == list(range(n))
    # not the identity order (it's a real permutation)
    asorted = a.sort_values("shuffle_rank")["doc_id"].tolist()
    assert asorted != list(range(n))
    # partitioning-independent
    b = deterministic_shuffle(rd.from_arrow(t).repartition(7), "doc_id", num_shards=16).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    # a different salt draws a different permutation
    c = deterministic_shuffle(rd.from_arrow(t), "doc_id", num_shards=16, salt="ep1").to_pandas()
    assert c.sort_values("shuffle_rank")["doc_id"].tolist() != asorted


def test_significant_terms_hand_corpus(ray_session):
    """JLH lift: a term appearing in ALL matched docs but few others
    outranks a corpus-wide stopword; the query term itself and terms
    under min_doc_count are excluded."""
    import pandas as pd
    import ray.data as rd

    from search_engine_ray.ops import text as txt

    rows = []
    # 4 fg docs: contain q + sig; sig appears in 1 bg doc; 'the' everywhere
    for i in range(4):
        rows.append((i, "q sig the filler%d" % i))
    rows.append((4, "sig the"))
    for i in range(5, 20):
        rows.append((i, "the other%d stuff" % i))
    docs = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = txt.significant_terms(docs, "q", k=5, min_doc_count=2).to_pandas()
    assert "q" not in set(out["term"])          # query term excluded
    assert out.iloc[0]["term"] == "sig"          # highest lift
    srow = out[out["term"] == "sig"].iloc[0]
    assert srow["fg"] == 4 and srow["bg"] == 5
    # JLH value: fgr=1, bgr=5/20 -> (1-.25)*1/.25 = 3.0
    assert abs(srow["score"] - 3.0) < 1e-9
    # 'the' has zero lift (fgr == 4/4 =1, bgr=1) -> (1-1)*1/1 = 0
    trow = out[out["term"] == "the"].iloc[0]
    assert trow["score"] == 0.0
    # fillers appear once each -> excluded by min_doc_count=2
    assert not any(t.startswith("filler") for t in out["term"])


def test_chunk_documents_edges(ray_session):
    """Sliding-window chunking: exact-window doc -> 1 chunk; W+1
    tokens -> 2 chunks with the overlap; empty doc -> no rows; kept
    columns fan out with the chunks."""
    import pandas as pd
    import ray.data as rd

    from search_engine_ray.ops import text as txt

    toks = lambda n: " ".join(f"t{i}" for i in range(n))
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [toks(4), toks(5), "", toks(2)],
    }))
    out = txt.chunk_documents(docs, chunk_tokens=4, stride=2, keep=["doc_id"]).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    # doc 1: n=4=W -> one chunk of 4
    d1 = out[out["doc_id"] == 1]
    assert len(d1) == 1 and d1.iloc[0]["chunk"] == "t0 t1 t2 t3"
    # doc 2: n=5 -> chunks [0..3], [2..4]
    d2 = out[out["doc_id"] == 2]
    assert list(d2["chunk"]) == ["t0 t1 t2 t3", "t2 t3 t4"]
    assert list(d2["n_tokens"]) == [4, 3]
    # doc 3: empty -> absent
    assert (out["doc_id"] == 3).sum() == 0
    # doc 4: n=2 < W -> single short chunk
    d4 = out[out["doc_id"] == 4]
    assert len(d4) == 1 and d4.iloc[0]["n_tokens"] == 2
    with pytest.raises(ValueError):
        txt.chunk_documents(docs, chunk_tokens=0)


def test_extract_fragments(ray_session):
    """Multi-fragment highlight: per-doc cap, position order, window
    clamping at doc edges."""
    import pandas as pd
    import ray.data as rd

    from search_engine_ray.ops import text as txt

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "x x hit a b hit c d hit e hit",  # 4 occurrences
            "hit only once here",
            "no match at all",
        ],
    }))
    out = txt.extract_fragments(docs, "hit", context=1, max_fragments=3).to_pandas()
    out = out.sort_values(["doc_id", "frag_idx"]).reset_index(drop=True)
    d1 = out[out["doc_id"] == 1]
    assert len(d1) == 3                     # capped at 3 of 4
    assert d1["frag_idx"].tolist() == [1, 2, 3]
    assert d1["pos"].tolist() == [3, 6, 9]
    assert d1["snippet"].tolist() == ["x hit a", "b hit c", "d hit e"]
    d2 = out[out["doc_id"] == 2]
    assert len(d2) == 1 and d2.iloc[0]["snippet"] == "hit only"  # left edge clamp
    assert (out["doc_id"] == 3).sum() == 0
    with pytest.raises(ValueError):
        txt.extract_fragments(docs, "hit", max_fragments=0)


def test_significant_terms_no_matches(ray_session):
    import pandas as pd
    import ray.data as rd

    from search_engine_ray.ops import text as txt

    docs = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "b c"]}))
    ds = txt.significant_terms(docs, "zzz", k=5)
    # (empty Datasets surface no column names through to_pandas —
    # the known Ray empty-block behavior — so assert via schema+count)
    assert ds.count() == 0
    assert sorted(ds.schema().names) == ["bg", "fg", "score", "term"]


def test_line_dedup_semantics(ray_session):
    import pandas as pd

    boiler = "=== footer ==="
    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    f"alpha one\n{boiler}",        # footer removed
                    f"beta two\n\n{boiler}",       # empty line survives
                    boiler,                          # ALL lines removed
                    "gamma\ngamma\ndelta",          # within-doc dup counts
                    "",                              # empty doc untouched
                ],
            }
        )
    )
    out = (
        dd.line_dedup(docs, min_count=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "clean_text"] == "alpha one"
    assert out.loc[1, "n_removed"] == 1 and out.loc[1, "n_lines"] == 2
    # the empty middle line is structure: kept, never counted
    assert out.loc[2, "clean_text"] == "beta two\n"
    assert out.loc[3, "clean_text"] == "" and out.loc[3, "n_removed"] == 1
    # 'gamma' occurs twice inside one doc -> corpus count 2 -> removed
    assert out.loc[4, "clean_text"] == "delta" and out.loc[4, "n_removed"] == 2
    assert out.loc[5, "clean_text"] == "" and out.loc[5, "n_removed"] == 0
    assert out.loc[5, "n_lines"] == 1  # string_split('') == ['']


def test_line_dedup_all_unique_noop(ray_session):
    import pandas as pd

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a\nb", "c\nd"]})
    )
    out = dd.line_dedup(docs).to_pandas().sort_values("doc_id")
    assert out["clean_text"].tolist() == ["a\nb", "c\nd"]
    assert out["n_removed"].sum() == 0


def test_tfidf_keywords(ray_session):
    import math

    import numpy as np
    import pandas as pd

    from search_engine_ray.ops import text as txt
    from search_engine_ray.ops.rounding import round_half_up

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "apple banana apple cherry",
            "banana banana date",
            "cherry date apple",
            "",  # tokenless doc emits nothing but still counts in N
        ],
    })
    out = (
        txt.tfidf_keywords(rd.from_pandas(docs, override_num_blocks=3),
                           "text", "doc_id", top_n=2)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    # brute tf-idf with N = 4 (all rows) and df over token presence
    toks = {i: (t.split() if t else []) for i, t in zip(docs["doc_id"], docs["text"])}
    df = {}
    for ts in toks.values():
        for u in set(ts):
            df[u] = df.get(u, 0) + 1
    exp = []
    for i, ts in toks.items():
        scores = {}
        for u in set(ts):
            scores[u] = ts.count(u) * math.log(4.0 / df[u])
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        for r, (u, s) in enumerate(top, 1):
            exp.append((i, u, r, float(round_half_up(s, 4))))
    exp_df = pd.DataFrame(exp, columns=["doc_id", "token", "rnk", "tfidf"])
    pd.testing.assert_frame_equal(out, exp_df, check_dtype=False)
    assert 4 not in set(out["doc_id"])
