"""Driver contract for the graft builder (Ray Data target).

- ``entry()``: flagship pipeline (index build + BM25 search) over
  /root/testdata/sf0.001.
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 + the training-data ops (dedup / ANN / text analysis /
  multimodal). Each takes ``sf_dir`` and returns a Dataset / pandas
  DataFrame / pyarrow Table.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible
  entry — including full Okapi BM25 scoring written out as SQL CTEs so
  the search engine itself is oracle-checked, not just the relational
  ring. Column names match the Ray side exactly.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in the library code these use.
"""

from __future__ import annotations

import hashlib
import math
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from search_engine_ray.ops.rounding import round_half_up

# --------------------------------------------------------------------
# shared SQL fragments (tokenizer MUST stay in lockstep with
# search_engine_ray.analysis.TOKEN_RE / STOP_TOKENS)
# --------------------------------------------------------------------
_TOKS = (
    "list_filter(regexp_extract_all(lower({col}), '[a-z0-9_]+'), "
    "t -> t NOT IN ('rs','gm','ml','kg'))"
)


def _bm25_sql(
    terms: list[str],
    mode: str = "must",
    k: int = 10,
    boost_sql: str = "",
    col: str = "text",
    prefix: bool = False,
    table_sql: str = "documents",
) -> str:
    """Textbook Okapi BM25 (k1=1.2, b=0.75) as DuckDB SQL — the same
    formula/op-order as search_engine_ray.query.scoring (numerator
    tf*2.2, denominator tf + 1.2*(1 - 0.75 + 0.75*dl/avgdl), idf
    ln(1+(N-df+0.5)/(df+0.5)), avgdl = sum(dl)/N over the field)."""
    toks = _TOKS.format(col=col)
    if prefix:
        tf_exprs = [
            f"len(list_filter(ts, t -> t LIKE '{t}%')) AS tf{i}" for i, t in enumerate(terms)
        ]
    else:
        tf_exprs = [f"len(list_filter(ts, t -> t = '{t}')) AS tf{i}" for i, t in enumerate(terms)]
    df_exprs = [f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}" for i in range(len(terms))]
    score_terms = [
        f"(CASE WHEN tf{i} > 0 THEN "
        f"ln(1 + (s.n - s.df{i} + 0.5) / (s.df{i} + 0.5)) * tf{i} * 2.2 / "
        f"(tf{i} + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END)"
        for i in range(len(terms))
    ]
    score = " + ".join(score_terms)
    if boost_sql:
        score = f"({score}) + ({boost_sql})"
    joiner = " AND " if mode == "must" else " OR "
    cond = joiner.join(f"tf{i} > 0" for i in range(len(terms)))
    return f"""
WITH tok AS (SELECT doc_id, n_chars, {toks} AS ts FROM {table_sql}),
d AS (SELECT doc_id, n_chars, len(ts) AS dl, {', '.join(tf_exprs)} FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len, {', '.join(df_exprs)} FROM d)
SELECT d.doc_id, round({score}, 4) AS score
FROM d, s WHERE {cond}
ORDER BY ({score}) DESC, d.doc_id LIMIT {k}
"""


def _sim_sql(
    must: list[str],
    should: list[str],
    sim: str,
    k: int = 10,
    msm: int = 0,
    mu: float = 2000.0,
) -> str:
    """Pluggable-similarity oracles (Lucene Similarity parity) with the
    same CTE skeleton / float op-order as
    search_engine_ray.query.scoring.leaf_score:
    classic  -> (1+ln(N/(df+1)))^2 * sqrt(tf) / sqrt(dl)
    lm_dirichlet -> max(0, ln(1 + tf/(mu*cf/total_len)) + ln(mu/(dl+mu)))
    boolean  -> 1 per matching scoring clause."""
    terms = list(must) + list(should)
    toks = _TOKS.format(col="text")
    tf_exprs = [f"len(list_filter(ts, t -> t = '{t}')) AS tf{i}" for i, t in enumerate(terms)]
    s_exprs = [f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}" for i in range(len(terms))]
    if sim == "classic":
        per = [
            f"(CASE WHEN tf{i} > 0 THEN "
            f"pow(1 + ln(s.n / (s.df{i} + 1)), 2) * sqrt(tf{i}) / sqrt(d.dl) "
            f"ELSE 0 END)"
            for i in range(len(terms))
        ]
    elif sim == "lm_dirichlet":
        s_exprs += [f"sum(tf{i}) AS cf{i}" for i in range(len(terms))]
        per = [
            f"(CASE WHEN tf{i} > 0 THEN "
            f"greatest(ln(1 + tf{i} / ({mu!r} * (s.cf{i} / s.total_len))) + "
            f"ln({mu!r} / (d.dl + {mu!r})), 0) ELSE 0 END)"
            for i in range(len(terms))
        ]
    elif sim == "dfr":
        # I(n)-L-H2: tfn = tf * log2(1 + avgdl/dl); w * tfn / (1 + tfn)
        tfn = "(tf{i} * log2(1 + (s.total_len / s.n) / d.dl))"
        per = [
            f"(CASE WHEN tf{i} > 0 THEN "
            f"log2((s.n + 1) / (s.df{i} + 0.5)) * {tfn.format(i=i)} / "
            f"(1 + {tfn.format(i=i)}) ELSE 0 END)"
            for i in range(len(terms))
        ]
    elif sim == "boolean":
        per = [f"(CASE WHEN tf{i} > 0 THEN 1.0 ELSE 0 END)" for i in range(len(terms))]
    else:
        raise ValueError(sim)
    score = " + ".join(per)
    conds = [f"tf{i} > 0" for i in range(len(must))]
    if should:
        n_should = " + ".join(
            f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)"
            for i in range(len(must), len(terms))
        )
        if msm > 0:
            conds.append(f"({n_should}) >= {msm}")
    cond = " AND ".join(conds) if conds else "TRUE"
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, {', '.join(tf_exprs)} FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len, {', '.join(s_exprs)} FROM d)
SELECT d.doc_id, round({score}, 4) AS score
FROM d, s WHERE {cond}
ORDER BY ({score}) DESC, d.doc_id LIMIT {k}
"""


# --------------------------------------------------------------------
# engine/index helpers (index per sf_dir, cached under /tmp)
# --------------------------------------------------------------------


import threading as _threading

_ENGINES: dict[str, Any] = {}
_ENGINE_LOCK = _threading.Lock()


def _doc_engine(sf_dir: str):
    from search_engine_ray.config import DOCUMENTS_CONFIG
    from search_engine_ray.index import build_index
    from search_engine_ray.query import SearchEngine

    with _ENGINE_LOCK:  # guard against concurrent first-build races
        if sf_dir in _ENGINES:
            return _ENGINES[sf_dir]
        from search_engine_ray.index.build import CODEC_FORMATS

        tag = sf_dir.strip("/").replace("/", "_")
        # cache keyed on schema rev (_v2: phonetic namespace) AND the
        # on-disk postings format, so format bumps auto-invalidate
        _pf = CODEC_FORMATS[DOCUMENTS_CONFIG.codec]
        idx_dir = f"/tmp/ser_idx_cache/{tag}/documents_v2_pf{_pf}"
        if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
            build_index(
                os.path.join(sf_dir, "documents.parquet"), idx_dir, DOCUMENTS_CONFIG, sha_col="text"
            )
        _ENGINES[sf_dir] = SearchEngine(idx_dir, DOCUMENTS_CONFIG)
        return _ENGINES[sf_dir]


def _e13_index_dir(sf_dir: str) -> str:
    """10%-subset documents index (doc_id % 10 == 0) for the
    snapshot/fsck maintenance round-trip — the round-trip cost is
    proportional to index size, so the driver entry exercises it on a
    deterministic shard-like subset instead of the full corpus (the
    full-index path is identical code). Cache keyed on source mtime."""
    from search_engine_ray.config import DOCUMENTS_CONFIG
    from search_engine_ray.index import build_index

    src = os.path.join(sf_dir, "documents.parquet")
    tag = sf_dir.strip("/").replace("/", "_")
    base = f"/tmp/ser_idx_cache/{tag}/e13_sub_{int(os.path.getmtime(src))}"
    idx = os.path.join(base, "index")
    with _ENGINE_LOCK:
        if not os.path.exists(os.path.join(idx, "manifest.json")):
            import shutil

            shutil.rmtree(base, ignore_errors=True)
            os.makedirs(base, exist_ok=True)
            t = pq.read_table(src)
            sub = t.filter(pa.array(t["doc_id"].to_numpy() % 10 == 0))
            sub_path = os.path.join(base, "docs_sub.parquet")
            pq.write_table(sub, sub_path)
            build_index(sub_path, idx, DOCUMENTS_CONFIG, sha_col="text")
    return idx


def _plural_docs_dir(sf_dir: str) -> str:
    """documents ∪ pluralized copy (id+1000000, every 'vector' ->
    'vectors') as a /tmp parquet dir — the stemmed-index corpus.
    Cache keyed on the source file's mtime so testdata regeneration
    invalidates it (the e1 CSV-cache lesson)."""
    src = os.path.join(sf_dir, "documents.parquet")
    tag = sf_dir.strip("/").replace("/", "_")
    out = f"/tmp/ser_idx_cache/{tag}/plural_docs_{int(os.path.getmtime(src))}"
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        import shutil

        import pyarrow.compute as pc

        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        t = pq.read_table(src)
        cp = t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(t["doc_id"], 1_000_000),
        )
        cp = cp.set_column(
            cp.schema.get_field_index("text"),
            "text",
            pc.replace_substring(cp["text"], pattern="vector", replacement="vectors"),
        )
        pq.write_table(pa.concat_tables([t, cp]), os.path.join(out, "part-0.parquet"))
        open(done, "w").write("ok")
    return out


def _stem_engine(sf_dir: str):
    """SearchEngine over the plural corpus with the `code_stem`
    analyzer (Harman S-stemmer at index AND query time) — the S49
    pluggable-analyzer entry's engine."""
    import dataclasses

    from search_engine_ray.config import DOCUMENTS_CONFIG
    from search_engine_ray.index import build_index
    from search_engine_ray.query import SearchEngine

    cfg = dataclasses.replace(DOCUMENTS_CONFIG, analyzer="code_stem")
    key = sf_dir + "#stem"
    with _ENGINE_LOCK:
        if key in _ENGINES:
            return _ENGINES[key]
        from search_engine_ray.index.build import CODEC_FORMATS

        tag = sf_dir.strip("/").replace("/", "_")
        # keyed on the SAME source mtime as the plural corpus dir, so
        # regenerated testdata rebuilds the index too
        mt = int(os.path.getmtime(os.path.join(sf_dir, "documents.parquet")))
        idx_dir = (
            f"/tmp/ser_idx_cache/{tag}/documents_stem_pf{CODEC_FORMATS[cfg.codec]}_{mt}"
        )
        if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
            build_index(_plural_docs_dir(sf_dir), idx_dir, cfg, sha_col="text")
        _ENGINES[key] = SearchEngine(idx_dir, cfg)
        return _ENGINES[key]


def _bm25_query(sf_dir: str, q, k: int = 10, boosts: tuple = ()) -> pd.DataFrame:
    """Engine-side mirror of _bm25_sql via the scatter-gather top-k
    path (rank-identical to a full-precision sort with doc_id
    tiebreak — the oracle's ORDER BY — and milliseconds warm instead
    of a Dataset job per query); scores rounded for output only."""
    eng = _doc_engine(sf_dir)
    res = eng.search(q, k=k, boosts=boosts, with_metadata=False)
    hits = res.hits
    return pd.DataFrame(
        {
            "doc_id": hits["doc_id"].to_numpy(),
            "score": round_half_up(hits["score"].to_numpy()),
        }
    )


def _ensure_positions(eng, sf_dir: str) -> None:
    """Build the positional sidecar for the cached documents index
    once (atomic under the index dir); every phrase entry shares it."""
    d = eng.dirs[0]
    if not os.path.isdir(os.path.join(d, "positions")):
        from search_engine_ray.config import DOCUMENTS_CONFIG
        from search_engine_ray.index import build_positions

        build_positions(
            os.path.join(sf_dir, "documents.parquet"), d, DOCUMENTS_CONFIG
        )


def _docs_with_near_dups(sf_dir: str):
    """documents ∪ perturbed copy (id+1000000, one token appended) —
    a deterministic near-dup corpus for the dedup rows-only entries."""
    import ray.data as rd

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def _perturb(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": pc.add(t["doc_id"], 1_000_000),
                "text": pc.binary_join_element_wise(t["text"], "zz_dup_marker", " "),
            }
        )

    return docs.union(docs.map_batches(_perturb, batch_format="pyarrow"))


def _soundex_sql(v: str) -> str:
    """DuckDB expression computing analysis.soundex({v}) for a
    lowercase [a-z0-9_]+ token — used by the s9_phonetic oracle.
    Mirrors the Python exactly: drop h/w after the first char, map
    letters to digit codes (digits/underscore act like vowels),
    collapse adjacent duplicate codes (RE2 has no backrefs, so one
    regexp_replace per code digit), drop the first char's code run,
    drop vowels, pad to 4."""
    base = f"substr({v},1,1) || regexp_replace(substr({v},2), '[hw]', '', 'g')"
    digits = (
        f"translate({base}, 'bfpvcgjkqsxzdtlmnraeiouy0123456789_', "
        "'11112222222233455600000000000000000')"
    )
    collapsed = digits
    for c in "0123456":
        collapsed = f"regexp_replace({collapsed}, '{c}+', '{c}', 'g')"
    code = f"replace(substr({collapsed}, 2), '0', '')"
    return (
        f"CASE WHEN NOT regexp_matches({v}, '^[a-z]') THEN {v} "
        f"ELSE substr(upper(substr({v},1,1)) || {code} || '000', 1, 4) END"
    )


# shared CTE: the perturbed near-dup corpus used by the dedup entries
_BOTH_DOCS_SQL = (
    "both_docs AS (SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 1000000, text || ' zz_dup_marker' FROM documents)"
)

# all-pairs exact token-3-shingle Jaccard over the perturbed corpus —
# the value oracle for dedup_ngram (exact-recall shingle blocking) and
# dedup_minhash (LSH + exact verify; equality checked empirically on
# the deterministic test corpora)
_JACCARD_ALLPAIRS_SQL = f"""
WITH {_BOTH_DOCS_SQL},
tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM both_docs),
sh AS (SELECT doc_id,
       CASE WHEN len(ts) >= 3 THEN
         list_distinct(list_transform(range(1, len(ts) - 1),
                                      j -> ts[j] || ' ' || ts[j+1] || ' ' || ts[j+2]))
            WHEN len(ts) > 0 THEN [array_to_string(ts, ' ')]
            ELSE [] END AS shingles
       FROM tok),
e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY 1),
inter AS (SELECT e1.doc_id AS a, e2.doc_id AS b, count(*) AS i
          FROM e e1 JOIN e e2 ON e1.s = e2.s AND e1.doc_id < e2.doc_id
          GROUP BY 1, 2)
SELECT a, b, round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jaccard
FROM inter JOIN sizes sa ON inter.a = sa.doc_id JOIN sizes sb ON inter.b = sb.doc_id
WHERE round(i::DOUBLE / (sa.sz + sb.sz - i), 4) >= 0.5
"""

# Broder containment variant of the all-pairs oracle: identical
# shingle/intersection chain, denominator = least(|A|, |B|) — the
# subset-duplicate measure (dedup_containment, threshold 0.8)
_CONTAINMENT_ALLPAIRS_SQL = f"""
WITH {_BOTH_DOCS_SQL},
tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM both_docs),
sh AS (SELECT doc_id,
       CASE WHEN len(ts) >= 3 THEN
         list_distinct(list_transform(range(1, len(ts) - 1),
                                      j -> ts[j] || ' ' || ts[j+1] || ' ' || ts[j+2]))
            WHEN len(ts) > 0 THEN [array_to_string(ts, ' ')]
            ELSE [] END AS shingles
       FROM tok),
e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY 1),
inter AS (SELECT e1.doc_id AS a, e2.doc_id AS b, count(*) AS i
          FROM e e1 JOIN e e2 ON e1.s = e2.s AND e1.doc_id < e2.doc_id
          GROUP BY 1, 2)
SELECT a, b, round(i::DOUBLE / least(sa.sz, sb.sz), 4) AS containment
FROM inter JOIN sizes sa ON inter.a = sa.doc_id JOIN sizes sb ON inter.b = sb.doc_id
WHERE round(i::DOUBLE / least(sa.sz, sb.sz), 4) >= 0.8
"""

# duplicate clusters from the exact-recall Jaccard pair set: the
# transitive closure (recursive CTE) labels every paired doc with the
# min doc_id reachable from it — the same fixpoint the distributed
# min-label propagation in ops/dedup.py connected_components reaches
_COMPONENTS_SQL = f"""
WITH RECURSIVE jp AS ({_JACCARD_ALLPAIRS_SQL}),
edges AS (
  SELECT a AS u, b AS v FROM jp UNION SELECT b, a FROM jp
  UNION SELECT a, a FROM jp UNION SELECT b, b FROM jp
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, g.v FROM reach r JOIN edges g ON r.v = g.u
)
SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u
"""

# surviving corpus after keep-one dedup: every doc except cluster
# members whose component label differs from their own id
_SURVIVORS_SQL = f"""
WITH RECURSIVE jp AS ({_JACCARD_ALLPAIRS_SQL}),
edges AS (
  SELECT a AS u, b AS v FROM jp UNION SELECT b, a FROM jp
  UNION SELECT a, a FROM jp UNION SELECT b, b FROM jp
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, g.v FROM reach r JOIN edges g ON r.v = g.u
),
comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
{_BOTH_DOCS_SQL}
SELECT bd.doc_id FROM both_docs bd
WHERE bd.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> component)
"""

# all-pairs 64-bit SimHash hamming <= 3 over the perturbed corpus.
# Recomputes the engine's md5-derived tf-weighted sign-sum fingerprint
# bit-by-bit in SQL (ops/dedup.py simhash_signatures): bit j of a
# token's 64-bit hash = bit (j%4) of hex digit 16 - j//4 of md5[:16]
# interpreted big-endian. Quarter-blocking recall is exact (pigeonhole:
# <=3 differing bits leave >=1 clean 16-bit quarter), so the engine's
# candidate generation provably finds every hamming<=3 pair.
# cross-corpus pairs only — NEW shard (a 10% perturbed slice, the
# realistic "one ingest batch vs a much larger standing corpus" shape
# the op is designed for) vs the STANDING corpus — for
# dedup_incremental: same shingle machinery as the all-pairs oracle,
# join restricted to new x old, columns named like the op's output
_INC_DOCS_SQL = (
    "both_docs AS (SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 1000000, text || ' zz_dup_marker' "
    "FROM documents WHERE doc_id % 10 = 0)"
)
_JACCARD_INCREMENTAL_SQL = f"""
WITH {_INC_DOCS_SQL},
tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM both_docs),
sh AS (SELECT doc_id,
       CASE WHEN len(ts) >= 3 THEN
         list_distinct(list_transform(range(1, len(ts) - 1),
                                      j -> ts[j] || ' ' || ts[j+1] || ' ' || ts[j+2]))
            WHEN len(ts) > 0 THEN [array_to_string(ts, ' ')]
            ELSE [] END AS shingles
       FROM tok),
e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY 1),
inter AS (SELECT en.doc_id AS new_id, eo.doc_id AS old_id, count(*) AS i
          FROM e en JOIN e eo ON en.s = eo.s
          WHERE en.doc_id >= 1000000 AND eo.doc_id < 1000000
          GROUP BY 1, 2)
SELECT new_id, old_id, round(i::DOUBLE / (sn.sz + so.sz - i), 4) AS jaccard
FROM inter JOIN sizes sn ON inter.new_id = sn.doc_id
           JOIN sizes so ON inter.old_id = so.doc_id
WHERE round(i::DOUBLE / (sn.sz + so.sz - i), 4) >= 0.5
"""

_SIMHASH_ALLPAIRS_SQL = f"""
WITH {_BOTH_DOCS_SQL},
tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tk
        FROM both_docs),
tf AS (SELECT doc_id, tk, count(*) AS tf, md5(tk) AS m FROM tok GROUP BY 1, 2),
bits AS (
  SELECT doc_id, j,
         sum(tf * (2 * ((strpos('0123456789abcdef',
                                substr(m, 16 - (j // 4), 1)) - 1)
                        // (1 << (j % 4)) % 2) - 1)) AS s
  FROM tf CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
  GROUP BY 1, 2),
fp AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 AND j < 63 THEN (1::BIGINT << j)
                       WHEN s > 0 AND j = 63 THEN -9223372036854775807 - 1
                       ELSE 0 END) AS BIGINT) AS f
  FROM bits GROUP BY 1)
SELECT f1.doc_id AS a, f2.doc_id AS b,
       CAST(bit_count(xor(f1.f, f2.f)) AS BIGINT) AS hamming
FROM fp f1 JOIN fp f2 ON f1.doc_id < f2.doc_id
WHERE bit_count(xor(f1.f, f2.f)) <= 3
"""

# all-pairs cosine >= 0.999 over embeddings + float32-perturbed copy
# (the ann_rp_lsh entry's corpus). Identical-direction planted pairs
# always share every random-hyperplane sign, so RP-LSH recall on them
# is exact.
_RP_LSH_ALLPAIRS_SQL = """
WITH both_e AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         list_transform(embedding, x -> CAST(x * CAST(1.0001 AS FLOAT) AS FLOAT))
  FROM embeddings),
n AS (SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM both_e)
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) >= 0.999
"""


# --------------------------------------------------------------------
# driver hooks
# --------------------------------------------------------------------


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents, run
    the reference-analog keyword search, return the hit page."""
    from search_engine_ray.pipelines import keyword_search

    eng = _doc_engine("/root/testdata/sf0.001")
    # multi-term keyword -> S8 dispatches to text-AND on the primary
    # field (a 1-term keyword would dispatch to source-prefix
    # autocomplete, which rightly matches nothing for English words)
    res = keyword_search(
        eng, "hash join", text_field="text", prefix_fields=("source",), k=10,
        facet_fields=("lang",),
    )
    return res["data"]


def queries() -> dict[str, Callable[[str], Any]]:
    import pyarrow.compute as pc

    import search_engine_ray.ops.ann as ann
    import search_engine_ray.ops.dedup as dd
    import search_engine_ray.ops.relational as rel
    import search_engine_ray.ops.sketch as sk
    import search_engine_ray.ops.text as txt
    from search_engine_ray.ops.multimodal import (
        featurize_media,
        sample_frames,
        synthetic_media_table,
    )
    from search_engine_ray.query import Compound, ConditionalAddBoost, Prefix, Term, plan_keyword

    def _rd():
        import ray.data as rd

        return rd

    def _read(sf_dir: str, table: str, columns=None):
        return _rd().read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)

    def _eval_set(sf_dir: str) -> pa.Table:
        # benchmark eval-set fixture (every 97th doc), derived
        # DATASET-side: column-pruned distributed read + filter, then
        # a small collect of the ~1/97 survivors as Arrow blocks.
        # Never a driver-side pq.read_table of the full corpus
        # (VERDICT r03 #5: at 100x that materializes the corpus text
        # on the driver).
        def _f(t: pa.Table) -> pa.Table:
            return t.filter(pa.array(t["doc_id"].to_numpy() % 97 == 0))

        ev = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            _f, batch_format="pyarrow"
        )
        import ray as _ray

        parts = [p for p in _ray.get(ev.to_arrow_refs()) if p.num_rows]
        if not parts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())})
        return pa.concat_tables(parts)

    def _term_match_ids(sf_dir: str, terms, min_tf: int = 1) -> dict:
        # doc ids whose analyzed tf(term) >= min_tf, per term, derived
        # DATASET-side (VERDICT r04 #2): one column-pruned distributed
        # pass tokenizes each batch with the index tokenizer and emits
        # only the matching (term, doc_id) rows — the driver collects
        # a match-set-sized table, never the corpus text (the
        # _eval_set pattern; the old pq.read_table of documents.text
        # is a driver OOM at 100x).
        from search_engine_ray.ops.text import _flat_tokens

        terms_t = tuple(terms)

        def _f(t: pa.Table) -> pa.Table:
            flat, parents, _n = _flat_tokens(t["text"])
            fv = flat.to_numpy(zero_copy_only=False)
            ids = t["doc_id"].to_numpy()
            out_t: list[str] = []
            out_i: list[np.ndarray] = []
            for term in terms_t:
                cnt = np.bincount(parents[fv == term], minlength=len(t))
                sel = ids[cnt >= min_tf]
                out_t.extend([term] * len(sel))
                out_i.append(sel)
            merged = np.concatenate(out_i) if out_i else np.array([], np.int64)
            return pa.table({
                "term": pa.array(out_t, pa.string()),
                "doc_id": pa.array(merged.astype(np.int64), pa.int64()),
            })

        ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            _f, batch_format="pyarrow"
        )
        import ray as _ray

        parts = [p for p in _ray.get(ds.to_arrow_refs()) if p.num_rows]
        tbl = (
            pa.concat_tables(parts)
            if parts
            else pa.table({"term": pa.array([], pa.string()),
                           "doc_id": pa.array([], pa.int64())})
        )
        return {
            term: np.sort(
                tbl.filter(pc.equal(tbl["term"], term))["doc_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            for term in terms_t
        }

    def _cooccur_edges(sf_dir: str):
        # shared co-order pair intermediate (VERDICT r04 #6):
        # r72_basket_rules, r88_degree_dist and pipe_triangles all
        # derive the same cooccur_pairs edge set from lineitem — at
        # scale a write-once partitioned-parquet intermediate replaces
        # three recomputations (the resumable-output rule applied to a
        # shared derived table). Keyed on source mtime+size (the e1
        # CSV-cache lesson). The with_item_counts sentinel channel
        # rides along so every consumer is served from one artifact:
        # pairs = rows with y != -1, per-item order counts = y == -1.
        import ray.data as rd

        src = os.path.join(sf_dir, "lineitem.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        base = f"/tmp/ser_cooccur_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        data_dir = os.path.join(base, "data")
        if not os.path.exists(os.path.join(base, "_DONE")):
            import shutil

            shutil.rmtree(base, ignore_errors=True)
            li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
            rel.cooccur_pairs(
                li, "l_orderkey", "l_partkey", with_item_counts=True
            ).write_parquet(data_dir)
            with open(os.path.join(base, "_DONE"), "w") as f:
                f.write("ok")
        return rd.read_parquet(data_dir)

    # ---- search / scoring (S1-S8) -----------------------------------
    def s1_bm25_term(sf_dir):
        return _bm25_query(sf_dir, Compound(must=(Term("text", "vector"),)))

    def s3_bm25_and(sf_dir):
        return _bm25_query(sf_dir, Compound(must=(Term("text", "hash"), Term("text", "join"))))

    def s3_bm25_should(sf_dir):
        return _bm25_query(
            sf_dir,
            Compound(should=(Term("text", "spark"), Term("text", "window")), min_should_match=1),
        )

    def s2_prefix(sf_dir):
        return _bm25_query(sf_dir, Compound(must=(Prefix("source", "src1"),)))

    def s5_boost(sf_dir):
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
        )
        ids = np.sort(
            t.filter(pc.greater(t["n_chars"], 200))["doc_id"].to_numpy().astype(np.int64)
        )
        boost = ConditionalAddBoost(ids, 10.0)
        return _bm25_query(sf_dir, Compound(must=(Term("text", "vector"),)), boosts=(boost,))

    def s2_range_scan(sf_dir):
        # S2 fallback: prefix on a field with NO edge-n-grams -> sorted
        # term-dictionary range scan; each expanded token scores with
        # its OWN idf and the per-doc contributions sum (Lucene
        # multi-term rewrite semantics). Ranking on the rounded score
        # to absorb SQL SUM() float-order differences.
        eng = _doc_engine(sf_dir)
        q = Compound(must=(Prefix("text", "cust"),))
        df = eng.search_all(q).to_pandas()
        df["score"] = round_half_up(df["score"].to_numpy())
        df = df.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
        return df.head(10)[["doc_id", "score"]].reset_index(drop=True)

    def s6_const_boost(sf_dir):
        # S6 constant-score clause (search_utils.py:168-171): docs
        # matching the boosted clause add a constant 5, not BM25
        q = Compound(
            must=(Term("text", "vector"),),
            should=(Term("text", "slow", const_score=5.0),),
        )
        return _bm25_query(sf_dir, q)

    def s7_normalizer(sf_dir):
        # "5 kg vector rs" normalizes to the single term "vector" (S7)
        q = plan_keyword("5 kg vector rs", text_field="text", prefix_fields=())
        return _bm25_query(sf_dir, q)

    def s8_dispatch(sf_dir):
        # S8 keyword-length dispatch (reference search_utils.py:75-76,
        # app.py:470-486): one entry exercising BOTH planner branches —
        # 1-term -> autocomplete-OR over the prefix fields, multi-term
        # -> text-AND on the primary field.
        out = []
        for branch, kw in (("one_term", "src1"), ("multi_term", "hash join")):
            q = plan_keyword(kw, text_field="text", prefix_fields=("source",))
            df = _bm25_query(sf_dir, q)
            df.insert(0, "branch", branch)
            out.append(df)
        return pd.concat(out, ignore_index=True)

    def s9_phonetic(sf_dir):
        # S9 sounds-like (reference metaphone.py:37-47, dormant):
        # "vektor" soundexes to V236 == soundex("vector"), so the
        # phonetic namespace matches docs containing "vector"
        from search_engine_ray.query import Phonetic

        return _bm25_query(sf_dir, Compound(must=(Phonetic("text", "vektor"),)))

    def s10_fuzzy(sf_dir):
        # S10 fuzzy match (Lucene FuzzyQuery): "vectr" expands against
        # the term dictionary to every token within 1 Levenshtein edit
        # ("vector", plus whatever else the corpus holds); each
        # expansion scores with its OWN idf and per-doc contributions
        # sum — the same multi-term rewrite as the s2 range scan.
        # Ranking on the rounded score absorbs SQL SUM() float order.
        from search_engine_ray.query import Fuzzy

        eng = _doc_engine(sf_dir)
        q = Compound(must=(Fuzzy("text", "vectr", max_edits=1),))
        df = eng.search_all(q).to_pandas()
        df["score"] = round_half_up(df["score"].to_numpy())
        df = df.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
        return df.head(10)[["doc_id", "score"]].reset_index(drop=True)

    def s11_phrase(sf_dir):
        # S11 phrase query ("hash join" as ONE BM25 clause) over the
        # positional sidecar index: per-bucket vectorized adjacency
        # chain (intersect1d over rank<<32|pos keys), tf = phrase
        # occurrences, df = docs containing the phrase. The sidecar is
        # built once per cached index (atomic-subtree rename).
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        # actor path: the chain runs inside the persistent scorer pool
        # (ms warm) — phrase_search_all (the Dataset path) stays the
        # route for stop-phrase-scale match sets
        return phrase_topk(eng, "text", "hash join", k=10)

    def s12_proximity(sf_dir):
        # S12 ordered proximity pair: "hash ... scan" with the second
        # token 1-3 positions after the first; tf counts matched
        # position PAIRS (what a SQL positions self-join counts), df =
        # docs with any pair, scored as one BM25 clause. Same sidecar
        # and chain machinery as s11 with per-gap intersections.
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        return phrase_topk(eng, "text", ["hash", "scan"], window=3, k=10)

    def s13_synonyms(sf_dir):
        # S13 SynonymQuery blend: ("big", "fast") score as ONE
        # pseudo-term — tf summed across the set, idf from the max
        # per-token df. NOT an OR-rewrite: a doc using both words
        # scores like one using either twice.
        from search_engine_ray.query import Synonyms

        q = Compound(must=(Synonyms("text", ("big", "fast")),))
        return _bm25_query(sf_dir, q)

    # ---- relational ring (R1-R17) -----------------------------------
    def r1_filter(sf_dir):
        # predicate pushed INTO the parquet read (row-group pruning);
        # rel.filter_conditions covers the in-stream case (tested)
        from search_engine_ray.ops.sources import read_parquet_filtered

        return read_parquet_filtered(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
            conditions=[("l_quantity", ">", 45.0), ("l_returnflag", "==", "R")],
        )

    def r2_project(sf_dir):
        ds = _read(sf_dir, "lineitem")
        return rel.project(
            ds,
            keep=["l_orderkey", "l_linenumber"],
            exprs={
                # round_half_up (not pc.round): pyarrow's round keeps a
                # last-ulp residue (27036.546000000002) where DuckDB's
                # round() lands on the nearest-to-decimal double
                "revenue": lambda t: pa.array(
                    round_half_up(
                        pc.multiply(
                            t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                        ).to_numpy()
                    )
                )
            },
        )

    def r3_join(sf_dir):
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name", "c_mktsegment"],
        )
        return rel.broadcast_join(orders, cust, on=["o_custkey"], right_on=["c_custkey"], how="inner")

    def r4_two_key_join(sf_dir):
        # R4 correlated two-key $lookup (reference pipelines.py:94-112
        # joins on (product_id, store_id)): composite-key broadcast
        # join of lineitem against the returned-lines slice on the
        # (l_orderkey, l_linenumber) primary key
        # VERDICT r03 #6: the returned-lines slice is ~25% of lineitem
        # — NOT small by construction, so no driver-side read and no
        # unconditional broadcast. The predicate pushes into the scan
        # (row-group pruning) and join_auto makes the cost-based
        # broadcast-vs-shuffle choice (a fact-sized right side takes
        # the hash-partitioned shuffle path).
        import pyarrow.dataset as pads

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
        right = _rd().read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
            filter=(pads.field("l_returnflag") == "R"),
        )

        def _rn(t: pa.Table) -> pa.Table:
            return pa.table({
                "rk": t["l_orderkey"], "rl": t["l_linenumber"],
                "ret_price": t["l_extendedprice"],
            })

        return rel.join_auto(
            li, right.map_batches(_rn, batch_format="pyarrow"),
            on=["l_orderkey", "l_linenumber"], right_on=["rk", "rl"], how="inner",
        )

    def r5_semijoin(sf_dir):
        # R5 semi-join, scale-honest (VERDICT r04 #3): the fact-side
        # key column stays a Dataset end to end — distinct(l_partkey)
        # is a combiner exchange that shrinks the fact column to
        # dimension cardinality DISTRIBUTEDLY, then join_auto runs the
        # exact left-semi (broadcasting the small distinct side, or
        # shuffling if its size is unknown). Nothing lineitem-sized is
        # ever read on the driver.
        part = _read(sf_dir, "part", ["p_partkey", "p_name"])
        li_keys = rel.distinct(_read(sf_dir, "lineitem", ["l_partkey"]), ["l_partkey"])
        return rel.join_auto(
            part, li_keys, on=["p_partkey"], right_on=["l_partkey"], how="left semi"
        )

    def r6_map_enrich(sf_dir):
        # R6 in-memory hash-join enrichment (reference p_data_map,
        # lamda/store_product_sync.py:63-70): broadcast dict lookup
        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
        )
        mapping = dict(zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist()))
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        return rel.broadcast_map_enrich(orders, mapping, "o_custkey", "segment", default="NONE")

    def r9_group_collect(sf_dir):
        # R9 $group + $push $$ROOT (reference pipeline_utils.py:12-21):
        # collect each segment's customer ids; emitted as a sorted
        # joined string so the value hash is order-stable
        cust = _read(sf_dir, "customer", ["c_mktsegment", "c_custkey"])
        out = rel.group_collect(cust, "c_mktsegment", ["c_custkey"]).to_pandas()
        out["members"] = out["rows"].map(
            lambda rs: ",".join(str(r["c_custkey"]) for r in sorted(rs, key=lambda x: x["c_custkey"]))
        )
        return out[["c_mktsegment", "members"]]

    def r7_group_first(sf_dir):
        orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        return rel.group_dedup_first(
            orders, "o_custkey", ["o_totalprice", "o_orderkey"], descending=[True, False]
        )

    def r8_group_sum(sf_dir):
        ds = _read(sf_dir, "lineitem")
        out = rel.grouped_aggregate(
            ds,
            ["l_returnflag", "l_linestatus"],
            {
                "sum_qty": ("sum", "l_quantity"),
                "sum_price": ("sum", "l_extendedprice"),
                "avg_disc": ("mean", "l_discount"),
                "cnt": ("count", "l_quantity"),
            },
        ).to_pandas()
        for c in ("sum_qty", "sum_price", "avg_disc"):
            out[c] = round_half_up(out[c].to_numpy(), 2)
        return out

    def r10_explode(sf_dir):
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        toks = txt.explode_tokens(docs, "text", ["doc_id"])
        return rel.value_counts(toks, "token", alias="cnt")

    def r11_topk(sf_dir):
        orders = _read(sf_dir, "orders")
        return rel.topk(orders, ["o_totalprice", "o_orderkey"], 50, descending=[True, False])

    def r12_paginate(sf_dir):
        orders = _read(sf_dir, "orders")
        return rel.paginate(
            orders, ["o_totalprice", "o_orderkey"], skip=20, limit=10, descending=[True, False]
        )

    def r13_count(sf_dir):
        # R13/R14 `$facet.total` / `$count`: exact match-count of a
        # filtered stream, returned as a one-row table
        ds = _read(sf_dir, "lineitem", ["l_quantity", "l_returnflag"])
        n = rel.filter_conditions(
            ds, [("l_quantity", ">", 30.0), ("l_returnflag", "!=", "N")]
        ).count()
        return pd.DataFrame({"total": [int(n)]})

    def r15_distinct(sf_dir):
        ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
        return rel.distinct(ds, ["l_returnflag", "l_linestatus"])

    def r16_facet_counts(sf_dir):
        return rel.value_counts(_read(sf_dir, "documents", ["lang"]), "lang", alias="cnt")

    def e6_events_rollup(sf_dir):
        ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

        def _day(t: pa.Table) -> pa.Table:
            day = pc.strftime(t["ts"], format="%Y-%m-%d")
            return pa.table({"day": day, "event_type": t["event_type"], "value": t["value"]})

        out = rel.grouped_aggregate(
            ds.map_batches(_day, batch_format="pyarrow"),
            ["day", "event_type"],
            {"n": ("count", "value"), "sum_value": ("sum", "value")},
        ).to_pandas()
        out["sum_value"] = round_half_up(out["sum_value"].to_numpy(), 2)
        return out

    def r2_json_extract(sf_dir):
        # semi-structured projection: pull props.k out of the JSON
        # column and aggregate it (R2 scalar-expr analog for the
        # training-data case of metadata-bearing JSON sidecars)
        ds = _read(sf_dir, "events", ["event_type", "props"])

        def _k(t: pa.Table) -> pa.Table:
            import json as _json

            ks = np.fromiter(
                (_json.loads(s or "{}").get("k", -1) for s in t["props"].to_pylist()),
                dtype=np.int64,
                count=t.num_rows,
            )
            return pa.table({"event_type": t["event_type"], "k": pa.array(ks, pa.int64())})

        return rel.grouped_aggregate(
            ds.map_batches(_k, batch_format="pyarrow"),
            "event_type",
            {"n": ("count", "k"), "sum_k": ("sum", "k"), "max_k": ("max", "k")},
        )

    def r19_window_agg(sf_dir):
        # tumbling-window aggregate (hourly) — the windowed-aggregate
        # custom operator; window key rides the pre-combined hash
        # aggregate (ops/relational.py window_aggregate)
        ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
        out = rel.window_aggregate(
            ds, "ts", 3600,
            {"n": ("count", "value"), "sum_value": ("sum", "value")},
            keys=["event_type"],
        ).to_pandas()
        out["sum_value"] = round_half_up(out["sum_value"].to_numpy(), 2)
        return out

    def r32_cumulative(sf_dir):
        # ES cumulative_sum pipeline aggregation: hourly tumbling
        # windows per event_type, then a running total per type in
        # window order — windowed aggregate composed with the cumsum
        # window function
        ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
        wins = rel.window_aggregate(
            ds, "ts", 3600, {"n": ("count", "value")}, keys=["event_type"]
        )
        return rel.window_functions(
            wins, "event_type", ["window_start"], {"cum_n": ("cumsum", "n")}
        )

    def r33_month_histogram(sf_dir):
        # ES date_histogram calendar_interval=month (uneven buckets —
        # not expressible as a fixed tumbling window): floor_temporal
        # bucket key + combined hash aggregate
        ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
        out = rel.calendar_window_aggregate(
            ds, "ts", "month",
            {"n": ("count", "value"), "sum_value": ("sum", "value")},
            keys=["event_type"],
        ).to_pandas()
        out["sum_value"] = round_half_up(out["sum_value"].to_numpy(), 2)
        # floor_temporal keeps the source resolution; pin epoch-us
        out["window_start"] = out["window_start"].astype("datetime64[us]").astype("int64")
        return out

    def r26_hopping_window(sf_dir):
        # hopping-window aggregate (Flink/KSQL HOP): 1h windows every
        # 15 min — each event lands in 4 windows; the fan-out happens
        # before the combiner so the shuffle stays one row per
        # (window, event_type) per block
        ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
        out = rel.window_aggregate(
            ds, "ts", 3600,
            {"n": ("count", "value"), "sum_value": ("sum", "value")},
            keys=["event_type"], slide_s=900,
        ).to_pandas()
        out["sum_value"] = round_half_up(out["sum_value"].to_numpy(), 2)
        return out

    def r27_rollup(sf_dir):
        # GROUP BY ROLLUP: fine (flag, status), subtotal (flag), grand
        # total — one scan, coarser levels re-aggregate the finest
        # aggregate; l_quantity sums are integer-exact doubles
        ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
        out = rel.rollup_aggregate(
            ds, ["l_returnflag", "l_linestatus"], "l_quantity", alias="sum_qty"
        ).to_pandas()
        out["sum_qty"] = out["sum_qty"].astype(np.int64)
        return out

    def r28_pivot(sf_dir):
        # PIVOT event_type into per-type columns (count FILTER shape):
        # masked per-batch partials + one combined groupby
        ds = _read(sf_dir, "events", ["user_id", "event_type"])
        cohort = ds.map_batches(
            lambda t: pa.table({"cohort": pc.cast(
                pc.bit_wise_and(t["user_id"], 7), pa.int64()),
                "event_type": t["event_type"]}),
            batch_format="pyarrow",
        )
        return rel.pivot_aggregate(
            cohort, "cohort", "event_type",
            ["click", "view", "purchase", "signup", "error"],
        )

    def r30_window_funcs(sf_dir):
        # SQL window functions per user session stream: row_number,
        # rank by value, lag of the previous event's value — one hash
        # shuffle + vectorized per-partition kernel
        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        out = rel.window_functions(
            ev, "user_id", ["ts", "event_id"],
            {
                "rn": ("row_number",),
                "rnk": ("rank",),
                "prev_value": ("lag", "value", 1, -1.0),
            },
        ).to_pandas()
        out["value"] = round_half_up(out["value"].to_numpy(), 2)
        out["prev_value"] = round_half_up(out["prev_value"].to_numpy(), 2)
        out["ts"] = (out["ts"].astype("int64")).astype(np.int64)
        return out[["event_id", "user_id", "ts", "value", "rn", "rnk", "prev_value"]]

    def r20_asof_join(sf_dir):
        # as-of join: each purchase picks up the user's most recent
        # prior click (coarse-shard co-location + one vectorized
        # pandas.merge_asof per shard, ops/relational.py asof_join);
        # right side pre-deduped to one row per (user, ts) so the
        # DuckDB ASOF JOIN oracle is deterministic
        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])
        purchases = rel.filter_conditions(ev, [("event_type", "==", "purchase")]).select_columns(
            ["event_id", "user_id", "ts"]
        )
        clicks = rel.grouped_aggregate(
            rel.filter_conditions(ev, [("event_type", "==", "click")]).select_columns(
                ["user_id", "ts", "value"]
            ),
            ["user_id", "ts"],
            {"click_value": ("max", "value")},
        )
        out = rel.asof_join(purchases, clicks, by="user_id", ts_col="ts").to_pandas()
        for src, dst in (("ts", "pts"), ("right_ts", "click_ts")):
            out[dst] = out[src].astype("datetime64[us]").astype("int64")
        # side-tag null padding promotes event_id to float64 in the
        # per-shard frames; values are exact ints — pin the dtype
        out["event_id"] = out["event_id"].astype("int64")
        return out[["event_id", "user_id", "pts", "click_ts", "click_value"]]

    def r21_range_join(sf_dir):
        # broadcast range join: events.value against a small OVERLAPPING
        # interval table (constant dim table, the reference's
        # STORE_WH_MAP static-broadcast pattern) — one row per
        # (event, containing band); overlaps make it a true range join
        # (multi-match), not mere binning
        ev = _read(sf_dir, "events", ["event_id", "value"])
        bands = pa.table(
            {
                "band": [f"band_{i:02d}" for i in range(13)],
                "lo": [i * 40.0 for i in range(13)],
                "hi": [i * 40.0 + 60.0 for i in range(13)],
            }
        )
        out = rel.range_join(ev, bands, "value").to_pandas()
        return out[["event_id", "value", "band", "lo", "hi"]]

    def r25_bloom_join(sf_dir):
        # selective large x large join: the right side keeps ~10% of
        # orders, so the Bloom prefilter drops most left rows BEFORE
        # the shuffle; conservative construction means the result is
        # identical to the plain join the SQL oracle runs
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        orders = rel.filter_conditions(
            _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
            [("o_totalprice", ">", 450000.0)],
        )
        out = rel.hash_join(
            li, orders, on=["l_orderkey"], right_on=["o_orderkey"],
            num_partitions=16, prefilter=True,
        )
        return out.to_pandas()[["l_orderkey", "l_quantity", "o_totalprice"]]

    def r23_group_topn(sf_dir):
        # per-group top-N (windowed row_number pattern): 3 priciest
        # lineitems per returnflag, deterministic tiebreak by ids
        li = _read(
            sf_dir, "lineitem",
            ["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"],
        )
        out = rel.group_topn(
            li, "l_returnflag",
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            n=3, descending=[True, False, False],
        )
        return out.to_pandas()[
            ["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"]
        ]

    def r22_hash_join(sf_dir):
        # large x large equi-join: both sides hash-partitioned (Ray
        # shuffle join), no broadcast — the scale path when neither
        # side fits a worker heap
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus"])
        out = rel.hash_join(
            li, orders, on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=16
        )
        return out.to_pandas()[
            ["l_orderkey", "l_linenumber", "l_extendedprice", "o_custkey", "o_orderstatus"]
        ]

    def r35_pagerank(sf_dir):
        # iterative distributed graph compute: PageRank (5 power
        # iterations, d=0.85) over the symmetrized customer-supplier
        # purchase graph (distinct (custkey, suppkey) pairs via the
        # lineitem x orders shuffle join; supplier ids offset by 1e6).
        # Every iteration is one hash-join + one groupby-sum — rank
        # state never touches the driver.
        from search_engine_ray.ops.graph import pagerank

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        # materialize the joined pairs BEFORE the symmetrize fan-out
        # (the union consumes them twice; re-executing the join
        # lineage per branch runs two 16-partition JoinOperators).
        # NO distinct pass here: dedup_edges=True collapses duplicate
        # pairs inside pagerank's one-time src-shard build for free —
        # a separate Dataset.distinct is a full extra sort-shuffle
        pairs = (
            rel.hash_join(
                li, orders, on=["l_orderkey"], right_on=["o_orderkey"],
                num_partitions=16,
            )
            .select_columns(["o_custkey", "l_suppkey"])
            .materialize()
        )

        def _fwd(t: pa.Table) -> pa.Table:
            return pa.table(
                {"src": t["o_custkey"], "dst": pc.add(t["l_suppkey"], 1_000_000)}
            )

        def _rev(t: pa.Table) -> pa.Table:
            return pa.table(
                {"src": pc.add(t["l_suppkey"], 1_000_000), "dst": t["o_custkey"]}
            )

        edges = pairs.map_batches(_fwd, batch_format="pyarrow").union(
            pairs.map_batches(_rev, batch_format="pyarrow")
        )
        return pagerank(edges, damping=0.85, iters=5, dedup_edges=True)

    def r24_sessionize(sf_dir):
        # event-stream sessionization: new session after >30 min of
        # user inactivity; per-user 1-based session numbering
        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        out = rel.sessionize(
            ev, by="user_id", ts_col="ts", gap_s=1800, tiebreak="event_id"
        ).to_pandas()
        out["ts"] = out["ts"].astype("datetime64[us]").astype("int64")
        out["session_seq"] = out["session_seq"].astype("int64")
        return out[["event_id", "user_id", "ts", "session_seq"]]

    # ---- sketches / summary statistics -----------------------------
    def sketch_kmv(sf_dir):
        # KMV distinct-count: k=64 < 150 true distinct user_ids, so
        # the estimator path (not the exact-count fallback) is what
        # the oracle checks
        ev = _read(sf_dir, "events", ["user_id"])
        return pd.DataFrame({"distinct_est": [sk.kmv_distinct(ev, "user_id", k=64)]})

    def sketch_hll(sf_dir):
        # HyperLogLog cardinality (the ES `cardinality` estimator),
        # m=64 registers over md5-hashed user_ids; the harmonic sum
        # folds as an exact integer so the estimate replays in SQL
        # independent of register visit order
        ev = _read(sf_dir, "events", ["user_id"])
        return pd.DataFrame({"distinct_est": [sk.hll_distinct(ev, "user_id", p=6)]})

    def r38_extended_stats(sf_dir):
        # ES extended_stats per group: count/sum/avg/var_pop/std_pop
        # + avg±2σ bounds over l_quantity (integer-valued, so the
        # moment sums are float64-exact) — per-key raw-moment combiner
        # then a tiny groupby-sum
        li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
        return sk.extended_stats(li, "l_returnflag", "l_quantity", sigma=2.0)

    def _geo_coords(sf_dir):
        # deterministic pseudo lat/lon per customer (TPC-H has no geo
        # columns): md5-derived uniform doubles, replayed bit-exactly
        # by md5_number_upper in the oracles
        from search_engine_ray.ops.sketch import _md5_upper64

        cust = _read(sf_dir, "customer", ["c_custkey"])

        def _coords(t: pa.Table) -> pa.Table:
            keys = t["c_custkey"].to_numpy(zero_copy_only=False)
            h1 = _md5_upper64([str(k) for k in keys]).astype(np.float64)
            h2 = _md5_upper64([f"{k}:lon" for k in keys]).astype(np.float64)
            two64 = 18446744073709551616.0
            return pa.table({
                "c_custkey": pa.array(keys, pa.int64()),
                "lat": pa.array((h1 / two64) * 180.0 - 90.0, pa.float64()),
                "lon": pa.array((h2 / two64) * 360.0 - 180.0, pa.float64()),
            })

        return cust.map_batches(_coords, batch_format="pyarrow")

    def r39_geo_radius(sf_dir):
        # ES geo_distance query: customers within 3000 km of
        # (10, 20), 20 nearest by (rounded distance, key) — latitude
        # bounding-band prefilter, exact pinned-op-order haversine
        from search_engine_ray.ops import geo

        hits = geo.geo_radius(
            _geo_coords(sf_dir), "lat", "lon", 10.0, 20.0, 3000.0, ["c_custkey"]
        )
        return (
            rel.topk(hits, ["distance_km", "c_custkey"], 20, descending=False)
            .to_pandas().reset_index(drop=True)
        )

    def r40_geo_grid(sf_dir):
        # ES geohash_grid-style aggregation on a 30-degree integer
        # grid: per-block cell combiner, cells (never rows) shuffle
        from search_engine_ray.ops import geo

        out = (
            geo.geo_grid_counts(_geo_coords(sf_dir), "lat", "lon", 30.0)
            .to_pandas()
            .sort_values(["cell_lat", "cell_lon"])
            .reset_index(drop=True)
        )
        out["n"] = out["n"].astype("int64")
        return out

    def r41_outer_join(sf_dir):
        # left-outer hash join (the shuffle JoinOperator's outer
        # path): every customer keeps a row, order-less customers get
        # n_orders = 0 — the $lookup + preserveNullAndEmptyArrays
        # shape at both-sides-big scale
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        per_cust = rel.grouped_aggregate(
            orders, "o_custkey", {"n_orders": ("count", "o_orderkey")}
        )
        j = rel.hash_join(
            cust, per_cust, on=["c_custkey"], right_on=["o_custkey"],
            how="left_outer", num_partitions=8,
        )

        def _fill(t: pa.Table) -> pa.Table:
            n = pc.fill_null(t["n_orders"], 0)
            return pa.table({
                "c_custkey": t["c_custkey"],
                "c_mktsegment": t["c_mktsegment"],
                "n_orders": pc.cast(n, pa.int64()),
            })

        out = j.map_batches(_fill, batch_format="pyarrow").to_pandas()
        return out.sort_values("c_custkey").reset_index(drop=True)

    def r42_auto_histogram(sf_dir):
        # ES auto_date_histogram: pick the FINEST calendar interval
        # from the ladder (year > quarter > month > week > day) whose
        # bucket count fits the target, then run that histogram. The
        # probe pass is one combiner aggregate per unit over distinct
        # truncs (bounded rows); the choice is data-dependent and the
        # oracle replays the same ladder walk in SQL
        target = 20
        ds = _read(sf_dir, "events", ["ts", "value"]).materialize()
        chosen = "year"
        # walk FINEST -> coarsest, first fit wins (ES semantics; week
        # vs month counts are not nested, so a coarse-to-fine walk
        # with early break would pick differently on short spans)
        for unit in ("day", "week", "month", "quarter", "year"):
            n_buckets = rel.calendar_window_aggregate(
                ds, "ts", unit, {"n": ("count", "value")}
            ).count()
            if n_buckets <= target:
                chosen = unit
                break
        out = rel.calendar_window_aggregate(
            ds, "ts", chosen, {"n": ("count", "value")}
        ).to_pandas()
        out = out.sort_values("window_start").reset_index(drop=True)
        out["window_start"] = out["window_start"].astype("datetime64[us]").astype("int64")
        out["n"] = out["n"].astype("int64")
        out.insert(0, "interval", chosen)
        return out

    def pipe_tpch_q1(sf_dir):
        # TPC-H Q1 as a composed pipeline: scan-pushed filter ->
        # per-key raw-moment combiner -> tiny groupby (the
        # extended_stats machinery shape, more measures)
        li = _read(
            sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_tax", "l_shipdate"],
        )
        cutoff = pd.Timestamp("1998-09-02")

        def _partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df[df["l_shipdate"] <= cutoff]
            if df.empty:
                return pa.table({
                    "k": pa.array([], pa.string()),
                    "sq": pa.array([], pa.float64()), "sb": pa.array([], pa.float64()),
                    "sd": pa.array([], pa.float64()), "sc": pa.array([], pa.float64()),
                    "sdisc": pa.array([], pa.float64()), "n": pa.array([], pa.int64()),
                })
            disc_price = df["l_extendedprice"] * (1 - df["l_discount"])
            charge = disc_price * (1 + df["l_tax"])
            g = pd.DataFrame({
                "k": df["l_returnflag"] + "|" + df["l_linestatus"],
                "sq": df["l_quantity"], "sb": df["l_extendedprice"],
                "sd": disc_price, "sc": charge, "sdisc": df["l_discount"],
            })
            agg = g.groupby("k", as_index=False).sum()
            agg["n"] = g.groupby("k", as_index=False).size()["size"].astype("int64")
            return pa.Table.from_pandas(agg, preserve_index=False)

        from ray.data.aggregate import Sum

        agg = (
            li.map_batches(_partial, batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("sq", alias_name="sum_qty"),
                       Sum("sb", alias_name="sum_base_price"),
                       Sum("sd", alias_name="sum_disc_price"),
                       Sum("sc", alias_name="sum_charge"),
                       Sum("sdisc", alias_name="_sdisc"),
                       Sum("n", alias_name="count_order"))
            .to_pandas()
            .sort_values("k", kind="mergesort")
            .reset_index(drop=True)
        )
        n = agg["count_order"].to_numpy(dtype=np.float64)
        out = pd.DataFrame({
            "l_returnflag": agg["k"].str.split("|").str[0],
            "l_linestatus": agg["k"].str.split("|").str[1],
            "sum_qty": round_half_up(agg["sum_qty"].to_numpy()),
            "sum_base_price": round_half_up(agg["sum_base_price"].to_numpy()),
            "sum_disc_price": round_half_up(agg["sum_disc_price"].to_numpy()),
            "sum_charge": round_half_up(agg["sum_charge"].to_numpy()),
            "avg_qty": round_half_up(agg["sum_qty"].to_numpy() / n),
            "avg_price": round_half_up(agg["sum_base_price"].to_numpy() / n),
            "avg_disc": round_half_up(agg["_sdisc"].to_numpy() / n),
            "count_order": agg["count_order"].astype("int64"),
        })
        return out

    def pipe_tpch_q3(sf_dir):
        # TPC-H Q3 (adapted: this synthetic orders table carries no
        # o_shippriority): shuffle-join chain over three tables +
        # revenue aggregate + top-10
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        li = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
        cut = pd.Timestamp("1995-03-15")

        def _cust_f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))

        def _ord_f(t: pa.Table) -> pa.Table:
            return t.filter(pc.less(t["o_orderdate"], pa.scalar(cut)))

        def _li_f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
            rev = pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
            return pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})

        j = rel.hash_join(
            orders.map_batches(_ord_f, batch_format="pyarrow"),
            cust.map_batches(_cust_f, batch_format="pyarrow"),
            on=["o_custkey"], right_on=["c_custkey"], num_partitions=8,
        )
        j2 = rel.hash_join(
            li.map_batches(_li_f, batch_format="pyarrow"),
            j, on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8,
        )
        agg = rel.grouped_aggregate(
            j2, ["l_orderkey", "o_orderdate"], {"revenue": ("sum", "rev")}
        ).to_pandas()
        agg["revenue"] = round_half_up(agg["revenue"].to_numpy())
        agg = agg.sort_values(
            ["revenue", "l_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(10).reset_index(drop=True)
        agg["o_orderdate"] = agg["o_orderdate"].astype("datetime64[us]").astype("int64")
        return agg[["l_orderkey", "revenue", "o_orderdate"]]

    def r43_funnel(sf_dir):
        # event-funnel analysis: users completing view -> click ->
        # purchase with each step within 2h of the previous (greedy-
        # earliest chain); one user-shard exchange, vectorized
        # packed-searchsorted walk per shard
        ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        return rel.funnel(
            ev, "user_id", "ts", "event_type",
            steps=("view", "click", "purchase"), step_window_s=7200.0,
        )

    def r44_retention(sf_dir):
        # cohort retention triangle: cohort = week of the user's first
        # event, retained at offset k if any event in cohort+k weeks;
        # one user-shard exchange, per-shard vectorized fold, global
        # sum over (cohorts x offsets) tiny rows
        ev = _read(sf_dir, "events", ["user_id", "ts"])
        return rel.retention(ev, "user_id", "ts", period="week")

    def pipe_tpch_q5(sf_dir):
        # TPC-H Q5 (local-supplier revenue per nation): the
        # mixed-strategy join showcase — orders x customer and
        # lineitem x (orders x customer) go through the shuffle
        # JoinOperator (both sides big at scale), while region ->
        # nation -> supplier collapse into TWO broadcast lookups
        # (tiny dims, ray.put once, plain-function probe per batch —
        # no actor pool, no extra exchange)
        import ray

        lo = pd.Timestamp("1996-01-01")
        hi = pd.Timestamp("1997-01-01")
        nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
        asia_rk = reg.filter(pc.equal(reg["r_name"], "ASIA"))["r_regionkey"][0].as_py()
        nat = nat.filter(pc.equal(nat["n_regionkey"], asia_rk))
        nation_name = dict(zip(
            nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()
        ))
        sup = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
        )
        sk = sup["s_suppkey"].to_numpy().astype(np.int64)
        sv = sup["s_nationkey"].to_numpy().astype(np.int64)
        so = np.argsort(sk)
        asia_keys = np.array(sorted(nation_name), np.int64)
        asia_names = np.array([nation_name[int(k)] for k in asia_keys])
        maps_ref = ray.put((sk[so], sv[so], asia_keys, asia_names))

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        li = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

        def _ord_f(t: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                        pc.less(t["o_orderdate"], pa.scalar(hi)))
            t = t.filter(m)
            return pa.table({"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"]})

        def _li_f(t: pa.Table) -> pa.Table:
            rev = pc.multiply(t["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0), t["l_discount"]))
            return pa.table({"l_orderkey": t["l_orderkey"],
                             "l_suppkey": t["l_suppkey"], "rev": rev})

        j1 = rel.hash_join(
            orders.map_batches(_ord_f, batch_format="pyarrow"), cust,
            on=["o_custkey"], right_on=["c_custkey"], num_partitions=8,
        )
        j2 = rel.hash_join(
            li.map_batches(_li_f, batch_format="pyarrow"), j1,
            on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8,
        )

        def _probe(t: pa.Table) -> pa.Table:
            skeys, snats, akeys, anames = ray.get(maps_ref)
            supp = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            cnat = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(skeys, supp), 0, skeys.size - 1)
            snat = np.where(skeys[pos] == supp, snats[pos], -1)
            keep = (snat == cnat) & np.isin(snat, akeys)
            rev = t["rev"].to_numpy(zero_copy_only=False)[keep]
            npos = np.searchsorted(akeys, snat[keep])
            return pa.table({"n_name": pa.array(anames[npos], pa.string()),
                             "rev": pa.array(rev, pa.float64())})

        agg = (
            rel.grouped_aggregate(
                j2.map_batches(_probe, batch_format="pyarrow"),
                "n_name", {"revenue": ("sum", "rev")},
            )
            .to_pandas()
        )
        agg["revenue"] = round_half_up(agg["revenue"].to_numpy())
        return agg.sort_values(
            ["revenue", "n_name"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)

    def pipe_tpch_q6(sf_dir):
        # TPC-H Q6 (forecast revenue change): the prune-at-the-read
        # entry — columns AND the shipdate/discount/quantity predicate
        # push into the parquet scan, then one Sum aggregate over the
        # per-batch partial products

        lo = pd.Timestamp("1996-01-01")
        hi = pd.Timestamp("1997-01-01")
        flt = (
            (pc.field("l_shipdate") >= pa.scalar(lo))
            & (pc.field("l_shipdate") < pa.scalar(hi))
            & (pc.field("l_discount") >= 0.05) & (pc.field("l_discount") <= 0.07)
            & (pc.field("l_quantity") < 24.0)
        )
        ds = _rd().read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_extendedprice", "l_discount"],
            filter=flt,
        )

        def _partial(t: pa.Table) -> pa.Table:
            v = pc.multiply(t["l_extendedprice"], t["l_discount"])
            return pa.table({"rev": pa.array([float(pc.sum(v).as_py() or 0.0)],
                                             pa.float64())})

        from ray.data.aggregate import Sum

        total = ds.map_batches(_partial, batch_format="pyarrow").aggregate(
            Sum("rev", alias_name="revenue")
        )
        return pd.DataFrame({"revenue": [float(round_half_up(total["revenue"], 4))]})

    def e15_force_merge(sf_dir):
        # Lucene forceMerge: a 2-shard resumable index + parent-level
        # tombstones (doc_id % 10 == 0) fold into ONE index — the merge
        # IS the global compaction (rank streams re-encoded against the
        # union universe, df/avgdl/n_docs recomputed). The check is
        # end-to-end: BM25 over the merged index must equal the SQL
        # oracle over the SURVIVING corpus
        import glob as _glob
        import shutil

        from search_engine_ray.config import DOCUMENTS_CONFIG
        from search_engine_ray.index import build_index_resumable, merge_indexes
        from search_engine_ray.index.build import add_tombstones, load_tombstones
        from search_engine_ray.query import SearchEngine

        src = os.path.join(sf_dir, "documents.parquet")
        tag = sf_dir.strip("/").replace("/", "_")
        base = f"/tmp/ser_merge_cache/{tag}_{int(os.path.getmtime(src))}_v1"
        sharded = os.path.join(base, "sharded")
        merged = os.path.join(base, "merged")
        if not os.path.exists(os.path.join(merged, "manifest.json")):
            shutil.rmtree(base, ignore_errors=True)
            t = pq.read_table(src)
            files_dir = os.path.join(base, "files")
            os.makedirs(files_dir)
            half = t.num_rows // 2
            f1, f2 = os.path.join(files_dir, "a.parquet"), os.path.join(files_dir, "b.parquet")
            pq.write_table(t.slice(0, half), f1)
            pq.write_table(t.slice(half), f2)
            build_index_resumable([f1, f2], sharded, DOCUMENTS_CONFIG, files_per_shard=1)
            ids = t["doc_id"].to_numpy()
            add_tombstones(sharded, ids[ids % 10 == 0])
            shards = sorted(_glob.glob(os.path.join(sharded, "shards", "shard_*")))
            merge_indexes(
                shards, merged, DOCUMENTS_CONFIG,
                extra_tombstones=load_tombstones(sharded),
            )
        eng = SearchEngine(merged, DOCUMENTS_CONFIG)
        res = eng.search(
            Compound(must=(Term("text", "vector"),)), k=10, with_metadata=False
        )
        return pd.DataFrame({
            "doc_id": res.hits["doc_id"].to_numpy(),
            "score": round_half_up(res.hits["score"].to_numpy()),
        })

    def e16_cdc_replay(sf_dir):
        # CDC / WAL replay to final state: the events stream read as
        # an op log (signup=INSERT, error=DELETE, others=UPSERT per
        # user), replayed by last-writer-wins — one combiner-shaped
        # group_dedup_first (<=1 row per key per block rides the
        # shuffle), then delete-tombstones drop. The streaming analog
        # of the reference's upsert-sink idempotence
        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

        def _ops(t: pa.Table) -> pa.Table:
            et = t["event_type"]
            op = pc.case_when(
                pc.make_struct(
                    pc.equal(et, "signup"), pc.equal(et, "error"),
                ),
                "I", "D", "U",
            )
            return pa.table({
                "user_id": t["user_id"], "ts": t["ts"],
                "event_id": t["event_id"], "op": op, "value": t["value"],
            })

        last = rel.group_dedup_first(
            ev.map_batches(_ops, batch_format="pyarrow"),
            "user_id", ["ts", "event_id"], descending=True,
        )
        def _live(t: pa.Table) -> pa.Table:
            return t.filter(pc.not_equal(t["op"], "D"))

        out = (
            last.map_batches(_live, batch_format="pyarrow")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        out["value"] = round_half_up(out["value"].to_numpy())
        return out[["user_id", "op", "value"]]

    def r46_weighted_avg(sf_dir):
        # ES weighted_avg aggregation per group: quantity-weighted
        # mean price by returnflag — one raw-moment combiner
        # (sum(w*v), sum(w)) then the division on the per-group row
        li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

        def _partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df["_wv"] = df["l_extendedprice"] * df["l_quantity"]
            g = df.groupby("l_returnflag", as_index=False)[["_wv", "l_quantity"]].sum()
            return pa.Table.from_pandas(
                g.rename(columns={"l_quantity": "_w"}), preserve_index=False
            )

        from ray.data.aggregate import Sum

        agg = (
            li.map_batches(_partial, batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(Sum("_wv", alias_name="wv"), Sum("_w", alias_name="w"))
            .to_pandas()
            .sort_values("l_returnflag", kind="mergesort")
            .reset_index(drop=True)
        )
        return pd.DataFrame({
            "l_returnflag": agg["l_returnflag"],
            "weighted_avg_price": round_half_up(
                agg["wv"].to_numpy() / agg["w"].to_numpy()
            ),
        })

    def e17_index_stats(sf_dir):
        # index-integrity stats (the _cat/indices analog), value-
        # checked against the corpus: the text field's DICTIONARY size
        # must equal the analyzed distinct-token count, total_len the
        # analyzed token count — a global build-integrity oracle over
        # the dict + stats components
        import glob as _glob

        eng = _doc_engine(sf_dir)
        vocab = 0
        for d in eng.dirs:
            for f in _glob.glob(os.path.join(d, "dict", "part=*", "dict.parquet")):
                t = pq.read_table(f, columns=["term"])
                s = pc.starts_with(t["term"], "c:")
                vocab += int(pc.sum(s).as_py() or 0)
        st = eng.stats
        tl = int(st["fields"]["text"]["total_len"])
        n = int(st["n_docs"])
        return pd.DataFrame({
            "n_docs": pd.array([n], dtype="int64"),
            "text_vocab": pd.array([vocab], dtype="int64"),
            "text_total_len": pd.array([tl], dtype="int64"),
            "avgdl": [float(round_half_up(tl / n, 4))],
        })

    def r45_grouped_hll(sf_dir):
        # per-group HLL distinct (ES cardinality inside a terms agg):
        # distinct users per event_type; per-block (key, reg, rho)
        # combiner, one groupby-max exchange, estimates replayed in
        # SQL from the same md5 registers
        ev = _read(sf_dir, "events", ["event_type", "user_id"])
        return sk.grouped_hll_distinct(ev, "event_type", "user_id", p=6)

    def sketch_quantiles(sf_dir):
        # exact discrete quantiles from one value-histogram shuffle;
        # q values are binary-exact (q*n has no float fuzz vs DuckDB)
        li = _read(sf_dir, "lineitem", ["l_quantity"])
        return sk.histogram_quantiles(li, "l_quantity", [0.25, 0.5, 0.75])

    def r29_grouped_quantiles(sf_dir):
        # per-group exact quantiles (quantile_disc GROUP BY): one
        # (key, value) histogram shuffle + per-group resolve; nothing
        # group-count-sized on the driver
        li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
        return sk.grouped_quantiles(li, "l_returnflag", "l_quantity", [0.25, 0.5, 0.75])

    def sketch_quantiles_sampled(sf_dir):
        # high-cardinality scale path: exact quantiles of a 1/4
        # deterministic hash sample (bounded histogram shuffle;
        # bit-reproducible in SQL, unlike a t-digest merge)
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
        return sk.sampled_quantiles(
            li, "l_extendedprice", [0.25, 0.5, 0.75], rate=0.25, key_col="l_orderkey"
        )

    def s38_percentile_ranks(sf_dir):
        # ES percentile_ranks (inverse percentiles): % of lineitem
        # quantities <= each threshold — exact, one partial-count pass
        li = _read(sf_dir, "lineitem", ["l_quantity"])
        return sk.percentile_ranks(li, "l_quantity", [10.0, 25.0, 40.0])

    def s39_composite(sf_dir):
        # ES composite aggregation: after-key paging of a
        # high-cardinality numeric attribute (313 distinct n_chars at
        # sf0.01) over the matched set — fully distributed counts +
        # in-stream cursor filter; only the page reaches the driver
        eng = _doc_engine(sf_dir)
        return eng.composite_agg(
            Compound(must=(Term("text", "data"),)), "n_chars", size=8, after=250
        )

    def s40_top_hits(sf_dir):
        # ES top_hits aggregation: best 2 docs per lang bucket over
        # the FULL matched set (group_topn — the shuffle moves
        # O(n x distinct keys), never the match set)
        eng = _doc_engine(sf_dir)
        df = eng.top_hits(Compound(must=(Term("text", "window"),)), "lang", n=2)
        df["score"] = round_half_up(df["score"].to_numpy())
        return df

    def s41_scroll(sf_dir):
        # ES scroll / PIT export: walk the ENTIRE match set in 40-doc
        # search_after pages (each page ships only k candidates per
        # bucket however deep); the concatenation must equal the full
        # ranking (score desc, doc_id asc) — the oracle is the
        # unlimited BM25 ranking
        eng = _doc_engine(sf_dir)
        q = Compound(must=(Term("text", "merge"),))
        pages, cursor = [], None
        while True:
            r = eng.search(q, k=40, search_after=cursor, with_metadata=False)
            if not len(r.hits):
                break
            pages.append(r.hits)
            cursor = (float(r.hits["score"].iloc[-1]), int(r.hits["doc_id"].iloc[-1]))
        hits = (
            pd.concat(pages, ignore_index=True)
            if pages
            else pd.DataFrame({"doc_id": [], "score": []})
        )
        return pd.DataFrame(
            {
                "doc_id": hits["doc_id"].to_numpy().astype(np.int64),
                "score": round_half_up(hits["score"].to_numpy()),
            }
        )

    def s42_termvectors(sf_dir):
        # ES _termvectors (re-analysis mode): tf re-analyzed from the
        # stored doc text + df from the index dictionary, one row per
        # distinct term of doc 7
        eng = _doc_engine(sf_dir)
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        txt_ = t.filter(pc.equal(t["doc_id"], 7))["text"][0].as_py()
        return eng.term_vectors(txt_, "text")

    # ---- pluggable similarities (S43-S45, Lucene Similarity) --------
    def _sim_query(sf_dir, q, sim):
        eng = _doc_engine(sf_dir)
        hits = eng.search(q, k=10, similarity=sim, with_metadata=False).hits
        return pd.DataFrame(
            {
                "doc_id": hits["doc_id"].to_numpy(),
                "score": round_half_up(hits["score"].to_numpy()),
            }
        )

    def s43_classic(sf_dir):
        # ClassicSimilarity (TF-IDF VSM): idf^2 * sqrt(tf) / sqrt(dl)
        q = Compound(must=(Term("text", "hash"), Term("text", "join")))
        return _sim_query(sf_dir, q, "classic")

    def s44_lm_dirichlet(sf_dir):
        # LMDirichletSimilarity (mu=2000): collection LM from the
        # dictionary's cf column; should-clause adds when matched
        q = Compound(must=(Term("text", "vector"),), should=(Term("text", "slow"),))
        return _sim_query(sf_dir, q, "lm_dirichlet")

    def s45_boolean(sf_dir):
        # BooleanSimilarity: flat 1.0 per matching scoring clause —
        # exercises heavy score ties through the doc_id tiebreak
        q = Compound(
            should=(Term("text", "spark"), Term("text", "window")), min_should_match=1
        )
        return _sim_query(sf_dir, q, "boolean")

    def e13_snapshot(sf_dir):
        # ES snapshot/restore + fsck maintenance round-trip on a
        # 10%-subset index (cost is proportional to index size; the
        # full-index path is the same code): build -> fsck clean ->
        # snapshot (per-file sha256 manifest, hashed in Ray tasks) ->
        # verify -> restore -> CORRUPT one byte of the restored copy's
        # stats.json -> fsck catches it -> restore a fresh copy ->
        # deep fsck (stream decode) passes -> the restored index serves
        # bit-identical BM25 results; oracle = BM25 SQL over the same
        # doc_id % 10 = 0 subset.
        import shutil
        import tempfile

        from search_engine_ray.config import DOCUMENTS_CONFIG
        from search_engine_ray.index.fsck import integrity_check
        from search_engine_ray.index.snapshot import (
            create_snapshot,
            restore_snapshot,
            verify_snapshot,
        )
        from search_engine_ray.query import SearchEngine

        idx = _e13_index_dir(sf_dir)
        assert integrity_check(idx, DOCUMENTS_CONFIG)["ok"]
        base = tempfile.mkdtemp(prefix="ser_snap_")
        try:
            create_snapshot(idx, base, "snap1")
            v = verify_snapshot(base, "snap1")
            assert v["ok"], v
            dest = os.path.join(base, "restored")
            restore_snapshot(base, "snap1", dest)
            # flip one byte in the restored stats.json (n_docs digit)
            sp = os.path.join(dest, "stats.json")
            raw = bytearray(open(sp, "rb").read())
            i = raw.index(b'"n_docs":') + len(b'"n_docs":')
            while not raw[i : i + 1].isdigit():
                i += 1
            raw[i] = ord("9") if raw[i : i + 1] != b"9" else ord("8")
            open(sp, "wb").write(bytes(raw))
            bad = integrity_check(dest, DOCUMENTS_CONFIG)
            assert not bad["ok"] and bad["errors"], bad
            dest2 = os.path.join(base, "restored2")
            restore_snapshot(base, "snap1", dest2)
            deep = integrity_check(dest2, DOCUMENTS_CONFIG, decode=True)
            assert deep["ok"], deep["errors"][:3]
            reng = SearchEngine(dest2, DOCUMENTS_CONFIG)
            hits = reng.search(
                Compound(must=(Term("text", "vector"),)), k=10, with_metadata=False
            ).hits
            return pd.DataFrame(
                {
                    "doc_id": hits["doc_id"].to_numpy(),
                    "score": round_half_up(hits["score"].to_numpy()),
                }
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def s52_rank_eval(sf_dir):
        # ES _rank_eval: P@10 / recall@10 / MRR / DCG / NDCG per
        # request against deterministic judgments (relevant = docs
        # with tf(term) >= 2, the same tokenization as the index)
        from search_engine_ray.pipelines.rank_eval import rank_eval

        # judgments derived Dataset-side (VERDICT r04 #2): only the
        # relevant id sets reach the driver, never the corpus text
        rel_ids = _term_match_ids(sf_dir, ("vector", "hash", "window"), min_tf=2)
        reqs = [
            (f"q_{term}", Compound(must=(Term("text", term),)), rel_ids[term])
            for term in ("vector", "hash", "window")
        ]
        eng = _doc_engine(sf_dir)
        return rank_eval(eng, reqs, k=10)

    def e12_ingest(sf_dir):
        # ES ingest pipeline: an ordered processor chain (copy,
        # uppercase, regex gsub, set, convert, rename, trim) compiled
        # into ONE vectorized map_batches pass
        from search_engine_ray.ops.ingest import ingest_pipeline

        docs = _read(sf_dir, "documents", ["doc_id", "text", "source", "lang", "n_chars"])
        out = ingest_pipeline(
            docs,
            [
                {"copy": {"field": "source", "target_field": "src_raw"}},
                {"uppercase": {"field": "src_raw"}},
                {"gsub": {"field": "text", "pattern": "[aeiou]", "replacement": ""}},
                {"trim": {"field": "text"}},
                {"set": {"field": "pipeline", "value": "v1"}},
                {"convert": {"field": "n_chars", "type": "double"}},
                {"rename": {"field": "lang", "target_field": "language"}},
            ],
        )
        return out.select_columns(
            ["doc_id", "text", "src_raw", "pipeline", "n_chars", "language"]
        )

    def s55_boosting(sf_dir):
        # ES `boosting` query: positive = BM25('vector'); docs also
        # containing 'slow' (the negative query's match set, broadcast
        # as a sorted id array) keep their match but score x 0.3 —
        # demotion without exclusion
        from search_engine_ray.query import NegativeBoost

        # negative id set derived Dataset-side (VERDICT r04 #2): only
        # the match-set-sized id array reaches the driver
        neg_ids = _term_match_ids(sf_dir, ("slow",), min_tf=1)["slow"]
        q = Compound(must=(Term("text", "vector"),))
        return _bm25_query(sf_dir, q, boosts=(NegativeBoost(neg_ids, 0.3),))

    def s54_unordered_near(sf_dir):
        # ES span_near in_order=false: |pos('scan') - pos('hash')| in
        # [1, 3] — both directions of the s12 ordered pair; ptf counts
        # position pairs, one BM25 clause
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        return phrase_topk(eng, "text", ["hash", "scan"], window=3, ordered=False, k=10)

    def s59_span_first(sf_dir):
        # ES/Lucene span_first: 'vector' within the first 30 analyzed
        # tokens (0-based position < 30); tf counts qualifying
        # occurrences, df = docs with any, one BM25 clause
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        return phrase_topk(eng, "text", ["vector"], first_end=30, k=10)

    def s67_span_or(sf_dir):
        # ES span_near over a span_or first slot: ('merge'|'sort')
        # followed by 'key' within 1-2 positions; the OR slot's merged
        # occurrence keys stay unique (one position holds one token),
        # so ptf counts position PAIRS exactly like s12; one BM25
        # clause, df = docs with any pair
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        return phrase_topk(
            eng, "text", ["key"], window=2, or_first=["merge", "sort"], k=10
        )

    def s68_span_not(sf_dir):
        # ES span_not: occurrences of 'scan' survive only when no
        # 'slow'/'fast' occurrence lies within +-2 positions in the
        # same doc (pre/post exclusion window); ptf counts surviving
        # occurrences, df = docs with any, one BM25 clause
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        return phrase_topk(
            eng, "text", ["scan"], exclude=["slow", "fast"], exclude_dist=2, k=10
        )

    def s69_span_containing(sf_dir):
        # ES span_containing: big = ordered pair 'sort'..'order' with
        # gap 1-5, little = 'column'; matches big spans holding a
        # little occurrence t1.pos <= p <= t2.pos; ptf counts
        # qualifying SPANS, df = docs with any, one BM25 clause
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        return phrase_topk(
            eng, "text", ["sort", "order"], window=5, little="column",
            span_mode="containing", k=10,
        )

    def s70_span_within(sf_dir):
        # ES span_within: the inverse — matches little ('column')
        # occurrences lying inside any big span; ptf counts qualifying
        # little OCCURRENCES (deduped across overlapping spans), dl
        # from the little term's field length
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        return phrase_topk(
            eng, "text", ["sort", "order"], window=5, little="column",
            span_mode="within", k=10,
        )

    def s53_phrase_prefix(sf_dir):
        # ES match_phrase_prefix / Lucene MultiPhraseQuery: "hash s*"
        # — the final slot expands against the term dictionary (6
        # expansions at this sf) and ANY expansion completes the
        # phrase; tf counts completed occurrences, one BM25 clause
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        # oracle-parity precondition: the DuckDB oracle expands EVERY
        # token LIKE 's%', while match_phrase_prefix truncates to the
        # lexicographically-first max_expansions (50) — fail loudly if
        # a larger corpus ever pushes the dictionary past the cap
        # instead of silently hash-mismatching
        from search_engine_ray.query.qast import Prefix as _Pfx

        n_exp = len(eng._expand_prefix(_Pfx("text", "s")))
        assert n_exp < 50, (
            f"s53 oracle assumes expansions < cap; dictionary has {n_exp} 's*' terms"
        )
        return phrase_topk(eng, "text", "hash", last_prefix="s", k=10)

    def s51_best_fields(sf_dir):
        # ES multi_match best_fields (Lucene DisMax of per-field
        # TermQuery): per-field df/idf AND length norms — contrast
        # with s15's blended-df cross_fields over the same fields
        from search_engine_ray.query import BestFields

        out = []
        for branch, tok in (("text_term", "vector"), ("source_term", "src1")):
            q = Compound(must=(BestFields(("text", "source"), tok, tie_breaker=0.3),))
            df = _bm25_query(sf_dir, q)
            df.insert(0, "branch", branch)
            out.append(df)
        return pd.concat(out, ignore_index=True)

    def s50_dfr(sf_dir):
        # DFRSimilarity I(n)-L-H2: divergence-from-randomness with the
        # inverse-df basic model, Laplace after-effect, H2 length
        # normalization — the 5th pluggable similarity
        q = Compound(must=(Term("text", "hash"), Term("text", "join")))
        return _sim_query(sf_dir, q, "dfr")

    def s46_percolate(sf_dir):
        # ES percolator (reverse search): the corpus streams once
        # through a broadcast registry of 6 stored queries covering
        # must-AND, should-OR+msm, mustNot, prefix and synonym leaves
        from search_engine_ray.query.percolate import percolate

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return percolate(docs, _percolate_registry())

    def r34_histogram(sf_dir):
        # ES histogram aggregation: fixed 500-wide price buckets with
        # count + exact (order-independent) min/max sub-aggregations
        li = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])
        return rel.histogram_aggregate(
            li,
            "l_extendedprice",
            500.0,
            aggs={
                "n": ("count", "l_extendedprice"),
                "min_q": ("min", "l_quantity"),
                "max_q": ("max", "l_quantity"),
            },
        )

    def t_dup_ngrams(sf_dir):
        # repeated-substring exposure (Lee et al. 2022 at 8-gram
        # granularity) over the planted near-dup corpus: every
        # original/copy pair shares all the original's 8-grams
        return dd.dup_ngram_stats(_docs_with_near_dups(sf_dir), n=8)

    def t_quality_clf(sf_dir):
        # learned quality filter (the model-scoring stage of a
        # training-data pipeline): deterministic logistic regression
        # fit driver-side on (n_chars, token count) -> P(lang == en),
        # then vectorized batch inference over the corpus; the oracle
        # retrains bit-identically and replays the sigmoid in SQL
        from search_engine_ray.ops.classify import (
            fit_quality_classifier,
            score_classifier,
        )
        from search_engine_ray.ops.text import _flat_tokens

        docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])

        def _feats(t: pa.Table) -> pa.Table:
            flat, parents, n = _flat_tokens(t["text"])
            ntok = np.bincount(parents, minlength=n).astype(np.float64)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_chars": pc.cast(t["n_chars"], pa.float64()),
                    "n_tok": pa.array(ntok),
                    "is_en": pc.cast(pc.equal(t["lang"], "en"), pa.float64()),
                }
            )

        feats = docs.map_batches(_feats, batch_format="pyarrow")
        # value-oracle precondition: the fit's limit(50k) sample is only
        # deterministic (= the whole corpus) while the corpus fits in it;
        # fail loudly at a larger sf instead of silently hash-mismatching
        n_docs = docs.count()
        assert n_docs <= 50_000, (
            f"t_quality_clf oracle requires corpus <= sample_size (50k); got {n_docs}"
        )
        model = fit_quality_classifier(
            feats, ["n_chars", "n_tok"], "is_en", sort_col="doc_id"
        )
        out = score_classifier(feats, model)
        return out.select_columns(["doc_id", "clf_score"])

    def t_strip_dup_ngrams(sf_dir):
        # repeated-substring REMOVAL (Lee et al. 2022): tokens covered
        # by a corpus-repeated 8-gram drop everywhere EXCEPT the
        # owner (lowest-id) document — over the planted near-dup
        # corpus the originals stay intact and the copies collapse to
        # their unique tails
        return dd.strip_dup_ngrams(_docs_with_near_dups(sf_dir), n=8)

    def _percolate_registry():
        from search_engine_ray.query import Synonyms

        return {
            "q_vector": Compound(must=(Term("text", "vector"),)),
            "q_hash_join": Compound(must=(Term("text", "hash"), Term("text", "join"))),
            "q_spark_or_window": Compound(
                should=(Term("text", "spark"), Term("text", "window")),
                min_should_match=1,
            ),
            "q_vector_not_slow": Compound(
                must=(Term("text", "vector"),), must_not=(Term("text", "slow"),)
            ),
            "q_cust_prefix": Compound(must=(Prefix("text", "cust"),)),
            "q_syn": Compound(should=(Synonyms("text", ("vector", "matrix")),)),
        }

    def s49_stemmed(sf_dir):
        # S49 pluggable analyzer with stemming: the `code_stem`
        # analyzer (Harman S-stemmer) folds plurals at index AND query
        # time, so the raw keyword "vectors" retrieves documents that
        # only say "vector" (and vice versa) over the plural corpus —
        # impossible without the stem fold. Full BM25 on the stemmed
        # term statistics.
        from search_engine_ray.analysis import get_analyzer

        eng = _stem_engine(sf_dir)
        tok = get_analyzer("code_stem").analyze("vectors")[0]  # -> "vector"
        hits = eng.search(
            Compound(must=(Term("text", tok),)), k=10, with_metadata=False
        ).hits
        return pd.DataFrame(
            {
                "doc_id": hits["doc_id"].to_numpy(),
                "score": round_half_up(hits["score"].to_numpy()),
            }
        )

    def s47_filters(sf_dir):
        # ES `filters` aggregation: per-named-filter doc counts (plus
        # the _other_ bucket) from one map-side-combined stream pass
        from search_engine_ray.query.percolate import filters_agg

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return filters_agg(docs, _percolate_registry(), other_bucket=True)

    def s48_adjacency(sf_dir):
        # ES `adjacency_matrix`: filter AND pairwise-intersection doc
        # counts — one boolean M.T @ M per batch, counts combine
        from search_engine_ray.query.percolate import adjacency_matrix

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return adjacency_matrix(docs, _percolate_registry())

    def r31_matrix_stats(sf_dir):
        # ES matrix_stats: covariance/correlation of quantity vs
        # discount from one streaming raw-moment pass
        li = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])
        return sk.matrix_stats(li, "l_quantity", "l_discount")

    def sketch_cm(sf_dir):
        # count-min frequency estimates for user_ids 0..9 (min over
        # depth rows of md5-hashed cells; exact SQL reproduction)
        ev = _read(sf_dir, "events", ["user_id"])
        sk_cm = sk.cm_sketch(ev, "user_id", depth=4, width=1024)
        qs_ = [str(u) for u in range(10)]
        return pd.DataFrame(
            {
                "user_id": np.arange(10, dtype=np.int64),
                "est": sk_cm.estimate(qs_).astype(np.int64),
            }
        )

    def t_hash_sample(sf_dir):
        # deterministic hash sample (rate 0.25): reproducible,
        # coordination-free, whole-key keep/drop — the scale-safe
        # sampling primitive
        docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        return sk.hash_sample(docs, "doc_id", 0.25)

    def t_strat_sample(sf_dir):
        # stratified rebalancing: keep all 'en', half 'de', a quarter
        # of everything else — rate thresholds are exact powers of two
        # so the SQL constants match bit-for-bit
        docs = _read(sf_dir, "documents", ["doc_id", "lang"])
        return sk.stratified_hash_sample(
            docs, "doc_id", {"en": 1.0, "de": 0.5}, "lang", default_rate=0.25
        )

    def t_mix_budget(sf_dir):
        # data mixing to a per-source token budget: rates derived from
        # one aggregate pass (min(1, budget/total)), drawn with the
        # deterministic stratified hash sampler; unbudgeted sources drop
        docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
        out = sk.mix_to_budget(
            docs, {"src0": 500, "src1": 300, "src2": 10_000_000}
        )
        return out.select_columns(["doc_id", "source"])

    def t_chunk(sf_dir):
        # RAG / context-window chunking: 40-token windows every 20
        # tokens, vectorized fan-out (one take + one binary_join per
        # batch)
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.chunk_documents(
            docs, chunk_tokens=40, stride=20, keep=["doc_id"]
        )

    def t_normalize(sf_dir):
        # unicode normalization over a deterministically accented copy
        # of the corpus (the testdata is ASCII, so accents are
        # synthesized identically on both sides: a->á, e->è, tab runs)
        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def _accent(t: pa.Table) -> pa.Table:
            s = pc.replace_substring(t["text"], "a", "á")
            s = pc.replace_substring(s, "e", "è")
            s = pc.replace_substring(s, " t", "\tt")
            return pa.table({"doc_id": t["doc_id"], "text": s})

        return txt.normalize_text(
            docs.map_batches(_accent, batch_format="pyarrow")
        ).select_columns(["doc_id", "norm"])

    def t_keywords(sf_dir):
        # per-doc tf-idf keyword extraction: top-3 tokens by
        # tf*ln(N/df), ties by token asc; df map is a
        # vocabulary-bounded combiner broadcast once
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.tfidf_keywords(docs, "text", "doc_id", top_n=3)

    def t_collocations(sf_dir):
        # PMI collocation extraction: ordered token pairs within a
        # 2-position window, PMI over the pair distribution, top-20;
        # the exchange carries (pair, count) combiner rows only
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.collocations(docs, "text", window=2, min_count=5, top_k=20)

    def t_top_terms(sf_dir):
        # heavy hitters by composition: explode -> count -> bounded
        # top-k (no full sort)
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        toks = txt.explode_tokens(docs, "text", ["doc_id"]).select_columns(["token"])
        counts = rel.value_counts(toks, "token", alias="cnt")
        return rel.topk(counts, ["cnt", "token"], 20, descending=[True, False])

    def s32_rescore(sf_dir):
        # ES rescore window (score_mode total): top-50 'vector' hits
        # re-ranked by primary + 2x BM25('join'); secondary never
        # touches docs outside the window
        from search_engine_ray.pipelines import rescore_search

        eng = _doc_engine(sf_dir)
        out = rescore_search(
            eng,
            Compound(must=(Term("text", "vector"),)),
            Compound(must=(Term("text", "join"),)),
            window=50, k=10, query_weight=1.0, rescore_weight=2.0,
        )
        out["score"] = round_half_up(out["score"].to_numpy())
        return out

    def s31_significant_terms(sf_dir):
        # ES significant_terms: terms over-represented in the 'vector'
        # matched set vs the corpus, JLH-scored; partial-count
        # combiner, distributed score + bounded top-k
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.significant_terms(docs, "vector", k=10, min_doc_count=2)

    def pipe_curation(sf_dir):
        # the flagship training-data composition: lang-ID -> quality
        # -> filter -> exact dedup, one streaming lineage; input is
        # the corpus plus an exact-duplicate copy so the dedup stage
        # provably halves the duplicated mass
        from search_engine_ray.pipelines import curate

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def _dup(t: pa.Table) -> pa.Table:
            return pa.table(
                {"doc_id": pc.add(t["doc_id"], 2000000), "text": t["text"]}
            )

        both = docs.union(docs.map_batches(_dup, batch_format="pyarrow"))
        return curate(both)

    # ---- text analysis ---------------------------------------------
    def t_pack_sequences(sf_dir):
        # LLM sample packing (T5/GPT dataloader "packing"): greedy
        # token-budget sequence assembly — deterministic md5 id
        # sharding, per-shard boundary scan looping over PACKS; the
        # oracle replays the greedy walk as a recursive CTE
        from search_engine_ray.ops.pack import pack_sequences

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        stats = txt.add_token_stats(docs, "text").select_columns(["doc_id", "n_tokens"])
        out = pack_sequences(stats, budget=200, num_shards=8).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)[
            ["doc_id", "n_tokens", "pack_id", "pack_seq"]
        ]

    def t_shuffle_export(sf_dir):
        # deterministic epoch shuffle for training export: rows take
        # the fixed pseudorandom order (md5 % shards, md5, key) with
        # no global sort-exchange — reproducible at any parallelism
        from search_engine_ray.ops.pack import deterministic_shuffle

        docs = _read(sf_dir, "documents", ["doc_id"])
        out = deterministic_shuffle(docs, "doc_id", num_shards=32).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)[["doc_id", "shuffle_rank"]]

    def e9_json_roundtrip(sf_dir):
        # E9 JSON source/sink: export documents as JSONL shards
        # (ray.data.write_json), read back with read_json, aggregate —
        # the values must equal the parquet view's aggregate. Cache
        # keyed on source mtime+size like the CSV dump.
        import glob as _g

        import ray.data as rd

        src = os.path.join(sf_dir, "documents.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        jdir = f"/tmp/ser_json_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        if not os.path.exists(os.path.join(jdir, "_DONE")):
            import shutil

            shutil.rmtree(jdir, ignore_errors=True)
            _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).write_json(jdir)
            open(os.path.join(jdir, "_DONE"), "w").write("ok")
        ds = rd.read_json(sorted(_g.glob(os.path.join(jdir, "*.json"))))
        out = rel.grouped_aggregate(
            ds, "lang", {"cnt": ("count", "doc_id"), "sum_chars": ("sum", "n_chars")}
        ).to_pandas()
        out["cnt"] = out["cnt"].astype("int64")
        out["sum_chars"] = out["sum_chars"].astype("int64")
        return out

    def t_token_stats(sf_dir):
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.add_token_stats(docs, "text").drop_columns(["text"])

    def t_quality(sf_dir):
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.add_quality_score(docs, "text").drop_columns(["text"])

    def t_lang_id(sf_dir):
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.add_lang_id(docs, "text").drop_columns(["text"])

    def t_rolling_fp(sf_dir):
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.add_rolling_fingerprint(docs, "text").drop_columns(["text"])

    def t_bpe_tokens(sf_dir):
        # token counting for LLM budgeting (task brief: "whitespace +
        # a BPE-ish regex"): both counts are single RE2 kernels whose
        # semantics are identical in Arrow and DuckDB
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.add_bpe_token_stats(docs, "text").drop_columns(["text"])

    def t_fertility(sf_dir):
        # tokenizer fertility (BPE segments per whitespace word) per
        # language — the tokenizer-efficiency metric multilingual
        # pipelines track; both counts are single RE2 kernels, the
        # per-lang fold is a 2-sum combiner
        docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        stats = txt.add_bpe_token_stats(docs, "text").drop_columns(["text"])
        agg = (
            rel.grouped_aggregate(
                stats, ["lang"],
                {"n_ws": ("sum", "n_ws_tokens"), "n_bpe": ("sum", "n_bpe_tokens")},
            )
            .to_pandas().sort_values("lang", kind="mergesort").reset_index(drop=True)
        )
        agg["n_ws"] = agg["n_ws"].astype("int64")
        agg["n_bpe"] = agg["n_bpe"].astype("int64")
        agg["fertility"] = round_half_up(
            agg["n_bpe"].to_numpy(np.float64) / agg["n_ws"].to_numpy(np.float64)
        )
        return agg[["lang", "n_ws", "n_bpe", "fertility"]]

    def t_unigram_lp(sf_dir):
        # CCNet-style unigram-LM scoring: vocab-bounded model build +
        # broadcast scoring pass
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.unigram_logprob(docs, "text").drop_columns(["text"])

    def t_bigram_lm(sf_dir):
        # interpolated bigram-LM scoring (one order up from
        # t_unigram_lp, the CCNet perplexity-proxy family): two
        # combiner-shaped count shuffles build the model, the count
        # maps broadcast once, scoring is factorize + get_indexer
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.bigram_logprob(docs, "text").drop_columns(["text"])

    def t_dsir(sf_dir):
        # DSIR data selection (Xie et al. 2023): hashed-unigram bucket
        # LMs for the target domain (lang='en') vs the raw corpus,
        # per-doc log importance weight, deterministic top-100 keep
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        target = _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
            lambda t: t.filter(pc.equal(t["lang"], "en")).select(["doc_id", "text"]),
            batch_format="pyarrow",
        )
        return txt.dsir_select(docs, target, top_n=100)

    def pipe_corpus_report(sf_dir):
        # corpus card: per-lang doc counts, token totals, mean
        # quality, exact-dup profile — one combiner-shaped stats pass
        # plus the dedup digest shuffle, driver-sized output
        from search_engine_ray.pipelines.corpus_report import corpus_report

        docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        return corpus_report(docs)

    def t_decontaminate(sf_dir):
        # GPT-3-style benchmark decontamination: eval set = every
        # 97th doc; flag corpus docs sharing any 3-token shingle
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return dd.contamination_flags(docs, _eval_set(sf_dir), w=3)

    def t_pii_clean(sf_dir):
        # PII redaction stage over a corpus with deterministically
        # planted contacts (docs with doc_id % 7 == 0 get an email, a
        # URL and an IP appended; the corpus itself has none)
        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def _plant(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            suffix = pa.array(
                np.where(
                    ids % 7 == 0,
                    " contact bob@example.com via https://ex.com/a?b=1 at 10.0.0.1",
                    "",
                ).tolist(),
                pa.string(),
            )
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    # fill_null BEFORE the append so a null text still
                    # receives its planted suffix, like the SQL's
                    # coalesce(text,'') || suffix
                    "text": pc.binary_join_element_wise(
                        pc.fill_null(t["text"], ""), suffix, ""
                    ),
                }
            )

        return txt.add_pii_clean(
            docs.map_batches(_plant, batch_format="pyarrow")
        ).drop_columns(["text"])

    def t_repetition(sf_dir):
        # Gopher-style repetition signals: duplicate-line fraction +
        # top-bigram token coverage
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.add_repetition_scores(docs, "text").drop_columns(["text"])

    def t_line_dedup(sf_dir):
        # CCNet/C4-style line-level dedup over a corpus with
        # deterministically planted boilerplate (a footer line on
        # doc_id%3 docs, a newsletter line on doc_id%5); any naturally
        # repeated corpus line (count >= 2) is removed too
        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def _plant(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            f1 = pa.array(
                np.where(ids % 3 == 0, "\n=== footer: shared boilerplate v1 ===", "").tolist(),
                pa.string(),
            )
            f2 = pa.array(
                np.where(ids % 5 == 0, "\nsubscribe to our newsletter", "").tolist(),
                pa.string(),
            )
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "text": pc.binary_join_element_wise(
                        pc.fill_null(t["text"], ""), f1, f2, ""
                    ),
                }
            )

        return dd.line_dedup(docs.map_batches(_plant, batch_format="pyarrow"))

    def s15_crossfields(sf_dir):
        # S15 cross-field blended term (Lucene BlendedTermQuery +
        # DisMax, ES multi_match cross_fields): blended df across
        # text+source, per-field length norms, best + 0.3*(rest).
        # Two branches exercise a text-resident and a source-resident
        # token through the same blend.
        from search_engine_ray.query import CrossFields

        out = []
        for branch, tok in (("text_term", "vector"), ("source_term", "src1")):
            q = Compound(must=(CrossFields(("text", "source"), tok, tie_breaker=0.3),))
            df = _bm25_query(sf_dir, q)
            df.insert(0, "branch", branch)
            out.append(df)
        return pd.concat(out, ignore_index=True)

    def s16_stats_facet(sf_dir):
        # S16 metric aggregation on the matched set (ES stats
        # aggregation): numeric docmap stats ride the same single
        # scoring pass as the facet counts — matching never repeats
        eng = _doc_engine(sf_dir)
        r = eng.search(
            Compound(must=(Term("text", "vector"),)),
            k=1,
            with_metadata=False,
            stat_fields=("n_chars",),
        )
        s = r.stats["n_chars"]
        return pd.DataFrame(
            {
                "total": [int(r.total)],
                "sum_chars": [int(s["sum"])],
                "min_chars": [int(s["min"])],
                "max_chars": [int(s["max"])],
                "avg_chars": [float(round_half_up(np.array([s["avg"]]))[0])],
            }
        )

    def s17_suggest(sf_dir):
        # S17 'did you mean' (Lucene DirectSpellChecker): dictionary
        # terms within 2 edits of the misspelling, ranked by
        # (distance, df desc, term)
        eng = _doc_engine(sf_dir)
        rows = eng.suggest("text", "vectr", max_edits=2, k=5)
        out = pd.DataFrame(rows, columns=["term", "df", "distance"])
        out["df"] = out["df"].astype("int64")
        out["distance"] = out["distance"].astype("int64")
        return out

    def s34_phrase_suggest(sf_dir):
        # S34 ES phrase suggester: whole-query did-you-mean for
        # 'vectr jion' — per-token top-3 candidates, cross-product
        # phrases ranked by unigram-LM logprob (tiebreak: fewer edits,
        # then phrase)
        eng = _doc_engine(sf_dir)
        rows = eng.suggest_phrase("text", "vectr jion", max_edits=2, per_token_k=3, k=3)
        out = pd.DataFrame(rows, columns=["phrase", "logprob", "edits"])
        out["logprob"] = round_half_up(out["logprob"].to_numpy())
        out["edits"] = out["edits"].astype("int64")
        return out

    def s18_mlt(sf_dir):
        # S18 More-Like-This (Lucene MoreLikeThis): seed = doc 0's
        # text; top-5 tf*idf terms -> should-OR; per-term idfs,
        # contributions sum; ranked on the rounded score like
        # s2_range_scan (absorbs SQL SUM float order)
        eng = _doc_engine(sf_dir)
        seed = (
            pq.read_table(
                os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
            )
            .filter(pc.equal(pc.field("doc_id"), 0))["text"][0]
            .as_py()
        )
        q = eng.mlt_query(seed, "text", max_terms=5)
        df = eng.search_all(q).to_pandas()
        df["score"] = round_half_up(df["score"].to_numpy())
        df = df.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
        return df.head(10)[["doc_id", "score"]].reset_index(drop=True)

    def s19_must_not(sf_dir):
        # S19 compound.mustNot (Lucene MUST_NOT): matches 'vector'
        # docs, excludes any that also contain 'slow'; scores are the
        # plain single-term BM25 (the negative clause never scores)
        q = Compound(must=(Term("text", "vector"),), must_not=(Term("text", "slow"),))
        return _bm25_query(sf_dir, q)

    def s20_filter_clause(sf_dir):
        # S20 compound.filter (Lucene FILTER): 'join' is required but
        # contributes NO score — ranking is by the 'vector' clause only
        q = Compound(must=(Term("text", "vector"),), filter=(Term("text", "join"),))
        return _bm25_query(sf_dir, q)

    def s21_boost(sf_dir):
        # S21 per-clause boost (Lucene BoostQuery): the 'vector'
        # clause's BM25 is doubled, 'join' unchanged; boost folds into
        # the resolved idf so WAND bounds stay valid
        q = Compound(must=(Term("text", "vector", boost=2.0), Term("text", "join")))
        return _bm25_query(sf_dir, q)

    def s22_pattern(sf_dir):
        # S22 Wildcard + Regexp dictionary expansion (Lucene
        # Wildcard/RegexpQuery): both branches are multi-term rewrites
        # — each expanded token scores with its OWN idf, contributions
        # sum — ranked on the rounded score like the s2 range scan.
        # Served from the actor scatter-gather path with k+slack: the
        # page orders by the ROUNDED score, so a top-K (exact-score)
        # retrieval proves the page exact whenever the smallest rounded
        # retrieved score is strictly below the page's 10th rounded
        # score (any unseen doc's exact score <= the K-th retrieved
        # exact score, and round_half_up is monotone). Only a rounded
        # tie spilling past the retrieved window forces the full-scan
        # Dataset job — at 100x corpus that keeps this a millisecond
        # RPC instead of a per-query batch job.
        from search_engine_ray.query import Regexp, Wildcard

        eng = _doc_engine(sf_dir)
        k, slack = 10, 40
        out = []
        for branch, leaf in (
            ("wildcard", Wildcard("text", "s*")),
            ("regexp", Regexp("text", "hash|scan")),
        ):
            q = Compound(must=(leaf,))
            res = eng.search(q, k=k + slack, with_metadata=False)
            df = pd.DataFrame(
                {
                    "doc_id": res.hits["doc_id"].to_numpy().astype(np.int64),
                    "score": round_half_up(res.hits["score"].to_numpy()),
                }
            )
            df = df.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
            page = df.head(k)
            if (
                res.total > len(df)
                and len(page) == k
                and df["score"].min() >= page["score"].iloc[-1]
            ):
                # rounded k-th score ties across the retrieval boundary:
                # only the full match set can order the page exactly
                df = eng.search_all(q).to_pandas()
                df["score"] = round_half_up(df["score"].to_numpy())
                df = df.sort_values(
                    ["score", "doc_id"], ascending=[False, True], kind="mergesort"
                )
                page = df.head(k)
            page = page[["doc_id", "score"]].reset_index(drop=True)
            page.insert(0, "branch", branch)
            out.append(page)
        return pd.concat(out, ignore_index=True)

    def s23_range_facet(sf_dir):
        # S23 range-facet aggregation (ES range agg): banded n_chars
        # counts over the FULL matched set of a term query, riding the
        # same scoring pass as the value facets
        eng = _doc_engine(sf_dir)
        r = eng.search(
            Compound(must=(Term("text", "vector"),)),
            k=1,
            with_metadata=False,
            range_facets={"n_chars": (0, 150, 300, 5000)},
        )
        bands = sorted(r.facets.get("n_chars", {}).items())
        return pd.DataFrame(
            {
                "band": [b for b, _ in bands],
                "cnt": np.array([c for _, c in bands], dtype=np.int64),
            }
        )

    def s24_sort_by_field(sf_dir):
        # S24 sort by stored field (ES `sort`): the page is ordered by
        # the numeric docmap attribute (desc, doc_id tiebreak) while
        # BM25 scores are still computed and reported
        eng = _doc_engine(sf_dir)
        r = eng.search(
            Compound(must=(Term("text", "vector"),)),
            k=10,
            with_metadata=False,
            sort_by=("n_chars", True),
        )
        out = r.hits[["doc_id", "score", "sort_key"]].copy()
        out["score"] = round_half_up(out["score"].to_numpy())
        return out.reset_index(drop=True)

    def s56_collapse(sf_dir):
        # ES field collapsing: one hit per distinct `lang` — each
        # group's best-scoring doc — ranked like ordinary hits. Exact
        # over the full matched set: every bucket ships its per-group
        # argmax (payload bounded by field cardinality), the driver
        # keeps the global max per group.
        eng = _doc_engine(sf_dir)
        r = eng.search(
            Compound(must=(Term("text", "vector"),)),
            k=5,
            collapse="lang",
        )
        out = r.hits[["doc_id", "lang", "score"]].copy()
        out["score"] = round_half_up(out["score"].to_numpy())
        return out.reset_index(drop=True)

    def s57_pinned(sf_dir):
        # ES `pinned` query: ids (7, 999999, 3) promote to the top in
        # that order — 999999 doesn't exist and must drop out — and
        # organic BM25 hits (pinned ids excluded) fill the page
        eng = _doc_engine(sf_dir)
        return eng.pinned_search(
            Compound(must=(Term("text", "vector"),)), pinned=(7, 999999, 3), k=10
        )

    def s25_range_filter(sf_dir):
        # S25 Atlas $search `range` operator inside compound.filter:
        # required non-scoring numeric predicate, lowered onto the
        # docmap (one vectorized compare per bucket, no postings scan)
        from search_engine_ray.query import NumericRange

        q = Compound(
            must=(Term("text", "vector"),),
            filter=(NumericRange("n_chars", 150, 300),),
        )
        return _bm25_query(sf_dir, q)

    def s26_match_all_browse(sf_dir):
        # S26 ES match_all browse/listing: no keyword — every live doc
        # filtered to lang='en', page ordered by n_chars desc with the
        # exact total (the reference's no-keyword product listing shape)
        from search_engine_ray.query import FilterSpec, MatchAll

        eng = _doc_engine(sf_dir)
        r = eng.search(
            MatchAll(), k=10, with_metadata=False,
            filter_spec=FilterSpec((("lang", "==", "en"),)),
            sort_by=("n_chars", True),
        )
        out = r.hits[["doc_id", "sort_key"]].copy()
        out.insert(0, "total", np.int64(r.total))
        return out.reset_index(drop=True)

    def s27_query_string(sf_dir):
        # S27 Lucene-classic query_string: one string exercising AND,
        # per-clause boost, negation and a numeric range — parsed into
        # the same Compound a hand-built query would be
        from search_engine_ray.query.qparser import parse_query_string

        q = parse_query_string(
            "vector AND join^2 -slow n_chars:[150 TO 300]", default_field="text"
        )
        return _bm25_query(sf_dir, q)

    def s28_field_value_boost(sf_dir):
        # S28 ES function_score field_value_factor: relevance is
        # MULTIPLIED by log1p(0.01 * n_chars) — longer docs promoted
        from search_engine_ray.query import FieldValueBoost

        q = Compound(must=(Term("text", "vector"),))
        return _bm25_query(
            sf_dir, q, boosts=(FieldValueBoost("n_chars", factor=0.01, modifier="log1p"),)
        )

    def s58_rank_feature(sf_dir):
        # ES rank_feature (saturation): score += 1.5 * v/(v + 200)
        # over n_chars — the static-document-feature relevance fold
        # (what you'd do with a pagerank column at web scale)
        from search_engine_ray.query import RankFeatureBoost

        q = Compound(must=(Term("text", "vector"),))
        return _bm25_query(
            sf_dir, q, boosts=(RankFeatureBoost("n_chars", pivot=200.0, boost=1.5),)
        )

    def s30_decay(sf_dir):
        # S30 ES function_score decay: relevance multiplied by a gauss
        # (resp. linear) decay of |n_chars - 200| with offset 25 and
        # scale 150 — 1.0 inside the offset, 0.5 at distance 175
        from search_engine_ray.query import DecayBoost

        q = Compound(must=(Term("text", "vector"),))
        out = []
        for fn in ("gauss", "linear"):
            part = _bm25_query(
                sf_dir, q,
                boosts=(DecayBoost("n_chars", origin=200, scale=150, offset=25,
                                   decay=0.5, fn=fn),),
            )
            part.insert(0, "branch", fn)
            out.append(part)
        return pd.concat(out, ignore_index=True)

    def s33_cardinality(sf_dir):
        # ES cardinality aggregation: EXACT distinct counts of two
        # docmap attrs over the full matched set plus the match total
        eng = _doc_engine(sf_dir)
        q = Compound(must=(Term("text", "vector"),))
        card = eng.cardinality(q, ("source", "lang"))
        total = eng.search(q, k=1, with_metadata=False).total
        return pd.DataFrame(
            {"total": [np.int64(total)],
             "source_card": [np.int64(card["source"])],
             "lang_card": [np.int64(card["lang"])]}
        )

    def e11_sorted_export(sf_dir):
        # globally-sorted export (ORDER BY) via sample -> range
        # partition -> per-range local sort (no Ray sort shuffle);
        # the global rank column makes the ordering value-hashable
        import ray.data as rd

        from search_engine_ray.ops import sinks as snk

        li = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_linenumber", "l_extendedprice"])
        tag = sf_dir.strip("/").replace("/", "_")
        out_dir = f"/tmp/ser_sorted_export/{tag}"
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        snk.sorted_export(
            li, ["l_extendedprice", "l_orderkey", "l_linenumber"], out_dir,
            num_ranges=8,
        )
        back = rd.read_parquet(out_dir)
        return back.select_columns(
            ["rank", "l_orderkey", "l_linenumber", "l_extendedprice"]
        )

    def e10_delete_by_query(sf_dir):
        # E10 ES delete_by_query: on a scratch copy of the cached
        # index, tombstone every doc containing 'slow', then query
        # 'vector' — deleted docs are gone from hits AND totals, while
        # scores still use the ORIGINAL corpus stats (tombstones do
        # not rewrite df/avgdl until compaction), which is exactly the
        # mustNot-with-global-df SQL shape.
        import shutil

        from search_engine_ray.config import DOCUMENTS_CONFIG
        from search_engine_ray.query import SearchEngine

        base_eng = _doc_engine(sf_dir)  # materializes the cached index
        src = base_eng.index_dir
        st = os.stat(os.path.join(src, "stats.json"))
        scratch = f"{src}_delq_{int(st.st_mtime)}_{st.st_size}"
        if not os.path.exists(os.path.join(scratch, "_DELETED")):
            shutil.rmtree(scratch, ignore_errors=True)
            shutil.copytree(src, scratch)
            eng0 = SearchEngine(scratch, DOCUMENTS_CONFIG)
            n = eng0.delete_by_query(Compound(must=(Term("text", "slow"),)))
            assert n > 0
            open(os.path.join(scratch, "_DELETED"), "w").write("ok")
        eng = SearchEngine(scratch, DOCUMENTS_CONFIG)
        res = eng.search(Compound(must=(Term("text", "vector"),)), k=10, with_metadata=False)
        out = res.hits[["doc_id", "score"]].copy()
        out["score"] = round_half_up(out["score"].to_numpy())
        out.insert(0, "total", np.int64(res.total))
        return out.reset_index(drop=True)

    def s29_percentiles(sf_dir):
        # S29 percentiles aggregation over the matched set — EXACT
        # (per-bucket value histograms merged with the quantile_disc
        # rule), not ES's approximate t-digest
        eng = _doc_engine(sf_dir)
        r = eng.search(
            Compound(must=(Term("text", "vector"),)),
            k=1, with_metadata=False,
            quantile_fields={"n_chars": (0.25, 0.5, 0.75)},
        )
        qd = r.quantiles["n_chars"]
        return pd.DataFrame(
            {"q": [0.25, 0.5, 0.75], "value": [qd[0.25], qd[0.5], qd[0.75]]}
        )

    def s14_snippet(sf_dir):
        # keyword-in-context highlighter (Lucene highlighter analog):
        # first occurrence position + a +/-2-token window
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.extract_snippets(docs, "vector", context=2)

    def s36_federated(sf_dir):
        # S36 federated DFS search: two half-corpus indexes (doc_id
        # parity), global-stats scoring — scores provably equal the
        # single-index BM25, so the oracle is the plain corpus SQL
        import ray.data as rd

        from search_engine_ray.config import DOCUMENTS_CONFIG
        from search_engine_ray.index import build_index
        from search_engine_ray.query import FederatedEngine, SearchEngine

        tag = sf_dir.strip("/").replace("/", "_")
        members = {}
        for name, rem in (("even", 0), ("odd", 1)):
            d = f"/tmp/ser_idx_cache/{tag}/fed_{name}_v1"
            if not os.path.exists(os.path.join(d, "manifest.json")):
                docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
                half = docs.map_batches(
                    lambda t, r=rem: t.filter(
                        pc.equal(pc.bit_wise_and(t["doc_id"], 1), r)
                    ),
                    batch_format="pyarrow",
                )
                build_index(half, d, DOCUMENTS_CONFIG, sha_col="text")
            members[name] = SearchEngine(d, DOCUMENTS_CONFIG)
        fed = FederatedEngine(members)
        out = fed.search(Compound(must=(Term("text", "vector"),)), k=10)
        out["score"] = round_half_up(out["score"].to_numpy())
        return out

    def s37_dictionary(sf_dir):
        # Lucene Terms API: the text field's full exact-term
        # dictionary (bare term, df) streamed as a Dataset — the
        # oracle checks EVERY vocabulary row, making this a whole-
        # index integrity probe too
        eng = _doc_engine(sf_dir)
        return eng.dictionary_terms("text")

    def s35_fragments(sf_dir):
        # ES highlight number_of_fragments=3: up to 3 keyword windows
        # per doc, position-ordered
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.extract_fragments(docs, "vector", context=2, max_fragments=3)

    # ---- dedup ------------------------------------------------------
    def dedup_exact(sf_dir):
        both = _docs_with_near_dups(sf_dir)  # exact dups: none -> all dup_count=1
        return dd.exact_dedup(both, "text", "doc_id")

    def dedup_minhash(sf_dir):
        # bands=32 x rows=2: band-collision prob at the J=0.5 threshold
        # is 1-(1-0.25)^32 ~ 0.9999, so LSH recall at the boundary is
        # near-exhaustive and the all-pairs Jaccard SQL holds as a
        # value oracle (16x4 banding would miss a boundary pair ~36%
        # of the time if the corpus ever grew one)
        return dd.minhash_lsh_pairs(
            _docs_with_near_dups(sf_dir),
            threshold=0.5,
            params=dd.MinHashParams(num_perm=64, bands=32),
        )

    def dedup_simhash(sf_dir):
        return dd.simhash_pairs(_docs_with_near_dups(sf_dir), max_hamming=3)

    def dedup_ngram(sf_dir):
        # exact-recall all-pairs n-gram Jaccard (shared-shingle
        # blocking — unlike LSH, provably finds every J>=threshold
        # pair, so the all-pairs SQL is a true value oracle)
        return dd.ngram_jaccard_pairs(_docs_with_near_dups(sf_dir), threshold=0.5)

    def dedup_components(sf_dir):
        # pairs -> duplicate clusters: distributed min-label
        # propagation over the exact-recall ngram pair set (so the
        # recursive-CTE closure in SQL sees the identical edge set);
        # component = min doc_id reachable = the canonical keeper
        pairs = dd.ngram_jaccard_pairs(_docs_with_near_dups(sf_dir), threshold=0.5)
        return dd.connected_components(pairs)

    def dedup_survivors(sf_dir):
        # end-to-end keep-one dedup: pairs -> components -> surviving
        # corpus (min-id member per cluster kept, everything else
        # dropped via the broadcast anti-filter — the corpus never
        # shuffles)
        docs = _docs_with_near_dups(sf_dir)
        pairs = dd.ngram_jaccard_pairs(docs, threshold=0.5)
        comps = dd.connected_components(pairs)
        return dd.drop_near_duplicates(docs, comps).select_columns(["doc_id"])

    def dedup_incremental(sf_dir):
        # continuous-ingest dedup: the STANDING corpus (original
        # documents) is indexed ONCE into a stored shingle index
        # (/tmp cache keyed on source mtime); the NEW shard (the
        # perturbed +1000000 copies) then streams against the index —
        # no re-read / re-tokenize of the standing corpus. Exact
        # recall (shared-shingle blocking), so the cross-pairs
        # Jaccard SQL is a true value oracle.
        import ray.data as rd

        tag = sf_dir.strip("/").replace("/", "_")
        mt = int(os.path.getmtime(os.path.join(sf_dir, "documents.parquet")))
        idx_dir = f"/tmp/ser_shingle_idx/{tag}_{mt}_w3"
        if not os.path.exists(idx_dir):
            old = rd.read_parquet(
                os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
            )
            dd.write_shingle_index(old, idx_dir + ".tmp", w=3)
            os.rename(idx_dir + ".tmp", idx_dir)

        def _perturb(t: pa.Table) -> pa.Table:
            # the NEW shard is a 10% slice — the op's design point is
            # "one ingest batch vs a much larger standing corpus";
            # perturbing the whole corpus degrades it to all-pairs
            keep = pa.array(t["doc_id"].to_numpy() % 10 == 0)
            t = t.filter(keep)
            return pa.table(
                {
                    "doc_id": pc.add(t["doc_id"], 1_000_000),
                    "text": pc.binary_join_element_wise(t["text"], "zz_dup_marker", " "),
                }
            )

        new_shard = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        ).map_batches(_perturb, batch_format="pyarrow")
        return dd.incremental_jaccard_pairs(idx_dir, new_shard, threshold=0.5)

    def dedup_best_quality(sf_dir):
        # quality-aware survivor selection (the RefinedWeb/Dolma
        # policy): within each near-dup cluster keep the member with
        # the HIGHEST heuristic quality score (tie -> lowest id) —
        # the perturbed copies append a token, so original vs copy
        # genuinely differ in score and the choice is score-driven,
        # not id-driven. Oracle: recursive-CTE closure + the t_quality
        # scoring SQL + one QUALIFY row per component.
        docs = _docs_with_near_dups(sf_dir)
        scored = txt.add_quality_score(docs, "text")
        pairs = dd.ngram_jaccard_pairs(docs, threshold=0.5)
        comps = dd.connected_components(pairs)
        return dd.keep_best_in_component(scored, comps, "quality").select_columns(
            ["doc_id"]
        )

    # ---- similarity search -----------------------------------------
    def ann_cosine(sf_dir):
        emb = _read(sf_dir, "embeddings")
        qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = qt.filter(pc.is_in(qt["vec_id"], value_set=pa.array([0, 1, 2], pa.int64())))
        queries = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
        return ann.cosine_topk(emb, queries, qt["vec_id"].to_numpy().astype(np.int64), k=10)

    def ann_hard_negatives(sf_dir):
        # hard-negative mining (the DPR/ANCE retriever-training data
        # prep): for each anchor, the 10 corpus vectors MOST similar
        # to it among those with a DIFFERENT label — near in embedding
        # space, semantically negative
        emb = _read(sf_dir, "embeddings")
        qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = qt.filter(pc.is_in(qt["vec_id"], value_set=pa.array([0, 1, 2], pa.int64())))
        queries = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
        return ann.hard_negatives(
            emb,
            queries,
            qt["vec_id"].to_numpy().astype(np.int64),
            qt["label"].to_numpy().astype(np.int64),
            k=10,
        )

    def ann_cosine_filtered(sf_dir):
        # filtered kNN (the modern vector-search shape: metadata
        # pre-filter THEN exact top-k among survivors — k results are
        # guaranteed, unlike post-filtering a larger unfiltered k)
        emb = _read(sf_dir, "embeddings")
        flt = rel.filter_conditions(emb, [("label", "==", 1)])
        qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = qt.filter(pc.is_in(qt["vec_id"], value_set=pa.array([0, 1, 2], pa.int64())))
        queries = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
        return ann.cosine_topk(flt, queries, qt["vec_id"].to_numpy().astype(np.int64), k=10)

    def ann_rp_lsh(sf_dir):  # rows-only
        import ray.data as rd

        emb = _read(sf_dir, "embeddings")

        def _perturb(t: pa.Table) -> pa.Table:
            vecs = t["embedding"].combine_chunks()
            flat = pc.list_flatten(vecs).to_numpy(zero_copy_only=False).astype(np.float32)
            flat = flat * np.float32(1.0001)  # same direction -> cos == 1
            n = len(vecs)
            d = flat.size // n
            offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
            emb = pa.ListArray.from_arrays(offsets, pa.array(flat, pa.float32()))
            return pa.table(
                {
                    "vec_id": pc.add(t["vec_id"], 1_000_000),
                    "embedding": emb,
                    "label": t["label"],
                }
            )

        both = emb.union(emb.map_batches(_perturb, batch_format="pyarrow"))
        return ann.rp_lsh_near_dup(both, threshold=0.999, n_planes=10)

    def dedup_semantic(sf_dir):
        # SemDeDup (Abbas et al. 2023): seeded spherical k-means over
        # the embedding table, mark within-cluster near-dups
        # (cos >= 0.99 to a lower-id cluster-mate). Near-dups are
        # PLANTED — a x1.0001-scaled copy of every vector (same
        # direction, cos == 1) unioned under vec_id+1e6 — so the
        # dup-marking path is value-checked, not just the clustering
        # (random synthetic embeddings alone have no 0.99-cos pairs).
        # The oracle retrains the SAME seeded centroids
        # (spherical_kmeans is deterministic over the sorted sample)
        # and replays perturbation + assignment + self-join in SQL;
        # the f32*f32 product is exact in f64, so CAST(x * <f32 lit>
        # AS REAL) reproduces numpy's float32 multiply bit-for-bit.
        from search_engine_ray.ops.ann import semantic_dedup

        emb = _read(sf_dir, "embeddings")

        def _perturb(t: pa.Table) -> pa.Table:
            vecs = t["embedding"].combine_chunks()
            flat = pc.list_flatten(vecs).to_numpy(zero_copy_only=False).astype(np.float32)
            flat = flat * np.float32(1.0001)
            n = len(vecs)
            d = flat.size // n
            offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
            e2 = pa.ListArray.from_arrays(offsets, pa.array(flat, pa.float32()))
            return pa.table({"vec_id": pc.add(t["vec_id"], 1_000_000), "embedding": e2})

        both = emb.select_columns(["vec_id", "embedding"]).union(
            emb.map_batches(_perturb, batch_format="pyarrow")
        )
        out = semantic_dedup(both, threshold=0.99, n_clusters=8).to_pandas()
        out["cluster"] = out["cluster"].astype("int64")
        out["is_dup"] = out["is_dup"].astype("int64")
        return out[["vec_id", "cluster", "is_dup"]]

    def t_cluster_sample(sf_dir):
        # cluster-balanced selection (DataComp/DCLM diversity stage):
        # seeded k-means assignment + keep the 20 lowest-md5-hash
        # members per cluster — the kept set covers embedding space
        # instead of following corpus density; fully deterministic,
        # the oracle retrains the centroids and replays the draw
        from search_engine_ray.ops.ann import cluster_balanced_sample

        emb = _read(sf_dir, "embeddings")
        out = (
            cluster_balanced_sample(emb, quota=20, n_clusters=8)
            .to_pandas()
            .sort_values(["cluster", "vec_id"])
            .reset_index(drop=True)
        )
        out["cluster"] = out["cluster"].astype("int64")
        return out[["vec_id", "cluster"]]

    def ann_ivf(sf_dir):  # rows-only (scale path: cluster-pruned read)
        tag = sf_dir.strip("/").replace("/", "_")
        # keyed on source mtime (the e1 CSV-cache lesson, same fix as
        # ann_pq): regenerated testdata must not serve stale centroids
        _ivf_mt = int(os.path.getmtime(os.path.join(sf_dir, "embeddings.parquet")))
        ivf_dir = f"/tmp/ser_ivf_cache/{tag}_{_ivf_mt}_v2"
        emb = _read(sf_dir, "embeddings")
        if not os.path.exists(os.path.join(ivf_dir, "centroids.json")):
            ann.IVFIndex.build(emb, ivf_dir, n_clusters=8)
        idx = ann.IVFIndex(ivf_dir)
        q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qv = np.asarray(q["embedding"][0].as_py(), dtype=np.float64)
        out = idx.search(qv, k=10, nprobe=8)  # nprobe=all -> exact
        return out

    def ann_ivf_batch(sf_dir):
        # Dataset-native batched ANN over the IVF partitions
        tag = sf_dir.strip("/").replace("/", "_")
        # keyed on source mtime (the e1 CSV-cache lesson, same fix as
        # ann_pq): regenerated testdata must not serve stale centroids
        _ivf_mt = int(os.path.getmtime(os.path.join(sf_dir, "embeddings.parquet")))
        ivf_dir = f"/tmp/ser_ivf_cache/{tag}_{_ivf_mt}_v2"
        emb = _read(sf_dir, "embeddings")
        if not os.path.exists(os.path.join(ivf_dir, "centroids.json")):
            ann.IVFIndex.build(emb, ivf_dir, n_clusters=8)
        idx = ann.IVFIndex(ivf_dir)
        qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = qt.filter(pc.is_in(qt["vec_id"], value_set=pa.array([0, 1, 2], pa.int64())))
        queries = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
        return idx.search_batch(
            queries, qt["vec_id"].to_numpy().astype(np.int64), k=10, nprobe=8
        )

    def ann_pq(sf_dir):
        # rows-only (kmeans codebooks aren't SQL-replicable): IVF-PQ's
        # compression half — m=8 uint8 codes per 64-dim vector (64x
        # smaller scan), ADC shortlist k*rerank, then ONE filtered
        # exact-cosine pass over the raw vectors (pytest pins recall
        # floors vs brute force)
        tag = sf_dir.strip("/").replace("/", "_")
        # key the cache on the source mtime (the e1 CSV-cache lesson):
        # regenerated testdata must not serve a stale codebook/codes
        mt = int(os.path.getmtime(os.path.join(sf_dir, "embeddings.parquet")))
        pq_dir = f"/tmp/ser_pq_cache/{tag}_{mt}_v1"
        emb = _read(sf_dir, "embeddings")
        if not os.path.exists(os.path.join(pq_dir, "codebooks.json")):
            ann.PQIndex.build(emb, pq_dir, m=8)
        idx = ann.PQIndex(pq_dir)
        qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = qt.filter(pc.is_in(qt["vec_id"], value_set=pa.array([0, 1, 2], pa.int64())))
        queries = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
        return ann.pq_search_rerank(
            idx, emb, queries, qt["vec_id"].to_numpy().astype(np.int64), k=10, rerank=4
        )

    def ann_ivfpq(sf_dir):
        # composed IVF + PQ (IVFADC): probe 4 of 8 clusters, ADC-scan
        # only their code files, exact re-rank only the shortlist —
        # the billion-scale layout, value-checked end to end (the
        # oracle retrains centroids+codebooks and replays probing,
        # encoding, ADC and the re-rank page in SQL)
        tag = sf_dir.strip("/").replace("/", "_")
        mt = int(os.path.getmtime(os.path.join(sf_dir, "embeddings.parquet")))
        ipq_dir = f"/tmp/ser_ivfpq_cache/{tag}_{mt}_v1"
        emb = _read(sf_dir, "embeddings")
        if not os.path.exists(os.path.join(ipq_dir, "meta.json")):
            ann.IVFPQIndex.build(emb, ipq_dir, n_clusters=8, m=8)
        idx = ann.IVFPQIndex(ipq_dir)
        qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = qt.filter(pc.is_in(qt["vec_id"], value_set=pa.array([0, 1, 2], pa.int64())))
        queries = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
        return idx.search_batch(
            queries, qt["vec_id"].to_numpy().astype(np.int64), k=10, nprobe=4, rerank=4
        )

    # ---- multimodal plumbing (deterministic fake decode; the fake is
    # counter-mode md5 over the payload hex, so BOTH entries carry SQL
    # value oracles — the oracle rebuilds the payload hex from the
    # embedded input sizes and replays the hash math in DuckDB)
    def mm_features(sf_dir):
        import ray.data as rd

        media = rd.from_arrow(synthetic_media_table(200, "image", seed=3))
        out = featurize_media(media, feature_dim=8).to_pandas()
        out["feat0"] = out["features"].map(lambda f: round(float(f[0]), 6))
        out["payload_bytes"] = out["payload_bytes"].astype("int64")
        return out[["media_id", "kind", "payload_bytes", "feat0"]]

    def mm_frames(sf_dir):
        import ray.data as rd

        media = rd.from_arrow(synthetic_media_table(200, "video", seed=3))
        out = sample_frames(media, max_frames=4).to_pandas()
        out["frame_hex"] = out["frame_payload"].map(lambda b: bytes(b).hex())
        out["frame_idx"] = out["frame_idx"].astype("int64")
        return out[["media_id", "frame_idx", "frame_hex"]]

    def mm_audio_energy(sf_dir):
        # audio windowed-energy screen (ops/multimodal.AudioEnergy):
        # actor-pool decode (soundfile-guarded real path, deterministic
        # SQL-replayable fake here) -> per-media window count + mean
        # pseudo-RMS; the value oracle replays the md5 energy chain
        import ray.data as rd

        from search_engine_ray.ops.multimodal import audio_energy

        media = rd.from_arrow(synthetic_media_table(200, "audio", seed=3))
        out = (
            audio_energy(media)
            .to_pandas().sort_values("media_id").reset_index(drop=True)
        )
        out["mean_energy"] = out["mean_energy"].map(lambda v: round(float(v), 6))
        out["n_windows"] = out["n_windows"].astype("int64")
        return out[["media_id", "n_windows", "mean_energy"]]

    # ---- sources / ETL ring ----------------------------------------
    def e20_orc_source(sf_dir):
        # ORC source via the custom-source composition (Ray 2.49 has
        # no read_orc): read_binary_files over the ORC directory ->
        # per-file pyarrow.orc decode inside map_batches with COLUMN
        # PRUNING pushed into ORCFile.read(columns=...) — the standard
        # shape for any format Ray lacks natively; file-level
        # parallelism is the partition grain. Fixture: customer
        # dumped to 4 ORC files (mtime-keyed cache, e1 lesson).
        import ray.data as rd

        src = os.path.join(sf_dir, "customer.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        orc_dir = f"/tmp/ser_orc_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        if not os.path.exists(os.path.join(orc_dir, "_DONE")):
            import shutil

            import pyarrow.orc as _orc

            shutil.rmtree(orc_dir, ignore_errors=True)
            os.makedirs(orc_dir, exist_ok=True)
            t = pq.read_table(src, columns=["c_custkey", "c_mktsegment", "c_acctbal"])
            step = max(1, (t.num_rows + 3) // 4)
            for i in range(0, t.num_rows, step):
                _orc.write_table(
                    t.slice(i, step), os.path.join(orc_dir, f"part-{i:08d}.orc")
                )
            open(os.path.join(orc_dir, "_DONE"), "w").write("ok")

        def _decode(t: pa.Table) -> pa.Table:
            import io

            import pyarrow.orc as _orc

            outs = [
                _orc.ORCFile(io.BytesIO(b.as_py())).read(
                    columns=["c_mktsegment", "c_acctbal"]
                )
                for b in t["bytes"]
            ]
            return pa.concat_tables(outs)

        import glob as _g

        ds = rd.read_binary_files(
            sorted(_g.glob(os.path.join(orc_dir, "*.orc")))
        ).map_batches(_decode, batch_format="pyarrow", batch_size=1)
        out = rel.grouped_aggregate(
            ds, "c_mktsegment",
            {"cnt": ("count", "c_acctbal"), "sum_bal": ("sum", "c_acctbal")},
        ).to_pandas().sort_values("c_mktsegment", kind="mergesort").reset_index(drop=True)
        out["cnt"] = out["cnt"].astype("int64")
        out["sum_bal"] = round_half_up(out["sum_bal"].to_numpy(np.float64))
        return out[["c_mktsegment", "cnt", "sum_bal"]]

    def e1_csv_source(sf_dir):
        # E1 CSV reader (reference utils.py:6-34): parquet -> csv ->
        # ray.data.read_csv -> grouped count; values must equal the
        # parquet view's aggregate.
        import ray.data as rd

        # cache keyed on source mtime+size so a regenerated testdata
        # parquet invalidates the dump (round-1 used only the sf tag)
        src = os.path.join(sf_dir, "documents.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        csv_dir = f"/tmp/ser_csv_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        if not os.path.exists(os.path.join(csv_dir, "_DONE")):
            import shutil

            shutil.rmtree(csv_dir, ignore_errors=True)
            _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"]).write_csv(csv_dir)
            open(os.path.join(csv_dir, "_DONE"), "w").write("ok")
        import glob as _g

        ds = rd.read_csv(sorted(_g.glob(os.path.join(csv_dir, "*.csv"))))
        out = rel.grouped_aggregate(
            ds, "lang", {"cnt": ("count", "doc_id"), "sum_chars": ("sum", "n_chars")}
        ).to_pandas()
        # CSV round-trip + Ray sum typing can drift (int32/float); pin
        # both aggregates to int64 to match the BIGINT-cast oracle
        out["cnt"] = out["cnt"].astype("int64")
        out["sum_chars"] = out["sum_chars"].astype("int64")
        return out

    def e2_incremental(sf_dir):
        # E2 incremental extract (CDC-lite lookback, reference
        # `WHERE updated_at > t - Δ`, lamda/inventory_sync.py:14-22):
        # the predicate is pushed INTO the parquet read (row-group
        # pruning on ts), then the slice is rolled up
        import datetime

        from search_engine_ray.ops.sources import read_parquet_filtered

        cutoff = datetime.datetime(2024, 1, 20)
        ds = read_parquet_filtered(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type", "value"],
            conditions=[("ts", ">=", cutoff)],
        )
        out = rel.grouped_aggregate(
            ds, "event_type", {"n": ("count", "value"), "sum_value": ("sum", "value")}
        ).to_pandas()
        out["sum_value"] = round_half_up(out["sum_value"].to_numpy(), 2)
        return out

    def e4_upsert_sink(sf_dir):
        # E4 bulk upsert sink (reference UpdateOne(upsert=True) batches,
        # lamda/store_product_sync.py:50-74): write the base snapshot
        # partitioned by lang, upsert the 'en' partition with modified
        # rows, read back — the final state must reflect the upsert
        import shutil

        from search_engine_ray.ops import sinks

        st = os.stat(os.path.join(sf_dir, "documents.parquet"))
        tag = sf_dir.strip("/").replace("/", "_")
        out_dir = f"/tmp/ser_sink_cache/{tag}_{int(st.st_mtime)}/e4"
        shutil.rmtree(out_dir, ignore_errors=True)
        docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        sinks.upsert_partitions(docs, out_dir, ["lang"])
        upd = rel.project(
            rel.filter_conditions(docs, [("lang", "==", "en")]),
            keep=["doc_id", "lang"],
            exprs={"n_chars": lambda t: pc.add(t["n_chars"], 1000)},
        )
        sinks.upsert_partitions(upd, out_dir, ["lang"])
        import ray.data as rd

        back = rd.read_parquet(out_dir)
        out = rel.grouped_aggregate(
            back, "lang", {"cnt": ("count", "doc_id"), "sum_chars": ("sum", "n_chars")}
        ).to_pandas()
        out["cnt"] = out["cnt"].astype("int64")
        out["sum_chars"] = out["sum_chars"].astype("int64")
        out["lang"] = out["lang"].astype(str)
        return out

    def e5_full_refresh(sf_dir):
        # E5 full-refresh sink (reference delete_many + insert,
        # lamda/group_sellable_inventory.py:46-48): write a snapshot,
        # then atomically replace it with a filtered refresh — only the
        # second snapshot's rows must survive
        import shutil

        from search_engine_ray.ops import sinks

        st = os.stat(os.path.join(sf_dir, "documents.parquet"))
        tag = sf_dir.strip("/").replace("/", "_")
        out_dir = f"/tmp/ser_sink_cache/{tag}_{int(st.st_mtime)}/e5"
        shutil.rmtree(out_dir, ignore_errors=True)
        docs = _read(sf_dir, "documents", ["doc_id", "lang"])
        sinks.full_refresh(docs, out_dir)
        sinks.full_refresh(rel.filter_conditions(docs, [("lang", "in", ["en", "de"])]), out_dir)
        import ray.data as rd

        out = rel.value_counts(rd.read_parquet(out_dir), "lang", alias="cnt").to_pandas()
        out["cnt"] = out["cnt"].astype("int64")
        return out

    def e8_log_sink(sf_dir):
        # E8 append-only log sink (reference per-request log inserts,
        # app.py:62-64): one log row appended per search; read the log
        # back — totals must equal the match counts
        import tempfile

        from search_engine_ray.ops import sinks

        eng = _doc_engine(sf_dir)
        log_dir = tempfile.mkdtemp(prefix="ser_e8_log_")
        for kw in ("vector", "hash join", "spark"):
            q = plan_keyword(kw, text_field="text", prefix_fields=())
            res = eng.search(q, k=5, with_metadata=False)
            sinks.append_log(
                pa.table({"keyword": [kw], "total": pa.array([res.total], pa.int64())}),
                log_dir,
                name=kw.replace(" ", "_"),
            )
        return sinks.read_log(log_dir).to_pandas()

    def e7_tags(sf_dir):
        # E7 $push/$pull on a list column (reference lamda/tags.py)
        from search_engine_ray.ops.arrays import list_pull, list_push
        from search_engine_ray.ops.text import _flat_tokens

        docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

        def _mk_tags(t: pa.Table) -> pa.Table:
            # first 3 tokens per doc, fully vectorized: token stream +
            # per-doc offsets, take the first min(3, count) of each
            flat, parents, n = _flat_tokens(t["text"])
            counts = np.bincount(parents, minlength=n)
            starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
            take_n = np.minimum(counts, 3)
            out_starts = np.concatenate(([0], np.cumsum(take_n)))
            total = int(out_starts[-1])
            # position within each doc's run = global index - run start
            idx = (
                np.repeat(starts, take_n)
                + np.arange(total)
                - np.repeat(out_starts[:-1], take_n)
            )
            offs = out_starts.astype(np.int32)
            vals = flat.take(pa.array(idx, pa.int64()))
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            tags = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), vals)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "lang": t["lang"],
                    "tags": tags,
                }
            )

        ds = docs.map_batches(_mk_tags, batch_format="pyarrow")
        ds = list_push(ds, "tags", "xx", where=("lang", "en"))
        ds = list_pull(ds, "tags", "data")

        def _join(t: pa.Table) -> pa.Table:
            joined = [" ".join(x) for x in t["tags"].to_pylist()]
            return pa.table({"doc_id": t["doc_id"], "tags": pa.array(joined, pa.string())})

        return ds.map_batches(_join, batch_format="pyarrow")

    # ---- end-to-end pipelines --------------------------------------
    def pipe_hybrid(sf_dir):
        # hybrid retrieval: BM25 top-50 ('vector') + cosine top-50
        # (query = embedding of vec 0) fused with Reciprocal Rank
        # Fusion (k0=60) — the ES/OpenSearch `rrf` combiner
        from search_engine_ray.pipelines import hybrid_search

        eng = _doc_engine(sf_dir)
        emb = _read(sf_dir, "embeddings")
        qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qv = np.asarray(qt["embedding"][0].as_py(), dtype=np.float64)
        out = hybrid_search(
            eng,
            Compound(must=(Term("text", "vector"),)),
            emb,
            qv,
            k=10,
            depth=50,
            query_id=0,
        )
        out["rank_0"] = out["rank_0"].astype("int64")
        out["rank_1"] = out["rank_1"].astype("int64")
        return out

    def pipe_listing(sf_dir):
        from search_engine_ray.pipelines import listing

        docs = _read(sf_dir, "documents")
        res = listing(
            docs,
            conditions=[("lang", "in", ["en", "de"])],
            sort_keys=["n_chars", "doc_id"],
            descending=[True, False],
            page=1,
            per_page=15,
            sidebar_cols=("source",),
        )
        return res["rows"][["doc_id", "lang", "source", "n_chars"]]

    def pipe_grouped_search(sf_dir):
        from search_engine_ray.pipelines import grouped_search

        eng = _doc_engine(sf_dir)
        res = grouped_search(
            eng, "vector", text_field="text", prefix_fields=(), group_col="source",
            sum_col="n_chars", k=10,
        )
        page = res["data"].copy()
        page["score"] = round_half_up(page["score"].to_numpy())
        return page[["source", "doc_id", "score", "stock_sum", "variant_count"]]

    def pipe_listing_facets(sf_dir):
        # the listing sidebar (R16 over the filtered set,
        # pipelines.py:427-432): distinct source values with counts
        docs = _read(sf_dir, "documents", ["lang", "source"])
        filtered = rel.filter_conditions(docs, [("lang", "in", ["en", "de"])])
        return rel.value_counts(filtered, "source", alias="cnt")

    # ---- round-3 third wave ------------------------------------------

    def t_gopher_rules(sf_dir):
        # the published Gopher quality-rule bundle (Rae et al. 2021
        # §A1.1): every rule as its own metric column + the combined
        # pass verdict; one vectorized Arrow map, no shuffle
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.add_gopher_rules(docs).drop_columns(["text"])

    def t_reservoir_sample(sf_dir):
        # weighted sampling without replacement (Efraimidis-Spirakis
        # A-ES): hash-derived uniforms -> u^(1/w) keys, top-50 —
        # deterministic across runs and cluster sizes
        docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
        return sk.weighted_reservoir_sample(docs, "doc_id", "n_chars", k=50)

    def ann_range(sf_dir):
        # radius (range) search: everything with round(cos,4) >= 0.3
        # of each query — the fixed-radius companion to cosine_topk
        emb = _read(sf_dir, "embeddings")
        qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        qt = qt.filter(pc.is_in(qt["vec_id"], value_set=pa.array([0, 1, 2], pa.int64())))
        queries = np.stack(
            [np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()]
        )
        return ann.cosine_range(
            emb, queries, qt["vec_id"].to_numpy().astype(np.int64), threshold=0.3
        )

    def s60_terms_set(sf_dir):
        # ES terms_set: the required should-clause count comes PER DOC
        # from the docmap (minimum_should_match_field n_chars through
        # the _script analog least(3, 1 + n_chars // 300))
        q = Compound(
            should=tuple(Term("text", t) for t in ("hash", "join", "vector", "index")),
            msm_field="n_chars",
            msm_map=lambda v: np.minimum(3, 1 + v // 300),
        )
        return _bm25_query(sf_dir, q)

    def s61_rare_terms(sf_dir):
        # ES rare_terms agg: long-tail facet values of the matched set
        # (doc_count <= 16), count asc — the inverse of top-N terms
        eng = _doc_engine(sf_dir)
        r = eng.search(
            Compound(must=(Term("text", "vector"),)),
            k=1,
            with_metadata=False,
            facet_fields=("source",),
        )
        items = [(v, c) for v, c in r.facets.get("source", {}).items() if c <= 16]
        items.sort(key=lambda x: (x[1], x[0]))
        return pd.DataFrame(items, columns=["source", "cnt"])

    def s62_multi_terms(sf_dir):
        # ES multi_terms agg: composite (lang, source) buckets over the
        # FULL matched set, top-10 by count. The key pair is fused into
        # one column inside the scorer output batches, so the count is
        # a single low-cardinality combiner groupby — no multi-key
        # sort-exchange, matched rows never leave their partitions
        # un-aggregated.
        eng = _doc_engine(sf_dir)
        matched = eng.search_all(
            Compound(must=(Term("text", "vector"),)), attach_cols=("lang", "source")
        )

        def _fuse(t: pa.Table) -> pa.Table:
            key = pc.binary_join_element_wise(
                pc.cast(t["lang"], pa.string()), pc.cast(t["source"], pa.string()), "|"
            )
            return pa.table({"key": key})

        counts = rel.value_counts(
            matched.map_batches(_fuse, batch_format="pyarrow"), "key", alias="cnt"
        )
        top = rel.topk(counts, ["cnt", "key"], 10, descending=[True, False]).to_pandas()
        parts = top["key"].str.split("|", n=1, expand=True)
        return pd.DataFrame(
            {"lang": parts[0], "source": parts[1], "cnt": top["cnt"].astype("int64")}
        )

    def s63_diversified_sampler(sf_dir):
        # ES diversified_sampler agg: at most one doc per `source`
        # (the collapse representatives = the diversity sample), then
        # the metric agg over the de-biased sample
        eng = _doc_engine(sf_dir)
        r = eng.search(Compound(must=(Term("text", "vector"),)), k=100, collapse="source")
        reps = r.hits
        avg = float(np.int64(reps["n_chars"].to_numpy().sum())) / len(reps)
        return pd.DataFrame(
            {
                "n_sampled": [np.int64(len(reps))],
                "avg_n_chars": [float(round_half_up(np.array([avg]))[0])],
            }
        )

    def s64_match_bool_prefix(sf_dir):
        # ES match_bool_prefix: every term an optional should clause,
        # the LAST one a prefix (dictionary range scan, per-expansion
        # idf) — the type-ahead cousin of match_phrase_prefix without
        # position constraints. Ranking on the ROUNDED score absorbs
        # SQL SUM() float-order differences across the expansion set
        # (same convention as the s2 range scan).
        # Served from the actor scatter-gather path with k+slack like
        # s22: the page is provably exact unless the rounded k-th
        # score ties across the retrieval boundary (then fall back to
        # the full-scan Dataset job).
        eng = _doc_engine(sf_dir)
        q = Compound(
            should=(Term("text", "hash"), Term("text", "join"), Prefix("text", "vec")),
            min_should_match=1,
        )
        k, slack = 10, 40
        res = eng.search(q, k=k + slack, with_metadata=False)
        df = pd.DataFrame(
            {
                "doc_id": res.hits["doc_id"].to_numpy().astype(np.int64),
                "score": round_half_up(res.hits["score"].to_numpy()),
            }
        )
        df = df.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
        page = df.head(k)
        if (
            res.total > len(df)
            and len(page) == k
            and df["score"].min() >= page["score"].iloc[-1]
        ):
            df = eng.search_all(q).to_pandas()
            df["score"] = round_half_up(df["score"].to_numpy())
            df = df.sort_values(
                ["score", "doc_id"], ascending=[False, True], kind="mergesort"
            )
            page = df.head(k)
        return page[["doc_id", "score"]].reset_index(drop=True)

    def s66_distance_feature(sf_dir):
        # ES distance_feature query: additive proximity boost
        # boost * pivot / (pivot + |n_chars - 500|) — full boost at the
        # origin, half at distance pivot (recency/proximity ranking
        # without a hard range filter)
        from search_engine_ray.query import DistanceFeatureBoost

        b = DistanceFeatureBoost("n_chars", origin=500.0, pivot=100.0, boost=5.0)
        return _bm25_query(sf_dir, Compound(must=(Term("text", "vector"),)), boosts=(b,))

    def r36_derivative(sf_dir):
        # ES pipeline aggs (derivative + cumulative_sum) over a
        # calendar date_histogram: the distributed part is the
        # day-bucket combiner aggregate; the window pass runs on the
        # tiny (one-row-per-day) result
        ds = _read(sf_dir, "events", ["ts", "value"])
        out = rel.calendar_window_aggregate(
            ds, "ts", "day", {"n": ("count", "value")}
        ).to_pandas()
        out = out.sort_values("window_start").reset_index(drop=True)
        out["window_start"] = out["window_start"].astype("datetime64[us]").astype("int64")
        out["cum_n"] = out["n"].cumsum().astype("int64")
        out["deriv"] = out["n"].diff()
        out = out.iloc[1:].reset_index(drop=True)  # ES emits no deriv for the first bucket
        out["deriv"] = out["deriv"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out[["window_start", "n", "deriv", "cum_n"]]

    def r37_moving_avg(sf_dir):
        # ES moving_fn pipeline aggs over the day date_histogram:
        # trailing 3-bucket moving average and lag-2 serial
        # differencing of the bucket count. The distributed part is
        # the day combiner; the window pass runs on the tiny
        # one-row-per-day series with the op order pinned
        # ((n₋₂+n₋₁+n)/3 — integer inputs, no summation-order drift)
        ds = _read(sf_dir, "events", ["ts", "value"])
        out = rel.calendar_window_aggregate(
            ds, "ts", "day", {"n": ("count", "value")}
        ).to_pandas()
        out = out.sort_values("window_start").reset_index(drop=True)
        out["window_start"] = out["window_start"].astype("datetime64[us]").astype("int64")
        n = out["n"].astype("float64")
        out["mavg3"] = round_half_up(
            ((n.shift(2) + n.shift(1)) + n).to_numpy() / 3.0
        )
        out["sdiff2"] = out["n"] - out["n"].shift(2)
        out = out.iloc[2:].reset_index(drop=True)  # ES emits no value until the window fills
        out["n"] = out["n"].astype("int64")
        out["sdiff2"] = out["sdiff2"].astype("int64")
        return out[["window_start", "n", "mavg3", "sdiff2"]]

    def e14_compaction(sf_dir):
        # small-file compaction (the sink-maintenance op): 16 accreted
        # fragments -> ceil(n / target) files via one streaming
        # repartition + atomic swap; row content byte-identical
        import ray.data as rd

        from search_engine_ray.ops.sinks import compact_parquet

        src = os.path.join(sf_dir, "documents.parquet")
        tag = sf_dir.strip("/").replace("/", "_")
        base = f"/tmp/ser_idx_cache/{tag}/compact_{int(os.path.getmtime(src))}"
        small, compacted = os.path.join(base, "small"), os.path.join(base, "compacted")
        done = os.path.join(base, "_DONE")
        if not os.path.exists(done):
            import shutil

            shutil.rmtree(base, ignore_errors=True)
            docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
            docs.repartition(16).write_parquet(small)
            n_files = compact_parquet(small, compacted, target_rows_per_file=1_000_000)
            assert n_files < 16
            with open(done, "w") as f:
                f.write(str(n_files))
        return rd.read_parquet(compacted)

    # ---- round-3 fourth wave: remaining ES agg family + relational
    # gaps + LLM soft-dedup (driver-window candidates for r04) --------
    def r47_string_stats(sf_dir):
        # ES string_stats over a keyword field: count / min / max / avg
        # length + Shannon entropy of the character distribution. One
        # combiner pass — each block ships an alphabet-sized codepoint
        # histogram + length moments, never rows
        docs = _read(sf_dir, "documents", ["source"])
        st = txt.string_stats(docs, "source")
        return pd.DataFrame({
            "count": pd.array([st["count"]], dtype="int64"),
            "min_length": pd.array([st["min_length"]], dtype="int64"),
            "max_length": pd.array([st["max_length"]], dtype="int64"),
            "avg_length": [float(round_half_up(st["avg_length"], 4))],
            "entropy": [float(round_half_up(st["entropy"], 4))],
        })

    def r48_top_metrics(sf_dir):
        # ES top_metrics: per returnflag, the l_extendedprice carried
        # by the latest-shipped line (sort: l_shipdate desc, unique
        # (orderkey, linenumber) tiebreak) — group_dedup_first keeps
        # <=1 row per key per block on the shuffle
        li = _read(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"],
        )
        top = (
            rel.group_dedup_first(
                li, "l_returnflag",
                ["l_shipdate", "l_orderkey", "l_linenumber"],
                descending=True,
            )
            .to_pandas()
            .sort_values("l_returnflag", kind="mergesort")
            .reset_index(drop=True)
        )
        return pd.DataFrame({
            "l_returnflag": top["l_returnflag"],
            "top_shipdate": top["l_shipdate"].dt.strftime("%Y-%m-%d"),
            "metric_price": round_half_up(top["l_extendedprice"].to_numpy()),
        })

    def r49_boxplot(sf_dir):
        # ES boxplot agg per group: min / q1 / q2 / q3 / max with
        # linear interpolation (quantile_cont). Exact at any corpus
        # size for a bounded-distinct column: the shuffle carries a
        # per-(group, value) count histogram, interpolation walks the
        # tiny aggregate
        li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
        q = rel.grouped_discrete_quantiles(
            li, "l_returnflag", "l_quantity", [0.25, 0.5, 0.75]
        ).sort_values("l_returnflag", kind="mergesort").reset_index(drop=True)
        return pd.DataFrame({
            "l_returnflag": q["l_returnflag"],
            "min_v": q["min_v"],
            "q1": round_half_up(q["q0.25"].to_numpy(), 4),
            "q2": round_half_up(q["q0.5"].to_numpy(), 4),
            "q3": round_half_up(q["q0.75"].to_numpy(), 4),
            "max_v": q["max_v"],
        })

    def r50_mad(sf_dir):
        # ES median_absolute_deviation per group: median(|x - median|).
        # BOTH medians resolve from the one (group, value) histogram —
        # the |x - m| distribution's counts are a re-bucketing of the
        # same histogram, so the corpus is scanned once and nothing
        # group-sized leaves the combiner
        li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
        cnt = (
            rel.grouped_aggregate(
                li, ["l_returnflag", "l_quantity"], {"n": ("count", "l_quantity")}
            )
            .to_pandas()
            .sort_values(["l_returnflag", "l_quantity"], kind="mergesort")
            .reset_index(drop=True)
        )

        def _median(vals: np.ndarray, counts: np.ndarray) -> float:
            cum = np.cumsum(counts)
            n = int(cum[-1])
            pos = 0.5 * (n - 1)
            lo, hi = int(np.floor(pos)), int(np.ceil(pos))
            v_lo = vals[np.searchsorted(cum, lo + 1)]
            v_hi = vals[np.searchsorted(cum, hi + 1)]
            return float(v_lo + (pos - lo) * (v_hi - v_lo))

        rows = []
        for g, grp in cnt.groupby("l_returnflag", sort=True):
            vals = grp["l_quantity"].to_numpy(dtype=np.float64)
            ns = grp["n"].to_numpy(dtype=np.int64)
            med = _median(vals, ns)
            dev = np.abs(vals - med)
            order = np.argsort(dev, kind="stable")
            # re-bucket: same counts, deviation values (merge equal keys)
            dv, dn = dev[order], ns[order]
            uniq, start = np.unique(dv, return_index=True)
            sums = np.add.reduceat(dn, start)
            rows.append({
                "l_returnflag": g,
                "median_v": float(round_half_up(med, 4)),
                "mad": float(round_half_up(_median(uniq, sums), 4)),
            })
        return pd.DataFrame(rows)

    def r51_t_test(sf_dir):
        # ES t_test agg (heteroscedastic / Welch): purchase vs click
        # event values — three raw moments per side ride one combiner
        # exchange, the statistic folds on two rows
        ev = _read(sf_dir, "events", ["event_type", "value"])

        def _partial(t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.is_in(t["event_type"], value_set=pa.array(["purchase", "click"]))
            )
            df = t.to_pandas()
            df["_v"] = df["value"].astype(np.float64)
            df["_v2"] = df["_v"] * df["_v"]
            g = df.groupby("event_type", as_index=False).agg(
                n=("_v", "size"), s=("_v", "sum"), sq=("_v2", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Sum

        m = (
            ev.map_batches(_partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("sq", alias_name="sq"))
            .to_pandas()
            .set_index("event_type")
        )

        def _stats(k):
            n = float(m.loc[k, "n"])
            mean = m.loc[k, "s"] / n
            # sample variance ddof=1 in the naive-moments form the SQL
            # replays: (sq - n*mean^2) / (n-1)
            var = (m.loc[k, "sq"] - n * mean * mean) / (n - 1.0)
            return n, mean, var

        n1, m1, v1 = _stats("purchase")
        n2, m2, v2 = _stats("click")
        se2 = v1 / n1 + v2 / n2
        t_stat = (m1 - m2) / math.sqrt(se2)
        # Welch–Satterthwaite degrees of freedom
        dof = se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1.0) + (v2 / n2) ** 2 / (n2 - 1.0))
        return pd.DataFrame({
            "t_stat": [float(round_half_up(t_stat, 4))],
            "dof": [float(round_half_up(dof, 2))],
            "n_purchase": pd.array([int(n1)], dtype="int64"),
            "n_click": pd.array([int(n2)], dtype="int64"),
        })

    def _month_value_sums(sf_dir) -> pd.DataFrame:
        # shared date_histogram base: month -> (sum(value), count) via
        # the calendar-window combiner; the month table is bounded
        ev = _read(sf_dir, "events", ["ts", "value"])
        m = rel.calendar_window_aggregate(
            ev, "ts", "month", {"n": ("count", "value"), "s": ("sum", "value")}
        ).to_pandas().sort_values("window_start", kind="mergesort").reset_index(drop=True)
        m["month_start"] = m["window_start"].astype("datetime64[us]").astype("int64")
        return m

    def r52_bucket_selector(sf_dir):
        # ES bucket_selector + bucket_sort pipeline aggs: keep monthly
        # buckets with sum(value) above the gate, order by the sum
        # desc, top 5 — the filter/sort run on the bucket table, the
        # corpus rides one combiner exchange
        m = _month_value_sums(sf_dir)
        m = m[m["s"] > 1000.0].copy()
        # order on the ROUNDED sum so the sort key is fp-parity-safe
        m["sum_value"] = round_half_up(m["s"].to_numpy(), 4)
        m = m.sort_values(
            ["sum_value", "month_start"], ascending=[False, True], kind="mergesort"
        ).head(5).reset_index(drop=True)
        return pd.DataFrame({
            "month_start": m["month_start"],
            "sum_value": m["sum_value"],
            "n": m["n"].astype("int64"),
        })

    def r53_serial_diff(sf_dir):
        # ES serial_diff pipeline agg (lag=3) over the monthly count
        # series: seasonality-adjusted deltas on the bucket table
        m = _month_value_sums(sf_dir)
        out = pd.DataFrame({
            "month_start": m["month_start"],
            "n": m["n"].to_numpy(dtype=np.int64),
        })
        out["sdiff3"] = out["n"] - out["n"].shift(3)
        out = out.dropna(subset=["sdiff3"]).reset_index(drop=True)
        out["sdiff3"] = out["sdiff3"].astype("int64")
        return out

    def r54_cumulative_cardinality(sf_dir):
        # ES cumulative_cardinality: distinct users ever seen, by
        # month. The classic decomposition — each user's FIRST month
        # (a group_dedup_first combiner), then a month histogram and a
        # running sum over the tiny bucket table; no distinct-in-window
        ev = _read(sf_dir, "events", ["user_id", "ts"])
        first = rel.group_dedup_first(ev, "user_id", ["ts"], descending=False)
        hist = rel.calendar_window_aggregate(
            first, "ts", "month", {"new_users": ("count", "user_id")}
        ).to_pandas().sort_values("window_start", kind="mergesort").reset_index(drop=True)
        return pd.DataFrame({
            "month_start": hist["window_start"].astype("datetime64[us]").astype("int64"),
            "new_users": hist["new_users"].astype("int64"),
            "cumulative_users": hist["new_users"].cumsum().astype("int64"),
        })

    def r55_cube(sf_dir):
        # GROUP BY CUBE(returnflag, linestatus): all four grouping
        # sets from ONE data shuffle — coarser sets re-aggregate the
        # finest (6-row) result. Null keys rendered 'ALL' to keep the
        # column string-typed both sides
        li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
        out = rel.cube_aggregate(
            li, ["l_returnflag", "l_linestatus"], "l_quantity", alias="sum_qty"
        ).to_pandas()
        for c in ("l_returnflag", "l_linestatus"):
            out[c] = out[c].fillna("ALL")
        out["sum_qty"] = round_half_up(out["sum_qty"].to_numpy(), 4)
        return out.sort_values(
            ["l_returnflag", "l_linestatus"], kind="mergesort"
        ).reset_index(drop=True)

    def r56_set_ops(sf_dir):
        # INTERSECT / EXCEPT over distinct nation keys of customers vs
        # suppliers: one tagged union + presence-flag groupby (each
        # side pre-distincted per block by the combiner), set op
        # resolved from the two flags — never a pairwise join
        cust = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
            lambda t: pa.table({
                "k": t["c_nationkey"],
                "in_c": pa.array(np.ones(len(t), np.int64)),
                "in_s": pa.array(np.zeros(len(t), np.int64)),
            }),
            batch_format="pyarrow",
        )
        supp = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
            lambda t: pa.table({
                "k": t["s_nationkey"],
                "in_c": pa.array(np.zeros(len(t), np.int64)),
                "in_s": pa.array(np.ones(len(t), np.int64)),
            }),
            batch_format="pyarrow",
        )
        from ray.data.aggregate import Max

        flags = (
            cust.union(supp)
            .groupby("k")
            .aggregate(Max("in_c", alias_name="in_c"), Max("in_s", alias_name="in_s"))
            .to_pandas()
        )
        both = flags[(flags["in_c"] == 1) & (flags["in_s"] == 1)]["k"]
        only_c = flags[(flags["in_c"] == 1) & (flags["in_s"] == 0)]["k"]
        only_s = flags[(flags["in_c"] == 0) & (flags["in_s"] == 1)]["k"]
        out = pd.concat([
            pd.DataFrame({"op": "intersect", "nationkey": both}),
            pd.DataFrame({"op": "cust_except_supp", "nationkey": only_c}),
            pd.DataFrame({"op": "supp_except_cust", "nationkey": only_s}),
        ])
        return out.sort_values(["op", "nationkey"], kind="mergesort").reset_index(drop=True)

    def r57_anti_join(sf_dir):
        # NOT EXISTS anti-join: customers with no big-ticket order
        # (totalprice > 300k — predicate pushed into the scan). The
        # order-side key set is distinct-compressed per block before
        # the broadcast (bounded by customer cardinality); at cluster
        # scale the same shape hash-partitions both sides on custkey
        ok = rel.distinct(
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
                lambda t: t.filter(pc.greater(t["o_totalprice"], 300000.0)).select(
                    ["o_custkey"]
                ),
                batch_format="pyarrow",
            ),
            "o_custkey",
        )
        keys = np.sort(ok.to_pandas()["o_custkey"].to_numpy(dtype=np.int64))
        cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
        out = (
            rel.semi_join_ids(cust, "c_custkey", keys, keep=False)
            .to_pandas()
            .sort_values("c_custkey", kind="mergesort")
            .reset_index(drop=True)
        )
        out["c_acctbal"] = round_half_up(out["c_acctbal"].to_numpy())
        return out

    def r58_window_ranks(sf_dir):
        # SQL rank family completion: ntile(4) / percent_rank /
        # cume_dist per order-priority partition, unique (date, key)
        # ordering so tie assignment is deterministic both sides
        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice"])
        out = (
            rel.window_functions(
                od,
                "o_orderpriority",
                ["o_orderdate", "o_orderkey"],
                {
                    "rn": ("row_number",),
                    "nt4": ("ntile", 4),
                    "pr": ("percent_rank",),
                    "cd": ("cume_dist",),
                },
            )
            .to_pandas()
            .sort_values("o_orderkey", kind="mergesort")
            .reset_index(drop=True)
        )
        out["pr"] = round_half_up(out["pr"].to_numpy(), 6)
        out["cd"] = round_half_up(out["cd"].to_numpy(), 6)
        out["o_totalprice"] = round_half_up(out["o_totalprice"].to_numpy())
        return out[["o_orderkey", "o_orderpriority", "o_totalprice", "rn", "nt4", "pr", "cd"]]

    def t_soft_dedup(sf_dir):
        # SoftDeDup: instead of dropping duplicates, reweight — each
        # doc's sampling weight is 1 / multiplicity of its exact
        # content digest (the soft analog of R17's exact dedup; cf.
        # the SoftDedup data-reweighting literature). One shuffle of
        # (digest, doc_id) pairs; weights resolve in-group so no
        # digest->count table is ever broadcast or driver-held
        docs = _docs_with_near_dups(sf_dir)
        return dd.soft_dedup_weights(docs, "text", "doc_id")

    def s74_random_score(sf_dir):
        # ES function_score random_score with seed + field: the
        # deterministic per-doc draw is md5_number_upper("{seed}:{id}")
        # scaled to [0,1) — reproducible across runs and replayable in
        # SQL, unlike Lucene's internal hash. Top 20 over the lang='en'
        # filter clause (score from the function only, boost_mode
        # replace)
        from search_engine_ray.ops.sketch import _md5_upper64

        docs = _read(sf_dir, "documents", ["doc_id", "lang"])

        def _score(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["lang"], "en"))
            ids = t["doc_id"].to_pylist()
            h = _md5_upper64([f"42:{i}" for i in ids])
            return pa.table({
                "doc_id": t["doc_id"],
                "rand_score": pa.array(h.astype(np.float64) / 2.0**64),
            })

        out = rel.topk(
            docs.map_batches(_score, batch_format="pyarrow"),
            ["rand_score", "doc_id"], 20, descending=[True, False],
        ).to_pandas().reset_index(drop=True)
        out["rand_score"] = round_half_up(out["rand_score"].to_numpy(), 6)
        return out

    def pipe_tpch_q4(sf_dir):
        # TPC-H Q4 (adapted: EXISTS gate on returned lines instead of
        # the commit/receipt columns this synthetic lineitem lacks):
        # priority counts of orders with >=1 returned line. The
        # EXISTS compiles to distinct-returned-orderkeys (a combiner
        # distinct) hash-joined with orders — a semi-join where both
        # sides stay sharded; the priority count rides a second, tiny
        # combiner exchange
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
        returned = rel.distinct(
            li.map_batches(
                lambda t: t.filter(pc.equal(t["l_returnflag"], "R")).select(
                    ["l_orderkey"]
                ),
                batch_format="pyarrow",
            ),
            "l_orderkey",
        )
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
        j = rel.hash_join(
            orders, returned, on=["o_orderkey"], right_on=["l_orderkey"],
            num_partitions=8,
        )
        out = (
            rel.grouped_aggregate(
                j, ["o_orderpriority"], {"order_count": ("count", "o_orderkey")}
            )
            .to_pandas()
            .sort_values("o_orderpriority", kind="mergesort")
            .reset_index(drop=True)
        )
        out["order_count"] = out["order_count"].astype("int64")
        return out

    def pipe_tpch_q10(sf_dir):
        # TPC-H Q10: top-20 customers by returned-item revenue. Two
        # big-side shuffle joins (lineitem x orders, then x customer);
        # nation (25 rows) folds in as a broadcast map enrich — the
        # Q5 mixed-strategy shape at four tables
        li = _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        )

        def _li_f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["l_returnflag"], "R"))
            rev = pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            )
            return pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        j = rel.hash_join(
            li.map_batches(_li_f, batch_format="pyarrow"),
            orders, on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8,
        )
        # aggregate BEFORE touching customer: revenue by custkey is a
        # combiner exchange bounded by distinct custkeys; only the 20
        # winning keys ever need names, so the customer/nation lookups
        # are pushdown-filtered point reads, not a second big-side join
        agg = rel.grouped_aggregate(
            j, ["o_custkey"], {"revenue": ("sum", "rev")}
        ).to_pandas().rename(columns={"o_custkey": "c_custkey"})
        agg["revenue"] = round_half_up(agg["revenue"].to_numpy())
        agg = agg.sort_values(
            ["revenue", "c_custkey"], ascending=[False, True], kind="mergesort"
        ).head(20).reset_index(drop=True)
        import pyarrow.dataset as pads

        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name", "c_nationkey"],
            filters=pads.field("c_custkey").isin(agg["c_custkey"].tolist()),
        ).to_pandas()
        nat = pq.read_table(
            os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
        ).to_pandas()
        cust["n_name"] = cust["c_nationkey"].map(
            dict(zip(nat["n_nationkey"], nat["n_name"]))
        )
        out = agg.merge(cust[["c_custkey", "c_name", "n_name"]], on="c_custkey")
        return out[["c_custkey", "c_name", "n_name", "revenue"]]

    def pipe_tpch_q14(sf_dir):
        # TPC-H Q14 (promotion effect): % of revenue from PROMO parts.
        # part is the canonical broadcast dimension — partkey->is_promo
        # ships once via ray.put; lineitem streams through one masked
        # two-moment partial, the ratio folds on one row
        pt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
        )
        promo = np.sort(
            pt.filter(pc.equal(pt["p_type"], "PROMO"))["p_partkey"].to_numpy()
        )
        import ray as _ray

        pref = _ray.put(promo)
        li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

        def _partial(t: pa.Table) -> pa.Table:
            pk = _ray.get(pref)
            keys = t["l_partkey"].to_numpy()
            pos = np.clip(np.searchsorted(pk, keys), 0, max(pk.size - 1, 0))
            is_promo = pk.size > 0
            m = (pk[pos] == keys) if is_promo else np.zeros(len(keys), bool)
            rev = (
                t["l_extendedprice"].to_numpy()
                * (1.0 - t["l_discount"].to_numpy())
            )
            return pa.table({
                "promo_rev": pa.array([float(rev[m].sum())]),
                "total_rev": pa.array([float(rev.sum())]),
            })

        from ray.data.aggregate import Sum

        tot = li.map_batches(_partial, batch_format="pyarrow").aggregate(
            Sum("promo_rev", alias_name="p"), Sum("total_rev", alias_name="t")
        )
        return pd.DataFrame({
            "promo_revenue_pct": [
                float(round_half_up(100.0 * tot["p"] / tot["t"], 4))
            ]
        })

    def s75_combined_fields(sf_dir):
        # ES combined_fields query (BM25F): text (w=1) and source (w=2)
        # score as ONE synthetic field — per-term tf is the weighted
        # sum of per-field tfs, doc length the weighted field lengths,
        # df the any-field doc count. Two streaming passes: a one-row
        # moments partial (N, Σdl, per-term df), then broadcast stats
        # score every doc vectorized and a bounded top-k
        terms = ["vector", "src3"]
        W_TEXT, W_SRC = 1.0, 2.0
        docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

        def _tfs(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
            from search_engine_ray.ops.text import _flat_tokens

            flat, parents, n = _flat_tokens(t["text"])
            toks = flat.to_numpy(zero_copy_only=False)
            dl_text = np.bincount(parents, minlength=n).astype(np.float64)
            src = t["source"].to_numpy(zero_copy_only=False)
            tf = np.zeros((len(terms), n), np.float64)
            for i, term in enumerate(terms):
                tf_text = np.bincount(
                    parents[toks == term], minlength=n
                ).astype(np.float64)
                tf[i] = W_TEXT * tf_text + W_SRC * (src == term)
            dl = W_TEXT * dl_text + W_SRC * 1.0
            return tf, dl, n

        def _moments(t: pa.Table) -> pa.Table:
            tf, dl, n = _tfs(t)
            cols = {
                "n": pa.array([n], pa.int64()),
                "sum_dl": pa.array([float(dl.sum())]),
            }
            for i in range(len(terms)):
                cols[f"df{i}"] = pa.array([int((tf[i] > 0).sum())], pa.int64())
            return pa.table(cols)

        from ray.data.aggregate import Sum

        st = docs.map_batches(_moments, batch_format="pyarrow").aggregate(
            Sum("n", alias_name="n"), Sum("sum_dl", alias_name="sum_dl"),
            *[Sum(f"df{i}", alias_name=f"df{i}") for i in range(len(terms))],
        )
        n_docs, avgdl = float(st["n"]), st["sum_dl"] / float(st["n"])
        idf = np.array([
            math.log(1.0 + (n_docs - st[f"df{i}"] + 0.5) / (st[f"df{i}"] + 0.5))
            for i in range(len(terms))
        ])

        def _score(t: pa.Table) -> pa.Table:
            tf, dl, n = _tfs(t)
            denom_tail = 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
            score = np.zeros(n, np.float64)
            for i in range(len(terms)):
                with np.errstate(invalid="ignore"):
                    contrib = idf[i] * tf[i] * 2.2 / (tf[i] + denom_tail)
                score += np.where(tf[i] > 0, contrib, 0.0)
            keep = (tf > 0).any(axis=0)
            return pa.table({
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "raw": pa.array(score[keep]),
            })

        top = rel.topk(
            docs.map_batches(_score, batch_format="pyarrow"),
            ["raw", "doc_id"], 10, descending=[True, False],
        ).to_pandas().reset_index(drop=True)
        return pd.DataFrame({
            "doc_id": top["doc_id"],
            "score": round_half_up(top["raw"].to_numpy()),
        })

    def t_ccnet_buckets(sf_dir):
        # CCNet head/middle/tail buckets: per-language perplexity
        # tertiles of the interpolated-bigram-LM score. Thresholds are
        # per-(lang, score) HISTOGRAM quantiles (scores are rounded to
        # 4 decimals, so distinct values are bounded and the quantile
        # shuffle is a combiner) broadcast back over the scored stream
        # — no language's documents ever co-locate in one task, unlike
        # an ntile window
        docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        scored = txt.bigram_logprob(docs, "text").drop_columns(["text"]).materialize()
        q = sk.grouped_quantiles(
            scored, "lang", "bigram_nlp", [1.0 / 3.0, 2.0 / 3.0]
        ).to_pandas()
        th = {}
        for lang, grp in q.groupby("lang"):
            g = grp.sort_values("q")
            th[lang] = (float(g["value"].iloc[0]), float(g["value"].iloc[1]))
        import ray as _ray

        tref = _ray.put(th)

        def _bucket(t: pa.Table) -> pa.Table:
            thr = _ray.get(tref)
            langs = t["lang"].to_numpy(zero_copy_only=False)
            nlp = t["bigram_nlp"].to_numpy()
            q1 = np.array([thr[g][0] for g in langs])
            q2 = np.array([thr[g][1] for g in langs])
            bucket = np.where(nlp <= q1, "head", np.where(nlp <= q2, "middle", "tail"))
            return pa.table({
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "bigram_nlp": t["bigram_nlp"],
                "bucket": pa.array(bucket.astype(object), pa.string()),
            })

        return (
            scored.map_batches(_bucket, batch_format="pyarrow")
            .to_pandas()
            .sort_values("doc_id", kind="mergesort")
            .reset_index(drop=True)
        )

    def r59_geo_bounds(sf_dir):
        # ES geo_bounds + geo_centroid per nation over the derived
        # deterministic coordinates: per-block (nation: n, Σlat, Σlon,
        # min/max lat/lon) partials, one tiny groupby exchange
        from search_engine_ray.ops.sketch import _md5_upper64

        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

        def _partial(t: pa.Table) -> pa.Table:
            keys = t["c_custkey"].to_numpy(zero_copy_only=False)
            h1 = _md5_upper64([str(k) for k in keys]).astype(np.float64)
            h2 = _md5_upper64([f"{k}:lon" for k in keys]).astype(np.float64)
            two64 = 18446744073709551616.0
            df = pd.DataFrame({
                "nation": t["c_nationkey"].to_numpy(zero_copy_only=False),
                "lat": (h1 / two64) * 180.0 - 90.0,
                "lon": (h2 / two64) * 360.0 - 180.0,
            })
            g = df.groupby("nation", as_index=False).agg(
                n=("lat", "size"), slat=("lat", "sum"), slon=("lon", "sum"),
                min_lat=("lat", "min"), max_lat=("lat", "max"),
                min_lon=("lon", "min"), max_lon=("lon", "max"),
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Max, Min, Sum

        agg = (
            cust.map_batches(_partial, batch_format="pyarrow")
            .groupby("nation")
            .aggregate(
                Sum("n", alias_name="n"), Sum("slat", alias_name="slat"),
                Sum("slon", alias_name="slon"),
                Min("min_lat", alias_name="min_lat"), Max("max_lat", alias_name="max_lat"),
                Min("min_lon", alias_name="min_lon"), Max("max_lon", alias_name="max_lon"),
            )
            .to_pandas()
            .sort_values("nation", kind="mergesort")
            .reset_index(drop=True)
        )
        out = pd.DataFrame({"nation": agg["nation"], "n": agg["n"].astype("int64")})
        for c in ("min_lat", "max_lat", "min_lon", "max_lon"):
            out[c] = round_half_up(agg[c].to_numpy(), 6)
        out["centroid_lat"] = round_half_up(
            (agg["slat"] / agg["n"]).to_numpy(), 6
        )
        out["centroid_lon"] = round_half_up(
            (agg["slon"] / agg["n"]).to_numpy(), 6
        )
        return out

    def r60_rate(sf_dir):
        # ES rate aggregation (unit=day) inside a WEEK date_histogram
        # (the 30-day corpus gives 5-6 weekly buckets): weekly
        # sum(value) / 7 — ES normalizes by the full interval length
        # regardless of partial edge weeks. One calendar-window
        # combiner, normalization on the bucket table
        ev = _read(sf_dir, "events", ["ts", "value"])
        m = rel.calendar_window_aggregate(
            ev, "ts", "week", {"s": ("sum", "value")}
        ).to_pandas().sort_values("window_start", kind="mergesort").reset_index(drop=True)
        return pd.DataFrame({
            "week_start": m["window_start"].astype("datetime64[us]").astype("int64"),
            "sum_value": round_half_up(m["s"].to_numpy(), 4),
            "rate_per_day": round_half_up(m["s"].to_numpy() / 7.0, 4),
        })

    def r61_bucket_script(sf_dir):
        # ES bucket_script pipeline agg: per month, purchase revenue
        # over click count — both metrics are masked partials of ONE
        # pass (agg FILTER in SQL), the script runs on the bucket table
        ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

        def _partial(t: pa.Table) -> pa.Table:
            m = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us"))
            et = t["event_type"].to_numpy(zero_copy_only=False)
            v = t["value"].to_numpy(zero_copy_only=False)
            df = pd.DataFrame({
                "month": m.to_numpy(zero_copy_only=False),
                "pv": np.where(et == "purchase", v, 0.0),
                "ck": (et == "click").astype(np.int64),
            })
            g = df.groupby("month", as_index=False).agg(
                pv=("pv", "sum"), ck=("ck", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Sum

        agg = (
            ev.map_batches(_partial, batch_format="pyarrow")
            .groupby("month")
            .aggregate(Sum("pv", alias_name="pv"), Sum("ck", alias_name="ck"))
            .to_pandas()
            .sort_values("month", kind="mergesort")
            .reset_index(drop=True)
        )
        agg = agg[agg["ck"] > 0].reset_index(drop=True)
        return pd.DataFrame({
            "day_start": agg["month"].astype("datetime64[us]").astype("int64"),
            "purchase_value": round_half_up(agg["pv"].to_numpy(), 4),
            "clicks": agg["ck"].astype("int64"),
            "value_per_click": round_half_up(
                (agg["pv"] / agg["ck"]).to_numpy(), 4
            ),
        })

    def r62_stats_bucket(sf_dir):
        # ES sibling pipeline aggs (stats_bucket = min_/max_/avg_/
        # sum_bucket in one): five-number stats OVER the monthly-sum
        # bucket series; the second-level agg folds on the bucket table
        m = _month_value_sums(sf_dir)
        s = m["s"].to_numpy()
        return pd.DataFrame({
            "n_buckets": pd.array([len(m)], dtype="int64"),
            "min_bucket": [float(round_half_up(s.min(), 4))],
            "max_bucket": [float(round_half_up(s.max(), 4))],
            "avg_bucket": [float(round_half_up(s.sum() / len(s), 4))],
            "sum_buckets": [float(round_half_up(s.sum(), 4))],
        })

    def e18_schema_merge(sf_dir):
        # schema-evolution union (the E-ring "new extract version adds
        # a column" case): v1 rows carry lang, v2 rows carry source —
        # the union null-fills each side to the merged schema inside
        # map_batches (no driver materialization), downstream combiner
        # counts per-version rows and per-column nulls
        docs_a = _read(sf_dir, "documents", ["doc_id", "lang"])
        docs_b = _read(sf_dir, "documents", ["doc_id", "source"])

        def _v1(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "source": pa.nulls(len(t), pa.string()),
                "v": pa.array(np.full(len(t), 1, np.int64)),
            })

        def _v2(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": pc.add(t["doc_id"], 1_000_000),
                "lang": pa.nulls(len(t), pa.string()),
                "source": t["source"],
                "v": pa.array(np.full(len(t), 2, np.int64)),
            })

        u = docs_a.map_batches(_v1, batch_format="pyarrow").union(
            docs_b.map_batches(_v2, batch_format="pyarrow")
        )

        def _partial(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "v": t["v"].to_numpy(),
                "null_lang": pc.is_null(t["lang"]).to_numpy(zero_copy_only=False).astype(np.int64),
                "null_source": pc.is_null(t["source"]).to_numpy(zero_copy_only=False).astype(np.int64),
            })
            g = df.groupby("v", as_index=False).agg(
                n=("null_lang", "size"), null_lang=("null_lang", "sum"),
                null_source=("null_source", "sum"),
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Sum

        out = (
            u.map_batches(_partial, batch_format="pyarrow")
            .groupby("v")
            .aggregate(
                Sum("n", alias_name="n"), Sum("null_lang", alias_name="null_lang"),
                Sum("null_source", alias_name="null_source"),
            )
            .to_pandas()
            .sort_values("v", kind="mergesort")
            .reset_index(drop=True)
        )
        for c in ("n", "null_lang", "null_source"):
            out[c] = out[c].astype("int64")
        return out

    def s76_ids(sf_dir):
        # ES ids query: fetch a fixed id set (constant score 1.0) —
        # the IN predicate pushes into the parquet scan so only
        # matching row groups leave storage
        ids = [3, 7, 11, 19, 42]
        import pyarrow.dataset as pads
        import ray.data as rd

        expr = pads.field("doc_id").isin(ids)
        ds = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "n_chars"],
            filter=expr,
        )
        out = ds.to_pandas().sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        out["score"] = 1.0
        return out

    def s77_most_fields(sf_dir):
        # ES multi_match most_fields (contrast with s75 combined_fields:
        # per-field BM25 scores SUMMED, each field keeping its own
        # df/length norms, vs one fused synthetic field). Same two-pass
        # shape: one-row per-field moment partials, broadcast stats,
        # vectorized scoring, bounded top-k
        terms = ["vector", "src3"]
        docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

        def _tfs(t: pa.Table):
            from search_engine_ray.ops.text import _flat_tokens

            flat, parents, n = _flat_tokens(t["text"])
            toks = flat.to_numpy(zero_copy_only=False)
            dl_text = np.bincount(parents, minlength=n).astype(np.float64)
            src = t["source"].to_numpy(zero_copy_only=False)
            tf_t = np.zeros((len(terms), n), np.float64)
            tf_s = np.zeros((len(terms), n), np.float64)
            for i, term in enumerate(terms):
                tf_t[i] = np.bincount(parents[toks == term], minlength=n)
                tf_s[i] = (src == term).astype(np.float64)
            return tf_t, tf_s, dl_text, n

        def _moments(t: pa.Table) -> pa.Table:
            tf_t, tf_s, dl_text, n = _tfs(t)
            cols = {
                "n": pa.array([n], pa.int64()),
                "sum_dl_t": pa.array([float(dl_text.sum())]),
            }
            for i in range(len(terms)):
                cols[f"dft{i}"] = pa.array([int((tf_t[i] > 0).sum())], pa.int64())
                cols[f"dfs{i}"] = pa.array([int((tf_s[i] > 0).sum())], pa.int64())
            return pa.table(cols)

        from ray.data.aggregate import Sum

        aggs = [Sum("n", alias_name="n"), Sum("sum_dl_t", alias_name="sum_dl_t")]
        for i in range(len(terms)):
            aggs += [Sum(f"dft{i}", alias_name=f"dft{i}"), Sum(f"dfs{i}", alias_name=f"dfs{i}")]
        st = docs.map_batches(_moments, batch_format="pyarrow").aggregate(*aggs)
        n_docs = float(st["n"])
        avgdl_t = st["sum_dl_t"] / n_docs

        def _idf(df):
            return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

        idf_t = np.array([_idf(st[f"dft{i}"]) for i in range(len(terms))])
        idf_s = np.array([_idf(st[f"dfs{i}"]) for i in range(len(terms))])

        def _score(t: pa.Table) -> pa.Table:
            tf_t, tf_s, dl_text, n = _tfs(t)
            denom_t = 1.2 * (1.0 - 0.75 + 0.75 * dl_text / avgdl_t)
            score = np.zeros(n, np.float64)
            hit = np.zeros(n, bool)
            for i in range(len(terms)):
                m_t = tf_t[i] > 0
                score += np.where(
                    m_t, idf_t[i] * tf_t[i] * 2.2 / (tf_t[i] + denom_t), 0.0
                )
                # source: single-token field, dl = avgdl = 1 -> norm 1
                m_s = tf_s[i] > 0
                score += np.where(
                    m_s, idf_s[i] * tf_s[i] * 2.2 / (tf_s[i] + 1.2), 0.0
                )
                hit |= m_t | m_s
            return pa.table({
                "doc_id": t["doc_id"].filter(pa.array(hit)),
                "raw": pa.array(score[hit]),
            })

        top = rel.topk(
            docs.map_batches(_score, batch_format="pyarrow"),
            ["raw", "doc_id"], 10, descending=[True, False],
        ).to_pandas().reset_index(drop=True)
        return pd.DataFrame({
            "doc_id": top["doc_id"],
            "score": round_half_up(top["raw"].to_numpy()),
        })

    def s78_intervals(sf_dir):
        # ES intervals query, all_of(ordered, max_gaps=6) over
        # [hash, value, table]: 'value' must sit STRICTLY between a
        # 'hash'..'table' pair with total gaps <= 6 (gap counting, not
        # Lucene slop edit-distance); ptf counts qualifying
        # (start, end) pairs, one BM25 clause, served from the scorer
        # actor pool like the span family (span_mode="interval")
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        return phrase_topk(
            eng, "text", ["hash", "table"], window=8,
            little="value", span_mode="interval", k=10,
        )

    def s79_intervals_any(sf_dir):
        # ES intervals any_of as the middle slot: all_of(ordered,
        # max_gaps=4, [hash, any_of(value, part), table]) — the
        # alternatives' occurrence keys merge before the strict-
        # interior test (unique by construction: one position holds
        # one token)
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        return phrase_topk(
            eng, "text", ["hash", "table"], window=6,
            little=("value", "part"), span_mode="interval", k=10,
        )

    def s80_span_multi(sf_dir):
        # ES span_multi: a prefix multi-term wrapped as a span — any
        # dictionary expansion of 's*' (6 terms at this corpus) can
        # open an ordered span closed by 'table' within 2 positions;
        # the expansion rides the same merged-occurrence-key path as
        # span_or, capped + asserted (the s53 lesson)
        from search_engine_ray.query.phrase import phrase_topk

        eng = _doc_engine(sf_dir)
        _ensure_positions(eng, sf_dir)
        return phrase_topk(
            eng, "text", ["table"], window=2,
            first_prefix="s", k=10,
        )

    def t_temperature_mix(sf_dir):
        # temperature-balanced multilingual sampling (XLM-R mixing,
        # alpha=0.5): per-lang keep-rates from ONE count exchange,
        # tail languages up-sampled toward count^alpha shares, applied
        # as a deterministic md5-threshold streaming filter
        docs = _read(sf_dir, "documents", ["doc_id", "lang"])
        out = (
            sk.temperature_mix(docs, "lang", "doc_id", target_total=200, alpha=0.5)
            .to_pandas()
            .sort_values("doc_id", kind="mergesort")
            .reset_index(drop=True)
        )
        return out

    def r63_unpivot(sf_dir):
        # SQL UNPIVOT (melt) — the inverse of r28's pivot: the wide
        # per-cohort count table back to (cohort, event_type, n) long
        # form. Melt is row-local (one map_batches, no exchange beyond
        # the pivot's own combiner); zero-count cells drop like
        # UNPIVOT's default NULL exclusion
        ds = _read(sf_dir, "events", ["user_id", "event_type"])
        cohort = ds.map_batches(
            lambda t: pa.table({"cohort": pc.cast(
                pc.bit_wise_and(t["user_id"], 7), pa.int64()),
                "event_type": t["event_type"]}),
            batch_format="pyarrow",
        )
        types = ["click", "view", "purchase", "signup", "error"]
        wide = rel.pivot_aggregate(cohort, "cohort", "event_type", types)

        def _melt(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            long = df.melt(
                id_vars=["cohort"], value_vars=types,
                var_name="event_type", value_name="n",
            )
            long = long[long["n"] > 0]
            return pa.Table.from_pandas(long, preserve_index=False)

        out = (
            wide.map_batches(_melt, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["cohort", "event_type"], kind="mergesort")
            .reset_index(drop=True)
        )
        out["n"] = out["n"].astype("int64")
        return out

    def s81_sig_chi2(sf_dir):
        # ES significant_terms with the chi_square heuristic (classic
        # 2x2 contingency, Manning IR 13.5.2; the JLH entry is s31) —
        # same combiner shuffle, different scorer
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return txt.significant_terms(
            docs, "vector", k=10, min_doc_count=2, heuristic="chi_square"
        )

    def r64_rolling_window(sf_dir):
        # SQL window FRAME (ROWS 6 PRECEDING AND CURRENT ROW): 7-row
        # rolling sum + mean of value per event_type partition ordered
        # by (ts, event_id) — cumsum-difference kernel, O(n) per
        # partition, no per-row frame scan
        ev = _read(sf_dir, "events", ["event_id", "event_type", "ts", "value"])
        out = (
            rel.window_functions(
                ev, "event_type", ["ts", "event_id"],
                {
                    "rsum7": ("rolling_sum", "value", 7),
                    "rmean7": ("rolling_mean", "value", 7),
                },
            )
            .to_pandas()
            .sort_values("event_id", kind="mergesort")
            .reset_index(drop=True)
        )
        out["rsum7"] = round_half_up(out["rsum7"].to_numpy(), 4)
        out["rmean7"] = round_half_up(out["rmean7"].to_numpy(), 4)
        out["value"] = round_half_up(out["value"].to_numpy(), 4)
        return out[["event_id", "event_type", "value", "rsum7", "rmean7"]]

    def e19_reindex_alias(sf_dir):
        # ES zero-downtime reindex: clients address an ALIAS; a new
        # physical index (here: the corpus minus lang='zh', the
        # "mapping change") builds beside the live one, then one
        # atomic alias flip (temp-write + rename, never torn) cuts
        # searches over. Pre-flip results must match the full-corpus
        # engine; the returned post-flip page is BM25 over the
        # filtered corpus, SQL-checked
        from search_engine_ray.config import DOCUMENTS_CONFIG
        from search_engine_ray.index import build_index
        from search_engine_ray.index.alias import resolve_alias, set_alias
        from search_engine_ray.query import SearchEngine

        src = os.path.join(sf_dir, "documents.parquet")
        tag = sf_dir.strip("/").replace("/", "_")
        base = f"/tmp/ser_idx_cache/{tag}/alias_{int(os.path.getmtime(src))}"
        v2_dir = os.path.join(base, "v2")
        if not os.path.exists(os.path.join(v2_dir, "manifest.json")):
            os.makedirs(base, exist_ok=True)
            filt = os.path.join(base, "docs_nozh.parquet")
            t = pq.read_table(src)
            pq.write_table(t.filter(pc.not_equal(t["lang"], "zh")), filt)
            build_index(filt, v2_dir, DOCUMENTS_CONFIG, sha_col="text")
        v1_dir = _doc_engine(sf_dir).dirs[0]
        alias = os.path.join(base, "alias.json")
        set_alias(alias, v1_dir)
        q = Compound(must=(Term("text", "vector"),))
        pre = SearchEngine(resolve_alias(alias), DOCUMENTS_CONFIG).search(
            q, k=10, with_metadata=False
        )
        expected = _bm25_query(sf_dir, q)
        assert pre.hits["doc_id"].tolist() == expected["doc_id"].tolist()
        set_alias(alias, v2_dir)  # the atomic flip
        post = SearchEngine(resolve_alias(alias), DOCUMENTS_CONFIG).search(
            q, k=10, with_metadata=False
        )
        return pd.DataFrame({
            "doc_id": post.hits["doc_id"].to_numpy(),
            "score": round_half_up(post.hits["score"].to_numpy()),
        })

    def r65_terms_by_subagg(sf_dir):
        # ES terms aggregation ordered by a SUB-aggregation (order:
        # {avg_chars: desc}, size 3): bucket metrics ride one
        # raw-moment combiner; the ordering runs on the bucket table —
        # rounded avg + lang tiebreak so the cut is fp-parity-safe
        docs = _read(sf_dir, "documents", ["lang", "n_chars"])

        def _partial(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "lang": t["lang"].to_numpy(zero_copy_only=False),
                "s": t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64),
            })
            g = df.groupby("lang", as_index=False).agg(n=("s", "size"), s=("s", "sum"))
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Sum

        agg = (
            docs.map_batches(_partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
            .to_pandas()
        )
        agg["avg_chars"] = round_half_up((agg["s"] / agg["n"]).to_numpy(), 4)
        agg = agg.sort_values(
            ["avg_chars", "lang"], ascending=[False, True], kind="mergesort"
        ).head(3).reset_index(drop=True)
        return pd.DataFrame({
            "lang": agg["lang"],
            "doc_count": agg["n"].astype("int64"),
            "avg_chars": agg["avg_chars"],
        })

    def r66_join_auto(sf_dir):
        # cost-based join strategy driver-exercised: orders x customer
        # through join_auto — at this scale the customer side fits the
        # 64 MB broadcast gate, so the plan is shuffle-free; the same
        # call at fact-fact sizes falls back to the hash-partitioned
        # shuffle join (both paths result-equal under pytest)
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        j = rel.join_auto(orders, cust, on=["o_custkey"], right_on=["c_custkey"])
        agg = (
            rel.grouped_aggregate(
                j, ["c_mktsegment"], {"n": ("count", "o_orderkey"),
                                      "revenue": ("sum", "o_totalprice")}
            )
            .to_pandas()
            .sort_values("c_mktsegment", kind="mergesort")
            .reset_index(drop=True)
        )
        agg["n"] = agg["n"].astype("int64")
        agg["revenue"] = round_half_up(agg["revenue"].to_numpy())
        return agg

    def t_embed_outliers(sf_dir):
        # embedding outlier removal (the CLIP-filtering curation
        # stage): vectors whose cosine to the corpus centroid falls
        # below tau are flagged. One Σvec combiner builds the centroid
        # (dim-sized partials, never vectors, on the driver); the
        # centroid broadcasts and the flagging is a streaming filter
        from search_engine_ray.ops.ann import _to_matrix

        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

        def _sums(t: pa.Table) -> pa.Table:
            m = _to_matrix(t["embedding"], 64)
            return pa.table({
                "s": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
                "n": pa.array([len(t)], pa.int64()),
            })

        parts = emb.map_batches(_sums, batch_format="pyarrow").to_pandas()
        total = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
        cent = total / float(parts["n"].sum())
        import ray as _ray

        cref = _ray.put(cent)
        TAU = 0.05

        def _flag(t: pa.Table) -> pa.Table:
            c = _ray.get(cref)
            m = _to_matrix(t["embedding"], 64)
            cos = (m @ c) / (
                np.sqrt((m * m).sum(axis=1)) * math.sqrt(float(c @ c))
            )
            keep = cos < TAU
            return pa.table({
                "vec_id": t["vec_id"].filter(pa.array(keep)),
                "cos_centroid": pa.array(round_half_up(cos[keep], 4)),
            })

        return (
            emb.map_batches(_flag, batch_format="pyarrow")
            .to_pandas()
            .sort_values("vec_id", kind="mergesort")
            .reset_index(drop=True)
        )

    def ann_maxsim(sf_dir):
        # ColBERT-style late interaction (MaxSim): docs are 4-vector
        # groups (vec_id // 4), queries the 3 broadcast query vectors;
        # score(doc) = sum over queries of max over the doc's vectors
        # of cosine. Per-vector cosines reduce to per-group maxes in a
        # map-side-combined groupby — the exchange carries one row per
        # (group, block); the sum of maxes folds on the group table
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        from search_engine_ray.ops.ann import _to_matrix

        qt = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"],
            filters=[("vec_id", "in", [0, 1, 2])],
        )
        qm = _to_matrix(qt["embedding"], 64)
        qn = qm / np.sqrt((qm * qm).sum(axis=1))[:, None]
        import ray as _ray

        qref = _ray.put(qn)

        def _cos(t: pa.Table) -> pa.Table:
            q = _ray.get(qref)
            m = _to_matrix(t["embedding"], 64)
            mn = m / np.sqrt((m * m).sum(axis=1))[:, None]
            cos = mn @ q.T  # (n, 3)
            g = t["vec_id"].to_numpy() // 4
            return pa.table({
                "g": pa.array(g),
                "c0": pa.array(cos[:, 0]), "c1": pa.array(cos[:, 1]),
                "c2": pa.array(cos[:, 2]),
            })

        agg = rel.grouped_aggregate(
            emb.map_batches(_cos, batch_format="pyarrow"),
            ["g"],
            {"m0": ("max", "c0"), "m1": ("max", "c1"), "m2": ("max", "c2")},
        ).to_pandas()
        agg["score"] = round_half_up(
            (agg["m0"] + agg["m1"] + agg["m2"]).to_numpy(), 4
        )
        agg = agg.sort_values(
            ["score", "g"], ascending=[False, True], kind="mergesort"
        ).head(5).reset_index(drop=True)
        return pd.DataFrame({"g": agg["g"].astype("int64"), "score": agg["score"]})

    def pipe_tpch_q13(sf_dir):
        # TPC-H Q13 (customer order-count distribution). The LEFT
        # JOIN never materializes: per-custkey order counts are a
        # combiner exchange bounded by distinct custkeys, the count
        # distribution a second (tiny) exchange, and the zero-order
        # bucket folds in as ONE scalar — total customers minus
        # custkeys seen — exact under the o_custkey FK
        orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

        def _f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(t["o_orderpriority"], "3-MEDIUM"))
            return t.select(["o_custkey"])

        counts = rel.grouped_aggregate(
            orders.map_batches(_f, batch_format="pyarrow"),
            ["o_custkey"], {"c_count": ("count", "o_custkey")},
        )
        dist = (
            rel.grouped_aggregate(counts, ["c_count"], {"custdist": ("count", "c_count")})
            .to_pandas()
        )
        n_cust = pq.read_metadata(os.path.join(sf_dir, "customer.parquet")).num_rows
        zero = int(n_cust) - int(dist["custdist"].sum())
        if zero > 0:
            dist = pd.concat(
                [dist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
                ignore_index=True,
            )
        dist["c_count"] = dist["c_count"].astype("int64")
        dist["custdist"] = dist["custdist"].astype("int64")
        return dist.sort_values(
            ["custdist", "c_count"], ascending=[False, False], kind="mergesort"
        ).reset_index(drop=True)

    def pipe_tpch_q15(sf_dir):
        # TPC-H Q15 (top supplier): quarterly revenue per supplier is
        # one combiner exchange bounded by supplier count; the max
        # resolves on that small table and names are point reads.
        # Revenue rounds to 4dp BEFORE the max-equality compare on
        # both sides so fp association can't split a tie
        li = _read(
            sf_dir, "lineitem",
            ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        lo, hi = np.datetime64("1996-01-01"), np.datetime64("1996-04-01")

        def _f(t: pa.Table) -> pa.Table:
            d = t["l_shipdate"].to_numpy()
            m = (d >= lo) & (d < hi)
            rev = t["l_extendedprice"].to_numpy() * (1.0 - t["l_discount"].to_numpy())
            return pa.table({
                "l_suppkey": pa.array(t["l_suppkey"].to_numpy()[m]),
                "rev": pa.array(rev[m]),
            })

        agg = rel.grouped_aggregate(
            li.map_batches(_f, batch_format="pyarrow"),
            ["l_suppkey"], {"total_revenue": ("sum", "rev")},
        ).to_pandas()
        agg["total_revenue"] = round_half_up(agg["total_revenue"].to_numpy())
        best = agg[agg["total_revenue"] == agg["total_revenue"].max()].rename(
            columns={"l_suppkey": "s_suppkey"}
        )
        sup = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
        ).to_pandas()
        out = best.merge(sup, on="s_suppkey")
        return (
            out[["s_suppkey", "s_name", "total_revenue"]]
            .sort_values("s_suppkey", kind="mergesort")
            .reset_index(drop=True)
        )

    def pipe_tpch_q17(sf_dir):
        # TPC-H Q17 (small-quantity revenue): one brand's partkeys
        # broadcast once (sorted array + searchsorted probe); per-part
        # avg qty is a combiner exchange bounded by the brand's parts;
        # the avg map broadcasts back and the final fold is a masked
        # one-row-per-batch partial. The < threshold rounds to 6dp on
        # both sides so a 1-ulp avg difference can't flip a compare
        pt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
        )
        keys = np.sort(
            pt.filter(pc.equal(pt["p_brand"], "Brand#13"))["p_partkey"].to_numpy()
        )
        import ray as _ray

        kref = _ray.put(keys)
        li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

        def _sub(t: pa.Table) -> pa.Table:
            pk = _ray.get(kref)
            k = t["l_partkey"].to_numpy()
            pos = np.clip(np.searchsorted(pk, k), 0, max(pk.size - 1, 0))
            m = (pk[pos] == k) if pk.size else np.zeros(len(k), bool)
            return pa.table({
                "l_partkey": pa.array(k[m]),
                "l_quantity": pa.array(t["l_quantity"].to_numpy()[m]),
                "l_extendedprice": pa.array(t["l_extendedprice"].to_numpy()[m]),
            })

        sub = li.map_batches(_sub, batch_format="pyarrow")
        avg = rel.grouped_aggregate(
            sub, ["l_partkey"], {"avg_qty": ("mean", "l_quantity")}
        ).to_pandas()
        ak = np.sort(avg["l_partkey"].to_numpy().astype(np.int64))
        av = avg.set_index("l_partkey")["avg_qty"].loc[ak].to_numpy()
        thr = round_half_up(0.2 * av, 6)
        aref = _ray.put((ak, thr))

        def _rev(t: pa.Table) -> pa.Table:
            sk, sthr = _ray.get(aref)
            k = t["l_partkey"].to_numpy()
            pos = np.searchsorted(sk, k)
            m = t["l_quantity"].to_numpy() < sthr[pos]
            return pa.table(
                {"s": pa.array([float(t["l_extendedprice"].to_numpy()[m].sum())])}
            )

        from ray.data.aggregate import Sum

        tot = sub.map_batches(_rev, batch_format="pyarrow").aggregate(
            Sum("s", alias_name="s")
        )
        return pd.DataFrame(
            {"avg_yearly": [float(round_half_up(float(tot["s"]) / 7.0))]}
        )

    def pipe_tpch_q18(sf_dir):
        # TPC-H Q18 (large-volume orders): per-order qty sum is the
        # combiner exchange (bounded by order count, qty sums of
        # integer-valued doubles are fp-exact); survivors of the >180
        # gate hash-join back to orders sharded, the top-100 rides the
        # bounded partial-topk, and customer names are point reads for
        # the 100 winners only
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        sums = rel.grouped_aggregate(
            li, ["l_orderkey"], {"sum_qty": ("sum", "l_quantity")}
        )

        def _gate(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater(t["sum_qty"], 180.0))

        big = sums.map_batches(_gate, batch_format="pyarrow")
        orders = _read(
            sf_dir, "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        j = rel.hash_join(
            orders, big, on=["o_orderkey"], right_on=["l_orderkey"], num_partitions=8
        )
        top = rel.topk(
            j, ["o_totalprice", "o_orderdate", "o_orderkey"], 100,
            descending=[True, False, False],
        ).to_pandas()
        import pyarrow.dataset as pads

        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name"],
            filters=pads.field("c_custkey").isin(top["o_custkey"].tolist()),
        ).to_pandas()
        out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
        out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]").astype("int64")
        out["sum_qty"] = out["sum_qty"].astype("int64")
        out = out.sort_values(
            ["o_totalprice", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True], kind="mergesort",
        ).reset_index(drop=True)
        return out[
            ["c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]
        ]

    def pipe_tpch_q22(sf_dir):
        # TPC-H Q22 (global-sales-opportunity), adapted to this
        # schema: nationkey stands in for the phone country code and
        # the anti-join gate is "no URGENT orders" (every synthetic
        # customer has orders, so the literal NOT EXISTS is vacuous).
        # Urgent custkeys reduce to a combiner distinct; the anti join
        # is a left_outer hash join + null filter — both sides stay
        # sharded; the acctbal average folds from one two-moment pass
        codes = [1, 3, 5, 7, 9, 11, 13]
        cust = _read(
            sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
        )

        def _in_codes(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.is_in(t["c_nationkey"], value_set=pa.array(codes, pa.int32()))
            )

        pool = cust.map_batches(_in_codes, batch_format="pyarrow")

        def _moments(t: pa.Table) -> pa.Table:
            b = t["c_acctbal"].to_numpy()
            pos = b[b > 0.0]
            return pa.table({
                "s": pa.array([float(pos.sum())]),
                "n": pa.array([int(pos.size)], pa.int64()),
            })

        from ray.data.aggregate import Sum

        mom = pool.map_batches(_moments, batch_format="pyarrow").aggregate(
            Sum("s", alias_name="s"), Sum("n", alias_name="n")
        )
        avg_bal = float(mom["s"]) / float(mom["n"])
        orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        urgent = rel.distinct(
            orders.map_batches(
                lambda t: t.filter(
                    pc.equal(t["o_orderpriority"], "1-URGENT")
                ).select(["o_custkey"]),
                batch_format="pyarrow",
            ),
            "o_custkey",
        ).map_batches(
            lambda t: t.append_column("hit", pa.array(np.ones(len(t), np.int8))),
            batch_format="pyarrow",
        )

        def _rich(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater(t["c_acctbal"], avg_bal))

        rich = pool.map_batches(_rich, batch_format="pyarrow")
        j = rel.hash_join(
            rich, urgent, on=["c_custkey"], right_on=["o_custkey"],
            how="left_outer", num_partitions=8,
        )

        def _anti(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_null(t["hit"]))

        out = (
            rel.grouped_aggregate(
                j.map_batches(_anti, batch_format="pyarrow"),
                ["c_nationkey"],
                {"numcust": ("count", "c_custkey"), "totacctbal": ("sum", "c_acctbal")},
            )
            .to_pandas()
            .sort_values("c_nationkey", kind="mergesort")
            .reset_index(drop=True)
        )
        out["c_nationkey"] = out["c_nationkey"].astype("int64")
        out["numcust"] = out["numcust"].astype("int64")
        out["totacctbal"] = round_half_up(out["totacctbal"].to_numpy())
        return out

    def pipe_tpch_q7(sf_dir):
        # TPC-H Q7 (volume shipping between two nations). Supplier
        # and nation are broadcast dimensions (suppkey->nation label
        # ships once); customer pre-filters to the two nations BEFORE
        # its join, so the two all-to-alls (orders x customer-sub,
        # lineitem-sub x orders-sub) only move qualifying rows; the
        # (supp_nation, cust_nation, year) rollup is a tiny combiner
        N1, N2 = "NATION_3", "NATION_8"
        nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
        nk = dict(zip(nat["n_name"], nat["n_nationkey"]))
        k1, k2 = int(nk[N1]), int(nk[N2])
        sup = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
        ).to_pandas()
        sup = sup[sup["s_nationkey"].isin([k1, k2])]
        sk = np.sort(sup["s_suppkey"].to_numpy(np.int64))
        snat = np.where(
            sup.set_index("s_suppkey")["s_nationkey"].loc[sk].to_numpy() == k1, N1, N2
        )
        import ray as _ray

        sref = _ray.put((sk, snat))
        lo, hi = np.datetime64("1996-01-01"), np.datetime64("1997-12-31T23:59:59.999999")
        li = _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )

        def _li(t: pa.Table) -> pa.Table:
            k, lab = _ray.get(sref)
            d = t["l_shipdate"].to_numpy()
            key = t["l_suppkey"].to_numpy()
            pos = np.clip(np.searchsorted(k, key), 0, max(k.size - 1, 0))
            m = (d >= lo) & (d <= hi) & ((k[pos] == key) if k.size else False)
            vol = t["l_extendedprice"].to_numpy()[m] * (
                1.0 - t["l_discount"].to_numpy()[m]
            )
            return pa.table({
                "l_orderkey": pa.array(t["l_orderkey"].to_numpy()[m]),
                "supp_nation": pa.array(lab[pos[m]]),
                "l_year": pa.array(d[m].astype("datetime64[Y]").astype(np.int64) + 1970),
                "volume": pa.array(vol),
            })

        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

        def _cust(t: pa.Table) -> pa.Table:
            nkc = t["c_nationkey"].to_numpy()
            m = (nkc == k1) | (nkc == k2)
            return pa.table({
                "c_custkey": pa.array(t["c_custkey"].to_numpy()[m]),
                "cust_nation": pa.array(np.where(nkc[m] == k1, N1, N2)),
            })

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        osub = rel.hash_join(
            orders, cust.map_batches(_cust, batch_format="pyarrow"),
            on=["o_custkey"], right_on=["c_custkey"], num_partitions=8,
        )
        j = rel.hash_join(
            li.map_batches(_li, batch_format="pyarrow"), osub,
            on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8,
        )

        def _cross(t: pa.Table) -> pa.Table:
            return t.filter(pc.not_equal(t["supp_nation"], t["cust_nation"]))

        out = (
            rel.grouped_aggregate(
                j.map_batches(_cross, batch_format="pyarrow"),
                ["supp_nation", "cust_nation", "l_year"],
                {"revenue": ("sum", "volume")},
            )
            .to_pandas()
            .sort_values(["supp_nation", "cust_nation", "l_year"], kind="mergesort")
            .reset_index(drop=True)
        )
        out["l_year"] = out["l_year"].astype("int64")
        out["revenue"] = round_half_up(out["revenue"].to_numpy())
        return out

    def pipe_tpch_q8(sf_dir):
        # TPC-H Q8 (national market share, adapted: p_type test is
        # equality on this schema's coarse types). part and supplier
        # broadcast; customer pre-filters to the region's nationkeys
        # (nation+region are driver-side tiny); numerator and
        # denominator ride ONE combiner exchange keyed by year
        nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
        reg = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
        rk = int(reg[reg["r_name"] == "ASIA"]["r_regionkey"].iloc[0])
        asia_keys = set(nat[nat["n_regionkey"] == rk]["n_nationkey"].astype(int))
        pt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
        )
        pkeys = np.sort(
            pt.filter(pc.equal(pt["p_type"], "ECONOMY"))["p_partkey"].to_numpy()
        )
        sup = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
        ).to_pandas()
        nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
        sk = np.sort(sup["s_suppkey"].to_numpy(np.int64))
        slab = np.array(
            [nname[int(x)] for x in sup.set_index("s_suppkey")["s_nationkey"].loc[sk]]
        )
        import ray as _ray

        bref = _ray.put((pkeys, sk, slab))
        lo, hi = np.datetime64("1996-01-01"), np.datetime64("1997-12-31T23:59:59.999999")
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        ck = pa.array(sorted(asia_keys), pa.int32())

        def _cust(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["c_nationkey"], value_set=ck)).select(
                ["c_custkey"]
            )

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

        def _ord(t: pa.Table) -> pa.Table:
            d = t["o_orderdate"].to_numpy()
            m = (d >= lo) & (d <= hi)
            return pa.table({
                "o_orderkey": pa.array(t["o_orderkey"].to_numpy()[m]),
                "o_custkey": pa.array(t["o_custkey"].to_numpy()[m]),
                "o_year": pa.array(d[m].astype("datetime64[Y]").astype(np.int64) + 1970),
            })

        osub = rel.hash_join(
            orders.map_batches(_ord, batch_format="pyarrow"),
            cust.map_batches(_cust, batch_format="pyarrow"),
            on=["o_custkey"], right_on=["c_custkey"], num_partitions=8,
        )
        li = _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )

        def _li(t: pa.Table) -> pa.Table:
            pk, skk, lab = _ray.get(bref)
            k = t["l_partkey"].to_numpy()
            pos = np.clip(np.searchsorted(pk, k), 0, max(pk.size - 1, 0))
            m = (pk[pos] == k) if pk.size else np.zeros(len(k), bool)
            s = t["l_suppkey"].to_numpy()[m]
            sp = np.clip(np.searchsorted(skk, s), 0, max(skk.size - 1, 0))
            vol = t["l_extendedprice"].to_numpy()[m] * (
                1.0 - t["l_discount"].to_numpy()[m]
            )
            return pa.table({
                "l_orderkey": pa.array(t["l_orderkey"].to_numpy()[m]),
                "volume": pa.array(vol),
                "is_n3": pa.array((lab[sp] == "NATION_3").astype(np.float64)),
            })

        j = rel.hash_join(
            li.map_batches(_li, batch_format="pyarrow"), osub,
            on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8,
        )

        def _parts(t: pa.Table) -> pa.Table:
            v = t["volume"].to_numpy()
            return pa.table({
                "o_year": t["o_year"],
                "vol": t["volume"],
                "vol_n3": pa.array(v * t["is_n3"].to_numpy()),
            })

        out = (
            rel.grouped_aggregate(
                j.map_batches(_parts, batch_format="pyarrow"),
                ["o_year"], {"num": ("sum", "vol_n3"), "den": ("sum", "vol")},
            )
            .to_pandas()
            .sort_values("o_year", kind="mergesort")
            .reset_index(drop=True)
        )
        res = pd.DataFrame({
            "o_year": out["o_year"].astype("int64"),
            "mkt_share": round_half_up((out["num"] / out["den"]).to_numpy(), 6),
        })
        return res

    def pipe_tpch_q9(sf_dir):
        # TPC-H Q9 (product-type profit, adapted: supplycost proxies
        # as 10% of p_retailprice — this schema has no partsupp).
        # part attrs + supplier nation broadcast; the per-line amount
        # pre-aggregates by (nation, orderkey) BEFORE the orders join
        # so the all-to-all moves group rows, then folds by year
        pt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_name", "p_retailprice"],
        )
        m = pc.match_substring(pt["p_name"], "widget")
        pk = pt.filter(m)["p_partkey"].to_numpy()
        order_idx = np.argsort(pk)
        pk = pk[order_idx]
        prp = pt.filter(m)["p_retailprice"].to_numpy()[order_idx]
        nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
        nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
        sup = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
        ).to_pandas()
        sk = np.sort(sup["s_suppkey"].to_numpy(np.int64))
        slab = np.array(
            [nname[int(x)] for x in sup.set_index("s_suppkey")["s_nationkey"].loc[sk]]
        )
        import ray as _ray

        bref = _ray.put((pk, prp, sk, slab))
        li = _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
             "l_extendedprice", "l_discount"],
        )

        def _amount(t: pa.Table) -> pa.Table:
            pkk, rp, skk, lab = _ray.get(bref)
            k = t["l_partkey"].to_numpy()
            pos = np.clip(np.searchsorted(pkk, k), 0, max(pkk.size - 1, 0))
            mm = (pkk[pos] == k) if pkk.size else np.zeros(len(k), bool)
            amt = (
                t["l_extendedprice"].to_numpy()[mm]
                * (1.0 - t["l_discount"].to_numpy()[mm])
                - 0.1 * rp[pos[mm]] * t["l_quantity"].to_numpy()[mm]
            )
            s = t["l_suppkey"].to_numpy()[mm]
            sp = np.clip(np.searchsorted(skk, s), 0, max(skk.size - 1, 0))
            return pa.table({
                "l_orderkey": pa.array(t["l_orderkey"].to_numpy()[mm]),
                "nation": pa.array(lab[sp]),
                "amount": pa.array(amt),
            })

        partial = rel.grouped_aggregate(
            li.map_batches(_amount, batch_format="pyarrow"),
            ["nation", "l_orderkey"], {"amount": ("sum", "amount")},
        )
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

        def _yr(t: pa.Table) -> pa.Table:
            return pa.table({
                "o_orderkey": t["o_orderkey"],
                "o_year": pa.array(
                    t["o_orderdate"].to_numpy().astype("datetime64[Y]").astype(np.int64)
                    + 1970
                ),
            })

        j = rel.hash_join(
            partial, orders.map_batches(_yr, batch_format="pyarrow"),
            on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8,
        )
        out = (
            rel.grouped_aggregate(
                j, ["nation", "o_year"], {"sum_profit": ("sum", "amount")}
            )
            .to_pandas()
            .sort_values(
                ["nation", "o_year"], ascending=[True, False], kind="mergesort"
            )
            .reset_index(drop=True)
        )
        out["o_year"] = out["o_year"].astype("int64")
        out["sum_profit"] = round_half_up(out["sum_profit"].to_numpy())
        return out

    def pipe_tpch_q12(sf_dir):
        # TPC-H Q12 (shipping-mode priority counts, adapted: this
        # lineitem has no shipmode/commit/receipt — linestatus stands
        # in for the mode and "late" means shipped >60 days after the
        # order date). One sharded join, flags fold map-side
        lo, hi = np.datetime64("1996-01-01"), np.datetime64("1997-01-01")
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"])

        def _li(t: pa.Table) -> pa.Table:
            d = t["l_shipdate"].to_numpy()
            m = (d >= lo) & (d < hi)
            return pa.table({
                "l_orderkey": pa.array(t["l_orderkey"].to_numpy()[m]),
                "l_linestatus": t["l_linestatus"].filter(pa.array(m)),
                "l_shipdate": pa.array(d[m]),
            })

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
        j = rel.hash_join(
            li.map_batches(_li, batch_format="pyarrow"), orders,
            on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8,
        )

        def _flags(t: pa.Table) -> pa.Table:
            late = t["l_shipdate"].to_numpy() > (
                t["o_orderdate"].to_numpy() + np.timedelta64(60, "D")
            )
            pr = t["o_orderpriority"].to_numpy(zero_copy_only=False)
            high = np.isin(pr, ["1-URGENT", "2-HIGH"]).astype(np.int64)
            return pa.table({
                "l_linestatus": t["l_linestatus"].filter(pa.array(late)),
                "high": pa.array(high[late]),
                "low": pa.array(1 - high[late]),
            })

        out = (
            rel.grouped_aggregate(
                j.map_batches(_flags, batch_format="pyarrow"),
                ["l_linestatus"],
                {"high_line_count": ("sum", "high"), "low_line_count": ("sum", "low")},
            )
            .to_pandas()
            .sort_values("l_linestatus", kind="mergesort")
            .reset_index(drop=True)
        )
        out["high_line_count"] = out["high_line_count"].astype("int64")
        out["low_line_count"] = out["low_line_count"].astype("int64")
        return out

    def pipe_tpch_q2(sf_dir):
        # TPC-H Q2 (minimum-cost supplier, adapted: this schema has
        # no partsupp, so the supplies relation is the DISTINCT
        # (l_partkey, l_suppkey) pairs from lineitem and the min is
        # on s_acctbal). Pairs reduce via a combiner distinct; part
        # filter and EUROPE supplier attrs broadcast; the per-part
        # min + join-back resolve on the qualifying-pair table. The
        # min-equality compares raw column doubles (no arithmetic),
        # so fp association cannot split it
        nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
        reg = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
        rk = int(reg[reg["r_name"] == "EUROPE"]["r_regionkey"].iloc[0])
        eur = nat[nat["n_regionkey"] == rk]
        nname = dict(zip(eur["n_nationkey"].astype(int), eur["n_name"]))
        sup = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        ).to_pandas()
        sup = sup[sup["s_nationkey"].isin(list(nname))]
        sk = np.sort(sup["s_suppkey"].to_numpy(np.int64))
        srec = sup.set_index("s_suppkey").loc[sk]
        pt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_name", "p_size", "p_type"],
        )
        pm = pc.and_(pc.less_equal(pt["p_size"], 5), pc.equal(pt["p_type"], "LARGE"))
        psel = pt.filter(pm)
        pk = psel["p_partkey"].to_numpy()
        pidx = np.argsort(pk)
        pk = pk[pidx]
        pname = psel["p_name"].to_numpy(zero_copy_only=False)[pidx]
        import ray as _ray

        bref = _ray.put((pk, sk))
        li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

        def _pairs(t: pa.Table) -> pa.Table:
            pkk, skk = _ray.get(bref)
            p = t["l_partkey"].to_numpy()
            s = t["l_suppkey"].to_numpy()
            pp = np.clip(np.searchsorted(pkk, p), 0, max(pkk.size - 1, 0))
            sp = np.clip(np.searchsorted(skk, s), 0, max(skk.size - 1, 0))
            m = ((pkk[pp] == p) if pkk.size else np.zeros(len(p), bool)) & (
                (skk[sp] == s) if skk.size else False
            )
            return pa.table({
                "p_partkey": pa.array(p[m]), "s_suppkey": pa.array(s[m])
            })

        pairs = rel.distinct(
            li.map_batches(_pairs, batch_format="pyarrow"),
            ["p_partkey", "s_suppkey"],
        )
        bal_arr = srec["s_acctbal"].to_numpy()
        balref = _ray.put((sk, bal_arr))

        def _bal(t: pa.Table) -> pa.Table:
            kk, bb = _ray.get(balref)
            s = t["s_suppkey"].to_numpy()
            return t.append_column(
                "s_acctbal", pa.array(bb[np.searchsorted(kk, s)])
            )

        withbal = pairs.map_batches(_bal, batch_format="pyarrow")
        mins = rel.grouped_aggregate(
            withbal, ["p_partkey"], {"min_bal": ("min", "s_acctbal")}
        )
        # min-equality join-back stays sharded (pairs x mins co-hash on
        # p_partkey); only the <=100-row page reaches the driver
        jm = rel.hash_join(
            withbal,
            rel.rename(mins, {"p_partkey": "mp"}),
            on=["p_partkey"], right_on=["mp"], num_partitions=8,
        )

        def _eq(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["s_acctbal"], t["min_bal"]))

        cand = rel.topk(
            jm.map_batches(_eq, batch_format="pyarrow"),
            ["s_acctbal", "p_partkey"], 100, descending=[True, False],
        ).to_pandas()
        cand["s_name"] = srec["s_name"].loc[cand["s_suppkey"]].to_numpy()
        cand["n_name"] = [
            nname[int(srec["s_nationkey"].loc[s])] for s in cand["s_suppkey"]
        ]
        pmap = dict(zip(pk.tolist(), pname))
        cand["p_name"] = cand["p_partkey"].map(pmap)
        out = cand.sort_values(
            ["s_acctbal", "n_name", "s_name", "p_partkey"],
            ascending=[False, True, True, True], kind="mergesort",
        ).head(100).reset_index(drop=True)
        return out[["s_acctbal", "s_name", "n_name", "p_partkey", "p_name"]]

    def pipe_tpch_q11(sf_dir):
        # TPC-H Q11 (important stock, adapted: stock value proxies as
        # shipped quantity x p_retailprice from one nation's
        # suppliers). Supplier set + part prices broadcast; per-part
        # values are ONE combiner exchange; the global threshold is a
        # scalar fold of the group table. Both sides of the > compare
        # round to 4dp so summation order can't flip the boundary
        nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
        nk = int(nat[nat["n_name"] == "NATION_3"]["n_nationkey"].iloc[0])
        sup = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
        ).to_pandas()
        sk = np.sort(sup[sup["s_nationkey"] == nk]["s_suppkey"].to_numpy(np.int64))
        pt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_retailprice"]
        )
        pk = pt["p_partkey"].to_numpy()
        pidx = np.argsort(pk)
        pk, prp = pk[pidx], pt["p_retailprice"].to_numpy()[pidx]
        import ray as _ray

        bref = _ray.put((sk, pk, prp))
        li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])

        def _val(t: pa.Table) -> pa.Table:
            skk, pkk, rp = _ray.get(bref)
            s = t["l_suppkey"].to_numpy()
            sp = np.clip(np.searchsorted(skk, s), 0, max(skk.size - 1, 0))
            m = (skk[sp] == s) if skk.size else np.zeros(len(s), bool)
            p = t["l_partkey"].to_numpy()[m]
            pp = np.searchsorted(pkk, p)
            return pa.table({
                "l_partkey": pa.array(p),
                "v": pa.array(t["l_quantity"].to_numpy()[m] * rp[pp]),
            })

        v = rel.grouped_aggregate(
            li.map_batches(_val, batch_format="pyarrow"),
            ["l_partkey"], {"value": ("sum", "v")},
        )
        # the group table (bounded by distinct parts) pins in the
        # object store so the scalar fold and the > gate don't
        # re-run the lineitem pass; only the important tail (small
        # by construction) ever reaches the driver
        v = v.materialize()
        from ray.data.aggregate import Sum

        total = v.aggregate(Sum("value", alias_name="s"))
        # "important" = >2x the average per-part value: scale-free
        # (the TPC-H 0.0001/SF fraction rewritten so the gate keeps a
        # stable tail at every corpus size)
        thr = float(
            round_half_up(np.array([2.0 * float(total["s"]) / float(v.count())]))[0]
        )

        def _gate(t: pa.Table) -> pa.Table:
            val = round_half_up(t["value"].to_numpy())
            keep = val > thr
            return pa.table({
                "l_partkey": t["l_partkey"].filter(pa.array(keep)),
                "value": pa.array(val[keep]),
            })

        out = (
            v.map_batches(_gate, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["value", "l_partkey"], ascending=[False, True], kind="mergesort")
            .reset_index(drop=True)
        )
        return out[["l_partkey", "value"]]

    def pipe_tpch_q16(sf_dir):
        # TPC-H Q16 (part/supplier relationship counts, adapted: the
        # supplies relation is lineitem's distinct pairs; no supplier
        # complaint filter on this schema). Qualifying part attrs
        # broadcast; pairs reduce map-side; the count-distinct is the
        # SECOND distinct exchange keyed by (brand, type, size, supp)
        sizes = [1, 4, 9, 14, 19, 23, 36, 45]
        pt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand", "p_type", "p_size"],
        )
        m = pc.and_(
            pc.and_(
                pc.not_equal(pt["p_brand"], "Brand#15"),
                pc.not_equal(pt["p_type"], "PROMO"),
            ),
            pc.is_in(pt["p_size"], value_set=pa.array(sizes, pa.int32())),
        )
        psel = pt.filter(m)
        pk = psel["p_partkey"].to_numpy()
        pidx = np.argsort(pk)
        pk = pk[pidx]
        battrs = (
            psel.select(["p_brand", "p_type", "p_size"]).to_pandas().iloc[pidx]
        )
        import ray as _ray

        bref = _ray.put((
            pk,
            battrs["p_brand"].to_numpy(),
            battrs["p_type"].to_numpy(),
            battrs["p_size"].to_numpy().astype(np.int64),
        ))
        li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

        def _enrich(t: pa.Table) -> pa.Table:
            pkk, br, ty, sz = _ray.get(bref)
            p = t["l_partkey"].to_numpy()
            pp = np.clip(np.searchsorted(pkk, p), 0, max(pkk.size - 1, 0))
            mm = (pkk[pp] == p) if pkk.size else np.zeros(len(p), bool)
            i = pp[mm]
            return pa.table({
                "p_brand": pa.array(br[i]), "p_type": pa.array(ty[i]),
                "p_size": pa.array(sz[i]),
                "l_suppkey": pa.array(t["l_suppkey"].to_numpy()[mm]),
            })

        quads = rel.distinct(
            li.map_batches(_enrich, batch_format="pyarrow"),
            ["p_brand", "p_type", "p_size", "l_suppkey"],
        )
        out = (
            rel.grouped_aggregate(
                quads, ["p_brand", "p_type", "p_size"],
                {"supplier_cnt": ("count", "l_suppkey")},
            )
            .to_pandas()
            .sort_values(
                ["supplier_cnt", "p_brand", "p_type", "p_size"],
                ascending=[False, True, True, True], kind="mergesort",
            )
            .reset_index(drop=True)
        )
        out["p_size"] = out["p_size"].astype("int64")
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        return out

    def pipe_tpch_q19(sf_dir):
        # TPC-H Q19 (discounted revenue, disjunctive predicates,
        # adapted to brand/size/quantity — no container column). The
        # three brand rules broadcast as per-partkey quantity bounds;
        # the whole disjunction evaluates in one masked partial pass
        rules = [
            ("Brand#12", 1, 5, 1.0, 11.0),
            ("Brand#23", 1, 10, 10.0, 20.0),
            ("Brand#4", 1, 15, 20.0, 30.0),
        ]
        pt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand", "p_size"],
        )
        pks, qlos, qhis = [], [], []
        for brand, slo, shi, qlo, qhi in rules:
            sel = pt.filter(
                pc.and_(
                    pc.equal(pt["p_brand"], brand),
                    pc.and_(
                        pc.greater_equal(pt["p_size"], slo),
                        pc.less_equal(pt["p_size"], shi),
                    ),
                )
            )
            k = sel["p_partkey"].to_numpy()
            pks.append(k)
            qlos.append(np.full(k.size, qlo))
            qhis.append(np.full(k.size, qhi))
        pk = np.concatenate(pks)
        qlo_a, qhi_a = np.concatenate(qlos), np.concatenate(qhis)
        pidx = np.argsort(pk)
        pk, qlo_a, qhi_a = pk[pidx], qlo_a[pidx], qhi_a[pidx]
        import ray as _ray

        bref = _ray.put((pk, qlo_a, qhi_a))
        li = _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )

        def _rev(t: pa.Table) -> pa.Table:
            pkk, lo_a, hi_a = _ray.get(bref)
            p = t["l_partkey"].to_numpy()
            q = t["l_quantity"].to_numpy()
            pp = np.clip(np.searchsorted(pkk, p), 0, max(pkk.size - 1, 0))
            m = (
                ((pkk[pp] == p) if pkk.size else np.zeros(len(p), bool))
                & (q >= lo_a[pp]) & (q <= hi_a[pp])
            )
            rev = t["l_extendedprice"].to_numpy()[m] * (
                1.0 - t["l_discount"].to_numpy()[m]
            )
            return pa.table({"s": pa.array([float(rev.sum())])})

        from ray.data.aggregate import Sum

        tot = li.map_batches(_rev, batch_format="pyarrow").aggregate(
            Sum("s", alias_name="s")
        )
        return pd.DataFrame({"revenue": [float(round_half_up(float(tot["s"] or 0.0)))]})

    def pipe_tpch_q20(sf_dir):
        # TPC-H Q20 (excess-stock suppliers, adapted: the availqty
        # gate becomes total 1996 shipped quantity of 'blue%' parts
        # > 100 — quantity sums of integer-valued doubles are
        # fp-exact so the HAVING gate can't waver). Part set
        # broadcast; per-supplier sums are one bounded combiner
        # exchange; names resolve as point reads on the survivors
        pt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
        )
        pk = np.sort(
            pt.filter(pc.starts_with(pt["p_name"], "blue"))["p_partkey"].to_numpy()
        )
        import ray as _ray

        pref = _ray.put(pk)
        lo, hi = np.datetime64("1996-01-01"), np.datetime64("1997-01-01")
        li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

        def _f(t: pa.Table) -> pa.Table:
            pkk = _ray.get(pref)
            d = t["l_shipdate"].to_numpy()
            p = t["l_partkey"].to_numpy()
            pp = np.clip(np.searchsorted(pkk, p), 0, max(pkk.size - 1, 0))
            m = (
                (d >= lo) & (d < hi)
                & ((pkk[pp] == p) if pkk.size else np.zeros(len(p), bool))
            )
            return pa.table({
                "l_suppkey": pa.array(t["l_suppkey"].to_numpy()[m]),
                "l_quantity": pa.array(t["l_quantity"].to_numpy()[m]),
            })

        agg = rel.grouped_aggregate(
            li.map_batches(_f, batch_format="pyarrow"),
            ["l_suppkey"], {"qty": ("sum", "l_quantity")},
        ).to_pandas()
        agg = agg[agg["qty"] > 100.0]
        sup = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
        ).to_pandas()
        out = (
            agg.rename(columns={"l_suppkey": "s_suppkey"})
            .merge(sup, on="s_suppkey")
            .sort_values("s_name", kind="mergesort")
            .reset_index(drop=True)
        )
        out["qty"] = out["qty"].astype("int64")
        return out[["s_name", "qty"]]

    def pipe_tpch_q21(sf_dir):
        # TPC-H Q21 (suppliers who kept orders waiting, adapted: with
        # no commit/receipt dates, "waiting" means a finished-status
        # order with >=2 suppliers where EXACTLY ONE supplier has a
        # returned line — the exists/not-exists pair compiles to
        # per-order distinct-supplier stats). Pairs reduce by
        # (orderkey, suppkey) max-flag combiner; order stats fold on
        # the pair table; blame counts on the tiny survivor set
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

        def _fo(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["o_orderstatus"], "F")).select(["o_orderkey"])

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])

        def _flag(t: pa.Table) -> pa.Table:
            return pa.table({
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "r": pa.array(
                    pc.equal(t["l_returnflag"], "R").to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            })

        j = rel.hash_join(
            li.map_batches(_flag, batch_format="pyarrow"),
            orders.map_batches(_fo, batch_format="pyarrow"),
            on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8,
        )
        pair = rel.grouped_aggregate(
            j, ["l_orderkey", "l_suppkey"], {"r": ("max", "r")}
        )

        def _enc(t: pa.Table) -> pa.Table:
            r = t["r"].to_numpy()
            s = t["l_suppkey"].to_numpy()
            BIG = np.int64(2**62)
            return pa.table({
                "l_orderkey": t["l_orderkey"],
                "one": pa.array(np.ones(len(t), np.int64)),
                "r": t["r"],
                "rs": pa.array(np.where(r == 1, s, BIG)),
            })

        stats = rel.grouped_aggregate(
            pair.map_batches(_enc, batch_format="pyarrow"),
            ["l_orderkey"],
            {"ns": ("sum", "one"), "nr": ("sum", "r"), "rs": ("min", "rs")},
        )

        def _gate(t: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(t["ns"], 2), pc.equal(t["nr"], 1))
            return t.filter(m).select(["rs"])

        blame = (
            rel.grouped_aggregate(
                stats.map_batches(_gate, batch_format="pyarrow"),
                ["rs"], {"numwait": ("count", "rs")},
            ).to_pandas()
        )
        sup = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
        ).to_pandas()
        out = (
            blame.rename(columns={"rs": "s_suppkey"})
            .merge(sup, on="s_suppkey")
            .groupby("s_name", as_index=False)["numwait"].sum()
            .sort_values(["numwait", "s_name"], ascending=[False, True], kind="mergesort")
            .head(100)
            .reset_index(drop=True)
        )
        out["numwait"] = out["numwait"].astype("int64")
        return out[["s_name", "numwait"]]

    def s82_dis_max(sf_dir):
        # ES dis_max with tie_breaker=0.3 over {match text:'vector',
        # term source:'src3'}: score = best + 0.3 * other (for two
        # sub-queries: max + tb * (sum - max)), vs most_fields' plain
        # sum (s77). Same streaming shape: one-row per-field moment
        # partials, broadcast stats, vectorized scoring, bounded topk
        TB = 0.3
        docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

        def _tfs(t: pa.Table):
            from search_engine_ray.ops.text import _flat_tokens

            flat, parents, n = _flat_tokens(t["text"])
            toks = flat.to_numpy(zero_copy_only=False)
            dl = np.bincount(parents, minlength=n).astype(np.float64)
            tf_t = np.bincount(parents[toks == "vector"], minlength=n).astype(
                np.float64
            )
            tf_s = (
                t["source"].to_numpy(zero_copy_only=False) == "src3"
            ).astype(np.float64)
            return tf_t, tf_s, dl, n

        def _moments(t: pa.Table) -> pa.Table:
            tf_t, tf_s, dl, n = _tfs(t)
            return pa.table({
                "n": pa.array([n], pa.int64()),
                "sum_dl": pa.array([float(dl.sum())]),
                "dft": pa.array([int((tf_t > 0).sum())], pa.int64()),
                "dfs": pa.array([int((tf_s > 0).sum())], pa.int64()),
            })

        from ray.data.aggregate import Sum

        st = docs.map_batches(_moments, batch_format="pyarrow").aggregate(
            Sum("n", alias_name="n"), Sum("sum_dl", alias_name="sum_dl"),
            Sum("dft", alias_name="dft"), Sum("dfs", alias_name="dfs"),
        )
        n_docs = float(st["n"])
        avgdl = st["sum_dl"] / n_docs

        def _idf(df):
            return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

        idf_t, idf_s = _idf(st["dft"]), _idf(st["dfs"])

        def _score(t: pa.Table) -> pa.Table:
            tf_t, tf_s, dl, n = _tfs(t)
            denom = 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
            sc_t = np.where(tf_t > 0, idf_t * tf_t * 2.2 / (tf_t + denom), 0.0)
            sc_s = np.where(tf_s > 0, idf_s * tf_s * 2.2 / (tf_s + 1.2), 0.0)
            hit = (tf_t > 0) | (tf_s > 0)
            both = np.maximum(sc_t, sc_s) + TB * np.minimum(sc_t, sc_s)
            return pa.table({
                "doc_id": t["doc_id"].filter(pa.array(hit)),
                "raw": pa.array(both[hit]),
            })

        top = rel.topk(
            docs.map_batches(_score, batch_format="pyarrow"),
            ["raw", "doc_id"], 10, descending=[True, False],
        ).to_pandas().reset_index(drop=True)
        return pd.DataFrame({
            "doc_id": top["doc_id"],
            "score": round_half_up(top["raw"].to_numpy()),
        })

    def s83_script_score(sf_dir):
        # ES script_score: _score * (1 + ln(1 + n_chars/1000)) — the
        # script re-weights EVERY match, so the page cannot come from
        # a plain BM25 top-k; same two-pass streaming skeleton with
        # the doc-field factor applied in the scoring pass
        docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

        def _tf(t: pa.Table):
            from search_engine_ray.ops.text import _flat_tokens

            flat, parents, n = _flat_tokens(t["text"])
            toks = flat.to_numpy(zero_copy_only=False)
            dl = np.bincount(parents, minlength=n).astype(np.float64)
            tf = np.bincount(parents[toks == "hash"], minlength=n).astype(np.float64)
            return tf, dl, n

        def _moments(t: pa.Table) -> pa.Table:
            tf, dl, n = _tf(t)
            return pa.table({
                "n": pa.array([n], pa.int64()),
                "sum_dl": pa.array([float(dl.sum())]),
                "df": pa.array([int((tf > 0).sum())], pa.int64()),
            })

        from ray.data.aggregate import Sum

        st = docs.map_batches(_moments, batch_format="pyarrow").aggregate(
            Sum("n", alias_name="n"), Sum("sum_dl", alias_name="sum_dl"),
            Sum("df", alias_name="df"),
        )
        n_docs = float(st["n"])
        avgdl = st["sum_dl"] / n_docs
        idf = math.log(1.0 + (n_docs - st["df"] + 0.5) / (st["df"] + 0.5))

        def _score(t: pa.Table) -> pa.Table:
            tf, dl, n = _tf(t)
            denom = 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
            bm25 = idf * tf * 2.2 / (tf + denom)
            factor = 1.0 + np.log(1.0 + t["n_chars"].to_numpy() / 1000.0)
            hit = tf > 0
            return pa.table({
                "doc_id": t["doc_id"].filter(pa.array(hit)),
                "raw": pa.array((bm25 * factor)[hit]),
            })

        top = rel.topk(
            docs.map_batches(_score, batch_format="pyarrow"),
            ["raw", "doc_id"], 10, descending=[True, False],
        ).to_pandas().reset_index(drop=True)
        return pd.DataFrame({
            "doc_id": top["doc_id"],
            "score": round_half_up(top["raw"].to_numpy()),
        })

    def s84_more_like_this(sf_dir):
        # ES more_like_this: the 5 highest tf*idf terms of doc 42
        # become a should-query; the source doc is excluded from the
        # page (include=false). Pass 1 streams the corpus once for
        # candidate dfs + moments (candidates bounded by ONE doc's
        # vocabulary, broadcast as a sorted array); term selection
        # orders by 6dp-rounded tf*idf with a term tiebreak; pass 2
        # scores the expanded should via the indexed engine's full
        # match set and pages on the 4dp-rounded score
        from search_engine_ray.ops.text import _flat_tokens

        DOC, NTERMS, K = 42, 5, 10
        src = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
            filters=[("doc_id", "=", DOC)],
        )
        flat, parents, _n = _flat_tokens(src["text"])
        toks = flat.to_numpy(zero_copy_only=False)
        cand, tf_src = np.unique(toks, return_counts=True)
        import ray as _ray

        cref = _ray.put(cand)
        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def _dfs(t: pa.Table) -> pa.Table:
            cc = _ray.get(cref)
            f, par, n = _flat_tokens(t["text"])
            tk = f.to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(cc, tk), 0, max(cc.size - 1, 0))
            m = cc[pos] == tk
            # distinct (doc, candidate) pairs -> df partials
            key = par[m].astype(np.int64) * cc.size + pos[m]
            uk = np.unique(key)
            dfp = np.bincount((uk % cc.size).astype(np.int64), minlength=cc.size)
            dl = np.bincount(par, minlength=n)
            out = {"n": pa.array([n], pa.int64()),
                   "sum_dl": pa.array([float(dl.sum())])}
            out["df"] = pa.array([dfp.astype(np.int64)], pa.list_(pa.int64()))
            return pa.table(out)

        parts = docs.map_batches(_dfs, batch_format="pyarrow").to_pandas()
        n_docs = float(parts["n"].sum())
        dfs = np.sum(np.stack(parts["df"].to_numpy()), axis=0).astype(np.float64)
        idf = np.log(1.0 + (n_docs - dfs + 0.5) / (dfs + 0.5))
        sel_key = round_half_up(tf_src * idf, 6)
        order = np.lexsort((cand, -sel_key))[:NTERMS]
        terms = [str(x) for x in cand[order]]
        eng = _doc_engine(sf_dir)
        q = Compound(should=tuple(Term("text", t) for t in terms), min_should_match=1)
        df = eng.search_all(q).to_pandas()
        df = df[df["doc_id"] != DOC].copy()
        df["score"] = round_half_up(df["score"].to_numpy())
        df = df.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        return df.head(K)[["doc_id", "score"]].reset_index(drop=True)

    def r67_geotile_grid(sf_dir):
        # ES geotile_grid aggregation at zoom 4 over the derived
        # deterministic customer coordinates (r59's md5 scheme):
        # web-mercator tile keys "z/x/y" count map-side per batch,
        # one tiny combiner exchange, top-10 buckets
        from search_engine_ray.ops.sketch import _md5_upper64

        Z = 4
        N = 1 << Z
        LAT_MAX = 85.05112878
        cust = _read(sf_dir, "customer", ["c_custkey"])

        def _tiles(t: pa.Table) -> pa.Table:
            keys = t["c_custkey"].to_numpy(zero_copy_only=False)
            two64 = 18446744073709551616.0
            lat = (_md5_upper64([str(k) for k in keys]).astype(np.float64) / two64) * 180.0 - 90.0
            lon = (_md5_upper64([f"{k}:lon" for k in keys]).astype(np.float64) / two64) * 360.0 - 180.0
            lat = np.clip(lat, -LAT_MAX, LAT_MAX)
            latr = np.radians(lat)
            x = np.clip(np.floor((lon + 180.0) / 360.0 * N), 0, N - 1).astype(np.int64)
            y = np.clip(
                np.floor(
                    (1.0 - np.log(np.tan(latr) + 1.0 / np.cos(latr)) / np.pi) / 2.0 * N
                ),
                0, N - 1,
            ).astype(np.int64)
            df = pd.DataFrame({"key": [f"{Z}/{a}/{b}" for a, b in zip(x, y)]})
            g = df.groupby("key", as_index=False).size().rename(columns={"size": "cnt"})
            return pa.Table.from_pandas(g, preserve_index=False)

        out = (
            rel.grouped_aggregate(
                cust.map_batches(_tiles, batch_format="pyarrow"),
                ["key"], {"doc_count": ("sum", "cnt")},
            )
            .to_pandas()
            .sort_values(["doc_count", "key"], ascending=[False, True], kind="mergesort")
            .head(10)
            .reset_index(drop=True)
        )
        out["doc_count"] = out["doc_count"].astype("int64")
        return out[["key", "doc_count"]]

    def t_dsir_sample(sf_dir):
        # DSIR importance resampling (Xie et al. 2023, "Data
        # Selection for Language Models via Importance Resampling"),
        # hashed-unigram variant: tokens hash into 64 buckets; the
        # target (lang=en, source=src1) and raw bucket distributions
        # are TWO 64-long combiner partials from one corpus pass;
        # per-doc log importance weight sums ln(p/q) over tokens
        # (add-1 smoothed), and the without-replacement draw is the
        # Gumbel top-k trick with a deterministic md5 Gumbel so the
        # draw replays bit-identically in SQL
        from search_engine_ray.ops.sketch import _md5_upper64
        from search_engine_ray.ops.text import _flat_tokens

        B, K = 64, 50
        docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

        def _counts(t: pa.Table) -> pa.Table:
            flat, parents, n = _flat_tokens(t["text"])
            toks = flat.to_numpy(zero_copy_only=False)
            bkt = (_md5_upper64([str(x) for x in toks]) % B).astype(np.int64)
            raw = np.bincount(bkt, minlength=B)
            is_t = (
                (t["lang"].to_numpy(zero_copy_only=False) == "en")
                & (t["source"].to_numpy(zero_copy_only=False) == "src1")
            )
            tm = is_t[parents]
            tgt = np.bincount(bkt[tm], minlength=B)
            return pa.table({
                "raw": pa.array([raw.astype(np.int64)], pa.list_(pa.int64())),
                "tgt": pa.array([tgt.astype(np.int64)], pa.list_(pa.int64())),
            })

        parts = docs.map_batches(_counts, batch_format="pyarrow").to_pandas()
        raw_c = np.sum(np.stack(parts["raw"].to_numpy()), axis=0).astype(np.float64)
        tgt_c = np.sum(np.stack(parts["tgt"].to_numpy()), axis=0).astype(np.float64)
        logr = np.log((tgt_c + 1.0) / (tgt_c.sum() + B)) - np.log(
            (raw_c + 1.0) / (raw_c.sum() + B)
        )
        import ray as _ray

        lref = _ray.put(logr)
        TWO64P2 = 18446744073709551618.0

        def _weigh(t: pa.Table) -> pa.Table:
            lr = _ray.get(lref)
            flat, parents, n = _flat_tokens(t["text"])
            toks = flat.to_numpy(zero_copy_only=False)
            bkt = (_md5_upper64([str(x) for x in toks]) % B).astype(np.int64)
            logw = np.bincount(parents, weights=lr[bkt], minlength=n)
            ids = t["doc_id"].to_numpy()
            u = (
                _md5_upper64([f"dsir:{i}" for i in ids]).astype(np.float64) + 1.0
            ) / TWO64P2
            g = -np.log(-np.log(u))
            return pa.table({
                "doc_id": pa.array(ids),
                "logw": pa.array(logw),
                "key": pa.array(round_half_up(logw + g, 6)),
            })

        top = rel.topk(
            docs.map_batches(_weigh, batch_format="pyarrow"),
            ["key", "doc_id"], K, descending=[True, False],
        ).to_pandas().reset_index(drop=True)
        return pd.DataFrame({
            "doc_id": top["doc_id"],
            "logw": round_half_up(top["logw"].to_numpy()),
        })

    def s85_search_as_you_type(sf_dir):
        # ES search_as_you_type: the _2gram shingle subfield with a
        # bool_prefix tail — typed "vector s" scores as a prefix
        # multi-term rewrite over 2-shingles 'vector_s*', each
        # expansion with its OWN idf, contributions summed
        # (s2_range_scan semantics on a derived shingle field).
        # Pass 1 streams shingle moments, pass 2 the expansion dfs
        # (bounded by the dictionary behind one prefix), pass 3
        # scores vectorized with the stats broadcast
        from search_engine_ray.ops.text import _flat_tokens

        PREFIX = "vector_s"
        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def _bigrams(t: pa.Table):
            flat, parents, n = _flat_tokens(t["text"])
            toks = pd.Series(flat.to_numpy(zero_copy_only=False))
            same = parents[:-1] == parents[1:] if len(toks) > 1 else np.array([], bool)
            bg = (toks.iloc[:-1].reset_index(drop=True) + "_"
                  + toks.iloc[1:].reset_index(drop=True))[same].to_numpy()
            bpar = parents[:-1][same]
            return bg, bpar, n

        def _moments(t: pa.Table) -> pa.Table:
            bg, bpar, n = _bigrams(t)
            return pa.table({
                "n": pa.array([n], pa.int64()),
                "sum_dl": pa.array([float(len(bg))]),
            })

        from ray.data.aggregate import Sum

        st = docs.map_batches(_moments, batch_format="pyarrow").aggregate(
            Sum("n", alias_name="n"), Sum("sum_dl", alias_name="sum_dl")
        )
        n_docs = float(st["n"])
        avgdl = st["sum_dl"] / n_docs

        def _dfs(t: pa.Table) -> pa.Table:
            bg, bpar, n = _bigrams(t)
            m = np.char.startswith(bg.astype(str), PREFIX)
            if not m.any():
                return pa.table({"b": pa.array([], pa.string()),
                                 "df": pa.array([], pa.int64())})
            pairs = pd.DataFrame({"b": bg[m], "p": bpar[m]}).drop_duplicates()
            g = pairs.groupby("b", as_index=False).size()
            return pa.table({"b": pa.array(g["b"].to_numpy(dtype=object)),
                             "df": pa.array(g["size"].to_numpy(np.int64))})

        dfs = (
            rel.grouped_aggregate(
                docs.map_batches(_dfs, batch_format="pyarrow"), ["b"],
                {"df": ("sum", "df")},
            ).to_pandas()
        )
        exp = np.sort(dfs["b"].to_numpy(dtype=object).astype(str))
        idf = np.log(
            1.0
            + (n_docs - dfs.set_index("b")["df"].loc[exp].to_numpy() + 0.5)
            / (dfs.set_index("b")["df"].loc[exp].to_numpy() + 0.5)
        )
        import ray as _ray

        eref = _ray.put((exp, idf))

        def _score(t: pa.Table) -> pa.Table:
            ee, ii = _ray.get(eref)
            bg, bpar, n = _bigrams(t)
            dl = np.bincount(bpar, minlength=n).astype(np.float64)
            denom = 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
            score = np.zeros(n, np.float64)
            hit = np.zeros(n, bool)
            for e, w in zip(ee, ii):
                tf = np.bincount(bpar[bg == e], minlength=n).astype(np.float64)
                m = tf > 0
                score += np.where(m, w * tf * 2.2 / (tf + denom), 0.0)
                hit |= m
            return pa.table({
                "doc_id": t["doc_id"].filter(pa.array(hit)),
                "score": pa.array(round_half_up(score[hit])),
            })

        out = (
            docs.map_batches(_score, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
            .head(10)
            .reset_index(drop=True)
        )
        return out[["doc_id", "score"]]

    def r68_geohash_grid(sf_dir):
        # ES geohash_grid at precision 3 over the derived md5
        # coordinates: 8 lon bits + 7 lat bits interleave MSB-first
        # (lon leads) into 15 bits -> three base32 chars; per-batch
        # tile counts, one tiny combiner exchange, top-10 buckets
        from search_engine_ray.ops.sketch import _md5_upper64

        B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        cust = _read(sf_dir, "customer", ["c_custkey"])

        def _tiles(t: pa.Table) -> pa.Table:
            keys = t["c_custkey"].to_numpy(zero_copy_only=False)
            two64 = 18446744073709551616.0
            lat = (_md5_upper64([str(k) for k in keys]).astype(np.float64) / two64) * 180.0 - 90.0
            lon = (_md5_upper64([f"{k}:lon" for k in keys]).astype(np.float64) / two64) * 360.0 - 180.0
            lon_i = np.minimum(np.floor((lon + 180.0) / 360.0 * 256.0), 255.0).astype(np.int64)
            lat_i = np.minimum(np.floor((lat + 90.0) / 180.0 * 128.0), 127.0).astype(np.int64)
            v = np.zeros(len(keys), np.int64)
            for i in range(8):  # lon bits, MSB first -> even positions
                v |= ((lon_i >> (7 - i)) & 1) << (14 - 2 * i)
            for j in range(7):  # lat bits -> odd positions
                v |= ((lat_i >> (6 - j)) & 1) << (13 - 2 * j)
            gh = [B32[a >> 10] + B32[(a >> 5) & 31] + B32[a & 31] for a in v]
            g = pd.DataFrame({"key": gh}).groupby("key", as_index=False).size()
            return pa.Table.from_pandas(
                g.rename(columns={"size": "cnt"}), preserve_index=False
            )

        out = (
            rel.grouped_aggregate(
                cust.map_batches(_tiles, batch_format="pyarrow"),
                ["key"], {"doc_count": ("sum", "cnt")},
            )
            .to_pandas()
            .sort_values(["doc_count", "key"], ascending=[False, True], kind="mergesort")
            .head(10)
            .reset_index(drop=True)
        )
        out["doc_count"] = out["doc_count"].astype("int64")
        return out[["key", "doc_count"]]

    def r69_scripted_metric(sf_dir):
        # ES scripted_metric: init/map/combine/reduce with a per-doc
        # script — here a weighted revenue (value doubles when
        # user_id % 3 == 0). map+combine run fused per batch (one
        # partial row per (type, block)); reduce is the groupby sum
        ev = _read(sf_dir, "events", ["event_type", "user_id", "value"])

        def _map_combine(t: pa.Table) -> pa.Table:
            w = np.where(t["user_id"].to_numpy() % 3 == 0, 2.0, 1.0)
            df = pd.DataFrame({
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "wv": t["value"].to_numpy() * w,
            })
            g = df.groupby("event_type", as_index=False)["wv"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        out = (
            rel.grouped_aggregate(
                ev.map_batches(_map_combine, batch_format="pyarrow"),
                ["event_type"], {"weighted_value": ("sum", "wv")},
            )
            .to_pandas()
            .sort_values("event_type", kind="mergesort")
            .reset_index(drop=True)
        )
        out["weighted_value"] = round_half_up(out["weighted_value"].to_numpy())
        return out

    def pipe_fineweb(sf_dir):
        # FineWeb/RefinedWeb-shaped curation capstone as ONE streaming
        # lineage: Gopher quality gate -> GPT-3 n-gram benchmark
        # decontamination -> exact dedup -> per-language rollup. Every
        # stage is the library op the standalone entries already
        # value-check; the composition adds two sharded joins (flags
        # and survivors rejoin the kept stream by doc_id — same-key
        # co-hash, no broadcast of corpus-sized state) and a tiny
        # final combiner keyed by language
        docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        g = txt.add_gopher_rules(docs)

        def _keep(t: pa.Table) -> pa.Table:
            # Gopher gate with corpus-adapted word/stopword floors
            # (the published 50-word / 2-stopword floors blank this
            # short-doc synthetic corpus); fraction rules at their
            # published values. Bounds sit far from the corpus value
            # range, so rounded-column gating matches the SQL replay
            m = (
                pc.and_(
                    pc.and_(
                        pc.greater_equal(t["n_words"], 15),
                        pc.greater_equal(t["n_stop_hits"], 1),
                    ),
                    pc.and_(
                        pc.and_(
                            pc.greater_equal(t["mean_word_len"], 3.0),
                            pc.less_equal(t["mean_word_len"], 10.0),
                        ),
                        pc.and_(
                            pc.less_equal(t["symbol_word_ratio"], 0.1),
                            pc.and_(
                                pc.and_(
                                    pc.less_equal(t["bullet_line_frac"], 0.9),
                                    pc.less_equal(t["ellipsis_line_frac"], 0.3),
                                ),
                                pc.greater_equal(t["alpha_word_frac"], 0.8),
                            ),
                        ),
                    ),
                )
            )
            return t.filter(m).select(["doc_id", "text", "lang", "n_words"])

        kept = g.map_batches(_keep, batch_format="pyarrow")
        flags = dd.contamination_flags(kept, _eval_set(sf_dir), w=3)

        def _cleanf(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["contaminated"], 0)).select(["doc_id"])

        clean_ids = flags.map_batches(_cleanf, batch_format="pyarrow")
        clean = rel.hash_join(
            kept, rel.rename(clean_ids, {"doc_id": "cid"}),
            on=["doc_id"], right_on=["cid"], num_partitions=8,
        )
        surv = dd.exact_dedup(clean, "text", "doc_id").select_columns(["doc_id"])
        final = rel.hash_join(
            clean, rel.rename(surv, {"doc_id": "sid"}),
            on=["doc_id"], right_on=["sid"], num_partitions=8,
        )
        out = (
            rel.grouped_aggregate(
                final, ["lang"],
                {"n_docs": ("count", "doc_id"), "total_words": ("sum", "n_words")},
            )
            .to_pandas()
            .sort_values("lang", kind="mergesort")
            .reset_index(drop=True)
        )
        out["n_docs"] = out["n_docs"].astype("int64")
        out["total_words"] = out["total_words"].astype("int64")
        return out[["lang", "n_docs", "total_words"]]

    def t_bpe_train(sf_dir):
        # distributed BPE merge training (Sennrich et al. 2016): the
        # corpus folds ONCE into a (token, tf) vocab table — the
        # scale unit from then on — and each of the 3 merge rounds is
        # one pair-count exchange over the vocab plus a vectorized
        # spaced-string replace (Arrow replace_substring; merges
        # apply to non-overlapping space-delimited occurrences
        # left-to-right, the str.replace/SQL-replace semantics both
        # sides share — back-to-back repeats of a pair fold on the
        # following round). Ties break (count desc, pair asc) so the
        # learned merges replay bit-identically in SQL
        from search_engine_ray.ops.text import _flat_tokens

        STEPS = 3
        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def _tf(t: pa.Table) -> pa.Table:
            flat, parents, n = _flat_tokens(t["text"])
            toks = flat.to_numpy(zero_copy_only=False)
            u, c = np.unique(toks, return_counts=True)
            return pa.table({
                "tok": pa.array(u.astype(object)),
                "tf": pa.array(c.astype(np.int64)),
            })

        vocab = rel.grouped_aggregate(
            docs.map_batches(_tf, batch_format="pyarrow"), ["tok"], {"tf": ("sum", "tf")}
        )

        def _spaced(t: pa.Table) -> pa.Table:
            s = [" ".join(list(x)) for x in t["tok"].to_numpy(zero_copy_only=False)]
            return pa.table({"s": pa.array(s, pa.string()), "tf": t["tf"]})

        cur = vocab.map_batches(_spaced, batch_format="pyarrow").materialize()
        merges = []
        for step in range(STEPS):

            def _pairs(t: pa.Table) -> pa.Table:
                parts = pc.split_pattern(t["s"].combine_chunks(), pattern=" ")
                flat = pc.list_flatten(parts)
                par = pc.list_parent_indices(parts).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                sy = pd.Series(flat.to_numpy(zero_copy_only=False))
                same = par[:-1] == par[1:] if len(sy) > 1 else np.array([], bool)
                pair = (
                    sy.iloc[:-1].reset_index(drop=True) + " "
                    + sy.iloc[1:].reset_index(drop=True)
                )[same]
                w = t["tf"].to_numpy()[par[:-1][same]]
                if not len(pair):
                    return pa.table({
                        "pair": pa.array([], pa.string()),
                        "w": pa.array([], pa.int64()),
                    })
                g = pd.DataFrame({"pair": pair.to_numpy(), "w": w}).groupby(
                    "pair", as_index=False
                )["w"].sum()
                return pa.Table.from_pandas(g, preserve_index=False)

            agg = rel.grouped_aggregate(
                cur.map_batches(_pairs, batch_format="pyarrow"),
                ["pair"], {"w": ("sum", "w")},
            )
            best = rel.topk(agg, ["w", "pair"], 1, descending=[True, False]).to_pandas()
            if best.empty:
                break
            pair, w = str(best["pair"].iloc[0]), int(best["w"].iloc[0])
            merges.append((step + 1, pair, w))
            merged = pair.replace(" ", "")

            def _apply(t: pa.Table, _p=pair, _m=merged) -> pa.Table:
                padded = pc.binary_join_element_wise(
                    pa.array([" "] * len(t)), t["s"].combine_chunks(),
                    pa.array([" "] * len(t)), "",
                )
                rep = pc.replace_substring(padded, pattern=f" {_p} ", replacement=f" {_m} ")
                return pa.table({
                    "s": pc.utf8_trim_whitespace(rep), "tf": t["tf"]
                })

            cur = cur.map_batches(_apply, batch_format="pyarrow").materialize()
        return pd.DataFrame(merges, columns=["step", "pair", "w"])

    def s86_has_child(sf_dir):
        # ES has_child with min_children=2: parent orders whose
        # children (lineitems) match returnflag=R AND quantity>=45 at
        # least twice. The child match folds to per-parent counts in
        # one combiner exchange; survivors of the min_children gate
        # rejoin orders sharded for the parent fields
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"])

        def _kids(t: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.equal(t["l_returnflag"], "R"),
                pc.greater_equal(t["l_quantity"], 45.0),
            )
            return t.filter(m).select(["l_orderkey"])

        counts = rel.grouped_aggregate(
            li.map_batches(_kids, batch_format="pyarrow"),
            ["l_orderkey"], {"n_children": ("count", "l_orderkey")},
        )

        def _gate(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t["n_children"], 2))

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
        j = rel.hash_join(
            orders, counts.map_batches(_gate, batch_format="pyarrow"),
            on=["o_orderkey"], right_on=["l_orderkey"], num_partitions=8,
        )
        out = (
            rel.topk(j, ["o_orderkey"], 10, descending=[False])
            .to_pandas()
            .sort_values("o_orderkey", kind="mergesort")
            .reset_index(drop=True)
        )
        out["n_children"] = out["n_children"].astype("int64")
        return out[["o_orderkey", "o_orderpriority", "n_children"]]

    def s87_has_parent(sf_dir):
        # ES has_parent: child lineitems whose parent order matches
        # (URGENT, status F); the parent filter pre-shrinks the join's
        # right side before the one sharded exchange
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderpriority"])

        def _par(t: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.equal(t["o_orderpriority"], "1-URGENT"),
                pc.equal(t["o_orderstatus"], "F"),
            )
            return t.filter(m).select(["o_orderkey", "o_orderpriority"])

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
        j = rel.hash_join(
            li, orders.map_batches(_par, batch_format="pyarrow"),
            on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8,
        )
        out = (
            rel.topk(j, ["l_orderkey", "l_linenumber"], 10, descending=[False, False])
            .to_pandas()
            .sort_values(["l_orderkey", "l_linenumber"], kind="mergesort")
            .reset_index(drop=True)
        )
        out["l_linenumber"] = out["l_linenumber"].astype("int64")
        return out[["l_orderkey", "l_linenumber", "o_orderpriority"]]

    def s88_msearch(sf_dir):
        # ES _msearch: three queries in ONE scatter-gather round (one
        # score_many RPC per scorer actor instead of an RPC per
        # query); per-query semantics identical to search(), so the
        # oracle is the UNION of the per-query BM25 replays
        eng = _doc_engine(sf_dir)
        plans = [
            Compound(must=(Term("text", "vector"),)),
            Compound(must=(Term("text", "hash"),)),
            Compound(
                should=(Term("text", "spark"), Term("text", "window")),
                min_should_match=1,
            ),
        ]
        frames = []
        for qid, res in enumerate(eng.msearch(plans, k=5)):
            hits = res.hits
            frames.append(pd.DataFrame({
                "qid": np.full(len(hits), qid, np.int64),
                "doc_id": hits["doc_id"].to_numpy(),
                "score": round_half_up(hits["score"].to_numpy()),
            }))
        return pd.concat(frames, ignore_index=True)

    def r70_winsorize(sf_dir):
        # grouped winsorization (outlier capping): per event_type the
        # exact p05/p95 resolve from one per-(group, value) histogram
        # exchange (grouped_discrete_quantiles); the tiny bounds map
        # broadcasts and clipping + the before/after means fold in a
        # second combiner pass. quantile_cont interpolation matches
        # the SQL oracle's op order; means round to 4dp
        ev = _read(sf_dir, "events", ["event_type", "value"])
        qs = rel.grouped_discrete_quantiles(ev, "event_type", "value", [0.05, 0.95])
        bounds = {
            str(g): (float(lo), float(hi))
            for g, lo, hi in zip(qs["event_type"], qs["q0.05"], qs["q0.95"])
        }
        import ray as _ray

        bref = _ray.put(bounds)

        def _clip(t: pa.Table) -> pa.Table:
            b = _ray.get(bref)
            g = t["event_type"].to_numpy(zero_copy_only=False)
            v = t["value"].to_numpy()
            lo = np.array([b[x][0] for x in g])
            hi = np.array([b[x][1] for x in g])
            w = np.minimum(np.maximum(v, lo), hi)
            df = pd.DataFrame({"event_type": g, "s_raw": v, "s_win": w})
            out = df.groupby("event_type", as_index=False).agg(
                s_raw=("s_raw", "sum"), s_win=("s_win", "sum"),
                n=("s_raw", "size"),
            )
            return pa.Table.from_pandas(out, preserve_index=False)

        agg = (
            rel.grouped_aggregate(
                ev.map_batches(_clip, batch_format="pyarrow"),
                ["event_type"],
                {"s_raw": ("sum", "s_raw"), "s_win": ("sum", "s_win"), "n": ("sum", "n")},
            )
            .to_pandas()
            .sort_values("event_type", kind="mergesort")
            .reset_index(drop=True)
        )
        return pd.DataFrame({
            "event_type": agg["event_type"],
            "n": agg["n"].astype("int64"),
            "mean_raw": round_half_up((agg["s_raw"] / agg["n"]).to_numpy()),
            "mean_winsorized": round_half_up((agg["s_win"] / agg["n"]).to_numpy()),
        })

    def sketch_kmv_intersect(sf_dir):
        # theta-sketch set intersection (DataSketches semantics) with
        # a deterministic md5 KMV, k=64: estimated |click-users ∩
        # purchase-users| replays bit-identically in SQL (integer
        # hash compares, fixed division order); the exact count rides
        # one presence-flag combiner exchange for the error column.
        # k=64 < distinct-users at sf>=0.01 exercises the theta path;
        # sf0.001 (15 users) exercises the exact mode
        K = 64
        ev = _read(sf_dir, "events", ["user_id", "event_type"])

        def _side(kind):
            return ev.map_batches(
                lambda t, _k=kind: t.filter(pc.equal(t["event_type"], _k)).select(
                    ["user_id"]
                ),
                batch_format="pyarrow",
            )

        res = sk.kmv_intersect(_side("click"), _side("purchase"), "user_id", k=K)

        def _flags(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "user_id": t["user_id"].to_numpy(),
                "c": pc.equal(t["event_type"], "click").to_numpy(
                    zero_copy_only=False
                ).astype(np.int64),
                "p": pc.equal(t["event_type"], "purchase").to_numpy(
                    zero_copy_only=False
                ).astype(np.int64),
            })
            g = df.groupby("user_id", as_index=False).agg(c=("c", "max"), p=("p", "max"))
            return pa.Table.from_pandas(g, preserve_index=False)

        both = rel.grouped_aggregate(
            ev.map_batches(_flags, batch_format="pyarrow"),
            ["user_id"], {"c": ("max", "c"), "p": ("max", "p")},
        )

        def _gate(t: pa.Table) -> pa.Table:
            m = pc.and_(pc.equal(t["c"], 1), pc.equal(t["p"], 1))
            return pa.table({"n": pa.array([int(t.filter(m).num_rows)], pa.int64())})

        from ray.data.aggregate import Sum

        exact = int(
            both.map_batches(_gate, batch_format="pyarrow").aggregate(
                Sum("n", alias_name="n")
            )["n"]
        )
        return pd.DataFrame({
            "est_common_users": [float(round_half_up(np.array([res["est"]]))[0])],
            "theta": [float(round_half_up(np.array([res["theta"]]), 6)[0])],
            "exact_common_users": [np.int64(exact)],
        })

    def sketch_kmv_union(sf_dir):
        # theta-sketch set UNION: the union sketch IS the KMV of the
        # concatenated streams (Dataset.union — no extra operator
        # needed), so |click-users ∪ purchase-users| estimates with
        # the same k=64 estimator the intersect entry shares; exact
        # companion via one distinct exchange
        K = 64
        ev = _read(sf_dir, "events", ["user_id", "event_type"])

        def _side(kind):
            return ev.map_batches(
                lambda t, _k=kind: t.filter(pc.equal(t["event_type"], _k)).select(
                    ["user_id"]
                ),
                batch_format="pyarrow",
            )

        est = sk.kmv_distinct(_side("click").union(_side("purchase")), "user_id", k=K)
        exact = rel.distinct(
            ev.map_batches(
                lambda t: t.filter(
                    pc.is_in(
                        t["event_type"],
                        value_set=pa.array(["click", "purchase"]),
                    )
                ).select(["user_id"]),
                batch_format="pyarrow",
            ),
            "user_id",
        ).count()
        return pd.DataFrame({
            "est_union_users": [float(est)],
            "exact_union_users": [np.int64(exact)],
        })

    def ann_sq8(sf_dir):
        # scalar (int8) quantization ANN — the ES/Lucene int8 flat
        # baseline, completing the family beside PQ/IVF/RP-LSH: one
        # dim-sized min/max combiner trains the quantizer, the
        # per-dim grid broadcasts, scoring dequantizes codes and dots
        # the float queries in one vectorized pass, top-5 per query
        # rides the bounded group_topn. code/dequant arithmetic is a
        # fixed op-order chain so the whole thing replays in SQL
        from search_engine_ray.ops.ann import _to_matrix

        DIM = 64
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

        def _mm(t: pa.Table) -> pa.Table:
            m = _to_matrix(t["embedding"], DIM)
            return pa.table({
                "lo": pa.array([m.min(axis=0)], pa.list_(pa.float64())),
                "hi": pa.array([m.max(axis=0)], pa.list_(pa.float64())),
            })

        parts = emb.map_batches(_mm, batch_format="pyarrow").to_pandas()
        lo = np.min(np.stack(parts["lo"].to_numpy()), axis=0)
        hi = np.max(np.stack(parts["hi"].to_numpy()), axis=0)
        rng = hi - lo
        qt = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"],
            filters=[("vec_id", "in", [0, 1, 2])],
        )
        qm = _to_matrix(qt["embedding"], DIM)
        qids = qt["vec_id"].to_numpy().astype(np.int64)
        import ray as _ray

        bref = _ray.put((lo, hi, rng, qm, qids))

        def _score(t: pa.Table) -> pa.Table:
            blo, bhi, brng, bq, bqids = _ray.get(bref)
            m = _to_matrix(t["embedding"], DIM)
            code = np.clip(np.floor((m - blo) / brng * 256.0), 0.0, 255.0)
            dv = np.where(brng == 0.0, blo, blo + (code + 0.5) * brng / 256.0)
            s = dv @ bq.T  # (n, n_queries)
            n = len(t)
            ids = t["vec_id"].to_numpy()
            return pa.table({
                "qid": pa.array(np.repeat(bqids, n)),
                "vec_id": pa.array(np.tile(ids, len(bqids))),
                "score": pa.array(round_half_up(s.T.reshape(-1))),
            })

        top = rel.group_topn(
            emb.map_batches(_score, batch_format="pyarrow"),
            "qid", ["score", "vec_id"], 5, descending=[True, False],
        ).to_pandas()
        return (
            top.sort_values(["qid", "vec_id"], kind="mergesort")
            .reset_index(drop=True)[["qid", "vec_id", "score"]]
        )

    def t_expectations(sf_dir):
        # data-quality expectations (Great-Expectations-style
        # validation at scale): five constraint families over
        # lineitem, each a streaming masked count or ONE combiner
        # exchange — range, not-null, compound-key uniqueness
        # (excess rows = total - distinct pairs), a cross-table
        # temporal rule (ship >= order date via the sharded join),
        # and referential integrity (left_outer + null count). One
        # row per expectation with the violation count
        li = _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"],
        )

        from ray.data.aggregate import Sum

        def _local(t: pa.Table) -> pa.Table:
            q = t["l_quantity"].to_numpy()
            return pa.table({
                "range_viol": pa.array([int(((q < 1.0) | (q > 50.0)).sum())], pa.int64()),
                "null_viol": pa.array([int(t["l_orderkey"].null_count)], pa.int64()),
                "rows": pa.array([len(t)], pa.int64()),
            })

        loc = li.map_batches(_local, batch_format="pyarrow").aggregate(
            Sum("range_viol", alias_name="rv"), Sum("null_viol", alias_name="nv"),
            Sum("rows", alias_name="n"),
        )
        distinct_pairs = rel.distinct(li, ["l_orderkey", "l_linenumber"]).count()
        uniq_viol = int(loc["n"]) - int(distinct_pairs)
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
        j = rel.hash_join(
            li, orders, on=["l_orderkey"], right_on=["o_orderkey"],
            how="left_outer", num_partitions=8,
        )

        def _joined(t: pa.Table) -> pa.Table:
            od = t["o_orderdate"]
            orphan = int(od.null_count)
            sd = t["l_shipdate"].to_numpy()
            odv = od.to_numpy(zero_copy_only=False)
            ok = np.array([o is not None for o in odv.tolist()]) if orphan else np.ones(len(t), bool)
            late = int((sd[ok] < od.drop_null().to_numpy()).sum()) if ok.any() else 0
            return pa.table({
                "fk_viol": pa.array([orphan], pa.int64()),
                "temporal_viol": pa.array([late], pa.int64()),
            })

        jj = j.map_batches(_joined, batch_format="pyarrow").aggregate(
            Sum("fk_viol", alias_name="fk"), Sum("temporal_viol", alias_name="tv")
        )
        return pd.DataFrame({
            "expectation": [
                "quantity_in_range_1_50", "orderkey_not_null",
                "orderkey_linenumber_unique", "shipdate_after_orderdate",
                "orderkey_fk_in_orders",
            ],
            "violations": np.array(
                [int(loc["rv"]), int(loc["nv"]), uniq_viol, int(jj["tv"]), int(jj["fk"])],
                np.int64,
            ),
            "checked_rows": np.array([int(loc["n"])] * 5, np.int64),
        })

    def r71_late_events(sf_dir):
        # streaming watermark semantics replayed in batch (the
        # Flink/Beam allowed-lateness rule): per user the high-water
        # mark is the running max of PRIOR event times in arrival
        # order (new `cummax_prev` window spec); an event is late
        # when its time sits >3 days behind that mark. Arrival order
        # is a deterministic md5 permutation of event_id (the corpus
        # ts is monotone, so the permutation stands in for network
        # reordering). One user-sharded window exchange + a tiny
        # per-type rollup
        from search_engine_ray.ops.sketch import _md5_upper64

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        _FLIP = np.uint64(1 << 63)

        def _arr(t: pa.Table) -> pa.Table:
            h = _md5_upper64(
                [str(x) for x in t["event_id"].to_numpy(zero_copy_only=False)]
            )
            return t.append_column("arrival", pa.array((h ^ _FLIP).view(np.int64)))

        w = rel.window_functions(
            ev.map_batches(_arr, batch_format="pyarrow"),
            "user_id", "arrival", {"hw": ("cummax_prev", "ts")},
        )

        def _late(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            late = (
                df["hw"].notna()
                & (df["ts"] < df["hw"] - pd.Timedelta(days=3))
            ).to_numpy().astype(np.int64)
            g = pd.DataFrame({
                "event_type": df["event_type"], "late": late,
                "one": np.ones(len(df), np.int64),
            }).groupby("event_type", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        out = (
            rel.grouped_aggregate(
                w.map_batches(_late, batch_format="pyarrow"),
                ["event_type"],
                {"late_count": ("sum", "late"), "total": ("sum", "one")},
            )
            .to_pandas()
            .sort_values("event_type", kind="mergesort")
            .reset_index(drop=True)
        )
        out["late_count"] = out["late_count"].astype("int64")
        out["total"] = out["total"].astype("int64")
        return out[["event_type", "late_count", "total"]]

    def pipe_triangles(sf_dir):
        # distributed triangle counting (Suri & Vassilvitskii 2011
        # MapReduce shape) over the parts-co-ordered graph: co-order
        # edges dedup in one combiner exchange; wedges form by
        # joining the edge list with itself on the id-ordered apex
        # (each triangle x<y<z counted exactly once as the wedge
        # (x->y, x->z) closed by (y,z)); the close is a second
        # sharded two-key join. Wedge count folds from per-apex
        # degrees (c choose 2) without materializing wedges twice.
        # Degree-based orientation is the documented skew refinement
        # at clique-heavy scale; id order suffices here
        # edge derivation from the SHARED cooccur intermediate (one
        # write-once parquet artifact serves r72/r88/this — VERDICT
        # r04 #6); sentinel item-count rows (y = -1) filter out, the
        # c_xy counts drop, only the distinct edge set remains
        pairs = _cooccur_edges(sf_dir).map_batches(
            lambda t: t.filter(pc.not_equal(t["y"], -1)).select(["x", "y"]),
            batch_format="pyarrow",
        ).materialize()
        n_edges = pairs.count()
        outdeg = rel.grouped_aggregate(pairs, ["x"], {"c": ("count", "x")})

        def _wedgecnt(t: pa.Table) -> pa.Table:
            c = t["c"].to_numpy().astype(np.int64)
            return pa.table({"w": pa.array([int((c * (c - 1) // 2).sum())], pa.int64())})

        from ray.data.aggregate import Sum

        n_wedges = int(
            outdeg.map_batches(_wedgecnt, batch_format="pyarrow").aggregate(
                Sum("w", alias_name="w")
            )["w"]
        )
        wed = rel.hash_join(
            pairs, rel.rename(pairs, {"x": "x2", "y": "b"}),
            on=["x"], right_on=["x2"], num_partitions=8,
        )

        def _w(t: pa.Table) -> pa.Table:
            m = pc.less(t["y"], t["b"])
            tt = t.filter(m)
            return pa.table({"a": tt["y"], "b": tt["b"]})

        closed = rel.hash_join(
            wed.map_batches(_w, batch_format="pyarrow"),
            rel.rename(pairs, {"x": "cx", "y": "cy"}),
            on=["a", "b"], right_on=["cx", "cy"], num_partitions=8,
        )
        n_tri = closed.count()
        return pd.DataFrame({
            "edges": [np.int64(n_edges)],
            "wedges": [np.int64(n_wedges)],
            "triangles": [np.int64(n_tri)],
        })

    def t_bootstrap_means(sf_dir):
        # Poisson bootstrap (Chamandy et al., Google — THE
        # distributed bootstrap: each row contributes Poisson(1)
        # copies per replicate independently, so replicas never need
        # a global resample): 50 replicate means of events.value.
        # The Poisson draw inverts a deterministic md5 uniform
        # through the cdf ladder (5 literal thresholds, capped),
        # identical in SQL, so every replicate mean value-checks.
        # Per batch the (row x replicate) counts fold to one row per
        # replicate; the exchange carries 50 rows per block
        B = 50
        CDF = (
            0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
            0.9810118431238462, 0.9963401531726563,
        )
        from search_engine_ray.ops.sketch import _md5_upper64

        ev = _read(sf_dir, "events", ["event_id", "value"])
        TWO64 = 18446744073709551616.0

        def _partials(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            v = t["value"].to_numpy()
            bs, scv, sc = [], [], []
            for b in range(1, B + 1):
                u = _md5_upper64([f"{i}:{b}" for i in ids]).astype(np.float64) / TWO64
                cnt = np.zeros(len(ids), np.int64)
                for thr in CDF:
                    cnt += u >= thr
                bs.append(b)
                scv.append(float((cnt * v).sum()))
                sc.append(int(cnt.sum()))
            return pa.table({
                "b": pa.array(bs, pa.int64()),
                "scv": pa.array(scv),
                "sc": pa.array(sc, pa.int64()),
            })

        agg = (
            rel.grouped_aggregate(
                ev.map_batches(_partials, batch_format="pyarrow"),
                ["b"], {"scv": ("sum", "scv"), "sc": ("sum", "sc")},
            )
            .to_pandas()
            .sort_values("b", kind="mergesort")
            .reset_index(drop=True)
        )
        return pd.DataFrame({
            "b": agg["b"].astype("int64"),
            "mean_b": round_half_up((agg["scv"] / agg["sc"]).to_numpy()),
        })

    def r72_basket_rules(sf_dir):
        # market-basket association rules (Agrawal-Srikant support/
        # confidence/lift, the 2-itemset level): per-order distinct
        # part pairs count in one exchange, per-part order
        # frequencies in another (bounded by the part dimension and
        # broadcast back as sorted arrays); lift = c_xy * N /
        # (c_x * c_y) ranks the top-10 rules above min-support 2.
        # The support gate is deliberately NOT scale-proportional:
        # pair supports SHRINK as the part dimension grows (TPC-H
        # part count scales with sf), so an absolute >=5 empties the
        # rule set at sf0.1 (the round-3 driver-bench crash). >=2
        # ("co-occurred in at least two orders") is non-degenerate at
        # every sf, and the empty path below pins the output schema
        # anyway (empty Ray datasets yield schema-less frames).
        # pair counts WITHOUT a self-join: cooccur_pairs hash-shards
        # whole orders, generates each basket's C(m,2) pairs with
        # vectorized segment expansion, and pre-aggregates per shard;
        # with_item_counts rides the per-part order frequencies on the
        # SAME exchange as sentinel y=-1 rows, so ONE pass over
        # lineitem serves both tables (replaced the hash_join+filter
        # two-exchange plan: 27.6 s -> see BASELINE.md A/B). Served
        # from the SHARED write-once intermediate (VERDICT r04 #6).
        pi = _cooccur_edges(sf_dir)
        item_cnt = pi.map_batches(
            lambda t: t.filter(pc.equal(t["y"], -1)).select(["x", "c_xy"]),
            batch_format="pyarrow",
        ).to_pandas()
        pair_cnt = pi.map_batches(
            lambda t: t.filter(pc.not_equal(t["y"], -1)), batch_format="pyarrow"
        )
        ik = np.sort(item_cnt["x"].to_numpy(np.int64))
        ic = item_cnt.set_index("x")["c_xy"].loc[ik].to_numpy(np.float64)
        n_orders = float(
            pq.read_metadata(os.path.join(sf_dir, "orders.parquet")).num_rows
        )
        import ray as _ray

        iref = _ray.put((ik, ic))

        def _lift(t: pa.Table) -> pa.Table:
            kk, cc = _ray.get(iref)
            cxy = t["c_xy"].to_numpy().astype(np.float64)
            m = cxy >= 2.0
            x = t["x"].to_numpy()[m]
            y = t["y"].to_numpy()[m]
            cxy = cxy[m]
            cx = cc[np.searchsorted(kk, x)]
            cy = cc[np.searchsorted(kk, y)]
            return pa.table({
                "x": pa.array(x), "y": pa.array(y),
                "c_xy": pa.array(cxy.astype(np.int64)),
                "confidence": pa.array(round_half_up(cxy / cx)),
                "lift": pa.array(round_half_up(cxy * n_orders / (cx * cy))),
            })

        top = rel.topk(
            pair_cnt.map_batches(_lift, batch_format="pyarrow"),
            ["lift", "x", "y"], 10, descending=[True, False, False],
        ).to_pandas()
        if "lift" not in top.columns:  # all blocks empty -> schema-less frame
            top = pd.DataFrame({
                "x": pd.Series(dtype=np.int64), "y": pd.Series(dtype=np.int64),
                "c_xy": pd.Series(dtype=np.int64),
                "confidence": pd.Series(dtype=np.float64),
                "lift": pd.Series(dtype=np.float64),
            })
        return (
            top.sort_values(["lift", "x", "y"], ascending=[False, True, True], kind="mergesort")
            .reset_index(drop=True)[["x", "y", "c_xy", "confidence", "lift"]]
        )

    def r73_benford(sf_dir):
        # Benford first-digit forensics over o_totalprice: digit =
        # floor(v / 10^floor(log10 v)) (identical fp chain both
        # sides), counts fold in one 9-cell combiner, expected mass
        # log10(1 + 1/d), and the chi-square statistic closes the
        # fraud-screen report
        orders = _read(sf_dir, "orders", ["o_totalprice"])

        def _digits(t: pa.Table) -> pa.Table:
            v = t["o_totalprice"].to_numpy()
            v = v[v > 0.0]
            d = np.floor(v / np.power(10.0, np.floor(np.log10(v)))).astype(np.int64)
            cnt = np.bincount(d, minlength=10)[1:10]
            return pa.table({
                "d": pa.array(np.arange(1, 10, dtype=np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            })

        agg = (
            rel.grouped_aggregate(
                orders.map_batches(_digits, batch_format="pyarrow"),
                ["d"], {"n": ("sum", "n")},
            )
            .to_pandas()
            .sort_values("d", kind="mergesort")
            .reset_index(drop=True)
        )
        total = float(agg["n"].sum())
        exp_p = np.log10(1.0 + 1.0 / agg["d"].to_numpy().astype(np.float64))
        exp_n = total * exp_p
        chi2 = float(
            (((agg["n"].to_numpy().astype(np.float64) - exp_n) ** 2) / exp_n).sum()
        )
        out = pd.DataFrame({
            "d": agg["d"].astype("int64"),
            "n": agg["n"].astype("int64"),
            "expected": round_half_up(exp_n),
            "chi2_total": round_half_up(np.full(9, chi2)),
        })
        return out

    # ---- round-4 statistics / aggregation wave ----------------------

    _EV_ANCHOR_US = 1704067200000000  # epoch_us('2024-01-01'), events epoch

    def r74_grouped_ols(sf_dir):
        # grouped simple OLS (DuckDB regr_* family semantics): per
        # event_type fit of value on x = fractional days since the
        # events epoch. Five raw moments per group ride ONE combiner
        # exchange (x bounded 0..31, y bounded ~1e3, so raw-moment
        # sums stay fp-stable at any sf); slope/intercept/r2 fold
        # driver-side on k rows.
        ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

        def _partial(t: pa.Table) -> pa.Table:
            x = (t["ts"].cast(pa.int64()).to_numpy() - _EV_ANCHOR_US) / 86400e6
            y = t["value"].to_numpy().astype(np.float64)
            df = pd.DataFrame({
                "event_type": t["event_type"].to_pylist(),
                "n": 1.0, "sx": x, "sy": y,
                "sxx": x * x, "sxy": x * y, "syy": y * y,
            })
            g = df.groupby("event_type", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = rel.grouped_aggregate(
            ev.map_batches(_partial, batch_format="pyarrow"), ["event_type"],
            {c: ("sum", c) for c in ["n", "sx", "sy", "sxx", "sxy", "syy"]},
        ).to_pandas().sort_values("event_type", kind="mergesort")
        n = m["n"].to_numpy(); sx = m["sx"].to_numpy(); sy = m["sy"].to_numpy()
        sxx = m["sxx"].to_numpy(); sxy = m["sxy"].to_numpy(); syy = m["syy"].to_numpy()
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = num / den
        return pd.DataFrame({
            "event_type": m["event_type"].to_numpy(),
            "n": n.astype(np.int64),
            "slope": round_half_up(slope),
            "intercept": round_half_up((sy - slope * sx) / n),
            "r2": round_half_up(num * num / (den * (n * syy - sy * sy))),
        }).reset_index(drop=True)

    def r75_matrix_stats(sf_dir):
        # ES matrix_stats agg, full pairwise MATRIX form (r31 is the
        # two-column raw-moment variant): sample covariance +
        # correlation over (l_quantity, l_discount, l_tax) via the
        # TWO-PASS centered algorithm — pass 1 is a tiny mean
        # combiner, pass 2 folds centered cross-products per block
        # (numerically stable; the raw-moment form cancels
        # catastrophically on wide-magnitude columns, which is why
        # l_extendedprice is out of scope here). Oracle replays the
        # identical two-pass chain.
        cols = ["l_quantity", "l_discount", "l_tax"]
        li = _read(sf_dir, "lineitem", cols)
        agg = li.map_batches(
            lambda t: pa.table(
                {"n": pa.array([float(t.num_rows)])}
                | {f"s_{c}": pa.array([float(np.sum(t[c].to_numpy(zero_copy_only=False)))]) for c in cols}
            ),
            batch_format="pyarrow",
        ).to_pandas().sum()
        n = float(agg["n"])
        means = {c: float(agg[f"s_{c}"]) / n for c in cols}
        import ray as _ray

        mref = _ray.put(means)

        def _centered(t: pa.Table) -> pa.Table:
            mm = _ray.get(mref)
            v = {c: t[c].to_numpy(zero_copy_only=False).astype(np.float64) - mm[c] for c in cols}
            out = {}
            for i, a in enumerate(cols):
                for b in cols[i:]:
                    out[f"cp_{a}_{b}"] = pa.array([float(np.sum(v[a] * v[b]))])
            return pa.table(out)

        cp = li.map_batches(_centered, batch_format="pyarrow").to_pandas().sum()
        rows = []
        for i, a in enumerate(cols):
            for b in cols[i + 1:]:
                s_ab = float(cp[f"cp_{a}_{b}"])
                s_aa = float(cp[f"cp_{a}_{a}"])
                s_bb = float(cp[f"cp_{b}_{b}"])
                rows.append({
                    "f1": a, "f2": b,
                    "covar": float(round_half_up(np.array([s_ab / (n - 1.0)]))[0]),
                    "corr": float(round_half_up(np.array([s_ab / math.sqrt(s_aa * s_bb)]))[0]),
                })
        return pd.DataFrame(rows).sort_values(["f1", "f2"], kind="mergesort").reset_index(drop=True)

    def r76_anova(sf_dir):
        # one-way ANOVA F-statistic of value across the event_type
        # groups: per-group (n, sum, sumsq) ride one combiner
        # exchange; SSB/SSW fold driver-side on k rows (value bounded
        # ~1e3 keeps the raw-moment form fp-stable).
        ev = _read(sf_dir, "events", ["event_type", "value"])

        def _partial(t: pa.Table) -> pa.Table:
            y = t["value"].to_numpy().astype(np.float64)
            df = pd.DataFrame({
                "event_type": t["event_type"].to_pylist(),
                "n": 1.0, "s": y, "sq": y * y,
            })
            g = df.groupby("event_type", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = rel.grouped_aggregate(
            ev.map_batches(_partial, batch_format="pyarrow"), ["event_type"],
            {c: ("sum", c) for c in ["n", "s", "sq"]},
        ).to_pandas()
        ng = m["n"].to_numpy(); sg = m["s"].to_numpy(); qg = m["sq"].to_numpy()
        ntot = float(ng.sum()); k = float(len(m))
        grand = float(sg.sum()) / ntot
        mg = sg / ng
        ssb = float((ng * (mg - grand) ** 2).sum())
        ssw = float((qg - ng * mg * mg).sum())
        f_stat = (ssb / (k - 1.0)) / (ssw / (ntot - k))
        return pd.DataFrame({
            "k": [int(k)], "n": [int(ntot)],
            "f_stat": round_half_up(np.array([f_stat])),
        })

    def r77_percentiles_bucket(sf_dir):
        # ES percentiles_bucket pipeline agg: daily sums of value
        # (bucket table = #days, driver-bounded), then p25/p50/p75
        # with linear interpolation over the sorted bucket values —
        # numpy percentile == DuckDB quantile_cont.
        ev = _read(sf_dir, "events", ["ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "day": pa.array(t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()),
                "value": t["value"],
            })

        daily = rel.grouped_aggregate(
            ev.map_batches(_day, batch_format="pyarrow"), ["day"],
            {"s": ("sum", "value")},
        ).to_pandas()
        v = np.percentile(daily["s"].to_numpy(np.float64), [25, 50, 75], method="linear")
        return pd.DataFrame({
            "p": np.array([25, 50, 75], np.int64), "v": round_half_up(v),
        })

    def r78_entropy(sf_dir):
        # per-user Shannon entropy of the event-type mix: the
        # (user, event_type) count table is one exchange (bounded by
        # users x types, not events); the entropy folds per user in a
        # map_groups over <= k rows each.
        ev = _read(sf_dir, "events", ["user_id", "event_type"])
        c = rel.grouped_aggregate(
            ev, ["user_id", "event_type"], {"c": ("count", "event_type")}
        )

        def _h(df: pd.DataFrame) -> pd.DataFrame:
            cc = df["c"].to_numpy(np.float64)
            n = cc.sum()
            p = cc / n
            return pd.DataFrame({
                "user_id": [int(df["user_id"].iloc[0])],
                "n_events": [int(n)],
                "entropy": round_half_up(np.array([float(-(p * np.log(p)).sum())])),
            })

        out = (
            c.groupby("user_id").map_groups(_h, batch_format="pandas")
            .to_pandas().sort_values("user_id", kind="mergesort").reset_index(drop=True)
        )
        return out

    def _daily_sums(sf_dir):
        ev = _read(sf_dir, "events", ["ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "day": pa.array(t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()),
                "value": t["value"],
            })

        return (
            rel.grouped_aggregate(
                ev.map_batches(_day, batch_format="pyarrow"), ["day"],
                {"s": ("sum", "value")},
            )
            .to_pandas().sort_values("day", kind="mergesort").reset_index(drop=True)
        )

    def r92_ewma(sf_dir):
        # ES moving_fn ewma (alpha=0.3) over the daily value-sum
        # series: the recursion s_t = a*x_t + (1-a)*s_{t-1}, s_1 =
        # x_1, runs driver-side on the bounded bucket table; the
        # oracle replays the CLOSED FORM (powers of 1-a over the tiny
        # self-join) — different op order, equal at 4dp on a
        # 30-point series.
        daily = _daily_sums(sf_dir)
        x = daily["s"].to_numpy(np.float64)
        a = 0.3
        s = np.empty_like(x)
        s[0] = x[0]
        for i in range(1, x.size):
            s[i] = a * x[i] + (1 - a) * s[i - 1]
        return pd.DataFrame({
            "day": daily["day"].astype("int64"),
            "s": round_half_up(x),
            "ewma": round_half_up(s),
        })

    def t_ngram_coverage(sf_dir):
        # eval-set n-gram coverage (the inverse of decontamination:
        # how much of the benchmark's shingle space the TRAINING
        # corpus covers): eval shingles derive from the small eval
        # fixture and broadcast; one pass over the NON-eval corpus
        # marks covered shingles; the distinct fold is bounded by the
        # eval shingle set, never the corpus.
        ev = _eval_set(sf_dir)
        ev_rows = dd._shingle_rows_table(ev, "text", "doc_id", 3)
        ev_sh = np.unique(ev_rows["sh"].to_numpy(zero_copy_only=False))
        import ray as _ray

        ref = _ray.put(ev_sh)
        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def _covered(t: pa.Table) -> pa.Table:
            keep = pa.array(t["doc_id"].to_numpy() % 97 != 0)
            tt = t.filter(keep)
            if tt.num_rows == 0:
                return pa.table({"sh": pa.array([], pa.int64())})
            rows = dd._shingle_rows_table(tt, "text", "doc_id", 3)
            sh = rows["sh"].to_numpy(zero_copy_only=False)
            evs = _ray.get(ref)
            pos = np.clip(np.searchsorted(evs, sh), 0, evs.size - 1)
            hit = np.unique(sh[evs[pos] == sh])  # block-local dedupe
            return pa.table({"sh": pa.array(hit, pa.int64())})

        cov = rel.distinct(
            docs.map_batches(_covered, batch_format="pyarrow"), ["sh"]
        ).count()
        n_eval = int(ev_sh.size)
        return pd.DataFrame({
            "n_eval": [np.int64(n_eval)],
            "n_cov": [np.int64(cov)],
            "coverage": round_half_up(np.array([cov / n_eval if n_eval else 0.0])),
        })

    def r91_crosstab_chi2(sf_dir):
        # chi-square test of independence over the lang x source
        # contingency table: the (lang, source) counts are one
        # combiner exchange bounded by |langs| x |sources|; the FULL
        # cross product (zero cells included — they contribute their
        # expected mass) closes driver-side.
        docs = _read(sf_dir, "documents", ["lang", "source"])
        c = (
            rel.grouped_aggregate(docs, ["lang", "source"], {"o": ("count", "lang")})
            .to_pandas()
        )
        piv = c.pivot_table(
            index="lang", columns="source", values="o", fill_value=0, aggfunc="sum"
        ).astype(np.float64)
        o = piv.to_numpy()
        n = o.sum()
        e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
        chi2 = float(((o - e) ** 2 / e).sum())
        dof = (o.shape[0] - 1) * (o.shape[1] - 1)
        return pd.DataFrame({
            "n": [np.int64(n)], "dof": [np.int64(dof)],
            "chi2": round_half_up(np.array([chi2])),
        })

    def r89_mann_kendall(sf_dir):
        # Mann-Kendall trend test on the daily value-sum series: the
        # combiner exchange is the day histogram; S = sum of pairwise
        # sign(x_j - x_i) and the no-ties variance close on the
        # driver-bounded series (continuous sums -> no tie
        # correction, same convention both sides).
        daily = _daily_sums(sf_dir)
        x = daily["s"].to_numpy(np.float64)
        n = x.size
        diff = np.sign(x[None, :] - x[:, None])
        S = float(np.triu(diff, 1).sum())
        var = n * (n - 1) * (2 * n + 5) / 18.0
        z = (S - 1) / math.sqrt(var) if S > 0 else ((S + 1) / math.sqrt(var) if S < 0 else 0.0)
        return pd.DataFrame({
            "n_days": [np.int64(n)], "s_stat": [np.int64(S)],
            "z": round_half_up(np.array([z])),
        })

    def r90_runs_test(sf_dir):
        # Wald-Wolfowitz runs test on the daily up/down move sequence:
        # day-over-day diff signs from the bounded series, R = runs,
        # z = (R - mu) / sigma with the exact two-type run moments.
        daily = _daily_sums(sf_dir)
        x = daily["s"].to_numpy(np.float64)
        sgn = np.sign(np.diff(x))
        sgn = sgn[sgn != 0.0]
        n1 = float((sgn > 0).sum()); n2 = float((sgn < 0).sum())
        runs = 1 + int((sgn[1:] != sgn[:-1]).sum())
        mu = 2 * n1 * n2 / (n1 + n2) + 1
        var = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)) / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        z = (runs - mu) / math.sqrt(var)
        return pd.DataFrame({
            "n_up": [np.int64(n1)], "n_down": [np.int64(n2)],
            "runs": [np.int64(runs)], "z": round_half_up(np.array([z])),
        })

    def r88_degree_dist(sf_dir):
        # degree distribution of the co-order part graph (the skew
        # telemetry that decides salting/orientation for the graph
        # ops): undirected degrees fold from the cooccur edge set
        # (each edge contributes to both endpoints), then a
        # (degree, n_nodes) histogram bounded by max degree.
        # served from the SHARED cooccur intermediate (VERDICT r04 #6
        # — this entry previously recomputed the whole edge set that
        # r72/pipe_triangles also derive: 5.5 s of its 5.5 s). Both
        # folds pre-combine per batch with np.unique so the exchanges
        # move (node, partial-count) rows bounded by the part
        # dimension, never the 2x-edge endpoint list (the r72
        # generic-Aggregate lesson).
        edges = _cooccur_edges(sf_dir)

        def _deg_partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(t["y"], -1))  # drop item-count sentinels
            nodes = np.concatenate([
                t["x"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["y"].to_numpy(zero_copy_only=False).astype(np.int64),
            ])
            u, c = np.unique(nodes, return_counts=True)
            return pa.table({
                "node": pa.array(u, pa.int64()),
                "dcnt": pa.array(c.astype(np.int64), pa.int64()),
            })

        # coarse batches (256k pair rows) so each partial is bounded
        # by the part dimension, then a driver fold of the few
        # dimension-bounded partial tables (documented bound: #tasks x
        # |parts| rows — the 'tiny bucket table' pattern; a Ray hash
        # aggregate here costs 5 s moving 1.3M near-unreduced rows)
        pdf = edges.map_batches(
            _deg_partial, batch_format="pyarrow", batch_size=256 * 1024
        ).to_pandas()
        deg = pdf.groupby("node")["dcnt"].sum()
        hist = deg.value_counts().sort_index()
        return pd.DataFrame({
            "degree": hist.index.to_numpy().astype(np.int64),
            "n_nodes": hist.to_numpy().astype(np.int64),
        })

    def e21_hive_pruning(sf_dir):
        # partition-pruned read (the 'prune at the read' axis as an
        # explicit op): events written hive-partitioned by event_type
        # (mtime-keyed cache), then ONE partition's directory read
        # back — file-level pruning, the other partitions never leave
        # storage — and rolled up per day.
        import ray.data as rd

        src = os.path.join(sf_dir, "events.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        part_dir = f"/tmp/ser_hive_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        if not os.path.exists(os.path.join(part_dir, "_DONE")):
            import shutil

            shutil.rmtree(part_dir, ignore_errors=True)
            _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"]).write_parquet(
                part_dir, partition_cols=["event_type"]
            )
            open(os.path.join(part_dir, "_DONE"), "w").write("ok")
        clicks = rd.read_parquet(os.path.join(part_dir, "event_type=click"))

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "day": pa.array(t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()),
                "value": t["value"],
            })

        out = (
            rel.grouped_aggregate(
                clicks.map_batches(_day, batch_format="pyarrow"), ["day"],
                {"cnt": ("count", "value"), "s": ("sum", "value")},
            )
            .to_pandas().sort_values("day", kind="mergesort").reset_index(drop=True)
        )
        out["cnt"] = out["cnt"].astype("int64")
        out["s"] = round_half_up(out["s"].to_numpy(np.float64))
        return out[["day", "cnt", "s"]]

    def s90_explain(sf_dir):
        # Lucene IndexSearcher.explain as a page: the s3 conjunction's
        # top-10 with PER-CLAUSE contribution columns — each clause
        # re-scored through the same float64 op-order scoring core
        # restricted to the doc's bucket, so c0 + c1 reproduces the
        # search score exactly; the oracle writes both per-term BM25
        # contributions out in SQL.
        eng = _doc_engine(sf_dir)
        q = Compound(must=(Term("text", "hash"), Term("text", "join")))
        res = eng.search(q, k=10, with_metadata=False)
        rows = []
        for d in res.hits["doc_id"].tolist():
            ex = eng.explain(q, int(d))
            cs = [c["score"] for c in ex["clauses"]]
            rows.append({
                "doc_id": np.int64(d),
                "c0": float(round_half_up(np.array([cs[0]]))[0]),
                "c1": float(round_half_up(np.array([cs[1]]))[0]),
                "score": float(round_half_up(np.array([cs[0] + cs[1]]))[0]),
            })
        return pd.DataFrame(rows, columns=["doc_id", "c0", "c1", "score"])

    def t_cluster_sizes(sf_dir):
        # duplicate-cluster size distribution (the dedup telemetry a
        # curation run reports: how many pairs/triples/… of near-dups
        # exist): exact-recall pair set -> distributed min-label
        # components -> per-component size -> (size, n_components)
        # histogram. Sizes fold per component in one exchange bounded
        # by #paired-docs; the histogram is component-count-bounded.
        pairs = dd.ngram_jaccard_pairs(_docs_with_near_dups(sf_dir), threshold=0.5)
        comp = dd.connected_components(pairs)
        sizes = rel.grouped_aggregate(
            comp, ["component"], {"size": ("count", "component")}
        )
        out = (
            rel.grouped_aggregate(sizes, ["size"], {"n_components": ("count", "size")})
            .to_pandas().sort_values("size", kind="mergesort").reset_index(drop=True)
        )
        out["size"] = out["size"].astype("int64")
        out["n_components"] = out["n_components"].astype("int64")
        return out[["size", "n_components"]]

    def r87_seasonal_anomaly(sf_dir):
        # day-of-week seasonal anomaly screen: daily sums (bounded
        # bucket table) -> per-dow profile (mean, population sd) ->
        # z-score per day -> top-3 |z| anomalies. The combiner
        # exchange is the day histogram; everything after runs on
        # #days rows driver-side.
        ev = _read(sf_dir, "events", ["ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "day": pa.array(t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()),
                "value": t["value"],
            })

        daily = (
            rel.grouped_aggregate(
                ev.map_batches(_day, batch_format="pyarrow"), ["day"],
                {"s": ("sum", "value")},
            )
            .to_pandas().sort_values("day", kind="mergesort").reset_index(drop=True)
        )
        day = daily["day"].to_numpy(np.int64)
        s = daily["s"].to_numpy(np.float64)
        dow = day % 7
        m = np.zeros(7); sd = np.zeros(7)
        for w in range(7):
            vals = s[dow == w]
            m[w] = vals.mean()
            sd[w] = vals.std()  # population sd == stddev_pop
        z = (s - m[dow]) / sd[dow]
        order = np.lexsort((day, -np.abs(z)))[:3]
        return pd.DataFrame({
            "day": day[order],
            "dow": dow[order].astype(np.int64),
            "s": round_half_up(s[order]),
            "z": round_half_up(z[order]),
        })

    def r86_gini(sf_dir):
        # Gini coefficient of o_totalprice (the inequality/skew
        # diagnostic — the same measure that flags hot-key skew in a
        # shuffle): ONE global sort, then each sorted block reports
        # (min, count, sum_x, sum_local_rank*x) and the driver folds
        # sum(rank*x) = sum_blk(offset*sum_x + sum_local) over the
        # #blocks-sized summary. Rank permutation among ties leaves
        # the statistic unchanged, so block tie-order is irrelevant.
        orders = _read(sf_dir, "orders", ["o_totalprice"])
        srt = orders.sort("o_totalprice")

        def _blk(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"mn": pa.array([], pa.float64()),
                                 "cnt": pa.array([], pa.int64()),
                                 "sx": pa.array([], pa.float64()),
                                 "slx": pa.array([], pa.float64())})
            x = t["o_totalprice"].to_numpy().astype(np.float64)
            loc = np.arange(1, x.size + 1, dtype=np.float64)
            return pa.table({
                "mn": pa.array([float(x[0])], pa.float64()),
                "cnt": pa.array([int(x.size)], pa.int64()),
                "sx": pa.array([float(x.sum())], pa.float64()),
                "slx": pa.array([float((loc * x).sum())], pa.float64()),
            })

        meta = (
            srt.map_batches(_blk, batch_format="pyarrow")
            .to_pandas().sort_values("mn", kind="mergesort")
        )
        cnt = meta["cnt"].to_numpy(np.int64)
        off = np.concatenate(([0], np.cumsum(cnt)))[:-1].astype(np.float64)
        n = float(cnt.sum())
        sx = float(meta["sx"].sum())
        srx = float((off * meta["sx"].to_numpy()).sum() + meta["slx"].sum())
        gini = 2.0 * srx / (n * sx) - (n + 1.0) / n
        return pd.DataFrame({
            "n": [np.int64(n)], "gini": round_half_up(np.array([gini])),
        })

    def t_char_entropy(sf_dir):
        # per-doc character-level Shannon entropy (the gibberish /
        # binary-noise screen beside the Gopher word rules): texts
        # concatenate once per batch, codepoints come from a utf-32
        # view (no per-char Python loop), and per-(doc, char) run
        # counts fold into per-doc entropies with segment sums.
        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def _ent(t: pa.Table) -> pa.Table:
            texts = [x or "" for x in t["text"].to_pylist()]
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            lens = np.array([len(s) for s in texts], np.int64)
            keep = lens > 0
            joined = "".join(texts)
            codes = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
            parents = np.repeat(np.arange(len(texts)), lens)
            o = np.lexsort((codes, parents))
            p, c = parents[o], codes[o]
            first = np.ones(p.size, dtype=bool)
            first[1:] = (p[1:] != p[:-1]) | (c[1:] != c[:-1])
            starts = np.flatnonzero(first)
            runs = np.diff(np.concatenate((starts, [p.size]))).astype(np.float64)
            rp = p[starts]  # parent per run
            pr = runs / lens[rp].astype(np.float64)
            terms = -(pr * np.log(pr))
            ent = np.zeros(len(texts), np.float64)
            np.add.at(ent, rp, terms)
            return pa.table({
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_ch": pa.array(lens[keep], pa.int64()),
                "char_entropy": pa.array(round_half_up(ent[keep]), pa.float64()),
            })

        return docs.map_batches(_ent, batch_format="pyarrow")

    def t_langid_eval(sf_dir):
        # language-ID evaluation: confusion matrix of the corpus's
        # declared lang vs the n-gram heuristic's prediction — the
        # (lang, pred) count table is one combiner exchange bounded
        # by |langs|^2; the same quality-eval shape any classifier
        # stage gets before shipping a filter at 100 TB.
        docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        pred = txt.add_lang_id(docs, "text")

        def _pairs(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "lang": t["lang"].to_pylist(),
                "pred": t["lang_id"].to_pylist(),
                "cnt": 1,
            })
            g = df.groupby(["lang", "pred"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        out = (
            rel.grouped_aggregate(
                pred.map_batches(_pairs, batch_format="pyarrow"),
                ["lang", "pred"], {"cnt": ("sum", "cnt")},
            )
            .to_pandas().sort_values(["lang", "pred"], kind="mergesort")
            .reset_index(drop=True)
        )
        out["cnt"] = out["cnt"].astype("int64")
        return out[["lang", "pred", "cnt"]]

    def r85_normalize(sf_dir):
        # ES normalize pipeline agg: daily value sums carry
        # percent_of_sum and 0-1 rescale columns — sibling-bucket
        # normalizations over the driver-bounded bucket table.
        ev = _read(sf_dir, "events", ["ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "day": pa.array(t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()),
                "value": t["value"],
            })

        daily = (
            rel.grouped_aggregate(
                ev.map_batches(_day, batch_format="pyarrow"), ["day"],
                {"s": ("sum", "value")},
            )
            .to_pandas().sort_values("day", kind="mergesort").reset_index(drop=True)
        )
        v = daily["s"].to_numpy(np.float64)
        return pd.DataFrame({
            "day": daily["day"].astype("int64"),
            "s": round_half_up(v),
            "pct_of_sum": round_half_up(v / v.sum()),
            "rescaled": round_half_up((v - v.min()) / (v.max() - v.min())),
        })

    def r83_transitions(sf_dir):
        # first-order Markov transition matrix of the per-user event
        # stream: users hash-shard (whole user -> one shard), each
        # shard lexsorts (user, ts, event_id) and counts consecutive
        # (from, to) pairs vectorized; the exchange then moves only
        # the (from, to, cnt) table (bounded by |types|^2); row
        # probabilities close on that tiny table driver-side.
        ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

        def _bucket(t: pa.Table) -> pa.Table:
            u = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({
                "_b": pa.array((u * np.int64(2654435761)) % np.int64(64), pa.int64()),
                "u": pa.array(u, pa.int64()),
                "ts": t["ts"].cast(pa.int64()),
                "eid": t["event_id"].cast(pa.int64()),
                "et": t["event_type"],
            })

        def _pairs(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            ts = t["ts"].to_numpy(zero_copy_only=False)
            eid = t["eid"].to_numpy(zero_copy_only=False)
            et = np.asarray(t["et"].to_pylist(), dtype=object)
            o = np.lexsort((eid, ts, u))
            u, et = u[o], et[o]
            same = u[1:] == u[:-1]
            df = pd.DataFrame({
                "from_type": et[:-1][same], "to_type": et[1:][same], "cnt": 1
            })
            g = df.groupby(["from_type", "to_type"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = rel.grouped_aggregate(
            ev.map_batches(_bucket, batch_format="pyarrow")
            .groupby("_b").map_groups(_pairs, batch_format="pyarrow"),
            ["from_type", "to_type"], {"cnt": ("sum", "cnt")},
        ).to_pandas().sort_values(["from_type", "to_type"], kind="mergesort").reset_index(drop=True)
        tot = m.groupby("from_type")["cnt"].transform("sum").to_numpy(np.float64)
        m["cnt"] = m["cnt"].astype("int64")
        m["prob"] = round_half_up(m["cnt"].to_numpy(np.float64) / tot)
        return m[["from_type", "to_type", "cnt", "prob"]]

    def r84_conversion_lag(sf_dir):
        # click -> purchase conversion lag: users hash-shard, each
        # shard computes per-user first-click ts and first purchase
        # strictly after it (in-shard vectorized merge — users are
        # co-located so no cross-shard join), and only (n_users,
        # n_converted, sum_lag) partials fold globally.
        ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

        def _bucket(t: pa.Table) -> pa.Table:
            u = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({
                "_b": pa.array((u * np.int64(2654435761)) % np.int64(64), pa.int64()),
                "u": pa.array(u, pa.int64()),
                "ts": t["ts"].cast(pa.int64()),
                "et": t["event_type"],
            })

        def _lag(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "u": t["u"].to_numpy(zero_copy_only=False),
                "ts": t["ts"].to_numpy(zero_copy_only=False),
                "et": t["et"].to_pylist(),
            })
            clicks = df[df["et"] == "click"].groupby("u")["ts"].min()
            if clicks.empty:
                return pa.table({"n_users": pa.array([0], pa.int64()),
                                 "n_conv": pa.array([0], pa.int64()),
                                 "sum_lag": pa.array([0.0], pa.float64())})
            pur = df[df["et"] == "purchase"][["u", "ts"]].merge(
                clicks.rename("c_ts"), left_on="u", right_index=True
            )
            pur = pur[pur["ts"] > pur["c_ts"]]
            fp = pur.groupby("u").agg(p_ts=("ts", "min"), c_ts=("c_ts", "min"))
            lag_s = (fp["p_ts"] - fp["c_ts"]).to_numpy(np.float64) / 1e6
            return pa.table({
                "n_users": pa.array([int(len(clicks))], pa.int64()),
                "n_conv": pa.array([int(len(fp))], pa.int64()),
                "sum_lag": pa.array([float(lag_s.sum())], pa.float64()),
            })

        parts = (
            ev.map_batches(_bucket, batch_format="pyarrow")
            .groupby("_b").map_groups(_lag, batch_format="pyarrow")
            .to_pandas()
        )
        n_users = int(parts["n_users"].sum())
        n_conv = int(parts["n_conv"].sum())
        mean_lag = float(parts["sum_lag"].sum()) / n_conv if n_conv else 0.0
        return pd.DataFrame({
            "n_users": [np.int64(n_users)], "n_conv": [np.int64(n_conv)],
            "mean_lag_s": round_half_up(np.array([mean_lag])),
        })

    def t_novelty(sf_dir):
        # per-doc n-gram novelty (RefinedWeb curation signal): frac of
        # a doc's distinct 3-shingles whose earliest holder (min
        # doc_id) is the doc itself — shingle->min(doc) combiner, one
        # co-hash join back, per-doc fold; nothing broadcasts
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return dd.novelty_fractions(docs, "text", "doc_id", w=3)

    def r82_autocorr(sf_dir):
        # lag-1 autocorrelation of the daily value-sum series: the
        # bucket table is driver-bounded (#days); the Pearson fold on
        # (x_t, x_{t-1}) runs on that tiny series with the identical
        # raw-moment chain the SQL replays
        ev = _read(sf_dir, "events", ["ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "day": pa.array(t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()),
                "value": t["value"],
            })

        daily = (
            rel.grouped_aggregate(
                ev.map_batches(_day, batch_format="pyarrow"), ["day"],
                {"s": ("sum", "value")},
            )
            .to_pandas().sort_values("day", kind="mergesort")
        )
        v = daily["s"].to_numpy(np.float64)
        x, y = v[:-1], v[1:]
        n = float(x.size)
        sx, sy = x.sum(), y.sum()
        sxx, sxy, syy = (x * x).sum(), (x * y).sum(), (y * y).sum()
        acf1 = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        return pd.DataFrame({
            "n_lags": [np.int64(n)],
            "acf1": round_half_up(np.array([acf1])),
        })

    def r80_change_point(sf_dir):
        # ES change_point agg (CUSUM screen) over a day histogram:
        # daily sums fold in one combiner exchange (bucket table =
        # #days, driver-bounded); the CUSUM S_k = cumsum(x - mean)
        # and argmax |S_k| close on the tiny bucket series.
        ev = _read(sf_dir, "events", ["ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "day": pa.array(t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()),
                "value": t["value"],
            })

        daily = (
            rel.grouped_aggregate(
                ev.map_batches(_day, batch_format="pyarrow"), ["day"],
                {"s": ("sum", "value")},
            )
            .to_pandas().sort_values("day", kind="mergesort")
        )
        x = daily["s"].to_numpy(np.float64)
        cu = np.cumsum(x - float(x.sum()) / x.size)
        k = int(np.argmax(np.abs(cu)))
        return pd.DataFrame({
            "change_day": [np.int64(daily["day"].iloc[k])],
            "magnitude": round_half_up(np.array([abs(cu[k])])),
        })

    def t_zipf(sf_dir):
        # Zipf's-law fit over the corpus token frequency distribution:
        # the (token, count) table is the vocabulary-bounded combiner
        # output; rank by (count desc, token) and the log-log OLS
        # slope (the Zipf exponent) folds driver-side on vocab rows.
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        toks = txt.explode_tokens(docs, "text", ["doc_id"]).select_columns(["token"])
        counts = rel.value_counts(toks, "token", alias="cnt").to_pandas()
        counts = counts.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        lr = np.log(np.arange(1, len(counts) + 1, dtype=np.float64))
        lc = np.log(counts["cnt"].to_numpy(np.float64))
        n = float(lr.size)
        sx, sy = lr.sum(), lc.sum()
        sxx, sxy = (lr * lr).sum(), (lr * lc).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return pd.DataFrame({
            "n_types": [np.int64(len(counts))],
            "zipf_s": round_half_up(np.array([-slope])),
            "intercept": round_half_up(np.array([(sy - slope * sx) / n])),
        })

    def r81_two_proportions(sf_dir):
        # A/B two-proportion z-test: cohort = parity of the json
        # payload's k (r2-style JSON extraction in the batch kernel),
        # success = purchase events; per-cohort (n, s) ride one
        # 2-row combiner, the pooled z folds driver-side.
        ev = _read(sf_dir, "events", ["event_type", "props"])

        def _partial(t: pa.Table) -> pa.Table:
            k = pc.cast(
                pc.struct_field(pc.extract_regex(t["props"], r'"k": (?P<k>\d+)'), "k"),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            grp = (k % 2).astype(np.int64)
            succ = (np.asarray(t["event_type"]) == "purchase").astype(np.int64)
            df = pd.DataFrame({"grp": grp, "n": 1, "s": succ})
            g = df.groupby("grp", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = rel.grouped_aggregate(
            ev.map_batches(_partial, batch_format="pyarrow"), ["grp"],
            {"n": ("sum", "n"), "s": ("sum", "s")},
        ).to_pandas().set_index("grp")
        n1, s1 = float(m.loc[0, "n"]), float(m.loc[0, "s"])
        n2, s2 = float(m.loc[1, "n"]), float(m.loc[1, "s"])
        p1, p2 = s1 / n1, s2 / n2
        pool = (s1 + s2) / (n1 + n2)
        z = (p1 - p2) / math.sqrt(pool * (1 - pool) * (1 / n1 + 1 / n2))
        return pd.DataFrame({
            "n1": [np.int64(n1)], "n2": [np.int64(n2)],
            "p1": round_half_up(np.array([p1])),
            "p2": round_half_up(np.array([p2])),
            "z_stat": round_half_up(np.array([z])),
        })

    def r79_ks_test(sf_dir):
        # distributed two-sample Kolmogorov-Smirnov: D = sup over the
        # merged value set of |F1 - F2|. The (value, c1, c2) table
        # folds in one combiner exchange (one row per DISTINCT value,
        # so sort blocks cannot split a tie); the global sort is the
        # one legitimate all-to-all; per-block ECDF offsets come from
        # a block-summary table that is #blocks-sized (driver-bounded)
        # and broadcast back by each block's min value. D folds as a
        # max of per-block maxima.
        ev = _read(sf_dir, "events", ["event_type", "value"])

        def _pv(t: pa.Table) -> pa.Table:
            m = pc.is_in(t["event_type"], value_set=pa.array(["purchase", "click"]))
            tt = t.filter(m)
            df = pd.DataFrame({
                "value": tt["value"].to_numpy(zero_copy_only=False),
                "c1": (np.asarray(tt["event_type"]) == "purchase").astype(np.int64),
            })
            df["c2"] = 1 - df["c1"]
            g = df.groupby("value", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        pv = rel.grouped_aggregate(
            ev.map_batches(_pv, batch_format="pyarrow"), ["value"],
            {"c1": ("sum", "c1"), "c2": ("sum", "c2")},
        )
        srt = pv.sort("value").materialize()
        meta = srt.map_batches(
            lambda t: pa.table({
                "mn": pa.array([float(t["value"][0].as_py())] if t.num_rows else [], pa.float64()),
                "s1": pa.array([int(np.sum(t["c1"].to_numpy()))] if t.num_rows else [], pa.int64()),
                "s2": pa.array([int(np.sum(t["c2"].to_numpy()))] if t.num_rows else [], pa.int64()),
            }),
            batch_format="pyarrow",
        ).to_pandas().sort_values("mn", kind="mergesort")
        n1 = float(meta["s1"].sum()); n2 = float(meta["s2"].sum())
        off1 = np.concatenate(([0], np.cumsum(meta["s1"].to_numpy())))[:-1]
        off2 = np.concatenate(([0], np.cumsum(meta["s2"].to_numpy())))[:-1]
        import ray as _ray

        oref = _ray.put((meta["mn"].to_numpy(np.float64), off1, off2))

        def _dmax(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"d": pa.array([], pa.float64())})
            mns, o1, o2 = _ray.get(oref)
            bi = int(np.searchsorted(mns, float(t["value"][0].as_py())))
            f1 = (o1[bi] + np.cumsum(t["c1"].to_numpy())) / n1
            f2 = (o2[bi] + np.cumsum(t["c2"].to_numpy())) / n2
            return pa.table({"d": pa.array([float(np.max(np.abs(f1 - f2)))], pa.float64())})

        from ray.data.aggregate import Max as _Max

        d = float(
            srt.map_batches(_dmax, batch_format="pyarrow")
            .aggregate(_Max("d", alias_name="d"))["d"]
        )
        return pd.DataFrame({
            "n1": [np.int64(n1)], "n2": [np.int64(n2)],
            "d_stat": round_half_up(np.array([d])),
        })

    def dedup_containment(sf_dir):
        # Broder containment near-dup (the subset-duplicate case:
        # |A∩B| / min(|A|,|B|) ~ 1.0 when a short doc embeds verbatim
        # in a longer one while Jaccard stays low) — same exact-recall
        # shared-shingle blocking as dedup_ngram, asymmetric score
        return dd.ngram_jaccard_pairs(
            _docs_with_near_dups(sf_dir), threshold=0.8, metric="containment"
        )

    def s89_terms_enum(sf_dir):
        # ES terms_enum API: lexicographically-first index dictionary
        # terms under a prefix — served straight from the term
        # dictionary (no postings touched), the same structure the s2
        # prefix expansion walks.
        eng = _doc_engine(sf_dir)
        from search_engine_ray.query.qast import Prefix as _Prefix

        keys = sorted(eng._expand_prefix(_Prefix("text", "s")))[:20]
        prefix_len = len(eng.config.term_key("text", ""))
        return pd.DataFrame({"term": [k[prefix_len:] for k in keys]})

    # ---- round-5 wave 1 -------------------------------------------------
    def r93_date_range(sf_dir):
        # ES date_range aggregation: custom calendar band edges with
        # open ends ((-inf, Jan 10), [Jan 10, Jan 20), [Jan 20, inf)),
        # count + sum(value) per band. Vectorized banding
        # (np.searchsorted on the two broadcast edges) feeds a 3-row
        # combiner exchange; edges are fixed calendar dates (the
        # events generator spans Jan 2024 at every sf — scale-free).
        ev = _read(sf_dir, "events", ["ts", "value"])
        e1 = np.datetime64("2024-01-10T00:00:00", "us").astype(np.int64)
        e2 = np.datetime64("2024-01-20T00:00:00", "us").astype(np.int64)
        labels = ["*-2024-01-10", "2024-01-10-2024-01-20", "2024-01-20-*"]

        def _band(t: pa.Table) -> pa.Table:
            ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            band = np.searchsorted(np.array([e1, e2], np.int64), ts, side="right")
            v = t["value"].to_numpy()
            cnt = np.bincount(band, minlength=3)
            sv = np.bincount(band, weights=v, minlength=3)
            return pa.table({
                "band": pa.array(labels, pa.string()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
                "sv": pa.array(sv, pa.float64()),
            })

        agg = (
            rel.grouped_aggregate(
                ev.map_batches(_band, batch_format="pyarrow"),
                ["band"], {"n": ("sum", "n"), "sv": ("sum", "sv")},
            )
            .to_pandas().sort_values("band", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "band": agg["band"],
            "n": agg["n"].astype("int64"),
            "sum_value": round_half_up(agg["sv"].to_numpy()),
        })

    def r94_first_last(sf_dir):
        # SQL FIRST_VALUE / LAST_VALUE / NTH_VALUE(2) over the whole
        # partition (per-user event stream ordered by ts) — the window
        # kernel's whole-partition-frame family; the oracle spells out
        # ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        # (LAST_VALUE's default frame stops at CURRENT ROW).
        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        out = (
            rel.window_functions(
                ev, "user_id", ["ts", "event_id"],
                {
                    "first_et": ("first_value", "event_type"),
                    "last_et": ("last_value", "event_type"),
                    "second_et": ("nth_value", "event_type", 2),
                },
            )
            .to_pandas().sort_values("event_id", kind="mergesort").reset_index(drop=True)
        )
        return out[["event_id", "user_id", "first_et", "last_et", "second_et"]]

    def _avg_rank_map(ds, col):
        # SQL tie-average ranks without a global sort-exchange:
        # coarse-batch (value, count) partials (np.unique per 256k-row
        # batch), folded on the driver — the result is bounded by the
        # column's DISTINCT count (the documented contract, same as
        # sketch_quantiles; a Ray hash aggregate here moved the same
        # rows through a full exchange for 7 s at sf0.1). Average
        # ranks come from cumulative offsets:
        #   rank_avg(v) = (#values < v) + (count(v) + 1) / 2
        def _p(t: pa.Table) -> pa.Table:
            u, c = np.unique(t[col].to_numpy(zero_copy_only=False), return_counts=True)
            return pa.table({col: pa.array(u), "cnt": pa.array(c.astype(np.int64))})

        pdf = ds.select_columns([col]).map_batches(
            _p, batch_format="pyarrow", batch_size=256 * 1024
        ).to_pandas()
        h = (
            pdf.groupby(col, as_index=False)["cnt"].sum()
            .sort_values(col, kind="mergesort")
        )
        vals = h[col].to_numpy()
        cnt = h["cnt"].to_numpy().astype(np.float64)
        start = np.concatenate(([0.0], np.cumsum(cnt)[:-1]))
        return vals, start + (cnt + 1.0) / 2.0, cnt

    def r95_spearman(sf_dir):
        # Spearman rank correlation rho(l_quantity, l_extendedprice):
        # tie-average ranks for BOTH columns from bounded histogram
        # exchanges, rank maps broadcast once per actor, then ONE
        # centered-moment pass over the pair stream (center = (n+1)/2
        # exactly — tie-average ranks always sum to n(n+1)/2 — so the
        # raw-moment cancellation the r75 lesson warns about never
        # happens). Pearson on the ranks closes on the driver.
        li = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
        vx, rx, _ = _avg_rank_map(li, "l_quantity")
        vy, ry, _ = _avg_rank_map(li, "l_extendedprice")
        n = float(
            pq.read_metadata(os.path.join(sf_dir, "lineitem.parquet")).num_rows
        )
        c = (n + 1.0) / 2.0
        import ray as _ray

        mref = _ray.put((vx, rx, vy, ry))

        def _mom(t: pa.Table) -> pa.Table:
            mvx, mrx, mvy, mry = _ray.get(mref)
            ax = mrx[np.searchsorted(mvx, t["l_quantity"].to_numpy())] - c
            ay = mry[np.searchsorted(mvy, t["l_extendedprice"].to_numpy())] - c
            return pa.table({
                "sxy": pa.array([float((ax * ay).sum())], pa.float64()),
                "sxx": pa.array([float((ax * ax).sum())], pa.float64()),
                "syy": pa.array([float((ay * ay).sum())], pa.float64()),
            })

        m = li.map_batches(_mom, batch_format="pyarrow").to_pandas().sum()
        rho = float(m["sxy"]) / math.sqrt(float(m["sxx"]) * float(m["syy"]))
        return pd.DataFrame({
            "n": [np.int64(n)],
            "spearman_rho": round_half_up(np.array([rho])),
        })

    def r96_kruskal(sf_dir):
        # Kruskal-Wallis H (the nonparametric one-way ANOVA, rank
        # analog of r76): global tie-average ranks of events.value from
        # one bounded histogram exchange; per-group rank sums fold in a
        # 5-row combiner; H and its tie correction close in the exact
        # published form H = [12/(N(N+1)) * sum R_g^2/n_g - 3(N+1)] /
        # (1 - sum(t^3-t)/(N^3-N)).
        ev = _read(sf_dir, "events", ["event_type", "value"])
        vals, ranks, cnts = _avg_rank_map(ev, "value")
        import ray as _ray

        rref = _ray.put((vals, ranks))

        def _gsum(t: pa.Table) -> pa.Table:
            mv, mr = _ray.get(rref)
            rk = mr[np.searchsorted(mv, t["value"].to_numpy())]
            df = pd.DataFrame({
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "rsum": rk,
            })
            g = df.groupby("event_type", as_index=False).agg(
                rsum=("rsum", "sum"), ng=("rsum", "size")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        g = (
            rel.grouped_aggregate(
                ev.map_batches(_gsum, batch_format="pyarrow"),
                ["event_type"], {"rsum": ("sum", "rsum"), "ng": ("sum", "ng")},
            )
            .to_pandas().sort_values("event_type", kind="mergesort").reset_index(drop=True)
        )
        n = float(g["ng"].sum())
        s = float((g["rsum"].to_numpy() ** 2 / g["ng"].to_numpy()).sum())
        h0 = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)
        tcorr = float((cnts**3 - cnts).sum())
        h = h0 / (1.0 - tcorr / (n**3 - n))
        return pd.DataFrame({
            "event_type": g["event_type"],
            "n_g": g["ng"].astype("int64"),
            "mean_rank": round_half_up((g["rsum"] / g["ng"]).to_numpy()),
            "h_stat": round_half_up(np.full(len(g), h)),
        })

    def t_url_filter(sf_dir):
        # UT1-style domain blocklist filter (the RefinedWeb/CCNet URL
        # screen): each doc's domain derives from its source field,
        # the blocklist broadcasts as a constant Arrow set, one
        # vectorized is_in per batch tags rows, and a domain-bounded
        # combiner reports the kept/blocked census per domain.
        docs = _read(sf_dir, "documents", ["doc_id", "source"])
        blocked = ("src1.example.com", "src4.example.com", "src7.example.com")
        bset = pa.array(list(blocked))

        def _tag(t: pa.Table) -> pa.Table:
            dom = pc.binary_join_element_wise(
                t["source"].cast(pa.string()), ".example.com", ""
            )
            return pa.table({
                "domain": dom,
                "blocked": pc.is_in(dom, value_set=bset),
            })

        agg = (
            rel.grouped_aggregate(
                docs.map_batches(_tag, batch_format="pyarrow"),
                ["domain", "blocked"], {"n_docs": ("count", "domain")},
            )
            .to_pandas().sort_values("domain", kind="mergesort").reset_index(drop=True)
        )
        agg["n_docs"] = agg["n_docs"].astype("int64")
        return agg[["domain", "blocked", "n_docs"]]

    def t_unimax_sample(sf_dir):
        # UniMax language sampling (Chung et al. 2023): cap each
        # language at C docs instead of temperature-scaling — the
        # deterministic variant draws each language's C
        # smallest-md5-hash docs (group_topn combiner: per-block <=C
        # rows survive to the shard exchange, reproducible at any
        # parallelism; contrast with t_temperature_mix's rate-based
        # thinning over the same corpus).
        from search_engine_ray.ops.sketch import _md5_upper64

        C = 40
        docs = _read(sf_dir, "documents", ["doc_id", "lang"])

        def _h(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            h = _md5_upper64([f"umx:{i}" for i in ids])
            return pa.table({
                "doc_id": t["doc_id"], "lang": t["lang"],
                "h": pa.array(h, pa.uint64()),
            })

        kept = rel.group_topn(
            docs.map_batches(_h, batch_format="pyarrow"),
            "lang", ["h", "doc_id"], C, descending=False,
        )
        ka = (
            rel.grouped_aggregate(
                kept, ["lang"],
                {"n_kept": ("count", "doc_id"), "sum_kept": ("sum", "doc_id")},
            ).to_pandas()
        )
        tot = rel.value_counts(docs, "lang", alias="n_docs").to_pandas()
        out = (
            tot.merge(ka, on="lang", how="left")
            .sort_values("lang", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "lang": out["lang"],
            "n_docs": out["n_docs"].astype("int64"),
            "n_kept": out["n_kept"].fillna(0).astype("int64"),
            "sum_kept": out["sum_kept"].fillna(0).astype("int64"),
        })

    def r97_theil_sen(sf_dir):
        # Theil-Sen robust trend estimator over the daily event-value
        # series (the median-of-pairwise-slopes regressor — immune to
        # the outlier days that pull r74's OLS): the day histogram
        # folds in one combiner exchange (bucket table bounded by the
        # date span, the r80/r87/r89 contract), then the C(days, 2)
        # slope set and both medians close on the driver.
        ev = _read(sf_dir, "events", ["ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            day = np.floor(
                t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                / 86400000000.0
            ).astype(np.int64)
            df = pd.DataFrame({"day": day, "s": t["value"].to_numpy()})
            g = df.groupby("day", as_index=False)["s"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        d_ = (
            rel.grouped_aggregate(
                ev.map_batches(_day, batch_format="pyarrow"),
                ["day"], {"s": ("sum", "s")},
            )
            .to_pandas().sort_values("day", kind="mergesort").reset_index(drop=True)
        )
        days = d_["day"].to_numpy().astype(np.float64)
        s = d_["s"].to_numpy()
        i, j = np.triu_indices(len(days), k=1)
        slopes = (s[j] - s[i]) / (days[j] - days[i])
        slope = float(np.median(slopes))
        intercept = float(np.median(s - slope * days))
        return pd.DataFrame({
            "n_days": [np.int64(len(days))],
            "slope": round_half_up(np.array([slope])),
            "intercept": round_half_up(np.array([intercept])),
        })

    def r98_mann_whitney(sf_dir):
        # Mann-Whitney U (the two-sample rank test beside r79's KS and
        # r96's Kruskal-Wallis): purchase vs click event values, global
        # tie-average ranks from the distinct-value partial fold, rank
        # sums per group in a 2-row combiner, tie-corrected normal
        # approximation z = (U - mu) / sigma closed on the driver.
        ev = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            lambda t: t.filter(
                pc.is_in(t["event_type"], value_set=pa.array(["purchase", "click"]))
            ),
            batch_format="pyarrow",
        )
        vals, ranks, cnts = _avg_rank_map(ev, "value")
        import ray as _ray

        rref = _ray.put((vals, ranks))

        def _gsum(t: pa.Table) -> pa.Table:
            mv, mr = _ray.get(rref)
            rk = mr[np.searchsorted(mv, t["value"].to_numpy())]
            g1 = np.asarray(t["event_type"]) == "purchase"
            return pa.table({
                "r1": pa.array([float(rk[g1].sum())], pa.float64()),
                "n1": pa.array([int(g1.sum())], pa.int64()),
                "n2": pa.array([int((~g1).sum())], pa.int64()),
            })

        m = ev.map_batches(_gsum, batch_format="pyarrow").to_pandas().sum()
        n1, n2 = float(m["n1"]), float(m["n2"])
        n = n1 + n2
        u1 = float(m["r1"]) - n1 * (n1 + 1.0) / 2.0
        tcorr = float((cnts**3 - cnts).sum())
        sigma = math.sqrt(
            n1 * n2 / 12.0 * ((n + 1.0) - tcorr / (n * (n - 1.0)))
        )
        z = (u1 - n1 * n2 / 2.0) / sigma
        return pd.DataFrame({
            "n1": [np.int64(n1)], "n2": [np.int64(n2)],
            "u_stat": round_half_up(np.array([u1])),
            "z_stat": round_half_up(np.array([z])),
        })

    def e22_gzip_csv(sf_dir):
        # compressed-CSV source (the E1 ring, gzip leg): the dataset
        # writes plain CSV shards (distributed), the fixture gzips
        # them once (mtime-keyed cache), and ray.data.read_csv
        # decompresses via arrow_open_stream_args — the knob for every
        # pre-compressed drop a real ingest sees. Group-sum must equal
        # the parquet view's aggregate.
        import gzip as _gzip

        import ray.data as rd

        src = os.path.join(sf_dir, "events.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        gz_dir = f"/tmp/ser_gzcsv_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        if not os.path.exists(os.path.join(gz_dir, "_DONE")):
            import shutil

            shutil.rmtree(gz_dir, ignore_errors=True)
            _read(sf_dir, "events", ["event_id", "event_type", "value"]).write_csv(gz_dir)
            import glob as _g

            for f in _g.glob(os.path.join(gz_dir, "*.csv")):
                with open(f, "rb") as fin, _gzip.open(f + ".gz", "wb") as fout:
                    fout.write(fin.read())
                os.remove(f)
            open(os.path.join(gz_dir, "_DONE"), "w").write("ok")
        import glob as _g

        ds = rd.read_csv(
            sorted(_g.glob(os.path.join(gz_dir, "*.csv.gz"))),
            arrow_open_stream_args={"compression": "gzip"},
        )
        out = rel.grouped_aggregate(
            ds, "event_type", {"n": ("count", "event_id"), "sv": ("sum", "value")}
        ).to_pandas().sort_values("event_type", kind="mergesort").reset_index(drop=True)
        return pd.DataFrame({
            "event_type": out["event_type"],
            "n": out["n"].astype("int64"),
            "sum_value": round_half_up(out["sv"].to_numpy()),
        })

    def r99_holt(sf_dir):
        # ES moving_fn holt (double exponential smoothing, alpha=0.5
        # beta=0.3) over the daily sum series: the day histogram folds
        # in one combiner exchange (driver-bounded bucket table, the
        # r92_ewma contract), the coupled level/trend recursion runs
        # driver-side, and the oracle replays the SAME recursion as a
        # DuckDB recursive CTE (unlike r92's closed form — Holt's two
        # coupled states have none). Init: level_1 = x_1, trend_1 =
        # x_2 - x_1.
        ev = _read(sf_dir, "events", ["ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            day = np.floor(
                t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                / 86400000000.0
            ).astype(np.int64)
            df = pd.DataFrame({"day": day, "s": t["value"].to_numpy()})
            g = df.groupby("day", as_index=False)["s"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        d_ = (
            rel.grouped_aggregate(
                ev.map_batches(_day, batch_format="pyarrow"),
                ["day"], {"s": ("sum", "s")},
            )
            .to_pandas().sort_values("day", kind="mergesort").reset_index(drop=True)
        )
        # recursion inputs round to 4dp FIRST (both sides): the raw
        # daily sums differ by ~1e-12 between summation orders, and
        # the recursion carries that drift onto round-half-up
        # boundaries at the output
        x = round_half_up(d_["s"].to_numpy())
        a, b = 0.5, 0.3
        lvl = np.empty(len(x))
        if len(x):
            lvl[0] = x[0]
            tr = x[1] - x[0] if len(x) > 1 else 0.0
            prev = lvl[0]
            for t in range(1, len(x)):
                cur = a * x[t] + (1.0 - a) * (prev + tr)
                tr = b * (cur - prev) + (1.0 - b) * tr
                lvl[t] = cur
                prev = cur
        return pd.DataFrame({
            "day": d_["day"].astype("int64"),
            "s": round_half_up(x),
            "holt": round_half_up(lvl),
        })

    def r100_levene(sf_dir):
        # Levene's test for variance homogeneity across event types
        # (the gate before trusting r76's equal-variance ANOVA): pass 1
        # folds per-group means (5-row combiner), the mean map
        # broadcasts, pass 2 folds (n, sum z, sum z^2) of the absolute
        # deviations z = |x - mean_g|, and the one-way F on z closes
        # driver-side. z is bounded by the value range, so the
        # raw-moment form is fp-safe here (contrast r75).
        ev = _read(sf_dir, "events", ["event_type", "value"])
        mu = (
            rel.grouped_aggregate(ev, ["event_type"], {"mu": ("mean", "value")})
            .to_pandas()
        )
        mu_map = dict(zip(mu["event_type"], mu["mu"]))
        import ray as _ray

        mref = _ray.put(mu_map)

        def _z(t: pa.Table) -> pa.Table:
            mm = _ray.get(mref)
            df = pd.DataFrame({
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "v": t["value"].to_numpy(),
            })
            df["z"] = (df["v"] - df["event_type"].map(mm)).abs()
            df["z2"] = df["z"] * df["z"]
            g = df.groupby("event_type", as_index=False).agg(
                n=("z", "size"), zs=("z", "sum"), zsq=("z2", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        g = (
            rel.grouped_aggregate(
                ev.map_batches(_z, batch_format="pyarrow"),
                ["event_type"], {"n": ("sum", "n"), "zs": ("sum", "zs"), "zsq": ("sum", "zsq")},
            )
            .to_pandas().sort_values("event_type", kind="mergesort").reset_index(drop=True)
        )
        n = g["n"].to_numpy().astype(np.float64)
        zs = g["zs"].to_numpy()
        zsq = g["zsq"].to_numpy()
        N = float(n.sum())
        k = float(len(g))
        zbar_g = zs / n
        zbar = float(zs.sum()) / N
        ssb = float((n * (zbar_g - zbar) ** 2).sum())
        ssw = float((zsq - n * zbar_g**2).sum())
        f = (ssb / (k - 1.0)) / (ssw / (N - k))
        return pd.DataFrame({
            "event_type": g["event_type"],
            "n": g["n"].astype("int64"),
            "mean_absdev": round_half_up(zbar_g),
            "f_stat": round_half_up(np.full(len(g), f)),
        })

    def t_topic_census(sf_dir):
        # embedding-space dataset map (the report beside the corpus
        # card): per-cluster member counts + mean cosine-to-centroid
        # cohesion from one streaming k-means assignment pass
        # (ops/ann.cluster_census); the oracle retrains the identical
        # seeded centroids and replays assignment + census in SQL.
        out = (
            ann.cluster_census(_read(sf_dir, "embeddings"), n_clusters=8)
            .to_pandas().sort_values("cluster", kind="mergesort").reset_index(drop=True)
        )
        out = out[out["n_vecs"] > 0]
        return pd.DataFrame({
            "cluster": out["cluster"].astype("int64"),
            "n_vecs": out["n_vecs"].astype("int64"),
            "mean_cos": round_half_up(
                (out["sum_cos"] / out["n_vecs"]).to_numpy()
            ),
        }).reset_index(drop=True)

    def r101_seasonal_decompose(sf_dir):
        # classical seasonal decomposition of the daily series (the
        # STL-lite additive model: trend = centered 7-day moving
        # average, seasonal = day-of-week means of the detrended
        # series re-centered to sum 0, residual = the rest): the day
        # histogram folds in one combiner exchange, the three
        # components close on the driver-bounded bucket table. Edge
        # days (no full 7-day window) carry a NULL trend, matching the
        # SQL frame-with-count guard.
        ev = _read(sf_dir, "events", ["ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            day = np.floor(
                t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                / 86400000000.0
            ).astype(np.int64)
            df = pd.DataFrame({"day": day, "s": t["value"].to_numpy()})
            g = df.groupby("day", as_index=False)["s"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        d_ = (
            rel.grouped_aggregate(
                ev.map_batches(_day, batch_format="pyarrow"),
                ["day"], {"s": ("sum", "s")},
            )
            .to_pandas().sort_values("day", kind="mergesort").reset_index(drop=True)
        )
        day = d_["day"].to_numpy().astype(np.int64)
        # every stage pins to 4dp BEFORE feeding the next (the r99
        # lesson generalized: unpinned intermediate drift lands on
        # round-half-up boundaries)
        s = round_half_up(d_["s"].to_numpy())
        n = len(s)
        trend = np.full(n, np.nan)
        for i in range(3, n - 3):
            trend[i] = s[i - 3 : i + 4].sum() / 7.0
        trend = round_half_up(trend)
        detr = s - trend
        dow = ((day % 7) + 7) % 7
        seas_mean = pd.Series(detr).groupby(dow).mean().reindex(range(7)).to_numpy()
        seas = round_half_up(seas_mean - np.nanmean(seas_mean))  # sum-to-0 re-center
        seasonal = seas[dow]
        resid = s - trend - seasonal
        return pd.DataFrame({
            "day": day,
            "s": s,
            "trend": trend,
            "seasonal": seasonal,
            "resid": round_half_up(resid),
        })

    def e23_retention_sink(sf_dir):
        # data-retention / TTL enforcement on a partitioned sink (the
        # lifecycle op every lake pipeline runs): events land
        # hive-partitioned by day (mtime-keyed fixture), retention
        # drops whole partition DIRECTORIES older than the cutoff — a
        # metadata operation, no data pass — and the survivors read
        # back partition-pruned. Value check: the post-retention
        # aggregate equals the WHERE day >= cutoff oracle.
        import shutil

        import ray.data as rd

        src = os.path.join(sf_dir, "events.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        base = f"/tmp/ser_retention_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        data_dir = os.path.join(base, "data")
        CUTOFF = 19735  # 2024-01-13 (events span Jan 2024 at every sf)
        if not os.path.exists(os.path.join(base, "_DONE")):
            shutil.rmtree(base, ignore_errors=True)

            def _stamp(t: pa.Table) -> pa.Table:
                day = np.floor(
                    t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                    / 86400000000.0
                ).astype(np.int64)
                return pa.table({
                    "event_id": t["event_id"], "value": t["value"],
                    "day": pa.array(day, pa.int64()),
                })

            _read(sf_dir, "events", ["event_id", "ts", "value"]).map_batches(
                _stamp, batch_format="pyarrow"
            ).write_parquet(data_dir, partition_cols=["day"])
            # retention: unlink expired partitions (metadata-only)
            for d_name in sorted(os.listdir(data_dir)):
                if d_name.startswith("day=") and int(d_name[4:]) < CUTOFF:
                    shutil.rmtree(os.path.join(data_dir, d_name))
            open(os.path.join(base, "_DONE"), "w").write("ok")
        ds = rd.read_parquet(data_dir)
        out = (
            rel.grouped_aggregate(
                ds, ["day"], {"n": ("count", "event_id"), "sv": ("sum", "value")}
            )
            .to_pandas().sort_values("day", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "day": out["day"].astype("int64"),
            "n": out["n"].astype("int64"),
            "sum_value": round_half_up(out["sv"].to_numpy()),
        })

    def r102_bucket_correlation(sf_dir):
        # ES bucket_correlation pipeline agg: Pearson r between the
        # daily click-count and purchase-count series. One pass over
        # events folds (day, clicks, purchases) partials in a
        # day-bounded combiner; the correlation closes on the
        # driver-bounded bucket table with the centered two-pass
        # formula (sample factors cancel, so it equals SQL corr()).
        ev = _read(sf_dir, "events", ["ts", "event_type"])

        def _day(t: pa.Table) -> pa.Table:
            day = np.floor(
                t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                / 86400000000.0
            ).astype(np.int64)
            et = t["event_type"].to_numpy(zero_copy_only=False)
            df = pd.DataFrame({
                "day": day,
                "c": (et == "click").astype(np.int64),
                "p": (et == "purchase").astype(np.int64),
            })
            g = df.groupby("day", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        d_ = (
            rel.grouped_aggregate(
                ev.map_batches(_day, batch_format="pyarrow"),
                ["day"], {"c": ("sum", "c"), "p": ("sum", "p")},
            )
            .to_pandas().sort_values("day", kind="mergesort").reset_index(drop=True)
        )
        x = d_["c"].to_numpy().astype(np.float64)
        y = d_["p"].to_numpy().astype(np.float64)
        xm, ym = x - x.mean(), y - y.mean()
        r = float((xm * ym).sum()) / math.sqrt(
            float((xm * xm).sum()) * float((ym * ym).sum())
        )
        return pd.DataFrame({
            "n_days": [np.int64(len(d_))],
            "corr": round_half_up(np.array([r])),
        })

    def s92_terms_include(sf_dir):
        # ES terms aggregation with include/exclude/partitioning: token
        # counts filtered to include-regex '^[a-m]', exclude list
        # ('sort',), and hash-partition 0 of 2 (md5 parity — ES's
        # include.partition for paging a huge-cardinality terms agg
        # without composite cursors). Counts fold FIRST (vocab-bounded
        # combiner), then the include/exclude/partition predicates run
        # on the tiny vocabulary aggregate — filter-after-count is
        # result-identical for term predicates and never rescans docs.
        from search_engine_ray.ops.sketch import _md5_upper64

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        toks = txt.explode_tokens(docs, "text", ["doc_id"]).select_columns(["token"])
        counts = rel.value_counts(toks, "token", alias="cnt")

        def _filt(t: pa.Table) -> pa.Table:
            tok = t["token"].to_numpy(zero_copy_only=False)
            if not len(tok):
                return t
            m = (
                np.array([bool(s) and "a" <= s[0] <= "m" for s in tok])
                & (tok != "sort")
                & (_md5_upper64(list(tok)) % np.uint64(2) == 0)
            )
            return t.filter(pa.array(m))

        out = (
            rel.topk(
                counts.map_batches(_filt, batch_format="pyarrow"),
                ["cnt", "token"], 10, descending=[True, False],
            )
            .to_pandas().reset_index(drop=True)
        )
        out["cnt"] = out["cnt"].astype("int64")
        return out[["token", "cnt"]]

    def r103_srm_check(sf_dir):
        # A/B sample-ratio-mismatch guardrail (the pre-test every
        # experimentation platform runs before reading r81's z-test):
        # cohort assignment = json-payload k parity (identical rule to
        # r81), expected split 50/50, chi-square 1-dof on observed
        # cohort sizes. One 2-row combiner; the statistic closes on
        # two numbers.
        ev = _read(sf_dir, "events", ["props"])

        def _partial(t: pa.Table) -> pa.Table:
            k = pc.cast(
                pc.struct_field(pc.extract_regex(t["props"], r'"k": (?P<k>\d+)'), "k"),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            grp = (k % 2).astype(np.int64)
            df = pd.DataFrame({"grp": grp, "n": 1})
            g = df.groupby("grp", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = rel.grouped_aggregate(
            ev.map_batches(_partial, batch_format="pyarrow"), ["grp"],
            {"n": ("sum", "n")},
        ).to_pandas().set_index("grp")
        n1, n2 = float(m.loc[0, "n"]), float(m.loc[1, "n"])
        exp = (n1 + n2) / 2.0
        chi2 = (n1 - exp) ** 2 / exp + (n2 - exp) ** 2 / exp
        return pd.DataFrame({
            "n1": [np.int64(n1)], "n2": [np.int64(n2)],
            "chi2": round_half_up(np.array([chi2])),
        })

    def e24_psv_dialect(sf_dir):
        # CSV dialect knob (the E1 ring, delimiter leg): the same
        # round-trip through PIPE-separated files via
        # read_csv(parse_options=ParseOptions(delimiter='|')) — the
        # arrow option pass-through every real ingest needs for
        # non-comma drops. Value check = parquet-view aggregate.
        import ray.data as rd
        from pyarrow import csv as pacsv

        src = os.path.join(sf_dir, "customer.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        psv_dir = f"/tmp/ser_psv_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        if not os.path.exists(os.path.join(psv_dir, "_DONE")):
            import shutil

            shutil.rmtree(psv_dir, ignore_errors=True)
            os.makedirs(psv_dir, exist_ok=True)
            t = pq.read_table(src, columns=["c_custkey", "c_mktsegment", "c_acctbal"])
            pacsv.write_csv(
                t, os.path.join(psv_dir, "part-0.psv"),
                write_options=pacsv.WriteOptions(delimiter="|"),
            )
            open(os.path.join(psv_dir, "_DONE"), "w").write("ok")
        import glob as _g

        ds = rd.read_csv(
            sorted(_g.glob(os.path.join(psv_dir, "*.psv"))),
            parse_options=pacsv.ParseOptions(delimiter="|"),
        )
        out = (
            rel.grouped_aggregate(
                ds, "c_mktsegment",
                {"n": ("count", "c_custkey"), "bal": ("sum", "c_acctbal")},
            )
            .to_pandas().sort_values("c_mktsegment", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "c_mktsegment": out["c_mktsegment"],
            "n": out["n"].astype("int64"),
            "sum_bal": round_half_up(out["bal"].to_numpy()),
        })

    def r104_cramers_v(sf_dir):
        # Cramér's V effect size over the event_type x day-of-week
        # contingency table (the magnitude companion to r91's
        # chi-square significance — a large-n pipeline flags
        # everything significant, V says whether it matters):
        # (event_type, dow) counts in one bounded combiner, full
        # cross product with zero cells, V = sqrt(chi2 / (n * min(r-1,
        # c-1))) closes driver-side.
        ev = _read(sf_dir, "events", ["event_type", "ts"])

        def _cell(t: pa.Table) -> pa.Table:
            day = np.floor(
                t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                / 86400000000.0
            ).astype(np.int64)
            df = pd.DataFrame({
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "dow": ((day % 7) + 7) % 7,
                "o": 1,
            })
            g = df.groupby(["event_type", "dow"], as_index=False)["o"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        c = (
            rel.grouped_aggregate(
                ev.map_batches(_cell, batch_format="pyarrow"),
                ["event_type", "dow"], {"o": ("sum", "o")},
            ).to_pandas()
        )
        piv = c.pivot_table(
            index="event_type", columns="dow", values="o", fill_value=0, aggfunc="sum"
        ).astype(np.float64)
        o = piv.to_numpy()
        n = o.sum()
        e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
        chi2 = float(((o - e) ** 2 / e).sum())
        k = min(o.shape[0] - 1, o.shape[1] - 1)
        v = math.sqrt(chi2 / (n * k))
        return pd.DataFrame({
            "n": [np.int64(n)],
            "chi2": round_half_up(np.array([chi2])),
            "cramers_v": round_half_up(np.array([v])),
        })

    def r105_jarque_bera(sf_dir):
        # Jarque-Bera normality screen per event_type (the sanity
        # check before any of the parametric tests in this wave's
        # family — r76 ANOVA / r106 Cohen's d assume roughly normal
        # residuals): ONE combiner exchange carries per-group raw
        # power sums (n, sum x..x^4); central moments, skewness g1,
        # excess kurtosis g2 and JB = n/6*(g1^2 + g2^2/4) close
        # driver-side on k rows. value is bounded (~3e2), so the
        # raw-moment form stays fp-stable (same argument as r76); the
        # oracle recomputes via the two-pass centered form — different
        # op order, equal at 4dp.
        ev = _read(sf_dir, "events", ["event_type", "value"])

        def _partial(t: pa.Table) -> pa.Table:
            y = t["value"].to_numpy().astype(np.float64)
            df = pd.DataFrame({
                "event_type": t["event_type"].to_pylist(),
                "n": 1.0, "s1": y, "s2": y * y, "s3": y ** 3, "s4": y ** 4,
            })
            g = df.groupby("event_type", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = (
            rel.grouped_aggregate(
                ev.map_batches(_partial, batch_format="pyarrow"), ["event_type"],
                {c: ("sum", c) for c in ["n", "s1", "s2", "s3", "s4"]},
            )
            .to_pandas().sort_values("event_type", kind="mergesort").reset_index(drop=True)
        )
        n = m["n"].to_numpy()
        mu = m["s1"].to_numpy() / n
        m2 = m["s2"].to_numpy() / n - mu ** 2
        m3 = m["s3"].to_numpy() / n - 3 * mu * (m["s2"].to_numpy() / n) + 2 * mu ** 3
        m4 = (
            m["s4"].to_numpy() / n
            - 4 * mu * (m["s3"].to_numpy() / n)
            + 6 * mu ** 2 * (m["s2"].to_numpy() / n)
            - 3 * mu ** 4
        )
        g1 = m3 / m2 ** 1.5
        g2 = m4 / m2 ** 2 - 3.0
        jb = n / 6.0 * (g1 ** 2 + g2 ** 2 / 4.0)
        return pd.DataFrame({
            "event_type": m["event_type"],
            "n": n.astype(np.int64),
            "skew": round_half_up(g1),
            "kurt_excess": round_half_up(g2),
            "jb": round_half_up(jb),
        })

    def r106_cohens_d(sf_dir):
        # effect size for the A/B pair this repo already tests for
        # significance (r81 z-test) and balance (r103 SRM): Cohen's d
        # on value between the k-parity cohorts, plus the small-sample
        # Hedges' g correction J = 1 - 3/(4*N - 9). Per-cohort
        # (n, sum, sumsq) ride one 2-row combiner; pooled SD and the
        # statistics close on four numbers.
        ev = _read(sf_dir, "events", ["props", "value"])

        def _partial(t: pa.Table) -> pa.Table:
            k = pc.cast(
                pc.struct_field(pc.extract_regex(t["props"], r'"k": (?P<k>\d+)'), "k"),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            y = t["value"].to_numpy().astype(np.float64)
            df = pd.DataFrame({
                "grp": (k % 2).astype(np.int64), "n": 1.0, "s": y, "sq": y * y,
            })
            g = df.groupby("grp", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = (
            rel.grouped_aggregate(
                ev.map_batches(_partial, batch_format="pyarrow"), ["grp"],
                {c: ("sum", c) for c in ["n", "s", "sq"]},
            )
            .to_pandas().set_index("grp")
        )
        n0, n1 = float(m.loc[0, "n"]), float(m.loc[1, "n"])
        m0, m1 = m.loc[0, "s"] / n0, m.loc[1, "s"] / n1
        v0 = (m.loc[0, "sq"] - n0 * m0 * m0) / (n0 - 1.0)
        v1 = (m.loc[1, "sq"] - n1 * m1 * m1) / (n1 - 1.0)
        sp = math.sqrt(((n0 - 1.0) * v0 + (n1 - 1.0) * v1) / (n0 + n1 - 2.0))
        d_stat = (m0 - m1) / sp
        g_stat = d_stat * (1.0 - 3.0 / (4.0 * (n0 + n1) - 9.0))
        return pd.DataFrame({
            "n0": [np.int64(n0)], "n1": [np.int64(n1)],
            "mean0": round_half_up(np.array([m0])),
            "mean1": round_half_up(np.array([m1])),
            "cohens_d": round_half_up(np.array([d_stat])),
            "hedges_g": round_half_up(np.array([g_stat])),
        })

    def r107_tukey_users(sf_dir):
        # heavy-user screen via Tukey fences on the per-user activity
        # distribution (the IQR-rule outlier detector every abuse /
        # anomaly pipeline runs): per-user event counts are one
        # combiner exchange (bounded by user cardinality); the q1/q3
        # quantiles come from the (count-value -> frequency) histogram
        # — grouped_discrete_quantiles' distinct-value contract, NOT a
        # sort of the user table — and the fence comparison is a
        # second masked-count pass over the count Dataset. The fence
        # arithmetic mirrors the oracle's op order exactly, so the
        # strict < / > comparisons agree bitwise.
        ev = _read(sf_dir, "events", ["user_id"])
        cnt = rel.grouped_aggregate(ev, ["user_id"], {"cnt": ("count", "user_id")})

        def _const(t: pa.Table) -> pa.Table:
            return pa.table({
                "g": pa.array(np.zeros(t.num_rows, np.int64)),
                "cnt": pc.cast(t["cnt"], pa.float64()),
            })

        cg = cnt.map_batches(_const, batch_format="pyarrow")
        q = rel.grouped_discrete_quantiles(cg, "g", "cnt", [0.25, 0.75])
        q1, q3 = float(q["q0.25"].iloc[0]), float(q["q0.75"].iloc[0])
        n_users = int(q["n"].iloc[0])
        lo = q1 - 1.5 * (q3 - q1)
        hi = q3 + 1.5 * (q3 - q1)

        def _fence(t: pa.Table) -> pa.Table:
            c = t["cnt"].to_numpy().astype(np.float64)
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "n_low": pa.array([int((c < lo).sum())], pa.int64()),
                "n_high": pa.array([int((c > hi).sum())], pa.int64()),
            })

        f = (
            rel.grouped_aggregate(
                cnt.map_batches(_fence, batch_format="pyarrow"), ["g"],
                {"n_low": ("sum", "n_low"), "n_high": ("sum", "n_high")},
            ).to_pandas()
        )
        return pd.DataFrame({
            "n_users": [np.int64(n_users)],
            "q1": round_half_up(np.array([q1])),
            "q3": round_half_up(np.array([q3])),
            "lo_fence": round_half_up(np.array([lo])),
            "hi_fence": round_half_up(np.array([hi])),
            "n_low": [np.int64(f["n_low"].iloc[0])],
            "n_high": [np.int64(f["n_high"].iloc[0])],
        })

    def t_readability(sf_dir):
        # Flesch reading-ease histogram over the corpus (a standard
        # curation signal next to the Gopher rules: drop the
        # unreadable tail before training): per doc, words = the index
        # tokenizer's tokens, syllables = [aeiouy]+ group count per
        # token (min 1), sentences = [.!?]+ runs (min 1); score =
        # 206.835 - 1.015*(W/S) - 84.6*(SYL/W), identical op order to
        # the oracle so floor(score/10) bucketing agrees bitwise. All
        # kernels are Arrow compute (count_substring_regex + bincount
        # folds); the exchange carries one row per (bucket, block).
        from search_engine_ray.ops.text import _flat_tokens

        docs = _read(sf_dir, "documents", ["text"])

        def _partial(t: pa.Table) -> pa.Table:
            flat, parents, n = _flat_tokens(t["text"])
            w = np.bincount(parents, minlength=n).astype(np.float64)
            syl_tok = np.maximum(
                1,
                pc.count_substring_regex(flat, "[aeiouy]+")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            )
            syl = np.bincount(parents, weights=syl_tok, minlength=n)
            txt_col = pc.fill_null(t["text"], "")
            s = np.maximum(
                1,
                pc.count_substring_regex(txt_col, "[.!?]+")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            ).astype(np.float64)
            keep = w > 0
            w, syl, s = w[keep], syl[keep], s[keep]
            score = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
            df = pd.DataFrame({
                "bucket": np.floor(score / 10).astype(np.int64),
                "n_docs": 1, "ssum": score,
            })
            g = df.groupby("bucket", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = (
            rel.grouped_aggregate(
                docs.map_batches(_partial, batch_format="pyarrow"), ["bucket"],
                {"n_docs": ("sum", "n_docs"), "ssum": ("sum", "ssum")},
            )
            .to_pandas().sort_values("bucket", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "bucket": m["bucket"].astype("int64"),
            "n_docs": m["n_docs"].astype("int64"),
            "mean_score": round_half_up(m["ssum"].to_numpy() / m["n_docs"].to_numpy()),
        })

    def _daily_cnt_sum(sf_dir) -> pd.DataFrame:
        # shared daily (count, value-sum) bucket series for the
        # rank/serial-correlation family (r108-r110): one combiner
        # exchange bounded by #days, sorted by day driver-side.
        ev = _read(sf_dir, "events", ["ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "day": pa.array(
                    t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()
                ),
                "x": pa.array(np.ones(t.num_rows, np.float64)),
                "y": t["value"],
            })

        return (
            rel.grouped_aggregate(
                ev.map_batches(_day, batch_format="pyarrow"), ["day"],
                {"x": ("sum", "x"), "y": ("sum", "y")},
            )
            .to_pandas().sort_values("day", kind="mergesort").reset_index(drop=True)
        )

    def r108_kendall_tau(sf_dir):
        # Kendall tau-b rank correlation between daily event volume
        # and daily value sum (the robust companion to r95's Spearman
        # — tau handles ties explicitly via the tau-b denominator):
        # the daily bucket table is one combiner exchange; the O(d^2)
        # concordant/discordant count runs vectorized on the ~30-row
        # series driver-side, exactly like r97's Theil-Sen pair fold.
        d_ = _daily_cnt_sum(sf_dir)
        x = d_["x"].to_numpy(np.float64)
        y = d_["y"].to_numpy(np.float64)
        n = x.size
        iu = np.triu_indices(n, k=1)
        prod = (x[iu[1]] - x[iu[0]]) * (y[iu[1]] - y[iu[0]])
        conc = int((prod > 0).sum())
        disc = int((prod < 0).sum())
        n0 = n * (n - 1) / 2.0
        _, cx = np.unique(x, return_counts=True)
        _, cy = np.unique(y, return_counts=True)
        n1 = float((cx * (cx - 1) / 2.0).sum())
        n2 = float((cy * (cy - 1) / 2.0).sum())
        tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
        return pd.DataFrame({
            "n_days": [np.int64(n)],
            "concordant": [np.int64(conc)],
            "discordant": [np.int64(disc)],
            "tau_b": round_half_up(np.array([tau])),
        })

    def r109_cross_corr(sf_dir):
        # lagged cross-correlation function between daily event volume
        # and the value sum L days LATER (lags 0..5 — the lead/lag
        # screen behind "does activity today predict spend this
        # week"): per-lag Pearson r over day-aligned pairs (a merge on
        # day+lag, so calendar gaps drop out exactly as the oracle's
        # join does), all on the bounded daily table.
        d_ = _daily_cnt_sum(sf_dir)
        rows = []
        for lag in range(6):
            a = d_[["day", "x"]].copy()
            a["day"] = a["day"] + lag
            j = a.merge(d_[["day", "y"]], on="day", how="inner")
            xv = j["x"].to_numpy(np.float64)
            yv = j["y"].to_numpy(np.float64)
            nn = xv.size
            sx, sy = xv.sum(), yv.sum()
            num = nn * float((xv * yv).sum()) - sx * sy
            den = math.sqrt(
                (nn * float((xv * xv).sum()) - sx * sx)
                * (nn * float((yv * yv).sum()) - sy * sy)
            )
            rows.append((lag, nn, num / den))
        return pd.DataFrame({
            "lag": pd.array([r[0] for r in rows], "int64"),
            "n": pd.array([r[1] for r in rows], "int64"),
            "r": round_half_up(np.array([r[2] for r in rows])),
        })

    def r110_durbin_watson(sf_dir):
        # Durbin-Watson serial-correlation test on the residuals of
        # the daily-trend OLS (the lag-1 autocorrelation check r82
        # measures directly, in the form regression dashboards quote):
        # slope/intercept from the population-moment closed form on
        # the bounded daily table, DW = sum((e_t - e_{t-1})^2) /
        # sum(e_t^2) ordered by day.
        d_ = _daily_cnt_sum(sf_dir)
        t = d_["day"].to_numpy(np.float64)
        y = d_["y"].to_numpy(np.float64)
        n = t.size
        tb, yb = t.mean(), y.mean()
        slope = float(((t - tb) * (y - yb)).sum()) / float(((t - tb) ** 2).sum())
        icept = yb - slope * tb
        e = y - (icept + slope * t)
        dw = float(((e[1:] - e[:-1]) ** 2).sum()) / float((e * e).sum())
        return pd.DataFrame({
            "n_days": [np.int64(n)],
            "slope": round_half_up(np.array([slope])),
            "dw": round_half_up(np.array([dw])),
        })

    def r111_bfs_levels(sf_dir):
        # BFS reachability levels over the co-purchase graph (the
        # "how many hops from this product to the rest of the
        # catalog" primitive; third member of the iterative family
        # after components/pagerank): edges reuse the shared cooccur
        # intermediate (r72/r88/pipe_triangles), each level is one
        # broadcast-filter pass over the static edge Dataset — no
        # shuffle, no join; frontier state is bounded by PART
        # cardinality. Depth capped at 3 so the oracle stays
        # non-recursive SQL; level -1 counts graph nodes not reached.
        from search_engine_ray.ops.graph import bfs_levels

        li = _read(sf_dir, "lineitem", ["l_partkey"])
        src = int(li.min("l_partkey"))
        edges = _cooccur_edges(sf_dir).map_batches(
            lambda t: t.filter(pc.not_equal(t["y"], -1)),  # drop item-count sentinels
            batch_format="pyarrow",
        )
        return bfs_levels(edges, src, max_depth=3, src_col="x", dst_col="y")

    def t_spell_pairs(sf_dir):
        # SymSpell spell-join over the corpus vocabulary: all token
        # pairs within edit distance 2, found by symmetric-delete
        # blocking (exact recall — two tokens within distance d share
        # a <= d-deletion variant) + Wagner-Fischer verification on
        # the bucket-local candidates. The typo-clustering primitive
        # for long-tail vocab cleanup; exchanges are bounded by vocab
        # x C(len, 2), never corpus rows.
        docs = _read(sf_dir, "documents", ["text"])
        out = (
            txt.spell_pairs(docs, "text", max_dist=2)
            .to_pandas().sort_values(["a", "b"], kind="mergesort").reset_index(drop=True)
        )
        out["d"] = out["d"].astype("int64")
        return out

    def e25_schema_evolution(sf_dir):
        # schema-evolution read (DuckDB union_by_name / Spark
        # mergeSchema): v1 files predate the o_orderpriority column,
        # v2 files carry it; read_parquet_evolved unifies by name with
        # null backfill and the aggregate treats backfilled nulls as
        # '<none>'. Fixture derives from orders Dataset-side (even
        # keys -> v1 without the column, odd -> v2), mtime-keyed like
        # the e1/e24 source caches; the oracle replays the
        # column-presence rule straight off the orders view, so the
        # check covers write -> evolved read -> aggregate end-to-end.
        import ray.data as rd

        from search_engine_ray.ops.sources import read_parquet_evolved

        src = os.path.join(sf_dir, "orders.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        base = f"/tmp/ser_evolve_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        v1, v2 = os.path.join(base, "v1"), os.path.join(base, "v2")
        if not os.path.exists(os.path.join(base, "_DONE")):
            import shutil

            shutil.rmtree(base, ignore_errors=True)
            od = rd.read_parquet(src, columns=["o_orderkey", "o_totalprice", "o_orderpriority"])

            def _v1(t: pa.Table) -> pa.Table:
                m = pc.equal(pc.bit_wise_and(t["o_orderkey"], 1), 0)
                return t.filter(m).select(["o_orderkey", "o_totalprice"])

            def _v2(t: pa.Table) -> pa.Table:
                m = pc.equal(pc.bit_wise_and(t["o_orderkey"], 1), 1)
                return t.filter(m)

            od.map_batches(_v1, batch_format="pyarrow").write_parquet(v1)
            od.map_batches(_v2, batch_format="pyarrow").write_parquet(v2)
            open(os.path.join(base, "_DONE"), "w").write("ok")

        ds = read_parquet_evolved([v1, v2])

        def _pri(t: pa.Table) -> pa.Table:
            return pa.table({
                "pri": pc.fill_null(t["o_orderpriority"], "<none>"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "s": t["o_totalprice"],
            })

        out = (
            rel.grouped_aggregate(
                ds.map_batches(_pri, batch_format="pyarrow"), ["pri"],
                {"n": ("sum", "n"), "s": ("sum", "s")},
            )
            .to_pandas().sort_values("pri", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "pri": out["pri"],
            "n": out["n"].astype("int64"),
            "sum_price": round_half_up(out["s"].to_numpy()),
        })

    def r112_pacf(sf_dir):
        # partial autocorrelation at lags 1-2 of the daily value-sum
        # series via Durbin-Levinson on the pairwise-Pearson ACF (the
        # same lagged-pair estimator r82 pins): pacf1 = r1,
        # pacf2 = (r2 - r1^2)/(1 - r1^2). The AR-order screen next to
        # r82's ACF and r110's DW; everything folds on the bounded
        # daily bucket table.
        daily = _daily_sums(sf_dir)
        v = daily["s"].to_numpy(np.float64)

        def _pearson(x: np.ndarray, y: np.ndarray) -> float:
            n = float(x.size)
            sx, sy = x.sum(), y.sum()
            sxx, sxy, syy = (x * x).sum(), (x * y).sum(), (y * y).sum()
            return (n * sxy - sx * sy) / math.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            )

        r1 = _pearson(v[:-1], v[1:])
        r2 = _pearson(v[:-2], v[2:])
        pacf2 = (r2 - r1 * r1) / (1 - r1 * r1)
        return pd.DataFrame({
            "n_days": [np.int64(v.size)],
            "pacf1": round_half_up(np.array([r1])),
            "pacf2": round_half_up(np.array([pacf2])),
        })

    def r113_grubbs(sf_dir):
        # Grubbs' single-outlier statistic on the daily value-sum
        # series: G = max|x - mean| / sd_samp, plus WHICH day attains
        # it (ties break to the earliest day, mirrored in SQL by
        # (deviation DESC, day ASC) ordering). The classic
        # one-anomaly screen next to r87's seasonal version.
        daily = _daily_sums(sf_dir)
        v = daily["s"].to_numpy(np.float64)
        n = v.size
        mu = v.mean()
        sd = math.sqrt(float(((v - mu) ** 2).sum()) / (n - 1))
        dev = np.abs(v - mu)
        i = int(np.lexsort((daily["day"].to_numpy(), -dev))[0])
        return pd.DataFrame({
            "n_days": [np.int64(n)],
            "g_stat": round_half_up(np.array([dev[i] / sd])),
            "day_flagged": [np.int64(daily["day"].iloc[i])],
        })

    def r114_mad_outliers(sf_dir):
        # robust outlier count via the median-absolute-deviation rule
        # (|0.6745 * (x - median) / MAD| > 3.5, Iglewicz-Hoaglin):
        # the robust companion to r107's Tukey fences — immune to the
        # outliers it hunts. Median and MAD interpolate linearly
        # (numpy percentile == quantile_cont) on the bounded daily
        # table; the z formula mirrors the oracle's op order so the
        # strict > comparison agrees bitwise.
        daily = _daily_sums(sf_dir)
        v = daily["s"].to_numpy(np.float64)
        med = float(np.percentile(v, 50, method="linear"))
        mad = float(np.percentile(np.abs(v - med), 50, method="linear"))
        z = 0.6745 * (v - med) / mad
        return pd.DataFrame({
            "n_days": [np.int64(v.size)],
            "med": round_half_up(np.array([med])),
            "mad": round_half_up(np.array([mad])),
            "n_outliers": [np.int64(int((np.abs(z) > 3.5).sum()))],
        })

    def r115_rescaled_range(sf_dir):
        # rescaled-range statistic (max - min of the mean-adjusted
        # cumulative sum, over sd_pop * sqrt(n)) on the daily series —
        # the single-window Hurst/R-S long-memory screen, and the
        # span form of a CUSUM chart. Cumulative walk + extrema fold
        # on the bounded daily table; SQL replays it with a window
        # cumulative sum.
        daily = _daily_sums(sf_dir)
        v = daily["s"].to_numpy(np.float64)
        n = v.size
        mu = v.mean()
        cs = np.cumsum(v - mu)
        sd = math.sqrt(float(((v - mu) ** 2).sum()) / n)
        stat = (float(cs.max()) - float(cs.min())) / (sd * math.sqrt(n))
        return pd.DataFrame({
            "n_days": [np.int64(n)],
            "rescaled_range": round_half_up(np.array([stat])),
        })

    def e26_manifest_snapshot(sf_dir):
        # Iceberg-style snapshot publish + manifest-scoped read (the
        # commit protocol behind warehouse table formats, and the
        # resumable-output contract at 100 TB: a failed publish leaves
        # the previous manifest intact): lineitem projects through a
        # write_snapshot publish, an ORPHAN parquet part is then
        # planted in the table dir to simulate a crashed concurrent
        # writer, and read_snapshot must exclude it — the oracle
        # replays the aggregate straight off the lineitem view, so any
        # orphan leakage breaks the value check.
        import ray.data as rd

        from search_engine_ray.ops.sinks import read_snapshot, write_snapshot

        src = os.path.join(sf_dir, "lineitem.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        base = f"/tmp/ser_snapshot_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        if not os.path.exists(os.path.join(base, "_DONE")):
            import shutil

            shutil.rmtree(base, ignore_errors=True)
            os.makedirs(base, exist_ok=True)
            li = rd.read_parquet(src, columns=["l_returnflag", "l_extendedprice"])
            write_snapshot(li, base)
            orphan_dir = os.path.join(base, "data-orphan")
            os.makedirs(orphan_dir, exist_ok=True)
            pq.write_table(
                pa.table({
                    "l_returnflag": pa.array(["X"] * 5, pa.string()),
                    "l_extendedprice": pa.array([1.0] * 5, pa.float64()),
                }),
                os.path.join(orphan_dir, "orphan.parquet"),
            )
            open(os.path.join(base, "_DONE"), "w").write("ok")

        ds = read_snapshot(base)
        out = (
            rel.grouped_aggregate(
                ds, ["l_returnflag"],
                {"n": ("count", "l_returnflag"), "s": ("sum", "l_extendedprice")},
            )
            .to_pandas().sort_values("l_returnflag", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "l_returnflag": out["l_returnflag"],
            "n": out["n"].astype("int64"),
            "sum_price": round_half_up(out["s"].to_numpy()),
        })

    def r116_rate_ratio(sf_dir):
        # Poisson rate-ratio A/B readout for event COUNTS (the
        # companion to r81's proportion z and r103's SRM, for metrics
        # that are rates rather than means): cohorts by the k-parity
        # rule, ratio = n1/n0, conditional-binomial z =
        # (n1 - n0)/sqrt(n1 + n0), and the standard log-ratio 95% CI
        # exp(ln(n1/n0) -/+ 1.96*sqrt(1/n1 + 1/n0)). One 2-row
        # combiner; the statistics close on two numbers.
        ev = _read(sf_dir, "events", ["props"])

        def _partial(t: pa.Table) -> pa.Table:
            k = pc.cast(
                pc.struct_field(pc.extract_regex(t["props"], r'"k": (?P<k>\d+)'), "k"),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            df = pd.DataFrame({"grp": (k % 2).astype(np.int64), "n": 1.0})
            g = df.groupby("grp", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = rel.grouped_aggregate(
            ev.map_batches(_partial, batch_format="pyarrow"), ["grp"],
            {"n": ("sum", "n")},
        ).to_pandas().set_index("grp")
        n0, n1 = float(m.loc[0, "n"]), float(m.loc[1, "n"])
        ratio = n1 / n0
        z = (n1 - n0) / math.sqrt(n1 + n0)
        hw = 1.96 * math.sqrt(1.0 / n1 + 1.0 / n0)
        return pd.DataFrame({
            "n0": [np.int64(n0)], "n1": [np.int64(n1)],
            "rate_ratio": round_half_up(np.array([ratio])),
            "z": round_half_up(np.array([z])),
            "ci_lo": round_half_up(np.array([math.exp(math.log(ratio) - hw)])),
            "ci_hi": round_half_up(np.array([math.exp(math.log(ratio) + hw)])),
        })

    def t_vocab_growth(sf_dir):
        # Heaps-law vocabulary growth curve at five doc_id-ordered
        # checkpoints (the corpus-scaling question — "how fast does
        # the vocab still grow?" — behind tokenizer sizing and
        # dedup-payoff estimates): rather than five distinct-scans,
        # ONE per-token min-doc combiner (the novelty-fractions shape)
        # gives every checkpoint's vocab as a masked count over the
        # bounded (token, first_doc) table, and one 5-row combiner
        # carries cumulative token counts.
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        mx = int(docs.max("doc_id"))
        thr = np.array([(k * mx) // 5 for k in range(1, 6)], np.int64)

        from search_engine_ray.ops.text import _flat_tokens

        def _mind(t: pa.Table) -> pa.Table:
            flat, parents, _n = _flat_tokens(t["text"])
            ids = t["doc_id"].to_numpy()[parents]
            df = pd.DataFrame({"t": flat.to_numpy(zero_copy_only=False), "mind": ids})
            g = df.groupby("t", as_index=False).min()
            return pa.Table.from_pandas(g, preserve_index=False)

        vocab_tbl = rel.grouped_aggregate(
            docs.map_batches(_mind, batch_format="pyarrow"), ["t"],
            {"mind": ("min", "mind")},
        ).to_pandas()
        mind = vocab_tbl["mind"].to_numpy(np.int64)
        vocab = np.array([(mind <= th).sum() for th in thr], np.int64)

        def _cnt(t: pa.Table) -> pa.Table:
            _flat, parents, n = _flat_tokens(t["text"])
            per_doc = np.bincount(parents, minlength=n)
            ids = t["doc_id"].to_numpy()
            return pa.table({
                "k": pa.array(np.arange(1, 6, dtype=np.int64)),
                "c": pa.array(
                    [int(per_doc[ids <= th].sum()) for th in thr], pa.int64()
                ),
            })

        cnt = (
            rel.grouped_aggregate(
                docs.map_batches(_cnt, batch_format="pyarrow"), ["k"],
                {"c": ("sum", "c")},
            )
            .to_pandas().sort_values("k", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "k": cnt["k"].astype("int64"),
            "n_tokens": cnt["c"].astype("int64"),
            "vocab": vocab,
        })

    def sketch_heavy_hitters(sf_dir):
        # two-phase heavy hitters over the corpus token stream
        # (sketch.heavy_hitters): per-block Misra-Gries truncation
        # with explicit dropped-mass tracking -> one capacity-bounded
        # combiner -> broadcast candidates -> ONE exact masked-count
        # pass. The production top-k shape: the sketch bounds memory,
        # the exact pass makes the answer (and its tie-breaks) match
        # the oracle value-for-value.
        from search_engine_ray.ops.sketch import heavy_hitters
        from search_engine_ray.ops.text import _flat_tokens

        docs = _read(sf_dir, "documents", ["text"])

        def _toks(t: pa.Table) -> pa.Table:
            flat, _p, _n = _flat_tokens(t["text"])
            return pa.table({"tok": flat})

        out = heavy_hitters(
            docs.map_batches(_toks, batch_format="pyarrow"), "tok", k=10, capacity=64
        )
        return pd.DataFrame({
            "tok": out["v"],
            "cnt": out["c"].astype("int64"),
        })

    def e27_delta_rollup(sf_dir):
        # incremental materialized-view maintenance (the only way a
        # 100-TB rollup stays fresh): the base rollup over days
        # BEFORE the split point lives as a parquet artifact
        # (mtime-keyed cache standing in for yesterday's build); the
        # entry touches RAW events only for the delta tail (day >=
        # split, a pushed-down filter read), folds delta partials,
        # and merges base + delta through one groupby-sum — additive
        # combiner states make the merge exact. Oracle = the full
        # from-scratch rollup.
        import ray.data as rd

        src = os.path.join(sf_dir, "events.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        base_dir = f"/tmp/ser_delta_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"

        ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "event_type": t["event_type"],
                "day": pa.array(
                    t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()
                ),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "s": t["value"],
            })

        daily = ev.map_batches(_day, batch_format="pyarrow")
        split = int(daily.max("day")) - 5

        if not os.path.exists(os.path.join(base_dir, "_DONE")):
            import shutil

            shutil.rmtree(base_dir, ignore_errors=True)
            rel.grouped_aggregate(
                daily.map_batches(
                    lambda t: t.filter(pc.less(t["day"], split)), batch_format="pyarrow"
                ),
                ["event_type", "day"], {"n": ("sum", "n"), "s": ("sum", "s")},
            ).write_parquet(os.path.join(base_dir, "base"))
            open(os.path.join(base_dir, "_DONE"), "w").write("ok")

        delta = daily.map_batches(
            lambda t: t.filter(pc.greater_equal(t["day"], split)), batch_format="pyarrow"
        )
        base = rd.read_parquet(os.path.join(base_dir, "base"))
        out = (
            rel.grouped_aggregate(
                base.union(delta), ["event_type", "day"],
                {"n": ("sum", "n"), "s": ("sum", "s")},
            )
            .to_pandas().sort_values(["event_type", "day"], kind="mergesort")
            .reset_index(drop=True)
        )
        return pd.DataFrame({
            "event_type": out["event_type"],
            "day": out["day"].astype("int64"),
            "n": out["n"].astype("int64"),
            "s": round_half_up(out["s"].to_numpy()),
        })

    def e28_zorder_layout(sf_dir):
        # Z-ORDER data layout (the multi-column pruning lever behind
        # Delta/Iceberg OPTIMIZE ZORDER): lineitem rows land in 16
        # z-bucket partitions by bit-interleaving the quantized
        # (l_partkey, l_suppkey) coordinates, so a 2-D box predicate
        # maps to a SMALL bucket set — the entry enumerates the
        # buckets its box can touch, reads ONLY those directories
        # (file-level pruning, e21's axis extended to two columns at
        # once), exact-filters inside, and aggregates. The oracle runs
        # the same box on the unclustered view, so any pruning error
        # breaks the value check.
        import ray.data as rd

        src = os.path.join(sf_dir, "lineitem.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        zdir = f"/tmp/ser_zorder_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"

        li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        max_pk = int(li.max("l_partkey"))
        max_sk = int(li.max("l_suppkey"))

        def _interleave4(qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
            z = np.zeros_like(qx)
            for b in range(4):
                z |= ((qx >> b) & 1) << (2 * b)
                z |= ((qy >> b) & 1) << (2 * b + 1)
            return z

        if not os.path.exists(os.path.join(zdir, "_DONE")):
            import shutil

            shutil.rmtree(zdir, ignore_errors=True)

            def _zb(t: pa.Table) -> pa.Table:
                pk = t["l_partkey"].to_numpy().astype(np.int64)
                sk = t["l_suppkey"].to_numpy().astype(np.int64)
                qx = pk * 16 // (max_pk + 1)
                qy = sk * 16 // (max_sk + 1)
                zb = _interleave4(qx, qy) // 16
                return t.append_column("zb", pa.array(zb, pa.int64()))

            li.map_batches(_zb, batch_format="pyarrow").write_parquet(
                zdir, partition_cols=["zb"]
            )
            open(os.path.join(zdir, "_DONE"), "w").write("ok")

        pk_hi = max_pk // 4
        sk_hi = max_sk // 4
        qxs = np.arange(0, pk_hi * 16 // (max_pk + 1) + 1, dtype=np.int64)
        qys = np.arange(0, sk_hi * 16 // (max_sk + 1) + 1, dtype=np.int64)
        gx, gy = np.meshgrid(qxs, qys)
        zbs = sorted(set((_interleave4(gx.ravel(), gy.ravel()) // 16).tolist()))
        ds = rd.read_parquet([os.path.join(zdir, f"zb={z}") for z in zbs])

        def _box(t: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.less_equal(t["l_partkey"], pk_hi),
                pc.less_equal(t["l_suppkey"], sk_hi),
            )
            tt = t.filter(m)
            return pa.table({
                "g": pa.array(np.zeros(tt.num_rows, np.int64)),
                "n": pa.array(np.ones(tt.num_rows, np.int64)),
                "s": tt["l_extendedprice"],
            })

        f = rel.grouped_aggregate(
            ds.map_batches(_box, batch_format="pyarrow"), ["g"],
            {"n": ("sum", "n"), "s": ("sum", "s")},
        ).to_pandas()
        return pd.DataFrame({
            "n": [np.int64(f["n"].iloc[0])],
            "sum_price": round_half_up(np.array([float(f["s"].iloc[0])])),
        })

    def r117_selfjoin_size(sf_dir):
        # self-join size / F2 moment estimation via the count-min
        # inner product (AMS-style: est = min over rows of sum of
        # squared cells, always >= truth) — the optimizer primitive
        # that prices a join or flags a hot key BEFORE shuffling
        # anything: the sketch streams in one linear-partial pass,
        # the exact value rides the per-key count combiner, and the
        # oracle replays the md5 cell hashing bit-for-bit.
        from search_engine_ray.ops.sketch import cm_sketch

        ev = _read(sf_dir, "events", ["user_id"])
        cm = cm_sketch(ev, "user_id", depth=4, width=1024)
        est = int((cm.grid.astype(np.int64) ** 2).sum(axis=1).min())
        cnt = rel.grouped_aggregate(
            ev, ["user_id"], {"n": ("count", "user_id")}
        ).to_pandas()
        f2 = int((cnt["n"].to_numpy(np.int64) ** 2).sum())
        return pd.DataFrame({
            "f2_exact": [np.int64(f2)],
            "f2_est": [np.int64(est)],
        })

    def ann_label_cohesion(sf_dir):
        # intra-class cohesion of the embedding space (the clustering
        # readout behind "are these labels separable" / SemDeDup
        # cluster-quality checks): per-label centroid from ONE
        # (label, dim) component combiner — bounded by labels x dim,
        # never by vectors — then centroids broadcast and a second
        # streaming pass folds each member's cosine to its centroid.
        emb = _read(sf_dir, "embeddings", ["label", "embedding"])

        def _comp(t: pa.Table) -> pa.Table:
            lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = np.vstack(
                [np.asarray(x, np.float64) for x in t["embedding"].to_pylist()]
            )
            dim = m.shape[1]
            labs = np.repeat(lab, dim)
            idxs = np.tile(np.arange(dim, dtype=np.int64), len(lab))
            df = pd.DataFrame({"label": labs, "idx": idxs, "s": m.ravel(), "n": 1.0})
            g = df.groupby(["label", "idx"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        comp = rel.grouped_aggregate(
            emb.map_batches(_comp, batch_format="pyarrow"), ["label", "idx"],
            {"s": ("sum", "s"), "n": ("sum", "n")},
        ).to_pandas().sort_values(["label", "idx"], kind="mergesort")
        cents = {
            int(lab): (grp["s"].to_numpy(np.float64) / grp["n"].to_numpy(np.float64))
            for lab, grp in comp.groupby("label", sort=True)
        }
        import ray as _ray

        cref = _ray.put(cents)

        def _cos(t: pa.Table) -> pa.Table:
            cs = _ray.get(cref)
            lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = np.vstack(
                [np.asarray(x, np.float64) for x in t["embedding"].to_pylist()]
            )
            out_l: list[int] = []
            out_n: list[float] = []
            out_c: list[float] = []
            for lv in np.unique(lab):
                sub = m[lab == lv]
                c = cs[int(lv)]
                dots = sub @ c
                cosv = dots / (np.sqrt((sub * sub).sum(axis=1)) * math.sqrt(float(c @ c)))
                out_l.append(int(lv))
                out_n.append(float(len(sub)))
                out_c.append(float(cosv.sum()))
            return pa.table({
                "label": pa.array(out_l, pa.int64()),
                "n": pa.array(out_n, pa.float64()),
                "sc": pa.array(out_c, pa.float64()),
            })

        f = (
            rel.grouped_aggregate(
                emb.map_batches(_cos, batch_format="pyarrow"), ["label"],
                {"n": ("sum", "n"), "sc": ("sum", "sc")},
            )
            .to_pandas().sort_values("label", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "label": f["label"].astype("int64"),
            "n": f["n"].astype("int64"),
            "cohesion": round_half_up(f["sc"].to_numpy() / f["n"].to_numpy()),
        })

    def e29_cdc_merge(sf_dir):
        # change-data-capture MERGE (the warehouse MERGE INTO /
        # Debezium-consumer pattern): a base snapshot plus a CDC log
        # of full-row-image updates (seq 1) and delete tombstones
        # (seq 2) collapse to current state via latest-wins per key —
        # which is exactly group_dedup_first's O(distinct keys)
        # combiner shape, composed rather than reimplemented. The log
        # derives deterministically from orders (key%5 -> +10 price
        # update, key%7 -> delete) so the oracle replays final state
        # from the view directly.
        od = _read(
            sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]
        )

        def _base(t: pa.Table) -> pa.Table:
            return pa.table({
                "o_orderkey": t["o_orderkey"],
                "o_orderstatus": t["o_orderstatus"],
                "o_totalprice": t["o_totalprice"],
                "seq": pa.array(np.zeros(t.num_rows, np.int64)),
                "op": pa.array(["U"] * t.num_rows, pa.string()),
            })

        def _log(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"].to_numpy()
            upd = t.filter(pa.array(k % 5 == 0))
            dele = t.filter(pa.array(k % 7 == 0))
            up = pa.table({
                "o_orderkey": upd["o_orderkey"],
                "o_orderstatus": upd["o_orderstatus"],
                "o_totalprice": pc.add(upd["o_totalprice"], 10.0),
                "seq": pa.array(np.full(upd.num_rows, 1, np.int64)),
                "op": pa.array(["U"] * upd.num_rows, pa.string()),
            })
            de = pa.table({
                "o_orderkey": dele["o_orderkey"],
                "o_orderstatus": dele["o_orderstatus"],
                "o_totalprice": dele["o_totalprice"],
                "seq": pa.array(np.full(dele.num_rows, 2, np.int64)),
                "op": pa.array(["D"] * dele.num_rows, pa.string()),
            })
            return pa.concat_tables([up, de])

        def _shard(t: pa.Table) -> pa.Table:
            return t.append_column(
                "shard",
                pa.array(
                    t["o_orderkey"].to_numpy(zero_copy_only=False) % 256, pa.int64()
                ),
            )

        stream = (
            od.map_batches(_base, batch_format="pyarrow")
            .union(od.map_batches(_log, batch_format="pyarrow"))
            .map_batches(_shard, batch_format="pyarrow")
        )

        # latest-wins + aggregate fold INSIDE each key-hash shard
        # (cooccur's bucket shape): the only exchange sorts 256 shard
        # keys — never the per-key row stream, whose keys are all
        # distinct and would make a key sort O(rows) — and each shard
        # emits one row per orderstatus.
        def _fold(df: pd.DataFrame) -> pd.DataFrame:
            best = (
                df.sort_values(["o_orderkey", "seq"], ascending=[True, False],
                               kind="mergesort")
                .drop_duplicates("o_orderkey", keep="first")
            )
            alive = best[best["op"] == "U"]
            g = alive.groupby("o_orderstatus", as_index=False).agg(
                n=("o_orderkey", "size"), s=("o_totalprice", "sum")
            )
            return g

        f = (
            rel.grouped_aggregate(
                stream.groupby("shard").map_groups(_fold, batch_format="pandas"),
                ["o_orderstatus"], {"n": ("sum", "n"), "s": ("sum", "s")},
            )
            .to_pandas().sort_values("o_orderstatus", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "o_orderstatus": f["o_orderstatus"],
            "n": f["n"].astype("int64"),
            "sum_price": round_half_up(f["s"].to_numpy()),
        })

    def e30_compaction(sf_dir):
        # small-file compaction as a snapshot republish
        # (sinks.compact_snapshot): a deliberately fragmented events
        # snapshot (64 delta-sized files) compacts to 4 right-sized
        # files under the SAME atomic manifest protocol as e26 —
        # readers see fragmented or compacted state, never a mix, and
        # the oracle value-checks that compaction changed nothing but
        # the layout. The maintenance op every long-lived 100-TB
        # table runs nightly.
        import ray.data as rd

        from search_engine_ray.ops.sinks import (
            compact_snapshot,
            read_snapshot,
            write_snapshot,
        )

        src = os.path.join(sf_dir, "events.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        base = f"/tmp/ser_compact_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        if not os.path.exists(os.path.join(base, "_DONE")):
            import shutil

            shutil.rmtree(base, ignore_errors=True)
            os.makedirs(base, exist_ok=True)
            ev = rd.read_parquet(src, columns=["event_type", "value"])
            write_snapshot(ev.repartition(64), base)
            compact_snapshot(base, 4)
            open(os.path.join(base, "_DONE"), "w").write("ok")

        out = (
            rel.grouped_aggregate(
                read_snapshot(base), ["event_type"],
                {"n": ("count", "event_type"), "s": ("sum", "value")},
            )
            .to_pandas().sort_values("event_type", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "event_type": out["event_type"],
            "n": out["n"].astype("int64"),
            "sum_value": round_half_up(out["s"].to_numpy()),
        })

    def r118_gap_fill(sf_dir):
        # calendar gap-fill with linear interpolation (the resample
        # step in front of every time-series op in this repo — r87,
        # r92, r99, r101 all assume a dense day axis): days with
        # day %% 7 == 3 are deterministically knocked out to create
        # gaps at every sf, then the dense calendar regenerates and
        # each hole takes prev + (day - prev_day) * slope between its
        # surviving neighbors — op order identical to the oracle's.
        # All on the bounded daily table.
        daily = _daily_sums(sf_dir)
        keep = daily[daily["day"] % 7 != 3].reset_index(drop=True)
        days = keep["day"].to_numpy(np.int64)
        vals = keep["s"].to_numpy(np.float64)
        full = np.arange(days[0], days[-1] + 1, dtype=np.int64)
        pos = np.searchsorted(days, full)
        present = np.isin(full, days)
        out_s = np.empty(full.size, np.float64)
        out_f = np.zeros(full.size, np.int64)
        for i, dday in enumerate(full):
            if present[i]:
                out_s[i] = vals[np.searchsorted(days, dday)]
            else:
                pj = np.searchsorted(days, dday) - 1
                pd_, nd_ = days[pj], days[pj + 1]
                ps_, ns_ = vals[pj], vals[pj + 1]
                out_s[i] = ps_ + (dday - pd_) * (ns_ - ps_) / (nd_ - pd_)
                out_f[i] = 1
        return pd.DataFrame({
            "day": pd.array(full, "int64"),
            "filled": pd.array(out_f, "int64"),
            "s": round_half_up(out_s),
        })

    def e31_footer_stats(sf_dir):
        # table-health stats from parquet FOOTERS only (the
        # min/max-pruning manifest a 100-TB planner consults before
        # touching data): the hive-partitioned events layout (e21's
        # artifact, same mtime-keyed cache) yields a Dataset OF FILE
        # PATHS; a map_batches over paths reads each footer's
        # row count and ts column statistics — no row ever
        # deserializes — and a per-partition combiner folds them. The
        # oracle recomputes the same numbers the slow way, off the
        # view.
        import glob as _g

        import ray.data as rd

        src = os.path.join(sf_dir, "events.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        part_dir = f"/tmp/ser_hive_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        if not os.path.exists(os.path.join(part_dir, "_DONE")):
            import shutil

            shutil.rmtree(part_dir, ignore_errors=True)
            _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"]).write_parquet(
                part_dir, partition_cols=["event_type"]
            )
            open(os.path.join(part_dir, "_DONE"), "w").write("ok")

        paths = sorted(_g.glob(os.path.join(part_dir, "event_type=*", "*.parquet")))
        pds = rd.from_items([{"path": p} for p in paths])

        def _footer(t: pa.Table) -> pa.Table:
            rows_et: list[str] = []
            rows_n: list[int] = []
            rows_mn: list[int] = []
            rows_mx: list[int] = []
            for p in t["path"].to_pylist():
                et = os.path.basename(os.path.dirname(p)).split("=", 1)[1]
                md = pq.ParquetFile(p).metadata
                ts_idx = next(
                    i for i in range(len(md.schema))
                    if md.schema.column(i).name == "ts"
                )
                n = md.num_rows
                mn = min(
                    md.row_group(r).column(ts_idx).statistics.min
                    for r in range(md.num_row_groups)
                )
                mx = max(
                    md.row_group(r).column(ts_idx).statistics.max
                    for r in range(md.num_row_groups)
                )
                rows_et.append(et)
                rows_n.append(int(n))
                rows_mn.append(int(pd.Timestamp(mn).value // 1000))
                rows_mx.append(int(pd.Timestamp(mx).value // 1000))
            return pa.table({
                "event_type": pa.array(rows_et, pa.string()),
                "n_rows": pa.array(rows_n, pa.int64()),
                "min_ts": pa.array(rows_mn, pa.int64()),
                "max_ts": pa.array(rows_mx, pa.int64()),
            })

        out = (
            rel.grouped_aggregate(
                pds.map_batches(_footer, batch_format="pyarrow"), ["event_type"],
                {"n_rows": ("sum", "n_rows"), "min_ts": ("min", "min_ts"),
                 "max_ts": ("max", "max_ts")},
            )
            .to_pandas().sort_values("event_type", kind="mergesort").reset_index(drop=True)
        )
        for c in ["n_rows", "min_ts", "max_ts"]:
            out[c] = out[c].astype("int64")
        return out

    def r119_std_residuals(sf_dir):
        # standardized Pearson residuals per cell of the event_type x
        # day-of-week contingency table — the drill-down for r91/r104:
        # chi-square says THAT the table deviates, the residual
        # (o - e)/sqrt(e) says WHICH cells drive it. Same bounded cell
        # combiner as r104; the residual grid closes driver-side.
        ev = _read(sf_dir, "events", ["event_type", "ts"])

        def _cell(t: pa.Table) -> pa.Table:
            day = np.floor(
                t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                / 86400000000.0
            ).astype(np.int64)
            df = pd.DataFrame({
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "dow": ((day % 7) + 7) % 7,
                "o": 1,
            })
            g = df.groupby(["event_type", "dow"], as_index=False)["o"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        c = rel.grouped_aggregate(
            ev.map_batches(_cell, batch_format="pyarrow"),
            ["event_type", "dow"], {"o": ("sum", "o")},
        ).to_pandas()
        piv = c.pivot_table(
            index="event_type", columns="dow", values="o", fill_value=0, aggfunc="sum"
        ).astype(np.float64)
        o = piv.to_numpy()
        n = o.sum()
        e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
        r = (o - e) / np.sqrt(e)
        ets = list(piv.index)
        dows = list(piv.columns)
        rows = [
            (et, int(dw), float(o[i, j]), r[i, j])
            for i, et in enumerate(ets)
            for j, dw in enumerate(dows)
        ]
        return pd.DataFrame({
            "event_type": [x[0] for x in rows],
            "dow": pd.array([x[1] for x in rows], "int64"),
            "o": pd.array([int(x[2]) for x in rows], "int64"),
            "residual": round_half_up(np.array([x[3] for x in rows])),
        })

    def r120_mcnemar(sf_dir):
        # McNemar's paired test on per-user click behavior across the
        # two halves of the observation window (did the same users
        # change behavior? — the within-subject companion to the
        # between-cohort r81/r106): per-user (before, after) click
        # flags ride one bounded combiner; the discordant counts b =
        # 1->0 and c = 0->1 give chi2 = (b - c)^2/(b + c).
        ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": t["user_id"],
                "day": pa.array(
                    t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()
                ),
                "is_click": pc.cast(pc.equal(t["event_type"], "click"), pa.int64()),
            })

        daily = ev.map_batches(_day, batch_format="pyarrow")
        lo = int(daily.min("day"))
        hi = int(daily.max("day"))
        mid = (lo + hi) // 2

        def _half(t: pa.Table) -> pa.Table:
            d = t["day"].to_numpy()
            ic = t["is_click"].to_numpy()
            df = pd.DataFrame({
                "user_id": t["user_id"].to_numpy(),
                "before": ((d <= mid) & (ic == 1)).astype(np.int64),
                "after": ((d > mid) & (ic == 1)).astype(np.int64),
            })
            g = df.groupby("user_id", as_index=False).max()
            return pa.Table.from_pandas(g, preserve_index=False)

        u = rel.grouped_aggregate(
            daily.map_batches(_half, batch_format="pyarrow"), ["user_id"],
            {"before": ("max", "before"), "after": ("max", "after")},
        ).to_pandas()
        b = int(((u["before"] == 1) & (u["after"] == 0)).sum())
        cc = int(((u["before"] == 0) & (u["after"] == 1)).sum())
        stat = float((b - cc) ** 2) / float(b + cc) if (b + cc) else 0.0
        return pd.DataFrame({
            "n_users": [np.int64(len(u))],
            "b": [np.int64(b)], "c": [np.int64(cc)],
            "chi2": round_half_up(np.array([stat])),
        })

    def r121_stickiness(sf_dir):
        # DAU/WAU stickiness per day (the product-analytics engagement
        # ratio): daily active users over trailing-7-day active users.
        # The (day, user) DISTINCT table is one combiner exchange
        # bounded by days x users; the trailing-window distinct folds
        # on that table driver-side (never on raw events).
        ev = _read(sf_dir, "events", ["user_id", "ts"])

        def _du(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "day": t["ts"].cast(pa.int64()).to_numpy() // 86400000000,
                "user_id": t["user_id"].to_numpy(),
            }).drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False)

        du = (
            rel.grouped_aggregate(
                ev.map_batches(_du, batch_format="pyarrow"), ["day", "user_id"],
                {"one": ("count", "user_id")},
            ).to_pandas()
        )
        days = np.sort(du["day"].unique())
        rows = []
        for dday in days:
            dau = int((du["day"] == dday).sum())
            w = du[(du["day"] >= dday - 6) & (du["day"] <= dday)]
            wau = int(w["user_id"].nunique())
            rows.append((int(dday), dau, wau, dau / wau))
        return pd.DataFrame({
            "day": pd.array([r[0] for r in rows], "int64"),
            "dau": pd.array([r[1] for r in rows], "int64"),
            "wau": pd.array([r[2] for r in rows], "int64"),
            "stickiness": round_half_up(np.array([r[3] for r in rows])),
        })

    def e32_bucketed_join(sf_dir):
        # pre-bucketed CO-LOCATED join (Hive/Spark bucketing, the
        # 100-TB lever that deletes the join shuffle entirely): both
        # orders and lineitem persist hash-bucketed by orderkey % 16
        # (mtime-keyed layout cache = the one-time bucketing cost);
        # the join then runs as 16 INDEPENDENT bucket-pair tasks — a
        # Dataset of bucket ids map_batches'es read+hash-join+partial
        # — and the only exchange is the per-bucket (status, n, s)
        # partial fold. No row of either table ever moves between
        # buckets. Oracle = the plain SQL join.
        import ray.data as rd

        src_o = os.path.join(sf_dir, "orders.parquet")
        src_l = os.path.join(sf_dir, "lineitem.parquet")
        st_o, st_l = os.stat(src_o), os.stat(src_l)
        tag = sf_dir.strip("/").replace("/", "_")
        base = (
            f"/tmp/ser_bucket_cache/{tag}_{int(st_o.st_mtime)}_{st_o.st_size}"
            f"_{int(st_l.st_mtime)}_{st_l.st_size}"
        )
        if not os.path.exists(os.path.join(base, "_DONE")):
            import shutil

            shutil.rmtree(base, ignore_errors=True)

            def _bko(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "bk", pa.array(t["o_orderkey"].to_numpy() % 16, pa.int64())
                )

            def _bkl(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "bk", pa.array(t["l_orderkey"].to_numpy() % 16, pa.int64())
                )

            rd.read_parquet(src_o, columns=["o_orderkey", "o_orderstatus"]).map_batches(
                _bko, batch_format="pyarrow"
            ).write_parquet(os.path.join(base, "orders"), partition_cols=["bk"])
            rd.read_parquet(src_l, columns=["l_orderkey", "l_extendedprice"]).map_batches(
                _bkl, batch_format="pyarrow"
            ).write_parquet(os.path.join(base, "lineitem"), partition_cols=["bk"])
            open(os.path.join(base, "_DONE"), "w").write("ok")

        buckets = rd.from_items([{"bk": i} for i in range(16)])

        def _join_bucket(t: pa.Table) -> pa.Table:
            outs = []
            for bk in t["bk"].to_pylist():
                o = pq.read_table(
                    os.path.join(base, "orders", f"bk={bk}")
                ).to_pandas()
                l = pq.read_table(
                    os.path.join(base, "lineitem", f"bk={bk}")
                ).to_pandas()
                j = l.merge(
                    o, left_on="l_orderkey", right_on="o_orderkey", how="inner"
                )
                g = j.groupby("o_orderstatus", as_index=False).agg(
                    n=("l_orderkey", "size"), s=("l_extendedprice", "sum")
                )
                outs.append(g)
            return pa.Table.from_pandas(pd.concat(outs), preserve_index=False)

        f = (
            rel.grouped_aggregate(
                buckets.map_batches(_join_bucket, batch_format="pyarrow", batch_size=1),
                ["o_orderstatus"], {"n": ("sum", "n"), "s": ("sum", "s")},
            )
            .to_pandas().sort_values("o_orderstatus", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "o_orderstatus": f["o_orderstatus"],
            "n": f["n"].astype("int64"),
            "sum_price": round_half_up(f["s"].to_numpy()),
        })

    def r122_psi_drift(sf_dir):
        # population stability index between the value distribution of
        # the first and second halves of the window (THE drift metric
        # ML monitoring quotes): 10 equal-width bins anchored on the
        # reference half's min/max (clamped at the edges), Laplace
        # 0.5-smoothing on both bin vectors, PSI = sum((p - q) *
        # ln(p/q)). Three cheap streaming aggregates (day bounds, ref
        # bounds, bin counts) — bin arithmetic mirrors the oracle's op
        # order so edge assignment agrees bitwise.
        ev = _read(sf_dir, "events", ["ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "day": pa.array(
                    t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()
                ),
                "value": t["value"],
            })

        dv = ev.map_batches(_day, batch_format="pyarrow")
        lo, hi = int(dv.min("day")), int(dv.max("day"))
        mid = (lo + hi) // 2
        ref = dv.map_batches(
            lambda t: t.filter(pc.less_equal(t["day"], mid)), batch_format="pyarrow"
        )
        mn = float(ref.min("value"))
        mx = float(ref.max("value"))
        width = (mx - mn) / 10.0

        def _bins(t: pa.Table) -> pa.Table:
            d = t["day"].to_numpy()
            v = t["value"].to_numpy().astype(np.float64)
            b = np.minimum(9, np.maximum(0, np.floor((v - mn) / width))).astype(np.int64)
            df = pd.DataFrame({
                "half": np.where(d <= mid, 0, 1).astype(np.int64),
                "bin": b, "c": 1,
            })
            g = df.groupby(["half", "bin"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        c = rel.grouped_aggregate(
            dv.map_batches(_bins, batch_format="pyarrow"), ["half", "bin"],
            {"c": ("sum", "c")},
        ).to_pandas()
        pref = np.zeros(10)
        pcur = np.zeros(10)
        for _, row in c.iterrows():
            (pref if row["half"] == 0 else pcur)[int(row["bin"])] = row["c"]
        n_ref, n_cur = pref.sum(), pcur.sum()
        p = (pref + 0.5) / (n_ref + 5.0)
        q = (pcur + 0.5) / (n_cur + 5.0)
        psi = float(((p - q) * np.log(p / q)).sum())
        return pd.DataFrame({
            "n_ref": [np.int64(n_ref)], "n_cur": [np.int64(n_cur)],
            "psi": round_half_up(np.array([psi])),
        })

    def r123_cond_entropy(sf_dir):
        # conditional entropy H(next | current) of the per-user event
        # stream, plus the marginal H(next) and their difference (the
        # mutual information — how predictable the next action is):
        # the (from, to, cnt) pair table rides r83's user-sharded
        # derivation (bounded by |types|^2); the entropies fold
        # driver-side on that tiny matrix.
        ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

        def _bucket(t: pa.Table) -> pa.Table:
            u = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({
                "_b": pa.array((u * np.int64(2654435761)) % np.int64(64), pa.int64()),
                "u": pa.array(u, pa.int64()),
                "ts": t["ts"].cast(pa.int64()),
                "eid": t["event_id"].cast(pa.int64()),
                "et": t["event_type"],
            })

        def _pairs(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            ts = t["ts"].to_numpy(zero_copy_only=False)
            eid = t["eid"].to_numpy(zero_copy_only=False)
            et = np.asarray(t["et"].to_pylist(), dtype=object)
            o = np.lexsort((eid, ts, u))
            u, et = u[o], et[o]
            same = u[1:] == u[:-1]
            df = pd.DataFrame({
                "from_type": et[:-1][same], "to_type": et[1:][same], "cnt": 1
            })
            g = df.groupby(["from_type", "to_type"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = rel.grouped_aggregate(
            ev.map_batches(_bucket, batch_format="pyarrow")
            .groupby("_b").map_groups(_pairs, batch_format="pyarrow"),
            ["from_type", "to_type"], {"cnt": ("sum", "cnt")},
        ).to_pandas()
        c = m["cnt"].to_numpy(np.float64)
        n = c.sum()
        cf = m.groupby("from_type")["cnt"].transform("sum").to_numpy(np.float64)
        h_cond = float(-((c / n) * np.log(c / cf)).sum())
        ct = m.groupby("to_type")["cnt"].sum().to_numpy(np.float64)
        h_next = float(-((ct / n) * np.log(ct / n)).sum())
        return pd.DataFrame({
            "n_pairs": [np.int64(n)],
            "h_cond": round_half_up(np.array([h_cond])),
            "h_next": round_half_up(np.array([h_next])),
            "mutual_info": round_half_up(np.array([h_next - h_cond])),
        })

    def r124_streaks(sf_dir):
        # gaps-and-islands: longest run of CONSECUTIVE active days per
        # user (the engagement-streak metric, and the canonical
        # islands problem — day minus rank is constant within an
        # island): the (day, user) distinct combiner table is the only
        # exchange (bounded by users x days); islands fold vectorized
        # on that table. Output mirrors the SQL row_number-difference
        # formulation exactly.
        ev = _read(sf_dir, "events", ["user_id", "ts"])

        def _du(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "day": t["ts"].cast(pa.int64()).to_numpy() // 86400000000,
                "user_id": t["user_id"].to_numpy(),
            }).drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False)

        du = (
            rel.grouped_aggregate(
                ev.map_batches(_du, batch_format="pyarrow"), ["user_id", "day"],
                {"one": ("count", "day")},
            )
            .to_pandas().sort_values(["user_id", "day"], kind="mergesort")
        )
        rows = []
        for uid, grp in du.groupby("user_id", sort=True):
            days = grp["day"].to_numpy(np.int64)
            anchor = days - np.arange(len(days))
            _, counts = np.unique(anchor, return_counts=True)
            rows.append((int(uid), len(days), int(counts.max())))
        return pd.DataFrame({
            "user_id": pd.array([r[0] for r in rows], "int64"),
            "n_active_days": pd.array([r[1] for r in rows], "int64"),
            "longest_streak": pd.array([r[2] for r in rows], "int64"),
        })

    def t_split_leakage(sf_dir):
        # deterministic 80/10/10 train/val/test split + contamination
        # audit (the split every training pipeline cuts, plus the
        # check everyone forgets: EXACT-duplicate texts straddling a
        # split boundary leak eval answers into training): assignment
        # = md5('split:' || doc_id) % 10, leakage = texts whose md5
        # appears in >= 2 distinct splits. One (text-hash, split)
        # distinct exchange bounded by distinct texts; split sizes
        # ride a 3-row combiner.
        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def _assign(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            h = np.array(
                [
                    int.from_bytes(
                        hashlib.md5(f"split:{i}".encode()).digest()[:8], "little"
                    ) % 10
                    for i in ids
                ],
                np.int64,
            )
            split = np.where(h <= 7, 0, np.where(h == 8, 1, 2))
            th = [
                hashlib.md5((x if x is not None else "").encode()).hexdigest()
                for x in t["text"].to_pylist()
            ]
            df = pd.DataFrame({"split": split, "th": th}).drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False)

        pairs = rel.grouped_aggregate(
            docs.map_batches(_assign, batch_format="pyarrow"), ["th", "split"],
            {"one": ("count", "split")},
        ).to_pandas()
        leaky = int((pairs.groupby("th")["split"].count() > 1).sum())

        def _sizes(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            h = np.array(
                [
                    int.from_bytes(
                        hashlib.md5(f"split:{i}".encode()).digest()[:8], "little"
                    ) % 10
                    for i in ids
                ],
                np.int64,
            )
            split = np.where(h <= 7, 0, np.where(h == 8, 1, 2))
            df = pd.DataFrame({"split": split, "n": 1})
            g = df.groupby("split", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        sz = rel.grouped_aggregate(
            docs.map_batches(_sizes, batch_format="pyarrow"), ["split"],
            {"n": ("sum", "n")},
        ).to_pandas().set_index("split")["n"]
        return pd.DataFrame({
            "n_train": [np.int64(sz.get(0, 0))],
            "n_val": [np.int64(sz.get(1, 0))],
            "n_test": [np.int64(sz.get(2, 0))],
            "n_leaky_texts": [np.int64(leaky)],
        })

    def r125_hhi(sf_dir):
        # Herfindahl-Hirschman concentration of order revenue across
        # customers (the market/supplier-concentration metric risk
        # teams track — "does one customer dominate the book?"):
        # per-customer revenue rides one combiner; HHI = 10000 *
        # sum(share^2) folds on the bounded customer table, with the
        # top-1 share alongside.
        od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        c = rel.grouped_aggregate(
            od, ["o_custkey"], {"s": ("sum", "o_totalprice")}
        ).to_pandas()
        v = c["s"].to_numpy(np.float64)
        tot = v.sum()
        share = v / tot
        hhi = float((share * share).sum()) * 10000.0
        return pd.DataFrame({
            "n_customers": [np.int64(len(v))],
            "hhi": round_half_up(np.array([hhi])),
            "top_share": round_half_up(np.array([float(share.max())])),
        })

    def r126_kaplan_meier(sf_dir):
        # Kaplan-Meier survival curve over user lifetimes (the
        # censoring-aware churn readout — naive "average lifetime"
        # understates retention because users still active at the
        # window edge haven't churned yet): per-user (first, last)
        # day rides one min/max combiner; lifetime = last - first,
        # churned iff last < max_day - 6 (else right-censored). The
        # KM product S(t) = prod(1 - d_i/n_i) folds on the bounded
        # distinct-duration table; the oracle replays it as
        # exp(window-sum(ln)) — equal at 4dp. Subjects are
        # (user, event_type) pairs — per-feature engagement spans —
        # because every USER stays active to the window edge at all
        # sfs (all-censored = empty curve); feature-level spans churn.
        ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "day": pa.array(
                    t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()
                ),
            })

        dd = ev.map_batches(_day, batch_format="pyarrow")
        mx = int(dd.max("day"))
        u = (
            rel.grouped_aggregate(
                dd, ["user_id", "event_type"],
                {"f": ("min", "day"), "l": ("max", "day")}
            ).to_pandas()
        )
        t_ = (u["l"] - u["f"]).to_numpy(np.int64)
        evt = (u["l"].to_numpy(np.int64) < mx - 6).astype(np.int64)
        rows = []
        s = 1.0
        for tv in np.unique(t_[evt == 1]):
            d_ = int(((t_ == tv) & (evt == 1)).sum())
            n_risk = int((t_ >= tv).sum())
            s *= 1.0 - d_ / n_risk
            rows.append((int(tv), n_risk, d_, s))
        return pd.DataFrame({
            "t": pd.array([r[0] for r in rows], "int64"),
            "n_risk": pd.array([r[1] for r in rows], "int64"),
            "d": pd.array([r[2] for r in rows], "int64"),
            "surv": round_half_up(np.array([r[3] for r in rows])),
        })

    def r127_cuped(sf_dir):
        # CUPED variance reduction for the A/B readout (the standard
        # experimentation-platform trick: regress the post-period
        # metric on the pre-period covariate and analyze the
        # residualized metric — same mean difference, much tighter
        # CI): per-user pre/post value sums ride one combiner
        # (bounded by users); theta = cov(x, y)/var(x) and the
        # adjusted cohort means / variance-reduction ratio fold on
        # that table. Cohorts by user parity.
        ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": t["user_id"],
                "day": pa.array(
                    t["ts"].cast(pa.int64()).to_numpy() // 86400000000, pa.int64()
                ),
                "value": t["value"],
            })

        dv = ev.map_batches(_day, batch_format="pyarrow")
        lo, hi = int(dv.min("day")), int(dv.max("day"))
        mid = (lo + hi) // 2

        def _prepost(t: pa.Table) -> pa.Table:
            d_ = t["day"].to_numpy()
            v = t["value"].to_numpy().astype(np.float64)
            df = pd.DataFrame({
                "user_id": t["user_id"].to_numpy(),
                "x": np.where(d_ <= mid, v, 0.0),
                "y": np.where(d_ > mid, v, 0.0),
            })
            g = df.groupby("user_id", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        u = rel.grouped_aggregate(
            dv.map_batches(_prepost, batch_format="pyarrow"), ["user_id"],
            {"x": ("sum", "x"), "y": ("sum", "y")},
        ).to_pandas()
        x = u["x"].to_numpy(np.float64)
        y = u["y"].to_numpy(np.float64)
        n = float(len(u))
        sx, sy = x.sum(), y.sum()
        theta = (n * float((x * y).sum()) - sx * sy) / (n * float((x * x).sum()) - sx * sx)
        xbar = sx / n
        yadj = y - theta * (x - xbar)
        grp = (u["user_id"].to_numpy(np.int64) % 2).astype(np.int64)
        m0 = float(yadj[grp == 0].mean())
        m1 = float(yadj[grp == 1].mean())
        var_y = float(((y - sy / n) ** 2).sum()) / n
        var_a = float(((yadj - yadj.sum() / n) ** 2).sum()) / n
        return pd.DataFrame({
            "n_users": [np.int64(n)],
            "theta": round_half_up(np.array([theta])),
            "mean0_adj": round_half_up(np.array([m0])),
            "mean1_adj": round_half_up(np.array([m1])),
            "var_reduction": round_half_up(np.array([1.0 - var_a / var_y])),
        })

    def r128_hill_tail(sf_dir):
        # Hill estimator of the power-law tail index of the per-user
        # activity distribution (the quantitative companion to
        # t_zipf's fit: alpha says HOW heavy the heavy-hitter tail
        # is, which prices the hot-key salting this repo's shuffles
        # rely on): per-user counts ride one combiner; the top-(k+1)
        # order statistics and alpha = k / sum(ln(x_i / x_{k+1}))
        # fold on the bounded count table.
        ev = _read(sf_dir, "events", ["user_id"])
        c = rel.grouped_aggregate(
            ev, ["user_id"], {"n": ("count", "user_id")}
        ).to_pandas()
        v = np.sort(c["n"].to_numpy(np.float64))[::-1]
        k = min(20, v.size - 1)
        thr = v[k]
        alpha = k / float(np.log(v[:k] / thr).sum())
        return pd.DataFrame({
            "k": [np.int64(k)],
            "threshold": round_half_up(np.array([thr])),
            "alpha": round_half_up(np.array([alpha])),
        })

    def r129_skyline(sf_dir):
        # SKYLINE (Pareto-front) operator over part (minimize
        # retailprice, maximize size — "no part is both cheaper and
        # bigger"): the classic multi-objective relational operator,
        # distributed the canonical way — each block computes its
        # LOCAL skyline (correct because global skyline is a subset
        # of the union of local skylines; dominance is transitive),
        # locals union into one bounded candidate set, and the final
        # dominance scan runs on that small set. Tie semantics match
        # the oracle's NOT EXISTS exactly: equal (price, size) points
        # co-survive.
        pt = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

        def _sky(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(
                ["p_retailprice", "p_size", "p_partkey"],
                ascending=[True, False, True], kind="mergesort",
            )
            price = df["p_retailprice"].to_numpy(np.float64)
            size = df["p_size"].to_numpy(np.int64)
            keep = np.zeros(len(df), bool)
            best_prev = -np.inf  # max size among strictly cheaper parts
            i = 0
            while i < len(df):
                j = i
                while j < len(df) and price[j] == price[i]:
                    j += 1
                gmax = size[i:j].max()
                if gmax > best_prev:
                    keep[i:j] = size[i:j] == gmax
                best_prev = max(best_prev, gmax)
                i = j
            return df[keep]

        local = pt.map_batches(_sky, batch_format="pandas")
        final = (
            _sky(local.to_pandas())
            .sort_values("p_partkey", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "p_partkey": final["p_partkey"].astype("int64"),
            "price": round_half_up(final["p_retailprice"].to_numpy(np.float64)),
            "size": final["p_size"].astype("int64"),
        })

    def r130_embed_cov(sf_dir):
        # full covariance matrix of the embedding space (the PCA /
        # whitening building block, and matrix_stats' big brother):
        # each batch contributes ONE vectorized X^T X partial (a
        # dim x dim matmul), plus the column-sum and count — the
        # exchange carries dim^2-sized partials, never vectors — and
        # cov = XtX/n - mu mu^T closes driver-side. Output is the
        # upper triangle as (i, j, cov) rows.
        emb = _read(sf_dir, "embeddings", ["embedding"])

        def _xtx(t: pa.Table) -> pa.Table:
            m = np.vstack(
                [np.asarray(x, np.float64) for x in t["embedding"].to_pylist()]
            )
            dim = m.shape[1]
            xtx = m.T @ m
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "n": pa.array([float(m.shape[0])], pa.float64()),
                "sx": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
                "xtx": pa.array([xtx.ravel()], pa.list_(pa.float64())),
            })

        parts = emb.map_batches(_xtx, batch_format="pyarrow").to_pandas()
        n = float(parts["n"].sum())
        sx = np.sum(np.vstack(parts["sx"].to_numpy()), axis=0)
        xtx = np.sum(np.vstack(parts["xtx"].to_numpy()), axis=0)
        dim = sx.size
        mu = sx / n
        cov = xtx.reshape(dim, dim) / n - np.outer(mu, mu)
        iu = np.triu_indices(dim)
        return pd.DataFrame({
            "i": pd.array(iu[0].astype(np.int64), "int64"),
            "j": pd.array(iu[1].astype(np.int64), "int64"),
            "cov": round_half_up(cov[iu]),
        })

    def r131_benford2(sf_dir):
        # Benford SECOND-digit screen on l_extendedprice (the
        # forensic follow-up to r73's first-digit test — fabricated
        # numbers often pass first-digit but fail second): observed
        # second-digit counts ride a 10-row combiner; expected
        # frequencies are the closed form sum(log10(1 + 1/(10a + d)))
        # over leading digits a = 1..9.
        li = _read(sf_dir, "lineitem", ["l_extendedprice"])

        def _d2(t: pa.Table) -> pa.Table:
            x = t["l_extendedprice"].to_numpy().astype(np.float64)
            x = x[x >= 10.0]
            mag = np.floor(np.log10(x))
            d2 = (np.floor(x / np.power(10.0, mag - 1)) % 10).astype(np.int64)
            df = pd.DataFrame({"digit": d2, "n": 1})
            g = df.groupby("digit", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        c = (
            rel.grouped_aggregate(
                li.map_batches(_d2, batch_format="pyarrow"), ["digit"],
                {"n": ("sum", "n")},
            )
            .to_pandas().set_index("digit")["n"]
        )
        tot = float(c.sum())
        digits = np.arange(10)
        obs = np.array([float(c.get(d, 0)) for d in digits])
        exp = np.array([
            sum(math.log10(1.0 + 1.0 / (10 * a + d)) for a in range(1, 10))
            for d in digits
        ])
        return pd.DataFrame({
            "digit": pd.array(digits.astype(np.int64), "int64"),
            "n": pd.array(obs.astype(np.int64), "int64"),
            "obs_frac": round_half_up(obs / tot),
            "exp_frac": round_half_up(exp),
        })

    def e33_deletion_vectors(sf_dir):
        # merge-on-read DELETES (Iceberg v2 / Delta deletion vectors:
        # deletes land as a compact key sidecar, the base files never
        # rewrite, readers anti-join at scan time): the delete vector
        # derives Dataset-side (o_orderkey % 9 == 4), persists as the
        # sidecar parquet (mtime-keyed), and the read applies ONE
        # broadcast anti-filter per batch. Deletion vectors are the
        # SMALL side by design; a delete set beyond driver memory
        # partitions by the data files' own key ranges (positional
        # deletes) and anti-joins per partition instead.
        import ray.data as rd

        src = os.path.join(sf_dir, "orders.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        base = f"/tmp/ser_dv_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        dv_path = os.path.join(base, "deletes")
        if not os.path.exists(os.path.join(base, "_DONE")):
            import shutil

            shutil.rmtree(base, ignore_errors=True)
            os.makedirs(base, exist_ok=True)
            rd.read_parquet(src, columns=["o_orderkey"]).map_batches(
                lambda t: t.filter(pa.array(t["o_orderkey"].to_numpy() % 9 == 4)),
                batch_format="pyarrow",
            ).write_parquet(dv_path)
            open(os.path.join(base, "_DONE"), "w").write("ok")

        dv = rd.read_parquet(dv_path)
        import ray as _ray

        deleted = np.unique(
            np.concatenate(
                [p["o_orderkey"].to_numpy() for p in _ray.get(dv.to_arrow_refs())
                 if p.num_rows]
                or [np.array([], np.int64)]
            )
        )
        ref = _ray.put(deleted)

        def _anti(t: pa.Table) -> pa.Table:
            dels = _ray.get(ref)
            keep = ~np.isin(t["o_orderkey"].to_numpy(), dels)
            tt = t.filter(pa.array(keep))
            return pa.table({
                "o_orderstatus": tt["o_orderstatus"],
                "n": pa.array(np.ones(tt.num_rows, np.int64)),
                "s": tt["o_totalprice"],
            })

        out = (
            rel.grouped_aggregate(
                rd.read_parquet(
                    src, columns=["o_orderkey", "o_orderstatus", "o_totalprice"]
                ).map_batches(_anti, batch_format="pyarrow"),
                ["o_orderstatus"], {"n": ("sum", "n"), "s": ("sum", "s")},
            )
            .to_pandas().sort_values("o_orderstatus", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "o_orderstatus": out["o_orderstatus"],
            "n": out["n"].astype("int64"),
            "sum_price": round_half_up(out["s"].to_numpy()),
        })

    def r132_hist2d(sf_dir):
        # 2-D histogram heatmap of (quantity band, discount band) with
        # revenue per cell (the OLAP companion to the 1-D
        # histogram_aggregate): banding is one vectorized floor per
        # batch with oracle-identical float op order, the exchange
        # carries one row per (cell, block), and the full 5x6 grid
        # emits zero cells like the SQL cross join.
        li = _read(sf_dir, "lineitem", ["l_quantity", "l_discount", "l_extendedprice"])

        def _cell(t: pa.Table) -> pa.Table:
            q = t["l_quantity"].to_numpy().astype(np.float64)
            d_ = t["l_discount"].to_numpy().astype(np.float64)
            qb = np.minimum(4, np.floor(q / 10.0)).astype(np.int64)
            db = np.minimum(5, np.floor(d_ / 0.02)).astype(np.int64)
            df = pd.DataFrame({
                "qb": qb, "db": db, "n": 1,
                "rev": t["l_extendedprice"].to_numpy().astype(np.float64),
            })
            g = df.groupby(["qb", "db"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        c = rel.grouped_aggregate(
            li.map_batches(_cell, batch_format="pyarrow"), ["qb", "db"],
            {"n": ("sum", "n"), "rev": ("sum", "rev")},
        ).to_pandas().set_index(["qb", "db"])
        rows = []
        for qb in range(5):
            for db in range(6):
                if (qb, db) in c.index:
                    r = c.loc[(qb, db)]
                    rows.append((qb, db, int(r["n"]), float(r["rev"])))
                else:
                    rows.append((qb, db, 0, 0.0))
        return pd.DataFrame({
            "qb": pd.array([r[0] for r in rows], "int64"),
            "db": pd.array([r[1] for r in rows], "int64"),
            "n": pd.array([r[2] for r in rows], "int64"),
            "rev": round_half_up(np.array([r[3] for r in rows])),
        })

    def t_source_divergence(sf_dir):
        # Jensen-Shannon divergence between two sources' unigram
        # distributions (the domain-mixing distance a curation
        # pipeline uses to decide whether corpora need separate
        # treatment): per-(source, token) counts ride one combiner
        # bounded by 2 x vocab; Laplace-0.5 smoothing over the UNION
        # vocab, JS = (KL(p||m) + KL(q||m)) / 2 folds driver-side with
        # oracle-identical formula order.
        from search_engine_ray.ops.text import _flat_tokens

        docs = _read(sf_dir, "documents", ["source", "text"])

        def _tok(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t["source"], value_set=pa.array(["src0", "src1"]))
            tt = t.filter(mask)
            if tt.num_rows == 0:
                return pa.table({
                    "src": pa.array([], pa.string()),
                    "tok": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                })
            flat, parents, _n = _flat_tokens(tt["text"])
            src = np.asarray(tt["source"].to_pylist(), dtype=object)[parents]
            df = pd.DataFrame({
                "src": src, "tok": flat.to_numpy(zero_copy_only=False), "c": 1
            })
            g = df.groupby(["src", "tok"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        c = rel.grouped_aggregate(
            docs.map_batches(_tok, batch_format="pyarrow"), ["src", "tok"],
            {"c": ("sum", "c")},
        ).to_pandas()
        piv = c.pivot_table(
            index="tok", columns="src", values="c", fill_value=0, aggfunc="sum"
        )
        c0 = piv.get("src0", pd.Series(0, index=piv.index)).to_numpy(np.float64)
        c1 = piv.get("src1", pd.Series(0, index=piv.index)).to_numpy(np.float64)
        n0, n1, v = c0.sum(), c1.sum(), float(len(piv))
        p = (c0 + 0.5) / (n0 + 0.5 * v)
        q = (c1 + 0.5) / (n1 + 0.5 * v)
        m_ = (p + q) / 2.0
        js = 0.5 * float((p * np.log(p / m_)).sum()) + 0.5 * float(
            (q * np.log(q / m_)).sum()
        )
        return pd.DataFrame({
            "n0_tokens": [np.int64(n0)], "n1_tokens": [np.int64(n1)],
            "vocab": [np.int64(v)],
            "js": round_half_up(np.array([js])),
        })

    def r133_odds_ratio(sf_dir):
        # odds ratio + relative risk for the 2x2 (cohort x clicked)
        # table (the epidemiology-style effect measures that complete
        # the A/B family: r81 tests the difference, these QUANTIFY
        # it, with log-scale 95% CIs): the outcome flag is
        # "above-average clicker" (every user fires every event type
        # at every sf, so a has-clicked flag is degenerate), the 2x2
        # rides one bounded per-user combiner, and ALL ratio cells
        # take the Haldane-Anscombe +0.5 correction so zero cells
        # stay finite.
        ev = _read(sf_dir, "events", ["user_id", "event_type"])

        def _flags(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "user_id": t["user_id"].to_numpy(),
                "clicks": pc.cast(
                    pc.equal(t["event_type"], "click"), pa.int64()
                ).to_numpy(zero_copy_only=False),
            })
            g = df.groupby("user_id", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        u = rel.grouped_aggregate(
            ev.map_batches(_flags, batch_format="pyarrow"), ["user_id"],
            {"clicks": ("sum", "clicks")},
        ).to_pandas()
        ck = u["clicks"].to_numpy(np.float64)
        thr = ck.sum() / float(len(u))
        clk = (ck > thr).astype(np.int64)
        grp = (u["user_id"].to_numpy(np.int64) % 2).astype(np.int64)
        a = float(((grp == 0) & (clk == 1)).sum()) + 0.5  # exposed, event
        b = float(((grp == 0) & (clk == 0)).sum()) + 0.5
        c = float(((grp == 1) & (clk == 1)).sum()) + 0.5
        d_ = float(((grp == 1) & (clk == 0)).sum()) + 0.5
        orr = (a * d_) / (b * c)
        rr = (a / (a + b)) / (c / (c + d_))
        hw = 1.96 * math.sqrt(1 / a + 1 / b + 1 / c + 1 / d_)
        return pd.DataFrame({
            "a": [np.int64(a - 0.5)], "b": [np.int64(b - 0.5)],
            "c": [np.int64(c - 0.5)], "d": [np.int64(d_ - 0.5)],
            "odds_ratio": round_half_up(np.array([orr])),
            "rel_risk": round_half_up(np.array([rr])),
            "or_ci_lo": round_half_up(np.array([math.exp(math.log(orr) - hw)])),
            "or_ci_hi": round_half_up(np.array([math.exp(math.log(orr) + hw)])),
        })

    def e34_scd2(sf_dir):
        # slowly-changing-dimension TYPE 2 + point-in-time lookup (the
        # warehouse history pattern CDC merge deliberately discards:
        # e29 keeps latest, SCD2 keeps EVERY version with validity
        # intervals): each customer's orders become priority versions
        # valid [orderdate, next orderdate); the as-of query picks the
        # active version at a fixed date. Version intervals derive
        # inside customer-hash shards (r83's shape — sort + lead per
        # shard, one 64-key exchange); the as-of filter and rollup
        # close on the bounded versions-at-T set.
        od = _read(
            sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"]
        )
        # orders span 1995-2001 at every sf; 1998-06-01 sits mid-range
        asof = int(np.datetime64("1998-06-01T00:00:00", "us").astype(np.int64))

        def _bucket(t: pa.Table) -> pa.Table:
            u = t["o_custkey"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_b": pa.array((u * np.int64(2654435761)) % np.int64(64), pa.int64()),
                "cust": pa.array(u, pa.int64()),
                "ts": t["o_orderdate"].cast(pa.int64()),
                "okey": t["o_orderkey"],
                "pri": t["o_orderpriority"],
            })

        def _versions(t: pa.Table) -> pa.Table:
            cu = t["cust"].to_numpy(zero_copy_only=False)
            ts = t["ts"].to_numpy(zero_copy_only=False)
            ok = t["okey"].to_numpy(zero_copy_only=False)
            pri = np.asarray(t["pri"].to_pylist(), dtype=object)
            o = np.lexsort((ok, ts, cu))
            cu, ts, ok, pri = cu[o], ts[o], ok[o], pri[o]
            same = np.append(cu[1:] == cu[:-1], False)
            valid_to = np.where(same, np.append(ts[1:], 0), np.int64(2**62))
            active = (ts <= asof) & (asof < valid_to)
            df = pd.DataFrame({"pri": pri[active], "n": 1})
            g = df.groupby("pri", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        out = (
            rel.grouped_aggregate(
                od.map_batches(_bucket, batch_format="pyarrow")
                .groupby("_b").map_groups(_versions, batch_format="pyarrow"),
                ["pri"], {"n": ("sum", "n")},
            )
            .to_pandas().sort_values("pri", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "pri": out["pri"],
            "n_customers": out["n"].astype("int64"),
        })

    def r134_lorenz(sf_dir):
        # Lorenz curve deciles of order revenue across customers (the
        # curve whose area IS r86's Gini and whose concentration r125
        # indexes — per-decile cumulative revenue share makes the
        # inequality readable): per-customer revenue rides one
        # combiner; customers sort by revenue ascending (custkey
        # tiebreak, mirrored in SQL), deciles cut by customer-count
        # tenths.
        od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        c = (
            rel.grouped_aggregate(od, ["o_custkey"], {"s": ("sum", "o_totalprice")})
            .to_pandas().sort_values(["s", "o_custkey"], kind="mergesort")
            .reset_index(drop=True)
        )
        v = c["s"].to_numpy(np.float64)
        n = v.size
        tot = v.sum()
        cum = np.cumsum(v)
        rows = []
        for k in range(1, 11):
            idx = (k * n) // 10
            rows.append((k, idx, cum[idx - 1] / tot if idx > 0 else 0.0))
        return pd.DataFrame({
            "decile": pd.array([r[0] for r in rows], "int64"),
            "n_cust": pd.array([r[1] for r in rows], "int64"),
            "cum_share": round_half_up(np.array([r[2] for r in rows])),
        })

    def e35_time_travel(sf_dir):
        # snapshot TIME TRAVEL (the audit/debug read every table
        # format sells: "what did this table say last week?"):
        # publish v1 = even-keyed orders, then publish v2 = all
        # orders over the SAME table dir; immutable numbered
        # manifests keep v1 readable after v2 lands. The entry reads
        # BOTH versions and rolls each up — the oracle replays the
        # two construction rules off the view, so any cross-version
        # file leakage breaks the value check.
        import ray.data as rd

        from search_engine_ray.ops.sinks import read_snapshot, write_snapshot

        src = os.path.join(sf_dir, "orders.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        base = f"/tmp/ser_tt_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        if not os.path.exists(os.path.join(base, "_DONE")):
            import shutil

            shutil.rmtree(base, ignore_errors=True)
            os.makedirs(base, exist_ok=True)
            od = rd.read_parquet(src, columns=["o_orderkey", "o_totalprice"])
            write_snapshot(
                od.map_batches(
                    lambda t: t.filter(pa.array(t["o_orderkey"].to_numpy() % 2 == 0)),
                    batch_format="pyarrow",
                ),
                base,
            )
            write_snapshot(od, base)
            open(os.path.join(base, "_DONE"), "w").write("ok")

        rows = []
        for ver in (1, 2):
            agg = (
                rel.grouped_aggregate(
                    read_snapshot(base, version=ver).map_batches(
                        lambda t: pa.table({
                            "g": pa.array(np.zeros(t.num_rows, np.int64)),
                            "n": pa.array(np.ones(t.num_rows, np.int64)),
                            "s": t["o_totalprice"],
                        }),
                        batch_format="pyarrow",
                    ),
                    ["g"], {"n": ("sum", "n"), "s": ("sum", "s")},
                ).to_pandas()
            )
            rows.append((ver, int(agg["n"].iloc[0]), float(agg["s"].iloc[0])))
        return pd.DataFrame({
            "version": pd.array([r[0] for r in rows], "int64"),
            "n": pd.array([r[1] for r in rows], "int64"),
            "sum_price": round_half_up(np.array([r[2] for r in rows])),
        })

    def r135_growth_accounting(sf_dir):
        # growth accounting (the canonical DAU decomposition: every
        # active user each day is exactly one of new / retained /
        # resurrected, and churned(d) counts yesterday's actives who
        # left): folds on the bounded (day, user) distinct combiner
        # table — never raw events — with first-day and
        # active-yesterday flags vectorized.
        ev = _read(sf_dir, "events", ["user_id", "ts"])

        def _du(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "day": t["ts"].cast(pa.int64()).to_numpy() // 86400000000,
                "user_id": t["user_id"].to_numpy(),
            }).drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False)

        du = (
            rel.grouped_aggregate(
                ev.map_batches(_du, batch_format="pyarrow"), ["user_id", "day"],
                {"one": ("count", "day")},
            ).to_pandas()[["user_id", "day"]]
        )
        first = du.groupby("user_id")["day"].min()
        du = du.assign(fd=du["user_id"].map(first))
        active = set(map(tuple, du[["user_id", "day"]].to_numpy()))
        du["prev"] = [
            (u, dday - 1) in active for u, dday in du[["user_id", "day"]].to_numpy()
        ]
        days = np.sort(du["day"].unique())
        actives_by_day = du.groupby("day")["user_id"].count()
        rows = []
        for dday in days:
            sub = du[du["day"] == dday]
            new = int((sub["fd"] == dday).sum())
            retained = int(sub["prev"].sum())
            resurrected = int(((~sub["prev"]) & (sub["fd"] < dday)).sum())
            churned = int(actives_by_day.get(dday - 1, 0)) - retained
            rows.append((int(dday), new, retained, resurrected, churned))
        return pd.DataFrame({
            "day": pd.array([r[0] for r in rows], "int64"),
            "new": pd.array([r[1] for r in rows], "int64"),
            "retained": pd.array([r[2] for r in rows], "int64"),
            "resurrected": pd.array([r[3] for r in rows], "int64"),
            "churned": pd.array([r[4] for r in rows], "int64"),
        })

    def r136_rfm(sf_dir):
        # RFM segmentation (recency / frequency / monetary — the
        # classic customer-value grid): per-customer (last order day,
        # order count, total spend) rides one combiner; quintile
        # scores assign by NTILE(5) semantics (rank order with
        # custkey tiebreak, first n%5 buckets take the extra row —
        # mirrored exactly so bucket edges agree with the oracle),
        # and the (r_score, f_score) grid reports segment size + mean
        # spend.
        od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

        def _cust(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "cust": t["o_custkey"].to_numpy(),
                "last": t["o_orderdate"].cast(pa.int64()).to_numpy() // 86400000000,
                "f": 1,
                "m": t["o_totalprice"].to_numpy().astype(np.float64),
            })
            g = df.groupby("cust", as_index=False).agg(
                last=("last", "max"), f=("f", "sum"), m=("m", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        c = (
            rel.grouped_aggregate(
                od.map_batches(_cust, batch_format="pyarrow"), ["cust"],
                {"last": ("max", "last"), "f": ("sum", "f"), "m": ("sum", "m")},
            ).to_pandas()
        )

        def _ntile5(order_vals: np.ndarray, tiebreak: np.ndarray) -> np.ndarray:
            n = order_vals.size
            order = np.lexsort((tiebreak, order_vals))
            base, extra = divmod(n, 5)
            sizes = [base + (1 if i < extra else 0) for i in range(5)]
            scores = np.empty(n, np.int64)
            pos = 0
            for i, sz in enumerate(sizes):
                scores[order[pos:pos + sz]] = i + 1
                pos += sz
            return scores

        cust = c["cust"].to_numpy(np.int64)
        # recency: smaller (older last order) = score 1 ... most
        # recent = 5 -> ntile over last ASC gives old=1..recent=5
        r_score = _ntile5(c["last"].to_numpy(np.int64), cust)
        f_score = _ntile5(c["f"].to_numpy(np.int64), cust)
        df = pd.DataFrame({
            "r_score": r_score, "f_score": f_score,
            "n": 1, "m": c["m"].to_numpy(np.float64),
        })
        g = (
            df.groupby(["r_score", "f_score"], as_index=False)
            .agg(n=("n", "sum"), m=("m", "sum"))
            .sort_values(["r_score", "f_score"], kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "r_score": g["r_score"].astype("int64"),
            "f_score": g["f_score"].astype("int64"),
            "n_customers": g["n"].astype("int64"),
            "avg_monetary": round_half_up(g["m"].to_numpy() / g["n"].to_numpy()),
        })

    def r137_power(sf_dir):
        # A/B sample-size calculator from OBSERVED variance (the
        # pre-experiment companion to r81/r106/r127: "how many users
        # per arm to detect a 5% lift at 80% power?"): per-user value
        # sums ride one combiner; sigma^2, the 5%-of-mean delta and
        # n = 2 * (z_a + z_b)^2 * sigma^2 / delta^2 close on three
        # numbers (z_0.025 = 1.959964, z_0.2 = 0.841621).
        ev = _read(sf_dir, "events", ["user_id", "value"])
        u = (
            rel.grouped_aggregate(ev, ["user_id"], {"s": ("sum", "value")})
            .to_pandas()
        )
        y = u["s"].to_numpy(np.float64)
        n = float(y.size)
        mu = y.sum() / n
        var = float(((y - mu) ** 2).sum()) / (n - 1.0)
        delta = 0.05 * mu
        za, zb = 1.959964, 0.841621
        n_arm = 2.0 * (za + zb) ** 2 * var / (delta * delta)
        return pd.DataFrame({
            "n_users": [np.int64(n)],
            "mean": round_half_up(np.array([mu])),
            "sd": round_half_up(np.array([math.sqrt(var)])),
            "delta": round_half_up(np.array([delta])),
            "n_per_arm": [np.int64(math.ceil(round(n_arm, 6)))],
        })

    def e36_wap(sf_dir):
        # WRITE-AUDIT-PUBLISH with a quarantine sink (the dbt/Iceberg
        # WAP pattern + dead-letter queue in one flow): the staged
        # batch carries planted corruption (o_totalprice sign-flipped
        # for orderkey % 11 == 3), the audit splits rows by the
        # price > 0 contract in ONE streaming pass, clean rows
        # PUBLISH through the atomic snapshot protocol while
        # violations land in a quarantine snapshot for triage —
        # nothing is dropped silently. Output = both sides' rollups;
        # the oracle replays the corruption + contract rules off the
        # view, so a row leaking to the wrong side breaks the check.
        import ray.data as rd

        from search_engine_ray.ops.sinks import read_snapshot, write_snapshot

        src = os.path.join(sf_dir, "orders.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        base = f"/tmp/ser_wap_cache/{tag}_{int(st.st_mtime)}_{st.st_size}"
        pub, quar = os.path.join(base, "published"), os.path.join(base, "quarantine")
        if not os.path.exists(os.path.join(base, "_DONE")):
            import shutil

            shutil.rmtree(base, ignore_errors=True)
            os.makedirs(base, exist_ok=True)

            def _stage(t: pa.Table) -> pa.Table:
                k = t["o_orderkey"].to_numpy()
                p = t["o_totalprice"].to_numpy().astype(np.float64)
                return pa.table({
                    "o_orderkey": t["o_orderkey"],
                    "o_totalprice": pa.array(np.where(k % 11 == 3, -p, p)),
                })

            staged = rd.read_parquet(
                src, columns=["o_orderkey", "o_totalprice"]
            ).map_batches(_stage, batch_format="pyarrow")
            write_snapshot(
                staged.map_batches(
                    lambda t: t.filter(pc.greater(t["o_totalprice"], 0.0)),
                    batch_format="pyarrow",
                ),
                pub,
            )
            write_snapshot(
                staged.map_batches(
                    lambda t: t.filter(pc.less_equal(t["o_totalprice"], 0.0)),
                    batch_format="pyarrow",
                ),
                quar,
            )
            open(os.path.join(base, "_DONE"), "w").write("ok")

        rows = []
        for side, dirname in (("published", pub), ("quarantined", quar)):
            agg = (
                rel.grouped_aggregate(
                    read_snapshot(dirname).map_batches(
                        lambda t: pa.table({
                            "g": pa.array(np.zeros(t.num_rows, np.int64)),
                            "n": pa.array(np.ones(t.num_rows, np.int64)),
                            "s": t["o_totalprice"],
                        }),
                        batch_format="pyarrow",
                    ),
                    ["g"], {"n": ("sum", "n"), "s": ("sum", "s")},
                ).to_pandas()
            )
            rows.append((side, int(agg["n"].iloc[0]), float(agg["s"].iloc[0])))
        return pd.DataFrame({
            "side": [r[0] for r in rows],
            "n": pd.array([r[1] for r in rows], "int64"),
            "sum_price": round_half_up(np.array([r[2] for r in rows])),
        })

    def r138_peaks(sf_dir):
        # peak detection on the daily value-sum series (the alerting
        # primitive under every "traffic spiked" page): a local
        # maximum that clears mean + sd counts as a peak; neighbors
        # compare via shifted views on the bounded daily table with
        # the oracle's strict-inequality semantics (plateaus are not
        # peaks), threshold arithmetic mirrored exactly.
        daily = _daily_sums(sf_dir)
        v = daily["s"].to_numpy(np.float64)
        day = daily["day"].to_numpy(np.int64)
        n = v.size
        mu = v.sum() / n
        sd = math.sqrt(float(((v - mu) ** 2).sum()) / n)
        thr = mu + sd
        is_peak = np.zeros(n, bool)
        is_peak[1:-1] = (v[1:-1] > v[:-2]) & (v[1:-1] > v[2:]) & (v[1:-1] > thr)
        return pd.DataFrame({
            "day": pd.array(day[is_peak], "int64"),
            "s": round_half_up(v[is_peak]),
        })

    def r139_snaive_mape(sf_dir):
        # seasonal-naive forecast backtest (the baseline every
        # forecasting system must beat, and the honest way to report
        # it: walk-forward on held-out days): forecast(d) =
        # actual(d - 7); the last 14 days score MAPE and SMAPE
        # against those forecasts on the bounded daily table, lag
        # semantics identical to the oracle's lag(7).
        daily = _daily_sums(sf_dir)
        v = daily["s"].to_numpy(np.float64)
        day = daily["day"].to_numpy(np.int64)
        n = v.size
        fc = np.full(n, np.nan)
        fc[7:] = v[:-7]
        lo = day.max() - 13
        mask = (day >= lo) & ~np.isnan(fc)
        a, f = v[mask], fc[mask]
        mape = float((np.abs(a - f) / np.abs(a)).sum()) / mask.sum() * 100.0
        smape = float((np.abs(a - f) / ((np.abs(a) + np.abs(f)) / 2.0)).sum()) / mask.sum() * 100.0
        return pd.DataFrame({
            "n_scored": [np.int64(int(mask.sum()))],
            "mape": round_half_up(np.array([mape])),
            "smape": round_half_up(np.array([smape])),
        })

    def t_temp_curve(sf_dir):
        # temperature-sampling weight curve over the language mix
        # (the multilingual-sampling knob: tau < 1 upsamples tail
        # languages; this entry shows each language's effective
        # weight at tau in {0.3, 0.7, 1.0} — the table a data-mixing
        # decision actually reads): language counts ride one bounded
        # combiner; w_l = p_l^tau / sum(p^tau) closes on the tiny
        # (lang x tau) grid.
        docs = _read(sf_dir, "documents", ["lang"])
        c = (
            rel.grouped_aggregate(docs, ["lang"], {"n": ("count", "lang")})
            .to_pandas().sort_values("lang", kind="mergesort").reset_index(drop=True)
        )
        cnt = c["n"].to_numpy(np.float64)
        p = cnt / cnt.sum()
        rows = []
        for tau in (0.3, 0.7, 1.0):
            pt = np.power(p, tau)
            w = pt / pt.sum()
            for lang, pw, ww in zip(c["lang"], p, w):
                rows.append((lang, tau, pw, ww))
        return pd.DataFrame({
            "lang": [r[0] for r in rows],
            "tau": round_half_up(np.array([r[1] for r in rows])),
            "p": round_half_up(np.array([r[2] for r in rows])),
            "w": round_half_up(np.array([r[3] for r in rows])),
        })

    def r140_abc(sf_dir):
        # ABC analysis of part revenue (the 80/15/5 inventory
        # classification — "which 20% of SKUs carry 80% of revenue"):
        # per-part revenue rides one combiner; parts sort by revenue
        # DESC (partkey tiebreak, mirrored in SQL), class A = items
        # whose RUNNING share stays <= 0.80, B until 0.95, C rest;
        # per-class item counts and revenue shares fold on the
        # bounded part table.
        li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
        c = (
            rel.grouped_aggregate(li, ["l_partkey"], {"s": ("sum", "l_extendedprice")})
            .to_pandas().sort_values(["s", "l_partkey"], ascending=[False, True],
                                     kind="mergesort").reset_index(drop=True)
        )
        v = c["s"].to_numpy(np.float64)
        tot = v.sum()
        run = np.cumsum(v) / tot
        cls = np.where(run <= 0.80, "A", np.where(run <= 0.95, "B", "C"))
        df = pd.DataFrame({"cls": cls, "n": 1, "s": v})
        g = (
            df.groupby("cls", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
            .sort_values("cls", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "cls": g["cls"],
            "n_parts": g["n"].astype("int64"),
            "rev_share": round_half_up(g["s"].to_numpy() / tot),
        })

    def r141_assortativity(sf_dir):
        # degree assortativity of the co-purchase graph (Newman's
        # "do hubs link to hubs?" — positive for social graphs,
        # negative for catalog/bipartite-derived ones; it decides
        # whether hot-key salting alone fixes skew or hub-hub edges
        # concentrate load): node degrees fold from the shared edge
        # cache, and the Pearson correlation runs over every edge in
        # BOTH orientations (the symmetric form of Newman's r).
        # degrees: one distributed combiner bounded by PART
        # cardinality (nodes are the catalog side); edge rows never
        # land on the driver — the Pearson sums fold as broadcast-
        # degree partials per batch (n, Sx, Sy, Sxy, Sxx, Syy).
        edges = _cooccur_edges(sf_dir).map_batches(
            lambda t: t.filter(pc.not_equal(t["y"], -1)).select(["x", "y"]),
            batch_format="pyarrow",
        )

        def _deg_partial(t: pa.Table) -> pa.Table:
            both = np.concatenate([
                t["x"].to_numpy(zero_copy_only=False),
                t["y"].to_numpy(zero_copy_only=False),
            ])
            vals, cnts = np.unique(both, return_counts=True)
            return pa.table({
                "node": pa.array(vals.astype(np.int64), pa.int64()),
                "d": pa.array(cnts.astype(np.int64), pa.int64()),
            })

        # coarse batches + driver fold of the few dimension-bounded
        # partials — the r88 lesson: a Ray hash aggregate on ~200k
        # near-unreduced node rows costs seconds, the part-bounded
        # partial fold costs milliseconds.
        deg_pd = (
            edges.map_batches(
                _deg_partial, batch_format="pyarrow", batch_size=256 * 1024
            )
            .to_pandas().groupby("node", as_index=False)["d"].sum()
        )
        import ray as _ray

        order = np.argsort(deg_pd["node"].to_numpy(np.int64), kind="stable")
        dref = _ray.put((
            deg_pd["node"].to_numpy(np.int64)[order],
            deg_pd["d"].to_numpy(np.float64)[order],
        ))

        def _sums(t: pa.Table) -> pa.Table:
            nodes, dvals = _ray.get(dref)
            xs = t["x"].to_numpy(zero_copy_only=False)
            ys = t["y"].to_numpy(zero_copy_only=False)
            du = dvals[np.searchsorted(nodes, xs)]
            dv = dvals[np.searchsorted(nodes, ys)]
            x = np.concatenate([du, dv])
            y = np.concatenate([dv, du])
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "n": pa.array([float(x.size)], pa.float64()),
                "sx": pa.array([float(x.sum())], pa.float64()),
                "sy": pa.array([float(y.sum())], pa.float64()),
                "sxy": pa.array([float((x * y).sum())], pa.float64()),
                "sxx": pa.array([float((x * x).sum())], pa.float64()),
                "syy": pa.array([float((y * y).sum())], pa.float64()),
            })

        m = rel.grouped_aggregate(
            edges.map_batches(_sums, batch_format="pyarrow"), ["g"],
            {c: ("sum", c) for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]},
        ).to_pandas().iloc[0]
        n, sx, sy = float(m["n"]), float(m["sx"]), float(m["sy"])
        r = (n * float(m["sxy"]) - sx * sy) / math.sqrt(
            (n * float(m["sxx"]) - sx * sx) * (n * float(m["syy"]) - sy * sy)
        )
        return pd.DataFrame({
            "n_edges": [np.int64(n / 2.0)],
            "assortativity": round_half_up(np.array([r])),
        })

    def r142_clustering_coef(sf_dir):
        # global clustering coefficient C = 3T / W of the co-purchase
        # graph (the transitivity number next to pipe_triangles' raw
        # counts): T reuses the triangle pipeline (same shared edge
        # cache), W = sum over nodes of d(d-1)/2 from the undirected
        # degree fold — the FULL wedge count, not the apex-ordered
        # one the triangle close uses internally.
        # the triangle close is the one intrinsically-heavy step
        # (pipe_triangles' wedge join, excluded from the bench picks
        # for the same reason) — its scalar result caches mtime-keyed
        # beside the shared edge intermediate.
        src = os.path.join(sf_dir, "lineitem.parquet")
        st = os.stat(src)
        tag = sf_dir.strip("/").replace("/", "_")
        tpath = f"/tmp/ser_tri_cache/{tag}_{int(st.st_mtime)}_{st.st_size}.json"
        if os.path.exists(tpath):
            import json as _json

            t_cnt = float(_json.load(open(tpath))["triangles"])
        else:
            tri = pipe_triangles(sf_dir)
            t_cnt = float(tri["triangles"].iloc[0])
            os.makedirs(os.path.dirname(tpath), exist_ok=True)
            import json as _json

            tmp = tpath + ".tmp"
            _json.dump({"triangles": t_cnt}, open(tmp, "w"))
            os.rename(tmp, tpath)
        edges = _cooccur_edges(sf_dir).map_batches(
            lambda t: t.filter(pc.not_equal(t["y"], -1)).select(["x", "y"]),
            batch_format="pyarrow",
        )

        def _deg_partial(t: pa.Table) -> pa.Table:
            both = np.concatenate([
                t["x"].to_numpy(zero_copy_only=False),
                t["y"].to_numpy(zero_copy_only=False),
            ])
            vals, cnts = np.unique(both, return_counts=True)
            return pa.table({
                "node": pa.array(vals.astype(np.int64), pa.int64()),
                "d": pa.array(cnts.astype(np.int64), pa.int64()),
            })

        deg = (
            edges.map_batches(
                _deg_partial, batch_format="pyarrow", batch_size=256 * 1024
            )
            .to_pandas().groupby("node")["d"].sum().to_numpy(np.float64)
        )
        w = float((deg * (deg - 1) / 2.0).sum())
        return pd.DataFrame({
            "triangles": [np.int64(t_cnt)],
            "wedges_full": [np.int64(w)],
            "clustering_coef": round_half_up(np.array([3.0 * t_cnt / w])),
        })

    def r143_fano(sf_dir):
        # Fano factor (index of dispersion, var/mean of DAILY counts
        # including zero days) per event type — the burstiness
        # screen: ~1 is Poisson-like traffic, >1 bursty, <1
        # regular/throttled. The (type, day) count table is one
        # bounded combiner; the zero-day grid and the moment fold
        # close driver-side exactly like the oracle's cross join.
        ev = _read(sf_dir, "events", ["event_type", "ts"])

        def _cell(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "day": t["ts"].cast(pa.int64()).to_numpy() // 86400000000,
                "n": 1,
            })
            g = df.groupby(["event_type", "day"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        c = rel.grouped_aggregate(
            ev.map_batches(_cell, batch_format="pyarrow"), ["event_type", "day"],
            {"n": ("sum", "n")},
        ).to_pandas()
        days = np.arange(c["day"].min(), c["day"].max() + 1)
        rows = []
        for et, grp in c.groupby("event_type", sort=True):
            cnt = pd.Series(0.0, index=days)
            cnt.loc[grp["day"].to_numpy()] = grp["n"].to_numpy(np.float64)
            v = cnt.to_numpy()
            mu = v.sum() / v.size
            var = float(((v - mu) ** 2).sum()) / v.size
            rows.append((et, int(v.sum()), var / mu))
        return pd.DataFrame({
            "event_type": [r[0] for r in rows],
            "n_events": pd.array([r[1] for r in rows], "int64"),
            "fano": round_half_up(np.array([r[2] for r in rows])),
        })

    def r144_ess(sf_dir):
        # effective sample size of an importance-weighted corpus per
        # language (the Kish ESS = (sum w)^2 / sum(w^2) — the
        # diagnostic that says how much of a DSIR/temperature-style
        # reweighting survives as usable data): weights are the
        # document lengths (the standard size-weighting case); the
        # (lang, sum w, sum w^2, n) combiner is one bounded exchange
        # and ESS + efficiency close per language.
        docs = _read(sf_dir, "documents", ["lang", "n_chars"])

        def _partial(t: pa.Table) -> pa.Table:
            w = t["n_chars"].to_numpy().astype(np.float64)
            df = pd.DataFrame({
                "lang": t["lang"].to_numpy(zero_copy_only=False),
                "n": 1.0, "sw": w, "sw2": w * w,
            })
            g = df.groupby("lang", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = (
            rel.grouped_aggregate(
                docs.map_batches(_partial, batch_format="pyarrow"), ["lang"],
                {c: ("sum", c) for c in ["n", "sw", "sw2"]},
            )
            .to_pandas().sort_values("lang", kind="mergesort").reset_index(drop=True)
        )
        n = m["n"].to_numpy(np.float64)
        sw = m["sw"].to_numpy(np.float64)
        sw2 = m["sw2"].to_numpy(np.float64)
        ess = sw * sw / sw2
        return pd.DataFrame({
            "lang": m["lang"],
            "n_docs": n.astype(np.int64),
            "ess": round_half_up(ess),
            "efficiency": round_half_up(ess / n),
        })

    def r145_markov_power(sf_dir):
        # near-stationary distribution of the per-user event-type
        # Markov chain via FOUR matrix squarings (uniform start times
        # P^16 — the "where does the session settle" readout; exact
        # eigen-solving is not SQL-expressible, but repeated squaring
        # of the |types|^2 matrix is, so the oracle replays the same
        # sixteenth power through joins): the transition counts ride
        # r83's user-sharded derivation; the tiny matrix algebra
        # closes driver-side.
        ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

        def _bucket(t: pa.Table) -> pa.Table:
            u = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({
                "_b": pa.array((u * np.int64(2654435761)) % np.int64(64), pa.int64()),
                "u": pa.array(u, pa.int64()),
                "ts": t["ts"].cast(pa.int64()),
                "eid": t["event_id"].cast(pa.int64()),
                "et": t["event_type"],
            })

        def _pairs(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            ts = t["ts"].to_numpy(zero_copy_only=False)
            eid = t["eid"].to_numpy(zero_copy_only=False)
            et = np.asarray(t["et"].to_pylist(), dtype=object)
            o = np.lexsort((eid, ts, u))
            u, et = u[o], et[o]
            same = u[1:] == u[:-1]
            df = pd.DataFrame({
                "from_type": et[:-1][same], "to_type": et[1:][same], "cnt": 1
            })
            g = df.groupby(["from_type", "to_type"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        m = rel.grouped_aggregate(
            ev.map_batches(_bucket, batch_format="pyarrow")
            .groupby("_b").map_groups(_pairs, batch_format="pyarrow"),
            ["from_type", "to_type"], {"cnt": ("sum", "cnt")},
        ).to_pandas()
        types = sorted(set(m["from_type"]) | set(m["to_type"]))
        k = len(types)
        idx = {t_: i for i, t_ in enumerate(types)}
        p = np.zeros((k, k))
        for _, row in m.iterrows():
            p[idx[row["from_type"]], idx[row["to_type"]]] = row["cnt"]
        p = p / p.sum(axis=1, keepdims=True)
        p16 = np.linalg.matrix_power(p, 16)
        v = np.full(k, 1.0 / k) @ p16
        return pd.DataFrame({
            "event_type": types,
            "pi16": round_half_up(v),
        })

    def e37_profile(sf_dir):
        # column profile (the discovery half of data quality — what a
        # dbt-docs / profiler emits before t_expectations' contracts
        # exist): per column, null count and EXACT distinct count.
        # Nulls ride masked-count partials; distincts ride one
        # per-column distinct-value exchange (bounded by that
        # column's cardinality — the documented profiling cost; the
        # 100-TB path swaps in the md5-deterministic HLL from
        # ops.sketch for the high-cardinality columns).
        cols = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"]
        od = _read(sf_dir, "orders", cols)

        def _nulls(t: pa.Table) -> pa.Table:
            return pa.table({
                "g": pa.array([0], pa.int64()),
                **{
                    c: pa.array([int(pc.sum(pc.cast(pc.is_null(t[c]), pa.int64())).as_py() or 0)], pa.int64())
                    for c in cols
                },
            })

        nn = rel.grouped_aggregate(
            od.map_batches(_nulls, batch_format="pyarrow"), ["g"],
            {c: ("sum", c) for c in cols},
        ).to_pandas().iloc[0]

        rows = []
        for c in cols:
            def _dv(t: pa.Table, _c=c) -> pa.Table:
                vals = pc.drop_null(pc.cast(t[_c], pa.string()))
                u = np.unique(vals.to_numpy(zero_copy_only=False))
                return pa.table({"v": pa.array(u, pa.string())})

            dv = (
                rel.grouped_aggregate(
                    od.map_batches(_dv, batch_format="pyarrow"), ["v"],
                    {"one": ("count", "v")},
                ).count()
            )
            rows.append((c, int(nn[c]), int(dv)))
        return pd.DataFrame({
            "col": [r[0] for r in rows],
            "n_nulls": pd.array([r[1] for r in rows], "int64"),
            "n_distinct": pd.array([r[2] for r in rows], "int64"),
        })

    def r146_equal_freq_bins(sf_dir):
        # equal-frequency discretization of l_extendedprice into
        # quintiles (the feature-engineering binning that beats
        # equal-width on skewed money columns): edges at the
        # 20/40/60/80 percentiles (linear interpolation ==
        # quantile_cont), then one banded-count pass — bin populations
        # come out near-equal by construction, means expose the skew.
        li = _read(sf_dir, "lineitem", ["l_extendedprice"])
        daily = li.map_batches(
            lambda t: pa.table({
                "g": pa.array(np.zeros(t.num_rows, np.int64)),
                "v": t["l_extendedprice"],
            }),
            batch_format="pyarrow",
        )
        q = rel.grouped_discrete_quantiles(daily, "g", "v", [0.2, 0.4, 0.6, 0.8])
        edges = np.array([q[f"q{p}"].iloc[0] for p in (0.2, 0.4, 0.6, 0.8)], np.float64)

        def _band(t: pa.Table) -> pa.Table:
            v = t["l_extendedprice"].to_numpy().astype(np.float64)
            b = np.searchsorted(edges, v, side="right").astype(np.int64)
            df = pd.DataFrame({"bin": b, "n": 1, "s": v})
            g = df.groupby("bin", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        out = (
            rel.grouped_aggregate(
                li.map_batches(_band, batch_format="pyarrow"), ["bin"],
                {"n": ("sum", "n"), "s": ("sum", "s")},
            )
            .to_pandas().sort_values("bin", kind="mergesort").reset_index(drop=True)
        )
        return pd.DataFrame({
            "bin": out["bin"].astype("int64"),
            "n": out["n"].astype("int64"),
            "mean_price": round_half_up(out["s"].to_numpy() / out["n"].to_numpy()),
        })

    def r147_modularity(sf_dir):
        # Newman modularity of the BRAND partition over the
        # co-purchase graph ("do same-brand parts co-sell?"):
        # Q = sum_c (e_c/m - (d_c/2m)^2) with communities = p_brand.
        # The part->brand map is the broadcast small side (catalog
        # dimension); per-edge community labels resolve via
        # searchsorted inside one streaming pass emitting
        # (brand, intra-edge, endpoint-degree) partials; Q closes on
        # the bounded per-brand table.
        pt = pq.read_table(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
        )
        keys = pt["p_partkey"].to_numpy()
        order = np.argsort(keys, kind="stable")
        bmap_keys = keys[order]
        brands_sorted = np.asarray(pt["p_brand"].to_pylist(), dtype=object)[order]
        ubrands, bcodes = np.unique(brands_sorted, return_inverse=True)
        import ray as _ray

        mref = _ray.put((bmap_keys, bcodes.astype(np.int64)))

        edges = _cooccur_edges(sf_dir).map_batches(
            lambda t: t.filter(pc.not_equal(t["y"], -1)).select(["x", "y"]),
            batch_format="pyarrow",
        )

        def _partial(t: pa.Table) -> pa.Table:
            mk, mc = _ray.get(mref)
            xs = t["x"].to_numpy(zero_copy_only=False)
            ys = t["y"].to_numpy(zero_copy_only=False)
            cx = mc[np.searchsorted(mk, xs)]
            cy = mc[np.searchsorted(mk, ys)]
            nb = int(mc.max()) + 1
            intra = np.bincount(cx[cx == cy], minlength=nb)
            deg = np.bincount(cx, minlength=nb) + np.bincount(cy, minlength=nb)
            # edge count rides row b=0 only — a len/nb float split
            # truncates non-deterministically at int() (observed:
            # 115728.9999... on one batch layout)
            m_edges = np.zeros(nb, np.float64)
            m_edges[0] = float(len(xs))
            return pa.table({
                "b": pa.array(np.arange(nb, dtype=np.int64)),
                "m_edges": pa.array(m_edges, pa.float64()),
                "intra": pa.array(intra.astype(np.float64)),
                "deg": pa.array(deg.astype(np.float64)),
            })

        m = (
            rel.grouped_aggregate(
                edges.map_batches(_partial, batch_format="pyarrow"), ["b"],
                {"m_edges": ("sum", "m_edges"), "intra": ("sum", "intra"),
                 "deg": ("sum", "deg")},
            ).to_pandas().sort_values("b", kind="mergesort")
        )
        m_tot = float(m["m_edges"].sum())
        q = float(
            (m["intra"].to_numpy() / m_tot
             - (m["deg"].to_numpy() / (2.0 * m_tot)) ** 2).sum()
        )
        return pd.DataFrame({
            "n_brands": [np.int64(len(ubrands))],
            "n_edges": [np.int64(m_tot)],
            "modularity": round_half_up(np.array([q])),
        })

    def r148_laspeyres(sf_dir):
        # Laspeyres price index between the two halves of the order
        # window (the inflation readout: period-1 prices at period-0
        # quantities): per-(part, period) avg unit price and summed
        # quantity ride one combiner; the index
        # sum(p1 * q0) / sum(p0 * q0) folds over parts present in
        # BOTH periods.
        li = _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"],
        )

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "pk": t["l_partkey"],
                "day": pa.array(
                    t["l_shipdate"].cast(pa.int64()).to_numpy() // 86400000000,
                    pa.int64(),
                ),
                "q": t["l_quantity"],
                "ep": t["l_extendedprice"],
            })

        dv = li.map_batches(_day, batch_format="pyarrow")
        lo, hi = int(dv.min("day")), int(dv.max("day"))
        mid = (lo + hi) // 2

        def _per(t: pa.Table) -> pa.Table:
            d_ = t["day"].to_numpy()
            df = pd.DataFrame({
                "pk": t["pk"].to_numpy(),
                "per": np.where(d_ <= mid, 0, 1).astype(np.int64),
                "q": t["q"].to_numpy().astype(np.float64),
                "ep": t["ep"].to_numpy().astype(np.float64),
            })
            g = df.groupby(["pk", "per"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        c = rel.grouped_aggregate(
            dv.map_batches(_per, batch_format="pyarrow"), ["pk", "per"],
            {"q": ("sum", "q"), "ep": ("sum", "ep")},
        ).to_pandas()
        piv = c.pivot_table(index="pk", columns="per", values=["q", "ep"], aggfunc="sum")
        both = piv.dropna()
        q0 = both[("q", 0)].to_numpy(np.float64)
        p0 = both[("ep", 0)].to_numpy(np.float64) / q0
        p1 = both[("ep", 1)].to_numpy(np.float64) / both[("q", 1)].to_numpy(np.float64)
        idx = float((p1 * q0).sum()) / float((p0 * q0).sum())
        return pd.DataFrame({
            "n_parts": [np.int64(len(both))],
            "laspeyres": round_half_up(np.array([idx])),
        })

    def r149_ltv(sf_dir):
        # cohort LTV triangle (cumulative revenue per customer by
        # months-since-first-order — the money companion to r44's
        # retention triangle): cohort month and offset derive inside
        # customer-hash shards; the (cohort, offset) revenue/size
        # table is bounded by months^2 and the cumulative fold closes
        # on it.
        od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

        def _bucket(t: pa.Table) -> pa.Table:
            u = t["o_custkey"].to_numpy(zero_copy_only=False)
            ts = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            month = ts // (86400000000 * 30)
            return pa.table({
                "_b": pa.array((u * np.int64(2654435761)) % np.int64(64), pa.int64()),
                "cust": pa.array(u, pa.int64()),
                "month": pa.array(month, pa.int64()),
                "rev": t["o_totalprice"],
            })

        def _cohort(t: pa.Table) -> pa.Table:
            # revenue rows (off >= 0) and cohort-size rows (off = -1
            # sentinel, rev carries the shard's customer count) ride
            # the SAME exchange — summing sentinel rows across shards
            # gives exact global cohort sizes because each customer
            # lives in exactly one shard (the cooccur sentinel-channel
            # pattern).
            cu = t["cust"].to_numpy(zero_copy_only=False)
            mo = t["month"].to_numpy(zero_copy_only=False)
            rv = t["rev"].to_numpy(zero_copy_only=False).astype(np.float64)
            df = pd.DataFrame({"cust": cu, "month": mo, "rev": rv})
            first = df.groupby("cust")["month"].transform("min")
            df["cohort"] = first
            df["off"] = df["month"] - first
            g = df.groupby(["cohort", "off"], as_index=False).agg(rev=("rev", "sum"))
            sz = (
                df[["cust", "cohort"]].drop_duplicates()
                .groupby("cohort", as_index=False).agg(rev=("cust", "count"))
            )
            sz["off"] = -1
            sz["rev"] = sz["rev"].astype(np.float64)
            return pa.Table.from_pandas(
                pd.concat([g, sz[["cohort", "off", "rev"]]]), preserve_index=False
            )

        m = (
            rel.grouped_aggregate(
                od.map_batches(_bucket, batch_format="pyarrow")
                .groupby("_b").map_groups(_cohort, batch_format="pyarrow"),
                ["cohort", "off"], {"rev": ("sum", "rev")},
            )
            .to_pandas().sort_values(["cohort", "off"], kind="mergesort")
            .reset_index(drop=True)
        )
        sizes = m[m["off"] == -1].set_index("cohort")["rev"]
        m = m[m["off"] >= 0].reset_index(drop=True)
        m["cum_rev"] = m.groupby("cohort")["rev"].cumsum()
        m["n_cust"] = m["cohort"].map(sizes)
        # keep a bounded readable triangle: offsets 0..5
        m = m[m["off"] <= 5].reset_index(drop=True)
        return pd.DataFrame({
            "cohort": m["cohort"].astype("int64"),
            "off": m["off"].astype("int64"),
            "n_cust": m["n_cust"].astype("int64"),
            "cum_ltv": round_half_up(
                m["cum_rev"].to_numpy() / m["n_cust"].to_numpy(np.float64)
            ),
        })

    def r150_dup_invoices(sf_dir):
        # duplicate-transaction screen (the fraud/ops dedup: same
        # customer, same amount, within 3 days — almost always a
        # double charge): EXACT blocking on (custkey, totalprice)
        # makes candidate groups tiny (amounts are near-unique), so
        # the within-group day-window pair check is bounded work —
        # the record-linkage shape with a value-equality block
        # instead of minhash. Output: suspicious pair count and the
        # distinct orders involved.
        od = _read(
            sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
        )

        def _shard(t: pa.Table) -> pa.Table:
            cu = t["o_custkey"].to_numpy(zero_copy_only=False)
            return pa.table({
                "_b": pa.array((cu * np.int64(2654435761)) % np.int64(64), pa.int64()),
                "cust": pa.array(cu, pa.int64()),
                "price": t["o_totalprice"],
                "okey": t["o_orderkey"],
                "day": pa.array(
                    t["o_orderdate"].cast(pa.int64()).to_numpy() // 86400000000,
                    pa.int64(),
                ),
            })

        def _pairs(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "cust": t["cust"].to_numpy(zero_copy_only=False),
                "price": t["price"].to_numpy(zero_copy_only=False),
                "okey": t["okey"].to_numpy(zero_copy_only=False),
                "day": t["day"].to_numpy(zero_copy_only=False),
            })
            n_pairs = 0
            involved: set = set()
            for _, grp in df.groupby(["cust", "price"]):
                if len(grp) < 2:
                    continue
                days = grp["day"].to_numpy()
                keys = grp["okey"].to_numpy()
                for i in range(len(grp)):
                    for j in range(i + 1, len(grp)):
                        if abs(int(days[i]) - int(days[j])) <= 3 and keys[i] != keys[j]:
                            n_pairs += 1
                            involved.add(int(keys[i]))
                            involved.add(int(keys[j]))
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "n_pairs": pa.array([n_pairs], pa.int64()),
                "n_orders": pa.array([len(involved)], pa.int64()),
            })

        f = rel.grouped_aggregate(
            od.map_batches(_shard, batch_format="pyarrow")
            .groupby("_b").map_groups(_pairs, batch_format="pyarrow"),
            ["g"], {"n_pairs": ("sum", "n_pairs"), "n_orders": ("sum", "n_orders")},
        ).to_pandas()
        return pd.DataFrame({
            "n_pairs": [np.int64(f["n_pairs"].iloc[0])],
            "n_orders": [np.int64(f["n_orders"].iloc[0])],
        })

    def r151_mood(sf_dir):
        # Mood's median test between the k-parity A/B cohorts (the
        # nonparametric location test that only needs counts above
        # the pooled median — the robust sibling of r98's
        # Mann-Whitney when ranks are too expensive): the pooled
        # median interpolates on the bounded per-user value table,
        # the 2x2 above/below counts ride the same table, chi2 with
        # Yates continuity closes on four cells.
        ev = _read(sf_dir, "events", ["user_id", "value"])
        u = rel.grouped_aggregate(
            ev, ["user_id"], {"s": ("sum", "value")}
        ).to_pandas()
        y = u["s"].to_numpy(np.float64)
        med = float(np.percentile(y, 50, method="linear"))
        grp = (u["user_id"].to_numpy(np.int64) % 2).astype(np.int64)
        above = (y > med).astype(np.int64)
        a = float(((grp == 0) & (above == 1)).sum())
        b = float(((grp == 0) & (above == 0)).sum())
        c = float(((grp == 1) & (above == 1)).sum())
        d_ = float(((grp == 1) & (above == 0)).sum())
        n = a + b + c + d_
        num = n * (abs(a * d_ - b * c) - n / 2.0) ** 2
        den = (a + b) * (c + d_) * (a + c) * (b + d_)
        chi2 = num / den
        return pd.DataFrame({
            "median": round_half_up(np.array([med])),
            "a": [np.int64(a)], "b": [np.int64(b)],
            "c": [np.int64(c)], "d": [np.int64(d_)],
            "chi2": round_half_up(np.array([chi2])),
        })

    def r152_fisher_index(sf_dir):
        # the full index-number family between the window halves:
        # Laspeyres (base-weighted, r148), Paasche (current-weighted)
        # and Fisher's ideal (their geometric mean — the one national
        # accounts actually publish). Same per-(part, period)
        # combiner; three closed forms on the both-period part table.
        li = _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"],
        )

        def _day(t: pa.Table) -> pa.Table:
            return pa.table({
                "pk": t["l_partkey"],
                "day": pa.array(
                    t["l_shipdate"].cast(pa.int64()).to_numpy() // 86400000000,
                    pa.int64(),
                ),
                "q": t["l_quantity"],
                "ep": t["l_extendedprice"],
            })

        dv = li.map_batches(_day, batch_format="pyarrow")
        lo, hi = int(dv.min("day")), int(dv.max("day"))
        mid = (lo + hi) // 2

        def _per(t: pa.Table) -> pa.Table:
            d_ = t["day"].to_numpy()
            df = pd.DataFrame({
                "pk": t["pk"].to_numpy(),
                "per": np.where(d_ <= mid, 0, 1).astype(np.int64),
                "q": t["q"].to_numpy().astype(np.float64),
                "ep": t["ep"].to_numpy().astype(np.float64),
            })
            g = df.groupby(["pk", "per"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        c = rel.grouped_aggregate(
            dv.map_batches(_per, batch_format="pyarrow"), ["pk", "per"],
            {"q": ("sum", "q"), "ep": ("sum", "ep")},
        ).to_pandas()
        piv = c.pivot_table(index="pk", columns="per", values=["q", "ep"], aggfunc="sum")
        both = piv.dropna()
        q0 = both[("q", 0)].to_numpy(np.float64)
        q1 = both[("q", 1)].to_numpy(np.float64)
        p0 = both[("ep", 0)].to_numpy(np.float64) / q0
        p1 = both[("ep", 1)].to_numpy(np.float64) / q1
        lasp = float((p1 * q0).sum()) / float((p0 * q0).sum())
        paas = float((p1 * q1).sum()) / float((p0 * q1).sum())
        return pd.DataFrame({
            "n_parts": [np.int64(len(both))],
            "laspeyres": round_half_up(np.array([lasp])),
            "paasche": round_half_up(np.array([paas])),
            "fisher": round_half_up(np.array([math.sqrt(lasp * paas)])),
        })

    def r153_turning_points(sf_dir):
        # turning-point test for randomness of the daily series (a
        # local max or min at every interior point of an iid series
        # occurs with probability 2/3: T ~ N(2(n-2)/3,
        # (16n-29)/90) — the cheap randomness screen next to r90's
        # runs test): extrema count and the z-statistic fold on the
        # bounded daily table with the oracle's strict-inequality
        # semantics.
        daily = _daily_sums(sf_dir)
        v = daily["s"].to_numpy(np.float64)
        n = v.size
        interior = (
            ((v[1:-1] > v[:-2]) & (v[1:-1] > v[2:]))
            | ((v[1:-1] < v[:-2]) & (v[1:-1] < v[2:]))
        )
        t_obs = int(interior.sum())
        mu = 2.0 * (n - 2) / 3.0
        var = (16.0 * n - 29.0) / 90.0
        z = (t_obs - mu) / math.sqrt(var)
        return pd.DataFrame({
            "n_days": [np.int64(n)],
            "turning_points": [np.int64(t_obs)],
            "expected": round_half_up(np.array([mu])),
            "z": round_half_up(np.array([z])),
        })

    def r154_partial_corr(sf_dir):
        # partial correlation of daily event count and value sum
        # CONTROLLING for the day index (both series trend with the
        # calendar; the partial says whether they co-move beyond the
        # shared trend): r_xy.z = (r_xy - r_xz r_yz) /
        # sqrt((1 - r_xz^2)(1 - r_yz^2)) from three pairwise Pearson
        # folds on the bounded daily table.
        d_ = _daily_cnt_sum(sf_dir)
        x = d_["x"].to_numpy(np.float64)
        y = d_["y"].to_numpy(np.float64)
        z_ = d_["day"].to_numpy(np.float64)

        def _pearson(a: np.ndarray, b: np.ndarray) -> float:
            n = float(a.size)
            sa, sb = a.sum(), b.sum()
            return (n * float((a * b).sum()) - sa * sb) / math.sqrt(
                (n * float((a * a).sum()) - sa * sa)
                * (n * float((b * b).sum()) - sb * sb)
            )

        rxy = _pearson(x, y)
        rxz = _pearson(x, z_)
        ryz = _pearson(y, z_)
        pc_ = (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
        return pd.DataFrame({
            "n_days": [np.int64(x.size)],
            "r_xy": round_half_up(np.array([rxy])),
            "partial_r": round_half_up(np.array([pc_])),
        })

    def r155_robust_shape(sf_dir):
        # quantile-based robust shape measures of the daily series —
        # Bowley skewness (q3 + q1 - 2 q2)/(q3 - q1), the quartile
        # coefficient of dispersion (q3 - q1)/(q3 + q1), and Moors
        # octile kurtosis ((e7-e5)+(e3-e1))/(e6-e2) — the
        # outlier-immune siblings of r105's moment skew/kurtosis,
        # all from one interpolated-quantile fold (numpy percentile
        # == quantile_cont).
        daily = _daily_sums(sf_dir)
        v = daily["s"].to_numpy(np.float64)
        q1, q2, q3 = (
            float(np.percentile(v, p, method="linear")) for p in (25, 50, 75)
        )
        e = [float(np.percentile(v, p, method="linear"))
             for p in (12.5, 25, 37.5, 50, 62.5, 75, 87.5)]
        bowley = (q3 + q1 - 2 * q2) / (q3 - q1)
        qcd = (q3 - q1) / (q3 + q1)
        moors = ((e[6] - e[4]) + (e[2] - e[0])) / (e[5] - e[1])
        return pd.DataFrame({
            "n_days": [np.int64(v.size)],
            "bowley_skew": round_half_up(np.array([bowley])),
            "qcd": round_half_up(np.array([qcd])),
            "moors_kurt": round_half_up(np.array([moors])),
        })

    def r156_xmr_chart(sf_dir):
        # XmR (individuals & moving range) control chart over the
        # daily series — the SPC workhorse: limits = mean +/- 2.66 x
        # mean moving range (the d2-based sigma estimate that works
        # with n=1 subgroups, unlike the 3-sigma EWMA band r92
        # implies): the MR fold and violation counts close on the
        # bounded daily table with oracle-identical op order.
        daily = _daily_sums(sf_dir)
        v = daily["s"].to_numpy(np.float64)
        mr = np.abs(np.diff(v))
        mrbar = float(mr.sum()) / mr.size
        xbar = float(v.sum()) / v.size
        ucl = xbar + 2.66 * mrbar
        lcl = xbar - 2.66 * mrbar
        return pd.DataFrame({
            "n_days": [np.int64(v.size)],
            "xbar": round_half_up(np.array([xbar])),
            "mrbar": round_half_up(np.array([mrbar])),
            "ucl": round_half_up(np.array([ucl])),
            "lcl": round_half_up(np.array([lcl])),
            "n_violations": [np.int64(int(((v > ucl) | (v < lcl)).sum()))],
        })

    def r157_source_purity(sf_dir):
        # per-source language purity (the data-mixing audit: is each
        # crawl source monolingual or a blend?): the (source, lang)
        # count table is one bounded combiner; majority-language
        # share and Shannon entropy fold per source on that tiny
        # table — the drill-down behind t_source_divergence's
        # pairwise distance.
        docs = _read(sf_dir, "documents", ["source", "lang"])
        c = rel.grouped_aggregate(
            docs, ["source", "lang"], {"n": ("count", "lang")}
        ).to_pandas()
        rows = []
        for src, grp in c.groupby("source", sort=True):
            cnt = grp["n"].to_numpy(np.float64)
            tot = cnt.sum()
            p = cnt / tot
            ent = float(-(p * np.log(p)).sum())
            rows.append((src, int(tot), float(p.max()), ent))
        return pd.DataFrame({
            "source": [r[0] for r in rows],
            "n_docs": pd.array([r[1] for r in rows], "int64"),
            "top_share": round_half_up(np.array([r[2] for r in rows])),
            "entropy": round_half_up(np.array([r[3] for r in rows])),
        })

    d = {
        # ---- driver-check window (first 50): round-1 hash-fail fixes ----
        "e1_csv_source": e1_csv_source,
        "pipe_grouped_search": pipe_grouped_search,
        "dedup_minhash": dedup_minhash,
        "dedup_simhash": dedup_simhash,
        "ann_rp_lsh": ann_rp_lsh,
        "dedup_semantic": dedup_semantic,
        "t_cluster_sample": t_cluster_sample,
        "mm_features": mm_features,
        "mm_frames": mm_frames,
        "t_lang_id": t_lang_id,
        "t_rolling_fp": t_rolling_fp,
        # ---- never-driver-checked: Sec-2 sink/extract ring --------------
        "e2_incremental": e2_incremental,
        "e4_upsert_sink": e4_upsert_sink,
        "e5_full_refresh": e5_full_refresh,
        "e8_log_sink": e8_log_sink,
        # ---- never-driver-checked: dedup / ANN / text / pipelines -------
        "dedup_ngram": dedup_ngram,
        "dedup_components": dedup_components,
        "dedup_survivors": dedup_survivors,
        "dedup_best_quality": dedup_best_quality,
        "dedup_incremental": dedup_incremental,
        "ann_hard_negatives": ann_hard_negatives,
        "ann_pq": ann_pq,
        "ann_cosine_filtered": ann_cosine_filtered,
        "t_strip_dup_ngrams": t_strip_dup_ngrams,
        "t_dup_ngrams": t_dup_ngrams,
        "t_line_dedup": t_line_dedup,
        "t_decontaminate": t_decontaminate,
        "t_quality_clf": t_quality_clf,
        "t_bpe_tokens": t_bpe_tokens,
        "t_unigram_lp": t_unigram_lp,
        "t_repetition": t_repetition,
        "t_pii_clean": t_pii_clean,
        "t_chunk": t_chunk,
        "t_normalize": t_normalize,
        "t_pack_sequences": t_pack_sequences,
        "t_shuffle_export": t_shuffle_export,
        "t_hash_sample": t_hash_sample,
        "t_strat_sample": t_strat_sample,
        "t_top_terms": t_top_terms,
        "t_keywords": t_keywords,
        "t_collocations": t_collocations,
        "t_mix_budget": t_mix_budget,
        "pipe_hybrid": pipe_hybrid,
        "pipe_curation": pipe_curation,
        "e9_json_roundtrip": e9_json_roundtrip,
        "e10_delete_by_query": e10_delete_by_query,
        "e11_sorted_export": e11_sorted_export,
        "e12_ingest": e12_ingest,
        "e13_snapshot": e13_snapshot,
        "s22_pattern": s22_pattern,
        "sketch_quantiles_sampled": sketch_quantiles_sampled,
        "r34_histogram": r34_histogram,
        "s31_significant_terms": s31_significant_terms,
        "s32_rescore": s32_rescore,
        "s14_snippet": s14_snippet,
        "s15_crossfields": s15_crossfields,
        "s16_stats_facet": s16_stats_facet,
        "s17_suggest": s17_suggest,
        # ---- round-4 rotation candidates (never driver-checked) ---------
        "s38_percentile_ranks": s38_percentile_ranks,
        "s39_composite": s39_composite,
        "s40_top_hits": s40_top_hits,
        "s41_scroll": s41_scroll,
        "s42_termvectors": s42_termvectors,
        "s43_classic": s43_classic,
        "s44_lm_dirichlet": s44_lm_dirichlet,
        "s45_boolean": s45_boolean,
        "s46_percolate": s46_percolate,
        "s47_filters": s47_filters,
        "s48_adjacency": s48_adjacency,
        "s49_stemmed": s49_stemmed,
        "s50_dfr": s50_dfr,
        "s51_best_fields": s51_best_fields,
        "s52_rank_eval": s52_rank_eval,
        "s53_phrase_prefix": s53_phrase_prefix,
        "s54_unordered_near": s54_unordered_near,
        "s55_boosting": s55_boosting,
        "s18_mlt": s18_mlt,
        "s19_must_not": s19_must_not,
        "s20_filter_clause": s20_filter_clause,
        "s21_boost": s21_boost,
        "s23_range_facet": s23_range_facet,
        "s24_sort_by_field": s24_sort_by_field,
        "s25_range_filter": s25_range_filter,
        "s26_match_all_browse": s26_match_all_browse,
        "s27_query_string": s27_query_string,
        "s28_field_value_boost": s28_field_value_boost,
        "s29_percentiles": s29_percentiles,
        "s30_decay": s30_decay,
        "s33_cardinality": s33_cardinality,
        "s34_phrase_suggest": s34_phrase_suggest,
        "s35_fragments": s35_fragments,
        "s36_federated": s36_federated,
        "s37_dictionary": s37_dictionary,
        # ---- driver-green in r01/r02 (verified; keep out of the window) --
        "s1_bm25_term": s1_bm25_term,
        "s2_range_scan": s2_range_scan,
        "s6_const_boost": s6_const_boost,
        "r13_count": r13_count,
        "r2_json_extract": r2_json_extract,
        "pipe_listing_facets": pipe_listing_facets,
        "s3_bm25_and": s3_bm25_and,
        "s3_bm25_should": s3_bm25_should,
        "s2_prefix": s2_prefix,
        "s5_boost": s5_boost,
        "s7_normalizer": s7_normalizer,
        "s8_dispatch": s8_dispatch,
        "s9_phonetic": s9_phonetic,
        "s10_fuzzy": s10_fuzzy,
        "s11_phrase": s11_phrase,
        "s12_proximity": s12_proximity,
        "s13_synonyms": s13_synonyms,
        "r1_filter": r1_filter,
        "r2_project": r2_project,
        "r3_join": r3_join,
        "r4_two_key_join": r4_two_key_join,
        "r5_semijoin": r5_semijoin,
        "r6_map_enrich": r6_map_enrich,
        "r9_group_collect": r9_group_collect,
        "r7_group_first": r7_group_first,
        "r8_group_sum": r8_group_sum,
        "r10_explode": r10_explode,
        "r11_topk": r11_topk,
        "r12_paginate": r12_paginate,
        "r15_distinct": r15_distinct,
        "r16_facet_counts": r16_facet_counts,
        "e6_events_rollup": e6_events_rollup,
        "r19_window_agg": r19_window_agg,
        "r26_hopping_window": r26_hopping_window,
        "r27_rollup": r27_rollup,
        "r30_window_funcs": r30_window_funcs,
        "r32_cumulative": r32_cumulative,
        "r33_month_histogram": r33_month_histogram,
        "r28_pivot": r28_pivot,
        "r20_asof_join": r20_asof_join,
        "r21_range_join": r21_range_join,
        "r22_hash_join": r22_hash_join,
        "r23_group_topn": r23_group_topn,
        "r24_sessionize": r24_sessionize,
        "r25_bloom_join": r25_bloom_join,
        "sketch_kmv": sketch_kmv,
        "sketch_hll": sketch_hll,
        "r37_moving_avg": r37_moving_avg,
        "r38_extended_stats": r38_extended_stats,
        "r39_geo_radius": r39_geo_radius,
        "r40_geo_grid": r40_geo_grid,
        "r41_outer_join": r41_outer_join,
        "r42_auto_histogram": r42_auto_histogram,
        "pipe_tpch_q1": pipe_tpch_q1,
        "pipe_tpch_q3": pipe_tpch_q3,
        "pipe_tpch_q5": pipe_tpch_q5,
        "pipe_tpch_q6": pipe_tpch_q6,
        "r43_funnel": r43_funnel,
        "r44_retention": r44_retention,
        "r45_grouped_hll": r45_grouped_hll,
        "e15_force_merge": e15_force_merge,
        "e16_cdc_replay": e16_cdc_replay,
        "e17_index_stats": e17_index_stats,
        "r46_weighted_avg": r46_weighted_avg,
        "sketch_cm": sketch_cm,
        "sketch_quantiles": sketch_quantiles,
        "r29_grouped_quantiles": r29_grouped_quantiles,
        "r31_matrix_stats": r31_matrix_stats,
        "e7_tags": e7_tags,
        "t_token_stats": t_token_stats,
        "t_quality": t_quality,
        "dedup_exact": dedup_exact,
        "ann_cosine": ann_cosine,
        "ann_ivf": ann_ivf,
        "ann_ivf_batch": ann_ivf_batch,
        "pipe_listing": pipe_listing,
        # ---- round-3 second wave (driver-window candidates for r04) ----
        "t_dsir": t_dsir,
        "t_bigram_lm": t_bigram_lm,
        "ann_ivfpq": ann_ivfpq,
        "s56_collapse": s56_collapse,
        "s57_pinned": s57_pinned,
        "pipe_corpus_report": pipe_corpus_report,
        "r35_pagerank": r35_pagerank,
        "s58_rank_feature": s58_rank_feature,
        "s59_span_first": s59_span_first,
        "s67_span_or": s67_span_or,
        "s68_span_not": s68_span_not,
        "s69_span_containing": s69_span_containing,
        "s70_span_within": s70_span_within,
        # ---- round-3 third wave (driver-window candidates for r04) -----
        "t_gopher_rules": t_gopher_rules,
        "t_reservoir_sample": t_reservoir_sample,
        "ann_range": ann_range,
        "s60_terms_set": s60_terms_set,
        "s61_rare_terms": s61_rare_terms,
        "s62_multi_terms": s62_multi_terms,
        "s63_diversified_sampler": s63_diversified_sampler,
        "s64_match_bool_prefix": s64_match_bool_prefix,
        "s66_distance_feature": s66_distance_feature,
        "r36_derivative": r36_derivative,
        "e14_compaction": e14_compaction,
        # ---- round-3 fourth wave (driver-window candidates for r04) ----
        "r47_string_stats": r47_string_stats,
        "r48_top_metrics": r48_top_metrics,
        "r49_boxplot": r49_boxplot,
        "r50_mad": r50_mad,
        "r51_t_test": r51_t_test,
        "r52_bucket_selector": r52_bucket_selector,
        "r53_serial_diff": r53_serial_diff,
        "r54_cumulative_cardinality": r54_cumulative_cardinality,
        "r55_cube": r55_cube,
        "r56_set_ops": r56_set_ops,
        "r57_anti_join": r57_anti_join,
        "r58_window_ranks": r58_window_ranks,
        "t_soft_dedup": t_soft_dedup,
        "s74_random_score": s74_random_score,
        "pipe_tpch_q4": pipe_tpch_q4,
        "pipe_tpch_q10": pipe_tpch_q10,
        "pipe_tpch_q14": pipe_tpch_q14,
        "s75_combined_fields": s75_combined_fields,
        "t_ccnet_buckets": t_ccnet_buckets,
        "r59_geo_bounds": r59_geo_bounds,
        "r60_rate": r60_rate,
        "r61_bucket_script": r61_bucket_script,
        "r62_stats_bucket": r62_stats_bucket,
        "e18_schema_merge": e18_schema_merge,
        "s76_ids": s76_ids,
        "s77_most_fields": s77_most_fields,
        "s78_intervals": s78_intervals,
        "s79_intervals_any": s79_intervals_any,
        "s80_span_multi": s80_span_multi,
        "t_temperature_mix": t_temperature_mix,
        "r63_unpivot": r63_unpivot,
        "s81_sig_chi2": s81_sig_chi2,
        "r64_rolling_window": r64_rolling_window,
        "e19_reindex_alias": e19_reindex_alias,
        "r65_terms_by_subagg": r65_terms_by_subagg,
        "r66_join_auto": r66_join_auto,
        "t_embed_outliers": t_embed_outliers,
        "ann_maxsim": ann_maxsim,
        "t_dsir_sample": t_dsir_sample,
        "s85_search_as_you_type": s85_search_as_you_type,
        "pipe_fineweb": pipe_fineweb,
        "t_bpe_train": t_bpe_train,
        "s86_has_child": s86_has_child,
        "s87_has_parent": s87_has_parent,
        "s88_msearch": s88_msearch,
        "r70_winsorize": r70_winsorize,
        "sketch_kmv_intersect": sketch_kmv_intersect,
        "sketch_kmv_union": sketch_kmv_union,
        "ann_sq8": ann_sq8,
        "t_expectations": t_expectations,
        "r71_late_events": r71_late_events,
        "pipe_triangles": pipe_triangles,
        "t_bootstrap_means": t_bootstrap_means,
        "r72_basket_rules": r72_basket_rules,
        "r73_benford": r73_benford,
        "r68_geohash_grid": r68_geohash_grid,
        "r69_scripted_metric": r69_scripted_metric,
        "s82_dis_max": s82_dis_max,
        "s83_script_score": s83_script_score,
        "s84_more_like_this": s84_more_like_this,
        "r67_geotile_grid": r67_geotile_grid,
        "pipe_tpch_q2": pipe_tpch_q2,
        "pipe_tpch_q7": pipe_tpch_q7,
        "pipe_tpch_q8": pipe_tpch_q8,
        "pipe_tpch_q9": pipe_tpch_q9,
        "pipe_tpch_q12": pipe_tpch_q12,
        "pipe_tpch_q11": pipe_tpch_q11,
        "pipe_tpch_q13": pipe_tpch_q13,
        "pipe_tpch_q15": pipe_tpch_q15,
        "pipe_tpch_q16": pipe_tpch_q16,
        "pipe_tpch_q17": pipe_tpch_q17,
        "pipe_tpch_q18": pipe_tpch_q18,
        "pipe_tpch_q19": pipe_tpch_q19,
        "pipe_tpch_q20": pipe_tpch_q20,
        "pipe_tpch_q21": pipe_tpch_q21,
        "pipe_tpch_q22": pipe_tpch_q22,
        # round-4 statistics / aggregation wave
        "r74_grouped_ols": r74_grouped_ols,
        "r75_matrix_stats": r75_matrix_stats,
        "r76_anova": r76_anova,
        "r77_percentiles_bucket": r77_percentiles_bucket,
        "r78_entropy": r78_entropy,
        "s89_terms_enum": s89_terms_enum,
        "r79_ks_test": r79_ks_test,
        "dedup_containment": dedup_containment,
        "r80_change_point": r80_change_point,
        "t_zipf": t_zipf,
        "r81_two_proportions": r81_two_proportions,
        "t_novelty": t_novelty,
        "r82_autocorr": r82_autocorr,
        "e20_orc_source": e20_orc_source,
        "t_fertility": t_fertility,
        "r83_transitions": r83_transitions,
        "r84_conversion_lag": r84_conversion_lag,
        "t_langid_eval": t_langid_eval,
        "r85_normalize": r85_normalize,
        "r86_gini": r86_gini,
        "t_char_entropy": t_char_entropy,
        "r87_seasonal_anomaly": r87_seasonal_anomaly,
        "t_cluster_sizes": t_cluster_sizes,
        "s90_explain": s90_explain,
        "r88_degree_dist": r88_degree_dist,
        "e21_hive_pruning": e21_hive_pruning,
        "r89_mann_kendall": r89_mann_kendall,
        "r90_runs_test": r90_runs_test,
        "r91_crosstab_chi2": r91_crosstab_chi2,
        "t_ngram_coverage": t_ngram_coverage,
        "r92_ewma": r92_ewma,
        # round-5 wave 1
        "r93_date_range": r93_date_range,
        "r94_first_last": r94_first_last,
        "r95_spearman": r95_spearman,
        "r96_kruskal": r96_kruskal,
        "t_url_filter": t_url_filter,
        "t_unimax_sample": t_unimax_sample,
        # round-5 wave 2
        "r97_theil_sen": r97_theil_sen,
        "r98_mann_whitney": r98_mann_whitney,
        "e22_gzip_csv": e22_gzip_csv,
        # round-5 wave 3
        "r99_holt": r99_holt,
        "r100_levene": r100_levene,
        "t_topic_census": t_topic_census,
        # round-5 wave 4
        "r101_seasonal_decompose": r101_seasonal_decompose,
        "e23_retention_sink": e23_retention_sink,
        # round-5 wave 5
        "r102_bucket_correlation": r102_bucket_correlation,
        "s92_terms_include": s92_terms_include,
        "mm_audio_energy": mm_audio_energy,
        "r103_srm_check": r103_srm_check,
        "e24_psv_dialect": e24_psv_dialect,
        "r104_cramers_v": r104_cramers_v,
        # round-5 wave 11
        "r105_jarque_bera": r105_jarque_bera,
        "r106_cohens_d": r106_cohens_d,
        "r107_tukey_users": r107_tukey_users,
        "t_readability": t_readability,
        # round-5 wave 12
        "r108_kendall_tau": r108_kendall_tau,
        "r109_cross_corr": r109_cross_corr,
        "r110_durbin_watson": r110_durbin_watson,
        # round-5 wave 13
        "r111_bfs_levels": r111_bfs_levels,
        "t_spell_pairs": t_spell_pairs,
        "e25_schema_evolution": e25_schema_evolution,
        # round-5 wave 14
        "r112_pacf": r112_pacf,
        "r113_grubbs": r113_grubbs,
        "r114_mad_outliers": r114_mad_outliers,
        "r115_rescaled_range": r115_rescaled_range,
        # round-5 wave 15
        "e26_manifest_snapshot": e26_manifest_snapshot,
        "r116_rate_ratio": r116_rate_ratio,
        "t_vocab_growth": t_vocab_growth,
        # round-5 wave 16
        "sketch_heavy_hitters": sketch_heavy_hitters,
        "e27_delta_rollup": e27_delta_rollup,
        "e28_zorder_layout": e28_zorder_layout,
        # round-5 wave 17
        "r117_selfjoin_size": r117_selfjoin_size,
        "ann_label_cohesion": ann_label_cohesion,
        "e29_cdc_merge": e29_cdc_merge,
        # round-5 wave 18
        "e30_compaction": e30_compaction,
        "r118_gap_fill": r118_gap_fill,
        "e31_footer_stats": e31_footer_stats,
        # round-5 wave 19
        "r119_std_residuals": r119_std_residuals,
        "r120_mcnemar": r120_mcnemar,
        "r121_stickiness": r121_stickiness,
        # round-5 wave 20
        "e32_bucketed_join": e32_bucketed_join,
        "r122_psi_drift": r122_psi_drift,
        "r123_cond_entropy": r123_cond_entropy,
        # round-5 wave 21
        "r124_streaks": r124_streaks,
        "t_split_leakage": t_split_leakage,
        "r125_hhi": r125_hhi,
        # round-5 wave 22
        "r126_kaplan_meier": r126_kaplan_meier,
        "r127_cuped": r127_cuped,
        "r128_hill_tail": r128_hill_tail,
        # round-5 wave 23
        "r129_skyline": r129_skyline,
        "r130_embed_cov": r130_embed_cov,
        "r131_benford2": r131_benford2,
        # round-5 wave 24
        "e33_deletion_vectors": e33_deletion_vectors,
        "r132_hist2d": r132_hist2d,
        "t_source_divergence": t_source_divergence,
        # round-5 wave 25
        "r133_odds_ratio": r133_odds_ratio,
        "e34_scd2": e34_scd2,
        "r134_lorenz": r134_lorenz,
        # round-5 wave 26
        "e35_time_travel": e35_time_travel,
        "r135_growth_accounting": r135_growth_accounting,
        # round-5 wave 27
        "r136_rfm": r136_rfm,
        "r137_power": r137_power,
        # round-5 wave 28
        "e36_wap": e36_wap,
        "r138_peaks": r138_peaks,
        # round-5 wave 29
        "r139_snaive_mape": r139_snaive_mape,
        "t_temp_curve": t_temp_curve,
        "r140_abc": r140_abc,
        # round-5 wave 30
        "r141_assortativity": r141_assortativity,
        "r142_clustering_coef": r142_clustering_coef,
        "r143_fano": r143_fano,
        # round-5 wave 31
        "r144_ess": r144_ess,
        "r145_markov_power": r145_markov_power,
        # round-5 wave 32
        "e37_profile": e37_profile,
        "r146_equal_freq_bins": r146_equal_freq_bins,
        # round-5 wave 33
        "r147_modularity": r147_modularity,
        "r148_laspeyres": r148_laspeyres,
        "r149_ltv": r149_ltv,
        # round-5 wave 34
        "r150_dup_invoices": r150_dup_invoices,
        "r151_mood": r151_mood,
        "r152_fisher_index": r152_fisher_index,
        # round-5 wave 35
        "r153_turning_points": r153_turning_points,
        "r154_partial_corr": r154_partial_corr,
        "r155_robust_shape": r155_robust_shape,
        # round-5 wave 36
        "r156_xmr_chart": r156_xmr_chart,
        "r157_source_purity": r157_source_purity,
    }
    # ---- round-5 window rotation (VERDICT r04 ask #1): the driver's
    # correctness gate checks the FIRST 50 keys in insertion order;
    # front-load 50 never-driver-checked entries from the backlog
    # (361 entries total now — 300 at rotation time, 158 checked
    # cumulatively r01-r04; the 61 round-5 additions are covered by
    # the per-wave sf0.001+sf0.01 oracle tests and sf0.1 smokes, and
    # are queued newest-first in COVERAGE.md's round-6 rotation
    # backlog): the 31 round-4 additions newest-first, the two
    # entries rewritten this round to drop their driver-side corpus
    # reads (s52_rank_eval, s55_boosting — VERDICT r04 ask #2), the
    # oldest never-checked r34-r46 band, and the VERDICT-named
    # stragglers (r35_pagerank, t_soft_dedup, t_dsir, sketch_hll,
    # sketch_quantiles_sampled). Cumulative coverage after this
    # window: 208/300. Remaining entries keep their original order.
    _r5_window = [
        "r92_ewma", "t_ngram_coverage", "r91_crosstab_chi2",
        "r90_runs_test", "r89_mann_kendall", "e21_hive_pruning",
        "r88_degree_dist", "s90_explain", "t_cluster_sizes",
        "r87_seasonal_anomaly", "t_char_entropy", "r86_gini",
        "r85_normalize", "t_langid_eval", "r84_conversion_lag",
        "r83_transitions", "t_fertility", "e20_orc_source",
        "r82_autocorr", "t_novelty", "r81_two_proportions", "t_zipf",
        "r80_change_point", "dedup_containment", "r79_ks_test",
        "s89_terms_enum", "r78_entropy", "r77_percentiles_bucket",
        "r76_anova", "r75_matrix_stats", "r74_grouped_ols",
        "s52_rank_eval", "s55_boosting",
        "r34_histogram", "r35_pagerank", "r36_derivative",
        "r37_moving_avg", "r38_extended_stats", "r39_geo_radius",
        "r40_geo_grid", "r41_outer_join", "r42_auto_histogram",
        "r43_funnel", "r44_retention", "r45_grouped_hll",
        "r46_weighted_avg", "t_soft_dedup", "t_dsir", "sketch_hll",
        "sketch_quantiles_sampled",
    ]
    return {k: d[k] for k in _r5_window} | {
        k: v for k, v in d.items() if k not in _r5_window
    }


def oracle_sql() -> dict[str, str]:
    toks = _TOKS.format(col="text")

    # t_gopher_rules: every Gopher rule recomputed from scratch in SQL
    # (words = regexp_extract_all('\S+'), lines = split on chr(10));
    # int sums are exact, float divisions use the engine's op order
    _stop_hits = " + ".join(
        f"(CASE WHEN list_contains(lws, '{s}') THEN 1 ELSE 0 END)"
        for s in ("the", "be", "to", "of", "and", "that", "have", "with")
    )
    _gopher_sql = rf"""
WITH w AS (
  SELECT doc_id, coalesce(text, '') AS tx,
         regexp_extract_all(coalesce(text, ''), '\S+') AS ws,
         str_split(coalesce(text, ''), chr(10)) AS ls
  FROM documents),
m AS (
  SELECT doc_id,
    len(ws) AS n_words,
    CASE WHEN len(ws) > 0
      THEN CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE) / len(ws)
      ELSE 0 END AS mean_word_len,
    CASE WHEN len(ws) > 0
      THEN CAST(len(regexp_extract_all(tx, '#')) + len(regexp_extract_all(tx, '\.\.\.')) AS DOUBLE) / len(ws)
      ELSE 0 END AS symbol_word_ratio,
    CASE WHEN len(ls) > 0
      THEN CAST(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE) / len(ls)
      ELSE 0 END AS bullet_line_frac,
    CASE WHEN len(ls) > 0
      THEN CAST(len(list_filter(ls, l -> regexp_matches(l, '\.\.\.\s*$'))) AS DOUBLE) / len(ls)
      ELSE 0 END AS ellipsis_line_frac,
    CASE WHEN len(ws) > 0
      THEN CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(ws)
      ELSE 0 END AS alpha_word_frac,
    ({_stop_hits}) AS n_stop_hits
  FROM (SELECT doc_id, tx, ws, ls, list_transform(ws, x -> lower(x)) AS lws FROM w))
SELECT doc_id, n_words,
  round(mean_word_len, 4) AS mean_word_len,
  round(symbol_word_ratio, 4) AS symbol_word_ratio,
  round(bullet_line_frac, 4) AS bullet_line_frac,
  round(ellipsis_line_frac, 4) AS ellipsis_line_frac,
  round(alpha_word_frac, 4) AS alpha_word_frac,
  n_stop_hits,
  (n_words >= 50 AND n_words <= 100000
   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
   AND symbol_word_ratio <= 0.1 AND bullet_line_frac <= 0.9
   AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
   AND n_stop_hits >= 2) AS gopher_pass
FROM m
"""

    # s60_terms_set: 4 should terms, per-doc required count
    # least(3, 1 + n_chars // 300) — the minimum_should_match_field
    # (+ _script) replay; score = sum of the MATCHING terms' BM25
    _ts_terms = ["hash", "join", "vector", "index"]
    _ts_tf = ", ".join(
        f"len(list_filter(ts, t -> t = '{t}')) AS tf{i}" for i, t in enumerate(_ts_terms)
    )
    _ts_df = ", ".join(
        f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}" for i in range(len(_ts_terms))
    )
    _ts_score = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        f"ln(1 + (s.n - s.df{i} + 0.5) / (s.df{i} + 0.5)) * tf{i} * 2.2 / "
        f"(tf{i} + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END)"
        for i in range(len(_ts_terms))
    )
    _ts_nmatch = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(_ts_terms))
    )
    _terms_set_sql = f"""
WITH tok AS (SELECT doc_id, n_chars, {toks} AS ts FROM documents),
d AS (SELECT doc_id, n_chars, len(ts) AS dl, {_ts_tf} FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len, {_ts_df} FROM d)
SELECT d.doc_id, round({_ts_score}, 4) AS score
FROM d, s
WHERE ({_ts_nmatch}) >= least(3, 1 + d.n_chars // 300)
ORDER BY ({_ts_score}) DESC, d.doc_id LIMIT 10
"""
    from search_engine_ray.ops.text import BPE_PATTERN, WS_PATTERN

    # both patterns are RE2 on both sides (Arrow count_substring_regex
    # / DuckDB regexp_extract_all), so the counts agree bit-for-bit;
    # only SQL-quote escaping differs
    _bpe = BPE_PATTERN.replace("'", "''")
    _bpe_tokens_sql = (
        "SELECT doc_id, "
        f"len(regexp_extract_all(coalesce(text, ''), '{WS_PATTERN}')) AS n_ws_tokens, "
        f"len(regexp_extract_all(coalesce(text, ''), '{_bpe}')) AS n_bpe_tokens "
        "FROM documents"
    )
    from search_engine_ray.ops.text import EMAIL_PATTERN, IPV4_PATTERN, URL_PATTERN

    _pii_clean_sql = f"""
WITH planted AS (
  SELECT doc_id, coalesce(text, '') || CASE WHEN doc_id % 7 = 0
    THEN ' contact bob@example.com via https://ex.com/a?b=1 at 10.0.0.1'
    ELSE '' END AS text
  FROM documents)
SELECT doc_id,
  len(regexp_extract_all(text, '{EMAIL_PATTERN}')) AS n_emails,
  len(regexp_extract_all(text, '{URL_PATTERN}')) AS n_urls,
  len(regexp_extract_all(text, '{IPV4_PATTERN}')) AS n_ips,
  trim(regexp_replace(regexp_replace(regexp_replace(text,
    '{URL_PATTERN}', '<URL>', 'g'), '{EMAIL_PATTERN}', '<EMAIL>', 'g'),
    '\\s+', ' ', 'g')) AS clean
FROM planted
"""
    grouped_search_sql = f"""
WITH tok AS (SELECT doc_id, source, n_chars, {toks} AS ts FROM documents),
d AS (SELECT doc_id, source, n_chars, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d),
scored AS (
  SELECT d.doc_id, d.source, d.n_chars,
         ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 /
         (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) AS raw_score
  FROM d, s WHERE tf0 > 0),
best AS (
  SELECT doc_id, source, raw_score FROM scored
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY raw_score DESC, doc_id) = 1),
agg AS (
  -- CAST: DuckDB sum(BIGINT) is HUGEINT and hash-mismatches int64
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS stock_sum,
         count(*) AS variant_count
  FROM scored GROUP BY source)
SELECT b.source, b.doc_id, round(b.raw_score, 4) AS score, a.stock_sum, a.variant_count
FROM best b JOIN agg a USING (source)
ORDER BY b.raw_score DESC, b.doc_id LIMIT 10
"""
    sx = _soundex_sql("t")
    toks_plain = _TOKS.format(col="text")
    s9_sql = f"""
WITH tok AS (SELECT doc_id, {toks_plain} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
             len(list_filter(ts, t -> ({sx}) = 'V236')) AS tf0 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d)
SELECT d.doc_id, round(
  ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 /
  (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))), 4) AS score
FROM d, s WHERE tf0 > 0
ORDER BY (ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 /
  (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))) DESC, d.doc_id
LIMIT 10
"""
    s8_sql = (
        f"SELECT 'one_term' AS branch, t1.* FROM ({_bm25_sql(['src1'], col='source', prefix=True)}) t1 "
        f"UNION ALL SELECT 'multi_term' AS branch, t2.* FROM ({_bm25_sql(['hash', 'join'], mode='must')}) t2"
    )

    # t_pack_sequences: the greedy token-budget packing walk replayed
    # in SQL — shard = md5_number_upper(doc_id) % 8 (bit-identical to
    # ops/sketch._md5_upper64), then a RECURSIVE CTE advances one pack
    # boundary per step: next start = first rn whose shard-cumulative
    # exceeds the pack window (min 1 doc — an oversize doc packs
    # alone), exactly the engine's searchsorted boundary scan.
    _pk_next = (
        "(SELECT min(rn) FROM o WHERE o.shard = p.shard AND o.cum > "
        "coalesce((SELECT cum FROM o o2 WHERE o2.shard = p.shard "
        "AND o2.rn = p.start_rn - 1), 0) + 200)"
    )
    _pack_sql = f"""
WITH RECURSIVE stats AS (
  SELECT doc_id, len({toks}) AS n_tokens,
    CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 8 AS BIGINT) AS shard
  FROM documents),
o AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn,
       sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum FROM stats),
mx AS (SELECT shard, max(rn) AS mr FROM o GROUP BY 1),
pk AS (
  SELECT shard, CAST(0 AS BIGINT) AS pack, CAST(1 AS BIGINT) AS start_rn FROM mx
  UNION ALL
  SELECT p.shard, p.pack + 1, greatest({_pk_next}, p.start_rn + 1)
  FROM pk p JOIN mx m ON m.shard = p.shard
  WHERE {_pk_next} IS NOT NULL
    AND greatest({_pk_next}, p.start_rn + 1) <= m.mr
),
sel AS (SELECT o.doc_id, o.n_tokens, o.shard, o.rn,
        (SELECT max(start_rn) FROM pk WHERE pk.shard = o.shard AND pk.start_rn <= o.rn) AS srn
        FROM o)
SELECT sel.doc_id, sel.n_tokens,
       (sel.shard << 32) + pk.pack AS pack_id,
       sel.rn - sel.srn AS pack_seq
FROM sel JOIN pk ON pk.shard = sel.shard AND pk.start_rn = sel.srn
ORDER BY sel.doc_id
"""

    # S19/S20: clause roles — the negative/filter clause never scores;
    # df0 stays the GLOBAL df (the engine reads df from the dictionary,
    # not from the surviving match set)
    _bm25_expr0 = (
        "ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 / "
        "(tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))"
    )
    s19_sql = f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0,
             len(list_filter(ts, t -> t = 'slow')) AS tfn FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d)
SELECT d.doc_id, round({_bm25_expr0}, 4) AS score
FROM d, s WHERE tf0 > 0 AND tfn = 0
ORDER BY ({_bm25_expr0}) DESC, d.doc_id LIMIT 10
"""
    s20_sql = f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0,
             len(list_filter(ts, t -> t = 'join')) AS tff FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d)
SELECT d.doc_id, round({_bm25_expr0}, 4) AS score
FROM d, s WHERE tf0 > 0 AND tff > 0
ORDER BY ({_bm25_expr0}) DESC, d.doc_id LIMIT 10
"""
    # S21 per-clause boost: the boosted clause's idf is scaled (the
    # engine folds boost into the resolved idf)
    _s21_expr = (
        "(2.0 * ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5))) * tf0 * 2.2 / "
        "(tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) + "
        "ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5)) * tf1 * 2.2 / "
        "(tf1 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))"
    )
    s21_sql = f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0,
             len(list_filter(ts, t -> t = 'join')) AS tf1 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0,
             count(*) FILTER (WHERE tf1 > 0) AS df1 FROM d)
SELECT d.doc_id, round({_s21_expr}, 4) AS score
FROM d, s WHERE tf0 > 0 AND tf1 > 0
ORDER BY ({_s21_expr}) DESC, d.doc_id LIMIT 10
"""

    # S23 range-facet aggregation: banded counts over the matched set;
    # band labels match the engine's "[lo,hi)" %g formatting
    s23_sql = f"""
WITH tok AS (SELECT doc_id, n_chars, {toks} AS ts FROM documents),
m AS (SELECT n_chars FROM tok WHERE len(list_filter(ts, t -> t = 'vector')) > 0),
b AS (SELECT CASE WHEN n_chars >= 0 AND n_chars < 150 THEN '[0,150)'
                  WHEN n_chars >= 150 AND n_chars < 300 THEN '[150,300)'
                  WHEN n_chars >= 300 AND n_chars < 5000 THEN '[300,5000)'
             END AS band FROM m)
SELECT band, count(*) AS cnt FROM b WHERE band IS NOT NULL
GROUP BY 1 ORDER BY 1
"""
    # S24 sort by stored field: page ordered by n_chars desc (doc_id
    # tiebreak); the BM25 score column is still reported
    s24_sql = f"""
WITH tok AS (SELECT doc_id, n_chars, {toks} AS ts FROM documents),
d AS (SELECT doc_id, n_chars, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d)
SELECT d.doc_id, round({_bm25_expr0}, 4) AS score,
       CAST(d.n_chars AS DOUBLE) AS sort_key
FROM d, s WHERE tf0 > 0
ORDER BY d.n_chars DESC, d.doc_id LIMIT 10
"""

    # S25 range operator in compound.filter: required non-scoring
    # numeric predicate; df0 stays global (dictionary df)
    s25_sql = f"""
WITH tok AS (SELECT doc_id, n_chars, {toks} AS ts FROM documents),
d AS (SELECT doc_id, n_chars, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d)
SELECT d.doc_id, round({_bm25_expr0}, 4) AS score
FROM d, s WHERE tf0 > 0 AND d.n_chars BETWEEN 150 AND 300
ORDER BY ({_bm25_expr0}) DESC, d.doc_id LIMIT 10
"""
    # S26 match_all browse: exact filtered total + attribute-sorted page
    s26_sql = """
WITH m AS (SELECT doc_id, n_chars FROM documents WHERE lang = 'en')
SELECT (SELECT count(*) FROM m) AS total, doc_id,
       CAST(n_chars AS DOUBLE) AS sort_key
FROM m ORDER BY n_chars DESC, doc_id LIMIT 10
"""

    # S27 query_string: "vector AND join^2 -slow n_chars:[150 TO 300]"
    # — boosted clause idf scaled 2x, negation excluded, range required
    _s27_expr = (
        "ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 / "
        "(tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) + "
        "(2.0 * ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5))) * tf1 * 2.2 / "
        "(tf1 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))"
    )
    s27_sql = f"""
WITH tok AS (SELECT doc_id, n_chars, {toks} AS ts FROM documents),
d AS (SELECT doc_id, n_chars, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0,
             len(list_filter(ts, t -> t = 'join')) AS tf1,
             len(list_filter(ts, t -> t = 'slow')) AS tfn FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0,
             count(*) FILTER (WHERE tf1 > 0) AS df1 FROM d)
SELECT d.doc_id, round({_s27_expr}, 4) AS score
FROM d, s
WHERE tf0 > 0 AND tf1 > 0 AND tfn = 0 AND d.n_chars BETWEEN 150 AND 300
ORDER BY ({_s27_expr}) DESC, d.doc_id LIMIT 10
"""

    # S28 function_score field_value_factor: score multiplied by
    # log1p(0.01 * n_chars) after BM25
    _s28_expr = f"({_bm25_expr0}) * ln(1 + 0.01 * d.n_chars)"
    s28_sql = f"""
WITH tok AS (SELECT doc_id, n_chars, {toks} AS ts FROM documents),
d AS (SELECT doc_id, n_chars, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d)
SELECT d.doc_id, round({_s28_expr}, 4) AS score
FROM d, s WHERE tf0 > 0
ORDER BY ({_s28_expr}) DESC, d.doc_id LIMIT 10
"""

    # S30 function_score decay: gauss and linear multipliers of the
    # |n_chars-200| distance (offset 25, scale 150, decay 0.5)
    _s30_d = "greatest(0, abs(d.n_chars - 200) - 25)"
    _s30_gauss = f"({_bm25_expr0}) * exp(-pow({_s30_d}, 2) / (2 * (-(150.0*150.0) / (2 * ln(0.5)))))"
    _s30_linear = f"({_bm25_expr0}) * greatest(0, ((150.0 / 0.5) - {_s30_d}) / (150.0 / 0.5))"

    def _s30_branch(expr: str, tag: str) -> str:
        return f"""
SELECT '{tag}' AS branch, doc_id, score FROM (
  WITH tok AS (SELECT doc_id, n_chars, {toks} AS ts FROM documents),
  d AS (SELECT doc_id, n_chars, len(ts) AS dl,
               len(list_filter(ts, t -> t = 'vector')) AS tf0 FROM tok),
  s AS (SELECT count(*) AS n, sum(dl) AS total_len,
               count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d)
  SELECT d.doc_id, round({expr}, 4) AS score
  FROM d, s WHERE tf0 > 0
  ORDER BY ({expr}) DESC, d.doc_id LIMIT 10
)"""

    s30_sql = (
        _s30_branch(_s30_gauss, "gauss") + " UNION ALL " + _s30_branch(_s30_linear, "linear")
    )

    # S32 rescore window: combined = 1.0*BM25('vector') over the
    # top-50 window + 2.0*BM25('join') for window docs matching it
    _s32_bm25_1 = (
        "ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5)) * tf1 * 2.2 / "
        "(tf1 + 1.2 * (1 - 0.75 + 0.75 * w.dl / (s.total_len / s.n)))"
    )
    s32_sql = f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0,
             len(list_filter(ts, t -> t = 'join')) AS tf1 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0,
             count(*) FILTER (WHERE tf1 > 0) AS df1 FROM d),
w AS (SELECT d.doc_id, ({_bm25_expr0}) AS p, tf1, dl
      FROM d, s WHERE tf0 > 0
      ORDER BY ({_bm25_expr0}) DESC, d.doc_id LIMIT 50),
r AS (SELECT w.doc_id,
             1.0 * w.p + 2.0 * (CASE WHEN w.tf1 > 0 THEN ({_s32_bm25_1}) ELSE 0 END) AS f
      FROM w, s)
SELECT doc_id, round(f, 4) AS score FROM r ORDER BY f DESC, doc_id LIMIT 10
"""

    # E10 delete_by_query: docs containing 'slow' tombstoned; query
    # 'vector' scores with ORIGINAL df (tombstones don't rewrite
    # stats) and excludes the deleted — plus the exact remaining total
    e10_sql = f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0,
             len(list_filter(ts, t -> t = 'slow')) AS tfn FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d),
m AS (SELECT d.doc_id, round({_bm25_expr0}, 4) AS score, ({_bm25_expr0}) AS raw
      FROM d, s WHERE tf0 > 0 AND tfn = 0)
SELECT (SELECT count(*) FROM m) AS total, doc_id, score
FROM m ORDER BY raw DESC, doc_id LIMIT 10
"""

    # S29 exact percentiles over the matched set (quantile_disc)
    s29_sql = f"""
WITH tok AS (SELECT doc_id, n_chars, {toks} AS ts FROM documents),
m AS (SELECT n_chars FROM tok WHERE len(list_filter(ts, t -> t = 'vector')) > 0),
a AS (SELECT quantile_disc(n_chars, 0.25) AS v1, quantile_disc(n_chars, 0.5) AS v2,
             quantile_disc(n_chars, 0.75) AS v3 FROM m)
SELECT unnest([0.25, 0.5, 0.75]) AS q,
       unnest([CAST(v1 AS DOUBLE), CAST(v2 AS DOUBLE), CAST(v3 AS DOUBLE)]) AS value
FROM a
"""

    # S22 Wildcard/Regexp multi-term rewrite: per-expanded-token idf,
    # contributions sum, ranked on the rounded score (the same shape
    # as the s2 range scan / s10 fuzzy SQL)
    def _pattern_sql(pred: str) -> str:
        return f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len FROM d),
e AS (SELECT doc_id, dl, unnest(list_filter(ts, t -> {pred})) AS tk FROM d),
tf AS (SELECT doc_id, dl, tk, count(*) AS tf FROM e GROUP BY 1, 2, 3),
df AS (SELECT tk, count(*) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id, round(sum(
    ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2 /
    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / (s.total_len / s.n)))), 4) AS score
FROM tf JOIN df USING (tk), s
GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10
"""

    s22_sql = (
        "SELECT 'wildcard' AS branch, t1.* FROM ("
        + _pattern_sql("t LIKE 's%'")
        + ") t1 UNION ALL SELECT 'regexp' AS branch, t2.* FROM ("
        + _pattern_sql("regexp_full_match(t, 'hash|scan')")
        + ") t2"
    )

    def _xf_sql(tok: str, tie: float = 0.3) -> str:
        # S15 cross-field blend: blended df = min(dfc+dfp, N) shared by
        # both fields' BM25 parts; combine = best + tie*(sum - best)
        tc = _TOKS.format(col="text")
        tp = _TOKS.format(col="source")
        bdf = "least(s.dfc + s.dfp, s.n)"
        bidf = f"ln(1 + (s.n - {bdf} + 0.5) / ({bdf} + 0.5))"
        sc_c = (
            f"CASE WHEN tfc > 0 THEN {bidf} * tfc * 2.2 / "
            f"(tfc + 1.2 * (1 - 0.75 + 0.75 * d.dlc / (s.tc / s.n))) ELSE 0 END"
        )
        sc_p = (
            f"CASE WHEN tfp > 0 THEN {bidf} * tfp * 2.2 / "
            f"(tfp + 1.2 * (1 - 0.75 + 0.75 * d.dlp / (s.tp / s.n))) ELSE 0 END"
        )
        comb = f"greatest(sc_c, sc_p) + {tie} * (sc_c + sc_p - greatest(sc_c, sc_p))"
        return f"""
WITH d AS (SELECT doc_id, len({tc}) AS dlc, len({tp}) AS dlp,
       len(list_filter({tc}, t -> t = '{tok}')) AS tfc,
       len(list_filter({tp}, t -> t = '{tok}')) AS tfp
       FROM documents),
s AS (SELECT count(*) AS n, sum(dlc) AS tc, sum(dlp) AS tp,
       count(*) FILTER (WHERE tfc > 0) AS dfc,
       count(*) FILTER (WHERE tfp > 0) AS dfp FROM d),
sc AS (SELECT d.doc_id, {sc_c} AS sc_c, {sc_p} AS sc_p
       FROM d, s WHERE tfc > 0 OR tfp > 0)
SELECT doc_id, round({comb}, 4) AS score
FROM sc ORDER BY ({comb}) DESC, doc_id LIMIT 10
"""

    s15_sql = (
        f"SELECT 'text_term' AS branch, t1.* FROM ({_xf_sql('vector')}) t1 "
        f"UNION ALL SELECT 'source_term' AS branch, t2.* FROM ({_xf_sql('src1')}) t2"
    )

    def _bf_sql(tok: str, tie: float = 0.3) -> str:
        # s51 best_fields: same DisMax skeleton as _xf_sql but each
        # field keeps its OWN idf from its OWN df
        tc = _TOKS.format(col="text")
        tp = _TOKS.format(col="source")
        idf_c = "ln(1 + (s.n - s.dfc + 0.5) / (s.dfc + 0.5))"
        idf_p = "ln(1 + (s.n - s.dfp + 0.5) / (s.dfp + 0.5))"
        sc_c = (
            f"CASE WHEN tfc > 0 THEN {idf_c} * tfc * 2.2 / "
            f"(tfc + 1.2 * (1 - 0.75 + 0.75 * d.dlc / (s.tc / s.n))) ELSE 0 END"
        )
        sc_p = (
            f"CASE WHEN tfp > 0 THEN {idf_p} * tfp * 2.2 / "
            f"(tfp + 1.2 * (1 - 0.75 + 0.75 * d.dlp / (s.tp / s.n))) ELSE 0 END"
        )
        comb = f"greatest(sc_c, sc_p) + {tie} * (sc_c + sc_p - greatest(sc_c, sc_p))"
        return f"""
WITH d AS (SELECT doc_id, len({tc}) AS dlc, len({tp}) AS dlp,
       len(list_filter({tc}, t -> t = '{tok}')) AS tfc,
       len(list_filter({tp}, t -> t = '{tok}')) AS tfp
       FROM documents),
s AS (SELECT count(*) AS n, sum(dlc) AS tc, sum(dlp) AS tp,
       count(*) FILTER (WHERE tfc > 0) AS dfc,
       count(*) FILTER (WHERE tfp > 0) AS dfp FROM d),
sc AS (SELECT d.doc_id, {sc_c} AS sc_c, {sc_p} AS sc_p
       FROM d, s WHERE tfc > 0 OR tfp > 0)
SELECT doc_id, round({comb}, 4) AS score
FROM sc ORDER BY ({comb}) DESC, doc_id LIMIT 10
"""

    s51_sql = (
        f"SELECT 'text_term' AS branch, t1.* FROM ({_bf_sql('vector')}) t1 "
        f"UNION ALL SELECT 'source_term' AS branch, t2.* FROM ({_bf_sql('src1')}) t2"
    )
    e8_sql = f"""
WITH tok AS (SELECT {toks_plain} AS ts FROM documents)
SELECT 'vector' AS keyword, count(*) AS total FROM tok
WHERE len(list_filter(ts, t -> t = 'vector')) > 0
UNION ALL
SELECT 'hash join', count(*) FROM tok
WHERE len(list_filter(ts, t -> t = 'hash')) > 0
  AND len(list_filter(ts, t -> t = 'join')) > 0
UNION ALL
SELECT 'spark', count(*) FROM tok
WHERE len(list_filter(ts, t -> t = 'spark')) > 0
"""
    # t_lang_id: marker-hit counts per profile (list_filter lambda) +
    # a CASE cascade in sorted profile-code order. At stage i the
    # condition only compares against LATER codes: if every earlier
    # stage failed, the global max lives in {i..end}, so "h_i >= all
    # later" picks exactly np.argmax's first-max tiebreak. CJK
    # override (first 2000 chars) wins, like the Arrow path.
    from search_engine_ray.ops.text import _LANG_MARKERS

    plain_toks = "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+')"

    # percolator registry conditions (shared by s46/s47/s48) — one SQL
    # predicate per stored query, same clause semantics as _percolate_registry
    def _has(tok):
        return f"len(list_filter(ts, t -> t = '{tok}')) > 0"

    _perc_conds = {
        "q_vector": _has("vector"),
        "q_hash_join": f"({_has('hash')} AND {_has('join')})",
        "q_spark_or_window": f"({_has('spark')} OR {_has('window')})",
        "q_vector_not_slow": f"({_has('vector')} AND NOT {_has('slow')})",
        "q_cust_prefix": "len(list_filter(ts, t -> t LIKE 'cust%')) > 0",
        "q_syn": "len(list_filter(ts, t -> t = 'vector' OR t = 'matrix')) > 0",
    }
    _perc_tok = f"tok AS (SELECT doc_id, {plain_toks} AS ts FROM documents)"
    _filters_sql = f"WITH {_perc_tok}\n" + "\nUNION ALL ".join(
        f"SELECT '{name}' AS filter_id, CAST(count(*) FILTER (WHERE {cond}) AS BIGINT)"
        f" AS n FROM tok"
        for name, cond in _perc_conds.items()
    ) + (
        "\nUNION ALL SELECT '_other_', CAST(count(*) FILTER (WHERE "
        + " AND ".join(f"NOT ({c})" for c in _perc_conds.values())
        + ") AS BIGINT) AS n FROM tok"
    )
    # s49: full BM25 over the STEMMED term statistics of the plural
    # corpus — same formula/op-order as _bm25_sql, tokens run through
    # the shared DUCKDB_S_STEM (lockstep with analysis.s_stem)
    from search_engine_ray.analysis import DUCKDB_S_STEM as _STEM

    _stem_score = (
        "ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 / "
        "(tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))"
    )
    _stemmed_sql = f"""
WITH base AS (SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, replace(text, 'vector', 'vectors') FROM documents),
tok AS (SELECT doc_id, list_transform({_TOKS.format(col='text')}, t -> {_STEM.format(t='t')}) AS ts FROM base),
d AS (SELECT doc_id, len(ts) AS dl, len(list_filter(ts, t -> t = 'vector')) AS tf0 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len, count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d)
SELECT d.doc_id, round({_stem_score}, 4) AS score
FROM d, s WHERE tf0 > 0
ORDER BY ({_stem_score}) DESC, d.doc_id LIMIT 10
"""
    # s52 _rank_eval: BM25 top-10 page per request, binary judgments
    # (tf >= 2), trec-style metrics — same formulas/op order as
    # pipelines.rank_eval
    def _rank_eval_sql(term: str) -> str:
        score = (
            "ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 / "
            "(tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))"
        )
        return f"""
(WITH tok AS (SELECT doc_id, {_TOKS.format(col='text')} AS ts FROM documents),
 d AS (SELECT doc_id, len(ts) AS dl, len(list_filter(ts, t -> t = '{term}')) AS tf0 FROM tok),
 s AS (SELECT count(*) AS n, sum(dl) AS total_len, count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d),
 ranked AS (SELECT d.doc_id, row_number() OVER (ORDER BY ({score}) DESC, d.doc_id) AS pos
            FROM d, s WHERE tf0 > 0 QUALIFY pos <= 10),
 rel AS (SELECT doc_id FROM d WHERE tf0 >= 2),
 hit AS (SELECT pos FROM ranked JOIN rel USING (doc_id)),
 m AS (SELECT count(*) AS n_hit, coalesce(min(pos), 0) AS first_pos,
       coalesce(sum(1.0 / log2(pos + 1.0)), 0.0) AS dcg FROM hit),
 r AS (SELECT count(*) AS nr FROM rel),
 i AS (SELECT coalesce(sum(1.0 / log2(g + 1.0)), 0.0) AS idcg
       FROM (SELECT unnest(generate_series(1, least(10, (SELECT nr FROM r)))) AS g))
 SELECT 'q_{term}' AS request_id,
  round(m.n_hit / 10.0, 4) AS p_at_k,
  round(CASE WHEN r.nr > 0 THEN m.n_hit / CAST(r.nr AS DOUBLE) ELSE 0.0 END, 4) AS recall_at_k,
  round(CASE WHEN m.first_pos > 0 THEN 1.0 / m.first_pos ELSE 0.0 END, 4) AS reciprocal_rank,
  round(m.dcg, 4) AS dcg_at_k,
  round(CASE WHEN i.idcg > 0 THEN m.dcg / i.idcg ELSE 0.0 END, 4) AS ndcg_at_k
 FROM m, r, i)"""

    _rank_eval_union = "\nUNION ALL\n".join(
        _rank_eval_sql(t) for t in ("vector", "hash", "window")
    )
    # t_quality_clf: retrain the deterministic logreg here with the
    # SAME numpy code path (sorted rows, standardized fit, raw-space
    # fold-in) and embed the weights as repr'd float literals — the
    # SQL replays sigmoid(x1*w1 + x2*w2 + b) in the engine's op order
    def _clf_sql() -> str:
        from search_engine_ray.ops.classify import train_logreg
        from search_engine_ray.ops.text import _flat_tokens as _ft

        # The driver's correctness gate always compares at sf0.01; the
        # oracle must retrain on the SAME corpus the queries() entry
        # trains on, so the training path is configurable for local
        # checks at other scales (SER_ORACLE_SF) and the entry asserts
        # corpus_size <= the fit's sample_size so the limit(50k)
        # sample is the whole (deterministic) corpus.
        sf = os.environ.get("SER_ORACLE_SF", "/root/testdata/sf0.01")
        t = pq.read_table(
            os.path.join(sf, "documents.parquet"),
            columns=["doc_id", "text", "lang", "n_chars"],
        )
        flat, parents, n = _ft(t["text"])
        ntok = np.bincount(parents, minlength=n).astype(np.float64)
        df = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(),
                "n_chars": t["n_chars"].to_numpy().astype(np.float64),
                "n_tok": ntok,
                "is_en": (
                    t["lang"].to_numpy(zero_copy_only=False) == "en"
                ).astype(np.float64),
            }
        ).sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        X = df[["n_chars", "n_tok"]].to_numpy(dtype=np.float64)
        y = df["is_en"].to_numpy(dtype=np.float64)
        mean, std = X.mean(axis=0), X.std(axis=0)
        std = np.where(std == 0.0, 1.0, std)
        w, b = train_logreg((X - mean) / std, y)
        wr = w / std
        br = float(b - float((mean * wr).sum()))
        z = (
            f"(CAST(n_chars AS DOUBLE) * {wr[0]!r} + "
            f"CAST(len({plain_toks}) AS DOUBLE) * {wr[1]!r} + {br!r})"
        )
        return (
            f"SELECT doc_id, round(1.0 / (1.0 + exp(-{z})), 4) AS clf_score "
            "FROM documents"
        )

    # ann_pq: the codebooks are model parameters like t_quality_clf's
    # logreg weights — retrain them here deterministically (seeded
    # k-means via the SAME shared numpy path PQIndex.build uses; the
    # sample is the whole corpus at oracle scale, asserted) and embed
    # the centroids as literals. The SQL then independently replays
    # the entire PQ pipeline: L2-normalize, per-subspace code
    # assignment (argmin of -2 x·c + ||c||², lowest code on ties,
    # exactly ops/ann.py PQIndex._encode), ADC shortlist of k*rerank
    # on the ROUNDED approx cosine with vec_id tiebreak
    # (PQIndex.search_batch._final), and the exact-cosine re-rank page
    # (pq_search_rerank._final).
    def _pq_sql(k: int = 10, rerank: int = 4, m: int = 8) -> str:
        from search_engine_ray.ops.ann import _normalize, train_pq_codebooks

        sf = os.environ.get("SER_ORACLE_SF", "/root/testdata/sf0.01")
        df = pq.read_table(os.path.join(sf, "embeddings.parquet")).to_pandas()
        assert len(df) <= 4096, "oracle retrain needs the build sample == corpus"
        x = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        sub = x.shape[1] // m
        books = train_pq_codebooks(x, m)
        cn = (books**2).sum(axis=2)
        rows = ",".join(
            f"({j},{c},[{','.join(repr(float(v)) for v in books[j, c])}],{float(cn[j, c])!r})"
            for j in range(m)
            for c in range(books.shape[1])
        )
        return f"""
WITH cent(sub, code, cv, cn) AS (VALUES {rows}),
e0 AS (SELECT vec_id, embedding::DOUBLE[] AS ee,
              sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       FROM embeddings),
n AS (SELECT vec_id, list_transform(ee, x -> x / nrm) AS e FROM e0),
asg AS (
  SELECT vec_id, sub, code FROM (
    SELECT n.vec_id, c.sub, c.code,
           row_number() OVER (PARTITION BY n.vec_id, c.sub
             ORDER BY -2 * list_dot_product(n.e[c.sub*{sub}+1 : c.sub*{sub}+{sub}], c.cv) + c.cn,
                      c.code) AS rn
    FROM n CROSS JOIN cent c) WHERE rn = 1),
q AS (SELECT vec_id AS qid, e AS qe FROM n WHERE vec_id IN (0, 1, 2)),
adc AS (
  SELECT q.qid, a.vec_id,
         sum(list_dot_product(q.qe[a.sub*{sub}+1 : a.sub*{sub}+{sub}], c.cv)) AS cos_a
  FROM asg a JOIN cent c ON c.sub = a.sub AND c.code = a.code CROSS JOIN q
  GROUP BY 1, 2),
short AS (
  SELECT qid, vec_id FROM adc
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY round(cos_a, 4) DESC, vec_id) <= {k * rerank})
SELECT s.qid, s.vec_id, round(list_dot_product(n.e, q.qe), 4) AS cos
FROM short s JOIN n ON n.vec_id = s.vec_id JOIN q ON q.qid = s.qid
QUALIFY row_number() OVER (PARTITION BY s.qid
         ORDER BY round(list_dot_product(n.e, q.qe), 4) DESC, s.vec_id) <= {k}
"""

    # ann_ivfpq: the composed IVFADC oracle — retrain the seeded coarse
    # centroids AND the PQ codebooks from the id-sorted sample (exactly
    # IVFPQIndex.build), then replay in SQL: normalize, coarse cluster
    # assignment (argmax dot, lowest cluster on ties), per-subspace code
    # assignment (_pq_sql's argmin), per-query probe selection (top
    # nprobe by dot, lowest cluster on ties), ADC restricted to probed
    # clusters' rows, k*rerank shortlist on the rounded approx cosine,
    # exact-cosine re-rank page.
    def _ivfpq_sql(
        k: int = 10, rerank: int = 4, m: int = 8, n_clusters: int = 8, nprobe: int = 4
    ) -> str:
        from search_engine_ray.ops.ann import (
            _normalize,
            spherical_kmeans,
            train_pq_codebooks,
        )

        sf = os.environ.get("SER_ORACLE_SF", "/root/testdata/sf0.01")
        df = (
            pq.read_table(os.path.join(sf, "embeddings.parquet"))
            .to_pandas()
            .sort_values("vec_id")
        )
        assert len(df) <= 4096, "oracle retrain needs the build sample == corpus"
        x = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        sub = x.shape[1] // m
        cent = spherical_kmeans(x, n_clusters, 10, 5)
        books = train_pq_codebooks(x, m, iters=12, seed=7)
        pn = (books**2).sum(axis=2)
        cent_rows = ",".join(
            f"({c},[{','.join(repr(float(v)) for v in cent[c])}])"
            for c in range(cent.shape[0])
        )
        pq_rows = ",".join(
            f"({j},{c},[{','.join(repr(float(v)) for v in books[j, c])}],{float(pn[j, c])!r})"
            for j in range(m)
            for c in range(books.shape[1])
        )
        return f"""
WITH cent(c, cv) AS (VALUES {cent_rows}),
pqc(sub, code, pv, pn) AS (VALUES {pq_rows}),
e0 AS (SELECT vec_id, embedding::DOUBLE[] AS ee,
              sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       FROM embeddings),
n AS (SELECT vec_id, list_transform(ee, x -> x / nrm) AS e FROM e0),
asgc AS (SELECT vec_id, c AS cluster FROM (
    SELECT n.vec_id, c.c,
           row_number() OVER (PARTITION BY n.vec_id
               ORDER BY list_dot_product(n.e, c.cv) DESC, c.c) AS rn
    FROM n CROSS JOIN cent c) WHERE rn = 1),
asgp AS (SELECT vec_id, sub, code FROM (
    SELECT n.vec_id, p.sub, p.code,
           row_number() OVER (PARTITION BY n.vec_id, p.sub
             ORDER BY -2 * list_dot_product(n.e[p.sub*{sub}+1 : p.sub*{sub}+{sub}], p.pv) + p.pn,
                      p.code) AS rn
    FROM n CROSS JOIN pqc p) WHERE rn = 1),
q AS (SELECT vec_id AS qid, e AS qe FROM n WHERE vec_id IN (0, 1, 2)),
probe AS (SELECT qid, c FROM (
    SELECT q.qid, c.c,
           row_number() OVER (PARTITION BY q.qid
               ORDER BY list_dot_product(q.qe, c.cv) DESC, c.c) AS rn
    FROM q CROSS JOIN cent c) WHERE rn <= {nprobe}),
adc AS (
  SELECT q.qid, a.vec_id,
         sum(list_dot_product(q.qe[a.sub*{sub}+1 : a.sub*{sub}+{sub}], p2.pv)) AS cos_a
  FROM asgp a
  JOIN asgc ac ON ac.vec_id = a.vec_id
  JOIN probe pr ON pr.c = ac.cluster
  JOIN q ON q.qid = pr.qid
  JOIN pqc p2 ON p2.sub = a.sub AND p2.code = a.code
  GROUP BY 1, 2),
short AS (
  SELECT qid, vec_id FROM adc
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY round(cos_a, 4) DESC, vec_id) <= {k * rerank})
SELECT s.qid, s.vec_id, round(list_dot_product(n.e, q.qe), 4) AS cos
FROM short s JOIN n ON n.vec_id = s.vec_id JOIN q ON q.qid = s.qid
QUALIFY row_number() OVER (PARTITION BY s.qid
         ORDER BY round(list_dot_product(n.e, q.qe), 4) DESC, s.vec_id) <= {k}
"""

    # r35: PageRank replayed as unrolled power-iteration CTEs — same
    # per-edge pr/od division, same (1-d)/N + d*s op order (the (1-d)
    # literal is the exact Python double) as ops/graph.pagerank
    def _pagerank_sql(iters: int = 5, d: float = 0.85) -> str:
        steps = []
        for i in range(iters):
            steps.append(
                f"""pr{i + 1} AS (
  SELECT n2.node, {1.0 - d!r} / nn.n + {d!r} * coalesce(s.s, 0) AS pr
  FROM nodes n2 CROSS JOIN nn
  LEFT JOIN (SELECT e.dst AS node, sum(p.pr / e.od) AS s
             FROM edges_od e JOIN pr{i} p ON p.node = e.src GROUP BY 1) s
    ON s.node = n2.node)"""
            )
        chain = ",\n".join(steps)
        return f"""
WITH e0 AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
edges AS (SELECT c AS src, 1000000 + sk AS dst FROM e0
          UNION ALL SELECT 1000000 + sk, c FROM e0),
deg AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
edges_od AS (SELECT e.src, e.dst, d2.od FROM edges e JOIN deg d2 USING (src)),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
pr0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn),
{chain}
SELECT node, round(pr, 4) AS pr FROM pr{iters}
"""

    def _semdedup_sql(threshold: float = 0.99, n_clusters: int = 8) -> str:
        # dedup_semantic oracle: retrain the SAME seeded spherical
        # k-means (deterministic given the corpus == sample, like
        # _pq_sql), embed the centroids as literals, assign by argmax
        # dot with np.argmax's lowest-index tie-break, then a
        # within-cluster lower-id self-join replays the dup rule.
        from search_engine_ray.ops.ann import _normalize, spherical_kmeans

        sf = os.environ.get("SER_ORACLE_SF", "/root/testdata/sf0.01")
        df = pq.read_table(os.path.join(sf, "embeddings.parquet")).to_pandas()
        assert 2 * len(df) <= 4096, "oracle retrain needs the build sample == corpus"
        # augmented corpus EXACTLY as the entry builds it: original
        # rows then a float32 x1.0001 copy, sorted by vec_id (original
        # ids < 1e6 < perturbed ids, so vstack order == sorted order —
        # matching semantic_dedup's sorted sample)
        x0 = np.stack(df["embedding"].to_numpy()).astype(np.float32)
        x = _normalize(np.vstack([x0, x0 * np.float32(1.0001)]).astype(np.float64))
        cent = spherical_kmeans(x, n_clusters, 10, 5)
        rows = ",".join(
            f"({c},[{','.join(repr(float(v)) for v in cent[c])}])"
            for c in range(cent.shape[0])
        )
        scale = repr(float(np.float32(1.0001)))
        return f"""
WITH cent(c, cv) AS (VALUES {rows}),
corpus AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000,
           list_transform(embedding, x -> CAST(x * {scale} AS REAL))
    FROM embeddings),
e0 AS (SELECT vec_id, embedding::DOUBLE[] AS ee,
              sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       FROM corpus),
n AS (SELECT vec_id, list_transform(ee, x -> x / nrm) AS e FROM e0),
asg AS (SELECT vec_id, e, c AS cluster FROM (
    SELECT n.vec_id, n.e, c.c,
           row_number() OVER (PARTITION BY n.vec_id
               ORDER BY list_dot_product(n.e, c.cv) DESC, c.c) AS rn
    FROM n CROSS JOIN cent c) WHERE rn = 1)
SELECT a.vec_id, any_value(a.cluster)::BIGINT AS cluster,
       coalesce(max(CASE WHEN round(list_dot_product(a.e, b.e), 4) >= {threshold}
                         THEN 1 ELSE 0 END), 0)::BIGINT AS is_dup
FROM asg a LEFT JOIN asg b ON b.cluster = a.cluster AND b.vec_id < a.vec_id
GROUP BY a.vec_id
"""

    def _cluster_sample_sql(quota: int = 20, n_clusters: int = 8) -> str:
        # t_cluster_sample oracle: retrain the seeded centroids
        # (corpus == sample, asserted), assign by argmax dot with the
        # lowest-index tie-break, draw quota lowest md5 hashes per
        # cluster (hash order == unsigned order == md5_number_upper)
        from search_engine_ray.ops.ann import _normalize, spherical_kmeans

        sf = os.environ.get("SER_ORACLE_SF", "/root/testdata/sf0.01")
        df = pq.read_table(os.path.join(sf, "embeddings.parquet")).to_pandas()
        assert len(df) <= 4096, "oracle retrain needs the build sample == corpus"
        df = df.sort_values("vec_id")
        x = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        cent = spherical_kmeans(x, n_clusters, 10, 5)
        rows = ",".join(
            f"({c},[{','.join(repr(float(v)) for v in cent[c])}])"
            for c in range(cent.shape[0])
        )
        return f"""
WITH cent(c, cv) AS (VALUES {rows}),
e0 AS (SELECT vec_id, embedding::DOUBLE[] AS ee,
              sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       FROM embeddings),
n AS (SELECT vec_id, list_transform(ee, x -> x / nrm) AS e FROM e0),
asg AS (SELECT vec_id, c AS cluster FROM (
    SELECT n.vec_id, c.c,
           row_number() OVER (PARTITION BY n.vec_id
               ORDER BY list_dot_product(n.e, c.cv) DESC, c.c) AS rn
    FROM n CROSS JOIN cent c) WHERE rn = 1)
SELECT vec_id, cluster::BIGINT AS cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY cluster
               ORDER BY md5_number_upper(CAST(vec_id AS VARCHAR)), vec_id) AS rk
    FROM asg) WHERE rk <= {quota}
ORDER BY cluster, vec_id
"""

    def _topic_census_sql(n_clusters: int = 8) -> str:
        # t_topic_census oracle: retrain the seeded centroids (corpus
        # == sample, asserted), assign by argmax dot with the
        # lowest-index tie-break, then the census is a plain GROUP BY
        # over the assignment (count + avg cosine-to-centroid)
        from search_engine_ray.ops.ann import _normalize, spherical_kmeans

        sf = os.environ.get("SER_ORACLE_SF", "/root/testdata/sf0.01")
        df = pq.read_table(os.path.join(sf, "embeddings.parquet")).to_pandas()
        assert len(df) <= 4096, "oracle retrain needs the build sample == corpus"
        df = df.sort_values("vec_id")
        x = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        cent = spherical_kmeans(x, n_clusters, 10, 5)
        rows = ",".join(
            f"({c},[{','.join(repr(float(v)) for v in cent[c])}])"
            for c in range(cent.shape[0])
        )
        return f"""
WITH cent(c, cv) AS (VALUES {rows}),
e0 AS (SELECT vec_id, embedding::DOUBLE[] AS ee,
              sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       FROM embeddings),
n AS (SELECT vec_id, list_transform(ee, x -> x / nrm) AS e FROM e0),
asg AS (SELECT vec_id, cluster, cos FROM (
    SELECT n.vec_id, c.c AS cluster, list_dot_product(n.e, c.cv) AS cos,
           row_number() OVER (PARTITION BY n.vec_id
               ORDER BY list_dot_product(n.e, c.cv) DESC, c.c) AS rn
    FROM n CROSS JOIN cent c) WHERE rn = 1)
SELECT cluster::BIGINT AS cluster, CAST(count(*) AS BIGINT) AS n_vecs,
       round(sum(cos) / count(*), 4) AS mean_cos
FROM asg GROUP BY cluster ORDER BY cluster
"""

    # mm_features / mm_frames: the INPUT media table (payload sizes /
    # durations from the seeded generator) is embedded as literals —
    # the dataset, like reading a parquet — and the SQL independently
    # replays the whole fake-decode pipeline: payload hex =
    # sha256('3/i') repeated and truncated to size bytes
    # (synthetic_media_table), feat0 = first little-endian uint64 of
    # md5(hex || '/0') >> 11 / 2^53 (DecodeAndFeaturize._features),
    # frame i hash = sha256(hex || '/i') for the duration-derived
    # frame count (FrameSampler).
    def _mm_meta(kind: str) -> str:
        from search_engine_ray.ops.multimodal import synthetic_media_table

        t = synthetic_media_table(200, kind, seed=3)
        sizes = [len(p) for p in t["payload"].to_pylist()]
        durs = t["duration_ms"].to_pylist()
        return ",".join(
            f"({i},{s},{d})" for i, (s, d) in enumerate(zip(sizes, durs))
        )

    def _mm_pay(kind: str) -> str:
        return (
            f"WITH meta(media_id, size, dur) AS (VALUES {_mm_meta(kind)}), "
            "pay AS (SELECT media_id, size, dur, "
            "substr(repeat(sha256('3/' || media_id), size // 32 + 1), 1, 2 * size) AS hx "
            "FROM meta)"
        )

    mm_features_sql = (
        f"{_mm_pay('image')} "
        "SELECT media_id, 'image' AS kind, size::BIGINT AS payload_bytes, "
        "round((md5_number_upper(hx || '/0') >> 11)::DOUBLE / 9007199254740992.0, 6) AS feat0 "
        "FROM pay"
    )
    mm_frames_sql = (
        f"{_mm_pay('video')} "
        "SELECT media_id, f.fi::BIGINT AS frame_idx, sha256(hx || '/' || f.fi) AS frame_hex "
        "FROM pay, range(4) AS f(fi) "
        "WHERE f.fi < least(4, greatest(1, dur // 10000 + 1))"
    )
    mm_audio_sql = (
        f"{_mm_pay('audio')} "
        "SELECT media_id, nw::BIGINT AS n_windows, "
        "round(avg((md5_number_upper(hx || '/' || f.w) >> 11)::DOUBLE "
        "/ 9007199254740992.0), 6) AS mean_energy "
        "FROM (SELECT media_id, hx, least(16, greatest(1, dur // 1000)) AS nw FROM pay) p, "
        "range(16) AS f(w) WHERE f.w < p.nw "
        "GROUP BY media_id, nw ORDER BY media_id"
    )

    _pnames = list(_perc_conds)
    _adj_sql = (
        f"WITH {_perc_tok},\n"
        "m AS (SELECT "
        + ", ".join(f"{cond} AS c{i}" for i, cond in enumerate(_perc_conds.values()))
        + " FROM tok)\nSELECT * FROM (\n"
        + "\nUNION ALL ".join(
            f"SELECT '{_pnames[i]}' AS a, '{_pnames[j]}' AS b, "
            f"CAST(count(*) FILTER (WHERE c{i} AND c{j}) AS BIGINT) AS n FROM m"
            for i in range(len(_pnames))
            for j in range(i, len(_pnames))
        )
        + "\n) WHERE n > 0"
    )
    lang_codes = sorted(k for k, v in _LANG_MARKERS.items() if v)
    hit_cols = ", ".join(
        "len(list_filter(ts, t -> t IN ({}))) AS h_{}".format(
            ", ".join(f"'{w}'" for w in sorted(_LANG_MARKERS[c])), c
        )
        for c in lang_codes
    )
    argmax_cases = " ".join(
        "WHEN {} THEN '{}'".format(
            " AND ".join([f"h_{c} >= h_{o}" for o in lang_codes[i + 1 :]] or ["TRUE"]), c
        )
        for i, c in enumerate(lang_codes)
    )
    def _lang_sql_for(table: str) -> str:
        return f"""
WITH tok AS (SELECT doc_id, text, {plain_toks} AS ts FROM {table}),
hits AS (SELECT doc_id, text, {hit_cols} FROM tok)
SELECT doc_id,
  CASE WHEN regexp_matches(substr(coalesce(text, ''), 1, 2000), '[一-鿿]') THEN 'zh'
       WHEN greatest({", ".join("h_" + c for c in lang_codes)}) = 0 THEN 'und'
       {argmax_cases} END AS lang_id
FROM hits
"""

    lang_sql = _lang_sql_for("documents")

    def _quality_sql_for(table: str) -> str:
        return (
            "SELECT doc_id, round("
            "0.4 * (len(list_distinct(regexp_extract_all(lower(text),'[a-z0-9_]+')))::DOUBLE"
            " / len(regexp_extract_all(lower(text),'[a-z0-9_]+'))) + "
            "0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text)) + "
            "0.3 * (least(len(regexp_extract_all(lower(text),'[a-z0-9_]+')), 200)::DOUBLE / 200)"
            f", 4) AS quality FROM {table}"
        )

    # dedup_best_quality: survivors under the keep-HIGHEST-quality
    # policy — same recursive-CTE component closure as
    # dedup_survivors, winner per component by (quality DESC, doc_id)
    # over the t_quality scoring SQL applied to the perturbed corpus
    best_quality_sql = f"""
WITH RECURSIVE jp AS ({_JACCARD_ALLPAIRS_SQL}),
edges AS (
  SELECT a AS u, b AS v FROM jp UNION SELECT b, a FROM jp
  UNION SELECT a, a FROM jp UNION SELECT b, b FROM jp
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, g.v FROM reach r JOIN edges g ON r.v = g.u
),
comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
{_BOTH_DOCS_SQL},
qual AS ({_quality_sql_for("both_docs")}),
best AS (
  SELECT c.doc_id FROM comp c JOIN qual q USING (doc_id)
  QUALIFY row_number() OVER (PARTITION BY c.component
            ORDER BY q.quality DESC, c.doc_id) = 1)
SELECT bd.doc_id FROM both_docs bd
WHERE bd.doc_id NOT IN (SELECT doc_id FROM comp)
   OR bd.doc_id IN (SELECT doc_id FROM best)
"""

    # pipe_curation: the full curation composition (lang-ID -> quality
    # -> filter -> exact dedup keeping min doc_id) over the corpus plus
    # an exact-duplicate copy, all reusing the per-stage oracles above
    curation_sql = f"""
WITH cd AS (SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 2000000, text FROM documents),
lang AS ({_lang_sql_for("cd")}),
qual AS ({_quality_sql_for("cd")}),
j AS (SELECT c.doc_id, c.text, l.lang_id, q.quality
      FROM cd c JOIN lang l USING (doc_id) JOIN qual q USING (doc_id)
      WHERE l.lang_id = 'en' AND q.quality >= 0.55)
SELECT doc_id, lang_id, quality FROM j
QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
"""
    # t_rolling_fp: token hash = md5_number_upper (first 8 md5 bytes
    # little-endian, the Python side's exact definition); 5-token
    # Horner rolling hash with mod 2^64 after every multiply (HUGEINT
    # intermediates stay < 2^85, uint64 wraparound == mod 2^64); min
    # over full windows, min raw hash for <5-token docs, 0 for empty;
    # final two's-complement fold to BIGINT matches astype(int64)
    M = "18446744073709551616::HUGEINT"
    H = "9223372036854775808::HUGEINT"
    wh = (
        f"((((((((lag(th, 4) OVER w) * 1000003) % {M} + lag(th, 3) OVER w) * 1000003) % {M}"
        f" + lag(th, 2) OVER w) * 1000003 % {M} + lag(th, 1) OVER w) * 1000003 % {M} + th) % {M})"
    )
    fold = "CASE WHEN {v} >= " + H + " THEN {v} - " + M + " ELSE {v} END"
    rolling_sql = f"""
WITH tok AS (
  SELECT doc_id, unnest({plain_toks}) AS tk,
         unnest(range(1, len({plain_toks}) + 1)) AS pos
  FROM documents),
h AS (SELECT doc_id, pos, md5_number_upper(tk)::HUGEINT AS th FROM tok),
win AS (
  SELECT doc_id, th, {wh} AS wh
  FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
agg AS (
  SELECT doc_id, count(*) AS n_tok, min(th) AS min_t, min(wh) AS min_w
  FROM win GROUP BY doc_id)
SELECT d.doc_id,
  CAST(CASE WHEN a.doc_id IS NULL THEN 0
            WHEN a.n_tok < 5 THEN {fold.format(v="a.min_t")}
            ELSE {fold.format(v="a.min_w")} END AS BIGINT) AS rolling_fp
FROM documents d LEFT JOIN agg a USING (doc_id)
"""
    return {
        "s1_bm25_term": _bm25_sql(["vector"]),
        "s8_dispatch": s8_sql,
        "s19_must_not": s19_sql,
        "s20_filter_clause": s20_sql,
        "s21_boost": s21_sql,
        "s22_pattern": s22_sql,
        "s23_range_facet": s23_sql,
        "s24_sort_by_field": s24_sql,
        # s56: ES field collapsing — full BM25 over the match set, one
        # row per lang (best raw score, doc_id asc on ties), then the
        # representatives rank/page like ordinary hits
        "s56_collapse": f"""
WITH tok AS (SELECT doc_id, lang, {_TOKS.format(col="text")} AS ts FROM documents),
d AS (SELECT doc_id, lang, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf > 0) AS df FROM d),
sc AS (SELECT d.doc_id, d.lang,
              ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * tf * 2.2 /
              (tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) AS sr
       FROM d, s WHERE tf > 0),
best AS (SELECT doc_id, lang, sr FROM sc
         QUALIFY row_number() OVER (PARTITION BY lang ORDER BY sr DESC, doc_id) = 1)
SELECT doc_id, lang, round(sr, 4) AS score FROM best
ORDER BY sr DESC, doc_id LIMIT 5
""",
        # s57: ES pinned query — existing pinned ids first in the given
        # order, organic BM25 (pinned excluded) fills to k=10
        "s57_pinned": f"""
WITH pin(doc_id, prio) AS (VALUES (7, 1), (999999, 2), (3, 3)),
pe AS (SELECT p.doc_id, p.prio FROM pin p JOIN documents d USING (doc_id)),
tok AS (SELECT doc_id, {_TOKS.format(col="text")} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf > 0) AS df FROM d),
org AS (SELECT d.doc_id,
               ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * tf * 2.2 /
               (tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) AS sr
        FROM d, s
        WHERE tf > 0 AND d.doc_id NOT IN (SELECT doc_id FROM pe)
        QUALIFY row_number() OVER (ORDER BY sr DESC, d.doc_id)
                <= 10 - (SELECT count(*) FROM pe)),
allr AS (
  SELECT doc_id, 0 AS grp, prio AS o1, 0.0 AS o2 FROM pe
  UNION ALL
  SELECT doc_id, 1, 0, -sr FROM org)
SELECT row_number() OVER (ORDER BY grp, o1, o2, doc_id) AS rank, doc_id,
       CAST(1 - grp AS BIGINT) AS pinned
FROM allr
""",
        "s25_range_filter": s25_sql,
        "s26_match_all_browse": s26_sql,
        "s27_query_string": s27_sql,
        "s28_field_value_boost": s28_sql,
        # s58: rank_feature saturation — additive static-feature fold,
        # same float op order as RankFeatureBoost (v/(v+pivot) then *)
        "s58_rank_feature": _bm25_sql(
            ["vector"], boost_sql="1.5 * (d.n_chars / (d.n_chars + 200.0))"
        ),
        "e10_delete_by_query": e10_sql,
        # e11 sorted export: the rank column IS the ORDER BY proof
        "e11_sorted_export": (
            "SELECT row_number() OVER (ORDER BY l_extendedprice, l_orderkey, "
            "l_linenumber) AS rank, l_orderkey, l_linenumber, l_extendedprice "
            "FROM lineitem"
        ),
        "s29_percentiles": s29_sql,
        "s30_decay": s30_sql,
        "s32_rescore": s32_sql,
        "s33_cardinality": f"""
WITH tok AS (SELECT doc_id, source, lang, {toks} AS ts FROM documents),
m AS (SELECT * FROM tok WHERE len(list_filter(ts, t -> t = 'vector')) > 0)
SELECT count(*) AS total, count(DISTINCT source) AS source_card,
       count(DISTINCT lang) AS lang_card FROM m
""",
        "s15_crossfields": s15_sql,
        "s51_best_fields": s51_sql,
        "s18_mlt": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len FROM d),
seed AS (SELECT unnest(ts) AS t FROM tok WHERE doc_id = 0),
stf AS (SELECT t, count(*) AS tf FROM seed GROUP BY 1),
docfreq AS (SELECT tk, count(*) AS df FROM
            (SELECT doc_id, unnest(list_distinct(ts)) AS tk FROM tok) GROUP BY 1),
sel AS (SELECT stf.t FROM stf JOIN docfreq ON stf.t = docfreq.tk, s
        ORDER BY (ln(1 + (s.n - docfreq.df + 0.5) / (docfreq.df + 0.5)) * stf.tf)
                 DESC, stf.t LIMIT 5),
e AS (SELECT doc_id, dl, unnest(ts) AS tk FROM d),
tf AS (SELECT e.doc_id, e.dl, e.tk, count(*) AS tf
       FROM e JOIN sel ON e.tk = sel.t GROUP BY 1, 2, 3),
df2 AS (SELECT tk, count(*) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id, round(sum(
    ln(1 + (s.n - df2.df + 0.5) / (df2.df + 0.5)) * tf.tf * 2.2 /
    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / (s.total_len / s.n)))), 4) AS score
FROM tf JOIN df2 USING (tk), s
GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10
""",
        "s17_suggest": f"""
WITH tok AS (SELECT doc_id, unnest(list_distinct({toks})) AS t FROM documents),
dfreq AS (SELECT t, count(*) AS df FROM tok GROUP BY 1)
SELECT t AS term, df, CAST(levenshtein(t, 'vectr') AS BIGINT) AS distance
FROM dfreq WHERE t != 'vectr' AND levenshtein(t, 'vectr') <= 2
ORDER BY distance, df DESC, term LIMIT 5
""",
        # S37 term dictionary export: df = docs containing the token
        "s37_dictionary": f"""
WITH tok AS (SELECT doc_id, unnest(list_distinct({toks})) AS t FROM documents)
SELECT t AS term, count(*) AS df FROM tok GROUP BY 1
""",
        # S36 federated DFS: global stats make the two half-indexes
        # score exactly like one index, so the oracle is the plain
        # BM25 SQL with the member name derived from doc_id parity
        "s36_federated": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d),
m AS (SELECT d.doc_id, ({_bm25_expr0}) AS raw FROM d, s WHERE tf0 > 0)
SELECT (SELECT count(*) FROM m) AS total,
       CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS index,
       doc_id, round(raw, 4) AS score
FROM m ORDER BY raw DESC, doc_id LIMIT 10
""",
        # S35 multi-fragment highlight: every 'vector' occurrence up
        # to 3 per doc, +/-2-token windows (DuckDB list slice 1-based)
        "s35_fragments": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
e AS (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS pos FROM tok),
h AS (SELECT doc_id, ts, pos,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS fi
      FROM e WHERE ts[pos] = 'vector')
SELECT doc_id, CAST(fi AS BIGINT) AS frag_idx, CAST(pos AS BIGINT) AS pos,
       array_to_string(ts[greatest(1, pos - 2) : least(len(ts), pos + 2)], ' ') AS snippet
FROM h WHERE fi <= 3
""",
        # S34 phrase suggester: per-token (own-token first, then
        # distance/df/term-ranked corrections, top 3) x cross product,
        # logprob = ln(df0/n) + ln(df1/n) in token order
        "s34_phrase_suggest": f"""
WITH tok AS (SELECT doc_id, unnest(list_distinct({toks})) AS t FROM documents),
dfreq AS (SELECT t, count(*) AS df FROM tok GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
c0 AS (SELECT t, df, d FROM (
         SELECT t, df, 0 AS d, 0 AS own FROM dfreq WHERE t = 'vectr'
         UNION ALL
         SELECT t, df, levenshtein(t, 'vectr'), 1 FROM dfreq
         WHERE t <> 'vectr' AND levenshtein(t, 'vectr') <= 2)
       ORDER BY own, d, df DESC, t LIMIT 3),
c1 AS (SELECT t, df, d FROM (
         SELECT t, df, 0 AS d, 0 AS own FROM dfreq WHERE t = 'jion'
         UNION ALL
         SELECT t, df, levenshtein(t, 'jion'), 1 FROM dfreq
         WHERE t <> 'jion' AND levenshtein(t, 'jion') <= 2)
       ORDER BY own, d, df DESC, t LIMIT 3),
p AS (SELECT c0.t || ' ' || c1.t AS phrase,
             ln(c0.df / n.n) + ln(c1.df / n.n) AS lp,
             c0.d + c1.d AS edits
      FROM c0, c1, n)
SELECT phrase, round(lp, 4) AS logprob, CAST(edits AS BIGINT) AS edits
FROM p ORDER BY lp DESC, edits, phrase LIMIT 3
""",
        "s16_stats_facet": f"""
WITH tok AS (SELECT doc_id, n_chars, {toks} AS ts FROM documents),
d AS (SELECT doc_id, n_chars, len(list_filter(ts, t -> t = 'vector')) AS tf FROM tok)
SELECT count(*) AS total,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       round(avg(n_chars), 4) AS avg_chars
FROM d WHERE tf > 0
""",
        "s9_phonetic": s9_sql,
        "r4_two_key_join": (
            "SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, "
            "r.l_extendedprice AS ret_price FROM lineitem l "
            "JOIN (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
            "      WHERE l_returnflag = 'R') r "
            "ON l.l_orderkey = r.l_orderkey AND l.l_linenumber = r.l_linenumber"
        ),
        "r6_map_enrich": (
            "SELECT o_orderkey, o_custkey, COALESCE(c_mktsegment, 'NONE') AS segment "
            "FROM orders LEFT JOIN customer ON o_custkey = c_custkey"
        ),
        "r9_group_collect": (
            "SELECT c_mktsegment, array_to_string(list(c_custkey ORDER BY c_custkey), ',') "
            "AS members FROM customer GROUP BY 1"
        ),
        "e2_incremental": (
            "SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value "
            "FROM events WHERE ts >= TIMESTAMP '2024-01-20' GROUP BY 1"
        ),
        "e4_upsert_sink": (
            "SELECT lang, count(*) AS cnt, "
            "CAST(sum(n_chars + CASE WHEN lang = 'en' THEN 1000 ELSE 0 END) AS BIGINT) "
            "AS sum_chars FROM documents GROUP BY 1"
        ),
        "e5_full_refresh": (
            "SELECT lang, count(*) AS cnt FROM documents "
            "WHERE lang IN ('en', 'de') GROUP BY 1"
        ),
        "e8_log_sink": e8_sql,
        "dedup_ngram": _JACCARD_ALLPAIRS_SQL,
        "dedup_components": _COMPONENTS_SQL,
        "dedup_survivors": _SURVIVORS_SQL,
        "dedup_best_quality": best_quality_sql,
        "dedup_minhash": _JACCARD_ALLPAIRS_SQL,
        "dedup_incremental": _JACCARD_INCREMENTAL_SQL,
        "dedup_simhash": _SIMHASH_ALLPAIRS_SQL,
        "ann_rp_lsh": _RP_LSH_ALLPAIRS_SQL,
        "s3_bm25_and": _bm25_sql(["hash", "join"], mode="must"),
        "s3_bm25_should": _bm25_sql(["spark", "window"], mode="should"),
        "s2_prefix": _bm25_sql(["src1"], col="source", prefix=True),
        "s2_range_scan": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len FROM d),
e AS (SELECT doc_id, dl, unnest(list_filter(ts, t -> t LIKE 'cust%')) AS tk FROM d),
tf AS (SELECT doc_id, dl, tk, count(*) AS tf FROM e GROUP BY 1, 2, 3),
df AS (SELECT tk, count(*) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id, round(sum(
    ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2 /
    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / (s.total_len / s.n)))), 4) AS score
FROM tf JOIN df USING (tk), s
GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10
""",
        "s10_fuzzy": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len FROM d),
e AS (SELECT doc_id, dl, unnest(list_filter(ts, t -> levenshtein(t, 'vectr') <= 1)) AS tk FROM d),
tf AS (SELECT doc_id, dl, tk, count(*) AS tf FROM e GROUP BY 1, 2, 3),
df AS (SELECT tk, count(*) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id, round(sum(
    ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2 /
    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / (s.total_len / s.n)))), 4) AS score
FROM tf JOIN df USING (tk), s
GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 10
""",
        "s11_phrase": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
      len(list_filter(range(1, len(ts)), i -> ts[i] = 'hash' AND ts[i+1] = 'join')) AS ptf
      FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len, count(*) FILTER (WHERE ptf > 0) AS df FROM d)
SELECT d.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))), 4) AS score
FROM d, s WHERE ptf > 0
ORDER BY score DESC, d.doc_id LIMIT 10
""",
        # s59: span_first — 1-based list index i <= 30 == the engine's
        # 0-based position < 30; dl/score formula as every phrase entry
        "s59_span_first": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
      len(list_filter(range(1, least(len(ts), 30) + 1), i -> ts[i] = 'vector')) AS ptf
      FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len, count(*) FILTER (WHERE ptf > 0) AS df FROM d)
SELECT d.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))), 4) AS score
FROM d, s WHERE ptf > 0
ORDER BY score DESC, d.doc_id LIMIT 10
""",
        # s67: span_or-in-span_near — pair count with the first slot
        # matching EITHER alternative (positions of distinct tokens
        # never collide, so the join counts each pair once)
        "s67_span_or": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
e AS (SELECT doc_id, dl, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM d),
a AS (SELECT doc_id, dl, p FROM e WHERE t IN ('merge', 'sort')),
b AS (SELECT doc_id, p FROM e WHERE t = 'key'),
m AS (SELECT a.doc_id, a.dl, count(*) AS ptf
      FROM a JOIN b ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 2 GROUP BY 1, 2),
s AS (SELECT (SELECT count(*) FROM d) AS n, (SELECT sum(dl) FROM d) AS total_len,
             count(*) AS df FROM m)
SELECT m.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * m.dl / (s.total_len / s.n))), 4) AS score
FROM m, s ORDER BY score DESC, m.doc_id LIMIT 10
""",
        # s69: span_containing — big pair spans (p1, p2), p2-p1 in
        # [1,5], qualifying when a little 'column' occurrence lies in
        # [p1, p2]; ptf counts qualifying spans
        "s69_span_containing": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
e AS (SELECT doc_id, dl, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM d),
a AS (SELECT doc_id, dl, p FROM e WHERE t = 'sort'),
b AS (SELECT doc_id, p FROM e WHERE t = 'order'),
c AS (SELECT doc_id, p FROM e WHERE t = 'column'),
m AS (SELECT a.doc_id, a.dl, count(*) AS ptf
      FROM a JOIN b ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 5
      WHERE EXISTS (SELECT 1 FROM c
                    WHERE c.doc_id = a.doc_id AND c.p BETWEEN a.p AND b.p)
      GROUP BY 1, 2),
s AS (SELECT (SELECT count(*) FROM d) AS n, (SELECT sum(dl) FROM d) AS total_len,
             count(*) AS df FROM m)
SELECT m.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * m.dl / (s.total_len / s.n))), 4) AS score
FROM m, s ORDER BY score DESC, m.doc_id LIMIT 10
""",
        # s78: intervals all_of(ordered, max_gaps=6) — 'value' strictly
        # between a 'hash'..'table' pair, total gaps = c.p - a.p - 2
        "s78_intervals": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
e AS (SELECT doc_id, dl, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM d),
a AS (SELECT doc_id, dl, p FROM e WHERE t = 'hash'),
b AS (SELECT doc_id, p FROM e WHERE t = 'value'),
c AS (SELECT doc_id, p FROM e WHERE t = 'table'),
m AS (SELECT a.doc_id, a.dl, count(*) AS ptf
      FROM a JOIN c ON a.doc_id = c.doc_id AND c.p - a.p BETWEEN 2 AND 8
      WHERE EXISTS (SELECT 1 FROM b
                    WHERE b.doc_id = a.doc_id AND b.p > a.p AND b.p < c.p)
      GROUP BY 1, 2),
s AS (SELECT (SELECT count(*) FROM d) AS n, (SELECT sum(dl) FROM d) AS total_len,
             count(*) AS df FROM m)
SELECT m.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * m.dl / (s.total_len / s.n))), 4) AS score
FROM m, s ORDER BY score DESC, m.doc_id LIMIT 10
""",
        # s79: intervals any_of middle slot — ('value'|'part')
        # strictly between a 'hash'..'table' pair, total gaps <= 4
        "s79_intervals_any": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
e AS (SELECT doc_id, dl, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM d),
a AS (SELECT doc_id, dl, p FROM e WHERE t = 'hash'),
b AS (SELECT doc_id, p FROM e WHERE t IN ('value', 'part')),
c AS (SELECT doc_id, p FROM e WHERE t = 'table'),
m AS (SELECT a.doc_id, a.dl, count(*) AS ptf
      FROM a JOIN c ON a.doc_id = c.doc_id AND c.p - a.p BETWEEN 2 AND 6
      WHERE EXISTS (SELECT 1 FROM b
                    WHERE b.doc_id = a.doc_id AND b.p > a.p AND b.p < c.p)
      GROUP BY 1, 2),
s AS (SELECT (SELECT count(*) FROM d) AS n, (SELECT sum(dl) FROM d) AS total_len,
             count(*) AS df FROM m)
SELECT m.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * m.dl / (s.total_len / s.n))), 4) AS score
FROM m, s ORDER BY score DESC, m.doc_id LIMIT 10
""",
        # s80: span_multi — any 's*' dictionary expansion opens an
        # ordered span closed by 'table' within 2; ptf counts pairs
        "s80_span_multi": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
e AS (SELECT doc_id, dl, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM d),
a AS (SELECT doc_id, dl, p FROM e WHERE t LIKE 's%'),
b AS (SELECT doc_id, p FROM e WHERE t = 'table'),
m AS (SELECT a.doc_id, a.dl, count(*) AS ptf
      FROM a JOIN b ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 2 GROUP BY 1, 2),
s AS (SELECT (SELECT count(*) FROM d) AS n, (SELECT sum(dl) FROM d) AS total_len,
             count(*) AS df FROM m)
SELECT m.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * m.dl / (s.total_len / s.n))), 4) AS score
FROM m, s ORDER BY score DESC, m.doc_id LIMIT 10
""",
        # s70: span_within — little 'column' occurrences inside any
        # big span, deduped (count DISTINCT little positions)
        "s70_span_within": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
e AS (SELECT doc_id, dl, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM d),
a AS (SELECT doc_id, p FROM e WHERE t = 'sort'),
b AS (SELECT doc_id, p FROM e WHERE t = 'order'),
c AS (SELECT doc_id, dl, p FROM e WHERE t = 'column'),
m AS (SELECT c.doc_id, c.dl, count(DISTINCT c.p) AS ptf
      FROM c WHERE EXISTS (SELECT 1 FROM a JOIN b
                           ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 5
                           WHERE a.doc_id = c.doc_id AND c.p BETWEEN a.p AND b.p)
      GROUP BY 1, 2),
s AS (SELECT (SELECT count(*) FROM d) AS n, (SELECT sum(dl) FROM d) AS total_len,
             count(*) AS df FROM m)
SELECT m.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * m.dl / (s.total_len / s.n))), 4) AS score
FROM m, s ORDER BY score DESC, m.doc_id LIMIT 10
""",
        # s68: span_not — 'scan' occurrences with no 'slow'/'fast'
        # within +-2 positions in the same doc
        "s68_span_not": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
e AS (SELECT doc_id, dl, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM d),
a AS (SELECT doc_id, dl, p FROM e WHERE t = 'scan'),
x AS (SELECT doc_id, p FROM e WHERE t IN ('slow', 'fast')),
m AS (SELECT a.doc_id, a.dl, count(*) AS ptf FROM a
      WHERE NOT EXISTS (SELECT 1 FROM x
                        WHERE x.doc_id = a.doc_id AND abs(x.p - a.p) <= 2)
      GROUP BY 1, 2),
s AS (SELECT (SELECT count(*) FROM d) AS n, (SELECT sum(dl) FROM d) AS total_len,
             count(*) AS df FROM m)
SELECT m.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * m.dl / (s.total_len / s.n))), 4) AS score
FROM m, s ORDER BY score DESC, m.doc_id LIMIT 10
""",
        "s53_phrase_prefix": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
      len(list_filter(range(1, len(ts)), i -> ts[i] = 'hash' AND ts[i+1] LIKE 's%')) AS ptf
      FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len, count(*) FILTER (WHERE ptf > 0) AS df FROM d)
SELECT d.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))), 4) AS score
FROM d, s WHERE ptf > 0
ORDER BY score DESC, d.doc_id LIMIT 10
""",
        "s55_boosting": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, len(list_filter(ts, t -> t = 'vector')) AS tf0,
      len(list_filter(ts, t -> t = 'slow')) AS tfneg FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len, count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d)
SELECT d.doc_id, round(
    ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 /
    (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))
    * (CASE WHEN tfneg > 0 THEN 0.3 ELSE 1.0 END), 4) AS score
FROM d, s WHERE tf0 > 0
ORDER BY (ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 /
    (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))
    * (CASE WHEN tfneg > 0 THEN 0.3 ELSE 1.0 END)) DESC, d.doc_id LIMIT 10
""",
        "s54_unordered_near": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
e AS (SELECT doc_id, dl, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM d),
a AS (SELECT doc_id, dl, p FROM e WHERE t = 'hash'),
b AS (SELECT doc_id, p FROM e WHERE t = 'scan'),
m AS (SELECT a.doc_id, a.dl, count(*) AS ptf
      FROM a JOIN b ON a.doc_id = b.doc_id AND abs(b.p - a.p) BETWEEN 1 AND 3 GROUP BY 1, 2),
s AS (SELECT (SELECT count(*) FROM d) AS n, (SELECT sum(dl) FROM d) AS total_len,
             count(*) AS df FROM m)
SELECT m.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * m.dl / (s.total_len / s.n))), 4) AS score
FROM m, s ORDER BY score DESC, m.doc_id LIMIT 10
""",
        "s12_proximity": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
e AS (SELECT doc_id, dl, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM d),
a AS (SELECT doc_id, dl, p FROM e WHERE t = 'hash'),
b AS (SELECT doc_id, p FROM e WHERE t = 'scan'),
m AS (SELECT a.doc_id, a.dl, count(*) AS ptf
      FROM a JOIN b ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 3 GROUP BY 1, 2),
s AS (SELECT (SELECT count(*) FROM d) AS n, (SELECT sum(dl) FROM d) AS total_len,
             count(*) AS df FROM m)
SELECT m.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * ptf * 2.2 /
    (ptf + 1.2 * (1 - 0.75 + 0.75 * m.dl / (s.total_len / s.n))), 4) AS score
FROM m, s ORDER BY score DESC, m.doc_id LIMIT 10
""",
        "s13_synonyms": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
      len(list_filter(ts, t -> t IN ('big', 'fast'))) AS tf0,
      len(list_filter(ts, t -> t = 'big')) AS h1,
      len(list_filter(ts, t -> t = 'fast')) AS h2 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
      greatest(count(*) FILTER (WHERE h1 > 0), count(*) FILTER (WHERE h2 > 0)) AS df FROM d)
SELECT d.doc_id, round(
    ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * tf0 * 2.2 /
    (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))), 4) AS score
FROM d, s WHERE tf0 > 0
ORDER BY (ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5)) * tf0 * 2.2 /
    (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))) DESC, d.doc_id LIMIT 10
""",
        "s5_boost": _bm25_sql(
            ["vector"], boost_sql="CASE WHEN d.n_chars > 200 THEN 10 ELSE 0 END"
        ),
        "s7_normalizer": _bm25_sql(["vector"]),
        "s6_const_boost": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0,
             len(list_filter(ts, t -> t = 'slow')) AS tf1 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d)
SELECT d.doc_id, round(
  ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 /
    (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))
  + (CASE WHEN tf1 > 0 THEN 5 ELSE 0 END), 4) AS score
FROM d, s WHERE tf0 > 0
ORDER BY (ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 /
    (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))
  + (CASE WHEN tf1 > 0 THEN 5 ELSE 0 END)) DESC, d.doc_id LIMIT 10
""",
        "r13_count": (
            "SELECT count(*) AS total FROM lineitem "
            "WHERE l_quantity > 30 AND l_returnflag != 'N'"
        ),
        "r2_json_extract": (
            # COALESCE(..., -1): pin missing-key semantics to -1 on BOTH
            # sides (the Ray side fills .get("k", -1))
            "SELECT event_type, count(*) AS n, "
            "CAST(sum(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), -1)) AS BIGINT) AS sum_k, "
            "max(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), -1)) AS max_k "
            "FROM events GROUP BY 1"
        ),
        "pipe_listing_facets": (
            "SELECT source, count(*) AS cnt FROM documents "
            "WHERE lang IN ('en','de') GROUP BY 1"
        ),
        "r1_filter": (
            "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem "
            "WHERE l_quantity > 45 AND l_returnflag = 'R'"
        ),
        "r2_project": (
            "SELECT l_orderkey, l_linenumber, "
            "round(l_extendedprice * (1 - l_discount), 4) AS revenue FROM lineitem"
        ),
        "r3_join": (
            "SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment "
            "FROM orders JOIN customer ON o_custkey = c_custkey"
        ),
        "r5_semijoin": (
            "SELECT p_partkey, p_name FROM part "
            "WHERE p_partkey IN (SELECT l_partkey FROM lineitem)"
        ),
        "r7_group_first": (
            "SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
            "QUALIFY row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey ASC) = 1"
        ),
        "r8_group_sum": (
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_price, round(avg(l_discount), 2) AS avg_disc, "
            "count(*) AS cnt FROM lineitem GROUP BY 1, 2"
        ),
        "r10_explode": (
            "SELECT t AS token, count(*) AS cnt FROM (SELECT unnest("
            "regexp_extract_all(lower(text), '[a-z0-9_]+')) t FROM documents) GROUP BY 1"
        ),
        "r11_topk": (
            "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50"
        ),
        "r12_paginate": (
            "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20"
        ),
        "r15_distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "r16_facet_counts": "SELECT lang, count(*) AS cnt FROM documents GROUP BY 1",
        "e6_events_rollup": (
            "SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n, "
            "round(sum(value), 2) AS sum_value FROM events GROUP BY 1, 2"
        ),
        "r19_window_agg": (
            "SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start, "
            "event_type, count(*) AS n, round(sum(value), 2) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "r33_month_histogram": (
            "SELECT CAST(epoch_us(date_trunc('month', ts)) AS BIGINT) AS window_start, "
            "event_type, count(*) AS n, round(sum(value), 2) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "r32_cumulative": (
            "WITH w AS (SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start, "
            "event_type, count(*) AS n FROM events GROUP BY 1, 2) "
            "SELECT window_start, event_type, n, "
            "CAST(sum(n) OVER (PARTITION BY event_type ORDER BY window_start "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n FROM w"
        ),
        "r26_hopping_window": (
            # 1h windows every 15 min: 4 candidate starts per event,
            # keep the covering non-negative ones
            # floor() before the cast: epoch() is fractional seconds
            # and a bare BIGINT cast ROUNDS, while the engine truncates
            "WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep, event_type, value FROM events), "
            "x AS (SELECT (ep // 900) * 900 - i * 900 AS window_start, event_type, value "
            "      FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS i) "
            "      WHERE (ep // 900) * 900 - i * 900 >= 0 "
            "        AND ep < (ep // 900) * 900 - i * 900 + 3600) "
            "SELECT window_start, event_type, count(*) AS n, "
            "round(sum(value), 2) AS sum_value FROM x GROUP BY 1, 2"
        ),
        "r27_rollup": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(l_quantity) AS BIGINT) AS sum_qty "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "r28_pivot": (
            "SELECT CAST(user_id % 8 AS BIGINT) AS cohort, "
            "count(*) FILTER (WHERE event_type = 'click') AS click, "
            "count(*) FILTER (WHERE event_type = 'view') AS view, "
            "count(*) FILTER (WHERE event_type = 'purchase') AS purchase, "
            "count(*) FILTER (WHERE event_type = 'signup') AS signup, "
            "count(*) FILTER (WHERE event_type = 'error') AS error "
            "FROM events GROUP BY 1"
        ),
        "r30_window_funcs": (
            "SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts, "
            "round(value, 2) AS value, row_number() OVER w AS rn, "
            "rank() OVER w AS rnk, "
            "round(COALESCE(lag(value, 1) OVER w, -1.0), 2) AS prev_value "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "r20_asof_join": (
            "WITH clicks AS (SELECT user_id, ts, max(value) AS click_value "
            "FROM events WHERE event_type = 'click' GROUP BY user_id, ts), "
            "purchases AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'purchase') "
            "SELECT p.event_id, p.user_id, CAST(epoch_us(p.ts) AS BIGINT) AS pts, "
            "CAST(epoch_us(c.ts) AS BIGINT) AS click_ts, c.click_value "
            "FROM purchases p ASOF JOIN clicks c "
            "ON p.user_id = c.user_id AND p.ts >= c.ts"
        ),
        "r21_range_join": (
            "WITH bands AS (SELECT printf('band_%02d', i) AS band, i * 40.0 AS lo, "
            "i * 40.0 + 60.0 AS hi FROM range(13) t(i)) "
            "SELECT e.event_id, e.value, b.band, b.lo, b.hi "
            "FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi"
        ),
        "r22_hash_join": (
            "SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, "
            "o.o_custkey, o.o_orderstatus "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
        ),
        "r23_group_topn": (
            "SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice "
            "FROM lineitem QUALIFY row_number() OVER ("
            "PARTITION BY l_returnflag "
            "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) <= 3"
        ),
        "r25_bloom_join": (
            "SELECT l.l_orderkey, l.l_quantity, o.o_totalprice "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE o.o_totalprice > 450000.0"
        ),
        "r24_sessionize": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events), "
            "f AS (SELECT event_id, user_id, tsu, "
            "CASE WHEN lag(tsu) OVER w IS NULL OR tsu - lag(tsu) OVER w > 1800000000 "
            "THEN 1 ELSE 0 END AS flag FROM e "
            "WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)) "
            "SELECT event_id, user_id, tsu AS ts, "
            "CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY tsu, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq "
            "FROM f"
        ),
        "sketch_kmv": (
            # same KMV estimator: k smallest distinct md5-upper-64
            # hashes, (k-1)/U_(k); DuckDB round() is half-away like
            # the engine's round_half_up
            "WITH h AS (SELECT DISTINCT md5_number_upper(CAST(user_id AS VARCHAR)) AS hv "
            "FROM events), "
            "k AS (SELECT hv FROM h ORDER BY hv LIMIT 64), "
            "s AS (SELECT count(*) AS c, max(hv) AS kth FROM k) "
            "SELECT CASE WHEN c < 64 THEN CAST(c AS DOUBLE) "
            "ELSE round(63 / (CAST(kth AS DOUBLE) / 18446744073709551616.0), 4) END "
            "AS distinct_est FROM s"
        ),
        "sketch_hll": (
            # the same HLL estimate rebuilt in SQL: register = top 6
            # md5 bits, rho = leading zeros of the low 58 bits + 1,
            # harmonic sum as the exact integer sum(2^(59-mx)) so the
            # float division happens once, order-independently;
            # linear-counting branch when raw <= 2.5m with empty regs
            "WITH h AS (SELECT md5_number_upper(CAST(user_id AS VARCHAR)) AS hv FROM events), "
            "r AS (SELECT CAST(hv >> 58 AS BIGINT) AS reg, "
            "hv & ((1::UBIGINT << 58) - 1) AS low FROM h), "
            "rho AS (SELECT reg, CAST(length(regexp_extract(lpad(bin(low), 58, '0'), '^0*')) "
            "+ 1 AS BIGINT) AS rho FROM r), "
            "regs AS (SELECT reg, max(rho) AS mx FROM rho GROUP BY reg), "
            "allr AS (SELECT g.range AS reg, COALESCE(mx, 0) AS mx "
            "FROM range(64) g LEFT JOIN regs ON regs.reg = g.range), "
            "e AS (SELECT sum(1::HUGEINT << (59 - mx)) AS s_int, "
            "count(*) FILTER (WHERE mx = 0) AS zeros FROM allr) "
            "SELECT round(CASE WHEN (0.709 * 4096.0) * 576460752303423488.0 "
            "/ CAST(s_int AS DOUBLE) <= 160.0 AND zeros > 0 "
            "THEN 64.0 * ln(64.0 / zeros) "
            "ELSE (0.709 * 4096.0) * 576460752303423488.0 / CAST(s_int AS DOUBLE) END, 4) "
            "AS distinct_est FROM e"
        ),
        # e15: BM25 over the post-merge corpus (doc_id % 10 pruned)
        "e15_force_merge": _bm25_sql(
            ["vector"],
            table_sql="(SELECT * FROM documents WHERE doc_id % 10 <> 0)",
        ),
        "r46_weighted_avg": (
            "SELECT l_returnflag, round(sum(l_extendedprice * l_quantity) "
            "/ sum(l_quantity), 4) AS weighted_avg_price "
            "FROM lineitem GROUP BY 1 ORDER BY 1"
        ),
        # e17: dictionary size == analyzed distinct tokens, total_len
        # == analyzed token count — the build-integrity oracle
        "e17_index_stats": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
v AS (SELECT count(DISTINCT t) AS vocab
      FROM (SELECT unnest(ts) AS t FROM d))
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_docs,
       CAST(v.vocab AS BIGINT) AS text_vocab,
       CAST((SELECT sum(dl) FROM d) AS BIGINT) AS text_total_len,
       round((SELECT sum(dl) FROM d) /
             CAST((SELECT count(*) FROM d) AS DOUBLE), 4) AS avgdl
FROM v
""",
        # e16: last-writer-wins replay, deletes drop the key
        "e16_cdc_replay": """
WITH ops AS (SELECT user_id, ts, event_id,
  CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op,
  value FROM events),
last AS (SELECT * FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn FROM ops) WHERE rn = 1)
SELECT user_id, op, round(value, 4) AS value FROM last
WHERE op <> 'D' ORDER BY user_id
""",
        # r45: sketch_hll per event_type — registers keyed by group
        "r45_grouped_hll": """
WITH h AS (SELECT event_type,
           md5_number_upper(CAST(user_id AS VARCHAR)) AS hv FROM events),
r AS (SELECT event_type, CAST(hv >> 58 AS BIGINT) AS reg,
             hv & ((1::UBIGINT << 58) - 1) AS low FROM h),
rho AS (SELECT event_type, reg,
        CAST(length(regexp_extract(lpad(bin(low), 58, '0'), '^0*')) + 1 AS BIGINT) AS rho
        FROM r),
regs AS (SELECT event_type, reg, max(rho) AS mx FROM rho GROUP BY 1, 2),
ks AS (SELECT DISTINCT event_type FROM events),
allr AS (SELECT ks.event_type, g.range AS reg, COALESCE(mx, 0) AS mx
         FROM ks CROSS JOIN range(64) g
         LEFT JOIN regs ON regs.event_type = ks.event_type AND regs.reg = g.range),
e AS (SELECT event_type, sum(1::HUGEINT << (59 - mx)) AS s_int,
             count(*) FILTER (WHERE mx = 0) AS zeros FROM allr GROUP BY 1)
SELECT event_type, round(CASE WHEN (0.709 * 4096.0) * 576460752303423488.0
                   / CAST(s_int AS DOUBLE) <= 160.0 AND zeros > 0
             THEN 64.0 * ln(64.0 / zeros)
             ELSE (0.709 * 4096.0) * 576460752303423488.0 / CAST(s_int AS DOUBLE) END, 4)
       AS distinct_est
FROM e ORDER BY event_type
""",
        "r37_moving_avg": (
            "WITH m AS (SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS window_start, "
            "count(*) AS n FROM events GROUP BY 1) "
            "SELECT window_start, n, "
            "round(((lag(CAST(n AS DOUBLE), 2) OVER w + lag(CAST(n AS DOUBLE), 1) OVER w) "
            "+ CAST(n AS DOUBLE)) / 3.0, 4) AS mavg3, "
            "n - lag(n, 2) OVER w AS sdiff2 "
            "FROM m WINDOW w AS (ORDER BY window_start) "
            "QUALIFY lag(n, 2) OVER w IS NOT NULL ORDER BY window_start"
        ),
        "r38_extended_stats": (
            # ES's naive var_pop form sq/n - avg*avg, same op order as
            # the engine; l_quantity is integer-valued so the moment
            # sums are float64-exact on both sides
            "WITH p AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
            "sum(CAST(l_quantity AS DOUBLE)) AS s, "
            "sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS sq "
            "FROM lineitem GROUP BY 1) "
            "SELECT l_returnflag, n, round(s, 4) AS sum_v, round(s / n, 4) AS avg_v, "
            "round(sq / n - (s / n) * (s / n), 4) AS var_v, "
            "round(sqrt(greatest(sq / n - (s / n) * (s / n), 0.0)), 4) AS std_v, "
            "round(s / n + 2.0 * sqrt(greatest(sq / n - (s / n) * (s / n), 0.0)), 4) AS upper_sd, "
            "round(s / n - 2.0 * sqrt(greatest(sq / n - (s / n) * (s / n), 0.0)), 4) AS lower_sd "
            "FROM p ORDER BY l_returnflag"
        ),
        "r41_outer_join": (
            "SELECT c.c_custkey, c.c_mktsegment, "
            "CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders "
            "FROM customer c LEFT JOIN (SELECT o_custkey, count(*) AS n_orders "
            "FROM orders GROUP BY 1) o ON c.c_custkey = o.o_custkey "
            "ORDER BY c.c_custkey"
        ),
        # r42: the ladder walk replayed — finest unit whose distinct
        # trunc count fits target 20 (week at 30-day events data);
        # a wrong engine choice yields different bucket keys
        "r42_auto_histogram": """
WITH n AS (
  SELECT (SELECT count(DISTINCT date_trunc('year', ts)) FROM events) AS y,
         (SELECT count(DISTINCT date_trunc('quarter', ts)) FROM events) AS q,
         (SELECT count(DISTINCT date_trunc('month', ts)) FROM events) AS m,
         (SELECT count(DISTINCT date_trunc('week', ts)) FROM events) AS w,
         (SELECT count(DISTINCT date_trunc('day', ts)) FROM events) AS d),
u AS (SELECT CASE WHEN d <= 20 THEN 'day' WHEN w <= 20 THEN 'week'
                  WHEN m <= 20 THEN 'month' WHEN q <= 20 THEN 'quarter'
                  ELSE 'year' END AS unit FROM n)
SELECT u.unit AS interval,
       CAST(epoch_us(date_trunc(u.unit, ts)) AS BIGINT) AS window_start,
       CAST(count(*) AS BIGINT) AS n
FROM events, u GROUP BY 1, 2 ORDER BY 2
""",
        "pipe_tpch_q1": """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 4) AS sum_qty,
  round(sum(l_extendedprice), 4) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
  round(sum(l_quantity) / count(*), 4) AS avg_qty,
  round(sum(l_extendedprice) / count(*), 4) AS avg_price,
  round(sum(l_discount) / count(*), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus
""",
        "pipe_tpch_q3": """
SELECT l.l_orderkey,
  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS revenue,
  CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 4) DESC, l.l_orderkey
LIMIT 10
""",
        "pipe_tpch_q5": """
SELECT n.n_name,
  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 4) DESC, n.n_name
""",
        "r44_retention": """
WITH e AS (SELECT user_id, date_trunc('week', ts) AS per FROM events),
c AS (SELECT user_id, min(per) AS cohort FROM e GROUP BY 1),
d AS (SELECT DISTINCT e.user_id, c.cohort, e.per FROM e JOIN c USING (user_id))
SELECT CAST(epoch_us(cohort) AS BIGINT) AS cohort_start,
       CAST(date_diff('week', cohort, per) AS BIGINT) AS period_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM d GROUP BY 1, 2 ORDER BY 1, 2
""",
        # r43: the greedy-earliest chain as correlated min() CTEs
        "r43_funnel": """
WITH t1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1),
t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN t1 ON e.user_id = t1.user_id
       WHERE e.event_type = 'click' AND e.ts > t1.t
         AND e.ts <= t1.t + INTERVAL 2 HOUR GROUP BY 1),
t3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN t2 ON e.user_id = t2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > t2.t
         AND e.ts <= t2.t + INTERVAL 2 HOUR GROUP BY 1)
SELECT * FROM (
  SELECT 1::BIGINT AS step, 'view' AS event_type,
         (SELECT count(*) FROM t1)::BIGINT AS n_users
  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM t2)
  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM t3)
) ORDER BY step
""",
        "pipe_tpch_q6": (
            "SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0"
        ),
        # r39/r40: coords derived per customer from md5 doubles; the
        # haversine is written term-for-term in the engine's op order
        # (raw-distance filter, round only at the output edge)
        "r39_geo_radius": """
WITH c AS (SELECT c_custkey,
  (CAST(md5_number_upper(CAST(c_custkey AS VARCHAR)) AS DOUBLE)
   / 18446744073709551616.0) * 180.0 - 90.0 AS lat,
  (CAST(md5_number_upper(CAST(c_custkey AS VARCHAR) || ':lon') AS DOUBLE)
   / 18446744073709551616.0) * 360.0 - 180.0 AS lon
 FROM customer),
d AS (SELECT c_custkey, 2.0 * 6371.0 * asin(sqrt(
   sin(radians(10.0 - lat) / 2.0) * sin(radians(10.0 - lat) / 2.0) +
   cos(radians(lat)) * cos(radians(10.0)) *
   sin(radians(20.0 - lon) / 2.0) * sin(radians(20.0 - lon) / 2.0))) AS dkm
 FROM c)
SELECT c_custkey, round(dkm, 4) AS distance_km FROM d
WHERE dkm <= 3000.0 ORDER BY round(dkm, 4), c_custkey LIMIT 20
""",
        "r40_geo_grid": """
WITH c AS (SELECT
  (CAST(md5_number_upper(CAST(c_custkey AS VARCHAR)) AS DOUBLE)
   / 18446744073709551616.0) * 180.0 - 90.0 AS lat,
  (CAST(md5_number_upper(CAST(c_custkey AS VARCHAR) || ':lon') AS DOUBLE)
   / 18446744073709551616.0) * 360.0 - 180.0 AS lon
 FROM customer)
SELECT CAST(floor(lat / 30.0) AS BIGINT) AS cell_lat,
       CAST(floor(lon / 30.0) AS BIGINT) AS cell_lon,
       CAST(count(*) AS BIGINT) AS n
FROM c GROUP BY 1, 2 ORDER BY 1, 2
""",
        "sketch_cm": (
            # the exact count-min estimate rebuilt in SQL: cell sums
            # per (row, md5(r:value) % width), min over rows per query
            "WITH rows_ AS (SELECT unnest(range(4)) AS r), "
            "cells AS (SELECT r, md5_number_upper(CAST(r AS VARCHAR) || ':' || "
            "CAST(user_id AS VARCHAR)) % 1024 AS cell, CAST(count(*) AS BIGINT) AS c "
            "FROM events CROSS JOIN rows_ GROUP BY 1, 2), "
            "qs AS (SELECT unnest(range(10)) AS user_id), "
            "probe AS (SELECT user_id, r, md5_number_upper(CAST(r AS VARCHAR) || ':' || "
            "CAST(user_id AS VARCHAR)) % 1024 AS cell FROM qs CROSS JOIN rows_) "
            "SELECT CAST(p.user_id AS BIGINT) AS user_id, "
            "CAST(min(COALESCE(c, 0)) AS BIGINT) AS est "
            "FROM probe p LEFT JOIN cells USING (r, cell) GROUP BY 1"
        ),
        "sketch_quantiles": (
            "SELECT CAST(0.25 AS DOUBLE) AS q, quantile_disc(l_quantity, 0.25) AS value FROM lineitem "
            "UNION ALL SELECT 0.5, quantile_disc(l_quantity, 0.5) FROM lineitem "
            "UNION ALL SELECT 0.75, quantile_disc(l_quantity, 0.75) FROM lineitem"
        ),
        # s38 percentile_ranks: 100.0 * cnt / n left-assoc both sides
        "s38_percentile_ranks": (
            "SELECT unnest([CAST(10.0 AS DOUBLE), 25.0, 40.0]) AS value, "
            "unnest([round(100.0 * (count(*) FILTER (WHERE l_quantity <= 10.0)) / count(*), 4), "
            "round(100.0 * (count(*) FILTER (WHERE l_quantity <= 25.0)) / count(*), 4), "
            "round(100.0 * (count(*) FILTER (WHERE l_quantity <= 40.0)) / count(*), 4)]) AS pct "
            "FROM lineitem"
        ),
        "s39_composite": f"""
WITH tok AS (SELECT doc_id, n_chars, {toks} AS ts FROM documents),
d AS (SELECT doc_id, n_chars, len(list_filter(ts, t -> t = 'data')) AS tf0 FROM tok)
SELECT n_chars, count(*) AS doc_count FROM d
WHERE tf0 > 0 AND n_chars > 250
GROUP BY n_chars ORDER BY n_chars LIMIT 8
""",
        "s40_top_hits": f"""
WITH tok AS (SELECT doc_id, lang, {toks} AS ts FROM documents),
d AS (SELECT doc_id, lang, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'window')) AS tf0 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d),
scored AS (
  SELECT d.doc_id, d.lang,
         ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 /
         (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) AS raw
  FROM d, s WHERE tf0 > 0)
SELECT lang, doc_id, round(raw, 4) AS score FROM scored
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY raw DESC, doc_id) <= 2
""",
        "s41_scroll": _bm25_sql(["merge"], k=1000000000),
        "s43_classic": _sim_sql(["hash", "join"], [], "classic"),
        "s44_lm_dirichlet": _sim_sql(["vector"], ["slow"], "lm_dirichlet"),
        "s45_boolean": _sim_sql([], ["spark", "window"], "boolean", msm=1),
        "s50_dfr": _sim_sql(["hash", "join"], [], "dfr"),
        # e12: the same processor chain as SQL transforms; trim chars
        # mirror Arrow utf8_trim_whitespace on the ASCII corpus
        "e12_ingest": (
            "SELECT doc_id, "
            "trim(regexp_replace(text, '[aeiou]', '', 'g'), "
            "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) AS text, "
            "upper(source) AS src_raw, 'v1' AS pipeline, "
            "CAST(n_chars AS DOUBLE) AS n_chars, lang AS language "
            "FROM documents"
        ),
        # percolator: one SELECT per stored query over the SAME plain
        # analyzer as the ops ring; has(t) == token presence
        "s46_percolate": f"""
WITH tok AS (SELECT doc_id, {plain_toks} AS ts FROM documents)
SELECT 'q_vector' AS query_id, doc_id FROM tok
  WHERE len(list_filter(ts, t -> t = 'vector')) > 0
UNION ALL SELECT 'q_hash_join', doc_id FROM tok
  WHERE len(list_filter(ts, t -> t = 'hash')) > 0
    AND len(list_filter(ts, t -> t = 'join')) > 0
UNION ALL SELECT 'q_spark_or_window', doc_id FROM tok
  WHERE len(list_filter(ts, t -> t = 'spark')) > 0
     OR len(list_filter(ts, t -> t = 'window')) > 0
UNION ALL SELECT 'q_vector_not_slow', doc_id FROM tok
  WHERE len(list_filter(ts, t -> t = 'vector')) > 0
    AND len(list_filter(ts, t -> t = 'slow')) = 0
UNION ALL SELECT 'q_cust_prefix', doc_id FROM tok
  WHERE len(list_filter(ts, t -> t LIKE 'cust%')) > 0
UNION ALL SELECT 'q_syn', doc_id FROM tok
  WHERE len(list_filter(ts, t -> t = 'vector' OR t = 'matrix')) > 0
""",
        "s47_filters": _filters_sql,
        "s48_adjacency": _adj_sql,
        "s49_stemmed": _stemmed_sql,
        "s52_rank_eval": _rank_eval_union,
        "t_quality_clf": _clf_sql(),
        # e13: the restored index must serve the exact s1 result set
        "e13_snapshot": _bm25_sql(
            ["vector"], table_sql="(SELECT * FROM documents WHERE doc_id % 10 = 0)"
        ),
        "r34_histogram": (
            "SELECT floor(l_extendedprice / 500.0) * 500.0 AS bucket, "
            "count(*) AS n, min(l_quantity) AS min_q, max(l_quantity) AS max_q "
            "FROM lineitem GROUP BY bucket"
        ),
        # repeated-8-gram removal: token t is removed iff some
        # non-owner dup n-gram starts in [t-7, t]; string_agg ORDER BY
        # t rebuilds the surviving token stream
        "t_strip_dup_ngrams": f"""
WITH {_BOTH_DOCS_SQL},
tok AS (SELECT doc_id, {plain_toks} AS ts FROM both_docs),
pos AS (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 7)) AS p FROM tok),
ng AS (SELECT doc_id, p, array_to_string(ts[p : p + 7], ' ') AS g8 FROM pos),
cnt AS (SELECT g8, count(*) AS c, min(doc_id) AS owner FROM ng GROUP BY g8),
starts AS (SELECT ng.doc_id, ng.p FROM ng JOIN cnt USING (g8)
           WHERE c >= 2 AND owner <> ng.doc_id),
tp AS (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS t FROM tok),
rm AS (SELECT tp.doc_id, tp.t, ts[tp.t] AS tokstr,
       EXISTS (SELECT 1 FROM starts st WHERE st.doc_id = tp.doc_id
               AND st.p BETWEEN tp.t - 7 AND tp.t) AS r FROM tp),
agg AS (SELECT doc_id,
        coalesce(string_agg(CASE WHEN NOT r THEN tokstr END, ' ' ORDER BY t), '') AS clean_text,
        CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(count(*) FILTER (WHERE r) AS BIGINT) AS n_removed
        FROM rm GROUP BY doc_id)
SELECT tok.doc_id, coalesce(agg.clean_text, '') AS clean_text,
       CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(agg.n_removed, 0) AS BIGINT) AS n_removed
FROM tok LEFT JOIN agg USING (doc_id)
""",
        # 8-gram strings stand in for the Ray side's 64-bit rolling
        # hashes (collision-free at oracle scale); generate_series
        # yields no rows for docs shorter than 8 tokens
        "t_dup_ngrams": f"""
WITH {_BOTH_DOCS_SQL},
tok AS (SELECT doc_id, {plain_toks} AS ts FROM both_docs),
pos AS (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 7)) AS g FROM tok),
ng AS (SELECT doc_id, array_to_string(ts[g : g + 7], ' ') AS g8 FROM pos),
cnt AS (SELECT g8, count(*) AS c FROM ng GROUP BY g8),
dup AS (SELECT ng.doc_id, count(*) AS nd FROM ng JOIN cnt USING (g8)
        WHERE c >= 2 GROUP BY ng.doc_id)
SELECT tok.doc_id,
       CAST(greatest(len(ts) - 7, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(dup.nd, 0) AS BIGINT) AS n_dup_ngrams
FROM tok LEFT JOIN dup USING (doc_id)
""",
        "s42_termvectors": f"""
WITH tgt AS (SELECT {toks} AS ts FROM documents WHERE doc_id = 7),
tv AS (SELECT unnest(ts) AS term FROM tgt),
tf AS (SELECT term, count(*) AS tf FROM tv GROUP BY term),
docs AS (SELECT doc_id, {toks} AS ts FROM documents),
df AS (SELECT tf.term, count(DISTINCT d.doc_id) AS df
       FROM tf JOIN docs d ON list_contains(d.ts, tf.term) GROUP BY tf.term)
SELECT tf.term, tf.tf, coalesce(df.df, 0) AS df FROM tf LEFT JOIN df USING (term)
""",
        # sampled quantiles: 0.25 rate -> threshold 2^62 exactly
        "sketch_quantiles_sampled": (
            "WITH s AS (SELECT l_extendedprice FROM lineitem "
            "WHERE md5_number_upper(CAST(l_orderkey AS VARCHAR)) < 4611686018427387904) "
            "SELECT CAST(0.25 AS DOUBLE) AS q, quantile_disc(l_extendedprice, 0.25) AS value FROM s "
            "UNION ALL SELECT 0.5, quantile_disc(l_extendedprice, 0.5) FROM s "
            "UNION ALL SELECT 0.75, quantile_disc(l_extendedprice, 0.75) FROM s"
        ),
        "e9_json_roundtrip": (
            "SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY 1"
        ),
        # r31 matrix_stats: population moments; engine computes from
        # raw sums (Σxx/n - mean²) — equal to covar_pop/var_pop at the
        # 4-dp rounding
        "r31_matrix_stats": (
            "WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
            "avg(l_quantity) AS mx, avg(l_discount) AS my, "
            "var_pop(l_quantity) AS vx, var_pop(l_discount) AS vy, "
            "covar_pop(l_quantity, l_discount) AS cov, "
            "corr(l_quantity, l_discount) AS c FROM lineitem) "
            "SELECT unnest(['count','mean_x','mean_y','var_x','var_y','covar','corr']) AS stat, "
            "unnest([round(n,4), round(mx,4), round(my,4), round(vx,4), "
            "round(vy,4), round(cov,4), round(c,4)]) AS value FROM s"
        ),
        "r29_grouped_quantiles": (
            "SELECT l_returnflag, unnest([CAST(0.25 AS DOUBLE), 0.5, 0.75]) AS q, "
            "unnest([quantile_disc(l_quantity, 0.25), quantile_disc(l_quantity, 0.5), "
            "quantile_disc(l_quantity, 0.75)]) AS value "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "t_pack_sequences": _pack_sql,
        "t_shuffle_export": (
            "WITH h AS (SELECT doc_id, md5_number_upper(CAST(doc_id AS VARCHAR)) AS hv "
            "FROM documents) "
            "SELECT doc_id, CAST(row_number() OVER (ORDER BY hv % 32, hv, doc_id) - 1 "
            "AS BIGINT) AS shuffle_rank FROM h ORDER BY doc_id"
        ),
        "e1_csv_source": (
            # CAST .. BIGINT: DuckDB sum(BIGINT) yields HUGEINT, which
            # hash-mismatches the Ray int64 even when values agree
            "SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY 1"
        ),
        "e7_tags": (
            "WITH t AS (SELECT doc_id, lang, "
            "(regexp_extract_all(lower(text), '[a-z0-9_]+'))[1:3] AS tags FROM documents), "
            "p AS (SELECT doc_id, CASE WHEN lang = 'en' THEN list_append(tags, 'xx') "
            "ELSE tags END AS tags FROM t) "
            "SELECT doc_id, array_to_string(list_filter(tags, x -> x != 'data'), ' ') AS tags FROM p"
        ),
        "t_token_stats": (
            "SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tokens, "
            "len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+'))) AS n_uniq_tokens, "
            "md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9_]+'), ' ')) AS fingerprint "
            "FROM documents"
        ),
        "t_quality": _quality_sql_for("documents"),
        # corpus card: every metric recomputed independently; the
        # engine's tokenizer and quality/rounding formulas are the
        # oracle-pinned ones
        "pipe_corpus_report": f"""
WITH q AS ({_quality_sql_for("documents")}),
tok AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS nt
        FROM documents),
base AS (SELECT count(*) AS n FROM documents),
dig AS (SELECT count(DISTINCT md5(coalesce(text, ''))) AS d FROM documents)
SELECT 'docs' AS metric, lang AS key, count(*)::DOUBLE AS value
FROM documents GROUP BY lang
UNION ALL SELECT 'docs', 'all', n::DOUBLE FROM base
UNION ALL SELECT 'tokens', 'all', (SELECT sum(nt) FROM tok)::DOUBLE
UNION ALL SELECT 'avg_tokens', 'all',
          round((SELECT sum(nt) FROM tok)::DOUBLE / n, 4) FROM base
UNION ALL SELECT 'mean_quality', 'all',
          round((SELECT sum(quality) FROM q) / n, 4) FROM base
UNION ALL SELECT 'distinct_texts', 'all', d::DOUBLE FROM dig
UNION ALL SELECT 'dup_excess', 'all',
          (SELECT n FROM base) - d FROM dig
""",
        "t_bpe_tokens": _bpe_tokens_sql,
        # t_dsir: hashed-unigram bucket LMs — bucket = md5_number_upper
        # (first 8 md5 bytes LE, the engine's exact token hash) % 4096;
        # smoothed probs (c+1)/(n+4096), per-doc sum of log ratios,
        # deterministic top-100 keep on (rounded weight desc, doc_id)
        "t_dsir": f"""
WITH tok AS (SELECT doc_id, unnest({plain_toks}) AS tk FROM documents),
bk AS (SELECT doc_id, CAST(md5_number_upper(tk) % 4096 AS BIGINT) AS b FROM tok),
tc AS (SELECT b, count(*) AS c FROM bk JOIN documents USING (doc_id)
       WHERE lang = 'en' GROUP BY 1),
tn AS (SELECT count(*) AS n FROM bk JOIN documents USING (doc_id) WHERE lang = 'en'),
rc AS (SELECT b, count(*) AS c FROM bk GROUP BY 1),
rn AS (SELECT count(*) AS n FROM bk),
lr AS (SELECT r.b,
              ln((coalesce(t.c, 0) + 1.0) / (tn.n + 4096.0))
            - ln((r.c + 1.0) / (rn.n + 4096.0)) AS lr
       FROM rc r LEFT JOIN tc t USING (b), tn, rn),
w AS (SELECT d.doc_id, round(coalesce(sum(lr.lr), 0), 4) AS dsir_logw
      FROM documents d LEFT JOIN bk ON bk.doc_id = d.doc_id
      LEFT JOIN lr ON lr.b = bk.b GROUP BY 1)
SELECT doc_id, dsir_logw,
       CAST(row_number() OVER (ORDER BY dsir_logw DESC, doc_id) <= 100 AS BIGINT)
       AS selected
FROM w
""",
        # t_bigram_lm: interpolated bigram LM replayed token-by-token —
        # continuation tokens score -ln(lam*(cb/c_prev) + (1-lam)*(cu/N)),
        # doc-first tokens -ln(cu/N); (1-lam) is embedded as the exact
        # Python double 1.0-0.7 so the float math matches bit-for-bit
        "t_bigram_lm": f"""
WITH tok AS (SELECT doc_id, unnest({plain_toks}) AS tk,
                    unnest(range(1, len({plain_toks}) + 1)) AS pos
             FROM documents),
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
FROM documents d LEFT JOIN lp USING (doc_id)
GROUP BY 1
""",
        "t_unigram_lp": f"""
WITH tok AS (SELECT doc_id, unnest({plain_toks}) AS tk FROM documents),
cnt AS (SELECT tk, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT count(*) AS n FROM tok),
per AS (SELECT t.doc_id, sum(-ln(c::DOUBLE / n)) AS s, count(*) AS m
        FROM tok t JOIN cnt USING (tk), tot GROUP BY 1)
SELECT d.doc_id, round(COALESCE(per.s / per.m, 0), 4) AS neg_logprob
FROM documents d LEFT JOIN per USING (doc_id)
""",
        "t_decontaminate": f"""
WITH tok AS (SELECT doc_id, {plain_toks} AS ts FROM documents),
sh AS (SELECT doc_id,
       CASE WHEN len(ts) >= 3 THEN
         list_distinct(list_transform(range(1, len(ts) - 1),
                                      j -> ts[j] || ' ' || ts[j+1] || ' ' || ts[j+2]))
            WHEN len(ts) > 0 THEN [array_to_string(ts, ' ')]
            ELSE [] END AS shingles
       FROM tok),
e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
ev AS (SELECT DISTINCT s FROM e WHERE doc_id % 97 = 0)
SELECT d.doc_id,
       CAST(d.doc_id IN (SELECT DISTINCT doc_id FROM e JOIN ev USING (s)) AS BIGINT)
       AS contaminated
FROM documents d
""",
        "t_pii_clean": _pii_clean_sql,
        "t_line_dedup": """
WITH planted AS (
  SELECT doc_id, coalesce(text, '')
    || CASE WHEN doc_id % 3 = 0
       THEN chr(10) || '=== footer: shared boilerplate v1 ===' ELSE '' END
    || CASE WHEN doc_id % 5 = 0
       THEN chr(10) || 'subscribe to our newsletter' ELSE '' END AS text
  FROM documents),
L AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1) AS idx
      FROM planted),
dup AS (SELECT line FROM L WHERE line <> '' GROUP BY line HAVING count(*) >= 2),
agg AS (
  SELECT doc_id, count(*) AS n_lines,
         count(*) FILTER (WHERE line IN (SELECT line FROM dup)) AS n_removed,
         string_agg(CASE WHEN line = '' OR line NOT IN (SELECT line FROM dup)
                         THEN line END, chr(10) ORDER BY idx) AS clean_text
  FROM L GROUP BY doc_id)
SELECT p.doc_id, coalesce(a.clean_text, '') AS clean_text, a.n_lines, a.n_removed
FROM planted p JOIN agg a USING (doc_id)
""",
        "t_repetition": f"""
WITH lines AS (SELECT doc_id, str_split(coalesce(text, ''), chr(10)) AS ls FROM documents),
tok AS (SELECT doc_id, {plain_toks} AS ts FROM documents),
bg AS (SELECT doc_id, len(ts) AS n_tok,
       unnest(list_transform(range(1, len(ts)), j -> ts[j] || ' ' || ts[j+1])) AS b
       FROM tok),
cnt AS (SELECT doc_id, n_tok, b, count(*) AS c FROM bg GROUP BY 1, 2, 3),
mx AS (SELECT doc_id, max(c) AS mc, any_value(n_tok) AS n_tok FROM cnt GROUP BY 1)
SELECT l.doc_id,
  round(1 - len(list_distinct(l.ls))::DOUBLE / len(l.ls), 4) AS dup_line_frac,
  round(COALESCE(2.0 * mx.mc / mx.n_tok, 0), 4) AS top_bigram_frac
FROM lines l LEFT JOIN mx USING (doc_id)
""",
        "s14_snippet": f"""
WITH tok AS (SELECT doc_id, {plain_toks} AS ts FROM documents),
m AS (SELECT doc_id, ts, list_position(ts, 'vector') AS ix FROM tok)
SELECT doc_id, CAST(ix AS BIGINT) AS first_pos,
       array_to_string(ts[greatest(ix-2,1):least(ix+2,len(ts))], ' ') AS snippet
FROM m WHERE ix > 0
""",
        "pipe_curation": curation_sql,
        "t_hash_sample": (
            # deterministic hash sampling at rate 0.25: threshold is
            # exactly 2^62, md5_number_upper = first 8 md5 bytes LE
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) < 4611686018427387904"
        ),
        "t_strat_sample": (
            # thresholds: 1.0 -> 2^64-1 (the engine clamps), 0.5 ->
            # 2^63, default 0.25 -> 2^62
            "SELECT doc_id, lang FROM documents "
            "WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) < CASE lang "
            "WHEN 'en' THEN 18446744073709551615 "
            "WHEN 'de' THEN 9223372036854775808 "
            "ELSE 4611686018427387904 END"
        ),
        "t_top_terms": (
            "SELECT t AS token, count(*) AS cnt FROM (SELECT unnest("
            "regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t FROM documents) "
            "GROUP BY t ORDER BY cnt DESC, token LIMIT 20"
        ),
        # t_collocations: PMI over the pair distribution — marginals
        # are pair-count sums, ranking on the raw ln, round at output
        "t_collocations": """
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
             FROM documents),
e AS (SELECT doc_id, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM tok),
pr AS (SELECT a.t AS a, b.t AS b FROM e a
       JOIN e b ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 2),
c AS (SELECT a, b, count(*) AS c_ab FROM pr GROUP BY 1, 2),
tot AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS T FROM c),
l AS (SELECT a AS t, sum(c_ab) AS cl FROM c GROUP BY 1),
r AS (SELECT b AS t, sum(c_ab) AS cr FROM c GROUP BY 1),
s AS (SELECT c.a, c.b, c.c_ab,
      ln(CAST(c.c_ab AS DOUBLE) * tot.T /
         (CAST(l.cl AS DOUBLE) * CAST(r.cr AS DOUBLE))) AS praw
      FROM c, tot
      JOIN l ON l.t = c.a JOIN r ON r.t = c.b WHERE c.c_ab >= 5)
SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab, round(praw, 4) AS pmi
FROM s ORDER BY praw DESC, a, b LIMIT 20
""",
        # t_keywords: per-doc top-3 tf-idf tokens; raw-score ranking
        # (round only on output), ties by token asc — same op order
        # as the engine (tf * ln(N/df), N = all document rows)
        "t_keywords": """
WITH e AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
           FROM documents),
tf AS (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf FROM e GROUP BY 1, 2),
df AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM e GROUP BY 1),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
sc AS (SELECT tf.doc_id, tf.t, tf.tf * ln(nn.n / df.df) AS s,
       row_number() OVER (PARTITION BY tf.doc_id
                          ORDER BY tf.tf * ln(nn.n / df.df) DESC, tf.t) AS rnk
       FROM tf JOIN df USING (t), nn)
SELECT doc_id, t AS token, rnk, round(s, 4) AS tfidf
FROM sc WHERE rnk <= 3 ORDER BY doc_id, rnk
""",
        # t_mix_budget: rate_s = min(1, budget_s/total_tokens_s) as a
        # DOUBLE division, threshold = min(int(rate*2^64), 2^64-1) —
        # the engine's exact clamp, floor == int() truncation for
        # positive doubles
        "t_mix_budget": """
WITH tok AS (SELECT doc_id, source,
                    len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS toks
             FROM documents),
tot AS (SELECT source, sum(toks) AS toks FROM tok GROUP BY 1),
r AS (SELECT source,
             least(1.0, CAST(CASE source WHEN 'src0' THEN 500
                                         WHEN 'src1' THEN 300
                                         WHEN 'src2' THEN 10000000 END AS DOUBLE)
                        / CAST(toks AS DOUBLE)) AS rate
      FROM tot WHERE source IN ('src0', 'src1', 'src2') AND toks > 0)
SELECT d.doc_id, d.source
FROM documents d JOIN r USING (source)
WHERE CAST(md5_number_upper(CAST(d.doc_id AS VARCHAR)) AS HUGEINT)
      < least(CAST(floor(r.rate * 18446744073709551616.0) AS HUGEINT),
              CAST(18446744073709551615 AS HUGEINT))
""",
        # t_normalize: accent synthesis + NFKD/strip/lower/ws-squash;
        # DuckDB strip_accents(nfc_normalize) == Arrow NFKD + \\p{Mn}
        # strip for Latin inputs
        "t_normalize": r"""
SELECT doc_id,
       trim(regexp_replace(lower(strip_accents(nfc_normalize(
            replace(replace(replace(text, 'a', 'á'), 'e', 'è'), ' t', chr(9) || 't')
       ))), '\s+', ' ', 'g')) AS norm
FROM documents
""",
        # t_chunk: 40-token windows every 20; DuckDB list slice is
        # 1-based inclusive; zero-token docs emit no chunks
        "t_chunk": """
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
             FROM documents),
n AS (SELECT doc_id, ts, len(ts) AS n FROM tok WHERE len(ts) > 0),
c AS (SELECT doc_id, ts, n,
             unnest(range(0, CASE WHEN n <= 40 THEN 1
                                  ELSE CAST(ceil((n - 40) / 20.0) AS BIGINT) + 1 END)) AS ci
      FROM n)
SELECT doc_id, ci AS chunk_idx, least(40, n - ci * 20) AS n_tokens,
       array_to_string(ts[ci * 20 + 1 : ci * 20 + least(40, n - ci * 20)], ' ') AS chunk
FROM c
""",
        # S31 significant_terms: per-doc DISTINCT terms; JLH score
        # evaluated in the engine's float op order ((fgr-bgr)*fgr)/bgr
        "s31_significant_terms": """
WITH tok AS (SELECT doc_id,
                    list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS ts
             FROM documents),
fgd AS (SELECT doc_id, ts, list_contains(ts, 'vector') AS fg FROM tok),
n AS (SELECT CAST(count(*) AS DOUBLE) AS bg_n,
             CAST(count(*) FILTER (WHERE fg) AS DOUBLE) AS fg_n FROM fgd),
e AS (SELECT unnest(ts) AS term, fg FROM fgd),
c AS (SELECT term, count(*) FILTER (WHERE fg) AS fg, count(*) AS bg
      FROM e WHERE term <> 'vector' GROUP BY 1)
SELECT term, fg, bg,
       round(((fg / fg_n - bg / bg_n) * (fg / fg_n)) / (bg / bg_n), 4) AS score
FROM c, n WHERE fg >= 2
ORDER BY (((fg / fg_n - bg / bg_n) * (fg / fg_n)) / (bg / bg_n)) DESC, term
LIMIT 10
""",
        "dedup_exact": (
            "WITH both_docs AS ("
            "  SELECT doc_id, text FROM documents "
            "  UNION ALL SELECT doc_id + 1000000, text || ' zz_dup_marker' FROM documents) "
            "SELECT md5(text) AS digest, min(doc_id) AS doc_id, count(*) AS dup_count "
            "FROM both_docs GROUP BY md5(text)"
        ),
        "ann_cosine": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id IN (0,1,2)) "
            "SELECT qid, e.vec_id, round("
            "list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
            " sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cos "
            "FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.qid "
            "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, e.vec_id) <= 10"
        ),
        "ann_hard_negatives": (
            "WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qe "
            "FROM embeddings WHERE vec_id IN (0,1,2)) "
            "SELECT qid, e.vec_id, round("
            "list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
            " sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cos "
            "FROM embeddings e CROSS JOIN q WHERE e.label <> q.qlabel "
            "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, e.vec_id) <= 10"
        ),
        "ann_cosine_filtered": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id IN (0,1,2)) "
            "SELECT qid, e.vec_id, round("
            "list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
            " sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cos "
            "FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.qid AND e.label = 1 "
            "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, e.vec_id) <= 10"
        ),
        "ann_ivf_batch": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id IN (0,1,2)) "
            "SELECT qid, e.vec_id, round("
            "list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
            " sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cos "
            "FROM embeddings e CROSS JOIN q "
            "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, e.vec_id) <= 10"
        ),
        "ann_ivf": (
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) "
            "SELECT e.vec_id, round("
            "list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
            " sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cos "
            "FROM embeddings e, q ORDER BY cos DESC, e.vec_id LIMIT 10"
        ),
        "ann_pq": _pq_sql(),
        "ann_ivfpq": _ivfpq_sql(),
        "r35_pagerank": _pagerank_sql(),
        "dedup_semantic": _semdedup_sql(),
        "t_topic_census": _topic_census_sql(),
        "t_cluster_sample": _cluster_sample_sql(),
        "mm_features": mm_features_sql,
        "mm_frames": mm_frames_sql,
        "mm_audio_energy": mm_audio_sql,
        "pipe_listing": (
            "SELECT doc_id, lang, source, n_chars FROM documents WHERE lang IN ('en','de') "
            "ORDER BY n_chars DESC, doc_id LIMIT 15"
        ),
        "pipe_hybrid": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY
    (ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 /
     (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))) DESC, doc_id) AS r
  FROM d, s WHERE tf0 > 0 QUALIFY r <= 50),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
sem0 AS (
  SELECT e.vec_id AS doc_id, round(
    list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) /
    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
     sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cos
  FROM embeddings e, q WHERE e.vec_id != 0),
sem AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r
        FROM sem0 QUALIFY r <= 50),
fused AS (
  SELECT COALESCE(l.doc_id, m.doc_id) AS doc_id,
         COALESCE(1.0 / (60 + l.r), 0) + COALESCE(1.0 / (60 + m.r), 0) AS rrf,
         COALESCE(l.r, 0) AS rank_0, COALESCE(m.r, 0) AS rank_1
  FROM lex l FULL OUTER JOIN sem m ON l.doc_id = m.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, rrf,
       CAST(rank_0 AS BIGINT) AS rank_0, CAST(rank_1 AS BIGINT) AS rank_1
FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
""",
        "pipe_grouped_search": grouped_search_sql,
        "t_lang_id": lang_sql,
        "t_rolling_fp": rolling_sql,
        # ---- round-3 third wave -------------------------------------
        "t_gopher_rules": _gopher_sql,
        "t_reservoir_sample": """
WITH w AS (
  SELECT doc_id, n_chars,
    CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS DOUBLE) / 18446744073709551616.0 AS u
  FROM documents)
SELECT doc_id, n_chars, round(pow(u, 1.0 / n_chars), 6) AS sample_key
FROM w
ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id
LIMIT 50
""",
        "ann_range": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id IN (0,1,2)) "
            "SELECT qid, e.vec_id, round("
            "list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
            " sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cos "
            "FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.qid "
            "AND round("
            "list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
            " sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) >= 0.3"
        ),
        "s60_terms_set": _terms_set_sql,
        "s61_rare_terms": f"""
WITH tok AS (SELECT doc_id, source, {toks} AS ts FROM documents)
SELECT source, count(*) AS cnt FROM tok
WHERE len(list_filter(ts, t -> t = 'vector')) > 0
GROUP BY 1 HAVING count(*) <= 16
ORDER BY cnt, source
""",
        "s62_multi_terms": f"""
WITH tok AS (SELECT doc_id, lang, source, {toks} AS ts FROM documents),
m AS (SELECT lang, source, count(*) AS cnt FROM tok
      WHERE len(list_filter(ts, t -> t = 'vector')) > 0 GROUP BY 1, 2)
SELECT lang, source, cnt FROM m
ORDER BY cnt DESC, lang || '|' || source LIMIT 10
""",
        "s63_diversified_sampler": f"""
WITH tok AS (SELECT doc_id, source, n_chars, {toks} AS ts FROM documents),
d AS (SELECT doc_id, source, n_chars, len(ts) AS dl,
             len(list_filter(ts, t -> t = 'vector')) AS tf0 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
             count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d),
scored AS (
  SELECT d.doc_id, d.source, d.n_chars,
         ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 /
         (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) AS raw
  FROM d, s WHERE tf0 > 0),
reps AS (SELECT * FROM scored
         QUALIFY row_number() OVER (PARTITION BY source ORDER BY raw DESC, doc_id) = 1)
SELECT count(*) AS n_sampled,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_n_chars
FROM reps
""",
        "s64_match_bool_prefix": f"""
WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents),
d AS (SELECT doc_id, len(ts) AS dl, ts,
      len(list_filter(ts, t -> t = 'hash')) AS tf0,
      len(list_filter(ts, t -> t = 'join')) AS tf1 FROM tok),
s AS (SELECT count(*) AS n, sum(dl) AS total_len,
      count(*) FILTER (WHERE tf0 > 0) AS df0,
      count(*) FILTER (WHERE tf1 > 0) AS df1 FROM d),
e AS (SELECT doc_id, dl, unnest(list_filter(ts, t -> t LIKE 'vec%')) AS tk FROM d),
tf AS (SELECT doc_id, dl, tk, count(*) AS tf FROM e GROUP BY 1, 2, 3),
df AS (SELECT tk, count(*) AS df FROM tf GROUP BY 1),
px AS (SELECT tf.doc_id, sum(
      ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * tf.tf * 2.2 /
      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / (s.total_len / s.n)))) AS ps
   FROM tf JOIN df USING (tk), s GROUP BY 1)
SELECT d.doc_id, round(
   (CASE WHEN tf0 > 0 THEN ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 /
    (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END) +
   (CASE WHEN tf1 > 0 THEN ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5)) * tf1 * 2.2 /
    (tf1 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END) +
   coalesce(px.ps, 0), 4) AS score
FROM d LEFT JOIN px USING (doc_id), s
WHERE tf0 > 0 OR tf1 > 0 OR px.ps IS NOT NULL
ORDER BY score DESC, d.doc_id LIMIT 10
""",
        "s66_distance_feature": _bm25_sql(
            ["vector"],
            boost_sql="5.0 * (100.0 / (100.0 + abs(d.n_chars - 500.0)))",
        ),
        "r36_derivative": (
            "WITH m AS (SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS window_start, "
            "count(*) AS n FROM events GROUP BY 1) "
            "SELECT window_start, n, "
            "n - lag(n) OVER (ORDER BY window_start) AS deriv, "
            "CAST(sum(n) OVER (ORDER BY window_start ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n "
            "FROM m QUALIFY lag(n) OVER (ORDER BY window_start) IS NOT NULL "
            "ORDER BY window_start"
        ),
        "e14_compaction": "SELECT doc_id, lang, source, n_chars FROM documents",
        # ---- round-3 fourth wave --------------------------------------
        "r47_string_stats": (
            # entropy replayed character by character (ASCII field, so
            # codepoints == string_split chars)
            "WITH ch AS (SELECT unnest(string_split(source, '')) AS c FROM documents), "
            "f AS (SELECT c, CAST(count(*) AS DOUBLE) AS n FROM ch GROUP BY 1), "
            "tot AS (SELECT sum(n) AS t FROM f), "
            "e AS (SELECT round(-sum((n / t) * log2(n / t)), 4) AS entropy FROM f, tot) "
            "SELECT CAST(count(*) AS BIGINT) AS count, "
            "CAST(min(length(source)) AS BIGINT) AS min_length, "
            "CAST(max(length(source)) AS BIGINT) AS max_length, "
            "round(sum(length(source)) / CAST(count(*) AS DOUBLE), 4) AS avg_length, "
            "(SELECT entropy FROM e) AS entropy FROM documents"
        ),
        "r48_top_metrics": (
            "WITH r AS (SELECT l_returnflag, strftime(l_shipdate, '%Y-%m-%d') AS top_shipdate, "
            "round(l_extendedprice, 4) AS metric_price, "
            "row_number() OVER (PARTITION BY l_returnflag ORDER BY "
            "l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn FROM lineitem) "
            "SELECT l_returnflag, top_shipdate, metric_price FROM r WHERE rn = 1 "
            "ORDER BY l_returnflag"
        ),
        "r49_boxplot": (
            "SELECT l_returnflag, CAST(min(l_quantity) AS DOUBLE) AS min_v, "
            "round(quantile_cont(l_quantity, 0.25), 4) AS q1, "
            "round(quantile_cont(l_quantity, 0.50), 4) AS q2, "
            "round(quantile_cont(l_quantity, 0.75), 4) AS q3, "
            "CAST(max(l_quantity) AS DOUBLE) AS max_v "
            "FROM lineitem GROUP BY 1 ORDER BY 1"
        ),
        "r50_mad": (
            "WITH med AS (SELECT l_returnflag AS rf, quantile_cont(l_quantity, 0.5) AS m "
            "FROM lineitem GROUP BY 1) "
            "SELECT l_returnflag, round(max(m), 4) AS median_v, "
            "round(quantile_cont(abs(l_quantity - m), 0.5), 4) AS mad "
            "FROM lineitem JOIN med ON l_returnflag = rf "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "r51_t_test": (
            # Welch t + Satterthwaite dof from the same naive moments
            # (n, sum, sum of squares) the combiner ships
            "WITH p AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n, "
            "sum(value) AS s, sum(value * value) AS sq FROM events "
            "WHERE event_type IN ('purchase', 'click') GROUP BY 1), "
            "a AS (SELECT n, s / n AS m, (sq - n * (s / n) * (s / n)) / (n - 1) AS v "
            "FROM p WHERE event_type = 'purchase'), "
            "b AS (SELECT n, s / n AS m, (sq - n * (s / n) * (s / n)) / (n - 1) AS v "
            "FROM p WHERE event_type = 'click') "
            "SELECT round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat, "
            "round((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n) / "
            "((a.v / a.n) * (a.v / a.n) / (a.n - 1) + (b.v / b.n) * (b.v / b.n) / (b.n - 1)), 2) AS dof, "
            "CAST(a.n AS BIGINT) AS n_purchase, CAST(b.n AS BIGINT) AS n_click "
            "FROM a, b"
        ),
        "r52_bucket_selector": (
            "WITH m AS (SELECT CAST(epoch_us(date_trunc('month', ts)) AS BIGINT) AS month_start, "
            "sum(value) AS s, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1) "
            "SELECT month_start, round(s, 4) AS sum_value, n FROM m WHERE s > 1000.0 "
            "ORDER BY round(s, 4) DESC, month_start LIMIT 5"
        ),
        "r53_serial_diff": (
            "WITH m AS (SELECT CAST(epoch_us(date_trunc('month', ts)) AS BIGINT) AS month_start, "
            "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1) "
            "SELECT month_start, n, n - lag(n, 3) OVER (ORDER BY month_start) AS sdiff3 "
            "FROM m QUALIFY lag(n, 3) OVER (ORDER BY month_start) IS NOT NULL "
            "ORDER BY month_start"
        ),
        "r54_cumulative_cardinality": (
            "WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1), "
            "m AS (SELECT CAST(epoch_us(date_trunc('month', first_ts)) AS BIGINT) AS month_start, "
            "CAST(count(*) AS BIGINT) AS new_users FROM f GROUP BY 1) "
            "SELECT month_start, new_users, "
            "CAST(sum(new_users) OVER (ORDER BY month_start ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS cumulative_users FROM m ORDER BY month_start"
        ),
        "r55_cube": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "round(sum(l_quantity), 4) AS sum_qty "
            "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY 1, 2"
        ),
        "r56_set_ops": (
            "WITH c AS (SELECT DISTINCT c_nationkey AS k FROM customer), "
            "s AS (SELECT DISTINCT s_nationkey AS k FROM supplier) "
            "SELECT 'intersect' AS op, k AS nationkey FROM (SELECT k FROM c INTERSECT SELECT k FROM s) "
            "UNION ALL SELECT 'cust_except_supp' AS op, k FROM (SELECT k FROM c EXCEPT SELECT k FROM s) "
            "UNION ALL SELECT 'supp_except_cust' AS op, k FROM (SELECT k FROM s EXCEPT SELECT k FROM c) "
            "ORDER BY op, nationkey"
        ),
        "r57_anti_join": (
            "SELECT c_custkey, c_name, round(c_acctbal, 4) AS c_acctbal FROM customer "
            "WHERE NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey AND o_totalprice > 300000.0) "
            "ORDER BY c_custkey"
        ),
        "r58_window_ranks": (
            "SELECT o_orderkey, o_orderpriority, round(o_totalprice, 4) AS o_totalprice, "
            "row_number() OVER w AS rn, ntile(4) OVER w AS nt4, "
            "round(percent_rank() OVER w, 6) AS pr, round(cume_dist() OVER w, 6) AS cd "
            "FROM orders WINDOW w AS (PARTITION BY o_orderpriority "
            "ORDER BY o_orderdate, o_orderkey) ORDER BY o_orderkey"
        ),
        "t_soft_dedup": (
            "WITH both_docs AS ("
            "  SELECT doc_id, text FROM documents "
            "  UNION ALL SELECT doc_id + 1000000, text || ' zz_dup_marker' FROM documents) "
            "SELECT doc_id, "
            "CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS dup_count, "
            "1.0 / count(*) OVER (PARTITION BY md5(text)) AS weight "
            "FROM both_docs ORDER BY doc_id"
        ),
        "s74_random_score": (
            "SELECT doc_id, round(md5_number_upper(CAST('42:' || doc_id AS VARCHAR)) "
            "/ 18446744073709551616.0, 6) AS rand_score "
            "FROM documents WHERE lang = 'en' "
            "ORDER BY md5_number_upper(CAST('42:' || doc_id AS VARCHAR)) DESC, doc_id "
            "LIMIT 20"
        ),
        "t_ccnet_buckets": f"""
WITH tok AS (SELECT doc_id, unnest({plain_toks}) AS tk,
                    unnest(range(1, len({plain_toks}) + 1)) AS pos
             FROM documents),
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
       LEFT JOIN big b ON b.w1 = p.tk AND b.w2 = t.tk, tot),
score AS (SELECT d.doc_id, d.lang,
          round(coalesce(sum(lp.lp) / count(lp.lp), 0), 4) AS bigram_nlp
          FROM documents d LEFT JOIN lp USING (doc_id) GROUP BY 1, 2),
q AS (SELECT lang, quantile_disc(bigram_nlp, 1.0/3) AS q1,
             quantile_disc(bigram_nlp, 2.0/3) AS q2 FROM score GROUP BY 1)
SELECT s.doc_id, s.lang, s.bigram_nlp,
 CASE WHEN s.bigram_nlp <= q.q1 THEN 'head'
      WHEN s.bigram_nlp <= q.q2 THEN 'middle' ELSE 'tail' END AS bucket
FROM score s JOIN q USING (lang) ORDER BY s.doc_id
""",
        "r60_rate": (
            "WITH m AS (SELECT date_trunc('week', ts) AS wk, sum(value) AS s "
            "FROM events GROUP BY 1) "
            "SELECT CAST(epoch_us(wk) AS BIGINT) AS week_start, round(s, 4) AS sum_value, "
            "round(s / 7.0, 4) AS rate_per_day "
            "FROM m ORDER BY 1"
        ),
        "r61_bucket_script": (
            "WITH m AS (SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_start, "
            "sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS pv, "
            "count(*) FILTER (WHERE event_type = 'click') AS ck FROM events GROUP BY 1) "
            "SELECT day_start, round(pv, 4) AS purchase_value, "
            "CAST(ck AS BIGINT) AS clicks, round(pv / ck, 4) AS value_per_click "
            "FROM m WHERE ck > 0 ORDER BY day_start"
        ),
        "r62_stats_bucket": (
            "WITH m AS (SELECT sum(value) AS s FROM events "
            "GROUP BY date_trunc('month', ts)) "
            "SELECT CAST(count(*) AS BIGINT) AS n_buckets, "
            "round(min(s), 4) AS min_bucket, round(max(s), 4) AS max_bucket, "
            "round(sum(s) / count(*), 4) AS avg_bucket, "
            "round(sum(s), 4) AS sum_buckets FROM m"
        ),
        "e18_schema_merge": (
            "WITH u AS (SELECT doc_id, lang, NULL::VARCHAR AS source, 1 AS v FROM documents "
            "UNION ALL SELECT doc_id + 1000000, NULL::VARCHAR, source, 2 FROM documents) "
            "SELECT CAST(v AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(*) FILTER (WHERE lang IS NULL) AS BIGINT) AS null_lang, "
            "CAST(count(*) FILTER (WHERE source IS NULL) AS BIGINT) AS null_source "
            "FROM u GROUP BY v ORDER BY v"
        ),
        "s76_ids": (
            "SELECT doc_id, lang, n_chars, 1.0 AS score FROM documents "
            "WHERE doc_id IN (3, 7, 11, 19, 42) ORDER BY doc_id"
        ),
        "t_embed_outliers": (
            "WITH u AS (SELECT unnest(embedding::DOUBLE[]) AS x, "
            "generate_subscripts(embedding, 1) AS i FROM embeddings), "
            "c AS (SELECT i, avg(x) AS v FROM u GROUP BY 1), "
            "cv AS (SELECT list(v ORDER BY i) AS cvec FROM c), "
            "s AS (SELECT vec_id, "
            "list_dot_product(embedding::DOUBLE[], cvec) / "
            "(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * "
            " sqrt(list_dot_product(cvec, cvec))) AS cos "
            "FROM embeddings, cv) "
            "SELECT vec_id, round(cos, 4) AS cos_centroid FROM s "
            "WHERE cos < 0.05 ORDER BY vec_id"
        ),
        "ann_maxsim": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings "
            "WHERE vec_id IN (0, 1, 2)), "
            "c AS (SELECT e.vec_id // 4 AS g, q.qid, "
            "list_dot_product(e.embedding::DOUBLE[], q.qe::DOUBLE[]) / "
            "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
            " sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))) AS cos "
            "FROM embeddings e CROSS JOIN q), "
            "m AS (SELECT g, qid, max(cos) AS mx FROM c GROUP BY 1, 2), "
            "s AS (SELECT g, sum(mx) AS score FROM m GROUP BY 1) "
            "SELECT CAST(g AS BIGINT) AS g, round(score, 4) AS score FROM s "
            "ORDER BY round(score, 4) DESC, g LIMIT 5"
        ),
        "r66_join_auto": (
            "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(o_totalprice), 4) AS revenue "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY 1 ORDER BY 1"
        ),
        "r65_terms_by_subagg": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS doc_count, "
            "round(sum(CAST(n_chars AS DOUBLE)) / count(*), 4) AS avg_chars "
            "FROM documents GROUP BY 1 "
            "ORDER BY round(sum(CAST(n_chars AS DOUBLE)) / count(*), 4) DESC, lang "
            "LIMIT 3"
        ),
        "e19_reindex_alias": _bm25_sql(
            ["vector"],
            table_sql="(SELECT doc_id, n_chars, text FROM documents WHERE lang <> 'zh')",
        ),
        # s81: chi_square significance — 2x2 contingency, signed by
        # over/under-representation, same CTE skeleton as s31
        "s81_sig_chi2": """
WITH tok AS (SELECT doc_id,
                    list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS ts
             FROM documents),
fgd AS (SELECT doc_id, ts, list_contains(ts, 'vector') AS fg FROM tok),
n AS (SELECT CAST(count(*) AS DOUBLE) AS bg_n,
             CAST(count(*) FILTER (WHERE fg) AS DOUBLE) AS fg_n FROM fgd),
e AS (SELECT unnest(ts) AS term, fg FROM fgd),
c AS (SELECT term, CAST(count(*) FILTER (WHERE fg) AS BIGINT) AS fg,
             CAST(count(*) AS BIGINT) AS bg
      FROM e WHERE term <> 'vector' GROUP BY 1),
x AS (SELECT term, fg, bg,
       CAST(fg AS DOUBLE) AS o11, CAST(bg - fg AS DOUBLE) AS o12,
       n.fg_n - fg AS o21, (n.bg_n - n.fg_n) - (bg - fg) AS o22,
       n.bg_n AS bn, n.fg_n AS fn
      FROM c, n WHERE fg >= 2),
sc AS (SELECT term, fg, bg,
        CASE WHEN (o11 + o12) * (o11 + o21) * (o12 + o22) * (o21 + o22) > 0
             THEN bn * ((o11 * o22 - o12 * o21) * (o11 * o22 - o12 * o21))
                  / ((o11 + o12) * (o11 + o21) * (o12 + o22) * (o21 + o22))
             ELSE 0 END
        * (CASE WHEN o11 / fn >= CAST(bg AS DOUBLE) / bn THEN 1 ELSE -1 END) AS raw
       FROM x)
SELECT term, fg, bg, round(raw, 4) AS score
FROM sc ORDER BY raw DESC, term LIMIT 10
""",
        "r64_rolling_window": (
            "SELECT event_id, event_type, round(value, 4) AS value, "
            "round(sum(value) OVER w, 4) AS rsum7, "
            "round(avg(value) OVER w, 4) AS rmean7 "
            "FROM events WINDOW w AS (PARTITION BY event_type "
            "ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) "
            "ORDER BY event_id"
        ),
        "r63_unpivot": (
            "SELECT CAST(user_id % 8 AS BIGINT) AS cohort, event_type, "
            "CAST(count(*) AS BIGINT) AS n FROM events "
            "WHERE event_type IN ('click', 'view', 'purchase', 'signup', 'error') "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "t_temperature_mix": (
            # per-lang keep-rate = min(1, target * (c^alpha / sum) / c),
            # same op order as sketch.temperature_mix
            "WITH cnt AS (SELECT lang, CAST(count(*) AS DOUBLE) AS c "
            "FROM documents GROUP BY 1), "
            "s AS (SELECT sum(pow(c, 0.5)) AS s FROM cnt), "
            "r AS (SELECT lang, least(1.0, 200.0 * (pow(c, 0.5) / s.s) / c) "
            "* 18446744073709551616.0 AS lim FROM cnt, s) "
            "SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang) "
            "WHERE md5_number_upper(CAST(d.doc_id AS VARCHAR)) < r.lim "
            "ORDER BY d.doc_id"
        ),
        "s77_most_fields": (
            # per-field BM25 summed (most_fields): text keeps its own
            # df/dl/avgdl; source is a single-token field so its norm
            # collapses to tf/(tf+1.2)
            "WITH tok AS (SELECT doc_id, source, " + _TOKS.format(col="text") + " AS ts FROM documents), "
            "d AS (SELECT doc_id, len(ts) * 1.0 AS dl, "
            "len(list_filter(ts, t -> t = 'vector')) * 1.0 AS tt0, "
            "len(list_filter(ts, t -> t = 'src3')) * 1.0 AS tt1, "
            "CASE WHEN source = 'vector' THEN 1.0 ELSE 0.0 END AS sv0, "
            "CASE WHEN source = 'src3' THEN 1.0 ELSE 0.0 END AS sv1 FROM tok), "
            "s AS (SELECT count(*) AS n, sum(dl) AS total_len, "
            "count(*) FILTER (WHERE tt0 > 0) AS dft0, count(*) FILTER (WHERE tt1 > 0) AS dft1, "
            "count(*) FILTER (WHERE sv0 > 0) AS dfs0, count(*) FILTER (WHERE sv1 > 0) AS dfs1 FROM d) "
            "SELECT d.doc_id, round("
            "(CASE WHEN tt0 > 0 THEN ln(1 + (s.n - s.dft0 + 0.5) / (s.dft0 + 0.5)) "
            "* tt0 * 2.2 / (tt0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END) + "
            "(CASE WHEN tt1 > 0 THEN ln(1 + (s.n - s.dft1 + 0.5) / (s.dft1 + 0.5)) "
            "* tt1 * 2.2 / (tt1 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END) + "
            "(CASE WHEN sv0 > 0 THEN ln(1 + (s.n - s.dfs0 + 0.5) / (s.dfs0 + 0.5)) "
            "* sv0 * 2.2 / (sv0 + 1.2) ELSE 0 END) + "
            "(CASE WHEN sv1 > 0 THEN ln(1 + (s.n - s.dfs1 + 0.5) / (s.dfs1 + 0.5)) "
            "* sv1 * 2.2 / (sv1 + 1.2) ELSE 0 END), 4) AS score "
            "FROM d, s WHERE tt0 > 0 OR tt1 > 0 OR sv0 > 0 OR sv1 > 0 "
            "ORDER BY ((CASE WHEN tt0 > 0 THEN ln(1 + (s.n - s.dft0 + 0.5) / (s.dft0 + 0.5)) "
            "* tt0 * 2.2 / (tt0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END) + "
            "(CASE WHEN tt1 > 0 THEN ln(1 + (s.n - s.dft1 + 0.5) / (s.dft1 + 0.5)) "
            "* tt1 * 2.2 / (tt1 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END) + "
            "(CASE WHEN sv0 > 0 THEN ln(1 + (s.n - s.dfs0 + 0.5) / (s.dfs0 + 0.5)) "
            "* sv0 * 2.2 / (sv0 + 1.2) ELSE 0 END) + "
            "(CASE WHEN sv1 > 0 THEN ln(1 + (s.n - s.dfs1 + 0.5) / (s.dfs1 + 0.5)) "
            "* sv1 * 2.2 / (sv1 + 1.2) ELSE 0 END)) DESC, d.doc_id "
            "LIMIT 10"
        ),
        "r59_geo_bounds": (
            "WITH pt AS (SELECT c_nationkey AS nation, "
            "(md5_number_upper(CAST(c_custkey AS VARCHAR)) / 18446744073709551616.0) "
            "* 180.0 - 90.0 AS lat, "
            "(md5_number_upper(CAST(c_custkey AS VARCHAR) || ':lon') / 18446744073709551616.0) "
            "* 360.0 - 180.0 AS lon FROM customer) "
            "SELECT nation, CAST(count(*) AS BIGINT) AS n, "
            "round(min(lat), 6) AS min_lat, round(max(lat), 6) AS max_lat, "
            "round(min(lon), 6) AS min_lon, round(max(lon), 6) AS max_lon, "
            "round(sum(lat) / count(*), 6) AS centroid_lat, "
            "round(sum(lon) / count(*), 6) AS centroid_lon "
            "FROM pt GROUP BY 1 ORDER BY 1"
        ),
        "pipe_tpch_q4": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count "
            "FROM orders WHERE EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') "
            "GROUP BY 1 ORDER BY 1"
        ),
        "pipe_tpch_q10": (
            "SELECT c_custkey, c_name, n_name, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue "
            "FROM customer, orders, lineitem, nation "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_returnflag = 'R' AND c_nationkey = n_nationkey "
            "GROUP BY c_custkey, c_name, n_name "
            "ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 4) DESC, c_custkey "
            "LIMIT 20"
        ),
        "pipe_tpch_q14": (
            "SELECT round(100.0 * "
            "sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) "
            "ELSE 0 END) / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct "
            "FROM lineitem JOIN part ON l_partkey = p_partkey"
        ),
        "s75_combined_fields": (
            # BM25F: weighted per-field tf/dl into one synthetic field
            # (text w=1, source w=2), any-field df, Okapi op order as
            # _bm25_sql
            "WITH tok AS (SELECT doc_id, source, " + _TOKS.format(col="text") + " AS ts FROM documents), "
            "d AS (SELECT doc_id, len(ts) * 1.0 + 2.0 AS dl, "
            "len(list_filter(ts, t -> t = 'vector')) * 1.0 + "
            "(CASE WHEN source = 'vector' THEN 2.0 ELSE 0.0 END) AS tf0, "
            "len(list_filter(ts, t -> t = 'src3')) * 1.0 + "
            "(CASE WHEN source = 'src3' THEN 2.0 ELSE 0.0 END) AS tf1 FROM tok), "
            "s AS (SELECT count(*) AS n, sum(dl) AS total_len, "
            "count(*) FILTER (WHERE tf0 > 0) AS df0, "
            "count(*) FILTER (WHERE tf1 > 0) AS df1 FROM d) "
            "SELECT d.doc_id, round("
            "(CASE WHEN tf0 > 0 THEN ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) "
            "* tf0 * 2.2 / (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END) + "
            "(CASE WHEN tf1 > 0 THEN ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5)) "
            "* tf1 * 2.2 / (tf1 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END), 4) AS score "
            "FROM d, s WHERE tf0 > 0 OR tf1 > 0 "
            "ORDER BY ((CASE WHEN tf0 > 0 THEN ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) "
            "* tf0 * 2.2 / (tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END) + "
            "(CASE WHEN tf1 > 0 THEN ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5)) "
            "* tf1 * 2.2 / (tf1 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END)) DESC, d.doc_id "
            "LIMIT 10"
        ),
        "r68_geohash_grid": (
            # precision-3 geohash: 8 lon + 7 lat bits interleaved
            # MSB-first (lon leads), three base32 chars
            "WITH pt AS (SELECT "
            "(md5_number_upper(CAST(c_custkey AS VARCHAR)) / 18446744073709551616.0) "
            "* 180.0 - 90.0 AS lat, "
            "(md5_number_upper(CAST(c_custkey AS VARCHAR) || ':lon') / 18446744073709551616.0) "
            "* 360.0 - 180.0 AS lon FROM customer), "
            "ix AS (SELECT CAST(least(floor((lon + 180.0) / 360.0 * 256.0), 255) AS BIGINT) AS li, "
            "CAST(least(floor((lat + 90.0) / 180.0 * 128.0), 127) AS BIGINT) AS ti FROM pt), "
            "v AS (SELECT "
            "((li >> 7) & 1) * 16384 + ((ti >> 6) & 1) * 8192 + "
            "((li >> 6) & 1) * 4096 + ((ti >> 5) & 1) * 2048 + "
            "((li >> 5) & 1) * 1024 + ((ti >> 4) & 1) * 512 + "
            "((li >> 4) & 1) * 256 + ((ti >> 3) & 1) * 128 + "
            "((li >> 3) & 1) * 64 + ((ti >> 2) & 1) * 32 + "
            "((li >> 2) & 1) * 16 + ((ti >> 1) & 1) * 8 + "
            "((li >> 1) & 1) * 4 + (ti & 1) * 2 + (li & 1) AS h FROM ix), "
            "gh AS (SELECT substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST(h // 1024 AS INT) + 1, 1) || "
            "substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((h // 32) % 32 AS INT) + 1, 1) || "
            "substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST(h % 32 AS INT) + 1, 1) AS key FROM v) "
            "SELECT key, CAST(count(*) AS BIGINT) AS doc_count FROM gh "
            "GROUP BY key ORDER BY doc_count DESC, key LIMIT 10"
        ),
        "r69_scripted_metric": (
            "SELECT event_type, round(sum(value * "
            "CASE WHEN user_id % 3 = 0 THEN 2.0 ELSE 1.0 END), 4) AS weighted_value "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "r73_benford": (
            "WITH d AS (SELECT CAST(floor(o_totalprice / "
            "pow(10, floor(log10(o_totalprice)))) AS BIGINT) AS d "
            "FROM orders WHERE o_totalprice > 0), "
            "c AS (SELECT digit AS d, "
            "CAST(count(dd.d) AS BIGINT) AS n FROM "
            "(SELECT unnest(range(1, 10)) AS digit) r "
            "LEFT JOIN d dd ON dd.d = r.digit GROUP BY digit), "
            "t AS (SELECT sum(n) * 1.0 AS total FROM c), "
            "e AS (SELECT c.d, c.n, (SELECT total FROM t) * log10(1 + 1.0 / c.d) AS exp_n FROM c), "
            "x AS (SELECT round(sum((n - exp_n) * (n - exp_n) / exp_n), 4) AS chi2 FROM e) "
            "SELECT e.d, e.n, round(e.exp_n, 4) AS expected, "
            "(SELECT chi2 FROM x) AS chi2_total FROM e ORDER BY e.d"
        ),
        "r72_basket_rules": (
            "WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
            "pc AS (SELECT a.l_partkey AS x, b.l_partkey AS y, "
            "CAST(count(*) AS BIGINT) AS c_xy FROM lp a "
            "JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
            "GROUP BY x, y), "
            "ic AS (SELECT l_partkey, count(*) * 1.0 AS c FROM lp GROUP BY l_partkey), "
            "n AS (SELECT count(*) * 1.0 AS o FROM orders), "
            "rules AS (SELECT pc.x, pc.y, pc.c_xy, "
            "round(pc.c_xy / ix.c, 4) AS confidence, "
            "round(pc.c_xy * (SELECT o FROM n) / (ix.c * iy.c), 4) AS lift "
            "FROM pc JOIN ic ix ON ix.l_partkey = pc.x "
            "JOIN ic iy ON iy.l_partkey = pc.y WHERE pc.c_xy >= 2) "
            "SELECT x, y, c_xy, confidence, lift FROM rules "
            "ORDER BY lift DESC, x, y LIMIT 10"
        ),
        "t_bootstrap_means": (
            "WITH r AS (SELECT unnest(range(1, 51)) AS b), "
            "x AS (SELECT b, value, "
            "md5_number_upper(CAST(event_id AS VARCHAR) || ':' || b) "
            "/ 18446744073709551616.0 AS u FROM events, r), "
            "c AS (SELECT b, value, "
            "(CASE WHEN u >= 0.36787944117144233 THEN 1 ELSE 0 END "
            "+ CASE WHEN u >= 0.7357588823428847 THEN 1 ELSE 0 END "
            "+ CASE WHEN u >= 0.9196986029286058 THEN 1 ELSE 0 END "
            "+ CASE WHEN u >= 0.9810118431238462 THEN 1 ELSE 0 END "
            "+ CASE WHEN u >= 0.9963401531726563 THEN 1 ELSE 0 END) AS cnt FROM x) "
            "SELECT CAST(b AS BIGINT) AS b, "
            "round(sum(cnt * value) / sum(cnt), 4) AS mean_b "
            "FROM c GROUP BY b ORDER BY b"
        ),
        "pipe_triangles": (
            "WITH pairs AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "w AS (SELECT e1.y AS a, e2.y AS b FROM pairs e1 "
            "JOIN pairs e2 ON e1.x = e2.x AND e1.y < e2.y) "
            "SELECT CAST((SELECT count(*) FROM pairs) AS BIGINT) AS edges, "
            "CAST((SELECT count(*) FROM w) AS BIGINT) AS wedges, "
            "CAST((SELECT count(*) FROM w JOIN pairs e3 "
            "ON e3.x = w.a AND e3.y = w.b) AS BIGINT) AS triangles"
        ),
        "r71_late_events": (
            "WITH w AS (SELECT event_type, ts, max(ts) OVER ("
            "PARTITION BY user_id "
            "ORDER BY md5_number_upper(CAST(event_id AS VARCHAR)) "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw FROM events) "
            "SELECT event_type, CAST(count(*) FILTER (WHERE hw IS NOT NULL "
            "AND ts < hw - INTERVAL 3 DAY) AS BIGINT) AS late_count, "
            "CAST(count(*) AS BIGINT) AS total FROM w "
            "GROUP BY event_type ORDER BY event_type"
        ),
        "t_expectations": (
            "WITH n AS (SELECT CAST(count(*) AS BIGINT) AS rows FROM lineitem) "
            "SELECT 'quantity_in_range_1_50' AS expectation, "
            "CAST((SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT) AS violations, "
            "(SELECT rows FROM n) AS checked_rows "
            "UNION ALL SELECT 'orderkey_not_null', "
            "CAST((SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) AS BIGINT), (SELECT rows FROM n) "
            "UNION ALL SELECT 'orderkey_linenumber_unique', "
            "(SELECT rows FROM n) - CAST((SELECT count(*) FROM "
            "(SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS BIGINT), (SELECT rows FROM n) "
            "UNION ALL SELECT 'shipdate_after_orderdate', "
            "CAST((SELECT count(*) FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "WHERE l_shipdate < o_orderdate) AS BIGINT), (SELECT rows FROM n) "
            "UNION ALL SELECT 'orderkey_fk_in_orders', "
            "CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN "
            "(SELECT o_orderkey FROM orders)) AS BIGINT), (SELECT rows FROM n)"
        ),
        "ann_sq8": (
            # int8 scalar quantization: per-dim min/max grid, code =
            # clamp(floor((v-lo)/(hi-lo)*256)), dequant = lo +
            # (code+0.5)*(hi-lo)/256, float-query dot product
            "WITH ex AS (SELECT vec_id, i, embedding[i] AS v FROM embeddings, "
            "(SELECT unnest(range(1, 65)) AS i) r), "
            "mm AS (SELECT i, min(v) AS lo, max(v) AS hi FROM ex GROUP BY i), "
            "qv AS (SELECT vec_id AS qid, i, v AS qval FROM ex WHERE vec_id IN (0, 1, 2)), "
            "dq AS (SELECT ex.vec_id, ex.i, CASE WHEN mm.hi = mm.lo THEN mm.lo "
            "ELSE mm.lo + (least(greatest(floor((ex.v - mm.lo) / (mm.hi - mm.lo) * 256.0), 0.0), 255.0) + 0.5) "
            "* (mm.hi - mm.lo) / 256.0 END AS dv FROM ex JOIN mm USING (i)), "
            "sc AS (SELECT qv.qid, dq.vec_id, round(sum(dq.dv * qv.qval), 4) AS score "
            "FROM dq JOIN qv USING (i) GROUP BY qv.qid, dq.vec_id), "
            "rk AS (SELECT qid, vec_id, score, "
            "row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn FROM sc) "
            "SELECT qid, vec_id, score FROM rk WHERE rn <= 5 ORDER BY qid, vec_id"
        ),
        "sketch_kmv_union": (
            "WITH h AS (SELECT DISTINCT md5_number_upper(CAST(user_id AS VARCHAR)) AS hv "
            "FROM events WHERE event_type IN ('click', 'purchase')), "
            "k AS (SELECT hv FROM h ORDER BY hv LIMIT 64), "
            "s AS (SELECT count(*) AS c, max(hv) AS kth FROM k), "
            "ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events "
            "WHERE event_type IN ('click', 'purchase')) "
            "SELECT CASE WHEN c < 64 THEN CAST(c AS DOUBLE) "
            "ELSE round(63 / (CAST(kth AS DOUBLE) / 18446744073709551616.0), 4) END "
            "AS est_union_users, (SELECT n FROM ex) AS exact_union_users FROM s"
        ),
        "sketch_kmv_intersect": (
            # deterministic md5 KMV theta intersection, k=64; joint
            # theta = smaller k-th hash of the FULL sides, estimate =
            # |common below theta| / theta; exact via INTERSECT
            "WITH ha AS (SELECT DISTINCT md5_number_upper(CAST(user_id AS VARCHAR)) AS h "
            "FROM events WHERE event_type = 'click'), "
            "hb AS (SELECT DISTINCT md5_number_upper(CAST(user_id AS VARCHAR)) AS h "
            "FROM events WHERE event_type = 'purchase'), "
            "ak AS (SELECT h FROM ha ORDER BY h LIMIT 64), "
            "bk AS (SELECT h FROM hb ORDER BY h LIMIT 64), "
            "thr AS (SELECT CASE "
            "WHEN (SELECT count(*) FROM ha) >= 64 AND (SELECT count(*) FROM hb) >= 64 "
            "THEN least((SELECT max(h) FROM ak), (SELECT max(h) FROM bk)) "
            "WHEN (SELECT count(*) FROM ha) >= 64 THEN (SELECT max(h) FROM ak) "
            "WHEN (SELECT count(*) FROM hb) >= 64 THEN (SELECT max(h) FROM bk) "
            "ELSE NULL END AS t), "
            "common AS (SELECT h FROM ak INTERSECT SELECT h FROM bk), "
            "ret AS (SELECT CAST(count(*) AS BIGINT) AS r FROM common "
            "WHERE (SELECT t FROM thr) IS NULL OR h < (SELECT t FROM thr)), "
            "ex AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ("
            "SELECT user_id FROM events WHERE event_type = 'click' "
            "INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase')) "
            "SELECT round(CASE WHEN (SELECT t FROM thr) IS NULL "
            "THEN (SELECT r FROM ret) * 1.0 "
            "ELSE (SELECT r FROM ret) / ((SELECT t FROM thr) / 18446744073709551616.0) END, 4) "
            "AS est_common_users, "
            "round(CASE WHEN (SELECT t FROM thr) IS NULL THEN 1.0 "
            "ELSE (SELECT t FROM thr) / 18446744073709551616.0 END, 6) AS theta, "
            "(SELECT n FROM ex) AS exact_common_users"
        ),
        "r70_winsorize": (
            "WITH q AS (SELECT event_type, "
            "quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi "
            "FROM events GROUP BY event_type) "
            "SELECT e.event_type, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(e.value) / count(*), 4) AS mean_raw, "
            "round(sum(least(greatest(e.value, q.lo), q.hi)) / count(*), 4) AS mean_winsorized "
            "FROM events e JOIN q ON e.event_type = q.event_type "
            "GROUP BY e.event_type ORDER BY e.event_type"
        ),
        "s88_msearch": (
            "SELECT 0 AS qid, * FROM (" + _bm25_sql(["vector"], k=5) + ") "
            "UNION ALL SELECT 1, * FROM (" + _bm25_sql(["hash"], k=5) + ") "
            "UNION ALL SELECT 2, * FROM ("
            + _bm25_sql(["spark", "window"], mode="should", k=5) + ")"
        ),
        "s86_has_child": (
            "SELECT o_orderkey, o_orderpriority, "
            "CAST(c.n_children AS BIGINT) AS n_children FROM orders JOIN "
            "(SELECT l_orderkey, count(*) AS n_children FROM lineitem "
            "WHERE l_returnflag = 'R' AND l_quantity >= 45 "
            "GROUP BY l_orderkey HAVING count(*) >= 2) c "
            "ON o_orderkey = c.l_orderkey ORDER BY o_orderkey LIMIT 10"
        ),
        "s87_has_parent": (
            "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, "
            "o_orderpriority FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F' "
            "ORDER BY l_orderkey, l_linenumber LIMIT 10"
        ),
        "t_bpe_train": (
            # three unrolled BPE rounds: pair counts weighted by token
            # frequency, best pair by (count desc, pair asc), spaced-
            # string replace (same non-overlapping left-to-right
            # semantics as the Arrow kernel)
            "WITH tok AS (SELECT doc_id, " + _TOKS.format(col="text") + " AS ts FROM documents), "
            "ex AS (SELECT unnest(ts) AS tok FROM tok), "
            "tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM ex GROUP BY tok), "
            "v0 AS (SELECT array_to_string([tok[i] for i in range(1, len(tok)+1)], ' ') AS s, tf FROM tf), "
            "p1 AS (SELECT pr AS pair, CAST(sum(tf) AS BIGINT) AS w FROM "
            "(SELECT unnest([ps[i] || ' ' || ps[i+1] for i in range(1, len(ps))]) AS pr, tf "
            "FROM (SELECT str_split(s, ' ') AS ps, tf FROM v0)) GROUP BY pr), "
            "b1 AS (SELECT pair, w FROM p1 ORDER BY w DESC, pair LIMIT 1), "
            "v1 AS (SELECT trim(replace(' ' || s || ' ', ' ' || (SELECT pair FROM b1) || ' ', "
            "' ' || (SELECT replace(pair, ' ', '') FROM b1) || ' ')) AS s, tf FROM v0), "
            "p2 AS (SELECT pr AS pair, CAST(sum(tf) AS BIGINT) AS w FROM "
            "(SELECT unnest([ps[i] || ' ' || ps[i+1] for i in range(1, len(ps))]) AS pr, tf "
            "FROM (SELECT str_split(s, ' ') AS ps, tf FROM v1)) GROUP BY pr), "
            "b2 AS (SELECT pair, w FROM p2 ORDER BY w DESC, pair LIMIT 1), "
            "v2 AS (SELECT trim(replace(' ' || s || ' ', ' ' || (SELECT pair FROM b2) || ' ', "
            "' ' || (SELECT replace(pair, ' ', '') FROM b2) || ' ')) AS s, tf FROM v1), "
            "p3 AS (SELECT pr AS pair, CAST(sum(tf) AS BIGINT) AS w FROM "
            "(SELECT unnest([ps[i] || ' ' || ps[i+1] for i in range(1, len(ps))]) AS pr, tf "
            "FROM (SELECT str_split(s, ' ') AS ps, tf FROM v2)) GROUP BY pr), "
            "b3 AS (SELECT pair, w FROM p3 ORDER BY w DESC, pair LIMIT 1) "
            "SELECT CAST(1 AS BIGINT) AS step, pair, w FROM b1 "
            "UNION ALL SELECT 2, pair, w FROM b2 "
            "UNION ALL SELECT 3, pair, w FROM b3 ORDER BY step"
        ),
        "pipe_fineweb": rf"""
WITH w AS (
  SELECT doc_id, lang, coalesce(text, '') AS tx,
         regexp_extract_all(coalesce(text, ''), '\S+') AS ws,
         str_split(coalesce(text, ''), chr(10)) AS ls
  FROM documents),
m AS (
  SELECT doc_id, lang, len(ws) AS n_words,
    CASE WHEN len(ws) > 0 THEN CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE) / len(ws) ELSE 0 END AS mean_word_len,
    CASE WHEN len(ws) > 0 THEN CAST(len(regexp_extract_all(tx, '#')) + len(regexp_extract_all(tx, '\.\.\.')) AS DOUBLE) / len(ws) ELSE 0 END AS symbol_word_ratio,
    CASE WHEN len(ls) > 0 THEN CAST(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE) / len(ls) ELSE 0 END AS bullet_line_frac,
    CASE WHEN len(ls) > 0 THEN CAST(len(list_filter(ls, l -> regexp_matches(l, '\.\.\.\s*$'))) AS DOUBLE) / len(ls) ELSE 0 END AS ellipsis_line_frac,
    CASE WHEN len(ws) > 0 THEN CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(ws) ELSE 0 END AS alpha_word_frac,
    ({_stop_hits}) AS n_stop_hits
  FROM (SELECT doc_id, lang, tx, ws, ls, list_transform(ws, x -> lower(x)) AS lws FROM w)),
pass AS (SELECT doc_id FROM m WHERE n_words >= 15
  AND mean_word_len >= 3.0 AND mean_word_len <= 10.0 AND symbol_word_ratio <= 0.1
  AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
  AND alpha_word_frac >= 0.8 AND n_stop_hits >= 1),
tok AS (SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+') AS ts FROM documents),
sh AS (SELECT doc_id, CASE WHEN len(ts) >= 3 THEN
    list_distinct(list_transform(range(1, len(ts) - 1), j -> ts[j] || ' ' || ts[j+1] || ' ' || ts[j+2]))
  WHEN len(ts) > 0 THEN [array_to_string(ts, ' ')] ELSE [] END AS shingles FROM tok),
e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
ev AS (SELECT DISTINCT s FROM e WHERE doc_id % 97 = 0),
cont AS (SELECT DISTINCT doc_id FROM e JOIN ev USING (s)),
clean AS (SELECT d.doc_id, d.text, d.lang FROM documents d JOIN pass USING (doc_id)
  WHERE d.doc_id NOT IN (SELECT doc_id FROM cont)),
surv AS (SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text))
SELECT c.lang, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(m.n_words) AS BIGINT) AS total_words
FROM clean c JOIN surv USING (doc_id) JOIN m USING (doc_id)
GROUP BY c.lang ORDER BY c.lang
""",
        "s85_search_as_you_type": (
            # bool_prefix tail over the _2gram shingle field: prefix
            # expansions each score with their own idf and sum
            "WITH tok AS (SELECT doc_id, " + _TOKS.format(col="text") + " AS ts FROM documents), "
            "bg AS (SELECT doc_id, [ts[i] || '_' || ts[i+1] for i in range(1, len(ts))] AS bs FROM tok), "
            "d AS (SELECT doc_id, len(bs) * 1.0 AS dl FROM bg), "
            "s AS (SELECT count(*) AS n, sum(dl) AS total_len FROM d), "
            "ex AS (SELECT doc_id, unnest(bs) AS b FROM bg), "
            "m AS (SELECT doc_id, b, count(*) * 1.0 AS tf FROM ex "
            "WHERE starts_with(b, 'vector_s') GROUP BY doc_id, b), "
            "bdf AS (SELECT b, count(*) * 1.0 AS df FROM m GROUP BY b), "
            "sc AS (SELECT m.doc_id, sum(ln(1 + (s.n - bdf.df + 0.5) / (bdf.df + 0.5)) "
            "* m.tf * 2.2 / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))) AS raw "
            "FROM m JOIN bdf ON m.b = bdf.b JOIN d ON d.doc_id = m.doc_id, s "
            "GROUP BY m.doc_id) "
            "SELECT doc_id, round(raw, 4) AS score FROM sc "
            "ORDER BY round(raw, 4) DESC, doc_id LIMIT 10"
        ),
        "t_dsir_sample": (
            # DSIR hashed-unigram importance resampling: 64 md5
            # buckets, add-1 smoothed ln(p/q), Gumbel top-50 with a
            # deterministic md5 Gumbel (same op order as the Ray side)
            "WITH tok AS (SELECT doc_id, lang, source, " + _TOKS.format(col="text") + " AS ts FROM documents), "
            "ex AS (SELECT doc_id, lang, source, "
            "CAST(md5_number_upper(unnest(ts)) % 64 AS BIGINT) AS bkt FROM tok), "
            "rawc AS (SELECT bkt, count(*) * 1.0 AS c FROM ex GROUP BY bkt), "
            "tgtc AS (SELECT bkt, count(*) * 1.0 AS c FROM ex "
            "WHERE lang = 'en' AND source = 'src1' GROUP BY bkt), "
            "tots AS (SELECT (SELECT coalesce(sum(c), 0) FROM rawc) AS rt, "
            "(SELECT coalesce(sum(c), 0) FROM tgtc) AS tt), "
            "lr AS (SELECT rawc.bkt, "
            "ln((coalesce(tgtc.c, 0) + 1.0) / (tots.tt + 64)) "
            "- ln((rawc.c + 1.0) / (tots.rt + 64)) AS w "
            "FROM rawc LEFT JOIN tgtc ON rawc.bkt = tgtc.bkt, tots), "
            "dw AS (SELECT ex.doc_id, sum(lr.w) AS logw FROM ex "
            "JOIN lr ON ex.bkt = lr.bkt GROUP BY ex.doc_id), "
            "keyed AS (SELECT doc_id, logw, round(logw + "
            "(-ln(-ln((md5_number_upper('dsir:' || doc_id) + 1.0) / 18446744073709551618.0))), 6) AS key "
            "FROM dw) "
            "SELECT doc_id, round(logw, 4) AS logw FROM keyed "
            "ORDER BY key DESC, doc_id LIMIT 50"
        ),
        "s82_dis_max": (
            # dis_max tie_breaker=0.3: greatest + 0.3 * least of the
            # two per-field BM25 sub-scores (field norms as s77)
            "WITH tok AS (SELECT doc_id, source, " + _TOKS.format(col="text") + " AS ts FROM documents), "
            "d AS (SELECT doc_id, len(ts) * 1.0 AS dl, "
            "len(list_filter(ts, t -> t = 'vector')) * 1.0 AS tt0, "
            "CASE WHEN source = 'src3' THEN 1.0 ELSE 0.0 END AS sv0 FROM tok), "
            "s AS (SELECT count(*) AS n, sum(dl) AS total_len, "
            "count(*) FILTER (WHERE tt0 > 0) AS dft0, "
            "count(*) FILTER (WHERE sv0 > 0) AS dfs0 FROM d), "
            "sc AS (SELECT d.doc_id, "
            "(CASE WHEN tt0 > 0 THEN ln(1 + (s.n - s.dft0 + 0.5) / (s.dft0 + 0.5)) "
            "* tt0 * 2.2 / (tt0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) ELSE 0 END) AS st, "
            "(CASE WHEN sv0 > 0 THEN ln(1 + (s.n - s.dfs0 + 0.5) / (s.dfs0 + 0.5)) "
            "* sv0 * 2.2 / (sv0 + 1.2) ELSE 0 END) AS ss "
            "FROM d, s WHERE tt0 > 0 OR sv0 > 0) "
            "SELECT doc_id, round(greatest(st, ss) + 0.3 * least(st, ss), 4) AS score "
            "FROM sc ORDER BY (greatest(st, ss) + 0.3 * least(st, ss)) DESC, doc_id "
            "LIMIT 10"
        ),
        "s83_script_score": (
            # script_score: bm25 * (1 + ln(1 + n_chars/1000))
            "WITH tok AS (SELECT doc_id, n_chars, " + _TOKS.format(col="text") + " AS ts FROM documents), "
            "d AS (SELECT doc_id, n_chars, len(ts) * 1.0 AS dl, "
            "len(list_filter(ts, t -> t = 'hash')) * 1.0 AS tf0 FROM tok), "
            "s AS (SELECT count(*) AS n, sum(dl) AS total_len, "
            "count(*) FILTER (WHERE tf0 > 0) AS df0 FROM d), "
            "sc AS (SELECT d.doc_id, "
            "(ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 / "
            "(tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))) "
            "* (1 + ln(1 + d.n_chars / 1000.0)) AS raw "
            "FROM d, s WHERE tf0 > 0) "
            "SELECT doc_id, round(raw, 4) AS score FROM sc "
            "ORDER BY raw DESC, doc_id LIMIT 10"
        ),
        "s84_more_like_this": (
            # MLT: top-5 tf*idf terms of doc 42 -> should query,
            # source doc excluded; selection ties break on the term,
            # the page on the 4dp-rounded score
            "WITH tok AS (SELECT doc_id, " + _TOKS.format(col="text") + " AS ts FROM documents), "
            "ex AS (SELECT doc_id, unnest(ts) AS tok FROM tok), "
            "d AS (SELECT doc_id, len(ts) * 1.0 AS dl FROM tok), "
            "s AS (SELECT count(*) AS n, sum(dl) AS total_len FROM d), "
            "src AS (SELECT tok, count(*) * 1.0 AS tf FROM ex WHERE doc_id = 42 GROUP BY tok), "
            "cdf AS (SELECT tok, count(DISTINCT doc_id) * 1.0 AS df FROM ex "
            "WHERE tok IN (SELECT tok FROM src) GROUP BY tok), "
            "sel AS (SELECT src.tok, cdf.df FROM src JOIN cdf ON src.tok = cdf.tok, s "
            "ORDER BY round(src.tf * ln(1 + (s.n - cdf.df + 0.5) / (cdf.df + 0.5)), 6) DESC, src.tok "
            "LIMIT 5), "
            "tfs AS (SELECT ex.doc_id, ex.tok, count(*) * 1.0 AS tf FROM ex "
            "JOIN sel ON ex.tok = sel.tok GROUP BY ex.doc_id, ex.tok), "
            "sc AS (SELECT tfs.doc_id, sum(ln(1 + (s.n - sel.df + 0.5) / (sel.df + 0.5)) "
            "* tfs.tf * 2.2 / (tfs.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n)))) AS raw "
            "FROM tfs JOIN sel ON tfs.tok = sel.tok JOIN d ON d.doc_id = tfs.doc_id, s "
            "GROUP BY tfs.doc_id) "
            "SELECT doc_id, round(raw, 4) AS score FROM sc WHERE doc_id <> 42 "
            "ORDER BY round(raw, 4) DESC, doc_id LIMIT 10"
        ),
        "r67_geotile_grid": (
            "WITH pt AS (SELECT "
            "(md5_number_upper(CAST(c_custkey AS VARCHAR)) / 18446744073709551616.0) "
            "* 180.0 - 90.0 AS lat, "
            "(md5_number_upper(CAST(c_custkey AS VARCHAR) || ':lon') / 18446744073709551616.0) "
            "* 360.0 - 180.0 AS lon FROM customer), "
            "cl AS (SELECT greatest(least(lat, 85.05112878), -85.05112878) AS lat, lon FROM pt), "
            "xy AS (SELECT CAST(least(greatest(floor((lon + 180.0) / 360.0 * 16), 0), 15) AS BIGINT) AS x, "
            "CAST(least(greatest(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 16), 0), 15) AS BIGINT) AS y FROM cl) "
            "SELECT '4/' || x || '/' || y AS key, CAST(count(*) AS BIGINT) AS doc_count "
            "FROM xy GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 10"
        ),
        "pipe_tpch_q2": (
            "WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) "
            "SELECT s_acctbal, s_name, n_name, p_partkey, p_name "
            "FROM part, supplier, nation, region, ps "
            "WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey "
            "AND p_size <= 5 AND p_type = 'LARGE' "
            "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
            "AND r_name = 'EUROPE' "
            "AND s_acctbal = (SELECT min(s_acctbal) "
            "FROM supplier s2, nation n2, region r2, ps ps2 "
            "WHERE p_partkey = ps2.l_partkey AND s2.s_suppkey = ps2.l_suppkey "
            "AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey "
            "AND r2.r_name = 'EUROPE') "
            "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"
        ),
        "pipe_tpch_q11": (
            "WITH v AS (SELECT l_partkey, sum(l_quantity * p_retailprice) AS value "
            "FROM lineitem, part, supplier, nation "
            "WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey "
            "AND s_nationkey = n_nationkey AND n_name = 'NATION_3' "
            "GROUP BY l_partkey) "
            "SELECT l_partkey, round(value, 4) AS value FROM v "
            "WHERE round(value, 4) > (SELECT round(2.0 * sum(value) / count(*), 4) FROM v) "
            "ORDER BY round(value, 4) DESC, l_partkey"
        ),
        "pipe_tpch_q16": (
            "WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) "
            "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM ps, part WHERE p_partkey = ps.l_partkey "
            "AND p_brand <> 'Brand#15' AND p_type <> 'PROMO' "
            "AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45) "
            "GROUP BY p_brand, p_type, p_size "
            "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
        ),
        "pipe_tpch_q19": (
            "SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue "
            "FROM lineitem, part WHERE p_partkey = l_partkey AND ("
            "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 "
            "AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 "
            "AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 "
            "AND l_quantity BETWEEN 20 AND 30))"
        ),
        "pipe_tpch_q20": (
            "SELECT s_name, CAST(q.qty AS BIGINT) AS qty FROM supplier JOIN "
            "(SELECT l_suppkey, sum(l_quantity) AS qty FROM lineitem, part "
            "WHERE p_partkey = l_partkey AND p_name LIKE 'blue%' "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "GROUP BY l_suppkey HAVING sum(l_quantity) > 100) q "
            "ON s_suppkey = q.l_suppkey ORDER BY s_name"
        ),
        "pipe_tpch_q21": (
            "WITH l AS (SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem "
            "JOIN orders ON o_orderkey = l_orderkey WHERE o_orderstatus = 'F'), "
            "g AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS ns, "
            "count(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R') AS nr, "
            "min(l_suppkey) FILTER (WHERE l_returnflag = 'R') AS rs "
            "FROM l GROUP BY l_orderkey) "
            "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait "
            "FROM g JOIN supplier ON s_suppkey = rs WHERE ns >= 2 AND nr = 1 "
            "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
        ),
        "pipe_tpch_q7": (
            "SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue "
            "FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "EXTRACT(year FROM l_shipdate) AS l_year, "
            "l_extendedprice * (1 - l_discount) AS volume "
            "FROM supplier, lineitem, orders, customer, nation n1, nation n2 "
            "WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey "
            "AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey "
            "AND c_nationkey = n2.n_nationkey "
            "AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8') "
            "OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')) "
            "AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' "
            "AND TIMESTAMP '1997-12-31 23:59:59.999999') shipping "
            "GROUP BY supp_nation, cust_nation, l_year "
            "ORDER BY supp_nation, cust_nation, l_year"
        ),
        "pipe_tpch_q8": (
            "SELECT o_year, round(sum(CASE WHEN nation = 'NATION_3' THEN volume "
            "ELSE 0 END) / sum(volume), 6) AS mkt_share "
            "FROM (SELECT EXTRACT(year FROM o_orderdate) AS o_year, "
            "l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation "
            "FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region "
            "WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey "
            "AND l_orderkey = o_orderkey AND o_custkey = c_custkey "
            "AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey "
            "AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey "
            "AND p_type = 'ECONOMY' AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' "
            "AND TIMESTAMP '1997-12-31 23:59:59.999999') all_nations "
            "GROUP BY o_year ORDER BY o_year"
        ),
        "pipe_tpch_q9": (
            "SELECT nation, o_year, round(sum(amount), 4) AS sum_profit "
            "FROM (SELECT n_name AS nation, "
            "EXTRACT(year FROM o_orderdate) AS o_year, "
            "l_extendedprice * (1 - l_discount) "
            "- 0.1 * p_retailprice * l_quantity AS amount "
            "FROM part, supplier, lineitem, orders, nation "
            "WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey "
            "AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey "
            "AND p_name LIKE '%widget%') profit "
            "GROUP BY nation, o_year ORDER BY nation, o_year DESC"
        ),
        "pipe_tpch_q12": (
            "SELECT l_linestatus, "
            "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
            "FROM orders, lineitem WHERE o_orderkey = l_orderkey "
            "AND l_shipdate > o_orderdate + INTERVAL 60 DAY "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "GROUP BY l_linestatus ORDER BY l_linestatus"
        ),
        "pipe_tpch_q13": (
            "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM ("
            "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "AND o_orderpriority <> '3-MEDIUM' GROUP BY c_custkey) "
            "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
        ),
        "pipe_tpch_q15": (
            "WITH revenue AS (SELECT l_suppkey AS supplier_no, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, total_revenue FROM supplier, revenue "
            "WHERE s_suppkey = supplier_no "
            "AND total_revenue = (SELECT max(total_revenue) FROM revenue) "
            "ORDER BY s_suppkey"
        ),
        "pipe_tpch_q17": (
            "SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly "
            "FROM lineitem, part WHERE p_partkey = l_partkey "
            "AND p_brand = 'Brand#13' AND l_quantity < round(0.2 * ("
            "SELECT avg(l_quantity) FROM lineitem l2 "
            "WHERE l2.l_partkey = p_partkey), 6)"
        ),
        "pipe_tpch_q18": (
            "SELECT c_name, c_custkey, o_orderkey, "
            "epoch_us(o_orderdate) AS o_orderdate, o_totalprice, "
            "CAST(sq.sum_qty AS BIGINT) AS sum_qty "
            "FROM customer, orders, (SELECT l_orderkey, sum(l_quantity) AS sum_qty "
            "FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180) sq "
            "WHERE o_orderkey = sq.l_orderkey AND c_custkey = o_custkey "
            "ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100"
        ),
        "pipe_tpch_q22": (
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(count(*) AS BIGINT) AS numcust, "
            "round(sum(c_acctbal), 4) AS totacctbal "
            "FROM customer WHERE c_nationkey IN (1,3,5,7,9,11,13) "
            "AND c_acctbal > (SELECT avg(c_acctbal) FROM customer "
            "WHERE c_acctbal > 0.0 AND c_nationkey IN (1,3,5,7,9,11,13)) "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND o_orderpriority = '1-URGENT') "
            "GROUP BY c_nationkey ORDER BY c_nationkey"
        ),
        # round-4 statistics / aggregation wave
        "r74_grouped_ols": (
            "WITH b AS (SELECT event_type, "
            "(epoch_us(ts) - 1704067200000000) / 86400000000.0 AS x, "
            "value AS y FROM events), "
            "m AS (SELECT event_type, count(*) * 1.0 AS n, sum(x) AS sx, "
            "sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy "
            "FROM b GROUP BY event_type) "
            "SELECT event_type, CAST(n AS BIGINT) AS n, "
            "round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS slope, "
            "round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 4) AS intercept, "
            "round(pow(n*sxy - sx*sy, 2) / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 4) AS r2 "
            "FROM m ORDER BY event_type"
        ),
        "r75_matrix_stats": (
            "WITH m AS (SELECT sum(l_quantity)/count(*) AS mq, "
            "sum(l_discount)/count(*) AS md, sum(l_tax)/count(*) AS mt, "
            "count(*) * 1.0 AS n FROM lineitem), "
            "c AS (SELECT l_quantity - mq AS q, l_discount - md AS d, "
            "l_tax - mt AS t, n FROM lineitem, m), "
            "s AS (SELECT any_value(n) AS n, sum(q*q) AS sqq, sum(d*d) AS sdd, "
            "sum(t*t) AS stt, sum(q*d) AS sqd, sum(q*t) AS sqt, sum(d*t) AS sdt FROM c) "
            "SELECT f1, f2, round(cp / (n - 1.0), 4) AS covar, "
            "round(cp / sqrt(v1 * v2), 4) AS corr FROM ("
            "SELECT 'l_quantity' AS f1, 'l_discount' AS f2, sqd AS cp, sqq AS v1, sdd AS v2, n FROM s "
            "UNION ALL SELECT 'l_quantity', 'l_tax', sqt, sqq, stt, n FROM s "
            "UNION ALL SELECT 'l_discount', 'l_tax', sdt, sdd, stt, n FROM s) "
            "ORDER BY f1, f2"
        ),
        "r76_anova": (
            "WITH g AS (SELECT event_type, count(*) * 1.0 AS n, sum(value) AS s, "
            "sum(value * value) AS sq FROM events GROUP BY event_type), "
            "tot AS (SELECT sum(n) AS ntot, count(*) * 1.0 AS k, "
            "sum(s) / sum(n) AS grand FROM g) "
            "SELECT CAST(k AS BIGINT) AS k, CAST(ntot AS BIGINT) AS n, "
            "round(((SELECT sum(n * pow(s / n - grand, 2)) FROM g, tot) / (k - 1.0)) "
            "/ ((SELECT sum(sq - n * pow(s / n, 2)) FROM g) / (ntot - k)), 4) AS f_stat "
            "FROM tot"
        ),
        "r77_percentiles_bucket": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day) "
            "SELECT unnest([25, 50, 75]) AS p, "
            "unnest([round(quantile_cont(s, 0.25), 4), "
            "round(quantile_cont(s, 0.50), 4), "
            "round(quantile_cont(s, 0.75), 4)]) AS v FROM d"
        ),
        "r78_entropy": (
            "WITH c AS (SELECT user_id, event_type, count(*) * 1.0 AS c "
            "FROM events GROUP BY user_id, event_type), "
            "n AS (SELECT user_id, sum(c) AS n FROM c GROUP BY user_id) "
            "SELECT c.user_id, CAST(any_value(n.n) AS BIGINT) AS n_events, "
            "round(-sum((c.c / n.n) * ln(c.c / n.n)), 4) AS entropy "
            "FROM c JOIN n ON c.user_id = n.user_id "
            "GROUP BY c.user_id ORDER BY c.user_id"
        ),
        "s89_terms_enum": (
            f"WITH tk AS (SELECT unnest({toks}) AS tok FROM documents) "
            "SELECT DISTINCT tok AS term FROM tk WHERE tok LIKE 's%' "
            "ORDER BY term LIMIT 20"
        ),
        "r79_ks_test": (
            "WITH f AS (SELECT value, "
            "count(*) FILTER (WHERE event_type = 'purchase') AS c1, "
            "count(*) FILTER (WHERE event_type = 'click') AS c2 "
            "FROM events WHERE event_type IN ('purchase', 'click') "
            "GROUP BY value), "
            "o AS (SELECT sum(c1) OVER (ORDER BY value) * 1.0 "
            "/ (SELECT sum(c1) FROM f) AS f1, "
            "sum(c2) OVER (ORDER BY value) * 1.0 "
            "/ (SELECT sum(c2) FROM f) AS f2 FROM f) "
            "SELECT CAST((SELECT sum(c1) FROM f) AS BIGINT) AS n1, "
            "CAST((SELECT sum(c2) FROM f) AS BIGINT) AS n2, "
            "round(max(abs(f1 - f2)), 4) AS d_stat FROM o"
        ),
        "dedup_containment": _CONTAINMENT_ALLPAIRS_SQL,
        "e20_orc_source": (
            "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt, "
            "round(sum(c_acctbal), 4) AS sum_bal "
            "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "r92_ewma": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "r AS (SELECT day, s, row_number() OVER (ORDER BY day) AS t FROM d), "
            # closed form: s_t = (1-a)^(t-1) * x_1 + a * sum_{i=2..t} (1-a)^(t-i) * x_i
            "e AS (SELECT a.day, a.s, pow(0.7, a.t - 1) * "
            "(SELECT s FROM r WHERE t = 1) "
            "+ coalesce((SELECT sum(0.3 * pow(0.7, a.t - b.t) * b.s) "
            "FROM r b WHERE b.t > 1 AND b.t <= a.t), 0) AS ew FROM r a) "
            "SELECT day, round(s, 4) AS s, round(ew, 4) AS ewma FROM e ORDER BY day"
        ),
        # ---- round-5 wave 1 ----
        "r93_date_range": (
            "SELECT band, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(value), 4) AS sum_value FROM ("
            "SELECT CASE WHEN ts < TIMESTAMP '2024-01-10' THEN '*-2024-01-10' "
            "WHEN ts < TIMESTAMP '2024-01-20' THEN '2024-01-10-2024-01-20' "
            "ELSE '2024-01-20-*' END AS band, value FROM events) "
            "GROUP BY band ORDER BY band"
        ),
        "r94_first_last": (
            "SELECT event_id, user_id, "
            "first_value(event_type) OVER w AS first_et, "
            "last_value(event_type) OVER w AS last_et, "
            "nth_value(event_type, 2) OVER w AS second_et "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
            "ORDER BY event_id"
        ),
        "r95_spearman": (
            "WITH r AS (SELECT "
            "rank() OVER (ORDER BY l_quantity) "
            "+ (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rx, "
            "rank() OVER (ORDER BY l_extendedprice) "
            "+ (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS ry "
            "FROM lineitem) "
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            "round(corr(rx, ry), 4) AS spearman_rho FROM r"
        ),
        "r96_kruskal": (
            "WITH r AS (SELECT event_type, "
            "rank() OVER (ORDER BY value) "
            "+ (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS rk FROM events), "
            "g AS (SELECT event_type, sum(rk) AS rsum, count(*) * 1.0 AS ng "
            "FROM r GROUP BY event_type), "
            "tot AS (SELECT count(*) * 1.0 AS n FROM events), "
            "ties AS (SELECT coalesce(sum(c * c * c - c), 0) * 1.0 AS tc FROM "
            "(SELECT count(*) AS c FROM events GROUP BY value) tt), "
            "h AS (SELECT (12.0 / (tot.n * (tot.n + 1)) * "
            "(SELECT sum(rsum * rsum / ng) FROM g) - 3.0 * (tot.n + 1)) "
            "/ (1.0 - ties.tc / (pow(tot.n, 3) - tot.n)) AS hs "
            "FROM tot, ties) "
            "SELECT g.event_type, CAST(g.ng AS BIGINT) AS n_g, "
            "round(g.rsum / g.ng, 4) AS mean_rank, "
            "round((SELECT hs FROM h), 4) AS h_stat "
            "FROM g ORDER BY g.event_type"
        ),
        "t_url_filter": (
            "SELECT source || '.example.com' AS domain, "
            "source || '.example.com' IN "
            "('src1.example.com', 'src4.example.com', 'src7.example.com') AS blocked, "
            "CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY 1, 2 ORDER BY domain"
        ),
        "r97_theil_sen": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "sl AS (SELECT (b.s - a.s) / (b.day - a.day) AS m "
            "FROM d a JOIN d b ON b.day > a.day), "
            "ts AS (SELECT median(m) AS slope FROM sl) "
            "SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days, "
            "round((SELECT slope FROM ts), 4) AS slope, "
            "round((SELECT median(s - (SELECT slope FROM ts) * day) FROM d), 4) AS intercept"
        ),
        "r98_mann_whitney": (
            "WITH f AS (SELECT event_type, value FROM events "
            "WHERE event_type IN ('purchase', 'click')), "
            "r AS (SELECT event_type, rank() OVER (ORDER BY value) "
            "+ (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS rk FROM f), "
            "g AS (SELECT sum(rk) FILTER (WHERE event_type = 'purchase') AS r1, "
            "count(*) FILTER (WHERE event_type = 'purchase') * 1.0 AS n1, "
            "count(*) FILTER (WHERE event_type = 'click') * 1.0 AS n2 FROM r), "
            "ties AS (SELECT coalesce(sum(c * c * c - c), 0) * 1.0 AS tc "
            "FROM (SELECT count(*) AS c FROM f GROUP BY value) t) "
            "SELECT CAST(g.n1 AS BIGINT) AS n1, CAST(g.n2 AS BIGINT) AS n2, "
            "round(g.r1 - g.n1 * (g.n1 + 1) / 2.0, 4) AS u_stat, "
            "round((g.r1 - g.n1 * (g.n1 + 1) / 2.0 - g.n1 * g.n2 / 2.0) "
            "/ sqrt(g.n1 * g.n2 / 12.0 * ((g.n1 + g.n2 + 1) "
            "- ties.tc / ((g.n1 + g.n2) * (g.n1 + g.n2 - 1)))), 4) AS z_stat "
            "FROM g, ties"
        ),
        "e22_gzip_csv": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(value), 4) AS sum_value "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "r99_holt": (
            "WITH RECURSIVE d0 AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "d AS (SELECT day, round(s, 4) AS s FROM d0), "
            "r AS (SELECT day, s, row_number() OVER (ORDER BY day) AS t FROM d), "
            "init AS (SELECT coalesce((SELECT s FROM r WHERE t = 2) "
            "- (SELECT s FROM r WHERE t = 1), 0.0) AS tr0), "
            # the engine's recursion replayed verbatim: lvl' = a*x +
            # (1-a)*(lvl+tr); tr' = b*(lvl'-lvl) + (1-b)*tr
            "h(t, day, x, lvl, tr) AS ("
            "SELECT r.t, r.day, r.s, r.s, (SELECT tr0 FROM init) FROM r WHERE r.t = 1 "
            "UNION ALL "
            "SELECT r.t, r.day, r.s, "
            "0.5 * r.s + 0.5 * (h.lvl + h.tr), "
            "0.3 * ((0.5 * r.s + 0.5 * (h.lvl + h.tr)) - h.lvl) + 0.7 * h.tr "
            "FROM h JOIN r ON r.t = h.t + 1) "
            "SELECT day, round(x, 4) AS s, round(lvl, 4) AS holt FROM h ORDER BY day"
        ),
        "r100_levene": (
            "WITH m AS (SELECT event_type, avg(value) AS mu FROM events GROUP BY 1), "
            "z AS (SELECT e.event_type, abs(e.value - m.mu) AS z "
            "FROM events e JOIN m USING (event_type)), "
            "g AS (SELECT event_type, count(*) * 1.0 AS n, sum(z) AS zs, "
            "sum(z * z) AS zsq FROM z GROUP BY 1), "
            "tot AS (SELECT sum(n) AS nn, count(*) * 1.0 AS k, "
            "sum(zs) / sum(n) AS zbar FROM g), "
            "f AS (SELECT (sum(g.n * pow(g.zs / g.n - tot.zbar, 2)) / (tot.k - 1)) "
            "/ (sum(g.zsq - g.n * pow(g.zs / g.n, 2)) / (tot.nn - tot.k)) AS fs "
            "FROM g, tot GROUP BY tot.k, tot.nn, tot.zbar) "
            "SELECT g.event_type, CAST(g.n AS BIGINT) AS n, "
            "round(g.zs / g.n, 4) AS mean_absdev, "
            "round((SELECT fs FROM f), 4) AS f_stat "
            "FROM g ORDER BY g.event_type"
        ),
        "r101_seasonal_decompose": (
            "WITH d0 AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "round(sum(value), 4) AS s FROM events GROUP BY 1), "
            "t AS (SELECT day, s, CASE WHEN count(*) OVER w7 = 7 "
            "THEN round(avg(s) OVER w7, 4) END AS trend FROM d0 "
            "WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), "
            "dt AS (SELECT day, s, trend, ((day % 7) + 7) % 7 AS dow, "
            "s - trend AS detr FROM t), "
            "sm AS (SELECT dow, avg(detr) AS m FROM dt WHERE detr IS NOT NULL GROUP BY dow), "
            "ctr AS (SELECT avg(m) AS mm FROM sm), "
            "sr AS (SELECT dow, round(m - (SELECT mm FROM ctr), 4) AS seas FROM sm) "
            "SELECT dt.day, dt.s, dt.trend, sr.seas AS seasonal, "
            "round(dt.s - dt.trend - sr.seas, 4) AS resid "
            "FROM dt JOIN sr USING (dow) ORDER BY dt.day"
        ),
        "e23_retention_sink": (
            "SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value "
            "FROM events WHERE CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) >= 19735 "
            "GROUP BY 1 ORDER BY day"
        ),
        "r102_bucket_correlation": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "CAST(count(*) FILTER (WHERE event_type = 'click') AS DOUBLE) AS c, "
            "CAST(count(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS p "
            "FROM events GROUP BY day) "
            "SELECT CAST(count(*) AS BIGINT) AS n_days, round(corr(c, p), 4) AS corr FROM d"
        ),
        "s92_terms_include": (
            "SELECT t AS token, CAST(count(*) AS BIGINT) AS cnt FROM (SELECT unnest("
            "regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t FROM documents) "
            "WHERE regexp_matches(t, '^[a-m]') AND t <> 'sort' AND md5_number_upper(t) % 2 = 0 "
            "GROUP BY t ORDER BY cnt DESC, token LIMIT 10"
        ),
        "r104_cramers_v": (
            "WITH c AS (SELECT event_type, "
            "((CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) % 7) + 7) % 7 AS dow, "
            "count(*) * 1.0 AS o FROM events GROUP BY 1, 2), "
            "et AS (SELECT DISTINCT event_type FROM events), "
            "dw AS (SELECT DISTINCT ((CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) % 7) + 7) % 7 AS dow FROM events), "
            "f AS (SELECT et.event_type, dw.dow, coalesce(c.o, 0) AS o "
            "FROM et CROSS JOIN dw LEFT JOIN c "
            "ON c.event_type = et.event_type AND c.dow = dw.dow), "
            "t AS (SELECT o, sum(o) OVER (PARTITION BY event_type) AS rt, "
            "sum(o) OVER (PARTITION BY dow) AS ct, sum(o) OVER () AS n FROM f), "
            "x AS (SELECT any_value(n) AS n, "
            "sum(pow(o - rt * ct / n, 2) / (rt * ct / n)) AS chi2 FROM t), "
            "k AS (SELECT least((SELECT count(*) FROM et) - 1, "
            "(SELECT count(*) FROM dw) - 1) * 1.0 AS mk) "
            "SELECT CAST(x.n AS BIGINT) AS n, round(x.chi2, 4) AS chi2, "
            "round(sqrt(x.chi2 / (x.n * k.mk)), 4) AS cramers_v FROM x, k"
        ),
        "r105_jarque_bera": (
            "WITH m AS (SELECT event_type, avg(value) AS mu, count(*) * 1.0 AS n "
            "FROM events GROUP BY 1), "
            "c AS (SELECT e.event_type, any_value(m.n) AS n, "
            "sum(pow(e.value - m.mu, 2)) AS s2, "
            "sum(pow(e.value - m.mu, 3)) AS s3, "
            "sum(pow(e.value - m.mu, 4)) AS s4 "
            "FROM events e JOIN m ON m.event_type = e.event_type GROUP BY e.event_type), "
            "s AS (SELECT event_type, n, (s3/n) / pow(s2/n, 1.5) AS g1, "
            "(s4/n) / pow(s2/n, 2) - 3 AS g2 FROM c) "
            "SELECT event_type, CAST(n AS BIGINT) AS n, round(g1, 4) AS skew, "
            "round(g2, 4) AS kurt_excess, "
            "round(n/6.0 * (g1*g1 + g2*g2/4.0), 4) AS jb "
            "FROM s ORDER BY event_type"
        ),
        "r106_cohens_d": (
            "WITH g AS (SELECT CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) % 2 AS grp, "
            "count(*) * 1.0 AS n, avg(value) AS m, var_samp(value) AS v "
            "FROM events GROUP BY 1), "
            "f AS (SELECT max(CASE WHEN grp = 0 THEN n END) AS n0, "
            "max(CASE WHEN grp = 1 THEN n END) AS n1, "
            "max(CASE WHEN grp = 0 THEN m END) AS m0, "
            "max(CASE WHEN grp = 1 THEN m END) AS m1, "
            "max(CASE WHEN grp = 0 THEN v END) AS v0, "
            "max(CASE WHEN grp = 1 THEN v END) AS v1 FROM g), "
            "x AS (SELECT n0, n1, m0, m1, "
            "(m0 - m1) / sqrt(((n0 - 1)*v0 + (n1 - 1)*v1) / (n0 + n1 - 2)) AS d FROM f) "
            "SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1, "
            "round(m0, 4) AS mean0, round(m1, 4) AS mean1, "
            "round(d, 4) AS cohens_d, "
            "round(d * (1 - 3.0/(4.0*(n0 + n1) - 9.0)), 4) AS hedges_g FROM x"
        ),
        "r107_tukey_users": (
            "WITH c AS (SELECT user_id, count(*) * 1.0 AS cnt FROM events GROUP BY 1), "
            "q AS (SELECT count(*) AS nu, quantile_cont(cnt, 0.25) AS q1, "
            "quantile_cont(cnt, 0.75) AS q3 FROM c), "
            "f AS (SELECT nu, q1, q3, q1 - 1.5*(q3 - q1) AS lo, "
            "q3 + 1.5*(q3 - q1) AS hi FROM q) "
            "SELECT CAST(f.nu AS BIGINT) AS n_users, round(f.q1, 4) AS q1, "
            "round(f.q3, 4) AS q3, round(f.lo, 4) AS lo_fence, round(f.hi, 4) AS hi_fence, "
            "CAST(sum(CASE WHEN c.cnt < f.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low, "
            "CAST(sum(CASE WHEN c.cnt > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high "
            "FROM c, f GROUP BY f.nu, f.q1, f.q3, f.lo, f.hi"
        ),
        "t_readability": (
            "WITH tok AS (SELECT regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+') AS ws, "
            "greatest(1, len(regexp_extract_all(coalesce(text, ''), '[.!?]+'))) AS ns "
            "FROM documents), "
            "m AS (SELECT len(ws) * 1.0 AS w, ns * 1.0 AS s, "
            "list_sum(list_transform(ws, x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))) * 1.0 AS syl "
            "FROM tok WHERE len(ws) > 0), "
            "sc AS (SELECT 206.835 - 1.015*(w/s) - 84.6*(syl/w) AS score FROM m) "
            "SELECT CAST(floor(score/10) AS BIGINT) AS bucket, "
            "CAST(count(*) AS BIGINT) AS n_docs, round(avg(score), 4) AS mean_score "
            "FROM sc GROUP BY 1 ORDER BY 1"
        ),
        "r108_kendall_tau": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "count(*) * 1.0 AS x, sum(value) AS y FROM events GROUP BY 1), "
            "p AS (SELECT sum(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END) AS c, "
            "sum(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END) AS dd "
            "FROM d a JOIN d b ON a.day < b.day), "
            "t AS (SELECT count(*) * 1.0 AS n, "
            "(SELECT sum(c * (c - 1) / 2.0) FROM (SELECT count(*) * 1.0 AS c FROM d GROUP BY x)) AS n1, "
            "(SELECT sum(c * (c - 1) / 2.0) FROM (SELECT count(*) * 1.0 AS c FROM d GROUP BY y)) AS n2 "
            "FROM d) "
            "SELECT CAST(t.n AS BIGINT) AS n_days, CAST(p.c AS BIGINT) AS concordant, "
            "CAST(p.dd AS BIGINT) AS discordant, "
            "round((p.c - p.dd) / sqrt((t.n * (t.n - 1) / 2.0 - t.n1) * (t.n * (t.n - 1) / 2.0 - t.n2)), 4) AS tau_b "
            "FROM p, t"
        ),
        "r109_cross_corr": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "count(*) * 1.0 AS x, sum(value) AS y FROM events GROUP BY 1), "
            "l AS (SELECT unnest(range(0, 6)) AS lag), "
            "j AS (SELECT l.lag, a.x AS x, b.y AS y FROM d a CROSS JOIN l "
            "JOIN d b ON b.day = a.day + l.lag) "
            "SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n, "
            "round(corr(x, y), 4) AS r FROM j GROUP BY lag ORDER BY lag"
        ),
        "r110_durbin_watson": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS y FROM events GROUP BY 1), "
            "r AS (SELECT regr_slope(y, day) AS b, regr_intercept(y, day) AS a FROM d), "
            "e AS (SELECT day, y - (r.a + r.b * day) AS e FROM d, r), "
            "w AS (SELECT e, lag(e) OVER (ORDER BY day) AS ep FROM e) "
            "SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days, "
            "round((SELECT b FROM r), 4) AS slope, "
            "round(sum(CASE WHEN ep IS NULL THEN 0 ELSE pow(e - ep, 2) END) / sum(e * e), 4) AS dw "
            "FROM w"
        ),
        "r111_bfs_levels": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y "
            "FROM lineitem a JOIN lineitem b "
            "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey), "
            "u AS (SELECT x, y FROM e UNION ALL SELECT y AS x, x AS y FROM e), "
            "s AS (SELECT min(l_partkey) AS src FROM lineitem), "
            "n1 AS (SELECT DISTINCT u.y AS v FROM u, s WHERE u.x = s.src), "
            "n2 AS (SELECT DISTINCT u.y AS v FROM u JOIN n1 ON u.x = n1.v "
            "WHERE u.y NOT IN (SELECT v FROM n1) AND u.y <> (SELECT src FROM s)), "
            "n3 AS (SELECT DISTINCT u.y AS v FROM u JOIN n2 ON u.x = n2.v "
            "WHERE u.y NOT IN (SELECT v FROM n1) AND u.y NOT IN (SELECT v FROM n2) "
            "AND u.y <> (SELECT src FROM s)), "
            "g AS (SELECT DISTINCT x AS v FROM u), "
            "c AS (SELECT 0 AS level, 1 AS n "
            "UNION ALL SELECT 1, (SELECT count(*) FROM n1) "
            "UNION ALL SELECT 2, (SELECT count(*) FROM n2) "
            "UNION ALL SELECT 3, (SELECT count(*) FROM n3) "
            "UNION ALL SELECT -1, (SELECT count(*) FROM g) "
            "+ (CASE WHEN (SELECT src FROM s) IN (SELECT v FROM g) THEN 0 ELSE 1 END) "
            "- 1 - (SELECT count(*) FROM n1) - (SELECT count(*) FROM n2) "
            "- (SELECT count(*) FROM n3)) "
            "SELECT CAST(level AS BIGINT) AS level, CAST(n AS BIGINT) AS n_nodes "
            "FROM c ORDER BY level"
        ),
        "t_spell_pairs": (
            "WITH v AS (SELECT DISTINCT unnest("
            "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+')) AS t "
            "FROM documents) "
            "SELECT a.t AS a, b.t AS b, CAST(levenshtein(a.t, b.t) AS BIGINT) AS d "
            "FROM v a JOIN v b ON a.t < b.t AND levenshtein(a.t, b.t) <= 2 "
            "ORDER BY a, b"
        ),
        "e25_schema_evolution": (
            "SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority ELSE '<none>' END AS pri, "
            "CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 4) AS sum_price "
            "FROM orders GROUP BY 1 ORDER BY 1"
        ),
        "r112_pacf": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "l AS (SELECT s AS y, lag(s, 1) OVER (ORDER BY day) AS x1, "
            "lag(s, 2) OVER (ORDER BY day) AS x2 FROM d), "
            "a1 AS (SELECT count(*) * 1.0 AS n, sum(x1) AS sx, sum(y) AS sy, "
            "sum(x1*x1) AS sxx, sum(x1*y) AS sxy, sum(y*y) AS syy FROM l WHERE x1 IS NOT NULL), "
            "a2 AS (SELECT count(*) * 1.0 AS n, sum(x2) AS sx, sum(y) AS sy, "
            "sum(x2*x2) AS sxx, sum(x2*y) AS sxy, sum(y*y) AS syy FROM l WHERE x2 IS NOT NULL), "
            "rr AS (SELECT "
            "(a1.n*a1.sxy - a1.sx*a1.sy) / sqrt((a1.n*a1.sxx - a1.sx*a1.sx) * (a1.n*a1.syy - a1.sy*a1.sy)) AS r1, "
            "(a2.n*a2.sxy - a2.sx*a2.sy) / sqrt((a2.n*a2.sxx - a2.sx*a2.sx) * (a2.n*a2.syy - a2.sy*a2.sy)) AS r2 "
            "FROM a1, a2) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days, "
            "round(r1, 4) AS pacf1, "
            "round((r2 - r1*r1) / (1 - r1*r1), 4) AS pacf2 FROM rr"
        ),
        "r113_grubbs": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "m AS (SELECT avg(s) AS mu, stddev_samp(s) AS sd, count(*) AS n FROM d), "
            "x AS (SELECT d.day, abs(d.s - m.mu) AS dev, m.sd, m.n FROM d, m "
            "ORDER BY dev DESC, d.day ASC LIMIT 1) "
            "SELECT CAST(n AS BIGINT) AS n_days, round(dev / sd, 4) AS g_stat, "
            "CAST(day AS BIGINT) AS day_flagged FROM x"
        ),
        "r114_mad_outliers": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "q AS (SELECT quantile_cont(s, 0.5) AS med, count(*) AS n FROM d), "
            "m AS (SELECT quantile_cont(abs(d.s - q.med), 0.5) AS mad FROM d, q) "
            "SELECT CAST(q.n AS BIGINT) AS n_days, round(q.med, 4) AS med, "
            "round(m.mad, 4) AS mad, "
            "CAST(sum(CASE WHEN abs(0.6745 * (d.s - q.med) / m.mad) > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers "
            "FROM d, q, m GROUP BY q.n, q.med, m.mad"
        ),
        "r115_rescaled_range": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "m AS (SELECT avg(s) AS mu, stddev_pop(s) AS sd, count(*) * 1.0 AS n FROM d), "
            "c AS (SELECT sum(d.s - m.mu) OVER (ORDER BY d.day) AS cs FROM d, m) "
            "SELECT CAST((SELECT n FROM m) AS BIGINT) AS n_days, "
            "round((max(cs) - min(cs)) / ((SELECT sd FROM m) * sqrt((SELECT n FROM m))), 4) AS rescaled_range "
            "FROM c"
        ),
        "r156_xmr_chart": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "w AS (SELECT s, abs(s - lag(s) OVER (ORDER BY day)) AS mr FROM d), "
            "m AS (SELECT sum(s) / count(*) AS xbar, "
            "sum(mr) / count(mr) AS mrbar, count(*) AS n FROM w) "
            "SELECT CAST(m.n AS BIGINT) AS n_days, round(m.xbar, 4) AS xbar, "
            "round(m.mrbar, 4) AS mrbar, "
            "round(m.xbar + 2.66 * m.mrbar, 4) AS ucl, "
            "round(m.xbar - 2.66 * m.mrbar, 4) AS lcl, "
            "CAST((SELECT count(*) FROM w, m "
            "WHERE w.s > m.xbar + 2.66 * m.mrbar "
            "OR w.s < m.xbar - 2.66 * m.mrbar) AS BIGINT) AS n_violations "
            "FROM m"
        ),
        "r157_source_purity": (
            "WITH c AS (SELECT source, lang, count(*) * 1.0 AS n FROM documents "
            "GROUP BY 1, 2), "
            "t AS (SELECT source, sum(n) AS tot FROM c GROUP BY 1) "
            "SELECT c.source, CAST(t.tot AS BIGINT) AS n_docs, "
            "round(max(c.n / t.tot), 4) AS top_share, "
            "round(-sum((c.n / t.tot) * ln(c.n / t.tot)), 4) AS entropy "
            "FROM c JOIN t ON t.source = c.source "
            "GROUP BY c.source, t.tot ORDER BY c.source"
        ),
        "r153_turning_points": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "w AS (SELECT s, lag(s) OVER (ORDER BY day) AS pv, "
            "lead(s) OVER (ORDER BY day) AS nx FROM d), "
            "t AS (SELECT count(*) * 1.0 AS tp FROM w "
            "WHERE pv IS NOT NULL AND nx IS NOT NULL "
            "AND ((s > pv AND s > nx) OR (s < pv AND s < nx))), "
            "n AS (SELECT count(*) * 1.0 AS n FROM d) "
            "SELECT CAST(n.n AS BIGINT) AS n_days, CAST(t.tp AS BIGINT) AS turning_points, "
            "round(2.0 * (n.n - 2) / 3.0, 4) AS expected, "
            "round((t.tp - 2.0 * (n.n - 2) / 3.0) / sqrt((16.0 * n.n - 29.0) / 90.0), 4) AS z "
            "FROM t, n"
        ),
        "r154_partial_corr": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "count(*) * 1.0 AS x, sum(value) AS y FROM events GROUP BY 1), "
            "m AS (SELECT corr(x, y) AS rxy, corr(x, day) AS rxz, corr(y, day) AS ryz, "
            "count(*) AS n FROM d) "
            "SELECT CAST(n AS BIGINT) AS n_days, round(rxy, 4) AS r_xy, "
            "round((rxy - rxz * ryz) / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 4) AS partial_r "
            "FROM m"
        ),
        "r155_robust_shape": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "q AS (SELECT count(*) AS n, "
            "quantile_cont(s, 0.25) AS q1, quantile_cont(s, 0.5) AS q2, "
            "quantile_cont(s, 0.75) AS q3, "
            "quantile_cont(s, 0.125) AS e1, quantile_cont(s, 0.375) AS e3, "
            "quantile_cont(s, 0.625) AS e5, quantile_cont(s, 0.875) AS e7 FROM d) "
            "SELECT CAST(n AS BIGINT) AS n_days, "
            "round((q3 + q1 - 2 * q2) / (q3 - q1), 4) AS bowley_skew, "
            "round((q3 - q1) / (q3 + q1), 4) AS qcd, "
            "round(((e7 - e5) + (e3 - e1)) / (q3 - q1), 4) AS moors_kurt FROM q"
        ),
        "r150_dup_invoices": (
            "WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice, "
            "CAST(floor(epoch_us(o_orderdate) / 86400000000.0) AS BIGINT) AS day "
            "FROM orders), "
            "p AS (SELECT a.o_orderkey AS k1, b.o_orderkey AS k2 FROM o a JOIN o b "
            "ON a.o_custkey = b.o_custkey AND a.o_totalprice = b.o_totalprice "
            "AND a.o_orderkey < b.o_orderkey AND abs(a.day - b.day) <= 3) "
            "SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_pairs, "
            "CAST((SELECT count(*) FROM (SELECT k1 AS k FROM p UNION SELECT k2 FROM p)) AS BIGINT) AS n_orders"
        ),
        "r151_mood": (
            "WITH u AS (SELECT user_id, sum(value) AS s FROM events GROUP BY 1), "
            "q AS (SELECT quantile_cont(s, 0.5) AS med FROM u), "
            "t AS (SELECT "
            "sum(CASE WHEN user_id % 2 = 0 AND s > q.med THEN 1 ELSE 0 END) * 1.0 AS a, "
            "sum(CASE WHEN user_id % 2 = 0 AND s <= q.med THEN 1 ELSE 0 END) * 1.0 AS b, "
            "sum(CASE WHEN user_id % 2 = 1 AND s > q.med THEN 1 ELSE 0 END) * 1.0 AS c, "
            "sum(CASE WHEN user_id % 2 = 1 AND s <= q.med THEN 1 ELSE 0 END) * 1.0 AS d "
            "FROM u, q) "
            "SELECT round((SELECT med FROM q), 4) AS median, "
            "CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, "
            "CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d, "
            "round((a+b+c+d) * pow(abs(a*d - b*c) - (a+b+c+d)/2.0, 2) "
            "/ ((a+b) * (c+d) * (a+c) * (b+d)), 4) AS chi2 FROM t"
        ),
        "r152_fisher_index": (
            "WITH dv AS (SELECT l_partkey AS pk, "
            "CAST(floor(epoch_us(l_shipdate) / 86400000000.0) AS BIGINT) AS day, "
            "l_quantity AS q, l_extendedprice AS ep FROM lineitem), "
            "b AS (SELECT (min(day) + max(day)) // 2 AS mid FROM dv), "
            "c AS (SELECT pk, CASE WHEN day <= b.mid THEN 0 ELSE 1 END AS per, "
            "sum(q) AS q, sum(ep) AS ep FROM dv, b GROUP BY 1, 2), "
            "w AS (SELECT c0.pk, c0.q AS q0, c1.q AS q1, c0.ep / c0.q AS p0, "
            "c1.ep / c1.q AS p1 FROM c c0 JOIN c c1 "
            "ON c1.pk = c0.pk AND c0.per = 0 AND c1.per = 1), "
            "ix AS (SELECT count(*) AS n, "
            "sum(p1 * q0) / sum(p0 * q0) AS lasp, "
            "sum(p1 * q1) / sum(p0 * q1) AS paas FROM w) "
            "SELECT CAST(n AS BIGINT) AS n_parts, round(lasp, 4) AS laspeyres, "
            "round(paas, 4) AS paasche, round(sqrt(lasp * paas), 4) AS fisher FROM ix"
        ),
        "r147_modularity": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "lab AS (SELECT p_partkey AS pk, p_brand AS b FROM part), "
            "el AS (SELECT la.b AS bx, lb.b AS b_y FROM e "
            "JOIN lab la ON la.pk = e.x JOIN lab lb ON lb.pk = e.y), "
            "m AS (SELECT count(*) * 1.0 AS m FROM el), "
            "intra AS (SELECT bx AS b, count(*) * 1.0 AS ei FROM el WHERE bx = b_y GROUP BY 1), "
            "degs AS (SELECT b, sum(c) AS d FROM "
            "(SELECT bx AS b, count(*) * 1.0 AS c FROM el GROUP BY 1 "
            "UNION ALL SELECT b_y, count(*) * 1.0 FROM el GROUP BY 1) GROUP BY b), "
            "q AS (SELECT sum(coalesce(i.ei, 0) / m.m - pow(d.d / (2 * m.m), 2)) AS q "
            "FROM degs d LEFT JOIN intra i ON i.b = d.b, m) "
            "SELECT CAST((SELECT count(DISTINCT p_brand) FROM part) AS BIGINT) AS n_brands, "
            "CAST((SELECT m FROM m) AS BIGINT) AS n_edges, "
            "round((SELECT q FROM q), 4) AS modularity"
        ),
        "r148_laspeyres": (
            "WITH dv AS (SELECT l_partkey AS pk, "
            "CAST(floor(epoch_us(l_shipdate) / 86400000000.0) AS BIGINT) AS day, "
            "l_quantity AS q, l_extendedprice AS ep FROM lineitem), "
            "b AS (SELECT (min(day) + max(day)) // 2 AS mid FROM dv), "
            "c AS (SELECT pk, CASE WHEN day <= b.mid THEN 0 ELSE 1 END AS per, "
            "sum(q) AS q, sum(ep) AS ep FROM dv, b GROUP BY 1, 2), "
            "w AS (SELECT c0.pk, c0.q AS q0, c0.ep / c0.q AS p0, c1.ep / c1.q AS p1 "
            "FROM c c0 JOIN c c1 ON c1.pk = c0.pk AND c0.per = 0 AND c1.per = 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_parts, "
            "round(sum(p1 * q0) / sum(p0 * q0), 4) AS laspeyres FROM w"
        ),
        "r149_ltv": (
            "WITH o AS (SELECT o_custkey AS cust, "
            "epoch_us(o_orderdate) // (86400000000 * 30) AS month, "
            "o_totalprice AS rev FROM orders), "
            "f AS (SELECT cust, min(month) AS cohort FROM o GROUP BY 1), "
            "x AS (SELECT o.cust, f.cohort, o.month - f.cohort AS off, o.rev "
            "FROM o JOIN f ON f.cust = o.cust), "
            "g AS (SELECT cohort, off, sum(rev) AS rev FROM x GROUP BY 1, 2), "
            "sz AS (SELECT cohort, count(*) AS n_cust FROM f GROUP BY 1), "
            "cm AS (SELECT cohort, off, "
            "sum(rev) OVER (PARTITION BY cohort ORDER BY off) AS cum FROM g) "
            "SELECT CAST(cm.cohort AS BIGINT) AS cohort, CAST(cm.off AS BIGINT) AS off, "
            "CAST(sz.n_cust AS BIGINT) AS n_cust, "
            "round(cm.cum / sz.n_cust, 4) AS cum_ltv "
            "FROM cm JOIN sz ON sz.cohort = cm.cohort "
            "WHERE cm.off <= 5 ORDER BY cohort, off"
        ),
        "e37_profile": (
            "SELECT * FROM ("
            "SELECT 'o_custkey' AS col, "
            "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            "CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct FROM orders "
            "UNION ALL SELECT 'o_orderpriority', "
            "CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
            "CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders "
            "UNION ALL SELECT 'o_orderstatus', "
            "CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
            "CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders "
            "UNION ALL SELECT 'o_totalprice', "
            "CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
            "CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders) "
            "ORDER BY col"
        ),
        "r146_equal_freq_bins": (
            "WITH q AS (SELECT quantile_cont(l_extendedprice, 0.2) AS e1, "
            "quantile_cont(l_extendedprice, 0.4) AS e2, "
            "quantile_cont(l_extendedprice, 0.6) AS e3, "
            "quantile_cont(l_extendedprice, 0.8) AS e4 FROM lineitem) "
            "SELECT CAST(CASE WHEN l_extendedprice >= q.e1 THEN 1 ELSE 0 END "
            "+ CASE WHEN l_extendedprice >= q.e2 THEN 1 ELSE 0 END "
            "+ CASE WHEN l_extendedprice >= q.e3 THEN 1 ELSE 0 END "
            "+ CASE WHEN l_extendedprice >= q.e4 THEN 1 ELSE 0 END AS BIGINT) AS bin, "
            "CAST(count(*) AS BIGINT) AS n, "
            "round(sum(l_extendedprice) / count(*), 4) AS mean_price "
            "FROM lineitem, q GROUP BY 1 ORDER BY 1"
        ),
        "r144_ess": (
            "WITH m AS (SELECT lang, count(*) AS n, sum(n_chars * 1.0) AS sw, "
            "sum(n_chars * 1.0 * n_chars) AS sw2 FROM documents GROUP BY 1) "
            "SELECT lang, CAST(n AS BIGINT) AS n_docs, "
            "round(sw * sw / sw2, 4) AS ess, "
            "round((sw * sw / sw2) / n, 4) AS efficiency "
            "FROM m ORDER BY lang"
        ),
        "r145_markov_power": (
            "WITH o AS (SELECT user_id, event_type, lead(event_type) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events), "
            "p AS (SELECT event_type AS f, nxt AS t, count(*) * 1.0 AS cnt "
            "FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2), "
            "tp AS (SELECT f, t, cnt / sum(cnt) OVER (PARTITION BY f) AS pr FROM p), "
            "p2 AS (SELECT a.f, b.t, sum(a.pr * b.pr) AS pr FROM tp a "
            "JOIN tp b ON b.f = a.t GROUP BY 1, 2), "
            "p4 AS (SELECT a.f, b.t, sum(a.pr * b.pr) AS pr FROM p2 a "
            "JOIN p2 b ON b.f = a.t GROUP BY 1, 2), "
            "p8 AS (SELECT a.f, b.t, sum(a.pr * b.pr) AS pr FROM p4 a "
            "JOIN p4 b ON b.f = a.t GROUP BY 1, 2), "
            "p16 AS (SELECT a.f, b.t, sum(a.pr * b.pr) AS pr FROM p8 a "
            "JOIN p8 b ON b.f = a.t GROUP BY 1, 2), "
            "ks AS (SELECT count(DISTINCT f) * 1.0 AS k FROM tp) "
            "SELECT p16.t AS event_type, round(sum(p16.pr / ks.k), 4) AS pi16 "
            "FROM p16, ks GROUP BY 1 ORDER BY 1"
        ),
        "r141_assortativity": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "u AS (SELECT x, y FROM e UNION ALL SELECT y, x FROM e), "
            "dg AS (SELECT x AS node, count(*) * 1.0 AS d FROM u GROUP BY 1), "
            "pr AS (SELECT da.d AS dx, db.d AS dy FROM u "
            "JOIN dg da ON da.node = u.x JOIN dg db ON db.node = u.y), "
            "m AS (SELECT count(*) * 1.0 AS n, sum(dx) AS sx, sum(dy) AS sy, "
            "sum(dx*dy) AS sxy, sum(dx*dx) AS sxx, sum(dy*dy) AS syy FROM pr) "
            "SELECT CAST(n / 2 AS BIGINT) AS n_edges, "
            "round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 4) AS assortativity "
            "FROM m"
        ),
        "r142_clustering_coef": (
            "WITH e AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey), "
            "u AS (SELECT x, y FROM e UNION ALL SELECT y, x FROM e), "
            "dg AS (SELECT x AS node, count(*) * 1.0 AS d FROM u GROUP BY 1), "
            "w AS (SELECT sum(d * (d - 1) / 2.0) AS wedges FROM dg), "
            "wd AS (SELECT e1.y AS a, e2.y AS b FROM e e1 "
            "JOIN e e2 ON e1.x = e2.x AND e1.y < e2.y), "
            "t AS (SELECT count(*) * 1.0 AS tri FROM wd "
            "JOIN e e3 ON e3.x = wd.a AND e3.y = wd.b) "
            "SELECT CAST(t.tri AS BIGINT) AS triangles, "
            "CAST(w.wedges AS BIGINT) AS wedges_full, "
            "round(3.0 * t.tri / w.wedges, 4) AS clustering_coef FROM t, w"
        ),
        "r143_fano": (
            "WITH c AS (SELECT event_type, "
            "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "count(*) * 1.0 AS n FROM events GROUP BY 1, 2), "
            "ds AS (SELECT unnest(range((SELECT min(day) FROM c), "
            "(SELECT max(day) FROM c) + 1)) AS day), "
            "et AS (SELECT DISTINCT event_type FROM events), "
            "grid AS (SELECT et.event_type, ds.day, coalesce(c.n, 0) AS n "
            "FROM et CROSS JOIN ds LEFT JOIN c "
            "ON c.event_type = et.event_type AND c.day = ds.day), "
            "m1 AS (SELECT event_type, sum(n) / count(*) AS mu, sum(n) AS tot "
            "FROM grid GROUP BY 1), "
            "m2 AS (SELECT g.event_type, sum(pow(g.n - m1.mu, 2)) / count(*) AS var, "
            "any_value(m1.mu) AS mu, any_value(m1.tot) AS tot "
            "FROM grid g JOIN m1 ON m1.event_type = g.event_type GROUP BY g.event_type) "
            "SELECT event_type, CAST(tot AS BIGINT) AS n_events, "
            "round(var / mu, 4) AS fano FROM m2 ORDER BY event_type"
        ),
        "r139_snaive_mape": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "w AS (SELECT day, s, lag(s, 7) OVER (ORDER BY day) AS f FROM d), "
            "sc AS (SELECT w.* FROM w, (SELECT max(day) - 13 AS lo FROM d) b "
            "WHERE w.day >= b.lo AND w.f IS NOT NULL) "
            "SELECT CAST(count(*) AS BIGINT) AS n_scored, "
            "round(sum(abs(s - f) / abs(s)) / count(*) * 100.0, 4) AS mape, "
            "round(sum(abs(s - f) / ((abs(s) + abs(f)) / 2.0)) / count(*) * 100.0, 4) AS smape "
            "FROM sc"
        ),
        "t_temp_curve": (
            "WITH c AS (SELECT lang, count(*) * 1.0 AS n FROM documents GROUP BY 1), "
            "tot AS (SELECT sum(n) AS t FROM c), "
            "taus AS (SELECT unnest([0.3, 0.7, 1.0]) AS tau), "
            "z AS (SELECT taus.tau, sum(pow(c.n / tot.t, taus.tau)) AS zz "
            "FROM c, tot, taus GROUP BY 1) "
            "SELECT c.lang, round(z.tau, 4) AS tau, round(c.n / tot.t, 4) AS p, "
            "round(pow(c.n / tot.t, z.tau) / z.zz, 4) AS w "
            "FROM c, tot, z ORDER BY lang, tau"
        ),
        "r140_abc": (
            "WITH c AS (SELECT l_partkey, sum(l_extendedprice) AS s FROM lineitem GROUP BY 1), "
            "t AS (SELECT sum(s) AS tot FROM c), "
            "r AS (SELECT s, sum(s) OVER (ORDER BY s DESC, l_partkey) / t.tot AS run "
            "FROM c, t), "
            "k AS (SELECT CASE WHEN run <= 0.80 THEN 'A' "
            "WHEN run <= 0.95 THEN 'B' ELSE 'C' END AS cls, s FROM r) "
            "SELECT cls, CAST(count(*) AS BIGINT) AS n_parts, "
            "round(sum(s) / (SELECT tot FROM t), 4) AS rev_share "
            "FROM k GROUP BY cls ORDER BY cls"
        ),
        "e36_wap": (
            "WITH staged AS (SELECT o_orderkey, "
            "CASE WHEN o_orderkey % 11 = 3 THEN -o_totalprice ELSE o_totalprice END AS p "
            "FROM orders) "
            "SELECT * FROM ("
            "SELECT 'published' AS side, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(p), 4) AS sum_price FROM staged WHERE p > 0 "
            "UNION ALL "
            "SELECT 'quarantined' AS side, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(p), 4) AS sum_price FROM staged WHERE p <= 0) "
            "ORDER BY side"
        ),
        "r138_peaks": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "m AS (SELECT sum(s) / count(*) AS mu, "
            "sqrt(sum(pow(s - (SELECT sum(s) / count(*) FROM d), 2)) / count(*)) AS sd FROM d), "
            "w AS (SELECT day, s, lag(s) OVER (ORDER BY day) AS pv, "
            "lead(s) OVER (ORDER BY day) AS nx FROM d) "
            "SELECT CAST(day AS BIGINT) AS day, round(s, 4) AS s FROM w, m "
            "WHERE pv IS NOT NULL AND nx IS NOT NULL "
            "AND s > pv AND s > nx AND s > m.mu + m.sd ORDER BY day"
        ),
        "r136_rfm": (
            "WITH c AS (SELECT o_custkey AS cust, "
            "max(CAST(floor(epoch_us(o_orderdate) / 86400000000.0) AS BIGINT)) AS last, "
            "count(*) AS f, sum(o_totalprice) AS m FROM orders GROUP BY 1), "
            "s AS (SELECT cust, m, ntile(5) OVER (ORDER BY last, cust) AS r_score, "
            "ntile(5) OVER (ORDER BY f, cust) AS f_score FROM c) "
            "SELECT CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score, "
            "CAST(count(*) AS BIGINT) AS n_customers, "
            "round(sum(m) / count(*), 4) AS avg_monetary "
            "FROM s GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "r137_power": (
            "WITH u AS (SELECT user_id, sum(value) AS s FROM events GROUP BY 1), "
            "m AS (SELECT count(*) * 1.0 AS n, avg(s) AS mu, var_samp(s) AS v FROM u) "
            "SELECT CAST(n AS BIGINT) AS n_users, round(mu, 4) AS mean, "
            "round(sqrt(v), 4) AS sd, round(0.05 * mu, 4) AS delta, "
            "CAST(ceil(round(2 * pow(1.959964 + 0.841621, 2) * v / pow(0.05 * mu, 2), 6)) AS BIGINT) AS n_per_arm "
            "FROM m"
        ),
        "e35_time_travel": (
            "SELECT * FROM ("
            "SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(o_totalprice), 4) AS sum_price FROM orders WHERE o_orderkey % 2 = 0 "
            "UNION ALL "
            "SELECT 2 AS version, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(o_totalprice), 4) AS sum_price FROM orders) "
            "ORDER BY version"
        ),
        "r135_growth_accounting": (
            "WITH du AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day FROM events), "
            "f AS (SELECT user_id, min(day) AS fd FROM du GROUP BY 1), "
            "x AS (SELECT du.day, du.user_id, f.fd, "
            "EXISTS(SELECT 1 FROM du p WHERE p.user_id = du.user_id "
            "AND p.day = du.day - 1) AS prev "
            "FROM du JOIN f ON f.user_id = du.user_id), "
            "t AS (SELECT day, "
            "sum(CASE WHEN day = fd THEN 1 ELSE 0 END) AS new, "
            "sum(CASE WHEN prev THEN 1 ELSE 0 END) AS retained, "
            "sum(CASE WHEN NOT prev AND day > fd THEN 1 ELSE 0 END) AS resurrected "
            "FROM x GROUP BY day), "
            "a AS (SELECT day, count(*) AS actives FROM du GROUP BY day) "
            "SELECT CAST(t.day AS BIGINT) AS day, CAST(t.new AS BIGINT) AS new, "
            "CAST(t.retained AS BIGINT) AS retained, "
            "CAST(t.resurrected AS BIGINT) AS resurrected, "
            "CAST(coalesce(ap.actives, 0) - t.retained AS BIGINT) AS churned "
            "FROM t LEFT JOIN a ap ON ap.day = t.day - 1 ORDER BY t.day"
        ),
        "r133_odds_ratio": (
            "WITH u AS (SELECT user_id, "
            "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 1.0 AS clicks "
            "FROM events GROUP BY 1), "
            "thr AS (SELECT sum(clicks) / count(*) AS m FROM u), "
            "f AS (SELECT user_id % 2 AS grp, "
            "CASE WHEN clicks > thr.m THEN 1 ELSE 0 END AS clk FROM u, thr), "
            "t AS (SELECT "
            "sum(CASE WHEN grp = 0 AND clk = 1 THEN 1 ELSE 0 END) + 0.5 AS a, "
            "sum(CASE WHEN grp = 0 AND clk = 0 THEN 1 ELSE 0 END) + 0.5 AS b, "
            "sum(CASE WHEN grp = 1 AND clk = 1 THEN 1 ELSE 0 END) + 0.5 AS c, "
            "sum(CASE WHEN grp = 1 AND clk = 0 THEN 1 ELSE 0 END) + 0.5 AS d "
            "FROM f) "
            "SELECT CAST(a - 0.5 AS BIGINT) AS a, CAST(b - 0.5 AS BIGINT) AS b, "
            "CAST(c - 0.5 AS BIGINT) AS c, CAST(d - 0.5 AS BIGINT) AS d, "
            "round((a*d)/(b*c), 4) AS odds_ratio, "
            "round((a/(a+b))/(c/(c+d)), 4) AS rel_risk, "
            "round(exp(ln((a*d)/(b*c)) - 1.96*sqrt(1/a + 1/b + 1/c + 1/d)), 4) AS or_ci_lo, "
            "round(exp(ln((a*d)/(b*c)) + 1.96*sqrt(1/a + 1/b + 1/c + 1/d)), 4) AS or_ci_hi "
            "FROM t"
        ),
        "e34_scd2": (
            "WITH v AS (SELECT o_custkey, o_orderpriority AS pri, "
            "epoch_us(o_orderdate) AS vf, "
            "coalesce(epoch_us(lead(o_orderdate) OVER "
            "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)), 4611686018427387904) AS vt "
            "FROM orders) "
            "SELECT pri, CAST(count(*) AS BIGINT) AS n_customers FROM v "
            "WHERE vf <= epoch_us(TIMESTAMP '1998-06-01 00:00:00') "
            "AND epoch_us(TIMESTAMP '1998-06-01 00:00:00') < vt "
            "GROUP BY pri ORDER BY pri"
        ),
        "r134_lorenz": (
            "WITH c AS (SELECT o_custkey, sum(o_totalprice) AS s FROM orders GROUP BY 1), "
            "o AS (SELECT s, row_number() OVER (ORDER BY s, o_custkey) AS rn, "
            "count(*) OVER () AS n, sum(s) OVER () AS tot FROM c), "
            "cm AS (SELECT rn, n, tot, sum(s) OVER (ORDER BY rn) AS cum FROM o), "
            "ks AS (SELECT unnest(range(1, 11)) AS decile) "
            "SELECT CAST(ks.decile AS BIGINT) AS decile, "
            "CAST((ks.decile * (SELECT any_value(n) FROM cm)) // 10 AS BIGINT) AS n_cust, "
            "round(coalesce((SELECT cum / tot FROM cm "
            "WHERE cm.rn = (ks.decile * cm.n) // 10), 0), 4) AS cum_share "
            "FROM ks ORDER BY decile"
        ),
        "e33_deletion_vectors": (
            "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(o_totalprice), 4) AS sum_price "
            "FROM orders WHERE o_orderkey % 9 <> 4 "
            "GROUP BY 1 ORDER BY 1"
        ),
        "r132_hist2d": (
            "WITH b AS (SELECT least(4, CAST(floor(l_quantity / 10.0) AS BIGINT)) AS qb, "
            "least(5, CAST(floor(l_discount / 0.02) AS BIGINT)) AS db, "
            "l_extendedprice AS rev FROM lineitem), "
            "c AS (SELECT qb, db, count(*) * 1.0 AS n, sum(rev) AS rev FROM b GROUP BY 1, 2), "
            "grid AS (SELECT q.qb, d.db FROM (SELECT unnest(range(0, 5)) AS qb) q "
            "CROSS JOIN (SELECT unnest(range(0, 6)) AS db) d) "
            "SELECT CAST(grid.qb AS BIGINT) AS qb, CAST(grid.db AS BIGINT) AS db, "
            "CAST(coalesce(c.n, 0) AS BIGINT) AS n, round(coalesce(c.rev, 0), 4) AS rev "
            "FROM grid LEFT JOIN c ON c.qb = grid.qb AND c.db = grid.db "
            "ORDER BY qb, db"
        ),
        "t_source_divergence": (
            "WITH tok AS (SELECT source, "
            "unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+')) AS t "
            "FROM documents WHERE source IN ('src0', 'src1')), "
            "c AS (SELECT t, sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) * 1.0 AS c0, "
            "sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) * 1.0 AS c1 FROM tok GROUP BY t), "
            "m AS (SELECT sum(c0) AS n0, sum(c1) AS n1, count(*) * 1.0 AS v FROM c), "
            "pq_ AS (SELECT (c0 + 0.5) / (m.n0 + 0.5 * m.v) AS p, "
            "(c1 + 0.5) / (m.n1 + 0.5 * m.v) AS q FROM c, m) "
            "SELECT CAST(m.n0 AS BIGINT) AS n0_tokens, CAST(m.n1 AS BIGINT) AS n1_tokens, "
            "CAST(m.v AS BIGINT) AS vocab, "
            "round((SELECT 0.5 * sum(p * ln(p / ((p + q) / 2))) "
            "+ 0.5 * sum(q * ln(q / ((p + q) / 2))) FROM pq_), 4) AS js "
            "FROM m"
        ),
        "r129_skyline": (
            "SELECT p_partkey, round(p_retailprice, 4) AS price, "
            "CAST(p_size AS BIGINT) AS size FROM part a "
            "WHERE NOT EXISTS (SELECT 1 FROM part b "
            "WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size "
            "AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)) "
            "ORDER BY p_partkey"
        ),
        "r130_embed_cov": (
            "WITH u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v, "
            "generate_subscripts(embedding, 1) - 1 AS idx FROM embeddings), "
            "n AS (SELECT count(*) * 1.0 AS n FROM embeddings), "
            "mu AS (SELECT idx, sum(v) / (SELECT n FROM n) AS m FROM u GROUP BY idx), "
            "xx AS (SELECT a.idx AS i, b.idx AS j, sum(a.v * b.v) AS s "
            "FROM u a JOIN u b ON b.vec_id = a.vec_id AND b.idx >= a.idx "
            "GROUP BY 1, 2) "
            "SELECT CAST(xx.i AS BIGINT) AS i, CAST(xx.j AS BIGINT) AS j, "
            "round(xx.s / (SELECT n FROM n) - ma.m * mb.m, 4) AS cov "
            "FROM xx JOIN mu ma ON ma.idx = xx.i JOIN mu mb ON mb.idx = xx.j "
            "ORDER BY i, j"
        ),
        "r131_benford2": (
            "WITH x AS (SELECT l_extendedprice AS v FROM lineitem WHERE l_extendedprice >= 10), "
            "d2 AS (SELECT CAST(floor(v / pow(10.0, floor(log10(v)) - 1)) AS BIGINT) % 10 AS digit "
            "FROM x), "
            "c AS (SELECT digit, count(*) * 1.0 AS n FROM d2 GROUP BY digit), "
            "dg AS (SELECT unnest(range(0, 10)) AS digit), "
            "a AS (SELECT unnest(range(1, 10)) AS a), "
            "exp_ AS (SELECT dg.digit, sum(log10(1.0 + 1.0 / (10 * a.a + dg.digit))) AS e "
            "FROM dg CROSS JOIN a GROUP BY dg.digit), "
            "tot AS (SELECT sum(n) AS t FROM c) "
            "SELECT CAST(dg.digit AS BIGINT) AS digit, "
            "CAST(coalesce(c.n, 0) AS BIGINT) AS n, "
            "round(coalesce(c.n, 0) / tot.t, 4) AS obs_frac, "
            "round(exp_.e, 4) AS exp_frac "
            "FROM dg LEFT JOIN c ON c.digit = dg.digit "
            "JOIN exp_ ON exp_.digit = dg.digit, tot ORDER BY digit"
        ),
        "r126_kaplan_meier": (
            "WITH dd AS (SELECT user_id, event_type, "
            "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day FROM events), "
            "g AS (SELECT max(day) AS mx FROM dd), "
            "u AS (SELECT user_id, event_type, min(day) AS f, max(day) AS l "
            "FROM dd GROUP BY 1, 2), "
            "du AS (SELECT l - f AS t, CASE WHEN l < g.mx - 6 THEN 1 ELSE 0 END AS ev FROM u, g), "
            "e AS (SELECT t, count(*) AS d FROM du WHERE ev = 1 GROUP BY t), "
            "rk AS (SELECT e.t, e.d, (SELECT count(*) FROM du WHERE du.t >= e.t) AS n_risk FROM e) "
            "SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk, "
            "CAST(d AS BIGINT) AS d, "
            "round(exp(sum(ln(1 - d * 1.0 / n_risk)) OVER (ORDER BY t)), 4) AS surv "
            "FROM rk ORDER BY t"
        ),
        "r127_cuped": (
            "WITH bnd AS (SELECT (min(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT)) "
            "+ max(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT))) // 2 AS mid FROM events), "
            "u AS (SELECT user_id, "
            "sum(CASE WHEN CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) <= bnd.mid "
            "THEN value ELSE 0 END) AS x, "
            "sum(CASE WHEN CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) > bnd.mid "
            "THEN value ELSE 0 END) AS y "
            "FROM events, bnd GROUP BY user_id, bnd.mid), "
            "m AS (SELECT count(*) * 1.0 AS n, sum(x) AS sx, sum(y) AS sy, "
            "sum(x*x) AS sxx, sum(x*y) AS sxy FROM u), "
            "th AS (SELECT (m.n*m.sxy - m.sx*m.sy) / (m.n*m.sxx - m.sx*m.sx) AS theta, "
            "m.sx / m.n AS xbar, m.n AS n, m.sy AS sy FROM m), "
            "a AS (SELECT u.user_id % 2 AS grp, u.y - th.theta * (u.x - th.xbar) AS ya, "
            "u.y AS y FROM u, th), "
            "v AS (SELECT sum(pow(y - (SELECT sy / n FROM th), 2)) / (SELECT n FROM th) AS vy, "
            "sum(pow(ya - (SELECT sum(ya) / count(*) FROM a), 2)) / (SELECT n FROM th) AS va FROM a) "
            "SELECT CAST((SELECT n FROM th) AS BIGINT) AS n_users, "
            "round((SELECT theta FROM th), 4) AS theta, "
            "round((SELECT avg(ya) FROM a WHERE grp = 0), 4) AS mean0_adj, "
            "round((SELECT avg(ya) FROM a WHERE grp = 1), 4) AS mean1_adj, "
            "round(1 - v.va / v.vy, 4) AS var_reduction FROM v"
        ),
        "r128_hill_tail": (
            "WITH c AS (SELECT user_id, count(*) * 1.0 AS n FROM events GROUP BY 1), "
            "o AS (SELECT n, row_number() OVER (ORDER BY n DESC, user_id) AS rn FROM c), "
            "kk AS (SELECT least(20, (SELECT count(*) FROM c) - 1) AS k), "
            "thr AS (SELECT o.n AS thr FROM o, kk WHERE o.rn = kk.k + 1) "
            "SELECT CAST(kk.k AS BIGINT) AS k, round(thr.thr, 4) AS threshold, "
            "round(kk.k / (SELECT sum(ln(o.n / thr.thr)) FROM o WHERE o.rn <= kk.k), 4) AS alpha "
            "FROM kk, thr"
        ),
        "r124_streaks": (
            "WITH du AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day FROM events), "
            "i AS (SELECT user_id, day, "
            "day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS anchor FROM du), "
            "s AS (SELECT user_id, anchor, count(*) AS len FROM i GROUP BY 1, 2) "
            "SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days, "
            "CAST(max(len) AS BIGINT) AS longest_streak "
            "FROM s GROUP BY user_id ORDER BY user_id"
        ),
        "t_split_leakage": (
            "WITH a AS (SELECT doc_id, md5(coalesce(text, '')) AS th, "
            "CASE WHEN md5_number_upper('split:' || CAST(doc_id AS VARCHAR)) % 10 <= 7 THEN 0 "
            "WHEN md5_number_upper('split:' || CAST(doc_id AS VARCHAR)) % 10 = 8 THEN 1 "
            "ELSE 2 END AS split FROM documents), "
            "l AS (SELECT count(*) AS leaky FROM "
            "(SELECT th FROM (SELECT DISTINCT th, split FROM a) "
            "GROUP BY th HAVING count(*) > 1)) "
            "SELECT CAST(sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_train, "
            "CAST(sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_val, "
            "CAST(sum(CASE WHEN split = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_test, "
            "(SELECT CAST(leaky AS BIGINT) FROM l) AS n_leaky_texts FROM a"
        ),
        "r125_hhi": (
            "WITH c AS (SELECT o_custkey, sum(o_totalprice) AS s FROM orders GROUP BY 1), "
            "t AS (SELECT sum(s) AS tot FROM c) "
            "SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_customers, "
            "round(sum(pow(c.s / t.tot, 2)) * 10000.0, 4) AS hhi, "
            "round(max(c.s / t.tot), 4) AS top_share FROM c, t"
        ),
        "e32_bucketed_join": (
            "SELECT o.o_orderstatus, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(l.l_extendedprice), 4) AS sum_price "
            "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "GROUP BY 1 ORDER BY 1"
        ),
        "r122_psi_drift": (
            "WITH dv AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "value AS v FROM events), "
            "bnd AS (SELECT (min(day) + max(day)) // 2 AS mid FROM dv), "
            "rb AS (SELECT min(v) AS mn, max(v) AS mx FROM dv, bnd WHERE day <= bnd.mid), "
            "bins AS (SELECT CASE WHEN day <= bnd.mid THEN 0 ELSE 1 END AS half, "
            "least(9, greatest(0, CAST(floor((v - rb.mn) / ((rb.mx - rb.mn) / 10.0)) AS BIGINT))) AS bin "
            "FROM dv, bnd, rb), "
            "c AS (SELECT half, bin, count(*) * 1.0 AS c FROM bins GROUP BY 1, 2), "
            "grid AS (SELECT h.half, b.bin, coalesce(c.c, 0) AS c "
            "FROM (SELECT unnest(range(0, 2)) AS half) h "
            "CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) b "
            "LEFT JOIN c ON c.half = h.half AND c.bin = b.bin), "
            "tot AS (SELECT sum(CASE WHEN half = 0 THEN c END) AS nr, "
            "sum(CASE WHEN half = 1 THEN c END) AS nc FROM grid), "
            "pq_ AS (SELECT g0.bin, (g0.c + 0.5) / (tot.nr + 5.0) AS p, "
            "(g1.c + 0.5) / (tot.nc + 5.0) AS q "
            "FROM grid g0 JOIN grid g1 ON g1.bin = g0.bin AND g1.half = 1, tot "
            "WHERE g0.half = 0) "
            "SELECT CAST(tot.nr AS BIGINT) AS n_ref, CAST(tot.nc AS BIGINT) AS n_cur, "
            "round((SELECT sum((p - q) * ln(p / q)) FROM pq_), 4) AS psi FROM tot"
        ),
        "r123_cond_entropy": (
            "WITH o AS (SELECT user_id, event_type, lead(event_type) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events), "
            "p AS (SELECT event_type AS from_type, nxt AS to_type, count(*) * 1.0 AS cnt "
            "FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2), "
            "q AS (SELECT cnt AS c, sum(cnt) OVER (PARTITION BY from_type) AS cf, "
            "sum(cnt) OVER () AS n FROM p), "
            "qt AS (SELECT sum(cnt) AS ct FROM p GROUP BY to_type), "
            "x AS (SELECT (SELECT sum(cnt) FROM p) AS n, "
            "(SELECT -sum((c / n) * ln(c / cf)) FROM q) AS h_cond, "
            "(SELECT -sum((ct / (SELECT sum(cnt) FROM p)) * ln(ct / (SELECT sum(cnt) FROM p))) FROM qt) AS h_next) "
            "SELECT CAST(n AS BIGINT) AS n_pairs, round(h_cond, 4) AS h_cond, "
            "round(h_next, 4) AS h_next, round(h_next - h_cond, 4) AS mutual_info FROM x"
        ),
        "r119_std_residuals": (
            "WITH c AS (SELECT event_type, "
            "((CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) % 7) + 7) % 7 AS dow, "
            "count(*) * 1.0 AS o FROM events GROUP BY 1, 2), "
            "et AS (SELECT DISTINCT event_type FROM events), "
            "dw AS (SELECT DISTINCT ((CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) % 7) + 7) % 7 AS dow FROM events), "
            "f AS (SELECT et.event_type, dw.dow, coalesce(c.o, 0) AS o "
            "FROM et CROSS JOIN dw LEFT JOIN c "
            "ON c.event_type = et.event_type AND c.dow = dw.dow), "
            "t AS (SELECT event_type, dow, o, "
            "sum(o) OVER (PARTITION BY event_type) AS rt, "
            "sum(o) OVER (PARTITION BY dow) AS ct, sum(o) OVER () AS n FROM f) "
            "SELECT event_type, CAST(dow AS BIGINT) AS dow, CAST(o AS BIGINT) AS o, "
            "round((o - rt * ct / n) / sqrt(rt * ct / n), 4) AS residual "
            "FROM t ORDER BY event_type, dow"
        ),
        "r120_mcnemar": (
            "WITH bnd AS (SELECT min(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT)) AS lo, "
            "max(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT)) AS hi FROM events), "
            "u AS (SELECT user_id, "
            "max(CASE WHEN event_type = 'click' AND "
            "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) <= (SELECT (lo + hi) // 2 FROM bnd) "
            "THEN 1 ELSE 0 END) AS bef, "
            "max(CASE WHEN event_type = 'click' AND "
            "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) > (SELECT (lo + hi) // 2 FROM bnd) "
            "THEN 1 ELSE 0 END) AS aft "
            "FROM events GROUP BY user_id) "
            "SELECT CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(sum(CASE WHEN bef = 1 AND aft = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b, "
            "CAST(sum(CASE WHEN bef = 0 AND aft = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c, "
            "round(CASE WHEN sum(CASE WHEN bef <> aft THEN 1 ELSE 0 END) = 0 THEN 0 ELSE "
            "pow(sum(CASE WHEN bef = 1 AND aft = 0 THEN 1 ELSE 0 END) "
            "- sum(CASE WHEN bef = 0 AND aft = 1 THEN 1 ELSE 0 END), 2) * 1.0 "
            "/ sum(CASE WHEN bef <> aft THEN 1 ELSE 0 END) END, 4) AS chi2 "
            "FROM u"
        ),
        "r121_stickiness": (
            "WITH du AS (SELECT DISTINCT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "user_id FROM events), "
            "days AS (SELECT DISTINCT day FROM du) "
            "SELECT d.day AS day, "
            "CAST((SELECT count(*) FROM du WHERE du.day = d.day) AS BIGINT) AS dau, "
            "CAST((SELECT count(DISTINCT user_id) FROM du "
            "WHERE du.day BETWEEN d.day - 6 AND d.day) AS BIGINT) AS wau, "
            "round((SELECT count(*) FROM du WHERE du.day = d.day) * 1.0 "
            "/ (SELECT count(DISTINCT user_id) FROM du "
            "WHERE du.day BETWEEN d.day - 6 AND d.day), 4) AS stickiness "
            "FROM days d ORDER BY d.day"
        ),
        "e30_compaction": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(value), 4) AS sum_value "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "r118_gap_fill": (
            "WITH d0 AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "d AS (SELECT * FROM d0 WHERE day % 7 <> 3), "
            "cal AS (SELECT unnest(range((SELECT min(day) FROM d), "
            "(SELECT max(day) FROM d) + 1)) AS day) "
            "SELECT cal.day AS day, "
            "CAST(CASE WHEN d.s IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled, "
            "round(CASE WHEN d.s IS NOT NULL THEN d.s ELSE "
            "(SELECT p.s FROM d p WHERE p.day = (SELECT max(p2.day) FROM d p2 WHERE p2.day < cal.day)) "
            "+ (cal.day - (SELECT max(p2.day) FROM d p2 WHERE p2.day < cal.day)) "
            "* ((SELECT nn.s FROM d nn WHERE nn.day = (SELECT min(n2.day) FROM d n2 WHERE n2.day > cal.day)) "
            "- (SELECT p.s FROM d p WHERE p.day = (SELECT max(p2.day) FROM d p2 WHERE p2.day < cal.day))) "
            "/ ((SELECT min(n2.day) FROM d n2 WHERE n2.day > cal.day) "
            "- (SELECT max(p2.day) FROM d p2 WHERE p2.day < cal.day)) "
            "END, 4) AS s "
            "FROM cal LEFT JOIN d ON d.day = cal.day ORDER BY cal.day"
        ),
        "e31_footer_stats": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(epoch_us(min(ts)) AS BIGINT) AS min_ts, "
            "CAST(epoch_us(max(ts)) AS BIGINT) AS max_ts "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "r117_selfjoin_size": (
            "WITH rr AS (SELECT unnest(range(0, 4)) AS r), "
            "cells AS (SELECT rr.r AS r, "
            "md5_number_upper(CAST(rr.r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)) % 1024 AS cell, "
            "count(*) AS c FROM events, rr GROUP BY 1, 2), "
            "est AS (SELECT min(s) AS est FROM "
            "(SELECT r, sum(c * c) AS s FROM cells GROUP BY r)), "
            "ex AS (SELECT sum(n * n) AS f2 FROM "
            "(SELECT count(*) AS n FROM events GROUP BY user_id)) "
            "SELECT CAST(ex.f2 AS BIGINT) AS f2_exact, "
            "CAST(est.est AS BIGINT) AS f2_est FROM ex, est"
        ),
        "ann_label_cohesion": (
            "WITH u AS (SELECT vec_id, label, "
            "CAST(unnest(embedding) AS DOUBLE) AS v, "
            "generate_subscripts(embedding, 1) AS idx FROM embeddings), "
            "cent AS (SELECT label, idx, sum(v) / count(*) AS cv FROM u GROUP BY 1, 2), "
            "dots AS (SELECT u.vec_id, u.label, sum(u.v * c.cv) AS dot, "
            "sum(u.v * u.v) AS n2, sum(c.cv * c.cv) AS c2 "
            "FROM u JOIN cent c ON c.label = u.label AND c.idx = u.idx "
            "GROUP BY 1, 2) "
            "SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n, "
            "round(avg(dot / (sqrt(n2) * sqrt(c2))), 4) AS cohesion "
            "FROM dots GROUP BY label ORDER BY label"
        ),
        "e29_cdc_merge": (
            "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10 "
            "ELSE o_totalprice END), 4) AS sum_price "
            "FROM orders WHERE o_orderkey % 7 <> 0 "
            "GROUP BY 1 ORDER BY 1"
        ),
        "sketch_heavy_hitters": (
            "SELECT t AS tok, CAST(count(*) AS BIGINT) AS cnt FROM "
            "(SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+')) AS t "
            "FROM documents) GROUP BY t ORDER BY cnt DESC, tok ASC LIMIT 10"
        ),
        "e27_delta_rollup": (
            "SELECT event_type, "
            "CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS s "
            "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "e28_zorder_layout": (
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            "round(sum(l_extendedprice), 4) AS sum_price FROM lineitem "
            "WHERE l_partkey <= (SELECT max(l_partkey) // 4 FROM lineitem) "
            "AND l_suppkey <= (SELECT max(l_suppkey) // 4 FROM lineitem)"
        ),
        "e26_manifest_snapshot": (
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(l_extendedprice), 4) AS sum_price "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "r116_rate_ratio": (
            "WITH g AS (SELECT CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) % 2 AS grp, "
            "count(*) * 1.0 AS n FROM events GROUP BY 1), "
            "f AS (SELECT max(CASE WHEN grp = 0 THEN n END) AS n0, "
            "max(CASE WHEN grp = 1 THEN n END) AS n1 FROM g) "
            "SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1, "
            "round(n1 / n0, 4) AS rate_ratio, "
            "round((n1 - n0) / sqrt(n1 + n0), 4) AS z, "
            "round(exp(ln(n1 / n0) - 1.96 * sqrt(1.0/n1 + 1.0/n0)), 4) AS ci_lo, "
            "round(exp(ln(n1 / n0) + 1.96 * sqrt(1.0/n1 + 1.0/n0)), 4) AS ci_hi "
            "FROM f"
        ),
        "t_vocab_growth": (
            "WITH mx AS (SELECT max(doc_id) AS m FROM documents), "
            "ks AS (SELECT unnest(range(1, 6)) AS k), "
            "tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9_]+')) AS t "
            "FROM documents) "
            "SELECT CAST(ks.k AS BIGINT) AS k, "
            "CAST((SELECT count(*) FROM tok, mx WHERE tok.doc_id <= (ks.k * mx.m) // 5) AS BIGINT) AS n_tokens, "
            "CAST((SELECT count(DISTINCT t) FROM tok, mx WHERE tok.doc_id <= (ks.k * mx.m) // 5) AS BIGINT) AS vocab "
            "FROM ks ORDER BY k"
        ),
        "r103_srm_check": (
            "WITH g AS (SELECT CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) % 2 AS grp, "
            "count(*) * 1.0 AS n FROM events GROUP BY 1), "
            "e AS (SELECT sum(n) / 2.0 AS exp FROM g) "
            "SELECT CAST(max(CASE WHEN grp = 0 THEN n END) AS BIGINT) AS n1, "
            "CAST(max(CASE WHEN grp = 1 THEN n END) AS BIGINT) AS n2, "
            "round(sum(pow(n - (SELECT exp FROM e), 2) / (SELECT exp FROM e)), 4) AS chi2 "
            "FROM g"
        ),
        "e24_psv_dialect": (
            "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(c_acctbal), 4) AS sum_bal "
            "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "t_unimax_sample": (
            "WITH kept AS (SELECT lang, doc_id FROM documents "
            "QUALIFY row_number() OVER (PARTITION BY lang "
            "ORDER BY md5_number_upper(CAST('umx:' || doc_id AS VARCHAR)), doc_id) <= 40), "
            "k AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept, "
            "CAST(sum(doc_id) AS BIGINT) AS sum_kept FROM kept GROUP BY lang) "
            "SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "any_value(k.n_kept) AS n_kept, any_value(k.sum_kept) AS sum_kept "
            "FROM documents d JOIN k ON k.lang = d.lang "
            "GROUP BY d.lang ORDER BY d.lang"
        ),
        "t_ngram_coverage": (
            "WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents), "
            "shl AS (SELECT doc_id, CASE WHEN len(ts) >= 3 THEN "
            "list_distinct(list_transform(range(1, len(ts) - 1), "
            "j -> ts[j] || ' ' || ts[j+1] || ' ' || ts[j+2])) "
            "WHEN len(ts) > 0 THEN [array_to_string(ts, ' ')] ELSE [] END AS shingles FROM tok), "
            "e AS (SELECT doc_id, unnest(shingles) AS s FROM shl), "
            "ev AS (SELECT DISTINCT s FROM e WHERE doc_id % 97 = 0), "
            "c AS (SELECT DISTINCT s FROM e WHERE doc_id % 97 <> 0) "
            "SELECT CAST(count(*) AS BIGINT) AS n_eval, "
            "CAST(count(*) FILTER (WHERE s IN (SELECT s FROM c)) AS BIGINT) AS n_cov, "
            "round(count(*) FILTER (WHERE s IN (SELECT s FROM c)) * 1.0 / count(*), 4) AS coverage "
            "FROM ev"
        ),
        "r91_crosstab_chi2": (
            "WITH c AS (SELECT lang, source, count(*) * 1.0 AS o "
            "FROM documents GROUP BY lang, source), "
            "l AS (SELECT DISTINCT lang FROM documents), "
            "sv AS (SELECT DISTINCT source FROM documents), "
            "f AS (SELECT l.lang, sv.source, coalesce(c.o, 0) AS o "
            "FROM l CROSS JOIN sv LEFT JOIN c "
            "ON c.lang = l.lang AND c.source = sv.source), "
            "t AS (SELECT o, sum(o) OVER (PARTITION BY lang) AS rt, "
            "sum(o) OVER (PARTITION BY source) AS ct, sum(o) OVER () AS n FROM f) "
            "SELECT CAST(any_value(n) AS BIGINT) AS n, "
            "CAST(((SELECT count(*) FROM l) - 1) * ((SELECT count(*) FROM sv) - 1) AS BIGINT) AS dof, "
            "round(sum(pow(o - rt * ct / n, 2) / (rt * ct / n)), 4) AS chi2 FROM t"
        ),
        "r89_mann_kendall": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "p AS (SELECT CAST(sum(CASE WHEN b.s > a.s THEN 1 "
            "WHEN b.s < a.s THEN -1 ELSE 0 END) AS DOUBLE) AS S, "
            "(SELECT count(*) * 1.0 FROM d) AS n "
            "FROM d a JOIN d b ON a.day < b.day) "
            "SELECT CAST(n AS BIGINT) AS n_days, CAST(S AS BIGINT) AS s_stat, "
            "round(CASE WHEN S > 0 THEN (S - 1) / sqrt(n * (n - 1) * (2 * n + 5) / 18.0) "
            "WHEN S < 0 THEN (S + 1) / sqrt(n * (n - 1) * (2 * n + 5) / 18.0) "
            "ELSE 0 END, 4) AS z FROM p"
        ),
        "r90_runs_test": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "g AS (SELECT day, CASE WHEN s > lag(s) OVER (ORDER BY day) THEN 1 "
            "WHEN s < lag(s) OVER (ORDER BY day) THEN -1 END AS sg FROM d), "
            "sq AS (SELECT sg, lag(sg) OVER (ORDER BY day) AS prev FROM g WHERE sg IS NOT NULL), "
            "m AS (SELECT count(*) FILTER (WHERE sg = 1) * 1.0 AS n1, "
            "count(*) FILTER (WHERE sg = -1) * 1.0 AS n2, "
            "1 + count(*) FILTER (WHERE prev IS NOT NULL AND sg <> prev) AS runs FROM sq) "
            "SELECT CAST(n1 AS BIGINT) AS n_up, CAST(n2 AS BIGINT) AS n_down, "
            "CAST(runs AS BIGINT) AS runs, "
            "round((runs - (2 * n1 * n2 / (n1 + n2) + 1)) / "
            "sqrt((2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)) / "
            "(pow(n1 + n2, 2) * (n1 + n2 - 1))), 4) AS z FROM m"
        ),
        "r88_degree_dist": (
            "WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
            "e AS (SELECT a.l_partkey AS x, b.l_partkey AS y FROM lp a "
            "JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
            "GROUP BY x, y), "
            "n AS (SELECT x AS node FROM e UNION ALL SELECT y FROM e), "
            "d AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM n GROUP BY node) "
            "SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes "
            "FROM d GROUP BY degree ORDER BY degree"
        ),
        "e21_hive_pruning": (
            "SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "CAST(count(*) AS BIGINT) AS cnt, round(sum(value), 4) AS s "
            "FROM events WHERE event_type = 'click' GROUP BY day ORDER BY day"
        ),
        "s90_explain": (
            f"WITH tok AS (SELECT doc_id, {toks} AS ts FROM documents), "
            "d AS (SELECT doc_id, len(ts) AS dl, "
            "len(list_filter(ts, t -> t = 'hash')) AS tf0, "
            "len(list_filter(ts, t -> t = 'join')) AS tf1 FROM tok), "
            "s AS (SELECT count(*) AS n, sum(dl) AS total_len, "
            "count(*) FILTER (WHERE tf0 > 0) AS df0, "
            "count(*) FILTER (WHERE tf1 > 0) AS df1 FROM d), "
            "e AS (SELECT d.doc_id, "
            "ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * tf0 * 2.2 / "
            "(tf0 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) AS x0, "
            "ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5)) * tf1 * 2.2 / "
            "(tf1 + 1.2 * (1 - 0.75 + 0.75 * d.dl / (s.total_len / s.n))) AS x1 "
            "FROM d, s WHERE tf0 > 0 AND tf1 > 0) "
            "SELECT doc_id, round(x0, 4) AS c0, round(x1, 4) AS c1, "
            "round(x0 + x1, 4) AS score FROM e "
            "ORDER BY (x0 + x1) DESC, doc_id LIMIT 10"
        ),
        "t_cluster_sizes": (
            f"WITH comp AS ({_COMPONENTS_SQL}), "
            "sz AS (SELECT component, CAST(count(*) AS BIGINT) AS size "
            "FROM comp GROUP BY component) "
            "SELECT size, CAST(count(*) AS BIGINT) AS n_components "
            "FROM sz GROUP BY size ORDER BY size"
        ),
        "r87_seasonal_anomaly": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "p AS (SELECT day, day % 7 AS dow, s, "
            "avg(s) OVER (PARTITION BY day % 7) AS m, "
            "stddev_pop(s) OVER (PARTITION BY day % 7) AS sd FROM d) "
            "SELECT day, CAST(dow AS BIGINT) AS dow, round(s, 4) AS s, "
            "round((s - m) / sd, 4) AS z FROM p "
            "ORDER BY abs((s - m) / sd) DESC, day LIMIT 3"
        ),
        "r86_gini": (
            "WITH v AS (SELECT o_totalprice AS x, "
            "row_number() OVER (ORDER BY o_totalprice) AS r FROM orders), "
            "m AS (SELECT count(*) * 1.0 AS n, sum(x) AS sx, sum(r * x) AS srx FROM v) "
            "SELECT CAST(n AS BIGINT) AS n, "
            "round(2 * srx / (n * sx) - (n + 1) / n, 4) AS gini FROM m"
        ),
        "t_char_entropy": (
            "WITH ch AS (SELECT doc_id, length(text) AS n_ch, "
            "unnest(range(1, length(text) + 1)) AS i, text FROM documents "
            "WHERE length(coalesce(text, '')) > 0), "
            "c AS (SELECT doc_id, any_value(n_ch) AS n_ch, substr(text, i, 1) AS c, "
            "count(*) * 1.0 AS cnt FROM ch GROUP BY doc_id, substr(text, i, 1)), "
            "e AS (SELECT doc_id, any_value(n_ch) AS n_ch, "
            "round(-sum((cnt / n_ch) * ln(cnt / n_ch)), 4) AS char_entropy "
            "FROM c GROUP BY doc_id) "
            "SELECT doc_id, CAST(n_ch AS BIGINT) AS n_ch, char_entropy FROM e"
        ),
        "t_langid_eval": (
            f"WITH pred AS ({lang_sql}) "
            "SELECT d.lang AS lang, p.lang_id AS pred, "
            "CAST(count(*) AS BIGINT) AS cnt "
            "FROM pred p JOIN documents d ON p.doc_id = d.doc_id "
            "GROUP BY d.lang, p.lang_id ORDER BY lang, pred"
        ),
        "r85_normalize": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day) "
            "SELECT day, round(s, 4) AS s, "
            "round(s / sum(s) OVER (), 4) AS pct_of_sum, "
            "round((s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ()), 4) AS rescaled "
            "FROM d ORDER BY day"
        ),
        "r83_transitions": (
            "WITH o AS (SELECT user_id, event_type, lead(event_type) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events), "
            "p AS (SELECT event_type AS from_type, nxt AS to_type, count(*) AS cnt "
            "FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2) "
            "SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt, "
            "round(cnt * 1.0 / sum(cnt) OVER (PARTITION BY from_type), 4) AS prob "
            "FROM p ORDER BY from_type, to_type"
        ),
        "r84_conversion_lag": (
            "WITH c AS (SELECT user_id, min(ts) AS c_ts FROM events "
            "WHERE event_type = 'click' GROUP BY user_id), "
            "p AS (SELECT c.user_id, min(e.ts) AS p_ts, min(c.c_ts) AS c_ts "
            "FROM events e JOIN c ON e.user_id = c.user_id "
            "WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY c.user_id) "
            "SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_users, "
            "CAST(count(*) AS BIGINT) AS n_conv, "
            "round(avg((epoch_us(p_ts) - epoch_us(c_ts)) / 1000000.0), 4) AS mean_lag_s "
            "FROM p"
        ),
        "t_fertility": (
            "WITH c AS (SELECT lang, "
            f"len(regexp_extract_all(coalesce(text, ''), '{WS_PATTERN}')) AS ws, "
            f"len(regexp_extract_all(coalesce(text, ''), '{_bpe}')) AS bpe "
            "FROM documents) "
            "SELECT lang, CAST(sum(ws) AS BIGINT) AS n_ws, "
            "CAST(sum(bpe) AS BIGINT) AS n_bpe, "
            "round(sum(bpe) * 1.0 / sum(ws), 4) AS fertility "
            "FROM c GROUP BY lang ORDER BY lang"
        ),
        "t_novelty": (
            "WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(ts) >= 3 THEN "
            "list_distinct(list_transform(range(1, len(ts) - 1), "
            "j -> ts[j] || ' ' || ts[j+1] || ' ' || ts[j+2])) "
            "WHEN len(ts) > 0 THEN [array_to_string(ts, ' ')] ELSE [] END AS shingles FROM tok), "
            "e AS (SELECT doc_id, unnest(shingles) AS s FROM sh), "
            "f AS (SELECT s, min(doc_id) AS first_doc FROM e GROUP BY s) "
            "SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_shingles, "
            "round(CAST(count(*) FILTER (WHERE f.first_doc = e.doc_id) AS DOUBLE) "
            "/ count(*), 4) AS novel_frac "
            "FROM e JOIN f ON e.s = f.s GROUP BY e.doc_id"
        ),
        "r82_autocorr": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "l AS (SELECT s AS y, lag(s) OVER (ORDER BY day) AS x FROM d), "
            "v AS (SELECT x, y FROM l WHERE x IS NOT NULL), "
            "m AS (SELECT count(*) * 1.0 AS n, sum(x) AS sx, sum(y) AS sy, "
            "sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy FROM v) "
            "SELECT CAST(n AS BIGINT) AS n_lags, "
            "round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 4) AS acf1 FROM m"
        ),
        "r80_change_point": (
            "WITH d AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, "
            "sum(value) AS s FROM events GROUP BY day), "
            "c AS (SELECT day, sum(s - (SELECT sum(s) / count(*) FROM d)) "
            "OVER (ORDER BY day) AS cu FROM d) "
            "SELECT day AS change_day, round(abs(cu), 4) AS magnitude "
            "FROM c ORDER BY abs(cu) DESC, day LIMIT 1"
        ),
        "t_zipf": (
            f"WITH tk AS (SELECT unnest({toks}) AS tok FROM documents), "
            "c AS (SELECT tok, count(*) * 1.0 AS cnt FROM tk GROUP BY tok), "
            "r AS (SELECT ln(row_number() OVER (ORDER BY cnt DESC, tok)) AS lr, "
            "ln(cnt) AS lc FROM c), "
            "m AS (SELECT count(*) * 1.0 AS n, sum(lr) AS sx, sum(lc) AS sy, "
            "sum(lr * lr) AS sxx, sum(lr * lc) AS sxy FROM r) "
            "SELECT CAST(n AS BIGINT) AS n_types, "
            "round(-((n * sxy - sx * sy) / (n * sxx - sx * sx)), 4) AS zipf_s, "
            "round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4) AS intercept "
            "FROM m"
        ),
        "r81_two_proportions": (
            "WITH g AS (SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 2 AS grp, "
            "count(*) * 1.0 AS n, "
            "CAST(count(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS s "
            "FROM events GROUP BY grp), "
            "w AS (SELECT max(n) FILTER (WHERE grp = 0) AS n1, "
            "max(s) FILTER (WHERE grp = 0) AS s1, "
            "max(n) FILTER (WHERE grp = 1) AS n2, "
            "max(s) FILTER (WHERE grp = 1) AS s2 FROM g) "
            "SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, "
            "round(s1 / n1, 4) AS p1, round(s2 / n2, 4) AS p2, "
            "round((s1 / n1 - s2 / n2) / sqrt(((s1 + s2) / (n1 + n2)) "
            "* (1 - (s1 + s2) / (n1 + n2)) * (1 / n1 + 1 / n2)), 4) AS z_stat FROM w"
        ),
        # rows-only (non-SQL-expressible): mm_features (stubbed decode)
    }
