"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Schema matches the north-rule `input_hint` exactly:
(repo:string, path:string, commit:string, lang:string, content:string).

Fully seeded: row i's content depends only on (seed, i), so any two
runs — and any two parallelism levels — produce byte-identical corpora.
Generation is expressed as a Ray Data pipeline (`ray.data.range(n)` ->
`map_batches`) so the bench corpus is produced in parallel without a
driver-side loop; content length is Zipf-ish (5..~2000 tokens) to
exercise BM25 length normalization, and keyword tokens (`def`,
`import`, ...) appear in most documents to exercise hot-term skew.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LANGS = ["python", "java", "go", "js", "rust", "c", "md"]
LANG_W = np.array([0.30, 0.15, 0.12, 0.15, 0.10, 0.10, 0.08])
EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs", "c": "c", "md": "md"}

KEYWORDS = "def class import return if for while else try except from with lambda yield".split()
IDENTS = (
    "parse_config build_index tokenizer posting merge_shards varbyte block_max scorer "
    "read_parquet write_batch doc_id bucket shard heap top_k query planner analyzer "
    "stream executor backpressure manifest checkpoint resume lineage metrics throughput "
    "inverted index compression delta encode decode skip pointer wand okapi bm25 ranker"
).split()
LITERALS = "0 1 2 42 100 none true false null".split()
DIRS = "src lib core util engine io net test docs".split()

VOCAB = KEYWORDS + IDENTS + LITERALS
# sampling weights: keywords hot (Zipf head), identifiers mid, literals tail
_VW = np.concatenate(
    [
        np.full(len(KEYWORDS), 8.0),
        1.0 / np.arange(1, len(IDENTS) + 1) ** 0.7,
        np.full(len(LITERALS), 0.05),
    ]
)
_VW = _VW / _VW.sum()


def _gen_batch(batch: dict, *, seed: int) -> pa.Table:
    ids = batch["id"].astype(np.int64)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in ids.tolist():
        rng = np.random.default_rng(seed * 1_000_003 + i)
        lang = LANGS[int(rng.choice(len(LANGS), p=LANG_W))]
        repo = f"org{i % 7}/repo{i % 53}"
        d = DIRS[int(rng.integers(len(DIRS)))]
        path = f"src/{d}/{IDENTS[int(rng.integers(len(IDENTS)))]}_{i}.{EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        # Zipf-ish doc length in [5, ~2000]
        n_tok = int(min(2000, 5 + rng.pareto(1.1) * 40))
        toks = rng.choice(len(VOCAB), size=n_tok, p=_VW)
        content = " ".join(VOCAB[t] for t in toks)
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(content)
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        }
    )


def corpus_dataset(n_docs: int, seed: int = 42):
    """Lazy Ray Dataset of the synthetic corpus."""
    import ray.data as rd

    ds = rd.range(n_docs)
    return ds.map_batches(_gen_batch, batch_format="numpy", fn_kwargs={"seed": seed})


def corpus_table(n_docs: int, seed: int = 42) -> pa.Table:
    """Driver-side (small) corpus for unit tests — same bytes as the
    Ray path for the same (n_docs, seed)."""
    return _gen_batch({"id": np.arange(n_docs, dtype=np.int64)}, seed=seed)


def write_corpus(path: str, n_docs: int, seed: int = 42, files: int = 8) -> str:
    ds = corpus_dataset(n_docs, seed)
    ds.repartition(files).write_parquet(path)
    return path
