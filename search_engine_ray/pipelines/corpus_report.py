"""Corpus card (the Dolma/RefinedWeb-style datasheet pass): ONE
combiner-shaped pass over the corpus emits the headline statistics a
training-data audit starts from — per-language doc counts, token
totals, mean quality — plus the exact-dup profile from the dedup
digest shuffle.

Scale shape: the stats pass never shuffles rows — every batch reduces
to a handful of (metric, key, value) partials and a tiny groupby-sum
folds them (payload: #langs + 3 rows per block). The only row-bounded
shuffle is exact_dedup's digest groupby, itself map-side combined.
Output is a driver-sized table (O(#langs) rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from search_engine_ray.ops.dedup import exact_dedup
from search_engine_ray.ops.rounding import round_half_up
from search_engine_ray.ops.text import _flat_tokens, add_quality_score


def corpus_report(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> pd.DataFrame:
    """Returns (metric, key, value) rows:

      docs / <lang>        document count per language
      docs / all           corpus size
      tokens / all         total token count (the analyzer tokenizer)
      avg_tokens / all     round(tokens / docs, 4)
      mean_quality / all   round(sum(per-doc rounded quality)/docs, 4)
      distinct_texts / all distinct content digests (exact_dedup)
      dup_excess / all     docs - distinct_texts

    Integer metrics are exact; fractional ones round to 4 like every
    other oracle-checked op."""
    scored = add_quality_score(docs, text_col)

    def _partial(t: pa.Table) -> pa.Table:
        _flat, parents, n = _flat_tokens(t[text_col])
        n_tok = int(parents.size)
        qsum = float(t["quality"].to_numpy().sum()) if n else 0.0
        langs = [str(v) for v in t[lang_col].to_pylist()]
        u, c = np.unique(np.asarray(langs), return_counts=True) if n else ([], [])
        metric = [f"docs/{v}" for v in u] + ["docs/all", "tokens/all", "qsum/all"]
        value = [float(x) for x in c] + [float(n), float(n_tok), qsum]
        return pa.table(
            {"mk": pa.array(metric, pa.string()), "value": pa.array(value, pa.float64())}
        )

    agg = (
        scored.map_batches(_partial, batch_format="pyarrow")
        .groupby("mk")
        .aggregate(Sum("value", alias_name="value"))
        .to_pandas()
        .set_index("mk")["value"]
    )
    n_docs = float(agg.get("docs/all", 0.0))
    n_tokens = float(agg.get("tokens/all", 0.0))
    qsum = float(agg.get("qsum/all", 0.0))
    distinct = float(exact_dedup(docs, text_col, id_col).count())

    rows = [
        ("docs", k.split("/", 1)[1], float(v))
        for k, v in agg.items()
        if k.startswith("docs/") and k != "docs/all"
    ]
    rows += [
        ("docs", "all", n_docs),
        ("tokens", "all", n_tokens),
        ("avg_tokens", "all", float(round_half_up(np.array([n_tokens / n_docs]))[0]) if n_docs else 0.0),
        ("mean_quality", "all", float(round_half_up(np.array([qsum / n_docs]))[0]) if n_docs else 0.0),
        ("distinct_texts", "all", distinct),
        ("dup_excess", "all", n_docs - distinct),
    ]
    out = pd.DataFrame(rows, columns=["metric", "key", "value"])
    return out.sort_values(["metric", "key"]).reset_index(drop=True)
