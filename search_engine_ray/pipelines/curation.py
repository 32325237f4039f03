"""Training-data curation pipeline (task brief: the composition a
100-TB crawl actually runs) — language-ID -> quality score -> filter
-> exact dedup, end to end as ONE streaming Dataset lineage.

Every stage is an existing vectorized op; the only shuffle in the
whole pipeline is the dedup groupby, whose payload is one row per
distinct content digest per block (map-side combiner inside
group_dedup_first). Everything upstream is embarrassingly parallel
map_batches, so the pipeline streams at any corpus size.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from search_engine_ray.ops.relational import filter_conditions, group_dedup_first
from search_engine_ray.ops.text import add_lang_id, add_quality_score


def curate(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.55,
) -> Dataset:
    """Keep high-quality `lang` documents, one per distinct content:
    add lang_id + quality columns, filter, then exact-dedup keeping
    the lowest id per content digest. Returns (id, lang_id, quality)
    — both score columns already rounded the DuckDB way by their ops,
    so the threshold compares identically against a SQL oracle."""
    scored = add_quality_score(add_lang_id(docs, text_col), text_col)
    kept = filter_conditions(
        scored, [("lang_id", "==", lang), ("quality", ">=", min_quality)]
    )

    def _digest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_digest"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in df[text_col]
        ]
        return df

    deduped = group_dedup_first(
        kept.map_batches(_digest, batch_format="pandas"),
        key="_digest",
        sort_keys=[id_col],
    )
    return deduped.select_columns([id_col, "lang_id", "quality"])
