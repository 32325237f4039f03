"""Index configuration.

The knobs that matter at 100 TB scale are explicit here:

- ``num_buckets``: doc-shard count. Postings are keyed by
  ``(term, bucket)`` where ``bucket = doc_id % num_buckets``, so a hot
  term's posting list is split across ``num_buckets`` shuffle groups —
  this IS the salted repartitioning of hot terms the north rule asks
  for (the salt is the doc shard, so it needs no second pass to detect
  hot keys, and query-time merge is trivial because buckets partition
  the doc space). Size so that (docs per bucket x query terms) fits a
  worker's heap; at 10^12 docs use ~2^14 buckets.
- ``num_parts``: on-disk layout partitions, ``part = hash(term) %
  num_parts`` — a query for Q terms prunes the read to <= Q partition
  directories (hive partition pruning on ``part`` plus parquet
  row-group stats on ``term``).
- ``block_size``: postings are encoded in blocks of this many docs,
  each with (first_doc_id, byte offsets, max_tf, min_dl) metadata for
  block-max pruning / skipping without decoding.

Field handling mirrors the reference's Atlas Search index definition
(name/barcode/store_id text + autocomplete analyzers, SURVEY.md §1.1):
each indexed field gets its own term namespace ``"<code>:<token>"`` and
its own length normalization (per-field BM25, like Lucene); fields with
``ngram=True`` additionally index edge-n-grams under ``"<code>>:<gram>"``
for prefix / autocomplete queries (reference `$search.autocomplete`,
search_utils.py:182-237).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field


@dataclass(frozen=True)
class FieldSpec:
    """One indexed field: ``name`` is the source column, ``code`` the
    short term-namespace prefix, ``ngram`` enables edge-n-gram terms
    (autocomplete), bounded by ``ngram_min``/``ngram_max`` chars."""

    name: str
    code: str
    ngram: bool = False
    ngram_min: int = 2
    ngram_max: int = 8
    # S9 sounds-like: additionally index each token's phonetic key
    # under the "<code>~:" namespace (reference metaphone.py, dormant)
    phonetic: bool = False
    # which key function (analysis.PHONETIC_ALGOS): "soundex" (default)
    # or "metaphone" (classic Metaphone, the reference family)
    phonetic_algo: str = "soundex"


@dataclass(frozen=True)
class IndexConfig:
    fields: tuple[FieldSpec, ...] = (
        FieldSpec("content", "c"),
        FieldSpec("path", "p", ngram=True),
        FieldSpec("repo", "r", ngram=True),
    )
    num_buckets: int = 16
    num_parts: int = 8
    block_size: int = 128
    # posting-stream codec: "for" (bit-packed frame-of-reference,
    # postings format v3 — PForDelta-style binary packing, ~2x smaller
    # doc/tf streams than varbyte on rank-gap data) or "varbyte"
    # (format v2). Readers accept both; the stats.json postings_format
    # records which one an index was built with.
    codec: str = "for"
    k1: float = 1.2
    b: float = 0.75
    # columns carried into the docmap (doc store) besides doc_id/bucket
    docmap_cols: tuple[str, ...] = ("repo", "path", "commit", "lang", "content_sha256")
    id_cols: tuple[str, ...] = ("repo", "path")
    # when True, id_cols is a single pre-existing non-negative int64
    # column used verbatim as doc_id (no hashing) — results then carry
    # the source table's own ids (e.g. the `documents.doc_id` testdata)
    use_native_id: bool = False
    # named analyzer (analysis.ANALYZERS) applied at BOTH index and
    # query time; register new ones there to plug in (SURVEY §2.5b)
    analyzer: str = "code"
    # merge-task memory bound: at build time num_parts is RAISED (never
    # lowered) so that one part's decoded partial postings stay under
    # this many bytes — the merge task loads exactly one part
    # (index/build.py _merge_part), so this caps its heap at ANY corpus
    # size. Set auto_num_parts=False to pin num_parts exactly.
    merge_part_target_bytes: int = 1 << 30
    auto_num_parts: bool = True
    # merge-task granularity: each part's merge is split into this
    # many bucket-group tasks (bg = bucket % merge_groups), so a
    # term-hash part that drew the hot (Zipf-head) terms can't become
    # the merge straggler — its postings spread across merge_groups
    # disjoint tasks (hot terms are bucket-salted, so groups split
    # them evenly). Measured at 600k docs/16 cpus: 32% lower merge
    # wall AND lower total task time (smaller, cache-resident sorts)
    # vs one task per part. Build-time only — the on-disk index layout
    # (postings/part=K/bucket=B, dict/part=K) is unchanged. Clamped to
    # num_buckets.
    merge_groups: int = 4
    # cap on dictionary range-scan prefix expansion (Lucene's
    # maxExpansions analog): at web scale a 2-char prefix can match
    # millions of terms; the cap keeps query cost bounded (expansions
    # beyond it are dropped lexicographically — raise for exhaustive
    # semantics)
    max_prefix_expansions: int = 4096

    def field_by_name(self, name: str) -> FieldSpec:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    def term_key(self, field_name: str, token: str) -> str:
        return f"{self.field_by_name(field_name).code}:{token}"

    def prefix_key(self, field_name: str, gram: str) -> str:
        spec = self.field_by_name(field_name)
        if not spec.ngram:
            raise ValueError(f"field {field_name!r} has no edge-n-gram terms")
        return f"{spec.code}>:{gram}"

    def phonetic_key(self, field_name: str, token: str) -> str:
        from search_engine_ray.analysis import PHONETIC_ALGOS

        spec = self.field_by_name(field_name)
        if not spec.phonetic:
            raise ValueError(f"field {field_name!r} has no phonetic terms")
        return f"{spec.code}~:{PHONETIC_ALGOS[spec.phonetic_algo](token)}"


def term_part(term: str, num_parts: int) -> int:
    """Stable (process-independent) term -> disk-partition hash."""
    return zlib.crc32(term.encode("utf-8")) % num_parts


# decoded in-memory partials ≈ this multiple of the compressed source
# parquet bytes (int64-heavy posting arrays vs compressed text)
_PARTIAL_EXPANSION = 3


def derive_num_parts(config: IndexConfig, input_bytes: int) -> int:
    """num_parts such that one part's decoded partials fit the merge
    task's memory target. Only ever RAISES config.num_parts (small
    corpora keep the configured layout); identity when
    auto_num_parts=False or the input size is unknown."""
    if not config.auto_num_parts or not input_bytes:
        return config.num_parts
    est = int(input_bytes) * _PARTIAL_EXPANSION
    derived = -(-est // config.merge_part_target_bytes)
    return max(config.num_parts, int(derived))


# The corpus table for the driver's `documents` testdata uses different
# column names; this config adapts the same engine to it.
DOCUMENTS_CONFIG = IndexConfig(
    fields=(
        # phonetic=True: S9 sounds-like namespace over the text field
        # (driver entry s9_phonetic; oracle computes soundex in SQL)
        FieldSpec("text", "c", phonetic=True),
        FieldSpec("source", "p", ngram=True),
    ),
    num_buckets=8,
    num_parts=4,
    docmap_cols=("lang", "source", "n_chars", "content_sha256"),
    id_cols=("doc_id",),
    use_native_id=True,
)
