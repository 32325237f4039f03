"""Index integrity check (fsck).

Verifies the structural invariants an index must satisfy to serve
correct results, plus the north-rule per-row invariant: every doc's
``content_sha256`` in the docmap equals the sha256 of its source text
(content equality preserved through the whole build pipeline).

Checks, per resolved shard (``shards/shard_*`` or the index root):

1. stats.json ``n_docs`` equals the docmap row count; doc ids are
   unique and live in their correct hash bucket (doc_id % num_buckets).
2. Every dictionary ``df`` equals the sum of that term's per-bucket
   ``df_local`` in the postings — and vice versa (no orphan postings).
3. (``decode=True``) every posting row's three streams decode to
   exactly ``df_local`` entries with strictly increasing in-universe
   doc ranks — catches truncated/corrupt stream bytes.
4. Tombstones reference only known doc ids.
5. (``source=...``) per-row sha256 equality against the source table —
   a distributed hash-join compare (both sides stream; the only
   shuffle is the join), counting missing/extra/mismatched docs.

Returns ``{"ok": bool, "errors": [...], "checks": {...}}`` — run it
from the CLI as ``python -m search_engine_ray fsck <index_dir>``.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from search_engine_ray.codec import block_delta_decode, for_decode_term, varbyte_decode
from search_engine_ray.config import IndexConfig


def _shard_dirs(index_dir: str) -> list[str]:
    shards = sorted(glob.glob(os.path.join(index_dir, "shards", "shard_*")))
    return shards or [index_dir]


def integrity_check(
    index_dir: str,
    config: IndexConfig | None = None,
    *,
    decode: bool = False,
    source=None,
    sha_col: str | None = None,
) -> dict:
    """See module docstring. ``source`` is a path / Ray Dataset of the
    original corpus for the sha256 check (needs ``config`` to rebuild
    doc ids the same way the ingest did)."""
    errors: list[str] = []
    checks: dict[str, int] = {
        "shards": 0, "docs": 0, "terms": 0, "decoded_rows": 0, "tombstones": 0,
    }
    all_ids: list[np.ndarray] = []
    for d in _shard_dirs(index_dir):
        checks["shards"] += 1
        tag = os.path.relpath(d, index_dir) if d != index_dir else "."
        try:
            stats = json.load(open(os.path.join(d, "stats.json")))
        except FileNotFoundError:
            errors.append(f"{tag}: stats.json missing")
            continue
        nb = int(stats["num_buckets"])
        npart = int(stats["num_parts"])
        fmt = int(stats.get("postings_format", 2))
        bs = int(stats.get("block_size", 128))
        # 1. docmap: row count, id uniqueness, bucket placement.
        # Keyed by the REAL bucket number — empty buckets have no
        # docmap dir, so a positional enumerate would shift every
        # later bucket's universe onto the wrong postings (caught by
        # the e13 driver entry: a corpus whose ids occupy only even
        # buckets fsck'd bucket 2 against bucket 4's universe).
        bucket_ids: dict[int, np.ndarray] = {}
        for b in range(nb):
            bdir = os.path.join(d, "docmap", f"bucket={b}")
            if not os.path.isdir(bdir):
                continue
            ids = pads.dataset(bdir).to_table(columns=["doc_id"])["doc_id"].to_numpy()
            if ids.size and np.unique(ids).size != ids.size:
                errors.append(f"{tag}: duplicate doc_id in docmap bucket {b}")
            if ids.size and not np.all(ids % nb == b):
                errors.append(f"{tag}: doc in wrong bucket {b}")
            bucket_ids[b] = ids
        n_docs = int(sum(i.size for i in bucket_ids.values()))
        checks["docs"] += n_docs
        if n_docs != int(stats["n_docs"]):
            errors.append(f"{tag}: stats n_docs={stats['n_docs']} but docmap holds {n_docs}")
        all_ids.extend(bucket_ids.values())
        universes = {b: np.sort(ids) for b, ids in bucket_ids.items() if ids.size}
        # 2. dictionary df == sum of postings df_local (both directions)
        for k in range(npart):
            dfiles = glob.glob(os.path.join(d, "dict", f"part={k}", "*.parquet"))
            ddf = (
                pads.dataset(dfiles).to_table(columns=["term", "df"])
                if dfiles
                else pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
            )
            proot = os.path.join(d, "postings", f"part={k}")
            cols = ["term", "df_local"] + (["doc_bytes", "tf_bytes", "dl_bytes", "bucket"] if decode else [])
            pt = (
                pads.dataset(proot, partitioning="hive").to_table(columns=cols)
                if os.path.isdir(proot)
                else pa.table({"term": pa.array([], pa.string()), "df_local": pa.array([], pa.int64())})
            )
            psum = pt.group_by("term").aggregate([("df_local", "sum")])
            dic = dict(zip(ddf["term"].to_pylist(), ddf["df"].to_pylist()))
            post = dict(zip(psum["term"].to_pylist(), psum["df_local_sum"].to_pylist()))
            checks["terms"] += len(dic)
            for term, df in dic.items():
                got = post.pop(term, None)
                if got is None:
                    errors.append(f"{tag}: dict term {term!r} has no postings (part {k})")
                elif int(got) != int(df):
                    errors.append(
                        f"{tag}: term {term!r} dict df={df} != postings df_local sum={got}"
                    )
            for term in post:
                errors.append(f"{tag}: postings term {term!r} missing from dict (part {k})")
            # 3. stream decode: counts + strictly increasing in-bounds ranks
            if decode and pt.num_rows:
                terms = pt["term"].to_pylist()
                dfl = pt["df_local"].to_numpy()
                buckets = pt["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
                for ri in range(pt.num_rows):
                    n = int(dfl[ri])
                    b = int(buckets[ri])
                    univ = universes.get(b, np.empty(0, np.int64))
                    try:
                        db = pt["doc_bytes"][ri].as_py()
                        tb = pt["tf_bytes"][ri].as_py()
                        lb = pt["dl_bytes"][ri].as_py()
                        if fmt == 3:
                            gaps = for_decode_term(np.frombuffer(db, np.uint8), n, bs, with_firsts=True)
                            tfs = for_decode_term(np.frombuffer(tb, np.uint8), n, bs, with_firsts=False)
                            dls = for_decode_term(np.frombuffer(lb, np.uint8), n, bs, with_firsts=False)
                        else:
                            gaps = varbyte_decode(np.frombuffer(db, np.uint8), n).astype(np.int64)
                            tfs = varbyte_decode(np.frombuffer(tb, np.uint8), n)
                            dls = varbyte_decode(np.frombuffer(lb, np.uint8), n)
                        starts = np.arange(0, n, bs, dtype=np.int64)
                        ranks = block_delta_decode(gaps, starts)
                    except Exception as e:  # truncated / garbage bytes
                        errors.append(f"{tag}: term {terms[ri]!r} bucket {b}: decode failed ({e})")
                        continue
                    checks["decoded_rows"] += 1
                    if len(ranks) != n or len(tfs) != n or len(dls) != n:
                        errors.append(f"{tag}: term {terms[ri]!r} bucket {b}: stream length != df_local")
                        continue
                    if n and (ranks[0] < 0 or ranks[-1] >= univ.size or np.any(np.diff(ranks) <= 0)):
                        errors.append(
                            f"{tag}: term {terms[ri]!r} bucket {b}: ranks not strictly "
                            f"increasing within the universe (n={n}, univ={univ.size})"
                        )
                    if n and (np.any(np.asarray(tfs) <= 0) or np.any(np.asarray(dls) <= 0)):
                        errors.append(f"{tag}: term {terms[ri]!r} bucket {b}: non-positive tf/dl")
    # 4. tombstones reference known docs
    from search_engine_ray.index.build import load_tombstones

    tomb = load_tombstones(index_dir)
    checks["tombstones"] = int(tomb.size)
    if tomb.size:
        known = np.unique(np.concatenate(all_ids)) if all_ids else np.empty(0, np.int64)
        missing = np.setdiff1d(tomb, known)
        if missing.size:
            errors.append(f"tombstones reference {missing.size} unknown doc ids")
    # 5. per-row content sha256 equality vs the source (north rule)
    if source is not None:
        checks.update(_sha_check(index_dir, source, config or IndexConfig(), sha_col, errors))
    return {"ok": not errors, "errors": errors, "checks": checks}


def _sha_check(index_dir: str, source, config: IndexConfig, sha_col: str | None, errors: list) -> dict:
    """Distributed (doc_id, sha256) compare: recompute ids+hashes from
    the source with the SAME ingest function the build used, hash-join
    against the docmap, count missing/extra/mismatching docs."""
    import ray.data as rd

    from search_engine_ray.index.build import make_ingest_fn
    from search_engine_ray.ops.relational import hash_join

    ds = rd.read_parquet(source) if isinstance(source, str) else source
    # same default the build uses (build_index: sha over the primary field)
    ingest = make_ingest_fn(config, sha_col or config.fields[0].name)

    def _src(t: pa.Table) -> pa.Table:
        out = ingest(t)
        return out.select(["doc_id", "content_sha256"]).rename_columns(["doc_id", "src_sha"])

    src = ds.map_batches(_src, batch_format="pyarrow")
    dm = rd.read_parquet(
        [os.path.join(d, "docmap") for d in _shard_dirs(index_dir)],
        columns=["doc_id", "content_sha256"],
    ).map_batches(
        lambda t: t.rename_columns(["dm_id", "dm_sha"]), batch_format="pyarrow"
    )
    joined = hash_join(src, dm, on=["doc_id"], right_on=["dm_id"], how="full_outer")
    agg = joined.map_batches(
        lambda t: pa.table(
            {
                "missing": [pc.sum(pc.is_null(t["dm_sha"])).as_py() or 0],
                "extra": [pc.sum(pc.is_null(t["src_sha"])).as_py() or 0],
                "mismatch": [
                    pc.sum(
                        pc.and_(
                            pc.and_(pc.is_valid(t["src_sha"]), pc.is_valid(t["dm_sha"])),
                            pc.not_equal(t["src_sha"], t["dm_sha"]),
                        )
                    ).as_py()
                    or 0
                ],
            }
        ),
        batch_format="pyarrow",
    ).to_pandas().sum()
    out = {
        "sha_missing": int(agg["missing"]),
        "sha_extra": int(agg["extra"]),
        "sha_mismatch": int(agg["mismatch"]),
    }
    for k, v in out.items():
        if v:
            errors.append(f"content sha256 check: {k.split('_')[1]}={v}")
    return out
