"""ES snapshot / restore for an index directory.

Reference lineage: Elasticsearch `PUT _snapshot/<repo>/<name>` copies
the index's immutable segment files into a repository with per-file
checksums; `_restore` copies them back and verifies. The on-disk
index here is the same shape — immutable parquet + small JSON
manifests — so a snapshot is a verified file copy.

Scale shape: files are copied AND sha256-hashed inside Ray tasks (one
task per file, bounded by Ray's scheduler), so a multi-TB index
snapshots at cluster bandwidth, not driver bandwidth; the driver only
collects (relative-path, sha256, bytes) triples into the snapshot
manifest. Restore is the same fan-out in reverse, re-hashing each
file and failing loudly on any mismatch; the destination is built
under a temp name and atomically renamed, so a crashed restore never
leaves a half-index behind.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


def _sha256_file(path: str) -> tuple[str, int]:
    h = hashlib.sha256()
    n = 0
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
            n += len(chunk)
    return h.hexdigest(), n


def _rel_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            out.append(os.path.relpath(os.path.join(dirpath, fn), root))
    return sorted(out)


def _chunks(items: list, max_tasks: int = 64) -> list[list]:
    """Group per-file work into at most ``max_tasks`` Ray tasks: an
    index directory is many small parquet files, and one task per file
    is scheduler-overhead-dominated; one task per chunk still copies /
    hashes at cluster bandwidth (64 concurrent streams) while a small
    index costs a handful of tasks instead of hundreds."""
    n = max(1, -(-len(items) // max_tasks))
    return [items[i : i + n] for i in range(0, len(items), n)]


def create_snapshot(index_dir: str, repo_dir: str, name: str) -> dict:
    """Copy ``index_dir`` into ``repo_dir/name`` (atomic: built under a
    temp name, renamed on success) and write ``SNAPSHOT.json`` with
    per-file sha256 + sizes. Returns the manifest. Fails if the
    snapshot name already exists (snapshots are immutable)."""
    import ray

    dest = os.path.join(repo_dir, name)
    if os.path.exists(dest):
        raise FileExistsError(f"snapshot {name!r} already exists in {repo_dir}")
    tmp = dest + ".tmp_snapshot"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    rels = _rel_files(index_dir)

    @ray.remote(num_cpus=0.5)
    def _copy(chunk: list[str]) -> list[tuple[str, str, int]]:
        out = []
        for rel in chunk:
            src, dst = os.path.join(index_dir, rel), os.path.join(tmp, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copyfile(src, dst)
            sha, nbytes = _sha256_file(dst)
            out.append((rel, sha, nbytes))
        return out

    triples = [t for c in ray.get([_copy.remote(c) for c in _chunks(rels)]) for t in c]
    manifest = {
        "name": name,
        "created_unix": int(time.time()),
        "source": os.path.abspath(index_dir),
        "files": {rel: {"sha256": sha, "bytes": nb} for rel, sha, nb in sorted(triples)},
        "total_bytes": int(sum(nb for _, _, nb in triples)),
    }
    with open(os.path.join(tmp, "SNAPSHOT.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(tmp, dest)
    return manifest


def verify_snapshot(repo_dir: str, name: str) -> dict:
    """Re-hash every file against SNAPSHOT.json; returns
    {ok, checked, mismatched: [...], missing: [...]}."""
    import ray

    root = os.path.join(repo_dir, name)
    with open(os.path.join(root, "SNAPSHOT.json")) as f:
        manifest = json.load(f)

    @ray.remote(num_cpus=0.5)
    def _check(chunk: list[tuple[str, str]]) -> list[tuple[str, str]]:
        out = []
        for rel, want in chunk:
            p = os.path.join(root, rel)
            if not os.path.exists(p):
                out.append((rel, "missing"))
                continue
            sha, _ = _sha256_file(p)
            out.append((rel, "ok" if sha == want else "mismatch"))
        return out

    pairs = [(rel, meta["sha256"]) for rel, meta in manifest["files"].items()]
    res = [r for c in ray.get([_check.remote(c) for c in _chunks(pairs)]) for r in c]
    mismatched = sorted(r for r, s in res if s == "mismatch")
    missing = sorted(r for r, s in res if s == "missing")
    return {
        "ok": not mismatched and not missing,
        "checked": len(res),
        "mismatched": mismatched,
        "missing": missing,
    }


def restore_snapshot(repo_dir: str, name: str, dest_dir: str) -> dict:
    """Copy the snapshot into ``dest_dir`` (atomic temp + rename),
    re-hashing every file against the snapshot manifest — a silent
    bit-flip in the repository fails the restore instead of serving
    corrupt postings. Returns the snapshot manifest."""
    import ray

    root = os.path.join(repo_dir, name)
    with open(os.path.join(root, "SNAPSHOT.json")) as f:
        manifest = json.load(f)
    if os.path.exists(dest_dir):
        raise FileExistsError(f"restore destination {dest_dir!r} already exists")
    tmp = dest_dir + ".tmp_restore"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    @ray.remote(num_cpus=0.5)
    def _copy(chunk: list[tuple[str, str]]) -> None:
        for rel, want in chunk:
            src, dst = os.path.join(root, rel), os.path.join(tmp, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copyfile(src, dst)
            sha, _ = _sha256_file(dst)
            if sha != want:
                raise IOError(f"snapshot file {rel} corrupt: sha {sha} != {want}")

    pairs = [(rel, meta["sha256"]) for rel, meta in manifest["files"].items()]
    ray.get([_copy.remote(c) for c in _chunks(pairs)])
    os.rename(tmp, dest_dir)
    return manifest
