"""ES index aliases: a level of indirection over index directories.

Reference lineage: Elasticsearch `POST _aliases` with a combined
remove+add action — clients address the alias, a reindex builds the
new physical index beside the old one, and one atomic alias flip cuts
traffic over with zero downtime (the standard mapping-change /
reindex playbook).

The alias here is a one-line JSON file; `set_alias` writes a temp file
and `os.replace`s it, so a reader never observes a torn pointer —
the same atomic-rename discipline as the build manifest and the
full-refresh sink. On shared storage every node sees the flip at its
next `resolve_alias`, which is exactly ES's "new searches hit the new
index, in-flight searches finish on the old one" semantics.
"""

from __future__ import annotations

import json
import os


def set_alias(alias_path: str, target_dir: str) -> None:
    """Atomically point ``alias_path`` at ``target_dir`` (ES
    `_aliases` remove+add in one action). The target must already be a
    servable index (manifest present) — refuse to flip to a half-built
    one."""
    if not os.path.exists(os.path.join(target_dir, "manifest.json")) and not any(
        os.path.exists(os.path.join(target_dir, d, "manifest.json"))
        for d in (os.listdir(target_dir) if os.path.isdir(target_dir) else [])
    ):
        raise ValueError(f"alias target {target_dir!r} is not a servable index")
    tmp = alias_path + ".tmp"
    os.makedirs(os.path.dirname(alias_path) or ".", exist_ok=True)
    with open(tmp, "w") as f:
        json.dump({"target": target_dir}, f)
    os.replace(tmp, alias_path)


def resolve_alias(alias_path: str) -> str:
    """Return the index directory the alias currently points at."""
    with open(alias_path) as f:
        return json.load(f)["target"]
