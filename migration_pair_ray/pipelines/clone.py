"""Zero-copy lake clone (branching).

``clone_lake`` snapshots a lake into a new directory by HARDLINKING its
data files (state/chunk/delta Parquet, bloom sidecars) and carrying its
control plane (manifests, checkpoints, lineage, lake meta, index/feed
artifacts) — the Delta-Lake-style "shallow clone" that makes experiments,
repro runs, and blue/green migrations O(metadata) instead of O(data).

Why hardlinks are safe here: every mutation path in this engine writes a
NEW file and commits it with an fsync'd atomic rename — nothing ever
appends to or rewrites a committed file in place (the single exception,
``_writer.lock``, is excluded).  After a clone the two lakes share inodes
but diverge freely: a new pass on either side writes fresh files, and
GC/vacuum's ``unlink`` only drops that side's link.  On a multi-node
cluster the lake lives on shared storage, so the same trick holds wherever
the filesystem supports links; when it doesn't (cross-device dst), the
clone degrades file-by-file to a copy.

Consistency: the source's writer lease is held for the duration of the
clone, so the cloned control plane is a committed-pass snapshot, never a
mid-commit interleaving.  The clone is built in a temp directory and
renamed into place — a crashed clone is invisible.

Reference analog: none (the reference is a one-shot copier); this is
engine-side lake lifecycle, same family as split/merge/vacuum.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from migration_pair_ray.state.lock import WriterLease
from migration_pair_ray.state.manifest import _fsync_dir


class CloneError(RuntimeError):
    pass


_EXCLUDE = {WriterLease.FILE}


def clone_lake(src_lake_dir: str, dst_lake_dir: str,
               owner: str = "clone") -> dict:
    """Snapshot ``src_lake_dir`` into ``dst_lake_dir``.  Returns
    ``{files, linked, copied, bytes}``.  Raises ``CloneError`` when the
    source is not a lake or the destination already exists."""
    src = Path(src_lake_dir)
    dst = Path(dst_lake_dir)
    if not (src / "_lake_meta.json").exists():
        raise CloneError(f"not a lake (no _lake_meta.json): {src}")
    if dst.exists() and any(dst.iterdir()):
        raise CloneError(f"destination exists and is not empty: {dst}")

    tmp = dst.with_name(dst.name + f".tmp.{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    stats = {"files": 0, "linked": 0, "copied": 0, "bytes": 0}
    with WriterLease(str(src), owner=owner):
        for root, _dirs, files in os.walk(src):
            rel = Path(root).relative_to(src)
            out_dir = tmp / rel
            out_dir.mkdir(parents=True, exist_ok=True)
            for name in sorted(files):
                if name in _EXCLUDE or ".tmp." in name:
                    continue
                s, d = Path(root) / name, out_dir / name
                try:
                    os.link(s, d)
                    stats["linked"] += 1
                except OSError:
                    shutil.copy2(s, d)
                    stats["copied"] += 1
                stats["files"] += 1
                stats["bytes"] += s.stat().st_size
        # commit: fsync the tree bottom-up, then one atomic rename
        for root, _dirs, _files in os.walk(tmp, topdown=False):
            _fsync_dir(root)
        dst.parent.mkdir(parents=True, exist_ok=True)
        os.rename(tmp, dst)
        _fsync_dir(str(dst.parent))
    return stats
