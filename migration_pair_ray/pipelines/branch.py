"""Branch merge: fold a diverged clone's changes back (git-merge for lakes).

``clone_lake`` forks a lake in O(metadata); after the fork each branch
consumes its own change files.  ``merge_branch(dst, src)`` completes the
lifecycle: every change file SRC consumed that DST has not is linked into
DST's change log and replayed through the normal pass machinery — the
merge IS a replay, so it inherits every durability property (idempotent
manifest commits, crash-resume, quarantine/txn gates, lineage).

Why this is sound: the merge kernels are join-semilattices over event
sets, so applying the union of both branches' events converges — and is
ORDER-FREE: ``merge_branch(a, b)`` and ``merge_branch(b, a)`` yield the
same visible state (tested).  Conflicts resolve exactly like concurrent
writers in a single log: per key, max (ts, lsn) wins; a delete on one
branch vs a later update on the other resolves by event time, never by
merge direction.  Two branches minting NON-IDENTICAL events with an equal
(ts, lsn) — e.g. both running ``delete_where`` with colliding synthetic
lsns — is the one undefined case, the same contract as any at-least-once
log (an lsn names one event).

Identity is file-level: a change file is the unit of history (the same
basename must be the same bytes on both branches — append-only contract),
so shared pre-fork history is skipped for free, and the merge moves only
the divergent suffix.  Passes that did not come from the change log
cannot be re-derived here and are refused by namespace: ``bulk:`` (bulk
loads — re-run ``bulk_load`` against the merged lake instead) and
``src<k>:`` (multi-source lakes have a registry-defined lsn namespace;
merge the SOURCES, not the branches).

Scale: O(divergent change files) link syscalls + one replay of the
divergent events; nothing proportional to lake size.
"""

from __future__ import annotations

import os
from pathlib import Path

from migration_pair_ray.config import JobConfig
from migration_pair_ray.state.manifest import CheckpointStore, LakeMeta


class BranchMergeError(RuntimeError):
    pass


def _divergent_files(dst_cfg: JobConfig, src_cfg: JobConfig) -> list[str]:
    src_ck = CheckpointStore(src_cfg.checkpoint_dir)
    dst_ck = CheckpointStore(dst_cfg.checkpoint_dir)
    dst_done = dst_ck.committed_files()
    missing = sorted(src_ck.committed_files() - dst_done)
    bad = [n for n in missing if ":" in n]
    if bad:
        raise BranchMergeError(
            f"src branch has {len(bad)} committed pass file(s) that did not "
            f"come from its change log (e.g. {bad[0]!r}): bulk loads must be "
            f"re-run against the merged lake, multi-source lakes merge at "
            f"the source level, not the branch level")
    return missing


def merge_branch(dst_cfg: JobConfig, src_cfg: JobConfig,
                 dry_run: bool = False) -> dict:
    """Merge SRC's divergent change history into DST and replay it.

    Returns the replay stats plus ``{"merged_files": n}``.  Idempotent:
    a crash mid-link re-links only what's missing on re-run; a re-run
    after success is a no-op replay.  ``dry_run=True`` reports the
    divergent file list without touching anything."""
    src_meta = LakeMeta(src_cfg.lake_dir).read()
    dst_meta = LakeMeta(dst_cfg.lake_dir).read()
    if src_meta and dst_meta and \
            src_meta.get("merge_kernel", "row") != dst_meta.get("merge_kernel", "row"):
        raise BranchMergeError(
            f"kernel mismatch: src={src_meta.get('merge_kernel')!r} "
            f"dst={dst_meta.get('merge_kernel')!r} — a row-kernel fold of "
            f"cell determiner rows (or vice versa) corrupts silently")
    missing = _divergent_files(dst_cfg, src_cfg)
    if dry_run:
        return {"merged_files": len(missing), "files": missing,
                "dry_run": True}
    src_sizes = CheckpointStore(src_cfg.checkpoint_dir).committed_sizes()
    for name in missing:
        s = Path(src_cfg.changelog_dir) / name
        d = Path(dst_cfg.changelog_dir) / name
        if not s.exists():
            raise BranchMergeError(
                f"src branch committed {name} but the file has left its "
                f"change log (truncated past the fork?) — cannot merge; "
                f"bootstrap a fresh branch from src instead")
        want = src_sizes.get(name)
        if want is not None and s.stat().st_size != want:
            raise BranchMergeError(
                f"{name} on src disk ({s.stat().st_size} B) != the size its "
                f"checkpoint recorded ({want} B): append-only contract "
                f"violated on src; refusing to merge corrupted history")
        if d.exists():
            if d.stat().st_size != s.stat().st_size:
                raise BranchMergeError(
                    f"{name} exists on BOTH branches with different sizes "
                    f"({d.stat().st_size} vs {s.stat().st_size} B): the two "
                    f"branches minted different events under one basename — "
                    f"an lsn/file namespace collision, not a mergeable "
                    f"divergence")
            continue  # crash-resume: already linked
        try:
            os.link(s, d)
        except OSError:
            import shutil
            shutil.copy2(s, d)
    from migration_pair_ray.pipelines.replay import replay
    stats = replay(dst_cfg)
    stats["merged_files"] = len(missing)
    return stats
