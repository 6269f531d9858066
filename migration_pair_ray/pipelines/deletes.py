"""Targeted deletes (GDPR / retention) THROUGH the CDC path.

``delete_where`` never touches state files: it evaluates a predicate over
the lake's visible winners, synthesizes one tombstone change event per
matching key, appends them to the change log as a regular ``batch-*``
file, and replays.  Every guarantee the engine already has — idempotent
manifest-gated commits, crash resume, lineage, time travel, fsck — applies
to the delete for free, because the delete IS a change batch.

Dominance without a global timestamp scan: each tombstone copies its
victim's winning ``ts`` and carries ``lsn = lake_max_lsn + 1`` (from the
manifests — no data I/O), so it beats the victim under the (ts, lsn) LWW
order while any LATER real update still resurrects the key — standard CDC
semantics.

Scale contract: predicate evaluation and key extraction run distributed
(``read_lake`` → ``map_batches``); only the matched tombstone rows are
collected to write ONE atomically-renamed change file.  A targeted delete
set is bounded by design — for mass deletes (most of the lake) use a
rewrite job (``repartition_lake``) instead, which this module guards with
``max_rows``.

Reference analog: none — the reference could only copy rows forward;
deletion of already-migrated rows required manual Cassandra ops.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from migration_pair_ray.config import JobConfig
from migration_pair_ray.state.manifest import LakeMeta, ManifestStore


class DeleteTooLarge(RuntimeError):
    """The predicate matched more keys than ``max_rows`` — use a rewrite
    job for mass deletes instead of a tombstone batch."""


def _lake_sig(cfg: JobConfig) -> tuple[str, int]:
    """(content signature, max lsn) of the lake's committed state — from
    manifests only, no data I/O.  The signature keys the delete file name:
    re-running the same delete against the same lake state is a no-op;
    against a changed lake it is a fresh (correct) re-evaluation."""
    store = ManifestStore(cfg.manifest_dir)
    pids = LakeMeta(cfg.lake_dir).active_partition_ids(cfg.num_partitions)
    h = hashlib.sha256()
    max_lsn = 0
    for pid in pids:
        m = store.read(pid)
        if m:
            h.update(f"{pid}:{m['pass_id']}:{m['row_count']}".encode())
            max_lsn = max(max_lsn, int(m.get("lsn_hi", 0)))
    return h.hexdigest()[:12], max_lsn


def delete_where(cfg: JobConfig,
                 predicate: Callable[[pa.Table], "pa.Array"],
                 tag: str, max_rows: int = 1_000_000,
                 apply: bool = True) -> dict:
    """Tombstone every visible key whose winner satisfies ``predicate``
    (a batch → boolean-mask callable), by appending a change batch and
    (when ``apply``) replaying it.

    Idempotent: the file name is derived from (tag, lake content
    signature); re-running after success finds the file already present /
    committed and does nothing.  Crash-safe: the file lands via atomic
    rename; a crash before the replay leaves a normal uncommitted change
    file the next replay consumes.
    """
    from migration_pair_ray.functions.lww import (finalize_visible,
                                                  visible_state)
    from migration_pair_ray.pipelines.replay import read_lake, replay

    sig, max_lsn = _lake_sig(cfg)
    name = f"batch-zz-delete-{_slug(tag)}-{sig}.parquet"
    path = Path(cfg.changelog_dir) / name
    committed = set()
    ckpt = Path(cfg.checkpoint_dir)
    if ckpt.exists():
        from migration_pair_ray.state.manifest import CheckpointStore
        committed = CheckpointStore(cfg.checkpoint_dir).committed_files()

    written = 0
    if path.exists() or name in committed:
        written = pq.ParquetFile(str(path)).metadata.num_rows if path.exists() else 0
    else:
        kernel = LakeMeta(cfg.lake_dir).merge_kernel()

        def match_keys(t: pa.Table) -> pa.Table:
            # cell lakes arrive pre-finalized (read_lake finalize=...), so
            # the predicate always sees ONE visible row per key; row lakes
            # finalize per block here (each key is one state row)
            vis = (t if kernel == "cell"
                   else visible_state(t, drop_meta=False))
            mask = predicate(vis)
            hit = vis.filter(mask)
            return pa.table({
                "conv_id": hit.column("conv_id"),
                "turn_idx": hit.column("turn_idx"),
                "ts": hit.column("ts"),       # victim's winning ts (copied)
            })

        src = (read_lake(cfg, finalize=lambda t: finalize_visible(t, "cell"))
               if kernel == "cell" else read_lake(cfg))
        keys = (src.map_batches(match_keys, batch_format="pyarrow")
                .take_all())                   # bounded: targeted delete set
        if len(keys) > max_rows:
            raise DeleteTooLarge(
                f"predicate matched {len(keys)} keys > max_rows {max_rows}; "
                f"a delete this large should be a rewrite job, not a "
                f"tombstone batch")
        written = len(keys)
        if written:
            # canonical CHANGE_SCHEMA types; the replay normalizer unifies
            # them with whatever the target lake evolved to
            t = pa.Table.from_pylist(keys, schema=pa.schema([
                pa.field("conv_id", pa.string()),
                pa.field("turn_idx", pa.int32()),
                pa.field("ts", pa.timestamp("us")),
            ]))
            tomb = pa.table({
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "role": pa.nulls(written, pa.string()),
                "text": pa.nulls(written, pa.string()),
                "tool": pa.nulls(written, pa.string()),
                "ts": t.column("ts"),
                "op": pa.array(np.full(written, "D"), pa.string()),
                "lsn": pa.array(np.full(written, max_lsn + 1, np.int64)),
            })
            # fsync'd like every commit-path write: a power loss after the
            # rename journals must never leave a truncated batch for the
            # next replay to consume
            from migration_pair_ray.stages.applier import _fsync_write_parquet
            _fsync_write_parquet(tomb, str(path))

    summary = {"file": name if written else None, "tombstones": written,
               "lake_sig": sig, "applied": False}
    if apply and written:
        summary["pass"] = replay(cfg)
        summary["applied"] = True
    return summary


def expire_before(cfg: JobConfig, cutoff_us: int,
                  max_rows: int = 10_000_000, apply: bool = True) -> dict:
    """Event-time retention (TTL): tombstone every visible key whose
    winning ``ts`` is strictly before ``cutoff_us`` (unix microseconds) —
    the "expire records older than N days" policy every CDC lake owes its
    operators, expressed as a ``delete_where`` predicate so it inherits
    the idempotent change-batch + replay machinery (crash-safe, kernel-
    aware, resurrect-on-later-update).  The tag embeds the cutoff, so
    advancing the retention horizon is a NEW idempotent delete batch."""
    import pyarrow.compute as pc

    def pred(t: pa.Table) -> pa.Array:
        ts_us = pc.cast(t.column("ts"), pa.int64())
        return pc.fill_null(pc.less(ts_us, cutoff_us), False)

    return delete_where(cfg, pred, tag=f"ttl-{cutoff_us}",
                        max_rows=max_rows, apply=apply)


def _slug(tag: str) -> str:
    keep = [c if c.isalnum() or c in "-_" else "-" for c in tag.lower()]
    return "".join(keep)[:40] or "untagged"
