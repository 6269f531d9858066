"""Incremental partition split — COMPACTION.md made code.

``split_partition`` rewrites ONE base partition's state into ``fanout``
children and atomically publishes the new routing via the ``_lake_meta``
splits map.  The other P-1 partitions are untouched: their state files,
manifests and key placement are byte-stable across the split.  At 100 TB
this is the difference between a multi-day whole-lake re-layout
(``repartition_lake``) and a minutes-long maintenance action on one hot
partition.

Crash protocol (all effects idempotent, meta rewrite is the commit point):

1. children state files + manifests are written first (fresh child ids —
   a re-split advances the generation so live ids are never reused);
2. ``LakeMeta.record_split`` atomically repoints routing and enumeration
   (readers use ``active_partition_ids``; writers pass ``meta.splits()``
   into the partition stage), making the children visible and the parent
   invisible in one rename;
3. the superseded parent manifest/state files are GC'd best-effort.

A crash before (2) leaves the lake exactly as before the split; re-running
the job completes it (deterministic split pass id ⇒ identical bytes,
idempotent manifest commits).

Reference analog: none — Cassandra owned placement for the reference
(``Tasks/MigrationTask.cs:101-104``); an engine that owns its own lake
needs the lifecycle explicitly.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from migration_pair_ray.config import JobConfig
from migration_pair_ray.state.manifest import (
    LakeLayoutError,
    LakeMeta,
    ManifestStore,
)


def split_partition(cfg: JobConfig, base_pid: int, fanout: int = 2) -> dict:
    """Split base partition ``base_pid`` into ``fanout`` children.

    Works whether the partition holds state or not (an empty split just
    records routing), and supports RE-splitting (widening fanout): the
    previous children's state is read back, re-routed under the new
    fanout, and written as a fresh child generation.  Idempotent: a
    re-run after success (same fanout) is a no-op.
    """
    meta = LakeMeta(cfg.lake_dir)
    cur = meta.read()
    if cur is None:
        raise LakeLayoutError(
            f"no lake at {cfg.lake_dir} — nothing to split")
    p = int(cur["num_partitions"])
    mode = cur["partition_mode"]
    if not (0 <= base_pid < p):
        raise ValueError(f"base_pid {base_pid} outside [0, {p})")
    if fanout < 2:
        raise ValueError("fanout must be >= 2")
    splits = meta.splits()
    prev = splits.get(base_pid)
    if prev and prev[0] == fanout:
        return {"base_pid": base_pid, "fanout": fanout, "gen": prev[1],
                "children": [], "rows": 0, "already_split": True}

    store = ManifestStore(cfg.manifest_dir)
    if prev:
        prev_fanout, prev_gen = prev
        src_pids = [LakeMeta.child_id(p, base_pid, c, prev_gen)
                    for c in range(prev_fanout)]
        new_gen = prev_gen + prev_fanout       # fresh id block, never reused
    else:
        src_pids = [base_pid]
        new_gen = 0

    from migration_pair_ray.stages.applier import read_state_table
    tables, src_sig = [], []
    for pid in src_pids:
        m = store.read(pid)
        if m:
            t = read_state_table(cfg.lake_dir, m)
            if t is not None:
                tables.append(t)
            src_sig.append(f"{pid}:{m['pass_id']}:{m['row_count']}")
    # deterministic split identity from the source state being rewritten
    pass_id = hashlib.sha256(
        f"split:{base_pid}:{fanout}:{new_gen}:{';'.join(src_sig)}".encode()
    ).hexdigest()[:16]

    new_splits = dict(splits)
    new_splits[base_pid] = (fanout, new_gen)
    child_ids = [LakeMeta.child_id(p, base_pid, c, new_gen)
                 for c in range(fanout)]
    rows_total = 0

    if tables:
        from migration_pair_ray.functions.lww import _SORT_KEYS
        from migration_pair_ray.stages.applier import _fsync_write_parquet
        from migration_pair_ray.stages.partition import partition_ids

        state = (tables[0] if len(tables) == 1
                 else pa.concat_tables(tables, promote_options="permissive"))
        rows_total = state.num_rows
        route = partition_ids(state, p, mode, new_splits)
        # every source row must route to this base's new children — the
        # base component of the hash is unchanged by construction
        if not np.isin(route, np.asarray(child_ids)).all():
            raise AssertionError(
                "split routing produced ids outside the new child set — "
                "the lake's partition_mode/num_partitions do not match the "
                "state being split")
        for c, cid in enumerate(child_ids):
            sub = state.filter(pa.array(route == cid))
            # child state comes from key-disjoint (but interleaved) source
            # files — restore the deterministic (conv_id, turn_idx) order
            sub = sub.sort_by(_SORT_KEYS)
            if store.is_applied(cid, pass_id):
                continue               # crash-resume: child already committed
            d = Path(cfg.lake_dir) / f"part={cid:05d}"
            d.mkdir(parents=True, exist_ok=True)
            path = str(d / f"state-{pass_id}.parquet")
            nbytes = _fsync_write_parquet(sub, path)
            lsn = sub.column("lsn") if sub.num_rows else None
            store.commit(cid, {
                "partition": cid,
                "pass_id": pass_id,
                "data_file": str(Path(path).relative_to(cfg.lake_dir)),
                "row_count": sub.num_rows,
                "tombstones": int(pc.sum(pc.cast(
                    pc.equal(sub.column("op"), "D"), pa.int64())).as_py() or 0)
                    if sub.num_rows else 0,
                "lsn_lo": int(pc.min(lsn).as_py()) if lsn is not None else 0,
                "lsn_hi": int(pc.max(lsn).as_py()) if lsn is not None else 0,
                "content_hash": "",
                "split_of": base_pid,
            })

    # THE commit point: routing + enumeration flip to the children here
    meta.record_split(base_pid, fanout, new_gen)

    # GC the superseded source manifests/state (best-effort; readers no
    # longer enumerate these ids)
    from migration_pair_ray.stages.applier import state_file_paths
    for pid in src_pids:
        for f in state_file_paths(cfg.lake_dir, store.read(pid)):
            try:
                Path(f).unlink()
            except OSError:
                pass
        store.delete(pid)

    return {"base_pid": base_pid, "fanout": fanout, "gen": new_gen,
            "children": child_ids, "rows": rows_total, "pass_id": pass_id,
            "already_split": False}


def maybe_split_oversized(cfg: JobConfig, max_rows: int,
                          fanout: int = 2) -> list[dict]:
    """Size guard as a maintenance action: split every active partition
    whose committed ``row_count`` exceeds ``max_rows``.  Children of a
    previous split are eligible too (their BASE is re-split at a widened
    fanout).  Returns the split summaries."""
    meta = LakeMeta(cfg.lake_dir)
    cur = meta.read()
    if cur is None:
        return []
    p = int(cur["num_partitions"])
    store = ManifestStore(cfg.manifest_dir)
    # collect first, split after: a split mutates the active-id set, and
    # two oversized children of one base must widen that base ONCE
    oversized: list[int] = []
    for pid in meta.active_partition_ids():
        m = store.read(pid)
        if m and int(m["row_count"]) > max_rows:
            oversized.append(pid % p)
    out = []
    for base in dict.fromkeys(oversized):
        prev = meta.splits().get(base)
        new_fanout = (prev[0] * 2) if prev else fanout
        out.append(split_partition(cfg, base, new_fanout))
    return out
