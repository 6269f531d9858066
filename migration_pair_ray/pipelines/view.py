"""Maintained materialized views: derived lakes pumped from a source
lake's changefeed, exactly-once.

A view is just another lake whose change log is DERIVED: for every
committed source pass, the source's change events are rewritten by a
``transform`` into view change events, written as a view change batch, and
applied by the normal ``replay`` — so a view inherits the whole engine
(manifests, crash-resume, snapshots, indexes, feeds, replicas), and views
CHAIN: a view's own feed can drive another view.

The delta-rewrite rule that makes stateless transforms semantically
complete: a transform maps EVERY source event to exactly one view event
with the SAME (ts, lsn) —

  * keep + reshape:   project/rename/derive columns, re-key if needed;
  * predicate false:  emit a TOMBSTONE (op='D') for the view key;
  * source delete:    pass the tombstone through.

Because the view applies events under the same (ts, lsn) LWW order as the
source, the view's winner for a key is exactly transform(source winner) —
an update that leaves the predicate REMOVES the key from the view without
the transform ever seeing prior state.  (``functions/lww.py`` ordering;
the same algebra the oracle replays in SQL.)

Exactly-once, end to end:

  per committed source pass (seq order):
    1. one view change batch per SOURCE FILE, written atomically and
       SKIPPED if already present — content is deterministic (events
       sorted by (lsn, conv_id, turn_idx) before write), so a crashed
       attempt's file is byte-identical to its retry;
    2. ``replay(view_cfg)`` — idempotent, manifest-gated;
    3. ``ack_feed`` on the source — monotone, after the view committed.

  A crash anywhere re-runs from the cursor and converges; re-running
  after success is a no-op.  ``transform`` MUST be deterministic.

Scale: transform runs one Ray task per source change file (the log's
natural micro-batch bound — nothing driver-side, nothing proportional to
lake size); the view replay is the normal distributed apply.

Reference analog: none (the reference copies one table); this is the
derived-table half of a CDC platform (Kafka-Streams/Materialize-style
view maintenance re-expressed over lake passes).
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa

import ray

from migration_pair_ray.config import JobConfig

REQUIRED_COLS = ("conv_id", "turn_idx", "ts", "op", "lsn")


class ViewTransformError(RuntimeError):
    pass


@ray.remote(num_cpus=1)
def _transform_file(src_path: str, out_path: str, schema_json: bytes,
                    transform) -> int:
    """Normalize one source change file, rewrite it through ``transform``,
    write the view change batch atomically.  Skips (idempotent) when the
    output already exists — it is deterministic, a retry would write the
    same bytes."""
    import os

    import pyarrow.parquet as pq

    from migration_pair_ray.functions.normalize import make_normalizer
    from migration_pair_ray.stages.applier import _fsync_write_parquet
    if os.path.exists(out_path):
        return pq.ParquetFile(out_path).metadata.num_rows
    schema = pa.ipc.read_schema(pa.BufferReader(schema_json))
    t = make_normalizer(schema)(pq.read_table(src_path))
    out = transform(t)
    missing = [c for c in REQUIRED_COLS if c not in out.column_names]
    if missing:
        raise ViewTransformError(
            f"view transform output lacks required change-event columns "
            f"{missing}: every view event needs a key, event time, op and "
            f"lsn (got {out.column_names})")
    if out.num_rows != t.num_rows:
        raise ViewTransformError(
            f"view transform must map EVERY source event to exactly one "
            f"view event (predicate-false rows become op='D' tombstones "
            f"with the same ts/lsn) — got {out.num_rows} rows from "
            f"{t.num_rows}; dropping events breaks LWW completeness")
    out = out.sort_by([("lsn", "ascending"), ("conv_id", "ascending"),
                       ("turn_idx", "ascending")])
    # fsync'd atomic rename: the view's change log is its source of truth
    _fsync_write_parquet(out, out_path)
    return out.num_rows


def maintain_view(src_cfg: JobConfig, view_cfg: JobConfig, transform,
                  consumer: str | None = None,
                  missing_ok: bool = False) -> dict:
    """Pump every unacked committed source pass through ``transform`` into
    the view lake.  Returns {"passes_applied", "events", "through_seq"}.

    ``consumer`` defaults to ``view:<view lake dirname>`` and is
    registered on the source, so log retention (``truncate_log``)
    protects the view's unconsumed passes like any other follower."""
    from migration_pair_ray.pipelines.feed import (FeedRetentionError,
                                                   ack_feed,
                                                   consumer_cursor,
                                                   pending_passes,
                                                   register_consumer)
    from migration_pair_ray.pipelines.replay import replay
    from migration_pair_ray.sources.changelog import unified_schema
    consumer = consumer or f"view:{Path(view_cfg.lake_dir).name}"
    register_consumer(src_cfg, consumer)
    Path(view_cfg.changelog_dir).mkdir(parents=True, exist_ok=True)
    tref = ray.put(transform)
    applied = events = 0
    for rec in pending_passes(src_cfg, consumer):
        seq = rec["seq"]
        if rec.get("rollback"):
            # a rollback pass has no events; the VIEW must roll back too,
            # which only its operator can decide (it has its own history)
            if missing_ok:
                ack_feed(src_cfg, consumer, seq)
                continue
            raise FeedRetentionError(
                f"source pass seq {seq} is a rollback — roll the view "
                f"back explicitly (rollback_to on the view lake), then "
                f"ack past it (missing_ok=True acks it as a no-op)")
        paths = []
        for name, bulk in rec["files"]:
            if bulk:
                if missing_ok:
                    continue
                raise FeedRetentionError(
                    f"source pass {rec['pass_id']} (seq {seq}) was a bulk "
                    f"load ({name}): its input is not in the changelog — "
                    f"bulk-load the view directly, then missing_ok=True")
            p = Path(src_cfg.changelog_dir) / name
            if not p.exists():
                if missing_ok:
                    continue
                raise FeedRetentionError(
                    f"pass {rec['pass_id']} (seq {seq}) references {name}, "
                    f"gone from {src_cfg.changelog_dir} — view consumer "
                    f"{consumer!r} fell behind log retention")
            paths.append(str(p))
        if paths:
            schema = unified_schema(paths)
            sj = schema.serialize().to_pybytes()
            futs = []
            for sp in paths:
                out = (Path(view_cfg.changelog_dir) /
                       f"batch-v{seq:08d}-{Path(sp).stem.replace('batch-', '')}.parquet")
                futs.append(_transform_file.remote(sp, str(out), sj, tref))
            events += sum(ray.get(futs))
            replay(view_cfg)
        ack_feed(src_cfg, consumer, seq)
        applied += 1
    return {"passes_applied": applied, "events": events,
            "through_seq": consumer_cursor(src_cfg, consumer),
            "consumer": consumer}


def make_filter_project(where=None, rename: dict[str, str] | None = None,
                        derive=None):
    """A transform factory covering the common view shapes:

    * ``where``: ``pa.Table -> pa.BooleanArray`` visibility predicate —
      rows where it's False (or the source op is 'D') become tombstones;
    * ``rename``: view column renames (keys/meta columns keep their
      names — the view stays a normal lake);
    * ``derive``: ``pa.Table -> dict[str, pa.Array]`` computed columns.

    The emitted table keeps every (ts, lsn, key) verbatim — the
    delta-rewrite contract."""
    import numpy as np
    import pyarrow.compute as pc

    def transform(t: pa.Table) -> pa.Table:
        if derive is not None:
            for name, arr in derive(t).items():
                t = (t.set_column(t.column_names.index(name), name, arr)
                     if name in t.column_names else t.append_column(name, arr))
        keep = (pc.fill_null(where(t), False).to_numpy(zero_copy_only=False)
                if where is not None else np.ones(t.num_rows, bool))
        is_del = pc.equal(pc.fill_null(t.column("op"), ""), "D").to_numpy(
            zero_copy_only=False)
        op = np.where(keep & ~is_del,
                      t.column("op").to_numpy(zero_copy_only=False), "D")
        t = t.set_column(t.column_names.index("op"), "op",
                         pa.array(op.tolist(), pa.string()))
        if rename:
            t = t.rename_columns([rename.get(c, c) for c in t.column_names])
        return t
    return transform
