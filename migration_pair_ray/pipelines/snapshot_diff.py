"""Snapshot-diff CDC bootstrap: synthesize a change batch from two FULL
snapshots of the same LWW table.

The classic migration gap: the source can hand you periodic full dumps but
no changelog (the reference could only ever full-copy,
``Tasks/MigrationTask.cs:84-92``).  ``snapshot_diff(old, new)`` closes it —
the diff of two snapshots IS a change batch (``I`` keys only in *new*,
``U`` keys whose payload differs, ``D`` keys only in *old*), and
``write_diff_batches`` lands it in the change log where every engine
guarantee (idempotent replay, resume, lineage, time travel, fsck) applies
unchanged.  ``bulk_load(old) + replay(diff) == new`` is the bootstrap
contract, tested bit-for-bit in tests/test_snapshot_diff.py.

Scale design: no join, no driver materialization.  Both snapshots are
tagged with a side column, unioned, and coarse-hash-bucketed on ``conv_id``
(~2×CPU Ray groups — the same grain as sessionize/state_diff); each bucket
classifies ALL its keys with ONE Arrow sort + boundary/pair masks and
null-safe payload compares (SQL ``IS DISTINCT FROM`` semantics).  The
exchange carries each snapshot row exactly once; the output is only the
changed keys.

Dominance contract (same scheme as pipelines/deletes.py): both snapshots
must come from the same LWW lineage, so for any changed key
``new.(ts) >= old.(ts)`` (the winner over a superset log can't go
backwards).  Diff rows keep the NEW payload ts (``D`` rows copy the old
winner's ts) and carry ``lsn = lsn_base + bucket*stride + rank`` with
``lsn_base`` above the target lake's max lsn — ts ties resolve to the diff
row by lsn, and the replayed state lands exactly on *new*.  The lsn scheme
is deterministic and unique without any cross-bucket coordination (gaps in
lsn space are normal log behavior); a bucket outgrowing ``stride`` raises
rather than colliding.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from migration_pair_ray.schemas import MERGE_KEYS

#: payload columns compared for U-detection / carried on diff rows
PAYLOAD_COLS = ["role", "text", "tool", "ts"]
_COLS = MERGE_KEYS + PAYLOAD_COLS
_DEFAULT_STRIDE = 1 << 22        # 4M diff rows per coarse bucket


class SnapshotNotUnique(ValueError):
    """A snapshot carried more than one row for a merge key — it is not a
    state snapshot (diff semantics would be undefined)."""


def _tagger(side: int, n_coarse: int):
    from migration_pair_ray.stages.windows import _coarse_key_bucket

    def tag(t: pa.Table) -> pa.Table:
        t = t.select(_COLS)
        t = t.append_column("__side", pa.array(
            np.full(t.num_rows, side, np.int8)))
        return t.append_column("__b", pa.array(
            _coarse_key_bucket(t.column("conv_id"), n_coarse)))

    return tag


def _diff_bucket_table(g: pa.Table, lsn_base: int,
                       stride: int) -> pa.Table:
    """All diff rows for one coarse bucket: one sort, boundary/pair masks,
    vectorized null-safe payload compares, deterministic dense lsns."""
    from migration_pair_ray.functions.lww import _group_first_mask
    bucket = int(g.column("__b")[0].as_py()) if g.num_rows else 0
    t = g.drop_columns(["__b"]).sort_by(
        [(k, "ascending") for k in MERGE_KEYS] + [("__side", "ascending")])
    n = t.num_rows
    out_schema = pa.schema(list(t.select(_COLS).schema)
                           + [pa.field("op", pa.string()),
                              pa.field("lsn", pa.int64())])
    if n == 0:
        return out_schema.empty_table()
    first = _group_first_mask(t, MERGE_KEYS).to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(first)
    sizes = np.diff(np.concatenate([starts, [n]]))
    side = t.column("__side").to_numpy(zero_copy_only=False)
    if (sizes > 2).any():
        raise SnapshotNotUnique(
            "a snapshot holds duplicate (conv_id, turn_idx) rows")
    pairs = starts[sizes == 2]
    if pairs.size and not (
            (side[pairs] == 1).all() and (side[pairs + 1] == 2).all()):
        raise SnapshotNotUnique(
            "a snapshot holds duplicate (conv_id, turn_idx) rows")
    single = starts[sizes == 1]
    del_idx = single[side[single] == 1]
    ins_idx = single[side[single] == 2]
    differs = np.zeros(pairs.size, dtype=bool)
    if pairs.size:
        a_idx, b_idx = pa.array(pairs), pa.array(pairs + 1)
        for col in PAYLOAD_COLS:
            av = pc.take(t.column(col), a_idx)
            bv = pc.take(t.column(col), b_idx)
            neq = pc.fill_null(pc.not_equal(av, bv), False)
            null_mismatch = pc.xor(pc.is_null(av), pc.is_null(bv))
            differs |= pc.or_(neq, null_mismatch).to_numpy(
                zero_copy_only=False)
    upd_idx = pairs[differs] + 1            # the NEW-side row of the pair
    idx = np.concatenate([ins_idx, upd_idx, del_idx])
    ops = np.concatenate([np.repeat("I", ins_idx.size),
                          np.repeat("U", upd_idx.size),
                          np.repeat("D", del_idx.size)])
    if idx.size == 0:
        return out_schema.empty_table()
    # back to key order (idx concatenation grouped by op; the sort makes
    # the per-bucket output — and therefore the lsn assignment and the
    # written bytes — deterministic)
    order = np.argsort(idx, kind="stable")
    idx, ops = idx[order], ops[order]
    if idx.size > stride:
        raise ValueError(
            f"bucket {bucket} produced {idx.size} diff rows > stride "
            f"{stride}; raise stride or n_coarse")
    sub = t.take(pa.array(idx)).select(_COLS)
    d_mask = pa.array(ops == "D")
    for col in ("role", "text", "tool"):      # D rows: tombstone payload
        i = sub.schema.get_field_index(col)
        sub = sub.set_column(i, col, pc.if_else(
            d_mask, pa.scalar(None, sub.column(col).type), sub.column(col)))
    lsn = lsn_base + bucket * stride + np.arange(idx.size, dtype=np.int64)
    return (sub.append_column("op", pa.array(ops.tolist(), pa.string()))
            .append_column("lsn", pa.array(lsn)))


def snapshot_diff(old_ds: "rd.Dataset", new_ds: "rd.Dataset",
                  lsn_base: int = 1, stride: int = _DEFAULT_STRIDE,
                  n_coarse: int | None = None) -> "rd.Dataset":
    """Change batch turning snapshot *old* into snapshot *new*: one row per
    added/changed/deleted merge key in CHANGE_SCHEMA form (op + lsn), keys
    untouched by the diff absent.  Streaming: tag → union → one coarse
    groupby; every bucket diffs independently."""
    from migration_pair_ray.stages.windows import _default_coarse
    n_coarse = _default_coarse(n_coarse)
    both = (old_ds.map_batches(_tagger(1, n_coarse), batch_format="pyarrow")
            .union(new_ds.map_batches(_tagger(2, n_coarse),
                                      batch_format="pyarrow")))
    return both.groupby("__b").map_groups(
        lambda g: _diff_bucket_table(g, lsn_base, stride),
        batch_format="pyarrow")


def write_diff_batches(changelog_dir: str, old_ds: "rd.Dataset",
                       new_ds: "rd.Dataset", tag: str, lsn_base: int = 1,
                       stride: int = _DEFAULT_STRIDE,
                       n_coarse: int | None = None) -> dict:
    """Land the diff in a change log, one ``batch-zzdiff-{tag}-{bucket}``
    file per non-empty coarse bucket, each written ATOMICALLY by its own
    bucket task (tmp + fsync + rename — a retried task rewrites identical
    bytes, so a crash leaves either nothing or the exact file).  The driver
    sees per-bucket stats rows only, never the diff itself."""
    from migration_pair_ray.stages.windows import _default_coarse
    n_coarse = _default_coarse(n_coarse)
    Path(changelog_dir).mkdir(parents=True, exist_ok=True)

    def diff_and_write(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__b")[0].as_py()) if g.num_rows else 0
        out = _diff_bucket_table(g, lsn_base, stride)
        if out.num_rows:
            path = Path(changelog_dir) / f"batch-zzdiff-{tag}-{bucket:05d}.parquet"
            tmp = str(path) + ".tmp"
            pq.write_table(out, tmp)
            with open(tmp, "rb") as f:
                os.fsync(f.fileno())
            os.replace(tmp, str(path))
        return pa.table({"bucket": pa.array([bucket], pa.int64()),
                         "rows": pa.array([out.num_rows], pa.int64())})

    both = (old_ds.map_batches(_tagger(1, n_coarse), batch_format="pyarrow")
            .union(new_ds.map_batches(_tagger(2, n_coarse),
                                      batch_format="pyarrow")))
    stats = both.groupby("__b").map_groups(
        diff_and_write, batch_format="pyarrow").take_all()
    return {"tag": tag, "buckets": len(stats),
            "files": sum(1 for s in stats if s["rows"]),
            "rows": int(sum(s["rows"] for s in stats))}
