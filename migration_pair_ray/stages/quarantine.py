"""Dead-letter (quarantine) gate for the CDC ingest.

A malformed change row — null merge key, unknown op — cannot be routed or
merged; without a gate it either poisons the whole pass (the reference
aborts the migration on the first bad row, ``Tasks/EndToEnd.cs:51-85``) or
silently corrupts per-key state.  The gate splits every batch in-stream:
good rows continue to the merge, bad rows are written to a side Parquet
sink under ``<quarantine_dir>/pass-<pass_id>/`` with a per-row ``reason``,
so an operator can inspect/replay them after the pass commits.

Crash/retry safety mirrors the lake's idempotent-commit discipline:

* quarantine files are CONTENT-ADDRESSED (``q-<sha256(rows)>.parquet``,
  atomic tmp+rename): a retried Ray task rewrites identical bytes to the
  identical path — no duplicates, no torn files;
* the per-pass subdirectory is wiped by the driver before an uncommitted
  pass runs, so a crashed attempt's files (possibly produced under a
  different block split) can never double-count;
* a committed pass never re-runs (manifest gate), so its quarantine
  directory is stable.

Rules are vectorized Arrow kernels over whole blocks — the gate adds one
fused map stage, no shuffle, no per-row Python.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REASON_COL = "reason"
REASON_NULL_KEY = "null_key"
REASON_BAD_OP = "bad_op"
VALID_OPS = ("I", "U", "D")
# patch events (op 'P': null column = keep) have defined merge semantics
# ONLY under the cell kernel — a row-kernel lake rightly quarantines them
VALID_OPS_CELL = ("I", "U", "D", "P")


def _valid_ops(kernel: str) -> tuple[str, ...]:
    return VALID_OPS_CELL if kernel == "cell" else VALID_OPS


def classify(batch: pa.Table, kernel: str = "row") -> pa.Array:
    """Per-row quarantine reason (null = row is good).  First match wins:
    ``null_key`` (conv_id or turn_idx null — unroutable/unmergeable), then
    ``bad_op`` (op outside the lake kernel's defined set — {I,U,D} for
    row, +P for cell — or null: no defined merge semantics)."""
    null_key = pc.or_(pc.is_null(batch.column("conv_id")),
                      pc.is_null(batch.column("turn_idx")))
    bad_op = pc.invert(pc.fill_null(
        pc.is_in(batch.column("op"),
                 value_set=pa.array(_valid_ops(kernel))), False))
    reason = pc.if_else(
        null_key, pa.scalar(REASON_NULL_KEY, pa.string()),
        pc.if_else(bad_op, pa.scalar(REASON_BAD_OP, pa.string()),
                   pa.scalar(None, pa.string())))
    return reason


def quarantine_split(batch: pa.Table,
                     kernel: str = "row") -> tuple[pa.Table, pa.Table]:
    """(good rows, bad rows + reason column) — both zero-copy filters."""
    reason = classify(batch, kernel)
    good = batch.filter(pc.is_null(reason))
    bad_mask = pc.is_valid(reason)
    bad = batch.filter(bad_mask).append_column(
        REASON_COL, reason.filter(bad_mask) if isinstance(reason, pa.ChunkedArray)
        else pc.filter(reason, bad_mask))
    return good, bad


def make_quarantine_gate(pass_dir: str, kernel: str = "row"):
    """Batch fn for ``map_batches``: passes good rows through, writes bad
    rows to a content-addressed Parquet file under ``pass_dir``."""
    def gate(batch: pa.Table) -> pa.Table:
        good, bad = quarantine_split(batch, kernel)
        if bad.num_rows:
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, bad.schema) as w:
                w.write_table(bad)
            digest = hashlib.sha256(sink.getvalue()).hexdigest()[:24]
            final = Path(pass_dir) / f"q-{digest}.parquet"
            if not final.exists():
                tmp = Path(pass_dir) / f".q-{digest}.{os.getpid()}.tmp"
                pq.write_table(bad, str(tmp))
                os.replace(tmp, final)  # atomic: readers never see torn files
        return good
    return gate


def quarantined_total(pass_dir: str) -> int:
    """Row count across a pass's quarantine files — footers only.

    Distinct-content count: content-addressing collapses byte-identical
    bad blocks (e.g. an at-least-once log repeating a batch across two
    change files) into one file, so this can undercount the raw rows
    DIVERTED from the merge stream.  That is the useful semantic — the
    duplicate copies are the same events, exactly as replay dedups exact
    repeats on the good path — but it means
    ``events_in != rows_merged + quarantined`` under replayed duplicates
    on either path."""
    return sum(pq.ParquetFile(str(p)).metadata.num_rows
               for p in sorted(Path(pass_dir).glob("q-*.parquet")))


def requeue(quarantine_dir: str, changelog_dir: str,
            fix=None, reasons: list[str] | None = None,
            epoch: int = 90000, kernel: str = "row") -> dict:
    """Operational closure of the dead-letter loop: read quarantined rows,
    apply an operator-supplied ``fix`` (batch → batch, e.g. backfill the
    op code), RE-GATE them (rows still malformed stay quarantined — a bad
    fix cannot smuggle bad rows past the gate), and write the now-good
    rows back into the change log as a normal ``batch-<epoch>-…`` file
    for the next replay pass to consume.

    Idempotence is enforced HERE, not just leaned on downstream: an
    identical re-run finds its byte-identical output already present and
    no-ops; a re-run whose quarantine content EVOLVED under the same
    ``epoch`` refuses with FileExistsError (the change log is append-only
    — an existing batch, possibly committed, is never overwritten) and
    the operator passes a fresh ``epoch``.  A duplicated requeue is also
    state-harmless: replay dedups exact (conv, turn, lsn) repeats and LWW
    is insensitive to replays.

    The quarantine set is bounded by definition (it is the anomaly set),
    so this runs on the driver; ``reasons`` restricts which classes are
    retried.  Returns {"requeued": n, "still_bad": n}.
    """
    files = sorted(Path(quarantine_dir).glob("pass-*/q-*.parquet"))
    tabs = [pq.read_table(str(f)) for f in files]
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return {"requeued": 0, "still_bad": 0}
    allq = pa.concat_tables(tabs, promote_options="permissive")
    if reasons is not None:
        allq = allq.filter(pc.is_in(allq.column(REASON_COL),
                                    value_set=pa.array(list(reasons))))
    allq = allq.drop_columns([REASON_COL])
    if fix is not None:
        allq = fix(allq)
    good, still_bad = quarantine_split(allq, kernel)
    if good.num_rows == 0:
        return {"requeued": 0, "still_bad": still_bad.num_rows}
    good = good.sort_by([("lsn", "ascending")])
    lo = int(good.column("lsn")[0].as_py() or 0)
    hi = int(good.column("lsn")[-1].as_py() or 0)
    path = Path(changelog_dir) / \
        f"batch-{epoch:05d}-{lo:012d}-{hi:012d}.parquet"
    if path.exists():
        # the change log is APPEND-ONLY: never overwrite an existing
        # batch (it may be committed; and even identical-name content
        # evolution must be an explicit new epoch, not a clobber)
        import io
        sink = io.BytesIO()
        pq.write_table(good, sink)
        if sink.getbuffer().nbytes == path.stat().st_size:
            # identical re-run: the file is already there — no-op
            return {"requeued": good.num_rows,
                    "still_bad": still_bad.num_rows, "existing": True}
        raise FileExistsError(
            f"requeue output {path.name} already exists with different "
            f"content ({path.stat().st_size} B on disk) — the quarantine "
            f"set evolved since that file was written; pass a fresh "
            f"epoch= instead of overwriting an append-only change file")
    # fsync'd rename: the change log is the engine's source of truth
    from migration_pair_ray.stages.applier import _fsync_write_parquet
    _fsync_write_parquet(good, str(path))
    return {"requeued": good.num_rows, "still_bad": still_bad.num_rows}


def quarantine_counts(quarantine_dir: str) -> pa.Table:
    """Per-reason row counts across ALL passes' quarantine files.  Reads
    only the ``reason`` column (column-pruned), distributed."""
    import ray.data
    paths = sorted(str(p) for p in Path(quarantine_dir).glob("pass-*/q-*.parquet"))
    if not paths:
        return pa.table({REASON_COL: pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    ds = ray.data.read_parquet(paths, columns=[REASON_COL],
                               file_extensions=None)

    def partial(t: pa.Table) -> pa.Table:
        return (t.group_by(REASON_COL).aggregate([(REASON_COL, "count")])
                .rename_columns([REASON_COL, "n"]))

    from ray.data.aggregate import Sum
    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(REASON_COL).aggregate(Sum("n", alias_name="n"))
           .sort(REASON_COL))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
