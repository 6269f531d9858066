"""The upsert-apply stage: an actor-pool ``map_groups`` over partition ids.

This is the Ray-Data-native replacement for the reference's batched async
Cassandra writer (``Tasks/MigrationTask.cs:118-134`` + the implicit upsert
semantics of ``:101-104``).  The session-held-once-per-worker pattern
(``Tasks/MigrationTask.cs:29-60`` static session singleton) becomes actor
state: the ``Applier`` class is instantiated once per pool actor
(``__init__``), and each ``__call__`` merges ONE partition's pre-reduced
change events with that partition's existing lake file.

Exactly-once under Ray retries: all effects are gated on the atomic
manifest commit; the state file name is derived from the deterministic
``pass_id``, so a retried task rewrites the identical bytes and the commit
stays idempotent (see state/manifest.py).
"""

from __future__ import annotations

import hashlib
import os
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from migration_pair_ray.functions.lww import merge_tables_chunked
from migration_pair_ray.schemas import MERGE_KEYS
from migration_pair_ray.stages.partition import PART_COL
from migration_pair_ray.state.manifest import ManifestStore

LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("partition", pa.int32()),
        pa.field("pass_id", pa.string()),
        pa.field("rows_in", pa.int64()),        # change rows entering the merge
        pa.field("rows_state", pa.int64()),     # rows in the committed state file
        pa.field("tombstones", pa.int64()),     # tombstone keys held in state
        pa.field("lsn_lo", pa.int64()),         # source offset range applied
        pa.field("lsn_hi", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("seconds", pa.float64()),
        pa.field("skipped", pa.bool_()),        # already committed (idempotent replay)
    ]
)


def _fsync_write_parquet(table: pa.Table, path: str) -> int:
    from migration_pair_ray.state.manifest import _fsync_dir
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    with open(tmp, "rb+") as f:
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(path)   # make the rename durable before the manifest commit
    return os.path.getsize(path)


class Applier:
    """Callable class for ``groupby(PART_COL).map_groups(Applier, ...)``.

    One call = one partition's change group for one pass.  Constructor args
    are plain picklable values (Ray ships them to each pool actor once).
    """

    def __init__(self, lake_dir: str, manifest_dir: str, pass_id: str,
                 hash_state: bool = True, merge_chunk_rows: int = 4_000_000):
        self.lake_dir = lake_dir
        self.pass_id = pass_id
        self.hash_state = hash_state
        self.merge_chunk_rows = merge_chunk_rows
        self.manifests = ManifestStore(manifest_dir)  # once per actor

    def _state_file(self, pid: int) -> str:
        d = Path(self.lake_dir) / f"part={pid:05d}"
        d.mkdir(parents=True, exist_ok=True)
        return str(d / f"state-{self.pass_id}.parquet")

    def _lineage(self, pid: int, **kw) -> pa.Table:
        row = {
            "partition": pid, "pass_id": self.pass_id, "rows_in": 0,
            "rows_state": 0, "tombstones": 0, "lsn_lo": 0, "lsn_hi": 0,
            "bytes": 0, "seconds": 0.0, "skipped": False,
        }
        row.update(kw)
        return pa.Table.from_pylist([row], schema=LINEAGE_SCHEMA)

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        if group.num_rows == 0:
            return pa.Table.from_pylist([], schema=LINEAGE_SCHEMA)
        pid = int(group.column(PART_COL)[0].as_py())
        changes = group.drop_columns([PART_COL])

        prev = self.manifests.read(pid)
        if prev and self.pass_id in prev.get("history", []):
            # replayed pass: state already reflects these events — skip.
            return self._lineage(pid, rows_in=group.num_rows, skipped=True,
                                 rows_state=prev.get("row_count", 0),
                                 seconds=time.perf_counter() - t0)

        existing = None
        if prev:
            existing = pq.read_table(str(Path(self.lake_dir) / prev["data_file"]))

        # merge sorts by (conv_id, turn_idx, ts, lsn) and keeps one row per
        # key — its output is therefore already in the deterministic
        # (conv_id, turn_idx) file order; no second sort needed.  The
        # chunked variant bounds the transient sort/concat working set when
        # a skewed partition outgrows merge_chunk_rows.
        merged = merge_tables_chunked(existing, changes, self.merge_chunk_rows)

        lsn_lo = int(pc.min(changes.column("lsn")).as_py())
        lsn_hi = int(pc.max(changes.column("lsn")).as_py())
        tombstones = int(pc.sum(
            pc.cast(pc.equal(merged.column("op"), "D"), pa.int64())
        ).as_py() or 0)

        path = self._state_file(pid)
        nbytes = _fsync_write_parquet(merged, path)
        content_hash = ""
        if self.hash_state:
            h = hashlib.sha256()
            with open(path, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            content_hash = h.hexdigest()

        self.manifests.commit(pid, {
            "partition": pid,
            "pass_id": self.pass_id,
            "data_file": str(Path(path).relative_to(self.lake_dir)),
            "row_count": merged.num_rows,
            "tombstones": tombstones,
            "lsn_lo": lsn_lo,
            "lsn_hi": lsn_hi,
            "content_hash": content_hash,
        })
        # GC superseded state files (best-effort; current file is manifest-pinned)
        for old in Path(path).parent.glob("state-*.parquet"):
            if str(old) != path:
                try:
                    old.unlink()
                except OSError:
                    pass

        return self._lineage(
            pid, rows_in=group.num_rows, rows_state=merged.num_rows,
            tombstones=tombstones, lsn_lo=lsn_lo, lsn_hi=lsn_hi,
            bytes=nbytes, seconds=time.perf_counter() - t0,
        )
