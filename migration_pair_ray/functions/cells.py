"""Column-level (cell) last-writer-wins merge — patch-op support.

Row-level LWW (``functions/lww.py``) mirrors the reference's whole-row
Cassandra upserts (``Tasks/MigrationTask.cs:101-104``).  Real CDC feeds
(Debezium partial row images, Cassandra per-cell writes) additionally carry
PATCH events — ``op == "P"`` — where a null column means "keep the current
value" rather than "set to null".  This module implements the cell-level
semantics those feeds need, as the same two-phase shape the row kernel
uses: a monotone per-batch partial reduce (safe to run before the
shuffle) plus a per-group finalize.

Semantics, per merge key, with events totally ordered by ``(ts, lsn)``:

* ``d`` = the last ``D`` event (if any); every event at-or-before ``d`` is
  dead (cell tombstone — late older writes cannot resurrect, matching the
  row kernel's tombstone rule).
* the key EXISTS iff any ``I``/``U``/``P`` event orders after ``d``
  (a patch after a delete resurrects a partial row — Cassandra's
  cell-write-after-delete behavior).
* value of column ``c`` = the value carried by the LAST event after ``d``
  that *determines* ``c``: every ``I``/``U`` determines every column
  (null means SET NULL), a ``P`` determines only its non-null columns.
  No determining event ⇒ null.
* visible ``ts`` = max event ``ts`` after ``d`` (last-modified time).

This is a join-semilattice: ``cell_reduce`` keeps, per key, only the rows
that can still win — the last ``D`` plus, among live rows, each column's
current determiner and the max-``(ts, lsn)`` row (existence + ``ts``
witness).  Dropped rows are dominated for every role they could play, and
merging more batches only adds independently-ordered rows, so
``cell_reduce(cell_reduce(a) + cell_reduce(b)) == cell_reduce(a + b)``
(property-tested in tests/test_cells.py).  The exchange therefore carries
at most ``n_value_cols + 2`` rows per key per batch.

All vectorized: one Arrow sort + numpy ``maximum.reduceat`` per column;
no Python row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from migration_pair_ray.functions.lww import _SORT_KEYS, _group_last_mask
from migration_pair_ray.schemas import MERGE_KEYS, ORDER_COLS

PATCH_OP = "P"
_META_COLS = set(MERGE_KEYS) | set(ORDER_COLS) | {"op"}


def value_columns(table: pa.Table) -> list[str]:
    """The payload columns cell semantics apply to (everything that is not
    a merge key, an order column, or the op marker)."""
    return [n for n in table.schema.names if n not in _META_COLS]


def _group_layout(table: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(group_start_indices, per-row group ordinal) for a key-sorted table."""
    n = table.num_rows
    last = np.asarray(_group_last_mask(table, MERGE_KEYS))
    starts = np.concatenate(([0], np.flatnonzero(last[:-1]) + 1))
    gid = np.zeros(n, dtype=np.int64)
    gid[starts[1:]] = 1
    return starts, np.cumsum(gid)


def _winner_idx(mask: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per group, the index of the LAST row where ``mask`` is True (−1 if
    none).  Rows must be in (key, ts, lsn) sort order."""
    idx = np.where(mask, np.arange(mask.shape[0], dtype=np.int64), -1)
    return np.maximum.reduceat(idx, starts) if mask.shape[0] else idx


def cell_reduce(table: pa.Table) -> pa.Table:
    """Monotone partial reduce: keep only rows that can still determine a
    cell, the tombstone watermark, or existence/ts.  Output stays in the
    change-event schema (op/ts/lsn intact) so it re-reduces and merges
    like any change batch."""
    if table.num_rows == 0:
        return table
    # 64-bit offsets before sort/combine_chunks — see lww_reduce
    from migration_pair_ray.functions.normalize import promote_large_strings
    table = promote_large_strings(table)
    table = table.sort_by(_SORT_KEYS, null_placement="at_start")
    starts, gid = _group_layout(table)
    n = table.num_rows
    is_d = np.asarray(pc.fill_null(
        pc.equal(table.column("op"), "D"), False))
    d_last = _winner_idx(is_d, starts)          # per group
    live = np.arange(n, dtype=np.int64) > d_last[gid]

    keep = np.zeros(n, dtype=bool)
    d_kept = d_last[d_last >= 0]
    keep[d_kept] = True                          # tombstone watermark
    # max live row per group: existence + visible-ts witness
    w = _winner_idx(live, starts)
    keep[w[w >= 0]] = True
    is_patch = np.asarray(pc.fill_null(
        pc.equal(table.column("op"), PATCH_OP), False))
    for col in value_columns(table):
        set_mask = live & (~is_patch | ~np.asarray(
            pc.is_null(table.column(col).combine_chunks())))
        w = _winner_idx(set_mask, starts)
        keep[w[w >= 0]] = True
    return table.filter(pa.array(keep))


def cell_finalize(table: pa.Table, drop_dead: bool = True) -> pa.Table:
    """Collapse change events to ONE visible row per key under cell
    semantics.  ``drop_dead``: keys whose every event is at-or-before
    their last tombstone are removed (the visible form)."""
    if table.num_rows == 0:
        return pa.table(
            {k: pa.array([], table.schema.field(k).type)
             for k in MERGE_KEYS + value_columns(table) + ["ts"]})
    table = table.sort_by(_SORT_KEYS, null_placement="at_start")
    starts, gid = _group_layout(table)
    n = table.num_rows
    is_d = np.asarray(pc.fill_null(pc.equal(table.column("op"), "D"), False))
    d_last = _winner_idx(is_d, starts)
    live = np.arange(n, dtype=np.int64) > d_last[gid]
    exists = _winner_idx(live, starts)           # max live row, -1 = dead
    is_patch = np.asarray(pc.fill_null(
        pc.equal(table.column("op"), PATCH_OP), False))

    def take(col: pa.ChunkedArray, idx: np.ndarray) -> pa.Array:
        safe = np.where(idx >= 0, idx, 0)
        out = col.combine_chunks().take(pa.array(safe))
        if (idx < 0).any():
            out = pc.if_else(pa.array(idx >= 0), out,
                             pa.scalar(None, col.type))
        return out

    cols: dict[str, pa.Array] = {
        k: take(table.column(k), starts) for k in MERGE_KEYS}
    for name in value_columns(table):
        col = table.column(name).combine_chunks()
        set_mask = live & (~is_patch | ~np.asarray(pc.is_null(col)))
        cols[name] = take(table.column(name), _winner_idx(set_mask, starts))
    # visible ts = max ts among live rows; table is ts-sorted within the
    # key so the max live row's ts IS the max live ts
    cols["ts"] = take(table.column("ts"), exists)
    out = pa.table(cols)
    if drop_dead:
        out = out.filter(pa.array(exists >= 0))
    return out
