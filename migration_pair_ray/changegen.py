"""Deterministic synthetic change-log generator (seeded, scalable).

The sandbox stand-in for a 10^10-event binlog tail (FIXTURES.md F2/F3).
Produces a directory of Parquet change-batch files that exhibit every
behavior the engine must handle:

* inserts / updates / deletes (tombstones) keyed by ``(conv_id, turn_idx)``,
* out-of-order arrival across files (correctness comes from LWW ``(ts, lsn)``,
  not arrival order — mirroring the Cassandra-timestamp semantics the
  reference leans on, ``Tasks/MigrationTask.cs:101-104``),
* replayed duplicate events (at-least-once log),
* ``ts`` ties broken by ``lsn``,
* schema evolution: files from epochs before ``tool_epoch`` lack the
  ``tool`` column entirely,
* a hot conversation holding a configurable fraction of all events
  (skew / salting test).

Fully vectorized (numpy); ~10^7 events generate in seconds.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ROLES = np.array(["user", "assistant", "system", "tool"])
_BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in microseconds


def generate_change_log(
    out_dir: str,
    n_events: int = 1_000,
    n_convs: int = 20,
    turns_per_conv: int = 50,
    n_files: int = 4,
    tool_epoch: int = 2,
    hot_frac: float = 0.2,
    delete_frac: float = 0.05,
    update_frac: float = 0.35,
    dup_frac: float = 0.05,
    shuffle_window: int = 0,
    seed: int = 42,
) -> list[str]:
    """Write ``n_files`` Parquet change-batch files under ``out_dir``;
    returns the file paths in epoch order.

    ``shuffle_window``: if > 0, events are shuffled within windows of that
    many rows before being split into files, so arrival order across file
    boundaries is out of order w.r.t. ``(ts, lsn)``.
    """
    rng = np.random.default_rng(seed)
    n = int(n_events)

    lsn = np.arange(n, dtype=np.int64)

    # conversation assignment: one hot conv (index 0) gets ``hot_frac``.
    conv = rng.integers(1, max(2, n_convs), size=n, dtype=np.int64)
    hot_mask = rng.random(n) < hot_frac
    conv[hot_mask] = 0
    turn = rng.integers(0, turns_per_conv, size=n, dtype=np.int32)
    # the hot conversation gets a larger turn space so it holds many keys
    hot_turns = max(turns_per_conv * 4, 1)
    turn[hot_mask] = rng.integers(0, hot_turns, size=int(hot_mask.sum()), dtype=np.int32)

    # event time: mostly increasing with jitter; quantized so ties occur.
    ts_us = _BASE_TS_US + lsn * 1_000_000 + rng.integers(-5, 5, size=n) * 1_000_000
    ts_us = (ts_us // 2_000_000) * 2_000_000  # 2s quantization → (ts) ties

    r = rng.random(n)
    op = np.where(r < delete_frac, "D", np.where(r < delete_frac + update_frac, "U", "I"))

    role = _ROLES[turn % 4]
    conv_id = np.char.add("conv-", conv.astype("U12"))
    text = np.char.add(
        np.char.add(np.char.add("turn text c", conv.astype("U12")), "/t"),
        np.char.add(np.char.add(turn.astype("U12"), "#"), lsn.astype("U20")),
    )
    tool = np.where(role == "tool", np.char.add("tool-", (turn % 7).astype("U4")), None)

    table = pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool.tolist(), pa.string()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "op": pa.array(op, pa.string()),
            "lsn": pa.array(lsn, pa.int64()),
        }
    )

    # arrival order: shuffle within windows (out-of-order across batches)
    order = np.arange(n)
    if shuffle_window and shuffle_window > 1:
        for lo in range(0, n, shuffle_window):
            hi = min(lo + shuffle_window, n)
            seg = order[lo:hi].copy()
            rng.shuffle(seg)
            order[lo:hi] = seg
    table = table.take(pa.array(order))

    # replayed duplicates: re-append a sample of earlier events at the end
    # of later files (at-least-once delivery). A redelivered event is the
    # SAME wire message — a dup of a pre-evolution event keeps tool=null
    # even when it lands in a post-evolution file.
    per = (n + n_files - 1) // n_files
    n_dup = int(n * dup_frac)
    if n_dup:
        dup_idx = rng.integers(0, n, size=n_dup)
        dup = table.take(pa.array(dup_idx))
        pre_evo = pa.array(dup_idx // per < tool_epoch)
        import pyarrow.compute as _pc
        masked_tool = _pc.if_else(pre_evo, pa.scalar(None, pa.string()),
                                  dup.column("tool").combine_chunks())
        dup = dup.set_column(dup.schema.get_field_index("tool"), "tool", masked_tool)
    else:
        dup = table.slice(0, 0)

    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    # duplicates are appended only to files at/after tool_epoch: a dup of a
    # post-evolution event must never land in a file whose schema drops
    # `tool`, or the same (ts, lsn) would exist with two different payloads
    # and the LWW winner's payload would be undefined.
    dup_start = max(n_files // 2, min(tool_epoch, n_files - 1))
    dup_files = max(1, n_files - dup_start)
    dup_per = (n_dup + dup_files - 1) // dup_files if n_dup else 0
    for epoch in range(n_files):
        part = table.slice(epoch * per, per)
        if n_dup and epoch >= dup_start:
            d0 = (epoch - dup_start) * dup_per
            part = pa.concat_tables([part, dup.slice(d0, dup_per)])
        if part.num_rows == 0:
            continue
        if epoch < tool_epoch:
            part = part.drop_columns(["tool"])  # schema evolution: early files lack `tool`
        lsns = part.column("lsn")
        lo = int(pa.compute.min(lsns).as_py())
        hi = int(pa.compute.max(lsns).as_py())
        path = str(Path(out_dir) / f"batch-{epoch:05d}-{lo:012d}-{hi:012d}.parquet")
        pq.write_table(part, path)
        paths.append(path)
    return paths
