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
    burst_max: int = 1,
    seed: int = 42,
    hot_turns: int | None = None,
) -> list[str]:
    """Write ``n_files`` Parquet change-batch files under ``out_dir``;
    returns the file paths in epoch order.

    ``shuffle_window``: if > 0, events are shuffled within windows of that
    many rows before being split into files, so arrival order across file
    boundaries is out of order w.r.t. ``(ts, lsn)``.

    ``burst_max``: if > 1, each logical turn write arrives as a burst of
    1..burst_max consecutive events for the SAME key (a turn being
    streamed/edited emits several updates at adjacent LSNs) — the realistic
    update-density case the per-batch combiner exists for.
    """
    rng = np.random.default_rng(seed)
    n = int(n_events)

    lsn = np.arange(n, dtype=np.int64)

    # base (per-burst) key assignment: one hot conv (index 0) gets hot_frac.
    m = n if burst_max <= 1 else max(1, int(n / ((1 + burst_max) / 2)))
    conv_b = rng.integers(1, max(2, n_convs), size=m, dtype=np.int64)
    hot_mask_b = rng.random(m) < hot_frac
    conv_b[hot_mask_b] = 0
    turn_b = rng.integers(0, turns_per_conv, size=m, dtype=np.int32)
    # the hot conversation gets a larger turn space so it holds many keys.
    # hot_turns (default 4x the normal space) controls KEY-count skew —
    # distinct keys is what actually skews a partition: event-count skew
    # alone is absorbed by the per-batch LWW combiner before the exchange
    # (measured: a 10%-event whale over 1.6k keys costs ~nothing in mode
    # "conv"; a multi-million-KEY whale is the straggler case that
    # partition_mode="hot"/"key" exists for — bench.py --skew).
    if hot_turns is None:
        hot_turns = max(turns_per_conv * 4, 1)
    hot_turns = max(int(hot_turns), 1)
    turn_b[hot_mask_b] = rng.integers(0, hot_turns, size=int(hot_mask_b.sum()), dtype=np.int32)
    if burst_max <= 1:
        conv, turn = conv_b, turn_b
    else:
        counts = rng.integers(1, burst_max + 1, size=m)
        conv = np.repeat(conv_b, counts)
        turn = np.repeat(turn_b, counts)
        while len(conv) < n:  # pad with fresh singles if bursts fell short
            conv = np.concatenate([conv, conv_b]);  turn = np.concatenate([turn, turn_b])
        conv, turn = conv[:n], turn[:n]

    # event time: mostly increasing with jitter; quantized so ties occur.
    ts_us = _BASE_TS_US + lsn * 1_000_000 + rng.integers(-5, 5, size=n) * 1_000_000
    ts_us = (ts_us // 2_000_000) * 2_000_000  # 2s quantization → (ts) ties

    r = rng.random(n)
    op_codes = np.where(r < delete_frac, 0,
                        np.where(r < delete_frac + update_frac, 1, 2)).astype(np.int8)

    # arrival order: shuffle within windows (out-of-order across batches);
    # applied to the NUMPY key arrays, not a built table — string columns
    # are materialized per FILE below, never for the whole log (a 10^8-row
    # text column overflows Arrow's 2 GiB string-array capacity)
    order = np.arange(n)
    if shuffle_window and shuffle_window > 1:
        for lo in range(0, n, shuffle_window):
            hi = min(lo + shuffle_window, n)
            seg = order[lo:hi].copy()
            rng.shuffle(seg)
            order[lo:hi] = seg
    conv, turn = conv[order], turn[order]
    ts_us, op_codes, lsn = ts_us[order], op_codes[order], lsn[order]

    import pyarrow.compute as _pc

    def build(idx: np.ndarray, tool_null: np.ndarray | None = None) -> pa.Table:
        """Build the Arrow table for a row-index selection — all string
        building via Arrow kernels (np.char is ~20x slower at 10^7)."""
        c, t, ts_, oc, ls = conv[idx], turn[idx], ts_us[idx], op_codes[idx], lsn[idx]
        conv_str = _pc.cast(pa.array(c), pa.string())
        turn_str = _pc.cast(pa.array(t), pa.string())
        lsn_str = _pc.cast(pa.array(ls), pa.string())
        conv_id = _pc.binary_join_element_wise(pa.scalar("conv-"), conv_str, "")
        text = _pc.binary_join_element_wise(
            pa.scalar("turn text c"), conv_str, pa.scalar("/t"), turn_str,
            pa.scalar("#"), lsn_str, "")
        role = pa.DictionaryArray.from_arrays(
            pa.array((t % 4).astype(np.int8)),
            pa.array(_ROLES.tolist())).cast(pa.string())
        tool_val = _pc.binary_join_element_wise(
            pa.scalar("tool-"),
            _pc.cast(pa.array((t % 7).astype(np.int32)), pa.string()), "")
        tool = _pc.if_else(_pc.equal(role, "tool"), tool_val,
                           pa.scalar(None, pa.string()))
        if tool_null is not None:
            tool = _pc.if_else(pa.array(tool_null), pa.scalar(None, pa.string()),
                               tool)
        op = pa.DictionaryArray.from_arrays(
            pa.array(oc, pa.int8()), pa.array(["D", "U", "I"])).cast(pa.string())
        return pa.table({
            "conv_id": conv_id,
            "turn_idx": pa.array(t, pa.int32()),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pa.array(ts_, pa.timestamp("us")),
            "op": op,
            "lsn": pa.array(ls, pa.int64()),
        })

    # replayed duplicates: re-append a sample of earlier events at the end
    # of later files (at-least-once delivery). A redelivered event is the
    # SAME wire message — a dup of a pre-evolution event keeps tool=null
    # even when it lands in a post-evolution file.
    per = (n + n_files - 1) // n_files
    n_dup = int(n * dup_frac)
    dup_idx = rng.integers(0, n, size=n_dup) if n_dup else np.empty(0, np.int64)

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
        sel = np.arange(epoch * per, min((epoch + 1) * per, n))
        part = build(sel)
        if n_dup and epoch >= dup_start:
            d0 = (epoch - dup_start) * dup_per
            d = dup_idx[d0:d0 + dup_per]
            if len(d):
                part = pa.concat_tables([part, build(d, tool_null=(d // per < tool_epoch))])
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
