"""Event-time windowing operators (streaming-shaped, SURVEY.md §2.9).

Ray Data is a (streaming-)batch engine with no watermarks; these operators
implement the standard window shapes over a bounded log, with the ordering
assumption stated per function.  All are Dataset → Dataset and use the
partial-aggregate-then-tiny-merge skeleton so raw events shuffle at most
once (sessions) or never (tumbling/sliding partials).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum


def tumbling_window(ds: "ray.data.Dataset", ts_col: str, value_col: str,
                    every: str = "hour") -> "ray.data.Dataset":
    """Non-overlapping event-time windows (``every``: an Arrow
    floor_temporal unit — "minute", "hour", "day").  Emits one row per
    window: (window, n, value_sum).  Arrival order is irrelevant: windows
    are computed per batch and merged by key."""

    def partial(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t.column(ts_col), unit=every)
        t2 = pa.table({"window": w, "v": t.column(value_col)})
        return (t2.group_by("window").aggregate([("v", "sum"), ("v", "count")])
                .rename_columns(["window", "value_sum", "n"]))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("window")
            .aggregate(Sum("value_sum", alias_name="value_sum"),
                       Sum("n", alias_name="n"))
            .sort("window"))


def sliding_window(ds: "ray.data.Dataset", ts_col: str, value_col: str,
                   length_s: int, step_s: int) -> "ray.data.Dataset":
    """Overlapping windows of ``length_s`` seconds sliding by ``step_s``.
    Each event contributes to ceil(length/step) windows — the explode
    happens vectorized per batch (np.repeat), then the same partial/merge
    skeleton as tumbling.  Window key = window START epoch seconds."""
    k = (length_s + step_s - 1) // step_s

    def explode(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64())
        ts = us.to_numpy(zero_copy_only=False) // 1_000_000
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        last_start = (ts // step_s) * step_s
        starts = last_start[None, :] - np.arange(k)[:, None] * step_s  # (k, n)
        valid = (ts[None, :] < starts + length_s) & (ts[None, :] >= starts)
        return pa.table({
            "window_start": pa.array(starts[valid].astype(np.int64)),
            "v": pa.array(np.broadcast_to(v, (k, len(v)))[valid]),
        })

    def partial(t: pa.Table) -> pa.Table:
        return (t.group_by("window_start").aggregate([("v", "sum"), ("v", "count")])
                .rename_columns(["window_start", "value_sum", "n"]))

    return (ds.map_batches(explode, batch_format="pyarrow")
            .map_batches(partial, batch_format="pyarrow")
            .groupby("window_start")
            .aggregate(Sum("value_sum", alias_name="value_sum"),
                       Sum("n", alias_name="n"))
            .sort("window_start"))


_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _default_coarse(n_coarse: int | None) -> int:
    """Coarse-group count for sessionization: scales with cluster CPUs
    (each Ray group is ONE task holding the whole group in memory, so the
    group count is the lever between per-group dispatch overhead — bad
    above ~10^5 groups — and per-group memory — bad when
    total_rows/n_coarse outgrows a worker heap).  Callers with extreme key
    volumes should raise it explicitly."""
    if n_coarse is not None:
        return n_coarse
    try:
        import ray
        return max(64, int(ray.cluster_resources().get("CPU", 16)) * 2)
    except Exception:
        return 64


def _coarse_key_bucket(col, n_buckets: int) -> np.ndarray:
    """Deterministic coarse bucket of a key column (int or string) — the
    Ray-group grain for sessionization.  ~``n_buckets`` groups regardless
    of key cardinality: grouping by the raw key would dispatch one
    ``map_groups`` call per key (the per-group-dispatch pitfall at 10^9
    users); the fine per-key work happens vectorized inside each bucket."""
    ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(ca.type):
        v = (pc.fill_null(pc.cast(ca, pa.int64()), -1)
             .to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64))
        with np.errstate(over="ignore"):
            h = v * _GOLDEN
    else:
        from migration_pair_ray.stages.partition import hash_strings
        h = hash_strings(ca)
    return (h % np.uint64(n_buckets)).astype(np.int32)


def _session_start_mask(g: pa.Table, key_col: str, ts_col: str, gap_s: int
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ts_us, first_of_key, new_session) for a (key, ts)-sorted table:
    row i starts a session iff it is the first row of its key OR the gap
    to the previous row exceeds ``gap_s``.  Pure boundary masks
    (``functions/lww.py`` kernel) — no per-key dispatch, no pandas."""
    from migration_pair_ray.functions.lww import _group_first_mask
    ts = (pc.cast(pc.cast(g.column(ts_col), pa.timestamp("us")), pa.int64())
          .to_numpy(zero_copy_only=False))
    first_of_key = _group_first_mask(g, [key_col]).to_numpy(zero_copy_only=False)
    gap = np.concatenate([[True], (ts[1:] - ts[:-1]) > gap_s * 1_000_000])
    return ts, first_of_key, (first_of_key | gap)


def session_windows(ds: "ray.data.Dataset", key_col: str, ts_col: str,
                    gap_s: int = 1800,
                    n_coarse: int | None = None) -> "ray.data.Dataset":
    """Session windows: per key, consecutive events closer than ``gap_s``
    belong to one session.  Emits (key, session_idx, start, end, n_events).

    Scale shape: ONE shuffle into ``n_coarse`` hash buckets of the key
    (NOT one Ray group per key — per-group dispatch plus a pandas
    conversion per key is the 10^9-user scale-killer); inside each bucket
    one Arrow sort by (key, ts) and numpy boundary masks find every
    session of every key in the bucket at once.  Ordering is established
    inside the bucket, so arrival order is irrelevant."""
    n_coarse = _default_coarse(n_coarse)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__b", pa.array(_coarse_key_bucket(t.column(key_col), n_coarse)))

    def sessions_bucket(g: pa.Table) -> pa.Table:
        key_type = g.schema.field(key_col).type
        ts_type = g.schema.field(ts_col).type
        out_ts = ts_type if pa.types.is_timestamp(ts_type) else pa.timestamp("us")
        if g.num_rows == 0:
            return pa.table({key_col: pa.array([], key_type),
                             "session_idx": pa.array([], pa.int64()),
                             "start": pa.array([], out_ts),
                             "end": pa.array([], out_ts),
                             "n_events": pa.array([], pa.int64())})
        g = g.sort_by([(key_col, "ascending"), (ts_col, "ascending")])
        ts, first_of_key, new_s = _session_start_mask(g, key_col, ts_col, gap_s)
        starts = np.flatnonzero(new_s)
        ends = np.concatenate([starts[1:], [g.num_rows]])
        # session ordinal within key: rank of the session among its key's
        # sessions (sessions are key-sorted; same rank-within-group mask)
        ks_first = first_of_key[starts]
        idx = np.arange(len(starts))
        grp_start = np.maximum.accumulate(np.where(ks_first, idx, 0))
        return pa.table({
            key_col: g.column(key_col).take(pa.array(starts)),
            "session_idx": pa.array((idx - grp_start).astype(np.int64)),
            "start": pc.cast(pa.array(ts[starts]).cast(pa.timestamp("us")), out_ts),
            "end": pc.cast(pa.array(ts[ends - 1]).cast(pa.timestamp("us")), out_ts),
            "n_events": pa.array((ends - starts).astype(np.int64)),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__b").map_groups(sessions_bucket, batch_format="pyarrow")
            .sort([key_col, "session_idx"]))


def sessionize_counts(ds: "ray.data.Dataset", key_col: str, ts_col: str,
                      gap_s: int = 1800,
                      n_coarse: int | None = None) -> "ray.data.Dataset":
    """Per-key session/event counts: (key, n_sessions, n_events).  Same
    coarse-bucket vectorized skeleton as ``session_windows``; the per-key
    rollup is one Arrow ``group_by`` inside the bucket (keys never span
    buckets, so no second shuffle is needed)."""
    n_coarse = _default_coarse(n_coarse)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__b", pa.array(_coarse_key_bucket(t.column(key_col), n_coarse)))

    def counts_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({key_col: pa.array([], g.schema.field(key_col).type),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        g = g.sort_by([(key_col, "ascending"), (ts_col, "ascending")])
        _, _, new_s = _session_start_mask(g, key_col, ts_col, gap_s)
        t2 = pa.table({key_col: g.column(key_col),
                       "ns": pa.array(new_s.astype(np.int64))})
        return (t2.group_by(key_col).aggregate([("ns", "sum"), ("ns", "count")])
                .rename_columns([key_col, "n_sessions", "n_events"]))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__b").map_groups(counts_bucket, batch_format="pyarrow"))


def watermark_lateness(ds: "ray.data.Dataset", ts_col: str, order_col: str,
                       delay_s: int, late_col: str = "late"
                       ) -> "ray.data.Dataset":
    """Watermark-relative late-data classification (SURVEY.md §2.9).

    Arrival order is ``order_col`` (the log offset / LSN); the watermark
    seen by row r is ``max(ts of all rows arriving strictly before r)
    - delay_s``.  Appends ``late_col``: true iff the row's event time is
    behind that watermark — the standard streaming-engine rule for
    routing a row to a late-data side output.

    Scale shape: the same two-pass distributed prefix scan as
    ``stages/packing.add_token_offsets`` — pass 1 computes one (lo, hi,
    max_ts) partial PER BLOCK (tiny: 3 values per block, collected on the
    driver and turned into an exclusive prefix-max), pass 2 re-maps each
    block combining the broadcast block-prefix with an in-block
    ``np.maximum.accumulate``.  Raw rows never shuffle; input must be
    block-disjoint and sorted on ``order_col`` (gated, not assumed).
    """
    import ray

    ds = ds.materialize()   # pin blocks so both passes see identical ones

    def block_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "max_us": pa.array([], pa.int64())})
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64())
        return pa.table({
            "lo": pa.array([t.column(order_col)[0].as_py()], pa.int64()),
            "hi": pa.array([t.column(order_col)[-1].as_py()], pa.int64()),
            "max_us": pa.array([pc.max(us).as_py()], pa.int64()),
        })

    parts = ds.map_batches(block_partial, batch_format="pyarrow").take_all()
    parts.sort(key=lambda r: r["lo"])
    for a, b in zip(parts, parts[1:]):
        if not a["hi"] < b["lo"]:
            raise ValueError(
                f"watermark_lateness: blocks overlap in {order_col!r} "
                f"({a['hi']!r} >= {b['lo']!r}); input must be sorted and "
                f"block-disjoint on the order column")
    los = [r["lo"] for r in parts]
    # exclusive prefix max of per-block maxima; first block sees the
    # sentinel (-2**62: small enough that no real epoch-us is ever behind
    # sentinel - delay, large enough that the subtraction cannot wrap)
    maxes = np.array([r["max_us"] for r in parts], dtype=np.int64)
    prefix = np.concatenate(
        [[-(2 ** 62)],
         np.maximum.accumulate(maxes)[:-1]]) if parts else np.empty(0, np.int64)
    ref = ray.put((los, prefix))
    delay_us = int(delay_s) * 1_000_000

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(late_col, pa.array([], pa.bool_()))
        los_, prefix_ = ray.get(ref)
        order = t.column(order_col).to_numpy(zero_copy_only=False)
        if t.num_rows > 1 and not (order[:-1] <= order[1:]).all():
            raise ValueError(
                f"watermark_lateness: block not sorted by {order_col!r}")
        i = los_.index(int(order[0]))   # exact: pass-2 blocks == pass-1 blocks
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        seen_before = np.concatenate(
            [[prefix_[i]], np.maximum.accumulate(np.maximum(us, prefix_[i]))[:-1]])
        late = us < seen_before - delay_us
        return t.append_column(late_col, pa.array(late))

    return ds.map_batches(classify, batch_format="pyarrow")
