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


def session_windows(ds: "ray.data.Dataset", key_col: str, ts_col: str,
                    gap_s: int = 1800) -> "ray.data.Dataset":
    """Session windows: per key, consecutive events closer than ``gap_s``
    belong to one session.  The one shuffle groups each key; ordering is
    established INSIDE the group (sort by ts), so arrival order is
    irrelevant.  Emits (key, session_idx, start, end, n_events)."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        new = (g[ts_col].diff() > pd.Timedelta(seconds=gap_s)).cumsum()
        agg = g.groupby(new).agg(start=(ts_col, "min"), end=(ts_col, "max"),
                                 n_events=(ts_col, "count")).reset_index(drop=True)
        agg.insert(0, "session_idx", np.arange(len(agg), dtype=np.int64))
        agg.insert(0, key_col, g[key_col].iloc[0])
        return agg

    return (ds.groupby(key_col)
            .map_groups(sessions, batch_format="pandas")
            .sort([key_col, "session_idx"]))
