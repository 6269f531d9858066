"""Maintained materialized views (pipelines/view.py): delta-rewrite
semantics, exactly-once incremental maintenance, crash-resume, chaining,
and transform-contract enforcement."""

import glob
import os
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow.compute as pc
import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.feed import consumer_cursor
from migration_pair_ray.pipelines.replay import final_state, replay
from migration_pair_ray.pipelines.view import (ViewTransformError,
                                               maintain_view,
                                               make_filter_project)

VIEW_ORACLE = """
WITH ch AS (SELECT * FROM read_parquet('{log}/batch-*.parquet', union_by_name=true)),
tr AS (SELECT conv_id, turn_idx, role, upper(text) AS text, tool, ts,
              CASE WHEN op = 'D' THEN 'D'
                   WHEN role = 'user' THEN op ELSE 'D' END AS op, lsn
       FROM ch),
w AS (SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) rn FROM tr)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM w WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
"""


def _user_upper_transform():
    return make_filter_project(
        where=lambda t: pc.equal(pc.fill_null(t.column("role"), ""), "user"),
        derive=lambda t: {"text": pc.utf8_upper(t.column("text"))})


def _mk(tmp_path, n=900, seed=31, n_files=3):
    log = str(tmp_path / "log")
    generate_change_log(log, n_events=n, n_convs=12, n_files=n_files,
                        tool_epoch=1, shuffle_window=100, seed=seed)
    src = JobConfig(changelog_dir=log, lake_dir=str(tmp_path / "lake"),
                    num_partitions=4)
    view = JobConfig(changelog_dir=str(tmp_path / "vlog"),
                     lake_dir=str(tmp_path / "vlake"), num_partitions=4)
    return log, src, view


def _visible(cfg):
    return final_state(cfg, sort=True).to_pandas().reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_view_matches_oracle_and_is_incremental(tmp_path):
    log, src, view = _mk(tmp_path)
    files = sorted(glob.glob(f"{log}/batch-*.parquet"))
    # phase 1: source consumes files 0-1; view follows
    hidden = files[2] + ".hold"
    os.rename(files[2], hidden)
    replay(src)
    r1 = maintain_view(src, view, _user_upper_transform())
    assert r1["passes_applied"] == 1 and r1["events"] > 0
    # visible view rows are all user-role, uppercased
    v1 = _visible(view)
    assert set(v1["role"]) <= {"user"} and len(v1) > 0

    # phase 2: the tail arrives; only the NEW pass is transformed
    os.rename(hidden, files[2])
    replay(src)
    r2 = maintain_view(src, view, _user_upper_transform())
    assert r2["passes_applied"] == 1
    got = _visible(view)
    want = duckdb.sql(VIEW_ORACLE.format(log=log)).df()
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True),
                                  check_dtype=False)
    # re-run: nothing pending, no-op
    r3 = maintain_view(src, view, _user_upper_transform())
    assert r3["passes_applied"] == 0 and r3["events"] == 0


@pytest.mark.usefixtures("ray_session")
def test_update_leaving_predicate_removes_key(tmp_path):
    """An update flipping role away from the predicate must DELETE the key
    from the view (the delta-rewrite tombstone rule)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    log, src, view = _mk(tmp_path, seed=32)
    replay(src)
    maintain_view(src, view, _user_upper_transform())
    v = _visible(view)
    assert len(v) > 0
    k = v.iloc[0]
    flip = pa.table({
        "conv_id": pa.array([k["conv_id"]], pa.string()),
        "turn_idx": pa.array([int(k["turn_idx"])], pa.int32()),
        "role": pa.array(["assistant"], pa.string()),
        "text": pa.array(["now hidden"], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([2_000_000_000_000_000], pa.timestamp("us")),
        "op": pa.array(["U"], pa.string()),
        "lsn": pa.array([10_000_000], pa.int64()),
    })
    pq.write_table(flip, f"{log}/batch-99999-flip.parquet")
    replay(src)
    maintain_view(src, view, _user_upper_transform())
    v2 = _visible(view)
    gone = v2[(v2["conv_id"] == k["conv_id"]) &
              (v2["turn_idx"] == k["turn_idx"])]
    assert len(gone) == 0


@pytest.mark.usefixtures("ray_session")
def test_crash_resume_and_cursor(tmp_path):
    """Crash between the view replay and the ack: re-run converges with no
    duplicate application; the registered consumer pins retention."""
    log, src, view = _mk(tmp_path, seed=33)
    replay(src)
    maintain_view(src, view, _user_upper_transform())
    before = _visible(view)
    cur = consumer_cursor(src, f"view:{Path(view.lake_dir).name}")
    assert cur == 0                          # acked the first pass (seq 0)
    # simulate the crash: roll the cursor back, re-run the maintenance
    cands = list((Path(src.lake_dir) / "_consumers").glob("*.json"))
    assert cands, "consumer cursor file missing"
    cands[0].write_text('{"consumer": "x", "acked_seq": -1}')
    r = maintain_view(src, view, _user_upper_transform())
    assert r["passes_applied"] == 1          # replays the pass as a no-op
    pd.testing.assert_frame_equal(_visible(view), before)


@pytest.mark.usefixtures("ray_session")
def test_view_chains(tmp_path):
    """A view of a view: second hop filters the first hop's output."""
    log, src, view = _mk(tmp_path, seed=34)
    replay(src)
    maintain_view(src, view, _user_upper_transform())
    view2 = JobConfig(changelog_dir=str(tmp_path / "v2log"),
                      lake_dir=str(tmp_path / "v2lake"), num_partitions=2)
    t2 = make_filter_project(
        where=lambda t: pc.greater(pc.fill_null(t.column("turn_idx"), -1), 5))
    r = maintain_view(view, view2, t2)
    assert r["passes_applied"] >= 1
    v2 = _visible(view2)
    v1 = _visible(view)
    want = v1[v1["turn_idx"] > 5].reset_index(drop=True)
    pd.testing.assert_frame_equal(v2, want)


@pytest.mark.usefixtures("ray_session")
def test_transform_contract_enforced(tmp_path):
    log, src, view = _mk(tmp_path, seed=35, n_files=1)
    replay(src)
    with pytest.raises(Exception, match="required change-event columns"):
        maintain_view(src, view, lambda t: t.drop_columns(["lsn"]),
                      consumer="bad1")
    with pytest.raises(Exception, match="EVERY source event"):
        maintain_view(src, view, lambda t: t.slice(0, 1), consumer="bad2")
    # failed attempts must not have acked
    assert consumer_cursor(src, "bad1") == -1
    assert consumer_cursor(src, "bad2") == -1
