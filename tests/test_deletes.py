"""Targeted deletes through the CDC path (pipelines/deletes.delete_where)."""

from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.deletes import DeleteTooLarge, delete_where
from migration_pair_ray.pipelines.fsck import validate_lake
from migration_pair_ray.pipelines.replay import final_state, replay


def _pred_role(role: str):
    def pred(t: pa.Table) -> pa.Array:
        return pc.fill_null(pc.equal(t.column("role"), role), False)
    return pred


def _mk(tmp_path, **cfg_kw) -> tuple[JobConfig, str]:
    log = str(tmp_path / "log")
    generate_change_log(log, n_events=1500, n_convs=12, n_files=2,
                        tool_epoch=1, seed=83)
    cfg = JobConfig(changelog_dir=log, lake_dir=str(tmp_path / "lake"),
                    num_partitions=4, hash_state=False, **cfg_kw)
    replay(cfg)
    return cfg, log


@pytest.mark.usefixtures("ray_session")
def test_delete_where_removes_matches_only(tmp_path):
    cfg, log = _mk(tmp_path)
    before = final_state(cfg).to_pandas()
    role = before["role"].mode()[0]
    n_match = int((before["role"] == role).sum())
    assert n_match > 0

    s = delete_where(cfg, _pred_role(role), tag=f"purge-{role}")
    assert s["applied"] and s["tombstones"] == n_match

    after = final_state(cfg).to_pandas()
    assert (after["role"] != role).all()
    want = (before[before["role"] != role]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(after.reset_index(drop=True), want)
    assert validate_lake(cfg, deep=True)["ok"]

    # idempotent against the NEW lake state: predicate matches nothing
    s2 = delete_where(cfg, _pred_role(role), tag=f"purge-{role}")
    assert s2["tombstones"] == 0 and not s2["applied"]
    pd.testing.assert_frame_equal(
        final_state(cfg).to_pandas().reset_index(drop=True), want)


@pytest.mark.usefixtures("ray_session")
def test_later_update_resurrects_deleted_key(tmp_path):
    """CDC semantics: a delete is an event, not a wall — a LATER real
    update (higher ts) wins over the tombstone."""
    import numpy as np
    import pyarrow.parquet as pq

    cfg, log = _mk(tmp_path)
    before = final_state(cfg).to_pandas()
    victim = before.iloc[0]
    s = delete_where(
        cfg, lambda t: pc.fill_null(pc.and_(
            pc.equal(t.column("conv_id"), victim["conv_id"]),
            pc.equal(t.column("turn_idx"),
                     pa.scalar(int(victim["turn_idx"]),
                               t.column("turn_idx").type))), False),
        tag="one-key")
    assert s["tombstones"] == 1
    mid = final_state(cfg).to_pandas()
    assert not ((mid["conv_id"] == victim["conv_id"])
                & (mid["turn_idx"] == victim["turn_idx"])).any()

    # later update arrives with a strictly later ts
    upd = pa.table({
        "conv_id": pa.array([victim["conv_id"]], pa.string()),
        "turn_idx": pa.array([int(victim["turn_idx"])], pa.int32()),
        "role": pa.array(["assistant"]),
        "text": pa.array(["resurrected"]),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([pd.Timestamp("2031-01-01")]).cast(pa.timestamp("us")),
        "op": pa.array(["U"]),
        "lsn": pa.array([10_000_000], pa.int64()),
    })
    pq.write_table(upd, f"{log}/batch-zzz-resurrect.parquet")
    replay(cfg)
    after = final_state(cfg).to_pandas()
    row = after[(after["conv_id"] == victim["conv_id"])
                & (after["turn_idx"] == victim["turn_idx"])]
    assert len(row) == 1 and row.iloc[0]["text"] == "resurrected"


@pytest.mark.usefixtures("ray_session")
def test_delete_crash_before_replay_resumes(tmp_path):
    """apply=False models a crash between the file landing and the replay:
    the tombstone batch is a normal uncommitted change file — the next
    replay consumes it."""
    cfg, _ = _mk(tmp_path)
    before = final_state(cfg).to_pandas()
    role = before["role"].mode()[0]
    s = delete_where(cfg, _pred_role(role), tag="crashy", apply=False)
    assert s["tombstones"] > 0 and not s["applied"]
    replay(cfg)
    after = final_state(cfg).to_pandas()
    assert (after["role"] != role).all()


@pytest.mark.usefixtures("ray_session")
def test_delete_too_large_guard(tmp_path):
    cfg, _ = _mk(tmp_path)
    with pytest.raises(DeleteTooLarge):
        delete_where(cfg, lambda t: pa.array([True] * t.num_rows),
                     tag="everything", max_rows=5)


@pytest.mark.usefixtures("ray_session")
def test_delete_task_cli_form(tmp_path):
    from migration_pair_ray.tasks import run_task
    cfg, _ = _mk(tmp_path)
    before = final_state(cfg).to_pandas()
    role = before["role"].mode()[0]
    s = run_task("delete", cfg, where=f"role={role}")
    assert s["tombstones"] == int((before["role"] == role).sum())
    after = final_state(cfg).to_pandas()
    assert (after["role"] != role).all()


@pytest.mark.usefixtures("ray_session")
def test_expire_before_ttl(tmp_path):
    """Event-time retention: keys whose winner is older than the cutoff
    are tombstoned; the survivors equal a pandas filter of the before
    state.  Advancing the horizon is a new idempotent batch."""
    from migration_pair_ray.pipelines.deletes import expire_before
    cfg, _ = _mk(tmp_path)
    before = final_state(cfg).to_pandas()
    cutoff = int(before["ts"].astype("datetime64[us]").astype("int64")
                 .quantile(0.4))
    n_old = int((before["ts"].astype("datetime64[us]").astype("int64")
                 < cutoff).sum())
    assert 0 < n_old < len(before)

    s = expire_before(cfg, cutoff)
    assert s["applied"] and s["tombstones"] == n_old
    after = final_state(cfg).to_pandas()
    want = (before[before["ts"].astype("datetime64[us]").astype("int64")
                   >= cutoff]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(after.reset_index(drop=True), want)
    assert validate_lake(cfg, deep=True)["ok"]

    # same horizon again: nothing left to expire
    s2 = expire_before(cfg, cutoff)
    assert s2["tombstones"] == 0 and not s2["applied"]
    # advancing the horizon expires more (a NEW batch, distinct tag)
    cutoff2 = int(before["ts"].astype("datetime64[us]").astype("int64")
                  .quantile(0.8))
    s3 = expire_before(cfg, cutoff2)
    assert s3["applied"] and s3["tombstones"] > 0


@pytest.mark.usefixtures("ray_session")
def test_expire_task_form(tmp_path):
    from migration_pair_ray.tasks import run_task
    cfg, _ = _mk(tmp_path)
    before = final_state(cfg).to_pandas()
    cutoff = int(before["ts"].astype("datetime64[us]").astype("int64")
                 .median())
    s = run_task("expire", cfg, cutoff_us=cutoff)
    assert s["applied"] and s["tombstones"] > 0
    after = final_state(cfg).to_pandas()
    assert (after["ts"].astype("datetime64[us]").astype("int64")
            >= cutoff).all()
