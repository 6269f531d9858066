"""Snapshot-diff CDC bootstrap (pipelines/snapshot_diff): the diff of two
LWW snapshots is a change batch, and bulk_load(old) + replay(diff) lands
bit-for-bit on the new snapshot."""

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.replay import final_state, replay
from migration_pair_ray.pipelines.snapshot_diff import (SnapshotNotUnique,
                                                        snapshot_diff,
                                                        write_diff_batches)


def _snap_pair(tmp_path):
    """Two snapshot parquet dirs from the same LWW lineage (epoch 1 lake,
    then epoch 2 applied on top), plus the shared lake cfg."""
    log = str(tmp_path / "log")
    generate_change_log(log, n_events=2500, n_convs=40, n_files=2,
                        tool_epoch=1, seed=71)
    cfg = JobConfig(changelog_dir=log, lake_dir=str(tmp_path / "lake"),
                    num_partitions=4, hash_state=False)
    replay(cfg)
    snap_a = str(tmp_path / "snapA")
    final_state(cfg).write_parquet(snap_a)
    generate_change_log(log, n_events=1200, n_convs=40, n_files=1,
                        tool_epoch=2, seed=72)
    replay(cfg)
    snap_b = str(tmp_path / "snapB")
    final_state(cfg).write_parquet(snap_b)
    return snap_a, snap_b


def _df(ds) -> pd.DataFrame:
    return (ds.to_pandas().sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_bootstrap_roundtrip_bit_identical(tmp_path):
    snap_a, snap_b = _snap_pair(tmp_path)
    cfg_c = JobConfig(changelog_dir=str(tmp_path / "difflog"),
                      lake_dir=str(tmp_path / "lakeC"),
                      num_partitions=4, hash_state=False)
    from migration_pair_ray.pipelines.bulk_load import bulk_load
    bulk_load(cfg_c, snap_a, fmt="parquet")
    stats = write_diff_batches(cfg_c.changelog_dir, rd.read_parquet(snap_a),
                               rd.read_parquet(snap_b), tag="boot",
                               lsn_base=1)
    assert stats["rows"] > 0 and stats["files"] > 0
    replay(cfg_c)
    got = _df(final_state(cfg_c))
    want = _df(rd.read_parquet(snap_b))
    pd.testing.assert_frame_equal(got, want)

    # idempotent: the diff files are already committed, replay is a no-op
    assert replay(cfg_c)["up_to_date"]
    # re-deriving the diff rewrites identical bytes (atomic, deterministic)
    before = {p.name: p.read_bytes()
              for p in Path(cfg_c.changelog_dir).glob("batch-*.parquet")}
    write_diff_batches(cfg_c.changelog_dir, rd.read_parquet(snap_a),
                       rd.read_parquet(snap_b), tag="boot", lsn_base=1)
    after = {p.name: p.read_bytes()
             for p in Path(cfg_c.changelog_dir).glob("batch-*.parquet")}
    assert before == after


@pytest.mark.usefixtures("ray_session")
def test_diff_classes_match_pandas_bruteforce(tmp_path):
    snap_a, snap_b = _snap_pair(tmp_path)
    diff = (snapshot_diff(rd.read_parquet(snap_a), rd.read_parquet(snap_b))
            .to_pandas())
    a = rd.read_parquet(snap_a).to_pandas().set_index(
        ["conv_id", "turn_idx"]).sort_index()
    b = rd.read_parquet(snap_b).to_pandas().set_index(
        ["conv_id", "turn_idx"]).sort_index()
    added = b.index.difference(a.index)
    deleted = a.index.difference(b.index)
    common = a.index.intersection(b.index)
    ac, bc = a.loc[common], b.loc[common]
    changed_mask = pd.Series(False, index=common)
    for col in ["role", "text", "tool", "ts"]:
        av, bv = ac[col], bc[col]
        changed_mask |= ~((av == bv) | (av.isna() & bv.isna()))
    changed = common[changed_mask.to_numpy()]

    got = diff.set_index(["conv_id", "turn_idx"]).sort_index()
    assert set(got[got["op"] == "I"].index) == set(added)
    assert set(got[got["op"] == "D"].index) == set(deleted)
    assert set(got[got["op"] == "U"].index) == set(changed)
    # I/U payload comes from the NEW side; D keeps the old ts, nulls payload
    iu = got[got["op"] != "D"]
    pd.testing.assert_frame_equal(
        iu[["role", "text", "tool", "ts"]].sort_index(),
        b.loc[iu.index.sort_values(), ["role", "text", "tool", "ts"]])
    dd = got[got["op"] == "D"]
    assert dd[["role", "text", "tool"]].isna().all().all()
    pd.testing.assert_series_equal(dd["ts"].sort_index(),
                                   a.loc[dd.index.sort_values(), "ts"],
                                   check_names=False)
    # lsns are unique and deterministic across runs
    assert got["lsn"].is_unique
    again = (snapshot_diff(rd.read_parquet(snap_a),
                           rd.read_parquet(snap_b)).to_pandas()
             .set_index(["conv_id", "turn_idx"]).sort_index())
    pd.testing.assert_frame_equal(got, again)


@pytest.mark.usefixtures("ray_session")
def test_identical_snapshots_diff_empty(tmp_path):
    snap_a, _ = _snap_pair(tmp_path)
    diff = snapshot_diff(rd.read_parquet(snap_a), rd.read_parquet(snap_a))
    assert diff.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_duplicate_key_snapshot_raises(tmp_path):
    t = pa.table({
        "conv_id": pa.array(["c1", "c1"]),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "role": pa.array(["user", "user"]),
        "text": pa.array(["a", "b"]),
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([1, 2], pa.timestamp("us")),
    })
    ok = t.slice(0, 1)
    with pytest.raises(Exception, match="duplicate"):
        snapshot_diff(rd.from_arrow(t), rd.from_arrow(ok)).take_all()
