"""Incremental snapshot export (pipelines/snapshot.snapshot_incremental):
re-export only moved partitions; exported union equals the visible state
under every layout, including merge-on-read and splits."""

import glob
import os
from pathlib import Path

import pandas as pd
import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.replay import final_state, replay
from migration_pair_ray.pipelines.snapshot import snapshot_incremental


def _read_export(out_dir) -> pd.DataFrame:
    parts = sorted(glob.glob(f"{out_dir}/part-*.parquet"))
    df = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
    return (df.sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))


def _fs(cfg) -> pd.DataFrame:
    return final_state(cfg).to_pandas().reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_incremental_export_and_reuse(tmp_path):
    stage = tmp_path / "stage"
    files = generate_change_log(str(stage), n_events=1500, n_convs=12,
                                n_files=4, tool_epoch=1, seed=41)
    log = tmp_path / "log"
    log.mkdir()
    cfg = JobConfig(changelog_dir=str(log), lake_dir=str(tmp_path / "lake"),
                    num_partitions=4, hash_state=False, mor_max_deltas=4)
    for f in files[:2]:
        os.link(f, log / Path(f).name)
    replay(cfg)
    out = str(tmp_path / "export")
    s1 = snapshot_incremental(cfg, out)
    assert s1["exported"] == s1["partitions"] > 0
    pd.testing.assert_frame_equal(_read_export(out), _fs(cfg))

    # unchanged lake → full reuse, zero rewrites
    mtimes = {p: os.path.getmtime(p)
              for p in glob.glob(f"{out}/part-*.parquet")}
    s2 = snapshot_incremental(cfg, out)
    assert s2["exported"] == 0 and s2["reused"] == s2["partitions"]
    assert mtimes == {p: os.path.getmtime(p)
                      for p in glob.glob(f"{out}/part-*.parquet")}

    # a second pass (lands as MoR deltas) moves SOME partitions; export
    # folds deltas and rewrites only the moved ones
    for f in files[2:]:
        os.link(f, log / Path(f).name)
    replay(cfg)
    s3 = snapshot_incremental(cfg, out)
    assert 0 < s3["exported"] <= s3["partitions"]
    pd.testing.assert_frame_equal(_read_export(out), _fs(cfg))


@pytest.mark.usefixtures("ray_session")
def test_export_tracks_split_gc(tmp_path):
    from migration_pair_ray.pipelines.compact import split_partition
    stage = tmp_path / "stage"
    files = generate_change_log(str(stage), n_events=1000, n_convs=12,
                                n_files=2, tool_epoch=1, seed=43)
    log = tmp_path / "log"
    log.mkdir()
    for f in files:
        os.link(f, log / Path(f).name)
    cfg = JobConfig(changelog_dir=str(log), lake_dir=str(tmp_path / "lake"),
                    num_partitions=4, hash_state=False)
    replay(cfg)
    out = str(tmp_path / "export")
    snapshot_incremental(cfg, out)
    assert (Path(out) / "part-00001.parquet").exists()
    split_partition(cfg, 1, 2)
    s = snapshot_incremental(cfg, out)
    # the retired base's file is gone; children exported; content exact
    assert not (Path(out) / "part-00001.parquet").exists()
    assert s["exported"] >= 2
    pd.testing.assert_frame_equal(_read_export(out), _fs(cfg))
