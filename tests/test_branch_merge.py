"""Branch merge (pipelines/branch.py): divergent clones fold back via
change-file history; merge is direction-free (semilattice), idempotent,
and refuses non-log and colliding histories."""

import glob
import os
import shutil
from pathlib import Path

import duckdb
import pandas as pd
import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.branch import BranchMergeError, merge_branch
from migration_pair_ray.pipelines.clone import clone_lake
from migration_pair_ray.pipelines.replay import final_state, replay

FULL_ORACLE = """
WITH ch AS (SELECT * FROM read_parquet([{files}], union_by_name=true)),
w AS (SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) rn FROM ch)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM w WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
"""


def _fork(tmp_path, n_events=1000, seed=21):
    """Generate a 4-file log; lake A consumes files 0-1, clone to B;
    A then consumes file 2, B file 3.  Returns (cfg_a, cfg_b, all_files)."""
    full = str(tmp_path / "log_full")
    generate_change_log(full, n_events=n_events, n_convs=12, n_files=4,
                        tool_epoch=1, shuffle_window=100, seed=seed)
    files = sorted(glob.glob(f"{full}/batch-*.parquet"))
    log_a, log_b = str(tmp_path / "log_a"), str(tmp_path / "log_b")
    os.makedirs(log_a), os.makedirs(log_b)
    for f in files[:2]:
        os.link(f, Path(log_a) / Path(f).name)
    cfg_a = JobConfig(changelog_dir=log_a, lake_dir=str(tmp_path / "lake_a"),
                      num_partitions=4)
    replay(cfg_a)
    clone_lake(cfg_a.lake_dir, str(tmp_path / "lake_b"))
    cfg_b = JobConfig(changelog_dir=log_b, lake_dir=str(tmp_path / "lake_b"),
                      num_partitions=4)
    # diverge: A gets file 2, B gets file 3
    os.link(files[2], Path(log_a) / Path(files[2]).name)
    os.link(files[3], Path(log_b) / Path(files[3]).name)
    replay(cfg_a)
    replay(cfg_b)
    return cfg_a, cfg_b, files


def _visible(cfg):
    return final_state(cfg, sort=True).to_pandas().reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_merge_converges_both_directions(tmp_path):
    cfg_a, cfg_b, files = _fork(tmp_path)
    sa = merge_branch(cfg_a, cfg_b)
    assert sa["merged_files"] == 1 and not sa["up_to_date"]
    sb = merge_branch(cfg_b, cfg_a)
    assert sb["merged_files"] == 1   # only file 2: B already has file 3
    a, b = _visible(cfg_a), _visible(cfg_b)
    pd.testing.assert_frame_equal(a, b)
    flist = ", ".join(f"'{f}'" for f in files)
    want = duckdb.sql(FULL_ORACLE.format(files=flist)).df()
    pd.testing.assert_frame_equal(a, want.reset_index(drop=True),
                                  check_dtype=False)
    # idempotent: re-merge is a no-op replay with nothing new
    again = merge_branch(cfg_a, cfg_b)
    assert again["merged_files"] == 0 and again["up_to_date"]


@pytest.mark.usefixtures("ray_session")
def test_merge_across_layouts(tmp_path):
    """A merge replays under DST's own layout — branch partition counts
    may differ (the clone carries A's, but a re-layout branch still
    merges)."""
    cfg_a, cfg_b, files = _fork(tmp_path, seed=22)
    # B re-partitions itself to a different layout before the merge
    from migration_pair_ray.pipelines.replay import repartition_lake
    cfg_b2 = JobConfig(changelog_dir=cfg_b.changelog_dir,
                       lake_dir=str(tmp_path / "lake_b2"), num_partitions=8)
    repartition_lake(cfg_b, cfg_b2)
    sa = merge_branch(cfg_b2, cfg_a)
    assert sa["merged_files"] >= 1
    flist = ", ".join(f"'{f}'" for f in files)
    want = duckdb.sql(FULL_ORACLE.format(files=flist)).df()
    pd.testing.assert_frame_equal(_visible(cfg_b2),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_merge_refuses_bulk_and_collisions(tmp_path):
    cfg_a, cfg_b, files = _fork(tmp_path, seed=23)
    # simulate a bulk pass on B: namespaced name in its checkpoint
    from migration_pair_ray.state.manifest import CheckpointStore
    CheckpointStore(cfg_b.checkpoint_dir).commit_pass(
        "deadbeefdeadbeef", [files[0]], seq=99,
        name_prefix="bulk:", stats={})
    with pytest.raises(BranchMergeError, match="bulk"):
        merge_branch(cfg_a, cfg_b)

    # basename collision with different bytes refuses
    cfg_c, cfg_d, _ = _fork(tmp_path / "x", seed=24)
    vict = sorted(Path(cfg_d.changelog_dir).glob("batch-*.parquet"))[-1]
    clash = Path(cfg_c.changelog_dir) / vict.name
    assert not clash.exists()
    clash.write_bytes(vict.read_bytes() + b"x")   # same name, other bytes
    with pytest.raises(BranchMergeError, match="different sizes"):
        merge_branch(cfg_c, cfg_d)


@pytest.mark.usefixtures("ray_session")
def test_merge_branch_task(tmp_path):
    """CLI-task surface: merge via run_task with the src config JSON."""
    cfg_a, cfg_b, files = _fork(tmp_path, seed=26)
    src_json = str(tmp_path / "src.json")
    cfg_b.to_json(src_json)
    from migration_pair_ray.tasks import run_task
    d = run_task("merge_branch", cfg_a, input_path=src_json, dry_run=True)
    assert d["merged_files"] == 1
    s = run_task("merge_branch", cfg_a, input_path=src_json)
    assert s["merged_files"] == 1 and not s["up_to_date"]


@pytest.mark.usefixtures("ray_session")
def test_merge_dry_run_and_missing_src_file(tmp_path):
    cfg_a, cfg_b, _ = _fork(tmp_path, seed=25)
    d = merge_branch(cfg_a, cfg_b, dry_run=True)
    assert d["dry_run"] and d["merged_files"] == 1
    assert not (Path(cfg_a.changelog_dir) / d["files"][0]).exists()
    # src's divergent file left its log (truncated) -> refuse, named
    (Path(cfg_b.changelog_dir) / d["files"][0]).unlink()
    with pytest.raises(BranchMergeError, match="left its"):
        merge_branch(cfg_a, cfg_b)
