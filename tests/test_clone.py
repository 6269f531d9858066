"""Zero-copy lake clone (pipelines/clone.py): clone == source bit-for-bit,
divergence is isolated in BOTH directions (new passes, GC, vacuum), and the
guard rails refuse non-lakes and non-empty destinations."""

import os
import shutil
from pathlib import Path

import duckdb
import pandas as pd
import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.clone import CloneError, clone_lake
from migration_pair_ray.pipelines.replay import final_state, replay


def _oracle(globs: list[str]) -> pd.DataFrame:
    srcs = ", ".join(f"'{g}'" for g in globs)
    return duckdb.sql(f"""
        WITH ch AS (SELECT * FROM read_parquet([{srcs}], union_by_name=true)),
        w AS (SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) rn FROM ch)
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM w WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx""").df().reset_index(drop=True)


def _state_df(cfg: JobConfig) -> pd.DataFrame:
    return final_state(cfg).to_pandas().reset_index(drop=True)


def _file_map(root: str) -> dict[str, tuple[int, float]]:
    out = {}
    for p in Path(root).rglob("*"):
        if p.is_file() and p.name != "_writer.lock":
            st = p.stat()
            out[str(p.relative_to(root))] = (st.st_size, st.st_mtime)
    return out


@pytest.mark.usefixtures("ray_session")
def test_clone_matches_and_diverges(tmp_lake, tmp_path):
    log, lake = tmp_lake
    generate_change_log(log, n_events=1500, n_convs=10, n_files=3,
                        tool_epoch=1, seed=91)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=4)
    replay(cfg)
    src_before = _file_map(lake)

    clone_dir = str(tmp_path / "branch")
    stats = clone_lake(lake, clone_dir)
    assert stats["files"] == len(_file_map(clone_dir))
    assert stats["linked"] + stats["copied"] == stats["files"]

    ccfg = JobConfig(changelog_dir=log, lake_dir=clone_dir, num_partitions=4)
    pd.testing.assert_frame_equal(_state_df(ccfg), _state_df(cfg))
    # clone carries the checkpoints: same log replays as a no-op
    assert replay(ccfg)["up_to_date"]

    # diverge the clone with a new change batch; the source must not move
    log2 = tmp_path / "log2"
    log2.mkdir()
    generate_change_log(str(log2), n_events=400, n_convs=10, n_files=1,
                        tool_epoch=0, seed=92)
    os.rename(next(Path(log2).glob("batch-*.parquet")),
              log2 / "batch-99999.parquet")
    ccfg2 = JobConfig(changelog_dir=str(log2), lake_dir=clone_dir,
                      num_partitions=4)
    res = replay(ccfg2)
    assert res["events_in"] > 0 and not res["up_to_date"]
    assert _file_map(lake) == src_before          # source untouched
    got = _state_df(ccfg2)[["conv_id", "turn_idx", "role", "text",
                            "tool", "ts"]]
    want = _oracle([f"{log}/*.parquet", f"{log2}/*.parquet"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # ...and the source still answers from the ORIGINAL log alone
    pd.testing.assert_frame_equal(
        _state_df(cfg)[["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
        _oracle([f"{log}/*.parquet"]), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_source_gc_does_not_break_clone(tmp_lake, tmp_path):
    """Diverge the SOURCE after cloning: the old pass's state files are
    GC'd on the source side, but the clone still reads its linked copies."""
    log, lake = tmp_lake
    generate_change_log(log, n_events=800, n_convs=6, n_files=2,
                        tool_epoch=0, seed=93)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=2)
    replay(cfg)
    clone_dir = str(tmp_path / "branch")
    clone_lake(lake, clone_dir)
    ccfg = JobConfig(changelog_dir=log, lake_dir=clone_dir, num_partitions=2)
    frozen = _state_df(ccfg)

    log2 = tmp_path / "log2"
    log2.mkdir()
    generate_change_log(str(log2), n_events=400, n_convs=6, n_files=1,
                        tool_epoch=0, seed=94)
    os.rename(next(Path(log2).glob("batch-*.parquet")),
              log2 / "batch-99999.parquet")
    replay(JobConfig(changelog_dir=str(log2), lake_dir=lake,
                     num_partitions=2))
    # the source advanced (its old state files were unlinked); the clone
    # is a frozen branch and still serves the pre-divergence state
    pd.testing.assert_frame_equal(_state_df(ccfg), frozen)


@pytest.mark.usefixtures("ray_session")
def test_clone_chunked_layout(tmp_lake, tmp_path):
    log, lake = tmp_lake
    generate_change_log(log, n_events=1000, n_convs=8, n_files=2,
                        tool_epoch=0, seed=95)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=2,
                    state_chunk_rows=40)
    replay(cfg)
    clone_dir = str(tmp_path / "branch")
    clone_lake(lake, clone_dir)
    ccfg = JobConfig(changelog_dir=log, lake_dir=clone_dir,
                     num_partitions=2, state_chunk_rows=40)
    pd.testing.assert_frame_equal(_state_df(ccfg), _state_df(cfg))


@pytest.mark.usefixtures("ray_session")
def test_clone_task(tmp_lake, tmp_path):
    log, lake = tmp_lake
    generate_change_log(log, n_events=300, n_convs=4, n_files=1,
                        tool_epoch=0, seed=96)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=2)
    replay(cfg)
    from migration_pair_ray.tasks import run_task
    out = str(tmp_path / "branch")
    stats = run_task("clone", cfg, out_dir=out)
    assert stats["files"] > 0
    ccfg = JobConfig(changelog_dir=log, lake_dir=out, num_partitions=2)
    pd.testing.assert_frame_equal(_state_df(ccfg), _state_df(cfg))


def test_clone_guards(tmp_path):
    not_lake = tmp_path / "nope"
    not_lake.mkdir()
    with pytest.raises(CloneError):
        clone_lake(str(not_lake), str(tmp_path / "dst"))
    lake = tmp_path / "lake"
    lake.mkdir()
    (lake / "_lake_meta.json").write_text("{}")
    busy = tmp_path / "busy"
    busy.mkdir()
    (busy / "x").write_text("x")
    with pytest.raises(CloneError):
        clone_lake(str(lake), str(busy))
    # crash artifact cleanup: a stale tmp dir from a dead clone is ignored
    stale = tmp_path / "dst2.tmp.1"
    stale.mkdir()
    clone_lake(str(lake), str(tmp_path / "dst2"))
    assert (tmp_path / "dst2" / "_lake_meta.json").exists()
