"""Secondary value index (pipelines/index): postings must serve exact
rows with pruned I/O, refresh incrementally (only changed partitions
re-swept), and refuse stale probes rather than answer partially."""

import json
from pathlib import Path

import pandas as pd
import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.index import (IndexStaleError,
                                                build_value_index,
                                                index_candidate_files,
                                                lookup_by_value)
from migration_pair_ray.pipelines.replay import final_state, replay


def _mk_lake(tmp_path, n_files=2, **cfg_kw) -> JobConfig:
    log = str(tmp_path / "log")
    generate_change_log(log, n_events=2000, n_convs=24, n_files=n_files,
                        tool_epoch=1, seed=53)
    cfg = JobConfig(changelog_dir=log, lake_dir=str(tmp_path / "lake"),
                    num_partitions=4, hash_state=False, **cfg_kw)
    replay(cfg)
    return cfg


@pytest.mark.usefixtures("ray_session")
def test_probe_exact_and_pruned(tmp_path):
    cfg = _mk_lake(tmp_path, state_chunk_rows=60)  # chunked layout
    stats = build_value_index(cfg, "tool")
    assert stats["reindexed"] == stats["partitions"] > 0

    full = final_state(cfg).to_pandas()
    vals = sorted(v for v in full["tool"].dropna().unique())[:2]
    got = lookup_by_value(cfg, "tool", vals).to_pandas().reset_index(drop=True)
    want = (full[full["tool"].isin(vals)]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

    # the plan is a subset of the lake's state files, and for a value
    # absent from the lake it is empty
    all_files = {str(p.relative_to(cfg.lake_dir))
                 for p in Path(cfg.lake_dir).glob("part=*/state-*.parquet")}
    planned = set(index_candidate_files(cfg, "tool", vals))
    assert planned and planned <= all_files
    assert index_candidate_files(cfg, "tool", ["no-such-tool"]) == []
    assert lookup_by_value(cfg, "tool", ["no-such-tool"]).num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_incremental_refresh_and_staleness(tmp_path):
    cfg = _mk_lake(tmp_path, n_files=2)
    build_value_index(cfg, "tool")
    probe_val = sorted(
        final_state(cfg).to_pandas()["tool"].dropna().unique())[0]
    before = lookup_by_value(cfg, "tool", [probe_val]).to_pandas()
    assert len(before) > 0

    # a new pass touching ONE conversation moves some partitions but not
    # all; probe must refuse, rebuild must re-sweep only the moved ones
    import pyarrow as pa
    import pyarrow.parquet as pq
    full0 = final_state(cfg).to_pandas()
    conv = sorted(full0["conv_id"].unique())[0]
    patch = pa.table({
        "conv_id": pa.array([conv] * 3, pa.string()),
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "role": pa.array(["assistant"] * 3, pa.string()),
        "text": pa.array(["patched"] * 3, pa.string()),
        "tool": pa.array(["tool-patched", None, "tool-patched"], pa.string()),
        "ts": pa.array([pd.Timestamp("2030-01-01")] * 3).cast(
            pa.timestamp("us")),
        "op": pa.array(["U"] * 3, pa.string()),
        "lsn": pa.array([10_000, 10_001, 10_002], pa.int64()),
    })
    pq.write_table(patch, str(Path(cfg.changelog_dir)
                              / "batch-99990-000000010000.parquet"))
    replay(cfg)
    with pytest.raises(IndexStaleError):
        lookup_by_value(cfg, "tool", [probe_val])
    stats = build_value_index(cfg, "tool")
    assert 0 < stats["reindexed"] < stats["partitions"]
    assert stats["reused"] == stats["partitions"] - stats["reindexed"]

    full = final_state(cfg).to_pandas()
    got = lookup_by_value(cfg, "tool", [probe_val]).to_pandas()
    want = (full[full["tool"] == probe_val]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


@pytest.mark.usefixtures("ray_session")
def test_unbuilt_index_raises(tmp_path):
    cfg = _mk_lake(tmp_path)
    with pytest.raises(IndexStaleError):
        index_candidate_files(cfg, "tool", ["w1"])


@pytest.mark.usefixtures("ray_session")
def test_split_invalidates_then_rebuild(tmp_path):
    """A partition split changes the active pid set and file lists: the
    probe refuses until rebuilt, after which results are exact again."""
    from migration_pair_ray.pipelines.compact import split_partition
    cfg = _mk_lake(tmp_path)
    build_value_index(cfg, "role")
    split_partition(cfg, 1, 2)
    with pytest.raises(IndexStaleError):
        lookup_by_value(cfg, "role", ["user"])
    build_value_index(cfg, "role")
    full = final_state(cfg).to_pandas()
    got = lookup_by_value(cfg, "role", ["user"]).to_pandas()
    want = (full[full["role"] == "user"]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # retired parent postings are GC'd from the index dir
    meta = json.loads((Path(cfg.lake_dir) / "_index" / "role"
                       / "_meta.json").read_text())
    live = {f"part-{int(p):05d}.parquet" for p in meta["fingerprints"]}
    on_disk = {p.name for p in
               (Path(cfg.lake_dir) / "_index" / "role").glob("part-*.parquet")}
    assert on_disk == live


@pytest.mark.usefixtures("ray_session")
def test_index_task_cli(tmp_path):
    from migration_pair_ray.tasks import run_task
    cfg = _mk_lake(tmp_path)
    stats = run_task("index", cfg, column="role")
    assert stats["partitions"] > 0 and stats["reindexed"] == stats["partitions"]
    # second run with an unchanged lake reuses every partition
    stats2 = run_task("index", cfg, column="role")
    assert stats2["reindexed"] == 0 and stats2["reused"] == stats2["partitions"]


@pytest.mark.usefixtures("ray_session")
def test_int_column_probe(tmp_path):
    """Postings stringify values; the probe must cast back to the
    column's native type for the Parquet filter."""
    cfg = _mk_lake(tmp_path)
    build_value_index(cfg, "turn_idx")
    full = final_state(cfg).to_pandas()
    t = int(sorted(full["turn_idx"].unique())[0])
    got = lookup_by_value(cfg, "turn_idx", [str(t)]).to_pandas()
    want = (full[full["turn_idx"] == t]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


@pytest.mark.usefixtures("ray_session")
def test_native_typed_probe_values(tmp_path):
    """Native-typed probe values (int, not str) go through the same
    Arrow stringification the postings were built with."""
    cfg = _mk_lake(tmp_path)
    build_value_index(cfg, "turn_idx")
    full = final_state(cfg).to_pandas()
    t = int(sorted(full["turn_idx"].unique())[0])
    got = lookup_by_value(cfg, "turn_idx", [t]).to_pandas()  # int, not str
    want = (full[full["turn_idx"] == t]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
