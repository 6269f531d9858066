"""Lake integrity audit (pipelines/fsck): a healthy lake reports clean in
every layout; each corruption class is detected and named."""

import json
import os
import shutil
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.fsck import validate_lake
from migration_pair_ray.pipelines.replay import final_state, replay


def _mk_lake(tmp_path, name, **cfg_kw) -> JobConfig:
    log = str(tmp_path / f"{name}-log")
    generate_change_log(log, n_events=3000, n_convs=40, n_files=3,
                        tool_epoch=1, shuffle_window=400, seed=23)
    cfg = JobConfig(changelog_dir=log, lake_dir=str(tmp_path / name),
                    num_partitions=6, **cfg_kw)
    replay(cfg)
    return cfg


def _state_files(cfg) -> list[Path]:
    return sorted(Path(cfg.lake_dir).glob("part=*/state-*.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_fsck_clean_lakes(tmp_path):
    """Single-file, chunked, and split lakes all audit clean (both
    levels), and the row total equals the lake's row count."""
    from migration_pair_ray.pipelines.compact import split_partition
    for name, kw in [("plain", {}),
                     ("chunked", {"state_chunk_rows": 120,
                                  "partition_mode": "key"})]:
        cfg = _mk_lake(tmp_path, name, **kw)
        for deep in (False, True):
            rep = validate_lake(cfg, deep=deep)
            assert rep["ok"], rep["problems"]
        from migration_pair_ray.pipelines.replay import read_lake
        assert rep["rows"] == read_lake(cfg).count()

    cfg = _mk_lake(tmp_path, "split")
    split_partition(cfg, 2, fanout=2)
    rep = validate_lake(cfg, deep=True)
    assert rep["ok"], rep["problems"]


@pytest.mark.usefixtures("ray_session")
def test_fsck_detects_missing_and_unreferenced(tmp_path):
    cfg = _mk_lake(tmp_path, "dmg1")
    victim = _state_files(cfg)[0]
    stray = victim.parent / "state-deadbeef.parquet"
    shutil.copy(victim, stray)            # GC leak
    os.remove(victim)                     # lost data file
    rep = validate_lake(cfg)
    kinds = {p["kind"] for p in rep["problems"]}
    assert "missing_file" in kinds and "unreferenced_file" in kinds
    assert not rep["ok"]


@pytest.mark.usefixtures("ray_session")
def test_fsck_detects_row_count_and_hash_mismatch(tmp_path):
    cfg = _mk_lake(tmp_path, "dmg2")
    victim = _state_files(cfg)[0]
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, t.num_rows - 1), victim)   # truncate one row
    rep = validate_lake(cfg)
    assert {p["kind"] for p in rep["problems"]} == {"row_count_mismatch"}
    deep = validate_lake(cfg, deep=True)
    assert "hash_mismatch" in {p["kind"] for p in deep["problems"]}


@pytest.mark.usefixtures("ray_session")
def test_fsck_deep_detects_misrouted_and_duplicate_keys(tmp_path):
    """hash_state=False lakes have no recorded hash, so the deep sweep
    must catch tampering through the semantic checks instead."""
    import pyarrow as pa
    cfg = _mk_lake(tmp_path, "dmg3", hash_state=False)
    assert validate_lake(cfg, deep=True)["ok"]
    victim = _state_files(cfg)[0]
    t = pq.read_table(victim)
    # duplicate an existing key AND retarget one row's key to a foreign
    # conversation (routes elsewhere), keeping the row count intact
    conv = t.column("conv_id").to_pylist()
    conv[0] = conv[1]                     # duplicate key (same turn? make sure)
    turn = t.column("turn_idx").to_pylist()
    turn[0] = turn[1]
    conv[2] = "zzz-foreign-conversation"  # will not route here
    t = (t.set_column(t.schema.get_field_index("conv_id"), "conv_id",
                      pa.array(conv, pa.string()))
         .set_column(t.schema.get_field_index("turn_idx"), "turn_idx",
                     pa.array(turn, t.schema.field("turn_idx").type)))
    pq.write_table(t, victim)
    rep = validate_lake(cfg, deep=True)
    kinds = {p["kind"] for p in rep["problems"]}
    assert "duplicate_keys" in kinds and "misrouted_keys" in kinds
    # metadata-only sweep cannot see inside the file: stays clean
    assert validate_lake(cfg)["ok"]


@pytest.mark.usefixtures("ray_session")
def test_fsck_detects_orphan_state(tmp_path):
    cfg = _mk_lake(tmp_path, "dmg4")
    files = _state_files(cfg)
    pid_dir = files[0].parent
    pid = int(pid_dir.name.split("=")[1])
    os.remove(Path(cfg.lake_dir) / "_manifest" / f"part-{pid:05d}.json")
    rep = validate_lake(cfg)
    assert {p["kind"] for p in rep["problems"]} == {"orphan_state"}
    assert all(p["partition"] == pid for p in rep["problems"])


@pytest.mark.usefixtures("ray_session")
def test_fsck_detects_manifest_rows_mismatch(tmp_path):
    cfg = _mk_lake(tmp_path, "dmg5", state_chunk_rows=100,
                   partition_mode="key")
    mpath = sorted((Path(cfg.lake_dir) / "_manifest").glob("part-*.json"))[0]
    m = json.loads(mpath.read_text())
    assert "data_files" in m
    m["row_count"] += 7
    mpath.write_text(json.dumps(m))
    rep = validate_lake(cfg)
    assert "manifest_rows_mismatch" in {p["kind"] for p in rep["problems"]}


@pytest.mark.usefixtures("ray_session")
def test_lake_stats(tmp_path):
    """lake_stats reports layout truthfully across plain / chunked / MoR
    lakes, from manifests only."""
    import os
    from migration_pair_ray.changegen import generate_change_log
    from migration_pair_ray.pipelines.fsck import lake_stats
    from migration_pair_ray.pipelines.replay import replay
    from migration_pair_ray.tasks import run_task
    stage = tmp_path / "stage"
    files = generate_change_log(str(stage), n_events=1200, n_convs=10,
                                n_files=4, tool_epoch=1, seed=19)
    log = tmp_path / "log"
    log.mkdir()
    cfg = JobConfig(changelog_dir=str(log), lake_dir=str(tmp_path / "lake"),
                    num_partitions=4, hash_state=False,
                    state_chunk_rows=60, mor_max_deltas=4)
    for f in files[:2]:
        os.link(f, log / Path(f).name)
    replay(cfg)
    s1 = lake_stats(cfg)
    assert s1["partitions"] == 4 and s1["chunked_partitions"] == 4
    assert s1["pending_deltas"] == 0 and s1["bytes"] > 0
    for f in files[2:]:
        os.link(f, log / Path(f).name)
    replay(cfg)                       # second pass lands as deltas
    s2 = lake_stats(cfg)
    assert s2["mor_partitions"] > 0 and s2["pending_deltas"] > 0
    assert s2["rows_internal"] > s1["rows_internal"]
    assert s2["max_files_per_partition"] >= 2
    assert run_task("stats", cfg) == s2
