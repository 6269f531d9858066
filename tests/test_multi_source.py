"""Multi-source ingest (pipelines/multi): K independent change logs
namespaced into one lake — equivalence to single-log replay, per-source
incremental resume, registry identity, append-only enforcement, and the
feed/replicate refusal + bootstrap replication path."""

import json
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.feed import (FeedMultiSourceError,
                                               bootstrap_replica,
                                               pending_passes, replicate,
                                               truncate_log)
from migration_pair_ray.pipelines.multi import replay_multi
from migration_pair_ray.pipelines.replay import final_state, replay
from migration_pair_ray.state.manifest import CheckpointStore


def _split_by_parity(files: list[str], dir0: str, dir1: str,
                     files_per_source: int = 2) -> None:
    """Split a single change log into two source logs by lsn parity, each
    re-keyed to its own dense monotone lsn (lsn // 2) — the namespaced
    merge (lsn * 2 + parity) reconstructs the original offsets exactly."""
    t = pa.concat_tables([pq.read_table(f) for f in files],
                         promote_options="default")
    for k, d in enumerate((dir0, dir1)):
        os.makedirs(d, exist_ok=True)
        part = t.filter(pc.equal(pc.bit_wise_and(t.column("lsn"), 1), k))
        part = part.set_column(part.schema.get_field_index("lsn"), "lsn",
                               pc.shift_right(part.column("lsn"), 1))
        part = part.sort_by([("lsn", "ascending")])
        n = part.num_rows
        per = max(1, (n + files_per_source - 1) // files_per_source)
        for i in range(files_per_source):
            chunk = part.slice(i * per, per)
            if chunk.num_rows == 0:
                continue
            pq.write_table(chunk, f"{d}/batch-{i:04d}.parquet")


def _setup(tmp_path, **gen_kw):
    stage = tmp_path / "stage"
    files = generate_change_log(str(stage), n_events=1500, n_convs=12,
                                n_files=4, tool_epoch=1, seed=77, **gen_kw)
    dir0, dir1 = str(tmp_path / "src0"), str(tmp_path / "src1")
    _split_by_parity(files, dir0, dir1)
    return files, dir0, dir1


@pytest.mark.usefixtures("ray_session")
def test_multi_source_equals_single_log(tmp_path):
    files, dir0, dir1 = _setup(tmp_path)

    n_total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    cfg_m = JobConfig(lake_dir=str(tmp_path / "lake_m"), num_partitions=4,
                      hash_state=False)
    res = replay_multi(cfg_m, [dir0, dir1])
    assert res["events_in"] == n_total
    assert set(res["sources"]) == {"src0", "src1"}
    assert sum(res["sources"].values()) == n_total

    log = tmp_path / "log"
    log.mkdir()
    for f in files:
        os.link(f, log / Path(f).name)
    cfg_s = JobConfig(changelog_dir=str(log),
                      lake_dir=str(tmp_path / "lake_s"), num_partitions=4,
                      hash_state=False)
    replay(cfg_s)

    got = final_state(cfg_m).to_pandas().reset_index(drop=True)
    want = final_state(cfg_s).to_pandas().reset_index(drop=True)
    assert got.equals(want)

    # idempotent: nothing new → up_to_date, state unchanged
    res2 = replay_multi(cfg_m, [dir0, dir1])
    assert res2["up_to_date"] and res2["events_in"] == 0
    assert final_state(cfg_m).to_pandas().reset_index(drop=True).equals(want)


@pytest.mark.usefixtures("ray_session")
def test_multi_source_incremental_resume(tmp_path):
    files, dir0, dir1 = _setup(tmp_path)
    n_total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    cfg = JobConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4,
                    hash_state=False)
    # hold back the last file of source 1
    held = sorted(Path(dir1).glob("batch-*.parquet"))[-1]
    hidden = held.with_suffix(".hold")
    held.rename(hidden)
    r1 = replay_multi(cfg, [dir0, dir1])
    assert r1["events_in"] < n_total

    # the held file arrives; only IT is ingested on the next pass
    hidden.rename(held)
    r2 = replay_multi(cfg, [dir0, dir1])
    assert r2["files"] == 1
    assert r2["sources"]["src0"] == 0
    assert r1["events_in"] + r2["events_in"] == n_total

    # equals the all-at-once lake
    cfg_all = JobConfig(lake_dir=str(tmp_path / "lake_all"),
                        num_partitions=4, hash_state=False)
    replay_multi(cfg_all, [dir0, dir1])
    assert final_state(cfg).to_pandas().reset_index(drop=True).equals(
        final_state(cfg_all).to_pandas().reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_multi_source_registry_identity(tmp_path):
    _, dir0, dir1 = _setup(tmp_path)
    cfg = JobConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4,
                    hash_state=False)
    replay_multi(cfg, [dir0, dir1], source_names=["a", "b"])

    # reorder / rename / resize the source list → refusal
    for bad_dirs, bad_names in (([dir1, dir0], ["b", "a"]),
                                ([dir0, dir1], ["a", "c"]),
                                ([dir0], ["a"]),
                                ([dir0, dir1, dir0], ["a", "b", "c"])):
        with pytest.raises(ValueError, match="registry mismatch"):
            replay_multi(cfg, bad_dirs, source_names=bad_names)

    # a MOVED directory (same names, same order) is tolerated
    moved = str(tmp_path / "src1_moved")
    os.rename(dir1, moved)
    res = replay_multi(cfg, [dir0, moved], source_names=["a", "b"])
    assert res["up_to_date"]
    reg = json.loads(
        (Path(cfg.checkpoint_dir) / "sources.json").read_text())
    assert reg["sources"][1]["dir"] == str(Path(moved).resolve())

    # duplicate names refused up front
    with pytest.raises(ValueError, match="duplicate"):
        replay_multi(cfg, [dir0, dir0], source_names=["x", "x"])


@pytest.mark.usefixtures("ray_session")
def test_multi_source_append_only_per_source(tmp_path):
    _, dir0, dir1 = _setup(tmp_path)
    cfg = JobConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4,
                    hash_state=False)
    replay_multi(cfg, [dir0, dir1])
    victim = sorted(Path(dir1).glob("batch-*.parquet"))[0]
    t = pq.read_table(victim)
    old_size = os.path.getsize(victim)
    # double the rows so the rewritten file's byte size is guaranteed to
    # move (a 3-row append once landed on the exact committed size)
    pq.write_table(pa.concat_tables([t, t]), victim)
    assert os.path.getsize(victim) != old_size
    with pytest.raises(RuntimeError, match="append-only"):
        replay_multi(cfg, [dir0, dir1])
    # ...but an identically-named committed file in the OTHER source is
    # independent: src0's batch-0000 was never aliased by src1's
    ck = CheckpointStore(cfg.checkpoint_dir)
    names = ck.committed_files()
    assert "src0:batch-0000.parquet" in names
    assert "src1:batch-0000.parquet" in names


@pytest.mark.usefixtures("ray_session")
def test_multi_source_feed_replicate_refuse_bootstrap_works(tmp_path):
    _, dir0, dir1 = _setup(tmp_path)
    cfg = JobConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4,
                    hash_state=False)
    replay_multi(cfg, [dir0, dir1])

    with pytest.raises(FeedMultiSourceError, match="bootstrap_replica"):
        pending_passes(cfg, "worker-a")

    dst = JobConfig(changelog_dir=str(tmp_path / "dst_log"),
                    lake_dir=str(tmp_path / "dst_lake"), num_partitions=4,
                    hash_state=False)
    with pytest.raises(FeedMultiSourceError):
        replicate(cfg, dst, src_consumer="follower")

    # bootstrap exports INTERNAL state (lsn already global) — supported
    boot = JobConfig(changelog_dir=str(tmp_path / "boot_log"),
                     lake_dir=str(tmp_path / "boot_lake"),
                     num_partitions=8, hash_state=False)
    bootstrap_replica(cfg, boot, src_consumer="follower")
    assert final_state(boot).to_pandas().reset_index(drop=True).equals(
        final_state(cfg).to_pandas().reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_multi_source_truncate_resolves_shard_dirs(tmp_path):
    _, dir0, dir1 = _setup(tmp_path)
    cfg = JobConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4,
                    hash_state=False)
    replay_multi(cfg, [dir0, dir1])
    before = final_state(cfg).to_pandas()
    n0 = len(list(Path(dir0).glob("batch-*.parquet")))
    n1 = len(list(Path(dir1).glob("batch-*.parquet")))
    assert n0 and n1
    # no through_seq and no consumers → the safety rail deletes nothing
    assert truncate_log(cfg)["files_deleted"] == 0
    res = truncate_log(
        cfg, through_seq=CheckpointStore(cfg.checkpoint_dir).last_seq())
    assert res["files_deleted"] == n0 + n1
    assert not list(Path(dir0).glob("batch-*.parquet"))
    assert not list(Path(dir1).glob("batch-*.parquet"))
    # the lake is untouched and a later pass is a clean no-op
    assert final_state(cfg).to_pandas().reset_index(drop=True).equals(
        before.reset_index(drop=True))
    assert replay_multi(cfg, [dir0, dir1])["up_to_date"]


@pytest.mark.usefixtures("ray_session")
def test_multi_source_schema_evolution_from_one_shard(tmp_path):
    """`tool` present only in source 1's files (source 0 written without
    the column) — evolution arriving from ONE shard widens the lake."""
    files, dir0, dir1 = _setup(tmp_path)
    for f in Path(dir0).glob("batch-*.parquet"):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["tool"]), f)
    cfg = JobConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4,
                    hash_state=False)
    replay_multi(cfg, [dir0, dir1])
    got = final_state(cfg).to_pandas()
    assert "tool" in got.columns
    # winners that came from source 1 keep their tool values
    assert got["tool"].notna().any()


@pytest.mark.usefixtures("ray_session")
def test_multi_source_task_and_repartition_carries_registry(tmp_path):
    """CLI task dispatch + bulk re-layout: the re-laid-out lake carries
    the source registry and pass checkpoints, so replay_multi on the NEW
    lake resumes incrementally under the SAME namespacing."""
    import dataclasses

    from migration_pair_ray.pipelines.replay import repartition_lake
    from migration_pair_ray.tasks import run_task

    _, dir0, dir1 = _setup(tmp_path)
    cfg = JobConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4,
                    hash_state=False)
    held = sorted(Path(dir1).glob("batch-*.parquet"))[-1]
    hidden = held.with_suffix(".hold")
    held.rename(hidden)
    res = run_task("replay_multi", cfg, sources=f"{dir0},{dir1}")
    assert res["events_in"] > 0 and set(res["sources"]) == {"src0", "src1"}

    new_cfg = dataclasses.replace(cfg, lake_dir=str(tmp_path / "lake8"),
                                  num_partitions=8)
    repartition_lake(cfg, new_cfg)
    assert (Path(new_cfg.checkpoint_dir) / "sources.json").exists()

    # the held-back shard file arrives: only IT is applied, and the new
    # lake equals a from-scratch merge of everything
    hidden.rename(held)
    r2 = run_task("replay_multi", new_cfg, sources=f"{dir0},{dir1}")
    assert r2["files"] == 1 and r2["sources"]["src0"] == 0
    cfg_all = JobConfig(lake_dir=str(tmp_path / "lake_all"),
                        num_partitions=8, hash_state=False)
    replay_multi(cfg_all, [dir0, dir1])
    assert final_state(new_cfg).to_pandas().reset_index(drop=True).equals(
        final_state(cfg_all).to_pandas().reset_index(drop=True))
