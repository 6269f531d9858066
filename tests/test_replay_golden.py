"""Golden end-to-end acceptance tests (SURVEY.md §5.2-5.4): replay a
deterministic synthetic change log and compare the final lake state against
a single-process DuckDB oracle applying the same LWW rule; plus
crash/resume and arrival-permutation invariance at the pipeline level."""

import glob
import os

import duckdb
import pandas as pd
import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.replay import final_state, replay

ORACLE = """
WITH ch AS (SELECT * FROM read_parquet('{log}/*.parquet', union_by_name=true)),
w AS (SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) rn FROM ch)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM w WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
"""


def oracle_df(log_dir: str) -> pd.DataFrame:
    return duckdb.sql(ORACLE.format(log=log_dir)).df()


def assert_matches_oracle(cfg: JobConfig, log_dir: str):
    got = final_state(cfg).to_pandas().reset_index(drop=True)
    want = oracle_df(log_dir).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_golden_replay_matches_duckdb_oracle(tmp_lake):
    log, lake = tmp_lake
    generate_change_log(log, n_events=1200, n_convs=18, n_files=4,
                        tool_epoch=2, shuffle_window=250, seed=42)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=8)
    s = replay(cfg)
    assert s["events_in"] > 1200  # includes replayed duplicates
    assert s["partitions"] >= 1
    assert_matches_oracle(cfg, log)


@pytest.mark.usefixtures("ray_session")
def test_rerun_is_noop_and_incremental_tail_applies(tmp_lake):
    log, lake = tmp_lake
    generate_change_log(log, n_events=600, n_convs=10, n_files=2, seed=1)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=4)
    replay(cfg)
    assert replay(cfg)["up_to_date"]
    # new change files arrive (later epochs, later lsn space via new seed dir)
    extra = os.path.join(os.path.dirname(log), "extra")
    generate_change_log(extra, n_events=400, n_convs=10, n_files=2,
                        tool_epoch=0, seed=2)
    for i, p in enumerate(sorted(glob.glob(f"{extra}/*.parquet"))):
        os.rename(p, os.path.join(log, f"batch-{10 + i:05d}-" +
                                  os.path.basename(p).split("-", 2)[2]))
    s = replay(cfg)
    assert s["files"] == 2 and not s["up_to_date"]
    assert_matches_oracle(cfg, log)


@pytest.mark.usefixtures("ray_session")
def test_crash_resume_bit_identical(tmp_lake):
    log, lake = tmp_lake
    generate_change_log(log, n_events=800, n_convs=12, n_files=3, seed=3)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=6)
    replay(cfg)
    import hashlib, pathlib
    def state_hashes():
        out = {}
        for p in sorted(pathlib.Path(lake).glob("part=*/state-*.parquet")):
            out[str(p)] = hashlib.sha256(p.read_bytes()).hexdigest()
        return out
    before = state_hashes()
    # simulate dying between last partition commit and the pass checkpoint
    ck = sorted(pathlib.Path(lake).glob("_checkpoint/pass-*.json"))
    ck[-1].unlink()
    s = replay(cfg)
    assert s["skipped_partitions"] == s["partitions"]
    assert state_hashes() == before  # bit-for-bit identical state files
    assert_matches_oracle(cfg, log)


@pytest.mark.usefixtures("ray_session")
def test_arrival_permutation_invariance(tmp_lake):
    """Same event set, different file/arrival layout ⇒ identical final state."""
    log, lake = tmp_lake
    base = os.path.dirname(log)
    a, b = os.path.join(base, "la"), os.path.join(base, "lb")
    # tool_epoch=0 in both: identical delivered payloads, different
    # file count / arrival shuffle only
    generate_change_log(a, n_events=700, n_convs=9, n_files=2,
                        tool_epoch=0, shuffle_window=0, seed=5)
    generate_change_log(b, n_events=700, n_convs=9, n_files=7,
                        tool_epoch=0, shuffle_window=200, seed=5)
    dfa = None
    for i, log_dir in enumerate((a, b)):
        cfg = JobConfig(changelog_dir=log_dir, lake_dir=os.path.join(base, f"lk{i}"),
                        num_partitions=5)
        replay(cfg)
        df = final_state(cfg).to_pandas().reset_index(drop=True)
        if dfa is None:
            dfa = df
        else:
            pd.testing.assert_frame_equal(dfa, df, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_salted_key_mode_same_state(tmp_lake):
    log, lake = tmp_lake
    generate_change_log(log, n_events=900, n_convs=8, n_files=3,
                        hot_frac=0.5, seed=6)
    out = {}
    for mode in ("conv", "key"):
        cfg = JobConfig(changelog_dir=log, lake_dir=f"{lake}-{mode}",
                        num_partitions=6, partition_mode=mode)
        replay(cfg)
        out[mode] = final_state(cfg).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(out["conv"], out["key"], check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_lost_partition_manifest_recovers(tmp_lake):
    """A partition whose manifest never landed (crash before its commit)
    is re-merged from the change files on the next replay; committed
    partitions are skipped; final state still matches the oracle."""
    import pathlib
    log, lake = tmp_lake
    generate_change_log(log, n_events=600, n_convs=10, n_files=2,
                        tool_epoch=1, seed=31)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=5)
    replay(cfg)
    # simulate: partition 2's commit was lost, pass checkpoint never written
    manifests = sorted(pathlib.Path(lake).glob("_manifest/part-*.json"))
    manifests[2].unlink()
    for ck in pathlib.Path(lake).glob("_checkpoint/pass-*.json"):
        ck.unlink()
    s = replay(cfg)
    assert s["skipped_partitions"] == s["partitions"] - 1
    assert_matches_oracle(cfg, log)


ADVERSARIAL = [
    # heavy replayed duplicates + bursty arrival
    dict(n_events=900, n_convs=8, n_files=5, dup_frac=0.4, burst_max=8,
         shuffle_window=400, tool_epoch=1, seed=71),
    # delete-heavy log (tombstone churn)
    dict(n_events=900, n_convs=8, n_files=3, delete_frac=0.5,
         update_frac=0.3, tool_epoch=2, seed=72),
    # one conversation holds ~70% of events, salted layout
    dict(n_events=1200, n_convs=6, n_files=4, hot_frac=0.7,
         shuffle_window=600, seed=73),
    # every file pre-evolution (tool column never arrives)
    dict(n_events=600, n_convs=8, n_files=3, tool_epoch=99, seed=74),
    # single key space: all events hit few keys, maximal LWW contention
    dict(n_events=1000, n_convs=2, turns_per_conv=3, n_files=4,
         dup_frac=0.2, shuffle_window=500, seed=75),
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("gen_kw", ADVERSARIAL,
                         ids=["dup-burst", "delete-heavy", "hot-conv",
                              "no-evolution", "tiny-keyspace"])
def test_adversarial_generator_matrix(tmp_lake, gen_kw):
    """Acceptance matrix over adversarial log shapes: heavy duplicates,
    tombstone churn, extreme skew, missing schema evolution, and maximal
    per-key contention — every shape must match the DuckDB LWW oracle."""
    import duckdb as _duck
    log, lake = tmp_lake
    generate_change_log(log, **gen_kw)
    mode = "key" if gen_kw.get("hot_frac", 0) > 0.5 else "conv"
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=5,
                    partition_mode=mode, merge_chunk_rows=101)
    replay(cfg)
    if gen_kw.get("tool_epoch", 2) > gen_kw["n_files"]:
        # no file ever carries `tool`: the engine (correctly) emits no such
        # column, so the oracle must not select it either
        got = final_state(cfg).to_pandas().reset_index(drop=True)
        assert "tool" not in got.columns
        want = _duck.sql(ORACLE.replace(", tool,", ",").format(log=log)
                         ).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    else:
        assert_matches_oracle(cfg, log)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("gen_kw", ADVERSARIAL,
                         ids=["dup-burst", "delete-heavy", "hot-conv",
                              "no-evolution", "tiny-keyspace"])
def test_adversarial_matrix_with_split_and_chunked_state(tmp_lake, tmp_path,
                                                         gen_kw):
    """The same adversarial log shapes, but composed with the round-3
    lifecycle features: chunked state layout from the start, a partition
    SPLIT between the first and second half of the log, and the remaining
    files replayed into the split lake — every shape must still match the
    DuckDB LWW oracle."""
    import os
    import pathlib
    import duckdb as _duck
    from migration_pair_ray.pipelines.compact import split_partition
    from migration_pair_ray.state.manifest import LakeMeta, ManifestStore

    log, lake = tmp_lake
    staging = str(tmp_path / "all")
    generate_change_log(staging, **gen_kw)
    files = sorted(pathlib.Path(staging).glob("batch-*.parquet"))
    half = max(1, len(files) // 2)
    for f in files[:half]:
        os.link(f, pathlib.Path(log) / f.name)

    mode = "key" if gen_kw.get("hot_frac", 0) > 0.5 else "conv"
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=5,
                    partition_mode=mode, merge_chunk_rows=101,
                    state_chunk_rows=50, hash_state=False)
    replay(cfg)

    store = ManifestStore(cfg.manifest_dir)
    sizes = {p: store.read(p)["row_count"]
             for p in LakeMeta(cfg.lake_dir).active_partition_ids()
             if store.read(p)}
    hot = max(sizes, key=sizes.get)
    s = split_partition(cfg, hot, fanout=2)
    assert not s["already_split"]

    for f in files[half:]:
        os.link(f, pathlib.Path(log) / f.name)
    replay(cfg)

    if gen_kw.get("tool_epoch", 2) > gen_kw["n_files"]:
        got = final_state(cfg).to_pandas().reset_index(drop=True)
        assert "tool" not in got.columns
        want = _duck.sql(ORACLE.replace(", tool,", ",").format(log=log)
                         ).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    else:
        assert_matches_oracle(cfg, log)
