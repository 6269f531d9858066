"""Single-writer lease (state/lock.py) and its wiring into the mutating
jobs (replay / split / merge / vacuum / repartition)."""

import json
import os
import time
from pathlib import Path

import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.replay import replay
from migration_pair_ray.state.lock import WriterLease, WriterLocked


def _foreign_lock(lake_dir: str, ttl_s: float = 1800.0) -> str:
    """A lock held by a (simulated) other process."""
    Path(lake_dir).mkdir(parents=True, exist_ok=True)
    p = str(Path(lake_dir) / WriterLease.FILE)
    with open(p, "w") as f:
        json.dump({"owner": "other-job", "pid": os.getpid() + 1,
                   "host": "other-host", "acquired_at": "t", "ttl_s": ttl_s}, f)
    return p


def test_exclusive_and_reentrant(tmp_path):
    lake = str(tmp_path / "lake")
    a = WriterLease(lake, "a")
    with a:
        # reentrant within the process: same holder may nest
        with WriterLease(lake, "a-again"):
            assert a.holder()["owner"] == "a"
        # still held after the inner release
        assert Path(a.path).exists()
    assert not Path(a.path).exists()


def test_foreign_holder_blocks_and_stale_takeover(tmp_path):
    lake = str(tmp_path / "lake")
    _foreign_lock(lake, ttl_s=1800.0)
    with pytest.raises(WriterLocked, match="other-job"):
        WriterLease(lake, "b").acquire()
    # expire it: age the file past a tiny ttl
    _foreign_lock(lake, ttl_s=0.01)
    time.sleep(0.05)
    lease = WriterLease(lake, "b").acquire()
    assert lease.holder()["owner"] == "b"
    lease.release()


def test_release_on_exception(tmp_path):
    lake = str(tmp_path / "lake")
    with pytest.raises(RuntimeError, match="boom"):
        with WriterLease(lake, "c"):
            raise RuntimeError("boom")
    assert WriterLease(lake, "d").acquire().holder()["owner"] == "d"


@pytest.mark.usefixtures("ray_session")
def test_replay_blocked_by_foreign_writer(tmp_lake):
    log, lake = tmp_lake
    generate_change_log(log, n_events=300, n_convs=4, n_files=1,
                        tool_epoch=0, seed=97)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=2,
                    hash_state=False)
    _foreign_lock(lake)
    with pytest.raises(WriterLocked):
        replay(cfg)
    os.unlink(str(Path(lake) / WriterLease.FILE))
    s = replay(cfg)
    assert not s["up_to_date"]
    # the lease is released after the pass; maintenance jobs re-acquire
    assert not (Path(lake) / WriterLease.FILE).exists()
    from migration_pair_ray.pipelines.compact import vacuum
    assert vacuum(cfg, 0)["partitions"] >= 1


@pytest.mark.usefixtures("ray_session")
def test_auto_split_reuses_replay_lease(tmp_lake):
    """auto_split_max_rows triggers split_partition INSIDE the replay's
    lease — reentrancy must let it through."""
    log, lake = tmp_lake
    generate_change_log(log, n_events=1200, n_convs=6, n_files=1,
                        tool_epoch=0, hot_frac=0.6, seed=101)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=2,
                    hash_state=False, auto_split_max_rows=50)
    s = replay(cfg)
    assert s["splits"] >= 1
    assert not (Path(lake) / WriterLease.FILE).exists()


def test_heartbeat_keeps_small_ttl_lease_alive(tmp_path):
    """A live holder with a tiny ttl is renewed by the heartbeat thread —
    the lock never goes stale while the holder runs; once renewals stop
    (the crash case), it expires after the ttl.  (An in-process 'other
    writer' can't probe this via acquire(): same-pid callers are
    reentrant by design, so staleness is asserted directly.)"""
    lake = str(tmp_path / "lake")
    lease = WriterLease(lake, "long-pass", ttl_s=1.5).acquire()
    try:
        time.sleep(2.5)                    # > ttl; heartbeat every ~1s
        assert not lease._is_stale()       # renewed: a pass can outlive ttl
        WriterLease._heartbeats[lease.path].set()   # simulate a crash
        time.sleep(2.0)
        assert lease._is_stale()           # no renewals -> expires
    finally:
        lease.release()
