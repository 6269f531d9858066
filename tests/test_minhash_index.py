"""Incremental MinHash-LSH index (stages/dedup.build_minhash_index /
minhash_probe_incremental): a new batch probes a persisted corpus index —
no corpus re-sketch — and the verified pairs must EQUAL the brute-force
signature-threshold ground truth (banding recall at est ≥ 0.8 with 64
perms / 16 bands is pigeonhole-exact: ≥52 equal positions can break at
most 12 of 16 bands)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from migration_pair_ray.functions.hashing import MinHasher
from migration_pair_ray.stages.dedup import (
    build_minhash_index,
    minhash_probe_incremental,
)


def _corpus(seed: int = 5, n_base: int = 40):
    """Corpus docs 0..n_base-1; new docs n_base..: some near-copies of
    corpus docs (one word mutated), some unique."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(200)]
    base = [" ".join(rng.choice(words, 30)) for _ in range(n_base)]
    new, planted = [], []
    nid = n_base
    for i in range(0, n_base, 4):          # every 4th corpus doc gets a copy
        toks = base[i].split()
        toks[5] = "MUT"
        new.append(" ".join(toks))
        planted.append((i, nid))
        nid += 1
    for _ in range(10):                     # unique new docs
        new.append(" ".join(rng.choice(words, 30)))
        nid += 1
    return base, new, planted


def _truth(base, new, n_base, threshold=0.8):
    mh = MinHasher(n_perm=64, k=5)
    sb = mh.signatures(base)
    sn = mh.signatures(new)
    out = []
    for i in range(len(base)):
        sims = (sb[i] == sn).mean(axis=1)
        for j in np.flatnonzero(sims >= threshold):
            out.append((i, n_base + int(j)))
    return sorted(out)


@pytest.mark.usefixtures("ray_session")
def test_probe_equals_signature_truth(tmp_path):
    base, new, planted = _corpus()
    n_base = len(base)
    idx = str(tmp_path / "mh_idx")
    corpus_ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n_base), pa.int64()),
        "text": pa.array(base)}))
    new_ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n_base, n_base + len(new)), pa.int64()),
        "text": pa.array(new)}))

    assert build_minhash_index(corpus_ds, idx, num_buckets=8) == n_base
    pairs = minhash_probe_incremental(new_ds, idx, threshold=0.8)
    got = sorted(zip(pairs.column("a").to_pylist(),
                     pairs.column("b").to_pylist()))
    assert got == _truth(base, new, n_base)
    # the planted near-copies are all found
    assert set(planted) <= set(got)
    # estimated sims are in range and high for planted pairs
    assert all(0.8 <= s <= 1.0 for s in pairs.column("sim").to_pylist())

    # probe is read-only + deterministic: identical second run
    pairs2 = minhash_probe_incremental(new_ds, idx, threshold=0.8)
    assert pairs.equals(pairs2)


@pytest.mark.usefixtures("ray_session")
def test_probe_no_matches_and_rebuild(tmp_path):
    base, new, _ = _corpus(seed=9)
    n_base = len(base)
    idx = str(tmp_path / "mh_idx")
    corpus_ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n_base), pa.int64()),
        "text": pa.array(base)}))
    build_minhash_index(corpus_ds, idx, num_buckets=8)
    # a batch of entirely fresh docs matches nothing
    rng = np.random.default_rng(123)
    words = [f"q{i}" for i in range(300)]
    fresh = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(1000, 1015), pa.int64()),
        "text": pa.array([" ".join(rng.choice(words, 25))
                          for _ in range(15)])}))
    pairs = minhash_probe_incremental(fresh, idx, threshold=0.8)
    assert pairs.num_rows == 0
    # rebuild over corpus + accepted batch folds them in: a near-copy of
    # a fresh doc now matches
    fresh_tbl = pa.table({
        "doc_id": pa.array(range(1000, 1015), pa.int64()),
        "text": fresh.to_pandas()["text"].tolist()})
    both = rd.from_arrow(pa.concat_tables([
        pa.table({"doc_id": pa.array(range(n_base), pa.int64()),
                  "text": pa.array(base)}), fresh_tbl]))
    idx2 = str(tmp_path / "mh_idx2")
    build_minhash_index(both, idx2, num_buckets=8)
    toks = fresh_tbl.column("text")[0].as_py().split()
    toks[3] = "MUT"
    probe = rd.from_arrow(pa.table({
        "doc_id": pa.array([5000], pa.int64()),
        "text": pa.array([" ".join(toks)])}))
    hits = minhash_probe_incremental(probe, idx2, threshold=0.8)
    assert (hits.num_rows == 1
            and hits.column("a")[0].as_py() == 1000
            and hits.column("b")[0].as_py() == 5000)
