"""stages/sampling.py: deterministic hash Bernoulli + stratified quota
sampling — reproducibility across runs/block layouts and exact SQL
equivalence in md5 mode."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import pyarrow as pa
import ray.data

from migration_pair_ray.functions.sketch import md5_hash64
from migration_pair_ray.stages.sampling import hash_sample, stratified_sample

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_hash_sample_deterministic_and_near_rate():
    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["event_id"])
    total = ds.count()
    picks = []
    for repartition in (None, 7):
        d = ds.repartition(repartition) if repartition else ds
        got = (hash_sample(d, "event_id", 10).to_pandas()["event_id"]
               .sort_values().tolist())
        picks.append(got)
    # identical picks regardless of block layout
    assert picks[0] == picks[1]
    # Bernoulli 10% of a uniform key: expect within a loose band
    frac = len(picks[0]) / total
    assert 0.05 < frac < 0.15


@pytest.mark.usefixtures("ray_session")
def test_hash_sample_md5_mode_matches_sql():
    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["event_id", "event_type"])
    got = (hash_sample(ds, "event_id", 5, hash64=md5_hash64)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT event_id, event_type
        FROM read_parquet('{SF}/events.parquet')
        WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 16))
                  ::UBIGINT % 100 < 5
        ORDER BY event_id""").df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["event_type"].tolist() == want["event_type"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_quota_and_rank():
    df = pd.DataFrame({
        "s": ["a"] * 50 + ["b"] * 5 + ["c"] * 1,
        "k": np.arange(56)})
    out = (stratified_sample(ray.data.from_pandas(df), "s", "k", n=10)
           .to_pandas().sort_values(["s", "rank"]).reset_index(drop=True))
    counts = out.groupby("s")["k"].count().to_dict()
    # quota capped at n; small strata keep everything
    assert counts == {"a": 10, "b": 5, "c": 1}
    # rank is 0-based and dense per stratum
    for s, g in out.groupby("s"):
        assert g["rank"].tolist() == list(range(len(g)))
    # helper column must not leak
    assert "__h" not in out.columns


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_block_layout_invariant():
    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["event_id", "event_type"])
    a = (stratified_sample(ds, "event_type", "event_id", n=7)
         .to_pandas().sort_values(["event_type", "rank"])
         .reset_index(drop=True))
    b = (stratified_sample(ds.repartition(13), "event_type", "event_id", n=7)
         .to_pandas().sort_values(["event_type", "rank"])
         .reset_index(drop=True))
    assert a["event_id"].tolist() == b["event_id"].tolist()


def test_shuffle_assign_matches_sql_row_number():
    import duckdb
    from migration_pair_ray.functions.sketch import md5_hash64
    from migration_pair_ray.stages.sampling import shuffle_assign
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    got = (shuffle_assign(ds, "doc_id", 8, hash64=md5_hash64)
           .sort("doc_id").to_pandas())
    want = duckdb.sql(f"""
        WITH h AS (SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                       ::UBIGINT hh
                   FROM read_parquet('{SF}/documents.parquet')),
        r AS (SELECT doc_id, row_number() OVER (ORDER BY hh) - 1 rnk FROM h)
        SELECT doc_id, rnk % 8 shard, rnk // 8 pos FROM r
        ORDER BY doc_id""").df()
    assert got["shard"].tolist() == want["shard"].tolist()
    assert got["pos"].tolist() == want["pos"].tolist()


def test_shuffle_assign_shards_balanced_and_complete():
    from migration_pair_ray.stages.sampling import shuffle_assign
    ds = ray.data.from_arrow(pa.table({"k": list(range(100))}))
    out = shuffle_assign(ds, "k", 4).to_pandas()
    # every rank 0..99 dealt exactly once; shards balanced to ±0
    assert sorted(out["shard"] + 4 * out["pos"]) == list(range(100))
    assert out["shard"].value_counts().tolist() == [25, 25, 25, 25]


@pytest.mark.usefixtures("ray_session")
def test_mixture_sample_rates_and_unknown_strata():
    from migration_pair_ray.stages.sampling import mixture_sample
    n = 4000
    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "src": pa.array(np.where(np.arange(n) % 3 == 0, "a",
                        np.where(np.arange(n) % 3 == 1, "b", "zzz"))),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    got = mixture_sample(ds, "src", "k", {"a": 100, "b": 25}).to_pandas()
    by = got.groupby("src").size()
    assert by.get("zzz", 0) == 0                    # absent stratum dropped
    assert by["a"] == (np.arange(n) % 3 == 0).sum()  # 100% keeps all
    assert 0.15 < by["b"] / (n / 3) < 0.35           # ~25%
    # determinism: same pick on a different partitioning
    got2 = mixture_sample(ray.data.from_arrow(t).repartition(9),
                          "src", "k", {"a": 100, "b": 25}).to_pandas()
    assert sorted(got2["k"]) == sorted(got["k"])


@pytest.mark.usefixtures("ray_session")
def test_global_ranks_matches_row_number():
    from migration_pair_ray.stages.packing import global_ranks
    rng = np.random.default_rng(2)
    keys = rng.permutation(3000).astype(np.int64)
    ds = (ray.data.from_arrow(pa.table({"k": pa.array(keys)}))
          .repartition(7).sort("k"))
    got = global_ranks(ds, "k").sort("k").to_pandas()
    assert got["rank"].tolist() == list(range(3000))
    assert got["k"].tolist() == sorted(keys.tolist())
