"""HyperLogLog sketch tests: accuracy, mergeability, determinism."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from migration_pair_ray.functions.sketch import (
    approx_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def test_hll_accuracy_bands():
    rng = np.random.default_rng(3)
    for true_n in (50, 1_000, 100_000):
        vals = [f"user-{i}" for i in range(true_n)]
        est = hll_estimate(hll_registers(vals, p=12))
        rel = abs(est - true_n) / true_n
        assert rel < 0.05, (true_n, est)


def test_hll_merge_equals_union_and_is_idempotent():
    a = [f"a{i}" for i in range(3000)]
    b = [f"b{i}" for i in range(2000)] + a[:500]   # overlap
    ra, rb = hll_registers(a), hll_registers(b)
    merged = hll_merge(ra, rb)
    np.testing.assert_array_equal(merged, hll_registers(a + b))
    np.testing.assert_array_equal(hll_merge(merged, merged), merged)  # idempotent
    np.testing.assert_array_equal(hll_merge(ra, rb), hll_merge(rb, ra))


def test_hll_deterministic_across_batching():
    vals = [f"x{i}" for i in range(5000)]
    one = hll_registers(vals)
    parts = hll_merge(hll_registers(vals[:1234]), hll_registers(vals[1234:]))
    np.testing.assert_array_equal(one, parts)


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_on_dataset():
    sf = "/root/testdata/sf0.01"
    ds = ray.data.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
    import duckdb
    true_n = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    est = approx_distinct(ds, "user_id")
    assert abs(est - true_n) / true_n < 0.05, (est, true_n)
