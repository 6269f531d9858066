"""HyperLogLog sketch tests: accuracy, mergeability, determinism."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from migration_pair_ray.functions.sketch import (
    approx_distinct,
    approx_distinct_portable,
    hll_estimate,
    hll_estimate_portable,
    hll_merge,
    hll_registers,
    md5_hash64,
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


def test_md5_hash64_matches_duckdb():
    import duckdb
    vals = ["hello", "42", "", "Ünïcode ✓"]
    mine = md5_hash64(vals)
    for v, h in zip(vals, mine):
        duck = duckdb.execute(
            "SELECT ('0x' || substr(md5(?), 1, 16))::UBIGINT", [v]).fetchone()[0]
        assert int(h) == duck, v


def test_portable_estimate_matches_sql_mirror_both_branches():
    """The DuckDB mirror of hll_estimate_portable must agree bit-for-bit
    on BOTH branches: small-range (linear counting) and the raw HLL
    estimator."""
    import duckdb
    for true_n in (300, 40_000):   # m=1024: 300 → ln branch, 40k → raw
        vals = [f"v{i}" for i in range(true_n)]
        est = hll_estimate_portable(hll_registers(vals, p=10,
                                                  hash64=md5_hash64))
        duck = duckdb.execute("""
            WITH v AS (SELECT DISTINCT s FROM (SELECT unnest(?) AS s)),
            h AS (SELECT ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h FROM v),
            r AS (SELECT h >> 54 AS idx, h % (1::UBIGINT << 54) AS rest FROM h),
            rho AS (SELECT idx, CASE WHEN rest = 0 THEN 55
                                     ELSE 55 - length(bin(rest)) END AS rho
                    FROM r),
            reg AS (SELECT idx, MAX(rho) AS reg FROM rho GROUP BY idx),
            agg AS (SELECT SUM(1::HUGEINT << (64 - reg)) AS nzsum,
                           COUNT(*) AS nz FROM reg),
            est AS (SELECT 0.7213::DOUBLE / (1 + 1.079::DOUBLE / 1024)
                             * 1024 * 1024 * CAST(1::HUGEINT << 64 AS DOUBLE)
                             / CAST(nzsum + (1024 - nz) * (1::HUGEINT << 64)
                                    AS DOUBLE) AS raw,
                           1024 - nz AS zeros FROM agg)
            SELECT CAST(FLOOR(CASE WHEN raw <= 2.5 * 1024 AND zeros > 0
                              THEN 1024 * ln(1024 / CAST(zeros AS DOUBLE))
                              ELSE raw END) AS BIGINT) FROM est""",
            [vals]).fetchone()[0]
        assert est == duck, (true_n, est, duck)
        assert abs(est - true_n) / true_n < 0.1, (true_n, est)


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_portable_on_dataset():
    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])
    est, n_rows = approx_distinct_portable(ds, "event_id", p=10)
    assert n_rows == 1000
    assert abs(est - 1000) / 1000 < 0.1, est


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


def test_grouped_approx_distinct_portable_accuracy_and_merge():
    """Per-group estimates match a single-group run of the same values
    (block-layout invariance) and stay within HLL error of the truth."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from migration_pair_ray.functions.sketch import (
        approx_distinct_portable, grouped_approx_distinct_portable)
    rng = np.random.default_rng(5)
    n = 30_000
    g = np.where(rng.random(n) < 0.5, "a", "b")
    v = np.where(g == "a", rng.integers(0, 500, n),
                 rng.integers(10_000, 14_000, n))
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(g.tolist()), "v": pa.array(v, pa.int64())}))
    out = (grouped_approx_distinct_portable(ds, "g", "v", p=10)
           .to_pandas().set_index("g"))
    true_a = len(np.unique(v[g == "a"]))
    true_b = len(np.unique(v[g == "b"]))
    assert abs(out.loc["a", "approx_distinct"] - true_a) / true_a < 0.15
    assert abs(out.loc["b", "approx_distinct"] - true_b) / true_b < 0.15
    assert out["n_rows"].sum() == n
    # merge correctness: group 'a' alone == the grouped run's 'a' row
    only_a = ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("g"), "a")),
        batch_format="pyarrow")
    est_a, n_a = approx_distinct_portable(only_a, "v", p=10)
    assert est_a == out.loc["a", "approx_distinct"]
    assert n_a == out.loc["a", "n_rows"]


def test_heavy_hitters_exact_vs_duckdb_and_superset_guarantee():
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data
    from migration_pair_ray.functions.sketch import heavy_hitters
    rng = np.random.default_rng(11)
    # skewed: value 0 is ~30%, 1 is ~10%, the rest a long uniform tail
    r = rng.random(50_000)
    v = np.where(r < 0.3, 0, np.where(r < 0.4, 1,
                 rng.integers(2, 5_000, 50_000))).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v)}))
    got = (heavy_hitters(ds, "v", num=1, den=20)   # phi = 5%
           .to_pandas().sort_values("v").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT v, COUNT(*) AS cnt FROM t GROUP BY v
        HAVING COUNT(*) * 20 >= (SELECT COUNT(*) FROM t)
        ORDER BY v""".replace("t", "df"),
        ).df() if False else None
    import pandas as pd
    df = pd.DataFrame({"v": v})
    want = duckdb.sql("""
        SELECT v, COUNT(*) AS cnt FROM df GROUP BY v
        HAVING COUNT(*) * 20 >= (SELECT COUNT(*) FROM df)
        ORDER BY v""").df()
    assert got["v"].tolist() == want["v"].tolist()
    assert got["cnt"].tolist() == want["cnt"].tolist()
    assert got["v"].tolist() == [0, 1]          # the planted heavies


def test_heavy_hitters_no_hitters_and_nulls():
    import pyarrow as pa
    import ray.data
    from migration_pair_ray.functions.sketch import heavy_hitters
    ds = ray.data.from_arrow(pa.table({
        "v": pa.array(list(range(100)) + [None] * 10, pa.int64())}))
    out = heavy_hitters(ds, "v", num=1, den=50).to_pandas()
    assert len(out) == 0          # uniform: nothing reaches 2%


def test_cm_partial_additive_merge():
    """Registers over split batches sum to the whole-batch registers."""
    from migration_pair_ray.functions.sketch import cm_partial
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 50, 400)
    u, c = np.unique([str(v) for v in vals], return_counts=True)
    whole = cm_partial(u, c, w_p=6, d=3)
    u1, c1 = np.unique([str(v) for v in vals[:137]], return_counts=True)
    u2, c2 = np.unique([str(v) for v in vals[137:]], return_counts=True)
    split = cm_partial(u1, c1, w_p=6, d=3) + cm_partial(u2, c2, w_p=6, d=3)
    np.testing.assert_array_equal(whole, split)


@pytest.mark.usefixtures("ray_session")
def test_cm_count_bounds():
    """Estimates never undercount; a wide sketch is exact; a cramped one
    overcounts at least one probe (collisions are the point)."""
    from migration_pair_ray.functions.sketch import cm_count_portable
    import pyarrow as pa
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 200, 3000)
    exact = {int(k): int(n) for k, n in
             zip(*np.unique(vals, return_counts=True))}
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    ds = ds.repartition(5)
    probes = list(range(10))
    wide = dict(cm_count_portable(ds, "v", probes, w_p=14, d=4))
    assert wide == {p: exact[p] for p in probes}
    tight = dict(cm_count_portable(ds, "v", probes, w_p=4, d=2))
    assert all(tight[p] >= exact[p] for p in probes)
    assert any(tight[p] > exact[p] for p in probes)
