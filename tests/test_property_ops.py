"""Hypothesis property tests for the round-3 operators: vectorized
sessionization and the distributed prefix-scan packing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

import ray.data

from migration_pair_ray.stages.packing import add_token_offsets
from migration_pair_ray.stages.windows import sessionize_counts


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 6),          # user id
                          st.integers(0, 100_000)),   # ts seconds
                min_size=1, max_size=120),
       st.integers(60, 5_000))                        # gap seconds
def test_sessionize_counts_matches_pandas(events, gap_s):
    df = pd.DataFrame(events, columns=["user_id", "sec"])
    df["ts"] = pd.to_datetime(df["sec"], unit="s")
    ds = ray.data.from_pandas(df[["user_id", "ts"]])
    got = (sessionize_counts(ds, "user_id", "ts", gap_s=gap_s)
           .to_pandas().sort_values("user_id").reset_index(drop=True))

    def oracle(g):
        g = g.sort_values("ts")
        return pd.Series({
            "n_sessions": int((g["ts"].diff()
                               > pd.Timedelta(seconds=gap_s)).sum()) + 1,
            "n_events": len(g)})

    want = (df.groupby("user_id").apply(oracle, include_groups=False)
            .reset_index().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 500), min_size=1, max_size=200),
       st.integers(1, 40))
def test_token_offsets_match_cumsum(counts, block_rows):
    n = len(counts)
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "n_tokens": np.asarray(counts, dtype=np.int64)})
    blocks = [pa.Table.from_pandas(df.iloc[i:i + block_rows])
              for i in range(0, n, block_rows)]
    ds = ray.data.from_arrow(blocks)
    got = (add_token_offsets(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = np.concatenate([[0], np.cumsum(df["n_tokens"].to_numpy())[:-1]])
    assert got["token_offset"].tolist() == want.tolist()


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5),            # key
                          st.integers(0, 2_000)),       # ts (int µs-ish)
                min_size=0, max_size=80),
       st.lists(st.tuples(st.integers(0, 6),
                          st.integers(0, 2_000),
                          st.integers(0, 99)),          # right payload
                min_size=0, max_size=80),
       st.integers(-300, 0), st.integers(0, 300))
def test_range_join_matches_pandas(lefts, rights, lo, hi):
    """range_join == the quadratic pandas oracle for arbitrary key/ts
    multisets (duplicates, one-sided keys, empty sides) and windows."""
    from migration_pair_ray.stages.join import range_join
    ldf = pd.DataFrame(lefts, columns=["k", "ts"]).astype(np.int64)
    rdf = pd.DataFrame(rights, columns=["k", "ts", "pay"]).astype(np.int64)
    if ldf.empty:
        ldf = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                            "ts": pd.Series([], dtype=np.int64)})
    if rdf.empty:
        rdf = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                            "ts": pd.Series([], dtype=np.int64),
                            "pay": pd.Series([], dtype=np.int64)})
    got = range_join(ray.data.from_pandas(ldf), ray.data.from_pandas(rdf),
                     key="k", ts_col="ts",
                     lo_s=lo / 1e6, hi_s=hi / 1e6,   # int ts treated as µs
                     how="inner", n_coarse=4).to_pandas()
    m = ldf.merge(rdf, on="k", suffixes=("", "_r"))
    m = m[(m["ts_r"] >= m["ts"] + lo) & (m["ts_r"] <= m["ts"] + hi)]
    want = (m[["k", "ts", "ts_r", "pay"]]
            .sort_values(["k", "ts", "ts_r", "pay"]).reset_index(drop=True))
    if len(got) == 0 and len(want) == 0:
        return    # an all-empty result may carry no schema to sort on
    got = (got.sort_values(["k", "ts", "ts_r", "pay"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "ts", "ts_r", "pay"]], want,
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 1000),
                          st.integers(-50, 50)),
                min_size=1, max_size=100))
def test_grouped_lead_matches_pandas(rows):
    from migration_pair_ray.stages.analytic import grouped_lead
    df = pd.DataFrame(rows, columns=["k", "o", "v"]).astype(np.int64)
    # unique order key per key group (lead is order-deterministic)
    df = df.drop_duplicates(["k", "o"]).reset_index(drop=True)
    got = (grouped_lead(ray.data.from_pandas(df), "k", ["o"], "v",
                        lead_col="nxt", n_coarse=4)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    want = df.sort_values(["k", "o"]).reset_index(drop=True)
    want["nxt"] = want.groupby("k")["v"].shift(-1)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
