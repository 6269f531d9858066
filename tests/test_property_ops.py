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
