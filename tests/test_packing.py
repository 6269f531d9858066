"""Sequence-packing / distributed prefix-scan tests (stages/packing.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from migration_pair_ray.stages.packing import add_token_offsets, pack_bins


def _docs(n=300, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "n_tokens": rng.integers(1, 900, n).astype(np.int64)})


@pytest.mark.usefixtures("ray_session")
def test_offsets_equal_numpy_cumsum():
    df = _docs()
    # several sorted, disjoint blocks (what read_parquet of a sorted table
    # yields)
    blocks = [pa.Table.from_pandas(df.iloc[i:i + 37]) for i in range(0, len(df), 37)]
    ds = ray.data.from_arrow(blocks)
    got = (add_token_offsets(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = np.concatenate([[0], np.cumsum(df["n_tokens"].to_numpy())[:-1]])
    assert got["token_offset"].tolist() == want.tolist()


@pytest.mark.usefixtures("ray_session")
def test_pack_bins_budget_boundaries():
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3, 4],
                       "n_tokens": [100, 924, 1, 2000, 5]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = pack_bins(ds, budget=1024).to_pandas().sort_values("doc_id")
    # offsets: 0, 100, 1024, 1025, 3025 -> bins 0,0,1,1,2
    assert got["bin"].tolist() == [0, 0, 1, 1, 2]


@pytest.mark.usefixtures("ray_session")
def test_overlapping_blocks_rejected():
    a = pa.table({"doc_id": pa.array([0, 5], pa.int64()),
                  "n_tokens": pa.array([1, 1], pa.int64())})
    b = pa.table({"doc_id": pa.array([3, 9], pa.int64()),
                  "n_tokens": pa.array([1, 1], pa.int64())})
    ds = ray.data.from_arrow([a, b])
    with pytest.raises(ValueError, match="overlap"):
        add_token_offsets(ds).materialize()
