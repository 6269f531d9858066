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


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 80),          # user_id
                          st.sampled_from(["view", "click", "purchase",
                                           "error", "signup"]),
                          st.integers(0, 40),          # props key
                          st.integers(0, 100_000)),    # ts seconds
                min_size=1, max_size=150),
       st.integers(0, 100_000))                        # t1 cutoff seconds
def test_cdc_state_diff_matches_pandas(rows, t1_s):
    """cdc_state_diff's one-pass two-cutoff classification == a brute-force
    pandas reconstruction-and-outer-merge, on random change streams
    (ts ties, tombstone flips, keys absent from one side, tool-evolution
    nulling all exercised)."""
    import tempfile
    import pyarrow.parquet as pq
    from migration_pair_ray.pipelines.queries import cdc_state_diff

    n = len(rows)
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "k", "sec"])
    df["event_id"] = np.arange(n, dtype=np.int64)
    df["props"] = '{"k": ' + df["k"].astype(str) + "}"
    df["ts"] = pd.to_datetime(df["sec"], unit="s")
    tmp = tempfile.mkdtemp(prefix="mpr_prop_sd_")
    pq.write_table(pa.Table.from_pandas(
        df[["event_id", "ts", "user_id", "event_type", "props"]],
        preserve_index=False), f"{tmp}/events.parquet")

    t1_us = t1_s * 1_000_000
    got = cdc_state_diff(tmp, t1_us=t1_us).to_pandas()
    if got.empty:                      # all-tombstone stream: no columns
        got = pd.DataFrame({"diff_class": pd.Series(dtype=object),
                            "n_keys": pd.Series(dtype=np.int64)})
    got = got.sort_values("diff_class").reset_index(drop=True)

    # brute-force oracle: derive, reconstruct each side, outer-merge
    ch = pd.DataFrame({
        "conv_id": "c" + (df["user_id"] % 50).astype(str),
        "turn_idx": (df["event_id"] % 200).astype(np.int32),
        "role": df["event_type"],
        "text": df["props"],
        "tool": np.where((df["event_type"] == "click")
                         & (df["event_id"] >= -(-n // 4)),
                         "w" + (df["event_id"] % 5).astype(str), None),
        "ts": df["ts"],
        "op": np.select([df["event_type"] == "error",
                         df["event_type"] == "purchase"],
                        ["D", "U"], "I"),
        "lsn": df["event_id"],
    })

    def state(cut_us):
        s = (ch[ch["ts"].astype("int64") // 1000 <= cut_us]   # ns -> us
             if cut_us is not None else ch)
        if s.empty:
            return s
        s = s.sort_values(["ts", "lsn"]).groupby(
            ["conv_id", "turn_idx"], as_index=False).last()
        return s[s["op"] != "D"]

    s1, s2 = state(t1_us), state(None)
    m = s1.merge(s2, on=["conv_id", "turn_idx"], how="outer",
                 suffixes=("_1", "_2"), indicator=True)
    cls = []
    for _, r in m.iterrows():
        if r["_merge"] == "right_only":
            cls.append("added")
        elif r["_merge"] == "left_only":
            cls.append("deleted")
        else:
            diff = any(
                (pd.isna(r[f"{c}_1"]) != pd.isna(r[f"{c}_2"]))
                or (pd.notna(r[f"{c}_1"]) and r[f"{c}_1"] != r[f"{c}_2"])
                for c in ("role", "text", "tool", "ts"))
            cls.append("changed" if diff else "unchanged")
    want = (pd.Series(cls, dtype=object).value_counts().rename_axis(
        "diff_class").reset_index(name="n_keys")
        .sort_values("diff_class").reset_index(drop=True))
    if want.empty:
        assert got.empty
    else:
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
