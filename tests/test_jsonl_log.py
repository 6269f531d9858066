"""Debezium-style JSONL change-log ingestion (sources/jsonl_log)."""

import json
import os
from pathlib import Path

import duckdb
import pandas as pd
import pytest

from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.replay import final_state
from migration_pair_ray.sources.jsonl_log import ingest_jsonl_log


def _env(op, payload, ts_ms, lsn):
    before = payload if op == "d" else None
    after = None if op == "d" else payload
    return json.dumps({"op": op, "before": before, "after": after,
                       "ts_ms": ts_ms, "lsn": lsn})


def _write_fixture(d: str) -> None:
    """Two envelope files: file a pre-evolution (no tool key anywhere),
    file b with tool; inserts, an update, a delete, a Debezium 'r'
    snapshot row, and an out-of-order LSN inside file b."""
    os.makedirs(d, exist_ok=True)
    a = [
        _env("c", {"conv_id": "a", "turn_idx": 0, "role": "user",
                   "text": "q1"}, 1_000, 0),
        _env("c", {"conv_id": "a", "turn_idx": 1, "role": "assistant",
                   "text": "a1"}, 2_000, 1),
        _env("r", {"conv_id": "b", "turn_idx": 0, "role": "user",
                   "text": "q2"}, 3_000, 2),
    ]
    b = [
        _env("u", {"conv_id": "a", "turn_idx": 1, "role": "assistant",
                   "text": "a1-v2", "tool": "search"}, 5_000, 4),
        _env("d", {"conv_id": "b", "turn_idx": 0, "role": None,
                   "text": None, "tool": None}, 6_000, 5),
        _env("c", {"conv_id": "c", "turn_idx": 3, "role": "user",
                   "text": "q3", "tool": None}, 4_000, 3),
    ]
    Path(d, "00-a.jsonl").write_text("\n".join(a) + "\n")
    Path(d, "01-b.jsonl").write_text("\n".join(b) + "\n")


ORACLE = """
WITH raw AS (
  SELECT * FROM read_json_auto('{d}/*.jsonl', union_by_name=true)
),
ch AS (
  SELECT CASE WHEN op = 'd' THEN before.conv_id ELSE after.conv_id END AS conv_id,
         CASE WHEN op = 'd' THEN before.turn_idx ELSE after.turn_idx END AS turn_idx,
         CASE WHEN op = 'd' THEN NULL ELSE after.role END AS role,
         CASE WHEN op = 'd' THEN NULL ELSE after.text END AS text,
         CASE WHEN op = 'd' THEN NULL ELSE after.tool END AS tool,
         epoch_ms(ts_ms) AS ts,
         CASE op WHEN 'd' THEN 'D' WHEN 'u' THEN 'U' ELSE 'I' END AS op,
         lsn
  FROM raw
),
w AS (SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) rn FROM ch)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM w WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
"""


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].sort_values(["conv_id", "turn_idx"])
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_jsonl_ingest_matches_oracle(tmp_path):
    src = str(tmp_path / "envelopes")
    _write_fixture(src)
    cfg = JobConfig(changelog_dir=str(tmp_path / "log"),
                    lake_dir=str(tmp_path / "lake"),
                    num_partitions=2, hash_state=False)
    s = ingest_jsonl_log(cfg, src)
    assert s["converted"] == 2 and s["pass"]["events_in"] == 6

    got = _norm(final_state(cfg).to_pandas())
    want = _norm(duckdb.sql(ORACLE.format(d=src)).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # idempotent: nothing new to convert, replay is a no-op
    s2 = ingest_jsonl_log(cfg, src)
    assert s2["converted"] == 0 and s2["skipped"] == 2
    assert s2["pass"]["up_to_date"]


@pytest.mark.usefixtures("ray_session")
def test_jsonl_incremental_arrival(tmp_path):
    """Second envelope file arrives after the first was committed —
    resume converts/applies only the new one."""
    src = str(tmp_path / "envelopes")
    os.makedirs(src)
    Path(src, "00-a.jsonl").write_text(_env(
        "c", {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "q1"},
        1_000, 0) + "\n")
    cfg = JobConfig(changelog_dir=str(tmp_path / "log"),
                    lake_dir=str(tmp_path / "lake"),
                    num_partitions=2, hash_state=False)
    s1 = ingest_jsonl_log(cfg, src)
    assert s1["converted"] == 1
    Path(src, "01-b.jsonl").write_text(_env(
        "u", {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "q1-v2"},
        2_000, 1) + "\n")
    s2 = ingest_jsonl_log(cfg, src)
    assert s2["converted"] == 1 and s2["skipped"] == 1
    assert s2["pass"]["files"] == 1
    got = final_state(cfg).to_pandas()
    assert got.iloc[0]["text"] == "q1-v2" and len(got) == 1


@pytest.mark.usefixtures("ray_session")
def test_jsonl_crash_mid_conversion_resumes(tmp_path):
    """A converted-but-unreplayed output (apply=False models the crash)
    is picked up by the next ingest/replay without double conversion."""
    src = str(tmp_path / "envelopes")
    _write_fixture(src)
    cfg = JobConfig(changelog_dir=str(tmp_path / "log"),
                    lake_dir=str(tmp_path / "lake"),
                    num_partitions=2, hash_state=False)
    s = ingest_jsonl_log(cfg, src, apply=False)
    assert s["converted"] == 2 and "pass" not in s
    s2 = ingest_jsonl_log(cfg, src)
    assert s2["converted"] == 0 and s2["pass"]["events_in"] == 6
    got = _norm(final_state(cfg).to_pandas())
    want = _norm(duckdb.sql(ORACLE.format(d=src)).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_many_tiny_files_preserve_per_file_schema(tmp_path):
    """Per-file schema evolution survives many tiny inputs: Arrow's JSON
    reader parses each file into its own block (verified behavior this
    code depends on — if Ray ever coalesces small files into one block,
    this test fails loudly), so a pre-'tool' file's output Parquet must
    NOT grow a tool column, while a with-'tool' file's must."""
    import pyarrow.parquet as pq
    src = str(tmp_path / "envelopes")
    os.makedirs(src)
    for i in range(6):
        p = {"conv_id": f"c{i}", "turn_idx": 0, "role": "u", "text": "t"}
        if i % 2:
            p["tool"] = "T"
        Path(src, f"{i:02d}-f.jsonl").write_text(
            _env("c", p, 1_000 + i, i) + "\n")
    # plus the rotation artifacts: a 0-byte and a whitespace-only file
    Path(src, "98-empty.jsonl").write_text("")
    Path(src, "99-blank.jsonl").write_text("\n")
    cfg = JobConfig(changelog_dir=str(tmp_path / "log"),
                    lake_dir=str(tmp_path / "lake"),
                    num_partitions=2, hash_state=False)
    s = ingest_jsonl_log(cfg, src)
    assert s["converted"] == 8 and s["pass"]["events_in"] == 6
    for i in range(6):
        sch = pq.read_schema(f"{cfg.changelog_dir}/batch-jsonl-{i:02d}-f.parquet")
        assert ("tool" in sch.names) == bool(i % 2), (i, sch.names)
    # empties consumed once, never pending again
    s2 = ingest_jsonl_log(cfg, src)
    assert s2["converted"] == 0 and s2["pass"]["up_to_date"]
    got = final_state(cfg).to_pandas()
    assert len(got) == 6


@pytest.mark.usefixtures("ray_session")
def test_jsonl_patch_envelopes_into_cell_lake(tmp_path):
    """Debezium partial row images (op 'p': after carries ONLY the set
    columns) land as P events; a cell-kernel lake folds them per column.
    Late-arriving patch loses to a newer full image per cell; a patch
    after a delete resurrects a partial row."""
    src = tmp_path / "jl"
    src.mkdir()
    env = [
        {"op": "c", "after": {"conv_id": "a", "turn_idx": 0, "role": "user",
                              "text": "hello", "tool": "t0"},
         "ts_ms": 1000, "lsn": 0},
        # patch sets text only (tool/role keep)
        {"op": "p", "after": {"conv_id": "a", "turn_idx": 0,
                              "text": "patched"},
         "ts_ms": 2000, "lsn": 1},
        # delete, then a patch resurrects a PARTIAL row
        {"op": "c", "after": {"conv_id": "b", "turn_idx": 1, "role": "sys",
                              "text": "x", "tool": None},
         "ts_ms": 1000, "lsn": 2},
        {"op": "d", "before": {"conv_id": "b", "turn_idx": 1, "role": "sys",
                               "text": "x", "tool": None},
         "ts_ms": 3000, "lsn": 3},
        {"op": "p", "after": {"conv_id": "b", "turn_idx": 1,
                              "tool": "revived"},
         "ts_ms": 4000, "lsn": 4},
    ]
    with open(src / "feed-000.jsonl", "w") as f:
        for e in env:
            f.write(json.dumps(e) + "\n")
    cfg = JobConfig(changelog_dir=str(tmp_path / "log"),
                    lake_dir=str(tmp_path / "lake"),
                    num_partitions=2, merge_kernel="cell")
    s = ingest_jsonl_log(cfg, str(src))
    assert s["pass"]["events_in"] == 5
    got = (final_state(cfg, sort=True).to_pandas()
           .set_index(["conv_id", "turn_idx"]))
    assert got.loc[("a", 0), "text"] == "patched"
    assert got.loc[("a", 0), "role"] == "user"      # kept, not nulled
    assert got.loc[("a", 0), "tool"] == "t0"        # kept, not nulled
    assert got.loc[("b", 1), "tool"] == "revived"
    assert pd.isna(got.loc[("b", 1), "role"])       # pre-delete cell dead
    assert pd.isna(got.loc[("b", 1), "text"])
