"""Snapshot (EP2), bulk load (EP3) and compliance-gate (M5) parity tests."""

import glob
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.bulk_load import SchemaComplianceError, bulk_load
from migration_pair_ray.pipelines.compliance import check_compliance
from migration_pair_ray.pipelines.replay import final_state, replay
from migration_pair_ray.pipelines.snapshot import snapshot
from migration_pair_ray.schemas import BASE_SCHEMA, CHANGE_SCHEMA


# ---------------- compliance (pure, no ray) ----------------

def test_strict_compliance_exact_match_required():
    rep = check_compliance(CHANGE_SCHEMA, CHANGE_SCHEMA, mode="strict")
    assert rep.compliant and rep.mismatch_count == 0


def test_strict_rejects_added_column():
    src = CHANGE_SCHEMA.append(pa.field("extra", pa.string()))
    rep = check_compliance(src, CHANGE_SCHEMA, mode="strict")
    assert not rep.compliant and rep.added == ["extra"] and rep.mismatch_count == 1


def test_evolve_allows_added_and_missing():
    src = pa.schema([f for f in CHANGE_SCHEMA if f.name != "tool"]).append(
        pa.field("new_col", pa.float64()))
    rep = check_compliance(src, CHANGE_SCHEMA, mode="evolve")
    assert rep.compliant and rep.added == ["new_col"] and rep.missing == ["tool"]


def test_evolve_rejects_incompatible_type():
    src = pa.schema([pa.field("turn_idx", pa.string()) if f.name == "turn_idx" else f
                     for f in CHANGE_SCHEMA])
    # string<->int32 unifies permissively? If not, mismatched. Either way the
    # report must be internally consistent.
    rep = check_compliance(src, CHANGE_SCHEMA, mode="evolve")
    assert rep.compliant == (not rep.mismatched)


# ---------------- snapshot ----------------

@pytest.mark.usefixtures("ray_session")
def test_snapshot_parquet_and_csv(tmp_lake, tmp_path):
    log, lake = tmp_lake
    generate_change_log(log, n_events=500, n_convs=8, n_files=2, tool_epoch=1, seed=21)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=4)
    replay(cfg)
    want = final_state(cfg).to_pandas().reset_index(drop=True)

    pq_dir = str(tmp_path / "snap_pq")
    n = snapshot(cfg, pq_dir, fmt="parquet")
    got = duckdb.sql(
        f"SELECT conv_id,turn_idx,role,text,tool,ts FROM read_parquet('{pq_dir}/*.parquet') "
        "ORDER BY conv_id, turn_idx").df()
    assert n == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    csv_dir = str(tmp_path / "snap_csv")
    snapshot(cfg, csv_dir, fmt="csv", unix_ms_ts=True)
    got_csv = duckdb.sql(
        f"SELECT conv_id,turn_idx,role,text,tool,ts FROM read_csv('{csv_dir}/*.csv') "
        "ORDER BY conv_id, turn_idx").df()
    want_ms = want.copy()
    want_ms["ts"] = want_ms["ts"].astype("datetime64[ms]").astype("int64")
    pd.testing.assert_frame_equal(got_csv, want_ms, check_dtype=False)


# ---------------- bulk load ----------------

@pytest.mark.usefixtures("ray_session")
def test_bulk_load_csv_roundtrip(tmp_lake, tmp_path):
    """Extraction → Insertion round trip: snapshot a lake to CSV (unix-ms
    wire form), bulk-load the CSV into a fresh lake, states equal —
    the reference's EndToEnd equivalence."""
    log, lake = tmp_lake
    generate_change_log(log, n_events=400, n_convs=6, n_files=2, tool_epoch=1, seed=22)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, num_partitions=4)
    replay(cfg)
    want = final_state(cfg).to_pandas().reset_index(drop=True)

    csv_dir = str(tmp_path / "wire_csv")
    snapshot(cfg, csv_dir, fmt="csv", unix_ms_ts=True)

    cfg2 = JobConfig(changelog_dir=str(tmp_path / "nolog"),
                     lake_dir=str(tmp_path / "lake2"), num_partitions=4)
    os.makedirs(cfg2.changelog_dir, exist_ok=True)
    s = bulk_load(cfg2, f"{csv_dir}/", fmt="csv")
    assert s["rows_state"] == len(want)
    got = final_state(cfg2).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # idempotent: loading the same file again is a no-op
    s2 = bulk_load(cfg2, f"{csv_dir}/", fmt="csv")
    assert s2["skipped_partitions"] == s2["partitions"]


@pytest.mark.usefixtures("ray_session")
def test_bulk_load_strict_gate_aborts(tmp_lake, tmp_path):
    log, lake = tmp_lake
    bad = pa.table({"conv_id": pa.array(["a"]), "nonsense": pa.array([1])})
    import pyarrow.parquet as pq
    p = str(tmp_path / "bad.parquet")
    pq.write_table(bad, p)
    cfg = JobConfig(changelog_dir=log, lake_dir=lake, compliance="strict")
    with pytest.raises(SchemaComplianceError):
        bulk_load(cfg, p, fmt="parquet")
