"""Normalize-stage semantics (reference: Converters/DynamicTypeConverter.cs,
Tasks/Extraction.cs:65-70 timestamp canonicalization)."""

import pyarrow as pa
import pytest

from migration_pair_ray.functions.normalize import normalize_batch
from migration_pair_ray.schemas import CHANGE_SCHEMA, conform_batch, unify_change_schemas


def test_string_to_int_with_empty_as_null():
    batch = pa.table({"turn_idx": pa.array(["3", "", "7"], pa.string())})
    target = pa.schema([pa.field("turn_idx", pa.int32())])
    out = normalize_batch(batch, target)
    assert out.column("turn_idx").to_pylist() == [3, None, 7]


def test_bool_parse_case_insensitive():
    batch = pa.table({"flag": pa.array(["True", "false", ""], pa.string())})
    out = normalize_batch(batch, pa.schema([pa.field("flag", pa.bool_())]))
    assert out.column("flag").to_pylist() == [True, False, None]


def test_unix_ms_to_timestamp_us_roundtrip():
    ms = 1_704_067_200_123
    batch = pa.table({"ts": pa.array([ms], pa.int64())})
    out = normalize_batch(batch, pa.schema([pa.field("ts", pa.timestamp("us"))]))
    us = out.column("ts").cast(pa.int64()).to_pylist()[0]
    assert us == ms * 1000
    back = normalize_batch(out, pa.schema([pa.field("ts", pa.int64())]))
    assert back.column("ts").to_pylist() == [ms]


def test_missing_column_backfilled_extra_dropped():
    batch = pa.table({"conv_id": pa.array(["a"]), "junk": pa.array([1])})
    out = normalize_batch(batch, pa.schema(
        [pa.field("conv_id", pa.string()), pa.field("tool", pa.string())]))
    assert out.schema.names == ["conv_id", "tool"]
    assert out.column("tool").to_pylist() == [None]


def test_iso_string_to_timestamp():
    batch = pa.table({"ts": pa.array(["2024-01-01 00:00:00"], pa.string())})
    out = normalize_batch(batch, pa.schema([pa.field("ts", pa.timestamp("us"))]))
    assert out.column("ts").cast(pa.int64()).to_pylist()[0] == 1_704_067_200_000_000


def test_unify_change_schemas_deterministic_order():
    s1 = pa.schema([pa.field(n, CHANGE_SCHEMA.field(n).type)
                    for n in CHANGE_SCHEMA.names if n != "tool"])
    s2 = CHANGE_SCHEMA
    extra = s2.append(pa.field("zzz", pa.string())).append(pa.field("aaa", pa.int64()))
    u1 = unify_change_schemas([s1, extra])
    u2 = unify_change_schemas([extra, s1])
    assert u1.names == u2.names == CHANGE_SCHEMA.names + ["aaa", "zzz"]


def test_conform_batch_by_name_not_position():
    # columns deliberately in reversed order — the Insertion.cs:101-102
    # positional hazard must not be reproduced
    batch = pa.table({"turn_idx": pa.array([1], pa.int32()),
                      "conv_id": pa.array(["c"])})
    target = pa.schema([pa.field("conv_id", pa.string()),
                        pa.field("turn_idx", pa.int32())])
    out = conform_batch(batch, target)
    assert out.column("conv_id").to_pylist() == ["c"]
    assert out.column("turn_idx").to_pylist() == [1]
