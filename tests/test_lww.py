"""Unit tests for the LWW merge core (the Cassandra-upsert replacement:
reference semantics at /root/reference/Tasks/MigrationTask.cs:101-104)."""

import pyarrow as pa
import pytest

from migration_pair_ray.functions.lww import (
    dedup_replayed,
    lww_reduce,
    merge_tables,
    visible_state,
)
from migration_pair_ray.schemas import CHANGE_SCHEMA


def ev(conv, turn, ts_s, lsn, op="I", text=None, tool=None, role="user"):
    return {
        "conv_id": conv, "turn_idx": turn, "role": role,
        "text": text if text is not None else f"t{lsn}",
        "tool": tool, "ts": ts_s * 1_000_000, "op": op, "lsn": lsn,
    }


def tbl(rows):
    return pa.Table.from_pylist(rows, schema=CHANGE_SCHEMA)


def as_dicts(t):
    return sorted(t.to_pylist(), key=lambda r: (r["conv_id"], r["turn_idx"]))


def test_last_writer_wins_by_ts():
    t = tbl([ev("a", 0, 10, 1, text="old"), ev("a", 0, 20, 0, text="new")])
    out = lww_reduce(t)
    assert out.num_rows == 1
    assert out.to_pylist()[0]["text"] == "new"


def test_ts_tie_broken_by_lsn():
    t = tbl([ev("a", 0, 10, 5, text="hi-lsn"), ev("a", 0, 10, 3, text="lo-lsn")])
    out = lww_reduce(t)
    assert out.to_pylist()[0]["text"] == "hi-lsn"


def test_out_of_order_arrival_is_irrelevant():
    rows = [ev("a", 0, 30, 2, text="w"), ev("a", 0, 10, 9, text="l1"),
            ev("a", 0, 20, 1, text="l2")]
    import itertools
    outs = [lww_reduce(tbl(list(p))).to_pylist() for p in itertools.permutations(rows)]
    assert all(o == outs[0] for o in outs)
    assert outs[0][0]["text"] == "w"


def test_tombstone_wins_and_is_kept_internally_but_invisible():
    t = tbl([ev("a", 0, 10, 1, text="x"), ev("a", 0, 20, 2, op="D")])
    out = lww_reduce(t)
    assert out.num_rows == 1 and out.to_pylist()[0]["op"] == "D"
    assert visible_state(out).num_rows == 0


def test_tombstone_loses_to_later_write():
    t = tbl([ev("a", 0, 20, 2, op="D"), ev("a", 0, 30, 3, text="alive")])
    vis = visible_state(lww_reduce(t))
    assert vis.num_rows == 1 and vis.to_pylist()[0]["text"] == "alive"


def test_late_event_cannot_resurrect_deleted_key():
    # delete applied first; an older insert replays later (late data)
    state = merge_tables(None, tbl([ev("a", 0, 20, 2, op="D")]))
    state = merge_tables(state, tbl([ev("a", 0, 10, 1, text="zombie")]))
    assert visible_state(state).num_rows == 0


def test_partial_reduce_is_associative():
    rows = [ev("a", 0, 10, 1), ev("a", 0, 20, 2), ev("b", 1, 5, 3),
            ev("a", 0, 15, 4), ev("b", 1, 50, 5, op="D")]
    whole = lww_reduce(tbl(rows))
    split = merge_tables(lww_reduce(tbl(rows[:2])), lww_reduce(tbl(rows[2:])))
    assert as_dicts(whole) == as_dicts(split)


def test_merge_schema_evolution_backfills_tool():
    old = tbl([ev("a", 0, 10, 1)]).drop_columns(["tool"])
    new = tbl([ev("a", 1, 20, 2, tool="search")])
    out = merge_tables(old, new)
    d = {r["turn_idx"]: r for r in out.to_pylist()}
    assert d[0]["tool"] is None and d[1]["tool"] == "search"


def test_dedup_replayed_keeps_one_copy():
    r = ev("a", 0, 10, 1)
    out = dedup_replayed(tbl([r, r, r, ev("a", 0, 10, 2)]))
    assert out.num_rows == 2


def test_empty_table():
    empty = CHANGE_SCHEMA.empty_table()
    assert lww_reduce(empty).num_rows == 0
    assert merge_tables(None, empty).num_rows == 0


def test_chunked_merge_equals_unchunked():
    """Partition-size guard: merge_tables_chunked must be bit-identical to
    merge_tables for every chunk size, including ones that force splits
    inside hot keys' neighborhoods."""
    import random
    from migration_pair_ray.functions.lww import merge_tables_chunked
    rng = random.Random(9)
    existing_rows, change_rows = [], []
    for i in range(200):
        conv = f"c{rng.randrange(12)}"
        turn = rng.randrange(20)
        existing_rows.append(ev(conv, turn, rng.randrange(100), i))
    # one hot conversation dominating the change side
    for i in range(300):
        conv = "c3" if rng.random() < 0.5 else f"c{rng.randrange(12)}"
        op = "D" if rng.random() < 0.1 else "I"
        change_rows.append(ev(conv, rng.randrange(20), rng.randrange(100),
                              1000 + i, op=op))
    existing = merge_tables(None, tbl(existing_rows))   # sorted, reduced
    changes = tbl(change_rows)
    want = merge_tables(existing, changes)
    for chunk in (1, 7, 50, 10_000):
        got = merge_tables_chunked(existing, changes, chunk)
        assert got.equals(want), f"chunk_rows={chunk}"


def test_chunked_merge_null_keys_fall_back():
    """Null merge keys must not corrupt the chunked path: the guard falls
    back to the unchunked merge and the result stays identical."""
    from migration_pair_ray.functions.lww import merge_tables_chunked
    rows = [ev("a", 0, 10, 1), ev(None, 0, 11, 2), ev(None, None, 12, 3),
            ev("b", 1, 13, 4), ev(None, 0, 14, 5)]
    existing = merge_tables(None, tbl(rows[:2]))
    changes = tbl(rows[2:])
    want = merge_tables(existing, changes)
    for chunk in (1, 2):
        got = merge_tables_chunked(existing, changes, chunk)
        assert got.equals(want), f"chunk_rows={chunk}"
