"""Cell-level LWW (patch-op) kernel: semantics vs a sequential reference
fold, combiner monotonicity, and the edge cases (resurrect-after-delete,
patch-before-insert, existence-only patch, explicit set-null)."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from migration_pair_ray.functions.cells import cell_finalize, cell_reduce

VCOLS = ("role", "text", "tool")


def make_table(rows):
    rows = list(rows)
    return pa.table({
        "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
        "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
        "role": pa.array([r["role"] for r in rows], pa.string()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "tool": pa.array([r["tool"] for r in rows], pa.string()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        "op": pa.array([r["op"] for r in rows], pa.string()),
        "lsn": pa.array([r["lsn"] for r in rows], pa.int64()),
    })


def ref_fold(rows):
    """Sequential fold in (ts, lsn) order — the semantics definition."""
    state = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"],
                                         r["ts"], r["lsn"])):
        key = (r["conv_id"], r["turn_idx"])
        if r["op"] == "D":
            state.pop(key, None)
        elif r["op"] == "P":
            cur = state.get(key) or {c: None for c in VCOLS}
            for c in VCOLS:
                if r[c] is not None:
                    cur[c] = r[c]
            cur["ts"] = r["ts"]
            state[key] = cur
        else:  # I / U: full row image, null means SET NULL
            state[key] = {**{c: r[c] for c in VCOLS}, "ts": r["ts"]}
    return {k: (v["role"], v["text"], v["tool"], v["ts"])
            for k, v in state.items()}


def as_dict(table: pa.Table):
    import pyarrow.compute as pc
    i = table.schema.get_field_index("ts")
    table = table.set_column(i, "ts", pc.cast(table.column("ts"), pa.int64()))
    out = {}
    for r in table.to_pylist():
        out[(r["conv_id"], r["turn_idx"])] = (
            r["role"], r["text"], r["tool"], r["ts"])
    return out


def norm_ref(ref):
    return {k: (a, b, c, ts) for k, (a, b, c, ts) in ref.items()}


def row(conv, turn, op, role=None, text=None, tool=None, ts=0, lsn=0):
    return dict(conv_id=conv, turn_idx=turn, op=op, role=role, text=text,
                tool=tool, ts=ts, lsn=lsn)


def check(rows):
    got = as_dict(cell_finalize(make_table(rows)))
    assert got == norm_ref(ref_fold(rows))


def test_patch_overrides_single_column():
    check([row("c", 0, "I", "user", "hi", "w1", ts=1, lsn=1),
           row("c", 0, "P", text="edited", ts=2, lsn=2)])


def test_full_image_sets_null_over_patch():
    # I at ts=3 replaces ALL columns, including back to null
    check([row("c", 0, "I", "user", "hi", "w1", ts=1, lsn=1),
           row("c", 0, "P", tool="w9", ts=2, lsn=2),
           row("c", 0, "U", "user", "hi2", None, ts=3, lsn=3)])


def test_patch_before_insert_creates_partial_row():
    check([row("c", 0, "P", text="early", ts=1, lsn=1)])


def test_patch_after_delete_resurrects_partial():
    check([row("c", 0, "I", "user", "hi", "w1", ts=1, lsn=1),
           row("c", 0, "D", ts=2, lsn=2),
           row("c", 0, "P", text="back", ts=3, lsn=3)])


def test_delete_last_removes_key():
    rows = [row("c", 0, "I", "user", "hi", None, ts=1, lsn=1),
            row("c", 0, "D", ts=2, lsn=2)]
    assert cell_finalize(make_table(rows)).num_rows == 0
    check(rows)


def test_existence_only_patch():
    # a patch setting nothing still asserts the key exists
    rows = [row("c", 0, "P", ts=1, lsn=1)]
    out = cell_finalize(make_table(rows))
    assert out.num_rows == 1
    check(rows)


def test_late_older_write_cannot_beat_tombstone():
    # arrival order is irrelevant; (ts, lsn) order decides
    check([row("c", 0, "P", text="older", ts=1, lsn=5),
           row("c", 0, "D", ts=2, lsn=6),
           row("c", 0, "I", "user", "x", None, ts=1, lsn=4)])


def test_empty_table():
    out = cell_finalize(make_table([]))
    assert out.num_rows == 0
    assert set(out.schema.names) == {"conv_id", "turn_idx", "role", "text",
                                     "tool", "ts"}
    assert cell_reduce(make_table([])).num_rows == 0


_ops = st.sampled_from(["I", "U", "P", "D"])
_val = st.sampled_from([None, "a", "b"])


@st.composite
def _event_sets(draw):
    n = draw(st.integers(1, 24))
    rows = []
    for lsn in range(n):
        rows.append(row(draw(st.sampled_from(["c1", "c2"])),
                        draw(st.integers(0, 1)),
                        draw(_ops),
                        role=draw(_val), text=draw(_val), tool=draw(_val),
                        ts=draw(st.integers(0, 5)), lsn=lsn))
    return rows


@settings(max_examples=200, deadline=None)
@given(_event_sets())
def test_matches_reference_fold(rows):
    check(rows)


@settings(max_examples=200, deadline=None)
@given(_event_sets(), st.data())
def test_combiner_monotone(rows, data):
    """cell_finalize(cell_reduce(a) + cell_reduce(b)) == cell_finalize(all):
    the partial reduce is safe to run per-batch before the shuffle, with
    arbitrary (adversarial) row-to-batch assignment."""
    split = [data.draw(st.booleans()) for _ in rows]
    a = [r for r, s in zip(rows, split) if s]
    b = [r for r, s in zip(rows, split) if not s]
    parts = [cell_reduce(make_table(x)) for x in (a, b) if x]
    merged = (pa.concat_tables(parts) if parts else make_table([]))
    # re-reduce the union too: idempotence under repeated partials
    got = as_dict(cell_finalize(cell_reduce(merged)))
    assert got == as_dict(cell_finalize(make_table(rows)))
