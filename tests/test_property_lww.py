"""Property-based LWW tests (hypothesis): for ANY event set, the merge is
order-insensitive, partition-split-insensitive, idempotent, and matches a
brute-force dict oracle (SURVEY.md §5.4)."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from migration_pair_ray.functions.lww import lww_reduce, merge_tables, visible_state
from migration_pair_ray.schemas import CHANGE_SCHEMA

events = st.lists(
    st.tuples(
        st.integers(0, 3),            # conv
        st.integers(0, 4),            # turn
        st.integers(0, 5),            # ts (seconds; small range forces ties)
        st.sampled_from(["I", "U", "D"]),
    ),
    min_size=0, max_size=40,
)


def to_table(rows):
    # lsn = position (unique); payload derived from lsn so rows differ
    return pa.Table.from_pylist([
        {"conv_id": f"c{c}", "turn_idx": t, "role": "user",
         "text": f"x{i}", "tool": None, "ts": s * 1_000_000,
         "op": op, "lsn": i}
        for i, (c, t, s, op) in enumerate(rows)
    ], schema=CHANGE_SCHEMA)


def dict_oracle(rows):
    """Brute force: winner per key = max (ts, lsn); D winner → absent."""
    best = {}
    for i, (c, t, s, op) in enumerate(rows):
        key = (f"c{c}", t)
        if key not in best or (s, i) > (best[key][0], best[key][1]):
            best[key] = (s, i, op)
    return {k: (s, i) for k, (s, i, op) in best.items() if op != "D"}


def visible_dict(table):
    vis = visible_state(lww_reduce(table), drop_meta=False)
    return {(r["conv_id"], r["turn_idx"]): (r["ts"].timestamp() if hasattr(r["ts"], "timestamp") else r["ts"], r["lsn"])
            for r in vis.to_pylist()}


@settings(max_examples=200, deadline=None)
@given(events)
def test_matches_dict_oracle(rows):
    got = {k: v[1] for k, v in visible_dict(to_table(rows)).items()}
    want = {k: v[1] for k, v in dict_oracle(rows).items()}
    assert got == want


@settings(max_examples=100, deadline=None)
@given(events, st.randoms())
def test_permutation_invariant(rows, rnd):
    # arrival order permuted; (ts, lsn) stays attached to each event
    orig = to_table(rows)
    order = list(range(len(rows)))
    rnd.shuffle(order)
    permuted = orig.take(pa.array(order, pa.int64())) if len(rows) else orig
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert lww_reduce(orig).sort_by(key).equals(lww_reduce(permuted).sort_by(key))


@settings(max_examples=100, deadline=None)
@given(events, st.integers(0, 40))
def test_split_merge_associative(rows, cut):
    table = to_table(rows)
    cut = min(cut, table.num_rows)
    whole = lww_reduce(table)
    split = merge_tables(lww_reduce(table.slice(0, cut)),
                         lww_reduce(table.slice(cut)))
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert whole.sort_by(key).equals(split.sort_by(key))


@settings(max_examples=50, deadline=None)
@given(events)
def test_idempotent_reapply(rows):
    table = to_table(rows)
    once = merge_tables(None, table)
    twice = merge_tables(once, table)  # at-least-once redelivery of everything
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert once.sort_by(key).equals(twice.sort_by(key))
