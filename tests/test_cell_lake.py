"""Cell-kernel lakes: ``merge_kernel="cell"`` on the full replay path.

The cell kernel (functions/cells.py) is a join-semilattice, so the lake's
incremental pass-by-pass merges must equal a single full fold — including
out-of-order patches across passes, chunked state layouts, merge-on-read
deltas and splits.  These tests drive the PACKAGE surface (replay /
final_state / lookup / snapshot / fsck) against a brute-force driver-side
``cell_finalize`` of the complete event set.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from migration_pair_ray.config import JobConfig
from migration_pair_ray.functions.cells import cell_finalize
from migration_pair_ray.pipelines.replay import final_state, replay
from migration_pair_ray.state.manifest import LakeLayoutError

N_KEYS = 40
COLS = ["role", "text", "tool"]


def _make_events(n: int, seed: int) -> pa.Table:
    """Deterministic mixed I/U/P/D change stream over N_KEYS keys with
    event-time (ts) independent of log order (lsn) — late arrivals and
    cross-pass out-of-order patches included by construction."""
    rng = np.random.default_rng(seed)
    k = rng.integers(0, N_KEYS, n)
    ops = rng.choice(np.array(["I", "U", "P", "P", "D"]), size=n,
                     p=[0.15, 0.35, 0.2, 0.2, 0.1])
    ts = rng.integers(1_700_000_000_000_000, 1_700_000_100_000_000, n)
    cols = {
        "conv_id": pa.array([f"c{i % 7}" for i in k], pa.string()),
        "turn_idx": pa.array((k // 7).astype("int32")),
        "ts": pa.array(ts, pa.timestamp("us")),
        "op": pa.array(ops.tolist(), pa.string()),
        "lsn": pa.array(np.arange(n, dtype="int64")),
    }
    vals = {}
    for c in COLS:
        v = np.array([f"{c}-{i}" for i in range(n)], dtype=object)
        # patches set a random subset of columns (possibly none); I/U may
        # legitimately SET NULL
        null = np.where(ops == "P", rng.random(n) < 0.5, rng.random(n) < 0.15)
        v[null] = None
        vals[c] = pa.array(v, pa.string())
    return pa.table({
        "conv_id": cols["conv_id"], "turn_idx": cols["turn_idx"],
        "role": vals["role"], "text": vals["text"], "tool": vals["tool"],
        "ts": cols["ts"], "op": cols["op"], "lsn": cols["lsn"],
    })


def _write_log(log_dir: Path, events: pa.Table, n_files: int) -> None:
    log_dir.mkdir(parents=True, exist_ok=True)
    per = (events.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        sub = events.slice(i * per, per)
        if sub.num_rows:
            pq.write_table(sub, str(log_dir / f"batch-{i:05d}.parquet"))


def _brute(events: pa.Table) -> pa.Table:
    return cell_finalize(events).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])


def _final(cfg: JobConfig) -> pa.Table:
    t = pa.Table.from_pylist(final_state(cfg, sort=True).take_all())
    return t.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])


def _cfg(root: Path, name: str, **kw) -> JobConfig:
    kw.setdefault("num_partitions", 4)
    return JobConfig(changelog_dir=str(root / f"{name}_log"),
                     lake_dir=str(root / f"{name}_lake"),
                     merge_kernel="cell", **kw)


def _assert_tables_equal(got: pa.Table, want: pa.Table) -> None:
    assert got.num_rows == want.num_rows
    want = want.select(got.column_names)
    for name in got.column_names:
        a, b = got.column(name).combine_chunks(), want.column(name).combine_chunks()
        assert a.cast(b.type).equals(b), f"column {name} differs"


def test_cell_lake_matches_brute_single_pass(tmp_path):
    events = _make_events(3000, seed=1)
    cfg = _cfg(tmp_path, "single")
    _write_log(Path(cfg.changelog_dir), events, 3)
    replay(cfg)
    _assert_tables_equal(_final(cfg), _brute(events))


def test_cell_lake_incremental_equals_full(tmp_path):
    """Three sequential passes (out-of-order ts across passes) must end
    bit-identical to one full pass — the semilattice property ON the lake
    path, not just the kernel."""
    events = _make_events(4000, seed=2)
    inc = _cfg(tmp_path, "inc")
    Path(inc.changelog_dir).mkdir(parents=True)
    per = events.num_rows // 3 + 1
    for i in range(3):
        sub = events.slice(i * per, per)
        if sub.num_rows:
            pq.write_table(sub, f"{inc.changelog_dir}/batch-{i:05d}.parquet")
            replay(inc)   # one pass per file
    full = _cfg(tmp_path, "full")
    _write_log(Path(full.changelog_dir), events, 1)
    replay(full)
    _assert_tables_equal(_final(inc), _final(full))
    _assert_tables_equal(_final(inc), _brute(events))


@pytest.mark.parametrize("kw", [
    {"state_chunk_rows": 50},
    {"mor_max_deltas": 2},
    {"state_chunk_rows": 50, "retain_passes": 2},
])
def test_cell_lake_layout_matrix(tmp_path, kw):
    """Chunked state files, merge-on-read deltas and retention all compose
    with the cell kernel: multi-pass result equals the brute fold."""
    events = _make_events(2500, seed=3)
    cfg = _cfg(tmp_path, "m", **kw)
    Path(cfg.changelog_dir).mkdir(parents=True)
    per = events.num_rows // 3 + 1
    for i in range(3):
        sub = events.slice(i * per, per)
        if sub.num_rows:
            pq.write_table(sub, f"{cfg.changelog_dir}/batch-{i:05d}.parquet")
            replay(cfg)
    _assert_tables_equal(_final(cfg), _brute(events))


def test_cell_kernel_gate(tmp_path):
    """A lake written row-kernel refuses a cell-kernel pass (and vice
    versa): the kernel decides what the state FILES mean — flipping it on
    an existing lake would silently misread every partition."""
    events = _make_events(300, seed=4)
    row_cfg = JobConfig(changelog_dir=str(tmp_path / "log"),
                        lake_dir=str(tmp_path / "lake"), num_partitions=2)
    _write_log(Path(row_cfg.changelog_dir), events, 1)
    replay(row_cfg)
    cell_cfg = JobConfig(changelog_dir=str(tmp_path / "log2"),
                         lake_dir=str(tmp_path / "lake"), num_partitions=2,
                         merge_kernel="cell")
    _write_log(Path(cell_cfg.changelog_dir), events, 1)
    with pytest.raises(LakeLayoutError, match="merge_kernel"):
        replay(cell_cfg)


def test_cell_lookup_and_patch_after_delete(tmp_path):
    """Point lookups on a cell lake finalize the key's determiner rows —
    including the patch-resurrects-after-delete case."""
    from migration_pair_ray.pipelines.lookup import lookup_keys
    ts = lambda us: pa.scalar(us, pa.timestamp("us"))
    events = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b"], pa.string()),
        "turn_idx": pa.array([0, 0, 0, 1], pa.int32()),
        "role": pa.array(["user", None, None, "asst"], pa.string()),
        "text": pa.array(["hello", None, "patched", "world"], pa.string()),
        "tool": pa.array([None, None, None, None], pa.string()),
        "ts": pa.array([1000, 2000, 3000, 1000], pa.timestamp("us")),
        "op": pa.array(["I", "D", "P", "I"], pa.string()),
        "lsn": pa.array([0, 1, 2, 3], pa.int64()),
    })
    cfg = _cfg(tmp_path, "lk")
    _write_log(Path(cfg.changelog_dir), events, 2)
    replay(cfg)
    got = lookup_keys(cfg, ["a"], [0])
    # the patch after the delete resurrects a PARTIAL row: text from the
    # patch, role/tool null (their pre-delete determiners are dead)
    assert got.num_rows == 1
    assert got.column("text")[0].as_py() == "patched"
    assert got.column("role")[0].as_py() is None
    assert got.column("ts")[0].as_py().timestamp() == pytest.approx(3000 / 1e6)
    # visible_only=False returns internal determiner rows (> 1 per key ok)
    internal = lookup_keys(cfg, ["a"], [0], visible_only=False)
    assert internal.num_rows >= 2   # tombstone watermark + patch


def test_cell_snapshot_count_and_fsck(tmp_path):
    from migration_pair_ray.pipelines.fsck import validate_lake
    from migration_pair_ray.pipelines.snapshot import snapshot
    events = _make_events(2000, seed=5)
    cfg = _cfg(tmp_path, "sn", state_chunk_rows=64)
    _write_log(Path(cfg.changelog_dir), events, 2)
    replay(cfg)
    want = _brute(events)
    n = snapshot(cfg, str(tmp_path / "out"), fmt="parquet")
    assert n == want.num_rows
    rep = validate_lake(cfg, deep=True)
    assert rep["ok"], rep["problems"]


def test_value_index_on_cell_lake(tmp_path):
    """Cell lakes index at PARTITION grain: postings hold FOLDED visible
    values (a raw determiner value that lost its cell never matches), the
    probe re-folds only matching partitions, staleness still raises, and
    MoR deltas are handled natively."""
    from migration_pair_ray.pipelines.index import (IndexStaleError,
                                                    build_value_index,
                                                    index_candidate_files,
                                                    lookup_by_value)
    events = _make_events(1500, seed=6)
    cfg = _cfg(tmp_path, "ix", mor_max_deltas=3)
    _write_log(Path(cfg.changelog_dir), events, 2)
    replay(cfg)
    s = build_value_index(cfg, "role")
    assert s["reindexed"] > 0
    want = _brute(events)
    vis_roles = [r for r in want.column("role").to_pylist() if r is not None]
    probe_val = vis_roles[0]
    got = lookup_by_value(cfg, "role", [probe_val])
    expect = want.filter(pa.compute.equal(want.column("role"), probe_val))
    _assert_tables_equal(
        got.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        expect)
    # the probe plan is partition-grain: a strict subset of partitions
    assert index_candidate_files(cfg, "role", [probe_val])
    # a raw determiner value whose cell was superseded must NOT match:
    # find a role value present in events but absent from the fold
    all_roles = set(r for r in events.column("role").to_pylist() if r)
    dead = sorted(all_roles - set(vis_roles))
    if dead:
        assert lookup_by_value(cfg, "role", [dead[0]]).num_rows == 0
    # internal rows are not value-addressable under the cell kernel
    with pytest.raises(ValueError, match="visible_only"):
        lookup_by_value(cfg, "role", [probe_val], visible_only=False)
    # a new pass moves fingerprints -> stale probe refuses, rebuild heals
    extra = _make_events(200, seed=66)
    extra = extra.set_column(
        extra.schema.get_field_index("lsn"), "lsn",
        pa.compute.add(extra.column("lsn"), 10_000))
    pq.write_table(extra, f"{cfg.changelog_dir}/batch-00099.parquet")
    replay(cfg)
    with pytest.raises(IndexStaleError, match="stale"):
        lookup_by_value(cfg, "role", [probe_val])
    build_value_index(cfg, "role")
    lookup_by_value(cfg, "role", [probe_val])   # fresh again


def test_repartition_cell_to_row_refused(tmp_path):
    """Internal cell rows are NOT row-kernel change events (a patch's null
    means keep, not set-null) — relayout across kernels must refuse rather
    than silently fold patches wrong."""
    from migration_pair_ray.pipelines.replay import repartition_lake
    events = _make_events(400, seed=7)
    cfg = _cfg(tmp_path, "rp")
    _write_log(Path(cfg.changelog_dir), events, 1)
    replay(cfg)
    row_target = JobConfig(changelog_dir=cfg.changelog_dir,
                           lake_dir=str(tmp_path / "row_lake"),
                           num_partitions=8)
    with pytest.raises(ValueError, match="kernel"):
        repartition_lake(cfg, row_target)
    # same-kernel relayout is fine and preserves the visible state
    cell_target = _cfg(tmp_path, "rp2", num_partitions=8)
    repartition_lake(cfg, cell_target)
    _assert_tables_equal(_final(cell_target), _brute(events))


def test_cell_delete_where(tmp_path):
    """GDPR-style predicate deletes on a cell lake: the predicate sees the
    FINALIZED visible rows (one per key, cells folded), and the tombstone
    batch kills whole keys — verified against a brute fold with the
    victims' events removed up to the delete watermark."""
    from migration_pair_ray.pipelines.deletes import delete_where
    events = _make_events(1500, seed=9)
    cfg = _cfg(tmp_path, "dw")
    _write_log(Path(cfg.changelog_dir), events, 2)
    replay(cfg)
    before = _brute(events)
    victims = {(before.column("conv_id")[i].as_py(),
                before.column("turn_idx")[i].as_py())
               for i in range(before.num_rows)
               if (before.column("text")[i].as_py() or "").endswith("7")}
    assert victims, "fixture produced no victims"

    def pred(t: pa.Table) -> pa.Array:
        import pyarrow.compute as pc
        return pc.fill_null(
            pc.ends_with(pc.cast(t.column("text"), pa.string()), "7"), False)

    res = delete_where(cfg, pred, tag="gdpr-7")
    assert res["tombstones"] == len(victims) and res["applied"]
    got = _final(cfg)
    keys = {(got.column("conv_id")[i].as_py(), got.column("turn_idx")[i].as_py())
            for i in range(got.num_rows)}
    assert keys == {(c, t) for c, t in
                    zip(before.column("conv_id").to_pylist(),
                        before.column("turn_idx").to_pylist())} - victims


def test_cell_snapshot_incremental(tmp_path):
    """Per-partition incremental export folds cell determiner rows to one
    visible row per key; an unchanged lake re-exports nothing."""
    import pyarrow.parquet as _pq

    from migration_pair_ray.pipelines.snapshot import snapshot_incremental
    events = _make_events(1800, seed=10)
    cfg = _cfg(tmp_path, "si")
    _write_log(Path(cfg.changelog_dir), events, 2)
    replay(cfg)
    out = tmp_path / "export"
    r1 = snapshot_incremental(cfg, str(out))
    assert r1["exported"] > 0
    got = pa.concat_tables(
        [_pq.read_table(str(p)) for p in sorted(out.glob("part-*.parquet"))],
        promote_options="permissive").sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    _assert_tables_equal(
        got.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        _brute(events))
    r2 = snapshot_incremental(cfg, str(out))
    assert r2["exported"] == 0             # full reuse on unchanged lake


def test_cell_replicate_kernel_guard(tmp_path):
    """A follower's kernel must match the source's: change files are
    kernel-agnostic raw events, so a row-kernel follower of a cell-kernel
    source would silently fold patches wrong.  Mismatch refuses; a
    matching follower converges to the brute fold under its own layout."""
    from migration_pair_ray.pipelines.feed import replicate
    events = _make_events(1200, seed=11)
    src = _cfg(tmp_path, "rsrc")
    _write_log(Path(src.changelog_dir), events, 2)
    replay(src)
    row_dst = JobConfig(changelog_dir=str(tmp_path / "rd_log"),
                        lake_dir=str(tmp_path / "rd_lake"),
                        num_partitions=8)
    with pytest.raises(ValueError, match="kernel mismatch"):
        replicate(src, row_dst)
    cell_dst = _cfg(tmp_path, "rdst", num_partitions=8)
    res = replicate(src, cell_dst)
    assert res["passes_applied"] >= 1
    _assert_tables_equal(_final(cell_dst), _brute(events))


def test_cell_lake_split_compose(tmp_path):
    """Incremental partition split on a cell lake keeps the fold exact."""
    from migration_pair_ray.pipelines.compact import split_partition
    events = _make_events(2000, seed=8)
    cfg = _cfg(tmp_path, "sp")
    Path(cfg.changelog_dir).mkdir(parents=True)
    pq.write_table(events.slice(0, 1000),
                   f"{cfg.changelog_dir}/batch-00000.parquet")
    replay(cfg)
    split_partition(cfg, 0, fanout=2)
    pq.write_table(events.slice(1000),
                   f"{cfg.changelog_dir}/batch-00001.parquet")
    replay(cfg)
    _assert_tables_equal(_final(cfg), _brute(events))


def test_cell_jsonl_export_ingest_roundtrip(tmp_path):
    """Patch events survive the JSONL wire: export a cell lake's passes
    as envelopes (P -> op 'p'), re-ingest into a fresh cell lake, and the
    follower audits content-identical (kept-column nulls stayed KEEP,
    they did not become SET NULL)."""
    from migration_pair_ray.pipelines.feed import export_jsonl, verify_replica
    from migration_pair_ray.sources.jsonl_log import ingest_jsonl_log
    events = _make_events(2000, seed=12)
    src = _cfg(tmp_path, "rt")
    _write_log(Path(src.changelog_dir), events, 2)
    replay(src)
    wire = tmp_path / "wire"
    export_jsonl(src, "mirror", str(wire), ack=True)
    dst = _cfg(tmp_path, "rt2", num_partitions=8)
    ingest_jsonl_log(dst, str(wire))
    assert verify_replica(src, dst).num_rows == 0
    _assert_tables_equal(_final(dst), _brute(events))


def test_cell_final_state_refuses_drop_meta_false(tmp_path):
    events = _make_events(200, seed=13)
    cfg = _cfg(tmp_path, "dm")
    _write_log(Path(cfg.changelog_dir), events, 1)
    replay(cfg)
    with pytest.raises(ValueError, match="drop_meta"):
        final_state(cfg, drop_meta=False)


def test_cell_quarantine_accepts_patch_ops(tmp_path):
    """The dead-letter gate's valid-op set is kernel-dependent: a
    quarantine-enabled CELL lake must pass op 'P' through (it has defined
    merge semantics there) while still quarantining genuinely unknown
    ops; a ROW lake keeps quarantining 'P'."""
    from migration_pair_ray.pipelines.replay import replay as _replay
    events = _make_events(600, seed=14)
    # append one genuinely bad op
    bad = pa.table({
        "conv_id": pa.array(["zz"], pa.string()),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["x"], pa.string()),
        "text": pa.array(["bad"], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
        "op": pa.array(["X"], pa.string()),
        "lsn": pa.array([10_000], pa.int64()),
    })
    stream = pa.concat_tables([events, bad])
    n_patches = sum(1 for o in events.column("op").to_pylist() if o == "P")
    assert n_patches > 0

    cell = _cfg(tmp_path, "qc", quarantine_dir=str(tmp_path / "qc_quar"))
    _write_log(Path(cell.changelog_dir), stream, 1)
    s = _replay(cell)
    assert s["quarantined"] == 1          # only the unknown op
    _assert_tables_equal(_final(cell), _brute(events))  # patches applied

    row = JobConfig(changelog_dir=cell.changelog_dir,
                    lake_dir=str(tmp_path / "qr_lake"),
                    num_partitions=4,
                    quarantine_dir=str(tmp_path / "qr_quar"))
    s2 = _replay(row)
    assert s2["quarantined"] == n_patches + 1   # P has no row semantics


def test_cell_time_travel(tmp_path):
    """as_of reads compose with the cell kernel: the finalize fold runs
    over the RETAINED pass's determiner rows, reconstructing the visible
    state exactly as it was after pass 1 (== brute fold of the prefix)."""
    events = _make_events(1600, seed=15)
    cfg = _cfg(tmp_path, "tt", retain_passes=2, state_chunk_rows=80)
    Path(cfg.changelog_dir).mkdir(parents=True)
    half = events.num_rows // 2
    pq.write_table(events.slice(0, half),
                   f"{cfg.changelog_dir}/batch-00000.parquet")
    s1 = replay(cfg)
    pq.write_table(events.slice(half),
                   f"{cfg.changelog_dir}/batch-00001.parquet")
    replay(cfg)
    # latest == full brute; as_of pass 1 == prefix brute
    _assert_tables_equal(_final(cfg), _brute(events))
    asof = pa.Table.from_pylist(
        final_state(cfg, sort=True, as_of=s1["pass_id"]).take_all()
    ).select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    _assert_tables_equal(asof, _brute(events.slice(0, half)))


def test_cell_fetch_conversations_matches_lookup(tmp_path):
    """The distributed conversation fetch finalizes cell determiner rows
    the same way lookup_keys / final_state do — per-partition fold with
    complete determiner sets (a key lives in one partition)."""
    from migration_pair_ray.pipelines.lookup import (fetch_conversations,
                                                     lookup_keys)
    events = _make_events(2500, seed=9)
    cfg = _cfg(tmp_path, "fetch", state_chunk_rows=50)
    _write_log(Path(cfg.changelog_dir), events, 3)
    replay(cfg)
    full = _final(cfg)
    convs = sorted(set(full.column("conv_id").to_pylist()))[:3]

    got = (fetch_conversations(cfg, convs).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    want = (full.to_pandas()[lambda d: d["conv_id"].isin(convs)]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    via_lookup = (lookup_keys(cfg, convs).to_pandas()
                  .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, via_lookup, check_dtype=False)
