"""Point lookup: serve a handful of keys from the lake without a scan.

The read-side counterpart of the write path's placement discipline: a key
``(conv_id, turn_idx)`` lives in exactly ONE partition (stages/partition),
and within a chunked partition in exactly ONE key-range chunk file
(manifest ``key_lo``/``key_hi``).  A lookup therefore touches

    O(#keys) manifest reads  +  the few chunk files whose range matches,

never the lake — at 100 TB this is the serving path (row-group pruning via
Parquet ``filters=`` bounds even the touched file's I/O).  The reference
had this for free (Cassandra point reads); an engine that owns its lake
must own it explicitly.

Driver-side by design: a point lookup is a latency path, not a throughput
job — shipping it through a Dataset would add scheduling overhead to read
three files.  Bulk key-set extraction (10^6+ keys) is a different op: use
``read_lake`` + a broadcast-set filter.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from migration_pair_ray.config import JobConfig
from migration_pair_ray.functions.lww import finalize_visible, reduce_events
from migration_pair_ray.state.manifest import LakeMeta, ManifestStore


def _route(conv_ids: list[str], turn_idx: list[int] | None,
           num_partitions: int, mode: str,
           splits: dict[int, tuple[int, int]] | None,
           hot_convs: tuple = ()) -> np.ndarray | None:
    """Partition id per key, or None when routing is impossible (mode
    "key" without turn_idx — the conversation's turns are salted across
    all partitions by design).  Mode "hot" without turn_idx SPLITS a
    mixed request instead of giving up: cold conversations route by conv
    hash as usual and only the whale entries come back as ``-1`` ("fans
    out to every partition") — one whale in a 10^6-conv fetch must not
    cost the cold majority its routing."""
    from migration_pair_ray.stages.partition import partition_ids
    if turn_idx is None and mode == "key":
        return None
    cols = {"conv_id": pa.array(conv_ids, pa.string())}
    if mode in ("key", "hot"):
        cols["turn_idx"] = pa.array(
            turn_idx if turn_idx is not None else [-1] * len(conv_ids),
            pa.int32())
    ids = partition_ids(pa.table(cols), num_partitions, mode, splits,
                        hot_convs).astype(np.int64)
    if turn_idx is None and mode == "hot":
        whales = set(conv_ids) & set(hot_convs)
        if whales:
            # a whale's turns are salted across all partitions; its
            # sentinel-turn id above is meaningless — mark for fan-out
            mask = np.fromiter((c in whales for c in conv_ids),
                               dtype=bool, count=len(conv_ids))
            ids[mask] = -1
    return ids


def candidate_files(cfg: JobConfig, conv_ids: list[str],
                    turn_idx: list[int] | None = None) -> list[str]:
    """The lake-relative state files a lookup of these keys must read —
    the pruning plan (exposed for tests/ops visibility).  Partition
    routing first, then chunk key-range pruning: a chunk whose
    ``[key_lo, key_hi]`` tuple range cannot contain any requested conv_id
    is skipped."""
    return [f for files in
            candidate_files_by_pid(cfg, conv_ids, turn_idx).values()
            for f in files]


def candidate_files_by_pid(cfg: JobConfig, conv_ids: list[str],
                           turn_idx: list[int] | None = None
                           ) -> dict[int, list[str]]:
    """``candidate_files`` grouped by partition — the per-partition plan
    ``fetch_conversations`` fans out over (one task per pid).  Within a
    pid the list holds EVERY file whose range/bloom covers a requested
    conv (base, chunks AND MoR deltas), so a per-pid kernel fold sees each
    key's complete row set — the ``finalize_visible`` precondition."""
    return {pid: e["files"]
            for pid, e in candidate_plan(cfg, conv_ids, turn_idx).items()}


def candidate_plan(cfg: JobConfig, conv_ids: list[str],
                   turn_idx: list[int] | None = None
                   ) -> dict[int, dict]:
    """Per-partition lookup plan: ``{pid: {"files": [...], "convs":
    [...]}}``.  Each partition is pruned against only ITS OWN requested
    conversations (under a routed layout a partition can never hold
    another partition's convs — pruning with the full request would keep
    chunks that cannot match).  A mixed hot-mode request splits: cold
    convs go to their routed partition only, whale convs (``_route``
    id -1) join every active partition's subset."""
    meta = LakeMeta(cfg.lake_dir)
    cur = meta.read()
    if cur is None:
        return {}
    p, mode = int(cur["num_partitions"]), cur["partition_mode"]
    route = _route(conv_ids, turn_idx, p, mode, meta.splits(),
                   tuple(cur.get("hot_convs") or ()))
    active = meta.active_partition_ids(cfg.num_partitions)
    per_conv: dict[int, set] = {}
    per_pairs: dict[int, set] = {}
    if route is None:                      # salted layout: full fan-out
        for pid in active:
            per_conv[pid] = set(conv_ids)
    else:
        for i, r in enumerate(route.tolist()):
            for pid in (active if r == -1 else (int(r),)):
                per_conv.setdefault(pid, set()).add(conv_ids[i])
                if turn_idx is not None:
                    per_pairs.setdefault(pid, set()).add(
                        (conv_ids[i], turn_idx[i]))
    store = ManifestStore(cfg.manifest_dir)
    import bisect
    out: dict[int, dict] = {}
    for pid in sorted(per_conv):
        m = store.read(pid)
        if not m:
            continue
        want = sorted(per_conv[pid])
        pairs = (sorted(per_pairs[pid]) if turn_idx is not None else None)

        def bloom_hits(rel: str) -> bool:
            # second pruning stage after the key range: the file's Bloom
            # sidecar (state/bloom.py).  Missing/corrupt sidecar ->
            # candidate (an accelerator, never an authority).
            from migration_pair_ray.state.bloom import load_sidecar
            blm = load_sidecar(Path(cfg.lake_dir) / rel)
            if blm is None:
                return True
            return (blm.may_contain_pairs(pairs) if pairs is not None
                    else blm.may_contain_conv(want))

        def range_hits(lo: str, hi: str) -> bool:
            # chunk covers some requested conv c iff lo <= c <= hi:
            # binary search on the sorted conv set — O(log |want|) per
            # entry, so a 10^6-conversation fetch plans in ~20
            # comparisons per chunk
            i = bisect.bisect_left(want, lo)
            return i < len(want) and want[i] <= hi

        files: list[str] = []
        entries = m.get("data_files")
        if entries is None:
            if m.get("data_file") and bloom_hits(m["data_file"]):
                files.append(m["data_file"])
        else:
            for e in entries:
                # tuple range projected onto the conv component
                if (range_hits(str(e["key_lo"][0]), str(e["key_hi"][0]))
                        and bloom_hits(e["file"])):
                    files.append(e["file"])
        # merge-on-read deltas carry key ranges too; a delta whose range
        # covers a requested conv may hold a NEWER version of the key, so
        # it must join the plan (lookup_keys reduces winners after read)
        for e in m.get("delta_files", []):
            if (range_hits(str(e["key_lo"][0]), str(e["key_hi"][0]))
                    and bloom_hits(e["file"])):
                files.append(e["file"])
        if files:
            out[pid] = {"files": files, "convs": want}
    return out


def lookup_keys(cfg: JobConfig, conv_ids: list[str],
                turn_idx: list[int] | None = None,
                visible_only: bool = True) -> pa.Table:
    """Rows for the requested keys, (conv_id, turn_idx)-sorted.

    ``turn_idx=None``: every turn of each conversation (conv-level).
    ``turn_idx`` given (parallel to ``conv_ids``): exactly those turns —
    and the only form that routes to single partitions under the salted
    ``partition_mode="key"`` layout.
    ``visible_only``: the user-facing shape — LWW winners minus tombstones
    (row kernel) or the per-key cell fold (cell kernel: the plan fetched
    every file whose range/bloom covers a key, so the candidate set holds
    the key's COMPLETE determiner rows — the precondition
    ``finalize_visible`` documents).  False returns internal state rows
    (one winner per key, or the determiner set under the cell kernel).
    """
    if turn_idx is not None and len(turn_idx) != len(conv_ids):
        raise ValueError("turn_idx must parallel conv_ids")
    kernel = LakeMeta(cfg.lake_dir).merge_kernel()
    files = candidate_files(cfg, conv_ids, turn_idx)
    want = sorted(set(conv_ids))
    tables = []
    for rel in files:
        # row-group pruning: Parquet stats skip row groups with no match
        t = pq.read_table(str(Path(cfg.lake_dir) / rel),
                          filters=[("conv_id", "in", want)])
        if t.num_rows:
            tables.append(t)
    if not tables:
        from migration_pair_ray.schemas import CHANGE_SCHEMA
        out = CHANGE_SCHEMA.empty_table()
    else:
        out = pa.concat_tables(tables, promote_options="permissive")
    if out.num_rows:
        # under merge-on-read a key can appear in the base AND in deltas;
        # the plan fetched every file whose range covers the key, so one
        # kernel reduce yields the true winner set (no-op on copy-on-write
        # lakes: state files already hold the reduced form)
        out = reduce_events(out, kernel)
    if turn_idx is not None and out.num_rows:
        key = pc.binary_join_element_wise(
            out.column("conv_id"),
            pc.cast(out.column("turn_idx"), pa.string()), "\x00")
        want_keys = pa.array([f"{c}\x00{t}" for c, t in zip(conv_ids, turn_idx)])
        out = out.filter(pc.is_in(key, value_set=want_keys))
    if visible_only:
        out = finalize_visible(out, kernel)
    return out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _fetch_pid_table(lake_dir: str, rels: list[str], want: list[str],
                     kernel: str, visible_only: bool,
                     schema: pa.Schema) -> pa.Table:
    """One partition's rows for the requested conversations: pruned file
    reads (Parquet row-group stats skip non-matching groups), one kernel
    reduce (base + MoR deltas fold to true winners), optional visibility
    finalize.  Valid per-partition: a key lives in exactly one partition
    and the plan fetched every covering file, so the fold sees each key's
    complete row set.

    ``schema`` is the footer-unified schema of EVERY planned file (driver-
    computed): each task conforms to it before the fold, so every block
    of the Dataset union carries the same columns in the same order —
    schema evolution can otherwise leave one partition's state without a
    later column (or with a different field order), and the empty branch
    goes through the same conform+finalize so a bloom false positive
    cannot emit a differently-shaped block."""
    from migration_pair_ray.schemas import conform_batch
    tables = []
    for rel in rels:
        t = pq.read_table(str(Path(lake_dir) / rel),
                          filters=[("conv_id", "in", want)])
        if t.num_rows:
            tables.append(conform_batch(t, schema))
    out = (pa.concat_tables(tables) if tables else schema.empty_table())
    if out.num_rows:
        out = reduce_events(out, kernel)
    if visible_only:
        out = finalize_visible(out, kernel)
    return out


def fetch_conversations(cfg: JobConfig, conv_ids: list[str],
                        visible_only: bool = True) -> "object":
    """Bulk conversation fetch: the DISTRIBUTED sibling of ``lookup_keys``
    — returns a ``ray.data.Dataset`` of the requested conversations'
    visible rows, reading only the partitions/chunks the routing plan
    names (``candidate_files_by_pid``).

    The middle ground the module docstring promises: point lookups stay
    driver-side (latency path), full extractions use ``read_lake`` — a
    10^3–10^6-conversation fetch wants BOTH pruning and parallelism, so
    each planned partition becomes one Ray task that reads its pruned
    files, folds winners per kernel, and filters to the conv set.  Under
    mode "conv"/"hot" (cold convs) the plan touches only the routed
    partitions — and each task receives only ITS convs, not the full
    request; salted layouts fan out to all partitions but still prune
    chunks by key range + bloom.  Raw Ray tasks by design: a
    manifest-planned per-partition read is not expressible as a Dataset
    source without materializing the plan anyway."""
    import ray
    import ray.data as rd
    from migration_pair_ray.sources.changelog import unified_schema

    meta = LakeMeta(cfg.lake_dir)
    kernel = meta.merge_kernel()
    plan = candidate_plan(cfg, conv_ids)
    if not plan:
        from migration_pair_ray.schemas import CHANGE_SCHEMA
        empty = CHANGE_SCHEMA.empty_table()
        if visible_only:
            empty = finalize_visible(empty, kernel)
        return rd.from_arrow(empty)
    # one footer-read pass unifies the planned files' schemas (evolution:
    # a partition untouched since before a column appeared must still emit
    # union-compatible blocks)
    paths = [str(Path(cfg.lake_dir) / r)
             for e in plan.values() for r in e["files"]]
    schema = unified_schema(paths)
    # per-pid conv subsets come from the plan: under routed layouts each
    # partition holds only its own convs — shipping the full request to
    # every task is O(P·|want|); a mixed hot-mode request ships the cold
    # convs only to their routed partition (whales to all)
    fn = ray.remote(num_cpus=1)(_fetch_pid_table)
    refs = [fn.remote(cfg.lake_dir, e["files"], e["convs"], kernel,
                      visible_only, schema)
            for pid, e in sorted(plan.items())]
    return rd.from_arrow_refs(refs)
