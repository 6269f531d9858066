"""Sequence packing for LLM training corpora — a distributed prefix scan.

Training pipelines concatenate documents in a deterministic order and cut
the token stream every ``budget`` tokens; each document is assigned to the
pack (bin) its first token lands in.  The primitive underneath is a GLOBAL
exclusive prefix sum of per-doc token counts — an operator shape nothing
else in the engine needed: inherently sequential, made distributed with the
classic two-pass scan:

  pass 1: per-block partials (block min order key, block token total) —
          tiny, one row per block;
  driver: sort partials by order key, exclusive prefix over block totals
          (thousands of entries at most — blocks, not rows);
  pass 2: per-block, offset(row) = block prefix + within-block exclusive
          cumsum.  Vectorized, no shuffle at all.

Correctness requires pass 1 and pass 2 to see the SAME blocks, so the
input is materialized first (blocks of a materialized Dataset are stable
across consumptions).  At 100 TB the materialize becomes a Parquet
checkpoint (`pipelines.queries.checkpoint_parquet`) — the two-pass scan
itself only ever moves one tiny row per block.

Input contract: blocks are sorted and DISJOINT in ``order_col`` (true for
``read_parquet`` of a table sorted on that column, e.g. documents by
doc_id); asserted per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def add_token_offsets(ds: "ray.data.Dataset", count_col: str = "n_tokens",
                      order_col: str = "doc_id",
                      offset_col: str = "token_offset") -> "ray.data.Dataset":
    """Append the global exclusive prefix sum of ``count_col`` in
    ``order_col`` order: row r's ``offset_col`` = Σ counts of all rows with
    a smaller order key."""
    ds = ds.materialize()      # pin blocks so both passes see identical ones

    partials = ds.map_batches(
        lambda t: pa.table({
            "lo": pa.array([t.column(order_col)[0].as_py()] if t.num_rows else [],
                           t.schema.field(order_col).type),
            "hi": pa.array([t.column(order_col)[-1].as_py()] if t.num_rows else [],
                           t.schema.field(order_col).type),
            "total": pa.array(
                [int(pc.sum(pc.cast(t.column(count_col), pa.int64())).as_py() or 0)]
                if t.num_rows else [], pa.int64()),
        }), batch_format="pyarrow").take_all()
    partials.sort(key=lambda r: r["lo"])
    # disjointness gate: an overlap would silently corrupt every offset
    for a, b in zip(partials, partials[1:]):
        if not a["hi"] < b["lo"]:
            raise ValueError(
                f"add_token_offsets: blocks overlap in {order_col!r} "
                f"({a['hi']!r} >= {b['lo']!r}); input must be sorted and "
                f"block-disjoint on the order column")
    # dict lookup, not list.index: a linear scan per block is O(B^2) in
    # block count and at ~10^6 blocks the scans dominate the whole pass
    lo_prefix = {r["lo"]: int(p) for r, p in zip(
        partials,
        np.concatenate([[0], np.cumsum([r["total"] for r in partials])[:-1]])
        .astype(np.int64) if partials else [])}
    ref = ray.put(lo_prefix)

    def add(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(offset_col, pa.array([], pa.int64()))
        lo_prefix_ = ray.get(ref)
        lo = t.column(order_col)[0].as_py()
        base = lo_prefix_[lo]    # exact: pass-2 blocks == pass-1 blocks
        counts = pc.cast(t.column(count_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        order = t.column(order_col).to_numpy(zero_copy_only=False)
        if t.num_rows > 1 and not (order[:-1] <= order[1:]).all():
            raise ValueError(
                f"add_token_offsets: block not sorted by {order_col!r}")
        within = np.concatenate([[0], np.cumsum(counts)[:-1]])
        return t.append_column(
            offset_col, pa.array(base + within, type=pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def pack_bins(ds: "ray.data.Dataset", budget: int,
              count_col: str = "n_tokens", order_col: str = "doc_id",
              bin_col: str = "bin") -> "ray.data.Dataset":
    """Assign each document to its training pack: the token stream is cut
    every ``budget`` tokens and a doc belongs to the pack its first token
    lands in (``bin = token_offset // budget``) — the standard
    block-packing layout where documents straddle cut points."""
    ds = add_token_offsets(ds, count_col=count_col, order_col=order_col)
    return ds.map_batches(
        lambda t: t.append_column(bin_col, pa.array(
            t.column("token_offset").to_numpy(zero_copy_only=False) // budget,
            type=pa.int64())),
        batch_format="pyarrow")


def global_ranks(ds: "ray.data.Dataset", order_col: str,
                 rank_col: str = "rank") -> "ray.data.Dataset":
    """Append each row's 0-based GLOBAL rank in ``order_col`` order —
    ``row_number() OVER (ORDER BY order_col) - 1`` — without any
    all-gather: it is ``add_token_offsets`` with a unit count (the same
    two-pass block-partial prefix scan; input must be sorted and
    block-disjoint on ``order_col``, which ``ds.sort(order_col)``
    guarantees for unique keys).  The building block for deterministic
    range-sharded exports: shard = rank * n_shards // total."""

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__one", pa.array(np.ones(t.num_rows, np.int64)))

    out = add_token_offsets(ds.map_batches(ones, batch_format="pyarrow"),
                            "__one", order_col, rank_col)
    return out.map_batches(lambda t: t.drop_columns(["__one"]),
                           batch_format="pyarrow")
