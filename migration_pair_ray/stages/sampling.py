"""Deterministic sampling operators for training-data curation.

A sample drawn at 10^10 rows must be REPRODUCIBLE — the same rows on
every run, every cluster shape, every retry — or downstream training
sets silently drift.  Both operators here derive the pick from a stable
hash of a key column instead of RNG state:

- ``hash_sample``: Bernoulli p% sample = "key hash lands in p of 100
  residue classes".  An embarrassingly parallel filter — no shuffle, no
  coordination; ``ds.random_sample`` by contrast is run-dependent.
- ``stratified_sample``: per-stratum quota = the n rows of each stratum
  with the smallest key hashes (ties → smallest key): a deterministic
  "random n per group" with a per-block combiner so the shuffle carries
  at most n·|strata| rows per block, never the raw table.

``hash64=md5_hash64`` (functions/sketch.py) makes either pick
bit-mirrorable in SQL (DuckDB ``md5()`` + hex→UBIGINT arithmetic); the
default ``stable_hash64`` is the vectorized fast path.  Keys are
stringified (CAST(x AS VARCHAR) semantics) before hashing so both modes
agree with a relational mirror; null keys are the caller's problem
(filter them first — SQL NULL-comparison semantics can't be mirrored by
a hash of "None").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from migration_pair_ray.functions.hashing import stable_hash64


def _key_hash(t: pa.Table, key_col: str, hash64) -> np.ndarray:
    vals = pc.cast(t.column(key_col), pa.string()).to_pylist()
    return hash64(vals)


def hash_sample(ds: "ray.data.Dataset", key_col: str, rate_pct: int,
                hash64=stable_hash64) -> "ray.data.Dataset":
    """Keep rows whose stringified ``key_col`` hash satisfies
    ``h % 100 < rate_pct`` — a deterministic ~rate_pct% Bernoulli sample,
    pure per-block filter (no shuffle)."""

    def pick(t: pa.Table) -> pa.Table:
        h = _key_hash(t, key_col, hash64)
        return t.filter(pa.array(h % np.uint64(100)
                                 < np.uint64(rate_pct)))

    return ds.map_batches(pick, batch_format="pyarrow")


def stratified_sample(ds: "ray.data.Dataset", stratum_col: str,
                      key_col: str, n: int, hash64=stable_hash64,
                      n_coarse: int | None = None) -> "ray.data.Dataset":
    """Per-stratum quota sample: for every value of ``stratum_col`` keep
    the ``n`` rows with the smallest key hashes (tie → smallest key),
    with a 0-based ``rank`` column.  Each block first shrinks to its own
    per-stratum top-n (one vectorized sort + segment mask), then the
    coarse-bucket grouped top-N (stages/analytic.py) finishes — the
    exchange never carries more than n·|strata| rows per block."""
    from migration_pair_ray.stages.analytic import _key_segments, grouped_top_n

    def local(t: pa.Table) -> pa.Table:
        h = _key_hash(t, key_col, hash64)
        t = t.append_column("__h", pa.array(h, pa.uint64()))
        t = t.sort_by([(stratum_col, "ascending"), ("__h", "ascending"),
                       (key_col, "ascending")])
        _, pos = _key_segments(t, stratum_col)
        return t.filter(pa.array(pos < n))

    shrunk = ds.map_batches(local, batch_format="pyarrow")
    out = grouped_top_n(shrunk, stratum_col, "__h", n, descending=False,
                        tie_breakers=[key_col], n_coarse=n_coarse)
    return out.drop_columns(["__h"])


def shuffle_assign(ds: "ray.data.Dataset", key_col: str, n_shards: int,
                   hash64=stable_hash64) -> "ray.data.Dataset":
    """Deterministic global shuffle for training-order assignment: rank
    every row by a stable hash of its key and deal ranks round-robin into
    ``n_shards`` shards (``shard = rank % n_shards``, ``pos = rank //
    n_shards``).  The same rows land in the same shard at the same
    position on every run, every cluster shape, every retry —
    ``ds.random_shuffle`` by contrast is run-dependent and moves every
    byte through a full exchange twice (shuffle + later sort).

    Scale shape: ONE range-partitioned sort on the 8-byte hash (the only
    exchange; payload rides it once), then the global rank is the
    two-pass block prefix scan (stages/packing.py) — tiny per-block
    partials, no second shuffle.  Hash ties across block boundaries would
    trip the scan's disjointness gate loudly (never silent corruption);
    64-bit hashes of unique keys make that practically impossible.  With
    ``hash64=md5_hash64`` the full assignment is bit-mirrorable in SQL
    (``row_number() OVER (ORDER BY md5-u64(key))``).
    """
    from migration_pair_ray.stages.packing import add_token_offsets

    def prep(t: pa.Table) -> pa.Table:
        h = _key_hash(t, key_col, hash64)
        return (t.append_column("__h", pa.array(h, pa.uint64()))
                .append_column("__one",
                               pa.array(np.ones(t.num_rows, np.int64))))

    ranked = add_token_offsets(
        ds.map_batches(prep, batch_format="pyarrow").sort("__h"),
        count_col="__one", order_col="__h", offset_col="__rank")

    def finish(t: pa.Table) -> pa.Table:
        r = t.column("__rank").to_numpy(zero_copy_only=False)
        return (t.drop_columns(["__h", "__one", "__rank"])
                .append_column("shard", pa.array(r % n_shards, pa.int64()))
                .append_column("pos", pa.array(r // n_shards, pa.int64())))

    return ranked.map_batches(finish, batch_format="pyarrow")


def mixture_sample(ds: "ray.data.Dataset", stratum_col: str, key_col: str,
                   rates: dict, hash64=stable_hash64) -> "ray.data.Dataset":
    """Weighted corpus mixture: per-stratum Bernoulli rates (percent) —
    the sample that assembles a training mix from heterogeneous sources
    ("80% of web, 30% of forums, ...") in one deterministic pass.  Strata
    absent from ``rates`` are dropped.  Same scale shape as
    ``hash_sample``: a pure per-block filter, no shuffle, reproducible on
    any cluster shape; the per-row rate lookup is dictionary-encoded (one
    dict probe per DISTINCT stratum per block, not per row)."""

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = _key_hash(t, key_col, hash64)
        enc = pc.dictionary_encode(
            pc.cast(t.column(stratum_col), pa.string())).combine_chunks()
        uniq_rates = np.array(
            [int(rates.get(s, 0)) for s in enc.dictionary.to_pylist()],
            dtype=np.uint64)
        rate = uniq_rates[enc.indices.to_numpy(zero_copy_only=False)]
        return t.filter(pa.array(h % np.uint64(100) < rate))

    return ds.map_batches(pick, batch_format="pyarrow")
