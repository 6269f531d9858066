"""Mergeable sketches — approximate aggregates for the 10^10-row regime.

``approx_distinct`` is the canonical shape: a HyperLogLog register array is
built PER BLOCK inside ``map_batches`` (vectorized ``np.maximum.at``), the
tiny per-block partials (2^p bytes each) flow to one elementwise-max merge,
and only the estimate leaves.  No shuffle, no distinct-value exchange —
the exact-distinct alternative moves every unique value through a groupby.

Deterministic: hashing is the process-stable SipHash used everywhere else
in the engine, so the same input produces the same registers (and estimate)
on any cluster shape — merge order is irrelevant because max is
commutative/associative/idempotent (the mergeability contract of every
sketch in this family).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from migration_pair_ray.functions.hashing import stable_hash64


def md5_hash64(values) -> np.ndarray:
    """SQL-mirrorable 64-bit hash: the first 8 bytes (big-endian) of
    md5(utf-8(s)) — DuckDB: ``('0x' || substr(md5(s), 1, 16))::UBIGINT``.
    Slower than ``stable_hash64`` (per-value digest); used only where a
    relational oracle must reproduce the hash bit-for-bit."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, s in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.md5(str(s).encode("utf-8")).digest()[:8], "big")
    return out


def hll_registers(values, p: int = 12, hash64=None) -> np.ndarray:
    """HyperLogLog register array (length 2^p, uint8) for a value batch:
    register[top-p hash bits] = max(position of first 1-bit in the rest)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = (hash64 or stable_hash64)(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)           # remaining 64-p bits, left-aligned
    # rho = 1 + number of leading zeros in `rest` (capped at 64-p+1)
    lz = np.full(len(h), 64 - p, dtype=np.uint8)
    mask = rest != 0
    if mask.any():
        # float64 log2 is exact for the leading-bit position of a uint64
        # that keeps < 2^53 significant bits after the shift; use bit
        # scanning via conversion to avoid precision traps
        r = rest[mask]
        pos = np.zeros(len(r), dtype=np.uint8)
        cur = r.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            high = cur >> np.uint64(64 - shift)
            zero_high = high == 0
            pos[zero_high] += shift
            cur[zero_high] = cur[zero_high] << np.uint64(shift)
        lz_m = np.minimum(pos, 64 - p)
        lz[mask] = lz_m
    rho = lz.astype(np.uint8) + 1
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    inv = np.ldexp(1.0, -regs.astype(np.int64))
    est = alpha * m * m / inv.sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)


def hll_estimate_portable(regs: np.ndarray) -> int:
    """Bit-portable HLL estimate: the inverse-power sum Σ 2^-reg is kept
    as the EXACT integer Σ 2^(64-reg) (fits int128 for p ≤ 14), so the
    only float operations are one division, the alpha product, and —
    in the small-range branch — one ``ln``; every step is mirrorable in
    SQL (HUGEINT sum + one DOUBLE divide + FLOOR), making the estimate of
    a probabilistic sketch oracle-checkable.  Use with p ≥ 7 (the alpha
    closed form)."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    inv_scaled = 0
    for r in np.asarray(regs, dtype=np.int64):
        inv_scaled += 1 << (64 - int(r))
    est = alpha * m * m * 18446744073709551616.0 / float(inv_scaled)
    zeros = int((np.asarray(regs) == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return int(math.floor(est))


def approx_distinct_portable(ds: "ray.data.Dataset", col: str,
                             p: int = 10) -> tuple[int, int]:
    """``approx_distinct`` in its SQL-portable configuration: values are
    stringified (CAST(x AS VARCHAR) semantics), hashed with ``md5_hash64``
    and estimated with ``hll_estimate_portable`` — a relational engine
    running the same md5/register/floor arithmetic reproduces the estimate
    bit-for-bit.  Same scale shape as ``approx_distinct``: per-block
    register partials (2^p bytes each, deduped with ``np.unique`` before
    hashing), one elementwise-max merge.  Returns (estimate, non-null
    row count)."""
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column(col).drop_null()
        vals = pc.cast(arr, pa.string()).to_pylist()
        uniq = np.unique(np.asarray(vals, dtype=object)) if vals else []
        regs = hll_registers(uniq, p, hash64=md5_hash64)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary(m)),
                         "n": pa.array([len(arr)], pa.int64())})

    merged = np.zeros(m, dtype=np.uint8)
    n_rows = 0
    for t in (ds.map_batches(partial, batch_format="pyarrow")
                .iter_batches(batch_size=None, batch_format="pyarrow")):
        for buf in t.column("regs").to_pylist():
            merged = hll_merge(merged, np.frombuffer(buf, dtype=np.uint8))
        n_rows += int(pc.sum(t.column("n")).as_py())
    return hll_estimate_portable(merged), n_rows


def approx_distinct(ds: "ray.data.Dataset", col: str, p: int = 12) -> float:
    """Approximate distinct count of ``col`` (relative error ≈ 1.04/√2^p,
    ~1.6% at the default p=12): per-block register partials → one tiny
    elementwise-max merge on the driver → estimate."""
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_pylist()
        return pa.table({"regs": pa.array([hll_registers(vals, p).tobytes()],
                                          pa.binary(m))})

    merged = np.zeros(m, dtype=np.uint8)
    for t in (ds.map_batches(partial, batch_format="pyarrow")
                .iter_batches(batch_size=None, batch_format="pyarrow")):
        for buf in t.column("regs").to_pylist():
            merged = hll_merge(merged, np.frombuffer(buf, dtype=np.uint8))
    return hll_estimate(merged)
