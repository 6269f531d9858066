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

import numpy as np
import pyarrow as pa

import ray.data

from migration_pair_ray.functions.hashing import stable_hash64


def hll_registers(values, p: int = 12) -> np.ndarray:
    """HyperLogLog register array (length 2^p, uint8) for a value batch:
    register[top-p hash bits] = max(position of first 1-bit in the rest)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = stable_hash64(values)
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
