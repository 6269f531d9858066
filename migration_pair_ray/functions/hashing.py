"""Deterministic vectorized hashing primitives: stable 64-bit string hash,
MinHash signatures, SimHash.  All numpy-vectorized per batch; all seeds
fixed → identical results on every node/process (a requirement for
hash-partitioned dedup at cluster scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def stable_hash64(values) -> np.ndarray:
    """Process-stable 64-bit hash of a string sequence (SipHash via pandas
    with its fixed default key)."""
    arr = np.asarray(pd.Series(values, dtype=object).fillna(""), dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling k-character shingles → stable hashes (one doc)."""
    if not text or len(text) < k:
        return stable_hash64([text or ""])
    sh = [text[i:i + k] for i in range(len(text) - k + 1)]
    return np.unique(stable_hash64(sh))


class MinHasher:
    """n_perm universal-hash MinHash over character shingles.

    Signature of doc D = [ min_{s in shingles(D)} (a_i * s + b_i mod p) ]_i.
    Mergeable (elementwise min) and deterministic (seeded a, b).
    """

    def __init__(self, n_perm: int = 64, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_MERSENNE), size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.k)  # (m,)
        # (n_perm, m) universal hashes, min over shingles — all uint64 ops
        with np.errstate(over="ignore"):
            hv = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return hv.min(axis=1)

    def signatures(self, texts) -> np.ndarray:
        return np.stack([self.signature(t or "") for t in texts])

    @staticmethod
    def jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


def band_hashes(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """LSH banding: (n_docs, n_perm) signatures → (n_docs, n_bands) band
    bucket hashes.  Two docs sharing any band bucket are candidates."""
    n_docs, n_perm = sigs.shape
    rows = n_perm // n_bands
    out = np.empty((n_docs, n_bands), dtype=np.uint64)
    for b in range(n_bands):
        seg = sigs[:, b * rows:(b + 1) * rows]
        acc = np.zeros(n_docs, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in range(seg.shape[1]):
                acc = acc * np.uint64(1099511628211) + seg[:, c]
        out[:, b] = acc
    return out


def simhash64(texts, k: int = 4) -> np.ndarray:
    """64-bit SimHash over k-char shingles: bit i = sign of the sum of
    (+1/-1) votes from each shingle hash's bit i."""
    out = np.empty(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = shingle_hashes(t or "", k)
        votes = (((sh[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1).sum(axis=0)
        out[i] = np.uint64(0) if len(sh) == 0 else np.packbits(
            (votes > 0).astype(np.uint8)[::-1], bitorder="little").view(np.uint64)[0]
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    while x.any():
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def ngram_set(text: str, n: int = 3) -> set:
    t = text or ""
    if len(t) < n:
        return {t}
    return {t[i:i + n] for i in range(len(t) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = ngram_set(a, n), ngram_set(b, n)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))
