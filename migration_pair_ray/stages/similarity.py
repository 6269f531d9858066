"""Similarity search over embedding columns (list<float>) — Dataset ops.

* ``brute_force_topk`` — the exactness baseline: broadcast the query matrix
  once (``ray.put``), each batch computes a numpy matmul and emits only its
  local top-k, a tiny final reduce merges them.  Shuffle-free.
* ``ivf_topk`` — the scale path: coarse k-means centroids (computed on a
  sample, broadcast), each vector assigned to its nearest centroid
  (= bucket); queries probe only ``n_probe`` buckets, so a 10^10-row
  corpus reads a fraction of its blocks per query.
* ``embedding_dedup`` — cosine near-dup: random-hyperplane LSH bucket key,
  within-bucket pairwise cosine, connected components, keep min id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(n, d) float32 matrix from a list<float> column — zero-copy flatten
    for Arrow list types; Ray's tensor-extension columns (from_pandas with
    ndarray cells) go through their numpy view."""
    arr = batch.column(col)
    ca = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if (pa.types.is_list(ca.type) or pa.types.is_large_list(ca.type)
            or pa.types.is_fixed_size_list(ca.type)):
        flat = np.asarray(ca.flatten(), dtype=np.float32)
        return flat.reshape(batch.num_rows, -1)
    m = np.asarray(ca.to_numpy(zero_copy_only=False).tolist(), dtype=np.float32)
    return m.reshape(batch.num_rows, -1)


def _l2_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(ds: "ray.data.Dataset", queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     round_to: int | None = 6) -> pa.Table:
    """Exact cosine top-k of every query against the corpus.

    Returns a table (query_id, vec_id, cos) with k rows per query, ordered
    by (query_id, -cos, vec_id).  ``round_to`` rounds cosines so results
    are comparable across float implementations (e.g. a SQL oracle).
    """
    qn = _l2_normalize(np.asarray(queries, dtype=np.float32))
    ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)                                   # (nq, d) once per task
        m = _l2_normalize(_batch_matrix(batch, vec_col))   # (n, d)
        cos = q @ m.T                                      # (nq, n)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        nq, n = cos.shape
        # margin over k: the global selection re-ranks on ROUNDED cosine
        # (tie-broken by id), so near-boundary candidates must survive the
        # local unrounded cut
        kk = min(3 * k, n)
        part = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(nq), kk)
        cols = part.reshape(-1)
        return pa.table({
            "query_id": pa.array(rows.astype(np.int64)),
            id_col: pa.array(ids[cols]),
            "cos": pa.array(cos[rows, cols].astype(np.float64)),
        })

    # per-batch top-k shrinks each block to nq*k rows; the driver-side merge
    # touches only those partials (never the corpus)
    partials = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    empty_schema = pa.schema([pa.field("query_id", pa.int64()),
                              pa.field(id_col, pa.int64()),
                              pa.field("cos", pa.float64())])
    if not partials:   # empty corpus / empty IVF shortlist
        return empty_schema.empty_table()
    t = pa.Table.from_pylist(partials, schema=empty_schema)
    import pyarrow.compute as pc
    if round_to is not None:
        t = t.set_column(t.schema.get_field_index("cos"), "cos",
                         pc.round(t.column("cos"), ndigits=round_to, round_mode="half_towards_infinity"))
    t = t.sort_by([("query_id", "ascending"), ("cos", "descending"),
                   (id_col, "ascending")])
    # keep k per query
    out_chunks = []
    for qid in range(int(pc.max(t.column("query_id")).as_py()) + 1):
        sub = t.filter(pc.equal(t.column("query_id"), qid))
        out_chunks.append(sub.slice(0, k))
    return pa.concat_tables(out_chunks)


def kmeans_centroids(sample: np.ndarray, n_clusters: int, n_iter: int = 10,
                     seed: int = 11) -> np.ndarray:
    """Tiny deterministic k-means (numpy, driver-side on a sample) — the
    coarse quantizer for IVF."""
    rng = np.random.default_rng(seed)
    x = _l2_normalize(np.asarray(sample, dtype=np.float32))
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(n_iter):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _l2_normalize(cent)
    return cent


def ivf_topk(ds: "ray.data.Dataset", queries: np.ndarray, k: int = 10,
             n_clusters: int = 16, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             sample_size: int = 2048, round_to: int | None = 6) -> pa.Table:
    """IVF-style ANN: centroids from a corpus sample (broadcast once);
    blocks filter themselves to vectors whose centroid is probed by ANY
    query, then brute-force within the shortlist.  At cluster scale the
    corpus would be *written* bucket-partitioned so probing reads only
    n_probe/n_clusters of the data; here the filter happens at scan time."""
    sample = [r[vec_col] for r in ds.take(sample_size)]
    cent = kmeans_centroids(np.asarray(sample), n_clusters)
    qn = _l2_normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]     # (nq, n_probe)
    probed = np.unique(probes.reshape(-1))
    ref = ray.put((cent, set(probed.tolist())))

    def shortlist(batch: pa.Table) -> pa.Table:
        c, keep = ray.get(ref)
        m = _l2_normalize(_batch_matrix(batch, vec_col))
        assign = (m @ c.T).argmax(axis=1)
        mask = np.isin(assign, list(keep))
        return batch.filter(pa.array(mask))

    short = ds.map_batches(shortlist, batch_format="pyarrow")
    return brute_force_topk(short, queries, k=k, vec_col=vec_col,
                            id_col=id_col, round_to=round_to)


def embedding_dedup(ds: "ray.data.Dataset", threshold: float = 0.98,
                    n_planes: int = 8, vec_col: str = "embedding",
                    id_col: str = "vec_id", seed: int = 5) -> "ray.data.Dataset":
    """Cosine near-duplicate removal: seeded random-hyperplane LSH buckets,
    exact pairwise cosine within buckets, connected components, keep the
    minimum id per component."""
    from migration_pair_ray.stages.dedup import (
        _pairs_from_buckets, connected_components, drop_cluster_losers)
    import pandas as pd

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _l2_normalize(_batch_matrix(batch, vec_col))
        rng = np.random.default_rng(seed)                 # seeded → same planes everywhere
        planes = rng.standard_normal((m.shape[1], n_planes)).astype(np.float32)
        bits = (m @ planes) > 0
        key = (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return pa.table({
            "bucket": pa.array(key),
            "doc_id": batch.column(id_col),
            "vec": pa.array([v.tolist() for v in m], pa.list_(pa.float32())),
        })

    cand = ds.map_batches(bucketize, batch_format="pyarrow")

    def verify(bucket: pd.DataFrame, i: int, j: int):
        a = np.asarray(bucket["vec"].iloc[i], dtype=np.float32)
        b = np.asarray(bucket["vec"].iloc[j], dtype=np.float32)
        cos = float(a @ b)
        return cos if cos >= threshold else None

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset="doc_id")
        return _pairs_from_buckets(g, verify)

    pairs = cand.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    clusters = connected_components(pairs)
    return drop_cluster_losers(ds, clusters, id_col=id_col)
