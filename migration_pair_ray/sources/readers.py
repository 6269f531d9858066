"""Source readers beyond Parquet/CSV — JSON lines, raw text, binary files.

The reference reads exactly one format (CSV, ``Tasks/Insertion.cs:54-64``);
a complete engine ingests whatever the lake's producers emit.  Each reader
returns a Dataset normalized to the requested schema (by name, reference
conversion semantics — see functions/normalize.py), so every downstream
pipeline is format-agnostic.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from migration_pair_ray.functions.normalize import make_normalizer


def read_jsonl(paths: str | list[str], schema: pa.Schema | None = None,
               **kwargs) -> "ray.data.Dataset":
    """JSON-lines source; optional normalization to ``schema``."""
    ds = ray.data.read_json(paths, **kwargs)
    if schema is not None:
        ds = ds.map_batches(make_normalizer(schema), batch_format="pyarrow")
    return ds


def read_text_documents(paths: str | list[str], **kwargs) -> "ray.data.Dataset":
    """Plain-text corpus → documents-shaped rows (doc_id, text).
    doc_id = stable hash of the line content (deterministic across runs and
    nodes — NOT the line number, which depends on file split)."""
    from migration_pair_ray.functions.hashing import stable_hash64
    import numpy as np

    ds = ray.data.read_text(paths, **kwargs)

    def to_docs(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        ids = stable_hash64(texts.to_pylist()).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids), "text": texts})

    return ds.map_batches(to_docs, batch_format="pyarrow")


def read_media_files(paths: str | list[str], media_type: str = "image",
                     **kwargs) -> "ray.data.Dataset":
    """Binary files → the MEDIA_SCHEMA used by stages/multimodal.py
    (media_id = stable hash of the file path; payload = raw bytes)."""
    from migration_pair_ray.functions.hashing import stable_hash64
    import numpy as np

    ds = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def to_media(batch: pa.Table) -> pa.Table:
        p = batch.column("path")
        ids = stable_hash64(p.to_pylist()).astype(np.int64)
        n = batch.num_rows
        meta = pa.array([f'{{"path": "{v}"}}' for v in p.to_pylist()], pa.string())
        return pa.table({
            "media_id": pa.array(ids),
            "payload": batch.column("bytes").cast(pa.binary()),
            "media_type": pa.array([media_type] * n, pa.string()),
            "meta": meta,
        })

    return ds.map_batches(to_media, batch_format="pyarrow")
