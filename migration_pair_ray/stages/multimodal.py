"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (PIL/ffmpeg/torchaudio are not in
this container): ``decode=`` accepts a callable so a real decoder drops in
unchanged; the default deterministic fake derives "features" from the raw
bytes so the Ray-side plumbing — schema, actor-pool stage shape, batch
sizing for large payloads, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("payload", pa.binary()),       # the opaque blob
    pa.field("media_type", pa.string()),    # "image" | "audio" | "video"
    pa.field("meta", pa.string()),          # JSON sidecar (w/h, codec, ...)
])


def fake_payload_from_text(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id", media_type: str = "image"
                           ) -> pa.Table:
    """Deterministic synthetic media table from a text table (test fixture:
    payload = utf-8 bytes; meta = byte length)."""
    texts = batch.column(text_col).to_pylist()
    payloads = [(t or "").encode("utf-8") for t in texts]
    metas = ['{"n_bytes": %d}' % len(p) for p in payloads]
    return pa.table({
        "media_id": batch.column(id_col),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array([media_type] * len(payloads), pa.string()),
        "meta": pa.array(metas, pa.string()),
    })


def _default_fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """STUB decoder: a real implementation would be e.g.
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``.  The fake is
    deterministic: 8 float32 features from the sha256 of the bytes."""
    h = hashlib.sha256(payload).digest()
    return (np.frombuffer(h[:32], dtype=np.uint32).astype(np.float32)
            / np.float32(2**32))


class MediaFeatureExtractor:
    """Actor-pool stage (``map_batches(MediaFeatureExtractor, concurrency=N,
    batch_size=small)``): decode + featurize binary payloads.

    Actor state (a real model / codec context) loads once in ``__init__``.
    Large payloads ⇒ pass a SMALL ``batch_size`` (tens of rows) so
    batch × concurrency fits worker heaps; blocks of binary columns stay
    in Arrow end-to-end (no pandas object dtype round trip).
    """

    def __init__(self, decode=None):
        self.decode = decode or _default_fake_decode  # model load goes here

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        feats = [self.decode(p or b"", t) for p, t in zip(payloads, types)]
        n_bytes = [len(p or b"") for p in payloads]
        return pa.table({
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


def media_byte_stats(batch: pa.Table) -> pa.Table:
    """Pure-Arrow metadata extraction (no decode): payload byte length —
    SQL-mirrorable via octet_length(...)."""
    import pyarrow.compute as pc
    return pa.table({
        "media_id": batch.column("media_id"),
        "media_type": batch.column("media_type"),
        "n_bytes": pc.cast(pc.binary_length(batch.column("payload")), pa.int64()),
    })
