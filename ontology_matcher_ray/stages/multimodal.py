"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride Ray Data as ``binary`` columns with metadata
columns alongside (SURVEY's training-data extensions).  The REAL parts
here — schema, batch sizing, actor-pool signature, output layout — are
production-shaped; the codec itself is stubbed because no image/audio
libraries exist in this container:

* ``decode_stub="deterministic"`` produces a seeded fake feature vector
  from the payload bytes (stable across runs/workers, usable in tests);
* ``decode_stub="raise"`` raises ``NotImplementedError`` at the exact
  place a real ``PIL.Image.open``/``soundfile.read`` call would go.

Batches stay SMALL (default 64) because payload bytes dominate memory:
batch_size * payload * concurrency must fit each worker's heap.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd

import ray.data as rd


def synthesize_media_table(
    n_rows: int, payload_bytes: int = 4096, seed: int = 42
) -> pd.DataFrame:
    """Deterministic fake media table: (media_id, kind, payload, width,
    height, duration_ms).  Payload bytes are blake2b-stream generated."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        h = hashlib.blake2b(b"media%d:%d" % (seed, i), digest_size=32).digest()
        payload = (h * (payload_bytes // 32 + 1))[:payload_bytes]
        rows.append(
            {
                "media_id": i,
                "kind": kinds[i % 3],
                "payload": payload,
                "width": 64 + (i % 8) * 32,
                "height": 64 + (i % 5) * 32,
                "duration_ms": (i % 30) * 1000,
            }
        )
    return pd.DataFrame(rows)


class MediaFeaturizer:
    """Actor-pool stage: decode + feature-extract binary payloads.

    Real deployments put model/codec loading in ``__init__`` (once per
    actor) and batched decode in ``__call__``.  Emits
    (media_id, kind, feat: list<float32>[dim], payload_sha256).
    """

    def __init__(self, dim: int = 16, decode_stub: str = "deterministic"):
        self.dim = dim
        self.decode_stub = decode_stub
        # real version: self.model = load_model(...); self.codec = ...

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decode_stub == "raise":
            raise NotImplementedError(
                "media decode requires an image/audio codec library not "
                "present in this environment (PIL/soundfile/av)"
            )
        # deterministic fake decode: bytes -> seeded feature vector
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        return rng.rand(self.dim).astype(np.float32)

    #: typed metadata columns that ride alongside the payload and pass
    #: through the featurizer unchanged (real pipelines keep them for
    #: downstream filtering/bucketing without re-decoding)
    PASSTHROUGH = ("width", "height", "duration_ms")

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        feats = [self._decode(p) for p in b["payload"]]
        out = {
            "media_id": b["media_id"].to_numpy(),
            "kind": b["kind"].to_numpy(),
            "feat": [f.tolist() for f in feats],
            "payload_sha256": [
                hashlib.sha256(p).hexdigest() for p in b["payload"]
            ],
        }
        for c in self.PASSTHROUGH:
            if c in b.columns:
                out[c] = b[c].to_numpy()
        return pd.DataFrame(out)


def featurize_media(
    ds: rd.Dataset, dim: int = 16, concurrency=(1, 4), batch_size: int = 64
) -> rd.Dataset:
    """The plumbing pipeline: small batches, actor pool, list<float> out."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs=dict(dim=dim),
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )
