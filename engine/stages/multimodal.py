"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode/resize/frame-sample kernels need codec libraries that are NOT in
this container, so the kernel itself is stubbed (deterministic fake behind
``fake=True``, ``NotImplementedError`` otherwise) — but the Ray-side
plumbing is real and tested: schema, actor-pool signature, batch sizing for
large binary payloads, typed metadata output layout.

Sizing note (memory-aware, per the build brief): binary payloads are large,
so these stages use SMALL batch sizes (default 32) and ``pyarrow`` batches
end-to-end — a 10 MB-mean image column at batch_size=1024 would put 10 GB
in one task's heap.
"""

from __future__ import annotations

from hashlib import blake2b
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),   # image | audio | video
        ("payload", pa.binary()),      # opaque encoded bytes
        ("mime", pa.string()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),
        ("width", pa.int32()),         # image/video; null for audio
        ("height", pa.int32()),
        ("duration_ms", pa.int64()),   # audio/video; null for image
        ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32())),  # embedding-like feature vector
    ]
)


class DecodeMedia:
    """Actor-pool stage: binary payload -> typed metadata + feature vector.

    ``__init__`` is where a real deployment loads the codec/model once per
    actor (PIL/ffmpeg/torchvision).  Here: ``fake=True`` derives
    deterministic pseudo-metadata from a blake2b of the payload so the
    pipeline shape (schemas, batching, downstream joins) is fully
    exercisable; ``fake=False`` raises NotImplementedError at decode time
    (clearly marked stub: no codec libs in this environment).
    """

    def __init__(self, fake: bool = True, feature_dim: int = 16):
        self.fake = fake
        self.dim = feature_dim

    def _fake_decode(self, media_id: str, mtype: str, payload: Optional[bytes]):
        h = blake2b(payload or b"", digest_size=16).digest()
        rs = np.random.RandomState(int.from_bytes(h[:4], "big"))
        feat = rs.standard_normal(self.dim).astype(np.float32)
        is_img = mtype == "image"
        is_audio = mtype == "audio"
        return {
            "media_id": media_id,
            "media_type": mtype,
            "width": None if is_audio else 16 + h[4] % 240,
            "height": None if is_audio else 16 + h[5] % 240,
            "duration_ms": None if is_img else 1000 + int.from_bytes(h[6:8], "big"),
            "n_frames": 1 if is_img else 1 + h[8] % 64,
            "feature": feat.tolist(),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "Real media decode requires codec libraries (PIL/ffmpeg) "
                "not present in this environment; construct with fake=True."
            )
        rows = [
            self._fake_decode(m, t, p)
            for m, t, p in zip(
                batch.column("media_id").to_pylist(),
                batch.column("media_type").to_pylist(),
                batch.column("payload").to_pylist(),
            )
        ]
        cols = {
            f.name: pa.array([r[f.name] for r in rows], type=f.type)
            for f in FEATURE_SCHEMA
        }
        return pa.table(cols, schema=FEATURE_SCHEMA)


def decode_media_dataset(
    ds: ray.data.Dataset, *, fake: bool = True, batch_size: int = 32, concurrency=(1, 2)
) -> ray.data.Dataset:
    """Media table -> feature table via an actor pool with small batches."""
    return ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs=dict(fake=fake),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic fake media table for tests (binary payloads)."""
    rs = np.random.RandomState(seed)
    types = ["image", "audio", "video"]
    ids, tys, payloads, mimes = [], [], [], []
    for i in range(n):
        t = types[i % 3]
        ids.append(f"m{i:04d}")
        tys.append(t)
        payloads.append(rs.bytes(64 + int(rs.randint(0, 256))))
        mimes.append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[t])
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(tys, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )
