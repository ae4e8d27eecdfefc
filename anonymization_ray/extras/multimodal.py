"""Multimodal column plumbing: opaque binary media + typed metadata.

The container ships no image/audio codecs, so the decode kernels are STUBS
(clearly marked; they raise unless ``fake=True`` substitutes a deterministic
fake decoder). Everything around them — schema, actor-pool signature, small
batch sizing for MB-scale payloads, output layout — is real and tested, so
swapping in a real codec is a one-function change.

Schema convention:
    media: binary            (opaque payload)
    media_meta: struct<mime: string, width: int32, height: int32,
                       duration_ms: int32>
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_META_TYPE = pa.struct(
    [
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def attach_fake_media(
    ds: rd.Dataset, id_col: str, *, payload_bytes: int = 4096
) -> rd.Dataset:
    """Deterministic fake media column (content = id-seeded bytes) so the
    plumbing can be exercised without codecs."""

    def _attach(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        payloads = []
        metas = []
        for i in ids:
            seed = hashlib.md5(str(i).encode()).digest()
            payloads.append((seed * (payload_bytes // len(seed) + 1))[:payload_bytes])
            metas.append(
                {"mime": "image/fake", "width": 64, "height": 64, "duration_ms": 0}
            )
        batch = batch.append_column("media", pa.array(payloads, pa.binary()))
        return batch.append_column("media_meta", pa.array(metas, MEDIA_META_TYPE))

    return ds.map_batches(_attach, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool callable: decode + feature-extract media payloads.

    Real deployments load the codec/model once here (``__init__`` runs once
    per actor). In this container the decode step is a STUB: ``fake=True``
    produces deterministic pseudo-features from the payload hash;
    ``fake=False`` raises NotImplementedError (no image/audio libs baked in).
    """

    def __init__(self, *, fake: bool = True, feature_dim: int = 16) -> None:
        self._fake = fake
        self._dim = feature_dim
        # real version: self._model = load_model(...); self._codec = ...

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self._fake:
            raise NotImplementedError(
                "media decode requires an image/audio codec not present in "
                "this environment; run with fake=True for plumbing tests"
            )
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * (self._dim * 8 // len(h) + 1))[: self._dim * 8], dtype=np.uint64)
        return (raw % 1000).astype(np.float32) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("media").to_pylist()
        feats = [self._decode(p) for p in payloads]
        out = batch.drop_columns(["media"])  # payload never travels past decode
        return out.append_column(
            "media_features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


def decode_media(
    ds: rd.Dataset,
    *,
    fake: bool = True,
    feature_dim: int = 16,
    concurrency=(1, 4),
    batch_size: int = 64,  # small: payloads are MB-scale in real data
) -> rd.Dataset:
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": fake, "feature_dim": feature_dim},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
