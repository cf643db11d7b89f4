"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.  The decode libraries (PIL, ffmpeg, torchaudio)
are NOT in this container, so the decode kernel is a clearly-marked
deterministic fake (sha-seeded) behind ``use_fake_decode=True`` — the
Ray-side plumbing (schema, actor signature, batch sizing, output
layout) is real and tested.  Swapping in a real decoder changes ONE
method (``_decode``), nothing about the pipeline.

Batch-size note (wide binary rows): payloads of B bytes at batch_size
N hold N×B in the actor heap — callers size ``batch_size`` so
N × B × concurrency fits the node (SURVEY §4 memory row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_META_STRUCT = pa.struct([
    ("format", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def fake_image_bytes(seed: int, width: int = 32, height: int = 32) -> bytes:
    """Deterministic opaque payload standing in for an encoded image."""
    rng = np.random.default_rng(seed)
    header = f"FAKEIMG:{width}x{height}:".encode()
    return header + rng.integers(0, 256, size=width * height,
                                 dtype=np.uint8).tobytes()


class ImageFeatureExtractor:
    """Actor-pool stage: binary image column → feature vector column.

    ``__init__`` loads the "model" once per actor (here: a seeded
    projection matrix; in production: a vision tower on num_gpus=1).
    """

    def __init__(self, dim: int = 16, use_fake_decode: bool = True,
                 seed: int = 42):
        if not use_fake_decode:
            raise NotImplementedError(
                "real image decode requires PIL/torchvision (not in env); "
                "pass use_fake_decode=True"
            )
        rng = np.random.default_rng(seed)
        self._proj = rng.standard_normal((32, dim))
        self._dim = dim

    def _decode(self, payload: bytes) -> np.ndarray:
        """FAKE decode: 32 deterministic moments from the payload's
        sha256 stream.  Replace with a real decoder to go live."""
        digest = hashlib.sha256(payload).digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("image_bytes").to_pylist():
            moments = self._decode(payload)
            feats.append((moments @ self._proj).tolist())
        return batch.append_column(
            "image_features", pa.array(feats, pa.list_(pa.float64())))


class FrameSampler:
    """Actor-pool stage: video binary → N sampled frame payloads
    (≙ reference thumbnail-every-sample_rate-seconds,
    media_processor.py:186).  Fake sampler slices the payload
    deterministically."""

    def __init__(self, n_frames: int = 4, use_fake_decode: bool = True):
        if not use_fake_decode:
            raise NotImplementedError("real frame sampling requires ffmpeg")
        self._n = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch.column("video_bytes").to_pylist():
            step = max(1, len(payload) // self._n)
            out.append([payload[i * step:(i + 1) * step][:64]
                        for i in range(self._n)])
        return batch.append_column(
            "frames", pa.array(out, pa.list_(pa.binary())))


def attach_image_meta(batch: pa.Table) -> pa.Table:
    """Parse the typed metadata of fake payloads (format/width/height)."""
    metas = []
    for payload in batch.column("image_bytes").to_pylist():
        if payload.startswith(b"FAKEIMG:"):
            dims = payload.split(b":", 2)[1].decode()
            w, h = (int(x) for x in dims.split("x"))
            metas.append({"format": "fake", "width": w, "height": h})
        else:
            metas.append({"format": "unknown", "width": 0, "height": 0})
    return batch.append_column("image_meta", pa.array(metas, IMAGE_META_STRUCT))


def clean_image_filter(min_side: int = 512) -> callable:
    """≙ reference clean_image (process/utils.py:61-92): drop images
    smaller than min_side (grayscale-variance check needs real decode —
    documented out of fake scope)."""

    def fn(batch: pa.Table) -> pa.Table:
        metas = batch.column("image_meta").to_pylist()
        mask = [m["width"] >= min_side and m["height"] >= min_side
                for m in metas]
        return batch.filter(pa.array(mask, pa.bool_()))

    return fn
