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


def fake_image_bytes(seed: int, width: int = 32, height: int = 32,
                     fill: int | None = None) -> bytes:
    """Deterministic opaque payload standing in for an encoded image;
    its body is the width×height grayscale plane (``fill`` produces a
    constant — i.e. low-variance — image for the clean_image check)."""
    header = f"FAKEIMG:{width}x{height}:".encode()
    if fill is not None:
        return header + bytes([fill]) * (width * height)
    rng = np.random.default_rng(seed)
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
        digest = hashlib.sha256(payload or b"").digest()
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
            payload = payload or b""
            step = max(1, len(payload) // self._n)
            out.append([payload[i * step:(i + 1) * step][:64]
                        for i in range(self._n)])
        return batch.append_column(
            "frames", pa.array(out, pa.list_(pa.binary())))


AUDIO_META_STRUCT = pa.struct([
    ("format", pa.string()),
    ("seconds", pa.int32()),
])


def fake_audio_bytes(seed: int, seconds: int = 30,
                     transcript: str = "") -> bytes:
    """Deterministic opaque payload standing in for encoded audio.
    The transcript rides INSIDE the fake payload so the fake ASR can
    "transcribe" it — end-to-end-testable plumbing, clearly fake."""
    rng = np.random.default_rng(seed)
    t = transcript.encode("utf-8")
    header = f"FAKEAUD:{seconds}:{len(t)}:".encode()
    return header + t + rng.integers(0, 256, size=seconds * 64,
                                     dtype=np.uint8).tobytes()


def fake_video_bytes(seed: int, seconds: int = 30,
                     transcript: str = "") -> bytes:
    """Fake video = header + embedded fake audio track + frame noise."""
    rng = np.random.default_rng(seed)
    audio = fake_audio_bytes(seed + 1, seconds, transcript)
    header = f"FAKEVID:{seconds}:{len(audio)}:".encode()
    return header + audio + rng.integers(0, 256, size=seconds * 256,
                                         dtype=np.uint8).tobytes()


def extract_audio_track(batch: pa.Table,
                        video_col: str = "video_bytes") -> pa.Table:
    """≙ the reference's moviepy audio extraction from video containers
    (media_processor.py:160-171) — fake container parsing: slice the
    embedded audio track out of FAKEVID payloads."""
    out = []
    for payload in batch.column(video_col).to_pylist():
        # null / truncated / malformed payloads take the unknown-codec
        # fallback instead of killing the whole batch task
        try:
            if payload and payload.startswith(b"FAKEVID:"):
                _, secs, alen, rest = payload.split(b":", 3)
                out.append(rest[:int(alen)])
            else:
                out.append(b"")
        except ValueError:
            out.append(b"")
    return batch.append_column("audio_bytes", pa.array(out, pa.binary()))


class AsrTranscriber:
    """Actor-pool ASR stage (≙ the reference's per-device whisper
    pipelines, media_processor.py:39-61,155-184): the model loads ONCE
    per actor in ``__init__``; ``__call__`` transcribes a batch of
    audio payloads into a text column.

    Production shape: ``map_batches(AsrTranscriber, concurrency=N,
    num_gpus=1, batch_size=small)`` — audio payloads are wide rows, so
    batch_size × payload × concurrency must fit the node.  Whisper is
    not in this container, so decode is the clearly-marked fake
    (reads the transcript embedded in FAKEAUD payloads); swapping in a
    real model changes ``_transcribe`` only."""

    def __init__(self, use_fake_decode: bool = True,
                 model: str = "whisper-large-v3-turbo"):
        if not use_fake_decode:
            raise NotImplementedError(
                "real ASR requires whisper/transformers (not in env); "
                "pass use_fake_decode=True")
        self._model = model  # loaded once per actor in production

    def _transcribe(self, payload: bytes) -> str:
        """FAKE decode: recover the transcript embedded in the fake
        payload; unknown payloads transcribe to '' (the reference's
        error path also yields '', media_processor.py:182-184)."""
        try:
            if payload and payload.startswith(b"FAKEAUD:"):
                _, secs, tlen, rest = payload.split(b":", 3)
                return rest[:int(tlen)].decode("utf-8")
        except (ValueError, UnicodeDecodeError):
            pass  # truncated/malformed: the reference error path is ''
        return ""

    # public provider contract (models.py asr role; WhisperTranscriber
    # implements the same method)
    def transcribe(self, payload: bytes) -> str:
        return self._transcribe(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [self._transcribe(p)
                 for p in batch.column("audio_bytes").to_pylist()]
        arr = pa.array(texts, pa.string())
        if "text" in batch.column_names:
            # doc-pipeline batches already carry 'text' — REPLACE it
            # (append would create a duplicate field and every later
            # batch.column('text') raises)
            return batch.set_column(
                batch.column_names.index("text"), "text", arr)
        return batch.append_column("text", arr)


def attach_audio_meta(batch: pa.Table) -> pa.Table:
    metas = []
    for payload in batch.column("audio_bytes").to_pylist():
        try:
            if payload and payload.startswith(b"FAKEAUD:"):
                secs = int(payload.split(b":", 2)[1])
                metas.append({"format": "fake", "seconds": secs})
                continue
        except (ValueError, IndexError):
            pass  # truncated header: unknown, not a crashed batch
        metas.append({"format": "unknown", "seconds": 0})
    return batch.append_column("audio_meta",
                               pa.array(metas, AUDIO_META_STRUCT))


def attach_image_meta(batch: pa.Table) -> pa.Table:
    """Parse the typed metadata of fake payloads (format/width/height)."""
    metas = []
    for payload in batch.column("image_bytes").to_pylist():
        try:
            if payload and payload.startswith(b"FAKEIMG:"):
                dims = payload.split(b":", 2)[1].decode()
                w, h = (int(x) for x in dims.split("x"))
                metas.append({"format": "fake", "width": w, "height": h})
                continue
        except (ValueError, IndexError, UnicodeDecodeError):
            pass  # truncated header: unknown, not a crashed batch
        metas.append({"format": "unknown", "width": 0, "height": 0})
    return batch.append_column("image_meta", pa.array(metas, IMAGE_META_STRUCT))


def clean_image_filter(min_side: int = 512,
                       min_variance: float = 100.0) -> callable:
    """≙ reference clean_image (process/utils.py:61-92): drop images
    smaller than min_side OR with grayscale variance < min_variance
    (near-uniform scans/blanks).

    The variance check decodes the ``FAKEIMG`` payload — its body IS a
    width×height grayscale plane, so the check is the real reference
    computation on the fake codec.  A real decoder drops in by
    replacing the payload branch only (payloads with an unknown codec
    keep the size-only behavior rather than guessing a variance)."""

    def fn(batch: pa.Table) -> pa.Table:
        metas = batch.column("image_meta").to_pylist()
        payloads = (batch.column("image_bytes").to_pylist()
                    if "image_bytes" in batch.column_names
                    else [None] * len(metas))
        mask = []
        for m, payload in zip(metas, payloads):
            ok = m["width"] >= min_side and m["height"] >= min_side
            if ok and payload and payload.startswith(b"FAKEIMG:"):
                parts = payload.split(b":", 2)
                if len(parts) == 3 and len(parts[2]):
                    gray = np.frombuffer(parts[2], dtype=np.uint8)
                    ok = float(gray.var()) >= min_variance
            mask.append(ok)
        return batch.filter(pa.array(mask, pa.bool_()))

    return fn
