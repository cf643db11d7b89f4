"""Hashing kernels.

The engine's deterministic content identity is **sha256(content)** (the
north-rule per-row lineage invariant).  The reference's
``MultimodalSample.id = str(hash(text))`` is process-salted and
nondeterministic (``src/mmore/type.py:89-90``) — treated as a bug, not
behavior to copy.  MD5 is kept for parity with the reference's
``TextHash`` tagger (``post_processor/tagger/hash.py:14``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def stable_u64(text: str) -> int:
    """Deterministic 64-bit hash of a string (first 8 bytes of sha1).

    Used for salting / bucketing keys in shuffles; stable across
    processes and machines, unlike Python's built-in ``hash``.
    """
    return int.from_bytes(hashlib.sha1(text.encode("utf-8")).digest()[:8], "big")


def sha256_column(values: Iterable[str]) -> list[str]:
    """Vector form for a batch column; hashing is C-speed per row.
    Nulls hash as '' — the SAME contract as sha256_of_string_array's
    nullable fallback, so the two vector forms agree on identity."""
    return [hashlib.sha256((v or "").encode("utf-8")).hexdigest()
            for v in values]


def stable_u64_of_string_array(arr) -> "np.ndarray":
    """:func:`stable_u64` over an Arrow string array, without
    materializing Python str copies: rows are hashed as memoryview
    slices of the utf-8 data buffer (same trick as
    :func:`sha256_of_string_array`), so the value per row is EXACTLY
    ``stable_u64(row)`` — shard assignments derived from it stay
    compatible with layouts produced by the scalar form."""
    import numpy as np
    import pyarrow as pa

    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    out = np.empty(len(arr), dtype=np.uint64)
    pos = 0
    for chunk in chunks:
        if chunk.null_count:  # nulls hash as '' (scalar-form contract)
            for v in chunk.to_pylist():
                out[pos] = stable_u64(v or "")
                pos += 1
            continue
        width = np.int64 if pa.types.is_large_string(chunk.type) else np.int32
        _, offsets_buf, data_buf = chunk.buffers()
        offsets = np.frombuffer(offsets_buf, dtype=width)[
            chunk.offset:chunk.offset + len(chunk) + 1]
        mv = memoryview(data_buf)
        for i in range(len(chunk)):
            out[pos] = int.from_bytes(
                hashlib.sha1(mv[offsets[i]:offsets[i + 1]]).digest()[:8],
                "big")
            pos += 1
    return out


def sha256_of_string_array(arr) -> list[str]:
    """sha256 hex per row of an Arrow string array WITHOUT materializing
    Python str/bytes copies: rows are hashed as memoryview slices of
    the array's utf-8 data buffer (the strings are already utf-8 on the
    wire, so this equals ``sha256(v.encode('utf-8'))``).  Cuts one full
    data-buffer copy from the 100-TB scan hot path."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        chunks = arr.chunks
    else:
        chunks = [arr]
    out: list[str] = []
    for chunk in chunks:
        if chunk.null_count:  # fall back for nullable content
            out.extend(hashlib.sha256((v or "").encode()).hexdigest()
                       for v in chunk.to_pylist())
            continue
        width = np.int64 if pa.types.is_large_string(chunk.type) else np.int32
        validity, offsets_buf, data_buf = chunk.buffers()
        # chunk.offset: a sliced array's offsets index into the shared buffer
        offsets = np.frombuffer(offsets_buf, dtype=width)[
            chunk.offset:chunk.offset + len(chunk) + 1]
        mv = memoryview(data_buf)
        out.extend(
            hashlib.sha256(mv[offsets[i]:offsets[i + 1]]).hexdigest()
            for i in range(len(chunk)))
    return out
