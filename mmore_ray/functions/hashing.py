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
    """Vector form for a batch column; hashing is C-speed per row."""
    return [hashlib.sha256(v.encode("utf-8")).hexdigest() for v in values]
