"""Normalization / lineage stage.

Analogue of the reference's text processors for the code corpus
(`TextProcessor`/`MarkdownProcessor`, SURVEY §2.2): read content, attach
deterministic identity.  The per-row lineage invariant is
``content_sha256 = sha256(raw content)`` computed BEFORE any cleaning,
so it always equals ``sha256(content)`` of the *input* table (the
north-rule invariant; contrast mmore's process-salted
``str(hash(text))`` id, ``src/mmore/type.py:89-90``).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import sha256_column
from ..functions.textfns import clean_text


def add_sha256(batch: pa.Table, column: str = "content", out: str = "content_sha256") -> pa.Table:
    """Append sha256 hex of ``column`` (raw bytes, utf-8)."""
    hashes = sha256_column(batch.column(column).to_pylist())
    return batch.append_column(out, pa.array(hashes, pa.string()))


def normalize_content(batch: pa.Table, column: str = "content") -> pa.Table:
    """Apply ``clean_text`` to ``column`` in place (after sha256 is taken)."""
    cleaned = [clean_text(v) for v in batch.column(column).to_pylist()]
    idx = batch.schema.get_field_index(column)
    return batch.set_column(idx, column, pa.array(cleaned, pa.string()))
