"""PII scrubbing: redact emails / IPv4s / phone numbers from a text
column — the privacy pass every published training corpus runs before
release (C4 removed lines with banned tokens; Dolma/BigScience redact
emails+IPs with exactly this regex-replace shape).  The reference has
no analogue — engine-extension surface like the dedup family.

Scale shape: one streaming ``map_batches`` over zero-copy Arrow
batches, all replacement via RE2 kernels (``pc.replace_substring_regex``
— no Python per row, no shuffle).  DuckDB's ``regexp_replace(..., 'g')``
is also RE2, so the SQL oracle checks the SAME pattern semantics
value-for-value; patterns below are therefore written in the common
RE2 subset (no lookbehind, no backrefs)."""

from __future__ import annotations

import pyarrow as pa

#: (name, RE2 pattern, replacement) applied IN ORDER — replacements
#: contain no '@' or digits, so later patterns never re-match earlier
#: redactions.  Order matters only for overlaps (an email's host is
#: never an IPv4 because '@' is consumed first).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[-. ]\d{2,4}[-. ]\d{3,4}[-. ]\d{2,4}\b",
     "<PHONE>"),
]


def redact_pii_batch(texts: pa.ChunkedArray | pa.Array):
    """Redact all PII patterns in one vectorized pass per pattern.
    Returns (redacted_texts, n_redactions int64 per row)."""
    import pyarrow.compute as pc

    total = None
    for _, pattern, repl in PII_PATTERNS:
        n = pc.count_substring_regex(texts, pattern)
        total = n if total is None else pc.add(total, n)
        texts = pc.replace_substring_regex(texts, pattern, repl)
    return texts, total.cast(pa.int64())


def redact_pii(ds, text_col: str = "text"):
    """Dataset wrapper: replaces ``text_col`` in place and appends an
    ``n_redactions`` count column (0 ⇒ the text is byte-identical)."""

    def fn(batch: pa.Table) -> pa.Table:
        red, n = redact_pii_batch(batch.column(text_col))
        i = batch.column_names.index(text_col)
        return batch.set_column(i, text_col, red).append_column(
            "n_redactions", n)

    return ds.map_batches(fn, batch_format="pyarrow")
