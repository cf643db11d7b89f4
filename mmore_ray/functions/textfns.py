"""Pure text kernels.

Semantics mirrored from the reference implementation (spec, not code):
  * ``clean_str``   ≙ mmore ``ner/output_parser.py:16-24`` — html-unescape,
    strip, drop C0/C1 control characters.
  * ``clean_text``  ≙ mmore ``process/utils.py:27-58`` — unicode fixups and
    email scrubbing (emails replaced by the literal ``email@email.com``),
    case/URLs/numbers preserved.  The reference delegates to the
    ``cleantext`` library; we reimplement the observable behavior with
    stdlib-only code so the stage stays dependency-free and vectorizable.

All functions are per-string and cheap; batch stages call them over a
column inside ``map_batches``.
"""

from __future__ import annotations

import html
import re
import unicodedata

_CONTROL_CHARS_RE = re.compile(r"[\x00-\x1f\x7f-\x9f]")

# Conservative RFC-5322-ish email matcher (same scrub target as the
# reference's cleantext `no_emails=True` behavior).
_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}")

_EMAIL_PLACEHOLDER = "email@email.com"

_WORD_RE = re.compile(r"\S+")


def clean_str(value: object) -> object:
    """HTML-unescape, strip, and drop control characters.

    Non-string input is returned unchanged (parity with the reference's
    guard for already-parsed values).
    """
    if not isinstance(value, str):
        return value
    out = html.unescape(value.strip())
    return _CONTROL_CHARS_RE.sub("", out)


def clean_text(text: str) -> str:
    """Normalize unicode and scrub emails; keep case, URLs and numbers.

    NFC-normalizes (the reference's "fix unicode" step), collapses
    \\r\\n → \\n, and replaces any email address with the fixed
    placeholder used by the reference.
    """
    if not text:
        return text
    out = unicodedata.normalize("NFC", text)
    out = out.replace("\r\n", "\n").replace("\r", "\n")
    out = _EMAIL_RE.sub(_EMAIL_PLACEHOLDER, out)
    return out


def split_words(text: str) -> list[str]:
    """Whitespace tokenization — the reference's ``text.split()`` semantics
    (``tagger/words.py``)."""
    return _WORD_RE.findall(text)
