"""Minimal, dependency-free PDF text layer.

The reference's PDF fast path (``pdf_processor.py:258-326``) walks
pymupdf pages, cleans each page's text, tracks paragraph offsets and
concatenates.  This container has neither pymupdf nor marker, but the
*logic* of the fast path only needs per-page text — which a small
parser can extract from the simple PDFs that generators (including
:func:`make_pdf` below, reportlab's basic output, and most
text-first exporters) produce: a page tree, one content stream per
page, text shown with ``Tj`` / ``'`` / ``TJ`` operators, optionally
Flate-compressed.

Scope (documented, honest): text operators only — no encodings beyond
latin-1/ASCII escapes, no CID fonts, no images (image extraction stays
on the stubbed marker path).  ``extract_pages`` mirrors pymupdf's
observable convention that every text line ends with ``\\n``, so page
texts concatenate cleanly like the reference's ``"".join(parts)``.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?=\s*[/>])")
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")

# content-stream tokens: literal string, text-position ops, show ops
_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # (string) with escapes
    rb"|BT|ET|TJ|Tj|T\*|Td|TD|'"
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal \ooo (1-3 OCTAL digits; \8
                # and \9 are NOT octal — they fall to the default below)
                j = i + 1
                while (j < len(raw) and j < i + 4
                       and raw[j:j + 1] in b"01234567"):
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            if nxt in b"\r\n":  # \<EOL> line continuation: both dropped
                i += 2
                if nxt == b"\r" and raw[i:i + 1] == b"\n":
                    i += 1
                continue
            # backslash before any other char is ignored (PDF 7.3.4.2)
            out += nxt
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _stream_text(data: bytes) -> str:
    """Text of one content stream: one output line per text line, each
    terminated by \\n (pymupdf's get_text convention).  ``Td``/``TD``/
    ``T*``/``'`` after shown text start a new line."""
    lines: list[str] = []
    cur: list[str] = []
    for m in _TOKEN_RE.finditer(data):
        tok = m.group(0)
        if tok.startswith(b"("):
            cur.append(_unescape(tok[1:-1]))
        elif tok == b"'":
            # ' = move-to-next-line THEN show: its string operand (the
            # token just appended) belongs to the NEW line, not the one
            # being closed
            operand = cur.pop() if cur else None
            if cur:
                lines.append("".join(cur))
            cur = [operand] if operand is not None else []
        elif tok in (b"Td", b"TD", b"T*", b"ET") and cur:
            lines.append("".join(cur))
            cur = []
    if cur:
        lines.append("".join(cur))
    return "".join(ln + "\n" for ln in lines)


def extract_pages(data: bytes) -> list[str]:
    """Per-page text of a simple PDF, in page-tree order."""
    objs: dict[int, bytes] = {int(m.group(1)): m.group(3)
                              for m in _OBJ_RE.finditer(data)}

    def content_of(body: bytes) -> bytes:
        sm = _STREAM_RE.search(body)
        if sm is None:
            return b""
        # exact byte count from a direct /Length when present (the
        # EOL-strip heuristic below corrupts compressed streams whose
        # data happens to end in 0x0d); `(?=\s*[/>])` rejects indirect
        # `/Length n 0 R` references
        # (bounded by the OBJECT body, not the regex end: Length also
        # rescues compressed data containing a literal `endstream`)
        lm = _LENGTH_RE.search(body[:sm.start()])
        if lm and sm.start(1) + int(lm.group(1)) <= len(body):
            raw = body[sm.start(1):sm.start(1) + int(lm.group(1))]
        else:
            raw = sm.group(1)
            # stream data may end with \r\n/\n before `endstream`
            if raw.endswith(b"\n"):
                raw = raw[:-1]
                if raw.endswith(b"\r"):
                    raw = raw[:-1]
        if b"/FlateDecode" in body[:sm.start()]:
            raw = zlib.decompress(raw)
        return raw

    # page order: /Kids of the page tree; fallback to /Type /Page objects
    # in object-number order
    page_ids: list[int] = []
    for body in objs.values():
        if b"/Type" in body and b"/Pages" in body:
            km = _KIDS_RE.search(body)
            if km:
                page_ids = [int(r.group(1))
                            for r in _REF_RE.finditer(km.group(1))]
                break
    if not page_ids:
        page_ids = [n for n in sorted(objs)
                    if _PAGE_TYPE_RE.search(objs[n])]

    pages: list[str] = []
    for pid in page_ids:
        body = objs.get(pid, b"")
        cm = _CONTENTS_RE.search(body)
        if cm and int(cm.group(1)) in objs:
            stream = content_of(objs[int(cm.group(1))])
        else:  # inline /Contents stream in the page object itself
            stream = content_of(body)
        pages.append(_stream_text(stream))
    return pages


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(pages: list[str], compress: bool = False) -> bytes:
    """Write a minimal valid PDF: one content stream per page, one
    ``Tj`` per text line, Helvetica.  Deterministic — used for test
    fixtures and the oracle-checked q_process_pdf corpus."""
    n_pages = len(pages)
    # object numbering: 1 Catalog, 2 Pages, then per page i: 3+2i Page,
    # 4+2i Contents, last: font
    font_num = 3 + 2 * n_pages
    objects: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, page in enumerate(pages):
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R /Resources << /Font "
            f"<< /F1 {font_num} 0 R >> >> >>".encode())
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(page.split("\n")):
            if j:
                ops.append("0 -14 Td")
            ops.append(f"({_escape(line)}) Tj")
        ops.append("ET")
        stream = " ".join(ops).encode("latin-1")
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        objects.append(
            b"<< " + filt + f"/Length {len(stream)} >>".encode()
            + b"\nstream\n" + stream + b"\nendstream")
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
