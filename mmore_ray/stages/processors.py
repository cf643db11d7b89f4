"""File-type processors (the reference's §2.2 surface, Ray-native).

The reference dispatches each crawled file to the first ``Processor``
whose ``accepts()`` matches (``process/processors/base.py:67-85``) and
runs ``process(file) -> MultimodalSample``.  Here a processor is a pure
``parse(name, payload) -> dict`` used inside a stateless ``map_batches``
stage; dispatch is by extension, mirroring each reference processor's
``accepts`` list.

Real implementations (stdlib only): text, markdown, html, eml,
csv/tsv, pdf (fast path over the minimal text layer in
``sources/pdfmini.py``), docx (zipfile + ElementTree).  The remaining
heavy-dependency processors (marker full-path PDF models,
pptx/python-pptx, xlsx/openpyxl, media/whisper, live-fetch url) keep
real plumbing — registration, accepts, batch signature, output schema —
but ``parse`` raises ``NotImplementedError`` naming the missing
library, exactly like running the reference without its extras
installed.  Their GPU/actor-pool shape is documented in
``stages/multimodal.py``.

Output row schema (the MultimodalSample analogue, SURVEY §1.4):
    text: string                 extracted text, ``<attachment>`` marks
                                 modality positions (base.py:30)
    modalities: list<struct<type,value>>
    file_path / file_name / processor_type: string
    sample_id: string            sha256(text) — deterministic, unlike
                                 the reference's salted hash(text) id
"""

from __future__ import annotations

import email
import email.policy
import io
import re

import pyarrow as pa

from ..functions.hashing import sha256_hex
from ..functions.textfns import clean_text

ATTACHMENT_TAG = "<attachment>"

MODALITY_STRUCT = pa.struct([("type", pa.string()), ("value", pa.string())])

SAMPLE_SCHEMA = pa.schema([
    ("sample_id", pa.string()),
    ("document_id", pa.string()),
    ("text", pa.string()),
    ("modalities", pa.list_(MODALITY_STRUCT)),
    ("file_path", pa.string()),
    ("file_name", pa.string()),
    ("processor_type", pa.string()),
    # processor-specific metadata (e.g. PDF paragraph_starts) as JSON —
    # a typed column per processor would fracture the unified schema
    ("metadata_json", pa.string()),
])

# formats whose processors decode `content` back to bytes via
# latin-1 (1:1 byte↔char): the reader MUST transport them latin-1 —
# utf-8/errors='replace' mangles any byte ≥ 0x80 into U+FFFD and the
# round-trip encode raises
BINARY_EXTENSIONS = (".pdf", ".xlsx", ".xls", ".docx", ".pptx",
                     ".mp4", ".avi", ".mov", ".mkv", ".mp3", ".flac",
                     ".wav")

_MD_IMAGE_RE = re.compile(r"!\[[^\]]*\]\(([^)\s]+)[^)]*\)")
_HTML_IMG_RE = re.compile(r"<img[^>]*\bsrc=[\"']([^\"']+)[\"'][^>]*>",
                          re.IGNORECASE)
_HTML_TAG_RE = re.compile(r"<[^>]+>")
_HTML_HEADER_RE = re.compile(r"<h([1-6])[^>]*>(.*?)</h\1>",
                             re.IGNORECASE | re.DOTALL)
_WS_RE = re.compile(r"[ \t]+")


class ProcessorBase:
    """Subclass contract: ``EXTENSIONS`` + ``parse``; ``accepts``
    mirrors the reference's classmethod dispatch."""

    EXTENSIONS: tuple[str, ...] = ()
    NAME = "ProcessorBase"

    @classmethod
    def accepts(cls, file_name: str) -> bool:
        return file_name.lower().endswith(cls.EXTENSIONS)

    @classmethod
    def parse(cls, file_name: str, payload: str) -> dict:
        raise NotImplementedError


class TextProcessor(ProcessorBase):
    """≙ reference txt_processor.py:10 — read utf-8, clean_text."""

    EXTENSIONS = (".txt",)
    NAME = "TextProcessor"

    @classmethod
    def parse(cls, file_name: str, payload: str) -> dict:
        return {"text": clean_text(payload), "modalities": []}


class MarkdownProcessor(ProcessorBase):
    """≙ md_processor.py:18 — image links become ``<attachment>`` tags
    with an image modality per link; text otherwise normalized."""

    EXTENSIONS = (".md", ".markdown")
    NAME = "MarkdownProcessor"

    @classmethod
    def parse(cls, file_name: str, payload: str) -> dict:
        modalities: list[dict] = []

        def sub(m: re.Match) -> str:
            modalities.append({"type": "image", "value": m.group(1)})
            return ATTACHMENT_TAG

        text = _MD_IMAGE_RE.sub(sub, payload)
        return {"text": clean_text(text), "modalities": modalities}


class HTMLProcessor(ProcessorBase):
    """≙ html_processor.py:17 — headers → ATX ``#``, ``<img>`` →
    ``<attachment>`` + modality, remaining tags stripped."""

    EXTENSIONS = (".html", ".htm")
    NAME = "HTMLProcessor"

    # tag placeholder that survives the final <...> strip (the literal
    # ATTACHMENT_TAG would match _HTML_TAG_RE and vanish, orphaning
    # every HTML image modality); no '<'/'>' so no regex can eat it
    _SENTINEL = "\x00attachment\x00"

    @classmethod
    def parse(cls, file_name: str, payload: str) -> dict:
        modalities: list[dict] = []
        # non-rendered content FIRST: an <img> inside <script>/<style>
        # or an HTML COMMENT must not become a phantom modality that
        # shifts every later tag→modality binding
        text = re.sub(r"<!--.*?-->", "", payload, flags=re.DOTALL)
        text = re.sub(r"<(script|style)[^>]*>.*?</\1>", "", text,
                      flags=re.IGNORECASE | re.DOTALL)

        def img(m: re.Match) -> str:
            modalities.append({"type": "image", "value": m.group(1)})
            return cls._SENTINEL

        text = _HTML_IMG_RE.sub(img, text)
        text = _HTML_HEADER_RE.sub(
            lambda m: "\n" + "#" * int(m.group(1)) + " "
            + _HTML_TAG_RE.sub("", m.group(2)).strip() + "\n",
            text,
        )
        text = re.sub(r"</(p|div|li|tr|table|ul|ol|br)[^>]*>", "\n", text,
                      flags=re.IGNORECASE)
        text = _HTML_TAG_RE.sub("", text)
        text = "\n".join(_WS_RE.sub(" ", ln).strip()
                         for ln in text.splitlines())
        text = re.sub(r"\n{3,}", "\n\n", text).strip()
        text = text.replace(cls._SENTINEL, ATTACHMENT_TAG)
        return {"text": clean_text(text), "modalities": modalities}


class EMLProcessor(ProcessorBase):
    """≙ eml_processor.py:15 — From/To/Subject/Date headers + text/plain
    parts; image attachments become modalities."""

    EXTENSIONS = (".eml",)
    NAME = "EMLProcessor"

    @classmethod
    def parse(cls, file_name: str, payload: str) -> dict:
        msg = email.message_from_string(payload, policy=email.policy.default)
        lines = [f"{h}: {msg[h]}" for h in ("From", "To", "Subject", "Date")
                 if msg[h]]
        modalities: list[dict] = []
        bodies: list[str] = []
        for part in msg.walk():
            ctype = part.get_content_type()
            if ctype == "text/plain":
                bodies.append(str(part.get_content()).strip())
            elif ctype.startswith("image/"):
                name = part.get_filename() or f"inline.{ctype.split('/')[1]}"
                modalities.append({"type": "image", "value": name})
                bodies.append(ATTACHMENT_TAG)
        text = "\n".join(lines) + "\n\n" + "\n".join(bodies)
        return {"text": clean_text(text.strip()), "modalities": modalities}


_XLSX_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


class SpreadsheetProcessor(ProcessorBase):
    """≙ spreadsheet_processor.py:18-170 — the reference renders every
    sheet as ``Sheet: {name}\\n`` + ``df.to_string(index=False)`` joined
    by blank lines (xlsx via openpyxl) and csv/tsv via pandas.  The
    xlsx path here reads the zip directly with stdlib zipfile +
    ElementTree (workbook sheet order, sharedStrings, per-cell types:
    shared/inline strings, booleans, numbers) into the same pandas
    frame, so the rendered text matches the reference's shape without
    openpyxl.  ``.xls`` (the legacy binary format) stays out of scope —
    no stdlib parser exists for it."""

    EXTENSIONS = (".csv", ".tsv", ".xlsx", ".xls")
    NAME = "SpreadsheetProcessor"

    @classmethod
    def _xlsx_frames(cls, data: bytes):
        """Yield (sheet_name, DataFrame) in workbook order."""
        import zipfile
        from xml.etree import ElementTree as ET

        import pandas as pd

        zf = zipfile.ZipFile(io.BytesIO(data))
        rels = {}
        try:
            for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")):
                rels[rel.get("Id") or ""] = rel.get("Target") or ""
        except KeyError:
            pass
        shared: list[str] = []
        try:
            for si in ET.fromstring(zf.read("xl/sharedStrings.xml")):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_XLSX_S}t")))
        except KeyError:
            pass
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rns = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
               "relationships}id")

        def cell_value(c):
            t = c.get("t")
            if t == "inlineStr":
                return "".join(x.text or "" for x in c.iter(f"{_XLSX_S}t"))
            v = c.find(f"{_XLSX_S}v")
            if v is None or v.text is None:
                return None
            if t == "s":
                return shared[int(v.text)]
            if t in ("str",):
                return v.text
            if t == "b":
                return bool(int(v.text))
            try:
                num = float(v.text)
            except ValueError:
                # error-typed cells (t="e": '#DIV/0!', '#REF!', …)
                # carry their literal in <v> — return it like the
                # reference's openpyxl path would, instead of failing
                # the whole workbook on one bad formula
                return v.text
            return int(num) if num.is_integer() else num

        def col_index(ref: str) -> int:
            i = 0
            for ch in ref:
                if ch.isalpha():
                    i = i * 26 + (ord(ch.upper()) - 64)
                else:
                    break
            return i - 1

        for sheet in wb.find(f"{_XLSX_S}sheets") or []:
            name = sheet.get("name") or ""
            target = rels.get(sheet.get(rns) or "", "")
            # strip any leading '/' BEFORE the prefix check: absolute
            # rel targets ('/xl/worksheets/sheet1.xml', emitted by
            # several non-Excel generators) would double-prefix to
            # 'xl/xl/...' and the KeyError below silently drops the
            # whole sheet
            t2 = target.lstrip("/")
            part = t2 if t2.startswith("xl/") else "xl/" + t2
            try:
                root = ET.fromstring(zf.read(part))
            except KeyError:
                continue
            rows: list[list] = []
            for row in root.iter(f"{_XLSX_S}row"):
                vals: dict[int, object] = {}
                for pos, c in enumerate(row):
                    ref = c.get("r")
                    idx = col_index(ref) if ref else pos
                    vals[idx] = cell_value(c)
                width = max(vals) + 1 if vals else 0
                rows.append([vals.get(i) for i in range(width)])
            if not rows:
                yield name, pd.DataFrame()
                continue
            width = max(len(r) for r in rows)
            rows = [r + [None] * (width - len(r)) for r in rows]
            header, body = rows[0], rows[1:]
            yield name, pd.DataFrame(body, columns=header)

    @classmethod
    def parse(cls, file_name: str, payload) -> dict:
        import pandas as pd

        low = file_name.lower()
        if low.endswith(".xls"):
            raise NotImplementedError(
                "legacy .xls needs xlrd; .xlsx/.csv/.tsv are implemented")
        if low.endswith(".xlsx"):
            data = (payload.encode("latin-1")
                    if isinstance(payload, str) else payload)
            text = ""
            for name, df in cls._xlsx_frames(data):
                text += f"Sheet: {name}\n"
                text += df.to_string(index=False) + "\n\n"
            return {"text": clean_text(text.strip()), "modalities": []}
        sep = "\t" if low.endswith(".tsv") else ","
        df = pd.read_csv(io.StringIO(payload), sep=sep)
        return {"text": clean_text(df.to_string()), "modalities": []}


class PDFProcessor(ProcessorBase):
    """≙ pdf_processor.py:36 — the fast path (``process_fast``,
    pdf_processor.py:258-326) implemented for real against the minimal
    stdlib PDF text layer (``sources/pdfmini.py``): per-page
    ``clean_text``, paragraph offsets ``(char_offset, page_num,
    para_idx)`` with the terminal ``(total, -1, -1)`` sentinel, page
    texts concatenated raw.  Binary payloads travel latin-1-decoded in
    the string ``content`` column (1:1 byte mapping).

    The marker full path (GPU layout models, pdf_processor.py:96-185)
    stays out of scope in this env; its actor-pool shape — models per
    actor, ``concurrency=N, num_gpus=1`` — is documented in
    stages/multimodal.py.  Image extraction needs a raster decoder, so
    the fast path emits text + paragraph metadata only here."""

    EXTENSIONS = (".pdf",)
    NAME = "PDFProcessor"

    @classmethod
    def parse(cls, file_name: str, payload) -> dict:
        data = payload.encode("latin-1") if isinstance(payload, str) else payload
        from ..models import MiniPdfParser, get_instance, provider_class

        # the full marker path (or any other provider) drops in by name
        # or MMORE_RAY_PDF_PARSER — zero pipeline edits (models.py seam)
        if provider_class("pdf_parser") is not MiniPdfParser:
            return get_instance("pdf_parser").parse_one(file_name, data)
        return cls.parse_fast(file_name, data)

    @classmethod
    def parse_fast(cls, file_name: str, data: bytes) -> dict:
        from ..sources.pdfmini import extract_pages

        pages = extract_pages(data)
        if not pages:
            # parity with the reference's per-file failure path: an
            # unparseable PDF raises and is skipped/collected upstream
            raise ValueError("no parseable pages (not a simple text PDF)")
        paragraph_starts: list[tuple[int, int, int]] = []
        parts: list[str] = []
        pos = 0
        for page_num, raw in enumerate(pages):
            text = clean_text(raw)
            if not text.strip():
                continue
            para_idx = 0
            offset_in_page = 0
            for segment in text.split("\n\n"):
                if segment.strip():
                    paragraph_starts.append(
                        (pos + offset_in_page, page_num, para_idx))
                    para_idx += 1
                offset_in_page += len(segment) + 2  # the "\n\n" separator
            parts.append(text)
            pos += len(text)
        paragraph_starts.append((pos, -1, -1))
        return {"text": "".join(parts), "modalities": [],
                "metadata": {"paragraph_starts": paragraph_starts}}


class MediaProcessor(ProcessorBase):
    """≙ media_processor.py:21-222 — audio-track extraction (moviepy)
    → Whisper ASR transcript → frame thumbnails every ``sample_rate``
    seconds, shipped as image modalities behind ``<attachment>`` tags.

    The Ray-side plumbing is real and shared with
    stages/multimodal.py: FAKEVID containers have their embedded audio
    track sliced out (≙ moviepy), the transcript is recovered by the
    same clearly-fake decode ``AsrTranscriber`` uses, and video frames
    are sampled deterministically.  Real codecs would swap in behind
    the two ``FAKE*`` branches only; genuinely-encoded media raises
    NotImplementedError (whisper/moviepy absent in this env).  At
    scale this runs as the actor-pool stage (weights per actor,
    ``map_batches(AsrTranscriber, concurrency=N, num_gpus=1)``)."""

    EXTENSIONS = (".mp4", ".avi", ".mov", ".mkv", ".mp3", ".flac", ".wav")
    NAME = "MediaProcessor"
    FRAME_SAMPLE_RATE = 10  # seconds between thumbnails (reference default)

    @classmethod
    def parse(cls, file_name: str, payload) -> dict:
        from ..models import get_instance, provider_class
        from .multimodal import AsrTranscriber

        data = payload.encode("latin-1") if isinstance(payload, str) else payload
        frames = 0
        # FAKE payloads ALWAYS decode through the fake transcriber —
        # a configured real provider must not be fed marker bytes
        if data.startswith(b"FAKEVID:"):
            _, secs, alen, rest = data.split(b":", 3)
            frames = max(int(secs) // cls.FRAME_SAMPLE_RATE, 1)
            transcript = AsrTranscriber().transcribe(rest[:int(alen)])
        elif data.startswith(b"FAKEAUD:"):
            transcript = AsrTranscriber().transcribe(data)
        elif provider_class("asr") is AsrTranscriber:
            raise NotImplementedError(
                "real media decode requires a non-fake asr provider "
                "(MMORE_RAY_ASR=whisper; whisper/moviepy not in env); "
                "FAKEAUD/FAKEVID payloads exercise the full plumbing")
        else:  # a real provider consumes the raw container directly
            transcript = get_instance("asr").transcribe(data)
        parts = [clean_text(transcript)] if transcript else []
        modalities = [{"type": "image", "value": f"frame:{i}"}
                      for i in range(frames)]
        parts.extend([ATTACHMENT_TAG] * frames)
        return {"text": "\n".join(parts), "modalities": modalities}


_DOCX_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_DOCX_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_DOCX_R = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")


class DOCXProcessor(ProcessorBase):
    """≙ docx_processor.py:27-133 — the reference runs mammoth→HTML→
    markdownify and swaps images for ``<attachment>`` tags + image
    modalities.  A .docx is a zip of XML, so the same observable output
    (markdown-ish paragraphs, heading prefixes, attachment tags) comes
    from stdlib zipfile + ElementTree: ``w:p`` paragraphs joined by
    blank lines, ``HeadingN`` styles → ``#`` prefixes, ``a:blip``
    image refs resolved through the rels part.  Binary payloads travel
    latin-1-decoded in the string ``content`` column."""

    EXTENSIONS = (".docx",)
    NAME = "DOCXProcessor"

    @classmethod
    def parse(cls, file_name: str, payload) -> dict:
        import zipfile
        from xml.etree import ElementTree as ET

        data = payload.encode("latin-1") if isinstance(payload, str) else payload
        zf = zipfile.ZipFile(io.BytesIO(data))
        rels: dict[str, str] = {}
        try:
            for rel in ET.fromstring(zf.read("word/_rels/document.xml.rels")):
                rels[rel.get("Id") or ""] = rel.get("Target") or ""
        except KeyError:
            pass
        root = ET.fromstring(zf.read("word/document.xml"))
        modalities: list[dict] = []
        paras: list[str] = []
        for p in root.iter(f"{_DOCX_W}p"):
            style = p.find(f"{_DOCX_W}pPr/{_DOCX_W}pStyle")
            prefix = ""
            if style is not None:
                m = re.match(r"Heading([1-6])",
                             style.get(f"{_DOCX_W}val") or "")
                if m:
                    prefix = "#" * int(m.group(1)) + " "
            parts = []
            for node in p.iter():
                if node.tag == f"{_DOCX_W}t":
                    parts.append(node.text or "")
                elif node.tag == f"{_DOCX_A}blip":
                    rid = node.get(f"{_DOCX_R}embed") or ""
                    modalities.append(
                        {"type": "image", "value": rels.get(rid, rid)})
                    parts.append(ATTACHMENT_TAG)
            text = "".join(parts)
            if text.strip():
                paras.append(prefix + text)
        return {"text": clean_text("\n\n".join(paras)),
                "modalities": modalities}


_PPTX_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_PPTX_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


class PPTXProcessor(ProcessorBase):
    """≙ pptx_processor.py:18-116 — the reference walks each slide's
    shapes sorted by vertical position (``shape.top``), appends each
    text frame's cleaned text, swaps pictures for ``<attachment>`` tags
    + image modalities, then appends the notes paragraphs.  A .pptx is
    a zip of XML, so the same observable output comes from stdlib
    zipfile + ElementTree: ``p:sp``/``p:pic`` children of the shape
    tree sorted by ``a:off/@y``, ``a:t`` runs per paragraph joined by
    newlines (python-pptx ``shape.text`` semantics), ``a:blip`` image
    refs resolved through the slide's rels part, and the notes slide's
    body-placeholder paragraphs.  Binary payloads travel
    latin-1-decoded in the string ``content`` column."""

    EXTENSIONS = (".pptx",)
    NAME = "PPTXProcessor"

    @classmethod
    def _rels(cls, zf, part: str) -> dict[str, str]:
        from xml.etree import ElementTree as ET

        d, _, name = part.rpartition("/")
        try:
            root = ET.fromstring(zf.read(f"{d}/_rels/{name}.rels"))
        except KeyError:
            return {}
        return {rel.get("Id") or "": (rel.get("Target") or "",
                                      rel.get("Type") or "")
                for rel in root}

    @classmethod
    def parse(cls, file_name: str, payload) -> dict:
        import zipfile
        from xml.etree import ElementTree as ET

        data = payload.encode("latin-1") if isinstance(payload, str) else payload
        zf = zipfile.ZipFile(io.BytesIO(data))
        slide_parts = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"\d+", n.rsplit("/", 1)[-1]).group()))
        texts: list[str] = []
        modalities: list[dict] = []

        def para_text(node) -> str:
            # one a:p paragraph → its runs concatenated
            return "".join(t.text or "" for t in node.iter(f"{_PPTX_A}t"))

        def shape_text(sp) -> str:
            # python-pptx shape.text: paragraphs joined by newlines
            body = sp.find(f"{_PPTX_P}txBody")
            if body is None:
                return ""
            return "\n".join(para_text(p) for p in body.iter(f"{_PPTX_A}p"))

        for part in slide_parts:
            rels = cls._rels(zf, part)
            root = ET.fromstring(zf.read(part))
            tree = root.find(f"{_PPTX_P}cSld/{_PPTX_P}spTree")
            shapes = []
            for sp in (list(tree) if tree is not None else []):
                if sp.tag not in (f"{_PPTX_P}sp", f"{_PPTX_P}pic"):
                    continue
                off = sp.find(f"{_PPTX_P}spPr/{_PPTX_A}xfrm/{_PPTX_A}off")
                top = int(off.get("y") or 0) if off is not None else 0
                shapes.append((top, len(shapes), sp))
            for _, _, sp in sorted(shapes, key=lambda s: (s[0], s[1])):
                if sp.tag == f"{_PPTX_P}sp":
                    cleaned = clean_text(shape_text(sp))
                    if cleaned.strip():
                        texts.append(cleaned)
                else:  # p:pic → attachment tag + image modality
                    blip = sp.find(
                        f"{_PPTX_P}blipFill/{_PPTX_A}blip")
                    rid = (blip.get(f"{_DOCX_R}embed") or ""
                           if blip is not None else "")
                    target = rels.get(rid, (rid, ""))[0]
                    modalities.append({"type": "image", "value": target})
                    texts.append(ATTACHMENT_TAG)
            # notes: the slide's notesSlide rel → body placeholder paras
            notes_part = next(
                (tgt for tgt, typ in rels.values()
                 if tgt and typ.endswith("/notesSlide")), None)
            if notes_part:
                # same absolute-target normalization as the xlsx sheet
                # resolution: avoid a double 'ppt/ppt/...' prefix
                np2 = notes_part.replace("../", "").lstrip("/")
                notes_name = np2 if np2.startswith("ppt/") else "ppt/" + np2
                try:
                    nroot = ET.fromstring(zf.read(notes_name))
                except KeyError:
                    continue
                for sp in nroot.iter(f"{_PPTX_P}sp"):
                    ph = sp.find(f"{_PPTX_P}nvSpPr/{_PPTX_P}nvPr/"
                                 f"{_PPTX_P}ph")
                    if ph is None or ph.get("type") != "body":
                        continue
                    body = sp.find(f"{_PPTX_P}txBody")
                    for p in (body.iter(f"{_PPTX_A}p")
                              if body is not None else []):
                        raw = para_text(p)
                        if not raw:
                            continue
                        cleaned = clean_text(raw)
                        if cleaned.strip():
                            texts.append(cleaned)
        return {"text": "\n".join(texts), "modalities": modalities}


class URLProcessor(ProcessorBase):
    """≙ url_processor.py:16 — the reference dresses URLs up as
    ``.html`` FileDescriptors and fetches with trafilatura.  This
    sandbox has no network; when the payload is already-fetched HTML
    the HTML pipeline applies, so ``parse`` delegates — a live fetch
    step would slot in front as a high-concurrency I/O task stage."""

    NAME = "URLProcessor"

    @classmethod
    def accepts(cls, file_name: str) -> bool:
        return file_name.startswith(("http://", "https://"))

    @classmethod
    def parse(cls, file_name: str, payload: str) -> dict:
        if payload:
            return HTMLProcessor.parse(file_name, payload)
        raise NotImplementedError("live URL fetch requires network access")


# Registration order = dispatch priority (first accepting wins),
# mirroring the reference's module-scan registry
# (process/processors/__init__.py:9-22).
PROCESSORS: list[type[ProcessorBase]] = [
    TextProcessor,
    MarkdownProcessor,
    HTMLProcessor,
    EMLProcessor,
    SpreadsheetProcessor,
    PDFProcessor,
    MediaProcessor,
    DOCXProcessor,
    PPTXProcessor,
    URLProcessor,
]


def dispatch(file_name: str) -> type[ProcessorBase] | None:
    for proc in PROCESSORS:
        if proc.accepts(file_name):
            return proc
    return None


ERROR_PROCESSOR = "__error__"


def process_batch(batch: pa.Table, on_error: str = "skip") -> pa.Table:
    """Stateless stage: (file_path, content) rows → sample rows.

    Failure handling per row (the reference logs-and-drops,
    dispatcher.py:330-344; we make failures first-class lineage):
      * ``'skip'``    — drop the row;
      * ``'collect'`` — emit an error row (processor_type='__error__',
        text = the error message) so failures land in the output and
        can be counted/filtered downstream;
      * ``'raise'``   — propagate.
    """
    import json

    paths = batch.column("file_path").to_pylist()
    contents = batch.column("content").to_pylist()
    out = {k: [] for k in ("sample_id", "document_id", "text", "modalities",
                           "file_path", "file_name", "processor_type",
                           "metadata_json")}

    def error_row(path: str, name: str, msg: str) -> None:
        sid = sha256_hex(f"{path}:{msg}")
        out["sample_id"].append(sid)
        out["document_id"].append(sid)
        out["text"].append(msg)
        out["modalities"].append([])
        out["file_path"].append(path)
        out["file_name"].append(name)
        out["processor_type"].append(ERROR_PROCESSOR)
        out["metadata_json"].append("{}")

    for path, content in zip(paths, contents):
        name = path.rsplit("/", 1)[-1]
        # dispatch on the FULL path: URLProcessor matches on the
        # http(s):// scheme, which the basename strips away
        proc = dispatch(path)
        if proc is None:
            if on_error == "collect":
                error_row(path, name, "no processor accepts this file")
            continue
        try:
            parsed = proc.parse(name, content)
        except Exception as exc:
            if on_error == "raise":
                raise
            if on_error == "collect":
                error_row(path, name, f"{type(exc).__name__}: {exc}")
            continue
        sid = sha256_hex(parsed["text"])
        out["sample_id"].append(sid)
        out["document_id"].append(sid)
        out["text"].append(parsed["text"])
        out["modalities"].append(parsed["modalities"])
        out["file_path"].append(path)
        out["file_name"].append(name)
        out["processor_type"].append(proc.NAME)
        # processors may return offsets/lineage (PDF paragraph_starts
        # etc.) — dropping it here would lose it with no error
        out["metadata_json"].append(
            json.dumps(parsed.get("metadata", {}), sort_keys=True))
    return pa.table({
        "sample_id": pa.array(out["sample_id"], pa.string()),
        "document_id": pa.array(out["document_id"], pa.string()),
        "text": pa.array(out["text"], pa.string()),
        "modalities": pa.array(out["modalities"], pa.list_(MODALITY_STRUCT)),
        "file_path": pa.array(out["file_path"], pa.string()),
        "file_name": pa.array(out["file_name"], pa.string()),
        "processor_type": pa.array(out["processor_type"], pa.string()),
        "metadata_json": pa.array(out["metadata_json"], pa.string()),
    })
