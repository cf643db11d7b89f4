"""Processors + process pipeline + incremental protocol tests
(reference test_processors_local.py / test_previous_results.py /
test_change_detection_*.py semantics; FIXTURES.md F2/F6)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mmore_ray.stages.chunker import chunk_batch
from mmore_ray.stages.processors import (
    ATTACHMENT_TAG,
    EMLProcessor,
    HTMLProcessor,
    MarkdownProcessor,
    PDFProcessor,
    SpreadsheetProcessor,
    TextProcessor,
    dispatch,
    process_batch,
)
from mmore_ray.stages.taggers import tag_hash, tag_lang, tag_words


def test_tag_words_unicode_whitespace_matches_str_split():
    # NBSP / U+2028 / vertical tab are split() whitespace but NOT re2
    # \s — the tagger must count like len(text.split()) on web text
    texts = ["foo\xa0bar", "foo\vbar", "a b", "a b\tc\n", "", " ",
             "x　y z", "plain words here"]
    t = pa.table({"text": texts})
    got = tag_words(t).column("word_count").to_pylist()
    assert got == [len(x.split()) for x in texts]


def test_tag_lang_null_text_is_unknown():
    # null text must tag 'unknown', never a confident language (NaN
    # counts previously poisoned argmax into 'de')
    t = pa.table({"text": pa.array([None, "the a and of to is"],
                                   pa.string())})
    assert tag_lang(t).column("lang").to_pylist() == ["unknown", "en"]

    from mmore_ray.stages.filters import lang_filter

    kept = lang_filter({"de"})(t)
    assert kept.num_rows == 0  # null-text row must not pass a lang gate


def test_dispatch_priority_and_accepts():
    assert dispatch("a.txt") is TextProcessor
    assert dispatch("b.md") is MarkdownProcessor
    assert dispatch("c.HTML") is HTMLProcessor
    assert dispatch("d.eml") is EMLProcessor
    assert dispatch("e.csv") is SpreadsheetProcessor
    assert dispatch("f.pdf") is PDFProcessor
    assert dispatch("g.unknown") is None


def test_markdown_images_become_attachments():
    out = MarkdownProcessor.parse(
        "x.md", "Intro ![alt](img/pic.png) and ![b](o.jpg \"t\") end")
    assert out["text"].count(ATTACHMENT_TAG) == 2
    assert out["modalities"] == [
        {"type": "image", "value": "img/pic.png"},
        {"type": "image", "value": "o.jpg"},
    ]


def test_html_processor_headers_imgs_scripts():
    html = ("<html><head><style>p{}</style></head><body>"
            "<h2>Title Here</h2><p>Body text.</p>"
            "<img src='pic.png'><script>x=1</script></body></html>")
    out = HTMLProcessor.parse("x.html", html)
    assert "## Title Here" in out["text"]
    assert "Body text." in out["text"]
    assert "x=1" not in out["text"]
    assert out["modalities"] == [{"type": "image", "value": "pic.png"}]
    # the tag must SURVIVE the final <...> strip — without it every
    # HTML image modality is orphaned downstream (chunker binds by tag)
    assert out["text"].count(ATTACHMENT_TAG) == 1


def test_html_img_inside_script_is_not_a_modality():
    html = ("<body><script>var t = '<img src=\"ghost.png\">';</script>"
            "<p>Real.</p><img src='real.png'></body>")
    out = HTMLProcessor.parse("x.html", html)
    assert out["modalities"] == [{"type": "image", "value": "real.png"}]
    assert out["text"].count(ATTACHMENT_TAG) == 1
    assert "ghost" not in out["text"]


def test_eml_headers_and_body():
    eml = ("From: a@b.com\nTo: c@d.com\nSubject: Hi there\n"
           "Date: Mon, 1 Jan 2024 00:00:00 +0000\n"
           "Content-Type: text/plain\n\nBody line one.")
    out = EMLProcessor.parse("m.eml", eml)
    assert "Subject: Hi there" in out["text"]
    assert "Body line one." in out["text"]
    # clean_text scrubs emails to the reference placeholder
    assert "email@email.com" in out["text"]


def test_csv_to_string():
    out = SpreadsheetProcessor.parse("t.csv", "a,b\n1,2\n3,4")
    assert "a" in out["text"] and "3" in out["text"]


def test_pdfmini_roundtrip_and_fast_path():
    from mmore_ray.sources.pdfmini import extract_pages, make_pdf

    pages = ["alpha beta gamma", "with (parens) \\ and\ntwo lines", "last"]
    for compress in (False, True):
        pdf = make_pdf(pages, compress=compress)
        got = extract_pages(pdf)
        assert got == ["".join(ln + "\n" for ln in p.split("\n"))
                       for p in pages]

    r = PDFProcessor.parse("f.pdf", make_pdf(pages).decode("latin-1"))
    text = r["text"]
    ps = r["metadata"]["paragraph_starts"]
    # one paragraph per page + terminal sentinel (pdf_processor.py:322)
    assert ps[-1] == (len(text), -1, -1)
    assert [p[1] for p in ps[:-1]] == [0, 1, 2]
    for off, page, _ in ps[:-1]:
        assert text[off:off + 4] == (pages[page] + "\n")[:4]
    # empty page is dropped by the strip gate, page numbering preserved
    r2 = PDFProcessor.parse("g.pdf", make_pdf(["one", "", "three"]).decode("latin-1"))
    assert r2["text"] == "one\nthree\n"
    assert [p[1] for p in r2["metadata"]["paragraph_starts"][:-1]] == [0, 2]


def test_pdfmini_spec_edge_cases():
    """Escapes, the ' show-operator, and /Length-exact stream slicing
    (review findings: \\8/\\9 crashed, ' merged two lines, and the
    EOL-strip heuristic corrupted compressed data ending in 0x0d)."""
    import zlib

    from mmore_ray.sources.pdfmini import (
        _stream_text,
        _unescape,
        extract_pages,
        make_pdf,
    )

    # \8 and \9 are NOT octal: the backslash is ignored (PDF 7.3.4.2)
    assert _unescape(rb"a\9b") == "a9b"
    assert _unescape(rb"a\8") == "a8"
    assert _unescape(rb"a\101b") == "aAb"      # 3-digit octal
    assert _unescape(rb"\0538") == "+8"        # octal stops at 3 digits
    assert _unescape(b"a\\\nb") == "ab"        # \<EOL> line continuation
    assert _unescape(rb"a\zb") == "azb"        # unknown escape: \ dropped

    # ' = move-to-next-line THEN show: operand starts the NEW line
    assert _stream_text(b"BT (a) Tj (b) ' ET") == "a\nb\n"

    # a compressed stream whose bytes end in 0x0d must survive — the
    # direct /Length in make_pdf's dict slices the exact byte count
    page = None
    for i in range(50000):
        stream = f"BT /F1 12 Tf 72 720 Td (line {i}) Tj ET".encode()
        if zlib.compress(stream).endswith(b"\r"):
            page = f"line {i}"
            break
    assert page is not None
    assert extract_pages(make_pdf([page], compress=True)) == [page + "\n"]


def _make_docx(paragraphs, images=None) -> bytes:
    """Minimal .docx: document.xml paragraphs (+optional Heading style
    as ('H2', text) tuples), a:blip image refs resolved via rels."""
    import io as _io
    import zipfile

    images = images or {}
    body = []
    for p in paragraphs:
        style = ""
        if isinstance(p, tuple):
            style = f'<w:pPr><w:pStyle w:val="Heading{p[0]}"/></w:pPr>'
            p = p[1]
        runs = ""
        for part in p.split("\x00"):  # \x00 marks an image position
            runs += f"<w:r><w:t>{part}</w:t></w:r>"
            if "\x00" in p and part != p.split("\x00")[-1]:
                rid = list(images)[0]
                runs += (f'<w:r><w:drawing><a:blip r:embed="{rid}"/>'
                         f"</w:drawing></w:r>")
        body.append(f"<w:p>{style}{runs}</w:p>")
    doc = (
        '<?xml version="1.0"?><w:document '
        'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" '
        'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<w:body>{''.join(body)}</w:body></w:document>")
    rels = ('<?xml version="1.0"?><Relationships '
            'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(f'<Relationship Id="{rid}" Target="{t}"/>'
                      for rid, t in images.items())
            + "</Relationships>")
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
        zf.writestr("word/_rels/document.xml.rels", rels)
    return buf.getvalue()


def test_docx_processor_paragraphs_headings_images():
    from mmore_ray.stages.processors import DOCXProcessor

    blob = _make_docx(
        [("1", "Title"), "First paragraph.", "Before\x00After"],
        images={"rId7": "media/image1.png"},
    )
    r = DOCXProcessor.parse("d.docx", blob.decode("latin-1"))
    assert r["text"] == (
        "# Title\n\nFirst paragraph.\n\nBefore" + ATTACHMENT_TAG + "After")
    assert r["modalities"] == [{"type": "image", "value": "media/image1.png"}]
    # dispatch wires it
    out = process_batch(pa.table({
        "file_path": ["/x/d.docx"],
        "content": [blob.decode("latin-1")],
    }))
    assert out.column("processor_type").to_pylist() == ["DOCXProcessor"]


def test_process_batch_skips_unsupported_and_stubs():
    batch = pa.table({
        "file_path": ["/x/a.txt", "/x/b.pdf", "/x/c.nope"],
        "content": ["hello world", "%PDF-1.4", "???"],
    })
    out = process_batch(batch)
    # the malformed pdf (no page objects) fails per-file and is skipped
    assert out.num_rows == 1
    assert out.column("processor_type").to_pylist() == ["TextProcessor"]
    with pytest.raises(ValueError):
        process_batch(pa.table({"file_path": ["/x/b.pdf"],
                                "content": ["%PDF"]}), on_error="raise")
    with pytest.raises(NotImplementedError):  # legacy .xls stays stubbed
        process_batch(pa.table({"file_path": ["/x/s.xls"],
                                "content": ["bin"]}), on_error="raise")
    import zipfile

    with pytest.raises(zipfile.BadZipFile):  # pptx is real now: bad zip
        process_batch(pa.table({"file_path": ["/x/s.pptx"],
                                "content": ["zip"]}), on_error="raise")


def test_process_batch_collect_emits_error_rows():
    from mmore_ray.stages.processors import ERROR_PROCESSOR

    batch = pa.table({
        "file_path": ["/x/a.txt", "/x/b.pdf", "/x/c.nope", "/x/d.csv"],
        "content": ["hello", "%PDF", "???", "not,a\nvalid,csv,extra,cols"],
    })
    out = process_batch(batch, on_error="collect")
    kinds = out.column("processor_type").to_pylist()
    assert kinds.count(ERROR_PROCESSOR) >= 2  # bad pdf + no-processor
    errs = {p: t for p, t in zip(out.column("file_path").to_pylist(),
                                 out.column("text").to_pylist())
            if t and ("processor" in t or "Error" in t)}
    assert "/x/b.pdf" in errs and "/x/c.nope" in errs


def test_chunk_batch_ids_and_modalities():
    text = "First part one. First part two. " + ATTACHMENT_TAG + \
        " second bit. Third sentence ends."
    batch = pa.table({
        "sample_id": ["S"],
        "document_id": ["S"],
        "text": [text],
        "modalities": [[{"type": "image", "value": "p.png"}]],
        "file_path": ["/x/a.md"],
        "file_name": ["a.md"],
        "processor_type": ["MarkdownProcessor"],
    })
    out = chunk_batch(batch, chunk_size=2)
    ids = out.column("sample_id").to_pylist()
    assert ids == [f"S+{i}" for i in range(len(ids))]  # id+i scheme
    assert set(out.column("document_id").to_pylist()) == {"S"}
    mods = out.column("modalities").to_pylist()
    texts = out.column("text").to_pylist()
    for t, m in zip(texts, mods):
        assert t.count(ATTACHMENT_TAG) == len(m)
    assert sum(len(m) for m in mods) == 1


def _write_corpus(root):
    (root / "docs").mkdir(parents=True)
    (root / "docs" / "a.txt").write_text("alpha beta gamma")
    (root / "docs" / "b.md").write_text("# Title\n\nbody ![i](x.png)")
    (root / "docs" / "c.html").write_text("<h1>H</h1><p>text</p>")
    (root / "docs" / "d.csv").write_text("x,y\n1,2")
    (root / "docs" / "skip.bin").write_text("binary")


def test_run_process_end_to_end(ray_session, tmp_path):
    from mmore_ray.pipelines.process import run_process, samples_to_jsonl

    _write_corpus(tmp_path)
    stats = run_process([str(tmp_path)], tmp_path / "out",
                        postprocessors=[tag_words, tag_lang, tag_hash])
    assert stats["crawled"] == 5
    assert stats["processed"] == 4  # .bin has no processor
    table = pq.read_table(stats["out"])
    assert set(table.column("processor_type").to_pylist()) == {
        "TextProcessor", "MarkdownProcessor", "HTMLProcessor",
        "SpreadsheetProcessor"}
    assert "word_count" in table.column_names
    assert "content_sha256" in table.column_names

    # reference-format JSONL round trip
    jl = tmp_path / "merged.jsonl"
    samples_to_jsonl(table, jl)
    rec = json.loads(jl.read_text().splitlines()[0])
    assert set(rec) == {"text", "modalities", "metadata", "id", "document_id"}
    assert "file_path" in rec["metadata"]

    from mmore_ray.pipelines.process import jsonl_to_table

    back = jsonl_to_table(jl)
    assert back.num_rows == table.num_rows


def test_run_process_binary_pdf_end_to_end(ray_session, tmp_path):
    """Binary formats must survive the content transport: the reader
    decodes them latin-1 (1:1 bytes) so PDFProcessor's
    encode('latin-1') recovers the exact file — utf-8/replace mangled
    every byte ≥ 0x80 and silently skipped all binary files.  The
    processor's metadata (paragraph_starts) must reach the output."""
    from mmore_ray.pipelines.process import run_process
    from mmore_ray.sources.pdfmini import make_pdf

    d = tmp_path / "docs"
    d.mkdir()
    # compressed stream ⇒ bytes ≥ 0x80 guaranteed in the payload
    (d / "r.pdf").write_bytes(make_pdf(["hello pdf world"], compress=True))
    stats = run_process([str(d)], tmp_path / "out")
    assert stats["processed"] == 1
    table = pq.read_table(stats["out"])
    assert table.column("processor_type").to_pylist() == ["PDFProcessor"]
    assert "hello pdf world" in table.column("text").to_pylist()[0]
    meta = json.loads(table.column("metadata_json").to_pylist()[0])
    assert meta["paragraph_starts"][0][1] == 0  # page 0 offset lineage


def test_incremental_reuse_keeps_all_chunk_rows(ray_session, tmp_path):
    """A chunked previous run owns N rows per file; reuse must carry
    ALL of them (latest-run-wins, not one arbitrary row per file)."""
    from functools import partial

    from mmore_ray.pipelines.process import run_process
    from mmore_ray.stages.chunker import chunk_batch

    d = tmp_path / "docs"
    d.mkdir()
    (d / "long.txt").write_text(
        "One sentence here. Two sentences now. Third one lands. Fourth.")
    out = tmp_path / "out"
    s1 = run_process([str(d)], out, stamp="2030-01-01T00:00:00",
                     postprocessors=[partial(chunk_batch, chunk_size=2)])
    assert s1["processed"] == 2  # two chunk rows
    s2 = run_process([str(d)], tmp_path / "out2",
                     previous_results=str(out / "merged"),
                     stamp="2030-06-01T00:00:00")
    assert s2["processed"] == 0
    assert s2["reused"] == 2  # both chunk rows survive reuse


def test_incremental_reuse_modified_new_deleted(ray_session, tmp_path):
    """The four reference cases: unchanged→reuse, modified→rerun,
    new→run, deleted→drop (test_previous_results.py semantics)."""
    from mmore_ray.pipelines.process import run_process

    _write_corpus(tmp_path)
    out = tmp_path / "out"
    # processed_at stamped in the future → untouched files count as
    # unchanged (mtime ≤ processed_at)
    s1 = run_process([str(tmp_path)], out, stamp="2030-01-01T00:00:00")
    assert s1["processed"] == 4 and s1["reused"] == 0
    prev = out / "merged"

    # modify one file (mtime > processed_at), add one, delete one
    import datetime as dt

    future = dt.datetime(2032, 1, 1).timestamp()
    os.utime(tmp_path / "docs" / "a.txt", times=(future, future))
    (tmp_path / "docs" / "e.txt").write_text("new doc")
    (tmp_path / "docs" / "d.csv").unlink()

    s2 = run_process([str(tmp_path)], tmp_path / "out2",
                     previous_results=str(prev),
                     stamp="2033-01-01T00:00:00")
    # b.md, c.html unchanged → reused; a.txt modified + e.txt new → processed
    assert s2["reused"] == 2
    assert s2["processed"] == 2


def test_html_comment_img_is_not_a_modality():
    """An <img> inside an HTML comment must not create a phantom
    modality that shifts every later tag->modality binding."""
    out = HTMLProcessor.parse("x.html", (
        '<p>start</p><!-- <img src="a.png"> --><p>mid</p>'
        '<img src="b.png">'))
    assert [m["value"] for m in out["modalities"]] == ["b.png"]
    assert out["text"].count(ATTACHMENT_TAG) == 1


def test_chunker_empty_text_keeps_one_row_and_null_text_ok():
    from mmore_ray.stages.chunker import chunk_document

    assert chunk_document("") == [("", False, "", 0)]
    assert chunk_document("   \n  ") == [("", False, "", 0)]
    t = pa.table({
        "sample_id": ["s1"], "document_id": ["d1"],
        "text": pa.array([None], pa.string()),
        "modalities": pa.array([[]], pa.list_(pa.struct(
            [("type", pa.string()), ("value", pa.string())]))),
        "file_path": ["/a"], "file_name": ["a"],
        "processor_type": ["TextProcessor"], "metadata_json": ["{}"]})
    from mmore_ray.stages.chunker import chunk_batch

    out = chunk_batch(t)
    assert out.num_rows == 1 and out.column("text").to_pylist() == [""]


def test_chunk_prose_unknown_unit_raises():
    from mmore_ray.stages.chunker import chunk_prose

    with pytest.raises(ValueError, match="unknown chunk unit"):
        chunk_prose("One sentence here. Two.", 2, "sentences")


def test_xlsx_error_cell_and_absolute_rel_target(tmp_path):
    import zipfile

    # workbook with an absolute sheet target and one error-typed cell
    p = tmp_path / "t.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml",
                   '<workbook xmlns="http://schemas.openxmlformats.org/'
                   'spreadsheetml/2006/main" xmlns:r="http://schemas.'
                   'openxmlformats.org/officeDocument/2006/relationships">'
                   '<sheets><sheet name="S1" sheetId="1" r:id="rId1"/>'
                   '</sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
                   '<Relationships xmlns="http://schemas.openxmlformats.org/'
                   'package/2006/relationships"><Relationship Id="rId1" '
                   'Type="w" Target="/xl/worksheets/sheet1.xml"/>'
                   '</Relationships>')
        z.writestr("xl/worksheets/sheet1.xml",
                   '<worksheet xmlns="http://schemas.openxmlformats.org/'
                   'spreadsheetml/2006/main"><sheetData>'
                   '<row r="1"><c r="A1" t="e"><v>#DIV/0!</v></c>'
                   '<c r="B1"><v>7</v></c></row></sheetData></worksheet>')
    out = SpreadsheetProcessor.parse(str(p), p.read_bytes())
    assert "#DIV/0!" in out["text"] and "7" in out["text"]


def test_jsonl_roundtrip_processed_at_and_document_id_fallback(tmp_path):
    import json as _json

    from mmore_ray.pipelines.process import jsonl_to_table, samples_to_jsonl

    t = pa.table({
        "sample_id": ["s1"], "document_id": ["d1"], "text": ["x"],
        "modalities": pa.array([[]], pa.list_(pa.struct(
            [("type", pa.string()), ("value", pa.string())]))),
        "file_path": ["/a/b.txt"], "file_name": ["b.txt"],
        "processor_type": ["TextProcessor"], "metadata_json": ["{}"],
        "processed_at": ["2026-08-18T00:00:00"]})
    p = tmp_path / "x.jsonl"
    samples_to_jsonl(t, p)
    back = jsonl_to_table(p)
    assert back.column("processed_at").to_pylist() == ["2026-08-18T00:00:00"]
    p2 = tmp_path / "y.jsonl"
    p2.write_text(_json.dumps(
        {"text": "t", "modalities": [], "metadata": {}, "id": "ID9"}) + "\n")
    assert jsonl_to_table(p2).column("document_id").to_pylist() == ["ID9"]


def test_markerless_processed_at_stamp_is_untrusted(ray_session, tmp_path):
    """processed_at stamps written before the UTC switch carry naive
    LOCAL time with no marker: in a UTC+X zone they read X hours late,
    so files modified shortly after that run would silently reuse
    stale. Markerless stamps must force a one-time reprocess; the rerun
    writes a 'Z'-marked stamp that is trusted again."""
    import pyarrow.parquet as _pq

    from mmore_ray.pipelines.process import run_process

    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.txt").write_text("hello stamp world")
    out = tmp_path / "out"
    s1 = run_process([str(d)], out, stamp="2030-01-01T00:00:00")
    assert s1["processed"] == 1
    merged = out / "merged"
    # every new stamp carries the UTC marker
    t = _pq.read_table(merged)
    assert all(s.endswith("Z") for s in t.column("processed_at").to_pylist())

    # strip the marker in place — simulates results from a pre-change run
    import pyarrow as _pa
    stripped = t.set_column(
        t.schema.get_field_index("processed_at"), "processed_at",
        _pa.array([s[:-1] for s in t.column("processed_at").to_pylist()],
                  _pa.string()))
    import shutil
    shutil.rmtree(merged)
    merged.mkdir()
    _pq.write_table(stripped, merged / "old.parquet")

    # markerless stamp (even a future one) → untrusted → reprocess once
    s2 = run_process([str(d)], tmp_path / "out2",
                     previous_results=str(merged),
                     stamp="2031-01-01T00:00:00")
    assert s2["processed"] == 1 and s2["reused"] == 0

    # the rerun's marked stamp is trusted → reuse
    s3 = run_process([str(d)], tmp_path / "out3",
                     previous_results=str(tmp_path / "out2" / "merged"),
                     stamp="2032-01-01T00:00:00")
    assert s3["processed"] == 0 and s3["reused"] == 1
