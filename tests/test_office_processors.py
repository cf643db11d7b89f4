"""Stdlib PPTX/XLSX parsers against in-test constructed OOXML zips
(the containers python-pptx/openpyxl would produce; reference
semantics: pptx_processor.py:46-116, spreadsheet_processor.py:47-95)."""

import io
import zipfile

import pandas as pd
import pyarrow as pa

from mmore_ray.stages.processors import (
    ATTACHMENT_TAG,
    PPTXProcessor,
    SpreadsheetProcessor,
    dispatch,
    process_batch,
)

_P = "http://schemas.openxmlformats.org/presentationml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def _pptx_bytes() -> bytes:
    slide1 = f"""<p:sld xmlns:p="{_P}" xmlns:a="{_A}" xmlns:r="{_R}">
 <p:cSld><p:spTree>
  <p:sp><p:spPr><a:xfrm><a:off x="0" y="200"/></a:xfrm></p:spPr>
    <p:txBody><a:p><a:r><a:t>Second text</a:t></a:r></a:p></p:txBody></p:sp>
  <p:sp><p:spPr><a:xfrm><a:off x="0" y="100"/></a:xfrm></p:spPr>
    <p:txBody><a:p><a:r><a:t>First </a:t></a:r><a:r><a:t>text</a:t></a:r></a:p></p:txBody></p:sp>
  <p:pic><p:spPr><a:xfrm><a:off x="0" y="300"/></a:xfrm></p:spPr>
    <p:blipFill><a:blip r:embed="rId2"/></p:blipFill></p:pic>
 </p:spTree></p:cSld></p:sld>"""
    rels1 = f"""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId2" Type="{_R}/image" Target="../media/image1.png"/>
 <Relationship Id="rId3" Type="{_R}/notesSlide" Target="../notesSlides/notesSlide1.xml"/>
</Relationships>"""
    notes1 = f"""<p:notes xmlns:p="{_P}" xmlns:a="{_A}">
 <p:cSld><p:spTree>
  <p:sp><p:nvSpPr><p:nvPr><p:ph type="sldImg"/></p:nvPr></p:nvSpPr>
    <p:txBody><a:p><a:r><a:t>IGNORED thumbnail placeholder</a:t></a:r></a:p></p:txBody></p:sp>
  <p:sp><p:nvSpPr><p:nvPr><p:ph type="body"/></p:nvPr></p:nvSpPr>
    <p:txBody><a:p><a:r><a:t>speaker note one</a:t></a:r></a:p>
              <a:p><a:r><a:t>speaker note two</a:t></a:r></a:p></p:txBody></p:sp>
 </p:spTree></p:cSld></p:notes>"""
    slide2 = f"""<p:sld xmlns:p="{_P}" xmlns:a="{_A}">
 <p:cSld><p:spTree>
  <p:sp><p:txBody><a:p><a:r><a:t>Slide two only</a:t></a:r></a:p></p:txBody></p:sp>
 </p:spTree></p:cSld></p:sld>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/slides/slide1.xml", slide1)
        zf.writestr("ppt/slides/_rels/slide1.xml.rels", rels1)
        zf.writestr("ppt/notesSlides/notesSlide1.xml", notes1)
        zf.writestr("ppt/slides/slide2.xml", slide2)
    return buf.getvalue()


def test_pptx_shapes_sorted_attachments_and_notes():
    out = PPTXProcessor.parse("deck.pptx", _pptx_bytes())
    lines = out["text"].split("\n")
    # vertical order within slide 1, then attachment, then notes, then slide 2
    assert lines == ["First text", "Second text", ATTACHMENT_TAG,
                     "speaker note one", "speaker note two",
                     "Slide two only"]
    assert out["modalities"] == [
        {"type": "image", "value": "../media/image1.png"}]


def test_pptx_dispatch_and_batch():
    assert dispatch("a/deck.pptx") is PPTXProcessor
    payload = _pptx_bytes().decode("latin-1")
    batch = pa.table({"file_path": ["x/deck.pptx"], "content": [payload]})
    out = process_batch(batch)
    assert out.num_rows == 1
    assert out.column("processor_type").to_pylist() == ["PPTXProcessor"]
    assert "First text" in out.column("text").to_pylist()[0]


def _xlsx_bytes() -> bytes:
    workbook = f"""<workbook xmlns="{_S}" xmlns:r="{_R}">
 <sheets>
  <sheet name="S1" sheetId="1" r:id="rId1"/>
  <sheet name="S2" sheetId="2" r:id="rId2"/>
 </sheets></workbook>"""
    rels = f"""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="{_R}/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="{_R}/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""
    shared = f"""<sst xmlns="{_S}" count="3" uniqueCount="3">
 <si><t>name</t></si><si><t>qty</t></si><si><t>alpha</t></si></sst>"""
    sheet1 = f"""<worksheet xmlns="{_S}"><sheetData>
 <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
 <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>3</v></c></row>
 <row r="3"><c r="A3" t="inlineStr"><is><t>beta</t></is></c><c r="B3"><v>2.5</v></c></row>
</sheetData></worksheet>"""
    sheet2 = f"""<worksheet xmlns="{_S}"><sheetData>
 <row r="1"><c r="A1" t="inlineStr"><is><t>flag</t></is></c></row>
 <row r="2"><c r="A2" t="b"><v>1</v></c></row>
</sheetData></worksheet>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet1)
        zf.writestr("xl/worksheets/sheet2.xml", sheet2)
    return buf.getvalue()


def test_xlsx_sheets_render_like_reference():
    out = SpreadsheetProcessor.parse("book.xlsx", _xlsx_bytes())
    # reference shape: "Sheet: {name}\n" + df.to_string(index=False)
    exp1 = pd.DataFrame([["alpha", 3], ["beta", 2.5]],
                        columns=["name", "qty"])
    exp2 = pd.DataFrame([[True]], columns=["flag"])
    expected = (f"Sheet: S1\n{exp1.to_string(index=False)}\n\n"
                f"Sheet: S2\n{exp2.to_string(index=False)}").strip()
    from mmore_ray.functions.textfns import clean_text

    assert out["text"] == clean_text(expected)
    assert out["modalities"] == []


def test_xlsx_dispatch_and_types():
    assert dispatch("dir/book.xlsx") is SpreadsheetProcessor
    frames = dict(SpreadsheetProcessor._xlsx_frames(_xlsx_bytes()))
    assert list(frames) == ["S1", "S2"]
    s1 = frames["S1"]
    assert list(s1["qty"]) == [3, 2.5]  # int-like stays int, float stays
    assert list(s1["name"]) == ["alpha", "beta"]


REF_SAMPLES = "/root/reference/examples/sample_data"


def test_docx_parses_reference_sample():
    """Drive the stdlib DOCX parser over the reference's real fixture
    (examples/sample_data/docx/ums.docx — the same file its own
    test_processors_local.py uses)."""
    import os

    import pytest

    path = f"{REF_SAMPLES}/docx/ums.docx"
    if not os.path.exists(path):
        pytest.skip("reference sample data not present")
    from mmore_ray.stages.processors import DOCXProcessor

    out = DOCXProcessor.parse("ums.docx", open(path, "rb").read())
    assert len(out["text"]) > 1000
    assert "Swiss elite" in out["text"]
    # the document embeds images → attachment tags + image modalities
    assert len(out["modalities"]) >= 1
    assert out["text"].count(ATTACHMENT_TAG) == len(out["modalities"])


def test_xlsx_parses_reference_sample():
    import os

    import pytest

    path = f"{REF_SAMPLES}/spreadsheet/survey.xlsx"
    if not os.path.exists(path):
        pytest.skip("reference sample data not present")
    from mmore_ray.stages.processors import SpreadsheetProcessor

    out = SpreadsheetProcessor.parse("survey.xlsx", open(path, "rb").read())
    assert out["text"].startswith("Sheet: ")
    assert "Swiss" in out["text"]
    assert len(out["text"]) > 10_000  # full sheet rendered
