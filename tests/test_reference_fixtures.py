"""Parity checks against the reference's OWN test fixtures and goldens
(ref: test/TikaProcessTest.java:124-139). These exercise real-world
documents (Netscape-era HTML, Adobe Distiller PDF), not our synthetic
grammar.

Pinned parity:
- html-sample.html: extracted char count == 2,648 (exact match with the
  reference golden) and metadata key count == 8 (exact match), 4 anchors.
- pdf-sample.pdf: extracted char count == 1,069 (exact match with the
  reference golden, TikaProcessTest.java:129-133): ToUnicode CMap maps the
  Symbol-font bullet to U+2022, xref-stream + ObjStm object resolution,
  and PDFBox-equivalent paragraph segmentation + Tika handler framing.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from sparktika.kernels.extract import extract_document

FIXTURES = Path("/root/reference/tika-fork-client/test-files")

# Engine-side fields this pipeline adds beyond the Tika-parity key sets
# (reserved names from main/TikaConstants.java:12-27 + workbook extras).
ENGINE_KEYS = {"resource_name", "parsing_time", "write_limit_reached",
               "sheet-names", "n-cells"}

pytestmark = pytest.mark.skipif(
    not FIXTURES.exists(), reason="reference fixtures not available")


def test_html_sample_char_and_metadata_golden_parity():
    data = (FIXTURES / "html-sample.html").read_bytes()
    r = extract_document("https://example.com/html-sample.html", "text/html", data)
    assert r.status == "ok"
    assert r.n_chars_out == 2648  # reference golden (TikaProcessTest.java:138)
    assert len(r.metadata) == 8   # reference golden (TikaProcessTest.java:136)
    assert r.title == "BGN 9: Meiotic behavior of a barley-rye hybrid"
    assert r.charset_detected == "iso-8859-1"
    anchors = [l for l in r.links if l.type == "a"]
    assert [l.target_uri for l in anchors] == [
        "9p19.gif", "9p19.gif", "9toc.html", "http://wheat.pw.usda.gov/ggpages/bgn/"]


def test_pdf_sample_text_extraction():
    data = (FIXTURES / "pdf-sample.pdf").read_bytes()
    r = extract_document("https://example.com/pdf-sample.pdf", "application/pdf", data)
    assert r.status == "ok"
    t = r.text_extracted
    assert r.n_chars_out == 1069  # reference golden (TikaProcessTest.java:133)
    # byte-level structure: 8 paragraphs separated by blank lines, the
    # Symbol-font bullet decoded through its ToUnicode CMap, page framing
    # newlines at the end (empty <p/> + </div> writer + XHTML newlines)
    assert t.startswith("Adobe Acrobat PDF Files\n\nAdobe® Portable Document")
    assert t.endswith("page at a time for fast display on the Web.\n\n\n\n\n")
    paragraphs = [p for p in t.split("\n\n") if p.strip()]
    assert len(paragraphs) == 8
    assert sum(1 for p in paragraphs if p.startswith("•")) == 5
    assert "universal file format" in t
    assert "\x01" not in t  # raw Symbol code must not leak (ToUnicode applied)
    # metadata key parity: the reference pins 39 distinct keys for this
    # fixture (TikaProcessTest.java:129-133); engine-only fields sit on top
    tika_keys = {k for k in r.metadata if k not in ENGINE_KEYS}
    assert len(tika_keys) == 39
    assert r.metadata["dc:title"] == ["This is a test PDF file"]
    assert r.metadata["pdf:docinfo:creator"] == ["cdaily"]
    assert r.metadata["producer"] == ["Acrobat Distiller 4.0 for Windows"]
    assert r.metadata["xmp:CreatorTool"] == ["Microsoft Word 8.0"]
    # PDF dates normalized to UTC ISO (D:20000629102108+11'00' -> Z)
    assert r.metadata["dcterms:created"] == ["2000-06-28T23:21:08Z"]
    assert r.metadata["dcterms:modified"] == ["2013-10-28T19:24:13Z"]
    assert r.metadata["xmpTPg:NPages"] == ["1"]
    assert r.metadata["pdf:unmappedUnicodeCharsPerPage"] == ["0"]


def test_txt_sample_cap_semantics():
    data = (FIXTURES / "out.txt").read_bytes()
    from sparktika.config import ExtractConfig

    r = extract_document("u", "text/plain", data, ExtractConfig(max_chars=100))
    # we pin an EXACT cap (the reference's observed 101 is a commons-io
    # off-by-one, deliberately not reproduced — SURVEY.md O5)
    assert r.status == "truncated"
    assert len(r.text_extracted) == 100
    assert r.text_extracted == ("test file here\n" * 7)[:100]


def test_xls_sample_text_extraction():
    data = (FIXTURES / "xls-sample.xls").read_bytes()
    r = extract_document("u", None, data)
    assert r.content_type_detected == "application/vnd.ms-excel"
    assert r.status == "ok"
    # reference golden: exactly 4,824 chars (TikaProcessTest.java:127)
    assert r.n_chars_out == 4824
    assert r.text_extracted.startswith(
        "Sheet1\n\t\t\tMedicaid Prescription Reimbursement")
    assert r.metadata["sheet-names"] == ["Sheet1", "Sheet2", "Sheet3"]
    assert "Alabama" in r.text_extracted and "Wyoming" in r.text_extracted
    # metadata key parity: the reference pins 23 distinct keys for this
    # fixture (TikaProcessTest.java:124-128), fed by the OLE2
    # SummaryInformation / DocumentSummaryInformation property sets
    tika_keys = {k for k in r.metadata if k not in ENGINE_KEYS}
    assert len(tika_keys) == 23
    assert r.metadata["Author"] == ["CMS"]
    assert r.metadata["Last-Author"] == ["d1j7"]
    assert r.metadata["Application-Name"] == ["Microsoft Excel"]
    assert r.metadata["extended-properties:Company"] == ["CMS"]
    assert r.metadata["dcterms:created"] == ["2003-04-21T18:43:48Z"]
    assert r.metadata["Last-Printed"] == ["2004-12-06T16:22:10Z"]
