"""Round-3 format additions: generic XML route + OpenDocument kernel."""

from __future__ import annotations

import io
import zipfile

import pytest

from sparktika.config import ExtractConfig
from sparktika.kernels.errors import DepthLimitError, InflateRatioError, KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.odf import extract_odf, sniff_odf
from sparktika.kernels.xmlparse import parse_xml_text


def test_xml_all_text_and_title():
    r = parse_xml_text(
        "<Feed><dc:title> T &amp; U </dc:title>"
        "<x:Entry id='1'>first</x:Entry><Entry>second</Entry></Feed>")
    assert r.text == "T & U\nfirst\nsecond\n"
    assert r.title == "T & U"
    assert r.root_tag == "Feed"  # case preserved (XML is case-sensitive)
    assert r.n_elements == 4


def test_xml_arbitrary_elements_not_dropped():
    """The round-2 HTML-walker route dropped text under elements outside
    the HTML safe sets; the XML route must keep everything."""
    r = parse_xml_text("<recipe><ingredient>salt</ingredient>"
                       "<quantity>1 tsp</quantity></recipe>")
    assert r.text == "salt\n1 tsp\n"


def test_xml_cdata_and_whitespace_nodes():
    r = parse_xml_text("<a>\n  <b><![CDATA[raw <&> bits]]></b>\n</a>")
    assert r.text == "raw <&> bits\n"


def test_xml_depth_bomb_raises():
    deep = "<d>" * 300 + "x" + "</d>" * 300
    with pytest.raises(DepthLimitError):
        parse_xml_text(deep, max_depth=200)
    r = extract_document("u.xml", None,
                         ("<?xml version='1.0'?>" + deep).encode())
    assert r.status == "failed" and "DepthLimitError" in r.error


def test_xml_dispatch_charset_from_declaration():
    xml = ("<?xml version='1.0' encoding='ISO-8859-1'?>"
           "<a><b>caf\xe9</b></a>").encode("latin-1")
    r = extract_document("u.xml", None, xml)
    assert r.status == "ok"
    assert r.charset_detected == "iso-8859-1"
    assert r.text_extracted == "café\n"


def _odf_zip(mimetype: str, entries: dict[str, bytes],
             store_mimetype: bool = True) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("mimetype", (1980, 1, 1, 0, 0, 0)),
                   mimetype,
                   compress_type=(zipfile.ZIP_STORED if store_mimetype
                                  else zipfile.ZIP_DEFLATED))
        for n, b in entries.items():
            z.writestr(zipfile.ZipInfo(n, (1980, 1, 1, 0, 0, 0)), b,
                       compress_type=zipfile.ZIP_DEFLATED)
    return buf.getvalue()


ODT = "application/vnd.oasis.opendocument.text"
ODS = "application/vnd.oasis.opendocument.spreadsheet"


def test_odf_sniff_deflated_mimetype_fallback():
    """Spec says STORED-first, but a nonconforming writer's deflated
    mimetype entry must still sniff via the zipfile fallback."""
    data = _odf_zip(ODT, {"content.xml": b"<a/>"}, store_mimetype=False)
    assert sniff_odf(data) == ODT


def test_odf_sniff_rejects_plain_zip_and_garbage():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", "x")
    assert sniff_odf(buf.getvalue()) is None
    assert sniff_odf(b"PK\x03\x04" + b"\x00" * 40) is None
    assert sniff_odf(b"notazip") is None


def test_odt_spaces_linebreaks_tabs():
    content = (b"<office:document-content><office:body><office:text>"
               b"<text:p>a<text:tab/>b<text:line-break/>c"
               b'<text:s text:c="3"/>d</text:p>'
               b"</office:text></office:body></office:document-content>")
    r = extract_odf(_odf_zip(ODT, {"content.xml": content}))
    assert r.text == "a\tb\nc   d\n"
    assert r.n_paragraphs == 1


def test_ods_column_repeat_and_trailing_trim():
    content = (b"<office:document-content><office:body>"
               b'<table:table table:name="S">'
               b"<table:table-row>"
               b'<table:table-cell table:number-columns-repeated="2">'
               b"<text:p>x</text:p></table:table-cell>"
               b"<table:table-cell><text:p>y</text:p></table:table-cell>"
               b'<table:table-cell table:number-columns-repeated="5"/>'
               b"</table:table-row></table:table>"
               b"</office:body></office:document-content>")
    r = extract_odf(_odf_zip(ODS, {"content.xml": content}))
    assert r.text == "S\nx\tx\ty\n"
    assert r.sheet_names == ["S"]


def test_odf_missing_content_xml_fails_closed():
    with pytest.raises(KernelError):
        extract_odf(_odf_zip(ODT, {"styles.xml": b"<a/>"}))
    r = extract_document("u.odt", None, _odf_zip(ODT, {"styles.xml": b"<a/>"}))
    assert r.status == "failed"


def test_odf_inflate_bomb_guarded():
    bomb = b"<office:document-content>" + b" " * 10_000_000 + \
        b"</office:document-content>"
    data = _odf_zip(ODT, {"content.xml": bomb})
    with pytest.raises(InflateRatioError):
        extract_odf(data, max_ratio=5.0, max_entry_bytes=100_000)
    r = extract_document(
        "u.odt", None, data,
        ExtractConfig(max_inflate_ratio=5.0, max_inflate_bytes=100_000))
    assert r.status == "failed" and "InflateRatioError" in r.error


def test_odf_end_to_end_through_dispatcher():
    from sparktika.synth import build_ods, build_odt

    r = extract_document("u.odt", None, build_odt(3))
    assert (r.status, r.content_type_detected) == ("ok", ODT)
    assert r.text_extracted == "Heading 3\nPara one 3 café & co.\nA\tB 3.\n"
    r = extract_document("u.ods", None, build_ods(3))
    assert (r.status, r.content_type_detected) == ("ok", ODS)
    assert r.text_extracted == "Data0\nA3\tB3\n3\n"


# --- EPUB -------------------------------------------------------------------

def test_epub_spine_order_and_title():
    from sparktika.synth import build_epub

    r = extract_document("u.epub", None, build_epub(4))
    assert (r.status, r.title) == ("ok", "Book 4")
    assert r.text_extracted == "Chapter one 4.\nChapter two 4.\n"
    assert r.content_type_detected == "application/epub+zip"


def test_epub_broken_opf_falls_back_to_zip_order():
    import io, zipfile
    from sparktika.kernels.epub import extract_epub

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("mimetype", (1980, 1, 1, 0, 0, 0)),
                   "application/epub+zip",
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("b.xhtml", "<body><p>beta</p></body>")
        z.writestr("a.xhtml", "<body><p>alpha</p></body>")
    r = extract_epub(buf.getvalue())
    # no container.xml: zip order, not alphabetical
    assert r.text == "beta\nalpha\n"
    assert r.title is None


def test_epub_truncation_budget_spans_chapters():
    from sparktika.config import ExtractConfig
    from sparktika.synth import build_epub

    r = extract_document("u.epub", None, build_epub(4),
                         ExtractConfig(max_chars=18))
    assert r.status == "truncated"
    # content chars are capped at 18; separators may add a little
    assert len(r.text_extracted) <= 22


def test_epub_inflate_bomb_guarded():
    import io, zipfile
    from sparktika.config import ExtractConfig

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("mimetype", (1980, 1, 1, 0, 0, 0)),
                   "application/epub+zip",
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("big.xhtml", "<p>" + "A" * 10_000_000 + "</p>",
                   compress_type=zipfile.ZIP_DEFLATED)
    r = extract_document("u.epub", None, buf.getvalue(),
                         ExtractConfig(max_inflate_ratio=5.0,
                                       max_inflate_bytes=100_000))
    assert r.status == "failed" and "InflateRatioError" in r.error


# --- review-pass regression pins (round-3) ----------------------------------

def test_odt_nonstandard_namespace_prefixes():
    """Attr lookups are prefix-agnostic like element names — a writer may
    bind the text namespace to any prefix."""
    from sparktika.kernels.odf import extract_odf

    content = (b"<ns0:document-content><ns0:body><ns0:text>"
               b'<ns1:p>a<ns1:s ns1:c="3"/>b</ns1:p>'
               b"</ns0:text></ns0:body></ns0:document-content>")
    r = extract_odf(_odf_zip(ODT, {"content.xml": content}))
    assert r.text == "a   b\n"


def test_ods_nonstandard_prefix_table_name():
    from sparktika.kernels.odf import extract_odf

    content = (b"<dc><body>"
               b'<t:table t:name="MySheet"><t:table-row>'
               b"<t:table-cell><x:p>v</x:p></t:table-cell>"
               b"</t:table-row></t:table></body></dc>")
    r = extract_odf(_odf_zip(ODS, {"content.xml": content}))
    assert r.sheet_names == ["MySheet"]
    assert r.text == "MySheet\nv\n"


def test_odt_nested_paragraph_keeps_outer_tail():
    """A text:p nested in the current paragraph (text boxes / draw:frame)
    must not close the outer paragraph and drop its tail text."""
    from sparktika.kernels.odf import extract_odf

    content = (b"<office:document-content><office:body><office:text>"
               b"<text:p>before<draw:frame><draw:text-box>"
               b"<text:p>inside</text:p></draw:text-box></draw:frame>"
               b"after</text:p>"
               b"</office:text></office:body></office:document-content>")
    r = extract_odf(_odf_zip(ODT, {"content.xml": content}))
    assert r.text == "beforeinsideafter\n"
    assert r.n_paragraphs == 1


def test_epub_separator_inflation_is_not_truncation():
    """div separators bypass the write count; total length reaching
    max_chars without dropped content must stay status=ok."""
    import io, zipfile
    from sparktika.config import ExtractConfig

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("mimetype", (1980, 1, 1, 0, 0, 0)),
                   "application/epub+zip",
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("c.xhtml",
                   "<body><div>abcde</div><div>fghij</div></body>")
    r = extract_document("u.epub", None, buf.getvalue(),
                         ExtractConfig(max_chars=12))
    # 10 content chars + 3 separator newlines: 13 chars total, ok status
    assert r.text_extracted == "abcde\n\nfghij\n"
    assert r.status == "ok"  # nothing was dropped


# --- SVG --------------------------------------------------------------------

def test_svg_route_with_and_without_xml_decl():
    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="120" '
           b'height="80" viewBox="0 0 120 80">'
           b"<title>Chart 1</title><text>Label A</text>"
           b"<g><text>Label B</text></g></svg>")
    for payload in (svg, b'<?xml version="1.0"?>' + svg):
        r = extract_document("u.svg", None, payload)
        assert r.status == "ok"
        assert r.content_type_detected == "image/svg+xml"
        assert r.text_extracted == "Chart 1\nLabel A\nLabel B\n"
        assert r.title == "Chart 1"
        assert r.metadata["Image Width"] == ["120"]
        assert r.metadata["Image Height"] == ["80"]
        assert r.metadata["svg:viewBox"] == ["0 0 120 80"]


def test_non_svg_xml_not_relabeled():
    r = extract_document("u.xml", None,
                         b"<?xml version='1.0'?><feed><x>t</x></feed>")
    assert r.content_type_detected == "application/xml"
    assert "Image Width" not in r.metadata


# ----------------------------------------------------------------- odp

def test_odp_slides_and_notes():
    from sparktika.kernels.extract import extract_document
    from sparktika.synth import build_odp

    r = extract_document("u/9.odp", None, build_odp(9))
    assert r.status == "ok"
    assert r.content_type_detected == \
        "application/vnd.oasis.opendocument.presentation"
    assert r.text_extracted == (
        "Slide one 9\nPoint A 9.\nNote for slide one 9.\n"
        "Slide two 9\nPoint B & C 9.\n")
    assert r.metadata["n-slides"] == ["2"]


def test_odf_sniff_requires_first_entry_mimetype():
    """A zip whose FIRST entry merely CONTAINS the ODF mime string (but
    is not named 'mimetype') must not route as ODF (ADVICE r3)."""
    import io
    import zipfile

    from sparktika.kernels.epub import sniff_epub
    from sparktika.kernels.odf import sniff_odf

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("notes.txt", (1980, 1, 1, 0, 0, 0)),
                   "application/vnd.oasis.opendocument.text mimetype "
                   "application/epub+zip",
                   compress_type=zipfile.ZIP_STORED)
        z.writestr(zipfile.ZipInfo("data.txt", (1980, 1, 1, 0, 0, 0)),
                   "hello", compress_type=zipfile.ZIP_DEFLATED)
    data = buf.getvalue()
    assert sniff_odf(data) is None
    assert not sniff_epub(data)
    # ...and the dispatcher still extracts it as a plain zip container
    from sparktika.kernels.extract import extract_document

    r = extract_document("u/x.zip", None, data)
    assert r.status == "ok"
    assert "hello" in (r.text_extracted or "")


def test_odf_sniff_nonconforming_writer_falls_back():
    """mimetype entry present but NOT first: the zipfile fallback still
    identifies the package."""
    import io
    import zipfile

    from sparktika.kernels.odf import ODT_MIME, sniff_odf

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("content.xml", (1980, 1, 1, 0, 0, 0)),
                   "<x/>", compress_type=zipfile.ZIP_DEFLATED)
        z.writestr(zipfile.ZipInfo("mimetype", (1980, 1, 1, 0, 0, 0)),
                   ODT_MIME, compress_type=zipfile.ZIP_STORED)
    assert sniff_odf(buf.getvalue()) == ODT_MIME
