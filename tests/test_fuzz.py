"""Property-based never-crash tests (hypothesis): the extraction dispatch
must return a status row for ANY byte payload — the engine-level analog of
the reference's failure-isolation contract (a poisoned document can never
kill the run; ref: client/TikaRunner.java:142-147)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from sparktika.config import ExtractConfig
from sparktika.kernels.charset import decode as charset_decode, detect_charset
from sparktika.kernels.extract import extract_document
from sparktika.kernels.htmlparse import parse_html
from sparktika.kernels.mime import detect_mime

VALID_STATUSES = {"ok", "truncated", "timeout", "failed",
                  "skipped_oversize", "unsupported"}

_CFG = ExtractConfig(max_bytes=1_000_000, max_chars=50_000, timeout_ms=10_000)

_settings = settings(max_examples=200, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])


@given(st.binary(max_size=4096))
@_settings
def test_extract_document_never_raises_on_random_bytes(payload):
    r = extract_document("https://fuzz/x", None, payload, _CFG)
    assert r.status in VALID_STATUSES
    assert r.n_bytes_in == len(payload)


@given(st.binary(max_size=2048), st.sampled_from(
    [None, "text/html", "application/pdf", "text/plain", "application/zip"]))
@_settings
def test_extract_document_never_raises_with_declared_types(payload, declared):
    r = extract_document("u", declared, payload, _CFG)
    assert r.status in VALID_STATUSES


# HTML-shaped garbage: tags, attrs, entities, brokenness
_html_chunks = st.lists(
    st.one_of(
        st.text(max_size=20),
        st.sampled_from([
            "<div>", "</div>", "<span>", "</span>", "<p>", "<a href='x'>",
            "</a>", "<script>", "</script>", "<!--", "-->", "<![CDATA[",
            "]]>", "&amp;", "&#x41;", "&#999999999;", "&bogus;", "<", ">",
            "<img src=", "'>", '">', "<body>", "</body>", "<b", "=''",
            "<input type=image>", "<form method=post>", "<a", "href",
        ]),
    ),
    max_size=40,
)


@given(_html_chunks)
@_settings
def test_parse_html_never_raises_on_tag_soup(chunks):
    html = "".join(chunks)
    r = parse_html(html, max_chars=10_000, max_depth=64)
    assert r.text is not None
    # leading-separator suppression invariant: output never starts with a
    # writer-generated separator when the first content wrote at offset 0
    for l in r.links:
        assert l.anchor == l.anchor.strip() or l.anchor == ""


@given(st.binary(max_size=1024))
@_settings
def test_mime_and_charset_total_functions(payload):
    m = detect_mime(payload)
    assert isinstance(m, str) and "/" in m
    cs = detect_charset(payload)
    text, used = charset_decode(payload, cs)
    assert isinstance(text, str)
    # output must always be valid UTF-8-encodable (the UTF-8-out contract)
    text.encode("utf-8")


@given(st.text(max_size=200), st.integers(min_value=0, max_value=50))
@_settings
def test_write_limit_exactness_property(text, cap):
    """For any text and cap, extracted plain text is min(len, cap) chars
    and a truncated status appears iff the cap actually bit."""
    payload = text.encode("utf-8")
    cfg = ExtractConfig(max_chars=cap)
    r = extract_document("u", "text/plain", payload, cfg)
    if r.status in ("ok", "truncated"):
        assert len(r.text_extracted) <= max(cap, 0) or cap == -1
        if len(text) > cap:
            assert r.status == "truncated"


# Email/RTF/msg-shaped garbage: declared types force the new kernels to face
# arbitrary bytes (the header-sniff alone would reject most of them)
@given(st.binary(max_size=2048), st.sampled_from(
    ["message/rfc822", "application/rtf"]))
@_settings
def test_new_kernels_never_raise_on_random_bytes(payload, declared):
    r = extract_document("u", declared, payload, _CFG)
    assert r.status in VALID_STATUSES


_eml_chunks = st.lists(
    st.one_of(
        st.text(max_size=24),
        st.sampled_from([
            "From: a@x\r\n", "Subject: =?utf-8?B?###?=\r\n", "To: b\n",
            "Content-Type: multipart/mixed; boundary=B\r\n",
            "Content-Type: multipart/alternative\r\n",
            "Content-Transfer-Encoding: base64\r\n",
            "Content-Transfer-Encoding: quoted-printable\r\n",
            "\r\n", "--B\r\n", "--B--\r\n", "=E9=", "QUJD", "=?bogus?Q?x?=",
            "Content-Type: message/rfc822\r\n", "MIME-Version: 1.0\r\n",
        ]),
    ),
    max_size=30,
)


@given(_eml_chunks)
@_settings
def test_eml_structured_garbage_never_raises(chunks):
    payload = "".join(chunks).encode("utf-8", "replace")
    r = extract_document("u.eml", "message/rfc822", payload, _CFG)
    assert r.status in VALID_STATUSES


_rtf_chunks = st.lists(
    st.one_of(
        st.text(max_size=12),
        st.sampled_from([
            "{", "}", "\\par ", "\\u9999?", "\\u-5000x", "\\uc2 ", "\\'e9",
            "\\'zz", "\\bin10 XXXXXXXXXX", "\\bin99999 ", "{\\*\\gen x}",
            "{\\fonttbl", "{\\info{\\title T}}", "\\ansicpg1251 ", "\\~\\-\\_",
        ]),
    ),
    max_size=40,
)


@given(_rtf_chunks)
@_settings
def test_rtf_structured_garbage_never_raises(chunks):
    payload = ("{\\rtf1" + "".join(chunks)).encode("utf-8", "replace")
    r = extract_document("u.rtf", None, payload, _CFG)
    assert r.status in VALID_STATUSES


@given(st.binary(max_size=1024))
@_settings
def test_compressed_rtf_stream_never_crashes_msg(payload):
    """A corrupt PR_RTF_COMPRESSED stream must degrade inside extract_msg."""
    from sparktika.kernels.msg import extract_msg
    from sparktika.kernels.ole2 import Ole2File
    from sparktika.synth import _ole2_file

    data = _ole2_file({
        "__substg1.0_0037001F": "s".encode("utf-16-le"),
        "__substg1.0_10090102": payload,
        "__properties_version1.0": b"\x00" * 16,
    })
    r = extract_msg(Ole2File(data))
    assert r.subject == "s"


@given(st.binary(max_size=2048))
@settings(max_examples=150, suppress_health_check=[HealthCheck.too_slow],
          deadline=None)
def test_media_decoders_fail_closed_on_random_bytes(payload):
    """decode_any / sample_frames on arbitrary bytes: KernelError (or a
    DecodedImage / frame list), never another exception type — the
    multimodal pipeline's per-row containment depends on it."""
    from sparktika.kernels.errors import KernelError
    from sparktika.kernels.image import decode_any
    from sparktika.kernels.video import sample_frames

    try:
        img = decode_any(payload)
        assert img.width > 0 and img.height > 0
    except KernelError:
        pass
    try:
        sample_frames(payload, 2)
    except KernelError:
        pass


@given(st.binary(max_size=2048))
@settings(max_examples=100, suppress_health_check=[HealthCheck.too_slow],
          deadline=None)
def test_media_decoders_fail_closed_with_magic_prefixes(payload):
    """Same, but with valid magic bytes prepended so the fuzz reaches the
    per-format parsers instead of dying at the sniff."""
    from sparktika.kernels.errors import KernelError
    from sparktika.kernels.image import decode_any

    for magic in (b"\x89PNG\r\n\x1a\n", b"BM" + b"\x00" * 60,
                  b"GIF89a", b"\xff\xd8\xff"):
        try:
            decode_any(magic + payload)
        except KernelError:
            pass


# --- scan_html_meta differential: the metadata-only fast path must agree
# with the full walker on every observable it shares (exception type,
# title) for ANY input, including crafted tag soup ---------------------------

_meta_html_chunks = st.lists(
    st.one_of(
        st.text(max_size=20),
        st.sampled_from([
            "<html>", "<head>", "</head>", "<title>", "</title>", "<body>",
            "</body>", "<div>", "</div>", "<p>", "</p>", "<hr>", "<br/>",
            "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
            "<![CDATA[", "]]>", "&amp;", "&#x41;", "&bogus;", "&nbsp;",
            "<", ">", "</", "<b", "='x'>", "<TITLE>T</TITLE>",
            "<title>deep<b>in</b>side</title>", "<?pi?>", "<!doctype html>",
            "<a href='u'>t</a>", "<img src=x alt='y'>", "<head>",
            "<meta name='description' content='a &amp; b'>",
            "<meta name=viewport content=wide>", "<meta content='x'>",
            "<meta name='dup' content='1'>", "<meta name='dup' content='2'>",
        ]),
    ),
    max_size=50,
)


def _observables(html: str, max_depth: int = 40):
    from sparktika.kernels.errors import DepthLimitError
    from sparktika.kernels.htmlparse import scan_html_meta

    def run(fn):
        try:
            r = fn()
            return (None, r.title, tuple(sorted(r.meta.items())))
        except DepthLimitError:
            return ("depth", None, ())

    full = run(lambda: parse_html(html, max_chars=-1, max_depth=max_depth,
                                  extract_links=True, collect_blocks=True,
                                  emit_text=True, meta_tags=True))
    lean = run(lambda: scan_html_meta(html, max_depth=max_depth,
                                      meta_tags=True))
    return full, lean


@given(_meta_html_chunks)
@_settings
def test_scan_html_meta_matches_full_walker(chunks):
    full, lean = _observables("".join(chunks))
    assert full == lean


def test_scan_html_meta_matches_on_adversarial_cases():
    cases = [
        # title scoping edge: <body> while in_title does not close the title
        "<head><title>a<body>b</title>c</head>",
        # title after </body> when body never started
        "<head></head></body><title>late</title>",
        # title in body scope is NOT captured (body_started gate)
        "<body><title>nope</title>",
        # text before head flips body_started, later title not captured
        "x<title>skipped</title>",
        # &nbsp;-only text must NOT flip body_started (decodes to \xa0)
        "&nbsp;<title>kept</title>",
        # p auto-close via void <hr> affects depth bookkeeping
        "<p>" * 30 + "<hr>" + "<div>" * 30,
        # depth bomb: identical DepthLimitError in both modes
        "<div>" * 300,
        # depth bomb defused by </body> clearing the stack
        "<div>" * 30 + "</body>" + "<div>" * 30,
        # raw-text elements hide tags from both modes
        "<script><div><div><div></script><title>t</title>",
        "<script src=x/><title>t2</title>",
        # quoted '>' inside attr must not end the tag
        '<div title="a>b"><title>q</title>',
        # CDATA inside title
        "<title><![CDATA[cd &amp; ata]]></title>",
        # bogus end tag and trailing '<'
        "<title>t</ >u</title><",
        # entities in title, whitespace collapse
        "<title>  a &amp;\n b  </title>",
        # unclosed everything
        "<head><title>open",
    ]
    for html in cases:
        full, lean = _observables(html, max_depth=40)
        assert full == lean, f"divergence on {html!r}: {full} vs {lean}"


_xml_chunks = st.lists(
    st.one_of(
        st.text(max_size=15),
        st.sampled_from([
            "<a>", "</a>", "<b:c d='e'>", "</b:c>", "<x/>", "<![CDATA[",
            "]]>", "<!--", "-->", "<?pi?>", "&amp;", "&#x41;", "<", ">",
            "</", "<_u.v>", "='", "<title>", "</title>",
        ]),
    ),
    max_size=40,
)


@given(_xml_chunks)
@_settings
def test_parse_xml_text_never_raises_on_tag_soup(chunks):
    from sparktika.kernels.xmlparse import parse_xml_text

    r = parse_xml_text("".join(chunks), max_depth=30)
    assert isinstance(r.text, str)


@given(st.binary(max_size=2048))
@_settings
def test_odf_sniff_and_extract_fail_closed(payload):
    from sparktika.kernels.odf import sniff_odf

    # arbitrary bytes: sniff returns None or a valid mimetype, never raises
    mt = sniff_odf(b"PK\x03\x04" + payload)
    assert mt is None or mt.startswith("application/vnd.oasis")
    r = extract_document("u.odt", None, b"PK\x03\x04" + payload, _CFG)
    assert r.status in VALID_STATUSES


@given(st.binary(max_size=2048))
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_7z_magic_prefixed_garbage_never_raises(payload):
    """Random bytes behind the 7z magic: the route must fail to a status
    row, never raise out of the dispatcher (invariant 7)."""
    from sparktika.kernels.extract import extract_document

    r = extract_document("u/f.7z", None, b"7z\xbc\xaf\x27\x1c" + payload)
    assert r.status in ("ok", "failed", "unsupported", "truncated")


@given(st.binary(max_size=2048))
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_mbox_garbage_never_raises(payload):
    from sparktika.kernels.extract import extract_document

    head = b"From a@b.c Thu Jan  1 00:00:00 1970\nFrom: a@b.c\nSubject: s\n\n"
    r = extract_document("u/f.mbox", None, head + payload)
    assert r.status in ("ok", "failed", "unsupported", "truncated", "timeout")


@given(st.binary(max_size=2048))
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_zstd_magic_prefixed_garbage_never_raises(payload):
    """Random bytes behind the zstd magic: status row, never a raise
    and never an uncaught IndexError from a lying length (r5)."""
    from sparktika.kernels.extract import extract_document

    r = extract_document("u/f.zst", None, b"\x28\xb5\x2f\xfd" + payload)
    assert r.status in ("ok", "failed", "unsupported", "truncated")


@given(st.binary(max_size=4096))
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_pst_magic_prefixed_garbage_never_raises(payload):
    from sparktika.kernels.extract import extract_document

    r = extract_document("u/f.pst", None, b"!BDN" + payload)
    assert r.status in ("ok", "failed", "unsupported", "truncated")


@given(st.binary(max_size=2048), st.integers(0, 40))
@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_pst_mutated_valid_store_never_raises(payload, n_flips):
    """Byte flips over a VALID store exercise deep NDB/LTP paths."""
    from sparktika.kernels.extract import extract_document
    from sparktika.synth import build_pst

    data = bytearray(build_pst(1))
    for i in range(n_flips):
        if payload[i % max(len(payload), 1):][:1]:
            pos = payload[i % len(payload)] * max(len(data) // 256, 1) % len(data)
            data[pos] ^= payload[(i * 7) % len(payload)]
    r = extract_document("u/m.pst", None, bytes(data))
    assert r.status in ("ok", "failed", "unsupported", "truncated", "timeout")


@given(st.binary(max_size=2048))
@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_xlsb_record_garbage_never_raises(payload):
    """Garbage record streams inside a valid zip must stop with what
    parsed, never raise."""
    import io
    import zipfile

    from sparktika.kernels.extract import extract_document

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", b"<Types/>")
        z.writestr("xl/workbook.bin", payload)
        z.writestr("xl/sharedStrings.bin", payload[::-1])
        z.writestr("xl/worksheets/sheet1.bin", payload)
    r = extract_document("u/f.xlsb", None, buf.getvalue())
    assert r.status in ("ok", "failed", "unsupported", "truncated")


@given(st.lists(
    st.lists(st.one_of(
        st.integers(-2**28, 2**28 - 1),
        st.booleans(),
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA0,
                                       blacklist_characters="\t\x7f"),
                max_size=12)),
        min_size=1, max_size=5),
    min_size=1, max_size=6))
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_xlsb_xlsx_differential_random_grids(grid):
    """Property: ANY grid of ints/bools/strings renders to the same
    text through the binary (XLSB) and XML (xlsx) walkers."""
    import io
    import struct
    import zipfile
    from xml.sax.saxutils import escape

    from sparktika.kernels.extract import extract_document
    from sparktika.synth import _xlsb_rec

    def cell_b(col, v):
        pre = col.to_bytes(4, "little") + b"\x00" * 4
        if isinstance(v, bool):
            return _xlsb_rec(0x04, pre + (b"\x01" if v else b"\x00"))
        if isinstance(v, int):
            return _xlsb_rec(0x05, pre + struct.pack("<d", float(v)))
        return _xlsb_rec(0x06, pre + len(v).to_bytes(4, "little")
                         + v.encode("utf-16-le"))

    def cell_x(ref, v):
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, int):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t>{escape(v)}</t></is>'
                f'</c>')

    sheet_b = _xlsb_rec(0x91)
    rows_x = []
    for r, row in enumerate(grid):
        sheet_b += _xlsb_rec(0x00, r.to_bytes(4, "little") + b"\x00" * 13)
        cells_x = []
        for c, v in enumerate(row):
            sheet_b += cell_b(c, v)
            cells_x.append(cell_x(f"{chr(65 + c)}{r + 1}", v))
        rows_x.append(f'<row r="{r + 1}">' + "".join(cells_x) + "</row>")
    sheet_b += _xlsb_rec(0x92)
    sheet_x = ("<worksheet><sheetData>" + "".join(rows_x)
               + "</sheetData></worksheet>").encode()

    def zf(entries):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            for n, p in entries.items():
                z.writestr(zipfile.ZipInfo(n, (1980, 1, 1, 0, 0, 0)), p)
        return buf.getvalue()

    wb_b = _xlsb_rec(0x9C, b"\x00" * 8
                     + (4).to_bytes(4, "little") + "rId1".encode("utf-16-le")
                     + (1).to_bytes(4, "little") + "G".encode("utf-16-le"))
    rels_b = (b'<Relationships><Relationship Id="rId1" Type="t" '
              b'Target="worksheets/sheet1.bin"/></Relationships>')
    xlsb = zf({"[Content_Types].xml": b"<Types/>", "xl/workbook.bin": wb_b,
               "xl/_rels/workbook.bin.rels": rels_b,
               "xl/worksheets/sheet1.bin": sheet_b})
    wb_x = b'<workbook><sheets><sheet name="G" sheetId="1" r:id="rId1"/></sheets></workbook>'
    rels_x = (b'<Relationships><Relationship Id="rId1" Type="t" '
              b'Target="worksheets/sheet1.xml"/></Relationships>')
    xlsx = zf({"[Content_Types].xml": b"<Types/>", "xl/workbook.xml": wb_x,
               "xl/_rels/workbook.xml.rels": rels_x,
               "xl/worksheets/sheet1.xml": sheet_x})
    rb = extract_document("u/g.xlsb", None, xlsb)
    rx = extract_document("u/g.xlsx", None, xlsx)
    assert rb.text_extracted == rx.text_extracted


@given(st.binary(max_size=30000), st.sampled_from([1, 3, 19]))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_zstd_cli_roundtrip_property(payload, level):
    """Property: anything the reference zstd CLI emits, the from-spec
    decoder reproduces byte-identically."""
    import shutil
    import subprocess

    import pytest as _pytest

    from sparktika.kernels.zstd import decompress_zstd

    cli = shutil.which("zstd") or "/root/miniconda/bin/zstd"
    try:
        proc = subprocess.run([cli, f"-{level}", "-c"], input=payload,
                              capture_output=True, timeout=30)
    except (FileNotFoundError, subprocess.TimeoutExpired):
        _pytest.skip("zstd CLI unavailable")
    if proc.returncode != 0:
        _pytest.skip("zstd CLI failed in this environment")
    comp = proc.stdout
    assert decompress_zstd(comp, 10_000_000) == payload


@given(st.binary(max_size=4096))
@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_sqlite_magic_prefixed_garbage_never_raises(payload):
    from sparktika.kernels.extract import extract_document

    r = extract_document("u/f.sqlite", None,
                         b"SQLite format 3\x00" + payload)
    assert r.status in ("ok", "failed", "unsupported", "truncated")


@given(st.binary(max_size=2048))
@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_lz4_magic_prefixed_garbage_never_raises(payload):
    from sparktika.kernels.extract import extract_document

    r = extract_document("u/f.lz4", None, b"\x04\x22\x4d\x18" + payload)
    assert r.status in ("ok", "failed", "unsupported", "truncated")


@given(st.binary(max_size=20000), st.sampled_from(["-1", "-9"]))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_lz4_cli_roundtrip_property(payload, level):
    import shutil
    import subprocess

    import pytest as _pytest

    from sparktika.kernels.lz4 import decompress_lz4

    cli = shutil.which("lz4") or "/root/miniconda/bin/lz4"
    try:
        proc = subprocess.run([cli, level, "-c"], input=payload,
                              capture_output=True, timeout=30)
    except (FileNotFoundError, subprocess.TimeoutExpired):
        _pytest.skip("lz4 CLI unavailable")
    if proc.returncode != 0:
        _pytest.skip("lz4 CLI failed in this environment")
    assert decompress_lz4(proc.stdout, 10_000_000) == payload
