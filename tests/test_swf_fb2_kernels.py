"""SWF header, PNM/PCX dims, FB2, and flat-ODF kernel tests:
compressed-body decode, bit-packed RECT, weak-magic gates, XML-route
refinements, invariant-7 fuzz."""

import random
import struct

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.fb2 import parse_fb2
from sparktika.kernels.image import is_pcx, pnm_dimensions, sniff_pnm
from sparktika.kernels.mime import detect_mime
from sparktika.kernels.swf import extract_swf
from sparktika.synth import (build_fb2, build_fodt, build_simple_image,
                             build_swf)


def _md1(r, key):
    v = r.metadata.get(key)
    return v[0] if v else None


# ----------------------------------------------------------------- swf

def test_swf_all_compressions():
    for i in (0, 1, 2):  # FWS, CWS, ZWS
        r = extract_swf(build_swf(i))
        assert r.compression == ["none", "zlib", "lzma"][i]
        assert r.width_px == 100 * (1 + i % 5)
        assert r.height_px == 50 * (1 + i % 4)
        assert r.frame_rate == 12.0 + i
        assert r.frame_count == 10 + i


def test_swf_signature_gate():
    # plausible version routes; version 0 or >64 does not
    assert detect_mime(build_swf(0)) == "application/x-shockwave-flash"
    junk = b"FWS" + bytes([200]) + b"\x00" * 20
    assert detect_mime(junk) != "application/x-shockwave-flash"


def test_swf_truncated_and_corrupt():
    with pytest.raises(KernelError):
        extract_swf(build_swf(1)[:10])  # truncated zlib body
    bad = bytearray(build_swf(0))
    bad[8] = 0xF8  # nbits=31 -> RECT larger than remaining body
    with pytest.raises(KernelError, match="RECT|dimensions"):
        extract_swf(bytes(bad))


# ------------------------------------------------------------- pnm/pcx

def test_pnm_comment_and_whitespace_tokens():
    dims, _pos = pnm_dimensions(b"P2 # x\n# comment line\n 17\t42\n255\n")
    assert dims == (17, 42)
    assert sniff_pnm(b"P6\n1 1\n255\n") == "image/x-portable-pixmap"
    assert sniff_pnm(b"P7\n") is None          # PAM not claimed
    assert sniff_pnm(b"P6x") is None           # no whitespace gate


def test_pnm_gate_rejects_prose_and_short_files(r8_review=True):
    """r8 review finding: 'P3 100 200 of our products...' prose must
    stay text, and an exactly-2-byte b'P3' must not be claimed via the
    empty-slice whitespace test."""
    prose = b"P3 100 200 of our products shipped on time this quarter."
    assert sniff_pnm(prose) is None
    r = extract_document("https://x/report.txt", "text/plain", prose)
    assert r.content_type_detected.startswith("text/plain")
    assert "products shipped" in r.text_extracted
    assert sniff_pnm(b"P3") is None
    assert sniff_pnm(b"P1 5 7 words follow here") is None
    # real images still claim (P1 bits / P3 maxval / comment-before-maxval)
    assert sniff_pnm(b"P1\n5 7\n0101010") == "image/x-portable-bitmap"
    assert sniff_pnm(b"P3 2 2\n255\n0 0 0") == "image/x-portable-pixmap"
    assert sniff_pnm(b"P2 2 2\n# c\n15\n0") == "image/x-portable-graymap"


def test_pcx_gate_rejects_text():
    assert not is_pcx(b"\x0a plain text that begins with a newline" * 4)
    d = build_simple_image(6)  # the PCX rotation slot
    assert is_pcx(d)
    assert detect_mime(d) == "image/vnd.zbrush.pcx"


def test_dims_end_to_end():
    for i in range(7):
        r = extract_document(f"u{i}.img", None, build_simple_image(i))
        assert r.status == "ok", (i, r.error)
        assert _md1(r, "Image Width") == str(32 * (1 + i % 5))
        assert _md1(r, "Image Height") == str(24 * (1 + i % 3))


# ----------------------------------------------------------------- fb2

def test_fb2_sections_and_metadata():
    r = parse_fb2(build_fb2(5).decode())
    assert r.title == "Book 5"
    assert r.authors == ["First0 Last5"]
    assert r.lang == "ru"
    assert r.n_sections == 3
    assert r.text == "Intro 5.\nSec 5 part 0.\nSec 5 part 1."


def test_fb2_description_not_in_body():
    r = extract_document("u.fb2", None, build_fb2(4))
    assert "First4" not in r.text_extracted
    assert "Book 4" not in r.text_extracted
    assert r.title == "Book 4"


def test_fb2_wrong_root_refuses():
    with pytest.raises(KernelError, match="root element"):
        parse_fb2("<notfb><body><p>x</p></body></notfb>")


# ---------------------------------------------------------------- fodt

def test_fodt_matches_packaged_odt_walk():
    r = extract_document("u.fodt", None, build_fodt(3))
    assert r.content_type_detected \
        == "application/vnd.oasis.opendocument.text-flat-xml"
    assert r.text_extracted == ("Fodt 3 line 0.\nFodt 3 line 1.\n"
                                "Fodt 3 line 2.\nFodt 3 line 3.\n")


def test_flat_ods_routes_to_sheet_walk():
    fods = (b'<?xml version="1.0"?>'
            b'<office:document xmlns:office="urn:x" xmlns:table="urn:t"'
            b' xmlns:text="urn:te" office:mimetype='
            b'"application/vnd.oasis.opendocument.spreadsheet">'
            b"<office:body><office:spreadsheet><table:table>"
            b"<table:table-row><table:table-cell><text:p>A1</text:p>"
            b"</table:table-cell><table:table-cell><text:p>B1</text:p>"
            b"</table:table-cell></table:table-row></table:table>"
            b"</office:spreadsheet></office:body></office:document>")
    r = extract_document("u.fods", None, fods)
    assert r.status == "ok"
    assert "A1" in r.text_extracted and "B1" in r.text_extracted
    assert "spreadsheet-flat-xml" in r.content_type_detected


def test_plain_xml_document_root_without_mimetype_stays_generic():
    xml = b'<?xml version="1.0"?><document><p>hello</p></document>'
    r = extract_document("u.xml", None, xml)
    assert r.content_type_detected.startswith("application/xml")
    assert "hello" in r.text_extracted


def test_fuzz_never_raises():
    rng = random.Random(8325)
    builders = (build_swf, build_fb2, build_fodt, build_simple_image)
    for i in range(240):
        base = builders[i % 4](i % 13)
        mut = bytearray(base[:rng.randrange(1, len(base))])
        for _ in range(rng.randrange(0, 5)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        r = extract_document("u", None, bytes(mut))
        assert r.status in ("ok", "failed", "unsupported", "truncated")


def test_swf_huge_declared_dict_contained():
    # a crafted ZWS header declaring a 1 GiB LZMA dict must not make
    # the worker allocate it — the clamp keeps decode correct (<=512
    # bytes of output can't reference further back than 1 MiB)
    bad = bytearray(build_swf(2))
    struct.pack_into("<I", bad, 13, 1 << 30)
    r = extract_swf(bytes(bad))
    assert r.width_px == 300 and r.compression == "lzma"


# ------------------------------------------------------------ ps / eps

def test_ps_dsc_fields_and_eps_flags():
    from sparktika.kernels.postscript import extract_ps
    from sparktika.synth import build_ps

    r = extract_ps(build_ps(2))           # EPSF, plain (not DOS)
    assert r.version == "3.0" and r.eps and not r.dos_eps
    assert r.fields["Title"] == "PS Doc 2"
    assert r.fields["Pages"] == "3"
    r5 = extract_ps(build_ps(5))          # DOS EPS wrapper, not EPSF
    assert r5.dos_eps and not r5.eps
    assert r5.fields["BoundingBox"] == "0 0 105 205"


def test_ps_body_never_extracted():
    from sparktika.synth import build_ps

    r = extract_document("u.ps", None, build_ps(4))
    assert r.text_extracted == ""
    assert "never extracted" not in (r.text_extracted or "")
    assert r.metadata["body-refusal"]


def test_ps_dos_eps_bad_offset_refuses():
    from sparktika.kernels.errors import KernelError as KE
    from sparktika.kernels.postscript import extract_ps

    import struct
    bad = b"\xc5\xd0\xd3\xc6" + struct.pack("<II", 99999, 10) + b"\x00" * 20
    with pytest.raises(KE, match="out of bounds"):
        extract_ps(bad)
    r = extract_document("u.eps", None, bad)
    assert r.status == "failed"


def test_ps_fuzz_never_raises():
    from sparktika.synth import build_ps

    rng = random.Random(8326)
    for i in range(120):
        base = build_ps(i % 11)
        mut = bytearray(base[:rng.randrange(1, len(base))])
        for _ in range(rng.randrange(0, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        r = extract_document("u", None, bytes(mut))
        assert r.status in ("ok", "failed", "unsupported", "truncated")


# -------------------------------------------------------------- abw/gpx

def test_abw_title_out_of_body():
    from sparktika.synth import build_abw_gpx

    r = extract_document("u.abw", None, build_abw_gpx(2))
    assert r.title == "Abi 2"
    assert "Abi 2" not in r.text_extracted.splitlines()[0] or \
        r.text_extracted.startswith("Abi para")
    assert r.text_extracted == ("Abi para 2 0.\nAbi para 2 1.\n"
                                "Abi para 2 2.")
    assert r.content_type_detected == "application/x-abiword"


def test_gpx_counts_and_names():
    from sparktika.kernels.xmlroutes import parse_gpx
    from sparktika.synth import build_abw_gpx

    g = parse_gpx(build_abw_gpx(3).decode())
    assert g.n_waypoints == 3 and g.n_trackpoints == 2 and g.n_tracks == 1
    assert g.names[0] == "Ride 3" and g.names[-1] == "Trk 3"


def test_abw_gpx_wrong_root_refuses():
    from sparktika.kernels.errors import KernelError as KE
    from sparktika.kernels.xmlroutes import parse_abiword, parse_gpx

    with pytest.raises(KE):
        parse_abiword("<x><p>no</p></x>")
    with pytest.raises(KE):
        parse_gpx("<x/>")


def test_abw_gpx_fuzz_never_raises():
    from sparktika.synth import build_abw_gpx

    rng = random.Random(8331)
    for i in range(120):
        base = build_abw_gpx(i % 9)
        mut = bytearray(base[:rng.randrange(1, len(base))])
        for _ in range(rng.randrange(0, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        r = extract_document("u", None, bytes(mut))
        assert r.status in ("ok", "failed", "unsupported", "truncated")
