"""TrueType/OpenType + PSD metadata tests."""

import random
import struct

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.font import build_font, build_ttc, is_font, parse_font
from sparktika.kernels.image import image_dimensions
from sparktika.synth import build_design_asset


def test_name_table_and_priorities():
    md = parse_font(build_font({1: "Fam", 2: "Bold", 4: "Fam Bold",
                                5: "Version 2.0", 6: "Fam-Bold"}))
    assert md["font-family"] == ["Fam"]
    assert md["font-name"] == ["Fam Bold"]
    assert md["font-version"] == ["Version 2.0"]
    assert md["font-flavor"] == ["truetype"]


def test_mac_name_yields_to_windows():
    # hand-build a name table with a Mac record first, Windows second
    mac = b"MacName"
    win = "WinName".encode("utf-16-be")
    recs = (struct.pack(">HHHHHH", 1, 0, 0, 1, len(mac), 0)
            + struct.pack(">HHHHHH", 3, 1, 0x409, 1, len(win), len(mac)))
    name_tab = struct.pack(">HHH", 0, 2, 6 + 24) + recs + mac + win
    hdr = b"\x00\x01\x00\x00" + struct.pack(">HHHH", 1, 16, 1, 0)
    data = hdr + b"name" + struct.pack(">III", 0, 28, len(name_tab)) + name_tab
    md = parse_font(data)
    assert md["font-family"] == ["WinName"]


def test_otf_flavor():
    md = parse_font(build_font({1: "O", 4: "O Full"}, flavor=b"OTTO"))
    assert md["font-flavor"] == ["cff"]
    assert md["Content-Type"] == ["application/x-font-otf"]


def test_ttc_first_font_and_count():
    ttc = build_ttc([build_font({1: "A", 4: "A Full"}),
                     build_font({1: "B", 4: "B Full"})])
    md = parse_font(ttc)
    assert md["font-family"] == ["A"]
    assert md["font-collection-count"] == ["2"]


def test_is_font_validator():
    assert is_font(build_font({1: "X", 4: "X F"}))
    # version-looking binary with garbage table tag must not detect
    junk = b"\x00\x01\x00\x00" + struct.pack(">HHHH", 2, 16, 1, 0) \
        + b"\x01\x02\x03\x04" + b"\x00" * 12 + b"\x00" * 16
    assert not is_font(junk)
    assert not is_font(b"\x00\x01\x00\x00\xff\xff")  # implausible count


def test_out_of_bounds_table_refuses():
    f = bytearray(build_font({1: "X", 4: "X F"}))
    struct.pack_into(">I", f, 12 + 8, 1 << 30)  # first table offset
    with pytest.raises(KernelError):
        parse_font(bytes(f))


def test_psd_dims_and_validation():
    psd = (b"8BPS" + struct.pack(">H", 1) + b"\x00" * 6
           + struct.pack(">HIIHH", 3, 480, 640, 8, 3) + b"\x00" * 8)
    assert image_dimensions(psd) == ("image/vnd.adobe.photoshop", 640, 480)
    bad = bytearray(psd)
    struct.pack_into(">H", bad, 22, 7)  # depth 7 invalid
    assert image_dimensions(bytes(bad)) is None


def test_dispatcher_and_fuzz():
    r = extract_document("https://x/f.ttf", None, build_design_asset(0))
    assert r.status == "ok"
    assert r.title == "Font 0 Full"
    rnd = random.Random(17)
    for base in (0, 1, 2, 9):
        data = bytearray(build_design_asset(base))
        for _ in range(40):
            i = rnd.randrange(len(data))
            orig = data[i]
            data[i] = rnd.randrange(256)
            rr = extract_document("https://x/a.bin", None, bytes(data))
            assert rr.status in ("ok", "failed", "unsupported")
            data[i] = orig


def test_woff_compressed_and_stored_tables():
    from sparktika.kernels.font import build_woff, parse_font

    for comp in (True, False):
        md = parse_font(build_woff({1: "Fam", 4: "Fam Regular"},
                                   n_glyphs=7, compress_name=comp))
        assert md["Content-Type"] == ["application/font-woff"]
        assert md["font-name"] == ["Fam Regular"]
        assert md["font-glyphs"] == ["7"]


def test_woff2_refuses_body_with_flavor():
    from sparktika.kernels.font import parse_font

    md = parse_font(b"wOF2" + b"OTTO" + bytes(44))
    assert md["Content-Type"] == ["application/font-woff2"]
    assert md["font-flavor"] == ["cff"]
    assert "body-refusal" in md


def test_woff_corrupt_deflate_refuses():
    import pytest as _pytest

    from sparktika.kernels.errors import KernelError
    from sparktika.kernels.font import build_woff, parse_font

    b = bytearray(build_woff({1: "F", 4: "F R"}))
    # data area starts after the 44-byte header + two 20-byte dirents;
    # corrupt inside the first zlib stream
    b[44 + 40 + 2] ^= 0xFF
    with _pytest.raises(KernelError):
        parse_font(bytes(b))


def test_woff_dispatcher_route():
    from sparktika.kernels.extract import extract_document
    from sparktika.synth import build_woff_doc

    r = extract_document("f.woff", None, build_woff_doc(3))
    assert r.status == "ok"
    assert r.content_type_detected == "application/font-woff"
    assert r.metadata["title"] == ["Synth Font 3"]
    r2 = extract_document("f.woff2", None, build_woff_doc(4))
    assert r2.content_type_detected == "application/font-woff2"
    assert r2.status == "ok"


def test_woff_fuzz_never_raises():
    import random

    from sparktika.kernels.extract import ExtractConfig, extract_document
    from sparktika.synth import build_woff_doc

    rng = random.Random(0x30FF)
    seeds = [build_woff_doc(i) for i in range(5)]
    for _ in range(200):
        base = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        if rng.random() < 0.3:
            base = base[:rng.randrange(len(base))]
        r = extract_document("f.woff", None, bytes(base), ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")
