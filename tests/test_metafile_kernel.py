"""WMF/EMF metafile kernel — [MS-WMF]/[MS-EMF] text records.

Tika 1.20 parity target: WMFParser/EMFParser (via tika-parsers:1.20).
"""

from __future__ import annotations

import random
import struct

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import ExtractConfig, extract_document
from sparktika.kernels.metafile import (
    build_emf,
    build_wmf,
    is_emf,
    is_wmf,
    parse_emf,
    parse_wmf,
)
from sparktika.synth import build_metafile


def test_wmf_placeable_exttextout():
    r = parse_wmf(build_wmf(["one", "two"]))
    assert r.text == "one\ntwo\n"
    assert r.kind == "wmf" and len(r.texts) == 2
    assert (r.width_units, r.height_units) == (2880, 1440)


def test_wmf_bare_textout():
    data = build_wmf(["plain text out"], placeable=False, extended=False)
    assert is_wmf(data)
    assert parse_wmf(data).text == "plain text out\n"


def test_wmf_exttextout_with_opaque_rect():
    # fwOpts ETO_OPAQUE inserts an 8-byte rect before the string
    raw = b"rected"
    body = struct.pack("<hhHH", 5, 5, len(raw), 0x0002) + bytes(8) + raw
    rec = struct.pack("<IH", 3 + (len(body) + len(body) % 2) // 2,
                      0x0A32) + body + b"\x00" * (len(body) % 2)
    hdr = struct.pack("<HHHIHIH", 1, 9, 0x0300, (18 + len(rec) + 6) // 2,
                      0, 0, 0)
    data = hdr + rec + struct.pack("<IH", 3, 0x0000)
    assert parse_wmf(data).text == "rected\n"


def test_emf_wide_and_ansi_and_small():
    assert parse_emf(build_emf(["wide"])).text == "wide\n"
    assert parse_emf(build_emf(["ansi"], wide=False)).text == "ansi\n"
    assert parse_emf(build_emf(["small"], small=True)).text == "small\n"


def test_emf_frame_dims():
    r = parse_emf(build_emf(["x"]))
    assert (r.width_units, r.height_units) == (200, 100)


def test_detection_gates():
    assert is_emf(build_emf(["t"]))
    assert not is_emf(b"\x01\x00\x00\x00" + b"x" * 100)   # no sig at 40
    assert is_wmf(build_wmf(["t"], placeable=False))
    # bare-WMF shape facts must ALL hold
    assert not is_wmf(struct.pack("<HHH", 1, 8, 0x0300) + bytes(12))
    assert not is_wmf(struct.pack("<HHH", 3, 9, 0x0300) + bytes(12))
    assert not is_wmf(struct.pack("<HHH", 1, 9, 0x0200) + bytes(12))


def test_dispatcher_all_four_kinds():
    for i in range(8):
        r = extract_document(f"{i}.bin", None, build_metafile(i))
        assert r.status == "ok"
        want_mime = "image/wmf" if i % 4 < 2 else "image/emf"
        assert r.content_type_detected == want_mime
        assert r.text_extracted == (f"Meta line one {i}.\n"
                                    f"Meta line two {i}.\n")
        assert r.metadata["metafile-text-records"] == ["2"]


def test_truncated_tail_keeps_prior_text():
    data = build_emf(["kept line", "lost line"])
    # cut inside the second EXTTEXTOUTW record
    cut = data[: 88 + (len(data) - 88 - 20) // 2]
    r = parse_emf(cut)
    assert "kept line" in r.text and "lost line" not in r.text


def test_not_metafile_raises():
    with pytest.raises(KernelError):
        parse_wmf(b"\x00" * 64)
    with pytest.raises(KernelError):
        parse_emf(b"\x00" * 64)


def test_record_must_advance():
    # a WMF record declaring size_words < 3 must refuse, not loop
    hdr = struct.pack("<HHHIHIH", 1, 9, 0x0300, 64, 0, 0, 0)
    data = hdr + struct.pack("<IH", 2, 0x0521) + b"\x00" * 64
    with pytest.raises(KernelError):
        parse_wmf(data)


def test_fuzz_never_raises_through_dispatcher():
    rng = random.Random(0x3EF)
    seeds = [build_metafile(i) for i in range(4)]
    for _ in range(250):
        base = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        if rng.random() < 0.3:
            base = base[:rng.randrange(len(base))]
        r = extract_document("f.bin", None, bytes(base), ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")
