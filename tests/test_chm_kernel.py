"""CHM / ITSS kernel tests (metadata-first; r5 VERDICT item 7)."""

from __future__ import annotations

import random
import struct

import pytest

from sparktika.kernels.chm import _encint, extract_chm, is_chm
from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import ExtractConfig, extract_document
from sparktika.kernels.mime import detect_mime
from sparktika.synth import build_chm


def test_basic_extraction_title_and_topics():
    r = extract_chm(build_chm(7))
    assert r.title == "Chm manual 7"
    assert r.text == "Chm topic 7 one.\nChm topic 7 two.\n"
    assert r.entries == ["topic7a.html", "topicb.html"]
    assert r.metadata["generator"] == ["synth-hhc 1.0"]
    assert "compressed-members" not in r.metadata


def test_lzx_members_extract():
    r = extract_chm(build_chm(6))
    assert r.entries == ["topic6a.html", "topicb.html",
                         "zpackA.html", "zpackB.html"]
    assert r.metadata["compressed-members"] == ["2"]
    assert "compression-refused" not in r.metadata
    assert r.text == ("Chm topic 6 one.\nChm topic 6 two.\n"
                      "Chm packed 6 alpha.\nChm packed 6 beta.\n")


def _strip_stream(blob: bytes, name: bytes) -> bytes:
    """Corrupt a directory entry's name so the machinery lookup misses."""
    out = bytearray(blob)
    i = out.find(name)
    assert i != -1
    out[i] = ord("X")
    return bytes(out)


def test_lzx_missing_control_data_refuses_bodies_not_doc():
    blob = _strip_stream(build_chm(6), b"::DataSpace/Storage/"
                                       b"MSCompressed/ControlData")
    r = extract_chm(blob)
    # compressed bodies refuse with a reason; uncompressed topics extract
    assert r.text == "Chm topic 6 one.\nChm topic 6 two.\n"
    assert r.metadata["compressed-members"] == ["2"]
    assert r.metadata["compression-refused"] == ["lzx-machinery-missing"]


def test_lzx_corrupt_content_refuses_bodies_not_doc():
    from sparktika.kernels.lzx import LzxEncoder

    pa = b"<html><body><p>Chm packed 6 alpha.</p></body></html>"
    pb = b"<html><body><p>Chm packed 6 beta.</p></body></html>"
    comp, _ = LzxEncoder().compress_stream(pa + pb, reset_frames=2)
    blob = bytearray(build_chm(6))
    i = bytes(blob).find(comp)
    assert i != -1
    for off in range(8, 24):  # flip bytes inside the LZX stream
        blob[i + off] ^= 0xFF
    r = extract_chm(bytes(blob))
    assert r.text == "Chm topic 6 one.\nChm topic 6 two.\n"
    assert r.metadata["compression-refused"][0].startswith("lzx-")


def test_lzxc_version_gate_refuses():
    blob = bytearray(build_chm(6))
    i = bytes(blob).find(b"LZXC")
    struct.pack_into("<I", blob, i + 4, 3)  # version 3: units unknown
    r = extract_chm(bytes(blob))
    assert r.metadata["compression-refused"] == \
        ["lzxc-version-3-unsupported"]
    assert r.text == "Chm topic 6 one.\nChm topic 6 two.\n"


def test_mime_magic_both_versions():
    assert detect_mime(build_chm(1)) == "application/vnd.ms-htmlhelp"
    v2 = b"ITSF\x02\x00\x00\x00" + b"\x00" * 96
    assert detect_mime(v2) == "application/vnd.ms-htmlhelp"
    assert not is_chm(b"ITSF")  # too short


def test_encint_roundtrip():
    from sparktika.synth import _chm_encint

    for v in (0, 1, 127, 128, 300, 0x3FFF, 0x4000, 10**9):
        data = _chm_encint(v) + b"\xff"
        got, pos = _encint(data, 0, len(data))
        assert got == v and pos == len(data) - 1
    with pytest.raises(KernelError):
        _encint(b"\x80\x80\x80\x80\x80\x80\x80", 0, 7)  # never terminates


def test_bad_itsp_magic_refuses():
    blob = bytearray(build_chm(1))
    blob[0x78:0x7C] = b"XXXX"
    with pytest.raises(KernelError):
        extract_chm(bytes(blob))


def test_chunk_count_cap():
    blob = bytearray(build_chm(1))
    struct.pack_into("<I", blob, 0x78 + 44, 1 << 20)
    with pytest.raises(KernelError):
        extract_chm(bytes(blob))


def test_member_out_of_bounds_refuses():
    blob = build_chm(1)
    # truncate the content area: directory still parses, member read must
    # refuse instead of slicing silently short
    with pytest.raises(KernelError):
        extract_chm(blob[:-20])


def test_char_budget():
    r = extract_chm(build_chm(2), max_chars=10)
    assert len(r.text) == 10 and r.truncated


def test_dispatcher_status_rows_never_raise():
    rng = random.Random(0xC4A)
    seeds = [build_chm(i) for i in range(3)]
    for _ in range(300):
        blob = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 10)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        if rng.random() < 0.3:
            blob = blob[:rng.randrange(len(blob))]
        r = extract_document("f.chm", None, bytes(blob), ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")
