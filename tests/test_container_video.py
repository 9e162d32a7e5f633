"""WebM/Matroska (EBML) + AVI (RIFF) metadata tests."""

import random
import struct

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.video import (build_avi, build_webm, parse_avi,
                                     parse_webm)
from sparktika.synth import build_media_container


def test_webm_full_shape():
    m = parse_webm(build_webm("webm", ("V_VP9", 320, 240),
                              ("A_OPUS", 48000, 2), duration_ms=5000))
    assert (m.doctype, m.video_codec, m.width, m.height) == \
        ("webm", "V_VP9", 320, 240)
    assert (m.audio_codec, m.sample_rate, m.channels) == ("A_OPUS", 48000, 2)
    assert m.duration_ms == 5000
    assert m.n_tracks == 2


def test_matroska_doctype_and_video_only():
    m = parse_webm(build_webm("matroska", ("V_MPEG4/ISO/AVC", 1920, 1080),
                              None))
    assert m.doctype == "matroska"
    assert m.audio_codec is None
    assert m.n_tracks == 1


def test_ebml_unknown_size_segment():
    # live-streamed segments use the all-ones unknown size: the element
    # owns the rest of the stream
    full = build_webm("webm", ("V_VP8", 64, 48), None)
    seg_at = full.find(b"\x18\x53\x80\x67")
    assert seg_at > 0
    size_pos = seg_at + 4
    patched = (full[:size_pos] + b"\x01" + b"\xff" * 7
               + full[size_pos + 1:])
    m = parse_webm(patched)
    assert m.video_codec == "V_VP8"


def test_ebml_bomb_guards():
    with pytest.raises(KernelError):
        parse_webm(b"\x1aE\xdf\xa3\x00")          # vint length > 8
    # element claiming more than the container holds
    bad = b"\x1aE\xdf\xa3" + bytes([0x80 | 60]) + b"\x00" * 10
    with pytest.raises(KernelError):
        parse_webm(bad)


def test_avi_full_shape():
    a = parse_avi(build_avi(640, 480, 300, 25))
    assert (a.width, a.height, a.n_frames) == (640, 480, 300)
    assert a.fps == 25.0
    assert a.video_codec == "mjpg"
    assert a.audio_streams == 1
    assert a.duration_ms == 12000


def test_avi_chunk_overrun_refuses():
    good = bytearray(build_avi(64, 48, 10, 10))
    # inflate an inner chunk size past the container
    i = good.find(b"avih")
    struct.pack_into("<I", good, i + 4, 1 << 30)
    with pytest.raises(KernelError):
        parse_avi(bytes(good))


def test_fuzz_never_hangs():
    rnd = random.Random(43)
    for base in (0, 1, 2, 3):
        data = bytearray(build_media_container(base))
        for _ in range(60):
            i = rnd.randrange(len(data))
            orig = data[i]
            data[i] = rnd.randrange(256)
            try:
                if data[:4] == b"\x1aE\xdf\xa3":
                    parse_webm(bytes(data))
                else:
                    parse_avi(bytes(data))
            except KernelError:
                pass
            data[i] = orig
