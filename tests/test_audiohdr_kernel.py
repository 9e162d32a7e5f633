"""AIFF / AIFF-C / Sun .au / WAV header-metadata kernel tests:
container walks, 80-bit extended-float rate, MIME routing, text tags,
invariant-7 fuzz. (The full PCM WAV decoder has its own tests in
test_media_kernels.py — parse_wav_header is the non-decoding
dispatcher posture.)"""

import random
import struct

from sparktika.kernels.audio import (_f80, parse_aiff, parse_au,
                                     parse_wav_header)
from sparktika.kernels.extract import extract_document
from sparktika.kernels.mime import detect_mime
from sparktika.synth import _f80_encode, build_audio_header


def _md1(r, key):
    v = r.metadata.get(key)
    return v[0] if v else None


def test_f80_roundtrip():
    for x in (8000.0, 44100.0, 22050.0, 11025.0, 48000.0, 1.0):
        assert _f80(_f80_encode(x)) == x
    assert _f80(b"\x00" * 10) == 0.0          # zero
    assert _f80(b"\x7f\xff" + b"\x80" + b"\x00" * 7) == 0.0  # inf/nan


def test_aiff_parse_and_tags():
    am, tags = parse_aiff(build_audio_header(0))
    assert (am.mime, am.sample_rate, am.channels, am.bits_per_sample,
            am.duration_ms) == ("audio/x-aiff", 8000, 1, 16, 100)
    assert tags["title"] == "Track 0"
    am1, tags1 = parse_aiff(build_audio_header(1))   # AIFC
    assert tags1["compression-type"] == "NONE"
    assert am1.channels == 2 and am1.duration_ms == 200


def test_au_parse():
    am, info = parse_au(build_audio_header(2))
    assert (am.mime, am.sample_rate, am.channels, am.bits_per_sample,
            am.duration_ms) == ("audio/basic", 8000, 1, 16, 300)
    assert info == "au 2"
    # mu-law encoding maps to 8 bits
    mulaw = b".snd" + struct.pack(">5I", 24, 8000, 1, 8000, 1) + b"\0" * 8000
    am2, _ = parse_au(mulaw)
    assert am2.bits_per_sample == 8 and am2.duration_ms == 1000


def test_wav_header_no_decode():
    am = parse_wav_header(build_audio_header(3))
    assert (am.mime, am.sample_rate, am.channels, am.bits_per_sample,
            am.duration_ms) == ("audio/x-wav", 8000, 2, 16, 100)
    # non-PCM format tag still reports properties, duration omitted
    fmt = struct.pack("<HHIIHH", 85, 2, 44100, 16000, 1, 0)  # mp3-in-wav
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    am2 = parse_wav_header(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert am2.sample_rate == 44100 and am2.duration_ms == 0


def test_mime_routing():
    assert detect_mime(build_audio_header(0)) == "audio/x-aiff"
    assert detect_mime(build_audio_header(1)) == "audio/x-aiff"
    assert detect_mime(build_audio_header(2)) == "audio/basic"
    assert detect_mime(build_audio_header(3)) == "audio/x-wav"
    # a non-AIFF IFF FORM (e.g. ILBM) must NOT route to audio
    ilbm = b"FORM" + struct.pack(">I", 12) + b"ILBM" + b"\x00" * 8
    assert detect_mime(ilbm) != "audio/x-aiff"


def test_dispatcher_end_to_end():
    for i in range(4):
        r = extract_document(f"u{i}", None, build_audio_header(i))
        assert r.status == "ok"
        assert r.text_extracted == ""
        assert _md1(r, "samplerate") == "8000"
    r = extract_document("u", None, build_audio_header(0))
    assert r.title == "Track 0"


def test_truncated_chunk_keeps_prefix():
    d = build_audio_header(0)
    # cut inside the NAME chunk: COMM already parsed -> meta survives
    cut = d[:12 + 8 + 26 + 8 + 2]
    got = parse_aiff(cut)
    assert got is not None and got[0].sample_rate == 8000


def test_fuzz_never_raises():
    rng = random.Random(8322)
    for i in range(300):
        base = build_audio_header(i % 4)
        mut = bytearray(base[:rng.randrange(1, len(base))])
        for _ in range(rng.randrange(0, 5)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        r = extract_document("u", None, bytes(mut))
        assert r.status in ("ok", "failed", "unsupported")
