"""Snappy (raw + framing) and zlib-deflate wrapper tests."""

import random
import zlib

import pytest

from sparktika.kernels.errors import InflateRatioError, KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.snappy import (FRAME_MAGIC, _compress_raw,
                                      compress_framed, crc32c,
                                      decompress_framed, decompress_raw)
from sparktika.synth import build_modern_codec_txt


def test_crc32c_known_vector():
    # the canonical CRC-32C check string (public test vector)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_raw_known_answer():
    # hand-assembled: varint(11), literal "snap" (tag 3<<2), copy-1
    # len=4 off=4, literal "xyz"
    raw = bytes([11, 3 << 2]) + b"snap" + bytes([(0 << 2) | 1, 4]) \
        + bytes([2 << 2]) + b"xyz"
    assert decompress_raw(raw, 64) == b"snapsnapxyz"


def test_roundtrip_matrix():
    rnd = random.Random(3)
    cases = [b"", b"a", b"hello hello hello hello world", b"abc" * 5000,
             bytes(rnd.randrange(256) for _ in range(3000)),
             bytes(rnd.randrange(3) for _ in range(50000))]
    for raw in cases:
        assert decompress_raw(_compress_raw(raw), len(raw) + 16) == raw
        for unc in (False, True):
            f = compress_framed(raw, chunk_size=7000,
                                uncompressed_chunks=unc)
            assert decompress_framed(f, 10 * len(raw) + 1024) == raw


def test_checksum_verified():
    f = bytearray(compress_framed(b"x" * 500))
    f[len(FRAME_MAGIC) + 6] ^= 1
    with pytest.raises(KernelError):
        decompress_framed(bytes(f), 1 << 20)


def test_declared_size_is_a_contract():
    # overrun and underrun both refuse
    ok = _compress_raw(b"abcd" * 10)
    under = bytes([ok[0] + 4]) + ok[1:]   # declare more than produced
    with pytest.raises(KernelError):
        decompress_raw(under, 1 << 20)
    with pytest.raises(InflateRatioError):
        decompress_raw(_compress_raw(b"z" * 5000), 100)


def test_reserved_unskippable_refuses():
    f = compress_framed(b"data") + bytes([0x20, 1, 0, 0, 0])
    with pytest.raises(KernelError):
        decompress_framed(f, 1 << 20)
    # skippable + padding chunks pass
    f2 = (FRAME_MAGIC + bytes([0xFE, 2, 0, 0]) + b"xy"
          + bytes([0x80, 1, 0, 0]) + b"q")
    assert decompress_framed(f2, 1 << 20) == b""


def test_truncation_sweep_never_garbage():
    raw = b"sweep the frame. " * 400
    f = compress_framed(raw, chunk_size=512)
    for cut in range(4, len(f), 11):
        try:
            out = decompress_framed(f[:cut], 1 << 22)
        except (KernelError, InflateRatioError):
            continue
        assert raw.startswith(out)  # whole-chunk prefixes only


def test_dispatcher_routes():
    r = extract_document("https://x/n.txt.sz", None,
                         compress_framed(b"framed snappy text\n"))
    assert r.status == "ok"
    assert r.text_extracted == "framed snappy text\n"
    assert r.metadata["Content-Encoding-Outer"] == ["snappy"]
    r2 = extract_document("https://x/n.txt.zz", None,
                          zlib.compress(b"zlib text\n", 6))
    assert r2.status == "ok"
    assert r2.metadata["Content-Encoding-Outer"] == ["deflate"]
    r3 = extract_document("https://x/n.txt.zz", None,
                          zlib.compress(b"y" * 500)[:-3])
    assert r3.status == "failed"
    # nested refusal both ways
    r4 = extract_document(
        "https://x/a.zz.sz", None,
        compress_framed(zlib.compress(b"deep" * 100)))
    assert r4.status == "failed" and "nested deflate" in (r4.error or "")


def test_synth_parity():
    for i in (0, 1, 2, 3, 6, 7):
        r = extract_document(
            f"https://x/{i}.txt.{'sz' if i % 2 == 0 else 'zz'}", None,
            build_modern_codec_txt(i))
        assert r.status == "ok"
        want = f"Modern codec note {i} body.\n"
        if i % 3 == 0:
            want += "Chunky filler line repeating itself. " * 30
        assert r.text_extracted == want


def test_fuzz_never_raises():
    rnd = random.Random(31)
    data = bytearray(build_modern_codec_txt(6))
    for _ in range(150):
        i = rnd.randrange(len(data))
        orig = data[i]
        data[i] = rnd.randrange(256)
        rr = extract_document("https://x/n.txt.sz", None, bytes(data))
        assert rr.status in ("ok", "failed", "unsupported", "truncated")
        data[i] = orig


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=20000), st.booleans(),
       st.sampled_from([512, 65536]))
def test_property_framed_roundtrip(raw, unc, chunk):
    f = compress_framed(raw, chunk_size=chunk, uncompressed_chunks=unc)
    assert decompress_framed(f, 10 * len(raw) + 1024) == raw


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=8000))
def test_property_raw_roundtrip(raw):
    assert decompress_raw(_compress_raw(raw), len(raw) + 16) == raw
