"""zstd kernel (RFC 8878 from-scratch decoder): CLI-frozen golden
parity across compression levels, store-frame round-trips, bomb and
corruption posture (invariant 7), dispatcher routing."""

from __future__ import annotations

import pathlib
import random

import pytest

from sparktika.kernels.errors import InflateRatioError, KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.mime import detect_mime
from sparktika.kernels.zstd import decompress_zstd, xxh64
from sparktika.synth import build_zstd_frame, build_zstd_txt

GOLDENS = pathlib.Path(__file__).parent / "goldens" / "zstd"


def test_xxh64_spec_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(bytes(range(101))) == xxh64(bytes(range(101)))  # determinism
    assert xxh64(b"a", seed=1) != xxh64(b"a")


@pytest.mark.parametrize("name", ["text", "mixed", "binary", "lowent",
                                  "runs", "html"])
@pytest.mark.parametrize("level", [1, 3, 19])
def test_golden_parity(name, level):
    """Frames produced by the reference zstd CLI (frozen in goldens/)
    decode byte-identically — covers compressed blocks, 1/4-stream
    Huffman, FSE + predefined + RLE + repeat sequence tables, treeless
    literals, repeat offsets, across entropy profiles."""
    payload = (GOLDENS / f"{name}.bin").read_bytes()
    comp = (GOLDENS / f"{name}.l{level}.zst").read_bytes()
    assert decompress_zstd(comp, 10_000_000) == payload


def test_store_frame_roundtrip_and_structure():
    for payload in (b"", b"x", b"hello" * 100, bytes(range(256)) * 700):
        f = build_zstd_frame(payload, block_size=997)
        assert decompress_zstd(f, 1_000_000) == payload


def test_checksum_verified():
    f = bytearray(build_zstd_frame(b"checked payload"))
    f[-1] ^= 0x55  # corrupt the XXH64 trailer
    with pytest.raises(KernelError, match="checksum"):
        decompress_zstd(bytes(f), 1000)


def test_content_size_mismatch_detected():
    f = bytearray(build_zstd_frame(b"12345678"))
    f[5] = 9  # declared FCS no longer matches the blocks
    with pytest.raises(KernelError, match="content size|checksum"):
        decompress_zstd(bytes(f), 1000)


def test_output_cap_is_a_hard_stop():
    """A 30,000:1 RLE bomb must die on the cap, never materialize."""
    magic = (0xFD2FB528).to_bytes(4, "little")
    # single-segment, FCS flag 2 (4B), no checksum; one RLE block
    frame = (magic + bytes([0x20 | (2 << 6)])
             + (100_000).to_bytes(4, "little")
             + ((100_000 << 3) | (1 << 1) | 1).to_bytes(3, "little")
             + b"\x00")
    with pytest.raises(InflateRatioError):
        decompress_zstd(frame, 10_000)


def test_dictionary_frames_refused():
    magic = (0xFD2FB528).to_bytes(4, "little")
    frame = magic + bytes([0x21]) + b"\x07" + b"\x00"  # dict id 7
    with pytest.raises(KernelError, match="dictionary"):
        decompress_zstd(frame, 1000)


def test_truncation_never_silent():
    comp = (GOLDENS / "mixed.l3.zst").read_bytes()
    for cut in range(4, len(comp) - 1, max(1, len(comp) // 60)):
        with pytest.raises((KernelError, InflateRatioError)):
            decompress_zstd(comp[:cut], 10_000_000)


def test_corruption_fuzz_never_escapes():
    rng = random.Random(99)
    comp = (GOLDENS / "text.l19.zst").read_bytes()
    payload = (GOLDENS / "text.bin").read_bytes()
    for _ in range(150):
        b = bytearray(comp)
        for _ in range(rng.randrange(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            out = decompress_zstd(bytes(b), 10_000_000)
            # the checksum makes silent corruption astronomically
            # unlikely; equal output means the flip was in dead space
            assert out == payload
        except (KernelError, InflateRatioError):
            pass


def test_skippable_frames_and_mime():
    f = build_zstd_txt(7)  # leading skippable frame
    assert detect_mime(f) == "application/zstd"
    assert detect_mime(build_zstd_txt(2)) == "application/zstd"
    r = extract_document("u/7.txt.zst", None, f)
    assert r.status == "ok"
    assert r.text_extracted == "Zstd note 7 body.\n"
    assert r.metadata["Content-Encoding-Outer"] == ["zstd"]


def test_dispatcher_nested_zstd_refused():
    inner = build_zstd_frame(b"inner text")
    outer = build_zstd_frame(inner)
    r = extract_document("u/x.zst", None, outer)
    assert r.status == "failed" and "nested zstd" in (r.error or "")


def test_dispatcher_html_inside_zstd():
    html = b"<html><title>Z</title><body><p>zstd wrapped page</p></html>"
    r = extract_document("u/p.html.zst", None, build_zstd_frame(html))
    assert r.status == "ok" and "zstd wrapped page" in r.text_extracted
    assert r.title == "Z"
