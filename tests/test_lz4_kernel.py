"""LZ4 kernel: CLI-frozen golden parity (fast/high compression,
block-dependent + block-checksum streams), store-frame round-trips,
bomb/corruption posture, dispatcher routing, skippable-family MIME
disambiguation vs zstd."""

from __future__ import annotations

import pathlib
import random

import pytest

from sparktika.kernels.errors import InflateRatioError, KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.lz4 import decompress_lz4, xxh32
from sparktika.kernels.mime import detect_mime
from sparktika.synth import build_lz4_frame, build_lz4_txt

GOLDENS = pathlib.Path(__file__).parent / "goldens" / "lz4"


def test_xxh32_spec_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"a", seed=1) != xxh32(b"a")


@pytest.mark.parametrize("name", ["text", "mixed", "binary", "lowent",
                                  "runs", "html"])
@pytest.mark.parametrize("tag", ["l1", "l9", "bd"])
def test_golden_parity(name, tag):
    payload = (GOLDENS / f"{name}.bin").read_bytes()
    comp = (GOLDENS / f"{name}.{tag}.lz4").read_bytes()
    assert decompress_lz4(comp, 10_000_000) == payload


def test_store_frame_roundtrip():
    for payload in (b"", b"x", b"hello" * 300, bytes(range(256)) * 500):
        f = build_lz4_frame(payload, block_size=777)
        assert decompress_lz4(f, 1_000_000) == payload


def test_checksums_verified():
    f = bytearray(build_lz4_frame(b"checked payload"))
    f[-1] ^= 0x55
    with pytest.raises(KernelError, match="checksum"):
        decompress_lz4(bytes(f), 1000)
    f2 = bytearray(build_lz4_frame(b"hdr check"))
    f2[7] ^= 0x01  # descriptor content-size byte: HC mismatch
    with pytest.raises(KernelError, match="descriptor|content size"):
        decompress_lz4(bytes(f2), 1000)


def test_output_cap_and_dict_refusal():
    comp = build_lz4_frame(b"\x00" * 500_000)
    with pytest.raises(InflateRatioError):
        decompress_lz4(comp, 10_000)
    magic = (0x184D2204).to_bytes(4, "little")
    frame = magic + bytes([(1 << 6) | 0x01, 4 << 4]) + bytes(5)
    with pytest.raises(KernelError):
        decompress_lz4(frame, 1000)


def test_truncation_never_silent():
    comp = (GOLDENS / "mixed.l9.lz4").read_bytes()
    for cut in range(4, len(comp) - 1, max(1, len(comp) // 60)):
        with pytest.raises((KernelError, InflateRatioError)):
            decompress_lz4(comp[:cut], 10_000_000)


def test_corruption_fuzz_never_escapes():
    rng = random.Random(42)
    comp = (GOLDENS / "text.l9.lz4").read_bytes()
    for _ in range(150):
        b = bytearray(comp)
        for _ in range(rng.randrange(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            decompress_lz4(bytes(b), 10_000_000)
        except (KernelError, InflateRatioError):
            pass


def test_skippable_family_disambiguation():
    """zstd and lz4 share the 0x184D2A5x skippable magics: the sniff
    must resolve to the codec of the first REAL frame."""
    from sparktika.synth import build_zstd_txt

    assert detect_mime(build_lz4_txt(7)) == "application/x-lz4"
    assert detect_mime(build_zstd_txt(7)) == "application/zstd"
    assert detect_mime(build_lz4_txt(2)) == "application/x-lz4"


def test_dispatcher_routes_and_nested_refusal():
    r = extract_document("u/7.txt.lz4", None, build_lz4_txt(7))
    assert r.status == "ok"
    assert r.text_extracted == "Lz4 note 7 body.\n"
    assert r.metadata["Content-Encoding-Outer"] == ["lz4"]
    nested = build_lz4_frame(build_lz4_frame(b"inner"))
    r2 = extract_document("u/x.lz4", None, nested)
    assert r2.status == "failed" and "nested lz4" in (r2.error or "")


def test_legacy_frame_via_cli():
    import shutil
    import subprocess

    cli = shutil.which("lz4") or "/root/miniconda/bin/lz4"
    try:
        p = subprocess.run([cli, "-l", "-c"],
                           input=b"legacy payload " * 50,
                           capture_output=True, timeout=30)
    except (FileNotFoundError, subprocess.TimeoutExpired):
        pytest.skip("lz4 CLI unavailable")
    if p.returncode != 0:
        pytest.skip("lz4 CLI failed")
    assert decompress_lz4(p.stdout, 100_000) == b"legacy payload " * 50
