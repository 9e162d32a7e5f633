"""AutoCAD DWG (detection-first) kernel tests: closed-set version
signature routing, release labeling, body refusal, invariant-7 fuzz."""

import random

import pytest

from sparktika.kernels.dwg import (BODY_REFUSAL, VERSION_RELEASES,
                                   parse_dwg_version)
from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.mime import detect_mime
from sparktika.synth import build_dwg


def _md1(r, key):
    v = r.metadata.get(key)
    return v[0] if v else None


def test_every_signature_routes_and_labels():
    for i in range(10):
        data = build_dwg(i)
        assert detect_mime(data) == "image/vnd.dwg"
        ver, release = parse_dwg_version(data)
        assert ver.encode() in VERSION_RELEASES
        assert VERSION_RELEASES[ver.encode()] == release
        r = extract_document(f"https://x/{i}.dwg", None, data)
        assert r.status == "ok"
        assert r.content_type_detected == "image/vnd.dwg"
        assert _md1(r, "dwg-version") == ver
        assert _md1(r, "dwg-release") == release
        assert _md1(r, "body-refusal") == BODY_REFUSAL
        assert r.text_extracted == ""  # detection-first: no guessed text


def test_release_labels_exact():
    assert parse_dwg_version(build_dwg(4)) == ("AC1015", "AutoCAD 2000")
    assert parse_dwg_version(build_dwg(9)) == ("AC1032", "AutoCAD 2018")


def test_unknown_signature_refuses():
    with pytest.raises(KernelError, match="closed-set"):
        parse_dwg_version(b"AC9999" + b"\x00" * 32)
    with pytest.raises(KernelError, match="truncated"):
        parse_dwg_version(b"AC10")
    # an unknown future version never routes to the kernel at all
    assert detect_mime(b"AC1099" + b"\x00" * 32) != "image/vnd.dwg"


def test_fuzz_never_raises():
    rng = random.Random(8321)
    for i in range(200):
        base = build_dwg(i % 10)
        mut = bytearray(base[:rng.randrange(1, len(base))])
        for _ in range(rng.randrange(0, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        r = extract_document("u", "image/vnd.dwg", bytes(mut))
        assert r.status in ("ok", "failed", "unsupported")
