"""WordPerfect WPD (metadata-first) kernel tests: WPFF prefix parsing,
version labeling, encrypted refusal, MIME routing, invariant-7 fuzz."""

import random
import struct

import pytest

from sparktika.kernels.errors import EncryptedError, KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.mime import detect_mime
from sparktika.kernels.wpd import BODY_REFUSAL, parse_wpd_header
from sparktika.synth import build_wpd


def _md1(r, key):
    v = r.metadata.get(key)
    return v[0] if v else None


def test_header_parse_wp6():
    h = parse_wpd_header(build_wpd(2))     # major 2, minor 2, ptr 24
    assert h.version_label == "WP6/7/8"
    assert h.major_version == 2 and h.minor_version == 2
    assert h.doc_area_pointer == 24 and h.file_type == 0x0A
    assert not h.encrypted


def test_header_parse_wp5():
    h = parse_wpd_header(build_wpd(3))     # doc_id % 3 == 0 -> major 0
    assert h.version_label == "WP5.x"


def test_encrypted_refusal():
    with pytest.raises(EncryptedError):
        parse_wpd_header(build_wpd(10))    # doc_id % 10 == 0
    r = extract_document("u", None, build_wpd(20))
    assert r.status == "unsupported"
    assert _md1(r, "encryption") == "encrypted_wpd"
    assert r.content_type_detected == "application/vnd.wordperfect"


def test_dispatch_routes_wpd_metadata_first():
    r = extract_document("u", None, build_wpd(7))
    assert r.status == "ok"
    assert r.content_type_detected == "application/vnd.wordperfect"
    assert _md1(r, "wpd-version") == "WP6/7/8"
    assert _md1(r, "wpd-minor-version") == "3"
    assert _md1(r, "wpd-doc-area-pointer") == str(16 + (7 % 5) * 4)
    assert r.text_extracted == ""
    assert _md1(r, "body-refusal") == BODY_REFUSAL


def test_magic_detection():
    assert detect_mime(build_wpd(1)) == "application/vnd.wordperfect"


def test_structural_refusals():
    with pytest.raises(KernelError):
        parse_wpd_header(b"\xffWPC\x00")                 # short
    with pytest.raises(KernelError):
        parse_wpd_header(b"\xffWPX" + b"\x00" * 20)      # bad magic
    # non-WordPerfect WPC product
    bad = bytearray(build_wpd(1))
    bad[8] = 9
    with pytest.raises(KernelError):
        parse_wpd_header(bytes(bad))
    # doc-area pointer past EOF
    bad = bytearray(build_wpd(1))
    struct.pack_into("<I", bad, 4, 10_000)
    with pytest.raises(KernelError):
        parse_wpd_header(bytes(bad))


def test_wpd_fuzz_never_raises():
    rng = random.Random(42)
    base = bytearray(build_wpd(6))
    for _ in range(80):
        mut = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        r = extract_document("u", None, bytes(mut))
        assert r.status in ("ok", "failed", "unsupported")
    for n in (0, 3, 8, 15):
        r = extract_document("u", None, bytes(base[:n]))
        assert r.status in ("ok", "failed", "unsupported", "empty")
