"""AppleSingle/AppleDouble kernel — RFC 1740 entry-table walk.

Tika 1.20 parity target: AppleSingleFileParser (tika-parsers:1.20).
"""

from __future__ import annotations

import random
import struct

import pytest

from sparktika.kernels.applefile import (
    build_applefile,
    is_applefile,
    parse_applefile,
)
from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import ExtractConfig, extract_document
from sparktika.synth import build_applefile_doc


def test_applesingle_fork_and_name():
    b = build_applefile("applesingle", real_name="a.txt",
                        data_fork=b"hello fork")
    r = parse_applefile(b)
    assert r.kind == "applesingle" and r.real_name == "a.txt"
    assert r.data_fork == b"hello fork"


def test_appledouble_resource_only():
    b = build_applefile("appledouble", real_name="a.txt",
                        resource_fork=b"\x01" * 40)
    r = parse_applefile(b)
    assert r.kind == "appledouble" and r.data_fork is None
    assert r.resource_fork_len == 40


def test_v1_real_name_macroman():
    b = build_applefile("applesingle", data_fork=b"x",
                        version=0x00010000)
    # append a MacRoman name entry by rebuilding manually
    name = "caf\xe9.txt".encode("mac_roman")
    head = struct.pack(">II16xH", 0x00051600, 0x00010000, 2)
    pos = len(head) + 24
    table = struct.pack(">III", 3, pos, len(name))
    table += struct.pack(">III", 1, pos + len(name), 1)
    r = parse_applefile(head + table + name + b"x")
    assert r.real_name == "café.txt"


def test_lying_entry_refuses():
    b = bytearray(build_applefile("applesingle", data_fork=b"abc"))
    # inflate the single entry's declared length past EOF
    struct.pack_into(">I", b, 26 + 8, 10_000)
    with pytest.raises(KernelError):
        parse_applefile(bytes(b))


def test_dispatcher_redispatches_under_real_name():
    r = extract_document("0.as", None, build_applefile_doc(0))
    assert r.status == "ok"
    assert r.content_type_detected == "text/plain"
    assert r.text_extracted == "Apple fork text 0."
    assert r.metadata["apple-real-name"] == ["note0.txt"]
    assert r.metadata["Content-Encoding-Outer"] == ["applesingle"]
    r2 = extract_document("1.as", None, build_applefile_doc(1))
    assert r2.content_type_detected == "application/applefile"
    assert r2.text_extracted == ""


def test_html_fork_routes_to_html_kernel():
    html = (b"<html><head><title>T</title></head><body><div>Body."
            b"</div></body></html>")
    b = build_applefile("applesingle", real_name="p.html",
                        data_fork=html)
    r = extract_document("p.html.as", None, b)
    assert r.content_type_detected == "text/html"
    assert r.text_extracted == "Body.\n"


def test_not_applefile():
    assert not is_applefile(b"\x00\x05\x16\x01" + b"\x00" * 40)
    ico = b"\x00\x00\x01\x00" + b"\x00" * 40
    assert not is_applefile(ico)


def test_fuzz_never_raises_through_dispatcher():
    rng = random.Random(0xA991E)
    seeds = [build_applefile_doc(i) for i in range(4)]
    for _ in range(250):
        base = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        if rng.random() < 0.3:
            base = base[:rng.randrange(len(base))]
        r = extract_document("f.as", None, bytes(base), ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")


def test_nested_applesingle_refuses_structurally():
    # r7 ADVICE: an AppleSingle whose data fork is itself AppleSingle
    # must refuse with a structured status row (wrapper-chain bomb),
    # not recurse at the same embed depth until RecursionError.
    inner = build_applefile("applesingle", real_name="x.txt",
                            data_fork=b"hello")
    chain = inner
    for _ in range(40):
        chain = build_applefile("applesingle", real_name="x.as",
                                data_fork=chain)
    r = extract_document("bomb.as", None, chain)
    assert r.status == "failed"
    assert "nested applesingle" in (r.error or "")
    assert r.metadata["apple-format"] == ["applesingle"]
