"""Binary plist kernel — CFBinaryPList on-disk grammar."""

from __future__ import annotations

import random
import struct

import pytest

from sparktika.kernels.bplist import (
    build_bplist,
    is_bplist,
    parse_bplist,
)
from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import ExtractConfig, extract_document
from sparktika.synth import build_bplist_doc


def test_string_leaves_in_walk_order():
    r = parse_bplist(build_bplist(
        {"A": "one", "B": ["two", 3, "three"], "C": {"k": "four"}}))
    assert r.strings == ["A", "one", "B", "two", "three", "C", "k", "four"]
    assert r.top_type == "dict"


def test_utf16_string_and_scalars_no_text():
    r = parse_bplist(build_bplist(["héllo", 42, 2.5, True, None, b"xx"]))
    assert r.strings == ["héllo"]
    assert r.top_type == "array"


def test_long_string_15_plus():
    s = "x" * 300
    assert parse_bplist(build_bplist([s])).strings == [s]


def test_cycle_refuses():
    evil = bytearray(b"bplist00")
    evil += bytes([0xA1, 0x00])
    table = len(evil)
    evil += bytes([8])
    evil += struct.pack(">6xBBQQQ", 1, 1, 1, 0, table)
    with pytest.raises(KernelError):
        parse_bplist(bytes(evil))


def test_alias_bomb_visit_cap():
    # 2^k blowup via nested arrays referencing the SAME child twice:
    # [a,a] where a=[b,b] where ... — acyclic, so only the visit cap
    # stops it
    objs = []
    # leaves: one string
    depth = 40
    # build bottom-up: obj i = array of two refs to obj i+1
    blobs = []
    for i in range(depth):
        blobs.append(bytes([0xA2, i + 1, i + 1]))
    blobs.append(b"\x51A")            # ascii "A"
    out = bytearray(b"bplist00")
    offsets = []
    for b in blobs:
        offsets.append(len(out))
        out += b
    table = len(out)
    for o in offsets:
        out += o.to_bytes(2, "big")
    out += struct.pack(">6xBBQQQ", 2, 1, len(blobs), 0, table)
    with pytest.raises(KernelError):
        parse_bplist(bytes(out))


def test_dispatcher_and_mixed_corpus():
    for i in range(4):
        r = extract_document(f"{i}.plist", None, build_bplist_doc(i))
        assert r.status == "ok"
        assert r.content_type_detected == "application/x-bplist"
        assert f"Plist doc {i}" in r.text_extracted
        assert r.metadata["bplist-top-type"] == ["dict"]


def test_not_bplist():
    assert not is_bplist(b"bplist99" + b"\x00" * 40)
    with pytest.raises(KernelError):
        parse_bplist(b"\x00" * 64)


def test_fuzz_never_raises_through_dispatcher():
    rng = random.Random(0xB117)
    seeds = [build_bplist_doc(i) for i in range(4)]
    for _ in range(250):
        base = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        if rng.random() < 0.3:
            base = base[:rng.randrange(len(base))]
        r = extract_document("f.plist", None, bytes(base), ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")
