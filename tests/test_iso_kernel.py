"""ISO 9660 kernel tests: PVD parse, recursive directory walk, member
routing, loop/bomb guards, invariant-7 fuzz."""

import random
import struct

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.iso9660 import extract_iso, is_iso9660
from sparktika.kernels.mime import detect_mime
from sparktika.synth import build_iso

S = 2048


def test_volume_and_members():
    r = extract_iso(build_iso(5))
    assert r.metadata["iso-volume-id"] == "SYNTHVOL5"
    assert r.entries == ["DOCS/", "NOTE.TXT", "PAGE.HTM", "README.TXT"]
    assert r.text == "note 5\niso page 5\niso text 5 line.\n"
    assert not r.truncated


def test_mime_routing():
    assert detect_mime(build_iso(0)) == "application/x-iso9660-image"
    assert not is_iso9660(b"\x00" * (16 * S))  # too short / no magic


def test_missing_pvd_refuses():
    d = bytearray(build_iso(1))
    d[16 * S] = 2  # supplementary descriptor only, then junk type
    d[17 * S] = 255
    with pytest.raises(KernelError, match="primary volume"):
        extract_iso(bytes(d))


def test_directory_loop_contained():
    # point the DOCS subdirectory back at the root: the seen-set must
    # stop the walk instead of recursing forever
    d = bytearray(build_iso(2))
    root = 18 * S
    # third record in the root dir (after \x00 and \x01) is DOCS
    off = root + d[root] + d[root + d[root]]
    assert d[off + 33:off + 37] == b"DOCS"
    struct.pack_into("<I", d, off + 2, 18)   # extent -> root (LE)
    struct.pack_into(">I", d, off + 6, 18)   # extent -> root (BE)
    r = extract_iso(bytes(d))
    assert r.metadata["iso-volume-id"] == "SYNTHVOL2"  # finished cleanly


def test_extent_beyond_image_is_honest_truncation():
    d = build_iso(3)[: 21 * S]  # cut PAGE.HTM / NOTE.TXT data away
    r = extract_iso(d)
    assert r.truncated


def test_fuzz_never_raises():
    rng = random.Random(8329)
    base = build_iso(4)
    for i in range(60):
        mut = bytearray(base[:rng.randrange(16 * S + 8, len(base))])
        for _ in range(rng.randrange(0, 6)):
            mut[rng.randrange(16 * S, len(mut))] = rng.randrange(256)
        r = extract_document("u", None, bytes(mut))
        assert r.status in ("ok", "failed", "unsupported", "truncated")


# ------------------------------------------------------------- lha/lzh

def test_lha_stored_extracts_compressed_refused():
    from sparktika.kernels.lha import extract_lha
    from sparktika.synth import build_lha

    r = extract_lha(build_lha(4))
    assert r.text == "lha text 4.\n"
    assert r.entries == ["DOCS/", "A.TXT", "B.BIN"]
    assert r.n_stored == 1 and r.n_compressed == 1
    assert r.methods == ["-lh0-", "-lh5-"]


def test_lha_checksum_and_level2():
    from sparktika.kernels.lha import extract_lha, is_lha
    from sparktika.synth import build_lha

    bad = bytearray(build_lha(0))
    bad[10] ^= 0xFF  # corrupt inside the first header
    with pytest.raises(KernelError, match="checksum"):
        extract_lha(bytes(bad))
    lvl2 = bytearray(build_lha(0))
    lvl2[2 + 18] = 2  # level byte of the first member
    assert is_lha(bytes(lvl2))
    with pytest.raises(KernelError, match="level-2"):
        extract_lha(bytes(lvl2))


def test_lha_gate_rejects_prose():
    from sparktika.kernels.lha import is_lha

    assert not is_lha(b"x -lha archives are neat- and this is prose " * 2)


def test_lha_fuzz_never_raises():
    from sparktika.synth import build_lha

    rng = random.Random(8330)
    for i in range(150):
        base = build_lha(i % 6)
        mut = bytearray(base[:rng.randrange(1, len(base))])
        for _ in range(rng.randrange(0, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        r = extract_document("u", None, bytes(mut))
        assert r.status in ("ok", "failed", "unsupported", "truncated")
