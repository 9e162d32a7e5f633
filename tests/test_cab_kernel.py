"""Microsoft Cabinet (.cab) kernel — [MS-CAB] from scratch.

Beyond-reference coverage: Tika 1.20 detects
application/vnd.ms-cab-compressed but ships no CAB parser, so there is
no reference fixture to pin against; the builder/decoder pair (one
source of on-disk-layout truth, the NetCDF/PST posture) plus crafted
corruption vectors stand in. Members route through the SAME shared
router / budget semantics as zip/tar/7z (container.route_member_text).
"""

from __future__ import annotations

import io
import random
import struct
import zipfile

import pytest

from sparktika.kernels.cab import (
    _checksum,
    build_cab,
    extract_cab,
    is_cab,
)
from sparktika.kernels.errors import DeadlineError, KernelError
from sparktika.kernels.extract import ExtractConfig, extract_document
from sparktika.kernels.mime import detect_mime

MEMBERS = [
    ("readme.txt", b"Hello from the cab.\n"),
    ("docs/info.txt", b"Second member, some more text.\n"),
    ("page.html",
     b"<html><head><title>T</title></head>"
     b"<body><p>Inner html body</p></body></html>"),
]


def _varied(n: int, seed: int = 7) -> bytes:
    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "lorem", "ipsum",
             "dolor", "web", "crawl", "data", "corpus", "token"]
    out = []
    size = 0
    while size < n:
        w = rng.choice(words)
        out.append(w)
        size += len(w) + 1
    return (" ".join(out))[:n].encode()


# ------------------------------------------------------------- codecs --

@pytest.mark.parametrize("comp", ["none", "mszip", "lzx"])
def test_round_trip_all_codecs(comp):
    blob = build_cab(MEMBERS, compression=comp)
    assert is_cab(blob)
    assert detect_mime(blob, None, "a.cab") == \
        "application/vnd.ms-cab-compressed"
    r = extract_cab(blob)
    assert r.entries == [n for n, _ in MEMBERS]
    assert "Hello from the cab.\n" in r.text
    assert "Second member" in r.text
    assert "Inner html body" in r.text          # html member parsed
    assert "<p>" not in r.text
    assert not r.truncated


@pytest.mark.parametrize("comp", ["mszip", "lzx"])
def test_multi_block_history_carry(comp):
    # >32 KiB forces multiple CFDATA blocks; MSZIP must preset each
    # block's dictionary with the prior output tail, LZX must realign
    # at the 32 KiB frame boundaries
    big = _varied(150_000)
    blob = build_cab([("big.txt", big)], compression=comp)
    r = extract_cab(blob)
    assert r.text == big.decode()


def test_mszip_match_across_block_boundary():
    # a repeat whose back-reference window straddles the 32 KiB block
    # boundary only decodes right when the zdict carry is correct
    head = _varied(32_000, seed=1)
    body = head[-5_000:] + _varied(40_000, seed=2)
    raw = head + body
    blob = build_cab([("x.txt", raw)], compression="mszip")
    assert extract_cab(blob).text == raw.decode()


# ----------------------------------------------------- checksum / fuzz --

def test_checksum_known_vectors():
    # [MS-CAB] Appendix C: u32 LE words XOR; 1-3 byte tail packs
    # big-end-first
    assert _checksum(b"") == 0
    assert _checksum(b"\x01\x02\x03\x04") == 0x04030201
    assert _checksum(b"\x01\x02\x03\x04\x05") == 0x04030201 ^ 0x05
    assert _checksum(b"\x01\x02\x03\x04\x05\x06") == \
        0x04030201 ^ ((0x05 << 8) | 0x06)
    assert _checksum(b"\x01\x02\x03\x04\x05\x06\x07") == \
        0x04030201 ^ ((0x05 << 16) | (0x06 << 8) | 0x07)
    assert _checksum(b"\xff" * 4, seed=0x12345678) == 0x12345678 ^ 0xFFFFFFFF


def test_corrupt_payload_refuses_folder_not_file_table():
    blob = bytearray(build_cab(MEMBERS, compression="mszip"))
    blob[-3] ^= 0xFF
    r = extract_cab(bytes(blob))
    assert r.text == ""                      # single folder refused
    assert r.entries == [n for n, _ in MEMBERS]   # names survive
    assert r.metadata.get("cab-folders-refused") == "1"


def test_folder_isolation_one_bad_folder_keeps_others():
    blob = bytearray(build_cab(MEMBERS, compression="mszip",
                               one_folder_per_member=True))
    blob[-3] ^= 0xFF                         # corrupts the LAST folder
    r = extract_cab(bytes(blob))
    assert "Hello from the cab.\n" in r.text
    assert "Second member" in r.text
    assert "Inner html body" not in r.text
    assert r.metadata.get("cab-folders-refused") == "1"


def test_quantum_folder_refused_names_kept():
    blob = bytearray(build_cab(MEMBERS, compression="mszip"))
    # CFFOLDER.typeCompress lives at header(36) + 4 + 2
    struct.pack_into("<H", blob, 36 + 6, 2)  # QUANTUM
    r = extract_cab(bytes(blob))
    assert r.text == ""
    assert r.entries == [n for n, _ in MEMBERS]
    assert r.metadata.get("cab-folders-refused") == "1"


def test_bad_version_refuses():
    blob = bytearray(build_cab(MEMBERS))
    blob[25] = 2                              # versionMajor
    assert not is_cab(bytes(blob))
    with pytest.raises(KernelError):
        extract_cab(bytes(blob))


def test_fuzz_never_raises_through_dispatcher():
    rng = random.Random(0xCAB)
    seeds = [build_cab(MEMBERS, compression=c)
             for c in ("none", "mszip", "lzx")]
    seeds.append(build_cab([("big.txt", _varied(80_000))],
                           compression="mszip"))
    for _ in range(300):
        base = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        if rng.random() < 0.3:
            base = base[:rng.randrange(len(base))]
        r = extract_document("f.cab", None, bytes(base), ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")


# ------------------------------------------------- budget / structure --

def test_budget_cap_and_truncated_flag():
    big = _varied(120_000)
    blob = build_cab([("big.txt", big)], compression="mszip")
    r = extract_cab(blob, max_chars=100)
    assert len(r.text) == 100 and r.truncated


def test_budget_stops_later_folder_decode():
    # with per-member folders and a tiny budget, the second folder
    # never decodes (names still recorded)
    blob = build_cab([("a.txt", _varied(40_000, 1)),
                      ("b.txt", _varied(40_000, 2))],
                     compression="mszip", one_folder_per_member=True)
    r = extract_cab(blob, max_chars=50)
    assert len(r.text) == 50 and r.truncated
    assert r.entries == ["a.txt", "b.txt"]


def test_spanning_members_skipped_with_note():
    blob = bytearray(build_cab(MEMBERS, compression="none"))
    # patch first CFFILE's iFolder to 0xFFFD (continued from prev cab);
    # CFFILE area starts at coffFiles
    coff_files, = struct.unpack_from("<I", blob, 16)
    struct.pack_into("<H", blob, coff_files + 8, 0xFFFD)
    r = extract_cab(bytes(blob))
    assert r.metadata.get("cab-spanning-members-skipped") == "1"
    assert "Hello from the cab.\n" not in r.text
    assert "Second member" in r.text           # later members intact


def test_zero_checksum_blocks_accepted():
    blob = build_cab(MEMBERS, compression="mszip", with_checksums=False)
    r = extract_cab(blob)
    assert "Hello from the cab.\n" in r.text


# ----------------------------------------------------------- nesting --

def test_cab_inside_zip_routes():
    inner = build_cab(MEMBERS, compression="mszip")
    zb = io.BytesIO()
    with zipfile.ZipFile(zb, "w") as z:
        z.writestr("inner.cab", inner)
        z.writestr("note.txt", "outer note\n")
    r = extract_document("a.zip", None, zb.getvalue())
    assert r.status == "ok"
    assert "Hello from the cab.\n" in r.text_extracted
    assert "outer note\n" in r.text_extracted


def test_zip_inside_cab_routes():
    zb = io.BytesIO()
    with zipfile.ZipFile(zb, "w") as z:
        z.writestr("deep.txt", "nested zip text\n")
    blob = build_cab([("inner.zip", zb.getvalue()),
                      ("top.txt", b"top text\n")], compression="mszip")
    r = extract_cab(blob)
    assert "nested zip text\n" in r.text
    assert "top text\n" in r.text


def test_corrupt_nested_cab_keeps_siblings():
    bad = bytearray(build_cab(MEMBERS, compression="mszip"))
    bad[25] = 9  # bad version: nested extract refuses
    zb = io.BytesIO()
    with zipfile.ZipFile(zb, "w") as z:
        z.writestr("bad.cab", bytes(bad))
        z.writestr("note.txt", "sibling survives\n")
    r = extract_document("a.zip", None, zb.getvalue())
    assert r.status == "ok"
    assert "sibling survives\n" in r.text_extracted


def test_deadline_propagates():
    big = _varied(200_000)
    blob = build_cab([("big.txt", big)], compression="mszip")
    with pytest.raises(DeadlineError):
        extract_cab(blob, deadline=-1.0)


def test_is_cab_negatives():
    assert not is_cab(b"")
    assert not is_cab(b"MSCF")
    assert not is_cab(b"MSCFile: a plain text file that starts oddly\n"
                      + b"x" * 64)
