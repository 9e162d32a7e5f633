"""PE / ELF / Mach-O executable metadata kernel tests."""

import random
import struct

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.executable import parse_executable
from sparktika.kernels.extract import extract_document
from sparktika.synth import build_executable


def test_elf64_little():
    md = parse_executable(build_executable(0))
    assert md["exe-format"] == ["elf"]
    assert md["exe-bits"] == ["64"]
    assert md["exe-endian"] == ["little"]
    assert md["exe-machine"] == ["x86_64"]
    assert md["exe-platform"] == ["linux"]
    assert md["exe-type"] == ["executable"]


def test_elf32_big_endian():
    # 32-bit big-endian ppc shared object, sysv ABI
    ident = b"\x7fELF" + bytes([1, 2, 1, 0]) + b"\x00" * 8
    hdr = ident + struct.pack(">HH", 3, 20) + b"\x00" * 8
    md = parse_executable(hdr)
    assert md["exe-bits"] == ["32"]
    assert md["exe-endian"] == ["big"]
    assert md["exe-machine"] == ["ppc"]
    assert md["exe-type"] == ["shared"]
    assert md["exe-platform"] == ["sysv"]


def test_pe64():
    md = parse_executable(build_executable(7))  # 7 % 3 == 1 -> PE
    assert md["exe-format"] == ["pe"]
    assert md["exe-bits"] == ["64"]
    assert md["exe-machine"] == ["x86_64"]
    assert md["exe-subsystem"] == ["windows-console"]
    assert md["exe-timestamp"] == ["7"]
    assert md["exe-sections"] == ["3"]
    assert md["exe-dll"] == ["false"]


def test_pe32_dll_flag():
    e_lfanew = 0x40
    dos = b"MZ" + b"\x00" * 0x3A + struct.pack("<I", e_lfanew)
    coff = b"PE\x00\x00" + struct.pack("<HHIIIHH", 0x014C, 5, 99, 0, 0,
                                       96, 0x2002)
    opt = struct.pack("<H", 0x10B) + b"\x00" * 66 + struct.pack("<H", 2)
    opt += b"\x00" * (96 - len(opt))
    md = parse_executable(dos + coff + opt)
    assert md["exe-bits"] == ["32"]
    assert md["exe-machine"] == ["i386"]
    assert md["exe-dll"] == ["true"]
    assert md["exe-subsystem"] == ["windows-gui"]


def test_plain_dos_mz_without_pe_header():
    data = b"MZ" + b"\x90" * 0x3A + struct.pack("<I", 0)  # e_lfanew = 0
    md = parse_executable(data + b"\x00" * 64)
    assert md["exe-format"] == ["mz-dos"]
    assert md["exe-bits"] == ["16"]


def test_macho_variants():
    md = parse_executable(build_executable(2))
    assert md["exe-format"] == ["mach-o"]
    assert md["exe-machine"] == ["aarch64"]
    assert md["exe-bits"] == ["64"]
    # big-endian 32-bit ppc object
    hdr = b"\xfe\xed\xfa\xce" + struct.pack(">iII", 18, 0, 1) + b"\x00" * 8
    md2 = parse_executable(hdr)
    assert md2["exe-machine"] == ["ppc"]
    assert md2["exe-bits"] == ["32"]
    assert md2["exe-endian"] == ["big"]
    assert md2["exe-type"] == ["object"]


def test_truncation_refuses():
    for n in (4, 8, 15):
        with pytest.raises(KernelError):
            parse_executable(b"\x7fELF"[:4] + b"\x02\x01\x01" + b"\x00" * max(0, n - 7))
    with pytest.raises(KernelError):
        parse_executable(b"MZ\x00")


def test_dispatcher_route_and_fuzz():
    r = extract_document("https://x/a.out", None, build_executable(0))
    assert r.status == "ok"
    assert r.content_type_detected == "application/x-executable"
    assert r.text_extracted in (None, "")
    # corrupted executables always become status rows, never exceptions
    rnd = random.Random(3)
    for base in range(3):
        data = bytearray(build_executable(base))
        for _ in range(40):
            i = rnd.randrange(len(data))
            orig = data[i]
            data[i] = rnd.randrange(256)
            rr = extract_document("https://x/a.bin", None, bytes(data))
            assert rr.status in ("ok", "failed", "unsupported")
            data[i] = orig
