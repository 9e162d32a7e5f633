"""PE / ELF / Mach-O executable header metadata — from scratch.

Tika 1.20 parity: org.apache.tika.parser.executable.ExecutableParser
(reached by the reference via the tika-parsers:1.20 jar, build.gradle —
no parsing logic in its own tree) reports machine type, word size,
endianness and platform for executables; it never extracts text.
Sources are the public ABI documents only: the System V gABI ELF
header (e_ident/e_type/e_machine), the Microsoft PE/COFF spec
(IMAGE_FILE_HEADER + optional-header magic/subsystem), and Apple's
mach-o/loader.h layout.

Metadata-only by design (same posture as Tika): a crawl cares that a
payload IS an executable and for what platform, not about its bytes.
"""

from __future__ import annotations

import struct

from .errors import KernelError

# System V gABI e_machine values (the subset Tika's ExecutableParser
# names, plus the modern ones a crawl actually sees)
_ELF_MACHINES = {
    0: "none", 2: "sparc", 3: "i386", 8: "mips", 20: "ppc", 21: "ppc64",
    22: "s390", 40: "arm", 42: "sh", 50: "ia64", 62: "x86_64",
    183: "aarch64", 243: "riscv",
}
_ELF_TYPES = {0: "none", 1: "relocatable", 2: "executable", 3: "shared",
              4: "core"}
_ELF_OSABI = {0: "sysv", 3: "linux", 6: "solaris", 9: "freebsd",
              12: "openbsd"}

# PE/COFF IMAGE_FILE_MACHINE_* (Microsoft PE format spec)
_PE_MACHINES = {
    0x014C: "i386", 0x0200: "ia64", 0x8664: "x86_64", 0x01C0: "arm",
    0x01C4: "armnt", 0xAA64: "aarch64", 0x0EBC: "efi-bytecode",
    0x5032: "riscv32", 0x5064: "riscv64",
}
_PE_SUBSYSTEMS = {
    1: "native", 2: "windows-gui", 3: "windows-console", 5: "os2",
    7: "posix", 9: "windows-ce", 10: "efi-application",
}

# mach-o/loader.h cputype (CPU_ARCH_ABI64 = 0x01000000)
_MACHO_CPUS = {7: "i386", 7 | 0x01000000: "x86_64",
               12: "arm", 12 | 0x01000000: "aarch64",
               18: "ppc", 18 | 0x01000000: "ppc64"}
_MACHO_TYPES = {1: "object", 2: "executable", 6: "shared", 8: "bundle"}


def parse_executable(data: bytes) -> dict[str, list[str]]:
    """Dispatch on the executable family magic; returns a metadata
    dict (str -> [str]) or raises KernelError for non-executables."""
    if data[:4] == b"\x7fELF":
        return _parse_elf(data)
    if data[:2] == b"MZ":
        return _parse_pe(data)
    if data[:4] in (b"\xfe\xed\xfa\xce", b"\xce\xfa\xed\xfe",
                    b"\xfe\xed\xfa\xcf", b"\xcf\xfa\xed\xfe"):
        return _parse_macho(data)
    raise KernelError("executable: unrecognized magic")


def _parse_elf(data: bytes) -> dict[str, list[str]]:
    if len(data) < 20:
        raise KernelError("elf: truncated ident/header")
    ei_class, ei_data, ei_version, ei_osabi = data[4], data[5], data[6], data[7]
    if ei_class not in (1, 2):
        raise KernelError(f"elf: bad EI_CLASS {ei_class}")
    if ei_data not in (1, 2):
        raise KernelError(f"elf: bad EI_DATA {ei_data}")
    if ei_version != 1:
        raise KernelError(f"elf: bad EI_VERSION {ei_version}")
    endian = "<" if ei_data == 1 else ">"
    e_type, e_machine = struct.unpack_from(endian + "HH", data, 16)
    md = {
        "Content-Type": ["application/x-executable"],
        "exe-format": ["elf"],
        "exe-bits": ["32" if ei_class == 1 else "64"],
        "exe-endian": ["little" if ei_data == 1 else "big"],
        "exe-machine": [_ELF_MACHINES.get(e_machine, str(e_machine))],
        "exe-type": [_ELF_TYPES.get(e_type, str(e_type))],
        "exe-platform": [_ELF_OSABI.get(ei_osabi, str(ei_osabi))],
    }
    return md


def _parse_pe(data: bytes) -> dict[str, list[str]]:
    if len(data) < 0x40:
        raise KernelError("pe: truncated DOS header")
    e_lfanew = struct.unpack_from("<I", data, 0x3C)[0]
    if e_lfanew + 24 > len(data) or e_lfanew > 0x10000:
        # plain DOS MZ executable (no PE header) — still an executable
        return {
            "Content-Type": ["application/x-msdownload"],
            "exe-format": ["mz-dos"],
            "exe-bits": ["16"],
            "exe-endian": ["little"],
            "exe-machine": ["x86-real-mode"],
        }
    if data[e_lfanew: e_lfanew + 4] != b"PE\x00\x00":
        return {
            "Content-Type": ["application/x-msdownload"],
            "exe-format": ["mz-dos"],
            "exe-bits": ["16"],
            "exe-endian": ["little"],
            "exe-machine": ["x86-real-mode"],
        }
    machine, n_sections, timestamp = struct.unpack_from(
        "<HHI", data, e_lfanew + 4)
    opt_size, characteristics = struct.unpack_from(
        "<HH", data, e_lfanew + 20)
    md = {
        "Content-Type": ["application/x-msdownload"],
        "exe-format": ["pe"],
        "exe-endian": ["little"],
        "exe-machine": [_PE_MACHINES.get(machine, hex(machine))],
        "exe-sections": [str(n_sections)],
        "exe-timestamp": [str(timestamp)],
        "exe-dll": [str(bool(characteristics & 0x2000)).lower()],
    }
    opt_off = e_lfanew + 24
    if opt_size >= 2 and opt_off + 2 <= len(data):
        magic = struct.unpack_from("<H", data, opt_off)[0]
        if magic == 0x10B:
            md["exe-bits"] = ["32"]
        elif magic == 0x20B:
            md["exe-bits"] = ["64"]
        elif magic == 0x107:
            md["exe-bits"] = ["rom"]
        if opt_size >= 70 and opt_off + 70 <= len(data):
            subsystem = struct.unpack_from("<H", data, opt_off + 68)[0]
            md["exe-subsystem"] = [
                _PE_SUBSYSTEMS.get(subsystem, str(subsystem))]
    return md


def _parse_macho(data: bytes) -> dict[str, list[str]]:
    if len(data) < 16:
        raise KernelError("macho: truncated header")
    magic = data[:4]
    # FEEDFACE read big-endian == file written by a big-endian host;
    # CEFAED FE leading means the MAGIC is byte-swapped -> little host
    if magic in (b"\xce\xfa\xed\xfe", b"\xcf\xfa\xed\xfe"):
        endian, bits = "<", ("64" if magic[0] == 0xCF else "32")
        host_endian = "little"
    else:
        endian, bits = ">", ("64" if magic[3] == 0xCF else "32")
        host_endian = "big"
    cputype, _cpusub, filetype = struct.unpack_from(endian + "iII", data, 4)
    return {
        "Content-Type": ["application/x-mach-binary"],
        "exe-format": ["mach-o"],
        "exe-bits": [bits],
        "exe-endian": [host_endian],
        "exe-machine": [_MACHO_CPUS.get(cputype, str(cputype))],
        "exe-type": [_MACHO_TYPES.get(filetype, str(filetype))],
    }
