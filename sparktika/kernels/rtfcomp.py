"""Compressed-RTF (LZFu) decompression — MS-OXRTFCP, from scratch.

Outlook stores message bodies as PR_RTF_COMPRESSED
(``__substg1.0_10090102``): a 16-byte header (COMPSIZE, RAWSIZE,
COMPTYPE, CRC) followed by either raw RTF (COMPTYPE 'MELA') or an LZ
stream over a 4096-byte circular dictionary preloaded with a canonical
207-byte RTF prefix (COMPTYPE 'LZFu'). Control bytes carry 8 flags, LSB
first: 0 = literal byte, 1 = 16-bit big-endian dictionary reference
(12-bit offset, 4-bit length-2); a reference whose offset equals the
current write position terminates the stream.

Used by kernels/msg.py when a message has no plain-text body. Bomb
posture (invariant 7): output is capped at RAWSIZE and an absolute
ceiling; the CRC (table-based, init 0, no inversion — NOT zlib's crc32)
is verified strictly.
"""

from __future__ import annotations

import struct

from .errors import KernelError

_COMP_LZFU = 0x75465A4C  # 'LZFu' little-endian
_COMP_MELA = 0x414C454D  # 'MELA'

_MAX_RAW = 64_000_000  # absolute output ceiling (bomb guard)

# MS-OXRTFCP §2.1.3.1.2: the dictionary's canonical 207-byte preload.
_DICT_PREFIX = (
    b"{\\rtf1\\ansi\\mac\\deff0\\deftab720{\\fonttbl;}"
    b"{\\f0\\fnil \\froman \\fswiss \\fmodern \\fscript "
    b"\\fdecor MS Sans SerifSymbolArialTimes New RomanCourier"
    b"{\\colortbl\\red0\\green0\\blue0\r\n"
    b"\\par \\pard\\plain\\f0\\fs20\\b\\i\\u\\tab\\tx"
)
assert len(_DICT_PREFIX) == 207

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0xEDB88320 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _crc(data: bytes) -> int:
    """MS-OXRTFCP CRC: standard CRC-32 table, init 0, no final inversion."""
    crc = 0
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc


def decompress_rtf(data: bytes) -> bytes:
    """PR_RTF_COMPRESSED stream -> raw RTF bytes."""
    if len(data) < 16:
        raise KernelError("compressed RTF: truncated header")
    comp_size, raw_size, comp_type, crc = struct.unpack_from("<IIII", data, 0)
    if raw_size > _MAX_RAW:
        raise KernelError(f"compressed RTF: RAWSIZE {raw_size} exceeds cap")
    body = data[16 : 16 + max(0, comp_size - 12)]  # COMPSIZE counts from RAWSIZE on
    if comp_type == _COMP_MELA:
        return body[:raw_size]
    if comp_type != _COMP_LZFU:
        raise KernelError(f"compressed RTF: unknown COMPTYPE 0x{comp_type:08X}")
    if _crc(body) != crc:
        raise KernelError("compressed RTF: CRC mismatch")

    dictionary = bytearray(4096)
    dictionary[: len(_DICT_PREFIX)] = _DICT_PREFIX
    wpos = len(_DICT_PREFIX)
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        control = body[i]
        i += 1
        for bit in range(8):
            if i >= n:
                break
            if control & (1 << bit):
                if i + 2 > n:
                    raise KernelError("compressed RTF: truncated reference")
                token = (body[i] << 8) | body[i + 1]  # big-endian
                i += 2
                offset = token >> 4
                length = (token & 0x0F) + 2
                if offset == wpos % 4096:
                    return bytes(out[:raw_size])  # end marker
                for k in range(length):
                    ch = dictionary[(offset + k) % 4096]
                    out.append(ch)
                    dictionary[wpos % 4096] = ch
                    wpos += 1
                if len(out) > raw_size:
                    raise KernelError("compressed RTF: output exceeds RAWSIZE")
            else:
                ch = body[i]
                i += 1
                out.append(ch)
                dictionary[wpos % 4096] = ch
                wpos += 1
                if len(out) > raw_size:
                    raise KernelError("compressed RTF: output exceeds RAWSIZE")
    return bytes(out[:raw_size])


def compress_rtf_literal(raw: bytes) -> bytes:
    """Minimal LZFu ENCODER (literals only + end marker) — used by the
    synthesizer/tests to build valid PR_RTF_COMPRESSED payloads; real
    Outlook emitters use dictionary references, the decompressor handles
    both."""
    body = bytearray()
    i = 0
    wpos = len(_DICT_PREFIX)

    def end_token() -> bytes:
        token = (wpos % 4096) << 4
        return bytes([(token >> 8) & 0xFF, token & 0xFF])

    while len(raw) - i >= 8:
        body.append(0x00)  # 8 literal flags
        body.extend(raw[i : i + 8])
        wpos += 8
        i += 8
    tail = raw[i:]
    # final control block: len(tail) literals then the end-marker reference
    # (flag bit at position len(tail)); a full 8-literal block above never
    # carries the marker, so the frame is always exact
    body.append(1 << len(tail))
    body.extend(tail)
    wpos += len(tail)
    body.extend(end_token())
    header = struct.pack("<IIII", len(body) + 12, len(raw), _COMP_LZFU,
                         _crc(bytes(body)))
    return header + bytes(body)
