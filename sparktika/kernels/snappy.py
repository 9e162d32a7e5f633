"""Snappy (raw block + framing format) decoder — from scratch.

Tika 1.20 routes .sz files through CompressorParser (commons-compress
FramedSnappyCompressorInputStream); the reference reaches it via the
tika-parsers:1.20 jar (build.gradle). No snappy codec exists in the
stdlib or this container, so both the raw block format and the framing
format are implemented here from the public format descriptions
(google/snappy format_description.txt and framing_format.txt):

- raw block: varint uncompressed length, then tagged elements — 2-bit
  type: 00 literal (6-bit length, 60-63 select 1-4 extra length
  bytes), 01 copy (3-bit len-4, 11-bit offset), 10 copy (6-bit len-1,
  16-bit offset), 11 copy (6-bit len-1, 32-bit offset);
- framing: 4-byte chunk headers (type + u24 LE length). Type 0xFF
  stream identifier ("sNaPpY"), 0x00 compressed chunk (masked CRC-32C
  of the UNCOMPRESSED data + raw-snappy payload), 0x01 uncompressed
  chunk (masked CRC-32C + data), 0xFE padding, 0x80-0xFD skippable,
  0x02-0x7F reserved unskippable -> refuse;
- CRC mask: ((crc >> 15) | (crc << 17)) + 0xA282EAD8 (mod 2^32).

The encoder half (literal elements + a greedy 16-bit-offset matcher)
exists for synth corpora and round-trip tests; checksums are verified
on decode, so corruption refuses rather than passing garbage.
"""

from __future__ import annotations

import struct

from .errors import InflateRatioError, KernelError

FRAME_MAGIC = b"\xff\x06\x00\x00sNaPpY"

# CRC-32C (Castagnoli), table-driven, reflected polynomial 0x82F63B78
_CRC_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _mask(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def decompress_raw(data: bytes, max_out: int) -> bytes:
    """Decode one raw snappy block."""
    pos = 0
    length = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise KernelError("snappy: truncated length varint")
        b = data[pos]
        pos += 1
        length |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
        if shift > 35:
            raise KernelError("snappy: length varint too long")
    if length > max_out:
        raise InflateRatioError(
            f"snappy: declared size {length} exceeds cap {max_out}")
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        ttype = tag & 3
        if ttype == 0:                      # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > n:
                    raise KernelError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos: pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > n:
                raise KernelError("snappy: truncated literal body")
            out += data[pos: pos + ln]
            pos += ln
        else:
            if ttype == 1:                  # copy, 11-bit offset
                ln = ((tag >> 2) & 0x7) + 4
                if pos >= n:
                    raise KernelError("snappy: truncated copy-1")
                off = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif ttype == 2:                # copy, 16-bit offset
                ln = (tag >> 2) + 1
                if pos + 2 > n:
                    raise KernelError("snappy: truncated copy-2")
                off = int.from_bytes(data[pos: pos + 2], "little")
                pos += 2
            else:                           # copy, 32-bit offset
                ln = (tag >> 2) + 1
                if pos + 4 > n:
                    raise KernelError("snappy: truncated copy-4")
                off = int.from_bytes(data[pos: pos + 4], "little")
                pos += 4
            if off == 0 or off > len(out):
                raise KernelError("snappy: copy offset outside output")
            if len(out) + ln > length:
                raise KernelError("snappy: output overruns declared size")
            src = len(out) - off
            for i in range(ln):             # overlapping copies are legal
                out.append(out[src + i])
            continue
        if len(out) > length:
            raise KernelError("snappy: output overruns declared size")
    if len(out) != length:
        raise KernelError("snappy: output shorter than declared size")
    return bytes(out)


def decompress_framed(data: bytes, max_out: int) -> bytes:
    """Decode a snappy framing-format stream (CRCs verified)."""
    if not data.startswith(FRAME_MAGIC):
        raise KernelError("snappy: missing stream identifier")
    pos = 0
    out = bytearray()
    first = True
    while pos < len(data):
        if pos + 4 > len(data):
            raise KernelError("snappy: truncated chunk header")
        ctype = data[pos]
        clen = int.from_bytes(data[pos + 1: pos + 4], "little")
        body = data[pos + 4: pos + 4 + clen]
        if len(body) != clen:
            raise KernelError("snappy: truncated chunk body")
        pos += 4 + clen
        if first:
            if ctype != 0xFF or body != b"sNaPpY":
                raise KernelError("snappy: first chunk not the identifier")
            first = False
            continue
        if ctype == 0xFF:
            if body != b"sNaPpY":
                raise KernelError("snappy: bad repeated identifier")
        elif ctype == 0x00:
            if clen < 4:
                raise KernelError("snappy: compressed chunk too short")
            want = int.from_bytes(body[:4], "little")
            piece = decompress_raw(body[4:], max_out - len(out))
            if _mask(crc32c(piece)) != want:
                raise KernelError("snappy: chunk checksum mismatch")
            out += piece
        elif ctype == 0x01:
            if clen < 4:
                raise KernelError("snappy: uncompressed chunk too short")
            want = int.from_bytes(body[:4], "little")
            piece = body[4:]
            if len(out) + len(piece) > max_out:
                raise InflateRatioError(
                    f"snappy: output exceeds cap {max_out}")
            if _mask(crc32c(piece)) != want:
                raise KernelError("snappy: chunk checksum mismatch")
            out += piece
        elif ctype == 0xFE or 0x80 <= ctype <= 0xFD:
            continue                        # padding / skippable
        else:
            raise KernelError(
                f"snappy: reserved unskippable chunk {ctype:#x}")
    return bytes(out)


# -- encoder (synth/tests) ---------------------------------------------------

def _compress_raw(data: bytes) -> bytes:
    """Greedy raw-snappy encoder: 4-byte-anchor matcher emitting copy-2
    elements, literals elsewhere. Valid, not maximal."""
    def varint(v: int) -> bytes:
        outb = bytearray()
        while v >= 0x80:
            outb.append((v & 0x7F) | 0x80)
            v >>= 7
        outb.append(v)
        return bytes(outb)

    def emit_literal(chunk: bytes, acc: bytearray) -> None:
        i = 0
        while i < len(chunk):
            part = chunk[i: i + 60]
            acc.append(((len(part) - 1) << 2))
            acc += part
            i += len(part)

    out = bytearray(varint(len(data)))
    anchors: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    n = len(data)
    while i + 4 <= n:
        key = data[i: i + 4]
        j = anchors.get(key)
        anchors[key] = i
        if j is not None and i - j <= 0xFFFF:
            ln = 0
            while (ln < 64 and i + ln < n
                   and data[j + ln] == data[i + ln]):
                ln += 1
            if ln >= 4:
                emit_literal(data[lit_start:i], out)
                out.append(((ln - 1) << 2) | 2)
                out += (i - j).to_bytes(2, "little")
                i += ln
                lit_start = i
                continue
        i += 1
    emit_literal(data[lit_start:], out)
    return bytes(out)


def compress_framed(data: bytes, chunk_size: int = 65536,
                    uncompressed_chunks: bool = False) -> bytes:
    out = bytearray(FRAME_MAGIC)
    for i in range(0, len(data), chunk_size) or [0]:
        piece = data[i: i + chunk_size]
        crc = _mask(crc32c(piece)).to_bytes(4, "little")
        if uncompressed_chunks:
            body = crc + piece
            out += bytes([0x01]) + len(body).to_bytes(3, "little") + body
        else:
            body = crc + _compress_raw(piece)
            out += bytes([0x00]) + len(body).to_bytes(3, "little") + body
    if not data:
        pass  # identifier-only stream decodes to b""
    return bytes(out)
