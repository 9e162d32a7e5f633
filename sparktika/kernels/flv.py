"""FLV (Flash Video) metadata kernel — from scratch.

Tika 1.20 parity: ``org.apache.tika.parser.video.FLVParser`` (reached
by the reference through tika-parsers:1.20,
tika-fork-main/build.gradle:24) reads the FLV header's audio/video
presence flags and AMF0-decodes the first ``onMetaData`` script tag,
publishing every scalar entry (duration, width, height, framerate,
videocodecid, audiocodecid, ...) as metadata. Built from the PUBLIC
Adobe "Video File Format Specification, Version 10" (the AMF0 value
grammar is the public "Action Message Format — AMF 0" spec).

Layout walked here:

- Header: ``FLV`` magic, version byte, TypeFlags (bit 0 video,
  bit 2 audio), u32 DataOffset.
- Tag stream: u32 PreviousTagSize, then per tag: type byte (8 audio /
  9 video / 18 script data), u24 DataSize, u24+u8 timestamp,
  u24 StreamID, payload.
- Script data payload: AMF0 string ``onMetaData`` followed by one
  ECMA array / object of named values. Decoded AMF0 types: number
  (f64 BE), boolean, string, object, ECMA array, strict array, null/
  undefined, date. Anything else stops the walk (refusal beats a
  mis-framed read).

The walk is bounded (tag count + byte budget), never decodes frame
payloads, and every malformed structure degrades to a status row
through the dispatcher (invariant 7).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .errors import KernelError, check_deadline

_MAX_TAGS = 4096
_MAX_AMF_VALUES = 4096
_MAX_DEPTH = 16


def is_flv(data: bytes) -> bool:
    return (len(data) >= 9 and data[:3] == b"FLV" and data[3] <= 10
            and (data[4] & ~0x05) == 0
            and struct.unpack_from(">I", data, 5)[0] >= 9)


@dataclass
class FlvMeta:
    version: int
    has_audio: bool
    has_video: bool
    entries: list[tuple[str, object]] = field(default_factory=list)
    n_tags: int = 0


class _Amf:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0
        self.count = 0

    def _need(self, n: int) -> None:
        if self.p + n > len(self.d):
            raise KernelError("flv: truncated AMF0 value")

    def u8(self) -> int:
        self._need(1)
        v = self.d[self.p]
        self.p += 1
        return v

    def u16(self) -> int:
        self._need(2)
        v = struct.unpack_from(">H", self.d, self.p)[0]
        self.p += 2
        return v

    def u32(self) -> int:
        self._need(4)
        v = struct.unpack_from(">I", self.d, self.p)[0]
        self.p += 4
        return v

    def f64(self) -> float:
        self._need(8)
        v = struct.unpack_from(">d", self.d, self.p)[0]
        self.p += 8
        return v

    def string(self) -> str:
        n = self.u16()
        self._need(n)
        s = self.d[self.p: self.p + n].decode("utf-8", errors="replace")
        self.p += n
        return s

    def value(self, depth: int = 0):
        if depth > _MAX_DEPTH:
            raise KernelError("flv: AMF0 nesting too deep")
        self.count += 1
        if self.count > _MAX_AMF_VALUES:
            raise KernelError("flv: AMF0 value bomb")
        marker = self.u8()
        if marker == 0x00:                       # number
            return self.f64()
        if marker == 0x01:                       # boolean
            return self.u8() != 0
        if marker == 0x02:                       # string
            return self.string()
        if marker == 0x03:                       # object
            return self._object(depth)
        if marker == 0x05 or marker == 0x06:     # null / undefined
            return None
        if marker == 0x08:                       # ECMA array
            self.u32()                           # approximate count
            return self._object(depth)
        if marker == 0x0A:                       # strict array
            n = self.u32()
            if n > _MAX_AMF_VALUES:
                raise KernelError("flv: AMF0 array bomb")
            return [self.value(depth + 1) for _ in range(n)]
        if marker == 0x0B:                       # date
            v = self.f64()
            self.u16()                           # tz, always 0
            return v
        raise KernelError(f"flv: unsupported AMF0 marker 0x{marker:02x}")

    def _object(self, depth: int) -> dict:
        out: dict[str, object] = {}
        while True:
            name = self.string()
            if not name:
                end = self.u8()
                if end != 0x09:
                    raise KernelError("flv: missing AMF0 object end")
                return out
            out[name] = self.value(depth + 1)


def parse_flv(data: bytes, deadline: float | None = None) -> FlvMeta:
    if not is_flv(data):
        raise KernelError("flv: bad header")
    flags = data[4]
    meta = FlvMeta(version=data[3],
                   has_audio=bool(flags & 0x04),
                   has_video=bool(flags & 0x01))
    pos = struct.unpack_from(">I", data, 5)[0]
    script: bytes | None = None
    for _ in range(_MAX_TAGS):
        check_deadline(deadline, "flv tag walk")
        if pos + 4 > len(data):
            break
        pos += 4                                  # PreviousTagSize
        if pos + 11 > len(data):
            break
        ttype = data[pos]
        size = int.from_bytes(data[pos + 1: pos + 4], "big")
        body_at = pos + 11
        if body_at + size > len(data):
            raise KernelError("flv: truncated tag payload")
        if ttype == 18 and script is None:
            script = data[body_at: body_at + size]
        elif ttype not in (8, 9, 18):
            raise KernelError(f"flv: unknown tag type {ttype}")
        meta.n_tags += 1
        pos = body_at + size
    if script is not None:
        amf = _Amf(script)
        name = amf.value()
        if name == "onMetaData":
            payload = amf.value()
            if isinstance(payload, dict):
                for k, v in payload.items():
                    if isinstance(v, (str, bool, float, int)) or v is None:
                        meta.entries.append((k, v))
    return meta


def render_meta_value(v: object) -> str:
    """Tika FLVParser prints AMF0 scalars via toString: doubles keep
    their Java Double form (integral values end in .0)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{int(v)}.0"
        return repr(v)
    if v is None:
        return "null"
    return str(v)


# -- builder (synth corpus + tests) --------------------------------------


def _amf_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def _amf_value(v: object) -> bytes:
    if isinstance(v, bool):
        return b"\x01" + (b"\x01" if v else b"\x00")
    if isinstance(v, (int, float)):
        return b"\x00" + struct.pack(">d", float(v))
    if isinstance(v, str):
        return b"\x02" + _amf_string(v)
    if v is None:
        return b"\x05"
    raise ValueError(f"unsupported AMF0 build type {type(v)}")


def _tag(ttype: int, payload: bytes, ts: int = 0) -> bytes:
    return (bytes([ttype]) + len(payload).to_bytes(3, "big")
            + ts.to_bytes(3, "big") + b"\x00" + b"\x00\x00\x00" + payload)


def build_flv(meta: dict[str, object], has_audio: bool = True,
              has_video: bool = True, n_av_tags: int = 2) -> bytes:
    """Valid FLV: header, one onMetaData script tag (ECMA array), then
    a few dummy audio/video tags with correct PreviousTagSize chaining."""
    flags = (0x04 if has_audio else 0) | (0x01 if has_video else 0)
    header = b"FLV" + bytes([1, flags]) + struct.pack(">I", 9)
    script = (b"\x02" + _amf_string("onMetaData")
              + b"\x08" + struct.pack(">I", len(meta)))
    for k, v in meta.items():
        script += _amf_string(k) + _amf_value(v)
    script += b"\x00\x00\x09"
    out = bytearray(header)
    prev = 0
    tags = [_tag(18, script)]
    for i in range(n_av_tags):
        if has_video:
            tags.append(_tag(9, b"\x12\x01" + bytes(16), ts=i * 40))
        if has_audio:
            tags.append(_tag(8, b"\x2a\x01" + bytes(8), ts=i * 40))
    for t in tags:
        out += struct.pack(">I", prev) + t
        prev = len(t)
    out += struct.pack(">I", prev)
    return bytes(out)
