"""AppleSingle / AppleDouble kernel — from scratch.

Tika 1.20 parity: ``org.apache.tika.parser.apple.AppleSingleFileParser``
(shipped in tika-parsers:1.20, reached by the reference via
tika-fork-main/build.gradle:24) reads the entry table, publishes the
REAL NAME entry as metadata, and hands the DATA FORK to the embedded-
document parser. Built from the PUBLIC AppleSingle/AppleDouble Format
v2 specification (reproduced as RFC 1740 appendices A/B):

- u32be magic 0x00051600 (AppleSingle) / 0x00051607 (AppleDouble),
  u32be version 0x00010000 or 0x00020000, 16 filler bytes,
  u16be entry count;
- entries: (entry id u32be, offset u32be, length u32be). IDs: 1 data
  fork, 2 resource fork, 3 real name, 4 comment, 8 file dates,
  9 Finder info.

AppleSingle carries the actual file in its data fork — the dispatcher
re-dispatches those bytes under the real name (the gzip transparent-
wrapper posture). AppleDouble holds only the resource-fork/metadata
half (its sibling file holds the data), so it yields a metadata row.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .errors import KernelError

APPLEFILE_MIME = "application/applefile"

_MAGIC_SINGLE = 0x00051600
_MAGIC_DOUBLE = 0x00051607
_VERSIONS = (0x00010000, 0x00020000)
_MAX_ENTRIES = 64

ID_DATA_FORK = 1
ID_RESOURCE_FORK = 2
ID_REAL_NAME = 3
ID_COMMENT = 4
ID_FINDER_INFO = 9


def is_applefile(data: bytes) -> bool:
    if len(data) < 26:
        return False
    magic, version = struct.unpack_from(">II", data, 0)
    if magic not in (_MAGIC_SINGLE, _MAGIC_DOUBLE):
        return False
    if version not in _VERSIONS:
        return False
    n, = struct.unpack_from(">H", data, 24)
    return n <= _MAX_ENTRIES


@dataclass
class AppleFileResult:
    kind: str                       # "applesingle" | "appledouble"
    version: int
    real_name: str | None = None
    comment: str | None = None
    data_fork: bytes | None = None
    resource_fork_len: int = 0
    has_finder_info: bool = False
    entries: list[int] = field(default_factory=list)


def parse_applefile(data: bytes) -> AppleFileResult:
    if not is_applefile(data):
        raise KernelError("applefile: bad magic/version/entry count")
    magic, version = struct.unpack_from(">II", data, 0)
    n, = struct.unpack_from(">H", data, 24)
    res = AppleFileResult(
        kind="applesingle" if magic == _MAGIC_SINGLE else "appledouble",
        version=version)
    pos = 26
    for _ in range(n):
        if pos + 12 > len(data):
            raise KernelError("applefile: truncated entry table")
        eid, off, ln = struct.unpack_from(">III", data, pos)
        pos += 12
        res.entries.append(eid)
        if off + ln > len(data):
            # a lying entry refuses the whole file: serving a truncated
            # data fork downstream would parse as clean-but-corrupt
            raise KernelError("applefile: entry past EOF")
        body = data[off: off + ln]
        if eid == ID_DATA_FORK:
            res.data_fork = body
        elif eid == ID_RESOURCE_FORK:
            res.resource_fork_len = ln
        elif eid == ID_REAL_NAME:
            # v2 stores the name in ASCII/UTF-8; v1 used MacRoman —
            # mac_roman decodes every byte, so this never raises
            enc = "utf-8" if version == 0x00020000 else "mac_roman"
            res.real_name = body.decode(enc, "replace")[:1024]
        elif eid == ID_COMMENT:
            res.comment = body.decode("mac_roman", "replace")[:1024]
        elif eid == ID_FINDER_INFO:
            res.has_finder_info = ln >= 32
    return res


# -- builder (synth corpus + tests) --------------------------------------


def build_applefile(kind: str, real_name: str | None = None,
                    data_fork: bytes | None = None,
                    resource_fork: bytes = b"",
                    version: int = 0x00020000) -> bytes:
    magic = _MAGIC_SINGLE if kind == "applesingle" else _MAGIC_DOUBLE
    entries: list[tuple[int, bytes]] = []
    if real_name is not None:
        entries.append((ID_REAL_NAME, real_name.encode("utf-8")))
    if resource_fork:
        entries.append((ID_RESOURCE_FORK, resource_fork))
    if data_fork is not None:
        entries.append((ID_DATA_FORK, data_fork))   # conventionally last
    head = struct.pack(">II16xH", magic, version, len(entries))
    pos = len(head) + 12 * len(entries)
    table = b""
    payload = b""
    for eid, body in entries:
        table += struct.pack(">III", eid, pos, len(body))
        pos += len(body)
        payload += body
    return head + table + payload
