"""Legacy PowerPoint (.ppt) text extraction: OLE2 `PowerPoint Document`
stream record scan (MS-PPT public spec).

PPT files are a tree of records with an 8-byte header
(versionAndInstance u16, recType u16, recLen u32). Container records
(recVer == 0xF) nest children; text lives in leaf atoms:
  0x0FA0 TextCharsAtom  — UTF-16LE text
  0x0FA8 TextBytesAtom  — latin-1 text
  0x0FBA CString        — UTF-16LE (titles, notes)
Output spec (ours): one line per text atom, in stream order.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .errors import KernelError, check_deadline
from .ole2 import Ole2File

_TEXT_CHARS = 0x0FA0
_TEXT_BYTES = 0x0FA8
_CSTRING = 0x0FBA


@dataclass
class PptResult:
    text: str
    n_atoms: int = 0
    metadata: dict[str, str] = field(default_factory=dict)


def _scan(data: bytes, out: list[str], depth: int = 0,
          deadline: float | None = None) -> None:
    if depth > 32:
        raise KernelError("PPT record nesting exceeded cap")
    i, n = 0, len(data)
    rec_i = 0
    while i + 8 <= n:
        rec_i += 1
        if (rec_i & 0xFF) == 1:  # poll on the first record too
            check_deadline(deadline, "ppt record scan")
        ver_inst, rec_type, rec_len = struct.unpack_from("<HHI", data, i)
        i += 8
        rec_len = min(rec_len, n - i)
        payload = data[i : i + rec_len]
        if (ver_inst & 0x000F) == 0x000F:  # container: recurse
            _scan(payload, out, depth + 1, deadline)
        elif rec_type in (_TEXT_CHARS, _CSTRING):
            t = payload.decode("utf-16-le", "replace").replace("\r", "\n").strip("\x00")
            if t.strip():
                out.append(t)
        elif rec_type == _TEXT_BYTES:
            t = payload.decode("latin-1", "replace").replace("\r", "\n")
            if t.strip():
                out.append(t)
        i += rec_len


OLD_PPT_REFUSAL = ("pre-97 PowerPoint record format is undocumented "
                   "publicly; Tika 1.20 (POI HSLF) likewise throws "
                   "OldPowerPointFormatException — refused by design")


def doc_file_version(ole) -> int | None:
    """docFileVersion from the `Current User` stream ([MS-PPT] §2.3.2
    CurrentUserAtom: 8-byte record header, then size/headerToken/
    offsetToCurrentEdit u32s + lenUserName u16 put the u16 field at
    offset 22). 0x03F4 means PowerPoint 97+; POI HSLF treats anything
    else as the 95 format and refuses. None when the stream is absent
    or too short to carry the field (our pre-r7 synth decks)."""
    if "Current User" not in ole.stream_names():
        return None
    cu = ole.read_stream("Current User")
    if len(cu) < 24:
        return None
    return struct.unpack_from("<H", cu, 22)[0]


def extract_ppt_ole(ole, deadline: float | None = None) -> PptResult:
    """Record scan over an Ole2File-like (including a ScopedOle view of
    an embedded presentation storage inside another compound document —
    ObjectPool members, .msg attachment objects; r3 verdict item 8)."""
    if "PowerPoint Document" not in ole.stream_names():
        raise KernelError("no PowerPoint Document stream")
    stream = ole.read_stream("PowerPoint Document")
    parts: list[str] = []
    _scan(stream, parts, deadline=deadline)
    text = "\n".join(parts) + ("\n" if parts else "")
    return PptResult(text=text, n_atoms=len(parts))


def extract_ppt(data: bytes, deadline: float | None = None) -> PptResult:
    return extract_ppt_ole(Ole2File(data), deadline=deadline)
