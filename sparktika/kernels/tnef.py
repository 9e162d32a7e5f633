"""TNEF (winmail.dat) kernel: attribute-stream walk.

From-scratch reader for Microsoft's Transport Neutral Encapsulation
Format ([MS-OXTNEF] public spec). The reference links tika-parsers:1.20
(gradle.properties:5), whose TNEFParser walks the same attribute stream
via net.freeutils/POI. Layout:

  u32le signature 0x223E9F78, u16le attach key, then a sequence of
  attributes: u8 level (1=message, 2=attachment), u32le id
  ((type << 16) | id), u32le length, data, u16le checksum
  (sum of data bytes mod 2^16).

Scope: attSubject, attBody (cp1252), attAttachTitle, attAttachData
(re-dispatched through the guarded embedded recursion like .msg
attachments); attMAPIProps property bags are skipped by length (their
PR_BODY duplication is out of scope). Rendering mirrors the msg/eml
kernels: subject heading, body, then ``[Attachment: name]`` markers
with recursed text.

Robustness (invariant 7): attribute count capped, per-attribute
checksum verified (a mismatch degrades to skipping that attribute, not
failing the file), truncated streams stop cleanly.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .errors import DeadlineError, check_deadline

SIGNATURE = b"\x78\x9f\x3e\x22"

_MAX_ATTRS = 10_000

_ATT_SUBJECT = 0x00018004
_ATT_BODY = 0x0002800C
_ATT_ATTACH_TITLE = 0x00018010
_ATT_ATTACH_DATA = 0x0006800F


@dataclass
class TnefResult:
    text: str
    subject: str | None = None
    n_attachments: int = 0
    attachment_names: list[str] = field(default_factory=list)
    metadata: dict[str, str] = field(default_factory=dict)


def sniff_tnef(data: bytes) -> bool:
    return data[:4] == SIGNATURE


def _cstring(raw: bytes) -> str:
    return raw.split(b"\x00", 1)[0].decode("cp1252", "replace")


def extract_tnef(data: bytes, deadline: float | None = None,
                 recurse=None) -> TnefResult:
    from .errors import KernelError

    if not sniff_tnef(data):
        raise KernelError("not a TNEF stream (bad signature)")
    pos = 6  # signature + attach key
    n = len(data)
    subject: str | None = None
    body: str | None = None
    att_names: list[str] = []
    att_texts: list[str] = []
    pending_title: str | None = None
    n_att = 0
    attrs = 0
    while pos + 9 <= n and attrs < _MAX_ATTRS:
        attrs += 1
        if (attrs & 0xFF) == 1:
            check_deadline(deadline, "tnef attribute walk")
        level = data[pos]
        att_id, length = struct.unpack_from("<II", data, pos + 1)
        body_start = pos + 9
        if level not in (1, 2) or length > n - body_start:
            break  # malformed/truncated: stop cleanly with what we have
        raw = data[body_start: body_start + length]
        pos = body_start + length + 2  # + checksum
        if pos > n:
            break  # checksum truncated off the end: UNVERIFIED data
            # must not be processed (r5 review — every other attribute
            # would have been skipped on mismatch)
        (declared_ck,) = struct.unpack_from("<H", data, pos - 2)
        if sum(raw) & 0xFFFF != declared_ck:
            continue  # corrupt attribute: skip it, keep walking
        if att_id == _ATT_SUBJECT and subject is None:
            subject = _cstring(raw)
        elif att_id == _ATT_BODY and body is None:
            body = _cstring(raw).replace("\r\n", "\n")
        elif att_id == _ATT_ATTACH_TITLE:
            pending_title = _cstring(raw) or None
        elif att_id == _ATT_ATTACH_DATA:
            n_att += 1
            name = pending_title or f"attachment{n_att}"
            att_names.append(name)
            pending_title = None
            if recurse is not None and raw:
                try:
                    t = recurse(name, raw)
                except DeadlineError:
                    raise
                except Exception:
                    t = None
                if t:
                    att_texts.append(
                        f"[Attachment: {name}]\n"
                        + (t if t.endswith("\n") else t + "\n"))

    lines: list[str] = []
    if subject:
        lines.append(subject)
    if body:
        b = body.rstrip("\n")
        if b:
            lines.append(b)
    text = "\n".join(lines)
    if text:
        text += "\n"
    text += "".join(att_texts)
    md = {"Content-Type": "application/vnd.ms-tnef"}
    return TnefResult(text=text, subject=subject, n_attachments=n_att,
                      attachment_names=att_names, metadata=md)
