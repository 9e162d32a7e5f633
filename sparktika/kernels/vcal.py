"""vCard (RFC 6350) and iCalendar (RFC 5545) kernels.

Tika 1.20 parses both via tika-parsers (linked by the reference through
build.gradle / gradle.properties:5). The two formats share the
content-line syntax ``NAME;PARAM=..:VALUE`` with soft line folding
(CRLF + SPACE/TAB continuation) and backslash escaping — one shared
scanner serves both.

Rendering (deterministic, one line per allow-listed property value, in
file order within each card/event):

- vCard: FN N ORG TITLE TEL EMAIL ADR NOTE URL; title = first FN
- iCal: per VEVENT: SUMMARY DTSTART DTEND LOCATION DESCRIPTION;
  title = first SUMMARY

Robustness (invariant 7): property and card counts are capped; base64 /
binary property values (PHOTO etc.) are skipped by the allowlist; the
scanner never raises on content.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_MAX_LINES = 200_000
_MAX_COMPONENTS = 10_000

_UNESCAPE_RE = re.compile(r"\\([nN,;\\])")

VCARD_PROPS = ("FN", "N", "ORG", "TITLE", "TEL", "EMAIL", "ADR", "NOTE",
               "URL")
ICAL_PROPS = ("SUMMARY", "DTSTART", "DTEND", "LOCATION", "DESCRIPTION")


def sniff_vcal(data: bytes) -> str | None:
    """'text/vcard' / 'text/calendar' from the first non-blank line."""
    head = data[:256].lstrip(b"\xef\xbb\xbf \t\r\n").upper()
    if head.startswith(b"BEGIN:VCARD"):
        return "text/vcard"
    if head.startswith(b"BEGIN:VCALENDAR"):
        return "text/calendar"
    return None


@dataclass
class VcalResult:
    text: str
    title: str | None = None
    kind: str = "vcard"  # 'vcard' | 'ical'
    n_components: int = 0  # cards or events
    metadata: dict[str, str] = field(default_factory=dict)


def _unfold(text: str) -> list[str]:
    lines: list[str] = []
    for raw in text.splitlines()[:_MAX_LINES]:
        if raw[:1] in (" ", "\t") and lines:
            lines[-1] += raw[1:]
        else:
            lines.append(raw)
    return lines


def _unescape(v: str) -> str:
    return _UNESCAPE_RE.sub(
        lambda m: "\n" if m.group(1) in "nN" else m.group(1), v)


_HEX = set("0123456789ABCDEFabcdef")


def _decode_qp(v: str) -> str:
    """Inline quoted-printable decode (=XX hex escapes, RFC 2045 §6.7
    as used by vCard 2.1). Multi-byte runs decode as UTF-8; malformed
    escapes pass through literally (never raises)."""
    out: list[str] = []
    buf = bytearray()
    i, n = 0, len(v)
    while i < n:
        c = v[i]
        if c == "=" and i + 2 < n and v[i + 1] in _HEX and v[i + 2] in _HEX:
            buf.append(int(v[i + 1: i + 3], 16))
            i += 3
            continue
        if buf:
            out.append(buf.decode("utf-8", "replace"))
            buf.clear()
        out.append(c)
        i += 1
    if buf:
        out.append(buf.decode("utf-8", "replace"))
    return "".join(out)


def _content_lines(text: str):
    """Yield (NAME_upper, value) with params stripped and value
    unescaped; group prefixes (item1.TEL) are dropped per RFC 6350.

    vCard 2.1 ENCODING=QUOTED-PRINTABLE values (legacy writers; the one
    encoding case 3.0/4.0 dropped) get their soft line breaks honored —
    a trailing '=' joins the next PHYSICAL line — then inline =XX
    escapes decode (r4 verdict item 5: silently emitting the raw '='
    soup was a text-corruption case, not a status row)."""
    lines = _unfold(text)
    i = 0
    while i < len(lines):
        line = lines[i]
        i += 1
        if ":" not in line:
            continue
        head, value = line.split(":", 1)
        parts = head.split(";")
        name = parts[0].strip().upper()
        if "." in name:
            name = name.rsplit(".", 1)[1]
        params = {p.strip().upper() for p in parts[1:]}
        if "ENCODING=QUOTED-PRINTABLE" in params or "QUOTED-PRINTABLE" in params:
            while value.endswith("=") and i < len(lines):
                value = value[:-1] + lines[i]
                i += 1
            # vCard 2.1 QP values carry NO backslash escaping — running
            # _unescape over the decoded bytes would turn a literal
            # '\n' (e.g. from =5Cn, a Windows path) into a newline
            # (r5 review)
            yield name, _decode_qp(value).strip()
            continue
        yield name, _unescape(value.strip())


def extract_vcal(data: bytes, deadline: float | None = None) -> VcalResult:
    from .charset import decode as charset_decode
    from .errors import check_deadline

    kind_mime = sniff_vcal(data)
    text, _cs = charset_decode(data, is_html=False)
    is_ical = kind_mime == "text/calendar"
    out: list[str] = []
    title: str | None = None
    n_comp = 0
    in_component = False  # flips at BEGIN:VCARD / BEGIN:VEVENT
    # nested sub-components (VALARM inside VEVENT, embedded groups) must
    # not leak their SUMMARY/DESCRIPTION into the event's text or steal
    # the title (r4 review finding) — suppress while any non-target
    # component is open inside the target one
    suppress = 0
    props = ICAL_PROPS if is_ical else VCARD_PROPS
    i = 0
    for name, value in _content_lines(text):
        i += 1
        if (i & 0xFFF) == 1:
            check_deadline(deadline, "vcal scan")
        if name == "BEGIN":
            comp = value.upper()
            if (is_ical and comp == "VEVENT") or (not is_ical
                                                  and comp == "VCARD"):
                n_comp += 1
                if n_comp > _MAX_COMPONENTS:
                    break
                in_component = True
                suppress = 0
            elif in_component:
                suppress += 1
            continue
        if name == "END":
            comp = value.upper()
            if suppress and not (
                    (is_ical and comp == "VEVENT")
                    or (not is_ical and comp == "VCARD")):
                suppress -= 1
                continue
            if (is_ical and comp == "VEVENT") or (not is_ical
                                                  and comp == "VCARD"):
                in_component = False
                suppress = 0
            continue
        if not in_component or suppress or not value:
            continue
        if name in props:
            if title is None and name == ("SUMMARY" if is_ical else "FN"):
                title = value.split("\n", 1)[0]
            if name in ("N", "ADR"):
                # structured values: semicolon components -> spaces
                value = " ".join(p for p in value.split(";") if p).strip()
                if not value:
                    continue
            out.append(value)
    body = "\n".join(out)
    if body:
        body += "\n"
    mime = "text/calendar" if is_ical else "text/vcard"
    return VcalResult(
        text=body, title=title, kind="ical" if is_ical else "vcard",
        n_components=n_comp, metadata={"Content-Type": mime})
