"""OLE2 property-set metadata: \\x05SummaryInformation and
\\x05DocumentSummaryInformation streams (MS-OLEPS public spec).

Feeds the legacy-Office metadata parity path (the reference's XLS golden
pins 23 distinct metadata keys via POI's SummaryInformation mapping,
ref: test/TikaProcessTest.java:124-128). Layout:

  header: byteOrder u16, version u16, sysId u32, clsid 16B, numPropSets u32
  per set: fmtid 16B, offset u32
  section: size u32, numProps u32, then (propId u32, offset u32) pairs;
  property at section_start+offset: type u32 (VT_*), value

Types handled: VT_I2, VT_I4, VT_BOOL, VT_LPSTR (codepage-decoded),
VT_LPWSTR, VT_FILETIME (100ns ticks since 1601-01-01 UTC), and
VT_VECTOR|VT_LPSTR (TitlesOfParts). Unknown types are skipped.
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta, timezone

from .errors import KernelError

# PIDSI — SummaryInformation property ids
PIDSI = {
    2: "title", 3: "subject", 4: "author", 5: "keywords", 6: "comments",
    7: "template", 8: "last_author", 9: "rev_number", 10: "edit_time",
    11: "last_printed", 12: "create_dtm", 13: "last_save_dtm",
    14: "page_count", 15: "word_count", 16: "char_count",
    18: "app_name", 19: "security",
}

# PIDDSI — DocumentSummaryInformation property ids
PIDDSI = {
    2: "category", 3: "presentation_format", 4: "byte_count", 5: "line_count",
    6: "paragraph_count", 7: "slide_count", 8: "note_count",
    9: "hidden_slide_count", 10: "mm_clip_count", 11: "scale_crop",
    12: "heading_pairs", 13: "titles_of_parts", 14: "manager", 15: "company",
    16: "links_up_to_date", 17: "chars_with_spaces", 19: "shared_doc",
    22: "hyperlinks_changed", 23: "app_version",
}

_FMTID_SUMMARY = bytes.fromhex("e0859ff2f94f6810ab9108002b27b3d9")
_FMTID_DOCSUMMARY = bytes.fromhex("02d5cdd59c2e1b1093970800"
                                  "2b2cf9ae")

_EPOCH_1601 = datetime(1601, 1, 1, tzinfo=timezone.utc)


def filetime_to_iso(ticks: int) -> str | None:
    """64-bit FILETIME (100ns since 1601-01-01 UTC) -> ISO8601 Z string
    (Tika's date rendering). Zero/implausible values return None."""
    if ticks <= 0:
        return None
    try:
        dt = _EPOCH_1601 + timedelta(microseconds=ticks // 10)
    except OverflowError:
        return None
    if dt.year < 1800 or dt.year > 9999:
        return None
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _read_value(data: bytes, off: int, codepage: str):
    (vt,) = struct.unpack_from("<I", data, off)
    base = vt & 0x0FFF
    is_vector = bool(vt & 0x1000)
    p = off + 4
    if is_vector and base == 0x1E:  # vector of LPSTR
        (n,) = struct.unpack_from("<I", data, p)
        p += 4
        out = []
        for _ in range(min(n, 10_000)):
            (ln,) = struct.unpack_from("<I", data, p)
            p += 4
            s = data[p : p + ln].split(b"\x00")[0].decode(codepage, "replace")
            out.append(s)
            p += ln
            p += (4 - p % 4) % 4  # 4-byte alignment between elements
        return out
    if base == 0x02:  # VT_I2
        return struct.unpack_from("<h", data, p)[0]
    if base == 0x03:  # VT_I4
        return struct.unpack_from("<i", data, p)[0]
    if base == 0x0B:  # VT_BOOL
        return struct.unpack_from("<h", data, p)[0] != 0
    if base == 0x1E:  # VT_LPSTR
        (ln,) = struct.unpack_from("<I", data, p)
        return data[p + 4 : p + 4 + ln].split(b"\x00")[0].decode(codepage, "replace")
    if base == 0x1F:  # VT_LPWSTR
        (ln,) = struct.unpack_from("<I", data, p)
        return data[p + 4 : p + 4 + ln * 2].decode("utf-16-le", "replace").rstrip("\x00")
    if base == 0x40:  # VT_FILETIME
        (ticks,) = struct.unpack_from("<q", data, p)
        return filetime_to_iso(ticks)
    return None


def parse_property_set(data: bytes) -> dict[int, object]:
    """Parse one property-set stream -> {property_id: value}."""
    if len(data) < 48:
        raise KernelError("property-set stream too short")
    byte_order, _ver = struct.unpack_from("<HH", data, 0)
    if byte_order != 0xFFFE:
        raise KernelError("bad property-set byte order mark")
    (n_sets,) = struct.unpack_from("<I", data, 24)
    if not (1 <= n_sets <= 2):
        raise KernelError(f"implausible property-set count {n_sets}")
    (sec_off,) = struct.unpack_from("<I", data, 44)
    sec = sec_off
    (_size, n_props) = struct.unpack_from("<II", data, sec)
    if n_props > 1000:
        raise KernelError("implausible property count")
    # pass 1: find the codepage (id 1) so strings decode correctly
    codepage = "cp1252"
    entries: list[tuple[int, int]] = []
    for k in range(n_props):
        pid, poff = struct.unpack_from("<II", data, sec + 8 + k * 8)
        entries.append((pid, poff))
        if pid == 1:
            try:
                cp = _read_value(data, sec + poff, "latin-1")
                if isinstance(cp, int) and cp > 0:
                    codepage = "utf-16-le" if cp == 1200 else f"cp{cp & 0xFFFF}"
            except (struct.error, LookupError):
                pass
    out: dict[int, object] = {}
    for pid, poff in entries:
        if pid == 1:
            continue
        try:
            v = _read_value(data, sec + poff, codepage)
        except (struct.error, IndexError, LookupError):
            continue
        if v is not None:
            out[pid] = v
    return out


def extract_ole_properties(ole) -> tuple[dict[str, object], dict[str, object]]:
    """(summary, doc_summary) named-property dicts from an Ole2File."""
    summary: dict[str, object] = {}
    docsum: dict[str, object] = {}
    names = set(ole.stream_names())
    if "\x05SummaryInformation" in names:
        try:
            props = parse_property_set(ole.read_stream("\x05SummaryInformation"))
            summary = {PIDSI[k]: v for k, v in props.items() if k in PIDSI}
        except KernelError:
            pass
    if "\x05DocumentSummaryInformation" in names:
        try:
            props = parse_property_set(
                ole.read_stream("\x05DocumentSummaryInformation"))
            docsum = {PIDDSI[k]: v for k, v in props.items() if k in PIDDSI}
        except KernelError:
            pass
    return summary, docsum
