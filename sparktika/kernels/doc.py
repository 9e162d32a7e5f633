"""Legacy Word (.doc) text extraction: FIB + piece table (MS-DOC public spec).

Covers the Word97+ binary layout:
- FIB in the `WordDocument` stream: magic 0xA5EC, flag bit selecting the
  `1Table`/`0Table` stream, fcClx/lcbClx locating the piece table
- Clx in the table stream: Prc records skipped, Pcdt (0x02) holding a
  PlcPcd: CP array + PCDs; each PCD's fc encodes compressed (cp1252,
  fc/2) vs UTF-16LE text ranges in the WordDocument stream
- pieces concatenated in CP order; control chars normalized (\\r, 0x0B
  line breaks and 0x07 cell marks -> newline)
- FIELDS (MS-DOC 2.8.25 Plcfld semantics at the character level): text
  between the field-begin (0x13) and field-separator (0x14) marks is the
  field INSTRUCTION (e.g. "HYPERLINK http://...") and is suppressed;
  only the cached RESULT between 0x14 and 0x15 is emitted — matching
  Tika's HWPF WordExtractor rendering. Fields nest; an instruction-only
  field (no separator) contributes nothing.
- SUBDOCUMENTS: FibRgLw97's ccpText/ccpFtn/ccpHdd split the CP space
  into main text / footnotes / headers+footers; the result carries the
  per-subdocument char counts, text stays in CP order (Word's own
  reading order: main, footnotes, headers).

Bomb posture: piece count capped; all ranges bounds-checked.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .errors import KernelError, check_deadline
from .ole2 import Ole2File

_FIB_MAGIC = 0xA5EC
_FIB_MAGIC_OLD = 0xA5DC  # Word 6/95 (nFib < 105)
_MAX_PIECES = 100_000

# cp1252 high-row for compressed pieces (Word stores 8-bit text as cp1252)
_CP1252_HIGH = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…", 0x86: "†",
    0x87: "‡", 0x88: "ˆ", 0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“", 0x94: "”", 0x95: "•",
    0x96: "–", 0x97: "—", 0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}


def _decode_cp1252(data: bytes) -> str:
    return "".join(_CP1252_HIGH.get(b, chr(b)) for b in data)


@dataclass
class DocResult:
    text: str
    n_pieces: int = 0
    n_chars_main: int = 0
    n_chars_footnotes: int = 0
    n_chars_headers: int = 0
    n_embedded_objects: int = 0  # ObjectPool sub-storages (OLE embeds)


_MAX_INSTRUCTION_CHARS = 4096  # corruption guard: real field codes are short


def _normalize(text: str) -> str:
    out = []
    # open fields, one bool per nesting level: has the separator been seen?
    # Emit only when every enclosing field is past its separator (i.e. we
    # are in cached-result text, not instruction text).
    fields: list[bool] = []
    suppressed = 0  # chars suppressed since the suppression state began
    for ch in text:
        o = ord(ch)
        if o == 0x13:  # field begin
            fields.append(False)
            suppressed = 0
            continue
        if o == 0x14:  # field separator: instruction -> result
            if fields:
                fields[-1] = True
            suppressed = 0
            continue
        if o == 0x15:  # field end
            if fields:
                fields.pop()
            suppressed = 0
            continue
        if fields and not all(fields):
            # a stray 0x13 in corrupt/adversarial text would otherwise
            # swallow the rest of the segment — real instructions are
            # short, so an overlong suppression means the mark was noise
            suppressed += 1
            if suppressed > _MAX_INSTRUCTION_CHARS:
                fields.clear()
                suppressed = 0
            else:
                continue
        if ch == "\r" or o in (0x07, 0x0B):  # para mark / cell mark / line break
            out.append("\n")
        elif o < 0x20 and ch not in ("\t", "\n"):
            continue
        else:
            out.append(ch)
    return "".join(out)


def extract_doc(data: bytes, deadline: float | None = None) -> DocResult:
    return extract_doc_ole(Ole2File(data), deadline)


def _count_object_pool(ole) -> int:
    """Embedded OLE objects live as sub-storages of ObjectPool."""
    pool = next((e for e in ole.root_children()
                 if e.obj_type == 1 and e.name == "ObjectPool"), None)
    return (sum(1 for k in ole.storage_children(pool)
                if k.obj_type == 1) if pool is not None else 0)


def _extract_doc_legacy(wd: bytes, ole) -> DocResult:
    """Word 6/95 binaries (wIdent 0xA5DC, nFib < 105): no 0Table/1Table
    stream — for a normally-saved file the text is the FLAT byte range
    [fcMin, fcMac) of WordDocument, 8-bit cp1252 (the Word 6 FIB keeps
    fcMin/fcMac at 0x18/0x1C; Word 97 marks those bytes reserved).
    Tika 1.20 reads these via POI HWPFOldDocument (tika-parsers, ref
    build.gradle). Honest limits, refused with status rows: fast-saved
    files (fComplex — old-layout piece table) and XOR-obfuscated files
    (fEncrypted)."""
    n_fib = struct.unpack_from("<H", wd, 2)[0]
    flags = struct.unpack_from("<H", wd, 0x0A)[0]
    if flags & 0x0100:
        raise KernelError(
            f"legacy .doc nFib {n_fib}: XOR obfuscation (fEncrypted) "
            "unsupported")
    if flags & 0x0004:
        raise KernelError(
            f"legacy .doc nFib {n_fib}: fast-saved (fComplex) piece "
            "table unsupported")
    fc_min, fc_mac = struct.unpack_from("<II", wd, 0x18)
    if not (0 <= fc_min <= fc_mac <= len(wd)):
        raise KernelError("legacy .doc text range out of bounds")
    text = _normalize(_decode_cp1252(wd[fc_min:fc_mac]))
    return DocResult(text=text, n_pieces=1, n_chars_main=len(text),
                     n_embedded_objects=_count_object_pool(ole))


def extract_doc_ole(ole, deadline: float | None = None) -> DocResult:
    """Word97 extraction over an Ole2File-like (including a ScopedOle view
    of an embedded document inside another compound file); Word 6/95
    binaries route to the flat-text legacy path."""
    names = set(ole.stream_names())
    if "WordDocument" not in names:
        raise KernelError("no WordDocument stream")
    wd = ole.read_stream("WordDocument")
    if len(wd) >= 0x20 and struct.unpack_from("<H", wd, 0)[0] == _FIB_MAGIC_OLD:
        return _extract_doc_legacy(wd, ole)
    if len(wd) < 0x01AA or struct.unpack_from("<H", wd, 0)[0] != _FIB_MAGIC:
        raise KernelError("bad FIB")
    flags = struct.unpack_from("<H", wd, 0x000A)[0]
    table_name = "1Table" if flags & 0x0200 else "0Table"
    if table_name not in names:
        # some writers only emit the other table stream
        table_name = "0Table" if "1Table" not in names else "1Table"
        if table_name not in names:
            raise KernelError("no table stream")
    table = ole.read_stream(table_name)
    fc_clx, lcb_clx = struct.unpack_from("<II", wd, 0x01A2)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise KernelError("missing/out-of-range Clx")
    clx = table[fc_clx : fc_clx + lcb_clx]

    # walk Clx: skip Prc (0x01) records, find Pcdt (0x02).
    # cb is unsigned per MS-DOC 2.9.209 (GrpPrl size); a signed read let a
    # crafted cb=0xFFFD stall the loop forever (i += 0). Unsigned means an
    # oversized cb overshoots len(clx) and the loop exits; the iteration cap
    # is a belt-and-braces forward-progress guard.
    i = 0
    plc = None
    iterations = 0
    while i < len(clx):
        iterations += 1
        if iterations > _MAX_PIECES:
            raise KernelError("Clx walk exceeded iteration cap")
        if (iterations & 0xFF) == 1:  # poll on the first record too
            check_deadline(deadline, "doc Clx walk")
        tag = clx[i]
        if tag == 0x01:  # Prc: 2-byte cb + data
            (cb,) = struct.unpack_from("<H", clx, i + 1)
            i += 3 + cb
        elif tag == 0x02:  # Pcdt: 4-byte lcb + PlcPcd
            (lcb,) = struct.unpack_from("<I", clx, i + 1)
            plc = clx[i + 5 : i + 5 + lcb]
            break
        else:
            raise KernelError(f"unknown Clx tag {tag}")
    if plc is None:
        raise KernelError("no Pcdt in Clx")

    # PlcPcd: n+1 CPs (u32) then n PCDs (8 bytes)
    n = (len(plc) - 4) // 12
    if n <= 0 or n > _MAX_PIECES:
        raise KernelError(f"implausible piece count {n}")
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    parts: list[str] = []
    for k in range(n):
        if (k & 0xFF) == 0:
            check_deadline(deadline, "doc piece assembly")
        pcd = plc[(n + 1) * 4 + k * 8 : (n + 1) * 4 + (k + 1) * 8]
        (fc_raw,) = struct.unpack_from("<I", pcd, 2)
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        n_chars = cps[k + 1] - cps[k]
        if n_chars <= 0:
            continue
        if compressed:
            start = fc // 2
            raw = wd[start : start + n_chars]
            parts.append(_decode_cp1252(raw))
        else:
            raw = wd[fc : fc + n_chars * 2]
            parts.append(raw.decode("utf-16-le", "replace"))
    full = "".join(parts)
    # FibRgLw97 subdocument char counts: ccpText @0x4C, ccpFtn @0x50,
    # ccpHdd @0x54 (header+footer stories). Zero/implausible values (old
    # or minimal writers) degrade to everything-is-main-text.
    ccp_text, ccp_ftn, ccp_hdd = struct.unpack_from("<III", wd, 0x004C)
    if not (0 < ccp_text <= len(full)
            and ccp_text + ccp_ftn + ccp_hdd <= len(full)):
        ccp_text, ccp_ftn, ccp_hdd = len(full), 0, 0
    main = _normalize(full[:ccp_text])
    ftn = _normalize(full[ccp_text : ccp_text + ccp_ftn])
    hdd = _normalize(full[ccp_text + ccp_ftn : ccp_text + ccp_ftn + ccp_hdd])
    tail = _normalize(full[ccp_text + ccp_ftn + ccp_hdd :])
    # embedded OLE objects: count ObjectPool sub-storages (one per 0x01
    # anchor); payload extraction of arbitrary embeds is out of kernel scope
    n_embedded = _count_object_pool(ole)
    return DocResult(text=main + ftn + hdd + tail, n_pieces=n,
                     n_chars_main=len(main), n_chars_footnotes=len(ftn),
                     n_chars_headers=len(hdd), n_embedded_objects=n_embedded)


@dataclass
class EmbeddedObject:
    """One ObjectPool member, normalized for dispatcher recursion.

    kind='bytes'   -> `data` holds an extractable raw payload (from an
                      \\x01Ole10Native packager record, a CONTENTS stream,
                      or a Package stream), `filename` when known.
    kind='storage' -> `storage` is the sub-storage DirEntry of an embedded
                      compound document (Workbook / WordDocument / ...);
                      wrap with ole2.ScopedOle to run the office kernels
                      tree-scoped (never a global name lookup).
    """
    name: str
    kind: str
    data: bytes | None = None
    storage: object | None = None
    filename: str | None = None


_MAX_EMBED_PAYLOAD = 64_000_000  # per-object cap (bomb posture)


def _parse_ole10native(raw: bytes) -> tuple[str | None, bytes | None]:
    """\\x01Ole10Native packager record (MS-OLEDS 2.3.6, the layout POI's
    Ole10Native and Tika's embedded-object path read): u32 total size,
    u16 flags, ASCIIZ label, ASCIIZ original path, u32 unknown/format,
    u32 temp-path length + ASCIIZ temp path, u32 data size, data."""
    if len(raw) < 8:
        return None, None
    try:
        # the leading u32 record size is advisory (real writers disagree
        # on whether it includes itself); every later read is bounds-
        # checked against len(raw) instead, so it is not consulted
        pos = 6  # skip size + flags
        z1 = raw.index(b"\x00", pos)
        label = _decode_cp1252(raw[pos:z1])
        pos = z1 + 1
        z2 = raw.index(b"\x00", pos)
        pos = z2 + 1
        pos += 4  # unknown/format dword
        (tmp_len,) = struct.unpack_from("<I", raw, pos)
        pos += 4
        if tmp_len > len(raw) - pos:
            return label or None, None
        pos += tmp_len
        (data_len,) = struct.unpack_from("<I", raw, pos)
        pos += 4
        if data_len > len(raw) - pos or data_len > _MAX_EMBED_PAYLOAD:
            return label or None, None
        return label or None, raw[pos : pos + data_len]
    except (ValueError, struct.error):
        return None, None


def embedded_objects(ole) -> list[EmbeddedObject]:
    """Normalize the ObjectPool sub-storages into extractable objects, in
    storage-name order. Unrecognized members (e.g. bare \\x01Ole anchors)
    are skipped — they carry no payload."""
    pool = next((e for e in ole.root_children()
                 if e.obj_type == 1 and e.name == "ObjectPool"), None)
    if pool is None:
        return []
    out: list[EmbeddedObject] = []
    for st in sorted((e for e in ole.storage_children(pool)
                      if e.obj_type == 1), key=lambda e: e.name):
        kids = {k.name: k for k in ole.storage_children(st)}
        kid_streams = {n for n, k in kids.items() if k.obj_type == 2}
        if "\x01Ole10Native" in kid_streams:
            fname, payload = _parse_ole10native(
                ole.read_entry(kids["\x01Ole10Native"]))
            if payload is not None:
                out.append(EmbeddedObject(st.name, "bytes", data=payload,
                                          filename=fname))
            continue
        if kid_streams & {"Workbook", "Book", "WordDocument",
                          "PowerPoint Document"}:
            out.append(EmbeddedObject(st.name, "storage", storage=st))
            continue
        for payload_stream in ("CONTENTS", "Package"):
            k = kids.get(payload_stream)
            if k is not None and k.obj_type == 2 and \
                    0 < k.size <= _MAX_EMBED_PAYLOAD:
                out.append(EmbeddedObject(st.name, "bytes",
                                          data=ole.read_entry(k)))
                break
    return out
