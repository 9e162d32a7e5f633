"""TrueType / OpenType font metadata — from scratch.

Tika 1.20 parity: org.apache.tika.parser.font.TrueTypeParser (PDFBox's
TrueTypeFont under the hood, reached by the reference via the
tika-parsers:1.20 jar — build.gradle) reports the font's family /
full / PostScript names and version. Built from the public OpenType
spec (the sfnt offset table, the 'name' table format 0, and 'maxp' for
the glyph count).

Name selection: Windows (platform 3, UTF-16BE) strings win over
Macintosh (platform 1, MacRoman≈latin-1) when both exist — the same
preference PDFBox applies. TTC collections report the FIRST font.
"""

from __future__ import annotations

import struct

from .errors import KernelError

_NAME_IDS = {1: "font-family", 2: "font-subfamily", 4: "font-name",
             5: "font-version", 6: "font-postscript-name"}
_MAX_TABLES = 64
_MAX_NAMES = 512


def is_font(data: bytes) -> bool:
    """Detection validator: the \\x00\\x01\\x00\\x00 sfnt magic is weak,
    so require a plausible table count and a printable first table tag
    (same belt-and-braces posture as is_arj / looks_like_dbf)."""
    if data[:4] == b"ttcf":
        return len(data) >= 16 and data[4:8] in (b"\x00\x01\x00\x00",
                                                 b"\x00\x02\x00\x00")
    if data[:4] not in (b"\x00\x01\x00\x00", b"OTTO", b"true"):
        return False
    if len(data) < 28:
        return False
    n_tables = struct.unpack_from(">H", data, 4)[0]
    if not 1 <= n_tables <= _MAX_TABLES:
        return False
    tag = data[12:16]
    return all(0x20 <= b <= 0x7E for b in tag)


def parse_font(data: bytes) -> dict[str, list[str]]:
    if data[:4] == b"wOFF":
        return _parse_woff(data)
    if data[:4] == b"wOF2":
        # WOFF2 table data is Brotli-compressed — no lib here and no
        # from-scratch decoder in scope; report the wrapped flavor and
        # refuse the body loudly (the VSD/WPD posture)
        if len(data) < 48:
            raise KernelError("font: truncated WOFF2 header")
        flavor = data[4:8]
        return {"Content-Type": ["application/font-woff2"],
                "font-flavor": ["cff" if flavor == b"OTTO"
                                else "truetype"],
                "body-refusal": ["WOFF2 tables are Brotli-compressed; "
                                 "no decoder available — names refused "
                                 "rather than guessed"]}
    if data[:4] == b"ttcf":
        if len(data) < 16:
            raise KernelError("font: truncated TTC header")
        n_fonts = struct.unpack_from(">I", data, 8)[0]
        if n_fonts < 1:
            raise KernelError("font: empty TTC")
        first = struct.unpack_from(">I", data, 12)[0]
        md = _parse_sfnt(data, first)
        md["font-collection-count"] = [str(n_fonts)]
        md["Content-Type"] = ["application/x-font-ttf"]
        return md
    return _parse_sfnt(data, 0)


def _parse_sfnt(data: bytes, base: int) -> dict[str, list[str]]:
    if base + 12 > len(data):
        raise KernelError("font: truncated offset table")
    sfnt = data[base: base + 4]
    if sfnt == b"\x00\x01\x00\x00" or sfnt == b"true":
        flavor, mime = "truetype", "application/x-font-ttf"
    elif sfnt == b"OTTO":
        flavor, mime = "cff", "application/x-font-otf"
    else:
        raise KernelError("font: bad sfnt version")
    n_tables = struct.unpack_from(">H", data, base + 4)[0]
    if not 1 <= n_tables <= _MAX_TABLES:
        raise KernelError(f"font: implausible table count {n_tables}")
    tables: dict[bytes, tuple[int, int]] = {}
    for i in range(n_tables):
        off = base + 12 + 16 * i
        if off + 16 > len(data):
            raise KernelError("font: truncated table directory")
        tag = data[off: off + 4]
        t_off, t_len = struct.unpack_from(">II", data, off + 8)
        if t_off + t_len > len(data):
            raise KernelError(f"font: table {tag!r} out of bounds")
        tables[tag] = (t_off, t_len)

    md: dict[str, list[str]] = {"Content-Type": [mime],
                                "font-flavor": [flavor]}
    if b"maxp" in tables:
        off, ln = tables[b"maxp"]
        if ln >= 6:
            md["font-glyphs"] = [str(struct.unpack_from(">H", data,
                                                        off + 4)[0])]
    if b"name" in tables:
        md.update(_parse_names(data, *tables[b"name"]))
    if "font-name" not in md and "font-family" not in md:
        raise KernelError("font: no usable name table")
    return md


def _parse_names(data: bytes, off: int, ln: int) -> dict[str, list[str]]:
    if ln < 6:
        return {}
    fmt, count, str_off = struct.unpack_from(">HHH", data, off)
    if fmt not in (0, 1):
        return {}
    count = min(count, _MAX_NAMES)
    # (name_id -> (priority, value)); Windows(3) beats Mac(1) beats rest
    best: dict[int, tuple[int, str]] = {}
    for i in range(count):
        roff = off + 6 + 12 * i
        if roff + 12 > off + ln or roff + 12 > len(data):
            break
        plat, enc, lang, nid, slen, soff = struct.unpack_from(
            ">HHHHHH", data, roff)
        if nid not in _NAME_IDS:
            continue
        start = off + str_off + soff
        if start + slen > len(data):
            continue
        raw = data[start: start + slen]
        if plat == 3:
            prio, val = 3, raw.decode("utf-16-be", "replace")
        elif plat == 0:
            prio, val = 2, raw.decode("utf-16-be", "replace")
        elif plat == 1:
            prio, val = 1, raw.decode("latin-1")
        else:
            prio, val = 0, raw.decode("latin-1")
        val = val.strip("\x00").strip()
        if val and (nid not in best or prio > best[nid][0]):
            best[nid] = (prio, val)
    return {_NAME_IDS[nid]: [v] for nid, (_, v) in best.items()}


def build_font(names: dict[int, str], n_glyphs: int = 10,
               flavor: bytes = b"\x00\x01\x00\x00") -> bytes:
    """Writer for synth/tests: sfnt with a 'name' table (Windows plat 3
    UTF-16BE records) and a 'maxp' stub."""
    recs = b""
    strings = b""
    for nid in sorted(names):
        s = names[nid].encode("utf-16-be")
        recs += struct.pack(">HHHHHH", 3, 1, 0x409, nid, len(s),
                            len(strings))
        strings += s
    name_tab = struct.pack(">HHH", 0, len(names),
                           6 + 12 * len(names)) + recs + strings
    maxp_tab = struct.pack(">IH", 0x00010000, n_glyphs) + b"\x00" * 26
    tabs = [(b"maxp", maxp_tab), (b"name", name_tab)]
    hdr = flavor + struct.pack(">HHHH", len(tabs), 16, 1, 0)
    off = 12 + 16 * len(tabs)
    dirent = b""
    body = b""
    for tag, tab in tabs:
        dirent += tag + struct.pack(">III", 0, off, len(tab))
        body += tab
        off += len(tab)
    return hdr + dirent + body


def build_ttc(fonts: list[bytes]) -> bytes:
    """TTC wrapper: table offsets inside member sfnts are FILE-absolute
    (per spec), so each member is rebuilt with its directory offsets
    shifted to its position in the collection."""
    hdr_len = 12 + 4 * len(fonts)
    out = bytearray(b"ttcf\x00\x01\x00\x00"
                    + struct.pack(">I", len(fonts)))
    pos = hdr_len
    offsets = []
    bodies = []
    for f in fonts:
        shifted = bytearray(f)
        n_tables = struct.unpack_from(">H", f, 4)[0]
        for i in range(n_tables):
            doff = 12 + 16 * i
            t_off = struct.unpack_from(">I", f, doff + 8)[0]
            struct.pack_into(">I", shifted, doff + 8, t_off + pos)
        offsets.append(pos)
        bodies.append(bytes(shifted))
        pos += len(f)
    for o in offsets:
        out += struct.pack(">I", o)
    for b in bodies:
        out += b
    return bytes(out)


def _parse_woff(data: bytes) -> dict[str, list[str]]:
    """WOFF 1.0 (public W3C spec): 44-byte header, 20-byte directory
    entries (tag, offset, compLength, origLength, checksum); tables
    are INDIVIDUALLY zlib-compressed when compLength < origLength —
    only 'name' and 'maxp' are ever inflated here."""
    import zlib

    if len(data) < 44:
        raise KernelError("font: truncated WOFF header")
    flavor = data[4:8]
    n_tables, = struct.unpack_from(">H", data, 12)
    if not 1 <= n_tables <= _MAX_TABLES:
        raise KernelError(f"font: implausible WOFF table count {n_tables}")
    wanted: dict[bytes, bytes] = {}
    for i in range(n_tables):
        off = 44 + 20 * i
        if off + 20 > len(data):
            raise KernelError("font: truncated WOFF directory")
        tag = data[off: off + 4]
        t_off, comp_len, orig_len = struct.unpack_from(">III", data,
                                                       off + 4)
        if tag not in (b"name", b"maxp"):
            continue
        if t_off + comp_len > len(data) or orig_len > (1 << 24):
            raise KernelError(f"font: WOFF table {tag!r} out of bounds")
        raw = data[t_off: t_off + comp_len]
        if comp_len < orig_len:
            try:
                raw = zlib.decompress(raw, zlib.MAX_WBITS, orig_len + 1)
            except zlib.error as exc:
                raise KernelError(f"font: WOFF table inflate failed "
                                  f"({exc})")
            if len(raw) != orig_len:
                raise KernelError("font: WOFF table size mismatch")
        wanted[tag] = raw
    md: dict[str, list[str]] = {
        "Content-Type": ["application/font-woff"],
        "font-flavor": ["cff" if flavor == b"OTTO" else "truetype"]}
    if b"maxp" in wanted and len(wanted[b"maxp"]) >= 6:
        md["font-glyphs"] = [str(struct.unpack_from(
            ">H", wanted[b"maxp"], 4)[0])]
    if b"name" in wanted:
        md.update(_parse_names(wanted[b"name"], 0, len(wanted[b"name"])))
    if "font-name" not in md and "font-family" not in md:
        raise KernelError("font: WOFF carries no usable name table")
    return md


def build_woff(names: dict[int, str], n_glyphs: int = 10,
               compress_name: bool = True) -> bytes:
    """Valid WOFF 1.0 wrapping the same name/maxp tables build_font
    emits."""
    import zlib

    sfnt = build_font(names, n_glyphs)
    # lift the two tables back out of the sfnt
    n_tables, = struct.unpack_from(">H", sfnt, 4)
    tables: list[tuple[bytes, bytes]] = []
    for i in range(n_tables):
        off = 12 + 16 * i
        tag = sfnt[off: off + 4]
        t_off, t_len = struct.unpack_from(">II", sfnt, off + 8)
        tables.append((tag, sfnt[t_off: t_off + t_len]))
    dir_area = bytearray()
    data_area = bytearray()
    base = 44 + 20 * len(tables)
    total_sfnt = 12 + 16 * len(tables)
    for tag, body in tables:
        comp = zlib.compress(body, 9) if compress_name else body
        if len(comp) >= len(body):
            comp = body
        t_off = base + len(data_area)
        dir_area += tag + struct.pack(">IIII", t_off, len(comp),
                                      len(body), 0)
        data_area += comp + b"\x00" * ((-len(comp)) % 4)
        total_sfnt += len(body) + ((-len(body)) % 4)
    header = (b"wOFF" + sfnt[:4]
              + struct.pack(">IHHIHHIIIII",
                            base + len(data_area), len(tables), 0,
                            total_sfnt, 1, 0, 0, 0, 0, 0, 0))
    assert len(header) == 44, len(header)
    return bytes(header + dir_area + data_area)
