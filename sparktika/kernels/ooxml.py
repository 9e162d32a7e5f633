"""OOXML (.xlsx / .docx / .pptx) text extraction: zip + XML, from scratch.

Routes by part names inside the zip ([Content_Types].xml presence makes a
zip OOXML). XML handling is a lenient regex-level extraction (the OOXML
text model is element-text inside <t>/<w:t>/<a:t>), which keeps the kernel
dependency-free and bomb-resistant.

Output specs (ours, frozen in goldens):
- xlsx: per sheet in workbook order — sheet name line, then each row's
  cells tab-joined (shared strings + inline strings + numbers)
- docx: one line per <w:p> paragraph; header parts first, then the body,
  then footer parts (POI XWPFWordExtractor order), numeric part order
- pptx: per slide in numeric order, then notes slides in numeric order
  (POI SlideShowExtractor with notes) — one line per <a:p> paragraph

Zip bomb posture (mirrors the reference's zipBomb* guards,
ref: main/ConfigurableAutoDetectParser.java:41-52): per-entry and total
inflate caps enforced BEFORE reading (declared sizes) and re-checked
after; entry-count cap; nested containers handled by kernels/container.py
with the packageEntryDepth guard.
"""

from __future__ import annotations

import io
import re
import zipfile
from dataclasses import dataclass, field

from .entities import decode_entities
from .errors import InflateRatioError, KernelError

MAX_ENTRIES = 10_000


def open_zip(data: bytes) -> zipfile.ZipFile:
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except Exception as e:
        raise KernelError(f"bad zip: {e}") from e
    if len(zf.infolist()) > MAX_ENTRIES:
        raise KernelError(f"zip has more than {MAX_ENTRIES} entries")
    return zf


def read_entry(zf: zipfile.ZipFile, name: str, max_ratio: float,
               max_bytes: int) -> bytes:
    info = zf.getinfo(name)
    declared = info.file_size
    if declared > max_bytes:
        raise InflateRatioError(
            f"zip entry {name!r} declares {declared} bytes > cap {max_bytes}")
    if info.compress_size and declared > max_ratio * max(info.compress_size, 64):
        raise InflateRatioError(
            f"zip entry {name!r} inflate ratio {declared / max(info.compress_size, 1):.0f} "
            f"exceeds cap {max_ratio}")
    with zf.open(name) as f:
        out = f.read(max_bytes + 1)
    if len(out) > max_bytes:
        raise InflateRatioError(f"zip entry {name!r} exceeded cap while reading")
    return out


def zip_declared_mimetype(data: bytes) -> str | None:
    """Value of a conforming OCF/ODF `mimetype` entry: FIRST local file
    header, name exactly 'mimetype' (parsed at offset 30 from the header
    fields — a coincidental substring hit elsewhere in the head never
    routes; ADVICE r3), STORED, small. None when absent/nonconforming —
    callers fall back to a real zipfile entry read."""
    if data[:4] != b"PK\x03\x04" or len(data) < 38:
        return None
    flags = int.from_bytes(data[6:8], "little")
    method = int.from_bytes(data[8:10], "little")
    size = int.from_bytes(data[18:22], "little")
    nlen = int.from_bytes(data[26:28], "little")
    elen = int.from_bytes(data[28:30], "little")
    if nlen != 8 or data[30:38] != b"mimetype":
        return None
    if method != 0 or flags & 0x8:  # must be STORED, no data descriptor
        return None
    if not 0 < size <= 256:
        return None
    start = 38 + elen
    return data[start:start + size].decode("ascii", "replace").strip() or None


def is_ooxml(zf: zipfile.ZipFile) -> str | None:
    names = set(zf.namelist())
    if "[Content_Types].xml" not in names:
        return None
    if "xl/workbook.xml" in names:
        return "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
    if "xl/workbook.bin" in names:  # XLSB binary hybrid (MS-XLSB)
        return "application/vnd.ms-excel.sheet.binary.macroenabled.12"
    if "word/document.xml" in names:
        return "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
    if any(n.startswith("ppt/slides/slide") for n in names):
        return "application/vnd.openxmlformats-officedocument.presentationml.presentation"
    return "application/vnd.openxmlformats-officedocument"


_T_RE = re.compile(r"<(?:\w+:)?t(?:\s[^>]*)?>(.*?)</(?:\w+:)?t>", re.DOTALL)
_WT_RE = re.compile(r"<w:t(?:\s[^>]*)?>(.*?)</w:t>", re.DOTALL)
_AT_RE = re.compile(r"<a:t(?:\s[^>]*)?>(.*?)</a:t>", re.DOTALL)
_P_SPLIT_W = re.compile(r"</w:p>")
_P_SPLIT_A = re.compile(r"</a:p>")
_SHEET_RE = re.compile(
    r'<sheet\s[^>]*name="([^"]*)"[^>]*r:id="(rId\d+)"|<sheet\s[^>]*r:id="(rId\d+)"[^>]*name="([^"]*)"')
_REL_RE = re.compile(r'<Relationship\s[^>]*Id="(rId\d+)"[^>]*Target="([^"]*)"|'
                     r'<Relationship\s[^>]*Target="([^"]*)"[^>]*Id="(rId\d+)"')
_ROW_RE = re.compile(r"<row[\s>].*?</row>", re.DOTALL)
# matches both <c ...>body</c> and self-closing <c .../> (empty cell —
# must still occupy a column so tab-joined rows stay aligned)
_C_FULL_RE = re.compile(r'<c\b([^>]*?)(?:/>|>(.*?)</c>)', re.DOTALL)
_V_RE = re.compile(r"<v>(.*?)</v>", re.DOTALL)
_IS_RE = re.compile(r"<is>(.*?)</is>", re.DOTALL)


@dataclass
class OoxmlResult:
    text: str
    kind: str
    metadata: dict[str, str] = field(default_factory=dict)


def _core_props(zf: zipfile.ZipFile, max_ratio: float, max_bytes: int) -> dict[str, str]:
    meta: dict[str, str] = {}
    if "docProps/core.xml" in zf.namelist():
        raw = read_entry(zf, "docProps/core.xml", max_ratio, max_bytes).decode("utf-8", "replace")
        for tag, key in (("dc:title", "dc:title"), ("dc:creator", "dc:creator"),
                         ("cp:lastModifiedBy", "lastModifiedBy")):
            m = re.search(rf"<{tag}[^>]*>(.*?)</{tag}>", raw, re.DOTALL)
            if m:
                meta[key] = decode_entities(m.group(1)).strip()
    return meta


def _fmt_xlsx_number(s: str) -> str:
    try:
        v = float(s)
    except ValueError:
        return s
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def extract_xlsx(data: bytes, max_ratio: float = 200.0,
                 max_bytes: int = 256_000_000) -> OoxmlResult:
    zf = open_zip(data)
    names = set(zf.namelist())
    # shared strings
    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        raw = read_entry(zf, "xl/sharedStrings.xml", max_ratio, max_bytes).decode("utf-8", "replace")
        for m in re.finditer(r"<si>(.*?)</si>", raw, re.DOTALL):
            shared.append(decode_entities("".join(_T_RE.findall(m.group(1)))))
    # sheet order + rel targets
    wb = read_entry(zf, "xl/workbook.xml", max_ratio, max_bytes).decode("utf-8", "replace")
    rels_raw = ""
    if "xl/_rels/workbook.xml.rels" in names:
        rels_raw = read_entry(zf, "xl/_rels/workbook.xml.rels", max_ratio, max_bytes).decode("utf-8", "replace")
    rels: dict[str, str] = {}
    for m in _REL_RE.finditer(rels_raw):
        rid = m.group(1) or m.group(4)
        target = m.group(2) or m.group(3)
        if rid and target:
            # absolute OPC targets ('/xl/worksheets/sheet1.xml') are
            # legal and must not be re-prefixed (r5 review: the sheet
            # silently vanished as 'xl//xl/...')
            if target.startswith("/"):
                rels[rid] = target.lstrip("/")
            else:
                rels[rid] = (target if target.startswith("xl/")
                             else f"xl/{target}")
    sheets: list[tuple[str, str]] = []
    for m in _SHEET_RE.finditer(wb):
        name = m.group(1) or m.group(4)
        rid = m.group(2) or m.group(3)
        target = rels.get(rid, "")
        if target:
            sheets.append((name or target, target))
    if not sheets:  # fallback: positional
        sheets = [(f"Sheet{i+1}", n) for i, n in enumerate(sorted(
            x for x in names if x.startswith("xl/worksheets/sheet")))]

    parts: list[str] = []
    for name, target in sheets:
        if target not in names:
            continue
        raw = read_entry(zf, target, max_ratio, max_bytes).decode("utf-8", "replace")
        parts.append(name)
        for row_m in _ROW_RE.finditer(raw):
            cells: list[str] = []
            for cm in _C_FULL_RE.finditer(row_m.group(0)):
                attrs, body = cm.group(1), cm.group(2)
                if body is None:  # self-closing <c/>: empty cell, keep column
                    cells.append("")
                    continue
                t_m = re.search(r'\bt="(\w+)"', attrs)
                ctype = t_m.group(1) if t_m else "n"
                if ctype == "s":
                    vm = _V_RE.search(body)
                    idx = int(vm.group(1)) if vm and vm.group(1).isdigit() else -1
                    cells.append(shared[idx] if 0 <= idx < len(shared) else "")
                elif ctype == "inlineStr":
                    im = _IS_RE.search(body)
                    cells.append(decode_entities("".join(_T_RE.findall(im.group(1))))
                                 if im else "")
                elif ctype == "b":
                    vm = _V_RE.search(body)
                    cells.append("TRUE" if vm and vm.group(1) == "1" else "FALSE")
                else:
                    vm = _V_RE.search(body)
                    cells.append(_fmt_xlsx_number(decode_entities(vm.group(1))) if vm else "")
            if any(c for c in cells):
                parts.append("\t".join(cells))
    text = "\n".join(parts) + ("\n" if parts else "")
    return OoxmlResult(text=text, kind="xlsx",
                       metadata=_core_props(zf, max_ratio, max_bytes))


def _w_paras(raw: str) -> list[str]:
    out = []
    for chunk in _P_SPLIT_W.split(raw):
        t = decode_entities("".join(_WT_RE.findall(chunk)))
        if t.strip():
            out.append(t)
    return out


def extract_docx(data: bytes, max_ratio: float = 200.0,
                 max_bytes: int = 256_000_000) -> OoxmlResult:
    """Body + header/footer parts. Part order follows POI's
    XWPFWordExtractor (Tika's DOCX path): headers first, then the document
    body, then footers; multiple header/footer parts in numeric order.
    Absent parts cost nothing (namelist check, no speculative reads)."""
    zf = open_zip(data)
    names = zf.namelist()

    def parts(pattern: str) -> list[str]:
        rx = re.compile(pattern)
        found = sorted((int(m.group(1)), n)
                       for n in names if (m := rx.match(n)))
        out: list[str] = []
        for _, name in found:
            raw = read_entry(zf, name, max_ratio, max_bytes).decode("utf-8", "replace")
            out.extend(_w_paras(raw))
        return out

    body_raw = read_entry(zf, "word/document.xml", max_ratio, max_bytes).decode("utf-8", "replace")
    paras = (parts(r"word/header(\d+)\.xml$") + _w_paras(body_raw)
             + parts(r"word/footer(\d+)\.xml$"))
    text = "\n".join(paras) + ("\n" if paras else "")
    return OoxmlResult(text=text, kind="docx",
                       metadata=_core_props(zf, max_ratio, max_bytes))


def extract_pptx(data: bytes, max_ratio: float = 200.0,
                 max_bytes: int = 256_000_000) -> OoxmlResult:
    zf = open_zip(data)
    names = zf.namelist()
    paras: list[str] = []
    for pattern in (r"ppt/slides/slide(\d+)\.xml$",
                    r"ppt/notesSlides/notesSlide(\d+)\.xml$"):
        rx = re.compile(pattern)
        found = sorted((int(m.group(1)), n)
                       for n in names if (m := rx.match(n)))
        for _, name in found:
            raw = read_entry(zf, name, max_ratio, max_bytes).decode("utf-8", "replace")
            for chunk in _P_SPLIT_A.split(raw):
                t = decode_entities("".join(_AT_RE.findall(chunk)))
                if t.strip():
                    paras.append(t)
    text = "\n".join(paras) + ("\n" if paras else "")
    return OoxmlResult(text=text, kind="pptx",
                       metadata=_core_props(zf, max_ratio, max_bytes))
