"""OpenDocument (odt/ods) kernel: zip container + content.xml walk.

The reference links all of tika-parsers:1.20 (tika-fork-main
build.gradle), whose OpenDocumentParser reads content.xml from the ODF
zip; rounds 1-2 had no ODF route (VERDICT r02 item 8). Semantics:

- odt: every ``text:p`` / ``text:h`` element renders as one line;
  ``text:tab`` -> TAB, ``text:line-break`` -> newline, ``text:s`` ->
  spaces (``text:c`` repeat attr, capped). Local names are matched
  prefix-agnostically (the prefix binding is the document's choice).
- ods: per ``table:table``: the table name line, then one line per
  ``table:table-row`` with cell texts joined by TAB (the xlsx kernel's
  rendering shape). Column-repeat attrs are honored with a cap.

Bomb posture (invariant 7): entry size/ratio guards before inflate,
repeat attrs capped, depth guard inherited from the XML event scanner.
"""

from __future__ import annotations

import io
import zipfile
from dataclasses import dataclass, field

from .errors import InflateRatioError, KernelError, check_deadline
from .xmlparse import local_name, xml_events

ODT_MIME = "application/vnd.oasis.opendocument.text"
ODS_MIME = "application/vnd.oasis.opendocument.spreadsheet"

_MAX_REPEAT = 1024


@dataclass
class OdfResult:
    text: str
    kind: str  # 'odt' | 'ods'
    n_paragraphs: int = 0
    n_tables: int = 0
    sheet_names: list[str] = field(default_factory=list)


def sniff_odf(data: bytes) -> str | None:
    """Return the ODF mimetype if the zip's `mimetype` entry declares one.
    Per the ODF spec the entry is STORED first, so its bytes sit in the
    first local file header — a cheap prefix check covers well-formed
    writers and the zipfile fallback covers the rest."""
    if data[:4] != b"PK\x03\x04":
        return None
    head = data[:256]
    if b"mimetype" in head:
        for m in (ODT_MIME, ODS_MIME):
            if m.encode() in head:
                return m
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            if "mimetype" in zf.namelist():
                mt = zf.read("mimetype")[:100].decode("ascii", "replace").strip()
                if mt in (ODT_MIME, ODS_MIME):
                    return mt
    except Exception:
        return None
    return None


def _read_entry(zf: zipfile.ZipFile, name: str, max_ratio: float,
                max_entry_bytes: int) -> bytes:
    info = zf.getinfo(name)
    cap = min(int(max(info.compress_size, 1024) * max_ratio),
              max_entry_bytes)
    with zf.open(name) as f:
        raw = f.read(cap + 1)
    if len(raw) > cap:
        raise InflateRatioError(
            f"ODF entry {name!r} exceeds inflate cap {cap}B")
    return raw


def extract_odf(
    data: bytes,
    max_ratio: float = 200.0,
    max_entry_bytes: int = 256_000_000,
    max_depth: int = 200,
    deadline: float | None = None,
) -> OdfResult:
    mime = sniff_odf(data)
    if mime is None:
        raise KernelError("not an ODF package (no ODF mimetype entry)")
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except Exception as e:
        raise KernelError(f"bad ODF zip: {e}") from e
    with zf:
        if "content.xml" not in zf.namelist():
            raise KernelError("ODF package has no content.xml")
        xml = _read_entry(zf, "content.xml", max_ratio, max_entry_bytes)
    text = xml.decode("utf-8", "replace")
    check_deadline(deadline, "odf content read")
    if mime == ODS_MIME:
        return _walk_ods(text, max_depth, deadline)
    return _walk_odt(text, max_depth, deadline)


def _walk_odt(xml: str, max_depth: int, deadline: float | None) -> OdfResult:
    lines: list[str] = []
    cur: list[str] | None = None
    depth = 0
    n_par = 0
    for ev in xml_events(xml, deadline=deadline):
        kind = ev[0]
        if kind == "start":
            name, attrs, self_closing = ev[1], ev[2], ev[3]
            ln = local_name(name)
            if not self_closing:
                depth += 1
                if depth > max_depth:
                    from .errors import DepthLimitError

                    raise DepthLimitError(
                        f"element nesting exceeded {max_depth}")
            if ln in ("p", "h") and cur is None:
                cur = []
            elif cur is not None:
                if ln == "tab":
                    cur.append("\t")
                elif ln == "line-break":
                    cur.append("\n")
                elif ln == "s":
                    try:
                        n = min(int(attrs.get("text:c", "1") or "1"),
                                _MAX_REPEAT)
                    except ValueError:
                        n = 1
                    cur.append(" " * max(n, 1))
        elif kind == "end":
            ln = local_name(ev[1])
            depth = max(depth - 1, 0)
            if ln in ("p", "h") and cur is not None:
                lines.append("".join(cur))
                n_par += 1
                cur = None
        elif kind in ("text", "cdata") and cur is not None:
            chunk = ev[1]
            if kind == "text":
                from .entities import decode_entities

                chunk = decode_entities(chunk)
            cur.append(chunk)
    text = "\n".join(lines)
    if text:
        text += "\n"
    return OdfResult(text=text, kind="odt", n_paragraphs=n_par)


def _walk_ods(xml: str, max_depth: int, deadline: float | None) -> OdfResult:
    out: list[str] = []
    sheet_names: list[str] = []
    n_tables = 0
    row_cells: list[str] | None = None
    cell: list[str] | None = None
    cell_repeat = 1
    in_p = False
    for ev in xml_events(xml, deadline=deadline):
        kind = ev[0]
        if kind == "start":
            name, attrs, self_closing = ev[1], ev[2], ev[3]
            ln = local_name(name)
            if ln == "table":
                n_tables += 1
                tname = attrs.get("table:name", f"Sheet{n_tables}")
                sheet_names.append(tname)
                out.append(tname)
            elif ln == "table-row":
                row_cells = []
            elif ln == "table-cell" and row_cells is not None:
                cell = []
                try:
                    cell_repeat = min(
                        int(attrs.get("table:number-columns-repeated",
                                      "1") or "1"), _MAX_REPEAT)
                except ValueError:
                    cell_repeat = 1
                if self_closing:
                    row_cells.extend([""] * cell_repeat)
                    cell = None
            elif ln == "p" and cell is not None:
                in_p = True
        elif kind == "end":
            ln = local_name(ev[1])
            if ln == "p":
                in_p = False
            elif ln == "table-cell" and cell is not None \
                    and row_cells is not None:
                row_cells.extend(["".join(cell)] * cell_repeat)
                cell = None
            elif ln == "table-row" and row_cells is not None:
                # trailing empty cells (column padding) are trimmed,
                # matching the xlsx kernel's sparse-row rendering
                while row_cells and row_cells[-1] == "":
                    row_cells.pop()
                if row_cells:
                    out.append("\t".join(row_cells))
                row_cells = None
        elif kind in ("text", "cdata") and cell is not None and in_p:
            chunk = ev[1]
            if kind == "text":
                from .entities import decode_entities

                chunk = decode_entities(chunk)
            cell.append(chunk)
    text = "\n".join(out)
    if text:
        text += "\n"
    return OdfResult(text=text, kind="ods", n_tables=n_tables,
                     sheet_names=sheet_names)
