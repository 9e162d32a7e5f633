"""Old Excel (BIFF2/3/4/5) text extraction — from scratch.

Tika 1.20 parity: pre-BIFF8 workbooks route to POI's
``OldExcelExtractor`` (reached by the reference via tika-parsers:1.20,
tika-fork-main/build.gradle:24), which walks the old record stream and
emits text cells, cached formula values, and (BIFF5) sheet names.
Built from the PUBLIC OpenOffice.org "Microsoft Excel File Format"
documentation (the same source the BIFF8 kernel cites) — record ids,
BOF shapes, and the per-version cell layouts are all in its §5.

Version routing:

- BIFF2 (BOF id 0x0009), BIFF3 (0x0209), BIFF4 (0x0409): RAW streams
  (no OLE2 wrapper) — one implicit sheet.
- BIFF5/7 (BOF id 0x0809, version word 0x0500): lives in an OLE2
  ``Book`` stream; BOUNDSHEET records carry byte-string sheet names
  and point at per-sheet sub-streams. kernels/xls.py detects the BOF
  version word and hands the stream here.

Cell records per version (old layouts — 3-byte cell attributes in
BIFF2, 2-byte XF index from BIFF3 on):

- BIFF2: INTEGER 0x0002, NUMBER 0x0003, LABEL 0x0004, BOOLERR 0x0005,
  FORMULA 0x0006 (cached f64 result).
- BIFF3/4: NUMBER 0x0203, LABEL 0x0204, BOOLERR 0x0205, RK 0x027E,
  FORMULA 0x0206/0x0406 (+ STRING 0x0207 for cached text results).
- BIFF5: the BIFF3/4 set plus RSTRING 0x00D6, MULRK 0x00BD,
  LABELSST/SST do not exist yet.

Numbers render through the BIFF8 kernel's general formatter
(_fmt_number) — old FORMAT-record mapping is deliberately out of
scope (documented simplification; the corpus pins raw values). Text
layout mirrors the BIFF8 kernel (tab-indented cells, newline rows,
sheet-name headings) so .xls output is shape-consistent across eras.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .errors import KernelError, check_deadline
from .xls import _decode_rk, _fmt_number

_BOF_VERSIONS = {0x0009: 2, 0x0209: 3, 0x0409: 4}
_EOF = 0x000A
_BOUNDSHEET = 0x0085


@dataclass
class OldXlsResult:
    text: str
    sheet_names: list[str] = field(default_factory=list)
    n_cells: int = 0
    biff_version: int = 0


def is_old_biff(data: bytes) -> bool:
    """Raw BIFF2/3/4 stream: a BOF record at offset 0 with a plausible
    length and document-type word (worksheet/chart/macro)."""
    if len(data) < 8:
        return False
    op, ln = struct.unpack_from("<HH", data, 0)
    if op not in _BOF_VERSIONS or not 4 <= ln <= 16:
        return False
    dt, = struct.unpack_from("<H", data, 6)
    return dt in (0x0010, 0x0020, 0x0040, 0x0100)


def _records(data: bytes, deadline: float | None):
    pos = 0
    n = 0
    while pos + 4 <= len(data):
        n += 1
        if (n & 0xFF) == 0:
            check_deadline(deadline, "old-biff record walk")
        op, ln = struct.unpack_from("<HH", data, pos)
        payload = data[pos + 4: pos + 4 + ln]
        if len(payload) < ln:
            return  # truncated tail: keep what we have
        yield op, payload, pos
        pos += 4 + ln


def _byte_string(payload: bytes, off: int, wide_len: bool) -> str:
    """Old-BIFF byte string: u8 or u16 length, cp1252 bytes."""
    if wide_len:
        n = struct.unpack_from("<H", payload, off)[0]
        off += 2
    else:
        n = payload[off]
        off += 1
    return payload[off: off + n].decode("cp1252", "replace")


def _scan_cells(records, biff: int, put, deadline: float | None) -> None:
    """One sheet sub-stream's cell records → put(row, col, text)."""
    pending_string: tuple[int, int] | None = None
    for op, payload, _ in records:
        try:
            if biff == 2:
                if op == 0x0004:                       # LABEL
                    r, c = struct.unpack_from("<HH", payload, 0)
                    put(r, c, _byte_string(payload, 7, wide_len=False))
                elif op == 0x0003:                     # NUMBER
                    r, c = struct.unpack_from("<HH", payload, 0)
                    v, = struct.unpack_from("<d", payload, 7)
                    put(r, c, _fmt_number(v))
                elif op == 0x0002:                     # INTEGER
                    r, c = struct.unpack_from("<HH", payload, 0)
                    v, = struct.unpack_from("<H", payload, 7)
                    put(r, c, _fmt_number(float(v)))
                elif op == 0x0005:                     # BOOLERR
                    r, c = struct.unpack_from("<HH", payload, 0)
                    bval, is_err = payload[7], payload[8]
                    if not is_err:
                        put(r, c, "TRUE" if bval else "FALSE")
                elif op == 0x0006 and len(payload) >= 15:  # FORMULA
                    r, c = struct.unpack_from("<HH", payload, 0)
                    v, = struct.unpack_from("<d", payload, 7)
                    put(r, c, _fmt_number(v))
                continue
            # BIFF3/4/5 share the 2-byte-XF layouts
            if op == 0x0204 or (biff == 5 and op == 0x00D6):  # LABEL/RSTRING
                r, c = struct.unpack_from("<HH", payload, 0)
                put(r, c, _byte_string(payload, 6, wide_len=True))
            elif op == 0x0203:                         # NUMBER
                r, c = struct.unpack_from("<HH", payload, 0)
                v, = struct.unpack_from("<d", payload, 6)
                put(r, c, _fmt_number(v))
            elif op == 0x027E:                         # RK
                r, c, _xf, rk = struct.unpack_from("<HHHI", payload, 0)
                put(r, c, _fmt_number(_decode_rk(rk)))
            elif op == 0x00BD and biff == 5:           # MULRK
                r, c0 = struct.unpack_from("<HH", payload, 0)
                c_last, = struct.unpack_from("<H", payload, len(payload) - 2)
                for k in range(c_last - c0 + 1):
                    _xf, rk = struct.unpack_from("<HI", payload, 4 + k * 6)
                    put(r, c0 + k, _fmt_number(_decode_rk(rk)))
            elif op == 0x0205:                         # BOOLERR
                r, c, _xf, bval, is_err = struct.unpack_from(
                    "<HHHBB", payload, 0)
                if not is_err:
                    put(r, c, "TRUE" if bval else "FALSE")
            elif op in (0x0006, 0x0206, 0x0406) and len(payload) >= 14:
                r, c = struct.unpack_from("<HH", payload, 0)
                result = payload[6:14]
                if result[6:8] == b"\xff\xff":
                    if result[0] == 0:                 # string follows
                        pending_string = (r, c)
                    elif result[0] == 1:
                        put(r, c, "TRUE" if result[2] else "FALSE")
                else:
                    v, = struct.unpack_from("<d", payload, 6)
                    put(r, c, _fmt_number(v))
            elif op in (0x0007, 0x0207) and pending_string is not None:
                r, c = pending_string
                put(r, c, _byte_string(payload, 0, wide_len=(op == 0x0207)))
                pending_string = None
        except (struct.error, IndexError):
            continue  # malformed record: skip cell, keep the sheet alive


def _render(sheets: list[tuple[str, dict[int, dict[int, str]]]]) -> str:
    out: list[str] = []
    for name, cells in sheets:
        if out:
            out.append("\n")
        if name:
            out.append(name)
            out.append("\n")
        for r in sorted(cells):
            row = cells[r]
            out.append("".join("\t" + row[c] for c in sorted(row)))
            out.append("\n")
        out.append("\n\n\n")
    return "".join(out)


def extract_old_biff_raw(data: bytes,
                         deadline: float | None = None) -> OldXlsResult:
    """Raw BIFF2/3/4 single-sheet stream (no OLE2 wrapper)."""
    if not is_old_biff(data):
        raise KernelError("old-biff: no BOF record at offset 0")
    op, = struct.unpack_from("<H", data, 0)
    biff = _BOF_VERSIONS[op]
    cells: dict[int, dict[int, str]] = {}
    n = 0

    def put(r: int, c: int, v: str):
        nonlocal n
        cells.setdefault(r, {})[c] = v
        n += 1

    _scan_cells(_records(data, deadline), biff, put, deadline)
    return OldXlsResult(text=_render([("", cells)]), sheet_names=[],
                        n_cells=n, biff_version=biff)


def extract_biff5_book(wb: bytes,
                       deadline: float | None = None) -> OldXlsResult:
    """BIFF5/7 ``Book`` stream from an OLE2 wrapper: globals BOUNDSHEET
    walk, then per-sheet cell sub-streams (the BIFF8 two-pass shape)."""
    sheets: list[tuple[int, str]] = []
    for op, payload, _ in _records(wb, deadline):
        if op == _BOUNDSHEET and len(payload) >= 8:
            pos_bof, = struct.unpack_from("<I", payload, 0)
            name = _byte_string(payload, 6, wide_len=False)
            sheets.append((pos_bof, name))
        elif op == _EOF:
            break  # end of the globals sub-stream
    if not sheets:
        # degenerate: a Book stream with no BOUNDSHEET (Excel 5 chart
        # or a single-sheet writer) — scan the whole stream as one sheet
        sheets = [(0, "")]
    rendered: list[tuple[str, dict[int, dict[int, str]]]] = []
    names: list[str] = []
    n_total = 0
    bounds = sorted(off for off, _ in sheets) + [len(wb)]
    for pos_bof, name in sheets:
        end = next((b for b in bounds if b > pos_bof), len(wb))
        cells: dict[int, dict[int, str]] = {}
        n = 0

        def put(r: int, c: int, v: str):
            nonlocal n
            cells.setdefault(r, {})[c] = v
            n += 1

        _scan_cells(_records(wb[pos_bof:end], deadline), 5, put, deadline)
        rendered.append((name, cells))
        if name:
            names.append(name)
        n_total += n
    return OldXlsResult(text=_render(rendered), sheet_names=names,
                        n_cells=n_total, biff_version=5)
