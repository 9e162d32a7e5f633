"""Minimal PDF text extraction: content-stream tokenizer + layout reassembly.

From-scratch equivalent of the reference's PDF path (Tika 1.20 ->
PDFBox; ref parser dispatch at main/TikaForkMain.java:299-332). Scope is
the grammar of the reference fixture `pdf-sample.pdf` (PDF 1.3,
FlateDecode streams) plus our synthesized corpus:

- object scan (no xref dependency — robust to linearized files)
- stream extraction with /FlateDecode (zlib) behind a decompression-ratio
  bomb guard (ref: zipBombCompressionRatio=200,
  main/ConfigurableAutoDetectParser.java:41-52)
- text operators: BT ET Tf Td TD Tm TL T* Tj TJ ' "
- strings: (literal with escapes + nesting) and <hex>
- WinAnsiEncoding byte -> unicode mapping (cp1252-style table)
- TJ kerning: offsets <= -180/1000 em render as a space
- layout reassembly in EMISSION ORDER (PDFTextStripper's default,
  sortByPosition=false — what the reference's Tika/PDFBox path does):
  a y-change starts a new line; a same-line x-gap wider than ~0.3em
  (font-size-aware estimate) inserts a space

/Info dictionary Title/Author/Creator/Producer are returned as metadata.
"""

from __future__ import annotations

import re
import time
import zlib
from dataclasses import dataclass, field

from .errors import DeadlineError, InflateRatioError, KernelError

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_INFO_KEY_RE = re.compile(rb"/(Title|Author|Creator|Producer|Subject)\s*\(")

# WinAnsi (cp1252) high-byte table; identical to charset._CP1252_HIGH but kept
# local so the kernel stays standalone.
_WINANSI_HIGH = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…", 0x86: "†",
    0x87: "‡", 0x88: "ˆ", 0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“", 0x94: "”", 0x95: "•",
    0x96: "–", 0x97: "—", 0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}

_ESCAPES = {
    b"n"[0]: "\n", b"r"[0]: "\r", b"t"[0]: "\t", b"b"[0]: "\b",
    b"f"[0]: "\f", b"("[0]: "(", b")"[0]: ")", b"\\"[0]: "\\",
}


def _winansi(data: bytes) -> str:
    return "".join(_WINANSI_HIGH.get(b, chr(b)) for b in data)


@dataclass
class PdfResult:
    text: str
    metadata: dict[str, str] = field(default_factory=dict)
    n_streams: int = 0


def _inflate(data: bytes, max_ratio: float, max_bytes: int) -> bytes:
    cap = min(int(max(len(data), 64) * max_ratio), max_bytes)
    d = zlib.decompressobj()
    try:
        out = d.decompress(data, cap)
    except zlib.error as e:
        raise KernelError(f"flate error: {e}") from e
    if d.unconsumed_tail:
        raise InflateRatioError(
            f"inflate exceeded ratio cap {max_ratio} (cap {cap} bytes)")
    return out


def _parse_literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ( ) literal string starting at the '('. Returns (text, next_i)."""
    assert data[i : i + 1] == b"("
    i += 1
    depth = 1
    out: list[str] = []
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal \ooo (1-3 digits)
                j = i
                while j < n and j - i < 3 and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(_winansi(bytes([int(data[i:j], 8) & 0xFF])))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(_winansi(bytes([e])))
                i += 1
        elif b == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif b == 0x29:  # )
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(")")
            i += 1
        else:
            out.append(_winansi(bytes([b])))
            i += 1
    return "".join(out), i


def _parse_hex_string(data: bytes, i: int) -> tuple[str, int]:
    end = data.find(b">", i + 1)
    if end == -1:
        end = len(data)
    hx = re.sub(rb"\s", b"", data[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    try:
        raw = bytes.fromhex(hx.decode("ascii"))
    except ValueError:
        raw = b""
    return _winansi(raw), end + 1


_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")
_NAME_RE = re.compile(rb"/[^\s()<>\[\]{}/%]*")
_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


def _tokenize_content(data: bytes, deadline: float | None):
    """Yield ('num', float) | ('str', text) | ('name', bytes) | ('op', bytes)
    | ('arr_open',) | ('arr_close',)."""
    i, n = 0, len(data)
    tick = 0
    while i < n:
        tick += 1
        if deadline is not None and (tick & 0x3FF) == 0 and time.monotonic() > deadline:
            raise DeadlineError("pdf parse deadline exceeded")
        b = data[i]
        if b in b" \t\r\n\x0c\x00":
            i += 1
        elif b == 0x25:  # % comment
            j = data.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif b == 0x28:  # (
            s, i = _parse_literal_string(data, i)
            yield ("str", s)
        elif b == 0x3C:  # < — hex string or dict
            if data[i + 1 : i + 2] == b"<":
                i += 2  # ignore inline dicts in content streams
            else:
                s, i = _parse_hex_string(data, i)
                yield ("str", s)
        elif b == 0x3E:  # > (dict close)
            i += 1
        elif b == 0x5B:
            yield ("arr_open",)
            i += 1
        elif b == 0x5D:
            yield ("arr_close",)
            i += 1
        elif b == 0x2F:
            m = _NAME_RE.match(data, i)
            yield ("name", m.group(0))
            i = m.end()
        else:
            m = _NUM_RE.match(data, i)
            if m:
                yield ("num", float(m.group(0)))
                i = m.end()
                continue
            m = _OP_RE.match(data, i)
            if m:
                yield ("op", m.group(0))
                i = m.end()
            else:
                i += 1


def _extract_text_spans(content: bytes, deadline: float | None) -> list[tuple[float, float, float, str]]:
    """Run the text operators; return (y, x, font_size, text) spans in
    emission order."""
    spans: list[tuple[float, float, float, str]] = []
    x = y = 0.0           # current text position
    lx = ly = 0.0         # line start
    leading = 0.0
    size = 12.0           # current font size (Tf)
    stack: list = []      # operand stack (numbers / strings / arrays)
    arrays: list[list] = []
    in_text = False

    def emit(s: str):
        nonlocal x
        if s:
            spans.append((y, x, size, s))
            # average Helvetica-ish glyph width ~0.5em: advance estimate so
            # consecutive same-line spans get gap-based space insertion
            x += 0.5 * size * len(s)

    for tok in _tokenize_content(content, deadline):
        kind = tok[0]
        if kind == "arr_open":
            arrays.append([])
        elif kind == "arr_close":
            if arrays:
                stack.append(arrays.pop())
        elif kind in ("num", "str", "name"):
            val = tok[1]
            if arrays:
                arrays[-1].append((kind, val))
            else:
                stack.append((kind, val))
        elif kind == "op":
            op = tok[1]
            if op == b"BT":
                in_text = True
                x = y = lx = ly = 0.0
            elif op == b"ET":
                in_text = False
            elif op == b"Tf" and stack:
                size = _num(stack[-1]) or size
            elif op == b"TL" and stack:
                leading = _num(stack[-1])
            elif op == b"Td" and len(stack) >= 2:
                tx, ty = _num(stack[-2]), _num(stack[-1])
                lx, ly = lx + tx, ly + ty
                x, y = lx, ly
            elif op == b"TD" and len(stack) >= 2:
                tx, ty = _num(stack[-2]), _num(stack[-1])
                leading = -ty
                lx, ly = lx + tx, ly + ty
                x, y = lx, ly
            elif op == b"Tm" and len(stack) >= 6:
                e, f = _num(stack[-2]), _num(stack[-1])
                lx, ly = e, f
                x, y = e, f
            elif op == b"T*":
                lx, ly = lx, ly - leading
                x, y = lx, ly
            elif op == b"Tj" and in_text:
                if stack and stack[-1][0] == "str":
                    emit(stack[-1][1])
            elif op == b"'" and in_text:
                lx, ly = lx, ly - leading
                x, y = lx, ly
                if stack and stack[-1][0] == "str":
                    emit(stack[-1][1])
            elif op == b'"' and in_text:
                lx, ly = lx, ly - leading
                x, y = lx, ly
                if stack and stack[-1][0] == "str":
                    emit(stack[-1][1])
            elif op == b"TJ" and in_text:
                if stack and isinstance(stack[-1], list):
                    parts: list[str] = []
                    for k, v in stack[-1]:
                        if k == "str":
                            parts.append(v)
                        elif k == "num" and v <= -180:
                            parts.append(" ")
                    emit("".join(parts))
            stack.clear()
    return spans


def _num(item) -> float:
    return item[1] if isinstance(item, tuple) and item[0] == "num" else 0.0


def assemble_lines(spans: list[tuple[float, float, float, str]], y_tol: float = 0.5) -> str:
    """Assemble spans in emission order (PDFTextStripper default): a y
    change beyond y_tol starts a new line; within a line, an x gap wider
    than ~0.3em of the current font inserts a single space. Output ends
    with a newline when any text was emitted."""
    if not spans:
        return ""
    parts: list[str] = []
    last_y: float | None = None
    last_end = 0.0
    for yv, xv, sz, txt in spans:
        if last_y is None:
            pass
        elif abs(yv - last_y) > y_tol:
            parts.append("\n")
        elif xv - last_end > 0.3 * sz and parts and not parts[-1].endswith(" ") \
                and not txt.startswith(" "):
            parts.append(" ")
        parts.append(txt)
        last_y = yv
        last_end = xv + 0.5 * sz * len(txt)
    return "".join(parts) + "\n"


def _parse_info(raw: bytes) -> dict[str, str]:
    meta: dict[str, str] = {}
    for m in _INFO_KEY_RE.finditer(raw):
        key = m.group(1).decode("ascii")
        val, _ = _parse_literal_string(raw, m.end() - 1)
        if key not in meta:
            meta[key] = val
    return meta


def extract_pdf(
    data: bytes,
    max_inflate_ratio: float = 200.0,
    max_inflate_bytes: int = 256_000_000,
    deadline: float | None = None,
) -> PdfResult:
    if not data.startswith(b"%PDF-"):
        raise KernelError("not a PDF (missing %PDF- header)")
    version = data[5:8].decode("ascii", "replace")
    spans: list[tuple[float, float, str]] = []
    n_streams = 0
    for om in _OBJ_RE.finditer(data):
        body = om.group(3)
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        head = body[: sm.start()]
        raw = sm.group(1)
        if b"/FlateDecode" in head:
            raw = _inflate(raw, max_inflate_ratio, max_inflate_bytes)
        elif b"/Filter" in head:
            continue  # unsupported filter: skip stream, keep the doc alive
        n_streams += 1
        if b"BT" in raw:
            spans.extend(_extract_text_spans(raw, deadline))
    text = assemble_lines(spans)
    meta = _parse_info(data)
    meta["pdf:version"] = version
    return PdfResult(text=text, metadata=meta, n_streams=n_streams)
