"""Charset detection + decode. Output is always UTF-8 text, like the
reference (main/TikaConstants.java:9-10 pins defaultOutputEncoding=UTF-8
regardless of source charset; its HTML fixture declares iso-8859-1).

Detection order (from-scratch, public heuristics):
  1. BOM (UTF-8 / UTF-16 LE+BE / UTF-32 LE+BE)
  2. <meta charset=..> / <meta http-equiv=Content-Type content="..;charset=..">
     scanned in the first 1024 bytes (WHATWG-style prescan)
  3. BOM-less UTF-16 null-pattern heuristic (ICU CharsetRecog_Unicode
     style): ASCII-heavy UTF-16 shows NUL in every other byte with a
     strongly one-sided parity; requires >=40% NULs on one parity and
     <5% on the other over the first 1024 bytes
  4. strict UTF-8 validation
  5. windows-1252 fallback (superset of iso-8859-1 for the printable range)
"""

from __future__ import annotations

import codecs
import re

_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

_META_CHARSET = re.compile(
    rb"""<meta[^>]{0,512}?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]{2,32})""",
    re.IGNORECASE | re.DOTALL,
)

# Aliases seen in the wild -> python codec names.
_ALIASES = {
    "iso-8859-1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "us-ascii": "us-ascii",
    "ascii": "us-ascii",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "iso-8859-15": "iso-8859-15",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "euc-jp": "euc_jp",
    "gbk": "gbk",
    "gb2312": "gbk",
    "big5": "big5",
    "koi8-r": "koi8-r",
    "windows-1251": "windows-1251",
}

# windows-1252 0x80-0x9F row (undefined bytes fall back to the C1 control
# codepoint, matching lenient browser behavior).
_CP1252_HIGH = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…", 0x86: "†",
    0x87: "‡", 0x88: "ˆ", 0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“", 0x94: "”", 0x95: "•",
    0x96: "–", 0x97: "—", 0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}
# precomputed translate map (hot path: every non-UTF-8 text doc lands
# here; rebuilding the dict per call measured ~20x slower in pdf.py's
# twin — r5 whole-repo review)
_CP1252_TRANS = str.maketrans(_CP1252_HIGH)


def _decode_cp1252(data: bytes) -> str:
    return data.decode("latin-1").translate(_CP1252_TRANS)


def detect_bom(data: bytes) -> tuple[str, int] | None:
    """Return (codec, bom_length) if a BOM is present."""
    for bom, name in _BOMS:
        if data.startswith(bom):
            return name, len(bom)
    return None


def detect_meta_charset(data: bytes) -> str | None:
    m = _META_CHARSET.search(data[:1024])
    if not m:
        return None
    name = m.group(1).decode("ascii", "replace").lower()
    return _ALIASES.get(name)


def detect_utf16_heuristic(data: bytes) -> str | None:
    """BOM-less UTF-16 detection via the null-byte parity pattern (the
    signal ICU's CharsetRecog_UTF_16 family keys on): Latin-script UTF-16
    text has ~50% NUL bytes, all on one parity. Returns the codec name or
    None. Deliberately conservative — mixed binaries rarely show a clean
    one-sided parity split."""
    sample = data[:1024]
    sample = sample[: len(sample) & ~1]  # even length: clean parity halves
    if len(sample) < 16:
        return None
    even = sample[0::2].count(0)
    odd = sample[1::2].count(0)
    half = len(sample) // 2
    if odd >= 0.4 * half and even <= 0.05 * half:
        return "utf-16-le"  # NULs in high bytes of LE code units
    if even >= 0.4 * half and odd <= 0.05 * half:
        return "utf-16-be"
    return None


def is_valid_utf8(data: bytes) -> bool:
    try:
        data.decode("utf-8", "strict")
        return True
    except UnicodeDecodeError:
        return False


def detect_charset(data: bytes, is_html: bool = True) -> str:
    """Charset name per the detection order in the module docstring."""
    bom = detect_bom(data)
    if bom:
        return bom[0]
    if is_html:
        meta = detect_meta_charset(data)
        if meta:
            return meta
    utf16 = detect_utf16_heuristic(data)
    if utf16:
        return utf16
    if is_valid_utf8(data):
        return "utf-8"
    return "windows-1252"


def decode(data: bytes, charset: str | None = None, is_html: bool = True) -> tuple[str, str]:
    """Decode bytes -> (unicode text, charset used). Never raises: undecodable
    bytes are replaced (lenient, like browser behavior)."""
    cs = charset or detect_charset(data, is_html=is_html)
    bom = detect_bom(data)
    if bom:
        data = data[bom[1]:]
    if cs == "windows-1252":
        return _decode_cp1252(data), cs
    try:
        return data.decode(cs, "replace"), cs
    except LookupError:
        return _decode_cp1252(data), "windows-1252"
