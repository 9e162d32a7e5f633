"""RTF kernel: control-word scanner -> plain text (from scratch, RTF 1.9.1
public spec / MS-RTF).

The reference delegates RTF to Tika's RTFParser (auto-detect path; the
reference repo carries no .rtf fixture — SURVEY.md §5). This kernel covers
the text-bearing core a web corpus hits:

- group state stack ({ ... }), destination skipping ({\\*\\...} and the
  known binary/metadata destinations: fonttbl, colortbl, pict, object, ...)
- control symbols (\\\\ \\{ \\} \\~ \\- \\_), \\'hh codepage bytes
  (\\ansicpg honored, cp1252 default), \\uN unicode with \\ucN fallback
  skipping, \\binN raw-byte skipping
- paragraph/line/cell/row -> \\n / \\t separators, matching the newline
  shape of the HTML kernel's writer output
- \\info > \\title captured as document title metadata

Robustness (invariant 7): malformed input degrades to best-effort text;
structural bombs are bounded by the input length (single forward scan,
\\bin skips are clamped); the per-document deadline is polled in the scan
loop like every other kernel.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field

from .errors import DeadlineError, KernelError

# Destinations whose content is never body text. {\*\...} additionally
# skips ANY unknown starred destination, per spec.
_SKIP_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "listtable", "listoverridetable",
    "pict", "object", "objdata", "themedata", "colorschememapping",
    "datastore", "latentstyles", "rsidtbl", "xmlnstbl", "generator",
    "fldinst", "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "ftnsep", "ftnsepc", "aftnsep",
    "aftnsepc", "revtbl", "bkmkstart", "bkmkend",
}

_CW_RE = re.compile(rb"([a-z]{1,32})(-?\d{1,10})? ?", re.I)


@dataclass
class RtfResult:
    text: str
    title: str | None = None
    metadata: dict[str, str] = field(default_factory=dict)


def extract_rtf(data: bytes, deadline: float | None = None,
                max_chars: int = -1) -> RtfResult:
    if not data.startswith(b"{\\rtf"):
        raise KernelError("not an RTF document (missing {\\rtf header)")
    codepage = "cp1252"
    out: list[str] = []
    title_parts: list[str] = []
    # group state: (uc_skip, skipping, in_info, in_title)
    stack: list[tuple[int, bool, bool, bool]] = []
    uc_skip, skipping, in_info, in_title = 1, False, False, False
    pending_uc_skip = 0  # fallback chars/bytes to swallow after \uN
    pending_high = None  # high surrogate awaiting its low half
    i, n = 0, len(data)
    tick = 0

    out_len = 0

    def emit(s: str):
        nonlocal pending_uc_skip, out_len
        if not s:
            return
        if pending_uc_skip:
            drop = min(pending_uc_skip, len(s))
            pending_uc_skip -= drop
            s = s[drop:]
            if not s:
                return
        if skipping:
            return
        if in_title:
            title_parts.append(s)
        elif not in_info:
            out.append(s)
            out_len += len(s)

    while i < n:
        tick += 1
        if deadline is not None and (tick & 0xFFF) == 0 and time.monotonic() > deadline:
            raise DeadlineError("rtf parse deadline exceeded")
        if max_chars != -1 and out_len > max_chars:
            break
        b = data[i]
        if b == 0x7B:  # {
            stack.append((uc_skip, skipping, in_info, in_title))
            i += 1
        elif b == 0x7D:  # }
            if stack:
                uc_skip, skipping, in_info, in_title = stack.pop()
            i += 1
        elif b == 0x5C:  # backslash
            nxt = data[i + 1 : i + 2]
            if nxt == b"'":
                raw = data[i + 2 : i + 4]
                i += 4
                try:
                    emit(bytes.fromhex(raw.decode("ascii")).decode(codepage, "replace"))
                except ValueError:
                    pass
            elif nxt in (b"\\", b"{", b"}"):
                emit(nxt.decode("ascii"))
                i += 2
            elif nxt == b"~":
                emit("\xa0"); i += 2
            elif nxt == b"_":
                emit("-"); i += 2
            elif nxt == b"-":
                i += 2  # optional hyphen: no text
            elif nxt == b"*":
                # starred destination: skip unless it is a known keeper
                skipping = True
                i += 2
            else:
                m = _CW_RE.match(data, i + 1)
                if not m:
                    i += 2  # lone backslash or control we don't model
                    continue
                word = m.group(1).decode("ascii").lower()
                param = int(m.group(2)) if m.group(2) else None
                i = m.end()
                if word == "u":
                    cp = param if param is not None else 0
                    if cp < 0:
                        cp += 65536
                    if not skipping and 0 < cp < 0x110000:
                        # surrogate halves (how RTF encodes non-BMP
                        # chars, as pairs of negative \uN) must COMBINE
                        # — a lone surrogate in the output is not UTF-8
                        # encodable and would kill the Arrow batch
                        # (r5 whole-repo review; entities.py posture)
                        if 0xD800 <= cp <= 0xDBFF:
                            pending_high = cp
                        elif 0xDC00 <= cp <= 0xDFFF:
                            if pending_high is not None:
                                emit(chr(0x10000
                                         + ((pending_high - 0xD800) << 10)
                                         + (cp - 0xDC00)))
                            pending_high = None
                        else:
                            pending_high = None
                            emit(chr(cp))
                    pending_uc_skip = uc_skip
                elif word == "uc":
                    uc_skip = max(0, param or 0)
                elif word == "ansicpg" and param:
                    try:
                        b"".decode(f"cp{param}")
                        codepage = f"cp{param}"
                    except LookupError:
                        pass
                elif word == "bin":
                    i += max(0, param or 0)  # clamped by loop bound
                elif word in ("par", "line", "row", "sect", "page"):
                    emit("\n")
                elif word in ("tab", "cell"):
                    emit("\t")
                elif word == "emdash":
                    emit("—")
                elif word == "endash":
                    emit("–")
                elif word in ("lquote", "rquote"):
                    emit("‘" if word == "lquote" else "’")
                elif word in ("ldblquote", "rdblquote"):
                    emit("“" if word == "ldblquote" else "”")
                elif word in _SKIP_DESTINATIONS:
                    skipping = True
                elif word == "info":
                    in_info = True
                elif word == "title":
                    if in_info:
                        in_title = True
                # all other control words are formatting: no text effect
        elif b in (0x0D, 0x0A, 0x00):
            i += 1  # raw CR/LF/NUL are not content in RTF
        else:
            j = i
            while j < n and data[j] not in (0x5C, 0x7B, 0x7D, 0x0D, 0x0A, 0x00):
                j += 1
            emit(data[i:j].decode(codepage, "replace"))
            i = j

    text = "".join(out)
    if max_chars != -1:
        text = text[:max_chars]
    title = "".join(title_parts).strip() or None
    md = {"Content-Type": "application/rtf"}
    if title:
        md["dc:title"] = title
        md["title"] = title
    return RtfResult(text=text, title=title, metadata=md)
