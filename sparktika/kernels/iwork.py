"""iWork '09 (Pages / Numbers / Keynote) package kernel.

Tika 1.20 parity: org.apache.tika.parser.iwork.IWorkPackageParser
(tika-parsers, reference build.gradle). An iWork '09 document is a ZIP
package holding an APXL XML index — ``index.apxl`` (Keynote) or
``index.xml`` (Pages/Numbers), either possibly gzip-compressed with a
``.gz`` suffix — plus ``buildVersionHistory.plist``. Detection (same
posture as Tika's) requires BOTH the plist and an index entry, so a
generic zip with a stray index.xml never misroutes.

The dialect comes from the index root element: ``sl:document`` Pages,
``ls:document`` Numbers, ``key:presentation`` Keynote. Text handling
(prefix-agnostic, per the public APXL observations Tika's parser
encodes):

- paragraph elements (local name ``p``) inside a ``text-body`` subtree
  emit one line each (Pages body, Keynote slide/notes text);
- Numbers cell text elements (local name ``ct``) contribute their
  ``s``-attribute value (the cell's string payload) as a line.

Newer single-file .pages/.key (iWork '13+, IWA/protobuf snappy) are a
different format entirely — they refuse with a clear reason rather
than emitting garbage.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass, field

from .errors import InflateRatioError, KernelError, check_deadline
from .ooxml import open_zip
from .xmlparse import local_name, xml_events

IWORK_MIMES = {
    "pages": "application/vnd.apple.pages",
    "numbers": "application/vnd.apple.numbers",
    "keynote": "application/vnd.apple.keynote",
}
_INDEX_NAMES = ("index.apxl", "index.apxl.gz", "index.xml",
                "index.xml.gz")
_MAX_PARAGRAPHS = 100_000


@dataclass
class IworkResult:
    kind: str
    text: str
    n_paragraphs: int = 0
    entries: list[str] = field(default_factory=list)
    truncated: bool = False


def sniff_iwork(data: bytes) -> bool:
    if data[:4] != b"PK\x03\x04":
        return False
    try:
        with open_zip(data) as zf:
            names = set(zf.namelist())
    except Exception:
        return False
    if "buildVersionHistory.plist" not in names:
        return False
    return any(n in names for n in _INDEX_NAMES)


def extract_iwork(
    data: bytes,
    max_chars: int = -1,
    max_ratio: float = 200.0,
    max_entry_bytes: int = 256_000_000,
    deadline: float | None = None,
) -> IworkResult:
    with open_zip(data) as zf:
        names = zf.namelist()
        index_name = next((n for n in _INDEX_NAMES if n in names), None)
        if index_name is None:
            raise KernelError("iwork: package has no index entry")
        info = zf.getinfo(index_name)
        if info.file_size > max_entry_bytes or \
                info.file_size > max_ratio * max(1, info.compress_size):
            raise InflateRatioError("iwork: index inflate guard tripped")
        raw = zf.read(index_name)
    if index_name.endswith(".gz"):
        d = gzip.GzipFile(fileobj=io.BytesIO(raw))
        raw = d.read(max_entry_bytes + 1)
        if len(raw) > max_entry_bytes:
            raise InflateRatioError("iwork: gz index exceeds entry cap")
    xtext = raw.decode("utf-8", "replace")

    kind: str | None = None
    lines: list[str] = []
    stack: list[str] = []
    text_body_depth = 0
    in_p = 0
    buf: list[str] = []
    n_par = 0
    truncated = False
    tick = 0

    from .entities import decode_entities

    for ev in xml_events(xtext, deadline=deadline):
        k = ev[0]
        tick += 1
        if tick % 2048 == 0:
            check_deadline(deadline, "iwork apxl walk")
        if k == "start":
            ln = local_name(ev[1])
            if not stack:
                kind = {"document": None, "presentation": "keynote"}.get(
                    ln, None)
                if ln == "document":
                    prefix = ev[1].split(":", 1)[0] if ":" in ev[1] else ""
                    kind = {"sl": "pages", "ls": "numbers"}.get(
                        prefix, "pages")
                elif ln == "presentation":
                    kind = "keynote"
                else:
                    raise KernelError(
                        f"iwork: unrecognized APXL root <{ev[1]}>")
            if ln == "ct":
                s = ev[2].get("sfa:s") or ev[2].get("s")
                if s and n_par < _MAX_PARAGRAPHS:
                    lines.append(decode_entities(s))
                    n_par += 1
                elif s:
                    truncated = True
            if ev[3]:
                continue
            if ln == "text-body":
                text_body_depth += 1
            elif ln == "p" and text_body_depth:
                in_p += 1
                if in_p == 1:
                    buf = []
            stack.append(ev[1])
        elif k == "end":
            if not stack:
                continue
            ln = local_name(stack[-1])
            stack.pop()
            if ln == "p" and in_p:
                in_p -= 1
                if in_p == 0:
                    t = "".join(buf).strip()
                    if t:
                        if n_par < _MAX_PARAGRAPHS:
                            lines.append(t)
                            n_par += 1
                        else:
                            truncated = True
            elif ln == "text-body" and text_body_depth:
                text_body_depth -= 1
        elif k in ("text", "cdata") and in_p:
            buf.append(decode_entities(ev[1]) if k == "text" else ev[1])

    text = "".join(ln + "\n" for ln in lines)
    if max_chars != -1 and len(text) > max_chars:
        text = text[:max_chars]
        truncated = True
    return IworkResult(kind=kind or "pages", text=text,
                       n_paragraphs=n_par, entries=names,
                       truncated=truncated)
