"""Visio VSD kernel — metadata-first, from scratch.

Tika 1.20 parity target: org.apache.tika.parser.microsoft.OfficeParser
routes OLE2 files whose root holds a `VisioDocument` stream (the same
test Tika's POIFSContainerDetector uses) to POI's HDGF text extractor.
HDGF decodes the stream body with a Visio-specific LZW VARIANT whose
exact divergences from standard LZW (initial dictionary contents,
code packing, flag layout) are documented nowhere public except the
POI implementation itself — reconstructing it from memory of that code
would risk silently garbled text past any oracle (the PST-permute /
WordPerfect caution, CLAUDE.md round-6 notes). So this kernel is
deliberately METADATA-FIRST:

- verifies the public on-disk facts: OLE2 container, `VisioDocument`
  root stream, the ASCII `Visio (TM) Drawing` signature line that
  leads the stream in every Visio binary format;
- surfaces the signature text, stream size, and the standard OLE2
  \\x05SummaryInformation / \\x05DocumentSummaryInformation property
  sets ([MS-OLEPS], shared olemeta reader) — title/author/company etc.
  are stored UNCOMPRESSED and extract faithfully;
- refuses the compressed body with an explicit, queryable
  `body-refusal` metadata entry instead of emitting garbage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .errors import KernelError

_SIGNATURE = b"Visio (TM) Drawing"
VSD_MIME = "application/vnd.visio"

BODY_REFUSAL = ("HDGF LZW-variant compressed body; decoder not "
                "derivable from public specs — refused by design")


@dataclass
class VisioResult:
    signature: str
    stream_bytes: int
    summary: dict[str, object] = field(default_factory=dict)
    docsum: dict[str, object] = field(default_factory=dict)


def extract_visio(ole, deadline: float | None = None) -> VisioResult:
    """ole: Ole2File (or ScopedOle) whose root carries VisioDocument."""
    from .olemeta import extract_ole_properties

    names = {e.name for e in ole.root_children() if e.obj_type == 2}
    if "VisioDocument" not in names:
        raise KernelError("visio: no VisioDocument root stream")
    vd = ole.read_stream("VisioDocument")
    if not vd.startswith(_SIGNATURE):
        raise KernelError("visio: VisioDocument stream lacks the "
                          "'Visio (TM) Drawing' signature")
    # the signature line runs to \r\n in every observed layout; cap the
    # scan so a corrupt stream can't bloat metadata
    head = vd[:64]
    end = head.find(b"\r")
    sig = (head[:end] if end > 0 else head[:len(_SIGNATURE)]).decode(
        "latin-1", "replace")
    summary, docsum = extract_ole_properties(ole)
    return VisioResult(signature=sig, stream_bytes=len(vd),
                       summary=summary, docsum=docsum)
