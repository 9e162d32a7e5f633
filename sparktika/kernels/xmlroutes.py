"""Small XML-root refinements: AbiWord documents and GPX tracks.

Both ride the generic XML route's event scanner (kernels/xmlparse.py)
with root-element gating, the FB2 pattern:

- **AbiWord** (.abw, public AWML schema at abisource.com): body
  paragraphs are ``<p>`` (and ``<c>`` spans inside them) within
  ``<section>``; ``<metadata><m key="dc.title">`` carries the title,
  which must stay OUT of the body (the generic route smears it in).
- **GPX** (the public Topografix GPX 1.0/1.1 schema): a crawl of
  outdoor/fitness sites is full of .gpx — the value is structured
  counts (waypoints, track points, routes) and names, not prose; the
  body is the name list, one per line.

Tika 1.20 has neither route; beyond parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .entities import decode_entities
from .errors import KernelError
from .xmlparse import local_name, xml_events

ABW_MIME = "application/x-abiword"
GPX_MIME = "application/gpx+xml"

_ABW_PARA = {"p", "h"}
_MAX_ITEMS = 200_000


@dataclass
class AbwResult:
    text: str = ""
    title: str | None = None


def parse_abiword(s: str, deadline: float | None = None) -> AbwResult:
    res = AbwResult()
    lines: list[str] = []
    cur: list[str] | None = None
    meta_key: str | None = None
    buf: list[str] = []
    saw_root = False
    for ev in xml_events(s, deadline=deadline):
        kind = ev[0]
        if kind == "start":
            name = local_name(ev[1])
            if not saw_root:
                if name != "abiword":
                    raise KernelError(
                        f"abw: root element is <{name}>, not abiword")
                saw_root = True
            if ev[3]:
                continue
            if name in _ABW_PARA:
                if len(lines) > _MAX_ITEMS:
                    raise KernelError("abw: paragraph cap exceeded")
                cur = []
            elif name == "m":
                meta_key = ev[2].get("key")
                buf = []
        elif kind == "end":
            name = local_name(ev[1])
            if name in _ABW_PARA and cur is not None:
                line = "".join(cur).strip()
                if line:
                    lines.append(line)
                cur = None
            elif name == "m" and meta_key is not None:
                if meta_key == "dc.title":
                    res.title = "".join(buf).strip() or None
                meta_key = None
        elif kind in ("text", "cdata"):
            t = decode_entities(ev[1]) if kind == "text" else ev[1]
            if cur is not None:
                cur.append(t)
            elif meta_key is not None:
                buf.append(t)
    if not saw_root:
        raise KernelError("abw: no root element")
    res.text = "\n".join(lines)
    return res


@dataclass
class GpxResult:
    names: list[str] = field(default_factory=list)
    n_waypoints: int = 0
    n_trackpoints: int = 0
    n_routepoints: int = 0
    n_tracks: int = 0


def parse_gpx(s: str, deadline: float | None = None) -> GpxResult:
    res = GpxResult()
    capture = False
    buf: list[str] = []
    saw_root = False
    for ev in xml_events(s, deadline=deadline):
        kind = ev[0]
        if kind == "start":
            name = local_name(ev[1])
            if not saw_root:
                if name != "gpx":
                    raise KernelError(
                        f"gpx: root element is <{name}>, not gpx")
                saw_root = True
            if name == "wpt":
                res.n_waypoints += 1
            elif name == "trkpt":
                res.n_trackpoints += 1
            elif name == "rtept":
                res.n_routepoints += 1
            elif name == "trk":
                res.n_tracks += 1
            elif name == "name" and not ev[3]:
                capture = True
                buf = []
            total = (res.n_waypoints + res.n_trackpoints
                     + res.n_routepoints)
            if total > _MAX_ITEMS:
                raise KernelError("gpx: point cap exceeded")
        elif kind == "end":
            if local_name(ev[1]) == "name" and capture:
                nm = "".join(buf).strip()
                if nm and len(res.names) < 10_000:
                    res.names.append(nm)
                capture = False
        elif kind in ("text", "cdata") and capture:
            buf.append(decode_entities(ev[1]) if kind == "text" else ev[1])
    if not saw_root:
        raise KernelError("gpx: no root element")
    return res
