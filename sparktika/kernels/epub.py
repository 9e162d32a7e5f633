"""EPUB kernel: OCF container -> OPF package -> spine-ordered XHTML.

Tika 1.20 (linked wholesale by the reference, tika-fork-main
build.gradle) routes EPUB through EpubParser: each spine document's
XHTML body text in reading order, with the package title as metadata.
Structure (public EPUB/OCF specs):

- zip whose ``mimetype`` entry is ``application/epub+zip`` (STORED
  first per OCF, same cheap prefix sniff as ODF),
- ``META-INF/container.xml`` names the OPF package file,
- the OPF carries ``dc:title``, a manifest (id -> href), and the spine
  (ordered idrefs); hrefs resolve relative to the OPF's directory.

Degrades gracefully: a missing container/OPF falls back to extracting
every .xhtml/.html entry in zip order (still useful text, never a
crash). Bomb posture (invariant 7): per-entry inflate ratio/size caps,
spine item count cap, HTML walk inherits its own depth guards.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass, field

from .errors import KernelError, check_deadline
from .ooxml import open_zip, read_entry
from .xmlparse import local_name, xml_events

EPUB_MIME = "application/epub+zip"

_MAX_SPINE_ITEMS = 1000


@dataclass
class EpubResult:
    text: str
    title: str | None = None
    n_spine: int = 0
    entries: list[str] = field(default_factory=list)
    truncated: bool = False  # a chapter hit the write limit, or the
    #                          char budget ran out with chapters left


def sniff_epub(data: bytes) -> bool:
    """Conforming OCF packages (mimetype STORED first) are decided from
    the first local file header alone — the header's name field must be
    exactly 'mimetype' (ADVICE r3: a substring hit in the head never
    routes); nonconforming writers get a real zipfile entry read."""
    if data[:4] != b"PK\x03\x04":
        return False
    from .ooxml import zip_declared_mimetype

    mt = zip_declared_mimetype(data)
    if mt is not None:
        return mt == EPUB_MIME
    try:
        with open_zip(data) as zf:
            names = zf.namelist()
            if "mimetype" in names:
                return zf.read("mimetype")[:64].strip() == EPUB_MIME.encode()
    except Exception:
        return False
    return False


def _opf_path(container_xml: str) -> str | None:
    for ev in xml_events(container_xml):
        if ev[0] == "start" and local_name(ev[1]) == "rootfile":
            return ev[2].get("full-path")
    return None


def _parse_opf(opf_xml: str) -> tuple[str | None, list[str]]:
    """(dc:title, spine hrefs in reading order)."""
    title: str | None = None
    in_title = False
    title_parts: list[str] = []
    manifest: dict[str, str] = {}
    spine_ids: list[str] = []
    for ev in xml_events(opf_xml):
        kind = ev[0]
        if kind == "start":
            ln = local_name(ev[1])
            if ln == "title" and title is None:
                in_title = True
            elif ln == "item":
                iid, href = ev[2].get("id"), ev[2].get("href")
                if iid and href:
                    manifest[iid] = href
            elif ln == "itemref":
                ref = ev[2].get("idref")
                if ref:
                    spine_ids.append(ref)
        elif kind == "end" and local_name(ev[1]) == "title" and in_title:
            in_title = False
            t = " ".join("".join(title_parts).split())
            title = t or None
        elif kind in ("text", "cdata") and in_title:
            title_parts.append(ev[1])
    return title, [manifest[i] for i in spine_ids if i in manifest]


def extract_epub(
    data: bytes,
    max_chars: int = -1,
    max_ratio: float = 200.0,
    max_entry_bytes: int = 256_000_000,
    max_depth: int = 200,
    deadline: float | None = None,
) -> EpubResult:
    from .htmlparse import parse_html

    if not sniff_epub(data):
        raise KernelError("not an EPUB package")
    with open_zip(data) as zf:
        names = set(zf.namelist())
        title: str | None = None
        docs: list[str] = []
        if "META-INF/container.xml" in names:
            container = read_entry(zf, "META-INF/container.xml",
                                    max_ratio, max_entry_bytes)
            opf_path = _opf_path(container.decode("utf-8", "replace"))
            if opf_path and opf_path in names:
                opf = read_entry(zf, opf_path, max_ratio, max_entry_bytes)
                title, hrefs = _parse_opf(opf.decode("utf-8", "replace"))
                base = posixpath.dirname(opf_path)
                from urllib.parse import unquote

                for href in hrefs[:_MAX_SPINE_ITEMS]:
                    # OPF hrefs are URLs: strip fragments and percent-
                    # decode before matching zip entry names (r5 review
                    # — encoded hrefs silently dropped their chapters)
                    clean = unquote(href.split("#", 1)[0])
                    p = posixpath.normpath(posixpath.join(base, clean))
                    if p not in names:
                        p = posixpath.normpath(posixpath.join(base, href))
                    if p in names:
                        docs.append(p)
        if not docs:  # no/broken OPF: every XHTML entry in zip order
            docs = [n for n in zf.namelist()
                    if n.lower().endswith((".xhtml", ".html", ".htm"))
                    ][:_MAX_SPINE_ITEMS]
        parts: list[str] = []
        truncated = False
        budget = max_chars
        for idx, name in enumerate(docs):
            check_deadline(deadline, "epub spine walk")
            raw = read_entry(zf, name, max_ratio, max_entry_bytes)
            r = parse_html(raw.decode("utf-8", "replace"),
                           max_chars=budget, max_depth=max_depth,
                           extract_links=False, collect_blocks=False,
                           deadline=deadline)
            parts.append(r.text)
            if r.write_limit_reached:
                truncated = True
                break
            if budget != -1:
                budget -= len(r.text)
                if budget <= 0:
                    # budget consumed exactly: only a truncation if
                    # chapters (i.e. real content) remain unread
                    truncated = idx + 1 < len(docs)
                    break
    return EpubResult(text="".join(parts), title=title,
                      n_spine=len(docs), entries=docs, truncated=truncated)
