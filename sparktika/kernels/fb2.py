"""FictionBook 2 (.fb2) kernel, from scratch.

Public FictionBook 2.x XML schema (fictionbook.org / the FBReader
ecosystem): root ``<FictionBook>``; ``<description><title-info>``
carries ``<book-title>``, ``<author>`` (first/middle/last name
children), ``<genre>``, ``<lang>``; the readable text lives in
``<body>`` elements as ``<section>`` trees of ``<p>``/``<v>``/
``<subtitle>``/``<title>`` paragraphs. E-book corpora carry .fb2
widely (it is the dominant Russian-language e-book format). Tika 1.20
has no FB2 parser — beyond reference parity; the generic XML route
would smear description metadata into the body, so the dedicated walk
keeps the text clean.

Rendering: each paragraph-like element inside <body> is one line;
sections separated like paragraphs; binary (base64 cover) elements
skipped. Guards: rides xml_events' deadline; paragraph cap.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .errors import KernelError
from .xmlparse import local_name, xml_events

FB2_MIME = "application/x-fictionbook+xml"

_PARA = {"p", "v", "subtitle", "text-author"}
_MAX_PARAS = 200_000


@dataclass
class Fb2Result:
    text: str = ""
    title: str | None = None
    authors: list[str] = field(default_factory=list)
    genres: list[str] = field(default_factory=list)
    lang: str | None = None
    n_sections: int = 0


def parse_fb2(s: str, deadline: float | None = None) -> Fb2Result:
    res = Fb2Result()
    lines: list[str] = []
    cur: list[str] | None = None
    body_depth = 0
    in_title_info = False
    capture: str | None = None     # description leaf being captured
    buf: list[str] = []
    author_parts: list[str] = []
    in_author = False
    saw_root = False
    for ev in xml_events(s, deadline=deadline):
        kind = ev[0]
        if kind == "start":
            name = local_name(ev[1])
            if not saw_root:
                if name != "FictionBook":
                    raise KernelError(
                        f"fb2: root element is <{name}>, not FictionBook")
                saw_root = True
            if ev[3]:  # self-closing
                if name == "empty-line" and body_depth and cur is not None:
                    cur.append("")
                continue
            if name == "body":
                body_depth += 1
            elif body_depth:
                if name == "section":
                    res.n_sections += 1
                elif name in _PARA or (name == "title" and cur is None):
                    if len(lines) > _MAX_PARAS:
                        raise KernelError("fb2: paragraph cap exceeded")
                    cur = []
            elif name == "title-info":
                in_title_info = True
            elif in_title_info:
                if name == "author":
                    in_author = True
                    author_parts = []
                elif name in ("book-title", "genre", "lang") or (
                        in_author and name.endswith("-name")):
                    capture = name
                    buf = []
        elif kind == "end":
            name = local_name(ev[1])
            if name == "body":
                body_depth = max(0, body_depth - 1)
            elif body_depth and (name in _PARA or name == "title"):
                if cur is not None:
                    line = "".join(cur).strip()
                    if line:
                        lines.append(line)
                    cur = None
            elif name == "title-info":
                in_title_info = False
            elif in_title_info and name == "author":
                in_author = False
                full = " ".join(p for p in author_parts if p)
                if full:
                    res.authors.append(full)
            elif capture and name == capture:
                val = "".join(buf).strip()
                if capture == "book-title":
                    res.title = val or None
                elif capture == "genre" and val:
                    res.genres.append(val)
                elif capture == "lang":
                    res.lang = val or None
                elif capture.endswith("-name") and val:
                    author_parts.append(val)
                capture = None
        elif kind in ("text", "cdata"):
            if cur is not None:
                from .entities import decode_entities

                cur.append(decode_entities(ev[1]) if kind == "text"
                           else ev[1])
            elif capture is not None:
                from .entities import decode_entities

                buf.append(decode_entities(ev[1]) if kind == "text"
                           else ev[1])
    if not saw_root:
        raise KernelError("fb2: no root element")
    res.text = "\n".join(lines)
    return res
