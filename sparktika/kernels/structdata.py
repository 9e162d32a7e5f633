"""JSON-LD (schema.org) structured-data extraction from HTML.

A web-scale training pipeline mines pages for machine-readable facts:
articles declare headline/author/datePublished, products declare
offers, sites declare their identity — all in
``<script type="application/ld+json">`` blocks (the schema.org
encouraged form; Tika itself stops at <meta> tags, this goes one step
further down the same public spec, JSON-LD 1.1 + schema.org).

Deliberately NOT wired into the extraction hot path: the HTML walker
discards script bodies by design (CLAUDE.md invariant 14 pins the
walker/meta-scanner equivalence), so this is a standalone scanner a
dedicated query runs over the raw payload. It tolerates the real-world
mess: multiple blocks, @graph arrays, top-level arrays, comments-free
strict JSON only (per spec), and unparseable blocks are counted, never
fatal.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .errors import check_deadline

_MAX_BLOCKS = 64
_MAX_BLOCK_BYTES = 1 << 20
_KEEP_KEYS = ("name", "headline", "url", "datePublished", "author")


@dataclass
class JsonLdResult:
    entities: list[dict] = field(default_factory=list)  # flattened
    n_blocks: int = 0
    n_bad_blocks: int = 0


def _script_blocks(html: str, deadline: float | None = None):
    """Yield the bodies of <script type="application/ld+json"> blocks.
    Case-insensitive, attribute-order-agnostic, quote-style-agnostic."""
    low = html.lower()
    pos = 0
    for _ in range(_MAX_BLOCKS * 4):
        check_deadline(deadline, "jsonld scan")
        i = low.find("<script", pos)
        if i == -1:
            return
        gt = low.find(">", i)
        if gt == -1:
            return
        tag = low[i:gt]
        pos = gt + 1
        if "ld+json" not in tag or "type" not in tag:
            continue
        end = low.find("</script", pos)
        if end == -1:
            return
        body = html[pos:end]
        pos = end + 9
        if len(body) <= _MAX_BLOCK_BYTES:
            yield body


def _flatten(node, out: list[dict]) -> None:
    if isinstance(node, list):
        for x in node:
            _flatten(x, out)
        return
    if not isinstance(node, dict):
        return
    if "@graph" in node and isinstance(node["@graph"], list):
        _flatten(node["@graph"], out)
    t = node.get("@type")
    if t is None:
        return
    if isinstance(t, list):
        t = t[0] if t else None
    ent = {"type": str(t)}
    for k in _KEEP_KEYS:
        v = node.get(k)
        if isinstance(v, dict):          # e.g. author: {"name": ...}
            v = v.get("name")
        if isinstance(v, list):
            v = v[0] if v else None
            if isinstance(v, dict):
                v = v.get("name")
        if isinstance(v, (str, int, float)) and str(v):
            ent[k] = str(v)
    out.append(ent)


def extract_jsonld(html: str,
                   deadline: float | None = None) -> JsonLdResult:
    res = JsonLdResult()
    for body in _script_blocks(html, deadline):
        if len(res.entities) >= _MAX_BLOCKS:
            break
        res.n_blocks += 1
        mark = len(res.entities)
        try:
            # RecursionError: json.loads and the recursive _flatten can
            # both blow the stack on pathologically nested blocks (a
            # 1 MB script allows ~500k nesting) — count as a bad block
            # instead of escaping the kernel (invariant 7); roll back any
            # partially flattened entities so output stays deterministic.
            node = json.loads(body)
            _flatten(node, res.entities)
        except (ValueError, RecursionError):
            del res.entities[mark:]
            res.n_bad_blocks += 1
            continue
    return res
