"""MHTML (MIME-encapsulated saved web page) kernel, from scratch.

RFC 2557 (MIME Encapsulation of Aggregate Documents, such as HTML):
a ``multipart/related`` message whose root part is the page's HTML and
whose sibling parts are the page's resources (images, CSS, scripts),
each addressed by a ``Content-Location`` header. Browsers write these
as ``.mht`` / ``.mhtml`` "save page as single file" output, so crawls
of shared-drive corpora carry them. Tika 1.20 parity: its mimetypes
registry detects ``multipart/related`` and parses via the rfc822
machinery; this kernel goes further and renders the root HTML through
the repo's own walker.

Reuses the RFC 822/2045/2046 primitives from kernels/eml.py (header
parse, line-anchored boundary split per RFC 2046 §5.1.1,
content-transfer-encoding decode) — one multipart implementation, no
drift.

- body: every text/html part through the HTML walker (root first,
  honoring quoted-printable/base64 CTE); text/plain parts verbatim
- title: the first HTML part's <title>
- metadata: snapshot content location (the saved page's original URL),
  per-resource content locations + types, resource count
- guards: part/depth caps ride the shared eml limits; decode errors
  degrade to status rows (invariant 7)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .eml import _content_type, _decode_body, _parse_headers
from .errors import KernelError

MHTML_MIME = "multipart/related"

_MAX_PARTS = 512


@dataclass
class MhtmlResult:
    text: str = ""
    title: str | None = None
    snapshot_location: str | None = None
    n_resources: int = 0
    resource_locations: list[str] = field(default_factory=list)
    resource_types: list[str] = field(default_factory=list)


def is_multipart_related(data: bytes) -> bool:
    """True when the top-level header block declares multipart/related
    (the mhtml shape). Called only after sniff_eml accepted the head,
    so the header parse is on a known message-shaped payload. The
    window is generous (256 KB) so a saved page with kilobytes of X-*
    headers before Content-Type doesn't fall off a size cliff into the
    plain-email route (r8 review).

    r9 (ADVICE): every rfc822-sniffed document used to pay the full
    header parse here just to be told it is a plain email. A cheap
    C-speed substring prefilter on the bare token b"multipart" (a
    single RFC 2045 token, so header folding can never split it —
    filtering on the full "multipart/related" could) rejects the
    dominant plain-email case before any parsing; multipart/mixed
    emails still pay the parse, which is the price of exactness."""
    head = data[:262144]
    if b"multipart" not in head and b"MULTIPART" not in head.upper():
        return False
    try:
        headers, _ = _parse_headers(head)
    except Exception:
        return False
    ctype, _ = _content_type(headers)
    return ctype == "multipart/related"


def extract_mhtml(data: bytes, deadline: float | None = None) -> MhtmlResult:
    import time

    headers, body = _parse_headers(data)
    ctype, params = _content_type(headers)
    if ctype != "multipart/related":
        raise KernelError(f"mhtml: top-level type is {ctype}")
    boundary = params.get("boundary")
    if not boundary:
        raise KernelError("mhtml: multipart/related without boundary")
    res = MhtmlResult()
    subj = headers.get("subject")
    if subj:
        from .eml import _decode_encoded_words

        res.title = _decode_encoded_words(subj[0]) or None
    snap = headers.get("snapshot-content-location")
    if snap:
        res.snapshot_location = snap[0]
    from .eml import split_multipart

    texts: list[str] = []
    n_parts = 0
    for part in split_multipart(body, boundary):
        n_parts += 1
        if n_parts > _MAX_PARTS:
            raise KernelError("mhtml: part cap exceeded")
        if deadline is not None and time.monotonic() > deadline:
            from .errors import DeadlineError

            raise DeadlineError("mhtml parse deadline exceeded")
        ph, pb = _parse_headers(part)
        ptype, pparams = _content_type(ph)
        loc = (ph.get("content-location") or [None])[0]
        if res.snapshot_location is None and ptype == "text/html" and loc:
            res.snapshot_location = loc
        charset = pparams.get("charset", "utf-8")
        if ptype == "text/html":
            from .htmlparse import parse_html

            html = _decode_body(pb, ph, charset)
            r = parse_html(html, extract_links=False, collect_blocks=False,
                           deadline=deadline)
            texts.append(r.text.strip("\n"))
            if res.title is None and r.title:
                res.title = r.title
        elif ptype == "text/plain":
            texts.append(_decode_body(pb, ph, charset).strip("\r\n"))
        else:
            res.n_resources += 1
            if loc:
                res.resource_locations.append(loc)
            res.resource_types.append(ptype)
    res.text = "\n\n".join(t for t in texts if t)
    return res
