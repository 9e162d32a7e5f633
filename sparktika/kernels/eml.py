"""RFC 822/5322 email kernel with MIME multipart walking (from scratch).

The reference delegates message/rfc822 to Tika's RFC822Parser (Tika 1.20
parser set per tika-fork-main/build.gradle; the reference repo carries no
.eml fixture — SURVEY.md §5). Scope:

- header block: CRLF/LF tolerant, continuation-line unfolding, repeated
  headers kept as lists; encoded-words (=?charset?B|Q?..?=) decoded in
  Subject/From/To/Cc
- body: recursive multipart/* walk (boundary split, depth-capped),
  content-transfer-encoding base64 / quoted-printable / 7bit / 8bit,
  charset from the Content-Type parameter (cp1252 fallback)
- text/plain parts emitted verbatim; text/html parts routed through the
  HTML kernel (body text only); other leaf parts counted as attachments
  (filename recorded, content skipped)
- rendering mirrors the msg kernel's shape: subject + From/To/Cc/Date
  header block, then part texts

Robustness (invariant 7): malformed structure degrades to best-effort
text; depth/size guards bound recursion; never raises on content (the
dispatcher backstop catches structural surprises).
"""

from __future__ import annotations

import base64
import binascii
import quopri
import re
from dataclasses import dataclass, field

_MAX_DEPTH = 10
_MAX_PARTS = 1000

# Headers that identify an email for MIME sniffing (two distinct ones
# required, so ordinary "Key: value" prose lines never misroute).
SNIFF_HEADERS = (
    b"received", b"from", b"return-path", b"delivered-to", b"message-id",
    b"date", b"subject", b"mime-version", b"to", b"cc", b"sender",
    b"reply-to", b"dkim-signature", b"content-type",
)

_HEADER_LINE_RE = re.compile(rb"^([!-9;-~]+):[ \t]?(.*)$")
_ENCODED_WORD_RE = re.compile(r"=\?([^?]+)\?([bBqQ])\?([^?]*)\?=")


def sniff_eml(data: bytes) -> bool:
    """True when the head of the payload looks like an RFC 822 header
    block: the FIRST header-shaped line must be a well-known header (an
    email starts with its header block — prose that merely quotes
    headers further down never misroutes), plus >=2 distinct known names
    in the first 20 lines."""
    seen = set()
    first_header = True
    for line in data[:4096].splitlines()[:20]:
        m = _HEADER_LINE_RE.match(line)
        if not m:
            if not line.strip():
                break  # header block ended
            if first_header:
                return False  # leading prose: not a message head
            continue
        name = m.group(1).lower()
        if first_header:
            if name not in SNIFF_HEADERS:
                return False
            first_header = False
        if name in SNIFF_HEADERS or name.startswith(b"x-"):
            seen.add(name)
        if len(seen) >= 2:
            return True
    return False


@dataclass
class EmlResult:
    text: str
    subject: str | None
    metadata: dict[str, str] = field(default_factory=dict)
    n_parts: int = 0
    n_attachments: int = 0
    attachment_names: list[str] = field(default_factory=list)


def _decode_encoded_words(s: str) -> str:
    def repl(m: re.Match) -> str:
        charset, kind, payload = m.group(1), m.group(2).lower(), m.group(3)
        try:
            raw = (base64.b64decode(payload + "===") if kind == "b"
                   else quopri.decodestring(payload.replace("_", " ").encode()))
            return raw.decode(charset.split("*")[0], "replace")
        except (binascii.Error, LookupError, ValueError):
            return m.group(0)

    # adjacent encoded words are joined without the intervening whitespace
    s = re.sub(r"\?=[ \t]+=\?", "?==?", s)
    return _ENCODED_WORD_RE.sub(repl, s)


def _parse_headers(data: bytes) -> tuple[dict[str, list[str]], bytes]:
    """Returns ({lower-name: [values...]}, body_bytes)."""
    headers: dict[str, list[str]] = {}
    pos = 0
    n = len(data)
    current: tuple[str, list[bytes]] | None = None

    def flush():
        if current is not None:
            name, chunks = current
            val = b" ".join(c.strip() for c in chunks).decode("utf-8", "replace")
            headers.setdefault(name, []).append(val)

    while pos < n:
        eol = data.find(b"\n", pos)
        line = data[pos: n if eol == -1 else eol].rstrip(b"\r")
        next_pos = n if eol == -1 else eol + 1
        if not line:
            pos = next_pos
            break  # blank line = end of headers
        if line[:1] in (b" ", b"\t") and current is not None:
            current[1].append(line)
        else:
            m = _HEADER_LINE_RE.match(line)
            if m:
                flush()
                current = (m.group(1).decode("ascii", "replace").lower(),
                           [m.group(2)])
            # non-header junk before the blank line is skipped leniently
        pos = next_pos
    flush()
    return headers, data[pos:]


def _content_type(headers: dict[str, list[str]]) -> tuple[str, dict[str, str]]:
    raw = (headers.get("content-type") or ["text/plain"])[0]
    parts = raw.split(";")
    ctype = parts[0].strip().lower() or "text/plain"
    params: dict[str, str] = {}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            params[k.strip().lower()] = v.strip().strip('"')
    return ctype, params


def _decode_body(body: bytes, headers: dict[str, list[str]],
                 charset: str) -> str:
    cte = (headers.get("content-transfer-encoding") or ["7bit"])[0].strip().lower()
    if cte == "base64":
        try:
            body = base64.b64decode(re.sub(rb"\s+", b"", body) + b"===")
        except (binascii.Error, ValueError):
            pass
    elif cte == "quoted-printable":
        body = quopri.decodestring(body)
    try:
        return body.decode(charset, "replace")
    except LookupError:
        return body.decode("cp1252", "replace")


def split_multipart(body: bytes, boundary: str):
    """RFC 2046 §5.1.1 part split, THE one multipart implementation
    (shared with kernels/mhtml.py — the r8 review found the idiom
    copy-pasted and re-unified it): the delimiter is CRLF + "--" +
    boundary AT LINE START — a bare substring split shreds parts that
    merely QUOTE the delimiter mid-line (r5 whole-repo review; replies
    quoting a previous message's MIME structure are common). Yields
    non-empty part bytes; a chunk starting with "--" closes the body."""
    sep = b"--" + boundary.encode("ascii", "replace")
    chunks = re.split(rb"(?:^|\r?\n)" + re.escape(sep), body)
    for chunk in chunks[1:]:   # chunks[0] is the preamble
        if chunk[:2] == b"--":
            break
        part = chunk.lstrip(b"\r\n")
        if part:
            yield part


def _walk(data: bytes, out: list[str], result: EmlResult, depth: int,
          deadline: float | None = None,
          preparsed: tuple[dict, bytes] | None = None) -> None:
    if deadline is not None:
        import time

        if time.monotonic() > deadline:
            from .errors import DeadlineError

            raise DeadlineError("eml parse deadline exceeded")
    if depth > _MAX_DEPTH or result.n_parts > _MAX_PARTS:
        return
    if preparsed is not None:
        headers, body = preparsed
    else:
        headers, body = _parse_headers(data)
    ctype, params = _content_type(headers)
    result.n_parts += 1
    if ctype.startswith("multipart/"):
        boundary = params.get("boundary")
        if not boundary:
            return
        for part in split_multipart(body, boundary):
            _walk(part, out, result, depth + 1, deadline)
        return
    disposition = (headers.get("content-disposition") or [""])[0]
    filename = params.get("name")
    if not filename:
        # parse from the ORIGINAL disposition (case preserved) and stop at
        # the next parameter separator
        m = re.search(r'filename\s*=\s*("(?:[^"]*)"|[^;]*)', disposition,
                      re.IGNORECASE)
        if m:
            filename = m.group(1).strip().strip('"') or None
    charset = params.get("charset", "utf-8" if depth == 0 else "cp1252")
    if ctype == "text/plain":
        out.append(_decode_body(body, headers, charset).strip("\r\n"))
    elif ctype == "text/html":
        from .htmlparse import parse_html

        html = _decode_body(body, headers, charset)
        out.append(parse_html(html, extract_links=False, collect_blocks=False,
                              deadline=deadline).text.strip("\n"))
    elif ctype.startswith("message/"):
        _walk(body.lstrip(b"\r\n"), out, result, depth + 1, deadline)
    else:
        result.n_attachments += 1
        if filename:
            result.attachment_names.append(filename)


def extract_eml(data: bytes, deadline: float | None = None) -> EmlResult:
    headers, body0 = _parse_headers(data)
    get = lambda k: (_decode_encoded_words(headers[k][0]) if k in headers else None)
    subject = get("subject")
    frm = get("from")
    to = get("to")
    cc = get("cc")
    date = (headers.get("date") or [None])[0]

    result = EmlResult(text="", subject=subject)
    parts: list[str] = []
    _walk(data, parts, result, 0, deadline, preparsed=(headers, body0))

    lines: list[str] = []
    if subject:
        lines.append(subject)
    if frm:
        lines.append(f"From: {frm}")
    if to:
        lines.append(f"To: {to}")
    if cc:
        lines.append(f"Cc: {cc}")
    if date:
        lines.append(f"Date: {date}")
    head = "\n".join(lines)
    body_text = "\n".join(p for p in parts if p)
    text = (head + "\n\n" if head else "") + body_text
    if text and not text.endswith("\n"):
        text += "\n"
    result.text = text

    md: dict[str, str] = {"Content-Type": "message/rfc822"}
    if subject:
        md["subject"] = subject
        md["dc:title"] = subject
    if frm:
        md["Message-From"] = frm
    if to:
        md["Message-To"] = to
    if cc:
        md["Message-Cc"] = cc
    if date:
        md["Message-Date"] = date
    mid = (headers.get("message-id") or [None])[0]
    if mid:
        md["Message-Id"] = mid
    result.metadata = md
    return result
