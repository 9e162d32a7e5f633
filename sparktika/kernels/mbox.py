"""mbox mailbox kernel: envelope splitting + per-message RFC 822 parse.

From-scratch equivalent of Tika 1.20's MboxParser (the reference links
the full tika-parsers set via tika-fork-main/build.gradle,
gradle.properties:5; Tika's MBoxParser splits on "From " envelope lines
and parses each message with RFC822Parser). Here each message is routed
through the repo's own RFC 822 kernel (kernels/eml.py), and the rendered
texts are concatenated in mailbox order.

Format notes (qmail/RFC 4155 posture):

- a message starts at a line matching the classic asctime envelope
  ``From <sender> <www> <mmm> <dd> <hh:mm:ss> <yyyy>`` at offset 0 or
  immediately after a newline; requiring the full envelope shape (not
  just the "From " prefix) keeps prose like "From here on..." from
  splitting a message body
- mboxo/mboxrd body quoting: lines matching ``>+From `` are unquoted by
  stripping ONE leading ``>`` before the message is parsed
- sniffing requires envelope + the following block to look like RFC 822
  headers (two known header names), so a plain-text file that merely
  starts with an envelope-shaped line never misroutes

Robustness (invariant 7): message count is capped, the shared
per-document deadline is checked between messages, and a message whose
RFC 822 parse fails degrades to a skipped message (the mailbox's other
messages still extract).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .eml import extract_eml, sniff_eml
from .errors import DeadlineError, check_deadline

_MAX_MESSAGES = 10_000

# Classic asctime envelope: "From sender www mmm dd hh:mm:ss yyyy"
# (day-of-month may be space-padded; some writers add a timezone field
# before the year — tolerated).
_ENVELOPE_RE = re.compile(
    rb"From \S+ +"
    rb"(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun) "
    rb"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) "
    rb"[ \d]\d \d\d:\d\d:\d\d (?:\S+ )?\d{4}\r?$",
    re.MULTILINE,
)

_QUOTED_FROM_RE = re.compile(rb"^>(>*From )", re.MULTILINE)


def sniff_mbox(data: bytes) -> bool:
    """True when the payload starts with a full asctime envelope line AND
    the bytes after it sniff as an RFC 822 header block."""
    head = data[:4096]
    m = _ENVELOPE_RE.match(head)
    if m is None or not head.startswith(b"From "):
        return False
    eol = head.find(b"\n", m.end() - 1)
    if eol == -1:
        return False
    return sniff_eml(head[eol + 1:])


@dataclass
class MboxResult:
    text: str
    title: str | None
    n_messages: int = 0
    n_skipped: int = 0
    subjects: list[str] = field(default_factory=list)
    metadata: dict[str, str] = field(default_factory=dict)


def _split_messages(data: bytes) -> list[bytes]:
    """Message bodies in mailbox order, envelope lines stripped."""
    starts = []
    for m in _ENVELOPE_RE.finditer(data):
        if m.start() == 0 or data[m.start() - 1: m.start()] == b"\n":
            starts.append(m.start())
        if len(starts) > _MAX_MESSAGES:
            break
    messages = []
    for i, s in enumerate(starts):
        end = starts[i + 1] if i + 1 < len(starts) else len(data)
        chunk = data[s:end]
        eol = chunk.find(b"\n")
        if eol == -1:
            continue
        messages.append(chunk[eol + 1:])
    return messages


def extract_mbox(data: bytes, deadline: float | None = None) -> MboxResult:
    result = MboxResult(text="", title=None)
    parts: list[str] = []
    for raw in _split_messages(data)[:_MAX_MESSAGES]:
        check_deadline(deadline, "mbox message")
        body = _QUOTED_FROM_RE.sub(rb"\1", raw).rstrip(b"\r\n")
        try:
            r = extract_eml(body, deadline=deadline)
        except DeadlineError:
            raise
        except Exception:
            result.n_skipped += 1
            continue
        result.n_messages += 1
        if r.subject:
            result.subjects.append(r.subject)
        if r.text:
            parts.append(r.text if r.text.endswith("\n") else r.text + "\n")
    result.text = "\n".join(parts)
    result.title = result.subjects[0] if result.subjects else None
    md: dict[str, str] = {"Content-Type": "application/mbox"}
    result.metadata = md
    return result
