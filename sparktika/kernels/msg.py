"""Outlook .msg kernel: MS-OXMSG property streams over OLE2 (from scratch).

A .msg file is an OLE2 compound file whose message properties live in
streams named ``__substg1.0_TTTTYYYY`` — TTTT is the MAPI property id,
YYYY the type (001F = UTF-16LE string, 001E = 8-bit string in the
message codepage). Recipients and attachments are sub-storages
(``__recip_version1.0_#NNNNNNNN`` / ``__attach_version1.0_#NNNNNNNN``).

The reference delegates .msg to Tika's auto-detect parser (Tika's
OfficeParser/OutlookExtractor path; the reference repo itself carries no
.msg fixture — SURVEY.md §5). Output shape mirrors OutlookExtractor's
text rendering (subject heading, From/To/Cc/Bcc header block, body)
without reproducing its XHTML markup.

Robustness: missing streams degrade to absent fields; decode errors are
replaced, never raised (invariant 7 — the dispatcher's backstop catches
anything structural via Ole2File's own KernelErrors).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .errors import KernelError
from .ole2 import Ole2File

# MAPI property ids we surface (MS-OXPROPS canonical names).
_SUBJECT = 0x0037          # PidTagSubject
_SENDER_NAME = 0x0C1A      # PidTagSenderName
_SENDER_EMAIL = 0x0C1F     # PidTagSenderEmailAddress
_DISPLAY_TO = 0x0E04       # PidTagDisplayTo
_DISPLAY_CC = 0x0E03       # PidTagDisplayCc
_DISPLAY_BCC = 0x0E02      # PidTagDisplayBcc
_BODY = 0x1000             # PidTagBody
_HEADERS = 0x007D          # PidTagTransportMessageHeaders
_MESSAGE_ID = 0x1035       # PidTagInternetMessageId

MSG_MIME = "application/vnd.ms-outlook"


_ATTACH_LONG_FILENAME = 0x3707  # PidTagAttachLongFilename
_ATTACH_FILENAME = 0x3704       # PidTagAttachFilename
_ATTACH_DATA = "__substg1.0_37010102"      # PidTagAttachDataBinary
_ATTACH_DATA_OBJ = "__substg1.0_3701000D"  # PidTagAttachDataObject (storage)


@dataclass
class MsgAttachment:
    filename: str | None
    n_bytes: int
    # decoded/.recursively-extracted content; None when nothing extractable
    text: str | None
    embedded_subject: str | None = None  # set for message/rfc822-style nests


@dataclass
class MsgResult:
    text: str
    subject: str | None
    metadata: dict[str, str] = field(default_factory=dict)
    n_recipients: int = 0
    n_attachments: int = 0
    attachments: list[MsgAttachment] = field(default_factory=list)
    # relative embedded-message paths ("embedded-N", nested as
    # "embedded-N/embedded-M") + budget-floor flag, consumed by the
    # dispatcher for the reference-reserved embedded_resource_* names
    # (main/TikaConstants.java:20-27)
    embedded_paths: list[str] = field(default_factory=list)
    embed_limit_hit: bool = False


def is_msg(stream_names: list[str]) -> bool:
    """OLE2 files carrying MAPI property streams are Outlook messages."""
    return any(n.startswith("__substg1.0_") or n == "__properties_version1.0"
               for n in stream_names)


def _read_prop(ole: Ole2File, entries: dict, prop_id: int) -> str | None:
    """Read a string property from an entry-scoped {name: DirEntry} map
    (NEVER a global name lookup — the same property stream names repeat
    inside every attachment/embedded-message sub-storage), preferring the
    UTF-16LE (001F) variant over the 8-bit (001E) one."""
    uni = entries.get(f"__substg1.0_{prop_id:04X}001F")
    if uni is not None:
        return _decode_mapi_string(ole.read_entry(uni), unicode=True)
    ansi = entries.get(f"__substg1.0_{prop_id:04X}001E")
    if ansi is not None:
        # without PR_MESSAGE_CODEPAGE parsing we assume the windows-1252
        # default, the overwhelmingly common legacy codepage
        return _decode_mapi_string(ole.read_entry(ansi), unicode=False)
    return None


def _decode_mapi_string(raw: bytes, unicode: bool) -> str:
    if unicode:
        return raw.decode("utf-16-le", "replace").rstrip("\x00")
    try:
        return raw.decode("cp1252").rstrip("\x00")
    except UnicodeDecodeError:
        return raw.decode("latin-1").rstrip("\x00")


def _extract_attachments(
    ole: Ole2File,
    roots: list,
    recurse=None,
    embed_budget: int = 0,
) -> tuple[list[MsgAttachment], list[str], bool]:
    """Walk __attach_version1.0_#NNNNNNNN sub-storages in name order:
    filename (PidTagAttachLongFilename, falling back to the 8.3
    PidTagAttachFilename), payload size, and content.

    Embedded messages (PidTagAttachDataObject sub-storage) render
    RECURSIVELY while `embed_budget` lasts — the full inner message
    (header block, body, and its OWN attachments, so >=2-level nests
    surface) minus the subject heading, which the attachment marker line
    already carries. At the budget floor they degrade to the one-level
    subject+body rendering (Tika's guarded embedded-parse posture,
    ref: tika-fork-main ConfigurableAutoDetectParser.java:131-165).

    Binary payloads route through `recurse(name, data)` — the
    dispatcher's guarded re-entry into extract_document — so an attached
    .doc/.pdf/.msg/image yields real text; failures degrade to
    size-only, never raise (invariant 7)."""
    out: list[MsgAttachment] = []
    rel_paths: list[str] = []
    limit_hit = False
    storages = sorted(
        (e for e in roots
         if e.obj_type == 1 and e.name.startswith("__attach_version1.0_")),
        key=lambda e: e.name)
    for idx, st in enumerate(storages, 1):
        all_kids = ole.storage_children(st)
        kids = {k.name: k for k in all_kids if k.obj_type == 2}
        fname = (_read_prop(ole, kids, _ATTACH_LONG_FILENAME)
                 or _read_prop(ole, kids, _ATTACH_FILENAME))
        data_entry = kids.get(_ATTACH_DATA)
        n_bytes = data_entry.size if data_entry is not None else 0
        text = None
        emb_subject = None
        emb = next((k for k in all_kids
                    if k.obj_type == 1 and k.name == _ATTACH_DATA_OBJ), None)
        if emb is not None:
            rel = f"embedded-{idx}"
            if embed_budget > 0:
                # binary payloads inside the EMBEDDED message route back
                # through the dispatcher with this message's segment
                # prefixed, so embedded_resource_path stays hierarchical
                wrapped = (None if recurse is None else
                           (lambda n, p, _r=rel: recurse(f"{_r}/{n}", p)))
                inner = extract_msg(ole, recurse=wrapped,
                                    embed_budget=embed_budget - 1,
                                    scope=emb, subject_heading=False)
                emb_subject = inner.subject
                text = inner.text or None
                rel_paths.append(rel)
                rel_paths.extend(f"{rel}/{q}" for q in inner.embedded_paths)
                limit_hit = limit_hit or inner.embed_limit_hit
            else:
                # budget floor: degrade to one-level subject+body AND
                # flag it (embedded_resource_limit_reached)
                limit_hit = True
                ekids = {k.name: k for k in ole.storage_children(emb)
                         if k.obj_type == 2}
                emb_subject = _read_prop(ole, ekids, _SUBJECT)
                text = _read_prop(ole, ekids, _BODY)
        elif (data_entry is not None and fname
              and fname.lower().endswith(".txt")):
            raw = ole.read_entry(data_entry)
            try:
                text = raw.decode("utf-8")
            except UnicodeDecodeError:
                text = raw.decode("cp1252", "replace")
        elif data_entry is not None and n_bytes > 0 and recurse is not None:
            try:
                text = recurse(fname or st.name, ole.read_entry(data_entry))
            except Exception:
                text = None  # degrade to size-only
        out.append(MsgAttachment(filename=fname, n_bytes=n_bytes, text=text,
                                 embedded_subject=emb_subject))
    return out, rel_paths, limit_hit


def extract_msg(
    ole: Ole2File,
    recurse=None,
    embed_budget: int = 0,
    scope=None,
    subject_heading: bool = True,
) -> MsgResult:
    # message-level properties live at the ROOT of the directory tree —
    # attachments/embedded messages repeat the same stream names in their
    # sub-storages, so every lookup here is tree-scoped (never global).
    # `scope` points at an embedded message's PidTagAttachDataObject
    # sub-storage during recursion; None means the file's real root.
    roots = ole.storage_children(scope) if scope is not None \
        else ole.root_children()
    root = {e.name: e for e in roots if e.obj_type == 2}
    subject = _read_prop(ole, root, _SUBJECT)
    sender = _read_prop(ole, root, _SENDER_NAME)
    sender_email = _read_prop(ole, root, _SENDER_EMAIL)
    to = _read_prop(ole, root, _DISPLAY_TO)
    cc = _read_prop(ole, root, _DISPLAY_CC)
    bcc = _read_prop(ole, root, _DISPLAY_BCC)
    body = _read_prop(ole, root, _BODY)
    body_source = "text" if body is not None else None
    rtf_entry = root.get("__substg1.0_10090102")
    if body is None and rtf_entry is not None:
        # no plain-text body: fall back to PR_RTF_COMPRESSED (the common
        # case for real Outlook mail) -> LZFu decompress -> RTF kernel
        from .rtf import extract_rtf
        from .rtfcomp import decompress_rtf

        try:
            raw_rtf = decompress_rtf(ole.read_entry(rtf_entry))
            body = extract_rtf(raw_rtf).text.strip("\n") or None
        except KernelError:
            body = None  # corrupt body never blocks the metadata fields
        if body is not None:
            body_source = "rtf-compressed"
    headers = _read_prop(ole, root, _HEADERS)
    message_id = _read_prop(ole, root, _MESSAGE_ID)

    n_recipients = sum(1 for e in roots
                       if e.obj_type == 1 and e.name.startswith("__recip_version1.0_"))
    n_attachments = sum(1 for e in roots
                        if e.obj_type == 1 and e.name.startswith("__attach_version1.0_"))

    frm = None
    if sender and sender_email and sender_email != sender:
        frm = f"{sender} <{sender_email}>"
    else:
        frm = sender or sender_email

    lines: list[str] = []
    if subject and subject_heading:
        lines.append(subject)
    if frm:
        lines.append(f"From: {frm}")
    if to:
        lines.append(f"To: {to}")
    if cc:
        lines.append(f"Cc: {cc}")
    if bcc:
        lines.append(f"Bcc: {bcc}")
    text = "\n".join(lines)
    if body:
        text = (text + "\n\n" if text else "") + body
    if text:
        text += "\n"
    attachments, emb_rel_paths, emb_limit_hit = _extract_attachments(
        ole, roots, recurse, embed_budget)
    for a in attachments:
        if not (a.filename or a.n_bytes or a.embedded_subject or a.text):
            continue  # placeholder storage: counted, nothing to render
        if a.embedded_subject is not None:
            text += f"[Attachment message: {a.embedded_subject}]\n"
        else:
            text += (f"[Attachment: {a.filename}]\n" if a.filename
                     else "[Attachment]\n")
        if a.text:
            text += a.text if a.text.endswith("\n") else a.text + "\n"

    md: dict[str, str] = {"Content-Type": MSG_MIME}
    if subject:
        md["subject"] = subject
        md["dc:title"] = subject
    if frm:
        md["Message-From"] = frm
    if to:
        md["Message-To"] = to
    if cc:
        md["Message-Cc"] = cc
    if bcc:
        md["Message-Bcc"] = bcc
    if body_source:
        md["body-source"] = body_source
    if message_id:
        md["Message-Id"] = message_id
    if headers:
        md["Transport-Headers"] = headers
    att_names = [a.filename for a in attachments if a.filename]
    if att_names:
        md["attachment-names"] = "; ".join(att_names)
    return MsgResult(text=text, subject=subject, metadata=md,
                     n_recipients=n_recipients, n_attachments=n_attachments,
                     attachments=attachments, embedded_paths=emb_rel_paths,
                     embed_limit_hit=emb_limit_hit)
