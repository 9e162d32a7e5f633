"""Tika-parity metadata key construction for PDF and legacy-Office docs.

The reference pins metadata DISTINCT-KEY COUNTS per fixture
(test/TikaProcessTest.java:124-139): 39 for pdf-sample.pdf, 23 for
xls-sample.xls, 8 for html-sample.html. It never pins the key names, so
this module reconstructs the Tika 1.20 key sets from Tika's public
property model (TikaCoreProperties composite properties expand one
logical value into a primary key + legacy alias keys):

  creator  -> dc:creator, Author, meta:author, creator           (4 keys)
  created  -> dcterms:created, Creation-Date, meta:creation-date (3 keys)
  modified -> dcterms:modified, Last-Modified, Last-Save-Date,
              meta:save-date, date, modified                     (6 keys)
  title    -> dc:title, title                                    (2 keys)

Validation: with these expansions the PDF fixture (Info with Title/
Author/Creator/Producer/CreationDate/ModDate, unencrypted, 1 page) lands
on exactly 39 keys and the XLS fixture (SummaryInformation with author/
last_author/app_name/dates + Company) on exactly 23 — two independent
fixtures confirming the same alias model.

Values are ours (e.g. X-Parsed-By names our kernels, dates are ISO8601
UTC like Tika renders them); the KEY SET is the parity contract.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_PDF_DATE_RE = re.compile(
    r"D:(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?"
    r"(?:([+\-Zz])(\d{2})?'?(\d{2})?'?)?")


def pdf_date_to_iso(s: str) -> str | None:
    """PDF date string (D:YYYYMMDDHHmmSS+HH'mm') -> ISO8601 UTC Z."""
    m = _PDF_DATE_RE.match(s or "")
    if not m:
        return None
    y = int(m.group(1))
    mo = int(m.group(2) or 1)
    d = int(m.group(3) or 1)
    hh = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    sign = m.group(7)
    try:
        dt = datetime(y, mo, d, hh, mi, ss, tzinfo=timezone.utc)
    except ValueError:
        return None
    if sign in ("+", "-"):
        off = timedelta(hours=int(m.group(8) or 0), minutes=int(m.group(9) or 0))
        dt = dt - off if sign == "+" else dt + off
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _put(md: dict[str, list[str]], keys: tuple[str, ...], value) -> None:
    if value is None or value == "":
        return
    v = [str(value)]
    for k in keys:
        md[k] = v


CREATOR_KEYS = ("dc:creator", "Author", "meta:author", "creator")
CREATED_KEYS = ("dcterms:created", "Creation-Date", "meta:creation-date")
MODIFIED_KEYS = ("dcterms:modified", "Last-Modified", "Last-Save-Date",
                 "meta:save-date", "date", "modified")
TITLE_KEYS = ("dc:title", "title")

ACCESS_PERMISSION_KEYS = (
    "access_permission:assemble_document",
    "access_permission:can_modify",
    "access_permission:can_print",
    "access_permission:can_print_degraded",
    "access_permission:extract_content",
    "access_permission:extract_for_accessibility",
    "access_permission:fill_in_form",
    "access_permission:modify_annotations",
)


def pdf_tika_metadata(
    info: dict[str, str],
    version: str,
    n_pages: int,
    chars_per_page: list[int],
    unmapped_per_page: list[int],
    encrypted: bool = False,
) -> dict[str, list[str]]:
    """Tika-1.20-equivalent metadata map for a PDF. For the reference
    fixture this emits exactly 39 distinct keys (see module docstring)."""
    md: dict[str, list[str]] = {}
    md["X-Parsed-By"] = ["sparktika.kernels.pdf"]
    md["Content-Type"] = ["application/pdf"]
    md["dc:format"] = [f"application/pdf; version={version}"]
    md["pdf:PDFVersion"] = [version]
    md["pdf:encrypted"] = [str(encrypted).lower()]
    md["xmpTPg:NPages"] = [str(n_pages)]
    # unencrypted documents grant every permission (PDFBox AccessPermission)
    for k in ACCESS_PERMISSION_KEYS:
        md[k] = [str(not encrypted).lower()]
    _put(md, ("pdf:docinfo:title",), info.get("Title"))
    _put(md, ("pdf:docinfo:creator",), info.get("Author"))
    _put(md, ("pdf:docinfo:creator_tool",), info.get("Creator"))
    _put(md, ("pdf:docinfo:producer",), info.get("Producer"))
    _put(md, ("pdf:docinfo:subject",), info.get("Subject"))
    _put(md, ("pdf:docinfo:keywords",), info.get("Keywords"))
    _put(md, TITLE_KEYS, info.get("Title"))
    _put(md, CREATOR_KEYS, info.get("Author"))
    _put(md, ("xmp:CreatorTool",), info.get("Creator"))
    _put(md, ("producer",), info.get("Producer"))
    _put(md, ("subject",), info.get("Subject"))
    created = pdf_date_to_iso(info.get("CreationDate", ""))
    modified = pdf_date_to_iso(info.get("ModDate", ""))
    _put(md, ("pdf:docinfo:created",), created)
    _put(md, ("pdf:docinfo:modified",), modified)
    _put(md, CREATED_KEYS, created)
    _put(md, MODIFIED_KEYS, modified)
    md["pdf:charsPerPage"] = [str(n) for n in chars_per_page] or ["0"]
    md["pdf:unmappedUnicodeCharsPerPage"] = (
        [str(n) for n in unmapped_per_page] or ["0"])
    return md


def xls_tika_metadata(
    summary: dict[str, object],
    docsum: dict[str, object],
) -> dict[str, list[str]]:
    """Tika-1.20-equivalent metadata map for a BIFF8 workbook, from the
    OLE2 property sets. For the reference fixture this emits exactly 23
    distinct keys (see module docstring)."""
    md: dict[str, list[str]] = {}
    md["X-Parsed-By"] = ["sparktika.kernels.xls"]
    md["Content-Type"] = ["application/vnd.ms-excel"]
    _put(md, TITLE_KEYS, summary.get("title"))
    _put(md, CREATOR_KEYS, summary.get("author"))
    _put(md, ("Last-Author", "meta:last-author"), summary.get("last_author"))
    _put(md, ("Application-Name", "extended-properties:Application"),
         summary.get("app_name"))
    _put(md, ("Keywords", "meta:keyword"), summary.get("keywords"))
    _put(md, ("subject",), summary.get("subject"))
    _put(md, ("comment",), summary.get("comments"))
    _put(md, ("Template",), summary.get("template"))
    _put(md, ("Revision-Number",), summary.get("rev_number"))
    _put(md, CREATED_KEYS, summary.get("create_dtm"))
    _put(md, MODIFIED_KEYS, summary.get("last_save_dtm"))
    _put(md, ("Last-Printed", "meta:print-date"), summary.get("last_printed"))
    _put(md, ("Company", "extended-properties:Company"), docsum.get("company"))
    _put(md, ("Manager", "extended-properties:Manager"), docsum.get("manager"))
    _put(md, ("Category",), docsum.get("category"))
    return md
