"""Per-document extraction dispatch: bytes -> ExtractResult.

The pure-Python core of the engine's `mapInPandas` stage. One call =
one parse transaction, mirroring the reference's per-document contract
(client sends (baseUri, contentType, bytes), receives (metadata, text)
— ref: client/TikaProcessPool.java:110-135), with these status
semantics replacing fork-kill isolation (ref: SURVEY.md O19/O20):

  ok / truncated / timeout / failed / skipped_oversize / unsupported

Failures become rows, never exceptions: a bomb or poisoned doc degrades
to an empty flagged result exactly like the reference's empty-Metadata
soft landing (ref: client/TikaRunner.java:142-147,
test/TikaProcessTest.java:182-203).

Metadata keys reuse the reference's reserved field names where they
exist (ref: main/TikaConstants.java:12-27): resource_name, parsing_time,
write_limit_reached.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from ..config import DEFAULT_CONFIG, ExtractConfig
from . import boilerplate, charset, mime, pdf
from .errors import (DeadlineError, DepthLimitError, EncryptedError,
                     InflateRatioError, KernelError)
from .htmlparse import Link, parse_html

STATUS_OK = "ok"
STATUS_TRUNCATED = "truncated"
STATUS_TIMEOUT = "timeout"
STATUS_FAILED = "failed"
STATUS_OVERSIZE = "skipped_oversize"
STATUS_UNSUPPORTED = "unsupported"


@dataclass
class ExtractResult:
    url: str
    content_type_declared: str | None
    content_type_detected: str
    charset_detected: str | None
    text_extracted: str | None
    main_text: str | None
    title: str | None
    links: list[Link]
    metadata: dict[str, list[str]]
    status: str
    error: str | None
    parse_ms: int
    n_bytes_in: int
    n_chars_out: int
    write_limit_reached: bool = False


def _cap_text(text: str, max_chars: int) -> tuple[str, bool]:
    """Apply the write-limit semantics to already-assembled text (plain-text
    path); cap is exact (SURVEY.md O5)."""
    if max_chars != -1 and len(text) > max_chars:
        return text[:max_chars], True
    return text, False


def extract_document(
    url: str,
    content_type: str | None,
    data: bytes | None,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    true_size: int | None = None,
    embed_depth: int = 0,
    _deadline: float | None = None,
    _embed_path: str = "",
) -> ExtractResult:
    """`true_size` lets the Spark layer ship only a 1KB sniff head for
    oversize documents (single-scan short-circuit) while the kernel still
    reports the document's real size in the status row.

    `embed_depth` tracks re-entry for EMBEDDED documents (.msg attachment
    payloads and embedded messages, .doc ObjectPool objects); recursion
    stops when it reaches cfg.max_embed_depth — the Spark-side analog of
    the reference's guarded embedded-document auto-detect parse
    (ref: tika-fork-main ConfigurableAutoDetectParser.java:131-165,
    installed at TikaForkMain.java:297)."""
    t0 = time.monotonic()
    deadline = t0 + cfg.timeout_ms / 1000.0 if cfg.timeout_ms > 0 else None
    # nested re-dispatch (embedded docs, gzip inner payload) inherits the
    # OUTER document's deadline: N embedded payloads must share one
    # per-document budget, not get N fresh ones (bomb posture, O4/O20)
    if _deadline is not None:
        deadline = _deadline if deadline is None else min(deadline, _deadline)
    data = data or b""
    n_bytes = true_size if true_size is not None else len(data)
    declared = content_type or None

    # embedded-resource accounting (reference-reserved names,
    # main/TikaConstants.java:20-27) — defined before res() so every
    # early return sees bound names; populated by recurse_embedded below
    embed_paths: list[str] = []
    _embed_limit = [False]
    _embed_seq = [0]

    def embed_child_path(name: str | None) -> str:
        _embed_seq[0] += 1
        leaf = (name or "").strip().lstrip("/") or f"embedded-{_embed_seq[0]}"
        return f"{_embed_path}/{leaf}"

    def res(**kw) -> ExtractResult:
        base = dict(
            url=url,
            content_type_declared=declared,
            content_type_detected=kw.pop("detected", mime.OCTET_STREAM),
            charset_detected=None,
            text_extracted=None,
            main_text=None,
            title=None,
            links=[],
            metadata={},
            status=STATUS_FAILED,
            error=None,
            parse_ms=int((time.monotonic() - t0) * 1000),
            n_bytes_in=n_bytes,
            n_chars_out=0,
        )
        base.update(kw)
        md = base["metadata"]
        md.setdefault("resource_name", [url.rsplit("/", 1)[-1] or url])
        md.setdefault("Content-Type", [base["content_type_detected"]])
        md["parsing_time"] = [str(base["parse_ms"])]
        md["write_limit_reached"] = [str(base.get("write_limit_reached", False)).lower()]
        if embed_paths:
            # hierarchical per-child paths, recursion order (reference
            # name EMBEDDED_RESOURCE_PATH, TikaConstants.java:26-27)
            md.setdefault("embedded_resource_path", list(embed_paths))
        if _embed_limit[0]:
            md["embedded_resource_limit_reached"] = ["true"]
        if base["text_extracted"] is not None:
            base["n_chars_out"] = len(base["text_extracted"])
        return ExtractResult(**base)

    # size cap BEFORE any parsing (the Spark plan additionally filters these
    # rows out pre-shuffle; this is the kernel-level backstop)
    if n_bytes > cfg.max_bytes:
        return res(status=STATUS_OVERSIZE,
                   error=f"document size {n_bytes} exceeds cap {cfg.max_bytes}",
                   detected=mime.detect_mime(data[:1024], declared, url))

    # embedded-document recursion plumbing, shared by the PDF/OLE2
    # branches (ref: guarded embedded auto-detect parse,
    # ConfigurableAutoDetectParser.java:131-165). Reference-reserved
    # metadata names (main/TikaConstants.java:20-27): every child that
    # re-enters the dispatcher records a hierarchical
    # `embedded_resource_path` ("/name" segments, Tika's
    # RecursiveParserWrapper convention), and exhausting the
    # max_embed_depth budget while embedded payloads remain raises
    # `embedded_resource_limit_reached` on the OUTER document.
    embed_budget = cfg.max_embed_depth - embed_depth

    def recurse_embedded(name: str, payload: bytes) -> str | None:
        """Guarded re-entry for embedded payload bytes; only OK /
        truncated results contribute text, anything else degrades to
        nothing (the outer doc's status is never affected). Called at an
        exhausted depth budget it contributes NO text but marks
        embedded_resource_limit_reached — the caller-side budget gate
        moved here so the trip is observable (r4 verdict item 4)."""
        child_path = embed_child_path(name)
        if embed_budget <= 0:
            _embed_limit[0] = True
            return None
        r2 = extract_document(name, None, payload, cfg,
                              embed_depth=embed_depth + 1,
                              _deadline=deadline, _embed_path=child_path)
        embed_paths.append(child_path)
        embed_paths.extend(r2.metadata.get("embedded_resource_path", []))
        if r2.metadata.get("embedded_resource_limit_reached") == ["true"]:
            _embed_limit[0] = True
        if r2.status in (STATUS_OK, STATUS_TRUNCATED):
            return r2.text_extracted or None
        return None

    detected = mime.detect_mime(data, declared, url)

    try:
        if detected == "application/xml":
            # dedicated namespace-agnostic XML route (VERDICT r02 item 7:
            # the HTML walker's safe-element sets can drop arbitrary XML
            # element text); Tika 1.20 parity posture is DcXMLParser's
            # all-character-content + title
            from .xmlparse import parse_xml_text

            import re as _re

            # encoding is trusted only inside a LEADING <?xml ...?>
            # declaration (XML 1.0 §4.3.3) — a root-element attribute or
            # comment that merely contains "encoding=" must not win
            # (ADVICE r3)
            head = data[:200]
            bom = charset.detect_bom(head)
            decl_zone = head[bom[1]:] if bom else head
            decl_zone = decl_zone.lstrip(b" \t\r\n")
            decl = None
            if decl_zone.startswith(b"<?xml"):
                end = decl_zone.find(b"?>")
                decl = _re.search(
                    rb"""encoding\s*=\s*["']([A-Za-z0-9_.-]+)""",
                    decl_zone[: end if end != -1 else len(decl_zone)])
            cs = (decl.group(1).decode("ascii", "replace").lower()
                  if decl else charset.detect_charset(data, is_html=False))
            xtext, cs = charset.decode(data, cs, is_html=False)
            r = parse_xml_text(xtext, max_depth=cfg.max_depth,
                               deadline=deadline)
            from .feed import parse_feed, sniff_feed_root
            from .xmlparse import local_name as _xml_local

            if r.root_tag and _xml_local(r.root_tag) in ("urlset",
                                                         "sitemapindex"):
                # sitemaps.org refinement: URL rows into metadata, no
                # body text (a sitemap has none)
                from .feed import parse_sitemap

                sm = parse_sitemap(xtext, deadline=deadline)
                detected = "application/x-sitemap+xml"
                md = {"Content-Type": [f"{detected}; charset={cs}"],
                      "Content-Encoding": [cs],
                      "sitemap-kind": [sm.kind],
                      "sitemap-urls": [str(len(sm.urls))]}
                if sm.urls:
                    md["sitemap-locs"] = sm.urls
                    if any(sm.lastmods):
                        md["sitemap-lastmods"] = sm.lastmods
                if sm.truncated:
                    md["sitemap-truncated"] = ["true"]
                return res(detected=detected, charset_detected=cs,
                           text_extracted="" if cfg.parse_content
                           else None,
                           metadata=md, status=STATUS_OK)
            feed_fmt = None
            if r.root_tag and _xml_local(r.root_tag) in ("rss", "feed",
                                                         "RDF"):
                # namespace check needs the root attrs: lazy event scan
                # stops at the root start tag (same pattern as SVG)
                from .xmlparse import xml_events as _xml_events

                for ev in _xml_events(xtext):
                    if ev[0] == "start":
                        feed_fmt = sniff_feed_root(ev[1], ev[2])
                        break
            if feed_fmt is not None:
                # RSS/Atom/RDF feed refinement (FeedParser parity):
                # entry titles + summaries as the body, feed title as
                # the document title, links/dates as metadata
                fr = parse_feed(xtext, deadline=deadline)
                text, limited = _cap_text(fr.render_text(), cfg.max_chars)
                detected = ("application/atom+xml" if fr.format == "atom"
                            else "application/rss+xml")
                md = {"Content-Type": [f"{detected}; charset={cs}"],
                      "Content-Encoding": [cs],
                      "feed-format": [fr.format],
                      "feed-entries": [str(len(fr.entries))]}
                if fr.title:
                    md["title"] = [fr.title]
                    md["dc:title"] = [fr.title]
                if fr.description:
                    md["feed-description"] = [fr.description]
                links = [e.link for e in fr.entries if e.link]
                if links:
                    md["feed-entry-links"] = links
                dates = [e.date for e in fr.entries if e.date]
                if dates:
                    md["feed-entry-dates"] = dates
                if fr.truncated_entries:
                    md["feed-entries-truncated"] = ["true"]
                status = STATUS_TRUNCATED if limited else STATUS_OK
                return res(detected=detected, charset_detected=cs,
                           text_extracted=text if cfg.parse_content
                           else None,
                           title=fr.title, metadata=md, status=status,
                           write_limit_reached=limited)
            if r.root_tag and _xml_local(r.root_tag) == "FictionBook":
                # FB2 e-book refinement (kernels/fb2.py): body sections
                # only — the generic XML route would smear description
                # metadata into the text
                from .fb2 import FB2_MIME, parse_fb2

                fb = parse_fb2(xtext, deadline=deadline)
                text, limited = _cap_text(fb.text, cfg.max_chars)
                md = {"Content-Type": [f"{FB2_MIME}; charset={cs}"],
                      "Content-Encoding": [cs],
                      "fb2-sections": [str(fb.n_sections)]}
                if fb.title:
                    md["title"] = [fb.title]
                if fb.authors:
                    md["fb2-authors"] = fb.authors
                if fb.genres:
                    md["fb2-genres"] = fb.genres
                if fb.lang:
                    md["fb2-lang"] = [fb.lang]
                status = STATUS_TRUNCATED if limited else STATUS_OK
                return res(detected=FB2_MIME, charset_detected=cs,
                           title=fb.title,
                           text_extracted=text if cfg.parse_content
                           else None,
                           metadata=md, status=status,
                           write_limit_reached=limited)
            if r.root_tag and _xml_local(r.root_tag) == "abiword":
                # AbiWord refinement (kernels/xmlroutes.py): body
                # paragraphs only — dc.title stays OUT of the text
                from .xmlroutes import ABW_MIME, parse_abiword

                ab = parse_abiword(xtext, deadline=deadline)
                text, limited = _cap_text(ab.text, cfg.max_chars)
                md = {"Content-Type": [f"{ABW_MIME}; charset={cs}"],
                      "Content-Encoding": [cs]}
                if ab.title:
                    md["title"] = [ab.title]
                status = STATUS_TRUNCATED if limited else STATUS_OK
                return res(detected=ABW_MIME, charset_detected=cs,
                           title=ab.title,
                           text_extracted=text if cfg.parse_content
                           else None,
                           metadata=md, status=status,
                           write_limit_reached=limited)
            if r.root_tag and _xml_local(r.root_tag) == "gpx":
                # GPX refinement (kernels/xmlroutes.py): structured
                # point/track counts + names; the body is the name list
                from .xmlroutes import GPX_MIME, parse_gpx

                gp = parse_gpx(xtext, deadline=deadline)
                text, limited = _cap_text("\n".join(gp.names),
                                          cfg.max_chars)
                md = {"Content-Type": [f"{GPX_MIME}; charset={cs}"],
                      "Content-Encoding": [cs],
                      "gpx-waypoints": [str(gp.n_waypoints)],
                      "gpx-trackpoints": [str(gp.n_trackpoints)],
                      "gpx-routepoints": [str(gp.n_routepoints)],
                      "gpx-tracks": [str(gp.n_tracks)]}
                status = STATUS_TRUNCATED if limited else STATUS_OK
                return res(detected=GPX_MIME, charset_detected=cs,
                           title=gp.names[0] if gp.names else None,
                           text_extracted=text if cfg.parse_content
                           else None,
                           metadata=md, status=status,
                           write_limit_reached=limited)
            if r.root_tag and _xml_local(r.root_tag) == "document":
                # flat ODF (.fodt/.fods/.fodp): single-file XML whose
                # root carries office:mimetype; reuse the ODF paragraph
                # walks directly on the document (kernels/odf.py)
                from .xmlparse import xml_events as _xml_events

                fmime = None
                for ev in _xml_events(xtext):
                    if ev[0] == "start":
                        for k, v in ev[2].items():
                            if (k.rsplit(":", 1)[-1] == "mimetype"
                                    and "opendocument" in v):
                                fmime = v
                        break
                if fmime:
                    from .odf import _walk_ods, _walk_odt

                    flat = f"{fmime}-flat-xml"
                    if "spreadsheet" in fmime:
                        orr = _walk_ods(xtext, cfg.max_depth, deadline)
                    else:
                        orr = _walk_odt(xtext, cfg.max_depth, deadline)
                    text, limited = _cap_text(orr.text, cfg.max_chars)
                    md = {"Content-Type": [f"{flat}; charset={cs}"],
                          "Content-Encoding": [cs]}
                    status = STATUS_TRUNCATED if limited else STATUS_OK
                    return res(detected=flat, charset_detected=cs,
                               text_extracted=text if cfg.parse_content
                               else None,
                               metadata=md, status=status,
                               write_limit_reached=limited)
            text, limited = _cap_text(r.text, cfg.max_chars)
            if r.root_tag and r.root_tag.rsplit(":", 1)[-1].lower() == "svg":
                # refine: SVG is XML, but callers filter on the real type;
                # root-element attrs give header-level dims (SVG 1.1 §5.1)
                from .xmlparse import xml_events

                detected = "image/svg+xml"
                svg_dims = {}
                # lazy event scan: stops at the ROOT start tag however
                # long the preamble is — no byte-slice that could truncate
                # an attribute value mid-way
                for ev in xml_events(xtext):
                    if ev[0] == "start":
                        for k in ("width", "height", "viewBox"):
                            if ev[2].get(k):
                                svg_dims[k] = ev[2][k]
                        break
            else:
                svg_dims = {}
            md = {"Content-Type": [f"{detected}; charset={cs}"],
                  "Content-Encoding": [cs],
                  "n-elements": [str(r.n_elements)]}
            if "width" in svg_dims:
                md["Image Width"] = [svg_dims["width"]]
            if "height" in svg_dims:
                md["Image Height"] = [svg_dims["height"]]
            if "viewBox" in svg_dims:
                md["svg:viewBox"] = [svg_dims["viewBox"]]
            if r.root_tag:
                md["xml:root"] = [r.root_tag]
            if r.title:
                md["title"] = [r.title]
                md["dc:title"] = [r.title]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, charset_detected=cs,
                       text_extracted=text if cfg.parse_content else None,
                       title=r.title, metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "text/html":
            cs = charset.detect_charset(data, is_html=True)
            text, cs = charset.decode(data, cs, is_html=True)
            r = parse_html(
                text,
                base_uri=url,
                max_chars=cfg.max_chars,
                max_depth=cfg.max_depth,
                extract_links=cfg.extract_links,
                collapse_anchor_whitespace=cfg.collapse_anchor_whitespace,
                collect_blocks=cfg.extract_main_text,
                deadline=deadline,
                # metadata-only fast path: skip the writer entirely (O26;
                # like the reference's parseContent=false, no content handler
                # means no text assembly and no write limit)
                emit_text=cfg.parse_content,
                meta_tags=cfg.html_meta_tags,
            )
            mtext = boilerplate.main_text(r.blocks) if cfg.extract_main_text else None
            md: dict[str, list[str]] = {
                "Content-Type": [f"{detected}; charset={cs}"],
                "Content-Encoding": [cs],
            }
            if r.title:
                md["title"] = [r.title]
                md["dc:title"] = [r.title]
            if r.links:
                md["n-links"] = [str(len(r.links))]
            for mk, mv in r.meta.items():
                # opt-in <meta name> pairs; never clobber reserved keys
                md.setdefault(mk, [mv])
            status = STATUS_TRUNCATED if r.write_limit_reached else STATUS_OK
            return res(detected=detected, charset_detected=cs,
                       text_extracted=r.text if cfg.parse_content else None,
                       main_text=mtext, title=r.title, links=r.links,
                       metadata=md, status=status,
                       write_limit_reached=r.write_limit_reached)

        if detected == "application/pdf":
            from .tikameta import pdf_tika_metadata

            r = pdf.extract_pdf(
                data,
                max_inflate_ratio=cfg.max_inflate_ratio,
                max_inflate_bytes=cfg.max_inflate_bytes,
                deadline=deadline,
                include_images=cfg.pdf_extract_inline_images,
                collect_embedded=True,
            )
            # /EmbeddedFiles attachments recurse through the dispatcher
            # under the shared deadline/budget (PDF 32000 §7.11.4; Tika's
            # PDFParser embedded-document path); at an exhausted budget
            # recurse_embedded contributes nothing but flags
            # embedded_resource_limit_reached
            pdf_text = r.text
            emb_names = []
            for fname, payload in r.embedded_files:
                try:
                    t2 = recurse_embedded(fname, payload)
                except DeadlineError:
                    raise
                except Exception:
                    t2 = None  # corrupt attachment never fails the PDF
                if t2:
                    pdf_text += (f"[Embedded: {fname}]\n"
                                 + (t2 if t2.endswith("\n") else t2 + "\n"))
                    emb_names.append(fname)
            text, limited = _cap_text(pdf_text, cfg.max_chars)
            # Tika-1.20-parity key set (39 distinct keys on the reference
            # fixture, test/TikaProcessTest.java:129-133); engine fields
            # (resource_name/parsing_time/write_limit_reached) are added on
            # top by res()
            md = pdf_tika_metadata(
                r.metadata, r.metadata.get("pdf:version", ""),
                n_pages=r.n_pages, chars_per_page=r.page_nchars,
                unmapped_per_page=r.page_unmapped)
            for k in ("pdf:image-count", "pdf:inline-image-count"):
                if k in r.metadata:
                    md[k] = [r.metadata[k]]
            if emb_names:
                md["embedded-names"] = emb_names
            title = r.metadata.get("Title")
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, text_extracted=text if cfg.parse_content else None,
                       title=title, metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/rtf":
            from .rtf import extract_rtf

            # no max_chars push-down needed: RTF output is bounded by input
            # size (no decompression; \bin payloads are skipped)
            r = extract_rtf(data, deadline=deadline)
            text, limited = _cap_text(r.text, cfg.max_chars)
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, title=r.title,
                       text_extracted=text if cfg.parse_content else None,
                       metadata={k: [v] for k, v in r.metadata.items()},
                       status=status, write_limit_reached=limited)

        if detected == "message/rfc822":
            from .eml import extract_eml

            r = extract_eml(data, deadline=deadline)
            text, limited = _cap_text(r.text, cfg.max_chars)
            md = {k: [v] for k, v in r.metadata.items()}
            md["n-parts"] = [str(r.n_parts)]
            md["n-attachments"] = [str(r.n_attachments)]
            if r.attachment_names:
                md["attachment-names"] = r.attachment_names
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, title=r.subject,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected in ("application/x-npy", "application/x-safetensors",
                        "application/x-gguf"):
            from .tensors import parse_gguf, parse_npy, parse_safetensors

            # model/tensor artifacts (kernels/tensors.py): catalogue
            # facts from headers only — weight payloads never read
            tm = (parse_npy(data) if detected == "application/x-npy"
                  else parse_safetensors(data)
                  if detected == "application/x-safetensors"
                  else parse_gguf(data))
            md = {"Content-Type": [tm.mime],
                  "tensor-count": [str(tm.n_tensors)]}
            if tm.dtype:
                md["tensor-dtype"] = [tm.dtype]
            if tm.total_params is not None:
                md["tensor-total-params"] = [str(tm.total_params)]
            if tm.arch:
                md["model-architecture"] = [tm.arch]
            if tm.name:
                md["model-name"] = [tm.name]
            for k, v in sorted(tm.fields.items()):
                md[k] = [v]
            return res(detected=tm.mime, text_extracted="",
                       title=tm.name, metadata=md, status=STATUS_OK)

        if detected == "application/postscript":
            from .postscript import BODY_REFUSAL as _PS_REFUSAL
            from .postscript import extract_ps

            # DSC comment metadata; body refused by design (executing
            # the program is the only way to get text — Tika 1.20 has
            # no PS text parser either, kernels/postscript.py)
            r = extract_ps(data)
            md = {"Content-Type": [detected],
                  "body-refusal": [_PS_REFUSAL]}
            if r.version:
                md["ps-dsc-version"] = [r.version]
            if r.eps:
                md["ps-eps"] = ["true"]
            if r.dos_eps:
                md["ps-dos-eps"] = ["true"]
            for k, v in sorted(r.fields.items()):
                md[f"ps-{k.lower()}"] = [v]
            return res(detected=detected,
                       text_extracted="" if cfg.parse_content else None,
                       title=r.fields.get("Title"),
                       metadata=md, status=STATUS_OK)

        if detected == "application/x-shockwave-flash":
            from .swf import extract_swf

            # SWF header facts (kernels/swf.py): stage dims from the
            # bit-packed RECT, frame rate/count; tags never walked
            r = extract_swf(data)
            md = {"Content-Type": [detected],
                  "swf-version": [str(r.version)],
                  "swf-compression": [r.compression],
                  "swf-file-length": [str(r.file_length)],
                  "Image Width": [str(r.width_px)],
                  "Image Height": [str(r.height_px)],
                  "swf-frame-rate": [repr(r.frame_rate)],
                  "swf-frame-count": [str(r.frame_count)]}
            return res(detected=detected, text_extracted="",
                       metadata=md, status=STATUS_OK)

        if detected == "application/x-debian-package":
            from .deb import extract_deb

            # deb(5): control fields into metadata, Description rendered
            # per deb-control(5) as the body; data.tar never decompressed
            r = extract_deb(data, deadline=deadline)
            text, limited = _cap_text(r.description, cfg.max_chars)
            md = {"Content-Type": [detected],
                  "deb-members": list(r.members)}
            for k, v in sorted(r.fields.items()):
                if k != "Description":
                    md[f"deb-{k.lower()}"] = [v]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, title=r.fields.get("Package"),
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/x-rpm":
            from .rpm import extract_rpm

            # RPM lead + header-structure walk (kernels/rpm.py): package
            # facts into metadata, description as the body; the cpio
            # payload is never touched
            r = extract_rpm(data, deadline=deadline)
            text, limited = _cap_text(
                r.fields.get("description", ""), cfg.max_chars)
            md = {"Content-Type": [detected],
                  "rpm-package-type": ["binary" if r.binary_package
                                       else "source"]}
            for k, v in sorted(r.fields.items()):
                if k != "description":
                    md[f"rpm-{k}"] = [v]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, title=r.fields.get("name"),
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/x-ms-shortcut":
            from .lnk import extract_lnk

            # [MS-SHLLNK]: StringData + LinkInfo local base path as
            # queryable facts; the NAME_STRING (comment) is the body
            r = extract_lnk(data)
            text, limited = _cap_text(r.name or "", cfg.max_chars)
            md = {"Content-Type": [detected]}
            for key, val in (("lnk-relative-path", r.relative_path),
                             ("lnk-working-dir", r.working_dir),
                             ("lnk-arguments", r.arguments),
                             ("lnk-icon-location", r.icon_location),
                             ("lnk-local-base-path", r.local_base_path)):
                if val:
                    md[key] = [val]
            md["lnk-target-size"] = [str(r.file_size)]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, title=r.name,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "multipart/related":
            from .mhtml import extract_mhtml

            # RFC 2557 saved web page: root HTML through the walker,
            # sibling resources as metadata (kernels/mhtml.py)
            r = extract_mhtml(data, deadline=deadline)
            text, limited = _cap_text(r.text, cfg.max_chars)
            md = {"Content-Type": [detected],
                  "n-resources": [str(r.n_resources)]}
            if r.snapshot_location:
                md["snapshot-content-location"] = [r.snapshot_location]
            if r.resource_locations:
                md["resource-locations"] = r.resource_locations
            if r.resource_types:
                md["resource-types"] = r.resource_types
            if r.title:
                md["title"] = [r.title]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, title=r.title,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/vnd.ms-tnef":
            from .tnef import extract_tnef

            r = extract_tnef(
                data, deadline=deadline,
                recurse=recurse_embedded)
            text, limited = _cap_text(r.text, cfg.max_chars)
            md = {k: [v] for k, v in r.metadata.items()}
            md["n-attachments"] = [str(r.n_attachments)]
            if r.attachment_names:
                md["attachment-names"] = r.attachment_names
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, title=r.subject,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/x-sqlite3":
            from .sqlite import extract_sqlite

            r = extract_sqlite(data, max_chars=cfg.max_chars,
                               deadline=deadline)
            md = {k: [v] for k, v in r.metadata.items()}
            md["n-tables"] = [str(r.n_tables)]
            if r.table_names:
                md["table-names"] = list(r.table_names)
            status = STATUS_TRUNCATED if r.truncated else STATUS_OK
            return res(detected=detected,
                       text_extracted=r.text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=r.truncated)

        if detected == "application/vnd.ms-outlook-pst":
            from .pst import extract_pst

            r = extract_pst(data, recurse=recurse_embedded,
                            max_chars=cfg.max_chars, deadline=deadline)
            md = {k: [v] for k, v in r.metadata.items()}
            md["n-messages"] = [str(r.n_messages)]
            md["n-folders"] = [str(r.n_folders)]
            if r.folder_names:
                md["folder-names"] = list(r.folder_names)
            status = STATUS_TRUNCATED if r.truncated else STATUS_OK
            return res(detected=detected, title=r.title,
                       text_extracted=r.text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=r.truncated)

        if detected in ("text/vcard", "text/calendar"):
            from .vcal import extract_vcal

            r = extract_vcal(data, deadline=deadline)
            text, limited = _cap_text(r.text, cfg.max_chars)
            md = {k: [v] for k, v in r.metadata.items()}
            md["n-cards" if r.kind == "vcard" else "n-events"] = \
                [str(r.n_components)]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, title=r.title,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/mbox":
            from .mbox import extract_mbox

            r = extract_mbox(data, deadline=deadline)
            text, limited = _cap_text(r.text, cfg.max_chars)
            md = {k: [v] for k, v in r.metadata.items()}
            md["n-messages"] = [str(r.n_messages)]
            if r.n_skipped:
                md["n-skipped-messages"] = [str(r.n_skipped)]
            if r.subjects:
                md["subjects"] = r.subjects
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, title=r.title,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/json" or (
                detected.startswith("text/")
                and (declared or "").split(";")[0].strip().lower()
                == "application/json"):
            # JSON payloads: string-leaf traversal (document order), one
            # line per string value — the shape LLM-pipeline text jobs
            # want from crawled JSON. Malformed JSON degrades to the
            # plain-text path below (never a task failure).
            import json as _json

            cs = charset.detect_charset(data, is_html=False)
            raw_text, cs = charset.decode(data, cs, is_html=False)
            try:
                obj = _json.loads(raw_text)
            except ValueError:
                obj = None
            if obj is not None:
                parts: list[str] = []
                stack = [obj]
                while stack:
                    node = stack.pop()
                    if isinstance(node, str):
                        parts.append(node)
                    elif isinstance(node, dict):
                        stack.extend(reversed(list(node.values())))
                    elif isinstance(node, list):
                        stack.extend(reversed(node))
                    if len(parts) > 1_000_000:
                        raise KernelError("JSON string-leaf cap exceeded")
                text = "\n".join(parts) + ("\n" if parts else "")
                text, limited = _cap_text(text, cfg.max_chars)
                title = (obj.get("title") if isinstance(obj, dict)
                         and isinstance(obj.get("title"), str) else None)
                status = STATUS_TRUNCATED if limited else STATUS_OK
                return res(detected="application/json", title=title,
                           charset_detected=cs,
                           text_extracted=text if cfg.parse_content else None,
                           metadata={"Content-Type": ["application/json"],
                                     "n-string-leaves": [str(len(parts))]},
                           status=status, write_limit_reached=limited)
            # malformed JSON: fall through to plain-text extraction
            detected = "text/plain"

        if detected.startswith("text/"):
            cs = charset.detect_charset(data, is_html=False)
            text, cs = charset.decode(data, cs, is_html=False)
            text, limited = _cap_text(text, cfg.max_chars)
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected, charset_detected=cs,
                       text_extracted=text if cfg.parse_content else None,
                       metadata={"Content-Type": [f"{detected}; charset={cs}"],
                                 "Content-Encoding": [cs]},
                       status=status, write_limit_reached=limited)

        if detected == "application/zip":
            from .epub import EPUB_MIME, extract_epub, sniff_epub

            if sniff_epub(data):
                r = extract_epub(data, max_chars=cfg.max_chars,
                                 max_ratio=cfg.max_inflate_ratio,
                                 max_entry_bytes=cfg.max_inflate_bytes,
                                 max_depth=cfg.max_depth, deadline=deadline)
                # truncation comes from the kernel's write-limit/budget
                # bookkeeping, not raw length — span/div separators bypass
                # the write count, so total length may exceed max_chars
                # without any content loss (same posture as the HTML route)
                text = r.text
                limited = r.truncated
                md = {"Content-Type": [EPUB_MIME],
                      "n-spine-items": [str(r.n_spine)]}
                if r.title:
                    md["title"] = [r.title]
                    md["dc:title"] = [r.title]
                status = STATUS_TRUNCATED if limited else STATUS_OK
                return res(detected=EPUB_MIME, title=r.title,
                           text_extracted=text if cfg.parse_content else None,
                           metadata=md, status=status,
                           write_limit_reached=limited)

            from .iwork import IWORK_MIMES, extract_iwork, sniff_iwork

            if sniff_iwork(data):
                r = extract_iwork(data, max_chars=cfg.max_chars,
                                  max_ratio=cfg.max_inflate_ratio,
                                  max_entry_bytes=cfg.max_inflate_bytes,
                                  deadline=deadline)
                iwork_mime = IWORK_MIMES[r.kind]
                md = {"Content-Type": [iwork_mime],
                      "n-paragraphs": [str(r.n_paragraphs)]}
                status = STATUS_TRUNCATED if r.truncated else STATUS_OK
                return res(detected=iwork_mime,
                           text_extracted=r.text if cfg.parse_content
                           else None,
                           metadata=md, status=status,
                           write_limit_reached=r.truncated)

            from .odf import extract_odf, sniff_odf

            odf_mime = sniff_odf(data)
            if odf_mime is not None:
                r = extract_odf(data, max_ratio=cfg.max_inflate_ratio,
                                max_entry_bytes=cfg.max_inflate_bytes,
                                max_depth=cfg.max_depth, deadline=deadline)
                text, limited = _cap_text(r.text, cfg.max_chars)
                md = {"Content-Type": [odf_mime]}
                if r.kind == "odt":
                    md["n-paragraphs"] = [str(r.n_paragraphs)]
                elif r.kind == "odp":
                    md["n-paragraphs"] = [str(r.n_paragraphs)]
                    md["n-slides"] = [str(r.n_pages)]
                else:
                    md["n-tables"] = [str(r.n_tables)]
                    md["sheet-names"] = r.sheet_names
                status = STATUS_TRUNCATED if limited else STATUS_OK
                return res(detected=odf_mime,
                           text_extracted=text if cfg.parse_content else None,
                           metadata=md, status=status,
                           write_limit_reached=limited)

            # XPS runs AFTER the prefix-sniffing kinds (epub/
            # iwork/odf have first-local-header fast paths;
            # sniff_xps reads the central directory)
            from .xps import XPS_MIME, extract_xps, sniff_xps

            if sniff_xps(data):
                r = extract_xps(data, max_chars=cfg.max_chars,
                                max_ratio=cfg.max_inflate_ratio,
                                max_entry_bytes=cfg.max_inflate_bytes,
                                deadline=deadline)
                md = {"Content-Type": [XPS_MIME],
                      "n-pages": [str(r.n_pages)],
                      "n-glyph-runs": [str(r.n_runs)]}
                status = STATUS_TRUNCATED if r.truncated else STATUS_OK
                return res(detected=XPS_MIME,
                           text_extracted=r.text if cfg.parse_content
                           else None,
                           metadata=md, status=status,
                           write_limit_reached=r.truncated)

            from .container import extract_zip_container

            r = extract_zip_container(
                data, max_chars=cfg.max_chars,
                max_ratio=cfg.max_inflate_ratio,
                max_entry_bytes=cfg.max_inflate_bytes,
                deadline=deadline,
                recurse=recurse_embedded)
            md = {k: [v] for k, v in r.metadata.items() if k != "Content-Type"}
            if r.embedded_names:
                # same multi-element list shape as the .doc/.pdf paths;
                # carried as a real list end-to-end (ADVICE r3)
                md["embedded-names"] = list(r.embedded_names)
            refined = r.metadata.get("Content-Type", detected)
            md["Content-Type"] = [refined]
            if r.entries:
                md["container-entries"] = [str(len(r.entries))]
            title = r.metadata.get("dc:title")
            status = STATUS_TRUNCATED if r.truncated else STATUS_OK
            return res(detected=refined, title=title,
                       text_extracted=r.text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=r.truncated)

        if detected in ("application/gzip", "application/x-bzip2",
                        "application/x-xz", "application/zstd",
                        "application/x-lz4", "application/x-compress",
                        "application/x-lzma", "application/x-snappy",
                        "application/zlib"):
            # single-member compressed wrapper (.txt.gz / .csv.bz2 /
            # .tar.xz / .zst ...): guarded decompress (stdlib codec, or
            # the from-scratch RFC 8878 decoder for zstd — Python 3.11
            # ships none), then re-dispatch on the inner payload under
            # the shared deadline
            cap = min(int(max(n_bytes, 1024) * cfg.max_inflate_ratio),
                      cfg.max_inflate_bytes)
            if detected == "application/gzip":
                import zlib as _zlib

                codec, suffix = "gzip", ".gz"
                d = _zlib.decompressobj(16 + _zlib.MAX_WBITS)  # gzip framing
                inner = d.decompress(data, cap)
                # unconsumed_tail = output cap hit; not eof = truncated
                # archive — both fail closed (a truncated .gz must never
                # flow downstream as clean-but-corrupt text)
                overflow = bool(d.unconsumed_tail) or not d.eof
            elif detected == "application/x-bzip2":
                import bz2 as _bz2

                codec, suffix = "bzip2", ".bz2"
                d = _bz2.BZ2Decompressor()
                inner = d.decompress(data, max_length=cap)
                overflow = not d.eof
            elif detected == "application/zstd":
                from .zstd import decompress_zstd

                codec, suffix = "zstd", ".zst"
                # raises InflateRatioError past cap / KernelError on
                # corruption -> failed status via the outer handler
                inner = decompress_zstd(data, cap)
                overflow = False
            elif detected == "application/x-lz4":
                from .lz4 import decompress_lz4

                codec, suffix = "lz4", ".lz4"
                inner = decompress_lz4(data, cap)
                overflow = False
            elif detected == "application/x-compress":
                from .zcompress import decompress_z

                codec, suffix = "compress", ".z"
                # from-scratch LZW (stdlib has none); raises
                # InflateRatioError past cap / KernelError on corruption
                inner = decompress_z(data, cap, deadline=deadline)
                overflow = False
            elif detected == "application/x-snappy":
                from .snappy import decompress_framed

                codec, suffix = "snappy", ".sz"
                # from-scratch framing decoder, per-chunk CRC-32C
                # verified; raises InflateRatioError / KernelError
                inner = decompress_framed(data, cap)
                overflow = False
            elif detected == "application/zlib":
                import zlib as _zlib

                codec, suffix = "deflate", ".zz"
                d = _zlib.decompressobj()  # zlib wrapper (RFC 1950)
                inner = d.decompress(data, cap)
                overflow = bool(d.unconsumed_tail) or not d.eof
            elif detected == "application/x-lzma":
                import lzma as _lzma

                codec, suffix = "lzma", ".lzma"
                d = _lzma.LZMADecompressor(format=_lzma.FORMAT_ALONE)
                inner = d.decompress(data, max_length=cap)
                # eof is set on the declared size OR the EOS marker
                # (unknown-size streams carry one) — absent both, the
                # stream is truncated or over-cap; fail closed
                overflow = not d.eof
            else:
                import lzma as _lzma

                codec, suffix = "xz", ".xz"
                d = _lzma.LZMADecompressor(format=_lzma.FORMAT_XZ)
                inner = d.decompress(data, max_length=cap)
                overflow = not d.eof
            if overflow:
                return res(detected=detected, status=STATUS_FAILED,
                           error=f"InflateRatioError: {codec} payload "
                                 f"exceeds inflate cap {cap}B (or archive "
                                 f"is truncated)")
            inner_codec = ("gzip" if inner[:2] == b"\x1f\x8b"
                           else "compress" if inner[:2] == b"\x1f\x9d"
                           else "bzip2" if inner[:3] == b"BZh"
                           else "xz" if inner[:6] == b"\xfd7zXZ\x00"
                           else "zstd" if inner[:4] == b"\x28\xb5\x2f\xfd"
                           else "lz4" if inner[:4] in (b"\x04\x22\x4d\x18",
                                                       b"\x02\x21\x4c\x18")
                           else "lzma" if inner[:3] == b"\x5d\x00\x00"
                           else "snappy" if inner[:10] ==
                           b"\xff\x06\x00\x00sNaPpY"
                           else "deflate" if inner[:2] in (b"\x78\x9c",
                                                           b"\x78\xda")
                           else None)
            if inner_codec is not None:
                # compressed-in-compressed chains compound the ratio
                # guard without bound — refuse instead of recursing
                return res(detected=detected, status=STATUS_FAILED,
                           error=f"nested {inner_codec} refused "
                                 "(ratio-compounding bomb)")
            inner_name = (url[: -len(suffix)]
                          if url.lower().endswith(suffix) else url)
            # transparent wrapper: SAME embed depth (no level consumed)
            # but the budget and path prefix must survive the hop — a
            # reset would let .zst/.msg alternation nest unboundedly
            # and would strip parents from embedded_resource_path
            # (r5 review)
            r = extract_document(inner_name, None, inner, cfg,
                                 true_size=len(inner), _deadline=deadline,
                                 embed_depth=embed_depth,
                                 _embed_path=_embed_path)
            md = dict(r.metadata)
            md["Content-Encoding-Outer"] = [codec]
            return res(detected=r.content_type_detected,
                       charset_detected=r.charset_detected,
                       text_extracted=r.text_extracted if cfg.parse_content else None,
                       main_text=r.main_text, title=r.title, links=r.links,
                       metadata=md, status=r.status, error=r.error,
                       write_limit_reached=r.write_limit_reached)

        if detected == "application/x-7z-compressed":
            from .sevenzip import extract_7z

            r = extract_7z(
                data, max_chars=cfg.max_chars,
                max_ratio=cfg.max_inflate_ratio,
                max_entry_bytes=cfg.max_inflate_bytes,
                deadline=deadline,
                recurse=recurse_embedded)
            md = {"Content-Type": ["application/x-7z-compressed"]}
            if r.entries:
                md["container-entries"] = [str(len(r.entries))]
            status = STATUS_TRUNCATED if r.truncated else STATUS_OK
            return res(detected=detected,
                       text_extracted=r.text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=r.truncated)

        if detected == "application/vnd.ms-cab-compressed":
            from .cab import extract_cab

            r = extract_cab(
                data, max_chars=cfg.max_chars,
                max_ratio=cfg.max_inflate_ratio,
                max_entry_bytes=cfg.max_inflate_bytes,
                deadline=deadline,
                recurse=recurse_embedded)
            md = {"Content-Type": ["application/vnd.ms-cab-compressed"]}
            if r.entries:
                md["container-entries"] = [str(len(r.entries))]
            for k, v in r.metadata.items():
                if k != "Content-Type":
                    md[k] = [v]
            status = STATUS_TRUNCATED if r.truncated else STATUS_OK
            return res(detected=detected,
                       text_extracted=r.text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=r.truncated)

        if detected == "application/x-tar":
            from .container import extract_tar_container

            r = extract_tar_container(
                data, max_chars=cfg.max_chars,
                max_ratio=cfg.max_inflate_ratio,
                max_entry_bytes=cfg.max_inflate_bytes,
                deadline=deadline,
                recurse=recurse_embedded)
            md = {"Content-Type": ["application/x-tar"]}
            if r.entries:
                md["container-entries"] = [str(len(r.entries))]
            status = STATUS_TRUNCATED if r.truncated else STATUS_OK
            return res(detected=detected,
                       text_extracted=r.text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=r.truncated)

        if detected == "application/x-lha":
            from .lha import BODY_REFUSAL as _LHA_REFUSAL
            from .lha import extract_lha

            r = extract_lha(
                data, max_chars=cfg.max_chars,
                max_ratio=cfg.max_inflate_ratio,
                max_entry_bytes=cfg.max_inflate_bytes,
                deadline=deadline,
                recurse=recurse_embedded)
            md = {"Content-Type": ["application/x-lha"],
                  "container-entries": [str(len(r.entries))],
                  "lha-stored": [str(r.n_stored)],
                  "lha-compressed": [str(r.n_compressed)]}
            if r.methods:
                md["lha-methods"] = list(dict.fromkeys(r.methods))
            if r.n_compressed:
                md["body-refusal"] = [_LHA_REFUSAL]
            status = STATUS_TRUNCATED if r.truncated else STATUS_OK
            return res(detected=detected,
                       text_extracted=r.text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=r.truncated)

        if detected == "application/x-iso9660-image":
            from .iso9660 import extract_iso

            r = extract_iso(
                data, max_chars=cfg.max_chars,
                max_ratio=cfg.max_inflate_ratio,
                max_entry_bytes=cfg.max_inflate_bytes,
                deadline=deadline,
                recurse=recurse_embedded)
            md = {"Content-Type": ["application/x-iso9660-image"]}
            md.update({k: [v] for k, v in r.metadata.items()
                       if k != "Content-Type"})
            if r.entries:
                md["container-entries"] = [str(len(r.entries))]
                md["iso-entry-names"] = list(r.entries)
            status = STATUS_TRUNCATED if r.truncated else STATUS_OK
            return res(detected=detected,
                       text_extracted=r.text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=r.truncated)

        if detected == "application/vnd.ms-htmlhelp":
            from .chm import extract_chm

            r = extract_chm(
                data, max_chars=cfg.max_chars,
                max_ratio=cfg.max_inflate_ratio,
                max_entry_bytes=cfg.max_inflate_bytes,
                deadline=deadline,
                recurse=recurse_embedded)
            md = dict(r.metadata)
            if r.entries:
                md["container-entries"] = [str(len(r.entries))]
            if r.title:
                md["title"] = [r.title]
            status = STATUS_TRUNCATED if r.truncated else STATUS_OK
            return res(detected=detected, title=r.title,
                       text_extracted=r.text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=r.truncated)

        if detected == "application/x-dbf":
            from .dbf import parse_dbf

            # max_chars < 0 means unlimited; the kernel still needs a
            # hard memory guard against record-count bombs
            kern_cap = cfg.max_chars if cfg.max_chars > 0 else (1 << 24)
            r = parse_dbf(data, max_chars=kern_cap, deadline=deadline)
            text, limited = _cap_text(r.render_text(), cfg.max_chars)
            md = {"Content-Type": ["application/x-dbf"],
                  "dbf-version": [f"{r.version:#x}"],
                  "dbf-records": [str(r.n_records)],
                  "dbf-fields": [str(len(r.fields))],
                  "dbf-last-update": [r.last_update],
                  "dbf-field-names": [f.name for f in r.fields]}
            limited = limited or r.truncated
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/x-matlab-data":
            from .matfile import parse_mat

            r = parse_mat(data, deadline=deadline)
            text, limited = _cap_text(r.render_text(), cfg.max_chars)
            md = {"Content-Type": ["application/x-matlab-data"],
                  "mat-header": [r.header_text],
                  "mat-variables": [str(len(r.variables))]}
            if r.variables:
                md["mat-variable-names"] = [v.name for v in r.variables]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/vnd.ms-excel":
            # RAW pre-OLE2 BIFF2/3/4 worksheet (detect_mime only yields
            # this MIME for validator-passed raw streams; OLE2-wrapped
            # .xls arrives as x-tika-msoffice). POI OldExcelExtractor
            # parity via kernels/oldxls.py.
            from .oldxls import extract_old_biff_raw

            r = extract_old_biff_raw(data, deadline=deadline)
            text, limited = _cap_text(r.text, cfg.max_chars)
            md = {"Content-Type": ["application/vnd.ms-excel"],
                  "biff-version": [str(r.biff_version)],
                  "n-cells": [str(r.n_cells)]}
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "video/x-flv":
            from .flv import parse_flv, render_meta_value

            # FLVParser parity (Tika 1.20 via tika-parsers): header
            # audio/video flags + every onMetaData AMF0 scalar
            r = parse_flv(data, deadline=deadline)
            md = {"Content-Type": ["video/x-flv"],
                  "hasAudio": ["true" if r.has_audio else "false"],
                  "hasVideo": ["true" if r.has_video else "false"]}
            for k, v in r.entries[:64]:
                md.setdefault(k, []).append(render_meta_value(v))
            return res(detected=detected,
                       text_extracted="" if cfg.parse_content else None,
                       metadata=md, status=STATUS_OK)

        if detected == "application/x-bittorrent":
            from .torrent import parse_torrent

            # metainfo inventory; the pieces hash blob is measured,
            # never decoded (beyond Tika 1.20 parity — no bencode)
            r = parse_torrent(data, deadline=deadline)
            text, limited = _cap_text(r.render_text(), cfg.max_chars)
            md = {"Content-Type": ["application/x-bittorrent"],
                  "torrent-files": [str(len(r.files))],
                  "torrent-total-bytes": [str(r.total_length)],
                  "torrent-piece-length": [str(r.piece_length)]}
            if r.name:
                md["title"] = [r.name]
            if r.created_by:
                md["torrent-created-by"] = [r.created_by]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       title=r.name,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/x-orc":
            from .orc import parse_orc

            # metadata-first footer walk (from-scratch protobuf wire
            # reader) — stripe data never touched
            r = parse_orc(data, deadline=deadline)
            text, limited = _cap_text(r.render_text(), cfg.max_chars)
            md = {"Content-Type": ["application/x-orc"],
                  "orc-rows": [str(r.n_rows)],
                  "orc-stripes": [str(r.n_stripes)],
                  "orc-compression": [r.compression]}
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/x-parquet":
            from .parquetmeta import parse_parquet

            # metadata-first footer walk (from-scratch Thrift compact
            # reader) — no page data touched, no native decoder
            r = parse_parquet(data, deadline=deadline)
            text, limited = _cap_text(r.render_text(), cfg.max_chars)
            md = {"Content-Type": ["application/x-parquet"],
                  "parquet-rows": [str(r.n_rows)],
                  "parquet-row-groups": [str(r.n_row_groups)],
                  "parquet-version": [str(r.version)]}
            if r.created_by:
                md["parquet-created-by"] = [r.created_by]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/avro":
            from .avro import parse_avro

            # metadata-first: schema + exact framing counts, payloads
            # never decoded (beyond Tika 1.20 parity — no Avro parser)
            r = parse_avro(data, deadline=deadline)
            text, limited = _cap_text(r.render_text(), cfg.max_chars)
            md = {"Content-Type": ["application/avro"],
                  "avro-codec": [r.codec],
                  "avro-records": [str(r.n_records)],
                  "avro-blocks": [str(r.n_blocks)]}
            if r.truncated_tail:
                md["avro-truncated-tail"] = ["true"]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/applefile":
            from .applefile import APPLEFILE_MIME, parse_applefile

            # AppleSingleFileParser parity (Tika 1.20): real-name
            # metadata; an AppleSingle data fork re-dispatches under
            # the real name (transparent-wrapper posture — same embed
            # depth, shared budget/deadline); AppleDouble is the
            # resource-fork half only -> metadata row
            af = parse_applefile(data)
            md = {"Content-Type": [APPLEFILE_MIME],
                  "apple-format": [af.kind]}
            if af.real_name:
                md["apple-real-name"] = [af.real_name]
            if af.comment:
                md["apple-comment"] = [af.comment]
            if af.resource_fork_len:
                md["apple-resource-fork-bytes"] = [
                    str(af.resource_fork_len)]
            if af.kind == "applesingle" and af.data_fork is not None:
                if af.data_fork[:4] == b"\x00\x05\x16\x00":
                    # AppleSingle-in-AppleSingle: the re-dispatch is a
                    # transparent wrapper at the SAME embed depth, so a
                    # crafted chain nests unboundedly (150 KB reaches
                    # 3000 deep) with only RecursionError to stop it —
                    # refuse like the gzip nested-codec path (r7 ADVICE)
                    return res(detected=APPLEFILE_MIME,
                               status=STATUS_FAILED,
                               error="nested applesingle refused "
                                     "(wrapper-chain bomb)",
                               metadata=md)
                inner_name = af.real_name or url
                r = extract_document(inner_name, None, af.data_fork, cfg,
                                     true_size=len(af.data_fork),
                                     _deadline=deadline,
                                     embed_depth=embed_depth,
                                     _embed_path=_embed_path)
                inner_md = dict(r.metadata)
                inner_md.update(md)
                inner_md["Content-Type"] = [r.content_type_detected]
                inner_md["Content-Encoding-Outer"] = ["applesingle"]
                return res(detected=r.content_type_detected,
                           charset_detected=r.charset_detected,
                           text_extracted=r.text_extracted
                           if cfg.parse_content else None,
                           main_text=r.main_text, title=r.title,
                           links=r.links, metadata=inner_md,
                           status=r.status, error=r.error,
                           write_limit_reached=r.write_limit_reached)
            return res(detected=APPLEFILE_MIME,
                       text_extracted="" if cfg.parse_content else None,
                       metadata=md, status=STATUS_OK)

        if detected == "application/x-bplist":
            from .bplist import parse_bplist

            # string leaves in walk order (the JSON-kernel posture);
            # beyond Tika 1.20 parity (bplist parsing landed TIKA-2619)
            r = parse_bplist(data, deadline=deadline)
            text, limited = _cap_text(r.text, cfg.max_chars)
            md = {"Content-Type": ["application/x-bplist"],
                  "bplist-objects": [str(r.n_objects)],
                  "bplist-top-type": [r.top_type]}
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/java-vm":
            from .javaclass import parse_javaclass

            # ClassParser parity (Tika 1.20 via tika-parsers): javap-
            # style identifier listing; class name doubles as the title
            r = parse_javaclass(data, deadline=deadline)
            text, limited = _cap_text(r.render_text(), cfg.max_chars)
            md = {"Content-Type": ["application/java-vm"],
                  "title": [r.simple_name],
                  "class-name": [r.class_name],
                  "java-version": [r.java_version],
                  "n-fields": [str(len(r.fields))],
                  "n-methods": [str(len(r.methods))]}
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected in ("image/wmf", "image/emf"):
            from .metafile import parse_emf, parse_wmf

            # WMFParser/EMFParser parity (Tika 1.20 via tika-parsers):
            # one line per text-output record; frame dims as metadata
            r = (parse_wmf(data, deadline=deadline)
                 if detected == "image/wmf"
                 else parse_emf(data, deadline=deadline))
            text, limited = _cap_text(r.text, cfg.max_chars)
            md = {"Content-Type": [detected],
                  "metafile-records": [str(r.n_records)],
                  "metafile-text-records": [str(len(r.texts))],
                  "width-units": [str(r.width_units)],
                  "height-units": [str(r.height_units)]}
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected == "application/x-netcdf":
            from .netcdf import parse_netcdf

            # NetCDFParser parity (Tika 1.20 via tika-parsers): global
            # attributes as metadata, dim/var inventory as the body
            r = parse_netcdf(data, deadline=deadline)
            text, limited = _cap_text(r.render_text(), cfg.max_chars)
            md = {"Content-Type": ["application/x-netcdf"],
                  "netcdf-version": ["classic" if r.version == 1
                                     else "64-bit-offset"],
                  "netcdf-dimensions": [str(len(r.dims))],
                  "netcdf-variables": [str(len(r.variables))],
                  "netcdf-records": [str(r.numrecs)]}
            for aname, aval in r.gatts[:64]:
                md.setdefault(f"netcdf:{aname}", []).append(aval[:512])
            title = next((v for k, v in r.gatts if k == "title"), None)
            if title:
                md["title"] = [title]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, title=title, status=status,
                       write_limit_reached=limited)

        if detected == "application/x-hdf5":
            from .hdf5 import parse_hdf5

            # HDFParser parity (Tika 1.20 via tika-parsers): attributes
            # as metadata, group/dataset inventory as the body
            r = parse_hdf5(data, deadline=deadline)
            text, limited = _cap_text(r.render_text(), cfg.max_chars)
            md = {"Content-Type": [detected],
                  "hdf5-groups": [str(len(r.groups))],
                  "hdf5-datasets": [str(len(r.datasets))]}
            for aname, aval in r.root_attrs[:64]:
                md.setdefault(f"hdf5:{aname}", []).append(aval[:512])
            title = next((v for k, v in r.root_attrs if k == "title"),
                         None)
            if title:
                md["title"] = [title]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected=detected,
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, title=title, status=status,
                       write_limit_reached=limited)

        if detected == "application/vnd.wordperfect":
            from .wpd import BODY_REFUSAL, parse_wpd_header

            # WordPerfectParser parity, metadata-first by design: the
            # public 16-byte WPFF prefix extracts faithfully; the
            # function-code body is refused (kernels/wpd.py docstring)
            h = parse_wpd_header(data)
            md = {"Content-Type": [detected],
                  "wpd-version": [h.version_label],
                  "wpd-major-version": [str(h.major_version)],
                  "wpd-minor-version": [str(h.minor_version)],
                  "wpd-file-type": [str(h.file_type)],
                  "wpd-doc-area-pointer": [str(h.doc_area_pointer)],
                  "body-refusal": [BODY_REFUSAL]}
            return res(detected=detected,
                       text_extracted="" if cfg.parse_content else None,
                       metadata=md, status=STATUS_OK)

        if detected == "image/vnd.dwg":
            from .dwg import BODY_REFUSAL as _DWG_REFUSAL
            from .dwg import parse_dwg_version

            # DWGParser parity, detection-first by design: the public
            # 6-byte version signature extracts faithfully; the
            # version-specific header sections are refused
            # (kernels/dwg.py docstring)
            ver, release = parse_dwg_version(data)
            md = {"Content-Type": [detected],
                  "dwg-version": [ver],
                  "dwg-release": [release],
                  "body-refusal": [_DWG_REFUSAL]}
            return res(detected=detected,
                       text_extracted="" if cfg.parse_content else None,
                       metadata=md, status=STATUS_OK)

        if detected == "audio/midi":
            from .midi import parse_midi

            # MidiParser parity: track/patch facts + embedded text
            # (karaoke lyrics, track names) as the body
            r = parse_midi(data, deadline=deadline)
            text, limited = _cap_text(r.text, cfg.max_chars)
            md = {"Content-Type": ["audio/midi"],
                  "midi-format": [str(r.format)],
                  "midi-tracks": [str(r.n_tracks)],
                  "midi-division": [str(r.division)]}
            if r.track_names:
                md["midi-track-names"] = r.track_names
            if r.copyright:
                md["midi-copyright"] = [r.copyright]
            status = STATUS_TRUNCATED if limited else STATUS_OK
            return res(detected="audio/midi",
                       text_extracted=text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=limited)

        if detected in ("application/x-font-ttf", "application/x-font-otf",
                        "application/font-woff",
                        "application/font-woff2"):
            from .font import parse_font

            # metadata-only (TrueTypeParser parity: names + counts)
            md = parse_font(data)
            title = md.get("font-name", md.get("font-family", [None]))[0]
            if title:
                md["title"] = [title]
            return res(detected=md["Content-Type"][0], metadata=md,
                       title=title, status=STATUS_OK)

        if detected in ("application/x-executable",
                        "application/x-msdownload",
                        "application/x-mach-binary"):
            from .executable import parse_executable

            # metadata-only by design (ExecutableParser parity: Tika
            # 1.20 reports platform facts, never text)
            md = parse_executable(data)
            return res(detected=md["Content-Type"][0], metadata=md,
                       status=STATUS_OK)

        if detected in ("application/x-archive", "application/x-cpio",
                        "application/x-arj"):
            from .container import (extract_ar_container,
                                    extract_arj_container,
                                    extract_cpio_container)

            fn = {"application/x-archive": extract_ar_container,
                  "application/x-cpio": extract_cpio_container,
                  "application/x-arj": extract_arj_container}[detected]
            r = fn(
                data, max_chars=cfg.max_chars,
                max_ratio=cfg.max_inflate_ratio,
                max_entry_bytes=cfg.max_inflate_bytes,
                deadline=deadline,
                recurse=recurse_embedded)
            md = {"Content-Type": [detected]}
            if r.entries:
                md["container-entries"] = [str(len(r.entries))]
            refused = r.metadata.get("compression-refused")
            if refused:
                md["compression-refused"] = [refused]
            status = STATUS_TRUNCATED if r.truncated else STATUS_OK
            return res(detected=detected,
                       text_extracted=r.text if cfg.parse_content else None,
                       metadata=md, status=status,
                       write_limit_reached=r.truncated)

        if detected == "application/x-tika-msoffice":
            from .ole2 import Ole2File
            from .xls import extract_xls

            ole = Ole2File(data)  # structure errors -> KernelError -> failed
            # dispatch on ROOT-LEVEL stream names: an embedded Workbook
            # inside a .doc's ObjectPool must not reroute the whole file
            # (tree-scoped lookups, invariant 12); flat legacy writers
            # degrade to the all-entries view inside root_children()
            streams = {e.name for e in ole.root_children() if e.obj_type == 2}

            if "Workbook" in streams or "Book" in streams:
                from .olemeta import extract_ole_properties
                from .tikameta import xls_tika_metadata

                r = extract_xls(data, deadline=deadline)
                text, limited = _cap_text(r.text, cfg.max_chars)
                # Tika-1.20-parity key set from the OLE2 property sets (23
                # distinct keys on the reference fixture,
                # test/TikaProcessTest.java:124-128) + engine fields
                summary, docsum = extract_ole_properties(ole)
                md = xls_tika_metadata(summary, docsum)
                md["sheet-names"] = r.sheet_names
                md["n-cells"] = [str(r.n_cells)]
                if r.biff_version != 8:
                    md["biff-version"] = [str(r.biff_version)]
                status = STATUS_TRUNCATED if limited else STATUS_OK
                return res(detected="application/vnd.ms-excel",
                           text_extracted=text if cfg.parse_content else None,
                           metadata=md, status=status,
                           write_limit_reached=limited)
            if "WordDocument" in streams:
                from .doc import embedded_objects, extract_doc_ole
                from .ole2 import ScopedOle
                from .xls import extract_xls_ole

                r = extract_doc_ole(ole, deadline=deadline)
                # ObjectPool payload recursion: packaged bytes re-enter the
                # dispatcher; embedded compound docs run their office
                # kernel over a tree-scoped view (never re-serialized)
                doc_text = r.text
                emb_names: list[str] = []
                for obj in embedded_objects(ole):
                    try:
                        if obj.kind == "bytes":
                            t2 = recurse_embedded(
                                obj.filename or obj.name, obj.data)
                        elif embed_budget <= 0:
                            # office sub-storages would parse below;
                            # budget exhausted -> flag, no text
                            _embed_limit[0] = True
                            t2 = None
                        else:
                            sub = ScopedOle(ole, obj.storage)
                            # classify by DIRECT children only — the
                            # subtree set would let a nested
                            # ObjectPool's Workbook misroute an
                            # embedded Word doc (invariant 12)
                            subnames = {e.name
                                        for e in sub.root_children()
                                        if e.obj_type == 2}
                            if subnames & {"Workbook", "Book"}:
                                t2 = extract_xls_ole(
                                    sub, deadline=deadline).text
                            elif "WordDocument" in subnames:
                                t2 = extract_doc_ole(
                                    sub, deadline=deadline).text
                            elif "PowerPoint Document" in subnames:
                                from .ppt import extract_ppt_ole

                                t2 = extract_ppt_ole(
                                    sub, deadline=deadline).text
                            else:
                                t2 = None
                            if t2 is not None:
                                # tree-scoped office parse: record the
                                # child path (no dispatcher re-entry)
                                embed_paths.append(embed_child_path(
                                    obj.filename or obj.name))
                    except DeadlineError:
                        raise
                    except Exception:
                        t2 = None  # corrupt embed never fails the doc
                    if t2:
                        label = obj.filename or obj.name
                        doc_text += (f"[Embedded: {label}]\n"
                                     + (t2 if t2.endswith("\n")
                                        else t2 + "\n"))
                        emb_names.append(label)
                text, limited = _cap_text(doc_text, cfg.max_chars)
                status = STATUS_TRUNCATED if limited else STATUS_OK
                md = {"Content-Type": ["application/msword"],
                      "n-text-pieces": [str(r.n_pieces)],
                      "n-chars-main": [str(r.n_chars_main)]}
                if r.n_chars_footnotes:
                    md["n-chars-footnotes"] = [str(r.n_chars_footnotes)]
                if r.n_chars_headers:
                    md["n-chars-headers"] = [str(r.n_chars_headers)]
                if r.n_embedded_objects:
                    md["n-embedded-objects"] = [str(r.n_embedded_objects)]
                if emb_names:
                    md["embedded-names"] = emb_names
                return res(detected="application/msword",
                           text_extracted=text if cfg.parse_content else None,
                           metadata=md,
                           status=status, write_limit_reached=limited)
            if "VisioDocument" in streams:
                from .visio import BODY_REFUSAL, VSD_MIME, extract_visio

                # metadata-first by design: signature + OLE2 property
                # sets extract faithfully; the HDGF LZW-variant body is
                # refused rather than risking silently garbled text
                r = extract_visio(ole, deadline=deadline)
                md = {"Content-Type": [VSD_MIME],
                      "visio-signature": [r.signature],
                      "visio-stream-bytes": [str(r.stream_bytes)],
                      "body-refusal": [BODY_REFUSAL]}
                for k in ("title", "subject", "author", "keywords",
                          "comments", "last_author", "app_name",
                          "create_dtm", "last_save_dtm"):
                    v = r.summary.get(k)
                    if v not in (None, ""):
                        md[k] = [str(v)]
                for k in ("company", "manager", "category"):
                    v = r.docsum.get(k)
                    if v not in (None, ""):
                        md[k] = [str(v)]
                title = r.summary.get("title")
                return res(detected=VSD_MIME,
                           text_extracted="" if cfg.parse_content else None,
                           title=str(title) if title else None,
                           metadata=md, status=STATUS_OK)
            if "PP40" in streams:
                # PowerPoint 4.x: Tika 1.20's POIFSContainerDetector
                # keys the PowerPoint type on a PP40 root stream; POI
                # HSLF has no pre-97 reader — structured refusal
                from .ppt import OLD_PPT_REFUSAL

                return res(detected="application/vnd.ms-powerpoint",
                           status=STATUS_UNSUPPORTED,
                           metadata={"Content-Type":
                                     ["application/vnd.ms-powerpoint"],
                                     "ppt-format": ["powerpoint-4.x"],
                                     "refusal-reason": [OLD_PPT_REFUSAL]},
                           error="old-format PowerPoint 4.x, "
                                 "refused by design")
            if "PowerPoint Document" in streams:
                from .ppt import OLD_PPT_REFUSAL, doc_file_version, \
                    extract_ppt

                ver = doc_file_version(ole)
                if ver is not None and ver != 0x03F4:
                    # PowerPoint 95: Current User carries a pre-97
                    # docFileVersion ([MS-PPT] §2.3.2 requires 0x03F4
                    # for 97+) — the same check POI's CurrentUserAtom
                    # uses before OldPowerPointFormatException
                    return res(detected="application/vnd.ms-powerpoint",
                               status=STATUS_UNSUPPORTED,
                               metadata={"Content-Type":
                                         ["application/vnd.ms-powerpoint"],
                                         "ppt-format": ["powerpoint-95"],
                                         "ppt-doc-file-version": [str(ver)],
                                         "refusal-reason":
                                         [OLD_PPT_REFUSAL]},
                               error="old-format PowerPoint 95, "
                                     "refused by design")
                r = extract_ppt(data, deadline=deadline)
                text, limited = _cap_text(r.text, cfg.max_chars)
                status = STATUS_TRUNCATED if limited else STATUS_OK
                return res(detected="application/vnd.ms-powerpoint",
                           text_extracted=text if cfg.parse_content else None,
                           metadata={"Content-Type": ["application/vnd.ms-powerpoint"],
                                     "n-text-atoms": [str(r.n_atoms)]},
                           status=status, write_limit_reached=limited)
            from .msg import extract_msg, is_msg, MSG_MIME

            if is_msg(list(streams)):
                r = extract_msg(
                    ole,
                    recurse=recurse_embedded,
                    embed_budget=max(embed_budget, 0))
                # embedded MESSAGES descend inside msg.py (tree-scoped,
                # no dispatcher re-entry): merge their relative paths /
                # budget-floor flag into the reference-named keys
                embed_paths.extend(f"{_embed_path}/{p}"
                                   for p in r.embedded_paths)
                if r.embed_limit_hit:
                    _embed_limit[0] = True
                text, limited = _cap_text(r.text, cfg.max_chars)
                md = {k: [v] for k, v in r.metadata.items()}
                md["n-recipients"] = [str(r.n_recipients)]
                md["n-attachments"] = [str(r.n_attachments)]
                status = STATUS_TRUNCATED if limited else STATUS_OK
                return res(detected=MSG_MIME, title=r.subject,
                           text_extracted=text if cfg.parse_content else None,
                           metadata=md, status=status,
                           write_limit_reached=limited)
            # bare embedded-object container (the shape OOXML
            # word/embeddings/oleObject*.bin takes): a root-level
            # Ole10Native packager record wraps a real payload —
            # re-dispatch it like a transparent wrapper (gzip posture)
            native = next((e for e in ole.root_children()
                           if e.obj_type == 2
                           and e.name == "\x01Ole10Native"), None)
            if native is not None and embed_budget > 0:
                from .doc import _parse_ole10native

                fname, payload = _parse_ole10native(ole.read_entry(native))
                if payload is not None:
                    r = extract_document(fname or url, None, payload, cfg,
                                         embed_depth=embed_depth + 1,
                                         _deadline=deadline)
                    md = dict(r.metadata)
                    md["Ole10Native-Wrapper"] = ["true"]
                    if fname:
                        md["embedded-filename"] = [fname]
                    return res(detected=r.content_type_detected,
                               charset_detected=r.charset_detected,
                               text_extracted=(r.text_extracted
                                               if cfg.parse_content else None),
                               title=r.title, metadata=md, status=r.status,
                               error=r.error,
                               write_limit_reached=r.write_limit_reached)
            # valid compound file without a known text payload
            return res(detected=detected, status=STATUS_UNSUPPORTED,
                       error=f"OLE2 streams {sorted(streams)[:8]} have no v1 parser")

        if detected == "image/vnd.djvu":
            from .djvu import extract_djvu

            # DjVu header facts (kernels/djvu.py): page count / dims /
            # dpi; JB2/IW44 page decode out of scope by design
            r = extract_djvu(data)
            md = {"Content-Type": [detected],
                  "djvu-kind": [r.kind],
                  "djvu-pages": [str(r.n_pages)]}
            if r.width is not None:
                md["Image Width"] = [str(r.width)]
                md["Image Height"] = [str(r.height)]
            if r.dpi is not None:
                md["djvu-dpi"] = [str(r.dpi)]
            return res(detected=detected, text_extracted="",
                       metadata=md, status=STATUS_OK)

        if detected.startswith("image/"):
            # Tika ImageParser behavior: dimensions into metadata from the
            # headers only (no pixel decode in the text pipeline), empty body
            from .image import image_dimensions

            dims = image_dimensions(data)
            if dims is not None:
                from .image import exif_metadata

                mime_kind, iw, ih = dims
                md = {"Content-Type": [mime_kind],
                      "Image Width": [str(iw)],
                      "Image Height": [str(ih)]}
                for k, v in exif_metadata(data).items():
                    md[k] = [v]
                return res(detected=mime_kind, text_extracted="",
                           metadata=md, status=STATUS_OK)
            return res(detected=detected, status=STATUS_UNSUPPORTED,
                       error="image headers unparseable")

        if detected in ("audio/x-aiff", "audio/basic", "audio/x-wav"):
            # AudioParser parity (Tika 1.20 routes .wav/.aiff/.au via
            # javax.sound): stream properties into metadata, empty body.
            # AIFF text chunks and the .au info string surface too.
            from .audio import parse_aiff, parse_au, parse_wav_header

            am, tags, info = None, {}, None
            if detected == "audio/x-aiff":
                r2 = parse_aiff(data)
                if r2 is not None:
                    am, tags = r2
            elif detected == "audio/basic":
                r2 = parse_au(data)
                if r2 is not None:
                    am, info = r2
            else:
                am = parse_wav_header(data)
            if am is not None:
                md = {"Content-Type": [am.mime],
                      "samplerate": [str(am.sample_rate)],
                      "channels": [str(am.channels)]}
                if am.bits_per_sample:
                    md["bits"] = [str(am.bits_per_sample)]
                if am.duration_ms:
                    md["duration-ms"] = [str(am.duration_ms)]
                for k, v in tags.items():
                    md[k] = [v]
                if info:
                    md["audio-info"] = [info]
                return res(detected=am.mime, text_extracted="",
                           title=tags.get("title"),
                           metadata=md, status=STATUS_OK)
            return res(detected=detected, status=STATUS_UNSUPPORTED,
                       error="audio headers unparseable")

        if detected in ("audio/flac", "audio/mpeg", "audio/ogg"):
            # header-level audio metadata (Tika Mp3Parser / FLAC / Ogg
            # posture: stream properties into metadata, empty body)
            from .audio import (parse_flac_streaminfo, parse_mp3_header,
                                parse_ogg_header)

            am = (parse_flac_streaminfo(data) if detected == "audio/flac"
                  else parse_mp3_header(data) if detected == "audio/mpeg"
                  else parse_ogg_header(data))
            if am is not None:
                md = {"Content-Type": [am.mime],
                      "samplerate": [str(am.sample_rate)],
                      "channels": [str(am.channels)]}
                if am.bits_per_sample:
                    md["bits"] = [str(am.bits_per_sample)]
                if am.duration_ms:
                    md["duration-ms"] = [str(am.duration_ms)]
                if am.bitrate_kbps:
                    md["bitrate-kbps"] = [str(am.bitrate_kbps)]
                title = None
                if detected in ("audio/mpeg", "audio/flac", "audio/ogg"):
                    from .audio import (parse_flac_comments,
                                        parse_id3_tags, parse_ogg_comments)

                    tags = (parse_id3_tags(data)
                            if detected == "audio/mpeg"
                            else parse_flac_comments(data)
                            if detected == "audio/flac"
                            else parse_ogg_comments(data))
                    for k, v in tags.items():
                        md[k] = [v]
                    title = tags.get("title")
                return res(detected=am.mime, text_extracted="", title=title,
                           metadata=md, status=STATUS_OK)
            return res(detected=detected, status=STATUS_UNSUPPORTED,
                       error="audio headers unparseable")

        # recognized-but-unparsed (media, ...) and unknown binary.
        # Deliberate refusals say so in metadata (r4 verdict: a RAR
        # refusal must be distinguishable from a gap).
        _BY_DESIGN = {
            "application/vnd.rar": "proprietary format, refused by design",
        }
        reason = _BY_DESIGN.get(detected)
        md = {"refusal-reason": [reason]} if reason else {}
        return res(detected=detected, status=STATUS_UNSUPPORTED,
                   metadata=md,
                   error=(f"no parser for {detected}"
                          + (f" ({reason})" if reason else "")))

    except DeadlineError as e:
        return res(detected=detected, status=STATUS_TIMEOUT, error=str(e))
    except EncryptedError as e:
        # honest refusal for password-protected / unsupported-crypt docs
        # (the empty-user-password common case decrypts transparently and
        # never reaches here) — refusal kind is queryable metadata
        return res(detected=detected, status=STATUS_UNSUPPORTED,
                   metadata={"encryption": [e.kind]},
                   error=f"EncryptedError: {e}")
    except (DepthLimitError, InflateRatioError, KernelError) as e:
        return res(detected=detected, status=STATUS_FAILED,
                   error=f"{type(e).__name__}: {e}")
    except Exception as e:  # absolute backstop: a poisoned doc never kills a task
        return res(detected=detected, status=STATUS_FAILED,
                   error=f"{type(e).__name__}: {e}")
