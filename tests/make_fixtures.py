"""Deterministic fixture corpus per FIXTURES.md §2 (families F1-F5),
modeled on the reference's test files. Running this module regenerates
tests/goldens/ from the CURRENT kernel spec:

    python tests/make_fixtures.py        # rewrite goldens (spec change!)

tests/test_goldens.py compares live kernel output against the frozen
files byte-for-byte — any accidental drift in the extraction spec fails
CI; a deliberate spec change regenerates + commits new goldens.
"""

from __future__ import annotations

import json
import sys
import zlib
from pathlib import Path

GOLDEN_DIR = Path(__file__).parent / "goldens"


def _pdf(content: str, flate: bool = False) -> bytes:
    stream = content.encode("latin-1")
    head = b"<< /Length %d >>" % len(stream)
    if flate:
        stream = zlib.compress(stream)
        head = b"<< /Length %d /Filter /FlateDecode >>" % len(stream)
    return (b"%PDF-1.3\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n" + head + b"\nstream\n" + stream + b"\nendstream\nendobj\n"
            b"%%EOF\n")


def fixtures() -> dict[str, tuple[bytes, str | None]]:
    """fixture_id -> (payload bytes, declared content type)."""
    f: dict[str, tuple[bytes, str | None]] = {}

    # F1 — HTML family (modeled on test-files/html-sample.html)
    f["f1a_latin1"] = ((
        '<!doctype html public "-//w3c//dtd html 4.0 transitional//en">\n'
        "<html>\n<head>\n"
        '   <meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">\n'
        "   <title>Caf\xe9 report</title>\n</head>\n"
        '<body text="#000000">\nPlain caf\xe9 text,\n'
        "<br>line two\n<p>II. 10. <b>Bold claim</b>.\n"
        '<p><a href="next.html">continue</a>\n</body>\n</html>\n'
    ).encode("iso-8859-1"), "text/html")
    f["f1b_utf8_meta"] = ((
        '<html><head><meta charset="utf-8"><title>日本語</title></head>'
        "<body>多言語テキスト und ümlauts — em-dash</body></html>"
    ).encode("utf-8"), "text/html")
    f["f1c_bom"] = (b"\xef\xbb\xbf" + "<html><body>BOM wins ✓</body></html>".encode("utf-8"), None)
    f["f1d_div_span"] = ((
        "<body><div><span>alpha</span><span>beta</span></div>"
        "<div>gamma</div><div><div>nested</div></div></body>"
    ).encode(), "text/html")
    f["f1e_discard"] = ((
        "<body>visible<script>var leak='<p>no</p>';</script>"
        "<style>.x{color:red}</style><!-- comment -->also visible</body>"
    ).encode(), "text/html")
    f["f1f_links"] = ((
        '<body><a href="/a" title="T" rel="r" id="one"> spaced   anchor </a>'
        '<a href="/img"><img src="pic.png" alt="ALT TEXT"></a>'
        '<form method="get" action="/search" name="s"></form>'
        '<form method="post" action="/nope"></form>'
        '<input type="image" src="/btn.png" alt="Go" name="b">'
        '<iframe src="/frame"></iframe><area href="/area" alt="A" shape="rect">'
        "</body>"
    ).encode(), "text/html")
    f["f1g_tag_soup"] = ((
        "<body>one<p>two<p>three<b>bold<i>both</b>italic</i>"
        "<div>unclosed div &bogus; &amp; fine"
    ).encode(), "text/html")

    # F2 — PDF family (modeled on test-files/pdf-sample.pdf structure)
    f["f2a_plain"] = (_pdf("BT /F1 12 Tf 72 720 Td (uncompressed pdf text) Tj ET"), None)
    f["f2b_flate"] = (_pdf("BT /F1 12 Tf 72 720 Td (flate pdf text) Tj ET", True), None)
    f["f2c_multiline"] = (_pdf(
        "BT /F1 12 Tf 14 TL 72 720 Td (first line) Tj T* (second line) Tj "
        "T* (third line) Tj ET"), None)
    f["f2d_kerning"] = (_pdf(
        "BT /F1 12 Tf 72 720 Td [(ker) 20 (ned) -300 (words)] TJ ET"), None)
    f["f2e_info"] = ((
        b"%PDF-1.3\n9 0 obj\n<< /Title (Golden Title) /Producer (sparktika) >>\nendobj\n"
        + _pdf("BT /F1 12 Tf 72 720 Td (body) Tj ET")[9:]), None)

    # F3 — plain text (modeled on test-files/out.txt)
    f["f3a_repeated"] = (b"test file here\n" * 40, "text/plain")
    f["f3b_unicode"] = ("üñïçødé tèxt\nsecond line\n".encode("utf-8"), None)
    f["f3c_empty"] = (b"", None)

    # F4 — unknown binary
    f["f4a_png"] = (b"\x89PNG\r\n\x1a\n" + bytes(range(64)), None)

    # F5 — poison analogs (bomb.xls / zip-bomb.zip are absent from the
    # reference checkout; contracts from its tests)
    f["f5b_deep_nest"] = (b"<body>" + b"<div>" * 300 + b"x", "text/html")
    f["f5c_flate_bomb"] = ((lambda b: (
        b"%PDF-1.3\n4 0 obj\n<< /Length " + str(len(b)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + b + b"\nendstream\nendobj\n"
    ))(zlib.compress(b"\x00" * 30_000_000)), None)

    return f


def extract_all() -> dict[str, dict]:
    from sparktika.config import ExtractConfig
    from sparktika.kernels.extract import extract_document

    cfg = ExtractConfig()
    out = {}
    for fid, (payload, declared) in fixtures().items():
        r = extract_document(f"https://fixtures.example/{fid}", declared, payload, cfg)
        out[fid] = {
            "status": r.status,
            "mime": r.content_type_detected,
            "charset": r.charset_detected,
            "title": r.title,
            "text": r.text_extracted,
            "main_text": r.main_text,
            "links": [
                {"type": l.type, "target_uri": l.target_uri, "title": l.title,
                 "anchor": l.anchor, "rel": l.rel, "params": l.params}
                for l in r.links
            ],
            "metadata_keys": sorted(r.metadata.keys()),
            "error_class": (r.error or "").split(":")[0] or None,
        }
    return out


def write_goldens() -> None:
    GOLDEN_DIR.mkdir(exist_ok=True)
    for fid, res in extract_all().items():
        text = res.pop("text")
        if text is not None:
            (GOLDEN_DIR / f"{fid}.txt").write_bytes(text.encode("utf-8"))
        elif (GOLDEN_DIR / f"{fid}.txt").exists():
            (GOLDEN_DIR / f"{fid}.txt").unlink()
        (GOLDEN_DIR / f"{fid}.json").write_text(
            json.dumps(res, ensure_ascii=False, sort_keys=True, indent=1))
    print(f"wrote goldens for {len(fixtures())} fixtures to {GOLDEN_DIR}")


if __name__ == "__main__":
    sys.exit(write_goldens())
