"""RTF kernel tests: control-word scan, destination skipping, encodings,
and dispatch routing."""

from __future__ import annotations

import pytest

from sparktika.config import ExtractConfig
from sparktika.kernels.errors import DeadlineError, KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.rtf import extract_rtf


def _rtf(body: str) -> bytes:
    return ("{\\rtf1\\ansi " + body + "}").encode("latin-1")


def test_rtf_basic_paragraphs():
    r = extract_rtf(_rtf("Hello World\\par Second line\\par"))
    assert r.text == "Hello World\nSecond line\n"


def test_rtf_skips_font_and_color_tables():
    r = extract_rtf(_rtf("{\\fonttbl{\\f0\\fswiss Arial;}}"
                         "{\\colortbl;\\red0\\green0\\blue0;}Body text"))
    assert r.text == "Body text"


def test_rtf_starred_destination_skipped():
    r = extract_rtf(_rtf("{\\*\\generator Acme Writer 1.0;}Visible"))
    assert r.text == "Visible"


def test_rtf_hex_escape_and_ansicpg():
    r = extract_rtf(b"{\\rtf1\\ansi\\ansicpg1252 caf\\'e9}")
    assert r.text == "caf\xe9"
    # cp1251 (cyrillic): 0xE9 = й
    r2 = extract_rtf(b"{\\rtf1\\ansi\\ansicpg1251 \\'e9}")
    assert r2.text == "й"


def test_rtf_unicode_with_fallback_skip():
    # \u233? : fallback '?' swallowed (default \uc1)
    assert extract_rtf(_rtf("caf\\u233?!")).text == "caf\xe9!"
    # \uc0: no fallback to swallow
    assert extract_rtf(_rtf("\\uc0\\u8364 x")).text == "€x"
    # negative signed-16 form: cp = N + 65536 (0xF0B7, Symbol-font bullet)
    assert extract_rtf(_rtf("\\uc0\\u-3913 ")).text == ""


def test_rtf_escaped_braces_and_specials():
    r = extract_rtf(_rtf("a\\{b\\}c \\~ d\\_e"))
    assert r.text == "a{b}c \xa0 d-e"
    assert extract_rtf(_rtf("one\\emdash two")).text == "one—two"


def test_rtf_table_separators():
    r = extract_rtf(_rtf("A\\cell B\\cell\\row C"))
    assert r.text == "A\tB\t\nC"


def test_rtf_bin_skip():
    assert extract_rtf(_rtf("A\\bin3 xyzB")).text == "AB"
    # oversized bin param cannot run past EOF
    assert extract_rtf(_rtf("A\\bin999999 xyz")).text == "A"


def test_rtf_info_title_captured_not_body():
    r = extract_rtf(_rtf("{\\info{\\title My Report}{\\author Bob}}Body"))
    assert r.title == "My Report"
    assert r.text == "Body"
    assert r.metadata["dc:title"] == "My Report"


def test_rtf_field_instruction_hidden_result_kept():
    r = extract_rtf(_rtf("{\\field{\\*\\fldinst HYPERLINK \"http://x\"}"
                         "{\\fldrslt link text}} after"))
    assert r.text == "link text after"


def test_rtf_rejects_non_rtf_and_deadline():
    with pytest.raises(KernelError):
        extract_rtf(b"plain text, no header")
    # deadline polls per token: use a token-dense document (a plain text run
    # is consumed in one slice and is trivially cheap)
    big = _rtf("x\\par " * 50_000)
    with pytest.raises(DeadlineError):
        extract_rtf(big, deadline=0.0)


def test_rtf_dispatch_and_truncation():
    data = _rtf("{\\info{\\title T}}Hello from RTF\\par tail")
    r = extract_document("https://x/doc.rtf", None, data)
    assert (r.status, r.content_type_detected, r.title) == (
        "ok", "application/rtf", "T")
    assert r.text_extracted == "Hello from RTF\ntail"
    t = extract_document("https://x/doc.rtf", None, data,
                         ExtractConfig(max_chars=5))
    assert (t.status, t.text_extracted) == ("truncated", "Hello")
