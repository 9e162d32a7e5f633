"""RFC 822 / MIME email kernel tests."""

from __future__ import annotations

import base64

import pytest

from sparktika.kernels.eml import extract_eml, sniff_eml
from sparktika.kernels.extract import extract_document
from sparktika.kernels.mime import detect_mime


def _simple_eml(body="Plain body line.") -> bytes:
    return (
        "From: Ann A <ann@example.com>\r\n"
        "To: Bob B <bob@example.com>\r\n"
        "Subject: Test message\r\n"
        "Date: Mon, 1 Jan 2026 10:00:00 +0000\r\n"
        "Message-ID: <m1@example.com>\r\n"
        "MIME-Version: 1.0\r\n"
        "Content-Type: text/plain; charset=utf-8\r\n"
        "\r\n" + body + "\r\n"
    ).encode()


def test_eml_simple_plain():
    r = extract_eml(_simple_eml())
    assert r.subject == "Test message"
    assert r.text == ("Test message\n"
                      "From: Ann A <ann@example.com>\n"
                      "To: Bob B <bob@example.com>\n"
                      "Date: Mon, 1 Jan 2026 10:00:00 +0000\n\n"
                      "Plain body line.\n")
    assert r.metadata["Message-Id"] == "<m1@example.com>"
    assert r.n_attachments == 0


def test_eml_header_unfolding_and_encoded_words():
    data = (
        b"Subject: =?utf-8?B?Q2Fmw6k=?=\r\n"
        b" =?utf-8?Q?_report?=\r\n"
        b"From: x@example.com\r\n\r\nbody\r\n")
    r = extract_eml(data)
    assert r.subject == "Caf\xe9 report"


def test_eml_multipart_mixed():
    b64 = base64.b64encode(b"Base64 part payload.").decode()
    data = (
        "From: a@x.com\r\nTo: b@x.com\r\nSubject: Multi\r\n"
        "MIME-Version: 1.0\r\n"
        'Content-Type: multipart/mixed; boundary="BOUND"\r\n\r\n'
        "preamble is ignored\r\n"
        "--BOUND\r\n"
        "Content-Type: text/plain; charset=utf-8\r\n\r\n"
        "First part text.\r\n"
        "--BOUND\r\n"
        "Content-Type: text/html; charset=utf-8\r\n\r\n"
        "<html><body><p>HTML part text</p></body></html>\r\n"
        "--BOUND\r\n"
        "Content-Type: text/plain; charset=utf-8\r\n"
        "Content-Transfer-Encoding: base64\r\n\r\n"
        f"{b64}\r\n"
        "--BOUND\r\n"
        'Content-Type: application/pdf; name="doc.pdf"\r\n'
        "Content-Transfer-Encoding: base64\r\n\r\n"
        "JVBERi0=\r\n"
        "--BOUND--\r\n").encode()
    r = extract_eml(data)
    assert "First part text." in r.text
    assert "HTML part text" in r.text
    assert "Base64 part payload." in r.text
    assert "JVBERi0" not in r.text  # attachment content never leaks
    assert r.n_attachments == 1
    assert r.attachment_names == ["doc.pdf"]


def test_eml_quoted_printable_and_charset():
    data = (
        b"From: a@x.com\r\nSubject: QP\r\n"
        b"Content-Type: text/plain; charset=iso-8859-1\r\n"
        b"Content-Transfer-Encoding: quoted-printable\r\n\r\n"
        b"caf=E9 au lait\r\n")
    r = extract_eml(data)
    assert "caf\xe9 au lait" in r.text


def test_eml_nested_message():
    inner = _simple_eml("inner body").decode()
    data = (
        "From: outer@x.com\r\nSubject: Fwd\r\n"
        "Content-Type: message/rfc822\r\n\r\n" + inner).encode()
    r = extract_eml(data)
    assert "inner body" in r.text
    assert r.subject == "Fwd"


def test_eml_sniff_and_dispatch():
    assert sniff_eml(_simple_eml())
    assert not sniff_eml(b"Note: this is just prose\nwith a colon line\n")
    assert not sniff_eml(b"totally plain text")
    assert detect_mime(_simple_eml()) == "message/rfc822"
    r = extract_document("https://m.example.com/a.eml", None, _simple_eml())
    assert (r.status, r.content_type_detected, r.title) == (
        "ok", "message/rfc822", "Test message")
    assert "Plain body line." in r.text_extracted
    assert r.metadata["n-parts"] == ["1"]


def test_eml_malformed_never_raises():
    for junk in (b"From: only-one-header\r\n\r\nx",
                 b"Content-Type: multipart/mixed\r\n\r\nno boundary",
                 b"Subject: s\r\nFrom: f\r\n\r\n" + b"\xff" * 100):
        r = extract_document("u.eml", "message/rfc822", junk)
        assert r.status in ("ok", "unsupported"), r.error


def test_synth_plain_text_does_not_misroute():
    """Kinds 16/17 of the frozen synth corpus stay text/plain (oracle
    lockstep, CLAUDE.md invariant 2)."""
    from sparktika.synth import build_payload

    for doc_id in (16, 17, 36, 37, 56, 57):
        payload = build_payload(doc_id, f"document text {doc_id} " * 30)
        detected = detect_mime(payload)
        assert detected.startswith("text/"), (doc_id, detected)
