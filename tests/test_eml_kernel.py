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


# ---------------------------------------------------------------- mbox

from sparktika.kernels.mbox import extract_mbox, sniff_mbox  # noqa: E402


def _envelope(sender="alice@example.com", t="00:00:00"):
    return f"From {sender} Thu Jan  1 {t} 1970\n"


def test_mbox_sniff_requires_envelope_and_headers():
    good = (_envelope() + "From: alice@example.com\nSubject: hi\n\nbody\n")
    assert sniff_mbox(good.encode())
    assert detect_mime(good.encode()) == "application/mbox"
    # prose starting with "From " is NOT an envelope
    assert not sniff_mbox(b"From here on, things got weird.\nMore prose.\n")
    # envelope shape but no header block after it
    assert not sniff_mbox(_envelope().encode() + b"just prose\nno headers\n")
    # a bare RFC 822 message still routes as eml, not mbox
    eml = b"From: a@b.c\nSubject: x\nMessage-Id: <1@b.c>\n\nbody\n"
    assert detect_mime(eml) == "message/rfc822"


def test_mbox_splits_and_unquotes():
    data = (
        _envelope("a@x.com", "00:00:00")
        + "From: a@x.com\nSubject: one\n\nfirst body\n>From quoted\n"
        + ">>From double quoted\n\n"
        + _envelope("b@x.com", "01:00:00")
        + "From: b@x.com\nSubject: two\n\nsecond body\n"
    ).encode()
    r = extract_mbox(data)
    assert r.n_messages == 2
    assert r.subjects == ["one", "two"]
    # one level of > stripped (mboxo), deeper quoting reduced by one
    assert "first body\nFrom quoted\n>From double quoted" in r.text
    assert "second body" in r.text
    assert r.title == "one"


def test_mbox_body_from_line_does_not_split():
    # a body line starting with "From " that is NOT a full envelope must
    # not start a new message
    data = (
        _envelope() + "From: a@x.com\nSubject: s\n\n"
        "From my point of view this is one message.\n"
    ).encode()
    r = extract_mbox(data)
    assert r.n_messages == 1
    assert "From my point of view" in r.text


def test_mbox_malformed_message_degrades_not_raises():
    # second "message" is binary junk: the mailbox still extracts msg 1+3
    data = (
        _envelope("a@x.com") + "From: a@x.com\nSubject: ok1\n\nbody1\n\n"
        + _envelope("b@x.com", "01:00:00") + "\xff\xfe junk no headers\n\n"
        + _envelope("c@x.com", "02:00:00") + "From: c@x.com\nSubject: ok2\n\nbody2\n"
    ).encode("latin-1")
    r = extract_mbox(data)
    assert r.n_messages >= 2
    assert "body1" in r.text and "body2" in r.text


def test_mbox_dispatch_end_to_end():
    from sparktika.synth import build_mbox

    r = extract_document("u/1.mbox", None, build_mbox(1))
    assert r.status == "ok"
    assert r.content_type_detected == "application/mbox"
    assert r.metadata["n-messages"] == ["3"]
    assert r.title == "Mbox 1 msg 0"


# ---------------------------------------------------------------- tnef

def test_tnef_kernel_and_dispatch():
    from sparktika.kernels.tnef import extract_tnef
    from sparktika.synth import _tnef_attr, build_tnef

    r = extract_document("u/5.dat", None, build_tnef(5))
    assert r.status == "ok"
    assert r.content_type_detected == "application/vnd.ms-tnef"
    assert r.title == "Tnef mail 5"
    assert r.text_extracted == (
        "Tnef mail 5\nTnef body 5.\nSecond line.\n"
        "[Attachment: memo1.txt]\nAttached memo 5.\n")
    # corrupt checksum: that attribute is skipped, the rest extracts
    bad = (b"\x78\x9f\x3e\x22\x01\x00"
           + _tnef_attr(1, 0x00018004, b"Good subject\x00")[:-2] + b"\xff\xff"
           + _tnef_attr(1, 0x0002800C, b"Body stays.\x00"))
    t = extract_tnef(bad)
    assert t.subject is None and "Body stays." in t.text
    # truncated mid-attribute: clean stop, never a raise
    data = build_tnef(5)
    for cut in (8, 20, len(data) - 3):
        rr = extract_document("u/t.dat", None, data[:cut])
        assert rr.status in ("ok", "failed", "unsupported"), cut
