"""Visio VSD (metadata-first) + pre-97 PowerPoint detection tests.

Covers the r6-verdict items 4 and 5: VSD OLE2 property extraction with
a deliberate body refusal, PowerPoint 95 / 4.x structured refusals via
the Current User docFileVersion probe and the PP40 root stream, and the
invariant-7 fuzz contract (no kernel raise on content).
"""

import random
import struct

import pytest

from sparktika.kernels.extract import extract_document
from sparktika.kernels.ole2 import Ole2File
from sparktika.kernels.visio import BODY_REFUSAL, extract_visio
from sparktika.synth import _ole2_file, build_ppt_old, build_vsd


def _md1(r, key):
    v = r.metadata.get(key)
    return v[0] if v else None


# --- Visio ------------------------------------------------------------------

def test_visio_kernel_direct():
    ole = Ole2File(build_vsd(5))
    r = extract_visio(ole)
    assert r.signature == "Visio (TM) Drawing"
    assert r.stream_bytes == 84 + (5 % 4) * 32
    assert r.summary["title"] == "Diagram 5"
    assert r.summary["author"] == "Drafter 5"
    assert r.docsum["company"] == "Example Corp"
    assert r.docsum["manager"] == "Manager 2"


def test_dispatch_routes_vsd_metadata_first():
    r = extract_document("u", None, build_vsd(3))
    assert r.status == "ok"
    assert r.content_type_detected == "application/vnd.visio"
    assert r.title == "Diagram 3"
    assert _md1(r, "author") == "Drafter 3"
    assert _md1(r, "company") == "Example Corp"
    assert _md1(r, "manager") == "Manager 0"
    assert _md1(r, "visio-stream-bytes") == str(84 + 3 * 32)
    # body is refused, never decoded: empty text + queryable reason
    assert r.text_extracted == ""
    assert _md1(r, "body-refusal") == BODY_REFUSAL


def test_vsd_missing_signature_is_failed_status_not_raise():
    data = _ole2_file({"VisioDocument": b"\x00" * 40})
    r = extract_document("u", None, data)
    assert r.status == "failed"
    assert "signature" in (r.error or "")


def test_vsd_without_property_sets_still_extracts_signature():
    data = _ole2_file({"VisioDocument": b"Visio (TM) Drawing\r\nxyz"})
    r = extract_document("u", None, data)
    assert r.status == "ok"
    assert r.title is None
    assert _md1(r, "visio-signature") == "Visio (TM) Drawing"


def test_vsd_fuzz_never_raises():
    rng = random.Random(77)
    base = bytearray(build_vsd(1))
    for _ in range(60):
        mut = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        r = extract_document("u", None, bytes(mut))
        assert r.status in ("ok", "failed", "unsupported")
    for n in (0, 8, 200, 513):
        r = extract_document("u", None, bytes(base[:n]))
        assert r.status in ("ok", "failed", "unsupported", "empty")


# --- pre-97 PowerPoint ------------------------------------------------------

def test_ppt95_refusal_via_doc_file_version():
    r = extract_document("u", None, build_ppt_old(4))  # even -> PP95
    assert r.status == "unsupported"
    assert r.content_type_detected == "application/vnd.ms-powerpoint"
    assert _md1(r, "ppt-format") == "powerpoint-95"
    assert _md1(r, "ppt-doc-file-version") == "1000"


def test_ppt40_refusal_via_pp40_stream():
    r = extract_document("u", None, build_ppt_old(7))  # odd -> PP40
    assert r.status == "unsupported"
    assert _md1(r, "ppt-format") == "powerpoint-4.x"


def test_ppt97_current_user_docfileversion_still_extracts():
    # a 97+ deck whose CurrentUserAtom carries the required 0x03F4
    def atom(rec_type, payload, ver_inst=0):
        return struct.pack("<HHI", ver_inst, rec_type, len(payload)) + payload

    slide = atom(0x0FA0, "Hello 97".encode("utf-16-le"))
    ppt = atom(0x03E8, slide, ver_inst=0x000F)
    cu = bytearray(32)
    struct.pack_into("<HHI", cu, 0, 0, 0x0FF6, 24)
    struct.pack_into("<H", cu, 22, 0x03F4)
    data = _ole2_file({"Current User": bytes(cu),
                       "PowerPoint Document": ppt})
    r = extract_document("u", None, data)
    assert r.status == "ok"
    assert "Hello 97" in r.text_extracted


def test_ppt_short_current_user_is_not_a_95_verdict():
    # streams too short to carry docFileVersion (pre-r7 synth decks)
    # must keep extracting — doc_file_version returns None
    from sparktika.kernels.ppt import doc_file_version

    ole = Ole2File(_ole2_file({"Current User": b"\x00" * 16,
                               "PowerPoint Document": b""}))
    assert doc_file_version(ole) is None
