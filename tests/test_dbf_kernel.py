"""dBASE .dbf kernel tests."""

import random

import pytest

from sparktika.kernels.dbf import build_dbf, looks_like_dbf, parse_dbf
from sparktika.kernels.errors import InflateRatioError, KernelError
from sparktika.kernels.extract import extract_document
from sparktika.synth import build_dbf_table

FIELDS = [("NAME", "C", 12), ("QTY", "N", 6), ("WHEN", "D", 8),
          ("OK", "L", 1)]
ROWS = [["Widget", "42", "20260115", "T"],
        ["Gadget Max", "7", "20251231", "F"]]


def test_basic_table():
    r = parse_dbf(build_dbf(FIELDS, ROWS))
    assert [f.name for f in r.fields] == ["NAME", "QTY", "WHEN", "OK"]
    assert r.rows == ROWS
    assert r.last_update == "2026-01-15"
    assert r.n_records == 2


def test_deleted_records_skip():
    r = parse_dbf(build_dbf(FIELDS, ROWS, deleted_rows={0}))
    assert r.rows == [ROWS[1]]


def test_trim_semantics():
    # C fields keep leading spaces (rstrip only); N/D strip both sides
    data = build_dbf([("A", "C", 8), ("B", "N", 6)], [["  pad", "3"]])
    r = parse_dbf(data)
    assert r.rows == [["  pad", "3"]]


def test_century_window():
    r = parse_dbf(build_dbf(FIELDS, [], last_update=(99, 12, 31)))
    assert r.last_update == "1999-12-31"
    r2 = parse_dbf(build_dbf(FIELDS, [], last_update=(5, 6, 7)))
    assert r2.last_update == "2005-06-07"


def test_detection_requires_consistency():
    good = build_dbf(FIELDS, ROWS)
    assert looks_like_dbf(good)
    # each broken fact alone must kill detection
    b = bytearray(good); b[2] = 13                      # month 13
    assert not looks_like_dbf(bytes(b))
    b = bytearray(good); b[0] = 0x07                    # unknown version
    assert not looks_like_dbf(bytes(b))
    b = bytearray(good); b[10] = (b[10] + 1) & 0xFF     # record size off
    assert not looks_like_dbf(bytes(b))
    b = bytearray(good); b[32 + 11] = ord("Z")          # bad field type
    assert not looks_like_dbf(bytes(b))
    # random text never detects
    assert not looks_like_dbf(b"\x03 just some text beginning with 03" * 4)


def test_truncated_record_area_refuses():
    data = build_dbf(FIELDS, ROWS)
    with pytest.raises(KernelError):
        parse_dbf(data[:-10])


def test_dispatcher_route_and_fuzz():
    r = extract_document("https://x/t.dbf", None, build_dbf(FIELDS, ROWS))
    assert r.status == "ok"
    assert r.content_type_detected == "application/x-dbf"
    assert r.text_extracted.splitlines()[0] == "NAME\tQTY\tWHEN\tOK"
    rnd = random.Random(5)
    data = bytearray(build_dbf_table(3))
    for _ in range(80):
        i = rnd.randrange(len(data))
        orig = data[i]
        data[i] = rnd.randrange(256)
        rr = extract_document("https://x/t.dbf", None, bytes(data))
        assert rr.status in ("ok", "failed", "unsupported", "truncated")
        data[i] = orig


def test_synth_parity():
    for i in (0, 1, 4, 5):
        r = extract_document(f"https://x/{i}.dbf", None, build_dbf_table(i))
        assert r.status == "ok"
        lines = r.text_extracted.splitlines()
        assert lines[0] == "NAME\tQTY\tWHEN"
        assert len(lines) == (3 if i % 4 == 0 else 4)


def test_early_eof_marker_stops_cleanly():
    data = build_dbf([("A", "C", 4)], [["x"], ["y"]])
    hs = int.from_bytes(data[8:10], "little")
    rs = int.from_bytes(data[10:12], "little")
    r = parse_dbf(data[:hs + rs] + b"\x1a")
    assert r.rows == [["x"]]
