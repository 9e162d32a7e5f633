"""SQLite kernel: real stdlib-written databases (rowid order, WITHOUT
ROWID key order, overflow chains, interior pages, UTF-16 encodings),
bomb/corruption posture (invariant 7)."""

from __future__ import annotations

import random
import sqlite3

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.mime import detect_mime
from sparktika.kernels.sqlite import extract_sqlite
from sparktika.synth import build_sqlite


def _db(*ddl_and_rows) -> bytes:
    con = sqlite3.connect(":memory:")
    for stmt, params in ddl_and_rows:
        con.execute(stmt, params or ())
    con.commit()
    data = bytes(con.serialize())
    con.close()
    return data


def test_basic_and_mime():
    data = build_sqlite(5)
    assert detect_mime(data) == "application/x-sqlite3"
    r = extract_sqlite(data)
    assert r.table_names == ["notes", "tags"]
    assert "1\tNote 5-1\t6.5" in r.text
    assert r.text.endswith("alpha 5\nbeta 0\n")


def test_without_rowid_and_blob_and_null():
    data = _db(
        ("CREATE TABLE wr (id TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID",
         None),
        ("INSERT INTO wr VALUES ('z', 26), ('a', 1)", None),
        ("CREATE TABLE mixed (b BLOB, t TEXT, n INTEGER)", None),
        ("INSERT INTO mixed VALUES (x'deadbeef', 'after blob', NULL)",
         None))
    r = extract_sqlite(data)
    lines = r.text.splitlines()
    i = lines.index("wr")
    assert lines[i + 1:i + 3] == ["a\t1", "z\t26"]  # key order
    assert "\tafter blob\t" in r.text  # blob + NULL -> empty cells


def test_interior_pages_and_overflow():
    rows = [("CREATE TABLE big (txt TEXT)", None)]
    rows += [("INSERT INTO big VALUES (?)", (f"row {i} " + "x" * 60,))
             for i in range(400)]
    rows.append(("INSERT INTO big VALUES (?)", ("OVF" * 9000,)))
    r = extract_sqlite(_db(*rows))
    assert sum(1 for l in r.text.splitlines()
               if l.startswith("row ")) == 400
    assert "OVF" * 9000 in r.text  # multi-page overflow chain
    # rowid order preserved across interior pages
    first = r.text.splitlines().index("row 0 " + "x" * 60)
    assert r.text.splitlines()[first + 1].startswith("row 1 ")


def test_utf16_encoded_database():
    con = sqlite3.connect(":memory:")
    con.execute("PRAGMA encoding = 'UTF-16'")
    con.execute("CREATE TABLE u (t TEXT)")
    con.execute("INSERT INTO u VALUES ('café ünïcode')")
    con.commit()
    r = extract_sqlite(bytes(con.serialize()))
    assert "café ünïcode" in r.text


def test_dispatcher_and_metadata():
    r = extract_document("u/5.sqlite", None, build_sqlite(5))
    assert r.status == "ok"
    assert r.metadata["n-tables"] == ["2"]
    assert r.metadata["table-names"] == ["notes", "tags"]
    assert r.content_type_detected == "application/x-sqlite3"


def test_max_chars_truncates():
    r = extract_sqlite(build_sqlite(2), max_chars=10)
    assert r.truncated and len(r.text) <= 11


def test_corrupt_table_keeps_siblings():
    """Zeroing ONE user table's root page degrades that table but keeps
    the other's rows (per-table containment — r5 review 3: the old
    assertion only checked the uncorrupted baseline)."""
    data = bytearray(build_sqlite(3))
    ps = int.from_bytes(data[16:18], "big") or 65536
    survived_with_sibling = 0
    for pg in range(1, len(data) // ps):
        trial = bytearray(data)
        trial[pg * ps:(pg + 1) * ps] = bytes(ps)
        r = extract_document("u/c.sqlite", None, bytes(trial))
        assert r.status in ("ok", "failed", "unsupported")
        if r.status == "ok" and r.text_extracted:
            # when one table's rows vanished, the sibling's must remain
            has_notes = "Note 3-0" in r.text_extracted
            has_tags = "alpha 3" in r.text_extracted
            if has_notes != has_tags:
                survived_with_sibling += 1
    assert survived_with_sibling >= 1  # containment actually observed


def test_truncation_and_corruption_never_escape():
    data = build_sqlite(7)
    for cut in range(0, len(data), max(1, len(data) // 30)):
        r = extract_document("u/t.sqlite", None, data[:cut])
        assert r.status in ("ok", "failed", "unsupported")
    rng = random.Random(11)
    for _ in range(150):
        b = bytearray(data)
        for _ in range(rng.randrange(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        r = extract_document("u/f.sqlite", None, bytes(b))
        assert r.status in ("ok", "failed", "unsupported", "truncated")


def test_btree_cycle_is_an_error_not_a_hang():
    """An interior page pointing back at itself must raise quickly."""
    import time

    data = bytearray(build_sqlite(1))
    ps = int.from_bytes(data[16:18], "big") or 65536
    # craft page 2 as a table interior whose only child is page 2
    off = ps  # page 2
    page = bytearray(ps)
    page[0] = 0x05
    page[3:5] = (1).to_bytes(2, "big")
    page[8:12] = (2).to_bytes(4, "big")   # right-most -> self
    page[12:14] = (20).to_bytes(2, "big")
    page[20:24] = (2).to_bytes(4, "big")  # cell left child -> self
    data[off:off + ps] = page
    t0 = time.monotonic()
    from sparktika.kernels.sqlite import _Db
    with pytest.raises(KernelError):
        list(_Db(bytes(data), None).walk_table(2))
    assert time.monotonic() - t0 < 2.0


def test_row_cap():
    import sparktika.kernels.sqlite as sq

    old = sq._MAX_ROWS
    sq._MAX_ROWS = 10
    try:
        rows = [("CREATE TABLE t (v INTEGER)", None)]
        rows += [("INSERT INTO t VALUES (?)", (i,)) for i in range(50)]
        r = extract_sqlite(_db(*rows))
        # cap degrades the table to its prefix, never raises out
        assert sum(1 for l in r.text.splitlines()
                   if l.strip().isdigit()) <= 11
    finally:
        sq._MAX_ROWS = old


def test_without_rowid_declared_column_order():
    """r5 review 3: WITHOUT ROWID records store PK columns first; the
    renderer must emit DECLARED order (Tika SELECT-* parity), including
    composite and quoted-identifier keys."""
    data = _db(
        ("CREATE TABLE t (a TEXT, b INTEGER PRIMARY KEY, c TEXT) "
         "WITHOUT ROWID", None),
        ("INSERT INTO t VALUES ('first', 7, 'third')", None),
        ('CREATE TABLE q ("x y" TEXT, z INTEGER, PRIMARY KEY (z, "x y")) '
         "WITHOUT ROWID", None),
        ("INSERT INTO q VALUES ('ab', 9)", None))
    r = extract_sqlite(data)
    assert "first\t7\tthird" in r.text
    assert "ab\t9" in r.text


def test_deadline_surfaces_as_timeout():
    """r5 review 3: an expiring deadline must become a TIMEOUT status,
    never a clean 'ok' prefix with silently dropped rows."""
    import time

    rows = [("CREATE TABLE big (t TEXT)", None)]
    rows += [("INSERT INTO big VALUES (?)", ("x" * 200,))
             for _ in range(3000)]
    data = _db(*rows)
    r = extract_document("u/d.sqlite", None, data)
    assert r.status == "ok"  # sanity: parses fine without pressure
    import dataclasses

    from sparktika.config import DEFAULT_CONFIG
    tight = dataclasses.replace(DEFAULT_CONFIG, timeout_ms=1)
    r2 = extract_document("u/d.sqlite", None, data, tight)
    assert r2.status in ("timeout", "ok")  # never a silent partial 'ok'
    if r2.status == "ok":
        assert "x" * 200 in r2.text_extracted  # ok means COMPLETE
