"""Unix ar + cpio container kernels (r5 VERDICT item 6).

Tika 1.20 parity posture: commons-compress ArArchiveInputStream /
CpioArchiveInputStream via tika-parsers (reference build.gradle); both
route through the SAME member router / budget semantics as zip/tar/7z
(kernels/container.py route_member_text).
"""

from __future__ import annotations

import random

import pytest

from sparktika.kernels.container import (
    extract_ar_container,
    extract_cpio_container,
    is_ar,
    is_cpio,
)
from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import ExtractConfig, extract_document
from sparktika.kernels.mime import detect_mime
from sparktika.synth import _ar_member, _cpio_newc, _cpio_odc, build_archive


def _ar(*members: tuple[str, bytes]) -> bytes:
    return b"!<arch>\n" + b"".join(_ar_member(n, b) for n, b in members)


def _cpio(*members: tuple[str, bytes]) -> bytes:
    return (b"".join(_cpio_newc(n, b) for n, b in members)
            + _cpio_newc("TRAILER!!!", b"", mode=0))


# --------------------------------------------------------------- ar ----

def test_ar_common_format_text_and_entries():
    data = _ar(("a.txt", b"one\n"), ("b.txt", b"two\n"))
    r = extract_ar_container(data)
    assert r.text == "one\ntwo\n"
    assert r.entries == ["a.txt", "b.txt"]
    assert not r.truncated


def test_ar_gnu_terminator_and_symbol_table_skipped():
    # GNU style: names end with '/', '/' entry is the symbol table
    data = _ar(("/", b"\x00" * 4), ("lib.txt/", b"body\n"))
    r = extract_ar_container(data)
    assert r.entries == ["lib.txt"]
    assert r.text == "body\n"


def test_ar_gnu_long_name_table():
    long_name = "a-name-much-longer-than-sixteen-bytes.txt"
    table = (long_name + "/\n").encode()
    data = _ar(("//", table), ("/0", b"long body\n"))
    r = extract_ar_container(data)
    assert r.entries == [long_name]
    assert r.text == "long body\n"


def test_ar_bsd_inline_name():
    name = b"bsd-archive-member-name.txt"
    body = name + b"bsd body\n"
    hdr = (f"#1/{len(name)}".ljust(16) + "0".ljust(12) + "0".ljust(6)
           + "0".ljust(6) + "100644".ljust(8)
           + str(len(body)).ljust(10)).encode() + b"\x60\x0a"
    data = b"!<arch>\n" + hdr + body + (b"\n" if len(body) % 2 else b"")
    r = extract_ar_container(data)
    assert r.entries == [name.decode()]
    assert r.text == "bsd body\n"


def test_ar_odd_size_alignment():
    # odd-sized member is padded with \n; the next header must parse
    data = _ar(("a.txt", b"odd\n!"), ("b.txt", b"next\n"))
    r = extract_ar_container(data)
    assert r.text == "odd\n!next\n"


def test_ar_bad_terminator_refuses():
    data = bytearray(_ar(("a.txt", b"x\n")))
    data[8 + 58] = 0x00  # clobber the "`\n" header terminator
    with pytest.raises(KernelError):
        extract_ar_container(bytes(data))


def test_ar_size_out_of_bounds_refuses():
    hdr = ("a.txt".ljust(16) + "0".ljust(12) + "0".ljust(6) + "0".ljust(6)
           + "100644".ljust(8) + "999999".ljust(10)).encode() + b"\x60\x0a"
    with pytest.raises(KernelError):
        extract_ar_container(b"!<arch>\n" + hdr + b"tiny")


def test_ar_longname_offset_out_of_bounds_refuses():
    data = _ar(("//", b"x.txt/\n"), ("/999", b"body\n"))
    with pytest.raises(KernelError):
        extract_ar_container(data)


# ------------------------------------------------------------- cpio ----

@pytest.mark.parametrize("builder", [_cpio_newc, _cpio_odc])
def test_cpio_formats_text_and_entries(builder):
    data = (builder("a.txt", b"one\n") + builder("d/b.txt", b"two\n")
            + builder("TRAILER!!!", b"", mode=0))
    r = extract_cpio_container(data)
    assert r.text == "one\ntwo\n"
    assert r.entries == ["a.txt", "d/b.txt"]


def test_cpio_crc_variant():
    data = (_cpio_newc("a.txt", b"crc body\n", crc=True)
            + _cpio_newc("TRAILER!!!", b"", mode=0, crc=True))
    assert detect_mime(data) == "application/x-cpio"
    r = extract_cpio_container(data)
    assert r.text == "crc body\n"


def test_cpio_skips_non_regular_files():
    data = (_cpio_newc("dir", b"", mode=0o040755)
            + _cpio_newc("link", b"/etc", mode=0o120777)
            + _cpio_newc("f.txt", b"real\n")
            + _cpio_newc("TRAILER!!!", b"", mode=0))
    r = extract_cpio_container(data)
    assert r.entries == ["f.txt"]
    assert r.text == "real\n"


def test_cpio_bad_magic_mid_stream_refuses():
    data = _cpio_newc("a.txt", b"x\n") + b"garbage-not-a-header"
    with pytest.raises(KernelError):
        extract_cpio_container(data)


def test_cpio_size_out_of_bounds_refuses():
    blob = bytearray(_cpio_newc("a.txt", b"abcd"))
    blob[54:62] = b"7fffffff"  # filesize field -> far past the buffer
    with pytest.raises(KernelError):
        extract_cpio_container(bytes(blob))


# ------------------------------------------- routing + mime + guards ----

def test_mime_detection_validates_cpio_prefix():
    # a text file that merely STARTS with the newc magic must not route
    # to the cpio kernel (the next 24 chars are not hex)
    fake = b"070701 is the cpio newc magic, says this plain note.\n"
    assert detect_mime(fake) == "text/plain"
    assert not is_cpio(fake)
    assert is_ar(b"!<arch>\n")


def test_nested_ar_in_cpio_and_depth_guard():
    inner = _ar(("in.txt", b"nested\n"))
    data = _cpio(("inner.a", inner))
    r = extract_cpio_container(data)
    assert r.text == "nested\n"
    with pytest.raises(KernelError):
        extract_ar_container(_ar(("x.txt", b"hi\n")), depth=99)


def test_char_budget_truncates_exactly():
    data = _ar(("a.txt", b"A" * 50), ("b.txt", b"B" * 50))
    r = extract_ar_container(data, max_chars=60)
    assert len(r.text) == 60
    assert r.truncated


def test_dispatcher_end_to_end_all_synth_variants():
    for i in range(12):
        r = extract_document("x.arc", None, build_archive(i),
                             ExtractConfig())
        assert r.status == "ok", (i, r.error)
        kind = "x-archive" if i % 2 == 0 else "x-cpio"
        assert r.content_type_detected == f"application/{kind}"
        assert r.metadata["container-entries"] == ["2"]
        word = "Ar" if i % 2 == 0 else "Cpio"
        assert r.text_extracted.startswith(f"{word} note {i} ")


def test_fuzz_never_raises_through_dispatcher():
    rng = random.Random(0xA2C10)
    seeds = [build_archive(i) for i in range(4)]
    for trial in range(300):
        base = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        if rng.random() < 0.3:
            base = base[:rng.randrange(len(base))]
        r = extract_document("f.arc", None, bytes(base), ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")


# --------------------------------------------------------------------------
# ARJ (round 6: completes the ar/cpio/arj archive family)
# --------------------------------------------------------------------------

def test_arj_basic_extraction():
    from sparktika.kernels.container import extract_arj_container
    from sparktika.synth import build_arj

    r = extract_arj_container(build_arj(7))
    assert r.text == "Arj note 7 epsilon.\nArj page 7 zeta.\n"
    assert r.entries == ["note7.txt", "page.html"]
    assert "compression-refused" not in r.metadata


def test_arj_compressed_member_refused_with_count():
    from sparktika.kernels.container import extract_arj_container
    from sparktika.synth import build_arj

    r = extract_arj_container(build_arj(6))
    assert r.entries == ["note6.txt", "page.html", "packed.bin"]
    assert r.metadata["compression-refused"] == "1"
    assert r.text == "Arj note 6 epsilon.\nArj page 6 zeta.\n"


def test_arj_header_crc_mismatch_refuses():
    from sparktika.kernels.container import extract_arj_container
    from sparktika.kernels.errors import KernelError
    from sparktika.synth import build_arj

    blob = bytearray(build_arj(1))
    blob[40] ^= 0xFF  # inside the first file block's basic header
    with pytest.raises(KernelError):
        extract_arj_container(bytes(blob))


def test_arj_stored_data_crc_mismatch_refuses_entry_only():
    from sparktika.kernels.container import extract_arj_container
    from sparktika.synth import build_arj

    blob = bytearray(build_arj(1))
    i = bytes(blob).find(b"epsilon")
    blob[i] ^= 0xFF  # corrupt stored payload: data CRC now fails
    r = extract_arj_container(bytes(blob))
    assert "epsilon" not in r.text and "zeta" in r.text
    assert r.metadata["compression-refused"] == "1"


def test_arj_truncated_tail_keeps_partial():
    from sparktika.kernels.container import extract_arj_container
    from sparktika.synth import build_arj

    blob = build_arj(1)
    r = extract_arj_container(blob[:-4])  # lose exactly the end marker
    assert r.text == "Arj note 1 epsilon.\nArj page 1 zeta.\n"
    # truncation INSIDE an entry's data is a hard refusal, not silence
    from sparktika.kernels.errors import KernelError

    with pytest.raises(KernelError):
        extract_arj_container(blob[:-6])


def test_arj_mime_needs_main_header_shape():
    from sparktika.kernels.mime import detect_mime

    # bare magic without a plausible main header stays binary, not arj
    assert detect_mime(b"\x60\xea" + b"\x00" * 60) != "application/x-arj"


def test_arj_nested_inside_zip():
    import io
    import zipfile

    from sparktika.kernels.extract import extract_document
    from sparktika.synth import build_arj

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("inner.arj", build_arj(4))
    r = extract_document("n.zip", None, buf.getvalue())
    assert r.status == "ok"
    assert "Arj note 4 epsilon." in r.text_extracted


def test_arj_fuzz_never_raises_through_dispatcher():
    import random

    from sparktika.kernels.extract import ExtractConfig, extract_document
    from sparktika.synth import build_arj

    rng = random.Random(0xA27)
    seeds = [build_arj(i) for i in range(3)]
    for _ in range(300):
        blob = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 8)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        if rng.random() < 0.3:
            blob = blob[:rng.randrange(len(blob))]
        r = extract_document("f.arj", None, bytes(blob), ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")
