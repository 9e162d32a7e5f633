"""7z kernel: round-trips, solid folders, encoded headers, bomb/refusal
posture (invariant 7 — content never raises out of the dispatcher)."""

from __future__ import annotations

import binascii
import bz2
import lzma

import pytest

from sparktika.kernels.errors import InflateRatioError, KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.mime import detect_mime
from sparktika.kernels.sevenzip import extract_7z
from sparktika.synth import _7z_number, build_7z, build_7z_doc


def _finish(packed: bytes, hdr: bytes) -> bytes:
    start = (len(packed).to_bytes(8, "little")
             + len(hdr).to_bytes(8, "little")
             + (binascii.crc32(hdr) & 0xFFFFFFFF).to_bytes(4, "little"))
    return (b"7z\xbc\xaf\x27\x1c\x00\x04"
            + (binascii.crc32(start) & 0xFFFFFFFF).to_bytes(4, "little")
            + start + packed + hdr)


def _one_folder_archive(coder_desc: bytes, packed: bytes, unpack_size: int,
                        names: list[str], num_substreams: list[int] | None = None,
                        substream_sizes: list[int] | None = None) -> bytes:
    hdr = bytearray()
    hdr += bytes([0x01, 0x04])
    hdr += bytes([0x06]) + _7z_number(0) + _7z_number(1)
    hdr += bytes([0x09]) + _7z_number(len(packed)) + bytes([0x00])
    hdr += bytes([0x07, 0x0B]) + _7z_number(1) + b"\x00" + coder_desc
    hdr += bytes([0x0C]) + _7z_number(unpack_size) + bytes([0x00])
    if num_substreams is not None:
        hdr += bytes([0x08, 0x0D])
        for n in num_substreams:
            hdr += _7z_number(n)
        if substream_sizes:
            hdr += bytes([0x09])
            for s in substream_sizes:
                hdr += _7z_number(s)
        hdr += bytes([0x00])
    hdr += bytes([0x00])  # end MainStreamsInfo
    hdr += bytes([0x05]) + _7z_number(len(names))
    nm = b"\x00" + b"".join((n + "\x00").encode("utf-16-le") for n in names)
    hdr += bytes([0x11]) + _7z_number(len(nm)) + nm
    hdr += bytes([0x00, 0x00])
    return _finish(packed, bytes(hdr))


def test_7z_number_roundtrip():
    from sparktika.kernels.sevenzip import _Buf

    for n in (0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 123456, 2**31, 2**40 + 7):
        buf = _Buf(_7z_number(n))
        assert buf.number() == n, n


def test_copy_and_lzma2_members():
    r = extract_7z(build_7z_doc(5))
    assert r.entries == ["a5.txt", "b5.txt"]
    assert r.text.startswith("Stored note 5.\n")
    assert r.text.count("Packed note 5. (line repeats)") == 3


def test_encoded_header():
    arc = build_7z([("x.txt", b"alpha\n"), ("y.txt", b"beta\n")],
                   lzma2_from=1, encode_header=True)
    r = extract_7z(arc)
    assert r.entries == ["x.txt", "y.txt"]
    assert r.text == "alpha\nbeta\n"


def test_solid_folder_substreams():
    """Two files sharing one LZMA2 folder, split via SubStreamsInfo."""
    body = b"first file text\n" + b"second file text\n"
    comp = lzma.compress(body, format=lzma.FORMAT_RAW,
                         filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}])
    arc = _one_folder_archive(
        b"\x01\x21\x21\x01\x16", comp, len(body), ["f1.txt", "f2.txt"],
        num_substreams=[2], substream_sizes=[16])
    r = extract_7z(arc)
    assert r.entries == ["f1.txt", "f2.txt"]
    assert r.text == "first file text\nsecond file text\n"


def test_bzip2_folder():
    body = b"bzip2 member text\n"
    comp = bz2.compress(body)
    arc = _one_folder_archive(b"\x01\x03\x04\x02\x02", comp, len(body),
                              ["z.txt"])
    r = extract_7z(arc)
    assert r.text == "bzip2 member text\n"


def test_aes_refused():
    arc = _one_folder_archive(b"\x01\x04\x06\xf1\x07\x01", b"xx", 2,
                              ["enc.txt"])
    with pytest.raises(KernelError, match="encrypted"):
        extract_7z(arc)


def test_multi_stream_coder_refused():
    """BCJ2-style coder (2-in/4-out, complex flag) is refused — its
    stream graph is not a chain."""
    # flag 0x11: id size 1 + complex; num_in=2, num_out=4
    hdr_folder = _7z_number(1) + b"\x11\x00" + _7z_number(2) + _7z_number(4)
    hdr = bytearray()
    hdr += bytes([0x01, 0x04])
    hdr += bytes([0x06]) + _7z_number(0) + _7z_number(1)
    hdr += bytes([0x09]) + _7z_number(2) + bytes([0x00])
    hdr += bytes([0x07, 0x0B]) + _7z_number(1) + b"\x00" + hdr_folder
    hdr += bytes([0x0C]) + _7z_number(2) + bytes([0x00, 0x00, 0x00])
    arc = _finish(b"ab", bytes(hdr))
    with pytest.raises(KernelError, match="coder"):
        extract_7z(arc)


def _chain_archive(branch_desc: bytes, chain_filters, body: bytes,
                   name: str) -> bytes:
    """One folder: packed -> LZMA2 (coder 0) -> branch filter (coder 1).
    Bind pair connects coder-1 in to coder-0 out; final out = coder 1."""
    comp = lzma.compress(body, format=lzma.FORMAT_RAW, filters=chain_filters)
    hdr = bytearray()
    hdr += bytes([0x01, 0x04])
    hdr += bytes([0x06]) + _7z_number(0) + _7z_number(1)
    hdr += bytes([0x09]) + _7z_number(len(comp)) + bytes([0x00])
    hdr += bytes([0x07, 0x0B]) + _7z_number(1) + b"\x00"
    hdr += _7z_number(2)                 # two coders
    hdr += b"\x21\x21\x01\x16"           # coder 0: LZMA2 (flag/id/props)
    hdr += branch_desc                   # coder 1: branch filter
    hdr += _7z_number(1) + _7z_number(0)  # bind pair: in 1 <- out 0
    hdr += bytes([0x0C]) + _7z_number(len(body)) + _7z_number(len(body))
    hdr += bytes([0x00, 0x00])
    hdr += bytes([0x05]) + _7z_number(1)
    nm = b"\x00" + (name + "\x00").encode("utf-16-le")
    hdr += bytes([0x11]) + _7z_number(len(nm)) + nm
    hdr += bytes([0x00, 0x00])
    return _finish(comp, bytes(hdr))


def test_bcj_x86_lzma2_chain():
    """7-Zip's default executable chain: BCJ x86 + LZMA2."""
    # mostly text (so the member still routes as text/plain) with one
    # x86 CALL opcode per long line so the BCJ transform actually fires
    body = (b"text " * 60 + b"\xe8\x11\x22\x33\x44" + b" tail\n") * 8
    arc = _chain_archive(
        b"\x04\x03\x03\x01\x03",  # flag: idsize 4; id 03030103 (BCJ x86)
        [{"id": lzma.FILTER_X86}, {"id": lzma.FILTER_LZMA2, "preset": 6}],
        body, "prog.txt")
    r = extract_7z(arc)
    assert r.text == body.decode("latin-1")


def test_delta_lzma2_chain():
    body = b"abcdabcdabcdabcd" * 32 + b"\n"
    arc = _chain_archive(
        b"\x21\x03\x01\x03",  # flag 0x21: idsize 1 + attrs; id 03; props=[3] -> dist 4
        [{"id": lzma.FILTER_DELTA, "dist": 4},
         {"id": lzma.FILTER_LZMA2, "preset": 6}],
        body, "d.txt")
    r = extract_7z(arc)
    assert r.text == body.decode("latin-1")


def test_lying_unpack_size_bomb_guard():
    """Folder declares a huge unpack size from a tiny packed stream: the
    ratio guard fires BEFORE any decompression."""
    body = b"\x00" * 64
    comp = lzma.compress(body, format=lzma.FORMAT_RAW,
                         filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}])
    arc = _one_folder_archive(b"\x01\x21\x21\x01\x16", comp,
                              50_000_000, ["bomb.txt"])
    with pytest.raises(InflateRatioError):
        extract_7z(arc, max_ratio=200.0, max_entry_bytes=256_000_000)


def test_header_crc_mismatch():
    arc = bytearray(build_7z_doc(1))
    arc[-1] ^= 0xFF  # corrupt last header byte
    with pytest.raises(KernelError, match="CRC"):
        extract_7z(bytes(arc))


def test_truncated_never_raises_through_dispatcher():
    arc = build_7z_doc(2)
    # cuts keep the 6-byte magic intact so the 7z route is actually
    # entered (shorter prefixes legitimately re-sniff as other types)
    for cut in (8, 16, 40, len(arc) - 3):
        r = extract_document("u/t.7z", None, arc[:cut])
        assert r.status in ("failed", "unsupported"), (cut, r.status)


def test_dispatch_end_to_end():
    data = build_7z_doc(9)
    assert detect_mime(data) == "application/x-7z-compressed"
    r = extract_document("u/9.7z", None, data)
    assert r.status == "ok"
    assert r.metadata["container-entries"] == ["2"]
    assert "Stored note 9." in r.text_extracted
    assert "Packed note 9." in r.text_extracted


def test_nested_zip_inside_7z():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("inner.txt", "nested zip text\n")
    arc = build_7z([("inner.zip", buf.getvalue())])
    r = extract_7z(arc)
    assert "nested zip text" in r.text


def test_mixed_folder_crc_digest_sizing():
    """Spec-conforming archive mixing a folder-CRC'd single-file folder
    with a solid 2-file folder whose SubStreams digests cover ONLY the
    unknown-CRC streams (r4 review finding: sizing the digest vector as
    sum(num_substreams) misparsed this shape)."""
    m0 = b"single member text\n"
    solid = b"solid one\n" + b"solid two\n"
    comp = lzma.compress(solid, format=lzma.FORMAT_RAW,
                         filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}])
    packed = m0 + comp
    hdr = bytearray()
    hdr += bytes([0x01, 0x04])
    hdr += bytes([0x06]) + _7z_number(0) + _7z_number(2)
    hdr += bytes([0x09]) + _7z_number(len(m0)) + _7z_number(len(comp))
    hdr += bytes([0x00])
    hdr += bytes([0x07, 0x0B]) + _7z_number(2) + b"\x00"
    hdr += b"\x01\x01\x00"          # folder 0: Copy
    hdr += b"\x01\x21\x21\x01\x16"  # folder 1: LZMA2
    hdr += bytes([0x0C]) + _7z_number(len(m0)) + _7z_number(len(solid))
    # UnpackInfo kCRC: folder 0 has a CRC, folder 1 does not
    hdr += bytes([0x0A, 0x00, 0b10000000])
    hdr += binascii.crc32(m0).to_bytes(4, "little")
    hdr += bytes([0x00])  # end UnpackInfo
    # SubStreams: folder counts 1,2; one explicit size for the solid pair;
    # digest vector covers ONLY the 2 unknown-CRC solid streams
    hdr += bytes([0x08, 0x0D]) + _7z_number(1) + _7z_number(2)
    hdr += bytes([0x09]) + _7z_number(10)
    hdr += bytes([0x0A, 0x01])  # AllAreDefined for the 2 unknown streams
    hdr += binascii.crc32(b"solid one\n").to_bytes(4, "little")
    hdr += binascii.crc32(b"solid two\n").to_bytes(4, "little")
    hdr += bytes([0x00])  # end SubStreams
    hdr += bytes([0x00])  # end MainStreamsInfo
    hdr += bytes([0x05]) + _7z_number(3)
    nm = b"\x00" + b"".join((n + "\x00").encode("utf-16-le")
                            for n in ("a.txt", "b.txt", "c.txt"))
    hdr += bytes([0x11]) + _7z_number(len(nm)) + nm
    hdr += bytes([0x00, 0x00])
    r = extract_7z(_finish(packed, bytes(hdr)))
    assert r.entries == ["a.txt", "b.txt", "c.txt"]
    assert r.text == "single member text\nsolid one\nsolid two\n"


def test_truncation_stops_decompression():
    """max_chars reached in folder 0 -> later folders are never decoded
    (lazy just-in-time decode, r4 review finding)."""
    import sparktika.kernels.sevenzip as sz

    members = [(f"m{i}.txt", f"member {i} text ".encode() * 50)
               for i in range(6)]
    arc = build_7z(members, lzma2_from=1)
    calls = []
    orig = sz._decode_folder

    def spy(folder, packed, *a, **k):
        calls.append(1)
        return orig(folder, packed, *a, **k)

    sz._decode_folder = spy
    try:
        r = extract_7z(arc, max_chars=100)
    finally:
        sz._decode_folder = orig
    assert r.truncated
    assert len(r.entries) == 6          # names still recorded
    assert len(calls) == 1              # only the first folder decoded


def test_nested_7z_inside_7z():
    inner = build_7z([("leaf.txt", b"nested seven zip text\n")])
    outer = build_7z([("inner.7z", inner)])
    r = extract_7z(outer)
    assert "nested seven zip text" in r.text


def test_lzma1_folder_manual_props():
    body = b"lzma1 member text\n" * 4
    comp = lzma.compress(body, format=lzma.FORMAT_ALONE)[13:]
    props = lzma._encode_filter_properties(
        {"id": lzma.FILTER_LZMA1, "preset": 6})
    desc = (b"\x01" + bytes([0x20 | 3]) + b"\x03\x01\x01"
            + _7z_number(len(props)) + props)
    arc = _one_folder_archive(desc, comp, len(body), ["l.txt"])
    r = extract_7z(arc)
    assert r.text == body.decode()


def test_refused_7z_member_keeps_container_siblings():
    """r4 second review: a zip carrying a corrupt/refused 7z member must
    still yield the sibling members' text, not fail wholesale."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("good.txt", "good text here\n")
        z.writestr("bad.7z", b"7z\xbc\xaf\x27\x1c" + b"\x00" * 10)
    r = extract_document("u/x.zip", None, buf.getvalue())
    assert r.status == "ok"
    assert "good text here" in r.text_extracted


def test_short_name_vector_falls_back_not_empty():
    """r4 advice: a kName vector holding fewer names than num_files must
    leave the remaining slots on the file{n} fallback — the trailing NUL
    terminator's empty split chunk must not occupy a slot as ''."""
    from sparktika.kernels.sevenzip import _Buf, _parse_files_info

    nm = b"\x00" + "a.txt\x00".encode("utf-16-le")  # ONE name, 3 files
    fi = (_7z_number(3)
          + bytes([0x11]) + _7z_number(len(nm)) + nm
          + bytes([0x00]))
    names, _has = _parse_files_info(_Buf(fi))
    assert names == ["a.txt", "file1", "file2"]


def test_truncated_lzma_folder_surfaces_error():
    """r4 advice: an LZMA stream that ends cleanly BEFORE the declared
    unpack size must raise (-> status row), not hand back short bytes
    that silently slice later solid-folder substreams into empties."""
    body = b"short folder text\n"
    comp = lzma.compress(body, format=lzma.FORMAT_RAW,
                         filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}])
    arc = _one_folder_archive(b"\x01\x21\x21\x01\x16", comp,
                              len(body) + 64, ["t.txt"])
    with pytest.raises(KernelError, match="truncated"):
        extract_7z(arc)
    # and through the dispatcher: a failed status row, never a raise
    r = extract_document("u/t.7z", None, arc)
    assert r.status != "ok"
