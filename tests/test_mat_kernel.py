"""MATLAB Level-5 MAT-file kernel tests."""

import random
import struct
import zlib

import pytest

from sparktika.kernels.errors import InflateRatioError, KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.matfile import build_mat, parse_mat
from sparktika.synth import build_mat_file


def test_variables_shapes_and_strings():
    m = build_mat([("alpha", 3.5), ("label", "hello world"),
                   ("grid", [[1.0, 2.0], [3.0, 4.0]])])
    r = parse_mat(m)
    assert [v.name for v in r.variables] == ["alpha", "label", "grid"]
    assert r.variables[0].dims == (1, 1)
    assert r.variables[1].string == "hello world"
    assert r.variables[2].dims == (2, 2)
    assert r.variables[2].klass == "double"
    assert r.header_text.startswith("MATLAB 5.0 MAT-file")


def test_compressed_element_roundtrip():
    # builder wraps every second variable in miCOMPRESSED
    m = build_mat([("a", 1.0), ("packed", "inside zlib")])
    r = parse_mat(m)
    assert r.variables[1].string == "inside zlib"


def test_header_validation():
    m = bytearray(build_mat([("a", 1.0)]))
    with pytest.raises(KernelError):
        parse_mat(bytes(m[:100]))                 # too short
    bad = bytearray(m)
    struct.pack_into("<H", bad, 126, 0x4949)      # wrong endian tag
    with pytest.raises(KernelError):
        parse_mat(bytes(bad))
    bad2 = bytearray(m)
    bad2[0:6] = b"NOTMAT"
    with pytest.raises(KernelError):
        parse_mat(bytes(bad2))


def test_compressed_bomb_guarded():
    # a miCOMPRESSED element inflating past the cap must refuse
    bomb_inner = b"\x00" * (1 << 25)
    payload = zlib.compress(bomb_inner, 9)
    el = struct.pack("<II", 15, len(payload)) + payload
    el += b"\x00" * ((-len(el)) % 8)
    hdr = (b"MATLAB 5.0 MAT-file, bomb".ljust(116, b" ") + b"\x00" * 8
           + struct.pack("<HH", 0x0100, 0x4D49))
    with pytest.raises((InflateRatioError, KernelError)):
        parse_mat(hdr + el)


def test_dispatcher_and_fuzz():
    r = extract_document("https://x/d.mat", None, build_mat_file(0))
    assert r.status == "ok"
    assert r.content_type_detected == "application/x-matlab-data"
    assert r.metadata["mat-variables"] == ["3"]
    rnd = random.Random(29)
    data = bytearray(build_mat_file(4))
    for _ in range(80):
        i = rnd.randrange(len(data))
        orig = data[i]
        data[i] = rnd.randrange(256)
        rr = extract_document("https://x/d.mat", None, bytes(data))
        assert rr.status in ("ok", "failed", "unsupported", "truncated")
        data[i] = orig


def test_synth_parity():
    for i in (0, 7, 42):
        r = extract_document(f"https://x/{i}.mat", None, build_mat_file(i))
        assert r.status == "ok"
        s = f"Sensor run {i} complete."
        want = (f"alpha_{i}\tdouble\t1x1\n"
                f"label_{i}\tchar\t1x{len(s)}\n{s}\n"
                f"grid_{i}\tdouble\t2x3\n")
        assert r.text_extracted == want
