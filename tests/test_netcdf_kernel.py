"""NetCDF classic kernel tests: both versions, header facts, text
contract, truncation/corruption refusal, caps."""

import random
import struct

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.netcdf import build_netcdf, parse_netcdf
from sparktika.synth import build_netcdf_file


def test_both_versions_and_text_contract():
    for i in (0, 1, 6, 7):
        r = parse_netcdf(build_netcdf(i))
        assert r.version == (1 if i % 2 == 0 else 2)
        assert r.numrecs == i % 5
        assert r.dims == [("time", 0), ("x", 2 + i % 3)]
        assert [v.name for v in r.variables] == ["label", "temp"]
        assert r.variables[1].dim_names == ("time", "x")
        assert ("title", f"Synth NetCDF {i}") in r.gatts
        txt = r.render_text()
        assert f"dim time = UNLIMITED ({i % 5} currently)\n" in txt
        assert "var temp : float (time,x)\n" in txt
        assert f":levels = {i % 9 + 1}\n" in txt


def test_synth_wrapper_matches_kernel_builder():
    assert build_netcdf_file(11) == build_netcdf(11)


def test_streaming_numrecs_and_absent_lists():
    # hand-built: version 1, STREAMING numrecs, all three lists ABSENT
    data = b"CDF\x01" + struct.pack(">I", 0xFFFFFFFF) + b"\x00" * 24
    r = parse_netcdf(data)
    assert r.numrecs == -1 and r.dims == [] and r.variables == []


def test_numeric_attr_rendering_exact():
    # int attr: space-joined integers (exact); no float attrs in synth
    r = parse_netcdf(build_netcdf(5))
    assert ("levels", "6") in r.gatts


def test_not_netcdf_refuses():
    with pytest.raises(KernelError):
        parse_netcdf(b"CDF\x05" + b"\x00" * 64)
    with pytest.raises(KernelError):
        parse_netcdf(b"")
    with pytest.raises(KernelError):
        parse_netcdf(b"NOTCDF" + b"\x00" * 64)


def test_truncation_sweep_refuses_cleanly():
    data = build_netcdf(9)
    hdr_len = len(data) - 1
    for cut in range(4, min(hdr_len, 160), 3):
        try:
            parse_netcdf(data[:cut])
        except KernelError:
            pass


def test_corruption_fuzz_never_hangs():
    base = bytearray(build_netcdf(8))
    rnd = random.Random(77)
    for _ in range(300):
        mutated = bytearray(base)
        i = rnd.randrange(len(mutated))
        mutated[i] = rnd.randrange(256)
        try:
            parse_netcdf(bytes(mutated))
        except KernelError:
            pass


def test_count_caps_refuse():
    # dimension count bomb: NC_DIMENSION with nelems far past the cap
    data = (b"CDF\x01" + struct.pack(">I", 0)
            + struct.pack(">II", 0x0A, 1 << 30))
    with pytest.raises(KernelError, match="cap"):
        parse_netcdf(data)


def test_dimid_out_of_range_refuses():
    good = bytearray(build_netcdf(2))
    # find the temp variable's first dimid (0 for 'time') and corrupt it;
    # locate via the var name marker
    i = bytes(good).index(b"temp") + 4
    # rank word then dimids follow the padded name
    rank_pos = i + ((-4) % 4)
    assert struct.unpack_from(">I", good, rank_pos)[0] == 2
    struct.pack_into(">I", good, rank_pos + 4, 99)
    with pytest.raises(KernelError, match="dimid|out of range"):
        parse_netcdf(bytes(good))
