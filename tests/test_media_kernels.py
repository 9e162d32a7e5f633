"""Round-3 media kernel additions: H.264 (avcC/SPS) header-level
metadata — profile/level/cropped dims without frame decode."""

from __future__ import annotations
# --- H.264 header-level metadata (round-3) ----------------------------------

def test_h264_sps_profiles_and_crop():
    from sparktika.kernels.video import parse_mp4
    from sparktika.synth import _h264_params, build_h264_mp4

    for mid in (0, 1, 2, 3, 7, 42, 99, 1000):
        m = parse_mp4(build_h264_mp4(mid))
        p = _h264_params(mid)
        assert m.codec == "avc1"
        assert m.codec_profile == {66: "Baseline", 77: "Main",
                                   100: "High"}[p["profile_idc"]]
        assert m.codec_level == f"{p['level_idc'] // 10}.{p['level_idc'] % 10}"
        assert (m.coded_width, m.coded_height) == (p["width"], p["height"])


def test_h264_sps_known_stream_bytes():
    """SPS from a published x264-encoded 1280x720 stream (profile High,
    level 3.1) — the canonical worked example that appears across public
    H.264 parsing references: 67 64 00 1f ac d9 40 50 05 bb 01 6a 02 02
    02 80 00 00 03 00 80 00 00 1e 07 8c 18 cb (includes an
    emulation-prevention 03)."""
    from sparktika.kernels.video import parse_h264_sps

    sps = bytes.fromhex(
        "6400 1fac d940 5005 bb01 6a02 0202 8000"
        "0003 0080 0000 1e07 8c18 cb".replace(" ", ""))
    info = parse_h264_sps(sps)
    assert info is not None
    assert info["profile"] == "High"
    assert info["level"] == "3.1"
    assert (info["width"], info["height"]) == (1280, 720)


def test_h264_sps_fails_closed_on_garbage():
    from sparktika.kernels.video import parse_h264_sps

    assert parse_h264_sps(b"") is None
    assert parse_h264_sps(b"\xff") is None
    # truncated mid-Golomb
    assert parse_h264_sps(bytes([66, 0, 30, 0b00000010])) is None


def test_mjpeg_mp4_still_reports_its_codec():
    from sparktika.kernels.video import parse_mp4
    from sparktika.synth import build_mjpeg_mp4

    m = parse_mp4(build_mjpeg_mp4(5))
    assert m.codec == "jpeg"
    assert m.codec_profile == "" and m.coded_width == 0


def test_h265_sps_profiles_and_conformance_window():
    from sparktika.kernels.video import parse_mp4
    from sparktika.synth import _h265_params, build_hevc_mp4

    for mid in (0, 1, 2, 3, 6, 9, 42, 1001):
        m = parse_mp4(build_hevc_mp4(mid))
        p = _h265_params(mid)
        assert m.codec == "hvc1"
        assert m.codec_profile == ("Main" if p["profile_idc"] == 1
                                   else "Main 10")
        lv = p["level_idc"]
        assert m.codec_level == f"{lv // 30}.{(lv % 30) // 3}"
        assert (m.coded_width, m.coded_height) == (p["width"], p["height"])


def test_h265_sps_fails_closed_on_garbage():
    from sparktika.kernels.video import parse_h265_sps

    assert parse_h265_sps(b"") is None
    assert parse_h265_sps(b"\x01") is None
    assert parse_h265_sps(bytes(12)) is None  # truncated mid-PTL


def test_h265_sps_interleaved_sublayer_ptl_flags():
    """Regression (review pass): sub-layer profile/level present flags
    are INTERLEAVED per sub-layer (H.265 §7.3.3), not two arrays. The
    pattern p0=1,l0=1,p1=0,l1=0 consumes 88+8 bits; the two-array
    misread consumed 2x88 and desynced every later field."""
    from sparktika.kernels.video import parse_h265_sps
    from sparktika.synth import _BW, _ep_escape

    w = _BW()
    w.u(0, 4)          # vps id
    w.u(2, 3)          # sps_max_sub_layers_minus1 = 2
    w.u(1, 1)          # nesting
    w.u(0, 2); w.u(0, 1); w.u(1, 5)   # PTL: space/tier/profile Main
    w.u(0, 32); w.u(0, 48); w.u(93, 8)  # compat/constraints/level 3.1
    w.u(1, 1); w.u(1, 1)  # sub-layer 0: profile present, level present
    w.u(0, 1); w.u(0, 1)  # sub-layer 1: neither
    for _ in range(2, 8):
        w.u(0, 2)      # alignment
    w.u(0, 2 + 1 + 5 + 32 + 48)  # sub-layer 0 profile block (88 bits)
    w.u(0, 8)          # sub-layer 0 level
    w.ue(0)            # sps id
    w.ue(1)            # chroma 4:2:0
    w.ue(320)          # width
    w.ue(240)          # height
    w.u(0, 1)          # no conformance window
    info = parse_h265_sps(_ep_escape(w.rbsp()))
    assert info is not None
    assert (info["width"], info["height"]) == (320, 240)
    assert info["profile"] == "Main" and info["level"] == "3.1"


def test_av1_seq_header_profiles_levels_dims():
    from sparktika.kernels.video import parse_mp4
    from sparktika.synth import _av1_params, build_av1_mp4

    for mid in (0, 1, 2, 5, 8, 13, 42, 997):
        m = parse_mp4(build_av1_mp4(mid))
        p = _av1_params(mid)
        assert m.codec == "av01"
        assert m.codec_profile == {0: "Main", 1: "High",
                                   2: "Professional"}[p["profile"]]
        assert m.codec_level == (f"{2 + p['level_idx'] // 4}."
                                 f"{p['level_idx'] % 4}")
        assert (m.coded_width, m.coded_height) == (p["width"], p["height"])


def test_av1_parser_fails_closed():
    from sparktika.kernels.video import parse_av1_seq_header

    assert parse_av1_seq_header(b"") is None
    assert parse_av1_seq_header(b"\xff") is None
    # timing_info_present streams are declared out of scope, not crashed on
    from sparktika.synth import _BW
    w = _BW()
    w.u(0, 3); w.u(0, 1); w.u(0, 1); w.u(1, 1)  # timing_info_present=1
    bits = w.bits + [0] * (-len(w.bits) % 8)
    payload = bytes(int("".join(map(str, bits[i:i+8])), 2)
                    for i in range(0, len(bits), 8))
    assert parse_av1_seq_header(payload) is None


def test_av1_initial_display_delay_bits_consumed():
    """Regression (review pass 2): initial_display_delay_present_flag=1
    implies per-operating-point delay bits; skipping them desynced the
    reader and emitted garbage dims as valid."""
    from sparktika.kernels.video import parse_av1_seq_header
    from sparktika.synth import _BW

    w = _BW()
    w.u(0, 3); w.u(0, 1); w.u(0, 1)   # profile Main, not still/reduced
    w.u(0, 1)                         # timing_info_present = 0
    w.u(1, 1)                         # initial_display_delay_present = 1
    w.u(0, 5)                         # one operating point
    w.u(0, 12); w.u(8, 5)             # op_idc, seq_level_idx=8 (3.0)
    w.u(0, 1)                         # seq_tier (level > 7)
    w.u(1, 1); w.u(3, 4)              # delay present for op, delay=4
    w.u(15, 4); w.u(15, 4)            # dim bit widths
    w.u(640 - 1, 16); w.u(360 - 1, 16)
    bits = w.bits + [0] * (-len(w.bits) % 8)
    payload = bytes(int("".join(map(str, bits[i:i+8])), 2)
                    for i in range(0, len(bits), 8))
    info = parse_av1_seq_header(payload)
    assert info is not None
    assert (info["width"], info["height"]) == (640, 360)
    assert info["level"] == "4.0"
