"""MP4 / ISO BMFF video kernel: box walker + MJPEG frame sampling.

Metadata needs no codec work: mvhd carries timescale/duration, tkhd
carries 16.16 fixed-point width/height, hdlr classifies tracks
(vide/soun). Frame sampling is REAL for Motion-JPEG tracks ('jpeg' /
'mjpa' / 'mjpb' sample entries): the stsd/stsz/stsc/stco sample tables
locate per-frame JPEG payloads in mdat, and kernels/image.decode_jpeg
decodes every Nth one. Inter-coded codecs (H.264/AV1/...) raise
KernelError — the pipeline degrades those to status rows.

Guards (invariant 7): box sizes are bounds-checked, the walk is
depth-capped and strictly forward-progressing, sample counts are capped,
so crafted size fields terminate with KernelError instead of looping.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .errors import KernelError, check_deadline

_MAX_DEPTH = 8


@dataclass
class Mp4Meta:
    width: int = 0
    height: int = 0
    duration_ms: int = 0
    timescale: int = 0
    n_tracks: int = 0
    track_kinds: list[str] = field(default_factory=list)
    brand: str = ""
    # video sample-entry fourcc ('avc1', 'jpeg', ...) and, for H.264,
    # header-level stream properties parsed from the avcC SPS — the codec
    # a real crawl actually contains; frame DECODE stays out of scope
    # (no codec libs), so inter-coded tracks get metadata, not pixels
    codec: str = ""
    codec_profile: str = ""
    codec_level: str = ""
    coded_width: int = 0
    coded_height: int = 0


def sniff_mp4_video(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _boxes(data: bytes, start: int, end: int, depth: int):
    """Yield (type, body_start, body_end) for the boxes in [start, end)."""
    if depth > _MAX_DEPTH:
        raise KernelError("MP4 box nesting exceeds depth cap")
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise KernelError("MP4 largesize box truncated")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            header = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < header or pos + size > end:
            raise KernelError("MP4 box size out of bounds")
        yield btype, pos + header, pos + size
        pos += size


def parse_mp4(data: bytes) -> Mp4Meta:
    if not sniff_mp4_video(data):
        raise KernelError("not an ISO BMFF file (no ftyp)")
    meta = Mp4Meta()
    n = len(data)
    for btype, s, e in _boxes(data, 0, n, 0):
        if btype == b"ftyp":
            meta.brand = data[s : s + 4].decode("ascii", "replace")
        elif btype == b"moov":
            _parse_moov(data, s, e, meta)
    if not meta.timescale:
        raise KernelError("MP4 has no moov/mvhd")
    return meta


def _parse_moov(data: bytes, start: int, end: int, meta: Mp4Meta) -> None:
    for btype, s, e in _boxes(data, start, end, 1):
        if btype == b"mvhd":
            version = data[s]
            if version == 1:
                timescale, duration = struct.unpack_from(">IQ", data, s + 20)
            else:
                timescale, duration = struct.unpack_from(">II", data, s + 12)
            if timescale:
                meta.timescale = timescale
                meta.duration_ms = round(duration * 1000 / timescale)
        elif btype == b"trak":
            meta.n_tracks += 1
            _parse_trak(data, s, e, meta)


def _parse_trak(data: bytes, start: int, end: int, meta: Mp4Meta) -> None:
    is_video = False
    stsd_span = None
    for btype, s, e in _boxes(data, start, end, 2):
        if btype == b"tkhd":
            version = data[s]
            off = s + (88 if version == 1 else 76)
            if off + 8 <= e:
                w_fixed, h_fixed = struct.unpack_from(">II", data, off)
                w, h = w_fixed >> 16, h_fixed >> 16
                if w and h:  # the video track carries nonzero dims
                    meta.width = max(meta.width, w)
                    meta.height = max(meta.height, h)
        elif btype == b"mdia":
            for mtype, ms, me in _boxes(data, s, e, 3):
                if mtype == b"hdlr" and ms + 12 <= me:
                    kind = data[ms + 8 : ms + 12].decode("ascii", "replace")
                    meta.track_kinds.append(kind)
                    if kind == "vide":
                        is_video = True
                elif mtype == b"minf":
                    for nt, ns, ne in _boxes(data, ms, me, 4):
                        if nt == b"stbl":
                            for st_, ss, se in _boxes(data, ns, ne, 5):
                                if st_ == b"stsd":
                                    stsd_span = (ss, se)
    if is_video and stsd_span is not None:
        _parse_video_stsd(data, *stsd_span, meta)


# VisualSampleEntry: 8-byte box header + 6 reserved + u16 data_ref_idx +
# 16 pre_defined/reserved + u16 width + u16 height + 4+4+4 resolutions/
# reserved + u16 frame_count + 32 compressorname + u16 depth + s16 = 78
# bytes of fields before the child boxes (ISO 14496-12 §12.1.3).
_VISUAL_ENTRY_FIELDS = 78


def _parse_video_stsd(data: bytes, s: int, e: int, meta: Mp4Meta) -> None:
    if s + 8 > e:
        return
    (n_entries,) = struct.unpack_from(">I", data, s + 4)
    pos = s + 8
    for _ in range(min(n_entries, 32)):
        if pos + 8 > e:
            return
        (esize,) = struct.unpack_from(">I", data, pos)
        if esize < 8 or pos + esize > e:
            return
        fourcc = data[pos + 4 : pos + 8].decode("ascii", "replace")
        if not meta.codec:
            meta.codec = fourcc
        kids = pos + 8 + _VISUAL_ENTRY_FIELDS
        if fourcc in ("avc1", "avc2", "avc3", "avc4") and kids < pos + esize:
            for bt, bs, be in _boxes(data, kids, pos + esize, 6):
                if bt == b"avcC":
                    _parse_avcc(data[bs:be], meta)
        elif fourcc in ("hvc1", "hev1") and kids < pos + esize:
            for bt, bs, be in _boxes(data, kids, pos + esize, 6):
                if bt == b"hvcC":
                    _parse_hvcc(data[bs:be], meta)
        elif fourcc == "av01" and kids < pos + esize:
            for bt, bs, be in _boxes(data, kids, pos + esize, 6):
                if bt == b"av1C":
                    _parse_av1c(data[bs:be], meta)
        pos += esize


def _parse_avcc(cfg: bytes, meta: Mp4Meta) -> None:
    """AVCDecoderConfigurationRecord (ISO 14496-15 §5.3.3.1): version,
    profile, compat, level, lengthSize, numSPS, then u16-length-prefixed
    SPS NAL units. The first SPS yields profile/level/coded dims."""
    if len(cfg) < 7 or cfg[0] != 1:
        return
    n_sps = cfg[5] & 0x1F
    pos = 6
    for _ in range(n_sps):
        if pos + 2 > len(cfg):
            return
        (ln,) = struct.unpack_from(">H", cfg, pos)
        pos += 2
        nal = cfg[pos : pos + ln]
        pos += ln
        if len(nal) >= 4 and (nal[0] & 0x1F) == 7:
            info = parse_h264_sps(nal[1:])
            if info is not None:
                meta.codec_profile = info["profile"]
                meta.codec_level = info["level"]
                meta.coded_width = info["width"]
                meta.coded_height = info["height"]
                return


def _parse_hvcc(cfg: bytes, meta: Mp4Meta) -> None:
    """HEVCDecoderConfigurationRecord (ISO 14496-15 §8.3.3.1): 22 fixed
    bytes, then NAL-unit arrays (u8 type, u16 count, per-unit u16 len +
    data). The SPS array (NAL type 33) yields profile/level/cropped
    dims."""
    if len(cfg) < 23 or cfg[0] != 1:
        return
    num_arrays = cfg[22]
    pos = 23
    for _ in range(num_arrays):
        if pos + 3 > len(cfg):
            return
        nal_type = cfg[pos] & 0x3F
        (n_nalus,) = struct.unpack_from(">H", cfg, pos + 1)
        pos += 3
        for _ in range(n_nalus):
            if pos + 2 > len(cfg):
                return
            (ln,) = struct.unpack_from(">H", cfg, pos)
            pos += 2
            nal = cfg[pos : pos + ln]
            pos += ln
            if nal_type == 33 and len(nal) >= 4:
                info = parse_h265_sps(nal[2:])  # skip 2-byte NAL header
                if info is not None:
                    meta.codec_profile = info["profile"]
                    meta.codec_level = info["level"]
                    meta.coded_width = info["width"]
                    meta.coded_height = info["height"]
                    return


_H265_PROFILES = {1: "Main", 2: "Main 10", 3: "Main Still Picture",
                  4: "Range Extensions"}


def parse_h265_sps(rbsp_with_ep: bytes) -> dict | None:
    """H.265 SPS parse (ITU-T H.265 §7.3.2.2.1) through the conformance
    window: profile/tier/level and cropped luma dimensions. Input is the
    SPS payload after the 2-byte NAL header, with emulation-prevention
    bytes (stripped here). Returns None on malformed input."""
    rbsp = rbsp_with_ep.replace(b"\x00\x00\x03", b"\x00\x00")
    try:
        br = _BitReader(rbsp)
        br.u(4)  # sps_video_parameter_set_id
        max_sub_layers_minus1 = br.u(3)
        br.u(1)  # sps_temporal_id_nesting_flag
        # profile_tier_level(1, max_sub_layers_minus1)
        br.u(2)  # general_profile_space
        tier = br.u(1)
        profile_idc = br.u(5)
        br.u(32)  # general_profile_compatibility_flags
        br.u(48)  # general constraint flags
        level_idc = br.u(8)
        if max_sub_layers_minus1 > 0:
            # flags are INTERLEAVED per sub-layer (H.265 §7.3.3:
            # profile_present[i], level_present[i] pairs), not two arrays
            sub_profile = []
            sub_level = []
            for _ in range(max_sub_layers_minus1):
                sub_profile.append(br.u(1))
                sub_level.append(br.u(1))
            for _ in range(max_sub_layers_minus1, 8):
                br.u(2)  # reserved_zero_2bits alignment
            for i in range(max_sub_layers_minus1):
                if sub_profile[i]:
                    br.u(2 + 1 + 5 + 32 + 48)
                if sub_level[i]:
                    br.u(8)
        br.ue()  # sps_seq_parameter_set_id
        chroma_format_idc = br.ue()
        if chroma_format_idc == 3:
            br.u(1)  # separate_colour_plane_flag
        width = br.ue()   # pic_width_in_luma_samples
        height = br.ue()  # pic_height_in_luma_samples
        if br.u(1):  # conformance_window_flag
            win_l, win_r, win_t, win_b = (br.ue(), br.ue(),
                                          br.ue(), br.ue())
            # SubWidthC/SubHeightC (H.265 Table 6-1)
            sub_w = 2 if chroma_format_idc in (1, 2) else 1
            sub_h = 2 if chroma_format_idc == 1 else 1
            width -= sub_w * (win_l + win_r)
            height -= sub_h * (win_t + win_b)
        if width <= 0 or height <= 0 or width > 65536 or height > 65536:
            return None
        profile = _H265_PROFILES.get(profile_idc, str(profile_idc))
        if tier:
            profile += " (High tier)"
        return {
            "profile": profile,
            "level": f"{level_idc // 30}.{(level_idc % 30) // 3}",
            "width": width,
            "height": height,
        }
    except KernelError:
        return None


class _BitReader:
    """MSB-first bit reader over an RBSP (emulation-prevention bytes
    already stripped); raises KernelError past the end (bomb posture)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise KernelError("SPS bitstream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise KernelError("SPS Exp-Golomb code out of range")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _parse_av1c(cfg: bytes, meta: Mp4Meta) -> None:
    """AV1CodecConfigurationRecord (AV1-ISOBMFF spec §2.3): 4 fixed
    bytes, then configOBUs. The sequence-header OBU (type 1) yields
    profile/level/max frame dims."""
    if len(cfg) < 4 or (cfg[0] >> 7) != 1 or (cfg[0] & 0x7F) != 1:
        return
    pos = 4
    while pos + 1 < len(cfg):
        hdr = cfg[pos]
        if hdr & 0x80:  # obu_forbidden_bit
            return
        obu_type = (hdr >> 3) & 0x0F
        has_ext = hdr & 0x04
        has_size = hdr & 0x02
        pos += 1
        if has_ext:
            pos += 1
        if has_size:
            size = 0
            shift = 0
            while pos < len(cfg):
                b = cfg[pos]
                pos += 1
                size |= (b & 0x7F) << shift
                shift += 7
                if not (b & 0x80):
                    break
                if shift > 28:
                    return
        else:
            size = len(cfg) - pos
        payload = cfg[pos : pos + size]
        pos += size
        if obu_type == 1:  # OBU_SEQUENCE_HEADER
            info = parse_av1_seq_header(payload)
            if info is not None:
                meta.codec_profile = info["profile"]
                meta.codec_level = info["level"]
                meta.coded_width = info["width"]
                meta.coded_height = info["height"]
            return


_AV1_PROFILES = {0: "Main", 1: "High", 2: "Professional"}


def parse_av1_seq_header(payload: bytes) -> dict | None:
    """AV1 sequence_header_obu parse (AV1 spec §5.5) through the max
    frame dimensions. Returns None on malformed input."""
    try:
        br = _BitReader(payload)
        seq_profile = br.u(3)
        br.u(1)  # still_picture
        reduced = br.u(1)
        if reduced:
            seq_level_idx = br.u(5)
        else:
            if br.u(1):  # timing_info_present_flag
                return None  # timing/decoder-model parse out of scope
            iddp = br.u(1)  # initial_display_delay_present_flag
            op_cnt = br.u(5) + 1
            seq_level_idx = 0
            for i in range(op_cnt):
                br.u(12)  # operating_point_idc
                lvl = br.u(5)
                if i == 0:
                    seq_level_idx = lvl
                if lvl > 7:
                    br.u(1)  # seq_tier
                if iddp and br.u(1):  # delay present for this op
                    br.u(4)  # initial_display_delay_minus_1
        wbits = br.u(4) + 1
        hbits = br.u(4) + 1
        width = br.u(wbits) + 1
        height = br.u(hbits) + 1
        if width <= 0 or height <= 0 or width > 65536 or height > 65536:
            return None
        return {
            "profile": _AV1_PROFILES.get(seq_profile, str(seq_profile)),
            "level": f"{2 + seq_level_idx // 4}.{seq_level_idx % 4}",
            "width": width,
            "height": height,
        }
    except KernelError:
        return None


_H264_PROFILES = {
    66: "Baseline", 77: "Main", 88: "Extended", 100: "High",
    110: "High 10", 122: "High 4:2:2", 244: "High 4:4:4",
    44: "CAVLC 4:4:4", 83: "Scalable Baseline", 86: "Scalable High",
    118: "Multiview High", 128: "Stereo High",
}

_PROFILES_WITH_CHROMA = {100, 110, 122, 244, 44, 83, 86, 118, 128,
                         138, 139, 134, 135}


def parse_h264_sps(rbsp_with_ep: bytes) -> dict | None:
    """Sequence Parameter Set parse (ITU-T H.264 §7.3.2.1.1) for
    header-level stream properties: profile/level strings and the
    cropped coded dimensions. Input is the SPS payload after the NAL
    header byte, WITH emulation-prevention bytes (00 00 03 -> 00 00
    stripped here). Returns None on malformed input."""
    rbsp = rbsp_with_ep.replace(b"\x00\x00\x03", b"\x00\x00")
    try:
        br = _BitReader(rbsp)
        profile_idc = br.u(8)
        br.u(8)  # constraint flags + reserved
        level_idc = br.u(8)
        br.ue()  # seq_parameter_set_id
        chroma_format_idc = 1
        if profile_idc in _PROFILES_WITH_CHROMA:
            chroma_format_idc = br.ue()
            if chroma_format_idc == 3:
                br.u(1)  # separate_colour_plane_flag
            br.ue()  # bit_depth_luma_minus8
            br.ue()  # bit_depth_chroma_minus8
            br.u(1)  # qpprime_y_zero_transform_bypass_flag
            if br.u(1):  # seq_scaling_matrix_present_flag
                n_lists = 8 if chroma_format_idc != 3 else 12
                for i in range(n_lists):
                    if br.u(1):  # seq_scaling_list_present_flag[i]
                        size = 16 if i < 6 else 64
                        last, nxt = 8, 8
                        for _ in range(size):
                            if nxt != 0:
                                nxt = (last + br.se() + 256) % 256
                            last = nxt if nxt else last
        br.ue()  # log2_max_frame_num_minus4
        poc_type = br.ue()
        if poc_type == 0:
            br.ue()  # log2_max_pic_order_cnt_lsb_minus4
        elif poc_type == 1:
            br.u(1)  # delta_pic_order_always_zero_flag
            br.se()  # offset_for_non_ref_pic
            br.se()  # offset_for_top_to_bottom_field
            for _ in range(min(br.ue(), 256)):
                br.se()  # offset_for_ref_frame[i]
        br.ue()  # max_num_ref_frames
        br.u(1)  # gaps_in_frame_num_value_allowed_flag
        pic_width_in_mbs = br.ue() + 1
        pic_height_in_map_units = br.ue() + 1
        frame_mbs_only = br.u(1)
        if not frame_mbs_only:
            br.u(1)  # mb_adaptive_frame_field_flag
        br.u(1)  # direct_8x8_inference_flag
        crop_l = crop_r = crop_t = crop_b = 0
        if br.u(1):  # frame_cropping_flag
            crop_l, crop_r, crop_t, crop_b = (br.ue(), br.ue(),
                                              br.ue(), br.ue())
        # crop units (H.264 Table 6-1): 4:2:0 -> x2 horizontally and
        # x2 vertically (x4 for field coding); 4:2:2 -> x2/x1; 4:4:4/
        # monochrome -> x1/x1
        unit_x = 2 if chroma_format_idc in (1, 2) else 1
        unit_y = (2 if chroma_format_idc == 1 else 1) * (2 - frame_mbs_only)
        width = pic_width_in_mbs * 16 - unit_x * (crop_l + crop_r)
        height = ((2 - frame_mbs_only) * pic_height_in_map_units * 16
                  - unit_y * (crop_t + crop_b))
        if width <= 0 or height <= 0 or width > 65536 or height > 65536:
            return None
        return {
            "profile": _H264_PROFILES.get(profile_idc, str(profile_idc)),
            "level": f"{level_idc // 10}.{level_idc % 10}",
            "width": width,
            "height": height,
        }
    except KernelError:
        return None


_MAX_SAMPLES = 100_000
_MJPEG_CODECS = {"jpeg", "mjpa", "mjpb"}


@dataclass
class SampleTable:
    codec: str
    offsets: list[int]  # absolute file offset per sample
    sizes: list[int]


def _parse_stbl(data: bytes, start: int, end: int) -> SampleTable:
    codec = ""
    sizes: list[int] = []
    chunk_offsets: list[int] = []
    stsc: list[tuple[int, int]] = []  # (first_chunk, samples_per_chunk)
    for btype, s, e in _boxes(data, start, end, 6):
        if btype == b"stsd" and s + 16 <= e:
            codec = data[s + 12 : s + 16].decode("ascii", "replace")
        elif btype == b"stsz" and s + 12 <= e:
            uniform, count = struct.unpack_from(">II", data, s + 4)
            if count > _MAX_SAMPLES:
                raise KernelError("MP4 sample count exceeds cap")
            if uniform:
                sizes = [uniform] * count
            else:
                if s + 12 + 4 * count > e:
                    raise KernelError("MP4 stsz truncated")
                sizes = list(struct.unpack_from(f">{count}I", data, s + 12))
        elif btype in (b"stco", b"co64") and s + 8 <= e:
            (count,) = struct.unpack_from(">I", data, s + 4)
            if count > _MAX_SAMPLES:
                raise KernelError("MP4 chunk count exceeds cap")
            fmt, width = (">Q", 8) if btype == b"co64" else (">I", 4)
            if s + 8 + width * count > e:
                raise KernelError("MP4 stco truncated")
            chunk_offsets = [
                struct.unpack_from(fmt, data, s + 8 + width * i)[0]
                for i in range(count)]
        elif btype == b"stsc" and s + 8 <= e:
            (count,) = struct.unpack_from(">I", data, s + 4)
            if count > _MAX_SAMPLES or s + 8 + 12 * count > e:
                raise KernelError("MP4 stsc truncated")
            stsc = [struct.unpack_from(">II", data, s + 8 + 12 * i)
                    for i in range(count)]
    if not codec or not sizes or not chunk_offsets:
        raise KernelError("MP4 sample tables incomplete")
    if not stsc:
        stsc = [(1, 1)]
    # expand chunk layout into per-sample absolute offsets
    offsets: list[int] = []
    si = 0
    for ci, chunk_off in enumerate(chunk_offsets, start=1):
        spc = next((n for first, n in reversed(stsc) if first <= ci),
                   stsc[0][1])
        pos = chunk_off
        for _ in range(spc):
            if si >= len(sizes):
                break
            offsets.append(pos)
            pos += sizes[si]
            si += 1
        if si >= len(sizes):
            break
    return SampleTable(codec=codec, offsets=offsets, sizes=sizes[: len(offsets)])


def _video_sample_table(data: bytes) -> SampleTable:
    if not sniff_mp4_video(data):
        raise KernelError("not an ISO BMFF file (no ftyp)")
    for btype, s, e in _boxes(data, 0, len(data), 0):
        if btype != b"moov":
            continue
        for t, ts, te in _boxes(data, s, e, 1):
            if t != b"trak":
                continue
            is_video = False
            stbl_span = None
            for mt, ms, me in _boxes(data, ts, te, 2):
                if mt != b"mdia":
                    continue
                for dt, ds, de in _boxes(data, ms, me, 3):
                    if dt == b"hdlr" and ds + 12 <= de:
                        is_video = data[ds + 8 : ds + 12] == b"vide"
                    elif dt == b"minf":
                        for nt, ns, ne in _boxes(data, ds, de, 4):
                            if nt == b"stbl":
                                stbl_span = (ns, ne)
            if is_video and stbl_span:
                return _parse_stbl(data, *stbl_span)
    raise KernelError("MP4 has no video track with sample tables")


def sample_frames(data: bytes, every_n: int = 30) -> list[tuple]:
    """Decode every Nth frame of a Motion-JPEG video track; returns
    [(frame_index, width, height, mean_r)] with mean_r = mean red /255
    rounded to 6 (oracle-comparable for solid synthetic frames). Inter-
    coded codecs raise KernelError (no codec libs in this container) —
    stsd-identified MJPEG is the real, fully-decoded path."""
    from .image import decode_jpeg

    if every_n < 1:
        raise KernelError("every_n must be >= 1")
    st = _video_sample_table(data)
    if st.codec not in _MJPEG_CODECS:
        raise KernelError(
            f"MP4 codec '{st.codec}' needs an inter-frame decoder "
            "(only MJPEG is decodable in-kernel)")
    n = len(data)
    out = []
    for idx in range(0, len(st.offsets), every_n):
        off, size = st.offsets[idx], st.sizes[idx]
        if off < 0 or size <= 0 or off + size > n:
            raise KernelError("MP4 sample extent out of bounds")
        img = decode_jpeg(data[off : off + size])
        mean_r = round(float(img.pixels[:, :, 0].mean()) / 255.0, 6)
        out.append((idx, img.width, img.height, mean_r))
    return out


# ---------------------------------------------------------------------------
# Matroska / WebM (EBML) — header-level metadata.
# Public sources: RFC 8794 (EBML) + the Matroska element registry.
# Tika 1.20 exposes video/webm via its MP4/container detectors but has
# no Matroska text parser; header facts (doctype, codecs, dims, audio
# shape, duration) are what a corpus pipeline needs.
# ---------------------------------------------------------------------------

_EBML_MAGIC = b"\x1aE\xdf\xa3"


def _ebml_vint(data: bytes, pos: int, end: int,
               keep_marker: bool) -> tuple[int, int]:
    """Read an EBML VINT. keep_marker=True for element IDs (the length
    marker stays part of the value), False for sizes."""
    if pos >= end:
        raise KernelError("ebml: truncated vint")
    first = data[pos]
    if first == 0:
        raise KernelError("ebml: vint length > 8")
    length = 8 - first.bit_length() + 1
    if pos + length > end:
        raise KernelError("ebml: vint runs past end")
    v = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, pos + length


_EBML_UNKNOWN_SIZES = {(1 << (7 * k)) - 1 for k in range(1, 9)}


def _ebml_children(data: bytes, pos: int, end: int, deadline=None):
    """Yield (element_id, payload_start, payload_end). Unknown-size
    elements (live-streamed Segments) extend to the container end."""
    n = 0
    while pos < end:
        n += 1
        if n % 512 == 0:
            check_deadline(deadline, "ebml walk")
        eid, pos = _ebml_vint(data, pos, end, keep_marker=True)
        size, pos = _ebml_vint(data, pos, end, keep_marker=False)
        if size in _EBML_UNKNOWN_SIZES:
            yield eid, pos, end
            return  # unknown size: element owns the rest
        pe = pos + size
        if pe > end:
            raise KernelError("ebml: element overruns container")
        yield eid, pos, pe
        pos = pe


def _ebml_uint(data: bytes, s: int, e: int) -> int:
    v = 0
    for i in range(s, min(e, s + 8)):
        v = (v << 8) | data[i]
    return v


def _ebml_float(data: bytes, s: int, e: int) -> float:
    ln = e - s
    if ln == 4:
        return struct.unpack_from(">f", data, s)[0]
    if ln == 8:
        return struct.unpack_from(">d", data, s)[0]
    return 0.0


@dataclass
class WebmMeta:
    doctype: str = "matroska"
    duration_ms: int | None = None
    video_codec: str | None = None
    width: int | None = None
    height: int | None = None
    audio_codec: str | None = None
    sample_rate: int | None = None
    channels: int | None = None
    n_tracks: int = 0


def parse_webm(data: bytes, deadline: float | None = None) -> WebmMeta:
    if data[:4] != _EBML_MAGIC:
        raise KernelError("not an EBML/Matroska stream")
    meta = WebmMeta()
    timescale = 1_000_000  # ns per tick, Matroska default
    duration_ticks: float | None = None
    for eid, s, e in _ebml_children(data, 0, len(data), deadline):
        if eid == 0x1A45DFA3:              # EBML header
            for cid, cs, ce in _ebml_children(data, s, e, deadline):
                if cid == 0x4282:          # DocType
                    meta.doctype = data[cs:ce].decode("ascii", "replace")
        elif eid == 0x18538067:            # Segment
            for cid, cs, ce in _ebml_children(data, s, e, deadline):
                if cid == 0x1549A966:      # Info
                    for iid, is_, ie in _ebml_children(data, cs, ce,
                                                       deadline):
                        if iid == 0x2AD7B1:
                            timescale = _ebml_uint(data, is_, ie)
                        elif iid == 0x4489:
                            duration_ticks = _ebml_float(data, is_, ie)
                elif cid == 0x1654AE6B:    # Tracks
                    _parse_mkv_tracks(data, cs, ce, meta, deadline)
    if duration_ticks and timescale:
        meta.duration_ms = int(duration_ticks * timescale / 1_000_000)
    return meta


def _parse_mkv_tracks(data: bytes, s: int, e: int, meta: WebmMeta,
                      deadline) -> None:
    for tid, ts, te in _ebml_children(data, s, e, deadline):
        if tid != 0xAE:                    # TrackEntry
            continue
        meta.n_tracks += 1
        ttype = 0
        codec = None
        vid: dict[str, int] = {}
        aud: dict[str, int] = {}
        for cid, cs, ce in _ebml_children(data, ts, te, deadline):
            if cid == 0x83:
                ttype = _ebml_uint(data, cs, ce)
            elif cid == 0x86:
                codec = data[cs:ce].decode("ascii", "replace")
            elif cid == 0xE0:              # Video
                for vcid, vs, ve in _ebml_children(data, cs, ce, deadline):
                    if vcid == 0xB0:
                        vid["w"] = _ebml_uint(data, vs, ve)
                    elif vcid == 0xBA:
                        vid["h"] = _ebml_uint(data, vs, ve)
            elif cid == 0xE1:              # Audio
                for acid, as_, ae in _ebml_children(data, cs, ce, deadline):
                    if acid == 0xB5:
                        aud["sr"] = int(_ebml_float(data, as_, ae))
                    elif acid == 0x9F:
                        aud["ch"] = _ebml_uint(data, as_, ae)
        if ttype == 1 and meta.video_codec is None:
            meta.video_codec = codec
            meta.width = vid.get("w")
            meta.height = vid.get("h")
        elif ttype == 2 and meta.audio_codec is None:
            meta.audio_codec = codec
            meta.sample_rate = aud.get("sr")
            meta.channels = aud.get("ch")


def build_webm(doctype: str, video: tuple[str, int, int] | None,
               audio: tuple[str, int, int] | None,
               duration_ms: int | None = None) -> bytes:
    """Synth/test writer for the subset parse_webm reads."""
    def el(eid: int, payload: bytes) -> bytes:
        idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
        size = len(payload)
        if size < 0x7F:
            return idb + bytes([0x80 | size]) + payload
        if size < 0x3FFF:
            return idb + (0x4000 | size).to_bytes(2, "big") + payload
        return idb + (0x0100000000000000 | size).to_bytes(8, "big") \
            + payload

    def uint(eid: int, v: int) -> bytes:
        return el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))

    hdr = el(0x1A45DFA3, el(0x4282, doctype.encode()))
    info = uint(0x2AD7B1, 1_000_000)
    if duration_ms is not None:
        info += el(0x4489, struct.pack(">d", float(duration_ms)))
    tracks = b""
    tno = 0
    if video:
        tno += 1
        codec, w, h = video
        tracks += el(0xAE, uint(0xD7, tno) + uint(0x83, 1)
                     + el(0x86, codec.encode())
                     + el(0xE0, uint(0xB0, w) + uint(0xBA, h)))
    if audio:
        tno += 1
        codec, sr, ch = audio
        tracks += el(0xAE, uint(0xD7, tno) + uint(0x83, 2)
                     + el(0x86, codec.encode())
                     + el(0xE1, el(0xB5, struct.pack(">f", float(sr)))
                          + uint(0x9F, ch)))
    seg = el(0x1549A966, info) + el(0x1654AE6B, tracks)
    return hdr + el(0x18538067, seg)


# ---------------------------------------------------------------------------
# AVI (RIFF) — header-level metadata (public: the RIFF/AVI layout in
# the original multimedia programming references; avih MainAVIHeader +
# per-stream strh). Tika 1.20 detects video/x-msvideo via mime magic.
# ---------------------------------------------------------------------------

@dataclass
class AviMeta:
    width: int = 0
    height: int = 0
    n_frames: int = 0
    fps: float = 0.0
    n_streams: int = 0
    video_codec: str | None = None
    audio_streams: int = 0
    duration_ms: int | None = None


def _riff_chunks(data: bytes, pos: int, end: int, deadline=None):
    n = 0
    while pos + 8 <= end:
        n += 1
        if n % 512 == 0:
            check_deadline(deadline, "riff walk")
        fourcc = data[pos: pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise KernelError("avi: chunk overruns container")
        yield fourcc, body, body + size
        pos = body + size + (size & 1)     # word-aligned


def parse_avi(data: bytes, deadline: float | None = None) -> AviMeta:
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise KernelError("not a RIFF AVI file")
    end = min(len(data), 12 + struct.unpack_from("<I", data, 4)[0])
    meta = AviMeta()
    us_per_frame = 0
    for fourcc, s, e in _riff_chunks(data, 12, end, deadline):
        if fourcc != b"LIST" or data[s: s + 4] != b"hdrl":
            continue
        for c2, s2, e2 in _riff_chunks(data, s + 4, e, deadline):
            if c2 == b"avih" and e2 - s2 >= 40:
                us_per_frame, _mbps, _pad, _flags, total, _init, streams, \
                    _buf, w, h = struct.unpack_from("<10I", data, s2)
                meta.n_frames = total
                meta.n_streams = streams
                meta.width, meta.height = w, h
            elif c2 == b"LIST" and data[s2: s2 + 4] == b"strl":
                for c3, s3, e3 in _riff_chunks(data, s2 + 4, e2, deadline):
                    if c3 == b"strh" and e3 - s3 >= 8:
                        fcc_type = data[s3: s3 + 4]
                        handler = data[s3 + 4: s3 + 8]
                        if fcc_type == b"vids" and meta.video_codec is None:
                            meta.video_codec = handler.decode(
                                "ascii", "replace").strip("\x00 ") or None
                        elif fcc_type == b"auds":
                            meta.audio_streams += 1
    if us_per_frame:
        meta.fps = round(1_000_000 / us_per_frame, 3)
        meta.duration_ms = int(meta.n_frames * us_per_frame / 1000)
    return meta


def build_avi(width: int, height: int, n_frames: int, fps: int,
              video_codec: bytes = b"mjpg", with_audio: bool = True) -> bytes:
    """Synth/test writer for the subset parse_avi reads."""
    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + len(body).to_bytes(4, "little") + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<10I", 1_000_000 // fps, 0, 0, 0, n_frames, 0,
                       2 if with_audio else 1, 0, width, height) + b"\x00" * 16
    strh_v = b"vids" + video_codec + b"\x00" * 48
    strl_v = lst(b"strl", chunk(b"strh", strh_v))
    body = chunk(b"avih", avih) + strl_v
    if with_audio:
        strh_a = b"auds" + b"\x00" * 52
        body += lst(b"strl", chunk(b"strh", strh_a))
    hdrl = lst(b"hdrl", body)
    movi = lst(b"movi", b"")
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload
