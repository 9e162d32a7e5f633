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

from .errors import KernelError

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
