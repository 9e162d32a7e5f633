"""MP4 / ISO BMFF video metadata kernel (box walker), no external libs.

Parses the container structure only — dimensions, duration, track kinds —
which needs no codec work: mvhd carries timescale/duration, tkhd carries
16.16 fixed-point width/height, hdlr classifies tracks (vide/soun).
Frame decoding (the frame-sample op) requires a codec and stays honestly
stubbed behind NotImplementedError, like JPEG pixel decode.

Guards (invariant 7): box sizes are bounds-checked, the walk is
depth-capped and strictly forward-progressing, so crafted size fields
terminate with KernelError instead of looping.
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


def sample_frames(data: bytes, every_n: int = 30):
    """Frame sampling needs a codec decoder (H.264/AV1/...), which is out
    of kernel scope in this container — the Spark-side plumbing (schema,
    batching) is exercised with the metadata path instead."""
    raise NotImplementedError(
        "MP4 frame decode requires a codec library (not in this container)")
