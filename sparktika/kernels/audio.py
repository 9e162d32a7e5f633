"""PCM WAV audio kernel (RIFF/WAVE chunk walk + sample decode), no
external libs — the real decoder behind the multimodal audio pipeline
(the reference has no audio path; Tika's TikaCoreProperties surface for
audio is metadata-only, and the LLM-pipeline brief calls for decode /
feature-extract over binary media columns).

Scope: canonical RIFF little-endian WAV, fmt chunk format 1 (PCM) with
8/16/32-bit integer samples; other formats (float, ADPCM, mp3-in-wav)
raise KernelError and degrade to status rows. Features are deterministic:
duration, per-file RMS / peak (normalized to [0,1]), DC mean.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .errors import KernelError

_MAX_SAMPLES = 256_000_000  # bomb guard (~16 min of 48kHz stereo 16-bit)


@dataclass
class DecodedAudio:
    sample_rate: int
    n_channels: int
    bits: int
    n_frames: int
    samples: "object"  # numpy float64 array, normalized [-1, 1], flattened


def sniff_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> DecodedAudio:
    import numpy as np

    if not sniff_wav(data):
        raise KernelError("not a RIFF/WAVE file")
    pos, n = 12, len(data)
    fmt = None
    pcm = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise KernelError("WAV fmt chunk truncated")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise KernelError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format != 1:
        raise KernelError(f"WAV format {audio_format} not supported (PCM only)")
    if not n_channels or not sample_rate:
        raise KernelError("WAV has zero channels or sample rate")
    # bound BEFORE the float64 allocation (8 B/sample) — checking after
    # frombuffer/astype defeats the guard's purpose (r5 review)
    if len(pcm) // max(bits // 8, 1) > _MAX_SAMPLES:
        raise KernelError("WAV sample count exceeds decode cap")
    if bits == 16:
        arr = np.frombuffer(pcm[: len(pcm) & ~1], dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        arr = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 32:
        arr = np.frombuffer(pcm[: len(pcm) & ~3], dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise KernelError(f"WAV bit depth {bits} not supported")
    if arr.size > _MAX_SAMPLES:
        raise KernelError("WAV sample count exceeds decode cap")
    n_frames = arr.size // n_channels
    return DecodedAudio(sample_rate=sample_rate, n_channels=n_channels,
                        bits=bits, n_frames=n_frames,
                        samples=arr[: n_frames * n_channels])


def audio_features(a: DecodedAudio) -> dict:
    """Deterministic features: duration_ms (int), rms / peak / dc_mean
    rounded to 6 decimals."""
    import numpy as np

    s = a.samples
    duration_ms = round(a.n_frames * 1000 / a.sample_rate)
    if s.size:
        rms = float(np.sqrt(np.mean(s * s)))
        peak = float(np.max(np.abs(s)))
        dc = float(np.mean(s))
    else:
        rms = peak = dc = 0.0
    return {
        "sample_rate": a.sample_rate,
        "n_channels": a.n_channels,
        "duration_ms": int(duration_ms),
        "rms": round(rms, 6),
        "peak": round(peak, 6),
        "dc_mean": round(dc, 6),
    }


@dataclass
class AudioMeta:
    """Header-level stream properties (no sample decode)."""
    mime: str
    sample_rate: int
    channels: int
    bits_per_sample: int = 0
    duration_ms: int = 0
    bitrate_kbps: int = 0


def parse_flac_streaminfo(data: bytes) -> AudioMeta | None:
    """FLAC STREAMINFO (public format spec §9.1): the mandatory first
    metadata block after 'fLaC' carries sample rate (20 bits), channels
    (3 bits, stored -1), bits/sample (5 bits, stored -1), and the 36-bit
    total sample count — duration without touching any frame."""
    if data[:4] != b"fLaC" or len(data) < 4 + 4 + 34:
        return None
    block_type = data[4] & 0x7F
    size = int.from_bytes(data[5:8], "big")
    if block_type != 0 or size < 34:
        return None
    b = data[8 : 8 + 34]
    sample_rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    channels = ((b[12] >> 1) & 0x07) + 1
    bps = (((b[12] & 0x01) << 4) | (b[13] >> 4)) + 1
    total = ((b[13] & 0x0F) << 32) | int.from_bytes(b[14:18], "big")
    if not (1 <= sample_rate <= 655_350):
        return None
    duration_ms = round(total * 1000 / sample_rate) if total else 0
    return AudioMeta("audio/flac", sample_rate, channels, bps, duration_ms)


# MPEG-1 Layer III tables (public ISO 11172-3 values)
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)


def _syncsafe32(data: bytes, off: int) -> int:
    """ID3v2 syncsafe 28-bit integer at `off` (7 bits per byte)."""
    return ((data[off] & 0x7F) << 21) | ((data[off + 1] & 0x7F) << 14) \
        | ((data[off + 2] & 0x7F) << 7) | (data[off + 3] & 0x7F)


def parse_mp3_header(data: bytes) -> AudioMeta | None:
    """First MPEG-1 Layer III frame header (after an optional ID3v2 tag):
    bitrate/sample-rate/channel mode, and a constant-bitrate duration
    estimate from the payload size — the header-level metadata Tika's
    Mp3Parser emits without decoding audio."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        pos = 10 + _syncsafe32(data, 6)
    # scan a bounded window for the frame sync (junk tolerance); the
    # 4-byte header needs pos+3 readable, so the last valid pos is len-4
    end = min(pos + 65536, len(data) - 3)
    while pos < end:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            version = (data[pos + 1] >> 3) & 0x03
            layer = (data[pos + 1] >> 1) & 0x03
            if version == 3 and layer == 1:  # MPEG-1 Layer III
                br_idx = data[pos + 2] >> 4
                sr_idx = (data[pos + 2] >> 2) & 0x03
                mode = data[pos + 3] >> 6
                if 0 < br_idx < 15 and sr_idx < 3:
                    bitrate = _MP3_BITRATES[br_idx]
                    rate = _MP3_RATES[sr_idx]
                    channels = 1 if mode == 3 else 2
                    payload = len(data) - pos
                    duration_ms = round(payload * 8 / bitrate) if bitrate else 0
                    return AudioMeta("audio/mpeg", rate, channels, 0,
                                     duration_ms, bitrate)
            pos += 1
        else:
            pos += 1
    return None


def parse_ogg_header(data: bytes) -> AudioMeta | None:
    """First packet of the first Ogg page (RFC 3533 framing): Vorbis
    (\\x01vorbis) and Opus (OpusHead) identification headers yield
    channels + sample rate without touching audio data."""
    if data[:4] != b"OggS" or len(data) < 28:
        return None
    n_segs = data[26]
    if len(data) < 27 + n_segs:
        return None
    body = data[27 + n_segs:]
    if body[:7] == b"\x01vorbis" and len(body) >= 16:
        channels = body[11]
        rate = int.from_bytes(body[12:16], "little")
        if channels and 1 <= rate <= 655_350:
            return AudioMeta("audio/vorbis", rate, channels)
        return None
    if body[:8] == b"OpusHead" and len(body) >= 16:
        channels = body[9]
        rate = int.from_bytes(body[12:16], "little")  # input sample rate
        if channels and 1 <= rate <= 655_350:
            return AudioMeta("audio/opus", rate, channels)
        return None
    return None


def parse_id3_tags(data: bytes) -> dict[str, str]:
    """ID3v2 text frames -> Tika-style keys (title / xmpDM:artist /
    xmpDM:album — the Mp3Parser metadata users actually consume).
    Handles v2.2 (3-byte ids/sizes), v2.3 (plain 32-bit sizes) and v2.4
    (syncsafe sizes); tag-level unsynchronisation is reversed; v2.4
    frames carrying compression/encryption/data-length-indicator flags
    are skipped honestly (their bodies aren't plain text). Text
    encodings latin-1 / utf-16(+BOM) / utf-16-be / utf-8. Frame bodies
    are clamped to the TAG end and value length is capped — a lying
    frame size must never turn the audio payload into a metadata string
    (bomb posture; r4 review). Anything malformed stops the walk with
    whatever was parsed (never raises)."""
    out: dict[str, str] = {}
    if data[:3] != b"ID3" or len(data) < 10:
        return out
    ver = data[3]
    tag = data[10: min(10 + _syncsafe32(data, 6), len(data))]
    if data[5] & 0x80 and ver <= 3:
        # tag-level unsynchronisation: remove the 0xFF,0x00 stuffing
        # before walking frames. v2.2/v2.3 ONLY: in v2.4 unsync is
        # applied per-frame and syncsafe frame sizes count the STORED
        # (still-stuffed) bytes, so a global removal here would shrink
        # the buffer under the declared sizes and desync the walk —
        # v2.4 frames with the unsync format flag are skipped below.
        tag = tag.replace(b"\xff\x00", b"\xff")
    end = len(tag)
    pos = 0
    if data[5] & 0x40 and ver >= 3:  # extended header: skip by its size
        if pos + 4 > end:
            return out
        # v2.4 ext-header size is syncsafe and INCLUDES its own 4 size
        # bytes; v2.3 is plain big-endian and EXCLUDES them.
        ext = (_syncsafe32(tag, pos) if ver == 4
               else int.from_bytes(tag[pos: pos + 4], "big"))
        pos += ext if ver == 4 else ext + 4
    names = ({b"TT2": "title", b"TP1": "xmpDM:artist", b"TAL": "xmpDM:album"}
             if ver == 2 else
             {b"TIT2": "title", b"TPE1": "xmpDM:artist",
              b"TALB": "xmpDM:album"})
    id_w = 3 if ver == 2 else 4
    try:
        for _ in range(256):
            hdr_w = id_w + (3 if ver == 2 else 6)
            if pos + hdr_w > end:
                break
            fid = tag[pos: pos + id_w]
            if fid.strip(b"\x00") == b"":
                break  # padding
            if ver == 2:
                size = int.from_bytes(tag[pos + 3: pos + 6], "big")
                flags = 0
            elif ver == 4:
                size = _syncsafe32(tag, pos + 4)
                flags = tag[pos + 9]
            else:
                size = int.from_bytes(tag[pos + 4: pos + 8], "big")
                flags = tag[pos + 9]
            # clamp to the TAG end — a lying size must not slice into
            # the audio payload (r4 review repro: 100 MB title string)
            body = tag[pos + hdr_w: min(pos + hdr_w + size, end)]
            pos += hdr_w + size
            # format flags meaning the body isn't plain text: skip
            # honestly rather than decode garbage. v2.3 packs
            # compression/encryption in the HIGH bits of the format
            # byte; v2.4 uses the low nibble (compression / encryption /
            # unsync / data-length-indicator).
            if (ver == 3 and flags & 0xC0) or (ver == 4 and flags & 0x0F):
                continue
            if fid in names and body:
                enc, payload = body[0], body[1: 4096]
                codec = ("latin-1", "utf-16", "utf-16-be",
                         "utf-8")[enc] if enc < 4 else "latin-1"
                val = payload.decode(codec, "replace").strip("\x00").strip()
                if val:
                    out[names[fid]] = val
    except (IndexError, ValueError):
        pass
    return out


def parse_flac_comments(data: bytes) -> dict[str, str]:
    """FLAC VORBIS_COMMENT block (format spec §9.5 / Vorbis comment
    spec) -> the same Tika-style keys as the ID3 path (title /
    xmpDM:artist / xmpDM:album). Field names match case-insensitively;
    comment and block counts are capped; malformed data returns whatever
    parsed (never raises)."""
    out: dict[str, str] = {}
    if data[:4] != b"fLaC":
        return out
    wanted = {"title": "title", "artist": "xmpDM:artist",
              "album": "xmpDM:album"}
    pos = 4
    try:
        for _ in range(64):  # metadata block cap
            if pos + 4 > len(data):
                break
            head = data[pos]
            size = int.from_bytes(data[pos + 1: pos + 4], "big")
            body = data[pos + 4: pos + 4 + size]
            if head & 0x7F == 4:  # VORBIS_COMMENT
                out = _vorbis_comment_fields(body)
                break
            pos += 4 + size
            if head & 0x80:  # last-block flag
                break
    except (IndexError, ValueError):
        pass
    return out


def _vorbis_comment_fields(body: bytes) -> dict[str, str]:
    """Vendor string + KEY=value fields of a Vorbis comment structure
    (shared by FLAC's VORBIS_COMMENT block and Ogg's comment packets)."""
    wanted = {"title": "title", "artist": "xmpDM:artist",
              "album": "xmpDM:album"}
    out: dict[str, str] = {}
    p = 0
    vlen = int.from_bytes(body[p: p + 4], "little")
    p += 4 + vlen
    cnt = int.from_bytes(body[p: p + 4], "little")
    p += 4
    for _ in range(min(cnt, 1024)):
        if p + 4 > len(body):
            break
        clen = int.from_bytes(body[p: p + 4], "little")
        p += 4
        field = body[p: p + min(clen, 4096)].decode("utf-8", "replace")
        p += clen
        if "=" in field:
            k, v = field.split("=", 1)
            key = wanted.get(k.lower())
            if key and v and key not in out:
                out[key] = v
    return out


def parse_ogg_comments(data: bytes) -> dict[str, str]:
    """Vorbis/Opus comment tags from an Ogg stream: pages reassemble
    into packets via segment lacing (RFC 3533), and the packet starting
    \\x03vorbis (Vorbis comment header, packet 2) or OpusTags parses
    with the shared Vorbis-comment field reader. Bounded: first 8 pages
    / 1 MB; malformed framing returns whatever parsed."""
    out: dict[str, str] = {}
    pos = 0
    packets: list[bytes] = []
    current = bytearray()
    try:
        for _ in range(8):
            if data[pos: pos + 4] != b"OggS" or pos + 27 > len(data):
                break
            n_segs = data[pos + 26]
            lacing = data[pos + 27: pos + 27 + n_segs]
            body_start = pos + 27 + n_segs
            p = body_start
            for seg in lacing:
                current += data[p: p + seg]
                p += seg
                if seg < 255:
                    packets.append(bytes(current))
                    current = bytearray()
                if len(packets) >= 4:
                    break
            pos = p
            if len(packets) >= 4 or pos >= min(len(data), 1_000_000):
                break
        for pkt in packets:
            if pkt[:7] == b"\x03vorbis":
                out = _vorbis_comment_fields(pkt[7:])
                break
            if pkt[:8] == b"OpusTags":
                out = _vorbis_comment_fields(pkt[8:])
                break
    except (IndexError, ValueError):
        pass
    return out


def _f80(b: bytes) -> float:
    """80-bit IEEE 754 extended float (the AIFF sampleRate field):
    1 sign + 15 exponent (bias 16383) + explicit 64-bit mantissa."""
    if len(b) < 10:
        return 0.0
    se = int.from_bytes(b[:2], "big")
    exp = se & 0x7FFF
    mant = int.from_bytes(b[2:10], "big")
    if mant == 0 or exp in (0, 0x7FFF):  # zero/denorm/inf/nan -> refuse
        return 0.0
    v = mant * 2.0 ** (exp - 16383 - 63)
    return -v if se & 0x8000 else v


# AIFF text chunk ids -> Tika-style metadata keys (EA IFF 85 / Apple
# AIFF-1.3 spec: NAME/AUTH/ANNO/'(c) ' carry plain text)
_AIFF_TEXT_KEYS = {b"NAME": "title", b"AUTH": "author",
                   b"ANNO": "comment", b"(c) ": "copyright"}


def parse_aiff(data: bytes) -> tuple[AudioMeta, dict[str, str]] | None:
    """AIFF / AIFF-C header walk (public EA IFF 85 container + Apple
    AIFF-1.3 / AIFF-C spec; Tika 1.20 parity: AudioParser via
    javax.sound reports samplerate/channels/bits for .aiff). Big-endian
    chunks; COMM carries channels, frame count, bits, and an 80-bit
    extended-float sample rate; AIFC appends a compression fourcc.
    Returns (meta, text tags) or None if the container shape fails."""
    if data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        return None
    is_aifc = data[8:12] == b"AIFC"
    end = min(len(data), 8 + int.from_bytes(data[4:8], "big"))
    pos = 12
    meta: AudioMeta | None = None
    tags: dict[str, str] = {}
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "big")
        if size > end - pos - 8:  # truncated chunk: stop, keep prefix
            break
        body = data[pos + 8:pos + 8 + size]
        if cid == b"COMM" and len(body) >= 18 and meta is None:
            ch = int.from_bytes(body[0:2], "big")
            n_frames = int.from_bytes(body[2:6], "big")
            bits = int.from_bytes(body[6:8], "big")
            rate = _f80(body[8:18])
            if not (1 <= ch <= 64 and 0 < rate <= 655_350):
                return None
            duration_ms = round(n_frames * 1000 / rate) if n_frames else 0
            meta = AudioMeta("audio/x-aiff", int(round(rate)), ch, bits,
                             duration_ms)
            if is_aifc and len(body) >= 22:
                tags["compression-type"] = body[18:22].decode(
                    "ascii", "replace")
        elif cid in _AIFF_TEXT_KEYS and size:
            txt = body.decode("ascii", "replace").strip("\x00").strip()
            if txt:
                tags[_AIFF_TEXT_KEYS[cid]] = txt
        pos += 8 + size + (size & 1)  # chunks pad to even
    if meta is None:
        return None
    return meta, tags


# Sun/NeXT .au encoding -> bits per sample (public SunOS audio file
# format; 1 = G.711 mu-law 8-bit, 2/3/4/5 = linear PCM, 6/7 = float,
# 27 = G.711 A-law)
_AU_BITS = {1: 8, 2: 8, 3: 16, 4: 24, 5: 32, 6: 32, 7: 64, 27: 8}


def parse_au(data: bytes) -> tuple[AudioMeta, str] | None:
    """Sun .au header (public format: '.snd' magic + six big-endian
    u32s; Tika 1.20 parity: AudioParser handles .au). Returns
    (meta, info string) or None."""
    if data[:4] != b".snd" or len(data) < 28:
        return None
    off, dsize, enc, rate, ch = struct.unpack(">5I", data[4:24])
    if off < 24 or not (1 <= ch <= 64) or not (1 <= rate <= 655_350):
        return None
    bits = _AU_BITS.get(enc, 0)
    duration_ms = 0
    if dsize not in (0, 0xFFFFFFFF) and bits and dsize <= len(data):
        frames = dsize // max(1, ch * (bits // 8))
        duration_ms = round(frames * 1000 / rate)
    info = ""
    if off > 24:
        info = (data[24:min(off, len(data))].split(b"\x00", 1)[0]
                .decode("latin-1", "replace").strip())
    return AudioMeta("audio/basic", rate, ch, bits, duration_ms), info


def parse_wav_header(data: bytes) -> AudioMeta | None:
    """RIFF/WAVE fmt-chunk facts WITHOUT sample decode — the dispatcher
    posture for .wav (the full PCM decoder decode_wav stays the
    multimodal path). Reports rate/channels/bits for ANY format tag
    (Tika's AudioParser surface), plus duration from the data chunk for
    integer PCM."""
    if not sniff_wav(data) or len(data) < 12:
        return None
    pos = 12
    fmt = None
    data_size = 0
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        if cid == b"fmt " and size >= 16 and pos + 8 + 16 <= len(data):
            fmt = struct.unpack("<HHIIHH", data[pos + 8:pos + 8 + 16])
        elif cid == b"data":
            data_size = min(size, max(0, len(data) - pos - 8))
        if size > len(data) - pos - 8:
            break
        pos += 8 + size + (size & 1)
    if fmt is None:
        return None
    audio_format, ch, rate, _bytes_s, block_align, bits = fmt
    if not (1 <= ch <= 64) or not (1 <= rate <= 655_350):
        return None
    duration_ms = 0
    if audio_format == 1 and block_align:
        duration_ms = round(data_size // block_align * 1000 / rate)
    return AudioMeta("audio/x-wav", rate, ch, bits, duration_ms)
