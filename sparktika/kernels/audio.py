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
