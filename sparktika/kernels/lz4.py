"""LZ4 frame decoder (public frame + block format specs,
github.com/lz4/lz4/doc), from scratch — Python ships no lz4 codec.

Completes the modern single-member codec matrix next to
gzip/bzip2/xz/zstd: frame descriptor (FLG/BD + header-checksum byte),
compressed + uncompressed blocks, optional block and content XXH32
checksums (XXH32 reimplemented below from the public xxHash spec),
block-DEPENDENT streams (matches may reach into earlier blocks —
decoding into one continuous per-frame buffer handles this naturally),
skippable frames (same magic family as zstd), the legacy frame format
(magic 0x184C2102), and multi-frame concatenation.

Bomb posture (invariant 7): callers pass max_out; output beyond it
raises InflateRatioError mid-decode, truncation/corruption raises
KernelError, and lying lengths can never escape as IndexError.

Tika 1.20 parity: commons-compress FramedLZ4CompressorInputStream via
tika-parsers (reference build.gradle); behaviorally this mirrors the
gzip/xz wrapper route in kernels/extract.py.
"""

from __future__ import annotations

from .errors import InflateRatioError, KernelError

MAGIC = 0x184D2204
MAGIC_LEGACY = 0x184C2102
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F
_MAX_FRAMES = 64
_BLOCK_MAX = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}

_P1, _P2, _P3, _P4, _P5 = (2654435761, 2246822519, 3266489917,
                           668265263, 374761393)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 from the public spec (xxhash_spec.md)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i + 16 <= n:
            v1 = (_rotl32((v1 + int.from_bytes(data[i:i + 4], "little")
                           * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + int.from_bytes(data[i + 4:i + 8], "little")
                           * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + int.from_bytes(data[i + 8:i + 12], "little")
                           * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + int.from_bytes(data[i + 12:i + 16], "little")
                           * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
             + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        h = (_rotl32((h + int.from_bytes(data[i:i + 4], "little")
                      * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


def _decode_block(src: bytes, out: bytearray, frame_start: int,
                  max_out: int) -> None:
    """LZ4 block format: token-driven literal/match sequences appended
    to `out`; matches may reach back to frame_start (block-dependent
    streams)."""
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise KernelError("lz4: literal length truncated")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise KernelError("lz4: literals truncated")
        if len(out) + lit > max_out:
            raise InflateRatioError("lz4: output exceeds cap")
        out += src[i:i + lit]
        i += lit
        if i == n:
            return  # last sequence carries literals only
        if i + 2 > n:
            raise KernelError("lz4: offset truncated")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out) - frame_start:
            raise KernelError("lz4: match offset out of range")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if i >= n:
                    raise KernelError("lz4: match length truncated")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        if len(out) + mlen > max_out:
            raise InflateRatioError("lz4: output exceeds cap")
        if offset >= mlen:
            start = len(out) - offset
            out += out[start:start + mlen]
        else:
            for _ in range(mlen):  # overlapping copy
                out.append(out[-offset])
    raise KernelError("lz4: block ended mid-sequence")


def decompress_lz4(data: bytes, max_out: int) -> bytes:
    """Decode all frames; output capped at max_out (InflateRatioError
    beyond); malformed input raises KernelError, never IndexError."""
    try:
        return _decompress_all(data, max_out)
    except (IndexError, ValueError, OverflowError) as e:
        raise KernelError(f"lz4: malformed stream ({e})") from e


def _decompress_all(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    frames = 0
    while pos < n:
        frames += 1
        if frames > _MAX_FRAMES:
            raise KernelError("lz4: frame count exceeds cap")
        if pos + 4 > n:
            raise KernelError("lz4: truncated frame magic")
        magic = int.from_bytes(data[pos:pos + 4], "little")
        pos += 4
        if _SKIP_LO <= magic <= _SKIP_HI:
            if pos + 4 > n:
                raise KernelError("lz4: truncated skippable frame")
            sz = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4 + sz
            if pos > n:
                raise KernelError("lz4: skippable frame overruns")
            continue
        if magic == MAGIC_LEGACY:
            # legacy frame: raw blocks of 4-byte compressed size until
            # EOF or the next magic; each decodes to <= 8 MiB
            frame_start = len(out)
            while pos + 4 <= n:
                bsz = int.from_bytes(data[pos:pos + 4], "little")
                if bsz in (MAGIC, MAGIC_LEGACY) or \
                        _SKIP_LO <= bsz <= _SKIP_HI:
                    break  # next frame's magic
                pos += 4
                if bsz > n - pos:
                    raise KernelError("lz4: legacy block overruns input")
                _decode_block(data[pos:pos + bsz], out, frame_start,
                              max_out)
                pos += bsz
            continue
        if magic != MAGIC:
            raise KernelError("lz4: bad frame magic")
        if pos + 2 > n:
            raise KernelError("lz4: truncated frame descriptor")
        flg = data[pos]
        bd = data[pos + 1]
        if (flg >> 6) != 1:
            raise KernelError("lz4: unsupported frame version")
        if flg & 0x02:
            raise KernelError("lz4: reserved FLG bit set")
        b_checksum = bool(flg & 0x10)
        c_size = bool(flg & 0x08)
        c_checksum = bool(flg & 0x04)
        dict_id = bool(flg & 0x01)
        bmax = _BLOCK_MAX.get(bd >> 4)
        if bmax is None or bd & 0x8F:
            raise KernelError("lz4: invalid BD byte")
        desc_len = 2 + (8 if c_size else 0) + (4 if dict_id else 0)
        if pos + desc_len + 1 > n:
            raise KernelError("lz4: truncated frame descriptor")
        descriptor = data[pos:pos + desc_len]
        content_size = (int.from_bytes(data[pos + 2:pos + 10], "little")
                        if c_size else None)
        if dict_id:
            raise KernelError("lz4: dictionary frames unsupported")
        hc = data[pos + desc_len]
        if (xxh32(descriptor) >> 8) & 0xFF != hc:
            raise KernelError("lz4: frame descriptor checksum mismatch")
        pos += desc_len + 1
        if content_size is not None and len(out) + content_size > max_out:
            raise InflateRatioError(
                f"lz4: declared content {content_size}B exceeds cap")
        frame_start = len(out)
        while True:
            if pos + 4 > n:
                raise KernelError("lz4: truncated block size")
            bsz = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
            if bsz == 0:
                break  # EndMark
            uncompressed = bool(bsz & 0x80000000)
            bsz &= 0x7FFFFFFF
            if bsz > bmax:
                raise KernelError("lz4: block size over frame limit")
            if pos + bsz > n:
                raise KernelError("lz4: block overruns input")
            block = data[pos:pos + bsz]
            pos += bsz
            if b_checksum:
                if pos + 4 > n:
                    raise KernelError("lz4: truncated block checksum")
                want = int.from_bytes(data[pos:pos + 4], "little")
                pos += 4
                if xxh32(block) != want:
                    raise KernelError("lz4: block checksum mismatch")
            if uncompressed:
                if len(out) + bsz > max_out:
                    raise InflateRatioError("lz4: output exceeds cap")
                out += block
            else:
                _decode_block(block, out, frame_start, max_out)
        if content_size is not None and \
                len(out) - frame_start != content_size:
            raise KernelError(
                f"lz4: content size mismatch "
                f"({len(out) - frame_start} != {content_size})")
        if c_checksum:
            if pos + 4 > n:
                raise KernelError("lz4: truncated content checksum")
            want = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
            if xxh32(bytes(out[frame_start:])) != want:
                raise KernelError("lz4: content checksum mismatch")
    return bytes(out)
