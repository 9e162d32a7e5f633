"""Pure-Python image decoding: PNG (zlib IDAT) and BMP, no external libs.

The real decoder behind the multimodal feature pipeline (SURVEY.md LLM-
pipeline operators; replaces the round-1 NotImplementedError stub). Scope:

- PNG: 8-bit grayscale (0), RGB (2), palette (3), gray+alpha (4),
  RGBA (6); non-interlaced; filters 0-4 (None/Sub/Up/Average/Paeth);
  IDAT inflation behind the same decompression-ratio bomb guard the PDF
  kernel uses (ref posture: zipBombCompressionRatio=200)
- BMP: BITMAPINFOHEADER, uncompressed 8 (palette) / 24 / 32 bpp,
  bottom-up and top-down rows, 4-byte row padding

Output is an RGB numpy array (h, w, 3) uint8 plus an 8-float feature
vector: mean R/G/B, std R/G/B (all /255), luma mean /255, aspect ratio
(w/h). Poisoned/truncated payloads raise KernelError and degrade to
status rows in the pipeline, never task failures (invariant 7).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

from .errors import InflateRatioError, KernelError

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 interlace passes: (x0, y0, dx, dy)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

_MAX_PIXELS = 64_000_000  # 64 MPix decode cap (bomb guard)


@dataclass
class DecodedImage:
    width: int
    height: int
    pixels: "object"  # numpy uint8 array (h, w, 3)


def sniff_image(data: bytes) -> str | None:
    if data.startswith(_PNG_SIG):
        return "image/png"
    if data.startswith(b"BM") and len(data) > 54:
        return "image/bmp"
    if data.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    if data.startswith(b"GIF87a") or data.startswith(b"GIF89a"):
        return "image/gif"
    return None


# ---------------------------------------------------------------- PNG

def _inflate_guarded(chunks: list[bytes], expected: int,
                     max_ratio: float, max_bytes: int) -> bytes:
    data = b"".join(chunks)
    cap = min(int(max(len(data), 1024) * max_ratio), max_bytes)
    if expected > cap:
        raise InflateRatioError(
            f"PNG raster {expected}B exceeds inflate cap {cap}B")
    d = zlib.decompressobj()
    try:
        out = d.decompress(data, expected)
    except zlib.error as e:
        raise KernelError(f"PNG IDAT inflate error: {e}") from e
    return out


def _unfilter(raw: bytes, width: int, height: int, channels: int,
              pos: int = 0) -> tuple[bytearray, int]:
    """Undo PNG scanline filters starting at `pos` in the inflated stream;
    returns (pixel bytes, next position) — interlaced images call this once
    per Adam7 pass."""
    stride = width * channels
    bpp = channels
    out = bytearray(stride * height)
    for y in range(height):
        if pos >= len(raw):
            raise KernelError("PNG raster truncated")
        ft = raw[pos]
        pos += 1
        row = raw[pos : pos + stride]
        if len(row) < stride:
            raise KernelError("PNG scanline truncated")
        pos += stride
        off = y * stride
        out[off : off + stride] = row
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                out[off + i] = (out[off + i] + out[off + i - bpp]) & 0xFF
        elif ft == 2:  # Up
            if y:
                for i in range(stride):
                    out[off + i] = (out[off + i] + out[off - stride + i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[off - stride + i] if y else 0
                out[off + i] = (out[off + i] + (left + up) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = out[off + i - bpp] if i >= bpp else 0
                b = out[off - stride + i] if y else 0
                c = out[off - stride + i - bpp] if (y and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[off + i] = (out[off + i] + pred) & 0xFF
        else:
            raise KernelError(f"unknown PNG filter {ft}")
    return out, pos


def decode_png(data: bytes, max_ratio: float = 200.0,
               max_bytes: int = 512_000_000) -> DecodedImage:
    import numpy as np

    if not data.startswith(_PNG_SIG):
        raise KernelError("not a PNG")
    pos = 8
    width = height = 0
    bit_depth = color_type = interlace = 0
    palette = b""
    idat: list[bytes] = []
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        if length > n - pos:
            raise KernelError("PNG chunk length overruns file")
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack_from(">IIBBBBB", body, 0))
            if interlace not in (0, 1):
                raise KernelError(f"unknown PNG interlace method {interlace}")
            if bit_depth != 8:
                raise KernelError(f"PNG bit depth {bit_depth} not supported")
            if width * height > _MAX_PIXELS:
                raise KernelError("PNG pixel count exceeds decode cap")
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if not width or not height or not idat:
        raise KernelError("PNG missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise KernelError(f"PNG color type {color_type} not supported")
    if interlace:
        passes = [(x0, y0, dx, dy,
                   (width - x0 + dx - 1) // dx, (height - y0 + dy - 1) // dy)
                  for x0, y0, dx, dy in _ADAM7
                  if (width - x0 + dx - 1) // dx > 0
                  and (height - y0 + dy - 1) // dy > 0]
        expected = sum((wp * channels + 1) * hp for *_ , wp, hp in passes)
        raw = _inflate_guarded(idat, expected, max_ratio, max_bytes)
        arr = np.zeros((height, width, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy, wp, hp in passes:
            pix, pos = _unfilter(raw, wp, hp, channels, pos)
            sub = np.frombuffer(bytes(pix), dtype=np.uint8).reshape(hp, wp, channels)
            arr[y0::dy, x0::dx] = sub
    else:
        expected = (width * channels + 1) * height
        raw = _inflate_guarded(idat, expected, max_ratio, max_bytes)
        pix, _ = _unfilter(raw, width, height, channels)
        arr = np.frombuffer(bytes(pix), dtype=np.uint8).reshape(height, width, channels)
    if color_type == 2:
        rgb = arr
    elif color_type == 6:
        rgb = arr[:, :, :3]
    elif color_type == 0:
        rgb = np.repeat(arr, 3, axis=2)
    elif color_type == 4:
        rgb = np.repeat(arr[:, :, :1], 3, axis=2)
    else:  # palette
        if not palette:
            raise KernelError("palette PNG without PLTE")
        pal = np.frombuffer(palette.ljust(768, b"\x00"), dtype=np.uint8)[:768]
        pal = pal.reshape(256, 3)
        rgb = pal[arr[:, :, 0]]
    return DecodedImage(width=width, height=height, pixels=np.ascontiguousarray(rgb))


# ---------------------------------------------------------------- BMP

def decode_bmp(data: bytes) -> DecodedImage:
    import numpy as np

    if not data.startswith(b"BM") or len(data) < 54:
        raise KernelError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise KernelError("BMP core header not supported")
    width, height_raw = struct.unpack_from("<ii", data, 18)
    (_planes, bpp) = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise KernelError(f"compressed BMP (type {compression}) not supported")
    if bpp not in (8, 24, 32):
        raise KernelError(f"BMP bpp {bpp} not supported")
    top_down = height_raw < 0
    height = abs(height_raw)
    if width <= 0 or height == 0 or width * height > _MAX_PIXELS:
        raise KernelError("implausible BMP dimensions")
    stride = (width * bpp // 8 + 3) & ~3
    need = pix_off + stride * height
    if need > len(data):
        raise KernelError("BMP pixel data truncated")
    rows = np.frombuffer(data, dtype=np.uint8,
                         count=stride * height, offset=pix_off)
    rows = rows.reshape(height, stride)
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", data, 46)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data, dtype=np.uint8, count=n_colors * 4,
                            offset=pal_off).reshape(n_colors, 4)
        idx = rows[:, :width]
        bgr = pal[np.minimum(idx, n_colors - 1)][:, :, :3]
    else:
        nch = bpp // 8
        bgr = rows[:, : width * nch].reshape(height, width, nch)[:, :, :3]
    rgb = bgr[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1]
    return DecodedImage(width=width, height=height,
                        pixels=np.ascontiguousarray(rgb))


# ---------------------------------------------------------------- GIF

def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-flavor LZW: variable code width, CLEAR/END codes, 4096-entry
    dictionary. Output capped at max_pixels (bomb guard)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset_table():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = end + 1

    width = min_code_size + 1
    next_code = end + 1
    reset_table()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                reset_table()
                prev = None
                continue
            if code == end:
                return out
            if code < next_code and code < len(table):
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise KernelError("GIF LZW code out of range")
            out += entry
            if len(out) > max_pixels:
                raise KernelError("GIF LZW output exceeds pixel count")
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> DecodedImage:
    """First frame of a GIF87a/89a: LZW decode + palette lookup; interlace
    and local color tables handled; animation frames beyond the first are
    ignored (Tika-style static extraction)."""
    import numpy as np

    if not (data.startswith(b"GIF87a") or data.startswith(b"GIF89a")):
        raise KernelError("not a GIF")
    if len(data) < 13:
        raise KernelError("GIF truncated header")
    flags = data[10]
    pos = 13
    global_pal = b""
    if flags & 0x80:
        size = 3 * (2 << (flags & 0x07))
        global_pal = data[pos : pos + size]
        pos += size
    n = len(data)
    while pos < n:
        block = data[pos]
        if block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < n and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > n:
                raise KernelError("GIF image descriptor truncated")
            w, h = struct.unpack_from("<HH", data, pos + 5)
            iflags = data[pos + 9]
            pos += 10
            if not w or not h or w * h > _MAX_PIXELS:
                raise KernelError("implausible GIF dimensions")
            pal = global_pal
            if iflags & 0x80:
                size = 3 * (2 << (iflags & 0x07))
                pal = data[pos : pos + size]
                pos += size
            if not pal:
                raise KernelError("GIF frame without a color table")
            if pos >= n:
                raise KernelError("GIF LZW data missing")
            min_code = data[pos]
            pos += 1
            if not (2 <= min_code <= 11):
                raise KernelError(f"GIF LZW min code size {min_code} invalid")
            chunks = []
            while pos < n and data[pos]:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(b"".join(chunks), min_code, w * h)
            if len(idx) < w * h:
                raise KernelError("GIF frame pixel data truncated")
            arr = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8).reshape(h, w)
            if iflags & 0x40:  # interlaced: reorder rows
                ordered = np.empty_like(arr)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for y in range(start, h, step):
                        ordered[y] = arr[src]
                        src += 1
                arr = ordered
            pal_arr = np.frombuffer(pal.ljust(768, b"\x00")[:768],
                                    dtype=np.uint8).reshape(256, 3)
            rgb = pal_arr[np.minimum(arr, len(pal) // 3 - 1)]
            return DecodedImage(width=w, height=h,
                                pixels=np.ascontiguousarray(rgb))
        elif block == 0x3B:  # trailer
            break
        else:
            raise KernelError(f"unknown GIF block 0x{block:02X}")
    raise KernelError("GIF contains no image frame")


# ---------------------------------------------------------------- JPEG (dims only)

_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}  # SOFn markers


def jpeg_dimensions(data: bytes) -> tuple[int, int] | None:
    """Width/height from the SOFn frame header — no DCT decode needed.
    Returns None on malformed streams (caller degrades to a status row)."""
    if not data.startswith(b"\xff\xd8"):
        return None
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # standalone
            i += 2
            continue
        (seg_len,) = struct.unpack_from(">H", data, i + 2)
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        if marker in _JPEG_SOF:
            if seg_len < 7:
                return None
            h, w = struct.unpack_from(">HH", data, i + 5)
            return (w, h) if w and h else None
        if marker == 0xDA:  # start of scan: SOF must precede it
            return None
        i += 2 + seg_len
    return None


# ---------------------------------------------------------------- features

def decode_any(data: bytes, max_ratio: float = 200.0) -> DecodedImage:
    kind = sniff_image(data)
    if kind == "image/png":
        return decode_png(data, max_ratio)
    if kind == "image/bmp":
        return decode_bmp(data)
    if kind == "image/gif":
        return decode_gif(data)
    if kind == "image/jpeg":
        raise NotImplementedError(
            "JPEG decode (DCT) is out of kernel scope in this container")
    raise KernelError("unrecognized image payload")


def resize_image(img: DecodedImage, out_w: int, out_h: int) -> DecodedImage:
    """Nearest-neighbor resize (pure numpy index mapping — deterministic,
    no interpolation kernel dependencies)."""
    import numpy as np

    if out_w <= 0 or out_h <= 0 or out_w * out_h > _MAX_PIXELS:
        raise KernelError("implausible resize target")
    ys = (np.arange(out_h) * img.height) // out_h
    xs = (np.arange(out_w) * img.width) // out_w
    return DecodedImage(width=out_w, height=out_h,
                        pixels=np.ascontiguousarray(img.pixels[ys][:, xs]))


def image_features(img: DecodedImage) -> list[float]:
    """8 deterministic features: mean R/G/B /255, std R/G/B /255,
    luma mean /255, aspect ratio w/h."""
    import numpy as np

    px = img.pixels.astype(np.float64)
    means = px.mean(axis=(0, 1)) / 255.0
    stds = px.std(axis=(0, 1)) / 255.0
    luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]).mean() / 255.0
    aspect = img.width / img.height
    return [round(float(v), 6) for v in
            (*means, *stds, luma, aspect)]
