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
    if data.startswith(b"II*\x00") or data.startswith(b"MM\x00*"):
        return "image/tiff"
    if (data.startswith(b"\x00\x00\x01\x00") and len(data) >= 6
            and 0 < struct.unpack_from("<H", data, 4)[0] <= 256):
        return "image/vnd.microsoft.icon"  # same constant as kernels/mime.py
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "image/webp"
    if data[:4] == b"8BPS" and len(data) >= 26:
        return "image/vnd.adobe.photoshop"
    pnm = sniff_pnm(data)
    if pnm:
        return pnm
    if is_pcx(data):
        return "image/vnd.zbrush.pcx"
    if is_tga(data):
        return "image/x-tga"
    return None


_TGA_FOOTER = b"TRUEVISION-XFILE.\x00"


def is_tga(data: bytes) -> bool:
    """Targa has NO leading magic; only v2 files (the ones with the
    trailing 26-byte footer ending in TRUEVISION-XFILE.) are claimed —
    plus header-consistency facts (legal colormap/image types)."""
    if len(data) < 44 or data[-18:] != _TGA_FOOTER:
        return False
    return data[1] in (0, 1) and data[2] in (0, 1, 2, 3, 9, 10, 11)


def tga_dimensions(data: bytes) -> tuple[int, int] | None:
    w, h = struct.unpack_from("<HH", data, 12)
    bpp = data[16]
    if bpp not in (8, 15, 16, 24, 32):
        return None
    return w, h


_PNM_MIMES = {b"1": "image/x-portable-bitmap",
              b"2": "image/x-portable-graymap",
              b"3": "image/x-portable-pixmap",
              b"4": "image/x-portable-bitmap",
              b"5": "image/x-portable-graymap",
              b"6": "image/x-portable-pixmap"}


def sniff_pnm(data: bytes) -> str | None:
    """Netpbm P1-P6 (public netpbm format docs). The 2-byte ASCII magic
    is weak — prose like 'P3 100 200 of our products...' must NOT be
    eaten as an image (r8 review finding: that misroute silently
    discarded a text document's entire body) — so detection requires
    four consistent facts, the PCX/DBF convention: magic, a REAL
    single-byte whitespace separator (tuple membership, so a 2-byte
    file's empty slice can't pass), parseable in-range dims, and the
    next token matching the format (a 1..65535 maxval for P2/P3/P5/P6;
    a sample bit, comment, or EOF for P1/P4)."""
    parsed = _pnm_parse(data)
    return parsed[0] if parsed else None


def _pnm_parse(data: bytes) -> tuple[str, int, int] | None:
    if data[:1] != b"P" or data[1:2] not in _PNM_MIMES \
            or data[2:3] not in (b" ", b"\t", b"\r", b"\n"):
        return None
    kind = data[1:2]
    dims = pnm_dimensions(data)
    if dims is None:
        return None
    (w, h), end = dims
    if not (1 <= w <= 65_535 and 1 <= h <= 65_535):
        return None
    n = min(len(data), 4096)
    pos = end
    while pos < n and data[pos:pos + 1] in b" \t\r\n":
        pos += 1
    if kind in (b"1", b"4"):
        # bitmap: sample data (ASCII bits for P1, raw for P4), a
        # comment, or EOF follows the dims
        if pos < n and data[pos:pos + 1] not in b"01#" \
                and kind == b"1":
            return None
    else:
        # graymap/pixmap: the maxval token must follow
        tok_end = pos
        while tok_end < n and data[tok_end:tok_end + 1].isdigit():
            tok_end += 1
        if tok_end == pos:
            if data[pos:pos + 1] == b"#":
                pass  # comment before maxval: plausible, keep
            else:
                return None
        else:
            maxval = int(data[pos:tok_end])
            if not (1 <= maxval <= 65_535):
                return None
    return _PNM_MIMES[kind], w, h


def is_pcx(data: bytes) -> bool:
    """ZSoft PCX: 1-byte 0x0A magic is weak, so four header facts gate
    detection (the DBF convention): known version, RLE flag 0/1, legal
    bit depth, plausible window."""
    if len(data) < 128 or data[0] != 0x0A:
        return False
    if data[1] not in (0, 2, 3, 4, 5) or data[2] not in (0, 1):
        return False
    if data[3] not in (1, 2, 4, 8):
        return False
    x0, y0, x1, y1 = struct.unpack_from("<4H", data, 4)
    return x1 >= x0 and y1 >= y0 and (x1 - x0 + 1) * (y1 - y0 + 1) > 0


def pnm_dimensions(data: bytes) -> tuple[tuple[int, int], int] | None:
    """((width, height), position-after-height) from the netpbm header
    token stream ('#' comments run to end of line; tokens are
    whitespace-separated)."""
    toks: list[int] = []
    pos, n = 2, min(len(data), 4096)
    while pos < n and len(toks) < 2:
        c = data[pos:pos + 1]
        if c == b"#":
            eol = data.find(b"\n", pos)
            pos = n if eol == -1 else eol + 1
        elif c in (b" ", b"\t", b"\r", b"\n"):
            pos += 1
        elif c.isdigit():
            end = pos
            while end < n and data[end:end + 1].isdigit():
                end += 1
            toks.append(int(data[pos:end]))
            pos = end
        else:
            return None
    if len(toks) == 2:
        return (toks[0], toks[1]), pos
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
        if n_colors > 256 or pal_off + n_colors * 4 > len(data):
            # a lying biClrUsed must degrade through the error taxonomy,
            # not escape as numpy ValueError (r5 whole-repo review)
            raise KernelError(
                f"bmp: palette {n_colors} entries overruns file")
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


# ---------------------------------------------------------------- ICO

def decode_ico(data: bytes) -> DecodedImage:
    """Windows icon: pick the largest directory entry and decode it —
    PNG-compressed entries delegate to decode_png; classic DIB entries are
    a BITMAPINFOHEADER with DOUBLED height (XOR bitmap + AND mask) and no
    BM file header, reconstructed into a BMP for decode_bmp (the AND mask
    is dropped — Tika-style static pixel extraction, no alpha)."""
    if not data.startswith(b"\x00\x00\x01\x00") or len(data) < 6:
        raise KernelError("not an ICO")
    (count,) = struct.unpack_from("<H", data, 4)
    if not (0 < count <= 256) or 6 + 16 * count > len(data):
        raise KernelError("implausible ICO directory")
    best = None  # (area, offset, size)
    for e in range(count):
        off = 6 + 16 * e
        w = data[off] or 256
        h = data[off + 1] or 256
        size, img_off = struct.unpack_from("<II", data, off + 8)
        if img_off + size > len(data) or size < 16:
            continue
        if best is None or w * h > best[0]:
            best = (w * h, img_off, size)
    if best is None:
        raise KernelError("ICO has no decodable entries")
    _, img_off, size = best
    payload = data[img_off : img_off + size]
    if payload.startswith(_PNG_SIG):
        return decode_png(payload)
    # classic DIB: BITMAPINFOHEADER with doubled height
    if len(payload) < 40:
        raise KernelError("ICO DIB truncated")
    (hdr_size,) = struct.unpack_from("<I", payload, 0)
    w, h2 = struct.unpack_from("<ii", payload, 4)
    if hdr_size < 40 or w <= 0 or h2 <= 0 or h2 % 2:
        raise KernelError("implausible ICO DIB header")
    fixed = bytearray(payload)
    struct.pack_into("<i", fixed, 8, h2 // 2)  # undo the doubled height
    # pixel offset accounts for the palette, if any
    (bpp,) = struct.unpack_from("<H", payload, 14)
    (n_colors,) = struct.unpack_from("<I", payload, 32)
    pal_entries = n_colors or (256 if bpp == 8 else 0)
    bmp_header = b"BM" + struct.pack("<IHHI", 14 + len(fixed), 0, 0,
                                     14 + hdr_size + 4 * pal_entries)
    return decode_bmp(bmp_header + bytes(fixed))


# ---------------------------------------------------------------- TIFF

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    """TIFF PackBits RLE (TIFF 6.0 §9): n>=0 copies n+1 literals,
    -127<=n<=-1 repeats the next byte 1-n times, -128 is a noop.
    Output capped (bomb guard — a crafted run can't exceed the raster)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < max_out:
        ctl = data[i]
        i += 1
        if ctl < 128:  # literal run
            out += data[i : i + ctl + 1]
            i += ctl + 1
        elif ctl > 128:  # repeat run of length 257-ctl
            if i >= n:
                raise KernelError("TIFF PackBits truncated")
            out += data[i : i + 1] * (257 - ctl)
            i += 1
        # ctl == 128: noop
    return bytes(out[:max_out])


def _tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-flavor LZW (TIFF 6.0 §13): MSB-first variable-width codes,
    Clear=256/EOI=257, EARLY code-width change (width grows one entry
    before the table fills — the TIFF quirk vs GIF). Output capped."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = bits = 0
    i, n = 0, len(data)
    table: dict[int, bytes] = {}
    prev_entry: bytes | None = None
    next_code = 258
    width = 9

    def reset() -> None:
        nonlocal table, prev_entry, next_code, width
        table = {k: bytes([k]) for k in range(256)}
        prev_entry = None
        next_code = 258
        width = 9

    reset()
    while len(out) <= max_out:
        while bits < width:
            if i >= n:
                return bytes(out[:max_out])  # stream ends at strip boundary
            acc = ((acc << 8) | data[i]) & 0xFFFFFF
            i += 1
            bits += 8
        code = (acc >> (bits - width)) & ((1 << width) - 1)
        bits -= width
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev_entry is not None:
            entry = prev_entry + prev_entry[:1]
        else:
            raise KernelError("TIFF LZW code out of range")
        if prev_entry is not None and next_code < 4096:
            table[next_code] = prev_entry + entry[:1]
            next_code += 1
        out += entry
        prev_entry = entry
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
    return bytes(out[:max_out])


def decode_tiff(data: bytes) -> DecodedImage:
    """Baseline TIFF 6.0: first IFD, uncompressed / PackBits / LZW strips
    (LZW with optional horizontal-differencing predictor), 8-bit
    grayscale (photometric 0/1), RGB(A) and palette-color, both byte
    orders. JPEG-in-TIFF and Deflate raise KernelError (degrade to
    status rows). Tag walk is bounds-checked; entry count capped."""
    import numpy as np

    if data.startswith(b"II*\x00"):
        endian = "<"
    elif data.startswith(b"MM\x00*"):
        endian = ">"
    else:
        raise KernelError("not a TIFF")
    n = len(data)
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    if ifd_off + 2 > n:
        raise KernelError("TIFF IFD offset out of bounds")
    (n_entries,) = struct.unpack_from(endian + "H", data, ifd_off)
    if n_entries == 0 or n_entries > 4096:
        raise KernelError("implausible TIFF IFD entry count")
    if ifd_off + 2 + 12 * n_entries > n:
        raise KernelError("TIFF IFD truncated")

    def read_values(tag_type: int, count: int, value_field: bytes) -> list[int]:
        size = _TIFF_TYPE_SIZE.get(tag_type)
        if size is None:
            return []
        total = size * count
        if total <= 4:
            raw = value_field[:total]
        else:
            (off,) = struct.unpack_from(endian + "I", value_field, 0)
            if off + total > n:
                raise KernelError("TIFF tag values out of bounds")
            raw = data[off : off + total]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}.get(tag_type)
        if fmt is None:  # RATIONAL etc.: not needed for decode
            return []
        return list(struct.unpack(endian + fmt * count, raw))

    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + 12 * e
        tag, ttype, count = struct.unpack_from(endian + "HHI", data, off)
        if count > 1_000_000:
            raise KernelError("implausible TIFF tag count")
        tags[tag] = read_values(ttype, count, data[off + 8 : off + 12])

    w = (tags.get(256) or [0])[0]
    h = (tags.get(257) or [0])[0]
    if not w or not h or w * h > _MAX_PIXELS:
        raise KernelError("implausible TIFF dimensions")
    compression = (tags.get(259) or [1])[0]
    # 1=uncompressed, 5=LZW, 8/32946=Deflate, 32773=PackBits
    if compression not in (1, 5, 8, 32946, 32773):
        raise KernelError(f"TIFF compression {compression} not supported")
    predictor = (tags.get(317) or [1])[0]
    if predictor not in (1, 2):
        raise KernelError(f"TIFF predictor {predictor} not supported")
    photometric = (tags.get(262) or [1])[0]
    spp = (tags.get(277) or [1])[0]
    bits = tags.get(258) or [8] * spp
    if any(b != 8 for b in bits):
        raise KernelError("TIFF bit depth != 8 not supported")
    def decompress(chunk: bytes, cap: int) -> bytes:
        if compression == 32773:
            return _packbits_decode(chunk, cap)
        if compression == 5:
            return _tiff_lzw_decode(chunk, cap)
        if compression in (8, 32946):  # zlib Deflate, capped inflate
            d = zlib.decompressobj()
            try:
                return d.decompress(chunk, cap)
            except zlib.error as ex:
                raise KernelError(f"TIFF deflate error: {ex}") from ex
        return chunk

    if 322 in tags:  # tiled layout (TileWidth/TileLength/TileOffsets)
        tw = (tags.get(322) or [0])[0]
        th = (tags.get(323) or [0])[0]
        tile_offsets = tags.get(324) or []
        tile_counts = tags.get(325) or []
        if not (0 < tw <= 1 << 16 and 0 < th <= 1 << 16) or not tile_offsets:
            raise KernelError("TIFF tile geometry missing/implausible")
        tiles_x = -(-w // tw)
        tiles_y = -(-h // th)
        if len(tile_offsets) < tiles_x * tiles_y:
            raise KernelError("TIFF tile table shorter than the tile grid")
        if not tile_counts:
            tile_counts = [tw * th * spp] * len(tile_offsets)
        arr = np.zeros((tiles_y * th, tiles_x * tw, spp), dtype=np.uint8)
        tile_need = tw * th * spp
        for ti in range(tiles_x * tiles_y):
            so, sc = tile_offsets[ti], tile_counts[ti]
            if so + sc > n:
                raise KernelError("TIFF tile out of bounds")
            raw = decompress(data[so : so + sc], tile_need)
            if len(raw) < tile_need:
                raise KernelError("TIFF tile truncated")
            ty, tx = divmod(ti, tiles_x)
            tile = (np.frombuffer(raw[:tile_need], dtype=np.uint8)
                    .reshape(th, tw, spp))
            if predictor == 2:  # horizontal differencing resets per TILE row
                tile = (np.cumsum(tile.astype(np.int64), axis=1)
                        % 256).astype(np.uint8)
            arr[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = tile
        arr = arr[:h, :w]  # crop edge-tile padding
        predictor = 1  # already applied per tile
    else:
        strip_offsets = tags.get(273) or []
        strip_counts = tags.get(279) or []
        if not strip_offsets:
            raise KernelError("TIFF has no strip offsets")
        if not strip_counts:
            strip_counts = [w * h * spp]  # single strip, implied length
        raster = bytearray()
        need = w * h * spp
        for so, sc in zip(strip_offsets, strip_counts):
            if so + sc > n:
                raise KernelError("TIFF strip out of bounds")
            raster += decompress(data[so : so + sc], need - len(raster))
            if len(raster) >= need:
                break
        if len(raster) < need:
            raise KernelError("TIFF raster truncated")
        arr = np.frombuffer(bytes(raster[:need]),
                            dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: cumsum per channel mod 256
        arr = (np.cumsum(arr.astype(np.int64), axis=1) % 256).astype(np.uint8)
    if photometric == 2:  # RGB(A)
        if spp < 3:
            raise KernelError("TIFF RGB with <3 samples")
        rgb = arr[:, :, :3]
    elif photometric == 3:  # palette: ColorMap is 3*2^bits 16-bit values
        cmap = tags.get(320) or []
        if len(cmap) < 768:
            raise KernelError("TIFF palette missing ColorMap")
        pal = (np.array(cmap[:768], dtype=np.uint16)
               .reshape(3, 256).T // 257).astype(np.uint8)
        rgb = pal[arr[:, :, 0]]
    elif photometric in (0, 1):  # grayscale (0 = white-is-zero)
        g = arr[:, :, 0]
        if photometric == 0:
            g = 255 - g
        rgb = np.repeat(g[:, :, None], 3, axis=2)
    else:
        raise KernelError(f"TIFF photometric {photometric} not supported")
    return DecodedImage(width=w, height=h, pixels=np.ascontiguousarray(rgb))


# ---------------------------------------------------------------- JPEG

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

# Zigzag scan order: index k in the entropy stream -> (row*8 + col) offset.
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

_IDCT_M = None  # lazy 8x8 IDCT basis (numpy)


def _idct_basis():
    global _IDCT_M
    if _IDCT_M is None:
        import numpy as np

        u = np.arange(8).reshape(8, 1)
        x = np.arange(8).reshape(1, 8)
        m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
        m[0, :] *= 1.0 / np.sqrt(2.0)
        _IDCT_M = m
    return _IDCT_M


class _HuffTable:
    """Canonical JPEG Huffman table (ITU T.81 Annex C): built from the
    16 BITS counts + HUFFVAL list; decode via (length, code) dict."""

    __slots__ = ("lut", "max_len")

    def __init__(self, bits: bytes, values: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.max_len = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if k >= len(values):
                    raise KernelError("JPEG DHT values truncated")
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
                self.max_len = length
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader: 0xFF00 byte unstuffing, restart-marker
    sync, hard stop at any other marker (truncation raises)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        data, pos = self.data, self.pos
        if pos >= len(data):
            raise KernelError("JPEG entropy data truncated")
        b = data[pos]
        if b == 0xFF:
            if pos + 1 >= len(data):
                raise KernelError("JPEG entropy data truncated")
            nxt = data[pos + 1]
            if nxt == 0x00:
                self.pos = pos + 2
            else:  # a real marker mid-scan: decoder consumed too much
                raise KernelError(
                    f"JPEG marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.pos = pos + 1
        self.acc = ((self.acc << 8) | b) & 0xFFFF  # keep ≤16 live bits
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        lut = table.lut
        for length in range(1, table.max_len + 1):
            code = (code << 1) | self.read_bit()
            val = lut.get((length, code))
            if val is not None:
                return val
        raise KernelError("invalid JPEG Huffman code")

    def sync_restart(self, expected: int) -> None:
        """Byte-align and consume the RSTn marker at a restart boundary."""
        self.acc = 0
        self.nbits = 0
        data, pos = self.data, self.pos
        if pos + 2 > len(data) or data[pos] != 0xFF:
            raise KernelError("JPEG restart marker missing")
        marker = data[pos + 1]
        if marker != 0xD0 + expected:
            raise KernelError(
                f"JPEG restart marker out of order (0x{marker:02X})")
        self.pos = pos + 2


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map the `size`-bit magnitude to a signed coefficient."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _refine_ac_block(reader: _BitReader, blk, actab: _HuffTable,
                     ss: int, se: int, al: int, eobrun: int) -> int:
    """AC successive-approximation refinement for one block (T.81 G.1.2.3,
    the libjpeg decode_mcu_AC_refine algorithm). Mutates `blk` (a length-64
    int list), returns the updated EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(actab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:  # EOBn: run of end-of-band blocks
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # ZRL: skip 16 zero-history positions below
            else:
                if s != 1:
                    raise KernelError("bad JPEG AC refinement size")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                coef = blk[_ZIGZAG[k]]
                if coef != 0:
                    if reader.read_bit() and (coef & p1) == 0:
                        blk[_ZIGZAG[k]] = coef + (p1 if coef >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[_ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # in-EOB-run blocks still carry correction bits
            coef = blk[_ZIGZAG[k]]
            if coef != 0:
                if reader.read_bit() and (coef & p1) == 0:
                    blk[_ZIGZAG[k]] = coef + (p1 if coef >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_jpeg_scan(data: bytes, pos: int, scomps: list, mcus_x: int,
                      mcus_y: int, restart_interval: int,
                      ss: int, se: int, ah: int, al: int) -> int:
    """Decode one entropy-coded scan (baseline full-band or progressive
    spectral/approximation pass) into the components' coefficient stores
    (length-64 int lists per block). Returns the file position after the
    scan's entropy data."""
    reader = _BitReader(data, pos)
    interleaved = len(scomps) > 1
    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        n_units = scomps[0]["nbx"] * scomps[0]["nby"]
    preds = [0] * len(scomps)
    eobrun = 0
    rst = 0
    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            reader.sync_restart(rst)
            rst = (rst + 1) & 7
            preds = [0] * len(scomps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, mcus_x)
            unit = [(ci, (my * c["vs"] + by) * c["bw"] + mx * c["hs"] + bx)
                    for ci, c in enumerate(scomps)
                    for by in range(c["vs"]) for bx in range(c["hs"])]
        else:
            c = scomps[0]
            by, bx = divmod(u, c["nbx"])
            unit = [(0, by * c["bw"] + bx)]
        for ci, row in unit:
            c = scomps[ci]
            blk = c["coef"][row]
            if ss == 0:
                if ah == 0:  # DC first pass (or baseline full scan)
                    s = reader.decode_huff(c["dc"])
                    if s > 11:
                        raise KernelError("JPEG DC size out of range")
                    diff = _extend(reader.receive(s), s) if s else 0
                    preds[ci] += diff
                    blk[0] = preds[ci] << al
                else:  # DC refinement: one bit per block
                    if reader.read_bit():
                        blk[0] |= 1 << al
                if se == 0:
                    continue  # pure DC scan
            if ah == 0:  # AC first pass / baseline AC section
                if eobrun:
                    eobrun -= 1
                    continue
                k = max(ss, 1)
                while k <= se:
                    rs = reader.decode_huff(c["ac"])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    k += r
                    if k > se:
                        raise KernelError("JPEG AC run overflows band")
                    blk[_ZIGZAG[k]] = _extend(reader.receive(s), s) << al
                    k += 1
            else:  # AC refinement
                eobrun = _refine_ac_block(reader, blk, c["ac"], ss, se, al,
                                          eobrun)
    return reader.pos


def decode_jpeg(data: bytes) -> DecodedImage:
    """JPEG decoder — ITU T.81 Annex F (baseline sequential SOF0/SOF1) and
    Annex G (progressive SOF2: spectral selection + successive
    approximation, DC and AC refinement scans, EOB runs).

    Supports 1-component (grayscale) and 3-component YCbCr frames, any
    sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), 8-bit quant
    tables (16-bit accepted), restart intervals, byte unstuffing, tables
    redefined between scans. Arithmetic coding and hierarchical (SOF3+)
    raise KernelError — the pipeline degrades those to status rows.
    Reference behavior: Tika delegates to ImageIO's JPEGImageReader —
    parity is on decoded pixel values, pinned in tests/test_image_kernel.py
    (progressive and baseline encodings of the same coefficients must
    decode identically)."""
    import numpy as np

    if not data.startswith(b"\xff\xd8"):
        raise KernelError("not a JPEG")
    n = len(data)
    i = 2
    qt: dict[int, "object"] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id) -> table
    restart_interval = 0
    frame = None  # (w, h, comps, progressive)
    planes_by_id: dict[int, dict] = {}
    planes: list[dict] = []
    mcus_x = mcus_y = 0
    n_scans = 0
    while i + 2 <= n:
        if data[i] != 0xFF:
            raise KernelError("JPEG marker misalignment")
        if i + 4 > n:
            break
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        (seg_len,) = struct.unpack_from(">H", data, i + 2)
        if seg_len < 2 or i + 2 + seg_len > n:
            raise KernelError("JPEG segment overruns file")
        body = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(body[p : p + 64], dtype=np.uint8)
                    p += 64
                else:
                    tbl = np.frombuffer(body[p : p + 128], dtype=">u2")
                    p += 128
                if len(tbl) != 64:
                    raise KernelError("JPEG DQT truncated")
                dq = np.zeros(64, dtype=np.float64)
                dq[list(_ZIGZAG)] = tbl.astype(np.float64)
                qt[tq] = dq.reshape(8, 8)
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = body[p + 1 : p + 17]
                count = sum(bits)
                vals = body[p + 17 : p + 17 + count]
                if len(vals) != count:
                    raise KernelError("JPEG DHT truncated")
                huff[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + count
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker in _JPEG_SOF:
            if marker not in (0xC0, 0xC1, 0xC2):
                raise KernelError(
                    f"JPEG SOF 0x{marker:02X} (arithmetic/hierarchical) "
                    "not supported")
            if frame is not None:
                # a second SOF would orphan the existing coefficient
                # planes (stale zeros decoding as wrong-but-'ok' pixels)
                raise KernelError("JPEG with multiple SOF frames")
            progressive = marker == 0xC2
            precision = body[0]
            if precision != 8:
                raise KernelError(f"JPEG precision {precision} not supported")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            if not w or not h or w * h > _MAX_PIXELS:
                raise KernelError("implausible JPEG dimensions")
            if nc not in (1, 3):
                raise KernelError(f"JPEG with {nc} components not supported")
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                tq = body[8 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise KernelError(
                        f"JPEG sampling {hs}x{vs} not supported")
                comps.append((cid, hs, vs, tq))
            frame = (w, h, comps, progressive)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            ceil_div = lambda a, b: -(-a // b)
            for cid, hs, vs, tq in comps:
                bw, bh = mcus_x * hs, mcus_y * vs
                pl = {
                    "hs": hs, "vs": vs, "tq": tq, "bw": bw, "bh": bh,
                    # non-interleaved scans cover the component's OWN
                    # sampled grid, which can be narrower than the padded
                    # interleaved grid (T.81 A.2.2)
                    "nbx": ceil_div(ceil_div(w * hs, hmax), 8),
                    "nby": ceil_div(ceil_div(h * vs, vmax), 8),
                    "coef": [[0] * 64 for _ in range(bh * bw)],
                }
                planes_by_id[cid] = pl
                planes.append(pl)
        elif marker == 0xDA:  # SOS: decode the scan in place
            if frame is None:
                raise KernelError("JPEG SOS before SOF")
            progressive = frame[3]
            ns = body[0]
            if ns < 1 or 1 + 2 * ns + 3 > len(body):
                raise KernelError("JPEG SOS header truncated")
            scomps = []
            for c in range(ns):
                cs = body[1 + 2 * c]
                tables = body[2 + 2 * c]
                pl = planes_by_id.get(cs)
                if pl is None:
                    raise KernelError(f"JPEG scan names unknown component {cs}")
                td, ta = tables >> 4, tables & 0x0F
                scomps.append(dict(pl, dc=huff.get((0, td)),
                                   ac=huff.get((1, ta))))
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            if se > 63 or ss > se:
                raise KernelError("JPEG spectral band out of range")
            if ss > 0 and ns != 1:
                raise KernelError("JPEG progressive AC scan must be "
                                  "non-interleaved")
            for c in scomps:
                if c["dc"] is None and (ss == 0 and ah == 0):
                    raise KernelError("JPEG Huffman DC table missing")
                if c["ac"] is None and se > 0:
                    raise KernelError("JPEG Huffman AC table missing")
            i = _decode_jpeg_scan(data, i + 2 + seg_len, scomps, mcus_x,
                                  mcus_y, restart_interval, ss, se, ah, al)
            n_scans += 1
            if n_scans > 256:
                raise KernelError("JPEG scan count exceeds cap")
            # resync to the next marker (skip pad bits / stray RSTs)
            while i + 1 < n and not (data[i] == 0xFF and data[i + 1] != 0x00):
                i += 1
            continue
        i += 2 + seg_len
    if frame is None or n_scans == 0:
        raise KernelError("JPEG missing SOF/SOS")
    w, h, comps, _progressive = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for pl in planes:
        if pl["tq"] not in qt:
            raise KernelError(f"JPEG quant table {pl['tq']} missing")
    # dequant + batched IDCT per component, then assemble planes
    mm = _idct_basis()
    out_planes = []
    for pl in planes:
        coef = (np.array(pl["coef"], dtype=np.float64).reshape(-1, 8, 8)
                * qt[pl["tq"]])
        spatial = np.einsum("ux,nuv,vy->nxy", mm, coef, mm) + 128.0
        np.clip(spatial, 0, 255, out=spatial)
        spatial = np.rint(spatial).astype(np.uint8)
        bh, bw = pl["bh"], pl["bw"]
        plane = (spatial.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        # upsample to full MCU-grid resolution by pixel replication
        ry, rx = vmax // pl["vs"], hmax // pl["hs"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        rgb = np.repeat(out_planes[0][:, :, None], 3, axis=2)
    else:
        y = out_planes[0].astype(np.float64)
        cb = out_planes[1].astype(np.float64) - 128.0
        cr = out_planes[2].astype(np.float64) - 128.0
        rgb = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=2)
        np.clip(rgb, 0, 255, out=rgb)
        rgb = np.rint(rgb).astype(np.uint8)
    return DecodedImage(width=w, height=h, pixels=np.ascontiguousarray(rgb))


# EXIF tags surfaced with Tika's public metadata names
_EXIF_IFD0_TAGS = {
    271: ("tiff:Make", 2), 272: ("tiff:Model", 2),
    274: ("tiff:Orientation", 3), 282: ("tiff:XResolution", 5),
    305: ("tiff:Software", 2), 306: ("tiff:DateTime", 2),
    315: ("tiff:Artist", 2),
}
_EXIF_SUBIFD_TAGS = {
    0x9003: ("exif:DateTimeOriginal", 2),
    0xA002: ("exif:PixelXDimension", 0),  # SHORT or LONG
    0xA003: ("exif:PixelYDimension", 0),
}
_EXIF_POINTER = 0x8769


def _exif_ifd(data: bytes, endian: str, ifd_off: int, wanted: dict,
              out: dict) -> int:
    """Read one EXIF/TIFF IFD, filling `out` with the wanted tags;
    returns the ExifIFD pointer if present (0 otherwise)."""
    n = len(data)
    if ifd_off + 2 > n:
        return 0
    (n_ent,) = struct.unpack_from(endian + "H", data, ifd_off)
    if n_ent > 512 or ifd_off + 2 + 12 * n_ent > n:
        return 0
    sub_ptr = 0
    for e in range(n_ent):
        off = ifd_off + 2 + 12 * e
        tag, ttype, count = struct.unpack_from(endian + "HHI", data, off)
        if tag == _EXIF_POINTER and ttype == 4:
            (sub_ptr,) = struct.unpack_from(endian + "I", data, off + 8)
            continue
        spec = wanted.get(tag)
        if spec is None or count > 4096:
            continue
        name, _want_type = spec
        if ttype == 2:  # ASCII (NUL-terminated)
            total = count
            if total <= 4:
                raw = data[off + 8 : off + 8 + total]
            else:
                (voff,) = struct.unpack_from(endian + "I", data, off + 8)
                if voff + total > n:
                    continue
                raw = data[voff : voff + total]
            val = raw.split(b"\x00", 1)[0].decode("ascii", "replace").strip()
            if val:
                out[name] = val
        elif ttype == 3 and count == 1:  # SHORT
            (v,) = struct.unpack_from(endian + "H", data, off + 8)
            out[name] = str(v)
        elif ttype == 4 and count == 1:  # LONG
            (v,) = struct.unpack_from(endian + "I", data, off + 8)
            out[name] = str(v)
        elif ttype == 5 and count == 1:  # RATIONAL
            (voff,) = struct.unpack_from(endian + "I", data, off + 8)
            if voff + 8 <= n:
                num, den = struct.unpack_from(endian + "II", data, voff)
                if den:
                    out[name] = str(num // den) if num % den == 0 else f"{num}/{den}"
    return sub_ptr


def exif_metadata(data: bytes) -> dict:
    """EXIF tags from a JPEG APP1 'Exif' segment or a TIFF file's own IFDs,
    surfaced under Tika's public metadata names (tiff:Make, tiff:Model,
    tiff:Orientation, exif:DateTimeOriginal, ...). Header-only — bounded
    IFD walks, never raises (returns {} on any malformed structure)."""
    try:
        kind = sniff_image(data)
        tiff = None
        if kind == "image/jpeg":
            i, n = 2, len(data)
            while i + 4 <= n and data[i] == 0xFF:
                marker = data[i + 1]
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                if marker == 0xDA:
                    break
                (seg_len,) = struct.unpack_from(">H", data, i + 2)
                if seg_len < 2 or i + 2 + seg_len > n:
                    break
                if marker == 0xE1 and data[i + 4 : i + 10] == b"Exif\x00\x00":
                    tiff = data[i + 10 : i + 2 + seg_len]
                    break
                i += 2 + seg_len
        elif kind == "image/tiff":
            tiff = data
        if tiff is None or len(tiff) < 8:
            return {}
        if tiff[:2] == b"II":
            endian = "<"
        elif tiff[:2] == b"MM":
            endian = ">"
        else:
            return {}
        (ifd0,) = struct.unpack_from(endian + "I", tiff, 4)
        out: dict = {}
        sub = _exif_ifd(tiff, endian, ifd0, _EXIF_IFD0_TAGS, out)
        if sub:
            _exif_ifd(tiff, endian, sub, _EXIF_SUBIFD_TAGS, out)
        return out
    except (struct.error, IndexError):
        return {}


def _heif_dimensions(data: bytes) -> tuple[str, int, int] | None:
    """Primary-item dims from an AVIF/HEIC meta box (ISO 23008-12:
    pitm -> ipma association -> ipco property index -> ispe). Falls back
    to the largest ispe when associations are absent or malformed.
    Header walk only — no payload decode (AV1/HEVC tiles are codec
    territory, out of scope like the video routes)."""
    from .video import _boxes

    brand = data[8:12]
    mime = ("image/avif" if brand in (b"avif", b"avis") else "image/heic")
    try:
        meta_span = None
        for btype, s, e in _boxes(data, 0, len(data), 0):
            if btype == b"meta":
                meta_span = (s + 4, e)  # FullBox: version/flags skipped
                break
        if meta_span is None:
            return None
        pitm_id = None
        ipco_props: list = []
        assoc: dict[int, list[int]] = {}
        for btype, s, e in _boxes(data, meta_span[0], meta_span[1], 1):
            if btype == b"pitm":
                ver = data[s]
                pitm_id = (struct.unpack_from(">H", data, s + 4)[0]
                           if ver == 0
                           else struct.unpack_from(">I", data, s + 4)[0])
            elif btype == b"iprp":
                for b2, s2, e2 in _boxes(data, s, e, 2):
                    if b2 == b"ipco":
                        ipco_props = list(_boxes(data, s2, e2, 3))
                    elif b2 == b"ipma":
                        # parsed in its own guard and bounded by the BOX
                        # END, not just the declared count — a corrupt
                        # ipma must neither walk into following boxes nor
                        # kill the largest-ispe fallback (r4 review)
                        try:
                            ver = data[s2]
                            flags = int.from_bytes(data[s2 + 1: s2 + 4],
                                                   "big")
                            (cnt,) = struct.unpack_from(">I", data, s2 + 4)
                            pos = s2 + 8
                            found: dict[int, list[int]] = {}
                            for _ in range(min(cnt, 10_000)):
                                id_w = 2 if ver == 0 else 4
                                if pos + id_w + 1 > e2:
                                    raise KernelError("ipma truncated")
                                iid = int.from_bytes(
                                    data[pos: pos + id_w], "big")
                                pos += id_w
                                ac = data[pos]
                                pos += 1
                                idx_w = 2 if flags & 1 else 1
                                if pos + ac * idx_w > e2:
                                    raise KernelError("ipma truncated")
                                idxs = []
                                for _ in range(ac):
                                    v = int.from_bytes(
                                        data[pos: pos + idx_w], "big")
                                    pos += idx_w
                                    idxs.append(
                                        v & (0x7FFF if idx_w == 2
                                             else 0x7F))
                                found[iid] = idxs
                            assoc = found
                        except (struct.error, IndexError, KernelError):
                            assoc = {}

        def ispe_at(idx: int):
            if 1 <= idx <= len(ipco_props):
                bt, s3, e3 = ipco_props[idx - 1]
                if bt == b"ispe" and e3 - s3 >= 12:
                    w, h = struct.unpack_from(">II", data, s3 + 4)
                    if 0 < w and 0 < h and w * h <= _MAX_PIXELS:
                        return mime, w, h
            return None

        if pitm_id is not None:
            for idx in assoc.get(pitm_id, []):
                d = ispe_at(idx)
                if d is not None:
                    return d
        best = None
        for bt, s3, e3 in ipco_props:
            if bt == b"ispe" and e3 - s3 >= 12:
                w, h = struct.unpack_from(">II", data, s3 + 4)
                if 0 < w and 0 < h and w * h <= _MAX_PIXELS and (
                        best is None or w * h > best[1] * best[2]):
                    best = (mime, w, h)
        return best
    except (struct.error, IndexError, KernelError):
        return None


def image_dimensions(data: bytes) -> tuple[str, int, int] | None:
    """(mime, width, height) from HEADERS ONLY — no pixel decode, so the
    extraction dispatcher can emit image metadata at negligible cost
    (Tika ImageParser behavior: dimensions into metadata, empty body).
    Returns None when the payload isn't a recognizable image OR the
    header dims are implausible (magic bytes followed by junk must stay
    'unsupported', never emit garbage dimensions as ok)."""
    def ok(kind: str, w: int, h: int):
        if 0 < w and 0 < h and w * h <= _MAX_PIXELS:
            return (kind, w, h)
        return None

    kind = sniff_image(data)
    if kind is None and len(data) >= 16 and data[4:8] == b"ftyp" \
            and data[8:12] in (b"avif", b"avis", b"heic", b"heix", b"mif1"):
        return _heif_dimensions(data)
    if kind == "image/png" and len(data) >= 24:
        if data[12:16] != b"IHDR":
            return None
        w, h = struct.unpack_from(">II", data, 16)
        return ok(kind, w, h)
    if kind == "image/vnd.adobe.photoshop":
        # Adobe PSD header (public spec): '8BPS', u16 version (1=PSD,
        # 2=PSB), 6 reserved, u16 channels, u32 height, u32 width BE
        version = struct.unpack_from(">H", data, 4)[0]
        if version not in (1, 2):
            return None
        channels, h, w, depth, mode = struct.unpack_from(">HIIHH", data, 12)
        if not (1 <= channels <= 56 and depth in (1, 8, 16, 32)
                and mode <= 15):
            return None
        return ok(kind, w, h)
    if kind == "image/bmp" and len(data) >= 26:
        w, h = struct.unpack_from("<ii", data, 18)
        return ok(kind, w, abs(h)) if h != 0 else None
    if kind == "image/gif" and len(data) >= 10:
        w, h = struct.unpack_from("<HH", data, 6)
        return ok(kind, w, h)
    if kind == "image/jpeg":
        dims = jpeg_dimensions(data)
        return ok(kind, dims[0], dims[1]) if dims else None
    if kind == "image/tiff":
        try:  # tag walk only (strips never touched)
            endian = "<" if data[:2] == b"II" else ">"
            (ifd,) = struct.unpack_from(endian + "I", data, 4)
            (n_ent,) = struct.unpack_from(endian + "H", data, ifd)
            if n_ent > 4096 or ifd + 2 + 12 * n_ent > len(data):
                return None
            w = h = 0
            for e in range(n_ent):
                off = ifd + 2 + 12 * e
                tag, ttype = struct.unpack_from(endian + "HH", data, off)
                if tag in (256, 257):
                    fmt = endian + ("H" if ttype == 3 else "I")
                    (v,) = struct.unpack_from(fmt, data, off + 8)
                    if tag == 256:
                        w = v
                    else:
                        h = v
            return ok(kind, w, h)
        except struct.error:
            return None
    if kind == "image/webp" and len(data) >= 25:
        # WebP container (public spec): first chunk at offset 12
        fourcc = data[12:16]
        if fourcc == b"VP8 " and len(data) >= 30:
            # lossy: 3-byte frame tag, sync 9D 01 2A, 14-bit dims
            if data[23:26] != b"\x9d\x01\x2a":
                return None
            w = struct.unpack_from("<H", data, 26)[0] & 0x3FFF
            h = struct.unpack_from("<H", data, 28)[0] & 0x3FFF
            return ok(kind, w, h)
        if fourcc == b"VP8L" and len(data) >= 25:
            # lossless: 0x2F signature, then 14+14 bits of (dim - 1)
            if data[20] != 0x2F:
                return None
            bits = struct.unpack_from("<I", data, 21)[0]
            return ok(kind, (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
        if fourcc == b"VP8X" and len(data) >= 30:
            # extended: canvas (dim - 1) as 24-bit LE at offsets 24 / 27
            w = int.from_bytes(data[24:27], "little") + 1
            h = int.from_bytes(data[27:30], "little") + 1
            return ok(kind, w, h)
        return None
    if kind == "image/vnd.microsoft.icon" and len(data) >= 22:
        (count,) = struct.unpack_from("<H", data, 4)
        best = (0, 0)
        for e in range(min(count, 256)):
            off = 6 + 16 * e
            if off + 16 > len(data):
                break
            w = data[off] or 256
            h = data[off + 1] or 256
            if w * h > best[0] * best[1]:
                best = (w, h)
        return ok(kind, best[0], best[1]) if best[0] else None
    if kind in ("image/x-portable-bitmap", "image/x-portable-graymap",
                "image/x-portable-pixmap"):
        parsed = _pnm_parse(data)
        return ok(kind, parsed[1], parsed[2]) if parsed else None
    if kind == "image/vnd.zbrush.pcx":
        x0, y0, x1, y1 = struct.unpack_from("<4H", data, 4)
        return ok(kind, x1 - x0 + 1, y1 - y0 + 1)
    if kind == "image/x-tga":
        dims = tga_dimensions(data)
        return ok(kind, dims[0], dims[1]) if dims else None
    return None


def decode_any(data: bytes, max_ratio: float = 200.0) -> DecodedImage:
    kind = sniff_image(data)
    if kind == "image/png":
        return decode_png(data, max_ratio)
    if kind == "image/bmp":
        return decode_bmp(data)
    if kind == "image/gif":
        return decode_gif(data)
    if kind == "image/jpeg":
        return decode_jpeg(data)
    if kind == "image/tiff":
        return decode_tiff(data)
    if kind == "image/vnd.microsoft.icon":
        return decode_ico(data)
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
