"""Unit tests for the pure-Python image kernel (kernels/image.py).

Round-trip strategy: build a seeded random RGB image, forward-apply each
PNG filter in the test (the encoder side the kernel doesn't ship), zlib
compress, and assert the kernel's unfilter recovers the exact pixels.
BMP variants and the bomb guards are exercised directly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.image import (
    decode_any,
    decode_bmp,
    decode_png,
    image_features,
    sniff_image,
)

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (len(body).to_bytes(4, "big") + ctype + body
            + zlib.crc32(ctype + body).to_bytes(4, "big"))


def _forward_filter(arr: np.ndarray, filter_type: int) -> bytes:
    """Encoder-side PNG filtering (RFC 2083 §6) for test payloads."""
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int32), row[:-ch]])
        upleft = np.concatenate([np.zeros(ch, dtype=np.int32), prev[:-ch]])
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            enc = row - left
        elif filter_type == 2:
            enc = row - prev
        elif filter_type == 3:
            enc = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = row - pred
        out.append(filter_type)
        out.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = row
    return bytes(out)


def _png(arr: np.ndarray, color_type: int, filter_type: int,
         palette: bytes = b"") -> bytes:
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = _forward_filter(arr, filter_type)
    body = _SIG + _chunk(b"IHDR", ihdr)
    if palette:
        body += _chunk(b"PLTE", palette)
    return body + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _rand(h, w, ch, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, ch), dtype=np.int64).astype(np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_rgb_all_filters_roundtrip(filter_type):
    arr = _rand(13, 17, 3, seed=filter_type)
    img = decode_png(_png(arr, 2, filter_type))
    assert (img.width, img.height) == (17, 13)
    assert np.array_equal(img.pixels, arr)


def test_png_rgba_drops_alpha():
    arr = _rand(9, 11, 4, seed=7)
    img = decode_png(_png(arr, 6, 4))
    assert np.array_equal(img.pixels, arr[:, :, :3])


def test_png_grayscale_replicates_channels():
    arr = _rand(8, 8, 1, seed=3)
    img = decode_png(_png(arr, 0, 1))
    assert np.array_equal(img.pixels, np.repeat(arr, 3, axis=2))


def test_png_gray_alpha():
    arr = _rand(6, 10, 2, seed=5)
    img = decode_png(_png(arr, 4, 2))
    assert np.array_equal(img.pixels, np.repeat(arr[:, :, :1], 3, axis=2))


def test_png_palette_lookup():
    pal = np.arange(256 * 3, dtype=np.int64).astype(np.uint8).reshape(256, 3)
    idx = _rand(7, 7, 1, seed=9)
    img = decode_png(_png(idx, 3, 0, palette=pal.tobytes()))
    assert np.array_equal(img.pixels, pal[idx[:, :, 0]])


def test_png_guards():
    arr = _rand(4, 4, 3)
    good = _png(arr, 2, 0)
    with pytest.raises(KernelError):
        decode_png(good[:40])  # truncated mid-chunk
    # oversized dimensions caught before any allocation
    huge = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 2, 0, 0, 0)
    bomb = _SIG + _chunk(b"IHDR", huge)
    with pytest.raises(KernelError):
        decode_png(bomb)
    # corrupt IDAT stream
    blob = _SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
    blob += _chunk(b"IDAT", b"not-zlib-data") + _chunk(b"IEND", b"")
    with pytest.raises(KernelError):
        decode_png(blob)
    with pytest.raises(KernelError):
        decode_png(_png(arr, 2, 0)[:8] + _chunk(b"IEND", b""))  # no IHDR/IDAT


def _bmp(arr: np.ndarray, top_down: bool = False, bpp: int = 24,
         palette: np.ndarray | None = None) -> bytes:
    h, w = arr.shape[:2]
    if bpp == 8:
        rows_px = arr[:, :, 0]
        stride = (w + 3) & ~3
    else:
        nch = bpp // 8
        bgr = np.zeros((h, w, nch), dtype=np.uint8)
        bgr[:, :, :3] = arr[:, :, ::-1]
        rows_px = bgr.reshape(h, w * nch)
        stride = (w * nch + 3) & ~3
    body = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = rows_px[y].tobytes()
        body += row.ljust(stride, b"\x00")
    pal_bytes = b""
    if palette is not None:
        pal_bgra = np.zeros((len(palette), 4), dtype=np.uint8)
        pal_bgra[:, :3] = palette[:, ::-1]
        pal_bytes = pal_bgra.tobytes()
    pix_off = 54 + len(pal_bytes)
    header = b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp,
                       0, len(body), 2835, 2835,
                       len(palette) if palette is not None else 0, 0)
    return header + info + pal_bytes + bytes(body)


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_24bpp_orientation(top_down):
    arr = _rand(5, 6, 3, seed=11)
    img = decode_bmp(_bmp(arr, top_down=top_down))
    assert (img.width, img.height) == (6, 5)
    assert np.array_equal(img.pixels, arr)


def test_bmp_32bpp():
    arr = _rand(4, 5, 3, seed=13)
    img = decode_bmp(_bmp(arr, bpp=32))
    assert np.array_equal(img.pixels, arr)


def test_bmp_8bpp_palette():
    pal = _rand(256, 3, 1, seed=15).reshape(256, 3)
    idx = _rand(6, 9, 1, seed=17)
    img = decode_bmp(_bmp(idx, bpp=8, palette=pal))
    assert np.array_equal(img.pixels, pal[idx[:, :, 0]])


def test_bmp_guards():
    arr = _rand(4, 4, 3)
    good = _bmp(arr)
    with pytest.raises(KernelError):
        decode_bmp(good[:-8])  # truncated pixels
    rle = bytearray(good)
    rle[30] = 1  # compression=BI_RLE8
    with pytest.raises(KernelError):
        decode_bmp(bytes(rle))


def test_sniff_and_decode_any():
    arr = _rand(4, 4, 3)
    assert sniff_image(_png(arr, 2, 0)) == "image/png"
    assert sniff_image(_bmp(arr)) == "image/bmp"
    assert sniff_image(b"\xff\xd8\xff\xe0" + b"x" * 64) == "image/jpeg"
    assert sniff_image(b"plain text") is None
    with pytest.raises(KernelError):
        decode_any(b"\xff\xd8\xff\xe0" + b"x" * 64)  # junk JPEG body
    with pytest.raises(KernelError):
        decode_any(b"not an image at all")


def test_image_features_deterministic():
    arr = np.zeros((10, 20, 3), dtype=np.uint8)
    arr[:, :, 0] = 255  # pure red
    img = decode_png(_png(arr, 2, 0))
    feats = image_features(img)
    assert len(feats) == 8
    assert feats[0] == 1.0 and feats[1] == 0.0 and feats[2] == 0.0
    assert feats[3] == feats[4] == feats[5] == 0.0  # solid color -> zero std
    assert feats[6] == pytest.approx(0.299, abs=1e-6)  # luma of pure red
    assert feats[7] == 2.0  # aspect 20/10


def _jpeg_bytes(w: int, h: int) -> bytes:
    """Minimal marker skeleton: SOI, APP0, SOF0 with dims, SOS, EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_jpeg_dimensions_from_sof():
    from sparktika.kernels.image import jpeg_dimensions

    assert jpeg_dimensions(_jpeg_bytes(640, 480)) == (640, 480)
    assert jpeg_dimensions(_jpeg_bytes(1, 65535)) == (1, 65535)
    assert jpeg_dimensions(b"\xff\xd8\xff\xe0junk") is None
    assert jpeg_dimensions(b"not a jpeg") is None
    trunc = _jpeg_bytes(640, 480)[:10]
    assert jpeg_dimensions(trunc) is None


# ------------------------------------------------------------------- TIFF

def test_tiff_roundtrip_all_variants():
    """Uncompressed TIFF: II single-strip RGB, MM multi-strip RGB, and
    II palette decode to exact solid fills."""
    from sparktika.kernels.image import decode_tiff, sniff_image
    from sparktika.synth import build_tiff, media_dims, _media_color

    for mid in (0, 1, 2, 7, 100, 255):
        data = build_tiff(mid)
        assert sniff_image(data) == "image/tiff"
        img = decode_tiff(data)
        w, h = media_dims(mid)
        r, g, b = _media_color(mid)
        assert (img.width, img.height) == (w, h)
        assert ((img.pixels[:, :, 0] == r).all()
                and (img.pixels[:, :, 1] == g).all()
                and (img.pixels[:, :, 2] == b).all()), mid


def test_tiff_packbits_strip():
    """PackBits (TIFF 6.0 §9) strips decode to the same pixels as the
    uncompressed twin; noop/repeat/literal/truncation edges covered."""
    import struct as _s
    from sparktika.kernels.image import decode_tiff, _packbits_decode
    from sparktika.synth import build_tiff, media_dims, _media_color

    w, h = media_dims(0)
    r, g, b = _media_color(0)
    # solid RGB raster compresses to repeat runs (128-byte max each)
    raster = bytes([r, g, b]) * (w * h)
    comp = bytearray()
    i = 0
    while i < len(raster):
        run = 1
        while i + run < len(raster) and raster[i + run] == raster[i] and run < 128:
            run += 1
        if run >= 2:
            comp += bytes([257 - run, raster[i]])
        else:
            comp += bytes([0, raster[i]])
        i += run
    e = "<"
    pos = 8 + len(comp)
    entries = []
    extra = bytearray()

    def ent(tag, t, vals, fmt):
        nonlocal extra
        size = (2 if fmt == "H" else 4) * len(vals)
        if size <= 4:
            field = _s.pack(e + fmt * len(vals), *vals).ljust(4, b"\0")
        else:
            off = pos + len(extra)
            extra += _s.pack(e + fmt * len(vals), *vals)
            field = _s.pack(e + "I", off)
        entries.append((tag, t, len(vals), field))

    ent(256, 3, [w], "H"); ent(257, 3, [h], "H"); ent(258, 3, [8, 8, 8], "H")
    ent(259, 3, [32773], "H"); ent(262, 3, [2], "H")
    ent(273, 4, [8], "I"); ent(277, 3, [3], "H")
    ent(278, 3, [h], "H"); ent(279, 4, [len(comp)], "I")
    entries.sort()
    ifd_off = pos + len(extra)
    ifd = _s.pack(e + "H", len(entries))
    for tag, t, c, f in entries:
        ifd += _s.pack(e + "HHI", tag, t, c) + f
    ifd += _s.pack(e + "I", 0)
    data = b"II*\x00" + _s.pack(e + "I", ifd_off) + bytes(comp) + bytes(extra) + ifd
    img = decode_tiff(data)
    ref = decode_tiff(build_tiff(0))
    assert (img.pixels == ref.pixels).all()
    assert _packbits_decode(b"\x80\x02abc", 10) == b"abc"   # noop + literal
    assert _packbits_decode(b"\xfeX", 10) == b"XXX"          # repeat 3
    with pytest.raises(KernelError):
        _packbits_decode(b"\xfe", 10)                        # truncated


def _lzw_literal_encode(data: bytes) -> bytes:
    """Literal-only TIFF-LZW encoder (valid stream; exercises MSB-first
    bit packing, early code-width change, and mid-stream re-clears)."""
    out = bytearray()
    acc = bits = 0
    width, next_code = 9, 258

    def put(code):
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8

    put(256)  # CLEAR
    prev = None
    for byte in data:
        put(byte)
        if prev is not None:
            next_code += 1
        prev = byte
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            put(256)
            width, next_code, prev = 9, 258, None
    put(257)  # EOI
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def test_tiff_lzw_and_predictor():
    """TIFF-flavor LZW (MSB-first, EARLY width change, 256/257 control
    codes) + horizontal-differencing predictor reconstruct exactly; long
    streams cross the 9->10->11->12-bit boundaries and a re-clear."""
    import struct as _s
    from sparktika.kernels.image import _tiff_lzw_decode, decode_tiff

    rng = np.random.RandomState(3)
    for size in (10, 300, 9000):
        raw = bytes(rng.randint(0, 256, size, dtype=np.uint8))
        assert _tiff_lzw_decode(_lzw_literal_encode(raw), size) == raw
    w, h = 20, 12
    base = (np.arange(w * h * 3, dtype=np.int64).reshape(h, w, 3) * 7) % 256
    diff = base.copy()
    diff[:, 1:, :] = (base[:, 1:, :] - base[:, :-1, :]) % 256
    comp = _lzw_literal_encode(diff.astype(np.uint8).tobytes())
    e = "<"
    pos = 8 + len(comp)
    entries, extra = [], bytearray()

    def ent(tag, t, vals, fmt):
        nonlocal extra
        size = (2 if fmt == "H" else 4) * len(vals)
        if size <= 4:
            field = _s.pack(e + fmt * len(vals), *vals).ljust(4, b"\0")
        else:
            off = pos + len(extra)
            extra += _s.pack(e + fmt * len(vals), *vals)
            field = _s.pack(e + "I", off)
        entries.append((tag, t, len(vals), field))

    ent(256, 3, [w], "H"); ent(257, 3, [h], "H"); ent(258, 3, [8, 8, 8], "H")
    ent(259, 3, [5], "H"); ent(262, 3, [2], "H"); ent(273, 4, [8], "I")
    ent(277, 3, [3], "H"); ent(278, 3, [h], "H"); ent(279, 4, [len(comp)], "I")
    ent(317, 3, [2], "H")
    entries.sort()
    ifd_off = pos + len(extra)
    ifd = _s.pack(e + "H", len(entries))
    for tag, t, c, f in entries:
        ifd += _s.pack(e + "HHI", tag, t, c) + f
    ifd += _s.pack(e + "I", 0)
    tiff = b"II*\x00" + _s.pack(e + "I", ifd_off) + comp + bytes(extra) + ifd
    assert (decode_tiff(tiff).pixels == base.astype(np.uint8)).all()
    # garbage LZW codes fail closed
    with pytest.raises(KernelError):
        _tiff_lzw_decode(b"\x7f\xff\xff\xff", 100)


def test_tiff_rejects_compressed_and_truncated():
    import struct as _s
    from sparktika.kernels.image import decode_tiff
    from sparktika.synth import build_tiff

    good = bytearray(build_tiff(3))
    # flip the Compression tag (259) value to 5 (LZW): honest reject
    ole = bytes(good)
    idx = ole.rindex(_s.pack("<HHI", 259, 3, 1))
    bad = bytearray(ole)
    bad[idx + 8] = 5
    with pytest.raises(KernelError):
        decode_tiff(bytes(bad))
    with pytest.raises(KernelError):
        decode_tiff(ole[:40])  # truncated strips/IFD
    with pytest.raises(KernelError):
        decode_tiff(b"II*\x00" + b"\xff" * 16)  # IFD out of bounds


# ------------------------------------------------------- JPEG (full decode)

def test_jpeg_solid_roundtrip_all_variants():
    """DC-only solid JPEGs against an all-ones quant table decode
    PIXEL-EXACTLY across grayscale / 4:4:4 / 4:2:0 and non-multiple-of-8
    dimensions (MCU padding + crop)."""
    from sparktika.kernels.image import decode_jpeg
    from sparktika.synth import build_jpeg, media_dims

    for mid in (0, 1, 2, 7, 13, 100, 255, 256, 511):
        img = decode_jpeg(build_jpeg(mid))
        w, h = media_dims(mid)
        g = mid * 37 % 256
        assert (img.width, img.height) == (w, h)
        assert (img.pixels == g).all(), mid


def test_jpeg_dc_prediction_chain():
    """Blockwise-varying DC exercises the per-component DC predictor."""
    from sparktika.kernels.image import decode_jpeg
    from sparktika.synth import encode_jpeg

    w, h, bw, bh = 40, 24, 5, 3
    vals = [(i * 17 + 3) % 256 for i in range(bw * bh)]
    blocks = []
    for v in vals:
        b = [0] * 64
        b[0] = 8 * (v - 128)
        blocks.append(b)
    img = decode_jpeg(encode_jpeg(w, h, [(1, 1, 1, blocks)]))
    arr = img.pixels[:, :, 0]
    for by in range(bh):
        for bx in range(bw):
            assert (arr[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                    == vals[by * bw + bx]).all()


def test_jpeg_ac_coefficients_match_reference_idct():
    """AC run-length decode (incl. high zero-runs) verified against an
    independent naive IDCT implementation."""
    from sparktika.kernels.image import decode_jpeg
    from sparktika.synth import encode_jpeg

    blk = [0] * 64
    blk[0] = 200
    blk[1] = 40
    blk[8] = -30
    blk[9] = 12
    blk[17] = -5
    blk[35] = 7
    blk[63] = -2  # long zigzag run before the final coefficient
    img = decode_jpeg(encode_jpeg(8, 8, [(1, 1, 1, [blk])]))
    C = np.array([[(1 / np.sqrt(2) if u == 0 else 1) / 2
                   * np.cos((2 * x + 1) * u * np.pi / 16)
                   for x in range(8)] for u in range(8)])
    ref = np.clip(np.rint(C.T @ np.array(blk, float).reshape(8, 8) @ C + 128),
                  0, 255).astype(np.uint8)
    assert (img.pixels == np.repeat(ref[:, :, None], 3, axis=2)).all()


def test_jpeg_restart_markers():
    """DRI + RSTn markers: byte-align, consume marker, reset DC predictors."""
    from sparktika.kernels.image import decode_jpeg
    from sparktika.synth import encode_jpeg

    w, h, bw, bh = 48, 16, 6, 2
    vals = [(i * 31 + 9) % 256 for i in range(bw * bh)]
    blocks = []
    for v in vals:
        b = [0] * 64
        b[0] = 8 * (v - 128)
        blocks.append(b)
    img = decode_jpeg(encode_jpeg(w, h, [(1, 1, 1, blocks)],
                                  restart_interval=2))
    arr = img.pixels[:, :, 0]
    for by in range(bh):
        for bx in range(bw):
            assert (arr[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                    == vals[by * bw + bx]).all()


def _rand_blocks(rng, nb, density=0.3, amp=60):
    out = []
    for _ in range(nb):
        b = [0] * 64
        b[0] = int(rng.randint(-900, 900))
        for k in range(1, 64):
            if rng.rand() < density:
                v = int(rng.randint(-amp, amp))
                if v:
                    b[k] = v
        out.append(b)
    return out


def test_jpeg_progressive_equals_baseline():
    """THE progressive correctness gate: progressive (SOF2, 6-scan
    spectral-selection + successive-approximation script) and baseline
    encodings of IDENTICAL quantized coefficients must decode to
    identical pixels — covers DC/AC first passes, DC/AC refinement,
    EOB runs, ZRL folding, gray + 4:4:4 + 4:2:0."""
    from sparktika.kernels.image import decode_jpeg
    from sparktika.synth import encode_jpeg, encode_jpeg_progressive

    rng = np.random.RandomState(17)
    for (w, h) in ((8, 8), (40, 24), (17, 9)):
        for density in (0.05, 0.4, 0.9):
            bw, bh = -(-w // 8), -(-h // 8)
            blocks = _rand_blocks(rng, bw * bh, density)
            base = decode_jpeg(encode_jpeg(w, h, [(1, 1, 1, blocks)]))
            prog = decode_jpeg(encode_jpeg_progressive(
                w, h, [(1, 1, 1, [list(b) for b in blocks])]))
            assert (base.pixels == prog.pixels).all(), (w, h, density)
    for (w, h, (hs, vs)) in ((32, 32, (2, 2)), (24, 24, (1, 1)),
                             (33, 17, (2, 1))):
        mcx, mcy = -(-w // (8 * hs)), -(-h // (8 * vs))
        comps = [(1, hs, vs, _rand_blocks(rng, mcx * hs * mcy * vs)),
                 (2, 1, 1, _rand_blocks(rng, mcx * mcy, 0.15, 30)),
                 (3, 1, 1, _rand_blocks(rng, mcx * mcy, 0.15, 30))]
        comps2 = [(cid, a, b, [list(x) for x in bl]) for cid, a, b, bl in comps]
        base = decode_jpeg(encode_jpeg(w, h, comps))
        prog = decode_jpeg(encode_jpeg_progressive(w, h, comps2))
        assert (base.pixels == prog.pixels).all(), (w, h, hs, vs)


def test_jpeg_progressive_solid_variants():
    from sparktika.kernels.image import decode_jpeg
    from sparktika.synth import build_jpeg_progressive, media_dims

    for mid in (0, 1, 2, 7, 100, 255):
        img = decode_jpeg(build_jpeg_progressive(mid))
        w, h = media_dims(mid)
        assert (img.width, img.height) == (w, h)
        assert (img.pixels == mid * 37 % 256).all(), mid


def test_jpeg_rejects_arithmetic_and_truncation():
    from sparktika.kernels.image import decode_jpeg
    from sparktika.synth import build_jpeg

    good = build_jpeg(4)
    # flip SOF0 -> SOF2: a single full-band scan is legal under
    # progressive rules and must decode to the same pixels
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert (decode_jpeg(prog).pixels == decode_jpeg(good).pixels).all()
    # arithmetic coding (SOF9): honest unsupported error
    with pytest.raises(KernelError):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc9", 1))
    # truncated entropy data: error, never a hang
    with pytest.raises(KernelError):
        decode_jpeg(good[: len(good) - (len(good) - good.index(b"\xff\xda")) // 2])
    with pytest.raises(KernelError):
        decode_jpeg(b"\xff\xd8\xff\xe0" + b"x" * 64)


# ------------------------------------------------------------------- GIF

def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Test-side GIF LZW encoder (mirrors the decoder's width rule: the
    encoder runs one dict-add ahead, so it bumps width one entry later)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out_bits = []

    def emit(code, width):
        out_bits.append((code, width))

    width = min_code_size + 1
    dict_ = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    w = b""
    for ch in indices:
        wc = w + bytes([ch])
        if wc in dict_:
            w = wc
            continue
        emit(dict_[w], width)
        if next_code < 4096:
            dict_[wc] = next_code
            next_code += 1
            # decoder adds its entry one code later, so grow width when
            # next_code passes 2^width + 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        w = wc[-1:]
    if w:
        emit(dict_[w], width)
    emit(end, width)
    acc = bits = 0
    data = bytearray()
    for code, cw in out_bits:
        acc |= code << bits
        bits += cw
        while bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        data.append(acc & 0xFF)
    return bytes(data)


def _gif(idx: np.ndarray, pal: np.ndarray, interlace: bool = False,
         min_code_size: int = 8) -> bytes:
    h, w = idx.shape
    flags = 0x80 | 0x07  # global palette, 256 entries
    head = (b"GIF89a" + struct.pack("<HHBBB", w, h, flags, 0, 0)
            + pal.astype(np.uint8).tobytes().ljust(768, b"\x00"))
    rows = idx
    if interlace:
        order = ([y for y in range(0, h, 8)] + [y for y in range(4, h, 8)]
                 + [y for y in range(2, h, 4)] + [y for y in range(1, h, 2)])
        rows = idx[order]
    lzw = _lzw_encode(rows.astype(np.uint8).tobytes(), min_code_size)
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    blocks = bytearray()
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return head + desc + bytes([min_code_size]) + bytes(blocks) + b"\x3b"


def test_gif_lzw_roundtrip():
    from sparktika.kernels.image import decode_gif

    pal = np.arange(768, dtype=np.int64).astype(np.uint8).reshape(256, 3)
    idx = _rand(23, 31, 1, seed=21)[:, :, 0]
    img = decode_gif(_gif(idx, pal))
    assert (img.width, img.height) == (31, 23)
    assert np.array_equal(img.pixels, pal[idx])


def test_gif_interlaced():
    from sparktika.kernels.image import decode_gif

    pal = np.arange(768, dtype=np.int64).astype(np.uint8).reshape(256, 3)
    idx = _rand(16, 8, 1, seed=23)[:, :, 0]
    img = decode_gif(_gif(idx, pal, interlace=True))
    assert np.array_equal(img.pixels, pal[idx])


def test_gif_extension_blocks_skipped_and_guards():
    from sparktika.kernels.image import decode_gif, decode_any, sniff_image

    pal = np.zeros((256, 3), dtype=np.uint8)
    idx = np.full((4, 4), 7, dtype=np.uint8)
    raw = _gif(idx, pal)
    # splice a graphic-control extension before the image descriptor
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    at = raw.index(b"\x2c")
    with_ext = raw[:at] + gce + raw[at:]
    img = decode_gif(with_ext)
    assert (img.width, img.height) == (4, 4)
    assert sniff_image(raw) == "image/gif"
    assert decode_any(raw).width == 4
    with pytest.raises(KernelError):
        decode_gif(raw[:20])  # no frame
    with pytest.raises(KernelError):
        decode_gif(b"GIF89a" + b"\x00" * 4)  # truncated header
    trunc = raw[:at + 11]  # descriptor but no pixel data
    with pytest.raises(KernelError):
        decode_gif(trunc)


def test_resize_nearest_neighbor():
    from sparktika.kernels.image import resize_image, DecodedImage

    arr = _rand(10, 20, 3, seed=31)
    img = DecodedImage(width=20, height=10, pixels=arr)
    small = resize_image(img, 5, 5)
    assert small.pixels.shape == (5, 5, 3)
    # index mapping: out[y][x] = in[y*10//5][x*20//5]
    assert np.array_equal(
        small.pixels, arr[(np.arange(5) * 10) // 5][:, (np.arange(5) * 20) // 5])
    up = resize_image(img, 40, 40)
    assert up.pixels.shape == (40, 40, 3)
    with pytest.raises(KernelError):
        resize_image(img, 0, 5)
    with pytest.raises(KernelError):
        resize_image(img, 1 << 20, 1 << 20)


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_interlaced(arr: np.ndarray, filter_type: int = 0) -> bytes:
    h, w, ch = arr.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = arr[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        raw += _forward_filter(sub, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b""))


@pytest.mark.parametrize("size", [(16, 16), (13, 17), (3, 3), (1, 9), (9, 1)])
def test_png_adam7_interlaced_roundtrip(size):
    h, w = size
    arr = _rand(h, w, 3, seed=h * 100 + w)
    img = decode_png(_png_interlaced(arr))
    assert (img.width, img.height) == (w, h)
    assert np.array_equal(img.pixels, arr)


def test_png_adam7_with_filters():
    arr = _rand(21, 19, 3, seed=41)
    img = decode_png(_png_interlaced(arr, filter_type=4))  # Paeth per pass
    assert np.array_equal(img.pixels, arr)


# -------------------------------------------------------------------- ICO

def _ico_with(entries):
    """entries: list of (w, h, payload_bytes)"""
    head = b"\x00\x00\x01\x00" + struct.pack("<H", len(entries))
    dirs = b""
    off = 6 + 16 * len(entries)
    bodies = b""
    for w, h, body in entries:
        dirs += (bytes([w % 256, h % 256, 0, 0])
                 + struct.pack("<HHII", 1, 32, len(body), off))
        off += len(body)
        bodies += body
    return head + dirs + bodies


def test_ico_png_and_dib_entries():
    """ICO: PNG entries delegate to the PNG decoder; classic DIB entries
    (doubled height + AND mask) reconstruct through the BMP path; the
    largest directory entry wins."""
    from sparktika.kernels.image import decode_any, sniff_image
    from sparktika.synth import build_png, media_dims, _media_color

    png = build_png(4)
    w, h = media_dims(4)
    r, g, b = _media_color(4)
    ico = _ico_with([(w, h, png)])
    assert sniff_image(ico) == "image/vnd.microsoft.icon"
    img = decode_any(ico)
    assert (img.width, img.height) == (w, h)
    assert (img.pixels[:, :, 0] == r).all()
    W, H = 16, 8
    info = struct.pack("<IiiHHIIiiII", 40, W, H * 2, 1, 24, 0, 0, 0, 0, 0, 0)
    stride = (W * 3 + 3) & ~3
    xor = (bytes([10, 20, 30]) * W).ljust(stride, b"\0") * H
    mask = b"\x00" * (((W + 31) // 32) * 4 * H)
    img2 = decode_any(_ico_with([(W, H, info + xor + mask)]))
    assert (img2.width, img2.height) == (W, H)
    assert (img2.pixels[:, :, 0] == 30).all() and (img2.pixels[:, :, 2] == 10).all()
    # largest entry wins
    img3 = decode_any(_ico_with([(8, 8, build_png(7)), (w, h, png)]))
    assert (img3.width, img3.height) == (w, h)
    # empty / truncated directories fail closed
    with pytest.raises(KernelError):
        decode_any(b"\x00\x00\x01\x00\x01\x00" + b"\x01" * 8)


def test_jpeg_rejects_multiple_sof_frames():
    """Regression (code-review): a second SOF must raise (stale zero
    coefficient planes would otherwise decode as wrong-but-ok pixels)."""
    from sparktika.kernels.image import decode_jpeg
    from sparktika.synth import build_jpeg

    good = build_jpeg(4)
    sof_at = good.index(b"\xff\xc0")
    seg_len = struct.unpack_from(">H", good, sof_at + 2)[0]
    sof_seg = good[sof_at : sof_at + 2 + seg_len]
    doubled = good[:sof_at] + sof_seg + good[sof_at:]
    with pytest.raises(KernelError):
        decode_jpeg(doubled)


def test_tiff_tiled_layout():
    """Tiled TIFF (tags 322-325): per-tile decode + grid placement + edge
    cropping; per-tile colors land in the right regions."""
    import struct as _s
    from sparktika.kernels.image import decode_tiff

    w, h, tw, th = 40, 20, 16, 12  # 3x2 tiles, padding on both edges
    tiles_x, tiles_y = -(-w // tw), -(-h // th)
    tiles = [bytes([(ti * 40 + 15) % 256] * 3) * (tw * th)
             for ti in range(tiles_x * tiles_y)]
    pos = 8
    offs = []
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    entries, extra = [], bytearray()
    e = "<"

    def ent(tag, t, vals, fmt):
        nonlocal extra
        size = (2 if fmt == "H" else 4) * len(vals)
        if size <= 4:
            field = _s.pack(e + fmt * len(vals), *vals).ljust(4, b"\0")
        else:
            off = pos + len(extra)
            extra += _s.pack(e + fmt * len(vals), *vals)
            field = _s.pack(e + "I", off)
        entries.append((tag, t, len(vals), field))

    ent(256, 3, [w], "H"); ent(257, 3, [h], "H"); ent(258, 3, [8, 8, 8], "H")
    ent(259, 3, [1], "H"); ent(262, 3, [2], "H"); ent(277, 3, [3], "H")
    ent(322, 3, [tw], "H"); ent(323, 3, [th], "H")
    ent(324, 4, offs, "I"); ent(325, 4, [len(t) for t in tiles], "I")
    entries.sort()
    ifd_off = pos + len(extra)
    ifd = _s.pack(e + "H", len(entries))
    for tag, t, c, f in entries:
        ifd += _s.pack(e + "HHI", tag, t, c) + f
    ifd += _s.pack(e + "I", 0)
    data = (b"II*\x00" + _s.pack(e + "I", ifd_off) + b"".join(tiles)
            + bytes(extra) + ifd)
    img = decode_tiff(data)
    assert (img.width, img.height) == (w, h)
    for ti in range(tiles_x * tiles_y):
        ty, tx = divmod(ti, tiles_x)
        c = (ti * 40 + 15) % 256
        region = img.pixels[ty * th:min((ty + 1) * th, h),
                            tx * tw:min((tx + 1) * tw, w)]
        assert (region[:, :, 0] == c).all(), ti
    # short tile table fails closed
    bad = data.replace(_s.pack(e + "HHI", 324, 4, len(offs)),
                       _s.pack(e + "HHI", 324, 4, 2), 1)
    with pytest.raises(KernelError):
        decode_tiff(bad)


def test_exif_metadata_reader():
    """EXIF from JPEG APP1 and TIFF IFDs under Tika's public names;
    malformed structures return {} (never raise)."""
    from sparktika.kernels.image import exif_metadata
    from sparktika.synth import build_jpeg_exif, build_jpeg, build_tiff

    md = exif_metadata(build_jpeg_exif(6))
    assert md["tiff:Make"] == "Cam1"
    assert md["tiff:Model"] == "Model 6"
    assert md["tiff:Orientation"] == "7"
    assert md["exif:DateTimeOriginal"] == "2026:01:07 10:00:00"
    assert exif_metadata(build_jpeg(6)) == {}       # no APP1
    assert exif_metadata(b"\xff\xd8\xff\xe1\x00\x08Exif") == {}  # truncated
    assert exif_metadata(b"junk") == {}
    # a plain TIFF's own IFD0 yields nothing EXIF-ish but doesn't error
    assert isinstance(exif_metadata(build_tiff(3)), dict)


def test_webp_header_dimensions_all_variants():
    """WebP dims from headers only (lossy VP8, lossless VP8L, extended
    VP8X) — ImageParser-parity metadata for the format a modern crawl
    serves most."""
    import struct
    from sparktika.kernels.extract import extract_document
    from sparktika.kernels.image import image_dimensions

    def lossy(w, h):
        vp8 = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
               + struct.pack("<HH", w, h) + b"\x00" * 8)
        c = b"VP8 " + struct.pack("<I", len(vp8)) + vp8
        return b"RIFF" + struct.pack("<I", 4 + len(c)) + b"WEBP" + c

    def lossless(w, h):
        bits = (w - 1) | ((h - 1) << 14)
        body = bytes([0x2F]) + struct.pack("<I", bits)
        c = b"VP8L" + struct.pack("<I", len(body)) + body
        return b"RIFF" + struct.pack("<I", 4 + len(c)) + b"WEBP" + c

    def vp8x(w, h):
        body = (bytes(4) + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little"))
        c = b"VP8X" + struct.pack("<I", len(body)) + body
        return b"RIFF" + struct.pack("<I", 4 + len(c)) + b"WEBP" + c

    for data, dims in [(lossy(640, 480), (640, 480)),
                       (lossless(321, 123), (321, 123)),
                       (vp8x(1920, 1080), (1920, 1080))]:
        assert image_dimensions(data) == ("image/webp",) + dims
        r = extract_document("x.webp", None, data)
        assert r.status == "ok"
        assert r.metadata["Image Width"] == [str(dims[0])]
        assert r.metadata["Image Height"] == [str(dims[1])]
    # bad sync / truncated payloads stay unsupported, never garbage dims
    bad = lossy(640, 480)
    bad = bad[:23] + b"\x00\x00\x00" + bad[26:]
    assert image_dimensions(bad) is None
    assert image_dimensions(b"RIFF\x00\x00\x00\x00WEBPVP8 ") is None


def test_heif_primary_item_beats_largest_ispe():
    """pitm/ipma resolution must pick the PRIMARY item's ispe even when
    another property (e.g. a full-res auxiliary) is larger."""
    import struct

    from sparktika.kernels.image import image_dimensions
    from sparktika.synth import _bmff_box

    ftyp = _bmff_box(b"ftyp", b"avif\x00\x00\x00\x00avifmif1")
    pitm = _bmff_box(b"pitm", b"\x00\x00\x00\x00" + struct.pack(">H", 2))
    ispe_big = _bmff_box(b"ispe",
                         b"\x00\x00\x00\x00" + struct.pack(">II", 999, 999))
    ispe_primary = _bmff_box(b"ispe",
                             b"\x00\x00\x00\x00" + struct.pack(">II", 40, 30))
    ipco = _bmff_box(b"ipco", ispe_big + ispe_primary)
    ipma = _bmff_box(b"ipma", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                     + struct.pack(">H", 2) + bytes([1, 2]))
    meta = _bmff_box(b"meta", b"\x00\x00\x00\x00" + pitm
                     + _bmff_box(b"iprp", ipco + ipma))
    assert image_dimensions(ftyp + meta) == ("image/avif", 40, 30)
    # no associations -> largest-ispe fallback
    meta2 = _bmff_box(b"meta", b"\x00\x00\x00\x00"
                      + _bmff_box(b"iprp", ipco))
    assert image_dimensions(ftyp + meta2) == ("image/avif", 999, 999)
    # truncated meta box -> None (honest unsupported), never a raise
    assert image_dimensions((ftyp + meta)[:40]) is None


def test_heif_dispatch_end_to_end():
    from sparktika.kernels.extract import extract_document
    from sparktika.synth import build_heif

    r = extract_document("u/3.heic", None, build_heif(3))
    assert r.status == "ok"
    assert r.content_type_detected == "image/heic"
    assert r.metadata["Image Width"] == ["19"]


def test_heif_corrupt_ipma_falls_back_to_largest_ispe():
    """r4 second review: an ipma declaring more entries than its box
    holds must not kill the largest-ispe fallback or read past the box
    end into following boxes."""
    import struct

    from sparktika.kernels.image import image_dimensions
    from sparktika.synth import _bmff_box

    ftyp = _bmff_box(b"ftyp", b"avif\x00\x00\x00\x00avifmif1")
    pitm = _bmff_box(b"pitm", b"\x00\x00\x00\x00" + struct.pack(">H", 1))
    ispe = _bmff_box(b"ispe",
                     b"\x00\x00\x00\x00" + struct.pack(">II", 40, 30))
    ipco = _bmff_box(b"ipco", ispe)
    # declares 1000 entries, carries one
    ipma_bad = _bmff_box(b"ipma", b"\x00\x00\x00\x00"
                         + struct.pack(">I", 1000)
                         + struct.pack(">H", 1) + bytes([1, 1]))
    meta = _bmff_box(b"meta", b"\x00\x00\x00\x00" + pitm
                     + _bmff_box(b"iprp", ipco + ipma_bad))
    # trailing mdat that a count-driven walk would stray into
    tail = _bmff_box(b"mdat", b"\x00\x01" * 64)
    assert image_dimensions(ftyp + meta + tail) == ("image/avif", 40, 30)
