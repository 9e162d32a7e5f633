"""Zstandard (RFC 8878) single/multi-frame decoder, from scratch.

Python 3.11 ships no zstd codec (``compression.zstd`` landed in 3.14),
and this container refuses pip installs — so the archive matrix's zstd
slot is a from-spec decoder: frame headers, raw/RLE/compressed blocks,
FSE (normalized-count headers, spread tables, 2-state interleaved
Huffman-weight decoding), canonical Huffman literals (1 and 4 streams,
direct + FSE-compressed weights, treeless reuse), sequence execution
with the three-slot repeat-offset history, skippable frames, and
XXH64-verified content checksums (XXH64 reimplemented below from the
public spec, github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).

Reference parity: Tika 1.20 reaches zstd through commons-compress
(build.gradle -> tika-parsers:1.20); the reference wires no zstd
options of its own, so behaviorally this mirrors the gzip/xz wrapper
route (kernels/extract.py) — decompress under the shared inflate caps,
then re-dispatch the inner payload.

Bomb posture (invariant 7): callers pass ``max_out``; output beyond it
raises InflateRatioError mid-decode (never materializes), corrupt or
unsupported structure raises KernelError, dictionary frames (dict id
!= 0, treeless first block) are refused honestly. Nothing here ever
returns silently-short output: a frame that ends early is an error.

Scale note: this runs inside the Arrow-batched extraction kernel — one
document per call, no Spark state; the per-block Python loops bound at
128 KiB regenerated per block by spec.
"""

from __future__ import annotations

from .errors import InflateRatioError, KernelError

MAGIC = 0xFD2FB528
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F
_BLOCK_MAX = 1 << 17  # Block_Maximum_Size ceiling (RFC 8878 §3.1.1.2.2)
_MAX_FRAMES = 64

_M64 = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                           0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                           0x27D4EB2F165667C5)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 from the public spec (xxhash_spec.md); frame checksums are
    its low 32 bits."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        end = n - 31
        while i < end:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * _P2)
                        & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little")
                         * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little")
                         * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little")
                         * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _P2) & _M64, 31) * _P1) & _M64)
                 * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * _P2) & _M64,
                   31) * _P1) & _M64
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * _P1)
                         & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


class _BackBits:
    """Backwards bitstream (RFC 8878 §4.1): bits read from the last
    byte downwards, a 1-bit sentinel at the top of the final byte.
    Reads past the start zero-fill and mark `overflowed` (FSE weight
    decoding terminates on it; sequence decoding treats it as corrupt
    unless only padding-sized)."""

    __slots__ = ("buf", "pos", "bits", "nbits", "padded")

    def __init__(self, buf: bytes):
        if not buf or buf[-1] == 0:
            raise KernelError("zstd: bitstream missing sentinel")
        last = buf[-1]
        hb = last.bit_length() - 1
        self.buf = buf
        self.pos = len(buf) - 1         # next byte (going down)
        self.bits = last & ((1 << hb) - 1)
        self.nbits = hb
        self.padded = 0

    def _refill(self, need: int) -> None:
        while self.nbits < need and self.pos > 0:
            self.pos -= 1
            self.bits = (self.bits << 8) | self.buf[self.pos]
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._refill(n)
        if self.nbits >= n:
            self.nbits -= n
            return (self.bits >> self.nbits) & ((1 << n) - 1)
        pad = n - self.nbits
        v = (self.bits << pad) & ((1 << n) - 1)
        self.bits = 0
        self.nbits = 0
        self.padded += pad
        return v

    @property
    def overflowed(self) -> bool:
        return self.padded > 0

    def remaining(self) -> int:
        return self.pos * 8 + self.nbits


class _FwdBits:
    """Forward little-endian bitstream for FSE table descriptions."""

    __slots__ = ("val", "pos", "limit")

    def __init__(self, buf: bytes):
        self.val = int.from_bytes(buf, "little")
        self.pos = 0
        self.limit = len(buf) * 8

    def read(self, n: int) -> int:
        v = (self.val >> self.pos) & ((1 << n) - 1)
        self.pos += n
        if self.pos > self.limit + 7:
            raise KernelError("zstd: FSE header overruns its stream")
        return v

    def peek(self, n: int) -> int:
        return (self.val >> self.pos) & ((1 << n) - 1)


def _read_ncount(bits: _FwdBits, max_symbol: int,
                 max_log: int) -> tuple[list[int], int]:
    """FSE normalized counts (RFC 8878 §4.1.1): returns (counts,
    accuracy_log); counts use -1 for 'less than 1' probabilities."""
    al = bits.read(4) + 5
    if al > max_log:
        raise KernelError(f"zstd: accuracy log {al} > cap {max_log}")
    remaining = (1 << al) + 1
    threshold = 1 << al
    nb = al + 1
    counts: list[int] = []
    previous0 = False
    while remaining > 1 and len(counts) <= max_symbol:
        if previous0:
            n0 = len(counts)
            while bits.peek(2) == 3:
                bits.read(2)
                n0 += 3
                if n0 > max_symbol + 64:
                    raise KernelError("zstd: runaway zero repeat")
            n0 += bits.read(2)
            if n0 > max_symbol + 1:
                raise KernelError("zstd: zero repeat past max symbol")
            counts.extend([0] * (n0 - len(counts)))
            previous0 = False
            continue
        maxv = (2 * threshold - 1) - remaining
        if bits.peek(nb - 1) < maxv:
            count = bits.read(nb - 1)
        else:
            count = bits.read(nb) & (2 * threshold - 1)
            if count >= threshold:
                count -= maxv
        count -= 1  # -1 encodes 'less than 1'
        remaining -= -count if count < 0 else count
        counts.append(count)
        previous0 = count == 0
        while remaining < threshold:
            nb -= 1
            threshold >>= 1
    if remaining != 1:
        raise KernelError("zstd: FSE counts do not sum to table size")
    # byte-align the forward stream after the description
    bits.pos = (bits.pos + 7) & ~7
    return counts, al


def _build_fse(counts: list[int], al: int):
    """Decode table: per state -> (symbol, nb_bits, baseline)."""
    size = 1 << al
    spread = [0] * size
    high = size - 1
    # 'less than 1' symbols occupy the top cells, descending
    for s, c in enumerate(counts):
        if c == -1:
            spread[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, c in enumerate(counts):
        for _ in range(max(c, 0)):
            spread[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise KernelError("zstd: FSE spread did not close")
    nxt = [1 if c == -1 else c for c in counts]
    table = [None] * size
    for p in range(size):
        s = spread[p]
        x = nxt[s]
        nxt[s] = x + 1
        nbits = al - (x.bit_length() - 1)
        table[p] = (s, nbits, (x << nbits) - size)
    return table


# predefined distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEF = ([4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
            2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1], 6)
_ML_DEF = ([1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
            1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
            1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1], 6)
_OF_DEF = ([1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
            1, 1, 1, 1, -1, -1, -1, -1, -1], 5)

_LL_BASE = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
            16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512,
            1024, 2048, 4096, 8192, 16384, 32768, 65536]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11,
                       12, 13, 14, 15, 16]
_ML_BASE = ([c + 3 for c in range(32)]
            + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259,
               515, 1027, 2051, 4099, 8195, 16387, 32771, 65539])
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]

_MAX_LL_SYM, _MAX_ML_SYM, _MAX_OF_SYM = 35, 52, 31
_MAX_LOGS = {"ll": 9, "ml": 9, "of": 8}


def _huff_table(weights: list[int]):
    """Canonical Huffman decode table from weights (RFC 8878 §4.2.1):
    list of (symbol, nb_bits) cells, 2^max_bits entries."""
    total = sum(1 << (w - 1) for w in weights if w > 0)
    if total == 0:
        raise KernelError("zstd: empty huffman table")
    # last weight completes total to the nearest power of 2 STRICTLY
    # greater than the explicit sum (RFC 8878 §4.2.1)
    max_bits = total.bit_length()
    left = (1 << max_bits) - total
    if left <= 0 or left & (left - 1):
        raise KernelError("zstd: corrupt huffman weights")
    last_w = left.bit_length()  # leftover = 2^(w-1)
    weights = weights + [last_w]
    if max_bits > 11:
        raise KernelError("zstd: huffman code over 11 bits")
    table: list[tuple[int, int]] = [None] * (1 << max_bits)
    pos = 0
    for w in range(1, max_bits + 1):
        for sym, sw in enumerate(weights):
            if sw == w:
                nb = max_bits + 1 - w
                span = 1 << (w - 1)
                table[pos:pos + span] = [(sym, nb)] * span
                pos += span
    if pos != len(table):
        raise KernelError("zstd: huffman table underfilled")
    return table, max_bits


def _read_huff_weights(src: bytes) -> tuple[list[int], int]:
    """Huffman_Tree_Description -> (weights, bytes consumed)."""
    if not src:
        raise KernelError("zstd: missing huffman description")
    hdr = src[0]
    if hdr >= 128:  # direct 4-bit weights
        n = hdr - 127
        nbytes = (n + 1) // 2
        if 1 + nbytes > len(src):
            raise KernelError("zstd: truncated huffman weights")
        weights = []
        for i in range(n):
            b = src[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, 1 + nbytes
    # FSE-compressed weights, 2 interleaved states (accuracy cap 6)
    if 1 + hdr > len(src):
        raise KernelError("zstd: truncated FSE huffman weights")
    comp = src[1:1 + hdr]
    fwd = _FwdBits(comp)
    counts, al = _read_ncount(fwd, 255, 6)
    table = _build_fse(counts, al)
    back = _BackBits(comp[fwd.pos // 8:])
    s1 = back.read(al)
    s2 = back.read(al)
    weights: list[int] = []
    while True:
        sym, nb, base = table[s1]
        weights.append(sym)
        if back.overflowed:
            raise KernelError("zstd: huffman weight stream underrun")
        s1 = base + back.read(nb)
        if back.overflowed:
            weights.append(table[s2][0])
            break
        sym, nb, base = table[s2]
        weights.append(sym)
        s2 = base + back.read(nb)
        if back.overflowed:
            weights.append(table[s1][0])
            break
        if len(weights) > 255:
            raise KernelError("zstd: over 255 huffman weights")
    if len(weights) > 255:
        raise KernelError("zstd: over 255 huffman weights")
    return weights, 1 + hdr


def _huff_decode_stream(buf: bytes, table, max_bits: int,
                        n_out: int) -> bytearray:
    out = bytearray(n_out)
    back = _BackBits(buf)
    mask = (1 << max_bits) - 1
    bits = back.bits
    nbits = back.nbits
    pos = back.pos
    src = back.buf
    padded = 0
    for i in range(n_out):
        while nbits < max_bits and pos > 0:
            pos -= 1
            bits = (bits << 8) | src[pos]
            nbits += 8
        if nbits >= max_bits:
            idx = (bits >> (nbits - max_bits)) & mask
        else:
            idx = (bits << (max_bits - nbits)) & mask
        sym, nb = table[idx]
        if nb <= nbits:
            nbits -= nb
        else:
            padded += nb - nbits
            nbits = 0
            bits = 0
        if padded > max_bits:
            raise KernelError("zstd: huffman stream exhausted early")
        out[i] = sym
    return out


def _decode_literals(block: bytes, pos: int, prev_huff,
                     max_out: int):
    """Literals section -> (literals, new_pos, huff_state)."""
    if pos >= len(block):
        raise KernelError("zstd: missing literals header")
    b0 = block[pos]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif sf == 1:
            regen = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            regen = ((b0 >> 4) | (block[pos + 1] << 4)
                     | (block[pos + 2] << 12))
            pos += 3
        if regen > max_out + _BLOCK_MAX:
            raise InflateRatioError("zstd: literals exceed cap")
        if ltype == 0:
            lit = bytes(block[pos:pos + regen])
            if len(lit) != regen:
                raise KernelError("zstd: truncated raw literals")
            return lit, pos + regen, prev_huff
        if pos >= len(block):
            raise KernelError("zstd: truncated RLE literal")
        return bytes([block[pos]]) * regen, pos + 1, prev_huff
    # Compressed / Treeless
    if sf == 0:
        h = int.from_bytes(block[pos:pos + 3], "little")
        regen = (h >> 4) & 0x3FF
        comp = (h >> 14) & 0x3FF
        pos += 3
        streams = 1
    elif sf == 1:
        h = int.from_bytes(block[pos:pos + 3], "little")
        regen = (h >> 4) & 0x3FF
        comp = (h >> 14) & 0x3FF
        pos += 3
        streams = 4
    elif sf == 2:
        h = int.from_bytes(block[pos:pos + 4], "little")
        regen = (h >> 4) & 0x3FFF
        comp = (h >> 18) & 0x3FFF
        pos += 4
        streams = 4
    else:
        h = int.from_bytes(block[pos:pos + 5], "little")
        regen = (h >> 4) & 0x3FFFF
        comp = (h >> 22) & 0x3FFFF
        pos += 5
        streams = 4
    if regen > max_out + _BLOCK_MAX:
        raise InflateRatioError("zstd: literals exceed cap")
    body = bytes(block[pos:pos + comp])
    if len(body) != comp:
        raise KernelError("zstd: truncated compressed literals")
    pos += comp
    if ltype == 2:
        weights, used = _read_huff_weights(body)
        huff = _huff_table(weights)
        body = body[used:]
    else:  # treeless: reuse
        if prev_huff is None:
            raise KernelError(
                "zstd: treeless literals with no previous table "
                "(dictionary frames unsupported)")
        huff = prev_huff
    table, max_bits = huff
    if streams == 1:
        lit = bytes(_huff_decode_stream(body, table, max_bits, regen))
    else:
        if len(body) < 6:
            raise KernelError("zstd: truncated huffman jump table")
        sz1 = int.from_bytes(body[0:2], "little")
        sz2 = int.from_bytes(body[2:4], "little")
        sz3 = int.from_bytes(body[4:6], "little")
        o = 6
        if o + sz1 + sz2 + sz3 > len(body):
            raise KernelError("zstd: huffman stream sizes overrun")
        part = (regen + 3) // 4
        lens = (part, part, part, regen - 3 * part)
        if lens[3] < 0:
            raise KernelError("zstd: bad 4-stream split")
        chunks = []
        for i, sz in enumerate((sz1, sz2, sz3, len(body) - 6 - sz1
                                - sz2 - sz3)):
            chunks.append(bytes(_huff_decode_stream(
                body[o:o + sz], table, max_bits, lens[i])))
            o += sz
        lit = b"".join(chunks)
    return lit, pos, huff


def _seq_table(block: bytes, pos: int, mode: int, default,
               max_sym: int, kind: str, prev):
    """One of the LL/OF/ML tables per its 2-bit compression mode."""
    if mode == 0:
        counts, al = default
        return _build_fse(counts, al), pos, True
    if mode == 1:  # RLE: single symbol, zero bits
        sym = block[pos]
        if sym > max_sym:
            raise KernelError(f"zstd: {kind} RLE symbol out of range")
        return [(sym, 0, 0)], pos + 1, True
    if mode == 2:
        fwd = _FwdBits(block[pos:])
        counts, al = _read_ncount(fwd, max_sym, _MAX_LOGS[kind])
        return _build_fse(counts, al), pos + fwd.pos // 8, True
    if prev is None:
        raise KernelError(f"zstd: {kind} repeat mode with no previous "
                          "table")
    return prev, pos, True


def _decompress_block(block: bytes, out: bytearray, rep: list[int],
                      state: dict, max_out: int,
                      frame_start: int) -> None:
    """Decode one compressed block appending to `out`; matches may only
    reach back to frame_start (no dictionary support)."""
    lit, pos, state["huff"] = _decode_literals(
        block, 0, state.get("huff"), max_out - len(out))
    if pos >= len(block):
        raise KernelError("zstd: missing sequences header")
    b0 = block[pos]
    if b0 == 0:
        n_seq = 0
        pos += 1
    elif b0 < 128:
        n_seq = b0
        pos += 1
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) + block[pos + 1]
        pos += 2
    else:
        n_seq = int.from_bytes(block[pos + 1:pos + 3], "little") + 0x7F00
        pos += 3
    if n_seq == 0:
        if len(out) + len(lit) > max_out:
            raise InflateRatioError("zstd: output exceeds cap")
        out.extend(lit)
        return
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise KernelError("zstd: reserved sequence mode bits set")
    ll_t, pos, _ = _seq_table(block, pos, (modes >> 6) & 3, _LL_DEF,
                              _MAX_LL_SYM, "ll", state.get("ll"))
    of_t, pos, _ = _seq_table(block, pos, (modes >> 4) & 3, _OF_DEF,
                              _MAX_OF_SYM, "of", state.get("of"))
    ml_t, pos, _ = _seq_table(block, pos, (modes >> 2) & 3, _ML_DEF,
                              _MAX_ML_SYM, "ml", state.get("ml"))
    state["ll"], state["of"], state["ml"] = ll_t, of_t, ml_t
    back = _BackBits(block[pos:])
    ll_al = (len(ll_t) - 1).bit_length()
    of_al = (len(of_t) - 1).bit_length()
    ml_al = (len(ml_t) - 1).bit_length()
    ll_s = back.read(ll_al)
    of_s = back.read(of_al)
    ml_s = back.read(ml_al)
    if back.overflowed:
        raise KernelError("zstd: sequence stream too short")
    lit_pos = 0
    for seq_i in range(n_seq):
        of_code = of_t[of_s][0]
        if of_code > 31:
            raise KernelError("zstd: offset code out of range")
        offset_val = (1 << of_code) + back.read(of_code)
        ml_code = ml_t[ml_s][0]
        ml = _ML_BASE[ml_code] + back.read(_ML_BITS[ml_code])
        ll_code = ll_t[ll_s][0]
        ll = _LL_BASE[ll_code] + back.read(_LL_BITS[ll_code])
        if back.overflowed:
            raise KernelError("zstd: sequence bits exhausted")
        # repeat-offset resolution (RFC 8878 §3.1.1.5)
        if offset_val > 3:
            offset = offset_val - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_val - 1
            if ll == 0:
                idx += 1
            if idx == 0:
                offset = rep[0]
            elif idx < 3:
                offset = rep[idx]
                rep.pop(idx)
                rep.insert(0, offset)
            else:  # repeat3 with ll == 0 -> rep[0] - 1
                offset = rep[0] - 1
                if offset == 0:
                    raise KernelError("zstd: zero repeat offset")
                rep.pop()
                rep.insert(0, offset)
        if lit_pos + ll > len(lit):
            raise KernelError("zstd: literal run past literals")
        if len(out) + ll + ml > max_out:
            raise InflateRatioError("zstd: output exceeds cap")
        out.extend(lit[lit_pos:lit_pos + ll])
        lit_pos += ll
        if offset > len(out) - frame_start:
            raise KernelError("zstd: match offset before frame start "
                              "(dictionary frames unsupported)")
        if offset >= ml:
            start = len(out) - offset
            out.extend(out[start:start + ml])
        else:
            for _ in range(ml):  # overlapping copy
                out.append(out[-offset])
        if seq_i != n_seq - 1:
            _, nb, base = ll_t[ll_s]
            ll_s = base + back.read(nb)
            _, nb, base = ml_t[ml_s]
            ml_s = base + back.read(nb)
            _, nb, base = of_t[of_s]
            of_s = base + back.read(nb)
            if back.overflowed:
                raise KernelError("zstd: sequence state underrun")
    if len(out) + (len(lit) - lit_pos) > max_out:
        raise InflateRatioError("zstd: output exceeds cap")
    out.extend(lit[lit_pos:])


def decompress_zstd(data: bytes, max_out: int) -> bytes:
    """Decode all frames in `data`; output capped at max_out bytes
    (InflateRatioError beyond). Trailing garbage raises. Malformed
    input raises KernelError — never an uncaught IndexError from a
    lying length field (invariant 7)."""
    try:
        return _decompress_all(data, max_out)
    except (IndexError, ValueError, OverflowError) as e:
        raise KernelError(f"zstd: malformed stream ({e})") from e


def _decompress_all(data: bytes, max_out: int) -> bytes:
    result = bytearray()
    pos = 0
    n = len(data)
    frames = 0
    while pos < n:
        frames += 1
        if frames > _MAX_FRAMES:
            raise KernelError("zstd: frame count exceeds cap")
        if pos + 4 > n:
            raise KernelError("zstd: truncated frame magic")
        magic = int.from_bytes(data[pos:pos + 4], "little")
        pos += 4
        if _SKIP_LO <= magic <= _SKIP_HI:
            if pos + 4 > n:
                raise KernelError("zstd: truncated skippable frame")
            sz = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4 + sz
            if pos > n:
                raise KernelError("zstd: skippable frame overruns")
            continue
        if magic != MAGIC:
            raise KernelError("zstd: bad frame magic")
        if pos >= n:
            raise KernelError("zstd: missing frame header")
        fhd = data[pos]
        pos += 1
        if fhd & 0x08:
            raise KernelError("zstd: reserved frame header bit set")
        single = bool(fhd & 0x20)
        checksum = bool(fhd & 0x04)
        did_sz = (0, 1, 2, 4)[fhd & 3]
        fcs_flag = fhd >> 6
        if not single:
            pos += 1  # window descriptor (output is cap-guarded instead)
        if did_sz:
            if int.from_bytes(data[pos:pos + did_sz], "little") != 0:
                raise KernelError("zstd: dictionary frames unsupported")
            pos += did_sz
        fcs = None
        if fcs_flag == 0:
            if single:
                fcs = data[pos]
                pos += 1
        elif fcs_flag == 1:
            fcs = int.from_bytes(data[pos:pos + 2], "little") + 256
            pos += 2
        elif fcs_flag == 2:
            fcs = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        else:
            fcs = int.from_bytes(data[pos:pos + 8], "little")
            pos += 8
        if pos > n:
            raise KernelError("zstd: truncated frame header")
        if fcs is not None and len(result) + fcs > max_out:
            raise InflateRatioError(
                f"zstd: declared content {fcs}B exceeds cap")
        frame_start = len(result)
        state: dict = {}
        rep = [1, 4, 8]
        while True:
            if pos + 3 > n:
                raise KernelError("zstd: truncated block header")
            bh = int.from_bytes(data[pos:pos + 3], "little")
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 3:
                raise KernelError("zstd: reserved block type")
            if btype == 1:  # RLE: bsize = REGENERATED size, 1 src byte
                if bsize > _BLOCK_MAX:
                    raise KernelError("zstd: RLE block over limit")
                if pos >= n:
                    raise KernelError("zstd: truncated RLE block")
                if len(result) + bsize > max_out:
                    raise InflateRatioError("zstd: output exceeds cap")
                result.extend(bytes([data[pos]]) * bsize)
                pos += 1
            else:
                if pos + bsize > n:
                    raise KernelError("zstd: block overruns input")
                if btype == 0:
                    if len(result) + bsize > max_out:
                        raise InflateRatioError("zstd: output exceeds cap")
                    result.extend(data[pos:pos + bsize])
                else:
                    if bsize > _BLOCK_MAX + 3:
                        raise KernelError("zstd: block size over limit")
                    _decompress_block(data[pos:pos + bsize], result,
                                      rep, state, max_out, frame_start)
                pos += bsize
            if last:
                break
        if fcs is not None and len(result) - frame_start != fcs:
            raise KernelError(
                f"zstd: content size mismatch "
                f"({len(result) - frame_start} != declared {fcs})")
        if checksum:
            if pos + 4 > n:
                raise KernelError("zstd: truncated content checksum")
            want = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
            got = xxh64(bytes(result[frame_start:])) & 0xFFFFFFFF
            if got != want:
                raise KernelError("zstd: content checksum mismatch")
    return bytes(result)
