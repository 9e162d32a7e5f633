"""LZX decoder (and a minimal encoder for tests/synth) — from scratch.

Completes the CHM kernel: MSCompressed (LZXC) section bodies were an
honest refusal since the CHM kernel landed; with this module they
decode. Built from the public format documentation only: the LZX DELTA
spec ([MS-PATCH] §2), the cabextract/libmspack lzxd notes, and
Russotto's CHM notes (the same sources the chm.py header cites) — the
reference (Tika 1.20) parses CHM via its own chm/lzx package inside
tika-parsers, not present in its tree.

Format summary (as used by CHM's LZXC container):

- Bitstream: a sequence of 16-bit little-endian words; bits are
  consumed MSB-first within each word.
- Per RESET interval (CHM resets every ``resetInterval`` frames of
  0x8000 uncompressed bytes): one header bit for Intel E8 translation
  (if set, a 32-bit translation size follows), then a sequence of
  blocks. Tree code lengths and the R0/R1/R2 recent-offset queue reset
  with the interval.
- Block header: 3-bit type (1 verbatim, 2 aligned offset,
  3 uncompressed) + 24-bit uncompressed size.
- Verbatim/aligned blocks: canonical-Huffman main tree (256 literals +
  8 symbols per position slot, lengths delta-coded against the
  previous tree via a 20-symbol pretree, read as 256-entry then
  remainder parts) and a 249-entry length tree; aligned blocks
  additionally carry an 8x3-bit aligned-offset tree (read FIRST).
- Match symbols: slot = (sym-256) >> 3, len_header = (sym-256) & 7,
  match_len = len_header + 2 (+ length-tree symbol when header == 7);
  slots 0-2 address the R-queue, slot >= 3 carries extra offset bits
  (aligned blocks split extras >= 3 into verbatim bits + a 3-bit
  aligned symbol); match_offset = formatted_offset - 2.
- Uncompressed blocks: realign to a 16-bit boundary (consuming a full
  16 bits when already aligned), then R0/R1/R2 as little-endian
  u32, then the raw bytes (+1 pad byte when the size is odd).
- CHM quirk: every 0x8000-byte output frame starts 16-bit-aligned in
  the compressed stream (that is what makes the per-frame ResetTable
  offsets meaningful), so the decoder realigns at frame boundaries.
  When the caller passes the ResetTable offsets, the decoder VERIFIES
  its own compressed position against them at each reset boundary and
  refuses on divergence — a wrong guess about a real-world encoder
  quirk becomes a status row, never silent garbage.

The encoder half exists so the synth corpus and the round-trip tests
can exercise every decoder path (verbatim, aligned, uncompressed
blocks, matches through the R-queue and through real position slots,
multi-frame and multi-reset streams) without a third-party LZX binary
— no LZX-capable CLI exists in this environment, so round-trip plus
hand-built known-answer vectors stand in for CLI goldens (same
posture as kernels/pst.py, which also has no oracle binary).
"""

from __future__ import annotations

import struct

from .errors import KernelError, check_deadline

FRAME_SIZE = 0x8000
_PRETREE_SYMS = 20
_LENGTH_SYMS = 249  # NUM_SECONDARY_LENGTHS

_BLOCK_VERBATIM = 1
_BLOCK_ALIGNED = 2
_BLOCK_UNCOMPRESSED = 3


def n_position_slots(window_bits: int) -> int:
    if not 15 <= window_bits <= 21:
        raise KernelError(f"lzx: window 2^{window_bits} out of spec range")
    return {20: 42, 21: 50}.get(window_bits, window_bits * 2)


def _position_tables(slots: int) -> tuple[list[int], list[int]]:
    extra = [min(17, max(0, (i >> 1) - 1)) for i in range(slots)]
    base = [0] * slots
    for i in range(1, slots):
        base[i] = base[i - 1] + (1 << extra[i - 1])
    return base, extra


# --------------------------------------------------------------------------
# Bit I/O: 16-bit little-endian words, MSB-first within each word
# --------------------------------------------------------------------------

class _BitReader:
    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos       # byte position of the NEXT 16-bit word
        self.buf = 0         # bit accumulator (top `cnt` bits valid)
        self.cnt = 0

    def _fill(self, n: int) -> None:
        while self.cnt < n:
            p = self.pos
            if p + 2 <= len(self.data):
                w = self.data[p] | (self.data[p + 1] << 8)
            elif p < len(self.data):
                w = self.data[p]          # truncated tail: zero-padded
            else:
                # a well-formed decode ends with at most one speculative
                # word of over-read; a truncated stream would otherwise
                # decode runaway zero bits into silent garbage
                if p > len(self.data) + 4:
                    raise KernelError("lzx: compressed stream truncated")
                w = 0
            self.pos = p + 2
            self.buf = (self.buf << 16) | w
            self.cnt += 16

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.cnt -= n
        v = (self.buf >> self.cnt) & ((1 << n) - 1)
        self.buf &= (1 << self.cnt) - 1
        return v

    def peek16(self) -> int:
        self._fill(16)
        return (self.buf >> (self.cnt - 16)) & 0xFFFF

    def drop(self, n: int) -> None:
        self.cnt -= n
        self.buf &= (1 << self.cnt) - 1

    def realign16(self) -> None:
        if self.cnt % 16:
            self.drop(self.cnt % 16)

    def byte_position(self) -> int:
        """Byte offset of the next unread bit (must be 16-bit aligned)."""
        return self.pos - self.cnt // 8


# --------------------------------------------------------------------------
# Canonical Huffman (MSB-first), table-accelerated decode
# --------------------------------------------------------------------------

_TABLE_BITS = 10


class _Huffman:
    """Decode table for one canonical code. Empty trees are representable
    (decode() then refuses) — an all-zero length tree is legal when no
    symbol of it is ever referenced."""

    __slots__ = ("table", "maxlen", "firstcode", "firstsym", "counts",
                 "symbols", "empty")

    def __init__(self, lengths: list[int]):
        maxlen = max(lengths, default=0)
        self.empty = maxlen == 0
        self.maxlen = maxlen
        if self.empty:
            return
        if maxlen > 16:
            raise KernelError("lzx: code length exceeds 16")
        counts = [0] * (maxlen + 1)
        for ln in lengths:
            if ln:
                counts[ln] += 1
        # Kraft check: the code must be exactly complete
        space = 1 << maxlen
        used = sum(counts[ln] << (maxlen - ln) for ln in range(1, maxlen + 1))
        if used != space:
            raise KernelError("lzx: invalid (incomplete/oversubscribed) tree")
        # canonical first-code per length + symbol list sorted (len, sym)
        firstcode = [0] * (maxlen + 2)
        firstsym = [0] * (maxlen + 2)
        code = 0
        nsym = 0
        symbols: list[int] = []
        by_len: list[list[int]] = [[] for _ in range(maxlen + 1)]
        for sym, ln in enumerate(lengths):
            if ln:
                by_len[ln].append(sym)
        for ln in range(1, maxlen + 1):
            firstcode[ln] = code
            firstsym[ln] = nsym
            symbols.extend(by_len[ln])
            code = (code + counts[ln]) << 1
            nsym += counts[ln]
        self.firstcode = firstcode
        self.firstsym = firstsym
        self.counts = counts
        self.symbols = symbols
        # fast table over the top _TABLE_BITS bits: (symbol, length) or
        # None for longer codes
        tb = min(maxlen, _TABLE_BITS)
        table: list[tuple[int, int] | None] = [None] * (1 << tb)
        code = 0
        idx = 0
        for ln in range(1, tb + 1):
            for _ in range(counts[ln]):
                lo = code << (tb - ln)
                hi = lo + (1 << (tb - ln))
                ent = (symbols[idx], ln)
                for j in range(lo, hi):
                    table[j] = ent
                code += 1
                idx += 1
            code <<= 1
        self.table = table

    def decode(self, br: _BitReader) -> int:
        if self.empty:
            raise KernelError("lzx: symbol requested from an empty tree")
        word = br.peek16()
        tb = min(self.maxlen, _TABLE_BITS)
        ent = self.table[word >> (16 - tb)]
        if ent is not None:
            br.drop(ent[1])
            return ent[0]
        # slow path: walk lengths above the table size
        for ln in range(tb + 1, self.maxlen + 1):
            prefix = word >> (16 - ln)
            off = prefix - self.firstcode[ln]
            if 0 <= off < self.counts[ln]:
                br.drop(ln)
                return self.symbols[self.firstsym[ln] + off]
        raise KernelError("lzx: corrupt bitstream (no code matches)")


def _read_lengths(br: _BitReader, lens: list[int], first: int,
                  last: int) -> None:
    """Delta-coded code lengths: 20 x 4-bit pretree lengths, then pretree
    symbols 0-16 (new = (prev - sym) mod 17), 17/18 (zero runs), 19
    (short run of one decoded value)."""
    pre = _Huffman([br.take(4) for _ in range(_PRETREE_SYMS)])
    i = first
    while i < last:
        sym = pre.decode(br)
        if sym == 17:
            run = 4 + br.take(4)
            for _ in range(run):
                if i >= last:
                    break
                lens[i] = 0
                i += 1
        elif sym == 18:
            run = 20 + br.take(5)
            for _ in range(run):
                if i >= last:
                    break
                lens[i] = 0
                i += 1
        elif sym == 19:
            run = 4 + br.take(1)
            sym2 = pre.decode(br)
            if sym2 > 16:
                raise KernelError("lzx: bad pretree run symbol")
            val = (lens[i] - sym2 + 17) % 17
            for _ in range(run):
                if i >= last:
                    break
                lens[i] = val
                i += 1
        elif sym <= 16:
            lens[i] = (lens[i] - sym + 17) % 17
            i += 1
        else:
            raise KernelError("lzx: bad pretree symbol")


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def decompress_segment(
    data: bytes,
    start: int,
    out_len: int,
    window_bits: int,
    file_offset: int = 0,
    frame_offsets: list[int] | None = None,
    deadline: float | None = None,
) -> bytes:
    """Decode ONE reset-interval segment (see _decompress_segment)."""
    return _decompress_segment(data, start, out_len, window_bits,
                               file_offset, frame_offsets, deadline)[0]


def decompress(
    data: bytes,
    out_len: int,
    window_bits: int,
    reset_interval_frames: int,
    frame_offsets: list[int] | None = None,
    deadline: float | None = None,
) -> bytes:
    """Decode a full LZXC stream: sequential reset-interval segments,
    each starting 16-bit aligned right after the previous one (or at its
    ResetTable offset when a table is supplied — the two are also
    cross-checked, refusing on divergence)."""
    if reset_interval_frames <= 0:
        raise KernelError("lzx: bad reset interval")
    seg_out_cap = reset_interval_frames * FRAME_SIZE
    out = bytearray()
    pos = 0
    seg_idx = 0
    while len(out) < out_len:
        check_deadline(deadline, "lzx decode")
        if frame_offsets is not None:
            fi = seg_idx * reset_interval_frames
            if fi < len(frame_offsets):
                want = frame_offsets[fi]
                if seg_idx > 0 and want != pos:
                    raise KernelError(
                        f"lzx: segment {seg_idx} at compressed offset "
                        f"{pos} but ResetTable says {want} — refusing")
                pos = want
            seg_frames = frame_offsets[fi: fi + reset_interval_frames]
        else:
            seg_frames = None
        seg_out = min(seg_out_cap, out_len - len(out))
        seg, end = _decompress_segment(data, pos, seg_out, window_bits,
                                       len(out), seg_frames, deadline)
        out += seg
        pos = end
        seg_idx += 1
    return bytes(out)


def _decompress_segment(
    data: bytes,
    start: int,
    out_len: int,
    window_bits: int,
    file_offset: int = 0,
    frame_offsets: list[int] | None = None,
    deadline: float | None = None,
) -> tuple[bytes, int]:
    """Decode ONE reset-interval segment: ``out_len`` uncompressed bytes
    from the 16-bit-aligned compressed offset ``start``; returns the
    decoded bytes plus the 16-bit-aligned compressed end offset (where
    the next segment begins). ``file_offset`` is the segment's position
    in the whole uncompressed file (E8 translation uses absolute
    positions). ``frame_offsets``, when given, holds the expected
    compressed byte offset of each frame in this segment (from the CHM
    ResetTable); the decoder verifies its own position against them and
    refuses on divergence.
    """
    slots = n_position_slots(window_bits)
    pos_base, pos_extra = _position_tables(slots)
    main_syms = 256 + (slots << 3)
    br = _BitReader(data, start)

    # per-reset state
    main_lens = [0] * main_syms
    length_lens = [0] * _LENGTH_SYMS
    r0 = r1 = r2 = 1
    intel_filesize = 0
    if br.take(1):
        intel_filesize = (br.take(16) << 16) | br.take(16)

    out = bytearray()
    window = 1 << window_bits
    block_remaining = 0
    block_type = 0
    block_size_odd = False
    n_blocks = 0
    main_tree: _Huffman | None = None
    length_tree: _Huffman | None = None
    aligned_tree: _Huffman | None = None
    frame_idx = 0

    while len(out) < out_len:
        # frame boundary bookkeeping. A match may overshoot a boundary
        # (the catch-up loop below then skips that frame's realign, which
        # is only defined between tokens). At an EXACT boundary: realign
        # to 16 bits and, when the caller passed ResetTable offsets,
        # verify the compressed position agrees — refusal beats garbage
        # if a real-world encoder deviates from the documented layout.
        while frame_idx * FRAME_SIZE <= len(out) and \
                frame_idx * FRAME_SIZE < out_len:
            check_deadline(deadline, "lzx frame decode")
            at_boundary = len(out) == frame_idx * FRAME_SIZE
            if frame_idx > 0 and at_boundary:
                br.realign16()
                if frame_offsets is not None and frame_idx < len(frame_offsets):
                    got = br.byte_position()
                    want = frame_offsets[frame_idx]
                    if got != want:
                        raise KernelError(
                            f"lzx: frame {frame_idx} compressed offset "
                            f"{got} != ResetTable {want} — refusing "
                            "(encoder-layout divergence, not risking "
                            "garbage)")
            frame_idx += 1
        frame_end = min(frame_idx * FRAME_SIZE, out_len)

        if block_remaining == 0:
            n_blocks += 1
            if n_blocks > 4096 + (out_len >> 4):
                raise KernelError("lzx: block count exceeds cap")
            block_type = br.take(3)
            block_remaining = br.take(24)
            block_size_odd = bool(block_remaining & 1)
            if block_type == _BLOCK_UNCOMPRESSED:
                # realign (a FULL 16 bits when already aligned), then
                # the R-queue as little-endian u32s, then raw bytes
                if br.cnt % 16 == 0:
                    br.take(16)
                else:
                    br.realign16()
                p = br.byte_position()
                if p + 12 > len(data):
                    raise KernelError("lzx: truncated uncompressed block")
                r0, r1, r2 = struct.unpack_from("<III", data, p)
                if not (r0 and r1 and r2):
                    raise KernelError("lzx: zero recent offset")
                br = _BitReader(data, p + 12)
                continue
            if block_type == _BLOCK_ALIGNED:
                aligned_tree = _Huffman([br.take(3) for _ in range(8)])
            elif block_type != _BLOCK_VERBATIM:
                raise KernelError(f"lzx: bad block type {block_type}")
            _read_lengths(br, main_lens, 0, 256)
            _read_lengths(br, main_lens, 256, main_syms)
            main_tree = _Huffman(list(main_lens))
            _read_lengths(br, length_lens, 0, _LENGTH_SYMS)
            length_tree = _Huffman(list(length_lens))
            continue

        if block_type == _BLOCK_UNCOMPRESSED:
            p = br.byte_position()
            n = min(block_remaining, frame_end - len(out))
            if p + n > len(data):
                raise KernelError("lzx: truncated uncompressed block body")
            out += data[p: p + n]
            block_remaining -= n
            p += n
            if block_remaining == 0 and block_size_odd:
                p += 1  # pad byte when the TOTAL block size is odd
            br = _BitReader(data, p)
            continue

        # verbatim / aligned token loop for this frame slice
        while block_remaining > 0 and len(out) < frame_end:
            sym = main_tree.decode(br)
            if sym < 256:
                out.append(sym)
                block_remaining -= 1
                continue
            sym -= 256
            slot = sym >> 3
            match_len = (sym & 7) + 2
            if match_len == 9:  # len_header 7: secondary length tree
                match_len = 9 + length_tree.decode(br)
            if slot == 0:
                off = r0
            elif slot == 1:
                off = r1
                r0, r1 = r1, r0
            elif slot == 2:
                off = r2
                r0, r2 = r2, r0
            else:
                if slot >= slots:
                    raise KernelError("lzx: position slot out of range")
                extra = pos_extra[slot]
                if block_type == _BLOCK_ALIGNED and extra >= 3:
                    formatted = (pos_base[slot]
                                 + (br.take(extra - 3) << 3)
                                 + aligned_tree.decode(br))
                elif extra:
                    formatted = pos_base[slot] + br.take(extra)
                else:
                    formatted = pos_base[slot]
                off = formatted - 2
                r2, r1, r0 = r1, r0, off
            if off <= 0 or off > len(out) or off > window:
                raise KernelError("lzx: match offset outside window")
            # overlapping copy; a match MAY overshoot the frame boundary
            # (the boundary realign then lands between later tokens)
            src = len(out) - off
            for i in range(match_len):
                out.append(out[src + i])
            block_remaining -= match_len
            if block_remaining < 0:
                # A match may overshoot a FRAME boundary but never its
                # block's declared 24-bit size; negative means corrupt
                # input — and would otherwise spin the outer loop forever
                # (neither the ==0 header branch nor the >0 token loop
                # would ever run again).
                raise KernelError("lzx: match overran the declared block size")

    if len(out) > out_len:
        raise KernelError("lzx: output overran the declared frame size")

    if intel_filesize:
        _e8_decode(out, file_offset, intel_filesize)
    br.realign16()
    return bytes(out), br.byte_position()


def _e8_decode(buf: bytearray, file_offset: int, filesize: int) -> None:
    """Reverse the Intel E8 call-target preprocessing, per 32 KiB output
    frame (absolute -> relative), skipping the last 10 bytes of each
    frame and frames at/after index 32768."""
    for fstart in range(0, len(buf), FRAME_SIZE):
        frame_no = (file_offset + fstart) // FRAME_SIZE
        if frame_no >= 32768:
            break
        fend = min(fstart + FRAME_SIZE, len(buf))
        if fend - fstart <= 10:
            continue
        i = fstart
        limit = fend - 10
        while i < limit:
            if buf[i] != 0xE8:
                i += 1
                continue
            absoff = struct.unpack_from("<i", buf, i + 1)[0]
            curpos = file_offset + i
            if -curpos <= absoff < filesize:
                rel = absoff - curpos if absoff >= 0 else absoff + filesize
                struct.pack_into("<I", buf, i + 1, rel & 0xFFFFFFFF)
            i += 5


# --------------------------------------------------------------------------
# Encoder (tests + synth corpus only — NOT a production compressor).
# Emits spec-valid streams that exercise every decoder path: uniform
# 9-bit main tree (window 2^16 -> exactly 512 symbols), empty or uniform
# length tree, verbatim + aligned + uncompressed blocks, literal runs,
# R-queue and real-slot matches, per-frame 16-bit alignment.
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.words: list[int] = []
        self.cur = 0
        self.cnt = 0

    def put(self, v: int, n: int) -> None:
        while n > 0:
            room = 16 - self.cnt
            k = min(room, n)
            self.cur = (self.cur << k) | ((v >> (n - k)) & ((1 << k) - 1))
            self.cnt += k
            n -= k
            if self.cnt == 16:
                self.words.append(self.cur)
                self.cur = 0
                self.cnt = 0

    def realign16(self) -> None:
        if self.cnt:
            self.put(0, 16 - self.cnt)

    def bytes_le(self) -> bytes:
        self.realign16()
        return b"".join(struct.pack("<H", w) for w in self.words)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    maxlen = max(lengths, default=0)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    for ln in range(1, maxlen + 1):
        for sym, sl in enumerate(lengths):
            if sl == ln:
                codes[sym] = (code, ln)
                code += 1
        code <<= 1
    return codes


class LzxEncoder:
    """Window 2^16 (32 position slots, 512 main symbols) encoder used by
    the synth CHM corpus and the round-trip tests. Tokens never cross a
    frame boundary and every frame starts 16-bit aligned, matching the
    per-frame ResetTable contract."""

    WINDOW_BITS = 16

    def __init__(self, aligned: bool = False):
        self.aligned = aligned
        slots = n_position_slots(self.WINDOW_BITS)
        self.pos_base, self.pos_extra = _position_tables(slots)
        self.main_lens = [9] * 512        # complete: 512 * 2^-9 == 1
        self.main_codes = _canonical_codes(self.main_lens)
        self.aligned_lens = [3] * 8
        self.aligned_codes = _canonical_codes(self.aligned_lens)

    # -- token layer --------------------------------------------------------

    def _slot_for(self, formatted: int) -> int:
        s = 0
        base = self.pos_base
        while s + 1 < len(base) and base[s + 1] <= formatted:
            s += 1
        return s

    def _write_tree_uniform(self, bw: _BitWriter, value: int,
                            count: int, prev: int = 0) -> None:
        """Pretree encoding of `count` lengths all equal to `value`,
        delta-coded against previous-tree lengths all equal to `prev`
        (lengths persist across blocks within a reset interval). Pretree:
        sym d=(prev-value)%17 gets length 1, syms 17/18 get length 2 —
        complete (1/2 + 1/4 + 1/4)."""
        d = (prev - value + 17) % 17
        pre = [0] * _PRETREE_SYMS
        pre[d] = 1
        pre[17] = 2
        pre[18] = 2
        if d in (17, 18):  # value 0: zero runs only, keep tree complete
            pre = [0] * _PRETREE_SYMS
            pre[17] = 1
            pre[18] = 1
        for ln in pre:
            bw.put(ln, 4)
        codes = _canonical_codes(pre)
        i = 0
        while i < count:
            if value == 0:
                if count - i >= 20:
                    run = min(51, count - i)
                    c, ln = codes[18]
                    bw.put(c, ln)
                    bw.put(run - 20, 5)
                    i += run
                elif count - i >= 4:
                    run = min(19, count - i)
                    c, ln = codes[17]
                    bw.put(c, ln)
                    bw.put(run - 4, 4)
                    i += run
                else:
                    raise KernelError("lzx-enc: cannot emit <4 zero tail")
            else:
                c, ln = codes[d]
                bw.put(c, ln)
                i += 1

    def _write_block_header(self, bw: _BitWriter, size: int,
                            prev: int) -> None:
        bw.put(_BLOCK_ALIGNED if self.aligned else _BLOCK_VERBATIM, 3)
        bw.put(size, 24)
        if self.aligned:
            for ln in self.aligned_lens:
                bw.put(ln, 3)
        self._write_tree_uniform(bw, 9, 256, prev)   # main tree part 1
        self._write_tree_uniform(bw, 9, 256, prev)   # main tree part 2
        self._write_tree_uniform(bw, 0, _LENGTH_SYMS)  # empty length tree

    def _emit_literal(self, bw: _BitWriter, b: int) -> None:
        c, ln = self.main_codes[b]
        bw.put(c, ln)

    def _emit_match(self, bw: _BitWriter, length: int, off: int,
                    rq: list[int]) -> None:
        if not 2 <= length <= 8:
            raise KernelError("lzx-enc: match length out of encoder range")
        if off == rq[0]:
            slot = 0
        elif off == rq[1]:
            slot = 1
            rq[0], rq[1] = rq[1], rq[0]
        elif off == rq[2]:
            slot = 2
            rq[0], rq[2] = rq[2], rq[0]
        else:
            formatted = off + 2
            slot = self._slot_for(formatted)
            rq[2], rq[1], rq[0] = rq[1], rq[0], off
        sym = 256 + (slot << 3) + (length - 2)
        c, ln = self.main_codes[sym]
        bw.put(c, ln)
        if slot >= 3:
            extra = self.pos_extra[slot]
            rem = (off + 2) - self.pos_base[slot]
            if self.aligned and extra >= 3:
                bw.put(rem >> 3, extra - 3)
                ac, al = self.aligned_codes[rem & 7]
                bw.put(ac, al)
            elif extra:
                bw.put(rem, extra)

    # -- stream layer -------------------------------------------------------

    def compress_segment(self, raw: bytes, greedy: bool = True) -> bytes:
        """One reset-interval segment: intel header bit 0, one block per
        frame, greedy matcher (length<=8, offsets 1-64 plus R0) or
        all-literals."""
        return self._compress_segment_tracked(raw, greedy)[0]

    def compress_stream(self, raw: bytes,
                        reset_frames: int) -> tuple[bytes, list[int]]:
        """Full LZXC stream: independent reset segments of
        ``reset_frames`` frames each, concatenated. Returns the
        compressed bytes plus the per-frame compressed offsets (the CHM
        ResetTable contents)."""
        comp = bytearray()
        offsets: list[int] = []
        seg_bytes = reset_frames * FRAME_SIZE
        for sstart in range(0, len(raw), seg_bytes):
            seg_raw = raw[sstart: sstart + seg_bytes]
            base = len(comp)
            seg, frame_offs = self._compress_segment_tracked(seg_raw)
            offsets.extend(base + o for o in frame_offs)
            comp += seg
        if not raw:
            offsets = [0]
        return bytes(comp), offsets

    def _compress_segment_tracked(
            self, raw: bytes,
            greedy: bool = True) -> tuple[bytes, list[int]]:
        """compress_segment + the byte offset of each frame start."""
        bw = _BitWriter()
        bw.put(0, 1)
        rq = [1, 1, 1]
        prev = 0
        offsets: list[int] = []
        for fstart in range(0, len(raw), FRAME_SIZE):
            offsets.append(len(bw.words) * 2)  # realigned: cnt == 0
            frame = raw[fstart: fstart + FRAME_SIZE]
            self._write_block_header(bw, len(frame), prev)
            prev = 9
            i = 0
            n = len(frame)
            while i < n:
                if greedy and i >= 1:
                    # the cheapest useful matches: R0 + offsets 1-64
                    best_len = 0
                    best_off = 0
                    for off in (rq[0], 1, 2, 4, 8, 16, 32, 64):
                        if off < 1 or off > fstart + i:
                            continue
                        ln = 0
                        while (ln < 8 and i + ln < n
                               and raw[fstart + i + ln - off]
                               == frame[i + ln]):
                            ln += 1
                        if ln > best_len:
                            best_len, best_off = ln, off
                    if best_len >= 3:
                        self._emit_match(bw, best_len, best_off, rq)
                        i += best_len
                        continue
                self._emit_literal(bw, frame[i])
                i += 1
            bw.realign16()
        return bw.bytes_le(), offsets

    def compress_segment_uncompressed(self, raw: bytes) -> bytes:
        """Segment made of type-3 (uncompressed) blocks, one per frame."""
        bw = _BitWriter()
        bw.put(0, 1)
        body = b""
        for fstart in range(0, len(raw), FRAME_SIZE):
            frame = raw[fstart: fstart + FRAME_SIZE]
            bw.put(_BLOCK_UNCOMPRESSED, 3)
            bw.put(len(frame), 24)
            # realign-with-full-16-when-aligned quirk
            if bw.cnt % 16 == 0:
                bw.put(0, 16)
            else:
                bw.realign16()
            head = bw.bytes_le()
            body = (body + head + struct.pack("<III", 1, 1, 1) + frame
                    + (b"\x00" if len(frame) & 1 else b""))
            bw = _BitWriter()
        return body
