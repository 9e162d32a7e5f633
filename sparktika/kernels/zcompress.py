"""Unix compress (.Z) LZW codec — from scratch.

Tika 1.20 routes .Z through CompressorParser (commons-compress
ZCompressorInputStream); the reference (tika-fork) reaches it via the
tika-parsers 1.20 jar (build.gradle), no .Z logic in its own tree.
Python's stdlib ships no LZW codec, so both directions are implemented
here from the public format description (the POSIX `compress` utility
spec and the widely-documented ncompress on-disk layout):

- Header: 0x1F 0x9D, then one flag byte: low 5 bits = max code width
  (9..16), bit 7 = block mode (code 256 is CLEAR and the first dynamic
  code is 257); bits 5-6 must be zero.
- Codes are packed LSB-first. The historic compressor buffered output
  in groups of 8 codes (= n_bits bytes), flushing the partial group on
  every code-width change and on CLEAR — so the decoder must skip to
  the next group boundary at exactly those points. Group boundaries
  are RELATIVE TO THE LAST FLUSH POINT, not to the stream start (the
  original output() resets its buffer offset at each flush); the skip
  at CLEAR uses the pre-reset width (the flush precedes the width
  reset). Width growths land on exact multiples of 8 codes — 256
  9-bit codes from a fresh table, then 2^(n-1) per widening — so in
  practice only CLEARs ever pad, which is easy to get wrong and is
  pinned against the system CLI in pytest.
- Code width starts at 9 and grows by one whenever the decoder-side
  free entry passes the current width's capacity, until max_bits.
- After CLEAR the decoder's next insert lands in slot 256 (one below
  FIRST) — a throwaway, since code 256 always means CLEAR — so real
  post-clear strings start at 257, exactly where the encoder restarts
  its table. oldcode is NOT reset by CLEAR (the throwaway entry's
  prefix is stale by design).
- Standard LZW KwKwK case: a code equal to the next free entry means
  "previous string + its first byte".

The encoder exists for synth corpora and round-trip tests; it derives
code widths by simulating the decoder's free-entry counter, so the two
agree by construction. Both are cross-validated against the system
`uncompress`/`zcat` CLI in pytest (the CLI decodes this encoder's
output; this decoder agrees with the CLI byte-for-byte).
"""

from __future__ import annotations

from .errors import InflateRatioError, KernelError, check_deadline

MAGIC = b"\x1f\x9d"
_INIT_BITS = 9
_CLEAR = 256
_FIRST = 257


def decompress_z(data: bytes, max_out: int,
                 deadline: float | None = None) -> bytes:
    """Decode a .Z stream (header included). Caps output at ``max_out``
    (raising InflateRatioError past it) and refuses malformed streams
    with KernelError — never returns silent garbage."""
    if data[:2] != MAGIC:
        raise KernelError("compress: bad magic")
    if len(data) < 3:
        raise KernelError("compress: truncated header")
    flags = data[2]
    max_bits = flags & 0x1F
    block_mode = bool(flags & 0x80)
    if flags & 0x60:
        raise KernelError("compress: reserved flag bits set")
    if not _INIT_BITS <= max_bits <= 16:
        raise KernelError(f"compress: max bits {max_bits} out of range")

    body = memoryview(data)[3:]
    nbits_total = len(body) * 8
    table_cap = 1 << max_bits
    prefix = [0] * table_cap
    suffix = bytearray(table_cap)
    for i in range(256):
        suffix[i] = i
    free_ent = _FIRST if block_mode else _CLEAR
    n_bits = _INIT_BITS
    maxcode = (1 << n_bits) - 1
    posbits = 0
    seg_base = 0
    oldcode = -1
    finchar = 0
    out = bytearray()
    stack = bytearray()
    ticks = 0

    while True:
        if free_ent > maxcode:
            # group-flush alignment: skip to the next 8-code group
            # boundary (relative to the last flush) before widening
            group = n_bits << 3
            rel = posbits - seg_base
            posbits = seg_base + ((rel + group - 1) // group) * group
            seg_base = posbits
            n_bits += 1
            maxcode = ((1 << n_bits) if n_bits == max_bits
                       else (1 << n_bits) - 1)
        if posbits + n_bits > nbits_total:
            # clean EOF leaves only pad slack. The format carries no
            # checksum or length, so truncation at a byte boundary is
            # partially detectable at best: any NONZERO bit in the
            # slack is a severed real code -> refuse; all-zero slack is
            # indistinguishable from group padding -> accept (exactly
            # the historic uncompress behavior).
            if posbits < nbits_total:
                tail_bytes = bytes(body[posbits >> 3:])
                tail = int.from_bytes(tail_bytes, "little") >> (posbits & 7)
                if tail:
                    raise KernelError(
                        "compress: severed trailing code (truncated)")
            break
        byte0 = posbits >> 3
        window = int.from_bytes(body[byte0: byte0 + 3], "little")
        code = (window >> (posbits & 7)) & ((1 << n_bits) - 1)
        posbits += n_bits

        ticks += 1
        if ticks % 4096 == 0:
            check_deadline(deadline, "compress decode")

        if oldcode == -1:
            if code >= 256:
                raise KernelError("compress: first code not a literal")
            finchar = oldcode = code
            out.append(code)
            continue
        if code == _CLEAR and block_mode:
            # table reset; free_ent restarts one below FIRST so the
            # next insert is the slot-256 throwaway (oldcode stays —
            # that entry's prefix is stale garbage, and unreachable)
            free_ent = _FIRST - 1
            group = n_bits << 3          # flush uses the PRE-reset width
            rel = posbits - seg_base
            posbits = seg_base + ((rel + group - 1) // group) * group
            seg_base = posbits
            n_bits = _INIT_BITS
            maxcode = (1 << n_bits) - 1
            continue

        incode = code
        del stack[:]
        if code > free_ent:
            raise KernelError("compress: code beyond dictionary")
        if code == free_ent:          # KwKwK
            stack.append(finchar)
            code = oldcode
        while code >= 256:
            stack.append(suffix[code])
            code = prefix[code]
        finchar = suffix[code]
        stack.append(finchar)
        if len(out) + len(stack) > max_out:
            raise InflateRatioError(
                f"compress: output exceeds inflate cap {max_out}B")
        out += stack[::-1]
        if free_ent < table_cap:
            prefix[free_ent] = oldcode
            suffix[free_ent] = finchar
            free_ent += 1
        oldcode = incode

    return bytes(out)


class _BitPacker:
    """LSB-first code packer with the 8-code group-flush quirk."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.seg_base = 0
        self.bitbuf = 0
        self.bitcnt = 0

    def put(self, code: int, n_bits: int) -> None:
        self.bitbuf |= code << self.bitcnt
        self.bitcnt += n_bits
        while self.bitcnt >= 8:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf >>= 8
            self.bitcnt -= 8

    def flush_group(self, n_bits: int) -> None:
        """Pad to the next 8-code group boundary — n_bits bytes,
        counted from the LAST flush point — as the historic compressor
        does on width change / CLEAR."""
        if self.bitcnt:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf = 0
            self.bitcnt = 0
        rem = (len(self.out) - self.seg_base) % n_bits
        if rem:
            self.out += b"\x00" * (n_bits - rem)
        self.seg_base = len(self.out)

    def final(self) -> bytes:
        if self.bitcnt:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf = 0
            self.bitcnt = 0
        return bytes(self.out)


def compress_z(data: bytes, max_bits: int = 16,
               clear_every: int | None = None) -> bytes:
    """Encode a .Z stream (block mode, like every real compressor).
    Code widths are derived by simulating the DECODER's free-entry
    counter — the decoder inserts one entry per code read except the
    very first of the stream — so encoder and decoder widths agree by
    construction. ``clear_every``: emit CLEAR after roughly that many
    codes — a test hook exercising the reset + group-alignment path."""
    if not _INIT_BITS <= max_bits <= 16:
        raise KernelError(f"compress: max bits {max_bits} out of range")
    table_cap = 1 << max_bits
    pk = _BitPacker()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    enc_free = _FIRST              # encoder's next table slot
    dec_free = _FIRST              # decoder-simulated free_ent
    n_bits = _INIT_BITS
    maxcode = (1 << n_bits) - 1
    first_of_stream = True
    n_codes = 0

    def emit(code: int) -> None:
        nonlocal n_bits, maxcode, dec_free, first_of_stream, n_codes
        if dec_free > maxcode:     # mirror the decoder's pre-read check
            pk.flush_group(n_bits)
            n_bits += 1
            maxcode = ((1 << n_bits) if n_bits == max_bits
                       else (1 << n_bits) - 1)
        pk.put(code, n_bits)
        n_codes += 1
        if first_of_stream:
            first_of_stream = False
        elif dec_free < table_cap:
            dec_free += 1          # decoder inserts after this code

    cur = b""
    for i in range(len(data)):
        b = data[i: i + 1]
        nxt = cur + b
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if enc_free < table_cap:
            table[nxt] = enc_free
            enc_free += 1
        cur = b
        if clear_every and n_codes >= clear_every:
            emit(table[cur])       # flush the pending single byte
            emit(_CLEAR)
            pk.flush_group(n_bits)
            n_bits = _INIT_BITS
            maxcode = (1 << n_bits) - 1
            table = {bytes([j]): j for j in range(256)}
            # decoder: free_ent = 256; its next insert is the slot-256
            # throwaway, so real strings restart at 257 on both sides
            dec_free = _FIRST - 1
            enc_free = _FIRST
            cur = b""
            n_codes = 0
    if cur:
        emit(table[cur])
    return MAGIC + bytes([0x80 | max_bits]) + pk.final()
