"""LZX decoder tests: encoder round-trips (no LZX CLI exists in this
environment, so a from-scratch minimal encoder + hand-built vectors
stand in for CLI goldens — same posture as the PST kernel), block-type
coverage, frame/reset behavior, E8 translation, truncation/corruption.
"""

import hashlib
import struct

import pytest

from sparktika.kernels import lzx
from sparktika.kernels.errors import KernelError


def _profiles():
    """Deterministic payloads across entropy profiles."""
    text = (b"The quick brown fox jumps over the lazy dog. " * 400)
    runs = b"A" * 5000 + b"B" * 5000 + b"AB" * 2500
    rand = bytes(
        hashlib.blake2b(bytes([i]), digest_size=64).digest()
        for i in range(0)
    )  # placeholder replaced below
    rand = b"".join(
        hashlib.blake2b(bytes([i]), digest_size=64).digest()
        for i in range(256)
    )
    mixed = text[:3000] + rand[:3000] + runs[:3000]
    tiny = b"x"
    empty_ish = b"ab"
    return {
        "text": text,
        "runs": runs,
        "random": rand,
        "mixed": mixed,
        "tiny": tiny,
        "two": empty_ish,
    }


@pytest.mark.parametrize("name", list(_profiles()))
@pytest.mark.parametrize("aligned", [False, True])
def test_roundtrip_verbatim_and_aligned(name, aligned):
    raw = _profiles()[name]
    enc = lzx.LzxEncoder(aligned=aligned)
    comp = enc.compress_segment(raw)
    got = lzx.decompress_segment(comp, 0, len(raw), enc.WINDOW_BITS)
    assert got == raw


@pytest.mark.parametrize("name", ["text", "runs", "random"])
def test_roundtrip_uncompressed_blocks(name):
    raw = _profiles()[name]
    enc = lzx.LzxEncoder()
    comp = enc.compress_segment_uncompressed(raw)
    got = lzx.decompress_segment(comp, 0, len(raw), enc.WINDOW_BITS)
    assert got == raw


def test_roundtrip_multi_frame_segment():
    # > 2 frames in one reset segment: exercises the per-frame realign
    raw = (b"frame filler content 0123456789 " * 4096)[: lzx.FRAME_SIZE * 2
                                                        + 12345]
    enc = lzx.LzxEncoder()
    comp = enc.compress_segment(raw)
    got = lzx.decompress_segment(comp, 0, len(raw), enc.WINDOW_BITS)
    assert got == raw


def test_roundtrip_multi_reset_stream_with_table():
    # 5 frames, reset every 2: three independent segments; the encoder's
    # per-frame offsets act as the ResetTable and the decoder verifies
    # its own position against every entry
    raw = (b"multi reset segment payload %d " * 8000)[: lzx.FRAME_SIZE * 4
                                                       + 777]
    enc = lzx.LzxEncoder()
    comp, offsets = enc.compress_stream(raw, reset_frames=2)
    assert len(offsets) == 5 and offsets[0] == 0
    got = lzx.decompress(comp, len(raw), enc.WINDOW_BITS, 2,
                         frame_offsets=offsets)
    assert got == raw
    # without the table it still decodes (sequential segments)
    assert lzx.decompress(comp, len(raw), enc.WINDOW_BITS, 2) == raw
    # a wrong table entry refuses
    bad = list(offsets)
    bad[2] ^= 2
    with pytest.raises(KernelError, match="ResetTable|refusing"):
        lzx.decompress(comp, len(raw), enc.WINDOW_BITS, 2,
                       frame_offsets=bad)


def test_roundtrip_literals_only():
    raw = bytes(range(256)) * 8
    enc = lzx.LzxEncoder()
    comp = enc.compress_segment(raw, greedy=False)
    assert lzx.decompress_segment(comp, 0, len(raw), 16) == raw


def test_matches_actually_used_and_r_queue():
    # highly repetitive input MUST compress (i.e., matches were emitted,
    # including R0 reuse), and still round-trip
    raw = b"abcdefgh" * 4000
    enc = lzx.LzxEncoder()
    comp = enc.compress_segment(raw)
    assert len(comp) < len(raw) // 4
    assert lzx.decompress_segment(comp, 0, len(raw), 16) == raw


def test_known_answer_hand_vector():
    # hand-assembled single-block stream: intel bit 0, verbatim block,
    # uniform 9-bit main tree, literals "HI" — byte-exact construction
    bw = lzx._BitWriter()
    bw.put(0, 1)              # no E8
    bw.put(1, 3)              # verbatim
    bw.put(2, 24)             # block size 2
    enc = lzx.LzxEncoder()
    enc._write_tree_uniform(bw, 9, 256)
    enc._write_tree_uniform(bw, 9, 256)
    enc._write_tree_uniform(bw, 0, 249)
    for b in b"HI":
        c, ln = enc.main_codes[b]
        bw.put(c, ln)
    comp = bw.bytes_le()
    assert lzx.decompress_segment(comp, 0, 2, 16) == b"HI"
    # uniform tree ⇒ canonical code of literal k is exactly k (9 bits)
    assert enc.main_codes[ord("H")] == (ord("H"), 9)


def test_e8_translation_roundtrip_vector():
    # encoder side of the Intel transform per the public spec: at output
    # position i, a relative call target rel becomes absolute abs=rel+pos
    filesize = 0x40000
    buf = bytearray(64)
    buf[5] = 0xE8
    rel = 0x1234
    pos = 10  # file_offset 10 + frame-local 0 ... E8 at absolute 15? no:
    # place frame at file_offset=pos; E8 at index 5 → curpos = pos + 5
    struct.pack_into("<i", buf, 6, rel + (pos + 5))
    lzx._e8_decode(buf, pos, filesize)
    assert struct.unpack_from("<i", buf, 6)[0] == rel
    # negative branch: abs in [-curpos, 0) decodes to rel = abs + filesize
    buf2 = bytearray(64)
    buf2[0] = 0xE8
    absval = -7
    struct.pack_into("<i", buf2, 1, absval)
    lzx._e8_decode(buf2, 100, filesize)  # curpos = 100 ≥ 7
    assert struct.unpack_from("<i", buf2, 1)[0] == absval + filesize
    # out-of-range absolute (abs < -curpos) is left untouched
    buf2b = bytearray(64)
    buf2b[0] = 0xE8
    struct.pack_into("<i", buf2b, 1, -7)
    lzx._e8_decode(buf2b, 0, filesize)  # curpos = 0: -7 < -curpos
    assert struct.unpack_from("<i", buf2b, 1)[0] == -7
    # last 10 bytes untouched
    buf3 = bytearray(12)
    buf3[4] = 0xE8
    struct.pack_into("<i", buf3, 5, 0x100)
    before = bytes(buf3)
    lzx._e8_decode(buf3, 0, filesize)
    assert bytes(buf3) == before


def test_e8_rel_exceeding_int32_packs_unsigned():
    # rel >= 2^31 (negative abs + a filesize near 2^32) must pack as the
    # 32-bit two's-complement pattern, not raise struct.error
    filesize = 0xFFFF0000
    buf = bytearray(64)
    buf[4] = 0xE8
    struct.pack_into("<i", buf, 5, -2)  # curpos = 4: -2 >= -4, in range
    lzx._e8_decode(buf, 0, filesize)
    assert struct.unpack_from("<I", buf, 5)[0] == (filesize - 2) & 0xFFFFFFFF


def test_match_overrunning_block_size_refuses_not_hangs():
    # Regression (r7 advice, HIGH): a match that decrements the declared
    # 24-bit block size below zero used to skip BOTH the ==0 header branch
    # and the >0 token loop, spinning the outer while forever (the frame
    # catch-up loop — the only check_deadline — never re-entered). Craft:
    # out_len 10, declared block size 3, literals "AB", then an R0 match
    # of length 4 → block_remaining = -3 with len(out)=6 < 10.
    bw = lzx._BitWriter()
    bw.put(0, 1)              # no E8
    bw.put(1, 3)              # verbatim
    bw.put(3, 24)             # declared block size 3 (a lie)
    enc = lzx.LzxEncoder()
    enc._write_tree_uniform(bw, 9, 256)
    enc._write_tree_uniform(bw, 9, 256)
    enc._write_tree_uniform(bw, 0, 249)
    for b in b"AB":
        c, ln = enc.main_codes[b]
        bw.put(c, ln)
    # sym 258 = slot 0 (R0, off=1), len_header 2 → match_len 4
    bw.put(258, 9)
    comp = bw.bytes_le()
    with pytest.raises(KernelError, match="overran the declared block"):
        lzx.decompress_segment(comp, 0, 10, 16)


def test_truncation_sweep_never_garbage():
    raw = (b"truncation sweep payload " * 600)[:12000]
    enc = lzx.LzxEncoder()
    comp = enc.compress_segment(raw)
    for cut in range(0, len(comp) - 1, 37):
        try:
            got = lzx.decompress_segment(comp[:cut], 0, len(raw), 16)
            # if it somehow succeeds it must be byte-correct
            assert got == raw
        except KernelError:
            pass


def test_corruption_fuzz_never_hangs_or_garbage_passes():
    raw = (b"corruption fuzz payload! " * 500)[:10000]
    enc = lzx.LzxEncoder()
    comp = bytearray(enc.compress_segment(raw))
    for off in range(1, len(comp), 53):
        mutated = bytearray(comp)
        mutated[off] ^= 0x5A
        try:
            lzx.decompress_segment(bytes(mutated), 0, len(raw), 16)
        except KernelError:
            pass  # refusal is the expected path


def test_reset_table_divergence_refuses():
    raw = (b"reset table check " * 5000)[: lzx.FRAME_SIZE + 100]
    enc = lzx.LzxEncoder()
    comp = enc.compress_segment(raw)
    # correct offsets: frame 0 at 0, frame 1 wherever the stream really is
    ok = lzx.decompress_segment(comp, 0, len(raw), 16)
    assert ok == raw
    with pytest.raises(KernelError, match="ResetTable"):
        lzx.decompress_segment(comp, 0, len(raw), 16,
                               frame_offsets=[0, 2])  # frame 1 surely not at 2


def test_empty_length_tree_only_refuses_when_used():
    # streams from our encoder never reference the (empty) length tree;
    # force a symbol that needs it and expect refusal, not garbage
    bw = lzx._BitWriter()
    bw.put(0, 1)
    bw.put(1, 3)
    bw.put(20, 24)
    enc = lzx.LzxEncoder()
    enc._write_tree_uniform(bw, 9, 256)
    enc._write_tree_uniform(bw, 9, 256)
    enc._write_tree_uniform(bw, 0, 249)
    # literal 'a', then a match symbol with len_header 7 (needs length tree)
    c, ln = enc.main_codes[ord("a")]
    bw.put(c, ln)
    sym = 256 + (0 << 3) + 7
    c, ln = enc.main_codes[sym]
    bw.put(c, ln)
    with pytest.raises(KernelError, match="empty tree"):
        lzx.decompress_segment(bw.bytes_le(), 0, 20, 16)


def test_oversubscribed_tree_refuses():
    lens = [1] * 4  # 4 codes of length 1: oversubscribed
    with pytest.raises(KernelError, match="tree"):
        lzx._Huffman(lens)
    with pytest.raises(KernelError, match="tree"):
        lzx._Huffman([1, 2])  # incomplete


def test_window_bits_validation():
    with pytest.raises(KernelError):
        lzx.n_position_slots(14)
    with pytest.raises(KernelError):
        lzx.n_position_slots(22)
    assert lzx.n_position_slots(15) == 30
    assert lzx.n_position_slots(16) == 32
    assert lzx.n_position_slots(20) == 42
    assert lzx.n_position_slots(21) == 50


def test_position_base_matches_spec_prefix():
    base, extra = lzx._position_tables(32)
    assert base[:11] == [0, 1, 2, 3, 4, 6, 8, 12, 16, 24, 32]
    assert extra[:11] == [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4]
    base50, extra50 = lzx._position_tables(50)
    assert all(e == 17 for e in extra50[36:])
