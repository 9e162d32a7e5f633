"""MATLAB Level-5 MAT-file kernel — from scratch.

Tika 1.20 parity: org.apache.tika.parser.mat.MatParser (JMatIO under
the hood, reached by the reference via tika-parsers:1.20 —
build.gradle) reports the MAT header facts and walks the variables,
emitting each name with its shape. Built from the public MathWorks
"MAT-File Format" document (Level 5):

- 128-byte header: 116 bytes descriptive text, 8-byte subsys offset,
  u16 version 0x0100, 2-byte endian indicator ('IM' little / 'MI' big);
- 8-byte-aligned data elements: u32 type + u32 size tags, with the
  SMALL element packing (size in the tag's high 16 bits, data inline);
- miCOMPRESSED (15) wraps one zlib-deflated element (inflate-guarded);
- miMATRIX (14): ArrayFlags (class byte), Dimensions, ArrayName
  subelements; 1xN char arrays additionally render their contents.

Text contract (extract_mat_meta oracle): one line per variable —
``name<TAB>class<TAB>RxC``, plus the decoded string for 1xN char
variables on a following line.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

from .errors import InflateRatioError, KernelError, check_deadline

_MI_COMPRESSED = 15
_MI_MATRIX = 14
_CLASSES = {1: "cell", 2: "struct", 3: "object", 4: "char", 5: "sparse",
            6: "double", 7: "single", 8: "int8", 9: "uint8", 10: "int16",
            11: "uint16", 12: "int32", 13: "uint32", 14: "int64",
            15: "uint64"}
_MAX_VARS = 4096
_MAX_INFLATE = 1 << 24


@dataclass
class MatVariable:
    name: str
    klass: str
    dims: tuple[int, ...]
    string: str | None = None


@dataclass
class MatResult:
    header_text: str
    variables: list[MatVariable] = field(default_factory=list)

    def render_text(self) -> str:
        lines: list[str] = []
        for v in self.variables:
            dims = "x".join(str(d) for d in v.dims)
            lines.append(f"{v.name}\t{v.klass}\t{dims}")
            if v.string is not None:
                lines.append(v.string)
        return "".join(ln + "\n" for ln in lines)


def _read_tag(data: bytes, pos: int, end: int) -> tuple[int, int, int, int]:
    """Returns (type, size, data_pos, next_pos) honoring small elements
    and 8-byte padding."""
    if pos + 8 > end:
        raise KernelError("mat: truncated element tag")
    word = struct.unpack_from("<I", data, pos)[0]
    if word >> 16:
        # small element: size in high 16 bits, <=4 data bytes inline
        mtype, size = word & 0xFFFF, word >> 16
        if size > 4:
            raise KernelError("mat: small element larger than 4 bytes")
        return mtype, size, pos + 4, pos + 8
    mtype, size = word, struct.unpack_from("<I", data, pos + 4)[0]
    data_pos = pos + 8
    nxt = data_pos + size
    nxt += (-nxt) % 8
    if data_pos + size > end:
        raise KernelError("mat: element overruns container")
    return mtype, size, data_pos, nxt


def _parse_matrix(data: bytes, pos: int, end: int) -> MatVariable:
    # ArrayFlags
    t, sz, dp, pos = _read_tag(data, pos, end)
    if t != 6 or sz < 8:  # miUINT32 x2
        raise KernelError("mat: bad ArrayFlags subelement")
    klass = data[dp] if dp < end else 0
    # Dimensions
    t, sz, dp, pos = _read_tag(data, pos, end)
    if t != 5:  # miINT32
        raise KernelError("mat: bad Dimensions subelement")
    n_dims = sz // 4
    if not 2 <= n_dims <= 16:
        raise KernelError(f"mat: implausible rank {n_dims}")
    dims = struct.unpack_from(f"<{n_dims}i", data, dp)
    if any(d < 0 for d in dims):
        raise KernelError("mat: negative dimension")
    # ArrayName
    t, sz, dp, pos = _read_tag(data, pos, end)
    if t != 1:  # miINT8
        raise KernelError("mat: bad ArrayName subelement")
    name = data[dp: dp + sz].decode("latin-1")
    var = MatVariable(name=name,
                      klass=_CLASSES.get(klass, str(klass)),
                      dims=tuple(dims))
    if klass == 4 and len(dims) == 2 and dims[0] == 1 and pos < end:
        # 1xN char array: decode the real-part subelement
        t, sz, dp, pos = _read_tag(data, pos, end)
        n = dims[1]
        if t in (4, 17) and sz >= 2 * n:  # miUINT16 / miUTF16
            codes = struct.unpack_from(f"<{n}H", data, dp)
            var.string = "".join(map(chr, codes))
        elif t in (1, 2) and sz >= n:     # miINT8/miUINT8
            var.string = data[dp: dp + n].decode("utf-8", "replace")
        elif t == 16:                      # miUTF8
            var.string = data[dp: dp + sz].decode("utf-8", "replace")
    return var


def parse_mat(data: bytes, deadline: float | None = None) -> MatResult:
    if len(data) < 136:
        raise KernelError("mat: shorter than header + one element")
    version, endian = struct.unpack_from("<HH", data, 124)
    if endian != 0x4D49:  # 'IM' little-endian on disk
        raise KernelError("mat: big-endian or non-MAT endian indicator")
    if version != 0x0100:
        raise KernelError(f"mat: unsupported version {version:#x}")
    header_text = data[:116].split(b"\x00", 1)[0].decode(
        "latin-1").rstrip()
    if not header_text.startswith("MATLAB 5.0"):
        raise KernelError("mat: header text lacks the MATLAB 5.0 marker")

    res = MatResult(header_text=header_text)
    pos = 128
    end = len(data)
    while pos < end:
        check_deadline(deadline, "mat elements")
        if len(res.variables) >= _MAX_VARS:
            raise KernelError("mat: variable count exceeds cap")
        mtype, size, dp, nxt = _read_tag(data, pos, end)
        if mtype == _MI_COMPRESSED:
            d = zlib.decompressobj()
            inner = d.decompress(data[dp: dp + size], _MAX_INFLATE)
            if d.unconsumed_tail:
                raise InflateRatioError(
                    f"mat: compressed element exceeds {_MAX_INFLATE}B")
            it, isz, idp, _ = _read_tag(inner, 0, len(inner))
            if it == _MI_MATRIX:
                res.variables.append(
                    _parse_matrix(inner, idp, min(idp + isz, len(inner))))
        elif mtype == _MI_MATRIX:
            res.variables.append(
                _parse_matrix(data, dp, min(dp + size, end)))
        # other top-level types: skip
        pos = nxt
    return res


def build_mat(variables: list[tuple[str, object]],
              header_note: str = "synth") -> bytes:
    """Writer for synth/tests: doubles (scalar/matrix) and strings;
    every second variable is wrapped in miCOMPRESSED."""
    def element(mtype: int, payload: bytes) -> bytes:
        out = struct.pack("<II", mtype, len(payload)) + payload
        out += b"\x00" * ((-len(out)) % 8)
        return out

    def matrix(name: str, value) -> bytes:
        if isinstance(value, str):
            klass, dims = 4, (1, len(value))
            data_el = element(4, struct.pack(f"<{len(value)}H",
                                             *(ord(c) for c in value)))
        else:
            rows = value if isinstance(value, list) else [[value]]
            klass, dims = 6, (len(rows), len(rows[0]))
            flat = [rows[r][c] for c in range(dims[1])
                    for r in range(dims[0])]  # column-major
            data_el = element(9, struct.pack(f"<{len(flat)}d", *flat))
        sub = element(6, struct.pack("<II", klass, 0))
        sub += element(5, struct.pack(f"<{len(dims)}i", *dims))
        sub += element(1, name.encode("latin-1"))
        sub += data_el
        return element(_MI_MATRIX, sub)

    hdr_text = (f"MATLAB 5.0 MAT-file, {header_note}"
                .encode("latin-1")[:116].ljust(116, b" "))
    out = bytearray(hdr_text + b"\x00" * 8
                    + struct.pack("<HH", 0x0100, 0x4D49))
    for i, (name, value) in enumerate(variables):
        el = matrix(name, value)
        if i % 2 == 1:
            out += element(_MI_COMPRESSED, zlib.compress(el, 6))
        else:
            out += el
    return bytes(out)
