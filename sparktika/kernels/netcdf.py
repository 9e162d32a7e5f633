"""NetCDF classic (CDF-1 / CDF-2) kernel — from scratch.

Tika 1.20 parity: org.apache.tika.parser.netcdf.NetCDFParser (reached
by the reference via tika-parsers:1.20 — tika-fork-main/build.gradle:24)
walks the file with netcdf-java and reports global attributes as
metadata plus the dimension/variable inventory as the body. Built from
the public Unidata "NetCDF Classic Format Specification" (the on-disk
grammar in the NetCDF User Guide appendix):

- magic 'C' 'D' 'F' + version byte (\\x01 classic 32-bit offsets,
  \\x02 64-bit offsets), then numrecs, dim_list, gatt_list, var_list;
- every integer is a big-endian 4-byte value; names and attribute
  values pad to 4-byte boundaries;
- tagged lists: NC_DIMENSION=0x0A / NC_VARIABLE=0x0B /
  NC_ATTRIBUTE=0x0C, ABSENT = two zero words;
- a dimension of length 0 is the record (UNLIMITED) dimension;
- nc_type: 1 byte, 2 char, 3 short, 4 int, 5 float, 6 double;
- var = name rank dimids vatt_list nc_type vsize begin
  (begin is 4 bytes in CDF-1, 8 bytes in CDF-2).

Text contract (extract_netcdf_meta oracle): one line per dimension
``dim {name} = {len|UNLIMITED ({numrecs} currently)}``, one line per
variable ``var {name} : {type} ({dim names csv})``, one line per
global attribute ``:{name} = {value}`` (char attrs verbatim, numeric
attrs space-joined integers/floats).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .errors import KernelError, check_deadline

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C
_TYPES = {1: "byte", 2: "char", 3: "short", 4: "int",
          5: "float", 6: "double"}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}
_MAX_ITEMS = 4096           # dims / vars / attrs each
_MAX_NAME = 4096
_MAX_ATTR_VALUES = 4096


@dataclass
class NcVariable:
    name: str
    nc_type: int
    dim_names: tuple[str, ...]


@dataclass
class NcResult:
    version: int                       # 1 (classic) or 2 (64-bit offset)
    numrecs: int                       # -1 means STREAMING
    dims: list[tuple[str, int]] = field(default_factory=list)
    gatts: list[tuple[str, str]] = field(default_factory=list)
    variables: list[NcVariable] = field(default_factory=list)

    def render_text(self) -> str:
        lines: list[str] = []
        for name, ln in self.dims:
            if ln == 0:
                rec = ("streaming" if self.numrecs < 0
                       else f"{self.numrecs} currently")
                lines.append(f"dim {name} = UNLIMITED ({rec})")
            else:
                lines.append(f"dim {name} = {ln}")
        for v in self.variables:
            lines.append(f"var {v.name} : {_TYPES.get(v.nc_type, '?')} "
                         f"({','.join(v.dim_names)})")
        for name, val in self.gatts:
            lines.append(f":{name} = {val}")
        return "".join(ln + "\n" for ln in lines)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u32(self) -> int:
        if self.pos + 4 > len(self.data):
            raise KernelError("netcdf: truncated header word")
        v = struct.unpack_from(">I", self.data, self.pos)[0]
        self.pos += 4
        return v

    def i32(self) -> int:
        v = self.u32()
        return v - (1 << 32) if v >= (1 << 31) else v

    def name(self) -> str:
        n = self.u32()
        if n > _MAX_NAME:
            raise KernelError(f"netcdf: name length {n} exceeds cap")
        if self.pos + n > len(self.data):
            raise KernelError("netcdf: truncated name")
        s = self.data[self.pos: self.pos + n].decode("utf-8", "replace")
        self.pos += n + ((-n) % 4)
        return s


def _attr_value(r: _Reader, nc_type: int, nelems: int) -> str:
    if nc_type not in _TYPES:
        raise KernelError(f"netcdf: unknown nc_type {nc_type}")
    if nelems > _MAX_ATTR_VALUES:
        raise KernelError(f"netcdf: attribute nelems {nelems} exceeds cap")
    size = _TYPE_SIZE[nc_type] * nelems
    if r.pos + size > len(r.data):
        raise KernelError("netcdf: truncated attribute values")
    raw = r.data[r.pos: r.pos + size]
    r.pos += size + ((-size) % 4)
    if nc_type == 2:                                   # char: verbatim
        return raw.decode("utf-8", "replace")
    fmt = {1: "b", 3: "h", 4: "i", 5: "f", 6: "d"}[nc_type]
    vals = struct.unpack(f">{nelems}{fmt}", raw)
    if nc_type in (5, 6):
        return " ".join(repr(v) for v in vals)
    return " ".join(str(v) for v in vals)


def _att_list(r: _Reader, deadline: float | None) -> list[tuple[str, str]]:
    tag = r.u32()
    n = r.u32()
    if tag == 0 and n == 0:
        return []
    if tag != _NC_ATTRIBUTE:
        raise KernelError(f"netcdf: bad att_list tag {tag:#x}")
    if n > _MAX_ITEMS:
        raise KernelError(f"netcdf: attribute count {n} exceeds cap")
    out = []
    for _ in range(n):
        check_deadline(deadline, "netcdf attributes")
        name = r.name()
        nc_type = r.u32()
        nelems = r.u32()
        out.append((name, _attr_value(r, nc_type, nelems)))
    return out


def parse_netcdf(data: bytes, deadline: float | None = None) -> NcResult:
    if len(data) < 8 or data[:3] != b"CDF" or data[3] not in (1, 2):
        raise KernelError("netcdf: not a classic CDF-1/CDF-2 file")
    version = data[3]
    r = _Reader(data)
    r.pos = 4
    numrecs = r.u32()
    res = NcResult(version=version,
                   numrecs=-1 if numrecs == 0xFFFFFFFF else numrecs)

    tag = r.u32()
    n = r.u32()
    if tag == 0 and n == 0:
        pass
    elif tag == _NC_DIMENSION:
        if n > _MAX_ITEMS:
            raise KernelError(f"netcdf: dimension count {n} exceeds cap")
        for _ in range(n):
            check_deadline(deadline, "netcdf dimensions")
            name = r.name()
            ln = r.i32()
            if ln < 0:
                raise KernelError("netcdf: negative dimension length")
            res.dims.append((name, ln))
    else:
        raise KernelError(f"netcdf: bad dim_list tag {tag:#x}")

    res.gatts = _att_list(r, deadline)

    tag = r.u32()
    n = r.u32()
    if tag == 0 and n == 0:
        return res
    if tag != _NC_VARIABLE:
        raise KernelError(f"netcdf: bad var_list tag {tag:#x}")
    if n > _MAX_ITEMS:
        raise KernelError(f"netcdf: variable count {n} exceeds cap")
    for _ in range(n):
        check_deadline(deadline, "netcdf variables")
        name = r.name()
        rank = r.u32()
        if rank > len(res.dims):
            raise KernelError(f"netcdf: variable rank {rank} exceeds "
                              f"dimension count {len(res.dims)}")
        dim_names = []
        for _ in range(rank):
            d = r.u32()
            if d >= len(res.dims):
                raise KernelError(f"netcdf: dimid {d} out of range")
            dim_names.append(res.dims[d][0])
        _att_list(r, deadline)                 # per-variable attrs: skip
        nc_type = r.u32()
        if nc_type not in _TYPES:
            raise KernelError(f"netcdf: unknown variable type {nc_type}")
        r.u32()                                # vsize (spec-redundant)
        r.pos += 8 if version == 2 else 4      # begin offset
        if r.pos > len(data):
            raise KernelError("netcdf: truncated variable entry")
        res.variables.append(
            NcVariable(name=name, nc_type=nc_type,
                       dim_names=tuple(dim_names)))
    return res


# ---------------------------------------------------------------------
# Synth writer (tests + oracle corpus): emits a fully valid file —
# header, fixed-var data at the declared begin offsets, then record
# data — so the parser's offset arithmetic is exercised honestly.
# ---------------------------------------------------------------------

def _w_name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">I", len(b)) + b + b"\x00" * ((-len(b)) % 4)


def _w_char_attr(name: str, value: str) -> bytes:
    b = value.encode()
    return (_w_name(name) + struct.pack(">II", 2, len(b)) + b
            + b"\x00" * ((-len(b)) % 4))


def _w_int_attr(name: str, values: list[int]) -> bytes:
    return (_w_name(name) + struct.pack(">II", 4, len(values))
            + struct.pack(f">{len(values)}i", *values))


def build_netcdf(doc_id: int) -> bytes:
    """Deterministic classic file: even ids CDF-1, odd CDF-2; a record
    dimension `time` with doc_id%5 records, a fixed dim `x` of
    2+doc_id%3; global attrs title/source/levels; a fixed char var
    `label(x)` and a record float var `temp(time,x)`."""
    version = 1 if doc_id % 2 == 0 else 2
    off_w = ">Q" if version == 2 else ">I"
    n_rec = doc_id % 5
    nx = 2 + doc_id % 3

    dims = _w_name("time") + struct.pack(">I", 0)
    dims += _w_name("x") + struct.pack(">I", nx)
    dim_list = struct.pack(">II", _NC_DIMENSION, 2) + dims

    gatts = (_w_char_attr("title", f"Synth NetCDF {doc_id}")
             + _w_char_attr("source", "sparktika synth corpus")
             + _w_int_attr("levels", [doc_id % 9 + 1]))
    gatt_list = struct.pack(">II", _NC_ATTRIBUTE, 3) + gatts

    # sizes: label is char[x] (vsize padded to 4); temp record slab is
    # float[x] per record (padded to 4)
    label_vsize = nx + ((-nx) % 4)
    temp_vsize = 4 * nx

    def var_entry(name: str, dimids: list[int], nc_type: int,
                  vsize: int, begin: int) -> bytes:
        out = _w_name(name) + struct.pack(">I", len(dimids))
        out += struct.pack(f">{len(dimids)}I", *dimids)
        out += struct.pack(">II", 0, 0)        # no per-var attrs
        out += struct.pack(">II", nc_type, vsize)
        out += struct.pack(off_w, begin)
        return out

    # assemble header twice: first to learn its length, then for real
    def header(label_begin: int, temp_begin: int) -> bytes:
        var_list = (struct.pack(">II", _NC_VARIABLE, 2)
                    + var_entry("label", [1], 2, label_vsize, label_begin)
                    + var_entry("temp", [0, 1], 5, temp_vsize, temp_begin))
        return (b"CDF" + bytes([version])
                + struct.pack(">I", n_rec)
                + dim_list + gatt_list + var_list)

    hlen = len(header(0, 0))
    label_begin = hlen
    temp_begin = hlen + label_vsize
    hdr = header(label_begin, temp_begin)

    label = ("ABCDEFG"[:nx]).encode().ljust(label_vsize, b"\x00")
    recs = b"".join(
        struct.pack(f">{nx}f", *[float(r + doc_id % 7 + c)
                                 for c in range(nx)])
        for r in range(n_rec))
    return hdr + label + recs
