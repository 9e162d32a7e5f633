"""Property tests for the from-scratch wire-format readers.

The parquet Thrift-compact and ORC protobuf readers must SKIP any
well-formed value exactly — consuming precisely the encoded bytes, no
more, no less — or footer fields after an unknown field would misparse
silently. Each test carries its own tiny spec-faithful encoder and
drives the reader over random value trees.
"""

from __future__ import annotations

import struct

from hypothesis import given, settings, strategies as st

from sparktika.kernels.orc import _Proto
from sparktika.kernels.parquetmeta import _Compact

# -- thrift compact encoder twin ------------------------------------------


def _t_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _t_zigzag(v: int) -> bytes:
    return _t_uvarint((v << 1) ^ (v >> 63))


def _t_value(v) -> tuple[int, bytes]:
    """-> (compact type id, encoded bytes [element context])."""
    if isinstance(v, bool):
        return (1 if v else 2), (b"\x01" if v else b"\x02")
    if isinstance(v, int):
        return 6, _t_zigzag(v)
    if isinstance(v, float):
        return 7, struct.pack("<d", v)
    if isinstance(v, bytes):
        return 8, _t_uvarint(len(v)) + v
    if isinstance(v, list):
        if v:
            types = {_t_value(x)[0] for x in v}
            # bools in lists are one byte each; normalize mixed lists
            elem_t = types.pop() if len(types) == 1 else 12
        else:
            elem_t = 6
        body = b""
        for x in v:
            t, enc = _t_value(x)
            if t != elem_t:          # heterogenous: wrap in a struct
                enc = _t_field_struct([x])
            body += enc
        n = len(v)
        if n < 15:
            hdr = bytes([(n << 4) | elem_t])
        else:
            hdr = bytes([0xF0 | elem_t]) + _t_uvarint(n)
        return 9, hdr + body
    if isinstance(v, dict):
        return 12, _t_field_struct(list(v.values()))
    raise AssertionError(type(v))


def _t_field_struct(values) -> bytes:
    out = bytearray()
    fid = 0
    for i, v in enumerate(values):
        t, enc = _t_value(v)
        delta = i + 1 - fid
        fid = i + 1
        if t in (1, 2):              # bool value rides the field header
            out.append((delta << 4) | t)
            continue
        out.append((delta << 4) | t)
        out += enc
    out.append(0)
    return bytes(out)


_t_scalar = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.binary(max_size=40))
_t_tree = st.recursive(
    _t_scalar,
    lambda kids: st.one_of(
        st.lists(kids, max_size=6),
        st.dictionaries(st.integers(0, 5), kids, max_size=5)),
    max_leaves=25)


@settings(max_examples=200, deadline=None)
@given(st.lists(_t_tree, min_size=0, max_size=6))
def test_thrift_skip_consumes_exactly(values):
    data = _t_field_struct(values)
    c = _Compact(data, None)
    c.skip_struct()
    assert c.p == len(data)


# -- protobuf encoder twin --------------------------------------------------


def _p_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _p_field(fid: int, v) -> bytes:
    if isinstance(v, bool):
        return _p_varint((fid << 3) | 0) + _p_varint(int(v))
    if isinstance(v, int):
        return _p_varint((fid << 3) | 0) + _p_varint(v & ((1 << 64) - 1))
    if isinstance(v, float):
        return _p_varint((fid << 3) | 1) + struct.pack("<d", v)
    if isinstance(v, bytes):
        return _p_varint((fid << 3) | 2) + _p_varint(len(v)) + v
    if isinstance(v, dict):                    # nested message
        body = b"".join(_p_field(k + 1, x) for k, x in enumerate(v.values()))
        return _p_varint((fid << 3) | 2) + _p_varint(len(body)) + body
    raise AssertionError(type(v))


_p_scalar = st.one_of(
    st.booleans(),
    st.integers(min_value=0, max_value=2 ** 63),
    st.floats(allow_nan=False, allow_infinity=False),
    st.binary(max_size=40))
_p_tree = st.recursive(
    _p_scalar,
    lambda kids: st.dictionaries(st.integers(0, 5), kids, max_size=5),
    max_leaves=25)


@settings(max_examples=200, deadline=None)
@given(st.lists(_p_tree, min_size=0, max_size=6))
def test_protobuf_skip_consumes_exactly(values):
    data = b"".join(_p_field(i + 1, v) for i, v in enumerate(values))
    p = _Proto(data)
    while not p.at_end():
        _fid, wire = p.key()
        p.skip(wire)
    assert p.p == len(data)
