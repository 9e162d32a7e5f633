"""Model / tensor artifact kernels: GGUF, SafeTensors, NumPy .npy.

A training-data pipeline's crawl space is full of model artifacts —
checkpoints on shared drives, HF-hub mirrors, experiment dumps — and
cataloguing them (architecture, dtype, parameter counts) without
touching the weight payload is real value. All three formats are
public:

- **.npy** (numpy NEP "NPY format" 1.0/2.0): ``\\x93NUMPY`` magic,
  version bytes, a length-prefixed Python-literal header dict
  (descr / fortran_order / shape). Parsed with ast.literal_eval —
  never eval.
- **SafeTensors** (huggingface/safetensors public spec): u64 LE JSON
  header length, then a JSON object mapping tensor names to
  {dtype, shape, data_offsets}, plus optional ``__metadata__``.
  Magic-less: detection gates on a bounded header length, a leading
  '{', and a spec-required key in the header window.
- **GGUF** (ggml/llama.cpp public spec): ``GGUF`` magic, u32 version,
  u64 tensor count, u64 KV count, then typed key-values (scalars,
  strings, arrays). Scalar/string KVs like general.architecture and
  general.name surface; arrays are skipped with element caps.

Weight payloads are NEVER read. Beyond Tika 1.20 parity (none of the
three existed in 2019). Guards: header-size caps, KV/string/array
caps, ast-literal-only npy header; failures degrade to status rows
(invariant 7).
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field

from .errors import KernelError

NPY_MIME = "application/x-npy"
SAFETENSORS_MIME = "application/x-safetensors"
GGUF_MIME = "application/x-gguf"

_ST_MAX_HEADER = 16 * 1024 * 1024
_GGUF_MAX_KV = 4096
_GGUF_MAX_STR = 64 * 1024
_GGUF_MAX_ARR = 1 << 20


@dataclass
class TensorMeta:
    mime: str
    n_tensors: int = 0
    dtype: str | None = None
    total_params: int | None = None
    arch: str | None = None
    name: str | None = None
    fields: dict[str, str] = field(default_factory=dict)


def parse_npy(data: bytes) -> TensorMeta:
    if data[:6] != b"\x93NUMPY" or len(data) < 10:
        raise KernelError("npy: bad magic")
    major = data[6]
    if major == 1:
        hlen = struct.unpack("<H", data[8:10])[0]
        hstart = 10
    elif major in (2, 3):
        if len(data) < 12:
            raise KernelError("npy: truncated v2 header length")
        hlen = struct.unpack("<I", data[8:12])[0]
        hstart = 12
    else:
        raise KernelError(f"npy: unsupported version {major}")
    if hlen > 1 << 20 or hstart + hlen > len(data):
        raise KernelError("npy: header out of bounds")
    import ast

    try:
        hdr = ast.literal_eval(
            data[hstart:hstart + hlen].decode("latin-1").strip())
    except (ValueError, SyntaxError) as e:
        raise KernelError(f"npy: unparseable header dict ({e})")
    if not isinstance(hdr, dict) or "descr" not in hdr:
        raise KernelError("npy: header is not the NEP dict")
    shape = hdr.get("shape", ())
    total = 1
    for d in shape if isinstance(shape, tuple) else ():
        if not isinstance(d, int) or d < 0:
            raise KernelError("npy: bad shape entry")
        total *= d
    m = TensorMeta(NPY_MIME, n_tensors=1, dtype=str(hdr["descr"]),
                   total_params=total)
    m.fields["npy-shape"] = repr(tuple(shape))
    m.fields["npy-fortran-order"] = str(bool(hdr.get("fortran_order",
                                                     False)))
    return m


def is_safetensors(data: bytes) -> bool:
    if len(data) < 10:
        return False
    n = struct.unpack("<Q", data[:8])[0]
    if not (2 <= n <= min(len(data) - 8, _ST_MAX_HEADER)):
        return False
    if data[8:9] != b"{":
        return False
    window = data[8:8 + min(n, 4096)]
    return b'"data_offsets"' in window or b"__metadata__" in window


def parse_safetensors(data: bytes) -> TensorMeta:
    if not is_safetensors(data):
        raise KernelError("safetensors: header gate failed")
    n = struct.unpack("<Q", data[:8])[0]
    try:
        hdr = json.loads(data[8:8 + n].decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as e:
        raise KernelError(f"safetensors: bad JSON header ({e})")
    if not isinstance(hdr, dict):
        raise KernelError("safetensors: header is not an object")
    m = TensorMeta(SAFETENSORS_MIME)
    total = 0
    dtypes: list[str] = []
    for key, val in hdr.items():
        if key == "__metadata__":
            if isinstance(val, dict):
                name = val.get("name") or val.get("model_name")
                if isinstance(name, str):
                    m.name = name
            continue
        if not isinstance(val, dict):
            raise KernelError("safetensors: tensor entry not an object")
        m.n_tensors += 1
        dt = val.get("dtype")
        if isinstance(dt, str) and dt not in dtypes:
            dtypes.append(dt)
        shape = val.get("shape", [])
        cnt = 1
        for d in shape if isinstance(shape, list) else []:
            if not isinstance(d, int) or d < 0:
                raise KernelError("safetensors: bad shape entry")
            cnt *= d
        total += cnt
    m.dtype = dtypes[0] if dtypes else None
    m.total_params = total
    if len(dtypes) > 1:
        m.fields["safetensors-dtypes"] = ",".join(sorted(dtypes))
    return m


def _gguf_str(data: bytes, pos: int) -> tuple[str, int]:
    if pos + 8 > len(data):
        raise KernelError("gguf: truncated string length")
    ln = struct.unpack("<Q", data[pos:pos + 8])[0]
    if ln > _GGUF_MAX_STR or pos + 8 + ln > len(data):
        raise KernelError("gguf: string out of bounds")
    return data[pos + 8:pos + 8 + ln].decode("utf-8", "replace"), pos + 8 + ln


_GGUF_SCALAR = {0: "<B", 1: "<b", 2: "<H", 3: "<h", 4: "<I", 5: "<i",
                6: "<f", 7: "<B", 10: "<Q", 11: "<q", 12: "<d"}


def parse_gguf(data: bytes) -> TensorMeta:
    if data[:4] != b"GGUF" or len(data) < 24:
        raise KernelError("gguf: bad magic")
    version = struct.unpack("<I", data[4:8])[0]
    if not (1 <= version <= 16):
        raise KernelError(f"gguf: implausible version {version}")
    n_tensors, n_kv = struct.unpack("<QQ", data[8:24])
    if n_kv > _GGUF_MAX_KV:
        raise KernelError("gguf: KV count cap exceeded")
    m = TensorMeta(GGUF_MIME, n_tensors=int(n_tensors))
    m.fields["gguf-version"] = str(version)
    pos = 24

    def read_value(pos: int, typ: int, depth: int = 0):
        if typ in _GGUF_SCALAR:
            fmt = _GGUF_SCALAR[typ]
            size = struct.calcsize(fmt)
            if pos + size > len(data):
                raise KernelError("gguf: truncated scalar value")
            v = struct.unpack(fmt, data[pos:pos + size])[0]
            if typ == 7:
                v = bool(v)
            return v, pos + size
        if typ == 8:
            return _gguf_str(data, pos)
        if typ == 9:
            if depth > 2:
                raise KernelError("gguf: array nesting cap")
            if pos + 12 > len(data):
                raise KernelError("gguf: truncated array header")
            etyp = struct.unpack("<I", data[pos:pos + 4])[0]
            cnt = struct.unpack("<Q", data[pos + 4:pos + 12])[0]
            if cnt > _GGUF_MAX_ARR:
                raise KernelError("gguf: array element cap exceeded")
            pos += 12
            for _ in range(cnt):
                _, pos = read_value(pos, etyp, depth + 1)
            return None, pos  # arrays skipped, only walked for position
        raise KernelError(f"gguf: unknown value type {typ}")

    for _ in range(n_kv):
        key, pos = _gguf_str(data, pos)
        if pos + 4 > len(data):
            raise KernelError("gguf: truncated KV type")
        typ = struct.unpack("<I", data[pos:pos + 4])[0]
        pos += 4
        val, pos = read_value(pos, typ)
        if key == "general.architecture" and isinstance(val, str):
            m.arch = val
        elif key == "general.name" and isinstance(val, str):
            m.name = val
        elif (val is not None and key.startswith("general.")
              and len(m.fields) < 32):
            m.fields[f"gguf-{key}"] = str(val)
    return m
