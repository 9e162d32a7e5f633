"""GGUF / SafeTensors / NumPy .npy kernel tests: header walks, typed
KV decode, magic-less gating, bomb caps, invariant-7 fuzz."""

import json
import random
import struct

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.mime import detect_mime
from sparktika.kernels.tensors import (is_safetensors, parse_gguf,
                                       parse_npy, parse_safetensors)
from sparktika.synth import build_tensor_artifact


def test_npy_header_and_params():
    m = parse_npy(build_tensor_artifact(3))
    assert m.dtype == "<i8"
    assert m.total_params == 20
    assert m.fields["npy-shape"] == "(4, 5)"
    # v2 header (u32 length)
    hdr = b"{'descr': '<f8', 'fortran_order': True, 'shape': (3,), }\n"
    v2 = b"\x93NUMPY\x02\x00" + struct.pack("<I", len(hdr)) + hdr
    m2 = parse_npy(v2)
    assert m2.total_params == 3 and m2.fields["npy-fortran-order"] == "True"


def test_npy_header_is_literal_only():
    # code in the header dict must fail the literal_eval, never run
    evil = b"{'descr': __import__('os').getcwd(), 'shape': (1,)}\n"
    raw = b"\x93NUMPY\x01\x00" + struct.pack("<H", len(evil)) + evil
    with pytest.raises(KernelError, match="unparseable"):
        parse_npy(raw)


def test_safetensors_params_and_metadata():
    m = parse_safetensors(build_tensor_artifact(4))
    assert m.n_tensors == 2 and m.total_params == 64
    assert m.dtype == "F32" and m.name == "model 4"


def test_safetensors_gate_rejects_lookalikes():
    # 8 random bytes + '{' but no spec key
    assert not is_safetensors(struct.pack("<Q", 20) + b'{"a": 1}' + b"x" * 20)
    # declared header longer than the file
    assert not is_safetensors(struct.pack("<Q", 1 << 40) + b"{}")
    assert is_safetensors(build_tensor_artifact(1))
    assert detect_mime(build_tensor_artifact(1)) \
        == "application/x-safetensors"


def test_gguf_kvs_and_array_skip():
    m = parse_gguf(build_tensor_artifact(2))
    assert m.arch == "llama" and m.name == "model 2"
    assert m.n_tensors == 2
    assert m.fields["gguf-general.quantization_version"] == "2"
    # the tokenizer array KV was walked (position advanced), not stored
    assert not any("tokens" in k for k in m.fields)


def test_gguf_caps():
    bad = bytearray(build_tensor_artifact(2))
    struct.pack_into("<Q", bad, 16, 10_000)  # kv count bomb
    with pytest.raises(KernelError, match="cap"):
        parse_gguf(bytes(bad))
    with pytest.raises(KernelError, match="version"):
        parse_gguf(b"GGUF" + struct.pack("<I", 999) + b"\x00" * 16)


def test_dispatcher_end_to_end():
    for i in range(6):
        r = extract_document(f"u{i}", None, build_tensor_artifact(i))
        assert r.status == "ok"
        assert r.text_extracted == ""  # headers only, no payload read


def test_fuzz_never_raises():
    rng = random.Random(8327)
    for i in range(240):
        base = build_tensor_artifact(i % 12)
        mut = bytearray(base[:rng.randrange(1, len(base))])
        for _ in range(rng.randrange(0, 5)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        r = extract_document("u", None, bytes(mut))
        assert r.status in ("ok", "failed", "unsupported", "truncated")


# ----------------------------------------------------------- djvu/tga

def test_djvu_single_and_bundled():
    from sparktika.kernels.djvu import extract_djvu
    from sparktika.synth import build_djvu_tga

    r = extract_djvu(build_djvu_tga(0))
    assert (r.kind, r.n_pages, r.width, r.height, r.dpi) \
        == ("single", 1, 64, 48, 300)
    r1 = extract_djvu(build_djvu_tga(1))
    assert (r1.kind, r1.n_pages) == ("bundled", 3)


def test_djvu_refusals():
    from sparktika.kernels.djvu import extract_djvu, is_djvu

    assert not is_djvu(b"AT&T but not a form at all" + b"\x00" * 20)
    with pytest.raises(KernelError):
        extract_djvu(b"AT&TFORM\x00\x00\x00\x08DJVUXXXX\x00\x00\x00\x00")


def test_tga_footer_gate_and_dims():
    from sparktika.kernels.image import is_tga, tga_dimensions
    from sparktika.synth import build_djvu_tga

    d = build_djvu_tga(2)
    assert is_tga(d) and tga_dimensions(d) == (192, 144)
    # no footer -> never claimed (TGA has no leading magic)
    assert not is_tga(d[:-18])
    assert detect_mime(d[:-18]) != "image/x-tga"


def test_djvu_tga_fuzz_never_raises():
    from sparktika.synth import build_djvu_tga

    rng = random.Random(8328)
    for i in range(150):
        base = build_djvu_tga(i % 9)
        mut = bytearray(base[:rng.randrange(1, len(base))])
        for _ in range(rng.randrange(0, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        r = extract_document("u", None, bytes(mut))
        assert r.status in ("ok", "failed", "unsupported", "truncated")
