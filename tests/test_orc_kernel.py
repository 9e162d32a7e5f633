"""ORC footer kernel — from-scratch protobuf wire reader."""

from __future__ import annotations

import random

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import ExtractConfig, extract_document
from sparktika.kernels.orc import build_orc, is_orc, parse_orc
from sparktika.synth import build_orc_doc


def test_schema_rows_stripes_all_codecs():
    for comp, name in ((0, "none"), (1, "zlib"), (2, "snappy")):
        b = build_orc([("id", 4), ("label", 7)], n_rows=11,
                      n_stripes=3, compression=comp)
        r = parse_orc(b)
        assert r.render_text() == ("column id : long\n"
                                   "column label : string\n")
        assert (r.n_rows, r.n_stripes, r.compression) == (11, 3, name)


def test_weak_ascii_magic_not_misrouted():
    junk = b"ORCHESTRA scores were archived in the hall" + bytes([5])
    assert not is_orc(junk)
    from sparktika.kernels.mime import detect_mime

    assert detect_mime(junk, None, "a.orc") != "application/x-orc"


def test_unsupported_footer_codec_refuses():
    b = bytearray(build_orc([("a", 3)], n_rows=1, compression=1))
    # postscript compression field: patch codec 1 -> 5 (zstd)
    # postscript layout: key(1,0) varint key(2,0) codec ...
    ps_len = b[-1]
    ps_at = len(b) - 1 - ps_len
    assert b[ps_at + 2] == 0x10  # key (2,0)
    assert b[ps_at + 3] == 1
    b[ps_at + 3] = 5
    with pytest.raises(KernelError):
        parse_orc(bytes(b))


def test_truncated_footer_refuses():
    b = build_orc([("a", 3)], n_rows=1)
    with pytest.raises(KernelError):
        parse_orc(b[:3] + b[10:])


def test_dispatcher_route():
    r = extract_document("t.orc", None, build_orc_doc(5))
    assert r.status == "ok"
    assert r.content_type_detected == "application/x-orc"
    assert "column v1 : string" in r.text_extracted
    assert r.metadata["orc-rows"] == ["8"]
    assert r.metadata["orc-compression"] == ["snappy"]


def test_fuzz_never_raises_through_dispatcher():
    rng = random.Random(0x09C0)
    seeds = [build_orc_doc(i) for i in range(6)]
    for _ in range(250):
        base = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        if rng.random() < 0.3:
            base = base[:rng.randrange(len(base))]
        r = extract_document("f.orc", None, bytes(base), ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")
