"""Avro object-container kernel — framing walk, payloads never decoded."""

from __future__ import annotations

import random

import pytest

from sparktika.kernels.avro import build_avro, is_avro, parse_avro
from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import ExtractConfig, extract_document
from sparktika.synth import build_avro_doc

SCHEMA = {"type": "record", "name": "Ev",
          "fields": [{"name": "id", "type": "long"},
                     {"name": "msg", "type": ["null", "string"]}]}


def test_schema_rendering_and_counts():
    r = parse_avro(build_avro(SCHEMA, [(1, "a"), (2, "b"), (3, "c")]))
    assert r.render_text() == ("record Ev\nfield id : long\n"
                               "field msg : null|string\n")
    assert r.n_records == 3 and r.n_blocks == 2 and r.codec == "null"


def test_complex_types_render():
    sch = {"type": "record", "name": "X", "fields": [
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "kv", "type": {"type": "map", "values": "long"}},
        {"name": "sub", "type": {"type": "record", "name": "Inner",
                                 "fields": []}}]}
    r = parse_avro(build_avro(sch, []))
    assert "field tags : array<string>" in r.render_text()
    assert "field kv : map<long>" in r.render_text()
    assert "field sub : Inner" in r.render_text()


def test_truncated_tail_keeps_prefix_counts():
    full = build_avro(SCHEMA, [(i, "x") for i in range(6)])
    r = parse_avro(full[:-9])
    assert r.truncated_tail
    assert 0 < r.n_records < 6


def test_sync_mismatch_stops_walk():
    b = bytearray(build_avro(SCHEMA, [(1, "a"), (2, "b"), (3, "c")]))
    b[-1] ^= 0xFF                     # corrupt the last sync marker
    r = parse_avro(bytes(b))
    assert r.truncated_tail and r.n_records == 2


def test_dispatcher_route():
    r = extract_document("e.avro", None, build_avro_doc(3))
    assert r.status == "ok"
    assert r.content_type_detected == "application/avro"
    assert r.text_extracted.startswith("record Event3\n")
    assert r.metadata["avro-records"] == ["4"]


def test_not_avro():
    assert not is_avro(b"Obj\x02" + b"\x00" * 40)
    with pytest.raises(KernelError):
        parse_avro(b"\x00" * 64)


def test_fuzz_never_raises_through_dispatcher():
    rng = random.Random(0xA7B0)
    seeds = [build_avro_doc(i) for i in range(4)]
    for _ in range(250):
        base = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        if rng.random() < 0.3:
            base = base[:rng.randrange(len(base))]
        r = extract_document("f.avro", None, bytes(base), ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")
