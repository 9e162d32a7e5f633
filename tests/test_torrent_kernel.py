"""BitTorrent metainfo kernel — BEP-3 bencode walk."""

from __future__ import annotations

import random

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import ExtractConfig, extract_document
from sparktika.kernels.torrent import (
    bencode,
    build_torrent,
    is_torrent,
    parse_torrent,
)
from sparktika.synth import build_torrent_doc


def test_single_and_multi_file():
    r = parse_torrent(build_torrent("a.iso", "http://t/x", length=42))
    assert r.files == [("a.iso", 42)] and r.total_length == 42
    r2 = parse_torrent(build_torrent(
        "pack", "udp://t:80", files=[("d/a", 1), ("b", 2)]))
    assert r2.files == [("d/a", 1), ("b", 2)] and r2.total_length == 3
    assert r2.render_text().endswith("announce udp://t:80\n")


def test_nesting_bomb_capped():
    evil = b"l" * 200 + b"e" * 200
    blob = bencode({"announce": "x", "info": {"name": "n"}})
    with pytest.raises(KernelError):
        parse_torrent(b"d4:infod4:evil" + evil + b"ee")


def test_non_metainfo_dict_refuses():
    blob = bencode({"foo": 1})
    assert not is_torrent(blob + b" " * 16)
    with pytest.raises(KernelError):
        parse_torrent(bencode({"foo": 1, "bar": "x" * 20}))


def test_pieces_measured_not_decoded():
    r = parse_torrent(build_torrent("a", "http://t/x", length=1))
    assert r.pieces_bytes == 20 and r.piece_length == 262144


def test_dispatcher_route():
    r = extract_document("t.torrent", None, build_torrent_doc(2))
    assert r.status == "ok"
    assert r.content_type_detected == "application/x-bittorrent"
    assert r.metadata["title"] == ["pack2.iso"]
    assert r.metadata["torrent-total-bytes"] == ["1002"]


def test_fuzz_never_raises_through_dispatcher():
    rng = random.Random(0x7033)
    seeds = [build_torrent_doc(i) for i in range(4)]
    for _ in range(250):
        base = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        if rng.random() < 0.3:
            base = base[:rng.randrange(len(base))]
        r = extract_document("f.torrent", None, bytes(base),
                             ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")
