"""Standard MIDI File kernel tests."""

import random

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.midi import build_midi, parse_midi
from sparktika.synth import build_midi_song


def test_tracks_names_lyrics_and_running_status():
    m = build_midi([
        {"name": "Piano", "copyright": "(c) Example", "notes": 4},
        {"name": "Vocals", "lyrics": ["He", "llo ", "wor", "ld"],
         "notes": 2},
    ])
    r = parse_midi(m)
    assert r.n_tracks == 2
    assert r.track_names == ["Piano", "Vocals"]
    assert r.copyright == "(c) Example"
    assert r.text == "Piano\nVocals\nHello world\n"


def test_text_meta_event_type_01():
    # type 0x01 text events join with lyrics in event order
    ev = (b"\x00\xff\x01\x05hello" + b"\x00\xff\x05\x06 world"
          + b"\x00\xff\x2f\x00")
    m = (b"MThd" + (6).to_bytes(4, "big") + b"\x00\x00\x00\x01\x01\xe0"
         + b"MTrk" + len(ev).to_bytes(4, "big") + ev)
    r = parse_midi(m)
    assert r.text == "hello world\n"
    assert r.format == 0


def test_unknown_chunk_skipped():
    inner = build_midi([{"name": "T", "notes": 1}])
    # splice an alien chunk between MThd and MTrk
    alien = b"XFIH" + (4).to_bytes(4, "big") + b"\x00" * 4
    m = inner[:14] + alien + inner[14:]
    r = parse_midi(m)
    assert r.track_names == ["T"]


def test_malformed_refuses():
    with pytest.raises(KernelError):
        parse_midi(b"MThd\x00\x00\x00\x06\x00\x09")       # truncated
    with pytest.raises(KernelError):
        parse_midi(b"RIFF" + b"\x00" * 20)                  # bad magic
    good = bytearray(build_midi([{"name": "T", "notes": 2}]))
    good[-3] = 0x99  # clobber end-of-track meta into a dangling event
    # either refuses or parses the remainder — must not hang or crash
    try:
        parse_midi(bytes(good))
    except KernelError:
        pass


def test_dispatcher_and_fuzz():
    r = extract_document("https://x/s.mid", None, build_midi_song(0))
    assert r.status == "ok"
    assert r.content_type_detected == "audio/midi"
    rnd = random.Random(23)
    data = bytearray(build_midi_song(7))
    for _ in range(100):
        i = rnd.randrange(len(data))
        orig = data[i]
        data[i] = rnd.randrange(256)
        rr = extract_document("https://x/s.mid", None, bytes(data))
        assert rr.status in ("ok", "failed", "unsupported", "truncated")
        data[i] = orig


def test_synth_parity():
    for i in (0, 1, 5, 6):
        r = extract_document(f"https://x/{i}.mid", None, build_midi_song(i))
        assert r.status == "ok"
        want = (f"Melody {i}\nWords {i}\nMidi lyric {i} line.\n")
        assert r.text_extracted == want
        assert (r.metadata.get("midi-copyright") is not None) == (i % 6 == 0)
