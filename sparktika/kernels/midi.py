"""Standard MIDI File kernel — from scratch.

Tika 1.20 parity: org.apache.tika.parser.audio.MidiParser (javax.sound
.midi under the hood, reached by the reference via tika-parsers:1.20 —
build.gradle) reports track/patch counts and renders embedded text —
lyrics (karaoke files), text and track-name meta events — as the body.
Built from the public Standard MIDI File 1.0 layout:

- 'MThd' + u32 BE 6 + u16 format + u16 ntrks + u16 division;
- per track: 'MTrk' + u32 BE length + events, each a delta-time varint
  followed by a channel message (running status allowed), a sysex
  (F0/F7 + varint length), or a meta event (FF type varint-len data);
- meta types kept: 01 text, 02 copyright, 03 track name, 04 instrument,
  05 lyric, 06 marker.

Text contract (extract_midi_text oracle): per track, the track name
line (if any) then one line holding the concatenated lyric/text chunks
(karaoke lyrics arrive sliced per note — they join without separators,
newlines in the payload stay literal).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .errors import KernelError, check_deadline

_MAX_TRACKS = 256
_MAX_TEXT = 1 << 22


@dataclass
class MidiResult:
    format: int
    n_tracks: int
    division: int
    track_names: list[str] = field(default_factory=list)
    copyright: str | None = None
    text: str = ""


def _varint(data: bytes, pos: int, end: int) -> tuple[int, int]:
    v = 0
    for _ in range(4):
        if pos >= end:
            raise KernelError("midi: truncated varint")
        b = data[pos]
        pos += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos
    raise KernelError("midi: varint longer than 4 bytes")


def parse_midi(data: bytes, deadline: float | None = None) -> MidiResult:
    if data[:4] != b"MThd" or len(data) < 14:
        raise KernelError("midi: bad MThd header")
    hlen = int.from_bytes(data[4:8], "big")
    if hlen < 6:
        raise KernelError("midi: MThd too short")
    fmt = int.from_bytes(data[8:10], "big")
    ntrks = int.from_bytes(data[10:12], "big")
    division = int.from_bytes(data[12:14], "big")
    if fmt > 2 or not 1 <= ntrks <= _MAX_TRACKS:
        raise KernelError(f"midi: implausible header fmt={fmt} ntrks={ntrks}")

    pos = 8 + hlen
    names: list[str] = []
    copyright_: str | None = None
    lines: list[str] = []
    out_chars = 0
    tracks_seen = 0
    while tracks_seen < ntrks and pos + 8 <= len(data):
        check_deadline(deadline, "midi track")
        if data[pos: pos + 4] != b"MTrk":
            # unknown chunk: skip per spec
            clen = int.from_bytes(data[pos + 4: pos + 8], "big")
            pos += 8 + clen
            continue
        tlen = int.from_bytes(data[pos + 4: pos + 8], "big")
        tpos = pos + 8
        tend = tpos + tlen
        if tend > len(data):
            raise KernelError("midi: truncated track chunk")
        name: str | None = None
        chunks: list[str] = []
        running: int | None = None
        while tpos < tend:
            _, tpos = _varint(data, tpos, tend)
            if tpos >= tend:
                raise KernelError("midi: event after last delta")
            b = data[tpos]
            if b == 0xFF:
                if tpos + 2 > tend:
                    raise KernelError("midi: truncated meta event")
                mtype = data[tpos + 1]
                mlen, tpos = _varint(data, tpos + 2, tend)
                if tpos + mlen > tend:
                    raise KernelError("midi: meta event overruns track")
                payload = data[tpos: tpos + mlen]
                tpos += mlen
                if mtype in (0x01, 0x05):
                    chunks.append(payload.decode("latin-1"))
                elif mtype == 0x03 and name is None:
                    name = payload.decode("latin-1").strip()
                elif mtype == 0x02 and copyright_ is None:
                    copyright_ = payload.decode("latin-1").strip()
                elif mtype == 0x2F:
                    break  # end of track
                running = None
            elif b in (0xF0, 0xF7):
                slen, tpos = _varint(data, tpos + 1, tend)
                if tpos + slen > tend:
                    raise KernelError("midi: sysex overruns track")
                tpos += slen
                running = None
            else:
                if b & 0x80:
                    status = b
                    running = status
                    tpos += 1
                elif running is not None:
                    status = running
                else:
                    raise KernelError("midi: data byte without status")
                n_ops = 1 if 0xC0 <= status <= 0xDF else 2
                if 0xF0 <= status:
                    raise KernelError(
                        f"midi: unexpected system status {status:#x}")
                # when running status was used, the first operand is b
                # itself (already at tpos); otherwise operands follow
                tpos += n_ops
                if tpos > tend:
                    raise KernelError("midi: channel event overruns track")
        tracks_seen += 1
        pos = tend
        if name:
            names.append(name)
            lines.append(name)
            out_chars += len(name)
        joined = "".join(chunks)
        if joined:
            lines.append(joined)
            out_chars += len(joined)
        if out_chars > _MAX_TEXT:
            raise KernelError("midi: embedded text exceeds cap")
    if tracks_seen == 0:
        raise KernelError("midi: no MTrk chunks")
    return MidiResult(
        format=fmt, n_tracks=tracks_seen, division=division,
        track_names=names, copyright=copyright_,
        text="".join(ln + "\n" for ln in lines))


def build_midi(tracks: list[dict], fmt: int = 1,
               division: int = 480) -> bytes:
    """Writer for synth/tests. Each track dict: {'name': str|None,
    'lyrics': [str], 'copyright': str|None, 'notes': int} — notes emit
    real channel events incl. a running-status pair."""
    def varint(v: int) -> bytes:
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append(0x80 | (v & 0x7F))
            v >>= 7
        return bytes(reversed(out))

    def meta(mtype: int, payload: bytes) -> bytes:
        return b"\x00\xff" + bytes([mtype]) + varint(len(payload)) + payload

    body_all = b""
    for t in tracks:
        ev = b""
        if t.get("copyright"):
            ev += meta(0x02, t["copyright"].encode("latin-1"))
        if t.get("name"):
            ev += meta(0x03, t["name"].encode("latin-1"))
        for i in range(t.get("notes", 0)):
            note = 60 + i % 12
            ev += b"\x00" + bytes([0x90, note, 100])   # note on
            ev += varint(240) + bytes([note, 0])        # running status off
        for ly in t.get("lyrics", ()):
            ev += meta(0x05, ly.encode("latin-1"))
        ev += b"\x00\xff\x2f\x00"                       # end of track
        body_all += b"MTrk" + len(ev).to_bytes(4, "big") + ev
    hdr = (b"MThd" + (6).to_bytes(4, "big") + fmt.to_bytes(2, "big")
           + len(tracks).to_bytes(2, "big") + division.to_bytes(2, "big"))
    return hdr + body_all
