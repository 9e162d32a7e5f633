"""WARC (Web ARChive, ISO 28500) record parsing — the container format
Common Crawl actually ships. From scratch, bomb-guarded:

- plain and gzip'd WARCs (per-record gzip members, the CC convention)
- response records yield (target_uri, warc_date, http_content_type, body)
- request/metadata/warcinfo records are skipped
- HTTP payload split at the first CRLFCRLF; chunked transfer encoding is
  decoded (CC stores raw captures)
- guards: per-member inflate ratio cap, record-count cap, malformed
  records terminate the file cleanly (KernelError) without crashing a run
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

from .errors import InflateRatioError, KernelError

MAX_RECORDS = 1_000_000


@dataclass
class WarcRecord:
    target_uri: str | None
    warc_date: str | None
    warc_type: str
    http_content_type: str | None
    body: bytes


def _split_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return headers


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP chunked transfer encoding; returns body unchanged if it
    doesn't look chunked."""
    out = []
    i, n = 0, len(body)
    while i < n:
        eol = body.find(b"\r\n", i)
        if eol == -1:
            return body if not out else b"".join(out)
        size_tok = body[i:eol].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return body if not out else b"".join(out)
        if size == 0:
            break
        chunk = body[eol + 2 : eol + 2 + size]
        out.append(chunk)
        i = eol + 2 + size + 2
    return b"".join(out)


def _gunzip_members(data: bytes, max_ratio: float, max_bytes: int):
    """Yield decompressed gzip members (a .warc.gz is a concatenation of
    independently-gzip'd records).

    The inflate-ratio guard is enforced incrementally against the bytes
    actually fed to the CURRENT member (64 KiB chunks with a 64 KiB floor
    so small legit members aren't penalized) — not against the whole
    remaining file, which would let an early small member inflate up to
    total_file_size * ratio."""
    i, n = 0, len(data)
    chunk_size = 65536
    while i < n - 2:
        if data[i] != 0x1F or data[i + 1] != 0x8B:
            raise KernelError(f"bad gzip member at offset {i}")
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out_parts: list[bytes] = []
        out_len = 0
        fed = 0
        while not d.eof:
            chunk = data[i + fed : i + fed + chunk_size]
            if not chunk:
                break  # truncated member: yield what inflated cleanly
            fed += len(chunk)
            member_cap = min(int(max(fed, 65536) * max_ratio), max_bytes)
            allow = member_cap - out_len
            if allow <= 0:
                raise InflateRatioError("warc gzip member exceeded inflate cap")
            piece = d.decompress(chunk, allow)
            out_len += len(piece)
            out_parts.append(piece)
            if d.unconsumed_tail:
                # output allowance exhausted with compressed input left in
                # this member: per-member ratio exceeded
                raise InflateRatioError("warc gzip member exceeded inflate cap")
        yield b"".join(out_parts)
        consumed = fed - len(d.unused_data)
        if consumed <= 0:
            break
        i += consumed


def _parse_record(stream: bytes, pos: int) -> tuple[WarcRecord | None, int]:
    """Parse one WARC record at pos; returns (record_or_None, next_pos)."""
    # skip inter-record blank lines
    while stream[pos : pos + 2] == b"\r\n":
        pos += 2
    if pos >= len(stream):
        return None, pos
    if not stream.startswith(b"WARC/", pos):
        raise KernelError(f"expected WARC/ header at offset {pos}")
    hdr_end = stream.find(b"\r\n\r\n", pos)
    if hdr_end == -1:
        raise KernelError("truncated WARC record header")
    headers = _split_headers(stream[pos:hdr_end])
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        raise KernelError("WARC record missing Content-Length") from None
    if length < 0:
        # a negative length would move next_pos backward (self-re-parsing
        # loop) and give from-end slice semantics downstream
        raise KernelError(f"negative WARC Content-Length {length}")
    body_start = hdr_end + 4
    payload = stream[body_start : body_start + length]
    next_pos = body_start + length
    if next_pos <= pos:  # forward-progress invariant (bomb posture)
        raise KernelError("WARC record parse made no forward progress")
    wtype = headers.get("warc-type", "unknown")
    uri = headers.get("warc-target-uri")
    date = headers.get("warc-date")
    http_ct = None
    body = payload
    if wtype == "response" and payload[:5] in (b"HTTP/",):
        split = payload.find(b"\r\n\r\n")
        if split != -1:
            http_headers = _split_headers(payload[:split])
            http_ct = http_headers.get("content-type")
            body = payload[split + 4 :]
            if "chunked" in http_headers.get("transfer-encoding", "").lower():
                body = _dechunk(body)
    return WarcRecord(uri, date, wtype, http_ct, body), next_pos


def parse_warc(
    data: bytes,
    max_inflate_ratio: float = 200.0,
    max_member_bytes: int = 1_073_741_824,
    responses_only: bool = True,
):
    """Yield WarcRecords from a .warc or .warc.gz byte buffer."""
    if data[:2] == b"\x1f\x8b":
        streams = _gunzip_members(data, max_inflate_ratio, max_member_bytes)
    else:
        streams = iter([data])
    count = 0
    for stream in streams:
        pos = 0
        while pos < len(stream):
            rec, pos = _parse_record(stream, pos)
            if rec is None:
                break
            count += 1
            if count > MAX_RECORDS:
                raise KernelError("WARC record count exceeded cap")
            if responses_only and rec.warc_type != "response":
                continue
            yield rec
