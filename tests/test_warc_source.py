"""WARC kernel + Spark source tests over synthesized archives."""

from __future__ import annotations

import gzip
import tempfile
from pathlib import Path

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.warc import parse_warc


def _warc_record(wtype: str, uri: str | None, payload: bytes,
                 date: str = "2026-01-01T00:00:00Z") -> bytes:
    headers = [f"WARC/1.0", f"WARC-Type: {wtype}", f"WARC-Date: {date}"]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    headers.append(f"Content-Length: {len(payload)}")
    return ("\r\n".join(headers) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def _http_response(body: bytes, ct: str = "text/html", chunked: bool = False) -> bytes:
    if chunked:
        chunks = b""
        for i in range(0, len(body), 16):
            part = body[i : i + 16]
            chunks += f"{len(part):x}\r\n".encode() + part + b"\r\n"
        chunks += b"0\r\n\r\n"
        return (f"HTTP/1.1 200 OK\r\nContent-Type: {ct}\r\n"
                "Transfer-Encoding: chunked\r\n\r\n").encode() + chunks
    return (f"HTTP/1.1 200 OK\r\nContent-Type: {ct}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


def _sample_warc() -> bytes:
    return (
        _warc_record("warcinfo", None, b"software: sparktika-test\r\n")
        + _warc_record("request", "https://a.example/x",
                       b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n")
        + _warc_record("response", "https://a.example/x",
                       _http_response(b"<html><body><div>page one</div></body></html>"))
        + _warc_record("response", "https://b.example/y",
                       _http_response(b"chunked body content here", ct="text/plain",
                                      chunked=True))
    )


def test_parse_warc_plain():
    recs = list(parse_warc(_sample_warc()))
    assert [r.target_uri for r in recs] == ["https://a.example/x", "https://b.example/y"]
    assert recs[0].http_content_type == "text/html"
    assert b"page one" in recs[0].body
    assert recs[1].body == b"chunked body content here"  # dechunked


def test_parse_warc_gzip_members():
    raw = _sample_warc()
    # Common Crawl convention: each record its own gzip member
    members = []
    pos = 0
    while pos < len(raw):
        end = raw.find(b"\r\n\r\nWARC/1.0", pos)
        end = len(raw) if end == -1 else end + 4
        members.append(gzip.compress(raw[pos:end]))
        pos = end
    gz = b"".join(members)
    recs = list(parse_warc(gz))
    assert len(recs) == 2
    assert b"page one" in recs[0].body


def test_parse_warc_malformed_raises_kernel_error():
    with pytest.raises(KernelError):
        list(parse_warc(b"NOT A WARC AT ALL\r\n\r\n"))


def test_parse_warc_negative_content_length_rejected():
    """Regression: int() accepts '-3'; a negative length moved next_pos
    backward so the record re-parsed itself up to the record cap."""
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://a.example/x\r\n"
           b"Content-Length: -3\r\n\r\n" + b"body")
    with pytest.raises(KernelError):
        list(parse_warc(rec))


def test_warc_gzip_member_ratio_is_per_member():
    """Regression: the inflate cap used the whole remaining archive's size,
    so an early small bomb member in a big file escaped the ratio guard.
    A ~70KB member inflating to ~67MB (ratio ~1000) must trip the guard
    even when followed by enough legit members to pad the file size."""
    from sparktika.kernels.errors import InflateRatioError

    bomb_payload = b"\x00" * 67_000_000  # inflates ~1000:1
    bomb = gzip.compress(_warc_record("response", "https://bomb.example/",
                                      _http_response(bomb_payload)))
    legit = gzip.compress(_sample_warc())
    # trailing bytes sized so remaining_file * ratio > bomb size — the old
    # whole-file cap would NOT have tripped here
    n_pad = (len(bomb_payload) // 200) // len(legit) + 10
    data = bomb + legit * n_pad
    with pytest.raises(InflateRatioError):
        list(parse_warc(data, max_inflate_ratio=200.0))


def test_warc_spark_source_end_to_end():
    from pyspark.sql import functions as F

    from sparktika.config import ExtractConfig
    from sparktika.pipeline.extract import extract_pages
    from sparktika.pipeline.session import build_session
    from sparktika.pipeline.sources import read_warc_pages

    spark = build_session(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        tmp = Path(tempfile.mkdtemp(prefix="sparktika_warc_"))
        (tmp / "seg1.warc").write_bytes(_sample_warc())
        (tmp / "seg2.warc.gz").write_bytes(gzip.compress(_sample_warc()))
        (tmp / "broken.warc").write_bytes(b"garbage not a warc")

        pages = read_warc_pages(spark, str(tmp))
        rows = pages.collect()
        assert len(rows) == 4  # 2 responses x 2 valid archives; broken skipped

        ext = extract_pages(pages, ExtractConfig())
        out = {r["url"]: r for r in ext.collect()}
        a = [v for k, v in out.items() if "a.example" in k][0]
        assert a["status"] == "ok"
        assert a["text_extracted"] == "page one\n"
        assert a["content_type_detected"] == "text/html"
        b = [v for k, v in out.items() if "b.example" in k][0]
        assert b["text_extracted"] == "chunked body content here"
    finally:
        spark.stop()


def test_warc_errors_side_output(tmp_path):
    """r5 third review: read_warc_pages drops sentinel rows, so broken
    archives MUST be observable via read_warc_errors."""
    from sparktika.pipeline.session import build_session

    spark = build_session(master="local[2]", shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    good = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://x/a\r\n"
            b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 56\r\n"
            b"\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html>ok</html>\r\n\r\n")
    (tmp_path / "good.warc").write_bytes(good)
    (tmp_path / "broken.warc").write_bytes(b"not a warc at all")
    from sparktika.pipeline.sources import read_warc_errors, read_warc_pages

    try:
        pages = read_warc_pages(spark, str(tmp_path / "*.warc"))
        errs = read_warc_errors(spark, str(tmp_path / "*.warc"))
        assert pages.count() >= 1
        rows = errs.collect()
        assert any("broken.warc" in r["source_file"] for r in rows)
    finally:
        spark.stop()
