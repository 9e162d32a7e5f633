"""Parquet footer kernel — from-scratch Thrift compact reader."""

from __future__ import annotations

import io
import random
import struct

import pytest

from sparktika.kernels.errors import KernelError
from sparktika.kernels.extract import ExtractConfig, extract_document
from sparktika.kernels.parquetmeta import is_parquet, parse_parquet
from sparktika.synth import build_parquet_doc


def _pq_bytes(table) -> bytes:
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(table, buf)
    return buf.getvalue()


def test_schema_rows_and_groups():
    import pyarrow as pa

    data = _pq_bytes(pa.table({"a": pa.array([1, 2], pa.int32()),
                               "b": pa.array(["x", "y"], pa.string())}))
    r = parse_parquet(data)
    assert r.render_text() == ("column a : int32\n"
                               "column b : binary (utf8)\n")
    assert r.n_rows == 2 and r.n_row_groups == 1
    assert r.created_by and "arrow" in r.created_by


def test_nested_group_renders():
    import pyarrow as pa

    t = pa.table({"s": pa.array([{"x": 1, "y": "a"}],
                                pa.struct([("x", pa.int64()),
                                           ("y", pa.string())]))})
    r = parse_parquet(_pq_bytes(t))
    text = r.render_text()
    assert "group s (2 children)" in text
    assert "column x : int64" in text


def test_multiple_row_groups():
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"a": pa.array(range(100), pa.int64())})
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=30)
    r = parse_parquet(buf.getvalue())
    assert r.n_rows == 100 and r.n_row_groups == 4


def test_real_testdata_footer():
    data = open("/root/testdata/sf0.001/documents.parquet", "rb").read()
    r = parse_parquet(data)
    assert r.n_rows == 500
    assert "column doc_id : int64" in r.render_text()


def test_lying_footer_length_refuses():
    data = bytearray(build_parquet_doc(0))
    struct.pack_into("<I", data, len(data) - 8, len(data))
    with pytest.raises(KernelError):
        parse_parquet(bytes(data))


def test_prefix_only_magic_not_misrouted():
    junk = b"PAR1" + b"\x00" * 100
    assert not is_parquet(junk)
    from sparktika.kernels.mime import detect_mime

    assert detect_mime(junk, None, "a.parquet") != "application/x-parquet"


def test_dispatcher_route():
    r = extract_document("t.parquet", None, build_parquet_doc(3))
    assert r.status == "ok"
    assert r.content_type_detected == "application/x-parquet"
    assert "column v3 : double" in r.text_extracted
    assert r.metadata["parquet-rows"] == ["5"]


def test_fuzz_never_raises_through_dispatcher():
    rng = random.Random(0x9A41)
    seeds = [build_parquet_doc(i) for i in range(3)]
    for _ in range(200):
        base = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        if rng.random() < 0.3:
            base = base[:rng.randrange(len(base))]
        r = extract_document("f.parquet", None, bytes(base),
                             ExtractConfig())
        assert r.status in ("ok", "failed", "truncated", "unsupported")
