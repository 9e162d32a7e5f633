"""Unix compress (.Z) codec + .lzma wrapper route tests.

The encoder/decoder pair is validated three ways: self round-trip,
byte-exact agreement with the system `uncompress`/`zcat` CLI (gzip's
unlzw — an independent implementation of the historic format), and
truncation/corruption sweeps that must never yield silent garbage.
"""

import lzma
import os
import random
import shutil
import subprocess
import tempfile

import pytest

from sparktika.kernels.errors import InflateRatioError, KernelError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.zcompress import compress_z, decompress_z

HAVE_ZCAT = shutil.which("zcat") is not None


def _cli_decode(z: bytes) -> bytes:
    with tempfile.NamedTemporaryFile(suffix=".Z", delete=False) as f:
        f.write(z)
        p = f.name
    try:
        out = subprocess.run(["zcat", p], capture_output=True, check=True)
        return out.stdout
    finally:
        os.unlink(p)


def _cases():
    rnd = random.Random(42)
    return [
        b"",
        b"a",
        b"abab" * 4,
        b"hello world\n" * 2000,
        bytes(rnd.randrange(256) for _ in range(5000)),
        b"the quick brown fox jumps over the lazy dog. " * 3000,
        bytes(rnd.randrange(4) for _ in range(70000)),  # deep widths
    ]


@pytest.mark.parametrize("max_bits", [9, 12, 16])
@pytest.mark.parametrize("clear_every", [None, 300])
def test_roundtrip_matrix(max_bits, clear_every):
    for raw in _cases():
        z = compress_z(raw, max_bits=max_bits, clear_every=clear_every)
        assert decompress_z(z, 10 * len(raw) + 1024) == raw


@pytest.mark.skipif(not HAVE_ZCAT, reason="no zcat CLI")
@pytest.mark.parametrize("max_bits", [9, 12, 16])
@pytest.mark.parametrize("clear_every", [None, 300])
def test_cli_cross_validation(max_bits, clear_every):
    # the CLEAR path is the subtle part: group padding is relative to
    # the last flush point, and only CLEARs ever pad (width growths
    # land on exact multiples of 8 codes) — an absolute-position
    # aligner round-trips against itself but zcat rejects it
    for raw in _cases():
        z = compress_z(raw, max_bits=max_bits, clear_every=clear_every)
        assert _cli_decode(z) == raw


def test_truncation_never_garbage():
    raw = b"the quick brown fox. " * 500
    z = compress_z(raw)
    refused = 0
    for cut in range(3, len(z), 7):
        try:
            out = decompress_z(z[:cut], 1 << 22)
        except (KernelError, InflateRatioError):
            refused += 1
            continue
        # .Z carries no checksum: an undetectable truncation must
        # still only ever yield a strict prefix, never garbage
        assert raw.startswith(out)
    assert refused > 0  # severed-code detection does fire


def test_corruption_fuzz_never_garbage_passes_silently():
    raw = b"corpus line for fuzzing. " * 200
    z = bytearray(compress_z(raw, clear_every=60))
    rnd = random.Random(9)
    for _ in range(300):
        i = rnd.randrange(3, len(z))
        orig = z[i]
        z[i] ^= 1 << rnd.randrange(8)
        try:
            decompress_z(bytes(z), 1 << 22)
        except (KernelError, InflateRatioError):
            pass  # refusal is always acceptable
        z[i] = orig


def test_inflate_cap_enforced():
    z = compress_z(b"\x00" * 100000)
    with pytest.raises(InflateRatioError):
        decompress_z(z, 1000)


def test_header_validation():
    with pytest.raises(KernelError):
        decompress_z(b"\x1f\x9e\x90", 100)       # bad magic
    with pytest.raises(KernelError):
        decompress_z(b"\x1f\x9d", 100)           # truncated header
    with pytest.raises(KernelError):
        decompress_z(b"\x1f\x9d\x08", 100)       # max_bits 8 < 9
    with pytest.raises(KernelError):
        decompress_z(b"\x1f\x9d\xd0", 100)       # reserved bit set


def test_dispatcher_routes_z_and_lzma():
    body = (b"<html><title>Z test</title><body><p>Hello from "
            b"compress.</p></body></html>")
    r = extract_document("https://x/doc.html.Z", None, compress_z(body))
    assert r.status == "ok"
    assert r.content_type_detected == "text/html"
    assert r.text_extracted == "Hello from compress.\n"
    assert r.metadata["Content-Encoding-Outer"] == ["compress"]
    assert r.title == "Z test"

    z2 = lzma.compress(b"plain text in lzma alone\n",
                       format=lzma.FORMAT_ALONE)
    r2 = extract_document("https://x/note.txt.lzma", None, z2)
    assert r2.status == "ok"
    assert r2.text_extracted == "plain text in lzma alone\n"
    assert r2.metadata["Content-Encoding-Outer"] == ["lzma"]


def test_dispatcher_truncated_lzma_fails_closed():
    z = lzma.compress(b"x" * 5000, format=lzma.FORMAT_ALONE)
    r = extract_document("https://x/n.txt.lzma", None, z[:-4])
    assert r.status == "failed"


def test_dispatcher_nested_codec_refused():
    import gzip

    r = extract_document("https://x/a.gz.Z", None,
                         compress_z(gzip.compress(b"x" * 100)))
    assert r.status == "failed"
    assert "nested gzip" in (r.error or "")
    # and the other direction: .Z inside gzip
    r2 = extract_document("https://x/a.Z.gz", None,
                          gzip.compress(compress_z(b"y" * 100)))
    assert r2.status == "failed"
    assert "nested compress" in (r2.error or "")


def test_synth_corpus_parity():
    from sparktika.synth import build_legacy_codec_txt

    for i in (0, 1, 2, 3, 6, 7):
        b = build_legacy_codec_txt(i)
        r = extract_document(f"https://x/{i}.txt.z", None, b)
        assert r.status == "ok"
        want = f"Legacy codec note {i} body.\n"
        if i % 3 == 0:
            want += "Grouped filler line for the clear path.\n" * 40
        assert r.text_extracted == want
        assert r.metadata["Content-Encoding-Outer"] == [
            "compress" if i % 2 == 0 else "lzma"]


def test_tar_z_compound_wrapper():
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, body in [("a.txt", b"alpha text\n"),
                           ("b.html",
                            b"<html><body><p>bee</p></body></html>")]:
            ti = tarfile.TarInfo(name)
            ti.size = len(body)
            tf.addfile(ti, io.BytesIO(body))
    r = extract_document("https://x/bundle.tar.Z", None,
                         compress_z(buf.getvalue()))
    assert r.status == "ok"
    assert r.content_type_detected == "application/x-tar"
    assert r.metadata["Content-Encoding-Outer"] == ["compress"]
    assert r.text_extracted == "alpha text\nbee\n"


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=20000),
       st.sampled_from([9, 12, 16]),
       st.sampled_from([None, 100]))
def test_property_roundtrip(raw, mb, ce):
    z = compress_z(raw, max_bits=mb, clear_every=ce)
    assert decompress_z(z, 10 * len(raw) + 1024) == raw


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(min_size=1, max_size=4000))
def test_property_cli_agrees(raw):
    if not HAVE_ZCAT:
        return
    z = compress_z(raw, clear_every=50)
    assert _cli_decode(z) == raw
