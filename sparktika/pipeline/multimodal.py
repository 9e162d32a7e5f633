"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as `binary` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sample run
as Arrow-batched kernels over mapInPandas. `decode_image` is REAL for
PNG, BMP, GIF and baseline JPEG (pure-Python kernels/image.py: zlib IDAT
inflate behind the bomb-ratio guard, scanline unfiltering, LZW, Huffman
entropy decode + IDCT) and returns (width, height, 8 feature floats).
Progressive (SOF2) JPEG is fully decoded too (kernels/image.py spectral
selection + successive approximation); only arithmetic-coded JPEG
degrades to a status='failed' row. `use_fake=True` keeps the
deterministic hash-based twin for plumbing tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("media_type", T.StringType()),     # image/jpeg, audio/x-wav, ...
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
    T.StructField("status", T.StringType()),
    T.StructField("error", T.StringType()),
])


def decode_image(payload: bytes, use_fake: bool = False) -> tuple[int, int, list[float]]:
    """Decode an image payload to (width, height, 8 features). PNG, BMP,
    GIF and baseline JPEG decode for real (kernels/image.py). The
    deterministic fake twin derives everything from a blake2b hash of the
    payload, so plumbing tests are stable."""
    if use_fake:
        h = hashlib.blake2b(payload, digest_size=20).digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        feats = [round(b / 255.0, 6) for b in h[2:10]]
        return width, height, feats
    from ..kernels.image import decode_any, image_features

    img = decode_any(payload)
    return img.width, img.height, image_features(img)


def make_feature_fn(use_fake: bool = False, n_features: int = 8):
    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(pdf["media_id"], pdf["payload"], pdf["media_type"]):
                payload = payload or b""
                try:
                    w, h, feats = decode_image(payload, use_fake=use_fake)
                    rows.append(dict(media_id=mid, media_type=mtype, width=w,
                                     height=h, n_bytes=len(payload),
                                     features=feats, status="ok", error=None))
                except Exception as e:  # poisoned payloads degrade to rows
                    rows.append(dict(media_id=mid, media_type=mtype, width=None,
                                     height=None, n_bytes=len(payload),
                                     features=None, status="failed",
                                     error=f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows)

    return feature_batches


def extract_media_features(df: DataFrame, use_fake: bool = False,
                           num_partitions: int | None = None) -> DataFrame:
    """media table -> per-item features. Same physical policy as page
    extraction: salted repartition (payload bytes skew), Arrow batches,
    per-row failure containment."""
    slim = df.select("media_id", "payload", "media_type")
    if num_partitions:
        slim = slim.repartition(num_partitions, F.xxhash64("media_id"))
    return slim.mapInPandas(make_feature_fn(use_fake), FEATURES_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("aspect", T.DoubleType()),
    T.StructField("status", T.StringType()),
    T.StructField("error", T.StringType()),
])


def image_stats(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Decode to native dimensions + per-channel means + aspect ratio, all
    as doubles (oracle-comparable: solid synth images make every mean an
    exact color/255 rational — CLAUDE.md invariant 10). Covers the full
    decoder matrix incl. baseline JPEG (gray / 4:4:4 / 4:2:0)."""
    from ..kernels.image import decode_any

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode_any(payload or b"")
                    means = img.pixels.astype(np.float64).mean(axis=(0, 1)) / 255.0
                    rows.append(dict(
                        media_id=mid, width=img.width, height=img.height,
                        mean_r=round(float(means[0]), 6),
                        mean_g=round(float(means[1]), 6),
                        mean_b=round(float(means[2]), 6),
                        aspect=round(img.width / img.height, 6),
                        status="ok", error=None))
                except Exception as e:
                    rows.append(dict(media_id=mid, width=None, height=None,
                                     mean_r=None, mean_g=None, mean_b=None,
                                     aspect=None, status="failed",
                                     error=f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows)

    slim = df.select("media_id", "payload")
    if num_partitions:
        slim = slim.repartition(num_partitions, F.xxhash64("media_id"))
    return slim.mapInPandas(batches, IMAGE_STATS_SCHEMA)


PDF_IMAGE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("image_idx", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("status", T.StringType()),
])


def pdf_image_stats(df: DataFrame,
                    num_partitions: int | None = None) -> DataFrame:
    """PDF image XObject payload emission (Tika includeImages parity,
    ref main/TikaForkMain.java:98,307-311): one row per decoded embedded
    image, in object order, with the same exact-rational channel means
    as image_stats. A PDF that fails to parse yields one failed row; a
    PDF whose images are all undecodable yields none (they are still
    counted in pdf:image-count by the text route)."""
    from ..kernels.pdf import extract_pdf

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    r = extract_pdf(payload or b"", include_images=True,
                                    collect_embedded=False)
                except Exception:
                    rows.append(dict(doc_id=did, image_idx=None, width=None,
                                     height=None, mean_r=None, mean_g=None,
                                     mean_b=None, status="failed"))
                    continue
                for idx, (_num, img) in enumerate(r.images):
                    means = (img.pixels.astype(np.float64).mean(axis=(0, 1))
                             / 255.0)
                    rows.append(dict(
                        doc_id=did, image_idx=idx,
                        width=img.width, height=img.height,
                        mean_r=round(float(means[0]), 6),
                        mean_g=round(float(means[1]), 6),
                        mean_b=round(float(means[2]), 6),
                        status="ok"))
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object")
                 for f in PDF_IMAGE_SCHEMA.fields})

    slim = df.select("doc_id", "payload")
    if num_partitions:
        slim = slim.repartition(num_partitions, F.xxhash64("doc_id"))
    return slim.mapInPandas(batches, PDF_IMAGE_SCHEMA)


AUDIO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("dc_mean", T.DoubleType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("status", T.StringType()),
    T.StructField("error", T.StringType()),
])


def extract_audio_features(df: DataFrame,
                           num_partitions: int | None = None) -> DataFrame:
    """audio table (media_id, payload) -> per-item features via the PCM WAV
    kernel. Same physical policy as images: Arrow batches, per-row failure
    containment, optional salted repartition."""
    from ..kernels.audio import audio_features, decode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                base = dict(media_id=mid, n_bytes=len(payload), error=None)
                try:
                    feats = audio_features(decode_wav(payload))
                    rows.append(dict(base, status="ok", **feats))
                except Exception as e:
                    rows.append(dict(base, sample_rate=None, n_channels=None,
                                     duration_ms=None, rms=None, peak=None,
                                     dc_mean=None, status="failed",
                                     error=f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows)

    slim = df.select("media_id", "payload")
    if num_partitions:
        slim = slim.repartition(num_partitions, F.xxhash64("media_id"))
    return slim.mapInPandas(batches, AUDIO_SCHEMA)


VIDEO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("n_tracks", T.IntegerType()),
    T.StructField("track_kinds", T.ArrayType(T.StringType())),
    T.StructField("brand", T.StringType()),
    T.StructField("codec", T.StringType()),
    T.StructField("codec_profile", T.StringType()),
    T.StructField("codec_level", T.StringType()),
    T.StructField("coded_width", T.IntegerType()),
    T.StructField("coded_height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("status", T.StringType()),
    T.StructField("error", T.StringType()),
])


def extract_video_meta(df: DataFrame,
                       num_partitions: int | None = None) -> DataFrame:
    """video table (media_id, payload) -> container metadata via the ISO
    BMFF box walker (metadata needs no codec decode; frame decode is
    sample_video_frames, real for MJPEG tracks)."""
    from ..kernels.video import parse_mp4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                base = dict(media_id=mid, n_bytes=len(payload), error=None)
                try:
                    m = parse_mp4(payload)
                    rows.append(dict(base, width=m.width, height=m.height,
                                     duration_ms=m.duration_ms,
                                     n_tracks=m.n_tracks,
                                     track_kinds=m.track_kinds,
                                     brand=m.brand,
                                     codec=m.codec or None,
                                     codec_profile=m.codec_profile or None,
                                     codec_level=m.codec_level or None,
                                     coded_width=m.coded_width or None,
                                     coded_height=m.coded_height or None,
                                     status="ok"))
                except Exception as e:
                    rows.append(dict(base, width=None, height=None,
                                     duration_ms=None, n_tracks=None,
                                     track_kinds=None, brand=None,
                                     codec=None, codec_profile=None,
                                     codec_level=None, coded_width=None,
                                     coded_height=None,
                                     status="failed",
                                     error=f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows)

    slim = df.select("media_id", "payload")
    if num_partitions:
        slim = slim.repartition(num_partitions, F.xxhash64("media_id"))
    return slim.mapInPandas(batches, VIDEO_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("status", T.StringType()),
    T.StructField("error", T.StringType()),
])


def sample_video_frames(df: DataFrame, every_n: int = 30,
                        num_partitions: int | None = None) -> DataFrame:
    """video table (media_id, payload) -> one row per sampled frame.
    REAL decode for Motion-JPEG tracks (stsd/stsz/stsc/stco walk + per-
    frame JPEG decode); inter-coded codecs degrade to status='failed'
    rows. Output explodes (frames >= videos), so the op stays a
    mapInPandas flatMap — no shuffle is introduced."""
    from ..kernels.video import sample_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    for idx, w, h, mean_r in sample_frames(payload or b"",
                                                           every_n):
                        rows.append(dict(media_id=mid, frame_index=idx,
                                         width=w, height=h, mean_r=mean_r,
                                         status="ok", error=None))
                except Exception as e:
                    rows.append(dict(media_id=mid, frame_index=None,
                                     width=None, height=None, mean_r=None,
                                     status="failed",
                                     error=f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows)

    slim = df.select("media_id", "payload")
    if num_partitions:
        slim = slim.repartition(num_partitions, F.xxhash64("media_id"))
    return slim.mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("status", T.StringType()),
    T.StructField("error", T.StringType()),
])


def resize_media(df: DataFrame, out_w: int, out_h: int,
                 num_partitions: int | None = None) -> DataFrame:
    """Decode + nearest-neighbor resize + channel means — the thumbnail
    stage of a media pipeline, end-to-end real for PNG/BMP/GIF."""
    from ..kernels.image import decode_any, resize_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = resize_image(decode_any(payload or b""), out_w, out_h)
                    means = img.pixels.astype(np.float64).mean(axis=(0, 1)) / 255.0
                    rows.append(dict(media_id=mid, width=img.width,
                                     height=img.height,
                                     mean_r=round(float(means[0]), 6),
                                     mean_g=round(float(means[1]), 6),
                                     mean_b=round(float(means[2]), 6),
                                     status="ok", error=None))
                except Exception as e:
                    rows.append(dict(media_id=mid, width=None, height=None,
                                     mean_r=None, mean_g=None, mean_b=None,
                                     status="failed",
                                     error=f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows)

    slim = df.select("media_id", "payload")
    if num_partitions:
        slim = slim.repartition(num_partitions, F.xxhash64("media_id"))
    return slim.mapInPandas(batches, RESIZE_SCHEMA)


CONTAINER_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("container", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("video_codec", T.StringType()),
    T.StructField("audio_codec", T.StringType()),
    T.StructField("fps", T.DoubleType()),
    T.StructField("n_tracks", T.IntegerType()),
    T.StructField("status", T.StringType()),
    T.StructField("error", T.StringType()),
])


def extract_container_meta(df: DataFrame,
                           num_partitions: int | None = None) -> DataFrame:
    """video table (media_id, payload) -> WebM/Matroska (EBML walk) or
    AVI (RIFF walk) header metadata; same map-only shape as
    extract_video_meta (the MP4 twin)."""
    from ..kernels.video import parse_avi, parse_webm

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                base = dict(media_id=mid, error=None)
                try:
                    if payload[:4] == b"\x1aE\xdf\xa3":
                        m = parse_webm(payload)
                        rows.append(dict(
                            base, container=m.doctype, width=m.width,
                            height=m.height, duration_ms=m.duration_ms,
                            video_codec=m.video_codec,
                            audio_codec=m.audio_codec, fps=None,
                            n_tracks=m.n_tracks, status="ok"))
                    else:
                        a = parse_avi(payload)
                        rows.append(dict(
                            base, container="avi", width=a.width,
                            height=a.height, duration_ms=a.duration_ms,
                            video_codec=a.video_codec,
                            audio_codec=("pcm" if a.audio_streams
                                         else None),
                            fps=a.fps, n_tracks=a.n_streams,
                            status="ok"))
                except Exception as e:
                    rows.append(dict(
                        base, container=None, width=None, height=None,
                        duration_ms=None, video_codec=None,
                        audio_codec=None, fps=None, n_tracks=None,
                        status="failed", error=f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows)

    slim = df.select("media_id", "payload")
    if num_partitions:
        slim = slim.repartition(num_partitions, F.xxhash64("media_id"))
    return slim.mapInPandas(batches, CONTAINER_SCHEMA)
