"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as `binary` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sample run
as Arrow-batched kernels over mapInPandas. `decode_image` is REAL for
PNG and BMP (pure-Python kernels/image.py: zlib IDAT inflate behind the
bomb-ratio guard, scanline unfiltering, palette/alpha handling) and
returns (width, height, 8 feature floats). JPEG stays honestly stubbed
(a DCT decoder is out of kernel scope in this container) and degrades to
status='stubbed' rows; `use_fake=True` keeps the deterministic hash-based
twin for plumbing tests.
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
    """Decode an image payload to (width, height, 8 features). PNG and BMP
    decode for real (kernels/image.py); JPEG raises NotImplementedError
    (-> status='stubbed'). The deterministic fake twin derives everything
    from a blake2b hash of the payload, so plumbing tests are stable."""
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
                except NotImplementedError as e:
                    # JPEG: pixel decode is stubbed, but the SOF frame header
                    # still yields real dimensions (no DCT needed)
                    from ..kernels.image import jpeg_dimensions

                    dims = jpeg_dimensions(payload)
                    rows.append(dict(media_id=mid, media_type=mtype,
                                     width=dims[0] if dims else None,
                                     height=dims[1] if dims else None,
                                     n_bytes=len(payload),
                                     features=None, status="stubbed", error=str(e)))
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
