"""The extraction stage: pages -> pages_extracted via mapInPandas.

Spark-first re-architecture of the reference's process pool
(ref: client/TikaProcessPool.java:110-135): executor task slots replace
pooled JVMs, Arrow batches replace the three-socket protocol, per-row
status columns replace fork-kill isolation.

Physical policy (SURVEY.md §4.2 — the two things Catalyst cannot infer):
1. salted repartition before the kernel: extraction cost is driven by
   sum(bytes) per task, not row count; hashing the unique url spreads
   heavy-tailed hosts uniformly.
2. per-document failure containment inside the vectorized batch: the
   kernel catches per doc, so Spark's unit of retry (the task) never
   trips on a poisoned row.

Oversize rows are short-circuited BEFORE the kernel with a plain column
filter (Catalyst pushes `length(html) > cap` into the scan where the
source supports it); they re-enter the output as status rows via a cheap
union of projections — no second parse.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..kernels.extract import extract_document
from .schema import EXTRACTED_SCHEMA


def _result_to_row(r) -> dict:
    return {
        "url": r.url,
        "content_type_declared": r.content_type_declared,
        "content_type_detected": r.content_type_detected,
        "charset_detected": r.charset_detected,
        "text_extracted": r.text_extracted,
        "main_text": r.main_text,
        "title": r.title,
        "links": [
            {
                "type": l.type,
                "source_uri": l.source_uri,
                "target_uri": l.target_uri,
                "title": l.title,
                "anchor": l.anchor,
                "rel": l.rel,
                "params": l.params,
            }
            for l in r.links
        ],
        "metadata": r.metadata,
        "status": r.status,
        "error": r.error,
        "parse_ms": r.parse_ms,
        "n_bytes_in": r.n_bytes_in,
        "n_chars_out": r.n_chars_out,
        "write_limit_reached": r.write_limit_reached,
    }


def make_extract_fn(cfg: ExtractConfig):
    """Batch-iterator kernel for mapInPandas (the Spark analog of the
    reference's one-doc-per-accept server loop, ref: TikaForkMain.java:118-170,
    but batch-vectorized and cluster-parallel)."""

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            declared = (
                pdf["content_type"] if "content_type" in pdf.columns
                else pd.Series([None] * len(pdf))
            )
            rows = [
                _result_to_row(extract_document(u, ct, d, cfg))
                for u, ct, d in zip(pdf["url"], declared, pdf["html"])
            ]
            yield pd.DataFrame(rows)

    return extract_batches


def extract_pages(
    df: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> DataFrame:
    """pages DataFrame -> pages_extracted DataFrame.

    Column-prunes to (url, html[, content_type]) before the kernel so the
    scan never reads `text`/`lang` (check ReadSchema in .explain).
    """
    cols = ["url", "html"] + (["content_type"] if "content_type" in df.columns else [])
    slim = df.select(*cols)
    if num_partitions:
        # salt by unique url: defuses host-level byte skew (SURVEY.md §4.2)
        slim = slim.repartition(num_partitions, F.xxhash64("url"))
    return slim.mapInPandas(make_extract_fn(cfg), EXTRACTED_SCHEMA)


def extract_pages_with_oversize_shortcircuit(
    df: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> DataFrame:
    """Variant that never ships oversize payloads through Arrow: the size
    filter runs JVM-side and oversize rows join the output as pre-built
    status rows (ref semantics: skipped before parse, SURVEY.md O19)."""
    small = df.filter(F.length("html") <= cfg.max_bytes)
    big = df.filter(F.length("html") > cfg.max_bytes).select(
        F.col("url"),
        F.lit(None).cast("string").alias("content_type_declared"),
        F.lit("application/octet-stream").alias("content_type_detected"),
        F.lit(None).cast("string").alias("charset_detected"),
        F.lit(None).cast("string").alias("text_extracted"),
        F.lit(None).cast("string").alias("main_text"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("array<struct<type:string,source_uri:string,target_uri:string,title:string,anchor:string,rel:string,params:map<string,string>>>").alias("links"),
        F.lit(None).cast("map<string,array<string>>").alias("metadata"),
        F.lit("skipped_oversize").alias("status"),
        F.format_string("document size %d exceeds cap " + str(cfg.max_bytes), F.length("html")).alias("error"),
        F.lit(0).cast("long").alias("parse_ms"),
        F.length("html").cast("long").alias("n_bytes_in"),
        F.lit(0).cast("long").alias("n_chars_out"),
        F.lit(False).alias("write_limit_reached"),
    )
    return extract_pages(small, cfg, num_partitions).unionByName(big)
