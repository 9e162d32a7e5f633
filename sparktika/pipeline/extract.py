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


_OUT_COLS = [
    "url", "content_type_declared", "content_type_detected", "charset_detected",
    "text_extracted", "main_text", "title", "links", "metadata", "status",
    "error", "parse_ms", "n_bytes_in", "n_chars_out", "write_limit_reached",
]


def make_extract_fn(cfg: ExtractConfig):
    """Batch-iterator kernel for mapInPandas (the Spark analog of the
    reference's one-doc-per-accept server loop, ref: TikaForkMain.java:118-170,
    but batch-vectorized and cluster-parallel). Output batches are built
    column-wise — per-row dict assembly measurably costs throughput at
    1k-row Arrow batches."""

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            declared = (
                pdf["content_type"] if "content_type" in pdf.columns
                else [None] * len(pdf)
            )
            cols: dict[str, list] = {c: [] for c in _OUT_COLS}
            for u, ct, d in zip(pdf["url"], declared, pdf["html"]):
                r = extract_document(u, ct, d, cfg)
                cols["url"].append(r.url)
                cols["content_type_declared"].append(r.content_type_declared)
                cols["content_type_detected"].append(r.content_type_detected)
                cols["charset_detected"].append(r.charset_detected)
                cols["text_extracted"].append(r.text_extracted)
                cols["main_text"].append(r.main_text)
                cols["title"].append(r.title)
                cols["links"].append([
                    {"type": l.type, "source_uri": l.source_uri,
                     "target_uri": l.target_uri, "title": l.title,
                     "anchor": l.anchor, "rel": l.rel, "params": l.params}
                    for l in r.links
                ])
                cols["metadata"].append(r.metadata)
                cols["status"].append(r.status)
                cols["error"].append(r.error)
                cols["parse_ms"].append(r.parse_ms)
                cols["n_bytes_in"].append(r.n_bytes_in)
                cols["n_chars_out"].append(r.n_chars_out)
                cols["write_limit_reached"].append(r.write_limit_reached)
            yield pd.DataFrame(cols)

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
    filter runs JVM-side; oversize rows keep only their first 1KB (for the
    same MIME sniff the kernel path performs — the two paths must agree,
    see test_oversize_shortcircuit_matches_kernel_path) and rejoin the
    output as status rows (ref semantics: skipped before parse, O19)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    from ..kernels.mime import detect_mime

    has_declared = "content_type" in df.columns
    declared_col = F.col("content_type") if has_declared else F.lit(None).cast("string")

    def sniff(head: pd.Series, declared: pd.Series) -> pd.Series:
        return pd.Series([
            detect_mime(h or b"", d) for h, d in zip(head, declared)
        ])

    sniff_udf = pandas_udf(sniff, StringType())

    small = df.filter(F.length("html") <= cfg.max_bytes)
    big = (
        df.filter(F.length("html") > cfg.max_bytes)
        .select(
            F.col("url"),
            F.length("html").cast("long").alias("n_bytes_in"),
            F.expr("substring(html, 1, 1024)").alias("__head"),
            declared_col.alias("content_type_declared"),
        )
        .select(
            F.col("url"),
            F.col("content_type_declared"),
            sniff_udf(F.col("__head"), F.col("content_type_declared")).alias("content_type_detected"),
            F.lit(None).cast("string").alias("charset_detected"),
            F.lit(None).cast("string").alias("text_extracted"),
            F.lit(None).cast("string").alias("main_text"),
            F.lit(None).cast("string").alias("title"),
            F.lit(None).cast("array<struct<type:string,source_uri:string,target_uri:string,title:string,anchor:string,rel:string,params:map<string,string>>>").alias("links"),
            F.lit(None).cast("map<string,array<string>>").alias("metadata"),
            F.lit("skipped_oversize").alias("status"),
            F.format_string("document size %d exceeds cap " + str(cfg.max_bytes), F.col("n_bytes_in")).alias("error"),
            F.lit(0).cast("long").alias("parse_ms"),
            F.col("n_bytes_in"),
            F.lit(0).cast("long").alias("n_chars_out"),
            F.lit(False).alias("write_limit_reached"),
        )
        .select(*[f.name for f in EXTRACTED_SCHEMA.fields])
    )
    return extract_pages(small, cfg, num_partitions).unionByName(big)
