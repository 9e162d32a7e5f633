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

Oversize rows are short-circuited BEFORE the kernel with a single-scan
JVM-side conditional projection: rows over the size cap ship only a 1KB
sniff head + their true byte count through Arrow and the kernel emits
the skipped_oversize status row — one pass over `html`, no union, no
second scan.
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
            true_sizes = (
                pdf["__n_bytes_full"] if "__n_bytes_full" in pdf.columns
                else [None] * len(pdf)
            )
            cols: dict[str, list] = {c: [] for c in _OUT_COLS}
            for u, ct, d, ts in zip(pdf["url"], declared, pdf["html"], true_sizes):
                # NULL html makes length() NULL -> Arrow int64-with-null
                # -> float NaN in pandas; `ts is None` is False for NaN
                # and int(nan) raised out of the batch, killing the TASK
                # for one poisoned row (r5 review). NaN != NaN test
                # keeps the check cheap and dependency-free.
                if ts is None or ts != ts:
                    ts = None
                r = extract_document(u, ct, d, cfg,
                                     true_size=None if ts is None else int(ts))
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

    Oversize short-circuit is built in, single-scan: a JVM-side conditional
    projection ships the full payload for rows within the size cap but only
    a 1KB sniff head (plus the true byte count) for oversize rows — so the
    100-TB plan reads `html` exactly once, oversize payloads never cross
    Arrow, and the kernel emits the same skipped_oversize status row it
    would for a full payload (ref semantics: skipped before parse, O19).
    """
    cols = ["url", "html"] + (["content_type"] if "content_type" in df.columns else [])
    slim = df.select(*cols)
    if cfg.max_bytes > 0:
        slim = slim.withColumns({
            "__n_bytes_full": F.length("html").cast("long"),
            "html": F.when(F.length("html") <= cfg.max_bytes, F.col("html"))
                     .otherwise(F.expr("substring(html, 1, 1024)")),
        })
    if num_partitions:
        # salt by unique url: defuses host-level byte skew (SURVEY.md §4.2)
        slim = slim.repartition(num_partitions, F.xxhash64("url"))
    return slim.mapInPandas(make_extract_fn(cfg), EXTRACTED_SCHEMA)


def extract_pages_with_oversize_shortcircuit(
    df: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> DataFrame:
    """Kept as a named alias: the oversize short-circuit is now built into
    extract_pages as a single-scan conditional projection (the previous
    two-branch union read the source twice — a full second pass at 100 TB)."""
    return extract_pages(df, cfg, num_partitions)
