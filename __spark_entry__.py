"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over sparktika.queries — the engine-owned catalog where each
Spark implementation lives next to its lockstep DuckDB oracle. Entries
without an oracle (minhash/simhash LSH, ANN, winnowing, media decode,
partition lineage) are approximate/seeded/scheduler-dependent by nature
and are exactness-tested in pytest instead (see tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction over the synthetic Common-Crawl-style
    corpus at sf0.001 — MIME routing, charset decode, HTML/PDF kernels,
    safety statuses — returning one row per page."""
    from pyspark.sql import functions as F

    from sparktika.pipeline.extract import extract_pages
    from sparktika.synth import SYNTH_CONFIG, synth_pages

    pages = synth_pages(spark, "/root/testdata/sf0.001")
    ext = extract_pages(pages, SYNTH_CONFIG)
    return ext.select(
        "url",
        "content_type_detected",
        "charset_detected",
        "status",
        "n_bytes_in",
        "n_chars_out",
        F.sha2(F.coalesce(F.col("text_extracted"), F.lit("")), 256).alias("text_sha"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparktika.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from sparktika.queries import all_oracles

    return all_oracles()
