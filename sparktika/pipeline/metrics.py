"""Per-partition lineage + run metrics (north rule requirement).

The reference surfaces health only via logs (ref: client/TikaProcess.java:155-166
stdout multiplexing); here metrics are first-class rows computed with a
map-side-combinable aggregation — `groupBy(spark_partition_id())` needs no
extra shuffle beyond the partial-agg exchange, and the per-status summary
is a cheap global rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def partition_metrics(extracted: DataFrame, run_id: str) -> DataFrame:
    """Lineage rows: one per task partition — doc/byte/char counts plus the
    url range the partition covered (FIXTURES.md §3 metrics schema)."""
    return (
        extracted.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("docs_in"),
            # the three buckets PARTITION docs_in (r8 review: truncated/
            # unsupported/oversize docs previously fell in neither ok nor
            # failed, so a lineage row could show zero of each against a
            # large docs_in). truncated IS a successful extraction (the
            # doc produced text up to the cap).
            F.sum((F.col("status").isin("ok", "truncated")).cast("long"))
             .alias("docs_ok"),
            F.sum((F.col("status").isin("failed", "timeout")).cast("long")).alias("docs_failed"),
            F.sum((~F.col("status").isin("ok", "truncated", "failed",
                                         "timeout")).cast("long"))
             .alias("docs_other"),
            F.sum("n_bytes_in").alias("bytes_in"),
            F.sum("n_chars_out").alias("chars_out"),
            F.sum("parse_ms").alias("wall_ms"),
            F.min("url").alias("min_url"),
            F.max("url").alias("max_url"),
        )
        .withColumn("run_id", F.lit(run_id))
        .select("run_id", "partition_id", "docs_in", "docs_ok", "docs_failed",
                "docs_other", "bytes_in", "chars_out", "wall_ms", "min_url",
                "max_url")
    )


def status_summary(extracted: DataFrame) -> DataFrame:
    """Run summary: row counts + byte/char totals per status."""
    return (
        extracted.groupBy("status")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes_in").alias("bytes_in"),
            F.sum("n_chars_out").alias("chars_out"),
        )
        .orderBy("status")
    )
