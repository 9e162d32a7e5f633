"""Checkpoint-resume bookkeeping: anti-join pages against already-extracted urls.

The engine's unit of progress is the committed output table snapshot (on a
real deployment: an Iceberg snapshot; in the sandbox: a parquet dir). A
re-run extracts only pages whose (url, warc_ts) is not yet present —
`left_anti` join, which AQE converts to a broadcast anti-join whenever the
done-set is small, and splits skewed keys otherwise (SURVEY.md §2.B joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pending_pages(pages: DataFrame, done: DataFrame, key: str = "url") -> DataFrame:
    """Rows of `pages` not yet present in `done` (by key)."""
    return pages.join(done.select(key).distinct(), on=key, how="left_anti")


def newest_per_url(pages: DataFrame) -> DataFrame:
    """Dedup re-crawls: keep the newest snapshot per url
    (row_number over (partition by url order by warc_ts desc) — the one
    window the engine needs, SURVEY.md §2.B)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    return (
        pages.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
