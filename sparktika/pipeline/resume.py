"""Checkpoint-resume bookkeeping: anti-join pages against committed keys.

The engine's unit of progress is the committed output table snapshot (on a
real deployment: an Iceberg snapshot; in the sandbox: a parquet dir). A
re-run extracts only pages whose key is not yet present — `left_anti`
join, which AQE converts to a broadcast anti-join whenever the done-set is
small, and splits skewed keys otherwise (SURVEY.md §2.B joins).

Key choice is a policy decision: the default `url` treats a committed url
as done forever (a post-commit re-crawl is NOT re-extracted — the job's
semantics); pass `["url", "warc_ts"]` to re-extract newer snapshots of
already-committed urls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pending_pages(pages: DataFrame, done: DataFrame,
                  key: str | list[str] = "url") -> DataFrame:
    """Rows of `pages` whose key (single column or composite) is absent
    from `done`."""
    keys = [key] if isinstance(key, str) else list(key)
    return pages.join(done.select(*keys).distinct(), on=keys, how="left_anti")


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
