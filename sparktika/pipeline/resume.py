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
    window the engine needs, SURVEY.md §2.B). Ties on warc_ts break on
    a content hash (r8 review: without a total order, two recrawls
    sharing a second-granularity timestamp were kept NONDETERMINISTICALLY
    — the survivor could change across task retries/AQE replans, and
    this choice decides which content gets extracted and committed;
    cap_per_host got its total order in r5, this window never did)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), F.xxhash64(F.col("html")).desc())
    return (
        pages.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def cap_per_host(
    pages: DataFrame,
    n_per_host: int = 3,
    host_col=None,
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-host document cap (training-data pipelines bound any single
    domain's contribution; head-heavy crawls make this a top-k-per-key,
    not a filter): keep the newest `n_per_host` snapshots per host.

    Top-k is associative, so SKEW is defused with a two-phase rank: the
    first window partitions by (host, url-salt) — the planted head host
    that owns 50% of urls spreads over `salt_buckets` tasks — and keeps
    n per salted group; the second window ranks the surviving
    <= salt_buckets * n candidates per host, a bounded partition at any
    corpus size. Result (including rn) is identical to the naive
    single-window rank.

    Requires the pages shape (url + warc_ts drive the order and the
    salt) even when host_col overrides host extraction; a SINGLE url
    with massive snapshot counts still concentrates in one phase-1 task
    (run newest_per_url first — re-crawl dedup — to bound that)."""
    from pyspark.sql.window import Window

    if host_col is None:
        # shared extractor (urls.host_col): no trailing-slash
        # requirement (path-less homepages previously ALL collapsed
        # into one '' pseudo-host and were capped together), port
        # stripped, lowercased (r5 whole-repo review)
        from .urls import host_col as _hc

        host_col = _hc("url")
    host = host_col
    order = (F.col("warc_ts").desc(), F.col("url").desc())
    salted = (pages.withColumn("host", host)
              .withColumn("__salt",
                          F.pmod(F.xxhash64("url"), F.lit(salt_buckets))))
    w1 = Window.partitionBy("host", "__salt").orderBy(*order)
    cand = (salted.withColumn("rn", F.row_number().over(w1))
            .filter(F.col("rn") <= n_per_host).drop("rn"))
    w2 = Window.partitionBy("host").orderBy(*order)
    return (cand.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= n_per_host)
            .drop("__salt"))
