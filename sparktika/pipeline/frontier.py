"""Crawl-frontier filtering: apply robots.txt rules to a URL table.

The distributed half of kernels/robots.py: a fetch frontier of
billions of candidate URLs must drop the robots-disallowed ones. Shape
chosen for 100 TB:

- robots documents are PER-HOST and tiny — parse them (kernel) and
  explode to (host, rule_type, prefix) rows, then BROADCAST; the URL
  table never shuffles;
- RFC 9309 precedence — the longest matching prefix wins, allow wins
  ties — is a per-URL argmax over the matched rules: a window over
  (url) ordered by (prefix length desc, allow first) after the
  broadcast join. The join fans out only to the rules a URL actually
  prefix-matches, so the exploded row count stays ~O(urls).

A URL with no matching rule (or no robots entry for its host) is
allowed, per the RFC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_filter(urls: DataFrame, rules: DataFrame,
                  keep_denied: bool = False) -> DataFrame:
    """urls: (url, host, path, ...); rules: (host, rule_type
    'allow'|'disallow', prefix). Returns urls + `allowed` boolean,
    filtered to allowed unless keep_denied."""
    r = F.broadcast(rules.select(
        "host", "rule_type", "prefix",
        F.length("prefix").alias("_plen")))
    joined = urls.join(
        r, (urls["host"] == r["host"])
        & urls["path"].startswith(r["prefix"]), "left") \
        .drop(r["host"])
    w = Window.partitionBy("url").orderBy(
        F.col("_plen").desc_nulls_last(),
        # tie on length: allow wins (RFC 9309 §2.2.2)
        F.when(F.col("rule_type") == "allow", 0).otherwise(1))
    ranked = joined.withColumn("_rk", F.row_number().over(w))
    decided = ranked.where(F.col("_rk") == 1).withColumn(
        "allowed",
        F.coalesce(F.col("rule_type") != "disallow", F.lit(True)))
    out = decided.drop("rule_type", "prefix", "_plen", "_rk")
    return out if keep_denied else out.where("allowed")


def rules_from_robots(robots_texts: list[tuple[str, str]],
                      spark) -> DataFrame:
    """[(host, robots_txt)] -> (host, rule_type, prefix) rows via the
    kernel parser, '*'-group rules only (the pipeline fetches as the
    generic agent). Driver-side: robots sets are per-host tiny and
    broadcast-class by construction."""
    from ..kernels.robots import parse_robots

    rows = []
    for host, text in robots_texts:
        g = parse_robots(text).group_for("*")
        if g is None:
            continue
        rows.extend((host, "disallow", p) for p in g.disallows)
        rows.extend((host, "allow", p) for p in g.allows)
    return spark.createDataFrame(rows, "host string, rule_type string, "
                                       "prefix string")
