"""Crawl-frontier filtering: apply robots.txt rules to a URL table.

The distributed half of kernels/robots.py: a fetch frontier of
billions of candidate URLs must drop the robots-disallowed ones. Shape
chosen for 100 TB:

- robots documents are PER-HOST and tiny — parse them (kernel) and
  explode to (host, rule_type, prefix) rows, then BROADCAST; the URL
  table never shuffles;
- RFC 9309 precedence — the longest matching rule wins (octets of the
  rule path, wildcards counted), allow wins ties — resolves ROW-LOCALLY:
  each host's rules are pre-sorted by precedence inside the broadcast
  array, so a URL's verdict is its first matching element (higher-order
  filter + get). No join fan-out, no window, no Exchange of URL rows —
  and the operator is STATELESS per row, so it composes unchanged with
  Structured Streaming frontiers (pytest-pinned).
- RFC 9309 §2.2.3 special characters: '*' in a rule path matches any
  span of octets; a TRAILING '$' anchors the match at the end of the
  path. Wildcard rules are translated ONCE (on the tiny broadcast
  side) to anchored Java regexes; literal rules keep the cheap
  startswith path, so the common case never pays regex cost.

A URL with no matching rule (or no robots entry for its host) is
allowed, per the RFC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# escape every Java-regex metacharacter EXCEPT '*' (handled as the RFC
# wildcard afterwards); includes backslash itself
_META_CLASS = r"([\\^$.|?+(){}\[\]])"


_MAX_WILDCARDS = 3


def _rule_regex(prefix):
    """Column expr: translate an RFC 9309 rule path (with '*' wildcards
    and an optional trailing '$' anchor) into an anchored Java regex.
    Evaluated only on the broadcast rules side.

    Backtracking guard (invariant 7 — robots.txt is untrusted): a
    sequential-``.*`` Java regex backtracks O(n^(k-1)) against a
    failing n-char path, so a crafted rule with many '*'s could hang
    an executor. Runs of '*' collapse to one (RFC-identical), and a
    rule still carrying more than 3 wildcards is WIDENED to a prefix
    match on its literal head (``^head.*``) — a strict superset of the
    true rule, so precedence still sees it, erring toward matching
    (for disallow rules, the conservative crawl direction; real-world
    rules carry 1-2 wildcards). With k <= 3 the worst case is
    ~O(n^2 * m) per evil pair — bounded."""
    anchored = prefix.endswith("$")
    body = F.when(anchored,
                  prefix.substr(F.lit(1), F.length(prefix) - 1)
                  ).otherwise(prefix)
    body = F.regexp_replace(body, r"\*{2,}", "*")
    n_wild = F.length(body) - F.length(F.regexp_replace(body, r"\*", ""))
    esc = F.regexp_replace(body, _META_CLASS, r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    full = F.concat(F.lit("^"), wild,
                    F.when(anchored, F.lit("$")).otherwise(F.lit("")))
    head_esc = F.regexp_replace(
        F.substring_index(body, "*", 1), _META_CLASS, r"\\$1")
    widened = F.concat(F.lit("^"), head_esc, F.lit(".*"))
    return F.when(n_wild > _MAX_WILDCARDS, widened).otherwise(full)


def robots_filter(urls: DataFrame, rules: DataFrame,
                  keep_denied: bool = False) -> DataFrame:
    """urls: (url, host, path, ...); rules: (host, rule_type
    'allow'|'disallow', prefix). Returns urls + `allowed` boolean,
    filtered to allowed unless keep_denied. Duplicate input rows are
    preserved.

    Shuffle-free by construction (r8 review: the previous shape ranked
    precedence with a Window over a per-row id, whose Exchange
    round-tripped EVERY url row — the exact cost the broadcast design
    claims to avoid): rules aggregate per host into an array SORTED by
    RFC 9309 precedence (longest rule first, allow wins ties) on the
    tiny broadcast side; each URL then takes the FIRST matching element
    row-locally (higher-order filter + element_at). The urls side never
    leaves its input partitioning — plan-pinned zero Exchange."""
    # sort key: ascending sort_array => negate length for longest-first;
    # allow (0) before disallow (1) on ties (RFC 9309 §2.2.2)
    rule_struct = F.struct(
        (-F.length("prefix")).alias("_negplen"),
        F.when(F.col("rule_type") == "allow", 0).otherwise(1)
         .alias("_arank"),
        F.col("rule_type").alias("rtype"),
        (F.col("prefix").contains("*")
         | F.col("prefix").endswith("$")).alias("wild"),
        _rule_regex(F.col("prefix")).alias("re"),
        F.col("prefix").alias("prefix"))
    per_host = (rules.groupBy("host")
                .agg(F.sort_array(F.collect_list(rule_struct))
                     .alias("_rules")))
    joined = urls.join(F.broadcast(per_host), "host", "left")
    path = F.col("path")
    matched = F.filter(
        F.col("_rules"),
        lambda r: F.when(r["wild"], F.regexp_like(path, r["re"]))
                   .otherwise(path.startswith(r["prefix"])))
    best = F.get(matched, 0)  # NULL (never ANSI error) when no match
    out = (joined.withColumn(
               "allowed",
               F.coalesce(best["rtype"] != "disallow", F.lit(True)))
           .drop("_rules"))
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
