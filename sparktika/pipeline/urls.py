"""URL normalization / host extraction — crawl-pipeline canonicalization.

Pure built-in regexp columns (whole-stage codegen, zero shuffle). Each
rule is expressible identically in Java regex (Spark) and RE2 (DuckDB),
so the driver oracle matches byte-for-byte; only the replacement-group
syntax differs ($1 vs \\1) between the two engines.

Rules (the conservative, loss-free subset of canonical form):
1. scheme+authority lowercased (path/query case is significant, kept)
2. #fragment stripped
3. default port stripped (:80 for http, :443 for https)
4. utm_* tracking parameters removed, trailing '?'/'&' tidied
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_AUTHORITY = r"^([^/?#]*//[^/?#]*)"


def normalize_url_col(url_col) -> "F.Column":
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    # 1. lowercase scheme:// and host:port; USERINFO stays verbatim —
    # it is case-sensitive per RFC 3986 §3.2.1, and lowercasing it both
    # wrongly merges distinct URLs and breaks re-dereferencing
    # (r5 whole-repo review)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([^/?#]*//)", 1)),
        F.regexp_extract(u, r"^[^/?#]*//([^/?#@]*@)", 1),
        F.lower(F.regexp_extract(
            u, r"^[^/?#]*//(?:[^/?#@]*@)?([^/?#]*)", 1)),
        F.regexp_replace(u, _AUTHORITY, ""))
    # 2. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. default ports (delimiter captured, not looked-ahead: RE2 — the
    # DuckDB oracle's engine — has no lookahead)
    u = F.regexp_replace(u, r"^(http://[^/:?#]*):80([/?#]|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]*):443([/?#]|$)", "$1$2")
    # 4. utm_* params + tidy — anchored to a query delimiter so 'utm_' in a
    # path segment or as a suffix of another parameter name never matches
    u = F.regexp_replace(u, r"([?&])utm_[a-z_]+=[^&#]*", "$1")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]+$", "")
    return u


def host_col(url_col) -> "F.Column":
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.regexp_extract(u, r"^[^/?#]*//([^/:?#]*)", 1))


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    return (df
            .withColumn("url_norm", normalize_url_col(url_col))
            .withColumn("host", host_col(url_col)))
