"""Golden verification: hash-join extracted text against an expected table.

The engine's byte-identity gate at corpus scale (SURVEY.md §7.1): an
inner equi-join on url comparing sha256(text) — no text bytes move, only
64-hex digests, so verifying 10^12 rows shuffles ~100B/doc. AQE picks
broadcast when the golden side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sha(col):
    # NULL (failed extraction) must NEVER hash equal to '' (a document
    # correctly extracting to empty text) — r5 review: coalesce-to-''
    # let failures verify as matches against empty goldens
    return F.when(col.isNull(), F.lit("<NULL>")).otherwise(
        F.sha2(col, 256))


def verify_text_hashes(
    extracted: DataFrame,
    expected: DataFrame,
    key: str = "url",
    extracted_col: str = "text_extracted",
    expected_col: str = "text_expected",
) -> DataFrame:
    """Per-url verdict rows: (key, match boolean). Join is inner: urls
    missing from either side are reported by verify_summary separately."""
    left = extracted.select(F.col(key), _sha(F.col(extracted_col)).alias("__sha_got"))
    right = expected.select(F.col(key), _sha(F.col(expected_col)).alias("__sha_want"))
    return (
        left.join(right, key)
        .select(key, (F.col("__sha_got") == F.col("__sha_want")).alias("match"))
    )


def verify_summary(
    extracted: DataFrame,
    expected: DataFrame,
    key: str = "url",
    extracted_col: str = "text_extracted",
    expected_col: str = "text_expected",
) -> dict:
    verdicts = verify_text_hashes(extracted, expected, key, extracted_col, expected_col)
    agg = verdicts.agg(
        F.count("*").alias("joined"),
        F.sum(F.col("match").cast("long")).alias("matched"),
    ).collect()[0]
    n_left = extracted.select(key).distinct().count()
    n_right = expected.select(key).distinct().count()
    joined, matched = agg["joined"], agg["matched"] or 0
    return {
        "extracted_urls": n_left,
        "expected_urls": n_right,
        "joined": joined,
        "matched": matched,
        "mismatched": joined - matched,
        "match_rate": round(matched / joined, 6) if joined else None,
    }
