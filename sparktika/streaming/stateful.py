"""Custom stateful streaming operator: cross-batch first-seen dedup via
applyInPandasWithState.

The streaming analog of the exact-dedup batch op: each content hash is
emitted exactly once across the lifetime of the stream (earliest
warc_ts within its arrival batch wins); later recrawls are suppressed by
per-key state. State is one byte per distinct hash — bounded by distinct
content, not stream length — and a production deployment would add a
GroupStateTimeout TTL to evict cold hashes.

Scale shape: the stream shuffles once on the state key (content sha),
the same partitioning the batch dedup uses; no document bytes are held
in state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType)

FIRST_SEEN_SCHEMA = StructType([
    StructField("content_sha", StringType()),
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("n_suppressed", LongType()),
])

_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _first_seen_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    (seen,) = state.get if state.exists else (0,)
    total = 0
    best: pd.DataFrame | None = None
    # a big group arrives as MULTIPLE pandas chunks (Arrow batch size), so
    # the batch-earliest row must be selected across ALL of them, not the
    # first non-empty chunk
    for pdf in pdfs:
        if not len(pdf):
            continue
        total += len(pdf)
        if seen == 0:
            # (warc_ts, url) total order: a bare strict warc_ts compare
            # made ties resolve by nondeterministic Arrow chunk arrival
            # (r5 review)
            head = pdf.sort_values(["warc_ts", "url"], kind="stable").head(1)
            if best is None or (
                    (head["warc_ts"].iloc[0], head["url"].iloc[0])
                    < (best["warc_ts"].iloc[0], best["url"].iloc[0])):
                best = head
    emit = seen == 0 and best is not None
    state.update((seen + total,))
    if emit:
        yield pd.DataFrame({
            "content_sha": [key[0]],
            "url": best["url"].tolist(),
            "warc_ts": best["warc_ts"].tolist(),
            "n_suppressed": [total - 1],
        })


def streaming_first_seen(pages_stream: DataFrame) -> DataFrame:
    """pages stream (url, warc_ts, content_sha) -> one row per distinct
    content_sha across ALL micro-batches (state-backed)."""
    return (pages_stream
            .groupBy("content_sha")
            .applyInPandasWithState(
                _first_seen_fn,
                outputStructType=FIRST_SEEN_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
