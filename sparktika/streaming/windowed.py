"""Shared batch/streaming transformations + the streaming ingest pipeline.

`hourly_rollup` is written against the DataFrame API only, so the same
function serves the batch oracle query (events_hourly_rollup) and the
Structured Streaming job. The streaming variants add a watermark for
late-data handling and use F.window (which streaming state management
requires) instead of date_trunc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import ExtractConfig
from ..pipeline.extract import extract_pages
from ..pipeline.schema import PAGES_SCHEMA


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1h wall-time rollup; identical results in batch and
    (after watermark completion) streaming."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based session windows per user (the islands problem): a new
    session starts when the inter-event gap exceeds `gap_minutes`. Pure
    window functions — lag to flag session starts, a running sum to
    number them, then one aggregation; the only shuffle partitions by
    user_id, which all three window/agg steps reuse (single Exchange in
    the plan). Gap comparison uses integer microseconds (exact on both
    engines); bounds render as wall-time strings (invariant: never raw
    timestamps across the oracle boundary)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    # pure NTZ wall-clock micros (no session-tz cast: a tz cast would
    # shift DST-straddling gaps and diverge from DuckDB's epoch_us)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    marked = events.select(
        "user_id", "ts", "event_id",
        F.when((us - F.lag(us).over(w)) > gap_us, 1)
         .otherwise(
            F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0))
         .alias("is_new"),
    )
    wcum = (Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sessions = marked.withColumn("session_seq",
                                 F.sum("is_new").over(wcum))
    return (sessions.groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss")
                  .alias("session_start"),
                 F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss")
                  .alias("session_end")))


def sessionize_native(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Same session semantics via Spark's built-in session_window — the
    form Structured Streaming can run incrementally (state store merges
    windows as events arrive; add a watermark upstream for streaming).
    Batch equality with the manual islands version is pinned in pytest;
    only session numbering differs (native windows carry start/end, the
    islands version a per-user ordinal)."""
    return (events.groupBy(
                "user_id",
                F.session_window(F.col("ts"), f"{gap_minutes} minutes").alias("w"))
            .agg(F.count("*").alias("n_events"),
                 F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss")
                  .alias("session_start"),
                 F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss")
                  .alias("session_end"))
            .drop("w"))


def streaming_sessionize(events_stream: DataFrame, gap_minutes: int = 30,
                         watermark: str = "2 hours") -> DataFrame:
    """Streaming session windows: watermarked session_window aggregation —
    state closes (and emits) once the watermark passes a session's gap."""
    return (events_stream.withWatermark("ts", watermark)
            .groupBy("user_id",
                     F.session_window(F.col("ts"), f"{gap_minutes} minutes"))
            .agg(F.count("*").alias("n_events")))


def streaming_hourly_rollup(events_stream: DataFrame,
                            watermark: str = "2 hours") -> DataFrame:
    """Streaming twin with watermarked tumbling windows (late rows beyond
    the watermark are dropped; state is bounded)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("hour_start"), "event_type",
                "n_events", "total_value")
    )


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over an events parquet directory. `ts` is cast
    to TIMESTAMP (watermarks reject TIMESTAMP_NTZ, which Spark 4 infers
    for naive parquet timestamps); the cast keeps the wall time under the
    session timezone."""
    schema = spark.read.parquet(events_dir).schema
    df = spark.readStream.schema(schema).parquet(events_dir)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_extract_pages(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig | None = None,
):
    """Incremental extraction: readStream over a pages directory ->
    mapInArrow kernel -> append sink, exactly-once via checkpoint.
    Returns the StreamingQuery (caller awaits/stops). This is the
    resumable-ingest path: new corpus drops extract incrementally with
    no re-scan of processed files."""
    cfg = cfg or ExtractConfig()
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    extracted = extract_pages(stream, cfg)
    return (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
