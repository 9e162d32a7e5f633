"""SparkSession factory with the engine's scale-oriented defaults.

Settings are chosen for the 100TB design point and merely inherited by
local test sessions:
- AQE on (runtime re-planning, skew-join splitting)
- Arrow batches capped by ROWS because extraction cost scales with
  sum(bytes) per batch, not row count (SURVEY.md §4.2) — at an average
  Common-Crawl page of ~100KB, 256 rows ≈ 25MB per Arrow batch
- shuffle partitions sized for local[N]; a cluster deployment overrides
  via spark-submit --conf
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "sparktika",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 256,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(int(cpus) * 2, 8)
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        # Scan-split floor deliberately left at Spark's default (=
        # defaultParallelism): r9 measured a 4x-cores
        # spark.sql.files.minPartitionNum floor interleaved — it bought
        # ~5% on the shuffle-free extraction scan (better wave balancing
        # under host steal) but cost the scan->Exchange window query
        # 2.5x (~12 ms of per-task scan+shuffle-write overhead x 96
        # extra tasks), a net loss for the suite. Details in
        # OPTIMIZATION_r09.md §session.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
