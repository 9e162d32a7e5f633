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
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Scan-parallelism FLOOR (r9, guide §2.2/§6): without it a corpus
        # that is small relative to the cluster splits into ~1 task per
        # core (bytesPerCore = total/defaultParallelism), i.e. ONE wave —
        # the slowest task sets the wall and any core-level slowdown is
        # unamortized. 4x cores gives ~4 waves for load balancing; at
        # 100-TB scale bytesPerCore exceeds maxPartitionBytes and this
        # floor is a no-op (maxPartitionBytes keeps governing), so the
        # setting is scale-adaptive, not local-tuned. Parameterized for
        # cluster deployments via SPARK_GRAFT_SCAN_MIN_SPLITS.
        .config("spark.sql.files.minPartitionNum",
                os.environ.get("SPARK_GRAFT_SCAN_MIN_SPLITS",
                               str(int(cpus) * 4)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
