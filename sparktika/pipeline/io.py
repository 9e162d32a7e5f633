"""Table IO: Iceberg-first with parquet fallback.

The production deployment (BASELINE.json north rule) reads/writes Iceberg
(`spark.read.format("iceberg")` / `df.writeTo(...).append()`), which buys
snapshot-isolated resume, partition pruning and compaction. This sandbox
has no Iceberg runtime jars, so the helpers probe for the catalog and fall
back to parquet dirs with the same call shape; the resume contract
(pipeline/resume.py) only needs "committed rows are listable".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j returns a JavaPackage (no exception) for a MISSING class,
        # so attribute access alone always "succeeds" — force a real
        # classload (r5 review: the parquet fallback never engaged)
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — probe only
            "org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """location = 'catalog.db.table' (Iceberg) or a path (parquet)."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def append_table(df: DataFrame, location: str) -> None:
    if "/" not in location and iceberg_available(df.sparkSession):
        df.writeTo(location).append()
        return
    df.write.mode("append").parquet(location)


def overwrite_table(df: DataFrame, location: str) -> None:
    if "/" not in location and iceberg_available(df.sparkSession):
        df.writeTo(location).createOrReplace()
        return
    df.write.mode("overwrite").parquet(location)


def table_exists(spark: SparkSession, location: str) -> bool:
    """True iff the table/path exists with committed data. Used by resume
    detection: ONLY a definite does-not-exist counts as 'first run'; any
    other failure (transient FS error, permissions) must propagate so a
    flaky read can never silently disable the anti-join and duplicate
    already-committed rows."""
    if "/" not in location and iceberg_available(spark):
        # no except: a transient catalog error must propagate, not read as
        # "first run" (same contract the parquet branch enforces)
        return spark.catalog.tableExists(location)
    jvm = spark._jvm  # noqa: SLF001
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(location)
    fs = path.getFileSystem(hconf)
    return bool(fs.exists(path))


def default_output_dir() -> str:
    return os.environ.get("SPARKTIKA_OUT", "/tmp/sparktika_out")


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32, sort_col: str | None = None) -> None:
    """Bucketed managed table: co-locates join/agg keys at WRITE time so
    repeated joins on `bucket_col` run shuffle-free (the 100-TB answer to
    'this dimension is joined every run'). Iceberg deployments get the
    same effect from bucket partition transforms; the local fallback uses
    Spark's native bucketing (requires saveAsTable)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
