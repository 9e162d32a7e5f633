"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, pure built-ins
  (zip_with/aggregate — JVM-side, no Python). Query set broadcast.
- LSH-bucketed ANN: random-hyperplane signatures bucket the corpus; only
  same-bucket pairs get exact cosine. The scale path: the corpus shuffles
  once by bucket id; per-bucket work is independent.

Cosine is computed in double precision with explicit rounding so the
DuckDB oracle can reproduce values bit-stably.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector. `queries` is expected
    to be small -> broadcast, so the plan is a single pass over `emb`
    with no shuffle of the corpus (check .explain for BroadcastHashJoin/
    BroadcastNestedLoopJoin)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qvec"), F.col("nvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_buckets(
    emb: DataFrame,
    n_tables: int = 16,
    planes_per_table: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """(id, vec, table_id, bucket) exploded over `n_tables` independent
    random-hyperplane LSH tables (sign pattern of `planes_per_table`
    seeded Gaussian planes per table). Multiple tables are the standard
    recall lever: a true neighbor needs to collide in ANY table."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    def fn(vecs: pd.Series) -> pd.Series:
        import numpy as np

        rng = np.random.RandomState(seed)
        planes = rng.randn(n_tables, planes_per_table, dim)
        out = []
        for v in vecs:
            a = np.asarray(v, dtype=np.float64)
            d = min(a.shape[0], dim)
            bits = (planes[:, :, :d] @ a[:d]) > 0  # (tables, planes)
            weights = 1 << np.arange(planes_per_table)
            out.append((bits @ weights).astype("int32").tolist())
        return pd.Series(out)

    udf = pandas_udf(fn, ArrayType(IntegerType()))
    return emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        F.posexplode(udf(F.col(vec_col))).alias("table_id", "bucket"))


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 16,
    planes_per_table: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to pairs sharing an LSH
    bucket in >=1 of `n_tables` tables. The 100TB plan shuffles the corpus
    once by (table_id, bucket) and broadcasts the bucketed queries; recall
    tunes with n_tables (compute) and planes_per_table (selectivity)."""
    cb = hyperplane_buckets(emb, n_tables, planes_per_table, id_col, vec_col)
    qb = hyperplane_buckets(queries, n_tables, planes_per_table, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec"),
        "table_id", "bucket")
    cand = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("id"))
        .select("query_id", "qvec", "id", "vec")
        .dropDuplicates(["query_id", "id"])
    )
    scored = cand.withColumn(
        "cosine", F.round(cosine_expr(F.col("qvec"), F.col("vec")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"), "cosine", "rank")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine, blocked on `block_col` to bound the
    quadratic join (at scale the block would be an LSH bucket)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                   F.col(block_col).alias("blk"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                   F.col(block_col).alias("blk"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
