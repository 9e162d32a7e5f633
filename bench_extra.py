"""Round-9 optimization measurement harness (bench.py is FROZEN; this file
carries the extra instrumentation the optimization guide asks for):
  --plans   capture .explain("formatted") for every headline query
  --tasks   print the scan partition counts feeding each query
  --iso Q   time one query in isolation with the noop sink (min-of-N)
Numbers from this file are cited in OPTIMIZATION_r09.md."""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def build(cpus=None):
    from sparktika.pipeline.session import build_session
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="sparktika-bench-extra",
                          master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus * 2, 8),
                          arrow_batch_rows=256)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def queries(spark):
    from sparktika.pipeline.extract import extract_pages
    from sparktika.pipeline import dedup, resume, similarity
    from sparktika.synth import SYNTH_CONFIG

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "20"))
    pages_path = (f"/tmp/sparktika_bench_pages_{os.path.basename(sf_dir)}"
                  f"_x{replicate}")
    pages = spark.read.parquet(pages_path)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def q_minhash():
        sigs = dedup.minhash_signatures(
            docs.select(F.col("doc_id").alias("key"), "text"), "text", "key")
        return dedup.minhash_lsh_pairs(sigs, threshold=0.8)

    return {
        "q_extract_full": lambda: extract_pages(pages, SYNTH_CONFIG),
        "q_extract_meta_only": lambda: (
            extract_pages(pages, SYNTH_CONFIG.with_(
                parse_content=False, extract_main_text=False,
                extract_links=False))
            .select("url", "content_type_detected", "status", "metadata")),
        "q_dedup_newest_per_url": lambda: (
            resume.newest_per_url(pages).select("url", "warc_ts")),
        "q_dedup_minhash_lsh": q_minhash,
        "q_sim_topk": lambda: similarity.brute_force_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5),
        "q_rel_pricing_summary": lambda: (
            li.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount"))).alias("sum_disc_price"),
                F.avg("l_quantity").alias("avg_qty"),
                F.count("*").alias("count_order"))),
        "heavy_dedup_cluster_components": lambda: dedup.duplicate_clusters(
            docs, "text", "doc_id"),
        "heavy_dedup_span_ranges": lambda: dedup.repeated_ngram_span_ranges(
            docs, "text", "doc_id", n=8),
        "heavy_text_contamination": lambda: dedup.benchmark_contamination(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0), "text", "doc_id"),
    }


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "--plans"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    spark = build()
    qs = queries(spark)
    if mode == "--plans":
        only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
        for name, thunk in qs.items():
            if only and name not in only:
                continue
            df = thunk()
            path = f"plans/r09/{name}_{tag}.txt"
            with open(path, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
            print(f"wrote {path}")
    elif mode == "--tasks":
        for name, thunk in qs.items():
            df = thunk()
            try:
                n = df.rdd.getNumPartitions()
            except Exception as e:
                n = f"err:{e}"
            print(f"{name}: result partitions = {n}")
        # the scan-side granularity that matters for mapInPandas:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "20"))
        pages = spark.read.parquet(
            f"/tmp/sparktika_bench_pages_{os.path.basename(sf_dir)}_x{replicate}")
        print("pages scan partitions =", pages.rdd.getNumPartitions())
    elif mode == "--iso":
        names = sys.argv[2].split(",")
        repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
        out = {}
        for rep in range(repeats):
            for name in names:
                spark.sparkContext.setJobDescription(f"iso:{name}")
                t0 = time.monotonic()
                qs[name]().write.format("noop").mode("overwrite").save()
                dt = round(time.monotonic() - t0, 3)
                if name not in out or dt < out[name]:
                    out[name] = dt
        print(out)
    spark.stop()


if __name__ == "__main__":
    main()
