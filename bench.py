"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

Queries are forced with a noop-format write (full materialization, no
driver collect skew). Run with SPARK_GRAFT_CPUS=8 and =32 on the same
input for the N-vs-4N scaling-efficiency evidence (BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from sparktika.pipeline.extract import extract_pages
    from sparktika.pipeline.session import build_session
    from sparktika.pipeline import dedup, resume, similarity
    from sparktika.synth import SYNTH_CONFIG, synth_pages, synth_pages_heavy

    # 256-row Arrow batches: at ~7.5KB/page that is ~2MB in / ~4MB out per
    # batch. Measured here: 1024-row batches are 3-4x SLOWER at local[32]
    # (burst allocation convoys); bytes-per-batch, not row count, is the
    # sizing variable (SURVEY.md §4.1).
    spark = build_session(app_name="sparktika-bench", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus * 2, 8),
                          arrow_batch_rows=256)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # The driver testdata keeps `documents` small (500-5k rows); amplify it
    # deterministically (doc_id offsets, same text) to a corpus size where
    # throughput, not fixed overhead, is measured. No external data.
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "20"))
    pages_path = (f"/tmp/sparktika_bench_pages_{os.path.basename(sf_dir)}"
                  f"_x{replicate}")
    if not os.path.exists(pages_path):
        # realistic ~10KB pages (synth_pages_heavy) replicated with distinct
        # urls; written once with 128 partitions so both the 8- and 32-core
        # runs read the identical input layout
        base = synth_pages_heavy(spark, sf_dir)
        copies = base
        for i in range(1, replicate):
            shifted = base.withColumn(
                "url", F.concat(F.col("url"), F.lit(f"?rep={i}")))
            copies = copies.unionByName(shifted)
        copies.repartition(128).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()
    corpus_bytes = pages.select(F.sum(F.length("html"))).collect()[0][0]

    timings: dict[str, float] = {}

    # Warm up the Python worker pool on every task slot (worker spawn +
    # pandas/pyarrow imports cost ~1s/worker here — a one-time cost that
    # amortizes over a real corpus) so timings measure steady-state.
    import pandas as _pd

    warm = spark.range(cpus * 64).repartition(cpus * 2)
    warm.mapInPandas(lambda it: (_pd.DataFrame({"n": [len(p)]}) for p in it),
                     "n long").write.format("noop").mode("overwrite").save()

    # Min-of-N protocol (CLAUDE.md invariant 6): this sandbox has heavy,
    # time-varying host CPU steal — identical runs vary up to 4.5x — so a
    # single-shot timing is noise, not signal. Repeat rounds are
    # INTERLEAVED across queries (round-robin, not back-to-back) so each
    # query's samples spread over the whole invocation window — a steal
    # burst then hurts one sample of several queries instead of every
    # sample of one query; the per-query MIN is reported.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "4")))
    _suite: list[tuple[str, object]] = []

    def bench(name: str, thunk) -> None:
        _suite.append((name, thunk))

    def run_suite() -> None:
        for rep in range(repeats):
            for name, thunk in _suite:
                t0 = time.monotonic()
                thunk()
                dt = time.monotonic() - t0
                if rep == 0 or dt < timings[name]:
                    timings[name] = round(dt, 3)

    # q1: the flagship — full extraction (mime+charset+HTML/PDF kernels,
    # links, boilerplate, safety statuses) over the whole corpus. The bench
    # corpus is written uniformly partitioned, so no salted repartition here
    # (extract_pages(num_partitions=...) exists for skewed real layouts).
    bench("q_extract_full", lambda: _force(extract_pages(pages, SYNTH_CONFIG)))

    # q2: metadata-only extraction (column-pruned mode, O26). Arrow batches
    # are sized per mode: meta-only output is tiny, so bigger input batches
    # amortize per-batch overhead (measured ~10% at local[8]); the 256-row
    # default is right only for the output-heavy full path (invariant 5).
    def q2():
        # restore whatever the session default was, not a hard-coded 256
        # (ADVICE r3: a changed session default must survive q2)
        saved = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        try:
            _force(
                extract_pages(pages, SYNTH_CONFIG.with_(
                    parse_content=False, extract_main_text=False,
                    extract_links=False))
                .select("url", "content_type_detected", "status", "metadata"))
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", saved)
    bench("q_extract_meta_only", q2)

    # q3: newest-per-url window dedup over pages
    bench("q_dedup_newest_per_url", lambda: _force(
        resume.newest_per_url(pages).select("url", "warc_ts")))

    # q4: minhash LSH near-dup pairs over documents
    def q4():
        sigs = dedup.minhash_signatures(
            docs.select(F.col("doc_id").alias("key"), "text"), "text", "key")
        _force(dedup.minhash_lsh_pairs(sigs, threshold=0.8))
    bench("q_dedup_minhash_lsh", q4)

    # q5: brute-force cosine top-k (broadcast queries, single corpus pass)
    bench("q_sim_topk", lambda: _force(
        similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)))

    # q6: relational agg (TPC-H Q1 shape, map-side combine)
    bench("q_rel_pricing_summary", lambda: _force(
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count("*").alias("count_order"))))

    run_suite()

    # Heavy non-headline operators (r3 verdict item 9): recorded as a
    # per-round artifact so the scale evidence for CC / span ranges /
    # contamination accrues a time series. r4 verdict item 6: the r4
    # single-shot CC numbers swung 7.2-37.6 s with host steal (the
    # iterative loop runs a count() per pointer-jump round, so it
    # samples the steal distribution many times) — heavy ops now use
    # the SAME interleaved min-of-repeats protocol as the headline
    # suite (default 2 rounds; SPARK_GRAFT_HEAVY_REPEATS to change,
    # SPARK_GRAFT_HEAVY=0 to disable).
    heavy: dict[str, float] = {}
    heavy_repeats = max(1, int(os.environ.get("SPARK_GRAFT_HEAVY_REPEATS",
                                              "2")))
    if os.environ.get("SPARK_GRAFT_HEAVY", "1") != "0":
        heavy_suite = {
            "dedup_cluster_components": lambda: _force(
                dedup.duplicate_clusters(docs, "text", "doc_id")),
            "dedup_span_ranges": lambda: _force(
                dedup.repeated_ngram_span_ranges(docs, "text", "doc_id",
                                                 n=8)),
            "text_contamination": lambda: _force(
                dedup.benchmark_contamination(
                    docs.filter(F.col("doc_id") % 97 != 0),
                    docs.filter(F.col("doc_id") % 97 == 0),
                    "text", "doc_id")),
        }
        for rep in range(heavy_repeats):
            for name, thunk in heavy_suite.items():
                t0 = time.monotonic()
                thunk()
                dt = round(time.monotonic() - t0, 3)
                if rep == 0 or dt < heavy[name]:
                    heavy[name] = dt

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs / timings["q_extract_full"], 1)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "metric": "extraction+pipeline wall time (headline queries)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs_per_sec": docs_per_sec,
        "mb_per_sec": round(corpus_bytes / 1e6 / timings["q_extract_full"], 1),
        "n_docs": n_docs,
        "corpus_mb": round(corpus_bytes / 1e6, 1),
        "cpus": cpus,
        "repeats": repeats,
        "timing": "min over interleaved repeat rounds (host CPU steal protocol)",
        **({"heavy_ops": heavy,
            "heavy_ops_timing": (
                f"min over {heavy_repeats} interleaved rounds, "
                "full documents table")}
           if heavy else {}),
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
