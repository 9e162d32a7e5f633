"""Same-window A/B runner for q_extract_full (r5 VERDICT task 1).

Runs ONLY the flagship extraction query from an arbitrary source tree
(sys.argv[1]) over the SHARED cached bench corpus (written once by
bench.py — both trees read byte-identical parquet), with the same warmup
and session config as bench.py, and prints one JSON line with every
sample plus the min. Interleaving across trees is done by the caller
(alternate subprocess invocations) so host-steal bursts spread across
both commits.

Usage:
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEATS=2 \
      python BENCH/ab_extract.py /root/repo [label]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    label = sys.argv[2] if len(sys.argv) > 2 else tree
    sys.path.insert(0, tree)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "20"))
    pages_path = (f"/tmp/sparktika_bench_pages_{os.path.basename(sf_dir)}"
                  f"_x{replicate}")
    if not os.path.exists(pages_path):
        raise SystemExit(f"run bench.py first to write {pages_path}")

    import pandas as _pd

    from sparktika.pipeline.extract import extract_pages
    from sparktika.pipeline.session import build_session
    from sparktika.synth import SYNTH_CONFIG

    spark = build_session(app_name=f"ab-{label}", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus * 2, 8),
                          arrow_batch_rows=256)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)

    warm = spark.range(cpus * 64).repartition(cpus * 2)
    warm.mapInPandas(lambda it: (_pd.DataFrame({"n": [len(p)]}) for p in it),
                     "n long").write.format("noop").mode("overwrite").save()

    samples = []
    for _ in range(repeats):
        t0 = time.monotonic()
        extract_pages(pages, SYNTH_CONFIG).write.format("noop") \
            .mode("overwrite").save()
        samples.append(round(time.monotonic() - t0, 3))
    print(json.dumps({"label": label, "cpus": cpus, "samples": samples,
                      "min": min(samples)}))
    spark.stop()


if __name__ == "__main__":
    main()
