"""Driver-gate dry run: replay the CORRECTNESS gate locally.

Runs the FIRST 50 (or --all) queries() entries on Spark at sf0.01 and
compares each against its oracle_sql() on DuckDB — row count, column
names, order-insensitive value multiset — exactly the checks the
driver's gate applies. Use after every _GATE_PRIORITY rotation.

Usage: python tools/gate_dryrun.py [--all] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    window = None if "--all" in sys.argv else 50

    from sparktika.pipeline.session import build_session
    spark = build_session(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs)[:window] if window else list(qs)
    n_ok = n_ro = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {exc!r}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_ro += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {exc!r}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            n_fail += 1
        elif len(srows) != len(odf):
            print(f"FAIL  {name}: rows {len(srows)} != {len(odf)}")
            n_fail += 1
        elif _multiset(srows, scols) != _multiset(odf, ocols):
            s, o = _multiset(srows, scols), _multiset(odf, ocols)
            diffs = [(a, b) for a, b in zip(s, o) if a != b][:2]
            print(f"FAIL  {name}: value mismatch, first: {diffs}")
            n_fail += 1
        elif len(srows) == 0:
            print(f"FAIL  {name}: 0 == 0 vacuous match")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_ok += 1
    print(f"\n== {n_ok} matched, {n_ro} rows-only, {n_fail} FAILED "
          f"(window {len(names)} of {len(qs)}) ==")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
