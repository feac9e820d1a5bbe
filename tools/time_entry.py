#!/usr/bin/env python3
"""Time a subset of catalog entries exactly like bench.py (same session
factory, same warmups, same min-of-N noop-sink methodology) without
paying for the other ~130 entries — the fast loop of the optimization
round.

Usage:  python tools/time_entry.py [--runs N] [--sf-dir DIR] entry [entry ...]
Prints one line per entry: ``<entry>  <best_sec>  [run times]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("entries", nargs="+")
    args = ap.parse_args()

    from stream2segment_spark.queries_catalog import queries
    from stream2segment_spark.schema import TESTDATA_TABLES, load_table
    from stream2segment_spark.session import get_spark

    spark = get_spark(app_name="time-entry")
    qs = queries()
    unknown = [e for e in args.entries if e not in qs]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2

    # same warmups as bench.py: table touch + Python-worker pool spawn
    for name in TESTDATA_TABLES:
        load_table(spark, args.sf_dir, name).count()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return s

    @F.pandas_udf("long")
    def _warm2(s):
        return s

    par = spark.sparkContext.defaultParallelism
    (spark.range(0, par * 4, 1, par)
     .select(_warm("id").alias("a")).select(_warm2(F.col("a") + 1))
     .write.format("noop").mode("overwrite").save())

    for name in args.entries:
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        runs = " ".join(f"{t:.3f}" for t in times)
        print(f"{name:32s} {min(times):8.3f}  [{runs}]", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
