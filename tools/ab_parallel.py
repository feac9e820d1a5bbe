#!/usr/bin/env python3
"""Interleaved same-session A/B of load_table's input-parallelize
policy (r9 optimization round): times each entry alternating policy
ON (tree default) and OFF (``_PARALLEL_TABLES`` emptied) within one
session so host drift hits both arms equally.

Usage:  python tools/ab_parallel.py [--runs N] [--sf-dir DIR] entry...
Prints ``<entry>  on=<best>  off=<best>  [runs]`` per entry.
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("entries", nargs="+")
    args = ap.parse_args()

    import stream2segment_spark.schema as schema_mod
    from stream2segment_spark.queries_catalog import queries
    from stream2segment_spark.schema import TESTDATA_TABLES, load_table
    from stream2segment_spark.session import get_spark

    spark = get_spark(app_name="ab-parallel")
    qs = queries()
    for name in TESTDATA_TABLES:
        load_table(spark, args.sf_dir, name).count()
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return pd.Series(s)
    spark.range(1000).select(_warm("id")).count()

    saved = schema_mod._PARALLEL_TABLES

    def run_arm(entry: str, on: bool) -> list[float]:
        """bench.py methodology: min-of-N with the cache WARM across
        runs of the same entry (clearCache only between arms/entries)."""
        schema_mod._PARALLEL_TABLES = saved if on else frozenset()
        spark.sparkContext.setJobDescription(
            f"ab:{entry}:{'on' if on else 'off'}")
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = qs[entry](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        return times

    for i, entry in enumerate(args.entries):
        # alternate which arm goes first to cancel warm-order bias
        order = (True, False) if i % 2 == 0 else (False, True)
        arms: dict[bool, list[float]] = {}
        for on in order:
            arms[on] = run_arm(entry, on)
        for on in order:          # second interleave round
            arms[on] += run_arm(entry, on)
        schema_mod._PARALLEL_TABLES = saved
        ons, offs = arms[True], arms[False]
        print(f"{entry:34s} on={min(ons):7.3f} off={min(offs):7.3f}  "
              f"on_runs={['%.2f' % t for t in ons]} "
              f"off_runs={['%.2f' % t for t in offs]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
