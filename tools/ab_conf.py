#!/usr/bin/env python3
"""Interleaved A/B of a runtime-settable SQL conf over catalog entries
(r9 optimization round, guide §1.2 step 3): same session, alternating
conf values per arm, warm-cache bench methodology like ab_parallel.

Usage:  python tools/ab_conf.py --conf KEY --a VAL --b VAL entry...
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
    ap.add_argument("--conf", required=True)
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("entries", nargs="+")
    args = ap.parse_args()

    from stream2segment_spark.queries_catalog import queries
    from stream2segment_spark.schema import TESTDATA_TABLES, load_table
    from stream2segment_spark.session import get_spark

    spark = get_spark(app_name="ab-conf")
    qs = queries()
    for name in TESTDATA_TABLES:
        load_table(spark, args.sf_dir, name).count()
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return pd.Series(s)
    spark.range(1000).select(_warm("id")).count()

    default = spark.conf.get(args.conf, None)

    def run_arm(entry: str, val: str) -> list[float]:
        spark.conf.set(args.conf, val)
        spark.sparkContext.setJobDescription(f"abconf:{entry}:{val}")
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = qs[entry](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        return times

    for i, entry in enumerate(args.entries):
        order = (args.a, args.b) if i % 2 == 0 else (args.b, args.a)
        arms: dict[str, list[float]] = {v: [] for v in (args.a, args.b)}
        for _ in range(2):
            for val in order:
                arms[val] += run_arm(entry, val)
        if default is not None:
            spark.conf.set(args.conf, default)
        av, bv = arms[args.a], arms[args.b]
        print(f"{entry:34s} {args.a}={min(av):7.3f} {args.b}={min(bv):7.3f}"
              f"  a_runs={['%.2f' % t for t in av]}"
              f" b_runs={['%.2f' % t for t in bv]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
