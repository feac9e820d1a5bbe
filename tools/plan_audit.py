#!/usr/bin/env python3
"""Catalog-wide physical-plan audit: dump every entry's plan-shape
counters (exchanges, join strategies, Python-eval operators, codegen
spans) to PLANSHAPES.json and flag global invariant violations.

Complements tests/test_plan_asserts.py (which pins ~a dozen critical
shapes): this sweeps ALL entries so a regression that sneaks a
SortMergeJoin or a row-at-a-time Python eval into a scan-stage operator
is visible as a diff of a committed artifact.

Global invariants checked (exit 1 on violation):
- no CartesianProduct anywhere (broadcast nested-loop with a literal
  one-row side is fine and counted separately);
- BatchEvalPython (row-at-a-time Python UDF) appears NOWHERE — Python
  stages must be Arrow (ArrowEvalPython / MapInPandas / FlatMapGroups);
- entries in SCAN_STAGE_ONLY have zero shuffle exchanges.

Usage: python tools/plan_audit.py [--sf DIR] [entry ...]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# entries whose whole computation must stay in the scan stage
SCAN_STAGE_ONLY = {
    "scalar_datetime_math", "scalar_great_circle", "scalar_wildcard_like",
    "scalar_event_exprs", "pred_retry_mask", "layout_zorder",
    "corpus_url_canonical",
}

# streaming entries run a real stream on invocation; plan text is the
# collapsed batch answer's — still audited, just slower to produce
COUNTERS = {
    "shuffle_exchanges": r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)",
    "broadcast_exchanges": r"BroadcastExchange",
    "sort_merge_joins": r"SortMergeJoin",
    "broadcast_hash_joins": r"BroadcastHashJoin",
    "shuffled_hash_joins": r"ShuffledHashJoin",
    "bnl_joins": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "py_row_udf": r"BatchEvalPython",
    "py_arrow": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|"
                r"FlatMapGroupsInPandasWithState",
    # codegen'd operators print as '*(n) Op' in plan text
    "codegen_spans": r"\*\(\d+\)",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("entries", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    names = args.entries or list(qs)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .appName("plan-audit").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    violations: list[str] = []
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must survive
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            violations.append(f"{name}: failed to plan")
            continue
        row = {k: len(re.findall(rx, plan)) for k, rx in COUNTERS.items()}
        out[name] = row
        if row["cartesian"]:
            violations.append(f"{name}: CartesianProduct")
        if row["py_row_udf"]:
            violations.append(f"{name}: row-at-a-time Python UDF")
        if name in SCAN_STAGE_ONLY and row["shuffle_exchanges"]:
            violations.append(f"{name}: shuffle in a scan-stage entry")
    spark.stop()

    path = REPO / "PLANSHAPES.json"
    # a PARTIAL run (explicit entry args) merges into the committed
    # full-catalog artifact instead of truncating it to the subset —
    # the artifact is the plan-shape regression baseline, and the
    # documented per-entry invocation used to clobber it (r6 review)
    if args.entries and path.exists():
        merged = json.loads(path.read_text())
        merged.update(out)
        # drop keys for renamed/deleted catalog entries: a partial-run
        # merge would otherwise keep them (and count them in the printed
        # totals) forever until the next full run (r6 ADVICE)
        merged = {k: v for k, v in merged.items() if k in qs}
        out = merged
    path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    totals = {k: sum(r.get(k, 0) for r in out.values()) for k in COUNTERS}
    print(json.dumps({"entries": len(out), "totals": totals,
                      "violations": violations}))
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
