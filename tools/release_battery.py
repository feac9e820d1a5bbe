#!/usr/bin/env python3
"""The full release battery as ONE command (VERDICT r7 ask #8): every
check the round's closing verification runs, in order, stopping on the
first failure. r7's late-session additions each required hand-rerunning
the individual tools — which is exactly where never-gated entries slip
through — so the battery is now atomic.

Steps (each a subprocess, so Spark sessions never clash):
  1. driver-contract smoke (entry() rows + queries/oracles counts)
  2. gate-mirror sweep on the REAL sf0.01 fixture
  3. adversarial-unicode fixture build + sweep
  4. permuted (row-order/layout) fixture build + sweep
  5. plan audit over every entry (refreshes PLANSHAPES.json)
  6. bench staleness (full runs only; VERDICT r8 ask #4): FAILS when
     any commit touching perf paths (stream2segment_spark/, bench.py,
     __spark_entry__.py) postdates the newest BENCH_local_r{N}.json —
     the r8 artifact shipped a pre-fix 8.08 s row because the final
     perf commit landed after the bench was recorded. Re-record
     (min-of-3, quiet host) and commit the bench LAST, or pass
     --skip-bench-check for mid-session runs.
  7. rotation_check staleness report (informational, never fails)

Usage:  python tools/release_battery.py [--skip-fixtures] [entry ...]
Passing entry names restricts the three sweeps (and the plan audit) to
those entries — the fast loop for verifying one new operator; the full
run (no args) is the pre-commit battery for a round's final tree.
Exit 0 = everything green.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PY = sys.executable


def _run(title: str, args: list[str]) -> bool:
    t0 = time.time()
    print(f"=== {title} ===", flush=True)
    proc = subprocess.run(args, cwd=REPO)
    ok = proc.returncode == 0
    print(f"=== {title}: {'OK' if ok else 'FAIL'} "
          f"({time.time() - t0:.0f}s) ===\n", flush=True)
    return ok


_SMOKE = """
import sys, importlib.util
sys.path.insert(0, %r)
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", %r)
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from stream2segment_spark.session import get_spark
spark = get_spark(app_name="battery-smoke")
rows = mod.entry(spark).collect()
qs, osql = mod.queries(), mod.oracle_sql()
missing = set(qs) - set(osql)
print(f"entry rows={len(rows)} queries={len(qs)} oracles={len(osql)} "
      f"missing_oracles={sorted(missing) or 'none'}")
spark.stop()
assert rows is not None and len(qs) >= 100, "driver contract regressed"
""" % (str(REPO), str(REPO / "__spark_entry__.py"))


_PERF_PATHS = ("stream2segment_spark", "bench.py", "__spark_entry__.py")


def _bench_stale() -> bool:
    """True (= FAIL) when perf-touching commits or uncommitted perf
    edits postdate the newest committed BENCH_local_r{N}.json."""
    import re

    # exact round artifacts only: session-scoped companions like
    # BENCH_local_r10_before.json (r10 baseline snapshot) must not be
    # picked as "the" round artifact the staleness anchor tracks
    benches = sorted(
        (p for p in REPO.glob("BENCH_local_r*.json")
         if re.fullmatch(r"BENCH_local_r\d+\.json", p.name)),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
    if not benches:
        print("no BENCH_local_r*.json found — record one first")
        return True
    newest = benches[-1].name

    def _git(*a: str) -> str:
        return subprocess.run(["git", *a], cwd=REPO, text=True,
                              capture_output=True).stdout.strip()

    anchor = _git("log", "--format=%H", "-n1", "--", newest)
    if not anchor:
        print(f"{newest} is not committed — commit it (recorded on the "
              "final tree) or re-record")
        return True
    later = _git("log", "--format=%h %s", f"{anchor}..HEAD", "--",
                 *_PERF_PATHS)
    dirty = _git("status", "--porcelain", "--", *_PERF_PATHS)
    if later or dirty:
        if later:
            print(f"perf-touching commits postdate {newest}:\n{later}")
        if dirty:
            print(f"uncommitted perf-path edits:\n{dirty}")
        print(f"re-record {newest.split('.')[0]} (min-of-3, quiet "
              "host) AFTER the final perf commit")
        return True
    print(f"{newest} is fresh (no perf commits/edits after it)")
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*",
                    help="restrict sweeps/audit to these entries")
    ap.add_argument("--skip-fixtures", action="store_true",
                    help="only the real-fixture sweep (steps 3-4 off)")
    ap.add_argument("--skip-bench-check", action="store_true",
                    help="skip the bench-staleness gate (mid-session "
                         "runs before the round's bench is recorded)")
    args = ap.parse_args()
    sel = args.entries

    steps: list[tuple[str, list[str]]] = [
        ("driver-contract smoke", [PY, "-c", _SMOKE]),
        ("gate mirror (real sf0.01)",
         [PY, "tools/gate_mirror.py", *sel]),
    ]
    if not args.skip_fixtures:
        steps += [
            ("unicode fixture build",
             [PY, "tools/unicode_fixture.py", "/tmp/sf_unicode"]),
            ("gate mirror (adversarial unicode)",
             [PY, "tools/gate_mirror.py", "--sf-dir", "/tmp/sf_unicode",
              *sel]),
            ("permuted fixture build",
             [PY, "tools/permuted_fixture.py", "--out",
              "/tmp/sf_permuted"]),
            ("gate mirror (permuted layout)",
             [PY, "tools/gate_mirror.py", "--sf-dir", "/tmp/sf_permuted",
              *sel]),
        ]
    steps.append(("plan audit", [PY, "tools/plan_audit.py", *sel]))

    for title, cmd in steps:
        if not _run(title, cmd):
            print(f"BATTERY FAILED at: {title}", flush=True)
            return 1
    # bench staleness gates FULL runs only: entry-restricted runs are
    # the mid-session fast loop, where perf work is still in flight
    if not sel and not args.skip_bench_check:
        print("=== bench staleness ===", flush=True)
        if _bench_stale():
            print("BATTERY FAILED at: bench staleness", flush=True)
            return 1
        print("=== bench staleness: OK ===\n", flush=True)
    # informational tail — staleness is rotation input, not a gate
    _run("rotation check (informational)",
         [PY, "tools/rotation_check.py"])
    print("BATTERY GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
