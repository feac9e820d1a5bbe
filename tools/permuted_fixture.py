#!/usr/bin/env python3
"""Row-order-permuted copy of a testdata dir: every table rewritten with
rows ordered by md5 of their row content (a deterministic permutation
unrelated to the original insertion order) and a different row-group
size, so a gate_mirror sweep over it proves every catalog entry is
ROW-ORDER- and PARTITION-LAYOUT-INVARIANT — any operator that silently
depends on input order (an un-tie-broken window, a first()-ish
aggregate, an order-sensitive fold) diverges from its oracle here even
though both engines read the same rows.

Usage: python tools/permuted_fixture.py [--src DIR] [--out DIR]
Then:  python tools/gate_mirror.py --sf-dir /tmp/sf_permuted
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
from stream2segment_spark.schema import TESTDATA_TABLES  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/sf_permuted")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        src = Path(args.src) / f"{t}.parquet"
        if not src.exists():
            print(f"  {t}: missing in {args.src}, skipped")
            continue
        # md5 over the row's JSON rendering: deterministic, content-
        # keyed, unrelated to the source order; small row groups force
        # a different parquet layout than the driver's writer used
        con.execute(f"""
            COPY (SELECT * FROM read_parquet('{src}')
                  ORDER BY md5(to_json(COLUMNS(*))::VARCHAR))
            TO '{out / (t + ".parquet")}'
            (FORMAT PARQUET, ROW_GROUP_SIZE 1000)""")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{src}')").fetchone()[0]
        print(f"  {t}: {n} rows permuted")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
