"""Regression tests for the deferred-entry registration contract
(queries_catalog.register(gate=False)).

Round-5 VERDICT finding: the old import-time flush of ``_DEFERRED`` ran
at the bottom of ``queries_catalog``'s module body, so a consumer that
imported a sibling catalog module FIRST (circular import -> the body
completes against a partially initialized sibling) silently lost every
entry the sibling deferred after that point (queries() returned 104
instead of 106), and could interleave deferred entries ahead of gated
ones inside the driver's first-50 checked window. Deferred entries are
now merged at queries()/oracle_sql() call time instead.

Import order only matters in a FRESH interpreter, so both orders run as
subprocesses.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_PROBE = """
import json
import {first} # noqa: F401  -- the import-order trigger
from stream2segment_spark import queries_catalog as qc
qs, osql = qc.queries(), qc.oracle_sql()
gated = list(qs)[:50]
print(json.dumps({{
    "n_queries": len(qs),
    "n_oracles": len(osql),
    "first50": gated,
    "all": sorted(qs),
}}))
"""


def _catalog_via(first_import: str) -> dict:
    import json
    out = subprocess.run(
        [sys.executable, "-c", _PROBE.format(first=first_import)],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_import_order_inversion_keeps_full_catalog():
    canonical = _catalog_via("stream2segment_spark.queries_catalog")
    inverted = _catalog_via("stream2segment_spark.queries_corpus")
    # the two r5 casualties must be present under BOTH orders
    for name in ("cluster_kmeans", "corpus_line_dedup"):
        assert name in canonical["all"], name
        assert name in inverted["all"], name
    # identical catalogs: same entries, same oracles, same first-50 window
    # (as a SET: inversion reorders registrations within the window, but
    # every gated entry must still land inside the checked 50)
    assert inverted["all"] == canonical["all"]
    assert inverted["n_queries"] == canonical["n_queries"]
    assert inverted["n_oracles"] == canonical["n_oracles"]
    assert set(inverted["first50"]) == set(canonical["first50"])


def test_deferred_never_inside_first50():
    import __spark_entry__ as entry_mod
    from stream2segment_spark import queries_catalog as qc
    qs = entry_mod.queries()
    deferred = {name for name, _fn, _o in qc._DEFERRED}
    first50 = list(qs)[:50]
    assert not deferred & set(first50), (
        "deferred entries leaked into the driver's checked window: "
        f"{deferred & set(first50)}")
    # and the window is exactly full
    assert len(qs) >= 50 and len(first50) == 50
