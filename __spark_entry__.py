"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator catalog (one entry per implemented
SURVEY.md §2 operator) for the driver's DuckDB correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from stream2segment_spark import queries_catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the selection-expression compiler with dotted-path
    auto-joins over broadcast dims (the reference's core query surface,
    process/db/sqlevalexpr.py:68-236, re-planned by Catalyst)."""
    return queries_catalog.queries()["selection_dotted_joins"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents; keys missing here (if any) are
    non-SQL-expressible ops checked rows-only."""
    return queries_catalog.oracle_sql()
