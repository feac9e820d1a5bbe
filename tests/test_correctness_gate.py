"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
sf0.01 Spark-side AND its ``oracle_sql()`` on DuckDB over the same parquet,
compare row count + column names + values order-insensitively."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR_T2, assert_same_result

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops are allowed to omit the oracle, but must be
    # explicitly listed here so nothing silently skips the strong check
    allowed_weak = set(getattr(entry_mod.queries_catalog, "WEAK_CHECK_ONLY", ()))
    assert missing <= allowed_weak, f"queries missing an oracle: {missing - allowed_weak}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, testdata_duck):
    df = QUERIES[name](spark, SF_DIR_T2)
    if name not in ORACLES:
        # weak check (rows-only), like the driver
        assert df.count() >= 0
        return
    assert_same_result(df, testdata_duck.sql(ORACLES[name]), float_tol=1e-6)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
