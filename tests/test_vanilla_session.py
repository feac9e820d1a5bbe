"""Regression for the round-1 gate failure: the driver's correctness gate
uses a VANILLA SparkSession (none of session.get_spark's confs), and
events.parquet carries a TIMESTAMP(NANOS) column. ``schema.load_table`` must
self-configure ``spark.sql.legacy.parquet.nanosAsLong`` at runtime."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from stream2segment_spark.schema import load_table
from tests.conftest import SF_DIR_SMOKE

CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture()
def vanilla_conf(spark):
    """Simulate the gate: drop the nanos conf so the session behaves like a
    fresh SparkSession.builder.getOrCreate() for parquet nanos reads."""
    had = spark.conf.get(CONF, None)
    spark.conf.unset(CONF)
    yield spark
    if had is not None:
        spark.conf.set(CONF, had)


def test_load_events_without_session_conf(vanilla_conf):
    spark = vanilla_conf
    df = load_table(spark, SF_DIR_SMOKE, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert df.count() == 1000
    # and the conf was re-established for later direct reads in the same query
    assert spark.conf.get(CONF) == "true"
