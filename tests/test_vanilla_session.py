"""Regression for the round-1 gate failure: the driver's correctness gate
uses a VANILLA SparkSession (none of session.get_spark's confs), and the
events.parquet ``ts`` physical type has varied across driver testdata
generations (TIMESTAMP(NANOS) in round 1 — illegal for a vanilla parquet
reader — TIMESTAMP(MICROS, ntz) since round 2). ``schema.load_table`` must
self-configure and always hand back a plain TimestampType column."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F, types as T

from stream2segment_spark.schema import load_table, normalize_event_ts
from tests.conftest import SF_DIR_SMOKE

CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture()
def vanilla_conf(spark):
    """Simulate the gate: drop the nanos conf so the session behaves like a
    fresh SparkSession.builder.getOrCreate() for parquet reads."""
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


def test_normalize_event_ts_from_long_nanos(spark):
    # the legacy nanos-as-long reading: int64 ns -> micros truncation
    ns = 1_600_000_000_123_456_789
    df = spark.createDataFrame([(ns,)], "ts long")
    out = normalize_event_ts(df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    got = out.collect()[0]["ts"]
    assert got == dt.datetime(2020, 9, 13, 12, 26, 40, 123456)


def test_normalize_event_ts_from_ntz(spark):
    # the micros/NTZ reading: relabel to TimestampType, same instant (UTC tz)
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2020-09-13 12:26:40.123456' AS ts")
    out = normalize_event_ts(df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.collect()[0]["ts"] == dt.datetime(
        2020, 9, 13, 12, 26, 40, 123456)


def test_normalize_event_ts_passthrough(spark):
    df = spark.sql("SELECT TIMESTAMP '2020-01-01 00:00:00' AS ts, 1 AS x")
    out = normalize_event_ts(df)
    assert out is df or out.collect() == df.collect()
