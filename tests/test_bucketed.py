"""sinks/bucketed: zero-shuffle co-located joins over bucketed tables."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream2segment_spark.sinks import bucketed as B


@pytest.fixture()
def two_tables(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"))
    right = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 2).alias("val"))
    B.write_bucketed(left, "t_bleft", "doc_id", 8)
    B.write_bucketed(right, "t_bright", "doc_id", 8)
    yield "t_bleft", "t_bright"
    for t in ("t_bleft", "t_bright"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, two_tables):
    lt, rt = two_tables
    # the tables here are tiny enough to broadcast, which would mask the
    # co-location; at the scale bucketing targets, broadcast is off the
    # table and sort-merge is the strategy under test
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = B.bucketed_join(spark, lt, rt, "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert out.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # values survive the round trip
    row = out.filter(F.col("doc_id") == 10).collect()[0]
    assert row["grp"] == 3 and row["val"] == 20


def test_unbucketed_read_of_same_files_would_shuffle(spark, two_tables):
    """Contrast case documenting WHY read must go through the catalog:
    joining the raw parquet files plans an Exchange on both sides."""
    lt, rt = two_tables
    loc = spark.sql(f"DESCRIBE EXTENDED {lt}").filter(
        "col_name = 'Location'").collect()[0]["data_type"]
    raw = spark.read.parquet(loc.replace("file:", ""))
    out = raw.join(spark.table(rt), "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_bucketed_groupby_on_key_has_no_exchange(spark, two_tables):
    lt, _ = two_tables
    out = B.read_bucketed(spark, lt).groupBy("doc_id").agg(
        F.count("*").alias("n"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert out.count() == 1000


def test_write_bucketed_validates(spark):
    df = spark.range(1).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="num_buckets"):
        B.write_bucketed(df, "t_bad", "doc_id", 0)
