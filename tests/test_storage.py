"""Plan-level tests for the physical-layout helpers: bucketed joins must
not shuffle; partitioned scans must prune."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream2segment_spark.schema import load_table
from stream2segment_spark.storage import (
    bucketed_join, plan_of, write_bucketed, write_partitioned)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    # managed tables land in the default warehouse dir; DROP TABLE removes
    # the files (warehouse.dir is static config, unsettable post-session)
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    write_bucketed(li, "li_b", ["l_orderkey"], n_buckets=8)
    write_bucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
                   "o_b", ["l_orderkey"], n_buckets=8)
    # disable broadcast so the join would otherwise need a shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_b", "o_b", ["l_orderkey"])
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it actually computes the right thing
        n = joined.count()
        want = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert n == want > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_partitioned_scan_prunes(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "ev_part")
    write_partitioned(ev, path, ["event_type"])
    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    got = df.count()
    want = ev.filter(F.col("event_type") == "click").count()
    assert got == want > 0


def test_record_download_on_imported_warehouse(spark, tmp_path):
    """A warehouse written by import-db carries the reference's 7-field
    downloads layout (incl. warnings/errors); record_download must
    append to it instead of crashing on the schema cast."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stream2segment_spark import warehouse as WH
    wh = tmp_path / "wh"
    wh.mkdir()
    imported = pa.table({
        "id": pa.array([1], pa.int64()),
        "run_time": pa.array([None], pa.timestamp("us")),
        "log": pa.array(["old run"], pa.string()),
        "warnings": pa.array([3], pa.int64()),
        "errors": pa.array([1], pa.int64()),
        "config": pa.array(["cfg"], pa.string()),
        "program_version": pa.array(["2.7.3"], pa.string()),
    })
    pq.write_table(imported, str(wh / "downloads.parquet"))
    did = WH.record_download(str(wh), "new run", "cfg2", "spark-0")
    rows = {r["id"]: r for r in
            WH.read_small(str(wh), "downloads").to_pylist()}
    assert did == 2 and rows[1]["warnings"] == 3
    assert rows[2]["log"] == "new run" and rows[2]["warnings"] is None
