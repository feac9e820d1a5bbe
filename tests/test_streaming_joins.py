"""Stream-stream join, watermark-bounded dedup, and the foreachBatch
upsert sink (streaming/joins.py), each checked against its batch twin —
multi-file parquet streams with maxFilesPerTrigger=1 force real
micro-batch boundaries."""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timedelta

import pytest

from stream2segment_spark.streaming.joins import (
    dedupe_within_watermark, run_upsert_sink, stream_stream_pair)


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 10) + timedelta(minutes=minute,
                                                seconds=second)


def _write_batches(spark, root, batches, schema):
    root.mkdir(parents=True, exist_ok=True)
    for i, rows in enumerate(batches):
        out = root / f"b{i}.parquet"
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(str(out))
        # deterministic micro-batch order: the file source picks files by
        # modification time — stamp them increasing
        t = 1_700_000_000 + i * 60
        for dirpath, _dirs, files in os.walk(out):
            for f in files:
                os.utime(os.path.join(dirpath, f), (t, t))
        os.utime(out, (t, t))


def _stream(spark, root, schema):
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(str(root) + "/*"))


def _collect(stream_df, mode="append"):
    name = "t" + uuid.uuid4().hex[:8]
    q = (stream_df.writeStream.outputMode(mode)
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


SCHEMA = "user_id long, ts timestamp, value double"


def test_stream_stream_pair_matches_batch_twin(spark, tmp_path):
    left = [
        [(1, _ts(10), 10.0), (2, _ts(10), 20.0)],
        [(1, _ts(30), 11.0)],
    ]
    right = [
        [(1, _ts(5), 1.0),     # within 10 min of left(1, t10)
         (2, _ts(10), 2.0),    # exact match for left(2, t10)
         (1, _ts(25), 3.0)],   # within 10 min of left(1, t30)
        [(1, _ts(12), 4.0)],   # matches nothing (after t10, >t30-10min... )
    ]
    _write_batches(spark, tmp_path / "l", left, SCHEMA)
    _write_batches(spark, tmp_path / "r", right, SCHEMA)

    out = _collect(stream_stream_pair(
        _stream(spark, tmp_path / "l", SCHEMA),
        _stream(spark, tmp_path / "r", SCHEMA), key="user_id"))
    got = {(r["key"], r["l_value"], r["r_value"]) for r in out.collect()}

    lb = spark.createDataFrame([x for b in left for x in b], SCHEMA)
    rb = spark.createDataFrame([x for b in right for x in b], SCHEMA)
    want = {(r["key"], r["l_value"], r["r_value"])
            for r in stream_stream_pair(lb, rb, key="user_id").collect()}
    assert got == want
    assert (1, 10.0, 1.0) in got and (2, 20.0, 2.0) in got
    assert (1, 11.0, 3.0) in got


def test_dedupe_within_watermark_drops_replays(spark, tmp_path):
    batches = [
        [(1, _ts(0), 1.0), (2, _ts(1), 2.0)],
        [(1, _ts(2), 99.0), (3, _ts(3), 3.0)],   # user 1 replayed
        [(2, _ts(4), 98.0), (4, _ts(5), 4.0)],   # user 2 replayed
    ]
    _write_batches(spark, tmp_path / "s", batches, SCHEMA)
    out = _collect(dedupe_within_watermark(
        _stream(spark, tmp_path / "s", SCHEMA), ["user_id"]))
    got = {r["user_id"]: r["value"] for r in out.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0}
    # batch twin: plain dropDuplicates, same keys survive
    bt = dedupe_within_watermark(
        spark.createDataFrame([x for b in batches for x in b], SCHEMA),
        ["user_id"])
    assert {r["user_id"] for r in bt.collect()} == set(got)


def test_upsert_sink_latest_wins_across_batches(spark, tmp_path):
    batches = [
        [(1, _ts(0), 1.0), (2, _ts(0), 2.0)],
        [(1, _ts(10), 10.0)],                 # updates user 1
        [(2, _ts(20), 20.0), (3, _ts(20), 3.0)],  # updates 2, inserts 3
    ]
    _write_batches(spark, tmp_path / "s", batches, SCHEMA)
    target = str(tmp_path / "wh" / "users.parquet")
    final = run_upsert_sink(
        spark, _stream(spark, tmp_path / "s", SCHEMA),
        target, natural_key=["user_id"])
    got = {r["user_id"]: r["value"] for r in final.collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 3.0}
    # and the table on disk is the merged result (no duplicate keys)
    stored = spark.read.parquet(target)
    assert stored.count() == 3


def test_upsert_sink_corrupt_target_aborts_not_overwrites(spark, tmp_path):
    """r6 ADVICE: an AnalysisException that is NOT path-missing (here a
    corrupt/unreadable parquet target) must abort the batch, not be
    treated as 'table does not exist' and silently overwrite all
    previously merged data."""
    target = tmp_path / "wh" / "users.parquet"
    target.mkdir(parents=True)
    # a parquet "file" that fails schema inference at analysis time
    (target / "part-00000.parquet").write_bytes(b"not a parquet file")
    _write_batches(spark, tmp_path / "s", [[(1, _ts(0), 1.0)]], SCHEMA)
    with pytest.raises(Exception):
        run_upsert_sink(spark, _stream(spark, tmp_path / "s", SCHEMA),
                        str(target), natural_key=["user_id"])
    # the corrupt target was NOT overwritten
    assert (target / "part-00000.parquet").read_bytes() \
        == b"not a parquet file"


def test_interval_overlap_join_validates_bucket_params(spark):
    import pytest

    from stream2segment_spark.operators.asof import interval_overlap_join

    df = spark.createDataFrame([(0.0, 1.0)], "s double, e double")
    with pytest.raises(ValueError, match="bucket_sec"):
        interval_overlap_join(df, df, ("s", "e"), ("s", "e"), bucket_sec=0)
    with pytest.raises(ValueError, match="max_buckets"):
        interval_overlap_join(df, df, ("s", "e"), ("s", "e"),
                              max_buckets=0)


def test_asof_forward_and_nearest_semantics(spark):
    from stream2segment_spark.operators.asof import (
        asof_join_backward, asof_join_forward, asof_join_nearest)
    left = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", 25.0), (3, "u", 30.0), (4, "v", 5.0)],
        "id long, k string, ts double")
    right = spark.createDataFrame(
        [("u", 8.0, "a"), ("u", 20.0, "b"), ("u", 40.0, "c"),
         ("w", 1.0, "z")],
        "k string, ts double, val string")

    fwd = {r["id"]: (r["val_asof"], r["ts_asof"]) for r in
           asof_join_forward(left, right, on="ts", by=["k"]).collect()}
    assert fwd[1] == ("b", 20.0)           # earliest at-or-after
    assert fwd[2] == ("c", 40.0)
    assert fwd[4] == (None, None)          # no right rows for key v

    near = {r["id"]: (r["val_asof"], r["ts_asof"]) for r in
            asof_join_nearest(left, right, on="ts", by=["k"]).collect()}
    assert near[1] == ("a", 8.0)           # d_back 2 < d_fwd 10
    assert near[2] == ("b", 20.0)          # 5 < 15
    assert near[3] == ("b", 20.0)          # ts=30 equidistant -> backward
    assert near[4] == (None, None)


def test_asof_nearest_tie_prefers_backward_and_inclusive(spark):
    from stream2segment_spark.operators.asof import (
        asof_join_forward, asof_join_nearest)
    left = spark.createDataFrame([(1, "u", 30.0), (2, "u", 20.0)],
                                 "id long, k string, ts double")
    right = spark.createDataFrame(
        [("u", 20.0, "eq"), ("u", 40.0, "hi")],
        "k string, ts double, val string")
    near = {r["id"]: r["val_asof"] for r in
            asof_join_nearest(left, right, on="ts", by=["k"]).collect()}
    assert near[1] == "eq"                 # d 10 == 10 -> backward
    assert near[2] == "eq"                 # exact match is inclusive
    fwd = {r["id"]: r["val_asof"] for r in
           asof_join_forward(left, right, on="ts", by=["k"]).collect()}
    assert fwd[2] == "eq"                  # forward inclusive at equal ts


def test_asof_forward_tolerance(spark):
    from stream2segment_spark.operators.asof import asof_join_forward
    left = spark.createDataFrame([(1, "u", 10.0)],
                                 "id long, k string, ts double")
    right = spark.createDataFrame([("u", 100.0, "far")],
                                  "k string, ts double, val string")
    out = asof_join_forward(left, right, on="ts", by=["k"],
                            tolerance_sec=5.0).collect()[0]
    assert out["val_asof"] is None and out["ts_asof"] is None


def test_upsert_sink_selfheals_empty_target_dir(spark, tmp_path):
    """r6 review: a target directory that exists but holds no data files
    (crash between mkdir and the first part-file commit) must be treated
    as first-batch, not wedge every retry on UNABLE_TO_INFER_SCHEMA."""
    target = tmp_path / "wh" / "users.parquet"
    target.mkdir(parents=True)
    (target / "_started").write_bytes(b"")  # marker-style leftover
    _write_batches(spark, tmp_path / "s", [[(1, _ts(0), 1.0)]], SCHEMA)
    final = run_upsert_sink(spark, _stream(spark, tmp_path / "s", SCHEMA),
                            str(target), natural_key=["user_id"])
    assert {r["user_id"] for r in final.collect()} == {1}


def test_all_map_payload_warns_not_silent(spark):
    """r6 review: when EVERY payload/value column is map-typed there is
    no deterministic tie-break — that must warn, not silently degrade."""
    import warnings as _w

    from stream2segment_spark.operators.asof import asof_join_backward
    from stream2segment_spark.operators.upsert import merge_latest_wins
    ex = spark.createDataFrame([(1, {"a": "x"})],
                               "k long, props map<string,string>")
    inc = spark.createDataFrame([(1, {"a": "y"})],
                                "k long, props map<string,string>")
    with pytest.warns(UserWarning, match="map-typed"):
        merge_latest_wins(ex, inc, ["k"])
    left = spark.createDataFrame([(1, "u", 10.0)],
                                 "id long, k string, ts double")
    right = spark.createDataFrame(
        [("u", 8.0, {"m": "1"})],
        "k string, ts double, props map<string,string>")
    with pytest.warns(UserWarning, match="map-typed"):
        asof_join_backward(left, right, on="ts", by=["k"])
