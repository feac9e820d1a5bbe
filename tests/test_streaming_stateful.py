"""Tests for the applyInPandasWithState operators: cross-micro-batch
first-seen dedup and session windows, driven with a multi-file parquet
stream (maxFilesPerTrigger=1 forces one micro-batch per file, so state
really carries across batches)."""

from __future__ import annotations

import uuid
from datetime import datetime

import pandas as pd
import pytest

from stream2segment_spark.streaming.stateful import (
    streaming_first_seen, streaming_sessionize)


def _ts(minute, second=0):
    from datetime import timedelta
    return datetime(2024, 1, 1, 10) + timedelta(minutes=minute, seconds=second)


def _write_batches(spark, tmp_path, batches, schema):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(str(src / f"b{i}.parquet"))
    return str(src)


def _run(spark, src_dir, schema, transform, extra_opts=None):
    name = "t" + uuid.uuid4().hex[:8]
    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1))
    stream = reader.parquet(src_dir + "/*")
    q = (transform(stream).writeStream.outputMode("append")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


SCHEMA = "user_id long, ts timestamp, value double"


def test_first_seen_dedup_across_batches(spark, tmp_path):
    batches = [
        [(1, _ts(0), 1.0), (2, _ts(1), 2.0)],
        [(1, _ts(5), 99.0), (3, _ts(6), 3.0)],   # 1 is a dup from batch 0
        [(2, _ts(9), 98.0), (4, _ts(10), 4.0)],  # 2 is a dup
    ]
    src = _write_batches(spark, tmp_path, batches, SCHEMA)
    out = _run(spark, src, SCHEMA,
               lambda s: streaming_first_seen(s, ["user_id"]))
    rows = {r["user_id"]: r["value"] for r in out.collect()}
    assert rows == {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0}


def test_sessionize_closes_on_gap_and_timeout(spark, tmp_path):
    gap_min = 10
    batches = [
        # user 1: two events 5 min apart (one session)...
        [(1, _ts(0), 0.0), (1, _ts(5), 0.0), (2, _ts(0), 0.0)],
        # ...then an event 30 min later -> closes session 1
        [(1, _ts(35), 0.0), (2, _ts(2), 0.0)],
        # late big timestamps advance the watermark far enough that every
        # still-open session times out before the stream ends
        [(9, _ts(600), 0.0)],
        [(9, _ts(1200), 0.0)],
    ]
    src = _write_batches(spark, tmp_path, batches, SCHEMA)
    out = _run(spark, src, SCHEMA,
               lambda s: streaming_sessionize(
                   s, gap_minutes=gap_min, watermark="1 minute"))
    rows = sorted((r["user_id"], r["session_start"], r["session_end"],
                   r["n_events"]) for r in out.collect())
    assert (1, _ts(0), _ts(5), 2) in rows          # closed by the 35-min event
    assert (1, _ts(35), _ts(35), 1) in rows        # closed by timeout
    assert (2, _ts(0), _ts(2), 2) in rows          # closed by timeout
    users = [u for (u, *_) in rows]
    assert users.count(1) == 2 and users.count(2) == 1


def test_sessionize_batch_twin_agreement(spark, tmp_path):
    """The stateful streaming sessionizer and the batch lag+cumsum
    sessionizer agree on closed sessions."""
    from stream2segment_spark.streaming.incremental import sessionize
    # batches are time-ordered across the stream (events later than the
    # advancing watermark would be dropped as late, by design)
    rows = [(u, _ts(m), 0.0)
            for m in (0, 3, 8, 25, 27, 60, 95)
            for u in (1, 2, 3)]
    batches = [rows[:9], rows[9:15], rows[15:],
               [(9, _ts(2000), 0.0)], [(9, _ts(4000), 0.0)]]
    src = _write_batches(spark, tmp_path, batches, SCHEMA)
    out = _run(spark, src, SCHEMA,
               lambda s: streaming_sessionize(
                   s, gap_minutes=10, watermark="1 minute"))
    got = sorted((r["user_id"], r["session_start"], r["session_end"],
                  r["n_events"]) for r in out.collect()
                 if r["user_id"] != 9)
    batch = sessionize(
        spark.createDataFrame(rows, SCHEMA), gap_minutes=10)
    want = sorted((r["user_id"], r["session_start"], r["session_end"],
                   r["n_events"]) for r in batch.collect())
    assert got == want


def test_windowed_distinct_approx_stream_equals_batch(spark, tmp_path):
    """The HLL register table computed incrementally across micro-batches
    must equal the batch sketch over the union — register-for-register
    (max is associative; this is the mergeability guarantee under real
    streaming state)."""
    from stream2segment_spark.streaming.incremental import (
        windowed_distinct_approx)
    schema = "ts timestamp, user_id long"
    batches = [
        [(_ts(0), 1), (_ts(1), 2), (_ts(2), 3), (_ts(61), 1)],
        [(_ts(3), 2), (_ts(4), 4), (_ts(62), 5), (_ts(5), None)],
        [(_ts(6), 6), (_ts(63), 5), (_ts(64), 7)],
    ]
    src = _write_batches(spark, tmp_path, batches, schema)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    out = windowed_distinct_approx(stream, m=32)
    name = "hllreg_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.outputMode("complete").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.table(name).collect()))

    batch_df = spark.createDataFrame(
        [r for b in batches for r in b], schema)
    expected = sorted(map(tuple,
                          windowed_distinct_approx(batch_df, m=32)
                          .collect()))
    assert streamed == expected
    # two windows, nulls skipped
    assert len({r[0] for r in streamed}) == 2


def test_hopping_stats_stream_equals_batch(spark, tmp_path):
    """Hopping windows across micro-batches: streamed complete-mode
    output equals the batch twin, and every event lands in exactly
    window/slide = 2 windows."""
    from pyspark.sql import functions as F

    from stream2segment_spark.streaming.incremental import hopping_stats
    schema = "ts timestamp, event_type string, value double"
    batches = [
        [(_ts(0), "a", 1.0), (_ts(29, 59), "a", 2.0)],
        [(_ts(30), "a", 4.0), (_ts(45), "b", 8.0)],
        [(_ts(90), "b", 16.0)],
    ]
    src = _write_batches(spark, tmp_path, batches, schema)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    out = hopping_stats(stream, watermark="24 hours")
    name = "hop_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.outputMode("complete").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.table(name).collect()))

    batch_df = spark.createDataFrame([r for b in batches for r in b],
                                     schema)
    expected = sorted(map(tuple, hopping_stats(batch_df).collect()))
    assert streamed == expected
    # 5 events x 2 windows each = total n across all rows is 10
    assert sum(r[2] for r in streamed) == 10


def test_windowed_hist_stream_equals_batch(spark, tmp_path):
    """The per-window histogram counters computed incrementally across
    micro-batches must equal the batch sketch over the union —
    bin-for-bin (sum is associative: the mergeability guarantee under
    real streaming state). Includes out-of-range clamps and a NULL."""
    from stream2segment_spark.streaming.incremental import windowed_hist
    schema = "ts timestamp, value double"
    batches = [
        [(_ts(0), 5.0), (_ts(1), 55.0), (_ts(2), -3.0), (_ts(61), 5.0)],
        [(_ts(3), 99.9), (_ts(4), 250.0), (_ts(62), None)],
        [(_ts(6), 5.0), (_ts(63), 42.0)],
    ]
    src = _write_batches(spark, tmp_path, batches, schema)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    out = windowed_hist(stream, value_col="value", lo=0.0, hi=100.0,
                        n_bins=10)
    name = "histreg_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.outputMode("complete").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.table(name).collect()))
    batch_df = spark.createDataFrame(
        [r for b in batches for r in b], schema)
    expected = sorted(map(tuple,
                          windowed_hist(batch_df, value_col="value",
                                        lo=0.0, hi=100.0, n_bins=10)
                          .collect()))
    assert streamed == expected
    total = sum(r[2] for r in streamed)
    assert total == 8  # NULL skipped; clamps counted in edge bins


def test_watermark_evicts_closed_window_state(spark, tmp_path):
    """Update-mode multi-batch proof that state for windows past the
    watermark is actually DROPPED — the 100 TB state-bound claim for the
    streaming sketch family (complete-mode gate runs never exercise
    eviction). Three micro-batches: window 10:00 fills, an event at
    13:00 advances the watermark to 12:30, and the final batch evicts
    the closed 10:00 window's state rows (numRowsRemoved). A 10:10
    straggler in the last batch is aggregated transiently (update mode
    emits it once) but its state row is evicted in the SAME batch
    commit — the conservation assertion proves nothing past the
    watermark lingers in the store."""
    import json as _json

    from stream2segment_spark.streaming.incremental import (
        windowed_distinct_approx, windowed_hist)
    schema = "ts timestamp, user_id long, value double"
    batches = [
        [(_ts(m), m + 1, 10.0 * m) for m in range(6)],   # window 10:00
        [(_ts(180), 100, 50.0)],                         # 13:00
        [(_ts(300), 101, 60.0),                          # 15:00
         (_ts(10), 999, 70.0)],                          # late -> dropped
    ]
    src = _write_batches(spark, tmp_path, batches, schema)
    factories = {
        "hist": lambda s: windowed_hist(
            s, watermark="30 minutes", n_bins=16),
        "hll": lambda s: windowed_distinct_approx(
            s, watermark="30 minutes", m=16),
    }
    for label, factory in factories.items():
        name = "ev" + uuid.uuid4().hex[:8]
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
        q = (factory(stream).writeStream.outputMode("update")
             .format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        prog = [p if isinstance(p, dict) else _json.loads(p.json)
                for p in q.recentProgress]
        ops = [p["stateOperators"][0] for p in prog
               if p.get("stateOperators")]
        rows = [o["numRowsTotal"] for o in ops]
        removed = sum(o["numRowsRemoved"] for o in ops)
        # state grew while both windows were open, then SHRANK once the
        # watermark passed each closed window's end (observed sequence
        # e.g. [6, 7, 2, 1]: the availableNow finalization batch also
        # evicts the 13:00 window once 15:00 advances the watermark)
        assert rows[-1] < max(rows), (label, rows)
        assert rows[-1] >= 1, (label, rows)   # open window kept
        assert removed >= 6, (label, removed)  # 10:00's rows evicted
        # conservation: every state row ever written that fell behind
        # the watermark was physically REMOVED — the store ends bounded
        # by the open windows only (updated - removed == final total)
        updated = sum(o["numRowsUpdated"] for o in ops)
        assert updated - removed == rows[-1], (label, updated, removed)
        assert rows[-1] <= 2, (label, rows)   # only open windows remain


def test_sessionize_string_keys_and_renamed_col(spark, tmp_path):
    """The output key column mirrors user_col's NAME and TYPE (was
    hardcoded 'user_id long', which miscast string/renamed keys at the
    Arrow boundary)."""
    schema = "device_id string, ts timestamp, value double"
    batches = [
        [("devA", _ts(0), 1.0), ("devA", _ts(1), 2.0)],
        [("devA", _ts(90), 3.0)],       # > gap -> closes session 1
        [("devB", _ts(95), 4.0), ("devA", _ts(300), 5.0)],
    ]
    src = _write_batches(spark, tmp_path, batches, schema)
    out = _run(spark, src, schema,
               lambda s: streaming_sessionize(s, user_col="device_id",
                                              gap_minutes=30.0))
    assert out.schema["device_id"].dataType.simpleString() == "string"
    rows = [(r["device_id"], r["n_events"]) for r in out.collect()]
    assert ("devA", 2) in rows          # the closed first session


def test_windowed_topk_stream_equals_batch(spark, tmp_path):
    """Exact top-k counts maintained across micro-batches equal the
    batch counts (count is associative), and the collapse ranks with
    deterministic ties."""
    from stream2segment_spark.streaming.incremental import (
        topk_collapse, windowed_value_counts)
    schema = "ts timestamp, user_id long"
    batches = [
        [(_ts(0), 1), (_ts(1), 1), (_ts(2), 2), (_ts(61), 9)],
        [(_ts(3), 1), (_ts(4), 2), (_ts(5), 3), (_ts(6), None)],
        [(_ts(7), 4), (_ts(62), 9), (_ts(63), 8)],
    ]
    src = _write_batches(spark, tmp_path, batches, schema)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    out = windowed_value_counts(stream)
    name = "topk_" + uuid.uuid4().hex[:8]
    q = (out.writeStream.outputMode("complete").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.table(name).collect()))

    batch_df = spark.createDataFrame(
        [r for b in batches for r in b], schema)
    expected = sorted(map(tuple,
                          windowed_value_counts(batch_df).collect()))
    assert streamed == expected
    # collapse: window 1 has counts 1->3, 2->2, 3->1, 4->1 (nulls out);
    # at k=2 the top is [1, 2]; at k=3 the 1-count TIE breaks to value 3
    ranked = topk_collapse(spark.table(name), k=3).collect()
    by_rank = {r.rank: (r.value, r.n) for r in ranked
               if len([x for x in ranked
                       if x.window_start == r.window_start]) == 3}
    assert by_rank == {1: (1, 3), 2: (2, 2), 3: (3, 1)}
