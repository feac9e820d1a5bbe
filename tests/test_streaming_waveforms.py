"""Streaming waveform-decode test: multi-file parquet stream of miniSEED
blobs -> decode -> watermarked windowed quality stats; the batch run of
the same transforms is the oracle."""

from __future__ import annotations

import uuid
from datetime import datetime, timedelta, timezone

import numpy as np
import pytest

from stream2segment_spark.sources.mseed import encode_record
from stream2segment_spark.streaming.waveforms import (
    decode_segments, windowed_quality_stats)

T0 = datetime(2021, 8, 1, 0, 0, 0)
SCHEMA = "id long, request_start timestamp, data binary"


def _blob(gap_samples: int = 0) -> bytes:
    t0 = T0.replace(tzinfo=timezone.utc)
    r1 = encode_record("GE", "APE", "", "HHZ", t0, 100.0,
                       np.arange(50, dtype=np.int64), encoding=3)
    r2 = encode_record("GE", "APE", "", "HHZ",
                       t0 + timedelta(seconds=(50 + gap_samples) / 100.0),
                       100.0, np.arange(30, dtype=np.int64), encoding=3,
                       seq=2)
    return r1 + r2


def _rows():
    out = []
    for i in range(12):
        ts = T0 + timedelta(minutes=20 * i)  # spans 4 hourly windows
        if i % 4 == 3:
            data = b"broken!!" * 8
        else:
            data = _blob(gap_samples=2 if i % 4 == 2 else 0)
        out.append((i, ts, bytearray(data)))
    return out


@pytest.fixture(scope="module")
def stream_result(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("wfsrc")
    rows = _rows()
    for b in range(4):  # 4 micro-batches of 3 rows, time-ordered
        spark.createDataFrame(rows[b * 3:(b + 1) * 3], SCHEMA) \
            .coalesce(1).write.parquet(str(src / f"b{b}.parquet"))
    name = "wf" + uuid.uuid4().hex[:8]
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    q = (windowed_quality_stats(decode_segments(stream), watermark="30 minutes")
         .writeStream.outputMode("append").format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name), spark.createDataFrame(rows, SCHEMA)


def test_stream_matches_batch_for_closed_windows(stream_result, spark):
    streamed, batch_df = stream_result
    got = {(r["window_start"], r["status"]): r["n"] for r in streamed.collect()}
    batch = windowed_quality_stats(decode_segments(batch_df))
    want_all = {(r["window_start"], r["status"]): r["n"]
                for r in batch.collect()}
    # append mode emits only watermark-closed windows; every emitted row
    # must match the batch result exactly
    assert got, "no windows closed"
    for k, n in got.items():
        assert want_all[k] == n, (k, n, want_all.get(k))
    # the three quality classes all appear
    assert {s for (_, s) in got} <= {"ok", "gapped", "broken"}
    assert len({s for (_, s) in want_all}) == 3


def test_decode_segments_batch_values(spark):
    df = spark.createDataFrame(_rows()[:4], SCHEMA)
    rows = {r["id"]: r for r in decode_segments(df).collect()}
    assert rows[0]["seed_id"] == "GE.APE..HHZ"
    assert rows[0]["n_samples"] == 80 and rows[0]["max_gap"] == 0.0
    assert rows[2]["max_gap"] == pytest.approx(2.0)   # injected 2-sample gap
    assert rows[3]["decode_error"] is not None
