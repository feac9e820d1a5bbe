"""Catalog entry for the miniSEED decode operator (SURVEY S7).

Each document id deterministically defines a two-record miniSEED blob
(sample count, values, inter-record gap, and encoding all derived from the
id), built by the encoder UDF and decoded by the parser UDF — so a DuckDB
oracle recomputes every decoded metric from the id alone. Odd ids use
Steim1 compression, even ids big-endian int32, exercising both payload
paths under the value-level gate.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from stream2segment_spark.queries_catalog import register
from stream2segment_spark.schema import load_table
from stream2segment_spark.sources import mseed as MS

_T0 = datetime(2021, 3, 4, 5, 6, 7, tzinfo=timezone.utc)


def _blob_for_id(doc_id: int) -> bytes:
    k = doc_id % 5 + 1
    n2 = doc_id % 30 + 5
    gap = doc_id % 4
    vals = (np.arange(20 + n2, dtype=np.int64) * k) % 1000
    enc = 10 if doc_id % 2 else 3
    rec1 = MS.encode_record("SY", "APE", "", "HHZ", _T0, 100.0,
                            vals[:20], encoding=enc)
    rec2 = MS.encode_record(
        "SY", "APE", "", "HHZ",
        _T0 + timedelta(seconds=(20 + gap) / 100.0), 100.0,
        vals[20:], encoding=enc, seq=2)
    return rec1 + rec2


def _encode_udf():
    @F.pandas_udf("binary")
    def _udf(ids: pd.Series) -> pd.Series:
        # _blob_for_id depends on the id only through %5 / %30 / %4 / %2,
        # so blobs repeat with period lcm = 60: encode each residue once
        # per batch instead of per row (r10 opt round — the per-row
        # encode_record calls were ~all of this stage's Python time;
        # test_mseed.py pins the periodicity so an edit to _blob_for_id
        # that breaks it fails loudly). Identical bytes per id.
        cache: dict[int, bytes] = {}
        out = []
        for i in ids:
            r = int(i) % 60
            b = cache.get(r)
            if b is None:
                b = cache[r] = _blob_for_id(r)
            out.append(b)
        return pd.Series(out)
    return _udf


@register(
    "mseed_decode",
    # driver-green r1+r2+r3; deferred for the round-4 stream_distinct_approx
    oracle="""SELECT doc_id, 'SY.APE..HHZ' AS seed_id,
              CAST(25 + doc_id % 30 AS INT) AS n_samples,
              CAST(doc_id % 4 AS DOUBLE) AS max_gap,
              0.0 AS first_sample,
              CAST(((24 + doc_id % 30) * (doc_id % 5 + 1)) % 1000 AS DOUBLE)
                AS last_sample
       FROM documents""", gate=False
    # r9 rotation: deferred
)
def mseed_decode(spark, sf_dir):
    """S7: encode a deterministic two-record blob per id (int32 / Steim1),
    decode with the SEED 2.4 parser UDF, emit per-channel metrics. The gap
    metric equals the synthetic inter-record gap in samples."""
    # width = cores/4: a chained-UDF stage holds TWO python workers per
    # task, so full-width repartition runs 3x cores processes on one host
    # (measured 8-9 s vs ~1 s at cores/4 on local[32]); a real cluster
    # caps workers at executor.cores per executor and spreads by itself
    docs = (load_table(spark, sf_dir, "documents").select("doc_id")
            .repartition(max(1, spark.sparkContext.defaultParallelism // 4)))
    decoded = (docs
               .withColumn("data", _encode_udf()(F.col("doc_id")))
               .withColumn("ch", F.explode(MS.unpack_mseed_udf()(F.col("data")))))
    return decoded.select(
        "doc_id", F.col("ch.seed_id").alias("seed_id"),
        F.col("ch.n_samples").alias("n_samples"),
        F.col("ch.max_gap_overlap_ratio").alias("max_gap"),
        F.element_at("ch.samples", 1).alias("first_sample"),
        F.element_at("ch.samples", -1).alias("last_sample"))


def _quality_blob_for_residue(r: int) -> bytes:
    """The quality-fixture blob for ``id % 5 == r`` — three variants
    total (broken / gapped / ok); shared by the UDF and the periodicity
    test."""
    if r == 4:
        return b"broken!!" * 8
    gap = 2 if r == 3 else 0
    vals = np.arange(20, dtype=np.int64)
    rec1 = MS.encode_record("SY", "APE", "", "HHZ", _T0, 100.0,
                            vals[:10], encoding=3)
    rec2 = MS.encode_record(
        "SY", "APE", "", "HHZ",
        _T0 + timedelta(seconds=(10 + gap) / 100.0), 100.0,
        vals[10:], encoding=3, seq=2)
    return rec1 + rec2


def _quality_blob_udf():
    @F.pandas_udf("binary")
    def _udf(ids: pd.Series) -> pd.Series:
        # blob depends on id % 5 only (3 variants): build each once per
        # batch, index per row (r10 opt round — the per-row
        # encode_record calls dominated the encode stage). Same bytes.
        blobs = {r: _quality_blob_for_residue(r) for r in range(5)}
        return pd.Series([blobs[int(i) % 5] for i in ids])
    return _udf


@register(
    "stream_quality_windows",
    # driver-green r2+r3; deferred for the round-4 corpus_shuffle_shards
    
    oracle="""SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
              AS window_start,
              CASE WHEN event_id % 5 = 4 THEN 'broken'
                   WHEN event_id % 5 = 3 THEN 'gapped'
                   ELSE 'ok' END AS status,
              count(*) AS n
       FROM events WHERE ts IS NOT NULL
       GROUP BY window_start, status""", gate=False,
    # r9 rotation: deferred
)
def stream_quality_windows(spark, sf_dir):
    """Streaming waveform-quality stage (streaming/waveforms.py) run in
    its batch-twin form under the gate: deterministic per-id blobs
    (every 5th broken, every 5th-minus-one with a 2-sample gap) ->
    decode -> daily ok/gapped/broken counts; the oracle recomputes status
    from the id. On a stream the SAME functions run with a watermark."""
    from stream2segment_spark.streaming.waveforms import (
        decode_segments, windowed_quality_stats)
    # the small parquet is one input split: spread the per-row-heavy
    # encode/decode UDFs — but only to cores/4 (see mseed_decode: chained
    # UDF stages hold 2 workers per task; full width thrashes local[32])
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("ts").isNotNull())
          .select(F.col("event_id").alias("id"),
                  F.col("ts").alias("request_start"))
          .repartition(max(1, spark.sparkContext.defaultParallelism // 4)))
    segs = ev.withColumn("data", _quality_blob_udf()(F.col("id")))
    out = windowed_quality_stats(decode_segments(segs), window="1 day",
                                 gap_threshold=0.5)
    return out
