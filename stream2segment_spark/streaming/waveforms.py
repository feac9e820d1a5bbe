"""Streaming waveform ingestion: the reference's strictly-batch decode +
quality-metric stage (S7 + A1) lifted onto Structured Streaming — segments
arrive continuously (files/Kafka), each micro-batch decodes its blobs with
the SAME UDF the batch path uses, and windowed quality stats aggregate
with a watermark bounding state.

Unified batch/stream: ``decode_segments`` and ``windowed_quality_stats``
are plain DataFrame -> DataFrame functions; applied to a batch frame they
compute the identical result (how tests oracle them)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream2segment_spark.sources.mseed import unpack_mseed_udf


def decode_segments(
    segments: DataFrame,
    data_col: str = "data",
    id_col: str = "id",
    ts_col: str = "request_start",
) -> DataFrame:
    """One row per decoded channel: (id, ts, seed_id, sample_rate,
    n_samples, max_gap_overlap_ratio, decode_error). Null/broken blobs
    yield an error row (X2 semantics), never a stream failure."""
    # metrics-only decode: the sample arrays never leave the UDF (they are
    # the bulk of the Arrow payload and this stage only needs the metrics)
    ch = F.explode_outer(
        unpack_mseed_udf(include_samples=False)(F.col(data_col))).alias("ch")
    out = segments.select(id_col, ts_col, ch)
    return out.select(
        id_col, ts_col,
        F.col("ch.seed_id").alias("seed_id"),
        F.col("ch.sample_rate").alias("sample_rate"),
        F.col("ch.n_samples").alias("n_samples"),
        F.col("ch.max_gap_overlap_ratio").alias("max_gap"),
        # a NULL blob decodes to a NULL channel struct (explode_outer
        # keeps the row): surface it as an error row per the docstring,
        # or windowed_quality_stats would count never-downloaded
        # segments as 'ok' (all-null metrics fall through its CASE)
        F.coalesce(F.col("ch.error"),
                   F.when(F.col("ch").isNull(), F.lit("missing blob")))
        .alias("decode_error"))


def windowed_quality_stats(
    decoded: DataFrame,
    ts_col: str = "request_start",
    window: str = "1 hour",
    watermark: str = "2 hours",
    gap_threshold: float = 0.5,
) -> DataFrame:
    """Per time-window download-quality stats (the reference's A1 gap
    recode as a streaming aggregate): ok / gapped / broken counts."""
    src = decoded
    if decoded.isStreaming:
        src = decoded.withWatermark(ts_col, watermark)
    status = (F.when(F.col("decode_error").isNotNull(), "broken")
              .when(F.abs(F.col("max_gap")) > gap_threshold, "gapped")
              .otherwise("ok"))
    return (src.withColumn("status", status)
            .groupBy(F.window(ts_col, window).alias("w"), "status")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "status", "n"))
