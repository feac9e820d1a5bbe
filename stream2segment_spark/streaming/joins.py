"""Stream-stream joins, watermark-bounded dedup, and the foreachBatch
upsert sink — the remaining production pieces of a streaming ingest:
correlate two live streams, drop replayed records with bounded state, and
land every micro-batch in the warehouse with latest-wins merge semantics
(the streaming twin of the reference's buffered DB upsert,
download/modules/segments.py insertion loop).

Like the rest of the streaming package these are unified builders: applied
to batch frames they compute the identical result (watermarks are no-ops),
which is what the tests' batch twins compare against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_pair(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    within: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner stream-stream join: each left row pairs with right rows of
    the same ``key`` whose timestamp falls in ``[l.ts - within, l.ts]``.

    The time-range predicate + watermarks on BOTH sides are what make
    this runnable on unbounded streams: Spark derives a state-retention
    bound from them (each side's state is evicted once the other side's
    watermark passes the range), so state is O(rate x within), not O(N).
    On batch frames the same builder is a plain range join.

    Returns (key, l_ts, r_ts, l_value, r_value) with l_ts >= r_ts.
    """
    lw, rw = left, right
    if left.isStreaming:
        lw = left.withWatermark(ts_col, watermark)
    if right.isStreaming:
        rw = right.withWatermark(ts_col, watermark)
    l = lw.select(F.col(key).alias("key"),
                  F.col(ts_col).alias("l_ts"),
                  F.col("value").alias("l_value"))
    r = rw.select(F.col(key).alias("r_key"),
                  F.col(ts_col).alias("r_ts"),
                  F.col("value").alias("r_value"))
    cond = ((F.col("key") == F.col("r_key"))
            & (F.col("r_ts") <= F.col("l_ts"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr(
                f"INTERVAL {within}")))
    return l.join(r, cond).drop("r_key")


def dedupe_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Drop replayed records (same ``keys``) arriving within the watermark
    horizon — ``dropDuplicatesWithinWatermark``: unlike plain streaming
    ``dropDuplicates`` (whose key state grows forever), state for a key is
    evicted once the watermark passes it, so an at-least-once upstream
    (Kafka replay, HTTP retry) is collapsed to effectively-once with
    bounded state. Batch frames fall back to exact ``dropDuplicates``."""
    if not stream.isStreaming:
        return stream.dropDuplicates(keys)
    return (stream.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def run_upsert_sink(
    spark,
    stream: DataFrame,
    path: str,
    natural_key: list[str],
    query_name: str | None = None,
    checkpoint_dir: str | None = None,
):
    """foreachBatch upsert sink: land every micro-batch into a parquet
    warehouse table with latest-wins merge on ``natural_key`` (each batch
    beats what is already stored; batches apply in order) — the streaming
    twin of ``operators.upsert.merge_latest_wins``, i.e. the reference's buffered
    "insert new / update existing" DB flush per chunk. With Delta on the
    classpath the same callback becomes a MERGE (try_delta_merge);
    parquet-only here, so each batch is a read-merge-overwrite of the
    target — at scale, partition the target and merge only touched
    partitions.

    Runs availableNow to completion; returns the final merged DataFrame.
    """
    import uuid as _uuid

    from stream2segment_spark.operators.upsert import merge_latest_wins

    def flush(batch_df: DataFrame, _batch_id: int) -> None:
        from pyspark.errors.exceptions.captured import AnalysisException
        batch_df = batch_df.localCheckpoint(eager=True)
        # probe the target by READING, never os.path.exists — the table
        # may live on any Hadoop filesystem (hdfs://, s3a://, ...),
        # where a driver-local stat is always False and every batch
        # would silently overwrite all previously merged data (the
        # streaming/corpus.py _read_corpus pattern)
        def _target_is_dataless(spark) -> bool:
            # an existing target directory with NO files carries no
            # data to lose (e.g. a crash between mkdir and the first
            # part-file commit): treat like not-exists so the sink
            # self-heals instead of wedging on UNABLE_TO_INFER_SCHEMA
            # forever. Hadoop FS, not os.path — hdfs/s3a targets.
            jvm = spark._jvm
            jpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(jpath):
                return True
            it = fs.listFiles(jpath, True)
            while it.hasNext():
                f = it.next()
                name = f.getPath().getName()
                if f.getLen() > 0 and not name.startswith(("_", ".")):
                    return False
            return True

        try:
            current = batch_df.sparkSession.read.parquet(path)
        except AnalysisException as exc:
            # ONLY a missing or provably data-less target means "first
            # batch, nothing to merge". Any other analysis failure
            # (corrupt footer, schema/metadata problem, access error
            # surfaced at analysis time) must abort the batch —
            # treating it as not-exists would overwrite all previously
            # merged data.
            cls = exc.getErrorClass() if hasattr(exc, "getErrorClass") \
                else None
            missing = ("PATH_NOT_FOUND" in str(cls or "")
                       or (cls is None
                           and ("PATH_NOT_FOUND" in str(exc)
                                or "Path does not exist" in str(exc))))
            if not missing and not _target_is_dataless(
                    batch_df.sparkSession):
                raise
            current = None
        if current is not None:
            merged = merge_latest_wins(current, batch_df, natural_key)
            merged = merged.localCheckpoint(eager=True)
        else:
            merged = batch_df
        merged.write.mode("overwrite").parquet(path)

    # deterministic checkpoint dir derived from the target path: a
    # restarted query resumes exactly-once from it instead of replaying,
    # and repeated calls don't accumulate orphan checkpoint directories
    q = (stream.writeStream.foreachBatch(flush)
         .option("checkpointLocation",
                 checkpoint_dir or f"{path}__checkpoint")
         .queryName(query_name or f"upsert_{_uuid.uuid4().hex[:8]}")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(path)
