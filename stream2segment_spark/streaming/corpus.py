"""Incremental corpus ingestion as a Structured Streaming pipeline —
the corpus analogue of the reference's incremental download semantics
(only NEW data does work; re-runs are no-ops), for a training corpus
that grows by drops of parquet files.

Shape: a file-source stream watches a landing directory; each microbatch
is annotated (content fingerprint + token count), exact-deduped within
the batch AND against everything already ingested (left_anti on the
fingerprint — the same append/anti-join pattern as the engine's
``process --append``), then appended to the corpus table. The
checkpoint directory is deterministic per target (derived from the
output path), so a restarted or re-invoked query resumes exactly-once
from where it stopped instead of replaying files — drop new files, run
again, only they are read.

Scale: the batch side is bounded by the drop size; the
already-ingested fingerprint set is a single-column scan of the corpus
table (at 100 TB, store fingerprints bucketed — storage.py — so the
anti-join co-locates without a shuffle of the corpus side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_documents_stream(
    spark: SparkSession,
    source_dir: str,
    corpus_path: str,
    schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drive one availableNow pass over the landing directory; returns
    the corpus table after ingestion. Safe to call repeatedly — the
    checkpoint makes every file exactly-once, the fingerprint anti-join
    makes every *content* at-most-once."""
    from pyspark.errors import AnalysisException

    from stream2segment_spark.functions.text import doc_fingerprint
    from stream2segment_spark.operators.dedup import exact_dedup

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _read_corpus(sess):
        """None until the first batch has written it. Probed by READING,
        not os.path.exists — the corpus may live on any Hadoop-compatible
        filesystem (hdfs://, s3a://, ...), where a driver-local stat is
        always False and would silently skip the dedup guarantee."""
        try:
            return sess.read.parquet(corpus_path)
        except AnalysisException:
            return None

    def flush(batch_df: DataFrame, _batch_id: int) -> None:
        sess = batch_df.sparkSession
        ann = batch_df.withColumn(
            "fingerprint", doc_fingerprint(F.col(text_col)))
        ann = exact_dedup(ann, ["fingerprint"], keep="first",
                          order=[id_col])
        seen = _read_corpus(sess)
        if seen is not None:
            ann = ann.join(seen.select("fingerprint"),
                           "fingerprint", "left_anti")
        # localCheckpoint: the append below reads corpus_path while the
        # anti-join plan above also reads it — cut the lineage so the
        # write can't invalidate its own input scan
        ann.localCheckpoint(eager=True).write.mode("append") \
           .parquet(corpus_path)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (stream.writeStream.foreachBatch(flush)
             .option("checkpointLocation",
                     checkpoint_dir or f"{corpus_path}__checkpoint")
             .trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    try:
        return spark.read.parquet(corpus_path)
    except AnalysisException:
        # nothing landed yet (empty landing dir on the first call):
        # an empty frame with the ingested-corpus schema, not a crash
        empty = spark.createDataFrame([], schema)
        return empty.withColumn("fingerprint",
                                F.lit(None).cast("string")).limit(0)
