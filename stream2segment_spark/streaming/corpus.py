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
    neardup_threshold: float | None = None,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_k: int = 3,
    use_bloom: bool = False,
    bloom_capacity: int = 1_000_000,
    bloom_fpp: float = 0.01,
    c4_rules: bool = False,
    min_quality: float | None = None,
) -> DataFrame:
    """Drive one availableNow pass over the landing directory; returns
    the corpus table after ingestion. Safe to call repeatedly — the
    checkpoint makes every file exactly-once, the fingerprint anti-join
    makes every *content* at-most-once.

    ``neardup_threshold``: also NEAR-dedup each batch against the
    growing corpus (and within itself): MinHash signatures are computed
    map-only per batch and STORED with the corpus (a ``minhash``
    array<bigint> column), so the probe against history never re-reads
    corpus text — it scans the signature column, equi-joins on LSH band
    keys, and verifies only the candidate pairs with exact shingle
    Jaccard (fetching just the candidates' text by id). A batch doc
    whose Jaccard vs ANY earlier doc (or a lower-id batch sibling)
    reaches the threshold is skipped.

    ``use_bloom``: replace the per-batch corpus-fingerprint shuffle with
    a broadcast Bloom prefilter + broadcast exact confirm
    (operators/bloom.bloom_anti_join — bit-identical output, corpus
    never shuffled). The filter is sized ONCE for ``bloom_capacity``
    eventual fingerprints at ``bloom_fpp``, built from the corpus on the
    first batch of this run, then maintained incrementally across
    batches (or_bloom of each written batch) — steady-state ingestion
    does NOT rescan corpus fingerprints per batch.

    ``c4_rules`` / ``min_quality``: gate each batch IN FLIGHT (C4
    line/page cleaning, then the composite quality floor) before any
    dedup work, so junk never costs signature computation, never
    enters the corpus, and never has to be re-curated later — the
    streaming counterparts of the curation funnel's stages 0a/2."""
    from pyspark.errors import AnalysisException

    from stream2segment_spark.functions.text import doc_fingerprint
    from stream2segment_spark.operators.dedup import (
        add_minhash_maponly, exact_dedup, lsh_band_keys,
        ngram_jaccard_pairs)

    from stream2segment_spark.operators.bloom import (
        bloom_anti_join, build_bloom, optimal_params, or_bloom)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    bloom_params = (optimal_params(bloom_capacity, bloom_fpp)
                    if use_bloom else None)
    state: dict = {"bloom": None}

    def _read_corpus(sess):
        """None until the first batch has written it. Probed by READING,
        not os.path.exists — the corpus may live on any Hadoop-compatible
        filesystem (hdfs://, s3a://, ...), where a driver-local stat is
        always False and would silently skip the dedup guarantee."""
        try:
            return sess.read.parquet(corpus_path)
        except AnalysisException:
            return None

    def _neardup_losers(sess, ann: DataFrame, seen) -> DataFrame:
        """ids of batch docs near-duplicating the corpus or a lower-id
        batch sibling. ``ann`` carries a ``minhash`` column already."""
        batch_keys = lsh_band_keys(ann, id_col, num_hashes, bands)
        sides = [batch_keys.withColumn("__new", F.lit(True))]
        if seen is not None and "minhash" in seen.columns:
            hist = seen.select(id_col, "minhash")
            sides.append(lsh_band_keys(hist, id_col, num_hashes, bands)
                         .withColumn("__new", F.lit(False)))
        keys = sides[0] if len(sides) == 1 else sides[0].unionByName(
            sides[1])
        a, b = keys.alias("a"), keys.alias("b")
        # candidate = same band key, at least one side new; order the
        # pair so the KEPT doc is the older/lower one (history wins,
        # then lower id within the batch)
        cands = (a.join(b, (F.col("a.band") == F.col("b.band"))
                        & (F.col("a.key") == F.col("b.key"))
                        & F.col("b.__new")
                        & (~F.col("a.__new")
                           | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))))
                 .select(F.col(f"a.{id_col}").alias("id_a"),
                         F.col(f"b.{id_col}").alias("id_b"))
                 .distinct())
        texts = ann.select(id_col, text_col)
        if seen is not None:
            texts = texts.unionByName(seen.select(id_col, text_col))
        # ngram_jaccard_pairs fetches ONLY the candidates' text itself
        # (semi-join on candidate ids, r9): the verify stage never
        # shingles the full history corpus — O(batch) work per
        # micro-batch
        verified = ngram_jaccard_pairs(
            texts, text_col, id_col, shingle_k=shingle_k,
            threshold=neardup_threshold, candidates=cands)
        return verified.select(F.col("id_b").alias(id_col)).distinct()

    def flush(batch_df: DataFrame, _batch_id: int) -> None:
        sess = batch_df.sparkSession
        if c4_rules:
            from stream2segment_spark.functions.text import c4_signals
            sig = c4_signals(batch_df, id_col, text_col)
            batch_df = (batch_df.drop(text_col)
                        .join(sig.filter(F.col("c4_keep"))
                              .select(id_col, F.col("cleaned_text")
                                      .alias(text_col)), id_col))
        if min_quality is not None:
            from stream2segment_spark.functions.text import (
                quality_score, token_count)
            # CASE guard, not a separate filter: conjuncts get pushed
            # and reordered, and under ANSI mode quality_score's
            # mean-word-length division would throw on a 0-token row
            # (e.g. a C4-emptied doc) evaluated before its drop filter
            q = F.when(token_count(F.col(text_col)) > 0,
                       F.round(quality_score(F.col(text_col)), 4)) \
                 .otherwise(F.lit(0.0))
            batch_df = batch_df.filter(q >= min_quality)
        ann = batch_df.withColumn(
            "fingerprint", doc_fingerprint(F.col(text_col)))
        ann = exact_dedup(ann, ["fingerprint"], keep="first",
                          order=[id_col])
        seen = _read_corpus(sess)
        if seen is not None:
            if use_bloom:
                if state["bloom"] is None:  # first batch of this run
                    state["bloom"] = build_bloom(
                        seen.select("fingerprint"), "fingerprint",
                        params=bloom_params)
                ann = bloom_anti_join(ann, seen.select("fingerprint"),
                                      "fingerprint", state["bloom"])
            else:
                ann = ann.join(seen.select("fingerprint"),
                               "fingerprint", "left_anti")
        if neardup_threshold is not None:
            # add_minhash_maponly returns (id, minhash) only — join the
            # signature back onto the full batch row
            sigs = add_minhash_maponly(ann, text_col, id_col,
                                       num_hashes=num_hashes,
                                       shingle_k=shingle_k)
            ann = ann.join(sigs, id_col)
            losers = _neardup_losers(sess, ann, seen)
            ann = ann.join(losers, id_col, "left_anti")
        # localCheckpoint: the append below reads corpus_path while the
        # anti-join plan above also reads it — cut the lineage so the
        # write can't invalidate its own input scan
        ck = ann.localCheckpoint(eager=True)
        ck.write.mode("append").parquet(corpus_path)
        if use_bloom:
            # fold the written batch into the filter: subsequent batches
            # of THIS run never rescan corpus fingerprints
            batch_bf = build_bloom(ck.select("fingerprint"), "fingerprint",
                                   params=bloom_params)
            state["bloom"] = (batch_bf if state["bloom"] is None
                              else or_bloom(state["bloom"], batch_bf))

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
