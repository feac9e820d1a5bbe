"""Streaming transformations (unified batch/stream DataFrame builders) and
drivers for running them to completion in tests.

``tumbling_stats`` / ``sessionize`` are plain DataFrame -> DataFrame
functions: applied to ``spark.readStream`` input they form a Structured
Streaming query (watermark bounds state); applied to a batch frame they
compute the identical result, which is what the correctness oracle compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_stats(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window count/sum per key. On a streaming frame the
    watermark lets late rows beyond 2h be dropped and state be evicted —
    the knob that keeps state bounded on an unbounded 100 TB/day stream."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (src.groupBy(F.window(ts_col, window).alias("w"), key_col)
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.col("w.start").alias("window_start"), key_col,
                    "n", "total_value"))


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    user's previous event exceeds ``gap_minutes`` (lag + cumulative sum —
    the batch twin of streaming ``session_window``).

    Returns one row per session: (user_id, session_id, n_events,
    session_start, session_end).
    """
    from pyspark.sql import Window
    # event_id tie-breaker: ORDER BY ts alone is unstable when a user has
    # two events at the same timestamp (the oracle must agree row-for-row)
    order_cols = [ts_col]
    if "event_id" in events.columns:
        order_cols.append("event_id")
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    sess = (events
            .withColumn("__new", new_sess)
            .withColumn("session_id",
                        F.sum("__new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy(user_col, "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end")))


def run_stream_to_memory(
    spark, source_dir: str, schema, transform, query_name: str,
    path_glob: str | None = None,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drive a parquet-source streaming query to completion synchronously
    (availableNow) into an in-memory sink; returns the result table.
    Complete mode -> the final answer equals the batch computation.

    The file stream source requires a DIRECTORY; select individual files
    with ``path_glob`` (pathGlobFilter).

    ``state_partitions`` sizes the stateful operator's shuffle (= the
    number of state-store instances, baked into the stream at first
    start). Batch defaults are oversized for a stream's per-microbatch
    state maintenance: 32 stores on one node measured 2.6 s for the gate
    window query vs 1.3 s with 8. Real deployments size this to state
    cardinality x executor count; None keeps the session default. The
    session conf is restored after the run (it is only read at stream
    start)."""
    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.parquet(source_dir)
    out = transform(stream)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (out.writeStream.outputMode("complete")
             .format("memory").queryName(query_name)
             .trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(query_name)


def windowed_distinct_approx(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "24 hours",
    value_col: str = "user_id",
    m: int = 64,
    seed: str = "hll",
) -> DataFrame:
    """Per-tumbling-window HyperLogLog registers for approximate
    COUNT(DISTINCT value_col) on an unbounded stream.

    Exact streaming distinct needs state proportional to the number of
    distinct values per window (every value retained until the watermark
    closes the window). The HLL register table caps state at ``m``
    integers per window no matter the cardinality, and the update is a
    plain ``max`` — an associative/commutative aggregate Structured
    Streaming supports with watermarking, so late rows fold in and state
    evicts normally. Collapse the result with
    ``operators.sketch.hll_estimate(regs, ["window_start"])``.

    Works identically on a batch frame (the batch twin for gate
    checking). Returns ``(window_start, register, rho)``.
    """
    from stream2segment_spark.operators.sketch import (
        HASH_BITS, _check_m, hash60)
    b = _check_m(m)
    p = HASH_BITS - b
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    hashed = (src.where(F.col(value_col).isNotNull())
              .select(F.col(ts_col),
                      hash60(F.col(value_col), seed).alias("__h")))
    w = F.expr(f"__h div {m}")
    rho = F.when(w == 0, F.lit(p + 1)) \
        .otherwise(F.lit(p) - F.length(F.bin(w)) + F.lit(1))
    return (hashed
            .select(ts_col, F.pmod("__h", F.lit(m)).alias("register"),
                    rho.cast("int").alias("__rho"))
            .groupBy(F.window(ts_col, window).alias("w"), "register")
            .agg(F.max("__rho").alias("rho"))
            .select(F.col("w.start").alias("window_start"),
                    "register", "rho"))


def hopping_stats(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "event_type",
) -> DataFrame:
    """Hopping (sliding) window count/sum per key: every event
    contributes to ``window/slide`` overlapping windows —
    ``F.window(ts, window, slide)`` expands the row to each window
    JVM-side, then it's a plain watermarked aggregate (state is
    windows x keys, evicted as the watermark passes each window end).
    The batch twin is identical code minus the watermark."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (src.groupBy(F.window(ts_col, window, slide).alias("w"),
                        key_col)
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.col("w.start").alias("window_start"), key_col,
                    "n", "total_value"))


def windowed_hist(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "24 hours",
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 100.0,
    n_bins: int = 32,
) -> DataFrame:
    """Per-tumbling-window equi-width histogram counters for streaming
    quantile/distribution monitoring — the histogram twin of
    :func:`windowed_distinct_approx` (sketch family: HLL = distinct,
    histogram = distribution).

    Exact streaming percentiles would hold every value per window until
    the watermark closes it; the counter table caps state at ``n_bins``
    integers per window, and the update is a plain ``sum`` — an
    associative/commutative aggregate Structured Streaming evicts
    normally with a watermark. Collapse with
    ``operators.sketch.hist_quantiles(h, qs, lo, hi, n_bins,
    ["window_start"])`` (batch post-pass over the tiny counter table).
    Binning is identical to :func:`operators.sketch.hist_sketch` (one
    shared bin-width literal, clamped edges, NULLs skipped), so batch
    and stream produce the same counters bin-for-bin.

    Works identically on a batch frame (the batch twin for gate
    checking). Returns ``(window_start, bin, cnt)``."""
    if n_bins < 2 or n_bins > 65536:
        raise ValueError(f"n_bins must be in [2, 65536], got {n_bins}")
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    bw = (hi - lo) / n_bins
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(lo)) / F.lit(bw))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (src.where(F.col(value_col).isNotNull())
            .select(F.col(ts_col), b.cast("int").alias("bin"))
            .groupBy(F.window(ts_col, window).alias("w"), "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("window_start"), "bin",
                    "cnt"))


def windowed_value_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "24 hours",
    value_col: str = "user_id",
) -> DataFrame:
    """Per-tumbling-window exact value counts — the state side of
    streaming top-k (heavy hitters with exact counts). The aggregate is
    a plain associative count on (window, value): Structured Streaming
    folds late rows in and the watermark evicts closed windows, so
    state is bounded by DISTINCT VALUES PER OPEN WINDOW — the honest
    contract (for unbounded-cardinality values use the sketch family:
    windowed_distinct_approx caps distincts, windowed_hist caps
    distributions; exact top-k NEEDS the per-value counts). NULL values
    are excluded (a NULL key would form its own phantom group).

    Works identically on a batch frame (the batch twin for gate
    checking). Returns ``(window_start, value, n)``; collapse with
    :func:`topk_collapse`."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (src.where(F.col(value_col).isNotNull())
            .groupBy(F.window(ts_col, window).alias("w"),
                     F.col(value_col).alias("value"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "value", "n"))


def topk_collapse(counts: DataFrame, k: int = 5) -> DataFrame:
    """Batch collapse of :func:`windowed_value_counts` output to the
    top-k values per window (count DESC, value ASC — fully
    deterministic ties). Rank happens AFTER the streaming aggregate —
    rank is not an incremental aggregate, so the stream maintains the
    associative counts and this window ranks the final table (the
    same stream-then-collapse split as the HLL/histogram entries)."""
    from pyspark.sql import Window as W
    w = W.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("value").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
