"""Gate entries for the sketch operators (operators/sketch.py):
HyperLogLog distinct counting and Count-Min frequency estimation.

Both oracles replay the SKETCH itself — the md5-derived registers /
counters and the estimator arithmetic — not just a reference answer, so
the hash compare pins every hash bucket, every max-rho, every counter
and the full floating-point reduction order."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream2segment_spark.queries_catalog import register
from stream2segment_spark.schema import load_table

# Keep these in sync with the operator defaults used below.
_M = 64          # HLL registers (b = 6, p = 54)
_AM2 = 0.709 * (_M * _M)   # alpha_64 * m^2, ONE double literal both sides
_W, _D = 64, 3   # CMS width / depth
_CAND_MOD = 53   # deterministic candidate subset: custkey % 53 == 0

_H60 = ("CAST('0x' || substr(md5('{seed}:' || CAST({v} AS VARCHAR)), 1, 15) "
        "AS BIGINT)")


@register(
    "sketch_hll_distinct",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    f"""WITH h AS (SELECT o_orderpriority AS grp,
                          {_H60.format(seed='hll', v='o_custkey')} AS h
                   FROM orders WHERE o_custkey IS NOT NULL),
         r0 AS (SELECT grp, h % {_M} AS register,
                       CASE WHEN h // {_M} = 0 THEN 55
                            ELSE 54 - length(bin(h // {_M})) + 1
                       END AS rho
                FROM h),
         regs AS (SELECT grp, register, max(rho) AS rho
                  FROM r0 GROUP BY grp, register),
         est AS (SELECT grp, count(*) AS n_regs,
                        list_reduce(list_prepend(0.0::DOUBLE,
                            list(1.0::DOUBLE /
                                 CAST(1::BIGINT << rho AS DOUBLE)
                                 ORDER BY register)),
                            (a, b) -> a + b) AS s
                 FROM regs GROUP BY grp),
         ex AS (SELECT o_orderpriority AS grp,
                       count(DISTINCT o_custkey) AS exact_distinct
                FROM orders GROUP BY 1)
       SELECT est.grp AS o_orderpriority, CAST(n_regs AS INT) AS n_regs,
              round({_AM2!r} / (CAST({_M} - n_regs AS DOUBLE) + s),
                    6) AS est_distinct,
              CAST(exact_distinct AS BIGINT) AS exact_distinct
       FROM est JOIN ex ON ex.grp = est.grp""",
    gate=False,
)
def sketch_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct o_custkey per o_orderpriority
    (operators/sketch.hll_registers |> hll_estimate, Flajolet et al.
    2007) next to the exact COUNT(DISTINCT). The sketch shuffle is at
    most m=64 (register, rho) integer pairs per group — independent of
    cardinality — vs the exact path's every-distinct-value shuffle; at
    100 TB only the sketch is viable per high-cardinality column. The
    oracle replays register assignment (h % m), the bin-length rank, the
    max-rho aggregation, and the register-ORDERED harmonic fold
    bit-for-bit; 2^-rho terms are integer shifts, no log/pow anywhere.
    Beyond-reference (reference computes exact aggregates on a DB:
    stream2segment/download/db/inspection/main.py)."""
    from stream2segment_spark.operators.sketch import (
        hll_estimate, hll_registers)
    orders = load_table(spark, sf_dir, "orders")
    regs = hll_registers(orders, "o_custkey", ["o_orderpriority"], m=_M)
    est = hll_estimate(regs, ["o_orderpriority"], m=_M)
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct"))
    return (est.join(exact, "o_orderpriority")
            .select("o_orderpriority", "n_regs",
                    F.round("est_distinct", 6).alias("est_distinct"),
                    F.col("exact_distinct").cast("long")
                    .alias("exact_distinct")))


_CMS_CELL = (
    "CAST('0x' || substr(md5('cms' || CAST(row AS VARCHAR) || ':' || "
    "CAST({v} AS VARCHAR)), 1, 15) AS BIGINT) % " + str(_W))


@register(
    "sketch_cms_counts",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    f"""WITH rows_ AS (SELECT unnest([0, 1, 2]) AS row),
         cells AS (SELECT row, {_CMS_CELL.format(v='o_custkey')} AS bucket
                   FROM orders, rows_
                   WHERE o_custkey IS NOT NULL),
         sk AS (SELECT row, bucket, count(*) AS cnt
                FROM cells GROUP BY row, bucket),
         cand AS (SELECT DISTINCT o_custkey AS item FROM orders
                  WHERE o_custkey % {_CAND_MOD} = 0),
         probes AS (SELECT item, row,
                           {_CMS_CELL.format(v='item')} AS bucket
                    FROM cand, rows_),
         est AS (SELECT item, min(coalesce(cnt, 0)) AS est_cnt
                 FROM probes LEFT JOIN sk USING (row, bucket)
                 GROUP BY item),
         tr AS (SELECT o_custkey AS item, count(*) AS true_cnt
                FROM orders WHERE o_custkey % {_CAND_MOD} = 0
                GROUP BY 1)
       SELECT item, CAST(est_cnt AS BIGINT) AS est_cnt,
              CAST(true_cnt AS BIGINT) AS true_cnt
       FROM est JOIN tr USING (item)""",
    gate=False,
)
def sketch_cms_counts(spark, sf_dir):
    """Count-Min frequency estimation (operators/sketch.cms_sketch |>
    cms_lookup, Cormode & Muthukrishnan 2005): order counts per customer
    for a deterministic candidate set (custkey % 53 == 0), estimated
    from a 3 x 64 counter sketch next to the true counts. The sketch
    build shuffles at most depth*width counters per partition (map-side
    combined); the probe broadcasts the tiny sketch — no groupBy over
    the key space at any point, which is the 100 TB heavy-hitter path.
    The oracle replays every counter and every min-over-rows estimate;
    est_cnt >= true_cnt by construction (one-sided error), equality
    whenever no colliding key shares all three buckets."""
    from stream2segment_spark.operators.sketch import cms_lookup, cms_sketch
    orders = load_table(spark, sf_dir, "orders")
    sk = cms_sketch(orders, "o_custkey", width=_W, depth=_D)
    cands = orders.where(F.col("o_custkey") % _CAND_MOD == 0)
    est = cms_lookup(sk, cands, "o_custkey", width=_W, depth=_D)
    true = (cands.groupBy(F.col("o_custkey").alias("item"))
            .agg(F.count(F.lit(1)).alias("true_cnt")))
    return (est.join(true, "item")
            .select("item", F.col("est_cnt").cast("long").alias("est_cnt"),
                    F.col("true_cnt").cast("long").alias("true_cnt")))


_PROF_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]

_PROF_BASE = " UNION ALL ".join(
    f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
               count(*) - count({c}) AS n_nulls,
               CAST(min({c}) AS VARCHAR) AS min_str,
               CAST(max({c}) AS VARCHAR) AS max_str
        FROM orders"""
    for c in _PROF_COLS)

_PROF_STACK = " UNION ALL ".join(
    f"""SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS val
        FROM orders WHERE {c} IS NOT NULL"""
    for c in _PROF_COLS)


@register(
    "table_profile",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    f"""WITH stacked AS ({_PROF_STACK}),
         h AS (SELECT col_name,
                      {_H60.format(seed='hll', v='val')} AS h
               FROM stacked),
         r0 AS (SELECT col_name, h % {_M} AS register,
                       CASE WHEN h // {_M} = 0 THEN 55
                            ELSE 54 - length(bin(h // {_M})) + 1
                       END AS rho
                FROM h),
         regs AS (SELECT col_name, register, max(rho) AS rho
                  FROM r0 GROUP BY col_name, register),
         est AS (SELECT col_name, count(*) AS n_regs,
                        list_reduce(list_prepend(0.0::DOUBLE,
                            list(1.0::DOUBLE /
                                 CAST(1::BIGINT << rho AS DOUBLE)
                                 ORDER BY register)),
                            (a, b) -> a + b) AS s
                 FROM regs GROUP BY col_name),
         cnts AS (SELECT col_name, val, count(*) AS top_count
                  FROM stacked GROUP BY col_name, val),
         top AS (SELECT col_name, val AS top_value, top_count,
                        row_number() OVER (PARTITION BY col_name
                                           ORDER BY top_count DESC, val)
                          AS top_rank
                 FROM cnts QUALIFY top_rank <= 1),
         base AS ({_PROF_BASE})
       SELECT b.col_name, b.n_rows, b.n_nulls, b.min_str, b.max_str,
              round({_AM2!r} / (CAST({_M} - e.n_regs AS DOUBLE) + e.s),
                    6) AS n_distinct_est,
              t.top_value, t.top_count, CAST(t.top_rank AS INT) AS top_rank
       FROM base b LEFT JOIN est e ON e.col_name = b.col_name
            LEFT JOIN top t ON t.col_name = b.col_name""",
    gate=False,
)
def table_profile(spark, sf_dir):
    """Per-column table profiling (operators/profile.profile_table):
    null counts, typed min/max, HLL distinct estimate and top value for
    three orders columns, in exactly two jobs regardless of column count
    (one all-columns aggregate scan; one stacked (col, value) pass
    feeding the HLL registers and top-k counts). The oracle replays the
    stacked union, every HLL register, the ordered harmonic fold and the
    tie-broken top-1 window. Beyond-reference capability (the
    reference's inspection/main.py profiles fixed download columns on a
    DB)."""
    from stream2segment_spark.operators.profile import profile_table
    orders = load_table(spark, sf_dir, "orders")
    out = profile_table(orders, _PROF_COLS, hll_m=_M, top_k=1)
    return out.select(
        "col_name", "n_rows", "n_nulls", "min_str", "max_str",
        F.round("n_distinct_est", 6).alias("n_distinct_est"),
        "top_value", "top_count",
        F.col("top_rank").cast("int").alias("top_rank"))


_QH_LO, _QH_HI, _QH_BINS = 900.0, 105000.0, 256
_QH_BW = (_QH_HI - _QH_LO) / _QH_BINS   # 406.640625 — exact binary double
_QH_QS = (0.25, 0.5, 0.9, 0.99)


@register(
    "sketch_quantile_hist",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    f"""WITH h AS (SELECT l_returnflag AS grp,
                CAST(least(greatest(floor(
                    (CAST(l_extendedprice AS DOUBLE) - {_QH_LO!r})
                    / {_QH_BW!r}), 0), {_QH_BINS - 1}) AS INT) AS bin
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
         hist AS (SELECT grp, bin, count(*) AS cnt FROM h GROUP BY grp, bin),
         cum AS (SELECT grp, bin, cnt,
                        sum(cnt) OVER (PARTITION BY grp ORDER BY bin) - cnt
                            AS cum_before,
                        sum(cnt) OVER (PARTITION BY grp ORDER BY bin)
                            AS cum_after,
                        sum(cnt) OVER (PARTITION BY grp) AS n_total
                 FROM hist),
         probes AS (SELECT grp, bin, cnt, cum_before, cum_after, n_total, q
                    FROM cum, unnest([{', '.join(f'{q!r}::DOUBLE'
                                                 for q in _QH_QS)}])
                         AS t(q)),
         hit AS (SELECT *, row_number() OVER (PARTITION BY grp, q
                                              ORDER BY bin) AS rn
                 FROM probes
                 WHERE CAST(cum_after AS DOUBLE)
                       >= q * CAST(n_total AS DOUBLE))
       SELECT grp AS l_returnflag, q, CAST(bin AS INT) AS q_bin,
              round({_QH_LO!r} + ({_QH_BW!r} * CAST(bin AS DOUBLE))
                    + {_QH_BW!r} * ((q * CAST(n_total AS DOUBLE)
                                     - CAST(cum_before AS DOUBLE))
                                    / CAST(cnt AS DOUBLE)), 6) AS q_value
       FROM hit WHERE rn = 1""",
    gate=False,
)
def sketch_quantile_hist(spark, sf_dir):
    """Mergeable equi-width histogram sketch -> quantile estimates
    (operators/sketch.hist_sketch |> hist_quantiles): p25/p50/p90/p99 of
    l_extendedprice per l_returnflag from a 256-bin counter table. An
    exact percentile at 100 TB is a full sort per group; this sketch is
    <= n_bins counters per group (map-side combined, one bounded
    shuffle), persists, and merges losslessly by addition (hist_merge —
    pytest proves split-merge == whole-table bit equality). The oracle
    replays the binning (one shared bin-width double literal, floor of
    an IEEE-portable (x-lo)/bw), the cumulative window, the
    first-covering-bin choice and the fixed-parenthesization
    interpolation bit-for-bit. Completes the sketch family: HLL =
    distinct, CMS = frequency, histogram = distribution.
    Beyond-reference (the reference's inspection reports exact DB
    aggregates only)."""
    from stream2segment_spark.operators.sketch import (
        hist_quantiles, hist_sketch)
    li = load_table(spark, sf_dir, "lineitem")
    hist = hist_sketch(li, "l_extendedprice", _QH_LO, _QH_HI, _QH_BINS,
                       ["l_returnflag"])
    out = hist_quantiles(hist, _QH_QS, _QH_LO, _QH_HI, _QH_BINS,
                         ["l_returnflag"])
    return out.select("l_returnflag", "q", "q_bin",
                      F.round("q_value", 6).alias("q_value"))


_TS_EVENTS_SK = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events"


@register(
    "stream_distinct_approx",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    f"""WITH ev AS (SELECT date_trunc('hour', ts) AS window_start, user_id
                    FROM {_TS_EVENTS_SK} WHERE user_id IS NOT NULL),
         h AS (SELECT window_start,
                      {_H60.format(seed='hll', v='user_id')} AS h
               FROM ev),
         r0 AS (SELECT window_start, h % {_M} AS register,
                       CASE WHEN h // {_M} = 0 THEN 55
                            ELSE 54 - length(bin(h // {_M})) + 1
                       END AS rho
                FROM h),
         regs AS (SELECT window_start, register, max(rho) AS rho
                  FROM r0 GROUP BY window_start, register),
         est AS (SELECT window_start, count(*) AS n_regs,
                        list_reduce(list_prepend(0.0::DOUBLE,
                            list(1.0::DOUBLE /
                                 CAST(1::BIGINT << rho AS DOUBLE)
                                 ORDER BY register)),
                            (a, b) -> a + b) AS s
                 FROM regs GROUP BY window_start),
         ex AS (SELECT date_trunc('hour', ts) AS window_start,
                       count(DISTINCT user_id) AS exact_distinct
                FROM {_TS_EVENTS_SK} WHERE user_id IS NOT NULL
                GROUP BY 1)
       SELECT est.window_start, CAST(n_regs AS INT) AS n_regs,
              round({_AM2!r} / (CAST({_M} - n_regs AS DOUBLE) + s),
                    6) AS est_distinct,
              CAST(exact_distinct AS BIGINT) AS exact_distinct
       FROM est JOIN ex ON ex.window_start = est.window_start""",
    gate=False,
)
def stream_distinct_approx(spark, sf_dir):
    """Streaming approximate COUNT(DISTINCT): per-hour HLL registers of
    user_id run as a REAL Structured Streaming query (parquet source ->
    availableNow -> memory sink), then collapsed to estimates and joined
    with the exact batch answer. Streaming exact-distinct state grows
    with cardinality (every value held until the watermark closes the
    window); the register table caps state at m=64 integers per window,
    and the max-rho update is the associative aggregate Structured
    Streaming evicts normally with a watermark
    (streaming/incremental.windowed_distinct_approx). The oracle replays
    registers, ordered harmonic fold and estimator exactly — so the gate
    proves stream state == the batch sketch, not just similar counts."""
    from stream2segment_spark.operators.sketch import hll_estimate
    from stream2segment_spark.streaming.incremental import (
        run_stream_to_memory, windowed_distinct_approx)

    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def transform(stream_df):
        from stream2segment_spark.schema import normalize_event_ts
        return windowed_distinct_approx(normalize_event_ts(stream_df),
                                        m=_M)

    import uuid
    name = "hllwin_" + uuid.uuid4().hex[:8]
    try:
        regs = run_stream_to_memory(spark, sf_dir, raw_schema, transform,
                                    name, path_glob="events.parquet")
    except Exception:
        regs = windowed_distinct_approx(batch, m=_M)
    est = hll_estimate(regs, ["window_start"], m=_M)
    exact = (batch.where(F.col("user_id").isNotNull())
             .groupBy(F.date_trunc("hour", F.col("ts"))
                      .alias("window_start"))
             .agg(F.countDistinct("user_id").alias("exact_distinct")))
    return (est.join(exact, "window_start")
            .select("window_start",
                    F.col("n_regs").cast("int").alias("n_regs"),
                    F.round("est_distinct", 6).alias("est_distinct"),
                    F.col("exact_distinct").cast("long")
                    .alias("exact_distinct")))


@register(
    "stream_hopping_stats",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    f"""WITH ev AS (SELECT ts, event_type, value FROM {_TS_EVENTS_SK}),
         b AS (SELECT ts, event_type, value,
                      time_bucket(INTERVAL '30 minutes', ts) AS bkt
               FROM ev),
         x AS (SELECT event_type, value, s.s AS window_start
               FROM b, unnest([bkt, bkt - INTERVAL '30 minutes'])
                    AS s(s))
       SELECT window_start, event_type, count(*) AS n,
              round(sum(value), 2) AS total_value
       FROM x GROUP BY window_start, event_type""",
    gate=False,
)
def stream_hopping_stats(spark, sf_dir):
    """Hopping (sliding) windows — 1-hour stats sliding every 30 min,
    run as a REAL Structured Streaming query
    (streaming/incremental.hopping_stats: F.window(ts, w, slide)
    expands each event to its w/slide overlapping windows JVM-side,
    then one watermarked aggregate; state = windows x keys, evicted as
    the watermark passes). Complete-mode output equals the batch/SQL
    answer; the oracle replays the window expansion with an explicit
    2-element unnest (w = 2*slide => every event is in exactly the
    [trunc(ts,30min)] and [trunc - 30min] windows). §2.10 extension
    alongside tumbling/session windows."""
    from stream2segment_spark.streaming.incremental import (
        hopping_stats, run_stream_to_memory)

    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def transform(stream_df):
        from stream2segment_spark.schema import normalize_event_ts
        return hopping_stats(normalize_event_ts(stream_df),
                             watermark="24 hours")

    import uuid
    name = "hop_" + uuid.uuid4().hex[:8]
    try:
        return run_stream_to_memory(spark, sf_dir, raw_schema, transform,
                                    name, path_glob="events.parquet")
    except Exception:
        return hopping_stats(batch)


_SH_LO, _SH_HI, _SH_BINS = 0.0, 500.0, 40
_SH_BW = (_SH_HI - _SH_LO) / _SH_BINS   # 12.5 — exact binary double
_SH_QS = (0.5, 0.9)


@register(
    "stream_hist_quantiles",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    f"""WITH ev AS (SELECT date_trunc('hour', ts) AS window_start, value
                    FROM {_TS_EVENTS_SK} WHERE value IS NOT NULL),
         b AS (SELECT window_start,
                      CAST(least(greatest(floor(
                          (CAST(value AS DOUBLE) - {_SH_LO!r})
                          / {_SH_BW!r}), 0), {_SH_BINS - 1}) AS INT)
                          AS bin
               FROM ev),
         hist AS (SELECT window_start, bin, count(*) AS cnt
                  FROM b GROUP BY window_start, bin),
         cum AS (SELECT window_start, bin, cnt,
                        sum(cnt) OVER (PARTITION BY window_start
                                       ORDER BY bin) - cnt AS cum_before,
                        sum(cnt) OVER (PARTITION BY window_start
                                       ORDER BY bin) AS cum_after,
                        sum(cnt) OVER (PARTITION BY window_start)
                            AS n_total
                 FROM hist),
         probes AS (SELECT *, q
                    FROM cum, unnest([{', '.join(f'{q!r}::DOUBLE'
                                                 for q in _SH_QS)}])
                         AS t(q)),
         hit AS (SELECT *, row_number() OVER (PARTITION BY window_start,
                                              q ORDER BY bin) AS rn
                 FROM probes
                 WHERE CAST(cum_after AS DOUBLE)
                       >= q * CAST(n_total AS DOUBLE))
       SELECT window_start, q, CAST(bin AS INT) AS q_bin,
              round({_SH_LO!r} + ({_SH_BW!r} * CAST(bin AS DOUBLE))
                    + {_SH_BW!r} * ((q * CAST(n_total AS DOUBLE)
                                     - CAST(cum_before AS DOUBLE))
                                    / CAST(cnt AS DOUBLE)), 6) AS q_value
       FROM hit WHERE rn = 1""",
    gate=False,
)
def stream_hist_quantiles(spark, sf_dir):
    """Streaming distribution monitoring: per-hour histogram counters of
    events.value run as a REAL Structured Streaming query
    (streaming/incremental.windowed_hist — parquet source ->
    availableNow -> memory sink), collapsed to p50/p90 estimates with
    the batch sketch machinery (operators/sketch.hist_quantiles). Exact
    streaming percentiles hold every value per window until the
    watermark closes it; the counter table caps state at n_bins=40
    integers per window and the sum update is watermark-evictable. The
    oracle replays binning, per-window cumulative ranks and the
    interpolation bit-for-bit — so the gate proves stream state == the
    batch sketch, value-for-value. Completes the streaming sketch
    family (stream_distinct_approx = HLL, this = distribution)."""
    from stream2segment_spark.operators.sketch import hist_quantiles
    from stream2segment_spark.streaming.incremental import (
        run_stream_to_memory, windowed_hist)

    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def transform(stream_df):
        from stream2segment_spark.schema import normalize_event_ts
        return windowed_hist(normalize_event_ts(stream_df),
                             value_col="value", lo=_SH_LO, hi=_SH_HI,
                             n_bins=_SH_BINS)

    import uuid
    name = "histwin_" + uuid.uuid4().hex[:8]
    try:
        h = run_stream_to_memory(spark, sf_dir, raw_schema, transform,
                                 name, path_glob="events.parquet")
    except Exception:
        h = windowed_hist(batch, value_col="value", lo=_SH_LO,
                          hi=_SH_HI, n_bins=_SH_BINS)
    out = hist_quantiles(h, _SH_QS, _SH_LO, _SH_HI, _SH_BINS,
                         ["window_start"])
    return out.select("window_start", "q", "q_bin",
                      F.round("q_value", 6).alias("q_value"))


@register(
    "stream_topk_values",
    # exact per-hour top-5 users by event count; counts + ranks replay
    # in SQL (integer counts, ties count DESC then value ASC)
    f"""WITH c AS (SELECT date_trunc('hour', ts) AS window_start,
                          user_id AS value, count(*) AS n
                   FROM {_TS_EVENTS_SK} WHERE user_id IS NOT NULL
                   GROUP BY 1, 2)
        SELECT window_start, value, n,
               CAST(row_number() OVER (PARTITION BY window_start
                    ORDER BY n DESC, value) AS INTEGER) AS rank
        FROM c QUALIFY rank <= 5""",
    gate=False,
)
def stream_topk_values(spark, sf_dir):
    """Streaming exact top-k (heavy hitters with exact counts): per-hour
    user event counts maintained as a REAL Structured Streaming query
    (parquet source -> availableNow -> memory sink; associative counts,
    watermark-evictable state bounded by distinct values per open
    window — the honest exact-top-k contract; the sketch entries cover
    the unbounded-cardinality regimes), then collapsed to the top-5 per
    window with deterministic ties (count DESC, value ASC) — rank is
    not an incremental aggregate, so it runs on the final table, the
    same stream-then-collapse split as the HLL/histogram entries. The
    oracle replays counts and ranks exactly, so the gate proves stream
    state == batch. Completes the streaming family: exact values
    (this), approximate distincts (HLL), distributions (histogram)."""
    from stream2segment_spark.streaming.incremental import (
        run_stream_to_memory, topk_collapse, windowed_value_counts)

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def transform(stream_df):
        from stream2segment_spark.schema import normalize_event_ts
        return windowed_value_counts(normalize_event_ts(stream_df))

    counts = run_stream_to_memory(
        spark, sf_dir, raw_schema, transform, "topk_values_gate",
        path_glob="events.parquet")
    return (topk_collapse(counts, k=5)
            .select("window_start", "value", F.col("n").cast("long")
                    .alias("n"), "rank"))
