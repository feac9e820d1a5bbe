"""Join operators beyond plain equi-joins.

Spark-first re-expressions of the reference's pandas merge patterns:
``mergeupdate`` (io/db/pdsql.py:971-1085), the event-station
spatio-temporal theta join (download/modules/stationsearch.py:26-154), and
the download diff (download/modules/segments.py:33-121).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream2segment_spark import columns as C


def mergeupdate(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    update_cols: list[str],
    drop_right_duplicates: bool = True,
) -> DataFrame:
    """Left-merge ``right`` onto ``left`` on ``keys``; where matched, values
    of ``update_cols`` from ``right`` overwrite ``left``'s.

    Reference semantics (io/db/pdsql.py:971-1085): ``np.where(_merge=='both',
    right_val, left_val)`` — i.e. right wins when matched *even when the
    right value is NULL*; unmatched rows keep left values. A matched-flag
    join implements exactly that (plain ``coalesce`` would get NULL
    overwrites wrong). Right side is deduplicated on the keys first
    (reference drops right duplicates to keep the merge 1:1).
    """
    r = right.select(keys + [c for c in update_cols if c in right.columns])
    if drop_right_duplicates:
        r = r.dropDuplicates(keys)
    renames = {c: f"__mu__{c}" for c in r.columns if c not in keys}
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    r = r.withColumn("__mu__matched", F.lit(True))
    out = left.join(r, on=keys, how="left")
    matched = F.coalesce(F.col("__mu__matched"), F.lit(False))
    for c in update_cols:
        src = f"__mu__{c}"
        if src in out.columns:
            out = out.withColumn(
                c, F.when(matched, F.col(src)).otherwise(F.col(c)))
    return out.drop(*[f"__mu__{c}" for c in update_cols if f"__mu__{c}" in out.columns],
                    "__mu__matched")


def merge_events_stations(
    events: DataFrame,
    stations: DataFrame,
    channels: DataFrame,
    minmag: float, maxmag: float,
    minradius_deg: float, maxradius_deg: float,
) -> DataFrame:
    """The reference's spatio-temporal theta join
    (download/modules/stationsearch.py:26-154): for each event, keep
    stations within a magnitude-dependent great-circle radius whose epoch is
    valid at event time, then propagate to channels.

    Spark shape: ``events CROSS JOIN broadcast(stations)`` + pure-expression
    distance and epoch predicates. Stations/channels are small dimensions
    (10^3-10^5 rows) against a large event stream, so the broadcast
    nested-loop join never shuffles the big side; the range predicate is
    evaluated inside whole-stage codegen.

    When the station side is NOT broadcast-small (or pair counts explode),
    use ``operators.spatial.merge_events_stations`` — the latitude-banded
    equi-join variant with travel-time enrichment.

    Returns (event_id, station_id, channel_id, event_distance_deg).
    """
    ev = events.select(
        F.col("id").alias("event_id"), F.col("time").alias("event_time"),
        F.col("latitude").alias("ev_lat"), F.col("longitude").alias("ev_lon"),
        F.col("magnitude").alias("ev_mag"))
    st = stations.select(
        F.col("id").alias("station_id"),
        F.col("latitude").alias("st_lat"), F.col("longitude").alias("st_lon"),
        F.col("start_time").alias("st_start"), F.col("end_time").alias("st_end"))

    dist = C.great_circle_distance_deg(
        F.col("ev_lat"), F.col("ev_lon"), F.col("st_lat"), F.col("st_lon"))
    radius = C.magnitude_to_radius(
        F.col("ev_mag"), minmag, maxmag, minradius_deg, maxradius_deg)
    # epoch validity: the SHARED predicate (operators.spatial.epoch_valid),
    # so the broadcast and banded variants agree on nullable epochs (a NULL
    # start_time counts as valid in both)
    from stream2segment_spark.operators.spatial import epoch_valid
    epoch_ok = epoch_valid(F.col("event_time"),
                           F.col("st_start"), F.col("st_end"))

    pairs = (ev.crossJoin(F.broadcast(st))
             .withColumn("event_distance_deg", dist)
             .filter(epoch_ok & (F.col("event_distance_deg") <= radius))
             .select("event_id", "station_id", "event_distance_deg"))
    cha = channels.select(F.col("id").alias("channel_id"),
                          F.col("station_id"))
    return pairs.join(F.broadcast(cha), "station_id", "inner") \
                .select("event_id", "station_id", "channel_id", "event_distance_deg")


def retry_mask(code, codes_null=True, url_err=True, mseed_errors=True,
               timespan_err=True, http_204=True, client_err=True,
               server_err=True):
    """The retry-policy predicate over download_code (SURVEY P11;
    reference download/modules/segments.py:163-195): NULL / -1 url error /
    -2 mseed error / -204 out-of-window / 204 no-content / 4xx / 5xx class
    selectors, each individually toggleable."""
    retry = F.lit(False)
    if codes_null:
        retry = retry | code.isNull()
    if url_err:
        retry = retry | (code == -1)
    if mseed_errors:
        retry = retry | (code == -2)
    if timespan_err:
        retry = retry | (code == -204)
    if http_204:
        retry = retry | (code == 204)
    if client_err:
        retry = retry | code.between(400, 499.9999)
    if server_err:
        retry = retry | code.between(500, 599.9999)
    return retry


def prepare_for_download_diff(
    candidates: DataFrame,
    existing: DataFrame,
    retry_codes_null: bool = True,
    retry_mseed_errors: bool = True,
    retry_client_err: bool = True,
    retry_server_err: bool = True,
    retry_timespan_err: bool = True,
    retry_204: bool = True,
    retry_url_err: bool = True,
) -> DataFrame:
    """The download diff (reference download/modules/segments.py:33-195):
    left-merge candidate segments with already-stored ones on the natural
    key (channel_id, event_id); keep rows that are new, retryable per the
    code mask, or whose requested time bounds changed.

    ``candidates`` needs (channel_id, event_id, request_start, request_end);
    ``existing`` needs the same plus ``download_code`` and ``id``.
    """
    ex = existing.select(
        "channel_id", "event_id", F.col("id").alias("db_id"),
        F.col("download_code").alias("db_code"),
        F.col("request_start").alias("db_request_start"),
        F.col("request_end").alias("db_request_end"))
    out = candidates.join(ex, ["channel_id", "event_id"], "left")

    retry = retry_mask(
        F.col("db_code"),
        codes_null=retry_codes_null, url_err=retry_url_err,
        mseed_errors=retry_mseed_errors, timespan_err=retry_timespan_err,
        http_204=retry_204, client_err=retry_client_err,
        server_err=retry_server_err)

    is_new = F.col("db_id").isNull()
    bounds_changed = (~is_new) & (
        (F.col("request_start") != F.col("db_request_start"))
        | (F.col("request_end") != F.col("db_request_end")))

    return (out.filter(is_new | retry | bounds_changed)
               .drop("db_code", "db_request_start", "db_request_end"))
