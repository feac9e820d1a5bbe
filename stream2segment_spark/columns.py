"""Derived-column expression library — the reference's hybrid properties
(SURVEY §1.2) as pure ``pyspark.sql.Column`` expressions.

Each derived attribute in the reference exists twice (Python instance impl +
SQL expression via ``hybrid_property``, e.g. process/db/models.py:261-315,
io/db/models.py:402-423). Here each exists ONCE as a Column factory: usable
in select / filter / SQL alike, codegen'd JVM-side, and registered on the
schema graph so the selection compiler resolves them like physical columns.

Factories take a ``resolver(name) -> Column`` so they work both on raw
tables and inside the compiler's prefixed join frames. A dotted name in a
factory (``'channel.location'``) reaches a relationship listed in
``requires_rels`` that the compiler joins first.

Cross-dialect concerns (the reference compiles per-backend SQL via
``@compiles``, io/db/sqlconstructs.py:14-181) vanish: one engine, one
expression library.
"""

from __future__ import annotations

import math
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream2segment_spark.schema import DerivedColumn, SchemaGraph

DEG2KM = 2.0 * 6371.0 * math.pi / 360.0
MINISEED_READ_ERROR_CODE = -2  # reference: download/modules/utils.py s2scodes


# --------------------------------------------------------------------------
# Reusable expression builders (importable directly for ad-hoc queries)
# --------------------------------------------------------------------------

def withdata(col: Column) -> Column:
    """Non-null AND non-empty blob/string (reference io/db/models.py:128-146)."""
    return col.isNotNull() & (F.length(col) > 0)


def epoch_seconds(ts: Column) -> Column:
    """Timestamp -> fractional epoch seconds (microsecond precision).

    ``unix_timestamp`` truncates to whole seconds; casting to double keeps
    the fraction (reference duration math is microsecond-exact,
    process/db/models.py:269-278). TIMESTAMP_NTZ (how parquet ms/us
    timestamps surface) can't cast to double directly, so normalize through
    TIMESTAMP first — an identity under the UTC session timezone."""
    return ts.cast("timestamp").cast("double")


def duration_sec(start: Column, end: Column) -> Column:
    return epoch_seconds(end) - epoch_seconds(start)


def missing_data_sec(start: Column, end: Column,
                     request_start: Column, request_end: Column) -> Column:
    return duration_sec(request_start, request_end) - duration_sec(start, end)


def missing_data_ratio(start: Column, end: Column,
                       request_start: Column, request_end: Column) -> Column:
    return F.lit(1.0) - (duration_sec(start, end) /
                         duration_sec(request_start, request_end))


def deg2km(deg: Column) -> Column:
    return deg * F.lit(DEG2KM)


def great_circle_distance_deg(lat1: Column, lon1: Column,
                              lat2: Column, lon2: Column) -> Column:
    """Spherical great-circle distance in degrees (Vincenty formula on the
    sphere), reference download/modules/stationsearch.py:157-189 — pure
    built-ins, whole-stage-codegen'd; no UDF needed."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dlon = F.radians(lon2) - F.radians(lon1)
    num = F.sqrt(
        F.pow(F.cos(p2) * F.sin(dlon), 2)
        + F.pow(F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dlon), 2)
    )
    den = F.sin(p1) * F.sin(p2) + F.cos(p1) * F.cos(p2) * F.cos(dlon)
    return F.degrees(F.atan2(num, den))


def magnitude_to_radius(mag: Column, minmag: float, maxmag: float,
                        minradius: float, maxradius: float) -> Column:
    """Piecewise-linear magnitude -> search radius with clamping
    (reference download/modules/stationsearch.py:206-244)."""
    if minmag == maxmag:
        return F.when(mag < F.lit(minmag), F.lit(minradius)).otherwise(F.lit(maxradius))
    slope = (maxradius - minradius) / (maxmag - minmag)
    interp = F.lit(minradius) + F.lit(slope) * (mag - F.lit(minmag))
    return F.least(F.greatest(interp, F.lit(minradius)), F.lit(maxradius))


def seed_id_expr(data_seed_id: Column, net: Column, sta: Column,
                 loc: Column, cha: Column) -> Column:
    """CASE WHEN data_seed_id IS NOT NULL THEN it ELSE net.sta.loc.cha
    (reference correlated subquery + CASE, process/db/models.py:554-584,
    rewritten as join + coalesce)."""
    return F.coalesce(data_seed_id, F.concat_ws(".", net, sta, loc, cha))


def round_to_second(t: Column) -> Column:
    """Round a timestamp to the NEAREST second (reference
    download/modules/segments.py:214-216 rounds request windows; F11) —
    not a truncation: .5s and up rounds forward."""
    return F.timestamp_seconds(
        F.round(F.unix_micros(t) / 1e6, 0).cast("long"))


def wildcard_to_like(pattern: str) -> str:
    """FDSN wildcards (* ?) -> SQL LIKE pattern, escaping % and _
    (reference strconvert, download/modules/utils.py:786-850)."""
    return (pattern.replace("%", r"\%").replace("_", r"\_")
            .replace("*", "%").replace("?", "_"))


def sds_path(net: Column, sta: Column, loc: Column, cha: Column,
             t: Column, root: str = "", dtype: str = "D") -> Column:
    """SeisComP SDS archive path (reference Segment.sds_path,
    process/db/models.py:323-347; public SDS layout):
    ``<root>/YEAR/NET/STA/CHAN.TYPE/NET.STA.LOC.CHAN.TYPE.YEAR.DOY``
    with DOY zero-padded to 3 — pure expressions (F15/K6)."""
    year = F.date_format(t, "yyyy")
    doy = F.format_string("%03d", F.dayofyear(t))
    fname = F.concat_ws(".", net, sta, loc, cha, F.lit(dtype), year, doy)
    parts = [year, net, sta, F.concat_ws(".", cha, F.lit(dtype)), fname]
    if root:
        parts = [F.lit(root)] + parts
    return F.concat_ws("/", *parts)


def wildcard_to_regex(pattern: str) -> str:
    """FDSN wildcards -> anchored regex (reference strconvert.wild2re)."""
    import re as _re
    out = [".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
           for ch in pattern]
    return "^" + "".join(out) + "$"


# --------------------------------------------------------------------------
# Registration on the seismic graph
# --------------------------------------------------------------------------

_R = Callable[[str], Column]


def register_seismic_derived(graph: SchemaGraph) -> SchemaGraph:
    """Attach every reference hybrid property to the seismic SchemaGraph so
    the selection compiler accepts them as attributes
    (user-facing list: reference process/__init__.py:227-362)."""

    seg = graph.table("segments")
    sta = graph.table("stations")
    cha = graph.table("channels")

    def d(tbl, name, factory, pytype, requires=(), sql=None):
        tbl.derived[name] = DerivedColumn(name, factory, pytype,
                                          tuple(requires), sql)

    # --- segments ---------------------------------------------------------
    d(seg, "has_data", lambda c: withdata(c("data")), bool,
      sql="(data IS NOT NULL AND octet_length(data) > 0)")
    d(seg, "has_valid_data",
      lambda c: (withdata(c("data")) & c("download_code").isNotNull()
                 & (c("download_code") != MINISEED_READ_ERROR_CODE)),
      bool,
      sql="(data IS NOT NULL AND octet_length(data) > 0 AND download_code IS NOT "
          f"NULL AND download_code != {MINISEED_READ_ERROR_CODE})")
    d(seg, "event_distance_km", lambda c: deg2km(c("event_distance_deg")), float,
      sql=f"(event_distance_deg * {DEG2KM!r})")
    d(seg, "duration_sec",
      lambda c: duration_sec(c("start_time"), c("end_time")), float,
      sql="(epoch(end_time) - epoch(start_time))")
    d(seg, "missing_data_sec",
      lambda c: missing_data_sec(c("start_time"), c("end_time"),
                                 c("request_start"), c("request_end")), float,
      sql="((epoch(request_end) - epoch(request_start)) - "
          "(epoch(end_time) - epoch(start_time)))")
    d(seg, "missing_data_ratio",
      lambda c: missing_data_ratio(c("start_time"), c("end_time"),
                                   c("request_start"), c("request_end")), float,
      sql="(1.0 - (epoch(end_time) - epoch(start_time)) / "
          "(epoch(request_end) - epoch(request_start)))")
    d(seg, "seed_id",
      lambda c: seed_id_expr(c("data_seed_id"),
                             c("station.network"), c("station.station"),
                             c("channel.location"), c("channel.channel")),
      str, requires=("station", "channel"))

    # classlabels_count: correlated COUNT subquery
    # (process/db/models.py:307-315) -> groupBy + broadcast left join
    def _attach_classlabels_count(df: DataFrame, dfs: dict[str, DataFrame]):
        col = F.coalesce(F.col("__clc__count"), F.lit(0))
        if "__clc__count" in df.columns:
            # already attached (the attribute can be resolved twice in
            # one query: a condition AND an orderby) — joining again
            # would duplicate __clc__* and make every reference
            # ambiguous
            return df, col
        counts = (dfs["class_labellings"]
                  .groupBy(F.col("segment_id").alias("__clc__segment_id"))
                  .agg(F.count("*").alias("__clc__count")))
        out = df.join(F.broadcast(counts),
                      df["id"] == F.col("__clc__segment_id"), "left")
        return out, col

    clc = DerivedColumn("classlabels_count", lambda c: F.lit(0), int)
    clc.attach = _attach_classlabels_count  # type: ignore[attr-defined]
    seg.derived["classlabels_count"] = clc

    # --- stations -----------------------------------------------------------
    d(sta, "has_inventory", lambda c: withdata(c("inventory_xml")), bool,
      sql="(inventory_xml IS NOT NULL AND octet_length(inventory_xml) > 0)")
    d(sta, "netsta_code",
      lambda c: F.concat_ws(".", c("network"), c("station")), str,
      sql="concat(network, '.', station)")

    # --- channels (process/db/models.py:99-151) -----------------------------
    d(cha, "band_code", lambda c: F.substring(c("channel"), 1, 1), str,
      sql="substr(channel, 1, 1)")
    d(cha, "instrument_code", lambda c: F.substring(c("channel"), 2, 1), str,
      sql="substr(channel, 2, 1)")
    d(cha, "orientation_code", lambda c: F.substring(c("channel"), 3, 1), str,
      sql="substr(channel, 3, 1)")
    d(cha, "band_instrument_code", lambda c: F.substring(c("channel"), 1, 2), str,
      sql="substr(channel, 1, 2)")
    return graph
