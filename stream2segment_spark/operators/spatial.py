"""Spatio-temporal event/station matching (SURVEY J3) and travel-time
grid interpolation (N13).

Reference behavior: download/modules/stationsearch.py:26-154 computes, for
every event, the great-circle distance to every station, keeps stations
within a (possibly magnitude-dependent) search radius and a valid epoch,
and enriches each candidate with ``arrival_time = event.time +
travel_time(depth, distance)`` interpolated from a precomputed grid
(traveltimes/ttloader.py:17-120, scipy griddata).

Spark-first design:

- The naive shape is ``events.crossJoin(broadcast(stations))`` + range
  predicate. That is O(|E|x|S|) pairs regardless of selectivity — fine for
  a 10k-station dim, catastrophic at 100 TB of events against large
  station sets. The default here is a **latitude-banded equi-join**: each
  station lands in one floor(lat/band) bucket, each event explodes to the
  few buckets its search radius can reach, and the theta predicate runs
  only within matching bands. Pair count drops by ~180/(2r+band) with zero
  semantic change; the join is a plain shuffle equi-join that AQE can
  re-plan, and the distance filter stays whole-stage-codegen.
- Travel-time lookup: the grid is tiny (a few MB) — broadcast the numpy
  arrays once, interpolate per Arrow batch with vectorized bilinear
  interpolation (no scipy dependency).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream2segment_spark.columns import (
    great_circle_distance_deg, magnitude_to_radius)


# --------------------------------------------------------------------------
# Travel-time grid (N13)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class TTGrid:
    """Regular 2D travel-time grid: ``tt[i, j]`` = seconds for
    ``depths_km[i]``, ``distances_deg[j]`` (reference npz layout,
    traveltimes/ttloader.py:22-60, regularized)."""
    depths_km: np.ndarray      # (nd,) ascending
    distances_deg: np.ndarray  # (nx,) ascending
    tt_sec: np.ndarray         # (nd, nx)

    @classmethod
    def from_function(cls, fn, depths, distances) -> "TTGrid":
        d = np.asarray(depths, dtype=float)
        x = np.asarray(distances, dtype=float)
        grid = fn(d[:, None], x[None, :]).astype(float)
        return cls(d, x, grid)

    @classmethod
    def from_npz(cls, path: str) -> "TTGrid":
        """Load a precomputed travel-time table in the reference's
        published npz layout (traveltimes/ttloader.py:22-60: keys
        ``sourcedepths`` (n,), ``distances`` (m,), ``traveltimes``
        (n, m), plus scalar metadata) — the format of the shipped
        ak135/iasp91 model files (resources/traveltimes/*.npz).

        Only receiver-depth-0 tables are supported (all shipped models
        are; the reference collapses that dimension too when receiver
        depths are unique, ttloader.py:50-57)."""
        data = np.load(path)
        try:
            depths = np.asarray(data["sourcedepths"], dtype=float)
            dists = np.asarray(data["distances"], dtype=float)
            tt = np.asarray(data["traveltimes"], dtype=float)
            rdepths = np.asarray(data.get("receiverdepths", [0.0]),
                                 dtype=float)
        except KeyError as exc:
            raise ValueError(
                f"{path}: not a travel-time npz table (missing {exc})")
        if np.unique(rdepths).size > 1:
            raise ValueError(
                f"{path}: tables with multiple receiver depths are not "
                "supported (all published models use receiver depth 0)")
        if tt.shape != (depths.size, dists.size):
            raise ValueError(
                f"{path}: traveltimes shape {tt.shape} != "
                f"(n_depths={depths.size}, n_distances={dists.size})")
        if np.any(np.diff(depths) <= 0) or np.any(np.diff(dists) <= 0):
            raise ValueError(f"{path}: grid axes must be strictly ascending")
        return cls(depths, dists, tt)

    def interp(self, depth, dist) -> np.ndarray:
        """Vectorized bilinear interpolation, clipped to the grid hull
        (the reference clips queries to the table bounds too)."""
        d = np.clip(np.asarray(depth, float),
                    self.depths_km[0], self.depths_km[-1])
        x = np.clip(np.asarray(dist, float),
                    self.distances_deg[0], self.distances_deg[-1])
        i = np.clip(np.searchsorted(self.depths_km, d, "right") - 1,
                    0, len(self.depths_km) - 2)
        j = np.clip(np.searchsorted(self.distances_deg, x, "right") - 1,
                    0, len(self.distances_deg) - 2)
        d0, d1 = self.depths_km[i], self.depths_km[i + 1]
        x0, x1 = self.distances_deg[j], self.distances_deg[j + 1]
        wd = np.where(d1 > d0, (d - d0) / (d1 - d0), 0.0)
        wx = np.where(x1 > x0, (x - x0) / (x1 - x0), 0.0)
        g = self.tt_sec
        return ((1 - wd) * (1 - wx) * g[i, j] + wd * (1 - wx) * g[i + 1, j]
                + (1 - wd) * wx * g[i, j + 1] + wd * wx * g[i + 1, j + 1])


def load_tt_grid(spec: str) -> TTGrid:
    """Resolve the download config's ``traveltimes`` value to a grid:

    - a path to an ``.npz`` table in the reference layout (e.g. the
      ak135/iasp91 files a stream2segment install ships) ->
      :meth:`TTGrid.from_npz`;
    - ``"uniform:<v_km_s>"`` (e.g. ``uniform:5.0``) -> a constant-velocity
      half-space model built on a 0-700 km x 0-180 deg grid — the
      self-contained option when no precomputed table is at hand;
    - ``"model:<path.csv>"`` / ``"model:demo"`` -> compute a first-arrival
      table on the fly from a 1-D velocity model via the obspy-free ray
      tracer (traveltimes.py; ~seconds of driver time at the default 0.5 s
      tolerance — precompute with ``s2s tt-create`` for repeated runs).
    """
    if isinstance(spec, str) and spec.startswith("model:"):
        from stream2segment_spark.traveltimes import (
            VelocityModel1D, compute_grid, demo_model)
        what = spec.split(":", 1)[1]
        model = demo_model() if what == "demo" else \
            VelocityModel1D.from_csv(what)
        depths, dists, grid = compute_grid(model)
        return TTGrid(depths, dists, grid)
    if isinstance(spec, str) and spec.startswith("uniform:"):
        try:
            v = float(spec.split(":", 1)[1])
        except ValueError:
            raise ValueError(f"bad uniform travel-time spec {spec!r}; "
                             "expected e.g. 'uniform:5.0'")
        if v <= 0:
            raise ValueError(f"velocity must be positive, got {v}")
        deg2km = 111.195

        def tt(depth_km, dist_deg):
            return np.hypot(depth_km, dist_deg * deg2km) / v

        return TTGrid.from_function(
            tt, np.linspace(0.0, 700.0, 36), np.linspace(0.0, 180.0, 721))
    if isinstance(spec, str) and spec.endswith(".npz"):
        return TTGrid.from_npz(spec)
    raise ValueError(
        f"traveltimes: expected an .npz table path or 'uniform:<v_km_s>', "
        f"got {spec!r}")


def travel_time_expr(grid: TTGrid):
    """Pure-expression bilinear interpolation over a REGULARLY-SPACED
    travel-time grid — the whole-stage-codegen twin of
    :func:`travel_time_udf`: cell indices by floor-divide, grid corners
    by ``element_at`` on array literals (a TT grid is a few hundred
    doubles — far under expression-size limits), weights and the 4-corner
    blend in the same operation order as :meth:`TTGrid.interp`.

    MEASURED SLOWER than :func:`travel_time_udf` on the sf0.1 spatial
    join (2.4 vs 1.9 s warm): one Arrow round-trip + batched numpy beats
    the ~60 scalar codegen ops/row this expands to. Kept as the
    no-Python-workers option (e.g. pure-SQL deployments); also the only
    path usable inside generated SQL views."""
    d_arr, x_arr, g = grid.depths_km, grid.distances_deg, grid.tt_sec
    dstep = float(d_arr[1] - d_arr[0])
    xstep = float(x_arr[1] - x_arr[0])
    if not (np.allclose(np.diff(d_arr), dstep)
            and np.allclose(np.diff(x_arr), xstep)):
        raise ValueError("travel_time_expr needs a regularly spaced grid; "
                         "use travel_time_udf for irregular ones")
    nd, nx = g.shape
    # true array LITERALS (F.lit of a list), not CreateArray of 273
    # literal children — the latter re-evaluates per row (measured ~1.5x
    # slower end-to-end on the spatial join)
    G = F.lit([float(v) for v in g.reshape(-1)])
    D = F.lit([float(v) for v in d_arr])
    X = F.lit([float(v) for v in x_arr])

    def _col(depth: Column, dist: Column) -> Column:
        d = F.least(F.greatest(depth.cast("double"),
                               F.lit(float(d_arr[0]))),
                    F.lit(float(d_arr[-1])))
        x = F.least(F.greatest(dist.cast("double"),
                               F.lit(float(x_arr[0]))),
                    F.lit(float(x_arr[-1])))
        i = F.least(F.greatest(F.floor((d - float(d_arr[0])) / dstep)
                               .cast("int"), F.lit(0)), F.lit(nd - 2))
        j = F.least(F.greatest(F.floor((x - float(x_arr[0])) / xstep)
                               .cast("int"), F.lit(0)), F.lit(nx - 2))
        d0, d1 = F.element_at(D, i + 1), F.element_at(D, i + 2)
        x0, x1 = F.element_at(X, j + 1), F.element_at(X, j + 2)
        wd = F.when(d1 > d0, (d - d0) / (d1 - d0)).otherwise(F.lit(0.0))
        wx = F.when(x1 > x0, (x - x0) / (x1 - x0)).otherwise(F.lit(0.0))
        flat = i * nx + j + 1
        g00, g10 = F.element_at(G, flat), F.element_at(G, flat + nx)
        g01, g11 = F.element_at(G, flat + 1), F.element_at(G, flat + nx + 1)
        return ((1 - wd) * (1 - wx) * g00 + wd * (1 - wx) * g10
                + (1 - wd) * wx * g01 + wd * wx * g11)

    return _col


def travel_time_udf(spark, grid: TTGrid):
    """Broadcast the grid arrays once; (depth_km, dist_deg) -> seconds as a
    vectorized pandas UDF over Arrow batches (reference H10: one batched
    griddata call for all events)."""
    bc = spark.sparkContext.broadcast(
        (grid.depths_km, grid.distances_deg, grid.tt_sec))

    @F.pandas_udf("double")
    def _udf(depth: pd.Series, dist: pd.Series) -> pd.Series:
        g = TTGrid(*bc.value)
        return pd.Series(g.interp(depth.to_numpy(), dist.to_numpy()))
    return _udf


# --------------------------------------------------------------------------
# Event x station spatio-temporal join (J3)
# --------------------------------------------------------------------------

def epoch_valid(event_time: Column, sta_start: Column, sta_end: Column) -> Column:
    """Station epoch validity (reference stationsearch.py:84-86):
    ``start <= event_time AND (end IS NULL OR end >= event_time + 1 day)``."""
    return ((sta_start.isNull() | (sta_start <= event_time))
            & (sta_end.isNull()
               | (sta_end >= event_time + F.expr("INTERVAL 1 DAY"))))


def merge_events_stations(
    events: DataFrame,
    stations: DataFrame,
    minmag: float, maxmag: float, minmag_radius: float, maxmag_radius: float,
    tt_udf=None,
    band_deg: float | None = None,
    check_epoch: bool = True,
) -> DataFrame:
    """Candidate (event, station) pairs within the magnitude-dependent
    search radius, with great-circle ``dist_deg`` and (if ``tt_udf``)
    ``arrival_time = time + travel_time`` columns.

    ``events`` needs (time, latitude, longitude, depth_km, magnitude) and
    its id columns; ``stations`` needs (latitude, longitude) [+ start_time/
    end_time for the epoch test] and its id columns. All non-key columns
    are kept with ``ev_``/``sta_`` prefixes dropped as provided.

    ``band_deg=None`` picks the max search radius (every reachable pair is
    within +-maxr latitude, so one cell of that width per side suffices).

    Banding is 2D: stations land in one (lat_band, lon_band) cell; events
    explode to every cell their radius circle can touch. The longitude
    half-width is widened by 1/cos(|lat|+r) (meridians converge toward the
    poles) and lon bands wrap modulo 360; events whose circle crosses a
    pole fall back to all-longitudes for their latitude bands — exactness
    is never traded for pruning.
    """
    maxr = max(minmag_radius, maxmag_radius)
    band = float(band_deg) if band_deg else maxr
    n_lon = max(int(360.0 // band), 1)
    radius = magnitude_to_radius(F.col("magnitude"), minmag, maxmag,
                                 minmag_radius, maxmag_radius)
    ev = events.withColumn("__radius", radius)
    sta = stations.withColumn(
        "__latb", F.floor(F.col("latitude") / F.lit(band)).cast("long")
    ).withColumn(
        "__lonb",
        (F.floor((F.col("longitude") + 180.0) / F.lit(band)).cast("long")
         % n_lon))
    # longitude half-width at the worst latitude inside the window
    abslat = F.least(F.abs(F.col("latitude")) + F.col("__radius"), F.lit(90.0))
    near_pole = abslat >= 89.0
    lon_half = F.when(near_pole, F.lit(180.0)) \
        .otherwise(F.least(F.col("__radius") / F.cos(F.radians(abslat)),
                           F.lit(180.0)))
    ev = ev.withColumn(
        "__latb",
        F.explode(F.sequence(
            F.floor((F.col("latitude") - F.col("__radius")) / F.lit(band)),
            F.floor((F.col("latitude") + F.col("__radius")) / F.lit(band))))
    ).withColumn(
        "__lonb",
        # distinct: a full-circle window wraps onto the same cells twice
        F.explode(F.array_distinct(F.transform(
            F.sequence(
                F.floor((F.col("longitude") + 180.0 - lon_half) / F.lit(band)),
                F.floor((F.col("longitude") + 180.0 + lon_half) / F.lit(band))),
            lambda k: ((k % n_lon) + n_lon) % n_lon))))

    e, s = ev.alias("e"), sta.alias("s")
    dist = great_circle_distance_deg(
        F.col("e.latitude"), F.col("e.longitude"),
        F.col("s.latitude"), F.col("s.longitude"))
    # cheap necessary pre-filter BEFORE the ~20-trig-op great-circle
    # term (r10 opt round): cos(dist) = sinφ1·sinφ2 + cosφ1·cosφ2·cosΔλ
    # <= cos(φ1-φ2), so dist >= |Δlat| and dist <= r implies
    # |Δlat| <= r — the test can never drop a true pair, and the And
    # short-circuits the trig for the band-candidates it rejects
    # (measured at sf0.1: 1.63M band candidates -> 0.59M reach the trig,
    # 0.32M survive).
    lat_near = (F.abs(F.col("e.latitude") - F.col("s.latitude"))
                <= F.col("e.__radius"))
    cond = ((F.col("e.__latb") == F.col("s.__latb"))
            & (F.col("e.__lonb") == F.col("s.__lonb"))
            & lat_near
            & (dist <= F.col("e.__radius")))
    if check_epoch:
        cond = cond & epoch_valid(F.col("e.time"),
                                  F.col("s.start_time"), F.col("s.end_time"))
    out = (e.join(s, cond).withColumn("dist_deg", dist)
           .drop("__latb", "__lonb", "__radius"))
    if tt_udf is not None:
        tt = tt_udf(F.col("depth_km"), F.col("dist_deg"))
        out = (out.withColumn("travel_time_sec", tt)
               .withColumn(
                   "arrival_time",
                   F.timestamp_micros(
                       (F.unix_micros(F.col("time"))
                        + (F.col("travel_time_sec") * 1e6).cast("long")))))
    return out
