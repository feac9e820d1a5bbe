"""Unit tests for the spatial theta-join (J3) and travel-time grid (N13)."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream2segment_spark.operators import spatial as SP


def test_ttgrid_bilinear_exact_on_linear_fn():
    g = SP.TTGrid.from_function(lambda d, x: 2.0 * d + 10.0 * x,
                                np.arange(0, 61, 5), np.arange(0, 5.1, 0.25))
    d = np.array([0.0, 7.3, 60.0, 33.33])
    x = np.array([0.0, 1.234, 5.0, 2.5])
    np.testing.assert_allclose(g.interp(d, x), 2 * d + 10 * x, rtol=1e-12)


def test_ttgrid_clips_to_hull():
    g = SP.TTGrid.from_function(lambda d, x: d + x,
                                np.array([0.0, 10.0]), np.array([0.0, 1.0]))
    assert g.interp(np.array([-5.0]), np.array([99.0]))[0] == pytest.approx(1.0)
    assert g.interp(np.array([20.0]), np.array([-1.0]))[0] == pytest.approx(10.0)


def _write_ref_npz(path, depths, dists, tt, rdepths=None):
    """Synthetic table in the reference's published npz layout
    (traveltimes/ttloader.py:22-60) — the metadata keys the loader
    ignores are present so the layout is faithful."""
    np.savez_compressed(
        path,
        sourcedepths=depths, distances=dists, traveltimes=tt,
        receiverdepths=(np.zeros_like(depths) if rdepths is None
                        else rdepths),
        deg2km=111.195, swave_velocity=3, pwave_velocity=5,
        phases=np.array([b"ttp+"]), modelname=b"synthetic",
        sourcedepth_bounds_km=np.array([depths[0], depths[-1]]),
        receiverdepth_bounds_km=np.array([0.0, 0.0]),
        distances_bounds_deg=np.array([dists[0], dists[-1]]),
        distances_step_deg=float(dists[1] - dists[0]), tt_errtol=5)


def test_ttgrid_from_npz_reference_layout(tmp_path):
    # irregular depth axis, like the shipped ak135/iasp91 tables
    depths = np.array([0.0, 30.1, 69.2, 150.0])
    dists = np.arange(0.0, 10.1, 0.5)
    tt = 2.0 * depths[:, None] + 10.0 * dists[None, :]
    p = tmp_path / "model.npz"
    _write_ref_npz(p, depths, dists, tt.astype(np.float32))
    g = SP.TTGrid.from_npz(str(p))
    # node-exact and bilinear between nodes (linear fn -> exact)
    d = np.array([0.0, 45.0, 150.0])
    x = np.array([0.0, 3.3, 10.0])
    np.testing.assert_allclose(g.interp(d, x), 2 * d + 10 * x, rtol=1e-6)


def test_ttgrid_from_npz_rejects_bad_tables(tmp_path):
    depths = np.array([0.0, 10.0])
    dists = np.array([0.0, 1.0, 2.0])
    tt = np.zeros((2, 3))
    p = tmp_path / "bad.npz"
    _write_ref_npz(p, depths, dists, np.zeros((3, 2)))
    with pytest.raises(ValueError, match="shape"):
        SP.TTGrid.from_npz(str(p))
    _write_ref_npz(p, depths, dists, tt, rdepths=np.array([0.0, 5.0]))
    with pytest.raises(ValueError, match="receiver depths"):
        SP.TTGrid.from_npz(str(p))
    np.savez_compressed(p, foo=np.arange(3))
    with pytest.raises(ValueError, match="not a travel-time npz"):
        SP.TTGrid.from_npz(str(p))


def test_load_tt_grid_specs(tmp_path):
    g = SP.load_tt_grid("uniform:5.0")
    # surface event at 1 degree: tt = 111.195 km / 5 km/s
    np.testing.assert_allclose(
        g.interp(np.array([0.0]), np.array([1.0])), [111.195 / 5.0],
        rtol=1e-9)
    with pytest.raises(ValueError):
        SP.load_tt_grid("uniform:fast")
    with pytest.raises(ValueError):
        SP.load_tt_grid("ak135_ttp+")  # names aren't resolvable: need a path


def test_ttgrid_loads_published_model_if_present():
    """Compatibility with a real stream2segment install's model files
    (skipped when no reference checkout is around)."""
    import os
    path = ("/root/reference/stream2segment/resources/traveltimes/"
            "ak135_ttp+.npz")
    if not os.path.exists(path):
        pytest.skip("no reference model file available")
    g = SP.TTGrid.from_npz(path)
    assert g.tt_sec.shape == (g.depths_km.size, g.distances_deg.size)
    # physical sanity: tt grows with distance for a surface source
    tts = g.interp(np.zeros(3), np.array([1.0, 10.0, 60.0]))
    assert 0 < tts[0] < tts[1] < tts[2]


def _mini_frames(spark):
    events = spark.createDataFrame(
        [(1, datetime(2020, 1, 10), 0.0, 0.0, 10.0, 5.0),
         (2, datetime(2020, 1, 10), 50.0, 100.0, 20.0, 7.0)],
        "event_id long, time timestamp, latitude double, longitude double, "
        "depth_km double, magnitude double")
    stations = spark.createDataFrame(
        [(101, 0.5, 0.5, datetime(2000, 1, 1), None),     # ~0.7 deg from ev1
         (102, 40.0, 40.0, datetime(2000, 1, 1), None),   # far from both
         (103, 51.0, 101.0, datetime(2000, 1, 1), None),  # ~1.2 deg from ev2
         (104, 0.5, 0.5, datetime(2021, 1, 1), None),     # epoch starts late
         (105, 0.5, 0.5, datetime(2000, 1, 1), datetime(2020, 1, 10, 12))],
        "station_id long, latitude double, longitude double, "
        "start_time timestamp, end_time timestamp")
    return events, stations


def test_merge_events_stations_radius_and_epoch(spark):
    events, stations = _mini_frames(spark)
    out = SP.merge_events_stations(events, stations,
                                   minmag=3, maxmag=7,
                                   minmag_radius=1, maxmag_radius=3)
    pairs = sorted((r["event_id"], r["station_id"]) for r in out.collect())
    # ev1 (mag5 -> r=2): station 101 in range; 104 not yet installed;
    # 105 ends < time+1day. ev2 (mag7 -> r=3): station 103.
    assert pairs == [(1, 101), (2, 103)]
    d = {(r["event_id"], r["station_id"]): r["dist_deg"] for r in out.collect()}
    assert d[(1, 101)] == pytest.approx(0.7071, abs=1e-3)


def test_merge_no_epoch_and_banding_consistency(spark):
    events, stations = _mini_frames(spark)
    base = SP.merge_events_stations(events, stations, 3, 7, 1, 3,
                                    check_epoch=False)
    narrow = SP.merge_events_stations(events, stations, 3, 7, 1, 3,
                                      check_epoch=False, band_deg=0.7)
    assert sorted((r["event_id"], r["station_id"]) for r in base.collect()) \
        == sorted((r["event_id"], r["station_id"]) for r in narrow.collect())


def test_broadcast_and_banded_variants_agree_on_null_epochs(spark):
    """Round-1 advice: both merge_events_stations variants must share
    epoch_valid — a NULL station start_time is a valid (open-start) epoch
    in the broadcast variant too."""
    from datetime import datetime as dt

    from stream2segment_spark.operators import joins as J
    events, stations = _mini_frames(spark)
    stations = stations.unionByName(spark.createDataFrame(
        [(106, 0.6, 0.6, None, None)],   # NULL start: valid forever
        stations.schema))
    banded = SP.merge_events_stations(events, stations, 3, 7, 1, 3)
    ev = events.select(F.col("event_id").alias("id"), "time", "latitude",
                       "longitude", "magnitude")
    st = stations.select(F.col("station_id").alias("id"), "latitude",
                         "longitude", "start_time", "end_time")
    cha = spark.createDataFrame(
        [(r["station_id"] * 10, r["station_id"])
         for r in stations.collect()], "id long, station_id long")
    bcast = J.merge_events_stations(ev, st, cha, 3, 7, 1, 3)
    b_pairs = sorted({(r["event_id"], r["station_id"])
                      for r in bcast.collect()})
    n_pairs = sorted((r["event_id"], r["station_id"])
                     for r in banded.collect())
    assert b_pairs == n_pairs
    assert (1, 106) in b_pairs   # the NULL-start station is matched


def test_arrival_time_from_grid(spark):
    events, stations = _mini_frames(spark)
    g = SP.TTGrid.from_function(lambda d, x: 2.0 * d + 10.0 * x,
                                np.arange(0, 61, 5), np.arange(0, 5.1, 0.25))
    out = SP.merge_events_stations(
        events, stations, 3, 7, 1, 3, tt_udf=SP.travel_time_udf(spark, g))
    row = {r["event_id"]: r for r in out.collect()}[1]
    expect_tt = 2 * 10.0 + 10 * row["dist_deg"]
    assert row["travel_time_sec"] == pytest.approx(expect_tt, rel=1e-9)
    delta = (row["arrival_time"] - row["time"]).total_seconds()
    assert delta == pytest.approx(expect_tt, abs=1e-5)


def test_travel_time_expr_matches_udf(spark):
    """The codegen'd bilinear interpolation equals the pandas-UDF path on
    random in-hull, boundary, and out-of-hull (clipped) points."""
    import numpy as np
    from pyspark.sql import functions as F

    g = SP.TTGrid.from_function(lambda d, x: 1.7 * d + 9.3 * x + 0.5 * d * x,
                                np.arange(0.0, 61.0, 5.0),
                                np.arange(0.0, 5.01, 0.25))
    rng = np.random.default_rng(7)
    depth = np.concatenate([rng.uniform(-5, 70, 200),
                            g.depths_km, [0.0, 60.0]])
    dist = np.concatenate([rng.uniform(-1, 6, 200),
                           np.resize(g.distances_deg, len(g.depths_km)),
                           [0.0, 5.0]])
    df = spark.createDataFrame(
        [(float(d), float(x)) for d, x in zip(depth, dist)],
        "depth double, dist double")
    expr_col = SP.travel_time_expr(g)(F.col("depth"), F.col("dist"))
    udf_col = SP.travel_time_udf(spark, g)(F.col("depth"), F.col("dist"))
    rows = df.select(expr_col.alias("e"), udf_col.alias("u")).collect()
    for r in rows:
        assert abs(r["e"] - r["u"]) < 1e-9


def test_travel_time_expr_rejects_irregular_grid():
    import numpy as np
    import pytest as _pytest
    g = SP.TTGrid(np.array([0.0, 1.0, 5.0]), np.array([0.0, 0.5, 1.0]),
                  np.zeros((3, 3)))
    with _pytest.raises(ValueError, match="regular"):
        SP.travel_time_expr(g)
