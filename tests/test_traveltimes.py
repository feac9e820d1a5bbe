"""Travel-time table creation (reference ttcreator.py:419-572): the
obspy-free spherical ray tracer is validated against closed-form
geometry (homogeneous sphere = straight chords), physical expectations
(fluid-core S shadow, monotonicity), its own convergence, and the
reference npz layout roundtrip."""

import os

import numpy as np
import pytest

from stream2segment_spark.operators.spatial import TTGrid, load_tt_grid
from stream2segment_spark.traveltimes import (
    EARTH_RADIUS_KM, VelocityModel1D, compute_grid, demo_model,
    first_arrivals, save_npz)


def _homog(v=6.0):
    return VelocityModel1D(np.array([0.0, 6371.0]), np.array([v, v]), "h")


def test_homogeneous_sphere_is_chord_time():
    """In a constant-velocity sphere rays are straight lines: the first
    arrival is exactly chord/v, at any source depth, 0..180 deg."""
    v, R = 6.0, EARTH_RADIUS_KM
    dists = np.linspace(0.0, 180.0, 721)
    for zs in (0.0, 50.0, 300.0, 123.4, 699.0):
        rs = R - zs
        tt = first_arrivals(_homog(v), zs, dists)
        chord = np.sqrt(rs**2 + R**2
                        - 2 * rs * R * np.cos(np.radians(dists))) / v
        assert not np.isnan(tt).any()
        assert np.max(np.abs(tt - chord)) < 0.01


def test_vertical_and_zero_distance():
    tt = first_arrivals(_homog(6.0), 300.0, np.array([0.0]))
    assert tt[0] == pytest.approx(50.0, abs=1e-3)     # 300 km / 6 km/s
    tt0 = first_arrivals(_homog(6.0), 0.0, np.array([0.0]))
    assert tt0[0] == pytest.approx(0.0, abs=1e-6)


def test_fluid_core_blocks_s():
    """vs = 0 in the outer core: no geometric S beyond the shadow onset;
    mantle S still arrives."""
    sm = VelocityModel1D(
        np.array([0., 35., 35., 2889., 2889., 5153.9, 5153.9, 6371.]),
        np.array([3.4, 3.9, 4.5, 7.2, 0.0, 0.0, 3.6, 3.7]), "s")
    d = np.linspace(0, 180, 181)
    tt = first_arrivals(sm, 10.0, d)
    assert np.isnan(tt[d > 90]).all()
    assert np.isfinite(tt[d <= 85]).all()
    assert 1000 < tt[60] < 1500                       # ~20 min S at 60 deg


def test_demo_model_realistic_and_monotonic():
    """The approximate whole-earth P profile lands near real-earth P
    times (ak135 P: ~372 s at 30 deg, ~600 s at 60, ~780 s at 90) and is
    monotonic in distance."""
    d = np.linspace(0, 100, 401)
    tt = first_arrivals(demo_model(), 10.0, d)
    assert not np.isnan(tt).any()
    assert np.all(np.diff(tt) > 0)
    i30, i60, i90 = 120, 240, 360
    assert 350 < tt[i30] < 395
    assert 570 < tt[i60] < 640
    assert 750 < tt[i90] < 820


def test_deeper_source_arrives_earlier_far_field():
    d = np.array([60.0, 90.0])
    t_sh = first_arrivals(demo_model(), 10.0, d)
    t_dp = first_arrivals(demo_model(), 400.0, d)
    assert np.all(t_dp < t_sh)


def test_shell_discretization_converged():
    """Default Bullen-law shells vs a 4x finer subdivision: differences
    stay far inside the table tolerance."""
    d = np.linspace(5, 175, 52)
    a = first_arrivals(demo_model(), 75.0, d)
    b = first_arrivals(demo_model(), 75.0, d, max_dr_km=5.0)
    assert np.nanmax(np.abs(a - b)) < 0.1


def test_compute_grid_meets_tolerance_and_roundtrip(tmp_path):
    """Adaptive depth refinement: bilinear interpolation at an off-grid
    depth reproduces direct computation within tt_errtol; the saved npz
    (reference ttloader.py:22-60 layout) loads through TTGrid.from_npz."""
    m = demo_model()
    tol = 1.0
    depths, dists, grid = compute_grid(
        m, tt_errtol=tol, max_source_depth_km=300.0, max_dist_deg=60.0)
    assert not np.isnan(grid).any()
    assert np.all(np.diff(depths) > 0) and np.all(np.diff(dists) > 0)
    path = str(tmp_path / "demo.npz")
    save_npz(path, depths, dists, grid, m.name, "P", tol)
    g = TTGrid.from_npz(path)
    z = 142.5                                   # off-grid probe depth
    direct = first_arrivals(m, z, dists)
    interp = g.interp(np.full(dists.shape, z), dists)
    ok = np.isfinite(direct) & np.isfinite(interp)
    assert ok.mean() > 0.99
    assert np.max(np.abs(interp[ok] - direct[ok])) < tol


def test_model_csv_parse_and_validation(tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("# depth vp vs\ndepth_km,vp,vs\n0,5.8,3.4\n35,5.8,3.4\n"
                 "35,8.0,4.5\n700,10.8,6.0\n")
    mp = VelocityModel1D.from_csv(str(p))
    assert mp.v_km_s[2] == 8.0 and len(mp.depths_km) == 4
    ms = VelocityModel1D.from_csv(str(p), column="vs")
    assert ms.v_km_s[0] == 3.4
    p2 = tmp_path / "bad.csv"
    p2.write_text("10,5.0\n20,6.0\n")           # does not start at 0
    with pytest.raises(ValueError):
        VelocityModel1D.from_csv(str(p2))


def test_spark_distributed_rows_match_local(spark):
    """compute_grid(spark=...) distributes depth rows via mapInPandas and
    must agree exactly with the local loop."""
    m = demo_model()
    kw = dict(tt_errtol=2.0, max_source_depth_km=150.0, max_dist_deg=30.0)
    d1, x1, g1 = compute_grid(m, **kw)
    d2, x2, g2 = compute_grid(m, spark=spark, **kw)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(g1, g2, atol=1e-9)


def test_load_tt_grid_model_spec(tmp_path):
    """'model:<csv>' computes a table on the fly (spatial.load_tt_grid)."""
    p = tmp_path / "m.csv"
    p.write_text("0,6.0\n6371,6.0\n")
    g = load_tt_grid(f"model:{p}")
    v = g.interp(np.array([0.0]), np.array([30.0]))
    R = EARTH_RADIUS_KM
    chord = 2 * R * np.sin(np.radians(15.0)) / 6.0
    assert abs(float(v[0]) - chord) < 1.0


def test_cli_tt_create_local(tmp_path):
    from stream2segment_spark.cli import main
    out = str(tmp_path / "demo.npz")
    rc = main(["tt-create", "-m", "demo", "-o", out, "-t", "2.0",
               "--maxdepth", "200", "--maxdist", "40", "--local"])
    assert rc == 0 and os.path.exists(out)
    g = TTGrid.from_npz(out)
    assert g.tt_sec.shape[0] >= 3
    data = np.load(out)
    assert str(data["phases"][0]) == "P"


def test_partial_depth_model_has_no_phantom_arrivals():
    """A model that stops short of the center (a crustal-only profile)
    must NOT fold bottom-exiting rays through the antipode: near-offset
    crustal arrivals are finite, far-field distances are NaN."""
    m = VelocityModel1D(np.array([0., 20., 20., 50.]),
                        np.array([5.8, 5.8, 6.5, 6.5]), "crust")
    d = np.array([0.1, 0.5, 1.0, 2.0, 30.0, 90.0, 180.0])
    tt = first_arrivals(m, 10.0, d)
    assert np.isfinite(tt[d <= 2.0]).all()
    assert np.isnan(tt[d >= 30.0]).all()
    assert 16 < tt[2] < 21          # ~1 deg through ~6 km/s crust
