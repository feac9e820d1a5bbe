"""Travel-time table creation from a 1-D velocity model (reference
``traveltimes/ttcreator.py:419-572``), obspy-free and Spark-parallel.

Reference behavior: the reference builds a ``(source_depth, distance)``
grid of minimum (first-arrival) travel times by calling obspy TauP for a
named earth model, adaptively halving the source-depth step until linear
interpolation between grid rows reproduces directly-computed times within
``tt_errtol`` seconds (ttcreator.py:240-330, StepIterator), then saves the
grid as an npz consumed by ``ttloader.py:22-60``.

This module recomputes first-arrival times from first principles, using
only public, textbook ray theory (Aki & Richards ch. 9; Shearer,
*Introduction to Seismology* ch. 4 — the same theory TauP implements):

- The earth model is a stack of thin constant-velocity spherical shells
  (knots of a user-supplied 1-D ``depth_km, v_km_s`` profile, linearly
  interpolated between knots; repeated depths mark discontinuities).
- For ray parameter ``p = r sin(i) / v`` (s/rad), the epicentral-distance
  and travel-time integrals through a constant-velocity shell
  ``[r_bot, r_top]`` have closed forms::

      dDelta = acos(p v / r_top) - acos(p v / r_bot)
      dT     = (sqrt(r_top^2 - (p v)^2) - sqrt(r_bot^2 - (p v)^2)) / v

  (antiderivatives of ``dDelta/dr = p v / (r sqrt(r^2 - p^2 v^2))`` and
  ``dT/dr = r / (v sqrt(r^2 - p^2 v^2))``), so the whole ``(p, shell)``
  matrix is exact per shell and fully vectorized — no quadrature, no
  singularity handling at the turning point.
- A ray of parameter ``p`` descends until the first shell whose bottom
  slowness-radius ``eta = r/v`` drops below ``p`` (it turns inside that
  shell at ``r_t = p v``), or until a fluid/zero-velocity shell blocks it
  (S waves in the outer core). Candidate arrivals at distance ``D`` are
  the **upgoing** leg (source straight to surface) and the **turning**
  ray (source down to ``r_t``, back up through the full stack). The first
  arrival is the lower envelope over all ``p`` of both branches — this
  reproduces direct/diving P, triplications from discontinuities, and
  core phases (PKP) without naming them.

Deliberate deviations from TauP (documented, tolerance-checked):
diffracted phases (Pdiff along the core-mantle boundary) are not
ray-theoretic and are absent; in the core shadow zone the table holds the
first *geometric* arrival (PKP branch). Interpolation clips to the grid
hull exactly like the loader (``operators/spatial.py TTGrid.interp``).

Spark-first: grid rows (one per source depth) are embarrassingly
parallel; ``compute_grid(..., spark=...)`` distributes them as a
``mapInPandas`` job over a depth DataFrame — the Spark replacement for
the reference's ``multiprocessing.Pool`` (ttcreator.py:79-88). The
adaptive-refinement driver loop stays on the driver (it only decides
*which* depths to compute next; each batch is a distributed job).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

EARTH_RADIUS_KM = 6371.0
DEG2KM = 2.0 * EARTH_RADIUS_KM * math.pi / 360.0


# ---------------------------------------------------------------------------
# Velocity model
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class VelocityModel1D:
    """1-D radial velocity profile: knots of (depth_km, v_km_s), depth
    ascending; a repeated depth encodes a first-order discontinuity
    (e.g. ``35, 5.8`` then ``35, 8.0`` for a Moho jump)."""
    depths_km: np.ndarray
    v_km_s: np.ndarray
    name: str = "model"

    def __post_init__(self):
        d, v = np.asarray(self.depths_km, float), np.asarray(self.v_km_s, float)
        if d.ndim != 1 or d.shape != v.shape or d.size < 2:
            raise ValueError("model needs >=2 (depth, velocity) knots")
        if np.any(np.diff(d) < 0):
            raise ValueError("model depths must be non-decreasing")
        if d[0] != 0.0:
            raise ValueError("model must start at depth 0")
        if np.any(v < 0):
            raise ValueError("velocities must be >= 0 (0 = fluid, blocks S)")
        object.__setattr__(self, "depths_km", d)
        object.__setattr__(self, "v_km_s", v)

    @classmethod
    def from_csv(cls, path: str, column: str = "vp") -> "VelocityModel1D":
        """Load ``depth_km,vp_km_s[,vs_km_s]`` rows (``#`` comments ok).
        ``column`` picks ``'vp'`` or ``'vs'``."""
        depths, vps, vss = [], [], []
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.split("#", 1)[0].strip()
                if not line:
                    continue
                parts = [p for p in line.replace(",", " ").split() if p]
                if parts[0].lower().startswith("depth"):  # header row
                    continue
                depths.append(float(parts[0]))
                vps.append(float(parts[1]))
                vss.append(float(parts[2]) if len(parts) > 2 else np.nan)
        if column == "vs":
            if np.isnan(vss).any():
                raise ValueError(f"{path}: no vs column for an S-wave table")
            v = vss
        else:
            v = vps
        import os
        return cls(np.array(depths), np.array(v),
                   name=os.path.splitext(os.path.basename(path))[0])

    def shells(self, max_dr_km: float | None = None,
               cut_radius: float | None = None):
        """Discretize into Bullen-law shells (``v = A r^B`` through the
        endpoint velocities — the classic spherical travel-time
        parameterization with closed-form distance/time integrals) of
        thickness <= ``max_dr_km`` (default 20; subdivision only
        reconciles the power law with the profile's linear-in-depth
        interpolation, a second-order effect). Returns
        ``(r_top, r_bot, v_top, v_bot)`` arrays ordered surface ->
        center; ``cut_radius`` forces a shell boundary there (for placing
        a source). Zero-velocity knots yield impassable shells."""
        dr_max = 20.0 if max_dr_km is None else max_dr_km
        r_knots = EARTH_RADIUS_KM - self.depths_km
        tops, bots, vt, vb = [], [], [], []
        for i in range(len(r_knots) - 1):
            r1, r2 = r_knots[i], r_knots[i + 1]   # r1 >= r2 (downward)
            v1, v2 = self.v_km_s[i], self.v_km_s[i + 1]
            if r1 == r2:      # discontinuity marker, no volume
                continue
            n = max(1, int(math.ceil((r1 - r2) / dr_max)))
            edges = np.linspace(r1, r2, n + 1)
            if cut_radius is not None and r2 < cut_radius < r1 and \
                    cut_radius not in edges:
                edges = np.sort(np.append(edges, cut_radius))[::-1]
            frac = (edges - r1) / (r2 - r1)
            v_e = v1 + (v2 - v1) * frac
            tops.append(edges[:-1])
            bots.append(edges[1:])
            vt.append(v_e[:-1])
            vb.append(v_e[1:])
        return (np.concatenate(tops), np.concatenate(bots),
                np.concatenate(vt), np.concatenate(vb))


def demo_model(kind: str = "ak135-like") -> VelocityModel1D:
    """A coarse, approximate whole-earth P profile for demos and tests —
    plausible crust/mantle/core velocities, NOT a published model fit.
    Use a real model file for research-grade tables."""
    knots = [
        (0.0, 5.8), (20.0, 5.8), (20.0, 6.5), (35.0, 6.5), (35.0, 8.04),
        (210.0, 8.3), (410.0, 9.03), (410.0, 9.36), (660.0, 10.2),
        (660.0, 10.79), (1000.0, 11.26), (1700.0, 12.1), (2400.0, 13.0),
        (2889.0, 13.66), (2889.0, 8.0), (3500.0, 9.0), (4500.0, 9.9),
        (5153.9, 10.29), (5153.9, 11.04), (6371.0, 11.26),
    ]
    d, v = zip(*knots)
    return VelocityModel1D(np.array(d), np.array(v), name=kind)


# ---------------------------------------------------------------------------
# First-arrival computation (one source depth -> times at many distances)
# ---------------------------------------------------------------------------

def _leg_sums(p, r_top, r_bot, v_top, v_bot):
    """Vectorized per-(p, shell) closed-form Bullen-law integrals with
    prefix semantics: a ray contributes shells 0..kstop-1 fully plus a
    partial turn inside shell kstop. With ``eta = r/v`` and ``v = A r^B``
    inside a shell (``xi = 1 - B``, so ``eta = r^xi / A``)::

        dDelta = (acos(p/eta_top) - acos(p/eta_bot)) / xi
        dT     = (sqrt(eta_top^2 - p^2) - sqrt(eta_bot^2 - p^2)) / xi

    (``xi -> 0``, a constant-eta shell, switches to the log forms
    ``p ln(r_top/r_bot)/sqrt(eta^2-p^2)`` and
    ``eta^2 ln(r_top/r_bot)/sqrt(eta^2-p^2)``). Returns (delta_rad,
    t_sec, kstop) where delta/t are (len(p),) sums of the *surface ->
    turning point* leg and kstop[i] is the first non-traversable shell
    for p[i] (turned inside it, or blocked at its top interface, or a
    fluid shell for S)."""
    p = np.asarray(p, float)
    if p.size > 4096:       # bound the (P, K) temporaries
        parts = [_leg_sums(p[i:i + 4096], r_top, r_bot, v_top, v_bot)
                 for i in range(0, p.size, 4096)]
        return tuple(np.concatenate([q[j] for q in parts]) for j in range(3))
    K = len(v_top)
    fluid = (v_top <= 0) | (v_bot <= 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        eta_top = np.where(~fluid, r_top / np.where(fluid, 1.0, v_top), 0.0)
        eta_bot = np.where(~fluid & (r_bot > 0),
                           r_bot / np.where(fluid, 1.0, v_bot), 0.0)
        lnr = np.log(r_top / np.maximum(r_bot, 1e-12))
        xi = np.where(
            ~fluid & (r_bot > 0) & (eta_bot > 0),
            np.log(np.maximum(eta_top, 1e-300)
                   / np.maximum(eta_bot, 1e-300)) / lnr,
            1.0)
    const_eta = np.abs(xi) < 1e-9
    xi_safe = np.where(const_eta, 1.0, xi)

    pp = p[:, None]                                    # (P, 1)
    eta_min = np.minimum(eta_top, eta_bot)[None, :]
    # strict: p == eta_min is the grazing (horizontal-at-bottom) ray —
    # the integrals stay finite and exact there, and keeping it closes
    # the branch gap between upgoing and turning coverage at depth
    blocked = (pp > eta_min) | fluid[None, :]
    kstop = np.where(blocked.any(axis=1), blocked.argmax(axis=1), K)
    karange = np.arange(K)[None, :]
    full = karange < kstop[:, None]
    with np.errstate(invalid="ignore", divide="ignore"):
        a_top = np.arccos(np.clip(pp / np.maximum(eta_top[None, :], 1e-300),
                                  -1.0, 1.0))
        a_bot = np.arccos(np.clip(pp / np.maximum(eta_bot[None, :], 1e-300),
                                  -1.0, 1.0))
        s_top = np.sqrt(np.maximum(eta_top[None, :] ** 2 - pp ** 2, 0.0))
        s_bot = np.sqrt(np.maximum(eta_bot[None, :] ** 2 - pp ** 2, 0.0))
        d_pow = (a_top - a_bot) / xi_safe[None, :]
        t_pow = (s_top - s_bot) / xi_safe[None, :]
        # constant-eta (xi~0) shells: log forms, eta = eta_top
        root = np.sqrt(np.maximum(eta_top[None, :] ** 2 - pp ** 2, 1e-300))
        d_log = pp * lnr[None, :] / root
        t_log = eta_top[None, :] ** 2 * lnr[None, :] / root
    d_k = np.where(const_eta[None, :], d_log, d_pow)
    t_k = np.where(const_eta[None, :], t_log, t_pow)
    delta = np.where(full, d_k, 0.0).sum(axis=1)
    tsec = np.where(full, t_k, 0.0).sum(axis=1)

    # partial turn inside shell kstop: only when eta_bot <= p < eta_top
    # (xi > 0 there by construction; xi <= 0 means blocked at the top)
    ks = np.minimum(kstop, K - 1)
    inside = (kstop < K) & ~fluid[ks] & (p < eta_top[ks]) & (xi[ks] > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        d_part = np.arccos(np.clip(
            p / np.maximum(eta_top[ks], 1e-300), -1.0, 1.0)) / xi_safe[ks]
        t_part = np.sqrt(np.maximum(eta_top[ks] ** 2 - p ** 2, 0.0)) / \
            xi_safe[ks]
    delta = delta + np.where(inside, d_part, 0.0)
    tsec = tsec + np.where(inside, t_part, 0.0)
    return delta, tsec, kstop


def _envelope_min(delta_deg, t_sec, targets_deg, out):
    """Lower envelope: min-interpolate the piecewise-linear (delta, t)
    polyline onto ``targets_deg`` (monotonic runs via np.interp), taking
    elementwise minima into ``out`` (updated in place)."""
    d, t = np.asarray(delta_deg), np.asarray(t_sec)
    ok = np.isfinite(d) & np.isfinite(t)
    d, t = d[ok], t[ok]
    if d.size < 2:
        return out
    # split into monotonic runs of d
    sign = np.sign(np.diff(d))
    run_start = 0
    cur = 0.0
    for i in range(len(sign) + 1):
        end_run = i == len(sign) or (
            sign[i] != 0 and cur != 0 and sign[i] != cur)
        if i < len(sign) and sign[i] != 0 and cur == 0:
            cur = sign[i]
        if end_run:
            seg_d, seg_t = d[run_start:i + 1], t[run_start:i + 1]
            if seg_d.size >= 2 and seg_d[0] != seg_d[-1]:
                if seg_d[0] > seg_d[-1]:
                    seg_d, seg_t = seg_d[::-1], seg_t[::-1]
                lo = np.searchsorted(targets_deg, seg_d[0], "left")
                hi = np.searchsorted(targets_deg, seg_d[-1], "right")
                if hi > lo:
                    vals = np.interp(targets_deg[lo:hi], seg_d, seg_t)
                    out[lo:hi] = np.fmin(out[lo:hi], vals)
            run_start = i
            cur = sign[i] if i < len(sign) else 0.0
    return out


def first_arrivals(model: VelocityModel1D, source_depth_km: float,
                   distances_deg: np.ndarray, max_dr_km: float | None = None,
                   p_per_shell: int = 24) -> np.ndarray:
    """Minimum travel time (s) from a source at ``source_depth_km`` to
    surface receivers at each of ``distances_deg`` (ascending). NaN where
    no geometric ray arrives (e.g. S in the core shadow)."""
    r_src = EARTH_RADIUS_KM - float(source_depth_km)
    if not (0 < r_src <= EARTH_RADIUS_KM):
        raise ValueError(f"bad source depth {source_depth_km}")
    r_top, r_bot, v_top, v_bot = model.shells(max_dr_km, cut_radius=r_src)
    # shells strictly above the source: r_bot >= r_src counts as above
    # ('right' so a shell bottoming exactly at the source radius is the
    # last shell of the upgoing leg, not the first of the downgoing one)
    ksrc = int(np.searchsorted(-r_bot, -r_src, "right"))
    targets = np.asarray(distances_deg, float)
    out = np.full(targets.shape, np.inf)

    # ray-parameter sample: per-shell turning coverage + upgoing fan.
    # Rays turning inside shell k have p in (eta_min[k], eta_top[k)) —
    # sampling each shell's band maps depth resolution to p resolution.
    with np.errstate(divide="ignore"):
        eta_top = np.where(v_top > 0, r_top / np.where(v_top > 0, v_top, 1.0),
                           -1.0)
        eta_bot = np.where(v_bot > 0, r_bot / np.where(v_bot > 0, v_bot, 1.0),
                           -1.0)
    eta_src_up = r_src / v_bot[ksrc - 1] if ksrc > 0 else eta_top[0]
    p_down_max = r_src / v_top[ksrc] if ksrc < len(v_top) else 0.0
    bands = []
    for k in range(len(v_top)):
        if eta_top[k] <= 0:
            continue
        hi = min(eta_top[k], p_down_max)
        lo = max(0.0, min(min(eta_bot[k], eta_top[k]), hi))
        if hi <= 0 or hi <= lo:
            continue
        bands.append(np.linspace(lo, hi, p_per_shell, endpoint=False))
    p_all = np.concatenate(bands + [
        np.linspace(0.0, max(min(eta_src_up, p_down_max), 0.0), 512),
        np.array([p_down_max])])
    p_all = np.unique(np.clip(p_all, 0.0, None))

    # one matrix pass over the full stack, one over the source-to-surface
    # stack (the upper ksrc shells)
    d_turn, t_turn, kstop = _leg_sums(p_all, r_top, r_bot, v_top, v_bot)
    if ksrc > 0:
        d_up, t_up, kstop_up = _leg_sums(
            p_all, r_top[:ksrc], r_bot[:ksrc], v_top[:ksrc], v_bot[:ksrc])
        up_ok = kstop_up >= ksrc            # all upper shells traversable
    else:
        d_up = np.zeros_like(p_all)
        t_up = np.zeros_like(p_all)
        up_ok = np.ones(p_all.shape, bool)

    # upgoing branch: source straight to surface
    if source_depth_km > 0:
        sel = up_ok & (p_all <= eta_src_up)
        _envelope_min(np.degrees(d_up[sel]), t_up[sel], targets, out)
    # turning branch: down from source to r_t, up through full stack;
    # requires the turn below the source and an unblocked upper stack.
    # Rays reaching the model bottom without turning (kstop == K) EXIT a
    # model that stops short of the center (e.g. a crustal-only profile)
    # — they are not arrivals; only a to-the-center model folds them
    # through the antipode (p == 0 special case below).
    reaches_center = r_bot[-1] <= 1e-9
    K = len(v_top)
    sel = up_ok & (kstop >= ksrc) & (
        (kstop < K) | (reaches_center & (p_all == 0.0)))
    dd = np.degrees(2.0 * d_turn[sel] - d_up[sel])
    tt = 2.0 * t_turn[sel] - t_up[sel]
    # the exact-vertical ray (p == 0) passes through the center to the
    # antipode: the folded leg formula yields delta = 0 there, but the
    # true angular distance is 180 deg (T is already correct — the p->0+
    # limit). Only when nothing blocks the center (kstop == K).
    p_sel = p_all[sel]
    center_ok = kstop[sel] >= len(v_top)
    dd = np.where((p_sel == 0.0) & center_ok, 180.0, dd)
    _envelope_min(dd, tt, targets, out)
    out[~np.isfinite(out)] = np.nan
    return out


# ---------------------------------------------------------------------------
# Grid creation (adaptive depth refinement, Spark-parallel rows)
# ---------------------------------------------------------------------------

def _compute_rows(model, depths, distances, max_dr_km, spark=None):
    """Rows of the TT grid for the given source depths — distributed over
    Spark when a session is passed (one task per depth), else a local
    loop."""
    depths = list(depths)
    if spark is None or len(depths) <= 2:
        return {z: first_arrivals(model, z, distances, max_dr_km)
                for z in depths}
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    n = len(depths)
    sdf = spark.createDataFrame(
        pd.DataFrame({"depth": depths}), "depth double").repartition(n)
    mdl_b = spark.sparkContext.broadcast(
        (model.depths_km, model.v_km_s, model.name))
    dist_b = spark.sparkContext.broadcast(np.asarray(distances, float))

    def part(batches):
        d_kn, v_kn, name = mdl_b.value
        mdl = VelocityModel1D(d_kn, v_kn, name)
        for pdf in batches:
            for z in pdf["depth"]:
                tt = first_arrivals(mdl, float(z), dist_b.value, max_dr_km)
                yield pd.DataFrame(
                    {"depth": [float(z)], "tt": [tt.tolist()]})

    rows = sdf.mapInPandas(part, "depth double, tt array<double>").collect()
    return {r["depth"]: np.array(r["tt"], float) for r in rows}


def compute_grid(model: VelocityModel1D, tt_errtol: float = 0.5,
                 max_source_depth_km: float = 700.0,
                 max_dist_deg: float = 180.0, max_dr_km: float | None = None,
                 spark=None, max_rounds: int = 12):
    """Build an adaptive (source_depth, distance) first-arrival grid whose
    *linear depth interpolation* error is < ``tt_errtol`` seconds
    (reference semantics, ttcreator.py:240-330: refine the depth axis
    until interpolating between rows matches direct computation).

    Distance step follows the reference's ``getstep`` rule
    (ttcreator.py:157-165): surface velocity * tolerance, in degrees,
    floored at 0.005 deg. Returns ``(depths, distances, grid)``.
    """
    if tt_errtol <= 0:
        raise ValueError("tt_errtol must be > 0")
    step = max(round(model.v_km_s[0] * tt_errtol / DEG2KM, 3), 0.005)
    n_x = int(max_dist_deg / step) + 1
    if n_x > 14401:                      # cap the table width at 0.0125 deg
        n_x = 14401
    distances = np.linspace(0.0, max_dist_deg, n_x)

    # start from the model knots (clipped) plus coarse fill
    knots = [float(d) for d in model.depths_km if d <= max_source_depth_km]
    depths = sorted(set(
        [0.0, max_source_depth_km] + knots +
        list(np.linspace(0.0, max_source_depth_km, 8))))
    rows = _compute_rows(model, depths, distances, max_dr_km, spark)

    converged: set[tuple[float, float]] = set()
    for _ in range(max_rounds):
        ds = sorted(rows)
        # probe midpoints of each not-yet-converged interval; an interval
        # that already passed the tolerance check is final — re-probing
        # it every round would recompute a full distributed row for
        # nothing
        pend = [(a, b) for a, b in zip(ds[:-1], ds[1:])
                if b - a > 1.0 and (a, b) not in converged]
        if not pend:
            break
        mids = [(a + b) / 2 for a, b in pend]
        mid_rows = _compute_rows(model, mids, distances, max_dr_km, spark)
        new_depths = []
        for (a, b) in pend:
            m = (a + b) / 2
            interp = (rows[a] + rows[b]) / 2.0
            direct = mid_rows[m]
            ok = np.isfinite(interp) & np.isfinite(direct)
            err = np.nanmax(np.abs(interp[ok] - direct[ok])) if ok.any() \
                else 0.0
            if err > tt_errtol:
                rows[m] = direct
                new_depths.append(m)
            else:
                converged.add((a, b))
        if not new_depths:
            break
    ds = np.array(sorted(rows))
    grid = np.vstack([rows[z] for z in ds])
    return ds, distances, grid


def save_npz(path: str, depths, distances, grid, model_name="model",
             phase="P", tt_errtol=0.5) -> None:
    """Write the reference npz layout (ttloader.py:22-60): sourcedepths /
    distances / traveltimes (+receiverdepths=[0] and metadata), loadable
    by ``TTGrid.from_npz`` and by the reference's own loader."""
    np.savez_compressed(
        path, sourcedepths=np.asarray(depths, float),
        distances=np.asarray(distances, float),
        traveltimes=np.asarray(grid, float),
        receiverdepths=np.array([0.0]),
        modelname=np.array(model_name), phases=np.array([phase]),
        tt_errtol=np.array(float(tt_errtol)))
