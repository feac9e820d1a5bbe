"""Coda-wave analysis (SURVEY N10; reference process/funclib/coda.py:19-165
semantics): locate the coda window after the direct arrival and fit its
exponential amplitude decay. All scipy-free numpy so it runs inside
Arrow-batched pandas UDFs.

Public signal-processing building blocks: analytic-signal envelope via the
FFT Hilbert transform, moving-average smoothing, STA/LTA trigger ratio,
least-squares log-linear decay fit.
"""

from __future__ import annotations

import numpy as np

from stream2segment_spark.funclib.ndarrays import linregress_slope_intercept


def envelope(samples: np.ndarray) -> np.ndarray:
    """|analytic signal| via the FFT construction of the Hilbert transform
    (zero the negative frequencies, double the positive ones)."""
    x = np.asarray(samples, dtype=float)
    n = len(x)
    if n == 0:
        return x.copy()
    spec = np.fft.fft(x)
    h = np.zeros(n)
    h[0] = 1.0
    if n % 2 == 0:
        h[n // 2] = 1.0
        h[1:n // 2] = 2.0
    else:
        h[1:(n + 1) // 2] = 2.0
    return np.abs(np.fft.ifft(spec * h))


def moving_average(x: np.ndarray, width: int) -> np.ndarray:
    """Centered moving average with edge shrinking (same length)."""
    x = np.asarray(x, dtype=float)
    if width <= 1 or len(x) == 0:
        return x.copy()
    kernel = np.ones(min(width, len(x)))
    num = np.convolve(x, kernel, mode="same")
    den = np.convolve(np.ones(len(x)), kernel, mode="same")
    return num / den


def sta_lta(samples: np.ndarray, nsta: int, nlta: int) -> np.ndarray:
    """Classic short-term/long-term average ratio of the squared signal
    (recursive-free, cumulative-sum form). Ratio is 0 where the LTA window
    is not yet full."""
    x = np.square(np.asarray(samples, dtype=float))
    csum = np.concatenate(([0.0], np.cumsum(x)))
    n = len(x)
    out = np.zeros(n)
    idx = np.arange(n)
    ok = idx >= nlta - 1
    i = idx[ok]
    sta = (csum[i + 1] - csum[np.maximum(i + 1 - nsta, 0)]) / nsta
    lta = (csum[i + 1] - csum[i + 1 - nlta]) / nlta
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.where(lta > 0, sta / lta, 0.0)
    out[ok] = r
    return out


def analyze_coda(
    samples: np.ndarray,
    delta: float,
    peak_quantile: float = 1.0,
    smooth_sec: float = 2.0,
    fit_start_factor: float = 2.0,
    min_fit_sec: float = 5.0,
    floor_ratio: float = 1e-2,
) -> dict | None:
    """Fit the post-arrival coda decay: smooth the envelope, start the fit
    window at ``fit_start_factor``x the envelope-peak time (the standard
    coda convention: lapse time >= 2x the direct-wave travel time), and
    least-squares fit ``log(env) = intercept + slope*t``.

    The fit ends where the envelope has decayed below ``floor_ratio`` of
    its value at the window start (coda buried in noise), and the final
    ``smooth_sec`` worth of samples is always excluded — the FFT Hilbert
    envelope has a circular edge artifact there.

    Returns dict(coda_start_sec, slope, intercept, decay_ok) — slope is
    per-second; ``decay_ok`` is False when the fit window is shorter than
    ``min_fit_sec`` or the slope is non-negative (no decaying coda).
    ``None`` for degenerate (too-short/all-zero) inputs.
    """
    x = np.asarray(samples, dtype=float)
    n = len(x)
    if n < 16 or not np.any(x):
        return None
    width = max(int(smooth_sec / delta), 1)
    env = moving_average(envelope(x), width)
    ipeak = int(np.argmax(env))
    istart = min(int(round(ipeak * fit_start_factor)), n - 2)
    iend = n - width - 1
    below = np.flatnonzero(env[istart:iend] < env[istart] * floor_ratio)
    if len(below):
        iend = istart + below[0]
    seg = env[istart:iend]
    if len(seg) < 4:
        return None
    t = (istart + np.arange(len(seg))) * delta
    with np.errstate(divide="ignore"):
        logenv = np.log(np.maximum(seg, np.finfo(float).tiny))
    slope, intercept = linregress_slope_intercept(t, logenv)
    ok = (len(seg) * delta >= min_fit_sec) and slope < 0
    return {"coda_start_sec": istart * delta, "slope": slope,
            "intercept": intercept, "decay_ok": bool(ok)}
