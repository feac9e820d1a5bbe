"""User-level kernel compositions (SURVEY N11; reference behavior:
resources/templates/paramtable.py:314-530) — the building blocks a user
pyfunc composes from the funclib, provided ready-made:

- ``signal_noise_spectra``: split a trace at the arrival time into
  signal/noise windows (fixed-length or cumulative-quantile), taper+FFT
  both, triangular-smooth the amplitude spectra;
- ``meanslice``: mean of a sub-window of samples;
- ``multievent_flags``: Savitzky-Golay-smoothed cumulative-energy
  derivative scan for secondary events inside the signal window.

All plain numpy over (samples, delta, start, arrival) — composable inside
``process_df`` pyfuncs.
"""

from __future__ import annotations

import numpy as np

from stream2segment_spark.funclib.ndarrays import (
    ampspec, cumsumsq, dfreq, savitzky_golay, triangsmooth)
from stream2segment_spark.funclib.traces import (
    slice_window, sn_windows, taper_hann)


def signal_noise_spectra(
    samples: np.ndarray, delta: float, start: float, arrival: float,
    win_length=(0.05, 0.95),
    taper_max_percentage: float = 0.05,
    smooth_winlen_ratio: float = 0.05,
) -> dict:
    """(df_signal, signal_spec, df_noise, noise_spec) — the reference's
    paramtable `_spectrum` pair over the sn windows."""
    (s0, s1), (n0, n1) = sn_windows(samples, delta, start, arrival,
                                    win_length)
    out = {}
    for label, (w0, w1) in (("signal", (s0, s1)), ("noise", (n0, n1))):
        w = slice_window(samples, delta, start, w0, w1)
        if taper_max_percentage and len(w):
            w = taper_hann(w, taper_max_percentage)
        spec = ampspec(w)
        if smooth_winlen_ratio and len(spec) > 4:
            spec = triangsmooth(spec, smooth_winlen_ratio)
        out[f"{label}_df"] = dfreq(w, delta) if len(w) else 0.0
        out[f"{label}_spec"] = spec
        out[f"{label}_window"] = (w0, w1)
    return out


def meanslice(samples: np.ndarray, delta: float, start: float,
              w0: float, w1: float) -> float:
    """Mean amplitude of the [w0, w1] sub-window (reference meanslice)."""
    w = slice_window(samples, delta, start, w0, w1, pad=False)
    return float(np.nanmean(w)) if len(w) else float("nan")


def multievent_flags(
    samples: np.ndarray, delta: float,
    sg_window_sec: float = 2.0, sg_order: int = 3,
    threshold_inside: float = 0.1, threshold_after: float = 0.05,
    split_at: float = 0.9,
) -> dict:
    """Secondary-event detection on the cumulative energy (reference
    get_multievent_sg): Savitzky-Golay-smooth the normalized cumulative
    sum of squares, take its derivative, and flag local bursts

    - INSIDE the main-event window (cum in [0, split_at)): derivative
      spikes above ``threshold_inside`` after the main release;
    - AFTER it (cum >= split_at): spikes above ``threshold_after``.

    Returns dict(score_inside, score_after, flag_inside, flag_after).
    """
    x = np.asarray(samples, dtype=float)
    if len(x) < 16:
        return {"score_inside": 0.0, "score_after": 0.0,
                "flag_inside": False, "flag_after": False}
    cum = cumsumsq(x, normalize=True)
    win = max(int(sg_window_sec / delta) | 1, sg_order + 2)
    if win % 2 == 0:
        win += 1
    deriv = savitzky_golay(cum, win, sg_order, deriv=1, rate=1.0 / delta)
    split = int(np.searchsorted(cum, split_at))
    peak = int(np.argmax(deriv[:split])) if split else 0
    inside = deriv[peak + win:split] if split - (peak + win) > 0 else np.array([])
    # guard band of one smoothing window past the split: the main burst's
    # own trailing slope must not flag itself as a secondary event
    after = deriv[split + win:]
    score_inside = float(inside.max()) if len(inside) else 0.0
    score_after = float(after.max()) if len(after) else 0.0
    return {
        "score_inside": score_inside,
        "score_after": score_after,
        "flag_inside": score_inside > threshold_inside,
        "flag_after": score_after > threshold_after,
    }
