"""Batched (2-D) twins of the per-row funclib kernels.

Each function takes a C-contiguous float64 matrix ``X`` of shape
``(B, n)`` — one fixed-length signal per row — and applies the SAME
float64 operations as its per-row twin in ndarrays.py / traces.py /
response.py, vectorized across rows, so a whole Arrow batch pays ONE
numpy call chain instead of ~30 numpy calls per row (the guide-§4.2
shape: per-row kernels on 64-sample arrays are dominated by Python/
numpy call dispatch, not arithmetic — measured on funclib_spectra in
the r9 optimization round).

Bit-identity contract: every function here must produce EXACTLY the
bytes its per-row twin produces for each row (numpy's pocketfft applies
the same 1-D transform plan per row of an ``axis=1`` batch; elementwise
broadcasts are the same scalar ops; contiguous last-axis reductions use
the same pairwise summation as the equivalent 1-D call). The contract
is pinned by tests/test_funclib_batch.py with exact ``array_equal``
checks per primitive — never "close", equal — so the DuckDB gate
oracles of consumers (queries_funclib.funclib_spectra) need no change.

No Spark imports here (runs inside Arrow-batched UDFs on executors).
"""

from __future__ import annotations

import numpy as np

from stream2segment_spark.funclib.ndarrays import (
    nigam_jennings_coefficients)
from stream2segment_spark.funclib.response import (
    _OUTPUT_ORDER, _UNIT_ORDER, invert_spec_water_level)
from stream2segment_spark.funclib.traces import (
    WOOD_ANDERSON_POLES, WOOD_ANDERSON_SENSITIVITY, WOOD_ANDERSON_ZEROS,
    butterworth_zerophase_response, paz_frequency_response, taper_hann)


def taper_factors(n: int, max_percentage: float = 0.05) -> np.ndarray:
    """The per-sample multipliers :func:`traces.taper_hann` applies to a
    length-``n`` signal (ones in the untapered middle). ``x * factors``
    is bit-identical to ``taper_hann(x)``: head/tail samples see the
    same ``ramp`` floats, middle samples are multiplied by exactly 1.0
    (an IEEE identity)."""
    return taper_hann(np.ones(n), max_percentage)


def taper_hann_batch(X: np.ndarray,
                     max_percentage: float = 0.05) -> np.ndarray:
    """Row-wise :func:`traces.taper_hann` of a ``(B, n)`` matrix."""
    return X * taper_factors(X.shape[1], max_percentage)


def fft_batch(X: np.ndarray) -> np.ndarray:
    """Row-wise :func:`ndarrays.fft` (real FFT along axis 1)."""
    return np.fft.rfft(X, axis=1)


def bandpass_zerophase_batch(
    X: np.ndarray, delta: float, freq_min: float, freq_max: float,
    corners: int = 2, taper_max_percentage: float = 0.05,
    max_nyquist_ratio: float = 0.9,
) -> np.ndarray:
    """Row-wise :func:`traces.bandpass_zerophase`: taper, rfft, multiply
    by the (row-independent) zero-phase Butterworth bin gains, irfft."""
    n = X.shape[1]
    Xt = taper_hann_batch(X, taper_max_percentage)
    h = butterworth_zerophase_response(
        n, delta, freq_min, freq_max, corners, max_nyquist_ratio)
    return np.fft.irfft(np.fft.rfft(Xt, axis=1) * h, n=n, axis=1)


def synth_wood_anderson_batch(
    X: np.ndarray, delta: float, taper_max_percentage: float = 0.05,
) -> np.ndarray:
    """Row-wise :func:`traces.synth_wood_anderson` (velocity -> WA
    displacement via the published pole-zero gains)."""
    n = X.shape[1]
    if n == 0:
        return X.copy()
    Xt = taper_hann_batch(X, taper_max_percentage)
    f = np.fft.rfftfreq(n, d=delta)
    h = paz_frequency_response(f, WOOD_ANDERSON_POLES, WOOD_ANDERSON_ZEROS,
                               WOOD_ANDERSON_SENSITIVITY)
    return np.fft.irfft(np.fft.rfft(Xt, axis=1) * h, n=n, axis=1)


def remove_response_batch(
    X: np.ndarray, delta: float, paz, output: str = "VEL",
    water_level_db: float = 60.0, taper_max_percentage: float = 0.05,
) -> np.ndarray:
    """Row-wise :func:`response.remove_response` — same taper,
    water-leveled spectral division, (i*omega)^shift unit conversion and
    inverse transform; the inverse-response gain vector is computed ONCE
    per call (it depends only on (n, delta, paz), never on the row — the
    per-row twin recomputed it for every signal)."""
    n = X.shape[1]
    if n == 0:
        return X.copy()
    Xt = taper_hann_batch(X, taper_max_percentage)
    f = np.fft.rfftfreq(n, d=delta)
    inv = invert_spec_water_level(paz.frequency_response(f), water_level_db)
    spec = np.fft.rfft(Xt, axis=1) * inv
    try:
        shift = _OUTPUT_ORDER[output.upper()] - _UNIT_ORDER[paz.input_units]
    except KeyError:
        raise ValueError(f"unknown output/input units: {output!r} / "
                         f"{paz.input_units!r}") from None
    if shift:
        iw = 2j * np.pi * f
        if shift > 0:
            spec = spec * iw ** shift
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                spec = np.where(f > 0, spec / iw ** (-shift), 0.0)
    return np.fft.irfft(spec, n=n, axis=1)


def response_spectrum_nigam_jennings_batch(
    X: np.ndarray, time_step: float, periods: np.ndarray,
    damping: float = 0.05,
) -> dict[str, np.ndarray]:
    """Row-wise :func:`ndarrays.response_spectrum_nigam_jennings`
    (S_d/S_v/S_a and true maxima only — the per-record PGA/PGV scalars
    are one-liners callers derive from ``X`` directly when needed).
    State matrices are ``(B, n_periods)``; each time step applies the
    verbatim per-row update expression broadcast across rows, so every
    row's float sequence is the one the scalar recurrence produces."""
    acc = np.asarray(X, dtype=float)
    periods = np.asarray(periods, dtype=float)
    dt = float(time_step)
    xi = damping
    cf = nigam_jennings_coefficients(periods, dt, damping)
    omega, omega2 = cf["omega"], cf["omega2"]
    a11, a12, a21, a22 = cf["a11"], cf["a12"], cf["a21"], cf["a22"]
    b11, b12, b21, b22 = cf["b11"], cf["b12"], cf["b21"], cf["b22"]

    n_rows, n_samp = acc.shape
    n_per = len(periods)
    x = np.zeros((n_rows, n_per))
    v = np.zeros((n_rows, n_per))
    max_d = np.zeros((n_rows, n_per))
    max_v = np.zeros((n_rows, n_per))
    max_a = np.zeros((n_rows, n_per))
    for i in range(n_samp - 1):
        a_i = acc[:, i:i + 1]        # (B, 1) broadcasts like the scalar
        a_n = acc[:, i + 1:i + 2]
        x_new = a11 * x + a12 * v + b11 * a_i + b12 * a_n
        v_new = a21 * x + a22 * v + b21 * a_i + b22 * a_n
        x, v = x_new, v_new
        abs_acc = -(2 * xi * omega * v + omega2 * x)
        max_d = np.maximum(max_d, np.abs(x))
        max_v = np.maximum(max_v, np.abs(v))
        max_a = np.maximum(max_a, np.abs(abs_acc))
    s_d = max_d
    return {
        "periods": periods,
        "S_d": s_d, "S_v": s_d * omega, "S_a": s_d * omega2,
        "true_max_velocity": max_v, "true_max_acceleration": max_a,
    }
