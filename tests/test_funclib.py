"""Kernel tests with synthetic sine/impulse waveforms and exact numpy
expectations (the reference's test strategy for funclib,
tests/process/funclib/test_ndarrays.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from stream2segment_spark.funclib import ndarrays as ND
from stream2segment_spark.funclib import traces as TR


def sine(freq=5.0, fs=100.0, secs=4.0, amp=1.0):
    t = np.arange(0, secs, 1.0 / fs)
    return amp * np.sin(2 * np.pi * freq * t), t


def test_fft_ampspec_powspec_peak():
    x, _ = sine(freq=5.0, fs=100.0, secs=4.0)
    amp = ND.ampspec(x)
    pow_ = ND.powspec(x)
    fx = ND.freqs(x, 1 / 100.0)
    assert fx[np.argmax(amp)] == pytest.approx(5.0)
    np.testing.assert_allclose(pow_, amp ** 2)
    # Parseval: sum(x^2) == (|X0|^2 + 2*sum|Xk|^2 - |Xnyq|^2(if even)) / N
    n = len(x)
    rec = (amp[0] ** 2 + 2 * np.sum(amp[1:] ** 2) - (amp[-1] ** 2 if n % 2 == 0 else 0)) / n
    assert rec == pytest.approx(np.sum(x ** 2), rel=1e-9)


def test_dfreq_freqs():
    x, _ = sine(fs=50.0, secs=2.0)
    assert ND.dfreq(x, 1 / 50.0) == pytest.approx(0.5)
    fx = ND.freqs(x, 1 / 50.0)
    assert len(fx) == 1 + len(x) // 2
    assert fx[1] - fx[0] == pytest.approx(0.5)


def test_trim_argtrim():
    sig = np.arange(100.0)
    # domain step 0.5: values at x=0, 0.5, ..., 49.5
    assert list(ND.trim(sig, 0.5, 1.0, 2.0)) == [2.0, 3.0, 4.0]
    assert list(ND.trim(sig, 0.5, 0.9, 2.1)) == [2.0, 3.0, 4.0]
    assert list(ND.trim(sig, 0.5, 0.9, 2.1, nearest_sample=True)) == \
        [2.0, 3.0, 4.0]  # round(1.8)=2, round(4.2)=4
    assert ND.argtrim(sig, 0.5, None, None) == (None, None)
    assert len(ND.trim(sig, 0.5, 60.0, None)) == 0  # beyond domain


def test_snr_known_ratio():
    sig, _ = sine(amp=2.0)
    noise, _ = sine(amp=1.0)
    # time-series form: power ratio = 4 -> sqrt -> 2
    assert ND.snr(sig, noise, delta_signal=0.01, delta_noise=0.01) == \
        pytest.approx(2.0, rel=1e-6)
    assert ND.snr(sig, noise, in_db=True) == pytest.approx(10 * math.log10(4),
                                                           rel=1e-6)
    # pow form, trivial arrays
    assert ND.snr(np.array([4.0, 4.0]), np.array([1.0, 1.0]),
                  signals_form="pow") == pytest.approx(2.0)
    # zero noise -> nan
    assert math.isnan(ND.snr(sig, np.zeros(10), signals_form="pow"))


def test_snr_band_limited():
    # 5 Hz tone vs 20 Hz tone: in band [15, 25] the 20 Hz wins
    x5, _ = sine(freq=5.0)
    x20, _ = sine(freq=20.0)
    full = ND.snr(x5, x20, delta_signal=0.01, delta_noise=0.01)
    band = ND.snr(x5, x20, fmin=15, fmax=25,
                  delta_signal=0.01, delta_noise=0.01)
    assert full == pytest.approx(1.0, rel=1e-6)  # equal amplitude
    assert band < 0.1  # x5 has ~no energy in [15,25]


def test_cumsumsq():
    c = ND.cumsumsq(np.array([1.0, 1.0, 1.0, 1.0]))
    np.testing.assert_allclose(c, [0, 1 / 3, 2 / 3, 1.0])
    raw = ND.cumsumsq(np.array([1.0, 2.0]), normalize=False)
    np.testing.assert_allclose(raw, [1.0, 5.0])
    assert len(ND.cumsumsq(np.array([]))) == 0


def test_cumtrapz_matches_numpy_trapz():
    y = np.sin(np.linspace(0, 3, 50))
    c = ND.cumtrapz(y, dx=0.1)
    assert c[0] == 0.0
    assert c[-1] == pytest.approx(np.trapz(y, dx=0.1))


def test_linregress():
    x = np.arange(20.0)
    y = 3.0 * x - 7.0
    slope, intercept = ND.linregress_slope_intercept(x, y)
    assert slope == pytest.approx(3.0)
    assert intercept == pytest.approx(-7.0)


def test_triangsmooth_preserves_constant_and_smooths_noise():
    # constant signal is a fixed point of any normalized smoother
    const = np.full(256, 3.14)
    np.testing.assert_allclose(ND.triangsmooth(const, 0.1), const, rtol=1e-12)
    # noisy signal: variance reduced at high indices (bigger windows)
    rng = np.random.default_rng(1)
    noisy = 5.0 + rng.standard_normal(1024)
    sm = ND.triangsmooth(noisy, 0.1)
    assert np.var(sm[500:900]) < np.var(noisy[500:900]) / 5
    # tiny ratio -> unchanged
    np.testing.assert_allclose(ND.triangsmooth(noisy, 1e-5), noisy)


def test_response_spectrum_long_period_displacement():
    """Physics invariants: for a very stiff oscillator (T -> 0) the pseudo
    spectral acceleration approaches the PGA; S_v = omega*S_d and
    S_a = omega^2*S_d by construction."""
    acc, _ = sine(freq=2.0, fs=200.0, secs=10.0)
    out = ND.response_spectrum_nigam_jennings(acc, 1 / 200.0,
                                              np.array([0.01, 0.5, 2.0]))
    omega = 2 * np.pi / out["periods"]
    np.testing.assert_allclose(out["S_a"], out["S_d"] * omega ** 2)
    np.testing.assert_allclose(out["S_v"], out["S_d"] * omega)
    assert out["S_a"][0] == pytest.approx(out["PGA"], rel=0.05)
    # resonance: T=0.5s == f=2Hz forcing -> strong amplification vs PGA
    assert out["S_a"][1] > 5 * out["PGA"]


def test_sn_windows_fixed_and_quantile():
    fs = 100.0
    # quiet noise then strong burst after arrival
    x = np.concatenate([np.zeros(200), np.ones(100) * 5.0, np.zeros(100)])
    start, arrival = 1000.0, 1000.0 + 2.0  # burst starts at the arrival
    (s0, s1), (n0, n1) = TR.sn_windows(x, 1 / fs, start, arrival, 1.5)
    assert (s0, s1) == (arrival, arrival + 1.5)
    assert (n0, n1) == (arrival - 1.5, arrival)
    (s0, s1), (n0, n1) = TR.sn_windows(x, 1 / fs, start, arrival, (0.05, 0.95))
    # burst spans [2.0s, 3.0s] after start; quantile window inside it
    assert 2.0 <= s0 - start <= 2.1
    assert 2.85 <= s1 - start <= 3.01
    assert n1 == arrival and (n1 - n0) == pytest.approx(s1 - s0)
    with pytest.raises(ValueError):
        TR.sn_windows(x, 1 / fs, start, arrival, (0.9, 0.1))


def test_slice_window_pads():
    x = np.arange(10.0)
    out = TR.slice_window(x, 1.0, 100.0, 98.0, 103.0)
    np.testing.assert_allclose(out, [0, 0, 0, 1, 2])


def test_bandpass_zerophase():
    fs = 200.0
    lo, _ = sine(freq=2.0, fs=fs, secs=10.0)
    hi, _ = sine(freq=40.0, fs=fs, secs=10.0)
    mixed = lo + hi
    out = TR.bandpass_zerophase(mixed, 1 / fs, 20.0, 60.0)
    # mid-section (away from taper edges): the 2 Hz component is gone
    mid = slice(500, 1500)
    corr_hi = np.corrcoef(out[mid], hi[mid])[0, 1]
    corr_lo = np.corrcoef(out[mid], lo[mid])[0, 1]
    assert corr_hi > 0.99
    assert abs(corr_lo) < 0.05


def test_udfs_on_spark(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from stream2segment_spark.funclib import udfs as U
    pdf = pd.DataFrame({
        "id": [1, 2],
        "arr": [np.ones(8), np.arange(8.0)],
    })
    df = spark.createDataFrame(pdf)
    got = (df.select("id",
                     U.cumsumsq_udf()(F.col("arr")).alias("c"),
                     U.quantile_index_udf(0.5)(F.col("arr")).alias("q50"))
           .orderBy("id").collect())
    np.testing.assert_allclose(got[0].c, ND.cumsumsq(np.ones(8)))
    np.testing.assert_allclose(got[1].c, ND.cumsumsq(np.arange(8.0)))
    assert got[0].q50 == int(np.searchsorted(ND.cumsumsq(np.ones(8)), 0.5))
    assert got[1].q50 == int(np.searchsorted(ND.cumsumsq(np.arange(8.0)), 0.5))


# --------------------------------------------------------------------------
# N10/N11 additions: savgol, coda, Wood-Anderson
# --------------------------------------------------------------------------

def test_savitzky_golay_reproduces_polynomial():
    from stream2segment_spark.funclib.ndarrays import savitzky_golay
    x = np.arange(60, dtype=float)
    y = 1.0 - 2.0 * x + 0.05 * x ** 2 + 0.001 * x ** 3
    sm = savitzky_golay(y, 13, 3)
    np.testing.assert_allclose(sm[6:-6], y[6:-6], atol=1e-9)
    d1 = savitzky_golay(y, 13, 3, deriv=1)
    np.testing.assert_allclose(d1[6:-6], -2.0 + 0.1 * x[6:-6]
                               + 0.003 * x[6:-6] ** 2, atol=1e-9)
    with pytest.raises(ValueError):
        savitzky_golay(y, 12, 3)          # even window


def test_envelope_of_modulated_sine():
    from stream2segment_spark.funclib.coda import envelope
    t = np.arange(0, 10, 0.01)
    amp = np.exp(-0.3 * t)
    x = amp * np.sin(2 * np.pi * 5 * t)
    env = envelope(x)
    # envelope tracks |amplitude| away from the edges
    np.testing.assert_allclose(env[100:-100], amp[100:-100], rtol=0.15)


def test_sta_lta_detects_onset():
    from stream2segment_spark.funclib.coda import sta_lta
    rng = np.random.default_rng(3)
    x = rng.normal(0, 0.01, 2000)
    x[1000:1100] += np.sin(np.linspace(0, 30, 100)) * 5
    r = sta_lta(x, nsta=20, nlta=400)
    assert np.argmax(r) >= 1000
    assert r.max() > 10
    assert np.all(r[:399] == 0)


def test_analyze_coda_recovers_decay_rate():
    from stream2segment_spark.funclib.coda import analyze_coda
    delta = 0.01
    t = np.arange(0, 60, delta)
    onset = 5.0
    sig = np.where(t >= onset,
                   np.exp(-0.25 * (t - onset)) * np.sin(2 * np.pi * 8 * t),
                   0.0) + 1e-9
    out = analyze_coda(sig, delta, smooth_sec=0.5)
    assert out is not None and out["decay_ok"]
    assert out["slope"] == pytest.approx(-0.25, abs=0.03)


def test_wood_anderson_scales_sine_by_response_magnitude():
    from stream2segment_spark.funclib.traces import (
        WOOD_ANDERSON_POLES, WOOD_ANDERSON_SENSITIVITY, WOOD_ANDERSON_ZEROS,
        paz_frequency_response, synth_wood_anderson)
    delta, f0 = 0.01, 4.0
    t = np.arange(0, 50, delta)
    x = np.sin(2 * np.pi * f0 * t)
    out = synth_wood_anderson(x, delta, taper_max_percentage=0.02)
    hmag = abs(paz_frequency_response(
        np.array([f0]), WOOD_ANDERSON_POLES, WOOD_ANDERSON_ZEROS,
        WOOD_ANDERSON_SENSITIVITY)[0])
    mid = out[len(out) // 3: 2 * len(out) // 3]
    assert np.max(np.abs(mid)) == pytest.approx(hmag, rel=0.02)


# --------------------------------------------------------------------------
# N11 template compositions
# --------------------------------------------------------------------------

def test_signal_noise_spectra_snr_separates():
    from stream2segment_spark.funclib.templates import signal_noise_spectra
    delta = 0.01
    t = np.arange(0, 60, delta)
    arrival = 20.0
    rng = np.random.default_rng(5)
    x = rng.normal(0, 0.01, len(t))
    x[t >= arrival] += np.sin(2 * np.pi * 4 * t[t >= arrival]) * \
        np.exp(-0.2 * (t[t >= arrival] - arrival))
    out = signal_noise_spectra(x, delta, 0.0, arrival, win_length=10.0)
    assert out["signal_window"] == (20.0, 30.0)
    assert out["noise_window"] == (10.0, 20.0)
    assert len(out["signal_spec"]) == len(out["noise_spec"])
    # signal spectrum carries much more energy than the noise spectrum
    assert out["signal_spec"].sum() > 3 * out["noise_spec"].sum()
    # quantile windows start at/after the arrival
    q = signal_noise_spectra(x, delta, 0.0, arrival, win_length=(0.05, 0.95))
    assert q["signal_window"][0] >= arrival
    assert q["noise_window"][1] == arrival


def test_meanslice():
    from stream2segment_spark.funclib.templates import meanslice
    x = np.concatenate([np.full(100, 2.0), np.full(100, 4.0)])
    assert meanslice(x, 1.0, 0.0, 0.0, 100.0) == pytest.approx(2.0)
    assert meanslice(x, 1.0, 0.0, 100.0, 200.0) == pytest.approx(4.0)
    assert np.isnan(meanslice(x, 1.0, 0.0, 500.0, 600.0))


def test_multievent_flags():
    from stream2segment_spark.funclib.templates import multievent_flags
    delta = 0.01
    t = np.arange(0, 100, delta)
    one = np.where((t >= 10) & (t < 15),
                   np.sin(2 * np.pi * 5 * t), 0.0) + 1e-6
    res1 = multievent_flags(one, delta)
    assert not res1["flag_after"]
    # a second, SMALLER burst well after the main release (must stay under
    # the 1 - split_at energy share or the quantile split lands inside it)
    two = one + np.where((t >= 70) & (t < 71),
                         0.7 * np.sin(2 * np.pi * 5 * t), 0.0)
    res2 = multievent_flags(two, delta)
    assert res2["flag_after"]
    assert res2["score_after"] > res1["score_after"] * 5


def test_kernel_udfs_null_rows_pass_through(spark):
    """NULL waveform rows (failed downloads) yield NULL kernel outputs,
    never a batch crash; non-null rows are unaffected by the mixing."""
    from pyspark.sql import Row, functions as F

    from stream2segment_spark.funclib.udfs import (
        ampspec_udf, cumsumsq_udf, moving_average_udf, quantile_index_udf,
        snr_amp_udf, sta_lta_udf)
    df = spark.createDataFrame(
        [Row(i=0, a=[1.0, 2.0, 3.0, 4.0], b=[1.0, 1.0, 1.0, 1.0]),
         Row(i=1, a=None, b=[1.0, 1.0, 1.0, 1.0]),
         Row(i=2, a=[2.0, 2.0, 2.0, 2.0], b=None)])
    out = df.select(
        "i",
        cumsumsq_udf()(F.col("a")).alias("c"),
        ampspec_udf()(F.col("a")).alias("sp"),
        quantile_index_udf(0.5)(F.col("a")).alias("qi"),
        snr_amp_udf()(F.col("a"), F.col("b")).alias("snr"),
        moving_average_udf(3)(F.col("a")).alias("ma"),
        sta_lta_udf(2, 4)(F.col("a")).alias("sl"),
    ).orderBy("i").collect()
    ok, nul_a, nul_b = out
    assert ok["c"] is not None and ok["snr"] is not None
    assert all(nul_a[c] is None for c in ("c", "sp", "qi", "snr", "ma",
                                          "sl"))
    assert nul_b["snr"] is None          # either side NULL -> NULL
    assert nul_b["c"] is not None        # but a-only kernels still run


def test_bandpass_removes_dc_offset():
    """A bandpass must attenuate DC: a large constant offset may not
    survive filtering (the f=0 highpass gain used to be exactly 1)."""
    from stream2segment_spark.funclib.traces import (
        bandpass_zerophase, butterworth_zerophase_response)
    h = butterworth_zerophase_response(256, 0.01, 0.5, 20.0)
    assert h[0] == 0.0
    rng = np.random.default_rng(5)
    x = rng.normal(0.0, 1.0, 256) + 1000.0     # huge DC offset
    y = bandpass_zerophase(x, 0.01, 0.5, 20.0)
    assert abs(np.mean(y)) < 1.0               # offset removed
    # freq_min=0 keeps DC (no highpass requested)
    h0 = butterworth_zerophase_response(256, 0.01, 0.0, 20.0)
    assert h0[0] == 1.0


def test_savgol_window_wider_than_signal_keeps_length():
    """window_size > signal length clamps instead of returning a
    wrong-length (or even LONGER) array."""
    from stream2segment_spark.funclib.ndarrays import savitzky_golay
    rng = np.random.default_rng(7)
    for n in (100, 16, 3, 1):
        y = rng.normal(size=n)
        out = savitzky_golay(y, 201, 3)
        assert len(out) == n, n
    # degenerate: cannot fit the polynomial -> identity / zero-deriv
    y = rng.normal(size=2)
    assert list(savitzky_golay(y, 201, 3)) == list(y)
    assert list(savitzky_golay(y, 201, 3, deriv=1)) == [0.0, 0.0]


def test_triangsmooth_rejects_wraparound_ratio():
    """winlen_ratio > 1 would wrap early windows into the array tail
    (negative indexing); reject loudly."""
    import pytest as _pytest

    from stream2segment_spark.funclib.ndarrays import triangsmooth
    with _pytest.raises(ValueError, match="winlen_ratio"):
        triangsmooth(np.arange(20.0), 4.0)
    out = triangsmooth(np.arange(20.0), 0.5)    # valid ratio unchanged
    assert len(out) == 20 and abs(out[1] - 1.0) < 1.5


def test_cumsumsq_udf_batch_shape_invariant(spark):
    """The same row yields the same cumulative-energy output whether it
    lands in an equal-length (vectorized) or ragged (fallback) Arrow
    batch — hi==lo rows stay unnormalized in BOTH paths."""
    from pyspark.sql import Row, functions as F

    from stream2segment_spark.funclib.udfs import (
        cumsumsq_udf, quantile_index_udf)
    const = [3.0, 0.0, 0.0]                     # hi == lo after square
    uniform = spark.createDataFrame(
        [Row(id=1, x=const), Row(id=2, x=[1.0, 2.0, 3.0])])
    ragged = spark.createDataFrame(
        [Row(id=1, x=const), Row(id=2, x=[1.0, 2.0, 3.0, 4.0])])
    for df in (uniform, ragged):
        got = {r["id"]: (list(r["c"]), r["qi"]) for r in df.select(
            "id", cumsumsq_udf()(F.col("x")).alias("c"),
            quantile_index_udf(0.05)(F.col("x")).alias("qi")).collect()}
        # unnormalized [9,9,9] (hi==lo) in BOTH batch shapes; the
        # pre-fix vectorized path returned [0,0,0] -> index 3
        assert got[1] == ([9.0, 9.0, 9.0], 0), got[1]
