"""Bit-identity of funclib/batch.py vs the per-row kernels.

Every assertion is EXACT (array_equal on the raw float64 bytes), never
approximate: the batched twins exist so funclib_spectra can vectorize
across Arrow-batch rows without changing a single output bit — its
DuckDB gate oracle hash-compares values at fixed rounded precision, so
"close" is not good enough.
"""

from __future__ import annotations

import numpy as np
import pytest

from stream2segment_spark.funclib import batch as B
from stream2segment_spark.funclib.ndarrays import (
    ampspec, fft, powspec, response_spectrum_nigam_jennings)
from stream2segment_spark.funclib.response import (
    PAZResponse, remove_response)
from stream2segment_spark.funclib.traces import (
    bandpass_zerophase, synth_wood_anderson, taper_hann)

_N, _DELTA = 64, 0.01
_RNG = np.random.default_rng(0xC0FFEE)
# mix of scales, signs, and denormal-free noise; 257 rows exercises odd
# batch sizes; a few pathological rows (constant, zero, huge) included
_X = np.vstack([
    _RNG.standard_normal((253, _N)) * 10.0 ** _RNG.integers(-3, 4, (253, 1)),
    np.zeros((1, _N)),
    np.ones((1, _N)) * 1e6,
    np.linspace(-1, 1, _N)[None, :],
    np.full((1, _N), -0.0),
])

_PAZ = PAZResponse(
    poles=(complex(-0.037004, 0.037016), complex(-0.037004, -0.037016),
           complex(-251.33, 0.0)),
    zeros=(0j, 0j), normalization=3.47, sensitivity=1.0)


def test_taper_batch_bit_identical():
    got = B.taper_hann_batch(_X)
    for i in range(_X.shape[0]):
        assert np.array_equal(got[i], taper_hann(_X[i]), equal_nan=True)


def test_fft_amp_pow_batch_bit_identical():
    sp = B.fft_batch(_X)
    for i in range(_X.shape[0]):
        one = fft(_X[i])
        assert np.array_equal(sp[i], one)
        assert np.array_equal(np.abs(sp)[i], ampspec(one, True))
        assert np.array_equal(np.square(np.abs(sp))[i], powspec(one, True))


def test_bandpass_batch_bit_identical():
    got = B.bandpass_zerophase_batch(_X, _DELTA, 2.0, 15.0)
    for i in range(_X.shape[0]):
        assert np.array_equal(
            got[i], bandpass_zerophase(_X[i], _DELTA, 2.0, 15.0),
            equal_nan=True)


def test_wood_anderson_batch_bit_identical():
    got = B.synth_wood_anderson_batch(_X, _DELTA)
    for i in range(_X.shape[0]):
        assert np.array_equal(got[i], synth_wood_anderson(_X[i], _DELTA),
                              equal_nan=True)


@pytest.mark.parametrize("output", ["VEL", "DISP", "ACC"])
def test_remove_response_batch_bit_identical(output):
    got = B.remove_response_batch(_X, _DELTA, _PAZ, output=output,
                                  water_level_db=60.0)
    for i in range(_X.shape[0]):
        assert np.array_equal(
            got[i], remove_response(_X[i], _DELTA, _PAZ, output=output,
                                    water_level_db=60.0),
            equal_nan=True)


def test_nigam_jennings_batch_bit_identical():
    periods = np.array([0.1, 0.5])
    got = B.response_spectrum_nigam_jennings_batch(_X, _DELTA, periods)
    for i in range(_X.shape[0]):
        one = response_spectrum_nigam_jennings(_X[i], _DELTA, periods)
        for k in ("S_d", "S_v", "S_a",
                  "true_max_velocity", "true_max_acceleration"):
            assert np.array_equal(got[k][i], one[k]), k


def test_row_slice_sums_bit_identical():
    # funclib_spectra's trim_sum groups rows by identical (i0, i1) and
    # sums each group's contiguous slice along axis 1; numpy's pairwise
    # last-axis reduction over a C-contiguous matrix must match the
    # per-row 1-D slice sum bit for bit
    for (a, b) in [(0, 64), (3, 61), (5, 5), (1, 2), (17, 40)]:
        rows = _X[::3]                       # non-trivial row selection
        grp = rows[:, a:b].sum(axis=1)
        for i in range(rows.shape[0]):
            assert np.array_equal(grp[i], rows[i, a:b].sum())


def test_row_energy_and_peak_bit_identical():
    got_e = (_X * _X).sum(axis=1)
    got_p = np.abs(_X).max(axis=1)
    for i in range(_X.shape[0]):
        x = _X[i]
        assert np.array_equal(got_e[i], (x * x).sum())
        assert np.array_equal(got_p[i], np.abs(x).max())
