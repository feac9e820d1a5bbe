"""Arrow-batched pandas-UDF adapters exposing the funclib kernels on
``array<float|double>`` columns (SURVEY §2.9 'Spark shape').

Every adapter receives a pd.Series of array values per Arrow batch and
vectorizes with numpy over the batch (np.stack where lengths are uniform).
Row-at-a-time Python UDFs are deliberately absent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from stream2segment_spark.funclib import ndarrays as ND


def _nullsafe(fn):
    """Wrap a Series(-s)->Series kernel so NULL rows pass through as
    NULL: failed-download segments carry NULL arrays in the warehouse,
    and a kernel column must degrade per row, not kill the batch."""
    def wrapped(s: pd.Series, *rest: pd.Series) -> pd.Series:
        mask = s.notna()
        for r in rest:
            mask &= r.notna()
        if mask.all():
            return fn(s, *rest)
        out = pd.Series([None] * len(s), index=s.index, dtype=object)
        if mask.any():
            res = fn(s[mask], *[r[mask] for r in rest])
            out[mask] = list(res)
        return out
    return wrapped


def _to_matrix(s: pd.Series) -> np.ndarray | list[np.ndarray]:
    """Stack equal-length arrays into one (batch, n) matrix; ragged input
    falls back to a list of arrays."""
    arrs = [np.asarray(a, dtype=float) for a in s]
    if arrs and all(len(a) == len(arrs[0]) for a in arrs):
        return np.stack(arrs)
    return arrs


def _cumsumsq_matrix(m: np.ndarray) -> np.ndarray:
    """Vectorized twin of ``ND.cumsumsq`` over a (batch, n) matrix with
    IDENTICAL per-row semantics — in particular the hi==lo and leading-
    NaN rows stay UNNORMALIZED (raw cumulative sums), exactly like the
    1-D kernel the ragged fallback calls. Without the mirror, the same
    row normalized differently depending on which other rows shared its
    Arrow batch (equal-length batch vs ragged fallback)."""
    c = np.cumsum(np.square(m), axis=1)
    if not c.size:
        return c
    lo, last = c[:, :1], c[:, -1:]
    hi = np.where(np.isnan(last),
                  np.where(np.isnan(c), -np.inf, c).max(
                      axis=1, keepdims=True),
                  last)
    do = (~np.isnan(lo)) & (hi != lo)
    return np.where(do, (c - lo) / np.where(do, hi - lo, 1.0), c)


def cumsumsq_udf():
    """Normalized cumulative energy per array (factory: pandas_udf objects
    cannot be created at module import — workers re-import this module
    without an active session, and DDL type parsing needs one)."""
    def _impl(s: pd.Series) -> pd.Series:
        m = _to_matrix(s)
        if isinstance(m, np.ndarray):
            return pd.Series(list(_cumsumsq_matrix(m)))
        return pd.Series([ND.cumsumsq(a) for a in m])
    return F.pandas_udf("array<double>")(_nullsafe(_impl))


def ampspec_udf():
    """Amplitude spectrum |rfft| per array."""
    def _impl(s: pd.Series) -> pd.Series:
        m = _to_matrix(s)
        if isinstance(m, np.ndarray):
            return pd.Series(list(np.abs(np.fft.rfft(m, axis=1))))
        return pd.Series([ND.ampspec(a) for a in m])
    return F.pandas_udf("array<double>")(_nullsafe(_impl))


def quantile_index_udf(q: float):
    """Factory: index where the normalized cumulative energy first reaches
    quantile ``q`` (np.searchsorted left, like the reference's sn window
    computation, traces.py:140-143)."""
    def _impl(s: pd.Series) -> pd.Series:
        m = _to_matrix(s)
        if isinstance(m, np.ndarray):
            cn = _cumsumsq_matrix(m)
            # mirror np.searchsorted(cn, q, side='left'): count < q
            return pd.Series((cn < q).sum(axis=1).astype("int64"))
        return pd.Series([int(np.searchsorted(ND.cumsumsq(a), q)) for a in m])
    return F.pandas_udf("long")(_nullsafe(_impl))


def snr_amp_udf():
    """SNR of two amplitude-form arrays: sqrt(mean(sig^2)/mean(noise^2))
    (reference snr with signals_form='amp', ndarrays.py:94-167)."""
    def _impl(sig: pd.Series, noise: pd.Series) -> pd.Series:
        out = np.empty(len(sig))
        for i, (a, b) in enumerate(zip(sig, noise)):
            out[i] = ND.snr(np.asarray(a, float), np.asarray(b, float),
                            signals_form="amp")
        return pd.Series(out)
    return F.pandas_udf("double")(_nullsafe(_impl))


def triangsmooth_udf(winlen_ratio: float):
    def _impl(s: pd.Series) -> pd.Series:
        return pd.Series([ND.triangsmooth(np.asarray(a, float), winlen_ratio)
                          for a in s])
    return F.pandas_udf("array<double>")(_nullsafe(_impl))


def moving_average_udf(width: int):
    """W4 envelope smoothing (coda.moving_average: centered mean with
    edge shrink) applied per array value."""
    def _impl(s: pd.Series) -> pd.Series:
        from stream2segment_spark.funclib.coda import moving_average
        return pd.Series([moving_average(np.asarray(a, float), width)
                          for a in s])
    return F.pandas_udf("array<double>")(_nullsafe(_impl))


def savgol_udf(window_size: int, order: int):
    """N11 Savitzky-Golay polynomial smoothing (ndarrays.savitzky_golay:
    pinv-Vandermonde coefficients, mirror-padded edges) per array value."""
    def _impl(s: pd.Series) -> pd.Series:
        return pd.Series([
            ND.savitzky_golay(np.asarray(a, float), window_size, order)
            for a in s])
    return F.pandas_udf("array<double>")(_nullsafe(_impl))


def sta_lta_udf(nsta: int, nlta: int):
    """N10 STA/LTA trigger ratio (coda.sta_lta) applied per array value
    (0 while the long-term window is not yet full)."""
    def _impl(s: pd.Series) -> pd.Series:
        from stream2segment_spark.funclib.coda import sta_lta
        return pd.Series([sta_lta(np.asarray(a, float), nsta, nlta)
                          for a in s])
    return F.pandas_udf("array<double>")(_nullsafe(_impl))

