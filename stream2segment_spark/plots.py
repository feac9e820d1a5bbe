"""Per-segment plot-data producers (SURVEY X4) — the data layer of the
reference GUI (process/gui/webapp/mainapp/core.py:240-415) without the web
app: each producer turns decoded samples into a downsampled series ready
for any front end.

The reference downsamples traces before shipping them to plotly; here the
same min/max-per-bucket downsampling (the standard waveform-display
algorithm: preserves peaks that plain striding would alias away) runs as a
numpy kernel per segment, exposed as a pandas UDF so plot data for
millions of segments is produced distributed and written once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from stream2segment_spark.funclib.ndarrays import ampspec, cumsumsq, freqs


def downsample_minmax(samples: np.ndarray, n_buckets: int) -> np.ndarray:
    """Min/max-per-bucket downsample: output length <= 2*n_buckets, values
    interleaved (min_i, max_i) per bucket — peak-preserving."""
    x = np.asarray(samples, dtype=float)
    if len(x) <= 2 * n_buckets:
        return x.copy()
    edges = np.linspace(0, len(x), n_buckets + 1).astype(int)
    out = np.empty(2 * n_buckets)
    for i in range(n_buckets):
        b = x[edges[i]:edges[i + 1]]
        out[2 * i] = b.min()
        out[2 * i + 1] = b.max()
    return out


PLOT_DDL = ("x0 double, dx double, y array<double>, n_raw int, "
            "label string")


def plot_producers(n_buckets: int = 512):
    """The reference GUI's three standard plots as (samples, delta) ->
    struct producers: raw trace, normalized cumulative energy, amplitude
    spectrum. Each is an Arrow-batched pandas UDF returning (x0, dx,
    downsampled y, raw length, label)."""

    def _mk(label: str, transform, dx_fn):
        @F.pandas_udf(f"struct<{PLOT_DDL}>")
        def _udf(samples: pd.Series, delta: pd.Series) -> pd.DataFrame:
            rows = []
            for arr, dt in zip(samples, delta):
                if arr is None:
                    rows.append({"x0": None, "dx": None, "y": None,
                                 "n_raw": None, "label": label})
                    continue
                x = np.asarray(arr, dtype=float)
                y = transform(x, float(dt))
                rows.append({
                    "x0": 0.0,
                    "dx": dx_fn(x, float(dt)),
                    "y": downsample_minmax(y, n_buckets),
                    "n_raw": int(len(y)),
                    "label": label,
                })
            return pd.DataFrame(rows)
        return _udf

    return {
        "trace": _mk("trace", lambda x, dt: x, lambda x, dt: dt),
        "cumulative": _mk("cumulative", lambda x, dt: cumsumsq(x),
                          lambda x, dt: dt),
        "spectrum": _mk("spectrum", lambda x, dt: ampspec(x),
                        lambda x, dt: float(freqs(len(x), dt)[1])
                        if len(x) > 1 else 0.0),
    }
