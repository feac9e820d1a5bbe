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


def make_producer(label: str, transform, dx_fn=None, n_buckets: int = 512,
                  preprocess=None):
    """Wrap a per-segment ``(samples: np.ndarray, delta: float) -> y``
    function into an Arrow-batched plot-struct UDF (x0, dx, downsampled
    y, raw length, label). ``dx_fn(x, dt)`` overrides the x-spacing of
    the produced series (default: the sample spacing ``dt``).

    ``preprocess`` (``(samples, delta) -> samples``) is applied to the
    raw samples BEFORE the transform — the reference GUI's
    ``@gui.preprocess`` toggle (core.py:380-415 runs plot functions on
    the pre-processed stream when the browser checkbox is on). A
    preprocess exception becomes the plot payload's label
    (``(@preprocess) ...``) with null data, mirroring the reference's
    error-string plot (core.py:398-405)."""
    if dx_fn is None:
        dx_fn = lambda x, dt: dt  # noqa: E731

    @F.pandas_udf(f"struct<{PLOT_DDL}>")
    def _udf(samples: pd.Series, delta: pd.Series) -> pd.DataFrame:
        rows = []
        for arr, dt in zip(samples, delta):
            if arr is None:
                rows.append({"x0": None, "dx": None, "y": None,
                             "n_raw": None, "label": label})
                continue
            x = np.asarray(arr, dtype=float)
            if preprocess is not None:
                try:
                    x = np.asarray(preprocess(x, float(dt)), dtype=float)
                except Exception as exc:  # noqa: BLE001 — per-row error row
                    rows.append({"x0": None, "dx": None, "y": None,
                                 "n_raw": None,
                                 "label": f"{label}: (@preprocess) {exc}"})
                    continue
            y = np.asarray(transform(x, float(dt)), dtype=float)
            rows.append({
                "x0": 0.0,
                "dx": float(dx_fn(x, float(dt))),
                "y": downsample_minmax(y, n_buckets),
                "n_raw": int(len(y)),
                "label": label,
            })
        return pd.DataFrame(rows)
    # asNondeterministic (guide §4.4, r10): consumers explode p.y and
    # read the sibling struct fields — the generator/field-extraction
    # split let the optimizer place TWO identical ArrowEvalPython nodes
    # per producer (plot_downsample's r9 plan ran every producer twice
    # per row). The producer is pure; the marker stops the duplication.
    return _udf.asNondeterministic()


def plot_producers(n_buckets: int = 512, preprocess=None):
    """The reference GUI's three standard plots as (samples, delta) ->
    struct producers: raw trace, normalized cumulative energy, amplitude
    spectrum. ``preprocess`` builds the pre-processed variants (the
    reference GUI's on-demand toggle)."""
    return {
        "trace": make_producer("trace", lambda x, dt: x,
                               n_buckets=n_buckets, preprocess=preprocess),
        "cumulative": make_producer("cumulative",
                                    lambda x, dt: cumsumsq(x),
                                    n_buckets=n_buckets,
                                    preprocess=preprocess),
        "spectrum": make_producer(
            "spectrum", lambda x, dt: ampspec(x),
            dx_fn=lambda x, dt: float(freqs(len(x), dt)[1])
            if len(x) > 1 else 0.0, n_buckets=n_buckets,
            preprocess=preprocess),
    }


def segment_plot(label: str | None = None, dx=None):
    """Decorator marking a user function as a custom plot producer — the
    analogue of the reference GUI's ``@gui.plot`` hook (the module passed
    to ``s2s show -p gui.py``). The function receives the decoded
    ``(samples: np.ndarray, delta: float)`` of one segment and returns
    the y-series to display::

        @segment_plot(label="envelope")
        def env(samples, delta):
            return np.abs(samples)

    ``dx(x, dt)`` optionally overrides the series' x-spacing (e.g. a
    frequency step for spectra)."""
    def deco(fn):
        fn.__s2s_plot__ = label or fn.__name__
        fn.__s2s_plot_dx__ = dx
        return fn
    return deco


def segment_preprocess(fn):
    """Decorator marking a user function as THE pre-processing step —
    the analogue of the reference GUI's ``@gui.preprocess`` hook
    (process/gui/__init__.py:11-14; applied on demand by the browser
    toggle, core.py:380-415). The function receives the decoded
    ``(samples: np.ndarray, delta: float)`` of one segment and returns
    the replacement samples every plot producer then runs on::

        @segment_preprocess
        def bandpassed(samples, delta):
            return bandpass(samples, delta, 0.1, 20.0)
    """
    fn.__s2s_preprocess__ = True
    return fn


def collect_preprocess(module):
    """The single ``@segment_preprocess``-tagged function of a user
    module, or None. Raises if the module tags more than one (the
    reference allows exactly one ``@gui.preprocess``)."""
    found = [getattr(module, name) for name in dir(module)
             if getattr(getattr(module, name), "__s2s_preprocess__",
                        False)]
    if len(found) > 1:
        raise ValueError(
            "more than one @segment_preprocess function: "
            f"{sorted(f.__name__ for f in found)}")
    return found[0] if found else None


def collect_custom_specs(module) -> dict:
    """Raw ``{label: (fn, dx_fn)}`` specs of a user module's
    ``@segment_plot`` functions — the un-wrapped form, so callers can
    build both raw and pre-processed producer variants."""
    out = {}
    for name in dir(module):
        fn = getattr(module, name)
        label = getattr(fn, "__s2s_plot__", None)
        if label is not None and callable(fn):
            out[label] = (fn, getattr(fn, "__s2s_plot_dx__", None))
    return out


def collect_custom_producers(module, n_buckets: int = 512,
                             preprocess=None) -> dict:
    """All ``@segment_plot``-tagged functions of a user module, wrapped
    as plot-struct UDFs keyed by their label."""
    return {label: make_producer(label, fn, dx_fn=dx_fn,
                                 n_buckets=n_buckets,
                                 preprocess=preprocess)
            for label, (fn, dx_fn) in collect_custom_specs(module).items()}
