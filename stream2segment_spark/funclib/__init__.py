"""Numeric / time-series kernels (numpy) + pandas-UDF adapters.

The reference's funclib (process/funclib/ndarrays.py, traces.py) operates on
per-segment sample arrays; here the same kernels are plain numpy functions
(``ndarrays``), waveform-window helpers (``traces``) and Arrow-batched
pandas-UDF adapters (``udfs``) over ``array<double>`` columns.

scipy is NOT required (not in the runtime image): trapezoidal integration,
linear regression and grid interpolation are implemented with numpy.
"""
