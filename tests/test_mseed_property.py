"""Property-based roundtrip tests for the miniSEED codec: ANY int series
within each encoding's representable range must encode -> decode to the
exact input (reference mseedlite only decodes; the encoder is this
engine's own, so the roundtrip is the strongest available oracle)."""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from stream2segment_spark.sources.mseed import encode_record, unpack_blob

T0 = datetime(2021, 6, 1, 12, 0, 30, tzinfo=timezone.utc)


def _roundtrip(samples: np.ndarray, encoding: int) -> np.ndarray:
    blob = encode_record("GE", "STA1", "", "HHZ", T0, 100.0, samples,
                         encoding=encoding)
    recs = unpack_blob(blob)
    assert len(recs) == 1
    assert recs[0]["error"] is None, recs[0]["error"]
    return np.asarray(recs[0]["samples"])


# Steim encodes int32 sample VALUES as DIFFERENCES: deltas are bounded by
# the encoding's difference width (Steim1 32-bit words, Steim2 30-bit) and
# the running sum must stay inside int32 — so the list length shrinks as
# the drawn step size grows (long smooth series and short violent ones
# both get exercised).
def _series(diff_limit: int, max_len: int = 80):
    def lists_for(step):
        n = max(1, min(max_len, (2**31 - 1) // max(step, 1)))
        return st.lists(st.integers(-step, step), min_size=1, max_size=n)
    return (st.integers(1, diff_limit).flatmap(lists_for)
            .map(lambda steps: np.cumsum(np.asarray(steps, dtype=np.int64))))


@settings(max_examples=40, deadline=None)
@given(_series(2**30 - 1))
def test_steim1_roundtrip_exact(series):
    assert np.array_equal(_roundtrip(series, 10), series)


@settings(max_examples=40, deadline=None)
@given(_series(2**29 - 1))
def test_steim2_roundtrip_exact(series):
    assert np.array_equal(_roundtrip(series, 11), series)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(-2**31, 2**31 - 1), min_size=1, max_size=100)
       .map(lambda v: np.asarray(v, dtype=np.int64)))
def test_int32_roundtrip_exact(series):
    assert np.array_equal(_roundtrip(series, 3), series)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(-2**15, 2**15 - 1), min_size=1, max_size=200)
       .map(lambda v: np.asarray(v, dtype=np.int64)))
def test_int16_roundtrip_exact(series):
    assert np.array_equal(_roundtrip(series, 1), series)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(-1e30, 1e30, allow_nan=False, width=64),
                min_size=1, max_size=50)
       .map(lambda v: np.asarray(v, dtype=np.float64)))
def test_float64_roundtrip_exact(series):
    assert np.array_equal(_roundtrip(series, 5), series)


def test_steim1_wraparound_decodes_as_int32():
    """Spec-legal mod-2^32 diff wrap: samples near +2^31 whose next value
    wraps to the negative side decode to the int32-wrapped sequence."""
    a = 2**31 - 5
    series = np.array([a, a + 10], dtype=np.int64)  # a+10 wraps in int32
    got = _roundtrip(series, 10)
    want = ((series + 2**31) % 2**32 - 2**31).astype(float)
    assert np.array_equal(got, want)
    assert got[1] == -(2**31) + 5  # really wrapped


def test_steim2_wraparound_decodes_as_int32():
    a = 2**31 - 5
    series = np.array([a, a + 7], dtype=np.int64)
    got = _roundtrip(series, 11)
    want = ((series + 2**31) % 2**32 - 2**31).astype(float)
    assert np.array_equal(got, want)
