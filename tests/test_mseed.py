"""Decoder tests for the from-scratch miniSEED (SEED 2.4) parser: encode
synthetic records with our own serializer, decode, check samples + gap
metrics + windowing + error semantics (SURVEY S7)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream2segment_spark.sources import mseed as MS

T0 = datetime(2021, 3, 4, 5, 6, 7, tzinfo=timezone.utc)


def _rec(samples, start=T0, rate=100.0, cha="HHZ", encoding=3, loc=""):
    return MS.encode_record("GE", "APE", loc, cha, start, rate,
                            np.asarray(samples), encoding=encoding)


def test_roundtrip_int32_single_record():
    x = np.arange(50, dtype=np.int64) * 3 - 25
    out = MS.unpack_blob(_rec(x))
    assert len(out) == 1
    r = out[0]
    assert r["seed_id"] == "GE.APE..HHZ"
    assert r["sample_rate"] == 100.0
    assert r["n_samples"] == 50
    assert r["max_gap_overlap_ratio"] == 0.0
    np.testing.assert_array_equal(r["samples"], x.astype(float))
    assert r["start_time"] == T0.replace(tzinfo=None)
    assert r["end_time"] == (T0 + timedelta(seconds=0.5)).replace(tzinfo=None)


@pytest.mark.parametrize("encoding", [1, 3, 4, 5, 10])
def test_roundtrip_encodings(encoding):
    x = np.array([0, 5, -7, 1000, -32000, 12, 13, 13], dtype=np.int64)
    out = MS.unpack_blob(_rec(x, encoding=encoding))
    np.testing.assert_array_equal(out[0]["samples"], x.astype(float))


def test_steim1_large_values_many_frames():
    rng = np.random.default_rng(7)
    x = np.cumsum(rng.integers(-100000, 100000, size=90))
    out = MS.unpack_blob(_rec(x, encoding=10))
    np.testing.assert_array_equal(out[0]["samples"], x.astype(float))


def test_multichannel_grouping_and_order():
    x1, x2 = [1, 2, 3], [9, 8, 7]
    # second HHZ record out of order; HHN interleaved
    blob = (_rec(x2, start=T0 + timedelta(seconds=0.03))
            + _rec([4, 5], cha="HHN") + _rec(x1, start=T0))
    out = MS.unpack_blob(blob)
    assert [r["seed_id"] for r in out] == ["GE.APE..HHN", "GE.APE..HHZ"]
    np.testing.assert_array_equal(out[1]["samples"], [1, 2, 3, 9, 8, 7])
    assert out[1]["max_gap_overlap_ratio"] == 0.0


def test_gap_and_overlap_metric():
    # rec1 ends at T0+0.03 (3 samples @ 100 Hz); rec2 starts 5 samples late
    blob = _rec([1, 2, 3]) + _rec([4, 5], start=T0 + timedelta(seconds=0.08))
    out = MS.unpack_blob(blob)
    assert out[0]["max_gap_overlap_ratio"] == pytest.approx(5.0)
    # overlap: rec2 starts 1 sample early -> -1
    blob = _rec([1, 2, 3]) + _rec([4, 5], start=T0 + timedelta(seconds=0.02))
    out = MS.unpack_blob(blob)
    assert out[0]["max_gap_overlap_ratio"] == pytest.approx(-1.0)


def test_window_drops_out_of_bounds_records():
    blob = _rec([1, 2, 3]) + _rec([4, 5], start=T0 + timedelta(seconds=10))
    out = MS.unpack_blob(blob, window_start=T0 + timedelta(seconds=5))
    assert out[0]["n_samples"] == 2
    out = MS.unpack_blob(blob, window_end=T0 + timedelta(seconds=5))
    assert out[0]["n_samples"] == 3


def test_mixed_rate_is_per_channel_error():
    blob = _rec([1, 2]) + _rec([3, 4], start=T0 + timedelta(1), rate=50.0)
    out = MS.unpack_blob(blob)
    assert "mixed sample rates" in out[0]["error"]


def test_unpack_udf_on_spark(spark):
    x = np.arange(20, dtype=np.int64)
    good = _rec(x, encoding=10)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"garbage" * 10)), (3, None)],
        "id long, data binary")
    res = (df.select("id", F.explode_outer(MS.unpack_mseed_udf()("data"))
                     .alias("ch"))
           .select("id", "ch.seed_id", "ch.n_samples", "ch.samples", "ch.error")
           .collect())
    rows = {r["id"]: r for r in res}
    assert rows[1]["seed_id"] == "GE.APE..HHZ"
    assert rows[1]["n_samples"] == 20
    assert rows[1]["samples"] == list(range(20))
    assert rows[1]["error"] is None
    assert rows[2]["error"] is not None        # decode error -> row, not crash
    assert rows[3]["seed_id"] is None          # null blob -> null struct
