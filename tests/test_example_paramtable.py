"""End-to-end test of the paramtable example: segments with REAL miniSEED
blobs, joined dims, full decode->bandpass->sn-split->feature chain through
process_df."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream2segment_spark.examples.paramtable import OUTPUT_SCHEMA, main
from stream2segment_spark.process import process_df
from stream2segment_spark.sources.mseed import encode_record

T0 = datetime(2021, 5, 1, 0, 0, 0, tzinfo=timezone.utc)
RATE = 100.0


def _wave(idx: int, n=3000, noise=0.01, amp=1.0, onset_frac=0.4):
    rng = np.random.default_rng(idx)
    t = np.arange(n) / RATE
    x = rng.normal(0, noise, n)
    onset = int(n * onset_frac)
    x[onset:] += amp * np.sin(2 * np.pi * 3.0 * t[:n - onset]) \
        * np.exp(-0.5 * t[:n - onset])
    return np.round(x * 1000).astype(np.int64)


def _blob(idx: int, **kw) -> bytes:
    x = _wave(idx, **kw)
    out = b""
    for i, off in enumerate(range(0, len(x), 100)):
        out += encode_record("GE", f"S{idx:03d}", "", "HHZ",
                             T0 + timedelta(seconds=off / RATE), RATE,
                             x[off:off + 100], encoding=3, seq=i + 1)
    return out


@pytest.fixture(scope="module")
def segments(spark):
    arr = T0 + timedelta(seconds=3000 * 0.4 / RATE)
    rows = [
        (1, _blob(1), arr, 4.5, 1.2),                 # good, clear signal
        (2, _blob(2, amp=0.0), arr, 6.0, 3.0),        # pure noise
        (3, None, arr, 5.0, 2.0),                     # empty -> skip
        (4, b"garbage bytes", arr, 5.0, 2.0),         # decode error -> skip
    ]
    df = spark.createDataFrame(
        rows, "id long, data binary, arrival_time timestamp, "
              "__event__magnitude double, event_distance_deg double")
    return df.withColumn("arrival_time",
                         F.col("arrival_time").cast("timestamp"))


def test_paramtable_features(segments):
    out = process_df(segments, main, OUTPUT_SCHEMA,
                     config={"max_gap": 0.5}, collect_errors=True)
    rows = {r["segment_db_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    good, noise = rows[1], rows[2]
    assert good["s2s_error"] is None and noise["s2s_error"] is None
    assert rows[3]["s2s_error"] == "empty data"
    assert "mseed" in rows[4]["s2s_error"]

    assert good["seed_id"] == "GE.S001..HHZ"
    assert good["sample_rate"] == RATE
    assert good["n_samples"] == 3000
    # the signal-bearing segment has far higher SNR than the noise one
    assert good["snr"] > 50
    assert noise["snr"] < 5
    assert good["pgv"] > 0 and good["pga"] > 0 and good["wa_peak"] > 0
    # cumulative-energy quantile times bracket the onset (12 s in)
    assert 10.0 < good["t05"] < 16.0
    assert good["t95"] > good["t05"]
    assert good["mag"] == 4.5 and good["dist_deg"] == 1.2
