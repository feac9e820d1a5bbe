"""Tests for adaptive event-request splitting (S3) and the SDS file sink
(K6)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pytest

from stream2segment_spark.sources.events_split import (
    EventRequest, RequestTooLarge, gr_split_magnitude, split_events_request)


def test_gr_split_halves_counts():
    lo, hi = 3.0, 7.0
    mid = gr_split_magnitude(lo, hi, b=1.0)
    n = lambda a, b: 10.0 ** (-a) - 10.0 ** (-b)
    assert n(lo, mid) == pytest.approx(n(mid, hi), rel=1e-9)
    assert lo < mid < hi


def _gr_count(req: EventRequest, total_rate: float = 1e6) -> float:
    """Simulated service: events ~ GR in magnitude, uniform in time."""
    frac_mag = (10.0 ** (-req.minmag) - 10.0 ** (-req.maxmag)) / \
        (10.0 ** (-3.0) - 10.0 ** (-8.0))
    frac_t = (req.end - req.start) / timedelta(days=365)
    return total_rate * frac_mag * frac_t


def test_split_until_accepted():
    LIMIT = 20_000
    calls = []

    def fetch(req: EventRequest):
        calls.append(req)
        n = _gr_count(req)
        if n > LIMIT:
            raise RequestTooLarge()
        return int(n)

    root = EventRequest(datetime(2020, 1, 1), datetime(2021, 1, 1), 3.0, 8.0)
    out = split_events_request(root, fetch, min_mag_width=0.05)
    assert len(out) > 10
    assert all(cnt <= LIMIT for _, cnt in out)
    # full coverage of the magnitude and time extents
    assert min(r.minmag for r, _ in out) == 3.0
    assert max(r.maxmag for r, _ in out) == 8.0
    assert min(r.start for r, _ in out) == root.start
    assert max(r.end for r, _ in out) == root.end
    # the sub-requests partition the original: total events preserved
    assert sum(cnt for _, cnt in out) == pytest.approx(_gr_count(root), rel=0.01)
    # both split modes exercised (dense low-mag bands need time bisection)
    assert any(r.end - r.start < (root.end - root.start) for r, _ in out)


def test_time_bisection_fallback():
    def fetch(req: EventRequest):
        # count independent of magnitude -> only time splits help
        if (req.end - req.start) > timedelta(days=40):
            raise RequestTooLarge()
        return "ok"

    root = EventRequest(datetime(2020, 1, 1), datetime(2020, 12, 31),
                        5.0, 5.05)  # already narrower than min_mag_width
    out = split_events_request(root, fetch)
    assert len(out) >= 8
    spans = [(r.start, r.end) for r, _ in out]
    assert spans == sorted(spans)
    assert spans[0][0] == root.start and spans[-1][1] == root.end


def test_unsplittable_raises():
    def fetch(req):
        raise RequestTooLarge()
    root = EventRequest(datetime(2020, 1, 1), datetime(2020, 1, 1, 1, 30),
                        5.0, 5.01)
    with pytest.raises(RequestTooLarge):
        split_events_request(root, fetch)


def test_write_sds_tree(spark, tmp_path):
    from stream2segment_spark.sinks.sds import write_sds_tree
    from stream2segment_spark.sources.mseed import unpack_blob

    samples = [float(v) for v in range(200)]  # 2 records (112/rec)
    df = spark.createDataFrame(
        [("GE", "APE", "", "HHZ", datetime(2021, 2, 3, 4, 5, 6), 100.0, samples),
         ("GE", "APE", "", "HHN", datetime(2021, 2, 3, 4, 5, 6), 100.0, None)],
        "network string, station string, location string, channel string, "
        "start_time timestamp, sample_rate double, samples array<double>")
    root = str(tmp_path / "sds")
    write_sds_tree(df, root)
    path = f"{root}/2021/GE/APE/HHZ.D/GE.APE..HHZ.D.2021.034"
    import os
    assert os.path.exists(path)
    assert not os.path.exists(f"{root}/2021/GE/APE/HHN.D")  # null skipped
    decoded = unpack_blob(open(path, "rb").read())
    assert decoded[0]["seed_id"] == "GE.APE..HHZ"
    assert decoded[0]["n_samples"] == 200
    assert decoded[0]["max_gap_overlap_ratio"] == 0.0
    np.testing.assert_array_equal(decoded[0]["samples"], samples)


def test_write_sds_tree_same_day_segments_append(spark, tmp_path):
    """Two segments of the SAME channel-day land in ONE SDS file with
    both waveforms (per-row 'wb' used to keep only the last one)."""
    import os

    from stream2segment_spark.sinks.sds import write_sds_tree
    from stream2segment_spark.sources.mseed import unpack_blob
    a = [float(v) for v in range(112)]
    b = [float(v) for v in range(112, 224)]
    df = spark.createDataFrame(
        [("GE", "APE", "", "HHZ", datetime(2021, 2, 3, 4, 0, 0), 100.0, a),
         ("GE", "APE", "", "HHZ", datetime(2021, 2, 3, 12, 0, 0), 100.0, b)],
        "network string, station string, location string, channel string, "
        "start_time timestamp, sample_rate double, samples array<double>")
    root = str(tmp_path / "sds2")
    write_sds_tree(df.repartition(4), root)    # rows span partitions
    path = f"{root}/2021/GE/APE/HHZ.D/GE.APE..HHZ.D.2021.034"
    assert os.path.exists(path)
    decoded = unpack_blob(open(path, "rb").read())
    # unpack_blob merges the channel's records into one entry: both
    # segments' samples must be present (per-row 'wb' kept only one)
    samples = [float(v) for v in decoded[0]["samples"]]
    assert len(samples) == 224
    assert 0.0 in samples and 112.0 in samples
