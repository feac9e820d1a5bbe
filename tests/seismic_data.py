"""Deterministic synthetic seismic tables (FIXTURES.md schemas) used to test
the engine's seismic model against a DuckDB oracle.

Shapes mirror the reference's test fixtures (tests/conftest.py:360-520 and
tests/process/test_sqlevalexpr.py:20-80): small, but covering every edge the
derived columns need — NULL/empty/non-empty blobs, open station epochs,
negative missing_data, multi-labelled segments, NULL data_seed_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

RNG_SEED = 42
T0 = pd.Timestamp("2021-01-01 00:00:00")


def make_seismic_tables(
    n_events: int = 50,
    n_stations: int = 20,
    n_segments: int = 600,
) -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(RNG_SEED)

    downloads = pd.DataFrame({
        "id": np.arange(1, 4, dtype=np.int64),
        "run_time": [T0 + pd.Timedelta(days=i) for i in range(3)],
        "log": ["ok", None, "warnings"],
        "warnings": np.int64([0, 5, 2]),
        "errors": np.int64([0, 1, 0]),
        "config": ["a: 1", "a: 2", None],
        "program_version": ["3.0.0"] * 3,
    })

    web_services = pd.DataFrame({
        "id": np.int64([1, 2]),
        "name": ["emsc", "isc"],
        "type": ["event", "event"],
        "url": ["http://emsc.example/fdsnws/event/1/query",
                "http://isc.example/fdsnws/event/1/query"],
    })

    data_centers = pd.DataFrame({
        "id": np.int64([1, 2, 3]),
        "station_url": [f"http://dc{i}.example/fdsnws/station/1/query" for i in range(3)],
        "dataselect_url": [f"http://dc{i}.example/fdsnws/dataselect/1/query" for i in range(3)],
        "organization_name": ["orgA", None, "orgC"],
    })

    ev_ids = np.arange(1, n_events + 1, dtype=np.int64)
    events = pd.DataFrame({
        "id": ev_ids,
        "webservice_id": rng.integers(1, 3, n_events).astype(np.int64),
        "event_id": [f"20210101_{i:07d}" for i in ev_ids],
        "time": [T0 + pd.Timedelta(hours=int(h)) for h in rng.integers(0, 24 * 300, n_events)],
        "latitude": rng.uniform(-90, 90, n_events),
        "longitude": rng.uniform(-180, 180, n_events),
        "depth_km": rng.uniform(0, 700, n_events),
        "author": [None if i % 7 == 0 else f"auth{i % 3}" for i in ev_ids],
        "catalog": ["cat"] * n_events,
        "contributor": [None] * n_events,
        "contributor_id": [None] * n_events,
        "mag_type": rng.choice(["ML", "Mw", "mb"], n_events),
        "magnitude": np.round(rng.uniform(2.0, 8.0, n_events), 2),
        "mag_author": [None] * n_events,
        "event_location_name": [f"loc{i % 5}" for i in ev_ids],
        "event_type": ["earthquake"] * n_events,
    })

    st_ids = np.arange(1, n_stations + 1, dtype=np.int64)
    inv = []
    for i in st_ids:
        inv.append(None if i % 3 == 0 else (b"" if i % 3 == 1 else b"<xml>inv</xml>"))
    stations = pd.DataFrame({
        "id": st_ids,
        "datacenter_id": (st_ids % 3 + 1).astype(np.int64),
        "network": [["GE", "AZ", "N1", "XX"][i % 4] for i in st_ids],
        "station": [f"ST{i:02d}" for i in st_ids],
        "latitude": rng.uniform(-90, 90, n_stations),
        "longitude": rng.uniform(-180, 180, n_stations),
        "elevation": np.where(rng.random(n_stations) < 0.2, np.nan,
                              rng.uniform(0, 3000, n_stations)),
        "site_name": [None if i % 5 == 0 else f"site{i}" for i in st_ids],
        "start_time": [T0 - pd.Timedelta(days=3650)] * n_stations,
        "end_time": [None if i % 5 else T0 + pd.Timedelta(days=30) for i in st_ids],
        "inventory_xml": inv,
    })

    chan_rows = []
    cid = 1
    for sid in st_ids:
        for loc, cha in (("", "HHZ"), ("", "HHN"), ("00", "BHZ"), ("10", "HNE"))[: 3 + sid % 2]:
            chan_rows.append((cid, sid, loc, cha))
            cid += 1
    n_channels = len(chan_rows)
    channels = pd.DataFrame({
        "id": np.int64([r[0] for r in chan_rows]),
        "station_id": np.int64([r[1] for r in chan_rows]),
        "location": [r[2] for r in chan_rows],
        "channel": [r[3] for r in chan_rows],
        "depth": rng.uniform(0, 100, n_channels),
        "azimuth": rng.uniform(0, 360, n_channels),
        "dip": rng.uniform(-90, 90, n_channels),
        "sensor_description": [None] * n_channels,
        "scale": rng.uniform(1e8, 1e9, n_channels),
        "scale_freq": rng.uniform(0.1, 10, n_channels),
        "scale_units": ["m/s"] * n_channels,
        "sample_rate": rng.choice([20.0, 50.0, 100.0, 120.0], n_channels),
    })

    seg_ids = np.arange(1, n_segments + 1, dtype=np.int64)
    # unique (channel_id, event_id) natural key
    pairs = rng.choice(n_channels * n_events, size=n_segments, replace=False)
    chan_of = (pairs % n_channels + 1).astype(np.int64)
    ev_of = (pairs // n_channels + 1).astype(np.int64)
    arrival = [T0 + pd.Timedelta(minutes=int(m)) for m in rng.integers(0, 500000, n_segments)]
    req_start = [a - pd.Timedelta(minutes=2) for a in arrival]
    req_end = [a + pd.Timedelta(minutes=5) for a in arrival]
    datamix = rng.random(n_segments)
    data = [None if x < 0.1 else (b"" if x < 0.2 else b"\x01\x02mseed") for x in datamix]
    codes = rng.choice([200, 204, 404, 500, -1, -2, -200, -204], n_segments)
    codes = pd.array(
        [None if rng2 < 0.05 else int(c)
         for c, rng2 in zip(codes, rng.random(n_segments))],
        dtype="Int64")
    start_time, end_time = [], []
    for i, (a, has) in enumerate(zip(arrival, datamix)):
        if has < 0.1:
            start_time.append(None)
            end_time.append(None)
        else:
            st = a - pd.Timedelta(seconds=int(rng.integers(0, 180)))
            # some rows get MORE data than requested -> negative missing_data
            et = st + pd.Timedelta(seconds=int(rng.integers(10, 600)))
            start_time.append(st)
            end_time.append(et)
    segments = pd.DataFrame({
        "id": seg_ids,
        "event_id": ev_of,
        "channel_id": chan_of,
        "datacenter_id": (chan_of % 3 + 1).astype(np.int64),
        "download_id": (seg_ids % 3 + 1).astype(np.int64),
        "data_seed_id": [None if x < 0.3 else f"GE.ST{c % 20:02d}..HHZ"
                         for x, c in zip(rng.random(n_segments), chan_of)],
        "event_distance_deg": rng.uniform(0, 20, n_segments),
        "data": data,
        "download_code": codes,
        "start_time": start_time,
        "arrival_time": arrival,
        "end_time": end_time,
        "sample_rate": rng.choice([20.0, 50.0, 100.0], n_segments),
        "maxgap_numsamples": rng.normal(0, 0.6, n_segments),
        "request_start": req_start,
        "request_end": req_end,
        "queryauth": rng.random(n_segments) < 0.05,
    })

    classes = pd.DataFrame({
        "id": np.int64([1, 2, 3, 4, 5]),
        "label": ["Ok", "LowS2N", "Aftershock", "MultiEvent", "Unknown"],
        "description": [f"desc{i}" for i in range(5)],
    })

    lab_seg = rng.choice(seg_ids, size=80, replace=True)
    lab_cls = rng.integers(1, 6, size=80)
    lab = pd.DataFrame({"segment_id": lab_seg, "class_id": lab_cls}) \
        .drop_duplicates().reset_index(drop=True)
    class_labellings = pd.DataFrame({
        "id": np.arange(1, len(lab) + 1, dtype=np.int64),
        "segment_id": lab["segment_id"].astype(np.int64),
        "class_id": lab["class_id"].astype(np.int64),
        "is_hand_labelled": [True] * len(lab),
        "annotator": [None if i % 3 == 0 else f"ann{i % 2}" for i in range(len(lab))],
    })

    return {
        "downloads": downloads, "web_services": web_services,
        "data_centers": data_centers, "events": events, "stations": stations,
        "channels": channels, "segments": segments, "classes": classes,
        "class_labellings": class_labellings,
    }
