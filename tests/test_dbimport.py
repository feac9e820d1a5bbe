"""import-db: migrate a reference-layout SQLite database (the
reference's storage schema, io/db/models.py:149-478, as SQLAlchemy lays
it out in SQLite: ISO-string datetimes, 0/1 booleans, BLOB waveforms)
into the parquet warehouse, then run the engine's own commands on it."""

from __future__ import annotations

import sqlite3
from datetime import datetime, timezone

import numpy as np
import pytest

from stream2segment_spark import cli
from stream2segment_spark.sources.dbimport import import_sqlite

T0 = "2021-06-01 12:00:00.000000"


def _mseed_blob():
    from stream2segment_spark.sources.mseed import encode_record
    t0 = datetime(2021, 6, 1, 12, 0, 30, tzinfo=timezone.utc)
    return encode_record("GE", "STA1", "", "HHZ", t0, 100.0,
                         np.cumsum(np.arange(40, dtype=np.int64) % 7),
                         encoding=11)


@pytest.fixture()
def ref_db(tmp_path):
    """A populated DB in the exact DDL shape SQLAlchemy creates for the
    reference models (subset of columns is enough: the importer fills
    engine-known-but-absent columns with NULL)."""
    path = tmp_path / "s2s.sqlite"
    con = sqlite3.connect(path)
    con.executescript("""
      CREATE TABLE downloads (id INTEGER PRIMARY KEY, run_time DATETIME,
        log TEXT, warnings INTEGER, errors INTEGER, config TEXT,
        program_version TEXT);
      CREATE TABLE web_services (id INTEGER PRIMARY KEY, name TEXT,
        type TEXT, url TEXT NOT NULL);
      CREATE TABLE data_centers (id INTEGER PRIMARY KEY,
        station_url TEXT NOT NULL, dataselect_url TEXT NOT NULL,
        organization_name TEXT);
      CREATE TABLE events (id INTEGER PRIMARY KEY,
        webservice_id INTEGER NOT NULL, event_id TEXT NOT NULL,
        time DATETIME NOT NULL, latitude FLOAT NOT NULL,
        longitude FLOAT NOT NULL, depth_km FLOAT NOT NULL,
        author TEXT, catalog TEXT, contributor TEXT, contributor_id TEXT,
        mag_type TEXT, magnitude FLOAT NOT NULL, mag_author TEXT,
        event_location_name TEXT, event_type TEXT);
      CREATE TABLE stations (id INTEGER PRIMARY KEY,
        datacenter_id INTEGER NOT NULL, network TEXT NOT NULL,
        station TEXT NOT NULL, latitude FLOAT NOT NULL,
        longitude FLOAT NOT NULL, elevation FLOAT, site_name TEXT,
        start_time DATETIME NOT NULL, end_time DATETIME,
        inventory_xml BLOB);
      CREATE TABLE channels (id INTEGER PRIMARY KEY,
        station_id INTEGER NOT NULL, location TEXT NOT NULL,
        channel TEXT NOT NULL, depth FLOAT, azimuth FLOAT, dip FLOAT,
        sensor_description TEXT, scale FLOAT, scale_freq FLOAT,
        scale_units TEXT, sample_rate FLOAT NOT NULL);
      CREATE TABLE segments (id INTEGER PRIMARY KEY,
        event_id INTEGER NOT NULL, channel_id INTEGER NOT NULL,
        datacenter_id INTEGER NOT NULL, download_id INTEGER NOT NULL,
        data_seed_id TEXT, event_distance_deg FLOAT NOT NULL, data BLOB,
        download_code INTEGER, start_time DATETIME,
        arrival_time DATETIME NOT NULL, end_time DATETIME,
        sample_rate FLOAT, maxgap_numsamples FLOAT,
        request_start DATETIME NOT NULL, request_end DATETIME NOT NULL,
        queryauth BOOLEAN NOT NULL);
      CREATE TABLE classes (id INTEGER PRIMARY KEY, label TEXT,
        description TEXT);
      CREATE TABLE class_labellings (id INTEGER PRIMARY KEY,
        segment_id INTEGER NOT NULL, class_id INTEGER NOT NULL,
        is_hand_labelled BOOLEAN, annotator TEXT);
    """)
    con.execute("INSERT INTO downloads VALUES (1, ?, 'log', 0, 0, "
                "'cfg: 1', '3.0')", [T0])
    con.execute("INSERT INTO web_services VALUES (1, 'isc', 'event', "
                "'http://ws.example.org/query')")
    con.execute("INSERT INTO data_centers VALUES (1, 'http://dc/sta', "
                "'http://dc/data', 'EIDA')")
    con.execute("INSERT INTO events VALUES (1, 1, 'evA', ?, 10.0, 20.0, "
                "15.0, 'a', 'c', NULL, NULL, 'ML', 5.0, NULL, 'loc', "
                "NULL)", [T0])
    con.execute("INSERT INTO stations VALUES (1, 1, 'GE', 'STA1', 10.5, "
                "20.5, 0.0, NULL, '2000-01-01 00:00:00.000000', NULL, "
                "X'3c78616d6c2f3e')")
    con.execute("INSERT INTO channels VALUES (1, 1, '', 'HHZ', 0.0, 0.0, "
                "0.0, 'sensor', 1.0, 1.0, 'M/S', 100.0)")
    con.execute("INSERT INTO channels VALUES (2, 1, '', 'HHN', 0.0, 0.0, "
                "0.0, 'sensor', 1.0, 1.0, 'M/S', 100.0)")
    blob = _mseed_blob()
    # one segment per channel: the reference enforces a unique
    # (channel_id, event_id) natural key (io/db/models.py:442-444)
    for i, code in ((1, 200), (2, 204)):
        con.execute(
            "INSERT INTO segments VALUES (?, 1, ?, 1, 1, 'GE.STA1..HHZ', "
            "0.7, ?, ?, ?, ?, ?, 100.0, 0.0, ?, ?, 0)",
            [i, i, blob if code == 200 else None, code,
             "2021-06-01 12:00:30.000000" if code == 200 else None, T0,
             "2021-06-01 12:00:30.400000" if code == 200 else None,
             "2021-06-01 11:59:00.000000", "2021-06-01 12:02:00.000000"])
    con.execute("INSERT INTO classes VALUES (1, 'Ok', 'good seg')")
    con.execute("INSERT INTO class_labellings VALUES (1, 1, 1, 1, 'me')")
    con.commit()
    con.close()
    return path


def test_import_sqlite_types_and_counts(ref_db, tmp_path, spark):
    wh = tmp_path / "wh"
    counts = import_sqlite(str(ref_db), str(wh))
    assert counts == {
        "downloads": 1, "web_services": 1, "data_centers": 1, "events": 1,
        "stations": 1, "channels": 2, "segments": 2, "class_labels": 1,
        "class_labellings": 1}
    seg = spark.read.parquet(str(wh / "segments.parquet"))
    types = dict(seg.dtypes)
    assert types["arrival_time"] == "timestamp"
    assert types["data"] == "binary"
    assert types["queryauth"] == "boolean"
    rows = {r["id"]: r for r in seg.collect()}
    assert bytes(rows[1]["data"]) == _mseed_blob()
    assert rows[2]["data"] is None and rows[2]["start_time"] is None
    assert rows[1]["arrival_time"].replace(tzinfo=timezone.utc) \
        == datetime(2021, 6, 1, 12, 0, 0, tzinfo=timezone.utc)
    ev = spark.read.parquet(str(wh / "events.parquet")).collect()[0]
    assert ev["magnitude"] == 5.0 and ev["contributor"] is None
    # the bookkeeping reader sees the imported labels under OUR name
    from stream2segment_spark import warehouse as whmod
    labels = whmod.read_small(str(wh), "class_labels").to_pylist()
    assert labels == [{"id": 1, "label": "Ok", "description": "good seg"}]


def test_import_db_cli_then_process_and_dlstats(ref_db, tmp_path, capsys):
    import yaml
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(yaml.safe_dump({
        "warehouse": str(tmp_path / "wh"),
        # the reference's default processing selection — exercises the
        # derived attribute AND the normalized-layout join graph
        "segments_selection": {"has_valid_data": "true"}}))
    assert cli.main(["import-db", "-c", str(cfg),
                     "-d", f"sqlite:///{ref_db}"]) == 0
    out = capsys.readouterr().out
    assert "segments: 2 row(s)" in out
    # dl-stats over the imported warehouse
    assert cli.main(["dl-stats", "-c", str(cfg)]) == 0
    out = capsys.readouterr().out
    assert "OK" in out and "TOTAL" in out
    # process: the pyfunc engine decodes the imported waveform blobs
    assert cli.main(["process", "-c", str(cfg),
                     "-p", "tests.test_cli:seg_peak"]) == 0
    out = capsys.readouterr().out
    assert "'peak':" in out and "'code': 200" in out


def test_import_sqlite_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        import_sqlite(str(tmp_path / "nope.sqlite"), str(tmp_path / "wh"))
