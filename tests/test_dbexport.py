"""export-db: parquet warehouse -> reference-layout SQLite
(sinks/dbexport.py). The strongest check is the full circle: reference
DB -> import-db -> warehouse -> export-db -> sqlite -> import-db again
must reproduce the first warehouse bit-for-bit."""

import sqlite3

import pytest

from stream2segment_spark.sinks.dbexport import export_sqlite
from stream2segment_spark.sources.dbimport import import_sqlite

from tests.test_dbimport import ref_db  # noqa: F401  (fixture reuse)


def test_roundtrip_import_export_import(ref_db, tmp_path):  # noqa: F811
    wh1 = tmp_path / "wh1"
    counts1 = import_sqlite(str(ref_db), str(wh1))
    out_db = tmp_path / "exported.sqlite"
    counts = export_sqlite(str(wh1), str(out_db))
    assert counts["segments"] == 2 and counts["events"] == 1
    # second import of the exported DB reproduces the warehouse exactly
    wh2 = tmp_path / "wh2"
    counts2 = import_sqlite(str(out_db), str(wh2))
    assert counts2 == counts1
    import duckdb
    for wh_table in ("segments", "events", "stations", "channels",
                     "class_labels", "class_labellings", "downloads"):
        a = duckdb.sql(f"SELECT * FROM read_parquet('{wh1}/{wh_table}"
                       ".parquet') ORDER BY id").fetchall()
        b = duckdb.sql(f"SELECT * FROM read_parquet('{wh2}/{wh_table}"
                       ".parquet') ORDER BY id").fetchall()
        assert a == b, wh_table


def test_export_ddl_and_values(ref_db, tmp_path):  # noqa: F811
    wh = tmp_path / "wh"
    import_sqlite(str(ref_db), str(wh))
    out_db = tmp_path / "e.sqlite"
    export_sqlite(str(wh), str(out_db))
    con = sqlite3.connect(out_db)
    try:
        # reference table names, including classes (not class_labels)
        names = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        assert {"downloads", "events", "stations", "channels", "segments",
                "classes", "class_labellings"} <= names
        # unique constraint present and enforced (segments natural key)
        with pytest.raises(sqlite3.IntegrityError):
            con.execute("INSERT INTO segments (id, event_id, channel_id) "
                        "VALUES (99, 1, 1)")
        # timestamps stored in SQLAlchemy's sqlite format
        t = con.execute("SELECT end_time, arrival_time FROM segments "
                        "WHERE id = 1").fetchone()
        assert t == ("2021-06-01 12:00:30.400000",
                     "2021-06-01 12:00:00.000000")
        # waveform blob survives byte-for-byte
        blob = con.execute("SELECT data FROM segments WHERE id = 1"
                           ).fetchone()[0]
        assert isinstance(blob, bytes) and blob[6:7] in (b"D", b"R", b"Q")
        # boolean lands as 0/1
        q = con.execute("SELECT queryauth FROM segments WHERE id = 1"
                        ).fetchone()[0]
        assert q in (0, 1)
    finally:
        con.close()


def test_export_refuses_overwrite(ref_db, tmp_path):  # noqa: F811
    wh = tmp_path / "wh"
    import_sqlite(str(ref_db), str(wh))
    out_db = tmp_path / "e.sqlite"
    out_db.write_bytes(b"precious")
    with pytest.raises(FileExistsError):
        export_sqlite(str(wh), str(out_db))
    assert out_db.read_bytes() == b"precious"


def test_export_db_cli(ref_db, tmp_path, capsys):  # noqa: F811
    import yaml

    from stream2segment_spark.cli import main
    wh = tmp_path / "wh"
    import_sqlite(str(ref_db), str(wh))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(yaml.safe_dump({"warehouse": str(wh)}))
    out_db = tmp_path / "out.sqlite"
    assert main(["export-db", "-c", str(cfg), "-o", str(out_db)]) == 0
    assert "segments: 2" in capsys.readouterr().out


def test_export_failure_leaves_no_file(ref_db, tmp_path):  # noqa: F811
    """A mid-export failure must remove the partial database so a retry
    is possible and nobody mistakes a truncated file for a finished
    export. Forced here by poisoning a natural key the reference DDL's
    unique constraint rejects."""
    import duckdb

    wh = tmp_path / "wh"
    import_sqlite(str(ref_db), str(wh))
    # duplicate the (channel_id, event_id) natural key in the warehouse
    seg = str(wh / "segments.parquet")
    duckdb.sql(f"""COPY (
        SELECT * FROM read_parquet('{seg}')
        UNION ALL
        SELECT * REPLACE (99 AS id) FROM read_parquet('{seg}')
        WHERE id = 1) TO '{seg}' (FORMAT PARQUET)""")
    out_db = tmp_path / "e.sqlite"
    with pytest.raises(sqlite3.IntegrityError):
        export_sqlite(str(wh), str(out_db))
    assert not out_db.exists()
