"""One-shot importer from an existing stream2segment database (the
reference's storage layer: SQLite or Postgres, io/db/models.py:149-478)
into the parquet warehouse this engine reads — the migration path for
reference users with populated warehouses.

Two transports:

- **SQLite** (the reference's default dburl): streamed with the stdlib
  ``sqlite3`` driver in bounded rowid-ordered chunks straight into a
  parquet writer — blob-heavy ``segments`` tables never materialize in
  memory, and no Spark job is needed (an sqlite file is single-machine
  by definition; parallelizing reads of one B-tree buys nothing).
- **JDBC** (``postgresql://...`` and friends): ``spark.read.jdbc``
  partitioned on ``id`` so a large server-side table lands as parallel
  executor reads. Requires the matching JDBC driver jar on the Spark
  classpath (not bundled here); the error message says so.

Table-name mapping: the reference's ``classes`` table is this engine's
``class_labels`` bookkeeping table; everything else maps 1:1 (downloads,
web_services, data_centers, events, stations, channels, segments,
class_labellings). Missing tables are skipped (a download-only DB has no
labellings); extra DB columns are ignored; columns the engine knows but
the DB lacks come out NULL.
"""

from __future__ import annotations

import os
import sqlite3

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from stream2segment_spark import schema as S

# reference table name (io/db/models.py Base.__tablename__) -> warehouse
# file name + Spark schema (schema.py mirrors the reference models 1:1)
TABLES: dict[str, tuple[str, T.StructType]] = {
    "downloads": ("downloads", S.DOWNLOADS),
    "web_services": ("web_services", S.WEB_SERVICES),
    "data_centers": ("data_centers", S.DATA_CENTERS),
    "events": ("events", S.EVENTS),
    "stations": ("stations", S.STATIONS),
    "channels": ("channels", S.CHANNELS),
    "segments": ("segments", S.SEGMENTS),
    "classes": ("class_labels", S.CLASSES),
    "class_labellings": ("class_labellings", S.CLASS_LABELLINGS),
}

_ARROW = {
    T.LongType(): pa.int64(),
    T.DoubleType(): pa.float64(),
    T.StringType(): pa.string(),
    # tz-aware: tz-naive parquet timestamps surface as TIMESTAMP_NTZ in
    # Spark, which the engine's plain-timestamp schemas don't want
    T.TimestampType(): pa.timestamp("us", tz="UTC"),
    T.BooleanType(): pa.bool_(),
    T.BinaryType(): pa.binary(),
}


def arrow_schema(spark_schema: T.StructType) -> pa.Schema:
    return pa.schema([(f.name, _ARROW[f.dataType])
                      for f in spark_schema.fields])


def _chunk_to_arrow(rows, cols: list[str], schema: pa.Schema) -> pa.Table:
    """Coerce one driver chunk to the target arrow schema. SQLite has no
    DATETIME/BOOLEAN storage classes: SQLAlchemy lands timestamps as ISO
    strings and booleans as 0/1 — parse both explicitly."""
    df = pd.DataFrame.from_records(rows, columns=cols)
    arrays = []
    for field in schema:
        if field.name not in df.columns:
            arrays.append(pa.nulls(len(df), field.type))
            continue
        s = df[field.name]
        if pa.types.is_timestamp(field.type):
            s = pd.to_datetime(s, format="mixed", errors="coerce")
            if s.dt.tz is None:  # SQLAlchemy stores naive UTC datetimes
                s = s.dt.tz_localize("UTC")
        elif pa.types.is_boolean(field.type):
            s = s.map(lambda v: None if v is None else bool(v))
        arrays.append(pa.Array.from_pandas(s, type=field.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def import_sqlite(db_path: str, warehouse: str,
                  chunk_rows: int = 20_000) -> dict[str, int]:
    """Stream every known table of a stream2segment SQLite DB into
    ``{warehouse}/{table}.parquet``. Returns {warehouse_table: n_rows}.

    Chunks are paged ``WHERE rowid > last ORDER BY rowid`` (not OFFSET,
    which rescans) so memory stays bounded by ``chunk_rows`` segments
    including their waveform blobs.
    """
    if not os.path.isfile(db_path):
        raise FileNotFoundError(f"no such sqlite database: {db_path}")
    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        have = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        os.makedirs(warehouse, exist_ok=True)
        counts: dict[str, int] = {}
        for src, (dst, sp_schema) in TABLES.items():
            if src not in have:
                continue
            db_cols = [r[1] for r in con.execute(f"PRAGMA table_info({src})")]
            want = [f.name for f in sp_schema.fields if f.name in db_cols]
            schema = arrow_schema(sp_schema)
            out = os.path.join(warehouse, f"{dst}.parquet")
            tmp = out + ".importing"
            n = 0
            with pq.ParquetWriter(tmp, schema, compression="zstd") as wr:
                last = None
                sel = ", ".join(want)
                while True:
                    cur = con.execute(
                        f"SELECT rowid, {sel} FROM {src}"
                        + (" WHERE rowid > ?" if last is not None else "")
                        + " ORDER BY rowid LIMIT ?",
                        ([last, chunk_rows] if last is not None
                         else [chunk_rows]))
                    rows = cur.fetchall()
                    if not rows:
                        break
                    last = rows[-1][0]
                    wr.write_table(_chunk_to_arrow(
                        [r[1:] for r in rows], want, schema))
                    n += len(rows)
            os.replace(tmp, out)
            counts[dst] = n
        return counts
    finally:
        con.close()


def import_jdbc(spark, url: str, warehouse: str,
                num_partitions: int = 16, properties: dict | None = None,
                ) -> dict[str, int]:
    """Import from a server database (e.g. the reference's Postgres dburl)
    via partitioned JDBC reads: each table splits on ``id`` into
    ``num_partitions`` parallel range scans, so large segment tables are
    pulled by the whole cluster, not the driver."""
    counts: dict[str, int] = {}
    props = {"fetchsize": "10000", **(properties or {})}
    for src, (dst, sp_schema) in TABLES.items():
        try:
            bounds = spark.read.jdbc(
                url, f"(SELECT min(id) lo, max(id) hi FROM {src}) b",
                properties=props).collect()[0]
        except Exception as exc:
            msg = str(exc)
            if "No suitable driver" in msg:
                raise RuntimeError(
                    f"no JDBC driver for {url!r}: add the driver jar via "
                    "spark.jars (e.g. the PostgreSQL JDBC jar)") from exc
            # ONLY a genuinely absent table is skippable; auth/network/
            # SQL failures must not be silently read as "empty database"
            # (a failed import would otherwise return {} as success)
            missing = ("does not exist", "no such table", "not found",
                       "doesn't exist", "unknown relation")
            if any(m in msg.lower() for m in missing):
                continue
            raise RuntimeError(
                f"JDBC probe of table {src!r} failed (not a "
                f"missing-table error): {msg.splitlines()[0]}") from exc
        if bounds["lo"] is None:
            df = spark.read.jdbc(url, src, properties=props)
        else:
            df = spark.read.jdbc(
                url, src, column="id", lowerBound=int(bounds["lo"]),
                upperBound=int(bounds["hi"]) + 1,
                numPartitions=num_partitions, properties=props)
        keep = [f.name for f in sp_schema.fields if f.name in df.columns]
        out = df.select(*[
            df[c].cast(sp_schema[c].dataType) for c in keep])
        out.write.mode("overwrite").parquet(
            os.path.join(warehouse, f"{dst}.parquet"))
        counts[dst] = spark.read.parquet(
            os.path.join(warehouse, f"{dst}.parquet")).count()
    return counts


def import_db(spark, db: str, warehouse: str, **kwargs) -> dict[str, int]:
    """Dispatch on the dburl form the reference accepts
    (``sqlite:///path`` / bare file path -> sqlite; anything else ->
    JDBC, with the reference's ``postgresql://`` rewritten to the
    ``jdbc:postgresql://`` form Spark wants)."""
    if db.startswith("sqlite:///"):
        return import_sqlite(db[len("sqlite:///"):], warehouse, **kwargs)
    if "://" not in db:
        return import_sqlite(db, warehouse, **kwargs)
    # JDBC URLs carry no userinfo (pgjdbc parses 'user:pw@host' as the
    # host): split credentials out of the reference-style dburl into
    # connection properties
    from urllib.parse import urlsplit, urlunsplit
    raw = db[len("jdbc:"):] if db.startswith("jdbc:") else db
    parts = urlsplit(raw)
    props = dict(kwargs.pop("properties", None) or {})
    if parts.username:
        props.setdefault("user", parts.username)
    if parts.password:
        props.setdefault("password", parts.password)
    if parts.username or parts.password:
        host = parts.hostname or ""
        if parts.port:
            host += f":{parts.port}"
        raw = urlunsplit((parts.scheme, host, parts.path,
                          parts.query, parts.fragment))
    return import_jdbc(spark, "jdbc:" + raw, warehouse,
                       properties=props or None, **kwargs)
