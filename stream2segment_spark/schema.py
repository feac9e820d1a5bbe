"""Table schemas + relationship graph.

Reference data model: /root/reference/stream2segment/io/db/models.py (9 ORM
tables, FK relationships, unique constraints) re-expressed as Spark
``StructType`` schemas plus an explicit join graph that the
selection-expression compiler (``selectexpr.py``) walks to auto-add joins for
dotted attributes (reference: process/db/sqlevalexpr.py:239-252).

Two graphs are defined:

- ``seismic_graph()`` — the reference's own model (events, stations,
  channels, segments, ...), incl. the 2-hop segment->station edge
  (io/db/models.py:426-440) and the M2M segment->classes edge
  (process/db/models.py:645-648).
- ``testdata_graph()`` — the driver's synthetic TPC-H-ish tables, used by the
  correctness gate; it exercises the same machinery (multi-hop dotted
  attributes like ``order.customer.nation.region``).

Spark has no constraints: natural keys are metadata used by the dedup /
upsert operators (``dropDuplicates`` / merge keys).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Graph model
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Hop:
    """One join step: ``left_keys`` on the current frame equal
    ``right_keys`` on ``table``."""

    table: str
    left_keys: tuple[str, ...]
    right_keys: tuple[str, ...]


@dataclass(frozen=True)
class Relationship:
    """A named edge in the join graph; possibly multi-hop (e.g.
    segment->station goes through channels)."""

    name: str
    path: tuple[Hop, ...]
    # dims are small -> planner broadcasts them by default
    broadcast: bool = True

    @property
    def target(self) -> str:
        return self.path[-1].table


@dataclass
class DerivedColumn:
    """A computed attribute usable anywhere a physical column is
    (the reference's hybrid properties, SURVEY §1.2).

    ``factory(df)`` returns a ``pyspark.sql.Column`` over a frame that
    already contains the physical columns listed in ``requires_rels``'
    targets (the compiler joins them first)."""

    name: str
    factory: Callable[[DataFrame], "object"]
    pytype: type
    requires_rels: tuple[str, ...] = ()
    sql: str | None = None  # ANSI-SQL equivalent (for oracles/docs)


@dataclass
class Table:
    name: str
    schema: T.StructType
    natural_key: tuple[str, ...] = ()
    relationships: dict[str, Relationship] = field(default_factory=dict)
    derived: dict[str, DerivedColumn] = field(default_factory=dict)

    def pytype(self, column: str) -> type:
        if column in self.derived:
            return self.derived[column].pytype
        dt = self.schema[column].dataType
        return spark_type_to_pytype(dt)


@dataclass
class SchemaGraph:
    tables: dict[str, Table]

    def table(self, name: str) -> Table:
        return self.tables[name]


def spark_type_to_pytype(dt: T.DataType) -> type:
    """SQL type -> python literal type, mirroring the reference's
    sqltype->pytype bridge (io/db/pdsql.py:41-64)."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return int
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return float
    if isinstance(dt, T.BooleanType):
        return bool
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return datetime
    if isinstance(dt, T.BinaryType):
        return bytes
    return str


# --------------------------------------------------------------------------
# Seismic model (reference: io/db/models.py)
# --------------------------------------------------------------------------

def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


_LONG, _DBL, _STR = T.LongType(), T.DoubleType(), T.StringType()
_TS, _BOOL, _BIN = T.TimestampType(), T.BooleanType(), T.BinaryType()

DOWNLOADS = T.StructType([
    _f("id", _LONG, False), _f("run_time", _TS), _f("log", _STR),
    _f("warnings", _LONG), _f("errors", _LONG), _f("config", _STR),
    _f("program_version", _STR),
])

WEB_SERVICES = T.StructType([
    _f("id", _LONG, False), _f("name", _STR), _f("type", _STR),
    _f("url", _STR, False),
])

DATA_CENTERS = T.StructType([
    _f("id", _LONG, False), _f("station_url", _STR, False),
    _f("dataselect_url", _STR, False), _f("organization_name", _STR),
])

EVENTS = T.StructType([
    _f("id", _LONG, False), _f("webservice_id", _LONG, False),
    _f("event_id", _STR, False), _f("time", _TS, False),
    _f("latitude", _DBL, False), _f("longitude", _DBL, False),
    _f("depth_km", _DBL, False), _f("author", _STR), _f("catalog", _STR),
    _f("contributor", _STR), _f("contributor_id", _STR),
    _f("mag_type", _STR), _f("magnitude", _DBL, False),
    _f("mag_author", _STR), _f("event_location_name", _STR),
    _f("event_type", _STR),
])

STATIONS = T.StructType([
    _f("id", _LONG, False), _f("datacenter_id", _LONG, False),
    _f("network", _STR, False), _f("station", _STR, False),
    _f("latitude", _DBL, False), _f("longitude", _DBL, False),
    _f("elevation", _DBL), _f("site_name", _STR),
    _f("start_time", _TS, False), _f("end_time", _TS),
    _f("inventory_xml", _BIN),
])

CHANNELS = T.StructType([
    _f("id", _LONG, False), _f("station_id", _LONG, False),
    _f("location", _STR, False), _f("channel", _STR, False),
    _f("depth", _DBL), _f("azimuth", _DBL), _f("dip", _DBL),
    _f("sensor_description", _STR), _f("scale", _DBL),
    _f("scale_freq", _DBL), _f("scale_units", _STR),
    _f("sample_rate", _DBL, False),
])

SEGMENTS = T.StructType([
    _f("id", _LONG, False), _f("event_id", _LONG, False),
    _f("channel_id", _LONG, False), _f("datacenter_id", _LONG, False),
    _f("download_id", _LONG, False), _f("data_seed_id", _STR),
    _f("event_distance_deg", _DBL, False), _f("data", _BIN),
    _f("download_code", _LONG), _f("start_time", _TS),
    _f("arrival_time", _TS, False), _f("end_time", _TS),
    _f("sample_rate", _DBL), _f("maxgap_numsamples", _DBL),
    _f("request_start", _TS, False), _f("request_end", _TS, False),
    _f("queryauth", _BOOL, False),
])

CLASSES = T.StructType([
    _f("id", _LONG, False), _f("label", _STR), _f("description", _STR),
])

CLASS_LABELLINGS = T.StructType([
    _f("id", _LONG, False), _f("segment_id", _LONG, False),
    _f("class_id", _LONG, False), _f("is_hand_labelled", _BOOL),
    _f("annotator", _STR),
])


def seismic_graph() -> SchemaGraph:
    """The reference's 9-table model as a SchemaGraph (derived columns are
    attached by ``columns.register_seismic_derived``)."""
    hop = Hop
    tables = {
        "downloads": Table("downloads", DOWNLOADS, ("id",)),
        "web_services": Table("web_services", WEB_SERVICES, ("url",)),
        "data_centers": Table(
            "data_centers", DATA_CENTERS, ("station_url", "dataselect_url")),
        "events": Table(
            "events", EVENTS, ("webservice_id", "event_id"),
            relationships={
                "webservice": Relationship(
                    "webservice", (hop("web_services", ("webservice_id",), ("id",)),)),
            }),
        "stations": Table(
            "stations", STATIONS, ("network", "station", "start_time"),
            relationships={
                "datacenter": Relationship(
                    "datacenter", (hop("data_centers", ("datacenter_id",), ("id",)),)),
            }),
        "channels": Table(
            "channels", CHANNELS, ("station_id", "location", "channel"),
            relationships={
                "station": Relationship(
                    "station", (hop("stations", ("station_id",), ("id",)),)),
            }),
        "segments": Table(
            "segments", SEGMENTS, ("channel_id", "event_id"),
            relationships={
                "event": Relationship(
                    "event", (hop("events", ("event_id",), ("id",)),)),
                "channel": Relationship(
                    "channel", (hop("channels", ("channel_id",), ("id",)),)),
                "datacenter": Relationship(
                    "datacenter", (hop("data_centers", ("datacenter_id",), ("id",)),)),
                "download": Relationship(
                    "download", (hop("downloads", ("download_id",), ("id",)),)),
                # 2-hop: segment -> channels -> stations
                # (reference: secondary relationship, io/db/models.py:426-440)
                "station": Relationship(
                    "station",
                    (hop("channels", ("channel_id",), ("id",)),
                     hop("stations", ("station_id",), ("id",)))),
                # M2M via class_labellings (process/db/models.py:645-648)
                "classes": Relationship(
                    "classes",
                    (hop("class_labellings", ("id",), ("segment_id",)),
                     hop("classes", ("class_id",), ("id",)))),
            }),
        "classes": Table("classes", CLASSES, ("label",)),
        "class_labellings": Table(
            "class_labellings", CLASS_LABELLINGS, ("segment_id", "class_id")),
    }
    return SchemaGraph(tables)


# --------------------------------------------------------------------------
# Driver testdata model (TPC-H-ish star schema + events/documents/embeddings)
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def testdata_graph() -> SchemaGraph:
    hop = Hop
    empty = T.StructType([])  # schemas come from parquet; graph only needs edges
    tables = {name: Table(name, empty) for name in TESTDATA_TABLES}
    tables["nation"].relationships = {
        "region": Relationship("region", (hop("region", ("n_regionkey",), ("r_regionkey",)),)),
    }
    tables["customer"].relationships = {
        "nation": Relationship("nation", (hop("nation", ("c_nationkey",), ("n_nationkey",)),)),
        "region": Relationship(
            "region",
            (hop("nation", ("c_nationkey",), ("n_nationkey",)),
             hop("region", ("n_regionkey",), ("r_regionkey",)))),
    }
    tables["supplier"].relationships = {
        "nation": Relationship("nation", (hop("nation", ("s_nationkey",), ("n_nationkey",)),)),
    }
    tables["orders"].relationships = {
        "customer": Relationship("customer", (hop("customer", ("o_custkey",), ("c_custkey",)),)),
        "nation": Relationship(
            "nation",
            (hop("customer", ("o_custkey",), ("c_custkey",)),
             hop("nation", ("c_nationkey",), ("n_nationkey",)))),
    }
    tables["lineitem"].relationships = {
        "order": Relationship("order", (hop("orders", ("l_orderkey",), ("o_orderkey",)),)),
        "part": Relationship("part", (hop("part", ("l_partkey",), ("p_partkey",)),)),
        "supplier": Relationship("supplier", (hop("supplier", ("l_suppkey",), ("s_suppkey",)),)),
        # 2-hop exercising the compiler's multi-hop path (like segment->station)
        "customer": Relationship(
            "customer",
            (hop("orders", ("l_orderkey",), ("o_orderkey",)),
             hop("customer", ("o_custkey",), ("c_custkey",)))),
    }
    return SchemaGraph(tables)


# --------------------------------------------------------------------------
# Readers
# --------------------------------------------------------------------------

# Event-time columns whose parquet physical type has varied across driver
# testdata generations: TIMESTAMP(NANOS) (read as Long under
# spark.sql.legacy.parquet.nanosAsLong, truncated to micros like DuckDB's
# TIMESTAMP_NS -> TIMESTAMP cast) or TIMESTAMP(MICROS, isAdjustedToUTC=false)
# (read as TIMESTAMP_NTZ). Either way the engine contract is a plain
# TimestampType column — session timezone is UTC, so the NTZ->TZ cast is a
# pure relabel, no value shift.
_NANOS_TS_COLS = {"events": ("ts",)}


def normalize_event_ts(df: DataFrame, cols=("ts",)) -> DataFrame:
    """Normalize event-time columns to ``TimestampType`` from any physical
    reading: int64 nanos -> truncate to micros (integer ``div`` keeps full
    int64 precision; a double round-trips ~1.7e18 ns epochs lossily),
    timestamp_ntz -> cast (UTC session tz: same instant)."""
    from pyspark.sql import functions as F  # local: keep module import-light

    for c in cols:
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


# Input-parallelization policy (r9 optimization round, measured by
# interleaved same-session A/B at sf0.1 — see OPTIMIZATION_r09.md):
#
# - _PARALLEL_KEYS: the unique id to hash-partition on when a table IS
#   parallelized — ids spread evenly, the exchange skips round-robin's
#   sort-before-repartition pass, and downstream id-keyed joins/
#   groupBys can REUSE the partitioning instead of re-shuffling
#   (guide §2.4).
# - _PARALLEL_TABLES: tables parallelized BY DEFAULT. Only `documents`:
#   its consumers are per-row text-heavy (tokenizers, regex signal
#   extraction) and win multiples; `embeddings` is small enough
#   (fixed-width vectors) that only the per-row numpy kernel entries
#   win — those opt in with parallel=True — while iterative consumers
#   (k-means, classifier folds, IVF) LOSE to per-iteration 32-task
#   scheduling overhead. Iterative documents consumers (BPE rounds,
#   Bloom folds, PageRank) and blob-synthesis entries opt out with
#   parallel=False at their call sites for the same reason.
# - Dimension/fact tables stay as scanned: their consumers are shuffle-
#   or scheduling-bound and an input exchange would be pure overhead.
_PARALLEL_KEYS: dict[str, str] = {"documents": "doc_id",
                                  "embeddings": "vec_id"}
_PARALLEL_TABLES = frozenset({"documents"})

# Parquet scans split at spark.sql.files.maxPartitionBytes but tasks
# align to ROW GROUPS, so a single file below this size is always one
# task no matter the split config (the default 128 MB matches both the
# session factory and vanilla sessions here).
_MAX_PARTITION_BYTES = 128 << 20


def load_table(spark: SparkSession, sf_dir: str, name: str,
               parallel: "bool | None" = None) -> DataFrame:
    """Read one driver parquet table. Plain ``spark.read.parquet`` so
    Catalyst gets pushdown/pruning on the scan; nanosecond timestamp columns
    are normalized to microsecond timestamps.

    Must work on ANY SparkSession (not only ``session.get_spark``'s tuned
    one): TIMESTAMP(NANOS) parquet columns make a vanilla session throw
    ``PARQUET_TYPE_ILLEGAL``, so the legacy nanos-as-long conf is set here
    at runtime (it is a runtime-settable SQL conf, idempotent, harmless for
    micros-typed files).

    ``parallel`` (r9 optimization round, guide §2.5 "input skew:
    repartition immediately after the read"): ``None`` applies the
    per-table default (:data:`_PARALLEL_TABLES` — the corpus tables,
    whose every consumer tokenizes or runs vector kernels per row);
    ``True``/``False`` force it. When active AND the table is a single
    file too small to ever produce a second scan task, the frame is
    repartitioned to the session's default parallelism — hashed on the
    table's unique id (:data:`_PARALLEL_TABLES`) so the spread is even,
    deterministic under retries, and reusable by downstream id-keyed
    operators. Guarded by the actual file layout: a production-scale
    input (directory of files, or any file large enough to split) is
    NEVER re-shuffled — the scan already parallelizes it, and the
    guard keys on layout, not on a tuned constant. Results are
    partitioning-invariant by contract (the driver re-runs every query
    at a different core count)."""
    if name in _NANOS_TS_COLS:
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # static-conf Spark builds: fall through and hope the
            # session was created with the conf; the read error is clearer
            # than anything we could raise here.
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name in _NANOS_TS_COLS:
        df = normalize_event_ts(df, _NANOS_TS_COLS[name])
    if parallel is None:
        parallel = name in _PARALLEL_TABLES
    if parallel:
        par = spark.sparkContext.defaultParallelism
        try:
            one_task = (os.path.isfile(path)
                        and os.path.getsize(path) < _MAX_PARTITION_BYTES)
        except OSError:
            one_task = False
        if one_task and par > 1:
            from pyspark.sql import functions as F  # keep module import-light
            key = _PARALLEL_KEYS.get(name)
            df = (df.repartition(par, F.col(key))
                  if key in df.columns else df.repartition(par))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def infer_graph_schemas(graph: SchemaGraph, dfs: dict[str, DataFrame]) -> SchemaGraph:
    """Fill a graph's (possibly empty) schemas from live DataFrames so the
    expression compiler can type literals."""
    for name, df in dfs.items():
        if name in graph.tables:
            graph.tables[name].schema = df.schema
    return graph
