"""Catalog entries for upsert/key-sync (SURVEY §2.1 K4/K5, §4 H15) and the
FDSN text source (§2.1 S1), demonstrated over the driver's testdata tables.

The reference mutates rows in an RDBMS (io/db/pdsql.py:351-620 DbManager,
:214-348 syncdf); here the same semantics run on immutable columnar storage
via union + window dedup / join + deterministic id assignment, and the FDSN
'|'-text parser runs as pure Spark expressions over a lines DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stream2segment_spark.operators.upsert import (
    merge_latest_wins, sync_surrogate_ids, update_skip_unchanged)
from stream2segment_spark.queries_catalog import register
from stream2segment_spark.schema import load_table
from stream2segment_spark.sources.fdsn import parse_fdsn_lines, to_fdsn_lines

ORDER_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
              "o_orderdate", "o_orderpriority"]


@register(
    "upsert_latest_wins",
    # driver-green r2+r3; deferred for the round-4 sketch_hll_distinct
    oracle="""SELECT o_orderkey, o_custkey, o_orderstatus,
              CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0
                   ELSE o_totalprice END AS o_totalprice,
              o_orderdate, o_orderpriority
       FROM orders""",
    gate=False,
)
def upsert_latest_wins(spark, sf_dir):
    """K4: MERGE INTO on immutable parquet (reference DbManager buffered
    INSERT/UPDATE, io/db/pdsql.py:351-620) as union + row_number dedup on
    the natural key; the incoming batch re-prices every 10th order.
    The price delta is an exact double add so both engines produce
    bit-identical values (no cross-engine rounding at the compare)."""
    orders = load_table(spark, sf_dir, "orders")
    incoming = (orders.filter(F.col("o_orderkey") % 10 == 0)
                .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0))
    merged = merge_latest_wins(orders, incoming, ["o_orderkey"])
    return merged.select(*ORDER_COLS)


@register(
    "upsert_sync_ids",
    """WITH incoming AS (
         SELECT c_name FROM customer WHERE c_custkey % 2 = 0
         UNION ALL
         SELECT concat('NEW#', n_name) AS c_name FROM nation
       ),
       matched AS (
         SELECT i.c_name, e.c_custkey AS existing_id
         FROM incoming i LEFT JOIN customer e ON i.c_name = e.c_name
       )
       SELECT c_name,
              CASE WHEN existing_id IS NOT NULL THEN existing_id
                   ELSE (SELECT max(c_custkey) FROM customer)
                        + row_number() OVER (PARTITION BY existing_id IS NULL
                                             ORDER BY c_name)
              END AS id
       FROM matched""", gate=False,
)
def upsert_sync_ids(spark, sf_dir):
    """K5: fetch-or-create surrogate keys (reference syncdf,
    io/db/pdsql.py:214-348): matched rows keep the stored id, fresh rows get
    max(id)+1.. deterministically by natural-key order (H6 distributed-safe)."""
    cust = load_table(spark, sf_dir, "customer")
    existing = cust.select(F.col("c_name"), F.col("c_custkey").alias("id"))
    nation = load_table(spark, sf_dir, "nation")
    incoming = (cust.filter(F.col("c_custkey") % 2 == 0).select("c_name")
                .unionByName(nation.select(
                    F.concat(F.lit("NEW#"), F.col("n_name")).alias("c_name"))))
    return sync_surrogate_ids(existing, incoming, ["c_name"], id_col="id")


@register(
    # r3 gate rotation: deferred (K4 stays gate-checked via
    # upsert_latest_wins/upsert_sync_ids; skip-unchanged remains
    # unit-tested in test_upsert_fdsn and benched)
    "upsert_skip_unchanged",
    oracle="""SELECT o_orderkey, concat(o_orderstatus, 'X') AS o_orderstatus
       FROM orders WHERE o_orderkey % 7 = 0""",
    gate=False,
)
def upsert_skip_unchanged(spark, sf_dir):
    """H15: skip UPDATE when the compared column is unchanged (reference
    download/modules/segments.py:99-115) — only every 7th order survives
    the pre-filter because only those rows actually changed."""
    orders = load_table(spark, sf_dir, "orders")
    incoming = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0,
               F.concat(F.col("o_orderstatus"), F.lit("X")))
         .otherwise(F.col("o_orderstatus")))
    out = update_skip_unchanged(incoming, orders, ["o_orderkey"],
                                compare_col="o_orderstatus")
    return out.select("o_orderkey", "o_orderstatus")


# FDSN-text layout of the testdata events table (props excluded: JSON may
# contain the '|' separator)
_EVENTS_TEXT_COLS = [
    ("event_id", "long"), ("ts", "timestamp"), ("user_id", "long"),
    ("event_type", "string"), ("value", "double"),
]


@register(
    "fdsn_text_roundtrip",
    # driver-green r2+r3; deferred for the round-4 corpus_version_diff
    oracle="""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
              coalesce(event_type, '') AS event_type,
              round(value, 4) AS value
       FROM events""",
    gate=False,
)
def fdsn_text_roundtrip(spark, sf_dir):
    """S1: FDSN '|'-separated text parse (reference
    download/modules/utils.py:251-383) — serialize the events table to text
    lines, parse back distributed with pure expressions (split + cast +
    na.drop); the oracle is the original table (lossless round-trip)."""
    ev = load_table(spark, sf_dir, "events")
    lines = to_fdsn_lines(ev, _EVENTS_TEXT_COLS)
    parsed = parse_fdsn_lines(lines, _EVENTS_TEXT_COLS,
                              required=["event_id", "ts"])
    return parsed.select("event_id", "ts", "user_id", "event_type",
                         F.round("value", 4).alias("value"))




@register(
    "source_nslc_filters",
    """WITH ch AS (
         SELECT concat('N', p_partkey % 5) AS network,
                concat('S', p_partkey % 211) AS station,
                CASE WHEN p_partkey % 4 = 0 THEN ''
                     ELSE concat('0', p_partkey % 4) END AS location,
                CASE p_partkey % 5 WHEN 0 THEN 'HHZ' WHEN 1 THEN 'HHN'
                     WHEN 2 THEN 'BHZ' WHEN 3 THEN 'HHE'
                     ELSE 'LHZ' END AS channel,
                CAST(100 - (p_partkey % 120) AS DOUBLE) AS sample_rate,
                p_partkey
         FROM part)
       SELECT network, station, location, channel, sample_rate, p_partkey
       FROM ch
       WHERE channel LIKE 'HH%'
         AND NOT regexp_matches(channel, '.*N$')
         AND sample_rate >= 20""", gate=False,
)
def source_nslc_filters(spark, sf_dir):
    """S5 + P7: the channel-selection stage of the download — FDSN
    channel-text parse, positive FDSN wildcard -> LIKE, negative NSLC
    regex, and the sample-rate floor, exactly as ingest_channels applies
    them (pipeline.py; reference download/modules/channels.py:250-301 +
    get_post_data NSLC semantics). Channels synthesized from the part
    table round-trip through '|'-separated text first, so the parse
    itself is in the checked path."""
    from stream2segment_spark.columns import wildcard_to_like
    from stream2segment_spark.sources.fdsn import (
        parse_fdsn_lines, to_fdsn_lines)
    pt = load_table(spark, sf_dir, "part")
    key = F.col("p_partkey")
    cha = (F.when(key % 5 == 0, "HHZ").when(key % 5 == 1, "HHN")
            .when(key % 5 == 2, "BHZ").when(key % 5 == 3, "HHE")
            .otherwise("LHZ"))
    ch = pt.select(
        F.concat(F.lit("N"), (key % 5).cast("string")).alias("network"),
        F.concat(F.lit("S"), (key % 211).cast("string")).alias("station"),
        F.when(key % 4 == 0, "").otherwise(
            F.concat(F.lit("0"), (key % 4).cast("string"))).alias("location"),
        cha.alias("channel"),
        (100 - (key % 120)).cast("double").alias("sample_rate"),
        key.alias("p_partkey"))
    cols = [("network", "string"), ("station", "string"),
            ("location", "string"), ("channel", "string"),
            ("sample_rate", "double"), ("p_partkey", "long")]
    parsed = parse_fdsn_lines(to_fdsn_lines(ch, cols), cols,
                              required=["network", "station", "channel"])
    out = (parsed.filter(F.col("channel").like(wildcard_to_like("HH*")))
                 .filter(~F.col("channel").rlike(".*N$"))
                 .filter(F.col("sample_rate") >= 20))
    return out.select("network", "station", "location", "channel",
                      "sample_rate", "p_partkey")


@register(
    "sink_roundtrip",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    """SELECT fmt, o_orderkey AS segment_db_id, o_orderstatus,
              round(o_totalprice, 2) AS price
       FROM (SELECT 'csv' AS fmt FROM range(1) UNION ALL
             SELECT 'parquet' FROM range(1)) f,
            orders WHERE o_orderkey % 11 = 0""",
    gate=False,
)
def sink_roundtrip(spark, sf_dir):
    """K1/K2: the CSV and parquet (HDF-analogue) sinks round-trip
    through write_output -> already-written-readers with the
    segment_db_id-first contract (reference process/writers.py:14,127-336).
    Registered past the checked window (the 50 slots hold
    higher-information entries) but fully oracled: writes go to a fresh
    temp dir per run, then both formats are read back and value-hashed
    against the source rows."""
    import shutil
    import tempfile

    from stream2segment_spark.sinks.writers import write_output
    o = load_table(spark, sf_dir, "orders")
    src = (o.filter(F.col("o_orderkey") % 11 == 0)
           .select(F.col("o_orderkey").alias("segment_db_id"),
                   "o_orderstatus",
                   F.round("o_totalprice", 2).alias("price")))
    tmp = tempfile.mkdtemp(prefix="s2s-sink-gate-")
    csv_path = os.path.join(tmp, "out.csv")
    pq_path = os.path.join(tmp, "out.parquet")
    write_output(src, csv_path)
    write_output(src, pq_path)
    csv_schema = "segment_db_id long, o_orderstatus string, price double"
    back_csv = (spark.read.option("header", True).schema(csv_schema)
                .csv(csv_path))
    back_pq = spark.read.parquet(pq_path)
    out = (back_csv.select(F.lit("csv").alias("fmt"), "*")
           .unionByName(back_pq.select(F.lit("parquet").alias("fmt"), "*")))
    # materialize before the temp dir disappears; runners call collect()
    # later, so defer cleanup to interpreter exit
    import atexit
    atexit.register(shutil.rmtree, tmp, True)
    return out


_ZB = 12                              # bits per dimension
_ZD = {"l_orderkey": (0, 1_500_000),  # a-priori domains (sf-independent;
       "l_partkey": (0, 200_000)}     # out-of-range clamps to edge cells)

_Z_CELLS_SQL = {
    c: f"((least(greatest(CAST({c} AS BIGINT), {lo}), {hi}) - {lo}) "
       f"* {(1 << _ZB) - 1}) // ({hi} - {lo})"
    for c, (lo, hi) in _ZD.items()}

_Z_KEY_SQL = " + ".join(
    f"(((c{j} >> {i}) & 1) << {i * len(_ZD) + j})"
    for i in range(_ZB) for j in range(len(_ZD)))


@register(
    "layout_zorder",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    f"""WITH cells AS (SELECT l_orderkey, l_partkey, l_linenumber,
                {_Z_CELLS_SQL['l_orderkey']} AS c0,
                {_Z_CELLS_SQL['l_partkey']} AS c1
         FROM lineitem)
       SELECT l_orderkey, l_partkey, l_linenumber,
              CAST(c0 AS BIGINT) AS cell_orderkey,
              CAST(c1 AS BIGINT) AS cell_partkey,
              CAST({_Z_KEY_SQL} AS BIGINT) AS zkey
       FROM cells""",
    gate=False,
)
def layout_zorder(spark, sf_dir):
    """Z-order (Morton) clustering key for multi-column data skipping
    (sinks/layout.int_cell |> zorder_key |> write_zorder_layout): each
    lineitem row's (l_orderkey, l_partkey) mapped to 12-bit cells by
    exact integer scaling and bit-interleaved into one 24-bit key.
    Sorting 100 TB of storage by this key gives BOTH columns tight
    per-file footer min/max at once, so a 2D box predicate prunes to
    the O(perimeter) files straddling the box — where a single-column
    range sort leaves the second column unprunable (test_layout.py
    proves the file-level pruning with a parquet footer audit). The
    oracle replays the clamped integer cell division (// — the Spark
    side's floor(a/b) is proven exact below 2^53, layout.py) and all 24
    shift/mask/or terms of the interleave bit-for-bit. Beyond-reference
    capability (the reference stores rows in an RDBMS; layout is the
    columnar-era equivalent of its indexed queries)."""
    from stream2segment_spark.sinks.layout import int_cell, zorder_key
    li = load_table(spark, sf_dir, "lineitem")
    cells = {c: int_cell(F.col(c), lo, hi, _ZB)
             for c, (lo, hi) in _ZD.items()}
    return li.select(
        "l_orderkey", "l_partkey", "l_linenumber",
        cells["l_orderkey"].alias("cell_orderkey"),
        cells["l_partkey"].alias("cell_partkey"),
        zorder_key(list(cells.values()), bits=_ZB).alias("zkey"))


@register(
    "source_wet_roundtrip",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    r"""WITH src AS (
         SELECT doc_id,
                'http://crawl.test/' || CAST(doc_id AS VARCHAR) AS uri,
                regexp_replace(coalesce(text, ''), '[\r\n]+$', '') AS txt
         FROM documents),
       ok AS (SELECT * FROM src WHERE position('WARC/1.0' IN txt) = 0)
       SELECT uri, 'conversion' AS warc_type,
              CAST('1970-01-01 00:00:00' AS TIMESTAMP) AS warc_date,
              '<urn:md5:' || md5(uri) || '>' AS record_id,
              CAST(octet_length(encode(txt)) AS BIGINT)
                  AS content_length,
              md5(txt) AS text_md5, TRUE AS len_ok
       FROM ok""",
    gate=False,
)
def source_wet_roundtrip(spark, sf_dir):
    """Common Crawl WET source round-trip (sources/wet.py): the
    documents table is serialized into spec-shaped WARC/WET conversion
    records (to_wet_lines), written to a real multi-part text file, and
    re-read through the marker-framed reader (read_wet: lineSep split
    -> regexp header parse -> blank-line payload framing, all JVM
    expressions, scan-stage only — 100 TB of WET shards parse at text
    scan speed with zero shuffles and no Python). The oracle recomputes
    every parsed field (uri, record id = md5 urn, octet Content-Length,
    payload md5, len_ok) from the source table, so the compare proves
    serializer and parser are exact inverses through on-disk bytes.
    Beyond-reference capability: the web-corpus analogue of the FDSN
    '|'-text protocol parser (fdsn_text_roundtrip; reference
    stream2segment/download/modules/stations.py)."""
    import atexit
    import shutil
    import tempfile

    from stream2segment_spark.sources.wet import read_wet, to_wet_lines

    docs = load_table(spark, sf_dir, "documents", parallel=False)
    src = docs.select(
        F.concat(F.lit("http://crawl.test/"),
                 F.col("doc_id").cast("string")).alias("uri"),
        F.col("text"))
    tmp = tempfile.mkdtemp(prefix="s2s-wet-gate-")
    lines = to_wet_lines(src, "uri", "text").where(F.col("value").isNotNull())
    lines.write.mode("overwrite").text(tmp)
    atexit.register(shutil.rmtree, tmp, True)
    parsed = read_wet(spark, tmp)
    return parsed.select(
        "uri", "warc_type", "warc_date", "record_id", "content_length",
        F.md5("text").alias("text_md5"), "len_ok")


@register(
    "source_isf_roundtrip",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
                   FROM events),
        src AS (SELECT CAST(event_id AS VARCHAR) AS eid,
                       event_id AS k, ts
                FROM ev WHERE event_id % 7 = 0)
       SELECT eid AS event_id,
              strftime(ts, '%Y-%m-%dT%H:%M:%S') AS time,
              CAST(k % 17000 - 8500 AS DOUBLE) / 100 AS latitude,
              CAST(k % 35000 - 17500 AS DOUBLE) / 100 AS longitude,
              CAST(k % 6500 AS DOUBLE) / 10 AS depth_km,
              'TSTBULL' AS author,
              'o' || CAST(k % 1000000 AS VARCHAR) AS contributor_id,
              CASE CAST(k % 3 AS INT) WHEN 0 THEN 'mb'
                   WHEN 1 THEN 'ML' ELSE 'MW' END AS mag_type,
              CAST(k % 85 + 5 AS DOUBLE) / 10 AS magnitude,
              'MAGAUT' AS mag_author,
              'REGION_' || CAST(k % 10 AS VARCHAR) AS location_name
       FROM src""",
    gate=False,
)
def source_isf_roundtrip(spark, sf_dir):
    """ISF bulletin round-trip (SURVEY S2, sources/isf.py): a
    deterministic bulletin is built from the events table with
    format_isf_events (spec fixed columns), then re-parsed with the
    REAL parser (parse_isf_events — the reference's ISF->event path,
    stream2segment/download/modules/events.py:381-473) and compared
    field-for-field by the oracle. Driver-side by design: events are
    the small dimension (the reference parses bulletins in the driver
    too); the fixed-point /100 (/10) value grid makes every float
    survive format+parse bit-exactly, so the oracle recomputes parsed
    values directly from the table. Same roundtrip pattern as
    fdsn_text_roundtrip (S1) and source_wet_roundtrip."""
    from stream2segment_spark.sources.isf import (
        IsfEvent, format_isf_events, parse_isf_events)
    ev = load_table(spark, sf_dir, "events")
    rows = (ev.where(F.col("event_id") % 7 == 0)
            .select(
                F.col("event_id").cast("string").alias("eid"),
                F.col("event_id").alias("k"),
                F.concat(F.date_format("ts", "yyyy-MM-dd"), F.lit("T"),
                         F.date_format("ts", "HH:mm:ss")).alias("iso"))
            .orderBy("k").collect())
    evs = [IsfEvent(
        event_id=r["eid"], time=r["iso"],
        latitude=(r["k"] % 17000 - 8500) / 100,
        longitude=(r["k"] % 35000 - 17500) / 100,
        depth_km=(r["k"] % 6500) / 10,
        author="TSTBULL",
        contributor_id=f"o{r['k'] % 1000000}",
        mag_type=("mb", "ML", "MW")[r["k"] % 3],
        magnitude=(r["k"] % 85 + 5) / 10,
        mag_author="MAGAUT",
        location_name=f"REGION_{r['k'] % 10}",
    ) for r in rows]
    parsed = parse_isf_events(format_isf_events(evs))
    schema = ("event_id string, time string, latitude double, "
              "longitude double, depth_km double, author string, "
              "contributor_id string, mag_type string, "
              "magnitude double, mag_author string, "
              "location_name string")
    return spark.createDataFrame(
        [(p.event_id, p.time, p.latitude, p.longitude, p.depth_km,
          p.author, p.contributor_id, p.mag_type, p.magnitude,
          p.mag_author, p.location_name) for p in parsed], schema)


# ---------------------------------------------------------------------------
# source_routing — S6 (EIDA datacenter routing) driver-verified (r5)
# ---------------------------------------------------------------------------
# The routing stage (sources/routing.py; reference behavior
# download/modules/datacenters.py:28-247) previously had only pytest +
# pipeline-e2e coverage. This entry puts BOTH halves in the checked
# path: the plain-text routing-response parser (a deterministic literal
# response, parsed by the REAL parse_routing_response — a parse bug
# changes the generated CASE chain and the hash) and the distributed
# first-match-wins NSLC resolution (routed_datacenter_expr, a pure
# Column CASE chain — no UDF). The oracle's regex literals are produced
# by the SAME wildcard_to_regex helper the expression uses.

_ROUTING_TEXT = """http://dc1.example.org/fdsnws/dataselect/1/query
N0 * * HH? 1990-01-01T00:00:00 2100-01-01T00:00:00
N? S1* -- *

http://dc2.example.org/fdsnws/dataselect/1/query
N* * * HH*
short line
"""


def _routing_case() -> str:
    from stream2segment_spark.columns import wildcard_to_regex as w2r
    from stream2segment_spark.sources.routing import parse_routing_response
    whens = []
    for r in parse_routing_response(_ROUTING_TEXT):
        rloc = "" if r.location == "--" else r.location
        whens.append(
            f"WHEN regexp_matches(network, '{w2r(r.network)}') "
            f"AND regexp_matches(station, '{w2r(r.station)}') "
            f"AND regexp_matches(location, '{w2r(rloc)}') "
            f"AND regexp_matches(channel, '{w2r(r.channel)}') "
            f"THEN '{r.dataselect_url}'")
    return "CASE " + " ".join(whens) + " ELSE NULL END"


@register(
    "source_routing",
    f"""WITH ch AS (
         SELECT concat('N', p_partkey % 3) AS network,
                concat('S', p_partkey % 7) AS station,
                CASE WHEN p_partkey % 2 = 0 THEN ''
                     ELSE '00' END AS location,
                CASE p_partkey % 4 WHEN 0 THEN 'HHZ' WHEN 1 THEN 'HHN'
                     WHEN 2 THEN 'BHZ' ELSE 'LHE' END AS channel,
                p_partkey
         FROM part),
        routed AS (SELECT *, {_routing_case()} AS datacenter FROM ch)
       SELECT p_partkey, network, station, location, channel, datacenter,
              replace(datacenter, '/dataselect/', '/station/')
                AS station_url
       FROM routed""", gate=False,
)
def source_routing(spark, sf_dir):
    """S6: EIDA routing — the real parse_routing_response on a
    deterministic routing-service response (epoch'd rules, '--' empty
    location, '?'/'*' wildcards, a malformed line the parser must
    skip), then routed_datacenter_expr's first-match-wins CASE chain
    over part-derived NSLC rows, plus station_url_of's FDSN URL
    convention broadcast as a tiny literal map. Scale shape: the
    routing table is a tiny dimension inlined into the plan — channels
    never shuffle, no UDF (plan-audited)."""
    from stream2segment_spark.sources.routing import (
        parse_routing_response, routed_datacenter_expr, station_url_of)
    rules = parse_routing_response(_ROUTING_TEXT)
    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ch = part.select(
        k.alias("p_partkey"),
        F.concat(F.lit("N"), (k % 3).cast("string")).alias("network"),
        F.concat(F.lit("S"), (k % 7).cast("string")).alias("station"),
        F.when(k % 2 == 0, F.lit("")).otherwise(F.lit("00"))
         .alias("location"),
        F.element_at(F.array(F.lit("HHZ"), F.lit("HHN"), F.lit("BHZ"),
                             F.lit("LHE")), (k % 4 + 1).cast("int"))
         .alias("channel"))
    routed = ch.withColumn("datacenter", routed_datacenter_expr(rules))
    # station_url_of applied driver-side to the tiny rule set, shipped
    # as a literal map (the FDSN dataselect->station convention)
    url_map = {}
    for r in rules:
        url_map[r.dataselect_url] = station_url_of(r.dataselect_url)
    map_lits = [x for kv in url_map.items() for x in
                (F.lit(kv[0]), F.lit(kv[1]))]
    return routed.withColumn(
        "station_url",
        F.element_at(F.create_map(*map_lits), F.col("datacenter")))
