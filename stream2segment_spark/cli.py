"""Command-line surface — the reference's ``s2s`` CLI (cli.py: download /
process / show / dl stats) re-expressed over the Spark engine.

The "database" is a WAREHOUSE directory of parquet tables (events,
stations, channels, segments) — the dburl analogue; every command reads
and writes it with plain ``spark.read/write.parquet`` so any other Spark
(or DuckDB) consumer can open the same tables.

Commands (YAML config, reference-style key names where they map 1:1):

- ``download -c cfg.yaml``  — the §3.2 chain end-to-end: FDSN event +
  channel text (files or URLs) -> parse/filter/dedup/id-sync -> spatial
  join -> diff vs stored segments -> fetch -> miniSEED decode -> upsert;
  prints the per-code response summary.
- ``process -c cfg.yaml -p file.py:func -o out``  — the §3.1 pyfunc
  engine over the warehouse with the reference's selection semantics.
- ``show -c cfg.yaml -o report.html``  — the server-less GUI analogue:
  decode selected segments, render the standalone HTML plot report.
- ``dl-stats -c cfg.yaml [--html]``  — the 's2s dl stats' table (code
  columns ordered/titled per the reference policy).

Config keys for ``download``: ``warehouse``, ``events_file``,
``channels_file``, ``dataselect_url``, ``min_sample_rate``,
``search_radius: {minmag,maxmag,minmag_radius,maxmag_radius}``,
``timespan: [lead_sec, lag_sec]``, and ``transport`` (dotted
``module:callable`` — the injectable HTTP layer of sources.fetch; omit
for the stdlib default. Tests inject a deterministic one, like the
reference's mocked-HTTP download tests).
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EMPTY_SCHEMAS = {
    "events": "id long, event_id string",
    "channels": ("id long, network string, station string, location string, "
                 "channel string, start_time timestamp"),
    "segments": ("id long, channel_id long, event_id long, "
                 "event_distance_deg double, request_start timestamp, "
                 "request_end timestamp, download_code int, data binary, "
                 "sample_rate double, maxgap_numsamples double, "
                 "start_time timestamp, end_time timestamp"),
}


def _load_cfg(path: str) -> dict:
    import yaml
    with open(path, encoding="utf-8") as fh:
        cfg = yaml.safe_load(fh) or {}
    if "warehouse" not in cfg:
        raise SystemExit("config needs a 'warehouse' directory")
    return cfg


def _table(spark: SparkSession, cfg: dict, name: str) -> DataFrame:
    path = os.path.join(cfg["warehouse"], f"{name}.parquet")
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], _EMPTY_SCHEMAS[name])


def _write(df: DataFrame, cfg: dict, name: str) -> None:
    df.write.mode("overwrite").parquet(
        os.path.join(cfg["warehouse"], f"{name}.parquet"))


def _dotted(spec: str):
    mod, _, attr = spec.partition(":")
    return getattr(importlib.import_module(mod), attr)


def _lines(spark: SparkSession, source: str) -> DataFrame:
    return spark.read.text(source)  # local path, glob or hadoop-visible URL


def cmd_download(spark: SparkSession, cfg: dict) -> int:
    from stream2segment_spark.pipeline import download_pipeline
    from stream2segment_spark.reporting import render_text

    radius = cfg.get("search_radius", {})
    lead, lag = cfg.get("timespan", [60.0, 120.0])
    transport = _dotted(cfg["transport"]) if cfg.get("transport") else None
    out = download_pipeline(
        spark,
        _lines(spark, cfg["events_file"]),
        _lines(spark, cfg["channels_file"]),
        _table(spark, cfg, "events"),
        _table(spark, cfg, "channels"),
        _table(spark, cfg, "segments"),
        transport=transport,
        minmag=radius.get("minmag", 3.0),
        maxmag=radius.get("maxmag", 7.0),
        minmag_radius=radius.get("minmag_radius", 1.0),
        maxmag_radius=radius.get("maxmag_radius", 5.0),
        window_lead_sec=float(lead), window_lag_sec=float(lag),
        base_url=cfg.get("dataselect_url", "http://dataselect.invalid/query"),
        min_sample_rate=cfg.get("min_sample_rate"),
    )
    from stream2segment_spark.pipeline import stations_of
    # materialize results BEFORE overwriting inputs they were derived from
    for name in ("events", "channels", "segments"):
        out[name] = out[name].localCheckpoint(eager=True)
    stations = stations_of(out["channels"]).localCheckpoint(eager=True)
    for name in ("events", "channels", "segments"):
        _write(out[name], cfg, name)
    _write(stations, cfg, "stations")
    stats = out["segments"].select(
        F.lit("all").alias("row"),
        F.col("download_code").alias("code")).groupBy("row", "code") \
        .agg(F.count("*").alias("n"))
    print(render_text(stats))
    return 0


def cmd_process(spark: SparkSession, cfg: dict, pyfunc_spec: str,
                outfile: str | None) -> int:
    import importlib.util as ilu

    from stream2segment_spark.process import process_df
    from stream2segment_spark.schema import spark_type_to_pytype
    from stream2segment_spark.selectexpr import binexpr

    path, _, attr = pyfunc_spec.rpartition(":")
    if path.endswith(".py"):  # a file path: import by location
        spec = ilu.spec_from_file_location("__s2s_pyfunc__", path)
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        func = getattr(mod, attr)
    else:
        func = _dotted(pyfunc_spec)
    schema = cfg.get("output_schema") or getattr(func, "output_schema", None)
    if not schema:
        raise SystemExit("need 'output_schema' in config or on the function")
    segs = _table(spark, cfg, "segments")
    # reference-style selection strings ('>3', '[0.5, 1.5]', 'true', ...)
    # compiled with the same binexpr grammar the selection compiler uses
    for col, expr in (cfg.get("segments_selection") or {}).items():
        pytype = spark_type_to_pytype(segs.schema[col].dataType)
        segs = segs.filter(binexpr(F.col(col), pytype, str(expr)))
    result = process_df(segs, func, schema, config=cfg.get("config"))
    if outfile:
        from stream2segment_spark.sinks.writers import write_output
        write_output(result, outfile)
    else:
        for row in result.toLocalIterator():
            print(row.asDict())
    return 0


def cmd_show(spark: SparkSession, cfg: dict, outfile: str,
             max_segments: int) -> int:
    from stream2segment_spark.report import write_segment_report
    from stream2segment_spark.sources.mseed import unpack_mseed_udf

    segs = _table(spark, cfg, "segments").filter(
        F.col("data").isNotNull() & (F.octet_length("data") > 0))
    decoded = (segs.withColumn(
        "ms", F.element_at(unpack_mseed_udf()(F.col("data")), 1))
        .filter(F.col("ms.error").isNull())
        .select("id", F.col("ms.samples").alias("samples"),
                (F.lit(1.0) / F.col("ms.sample_rate")).alias("delta"),
                F.col("ms.seed_id").alias("seed_id")))
    n = write_segment_report(decoded, outfile, title=cfg.get(
        "title", "segment report"), max_segments=max_segments,
        label_cols=("seed_id",))
    print(f"wrote {n} segment(s) to {outfile}")
    return 0


def cmd_dl_stats(spark: SparkSession, cfg: dict, as_html: bool) -> int:
    from stream2segment_spark.reporting import (
        render_html, render_text, stats_by_code)
    segs = _table(spark, cfg, "segments").withColumn(
        "datacenter", F.lit(cfg.get("dataselect_url", "all")))
    stats = stats_by_code(segs)
    print(render_html(stats) if as_html else render_text(stats))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="s2s-spark", description="stream2segment on Spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("download", "process", "show", "dl-stats"):
        p = sub.add_parser(name)
        p.add_argument("-c", "--config", required=True)
        if name == "process":
            p.add_argument("-p", "--pyfunc", required=True,
                           help="module:attr or file.py:attr")
            p.add_argument("-o", "--outfile")
        if name == "show":
            p.add_argument("-o", "--outfile", required=True)
            p.add_argument("--max-segments", type=int, default=200)
        if name == "dl-stats":
            p.add_argument("--html", action="store_true")
    args = ap.parse_args(argv)
    cfg = _load_cfg(args.config)

    from stream2segment_spark.session import get_spark
    # only stop a session this invocation created (getOrCreate may hand us
    # a host application's session — embedding callers keep theirs)
    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"s2s-{args.cmd}")
    try:
        if args.cmd == "download":
            return cmd_download(spark, cfg)
        if args.cmd == "process":
            return cmd_process(spark, cfg, args.pyfunc, args.outfile)
        if args.cmd == "show":
            return cmd_show(spark, cfg, args.outfile, args.max_segments)
        return cmd_dl_stats(spark, cfg, args.html)
    finally:
        if not preexisting:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
