"""Tests for the plot-data producers (X4) and the SDS path expression (F15)."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream2segment_spark.columns import sds_path
from stream2segment_spark.plots import downsample_minmax, plot_producers


def test_downsample_minmax_preserves_peaks():
    x = np.zeros(10_000)
    x[1234] = 5.0
    x[7777] = -3.0
    out = downsample_minmax(x, 100)
    assert len(out) == 200
    assert out.max() == 5.0 and out.min() == -3.0
    short = np.arange(10.0)
    np.testing.assert_array_equal(downsample_minmax(short, 100), short)


def test_plot_producers_on_spark(spark):
    t = np.arange(0, 4096) * 0.01
    sig = np.sin(2 * np.pi * 5 * t)  # 5 Hz sine @ 100 Hz
    df = spark.createDataFrame(
        [(1, [float(v) for v in sig], 0.01)],
        "id long, samples array<double>, delta double")
    prods = plot_producers(n_buckets=64)
    out = df.select(
        prods["trace"]("samples", "delta").alias("tr"),
        prods["cumulative"]("samples", "delta").alias("cum"),
        prods["spectrum"]("samples", "delta").alias("sp")).collect()[0]
    assert out["tr"]["label"] == "trace" and out["tr"]["n_raw"] == 4096
    assert len(out["tr"]["y"]) == 128
    assert max(out["tr"]["y"]) == pytest.approx(1.0, abs=1e-3)
    cum = out["cum"]["y"]
    assert cum[0] == pytest.approx(0.0, abs=1e-6)
    assert cum[-1] == pytest.approx(1.0, abs=1e-6)
    assert all(b >= a - 1e-12 for a, b in zip(cum, cum[1:]))  # monotone
    # spectrum dx = frequency resolution; peak bucket ~5 Hz
    sp = np.asarray(out["sp"]["y"])
    dx = out["sp"]["dx"]
    assert dx == pytest.approx(100.0 / 4096, rel=1e-6)
    n_raw = out["sp"]["n_raw"]
    peak_bucket = int(np.argmax(sp))
    # bucket index -> raw index (2 values per bucket over n_raw points)
    approx_freq = (peak_bucket // 2) / 64 * n_raw * dx
    assert approx_freq == pytest.approx(5.0, abs=0.5)


def test_segment_report_html(spark, tmp_path):
    """X4 serving parity: distributed plot production -> one standalone
    HTML file with an inline SVG per (segment, plot), metadata line per
    segment, no external resources."""
    from xml.etree import ElementTree

    from stream2segment_spark.report import (
        render_segments_html, segment_plots_df, write_segment_report)

    t = np.arange(0, 2048) * 0.01
    rows = [(i, [float(v) for v in np.sin(2 * np.pi * (i + 1) * t)],
             0.01, f"GE.APE{i}..HHZ") for i in range(3)]
    segs = spark.createDataFrame(
        rows, "id long, samples array<double>, delta double, seed_id string")

    out = tmp_path / "report.html"
    n = write_segment_report(segs, str(out), title="3 sines & <specials>",
                             label_cols=("seed_id",))
    assert n == 3
    html = out.read_text()
    assert html.count("<svg") == 9  # 3 segments x 3 plots
    assert html.count("<h2>") == 3
    assert "GE.APE1..HHZ" in html and "&lt;specials&gt;" in html
    assert "http" not in html  # standalone: no external fetches
    ElementTree.fromstring(html.replace("<!DOCTYPE html>", ""))  # well-formed

    # bounded-render guard
    big = segment_plots_df(segs, label_cols=("seed_id",)).collect()
    with pytest.raises(ValueError, match="max_segments"):
        render_segments_html(big, max_segments=2)

    # null samples render as an empty-plot placeholder, not a crash
    nulls = spark.createDataFrame(
        [(9, None, 0.01)], "id long, samples array<double>, delta double")
    html2 = render_segments_html(segment_plots_df(nulls).collect())
    assert "no data" in html2


def test_sds_path_expression(spark):
    df = spark.createDataFrame(
        [("GE", "APE", "", "HHZ", datetime(2021, 2, 3, 4, 5, 6))],
        "net string, sta string, loc string, cha string, t timestamp")
    out = df.select(sds_path(
        F.col("net"), F.col("sta"), F.col("loc"), F.col("cha"), F.col("t"),
        root="/archive").alias("p")).collect()[0]["p"]
    assert out == "/archive/2021/GE/APE/HHZ.D/GE.APE..HHZ.D.2021.034"


def test_approx_count_distinct_within_rsd(spark):
    from pyspark.sql import functions as F

    from stream2segment_spark.schema import load_table
    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    rows = (ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("exact"),
                 F.approx_count_distinct("user_id", 0.02).alias("approx"))
            .collect())
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(0.06 * r["exact"], 2), r
