"""Tests for the spark.sql view surface: derived columns usable from SQL."""

from __future__ import annotations

import pytest

from stream2segment_spark.sql_views import register_sql_views


@pytest.fixture(scope="module")
def views(spark, seismic_graph_full, seismic_dfs):
    names = register_sql_views(spark, seismic_graph_full, seismic_dfs)
    return set(names)


def test_views_created(views):
    assert {"segments", "segments_v", "segments_full",
            "stations", "stations_v", "channels", "channels_v"} <= views


def test_sql_with_derived_columns(spark, views, seismic_duck):
    got = spark.sql("""
        SELECT id, duration_sec, event_distance_km
        FROM segments_v
        WHERE has_valid_data AND duration_sec > 0
        ORDER BY id""").toPandas()
    want = seismic_duck.sql("""
        SELECT id,
               epoch(end_time) - epoch(start_time) AS duration_sec,
               event_distance_deg * (2*6371*pi()/360) AS event_distance_km
        FROM segments
        WHERE (data IS NOT NULL AND octet_length(data) > 0
               AND download_code IS NOT NULL AND download_code != -2)
          AND epoch(end_time) - epoch(start_time) > 0
        ORDER BY id""").df()
    assert list(got["id"]) == list(want["id"])
    assert got["duration_sec"].tolist() == pytest.approx(
        want["duration_sec"].tolist())
    assert got["event_distance_km"].tolist() == pytest.approx(
        want["event_distance_km"].tolist())


def test_sql_full_view_seed_id(spark, views):
    rows = spark.sql(
        "SELECT id, seed_id, classlabels_count FROM segments_full ORDER BY id"
    ).collect()
    assert len(rows) > 0
    assert all(r["seed_id"] and r["seed_id"].count(".") == 3 for r in rows)
    assert all(r["classlabels_count"] >= 0 for r in rows)
