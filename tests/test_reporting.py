"""DownloadStats presentation parity (reference utils.py:385-710):
code ordering, titles, legends, TOTAL row/column, text + HTML renderings
against a golden fixture."""

from __future__ import annotations

from stream2segment_spark import reporting as R

GOLDEN = """\
       OK  OK Partially Saved  No Content  Time Span Error  MSeed Error  Url Error  Segment Not Found  Bad Request  Internal Server Error  TOTAL
-----  --  ------------------  ----------  ---------------  -----------  ---------  -----------------  -----------  ---------------------  -----
dc_a   12                   3           1                0            2          1                  0            4                      0     23
dc_b    5                   0           0                2            0          0                  7            0                      1     15
TOTAL  17                   3           1                2            2          1                  7            4                      1     38

COLUMNS DETAILS:
 - OK: Data saved (download completed, no additional warning)
 - OK Partially Saved: Data saved (download completed, chunks outside the requested time window were discarded)
 - No Content: No data saved (download completed, the server returned 0 bytes of data)
 - Time Span Error: No data saved (download completed, every chunk was outside the requested time window)
 - MSeed Error: Data saved (download completed, malformed MiniSeed data)
 - Url Error: No data saved (download failed: generic url error, e.g. timeout or no connection)
 - Segment Not Found: No data saved (download completed, segment data not found, e.g. in a multi-segment request)
 - Bad Request: No data saved (download failed: client error, response code 400)
 - Internal Server Error: No data saved (download failed: server error, response code 500)"""


def _stats_df(spark):
    rows = [
        ("dc_a", 200, 12), ("dc_a", -200, 3), ("dc_a", 204, 1),
        ("dc_a", -2, 2), ("dc_a", -1, 1), ("dc_a", 400, 4),
        ("dc_b", 200, 5), ("dc_b", -204, 2), ("dc_b", None, 7),
        ("dc_b", 500, 1),
    ]
    return spark.createDataFrame(rows, "row string, code int, n long")


def test_code_ordering():
    codes = [500, 400, None, -1, -2, -204, -200, 204, 200, 302, 101, 9999]
    assert R.sort_codes(codes) == [
        200, -200, 204, -204, -2, -1, None, 400, 500, 101, 302, 9999]


def test_titles_and_legends():
    assert R.code_info(200)[0] == "OK"
    assert R.code_info(-200)[0] == "OK Partially Saved"
    assert R.code_info(-2)[0] == "MSeed Error"
    assert R.code_info(None)[0] == "Segment Not Found"
    assert R.code_info(404)[0] == "Not Found"
    title, leg, pos = R.code_info(777)
    assert title == "Code 777" and pos is None and "unknown" in leg


def test_render_text_golden(spark):
    out = R.render_text(_stats_df(spark))
    assert out == GOLDEN


def test_render_html_contains_cells_and_legend(spark):
    html = R.render_html(_stats_df(spark))
    assert "<th>OK Partially Saved</th>" in html
    assert "<td>dc_a</td>" in html and "<td>23</td>" in html
    assert "<td>TOTAL</td>" in html and "<td>38</td>" in html
    assert "<li>MSeed Error: Data saved" in html


def test_empty_stats(spark):
    empty = spark.createDataFrame([], "row string, code int, n long")
    assert R.render_text(empty) == ""
    assert R.render_html(empty) == "<table></table>"


def test_stats_by_code_distributed(spark):
    segs = spark.createDataFrame(
        [("dc_a", 200), ("dc_a", 200), ("dc_a", -2), ("dc_b", None)],
        "datacenter string, download_code int")
    got = {(r["row"], r["code"]): r["n"]
           for r in R.stats_by_code(segs).collect()}
    assert got == {("dc_a", 200): 2, ("dc_a", -2): 1, ("dc_b", None): 1}


def test_retired_gate_entries_still_correct(spark, testdata_duck):
    """agg_type_stats / agg_cube left the 50-entry gate in the r3
    rotation but stay part of the library: oracle-check them here with
    the same DuckDB views the gate uses."""
    from stream2segment_spark.queries_reporting import agg_cube, agg_type_stats
    from tests.conftest import SF_DIR_T2

    got = {r["event_type"]: r.asDict()
           for r in agg_type_stats(spark, SF_DIR_T2).collect()}
    want = testdata_duck.execute(
        """SELECT event_type, round(quantile_cont(value, 0.25), 6) p25,
                  round(quantile_cont(value, 0.50), 6) p50,
                  round(quantile_cont(value, 0.75), 6) p75,
                  count(DISTINCT user_id) exact_users
           FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
           WHERE value IS NOT NULL GROUP BY event_type""").fetchall()
    assert len(want) == len(got)
    for et, p25, p50, p75, users in want:
        row = got[et]
        assert (row["p25"], row["p50"], row["p75"]) == (p25, p50, p75)
        assert row["exact_users"] == users

    cube = {(r["event_type"], r["bucket"]): r["n"]
            for r in agg_cube(spark, SF_DIR_T2).collect()}
    want = testdata_duck.execute(
        """SELECT coalesce(event_type, '(all)'),
                  coalesce(CAST(bucket AS VARCHAR), '(all)'), count(*)
           FROM (SELECT event_type, user_id % 10 AS bucket FROM events)
           GROUP BY CUBE (event_type, bucket)""").fetchall()
    assert dict(((et, b), n) for et, b, n in want) == cube


def test_asof_duplicate_right_ts_deterministic(spark):
    """Two right rows with the SAME (by, ts) but different payloads:
    the matched payload must be identical under any partitioning
    (payload tie-break), for all three directions."""
    from datetime import datetime

    from pyspark.sql import Row

    from stream2segment_spark.operators.asof import (
        asof_join_backward, asof_join_forward, asof_join_nearest)
    t = datetime(2024, 1, 1, 10)
    left = spark.createDataFrame([Row(u=1, ts=t)])
    right_rows = [Row(u=1, ts=t, val="a"), Row(u=1, ts=t, val="b")]
    for fn in (asof_join_backward, asof_join_forward, asof_join_nearest):
        got = set()
        for arranged in (spark.createDataFrame(right_rows).repartition(5),
                         spark.createDataFrame(right_rows[::-1])
                         .coalesce(1)):
            r = fn(left, arranged, on="ts", by=["u"]).collect()
            assert len(r) == 1
            got.add(r[0]["val_asof"])
        assert len(got) == 1, (fn.__name__, got)
