"""functions/url.py edge cases the gate's synthetic corpus can't reach:
userinfo, IP hosts, single-label hosts, null input, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from stream2segment_spark.functions.url import (
    add_url_columns, url_canonical, url_host, url_port,
    url_registrable_domain)


def _one(spark, url, col):
    return spark.createDataFrame([Row(u=url)]).select(
        col(F.col("u")).alias("v")).first()["v"]


def test_userinfo_and_ip_hosts(spark):
    assert _one(spark, "http://user:pw@example.com/a", url_host) \
        == "example.com"
    assert _one(spark, "http://10.0.0.1:8080/x", url_host) == "10.0.0.1"
    assert _one(spark, "http://10.0.0.1:8080/x", url_port) == 8080


def test_registrable_domain_edges(spark):
    for host, want in [
        ("a.b.c.example.co.uk", "example.co.uk"),
        ("deep.sub.example.com", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("co.uk", "co.uk"),            # bare suffix: <=2 labels pass through
    ]:
        got = spark.createDataFrame([Row(h=host)]).select(
            url_registrable_domain(F.col("h")).alias("v")).first()["v"]
        assert got == want, (host, got)


def test_canonical_contract(spark):
    cases = {
        # param sorting + tracking removal + fragment drop
        "https://www.Ex.COM/a?z=1&utm_x=9&a=2#f": "https://ex.com/a?a=2&z=1",
        # default port dropped, non-default kept
        "https://e.com:443/": "https://e.com/",
        "https://e.com:8443/": "https://e.com:8443/",
        # empty path -> '/'
        "http://e.com": "http://e.com/",
        # all params tracking -> no '?'
        "http://e.com/p?gclid=1&ref=x": "http://e.com/p",
    }
    for url, want in cases.items():
        assert _one(spark, url, url_canonical) == want, url


def test_null_url(spark):
    df = spark.createDataFrame([Row(u=None)], "u string")
    assert df.select(url_canonical(F.col("u")).alias("v")).first()["v"] \
        is None


def test_add_url_columns_scan_stage(spark):
    df = spark.createDataFrame([Row(u="https://a.example.org/x?b=1")])
    out = add_url_columns(df, "u")
    r = out.first()
    assert r["url_domain"] == "example.org"
    assert r["url_canonical"] == "https://a.example.org/x?b=1"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_filter_blocklist_broadcast_anti(spark):
    from stream2segment_spark.functions.url import filter_blocklist
    docs = spark.createDataFrame([
        Row(i=1, u="https://www.bad.co.uk/x"),
        Row(i=2, u="https://sub.bad.co.uk/y?a=1"),
        Row(i=3, u="http://fine.org/z"),
        Row(i=4, u="http://also-bad.com/q"),
    ])
    blocked = spark.createDataFrame(
        [Row(domain="bad.co.uk"), Row(domain="also-bad.com")])
    kept = filter_blocklist(docs, "u", blocked)
    assert {r["i"] for r in kept.collect()} == {3}
    only = filter_blocklist(docs, "u", blocked, keep_blocked=True)
    assert {r["i"] for r in only.collect()} == {1, 2, 4}
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the corpus side is never shuffle-joined (the only exchanges are
    # the broadcast itself + the tiny blocklist-side distinct)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
