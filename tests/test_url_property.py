"""Property-based tests (hypothesis) for functions/url.py: the
canonicalization contract's algebraic properties — idempotence
(canonical of a canonical URL is itself), tracking-param-order
invariance, and a pure-python reference for registrable domains. URLs
are generated from structured parts so every example is a valid
absolute URL. One Spark job per batch of examples: hypothesis drives a
pure-python URL builder, Spark evaluates the whole batch at once."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row, functions as F

from stream2segment_spark.functions.url import (
    TWO_LEVEL_SUFFIXES, url_canonical, url_registrable_domain)

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

_label = st.sampled_from(["ex", "www", "a1", "blog", "cdn-x"])
_tld = st.sampled_from(["com", "org", "io", "co.uk", "co.jp", "de"])
_scheme = st.sampled_from(["http", "https", "HTTP", "ftp"])
_path = st.sampled_from(["", "/", "/a", "/a/b-c", "/x%20y"])
_param = st.sampled_from(["a=1", "z=9", "b=", "utm_source=x", "gclid=7",
                          "ref=h", "q=hello"])
_frag = st.sampled_from(["", "#f", "#sec-2"])


@st.composite
def _url(draw):
    host = ".".join(draw(st.lists(_label, min_size=0, max_size=2))
                    + [draw(_label), draw(_tld)])
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    params = draw(st.lists(_param, min_size=0, max_size=4))
    q = ("?" + "&".join(params)) if params else ""
    return (f"{draw(_scheme)}://{host}{port}{draw(_path)}{q}"
            f"{draw(_frag)}")


def _canon_batch(spark, urls):
    df = spark.createDataFrame([Row(u=u) for u in urls])
    return [r["v"] for r in
            df.select(url_canonical(F.col("u")).alias("v"))
            .collect()]


@settings(**_SETTINGS)
@given(st.lists(_url(), min_size=1, max_size=8))
def test_canonical_idempotent(spark, urls):
    once = _canon_batch(spark, urls)
    twice = _canon_batch(spark, once)
    assert twice == once


@settings(**_SETTINGS)
@given(st.lists(_param, min_size=0, max_size=5), st.randoms())
def test_param_order_invariance(spark, params, rnd):
    shuffled = list(params)
    rnd.shuffle(shuffled)
    a = f"https://e.com/p?{'&'.join(params)}"
    b = f"https://e.com/p?{'&'.join(shuffled)}"
    ca, cb = _canon_batch(spark, [a, b])
    assert ca == cb


@settings(**_SETTINGS)
@given(st.lists(st.lists(_label, min_size=1, max_size=4)
                .map(lambda ls: ".".join(ls)),
                min_size=1, max_size=8),
       st.lists(_tld, min_size=1, max_size=8))
def test_registrable_domain_matches_reference(spark, subs, tlds):
    hosts = [f"{s}.{t}" for s, t in zip(subs, tlds)]

    def ref(host):
        labels = host.split(".")
        if len(labels) <= 2:
            return host
        if ".".join(labels[-2:]) in TWO_LEVEL_SUFFIXES:
            return ".".join(labels[-3:])
        return ".".join(labels[-2:])

    df = spark.createDataFrame([Row(h=h) for h in hosts])
    got = [r["v"] for r in df.select(
        url_registrable_domain(F.col("h")).alias("v")).collect()]
    assert got == [ref(h) for h in hosts]
