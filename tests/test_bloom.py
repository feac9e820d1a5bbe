"""Broadcast Bloom filter (operators/bloom.py): sizing math, the
no-false-negative guarantee, bit-exact anti-join equivalence (including
under a deliberately saturated filter), incremental union, and the
bloom-prefiltered streaming ingest matching the plain path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from stream2segment_spark.operators.bloom import (
    BloomFilter, bloom_anti_join, build_bloom, might_contain,
    optimal_params, or_bloom)


def test_optimal_params_math():
    m, k = optimal_params(1000, 0.01)
    # textbook: m ~ 9.585 bits/key at 1% fpp, k ~ 7
    assert abs(m - 1000 * 9.585) < 16 and m % 8 == 0
    assert k == round(m / 1000 * math.log(2)) == 7
    with pytest.raises(ValueError):
        optimal_params(0, 0.01)
    with pytest.raises(ValueError):
        optimal_params(10, 1.5)


def test_build_params_validation(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="params"):
        build_bloom(df, "k", params=(100, 3))   # m_bits not byte-aligned
    with pytest.raises(ValueError, match="parameter mismatch"):
        or_bloom(BloomFilter(64, 2, bytes(8)), BloomFilter(128, 2, bytes(16)))


def test_no_false_negatives_and_bounded_fpp(spark):
    n = 2000
    corpus = spark.range(0, n).withColumnRenamed("id", "k")
    bf = build_bloom(corpus, "k", fpp=0.01)
    # every member must probe True (Bloom guarantee)
    members = might_contain(corpus, "k", bf)
    assert members.filter(~F.col("might_contain")).count() == 0
    # non-members: fp rate near the target (generous bound: 3x)
    others = spark.range(n, 4 * n).withColumnRenamed("id", "k")
    fp = might_contain(others, "k", bf).filter("might_contain").count()
    assert fp / (3 * n) < 0.03


def test_anti_join_bit_exact(spark):
    corpus = spark.range(0, 3000).withColumnRenamed("id", "k") \
        .withColumn("v", F.col("k") * 2)
    new = spark.range(1500, 4500).withColumnRenamed("id", "k") \
        .withColumn("payload", F.col("k") + 7)
    got = bloom_anti_join(new, corpus, "k")
    expect = new.join(corpus.select("k"), "k", "left_anti")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, expect.collect()))


def test_anti_join_exact_under_saturated_filter(spark):
    """A filter sized for fpp ~0.5 floods the rescue path with false
    positives; the output must still equal the exact anti-join."""
    corpus = spark.range(0, 1000).withColumnRenamed("id", "k")
    new = spark.range(500, 2000).withColumnRenamed("id", "k")
    bf = build_bloom(corpus, "k", fpp=0.5)
    # sanity: the saturated filter really does fire false positives
    fresh = spark.range(10_000, 12_000).withColumnRenamed("id", "k")
    assert might_contain(fresh, "k", bf).filter("might_contain").count() > 0
    got = sorted(r["k"] for r in bloom_anti_join(new, corpus, "k", bf)
                 .collect())
    assert got == list(range(1000, 2000))


def test_or_bloom_equals_whole_build(spark):
    """Union of two half-filters with pinned params is bit-identical to
    one filter built over the whole set (OR of position sets)."""
    params = optimal_params(1000, 0.01)
    a = spark.range(0, 500).withColumnRenamed("id", "k")
    b = spark.range(500, 1000).withColumnRenamed("id", "k")
    whole = spark.range(0, 1000).withColumnRenamed("id", "k")
    merged = or_bloom(build_bloom(a, "k", params=params),
                      build_bloom(b, "k", params=params))
    direct = build_bloom(whole, "k", params=params)
    assert merged == direct


def test_driver_side_contains_matches_spark_probe(spark):
    df = spark.range(0, 64).withColumnRenamed("id", "k")
    bf = build_bloom(df, "k", fpp=0.01)
    hashed = df.select(
        "k", F.xxhash64("k").alias("h1"),
        F.xxhash64("k", F.lit("s2s-bloom-h2")).alias("h2"))
    for r in hashed.collect():
        assert bf.contains(r["h1"], r["h2"])


def test_ingest_with_bloom_matches_plain(spark, tmp_path):
    """The bloom-prefiltered streaming ingest lands the same corpus as
    the plain anti-join path across two drops (incl. the incremental
    or_bloom fold between batches of one run)."""
    from stream2segment_spark.streaming.corpus import ingest_documents_stream
    from tests.test_streaming_corpus import SCHEMA, _drop

    results = {}
    for mode, use_bloom in [("plain", False), ("bloom", True)]:
        src = tmp_path / f"landing_{mode}"
        src.mkdir()
        corpus = str(tmp_path / f"corpus_{mode}.parquet")
        _drop(spark, str(src), "d1", [
            dict(doc_id=1, text="alpha beta gamma"),
            dict(doc_id=2, text="delta epsilon"),
            dict(doc_id=3, text="alpha beta gamma")])
        ingest_documents_stream(spark, str(src), corpus, SCHEMA,
                                use_bloom=use_bloom, bloom_capacity=1000)
        _drop(spark, str(src), "d2", [
            dict(doc_id=4, text="delta epsilon"),
            dict(doc_id=5, text="zeta eta theta"),
            dict(doc_id=1, text="alpha beta gamma")])
        out = ingest_documents_stream(spark, str(src), corpus, SCHEMA,
                                      use_bloom=use_bloom,
                                      bloom_capacity=1000)
        results[mode] = sorted(map(tuple,
                                   out.select("doc_id", "text").collect()))
    assert results["bloom"] == results["plain"]
    assert [d for d, _ in results["bloom"]] == [1, 2, 5]
