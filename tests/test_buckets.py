"""ccnet_buckets unit tests: exact thirds on a uniform fixture, weighted
group-start boundary rule, per-language independence, quantization of
near-tie scores, validation errors, partitioning-independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream2segment_spark.functions.buckets import ccnet_buckets


def _rows(df, *cols):
    return {tuple(r[c] for c in cols[:-1]): r[cols[-1]]
            for r in df.collect()}


def test_uniform_thirds(spark):
    # 9 docs, scores 9..1, unit weight -> top 3 head, next 3 middle
    df = spark.createDataFrame(
        [(i, float(10 - i)) for i in range(1, 10)], "id long, s double")
    out = ccnet_buckets(df, "s")
    got = _rows(out, "id", "bucket")
    assert [got[(i,)] for i in range(1, 10)] == \
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    fr = _rows(out, "id", "cum_frac")
    assert fr[(9,)] == 1.0
    assert fr[(1,)] == pytest.approx(1 / 9, abs=1e-6)


def test_weighted_group_start_rule(spark):
    # best score group holds 60% of the mass: it STARTS at 0 -> head,
    # even though it overruns the 1/3 cut; the next group starts at
    # 0.6 -> tail directly (past 2/3? no: 0.6 < 2/3 -> middle), the
    # last group starts at 0.8 -> tail
    df = spark.createDataFrame(
        [(1, 3.0, 60), (2, 2.0, 20), (3, 1.0, 20)],
        "id long, s double, w long")
    got = _rows(ccnet_buckets(df, "s", weight_col="w"), "id", "bucket")
    assert got == {(1,): "head", (2,): "middle", (3,): "tail"}


def test_per_language_independent_cuts(spark):
    rows = [(f"a{i}", "aa", float(i)) for i in range(1, 10)]
    # language bb has an inverted score range; its own top third must
    # be head regardless of aa's distribution
    rows += [(f"b{i}", "bb", float(1000 + i)) for i in range(1, 4)]
    df = spark.createDataFrame(rows, "id string, lang string, s double")
    out = ccnet_buckets(df, "s", lang_col="lang")
    got = _rows(out, "id", "bucket")
    assert got[("a9",)] == "head" and got[("a1",)] == "tail"
    assert got[("b3",)] == "head" and got[("b1",)] == "tail"


def test_quantize_groups_ties(spark):
    # scores equal at 6 decimals form ONE group: both rows share a
    # bucket and the group cum_frac
    df = spark.createDataFrame(
        [(1, 0.5000000001), (2, 0.5000000002), (3, 0.1)],
        "id long, s double")
    out = ccnet_buckets(df, "s")
    got = _rows(out, "id", "bucket")
    assert got[(1,)] == got[(2,)] == "head"
    fr = _rows(out, "id", "cum_frac")
    assert fr[(1,)] == fr[(2,)] == pytest.approx(2 / 3, abs=1e-6)


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(
        [(i, float(i % 17), 1 + i % 5) for i in range(200)],
        "id long, s double, w long")
    a = _rows(ccnet_buckets(df.repartition(2), "s", weight_col="w"),
              "id", "bucket")
    b = _rows(ccnet_buckets(df.repartition(13), "s", weight_col="w"),
              "id", "bucket")
    assert a == b


def test_validation_errors(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, s double")
    with pytest.raises(ValueError, match="labels"):
        ccnet_buckets(df, "s", labels=("head", "tail"))
    with pytest.raises(ValueError, match="rational"):
        ccnet_buckets(df, "s", boundaries=((2, 1), (2, 3)))
    with pytest.raises(ValueError, match="collide"):
        ccnet_buckets(df.withColumn("bucket", F.lit("x")), "s")


def test_zero_total_language(spark):
    # a language whose rows all weigh 0 must not divide by zero: its
    # rows land in the last bucket with cum_frac pinned to 1.0
    df = spark.createDataFrame(
        [(1, "aa", 2.0, 10), (2, "aa", 1.0, 10), (3, "zz", 5.0, 0)],
        "id long, lang string, s double, w long")
    out = ccnet_buckets(df, "s", lang_col="lang", weight_col="w")
    got = {r.id: (r.bucket, r.cum_frac) for r in out.collect()}
    assert got[3] == ("tail", 1.0)
    assert got[1][0] == "head"
