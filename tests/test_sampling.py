"""Deterministic sampling/split tests: reproducibility, fraction accuracy,
stratified rates, id-keyed stability (no cross-split leakage on re-runs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream2segment_spark.functions.sampling import (
    deterministic_sample, deterministic_split, hash_bucket)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20_000).withColumnRenamed("id", "doc_id")


def test_split_fractions_and_determinism(spark, ids):
    out = deterministic_split(ids, "doc_id").groupBy("split").count()
    counts = {r.split: r["count"] for r in out.collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 20_000 == pytest.approx(0.8, abs=0.02)
    assert counts["val"] / 20_000 == pytest.approx(0.1, abs=0.01)
    assert counts["test"] / 20_000 == pytest.approx(0.1, abs=0.01)
    # identical assignment on a differently-partitioned re-run
    a = {r.doc_id: r.split for r in deterministic_split(
        ids.repartition(3), "doc_id").collect()}
    b = {r.doc_id: r.split for r in deterministic_split(
        ids.repartition(17), "doc_id").collect()}
    assert a == b


def test_split_seed_changes_assignment(spark, ids):
    a = deterministic_split(ids, "doc_id", seed="s1")
    b = deterministic_split(ids, "doc_id", seed="s2")
    both = (a.withColumnRenamed("split", "sa")
            .join(b.withColumnRenamed("split", "sb"), "doc_id"))
    frac_same = both.filter("sa = sb").count() / 20_000
    # independent assignments agree ~sum(f_i^2) = 0.66, not ~1
    assert 0.55 < frac_same < 0.75


def test_partial_fractions_leave_remainder_null(spark, ids):
    out = deterministic_split(ids, "doc_id", {"train": 0.5})
    n_null = out.filter(F.col("split").isNull()).count()
    assert n_null / 20_000 == pytest.approx(0.5, abs=0.02)
    with pytest.raises(ValueError, match="sum"):
        deterministic_split(ids, "doc_id", {"a": 0.9, "b": 0.2})


def test_sample_plain_and_stratified(spark, ids):
    n = deterministic_sample(ids, "doc_id", 0.25).count()
    assert n / 20_000 == pytest.approx(0.25, abs=0.02)
    strat = ids.withColumn(
        "lang", F.when(F.col("doc_id") % 4 == 0, "en").otherwise("de"))
    got = deterministic_sample(
        strat, "doc_id", {"en": 0.5, "de": 0.1}, strata_col="lang")
    rates = {r.lang: r["count"] for r in got.groupBy("lang").count().collect()}
    assert rates["en"] / 5_000 == pytest.approx(0.5, abs=0.04)
    assert rates["de"] / 15_000 == pytest.approx(0.1, abs=0.02)
    # unlisted stratum drops
    got2 = deterministic_sample(
        strat, "doc_id", {"en": 0.5}, strata_col="lang")
    assert got2.filter("lang = 'de'").count() == 0


def test_bucket_is_pushdown_friendly(spark, ids):
    # pure expression: the filter must not introduce a shuffle
    plan = deterministic_sample(ids, "doc_id", 0.1)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
