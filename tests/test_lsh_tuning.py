"""LSH tuning tests: plan feasibility and shape, S-curve probability
correctness (Spark expression == python == DuckDB SQL replay,
bit-for-bit), tuning-curve bucketing/aggregation, validation."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from stream2segment_spark.operators.lsh_tuning import (
    _s_curve, candidate_probability, candidate_probability_sql,
    lsh_error_rates, lsh_plan, lsh_tuning_curve)


def test_plan_feasible_and_threshold_sensitive():
    for t in (0.3, 0.5, 0.8):
        b, r = lsh_plan(t, 32)
        assert b >= 1 and r >= 1 and b * r <= 32
    # higher threshold -> steeper curve wanted -> more rows per band
    _, r_low = lsh_plan(0.3, 64)
    _, r_high = lsh_plan(0.8, 64)
    assert r_high > r_low


def test_error_rates_shape():
    fp, fn = lsh_error_rates(0.5, b=8, r=4)
    assert 0.0 < fp < 0.5 and 0.0 < fn < 0.5
    # more bands at fixed rows: curve shifts left -> more FP, less FN
    fp2, fn2 = lsh_error_rates(0.5, b=16, r=4)
    assert fp2 > fp and fn2 < fn


def test_plan_validation(spark):  # spark: F.lit needs an active session
    with pytest.raises(ValueError, match="threshold"):
        lsh_plan(1.0, 32)
    with pytest.raises(ValueError, match="n_perm"):
        lsh_plan(0.5, 0)
    with pytest.raises(ValueError, match="bands/rows"):
        candidate_probability(F.lit(0.5), 0, 4)
    with pytest.raises(ValueError, match="bands/rows"):
        candidate_probability_sql("x", 4, 0)


def test_probability_three_way_bit_equality(spark):
    js = [0.0, 0.05, 0.25, 0.5, 0.75, 0.9, 1.0]
    b, r = 8, 4
    df = spark.createDataFrame([(j,) for j in js], "j double")
    got = {r_.j: r_.p for r_ in df.select(
        "j", candidate_probability(F.col("j"), b, r).alias("p")).collect()}
    sql = candidate_probability_sql("j", b, r)
    duck = dict(duckdb.sql(
        "SELECT j, " + sql + " AS p FROM (SELECT unnest("
        + str(js) + "::DOUBLE[]) AS j)").fetchall())
    for j in js:
        py = 1.0 - (1.0 - j ** r) ** b
        assert got[j] == duck[j]  # bit-identical engines
        assert got[j] == pytest.approx(py, abs=1e-12)
        assert _s_curve(j, b, r) == pytest.approx(py, abs=1e-12)


def test_tuning_curve_buckets_and_sums(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0.05), (1, 3, 0.09), (2, 3, 0.55), (4, 5, 1.0)],
        "id_a long, id_b long, jaccard double")
    out = {r.bucket: r for r in
           lsh_tuning_curve(pairs, b=8, r=4).collect()}
    assert set(out) == {0, 5, 10}  # 0.05/0.09 -> 0; 0.55 -> 5; 1.0 -> 10
    assert out[0].n_pairs == 2 and out[10].n_pairs == 1
    p = lambda j: 1.0 - (1.0 - j ** 4) ** 8  # noqa: E731
    assert out[0].exp_cand == pytest.approx(p(0.05) + p(0.09), abs=1e-6)
    assert out[10].exp_cand == pytest.approx(1.0, abs=1e-9)
    assert out[5].bands == 8 and out[5].rows_per_band == 4


def test_plan_banded_divides_and_auto_bands(spark):
    from stream2segment_spark.operators.dedup import minhash_neardup_pairs
    from stream2segment_spark.operators.lsh_tuning import lsh_plan_banded
    for t in (0.3, 0.5, 0.8):
        b, r = lsh_plan_banded(t, 64)
        assert b * r == 64
    # banded plan never beats the unconstrained plan's error
    b, r = lsh_plan_banded(0.5, 60)
    fp, fn = lsh_error_rates(0.5, b, r)
    bu, ru = lsh_plan(0.5, 60)
    fpu, fnu = lsh_error_rates(0.5, bu, ru)
    assert 0.5 * fp + 0.5 * fn >= 0.5 * fpu + 0.5 * fnu - 1e-12
    # bands=None end-to-end: near-identical docs stay pairs
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
         (2, "alpha beta gamma delta epsilon zeta eta theta kappa"),
         (3, "completely different words entirely here now ok fine")],
        "doc_id long, text string")
    out = minhash_neardup_pairs(docs, "text", "doc_id",
                                bands=None, threshold=0.5).collect()
    assert {(r_.id_a, r_.id_b) for r_ in out} == {(1, 2)}
