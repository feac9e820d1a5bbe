"""Sketch operator tests (operators/sketch.py): HyperLogLog accuracy /
mergeability / grouping, Count-Min one-sided error and broadcast probe
plan, plus the null / empty / unseen edge cases the gate data can't
exercise."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from stream2segment_spark.operators.sketch import (
    cms_lookup, cms_sketch, hll_distinct, hll_estimate, hll_registers)


@pytest.fixture(scope="module")
def values(spark):
    # 4000 distinct ids, each appearing 1-3 times, across two groups.
    rows = [Row(grp=("a" if i % 2 == 0 else "b"), v=i)
            for i in range(4000) for _ in range(1 + i % 3)]
    return spark.createDataFrame(rows)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def test_hll_estimate_accuracy(values):
    out = {r["grp"]: r for r in
           hll_distinct(values, "v", ["grp"], m=256).collect()}
    # 2000 true distinct per group; se ~= 1.04/sqrt(256) = 6.5%. Allow 4 se.
    for grp, true in [("a", 2000), ("b", 2000)]:
        est = out[grp]["est_distinct"]
        assert abs(est - true) / true < 4 * 1.04 / math.sqrt(256), (grp, est)


def test_hll_duplicates_do_not_move_estimate(spark):
    base = spark.createDataFrame([Row(v=i) for i in range(500)])
    dup = base.union(base).union(base)
    e1 = hll_distinct(base, "v", m=64).collect()[0]["est_distinct"]
    e2 = hll_distinct(dup, "v", m=64).collect()[0]["est_distinct"]
    assert e1 == e2


def test_hll_registers_merge_by_max(values):
    """Sketch mergeability: registers of the union == element-wise max of
    the halves' registers — the property that makes HLL map-side
    combinable and cross-dataset unionable."""
    a = values.where(F.col("v") < 1000)
    b = values.where(F.col("v") >= 1000)
    merged = (hll_registers(a, "v", m=64)
              .unionByName(hll_registers(b, "v", m=64))
              .groupBy("register").agg(F.max("rho").alias("rho")))
    full = hll_registers(values, "v", m=64)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, full.collect()))


def test_hll_register_bounds(values):
    regs = hll_registers(values, "v", m=64).collect()
    assert all(0 <= r["register"] < 64 for r in regs)
    assert all(1 <= r["rho"] <= 55 for r in regs)  # p + 1 = 54 + 1


def test_hll_small_group_exactish(spark):
    """With n << m most registers are empty and the raw estimator biases
    high (documented: no linear-counting correction) — but n_regs counts
    exactly the occupied registers."""
    df = spark.createDataFrame([Row(v=i) for i in range(10)])
    out = hll_distinct(df, "v", m=1024).collect()[0]
    assert out["n_regs"] <= 10


def test_hll_bad_m_rejected(values):
    for m in (0, 1, 3, 63, 8192):
        with pytest.raises(ValueError):
            hll_registers(values, "v", m=m)


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 appears 300x, keys 1..99 appear (k % 7) + 1 times.
    rows = [Row(k=0)] * 300 + [Row(k=k) for k in range(1, 100)
                               for _ in range(k % 7 + 1)]
    return spark.createDataFrame(rows)


def test_cms_one_sided_error(skewed):
    sk = cms_sketch(skewed, "k", width=64, depth=3)
    items = skewed.select("k").distinct()
    est = {r["item"]: r["est_cnt"]
           for r in cms_lookup(sk, items, "k", width=64, depth=3).collect()}
    true = {r["k"]: r["cnt"] for r in
            skewed.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert all(est[k] >= true[k] for k in true)
    # CMS overcount is bounded by the colliding mass; with ~100 keys in
    # width 64 the min-over-3-rows overcount stays far below the naive
    # single-row expectation N/width (~10):
    assert est[0] - true[0] <= 2 * (skewed.count() // 64)


def test_cms_total_mass_per_row(skewed):
    sk = cms_sketch(skewed, "k", width=64, depth=3).collect()
    n = skewed.count()
    for d in range(3):
        assert sum(r["cnt"] for r in sk if r["row"] == d) == n


def test_cms_unseen_and_null(spark, skewed):
    sk = cms_sketch(skewed, "k", width=4096, depth=3)
    probe = spark.createDataFrame([Row(k=10_000_001), Row(k=None)])
    out = {r["item"]: r["est_cnt"]
           for r in cms_lookup(sk, probe, "k", width=4096, depth=3).collect()}
    # wide sketch -> the unseen key almost surely hits an empty bucket
    assert out[10_000_001] == 0
    # nulls are skipped at build; a null probe item estimates 0
    assert out.get(None, 0) == 0


def test_cms_null_values_skipped(spark):
    df = spark.createDataFrame([Row(k=1), Row(k=None), Row(k=None)])
    sk = cms_sketch(df, "k", width=16, depth=2)
    assert sum(r["cnt"] for r in sk.collect() if r["row"] == 0) == 1


def test_cms_probe_is_broadcast(skewed):
    sk = cms_sketch(skewed, "k", width=64, depth=3)
    plan = cms_lookup(sk, skewed, "k", width=64, depth=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cms_param_validation(skewed):
    with pytest.raises(ValueError):
        cms_sketch(skewed, "k", width=1, depth=3)
    with pytest.raises(ValueError):
        cms_sketch(skewed, "k", width=16, depth=0)


def test_hll_merge_lossless_and_estimate_equal(spark):
    """Merging per-partition sketches must give the identical estimate
    as sketching the union — the persist-then-merge contract."""
    from pyspark.sql import Row

    from stream2segment_spark.operators.sketch import hll_merge
    days = [spark.createDataFrame([Row(v=d * 1000 + i)
                                   for i in range(800)])
            for d in range(3)]
    merged = hll_merge(*[hll_registers(d, "v", m=64) for d in days])
    full = hll_registers(days[0].union(days[1]).union(days[2]), "v",
                         m=64)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, full.collect()))
    e1 = hll_estimate(merged, m=64).collect()[0]["est_distinct"]
    e2 = hll_estimate(full, m=64).collect()[0]["est_distinct"]
    assert e1 == e2


def test_hll_merge_needs_input():
    from stream2segment_spark.operators.sketch import hll_merge
    import pytest
    with pytest.raises(ValueError):
        hll_merge()


def test_hll_nulls_skipped(spark):
    df = spark.createDataFrame([Row(v=1), Row(v=None), Row(v=2)],
                               "v long")
    regs = hll_registers(df, "v", m=64).collect()
    assert len(regs) <= 2
    assert all(r["register"] is not None and r["rho"] is not None
               for r in regs)


# ---------------------------------------------------------------------------
# Equi-width histogram quantile sketch
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def prices(spark):
    # two groups with different shapes: uniform 0..999 and triangular-ish
    rows = [Row(grp="u", x=float(i % 1000)) for i in range(3000)]
    rows += [Row(grp="t", x=float(min(i % 100, 99 - i % 37)))
             for i in range(3000)]
    return spark.createDataFrame(rows)


def test_hist_quantile_error_bound(prices):
    from stream2segment_spark.operators.sketch import (
        hist_quantiles, hist_sketch)
    lo, hi, nb = 0.0, 1000.0, 200
    bw = (hi - lo) / nb
    h = hist_sketch(prices, "x", lo, hi, nb, ["grp"])
    est = {(r["grp"], r["q"]): r["q_value"]
           for r in hist_quantiles(h, (0.25, 0.5, 0.9), lo, hi, nb,
                                   ["grp"]).collect()}
    exact = {g: prices.where(F.col("grp") == g)
             .selectExpr("percentile(x, array(0.25, 0.5, 0.9)) p")
             .first()["p"] for g in ("u", "t")}
    for g in ("u", "t"):
        for q, ex in zip((0.25, 0.5, 0.9), exact[g]):
            assert abs(est[(g, q)] - ex) <= bw + 1e-9, (g, q, est[(g, q)], ex)


def test_hist_merge_lossless_and_clamping(prices, spark):
    from stream2segment_spark.operators.sketch import (
        hist_merge, hist_sketch)
    lo, hi, nb = 0.0, 1000.0, 64
    whole = hist_sketch(prices, "x", lo, hi, nb, ["grp"])
    even = hist_sketch(prices.where(F.col("x").cast("int") % 2 == 0),
                       "x", lo, hi, nb, ["grp"])
    odd = hist_sketch(prices.where(F.col("x").cast("int") % 2 != 0),
                      "x", lo, hi, nb, ["grp"])
    merged = hist_merge(even, odd, group_cols=["grp"])
    assert {tuple(r) for r in whole.collect()} == \
        {tuple(r) for r in merged.collect()}
    # out-of-range and null handling: clamps to edge bins, skips nulls
    df = spark.createDataFrame(
        [Row(x=-5.0), Row(x=2000.0), Row(x=None), Row(x=500.0)])
    h = {r["bin"]: r["cnt"]
         for r in hist_sketch(df, "x", lo, hi, nb).collect()}
    assert h == {0: 1, nb - 1: 1, nb // 2: 1}
    assert sum(h.values()) == 3  # null skipped, edges preserved


def test_hist_validation(prices):
    from stream2segment_spark.operators.sketch import (
        hist_merge, hist_quantiles, hist_sketch)
    with pytest.raises(ValueError, match="n_bins"):
        hist_sketch(prices, "x", 0.0, 1.0, 1)
    with pytest.raises(ValueError, match="hi > lo"):
        hist_sketch(prices, "x", 5.0, 5.0, 16)
    with pytest.raises(ValueError, match="quantiles"):
        hist_quantiles(prices, (0.0,), 0.0, 1.0, 16)
    with pytest.raises(ValueError, match="at least one"):
        hist_merge()


def test_hist_single_shuffle_plan(prices):
    # The sketch build must be ONE exchange (map-side partial count).
    from stream2segment_spark.operators.sketch import hist_sketch
    plan = hist_sketch(prices, "x", 0.0, 1000.0, 64,
                       ["grp"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_hist_matches_numpy_and_quantiles_monotone(spark):
    import numpy as np

    from stream2segment_spark.operators.sketch import (
        hist_quantiles, hist_sketch)
    rng = np.random.default_rng(11)
    xs = np.concatenate([rng.normal(40, 15, 1500),
                         rng.uniform(-20, 120, 500)])  # includes clamps
    lo, hi, nb = 0.0, 100.0, 50
    df = spark.createDataFrame([Row(x=float(v)) for v in xs])
    got = {r["bin"]: r["cnt"]
           for r in hist_sketch(df, "x", lo, hi, nb).collect()}
    edges = np.linspace(lo, hi, nb + 1)
    want = np.histogram(np.clip(xs, lo, np.nextafter(hi, lo)),
                        bins=edges)[0]
    for b in range(nb):
        assert got.get(b, 0) == int(want[b]), b
    qs = (0.05, 0.25, 0.5, 0.75, 0.95, 1.0)
    est = {r["q"]: r["q_value"]
           for r in hist_quantiles(hist_sketch(df, "x", lo, hi, nb),
                                   qs, lo, hi, nb).collect()}
    vals = [est[q] for q in qs]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:])), vals
    assert lo <= vals[0] and vals[-1] <= hi


def test_hist_cli(spark, tmp_path, capsys):
    import json

    from stream2segment_spark.cli import main as cli_main
    src = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [Row(g="a", x=float(i)) for i in range(100)]
    ).write.parquet(src)
    rc = cli_main(["hist", "-i", src, "--col", "x", "--bins", "50",
                   "--quantiles", "0.5,0.9"])
    assert rc == 0
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    med = next(r for r in rows if r["q"] == 0.5)
    assert abs(med["q_value"] - 49.5) <= (99 / 50) + 1e-9
    rc = cli_main(["hist", "-i", src, "--col", "x", "--group-by", "g"])
    assert rc == 0
    assert all(json.loads(l)["g"] == "a" for l in
               capsys.readouterr().out.strip().splitlines())
    assert cli_main(["hist", "-i", src, "--col", "nope"]) == 2
    assert cli_main(["hist", "-i", src, "--col", "x",
                     "--quantiles", "abc"]) == 2
    assert cli_main(["hist", "-i", src, "--col", "x",
                     "--lo", "5", "--hi", "5"]) == 2
