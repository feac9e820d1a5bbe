"""operators/stats.py: exact single-pass correlation matrix — accuracy
vs numpy, lossless moment merging, degenerate columns, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from stream2segment_spark.operators.stats import (
    corr_from_moments, corr_matrix_exact, merge_moments, moment_sums)


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(50.0, 10.0, 800).round(2)
    y = (0.6 * x + rng.normal(0.0, 5.0, 800)).round(2)
    z = rng.uniform(0.0, 1.0, 800).round(2)
    return spark.createDataFrame(
        [Row(i=int(i), x=float(a), y=float(b), z=float(c))
         for i, (a, b, c) in enumerate(zip(x, y, z))])


SCALES = {"x": 2, "y": 2, "z": 2}


def test_corr_matches_numpy(frame):
    got = {(r["col_x"], r["col_y"]): r["corr"]
           for r in corr_matrix_exact(frame, SCALES).collect()}
    pdf = frame.toPandas()
    for (a, b), c in got.items():
        want = np.corrcoef(pdf[a], pdf[b])[0, 1]
        assert abs(c - want) < 1e-9, (a, b, c, want)
    assert got[("x", "y")] > 0.5  # the engineered correlation is there


def test_moment_merge_lossless(frame):
    whole = moment_sums(frame, SCALES)
    parts = [moment_sums(frame.where(F.col("i") % 3 == k), SCALES)
             for k in range(3)]
    merged = merge_moments(*parts)
    assert whole.collect() == merged.collect()  # decimal bit equality
    assert corr_from_moments(whole, list(SCALES)).collect() == \
        corr_from_moments(merged, list(SCALES)).collect()


def test_zero_variance_and_nulls(spark):
    df = spark.createDataFrame(
        [Row(a=1.0, b=2.0), Row(a=1.0, b=3.0), Row(a=1.0, b=None)])
    out = {(r["col_x"], r["col_y"]): r
           for r in corr_matrix_exact(df, {"a": 2, "b": 2}).collect()}
    r = out[("a", "b")]
    assert r["n"] == 2          # the null row is dropped from the set
    assert r["corr"] is None    # zero variance -> NULL, not NaN/crash


def test_validation(frame):
    with pytest.raises(ValueError, match="at least 2"):
        moment_sums(frame, {"x": 2})
    with pytest.raises(ValueError, match="at least one"):
        merge_moments()


def test_single_pass_plan(frame):
    plan = moment_sums(frame, SCALES) \
        ._jdf.queryExecution().executedPlan().toString()
    # one partial+final aggregate pair around a single exchange; no join
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan


def test_grouped_corr(spark):
    import numpy as np
    rng = np.random.default_rng(3)
    rows = []
    for g, rho in (("a", 0.9), ("b", -0.9)):
        x = rng.normal(0, 1, 500)
        y = rho * x + np.sqrt(1 - rho * rho) * rng.normal(0, 1, 500)
        rows += [Row(g=g, x=round(float(a), 3), y=round(float(b), 3))
                 for a, b in zip(x, y)]
    df = spark.createDataFrame(rows)
    got = {r["g"]: r["corr"] for r in corr_matrix_exact(
        df, {"x": 3, "y": 3}, ["g"]).collect()}
    assert got["a"] > 0.8 and got["b"] < -0.8
    # grouped merge is lossless too
    m = [moment_sums(df.where(F.col("x") > 0), {"x": 3, "y": 3}, ["g"]),
         moment_sums(df.where(F.col("x") <= 0), {"x": 3, "y": 3}, ["g"])]
    whole = moment_sums(df, {"x": 3, "y": 3}, ["g"])
    merged = merge_moments(*m, group_cols=["g"])
    key = lambda r: r["g"]  # noqa: E731
    assert sorted(whole.collect(), key=key) == \
        sorted(merged.collect(), key=key)


def test_corr_cli(spark, tmp_path, capsys):
    import json

    from stream2segment_spark.cli import main as cli_main
    src = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [Row(g="a", x=float(i), y=float(2 * i)) for i in range(50)]
    ).write.parquet(src)
    rc = cli_main(["corr", "-i", src, "--cols", "x,y", "--scale", "2"])
    assert rc == 0
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 1 and abs(rows[0]["corr"] - 1.0) < 1e-12
    rc = cli_main(["corr", "-i", src, "--cols", "x,y",
                   "--group-by", "g"])
    assert rc == 0
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert rows[0]["g"] == "a"
    assert cli_main(["corr", "-i", src, "--cols", "x"]) == 2
    assert cli_main(["corr", "-i", src, "--cols", "x,nope"]) == 2


def test_long_fast_path_bit_equals_decimal(frame):
    """int64 per-row products + DECIMAL sums reconstruct the SAME
    DECIMAL(38,0) moment row as the all-decimal path — names, types
    and values."""
    fast = moment_sums(frame, SCALES, method="long")
    slow = moment_sums(frame, SCALES, method="decimal")
    assert [(f.name, f.dataType) for f in fast.schema] == \
        [(f.name, f.dataType) for f in slow.schema]
    assert fast.collect() == slow.collect()
    assert (corr_matrix_exact(frame, SCALES, method="long").collect()
            == corr_matrix_exact(frame, SCALES, method="decimal")
            .collect())


def test_long_fast_path_never_wraps(spark):
    """Values whose per-row product cannot fit int64 must never corrupt
    the sums. Since r6 (ADVICE), method='long' carries a per-row range
    guard: operands beyond ±floor(sqrt(2^63-1)) route through the
    decimal multiply, so oversized magnitudes SUCCEED exactly instead
    of raising ARITHMETIC_OVERFLOW mid-job; with ANSI off method='long'
    still selects the decimal path wholesale."""
    big = 4.0e9   # q = 4e11 at scale 2; q*q ~ 1.6e23 >> 2^63
    df = spark.createDataFrame(
        [Row(a=big, b=big), Row(a=big + 1, b=big - 1)])
    want = (int(big * 100) * int(big * 100)
            + int((big + 1) * 100) * int((big - 1) * 100))
    row = moment_sums(df, {"a": 2, "b": 2}, method="long").collect()[0]
    assert int(row["s_a_b"]) == want      # guard routed rows to decimal
    row = moment_sums(df, {"a": 2, "b": 2}, method="decimal").collect()[0]
    assert int(row["s_a_b"]) == want
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        row = moment_sums(df, {"a": 2, "b": 2}, method="long").collect()[0]
        assert int(row["s_a_b"]) == want      # decimal fallback kicked in
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_long_fast_path_grouped_and_merge(spark, frame):
    """Grouped long-path moments merge losslessly, same as decimal."""
    g = frame.withColumn("grp", (F.col("i") % 2).cast("int"))
    fast = moment_sums(g, SCALES, ["grp"], method="long")
    slow = moment_sums(g, SCALES, ["grp"], method="decimal")
    key = lambda r: r["grp"]  # noqa: E731
    assert sorted(fast.collect(), key=key) == \
        sorted(slow.collect(), key=key)
    # summing the two group rows reproduces the whole-frame row
    whole = moment_sums(frame, SCALES, method="long")
    m = merge_moments(fast.drop("grp"))
    assert m.collect() == whole.collect()


def test_moment_sums_long_handles_oversized_magnitudes(spark):
    """r6 ADVICE regression: quantized magnitudes above ~3e9 previously
    raised ARITHMETIC_OVERFLOW mid-job under ANSI with method='long';
    the per-row range guard now routes those rows through the decimal
    multiply — same exact sums, no failure."""
    from stream2segment_spark.operators.stats import moment_sums
    vals = [(6.0e9, 1.0), (7.1e9, 2.0), (-8.3e9, 3.0), (2.0, 4.0)]
    big = spark.createDataFrame(vals, "x double, y double")
    lo = moment_sums(big, {"x": 0, "y": 0}, method="long").collect()[0]
    de = moment_sums(big, {"x": 0, "y": 0}, method="decimal").collect()[0]
    assert lo == de
    assert int(lo["s_x_x"]) == sum(int(x) ** 2 for x, _ in vals)
