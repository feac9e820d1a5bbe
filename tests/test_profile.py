"""profile_table tests (operators/profile.py + 's2s profile'): typed
min/max vs lexicographic, null accounting, HLL estimate sanity, top-k
tie-breaking, unknown-column errors, two-job plan shape, CLI output."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from stream2segment_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def table(spark):
    rows = [Row(k=i, cat=("x" if i % 3 == 0 else "y"),
                num=(None if i % 10 == 0 else i - 50))
            for i in range(100)]
    return spark.createDataFrame(rows)


def test_profile_basics(table):
    out = {r["col_name"]: r for r in
           profile_table(table, ["k", "cat", "num"]).collect()}
    assert out["k"]["n_rows"] == 100 and out["k"]["n_nulls"] == 0
    assert out["num"]["n_nulls"] == 10
    # typed (numeric) min/max, not lexicographic: min(num) = -49, not '-1...'
    assert out["num"]["min_str"] == "-49" and out["num"]["max_str"] == "49"
    assert out["cat"]["min_str"] == "x" and out["cat"]["max_str"] == "y"
    # top value of cat is 'y' (66 rows vs 34)
    assert out["cat"]["top_value"] == "y" and out["cat"]["top_count"] == 66


def test_profile_distinct_estimate(spark):
    # n >> m: the raw-estimator regime (no linear-counting correction —
    # documented in operators/sketch.py); se ~ 1.04/sqrt(256) = 6.5%
    df = spark.range(5000).selectExpr("id AS k")
    out = profile_table(df, ["k"], hll_m=256).collect()[0]
    assert abs(out["n_distinct_est"] - 5000) / 5000 < 4 * 1.04 / 16


def test_profile_topk_ties_break_on_value(spark):
    df = spark.createDataFrame(
        [Row(c=v) for v in ["b", "a", "b", "a", "c"]])
    out = profile_table(df, ["c"], top_k=3).orderBy("top_rank").collect()
    assert [(r["top_value"], r["top_rank"]) for r in out] == \
        [("a", 1), ("b", 2), ("c", 3)]


def test_profile_unknown_column(table):
    with pytest.raises(ValueError, match="nope"):
        profile_table(table, ["nope"])


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([Row(k=1, v=None), Row(k=2, v=None)],
                               "k long, v string")
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    v = out["v"]
    assert v["n_nulls"] == 2 and v["min_str"] is None
    assert v["n_distinct_est"] is None and v["top_value"] is None


def test_cli_profile(spark, tmp_path, capsys):
    from stream2segment_spark.cli import main
    p = str(tmp_path / "t")
    spark.createDataFrame([Row(doc_id=i, lang=("en" if i % 2 else "de"))
                           for i in range(20)]).write.parquet(p)
    rc = main(["profile", "-i", p, "--top", "1"])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    by_col = {d["col_name"]: d for d in lines}
    assert by_col["lang"]["top_count"] == 10
    assert by_col["doc_id"]["n_nulls"] == 0
