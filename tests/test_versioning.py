"""Corpus snapshot diff tests (operators/versioning.py + 's2s diff'):
classification of every status, null/shared-column handling, separator
injection resistance, and the CLI JSON contract."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row, functions as F

from stream2segment_spark.operators.versioning import (
    content_fingerprint, corpus_diff, diff_summary)


@pytest.fixture(scope="module")
def snapshots(spark):
    old = spark.createDataFrame([
        Row(doc_id=1, text="same"), Row(doc_id=2, text="will change"),
        Row(doc_id=3, text="will vanish"), Row(doc_id=5, text=None),
    ])
    new = spark.createDataFrame([
        Row(doc_id=1, text="same"), Row(doc_id=2, text="changed!"),
        Row(doc_id=4, text="brand new"), Row(doc_id=5, text=None),
    ])
    return old, new


def test_all_statuses(snapshots):
    old, new = snapshots
    out = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added", 5: "unchanged"}


def test_summary_counts(snapshots):
    old, new = snapshots
    counts = {r["status"]: r["n_docs"]
              for r in diff_summary(corpus_diff(old, new)).collect()}
    assert counts == {"unchanged": 2, "changed": 1, "removed": 1,
                      "added": 1}


def test_null_vs_empty_text_unchanged_vs_changed(spark):
    old = spark.createDataFrame([Row(doc_id=1, text=None)],
                                "doc_id long, text string")
    new = spark.createDataFrame([Row(doc_id=1, text="")],
                                "doc_id long, text string")
    # documented: NULL fingerprints as empty string -> these compare equal
    out = corpus_diff(old, new).collect()[0]
    assert out["status"] == "unchanged"


def test_multi_column_separator_no_collision(spark):
    # ('ab', 'c') must not fingerprint equal to ('a', 'bc')
    a = content_fingerprint([F.lit("ab"), F.lit("c")])
    b = content_fingerprint([F.lit("a"), F.lit("bc")])
    row = spark.range(1).select(a.alias("a"), b.alias("b")).collect()[0]
    assert row["a"] != row["b"]


def test_default_content_cols_are_shared_and_sorted(spark):
    old = spark.createDataFrame([Row(doc_id=1, text="x", extra_old=1,
                                     b="b", a="a")])
    new = spark.createDataFrame([Row(doc_id=1, a="a", b="b", text="x",
                                     extra_new=2)])
    # shared non-id columns {a, b, text} match in both -> unchanged,
    # regardless of column order and one-sided extras
    assert corpus_diff(old, new).collect()[0]["status"] == "unchanged"


def test_no_content_cols_raises(spark):
    old = spark.createDataFrame([Row(doc_id=1, only_old="x")])
    new = spark.createDataFrame([Row(doc_id=1, only_new="y")])
    with pytest.raises(ValueError):
        corpus_diff(old, new)


def test_cli_diff(spark, tmp_path, capsys):
    from stream2segment_spark.cli import main
    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    out_p = str(tmp_path / "diff")
    spark.createDataFrame([Row(doc_id=i, text=f"doc {i}")
                           for i in range(10)]).write.parquet(old_p)
    spark.createDataFrame(
        [Row(doc_id=i, text=("doc %d!" % i if i < 2 else f"doc {i}"))
         for i in range(1, 12)]).write.parquet(new_p)
    rc = main(["diff", old_p, new_p, "--cols", "text", "-o", out_p])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res == {"added": 2, "removed": 1, "changed": 1,
                   "unchanged": 8}
    written = spark.read.parquet(out_p)
    assert written.count() == 12
