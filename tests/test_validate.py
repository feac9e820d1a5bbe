"""operators/validate.py + 's2s validate': rule semantics, null/empty
edge cases, single-pass plan, CLI exit codes."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row, functions as F

from stream2segment_spark.operators.validate import validate_table


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        [Row(id=1, status="A", score=0.5, email="a@x.org"),
         Row(id=2, status="B", score=0.9, email="b@y.net"),
         Row(id=3, status="A", score=None, email="not-an-email"),
         Row(id=4, status="Z", score=1.5, email=None)])


def test_rule_semantics(table):
    rep = {(r["col_name"], r["rule"]): r for r in validate_table(table, {
        "id": {"unique": True, "min_ge": 1},
        "status": {"allowed_values": ["A", "B"]},
        "score": {"not_null_frac": 0.9, "max_le": 1.0},
        "email": {"matches": r"^[^@\s]+@[^@\s]+\.[a-z]+$"},
    }).collect()}
    assert rep[("id", "unique")]["ok"] is True
    assert rep[("id", "min_ge")]["ok"] is True
    assert rep[("status", "allowed_values")]["ok"] is False
    assert rep[("status", "allowed_values")]["value"] == 1.0  # the 'Z'
    assert rep[("score", "not_null_frac")]["ok"] is False
    assert abs(rep[("score", "not_null_frac")]["value"] - 0.75) < 1e-12
    assert rep[("score", "max_le")]["ok"] is False     # the 1.5
    assert rep[("email", "matches")]["ok"] is False    # 'not-an-email'
    assert rep[("email", "matches")]["value"] == 1.0   # NULL not counted


def test_duplicates_and_empty(spark, table):
    dup = table.unionByName(table)
    rep = {r["rule"]: r for r in
           validate_table(dup, {"id": {"unique": True}}).collect()}
    assert rep["unique"]["ok"] is False and rep["unique"]["value"] == 4.0
    empty = spark.createDataFrame([], "id int, score double")
    rep = {r["rule"]: r for r in validate_table(
        empty, {"score": {"not_null_frac": 0.5, "min_ge": 0}}).collect()}
    assert rep["not_null_frac"]["ok"] is True   # vacuous on empty
    assert rep["min_ge"]["ok"] is True          # no observed min


def test_contract_typos_fail_loudly(table):
    with pytest.raises(ValueError, match="absent column"):
        validate_table(table, {"nope": {"unique": True}})
    with pytest.raises(ValueError, match="unknown rule"):
        validate_table(table, {"id": {"uniq": True}})


def test_validate_cli(spark, table, tmp_path, capsys):
    from stream2segment_spark.cli import main as cli_main
    src = str(tmp_path / "t.parquet")
    table.write.parquet(src)
    good = tmp_path / "good.json"
    good.write_text(json.dumps({"id": {"unique": True}}))
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"status": {"allowed_values": ["A", "B"]}}))
    typo = tmp_path / "typo.json"
    typo.write_text(json.dumps({"id": {"uniq": True}}))
    assert cli_main(["validate", "-i", src, "-r", str(good)]) == 0
    out = [json.loads(l) for l in
           capsys.readouterr().out.strip().splitlines()]
    assert out[0]["ok"] is True
    assert cli_main(["validate", "-i", src, "-r", str(bad)]) == 1
    capsys.readouterr()
    assert cli_main(["validate", "-i", src, "-r", str(typo)]) == 2


def test_profile_emit_rules_then_validate(spark, table, tmp_path, capsys):
    """The profile -> contract -> validate loop: rules inferred from a
    table pass against the SAME table, and catch a degraded ingest."""
    from pyspark.sql import Row

    from stream2segment_spark.cli import main as cli_main
    src = str(tmp_path / "t.parquet")
    table.write.parquet(src)
    rules = str(tmp_path / "rules.json")
    assert cli_main(["profile", "-i", src, "--emit-rules", rules]) == 0
    capsys.readouterr()
    contract = json.loads(open(rules).read())
    assert contract["score"]["max_le"] == 1.5
    assert contract["id"]["min_ge"] == 1.0
    assert 0 < contract["score"]["not_null_frac"] <= 0.75
    # the source table satisfies its own inferred contract
    assert cli_main(["validate", "-i", src, "-r", rules]) == 0
    capsys.readouterr()
    # a degraded ingest (all scores null, out-of-range id) fails it
    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame(
        [Row(id=0, status="A", score=None, email=None)] * 4,
        table.schema).write.parquet(bad)
    assert cli_main(["validate", "-i", bad, "-r", rules]) == 1


def test_matches_is_full_string_match(spark):
    """'matches' must assert a FULL-string match: an unanchored pattern
    like '[0-9]+' must not pass values that merely CONTAIN a digit."""
    from pyspark.sql import Row as R
    df = spark.createDataFrame([R(v="123"), R(v="a1b"), R(v="456")])
    rep = {r["rule"]: r for r in
           validate_table(df, {"v": {"matches": "[0-9]+"}}).collect()}
    assert rep["matches"]["ok"] is False
    assert rep["matches"]["value"] == 1.0        # only 'a1b' violates
    # already-anchored patterns keep working (double anchors are inert)
    rep = {r["rule"]: r for r in
           validate_table(df, {"v": {"matches": "^[0-9a-z]+$"}}).collect()}
    assert rep["matches"]["ok"] is True
