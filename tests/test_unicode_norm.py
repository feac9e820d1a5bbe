"""NFC normalization tests: three-engine agreement (pandas/unicodedata
vs DuckDB utf8proc), null passthrough, changed-flag semantics, and the
normalization-insensitive dedup fingerprint. All fixtures use explicit
codepoint escapes — source-literal accented text is ambiguous about
its own normalization form."""

from __future__ import annotations

import unicodedata

import duckdb
from pyspark.sql import functions as F

from stream2segment_spark.functions.unicode_norm import (
    add_nfc_fingerprint, nfc_changed, normalize_nfc)

DEC = "cafe\u0301"          # e + combining acute (decomposed)
COMP = "caf\u00e9"          # precomposed e-acute
CASES = [
    DEC,
    COMP,
    "A\u030Angstro\u0308m",   # ring + diaeresis, decomposed
    "\u1100\u1161\u11a8",     # Hangul jamo -> one syllable
    "plain ascii only",
    "",
]


def test_three_engine_agreement(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)],
                               "id long, t string")
    got = {r.id: r.n for r in
           df.select("id", normalize_nfc("t").alias("n")).collect()}
    for i, s in enumerate(CASES):
        py = unicodedata.normalize("NFC", s)
        duck = duckdb.sql("SELECT nfc_normalize(?)",
                          params=[s]).fetchone()[0]
        assert got[i] == py == duck, repr(s)
    assert got[0] == got[1] == COMP    # twins converge on composed


def test_null_and_changed(spark):
    df = spark.createDataFrame(
        [(1, DEC), (2, COMP), (3, None)], "id long, t string")
    out = {r.id: (r.n, r.c) for r in df.select(
        "id", normalize_nfc("t").alias("n"),
        nfc_changed("t").alias("c")).collect()}
    assert out[1] == (COMP, True)
    assert out[2] == (COMP, False)
    assert out[3] == (None, False)


def test_nfc_fingerprint_collides_twins(spark):
    df = spark.createDataFrame(
        [(1, f"x {DEC} y"), (2, f"x {COMP} y"),
         (3, "different"), (4, None)],
        "id long, t string")
    out = {r.id: r.nfc_fp for r in
           add_nfc_fingerprint(df, "t").collect()}
    assert out[1] == out[2]               # twins collide after NFC
    assert out[3] != out[1]
    assert out[4] is not None             # null -> '' convention
    raw = {r.id: r.fp for r in df.select(
        "id", F.md5(F.coalesce("t", F.lit(""))).alias("fp")).collect()}
    assert raw[1] != raw[2]               # and never on the raw hash


def test_normalize_plan_is_map_only(spark):
    # no shuffle in the normalize plan (map-only stage contract)
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)],
                               "id long, t string")
    plan = df.select(normalize_nfc("t")) \
             ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
