"""DSIR importance-resampling tests (functions/dsir.py): feature
hashing determinism, smoothing edges, empty-doc handling, ratio-mode
integer exactness vs a pure-Python replay, log-mode agreement with
numpy, Gumbel selection reproducibility and input validation."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from stream2segment_spark.functions.dsir import (
    DEFAULT_SCALE, bucket_ratio_scores, dsir_pipeline, dsir_scores,
    dsir_select, hashed_ngram_features)

B = 64  # small bucket table so collisions actually occur in tests


def _bucket(gram: str, buckets: int = B, seed: str = "dsir") -> int:
    h = hashlib.md5(f"{seed}:{gram}".encode()).hexdigest()[:15]
    return int(h, 16) % buckets


def _grams(text: str) -> list[str]:
    toks = [t for t in "".join(
        c.lower() if c.isascii() and c.isalnum() else " "
        for c in text).split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


@pytest.fixture(scope="module")
def corpora(spark):
    target = spark.createDataFrame(
        [(0, "spark shuffles data by key"),
         (1, "spark broadcast joins avoid the shuffle"),
         (2, "partition pruning skips files")],
        ["doc_id", "text"])
    raw = spark.createDataFrame(
        [(10, "spark shuffles data by key often"),
         (11, "cats chase mice in the garden"),
         (12, "broadcast joins avoid the shuffle"),
         (13, ""),            # no tokens -> score 0, still selectable
         (14, None),          # NULL text behaves like empty
         (15, "partition pruning skips files and shuffles")],
        ["doc_id", "text"])
    return target, raw


def _py_scores(target_rows, raw_rows, buckets=B, scale=DEFAULT_SCALE):
    """Pure-Python replay of the ratio-mode pipeline."""
    tcnt: dict[int, int] = {}
    rcnt: dict[int, int] = {}
    feats: dict[int, dict[int, int]] = {}
    for _id, text in target_rows:
        for g in _grams(text or ""):
            tcnt[_bucket(g, buckets)] = tcnt.get(_bucket(g, buckets), 0) + 1
    for _id, text in raw_rows:
        f = feats.setdefault(_id, {})
        for g in _grams(text or ""):
            bk = _bucket(g, buckets)
            rcnt[bk] = rcnt.get(bk, 0) + 1
            f[bk] = f.get(bk, 0) + 1
    nt, nq = sum(tcnt.values()), sum(rcnt.values())
    bscore = {bk: (scale * (tcnt.get(bk, 0) + 1) * (nq + buckets))
              // ((cq + 1) * (nt + buckets))
              for bk, cq in rcnt.items()}
    return {(_id): sum(c * bscore[bk] for bk, c in f.items())
            for _id, f in feats.items()}


def test_ratio_mode_matches_python_replay(spark, corpora):
    target, raw = corpora
    tf = hashed_ngram_features(target, "doc_id", "text", buckets=B)
    rf = hashed_ngram_features(raw, "doc_id", "text", buckets=B)
    bs = bucket_ratio_scores(tf, rf, buckets=B)
    got = {r.doc_id: r.dsir_score for r in
           dsir_scores(raw, rf, bs, "doc_id").collect()}
    want = _py_scores([(r.doc_id, r.text) for r in target.collect()],
                      [(r.doc_id, r.text) for r in raw.collect()])
    assert got == want
    assert got[13] == 0 and got[14] == 0  # empty/NULL docs keep a 0 row


def test_features_deterministic_across_partitioning(spark, corpora):
    _, raw = corpora
    a = {(r.doc_id, r.bucket): r.cnt for r in hashed_ngram_features(
        raw.repartition(2), "doc_id", "text", buckets=B).collect()}
    b = {(r.doc_id, r.bucket): r.cnt for r in hashed_ngram_features(
        raw.repartition(7), "doc_id", "text", buckets=B).collect()}
    assert a == b and len(a) > 0


def test_single_token_doc_has_no_bigram(spark):
    df = spark.createDataFrame([(0, "hello")], ["doc_id", "text"])
    feats = hashed_ngram_features(df, "doc_id", "text", buckets=B)
    assert feats.agg(F.sum("cnt")).collect()[0][0] == 1  # unigram only


def test_target_like_docs_outrank_outliers(spark, corpora):
    target, raw = corpora
    out = dsir_pipeline(raw, target, "doc_id", "text", 3)
    picked = {r.doc_id for r in out.collect()}
    assert 11 not in picked          # the cats/garden outlier loses
    assert picked <= {10, 12, 15}    # target-vocabulary docs win


def test_log_mode_matches_math_log(spark, corpora):
    target, raw = corpora
    tf = hashed_ngram_features(target, "doc_id", "text", buckets=B)
    rf = hashed_ngram_features(raw, "doc_id", "text", buckets=B)
    bs = bucket_ratio_scores(tf, rf, buckets=B, mode="log")
    got = {r.doc_id: r.dsir_score for r in
           dsir_scores(raw, rf, bs, "doc_id", mode="log").collect()}
    # replay with math.log; bucket-level sums are tiny here, so a loose
    # tolerance absorbs summation-order ulps
    tcnt: dict[int, int] = {}
    rcnt: dict[int, int] = {}
    feats: dict[int, dict[int, int]] = {}
    for r in target.collect():
        for g in _grams(r.text or ""):
            tcnt[_bucket(g)] = tcnt.get(_bucket(g), 0) + 1
    for r in raw.collect():
        f = feats.setdefault(r.doc_id, {})
        for g in _grams(r.text or ""):
            bk = _bucket(g)
            rcnt[bk] = rcnt.get(bk, 0) + 1
            f[bk] = f.get(bk, 0) + 1
    nt, nq = sum(tcnt.values()), sum(rcnt.values())
    for _id, f in feats.items():
        want = sum(c * (math.log((tcnt.get(bk, 0) + 1) / (nt + B))
                        - math.log((rcnt[bk] + 1) / (nq + B)))
                   for bk, c in f.items())
        assert got[_id] == pytest.approx(want, rel=1e-12, abs=1e-12)


def test_gumbel_selection_reproducible_and_seeded(spark, corpora):
    target, raw = corpora
    tf = hashed_ngram_features(target, "doc_id", "text", buckets=B)
    rf = hashed_ngram_features(raw, "doc_id", "text", buckets=B)
    bs = bucket_ratio_scores(tf, rf, buckets=B, mode="log")
    sc = dsir_scores(raw, rf, bs, "doc_id", mode="log")
    a = {r.doc_id for r in dsir_select(
        sc, "doc_id", 3, method="gumbel", temperature=2.0).collect()}
    b = {r.doc_id for r in dsir_select(
        sc.repartition(5), "doc_id", 3, method="gumbel",
        temperature=2.0).collect()}
    assert a == b and len(a) == 3    # md5 noise: partitioning-invariant
    c = {r.doc_id for r in dsir_select(
        sc, "doc_id", 3, method="gumbel", temperature=2.0,
        seed="other").collect()}
    assert len(c) == 3               # different seed still yields k docs


def test_validation_errors(spark, corpora):
    target, raw = corpora
    tf = hashed_ngram_features(target, "doc_id", "text", buckets=B)
    rf = hashed_ngram_features(raw, "doc_id", "text", buckets=B)
    with pytest.raises(ValueError, match="mode"):
        bucket_ratio_scores(tf, rf, buckets=B, mode="nope")
    sc = dsir_scores(raw, rf, bucket_ratio_scores(tf, rf, buckets=B),
                     "doc_id")
    with pytest.raises(ValueError, match="method"):
        dsir_select(sc, "doc_id", 2, method="nope")


def test_dsir_cli_end_to_end(spark, corpora, tmp_path, capsys):
    import json

    from stream2segment_spark.cli import main as cli_main

    target, raw = corpora
    rawp = str(tmp_path / "raw.parquet")
    tgtp = str(tmp_path / "target.parquet")
    raw.write.parquet(rawp)
    target.write.parquet(tgtp)
    out = str(tmp_path / "picked.parquet")
    rc = cli_main(["dsir-select", "-i", rawp, "-t", tgtp, "-o", out,
                   "-k", "3", "--buckets", str(B)])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["selected"] == 3 and stats["mode"] == "ratio"
    back = spark.read.parquet(out)
    assert set(back.columns) == {"doc_id", "dsir_score"}
    assert back.count() == 3
    # missing column diagnostics exit 2
    assert cli_main(["dsir-select", "-i", rawp, "-t", tgtp, "-o", out,
                     "-k", "2", "--id-col", "nope"]) == 2
