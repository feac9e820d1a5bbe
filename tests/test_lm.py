"""functions/lm: bigram LM fluency scoring (CCNet-style quality
signal) — hand-computed expectations on tiny corpora."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream2segment_spark.functions import lm


def test_bigram_model_counts(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, None)],
        "doc_id long, text string")
    uni, bi, vocab = lm.bigram_model(docs, "text")
    assert vocab == 4   # the, cat, sat, ran
    assert {(r["w1"], r["cu"]) for r in uni.collect()} == \
        {("the", 2), ("cat", 2), ("sat", 1), ("ran", 1)}
    assert {(r["w1"], r["w2"], r["cb"]) for r in bi.collect()} == \
        {("the", "cat", 2), ("cat", "sat", 1), ("cat", "ran", 1)}


def test_lm_self_scores_hand_computed(spark):
    """Vocabulary {the,cat,sat,ran,solo} -> V = 5; doc 1 'the cat sat':
    p(cat|the) = (2+1)/(2+5) = 3/7, p(sat|cat) = (1+1)/(2+5) = 2/7 ->
    mean 5/14."""
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, None), (4, "solo")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           lm.lm_transition_scores(docs).collect()}
    assert out[1]["n_trans"] == 2
    assert out[1]["lm_score"] == pytest.approx((3 / 7 + 2 / 7) / 2, abs=1e-6)
    assert out[2]["lm_score"] == out[1]["lm_score"]  # symmetric corpus
    # null text and single-token docs: zero transitions, score 0
    assert (out[3]["n_trans"], out[3]["lm_score"]) == (0, 0.0)
    assert (out[4]["n_trans"], out[4]["lm_score"]) == (0, 0.0)
    assert len(out) == 4


def test_lm_cross_corpus_unseen_floor(spark):
    """Scoring against a model trained elsewhere: fully unseen
    histories and transitions fall to the smoothed floor 1/V, and no
    row is dropped."""
    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat")], "doc_id long, text string")
    model = lm.bigram_model(ref, "text")
    vocab = model[2]
    assert vocab == 5
    cand = spark.createDataFrame(
        [(10, "zz yy"), (11, "the cat")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           lm.lm_transition_scores(cand, model=model).collect()}
    assert out[10]["lm_score"] == pytest.approx(1 / vocab, abs=1e-6)
    # seen transition: p(cat|the) = (1+1)/(2+5)
    assert out[11]["lm_score"] == pytest.approx(2 / 7, abs=1e-6)


def test_lm_flags_disfluent_outlier(spark):
    """The signal does its job: a shuffled-vocabulary word salad scores
    below every natural sentence in a self-scored corpus."""
    natural = [(i, "the quick brown fox jumps over the lazy dog")
               for i in range(8)]
    docs = spark.createDataFrame(
        natural + [(99, "dog the over quick lazy jumps brown the fox")],
        "doc_id long, text string")
    rows = lm.lm_transition_scores(docs).collect()
    salad = next(r["lm_score"] for r in rows if r["doc_id"] == 99)
    for r in rows:
        if r["doc_id"] != 99:
            assert r["lm_score"] > salad
