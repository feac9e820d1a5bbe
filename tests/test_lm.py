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


def test_stupid_backoff_hand_computed(spark):
    """Corpus d1='a b a b', d2='a c': N=6, uni a:3 b:2 c:1,
    bi ab:2 ba:1 ac:1, tri aba:1 bab:1.
    d1: pos1 S(b|a)=2/3; pos2 S(a|a,b)=ct/c12=1/2; pos3 S(b|b,a)=1/1.
    mean 13/18. d2: S(c|a)=1/3."""
    docs = spark.createDataFrame([(1, "a b a b"), (2, "a c"), (3, None)],
                                 "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           lm.stupid_backoff_scores(docs).collect()}
    assert out[1]["n_trans"] == 3
    assert out[1]["sb_score"] == pytest.approx(13 / 18, abs=1e-6)
    assert out[2]["sb_score"] == pytest.approx(1 / 3, abs=1e-6)
    assert (out[3]["n_trans"], out[3]["sb_score"]) == (0, 0.0)


def test_stupid_backoff_backoff_levels(spark):
    """An unseen trigram with a seen bigram backs off once (alpha *
    S(c|b)); an unseen bigram with seen unigram backs off twice; a
    fully unseen word scores 0 (no OOV mass, by design)."""
    ref = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string")
    model = lm.trigram_model(ref, "text")
    uni, bi, tri, vocab, total = model
    assert (vocab, total) == (4, 6)
    cand = spark.createDataFrame(
        # d10: 'b c' seen bigram at pos1 -> S(c|b) = cb(bc)/cu(b) = 1/2
        # d11: 'c d' unseen bigram, seen d (cu=1) -> alpha * 1/6
        # d12: 'a zz' unseen word -> 0
        # d13: 'a b a': pos1 S(b|a)=2/2=1;
        #      pos2 trigram (a,b,a) unseen, bigram (b,a) unseen, 'a'
        #      seen -> alpha * (alpha * cu(a)/N) = 0.16 * 2/6
        [(10, "b c"), (11, "c d"), (12, "a zz"), (13, "a b a")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["sb_score"] for r in
           lm.stupid_backoff_scores(cand, model=model).collect()}
    assert out[10] == pytest.approx(1 / 2, abs=1e-6)
    assert out[11] == pytest.approx(0.4 * (1 / 6), abs=1e-6)
    assert out[12] == 0.0
    assert out[13] == pytest.approx(
        (1.0 + 0.4 * 0.4 * (2 / 6)) / 2, abs=1e-6)


def test_lm_unicode_tokenizer_scores_cjk(spark):
    """tokenizer='unicode' keeps CJK transitions alive end-to-end:
    ascii mode sees zero transitions (every CJK doc tokenizes empty),
    unicode mode trains and scores real ones."""
    from stream2segment_spark.functions.lm import lm_transition_scores
    docs = spark.createDataFrame(
        [(1, "東京 は 日本 の 首都"), (2, "東京 は 大きい 都市"),
         (3, "大阪 は 日本 の 都市")],
        "doc_id long, text string")
    ascii_out = {r["doc_id"]: r for r in
                 lm_transition_scores(docs).collect()}
    assert all(r["n_trans"] == 0 for r in ascii_out.values())
    uni_out = {r["doc_id"]: r for r in
               lm_transition_scores(docs, tokenizer="unicode").collect()}
    assert {k: r["n_trans"] for k, r in uni_out.items()} == \
        {1: 4, 2: 3, 3: 4}   # token count per doc minus one
    assert all(r["lm_score"] > 0 for r in uni_out.values())


def test_lm_model_meta_records_tokenizer(spark, tmp_path):
    from stream2segment_spark.functions.lm import (
        bigram_model, lm_model_tokenizer, save_bigram_model)
    docs = spark.createDataFrame([(1, "один два три")],
                                 "doc_id long, text string")
    p_ascii = str(tmp_path / "m_ascii")
    p_uni = str(tmp_path / "m_uni")
    save_bigram_model(bigram_model(docs), p_ascii)
    save_bigram_model(bigram_model(docs, tokenizer="unicode"), p_uni,
                      tokenizer="unicode")
    assert lm_model_tokenizer(p_ascii) == "ascii"
    assert lm_model_tokenizer(p_uni) == "unicode"


def test_empty_reference_model_raises(spark):
    """An explicitly-passed EMPTY reference model would divide 0/0 on
    any token-bearing doc — the API raises up front. Self-scoring an
    empty-tokenizing corpus stays well-defined (0.0 scores, pinned by
    test_lm_unicode_tokenizer_scores_cjk's ascii branch)."""
    from stream2segment_spark.functions.lm import (
        bigram_model, lm_transition_scores)
    empty = spark.createDataFrame([(1, None)], "doc_id long, text string")
    docs = spark.createDataFrame([(2, "real words to score here")],
                                 "doc_id long, text string")
    with pytest.raises(ValueError, match="empty vocabulary"):
        lm_transition_scores(docs, "doc_id", "text",
                             model=bigram_model(empty))
