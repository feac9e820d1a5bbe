"""functions/bpe: distributed BPE tokenizer training."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream2segment_spark.functions import bpe


def test_bpe_canonical_example(spark):
    """The Sennrich et al. running example shape: frequent 'low' drives
    l+o then lo+w; merge order and final segmentations are checked
    end-to-end."""
    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string")
    merges, words = bpe.bpe_train(docs, "text", 5)
    assert [(m[0], m[1]) for m in merges[:2]] == [("l", "o"), ("lo", "w")]
    seg = {r["word"]: r["syms"] for r in words.collect()}
    assert seg["low"] == ["low"]
    assert seg["lower"][0] == "low"
    # counts are corpus-weighted: 'low' appears 4x standalone + prefixes
    assert merges[0][2] == 6
    words.unpersist()


def test_bpe_greedy_run_semantics(spark):
    """Runs of an identical symbol merge alternately from the left —
    'aaa' + (a,a) -> [aa, a]; 'aaaa' -> [aa, aa]."""
    df = spark.createDataFrame([(["a"] * 3,), (["a"] * 4,)],
                               "syms array<string>")
    out = [r[0] for r in
           df.select(bpe.apply_merge(F.col("syms"), "a", "a")).collect()]
    assert out == [["aa", "a"], ["aa", "aa"]]


def test_bpe_early_stop_and_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    # single-char words: no pairs ever -> zero merges, chars survive
    merges, words = bpe.bpe_train(docs, "text", 3)
    assert merges == []
    assert {r["word"]: r["syms"] for r in words.collect()} == \
        {"a": ["a"], "b": ["b"]}
    words.unpersist()
    with pytest.raises(ValueError, match="n_merges"):
        bpe.bpe_train(docs, "text", 0)


def test_bpe_segment_matches_training_table(spark):
    """bpe_segment on the training corpus reproduces the trained words
    table segmentation for every word occurrence."""
    docs = spark.createDataFrame(
        [(1, "banana band bandana"), (2, "banana banana ban")],
        "doc_id long, text string")
    merges, words = bpe.bpe_train(docs, "text", 4)
    table = {r["word"]: r["syms"] for r in words.collect()}
    words.unpersist()
    segged = docs.select(
        F.explode(bpe.bpe_segment(F.col("text"), merges)).alias("syms"),
    ).collect()
    rebuilt = ["".join(r["syms"]) for r in segged]
    for syms, word in zip((r["syms"] for r in segged), rebuilt):
        assert syms == table[word], (word, syms, table[word])


def test_bpe_null_text_ignored(spark):
    docs = spark.createDataFrame([(1, None), (2, "ab ab")],
                                 "doc_id long, text string")
    merges, words = bpe.bpe_train(docs, "text", 1)
    assert merges == [("a", "b", 2)]
    words.unpersist()


def test_bpe_segment_udf_matches_expression_form(spark):
    """The closure-UDF segmenter and the expression-fold segmenter agree
    on every doc (rank-priority encoding == in-order application: later
    merges can never recreate an earlier merge's pair)."""
    docs = spark.createDataFrame(
        [(1, "banana band bandana aaa aaaa"),
         (2, "Banana!  ban AND band."), (3, None)],
        "doc_id long, text string")
    merges, words = bpe.bpe_train(docs, "text", 6)
    words.unpersist()
    expr = docs.select("doc_id",
                       bpe.bpe_segment(F.col("text"), merges).alias("s"))
    udf = docs.select("doc_id",
                      bpe.bpe_segment_udf(merges)(F.col("text")).alias("s"))
    a = {r["doc_id"]: r["s"] for r in expr.collect()}
    b = {r["doc_id"]: r["s"] for r in udf.collect()}
    assert a == b
    assert a[3] == []          # null text -> no words


def test_bpe_train_persist_false_leaves_no_cache(spark):
    docs = spark.createDataFrame([(1, "ab ab abc")],
                                 "doc_id long, text string")
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    merges, words = bpe.bpe_train(docs, "text", 2, persist=False)
    words.collect()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert after == before
    # and the result matches the persisted path
    m2, w2 = bpe.bpe_train(docs, "text", 2)
    assert merges == m2
    assert sorted(map(tuple, words.collect())) == \
        sorted(map(tuple, w2.collect()))
    w2.unpersist()


def test_bpe_train_checkpoint_cadence_invariant(spark):
    """Plan-truncation cadence never changes results — only plan size.
    (The cadence exists because persist-only rounds OOM the driver on
    the plan tree string at ~48 merges.)"""
    docs = spark.createDataFrame(
        [(1, "banana band bandana low lower lowest")],
        "doc_id long, text string")
    a, wa = bpe.bpe_train(docs, "text", 9, checkpoint_every=2)
    b, wb = bpe.bpe_train(docs, "text", 9, checkpoint_every=100)
    assert a == b
    assert sorted(map(tuple, wa.collect())) == \
        sorted(map(tuple, wb.collect()))
    wa.unpersist()
    wb.unpersist()
    with pytest.raises(ValueError, match="checkpoint_every"):
        bpe.bpe_train(docs, "text", 2, checkpoint_every=0)
    with pytest.raises(ValueError, match="checkpoint_every"):
        bpe.bpe_train_batched(docs, "text", 2, checkpoint_every=-1)


def test_bpe_collected_matches_canonical(spark):
    """The collected (in-memory merge loop) trainer reproduces the
    distributed canonical merge sequence and final segmentation exactly
    — stressed with a tiny {a,b,c} alphabet so merges collide on
    surface forms, pairs zero out and reappear (the lazy-deletion heap
    paths), and identical-symbol runs exercise the greedy rewrite."""
    import random
    rng = random.Random(7)
    corpus = " ".join(
        "".join(rng.choice("aabbc") for _ in range(rng.randint(1, 9)))
        for _ in range(120))
    docs = spark.createDataFrame(
        [(1, corpus), (2, "low low low lower lowest new newer"),
         (3, None)],
        "doc_id long, text string")
    canon, w0 = bpe.bpe_train(docs, "text", 24)
    want = {r["word"]: r["syms"] for r in w0.collect()}
    w0.unpersist()
    got, w1 = bpe.bpe_train_collected(docs, "text", 24)
    assert got == canon
    assert {r["word"]: r["syms"] for r in w1.collect()} == want


def test_bpe_collected_early_stop_caps_and_validation(spark):
    docs = spark.createDataFrame([(1, "ab ab a b")],
                                 "doc_id long, text string")
    merges, words = bpe.bpe_train_collected(docs, "text", 10)
    # 'ab' merges, then nothing is left to pair
    assert merges == [("a", "b", 2)]
    assert {r["word"]: r["syms"] for r in words.collect()} == \
        {"ab": ["ab"], "a": ["a"], "b": ["b"]}
    # the cap REFUSES (3 distinct words > 2) rather than truncating
    with pytest.raises(ValueError, match="max_words"):
        bpe.bpe_train_collected(docs, "text", 2, max_words=2)
    with pytest.raises(ValueError, match="n_merges"):
        bpe.bpe_train_collected(docs, "text", 0)
    with pytest.raises(ValueError, match="max_words"):
        bpe.bpe_train_collected(docs, "text", 1, max_words=0)


def test_bpe_batched_rounds(spark):
    """Batched training: batch=1 reproduces the canonical sequence;
    larger batches pick only non-interacting pairs per round (no symbol
    shared within a round's chosen set) and every merge has a positive
    count."""
    docs = spark.createDataFrame(
        [(1, "low low low lower lowest new newer newest wide wider")],
        "doc_id long, text string")
    canon, w0 = bpe.bpe_train(docs, "text", 6)
    w0.unpersist()
    one, w1 = bpe.bpe_train_batched(docs, "text", 6, batch=1)
    w1.unpersist()
    assert one == canon
    got, w4 = bpe.bpe_train_batched(docs, "text", 6, batch=4)
    assert len(got) == 6 and all(c > 0 for _, _, c in got)
    # reconstruct round boundaries: groups of <=4; within each round no
    # symbol (left, right or merged) repeats
    for start in range(0, len(got), 4):
        used = set()
        for left, right, _ in got[start:start + 4]:
            assert left not in used and right not in used, got
            used.update((left, right, left + right))
    # segmentation is still a valid partition of every word
    for r in w4.collect():
        assert "".join(r["syms"]) == r["word"]
    w4.unpersist()
    import pytest as _pt
    with _pt.raises(ValueError, match="batch"):
        bpe.bpe_train_batched(docs, "text", 2, batch=0)


def test_vocab_join_token_counts_match_python_bpe(spark):
    """The corpus_pack_bpe counting shape: doc BPE-token counts via the
    trained-vocab length join must equal a pure-Python sequential-merge
    replay applied per word occurrence."""
    from pyspark.sql import functions as F
    from stream2segment_spark.functions import bpe
    from stream2segment_spark.operators.dedup import word_tokens

    texts = ["low lower lowest", "new newer newest low",
             "the low new low", "", None, "aaa aa a"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges, words = bpe.bpe_train(docs, "text", 4, persist=False)

    # pure-Python sequential in-order application (apply_merge semantics)
    def seq_encode(word):
        syms = list(word)
        for left, right, _ in merges:
            out, pend = [], None
            for s in syms:
                if pend is None:
                    pend = s
                elif pend == left and s == right:
                    out.append(left + right)
                    pend = None
                else:
                    out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            syms = out
        return syms

    import re
    want = {}
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w]
        want[i] = sum(len(seq_encode(w)) for w in toks)

    vocab = words.select("word", F.size("syms").cast("long").alias("n_syms"))
    dw = docs.select(
        "doc_id",
        F.explode_outer(word_tokens(F.coalesce("text", F.lit("")))).alias("word"))
    got = {r.doc_id: r.n_tok for r in
           dw.join(F.broadcast(vocab), "word", "left")
             .groupBy("doc_id")
             .agg(F.coalesce(F.sum("n_syms"), F.lit(0)).cast("long")
                   .alias("n_tok")).collect()}
    assert got == want
    # empty/null docs kept with zero tokens (explode_outer + left join)
    assert got[3] == 0 and got[4] == 0
