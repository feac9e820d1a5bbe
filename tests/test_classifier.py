"""Distributed linear classifier (operators/classifier.py): learning on
a learnable target, partition-layout determinism, rounding semantics,
and validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream2segment_spark.operators.classifier import (
    _fast_sigmoid, _half_away, train_linear_classifier)
from stream2segment_spark.schema import load_table
from tests.conftest import SF_DIR_SMOKE


def _labeled(spark):
    emb = load_table(spark, SF_DIR_SMOKE, "embeddings")
    return emb.select(
        "vec_id", "embedding",
        (F.round(F.element_at(F.col("embedding"), 1).cast("double")
                 * 1000, 0).cast("long") > 0).cast("int").alias("y"))


def _acc(scored) -> float:
    return scored.select(F.avg(
        (F.col("pred") == F.col("y")).cast("double")).alias("a")) \
        .collect()[0]["a"]


def test_classifier_learns_the_target(spark):
    lab = _labeled(spark)
    s1, w1 = train_linear_classifier(lab, "vec_id", "embedding", "y",
                                     iters=1)
    s3, w3 = train_linear_classifier(lab, "vec_id", "embedding", "y",
                                     iters=3)
    a1, a3 = _acc(s1), _acc(s3)
    assert a3 >= a1 > 0.5            # better than chance, improving
    assert a3 > 0.85
    # the target is the sign of dim 1: that weight must dominate
    assert abs(w3[0]) == max(abs(v) for v in w3)


def test_classifier_partition_deterministic(spark):
    lab = _labeled(spark)
    _, w_a = train_linear_classifier(lab, "vec_id", "embedding", "y")
    _, w_b = train_linear_classifier(lab.repartition(13), "vec_id",
                                     "embedding", "y")
    assert w_a == w_b


def test_half_away_matches_sql_round():
    v = np.array([2.5, -2.5, 0.5, -0.5, 1.4, -1.4, 0.0])
    assert _half_away(v).tolist() == [3.0, -3.0, 1.0, -1.0, 1.0, -1.0, 0.0]


def test_fast_sigmoid_shape():
    z = np.array([0.0, 1e9, -1e9, 1.0, -1.0])
    s = _fast_sigmoid(z)
    assert s[0] == 0.5
    assert 0.999 < s[1] < 1.0 and 0.0 < s[2] < 0.001
    assert s[3] == 0.75 and s[4] == 0.25     # exact rational points


def test_classifier_validation(spark):
    lab = _labeled(spark)
    with pytest.raises(ValueError, match="iters"):
        train_linear_classifier(lab, "vec_id", "embedding", "y", iters=0)
    with pytest.raises(ValueError, match="lr"):
        train_linear_classifier(lab, "vec_id", "embedding", "y", lr=0.3)
    with pytest.raises(ValueError, match="non-empty"):
        train_linear_classifier(lab.limit(0), "vec_id", "embedding", "y")


def test_classify_cli_end_to_end(spark, tmp_path, capsys):
    import json

    from stream2segment_spark.cli import main as cli_main

    src = str(tmp_path / "in.parquet")
    _labeled(spark).write.parquet(src)
    out = str(tmp_path / "scored.parquet")
    rc = cli_main(["classify", "-i", src, "-o", out,
                   "--id-col", "vec_id", "--label-col", "y",
                   "--vec-col", "embedding", "--iters", "2"])
    assert rc == 0
    n = _labeled(spark).count()
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] == n and stats["train_accuracy"] > 0.8
    back = spark.read.parquet(out)
    assert {"vec_id", "y", "score", "pred"} <= set(back.columns)
    assert back.count() == n


def test_classify_cli_text_mode_and_validation(spark, tmp_path, capsys):
    import json

    from stream2segment_spark.cli import main as cli_main

    rows = [(i, ("great clean prose " if i % 2 else "zz xx qq ") * 5,
             i % 2) for i in range(40)]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string, y int") \
        .write.parquet(src)
    out = str(tmp_path / "scored.parquet")
    rc = cli_main(["classify", "-i", src, "-o", out,
                   "--label-col", "y", "--text-col", "text",
                   "--iters", "4"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["train_accuracy"] == 1.0   # trivially separable texts
    # exactly one of vec/text required
    assert cli_main(["classify", "-i", src, "-o", out,
                     "--label-col", "y"]) == 2
    assert cli_main(["classify", "-i", src, "-o", out, "--label-col", "y",
                     "--vec-col", "v", "--text-col", "text"]) == 2
    # missing column diagnosed
    assert cli_main(["classify", "-i", src, "-o", out,
                     "--label-col", "nope", "--text-col", "text"]) == 2


def test_score_with_weights_matches_training_scores(spark):
    """Inference under the returned weights reproduces training's own
    scored frame bit-for-bit (same quantization, same scoring UDF)."""
    from stream2segment_spark.operators.classifier import (
        score_with_weights, train_linear_classifier)
    rng = __import__("random").Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], i % 2)
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, v array<double>, y int")
    scored, weights = train_linear_classifier(df, "id", "v", "y", iters=3)
    want = {r.id: r.score for r in scored.collect()}
    got = {r.id: r.score for r in
           score_with_weights(df, "id", "v", weights).collect()}
    assert got == want
    # NULL vectors carry no score row; bad weights argued
    df2 = spark.createDataFrame([(99, None, 0)],
                                "id long, v array<double>, y int")
    assert score_with_weights(df2, "id", "v", weights).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError, match="weights"):
        score_with_weights(df, "id", "v", [])


def test_save_load_classifier_roundtrip(tmp_path):
    from stream2segment_spark.operators.classifier import (
        load_classifier, save_classifier)
    p = str(tmp_path / "clf.json")
    save_classifier([3, -2, 0], p, scale=500, wscale=2000,
                    meta={"features": "hashed_ngram", "dim": 3,
                          "tokenizer": "unicode"})
    d = load_classifier(p)
    assert d["weights"] == [3, -2, 0]
    assert (d["scale"], d["wscale"]) == (500, 2000)
    assert d["meta"]["tokenizer"] == "unicode"
    bad = str(tmp_path / "bad.json")
    open(bad, "w").write('{"model": "other"}')
    import pytest as _pt
    with _pt.raises(ValueError, match="linear-quantized"):
        load_classifier(bad)


def test_funnel_classifier_gate_and_cli_lifecycle(spark, tmp_path, capsys):
    """train (s2s classify --weights-out) -> gate (s2s curate
    --classifier): junk-labeled docs drop, prose-labeled docs survive;
    the funnel stage reproduces a direct score+filter."""
    import json

    from stream2segment_spark.cli import main as cli_main
    from stream2segment_spark.examples.corpus_pipeline import curate_corpus

    prose = ("the quick brown fox jumps over the lazy dog and it is "
             "a fine day for running in the field ")
    junk = "zz xx qq kk ww vv jj zz xx qq kk ww vv jj "
    train_rows = [(i, (prose if i % 2 else junk) * 3, i % 2)
                  for i in range(40)]
    src = str(tmp_path / "train.parquet")
    spark.createDataFrame(train_rows, "doc_id long, text string, y int") \
        .write.parquet(src)
    model = str(tmp_path / "clf.json")
    rc = cli_main(["classify", "-i", src, "-o",
                   str(tmp_path / "scored.parquet"),
                   "--label-col", "y", "--text-col", "text",
                   "--iters", "4", "--weights-out", model])
    assert rc == 0
    capsys.readouterr()

    corpus_rows = [(i, (prose if i < 20 else junk) * 3, "s")
                   for i in range(40)]
    corpus = spark.createDataFrame(corpus_rows,
                                   "doc_id long, text string, source string")
    weights = json.load(open(model))["weights"]
    out, funnel = curate_corpus(
        corpus, languages=("en", "und"), min_quality=0.0,
        token_band=(1, 100_000), max_top_token_frac=1.0,
        classifier_weights=weights, min_classifier_score=0.5)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert kept and kept <= set(range(20))       # junk gated out
    no_gate, _ = curate_corpus(
        corpus, languages=("en", "und"), min_quality=0.0,
        token_band=(1, 100_000), max_top_token_frac=1.0)
    assert no_gate.count() > out.count()         # the gate is load-bearing

    # CLI end-to-end with --classifier
    corpus_pq = str(tmp_path / "corpus.parquet")
    corpus.write.parquet(corpus_pq)
    outdir = str(tmp_path / "curated")
    rc = cli_main(["curate", "-i", corpus_pq, "-o", outdir,
                   "--languages", "en,und", "--min-quality", "0",
                   "--min-tokens", "1",
                   "--classifier", model])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["filtered"] <= 20
    # bad model path diagnosed, not raised
    rc = cli_main(["curate", "-i", corpus_pq, "-o", outdir,
                   "--classifier", str(tmp_path / "nope.json")])
    assert rc == 2
    assert "cannot load classifier" in capsys.readouterr().err


def test_curate_classifier_grid_and_recipe_guards(spark, tmp_path, capsys):
    """The curate gate must replay the model's quantization grid and
    reject models whose feature recipe it cannot reproduce."""
    import json

    from stream2segment_spark.cli import main as cli_main
    from stream2segment_spark.operators.classifier import save_classifier

    corpus = str(tmp_path / "c.parquet")
    words = ("alpha", "beta", "gamma", "delta", "epsilon",
             "zeta", "eta", "theta", "iota", "kappa")
    spark.createDataFrame(
        [(i, f"the quick brown {words[i]} fox jumps over the lazy dog",
          "s") for i in range(10)],
        "doc_id long, text string, source string").write.parquet(corpus)
    outdir = str(tmp_path / "out")

    # vector-trained model: rejected with a diagnostic, not mis-scored
    vec_model = str(tmp_path / "vec.json")
    save_classifier([1, 2, 3], vec_model,
                    meta={"features": "vector", "vec_col": "v"})
    rc = cli_main(["curate", "-i", corpus, "-o", outdir,
                   "--classifier", vec_model])
    assert rc == 2
    assert "cannot reproduce" in capsys.readouterr().err

    # non-default hashing recipe (n=4, custom seed): THREADED into the
    # gate, not rejected (ADVICE r7 — the guard used to pin n/seed to
    # the embedding defaults; now the recipe travels with the model)
    odd = str(tmp_path / "odd.json")
    save_classifier([1] * 64, odd,
                    meta={"features": "hashed_ngram", "dim": 64,
                          "n": 4, "seed": "s4"})
    rc = cli_main(["curate", "-i", corpus, "-o", outdir,
                   "--languages", "en,und", "--min-quality", "0",
                   "--min-tokens", "1", "--classifier", odd,
                   "--min-classifier-score", "0"])
    assert rc == 0
    capsys.readouterr()

    # non-dict JSON: diagnosed (ValueError path), no traceback
    lst = str(tmp_path / "list.json")
    open(lst, "w").write("[1, 2]")
    rc = cli_main(["curate", "-i", corpus, "-o", outdir,
                   "--classifier", lst])
    assert rc == 2
    assert "cannot load classifier" in capsys.readouterr().err

    # malformed weights payload ("weights": 5): load_classifier argues
    # (exit-2 diagnostic), no TypeError traceback (ADVICE r7)
    mal = str(tmp_path / "mal.json")
    open(mal, "w").write('{"model": "linear-quantized", "weights": 5}')
    rc = cli_main(["curate", "-i", corpus, "-o", outdir,
                   "--classifier", mal])
    assert rc == 2
    assert "non-empty list" in capsys.readouterr().err

    # non-default grid IS threaded: direct funnel call with the grid
    # recorded by the model must reproduce score_with_weights' floor
    from stream2segment_spark.examples.corpus_pipeline import curate_corpus
    from stream2segment_spark.functions.embeddings import (
        hashed_ngram_embeddings)
    from stream2segment_spark.operators.classifier import (
        score_with_weights)
    docs = spark.read.parquet(corpus)
    weights = [7] * 64
    emb = hashed_ngram_embeddings(docs.select("doc_id", "text"),
                                  "text", "doc_id", dim=64)
    direct = score_with_weights(emb, "doc_id", "embedding", weights,
                                scale=100, wscale=100)
    lo, hi = direct.agg(F.min("score"), F.max("score")).collect()[0]
    out_hi, _ = curate_corpus(
        docs, languages=("en", "und"), min_quality=0.0,
        token_band=(1, 100_000), max_top_token_frac=1.0,
        classifier_weights=weights, min_classifier_score=hi + 1e-9,
        classifier_scale=100, classifier_wscale=100)
    out_lo, _ = curate_corpus(
        docs, languages=("en", "und"), min_quality=0.0,
        token_band=(1, 100_000), max_top_token_frac=1.0,
        classifier_weights=weights, min_classifier_score=lo,
        classifier_scale=100, classifier_wscale=100)
    assert out_hi.count() == 0 and out_lo.count() == 10

    # --weights-out into a missing directory: argued up front
    rc = cli_main(["classify", "-i", corpus, "-o",
                   str(tmp_path / "s.parquet"), "--label-col", "doc_id",
                   "--text-col", "text",
                   "--weights-out", str(tmp_path / "no" / "m.json")])
    assert rc == 2
    assert "does not exist" in capsys.readouterr().err


def test_classifier_gate_kwargs_recipe_threading(spark, tmp_path):
    """classifier_gate_kwargs is the library-level recipe guard
    (ADVICE r7): it derives dim/n/seed/tokenizer/grid from the saved
    model, and the funnel gate embedded with that recipe reproduces a
    direct n=4/seed='s4' score+filter exactly."""
    import pytest

    from stream2segment_spark.examples.corpus_pipeline import curate_corpus
    from stream2segment_spark.functions.embeddings import (
        hashed_ngram_embeddings)
    from stream2segment_spark.operators.classifier import (
        classifier_gate_kwargs, score_with_weights)

    model = {"model": "linear-quantized", "weights": [5] * 32,
             "scale": 200, "wscale": 300,
             "meta": {"features": "hashed_ngram", "dim": 32,
                      "n": 4, "seed": "s4", "tokenizer": "unicode"}}
    kw = classifier_gate_kwargs(model, min_score=0.4)
    assert kw == {"classifier_weights": [5] * 32,
                  "min_classifier_score": 0.4,
                  "classifier_tokenizer": "unicode",
                  "classifier_ngram": 4, "classifier_seed": "s4",
                  "classifier_scale": 200, "classifier_wscale": 300}

    words = ("alpha", "beta", "gamma", "delta", "epsilon",
             "zeta", "eta", "theta", "iota", "kappa")
    docs = spark.createDataFrame(
        [(i, f"the quick brown {words[i]} fox jumps over the lazy dog")
         for i in range(10)], "doc_id long, text string")
    emb = hashed_ngram_embeddings(docs, "text", "doc_id", dim=32,
                                  n=4, seed="s4", tokenizer="unicode")
    direct = score_with_weights(emb, "doc_id", "embedding", [5] * 32,
                                scale=200, wscale=300)
    scores = sorted(r.score for r in direct.collect())
    floor = scores[len(scores) // 2]  # median as the gate threshold
    kw["min_classifier_score"] = floor
    out, _ = curate_corpus(docs, languages=("en", "und"),
                           min_quality=0.0, token_band=(1, 100_000),
                           max_top_token_frac=1.0, **kw)
    want = {r.doc_id for r in direct.filter(F.col("score") >= floor)
            .select("doc_id").collect()}
    assert {r.doc_id for r in out.select("doc_id").collect()} == want

    # guard: non-hash features rejected at the library level
    with pytest.raises(ValueError, match="cannot reproduce"):
        classifier_gate_kwargs({"weights": [1], "meta":
                                {"features": "vector"}})
    # guard: meta dim disagreeing with the weight vector = corrupt file
    with pytest.raises(ValueError, match="corrupt"):
        classifier_gate_kwargs({"weights": [1, 2], "meta":
                                {"features": "hashed_ngram", "dim": 9}})


def test_score_with_weights_dim_mismatch_message(spark):
    """A feature/weight width mismatch surfaces as a clear ValueError
    message, not an opaque numpy matmul shape error (ADVICE r7)."""
    import pytest

    from stream2segment_spark.operators.classifier import (
        score_with_weights)
    df = spark.createDataFrame([(1, [0.5, 0.5, 0.5])],
                               "id long, v array<double>")
    with pytest.raises(Exception, match="dim 3 but the model has 2"):
        score_with_weights(df, "id", "v", [1, 1]).collect()


def test_load_classifier_payload_validation(tmp_path):
    """Malformed weights / scales raise ValueError (ADVICE r7), so the
    CLI's except clause maps them to the exit-2 diagnostic."""
    import json

    import pytest

    from stream2segment_spark.operators.classifier import load_classifier

    def _dump(payload):
        p = str(tmp_path / "m.json")
        json.dump(payload, open(p, "w"))
        return p

    base = {"model": "linear-quantized"}
    with pytest.raises(ValueError, match="non-empty list"):
        load_classifier(_dump({**base, "weights": 5}))
    with pytest.raises(ValueError, match="non-empty list"):
        load_classifier(_dump({**base, "weights": []}))
    with pytest.raises(ValueError, match="non-empty list"):
        load_classifier(_dump({**base, "weights": [1, "x"]}))
    with pytest.raises(ValueError, match="non-empty list"):
        load_classifier(_dump({**base, "weights": [True]}))
    with pytest.raises(ValueError, match="positive integer"):
        load_classifier(_dump({**base, "weights": [1], "scale": 0}))
    assert load_classifier(_dump({**base, "weights": [1, -2]}))[
        "weights"] == [1, -2]
