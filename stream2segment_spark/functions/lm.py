"""Bigram language-model fluency scoring for corpus quality filtering
(beyond-reference, LLM-pipeline): the CCNet-style signal — score each
document by how predictable its word transitions are under an n-gram
model trained on a reference corpus — without an external LM binary.

Model: add-one (Laplace) smoothed bigram transition probabilities over
:func:`operators.dedup.word_tokens` tokens,

    p(w2 | w1) = (c(w1, w2) + 1) / (c(w1) + V)

with ``c`` corpus counts and ``V`` the unigram vocabulary size. A
document's score is the MEAN transition probability over its token
stream (not log-perplexity: ``log`` is not bit-portable across libms,
and the mean keeps every step one IEEE +,/ chain, exactly replayable in
SQL — for FILTERING, which is rank-based, the two orderings agree on
what they punish: improbable transitions).

Determinism at the ulp level: per-document summation is an explicit
left-to-right fold over transitions sorted by position (``F.aggregate``
over ``array_sort(collect_list(...))``), because a plain ``sum()``
aggregate adds in partition order — nondeterministic for doubles. The
DuckDB oracle replays the identical fold with ``list_reduce(list(p
ORDER BY pos), ...)`` (reduce seeds with the first element; seeding the
Spark fold with 0.0 is exact because 0.0 + x == x for the positive
probabilities here).

Scale: two map-side-combined count shuffles build the model (unigrams,
bigrams — vocabulary-bounded outputs); scoring is two keyed joins
(transition stream against the count tables; stopword-bigram skew is
AQE territory) and one per-document aggregate. Only the scalar ``V``
crosses the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream2segment_spark.operators.dedup import get_tokenizer


def _transitions(docs: DataFrame, text_col: str,
                 id_col: str | None = None,
                 tokenizer: str = "ascii") -> DataFrame:
    """One row per adjacent token pair: ``([id,] pos, w1, w2)`` with
    ``pos`` the 0-based transition index inside the document (``id``
    omitted when counting, kept when scoring).

    The token array is STAGED in its own projection before the pair
    lambda reads it — referencing the tokenizer expression directly
    inside the HOF lambda re-tokenizes the text PER ELEMENT (measured:
    15 s instead of ~2 s for the gate entry at sf0.1; the same
    single-tokenize lesson the text_analysis plan assert pins)."""
    keep = [F.col(id_col)] if id_col else []
    tok_expr, _ = get_tokenizer(tokenizer)
    staged = docs.select(
        *keep,
        tok_expr(F.coalesce(F.col(text_col), F.lit("")))
        .alias("__toks"))
    toks = F.col("__toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda i: F.struct(i.alias("pos"),
                                       F.get(toks, i).alias("w1"),
                                       F.get(toks, i + 1).alias("w2")))
    ).otherwise(F.array().cast(
        "array<struct<pos:int,w1:string,w2:string>>"))
    out = staged.select(*keep, F.explode(pairs).alias("t"))
    return out.select(*([id_col] if id_col else []),
                      "t.pos", "t.w1", "t.w2")


def bigram_model(docs: DataFrame, text_col: str = "text",
                 tokenizer: str = "ascii",
                 persists: list | None = None,
                 ) -> tuple[DataFrame, DataFrame, int]:
    """Train the counts: returns ``(unigrams, bigrams, vocab_size)``
    with ``unigrams = (w1, cu)``, ``bigrams = (w1, w2, cb)``. Both
    frames are lazy and vocabulary-bounded; ``vocab_size`` is the one
    scalar that crosses the driver.

    ``persists``: when a list is passed, the count frames are persisted
    (vocabulary-sized — NEVER corpus-sized, so the cache is scale-safe)
    and appended for the caller to release. Scoring joins each count
    frame several times; un-cached, every join branch re-tokenizes the
    whole training corpus (Catalyst shares no subplans across
    branches). The frames are materialized eagerly (count) so racing
    downstream branches cannot each recompute the subtree before the
    cache fills — the sequenced-fill lesson of ngram_jaccard_pairs."""
    tok_expr, _ = get_tokenizer(tokenizer)
    tok = (docs.select(F.explode(tok_expr(
        F.coalesce(F.col(text_col), F.lit("")))).alias("w1")))
    uni = tok.groupBy("w1").agg(F.count("*").alias("cu"))
    bi = (_transitions(docs, text_col, tokenizer=tokenizer)
          .groupBy("w1", "w2").agg(F.count("*").alias("cb")))
    if persists is not None:
        uni, bi = uni.persist(), bi.persist()
        persists.extend([uni, bi])
        bi.count()  # sequence the cache fill
    vocab = uni.count()
    return uni, bi, vocab


def _context_triples(docs: DataFrame, text_col: str,
                     id_col: str | None = None,
                     tokenizer: str = "ascii") -> DataFrame:
    """One row per PREDICTED token (positions 1..n-1): ``([id,] pos, a,
    b, c)`` where ``c`` is the predicted token, ``b`` its predecessor
    and ``a`` the token before that (NULL at position 1 — bigram-only
    context). Tokens staged first (the per-element HOF lesson)."""
    keep = [F.col(id_col)] if id_col else []
    tok_expr, _ = get_tokenizer(tokenizer)
    staged = docs.select(
        *keep,
        tok_expr(F.coalesce(F.col(text_col), F.lit("")))
        .alias("__toks"))
    toks = F.col("__toks")
    trip = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda j: F.struct(
                        j.alias("pos"),
                        F.when(j >= 2, F.get(toks, j - 2)).alias("a"),
                        F.get(toks, j - 1).alias("b"),
                        F.get(toks, j).alias("c")))
    ).otherwise(F.array().cast(
        "array<struct<pos:int,a:string,b:string,c:string>>"))
    out = staged.select(*keep, F.explode(trip).alias("t"))
    return out.select(*([id_col] if id_col else []),
                      "t.pos", "t.a", "t.b", "t.c")


def trigram_model(docs: DataFrame, text_col: str = "text",
                  tokenizer: str = "ascii",
                  persists: list | None = None,
                  ) -> tuple[DataFrame, DataFrame, DataFrame, int, int]:
    """Counts for stupid-backoff scoring: ``(unigrams, bigrams,
    trigrams, vocab_size, total_tokens)`` — unigrams ``(w1, cu)``,
    bigrams ``(w1, w2, cb)``, trigrams ``(w1, w2, w3, ct)``. Two
    scalars cross the driver; the count tables stay distributed.

    ``persists``: persist + eagerly fill the three count frames
    (vocabulary-sized, scale-safe) and append them for the caller to
    release — see :func:`bigram_model`. The stupid-backoff scorer joins
    ``bi`` and ``uni`` TWICE each; un-cached that is six corpus
    tokenizations in one scoring plan."""
    tok_expr, _ = get_tokenizer(tokenizer)
    tok = (docs.select(F.explode(tok_expr(
        F.coalesce(F.col(text_col), F.lit("")))).alias("w1")))
    uni = tok.groupBy("w1").agg(F.count("*").alias("cu"))
    bi = (_transitions(docs, text_col, tokenizer=tokenizer)
          .groupBy("w1", "w2").agg(F.count("*").alias("cb")))
    tri = (_context_triples(docs, text_col, tokenizer=tokenizer)
           .filter(F.col("a").isNotNull())
           .groupBy(F.col("a").alias("w1"), F.col("b").alias("w2"),
                    F.col("c").alias("w3"))
           .agg(F.count("*").alias("ct")))
    if persists is not None:
        uni, bi, tri = uni.persist(), bi.persist(), tri.persist()
        persists.extend([uni, bi, tri])
        bi.count()
        tri.count()  # sequence the cache fills
    counts = uni.agg(F.count("*"), F.sum("cu")).collect()[0]
    return uni, bi, tri, int(counts[0]), int(counts[1] or 0)


def stupid_backoff_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    model: tuple[DataFrame, DataFrame, DataFrame, int, int] | None = None,
    alpha: float = 0.4,
    persists: list | None = None,
    tokenizer: str = "ascii",
) -> DataFrame:
    """Per-document mean stupid-backoff trigram score (Brants et al.
    2007 — the web-scale LM: no discount normalization, pure count
    ratios with a fixed backoff factor):

        S(c | a, b) = ct(abc)/cb(ab)        if ct > 0
                      alpha * S(c | b)       otherwise
        S(c | b)    = cb(bc)/cu(b)          if cb > 0
                      alpha * cu(c)/N        otherwise

    Position 1 (no ``a`` context) starts at the bigram level. Every
    step is one IEEE /,* chain over exact integer counts — replayable
    in SQL; the per-document mean uses the same position-ordered fold
    as :func:`lm_transition_scores`. Scoring against a reference
    :func:`trigram_model`, fully unseen words contribute 0 (stupid
    backoff reserves no OOV mass — by design, documented).

    The scoring plan joins ``uni`` and ``bi`` TWICE each (c12/c23,
    cub/cuc); un-cached, Spark recomputes each branch per join — six
    corpus tokenizations in one self-scored plan. Pass a list as
    ``persists`` to have a self-trained model's count frames persisted
    and eagerly filled (:func:`trigram_model`) and surfaced for the
    caller to release, the curate_corpus contract. The gate entries
    now persist too (r9 opt round — the former persist-free discipline
    cost a measured ~2x; the pin is vocabulary-sized and the bench/
    driver clear the session cache between entries)."""
    if model is None:
        model = trigram_model(docs, text_col, tokenizer=tokenizer,
                              persists=persists)
    uni, bi, tri, _vocab, total = model
    tr = _context_triples(docs, text_col, id_col, tokenizer=tokenizer)
    c12 = bi.select(F.col("w1").alias("a"), F.col("w2").alias("b"),
                    F.col("cb").alias("c12"))
    c23 = bi.select(F.col("w1").alias("b"), F.col("w2").alias("c"),
                    F.col("cb").alias("c23"))
    cub = uni.select(F.col("w1").alias("b"), F.col("cu").alias("cub"))
    cuc = uni.select(F.col("w1").alias("c"), F.col("cu").alias("cuc"))
    ct = tri.select(F.col("w1").alias("a"), F.col("w2").alias("b"),
                    F.col("w3").alias("c"), "ct")
    j = (tr.join(ct, ["a", "b", "c"], "left")
         .join(c12, ["a", "b"], "left")
         .join(c23, ["b", "c"], "left")
         .join(cub, ["b"], "left")
         .join(cuc, ["c"], "left"))
    al = F.lit(float(alpha))
    s1 = F.when(F.col("cuc").isNotNull(),
                al * (F.col("cuc") / F.lit(total))).otherwise(F.lit(0.0))
    bo = F.when(F.col("c23").isNotNull(),
                F.col("c23") / F.col("cub")).otherwise(s1)
    sb = F.when(F.col("a").isNull(), bo) \
          .otherwise(F.when(F.col("ct").isNotNull(),
                            F.col("ct") / F.col("c12"))
                     .otherwise(al * bo))
    p = j.select(id_col, "pos", sb.alias("p"))
    agg = (p.groupBy(id_col)
           .agg(F.count("*").cast("int").alias("n_trans"),
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("pos", "p"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["p"]).alias("s")))
    return (docs.select(id_col)
            .join(agg, [id_col], "left")
            .select(id_col,
                    F.round(F.coalesce(F.col("s") / F.col("n_trans"),
                                       F.lit(0.0)), 6).alias("sb_score"),
                    F.coalesce("n_trans", F.lit(0)).alias("n_trans"))
            .select(id_col, "n_trans", "sb_score"))


def save_bigram_model(model: tuple[DataFrame, DataFrame, int],
                      path: str, tokenizer: str = "ascii") -> None:
    """Persist a trained model as a directory: ``unigrams.parquet``,
    ``bigrams.parquet`` and ``meta.json`` (vocab size) — plain formats
    any Spark/DuckDB consumer can open, like the warehouse tables."""
    import json
    import os
    uni, bi, vocab = model
    os.makedirs(path, exist_ok=True)
    uni.write.mode("overwrite").parquet(os.path.join(path,
                                                     "unigrams.parquet"))
    bi.write.mode("overwrite").parquet(os.path.join(path,
                                                    "bigrams.parquet"))
    with open(os.path.join(path, "meta.json"), "w",
              encoding="utf-8") as fh:
        json.dump({"vocab_size": int(vocab), "model": "bigram-addone",
                   "tokenizer": tokenizer}, fh)


def load_bigram_model(spark, path: str,
                      ) -> tuple[DataFrame, DataFrame, int]:
    """Inverse of :func:`save_bigram_model`."""
    import json
    import os
    with open(os.path.join(path, "meta.json"), encoding="utf-8") as fh:
        meta = json.load(fh)
    if meta.get("model") != "bigram-addone":
        raise ValueError(
            f"{path!r} is not a bigram-addone model dir (meta: {meta})")
    return (spark.read.parquet(os.path.join(path, "unigrams.parquet")),
            spark.read.parquet(os.path.join(path, "bigrams.parquet")),
            int(meta["vocab_size"]))


def save_trigram_model(
        model: tuple[DataFrame, DataFrame, DataFrame, int, int],
        path: str, tokenizer: str = "ascii") -> None:
    """Persist a :func:`trigram_model` like :func:`save_bigram_model`,
    plus ``trigrams.parquet`` and the token total in ``meta.json``."""
    import json
    import os
    uni, bi, tri, vocab, total = model
    os.makedirs(path, exist_ok=True)
    uni.write.mode("overwrite").parquet(os.path.join(path,
                                                     "unigrams.parquet"))
    bi.write.mode("overwrite").parquet(os.path.join(path,
                                                    "bigrams.parquet"))
    tri.write.mode("overwrite").parquet(os.path.join(path,
                                                     "trigrams.parquet"))
    with open(os.path.join(path, "meta.json"), "w",
              encoding="utf-8") as fh:
        json.dump({"vocab_size": int(vocab),
                   "total_tokens": int(total),
                   "model": "trigram-sb",
                   "tokenizer": tokenizer}, fh)


def lm_model_tokenizer(path: str) -> str:
    """Tokenizer mode a saved model directory was trained with
    ('ascii' for models saved before the mode existed). Scoring MUST
    pass this same mode: a mismatched tokenizer makes every token of
    the scored text OOV relative to the counts — a silent mis-score,
    not an error."""
    import json
    import os
    with open(os.path.join(path, "meta.json"), encoding="utf-8") as fh:
        return json.load(fh).get("tokenizer", "ascii")


def load_lm_model(spark, path: str):
    """Load either model kind by its meta: returns ``("bigram", model)``
    or ``("trigram", model)`` — the CLI dispatches on the tag."""
    import json
    import os
    with open(os.path.join(path, "meta.json"), encoding="utf-8") as fh:
        meta = json.load(fh)
    kind = meta.get("model")
    if kind == "bigram-addone":
        return "bigram", load_bigram_model(spark, path)
    if kind == "trigram-sb":
        return "trigram", (
            spark.read.parquet(os.path.join(path, "unigrams.parquet")),
            spark.read.parquet(os.path.join(path, "bigrams.parquet")),
            spark.read.parquet(os.path.join(path, "trigrams.parquet")),
            int(meta["vocab_size"]), int(meta["total_tokens"]))
    raise ValueError(f"{path!r}: unknown LM model kind {kind!r}")


def lm_transition_scores(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         model: tuple[DataFrame, DataFrame, int] | None = None,
                         tokenizer: str = "ascii",
                         persists: list | None = None,
                         ) -> DataFrame:
    """Per-document fluency: ``(id, n_trans, lm_score)`` where
    ``lm_score`` is the mean add-one-smoothed bigram transition
    probability (0.0 for documents with fewer than two tokens) and
    ``n_trans`` the transition count.

    With ``model=None`` the corpus scores itself (quality-outlier
    detection); pass a :func:`bigram_model` trained on a REFERENCE
    corpus to score candidate text against it — unseen histories and
    transitions fall back to the smoothed floor ``1/V`` via the left
    joins, never drop rows."""
    explicit_model = model is not None
    if model is None:
        model = bigram_model(docs, text_col, tokenizer=tokenizer,
                             persists=persists)
    uni, bi, vocab = model
    if explicit_model and vocab == 0:
        # add-one smoothing divides by cu + V: scoring token-bearing
        # docs against an EMPTY reference model hits 0/0 mid-job, deep
        # in the plan (ANSI mode raises there) — fail loudly at the API
        # instead: an over-filtered reference corpus is an operational
        # scenario, not a bug here. Self-scoring (model=None) needs no
        # guard — transitions imply tokens imply vocab > 0, and an
        # empty self-trained model means zero transitions, which scores
        # 0.0 through the left join without ever dividing.
        raise ValueError(
            "bigram LM model has an empty vocabulary — no tokens "
            "survived in the training corpus (over-filtered reference? "
            "see examples.corpus_pipeline.reference_lm_scores)")
    tr = _transitions(docs, text_col, id_col, tokenizer=tokenizer)
    p = (tr.join(bi, ["w1", "w2"], "left")
         .join(uni, ["w1"], "left")
         .select(id_col, "pos",
                 ((F.coalesce(F.col("cb"), F.lit(0)) + 1)
                  / (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(vocab)))
                 .alias("p")))
    agg = (p.groupBy(id_col)
           .agg(F.count("*").cast("int").alias("n_trans"),
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("pos", "p"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["p"]).alias("s")))
    # score expression FIRST: it reads the raw joined "n_trans", and a
    # later output alias of the same name must never precede a reader
    # (the lateral-column-alias capture lesson, PLANS.md)
    return (docs.select(id_col)
            .join(agg, [id_col], "left")
            .select(id_col,
                    F.round(F.coalesce(F.col("s") / F.col("n_trans"),
                                       F.lit(0.0)), 6).alias("lm_score"),
                    F.coalesce("n_trans", F.lit(0)).alias("n_trans"))
            .select(id_col, "n_trans", "lm_score"))
