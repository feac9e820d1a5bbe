"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): pick raw-corpus documents whose hashed-n-gram profile
looks like a small TARGET corpus (Wikipedia, curated reference, an
in-domain seed set). The standard cheap alternative to classifier-based
selection — two bag-of-hashed-ngrams multinomials (target ``p``, raw
``q``) and a per-document importance weight
``log w(x) = sum_b c_b(x) * (log p_b - log q_b)`` over the document's
hashed feature counts, followed by Gumbel-top-k resampling.

Beyond-reference LLM-pipeline capability (the reference engine has no
data-selection surface); complements the trained linear classifier
(operators/classifier.py) with a model-free, two-scan selector.

Engine-portability contract (same discipline as functions/lm.py's
no-log scores): natural log is not bit-portable across libm
implementations, so the *verification* mode ``mode='ratio'`` replaces
``log(p_b/q_b)`` with the integer-quantized probability ratio

    score_b = (scale * (ct_b + 1) * (Nq + B)) DIV ((cq_b + 1) * (Nt + B))

— pure BIGINT arithmetic both engines evaluate identically (add-one
smoothing; B = bucket count). Per-document importance is then the
order-free integer sum ``sum_b c_b * score_b``. The ratio is a monotone
per-feature surrogate of the log-ratio: a per-document ranking in the
spirit of DSIR rather than its exact log-sum (the same documented
deviation class as corpus_lm_score's mean-probability score).
``mode='log'`` computes the paper's actual log-ratio weights in doubles
for production use where bit-replay is not required.

Overflow bound (ratio mode): the BIGINT product is bounded by
``scale * (max_bucket_count + 1) * (total_grams + buckets)`` — with the
default scale 10^4 that stays below 2^63 up to ~10^7 total feature
occurrences per side. Beyond that (real 100-TB runs), use
``mode='log'``: doubles never overflow and selection there is sampling,
not hash-verification.

Scale shape: two map-side-combined (id/bucket)-count shuffles build the
feature tables; the bucket-score table is ``buckets`` rows (broadcast);
per-document scoring is one keyed sum; selection is a global top-k
(TakeOrderedAndProject — never a full sort) or a scan-stage threshold.
Nothing shuffles document text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream2segment_spark.functions.sampling import BUCKETS, hash_bucket

DEFAULT_BUCKETS = 4096
DEFAULT_SCALE = 10_000


def _gram_bucket(gram: Column, buckets: int, seed: str) -> Column:
    """Deterministic feature-hash bucket in [0, buckets) from
    md5(seed:gram) — engine-universal (DuckDB twin documented in
    functions/sampling.hash_bucket; only the modulus differs)."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), gram)), 1, 15), 16, 10) \
        .cast("long")
    return F.pmod(h, F.lit(buckets))


def hashed_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int = DEFAULT_BUCKETS,
    tokenizer: str = "ascii",
    seed: str = "dsir",
) -> DataFrame:
    """Per-document hashed unigram+bigram counts: ``(id_col, bucket,
    cnt)``. The paper's feature map — word unigrams and bigrams hashed
    into ``buckets`` — with the repo's md5 bucket so every engine
    computes identical features. Tokens are STAGED once (the HOF
    re-evaluation trap, see operators/dedup.shingles_from_tokens);
    documents with no tokens contribute no rows (callers re-attach them
    with a left join — :func:`dsir_scores` does). One map-side-combined
    shuffle on (id, bucket)."""
    from stream2segment_spark.operators.dedup import get_tokenizer
    tok_expr, _ = get_tokenizer(tokenizer)
    toked = df.select(
        F.col(id_col),
        tok_expr(F.coalesce(F.col(text_col), F.lit(""))).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    # element_at is 1-based; sequence(1, n-1) guarded — Spark's sequence
    # DESCENDS when start > stop, so n < 2 must short-circuit to []
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1)))) \
        .otherwise(F.array().cast("array<string>"))
    grams = toked.select(
        id_col, F.explode(F.concat(toks, bigrams)).alias("gram"))
    return (grams
            .select(id_col,
                    _gram_bucket(F.col("gram"), buckets, seed)
                    .alias("bucket"))
            .groupBy(id_col, "bucket")
            .agg(F.count("*").alias("cnt")))


def bucket_ratio_scores(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    *,
    buckets: int = DEFAULT_BUCKETS,
    scale: int = DEFAULT_SCALE,
    mode: str = "ratio",
    persists: "list | None" = None,
) -> DataFrame:
    """Per-bucket importance score table ``(bucket, bscore)`` from two
    :func:`hashed_ngram_features` frames. Only buckets that occur in
    the RAW side are emitted (buckets absent from raw can never touch a
    raw document's sum); target counts for those buckets coalesce to 0
    before add-one smoothing.

    ``mode='ratio'`` (default): quantized integer ratio, bit-portable
    (module docstring). ``mode='log'``: double
    ``ln((ct+1)/(Nt+B)) - ln((cq+1)/(Nq+B))`` — the paper's weight.

    The totals ``Nt``/``Nq`` are derived from the per-bucket count
    tables (``sum over buckets of ct`` IS the total feature count), so
    each input is aggregated — and its corpus tokenized — exactly ONCE:
    the grouped tables are at most ``buckets`` rows, persisted and
    eagerly filled (sequenced fill, the ngram_jaccard_pairs lesson),
    where re-deriving the totals from the raw feature frames would
    re-run both corpus tokenize passes (r9 opt round; guide §5/§1.2
    step 1). Pass a list as ``persists`` to receive the two cached
    frames; without it they stay cached until the session ends (the
    gate/bench clear the session cache between entries)."""
    if mode not in ("ratio", "log"):
        raise ValueError(f"mode must be 'ratio' or 'log', got {mode!r}")
    tcnt = (target_feats.groupBy("bucket").agg(F.sum("cnt").alias("ct"))
            .persist())
    rcnt = (raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("cq"))
            .persist())
    if persists is not None:
        persists.extend((tcnt, rcnt))
    tcnt.count()
    rcnt.count()
    tn = tcnt.agg(F.sum("ct").cast("long").alias("nt"))
    rn = rcnt.agg(F.sum("cq").cast("long").alias("nq"))
    joined = (rcnt.join(F.broadcast(tcnt), "bucket", "left")
              .crossJoin(F.broadcast(tn)).crossJoin(F.broadcast(rn))
              .select("bucket",
                      F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
                      "cq", "nt", "nq"))
    if mode == "ratio":
        num = (F.lit(scale).cast("long")
               * (F.col("ct") + F.lit(1)).cast("long")
               * (F.col("nq") + F.lit(buckets)).cast("long"))
        den = ((F.col("cq") + F.lit(1)).cast("long")
               * (F.col("nt") + F.lit(buckets)).cast("long"))
        # integral `div` keeps the quotient in BIGINT end-to-end — a
        # float division would round above 2^53 and break bit-replay
        return (joined
                .select("bucket", num.alias("__num"), den.alias("__den"))
                .select("bucket",
                        F.expr("__num div __den").alias("bscore")))
    lp = F.log((F.col("ct") + F.lit(1)).cast("double")
               / (F.col("nt") + F.lit(buckets)).cast("double"))
    lq = F.log((F.col("cq") + F.lit(1)).cast("double")
               / (F.col("nq") + F.lit(buckets)).cast("double"))
    return joined.select("bucket", (lp - lq).alias("bscore"))


def dsir_scores(
    raw_df: DataFrame,
    raw_feats: DataFrame,
    bucket_scores: DataFrame,
    id_col: str,
    *,
    mode: str = "ratio",
) -> DataFrame:
    """Per-document importance: ``(id_col, dsir_score)`` =
    ``sum_b c_b * bscore_b`` over the document's feature rows. In ratio
    mode the sum is integer (order-free, exact); in log mode it is a
    double sum (order-dependent in the last ulp — production scoring,
    not hash-verification). Documents with no features (empty/NULL
    text) keep a row with score 0 via the left join — silently dropping
    unscorable docs would bias selection toward non-empty boilerplate.

    Plan: feature rows join the ``buckets``-row score table broadcast,
    then one map-side-combined keyed sum; text never shuffles."""
    zero = F.lit(0).cast("long") if mode == "ratio" else \
        F.lit(0.0).cast("double")
    per_doc = (raw_feats.join(F.broadcast(bucket_scores), "bucket")
               .groupBy(id_col)
               .agg(F.sum(F.col("cnt") * F.col("bscore"))
                    .alias("__s")))
    return (raw_df.select(id_col).distinct()
            .join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("__s"), zero).alias("dsir_score")))


def dsir_select(
    scores: DataFrame,
    id_col: str,
    k: int,
    *,
    method: str = "top",
    temperature: float = 1.0,
    seed: str = "dsir-gumbel",
) -> DataFrame:
    """Select ``k`` documents from a :func:`dsir_scores` frame.

    ``method='top'``: deterministic top-k by (dsir_score DESC, id ASC)
    — a global TakeOrderedAndProject (never a full sort), and the
    bit-replayable verification contract.

    ``method='gumbel'``: the paper's Gumbel-top-k resampling — sample k
    docs without replacement with probability proportional to
    ``exp(dsir_score / temperature)`` by adding Gumbel noise
    ``-ln(-ln u)`` to ``score/temperature`` and taking the top k. The
    uniform ``u`` comes from the md5 hash bucket of (seed, id) — the
    repo's deterministic-randomness convention, so the sample is
    reproducible across runs/partitionings (but involves ``ln``: not
    bit-portable across engines; pytest-pinned, not hash-gated)."""
    if method == "top":
        # no double cast: integer scores above 2^53 must order exactly
        key = F.col("dsir_score")
    elif method == "gumbel":
        u = (hash_bucket(F.col(id_col), seed).cast("double") + F.lit(0.5)) \
            / F.lit(float(BUCKETS))
        key = (F.col("dsir_score").cast("double") / F.lit(temperature)
               - F.log(-F.log(u)))
    else:
        raise ValueError(
            f"method must be 'top' or 'gumbel', got {method!r}")
    return (scores
            .withColumn("__key", key)
            .orderBy(F.col("__key").desc(), F.col(id_col).asc())
            .limit(k)
            .drop("__key"))


def dsir_pipeline(
    raw_df: DataFrame,
    target_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    *,
    buckets: int = DEFAULT_BUCKETS,
    scale: int = DEFAULT_SCALE,
    mode: str = "ratio",
    method: str = "top",
    temperature: float = 1.0,
    tokenizer: str = "ascii",
    seed: str = "dsir",
    persists: "list | None" = None,
) -> DataFrame:
    """End-to-end DSIR: features for both corpora -> bucket score table
    -> per-doc importance -> select k. Returns ``(id_col, dsir_score)``
    for the selected documents.

    The raw feature frame feeds BOTH the score table and the per-doc
    sum, so it is persisted and eagerly filled (narrow (id, bucket,
    cnt) ints — far smaller than the text it derives from) — without
    the cache the raw corpus is tokenized once per consumer (r9 opt
    round). ``persists`` surfaces the caches like curate_corpus."""
    tf = hashed_ngram_features(target_df, id_col, text_col,
                               buckets=buckets, tokenizer=tokenizer,
                               seed=seed)
    rf = hashed_ngram_features(raw_df, id_col, text_col,
                               buckets=buckets, tokenizer=tokenizer,
                               seed=seed).persist()
    if persists is not None:
        persists.append(rf)
    rf.count()
    bs = bucket_ratio_scores(tf, rf, buckets=buckets, scale=scale,
                             mode=mode, persists=persists)
    sc = dsir_scores(raw_df, rf, bs, id_col, mode=mode)
    return dsir_select(sc, id_col, k, method=method,
                       temperature=temperature, seed=f"{seed}-gumbel")
