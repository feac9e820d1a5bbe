"""CCNet-style per-language quality bucketing (head / middle / tail).

Wenzek et al. 2019 ("CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") split each language's documents into
head/middle/tail by sorting on reference-LM perplexity and cutting the
per-language distribution into thirds of the data volume; downstream
training then samples buckets at different rates. This module provides
that bucketing stage over ANY score column (the scoring itself lives
in :mod:`stream2segment_spark.functions.lm` — see
``examples.corpus_pipeline.reference_lm_scores`` for the full CCNet
recipe: curate -> decontaminate -> train reference LM -> score).

Scale shape (the reason this is not a per-language ``Window`` over the
documents): a window partitioned by language orders EVERY document of
a language inside one task — a single-language 100 TB corpus is one
straggler partition. Instead the cumulative distribution is computed
over the (language, quantized score) AGGREGATE:

1. one map-side-combined shuffle: ``groupBy(lang, round(score, q))``
   summing the weight (documents or characters) per score value;
2. the running-total window runs over that aggregate — bounded by the
   number of DISTINCT quantized scores per language (``10^q`` per unit
   of score range), never by the corpus size;
3. bucket labels join back to the documents on (lang, quantized
   score) — a broadcast hash join against the small cutoff table, so
   the corpus itself is never sorted, windowed, or re-shuffled.

Bucket boundaries are decided in INTEGER arithmetic (weights are cast
to ``bigint``; a boundary ``p/q`` compares ``start * q < p * total``),
so the head/middle/tail assignment is bit-portable across engines and
immune to float summation order. No reference counterpart
(rizac/stream2segment processes seismic waveforms); this is part of
the beyond-reference LLM-training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ccnet_buckets"]

_QCOL = "__s2s_bucket_q"


def ccnet_buckets(
    df: DataFrame,
    score_col: str,
    *,
    lang_col: str | None = None,
    weight_col: str | None = None,
    boundaries: tuple[tuple[int, int], ...] = ((1, 3), (2, 3)),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    quantize: int = 6,
    bucket_col: str = "bucket",
    frac_col: str = "cum_frac",
) -> DataFrame:
    """Assign every row a quality bucket from the per-``lang_col``
    cumulative distribution of ``score_col`` (descending: the best
    scores land in ``labels[0]``).

    ``weight_col`` (integral, e.g. a character count) weights the
    distribution the way CCNet weights by data volume; ``None`` counts
    documents. ``boundaries`` are cumulative-mass fractions as exact
    rationals ``(p, q)``; a score GROUP (all rows sharing a quantized
    score) is assigned by where it STARTS in the descending
    distribution, so ties never straddle buckets and the rule stays
    integer-exact. ``quantize`` rounds the score to that many decimals
    before grouping — it bounds the cutoff-table size (step 2 above)
    and is the resolution CCNet's percentile cutoffs quantize to
    anyway. Rows must have non-null ``lang_col``/``score_col`` (use
    ``langid_script`` -> ``'und'`` and coalesced scores upstream; null
    keys would drop out of the equi-join back onto the data).

    Returns ``df`` plus ``bucket_col`` and ``frac_col`` (the group's
    inclusive cumulative mass share, rounded to 6 decimals).
    """
    if len(labels) != len(boundaries) + 1:
        raise ValueError(
            f"{len(boundaries)} boundaries need {len(boundaries) + 1} "
            f"labels, got {len(labels)}")
    fracs = []
    for p, q in boundaries:
        if int(p) != p or int(q) != q or p <= 0 or q <= 0 or p >= q:
            raise ValueError(
                f"boundary {(p, q)} is not a rational 0 < p/q < 1 "
                "with integer terms")
        fracs.append((int(p), int(q)))
    if any(c in df.columns for c in (bucket_col, frac_col, _QCOL)):
        raise ValueError(
            f"output columns {bucket_col!r}/{frac_col!r}/{_QCOL!r} "
            "collide with input columns")

    q_expr = F.round(F.col(score_col).cast("double"), quantize)
    base = df.withColumn(_QCOL, q_expr)
    keys = ([lang_col] if lang_col else []) + [_QCOL]
    weight = (F.col(weight_col).cast("long") if weight_col
              else F.lit(1).cast("long"))
    grp = base.groupBy(*keys).agg(F.sum(weight).alias("__w"))

    part = [lang_col] if lang_col else []
    run = (Window.partitionBy(*part).orderBy(F.col(_QCOL).desc())
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.partitionBy(*part)
    cum = F.sum("__w").over(run)
    total = F.sum("__w").over(tot)
    start = cum - F.col("__w")

    bucket: Column = F.lit(labels[-1])
    for (p, qd), label in reversed(list(zip(fracs, labels))):
        bucket = F.when(start * qd < p * total, F.lit(label)) \
                  .otherwise(bucket)
    # a language whose every row weighs 0 (e.g. one empty doc) has no
    # mass to allocate: its groups keep the last bucket (the integer
    # rule already yields that) and cum_frac pins to 1.0 instead of
    # dividing by zero (ANSI mode raises on 0/0)
    frac = F.when(total == 0, F.lit(1.0)) \
            .otherwise(F.round(cum / total, 6))
    cuts = grp.select(
        *keys,
        bucket.alias(bucket_col),
        frac.alias(frac_col))

    out = base.join(F.broadcast(cuts), on=keys, how="inner")
    return out.drop(_QCOL)
