"""MinHash-LSH parameter planning and empirical validation.

Choosing the band/row split is THE design decision of a MinHash-LSH
dedup run at scale: for ``n_perm`` hashes split into ``b`` bands of
``r`` rows, a pair with Jaccard similarity ``s`` becomes a candidate
with probability ``P(s) = 1 - (1 - s^r)^b`` (the S-curve; Leskovec,
Rajaraman & Ullman, "Mining of Massive Datasets", ch. 3). Too many
bands floods the verify stage with false positives on boilerplate-
heavy corpora; too many rows silently drops true near-duplicates.

:func:`lsh_plan` picks ``(b, r)`` minimizing the weighted integral of
false-positive mass below the threshold and false-negative mass above
it — the same objective as datasketch's ``_optimal_param``, with a
fixed midpoint rule so the choice is deterministic. It is pure,
driver-side scalar math (a few hundred candidate splits x a fixed-step
integral); nothing touches the cluster.

:func:`lsh_tuning_curve` validates the chosen parameters against the
corpus itself: given a (sampled) pair set with EXACT Jaccard values,
it buckets pairs by similarity and accumulates the expected candidate
probability per bucket — the measured S-curve. Comparing
``exp_cand`` to ``n_pairs`` per bucket shows exactly where recall is
lost and where verify work is wasted, BEFORE committing a 100 TB run.
The probability is evaluated as left-associated multiply chains (both
exponents are small integers), so the numbers are bit-portable across
engines, and the per-bucket sum is an explicit pair-ordered fold — a
plain ``sum()`` would add in partition order.

No reference counterpart (rizac/stream2segment has no similarity
search); beyond-reference LLM-pipeline tooling alongside
``operators/dedup.minhash_neardup_pairs``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["lsh_error_rates", "lsh_plan", "lsh_plan_banded",
           "candidate_probability",
           "candidate_probability_sql", "lsh_tuning_curve"]


def _s_curve(s: float, b: int, r: int) -> float:
    return 1.0 - (1.0 - s ** r) ** b


def lsh_error_rates(threshold: float, b: int, r: int,
                    steps: int = 1000) -> tuple[float, float]:
    """(false-positive, false-negative) probability mass of the
    ``(b, r)`` S-curve around ``threshold``: midpoint-rule integrals of
    ``P(s)`` on ``[0, t)`` and of ``1 - P(s)`` on ``[t, 1]``, assuming
    a uniform similarity prior (the planning convention — the measured
    prior comes from :func:`lsh_tuning_curve`)."""
    fp = fn = 0.0
    dt = threshold / steps
    for i in range(steps):
        fp += _s_curve((i + 0.5) * dt, b, r) * dt
    du = (1.0 - threshold) / steps
    for i in range(steps):
        fn += (1.0 - _s_curve(threshold + (i + 0.5) * du, b, r)) * du
    return fp, fn


def lsh_plan(threshold: float, n_perm: int,
             fp_weight: float = 0.5, fn_weight: float = 0.5,
             steps: int = 1000) -> tuple[int, int]:
    """The ``(bands, rows_per_band)`` split of an ``n_perm``-hash
    signature minimizing ``fp_weight * FP + fn_weight * FN`` at
    ``threshold`` (ties broken toward fewer bands, then more rows —
    fewer bands = fewer shuffled signature copies). Raise
    ``fn_weight`` when recall matters more than verify cost."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if n_perm < 1:
        raise ValueError(f"n_perm must be >= 1, got {n_perm}")
    best: tuple[float, int, int] | None = None
    for b in range(1, n_perm + 1):
        for r in range(1, n_perm // b + 1):
            fp, fn = lsh_error_rates(threshold, b, r, steps)
            err = fp_weight * fp + fn_weight * fn
            key = (err, b, -r)
            if best is None or key < best:
                best = key
                plan = (b, r)
    return plan


def lsh_plan_banded(threshold: float, num_hashes: int,
                    fp_weight: float = 0.5, fn_weight: float = 0.5,
                    steps: int = 1000) -> tuple[int, int]:
    """Like :func:`lsh_plan` but constrained to ``bands * rows ==
    num_hashes`` — the layout :func:`operators.dedup.lsh_candidate_pairs`
    requires (every hash belongs to exactly one band). This is the
    chooser behind ``minhash_neardup_pairs(bands=None)``."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    best: tuple[float, int] | None = None
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        fp, fn = lsh_error_rates(threshold, b, num_hashes // b, steps)
        key = (fp_weight * fp + fn_weight * fn, b)
        if best is None or key < best:
            best = key
            plan = (b, num_hashes // b)
    return plan


def _pow_chain(col: Column, n: int) -> Column:
    out = col
    for _ in range(n - 1):
        out = out * col
    return out


def candidate_probability(jaccard: Column, b: int, r: int) -> Column:
    """``1 - (1 - j^r)^b`` as left-associated multiply chains (both
    exponents are small integers, so no ``pow`` — libm ``pow`` is not
    bit-portable across engines; chained ``*`` is IEEE-exact)."""
    if b < 1 or r < 1:
        raise ValueError(f"bands/rows must be >= 1, got b={b} r={r}")
    return F.lit(1.0) - _pow_chain(F.lit(1.0) - _pow_chain(jaccard, r), b)


def candidate_probability_sql(expr: str, b: int, r: int) -> str:
    """The same multiply chain as :func:`candidate_probability`, as SQL
    text over ``expr`` — generated by the SAME parameters so an oracle
    replay can never drift from the Spark plan."""
    if b < 1 or r < 1:
        raise ValueError(f"bands/rows must be >= 1, got b={b} r={r}")
    jr = " * ".join([f"({expr})"] * r)
    qb = " * ".join([f"(1.0 - ({jr}))"] * b)
    return f"(1.0 - ({qb}))"


def lsh_tuning_curve(
    pairs: DataFrame,
    jaccard_col: str = "jaccard",
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    b: int,
    r: int,
    n_buckets: int = 10,
) -> DataFrame:
    """The measured S-curve: per similarity bucket
    (``floor(j * n_buckets)``, so exact duplicates land in bucket
    ``n_buckets``), the pair count and the expected number of LSH
    candidates under ``(b, r)``. ``exp_cand`` close to ``n_pairs``
    above the design threshold = recall holds; ``exp_cand`` mass in
    low buckets = verify work wasted on false positives.

    One map-side-combined shuffle on the bucket key; the per-bucket
    expected count is an explicit ``(id_a, id_b)``-ordered fold so the
    double sum is reproducible (same discipline as ``functions/lm``).
    """
    j = F.col(jaccard_col).cast("double")
    p = candidate_probability(j, b, r)
    rows = pairs.select(
        F.floor(j * n_buckets).cast("int").alias("bucket"),
        F.col(id_a).alias("__a"), F.col(id_b).alias("__b"),
        p.alias("__p"))
    agg = rows.groupBy("bucket").agg(
        F.count("*").alias("n_pairs"),
        F.sort_array(F.collect_list(
            F.struct("__a", "__b", "__p"))).alias("__l"))
    fold = F.aggregate("__l", F.lit(0.0),
                       lambda acc, x: acc + x["__p"])
    return agg.select(
        F.lit(b).alias("bands"), F.lit(r).alias("rows_per_band"),
        "bucket", "n_pairs", F.round(fold, 6).alias("exp_cand"))
