"""Deterministic, engine-universal sampling & splits (beyond-reference,
LLM-pipeline): training corpora need reproducible train/val/test
assignment that is (a) stable across runs/engines/partitionings — no
``rand()`` — and (b) keyed by document id so re-ingesting a doc can never
leak it across splits.

Mechanism: a uniform bucket in [0, 10000) from the md5 of ``seed:id``
(md5 exists in every engine, so a DuckDB/Trino/Spark pipeline computes
the IDENTICAL assignment — same trick as the SimHash gate oracle), then
threshold the bucket. Pure expressions in the scan stage: no shuffle, no
state, trivially pushable.

Stratified rates come for free: the bucket is uniform within any stratum
(md5 is independent of any column), so thresholding inside a stratum
yields that stratum's rate; per-stratum thresholds give exact
proportional/weighted designs without a groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(id_col: Column, seed: str = "s2s") -> Column:
    """Deterministic uniform bucket in [0, BUCKETS) from md5(seed:id).
    DuckDB twin: ``CAST('0x' || substr(md5(seed || ':' || CAST(id AS
    VARCHAR)), 1, 15) AS BIGINT) % 10000``."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, 15),
        16, 10).cast("long")
    return F.pmod(h, F.lit(BUCKETS))


def weighted_sample(
    df: "DataFrame",
    id_col: str,
    weight_col: str,
    seed: str = "wsample",
) -> "DataFrame":
    """Deterministic per-row Bernoulli keep with probability =
    ``weight_col`` (clamped to [0, 1]): keep iff ``hash_bucket(id) <
    round(w * BUCKETS)`` — the FineWeb-Edu-style quality-PROPORTIONAL
    sampler (keep rate rises with the score instead of a hard floor),
    reproducible across runs/engines/partitionings like every md5-keyed
    assignment here. NULL weights drop the row (no silent keep of
    unscored docs). Scan-stage filter: no shuffle, composes with
    pruning; the DuckDB twin is the documented hash_bucket expression
    against ``round(w * 10000)``."""
    b = hash_bucket(F.col(id_col), seed)
    # explicit NULL guard FIRST: least/greatest IGNORE nulls on both
    # engines, so a bare clamp would resolve a NULL weight to 1.0 and
    # silently keep every unscored row — the opposite of the contract
    w = F.greatest(F.lit(0.0),
                   F.least(F.lit(1.0), F.col(weight_col).cast("double")))
    return df.filter(F.col(weight_col).isNotNull()
                     & (b < F.round(w * BUCKETS, 0)))


def split_column(
    id_col: Column,
    fractions: dict[str, float] | None = None,
    seed: str = "s2s",
) -> Column:
    """A 'train'/'val'/'test'-style label column. ``fractions`` map label
    -> fraction, in priority order; they must sum to <= 1 (any remainder
    is NULL — rows excluded from every split)."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    bucket = hash_bucket(id_col, seed)
    expr, lo = None, 0
    for label, frac in fractions.items():
        hi = lo + int(round(frac * BUCKETS))
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo = hi
    return expr


def deterministic_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    seed: str = "s2s",
    out_col: str = "split",
) -> DataFrame:
    """Append the split label column (see :func:`split_column`)."""
    return df.withColumn(out_col, split_column(F.col(id_col), fractions, seed))


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-stratum keep rates for 'temperature' corpus rebalancing: kept
    counts become proportional to ``n_s ** alpha`` (the multilingual
    upsampling rule — alpha=1 keeps the natural mix, alpha=0 flattens it),
    normalized so the smallest stratum keeps everything:
    ``rate_s = (n_s / n_min) ** (alpha - 1)``.

    Returns a small DataFrame ``(strata_col, n_total, rate)`` — one row
    per stratum, a broadcast-sized dimension by contract. One map-side
    combined count shuffle; the n_min fold is a 1-row crossJoin.

    For ``alpha=0.5`` the rate is computed as ``sqrt(n_min / n_s)``:
    IEEE sqrt is correctly rounded in every engine, so the assignment is
    bit-replayable cross-engine (pow is only ulp-accurate and could flip
    a threshold comparison between libms).

    Rows with a NULL stratum are excluded from the counts (a NULL group
    would otherwise distort ``n_min`` and deflate every real stratum's
    rate); :func:`temperature_sample` passes them through unsampled.
    """
    counts = (df.filter(F.col(strata_col).isNotNull())
                .groupBy(strata_col).agg(F.count("*").alias("n_total")))
    n_min = counts.agg(F.min("n_total").alias("__n_min"))
    joined = counts.crossJoin(F.broadcast(n_min))
    if alpha == 0.5:
        rate = F.sqrt(F.col("__n_min").cast("double") / F.col("n_total"))
    else:
        rate = F.pow(F.col("n_total").cast("double") / F.col("__n_min"),
                     F.lit(float(alpha) - 1.0))
    return joined.withColumn("rate", rate).drop("__n_min")


def temperature_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    alpha: float = 0.5,
    seed: str = "temp",
    rates: DataFrame | None = None,
) -> DataFrame:
    """Deterministic temperature-weighted sample: keep a row iff its md5
    bucket falls under its stratum's :func:`temperature_rates` rate.
    The rates dim is broadcast — no shuffle lands on the corpus side, and
    the filter composes with scan-stage pruning. Pass precomputed
    ``rates`` to avoid a second counting scan of the corpus when the
    caller also wants the rates table.

    Rows with a NULL stratum pass through UNSAMPLED (rate 1): they have
    no stratum to rebalance against, and silently dropping them (an
    inner join's behavior) would be data loss."""
    if rates is None:
        rates = temperature_rates(df, strata_col, alpha)
    bucket = hash_bucket(F.col(id_col), seed)
    joined = df.join(F.broadcast(rates.select(strata_col, "rate")),
                     strata_col, "left")
    return (joined.filter(
        F.col("rate").isNull()
        | (bucket.cast("double") < F.col("rate") * BUCKETS))
        .drop("rate"))


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float | dict[str, float],
    seed: str = "s2s",
    strata_col: str | None = None,
) -> DataFrame:
    """Reproducible sample: keep rows whose bucket < fraction * BUCKETS.

    ``fraction`` may be a dict stratum-value -> fraction with
    ``strata_col`` set (sampleBy semantics, but deterministic and
    engine-replayable); missing strata default to 0 (dropped)."""
    bucket = hash_bucket(F.col(id_col), seed)
    if isinstance(fraction, dict):
        if strata_col is None:
            raise ValueError("per-stratum fractions need strata_col")
        thr = None
        for value, frac in fraction.items():
            cond = F.col(strata_col) == value
            t = F.lit(int(round(frac * BUCKETS)))
            thr = F.when(cond, t) if thr is None else thr.when(cond, t)
        thr = thr.otherwise(F.lit(0))
    else:
        thr = F.lit(int(round(float(fraction) * BUCKETS)))
    return df.filter(bucket < thr)


def token_budget_mix(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    tokens_col: str,
    budgets: dict[str, int] | int,
    seed: str = "mix",
    n_shards: int = 64,
) -> DataFrame:
    """Token-budget source mixing: keep documents per stratum, in
    deterministic md5-bucket order, until the stratum's TOKEN budget is
    filled — the token-level counterpart of :func:`temperature_sample`
    (training mixtures are specified in tokens per source, not document
    counts: a source of long documents must contribute FEWER docs for
    the same token share).

    ``budgets`` maps stratum value -> token budget (or one int for all
    strata; strata absent from a dict get budget 0 = dropped). Fill
    semantics match :func:`packing.pack_greedy`: a doc is kept iff the
    tokens accumulated BEFORE it are under the budget, so the
    budget-crossing doc is included and every stratum with a positive
    budget and any docs contributes at least one. Selection order is
    ``(shard, md5 bucket, id)`` where shard is itself an md5 bucket —
    a deterministic unbiased shuffle, so the kept prefix is a uniform
    sample of the stratum, reproducible cross-engine (the oracle
    replays it with the same md5 expressions and ONE window).

    Scale shape: a DISTRIBUTED PREFIX SUM, not one window per stratum
    (a corpus with 5 sources would push every row of a source through
    a single window task): (1) local cumulative sums inside each of
    ``n_shards`` md5 shards per stratum — ``strata x shards`` window
    partitions, parallelism independent of the stratum count; (2) a
    broadcast-sized (stratum, shard) totals dimension, prefix-summed
    over shards; (3) each row's global start = shard offset + local
    cumsum. Budgets ride a broadcast CASE expression. Rows with a NULL
    stratum are dropped (no budget to charge). Returns the input
    columns + ``mix_start`` (tokens accumulated before the doc within
    its stratum — the audit column).
    """
    from pyspark.sql import Window

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if isinstance(budgets, dict):
        thr = None
        for value, b in budgets.items():
            cond = F.col(strata_col) == value
            t = F.lit(int(b)).cast("long")
            thr = F.when(cond, t) if thr is None else thr.when(cond, t)
        thr = thr.otherwise(F.lit(0).cast("long")) if thr is not None \
            else F.lit(0).cast("long")
    else:
        thr = F.lit(int(budgets)).cast("long")
    shard = F.pmod(hash_bucket(F.col(id_col), f"{seed}:shard"),
                   F.lit(n_shards)).cast("int")
    base = (df.filter(F.col(strata_col).isNotNull())
            .withColumn("__shard", shard))
    wl = (Window.partitionBy(strata_col, "__shard")
          .orderBy(hash_bucket(F.col(id_col), seed), F.col(id_col))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local_cum = F.sum(F.col(tokens_col).cast("long")).over(wl)
    staged = base.withColumn("__lcum", local_cum)
    # (stratum, shard) totals: a broadcast dim by contract; its prefix
    # sum over shard order gives each shard's global start offset
    wo = (Window.partitionBy(strata_col).orderBy("__shard")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = (base.groupBy(strata_col, "__shard")
               .agg(F.sum(F.col(tokens_col).cast("long")).alias("__tot"))
               .withColumn("__off",
                           F.sum("__tot").over(wo) - F.col("__tot"))
               .drop("__tot"))
    joined = staged.join(F.broadcast(offsets), [strata_col, "__shard"])
    start = (F.col("__off") + F.col("__lcum")
             - F.col(tokens_col).cast("long"))
    return (joined.withColumn("mix_start", start)
            .filter(F.col("mix_start") < thr)
            .drop("__shard", "__lcum", "__off"))


def shuffle_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: str = "shuf",
) -> DataFrame:
    """Deterministic global training shuffle: assign every row a
    ``shard_id`` in [0, n_shards) and a dense ``shard_pos`` within its
    shard, both pure functions of md5(seed:id) — the "shuffle your
    corpus before training" delivery step, reproducible on any engine
    and for any partitioning of the input.

    Adjacent input rows (same crawl, same document cluster) land in
    unrelated (shard, position) slots, which is exactly what sequential
    training readers need. Scale shape: one shuffle on ``shard_id``;
    each shard's position window sorts only that shard's rows — size
    the shard count so n_rows/n_shards fits a task (the same constraint
    as the output file size). DuckDB twin of the position:
    ``row_number() OVER (PARTITION BY shard ORDER BY h, id) - 1``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from stream2segment_spark.operators.sketch import hash60
    h = hash60(F.col(id_col), seed)
    staged = df.withColumn("__h", h) \
        .withColumn("shard_id", F.pmod("__h", F.lit(n_shards)))
    w = Window.partitionBy("shard_id").orderBy("__h", id_col)
    return (staged
            .withColumn("shard_pos",
                        (F.row_number().over(w) - F.lit(1)).cast("long"))
            .drop("__h"))


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: str = "shuf",
) -> None:
    """Materialize :func:`shuffle_assignment` as ``shard_id=K/``
    partition directories with ONE file each, rows stored in shard_pos
    order inside the file — sequential readers stream a shard and see
    the shuffled order directly. One shuffle (repartition on shard_id,
    so each shard's rows land in exactly one task) + in-partition sort;
    no global sort."""
    out = shuffle_assignment(df, id_col, n_shards, seed)
    (out.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "shard_pos")
        .write.partitionBy("shard_id").mode("overwrite").parquet(path))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    seed: str = "cap",
    salts: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    md5(seed:id) order — the per-domain / per-source document cap
    (Common-Crawl-style anti-spam curation: no single domain may
    dominate the corpus). Hash order makes the kept subset a uniform
    random-looking sample that is reproducible across engines, runs and
    partitionings (unlike ``sample()``/``limit``).

    Scale shape: one shuffle on ``group_col``; the row_number window
    sorts each group once. Groups ARE the skew axis here (the capped
    domain is by definition huge) — pass ``salts=N`` for the
    escalation when one domain dwarfs a reducer: stage 1 windows on
    ``(group, pmod(hash, N))`` — a BALANCED full shuffle whose largest
    task holds |group|/N rows — and keeps each bucket's local
    top-``cap``; stage 2 re-windows the survivors (at most ``cap x N``
    rows per group) globally. The output is IDENTICAL
    (equivalence-tested): a group's global top-``cap`` rows rank in
    the top ``cap`` of whichever salt bucket they hash into
    (restricting a total order to a subset preserves relative rank),
    so stage 1 can never drop a winner. Default off: measured on a
    20M-row 50%-one-domain fixture, the plain window costs 1.71 s vs
    salted 2.98 s (min-of-3, local[32]) — in-memory sorts don't
    suffer skew, but a 100-TB corpus whose mega-domain exceeds one
    executor's spill budget does; salts bounds that task at
    |group|/N. (An Arrow per-batch pre-cut variant measured 5.86 s —
    the Python hop costs more than either shuffle; rejected.)"""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from stream2segment_spark.operators.sketch import hash60
    h = hash60(F.col(id_col), seed)
    if salts is not None:
        if salts < 1:
            raise ValueError(f"salts must be >= 1, got {salts}")
        staged = df.withColumn("__h", h)
        w1 = Window.partitionBy(
            group_col, F.pmod(F.col("__h"), F.lit(salts))
        ).orderBy(F.col("__h"), F.col(id_col))
        pre = (staged.withColumn("__rn1", F.row_number().over(w1))
               .where(F.col("__rn1") <= cap).drop("__rn1"))
        # stage 2 must rank by the exact same (hash, id) order stage 1
        # ranked by — reuse the materialized hash column
        w2 = Window.partitionBy(group_col).orderBy(F.col("__h"),
                                                   F.col(id_col))
        return (pre.withColumn("__rn", F.row_number().over(w2))
                .where(F.col("__rn") <= cap).drop("__rn", "__h"))
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= cap).drop("__rn"))


def unimax_allocation(counts: list[tuple[str, int]], budget: int,
                      epochs: int) -> dict[str, int]:
    """UniMax budget allocation (Chung et al. 2023): give every stratum
    (language) a UNIFORM share of the budget, capped at ``epochs``
    passes over its data, redistributing unused share to the rest.
    Strata are visited in increasing size (ties by name); each gets
    ``min(epochs * n_s, B_rem DIV L_rem)`` — all integer arithmetic, so
    the allocation is exact and engine-replayable (the gate oracle
    replays the scan with a recursive CTE). Driver-side over the
    stratum list only (bounded: languages, not documents)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if epochs <= 0:
        raise ValueError(f"epochs must be positive, got {epochs}")
    todo = sorted(counts, key=lambda x: (x[1], x[0]))
    alloc: dict[str, int] = {}
    b_rem = budget
    for i, (name, n) in enumerate(todo):
        share = b_rem // (len(todo) - i)
        alloc[name] = min(epochs * n, share)
        b_rem -= alloc[name]
    return alloc


def unimax_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    budget: int,
    epochs: int = 1,
    seed: str = "unimax",
) -> DataFrame:
    """UniMax sampling: select/repeat documents so each stratum
    contributes exactly its :func:`unimax_allocation` count. Within a
    stratum, documents rank by (md5 bucket, id) — deterministic across
    runs/engines/partitionings like every sampler here. When the
    allocation exceeds the stratum size (epochs > 1), every document
    repeats ``a_s DIV n_s`` times and the top ``a_s mod n_s`` ranked
    docs one more — the output carries ``n_copies`` (training loaders
    repeat; no exploded duplication of text). Rows with a NULL stratum
    are dropped (no budget can be attributed to them).

    Returns ``df``'s columns + ``n_copies`` (> 0 rows only); the sum of
    ``n_copies`` per stratum equals the allocation exactly.

    Plan/scale shape: one stratum count aggregate (collected — strata
    are languages, bounded by contract), one per-stratum window for the
    md5 rank, a broadcast literal allocation map; the corpus shuffles
    once on the stratum key."""
    cdf = (df.filter(F.col(strata_col).isNotNull())
           .groupBy(strata_col).agg(F.count("*").alias("n")))
    counts = [(r[strata_col], r["n"]) for r in cdf.collect()]
    alloc = unimax_allocation(counts, budget, epochs)
    n_map = dict(counts)
    alloc_col = F.create_map(
        *[F.lit(x) for kv in alloc.items() for x in kv])
    size_col = F.create_map(
        *[F.lit(x) for kv in n_map.items() for x in kv])
    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(id_col), seed), F.col(id_col))
    ranked = (df.filter(F.col(strata_col).isNotNull())
              .withColumn("__rank", F.row_number().over(w) - 1)
              .withColumn("__a", alloc_col[F.col(strata_col)])
              .withColumn("__n", size_col[F.col(strata_col)]))
    base = F.expr("__a div __n")
    extra = (F.col("__rank") < F.pmod(F.col("__a"), F.col("__n"))) \
        .cast("int")
    return (ranked
            .withColumn("n_copies", (base + extra).cast("int"))
            .filter(F.col("n_copies") > 0)
            .drop("__rank", "__a", "__n"))
