"""Exact single-pass feature statistics: the correlation / covariance
matrix of N numeric columns in ONE aggregation pass.

Why not ``df.stat.corr`` / ``F.corr``: those accumulate *double* sums,
whose value depends on partition count and reduce order — fine for
exploration, useless for a reproducibility gate or an incremental
pipeline that must produce the same bytes on every backfill. Here every
column is quantized to fixed-point integers (the data's own decimal
scale, e.g. cents for prices) and the co-moment sums ``n, Σx, Σxy`` are
computed in DECIMAL(38,0) — exact, associative, commutative — so the
result is identical for ANY partitioning, and any engine replays it
bit-for-bit (the only float ops are three correctly-rounded
integer->double casts, two ``sqrt`` and one divide per pair, all IEEE).

Scale shape: one ``groupBy().agg()`` over ``N + N*(N+1)/2 + 1``
integer sums — partial aggregation combines map-side, the shuffle is a
single row of counters per partition, and per-day/per-partition moment
rows merge losslessly by addition (persist the moment row per ingest
batch, get the corr matrix of any date range by summing — same contract
as the sketches in operators/sketch.py, but exact).

Beyond-reference capability (rizac/stream2segment computes fixed exact
DB aggregates in download/db/inspection/main.py); standard co-moment
identity corr = (n*Σxy - Σx*Σy) / (sqrt(n*Σxx - Σx²) * sqrt(n*Σyy - Σy²)).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def moment_sums(df: DataFrame, scales: dict[str, int],
                group_cols: list[str] | None = None,
                method: str = "long") -> DataFrame:
    """One row (per group) of exact co-moment sums for the given
    columns: ``n`` plus ``s_<c>`` (Σ of the fixed-point value) and
    ``s_<a>_<b>`` (Σ of products, ``a <= b`` in dict order) — every
    value DECIMAL(38,0). ``scales`` maps column -> decimal digits to
    keep (``2`` = quantize to hundredths). Rows with a NULL in ANY
    measure column are dropped (the matrix must be over one common row
    set). Moment rows for disjoint slices merge by plain addition
    (:func:`merge_moments`).

    ``method`` picks the product arithmetic (OUTPUT is bit-identical
    either way — same exact integer sums):

    - ``"long"`` (default): per-row products ``q_a * q_b`` are computed
      in int64 (whole-stage-codegen multiply) and cast to
      DECIMAL(38,0) only at the accumulator; the per-row BigDecimal
      multiply is what dominates the full-decimal pass (measured 1.8x
      at 6M rows, PLANS.md round-5 A/B). Sums stay DECIMAL — no
      row-count bound. Rows where either operand exceeds
      ``±floor(sqrt(2^63-1))`` (|q| > ~3.03e9 — product could overflow
      int64) route through the decimal multiply via a per-row range
      guard, so oversized quantized magnitudes are handled, not raised
      (r6 ADVICE: the unguarded r5 form failed mid-job with
      ARITHMETIC_OVERFLOW under ANSI). With ANSI off this function
      still selects the decimal path wholesale: without ANSI a bug in
      the guard bound would wrap silently, and decimal is wrap-proof.
    - ``"decimal"``: products in DECIMAL(38,0) too — no int64 path.

    OUTPUT is bit-identical for every method/guard combination: all
    paths compute the same exact integer products.
    """
    if len(scales) < 2:
        raise ValueError(f"need at least 2 columns, got {list(scales)}")
    if method not in ("long", "decimal"):
        raise ValueError(f"method must be 'long' or 'decimal': {method!r}")
    cols = list(scales)
    group_cols = list(group_cols or [])
    base = df.na.drop(subset=cols)
    q = {c: F.round(F.col(c).cast("double") * F.lit(float(10 ** s)), 0)
         .cast("long") for c, s in scales.items()}
    ansi = str(df.sparkSession.conf.get(
        "spark.sql.ansi.enabled", "true")).lower() == "true"
    long_products = method == "long" and ansi
    # floor(sqrt(2^63 - 1)): |a|,|b| <= LIM  =>  |a*b| < 2^63. Plain
    # comparisons, not F.abs (abs(-2^63) itself overflows under ANSI).
    lim = 3_037_000_499

    def prod(a, b):
        dec = (q[a].cast(_DEC) * q[b].cast(_DEC)).cast(_DEC)
        if not long_products:
            return dec
        safe = ((q[a] >= -lim) & (q[a] <= lim)
                & (q[b] >= -lim) & (q[b] <= lim))
        # CASE branches evaluate lazily: the int64 multiply never runs
        # (so never raises) on rows routed to the decimal branch
        return F.when(safe, (q[a] * q[b]).cast(_DEC)).otherwise(dec)

    aggs = [F.count(F.lit(1)).cast(_DEC).alias("n")]
    aggs += [F.sum(q[c].cast(_DEC)).alias(f"s_{c}") for c in cols]
    aggs += [F.sum(prod(a, b)).alias(f"s_{a}_{b}")
             for i, a in enumerate(cols) for b in cols[i:]]
    return base.groupBy(*group_cols).agg(*aggs)


def merge_moments(*moment_rows: DataFrame,
                  group_cols: list[str] | None = None) -> DataFrame:
    """Sum per-slice moment rows (per group) into one — the lossless
    merge that makes persisting a moment row per ingest batch
    worthwhile."""
    if not moment_rows:
        raise ValueError("need at least one moment row")
    group_cols = list(group_cols or [])
    u = moment_rows[0]
    for t in moment_rows[1:]:
        u = u.unionByName(t)
    sums = [F.sum(c).cast(_DEC).alias(c) for c in u.columns
            if c not in group_cols]
    return u.groupBy(*group_cols).agg(*sums)


def corr_from_moments(moments: DataFrame, cols: list[str],
                      group_cols: list[str] | None = None) -> DataFrame:
    """Expand :func:`moment_sums` rows into the long-format correlation
    matrix ``(*group_cols, col_x, col_y, n, corr)`` for every unordered
    pair. All arithmetic up to the final casts stays DECIMAL (exact);
    ``corr`` is ``CAST(cov) / (sqrt(CAST(varx)) * sqrt(CAST(vary)))``
    — replayable bit-for-bit. A zero-variance column yields NULL corr
    (0/0)."""
    group_cols = list(group_cols or [])
    pairs = []
    for a, b in combinations(cols, 2):
        sab = f"s_{a}_{b}"
        cov = (F.col("n") * F.col(sab)
               - F.col(f"s_{a}") * F.col(f"s_{b}")).cast(_DEC)
        va = (F.col("n") * F.col(f"s_{a}_{a}")
              - F.col(f"s_{a}") * F.col(f"s_{a}")).cast(_DEC)
        vb = (F.col("n") * F.col(f"s_{b}_{b}")
              - F.col(f"s_{b}") * F.col(f"s_{b}")).cast(_DEC)
        denom = F.sqrt(va.cast("double")) * F.sqrt(vb.cast("double"))
        corr = F.when(denom != 0.0, cov.cast("double") / denom)
        pairs.append(F.struct(
            F.lit(a).alias("col_x"), F.lit(b).alias("col_y"),
            corr.alias("corr")))
    return (moments.select(*group_cols,
                           F.col("n").cast("long").alias("n"),
                           F.explode(F.array(*pairs)).alias("p"))
            .select(*group_cols, "p.col_x", "p.col_y", "n", "p.corr"))


def corr_matrix_exact(df: DataFrame, scales: dict[str, int],
                      group_cols: list[str] | None = None,
                      method: str = "long") -> DataFrame:
    """:func:`moment_sums` |> :func:`corr_from_moments`: the exact,
    engine-replayable correlation matrix (optionally per group) in one
    aggregation pass. ``method`` as in :func:`moment_sums` (int64
    per-row products by default under ANSI; ``"decimal"`` for
    quantized magnitudes beyond ~3e9)."""
    return corr_from_moments(moment_sums(df, scales, group_cols, method),
                             list(scales), group_cols)
