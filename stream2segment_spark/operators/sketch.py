"""Distributed cardinality and frequency sketches (HyperLogLog,
Count-Min) as plain DataFrame aggregations.

Beyond-reference capability for the 100 TB profile: exact
``COUNT(DISTINCT)`` over a high-cardinality column is a full shuffle of
every distinct value; a heavy-hitter scan is a full groupBy over every
key. The sketches here bound both to tiny, map-side-combinable state:

- **HyperLogLog** (Flajolet et al. 2007): one shuffle of at most
  ``m`` (register, max-rho) integer pairs per group, independent of
  cardinality. Partial ``max`` combines map-side, so executors emit
  ``m`` rows each no matter how many values they scanned.
- **Count-Min** (Cormode & Muthukrishnan 2005): one shuffle of at most
  ``depth * width`` counters per partition (partial ``sum`` combines
  map-side); point lookups then estimate any key's frequency with an
  over-count bounded by ``e * N / width`` at confidence
  ``1 - e^-depth`` — without ever grouping by the key itself.

Everything is engine-replayable by construction (the determinism
contract of this repo): hashes are 60-bit integers from ``md5`` (exists
in every engine), register updates are integer ``max``/``sum``, and the
one floating-point reduction (the HLL harmonic sum) is an explicit
register-ordered fold so DuckDB/Trino replay it bit-for-bit
(``list_reduce(list(term ORDER BY register))``). No ``log``/``pow``
anywhere: ``2^-rho`` is computed by integer shift then cast, which is
exact in IEEE 754.

The raw HLL estimator is returned WITHOUT the small-range
(linear-counting) correction, which needs ``ln`` — not bit-portable
across engines. Callers that want it get the inputs (``n_regs``,
``m``) and can apply ``m * ln(m / (m - n_regs))`` driver-side; for
corpus-scale cardinalities (``n >> 5/2 m``) the raw estimator is the
published one.

No counterpart in the reference (rizac/stream2segment): its dstats
reporting (stream2segment/download/db/inspection/main.py) computes
exact aggregates on a database. These sketches are the scale path for
the same questions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex chars of md5: fits a signed 64-bit int exactly


def hash60(col: Column, seed: str) -> Column:
    """Deterministic uniform 60-bit non-negative integer from
    ``md5(seed:value)``. DuckDB twin:
    ``CAST('0x' || substr(md5(seed || ':' || CAST(v AS VARCHAR)), 1, 15)
    AS BIGINT)``."""
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string"))), 1, 15),
        16, 10).cast("long")


def _check_m(m: int) -> int:
    b = m.bit_length() - 1
    if m <= 1 or (1 << b) != m or m > 4096:
        raise ValueError(f"m must be a power of two in [2, 4096], got {m}")
    return b


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    m: int = 64,
    seed: str = "hll",
) -> DataFrame:
    """The HLL register table: one row per (group, register) with the
    maximum leading-zero rank ``rho`` observed. This IS the sketch —
    integer-valued, mergeable (max), and the gate-checkable artifact.

    ``register = h % m`` (stochastic averaging bucket), ``rho`` = 1 +
    leading zeros of the remaining ``60 - log2(m)`` bits, computed with
    no float math as ``p - length(bin(w)) + 1`` (``w = h div m``;
    ``w = 0`` gives the maximum rank ``p + 1``). NULL values are
    skipped (COUNT(DISTINCT) semantics — a NULL would otherwise hash
    to a NULL register row).
    """
    b = _check_m(m)
    p = HASH_BITS - b
    group_cols = list(group_cols or [])
    h = hash60(F.col(value_col), seed)
    w = F.expr(f"__h div {m}")
    rho = F.when(w == 0, F.lit(p + 1)) \
        .otherwise(F.lit(p) - F.length(F.bin(w)) + F.lit(1))
    hashed = df.where(F.col(value_col).isNotNull()) \
        .select(*group_cols, h.alias("__h"))
    return (hashed
            .select(*group_cols, F.pmod("__h", F.lit(m)).alias("register"),
                    rho.cast("int").alias("__rho"))
            .groupBy(*group_cols, "register")
            .agg(F.max("__rho").alias("rho")))


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    m: int = 64,
) -> DataFrame:
    """Collapse a register table into the raw HLL cardinality estimate
    ``alpha_m * m^2 / (zero_registers + sum(2^-rho))``.

    The harmonic sum is an explicit register-ordered left fold (Spark
    ``F.aggregate`` over the array_sort-ed collected registers) so that
    any engine replays the identical double-addition sequence; each term
    ``2^-rho`` is an integer shift then cast — IEEE-exact. ``alpha_m *
    m^2`` is folded into ONE Python-computed double literal so there is
    no cross-engine multiplication-order question at all.
    """
    _check_m(m)
    group_cols = list(group_cols or [])
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    am2 = alpha * (m * m)  # one literal; repr(am2) round-trips exactly
    term = F.expr("CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), rho) AS DOUBLE)")
    per_reg = registers.select(*group_cols, "register", term.alias("__term"))
    agg = per_reg.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("register", "__term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["__term"],
        ).alias("__s"))
    s_total = (F.lit(m) - F.col("n_regs")).cast("double") + F.col("__s")
    return agg.select(
        *group_cols,
        F.col("n_regs").cast("int").alias("n_regs"),
        (F.lit(am2) / s_total).alias("est_distinct"))


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    m: int = 64,
    seed: str = "hll",
) -> DataFrame:
    """``hll_registers`` |> ``hll_estimate``: per-group approximate
    distinct counts in one bounded shuffle. Standard error ~= 1.04 /
    sqrt(m) (Flajolet et al. 2007, Thm 1)."""
    regs = hll_registers(df, value_col, group_cols, m=m, seed=seed)
    return hll_estimate(regs, group_cols, m=m)


def cms_sketch(
    df: DataFrame,
    value_col: str,
    width: int = 128,
    depth: int = 3,
    seed: str = "cms",
) -> DataFrame:
    """Build a Count-Min sketch of the frequency distribution of
    ``value_col``: a ``(row, bucket, cnt)`` table with ``depth`` hash
    rows of ``width`` counters. Each input row increments one bucket per
    hash row; partial sums combine map-side, so the shuffle is bounded
    by ``depth * width`` counters per partition regardless of input
    size. Rows whose value is NULL are skipped (no bucket)."""
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1; got {width}/{depth}")
    cells = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(hash60(F.col(value_col), f"{seed}{i}"),
                        F.lit(width)).alias("bucket"))
        for i in range(depth)])
    return (df.where(F.col(value_col).isNotNull())
            .select(F.explode(cells).alias("c"))
            .groupBy(F.col("c.row").alias("row"),
                     F.col("c.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 128,
    depth: int = 3,
    seed: str = "cms",
) -> DataFrame:
    """Point-estimate the frequency of each distinct value in ``items``
    from a ``cms_sketch`` table: ``est_cnt = min over hash rows of the
    addressed counter`` (>= the true count, never below). Items that hit
    an empty bucket (value never seen AND no collision) estimate 0 via
    the left-join coalesce. The sketch side is tiny (``depth * width``
    rows) — broadcast it so the probe never shuffles."""
    probes = (items.select(F.col(item_col).alias("item")).distinct()
              .select("item", F.explode(F.array(*[
                  F.struct(F.lit(i).alias("row"),
                           F.pmod(hash60(F.col("item"), f"{seed}{i}"),
                                  F.lit(width)).alias("bucket"))
                  for i in range(depth)])).alias("c"))
              .select("item", "c.row", "c.bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (joined.groupBy("item")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_cnt")))


def hist_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram sketch of a numeric column: one row per
    (group, bin) with the row count — the mergeable quantile/distribution
    sketch that completes the HLL (distinct) / CMS (frequency) family.

    At 100 TB an exact percentile is a full sort (or a full
    ``percentile_approx`` pass that cannot be persisted or merged); this
    table is at most ``n_bins`` counters per group, partial ``sum``
    combines map-side, and day/partition sketches merge losslessly by
    addition (:func:`hist_merge`) — write one per ingest batch, answer
    "p99 over any date range" later without rescanning.

    Binning is engine-replayable by construction: ``bin_width`` is ONE
    Python double literal shared with any oracle, ``bin =
    clamp(floor((x - lo) / bin_width), 0, n_bins - 1)`` uses only
    ``-``/``/``/``floor`` (all IEEE-portable), and out-of-range values
    clamp into the edge bins so the total count is preserved. NULLs are
    skipped."""
    if n_bins < 2 or n_bins > 65536:
        raise ValueError(f"n_bins must be in [2, 65536], got {n_bins}")
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    bw = (hi - lo) / n_bins  # one double literal; repr() round-trips
    group_cols = list(group_cols or [])
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(lo)) / F.lit(bw))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (df.where(F.col(value_col).isNotNull())
            .select(*group_cols, b.cast("int").alias("bin"))
            .groupBy(*group_cols, "bin")
            .agg(F.count(F.lit(1)).alias("cnt")))


def hist_quantiles(
    hist: DataFrame,
    qs: tuple[float, ...],
    lo: float,
    hi: float,
    n_bins: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Estimate quantiles from a :func:`hist_sketch` table by linear
    interpolation inside the covering bin: for each ``q`` the target rank
    is ``q * N``; the answer bin is the FIRST bin whose cumulative count
    reaches the target, and the estimate is

    ``lo + (bw * bin) + bw * ((target - cum_before) / cnt)``

    (parenthesization fixed — every float op is +/*// so an oracle
    replays it bit-for-bit). Error is bounded by one bin width wherever
    the true quantile lies inside [lo, hi]. ``qs`` must be in (0, 1]."""
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    bw = (hi - lo) / n_bins
    group_cols = list(group_cols or [])
    from pyspark.sql import Window
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("bin")
    cum = hist.select(
        *group_cols, "bin", "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_before"),
        F.sum("cnt").over(w).alias("cum_after"),
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding,
                                        Window.unboundedFollowing))
        .alias("n_total"))
    qdf = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    probes = cum.select(*group_cols, "bin", "cnt", "cum_before",
                        "cum_after", "n_total", qdf)
    target = F.col("q") * F.col("n_total").cast("double")
    hit = probes.where(F.col("cum_after").cast("double") >= target)
    first = Window.partitionBy(*group_cols, "q").orderBy("bin")
    est = (F.lit(lo)
           + (F.lit(bw) * F.col("bin").cast("double"))
           + F.lit(bw) * ((target - F.col("cum_before").cast("double"))
                          / F.col("cnt").cast("double")))
    return (hit.withColumn("__rn", F.row_number().over(first))
            .where(F.col("__rn") == 1)
            .select(*group_cols, "q", F.col("bin").alias("q_bin"),
                    est.alias("q_value")))


def hist_merge(
    *hists: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge histogram sketches built with identical (lo, hi, n_bins) by
    per-bin addition — lossless (sum is associative/commutative), the
    property that makes per-partition sketch persistence work."""
    if not hists:
        raise ValueError("need at least one histogram table")
    group_cols = list(group_cols or [])
    u = hists[0]
    for t in hists[1:]:
        u = u.unionByName(t)
    return u.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def hll_merge(
    *register_tables: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge HLL register tables (element-wise max) — the operation that
    makes the sketch worth persisting: write one register table per
    day/partition/source, answer "distinct over any range/union" later
    by merging the tiny tables instead of rescanning the data. Lossless:
    merged registers equal the registers of the unioned raw inputs
    (max is associative/commutative/idempotent)."""
    if not register_tables:
        raise ValueError("need at least one register table")
    group_cols = list(group_cols or [])
    u = register_tables[0]
    for t in register_tables[1:]:
        u = u.unionByName(t)
    return (u.groupBy(*group_cols, "register")
            .agg(F.max("rho").alias("rho")))
