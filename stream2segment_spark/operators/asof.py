"""As-of (backward) join — an operator Spark's DataFrame API lacks
(pandas has merge_asof; DuckDB has ASOF JOIN, which is the gate oracle).

For each left row, attach the right row with the greatest ``right.ts <=
left.ts`` within the same key group (optionally within ``tolerance``
seconds). The training-data shape: join facts to the most recent
dimension state (latest model version, user status, calibration epoch)
without an expensive range join.

Spark-first construction (no per-key collects, no range join):

1. union the tagged left/right rows (right rows carry the payload,
   left rows carry NULL payload);
2. one window per key ordered by (ts, tag) with rows UNBOUNDED PRECEDING
   -> CURRENT ROW: ``last(payload, ignoreNulls=True)`` gives every left
   row the latest right payload at-or-before its timestamp (right sorts
   BEFORE left at equal ts -> inclusive semantics);
3. keep left rows; tolerance filters on the carried right timestamp.

One shuffle on the key — the same cost as a plain equi-join — versus the
naive ``left.ts >= right.ts`` range join whose pair count is quadratic
per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream2segment_spark.operators.upsert import _contains_map


def _order_key(right: DataFrame, on: str, value_cols: list[str]):
    """The deterministic tie-break sort key for right rows with EQUAL
    timestamps: a struct of (ts, orderable value columns). Map-typed
    value columns stay in the carried payload (they are output) but are
    excluded HERE — maps are not orderable in Spark, and sorting a
    struct that nests one raises DATATYPE_MISMATCH; ties among rows
    identical except for a map column fall back to the remaining
    columns."""
    orderable = [c for c in value_cols
                 if not _contains_map(right.schema[c].dataType)]
    if value_cols and not orderable:
        import warnings
        warnings.warn(
            "asof join: every value column is map-typed "
            f"({value_cols}) — equal-timestamp ties have no "
            "deterministic winner (NOT replayable)", stacklevel=3)
    return F.struct(F.col(on).alias("__ts"),
                    *[F.col(c) for c in orderable])


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str] | None = None,
    tolerance_sec: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the most recent ``right``
    values (``value_cols``, default: all non-key non-time columns) at or
    before its ``on`` timestamp, per ``by`` group; unmatched (or outside
    ``tolerance_sec``) rows keep NULLs. Output columns: left's, plus
    ``<value><suffix>`` and ``<on><suffix>`` (the matched timestamp)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in by and c != on]
    payload = F.struct(F.col(on).alias("__ts"),
                       *[F.col(c) for c in value_cols])
    ordkey = _order_key(right, on, value_cols)
    r = right.select(
        *by, F.col(on), F.lit(0).alias("__tag"),
        payload.alias("__payload"), ordkey.alias("__ord"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by and c != on])
    l = left.select(
        *by, F.col(on), F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(None).cast(r.schema["__ord"].dataType).alias("__ord"),
        *[F.col(c) for c in left.columns if c not in by and c != on])
    u = r.unionByName(l)

    # __ord as the final sort key makes ties among right rows with
    # EQUAL timestamps deterministic (last -> greatest payload wins) —
    # without it the matched payload depends on shuffle order, breaking
    # replayability (map-typed value columns are carried but excluded
    # from the key; see _order_key)
    w = (Window.partitionBy(*by)
         .orderBy(F.col(on), F.col("__tag"), F.col("__ord"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
    out = u.filter(F.col("__tag") == 1)
    if tolerance_sec is not None:
        in_tol = (F.col(on).cast("double")
                  - F.col("__m.__ts").cast("double")) <= tolerance_sec
        out = out.withColumn(
            "__m", F.when(in_tol, F.col("__m")))
    sel = ([F.col(c) for c in left.columns]
           + [F.col(f"__m.{c}").alias(c + suffix) for c in value_cols]
           + [F.col("__m.__ts").alias(on + suffix)])
    return out.select(*sel)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    by: list[str] | None = None,
    bucket_sec: float = 3600.0,
    max_buckets: int = 4096,
) -> DataFrame:
    """Interval join: pairs whose [start, end) windows overlap
    (``l.start < r.end AND r.start < l.end``), optionally within ``by``
    equi-keys — the other classic operator Spark's API lacks.

    Banded construction (mirrors the spatial join): each interval explodes to
    the time buckets it touches; candidates come from a bucket equi-join
    (plus ``by``) and the exact overlap predicate filters. A pair touching
    several common buckets is emitted exactly once by its CLAIMING bucket —
    the bucket of ``greatest(l.start, r.start)`` (the overlap's first
    instant, which both intervals necessarily cover) — so no wide-row
    ``distinct()`` re-shuffle, and genuine duplicate input rows keep their
    multiplicity (inequality-join semantics). Pair work scales with bucket
    density, never |L|x|R|.

    **Skew guard**: a pathological interval spanning more than
    ``max_buckets`` buckets (a years-long row under an hourly bucket)
    would explode into that many candidate rows AND overlap nearly
    everything — the classic banded-join blowup. Such WIDE rows are
    routed off the banded path: they are few by definition (or the data
    is all-overlapping and no banding can help), so they broadcast-join
    the other side with the raw overlap predicate instead. The three
    legs (narrow x narrow banded, wide-left x all, narrow-left x
    wide-right) partition the pair space exactly, so output multiset
    semantics are unchanged.
    """
    if bucket_sec <= 0:
        raise ValueError(f"bucket_sec must be positive, got {bucket_sec}")
    if max_buckets <= 0:
        raise ValueError(f"max_buckets must be positive, got {max_buckets}")
    by = by or []
    ls, le = left_bounds
    rs, re_ = right_bounds

    def width_ok(df, s, e):
        return (F.floor(F.col(e).cast("double") / bucket_sec)
                - F.floor(F.col(s).cast("double") / bucket_sec)
                ) < max_buckets

    def bucketize(df, s, e):
        b = F.explode(F.sequence(
            F.floor(F.col(s).cast("double") / bucket_sec),
            F.floor(F.col(e).cast("double") / bucket_sec)))
        return df.withColumn("__bucket", b)

    narrow_l = left.filter(width_ok(left, ls, le))
    wide_l = left.filter(~width_ok(left, ls, le))
    narrow_r = right.filter(width_ok(right, rs, re_))
    wide_r = right.filter(~width_ok(right, rs, re_))

    overlap = ((F.col(f"l.{ls}") < F.col(f"r.{re_}"))
               & (F.col(f"r.{rs}") < F.col(f"l.{le}")))
    out_cols = ([F.col(f"l.{c}") for c in left.columns]
                + [F.col(f"r.{c}").alias(c if c not in left.columns
                                         else c + "_r")
                   for c in right.columns if c not in by])

    def by_cond(base):
        cond = base
        for k in by:
            cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
        return cond

    # leg 1: narrow x narrow through the banded equi-join
    l = bucketize(narrow_l, ls, le).alias("l")
    r = bucketize(narrow_r, rs, re_).alias("r")
    claiming = F.col("l.__bucket") == F.floor(
        F.greatest(F.col(f"l.{ls}").cast("double"),
                   F.col(f"r.{rs}").cast("double")) / bucket_sec)
    banded = (l.join(
        r, by_cond(F.col("l.__bucket") == F.col("r.__bucket"))
        & overlap & claiming).select(*out_cols))

    # legs 2+3: wide rows broadcast against the other side (wide x wide
    # lives in leg 2 only, so the three legs tile the pair space)
    wide_legs = (
        F.broadcast(wide_l.alias("l")).join(
            right.alias("r"), by_cond(overlap)).select(*out_cols)
        .unionByName(
            narrow_l.alias("l").join(
                F.broadcast(wide_r.alias("r")),
                by_cond(overlap)).select(*out_cols)))
    return banded.unionByName(wide_legs)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str] | None = None,
    tolerance_sec: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Forward as-of join: every ``left`` row + the EARLIEST ``right``
    values at or after its ``on`` timestamp per ``by`` group (pandas
    ``merge_asof(direction='forward')``). Same one-shuffle tagged-union
    window construction as :func:`asof_join_backward`, mirrored: right
    rows sort AFTER left at equal timestamps (inclusive semantics) and
    ``first(payload) over (CURRENT ROW -> UNBOUNDED FOLLOWING)``
    carries the match backward."""
    value_cols = value_cols or [
        c for c in right.columns if c not in by and c != on]
    payload = F.struct(F.col(on).alias("__ts"),
                       *[F.col(c) for c in value_cols])
    ordkey = _order_key(right, on, value_cols)
    r = right.select(
        *by, F.col(on), F.lit(2).alias("__tag"),
        payload.alias("__payload"), ordkey.alias("__ord"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by and c != on])
    l = left.select(
        *by, F.col(on), F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(None).cast(r.schema["__ord"].dataType).alias("__ord"),
        *[F.col(c) for c in left.columns if c not in by and c != on])
    u = r.unionByName(l)
    # deterministic tie-break on equal right timestamps (first ->
    # least payload wins); see asof_join_backward/_order_key
    w = (Window.partitionBy(*by)
         .orderBy(F.col(on), F.col("__tag"), F.col("__ord"))
         .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    u = u.withColumn("__m", F.first("__payload", ignorenulls=True).over(w))
    out = u.filter(F.col("__tag") == 1)
    if tolerance_sec is not None:
        in_tol = (F.col("__m.__ts").cast("double")
                  - F.col(on).cast("double")) <= tolerance_sec
        out = out.withColumn("__m", F.when(in_tol, F.col("__m")))
    sel = ([F.col(c) for c in left.columns]
           + [F.col(f"__m.{c}").alias(c + suffix) for c in value_cols]
           + [F.col("__m.__ts").alias(on + suffix)])
    return out.select(*sel)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str] | None = None,
    tolerance_sec: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Nearest as-of join: every ``left`` row + the ``right`` values
    whose timestamp is CLOSEST (either direction; ties -> the backward
    match, pandas ``direction='nearest'`` semantics) per ``by`` group.

    Single-pass construction: right rows enter the union TWICE (tags 0
    and 2, so at equal timestamps one copy sorts before the left row
    for the inclusive backward window and one after for the inclusive
    forward window); one shuffle + one sort serves both window
    functions, then a per-row comparison of |delta| picks the side.
    The right side is the dimension by contract, so duplicating it is
    cheaper than a second shuffle of the fact side."""
    value_cols = value_cols or [
        c for c in right.columns if c not in by and c != on]
    payload = F.struct(F.col(on).alias("__ts"),
                       *[F.col(c) for c in value_cols])

    ordkey = _order_key(right, on, value_cols)

    def tagged_right(tag: int):
        return right.select(
            *by, F.col(on), F.lit(tag).alias("__tag"),
            payload.alias("__payload"), ordkey.alias("__ord"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left.columns if c not in by and c != on])

    r0 = tagged_right(0)
    l = left.select(
        *by, F.col(on), F.lit(1).alias("__tag"),
        F.lit(None).cast(r0.schema["__payload"].dataType)
         .alias("__payload"),
        F.lit(None).cast(r0.schema["__ord"].dataType).alias("__ord"),
        *[F.col(c) for c in left.columns if c not in by and c != on])
    u = r0.unionByName(tagged_right(2)).unionByName(l)
    back_payload = F.when(F.col("__tag") == 0, F.col("__payload"))
    fwd_payload = F.when(F.col("__tag") == 2, F.col("__payload"))
    # __ord tie-break: deterministic winner among right rows with
    # equal timestamps (see asof_join_backward/_order_key)
    order = [F.col(on), F.col("__tag"), F.col("__ord")]
    wb = (Window.partitionBy(*by).orderBy(*order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(*by).orderBy(*order)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    u = (u.withColumn("__mb", F.last(back_payload, ignorenulls=True)
                      .over(wb))
          .withColumn("__mf", F.first(fwd_payload, ignorenulls=True)
                      .over(wf)))
    out = u.filter(F.col("__tag") == 1)
    ts = F.col(on).cast("double")
    db = ts - F.col("__mb.__ts").cast("double")
    df_ = F.col("__mf.__ts").cast("double") - ts
    if tolerance_sec is not None:
        out = (out.withColumn("__mb", F.when(db <= tolerance_sec,
                                             F.col("__mb")))
                  .withColumn("__mf", F.when(df_ <= tolerance_sec,
                                             F.col("__mf"))))
    # closest wins; ties -> backward; a NULL side loses automatically
    pick = (F.when(F.col("__mb").isNull(), F.col("__mf"))
             .when(F.col("__mf").isNull(), F.col("__mb"))
             .when(df_ < db, F.col("__mf"))
             .otherwise(F.col("__mb")))
    out = out.withColumn("__m", pick)
    sel = ([F.col(c) for c in left.columns]
           + [F.col(f"__m.{c}").alias(c + suffix) for c in value_cols]
           + [F.col("__m.__ts").alias(on + suffix)])
    return out.select(*sel)
