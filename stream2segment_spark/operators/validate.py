"""Data-quality validation: assert a rule contract over a table in ONE
aggregation pass and report per-rule pass/fail with the measured value.

The warehouse-hygiene counterpart of :mod:`.profile` (measure) — this
module *asserts*: each rule compiles to one aggregate expression, all
rules evaluate in a single ``agg()`` scan (map-side combined — at
100 TB the validation costs one pass regardless of rule count), and the
report is a tiny long-format DataFrame ``(col_name, rule, value,
threshold, ok)``. Uniqueness is the one exception: ``unique`` needs a
distinct count, which is exact here (``count_distinct`` inside the same
single pass — Spark plans it as an expand, still one scan) because an
approximate uniqueness check cannot *prove* a key.

Rules (per column):
- ``not_null_frac``: fraction of non-null values must be >= threshold
- ``min_ge`` / ``max_le``: observed min/max bounds
- ``unique``: no duplicate non-null values
- ``allowed_values``: every non-null value in the given list
- ``matches``: every non-null value matches the regex (strings)

No counterpart in the reference (its schema is enforced by the RDBMS);
this is what replaces DB constraints on immutable columnar storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

_KNOWN = ("not_null_frac", "min_ge", "max_le", "unique",
          "allowed_values", "matches")


def validate_table(df: DataFrame, rules: dict[str, dict]) -> DataFrame:
    """Evaluate ``rules`` (``{column: {rule: threshold, ...}}``) and
    return the report frame. Raises on unknown columns/rules up front —
    a contract typo must fail loudly, not pass vacuously."""
    missing = [c for c in rules if c not in df.columns]
    if missing:
        raise ValueError(f"rules name absent column(s): {missing}")
    for c, rs in rules.items():
        bad = [r for r in rs if r not in _KNOWN]
        if bad:
            raise ValueError(f"unknown rule(s) for {c!r}: {bad} "
                             f"(known: {_KNOWN})")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, rs in rules.items():
        col = F.col(c)
        if "not_null_frac" in rs:
            aggs.append(F.count(col).alias(f"__nn_{c}"))
        if "min_ge" in rs:
            aggs.append(F.min(col).cast("double").alias(f"__min_{c}"))
        if "max_le" in rs:
            aggs.append(F.max(col).cast("double").alias(f"__max_{c}"))
        if "unique" in rs:
            aggs.append(F.count(col).alias(f"__cnt_{c}"))
            aggs.append(F.count_distinct(col).alias(f"__dst_{c}"))
        if "allowed_values" in rs:
            vals = rs["allowed_values"]
            aggs.append(F.sum((~col.isin(*vals) & col.isNotNull())
                              .cast("long")).alias(f"__bad_{c}"))
        if "matches" in rs:
            # rlike is find-anywhere; anchor so 'matches' asserts a
            # FULL-string match ('[0-9]+' must not pass 'a1b')
            rx = f"^(?:{rs['matches']})$"
            aggs.append(F.sum((~col.cast("string").rlike(rx)
                               & col.isNotNull()).cast("long"))
                        .alias(f"__rx_{c}"))
    m = df.agg(*aggs).first()
    rows = []
    n = m["__n"]
    for c, rs in rules.items():
        for rule, thr in rs.items():
            if rule == "not_null_frac":
                val = (m[f"__nn_{c}"] / n) if n else 1.0
                ok = val >= float(thr)
                rows.append((c, rule, float(val), float(thr), ok))
            elif rule == "min_ge":
                val = m[f"__min_{c}"]
                ok = val is None or val >= float(thr)
                rows.append((c, rule, val, float(thr), ok))
            elif rule == "max_le":
                val = m[f"__max_{c}"]
                ok = val is None or val <= float(thr)
                rows.append((c, rule, val, float(thr), ok))
            elif rule == "unique":
                dupes = m[f"__cnt_{c}"] - m[f"__dst_{c}"]
                rows.append((c, rule, float(dupes), 0.0,
                             (not thr) or dupes == 0))
            elif rule == "allowed_values":
                bad = m[f"__bad_{c}"] or 0
                rows.append((c, rule, float(bad), 0.0, bad == 0))
            elif rule == "matches":
                bad = m[f"__rx_{c}"] or 0
                rows.append((c, rule, float(bad), 0.0, bad == 0))
    spark = df.sparkSession
    return spark.createDataFrame(
        [Row(col_name=c, rule=r, value=v, threshold=t, ok=o)
         for c, r, v, t, o in rows],
        "col_name string, rule string, value double, threshold double, "
        "ok boolean")
