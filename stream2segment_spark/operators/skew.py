"""Skew-aware join (salting) — the manual complement to AQE's skew-join
splitting for the cases AQE cannot fix (e.g. a broadcast-ineligible dim
joined on a power-law key, or pre-AQE shuffle stages).

Classic construction, semantics-preserving:

- the BIG side gets a deterministic salt ``pmod(xxhash64(row-id cols), n)``
  appended to the join key, splitting each hot key's rows across ``n``
  shuffle partitions;
- the SMALL side is replicated n times (explode over 0..n-1) so every
  (key, salt) bucket finds its match.

Join output is row-for-row identical to the unsalted join (gate-checked
by the ``join_salted_skew`` catalog entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``on``, salted with ``n_salts``
    buckets per key. ``salt_source``: columns of ``big`` that determine the
    salt (defaults to all non-key columns, keeping the salt deterministic
    and well-spread; a monotonic id works too).

    ``how`` is restricted to the join types where replicating the small
    side preserves row-for-row equivalence with the unsalted join:
    unmatched SMALL-side rows exist ``n_salts`` times after the explode,
    so right/full outer (which emit them) would duplicate each one
    ``n_salts``-fold."""
    ok_how = ("inner", "left", "leftouter", "left_outer", "semi",
              "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
              "cross")
    if how.lower() not in ok_how:
        raise ValueError(
            f"salted_join does not preserve {how!r} semantics (the "
            f"replicated small side would emit unmatched rows "
            f"{n_salts}x); use one of {ok_how} or an unsalted join")
    src = salt_source or [c for c in big.columns if c not in on] or on
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(n_salts))
    b = big.withColumn("__salt", salt.cast("int"))
    s = small.withColumn(
        "__salt",
        F.explode(F.transform(F.sequence(F.lit(0), F.lit(n_salts - 1)),
                              lambda x: x.cast("int"))))
    out = b.join(s, on + ["__salt"], how)
    return out.drop("__salt")
