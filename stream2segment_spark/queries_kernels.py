"""Catalog entries: numeric kernels (SURVEY §2.9) driven through the
Arrow pandas-UDF path over ``embeddings.embedding`` (the testdata's stand-in
for per-segment sample arrays), with DuckDB list-function oracles.

These strongly check the *whole UDF path*: Arrow serialization, batch
stacking, the numpy kernel, and result alignment back to rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream2segment_spark.funclib import udfs as U
from stream2segment_spark.operators.similarity import dot_expr
from stream2segment_spark.queries_catalog import register
from stream2segment_spark.schema import load_table


@register(
    "kernel_metrics",
    # driver-green r2+r3; deferred for the round-4 dedup_canonical_best
    oracle="""WITH u AS (
         SELECT vec_id, i.i AS pos, (embedding[i.i]::DOUBLE)^2 AS sq
         FROM embeddings, range(1, 65) i(i)),
       c AS (
         SELECT vec_id, pos,
                sum(sq) OVER (PARTITION BY vec_id ORDER BY pos) AS cum
         FROM u),
       n AS (
         SELECT vec_id, pos,
                (cum - first_value(cum) OVER w) /
                (last_value(cum) OVER w - first_value(cum) OVER w) AS cn
         FROM c
         WINDOW w AS (PARTITION BY vec_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
       q AS (
         SELECT vec_id,
                count(*) FILTER (cn < 0.05) AS i05,
                count(*) FILTER (cn < 0.50) AS i50,
                count(*) FILTER (cn < 0.95) AS i95
         FROM n GROUP BY vec_id),
       s AS (
         SELECT vec_id,
                list_sum(list_transform(embedding[1:32],
                                        x -> (x::DOUBLE)^2)) / 32 AS ps,
                list_sum(list_transform(embedding[33:64],
                                        x -> (x::DOUBLE)^2)) / 32 AS pn,
                list_sum(list_transform(embedding, x -> (x::DOUBLE)^2)) AS en
         FROM embeddings)
       SELECT q.vec_id, q.i05, q.i50, q.i95,
              CASE WHEN s.pn != 0 THEN round(sqrt(s.ps / s.pn), 6) END AS snr,
              round(s.en, 6) AS energy,
              round(sqrt(s.en / 64), 6) AS rms
       FROM q JOIN s ON q.vec_id = s.vec_id""",
    gate=False,
)
def kernel_metrics(spark, sf_dir):
    """N4 + N6 + energy/RMS in one embeddings-grain entry (the gate caps
    the checked-query count, so same-grain kernels share an entry):

    - i05/i50/i95: N6 cumsumsq + the sn-window quantile search
      (traces.py:140-143) — Arrow batch -> np.cumsum -> searchsorted;
    - snr: N4 amplitude SNR, first half of each vector as 'signal', second
      as 'noise' (NULL when noise power is 0), via the pandas-UDF adapter;
    - energy/rms: pure built-in aggregate/transform expressions — the
      JVM-side fast path for simple kernels, no UDF at all."""
    emb = load_table(spark, sf_dir, "embeddings")
    sig = F.slice(F.col("embedding"), 1, 32)
    noise = F.slice(F.col("embedding"), 33, 32)
    v = F.transform("embedding", lambda x: x.cast("double"))
    energy = F.aggregate(F.transform(v, lambda x: x * x),
                         F.lit(0.0), lambda a, b: a + b)
    snr_raw = U.snr_amp_udf()(sig, noise)
    return emb.select(
        "vec_id",
        U.quantile_index_udf(0.05)(F.col("embedding")).alias("i05"),
        U.quantile_index_udf(0.50)(F.col("embedding")).alias("i50"),
        U.quantile_index_udf(0.95)(F.col("embedding")).alias("i95"),
        F.when(~F.isnan(snr_raw), F.round(snr_raw, 6)).alias("snr"),
        F.round(energy, 6).alias("energy"),
        F.round(F.sqrt(energy / 64), 6).alias("rms"))
