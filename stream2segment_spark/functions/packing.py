"""Greedy sequence packing for training-chunk assembly (beyond-reference,
LLM-pipeline capability; no reference counterpart).

Pretraining loaders consume fixed-token-budget chunks, so the corpus
pipeline must assign every document to a (shard, chunk) deterministically
— same assignment on every run, every engine, every partitioning.

Mechanism: documents are sharded by the md5 hash bucket (uniform, keyed
by id — see :mod:`stream2segment_spark.functions.sampling`), ordered by
id *within* a shard, and a document joins the chunk its cumulative start
offset falls in (start-offset packing: documents are never split, so a
chunk's token fill may EXCEED the budget by up to one document — fill is
bounded by ``budget + max_doc_tokens``, which the tests lock in). The
result is reproducible bin packing with bounded overfill and no global
sort; loaders that need a hard ceiling should size their buffer to that
bound, not to ``budget``.

Scale story (100 TB): the only shuffle is the window partition on the
shard key. Shards are uniform by construction (md5 of the id), so there
is no skew; ``n_shards`` sets the packing parallelism — size it to the
cluster (thousands), not to the default here. A global ORDER BY would
funnel the corpus through one task; sharding is what makes packing
embarrassingly parallel, at the cost of chunk numbering being
per-shard (chunk identity is the (shard, chunk_id) pair).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stream2segment_spark.functions.sampling import hash_bucket


def pack_greedy(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int = 2048,
    n_shards: int = 64,
    seed: str = "pack",
) -> DataFrame:
    """Append ``shard`` and ``chunk_id`` columns (see module docstring).

    ``chunk_id = floor(start_offset / budget)`` where ``start_offset`` is
    the running token total of all earlier docs in the shard (id order).
    Deterministic: engine-replayable via the documented md5 bucket and a
    plain windowed sum — the DuckDB twin is
    ``sum(tokens) OVER (PARTITION BY shard ORDER BY id
    ROWS UNBOUNDED PRECEDING)``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    shard: Column = F.pmod(hash_bucket(F.col(id_col), seed),
                           F.lit(n_shards)).cast("int")
    out = df.withColumn("shard", shard)
    w = (Window.partitionBy("shard").orderBy(F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.col(tokens_col).cast("long")).over(w)
    start = cum - F.col(tokens_col).cast("long")
    # Integer division (SQL `div`), not floor(double /): past 2^53
    # cumulative tokens a double quotient can round a boundary into the
    # wrong chunk.
    return (out.withColumn("__start", start)
            .withColumn("chunk_id", F.expr(f"__start div {int(budget)}"))
            .drop("__start"))


def chunk_summary(packed: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    """Per-chunk rollup of a :func:`pack_greedy` result: doc count, token
    fill, id range. Map-side-combined groupBy on (shard, chunk_id)."""
    return packed.groupBy("shard", "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("sum_tokens"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    )
