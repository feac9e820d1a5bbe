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


def chunk_documents(
    df: DataFrame,
    id_col: str,
    toks_col: str,
    window: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document's token array into fixed-size training
    windows with overlap (the chunking step between curation and
    packing: long documents become ``window``-token pieces, each
    starting ``window - overlap`` tokens after the previous, so no
    token span longer than ``overlap`` is lost at a boundary).

    Returns one row per chunk: ``(id, chunk_idx, chunk_toks, n_chunk)``
    where ``chunk_idx`` is 0-based and ``chunk_toks`` is the token
    slice. Every document yields at least one chunk (empty/null arrays
    yield one empty chunk, keeping the doc addressable downstream); the
    last chunk is the only one shorter than ``window``.

    Scale shape: MAP-ONLY — a per-row ``transform`` over the start
    offsets followed by one explode; no shuffle, no state. Memory per
    row is one document's tokens (the same bound every token stage here
    already has)."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if not 0 <= overlap < window:
        raise ValueError(f"need 0 <= overlap < window, got {overlap}")
    step = window - overlap
    toks = F.coalesce(F.col(toks_col), F.array().cast("array<string>"))
    n = F.size(toks)
    # chunk count = 1 + ceil(max(n - window, 0) / step): starts at 0,
    # then every `step` until the window reaches the end
    extra = F.greatest(n - F.lit(window), F.lit(0))
    n_chunks = (F.lit(1) + F.ceil(extra.cast("double") / step)
                .cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice(toks, i * step + 1, window).alias("chunk_toks")))
    out = df.select(id_col, F.explode(chunks).alias("__c"))
    return out.select(
        id_col,
        F.col("__c.chunk_idx").alias("chunk_idx"),
        F.col("__c.chunk_toks").alias("chunk_toks"),
        F.size("__c.chunk_toks").alias("n_chunk"))


def pack_bestfit(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int = 2048,
    n_shards: int = 64,
    seed: str = "pack",
) -> DataFrame:
    """Best-fit-decreasing packing: append ``shard`` and ``bin_id``
    where bins NEVER exceed ``budget`` (the truncation-free packing
    policy of Ding et al. 2024, "Fewer Truncations Improve Language
    Modeling") — unlike :func:`pack_greedy`'s start-offset chunks,
    which overfill by up to one document and force the loader to
    truncate or buffer.

    Within each md5 shard, documents are taken in (tokens DESC, id ASC)
    order; each joins the open bin with the SMALLEST remaining capacity
    that still fits (ties to the lowest bin index), else opens a new
    bin. A document longer than ``budget`` gets a bin of its own (its
    remainder is negative, so nothing ever joins it) — callers wanting
    hard caps split with :func:`chunk_documents` first. NULL token
    counts pack as 0.

    Deterministic and engine-replayable: the whole loop is integer
    state keyed by the md5 shard, so a DuckDB recursive CTE replays
    every placement (the ``corpus_pack_bestfit`` oracle does).

    Scale shape: one shuffle on the shard key, then a per-shard
    sequential pass inside ``applyInPandas`` (packing is inherently
    order-dependent; the md5 sharding is what makes it parallel —
    size ``n_shards`` to the cluster). Per-shard cost is
    O(docs * open_bins) with the numpy argmin scan; BFD keeps open-bin
    counts small because tight fills close bins early."""
    import numpy as np
    import pandas as pd

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    shard: Column = F.pmod(hash_bucket(F.col(id_col), seed),
                           F.lit(n_shards)).cast("int")
    src = df.select(F.col(id_col).alias("__id"),
                    F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
                    .alias("__tok"),
                    shard.alias("shard"))
    bud = int(budget)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["__tok", "__id"], ascending=[False, True],
            kind="mergesort").reset_index(drop=True)
        toks = pdf["__tok"].to_numpy()
        rem = np.empty(len(pdf), dtype=np.int64)  # bin remainders
        n_bins = 0
        bins = np.empty(len(pdf), dtype=np.int64)
        for i, tok in enumerate(toks):
            fits = rem[:n_bins] >= tok
            if fits.any():
                # argmin over masked remainders; np.argmin returns the
                # FIRST minimum — exactly the lowest-index tie rule
                masked = np.where(fits, rem[:n_bins], np.iinfo(np.int64).max)
                j = int(np.argmin(masked))
                rem[j] -= tok
                bins[i] = j
            else:
                rem[n_bins] = bud - tok
                bins[i] = n_bins
                n_bins += 1
        pdf["bin_id"] = bins
        return pdf

    out = src.groupBy("shard").applyInPandas(
        _pack, schema="__id long, __tok long, shard int, bin_id long")
    return (df.join(out.select(F.col("__id").alias(id_col),
                               "shard", "bin_id"), id_col))
