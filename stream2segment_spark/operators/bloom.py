"""Broadcast Bloom filter for shuffle-free incremental deduplication.

The incremental-ingestion anti-join ("which of these new rows are
already in the corpus?" — reference append semantics,
/root/reference/stream2segment/process/main.py:421-434; our
streaming/corpus.py foreachBatch) shuffles the corpus key set on every
batch when the corpus side is too big to broadcast. At 100 TB that is
the whole cost of ingestion.

This module replaces the corpus shuffle with a Bloom filter built ONCE:

1. :func:`build_bloom` — one pass over corpus keys. Two independent
   64-bit hashes per key are computed JVM-side (``xxhash64`` twice,
   Kirsch-Mitzenmacher double hashing gives the k probe positions), a
   numpy bitset is OR-accumulated per partition (Arrow-batched), the
   per-partition bitsets are OR-reduced in a distributed fan-in stage
   (32 groups), and <= 32 bitsets reach the driver. Driver/executor
   memory is O(m/8) bytes, independent of corpus size.
2. :func:`bloom_anti_join` — new rows probe the broadcast bitset
   map-side. Bloom NEGATIVES are *definitely new* (no false negatives),
   so they skip the join entirely; only the positives ("maybe seen",
   true duplicates + fpp false positives) are confirmed EXACTLY via two
   broadcast-hash joins that stream the corpus map-side:
   ``corpus semi-join broadcast(maybes)`` finds the true duplicates,
   ``maybes anti-join broadcast(true_dups)`` rescues the false
   positives. The output equals the plain exact anti-join bit-for-bit
   (the oracle replays it as ``NOT IN``); the Bloom stage only prunes.

Scale shape: the corpus is NEVER shuffled — it is scanned once at build
time (map-only + one m/8-byte-row fan-in) and streamed map-side through
one broadcast semi-join per batch. Per-batch data movement is the
broadcast maybe set (|batch| * fpp + true dups) instead of the corpus
key set. For steady-state ingestion the filter is maintained
incrementally: :func:`or_bloom` folds a batch's bitset into the corpus
filter without rescanning the corpus.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# second-hash salt: any fixed string works; xxhash64(key, salt) must be
# independent of xxhash64(key) (different seed path in the JVM impl)
_H2_SALT = "s2s-bloom-h2"


def optimal_params(expected_n: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n ln p / (ln 2)^2 bits (byte-aligned,
    >= 64), k = (m/n) ln 2 hash probes (>= 1)."""
    if expected_n <= 0:
        raise ValueError(f"expected_n must be positive, got {expected_n}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = -expected_n * math.log(fpp) / (math.log(2) ** 2)
    m_bits = max(64, 8 * math.ceil(m / 8))
    k = max(1, round(m_bits / expected_n * math.log(2)))
    return m_bits, k


@dataclass(frozen=True)
class BloomFilter:
    """An immutable bitset + its probe parameters. ``bits`` is
    ``m_bits/8`` bytes, bit ``i`` stored as ``bits[i >> 3] & (1 << (i & 7))``."""
    m_bits: int
    k: int
    bits: bytes

    def contains(self, h1: int, h2: int) -> bool:
        """Driver-side single probe (tests); executors use the
        vectorized pandas path in :func:`_probe_udf`."""
        arr = np.frombuffer(self.bits, dtype=np.uint8)
        h1u, h2u = h1 & 0xFFFFFFFFFFFFFFFF, h2 & 0xFFFFFFFFFFFFFFFF
        for i in range(self.k):
            # mod 2^64 first: matches the executors' uint64 wraparound
            pos = ((h1u + i * h2u) & 0xFFFFFFFFFFFFFFFF) % self.m_bits
            if not (arr[pos >> 3] >> (pos & 7)) & 1:
                return False
        return True


def _hash_cols(key: Column) -> tuple[Column, Column]:
    """Two independent 64-bit hashes, computed JVM-side (codegen'd):
    h1 = xxhash64(key), h2 = xxhash64(key, salt). Double hashing
    (Kirsch-Mitzenmacher 2006) derives all k probe positions as
    (h1 + i*h2) mod m without further hashing."""
    return F.xxhash64(key), F.xxhash64(key, F.lit(_H2_SALT))


def _set_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray,
              m_bits: int, k: int) -> None:
    """OR the k probe positions of each (h1, h2) pair into ``bits``
    (uint8 array, modified in place). All-numpy, no Python loop over
    rows."""
    h1u = h1.astype(np.int64).view(np.uint64)
    h2u = h2.astype(np.int64).view(np.uint64)
    m = np.uint64(m_bits)
    for i in range(k):  # k is ~7, rows are vectorized
        pos = (h1u + np.uint64(i) * h2u) % m
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1),
                                       (pos & np.uint64(7)).astype(np.uint8)))


def build_bloom(df: DataFrame, key_col: str, *,
                expected_n: int | None = None, fpp: float = 0.01,
                fanin: int = 32,
                params: tuple[int, int] | None = None) -> BloomFilter:
    """Build a :class:`BloomFilter` over ``df[key_col]`` in one
    distributed pass. ``expected_n`` sizes the filter (default: one
    ``count()`` of ``df`` — at 100 TB pass the known corpus cardinality
    instead to skip the extra scan). ``params=(m_bits, k)`` pins the
    layout explicitly — REQUIRED when filters will be unioned with
    :func:`or_bloom` (size once for the expected EVENTUAL cardinality,
    then every incremental batch filter shares the layout).

    Shuffle budget: the key scan is map-only (hashes computed JVM-side,
    bitset accumulated per partition in Arrow batches); the only
    exchange moves one m/8-byte row per input partition into ``fanin``
    groups for the distributed OR; <= ``fanin`` rows reach the driver.
    """
    if params is not None:
        m_bits, k = params
        if m_bits <= 0 or m_bits % 8 or k <= 0:
            raise ValueError(f"bad params {params}: need m_bits % 8 == 0, "
                             "m_bits > 0, k > 0")
    else:
        if expected_n is None:
            expected_n = df.count()
        m_bits, k = optimal_params(max(1, expected_n), fpp)
    nbytes = m_bits // 8
    h1c, h2c = _hash_cols(F.col(key_col))
    hashed = df.select(h1c.alias("h1"), h2c.alias("h2"))

    def partition_bits(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf):
                seen = True
                _set_bits(bits, pdf["h1"].to_numpy(),
                          pdf["h2"].to_numpy(), m_bits, k)
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    part = hashed.mapInPandas(partition_bits, "bits binary")

    def or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for b in pdf["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    # distributed fan-in: without it, every partition's m/8 bytes hits
    # the driver (1000s of partitions x MBs); with it, <= fanin rows do
    grouped = (part.withColumn("g", F.spark_partition_id() % fanin)
               .groupBy("g").applyInPandas(or_group, "bits binary"))
    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in grouped.collect():
        acc |= np.frombuffer(row["bits"], dtype=np.uint8)
    return BloomFilter(m_bits, k, acc.tobytes())


def or_bloom(a: BloomFilter, b: BloomFilter) -> BloomFilter:
    """Union of two filters with identical parameters — the incremental
    maintenance step: fold each ingested batch's filter into the corpus
    filter instead of rebuilding from a corpus rescan."""
    if (a.m_bits, a.k) != (b.m_bits, b.k):
        raise ValueError(
            f"parameter mismatch: ({a.m_bits}, {a.k}) vs ({b.m_bits}, {b.k})")
    bits = (np.frombuffer(a.bits, dtype=np.uint8)
            | np.frombuffer(b.bits, dtype=np.uint8))
    return BloomFilter(a.m_bits, a.k, bits.tobytes())


def might_contain(df: DataFrame, key_col: str, bloom: BloomFilter,
                  out_col: str = "might_contain") -> DataFrame:
    """Add a boolean probe column: False is EXACT ("definitely not in
    the filtered set"), True means "maybe" (true hit or ~fpp false
    positive). The bitset ships to executors once via broadcast; the
    probe is one Arrow-batched pandas_udf over the two JVM-side hashes
    (map-only, fuses with the scan)."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((bloom.m_bits, bloom.k, bloom.bits))

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        m_bits, k, raw = bc.value
        arr = np.frombuffer(raw, dtype=np.uint8)
        h1u = h1.to_numpy(dtype=np.int64).view(np.uint64)
        h2u = h2.to_numpy(dtype=np.int64).view(np.uint64)
        hit = np.ones(len(h1u), dtype=bool)
        m = np.uint64(m_bits)
        for i in range(k):
            pos = (h1u + np.uint64(i) * h2u) % m
            byte = arr[(pos >> np.uint64(3)).astype(np.int64)]
            hit &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
        return pd.Series(hit)

    h1c, h2c = _hash_cols(F.col(key_col))
    return df.withColumn(out_col, probe(h1c, h2c))


def bloom_anti_join(new_df: DataFrame, corpus_df: DataFrame, key_col: str,
                    bloom: BloomFilter | None = None, *,
                    fpp: float = 0.01) -> DataFrame:
    """Rows of ``new_df`` whose ``key_col`` is NOT in ``corpus_df`` —
    bit-identical to ``new_df.join(corpus_df, key, 'left_anti')`` but
    with the corpus never shuffled:

    - bloom NEGATIVES pass through with no join at all (exact by the
      no-false-negative property);
    - bloom POSITIVES ("maybes", ~|new| * fpp + true dups) are confirmed
      via ``corpus semi-join broadcast(maybes)`` (corpus streams
      map-side, builds nothing) followed by
      ``maybes anti-join broadcast(true_dups)``.

    Pass a prebuilt ``bloom`` (steady-state ingestion maintains one via
    :func:`or_bloom`); otherwise one is built from ``corpus_df`` here.

    Plan shape (r10 opt round): the maybe-key set is probed on a
    KEYS-ONLY projection of ``new_df`` (narrow — the payload columns
    never enter the broadcast-build branch), and the output is ONE
    ``left_anti`` of the full rows against the broadcast true-dup set.
    The earlier definite/maybes union evaluated the probe UDF over the
    full-payload frame on two filter branches and unioned them back;
    output is bit-identical (``true_dups`` is a subset of the maybe
    keys, and bloom has no false negatives, so anti-joining ALL rows
    against it keeps exactly definite + rescued rows), with one
    broadcast hash probe per row instead of a second full Python probe
    pass."""
    if bloom is None:
        bloom = build_bloom(corpus_df, key_col, fpp=fpp)
    maybe_keys = (might_contain(new_df.select(key_col).distinct(),
                                key_col, bloom, out_col="__maybe")
                  .filter(F.col("__maybe")).drop("__maybe"))
    true_dups = corpus_df.select(key_col).join(
        F.broadcast(maybe_keys), key_col, "left_semi").distinct()
    return new_df.join(F.broadcast(true_dups), key_col, "left_anti")
